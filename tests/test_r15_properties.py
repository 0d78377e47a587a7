"""Planted-twin property tests for the round-15 work.

- fold_ladder (multi-delta maintenance, r14 verdict ask #4): every
  folded level is POINTWISE equal to a combined rebuild's — including
  continuation rounds past the base's top level and stability-exited
  bases — and fold-then-place over three corpora reproduces the
  three-corpus rebuild's total order exactly.
- Tombstone deletions (ask #5): the surviving merged order equals the
  rebuild on the surviving corpus.
- Parquet persistence (ask #6): store/load round-trips the stored-base
  artifact bit-identically.
- Size-derived path routing (ask #2): the route flips at the PROBE_XSI
  constant; the flag overrides both ways.
- Mechanical NOISY_FAMILY (ask #3): the spread criterion computed from
  BENCH_HISTORY.json, with the verdict-named row joining.
"""

from __future__ import annotations

import json

import pyspark.sql.functions as F

import idh_etl_demo_spark.catalog_r11  # noqa: F401  (registers entries)
import idh_etl_demo_spark.catalog_r14  # noqa: F401  (registers entries)
import idh_etl_demo_spark.catalog_r15  # noqa: F401  (registers entries)
from idh_etl_demo_spark.operators.suffix import (
    extend_delta_states,
    fold_ladder,
    ladder_artifacts,
    suffix_ranks,
    top_class_frame,
)


def _toks_df(spark, rows):
    sdf = spark.createDataFrame(rows, "doc_id long, text string")
    from idh_etl_demo_spark.operators.text import tokens

    return sdf.select("doc_id", tokens(F.col("text")).alias("toks"))


def _bparts_of(spark, rows):
    """A catalog_r14._xsb_parts-shaped tuple for an arbitrary corpus."""
    base = _toks_df(spark, rows).localCheckpoint(eager=True)
    cap: dict = {}
    bf, bh, bp = suffix_ranks(base, capture=cap)
    blens = base.select(
        "doc_id", F.size("toks").cast("long").alias("n_tokens")
    )
    arts = ladder_artifacts(bh, bp)
    bf_top = top_class_frame(bf, bh, blens).localCheckpoint(eager=True)
    meta = {"npos": cap["npos"], "maxlen": cap["maxlen"]}
    return (bf, bh, bp, blens, arts, bf_top, meta)


def _level_rows(fr):
    return sorted((r.doc_id, r.pos, r.r) for r in fr.collect())


def _fold_vs_rebuild(spark, base_rows, delta_rows):
    base = _toks_df(spark, base_rows).localCheckpoint(eager=True)
    delta = _toks_df(spark, delta_rows).localCheckpoint(eager=True)
    _bf, bh, bp = suffix_ranks(base)
    states = extend_delta_states(bh, bp, delta)
    _df, d_hist, _dp = suffix_ranks(delta)
    toks = [t.split() for _, t in base_rows + delta_rows]
    maxlen = max(len(t) for t in toks)
    npos = sum(len(t) for t in toks)
    folded = fold_ladder(bh, states, d_hist, maxlen, npos)
    _rf, r_hist, _rp = suffix_ranks(base.unionByName(delta))
    assert [L for L, _ in folded] == [L for L, _ in r_hist], (
        [L for L, _ in folded],
        [L for L, _ in r_hist],
    )
    for (L, ffr), (_, rfr) in zip(folded, r_hist):
        assert _level_rows(ffr) == _level_rows(rfr), f"level {L} diverged"
    return folded


def test_fold_ladder_matches_combined_rebuild(spark):
    """Pointwise level equality: fresh docs, a verbatim re-crawl, an
    unseen-vocabulary doc (gap brackets at both extremes), and a delta
    doc LONGER than every base doc so the continuation loop past the
    base's top level must run and still match the rebuild."""
    base_rows = [
        (0, "b c d e b c"),
        (1, "c d c d"),
        (2, "d e f"),
    ]
    delta_rows = [
        (100, "b c d e b c"),  # verbatim re-crawl → ties at every level
        (101, "a a b"),  # before everything at the seed
        (102, "z z z"),  # after everything, unseen vocab
        (103, "c d e f g h i j k l m n"),  # longer than base maxlen → continuation
    ]
    _fold_vs_rebuild(spark, base_rows, delta_rows)


def test_fold_ladder_under_stability_exit(spark):
    """Base = identical docs with distinct tokens (stability-exits with
    top level 2 ≪ doc length): folding a re-crawl plus a mid-document
    mutant must reproduce the rebuild's levels — including the deeper
    levels the COMBINED corpus needs where the base never did."""
    text = " ".join(f"x{j}" for j in range(16))
    base_rows = [(0, text), (1, text)]
    mutated = text.split()
    mutated[8] = "q0"
    delta_rows = [(100, text), (101, " ".join(mutated))]
    base = _toks_df(spark, base_rows).localCheckpoint(eager=True)
    _bf, bh, _bp = suffix_ranks(base)
    assert bh[-1][0] < 16, "expected a stability-exited base build"
    _fold_vs_rebuild(spark, base_rows, delta_rows)


def test_fold_then_place_matches_three_corpus_rebuild(spark):
    """The ask-#4 property: place day-1, FOLD it into the artifact,
    place day-2 against the folded artifact — the day-2 merged total
    order must equal the THREE-corpus rebuild's total order exactly
    (every rank compared, not a digest)."""
    from idh_etl_demo_spark.catalog_r14 import (
        fold_xsb_parts,
        merged_order_from,
    )

    base_rows = [(0, "b c d e"), (1, "c d c"), (2, "e f")]
    d1_rows = [(100, "b c d e"), (101, "q r s")]
    d2_rows = [(200, "c d c"), (201, "b c z"), (202, "a")]
    bparts = _bparts_of(spark, base_rows)
    d1 = _toks_df(spark, d1_rows).localCheckpoint(eager=True)
    d2 = _toks_df(spark, d2_rows).localCheckpoint(eager=True)
    merged1, dparts1 = merged_order_from(bparts, d1)
    folded = fold_xsb_parts(bparts, dparts1, merged1)
    merged2, _ = merged_order_from(folded, d2)
    got = sorted(
        (r.doc_id, r.pos, r.mr) for r in merged2.collect()
    )
    allrows = _toks_df(
        spark, base_rows + d1_rows + d2_rows
    ).localCheckpoint(eager=True)
    rf, _rh, _rp = suffix_ranks(allrows)
    want = sorted((r.doc_id, r.pos, r.sa_rank) for r in rf.collect())
    assert got == want


def test_tombstone_merged_order_matches_surviving_rebuild(spark):
    """The ask-#5 property: base − removed + added ≡ rebuild on the
    surviving corpus. The tombstone filter runs against the UNTOUCHED
    stored artifact (placement counts stay in the original rank
    space); the surviving merged ranks must equal the from-scratch
    build over survivors ∪ delta — including a delta row whose
    original array neighbor was tombstoned."""
    from idh_etl_demo_spark.catalog_r14 import merged_order_from

    base_rows = [
        (0, "b c d e"),
        (1, "b c d"),  # removed: its suffixes sat between 0's and 2's
        (2, "c d e f"),
        (3, "b c"),  # removed
    ]
    delta_rows = [(100, "b c d"), (101, "z b c")]
    bparts = _bparts_of(spark, base_rows)
    delta = _toks_df(spark, delta_rows).localCheckpoint(eager=True)
    merged, _ = merged_order_from(
        bparts, delta, base_filter=~F.col("doc_id").isin(1, 3)
    )
    got = sorted((r.doc_id, r.pos, r.mr) for r in merged.collect())
    surviving = [r for r in base_rows if r[0] not in (1, 3)] + delta_rows
    rf, _rh, _rp = suffix_ranks(
        _toks_df(spark, surviving).localCheckpoint(eager=True)
    )
    want = sorted((r.doc_id, r.pos, r.sa_rank) for r in rf.collect())
    assert got == want


def test_xsb_store_roundtrip(spark, tmp_path):
    """The ask-#6 bit-identity: every component of the stored-base
    artifact survives a parquet write/load round-trip exactly — same
    schema, same rows — so 'the persisted artifact' is code, not
    prose. The reloaded artifact then PLACES a delta identically to
    the in-session one (the consumer contract, not just the bytes)."""
    from idh_etl_demo_spark.catalog_r14 import (
        load_xsb_parts,
        store_xsb_parts,
    )
    from idh_etl_demo_spark.operators.suffix import place_delta_ranks

    base_rows = [(0, "b c d e b"), (1, "c d c"), (2, "e f g")]
    bparts = _bparts_of(spark, base_rows)
    path = str(tmp_path / "xsb_store")
    store_xsb_parts(path, bparts)
    loaded = load_xsb_parts(spark, path)

    def rows_of(fr):
        cols = sorted(fr.columns)
        return sorted(tuple(r[c] for c in cols) for r in fr.collect())

    def same(a, b, what):
        assert dict(a.dtypes) == dict(b.dtypes), what
        assert rows_of(a) == rows_of(b), what

    bf, bh, bp, blens, arts, bf_top, meta = bparts
    lf, lh, lp, llens, larts, lf_top, lmeta = loaded
    assert lmeta == meta, "manifest scalars must round-trip"
    same(bf, lf, "final_order")
    assert [L for L, _ in bh] == [L for L, _ in lh]
    for (L, a), (_, b) in zip(bh, lh):
        same(a, b, f"rank_L{L}")
    same(bp, lp, "positions")
    same(blens, llens, "lens")
    same(arts["seed_vocab"], larts["seed_vocab"], "seed_vocab")
    assert len(arts["levels"]) == len(larts["levels"])
    for i, ((pa, fa), (pb, fb)) in enumerate(
        zip(arts["levels"], larts["levels"])
    ):
        same(pa, pb, f"pair_map_{i}")
        same(fa, fb, f"fx_{i}")
    same(bf_top, lf_top, "top_class")
    delta = _toks_df(
        spark, [(100, "b c d e b"), (101, "z b q")]
    ).localCheckpoint(eager=True)

    def place_with(parts):
        f, h, p, lens, a, t, _m = parts
        return sorted(
            (r.doc_id, r.pos, r.ins)
            for r in place_delta_ranks(
                f,
                h,
                p,
                lens,
                delta,
                states=extend_delta_states(h, p, delta, artifacts=a),
                bf_top=t,
            ).collect()
        )

    assert place_with(bparts) == place_with(loaded)


def test_fold_after_reload_matches_in_session(spark, tmp_path):
    """Persistence × fold composition: an artifact reloaded from
    parquet must FOLD identically to the in-session one — day-2
    placement against both folded artifacts produces the same merged
    order, so a maintenance job that restarts from the store loses
    nothing."""
    from idh_etl_demo_spark.catalog_r14 import (
        fold_xsb_parts,
        load_xsb_parts,
        merged_order_from,
        store_xsb_parts,
    )

    base_rows = [(0, "b c d e"), (1, "c d c"), (2, "e f")]
    d1_rows = [(100, "b c d e"), (101, "q r s")]
    d2_rows = [(200, "c d z"), (201, "a b")]
    bparts = _bparts_of(spark, base_rows)
    path = str(tmp_path / "xsb")
    store_xsb_parts(path, bparts)
    loaded = load_xsb_parts(spark, path)
    d1 = _toks_df(spark, d1_rows).localCheckpoint(eager=True)
    d2 = _toks_df(spark, d2_rows).localCheckpoint(eager=True)

    def day2_order(parts):
        m1, dp1 = merged_order_from(parts, d1)
        folded = fold_xsb_parts(parts, dp1, m1)
        m2, _ = merged_order_from(folded, d2)
        return sorted((r.doc_id, r.pos, r.mr) for r in m2.collect())

    assert day2_order(bparts) == day2_order(loaded)


def test_tombstone_whole_class_removed(spark):
    """Edge case: EVERY member of a duplicated base class is
    tombstoned (both copies of a verbatim doc removed). The delta
    re-crawls that very content — its suffixes must place correctly
    among the survivors, and the surviving merged order must equal the
    rebuild on survivors ∪ delta."""
    from idh_etl_demo_spark.catalog_r14 import merged_order_from

    dup = "b c d e b c"
    base_rows = [(0, dup), (1, dup), (2, "x y z"), (3, "c d")]
    delta_rows = [(100, dup), (101, "y z")]
    bparts = _bparts_of(spark, base_rows)
    delta = _toks_df(spark, delta_rows).localCheckpoint(eager=True)
    merged, _ = merged_order_from(
        bparts, delta, base_filter=~F.col("doc_id").isin(0, 1)
    )
    got = sorted((r.doc_id, r.pos, r.mr) for r in merged.collect())
    surviving = [r for r in base_rows if r[0] not in (0, 1)] + delta_rows
    rf, _rh, _rp = suffix_ranks(
        _toks_df(spark, surviving).localCheckpoint(eager=True)
    )
    want = sorted((r.doc_id, r.pos, r.sa_rank) for r in rf.collect())
    assert got == want


def test_release_xsb_models_frees_checkpoints(spark):
    """Bench hygiene (the r14 ADVICE the bench now applies): building
    the stored-base memo pins checkpoint RDDs; release_xsb_models()
    must drop the persistent-RDD count back to (at most) its
    pre-build level and clear the memo."""
    from idh_etl_demo_spark.catalog_r14 import (
        _XSB_MODELS,
        _xsb_parts,
        release_xsb_models,
    )

    # Track persistent-RDD IDS, not counts: the ContextCleaner reaps
    # earlier tests' dropped frames CONCURRENTLY (GC-driven), so a
    # count can legitimately fall while the build runs — the r15
    # optimization's different job cadence exposed exactly that race.
    # Id-set logic is race-free: concurrent cleaning only ever REMOVES
    # ids, so "the build created some" and "none of the build's ids
    # survive release" both stay monotone under it.
    def ids() -> set:
        return {
            int(k)
            for k in spark.sparkContext._jsc.getPersistentRDDs().keySet()
        }

    release_xsb_models()  # clean slate if another test built it
    before = ids()
    _xsb_parts(spark, "/root/testdata/sf0.001")
    assert _XSB_MODELS
    created = ids() - before
    assert created, "memo build should pin checkpoints"
    release_xsb_models()
    assert not _XSB_MODELS
    leaked = created & ids()
    assert not leaked, f"release left build checkpoints pinned: {leaked}"


def test_xsi_route_flips_at_threshold():
    """The ask-#2 routing: auto flips exactly at the PROBE_XSI size
    floor AND at the delta-share bound (the r15 sweep's 90%-delta
    corpus is the measured counterexample a size-only gate mis-routes);
    the flag overrides both ways."""
    from idh_etl_demo_spark.catalog_r11 import (
        _XSI_STORED_MAX_DELTA_FRAC,
        _XSI_STORED_MIN_POS,
        _xsi_route,
    )

    def at(total, frac, flag=None):
        nd = int(total * frac)
        return _xsi_route(total - nd, nd, flag)

    in_frac = _XSI_STORED_MAX_DELTA_FRAC - 0.03
    assert at(_XSI_STORED_MIN_POS - 1, in_frac) == "rebuild"
    assert at(_XSI_STORED_MIN_POS, in_frac) == "stored"
    assert at(_XSI_STORED_MIN_POS * 100, in_frac) == "stored"
    # the delta-share flip: same size, delta-dominated → rebuild
    assert at(_XSI_STORED_MIN_POS * 10, 0.9) == "rebuild"
    assert (
        _xsi_route(_XSI_STORED_MIN_POS, _XSI_STORED_MIN_POS * 9, None)
        == "rebuild"
    )
    assert at(0, 0.0) == "rebuild"
    assert at(0, 0.0, "stored") == "stored"
    assert at(_XSI_STORED_MIN_POS * 100, in_frac, "rebuild") == "rebuild"


def test_mechanical_noisy_rows(tmp_path):
    """The ask-#3 criterion on a synthetic history: a ≥5 s row whose
    same-code samples spread past 1.5× joins the best-of-4 set; rows
    inside the band, under the floor, or under-sampled do not. On the
    COMMITTED history the verdict-named doc_title_edit_neardup joins,
    and the hand-kept IVFPQ floor stays a subset of the final set."""
    import bench

    hist = {
        "rounds": {
            "1": [{"src": "a", "queries": {
                "swingy": 10.0, "steady": 10.0, "small_swingy": 2.0,
                "undersampled": 20.0}}],
            "2": [{"src": "b", "queries": {
                "swingy": 16.0, "steady": 11.0, "small_swingy": 4.9}}],
            "3": [{"src": "c", "queries": {
                "swingy": 12.0, "steady": 10.5, "small_swingy": 3.0,
                "undersampled": 9.0}}],
        }
    }
    p = tmp_path / "hist.json"
    p.write_text(json.dumps(hist))
    got = bench.mechanical_noisy_rows(str(p))
    assert got == {"swingy"}
    # the verdict-named row's membership, pinned on the FIXED r12-r14
    # slice of the committed history (the slice that motivated the
    # criterion) — not on "the last 3 rounds", which moves every round
    # and would make this test red on future data-only appends
    import os

    full = json.load(
        open(os.path.join(os.path.dirname(__file__), "..", "BENCH_HISTORY.json"))
    )
    sliced = {
        "rounds": {k: v for k, v in full["rounds"].items() if k in ("12", "13", "14")}
    }
    p2 = tmp_path / "hist_r12_r14.json"
    p2.write_text(json.dumps(sliced))
    pinned = bench.mechanical_noisy_rows(str(p2))
    assert "doc_title_edit_neardup" in pinned
    # structural invariants on the live computation (stable by
    # construction whatever the history holds)
    assert bench.NOISY_BASE <= bench.NOISY_FAMILY
    assert bench.mechanical_noisy_rows() <= bench.NOISY_FAMILY


def test_tombstone_fold_then_place_matches_surviving_rebuild(spark):
    """Deletions COMPOSE with folds: place day-1 under a tombstone
    filter, fold with the SAME filter (the fold's per-level dense
    re-rank sheds dead rows for free — the compaction contract), then
    place day-2 against the folded artifact. Both former failure
    shapes are planted: doc 3's removal kills WHOLE top classes
    ("m n", "n"), day-2 then lands one suffix exactly INSIDE a dead
    class (an unfiltered fold would drop it at the class join) and one
    gap-bracketed AT the dead classes (an unfiltered fold would
    coalesce its insertion rank to 0). A second day-2 tombstone over a
    folded-in day-1 doc plus a second fold pins the full maintenance
    algebra chain: tombstone∘fold∘tombstone∘fold∘place ≡ rebuild on
    the final surviving corpus."""
    from idh_etl_demo_spark.catalog_r14 import (
        fold_xsb_parts,
        merged_order_from,
    )

    base_rows = [
        (0, "b c d e"),
        (1, "b c d"),  # removed day-1
        (2, "c d e f"),
        (3, "m n"),  # removed day-1: sole owner of the m/n classes
    ]
    alive1 = ~F.col("doc_id").isin(1, 3)
    d1_rows = [(100, "b c d"), (101, "z b c")]  # 100 re-crawls doc 1
    d2_rows = [
        (200, "m n"),  # exact inside the all-dead class
        (201, "m z"),  # gap bracketed at the dead classes
        (202, "c d e"),
    ]
    bparts = _bparts_of(spark, base_rows)
    d1 = _toks_df(spark, d1_rows).localCheckpoint(eager=True)
    d2 = _toks_df(spark, d2_rows).localCheckpoint(eager=True)
    merged1, dparts1 = merged_order_from(bparts, d1, base_filter=alive1)
    folded = fold_xsb_parts(bparts, dparts1, merged1, base_filter=alive1)

    def _assert_no_dead(parts, dead_ids):
        f, h, p, lens, _a, top, _m = parts
        for what, fr in (
            [("final", f), ("pos", p), ("lens", lens), ("top", top)]
            + [(f"rank_L{L}", fr) for L, fr in h]
        ):
            n = fr.filter(F.col("doc_id").isin(*dead_ids)).count()
            assert n == 0, f"tombstoned rows outlived the fold: {what}"

    _assert_no_dead(folded, [1, 3])

    def _rebuild_order(rows):
        rf, _h, _p = suffix_ranks(
            _toks_df(spark, rows).localCheckpoint(eager=True)
        )
        return sorted((r.doc_id, r.pos, r.sa_rank) for r in rf.collect())

    surviving1 = [r for r in base_rows if r[0] not in (1, 3)] + d1_rows
    merged2, dparts2 = merged_order_from(
        folded, d2, base_filter=F.col("doc_id") != 101
    )
    got2 = sorted((r.doc_id, r.pos, r.mr) for r in merged2.collect())
    surviving2 = [r for r in surviving1 if r[0] != 101] + d2_rows
    assert got2 == _rebuild_order(surviving2)

    # fold the tombstoned day-2 in as well, then place day-3
    folded2 = fold_xsb_parts(
        folded, dparts2, merged2, base_filter=F.col("doc_id") != 101
    )
    _assert_no_dead(folded2, [1, 3, 101])
    d3 = _toks_df(spark, [(300, "b c z"), (301, "n")]).localCheckpoint(
        eager=True
    )
    merged3, _ = merged_order_from(folded2, d3)
    got3 = sorted((r.doc_id, r.pos, r.mr) for r in merged3.collect())
    assert got3 == _rebuild_order(surviving2 + [(300, "b c z"), (301, "n")])


def test_tombstoned_fold_survives_store_roundtrip(spark, tmp_path):
    """Persistence closes the maintenance algebra: an artifact that
    went through a TOMBSTONED fold stores/loads like a fresh build and
    places the next delta identically — the parquet layer never sees
    (and never needs) the tombstone history, because the fold already
    compacted it away."""
    from idh_etl_demo_spark.catalog_r14 import (
        fold_xsb_parts,
        load_xsb_parts,
        merged_order_from,
        store_xsb_parts,
    )

    base_rows = [(0, "b c d e"), (1, "b c d"), (2, "m n")]
    alive = F.col("doc_id") != 2
    bparts = _bparts_of(spark, base_rows)
    d1 = _toks_df(spark, [(100, "c d q"), (101, "m n")]).localCheckpoint(
        eager=True
    )
    merged1, dparts1 = merged_order_from(bparts, d1, base_filter=alive)
    folded = fold_xsb_parts(bparts, dparts1, merged1, base_filter=alive)
    path = str(tmp_path / "xsb_folded_tomb")
    store_xsb_parts(path, folded)
    loaded = load_xsb_parts(spark, path)
    d2 = _toks_df(spark, [(200, "m z"), (201, "b c")]).localCheckpoint(
        eager=True
    )

    def _order(parts):
        merged, _ = merged_order_from(parts, d2)
        return sorted((r.doc_id, r.pos, r.mr) for r in merged.collect())

    got = _order(loaded)
    assert got == _order(folded)
    rf, _h, _p = suffix_ranks(
        _toks_df(
            spark,
            [(0, "b c d e"), (1, "b c d"), (100, "c d q"), (101, "m n"),
             (200, "m z"), (201, "b c")],
        ).localCheckpoint(eager=True)
    )
    want = sorted((r.doc_id, r.pos, r.sa_rank) for r in rf.collect())
    assert got == want


from hypothesis import given, settings, strategies as st  # noqa: E402


@st.composite
def _maintenance_scenario(draw):
    """Random two-day maintenance scenario over a 3-token alphabet —
    the maximum-collision regime (verbatim dups across corpora,
    stability exits, whole-class deaths all arise naturally)."""
    doc = st.lists(st.sampled_from(["a", "b", "c"]), min_size=1, max_size=6)
    base = [
        (i, " ".join(draw(doc)))
        for i in range(draw(st.integers(2, 4)))
    ]
    d1 = [
        (100 + i, " ".join(draw(doc)))
        for i in range(draw(st.integers(1, 3)))
    ]
    d2 = [
        (200 + i, " ".join(draw(doc)))
        for i in range(draw(st.integers(1, 2)))
    ]
    rm1 = [i for i, _ in base if draw(st.booleans())]
    live1 = [i for i, _ in base if i not in rm1] + [i for i, _ in d1]
    rm2 = [i for i in live1 if draw(st.booleans())]
    return base, d1, d2, rm1, rm2


@settings(max_examples=5, deadline=None)
@given(_maintenance_scenario())
def test_maintenance_algebra_randomized(spark, scenario):
    """Randomized pin of the full maintenance algebra:
    place(tombstone₁) ∘ fold(tombstone₁) ∘ place(tombstone₂) over
    random tiny-alphabet corpora and random removal sets (either day's
    set may be empty, may kill whole classes, or may kill every base
    doc) must reproduce the final surviving corpus's rebuild
    rank-for-rank — the hand-planted composition tests' property,
    hypothesis-driven."""
    from idh_etl_demo_spark.catalog_r14 import (
        fold_xsb_parts,
        merged_order_from,
    )

    base, d1, d2, rm1, rm2 = scenario
    f1 = ~F.col("doc_id").isin(rm1) if rm1 else None
    f2 = ~F.col("doc_id").isin(rm2) if rm2 else None
    bparts = _bparts_of(spark, base)
    d1f = _toks_df(spark, d1).localCheckpoint(eager=True)
    d2f = _toks_df(spark, d2).localCheckpoint(eager=True)
    merged1, dparts1 = merged_order_from(bparts, d1f, base_filter=f1)
    folded = fold_xsb_parts(bparts, dparts1, merged1, base_filter=f1)
    merged2, _ = merged_order_from(folded, d2f, base_filter=f2)
    got = sorted((r.doc_id, r.pos, r.mr) for r in merged2.collect())
    surviving = [
        r for r in base + d1 if r[0] not in rm1 and r[0] not in rm2
    ] + d2
    rf, _h, _p = suffix_ranks(
        _toks_df(spark, surviving).localCheckpoint(eager=True)
    )
    want = sorted((r.doc_id, r.pos, r.sa_rank) for r in rf.collect())
    assert got == want
