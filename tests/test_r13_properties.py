"""Planted-twin property tests for the round-13 entries.

- ztm_time_dim: the production builder path agrees row-for-row with the
  catalog's inline derivation (two independent code routes, one relation)
  and reproduces the day-grain id quirk.
- doc_title_edit_entropy: the planted 4-edit mutants are exactly the
  relation, pinned against a hand-rolled full-DP twin, and a prefix-filter
  twin proves the PRUNING regime (near-singleton rarest buckets) this
  corpus exists to exercise.
- doc_containment_split_audit: on a planted disjoint-vocabulary corpus the
  qualifying relation is exactly the (piece → parent) pairs, every pair
  carries containment 1.0, and slot_reduction < 1 (the prunes fire).
- customer_ldiversity_audit: the l = 3 boundary (exactly-l class is NOT
  risky), the homogeneous-class leak, row-counting share semantics, and
  floor banding of negative balances.
"""

from __future__ import annotations

import hashlib

import duckdb

from tests.compare import assert_frames_equal
from tests.test_r11c_properties import _lev, _write_documents
from tests.test_r12_properties import _write_customers


# ---------------------------------------------------------------------------
# ztm_time_dim
# ---------------------------------------------------------------------------


def test_ztm_time_dim_production_builder_agrees_with_inline(spark):
    import idh_etl_demo_spark.catalog_r13  # noqa: F401
    from idh_etl_demo_spark.catalog import ENTRIES

    sf = "/root/testdata/sf0.001"
    prod = ENTRIES["ztm_time_dim"].spark(spark, sf).toPandas()
    inline = ENTRIES["time_dim_from_events"].spark(spark, sf).toPandas()
    assert_frames_equal(prod, inline)
    # the reference's grain quirk: id is DAY-grain while rows are hourly,
    # so any day with >1 observed hour repeats its id (SURVEY §1.3)
    assert prod["id"].duplicated().any()
    assert (prod["id"] == prod["full_timestamp"].dt.strftime("%Y%m%d").astype("int64")).all()


# ---------------------------------------------------------------------------
# doc_title_edit_entropy
# ---------------------------------------------------------------------------


def _ent_chars(s: str) -> str:
    import base64

    return base64.b64encode(hashlib.md5(s.encode()).digest()).decode()[:16]


def _ent_title(i: int) -> str:
    if i % 5 == 4:
        p = _ent_chars(str(i - 1)) + _ent_chars(str(i - 1) + "x")
        return p[:8] + "~~~~" + p[12:32]
    return _ent_chars(str(i)) + _ent_chars(str(i) + "x")


def test_edit_entropy_planted_mutants_and_pruning(spark, tmp_path):
    import idh_etl_demo_spark.catalog_r13  # noqa: F401
    from idh_etl_demo_spark.catalog import ENTRIES
    from idh_etl_demo_spark.catalog_r11c import _ED_K, _ED_PREFIX, _ED_Q

    ids = list(range(40))
    sf = _write_documents(tmp_path, [(i, "irrelevant text") for i in ids])
    entry = ENTRIES["doc_title_edit_entropy"]
    got = entry.spark(spark, sf).toPandas()

    # independent full-DP twin over independently synthesized titles
    titles = {i: _ent_title(i) for i in ids}
    assert all(len(t) == 32 for t in titles.values())
    twin = {
        (a, b): _lev(titles[a], titles[b])
        for a in ids
        for b in ids
        if a < b and _lev(titles[a], titles[b]) <= _ED_K
    }
    planted = {(i - 1, i) for i in ids if i % 5 == 4}
    assert set(twin) == planted  # random titles sit far beyond k
    assert all(d == 4 for d in twin.values())  # '~' is off-alphabet
    got_rel = {(r.id_a, r.id_b): r.ed for r in got.itertuples(index=False)}
    assert got_rel == twin

    # prefix-filter twin: in the high-entropy regime the rarest-prefix
    # candidate set is NEAR-LINEAR (the templated corpus degenerates to
    # ~all pairs), while the planted pairs all survive (completeness)
    grams = {
        i: sorted({t[p : p + _ED_Q] for p in range(len(t) - _ED_Q + 1)})
        for i, t in titles.items()
    }
    from collections import Counter

    df = Counter(g for gs in grams.values() for g in gs)
    prefix = {
        i: set(sorted(gs, key=lambda g: (df[g], g))[:_ED_PREFIX])
        for i, gs in grams.items()
    }
    cands = {
        (a, b)
        for a in ids
        for b in ids
        if a < b and prefix[a] & prefix[b]
    }
    assert planted <= cands  # the theorem's completeness
    assert len(cands) <= len(ids)  # pruning: ≪ the 780 all-pairs

    # oracle parity on the planted table
    con = duckdb.connect()
    con.execute(
        "create view documents as select * from "
        f"read_parquet('{sf}/documents.parquet')"
    )
    assert_frames_equal(got, con.execute(entry.oracle).df())


# ---------------------------------------------------------------------------
# doc_containment_split_audit
# ---------------------------------------------------------------------------


def _split_pct(i: int) -> int:
    h = hashlib.md5(str(i).encode()).hexdigest()
    return 10 + int(h[:15], 16) % 81


def test_containment_split_audit_prunes_fire_and_complete(spark, tmp_path):
    import idh_etl_demo_spark.catalog_r13 as r13
    from idh_etl_demo_spark.catalog import ENTRIES
    from idh_etl_demo_spark.catalog_r10 import _SSIM_W, _ssim_streams_of
    from idh_etl_demo_spark.catalog_r11b import _containment_relation

    # disjoint vocabularies: the true relation is EXACTLY the
    # (piece → parent) pairs whose piece yields ≥ 1 shingle
    lengths = {1: 60, 2: 41, 3: 27, 4: 73, 5: 19, 6: 50, 7: 33, 8: 64}
    rows = [
        (i, " ".join(f"w{i}t{j}" for j in range(n)))
        for i, n in lengths.items()
    ]
    sf = _write_documents(tmp_path, rows)
    entry = ENTRIES["doc_containment_split_audit"]
    got = entry.spark(spark, sf).toPandas()

    # exact twin over the derived corpus's shingle sets: token streams
    # are unique per doc, so sets are fully determined by the lengths
    # and the md5 cut — the relation includes every (piece → parent)
    # pair AND parents contained in their own ≥ 80% pieces
    toks = {i: [f"w{i}t{j}" for j in range(n)] for i, n in lengths.items()}
    sets: dict[int, frozenset] = {}
    for i, tk in toks.items():
        cut = lengths[i] * _split_pct(i) // 100
        for sid, piece in (
            (i, tk),
            (i + 10**9, tk[:cut]),
            (i + 2 * 10**9, tk[cut:]),
        ):
            sh = {
                " ".join(piece[p : p + _SSIM_W])
                for p in range(len(piece) - _SSIM_W + 1)
            }
            if sh:
                sets[sid] = frozenset(sh)
    expected = {
        (a, b): len(sa & sets[b]) / len(sa)
        for a, sa in sets.items()
        for b in sets
        if a != b and 5 * len(sa & sets[b]) >= 4 * len(sa)
    }
    planted = {(i + 10**9, i) for i in lengths if (i + 10**9) in sets}
    planted |= {(i + 2 * 10**9, i) for i in lengths if (i + 2 * 10**9) in sets}
    assert planted <= set(expected)  # every piece ⊆ its parent
    assert all(expected[p] == 1.0 for p in planted)

    rel = _containment_relation(
        *_ssim_streams_of(r13._split_base(spark, sf))
    ).toPandas()
    got_pairs = {
        (r.id_small, r.id_big): r.containment
        for r in rel.itertuples(index=False)
    }
    assert got_pairs == expected

    row = got.iloc[0]
    assert row["n_qualifying"] == len(expected)
    assert row["n_candidates"] >= row["n_qualifying"]
    assert row["slot_reduction"] < 1  # the prunes did real work

    con = duckdb.connect()
    con.execute(
        "create view documents as select * from "
        f"read_parquet('{sf}/documents.parquet')"
    )
    assert_frames_equal(got, con.execute(entry.oracle).df())


# ---------------------------------------------------------------------------
# customer_ldiversity_audit
# ---------------------------------------------------------------------------


def test_ldiversity_boundary_and_share(spark, tmp_path):
    """l = 3 boundary: a class with exactly 3 distinct segments is NOT
    at risk; a homogeneous class of any size is; the risky share counts
    ROWS in risky classes; floor banding sends negatives to band -1."""
    import idh_etl_demo_spark.catalog_r13  # noqa: F401
    from idh_etl_demo_spark.catalog import ENTRIES

    rows = []
    k = 1
    for seg in ("BUILDING", "MACHINERY", "HOUSEHOLD") * 2:  # class A: 6 rows, 3 segs
        rows.append((k, 1, seg, 500.0)); k += 1
    for _ in range(4):  # class B: 4 rows, 1 seg → homogeneous leak
        rows.append((k, 1, "BUILDING", 1500.0)); k += 1
    for seg in ("BUILDING", "MACHINERY"):  # class C: 2 rows, 2 segs → risky
        rows.append((k, 2, seg, 500.0)); k += 1
    for seg in ("BUILDING", "MACHINERY", "AUTOMOBILE"):  # class D: band -1
        rows.append((k, 2, seg, -50.0)); k += 1
    sf = _write_customers(tmp_path, rows)
    sdf = ENTRIES["customer_ldiversity_audit"].spark(spark, sf).toPandas()
    by = {(r.c_nationkey, r.balance_band): r for r in sdf.itertuples()}
    a, b = by[(1, 0)], by[(1, 1)]
    c, d = by[(2, 0)], by[(2, -1)]
    assert (a.class_size, a.n_sensitive, bool(a.at_risk)) == (6, 3, False)
    assert (b.class_size, b.n_sensitive, bool(b.at_risk)) == (4, 1, True)
    assert (c.class_size, c.n_sensitive, bool(c.at_risk)) == (2, 2, True)
    assert (d.class_size, d.n_sensitive, bool(d.at_risk)) == (3, 3, False)
    assert a.risky_row_share == 6 / 15  # rows of B + C, not 2 classes
    con = duckdb.connect()
    con.execute(
        "create view customer as select * from "
        f"read_parquet('{sf}/customer.parquet')"
    )
    assert_frames_equal(
        sdf, con.execute(ENTRIES["customer_ldiversity_audit"].oracle).df()
    )


# ---------------------------------------------------------------------------
# Stored-base SA placement prototype (r12 verdict stretch ask #8)
# ---------------------------------------------------------------------------


def test_sa_placement_matches_combined_rebuild(spark):
    """place_delta_ranks + the delta-only build must reproduce the
    combined rebuild's total order EXACTLY: merge base ranks with delta
    insertion points (base key (rank, 0, 0), delta key (ins, 1,
    delta_rank)) and compare (doc, pos) sequences. The planted corpus
    carries verbatim re-crawls ACROSS the base/delta boundary, so
    equal-suffix tie-breaks between a base and a delta document are
    actually exercised."""
    import pyspark.sql.functions as F

    from idh_etl_demo_spark.operators.suffix import (
        place_delta_ranks,
        suffix_ranks,
    )

    rows = []
    for i in range(24):
        # overlapping vocab so suffixes collide; docs 0,6,12,18 get
        # verbatim re-crawls as DELTA docs 100+i
        rows.append((i, " ".join(f"t{(i * 7 + j) % 40}" for j in range(25))))
    for i in (0, 6, 12, 18):
        rows.append((100 + i, rows[i][1]))
    sdf = spark.createDataFrame(rows, "doc_id long, text string")
    from idh_etl_demo_spark.operators.text import tokens

    corpus = sdf.select("doc_id", tokens(F.col("text")).alias("toks"))
    is_delta = (F.col("doc_id") % 6 == 3) | (F.col("doc_id") >= 100)
    base = corpus.filter(~is_delta).localCheckpoint(eager=True)
    delta = corpus.filter(is_delta).localCheckpoint(eager=True)

    comb_final, _, _ = suffix_ranks(corpus)
    base_final, base_hist, base_pos = suffix_ranks(base)
    delta_final, _, _ = suffix_ranks(delta)
    base_lens = base.select(
        "doc_id", F.size("toks").cast("long").alias("n_tokens")
    )
    ins = place_delta_ranks(base_final, base_hist, base_pos, base_lens, delta)

    bp = base_final.toPandas()
    dp = delta_final.toPandas().merge(ins.toPandas(), on=["doc_id", "pos"])
    merged = sorted(
        [(r.sa_rank, 0, 0, r.doc_id, r.pos) for r in bp.itertuples()]
        + [(r.ins, 1, r.sa_rank, r.doc_id, r.pos) for r in dp.itertuples()]
    )
    got_order = [(d, p) for *_k, d, p in merged]
    cp = comb_final.toPandas().sort_values("sa_rank")
    want_order = list(zip(cp["doc_id"], cp["pos"]))
    assert got_order == want_order
