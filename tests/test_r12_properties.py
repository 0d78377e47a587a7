"""Round-12 property tests.

Containment-join prunes (the round-11 verdict's ask #1): the LENGTH
filter (5·s_b ≥ 4·s_a) and the first-collision POSITIONAL bound
(5·(s_b − r_b + 1) ≥ 4·s_a) are verified on a PLANTED size-diverse
corpus where both genuinely fire — the base documents corpus has
near-uniform sizes, so slot_reduction sits at 1.0 there and only the
planted geometry proves the arithmetic:

- a big document probing a tiny one (C→D) generates prefix collisions
  that ONLY the length filter removes;
- a small document fully contained deep inside a big one (P ⊆ Q, the
  shared run sitting BEHIND 29 rarer shingles of Q) generates
  collisions where the positional bound prunes the deep slots while
  the first (rarest) collision survives — the first-collision
  completeness theorem exercised at its boundary;
- every true pair (containment ≥ 0.8 by brute force) must appear in
  the entry output, bit-for-bit against a pure-Python twin AND the
  DuckDB oracle, and the audit's five counters must equal the twin's.
"""

from __future__ import annotations

import hashlib

import duckdb

from tests.compare import assert_frames_equal
from tests.test_r10_properties import _write_documents

_W = 5
_T_NUM, _T_DEN = 4, 5


def _shingles(text: str) -> list[str]:
    toks = text.split()
    if len(toks) < _W:
        return []
    seen: list[str] = []
    have = set()
    for i in range(len(toks) - _W + 1):
        h = hashlib.md5(" ".join(toks[i : i + _W]).encode()).hexdigest()
        if h not in have:
            have.add(h)
            seen.append(h)
    return seen


def _twin(texts: dict[int, str]):
    """Pure-Python twin of _cont_parts + the pruned candidate join +
    the brute-force relation. Returns (audit dict, truth rows)."""
    sets = {d: set(_shingles(t)) for d, t in texts.items()}
    sets = {d: s for d, s in sets.items() if s}
    df: dict[str, int] = {}
    for s in sets.values():
        for gh in s:
            df[gh] = df.get(gh, 0) + 1
    ranked = {
        d: sorted(s, key=lambda gh: (df[gh], gh)) for d, s in sets.items()
    }
    size = {d: len(s) for d, s in sets.items()}

    def p_of(s: int) -> int:
        return s - (_T_NUM * s + _T_DEN - 1) // _T_DEN + 1

    prefix = {
        d: order[: p_of(size[d])] for d, order in ranked.items()
    }
    unpruned = sum(
        df[gh] - 1 for d, pre in prefix.items() for gh in pre
    )
    rank_in = {
        d: {gh: i + 1 for i, gh in enumerate(order)}
        for d, order in ranked.items()
    }
    pruned = 0
    cands = set()
    for a, pre in prefix.items():
        for gh in pre:
            for b, rk in rank_in.items():
                if b == a or gh not in rk:
                    continue
                s_a, s_b, r_b = size[a], size[b], rk[gh]
                if _T_DEN * s_b < _T_NUM * s_a:
                    continue
                if _T_DEN * (s_b - r_b + 1) < _T_NUM * s_a:
                    continue
                pruned += 1
                cands.add((a, b))
    truth = []
    for a in sets:
        for b in sets:
            if a == b:
                continue
            inter = len(sets[a] & sets[b])
            if _T_DEN * inter >= _T_NUM * size[a]:
                truth.append(
                    (a, b, inter, size[a], size[b], inter / size[a])
                )
    audit = {
        "n_sets": len(sets),
        "unpruned_slots": unpruned,
        "pruned_slots": pruned,
        "n_candidates": len(cands),
        "n_qualifying": len(truth),
    }
    return audit, sorted(truth), cands


def _planted_texts() -> dict[int, str]:
    f = [f"f{i}" for i in range(1, 91)]
    v = [f"v{i}" for i in range(1, 11)]
    w = [f"w{i}" for i in range(1, 11)]
    q = [f"q{i}" for i in range(1, 30)]
    s = [f"s{i}" for i in range(1, 6)]
    return {
        1: " ".join(v),                       # A: tiny probe, A ⊆ B
        2: " ".join(v + f[:86]),              # B: big, contains A
        3: " ".join(w + f[:86]),              # C: big probe into tiny D
        4: " ".join(w),                       # D: tiny, D ⊆ C
        5: " ".join(f),                       # filler (raises filler df)
        6: " ".join(f),                       # filler twin
        7: " ".join(f[:9] + s),               # P: small, P ⊆ Q deep
        8: " ".join(q + f[:9] + s),           # Q: big, contains P's run
    }


def test_containment_prunes_fire_and_stay_complete(spark, tmp_path):
    from idh_etl_demo_spark.catalog import ENTRIES
    import idh_etl_demo_spark.catalog_r11b  # noqa: F401

    texts = _planted_texts()
    sf = _write_documents(tmp_path, texts)
    audit_twin, truth, cands = _twin(texts)

    # the planted geometry makes BOTH prunes bite: strictly fewer
    # surviving slots than the unpruned expansion
    assert audit_twin["pruned_slots"] < audit_twin["unpruned_slots"]
    # completeness: every true pair is a surviving candidate
    assert {(a, b) for (a, b, *_rest) in truth} <= cands
    # the big→tiny probes (C→D, B→A) are NOT candidates (length filter)
    assert (3, 4) not in cands and (2, 1) not in cands
    # the deep-inclusion pair survives via its first collision
    assert (7, 8) in cands

    sdf = ENTRIES["doc_containment_join"].spark(spark, sf).toPandas()
    got = [tuple(r) for r in sdf.itertuples(index=False)]
    assert got == truth  # bit-for-bit incl. the IEEE division
    # the three PLANTED inclusions are in the relation (the shared
    # filler runs legitimately add filler⊆B/C pairs on top — the twin
    # equality above pins the full relation)
    assert {(1, 2), (4, 3), (7, 8)} <= {(a, b) for (a, b, *_r) in truth}

    adf = ENTRIES["doc_containment_audit"].spark(spark, sf).toPandas()
    row = adf.iloc[0]
    for k, want in audit_twin.items():
        assert int(row[k]) == want, (k, int(row[k]), want)
    assert row["slot_reduction"] == (
        audit_twin["pruned_slots"] / audit_twin["unpruned_slots"]
    )

    # full DuckDB-oracle parity on the planted tables (the hard gate)
    con = duckdb.connect()
    con.execute(
        "create view documents as select * from "
        f"read_parquet('{sf}/documents.parquet')"
    )
    for name in ("doc_containment_join", "doc_containment_audit"):
        assert_frames_equal(
            ENTRIES[name].spark(spark, sf).toPandas(),
            con.execute(ENTRIES[name].oracle).df(),
        )


# ---------------------------------------------------------------------------
# Suffix-array stability exit + identical-tail sentinel (round 12)
# ---------------------------------------------------------------------------
#
# The prefix-doubling loop now stops when a doubling round splits no
# class (the Manber–Myers fixpoint) instead of grinding to max doc
# length — the remaining tied classes are identical tails, which the
# LCP walk resolves via the top-level sentinel. Plant the adversarial
# geometry: several VERBATIM copies of one doc whose 120 tokens are
# pairwise distinct, so the partition is content-complete at the
# BIGRAM seed already (stability fires on the first doubling round)
# while every cross-copy suffix pair is an identical tail of up to 120
# tokens — far beyond what the truncated level ladder (2 alone) can
# accumulate without the sentinel.


def test_sa_stability_exit_fires_and_walk_stays_exact(spark, tmp_path):
    import pyspark.sql.functions as F

    import idh_etl_demo_spark.catalog_r9b  # noqa: F401
    import idh_etl_demo_spark.catalog_r10  # noqa: F401
    from idh_etl_demo_spark.catalog import ENTRIES
    from idh_etl_demo_spark.operators.text import tokens as tok_expr
    from idh_etl_demo_spark.operators.suffix import (
        dup_len_per_position,
        suffix_lcp_adjacent,
        suffix_ranks,
    )

    body = " ".join(f"t{i}" for i in range(1, 121))
    texts = {1: body, 2: body, 3: body, 4: body}
    sf = _write_documents(tmp_path, texts)

    base = (
        spark.read.parquet(f"{sf}/documents.parquet")
        .select("doc_id", tok_expr(F.col("text")).alias("toks"))
    )
    final, history, pos = suffix_ranks(base)
    # stability fired: the ladder stops far short of maxlen=120
    # (distinct tokens make the bigram seed content-complete; the
    # first doubling round splits nothing)
    assert [h for h, _ in history] == [2], history
    # every copy's suffix is an identical tail of the 3 other copies:
    # m(pos) must equal the FULL remaining length at every position
    lens = base.select(
        "doc_id", F.size("toks").cast("long").alias("n_tokens")
    )
    m = dup_len_per_position(
        suffix_lcp_adjacent(final, history, pos, lens)
    ).collect()
    assert len(m) == 4 * 120
    for row in m:
        assert row.m == 120 - row.pos, (row.doc_id, row.pos, row.m)

    # the driver-gated consumers stay oracle-green on the planted
    # corpus (their DuckDB twins rebuild the SA from scratch)
    con = duckdb.connect()
    con.execute(
        "create view documents as select * from "
        f"read_parquet('{sf}/documents.parquet')"
    )
    for name in ("doc_exact_substr_spans", "doc_longest_dup_run"):
        assert_frames_equal(
            ENTRIES[name].spark(spark, sf).toPandas(),
            con.execute(ENTRIES[name].oracle).df(),
        )


# ---------------------------------------------------------------------------
# Round-12 new entries: planted-data twins + oracle parity
# ---------------------------------------------------------------------------


def _write_documents_lang(tmp_path, rows):
    """rows: (doc_id, text, lang)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    table = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], type=pa.int64()),
            "text": pa.array([r[1] for r in rows]),
            "lang": pa.array([r[2] for r in rows]),
        }
    )
    pq.write_table(table, str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def test_dup_canonical_keeps_longest_member(spark, tmp_path):
    """Planted truncation geometry: a 40-token doc, its 38-token
    truncation, and a verbatim copy under a higher id — all one
    near-dup cluster; the canonical must be the FULL doc with the
    LOWEST id (longest member, tie to min doc_id), NOT the min-id rule
    alone (doc_id 2 is the truncation, so min-id would pick wrong if
    it sorted first)."""
    import idh_etl_demo_spark.catalog_r12  # noqa: F401
    from idh_etl_demo_spark.catalog import ENTRIES

    body = " ".join(f"w{i}" for i in range(1, 41))
    trunc = " ".join(f"w{i}" for i in range(1, 39))
    other = " ".join(f"z{i}" for i in range(1, 41))
    texts = {2: trunc, 3: body, 4: body, 9: other}
    sf = _write_documents(tmp_path, texts)
    sdf = ENTRIES["doc_dup_canonical"].spark(spark, sf).toPandas()

    # the truncation family clusters together; the unrelated doc is
    # either unclustered (absent) or its own cluster
    fam = sdf[sdf.doc_id.isin([2, 3, 4])]
    assert len(fam) == 3 and fam.cluster_id.nunique() == 1
    assert (fam.cluster_size == 3).all()
    canon = fam[fam.is_canonical]
    assert list(canon.doc_id) == [3], canon  # longest, then min id
    # per-cluster invariant: exactly one canonical, and it is the
    # (n_tokens desc, doc_id asc) argmax of its cluster rows
    for cid, grp in sdf.groupby("cluster_id"):
        best = grp.sort_values(
            ["n_tokens", "doc_id"], ascending=[False, True]
        ).iloc[0]
        assert grp.is_canonical.sum() == 1
        assert grp[grp.is_canonical].iloc[0].doc_id == best.doc_id

    con = duckdb.connect()
    con.execute(
        "create view documents as select * from "
        f"read_parquet('{sf}/documents.parquet')"
    )
    assert_frames_equal(
        sdf, con.execute(ENTRIES["doc_dup_canonical"].oracle).df()
    )


def test_effective_tokens_twin(spark, tmp_path):
    """Exact dedup-discount arithmetic on planted duplicates: lang 'en'
    has a triple-duplicated 4-token doc plus a unique 6-token doc →
    raw 18, effective 10; lang 'pl' is duplicate-free → overhead 0."""
    import idh_etl_demo_spark.catalog_r12  # noqa: F401
    from idh_etl_demo_spark.catalog import ENTRIES

    rows = [
        (1, "a b c d", "en"),
        (2, "a b c d", "en"),
        (3, "a b c d", "en"),
        (4, "p q r s t u", "en"),
        (5, "x y z w", "pl"),
    ]
    sf = _write_documents_lang(tmp_path, rows)
    sdf = (
        ENTRIES["doc_effective_tokens"].spark(spark, sf).toPandas()
        .set_index("lang")
    )
    en = sdf.loc["en"]
    assert (
        en.n_docs,
        en.n_distinct_contents,
        en.raw_tokens,
        en.effective_tokens,
    ) == (4, 2, 18, 10)
    assert en.dup_token_overhead == 8 / 18
    pl = sdf.loc["pl"]
    assert (pl.raw_tokens, pl.effective_tokens, pl.dup_token_overhead) == (
        4,
        4,
        0.0,
    )
    con = duckdb.connect()
    con.execute(
        "create view documents as select * from "
        f"read_parquet('{sf}/documents.parquet')"
    )
    assert_frames_equal(
        ENTRIES["doc_effective_tokens"].spark(spark, sf).toPandas(),
        con.execute(ENTRIES["doc_effective_tokens"].oracle).df(),
    )


def test_whitening_stats_twin(spark, tmp_path):
    """Exact second moments on planted vectors: integer-micros sums
    must match a pure-Python twin bit-for-bit, the diagonal must be
    the per-dim variance, and a planted anti-correlated pair must come
    out negative."""
    import idh_etl_demo_spark.catalog_r12  # noqa: F401
    from idh_etl_demo_spark.catalog import ENTRIES
    from tests.test_r9_properties import _write_embeddings

    # dim0 and dim1 perfectly anti-correlated; dim2 constant
    X = [
        [0.5, -0.5, 0.25] + [0.0] * 5,
        [-0.5, 0.5, 0.25] + [0.0] * 5,
        [0.25, -0.25, 0.25] + [0.0] * 5,
        [-0.25, 0.25, 0.25] + [0.0] * 5,
    ]
    sf = _write_embeddings(tmp_path, X)
    sdf = ENTRIES["embedding_prefix_whitening_stats"].spark(spark, sf).toPandas()
    assert len(sdf) == 36

    q = [[round(v * 1000000) for v in row[:8]] for row in X]
    n = len(q)
    got = {(r.dim_i, r.dim_j): r for r in sdf.itertuples()}
    for i in range(8):
        for j in range(i, 8):
            si = sum(r[i] for r in q)
            sj = sum(r[j] for r in q)
            sij = sum(r[i] * r[j] for r in q)
            row = got[(i, j)]
            assert (row.sum_qi, row.sum_qj, row.sum_qij) == (si, sj, sij)
            assert row.cov_micros2 == (sij - si * sj / n) / n
    assert got[(0, 1)].cov_micros2 < 0  # anti-correlated pair
    assert got[(2, 2)].cov_micros2 == 0.0  # constant dim
    con = duckdb.connect()
    con.execute(
        "create view embeddings as select * from "
        f"read_parquet('{sf}/embeddings.parquet')"
    )
    assert_frames_equal(
        sdf,
        con.execute(ENTRIES["embedding_prefix_whitening_stats"].oracle).df(),
    )


def test_watermark_design_twin(spark, tmp_path):
    """Lateness twin with the identical md5 jitter, plus the grid
    invariants: monotone non-increasing drops and a zero 900 s row
    (the jitter bound)."""
    import datetime as dt
    import hashlib

    import idh_etl_demo_spark.catalog_r12  # noqa: F401
    from idh_etl_demo_spark.catalog import ENTRIES
    from idh_etl_demo_spark.catalog_r12 import _WM_GRID_SEC, _WM_JITTER_US
    from tests.test_r11b_properties import _write_events

    base = dt.datetime(2024, 3, 1, 12, 0, 0)
    rows = [
        (i, base + dt.timedelta(seconds=30 * i), 1, "view", 1.0)
        for i in range(200)
    ]
    sf = _write_events(tmp_path, rows)
    sdf = ENTRIES["events_watermark_design"].spark(spark, sf).toPandas()

    def jit(eid):
        return int(hashlib.md5(str(eid).encode()).hexdigest()[:15], 16) % _WM_JITTER_US

    ev = sorted(
        (
            int(ts.timestamp() * 1000000) + jit(eid),
            eid,
            int(ts.timestamp() * 1000000),
        )
        for eid, ts, *_ in rows
    )
    run, late = None, []
    for _, _, us in ev:
        late.append(max((run - us) if run is not None else 0, 0))
        run = us if run is None else max(run, us)
    want = {
        w: sum(1 for l in late if l > w * 1000000) for w in _WM_GRID_SEC
    }
    got = {r.delay_sec: r.n_dropped for r in sdf.itertuples()}
    assert got == want
    drops = [got[w] for w in _WM_GRID_SEC]
    assert drops == sorted(drops, reverse=True)  # monotone in delay
    assert got[900] == 0  # jitter bound
    assert want[0] > 0  # the planted cadence makes disorder genuine
    con = duckdb.connect()
    con.execute(
        "create view events as select * from "
        f"read_parquet('{sf}/events.parquet')"
    )
    assert_frames_equal(
        sdf, con.execute(ENTRIES["events_watermark_design"].oracle).df()
    )


def test_ahash_neardup_census_twin(spark, tmp_path):
    """Neighborhood-census twin: recompute every 12-bit aHash from the
    oracle's md5/doc_id arithmetic in Python, enumerate the 79 masks,
    and match ball counts exactly; verbatim-duplicate payloads must
    count each other (hamming 0 ⊆ ball)."""
    import idh_etl_demo_spark.catalog_r12  # noqa: F401
    from idh_etl_demo_spark.catalog import ENTRIES
    from idh_etl_demo_spark.catalog_r12 import _AH_MASKS

    texts = {i: f"payload {i % 7}" for i in range(30)}  # 7 distinct texts
    sf = _write_documents(tmp_path, texts)

    def ahash(doc_id, text):
        w, h = 1 + doc_id % 3, 1 + doc_id % 2
        mh = hashlib.md5(text.encode()).hexdigest()
        v = []
        for j in range(12):
            cell, c = j // 3, j % 3
            sy, sx = (cell // 2) * h // 2, (cell % 2) * w // 2
            v.append(ord(mh[(sy * w + sx) * 3 + c]))
        ct = [v[c] + v[c + 3] + v[c + 6] + v[c + 9] for c in range(3)]
        return sum(
            (1 << (11 - j)) for j in range(12) if v[j] * 4 > ct[j % 3]
        )

    hashes = {d: ahash(d, t) for d, t in texts.items()}
    from collections import Counter

    cnt = Counter(hashes.values())
    want = {
        d: sum(cnt.get(hv ^ m, 0) for m in _AH_MASKS) - 1
        for d, hv in hashes.items()
    }
    sdf = ENTRIES["multimodal_image_ahash_neardup"].spark(spark, sf).toPandas()
    got = {r.media_id: (r.ahash, r.n_within_h2) for r in sdf.itertuples()}
    assert {d: h for d, (h, _) in got.items()} == hashes
    assert {d: n for d, (_, n) in got.items()} == want
    # verbatim payload copies with identical dims share the hash and
    # count each other (ids 0 and 6 wrap to text '0'... pick a pair
    # with equal (text, w, h)): ids 7 and 13 → text '0'/'6'? assert
    # generally instead: every doc with a same-hash sibling has n >= 1
    for d, hv in hashes.items():
        if cnt[hv] > 1:
            assert want[d] >= 1
    con = duckdb.connect()
    con.execute(
        "create view documents as select * from "
        f"read_parquet('{sf}/documents.parquet')"
    )
    assert_frames_equal(
        sdf,
        con.execute(ENTRIES["multimodal_image_ahash_neardup"].oracle).df(),
    )


def test_snapshot_diff_twin_and_apply_identity(spark, tmp_path):
    """Changeset twin on planted orders + the closing-the-loop
    invariant: applying the emitted changeset to the base snapshot
    reproduces the current snapshot exactly (diff ∘ apply = identity —
    the reason a change data feed is trustworthy)."""
    import datetime as dt

    import idh_etl_demo_spark.catalog_r12  # noqa: F401
    from idh_etl_demo_spark.catalog import ENTRIES
    from tests.test_r11b_properties import _write_orders

    ts = dt.datetime(2024, 1, 1)
    # keys chosen to hit every class: 7 (insert), 14 (insert), 33
    # (delete: %11==3, %7!=0), 10/25 (update: %5==0), 1/2 (unchanged),
    # 35 (insert AND %5: insert wins — absent from base), 55 (update;
    # %11==0 no delete)
    keys = [1, 2, 7, 10, 14, 25, 33, 35, 55]
    rows = [(k, ts, "1-URGENT", "O") for k in keys]
    sf = _write_orders(tmp_path, rows)
    sdf = ENTRIES["orders_snapshot_diff"].spark(spark, sf).toPandas()

    cents = 10000  # o_totalprice fixed at 100.0 by the fixture
    base = {
        k: cents - (100 if k % 5 == 0 else 0)
        for k in keys
        if k % 7 != 0
    }
    cur = {k: cents for k in keys if k % 11 != 3}
    want = []
    for k in sorted(set(base) | set(cur)):
        if k not in base:
            want.append((k, "insert", None, cents))
        elif k not in cur:
            want.append((k, "delete", base[k], None))
        elif base[k] != cur[k]:
            want.append((k, "update", base[k], cur[k]))
    got = [
        (
            r.o_orderkey,
            r.change_type,
            None if r.old_cents != r.old_cents else int(r.old_cents),
            None if r.new_cents != r.new_cents else int(r.new_cents),
        )
        for r in sdf.itertuples()
    ]
    # pandas NaN → None normalization above (itertuples floats)
    import math

    def norm(x):
        return None if (isinstance(x, float) and math.isnan(x)) else x

    got = [(a, b, norm(c), norm(d)) for a, b, c, d in got]
    assert got == want
    assert {t for _, t, *_ in got} == {"insert", "delete", "update"}

    # diff ∘ apply = identity
    applied = dict(base)
    for k, typ, old, new in got:
        if typ == "insert":
            assert k not in applied
            applied[k] = new
        elif typ == "delete":
            assert applied.pop(k) == old
        else:
            assert applied[k] == old
            applied[k] = new
    assert applied == cur

    con = duckdb.connect()
    con.execute(
        "create view orders as select * from "
        f"read_parquet('{sf}/orders.parquet')"
    )
    assert_frames_equal(
        sdf, con.execute(ENTRIES["orders_snapshot_diff"].oracle).df()
    )


def _write_orders_full(tmp_path, rows):
    """rows: (o_orderkey, o_custkey, o_totalprice)."""
    import datetime as dt

    import pyarrow as pa
    import pyarrow.parquet as pq

    n = len(rows)
    table = pa.table(
        {
            "o_orderkey": pa.array([r[0] for r in rows], type=pa.int64()),
            "o_custkey": pa.array([r[1] for r in rows], type=pa.int64()),
            "o_orderstatus": pa.array(["O"] * n),
            "o_totalprice": pa.array(
                [float(r[2]) for r in rows], type=pa.float64()
            ),
            "o_orderdate": pa.array(
                [dt.datetime(2024, 1, 1)] * n, type=pa.timestamp("us")
            ),
            "o_orderpriority": pa.array(["1-URGENT"] * n),
        }
    )
    pq.write_table(table, str(tmp_path / "orders.parquet"))
    return str(tmp_path)


def test_ivm_retract_rescan_cases(spark, tmp_path):
    """The non-invertible-aggregate geometry, planted case by case:
    unique-max retraction (max must DROP — state alone cannot answer),
    tied-max retraction (rescan finds the surviving tie), non-max
    retraction (merge-only path), full retraction (customer vanishes),
    insert-only customer, and an insert exceeding the base max."""
    import idh_etl_demo_spark.catalog_r12  # noqa: F401
    from idh_etl_demo_spark.catalog import ENTRIES

    # insert <=> k%7==0; delete <=> k%7!=0 and k%13==0
    rows = [
        (13, 10, 9.0),   # delete: cust 10's UNIQUE max
        (1, 10, 5.0),    # base survivor
        (2, 10, 3.0),    # base survivor
        (21, 10, 1.0),   # insert (below new max)
        (26, 20, 7.0),   # delete: ties cust 20's max
        (3, 20, 7.0),    # base survivor carrying the tie
        (4, 20, 2.0),    # base survivor
        (39, 30, 1.0),   # delete: NON-max row
        (5, 30, 6.0),    # base survivor (the max, untouched)
        (65, 40, 4.0),   # delete: cust 40's only row -> vanishes
        (7, 50, 8.0),    # insert-only customer
        (6, 60, 3.0),    # base survivor
        (14, 60, 9.5),   # insert exceeding cust 60's base max
    ]
    sf = _write_orders_full(tmp_path, rows)
    sdf = ENTRIES["orders_ivm_agg_retract"].spark(spark, sf).toPandas()
    got = {
        r.o_custkey: (r.n_orders, r.total_cents, r.max_cents)
        for r in sdf.itertuples()
    }
    assert got == {
        10: (3, 900, 500),   # max dropped 900 -> 500 via rescan
        20: (2, 900, 700),   # tie survived the rescan
        30: (1, 600, 600),   # merge-only
        50: (1, 800, 800),
        60: (2, 1250, 950),  # insert dethroned the base max
    }
    assert 40 not in got  # fully retracted customer vanished
    con = duckdb.connect()
    con.execute(
        "create view orders as select * from "
        f"read_parquet('{sf}/orders.parquet')"
    )
    assert_frames_equal(
        sdf, con.execute(ENTRIES["orders_ivm_agg_retract"].oracle).df()
    )


def _write_customers(tmp_path, rows):
    """rows: (c_custkey, c_nationkey, c_mktsegment, c_acctbal)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    table = pa.table(
        {
            "c_custkey": pa.array([r[0] for r in rows], type=pa.int64()),
            "c_nationkey": pa.array([r[1] for r in rows], type=pa.int64()),
            "c_mktsegment": pa.array([r[2] for r in rows]),
            "c_acctbal": pa.array(
                [float(r[3]) for r in rows], type=pa.float64()
            ),
        }
    )
    pq.write_table(table, str(tmp_path / "customer.parquet"))
    return str(tmp_path)


def test_kanonymity_boundary_and_share(spark, tmp_path):
    """k = 10 boundary: a class of exactly 10 is NOT at risk, 9 is;
    the risky share counts ROWS in risky classes, not classes; the
    balance banding uses floor (negative balances land in band -1)."""
    import idh_etl_demo_spark.catalog_r12  # noqa: F401
    from idh_etl_demo_spark.catalog import ENTRIES

    rows = []
    k = 1
    for _ in range(10):  # class A: size 10 (not risky)
        rows.append((k, 1, "BUILDING", 500.0)); k += 1
    for _ in range(9):   # class B: size 9 (risky)
        rows.append((k, 1, "MACHINERY", 500.0)); k += 1
    rows.append((k, 2, "BUILDING", -50.0)); k += 1  # class C: size 1, band -1
    sf = _write_customers(tmp_path, rows)
    sdf = ENTRIES["customer_kanonymity_audit"].spark(spark, sf).toPandas()
    by = {
        (r.c_nationkey, r.c_mktsegment, r.balance_band): r
        for r in sdf.itertuples()
    }
    a = by[(1, "BUILDING", 0)]
    b = by[(1, "MACHINERY", 0)]
    c = by[(2, "BUILDING", -1)]
    assert (a.class_size, bool(a.at_risk)) == (10, False)  # boundary
    assert (b.class_size, bool(b.at_risk)) == (9, True)
    assert (c.class_size, bool(c.at_risk)) == (1, True)
    assert a.risky_row_share == 10 / 20  # 9 + 1 risky rows of 20
    con = duckdb.connect()
    con.execute(
        "create view customer as select * from "
        f"read_parquet('{sf}/customer.parquet')"
    )
    assert_frames_equal(
        sdf, con.execute(ENTRIES["customer_kanonymity_audit"].oracle).df()
    )


def test_ivmj_stored_base_survives_cache_release(spark, tmp_path):
    """The stored base view registers with the streaming-workdir
    reaper: after release_stream_workdirs() (what bench.py's cache
    clearing calls), the memo must not serve a dangling path — the
    next call re-materializes and the entry stays correct."""
    import idh_etl_demo_spark.catalog_r11  # noqa: F401
    from idh_etl_demo_spark.catalog import ENTRIES
    from idh_etl_demo_spark.catalog_r10 import release_stream_workdirs
    from tests.test_r11b_properties import _write_orders
    import datetime as dt

    import pyarrow as pa
    import pyarrow.parquet as pq

    ts = dt.datetime(2024, 1, 1)
    sf = _write_orders(
        tmp_path, [(k, ts, "1-URGENT", "O") for k in range(1, 30)]
    )
    # the join entry also needs a customer table
    pq.write_table(
        pa.table(
            {
                "c_custkey": pa.array([1], type=pa.int64()),
                "c_nationkey": pa.array([3], type=pa.int64()),
                "c_mktsegment": pa.array(["BUILDING"]),
            }
        ),
        str(tmp_path / "customer.parquet"),
    )
    # simulate an earlier streaming test having registered its own
    # (empty) memo — the regression this test exists for: a VALUE-based
    # membership check would then skip registering the IVM memo, and
    # the release below would delete the parquet dir while the memo
    # kept serving the dangling path
    from idh_etl_demo_spark.catalog_r10 import _STREAM_MEMOS

    decoy: dict = {}
    _STREAM_MEMOS.append(decoy)
    try:
        first = ENTRIES["orders_ivm_join"].spark(spark, sf).toPandas()
        release_stream_workdirs()
        second = ENTRIES["orders_ivm_join"].spark(spark, sf).toPandas()
        assert first.equals(second)
    finally:
        if any(m is decoy for m in _STREAM_MEMOS):
            _STREAM_MEMOS.remove(decoy)
