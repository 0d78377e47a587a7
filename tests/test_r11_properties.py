"""Round-11 property tests: every new entry pinned against a
pure-Python twin on PLANTED data, plus full oracle parity on the
planted tables (the per-entry checklist's hard gate).

- CCNet-over-KN buckets: bucket labels and rates must match a twin
  that computes the identical cleared-rational KN expression and cuts
  ntile terciles by explicit rank — proving the threshold-comparison
  assignment is ntile-identical.
- Incremental ExactSubstr: a planted cross-snapshot duplicate (delta
  copying base text) and a verbatim re-crawl must produce exact spans;
  a base-only duplicate must NOT appear (base is never re-emitted).
- URL bloom dedup: verdicts must match a hashlib twin bit-for-bit,
  exact_seen ⇒ bloom_seen (no false negatives — the bloom theorem),
  and a MINED colliding URL must surface as a counted false positive.
"""

from __future__ import annotations

import hashlib

import duckdb
import pytest

from tests.compare import assert_frames_equal
from tests.test_r10_properties import (
    _kn_planted_texts,
    _py_exact_substr,
    _py_kn,
    _write_documents,
)


# ---------------------------------------------------------------------------
# CCNet buckets over the KN LM — twin-exact rates, ntile-identical cut
# ---------------------------------------------------------------------------


def test_ccnet_kn_buckets_match_python_twin_and_ntile(spark, tmp_path):
    from idh_etl_demo_spark.catalog import ENTRIES
    import idh_etl_demo_spark.catalog_r11  # noqa: F401

    texts = _kn_planted_texts()
    sf = _write_documents(tmp_path, texts)
    sdf = (
        ENTRIES["doc_ccnet_kn_buckets"].spark(spark, sf).toPandas()
    )
    con = duckdb.connect()
    con.execute(
        f"create view documents as select * from read_parquet('{sf}/documents.parquet')"
    )
    assert_frames_equal(
        sdf, con.execute(ENTRIES["doc_ccnet_kn_buckets"].oracle).df()
    )

    # twin: identical KN expression over the train split, identical
    # rate, explicit-rank ntile buckets
    toks = {d: t.split() for d, t in texts.items()}
    train = {d: t for d, t in toks.items() if d % 10 != 0}
    p, _, _, _ = _py_kn(train)
    rates = {}
    for d, t in toks.items():
        grams = list(zip(t, t[1:]))
        n_imp = sum(1 for w1, w2 in grams if p(w1, w2) < 0.025)
        rates[d] = (n_imp / len(grams)) if grams else 0.0
    order = sorted(rates, key=lambda d: (rates[d], d))
    n = len(order)
    k1 = n // 3 + min(n % 3, 1)
    k2 = 2 * (n // 3) + min(n % 3, 2)
    want_bucket = {
        d: ("head" if i < k1 else "middle" if i < k2 else "tail")
        for i, d in enumerate(order)
    }
    got = {r.doc_id: r for r in sdf.itertuples()}
    assert set(got) == set(rates)
    for d in rates:
        assert got[d].improbable_rate == rates[d], d  # bit-for-bit
        assert got[d].bucket == want_bucket[d], d
    # the semantic point: the all-seen held-out doc (a train doc
    # verbatim, lowest doc_id at rate 0.0) is head
    assert got[0].bucket == "head"
    # and all three buckets are populated at ntile sizes
    sizes = sdf.bucket.value_counts().to_dict()
    assert sizes["head"] == k1 and sizes["middle"] == k2 - k1


def test_ccnet_kn_buckets_tercile_edges(spark, tmp_path):
    """n % 3 != 0 edge: ntile gives the first buckets the extra rows —
    the threshold cut must reproduce that exactly (4 docs → 2/1/1)."""
    from idh_etl_demo_spark.catalog import ENTRIES
    import idh_etl_demo_spark.catalog_r11  # noqa: F401

    texts = {
        # train docs establish 'a b' as the only frequent transition
        1: "a b a b a b",
        2: "a b a b",
        3: "a b xx1 yy1",
        # held-out doc of unseen-context transitions → highest rate
        0: "zz1 zz2 zz3 zz4",
    }
    sf = _write_documents(tmp_path, texts)
    sdf = ENTRIES["doc_ccnet_kn_buckets"].spark(spark, sf).toPandas()
    con = duckdb.connect()
    con.execute(
        f"create view documents as select * from read_parquet('{sf}/documents.parquet')"
    )
    assert_frames_equal(
        sdf, con.execute(ENTRIES["doc_ccnet_kn_buckets"].oracle).df()
    )
    sizes = sdf.bucket.value_counts().to_dict()
    assert sizes == {"head": 2, "middle": 1, "tail": 1}


# ---------------------------------------------------------------------------
# Incremental ExactSubstr — cross-snapshot spans, base never re-walked out
# ---------------------------------------------------------------------------


def test_incremental_exact_substr_cross_snapshot(spark, tmp_path):
    """Planted base+delta geometry (doc_id % 5 / % 25 framing):
    - doc 4 (delta) copies a 60-token run from base doc 1 → span [0,60)
      — the cross-snapshot duplicate the entry exists for;
    - doc 0 (base, % 25 == 0) is re-crawled verbatim as 1000000 → the
      re-crawl gets a full-length span;
    - base docs 2/3 share a 55-token run — a base-only duplicate that
      must NOT appear (base is never re-emitted);
    - all spans match the brute-force twin over the combined corpus,
      filtered to delta ids; full oracle parity on the planted table."""
    from idh_etl_demo_spark.catalog import ENTRIES
    import idh_etl_demo_spark.catalog_r11  # noqa: F401

    run60 = [f"dup{i}" for i in range(60)]
    run55 = [f"bb{i}" for i in range(55)]
    u60 = [f"uu{i}" for i in range(60)]
    toks = {
        0: u60,  # base, re-crawled as 1000000
        1: [f"f1x{i}" for i in range(4)] + run60,  # base source of the copy
        2: run55 + [f"f2y{i}" for i in range(3)],  # base-only dup pair
        3: [f"f3x{i}" for i in range(5)] + run55,
        4: run60 + [f"f4y{i}" for i in range(6)],  # delta, copies doc 1
    }
    texts = {d: " ".join(t) for d, t in toks.items()}
    sf = _write_documents(tmp_path, texts)

    sdf = (
        ENTRIES["doc_exact_substr_incremental"].spark(spark, sf).toPandas()
    )
    con = duckdb.connect()
    con.execute(
        f"create view documents as select * from read_parquet('{sf}/documents.parquet')"
    )
    assert_frames_equal(
        sdf, con.execute(ENTRIES["doc_exact_substr_incremental"].oracle).df()
    )

    combined = dict(toks)
    combined[1000000] = toks[0]  # the re-crawl
    _, py_spans, _ = _py_exact_substr(combined, 50)
    delta_ids = {4, 1000000}
    want = {
        (d, s, e) for d, sp in py_spans.items() if d in delta_ids for s, e in sp
    }
    got = {(r.doc_id, r.span_start, r.span_end) for r in sdf.itertuples()}
    assert got == want
    # the planted geometry, explicitly
    assert (4, 0, 60) in got  # cross-snapshot copy of base text
    assert (1000000, 0, 60) in got  # verbatim re-crawl, full-length span
    assert not {d for d, _, _ in got} - delta_ids  # base never emitted
    # the base-only 55-token duplicate produced no output at all
    assert py_spans[2] and py_spans[3]  # the twin DOES see it on base…
    assert {d for d, _, _ in got} == delta_ids  # …but the entry never emits it


def test_incremental_walk_filters_base_only_pairs(spark):
    """The pair_filter hook: with a delta predicate, the adjacent-pair
    frame the LCP walk consumes contains ONLY pairs touching a delta
    position — the O(|delta|) walk claim, asserted on the frame
    itself."""
    import pyspark.sql.functions as F

    from idh_etl_demo_spark.operators.suffix import (
        suffix_lcp_adjacent,
        suffix_ranks,
    )

    docs = {
        0: [f"x{i}" for i in range(8)],
        1: [f"y{i}" for i in range(8)],
        9: [f"z{i}" for i in range(8)],  # the "delta" doc
    }
    base = spark.createDataFrame(
        [(d, t) for d, t in docs.items()], "doc_id long, toks array<string>"
    )
    final, history, pos = suffix_ranks(base)
    lens = base.select(
        "doc_id", F.size("toks").cast("long").alias("n_tokens")
    )
    delta = lambda c: c == 9  # noqa: E731
    pairs = suffix_lcp_adjacent(
        final, history, pos, lens,
        pair_filter=delta(F.col("d1")) | delta(F.col("d2")),
    ).collect()
    assert pairs  # the delta doc has neighbors
    assert all(r.d1 == 9 or r.d2 == 9 for r in pairs)
    n_all = len(
        suffix_lcp_adjacent(final, history, pos, lens).collect()
    )
    assert len(pairs) < n_all  # strictly fewer pairs walked


# ---------------------------------------------------------------------------
# URL bloom dedup — hashlib twin, no-false-negative theorem, mined FP
# ---------------------------------------------------------------------------

_UB_M, _UB_K = 16384, 2
_UB_URL = "https://corpus.example/doc/"


def _py_bloom_positions(url: str) -> list[int]:
    h = hashlib.md5(url.encode()).hexdigest()
    return [int(h[8 * j : 8 * j + 8], 16) % _UB_M for j in range(_UB_K)]


def _mine_colliding_delta_id(seen_bits: set[int]) -> int:
    """Smallest doc_id ≡ 4 (mod 5) whose url's bloom positions are all
    already set by the seen registry — a deterministic true false
    positive (the same id every run: the scan is ascending)."""
    c = 4
    while True:
        if all(p in seen_bits for p in _py_bloom_positions(f"{_UB_URL}{c}")):
            return c
        c += 5
        if c > 50_000_000:  # pragma: no cover - sizing makes this unreachable
            pytest.fail("no colliding id found")


def test_url_bloom_dedup_twin_and_fp_audit(spark, tmp_path):
    from idh_etl_demo_spark.catalog import ENTRIES
    import idh_etl_demo_spark.catalog_r11  # noqa: F401

    # registry: 40 base ids (doc_id % 5 != 4); ids divisible by 25
    # (0, 25) are re-crawled into the batch as exact-seen rows
    base_ids = [i for i in range(50) if i % 5 != 4]
    seen_bits = {
        p
        for i in base_ids
        for p in _py_bloom_positions(f"{_UB_URL}{i}")
    }
    fp_id = _mine_colliding_delta_id(seen_bits)
    ids = sorted(set(base_ids) | {i for i in range(50) if i % 5 == 4} | {fp_id})
    texts = {i: f"doc body {i}" for i in ids}
    sf = _write_documents(tmp_path, texts)

    sdf = ENTRIES["doc_url_bloom_dedup"].spark(spark, sf).toPandas()
    con = duckdb.connect()
    con.execute(
        f"create view documents as select * from read_parquet('{sf}/documents.parquet')"
    )
    assert_frames_equal(
        sdf, con.execute(ENTRIES["doc_url_bloom_dedup"].oracle).df()
    )

    seen_urls = {f"{_UB_URL}{i}" for i in base_ids}
    n_fp = 0
    for r in sdf.itertuples():
        want_bloom = all(p in seen_bits for p in _py_bloom_positions(r.url))
        want_exact = r.url in seen_urls
        assert bool(r.bloom_seen) == want_bloom, r.url
        assert bool(r.exact_seen) == want_exact, r.url
        assert bool(r.false_positive) == (want_bloom and not want_exact)
        if want_exact:
            assert r.bloom_seen  # a bloom filter NEVER false-negatives
        n_fp += int(r.false_positive)
    assert n_fp >= 1  # the mined collision genuinely fired
    mined = sdf[sdf.doc_id == fp_id]
    assert bool(mined.false_positive.iloc[0])
    row = sdf.iloc[0]
    n_new = int(row.n_new_exact)
    assert int(row.n_false_positives) == n_fp
    assert row.fp_rate == n_fp / n_new  # one IEEE division, bit-exact


# ---------------------------------------------------------------------------
# Incremental view maintenance — delta rules proved against recompute
# ---------------------------------------------------------------------------


def _write_orders_customer(tmp_path, orders_rows, customer_rows):
    """orders_rows: (o_orderkey, o_custkey, o_totalprice);
    customer_rows: (c_custkey, c_nationkey, c_mktsegment)."""
    import datetime as dt

    import pyarrow as pa
    import pyarrow.parquet as pq

    n = len(orders_rows)
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array([r[0] for r in orders_rows], type=pa.int64()),
                "o_custkey": pa.array([r[1] for r in orders_rows], type=pa.int64()),
                "o_orderstatus": pa.array(["O"] * n),
                "o_totalprice": pa.array([r[2] for r in orders_rows], type=pa.float64()),
                "o_orderdate": pa.array(
                    [dt.datetime(2024, 1, 1)] * n, type=pa.timestamp("us")
                ),
                "o_orderpriority": pa.array(["1-URGENT"] * n),
                "o_clerk": pa.array(["c"] * n),
                "o_shippriority": pa.array([0] * n, type=pa.int32()),
                "o_comment": pa.array([""] * n),
            }
        ),
        str(tmp_path / "orders.parquet"),
    )
    m = len(customer_rows)
    pq.write_table(
        pa.table(
            {
                "c_custkey": pa.array([r[0] for r in customer_rows], type=pa.int64()),
                "c_name": pa.array([f"cust{r[0]}" for r in customer_rows]),
                "c_nationkey": pa.array([r[1] for r in customer_rows], type=pa.int32()),
                "c_acctbal": pa.array([0.0] * m, type=pa.float64()),
                "c_mktsegment": pa.array([r[2] for r in customer_rows]),
            }
        ),
        str(tmp_path / "customer.parquet"),
    )
    return str(tmp_path)


def test_ivm_agg_merge_equals_recompute(spark, tmp_path):
    """The merged (base ⊎ delta) aggregate state must equal a full
    recompute — with both splits genuinely non-empty per key class:
    a key with only base rows, only delta rows (o_orderkey % 7 == 0),
    and a mix; avg must be the exact division of merged int64 sums."""
    from idh_etl_demo_spark.catalog import ENTRIES
    import idh_etl_demo_spark.catalog_r11  # noqa: F401

    orders = [
        (1, 100, 10.00),   # base (1 % 7 != 0)
        (2, 100, 20.00),   # base
        (7, 100, 40.00),   # delta (7 % 7 == 0) → mixed key 100
        (14, 200, 5.50),   # delta-only key 200
        (3, 300, 7.25),    # base-only key 300
        (21, 200, 4.50),   # second delta row for 200
    ]
    sf = _write_orders_customer(tmp_path, orders, [(100, 1, "SEG")])
    sdf = ENTRIES["orders_ivm_agg"].spark(spark, sf).toPandas()
    con = duckdb.connect()
    con.execute(
        f"create view orders as select * from read_parquet('{sf}/orders.parquet')"
    )
    assert_frames_equal(sdf, con.execute(ENTRIES["orders_ivm_agg"].oracle).df())

    got = {r.o_custkey: r for r in sdf.itertuples()}
    assert (got[100].n_orders, got[100].total_cents, got[100].max_cents) == (
        3, 7000, 4000,
    )
    assert (got[200].n_orders, got[200].total_cents) == (2, 1000)
    assert got[300].n_orders == 1
    assert got[100].avg_cents == 7000 / 3  # exact division of merged sums


def test_ivm_join_terms_are_disjoint_and_complete(spark, tmp_path):
    """The bilinear delta terms must recover the full join exactly once
    per row: a new customer's BACKDATED orders (the ΔO-includes-new-
    customers rule), an old customer's delta order, and an orphan order
    with no customer row (inner join drops it)."""
    from idh_etl_demo_spark.catalog import ENTRIES
    import idh_etl_demo_spark.catalog_r11  # noqa: F401

    customers = [
        (1, 10, "OLD"),    # base customer (1 % 9 != 0)
        (9, 20, "NEW"),    # delta customer (9 % 9 == 0)
    ]
    orders = [
        (1, 1, 10.00),     # base order, old customer  → Ob⋈Cb
        (7, 1, 20.00),     # delta order, old customer → ΔO⋈Cb
        (2, 9, 30.00),     # backdated order of the NEW customer → ΔO⋈ΔC
        (7000, 9, 40.00),  # %7 delta order of the new customer  → ΔO⋈ΔC
        (3, 555, 50.00),   # orphan: no customer row → dropped
    ]
    sf = _write_orders_customer(tmp_path, orders, customers)
    sdf = ENTRIES["orders_ivm_join"].spark(spark, sf).toPandas()
    con = duckdb.connect()
    con.execute(
        f"create view orders as select * from read_parquet('{sf}/orders.parquet')"
    )
    con.execute(
        f"create view customer as select * from read_parquet('{sf}/customer.parquet')"
    )
    assert_frames_equal(sdf, con.execute(ENTRIES["orders_ivm_join"].oracle).df())

    # exactly-once recovery: every joined order appears once, no dupes
    assert sorted(sdf.o_orderkey) == [1, 2, 7, 7000]
    assert len(sdf.o_orderkey.unique()) == len(sdf)
    # the orphan never joined
    assert 3 not in set(sdf.o_orderkey)
    # the new customer's backdated order came through the ΔO⋈ΔC term
    assert set(sdf[sdf.o_custkey == 9].o_orderkey) == {2, 7000}


# ---------------------------------------------------------------------------
# LSH tuning audit — hashlib twin, nested-grid monotonicity theorems
# ---------------------------------------------------------------------------


def _py_minhash_sigs(text: str):
    from idh_etl_demo_spark.functions.hashing import (
        MERSENNE_31,
        MINHASH_PARAMS,
    )

    words = " ".join(text.lower().strip().split()).split(" ")
    sh = sorted({" ".join(words[i : i + 3]) for i in range(len(words) - 2)})
    hs = [
        int(hashlib.md5(s.encode()).hexdigest()[:15], 16) % MERSENNE_31
        for s in sh
    ]
    return [
        min(((a * h + b) % MERSENNE_31 for h in hs), default=MERSENNE_31)
        for a, b in MINHASH_PARAMS[:12]
    ]


def _py_jaccard(t1: str, t2: str) -> float:
    def sh(t):
        w = " ".join(t.lower().strip().split()).split(" ")
        return {" ".join(w[i : i + 3]) for i in range(len(w) - 2)}

    a, b = sh(t1), sh(t2)
    return len(a & b) / len(a | b) if a | b else 0.0


def test_lsh_tuning_audit_twin_and_nested_monotonicity(spark, tmp_path):
    """Every grid row must match a hashlib twin evaluating band
    agreement directly on the signatures, and the nested-grid subset
    THEOREMS must hold: candidates(2,6) ⊆ candidates(4,3) ⊆
    candidates(6,2) and candidates(3,4) ⊆ candidates(6,2) — a 4-aligned
    (or 6-aligned, 3-aligned) agreeing row block always contains a
    complete finer band. Planted corpus: near-identical pairs at
    graded overlap so configs genuinely differ."""
    from idh_etl_demo_spark.catalog import ENTRIES
    import idh_etl_demo_spark.catalog_r11  # noqa: F401
    from idh_etl_demo_spark.catalog_r11 import _LSH_GRID

    base = [f"w{i}" for i in range(40)]
    texts = {
        0: " ".join(base),                                  # original
        1: " ".join(base),                                  # exact dup
        2: " ".join(base[:30] + [f"x{i}" for i in range(10)]),  # ~0.6 overlap
        3: " ".join(base[:15] + [f"y{i}" for i in range(25)]),  # ~0.2 overlap
        4: " ".join(f"z{i}" for i in range(40)),            # unrelated
    }
    sf = _write_documents(tmp_path, texts)
    sdf = ENTRIES["doc_lsh_tuning_audit"].spark(spark, sf).toPandas()
    con = duckdb.connect()
    con.execute(
        f"create view documents as select * from read_parquet('{sf}/documents.parquet')"
    )
    assert_frames_equal(
        sdf, con.execute(ENTRIES["doc_lsh_tuning_audit"].oracle).df()
    )

    sigs = {d: _py_minhash_sigs(t) for d, t in texts.items()}
    ids = sorted(texts)
    pairs = [(a, b) for a in ids for b in ids if a < b]
    true_pairs = {p for p in pairs if _py_jaccard(texts[p[0]], texts[p[1]]) >= 0.5}

    def cands(bands, rows):
        out = set()
        for a, b in pairs:
            for bi in range(bands):
                seg = slice(bi * rows, (bi + 1) * rows)
                if sigs[a][seg] == sigs[b][seg]:
                    out.add((a, b))
                    break
        return out

    got = {(r.bands, r.rows_per_band): r for r in sdf.itertuples()}
    cand_sets = {}
    for bands, rows in _LSH_GRID:
        c = cands(bands, rows)
        cand_sets[(bands, rows)] = c
        r = got[(bands, rows)]
        assert r.n_candidates == len(c), (bands, rows)
        assert r.n_true_pairs == len(true_pairs)
        assert r.n_hits == len(c & true_pairs)
        assert r.n_missed == len(true_pairs - c)
        want_p = len(c & true_pairs) / len(c) if c else 0.0
        want_r = len(c & true_pairs) / len(true_pairs) if true_pairs else 0.0
        assert r.precision == want_p and r.recall == want_r
    # the exact dup must collide in EVERY config; the unrelated doc in none
    for c in cand_sets.values():
        assert (0, 1) in c
        assert not any(4 in p for p in c)
    # nested subset theorems
    assert cand_sets[(2, 6)] <= cand_sets[(4, 3)] <= cand_sets[(6, 2)]
    assert cand_sets[(3, 4)] <= cand_sets[(6, 2)]


# ---------------------------------------------------------------------------
# Winsorization — nearest-rank bounds, clip counts, sums vs a twin
# ---------------------------------------------------------------------------


def test_winsorized_stats_twin_and_edges(spark, tmp_path):
    """Planted fat tail: bounds must be the exact nearest-rank VALUES,
    clip counts must count strictly-outside rows, and the winsorized
    sum must equal the twin's clipped sum; a small group (n < 100)
    degenerates to lo = min (rank 1) without clipping the low side."""
    from idh_etl_demo_spark.catalog import ENTRIES
    import idh_etl_demo_spark.catalog_r11  # noqa: F401

    # flag A: 200 rows 1.00..2.99 plus one huge outlier; flag B: 5 rows
    rows, k = [], 1
    a_cents = []
    for i in range(200):
        price = 1.0 + i / 100.0
        a_cents.append(round(price * 100))
        rows.append((k, 1, "A", price)); k += 1
    rows.append((k, 1, "A", 9999.99)); a_cents.append(999999); k += 1
    b_prices = [5.0, 1.0, 3.0, 2.0, 4.0]
    for p in b_prices:
        rows.append((k, 2, "B", p)); k += 1

    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array([r[0] for r in rows], type=pa.int64()),
                "l_linenumber": pa.array([r[1] for r in rows], type=pa.int32()),
                "l_returnflag": pa.array([r[2] for r in rows]),
                "l_extendedprice": pa.array([r[3] for r in rows], type=pa.float64()),
            }
        ),
        str(tmp_path / "lineitem.parquet"),
    )
    sf = str(tmp_path)
    sdf = ENTRIES["lineitem_winsorized_stats"].spark(spark, sf).toPandas()
    con = duckdb.connect()
    con.execute(
        f"create view lineitem as select * from read_parquet('{sf}/lineitem.parquet')"
    )
    assert_frames_equal(
        sdf, con.execute(ENTRIES["lineitem_winsorized_stats"].oracle).df()
    )

    def twin(cents):
        s = sorted(cents)
        n = len(s)
        lo = s[(n - 1) // 100]          # rank (n-1)//100 + 1, 0-indexed
        hi = s[(99 * (n - 1)) // 100]
        clipped = [min(max(c, lo), hi) for c in cents]
        return (
            n, lo, hi,
            sum(1 for c in cents if c < lo),
            sum(1 for c in cents if c > hi),
            sum(cents), sum(clipped),
        )

    got = {r.flag: r for r in sdf.itertuples()}
    for flag, cents in (("A", a_cents), ("B", [round(p * 100) for p in b_prices])):
        n, lo, hi, ncl, nch, sc, sw = twin(cents)
        r = got[flag]
        assert (r.n, r.p01_cents, r.p99_cents) == (n, lo, hi), flag
        assert (r.n_clipped_low, r.n_clipped_high) == (ncl, nch), flag
        assert (r.sum_cents, r.sum_winsorized_cents) == (sc, sw), flag
    # the fat tail was actually clipped: winsorized < raw for A
    assert got["A"].sum_winsorized_cents < got["A"].sum_cents
    # small group: lo is the minimum, nothing clips low
    assert got["B"].p01_cents == 100 and got["B"].n_clipped_low == 0
