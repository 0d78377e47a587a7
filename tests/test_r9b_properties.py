"""Late round-9 property tests: Matryoshka adaptive retrieval and KMV
sketch set operations vs pure-Python references (catalog_r9b)."""

from __future__ import annotations

import hashlib
import math
import os

import pytest

SF = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")

_DOMAIN = float(1 << 60)


# ---------------------------------------------------------------------------
# pure-Python twins
# ---------------------------------------------------------------------------


def _quant(emb):
    return [round(float(x) * 10000) for x in emb]


def _cos(a, b, w=None):
    if w is not None:
        a, b = a[:w], b[:w]
    dot = sum(x * y for x, y in zip(a, b))
    qq = sum(x * x for x in a)
    cc = sum(y * y for y in b)
    return dot / (math.sqrt(qq) * math.sqrt(cc))


def _load_vecs(spark):
    rows = spark.read.parquet(f"{SF}/embeddings.parquet").collect()
    return {r.vec_id: _quant(r.embedding) for r in rows}


def _py_mrl_audit(vecs, widths=(8, 16, 32), full=64, topk=5):
    queries = sorted(i for i in vecs if i % 25 == 0)
    top = {}
    for w in (*widths, full):
        for q in queries:
            ranked = sorted(
                ((-_cos(vecs[q], vecs[c], None if w == full else w), c)
                 for c in vecs if c != q),
            )
            top[(w, q)] = {c for _, c in ranked[:topk]}
    possible = topk * len(queries)
    out = []
    for w in widths:
        hits = sum(
            len(top[(w, q)] & top[(full, q)]) for q in queries
        )
        out.append((w, hits, possible, hits / possible))
    return out


def _py_mrl_rerank(vecs, serve_w=16, shortlist=25, topk=5):
    queries = sorted(i for i in vecs if i % 25 == 0)
    rows = []
    for q in queries:
        pref = sorted(
            (-_cos(vecs[q], vecs[c], serve_w), c) for c in vecs if c != q
        )
        short = {c: i + 1 for i, (_, c) in enumerate(pref[:shortlist])}
        exact = sorted((-_cos(vecs[q], vecs[c]), c) for c in short)
        for rank0, (negcos, c) in enumerate(exact[:topk]):
            rows.append((q, c, -negcos, short[c], rank0 + 1))
    return rows


def _py_kmv_hash(user, d):
    s = f"{user}|{d.isoformat()}"
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _py_kmv_set_ops(members, k=64):
    """members: set of (event_type, user_id, date). Returns rows keyed
    (type_a, type_b) mirroring events_kmv_set_ops column-for-column."""
    types = sorted({t for t, _, _ in members})
    sets = {t: {(u, d) for tt, u, d in members if tt == t} for t in types}
    hashes = {
        t: sorted({_py_kmv_hash(u, d) for u, d in sets[t]}) for t in types
    }
    sketch = {t: hashes[t][:k] for t in types}
    out = []
    for i, ta in enumerate(types):
        for tb in types[i + 1 :]:
            merged = sorted(set(sketch[ta]) | set(sketch[tb]))
            k_used = min(k, len(merged))
            kth = merged[k_used - 1]
            sa, sb = set(sketch[ta]), set(sketch[tb])
            shared = sum(1 for h in merged[:k] if h in sa and h in sb)
            cnt_a, cnt_b = len(sets[ta]), len(sets[tb])
            complete = cnt_a < k and cnt_b < k
            if complete:
                est_union = float(len(merged))
            else:
                est_union = float(k_used - 1) * _DOMAIN / kth
            if complete and len(merged) <= k:
                est_inter = float(shared)
            else:
                est_inter = shared / k_used * est_union
            exact_inter = len(sets[ta] & sets[tb])
            out.append(
                (
                    ta, tb, k_used, kth, shared,
                    est_union, est_inter,
                    cnt_a + cnt_b - exact_inter, exact_inter,
                )
            )
    return out


# ---------------------------------------------------------------------------
# embedding_matryoshka_recall_audit
# ---------------------------------------------------------------------------


def test_matryoshka_audit_matches_python_reference(spark):
    """The audit on the REAL sf0.001 embeddings must equal a pure-Python
    twin computing every width's prefix-cosine top-5 and the full-dim
    truth with the same quantized-integer arithmetic — and the
    measurement must be non-vacuous: on isotropic vectors the width-8
    recall is strictly below the width-32 recall, both below 1."""
    from idh_etl_demo_spark.catalog import ENTRIES
    import idh_etl_demo_spark.catalog_r9b  # noqa: F401

    vecs = _load_vecs(spark)
    expected = _py_mrl_audit(vecs)
    got = (
        ENTRIES["embedding_matryoshka_recall_audit"]
        .spark(spark, SF)
        .collect()
    )
    assert [(r.width, r.hits, r.possible, r.recall) for r in got] == expected
    rec = {r.width: r.recall for r in got}
    assert rec[8] < rec[32] < 1.0
    assert rec[32] > 0.0


def test_matryoshka_width8_perfect_on_structured_data(spark, tmp_path):
    """THE claim prefix retrieval exists for (Kusupati et al. 2022):
    when the representation is Matryoshka-structured — signal in the
    leading dims, tail refinement only — a short prefix recalls
    perfectly. Constructs 8 clusters of 6 whose direction lives in the
    first 8 dims (tail = 1e-3 noise), runs the REAL audit entry,
    checks full DuckDB-oracle parity on that input, and asserts
    recall == 1.0 at EVERY width."""
    import duckdb
    import numpy as np

    from idh_etl_demo_spark.catalog import ENTRIES
    import idh_etl_demo_spark.catalog_r9b  # noqa: F401
    from tests.compare import assert_frames_equal
    from tests.test_r9_properties import _write_embeddings

    rng = np.random.RandomState(11)
    C = rng.randn(8, 8)
    C /= np.linalg.norm(C, axis=1, keepdims=True)
    X = []
    for i in range(48):
        head = C[i // 6] + 0.01 * rng.randn(8)
        tail = 0.001 * rng.randn(56)
        X.append(np.concatenate([head, tail]))
    sf = _write_embeddings(tmp_path, X)

    sdf = (
        ENTRIES["embedding_matryoshka_recall_audit"].spark(spark, sf).toPandas()
    )
    con = duckdb.connect()
    con.execute(
        f"create view embeddings as select * from "
        f"read_parquet('{sf}/embeddings.parquet')"
    )
    assert_frames_equal(
        sdf,
        con.execute(ENTRIES["embedding_matryoshka_recall_audit"].oracle).df(),
    )
    assert list(sdf.recall) == [1.0, 1.0, 1.0], sdf
    assert list(sdf.hits) == list(sdf.possible)


# ---------------------------------------------------------------------------
# embedding_matryoshka_rerank
# ---------------------------------------------------------------------------


def test_matryoshka_rerank_matches_python_reference(spark):
    """The funnel-serving entry on the REAL sf0.001 embeddings must
    equal the pure-Python twin (prefix-16 top-25, exact-64 top-5, same
    tie-breaks), and the exact stage must actually REORDER: on
    isotropic data most winners sit DEEP in the prefix shortlist, so
    reranking is doing real work (not rubber-stamping the prefix
    order)."""
    from idh_etl_demo_spark.catalog import ENTRIES
    import idh_etl_demo_spark.catalog_r9b  # noqa: F401

    vecs = _load_vecs(spark)
    expected = _py_mrl_rerank(vecs)
    got = ENTRIES["embedding_matryoshka_rerank"].spark(spark, SF).collect()
    assert [
        (r.query_id, r.neighbor_id, r.cosine_sim, r.prefix_rank, r.rank)
        for r in got
    ] == expected
    assert any(r.prefix_rank != r.rank for r in got)
    assert any(r.prefix_rank > 5 for r in got)


# ---------------------------------------------------------------------------
# events_kmv_set_ops
# ---------------------------------------------------------------------------


def test_kmv_set_ops_matches_python_reference(spark):
    """The sketch set-ops entry on the REAL sf0.001 events must equal a
    pure-Python twin of the whole pipeline — member sets, md5 bottom-k
    sketches, merged-sketch estimators with the identical double
    association order — column for column, bit for bit."""
    from idh_etl_demo_spark.catalog import ENTRIES
    import idh_etl_demo_spark.catalog_r9b  # noqa: F401

    ev = spark.read.parquet(f"{SF}/events.parquet").collect()
    members = {(r.event_type, r.user_id, r.ts.date()) for r in ev}
    expected = _py_kmv_set_ops(members)
    got = ENTRIES["events_kmv_set_ops"].spark(spark, SF).collect()
    assert [
        (
            r.type_a, r.type_b, r.k_used, r.kth_min_hash, r.shared_in_k,
            r.est_union, r.est_intersection,
            r.exact_union, r.exact_intersection,
        )
        for r in got
    ] == expected
    # the estimator branch genuinely fired (sets exceed k at sf0.001)
    # and the estimates are estimates, not copies of the exact columns
    assert all(r.est_union != float(r.exact_union) for r in got)


def _write_events(tmp_path, rows):
    """rows: (event_id, ts, user_id, event_type)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    table = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], type=pa.int64()),
            "ts": pa.array([r[1] for r in rows], type=pa.timestamp("us")),
            "user_id": pa.array([r[2] for r in rows], type=pa.int64()),
            "event_type": pa.array([r[3] for r in rows], type=pa.string()),
            "value": pa.array([1.0] * len(rows), type=pa.float64()),
            "props": pa.array(["{}"] * len(rows), type=pa.string()),
        }
    )
    pq.write_table(table, str(tmp_path / "events.parquet"))
    return str(tmp_path)


def test_kmv_exact_when_union_under_k(spark, tmp_path):
    """Beyer et al.'s small-set branch: when the merged sketch is
    complete (union < k), BOTH estimates are exact — est_union equals
    the exact union and est_intersection the exact intersection, as
    pure equalities. Two 40/30-member types overlapping in 15, full
    DuckDB-oracle parity on the same input."""
    import datetime as dt

    import duckdb

    from idh_etl_demo_spark.catalog import ENTRIES
    import idh_etl_demo_spark.catalog_r9b  # noqa: F401
    from tests.compare import assert_frames_equal

    base = dt.datetime(2024, 3, 1, 12, 0, 0)
    rows = []
    eid = 0
    # type A: users 0..39 on day 0; type B: users 25..54 on day 0
    # (overlap = users 25..39 → 15 shared (user, day) members)
    for u in range(40):
        rows.append((eid, base, u, "alpha")); eid += 1
        # duplicate events on the same (user, day) — the distinct
        # member agg must collapse them
        rows.append((eid, base + dt.timedelta(hours=3), u, "alpha")); eid += 1
    for u in range(25, 55):
        rows.append((eid, base, u, "beta")); eid += 1
    sf = _write_events(tmp_path, rows)

    sdf = ENTRIES["events_kmv_set_ops"].spark(spark, sf).toPandas()
    con = duckdb.connect()
    con.execute(
        f"create view events as select * from "
        f"read_parquet('{sf}/events.parquet')"
    )
    assert_frames_equal(
        sdf, con.execute(ENTRIES["events_kmv_set_ops"].oracle).df()
    )
    assert len(sdf) == 1
    r = sdf.iloc[0]
    assert (r.type_a, r.type_b) == ("alpha", "beta")
    assert r.exact_union == 55 and r.exact_intersection == 15
    assert r.k_used == 55
    assert r.est_union == 55.0
    assert r.est_intersection == 15.0


# ---------------------------------------------------------------------------
# doc_suffix_array / doc_suffix_dup_audit — prefix doubling vs direct sort
# ---------------------------------------------------------------------------


def _py_toks(text: str) -> list[str]:
    import re

    norm = re.sub(r"\s+", " ", text.strip().lower())
    return [w for w in norm.split(" ") if w != ""]


def _py_suffix_ranks(docs: dict[int, list[str]]) -> dict[tuple[int, int], int]:
    """(doc_id, pos) -> 1-based rank by (suffix, doc_id, pos) — the
    direct-sort reference the prefix-doubling loop must reproduce."""
    sufs = [
        (tuple(toks[p:]), d, p)
        for d, toks in docs.items()
        for p in range(len(toks))
    ]
    sufs.sort()
    return {(d, p): i + 1 for i, (_, d, p) in enumerate(sufs)}


def test_suffix_array_matches_python_reference(spark):
    """The distributed prefix-doubling build on the REAL sf0.001 corpus
    must equal direct suffix sorting (a third independent algorithm
    beyond the entry's DuckDB list-sort oracle): every emitted rank for
    the %25 subset, against ranks computed over ALL corpus suffixes."""
    from idh_etl_demo_spark.catalog import ENTRIES
    import idh_etl_demo_spark.catalog_r9b  # noqa: F401

    rows = spark.read.parquet(f"{SF}/documents.parquet").collect()
    docs = {r.doc_id: _py_toks(r.text) for r in rows}
    ranks = _py_suffix_ranks(docs)
    got = ENTRIES["doc_suffix_array"].spark(spark, SF).collect()
    assert len(got) == sum(
        len(t) for d, t in docs.items() if d % 25 == 0
    )
    for r in got:
        assert r.sa_rank == ranks[(r.doc_id, r.pos)], (r.doc_id, r.pos)


def _write_docs(tmp_path, texts):
    import pandas as pd

    df = pd.DataFrame(
        {
            "doc_id": range(len(texts)),
            "text": texts,
            "lang": ["en"] * len(texts),
            "source": ["synth"] * len(texts),
            "n_chars": [len(t) for t in texts],
        }
    )
    df.to_parquet(str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def test_suffix_array_cross_doc_ties(spark, tmp_path):
    """Identical suffixes in DIFFERENT documents share a rank class
    after the doubling loop converges; the final positional tie-break
    must order them by (doc_id, pos) into consecutive ranks — with
    full DuckDB-oracle parity on the adversarial corpus. Docs 0 and 25
    are byte-identical (every suffix tied cross-doc), doc 50 shares
    only a tail."""
    import duckdb

    from idh_etl_demo_spark.catalog import ENTRIES
    import idh_etl_demo_spark.catalog_r9b  # noqa: F401
    from tests.compare import assert_frames_equal

    twin = "alpha beta gamma delta beta gamma"
    texts = [twin] + ["filler words here"] * 24 + [twin] + ["x " * 3] * 24 + [
        "omega delta beta gamma"
    ]
    sf = _write_docs(tmp_path, texts)
    sdf = ENTRIES["doc_suffix_array"].spark(spark, sf).toPandas()
    con = duckdb.connect()
    con.execute(
        f"create view documents as select * from "
        f"read_parquet('{sf}/documents.parquet')"
    )
    assert_frames_equal(
        sdf, con.execute(ENTRIES["doc_suffix_array"].oracle).df()
    )
    # every suffix of doc 0 ties its twin in doc 25; the tie-break puts
    # doc 0 exactly one rank ahead
    r0 = {r.pos: r.sa_rank for r in sdf.itertuples() if r.doc_id == 0}
    r25 = {r.pos: r.sa_rank for r in sdf.itertuples() if r.doc_id == 25}
    assert set(r0) == set(r25) and len(r0) == 6
    for p in r0:
        assert r25[p] == r0[p] + 1, p


def test_suffix_dup_audit_matches_python_and_spans(spark):
    """The SA-adjacency audit on the REAL sf0.001 corpus must equal a
    pure-Python brute count of duplicated 8-token window starts, AND
    agree doc-for-doc with doc_duplicated_spans' verdict (dup_starts>0
    ⟺ n_spans>0) — the rolling-hash route and the suffix-array route
    are the same Lee et al. computation by different algorithms."""
    from collections import Counter

    from idh_etl_demo_spark.catalog import ENTRIES
    import idh_etl_demo_spark.catalog_r9  # noqa: F401  (doc_duplicated_spans)
    import idh_etl_demo_spark.catalog_r9b  # noqa: F401

    L = 8
    rows = spark.read.parquet(f"{SF}/documents.parquet").collect()
    docs = {r.doc_id: _py_toks(r.text) for r in rows}
    grams = Counter()
    for d, toks in docs.items():
        for p in range(max(len(toks) - L + 1, 0)):
            grams[tuple(toks[p : p + L])] += 1
    expected = {
        d: (
            len(toks),
            sum(
                1
                for p in range(max(len(toks) - L + 1, 0))
                if grams[tuple(toks[p : p + L])] >= 2
            ),
        )
        for d, toks in docs.items()
    }
    got = ENTRIES["doc_suffix_dup_audit"].spark(spark, SF).collect()
    assert len(got) == len(expected)
    for r in got:
        assert (r.n_tokens, r.dup_starts) == expected[r.doc_id], r.doc_id
    # the measurement is real, and the two routes agree on who is dirty
    assert any(r.dup_starts > 0 for r in got)
    assert any(r.dup_starts == 0 for r in got)
    spans = {
        r.doc_id: r.n_spans
        for r in ENTRIES["doc_duplicated_spans"].spark(spark, SF).collect()
    }
    for r in got:
        assert (r.dup_starts > 0) == (spans[r.doc_id] > 0), r.doc_id


# ---------------------------------------------------------------------------
# orders_zorder_layout — Morton interleave vs pure Python, and the
# layout claim itself
# ---------------------------------------------------------------------------


def _py_zorder_stats(rows, bits=16, buckets=64):
    """rows: (custkey, days). Mirrors orders_zorder_layout exactly."""
    scale = (1 << bits) - 1
    zdiv = (1 << (2 * bits)) // buckets
    ldiv = (1 << bits) // buckets
    minck = min(r[0] for r in rows); maxck = max(r[0] for r in rows)
    mind = min(r[1] for r in rows); maxd = max(r[1] for r in rows)

    def norm(x, lo, hi):
        return ((x - lo) * scale) // max(hi - lo, 1)

    def interleave(nx, nd):
        z = 0
        for b in range(bits):
            z += ((nx >> b) & 1) << (2 * b)
            z += ((nd >> b) & 1) << (2 * b + 1)
        return z

    out = {}
    for ck, d in rows:
        nx, nd = norm(ck, minck, maxck), norm(d, mind, maxd)
        for layout, b in (
            ("zorder", interleave(nx, nd) // zdiv),
            ("linear", nx // ldiv),
        ):
            st = out.setdefault((layout, b), [0, ck, ck, d, d])
            st[0] += 1
            st[1] = min(st[1], ck); st[2] = max(st[2], ck)
            st[3] = min(st[3], d); st[4] = max(st[4], d)
    return {
        k: (v[0], v[2] - v[1], v[4] - v[3]) for k, v in out.items()
    }


def test_zorder_layout_matches_python_and_bounds_both_dims(spark):
    """The entry on the REAL sf0.001 orders must equal a pure-Python
    twin of the normalize→interleave→bucket→span pipeline, bucket for
    bucket — and the measurement must prove the layout claim: every
    z-order bucket bounds BOTH dimensions (≤ 1/4 of each range for a
    64-cell curve, vs the theoretical 1/8 plus edge slack), while the
    linear layout leaves the non-sort dimension effectively unbounded
    (max date span ≥ 1/2 of the range)."""
    import datetime as dt

    from idh_etl_demo_spark.catalog import ENTRIES
    import idh_etl_demo_spark.catalog_r9b  # noqa: F401

    epoch = dt.date(1970, 1, 1)
    raw = spark.read.parquet(f"{SF}/orders.parquet").collect()
    rows = [
        (r.o_custkey, (r.o_orderdate.date() - epoch).days) for r in raw
    ]
    expected = _py_zorder_stats(rows)
    got = ENTRIES["orders_zorder_layout"].spark(spark, SF).collect()
    assert len(got) == len(expected)
    for r in got:
        assert (r.n, r.ck_span, r.date_span) == expected[(r.layout, r.bucket)]

    ck_range = max(r[0] for r in rows) - min(r[0] for r in rows)
    d_range = max(r[1] for r in rows) - min(r[1] for r in rows)
    z = [r for r in got if r.layout == "zorder"]
    lin = [r for r in got if r.layout == "linear"]
    assert max(r.ck_span for r in z) <= ck_range / 4
    assert max(r.date_span for r in z) <= d_range / 4
    assert max(r.date_span for r in lin) >= d_range / 2
    assert max(r.ck_span for r in lin) <= ck_range / 16


# ---------------------------------------------------------------------------
# customer_price_trend — per-group OLS vs pure Python
# ---------------------------------------------------------------------------


def _py_ols(points):
    n = len(points)
    sx = sum(x for x, _ in points); sy = sum(y for _, y in points)
    sxx = sum(x * x for x, _ in points)
    sxy = sum(x * y for x, y in points)
    den = n * sxx - sx * sx
    if den == 0:
        return (n, None, None)
    slope = float(n * sxy - sx * sy) / float(den)
    return (n, slope, (float(sy) - slope * float(sx)) / float(n))


def test_price_trend_matches_python_reference(spark):
    """Per-customer OLS on the REAL sf0.001 orders must equal the
    pure-Python normal-equations twin computed over exact integer
    sums (cents × days), slope and intercept bit-for-bit."""
    import datetime as dt

    from idh_etl_demo_spark.catalog import ENTRIES
    import idh_etl_demo_spark.catalog_r9b  # noqa: F401

    epoch = dt.date(1970, 1, 1)
    raw = spark.read.parquet(f"{SF}/orders.parquet").collect()
    pts = {}
    for r in raw:
        x = (r.o_orderdate.date() - epoch).days
        y = round(r.o_totalprice * 100)
        pts.setdefault(r.o_custkey, []).append((x, y))
    got = ENTRIES["customer_price_trend"].spark(spark, SF).collect()
    assert len(got) == len(pts)
    for r in got:
        n, slope, intercept = _py_ols(pts[r.o_custkey])
        assert r.n == n
        assert r.slope_cents_per_day == slope, r.o_custkey
        assert r.intercept_cents == intercept, r.o_custkey
    # non-vacuous: trends exist in both directions on this data
    slopes = [r.slope_cents_per_day for r in got if r.slope_cents_per_day]
    assert any(s > 0 for s in slopes) and any(s < 0 for s in slopes)


def test_price_trend_degenerate_group_is_null(spark, tmp_path):
    """A customer whose orders all land on one day has zero x-variance:
    the normal equations are singular and BOTH engines must return
    NULL (full oracle parity on the constructed input)."""
    import datetime as dt

    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from idh_etl_demo_spark.catalog import ENTRIES
    import idh_etl_demo_spark.catalog_r9b  # noqa: F401
    from tests.compare import assert_frames_equal

    day = dt.datetime(2024, 5, 5)
    dates = [day] * 3 + [
        day, day + dt.timedelta(days=3), day + dt.timedelta(days=9)
    ]
    table = pa.table(
        {
            "o_orderkey": pa.array(range(6), type=pa.int64()),
            "o_custkey": pa.array([1, 1, 1, 2, 2, 2], type=pa.int64()),
            "o_orderstatus": pa.array(["F"] * 6),
            "o_totalprice": pa.array(
                [10.5, 20.25, 30.0, 11.0, 12.0, 13.0], type=pa.float64()
            ),
            "o_orderdate": pa.array(dates, type=pa.timestamp("us")),
            "o_orderpriority": pa.array(["1-URGENT"] * 6),
        }
    )
    pq.write_table(table, str(tmp_path / "orders.parquet"))
    sf = str(tmp_path)
    sdf = ENTRIES["customer_price_trend"].spark(spark, sf).toPandas()
    con = duckdb.connect()
    con.execute(
        f"create view orders as select * from "
        f"read_parquet('{sf}/orders.parquet')"
    )
    assert_frames_equal(
        sdf, con.execute(ENTRIES["customer_price_trend"].oracle).df()
    )
    r1 = sdf[sdf.o_custkey == 1].iloc[0]
    r2 = sdf[sdf.o_custkey == 2].iloc[0]
    import math as m

    assert m.isnan(r1.slope_cents_per_day) or r1.slope_cents_per_day is None
    assert r2.slope_cents_per_day is not None and not m.isnan(
        r2.slope_cents_per_day
    )


# ---------------------------------------------------------------------------
# doc_dup_pagerank / operators.graph.integer_pagerank
# ---------------------------------------------------------------------------


def _py_int_pagerank(node_ids, pairs, iterations=2, base=150_000, damp=850):
    from collections import defaultdict

    nbrs = defaultdict(list)
    for a, b in pairs:
        nbrs[a].append(b); nbrs[b].append(a)
    deg = {v: len(nbrs[v]) for v in node_ids}
    r = {v: 1_000_000 for v in node_ids}
    hist = []
    for _ in range(iterations):
        nr = {}
        for v in node_ids:
            nr[v] = base + sum(
                (damp * r[u]) // (1000 * deg[u]) for u in nbrs[v]
            )
        r = nr
        hist.append(dict(r))
    return deg, hist


def test_integer_pagerank_operator_ranks_hubs(spark):
    """The operator on a constructed star-plus-path graph must equal
    the pure-Python twin exactly AND rank the hub above every leaf —
    the centrality claim on a graph whose answer is known by eye.
    Star: 0–{1..5}; path: 10–11–12; isolated: 99."""
    from idh_etl_demo_spark.operators.graph import integer_pagerank
    import idh_etl_demo_spark.catalog_r9b  # noqa: F401

    pairs = [(0, i) for i in range(1, 6)] + [(10, 11), (11, 12)]
    node_ids = [0, 1, 2, 3, 4, 5, 10, 11, 12, 99]
    nodes = spark.createDataFrame([(v,) for v in node_ids], ["id"])
    edges = spark.createDataFrame(pairs, ["id_a", "id_b"])
    got = {
        r.id: (r.deg, r.r1, r.r2)
        for r in integer_pagerank(nodes, edges, iterations=2).collect()
    }
    deg, hist = _py_int_pagerank(node_ids, pairs)
    for v in node_ids:
        assert got[v] == (deg[v], hist[0][v], hist[1][v]), v
    hub, leaves = got[0][2], [got[i][2] for i in range(1, 6)]
    assert all(hub > l for l in leaves)
    assert got[99] == (0, 150_000, 150_000)
    assert got[11][2] > got[10][2]  # path middle beats endpoints


def test_dup_pagerank_matches_python_on_real_graph(spark):
    """The catalog entry on the REAL sf0.001 corpus must equal the twin
    run over the (independently oracle-gated) simhash-60 edge list —
    and the centrality must genuinely spread (hundreds of distinct
    ranks, hubs far above the 150000 base)."""
    from idh_etl_demo_spark.catalog import ENTRIES
    import idh_etl_demo_spark.catalog_r3  # noqa: F401
    import idh_etl_demo_spark.catalog_r9b  # noqa: F401

    pairs = [
        (r.id_a, r.id_b)
        for r in ENTRIES["doc_simhash60_neardup"].spark(spark, SF).collect()
    ]
    docs = [
        r.doc_id
        for r in spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id")
        .collect()
    ]
    deg, hist = _py_int_pagerank(docs, pairs)
    got = ENTRIES["doc_dup_pagerank"].spark(spark, SF).collect()
    assert len(got) == len(docs)
    for r in got:
        assert (r.deg, r.r1, r.r2) == (
            deg[r.doc_id], hist[0][r.doc_id], hist[1][r.doc_id]
        ), r.doc_id
    r2s = {r.r2 for r in got}
    assert len(r2s) > 100
    assert max(r2s) > 1_000_000


# ---------------------------------------------------------------------------
# doc_longest_dup_run — Manber–Myers LCP walk vs direct suffix sorting
# ---------------------------------------------------------------------------


def test_longest_dup_run_matches_python_and_audit(spark):
    """The LCP entry on the REAL sf0.001 corpus must equal a
    pure-Python twin (sort all suffixes, LCP of adjacent pairs by
    direct comparison, per-doc max over both sides) — a third
    independent algorithm beyond the rank-history walk (Spark) and
    the list-comparison oracle (DuckDB). And the family must be
    self-consistent: longest_dup_run ≥ 8 exactly on the docs the
    SA-adjacency audit flags (dup_starts > 0)."""
    from idh_etl_demo_spark.catalog import ENTRIES
    import idh_etl_demo_spark.catalog_r9b  # noqa: F401

    rows = spark.read.parquet(f"{SF}/documents.parquet").collect()
    docs = {r.doc_id: _py_toks(r.text) for r in rows}
    sufs = sorted(
        (tuple(t[p:]), d, p) for d, t in docs.items() for p in range(len(t))
    )

    def lcp(a, b):
        n = 0
        for x, y in zip(a, b):
            if x != y:
                break
            n += 1
        return n

    best = {d: 0 for d in docs}
    for i in range(len(sufs) - 1):
        l = lcp(sufs[i][0], sufs[i + 1][0])
        for side in (sufs[i], sufs[i + 1]):
            best[side[1]] = max(best[side[1]], l)

    got = ENTRIES["doc_longest_dup_run"].spark(spark, SF).collect()
    assert len(got) == len(docs)
    for r in got:
        assert (r.n_tokens, r.longest_dup_run) == (
            len(docs[r.doc_id]), best[r.doc_id]
        ), r.doc_id
    # non-vacuous: full-doc duplicates exist (run == doc length) and
    # so do partial runs strictly between 0 and the doc length
    assert any(r.longest_dup_run == r.n_tokens for r in got)
    assert any(0 < r.longest_dup_run < r.n_tokens for r in got)

    audit = {
        r.doc_id: r.dup_starts
        for r in ENTRIES["doc_suffix_dup_audit"].spark(spark, SF).collect()
    }
    for r in got:
        assert (r.longest_dup_run >= 8) == (audit[r.doc_id] > 0), r.doc_id


# ---------------------------------------------------------------------------
# lineitem_quantile_sketch — deterministic priority sample vs Python
# ---------------------------------------------------------------------------


def _py_quantile_sketch(rows, k=256, qs=(0.1, 0.25, 0.5, 0.75, 0.9, 0.99)):
    """rows: (orderkey, linenumber, extendedprice)."""
    import math as m

    pts = [
        (
            int(
                hashlib.md5(f"{ok}|{ln}".encode()).hexdigest()[:15], 16
            ),
            round(px * 100),
        )
        for ok, ln, px in rows
    ]
    samp = sorted(c for _, c in sorted(pts)[:k])
    full = sorted(c for _, c in pts)
    out = []
    for q in qs:
        est = samp[m.floor(q * (len(samp) - 1))]
        exact = full[m.floor(q * (len(full) - 1))]
        out.append((q, len(samp), est, exact, est - exact))
    return out


def test_quantile_sketch_matches_python_reference(spark):
    """The sketch on the REAL sf0.001 lineitem must equal the
    pure-Python twin — the same 256 sampled rows (md5 priorities are
    engine-independent), the same nearest-rank picks, the same exact
    audit values — row for row. And the error column must be a real
    measurement: nonzero somewhere, zero nowhere near ±N."""
    from idh_etl_demo_spark.catalog import ENTRIES
    import idh_etl_demo_spark.catalog_r9b  # noqa: F401

    raw = spark.read.parquet(f"{SF}/lineitem.parquet").collect()
    rows = [(r.l_orderkey, r.l_linenumber, r.l_extendedprice) for r in raw]
    expected = _py_quantile_sketch(rows)
    got = ENTRIES["lineitem_quantile_sketch"].spark(spark, SF).collect()
    assert [
        (r.q, r.sample_n, r.est_cents, r.exact_cents, r.err_cents)
        for r in got
    ] == expected
    assert any(r.err_cents != 0 for r in got)
    # the 1/sqrt(k) regime: every estimate lands within 25% of exact
    for r in got:
        assert abs(r.err_cents) < 0.25 * r.exact_cents


def test_quantile_sketch_exact_when_sample_covers_table(spark, tmp_path):
    """Degenerate branch: with fewer rows than k the priority sample IS
    the table, so every estimate equals the exact quantile
    (err_cents == 0 across the board) — with full DuckDB-oracle parity
    on the constructed input."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from idh_etl_demo_spark.catalog import ENTRIES
    import idh_etl_demo_spark.catalog_r9b  # noqa: F401
    from tests.compare import assert_frames_equal

    n = 100
    table = pa.table(
        {
            "l_orderkey": pa.array(range(n), type=pa.int64()),
            "l_partkey": pa.array([1] * n, type=pa.int64()),
            "l_suppkey": pa.array([1] * n, type=pa.int64()),
            "l_linenumber": pa.array([1] * n, type=pa.int64()),
            "l_quantity": pa.array([1.0] * n, type=pa.float64()),
            "l_extendedprice": pa.array(
                [100.0 + 7.25 * i for i in range(n)], type=pa.float64()
            ),
            "l_discount": pa.array([0.0] * n, type=pa.float64()),
            "l_tax": pa.array([0.0] * n, type=pa.float64()),
            "l_returnflag": pa.array(["N"] * n),
            "l_linestatus": pa.array(["O"] * n),
            "l_shipdate": pa.array(
                [__import__("datetime").datetime(2024, 1, 1)] * n,
                type=pa.timestamp("us"),
            ),
        }
    )
    pq.write_table(table, str(tmp_path / "lineitem.parquet"))
    sf = str(tmp_path)
    sdf = ENTRIES["lineitem_quantile_sketch"].spark(spark, sf).toPandas()
    con = duckdb.connect()
    con.execute(
        f"create view lineitem as select * from "
        f"read_parquet('{sf}/lineitem.parquet')"
    )
    assert_frames_equal(
        sdf, con.execute(ENTRIES["lineitem_quantile_sketch"].oracle).df()
    )
    assert list(sdf.sample_n) == [n] * 6
    assert list(sdf.err_cents) == [0] * 6


# ---------------------------------------------------------------------------
# doc_bm25_rrf — reciprocal rank fusion vs pure Python
# ---------------------------------------------------------------------------


def test_bm25_rrf_matches_python_reference(spark):
    """The fusion on the REAL sf0.001 corpus must equal a pure-Python
    twin that recomputes BOTH rankers (BM25 via the repo's exact
    cleared-denominator scoring, Jaccard over distinct doc tokens)
    and the RRF combination with the same tie-breaks — and the fused
    list must contain winners absent from one ranker's top-20 (the
    behavior RRF exists for)."""
    import math as m

    from idh_etl_demo_spark.catalog import ENTRIES
    from idh_etl_demo_spark.catalog_r9 import _BM25_QUERIES
    import idh_etl_demo_spark.catalog_r9b  # noqa: F401

    K, DEPTH, TOPN = 60, 20, 10
    rows = spark.read.parquet(f"{SF}/documents.parquet").collect()
    docs = {r.doc_id: _py_toks(r.text) for r in rows}
    s = sum(len(t) for t in docs.values())
    n = len(docs)
    all_terms = sorted({t for _, terms in _BM25_QUERIES for t in terms})
    df = {
        t: sum(1 for toks in docs.values() if t in toks) for t in all_terms
    }

    def term_score(tf, dl, t):
        num = (2 * (n - df[t]) + 1) * 22 * tf * s
        den = (2 * df[t] + 1) * (10 * s * tf + 3 * s + 9 * dl * n)
        return num / den

    expected = []
    for qid, terms in _BM25_QUERIES:
        bm = {}
        for d, toks in docs.items():
            matched = [t for t in sorted(set(terms)) if t in toks]
            if not matched:
                continue
            bm[d] = sum(
                term_score(toks.count(t), len(toks), t) for t in matched
            )
        r1 = {
            d: i + 1
            for i, (_, d) in enumerate(
                sorted(((-v, d) for d, v in bm.items()))[:DEPTH]
            )
        }
        qset = set(terms)
        jac = {}
        for d, toks in docs.items():
            inter = len(qset & set(toks))
            if inter == 0:
                continue
            jac[d] = inter / (len(qset) + len(set(toks)) - inter)
        r2 = {
            d: i + 1
            for i, (_, d) in enumerate(
                sorted(((-v, d) for d, v in jac.items()))[:DEPTH]
            )
        }
        fused = []
        for d in set(r1) | set(r2):
            score = (1.0 / (K + r1[d]) if d in r1 else 0.0) + (
                1.0 / (K + r2[d]) if d in r2 else 0.0
            )
            fused.append((-score, d))
        for i, (negs, d) in enumerate(sorted(fused)[:TOPN]):
            expected.append(
                (qid, d, r1.get(d), r2.get(d), -negs, i + 1)
            )

    got = ENTRIES["doc_bm25_rrf"].spark(spark, SF).collect()
    assert [
        (r.query_id, r.doc_id, r.bm25_rank, r.jaccard_rank, r.rrf,
         r.fused_rank)
        for r in got
    ] == expected
    assert any(r.bm25_rank is None or r.jaccard_rank is None for r in got)
    # the two rankers genuinely disagree: some fused winner is ranked
    # by both but at different positions
    assert any(
        r.bm25_rank is not None
        and r.jaccard_rank is not None
        and r.bm25_rank != r.jaccard_rank
        for r in got
    )
