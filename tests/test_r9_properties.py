"""Round-9 property tests: the ADVICE-r8 hardening fixes (NULL-signature
group semantics, BM25 exactness-bound guard, memoized membership gating
count) and the round-9 catalog entries' pure-Python references."""

from __future__ import annotations

import os

import pyspark.sql.functions as F
import pytest

SF = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


# ---------------------------------------------------------------------------
# ADVICE r8 #1: NULL signatures stay out of dedup groups
# ---------------------------------------------------------------------------


def test_null_signature_group_size_is_zero(spark):
    """The consumers' group-size window counts the SIGNATURE column, so
    rows with NULL signatures (missing/undecodable payloads) report
    occupancy 0 instead of pooling into one phantom dedup group —
    window partitioning treats NULLs as one partition, which count(*)
    would have inflated (ADVICE r8)."""
    from pyspark.sql import Window

    from idh_etl_demo_spark.operators.multimodal import image_ahash

    # two identical 1x1 PPMs (a real group of 2) + two missing payloads
    ppm = b"P6\n1 1\n255\nabc"
    media = spark.createDataFrame(
        [(0, ppm), (1, ppm), (2, None), (3, None)],
        "media_id long, payload binary",
    )
    grp = Window.partitionBy("ahash")
    got = {
        r.media_id: (r.ahash, r.n)
        for r in image_ahash(media, grid=2)
        .withColumn("n", F.count("ahash").over(grp))
        .collect()
    }
    assert got[0][0] is not None and got[0] == got[1]
    assert got[0][1] == 2
    assert got[2][0] is None and got[3][0] is None
    assert got[2][1] == 0 and got[3][1] == 0


# ---------------------------------------------------------------------------
# ADVICE r8 #2: the BM25 exactness bound is checked, not assumed
# ---------------------------------------------------------------------------


def _bm25_inputs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, dl long, token string, tf long, df long, s long, n long"
    )


def test_bm25_guard_passes_in_bound_and_matches_python(spark):
    from idh_etl_demo_spark.catalog_r8 import _bm25_term_score

    rows = [(1, 40, "t", 3, 7, 100_000, 1_000)]
    got = (
        _bm25_inputs(spark, rows)
        .select(_bm25_term_score().alias("score"))
        .collect()[0]
        .score
    )
    n, df, tf, s, dl = 1_000, 7, 3, 100_000, 40
    num = (2 * (n - df) + 1) * 22 * tf * s
    den = (2 * df + 1) * (10 * s * tf + 3 * s + 9 * dl * n)
    assert got == num / den


def test_bm25_guard_raises_past_exactness_bound(spark):
    """Operands at 2^52+ would silently wrap in Spark long arithmetic
    long before any 100 TB corpus notices — the guard must raise."""
    from idh_etl_demo_spark.catalog_r8 import _bm25_term_score

    # s ~ 2^40 tokens with tf·(N−df) ~ 2^20 pushes num past 2^52
    rows = [(1, 40, "t", 1024, 7, 1 << 40, 1 << 10)]
    with pytest.raises(Exception, match="bm25 exactness bound"):
        _bm25_inputs(spark, rows).select(
            _bm25_term_score().alias("score")
        ).collect()


# ---------------------------------------------------------------------------
# ADVICE r8 #3: the membership gating count is memoized per key plan
# ---------------------------------------------------------------------------


def test_membership_gating_count_memoized(spark, monkeypatch):
    """A second build over a semantically-identical key set must reuse
    the memoized gating count instead of re-running the key-side job
    (repeated builder constructions paid it per build — ADVICE r8)."""
    from pyspark.sql import DataFrame

    from idh_etl_demo_spark.operators import dedup

    left = spark.range(0, 100).select(
        F.col("id").alias("doc_id"), (F.col("id") % 7).alias("h")
    )

    def keys():
        return spark.range(0, 3).select(F.col("id").alias("h"))

    first = dedup.membership_semi_join(left, keys(), "h")
    memo_key = (spark.sparkContext.applicationId, keys().semanticHash())
    assert dedup._GATING_COUNTS.get(memo_key) == 3

    def boom(self):
        raise AssertionError("gating count re-ran despite memo")

    monkeypatch.setattr(DataFrame, "count", boom)
    second = dedup.membership_semi_join(left, keys(), "h")
    monkeypatch.undo()
    assert sorted(r.doc_id for r in first.collect()) == sorted(
        r.doc_id for r in second.collect()
    )


# ---------------------------------------------------------------------------
# Round-9 residual IVFPQ vs pure-Python references
# ---------------------------------------------------------------------------


def _py_train(vecs: dict[int, list[int]], k: int, grid: int):
    """Pure-python twin of the kcenter→2-Lloyd chain at an arbitrary
    centroid grid (operators/kmeans.py round-9 generalization): md5-min
    start, farthest-first seeds with (d desc, vec_id asc) selection, one
    Lloyd update flooring sum·grid/n, final assignment comparing v·grid
    against centroids with (dist, cid) tie-breaks. grid=100 is the
    embedding chain (test_r8_properties._py_pq_train verbatim); grid=1
    is the residual-codebook layout."""
    import hashlib
    import math
    from collections import defaultdict

    def d2(a, b):
        return sum((x - y) * (x - y) for x, y in zip(a, b))

    hv = {i: int(hashlib.md5(str(i).encode()).hexdigest()[:15], 16) for i in vecs}
    start = min(vecs, key=lambda i: (hv[i], i))
    seeds = [start]
    dist = {i: d2(v, vecs[start]) for i, v in vecs.items()}
    for _ in range(k - 1):
        far = max(vecs, key=lambda i: (dist[i], -i))
        seeds.append(far)
        dist = {i: min(dist[i], d2(vecs[i], vecs[far])) for i in vecs}

    a1 = {
        i: min((d2(v, vecs[s]), s) for s in seeds)[1] for i, v in vecs.items()
    }
    member = defaultdict(list)
    for i, c in a1.items():
        member[c].append(i)
    c1 = {
        c: [
            math.floor(sum(vecs[i][p] for i in ids) * float(grid) / len(ids))
            for p in range(len(vecs[ids[0]]))
        ]
        for c, ids in member.items()
    }
    a2 = {
        i: min(
            (sum((x * grid - cc) ** 2 for x, cc in zip(v, cv)), cid)
            for cid, cv in c1.items()
        )[1]
        for i, v in vecs.items()
    }
    return c1, a2


def _py_residual_pipeline(vecs: dict[int, list[int]]):
    """(cell_cb, cell, rcb1, rcb2, rcode1, rcode2): the full residual
    encoding reference — coarse at grid=100, residual r = v·100 −
    c_cell, sub-space codebooks at grid=1."""
    cc, cell = _py_train(vecs, 4, 100)
    R = {
        i: [x * 100 - c for x, c in zip(v, cc[cell[i]])]
        for i, v in vecs.items()
    }
    rcb1, rcode1 = _py_train({i: r[:32] for i, r in R.items()}, 4, 1)
    rcb2, rcode2 = _py_train({i: r[32:] for i, r in R.items()}, 4, 1)
    return cc, cell, rcb1, rcb2, rcode1, rcode2


def test_ivfpq_residual_search_matches_python_reference(spark):
    """The full residual-IVFPQ pipeline — coarse training, residual
    computation, grid=1 codebooks, ADC cosine over recon = c_cell +
    [rc1 ‖ rc2], top-5 ranking — must equal a brute-force pure-Python
    reference on the real sf0.001 embeddings, doubles compared EXACTLY
    (same integer inputs, same operation order)."""
    import math

    from idh_etl_demo_spark.catalog import ENTRIES
    import idh_etl_demo_spark.catalog_r9  # noqa: F401

    rows = spark.read.parquet(f"{SF}/embeddings.parquet").collect()
    vecs = {
        r.vec_id: [round(float(x) * 10000) for x in r.embedding] for r in rows
    }
    cc, cell, rcb1, rcb2, rcode1, rcode2 = _py_residual_pipeline(vecs)

    expected = {}
    for qid, qv in vecs.items():
        if qid % 25 != 0:
            continue
        qq = sum(x * x for x in qv)
        scored = []
        for nid in vecs:
            if nid == qid or cell[nid] != cell[qid]:
                continue
            recon = [
                c + rc
                for c, rc in zip(
                    cc[cell[nid]], rcb1[rcode1[nid]] + rcb2[rcode2[nid]]
                )
            ]
            num = sum(a * b for a, b in zip(qv, recon))
            rr = sum(c * c for c in recon)
            cos = num / (math.sqrt(qq) * math.sqrt(rr))
            scored.append((-cos, nid))
        for rank, (negcos, nid) in enumerate(sorted(scored)[:5], start=1):
            expected[(qid, rank)] = (nid, -negcos, cell[nid])

    got = ENTRIES["embedding_ivfpq_residual_search"].spark(spark, SF).collect()
    assert len(got) == len(expected)
    for r in got:
        nid, cos, c = expected[(r.query_id, r.rank)]
        assert (r.neighbor_id, r.cell) == (nid, c), (r.query_id, r.rank)
        assert r.adc_cosine == cos, (r.query_id, r.rank)


def _write_embeddings(tmp_path, X, path_name="embeddings.parquet"):
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    arr = pa.array(
        [np.asarray(v, dtype=np.float32).tolist() for v in X],
        type=pa.list_(pa.float32()),
    )
    table = pa.table(
        {
            "vec_id": pa.array(range(len(X)), type=pa.int64()),
            "embedding": arr,
            "label": pa.array([i % 4 for i in range(len(X))], type=pa.int32()),
        }
    )
    pq.write_table(table, str(tmp_path / path_name))
    return str(tmp_path)


def test_residual_beats_plain_on_clustered_data(spark, tmp_path):
    """THE claim residual encoding exists for (Jégou et al. 2011): when
    the corpus has cluster structure, quantizing v − c_cell beats
    quantizing v at the identical code budget. The sf test embeddings
    are isotropic (within-label cosine 0.0 — no structure, no possible
    lift; disclosed in the audit entry's docstring), so this test
    constructs 4 well-separated clusters (σ=0.05 noise, the regime
    where within-cluster discrimination requires residual codes), runs
    the REAL ``embedding_ivfpq_residual_recall_audit`` entry on them,
    checks full DuckDB-oracle parity on that adversarial input, and
    asserts the residual recall lift (measured 16 vs 8 hits of 80)."""
    import duckdb
    import numpy as np

    from idh_etl_demo_spark.catalog import ENTRIES
    import idh_etl_demo_spark.catalog_r9  # noqa: F401
    from tests.compare import assert_frames_equal

    rng = np.random.RandomState(7)
    C = rng.randn(4, 64)
    C /= np.linalg.norm(C, axis=1, keepdims=True)
    X = []
    for i in range(400):
        v = C[i % 4] + 0.05 * rng.randn(64)
        X.append(v / np.linalg.norm(v))
    sf = _write_embeddings(tmp_path, X)

    sdf = ENTRIES["embedding_ivfpq_residual_recall_audit"].spark(spark, sf).toPandas()
    con = duckdb.connect()
    con.execute(
        f"create view embeddings as select * from "
        f"read_parquet('{sf}/embeddings.parquet')"
    )
    assert_frames_equal(
        sdf, con.execute(ENTRIES["embedding_ivfpq_residual_recall_audit"].oracle).df()
    )
    plain, residual = int(sdf.hits_plain.sum()), int(sdf.hits_residual.sum())
    assert residual > plain, f"no residual lift on clustered data: {residual} vs {plain}"


def test_ivfpq_nprobe_audit_consistent_with_search(spark):
    """The audit's nprobe=1 row must equal recall computed directly from
    the residual-search entry's top-5 against the cosine-topk truth
    (the audit is a VIEW over the serving path, not a reimplementation),
    and probing deeper can only add candidates."""
    from idh_etl_demo_spark.catalog import ENTRIES
    from idh_etl_demo_spark.catalog_llm import embedding_cosine_topk
    import idh_etl_demo_spark.catalog_r9  # noqa: F401

    audit = {
        r.nprobe: r
        for r in ENTRIES["embedding_ivfpq_nprobe_audit"].spark(spark, SF).collect()
    }
    approx = {
        (r.query_id, r.neighbor_id)
        for r in ENTRIES["embedding_ivfpq_residual_search"].spark(spark, SF).collect()
    }
    truth = {
        (r.query_id, r.neighbor_id)
        for r in embedding_cosine_topk(spark, SF).collect()
    }
    assert audit[1].n_truth == len(truth)
    assert audit[1].n_hits == len(approx & truth)
    assert audit[2].n_candidates > audit[1].n_candidates
    assert audit[2].n_hits >= 0 and audit[2].n_truth == len(truth)


# ---------------------------------------------------------------------------
# BM25 multiquery
# ---------------------------------------------------------------------------


def test_bm25_multiquery_q1_matches_single_query_entry(spark):
    """Query 1 of the multiquery table IS doc_bm25_topk's literal query:
    its top-10 rows must match the single-query entry's first 10 rows
    exactly (doc order, fold order, and the bm25 doubles)."""
    from idh_etl_demo_spark.catalog import ENTRIES
    import idh_etl_demo_spark.catalog_r9  # noqa: F401

    multi = [
        r
        for r in ENTRIES["doc_bm25_multiquery"].spark(spark, SF).collect()
        if r.query_id == 1
    ]
    single = ENTRIES["doc_bm25_topk"].spark(spark, SF).collect()[:10]
    assert len(multi) == min(10, len(single)) and multi, "q1 returned nothing"
    for m, s in zip(multi, single):
        assert (m.doc_id, m.n_terms, m.n_tokens) == (s.doc_id, s.n_terms, s.n_tokens)
        assert m.bm25 == s.bm25


def test_bm25_multiquery_matches_python_reference(spark, tmp_path):
    """Multi-query BM25 on a hand-built corpus must equal the pure-Python
    reference per (query, doc) — including a query with zero matches
    anywhere (absent from the output) and disjoint per-query rankings."""
    import math

    from idh_etl_demo_spark.catalog import ENTRIES
    from idh_etl_demo_spark.catalog_r9 import _BM25_QUERIES, _BM25_TOPN
    import idh_etl_demo_spark.catalog_r9  # noqa: F401
    from tests.test_r8_properties import _write_docs

    texts = [
        "dup dup hash vector scan",
        "scan filter join merge merge merge",
        "spark stream batch stream",
        "slow fast slow fast slow",
        "the quick brown fox",
        "  SPARK   Batch\tmerge  ",
        "hash " * 30 + "join scan",
        "",
    ]
    sf = _write_docs(tmp_path, texts)

    def toks(t):
        return [w for w in " ".join(t.lower().strip().split()).split(" ") if w]

    docs = {i: toks(t) for i, t in enumerate(texts)}
    S = sum(len(v) for v in docs.values())
    N = len(docs)
    expected = {}
    for qid, terms in _BM25_QUERIES:
        scored = []
        for d, tok in docs.items():
            present = sorted(t for t in set(terms) if t in tok)
            if not present:
                continue
            total = 0.0
            for t in present:
                tf = tok.count(t)
                df = sum(1 for v in docs.values() if t in v)
                dl = len(tok)
                num = (2 * (N - df) + 1) * 22 * tf * S
                den = (2 * df + 1) * (10 * S * tf + 3 * S + 9 * dl * N)
                total += num / den
            scored.append((-total, d, len(present), len(tok)))
        for rank, (neg, d, nt, dl) in enumerate(sorted(scored)[:_BM25_TOPN], 1):
            expected[(qid, rank)] = (d, nt, dl, -neg)

    got = ENTRIES["doc_bm25_multiquery"].spark(spark, sf).collect()
    assert len(got) == len(expected)
    for r in got:
        d, nt, dl, bm = expected[(r.query_id, r.rank)]
        assert (r.doc_id, r.n_terms, r.n_tokens) == (d, nt, dl), (r.query_id, r.rank)
        assert math.isclose(r.bm25, bm, rel_tol=0, abs_tol=0), (r.query_id, r.rank)


def test_adc_lut_bit_identical_to_combo_plan(spark):
    """The separable-LUT serving plan must produce a frame BIT-IDENTICAL
    to the combo-table residual search: num and rr decompose exactly
    into per-subspace int64 terms (recon is a concatenation — no
    cross-subspace products), so every adc_cosine double is the same
    division of the same integers. Also pins the physical claim: the
    LUT plan contains map lookups and NO code equi-join."""
    import pandas as pd

    from idh_etl_demo_spark.catalog import ENTRIES
    import idh_etl_demo_spark.catalog_r9  # noqa: F401

    lut_df = ENTRIES["embedding_ivfpq_adc_lut"].spark(spark, SF)
    combo = ENTRIES["embedding_ivfpq_residual_search"].spark(spark, SF).toPandas()
    pd.testing.assert_frame_equal(lut_df.toPandas(), combo)
    plan = lut_df._jdf.queryExecution().executedPlan().toString()
    assert "element_at" in plan, "LUT plan lost its map lookups"


def test_ivfpq_rerank_matches_python_reference(spark):
    """Two-stage serving vs pure Python on the real sf0.001 embeddings:
    the ADC top-20 shortlist (via the residual reference pipeline)
    re-ranked by exact fixed-point cosine must equal the entry's top-5
    exactly — including the exact_cosine doubles. Also pins that
    re-ranking actually reorders: at this code resolution the ADC
    shortlist is tie-heavy, so the exact stage must not return the
    shortlist's own order for every query."""
    import math

    from idh_etl_demo_spark.catalog import ENTRIES
    from idh_etl_demo_spark.catalog_r9 import _RERANK_SHORTLIST
    import idh_etl_demo_spark.catalog_r9  # noqa: F401

    rows = spark.read.parquet(f"{SF}/embeddings.parquet").collect()
    vecs = {
        r.vec_id: [round(float(x) * 10000) for x in r.embedding] for r in rows
    }
    cc, cell, rcb1, rcb2, rcode1, rcode2 = _py_residual_pipeline(vecs)

    expected = {}
    reordered = False
    for qid, qv in vecs.items():
        if qid % 25 != 0:
            continue
        qq = sum(x * x for x in qv)
        adc = []
        for nid in vecs:
            if nid == qid or cell[nid] != cell[qid]:
                continue
            recon = [
                c + rc
                for c, rc in zip(
                    cc[cell[nid]], rcb1[rcode1[nid]] + rcb2[rcode2[nid]]
                )
            ]
            num = sum(a * b for a, b in zip(qv, recon))
            rr = sum(c * c for c in recon)
            adc.append((-(num / (math.sqrt(qq) * math.sqrt(rr))), nid))
        shortlist = [nid for _, nid in sorted(adc)[:_RERANK_SHORTLIST]]
        exact = []
        for nid in shortlist:
            nv = vecs[nid]
            dot = sum(a * b for a, b in zip(qv, nv))
            nn = sum(x * x for x in nv)
            exact.append((-(dot / (math.sqrt(qq) * math.sqrt(nn))), nid))
        top5 = sorted(exact)[:5]
        if [nid for _, nid in top5] != shortlist[: len(top5)]:
            reordered = True
        for rank, (neg, nid) in enumerate(top5, start=1):
            expected[(qid, rank)] = (nid, -neg, cell[nid])

    got = ENTRIES["embedding_ivfpq_rerank"].spark(spark, SF).collect()
    assert len(got) == len(expected)
    for r in got:
        nid, cos, c = expected[(r.query_id, r.rank)]
        assert (r.neighbor_id, r.cell) == (nid, c), (r.query_id, r.rank)
        assert r.exact_cosine == cos, (r.query_id, r.rank)
    assert reordered, "exact stage never reordered the ADC shortlist"


def test_duplicated_spans_matches_python_reference(spark, tmp_path):
    """Exact-substring spans on a hand-built corpus — cross-doc
    duplicated runs, a within-doc repeat, overlapping windows that must
    merge into one span, adjacent-but-distinct islands, docs shorter
    than L, and an empty doc — must equal a pure-Python interval-merge
    reference exactly."""
    from idh_etl_demo_spark.catalog import ENTRIES
    from idh_etl_demo_spark.catalog_r9 import _SPAN_L
    import idh_etl_demo_spark.catalog_r9  # noqa: F401
    from tests.test_r8_properties import _write_docs

    run = "alpha beta gamma delta epsilon zeta eta theta"  # exactly L=8
    texts = [
        f"intro {run} tail words here",                  # run shared with doc 1
        f"{run} and then something different entirely",  # → cross-doc dup
        f"{run} middle filler {run}",                    # within-doc repeat
        "unique words only nothing repeated anywhere at all today",
        f"pad {run} extended overlap beta gamma",        # overlapping windows
        "short doc",                                     # < L tokens
        "",                                              # empty
        f"xx {run} yy {run} zz",                         # two islands? (merged if adjacent)
    ]
    sf = _write_docs(tmp_path, texts)

    def toks(t):
        return [w for w in " ".join(t.lower().strip().split()).split(" ") if w]

    docs = {i: toks(t) for i, t in enumerate(texts)}
    from collections import Counter

    grams = Counter()
    for tok in docs.values():
        for i in range(len(tok) - _SPAN_L + 1):
            grams[" ".join(tok[i : i + _SPAN_L])] += 1
    expected = {}
    for d, tok in docs.items():
        occ = [
            (i + 1, i + _SPAN_L)
            for i in range(len(tok) - _SPAN_L + 1)
            if grams[" ".join(tok[i : i + _SPAN_L])] >= 2
        ]
        spans = []
        for s, e in occ:
            if spans and s <= spans[-1][1] + 1:
                spans[-1] = (spans[-1][0], max(spans[-1][1], e))
            else:
                spans.append((s, e))
        dup = sum(e - s + 1 for s, e in spans)
        n = len(tok)
        expected[d] = (n, len(spans), dup, (dup * 1000000) // n if n else 0)

    got = ENTRIES["doc_duplicated_spans"].spark(spark, sf).collect()
    assert {r.doc_id for r in got} == set(expected)
    for r in got:
        assert (r.n_tokens, r.n_spans, r.dup_tokens, r.dup_micro) == expected[r.doc_id], r.doc_id
    # the fixture exercises every regime
    assert any(v[1] > 1 for v in expected.values()), "no multi-span doc"
    assert any(v[1] == 1 for v in expected.values())
    assert any(v[2] == 0 and v[0] > 0 for v in expected.values())


# ---------------------------------------------------------------------------
# doc_leakage_safe_split / doc_split_leakage_audit vs a pure-Python
# reference on a constructed dup-group corpus
# ---------------------------------------------------------------------------


def _py_split(key: int) -> str:
    import hashlib

    from idh_etl_demo_spark.catalog_r9 import _SPLIT_T80, _SPLIT_T90

    hv = int(hashlib.md5(str(key).encode()).hexdigest()[:15], 16)
    return "train" if hv < _SPLIT_T80 else ("valid" if hv < _SPLIT_T90 else "test")


def test_leakage_safe_split_matches_python_reference(spark, tmp_path):
    """Three exact-duplicate groups chosen (by precomputed md5) so each
    straddles the NAIVE per-doc split, plus two singletons: the split
    entry must assign every member its cluster-min-id's split (matching
    a pure-Python md5 reference row for row), and the audit entry must
    measure naive_straddling = 3, safe_straddling = 0 over exactly the
    3 within-group candidate pairs."""
    from idh_etl_demo_spark.catalog import ENTRIES
    import idh_etl_demo_spark.catalog_r9  # noqa: F401
    from tests.test_r8_properties import _write_docs

    # ids 0/1 → valid/train, 2/3 → train/test, 4/5 → train/valid under
    # the naive per-doc hash (precomputed, deterministic): every dup
    # group straddles naively. Texts are identical within a group and
    # wildly different across groups, so LSH pairs exactly the groups.
    g = [
        "the quick brown fox jumps over the lazy dog near the river bank today",
        "import numpy as np import pandas as pd from pyspark sql import functions",
        "lorem ipsum dolor sit amet consectetur adipiscing elit sed do eiusmod tempor",
    ]
    texts = [g[0], g[0], g[1], g[1], g[2], g[2],
             "completely unrelated singleton text about gardening and tulip bulbs in spring",
             "another singleton concerning medieval castle architecture and stone masonry"]
    sf = _write_docs(tmp_path, texts)

    split_rows = {
        r.doc_id: r
        for r in ENTRIES["doc_leakage_safe_split"].spark(spark, sf).collect()
    }
    expected_cluster = {0: 0, 1: 0, 2: 2, 3: 2, 4: 4, 5: 4, 6: 6, 7: 7}
    expected_size = {0: 2, 1: 2, 2: 2, 3: 2, 4: 2, 5: 2, 6: 1, 7: 1}
    assert set(split_rows) == set(expected_cluster)
    for d, r in split_rows.items():
        assert r.cluster_id == expected_cluster[d], d
        assert r.cluster_size == expected_size[d], d
        assert r.split == _py_split(expected_cluster[d]), d
    # the fixture exercises real leakage: at least one group's members
    # would DISAGREE under the naive per-doc split
    assert any(
        _py_split(d) != _py_split(expected_cluster[d]) for d in expected_cluster
    )
    # dup-group members share a split; singletons degrade to doc_hash
    for d in (6, 7):
        assert split_rows[d].split == _py_split(d)

    audit = ENTRIES["doc_split_leakage_audit"].spark(spark, sf).collect()
    assert len(audit) == 1
    a = audit[0]
    assert a.n_dup_pairs == 3
    assert a.safe_straddling == 0
    expected_naive = sum(
        1
        for lo, hi in [(0, 1), (2, 3), (4, 5)]
        if _py_split(lo) != _py_split(hi)
    )
    assert expected_naive == 3  # fixture chosen so every group straddles
    assert a.naive_straddling == expected_naive
    assert a.naive_straddle_micro == (expected_naive * 1000000) // 3


# ---------------------------------------------------------------------------
# embedding_prototype_pruning vs a pure-Python full-chain reference
# ---------------------------------------------------------------------------


def test_prototype_pruning_matches_python_reference(spark):
    """The pruning entry on the REAL sf0.001 embeddings must equal a
    pure-Python twin of the full trained-quantizer chain: kcenter seeds
    → one ×100-grid Lloyd update → final assignment (``_py_pq_train``
    run on the full 64 dims — the identical arithmetic the sub-space
    chain uses), then per-cluster hardness ranks (dist² desc, vec_id
    asc) with the ceil(half)-kept rule. Pins that ``kept`` marks the
    FARTHEST-from-prototype half per cluster, cluster-balanced."""
    from idh_etl_demo_spark.catalog import ENTRIES
    import idh_etl_demo_spark.catalog_r9  # noqa: F401
    from tests.test_r8_properties import _py_pq_train

    rows = spark.read.parquet(f"{SF}/embeddings.parquet").collect()
    vecs = {
        r.vec_id: [round(float(x) * 10000) for x in r.embedding] for r in rows
    }
    cb, codes = _py_pq_train(vecs, k=4)
    dist2 = {}
    for i, v in vecs.items():
        best = min(
            (sum((x * 100 - c) ** 2 for x, c in zip(v, cb[cid])), cid)
            for cid in cb
        )
        assert best[1] == codes[i]
        dist2[i] = best[0]
    from collections import defaultdict

    members = defaultdict(list)
    for i, c in codes.items():
        members[c].append(i)
    expected = {}
    for c, ids in members.items():
        ranked = sorted(ids, key=lambda i: (-dist2[i], i))
        for rank0, i in enumerate(ranked):
            expected[i] = (
                c,
                dist2[i],
                len(ids),
                rank0 + 1,
                rank0 + 1 <= (len(ids) + 1) // 2,
            )

    got = ENTRIES["embedding_prototype_pruning"].spark(spark, SF).collect()
    assert len(got) == len(expected)
    for r in got:
        assert (
            r.cluster,
            r.dist2,
            r.cluster_size,
            r.hardness_rank,
            r.kept,
        ) == expected[r.vec_id], r.vec_id
    # the measurement is real: at least two clusters, and kept counts
    # are the ceil-half per cluster (no cluster emptied or kept whole)
    assert len(members) >= 2
    for c, ids in members.items():
        kept_n = sum(1 for i in ids if expected[i][4])
        assert kept_n == (len(ids) + 1) // 2
        if len(ids) > 1:
            assert 0 < kept_n < len(ids)


# ---------------------------------------------------------------------------
# doc_unimax_allocation vs a pure-Python waterfill reference
# ---------------------------------------------------------------------------


def _py_unimax(counts: dict[str, int], epochs: int = 2):
    """Reference waterfill: budget = 90% of epoch-capped supply; langs
    ascending by (cap, lang) saturate while cap ≤ equal-share of the
    remaining budget; unsaturated split evenly, first r take +1."""
    langs = sorted(counts, key=lambda l: (epochs * counts[l], l))
    caps = {l: epochs * counts[l] for l in langs}
    budget = (9 * sum(caps.values())) // 10
    alloc, pfx, n_sat = {}, 0, 0
    for idx, l in enumerate(langs):
        if caps[l] * (len(langs) - idx) <= budget - pfx:
            alloc[l] = caps[l]
            pfx += caps[l]
            n_sat += 1
        else:
            break
    unsat = langs[n_sat:]
    t, r = divmod(budget - pfx, len(unsat))
    for j, l in enumerate(unsat):
        alloc[l] = t + (1 if j + 1 <= r else 0)
    return caps, budget, alloc, set(langs[:n_sat])


def _write_lang_docs(tmp_path, lang_counts: dict[str, int]):
    import pandas as pd

    langs = [l for l, n in sorted(lang_counts.items()) for _ in range(n)]
    df = pd.DataFrame(
        {
            "doc_id": range(len(langs)),
            "text": [f"doc {i} text" for i in range(len(langs))],
            "lang": langs,
            "source": ["synth"] * len(langs),
            "n_chars": [10] * len(langs),
        }
    )
    df.to_parquet(str(tmp_path / "documents.parquet"))
    return str(tmp_path)


@pytest.mark.parametrize(
    "counts",
    [
        # saturation cascade: caps (2,6,14,20) sum 42, B=37; aa, bb AND
        # cc saturate (cc by one: 14·2=28 ≤ 37−8=29), dd takes the 15
        {"aa": 1, "bb": 3, "cc": 7, "dd": 10},
        # nobody saturates: equal caps, B=90 over 5 langs → t=18 r=0
        {"aa": 10, "bb": 10, "cc": 10, "dd": 10, "ee": 10},
        # heavy head, long saturated tail (the sf-like shape)
        {"en": 200, "fr": 80, "es": 75, "zh": 70, "de": 65},
        # two langs, extreme skew
        {"aa": 1, "zz": 999},
    ],
)
def test_unimax_matches_python_reference(spark, tmp_path, counts):
    from idh_etl_demo_spark.catalog import ENTRIES
    import idh_etl_demo_spark.catalog_r9  # noqa: F401

    sf = _write_lang_docs(tmp_path, counts)
    caps, budget, alloc, saturated = _py_unimax(counts)
    got = {r.lang: r for r in ENTRIES["doc_unimax_allocation"].spark(spark, sf).collect()}
    assert set(got) == set(counts)
    for l, r in got.items():
        assert r.n_docs == counts[l], l
        assert r.cap == caps[l], l
        assert r.allocation == alloc[l], l
        assert r.saturated == (l in saturated), l
        assert r.epochs_micro == (alloc[l] * 1000000) // counts[l], l
    # waterfill invariants: the budget is spent exactly, nobody exceeds
    # its epoch cap, and unsaturated allocations differ by at most 1
    assert sum(r.allocation for r in got.values()) == budget
    assert all(r.allocation <= r.cap for r in got.values())
    unsat = [r.allocation for r in got.values() if not r.saturated]
    assert unsat and max(unsat) - min(unsat) <= 1


def test_unimax_remainder_distribution(spark, tmp_path):
    """The r>0 case concretely: caps (2,20,20), B=37 → aa saturates
    (P=2), t=(37−2)//2=17 with r=1 — exactly one +1, taken by the
    FIRST unsaturated lang in (cap asc, lang asc) order (cc before dd
    on the lang tie-break) — deterministic, not engine-dependent."""
    from idh_etl_demo_spark.catalog import ENTRIES
    import idh_etl_demo_spark.catalog_r9  # noqa: F401

    sf = _write_lang_docs(tmp_path, {"aa": 1, "cc": 10, "dd": 10})
    got = {r.lang: r for r in ENTRIES["doc_unimax_allocation"].spark(spark, sf).collect()}
    assert got["aa"].allocation == 2 and got["aa"].saturated
    assert got["cc"].allocation == 18 and not got["cc"].saturated
    assert got["dd"].allocation == 17 and not got["dd"].saturated
    assert sum(r.allocation for r in got.values()) == 37


# ---------------------------------------------------------------------------
# NN-descent: pure-Python reference + the improvement claim
# ---------------------------------------------------------------------------


def _py_nndescent(vecs: dict[int, list[int]], k: int = 4):
    """Pure-Python twin of catalog_r9._nnd_ctes: md5 init draws over
    [0, max_id+1), exact double cosine, one local-join round. Returns
    (g0, g1) as {node: [(cos, nid), ...] rank-ordered}."""
    import hashlib
    import math

    n = max(vecs) + 1

    def hv(i, s):
        return int(hashlib.md5(f"{i}-{s}".encode()).hexdigest()[:15], 16)

    def cos(a, b):
        num = sum(x * y for x, y in zip(vecs[a], vecs[b]))
        return num / (
            math.sqrt(sum(x * x for x in vecs[a]))
            * math.sqrt(sum(x * x for x in vecs[b]))
        )

    e0 = set()
    for i in vecs:
        for s in range(1, k + 1):
            raw = hv(i, s) % n
            ib = (i + 1) % n if raw == i else raw
            if ib in vecs:  # sparse ids: missing partners drop
                e0.add((i, ib))

    def topk(pairs):
        from collections import defaultdict

        by = defaultdict(list)
        for a, b in pairs:
            by[a].append((-cos(a, b), b))
        return {
            a: [(-d, b) for d, b in sorted(lst)[:k]] for a, lst in by.items()
        }

    g0 = topk(e0)
    u = set()
    for a, lst in g0.items():
        for _, b in lst:
            u.add((a, b))
            u.add((b, a))
    from collections import defaultdict

    adj = defaultdict(set)
    for v, x in u:
        adj[v].add(x)
    cand = set()
    for v, xs in adj.items():
        xs = sorted(xs)
        for i2 in range(len(xs)):
            for j2 in range(i2 + 1, len(xs)):
                cand.add((xs[i2], xs[j2]))
    for a, lst in g0.items():
        for _, b in lst:
            cand.add((min(a, b), max(a, b)))
    bi = set()
    for a, b in cand:
        bi.add((a, b))
        bi.add((b, a))
    g1 = topk(bi)
    return g0, g1


def test_nndescent_matches_python_reference(spark):
    """embedding_nndescent_round on the REAL sf0.001 embeddings must
    equal the pure-Python local-join twin row for row — ranks, ids,
    and the cosine doubles exactly (identical integer inputs, same
    operation order)."""
    from idh_etl_demo_spark.catalog import ENTRIES
    import idh_etl_demo_spark.catalog_r9  # noqa: F401

    rows = spark.read.parquet(f"{SF}/embeddings.parquet").collect()
    vecs = {
        r.vec_id: [round(float(x) * 10000) for x in r.embedding] for r in rows
    }
    _, g1 = _py_nndescent(vecs)
    got = ENTRIES["embedding_nndescent_round"].spark(spark, SF).collect()
    expected = {
        (a, rank0 + 1): (b, c)
        for a, lst in g1.items()
        for rank0, (c, b) in enumerate(lst)
    }
    assert len(got) == len(expected)
    for r in got:
        b, c = expected[(r.vec_id, r.rank)]
        assert r.neighbor_id == b, (r.vec_id, r.rank)
        assert r.cosine_sim == c, (r.vec_id, r.rank)


def test_nndescent_round_improves_recall(spark, tmp_path):
    """THE claim NN-descent exists for (Dong et al. 2011): one local
    join lifts recall over the random init graph. Constructs 4
    well-separated clusters (σ=0.05 — the structured regime), runs the
    REAL ``embedding_nndescent_recall_audit`` entry on them with full
    DuckDB-oracle parity, and asserts the lift. On the real sf data
    the same entry also lifts (1→13 of 80 at sf0.01, init→round1),
    checked here at sf0.001 without the constructed fixture."""
    import duckdb
    import numpy as np

    from idh_etl_demo_spark.catalog import ENTRIES
    import idh_etl_demo_spark.catalog_r9  # noqa: F401
    from tests.compare import assert_frames_equal

    rng = np.random.RandomState(7)
    C = rng.randn(4, 64)
    C /= np.linalg.norm(C, axis=1, keepdims=True)
    X = []
    for i in range(400):
        v = C[i % 4] + 0.05 * rng.randn(64)
        X.append(v / np.linalg.norm(v))
    sf = _write_embeddings(tmp_path, X)

    e = ENTRIES["embedding_nndescent_recall_audit"]
    sdf = e.spark(spark, sf).toPandas()
    con = duckdb.connect()
    con.execute(
        f"create view embeddings as select * from "
        f"read_parquet('{sf}/embeddings.parquet')"
    )
    assert_frames_equal(sdf, con.execute(e.oracle).df())
    by = {r.phase: r for r in sdf.itertuples()}
    assert by["round1"].hits > by["init"].hits, sdf.to_string()

    real = {
        r.phase: r
        for r in ENTRIES["embedding_nndescent_recall_audit"]
        .spark(spark, SF)
        .collect()
    }
    assert real["round1"].hits > real["init"].hits


# ---------------------------------------------------------------------------
# embedding_d4_curation vs a pure-Python end-to-end reference
# ---------------------------------------------------------------------------


def test_d4_curation_matches_python_reference(spark):
    """The composed D4 pipeline — trained clustering, SemDeDup keep
    rule, survivor prototype ranks, drop-the-closest-quarter — must
    equal a pure-Python reference on the real sf0.001 embeddings,
    every column exact. Also pins the composition is non-vacuous:
    duplicates are dropped, survivors are pruned, and a majority is
    kept."""
    import math

    from idh_etl_demo_spark.catalog import ENTRIES
    import idh_etl_demo_spark.catalog_r9  # noqa: F401
    from idh_etl_demo_spark.catalog_r7 import _SEMDEDUP_THRESHOLD
    from tests.test_r8_properties import _py_pq_train

    rows = spark.read.parquet(f"{SF}/embeddings.parquet").collect()
    vecs = {
        r.vec_id: [round(float(x) * 10000) for x in r.embedding] for r in rows
    }
    cb, codes = _py_pq_train(vecs, k=4)
    dist2 = {
        i: min(
            (sum((x * 100 - c) ** 2 for x, c in zip(v, cb[cid])), cid)
            for cid in cb
        )[0]
        for i, v in vecs.items()
    }

    def cos(a, b):
        num = sum(x * y for x, y in zip(vecs[a], vecs[b]))
        return num / (
            math.sqrt(sum(x * x for x in vecs[a]))
            * math.sqrt(sum(x * x for x in vecs[b]))
        )

    from collections import defaultdict

    members = defaultdict(list)
    for i, c in codes.items():
        members[c].append(i)
    dup_of = {}
    for c, ids in members.items():
        ids = sorted(ids)
        for j, v in enumerate(ids):
            lower = [u for u in ids[:j] if cos(u, v) >= _SEMDEDUP_THRESHOLD]
            if lower:
                dup_of[v] = min(lower)
    expected = {}
    for c, ids in members.items():
        surv = sorted(
            (i for i in ids if i not in dup_of),
            key=lambda i: (dist2[i], i),
        )
        for rank0, i in enumerate(surv):
            expected[i] = (
                c,
                True,
                dist2[i],
                rank0 + 1,
                rank0 + 1 > len(surv) // 4,
            )
        for i in ids:
            if i in dup_of:
                expected[i] = (c, False, dist2[i], None, False)

    got = ENTRIES["embedding_d4_curation"].spark(spark, SF).collect()
    assert len(got) == len(expected)
    for r in got:
        c, keep, d2, pr, kept = expected[r.vec_id]
        assert (r.cluster, r.semdedup_keep, r.dist2) == (c, keep, d2), r.vec_id
        assert r.proto_rank == pr, r.vec_id
        assert r.d4_kept == kept, r.vec_id
    n_dup = sum(1 for v in expected.values() if not v[1])
    n_pruned = sum(1 for v in expected.values() if v[1] and not v[4])
    n_kept = sum(1 for v in expected.values() if v[4])
    assert n_dup > 0 and n_pruned > 0
    assert n_kept > len(expected) // 2


# ---------------------------------------------------------------------------
# doc_winnow_fingerprints vs a pure-Python reference + the MOSS guarantee
# ---------------------------------------------------------------------------


def _py_winnow(text: str, k: int = 3, w: int = 4):
    """Reference winnowing (Schleimer et al. 2003): 40-bit md5 gram
    hashes, window-of-w minima with the leftmost tie rule via the
    packed gh·2^20+pos integer, deduped. Returns {(pos, gh)}."""
    import hashlib
    import re

    norm = re.sub(r"\s+", " ", text.lower().strip())
    toks = [t for t in norm.split(" ") if t]
    grams = [
        (
            i + 1,
            int(
                hashlib.md5(" ".join(toks[i : i + k]).encode()).hexdigest()[
                    :10
                ],
                16,
            ),
        )
        for i in range(len(toks) - k + 1)
    ]
    out = set()
    for j in range(len(grams) - w + 1):
        sel = min(gh * 1048576 + pos for pos, gh in grams[j : j + w])
        out.add((sel % 1048576, sel // 1048576))
    return out


def test_winnow_matches_python_reference(spark):
    """doc_winnow_fingerprints on the REAL sf0.001 corpus must equal
    the pure-Python winnow per document, including corpus-wide
    fingerprint occupancy, and the selection density must sit near the
    paper's 2/(w+1) expectation."""
    from collections import Counter

    from idh_etl_demo_spark.catalog import ENTRIES
    import idh_etl_demo_spark.catalog_r9  # noqa: F401

    rows = spark.read.parquet(f"{SF}/documents.parquet").collect()
    expected = {r.doc_id: _py_winnow(r.text) for r in rows}
    occupancy = Counter(
        gh for fps in expected.values() for _, gh in fps
    )
    got = ENTRIES["doc_winnow_fingerprints"].spark(spark, SF).collect()
    assert len(got) == sum(len(v) for v in expected.values())
    for r in got:
        assert (r.pos, r.fingerprint) in expected[r.doc_id], r
        assert r.fp_corpus_count == occupancy[r.fingerprint], r
    # density ≈ 2/(w+1) = 0.4 of the gram stream (loose band — the
    # guarantee is structural, the density is the paper's expectation)
    n_grams = sum(
        max(len([t for t in r.text.lower().split() if t]) - 3 + 1, 0)
        for r in rows
    )
    density = len(got) / n_grams
    assert 0.25 < density < 0.55, density


def test_winnow_guarantee_shared_substring_shares_fingerprint(spark, tmp_path):
    """THE winnowing guarantee: any shared run of ≥ w+k−1 = 6 tokens
    between two documents shares at least one fingerprint VALUE. Two
    otherwise-disjoint documents embed the same 6-token phrase at
    different positions; a third shares nothing and must share no
    fingerprint with either."""
    from idh_etl_demo_spark.catalog import ENTRIES
    import idh_etl_demo_spark.catalog_r9  # noqa: F401
    from tests.test_r8_properties import _write_docs

    phrase = "winnow guarantee spans exactly six tokens"
    texts = [
        f"alpha beta gamma delta {phrase} epsilon zeta",
        f"one two three four five six seven {phrase}",
        "completely disjoint vocabulary nothing matches here at all ever",
    ]
    sf = _write_docs(tmp_path, texts)
    got = ENTRIES["doc_winnow_fingerprints"].spark(spark, sf).collect()
    by_doc = {}
    for r in got:
        by_doc.setdefault(r.doc_id, set()).add(r.fingerprint)
    assert by_doc[0] & by_doc[1], "shared 6-token phrase lost by winnowing"
    assert not (by_doc[0] & by_doc[2])
    assert not (by_doc[1] & by_doc[2])
    # occupancy marks the shared prints as cross-doc
    shared = by_doc[0] & by_doc[1]
    for r in got:
        if r.fingerprint in shared:
            assert r.fp_corpus_count >= 2


# ---------------------------------------------------------------------------
# MMR diversified reranking (Carbonell & Goldstein 1998)
# ---------------------------------------------------------------------------


def _py_mmr_reference(texts):
    """Pure-Python MMR over the multiquery BM25 shortlist: the same
    integer-exact scoring, per-query rel-norm, token-set Jaccard, and
    K greedy argmax steps with (mmr desc, rank asc) ties — every double
    produced by the identical operation order as both engines."""
    from idh_etl_demo_spark.catalog_r9 import _BM25_QUERIES, _BM25_TOPN, _MMR_STEPS

    def toks(t):
        return [w for w in " ".join(t.lower().strip().split()).split(" ") if w]

    docs = {i: toks(t) for i, t in enumerate(texts)}
    S = sum(len(v) for v in docs.values())
    N = len(docs)
    out = []
    for qid, terms in _BM25_QUERIES:
        scored = []
        for d, tok in docs.items():
            present = sorted(t for t in set(terms) if t in tok)
            if not present:
                continue
            total = 0.0
            for t in present:
                tf = tok.count(t)
                df = sum(1 for v in docs.values() if t in v)
                dl = len(tok)
                num = (2 * (N - df) + 1) * 22 * tf * S
                den = (2 * df + 1) * (10 * S * tf + 3 * S + 9 * dl * N)
                total += num / den
            scored.append((-total, d))
        shortlist = [
            (d, -neg, rank)
            for rank, (neg, d) in enumerate(sorted(scored)[:_BM25_TOPN], 1)
        ]
        if not shortlist:
            continue
        mx = max(bm for _, bm, _ in shortlist)
        cand = {d: (bm / mx, rank) for d, bm, rank in shortlist}
        tsets = {d: set(docs[d]) for d in cand}

        def jac(a, b):
            shared = len(tsets[a] & tsets[b])
            return shared / (len(tsets[a]) + len(tsets[b]) - shared)

        first = next(d for d, (_, rank) in cand.items() if rank == 1)
        sel = [(first, 1, cand[first][1], cand[first][0] / 2)]
        for step in range(2, _MMR_STEPS + 1):
            chosen = {d for d, *_ in sel}
            if len(chosen) == len(cand):
                break
            best = None
            for d, (rel, rank) in cand.items():
                if d in chosen:
                    continue
                sims = [jac(d, s) for s in chosen if jac(d, s) > 0]
                msim = max(sims) if sims else 0.0
                mmr = (rel - msim) / 2
                key = (-mmr, rank)
                if best is None or key < best[0]:
                    best = (key, d, rank, mmr)
            sel.append((best[1], step, best[2], best[3]))
        out.extend((qid, step, d, rank, mmr) for d, step, rank, mmr in sel)
    return sorted(out)


def test_mmr_matches_python_reference(spark, tmp_path):
    """doc_bm25_mmr on a hand-built corpus with near-duplicate
    high-BM25 docs must equal the pure-Python MMR exactly (steps, doc
    picks, and the mmr_score doubles) — and must actually REORDER: the
    near-duplicate of the top doc wins BM25 rank 2 but MMR must demote
    it behind a diverse lower-ranked doc."""
    from idh_etl_demo_spark.catalog import ENTRIES
    import idh_etl_demo_spark.catalog_r9  # noqa: F401
    from tests.test_r8_properties import _write_docs

    texts = [
        "dup dup hash vector scan",          # q1 top doc
        "dup hash dup vector scan",          # exact token-set duplicate
        "dup dup hash quantize shard",       # strong diverse q1 match
        "vector probe rehash chain",         # another diverse q1 match
        "scan filter join merge merge merge",
        "spark stream batch stream",
        "slow fast slow fast slow",
        "the quick brown fox",
    ]
    sf = _write_docs(tmp_path, texts)
    expected = _py_mmr_reference(texts)
    got = sorted(
        (r.query_id, r.mmr_step, r.doc_id, r.bm25_rank, r.mmr_score)
        for r in ENTRIES["doc_bm25_mmr"].spark(spark, sf).collect()
    )
    assert len(got) == len(expected)
    for g, e in zip(got, expected):
        assert g[:4] == e[:4], (g, e)
        assert g[4] == e[4], (g, e)  # exact doubles, no tolerance
    # the reorder MMR exists for: q1's BM25 rank-2 near-duplicate must
    # NOT be the step-2 pick, and some doc with a worse BM25 rank must
    # be promoted ahead of it
    q1 = {step: (doc, rank) for qid, step, doc, rank, _ in got if qid == 1}
    dup_steps = [s for s, (d, _) in q1.items() if d == 1]
    assert q1[1][0] == 0  # step 1 is pure relevance: the top doc
    assert q1[2][0] != 1, "MMR step 2 picked the near-duplicate"
    if dup_steps:
        promoted = [s for s, (_, r) in q1.items() if r > 2 and s < dup_steps[0]]
        assert promoted, "no lower-BM25 doc was promoted past the dup"
