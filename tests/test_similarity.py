"""Similarity-search operators: the numpy fast path must rank identically
to the exact-expression baseline; ANN recall is sane."""

from __future__ import annotations

import pytest

from idh_etl_demo_spark.operators.similarity import (
    cosine_topk_bruteforce,
    cosine_topk_pandas,
    signbit_bucket_ann,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


def _pairs(df):
    return {(r.query_id, r.rank): r.neighbor_id for r in df.collect()}


def test_pandas_fast_path_matches_exact_ranking(spark, emb):
    queries = emb.filter("vec_id % 50 = 0")
    exact = _pairs(cosine_topk_bruteforce(emb, queries, k=5))
    fast = _pairs(cosine_topk_pandas(emb, queries, k=5))
    assert exact == fast


def _planted_corpus(spark, n_base=200, n_planted=40, dim=64, noise=0.12, seed=3):
    """Base vectors + planted near-duplicates (base + small noise,
    cosine ≈ 0.97-0.99): the retrieval case ANN exists for."""
    import numpy as np

    rng = np.random.RandomState(seed)
    base = rng.randn(n_base, dim)
    planted = base[:n_planted] + noise * rng.randn(n_planted, dim)
    rows = [
        (int(i), [float(x) for x in v])
        for i, v in enumerate(list(base) + list(planted))
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>"), n_base


def test_hyperplane_ann_recall_on_planted_neighbors(spark):
    """K=16 random-hyperplane bits + Hamming-1 multi-probe must recover
    the planted partner for ≥80% of queries — while searching ~17/65536
    of the bucket space. This is the recall bar that justified replacing
    the 8-bit axis-aligned buckets."""
    from idh_etl_demo_spark.operators.similarity import hyperplane_ann

    corpus, n_base = _planted_corpus(spark)
    queries = corpus.filter(f"vec_id >= {n_base}")  # the planted copies

    # lazy-builders rule: constructing the ANN plan must run ZERO Spark
    # jobs (the old signature inferred dim via corpus.first() — a driver
    # action at plan-build time, round-2 verdict item)
    sc = spark.sparkContext
    sc.setJobGroup("ann-build", "")
    try:
        ann = hyperplane_ann(corpus, queries, dim=64, k=1, bits=16, multiprobe=True)
    finally:
        sc.setJobGroup("", "")
    jobs = sc.statusTracker().getJobIdsForGroup("ann-build")
    assert len(jobs) == 0, f"hyperplane_ann ran {len(jobs)} jobs at plan-build"
    top = {r.query_id: r.neighbor_id for r in ann.collect()}
    n_queries = queries.count()
    hits = sum(1 for q, n in top.items() if n == q - n_base)
    assert hits / n_queries >= 0.8, f"recall {hits}/{n_queries}"

    # multi-probe is what buys the recall: single-bucket lookup at the
    # same K must be strictly worse or equal, never better
    single = hyperplane_ann(corpus, queries, dim=64, k=1, bits=16, multiprobe=False)
    s_top = {r.query_id: r.neighbor_id for r in single.collect()}
    s_hits = sum(1 for q, n in s_top.items() if n == q - n_base)
    assert s_hits <= hits


def test_hyperplane_bucket_occupancy_bounded(spark):
    """Bucket-occupancy distribution: random hyperplanes must spread a
    natural corpus so no bucket holds a quadratic-blowup share. With
    N=240 and 2^16 buckets the max bucket should be a handful of rows."""
    import pyspark.sql.functions as F

    from idh_etl_demo_spark.operators.similarity import (
        hyperplane_bucket,
        rademacher_planes,
    )

    corpus, _ = _planted_corpus(spark)
    planes = rademacher_planes(64, 16, seed=7)[0]
    occ = (
        corpus.select(hyperplane_bucket(F.col("embedding"), planes).alias("b"))
        .groupBy("b")
        .count()
    )
    stats = occ.agg(F.max("count").alias("mx"), F.count(F.lit(1)).alias("nb")).first()
    # planted pairs share buckets by design; beyond a pair plus a stray
    # collision nothing should pile up
    assert stats.mx <= 4, f"hot bucket of {stats.mx} rows"
    assert stats.nb >= 150  # corpus spreads over many buckets


def test_ann_results_subset_of_bucket_and_high_recall(spark, emb):
    queries = emb.filter("vec_id % 50 = 0")
    exact = cosine_topk_bruteforce(emb, queries, k=1)
    ann = signbit_bucket_ann(emb, queries, k=1, bits=2)
    exact_top = {r.query_id: r.neighbor_id for r in exact.collect()}
    ann_top = {r.query_id: r.neighbor_id for r in ann.collect()}
    # data and algorithm are deterministic: 2-bit buckets (1/4 of the
    # corpus searched) recover the exact top-1 for ≥half the queries on
    # this synthetic corpus; wider buckets trade recall for pruning
    assert set(ann_top) <= set(exact_top)
    hits = sum(1 for q, n in ann_top.items() if exact_top[q] == n)
    assert hits / max(len(ann_top), 1) >= 0.5
