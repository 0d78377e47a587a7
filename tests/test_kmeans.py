"""lloyd_iterations: fixed-point KMeans operator (oracle-gated end-to-end
via the embedding_kmeans_2iter entry; these tests check clustering
QUALITY and the grid-scaling invariant on planted data)."""

from __future__ import annotations

import pyspark.sql.functions as F

from idh_etl_demo_spark.operators.kmeans import CENTROID_GRID, lloyd_iterations


def _planted(spark):
    # two well-separated blobs in 4-D quantized space (+ jitter), seeds
    # deliberately BAD: both from blob A's neighborhood edge
    rows = []
    for i in range(30):
        jit = (i * 7) % 5
        rows.append((i, [1000 + jit, 1000 - jit, 1000, 1000]))          # blob A
        rows.append((100 + i, [9000 - jit, 9000 + jit, 9000, 9000]))    # blob B
    return spark.createDataFrame(rows, "vec_id long, v array<bigint>")


def test_planted_blobs_separate(spark):
    vv = _planted(spark)
    seeds = vv.filter(F.col("vec_id").isin([0, 100])).select(
        F.col("vec_id").alias("cid"),
        F.transform("v", lambda x: x * CENTROID_GRID).alias("cv"),
    )
    out = lloyd_iterations(vv, seeds, iterations=2).collect()
    got = {r.vec_id: r.cluster for r in out}
    assert all(got[i] == 0 for i in range(30))
    assert all(got[100 + i] == 100 for i in range(30))


def test_more_iterations_converge_same_on_separated_data(spark):
    vv = _planted(spark)
    seeds = vv.filter(F.col("vec_id").isin([0, 100])).select(
        F.col("vec_id").alias("cid"),
        F.transform("v", lambda x: x * CENTROID_GRID).alias("cv"),
    )
    two = {r.vec_id: r.cluster for r in lloyd_iterations(vv, seeds, 2).collect()}
    four = {r.vec_id: r.cluster for r in lloyd_iterations(vv, seeds, 4).collect()}
    assert two == four  # already converged: extra rounds are stable
