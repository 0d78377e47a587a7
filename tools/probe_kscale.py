"""k∝N probe for the clustered-quadratic family (r7 verdict ask #3).

SemDeDup (``embedding_semantic_dedup``) and the trained-IVF entries pin
``_TRAINED_CELLS = 4`` so the DuckDB oracle stays deterministic; their
100 TB story is "k grows with N, cluster size stays constant, so the
in-cell quadratic work per cell is flat and total work is linear".
This probe MEASURES that claim: it runs the same kcenter→Lloyd training
chain (integer-quantized vectors, Gonzalez farthest-first seeding, two
Lloyd rounds — operators/kmeans.py) on the sf0.1 embeddings and on the
bench_scale 10× union, sweeping k, and reports per-cell sizes and
in-cell pair counts (the SemDeDup work metric: sum over cells of
n_c·(n_c-1)/2).

Expected shape: at 10× data with k held at 4, pairs-per-cell grows
~100× (quadratic in cell size); scaling k with N (k=40 at 10×) brings
mean cell size — and pairs-per-cell — back to the base line, leaving
TOTAL pairs ~10× (linear in N). That table is the artifact NOTES cites.

Probe-only: no catalog entry, no oracle (k>4 has no deterministic SQL
twin and needs none — the oracle-gated k=4 entries pin correctness;
this pins the scaling claim). The kcenter loop here localCheckpoints
the frontier each round so k=40 doesn't build a 40-join lineage — the
catalog's unrolled ``_kcenter_seed_frame`` is fine at k=4 but plan
depth, not data, would dominate at k=40.

Usage: python tools/probe_kscale.py  [--base /root/testdata/sf0.1]
Writes PROBE_KSCALE.json and prints a markdown table.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession, functions as F

from idh_etl_demo_spark.session import get_spark


def _dist2(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def kcenter_seeds_loop(vv: DataFrame, k: int) -> DataFrame:
    """Gonzalez farthest-first seeding, loop-driven: same algorithm as
    catalog_r3._kcenter_seed_frame (md5-min start, argmax-by-(d, vec_id)
    frontier) but with a localCheckpoint per round so lineage depth is
    O(1) instead of O(k). Returns (cid, cv) on the ×100 grid."""
    from idh_etl_demo_spark.operators.kmeans import CENTROID_GRID

    hv = F.conv(
        F.substring(F.md5(F.col("vec_id").cast("string")), 1, 15), 16, 10
    ).cast("long")
    first = (
        vv.withColumn("hv", hv).orderBy("hv", "vec_id").limit(1).collect()[0]
    )
    seeds = [(first.vec_id, list(first.v))]
    base = vv.select(
        "vec_id", "v", _dist2(F.col("v"), F.array([F.lit(x) for x in seeds[0][1]])).alias("d")
    ).localCheckpoint()
    for _ in range(2, k + 1):
        far = base.orderBy(F.desc("d"), "vec_id").limit(1).collect()[0]
        seeds.append((far.vec_id, list(far.v)))
        sv = F.array([F.lit(x) for x in seeds[-1][1]])
        base = base.select(
            "vec_id", "v", F.least(F.col("d"), _dist2(F.col("v"), sv)).alias("d")
        ).localCheckpoint()
    spark = vv.sparkSession
    return spark.createDataFrame(
        [(int(sid), [int(x) * CENTROID_GRID for x in sv]) for sid, sv in seeds],
        "cid long, cv array<long>",
    )


def run_chain(spark: SparkSession, emb: DataFrame, k: int) -> dict:
    from idh_etl_demo_spark.catalog_llm import _spark_quant
    from idh_etl_demo_spark.operators.kmeans import lloyd_assign, lloyd_centroids

    t0 = time.perf_counter()
    vv = emb.repartition(spark.sparkContext.defaultParallelism).select(
        "vec_id", _spark_quant(F.col("embedding")).alias("v")
    ).localCheckpoint()  # probe times the chain, not the parquet scan
    n_vecs = vv.count()
    seeds = kcenter_seeds_loop(vv, k)
    t_seed = time.perf_counter()
    cents = lloyd_centroids(vv, seeds, iterations=2)
    assigned = lloyd_assign(vv, cents)
    cells = (
        assigned.groupBy("cluster")
        .agg(F.count(F.lit(1)).alias("n"))
        .agg(
            F.count(F.lit(1)).alias("cells_used"),
            F.max("n").alias("max_cell"),
            F.avg("n").alias("mean_cell"),
            F.sum(F.col("n") * (F.col("n") - 1) / 2).alias("total_pairs"),
        )
        .collect()[0]
    )
    t_end = time.perf_counter()
    return {
        "k": k,
        "n_vecs": n_vecs,
        "wall_seed_s": round(t_seed - t0, 2),
        "wall_total_s": round(t_end - t0, 2),
        "cells_used": cells.cells_used,
        "max_cell": cells.max_cell,
        "mean_cell": round(cells.mean_cell, 1),
        "total_in_cell_pairs": int(cells.total_pairs),
        "pairs_per_cell": int(cells.total_pairs / cells.cells_used),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--base", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()

    spark = get_spark(app_name="idh-etl-probe-kscale")
    spark.sparkContext.setLogLevel("ERROR")

    import bench_scale

    emb_base = spark.read.parquet(os.path.join(args.base, "embeddings.parquet"))
    emb_10x = bench_scale._scaled(spark, args.base, "embeddings")

    rows = []
    r = run_chain(spark, emb_base, 4)
    r["scale"] = "1x"
    rows.append(r)
    for k in (4, 8, 16, 40):
        r = run_chain(spark, emb_10x, k)
        r["scale"] = "10x"
        rows.append(r)

    with open("PROBE_KSCALE.json", "w") as f:
        json.dump(rows, f, indent=1)

    cols = ["scale", "k", "n_vecs", "cells_used", "mean_cell", "max_cell",
            "total_in_cell_pairs", "pairs_per_cell", "wall_seed_s", "wall_total_s"]
    print("| " + " | ".join(cols) + " |")
    print("|" + "---|" * len(cols))
    for r in rows:
        print("| " + " | ".join(str(r[c]) for c in cols) + " |")


if __name__ == "__main__":
    main()
