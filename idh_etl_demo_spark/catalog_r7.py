"""Round-7 catalog entries: the vector-serving path on a TRAINED coarse
quantizer, multi-probe search, and tokenizer-training primitives.

Everything here follows the repo's entry contract: a ``@query(name,
duckdb_sql)`` registration whose SQL reproduces the Spark result
engine-exactly (integer arithmetic where floats would drift), a shuffle
budget in tests/test_plan_shape.py, a bench HEADLINE row, and property
tests against pure-Python references.

This module may import catalog_llm / catalog_r3 / catalog_r6 helpers at
module level — nothing imports catalog_r7 back, so there is no cycle.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from idh_etl_demo_spark.catalog import _t, query
from idh_etl_demo_spark.catalog_llm import _spark_int_dot
from idh_etl_demo_spark.catalog_r3 import _km_trained_ctes, _km_trained_frames

# Trained coarse-quantizer size: the seeded-KMeans entry's k. At 100 TB
# the centroid count grows with N (cells stay constant-sized); the plan
# shape below is unchanged — only the broadcast centroid row widens.
_TRAINED_CELLS = 4


# ===========================================================================
# IVF-flat ANN on the TRAINED coarse quantizer
# ===========================================================================


def _trained_ivf_sql() -> str:
    return f"""
    with {','.join(_km_trained_ctes(_TRAINED_CELLS))},
    q as (select vec_id as query_id, v as qv, cluster from a2 where vec_id % 25 = 0),
    c as (select vec_id as neighbor_id, v as cv, cluster from a2),
    scored as (
      select query_id, neighbor_id,
             list_dot_product(qv, cv) / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv))) as cosine_sim
      from q join c using (cluster)
      where neighbor_id != query_id
    )
    select query_id, neighbor_id, cosine_sim, rank from (
      select *, row_number() over (partition by query_id
                                   order by cosine_sim desc, neighbor_id asc) as rank
      from scored
    ) where rank <= 5
    order by query_id, rank
    """


@query("embedding_ann_ivf", _trained_ivf_sql())
def embedding_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-flat ANN serving from a TRAINED coarse quantizer: the cell
    table is the seeded-KMeans pipeline's own output (kcenter
    farthest-first seeding → two fixed-point Lloyd rounds — the exact
    composition ``embedding_kmeans_seeded`` gates), and the search is an
    equi-join on the trained cell id with exact cosine ranking inside
    the cell. Until round 7 the quantizer was a first-8-vectors fixture;
    now the serving pipeline eats its own dog food — the codebook it
    probes is the clustering the catalog audits.

    Engine-exactness: the whole training chain is integer arithmetic
    (quantized vectors, integer squared-L2, floor-requantized centroid
    updates), so both engines derive the IDENTICAL cells before the
    in-cell cosine — the driver hash gates every (query, neighbor,
    rank) row with no float tolerance.

    Scale shape: training shuffles ≤ |k|·dim rows per Lloyd round (the
    corpus never re-partitions — see operators/kmeans.py); assignment
    is a packed-broadcast projection; the probe is a cell-id equi-join
    (queries explode only into their own cell). No all-pairs stage.
    At 100 TB: more cells (k grows with N), same plan."""
    assigned, _ = _km_trained_frames(spark, sf_dir, _TRAINED_CELLS)
    q = assigned.filter(F.col("vec_id") % 25 == 0).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv"), "cluster"
    )
    c = assigned.select(
        F.col("vec_id").alias("neighbor_id"), F.col("v").alias("cv"), "cluster"
    )
    scored = (
        c.join(F.broadcast(q), "cluster")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            (
                _spark_int_dot(F.col("qv"), F.col("cv"))
                / (
                    F.sqrt(_spark_int_dot(F.col("qv"), F.col("qv")))
                    * F.sqrt(_spark_int_dot(F.col("cv"), F.col("cv")))
                )
            ).alias("cosine_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine_sim"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= 5)
        .select("query_id", "neighbor_id", "cosine_sim", "rank")
        .orderBy("query_id", "rank")
    )
