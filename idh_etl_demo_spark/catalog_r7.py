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


# ===========================================================================
# Multi-probe IVF+int8 serving (nprobe > 1) and the audit that prices it
# ===========================================================================


def _ivf_int8_scored_frames(
    spark: SparkSession, sf_dir: str, nprobe: int
) -> DataFrame:
    """Shared candidate-scoring stage of the IVF+int8 serving path:
    (query_id, neighbor_id, cell_rank, sim) for every in-cell candidate
    across each query's ``nprobe`` nearest trained cells — BEFORE the
    per-query top-k. ``cell_rank`` is the probed cell's rank for that
    query, so nprobe=1 results are the ``cell_rank = 1`` subset (the
    audit entry uses exactly that to price probe depth)."""
    from idh_etl_demo_spark.operators.kmeans import lloyd_assign_topn
    from idh_etl_demo_spark.operators.similarity import quantize_int8

    assigned, cents = _km_trained_frames(spark, sf_dir, _TRAINED_CELLS)
    emb = _t(spark, sf_dir, "embeddings").repartition(
        spark.sparkContext.defaultParallelism
    )
    codes = quantize_int8(emb, "embedding").select(
        "vec_id", F.col("q_int8").alias("iv")
    )
    cand = (
        assigned.select("vec_id", "cluster")
        .join(codes, "vec_id")
        .select(
            F.col("vec_id").alias("neighbor_id"),
            F.col("iv").alias("cv"),
            "cluster",
        )
    )
    qcells = lloyd_assign_topn(
        assigned.filter(F.col("vec_id") % 25 == 0).select("vec_id", "v"),
        cents,
        nprobe,
    )
    q = (
        qcells.select("vec_id", "cluster", "cell_rank")
        .join(codes, "vec_id")
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("iv").alias("qv"),
            "cluster",
            "cell_rank",
        )
    )
    return (
        cand.join(F.broadcast(q), "cluster")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            "cell_rank",
            (
                _spark_int_dot(F.col("qv"), F.col("cv"))
                / (
                    F.sqrt(_spark_int_dot(F.col("qv"), F.col("qv")))
                    * F.sqrt(_spark_int_dot(F.col("cv"), F.col("cv")))
                )
            ).alias("sim"),
        )
    )


def _multiprobe_scored_ctes(nprobe: int) -> str:
    """Oracle twin of ``_ivf_int8_scored_frames``: CTEs ``qc`` (each
    query's top-``nprobe`` trained cells from the km chain's ranked
    ``r2``), ``cand`` and ``scored`` — appended after the km chain +
    int8 codes CTEs."""
    return f"""
    qc as (select vec_id as query_id, cid as cluster, rn as cell_rank
           from r2 where vec_id % 25 = 0 and rn <= {nprobe}),
    q as (
      select qc.query_id, c.v as qv, qc.cluster, qc.cell_rank
      from qc join codes c on c.vec_id = qc.query_id
    ),
    cand as (
      select a.vec_id as neighbor_id, c.v as cv, a.cluster
      from a2 a join codes c using (vec_id)
    ),
    scored as (
      select query_id, neighbor_id, cell_rank,
             list_dot_product(qv, cv)
               / (sqrt(list_dot_product(qv, qv))
                  * sqrt(list_dot_product(cv, cv))) as sim
      from q join cand using (cluster)
      where neighbor_id != query_id
    )"""


def _multiprobe_sql() -> str:
    from idh_etl_demo_spark.catalog_r6 import _INT8_CODES_CTE

    return f"""
    with {','.join(_km_trained_ctes(_TRAINED_CELLS))},
    {_INT8_CODES_CTE},
    {_multiprobe_scored_ctes(2)}
    select query_id, neighbor_id,
           round(sim, 6) as int8_cosine, rank
    from (
      select query_id, neighbor_id, sim,
             row_number() over (partition by query_id
                                order by sim desc, neighbor_id asc) as rank
      from scored
    ) where rank <= 5
    order by query_id, rank
    """


@query("embedding_ivf_multiprobe_search", _multiprobe_sql())
def embedding_ivf_multiprobe_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-probe IVF+int8 serving (nprobe=2): each query scans the
    inverted lists of its TWO nearest trained cells instead of one —
    the standard recall lever when the true neighbor straddles a cell
    boundary (the single-probe entry's known failure mode). Ranking is
    the same engine-exact integer int8 cosine as
    ``embedding_ivf_int8_search``; the only change is the query-side
    cell set, ranked by the same integer L2 the assignment argmin uses
    (ties (dist, cid) — the km chain's ``r2`` CTE verbatim).

    Scale shape: the query side fans out ×nprobe (queries are the SMALL
    side, broadcast); the corpus side is untouched — still one cell per
    vector, still an equi-join on the cell id, no all-pairs stage. Cost
    grows linearly in nprobe on candidate count only;
    ``embedding_ivf_nprobe_audit`` prices exactly that trade."""
    scored = _ivf_int8_scored_frames(spark, sf_dir, 2)
    w = Window.partitionBy("query_id").orderBy(
        F.desc("sim"), F.asc("neighbor_id")
    )
    return (
        scored.select("query_id", "neighbor_id", "sim")
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= 5)
        .select(
            "query_id",
            "neighbor_id",
            F.round("sim", 6).alias("int8_cosine"),
            "rank",
        )
        .orderBy("query_id", "rank")
    )


def _nprobe_audit_sql() -> str:
    import idh_etl_demo_spark.catalog_llm  # noqa: F401  (registers topk)
    from idh_etl_demo_spark.catalog import ENTRIES
    from idh_etl_demo_spark.catalog_r6 import _INT8_CODES_CTE

    topk = ENTRIES["embedding_cosine_topk"].oracle
    return f"""
    with {','.join(_km_trained_ctes(_TRAINED_CELLS))},
    {_INT8_CODES_CTE},
    {_multiprobe_scored_ctes(2)},
    truth as materialized (
      select query_id, neighbor_id from ({topk})
    ),
    probes as (
      select 1 as nprobe, query_id, neighbor_id, sim
      from scored where cell_rank = 1
      union all
      select 2 as nprobe, query_id, neighbor_id, sim from scored
    ),
    approx as (
      select nprobe, query_id, neighbor_id
      from (
        select nprobe, query_id, neighbor_id,
               row_number() over (partition by nprobe, query_id
                                  order by sim desc, neighbor_id asc) as rank
        from probes
      ) where rank <= 5
    ),
    hits as (
      select a.nprobe, count(*) as n_hits
      from approx a join truth t
        on t.query_id = a.query_id and t.neighbor_id = a.neighbor_id
      group by a.nprobe
    ),
    cands as (
      select nprobe, count(*) as n_candidates from probes group by nprobe
    )
    select c.nprobe,
           cast((select count(*) from truth) as bigint) as n_truth,
           cast(coalesce(h.n_hits, 0) as bigint) as n_hits,
           coalesce(h.n_hits, 0) * 1.0
             / (select count(*) from truth) as recall_at_5,
           cast(c.n_candidates as bigint) as n_candidates
    from cands c left join hits h on h.nprobe = c.nprobe
    order by c.nprobe
    """


@query("embedding_ivf_nprobe_audit", _nprobe_audit_sql())
def embedding_ivf_nprobe_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The nprobe COST/RECALL curve, one row per probe depth: recall@5
    of the IVF+int8 serving path against exact fixed-point cosine truth
    (``embedding_cosine_topk`` composed verbatim — the established
    technique) beside the candidate count the probe depth paid for.
    This is the number a production deployment tunes: at sf0.01 probing
    the 2nd trained cell lifts recall while roughly doubling in-list
    work — whether that trade is worth it IS this table.

    Both depths share ONE scored frame (nprobe=1 is the cell_rank=1
    subset of the nprobe=2 scan), so the audit costs one multi-probe
    pass, not two. All counts are integers; the single recall division
    is deterministic IEEE — hash-gated exactly.

    Scale shape: the truth side is quadratic by parameter choice (fixed
    query fraction × brute-force scan) exactly like the sibling audits
    (embedding_ann_audit, embedding_int8_ann_recall) — at prod scale it
    runs on a sampled query set; the approx side is the serving plan
    itself. Excluded from the 10× probe set under the same documented
    policy."""
    from idh_etl_demo_spark.catalog_llm import embedding_cosine_topk

    scored = _ivf_int8_scored_frames(spark, sf_dir, 2)
    probes = (
        scored.filter(F.col("cell_rank") == 1)
        .select(F.lit(1).alias("nprobe"), "query_id", "neighbor_id", "sim")
        .unionByName(
            scored.select(
                F.lit(2).alias("nprobe"), "query_id", "neighbor_id", "sim"
            )
        )
    )
    w = Window.partitionBy("nprobe", "query_id").orderBy(
        F.desc("sim"), F.asc("neighbor_id")
    )
    approx = (
        probes.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
        .select("nprobe", "query_id", "neighbor_id")
    )
    truth = embedding_cosine_topk(spark, sf_dir).select(
        "query_id", "neighbor_id"
    )
    hits = (
        approx.join(truth, ["query_id", "neighbor_id"])
        .groupBy("nprobe")
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    cands = probes.groupBy("nprobe").agg(
        F.count(F.lit(1)).alias("n_candidates")
    )
    n_truth = truth.agg(F.count(F.lit(1)).alias("n_truth"))
    return (
        cands.join(hits, "nprobe", "left")
        .crossJoin(F.broadcast(n_truth))
        .select(
            "nprobe",
            "n_truth",
            F.coalesce(F.col("n_hits"), F.lit(0)).cast("long").alias("n_hits"),
            (
                F.coalesce(F.col("n_hits"), F.lit(0)).cast("double")
                / F.col("n_truth")
            ).alias("recall_at_5"),
            "n_candidates",
        )
        .orderBy("nprobe")
    )
