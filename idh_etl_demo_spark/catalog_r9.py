"""Round-9 catalog entries: RESIDUAL product quantization (the FAISS
IVFPQ layout proper — Jégou, Douze, Schmid 2011), multi-probe IVFPQ
serving, the residual-vs-plain recall audit that prices the round-8
disclosure, separable ADC-LUT serving (the m·k layout that survives
production code sizes), two-stage shortlist→exact re-rank serving
(FAISS refine), and table-parameterized BM25 retrieval.

Round 8 shipped IVFPQ without residual encoding (catalog_r8.py
disclosed it as the accuracy gap vs FAISS): codes quantized the raw
vector, so every cell's codebook had to cover the whole space. Classic
IVFPQ instead quantizes the RESIDUAL v − centroid(cell(v)) — residuals
from all cells concentrate around the origin, so the same code budget
spends its codewords on a much smaller ball and recall rises at
identical bytes per vector. This module implements that layout
integer-exactly:

- vectors are the ×10⁴-quantized integers (catalog_llm);
- the coarse quantizer is the audited kcenter→Lloyd chain
  (catalog_r3._km_trained_frames / _km_trained_ctes), centroids on the
  ×100 sub-grid;
- the residual r = v·100 − c_cell is EXACT integer arithmetic on that
  grid;
- residual sub-space codebooks train with the SAME kcenter→Lloyd chain
  at ``grid=1`` (codewords stay on the residual's own grid — a second
  ×100 lift would push reconstruction dots past the 2^53 exactness
  bound);
- the reconstruction recon = c_cell + [rc1 ‖ rc2] is integer, its dot
  products stay < 2^53 (|recon| ≤ ~3e6/coord, rr ≤ 64·9e12 ≈ 6e14),
  so ADC cosine is ONE double division of exact integers — both
  engines rank identically, bit-for-bit.

Entry contract per repo convention: @query registration with a DuckDB
oracle, a shuffle budget in tests/test_plan_shape.py with a
why-comment, a bench.py HEADLINE row, a bench_scale probe or a
documented exclusion, and property tests vs pure-Python references
(tests/test_r9_properties.py).

This module may import catalog_r8 / catalog_r3 / catalog_llm helpers
at module level — nothing imports catalog_r9 back, so there is no
cycle.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from idh_etl_demo_spark.catalog import _t, query
from idh_etl_demo_spark.catalog_llm import _WORDS, _spark_int_dot
from idh_etl_demo_spark.catalog_r3 import (
    _kcenter_seed_frame,
    _km_trained_ctes,
    _km_trained_frames,
)
from idh_etl_demo_spark.catalog_r8 import (
    _PQ_DIM,
    _PQ_K,
    _PQ_SQL_COMBOS,
    _PQ_SUBS,
    _argmin_cid,
    _bm25_term_score,
    _pq_all_ctes,
    _pq_sub_ctes,
)
from idh_etl_demo_spark.operators.kmeans import (
    CENTROID_GRID,
    _packed,
    lloyd_assign_topn,
    lloyd_centroids,
)

# Coarse-cell count — pinned to the audited trained-quantizer chain's k
# (catalog_r3._km_trained_ctes default); at 100 TB k grows ∝N
# (PROBE_KSCALE.json) and every plan below keeps its shape.
_CELLS = 4


# ===========================================================================
# Residual encoding: r = v·100 − c_cell, sub-space codebooks at grid=1
# ===========================================================================


def _res_ctes() -> str:
    """DuckDB CTE chain for the residual-PQ layout, appended AFTER the
    coarse ``_km_trained_ctes`` chain (needs its ``a2``/``c1``/``r2``/
    ``vv``): ``resid`` (exact integer residuals on the ×100 grid), the
    two grid=1 sub-space codebook chains (``z1_*``/``z2_*``), ``rcombos``
    (the |cells|·k² reconstruction table with self-dots) and ``rcodes``
    (the corpus as cell + 2 residual codes)."""
    z1 = _pq_sub_ctes(
        "z1_", 1, _PQ_DIM, src="resid", vexpr="r", grid=1, materialize=True
    )
    z2 = _pq_sub_ctes(
        "z2_", _PQ_SUBS[1][1], _PQ_DIM, src="resid", vexpr="r", grid=1,
        materialize=True,
    )
    # a2m/resid pinned MATERIALIZED: the residual chains reference the
    # coarse assignment many times and DuckDB would re-execute the whole
    # km chain per reference otherwise (110 s → 0.7 s at sf0.01,
    # identical results) — the oracle twin of the Spark side's frozen
    # codebook tables
    return ",".join(
        [
            "a2m as materialized (select * from a2)",
            """resid as materialized (
              select a2m.vec_id, a2m.cluster as cell,
                     list_transform(generate_series(1, 64),
                                    i -> a2m.v[i] * 100 - c.cv[i]) as r
              from a2m join c1 c on a2m.cluster = c.cid
            )""",
            *z1,
            *z2,
            f"""rcombos as (
              select cell, code1, code2, recon,
                     list_dot_product(recon, recon) as rr
              from (
                select cc.cid as cell, a.cid as code1, b.cid as code2,
                       list_transform(generate_series(1, 64),
                         i -> cc.cv[i] + (case when i <= {_PQ_DIM}
                                          then a.cv[i]
                                          else b.cv[i - {_PQ_DIM}] end)) as recon
                from c1 cc cross join z1_c1 a cross join z2_c1 b
              )
            )""",
            """rcodes as materialized (
              select r.vec_id, r.cell, za.cluster as code1, zb.cluster as code2
              from resid r
              join z1_a2 za on r.vec_id = za.vec_id
              join z2_a2 zb on r.vec_id = zb.vec_id
            )""",
        ]
    )


def _res_scored_ctes(nprobe: int) -> str:
    """Residual-ADC candidate scoring CTEs ending in ``rscored``
    (query_id, neighbor_id, cell, cell_rank, adc_cosine): each query
    probes its top-``nprobe`` trained cells (the coarse chain's ranked
    ``r2``, the exact multi-probe source the IVF-flat entries use) and
    scores every candidate in a probed cell by the ADC cosine of the
    candidate's (cell, code1, code2) reconstruction."""
    return f"""
    rqc as (select vec_id as query_id, cid as cell, rn as cell_rank
            from r2 where vec_id % 25 = 0 and rn <= {nprobe}),
    rq as (select rqc.query_id, rqc.cell, rqc.cell_rank, vv.v as qv,
                  list_dot_product(vv.v, vv.v) as qq
           from rqc join vv on vv.vec_id = rqc.query_id),
    rqscore as (
      select query_id, rq.cell, cell_rank, code1, code2,
             list_dot_product(qv, recon) / (sqrt(qq) * sqrt(rr)) as adc_cosine
      from rq join rcombos on rq.cell = rcombos.cell
    ),
    rscored as (
      select s.query_id, k.vec_id as neighbor_id, k.cell, s.cell_rank,
             s.adc_cosine
      from rcodes k join rqscore s
        on k.cell = s.cell and k.code1 = s.code1 and k.code2 = s.code2
      where k.vec_id != s.query_id
    )"""


# Trained-model memo per (applicationId, sf_dir): the three 4-row
# codebook tables, each frozen with an EAGER localCheckpoint. Residual
# PQ training is inherently SEQUENTIAL (residuals need the trained
# coarse quantizer; codes need the trained residual codebooks), so a
# fully-lazy plan re-expands the coarse chain inside every residual
# reference — measured 178 s at sf0.001 vs ~10 s frozen. Freezing the
# k-row model tables after each stage is exactly FAISS's
# train→freeze→encode sequence, and is what a production pipeline does
# with any trained quantizer. bench.py clears this memo before every
# rep (SESSION_CACHED) so reported numbers stay honest cold runs.
_RES_MODELS: dict[tuple[str, str], tuple[DataFrame, DataFrame, DataFrame]] = {}


def _vv(spark: SparkSession, sf_dir: str) -> DataFrame:
    from idh_etl_demo_spark.catalog_llm import _spark_quant

    emb = _t(spark, sf_dir, "embeddings")
    return emb.repartition(spark.sparkContext.defaultParallelism).select(
        "vec_id", _spark_quant(F.col("embedding")).alias("v")
    )


def _resid_frame(vv: DataFrame, cell_cents: DataFrame) -> DataFrame:
    """(vec_id, v, cell, r): exact integer residuals r = v·100 − c_cell
    on the ×100 grid — a packed-broadcast assignment plus a 4-row
    broadcast centroid lookup; no corpus shuffle."""
    from idh_etl_demo_spark.operators.kmeans import lloyd_assign

    assigned = lloyd_assign(vv, cell_cents)
    return assigned.join(
        F.broadcast(cell_cents), assigned["cluster"] == cell_cents["cid"]
    ).select(
        "vec_id",
        "v",
        F.col("cluster").alias("cell"),
        F.zip_with("v", "cv", lambda x, y: x * CENTROID_GRID - y).alias("r"),
    )


def _res_models(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Train (cell_cents, rcents1, rcents2) — the coarse quantizer and
    both grid=1 residual sub-space codebooks — freezing each k-row
    table with an eager localCheckpoint so downstream plans reference
    trained VALUES instead of re-expanding the training lineage."""
    from idh_etl_demo_spark.catalog_r8 import _cells_frozen

    key = (spark.sparkContext.applicationId, sf_dir)
    if key not in _RES_MODELS:
        # one coarse training per (session, sf), shared with the r8
        # IVFPQ entries through the same frozen-table memo
        cell_cents = _cells_frozen(spark, sf_dir)
        resid = _resid_frame(_vv(spark, sf_dir), cell_cents)
        rcents = []
        for lo in (_PQ_SUBS[0][1], _PQ_SUBS[1][1]):
            rv = resid.select("vec_id", F.slice("r", lo, _PQ_DIM).alias("v"))
            # grid=1 seeds: the residual IS already on the centroid grid
            seeds = _kcenter_seed_frame(rv, _PQ_K).select(
                F.col("vec_id").alias("cid"), F.col("v").alias("cv")
            )
            rcents.append(
                lloyd_centroids(rv, seeds, iterations=2, grid=1).localCheckpoint(
                    eager=True
                )
            )
        _RES_MODELS[key] = (cell_cents, rcents[0], rcents[1])
    return _RES_MODELS[key]


def _res_parts(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, DataFrame, DataFrame, DataFrame]:
    """(enc, cell_cents, rcents1, rcents2): the corpus encoded to
    (vec_id, v, cell, code1, code2) with RESIDUAL codes. The coarse
    assignment and both residual codebooks ride the row as packed
    broadcast structs, so encoding is ONE corpus pass with zero
    shuffles; the residual projection is a 4-row broadcast join (cell
    centroid lookup) plus zip_with — exact integers on the ×100 grid."""
    cell_cents, rc1, rc2 = _res_models(spark, sf_dir)
    resid = _resid_frame(_vv(spark, sf_dir), cell_cents)
    enc = (
        resid.crossJoin(F.broadcast(_packed(rc1).withColumnRenamed("cs", "cs1")))
        .crossJoin(F.broadcast(_packed(rc2).withColumnRenamed("cs", "cs2")))
        .select(
            "vec_id",
            "v",
            "cell",
            _argmin_cid(
                F.slice(F.col("r"), _PQ_SUBS[0][1], _PQ_DIM), "cs1", grid=1
            ).alias("code1"),
            _argmin_cid(
                F.slice(F.col("r"), _PQ_SUBS[1][1], _PQ_DIM), "cs2", grid=1
            ).alias("code2"),
        )
    )
    return enc, cell_cents, rc1, rc2


def _res_combo_frame(
    cell_cents: DataFrame, rc1: DataFrame, rc2: DataFrame
) -> DataFrame:
    """The |cells|·k² (cell, code1, code2) reconstruction table:
    recon = c_cell + [rc1 ‖ rc2] (exact integers on the ×100 grid) and
    its self-dot ``rr`` — 64 rows at the pinned sizes; the ONLY thing
    residual-ADC ever computes reconstruction math on."""
    c = cell_cents.select(F.col("cid").alias("cell"), F.col("cv").alias("ccv"))
    a = rc1.select(F.col("cid").alias("code1"), F.col("cv").alias("r1v"))
    b = rc2.select(F.col("cid").alias("code2"), F.col("cv").alias("r2v"))
    recon = F.zip_with("ccv", F.concat("r1v", "r2v"), lambda x, y: x + y)
    # broadcast the k-row codebook sides: checkpointed frames carry no
    # size stats, so a bare crossJoin would plan CartesianProduct
    return (
        c.crossJoin(F.broadcast(a))
        .crossJoin(F.broadcast(b))
        .select("cell", "code1", "code2", recon.alias("recon"))
        .select(
            "cell",
            "code1",
            "code2",
            "recon",
            _spark_int_dot(F.col("recon"), F.col("recon")).alias("rr"),
        )
    )


def _res_scored_frames(
    spark: SparkSession, sf_dir: str, nprobe: int
) -> DataFrame:
    """Spark twin of ``_res_scored_ctes``: (query_id, neighbor_id, cell,
    cell_rank, adc_cosine) for every candidate in each query's
    ``nprobe`` nearest cells. The |Q|·nprobe·k² score table broadcasts
    onto the code stream; the query-side cell fan-out is
    ``lloyd_assign_topn`` (zero shuffles, small side only)."""
    enc, cell_cents, rc1, rc2 = _res_parts(spark, sf_dir)
    combos = _res_combo_frame(cell_cents, rc1, rc2)
    qcells = lloyd_assign_topn(
        enc.filter(F.col("vec_id") % 25 == 0).select("vec_id", "v"),
        cell_cents,
        nprobe,
    )
    q = qcells.select(
        F.col("vec_id").alias("query_id"),
        F.col("cluster").alias("cell"),
        "cell_rank",
        "v",
        _spark_int_dot(F.col("v"), F.col("v")).alias("qq"),
    )
    qscore = q.join(F.broadcast(combos), "cell").select(
        "query_id",
        "cell",
        "cell_rank",
        "code1",
        "code2",
        (
            _spark_int_dot(F.col("v"), F.col("recon")).cast("double")
            / (
                F.sqrt(F.col("qq").cast("double"))
                * F.sqrt(F.col("rr").cast("double"))
            )
        ).alias("adc_cosine"),
    )
    return (
        enc.select("vec_id", "cell", "code1", "code2")
        .join(F.broadcast(qscore), ["cell", "code1", "code2"])
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            "cell",
            "cell_rank",
            "adc_cosine",
        )
    )


_RES_TOP5_TAIL = """
    select query_id, neighbor_id, cell, adc_cosine, rank from (
      select query_id, neighbor_id, cell, adc_cosine,
             row_number() over (partition by query_id
                                order by adc_cosine desc, neighbor_id asc) as rank
      from rscored
    ) where rank <= 5
    order by query_id, rank
"""


@query(
    "embedding_ivfpq_residual_search",
    f"""
    with {','.join(_km_trained_ctes(_CELLS))},
    {_res_ctes()},
    {_res_scored_ctes(1)}
    {_RES_TOP5_TAIL}
    """,
)
def embedding_ivfpq_residual_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVFPQ with RESIDUAL encoding — the FAISS layout proper (Jégou et
    al. 2011, §III): each corpus vector stores its coarse cell plus 2
    sub-space codes of the residual v − c_cell, and search scores
    candidates by the ADC cosine of recon = c_cell + [rc1 ‖ rc2].
    Residuals from every cell concentrate around the origin, so the
    same 2-code budget spends its 4 codewords per sub-space on a far
    smaller ball than round 8's raw-vector codes — the recall gap
    catalog_r8 disclosed, closed (``embedding_ivfpq_residual_recall_
    audit`` measures the lift at identical bytes per vector).

    Engine-exact: the residual is integer arithmetic on the ×100 grid,
    residual codebooks train at grid=1 (operators/kmeans.py), recon and
    all dots stay < 2^53, and the ADC cosine is one double division —
    both engines rank identically, ties on neighbor_id.

    Shape: cell + both residual codes are packed-broadcast argmin
    projections (the residual lookup is a 4-row broadcast join — no
    corpus shuffle); scoring joins the broadcast |Q|·|cells|·k² table
    on (cell, code1, code2); the per-query top-k window is the only
    corpus-keyed exchange. At 100 TB: k∝N cells (PROBE_KSCALE.json),
    m=16, k=256 codewords — the score table widens, the plan holds."""
    scored = _res_scored_frames(spark, sf_dir, nprobe=1)
    w = Window.partitionBy("query_id").orderBy(
        F.desc("adc_cosine"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= 5)
        .select("query_id", "neighbor_id", "cell", "adc_cosine", "rank")
        .orderBy("query_id", "rank")
    )


@query(
    "embedding_ivfpq_multiprobe",
    f"""
    with {','.join(_km_trained_ctes(_CELLS))},
    {_res_ctes()},
    {_res_scored_ctes(2)}
    select query_id, neighbor_id, cell, cell_rank, adc_cosine, rank from (
      select query_id, neighbor_id, cell, cell_rank, adc_cosine,
             row_number() over (partition by query_id
                                order by adc_cosine desc, neighbor_id asc) as rank
      from rscored
    ) where rank <= 5
    order by query_id, rank
    """,
)
def embedding_ivfpq_multiprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-probe residual IVFPQ (nprobe=2): each query scans the
    inverted lists of its TWO nearest coarse cells — the standard
    recall lever when the true neighbor straddles a cell boundary,
    which is IVFPQ's known failure mode at nprobe=1 (round-8 verdict
    ask: the recall cliff at cell boundaries was unpriced). The
    query-side fan-out is ``lloyd_assign_topn`` (the IVF-flat
    multi-probe primitive reused verbatim); candidates in a probed cell
    are scored against THAT cell's reconstructions, so a neighbor found
    through probe 2 carries its own cell's exact ADC cosine.

    Shape: the corpus side is untouched (one cell + 2 codes per
    vector); only the broadcast query/score tables fan out ×nprobe.
    Cost grows linearly in candidate count — ``embedding_ivfpq_nprobe_
    audit`` prices exactly that trade."""
    scored = _res_scored_frames(spark, sf_dir, nprobe=2)
    w = Window.partitionBy("query_id").orderBy(
        F.desc("adc_cosine"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= 5)
        .select(
            "query_id", "neighbor_id", "cell", "cell_rank", "adc_cosine", "rank"
        )
        .orderBy("query_id", "rank")
    )


# ===========================================================================
# Residual-vs-plain recall audit: pricing the round-8 disclosure
# ===========================================================================


_PLAIN_IVFPQ_SCORED = f"""
    pqiv as (
      select vec_id as query_id, cluster as cell,
             list_slice(v, 1, {_PQ_DIM}) as q1,
             list_slice(v, {_PQ_SUBS[1][1]}, 64) as q2,
             list_dot_product(v, v) as qq
      from a2m where vec_id % 25 = 0
    ),
    pqscore as (
      select query_id, cell, code1, code2,
             (list_dot_product(q1, c1v) + list_dot_product(q2, c2v))
               / (sqrt(qq) * sqrt(rr)) as adc_cosine
      from pqiv cross join combos
    ),
    pcand as (
      select a.vec_id as neighbor_id, a.cluster as cell, k.code1, k.code2
      from a2m a join codes k on a.vec_id = k.vec_id
    ),
    pscored as (
      select s.query_id, c.neighbor_id, s.adc_cosine
      from pcand c join pqscore s
        on c.cell = s.cell and c.code1 = s.code1 and c.code2 = s.code2
      where c.neighbor_id != s.query_id
    ),
    papprox as (
      select query_id, neighbor_id from (
        select query_id, neighbor_id,
               row_number() over (partition by query_id
                                  order by adc_cosine desc, neighbor_id asc) as rn
        from pscored
      ) where rn <= 5
    )"""


def _res_recall_sql() -> str:
    import idh_etl_demo_spark.catalog_llm  # noqa: F401  (registers topk)
    from idh_etl_demo_spark.catalog import ENTRIES

    topk = ENTRIES["embedding_cosine_topk"].oracle
    return f"""
    with {','.join(_km_trained_ctes(_CELLS))},
    {_pq_all_ctes()},
    {_PQ_SQL_COMBOS},
    {_res_ctes()},
    {_PLAIN_IVFPQ_SCORED},
    {_res_scored_ctes(1)},
    rapprox as (
      select query_id, neighbor_id from (
        select query_id, neighbor_id,
               row_number() over (partition by query_id
                                  order by adc_cosine desc, neighbor_id asc) as rn
        from rscored
      ) where rn <= 5
    ),
    truth as materialized (select query_id, neighbor_id from ({topk})),
    t_n as (select query_id, count(*) as n_truth from truth group by query_id),
    p_h as (select query_id, count(*) as n from
            (select * from papprox intersect select * from truth)
            group by query_id),
    r_h as (select query_id, count(*) as n from
            (select * from rapprox intersect select * from truth)
            group by query_id)
    select t.query_id,
           cast(t.n_truth as bigint) as n_truth,
           cast(coalesce(p.n, 0) as bigint) as hits_plain,
           cast(coalesce(r.n, 0) as bigint) as hits_residual,
           cast(coalesce(p.n, 0) as double) / t.n_truth as recall_plain,
           cast(coalesce(r.n, 0) as double) / t.n_truth as recall_residual
    from t_n t
    left join p_h p on p.query_id = t.query_id
    left join r_h r on r.query_id = t.query_id
    order by t.query_id
    """


@query("embedding_ivfpq_residual_recall_audit", _res_recall_sql())
def embedding_ivfpq_residual_recall_audit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """RESIDUAL-vs-PLAIN recall audit at the SAME code budget (cell + 2
    sub-space codes of 4 codewords each, identical bytes per vector):
    per-query recall@5 of round-8's raw-vector IVFPQ beside round-9's
    residual IVFPQ, both against the exact fixed-point cosine truth
    (``embedding_cosine_topk`` composed verbatim). This is the table
    that prices the round-8 disclosure — whether quantizing v − c_cell
    instead of v buys recall at zero storage cost, per query, before
    anyone deploys either layout at scale.

    MEASURED FINDING, disclosed: on the sf test embeddings the lift
    does NOT materialize (recalls are near-equal and low). Two causes,
    both verified: (a) the sf embeddings are isotropic random unit
    vectors (measured within-label cosine 0.0) — residual
    concentration, the mechanism FAISS's gain comes from, requires
    cluster structure; (b) at the oracle-pinned k²=16 ADC levels per
    cell, hundreds of candidates tie per code pair and top-5 within a
    tie group is vec_id order. The implementation DOES deliver the
    residual lift when structure exists: the property test
    (tests/test_r9_properties.py::test_residual_beats_plain_on_
    clustered_data) runs this exact entry on clustered vectors and
    residual recall is 2× plain — with full DuckDB-oracle parity on
    that adversarial input. A 9-config numpy sweep confirming the
    isotropy diagnosis is recorded in NOTES_r9.md.

    Both approx sides are the search entries' plans composed verbatim
    (broadcast score tables, no corpus shuffle beyond their top-k
    windows); the truth side is the brute-force scan every recall audit
    pays by design, on the sampled query set. Engine-exact: every
    ranking input is a single double division of exact integers, so
    both engines produce identical top-5 sets and the driver hash gates
    every (query, hits) pair."""
    from idh_etl_demo_spark.catalog_llm import embedding_cosine_topk
    from idh_etl_demo_spark.catalog_r8 import embedding_ivfpq_search

    plain = embedding_ivfpq_search(spark, sf_dir).select(
        "query_id", "neighbor_id"
    )
    res = embedding_ivfpq_residual_search(spark, sf_dir).select(
        "query_id", "neighbor_id"
    )
    truth = embedding_cosine_topk(spark, sf_dir).select("query_id", "neighbor_id")
    t_n = truth.groupBy("query_id").agg(F.count(F.lit(1)).alias("n_truth"))
    p_h = plain.intersect(truth).groupBy("query_id").agg(
        F.count(F.lit(1)).alias("p")
    )
    r_h = res.intersect(truth).groupBy("query_id").agg(
        F.count(F.lit(1)).alias("r")
    )
    return (
        t_n.join(p_h, "query_id", "left")
        .join(r_h, "query_id", "left")
        .select(
            "query_id",
            "n_truth",
            F.coalesce(F.col("p"), F.lit(0)).alias("hits_plain"),
            F.coalesce(F.col("r"), F.lit(0)).alias("hits_residual"),
            (
                F.coalesce(F.col("p"), F.lit(0)).cast("double") / F.col("n_truth")
            ).alias("recall_plain"),
            (
                F.coalesce(F.col("r"), F.lit(0)).cast("double") / F.col("n_truth")
            ).alias("recall_residual"),
        )
        .orderBy("query_id")
    )


# ===========================================================================
# IVFPQ nprobe cost/recall audit
# ===========================================================================


def _ivfpq_nprobe_sql() -> str:
    import idh_etl_demo_spark.catalog_llm  # noqa: F401  (registers topk)
    from idh_etl_demo_spark.catalog import ENTRIES

    topk = ENTRIES["embedding_cosine_topk"].oracle
    return f"""
    with {','.join(_km_trained_ctes(_CELLS))},
    {_res_ctes()},
    {_res_scored_ctes(2)},
    truth as materialized (select query_id, neighbor_id from ({topk})),
    probes as (
      select 1 as nprobe, query_id, neighbor_id, adc_cosine
      from rscored where cell_rank = 1
      union all
      select 2 as nprobe, query_id, neighbor_id, adc_cosine from rscored
    ),
    approx as (
      select nprobe, query_id, neighbor_id from (
        select nprobe, query_id, neighbor_id,
               row_number() over (partition by nprobe, query_id
                                  order by adc_cosine desc, neighbor_id asc) as rank
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


@query("embedding_ivfpq_nprobe_audit", _ivfpq_nprobe_sql())
def embedding_ivfpq_nprobe_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The residual-IVFPQ nprobe COST/RECALL curve, one row per probe
    depth — the IVFPQ twin of ``embedding_ivf_nprobe_audit`` (round 7):
    recall@5 of residual-ADC serving against exact fixed-point cosine
    truth beside the candidate count each probe depth paid for. The
    round-8 verdict's unpriced trade, priced: at nprobe=1 a query whose
    true neighbor sits across a cell boundary CANNOT find it (the
    recall cliff); probing the 2nd cell roughly doubles in-list
    candidates — whether that buys enough recall IS this table.

    Shape: one scored frame serves both rows (nprobe=1 is the
    cell_rank=1 subset — no second serving pass); the truth side is the
    audit-by-design brute-force scan on the sampled query set."""
    from idh_etl_demo_spark.catalog_llm import embedding_cosine_topk

    scored = _res_scored_frames(spark, sf_dir, nprobe=2)
    probes = (
        scored.filter(F.col("cell_rank") == 1)
        .select(F.lit(1).alias("nprobe"), "query_id", "neighbor_id", "adc_cosine")
        .unionByName(
            scored.select(
                F.lit(2).alias("nprobe"), "query_id", "neighbor_id", "adc_cosine"
            )
        )
    )
    w = Window.partitionBy("nprobe", "query_id").orderBy(
        F.desc("adc_cosine"), F.asc("neighbor_id")
    )
    approx = (
        probes.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
        .select("nprobe", "query_id", "neighbor_id")
    )
    truth = embedding_cosine_topk(spark, sf_dir).select("query_id", "neighbor_id")
    hits = (
        approx.join(truth, ["query_id", "neighbor_id"])
        .groupBy("nprobe")
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    cands = probes.groupBy("nprobe").agg(F.count(F.lit(1)).alias("n_candidates"))
    n_truth = truth.agg(F.count(F.lit(1)).alias("n_truth"))
    return (
        cands.join(hits, "nprobe", "left")
        .crossJoin(F.broadcast(n_truth))
        .select(
            "nprobe",
            "n_truth",
            F.coalesce(F.col("n_hits"), F.lit(0)).alias("n_hits"),
            (
                F.coalesce(F.col("n_hits"), F.lit(0)) * F.lit(1.0)
                / F.col("n_truth")
            ).alias("recall_at_5"),
            "n_candidates",
        )
        .orderBy("nprobe")
    )


# ===========================================================================
# BM25 over a query TABLE (round-8 verdict ask #6)
# ===========================================================================

# Fixed query relation: production retrieval scores a query TABLE, not
# one literal. Four queries spanning the idf spectrum of this corpus —
# q1 is doc_bm25_topk's exact query (tying the two entries together),
# q2-q4 mix common terms so per-query rankings differ.
_BM25_QUERIES = (
    (1, ("dup", "hash", "vector")),
    (2, ("scan", "filter", "join", "merge")),
    (3, ("spark", "stream", "batch")),
    (4, ("slow", "fast")),
)
_BM25_TOPN = 10


def _bm25_multi_ctes() -> str:
    """The multiquery scoring chain through ``perdoc`` — shared by the
    top-k entry and the MMR reranker."""
    qt_rows = ", ".join(
        f"({qid}, '{t}')" for qid, terms in _BM25_QUERIES for t in terms
    )
    all_terms = tuple(sorted({t for _, terms in _BM25_QUERIES for t in terms}))
    return f"""base as (
      select doc_id, list_filter({_WORDS}, w -> w != '') as toks from documents
    ),
    stats as (
      select sum(len(toks)) as s, count(*) as n from base
    ),
    qt as (select * from (values {qt_rows}) as t(query_id, token)),
    tf as (
      select doc_id, dl, token, count(*) as tf from (
        select doc_id, len(toks) as dl, unnest(toks) as token from base
      ) where token in {all_terms}
      group by doc_id, dl, token
    ),
    terms as (
      select doc_id, dl, token, tf,
             count(*) over (partition by token) as df
      from tf
    ),
    scored as (
      select qt.query_id, doc_id, dl, t.token,
             ((2 * (n - df) + 1) * 22 * tf * s)
               / ((2 * df + 1) * (10 * s * tf + 3 * s + 9 * dl * n)) as term_score
      from terms t join qt on t.token = qt.token cross join stats
    ),
    perdoc as (
      select query_id, doc_id,
             count(*) as n_terms,
             cast(max(dl) as bigint) as n_tokens,
             list_reduce(list(term_score order by token), (a, b) -> a + b) as bm25
      from scored
      group by query_id, doc_id
    )"""


def _bm25_multi_sql() -> str:
    return f"""
    with {_bm25_multi_ctes()}
    select query_id, doc_id, n_terms, n_tokens, bm25, rank from (
      select *, row_number() over (partition by query_id
                                   order by bm25 desc, doc_id asc) as rank
      from perdoc
    ) where rank <= {_BM25_TOPN}
    order by query_id, rank
    """


@query("doc_bm25_multiquery", _bm25_multi_sql())
def doc_bm25_multiquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-{topn} retrieval for a query TABLE — the production
    shape of ``doc_bm25_topk`` (round-8 verdict ask #6): a retrieval
    service scores a batch of queries per corpus pass, not one pinned
    literal. Per (query, doc): the same integer-exact
    cleared-denominator scoring (log-free rational idf, one double
    division per term — ``_bm25_term_score`` with its enforced 2^53
    bound), folded in token order; per query: a top-{topn} ranking
    window.

    Shape — the corpus-side cost is INDEPENDENT of the query count
    until the final per-(query, doc) fan-out: the corpus collapses at
    the scan to tf rows for the UNION of all query terms (one IN filter
    pushed into the token explode); df rides the token-partition
    window ONCE, shared by every query that uses the term; the query
    table broadcasts onto the tf stream (at production |Q| the
    broadcast widens, never the corpus side); per-(query, doc) fold
    rows are |matched docs|·|query terms| at most. The per-query
    ranking window replaces the single entry's global sort — at scale
    that is the difference between one global top-k and |Q|
    partition-local top-ks in ONE window pass."""
    from idh_etl_demo_spark.operators.text import tokens

    qt = spark.createDataFrame(
        [(qid, t) for qid, terms in _BM25_QUERIES for t in terms],
        "query_id long, token string",
    )
    all_terms = sorted({t for _, terms in _BM25_QUERIES for t in terms})
    docs = _t(spark, sf_dir, "documents")
    base = docs.repartition(spark.sparkContext.defaultParallelism).select(
        "doc_id", tokens(F.col("text")).alias("toks")
    )
    stats = base.agg(
        F.sum(F.size("toks")).cast("long").alias("s"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )
    tf = (
        base.select(
            "doc_id",
            F.size("toks").cast("long").alias("dl"),
            F.explode("toks").alias("token"),
        )
        .filter(F.col("token").isin(*all_terms))
        .groupBy("doc_id", "dl", "token")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    )
    terms = tf.withColumn(
        "df", F.count(F.lit(1)).over(Window.partitionBy("token")).cast("long")
    )
    scored = (
        terms.join(F.broadcast(qt), "token")
        .crossJoin(F.broadcast(stats))
        .select(
            "query_id", "doc_id", "dl", "token",
            _bm25_term_score().alias("term_score"),
        )
    )
    parts = F.array_sort(F.collect_list(F.struct("token", "term_score")))
    w = Window.partitionBy("query_id").orderBy(F.desc("bm25"), F.asc("doc_id"))
    return (
        scored.groupBy("query_id", "doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_terms"),
            F.max("dl").alias("n_tokens"),
            F.aggregate(
                parts, F.lit(0.0), lambda acc, x: acc + x["term_score"]
            ).alias("bm25"),
        )
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= _BM25_TOPN)
        .select("query_id", "doc_id", "n_terms", "n_tokens", "bm25", "rank")
        .orderBy("query_id", "rank")
    )


# ===========================================================================
# ADC via separable per-subspace LUTs — the m·k serving layout
# ===========================================================================


def _adc_lut_sql() -> str:
    # Same oracle as the residual search: the LUT plan computes the
    # IDENTICAL integers (num and rr decompose exactly into per-subspace
    # terms because recon is a concatenation — no cross-subspace terms),
    # so the result frame is bit-identical by construction.
    return f"""
    with {','.join(_km_trained_ctes(_CELLS))},
    {_res_ctes()},
    {_res_scored_ctes(1)}
    {_RES_TOP5_TAIL}
    """


@query("embedding_ivfpq_adc_lut", _adc_lut_sql())
def embedding_ivfpq_adc_lut(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Residual IVFPQ served through SEPARABLE per-subspace lookup
    tables — the layout that survives production code sizes. The combo
    entries (`embedding_pq_search` / `embedding_ivfpq_residual_search`)
    precompute one score per (cell, code1, …, code_m) tuple: k^m rows.
    Fine at the oracle-pinned m=2·k=4 (16), impossible at FAISS-scale
    m=16·k=256. Real ADC (Jégou et al. 2011 §II-C) instead builds
    per-query tables of m·k partial dots and scores each candidate
    with m lookups + adds. This entry implements exactly that: both
    ADC terms decompose per sub-space because recon = c_cell + [rc1 ‖
    rc2] is a CONCATENATION —
      num = ⟨q, c_cell⟩ + Σⱼ ⟨qⱼ, rc_codeⱼ⟩
      rr  = ⟨c_cell, c_cell⟩ + Σⱼ (2⟨c_cellⱼ, rc_codeⱼ⟩ + ⟨rc_codeⱼ, rc_codeⱼ⟩)
    with zero cross-subspace terms; every term is an exact int64, the
    adds are exact, so the final double division is BIT-IDENTICAL to
    the combo plan (the property test asserts frame equality, and the
    oracle is the residual search's SQL verbatim).

    Shape at 100 TB — the point of this entry: the broadcast state is
    |Q|·(m·k + 1) longs (query LUTs as map<code, partial>) plus
    |cells|·(m·k + 1) (cell cross/self terms), LINEAR in m and k; each
    candidate costs 2m map lookups and one division in a pure
    projection. The corpus side still never shuffles beyond the
    per-query top-k window."""
    enc, cell_cents, rc1, rc2 = _res_parts(spark, sf_dir)
    sub1 = lambda col: F.slice(col, _PQ_SUBS[0][1], _PQ_DIM)  # noqa: E731
    sub2 = lambda col: F.slice(col, _PQ_SUBS[1][1], _PQ_DIM)  # noqa: E731

    # per-cell LUTs: rr_cell + map(code -> 2<c_cell_j, rc> + <rc, rc>)
    c = cell_cents.select(
        F.col("cid").alias("cell"),
        F.col("cv").alias("ccv"),
        _spark_int_dot(F.col("cv"), F.col("cv")).alias("rr_cell"),
    )
    p1 = _packed(rc1).withColumnRenamed("cs", "cs1")
    p2 = _packed(rc2).withColumnRenamed("cs", "cs2")

    def cell_map(cs_name: str, sub) -> F.Column:
        return F.map_from_entries(
            F.transform(
                F.col(cs_name),
                lambda s: F.struct(
                    s["cid"].alias("key"),
                    (
                        2 * _spark_int_dot(sub(F.col("ccv")), s["cv"])
                        + _spark_int_dot(s["cv"], s["cv"])
                    ).alias("value"),
                ),
            )
        )

    clut = (
        c.crossJoin(F.broadcast(p1))
        .crossJoin(F.broadcast(p2))
        .select(
            "cell",
            "rr_cell",
            cell_map("cs1", sub1).alias("clut1"),
            cell_map("cs2", sub2).alias("clut2"),
        )
    )

    # per-query LUTs: qcnum = <q, c_cell> + map(code -> <q_j, rc>)
    def q_map(cs_name: str, sub) -> F.Column:
        return F.map_from_entries(
            F.transform(
                F.col(cs_name),
                lambda s: F.struct(
                    s["cid"].alias("key"),
                    _spark_int_dot(sub(F.col("v")), s["cv"]).alias("value"),
                ),
            )
        )

    qlut = (
        enc.filter(F.col("vec_id") % 25 == 0)
        .select("vec_id", "v", "cell")
        .join(F.broadcast(c.select("cell", "ccv")), "cell")
        .crossJoin(F.broadcast(p1))
        .crossJoin(F.broadcast(p2))
        .select(
            F.col("vec_id").alias("query_id"),
            "cell",
            _spark_int_dot(F.col("v"), F.col("v")).alias("qq"),
            _spark_int_dot(F.col("v"), F.col("ccv")).alias("qcnum"),
            q_map("cs1", sub1).alias("qlut1"),
            q_map("cs2", sub2).alias("qlut2"),
        )
    )

    num = (
        F.col("qcnum")
        + F.element_at("qlut1", F.col("code1"))
        + F.element_at("qlut2", F.col("code2"))
    )
    rr = (
        F.col("rr_cell")
        + F.element_at("clut1", F.col("code1"))
        + F.element_at("clut2", F.col("code2"))
    )
    scored = (
        enc.select("vec_id", "cell", "code1", "code2")
        .join(F.broadcast(clut), "cell")
        .join(F.broadcast(qlut), "cell")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            "cell",
            (
                num.cast("double")
                / (
                    F.sqrt(F.col("qq").cast("double"))
                    * F.sqrt(rr.cast("double"))
                )
            ).alias("adc_cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("adc_cosine"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= 5)
        .select("query_id", "neighbor_id", "cell", "adc_cosine", "rank")
        .orderBy("query_id", "rank")
    )


# ===========================================================================
# Two-stage serving: ADC shortlist → exact re-rank (FAISS "refine")
# ===========================================================================

_RERANK_SHORTLIST = 20


@query(
    "embedding_ivfpq_rerank",
    f"""
    with {','.join(_km_trained_ctes(_CELLS))},
    {_res_ctes()},
    {_res_scored_ctes(1)},
    shortlist as (
      select query_id, neighbor_id, cell from (
        select query_id, neighbor_id, cell,
               row_number() over (partition by query_id
                                  order by adc_cosine desc, neighbor_id asc) as rn
        from rscored
      ) where rn <= {_RERANK_SHORTLIST}
    ),
    exact as (
      select s.query_id, s.neighbor_id, s.cell,
             list_dot_product(qv.v, nv.v)
               / (sqrt(list_dot_product(qv.v, qv.v))
                  * sqrt(list_dot_product(nv.v, nv.v))) as exact_cosine
      from shortlist s
      join vv qv on qv.vec_id = s.query_id
      join vv nv on nv.vec_id = s.neighbor_id
    )
    select query_id, neighbor_id, cell, exact_cosine, rank from (
      select query_id, neighbor_id, cell, exact_cosine,
             row_number() over (partition by query_id
                                order by exact_cosine desc, neighbor_id asc) as rank
      from exact
    ) where rank <= 5
    order by query_id, rank
    """,
)
def embedding_ivfpq_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage IVFPQ serving — ADC shortlist then EXACT re-rank
    (FAISS's refine stage, the standard production answer to coarse
    codes): stage 1 takes each query's top-{R} candidates by residual
    ADC cosine (compressed-domain, cheap); stage 2 fetches ONLY those
    R full-precision vectors and re-ranks them by exact fixed-point
    cosine (``embedding_cosine_topk``'s formula verbatim). Code
    collisions that tie hundreds of candidates in the compressed
    domain are broken by real similarities — at the cost of R exact
    dots per query instead of |corpus|.

    Shape at 100 TB — the whole point of the two-stage layout: the
    corpus-sized stage stays compressed (codes + the top-R window);
    the exact stage touches R·|Q| rows via an equi-join on vec_id
    (at production R·|Q| ≪ corpus, the shortlist side broadcasts and
    full vectors stream map-side). Raw vectors are read but never
    shuffled on a corpus key."""
    scored = _res_scored_frames(spark, sf_dir, nprobe=1)
    w_adc = Window.partitionBy("query_id").orderBy(
        F.desc("adc_cosine"), F.asc("neighbor_id")
    )
    shortlist = (
        scored.withColumn("rn", F.row_number().over(w_adc))
        .filter(F.col("rn") <= _RERANK_SHORTLIST)
        .select("query_id", "neighbor_id", "cell")
    )
    vv = _vv(spark, sf_dir)
    qv = vv.select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("q"),
        _spark_int_dot(F.col("v"), F.col("v")).alias("qq"),
    )
    nv = vv.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("v").alias("nvec"),
        _spark_int_dot(F.col("v"), F.col("v")).alias("nn"),
    )
    # shortlist is |Q|·R rows — broadcast it onto both vector streams
    exact = (
        nv.join(F.broadcast(shortlist), "neighbor_id")
        .join(F.broadcast(qv.join(F.broadcast(shortlist.select("query_id").distinct()), "query_id")), "query_id")
        .select(
            "query_id",
            "neighbor_id",
            "cell",
            (
                _spark_int_dot(F.col("q"), F.col("nvec")).cast("double")
                / (
                    F.sqrt(F.col("qq").cast("double"))
                    * F.sqrt(F.col("nn").cast("double"))
                )
            ).alias("exact_cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("exact_cosine"), F.asc("neighbor_id")
    )
    return (
        exact.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= 5)
        .select("query_id", "neighbor_id", "cell", "exact_cosine", "rank")
        .orderBy("query_id", "rank")
    )


# ===========================================================================
# Exact-substring duplication spans (Lee et al. 2021)
# ===========================================================================

# Minimum duplicated run, in tokens. Lee et al. use 50-token substrings
# at corpus scale; 8 is the oracle-determinism pin that keeps the test
# corpus non-vacuous (47/500 sf0.01 docs carry duplicated 8-gram runs,
# most carry none).
_SPAN_L = 8


@query(
    "doc_duplicated_spans",
    f"""
    with base as (
      select doc_id, list_filter({_WORDS}, w -> w != '') as toks from documents
    ),
    tot as (select doc_id, len(toks) as n_tokens from base),
    grams as (
      select doc_id, i as start, i + {_SPAN_L} - 1 as fin,
             md5(array_to_string(list_slice(toks, i, i + {_SPAN_L} - 1), ' ')) as gh
      from base cross join lateral (
        select unnest(generate_series(1, greatest(len(toks) - {_SPAN_L} + 1, 0))) as i
      )
    ),
    occ as (
      select doc_id, start, fin from (
        select doc_id, start, fin, count(*) over (partition by gh) as c
        from grams
      ) where c >= 2
    ),
    isl as (
      select doc_id, start, fin,
             sum(case when prev_fin is null or start > prev_fin + 1
                 then 1 else 0 end)
               over (partition by doc_id order by start
                     rows unbounded preceding) as island
      from (
        select doc_id, start, fin,
               max(fin) over (partition by doc_id order by start
                              rows between unbounded preceding
                              and 1 preceding) as prev_fin
        from occ
      )
    ),
    spans as (
      select doc_id, island, min(start) as s, max(fin) as e
      from isl group by doc_id, island
    ),
    perdoc as (
      select doc_id, count(*) as n_spans, sum(e - s + 1) as dup_tokens
      from spans group by doc_id
    )
    select t.doc_id,
           cast(t.n_tokens as bigint) as n_tokens,
           cast(coalesce(p.n_spans, 0) as bigint) as n_spans,
           cast(coalesce(p.dup_tokens, 0) as bigint) as dup_tokens,
           cast(case when t.n_tokens > 0
                then coalesce(p.dup_tokens, 0) * 1000000 // t.n_tokens
                else 0 end as bigint) as dup_micro
    from tot t left join perdoc p on t.doc_id = p.doc_id
    order by t.doc_id
    """,
)
def doc_duplicated_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT-SUBSTRING duplication spans (Lee et al. 2021,
    "Deduplicating Training Data Makes Language Models Better"): for
    every document, the merged token spans covered by ≥{L}-token runs
    that occur more than once ANYWHERE in the corpus (cross-doc or
    within-doc), with the per-doc duplicated-token fraction. This is
    the family's exact-substring member — MinHash/SimHash find
    near-dup DOCUMENTS, CDC passages find shared CHUNKS; this finds
    every verbatim duplicated RUN and measures how much of each doc it
    covers, which is the signal Lee et al. cut (their suffix-array
    substrings re-expressed as rolling-window hashes: every duplicated
    run of length ≥ L is exactly a maximal chain of duplicated
    L-windows, so merged window intervals ARE the duplicated spans).

    New operator shape for the catalog: GAPS-AND-ISLANDS interval
    merging — a running-max window (prev coverage end), a gap flag, a
    running-sum island id, then per-island min/max. Engine-exact: all
    integer positions and md5 hashes; both engines merge identical
    interval sets.

    Shape at 100 TB: the rolling windows ride the token arrays as a
    projection (no explode of raw text — only (doc_id, start, 16-byte
    gh) rows flow); duplication marking is ONE window over the gh
    partitioning (no agg+join round trip); island merging partitions
    by doc_id over the ≥2-occurrence SUBSET (tiny); the final join
    broadcasts the per-doc aggregate back onto the full doc list."""
    from idh_etl_demo_spark.operators.text import tokens

    docs = _t(spark, sf_dir, "documents")
    base = docs.repartition(spark.sparkContext.defaultParallelism).select(
        "doc_id", tokens(F.col("text")).alias("toks")
    )
    tot = base.select("doc_id", F.size("toks").cast("long").alias("n_tokens"))
    # Spark sequence(1, 0) DESCENDS where DuckDB's is empty — guard the
    # short-doc case explicitly (repo-standing engine gotcha)
    starts = F.when(
        F.size("toks") >= _SPAN_L,
        F.sequence(F.lit(1), F.size("toks") - _SPAN_L + 1),
    ).otherwise(F.array().cast("array<int>"))
    gh_arr = F.transform(
        starts,
        lambda i: F.md5(F.concat_ws(" ", F.slice(F.col("toks"), i, _SPAN_L))),
    )
    grams = base.select(
        "doc_id", F.posexplode(gh_arr).alias("pos0", "gh")
    ).select(
        "doc_id",
        (F.col("pos0") + 1).alias("start"),
        (F.col("pos0") + _SPAN_L).alias("fin"),
        "gh",
    )
    occ = (
        grams.withColumn(
            "c", F.count(F.lit(1)).over(Window.partitionBy("gh"))
        )
        .filter(F.col("c") >= 2)
        .select("doc_id", "start", "fin")
    )
    w_prev = (
        Window.partitionBy("doc_id")
        .orderBy("start")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_run = (
        Window.partitionBy("doc_id")
        .orderBy("start")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    isl = occ.withColumn("prev_fin", F.max("fin").over(w_prev)).withColumn(
        "island",
        F.sum(
            F.when(
                F.col("prev_fin").isNull()
                | (F.col("start") > F.col("prev_fin") + 1),
                1,
            ).otherwise(0)
        ).over(w_run),
    )
    spans = isl.groupBy("doc_id", "island").agg(
        F.min("start").alias("s"), F.max("fin").alias("e")
    )
    perdoc = spans.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_spans"),
        F.sum(F.col("e") - F.col("s") + 1).alias("dup_tokens"),
    )
    micro = F.when(
        F.col("n_tokens") > 0,
        F.expr("(dup_tokens * 1000000) div n_tokens"),
    ).otherwise(F.lit(0)).cast("long")
    return (
        tot.join(F.broadcast(perdoc), "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            F.coalesce("n_spans", F.lit(0)).cast("long").alias("n_spans"),
            F.coalesce("dup_tokens", F.lit(0)).cast("long").alias("dup_tokens"),
        )
        .select("doc_id", "n_tokens", "n_spans", "dup_tokens", micro.alias("dup_micro"))
        .orderBy("doc_id")
    )


# ===========================================================================
# Leakage-safe corpus splitting — dedup-aware train/valid/test assignment
# ===========================================================================
#
# Splitting a corpus per-document leaks: near-duplicate pairs straddle
# the train/test boundary, so held-out loss is measured on documents the
# model effectively saw (the contamination mechanism Lee et al. 2021
# §6.2 and the GPT-3 appendix both document). The fix is to assign
# SPLITS TO NEAR-DUP CLUSTERS, not documents: hash the cluster id, and
# every member inherits the cluster's split — a near-dup pair can never
# straddle because both endpoints share a cluster by construction.
#
# The split hash is the repo's established engine-exact splitter
# (doc_hash_sample): md5 of the id's decimal string, first 60 bits,
# thresholded at floor(0.8·2^60) / floor(0.9·2^60) for an 80/10/10
# train/valid/test split — a pure function of the key, stable across
# runs, engines, partitionings and cluster sizes.

_SPLIT_T80 = ((1 << 60) * 4) // 5
_SPLIT_T90 = ((1 << 60) * 9) // 10


def _split_label(key: F.Column) -> F.Column:
    """'train'/'valid'/'test' from the md5-60-bit prefix of the key's
    decimal string — the Spark twin of the oracle's case expression."""
    hv = F.conv(F.substring(F.md5(key.cast("string")), 1, 15), 16, 10).cast(
        "long"
    )
    return (
        F.when(hv < F.lit(_SPLIT_T80), F.lit("train"))
        .when(hv < F.lit(_SPLIT_T90), F.lit("valid"))
        .otherwise(F.lit("test"))
    )


def _cluster_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, cluster_id) for EVERY document: near-dup components
    (the doc_dup_clusters pipeline verbatim — LSH candidates closed
    under transitivity by min-label propagation) left-joined onto the
    corpus, singletons falling back to their own id."""
    from idh_etl_demo_spark.operators.dedup import minhash_lsh_candidates
    from idh_etl_demo_spark.operators.graph import connected_components

    docs = _t(spark, sf_dir, "documents")
    cand = minhash_lsh_candidates(
        docs,
        num_hashes=12,
        bands=4,
        num_partitions=spark.sparkContext.defaultParallelism,
        max_bucket=64,
    )
    cc = connected_components(cand, "id_a", "id_b")
    return docs.select("doc_id").join(
        cc.select(F.col("id").alias("doc_id"), "component"), "doc_id", "left"
    ).select(
        "doc_id",
        F.coalesce("component", F.col("doc_id")).alias("cluster_id"),
    )


def _leakage_cluster_sql() -> str:
    """Recursive-closure CTE chain shared by the split and audit
    oracles: ``assigned(doc_id, cluster_id)`` over ALL documents."""
    from idh_etl_demo_spark.catalog_llm import _minhash_cte

    return f"""{_minhash_cte()},
    bi as (
      select id_a as a, id_b as b from cand
      union
      select id_b as a, id_a as b from cand
    ),
    nodes as (select distinct a as id from bi),
    reach as (
      select id, id as r from nodes
      union
      select bi.a as id, reach.r from bi join reach on reach.id = bi.b
    ),
    comp as (select id, min(r) as component from reach group by id),
    assigned as (
      select d.doc_id, coalesce(c.component, d.doc_id) as cluster_id
      from documents d left join comp c on c.id = d.doc_id
    )"""


@query(
    "doc_leakage_safe_split",
    f"""
    with recursive {_leakage_cluster_sql()},
    h as (
      select doc_id, cluster_id,
             ('0x' || substring(md5(cast(cluster_id as varchar)), 1, 15))::bigint as hv
      from assigned
    )
    select doc_id, cluster_id,
           count(*) over (partition by cluster_id) as cluster_size,
           case when hv < {_SPLIT_T80} then 'train'
                when hv < {_SPLIT_T90} then 'valid'
                else 'test' end as split
    from h
    order by doc_id
    """,
)
def doc_leakage_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup-aware train/valid/test assignment: every document carries
    its near-dup cluster's split, so near-duplicates NEVER straddle the
    held-out boundary (the train→test contamination path per-doc
    splitting leaves open — Lee et al. 2021 §6.2). Clusters come from
    the audited ``doc_dup_clusters`` pipeline (LSH candidates closed
    under transitivity); singletons hash their own id, so the entry
    degrades to exactly ``doc_hash_sample``'s per-doc split on a
    dup-free corpus. 80/10/10 via the md5-60-bit threshold splitter.

    Scale shape: the LSH/CC stages are the already-probed
    ``doc_corpus_curation`` machinery (banding equi-join, min-label
    fixpoint over checkpointed edges); the split itself adds ONE
    doc_id-keyed join of the (doc_id, cluster_id) table against the
    corpus id stream + a map-side md5 projection — document bodies
    never shuffle, and the cluster-size window shuffles id-width rows
    only."""
    assigned = _cluster_assignment(spark, sf_dir)
    w = Window.partitionBy("cluster_id")
    return (
        assigned.withColumn("cluster_size", F.count(F.lit(1)).over(w))
        .select(
            "doc_id",
            "cluster_id",
            "cluster_size",
            _split_label(F.col("cluster_id")).alias("split"),
        )
        .orderBy("doc_id")
    )


@query(
    "doc_split_leakage_audit",
    f"""
    with recursive {_leakage_cluster_sql()},
    h as (
      select doc_id,
             ('0x' || substring(md5(cast(doc_id as varchar)), 1, 15))::bigint as hd,
             ('0x' || substring(md5(cast(cluster_id as varchar)), 1, 15))::bigint as hc
      from assigned
    ),
    s as (
      select doc_id,
             case when hd < {_SPLIT_T80} then 0 when hd < {_SPLIT_T90} then 1 else 2 end as naive_s,
             case when hc < {_SPLIT_T80} then 0 when hc < {_SPLIT_T90} then 1 else 2 end as safe_s
      from h
    ),
    p as (
      select sa.naive_s as na, sb.naive_s as nb, sa.safe_s as fa, sb.safe_s as fb
      from cand
      join s sa on sa.doc_id = cand.id_a
      join s sb on sb.doc_id = cand.id_b
    )
    select cast(count(*) as bigint) as n_dup_pairs,
           cast(coalesce(sum(case when na != nb then 1 else 0 end), 0) as bigint) as naive_straddling,
           cast(coalesce(sum(case when fa != fb then 1 else 0 end), 0) as bigint) as safe_straddling,
           cast(case when count(*) > 0
                then (coalesce(sum(case when na != nb then 1 else 0 end), 0) * 1000000) // count(*)
                else 0 end as bigint) as naive_straddle_micro
    from p
    """,
)
def doc_split_leakage_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prices what cluster-level splitting prevents: for every near-dup
    CANDIDATE PAIR, does it straddle splits under the naive per-doc
    hash vs the cluster hash? ``safe_straddling`` is MEASURED (not
    assumed) and must be 0 — both endpoints of a candidate pair share a
    component by construction, so the cluster hash assigns them the
    same split; ``naive_straddling`` is the leaked-pair count a per-doc
    split would ship to evaluation (~34% of dup pairs in expectation at
    80/10/10: 1 − 0.8² − 0.1² − 0.1²). One summary row, micro-exact
    integer ratio.

    Scale shape: the pair list is |candidates|-bounded (banding
    equi-join, never all-pairs); the two split joins carry (doc_id,
    2 small ints) rows; the final agg is map-side-combined to one
    row."""
    assigned = _cluster_assignment(spark, sf_dir)
    from idh_etl_demo_spark.operators.dedup import minhash_lsh_candidates

    docs = _t(spark, sf_dir, "documents")
    cand = minhash_lsh_candidates(
        docs,
        num_hashes=12,
        bands=4,
        num_partitions=spark.sparkContext.defaultParallelism,
        max_bucket=64,
    )
    code = lambda col: (  # noqa: E731 — 0/1/2 split codes, both engines
        F.when(col < F.lit(_SPLIT_T80), 0)
        .when(col < F.lit(_SPLIT_T90), 1)
        .otherwise(2)
    )
    hv = lambda c: F.conv(  # noqa: E731
        F.substring(F.md5(c.cast("string")), 1, 15), 16, 10
    ).cast("long")
    s = assigned.select(
        "doc_id",
        code(hv(F.col("doc_id"))).alias("naive_s"),
        code(hv(F.col("cluster_id"))).alias("safe_s"),
    )
    p = (
        cand.join(
            s.select(
                F.col("doc_id").alias("id_a"),
                F.col("naive_s").alias("na"),
                F.col("safe_s").alias("fa"),
            ),
            "id_a",
        )
        .join(
            s.select(
                F.col("doc_id").alias("id_b"),
                F.col("naive_s").alias("nb"),
                F.col("safe_s").alias("fb"),
            ),
            "id_b",
        )
    )
    n = F.count(F.lit(1))
    naive = F.coalesce(
        F.sum(F.when(F.col("na") != F.col("nb"), 1).otherwise(0)), F.lit(0)
    )
    safe = F.coalesce(
        F.sum(F.when(F.col("fa") != F.col("fb"), 1).otherwise(0)), F.lit(0)
    )
    # counts are |candidates|-bounded, so naive·10^6 < 2^53 and the
    # double division is exact before the floor-truncation to long
    return p.agg(
        n.cast("long").alias("n_dup_pairs"),
        naive.cast("long").alias("naive_straddling"),
        safe.cast("long").alias("safe_straddling"),
        F.when(n > 0, F.floor((naive * 1000000) / n))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("naive_straddle_micro"),
    )


# ===========================================================================
# Prototype-based data pruning — keep the hardest examples per cluster
# ===========================================================================
#
# Sorscher et al. 2022 ("Beyond neural scaling laws") show random
# pruning is the wrong curation knob at scale: rank examples by
# distance to their k-means prototype and, on large corpora, KEEP THE
# HARD ones (far from the centroid) while dropping redundant
# near-prototype mass — and keep per-cluster so no region of the space
# is emptied. This entry ranks every vector by its exact integer
# squared distance to its trained centroid and flags the kept half,
# cluster-balanced.


@query(
    "embedding_prototype_pruning",
    f"""
    with {','.join(_km_trained_ctes(4))},
    d as (
      select vec_id, cid as cluster, cast(dist as bigint) as dist2
      from r2 where rn = 1
    ),
    r as (
      select vec_id, cluster, dist2,
             count(*) over (partition by cluster) as cluster_size,
             row_number() over (partition by cluster
                                order by dist2 desc, vec_id asc) as hardness_rank
      from d
    )
    select vec_id, cluster, dist2, cluster_size, hardness_rank,
           hardness_rank <= (cluster_size + 1) // 2 as kept
    from r
    order by vec_id
    """,
)
def embedding_prototype_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-balanced prototype pruning (Sorscher et al. 2022): every
    vector ranked per cluster by exact integer squared distance to its
    TRAINED centroid (the audited kcenter→Lloyd quantizer,
    ``catalog_r3._km_trained_frames`` — the same frozen model the IVF
    and SemDeDup families serve from), hardest first; ``kept`` flags
    the ceil(half) farthest per cluster — the keep-hard-examples regime
    the paper prescribes for large corpora, balanced so no cluster is
    emptied. Distances are integer-valued doubles (< 2^53), so the
    rank order is bit-identical across engines.

    Scale shape: assignment + distance is the packed-broadcast argmin
    projection (zero corpus shuffles — ``operators/kmeans.py``); the
    only corpus-keyed exchanges are the per-cluster ranking window over
    (vec_id, cluster, dist2) id-width rows — vectors never shuffle —
    and the presentation sort. Training shuffles ≤ k·dim rows and is
    frozen once per session."""
    from idh_etl_demo_spark.catalog_llm import _spark_quant
    from idh_etl_demo_spark.operators.kmeans import _dist_structs

    _, cents = _km_trained_frames(spark, sf_dir)
    emb = _t(spark, sf_dir, "embeddings")
    vv = emb.repartition(spark.sparkContext.defaultParallelism).select(
        "vec_id", _spark_quant(F.col("embedding")).alias("v")
    )
    best = F.array_min(_dist_structs(CENTROID_GRID))
    d = vv.join(F.broadcast(_packed(cents))).select(
        "vec_id",
        best["cid"].alias("cluster"),
        best["dist"].cast("long").alias("dist2"),
    )
    w = Window.partitionBy("cluster")
    wr = Window.partitionBy("cluster").orderBy(F.desc("dist2"), F.asc("vec_id"))
    return (
        d.withColumn("cluster_size", F.count(F.lit(1)).over(w))
        .withColumn("hardness_rank", F.row_number().over(wr).cast("long"))
        .withColumn(
            "kept",
            F.col("hardness_rank") <= F.expr("(cluster_size + 1) div 2"),
        )
        .orderBy("vec_id")
    )


# ===========================================================================
# UniMax language-budget allocation — epoch-capped waterfilling
# ===========================================================================
#
# Temperature sampling (doc_lang_mix_weights, alpha=0.5) rebalances a
# multilingual mix but still lets head languages dominate and can
# over-epoch tiny tails. UniMax (Chung et al. 2023) instead
# waterfills: give every language an equal share of the token budget,
# capped at E epochs of its own corpus — tail languages saturate at
# E·n and the freed budget redistributes to the rest. The closed form
# is sort-by-cap + prefix sums (no iteration): in ascending-cap order,
# language i saturates iff cap_i·(L−i+1) ≤ B − prefix_i (the
# equal-share test, kept as an INTEGER comparison so no floor-division
# edge case); the unsaturated remainder splits B−P evenly with the
# first r=(B−P) mod U languages (cap asc, lang asc) taking the +1.
# sum(allocation) == B exactly, by construction.

_UNIMAX_EPOCHS = 2  # per-language epoch cap E
# budget: 90% of the total epoch-capped supply — corpus-derived so the
# entry scales with sf, and always strictly below sum(cap), so the
# unsaturated set is never empty


@query(
    "doc_unimax_allocation",
    f"""
    with c as (
      select lang, cast(count(*) as bigint) as n_docs
      from documents group by lang
    ),
    s as (
      select lang, n_docs, {_UNIMAX_EPOCHS} * n_docs as cap,
             row_number() over (order by {_UNIMAX_EPOCHS} * n_docs asc, lang asc) as i,
             count(*) over () as nl,
             coalesce(sum({_UNIMAX_EPOCHS} * n_docs) over (
               order by {_UNIMAX_EPOCHS} * n_docs asc, lang asc
               rows between unbounded preceding and 1 preceding), 0) as pfx,
             sum({_UNIMAX_EPOCHS} * n_docs) over () as sumcap
      from c
    ),
    f as (
      select *, (9 * sumcap) // 10 as budget,
             cap * (nl - i + 1) <= (9 * sumcap) // 10 - pfx as saturated
      from s
    ),
    g as (
      select *, sum(case when saturated then cap else 0 end) over () as p,
             sum(case when saturated then 1 else 0 end) over () as n_sat
      from f
    ),
    a as (
      select lang, n_docs, cap, saturated,
             case when saturated then cap
                  else (budget - p) // (nl - n_sat)
                       + case when i - n_sat <= (budget - p) % (nl - n_sat)
                              then 1 else 0 end
             end as allocation
      from g
    )
    select lang, n_docs, cap, saturated,
           cast(allocation as bigint) as allocation,
           cast((allocation * 1000000) // n_docs as bigint) as epochs_micro
    from a
    order by lang
    """,
)
def doc_unimax_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UniMax sampling allocation (Chung et al. 2023): split a corpus
    budget B = 90% of the epoch-capped supply across languages as
    evenly as possible, capping each language at E=2 epochs of its own
    documents. Closed-form waterfill — sort by cap, prefix sums, the
    integer equal-share saturation test, deterministic remainder
    distribution (first r unsaturated languages by cap asc, lang asc
    take the +1) — so sum(allocation) == B exactly and every number is
    integer-exact across engines. Complements ``doc_lang_mix_weights``
    (temperature rebalance): UniMax is the bounded-repetition regime.

    Scale shape: ONE map-side-combined count pass over the corpus;
    everything after operates on the |languages|-row table (the
    unpartitioned analytic windows move ≤ |languages| rows to a single
    task — the textbook small-frame closed form, same shape as the
    lang-mix entry)."""
    docs = _t(spark, sf_dir, "documents")
    c = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n_docs"))
    wall = Window.partitionBy()
    wsort = Window.orderBy(F.asc("cap"), F.asc("lang"))
    g = (
        c.withColumn("cap", F.col("n_docs") * _UNIMAX_EPOCHS)
        .withColumn("i", F.row_number().over(wsort).cast("long"))
        .withColumn("nl", F.count(F.lit(1)).over(wall))
        .withColumn(
            "pfx",
            F.coalesce(
                F.sum("cap").over(
                    wsort.rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            ),
        )
        .withColumn("sumcap", F.sum("cap").over(wall))
        .withColumn("budget", F.expr("(9 * sumcap) div 10"))
        .withColumn(
            "saturated",
            F.col("cap") * (F.col("nl") - F.col("i") + 1)
            <= F.col("budget") - F.col("pfx"),
        )
        .withColumn(
            "p",
            F.sum(F.when(F.col("saturated"), F.col("cap")).otherwise(0)).over(
                wall
            ),
        )
        .withColumn(
            "n_sat",
            F.sum(F.when(F.col("saturated"), 1).otherwise(0)).over(wall),
        )
        .withColumn(
            "allocation",
            F.when(F.col("saturated"), F.col("cap")).otherwise(
                F.expr("(budget - p) div (nl - n_sat)")
                + F.when(
                    F.col("i") - F.col("n_sat")
                    <= F.expr("(budget - p) % (nl - n_sat)"),
                    1,
                ).otherwise(0)
            ),
        )
    )
    return g.select(
        "lang",
        "n_docs",
        F.col("cap").cast("long").alias("cap"),
        "saturated",
        F.col("allocation").cast("long").alias("allocation"),
        F.expr("(allocation * 1000000) div n_docs").cast("long").alias(
            "epochs_micro"
        ),
    ).orderBy("lang")


# ===========================================================================
# NN-descent — graph-based ANN (the third paradigm after IVF and LSH/PQ)
# ===========================================================================
#
# Dong, Moses, Li 2011 ("Efficient k-nearest neighbor graph construction
# for generic similarity measures"): start from a RANDOM K-NN graph and
# iterate a LOCAL JOIN — every pair of nodes sharing a neighbor (in
# either direction) is compared, and each node keeps its best K — so
# the graph climbs toward the true K-NN graph with O(N·K²) comparisons
# per round, never the brute-force N². This is the paradigm behind
# HNSW/NSG serving layouts; one round is expressed here exactly
# (deterministic md5 "random" init, exact integer-quantized cosine),
# with the recall audit pricing what the round buys.
#
# Init partners are md5-draws over [0, max_id+1): deterministic, uniform,
# engine-identical. Draws colliding with the node itself shift by one;
# duplicate draws collapse (a node may start with < K partners — the
# paper's random init has the same property).

_NND_K = 4


def _nnd_cos(va: str, vb: str) -> str:
    return (
        f"list_dot_product({va}, {vb}) / (sqrt(list_dot_product({va}, {va}))"
        f" * sqrt(list_dot_product({vb}, {vb})))"
    )


def _nnd_ctes(k: int = _NND_K) -> str:
    from idh_etl_demo_spark.catalog_llm import _QUANT

    return f"""vq as (select vec_id, {_QUANT} as v from embeddings),
    nn as (select max(vec_id) + 1 as n from embeddings),
    seeds as (
      select vec_id as ia,
             ('0x' || substring(md5(vec_id::varchar || '-' || s::varchar), 1, 15))::bigint % n as raw,
             n
      from vq cross join nn cross join generate_series(1, {k}) g(s)
    ),
    e0 as (
      select distinct ia, case when raw = ia then (ia + 1) % n else raw end as ib
      from seeds
    ),
    p0 as (
      select a.vec_id as ida, b.vec_id as idb, {_nnd_cos('a.v', 'b.v')} as cos
      from e0 join vq a on a.vec_id = e0.ia join vq b on b.vec_id = e0.ib
    ),
    g0 as (
      select * from (
        select *, row_number() over (partition by ida
                                     order by cos desc, idb asc) as rank
        from p0
      ) where rank <= {k}
    ),
    u as (
      select ida as v, idb as x from g0
      union
      select idb as v, ida as x from g0
    ),
    cand as (
      select least(a.x, b.x) as pa, greatest(a.x, b.x) as pb
      from u a join u b on a.v = b.v and a.x < b.x
      union
      select least(ida, idb), greatest(ida, idb) from g0
    ),
    sc as (
      select pa, pb, {_nnd_cos('va.v', 'vb.v')} as cos
      from cand join vq va on va.vec_id = pa join vq vb on vb.vec_id = pb
    ),
    bi as (
      select pa as ida, pb as idb, cos from sc
      union all
      select pb as ida, pa as idb, cos from sc
    ),
    g1 as (
      select * from (
        select *, row_number() over (partition by ida
                                     order by cos desc, idb asc) as rank
        from bi
      ) where rank <= {k}
    )"""


def _nnd_frames(
    spark: SparkSession, sf_dir: str, k: int = _NND_K
) -> tuple[DataFrame, DataFrame, DataFrame, DataFrame]:
    """Lazy Spark twin of ``_nnd_ctes``: (e0, g0, cand, g1)."""
    from idh_etl_demo_spark.catalog_llm import _spark_quant

    emb = _t(spark, sf_dir, "embeddings")
    vq = emb.repartition(spark.sparkContext.defaultParallelism).select(
        "vec_id", _spark_quant(F.col("embedding")).alias("v")
    )
    n1 = vq.agg((F.max("vec_id") + 1).alias("n"))
    seeds = (
        vq.select("vec_id")
        .join(F.broadcast(n1))
        .select(
            F.col("vec_id").alias("ia"),
            "n",
            F.explode(F.sequence(F.lit(1), F.lit(k))).alias("s"),
        )
        .withColumn(
            "raw",
            F.conv(
                F.substring(
                    F.md5(
                        F.concat_ws(
                            "-",
                            F.col("ia").cast("string"),
                            F.col("s").cast("string"),
                        )
                    ),
                    1,
                    15,
                ),
                16,
                10,
            ).cast("long")
            % F.col("n"),
        )
    )
    e0 = seeds.select(
        "ia",
        F.when(F.col("raw") == F.col("ia"), (F.col("ia") + 1) % F.col("n"))
        .otherwise(F.col("raw"))
        .alias("ib"),
    ).distinct()

    def cos(va: F.Column, vb: F.Column) -> F.Column:
        return _spark_int_dot(va, vb) / (
            F.sqrt(_spark_int_dot(va, va)) * F.sqrt(_spark_int_dot(vb, vb))
        )

    va = vq.select(F.col("vec_id").alias("ia"), F.col("v").alias("av"))
    vb = vq.select(F.col("vec_id").alias("ib"), F.col("v").alias("bv"))
    p0 = (
        e0.join(va, "ia")
        .join(vb, "ib")
        .select(
            F.col("ia").alias("ida"),
            F.col("ib").alias("idb"),
            cos(F.col("av"), F.col("bv")).alias("cos"),
        )
    )
    wk = Window.partitionBy("ida").orderBy(F.desc("cos"), F.asc("idb"))
    g0 = (
        p0.withColumn("rank", F.row_number().over(wk).cast("long"))
        .filter(F.col("rank") <= k)
    )
    u = (
        g0.select(F.col("ida").alias("v"), F.col("idb").alias("x"))
        .union(g0.select(F.col("idb").alias("v"), F.col("ida").alias("x")))
        .distinct()
    )
    ua = u.select(F.col("v").alias("jv"), F.col("x").alias("xa"))
    ub = u.select(F.col("v").alias("jv"), F.col("x").alias("xb"))
    cand = (
        ua.join(ub, "jv")
        .filter(F.col("xa") < F.col("xb"))
        .select(F.col("xa").alias("pa"), F.col("xb").alias("pb"))
        .union(
            g0.select(
                F.least("ida", "idb").alias("pa"),
                F.greatest("ida", "idb").alias("pb"),
            )
        )
        .distinct()
    )
    sa = vq.select(F.col("vec_id").alias("pa"), F.col("v").alias("av"))
    sb = vq.select(F.col("vec_id").alias("pb"), F.col("v").alias("bv"))
    sc = (
        cand.join(sa, "pa")
        .join(sb, "pb")
        .select("pa", "pb", cos(F.col("av"), F.col("bv")).alias("cos"))
    )
    bi = sc.select(
        F.col("pa").alias("ida"), F.col("pb").alias("idb"), "cos"
    ).unionAll(
        sc.select(F.col("pb").alias("ida"), F.col("pa").alias("idb"), "cos")
    )
    g1 = (
        bi.withColumn("rank", F.row_number().over(wk).cast("long"))
        .filter(F.col("rank") <= k)
    )
    return e0, g0, cand, g1


@query(
    "embedding_nndescent_round",
    f"""
    with {_nnd_ctes()}
    select ida as vec_id, idb as neighbor_id, cos as cosine_sim, rank
    from g1
    order by vec_id, rank
    """,
)
def embedding_nndescent_round(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One NN-descent round (Dong et al. 2011) over the full corpus:
    deterministic-random K=4 init graph, the LOCAL JOIN (every pair
    sharing a neighbor in either direction is compared exactly), and
    each node keeps its best K by integer-quantized cosine. Every node
    gets a refreshed neighbor list — the building block HNSW-class
    graph indexes iterate to convergence.

    Scale shape: the local join is the paper's O(N·K²) bound — the
    candidate stream is |U|·deg ≈ N·(2K)² id-pairs, NEVER the N²
    brute-force; every exchange is id-keyed (the corpus vector stream
    joins the candidate list by id, ids-only rows shuffle elsewhere);
    per-node top-K is one window. No collect, no cartesian."""
    _, _, _, g1 = _nnd_frames(spark, sf_dir)
    return g1.select(
        F.col("ida").alias("vec_id"),
        F.col("idb").alias("neighbor_id"),
        F.col("cos").alias("cosine_sim"),
        "rank",
    ).orderBy("vec_id", "rank")


@query(
    "embedding_nndescent_recall_audit",
    f"""
    with {_nnd_ctes()},
    truth as (
      select * from (
        select q.vec_id as q, c.vec_id as nid,
               row_number() over (partition by q.vec_id
                                  order by {_nnd_cos('q.v', 'c.v')} desc,
                                           c.vec_id asc) as rank
        from vq q join vq c on c.vec_id != q.vec_id
        where q.vec_id % 25 = 0
      ) where rank <= {_NND_K}
    ),
    gall as (
      select 'init' as phase, ida, idb from g0
      union all
      select 'round1' as phase, ida, idb from g1
    ),
    ph as (
      select phase, count(*) as scored_pairs from (
        select 'init' as phase from e0
        union all
        select 'round1' as phase from cand
      ) group by phase
    ),
    ht as (
      select phase, count(*) as hits
      from gall join truth on gall.ida = truth.q and gall.idb = truth.nid
      group by phase
    ),
    ps as (select count(*) as possible from truth)
    select ph.phase, scored_pairs, coalesce(hits, 0) as hits, possible,
           (coalesce(hits, 0) * 1000000) // possible as recall_micro
    from ph left join ht using (phase) cross join ps
    order by phase
    """,
)
def embedding_nndescent_recall_audit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Prices what one NN-descent round buys: recall@4 against the
    brute-force truth on the audited query subset (vec_id % 25),
    before (random init) and after the local join, with the exact-score
    count each phase paid. On the sf embeddings the round lifts hits
    substantially even without cluster structure (best-of-~(2K)²
    sampled candidates beats K random draws); on clustered data the
    lift is larger (property-pinned). The truth side is brute-force by
    audit design, on the SAMPLED queries only.

    Scale shape: the two graph phases are ``embedding_nndescent_round``'s
    plan; the truth side is |Q|·N via the broadcast query set; all
    audit arithmetic is on one-row aggregates (broadcast cross joins,
    never a data cartesian)."""
    e0, g0, cand, g1 = _nnd_frames(spark, sf_dir)
    from idh_etl_demo_spark.catalog_llm import _spark_quant

    emb = _t(spark, sf_dir, "embeddings")
    vq = emb.repartition(spark.sparkContext.defaultParallelism).select(
        "vec_id", _spark_quant(F.col("embedding")).alias("v")
    )
    q = vq.filter(F.col("vec_id") % 25 == 0).select(
        F.col("vec_id").alias("q"), F.col("v").alias("qv")
    )

    def cos(va: F.Column, vb: F.Column) -> F.Column:
        return _spark_int_dot(va, vb) / (
            F.sqrt(_spark_int_dot(va, va)) * F.sqrt(_spark_int_dot(vb, vb))
        )

    wq = Window.partitionBy("q").orderBy(F.desc("cos"), F.asc("nid"))
    truth = (
        vq.select(F.col("vec_id").alias("nid"), F.col("v").alias("cv"))
        .join(F.broadcast(q))
        .filter(F.col("nid") != F.col("q"))
        .select("q", "nid", cos(F.col("qv"), F.col("cv")).alias("cos"))
        .withColumn("rank", F.row_number().over(wq))
        .filter(F.col("rank") <= _NND_K)
        .select("q", "nid")
    )

    gall = g0.select(
        F.lit("init").alias("phase"), "ida", "idb"
    ).unionAll(g1.select(F.lit("round1").alias("phase"), "ida", "idb"))
    hits = (
        gall.join(
            truth,
            (gall["ida"] == truth["q"]) & (gall["idb"] == truth["nid"]),
        )
        .groupBy("phase")
        .agg(F.count(F.lit(1)).cast("long").alias("hits"))
    )
    scored = (
        e0.select(F.lit("init").alias("phase"))
        .unionAll(cand.select(F.lit("round1").alias("phase")))
        .groupBy("phase")
        .agg(F.count(F.lit(1)).cast("long").alias("scored_pairs"))
    )
    poss = truth.agg(F.count(F.lit(1)).cast("long").alias("possible"))
    return (
        scored.join(F.broadcast(hits), "phase", "left")
        .join(F.broadcast(poss))
        .select(
            "phase",
            "scored_pairs",
            F.coalesce("hits", F.lit(0)).cast("long").alias("hits"),
            "possible",
            F.floor(
                (F.coalesce("hits", F.lit(0)) * 1000000) / F.col("possible")
            )
            .cast("long")
            .alias("recall_micro"),
        )
        .orderBy("phase")
    )


# ===========================================================================
# D4 curation — SemDeDup then prototype pruning, composed end-to-end
# ===========================================================================
#
# Tirumala et al. 2023 ("D4: Improving LLM Pretraining via Document
# De-Duplication and Diversification"): semantic dedup alone leaves the
# surviving mass clumped around cluster prototypes; pruning alone
# wastes budget ranking duplicates. D4 runs BOTH — drop near-duplicates
# within embedding clusters (SemDeDup, Abbas et al. 2023), then drop
# the most PROTOTYPICAL quarter of the survivors per cluster (the
# SSL-prototype rule of Sorscher et al. 2022) — and the paper measures
# the composition beating either half. This entry composes the repo's
# two audited halves over the SAME frozen quantizer.


def _d4_sql() -> str:
    from idh_etl_demo_spark.catalog_r7 import (
        _SEMDEDUP_THRESHOLD,
        _TRAINED_CELLS,
    )

    return f"""
    with {','.join(_km_trained_ctes(_TRAINED_CELLS))},
    pairs as (
      select a.vec_id as u, b.vec_id as v
      from a2 a join a2 b using (cluster)
      where a.vec_id < b.vec_id
        and list_dot_product(a.v, b.v)
              / (sqrt(list_dot_product(a.v, a.v))
                 * sqrt(list_dot_product(b.v, b.v))) >= {_SEMDEDUP_THRESHOLD}
    ),
    dups as (select v as vec_id, min(u) as dup_of from pairs group by v),
    dd as (
      select r2.vec_id, r2.cid as cluster, cast(r2.dist as bigint) as dist2,
             d.dup_of
      from r2 left join dups d on d.vec_id = r2.vec_id
      where r2.rn = 1
    ),
    surv as (
      select vec_id,
             row_number() over (partition by cluster
                                order by dist2 asc, vec_id asc) as proto_rank,
             count(*) over (partition by cluster) as surv_size
      from dd where dup_of is null
    )
    select dd.vec_id, dd.cluster, dd.dup_of is null as semdedup_keep,
           dd.dist2, s.proto_rank,
           coalesce(s.proto_rank > s.surv_size // 4, false) as d4_kept
    from dd left join surv s on s.vec_id = dd.vec_id
    order by dd.vec_id
    """


@query("embedding_d4_curation", _d4_sql())
def embedding_d4_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D4 curation (Tirumala et al. 2023): SemDeDup within trained
    embedding clusters (drop any vector with a lower-id cluster-mate at
    cosine ≥ the audited threshold — ``embedding_semantic_dedup``'s
    exact rule), then prototype pruning over the SURVIVORS (drop the
    floor(quarter) closest to their centroid per cluster — the
    ``embedding_prototype_pruning`` rule at the D4 default of
    prototypical-side removal). ``d4_kept`` marks the final corpus;
    ``proto_rank`` is NULL for dropped duplicates, which never enter
    the pruning ranks. Both stages serve from the SAME frozen coarse
    quantizer, as the paper clusters once.

    Scale shape: the pair join is quadratic only within cells (k∝N —
    PROBE_KSCALE), the distance is the packed-broadcast argmin
    projection, and the two windows + three joins move (vec_id,
    cluster, dist2) id-width rows only — the full pipeline adds no
    exchange the halves didn't already pay."""
    from idh_etl_demo_spark.catalog_llm import _spark_quant
    from idh_etl_demo_spark.catalog_r7 import (
        _SEMDEDUP_THRESHOLD,
        _TRAINED_CELLS,
    )
    from idh_etl_demo_spark.operators.kmeans import _dist_structs

    assigned, cents = _km_trained_frames(spark, sf_dir, _TRAINED_CELLS)
    emb = _t(spark, sf_dir, "embeddings")
    vv = emb.repartition(spark.sparkContext.defaultParallelism).select(
        "vec_id", _spark_quant(F.col("embedding")).alias("v")
    )
    best = F.array_min(_dist_structs(CENTROID_GRID))
    dd = vv.join(F.broadcast(_packed(cents))).select(
        "vec_id",
        best["cid"].alias("cluster"),
        best["dist"].cast("long").alias("dist2"),
    )
    a = assigned.select(
        F.col("vec_id").alias("u"), F.col("v").alias("uv"), "cluster"
    )
    b = assigned.select(
        F.col("vec_id").alias("v_id"), F.col("v").alias("vv"), "cluster"
    )
    sim = _spark_int_dot(F.col("uv"), F.col("vv")) / (
        F.sqrt(_spark_int_dot(F.col("uv"), F.col("uv")))
        * F.sqrt(_spark_int_dot(F.col("vv"), F.col("vv")))
    )
    dups = (
        a.join(b, "cluster")
        .filter(F.col("u") < F.col("v_id"))
        .filter(sim >= _SEMDEDUP_THRESHOLD)
        .groupBy(F.col("v_id").alias("vec_id"))
        .agg(F.min("u").alias("dup_of"))
    )
    flagged = dd.join(dups, "vec_id", "left")
    wr = Window.partitionBy("cluster").orderBy(F.asc("dist2"), F.asc("vec_id"))
    ws = Window.partitionBy("cluster")
    surv = (
        flagged.filter(F.col("dup_of").isNull())
        .withColumn("proto_rank", F.row_number().over(wr).cast("long"))
        .withColumn("surv_size", F.count(F.lit(1)).over(ws))
        .select("vec_id", "proto_rank", "surv_size")
    )
    return (
        flagged.join(surv, "vec_id", "left")
        .select(
            "vec_id",
            "cluster",
            F.col("dup_of").isNull().alias("semdedup_keep"),
            "dist2",
            "proto_rank",
            F.coalesce(
                F.col("proto_rank") > F.expr("surv_size div 4"), F.lit(False)
            ).alias("d4_kept"),
        )
        .orderBy("vec_id")
    )


# ===========================================================================
# Winnowing fingerprints — MOSS-style local document fingerprinting
# ===========================================================================
#
# Schleimer, Wilkerson, Aiken 2003 ("Winnowing: local algorithms for
# document fingerprinting" — the MOSS algorithm): hash every k-gram,
# slide a window of w consecutive gram hashes, keep the minimum per
# window, dedupe — the selected set is a LOCAL fingerprint with the
# guarantee that any match of length ≥ w + k − 1 tokens between two
# documents shares at least one fingerprint, at expected density
# 2/(w+1) of the gram stream. Whole-doc hashing (doc_fingerprint_tokens)
# misses partial overlap; shingle sets (minhash) lose positions;
# winnowing keeps both bounded-size and position-aware.
#
# Engine-exact selection: the window minimum runs over the packed
# integer gh40·2^20 + pos — ties (impossible at 40 bits within a
# 4-gram window, but pinned anyway) resolve to the LEFTMOST minimal
# hash in both engines, and pos unpacks exactly. pos < 2^20 bounds
# documents at ~1M tokens; the 40-bit gram hash is a fingerprint
# sketch (collisions only widen a candidate set, never lose the
# guarantee).

_WIN_K = 3  # gram size, tokens
_WIN_W = 4  # winnowing window, grams


@query(
    "doc_winnow_fingerprints",
    f"""
    with base as (
      select doc_id, list_filter({_WORDS}, w -> w != '') as toks from documents
    ),
    grams as (
      select doc_id, i as pos,
             ('0x' || substring(md5(array_to_string(list_slice(toks, i, i + {_WIN_K} - 1), ' ')), 1, 10))::bigint as gh,
             len(toks) - {_WIN_K} + 1 as n_grams
      from base cross join lateral (
        select unnest(generate_series(1, greatest(len(toks) - {_WIN_K} + 1, 0))) as i
      )
    ),
    wins as (
      select doc_id, sel from (
        select doc_id, pos, n_grams,
               min(gh * 1048576 + pos) over (
                 partition by doc_id order by pos
                 rows between current row and {_WIN_W - 1} following) as sel
        from grams
      ) where pos <= n_grams - {_WIN_W} + 1
    ),
    fp as (
      select distinct doc_id, sel // 1048576 as fingerprint,
             sel % 1048576 as pos
      from wins
    )
    select doc_id, pos, fingerprint,
           count(*) over (partition by fingerprint) as fp_corpus_count
    from fp
    order by doc_id, pos
    """,
)
def doc_winnow_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing fingerprint selection (Schleimer et al. 2003): 3-gram
    40-bit hashes, window-of-4 minima (leftmost tie rule via the
    packed gh·2^20+pos integer), deduped to the per-document
    fingerprint set, each carrying its corpus-wide occupancy (the
    MOSS match signal — fingerprints shared across documents witness
    ≥ w+k−1 = 6-token overlaps, property-pinned). Density is the
    paper's 2/(w+1) in expectation.

    Scale shape: gram hashing and window packing are map-side array
    projections (one posexplode, no corpus shuffle before the per-doc
    window); the per-doc window, the fingerprint distinct and the
    occupancy window move (doc_id, pos, 8-byte gh) rows only — text
    never shuffles past the gram projection. The occupancy window is
    the same gh-partition shape doc_duplicated_spans budgets."""
    from idh_etl_demo_spark.operators.text import tokens

    docs = _t(spark, sf_dir, "documents")
    base = docs.repartition(spark.sparkContext.defaultParallelism).select(
        "doc_id", tokens(F.col("text")).alias("toks")
    )
    starts = F.when(
        F.size("toks") >= _WIN_K,
        F.sequence(F.lit(1), F.size("toks") - _WIN_K + 1),
    ).otherwise(F.array().cast("array<int>"))
    gh_arr = F.transform(
        starts,
        lambda i: F.conv(
            F.substring(
                F.md5(F.concat_ws(" ", F.slice(F.col("toks"), i, _WIN_K))),
                1,
                10,
            ),
            16,
            10,
        ).cast("long"),
    )
    grams = base.select(
        "doc_id",
        (F.size("toks") - _WIN_K + 1).alias("n_grams"),
        F.posexplode(gh_arr).alias("pos0", "gh"),
    ).select(
        "doc_id",
        "n_grams",
        (F.col("pos0") + 1).alias("pos"),
        "gh",
    )
    w_win = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.currentRow, _WIN_W - 1)
    )
    wins = (
        grams.withColumn(
            "sel", F.min(F.col("gh") * 1048576 + F.col("pos")).over(w_win)
        )
        .filter(F.col("pos") <= F.col("n_grams") - _WIN_W + 1)
        .select("doc_id", "sel")
    )
    fp = wins.select(
        "doc_id",
        F.expr("sel div 1048576").alias("fingerprint"),
        (F.col("sel") % 1048576).alias("pos"),
    ).distinct()
    return (
        fp.withColumn(
            "fp_corpus_count",
            F.count(F.lit(1)).over(Window.partitionBy("fingerprint")),
        )
        .select("doc_id", "pos", "fingerprint", "fp_corpus_count")
        .orderBy("doc_id", "pos")
    )


# ===========================================================================
# MMR diversified reranking — the serving layer over BM25 retrieval
# ===========================================================================
#
# Carbonell & Goldstein 1998 (Maximal Marginal Relevance): a result
# list that maximizes relevance alone ships near-duplicates; MMR
# greedily picks argmax λ·rel − (1−λ)·max-sim-to-selected, trading
# relevance against redundancy. Here rel is the per-query-normalized
# BM25 score (doc_bm25_multiquery's exact doubles), sim is exact
# integer token-set Jaccard between candidate documents, λ = 1/2, and
# the K=5 greedy steps are statically unrolled — every step an argmax
# window over the |Q|·R candidate frame, deterministic ties by BM25
# rank. All doubles derive from exact integer divisions with identical
# operation order in both engines.

_MMR_STEPS = 5


def _mmr_sql() -> str:
    steps = []
    for t in range(2, _MMR_STEPS + 1):
        steps.append(f"""
    ms{t} as (
      select j.query_id, j.a as doc_id, max(j.sim) as msim
      from jac j join sel{t - 1} s
        on s.query_id = j.query_id and s.doc_id = j.b
      group by j.query_id, j.a
    ),
    sc{t} as (
      select c.query_id, c.doc_id, c.rank,
             (c.rel_norm - coalesce(ms.msim, 0)) / 2 as mmr
      from cand c
      left join ms{t} ms
        on ms.query_id = c.query_id and ms.doc_id = c.doc_id
      left join sel{t - 1} se
        on se.query_id = c.query_id and se.doc_id = c.doc_id
      where se.doc_id is null
    ),
    pk{t} as (
      select query_id, doc_id, {t} as step, rank, mmr from (
        select *, row_number() over (partition by query_id
                                     order by mmr desc, rank asc) as rn
        from sc{t}
      ) where rn = 1
    ),
    sel{t} as (
      select * from sel{t - 1} union all select * from pk{t}
    )""")
    return f"""
    with {_bm25_multi_ctes()},
    topd as (
      select query_id, doc_id, n_terms, n_tokens, bm25, rank from (
        select *, row_number() over (partition by query_id
                                     order by bm25 desc, doc_id asc) as rank
        from perdoc
      ) where rank <= {_BM25_TOPN}
    ),
    cand as materialized (
      select query_id, doc_id, bm25, rank,
             bm25 / max(bm25) over (partition by query_id) as rel_norm
      from topd
    ),
    ctok as (
      select distinct c.query_id, c.doc_id, t.token
      from cand c join (
        select doc_id, unnest(list_distinct(toks)) as token from base
      ) t on t.doc_id = c.doc_id
    ),
    sizes as (
      select query_id, doc_id, count(*) as sz
      from ctok group by query_id, doc_id
    ),
    inter as (
      select a.query_id, a.doc_id as a, b.doc_id as b,
             count(*) as shared
      from ctok a join ctok b
        on a.query_id = b.query_id and a.token = b.token
           and a.doc_id != b.doc_id
      group by a.query_id, a.doc_id, b.doc_id
    ),
    jac as materialized (
      select i.query_id, i.a, i.b,
             cast(shared as double) / (sa.sz + sb.sz - shared) as sim
      from inter i
      join sizes sa on sa.query_id = i.query_id and sa.doc_id = i.a
      join sizes sb on sb.query_id = i.query_id and sb.doc_id = i.b
    ),
    sel1 as (
      select query_id, doc_id, 1 as step, rank, rel_norm / 2 as mmr
      from cand where rank = 1
    ),{','.join(steps)}
    select query_id, cast(step as bigint) as mmr_step, doc_id,
           cast(rank as bigint) as bm25_rank, mmr as mmr_score
    from sel{_MMR_STEPS}
    order by query_id, mmr_step
    """


@query("doc_bm25_mmr", _mmr_sql())
def doc_bm25_mmr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MMR-diversified top-{k} over the BM25 multiquery shortlist
    (Carbonell & Goldstein 1998): greedy argmax of (rel_norm −
    max_sim_to_selected)/2, where rel_norm is BM25 normalized by the
    per-query maximum and sim is exact token-set Jaccard between
    candidate documents. Statically unrolled K={k} steps; step 1 is
    the pure-relevance pick (empty selected set); ties break on BM25
    rank, so the whole chain is deterministic and engine-exact
    (every double is a correctly-rounded operation on identical
    inputs in identical order). ``bm25_rank`` rides along so the
    output exhibits the reorder MMR exists for.

    Scale shape: the corpus-side cost is doc_bm25_multiquery's plan +
    ONE candidates→tokens join (the |Q|·R shortlist broadcasts onto
    the token stream); the Jaccard pair table is |Q|·R² rows and every
    unrolled step is windows/joins over ≤ |Q|·R rows — serving-layer
    arithmetic, never a corpus pass per step. The shortlist (|Q|·R
    rows), the pair table (|Q|·R² rows), and the per-step selected
    set are frozen with eager ``localCheckpoint`` — the same
    train→freeze→serve discipline as the residual-PQ family: a lazy
    plan re-expands the full BM25 corpus chain once per step
    reference (measured 78 s vs ~11 s at sf0.001), and the selected
    set is referenced 3× per step, so a lazy union chain grows the
    plan tree ~3^K. Checkpointed frames carry no size stats, so the
    loop joins carry explicit ``F.broadcast`` hints."""
    from idh_etl_demo_spark.operators.text import tokens

    base_docs = _t(spark, sf_dir, "documents")
    topd = doc_bm25_multiquery(spark, sf_dir)
    wq = Window.partitionBy("query_id")
    cand = topd.select(
        "query_id",
        "doc_id",
        "bm25",
        "rank",
        (F.col("bm25") / F.max("bm25").over(wq)).alias("rel_norm"),
    ).localCheckpoint()
    toks = base_docs.repartition(
        spark.sparkContext.defaultParallelism
    ).select(
        "doc_id", F.explode(F.array_distinct(tokens(F.col("text")))).alias("token")
    )
    ctok = (
        toks.join(F.broadcast(cand.select("query_id", "doc_id")), "doc_id")
        .select("query_id", "doc_id", "token")
        .distinct()
        .localCheckpoint()
    )
    sizes = ctok.groupBy("query_id", "doc_id").agg(
        F.count(F.lit(1)).alias("sz")
    )
    a = ctok.select("query_id", F.col("doc_id").alias("a"), "token")
    b = ctok.select("query_id", F.col("doc_id").alias("b"), "token")
    inter = (
        a.join(b, ["query_id", "token"])
        .filter(F.col("a") != F.col("b"))
        .groupBy("query_id", "a", "b")
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    jac = (
        inter.join(
            sizes.select(
                "query_id", F.col("doc_id").alias("a"), F.col("sz").alias("sa")
            ),
            ["query_id", "a"],
        )
        .join(
            sizes.select(
                "query_id", F.col("doc_id").alias("b"), F.col("sz").alias("sb")
            ),
            ["query_id", "b"],
        )
        .select(
            "query_id",
            "a",
            "b",
            (
                F.col("shared").cast("double")
                / (F.col("sa") + F.col("sb") - F.col("shared"))
            ).alias("sim"),
        )
        .localCheckpoint()
    )
    sel = cand.filter(F.col("rank") == 1).select(
        "query_id",
        "doc_id",
        F.lit(1).alias("step"),
        "rank",
        (F.col("rel_norm") / 2).alias("mmr"),
    )
    for t in range(2, _MMR_STEPS + 1):
        ms = (
            jac.join(
                F.broadcast(sel.select("query_id", F.col("doc_id").alias("b"))),
                ["query_id", "b"],
            )
            .groupBy("query_id", F.col("a").alias("doc_id"))
            .agg(F.max("sim").alias("msim"))
        )
        sc = (
            cand.join(
                F.broadcast(sel.select("query_id", "doc_id")),
                ["query_id", "doc_id"],
                "left_anti",
            )
            .join(F.broadcast(ms), ["query_id", "doc_id"], "left")
            .select(
                "query_id",
                "doc_id",
                "rank",
                (
                    (F.col("rel_norm") - F.coalesce("msim", F.lit(0.0))) / 2
                ).alias("mmr"),
            )
        )
        wp = Window.partitionBy("query_id").orderBy(
            F.desc("mmr"), F.asc("rank")
        )
        pk = (
            sc.withColumn("rn", F.row_number().over(wp))
            .filter(F.col("rn") == 1)
            .select(
                "query_id", "doc_id", F.lit(t).alias("step"), "rank", "mmr"
            )
        )
        # sel is referenced 3× per step (ms join, anti-join, union), so
        # a lazy union chain grows the plan tree ~3^K; checkpointing the
        # ≤|Q|·K-row selected set keeps the plan linear in K
        sel = sel.unionAll(pk).localCheckpoint()
    return sel.select(
        "query_id",
        F.col("step").cast("long").alias("mmr_step"),
        "doc_id",
        F.col("rank").cast("long").alias("bm25_rank"),
        F.col("mmr").alias("mmr_score"),
    ).orderBy("query_id", "mmr_step")
