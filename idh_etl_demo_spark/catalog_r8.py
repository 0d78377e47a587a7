"""Round-8 catalog entries: product quantization (the billion-scale
vector-compression layout), BM25 retrieval, and GPT-3-style n-gram
contamination fractions.

Everything follows the repo's entry contract: a ``@query(name,
duckdb_sql)`` registration whose SQL reproduces the Spark result
engine-exactly (integer arithmetic, or a SINGLE double division /
sqrt of exact integers evaluated in the same order on both engines),
a shuffle budget in tests/test_plan_shape.py, a bench HEADLINE row,
and property tests against pure-Python references
(tests/test_r8_properties.py).

Product quantization here is the real FAISS-style layout re-expressed
for Spark: the 64-dim space splits into m=2 sub-spaces of 32 dims, each
with its own k=4 codebook trained by the SAME kcenter→Lloyd chain the
seeded-KMeans entry gates (catalog_r3) — so a corpus vector is stored
as 2 small codes instead of 64 floats, and search scores candidates by
looking up per-(code1, code2) reconstructed similarities (ADC). m and k
are pinned tiny for oracle determinism. The per-(code1, code2) score
table is k^m rows — fine at the pinned m=2 (k²=16), NOT viable at
FAISS-scale m=16·k=256; the production formulation is the SEPARABLE
per-subspace LUT (m·k partial dots per query, m lookups per candidate),
implemented as catalog_r9's ``embedding_ivfpq_adc_lut`` with
bit-identical results.

This module may import catalog_llm / catalog_r3 helpers at module
level — nothing imports catalog_r8 back, so there is no cycle.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from idh_etl_demo_spark.catalog import _t, query
from idh_etl_demo_spark.catalog_llm import _QUANT, _WORDS, _spark_int_dot, _spark_quant
from idh_etl_demo_spark.catalog_r3 import (
    _kcenter_seed_frame,
    _km_trained_ctes,
    _km_trained_frames,
)
from idh_etl_demo_spark.operators.kmeans import CENTROID_GRID, _packed

# Sub-space layout: m=2 halves of the 64-dim embeddings, k=4 codewords
# per sub-space (oracle-determinism pin, like _TRAINED_CELLS). 1-based
# start offsets — both engines slice inclusively from these.
_PQ_SUBS = ((1, 1), (2, 33))
_PQ_DIM = 32
_PQ_K = 4


# ===========================================================================
# PQ codebook training: the kcenter→Lloyd chain per sub-space
# ===========================================================================


def _pq_sub_ctes(
    pfx: str,
    lo: int,
    dim: int,
    k: int = _PQ_K,
    *,
    src: str = "embeddings",
    vexpr: str = _QUANT,
    grid: int = 100,
    materialize: bool = False,
) -> list[str]:
    """DuckDB CTE chain for ONE sub-space codebook: kcenter farthest-first
    seeding + two fixed-point Lloyd rounds over ``list_slice(v, lo,
    lo+dim-1)`` — the catalog_r3 trained-quantizer chain
    (``_km_trained_ctes``) re-emitted with prefixed CTE names and a
    sliced input so two sub-space chains can share one WITH clause
    (and compose with the full-vector chain for IVFPQ). Ends with
    ``{pfx}c1`` (trained codebook, ×``grid`` sub-grid) and ``{pfx}a2``
    (the per-vector code assignment).

    ``src``/``vexpr``: the input relation and its vector expression —
    the residual chains (catalog_r9) slice a residual CTE instead of
    the raw embeddings table. ``grid=1`` keeps codewords on the
    input's own grid (residual codebooks: the input is already on the
    ×100 centroid grid, so a second ×100 lift would push the
    reconstruction dot past 2^53 exactness). ``materialize`` pins the
    ``{pfx}v`` input CTE MATERIALIZED — required when ``src`` is itself
    an expensive CTE chain (the residual input): DuckDB would otherwise
    re-execute it per reference (measured 110 s → 0.7 s at sf0.01,
    identical results)."""
    hi = lo + dim - 1

    def d(a: str, s: str) -> str:
        return (
            f"list_sum(list_transform(generate_series(1, {dim}), "
            f"i -> ({a}.v[i] - {s}.v[i]) * ({a}.v[i] - {s}.v[i])))"
        )

    mat = "materialized " if materialize else ""
    ctes = [
        f"{pfx}v as {mat}(select vec_id, list_slice({vexpr}, {lo}, {hi}) as v from {src})",
        f"{pfx}h as (select vec_id, v, ('0x' || substring(md5(cast(vec_id as varchar)), 1, 15))::bigint as hv from {pfx}v)",
        f"{pfx}s1 as (select vec_id, v from {pfx}h order by hv, vec_id limit 1)",
        f"{pfx}b1 as (select {pfx}h.vec_id, {pfx}h.v, {d(pfx + 'h', pfx + 's1')} as d from {pfx}h, {pfx}s1)",
    ]
    for r in range(2, k + 1):
        prev = f"{pfx}b{r - 1}"
        ctes.append(
            f"{pfx}s{r} as (select vec_id, v from {prev} order by d desc, vec_id limit 1)"
        )
        if r < k:
            ctes.append(
                f"{pfx}b{r} as (select {prev}.vec_id, {prev}.v, "
                f"least({prev}.d, {d(prev, f'{pfx}s{r}')}) as d "
                f"from {prev}, {pfx}s{r})"
            )
    seeds_union = " union all ".join(
        f"select vec_id, v from {pfx}s{r}" for r in range(1, k + 1)
    )
    d1 = f"""
      select vv.vec_id, vv.v, c0.cid, {d('vv', 'c0')} as dist
      from {pfx}v vv cross join (select cid, cv as v from {pfx}c0) c0
    """
    return ctes + [
        f"{pfx}c0 as (select vec_id as cid, v as cv from ({seeds_union}))",
        f"""{pfx}a1 as (
          select vec_id, v, cid as cluster from (
            select d.vec_id, d.v, d.cid,
                   row_number() over (partition by d.vec_id
                                      order by d.dist asc, d.cid asc) as rn
            from ({d1}) d
          ) where rn = 1
        )""",
        f"""{pfx}upd as (
          select cluster, p, sum(v[p]) as s, count(*) as n
          from {pfx}a1 cross join range(1, {dim + 1}) t(p)
          group by cluster, p
        )""",
        f"""{pfx}c1 as (
          select cluster as cid,
                 list(cast(floor(s * {grid}.0 / n) as bigint) order by p) as cv
          from {pfx}upd group by cluster
        )""",
        f"""{pfx}r2 as (
          select vec_id, v, cid, dist,
                 row_number() over (partition by vec_id
                                    order by dist asc, cid asc) as rn
          from (
            select vv.vec_id, vv.v, c1.cid,
                   list_sum(list_transform(generate_series(1, {dim}),
                     i -> (vv.v[i] * {grid} - c1.cv[i]) * (vv.v[i] * {grid} - c1.cv[i]))) as dist
            from {pfx}v vv cross join {pfx}c1 c1
          )
        )""",
        f"{pfx}a2 as (select vec_id, v, cid as cluster from {pfx}r2 where rn = 1)",
    ]


def _pq_sub_frames(
    spark: SparkSession, sf_dir: str, lo: int, dim: int = _PQ_DIM, k: int = _PQ_K
) -> tuple[DataFrame, DataFrame]:
    """Spark twin of ``_pq_sub_ctes``: (assigned, cents) for one
    sub-space, via the shared kcenter/Lloyd operators on the sliced
    quantized vectors — the identical composition ``_km_trained_frames``
    runs on the full vector."""
    from idh_etl_demo_spark.operators.kmeans import lloyd_assign, lloyd_centroids

    emb = _t(spark, sf_dir, "embeddings")
    vv = emb.repartition(spark.sparkContext.defaultParallelism).select(
        "vec_id", F.slice(_spark_quant(F.col("embedding")), lo, dim).alias("v")
    )
    seeds = _kcenter_seed_frame(vv, k).select(
        F.col("vec_id").alias("cid"),
        F.transform(F.col("v"), lambda x: x * CENTROID_GRID).alias("cv"),
    )
    cents = lloyd_centroids(vv, seeds, iterations=2)
    return lloyd_assign(vv, cents), cents


def _pq_all_ctes() -> str:
    return ",".join(
        cte for sub, lo in _PQ_SUBS for cte in _pq_sub_ctes(f"q{sub}_", lo, _PQ_DIM)
    )


# Trained-model memo per (applicationId, sf_dir): the two sub-space
# codebooks, frozen with eager localCheckpoint — the round-9
# train→freeze→encode pattern (catalog_r9._RES_MODELS) retrofitted to
# the round-8 family: a fully-lazy plan re-expands each kcenter→Lloyd
# chain inside every consumer branch, which is wasted recomputation,
# not the "honest cost" of training (training runs ONCE here, exactly
# as FAISS trains once). Checkpointing k-row tables preserves their
# values bit-for-bit, so every oracle stays green. bench.py clears this
# memo per rep (SESSION_CACHED) for honest cold numbers; the consuming
# entries are in EAGER_EXEMPT.
_PQ_MODELS: dict[tuple[str, str], tuple[DataFrame, DataFrame]] = {}


def _pq_models(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    key = (spark.sparkContext.applicationId, sf_dir)
    if key not in _PQ_MODELS:
        _, c1 = _pq_sub_frames(spark, sf_dir, _PQ_SUBS[0][1])
        _, c2 = _pq_sub_frames(spark, sf_dir, _PQ_SUBS[1][1])
        _PQ_MODELS[key] = (
            c1.localCheckpoint(eager=True),
            c2.localCheckpoint(eager=True),
        )
    return _PQ_MODELS[key]


def _cells_frozen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The trained coarse-cell table (catalog_r3._km_trained_frames
    values — frozen at the source via catalog_r3._KM_MODELS). Shared by
    the IVFPQ entries here and catalog_r9's residual family — one
    coarse training per (session, sf)."""
    _, cents = _km_trained_frames(spark, sf_dir, 4)
    return cents


@query(
    "embedding_pq_codebooks",
    f"""
    with {_pq_all_ctes()}
    select subspace, cid, p, cq from (
      select cast(1 as bigint) as subspace, cid, p, cv[p] as cq
      from q1_c1 cross join range(1, {_PQ_DIM + 1}) t(p)
      union all
      select cast(2 as bigint), cid, p, cv[p]
      from q2_c1 cross join range(1, {_PQ_DIM + 1}) t(p)
    )
    order by subspace, cid, p
    """,
)
def embedding_pq_codebooks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization codebooks: one trained k-means codebook per
    sub-space (m=2 halves of the embedding, k=4 codewords each), emitted
    one row per (subspace, codeword, dimension) so the value-hash gate
    covers every trained coordinate. Training is the audited
    kcenter→two-Lloyd chain per sub-space — integer-exact, so codebooks
    match the DuckDB twin bit-for-bit.

    Shape: each sub-space chain shuffles ≤ k·dim rows per Lloyd round
    (the packed-broadcast assignment never shuffles the corpus —
    operators/kmeans.py); the two chains share the one embeddings scan
    per pass. At 100 TB with m=16, k=256 the update shuffle is still
    m·k·(dim/m) = k·dim rows — independent of corpus size."""
    out = []
    for sub, cents in zip((s for s, _ in _PQ_SUBS), _pq_models(spark, sf_dir)):
        out.append(
            cents.select(
                F.lit(sub).cast("long").alias("subspace"),
                "cid",
                F.posexplode("cv").alias("p0", "cq"),
            ).select(
                "subspace", "cid", (F.col("p0") + 1).cast("long").alias("p"), "cq"
            )
        )
    return out[0].unionByName(out[1]).orderBy("subspace", "cid", "p")


# ===========================================================================
# PQ-ADC search: asymmetric distance over the 2-code corpus
# ===========================================================================


def _pq_combo_frame(cents1: DataFrame, cents2: DataFrame) -> DataFrame:
    """The k² (code1, code2) reconstruction table: per combo, the two
    codeword halves and the reconstructed self-dot ``rr`` — 16 rows;
    the ONLY thing PQ search ever computes reconstruction math on."""
    c1 = cents1.select(
        F.col("cid").alias("code1"),
        F.col("cv").alias("c1v"),
        _spark_int_dot(F.col("cv"), F.col("cv")).alias("rr1"),
    )
    c2 = cents2.select(
        F.col("cid").alias("code2"),
        F.col("cv").alias("c2v"),
        _spark_int_dot(F.col("cv"), F.col("cv")).alias("rr2"),
    )
    return c1.crossJoin(c2).select(
        "code1", "code2", "c1v", "c2v", (F.col("rr1") + F.col("rr2")).alias("rr")
    )


def _argmin_cid(
    v_expr: F.Column, cs_name: str, grid: int = CENTROID_GRID
) -> F.Column:
    """Nearest-centroid id of ``v_expr`` against a packed codebook column
    (array<struct(cid, cv)>) — the kmeans packed-broadcast argmin
    (operators/kmeans.py:_dist_structs) generalized to an arbitrary
    vector expression so one projection can assign several codebooks
    (cell + m sub-space codes) in a single corpus pass. ``grid=1`` for
    residual codebooks (codewords on the input's own grid)."""

    def dist_to(cv: F.Column) -> F.Column:
        return F.aggregate(
            F.zip_with(
                v_expr,
                cv,
                lambda x, y: (x * grid - y) * (x * grid - y),
            ),
            F.lit(0.0),
            lambda acc, d: acc + d.cast("double"),
        )

    return F.array_min(
        F.transform(
            F.col(cs_name),
            lambda c: F.struct(dist_to(c["cv"]).alias("dist"), c["cid"].alias("cid")),
        )
    )["cid"]


def _pq_encoded(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame, DataFrame]:
    """(codes, cents1, cents2): the corpus encoded to (vec_id, v, code1,
    code2) in ONE projection pass — both sub-space codebooks (frozen
    trained tables) ride the row as packed broadcast structs, so
    encoding shuffles nothing."""
    cents1, cents2 = _pq_models(spark, sf_dir)
    emb = _t(spark, sf_dir, "embeddings")
    vv = emb.repartition(spark.sparkContext.defaultParallelism).select(
        "vec_id", _spark_quant(F.col("embedding")).alias("v")
    )
    codes = (
        vv.crossJoin(F.broadcast(_packed(cents1).withColumnRenamed("cs", "cs1")))
        .crossJoin(F.broadcast(_packed(cents2).withColumnRenamed("cs", "cs2")))
        .select(
            "vec_id",
            "v",
            _argmin_cid(F.slice(F.col("v"), _PQ_SUBS[0][1], _PQ_DIM), "cs1").alias("code1"),
            _argmin_cid(F.slice(F.col("v"), _PQ_SUBS[1][1], _PQ_DIM), "cs2").alias("code2"),
        )
    )
    return codes, cents1, cents2


def _adc_scored(codes: DataFrame, cents1: DataFrame, cents2: DataFrame) -> DataFrame:
    """(query_id, neighbor_id, code1, code2, adc_cosine): every query
    (vec_id % 25 == 0, full precision) scored against every corpus code
    pair. The similarity is computed ONCE per (query, code1, code2) —
    |Q|·k² rows — then joined to the 2-byte-code corpus; candidates in
    the same combo share the exact same double, so ranking ties break
    on neighbor_id identically in both engines."""
    q = codes.filter(F.col("vec_id") % 25 == 0).select(
        F.col("vec_id").alias("query_id"),
        F.slice(F.col("v"), _PQ_SUBS[0][1], _PQ_DIM).alias("q1"),
        F.slice(F.col("v"), _PQ_SUBS[1][1], _PQ_DIM).alias("q2"),
        _spark_int_dot(F.col("v"), F.col("v")).alias("qq"),
    )
    combos = _pq_combo_frame(cents1, cents2)
    qscore = q.crossJoin(F.broadcast(combos)).select(
        "query_id",
        "code1",
        "code2",
        (
            (_spark_int_dot(F.col("q1"), F.col("c1v"))
             + _spark_int_dot(F.col("q2"), F.col("c2v"))).cast("double")
            / (F.sqrt(F.col("qq").cast("double")) * F.sqrt(F.col("rr").cast("double")))
        ).alias("adc_cosine"),
    )
    return (
        codes.select("vec_id", "code1", "code2")
        .join(F.broadcast(qscore), ["code1", "code2"])
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            "code1",
            "code2",
            "adc_cosine",
        )
    )


_PQ_SEARCH_TAIL = """
    select query_id, neighbor_id, code1, code2, adc_cosine, rank from (
      select *, row_number() over (partition by query_id
                                   order by adc_cosine desc, neighbor_id asc) as rank
      from scored
    ) where rank <= 5
    order by query_id, rank
"""

_PQ_SQL_COMBOS = """
    combos as (
      select a.cid as code1, b.cid as code2, a.cv as c1v, b.cv as c2v,
             list_dot_product(a.cv, a.cv) + list_dot_product(b.cv, b.cv) as rr
      from q1_c1 a cross join q2_c1 b
    ),
    codes as (
      select a.vec_id, a.cluster as code1, b.cluster as code2
      from q1_a2 a join q2_a2 b on a.vec_id = b.vec_id
    )
"""


@query(
    "embedding_pq_search",
    f"""
    with {_pq_all_ctes()},
    fv as (select vec_id, {_QUANT} as v from embeddings),
    {_PQ_SQL_COMBOS},
    q as (
      select vec_id as query_id,
             list_slice(v, 1, {_PQ_DIM}) as q1,
             list_slice(v, {_PQ_SUBS[1][1]}, 64) as q2,
             list_dot_product(v, v) as qq
      from fv where vec_id % 25 = 0
    ),
    qscore as (
      select query_id, code1, code2,
             (list_dot_product(q1, c1v) + list_dot_product(q2, c2v))
               / (sqrt(qq) * sqrt(rr)) as adc_cosine
      from q cross join combos
    ),
    scored as (
      select query_id, c.vec_id as neighbor_id, s.code1, s.code2, adc_cosine
      from codes c join qscore s on c.code1 = s.code1 and c.code2 = s.code2
      where c.vec_id != s.query_id
    )
    {_PQ_SEARCH_TAIL}
    """,
)
def embedding_pq_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ-ADC top-5 search: queries stay full-precision, the corpus is
    its 2 sub-space codes, and similarity is the asymmetric-distance
    cosine against the RECONSTRUCTED codeword pair (grid scale factors
    cancel inside cosine). Exhaustive-scan ADC — the memory-bound
    regime PQ was built for (Jégou et al. 2011): per query only k²=16
    similarities are ever computed; candidates just look theirs up by
    code pair.

    Shape: encoding is a packed-broadcast projection (zero corpus
    shuffles); the |Q|·k² score table broadcasts onto the code stream;
    the only corpus-keyed exchange is the per-query top-k window. The
    full-scan candidate fan-out is the honest ADC cost — the IVFPQ
    entry below bounds it with trained cells."""
    codes, cents1, cents2 = _pq_encoded(spark, sf_dir)
    scored = _adc_scored(codes, cents1, cents2)
    w = Window.partitionBy("query_id").orderBy(
        F.desc("adc_cosine"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= 5)
        .select("query_id", "neighbor_id", "code1", "code2", "adc_cosine", "rank")
        .orderBy("query_id", "rank")
    )


@query(
    "embedding_ivfpq_search",
    f"""
    with {','.join(_km_trained_ctes(4))},
    {_pq_all_ctes()},
    {_PQ_SQL_COMBOS},
    qiv as (
      select vec_id as query_id, cluster as cell,
             list_slice(v, 1, {_PQ_DIM}) as q1,
             list_slice(v, {_PQ_SUBS[1][1]}, 64) as q2,
             list_dot_product(v, v) as qq
      from a2 where vec_id % 25 = 0
    ),
    qscore as (
      select query_id, cell, code1, code2,
             (list_dot_product(q1, c1v) + list_dot_product(q2, c2v))
               / (sqrt(qq) * sqrt(rr)) as adc_cosine
      from qiv cross join combos
    ),
    cand as (
      select a.vec_id as neighbor_id, a.cluster as cell, k.code1, k.code2
      from a2 a join codes k on a.vec_id = k.vec_id
    ),
    scored as (
      select s.query_id, c.neighbor_id, c.cell, s.adc_cosine
      from cand c join qscore s
        on c.cell = s.cell and c.code1 = s.code1 and c.code2 = s.code2
      where c.neighbor_id != s.query_id
    )
    select query_id, neighbor_id, cell, adc_cosine, rank from (
      select *, row_number() over (partition by query_id
                                   order by adc_cosine desc, neighbor_id asc) as rank
      from scored
    ) where rank <= 5
    order by query_id, rank
    """,
)
def embedding_ivfpq_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ: the canonical billion-scale ANN layout — a TRAINED coarse
    quantizer (the seeded-KMeans cells every IVF entry serves from)
    restricts each query to its cell, and candidates inside the cell are
    scored by PQ-ADC cosine instead of full-precision dot products. A
    corpus vector costs cell-id + 2 codes (~3 small ints) instead of 64
    floats; no residual encoding (classic IVFPQ encodes v − centroid) —
    skipped here so codes stay shared with the flat-ADC entry and the
    oracle stays integer-exact, and disclosed as the accuracy gap vs
    FAISS's IVFPQ.

    Shape: cells, code1, code2 are all packed-broadcast argmin
    projections over ONE corpus pass; the serving join is cell+code
    equi-join against the broadcast |Q|·k² score table; the per-query
    top-k window is the only corpus-keyed exchange."""
    cell_cents = _cells_frozen(spark, sf_dir)
    codes, cents1, cents2 = _pq_encoded(spark, sf_dir)
    enc = (
        codes.crossJoin(
            F.broadcast(_packed(cell_cents).withColumnRenamed("cs", "cs_cell"))
        )
        .select(
            "vec_id",
            "v",
            "code1",
            "code2",
            _argmin_cid(F.col("v"), "cs_cell").alias("cell"),
        )
    )
    q = enc.filter(F.col("vec_id") % 25 == 0).select(
        F.col("vec_id").alias("query_id"),
        "cell",
        F.slice(F.col("v"), _PQ_SUBS[0][1], _PQ_DIM).alias("q1"),
        F.slice(F.col("v"), _PQ_SUBS[1][1], _PQ_DIM).alias("q2"),
        _spark_int_dot(F.col("v"), F.col("v")).alias("qq"),
    )
    combos = _pq_combo_frame(cents1, cents2)
    qscore = q.crossJoin(F.broadcast(combos)).select(
        "query_id",
        "cell",
        "code1",
        "code2",
        (
            (_spark_int_dot(F.col("q1"), F.col("c1v"))
             + _spark_int_dot(F.col("q2"), F.col("c2v"))).cast("double")
            / (F.sqrt(F.col("qq").cast("double")) * F.sqrt(F.col("rr").cast("double")))
        ).alias("adc_cosine"),
    )
    scored = (
        enc.select("vec_id", "cell", "code1", "code2")
        .join(F.broadcast(qscore), ["cell", "code1", "code2"])
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", F.col("vec_id").alias("neighbor_id"), "cell", "adc_cosine")
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
# BM25 retrieval
# ===========================================================================

# Fixed retrieval query: one rare term (high idf) + two common ones.
_BM25_TERMS = ("dup", "hash", "vector")
# BM25 constants k1=1.2, b=0.75, kept as the exact integer ratios they
# contribute after clearing denominators (see docstring).
_BM25_SQL = f"""
    with base as (
      select doc_id, list_filter({_WORDS}, w -> w != '') as toks from documents
    ),
    stats as (
      select sum(len(toks)) as s, count(*) as n from base
    ),
    tf as (
      select doc_id, dl, token, count(*) as tf from (
        select doc_id, len(toks) as dl, unnest(toks) as token from base
      ) where token in {_BM25_TERMS}
      group by doc_id, dl, token
    ),
    terms as (
      select doc_id, dl, token, tf,
             count(*) over (partition by token) as df
      from tf
    ),
    scored as (
      select doc_id, dl, token,
             ((2 * (n - df) + 1) * 22 * tf * s)
               / ((2 * df + 1) * (10 * s * tf + 3 * s + 9 * dl * n)) as term_score
      from terms cross join stats
    )
    select doc_id, n_terms, n_tokens, bm25 from (
      select doc_id,
             count(*) as n_terms,
             cast(max(dl) as bigint) as n_tokens,
             list_reduce(list(term_score order by token), (a, b) -> a + b) as bm25
      from scored
      group by doc_id
    )
    order by bm25 desc, doc_id asc
    limit 20
"""


def _bm25_term_score() -> F.Column:
    """The cleared-denominator BM25 term score with its EXACTNESS BOUND
    enforced (ADVICE r8): num = (2(N−df)+1)·22·tf·S and den =
    (2df+1)·(10·S·tf+3S+9·dl·N) are exact int64 products whose single
    double division is bit-identical across engines ONLY while both
    operands < 2^53 — and Spark long arithmetic WRAPS silently past
    int64, so the precondition must be checked, not assumed. The guard
    evaluates both magnitudes in double (conservative bound 2^52, a 2×
    margin absorbing the double rounding of the product estimate) and
    raises instead of returning a silently-wrong score. DuckDB needs no
    twin guard: it raises on int64 overflow natively. Expects columns
    n, df, tf, s, dl."""
    num = (2 * (F.col("n") - F.col("df")) + 1) * 22 * F.col("tf") * F.col("s")
    den = (2 * F.col("df") + 1) * (
        10 * F.col("s") * F.col("tf") + 3 * F.col("s") + 9 * F.col("dl") * F.col("n")
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    num_d = (2 * (d("n") - d("df")) + 1) * 22 * d("tf") * d("s")
    den_d = (2 * d("df") + 1) * (
        10 * d("s") * d("tf") + 3 * d("s") + 9 * d("dl") * d("n")
    )
    bound = F.lit(float(2**52))
    return F.when((num_d < bound) & (den_d < bound), num / den).otherwise(
        F.raise_error(
            F.lit(
                "bm25 exactness bound exceeded: an operand reached 2^52; "
                "rescale the cleared-denominator score (catalog_r8)"
            )
        ).cast("double")
    )


@query("doc_bm25_topk", _BM25_SQL)
def doc_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-20 retrieval for a fixed query over the corpus
    (Robertson/Spärck Jones; k1=1.2, b=0.75) — the lexical-retrieval
    primitive behind training-data search and RAG candidate generation.
    Two determinism substitutions, both disclosed: (1) the idf is the
    LOG-FREE rational (N−df+0.5)/(df+0.5) — ln() differs in the last
    ulp across engines; the rational keeps idf's df-monotonicity, which
    is all ranking uses; (2) each per-term score is ONE double division
    of two exact <2^53 integers (denominators cleared: ·10·S), and the
    per-doc sum folds the terms in token order on both engines, so the
    total is bit-identical.

    Shape: corpus collapses at the scan to (doc, dl) plus tf rows for
    QUERY terms only (the IN filter pushes into the token explode —
    |terms| per doc, not |vocab|); df rides a window over the token
    partitioning; the (S, N) corpus aggregate is one broadcast row. The
    final global top-20 sorts only docs matching ≥1 query term."""
    from idh_etl_demo_spark.operators.text import tokens

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
        .filter(F.col("token").isin(*_BM25_TERMS))
        .groupBy("doc_id", "dl", "token")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    )
    terms = tf.withColumn(
        "df", F.count(F.lit(1)).over(Window.partitionBy("token")).cast("long")
    )
    scored = terms.crossJoin(F.broadcast(stats)).select(
        "doc_id", "dl", "token", _bm25_term_score().alias("term_score")
    )
    parts = F.array_sort(F.collect_list(F.struct("token", "term_score")))
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_terms"),
            F.max("dl").alias("n_tokens"),
            F.aggregate(
                parts,
                F.lit(0.0),
                lambda acc, x: acc + x["term_score"],
            ).alias("bm25"),
        )
        .orderBy(F.desc("bm25"), F.asc("doc_id"))
        .limit(20)
        .select("doc_id", "n_terms", "n_tokens", "bm25")
    )


# ===========================================================================
# Contamination fraction (GPT-3 / PaLM-style dirty-document rule)
# ===========================================================================

_CONTAM_MOD, _CONTAM_RES = 13, 3
_CONTAM_THRESHOLD_MICRO = 200_000  # dirty if >= 20% of a doc's 5-grams hit

_SHINGLES5_R8 = (
    "list_distinct(list_transform("
    "generate_series(1, greatest(len(words) - 4, 0)), "
    "i -> array_to_string(list_slice(words, i, i + 4), ' ')))"
)


@query(
    "doc_contamination_fraction",
    f"""
    with docs as (select doc_id, {_WORDS} as words from documents),
    sets as (select doc_id, {_SHINGLES5_R8} as sh from docs
             where doc_id % {_CONTAM_MOD} != {_CONTAM_RES}),
    bench as (
      select distinct md5(s) as gh
      from (select unnest(sh) as s
            from (select {_SHINGLES5_R8} as sh from docs
                  where doc_id % {_CONTAM_MOD} = {_CONTAM_RES}))
    ),
    hits as (
      select c.doc_id, count(*) as n_hits
      from (select doc_id, md5(s) as gh
            from (select doc_id, unnest(sh) as s from sets)) c
      join bench b on c.gh = b.gh
      group by c.doc_id
    ),
    tot as (select doc_id, len(sh) as n_grams from sets)
    select t.doc_id,
           cast(t.n_grams as bigint) as n_grams,
           cast(coalesce(h.n_hits, 0) as bigint) as n_hits,
           cast(case when t.n_grams > 0
                then (coalesce(h.n_hits, 0) * 1000000) // t.n_grams
                else 0 end as bigint) as overlap_micro,
           (t.n_grams > 0 and
            (coalesce(h.n_hits, 0) * 1000000) // t.n_grams
              >= {_CONTAM_THRESHOLD_MICRO}) as contaminated
    from tot t left join hits h on t.doc_id = h.doc_id
    order by t.doc_id
    """,
)
def doc_contamination_fraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GPT-3/PaLM-style contamination FRACTION: for every corpus
    document, the share of its distinct word 5-grams that appear in the
    held-out benchmark split (doc_id % {mod} == {res}), with the
    dirty-document rule `overlap >= 20%` (GPT-3 appendix C flags docs by
    gram overlap rather than any-hit). Complements
    ``doc_decontamination`` (any-hit flag) and
    ``doc_decontamination_passages`` (chunk membership): the fraction is
    what lets a pipeline DROP aggressively at high overlap and merely
    audit at low overlap. The fraction is integer-exact
    (hits·10⁶ div grams).

    Shape: one corpus pass — per-doc gram count and the exploded gram
    stream come from the same shingle projection; the benchmark's
    distinct gram hashes broadcast onto the corpus stream (at
    production bench size the size-gated membership fallback applies —
    operators/dedup.py:membership_semi_join); per-doc hit counts
    aggregate on doc_id. 16-byte digests flow, never gram text."""
    from idh_etl_demo_spark.operators.dedup import word_shingles

    docs = _t(spark, sf_dir, "documents")
    par = spark.sparkContext.defaultParallelism

    bench = (
        docs.filter(F.col("doc_id") % _CONTAM_MOD == _CONTAM_RES)
        .repartition(par)
        .select(F.explode(word_shingles(F.col("text"), 5)).alias("s"))
        .select(F.md5("s").alias("gh"))
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    # one corpus pass: explode_outer keeps 0-gram docs (empty/short
    # text) with a null gram, which can never match, so they aggregate
    # to n_hits=0 without a second shingle branch or totals join
    ex = (
        docs.filter(F.col("doc_id") % _CONTAM_MOD != _CONTAM_RES)
        .repartition(par)
        .select("doc_id", word_shingles(F.col("text"), 5).alias("sh"))
        .select(
            "doc_id",
            F.size("sh").cast("long").alias("n_grams"),
            F.explode_outer("sh").alias("s"),
        )
        .select("doc_id", "n_grams", F.md5("s").alias("gh"))
    )
    agg = (
        ex.join(F.broadcast(bench), ["gh"], "left")
        .groupBy("doc_id", "n_grams")
        .agg(F.sum(F.coalesce(F.col("hit"), F.lit(0))).cast("long").alias("n_hits"))
    )
    micro = F.when(
        F.col("n_grams") > 0,
        F.expr("(n_hits * 1000000) div n_grams"),
    ).otherwise(F.lit(0)).cast("long")
    return agg.select(
        "doc_id",
        "n_grams",
        "n_hits",
        micro.alias("overlap_micro"),
        ((F.col("n_grams") > 0) & (micro >= _CONTAM_THRESHOLD_MICRO)).alias(
            "contaminated"
        ),
    ).orderBy("doc_id")


# ===========================================================================
# PQ serving audit: recall@5 of ADC vs the exact cosine truth
# ===========================================================================


def _pq_recall_sql() -> str:
    # module import registers embedding_cosine_topk when catalog_r8 is
    # imported directly (outside __spark_entry__'s fixed module order)
    import idh_etl_demo_spark.catalog_llm  # noqa: F401
    from idh_etl_demo_spark.catalog import ENTRIES

    topk = ENTRIES["embedding_cosine_topk"].oracle
    return f"""
    with {_pq_all_ctes()},
    fv as (select vec_id, {_QUANT} as v from embeddings),
    {_PQ_SQL_COMBOS},
    q as (
      select vec_id as query_id,
             list_slice(v, 1, {_PQ_DIM}) as q1,
             list_slice(v, {_PQ_SUBS[1][1]}, 64) as q2,
             list_dot_product(v, v) as qq
      from fv where vec_id % 25 = 0
    ),
    qscore as (
      select query_id, code1, code2,
             (list_dot_product(q1, c1v) + list_dot_product(q2, c2v))
               / (sqrt(qq) * sqrt(rr)) as adc_cosine
      from q cross join combos
    ),
    approx as (
      select query_id, neighbor_id from (
        select s.query_id, c.vec_id as neighbor_id,
               row_number() over (partition by s.query_id
                                  order by adc_cosine desc, c.vec_id asc) as rn
        from codes c join qscore s on c.code1 = s.code1 and c.code2 = s.code2
        where c.vec_id != s.query_id
      ) where rn <= 5
    ),
    truth as materialized (select query_id, neighbor_id from ({topk})),
    hits as (select * from approx intersect select * from truth)
    select t.query_id,
           cast(t.n as bigint) as n_truth,
           cast(coalesce(h.n, 0) as bigint) as n_hits,
           cast(coalesce(h.n, 0) as double) / t.n as recall_at_5
    from (select query_id, count(*) as n from truth group by query_id) t
    left join (select query_id, count(*) as n from hits group by query_id) h
      using (query_id)
    order by t.query_id
    """


@query("embedding_pq_recall_audit", _pq_recall_sql())
def embedding_pq_recall_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ-SERVING AUDIT — per-query recall@5 of flat ADC search against
    the exact fixed-point cosine truth (``embedding_cosine_topk``'s
    verbatim plan): the number that decides whether ~32×-compressed
    2-code vectors can serve retrieval, measured per query BEFORE anyone
    swaps the flat index out at scale. The int8 audit
    (``embedding_int8_ann_recall``) prices 4× compression; this prices
    the far harsher PQ trade, and recall < 1 is the measurement — it is
    exactly the neighbors two 4-codeword codebooks cannot separate.

    Engine-exact for the same reasons as the search entry: ADC cosine is
    one double division of exact integer dots, so both engines rank
    identically and the driver hash gates every (query, n_hits) pair.

    Scale shape: the approx side is the search entry's plan (broadcast
    |Q|·k² score table, no corpus shuffle beyond the top-k window); the
    truth side is the brute-force scan every recall audit pays by
    design, run on a sampled query set at production scale."""
    from idh_etl_demo_spark.catalog_llm import embedding_cosine_topk

    codes, cents1, cents2 = _pq_encoded(spark, sf_dir)
    scored = _adc_scored(codes, cents1, cents2)
    w = Window.partitionBy("query_id").orderBy(
        F.desc("adc_cosine"), F.asc("neighbor_id")
    )
    approx = (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .select("query_id", "neighbor_id")
    )
    truth = embedding_cosine_topk(spark, sf_dir).select("query_id", "neighbor_id")
    hits = approx.intersect(truth)
    t_n = truth.groupBy("query_id").agg(F.count(F.lit(1)).alias("n_truth"))
    h_n = hits.groupBy("query_id").agg(F.count(F.lit(1)).alias("h"))
    return (
        t_n.join(h_n, "query_id", "left")
        .select(
            "query_id",
            "n_truth",
            F.coalesce(F.col("h"), F.lit(0)).alias("n_hits"),
            (
                F.coalesce(F.col("h"), F.lit(0)).cast("double") / F.col("n_truth")
            ).alias("recall_at_5"),
        )
        .orderBy("query_id")
    )
