"""Late round-9 catalog entries: Matryoshka (prefix-dimension) adaptive
retrieval, KMV sketch SET OPERATIONS, the distributed SUFFIX ARRAY
(prefix doubling) with its adjacency dedup audit, Z-ORDER layout
clustering, per-group OLS regression, and integer PAGERANK over the
near-dup graph. Sections in file order; the first two documented here,
the rest at their section banners.

Matryoshka representation learning (Kusupati et al. 2022) trains
embeddings whose leading dimensions carry a usable coarse
representation, so retrieval can scan a PREFIX of each vector and
spend full-dimension arithmetic only on a shortlist ("adaptive" /
funnel retrieval — the MRL paper's deployment story). Two entries:

- ``embedding_matryoshka_recall_audit`` prices the width/recall trade:
  exact prefix-cosine top-5 at widths 8/16/32 vs the full-64-dim truth
  ranking, one scored frame serving every width. On the ISOTROPIC
  synthetic embeddings the short widths recall poorly — random unit
  vectors spread signal evenly across dimensions, so an 8-dim prefix
  is a noisy 1/8 sample of the dot product. That is the honest
  measurement (the residual-IVFPQ lesson, NOTES_r9 §3): the lift
  appears exactly when the representation is Matryoshka-structured,
  which the property test pins by constructing leading-dim-signal
  vectors where width-8 recall is perfect with full oracle parity.
- ``embedding_matryoshka_rerank`` is the serving layout: width-16
  prefix scan → per-query top-25 shortlist → exact full-dimension
  cosine over shortlist rows only (the FAISS-refine shape
  ``embedding_ivfpq_rerank`` uses, with a prefix scan instead of ADC).

KMV set operations (Beyer et al. 2007, "On synopses for distinct-value
estimation under multiset operations") extend the repo's KMV sketches
(``orderkey_distinct_kmv``, ``doc_bottomk_sketch``) from single-set
cardinality to UNION and INTERSECTION estimates: merge two bottom-k
sketches, take the k smallest of the merge, estimate the union from
the k-th minimum and scale by the fraction of those k present in BOTH
sketches. ``events_kmv_set_ops`` sketches each event type's distinct
(user, day) activity set and audits every pairwise estimate against
the exact counts in the same frame.

Engine parity: hashes are the repo's md5-derived 60-bit integers
(functions/hashing.py — identical in Spark and DuckDB); estimators are
single-rounding double expressions over exact integers with identical
association order in both engines, so every value gates bit-exactly.

Entry contract per repo convention: @query registration with a DuckDB
oracle, a shuffle budget in tests/test_plan_shape.py with a
why-comment, a bench.py HEADLINE row, a bench_scale probe or a
documented exclusion, and property tests vs pure-Python references
(tests/test_r9b_properties.py).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from idh_etl_demo_spark.catalog import _t, query
from idh_etl_demo_spark.catalog_llm import _QUANT, _spark_int_dot, _spark_quant
from idh_etl_demo_spark.functions.hashing import md5_long

# Matryoshka prefix widths audited against the full dimension. The
# embeddings tables are 64-dim; widths are powers of two as in the MRL
# paper's nesting (8 ⊂ 16 ⊂ 32 ⊂ 64).
_MRL_WIDTHS = (8, 16, 32)
_MRL_FULL = 64
_MRL_TOPK = 5
# rerank shortlist depth: 5× the final k, the same overfetch ratio the
# IVFPQ rerank entry uses (R=20 over k=5 there; 25 here keeps the
# prefix stage's candidate stream a round 5% of the sf0.01 corpus)
_MRL_SHORTLIST = 25
_MRL_SERVE_W = 16


def _sql_prefix_cos(qv: str, cv: str, w: int | None) -> str:
    """DuckDB cosine over the first ``w`` dims (None = full vector) —
    dot/(sqrt·sqrt) over the ×10⁴-quantized integers, the exact shape
    embedding_cosine_topk gates."""
    if w is None:
        a, b = qv, cv
    else:
        a, b = f"{qv}[1:{w}]", f"{cv}[1:{w}]"
    return (
        f"list_dot_product({a}, {b}) / "
        f"(sqrt(list_dot_product({a}, {a})) * sqrt(list_dot_product({b}, {b})))"
    )


def _spark_prefix_cos(qv: F.Column, cv: F.Column, w: int | None) -> F.Column:
    a = qv if w is None else F.slice(qv, 1, w)
    b = cv if w is None else F.slice(cv, 1, w)
    return _spark_int_dot(a, b) / (
        F.sqrt(_spark_int_dot(a, a)) * F.sqrt(_spark_int_dot(b, b))
    )


def _mrl_scored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(query_id, neighbor_id, cos8, cos16, cos32, cos64): one
    corpus×queries pass computing every audited width — the widths
    share the scan and the broadcast, so auditing 3 prefixes costs one
    extra projection, not three extra scans."""
    emb = _t(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") % 25 == 0).select(
        F.col("vec_id").alias("query_id"),
        _spark_quant(F.col("embedding")).alias("qv"),
    )
    c = emb.repartition(spark.sparkContext.defaultParallelism).select(
        F.col("vec_id").alias("neighbor_id"),
        _spark_quant(F.col("embedding")).alias("cv"),
    )
    cols = [
        _spark_prefix_cos(F.col("qv"), F.col("cv"), w).alias(f"cos{w}")
        for w in _MRL_WIDTHS
    ] + [_spark_prefix_cos(F.col("qv"), F.col("cv"), None).alias(f"cos{_MRL_FULL}")]
    return (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", *cols)
    )


def _mrl_audit_sql() -> str:
    cos_cols = ",\n             ".join(
        f"{_sql_prefix_cos('qv', 'cv', w)} as cos{w}" for w in _MRL_WIDTHS
    )
    full = f"{_sql_prefix_cos('qv', 'cv', None)} as cos{_MRL_FULL}"
    ranks = ",\n             ".join(
        f"row_number() over (partition by query_id order by cos{w} desc, neighbor_id asc) as r{w}"
        for w in (*_MRL_WIDTHS, _MRL_FULL)
    )
    hits = ",\n             ".join(
        f"sum(case when r{w} <= {_MRL_TOPK} and r{_MRL_FULL} <= {_MRL_TOPK} then 1 else 0 end)::bigint as hits{w}"
        for w in _MRL_WIDTHS
    )
    unpivot = "\n      union all ".join(
        f"select {w} as width, hits{w} as hits, possible from agg"
        for w in _MRL_WIDTHS
    )
    return f"""
    with q as (
      select vec_id as query_id, {_QUANT} as qv from embeddings where vec_id % 25 = 0
    ),
    c as (select vec_id as neighbor_id, {_QUANT} as cv from embeddings),
    scored as (
      select query_id, neighbor_id,
             {cos_cols},
             {full}
      from q, c where neighbor_id != query_id
    ),
    ranked as (
      select query_id, neighbor_id,
             {ranks}
      from scored
    ),
    agg as (
      select {hits},
             sum(case when r{_MRL_FULL} <= {_MRL_TOPK} then 1 else 0 end)::bigint as possible
      from ranked
    )
    select width, hits, possible, cast(hits as double) / possible as recall
    from ({unpivot})
    order by width
    """


@query("embedding_matryoshka_recall_audit", _mrl_audit_sql())
def embedding_matryoshka_recall_audit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Matryoshka width/recall audit (Kusupati et al. 2022): exact
    prefix-cosine top-5 at widths 8/16/32 versus the full-64-dim truth
    ranking, reported as hits / possible / recall per width. All four
    rankings come off ONE scored frame — the corpus×queries pass is
    paid once and every width adds only a projection column, so the
    audit costs what a single brute-force top-k entry costs.

    On the isotropic synthetic embeddings short-prefix recall is LOW by
    construction (random unit vectors carry no leading-dim structure —
    an 8-dim prefix is a 1/8 subsample of the dot product), and the
    entry reports that honestly; the property test pins perfect width-8
    recall on Matryoshka-structured vectors where the signal lives in
    the leading dims, with full oracle parity on the same frame
    (tests/test_r9b_properties.py).

    Scale shape: queries broadcast (|Q| = N/25 at the audit's pinned
    selector; a production audit pins |Q| constant), the corpus scan is
    embarrassingly parallel, and the only corpus-keyed exchange is the
    per-query ranking window shared by all four widths (one exchange,
    four sorts over |Q|·N score rows — vectors never shuffle). The
    final unpivot runs on ONE aggregate row."""
    scored = _mrl_scored(spark, sf_dir)
    rcols = [
        F.row_number()
        .over(
            Window.partitionBy("query_id").orderBy(
                F.desc(f"cos{w}"), F.asc("neighbor_id")
            )
        )
        .alias(f"r{w}")
        for w in (*_MRL_WIDTHS, _MRL_FULL)
    ]
    ranked = scored.select("query_id", "neighbor_id", *rcols)
    in_full = F.col(f"r{_MRL_FULL}") <= _MRL_TOPK
    agg = ranked.agg(
        *[
            F.sum(
                F.when((F.col(f"r{w}") <= _MRL_TOPK) & in_full, 1).otherwise(0)
            )
            .cast("long")
            .alias(f"hits{w}")
            for w in _MRL_WIDTHS
        ],
        F.sum(F.when(in_full, 1).otherwise(0)).cast("long").alias("possible"),
    )
    stack_args = ", ".join(
        f"cast({w} as int), hits{w}" for w in _MRL_WIDTHS
    )
    out = agg.selectExpr(
        f"stack({len(_MRL_WIDTHS)}, {stack_args}) as (width, hits)",
        "possible",
    )
    return out.withColumn(
        "recall", F.col("hits").cast("double") / F.col("possible")
    ).orderBy("width")


@query(
    "embedding_matryoshka_rerank",
    f"""
    with q as (
      select vec_id as query_id, {_QUANT} as qv from embeddings where vec_id % 25 = 0
    ),
    c as (select vec_id as neighbor_id, {_QUANT} as cv from embeddings),
    s1 as (
      select query_id, neighbor_id,
             {_sql_prefix_cos('qv', 'cv', _MRL_SERVE_W)} as pcos
      from q, c where neighbor_id != query_id
    ),
    short as (
      select query_id, neighbor_id, prefix_rank from (
        select query_id, neighbor_id,
               row_number() over (partition by query_id
                                  order by pcos desc, neighbor_id asc) as prefix_rank
        from s1
      ) where prefix_rank <= {_MRL_SHORTLIST}
    ),
    ex as (
      select s.query_id, s.neighbor_id, s.prefix_rank,
             {_sql_prefix_cos('q.qv', 'c.cv', None)} as cosine_sim
      from short s
      join q on q.query_id = s.query_id
      join c on c.neighbor_id = s.neighbor_id
    )
    select query_id, neighbor_id, cosine_sim, prefix_rank, rank from (
      select *, row_number() over (partition by query_id
                                   order by cosine_sim desc, neighbor_id asc) as rank
      from ex
    ) where rank <= {_MRL_TOPK}
    order by query_id, rank
    """,
)
def embedding_matryoshka_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adaptive (funnel) retrieval over Matryoshka prefixes — the MRL
    paper's serving layout: a width-16 prefix scan ranks the whole
    corpus cheaply, the per-query top-25 shortlist alone pays
    full-64-dim exact cosine, and the final top-5 is ranked by the
    exact score (prefix_rank rides along to show the reorder). The
    FAISS-refine shape of ``embedding_ivfpq_rerank`` with a prefix scan
    as the cheap stage instead of ADC.

    The 100 TB win needs the storage side: with dimension-sliced
    layouts (an MRL-truncated head copy, or Parquet-sharded dim
    groups) stage 1 READS 16/64ths of the vector bytes. Here both
    stages scan the same array column, so the entry prices the plan
    shape (4× less multiply work in the scan stage, full-dim work
    bounded by |Q|·25) rather than the I/O — disclosed, same as the
    PQ flat-scan memory-bound disclosure.

    Scale shape: stage 1 is the broadcast-queries corpus scan with one
    per-query ranking window over (query_id, neighbor_id, pcos) rows;
    the |Q|·25 shortlist then BROADCASTS back onto the corpus vector
    stream (corpus vectors never shuffle — the ivfpq_rerank exchange
    discipline), and the exact stage's window ranks |Q|·25 rows."""
    emb = _t(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") % 25 == 0).select(
        F.col("vec_id").alias("query_id"),
        _spark_quant(F.col("embedding")).alias("qv"),
    )
    c = emb.repartition(spark.sparkContext.defaultParallelism).select(
        F.col("vec_id").alias("neighbor_id"),
        _spark_quant(F.col("embedding")).alias("cv"),
    )
    s1 = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            _spark_prefix_cos(F.col("qv"), F.col("cv"), _MRL_SERVE_W).alias(
                "pcos"
            ),
        )
    )
    wp = Window.partitionBy("query_id").orderBy(
        F.desc("pcos"), F.asc("neighbor_id")
    )
    short = (
        s1.withColumn("prefix_rank", F.row_number().over(wp).cast("long"))
        .filter(F.col("prefix_rank") <= _MRL_SHORTLIST)
        .select("query_id", "neighbor_id", "prefix_rank")
    )
    ex = (
        c.join(F.broadcast(short), "neighbor_id")
        .join(F.broadcast(q), "query_id")
        .select(
            "query_id",
            "neighbor_id",
            "prefix_rank",
            _spark_prefix_cos(F.col("qv"), F.col("cv"), None).alias(
                "cosine_sim"
            ),
        )
    )
    wf = Window.partitionBy("query_id").orderBy(
        F.desc("cosine_sim"), F.asc("neighbor_id")
    )
    return (
        ex.withColumn("rank", F.row_number().over(wf).cast("long"))
        .filter(F.col("rank") <= _MRL_TOPK)
        .select("query_id", "neighbor_id", "cosine_sim", "prefix_rank", "rank")
        .orderBy("query_id", "rank")
    )


# ===========================================================================
# KMV sketch set operations over event-type activity sets
# ===========================================================================

_KMV_K = 64
# the md5-derived hash domain: 15 hex chars → [0, 16^15) = [0, 2^60)
_KMV_DOMAIN = float(1 << 60)
# phase-1 pre-prune fan: bottom-k per (type, hv % _KMV_BUCKETS) bounds
# the final per-type window's input at k·buckets rows
_KMV_BUCKETS = 16


def _kmv_sql() -> str:
    k = _KMV_K
    return f"""
    with mem as (
      select distinct event_type, user_id, cast(date_trunc('day', ts) as date) as d
      from events
    ),
    hashed as (
      select distinct event_type,
             ('0x' || substring(md5(cast(user_id as varchar) || '|' || strftime(d, '%Y-%m-%d')), 1, 15))::bigint as hv
      from mem
    ),
    sketch as (
      select event_type, hv from (
        select event_type, hv,
               row_number() over (partition by event_type order by hv asc) as r
        from hashed
      ) where r <= {k}
    ),
    cnts as (
      select event_type, count(*)::bigint as cnt from mem group by event_type
    ),
    pairs as (
      select a.event_type as type_a, b.event_type as type_b,
             a.cnt as cnt_a, b.cnt as cnt_b
      from cnts a join cnts b on a.event_type < b.event_type
    ),
    inter as (
      select a.event_type as type_a, b.event_type as type_b,
             count(*)::bigint as exact_intersection
      from mem a
      join mem b on a.user_id = b.user_id and a.d = b.d
                and a.event_type < b.event_type
      group by 1, 2
    ),
    merged as (
      select p.type_a, p.type_b, s.hv,
             max(case when s.event_type = p.type_a then 1 else 0 end) as in_a,
             max(case when s.event_type = p.type_b then 1 else 0 end) as in_b
      from pairs p
      join sketch s on s.event_type in (p.type_a, p.type_b)
      group by p.type_a, p.type_b, s.hv
    ),
    mr as (
      select *,
             row_number() over (partition by type_a, type_b order by hv asc) as r,
             count(*) over (partition by type_a, type_b) as merged_n
      from merged
    ),
    stats as (
      select type_a, type_b,
             cast(least({k}, max(merged_n)) as bigint) as k_used,
             max(case when r = least({k}, merged_n) then hv end) as kth_min_hash,
             sum(case when r <= {k} and in_a = 1 and in_b = 1 then 1 else 0 end)::bigint as shared_in_k,
             max(merged_n)::bigint as merged_n
      from mr group by 1, 2
    ),
    est as (
      select p.type_a, p.type_b, s.k_used, s.kth_min_hash, s.shared_in_k,
             p.cnt_a < {k} and p.cnt_b < {k} as complete,
             s.merged_n,
             case when p.cnt_a < {k} and p.cnt_b < {k}
                  then cast(s.merged_n as double)
                  else cast(s.k_used - 1 as double) * {_KMV_DOMAIN!r} / s.kth_min_hash
             end as est_union,
             p.cnt_a + p.cnt_b - coalesce(i.exact_intersection, 0) as exact_union,
             coalesce(i.exact_intersection, 0) as exact_intersection
      from pairs p
      join stats s on s.type_a = p.type_a and s.type_b = p.type_b
      left join inter i on i.type_a = p.type_a and i.type_b = p.type_b
    )
    select type_a, type_b, k_used, kth_min_hash, shared_in_k,
           est_union,
           case when complete and merged_n <= {k}
                then cast(shared_in_k as double)
                else cast(shared_in_k as double) / k_used * est_union
           end as est_intersection,
           exact_union, exact_intersection
    from est
    order by type_a, type_b
    """


@query("events_kmv_set_ops", _kmv_sql())
def events_kmv_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV sketch set operations (Beyer et al. 2007): per event type,
    sketch the distinct (user, day) activity set as the k=64 smallest
    md5 hashes; for every type pair, merge the two sketches, take the
    k smallest of the merge, and estimate

        union        ≈ (k−1) · |domain| / kth_min_of_merge
        intersection ≈ (shared_in_k / k) · union_est

    where shared_in_k counts merge-bottom-k members present in BOTH
    sketches. Small-set branch (Beyer et al.): when both input sets are
    smaller than k the sketches ARE the sets, so the union "estimate"
    is the exact merged count; if the merge also fits in k (union < k)
    the intersection estimate collapses to the exact count too —
    the property test pins both. The exact union/intersection ride
    along as the audit columns, ``orderkey_distinct_kmv``-style: at
    sf0.01 the ~1600-member sets overlap ~36% and the k=64 estimates
    carry real sketch noise — that error IS the measurement.

    Engine parity: hashes are 60-bit md5 integers; both estimators are
    double expressions over exact ints with one rounding per operator
    in the same association order, so values gate bit-exactly.

    Scale shape: the corpus is touched twice — the distinct-member agg
    (map-side combined, 8-byte-hash rows) feeding the sketches, and the
    exact-audit self-join on (user, day); at 100 TB the audit columns
    swap out and what remains is sketch-sized. Per-type bottom-k is
    two-phase: bottom-k per (type, hv mod 16) first — windows over
    balanced hash buckets — so the final per-type window ranks at
    most k·16 rows per type regardless of corpus size (the
    oracle runs the single-phase rank; phase 1 only prunes rows that
    cannot reach any bottom-k, so results are identical). Everything
    after the sketches is |types|²·k-sized and broadcast."""
    k = _KMV_K
    ev = _t(spark, sf_dir, "events")
    mem = (
        ev.select(
            "event_type", "user_id", F.to_date(F.col("ts")).alias("d")
        )
        .repartition(spark.sparkContext.defaultParallelism)
        .distinct()
    )
    hv = md5_long(
        F.concat_ws(
            "|",
            F.col("user_id").cast("string"),
            F.date_format(F.col("d"), "yyyy-MM-dd"),
        )
    )
    hashed = mem.select("event_type", hv.alias("hv")).distinct()
    # phase 1: bottom-k within balanced hash buckets (bounds the final
    # per-type sort input at k·buckets rows however large the corpus)
    wb = Window.partitionBy("event_type", F.col("hv") % _KMV_BUCKETS).orderBy(
        F.asc("hv")
    )
    pruned = (
        hashed.withColumn("rb", F.row_number().over(wb))
        .filter(F.col("rb") <= k)
        .drop("rb")
    )
    wt = Window.partitionBy("event_type").orderBy(F.asc("hv"))
    sketch = (
        pruned.withColumn("r", F.row_number().over(wt))
        .filter(F.col("r") <= k)
        .drop("r")
    )
    cnts = mem.groupBy("event_type").agg(F.count(F.lit(1)).alias("cnt"))
    ca = cnts.select(
        F.col("event_type").alias("type_a"), F.col("cnt").alias("cnt_a")
    )
    cb = cnts.select(
        F.col("event_type").alias("type_b"), F.col("cnt").alias("cnt_b")
    )
    pairs = ca.join(cb, F.col("type_a") < F.col("type_b"))
    mem_a = mem.select(
        F.col("event_type").alias("type_a"), "user_id", "d"
    )
    mem_b = mem.select(
        F.col("event_type").alias("type_b"),
        F.col("user_id").alias("ub"),
        F.col("d").alias("db"),
    )
    inter = (
        mem_a.join(
            mem_b,
            (F.col("user_id") == F.col("ub"))
            & (F.col("d") == F.col("db"))
            & (F.col("type_a") < F.col("type_b")),
        )
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).alias("exact_intersection"))
    )
    merged = (
        sketch.join(
            F.broadcast(pairs.select("type_a", "type_b")),
            (F.col("event_type") == F.col("type_a"))
            | (F.col("event_type") == F.col("type_b")),
        )
        .groupBy("type_a", "type_b", "hv")
        .agg(
            F.max(
                F.when(F.col("event_type") == F.col("type_a"), 1).otherwise(0)
            ).alias("in_a"),
            F.max(
                F.when(F.col("event_type") == F.col("type_b"), 1).otherwise(0)
            ).alias("in_b"),
        )
    )
    wpair = Window.partitionBy("type_a", "type_b")
    mr = merged.withColumn(
        "r", F.row_number().over(wpair.orderBy(F.asc("hv")))
    ).withColumn("merged_n", F.count(F.lit(1)).over(wpair))
    stats = mr.groupBy("type_a", "type_b").agg(
        F.least(F.lit(k), F.max("merged_n")).cast("long").alias("k_used"),
        F.max(
            F.when(
                F.col("r") == F.least(F.lit(k), F.col("merged_n")),
                F.col("hv"),
            )
        ).alias("kth_min_hash"),
        F.sum(
            F.when(
                (F.col("r") <= k) & (F.col("in_a") == 1) & (F.col("in_b") == 1),
                1,
            ).otherwise(0)
        )
        .cast("long")
        .alias("shared_in_k"),
        F.max("merged_n").cast("long").alias("merged_n"),
    )
    est = (
        pairs.join(F.broadcast(stats), ["type_a", "type_b"])
        .join(F.broadcast(inter), ["type_a", "type_b"], "left")
        .select(
            "type_a",
            "type_b",
            "k_used",
            "kth_min_hash",
            "shared_in_k",
            ((F.col("cnt_a") < k) & (F.col("cnt_b") < k)).alias("complete"),
            "merged_n",
            F.when(
                (F.col("cnt_a") < k) & (F.col("cnt_b") < k),
                F.col("merged_n").cast("double"),
            )
            .otherwise(
                (F.col("k_used") - 1).cast("double")
                * F.lit(_KMV_DOMAIN)
                / F.col("kth_min_hash")
            )
            .alias("est_union"),
            (
                F.col("cnt_a")
                + F.col("cnt_b")
                - F.coalesce(F.col("exact_intersection"), F.lit(0))
            )
            .cast("long")
            .alias("exact_union"),
            F.coalesce(F.col("exact_intersection"), F.lit(0))
            .cast("long")
            .alias("exact_intersection"),
        )
    )
    return est.select(
        "type_a",
        "type_b",
        "k_used",
        "kth_min_hash",
        "shared_in_k",
        "est_union",
        F.when(
            F.col("complete") & (F.col("merged_n") <= k),
            F.col("shared_in_k").cast("double"),
        )
        .otherwise(
            F.col("shared_in_k").cast("double")
            / F.col("k_used")
            * F.col("est_union")
        )
        .alias("est_intersection"),
        "exact_union",
        "exact_intersection",
    ).orderBy("type_a", "type_b")


# ===========================================================================
# Distributed suffix array (prefix doubling) + the SA-route duplication
# audit — Lee et al. 2021's exact-substring primitive, built natively
# ===========================================================================
#
# doc_duplicated_spans (catalog_r9) re-expresses Lee et al.'s
# suffix-array substring dedup as rolling-window hashes. These entries
# build the SUFFIX ARRAY ITSELF — prefix doubling, log(max_len)
# rounds of id-keyed joins + two-phase global ranks
# (operators/suffix.py) — and then re-derive the duplicated-window
# verdict from suffix-array ADJACENCY. Both entries' oracles use a
# COMPLETELY different algorithm (DuckDB sorts the suffix lists
# directly / counts window hashes), so agreement gates the doubling
# loop end to end.

# The suffix-array build is eager (per-round localCheckpoint, the
# CC-fixpoint convention) — memoize per (session, sf) so the array,
# its adjacency audit, and the LCP consumer share one build. Value:
# (final, history, pos) as returned by operators.suffix.suffix_ranks.
# bench.py clears this per rep (SESSION_CACHED).
_SA_MODELS: dict[tuple[str, str], tuple] = {}

_SA_L = 8  # duplicated-window length, = catalog_r9._SPAN_L


def _sa_base(spark: SparkSession, sf_dir: str) -> DataFrame:
    from idh_etl_demo_spark.operators.text import tokens

    docs = _t(spark, sf_dir, "documents")
    return docs.repartition(spark.sparkContext.defaultParallelism).select(
        "doc_id", tokens(F.col("text")).alias("toks")
    )


def _sa_parts(spark: SparkSession, sf_dir: str) -> tuple:
    from idh_etl_demo_spark.operators.suffix import suffix_ranks

    key = (spark.sparkContext.applicationId, sf_dir)
    if key not in _SA_MODELS:
        _SA_MODELS[key] = suffix_ranks(_sa_base(spark, sf_dir))
    return _SA_MODELS[key]


def _sa_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _sa_parts(spark, sf_dir)[0]


_SA_TOKS_SQL = (
    "list_filter(string_split(regexp_replace(lower(trim(text)), "
    "'\\s+', ' ', 'g'), ' '), w -> w != '')"
)


@query(
    "doc_suffix_array",
    f"""
    with base as (select doc_id, {_SA_TOKS_SQL} as toks from documents),
    pos as (
      select doc_id, u.i - 1 as pos, list_slice(toks, u.i, len(toks)) as suffix
      from base cross join lateral (
        select unnest(generate_series(1, len(toks))) as i
      ) u
    )
    select doc_id, pos, sa_rank from (
      select doc_id, pos,
             row_number() over (order by suffix, doc_id, pos) as sa_rank
      from pos
    ) where doc_id % 25 = 0
    order by doc_id, pos
    """,
)
def doc_suffix_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus suffix array over token-level suffixes, built by
    distributed PREFIX DOUBLING (operators/suffix.py; Manber & Myers
    1990, the primitive Lee et al. 2021 build for exact-substring
    dedup). Output: every suffix position of the doc_id % 25 == 0
    subset with its 1-based rank in the lexicographic order of ALL
    corpus suffixes (ties between identical cross-document suffixes
    broken by (doc_id, pos)) — the subset keeps the gated frame
    compact while every rank still depends on the entire corpus.

    The oracle sorts the suffix LISTS directly (DuckDB list comparison
    is elementwise with prefix-first semantics — exactly the −1
    sentinel order the doubling loop uses), so two entirely different
    algorithms must produce identical ranks.

    Scale shape: log(max_len) rounds (7 at the corpus's 100-token max,
    at ANY corpus size), each one id-keyed equi-join plus the
    two-phase bucketed dense rank — suffixes are never materialized,
    only (doc_id, pos, rank) rows flow, and no round funnels the
    corpus through one partition. Eager per-round checkpoints; the
    built array is memoized per (session, sf) and shared with the
    adjacency audit."""
    sa = _sa_frame(spark, sf_dir)
    return (
        sa.filter(F.col("doc_id") % 25 == 0)
        .select("doc_id", "pos", "sa_rank")
        .orderBy("doc_id", "pos")
    )


@query(
    "doc_suffix_dup_audit",
    f"""
    with base as (select doc_id, {_SA_TOKS_SQL} as toks from documents),
    tot as (select doc_id, len(toks) as n_tokens from base),
    grams as (
      select doc_id, u.i - 1 as pos,
             md5(array_to_string(list_slice(toks, u.i, u.i + {_SA_L} - 1), ' ')) as gh
      from base cross join lateral (
        select unnest(generate_series(1, greatest(len(toks) - {_SA_L} + 1, 0))) as i
      ) u
    ),
    dup as (
      select doc_id, pos from (
        select doc_id, pos, count(*) over (partition by gh) as c from grams
      ) where c >= 2
    ),
    perdoc as (select doc_id, count(*) as cnt from dup group by doc_id)
    select t.doc_id,
           cast(t.n_tokens as bigint) as n_tokens,
           cast(coalesce(p.cnt, 0) as bigint) as dup_starts
    from tot t left join perdoc p on t.doc_id = p.doc_id
    order by t.doc_id
    """,
)
def doc_suffix_dup_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicated-window detection via SUFFIX-ARRAY ADJACENCY — the
    cross-validation of ``doc_duplicated_spans``'s rolling-hash route
    by Lee et al.'s original algorithm: an {L}-token window is
    duplicated iff some other suffix shares its {L}-prefix, iff its
    suffix-array NEIGHBOR (previous or next rank) does — suffixes with
    a common prefix are CONTIGUOUS in the array, so only adjacent
    pairs ever need comparing. Per doc: token count + number of
    duplicated {L}-window starts.

    The oracle computes the same verdict by brute hash counting
    (window md5 occurring ≥ 2×, the duplicated_spans `occ` logic);
    the Spark side never counts — it reads duplication off the sorted
    order. Two independent algorithms, bit-identical answers.

    Scale shape: the {L}-gram hash per position is a map-side
    projection (16-byte gh rides the id rows); neighbor lookup is two
    equi-joins on sa_rank ± 1 (id-width rows, never text); the rest is
    one per-doc count and a broadcast of the per-doc totals. The
    suffix array itself is the memoized prefix-doubling build shared
    with ``doc_suffix_array``."""
    sa = _sa_frame(spark, sf_dir)
    base = _sa_base(spark, sf_dir)
    tot = base.select(
        "doc_id", F.size("toks").cast("long").alias("n_tokens")
    )
    gh8 = base.select(
        "doc_id",
        F.posexplode(
            F.when(
                F.size("toks") >= _SA_L,
                F.transform(
                    F.sequence(F.lit(1), F.size("toks") - _SA_L + 1),
                    lambda i: F.md5(
                        F.concat_ws(" ", F.slice(F.col("toks"), i, _SA_L))
                    ),
                ),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("pos", "gh"),
    ).select("doc_id", F.col("pos").cast("long").alias("pos"), "gh")
    s = sa.join(gh8, ["doc_id", "pos"], "left")  # gh null past len-L
    prv = s.select((F.col("sa_rank") + 1).alias("sa_rank"), F.col("gh").alias("gh_prev"))
    nxt = s.select((F.col("sa_rank") - 1).alias("sa_rank"), F.col("gh").alias("gh_next"))
    marked = (
        s.join(prv, "sa_rank", "left")
        .join(nxt, "sa_rank", "left")
        .select(
            "doc_id",
            (
                F.col("gh").isNotNull()
                & (
                    (F.col("gh") == F.col("gh_prev"))
                    | (F.col("gh") == F.col("gh_next"))
                )
            ).alias("dup"),
        )
    )
    perdoc = marked.filter("dup").groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    return (
        tot.join(F.broadcast(perdoc), "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            F.coalesce(F.col("cnt"), F.lit(0)).cast("long").alias("dup_starts"),
        )
        .orderBy("doc_id")
    )


# ===========================================================================
# Z-order (Morton curve) layout clustering — multi-dimensional data
# skipping, measured
# ===========================================================================
#
# At 100 TB, scan cost on selective multi-dimensional predicates is
# decided by LAYOUT, not compute: parquet files are skipped from
# min/max footer stats, and a file sorted by ONE key bounds only that
# key's range per file. Interleaving the bits of both keys (the
# Z-order / Morton curve — the layout behind Delta's and Iceberg's
# OPTIMIZE ZORDER) bounds EVERY interleaved dimension's span per
# range-bucket at ~range/sqrt(buckets) each, so predicates on either
# (or both) keys skip. This entry computes the curve exactly and
# MEASURES the claim: per-bucket (customer span, date span) under the
# z-order layout vs a linear single-key layout, over the same orders.

_Z_BITS = 16
_Z_BUCKETS = 64  # 2^6 → the curve alternates 3 bucket bits per dim


def _z_interleave_spark(cx: F.Column, cd: F.Column) -> F.Column:
    z = F.lit(0).cast("long")
    for b in range(_Z_BITS):
        z = (
            z
            + F.shiftleft(F.shiftright(cx, b).bitwiseAND(F.lit(1)), 2 * b)
            + F.shiftleft(
                F.shiftright(cd, b).bitwiseAND(F.lit(1)), 2 * b + 1
            )
        )
    return z


def _z_interleave_sql(cx: str, cd: str) -> str:
    terms = []
    for b in range(_Z_BITS):
        terms.append(f"((({cx} >> {b}) & 1) << {2 * b})")
        terms.append(f"((({cd} >> {b}) & 1) << {2 * b + 1})")
    return " + ".join(terms)


def _zorder_sql() -> str:
    scale = (1 << _Z_BITS) - 1
    zdiv = (1 << (2 * _Z_BITS)) // _Z_BUCKETS
    ldiv = (1 << _Z_BITS) // _Z_BUCKETS
    return f"""
    with src as (
      select o_custkey as ck,
             datediff('day', timestamp '1970-01-01', o_orderdate) as d
      from orders
    ),
    ext as (
      select min(ck) as minck, max(ck) as maxck,
             min(d) as mind, max(d) as maxd
      from src
    ),
    norm as (
      select ck, d,
             ((ck - minck) * {scale}) // greatest(maxck - minck, 1) as nx,
             ((d - mind) * {scale}) // greatest(maxd - mind, 1) as nd
      from src, ext
    ),
    keyed as (
      select ck, d, {_z_interleave_sql('nx', 'nd')} as z, nx from norm
    ),
    zb as (
      select 'zorder' as layout, z // {zdiv} as bucket,
             count(*) as n,
             max(ck) - min(ck) as ck_span,
             max(d) - min(d) as date_span
      from keyed group by 2
    ),
    lb as (
      select 'linear' as layout, nx // {ldiv} as bucket,
             count(*) as n,
             max(ck) - min(ck) as ck_span,
             max(d) - min(d) as date_span
      from keyed group by 2
    )
    select layout, cast(bucket as bigint) as bucket, cast(n as bigint) as n,
           cast(ck_span as bigint) as ck_span,
           cast(date_span as bigint) as date_span
    from (select * from zb union all select * from lb)
    order by layout, bucket
    """


@query("orders_zorder_layout", _zorder_sql())
def orders_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton curve) layout clustering, measured: normalize
    (o_custkey, order day) to 16 bits each, interleave the bits into a
    32-bit curve key (exact integer arithmetic — Spark's shift/mask
    equals DuckDB's operator-for-operator), range-bucket the curve
    into 64 cells, and report each bucket's row count and BOTH
    dimensions' min/max spans — side by side with the same stats for
    a linear single-key layout over the same rows. The measurement IS
    the layout claim: the curve alternates bucket bits between
    dimensions, so 64 z-buckets bound customers AND dates at ~1/8 of
    their ranges each, while 64 linear buckets bound customers at
    1/64 and leave dates unbounded (full span). The property test
    pins both bounds against a pure-Python twin
    (tests/test_r9b_properties.py).

    At 100 TB this is the write-side twin of predicate pushdown:
    `repartitionByRange(zkey)` + parquet write gives every file footer
    tight min/max on every interleaved dimension, so selective
    predicates on ANY of them skip files (the layout behind Delta /
    Iceberg OPTIMIZE ZORDER; Morton 1966). The entry keeps the stats
    query engine-portable — no writes — but the bucket column is
    exactly the range-partition id such a write would use.

    Scale shape: one extrema aggregate broadcast back onto the scan
    (the normalizing projection and the 32-term interleave are pure
    expressions), two map-side-combined groupBys over 64-key buckets,
    and the presentation sort. Nothing wider than the scan itself."""
    scale = (1 << _Z_BITS) - 1
    zdiv = (1 << (2 * _Z_BITS)) // _Z_BUCKETS
    ldiv = (1 << _Z_BITS) // _Z_BUCKETS
    orders = _t(spark, sf_dir, "orders")
    src = orders.repartition(spark.sparkContext.defaultParallelism).select(
        F.col("o_custkey").alias("ck"),
        F.datediff(F.col("o_orderdate"), F.lit("1970-01-01").cast("date"))
        .cast("long")
        .alias("d"),
    )
    ext = src.agg(
        F.min("ck").alias("minck"),
        F.max("ck").alias("maxck"),
        F.min("d").alias("mind"),
        F.max("d").alias("maxd"),
    )
    norm = src.crossJoin(F.broadcast(ext)).select(
        "ck",
        "d",
        F.expr(f"((ck - minck) * {scale}) div greatest(maxck - minck, 1)").alias(
            "nx"
        ),
        F.expr(f"((d - mind) * {scale}) div greatest(maxd - mind, 1)").alias(
            "nd"
        ),
    )
    keyed = norm.select(
        "ck",
        "d",
        "nx",
        _z_interleave_spark(F.col("nx"), F.col("nd")).alias("z"),
    )

    def stats(df: DataFrame, layout: str, bucket: F.Column) -> DataFrame:
        return (
            df.withColumn("bucket", bucket.cast("long"))
            .groupBy("bucket")
            .agg(
                F.count(F.lit(1)).alias("n"),
                (F.max("ck") - F.min("ck")).cast("long").alias("ck_span"),
                (F.max("d") - F.min("d")).cast("long").alias("date_span"),
            )
            .select(F.lit(layout).alias("layout"), "bucket", "n", "ck_span", "date_span")
        )

    zb = stats(keyed, "zorder", F.expr(f"z div {zdiv}"))
    lb = stats(keyed, "linear", F.expr(f"nx div {ldiv}"))
    return zb.unionAll(lb).orderBy("layout", "bucket")


# ===========================================================================
# Per-group OLS regression in exact cents — in-engine feature computation
# ===========================================================================


@query(
    "customer_price_trend",
    """
    with src as (
      select o_custkey,
             datediff('day', timestamp '1970-01-01', o_orderdate) as x,
             cast(round(o_totalprice * 100, 0) as bigint) as y
      from orders
    ),
    sums as (
      select o_custkey,
             count(*)::bigint as n,
             sum(x)::bigint as sx, sum(y)::bigint as sy,
             sum(x * x)::bigint as sxx, sum(x * y)::bigint as sxy
      from src group by o_custkey
    )
    select o_custkey, n,
           case when n * sxx - sx * sx = 0 then null
                else cast(n * sxy - sx * sy as double)
                     / cast(n * sxx - sx * sx as double)
           end as slope_cents_per_day,
           case when n * sxx - sx * sx = 0 then null
                else (cast(sy as double)
                      - (cast(n * sxy - sx * sy as double)
                         / cast(n * sxx - sx * sx as double))
                        * cast(sx as double))
                     / cast(n as double)
           end as intercept_cents
    from sums
    order by o_custkey
    """,
)
def customer_price_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer ordinary-least-squares price trend — in-engine
    feature computation (the grouped-regression primitive feature
    pipelines run at scale, e.g. Spark MLlib's summarizer path, done
    here as pure SQL aggregation): slope and intercept of total price
    (in CENTS — ``round(price·100)`` is the repo's ×10⁴-quantization
    argument at ×100) over order day, from the closed-form normal
    equations

        slope = (n·Σxy − Σx·Σy) / (n·Σxx − Σx²)

    with every sum an exact int64 (n·Σxy ≤ ~7·10¹³ on this data, well
    under 2⁵³ — the BM25 bound-checking discipline applies), so the
    two divisions are single-rounding doubles with identical
    association order in both engines: bit-exact slopes. Degenerate
    groups (all orders the same day) yield NULL in both engines.

    Scale shape: ONE map-side-combined groupBy over (custkey) carrying
    five integer sums — the regression never sees individual rows
    after the partial aggregate, exactly how a 100 TB feature job
    should compute per-entity trends. No window, no join, no second
    pass."""
    orders = _t(spark, sf_dir, "orders")
    src = orders.repartition(spark.sparkContext.defaultParallelism).select(
        "o_custkey",
        F.datediff(F.col("o_orderdate"), F.lit("1970-01-01").cast("date"))
        .cast("long")
        .alias("x"),
        F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("y"),
    )
    sums = src.groupBy("o_custkey").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    den = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    slope = num.cast("double") / den.cast("double")
    return sums.select(
        "o_custkey",
        "n",
        F.when(den == 0, F.lit(None).cast("double"))
        .otherwise(slope)
        .alias("slope_cents_per_day"),
        F.when(den == 0, F.lit(None).cast("double"))
        .otherwise(
            (F.col("sy").cast("double") - slope * F.col("sx").cast("double"))
            / F.col("n").cast("double")
        )
        .alias("intercept_cents"),
    ).orderBy("o_custkey")


# ===========================================================================
# Integer PageRank over the near-dup candidate graph — link analysis
# ===========================================================================
#
# Floating-point PageRank cannot gate against an oracle (cross-row sum
# order differs between engines), so this is the DETERMINISTIC integer
# variant: ranks in millionths, damping 0.85 applied as one floor
# division per edge contribution —
#
#     r_{t+1}(v) = 150_000 + Σ_{u ∈ N(v)} (850 · r_t(u)) // (1000 · deg(u))
#
# Integer sums are order-independent, so both engines agree exactly.
# Two unrolled iterations (the embedding_kmeans_2iter convention) over
# the UNDIRECTED simhash-60 near-dup graph (the catalog's densest dup
# graph — degrees 1..146 at sf0.01, so ranks genuinely spread): high
# rank = a document similar to many well-connected documents — the
# template/boilerplate HUBS of a duplication cluster, which a
# keep-one-per-cluster policy should prefer to drop first.

_PR_BASE = 150_000  # (1 − d) · 10⁶
_PR_DAMP = 850  # d · 10³

# The banded simhash-60 candidate pair table, frozen per (session, sf)
# with an eager localCheckpoint — the near-dup INDEX build, same
# train→freeze→serve pattern as the quantizer memos (_RES_MODELS /
# _PQ_MODELS / _KM_MODELS): a production pipeline builds the dup graph
# once and serves centrality / clustering / keep-policies from it many
# times. The chain is 16.8 s of doc_dup_pagerank's 17.4 s sf0.1 cold
# cost (r9 measured attribution) while the two Pregel steps add <1 s;
# bench.py discloses the cold (index-building) rep separately in its
# per-query artifact, and _clear_session_caches releases + clears this
# memo with the model dicts.
_SIM60_PAIRS: dict[tuple[str, str], DataFrame] = {}


def _sim60_pairs_frozen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(id_a, id_b) simhash-60/6-block pairs at Hamming ≤ 5, built by
    the pigeonhole banding operator (never all-pairs) and frozen so
    every downstream consumer references VALUES instead of re-expanding
    the fingerprint + bucket chain per plan reference."""
    key = (spark.sparkContext.applicationId, sf_dir)
    if key not in _SIM60_PAIRS:
        from idh_etl_demo_spark.operators.dedup import simhash_hamming_pairs

        _SIM60_PAIRS[key] = (
            simhash_hamming_pairs(
                _t(spark, sf_dir, "documents"), bits=60, blocks=6, max_hamming=5
            )
            .select("id_a", "id_b")
            .localCheckpoint(eager=True)
        )
    return _SIM60_PAIRS[key]


def _pagerank_sql() -> str:
    from idh_etl_demo_spark.catalog_llm import _simhash_cte

    return f"""
    with {_simhash_cte(bits=60)},
    cand as (
      select a.doc_id as id_a, b.doc_id as id_b
      from sims a join sims b on a.doc_id < b.doc_id
      where bit_count(xor(a.simhash, b.simhash)) <= 5
    ),
    edges as (
      select id_a as src, id_b as dst from cand
      union all
      select id_b as src, id_a as dst from cand
    ),
    deg as (select src as node, count(*)::bigint as deg from edges group by src),
    in1 as (
      select e.dst as node,
             sum(({_PR_DAMP} * 1000000) // (1000 * d.deg))::bigint as inflow
      from edges e join deg d on d.node = e.src
      group by e.dst
    ),
    rank1 as (
      select doc_id, coalesce(d.deg, 0) as deg,
             {_PR_BASE} + coalesce(i.inflow, 0) as r1
      from documents
      left join deg d on d.node = doc_id
      left join in1 i on i.node = doc_id
    ),
    in2 as (
      select e.dst as node,
             sum(({_PR_DAMP} * rk.r1) // (1000 * d.deg))::bigint as inflow
      from edges e
      join deg d on d.node = e.src
      join rank1 rk on rk.doc_id = e.src
      group by e.dst
    )
    select rk.doc_id, rk.deg, cast(rk.r1 as bigint) as r1,
           cast({_PR_BASE} + coalesce(i.inflow, 0) as bigint) as r2
    from rank1 rk left join in2 i on i.node = rk.doc_id
    order by rk.doc_id
    """


@query("doc_dup_pagerank", _pagerank_sql())
def doc_dup_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Integer PageRank (2 unrolled iterations, damping 0.85 as floor
    divisions — see module comment) over the simhash-60 near-dup
    graph: link-analysis centrality joining the dup-graph family
    (components, k-core, triangles, 4-cliques) with the measure that
    ranks WITHIN a component — boilerplate hubs score high, leaf
    near-dups stay near the 150000 base. Isolated documents keep rank
    150000 with degree 0 at every step, in both engines. (The
    MinHash+LSH candidate graph was the first edge source tried; at
    the test SFs it is all disjoint pairs — every ranked node lands on
    one value. The simhash-60 graph's 1..146 degree spread makes the
    centrality measurement real; the property test pins the hub
    ordering on a constructed star graph too.)

    Engine parity: integer edge contributions ((850·r) // (1000·deg),
    all positive — DuckDB's floor // and Spark's `div` agree) make the
    per-node sums order-independent, which is exactly why this variant
    exists: double-precision PageRank cannot hash-gate across engines.

    Scale shape: edges come from the banded simhash operator (the
    Manku 6-block pigeonhole — never all-pairs; the oracle's brute
    join is oracle-only), built once per (session, sf) and FROZEN via
    _sim60_pairs_frozen — the dup-graph index build, disclosed as the
    entry's cold cost; each iteration is then one edge-keyed equi-join
    plus a map-side-combined groupBy on dst — the textbook Pregel step
    as DataFrames, unrolled twice so the plan stays static (the
    iterative form would checkpoint per round like the CC fixpoint).
    Rank values stay ~10⁶-scale under mass conservation; 850·r ≤
    ~10¹² keeps int64 headroom of a thousand even on degree-million
    graphs."""
    from idh_etl_demo_spark.operators.graph import integer_pagerank

    cand = _sim60_pairs_frozen(spark, sf_dir)
    nodes = _t(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("id")
    )
    ranked = integer_pagerank(
        nodes, cand, iterations=2, base=_PR_BASE, damp=_PR_DAMP
    )
    return ranked.select(
        F.col("id").alias("doc_id"), "deg", "r1", "r2"
    ).orderBy("doc_id")


@query(
    "doc_longest_dup_run",
    f"""
    with base as (select doc_id, {_SA_TOKS_SQL} as toks from documents),
    tot as (select doc_id, len(toks) as n_tokens from base),
    pos as (
      select doc_id, u.i - 1 as pos, list_slice(toks, u.i, len(toks)) as suffix
      from base cross join lateral (
        select unnest(generate_series(1, len(toks))) as i
      ) u
    ),
    ranked as (
      select doc_id, pos, suffix,
             row_number() over (order by suffix, doc_id, pos) as rk
      from pos
    ),
    adj as (
      select a.doc_id, a.suffix as s1, b.suffix as s2
      from ranked a join ranked b on b.rk = a.rk + 1
      union all
      select a.doc_id, a.suffix, c.suffix
      from ranked a join ranked c on c.rk = a.rk - 1
    ),
    lcps as (
      select doc_id,
             coalesce(
               nullif(
                 list_position(
                   list_transform(generate_series(1, least(len(s1), len(s2))),
                                  i -> s1[i] = s2[i]),
                   false),
                 0) - 1,
               least(len(s1), len(s2))
             ) as lcp
      from adj
    ),
    perdoc as (select doc_id, max(lcp) as longest from lcps group by doc_id)
    select t.doc_id, cast(t.n_tokens as bigint) as n_tokens,
           cast(coalesce(p.longest, 0) as bigint) as longest_dup_run
    from tot t left join perdoc p on t.doc_id = p.doc_id
    order by t.doc_id
    """,
)
def doc_longest_dup_run(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest duplicated token run per document — the LCP half of the
    Lee et al. 2021 suffix-array toolchain (``doc_suffix_dup_audit``
    flags fixed-length duplication; this measures the MAXIMAL length):
    for every document, the longest run of tokens that appears
    verbatim anywhere else in the corpus (another document, or the
    same document at a different position). By the classic
    suffix-array property this is the per-doc max over ADJACENT-rank
    LCPs, and the LCP of an adjacent pair is recovered from the
    prefix-doubling RANK HISTORY (Manber & Myers 1990): walk the
    checkpointed level tables from the highest prefix length down,
    advancing by L whenever both sides share the level-L class, plus
    one single-token step (operators/suffix.py:suffix_lcp_adjacent) —
    suffixes are never materialized and token arrays never shuffle.

    The oracle computes the same maxima by direct list comparison over
    the sorted suffix lists (first-mismatch position of the zipped
    element equality), so the doubling-walk arithmetic is gated by a
    completely different algorithm, like the rest of the family.

    Scale shape: |pairs| = |positions| − 1 id-width rows through
    log(max_len) + 1 hash equi-joins against checkpointed rank tables;
    per-doc max is one map-side-combined groupBy; the per-doc frame
    broadcasts back onto the doc list. The array build is the shared
    memoized suffix-array model."""
    final, history, posf = _sa_parts(spark, sf_dir)
    from idh_etl_demo_spark.operators.suffix import suffix_lcp_adjacent

    lens = _sa_base(spark, sf_dir).select(
        "doc_id", F.size("toks").cast("long").alias("n_tokens")
    )
    pairs = suffix_lcp_adjacent(final, history, posf, lens)
    sides = pairs.select(F.col("d1").alias("doc_id"), "lcp").unionAll(
        pairs.select(F.col("d2").alias("doc_id"), "lcp")
    )
    perdoc = sides.groupBy("doc_id").agg(F.max("lcp").alias("longest"))
    return (
        lens.join(F.broadcast(perdoc), "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            F.coalesce(F.col("longest"), F.lit(0))
            .cast("long")
            .alias("longest_dup_run"),
        )
        .orderBy("doc_id")
    )


# ===========================================================================
# Deterministic quantile sketch — bottom-k priority sampling
# ===========================================================================
#
# The sketch family's last member: cardinality (KMV/HLL), frequency
# (CMS), membership (Bloom), set ops (KMV merge) — and now QUANTILES.
# approx_percentile / t-digest / Greenwald-Khanna are all
# order-of-arrival dependent, so they can never hash-gate against an
# independent engine. A bottom-k PRIORITY sample can: keep the k rows
# with the smallest md5 row-key priority (a deterministic uniform
# sample — the same rows in any engine, any partitioning, any order),
# estimate nearest-rank quantiles from the sorted sample, and the
# summary is mergeable exactly like KMV (union two samples, keep the
# k smallest priorities).

_QSK_K = 256
_QSK_QS = (0.1, 0.25, 0.5, 0.75, 0.9, 0.99)


@query(
    "lineitem_quantile_sketch",
    f"""
    with src as (
      select cast(round(l_extendedprice * 100, 0) as bigint) as cents,
             ('0x' || substring(md5(cast(l_orderkey as varchar) || '|' ||
                                    cast(l_linenumber as varchar)), 1, 15))::bigint as rk
      from lineitem
    ),
    nn as (select count(*)::bigint as n from src),
    qs as (select unnest(cast({list(_QSK_QS)} as double[])) as q),
    samp as (select cents from src order by rk limit {_QSK_K}),
    sn as (select count(*)::bigint as sample_n from samp),
    sranked as (
      select cents, row_number() over (order by cents) as rn from samp
    ),
    est as (
      select q, sample_n, s.cents as est_cents
      from (select q, sample_n from qs cross join sn) t
      join sranked s
        on s.rn = cast(floor(q * (sample_n - 1)) as bigint) + 1
    ),
    eranked as (
      select cents, row_number() over (order by cents) as rn from src
    ),
    ex as (
      select q, e.cents as exact_cents
      from (select q, n from qs cross join nn) t
      join eranked e on e.rn = cast(floor(q * (n - 1)) as bigint) + 1
    )
    select est.q, sample_n, est_cents, exact_cents,
           est_cents - exact_cents as err_cents
    from est join ex on est.q = ex.q
    order by est.q
    """,
)
def lineitem_quantile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile estimation from a DETERMINISTIC bottom-k priority
    sample (k=256): every engine keeps exactly the same k rows — the
    smallest md5 row-key priorities — so unlike approx_percentile /
    t-digest / GK (all arrival-order dependent) the estimates
    hash-gate bit-for-bit against the DuckDB oracle. Nearest-rank
    quantiles (index floor(q·(n−1))) over price CENTS; the exact
    nearest-rank quantile over the full table rides along as the
    audit column with the signed error — the measurement IS the
    sample-size/accuracy trade (expected relative rank error
    ~1/√k ≈ 6%).

    Scale shape: the sample is a TakeOrdered over 8-byte priorities
    (no global sort; mergeable like KMV — union two samples, keep the
    k smallest); the estimate side then works on 256 rows. The exact
    audit column ranks the full table with the TWO-PHASE bucketed
    row_number built for the suffix array
    (operators/suffix.py:_bucketed_rank — value-range buckets, local
    windows, |buckets|-row offsets; no single-partition funnel), and
    swaps out at 100 TB leaving the sketch. Quantile targets join by
    computed rank — no collect anywhere; N flows as a 1-row broadcast."""
    from idh_etl_demo_spark.operators.suffix import _bucketed_rank

    li = _t(spark, sf_dir, "lineitem")
    src = li.repartition(spark.sparkContext.defaultParallelism).select(
        F.round(F.col("l_extendedprice") * 100, 0).cast("long").alias("cents"),
        md5_long(
            F.concat_ws(
                "|",
                F.col("l_orderkey").cast("string"),
                F.col("l_linenumber").cast("string"),
            )
        ).alias("rk"),
    )
    qs = spark.createDataFrame(
        [(float(q),) for q in _QSK_QS], ["q"]
    )
    samp = src.orderBy("rk").limit(_QSK_K).select("cents")
    sn = samp.agg(F.count(F.lit(1)).alias("sample_n"))
    sranked = samp.withColumn(
        "rn", F.row_number().over(Window.orderBy("cents")).cast("long")
    )
    est = (
        qs.crossJoin(F.broadcast(sn))
        .withColumn(
            "target",
            F.floor(F.col("q") * (F.col("sample_n") - 1)).cast("long") + 1,
        )
        .join(
            F.broadcast(sranked),
            F.col("rn") == F.col("target"),
        )
        .select("q", "sample_n", F.col("cents").alias("est_cents"))
    )
    nn = src.agg(F.count(F.lit(1)).alias("n"))
    # exact audit: global nearest-rank values via the two-phase rank.
    # Bucket boundaries derive from the MEASURED extrema (a 1-row
    # broadcast), not a hard-coded domain constant — a price-domain
    # change now re-balances the 256 value-range buckets instead of
    # silently funneling everything into one hot bucket (r9 ADVICE).
    # The bucket key floor((cents−min)·256/range) is monotone in cents
    # and equal values never straddle, preserving the _bucketed_rank
    # leading-order invariant.
    ext = src.agg(F.min("cents").alias("minc"), F.max("cents").alias("maxc"))
    srcb = (
        src.crossJoin(F.broadcast(ext))
        .withColumn(
            "bk",
            F.floor(
                (F.col("cents") - F.col("minc"))
                * 256
                / (F.col("maxc") - F.col("minc") + 1)
            ).cast("long"),
        )
        .select("cents", "rk", "bk")
    )
    eranked = _bucketed_rank(
        srcb, ["cents", "rk"], "bk", bucket_width=1, dense=False,
    )
    targets = (
        qs.crossJoin(F.broadcast(nn))
        .select(
            "q",
            (F.floor(F.col("q") * (F.col("n") - 1)).cast("long") + 1).alias(
                "gr"
            ),
        )
    )
    ex = eranked.join(F.broadcast(targets), "gr").select(
        "q", F.col("cents").alias("exact_cents")
    )
    return (
        est.join(ex, "q")
        .select(
            "q",
            "sample_n",
            "est_cents",
            "exact_cents",
            (F.col("est_cents") - F.col("exact_cents")).alias("err_cents"),
        )
        .orderBy("q")
    )


# ===========================================================================
# Reciprocal Rank Fusion — hybrid retrieval serving
# ===========================================================================
#
# Production retrieval rarely serves ONE ranker: hybrid search fuses a
# lexical ranking with a second signal, and Reciprocal Rank Fusion
# (Cormack, Clarke & Büttcher 2009) is the standard scoreless
# combiner — every vector database ships it. RRF needs only RANKS
# (k=60 damping), which is exactly why it can hash-gate across
# engines: score(d) = Σ_rankers 1/(60 + rank_r(d)) is a fixed-arity
# expression per row (one rounding per term, one addition — no
# order-dependent aggregation), unlike fusing raw scores from
# incommensurable rankers.

_RRF_K = 60
_RRF_DEPTH = 20  # per-ranker candidate depth feeding the fusion
_RRF_TOPN = 10


def _rrf_sql() -> str:
    from idh_etl_demo_spark.catalog_r9 import _bm25_multi_ctes

    return f"""
    with {_bm25_multi_ctes()},
    bmr as (
      select query_id, doc_id,
             row_number() over (partition by query_id
                                order by bm25 desc, doc_id asc) as r1
      from perdoc
    ),
    bm20 as (select * from bmr where r1 <= {_RRF_DEPTH}),
    dlen as (
      select doc_id, count(distinct tok)::bigint as nd
      from (select doc_id, unnest(toks) as tok from base)
      group by doc_id
    ),
    qsz as (select query_id, count(*)::bigint as nq from qt group by query_id),
    inter as (
      select qt.query_id, t.doc_id, count(*)::bigint as inter
      from terms t join qt on t.token = qt.token
      group by 1, 2
    ),
    jac as (
      select i.query_id, i.doc_id,
             cast(i.inter as double) / (q.nq + d.nd - i.inter) as jaccard
      from inter i
      join qsz q on q.query_id = i.query_id
      join dlen d on d.doc_id = i.doc_id
    ),
    jr as (
      select query_id, doc_id,
             row_number() over (partition by query_id
                                order by jaccard desc, doc_id asc) as r2
      from jac
    ),
    j20 as (select * from jr where r2 <= {_RRF_DEPTH}),
    cand as (
      select query_id, doc_id from bm20
      union
      select query_id, doc_id from j20
    ),
    fused as (
      select c.query_id, c.doc_id,
             cast(b.r1 as bigint) as bm25_rank,
             cast(j.r2 as bigint) as jaccard_rank,
             coalesce(1.0::double / ({_RRF_K} + b.r1), 0.0::double)
               + coalesce(1.0::double / ({_RRF_K} + j.r2), 0.0::double) as rrf
      from cand c
      left join bm20 b on b.query_id = c.query_id and b.doc_id = c.doc_id
      left join j20 j on j.query_id = c.query_id and j.doc_id = c.doc_id
    )
    select query_id, doc_id, bm25_rank, jaccard_rank, rrf, fused_rank from (
      select *, row_number() over (partition by query_id
                                   order by rrf desc, doc_id asc) as fused_rank
      from fused
    ) where fused_rank <= {_RRF_TOPN}
    order by query_id, fused_rank
    """


@query("doc_bm25_rrf", _rrf_sql())
def doc_bm25_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval by Reciprocal Rank Fusion (Cormack et al.
    2009): fuse the BM25 multiquery ranking with a query-token Jaccard
    ranking (set overlap over each doc's distinct vocabulary — a
    length-normalized signal BM25's tf saturation treats differently),
    taking each ranker's top-20 and scoring candidates by
    1/(60+rank_bm25) + 1/(60+rank_jaccard), absent ranks contributing
    zero. Output: fused top-10 per query with both source ranks
    exposed — docs ranked by only ONE ranker can and do win over docs
    ranked low by both, which is the behavior RRF exists for (the
    property test pins a fused winner outside one ranker's list on
    the real corpus).

    Engine parity: RRF needs only ranks, so the fusion is a
    fixed-arity expression per candidate row — one rounding per
    reciprocal, one addition, never an order-dependent sum over a
    variable ranker set; Jaccard is one double division of exact
    integers. Everything gates bit-for-bit.

    Scale shape: the BM25 side is doc_bm25_multiquery's chain (corpus
    collapses once to query-term tf rows); the Jaccard side adds ONE
    distinct-token count per doc (map-side combined) and reuses the
    same matched-term rows for the intersection; both rankers are
    per-query window top-20s, the fusion joins |Q|·40 candidate rows
    against two |Q|·20 broadcast lists, and the final window ranks
    |Q|·40 rows."""
    from idh_etl_demo_spark.catalog_r9 import (
        _BM25_QUERIES,
        _bm25_term_score,
    )
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
    perdoc = scored.groupBy("query_id", "doc_id").agg(
        F.aggregate(
            parts, F.lit(0.0), lambda acc, x: acc + x["term_score"]
        ).alias("bm25"),
    )
    w1 = Window.partitionBy("query_id").orderBy(F.desc("bm25"), F.asc("doc_id"))
    bm20 = (
        perdoc.withColumn("r1", F.row_number().over(w1).cast("long"))
        .filter(F.col("r1") <= _RRF_DEPTH)
        .select("query_id", "doc_id", "r1")
    )
    dlen = (
        base.select("doc_id", F.explode("toks").alias("tok"))
        .groupBy("doc_id")
        .agg(F.count_distinct("tok").cast("long").alias("nd"))
    )
    qsz = qt.groupBy("query_id").agg(F.count(F.lit(1)).cast("long").alias("nq"))
    inter = (
        terms.join(F.broadcast(qt), "token")
        .groupBy("query_id", "doc_id")
        .agg(F.count(F.lit(1)).cast("long").alias("inter"))
    )
    jac = (
        inter.join(F.broadcast(qsz), "query_id")
        .join(dlen, "doc_id")
        .select(
            "query_id",
            "doc_id",
            (
                F.col("inter").cast("double")
                / (F.col("nq") + F.col("nd") - F.col("inter"))
            ).alias("jaccard"),
        )
    )
    w2 = Window.partitionBy("query_id").orderBy(
        F.desc("jaccard"), F.asc("doc_id")
    )
    j20 = (
        jac.withColumn("r2", F.row_number().over(w2).cast("long"))
        .filter(F.col("r2") <= _RRF_DEPTH)
        .select("query_id", "doc_id", "r2")
    )
    cand = (
        bm20.select("query_id", "doc_id")
        .union(j20.select("query_id", "doc_id"))
        .distinct()
    )
    fused = (
        cand.join(F.broadcast(bm20), ["query_id", "doc_id"], "left")
        .join(F.broadcast(j20), ["query_id", "doc_id"], "left")
        .select(
            "query_id",
            "doc_id",
            F.col("r1").alias("bm25_rank"),
            F.col("r2").alias("jaccard_rank"),
            (
                F.coalesce(
                    F.lit(1.0) / (F.lit(_RRF_K) + F.col("r1")), F.lit(0.0)
                )
                + F.coalesce(
                    F.lit(1.0) / (F.lit(_RRF_K) + F.col("r2")), F.lit(0.0)
                )
            ).alias("rrf"),
        )
    )
    wf = Window.partitionBy("query_id").orderBy(F.desc("rrf"), F.asc("doc_id"))
    return (
        fused.withColumn("fused_rank", F.row_number().over(wf).cast("long"))
        .filter(F.col("fused_rank") <= _RRF_TOPN)
        .select(
            "query_id", "doc_id", "bm25_rank", "jaccard_rank", "rrf",
            "fused_rank",
        )
        .orderBy("query_id", "fused_rank")
    )
