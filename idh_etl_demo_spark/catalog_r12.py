"""Round-12 entries — dedup consolidation and pipeline-design audits
beyond the reference surface:

- ``doc_dup_canonical``: the step after clustering — per near-dup
  cluster, select the CANONICAL representative (longest member, ties
  to the lowest doc_id: "keep the most complete copy", the common
  production rule when near-dups are truncations/re-crawls of one
  another). doc_dup_clusters keeps min-doc_id; this entry keeps the
  best copy, which is what a curation pipeline actually ships.

- ``doc_effective_tokens``: dedup-discounted corpus size — per
  language, raw token count vs EFFECTIVE token count (each distinct
  normalized content counted once), and the duplication overhead
  share. The number a data-mixture plan budgets against: raw tokens
  overstate a crawl's value by exactly this overhead.

- ``embedding_prefix_whitening_stats``: exact second-moment audit over
  the 8-dim matryoshka prefix — per (i ≤ j) dimension pair, int64
  sums of quantized values/products and the derived covariance. The
  whitening-readiness table: off-diagonal mass tells a serving stack
  whether the prefix needs a rotation before product quantization
  (Jégou et al.'s observation that PQ quality depends on per-subspace
  variance balance).

- ``events_watermark_design``: the streaming-design twin of
  doc_lsh_tuning_audit — for a grid of watermark delays, the exact
  number of events that would be dropped as late (arrival = event
  time + deterministic md5 transport jitter < 600 s; lateness =
  running-max event time among earlier arrivals minus own event
  time). The table a pipeline reads to pick its watermark: delay buys
  completeness, costs state retention.

- ``multimodal_image_ahash_neardup``: per-image near-dup census under
  hamming ≤ 2 on the 12-bit aHash via NEIGHBORHOOD ENUMERATION over
  the code space (79 XOR masks against a ≤4096-row count table) — the
  anti-quadratic strategy for short perceptual codes, where banding
  would flood every 4-bit band bucket with n/16 images.

- ``orders_snapshot_diff``: changeset GENERATION between two table
  snapshots (the Delta/Iceberg change-data-feed primitive and the
  inverse of ``orders_cdc_apply``): full outer join on the key, emit
  only insert/update/delete rows. diff ∘ apply = identity is
  property-pinned.

- ``orders_ivm_agg_retract``: incremental aggregate maintenance UNDER
  RETRACTIONS — count/sum maintain by subtraction (invertible), MAX
  re-aggregates only the keys whose retracted max ties the stored max
  (the bounded-rescan rule for non-invertible aggregates; the
  DBSP/Materialize Z-set distinction made executable).

- ``customer_kanonymity_audit``: k-anonymity over the customer
  quasi-identifiers — per equivalence class size, the k = 10 risk
  flag, and the corpus share of re-identifiable rows; the privacy
  audit that pairs with the PII scrub.

Entry contract per repo convention: @query registration with a DuckDB
oracle, shuffle budgets with why-comments (tests/test_plan_shape.py),
bench.py HEADLINE rows, bench_scale probe decisions (in/out, each with
a reason), and property tests vs pure-Python twins on planted data
(tests/test_r12_properties.py).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from idh_etl_demo_spark.catalog import _t, query
from idh_etl_demo_spark.catalog_llm import _MD5_LONG, _NORM, _WORDS, _minhash_cte

# ===========================================================================
# Canonical representative per near-dup cluster
# ===========================================================================
#
# doc_dup_clusters turns LSH candidate pairs into components and keeps
# the min-doc_id member — fine as a deterministic survivor rule, wrong
# as a QUALITY rule: near-dup clusters are typically one full document
# plus truncations/re-crawls, and production dedup keeps the most
# complete copy. Canonical = argmax(n_tokens, tie → min doc_id) per
# cluster. The oracle recomputes the components with the recursive
# transitive-closure CTE and ranks with an explicit row_number — the
# value-hash gate covers the cluster structure AND the selection rule.

_N_TOKENS_SQL = f"len(list_filter({_WORDS}, w -> w != ''))"


@query(
    "doc_dup_canonical",
    f"""
    with recursive {_minhash_cte()},
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
    toks as (
      select doc_id, cast({_N_TOKENS_SQL} as bigint) as n_tokens
      from documents
    ),
    ranked as (
      select comp.component as cluster_id, comp.id as doc_id, t.n_tokens,
             count(*) over (partition by comp.component) as cluster_size,
             row_number() over (
               partition by comp.component
               order by t.n_tokens desc, comp.id asc) as rn
      from comp join toks t on t.doc_id = comp.id
    )
    select cluster_id, doc_id, n_tokens,
           cast(cluster_size as bigint) as cluster_size,
           (rn = 1) as is_canonical
    from ranked
    order by cluster_id, doc_id
    """,
)
def doc_dup_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical-copy selection per near-dup cluster (section comment):
    LSH candidates → connected components → per cluster keep the
    LONGEST member (ties to the lowest doc_id). Output: one row per
    clustered document — (cluster_id, doc_id, n_tokens, cluster_size,
    is_canonical).

    Scale shape: the candidate/CC machinery is doc_dup_clusters'
    (min-label propagation, rounds = component diameter, per round one
    keyed join + one map-side-combined min-agg); the selection adds
    one per-doc token projection joined onto the |clustered docs|-row
    component table (candidate-bounded, ≪ corpus) and a per-cluster
    window whose partitions are cluster-sized (near-dup clusters are
    small by construction; the LSH max_bucket cap bounds the expansion
    that feeds them). Document text never shuffles — the window sees
    (id, cluster, n_tokens) rows only."""
    from idh_etl_demo_spark.catalog_llm import minhash_lsh_candidates
    from idh_etl_demo_spark.operators.graph import connected_components
    from idh_etl_demo_spark.operators.text import token_count

    docs = _t(spark, sf_dir, "documents")
    cand = minhash_lsh_candidates(
        docs,
        num_hashes=12,
        bands=4,
        num_partitions=spark.sparkContext.defaultParallelism,
        max_bucket=64,
    )
    cc = connected_components(cand, "id_a", "id_b")
    toks = docs.select(
        "doc_id", token_count(F.col("text")).alias("n_tokens")
    )
    w = Window.partitionBy("cluster_id")
    wr = Window.partitionBy("cluster_id").orderBy(
        F.desc("n_tokens"), F.asc("doc_id")
    )
    return (
        cc.select(
            F.col("id").alias("doc_id"),
            F.col("component").alias("cluster_id"),
        )
        .join(toks, "doc_id")
        .withColumn("cluster_size", F.count(F.lit(1)).over(w))
        .withColumn("rn", F.row_number().over(wr))
        .select(
            "cluster_id",
            "doc_id",
            "n_tokens",
            "cluster_size",
            (F.col("rn") == 1).alias("is_canonical"),
        )
        .orderBy("cluster_id", "doc_id")
    )


# ===========================================================================
# Dedup-discounted effective corpus size
# ===========================================================================


@query(
    "doc_effective_tokens",
    f"""
    with d as (
      select lang, md5({_NORM}) as content_hash,
             cast({_N_TOKENS_SQL} as bigint) as n_tokens
      from documents
    ),
    per_content as (
      select lang, content_hash,
             count(*)::bigint as mult,
             max(n_tokens) as n_tokens
      from d group by 1, 2
    )
    select lang,
           cast(sum(mult) as bigint) as n_docs,
           count(*)::bigint as n_distinct_contents,
           cast(sum(mult * n_tokens) as bigint) as raw_tokens,
           cast(sum(n_tokens) as bigint) as effective_tokens,
           case when sum(mult * n_tokens) > 0
                then cast(sum(mult * n_tokens) - sum(n_tokens) as double)
                     / cast(sum(mult * n_tokens) as double)
                else null end as dup_token_overhead
    from per_content
    group by lang
    order by lang
    """,
)
def doc_effective_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Effective dataset size after exact dedup (section comment): per
    language, raw tokens vs tokens with each distinct normalized
    content counted ONCE, plus the duplication overhead share — the
    mixture-planning number (raw counts overstate a crawl by exactly
    this overhead; UniMax/temperature allocations should divide
    effective, not raw, budgets).

    Scale shape: one map-side-combined groupBy over (lang, 16-byte
    content hash, int64 token count) rows — document text never
    shuffles — then a |langs|-bounded rollup. Identical contents have
    identical token counts, so max(n_tokens) per content is exact, not
    an approximation."""
    from idh_etl_demo_spark.operators.dedup import normalize_text
    from idh_etl_demo_spark.operators.text import token_count

    d = _t(spark, sf_dir, "documents").select(
        "lang",
        F.md5(normalize_text(F.col("text"))).alias("content_hash"),
        token_count(F.col("text")).alias("n_tokens"),
    )
    per_content = d.groupBy("lang", "content_hash").agg(
        F.count(F.lit(1)).cast("long").alias("mult"),
        F.max("n_tokens").alias("n_tokens"),
    )
    raw = F.sum(F.col("mult") * F.col("n_tokens")).cast("long")
    eff = F.sum("n_tokens").cast("long")
    return (
        per_content.groupBy("lang")
        .agg(
            F.sum("mult").cast("long").alias("n_docs"),
            F.count(F.lit(1)).cast("long").alias("n_distinct_contents"),
            raw.alias("raw_tokens"),
            eff.alias("effective_tokens"),
        )
        .select(
            "lang",
            "n_docs",
            "n_distinct_contents",
            "raw_tokens",
            "effective_tokens",
            F.when(
                F.col("raw_tokens") > 0,
                (
                    F.col("raw_tokens") - F.col("effective_tokens")
                ).cast("double")
                / F.col("raw_tokens").cast("double"),
            ).alias("dup_token_overhead"),
        )
        .orderBy("lang")
    )


# ===========================================================================
# Whitening-readiness second moments over the matryoshka prefix
# ===========================================================================
#
# Product-quantized serving (the IVFPQ family) assumes sub-space
# variance is balanced; a correlated prefix wants a rotation (OPQ)
# first. This audit emits the exact second-moment table for the 8-dim
# matryoshka prefix: values quantized to integer micros (the repo's
# exact-parity recipe — round(x·1e6) as int64), so every sum is an
# associative int64 total both engines reproduce bit-for-bit; the
# covariance is derived at the end with one identical double tree.

_WH_D = 8
_WH_PAIRS = [(i, j) for i in range(_WH_D) for j in range(_WH_D) if i <= j]


def _wh_oracle_sql() -> str:
    sums = ", ".join(
        f"cast(sum(v[{i + 1}] * v[{j + 1}]) as bigint) as p_{i}_{j}"
        for i, j in _WH_PAIRS
    )
    dims = ", ".join(
        f"cast(sum(v[{i + 1}]) as bigint) as s_{i}" for i in range(_WH_D)
    )
    rows = " union all ".join(
        f"select {i} as dim_i, {j} as dim_j, n_vecs, s_{i} as sum_qi,"
        f" s_{j} as sum_qj, p_{i}_{j} as sum_qij from agg"
        for i, j in _WH_PAIRS
    )
    return f"""
    with q as (
      select list_transform(
               embedding[1:{_WH_D}],
               x -> cast(round(cast(x as double) * 1000000, 0) as bigint)
             ) as v
      from embeddings
      where len(embedding) >= {_WH_D}
    ),
    agg as (select count(*)::bigint as n_vecs, {dims}, {sums} from q),
    pairs as ({rows})
    select dim_i, dim_j, n_vecs, sum_qi, sum_qj, sum_qij,
           (cast(sum_qij as double)
            - cast(sum_qi as double) * cast(sum_qj as double)
              / cast(n_vecs as double))
           / cast(n_vecs as double) as cov_micros2
    from pairs
    order by dim_i, dim_j
    """


@query("embedding_prefix_whitening_stats", _wh_oracle_sql())
def embedding_prefix_whitening_stats(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Exact covariance table over the 8-dim matryoshka prefix (section
    comment): per dimension pair (i ≤ j), the int64 sums of quantized
    values and products and the derived covariance in micro² units —
    36 rows. Diagonal rows are per-dim variances (the sub-space
    balance PQ wants); off-diagonal mass is the rotation argument.

    Scale shape: ZERO shuffles of vector data — the 44 sums compute in
    ONE map-side-combined single-row aggregate over the scan (no
    per-pair explode; at 100 TB the only exchange is the 1-row partial
    merge), and the 36-row presentation table is a literal explode of
    that single row. The quantization (round(x·1e6) int64) keeps every
    sum associative and engine-exact; the final covariance is one
    identical IEEE double tree on both sides.

    Overflow bound: with unit-normalized inputs |q| ≤ 1e6, so
    |sum_qij| ≤ n_vecs·1e12 — the reported int64 columns are exact
    while n_vecs < ~9.2e6 qualifying vectors. The Spark side
    accumulates in decimal(38,0) (exact to 38 digits, covering any
    realistic corpus) before the bigint cast, and DuckDB sums into
    HUGEINT — past the bound BOTH engines raise on the cast rather
    than wrap, so the audit fails loudly; widen the output columns to
    decimal if a corpus ever crosses it."""
    emb = _t(spark, sf_dir, "embeddings").filter(
        F.size("embedding") >= _WH_D
    )
    qcols = [
        F.round(
            F.element_at("embedding", i + 1).cast("double") * 1000000, 0
        )
        .cast("long")
        .alias(f"q{i}")
        for i in range(_WH_D)
    ]
    q = emb.select(*qcols)
    aggs = [F.count(F.lit(1)).cast("long").alias("n_vecs")]
    aggs += [
        F.sum(F.col(f"q{i}").cast("decimal(38,0)"))
        .cast("long")
        .alias(f"s_{i}")
        for i in range(_WH_D)
    ]
    aggs += [
        F.sum((F.col(f"q{i}") * F.col(f"q{j}")).cast("decimal(38,0)"))
        .cast("long")
        .alias(f"p_{i}_{j}")
        for i, j in _WH_PAIRS
    ]
    one = q.agg(*aggs)
    pair_structs = F.array(
        *[
            F.struct(
                F.lit(i).cast("int").alias("dim_i"),
                F.lit(j).cast("int").alias("dim_j"),
                F.col(f"s_{i}").alias("sum_qi"),
                F.col(f"s_{j}").alias("sum_qj"),
                F.col(f"p_{i}_{j}").alias("sum_qij"),
            )
            for i, j in _WH_PAIRS
        ]
    )
    exploded = one.select(
        "n_vecs", F.explode(pair_structs).alias("p")
    ).select("p.dim_i", "p.dim_j", "n_vecs", "p.sum_qi", "p.sum_qj", "p.sum_qij")
    cov = (
        F.col("sum_qij").cast("double")
        - F.col("sum_qi").cast("double")
        * F.col("sum_qj").cast("double")
        / F.col("n_vecs").cast("double")
    ) / F.col("n_vecs").cast("double")
    return exploded.select(
        "dim_i",
        "dim_j",
        "n_vecs",
        "sum_qi",
        "sum_qj",
        "sum_qij",
        cov.alias("cov_micros2"),
    ).orderBy("dim_i", "dim_j")


# ===========================================================================
# Watermark design table — exact lateness vs delay grid
# ===========================================================================
#
# Structured Streaming drops an event iff its event time has fallen
# more than the watermark DELAY behind the max event time already
# seen. The events table is generated in perfect event-time order, so
# ingest disorder is SIMULATED the repo's deterministic way: each
# event's arrival time = event time + an md5-derived jitter in
# [0, 600 s) (the transport-delay model; md5 of the event_id string,
# identical on both engines). Arrival order = (arrival_us, event_id);
# lateness(e) = max(event time of earlier arrivals) − event time(e);
# the drop count at delay W is |{e : lateness(e) > W}| — exact, per W,
# over a design grid. This is the lsh-tuning pattern applied to
# streaming: measure the completeness-vs-state trade on the corpus
# instead of guessing the delay. With jitter < 600 s the 900 s grid
# point must read 0 — a built-in sanity row.

_WM_BUCKET_US = 3600 * 1000000  # arrival-HOUR buckets for the 2-phase cummax
_WM_JITTER_US = 600 * 1000000
_WM_GRID_SEC = [0, 10, 30, 60, 300, 900]


def _wm_oracle_sql() -> str:
    md5_long = _MD5_LONG.format(x="cast(event_id as varchar)")
    drops = ", ".join(
        f"count(*) filter (where lateness > {w} * 1000000::bigint)::bigint"
        f" as d_{w}"
        for w in _WM_GRID_SEC
    )
    rows = " union all ".join(
        f"select {w} as delay_sec, d_{w} as n_dropped from agg"
        for w in _WM_GRID_SEC
    )
    return f"""
    with e as (
      select event_id, epoch_us(ts) as us,
             epoch_us(ts) + {md5_long} % {_WM_JITTER_US} as arrival_us
      from events
    ),
    r as (
      select us,
             max(us) over (order by arrival_us, event_id
                           rows between unbounded preceding
                           and 1 preceding) as prev_max
      from e
    ),
    l as (select greatest(coalesce(prev_max - us, 0), 0) as lateness from r),
    agg as (select count(*)::bigint as n_events, {drops} from l)
    select delay_sec, n_events, n_dropped,
           cast(n_dropped as double) / cast(n_events as double) as drop_rate
    from ({rows}) cross join (select n_events from agg)
    order by delay_sec
    """


@query("events_watermark_design", _wm_oracle_sql())
def events_watermark_design(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark-delay design table (section comment): for each delay
    in a 6-point grid (0 s … 15 min), the exact count and share of
    events that would arrive too late and be dropped — lateness
    measured against the running max event time in simulated-arrival
    order (event time + deterministic md5 jitter < 600 s, the
    section comment's transport-delay model), all in integer micros.
    Output: (delay_sec, n_events, n_dropped, drop_rate); the 900 s
    row must read 0 by the jitter bound — a built-in sanity row.

    Scale shape: the running max is the repo's TWO-PHASE bucketed
    pattern (lineitem_mad_outliers' rank trick applied to cummax) —
    per-ARRIVAL-HOUR maxima (one map-side-combined groupBy; bucket
    count is calendar-bounded like the rollup cascade's grains),
    |buckets|-row prefix maxima, and a bucket-LOCAL window for the
    within-hour running max — no global single-partition sort ever
    sees event rows. The 6 drop counters are conditional sums in ONE
    1-row aggregate; the grid table is a literal explode."""
    # ts lands as TIMESTAMP_NTZ; the session is pinned to UTC (catalog
    # _read_table), so the cast is the identity instant and
    # unix_micros matches DuckDB's epoch_us on the naive value
    jitter = (
        F.conv(
            F.substring(F.md5(F.col("event_id").cast("string")), 1, 15),
            16,
            10,
        ).cast("long")
        % _WM_JITTER_US
    )
    ev = (
        _t(spark, sf_dir, "events")
        .select(
            "event_id",
            F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
        )
        .withColumn("arrival_us", F.col("us") + jitter)
    )
    b = ev.withColumn(
        "b", (F.col("arrival_us") / _WM_BUCKET_US).cast("long")
    )
    bmax = b.groupBy("b").agg(F.max("us").alias("bmax"))
    wpre = Window.orderBy("b").rowsBetween(Window.unboundedPreceding, -1)
    prefix = bmax.select(
        "b", F.max("bmax").over(wpre).alias("prefix_max")
    )
    wloc = (
        Window.partitionBy("b")
        .orderBy("arrival_us", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    lateness = (
        b.join(prefix, "b")
        .withColumn("local_max", F.max("us").over(wloc))
        .select(
            F.greatest(
                F.coalesce(
                    F.greatest(
                        F.coalesce("local_max", F.col("prefix_max")),
                        F.coalesce("prefix_max", F.col("local_max")),
                    )
                    - F.col("us"),
                    F.lit(0).cast("long"),
                ),
                F.lit(0).cast("long"),
            ).alias("lateness")
        )
    )
    aggs = [F.count(F.lit(1)).cast("long").alias("n_events")] + [
        F.sum(
            F.when(
                F.col("lateness") > F.lit(w * 1000000).cast("long"), 1
            ).otherwise(0)
        )
        .cast("long")
        .alias(f"d_{w}")
        for w in _WM_GRID_SEC
    ]
    one = lateness.agg(*aggs)
    grid = F.array(
        *[
            F.struct(
                F.lit(w).cast("int").alias("delay_sec"),
                F.col(f"d_{w}").alias("n_dropped"),
            )
            for w in _WM_GRID_SEC
        ]
    )
    return (
        one.select("n_events", F.explode(grid).alias("g"))
        .select(
            "g.delay_sec",
            "n_events",
            "g.n_dropped",
            (
                F.col("g.n_dropped").cast("double")
                / F.col("n_events").cast("double")
            ).alias("drop_rate"),
        )
        .orderBy("delay_sec")
    )


# ===========================================================================
# Image near-dup census — hamming neighborhood over the aHash code space
# ===========================================================================
#
# The text side finds near-dups by BANDING because its signature space
# is astronomically large; the 12-bit image aHash inverts the
# economics — the code space (4096 values) is tiny while the corpus is
# huge, so the right algorithm is NEIGHBORHOOD ENUMERATION: count
# images per hash value (one exchange over the corpus), then expand
# the ≤4096-row count table by the 79 XOR masks of hamming weight ≤ 2
# and re-group. Every downstream frame is bounded by |code space|·79,
# INDEPENDENT of corpus size — no candidate pair is ever materialized
# (banding a 12-bit code would put ~n/16 images per 4-bit band bucket
# and go quadratic). Production pHash pipelines use exactly this
# BK-tree/neighbor-probe shape for short perceptual codes.

_AH_BITS = 12
_AH_RADIUS = 2
_AH_MASKS = (
    [0]
    + [1 << i for i in range(_AH_BITS)]
    + [
        (1 << i) | (1 << j)
        for i in range(_AH_BITS)
        for j in range(i + 1, _AH_BITS)
    ]
)


def _ahash_neardup_sql() -> str:
    from idh_etl_demo_spark.catalog_r7 import _image_ahash_ctes

    masks = ", ".join(str(m) for m in _AH_MASKS)
    # reuse the ahash entry's CTE chain via the exported fragment (the
    # _minhash_cte pattern), then extend it with the census CTEs
    return f"""
    with {_image_ahash_ctes()},
    cnt as (select ahash, count(*)::bigint as n from hashed group by ahash),
    probe as (
      select xor(ahash, m.mask) as probe_hash, n
      from cnt cross join (select unnest([{masks}]) as mask) m
    ),
    nb as (select probe_hash as ahash, cast(sum(n) as bigint) as n_ball
           from probe group by probe_hash)
    select h.media_id, h.ahash,
           cast(nb.n_ball - 1 as bigint) as n_within_h2
    from hashed h join nb using (ahash)
    order by media_id
    """


@query("multimodal_image_ahash_neardup", _ahash_neardup_sql())
def multimodal_image_ahash_neardup(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-image near-duplicate census under hamming ≤ 2 on the
    12-bit aHash (section comment): n_within_h2 = how many OTHER
    images land within hamming 2 of this image's perceptual hash —
    the signal an image-dedup pass thresholds on. Output:
    (media_id, ahash, n_within_h2).

    Scale shape: the corpus crosses ONE map-side-combined exchange
    (the hash groupBy); the 79-mask expansion and the neighbor-sum
    regroup run on the ≤4096-row count table (bounded by the CODE
    SPACE, not the corpus — ≤323k intermediate rows at any scale);
    the census joins back to the per-image hash frame as a plain hash
    join. No candidate pair frame exists anywhere in the plan —
    neighborhood enumeration is the anti-quadratic strategy for short
    codes, where banding would put n/16 images in every 4-bit band
    bucket."""
    from idh_etl_demo_spark.catalog_r7 import multimodal_image_ahash

    hashed = multimodal_image_ahash(spark, sf_dir).select(
        "media_id", "ahash"
    )
    cnt = hashed.groupBy("ahash").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    masks = F.array(*[F.lit(m).cast("long") for m in _AH_MASKS])
    nb = (
        cnt.select(
            F.explode(masks).alias("mask"), "ahash", "n"
        )
        .select(
            F.col("ahash").bitwiseXOR(F.col("mask")).alias("ahash"), "n"
        )
        .groupBy("ahash")
        .agg(F.sum("n").cast("long").alias("n_ball"))
    )
    return (
        hashed.join(nb, "ahash")
        .select(
            "media_id",
            "ahash",
            (F.col("n_ball") - 1).cast("long").alias("n_within_h2"),
        )
        .orderBy("media_id")
    )


# ===========================================================================
# Snapshot diff — changeset GENERATION (the inverse of orders_cdc_apply)
# ===========================================================================
#
# orders_cdc_apply consumes a changelog; this entry PRODUCES one — the
# Delta/Iceberg change-data-feed primitive: given yesterday's snapshot
# and today's, emit the exact (insert / update / delete) changeset.
# Synthetic versioning from key arithmetic so both engines derive
# identical snapshots: inserts = o_orderkey % 7 == 0 (absent from
# base), deletes = o_orderkey % 11 == 3 among base rows (absent from
# current), updates = o_orderkey % 5 == 0 rows whose price rose $1
# between versions (base cents = current − 100). Unchanged rows emit
# nothing — a changeset's size tracks CHANGE volume, never table size.


@query(
    "orders_snapshot_diff",
    """
    with cur0 as (
      select o_orderkey,
             cast(round(o_totalprice * 100, 0) as bigint) as cents
      from orders
    ),
    base as (
      select o_orderkey,
             cents - case when o_orderkey % 5 = 0 then 100 else 0 end
               as cents
      from cur0 where o_orderkey % 7 != 0
    ),
    cur as (
      select o_orderkey, cents from cur0 where o_orderkey % 11 != 3
    )
    select coalesce(b.o_orderkey, c.o_orderkey) as o_orderkey,
           case when b.o_orderkey is null then 'insert'
                when c.o_orderkey is null then 'delete'
                else 'update' end as change_type,
           b.cents as old_cents, c.cents as new_cents
    from base b full outer join cur c on b.o_orderkey = c.o_orderkey
    where b.o_orderkey is null or c.o_orderkey is null
          or b.cents != c.cents
    order by o_orderkey
    """,
)
def orders_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Changeset generation between two table snapshots (section
    comment): full outer join on the key, emit ONLY rows that differ —
    (o_orderkey, change_type ∈ insert/update/delete, old_cents,
    new_cents). The oracle derives the same synthetic versions and the
    driver's value-hash equality proves the diff is exact; together
    with orders_cdc_apply the pair closes the loop (diff ∘ apply =
    identity is the production invariant).

    Scale shape: one key-keyed full outer SortMergeJoin of the two
    snapshot scans (co-partitioned on the key — at scale both sides
    are bucketed/clustered on it) followed by a row-local comparison
    filter; output is change-volume-sized. Integer cents end to end;
    no column but the key and the compared value ever shuffles."""
    cur0 = _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("cents"),
    )
    base = cur0.filter(F.col("o_orderkey") % 7 != 0).select(
        "o_orderkey",
        (
            F.col("cents")
            - F.when(F.col("o_orderkey") % 5 == 0, 100).otherwise(0)
        ).alias("cents"),
    )
    cur = cur0.filter(F.col("o_orderkey") % 11 != 3)
    b = base.select(
        F.col("o_orderkey").alias("bk"), F.col("cents").alias("old_cents")
    )
    c = cur.select(
        F.col("o_orderkey").alias("ck"), F.col("cents").alias("new_cents")
    )
    joined = b.join(c, b["bk"] == c["ck"], "full_outer")
    return (
        joined.filter(
            F.col("bk").isNull()
            | F.col("ck").isNull()
            | (F.col("old_cents") != F.col("new_cents"))
        )
        .select(
            F.coalesce("bk", "ck").alias("o_orderkey"),
            F.when(F.col("bk").isNull(), "insert")
            .when(F.col("ck").isNull(), "delete")
            .otherwise("update")
            .alias("change_type"),
            "old_cents",
            "new_cents",
        )
        .orderBy("o_orderkey")
    )


# ===========================================================================
# Retraction-aware IVM — the non-invertible-aggregate lesson
# ===========================================================================
#
# orders_ivm_agg maintains under INSERTS, where every aggregate here is
# mergeable. DELETES split the family in two (the DBSP/Materialize
# Z-set distinction): count/sum are INVERTIBLE (subtract the delta's
# partial), MAX is NOT — retracting a row that carried the stored max
# cannot be repaired from state alone. The production answer is a
# BOUNDED RESCAN: only keys whose retracted max equals the stored max
# re-aggregate their surviving base rows (a semi-join-bounded rescan;
# every other key keeps merge-only maintenance). The oracle recomputes
# from the surviving rows, so the value-hash gate proves both the
# invertible arithmetic and the rescan-set rule. Deltas: inserts =
# o_orderkey % 7 == 0 (the ivm_agg convention); retractions =
# o_orderkey % 13 == 0 among base rows. A fully-retracted customer
# must VANISH from the view (n = 0 rows emit nothing).


@query(
    "orders_ivm_agg_retract",
    """
    with live as (
      select o_custkey,
             cast(round(o_totalprice * 100, 0) as bigint) as cents
      from orders
      where o_orderkey % 7 = 0
         or (o_orderkey % 7 != 0 and o_orderkey % 13 != 0)
    )
    select o_custkey,
           count(*)::bigint as n_orders,
           cast(sum(cents) as bigint) as total_cents,
           max(cents) as max_cents,
           cast(sum(cents) as double) / cast(count(*) as double) as avg_cents
    from live
    group by o_custkey
    order by o_custkey
    """,
)
def orders_ivm_agg_retract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental aggregate maintenance UNDER RETRACTIONS (section
    comment): count/sum maintain by subtraction, avg derives from the
    maintained int64 sums, and max re-aggregates ONLY the keys whose
    retracted max ties the stored max (the conservative rescan set —
    a smaller retracted max cannot dethrone the stored one). Keys
    whose count reaches zero leave the view. Output: (o_custkey,
    n_orders, total_cents, max_cents, avg_cents) over base − deletes
    + inserts; the oracle recomputes from surviving rows.

    Scale shape: three map-side-combined per-key aggregates (stored
    base state stand-in, insert partials, retraction partials) merged
    by key-keyed joins over |keys|-row states; the ONLY base-fact
    re-read is the rescan term, key-bounded by the retracted-max
    semi-join (dmx = bmx keys) — at 100 TB that is the set of keys
    whose maximum actually changed, not the table."""
    cents = F.round(F.col("o_totalprice") * 100, 0).cast("long")
    orders = _t(spark, sf_dir, "orders").select(
        "o_custkey", F.col("o_orderkey").alias("k"), cents.alias("cents")
    )
    is_ins = F.col("k") % 7 == 0
    is_del = (~is_ins) & (F.col("k") % 13 == 0)
    base = orders.filter(~is_ins)
    survive = base.filter(F.col("k") % 13 != 0)
    ins = orders.filter(is_ins)
    dels = orders.filter(is_del)

    def state(df: DataFrame, p: str) -> DataFrame:
        return df.groupBy("o_custkey").agg(
            F.count(F.lit(1)).cast("long").alias(f"{p}n"),
            F.sum("cents").cast("long").alias(f"{p}s"),
            F.max("cents").cast("long").alias(f"{p}mx"),
        )

    b, i, d = state(base, "b"), state(ins, "i"), state(dels, "d")
    merged = b.join(d, "o_custkey", "left").join(i, "o_custkey", "full_outer")
    zero = F.lit(0).cast("long")
    n = (
        F.coalesce("bn", zero)
        - F.coalesce("dn", zero)
        + F.coalesce("in", zero)
    )
    s = (
        F.coalesce("bs", zero)
        - F.coalesce("ds", zero)
        + F.coalesce("is", zero)
    )
    # rescan set: a retraction tied the stored base max — the ONLY
    # case state cannot answer; everything else keeps the merge rule
    needs_rescan = F.col("dmx").isNotNull() & (
        F.col("dmx") == F.col("bmx")
    )
    rescan_keys = merged.filter(needs_rescan).select("o_custkey")
    rescanned = (
        survive.join(rescan_keys, "o_custkey", "left_semi")
        .groupBy("o_custkey")
        .agg(F.max("cents").cast("long").alias("rmx"))
    )
    lowest = F.lit(-(1 << 62)).cast("long")
    mx = F.greatest(
        F.coalesce(
            F.when(needs_rescan, F.col("rmx")).otherwise(F.col("bmx")),
            lowest,
        ),
        F.coalesce("imx", lowest),
    )
    return (
        merged.join(rescanned, "o_custkey", "left")
        .select(
            "o_custkey",
            n.alias("n_orders"),
            s.alias("total_cents"),
            mx.alias("max_cents"),
        )
        .filter(F.col("n_orders") > 0)
        .select(
            "o_custkey",
            "n_orders",
            "total_cents",
            "max_cents",
            (
                F.col("total_cents").cast("double")
                / F.col("n_orders").cast("double")
            ).alias("avg_cents"),
        )
        .orderBy("o_custkey")
    )


# ===========================================================================
# k-anonymity audit — privacy-side data quality
# ===========================================================================
#
# The PII scrub removes direct identifiers; k-anonymity measures the
# QUASI-identifiers left behind: a row is re-identifiable when its
# equivalence class under (nation, market segment, balance band) is
# small. The audit emits every class with its size, the k = 10 risk
# flag, and the corpus-level share of rows sitting in risky classes —
# the number a release review reads before publishing a dataset.

_KANON_K = 10


@query(
    "customer_kanonymity_audit",
    f"""
    with cls as (
      select cast(c_nationkey as bigint) as c_nationkey, c_mktsegment,
             cast(floor(c_acctbal / 1000) as bigint) as balance_band,
             count(*)::bigint as class_size
      from customer
      group by 1, 2, 3
    ),
    tot as (
      select cast(sum(class_size) as bigint) as n_rows,
             cast(sum(case when class_size < {_KANON_K}
                           then class_size else 0 end) as bigint)
               as n_risky_rows
      from cls
    )
    select c_nationkey, c_mktsegment, balance_band, class_size,
           (class_size < {_KANON_K}) as at_risk,
           cast(n_risky_rows as double) / cast(n_rows as double)
             as risky_row_share
    from cls cross join tot
    order by c_nationkey, c_mktsegment, balance_band
    """,
)
def customer_kanonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit over the customer quasi-identifiers (section
    comment): one row per (nation, segment, balance band) equivalence
    class with its size, the k = 10 risk flag, and the corpus share
    of rows in risky classes. Output: (c_nationkey, c_mktsegment,
    balance_band, class_size, at_risk, risky_row_share).

    Scale shape: ONE map-side-combined groupBy over the three
    quasi-identifier columns (classes bounded by the attribute-domain
    product, not the row count); the totals re-aggregate the class
    table into one broadcast row. floor() banding is exact integer
    both engines; the share is one IEEE division of two int64s."""
    cls = (
        _t(spark, sf_dir, "customer")
        .select(
            F.col("c_nationkey").cast("long").alias("c_nationkey"),
            "c_mktsegment",
            F.floor(F.col("c_acctbal") / 1000)
            .cast("long")
            .alias("balance_band"),
        )
        .groupBy("c_nationkey", "c_mktsegment", "balance_band")
        .agg(F.count(F.lit(1)).cast("long").alias("class_size"))
    )
    tot = cls.agg(
        F.sum("class_size").cast("long").alias("n_rows"),
        F.sum(
            F.when(F.col("class_size") < _KANON_K, F.col("class_size"))
            .otherwise(0)
        )
        .cast("long")
        .alias("n_risky_rows"),
    )
    return (
        cls.crossJoin(F.broadcast(tot))
        .select(
            "c_nationkey",
            "c_mktsegment",
            "balance_band",
            "class_size",
            (F.col("class_size") < _KANON_K).alias("at_risk"),
            (
                F.col("n_risky_rows").cast("double")
                / F.col("n_rows").cast("double")
            ).alias("risky_row_share"),
        )
        .orderBy("c_nationkey", "c_mktsegment", "balance_band")
    )
