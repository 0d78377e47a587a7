"""Round-11 third batch — feature-engineering and data-validation
primitives a training pipeline runs next to the curation entries:

- ``events_user_ewma``: per-user exponentially weighted moving average
  over the event stream — THE standard decay feature every
  feature-store materializes (recency-weighted engagement). EWMA is
  inherently order-sequential (s_i = alpha*x_i + (1-alpha)*s_{i-1}),
  so it is expressed as the repo's deterministic sequential-fold
  recipe: Spark ``F.aggregate`` over the (ts, event_id)-sorted
  collected struct array vs DuckDB ``list_reduce`` over the
  identically-ordered list, with an IDENTICAL per-step IEEE expression
  tree (alpha = 0.5, an exact binary scale) — the driver's value hash
  gates the doubles bit-for-bit (the doc_temperature_mixture
  precedent, catalog_r10.py).

- ``orders_profile``: the data-validation profile table (Great
  Expectations / TFX-DV style): per column, row count, null count,
  exact distinct count, and exact ppm rates in int64. One corpus scan:
  Spark plans the multi-column distinct aggregate as a single Expand
  (one pass, one shuffle of column-tagged rows) rather than one scan
  per column; the approximate one-pass-at-100 TB alternative is the
  repo's HLL/KMV sketch family, which this table cross-prices.

Entry contract per repo convention: @query registration with a DuckDB
oracle, a shuffle budget with a why-comment (tests/test_plan_shape.py),
bench.py HEADLINE rows, bench_scale probes or documented exclusions,
property tests vs pure-Python twins on planted data
(tests/test_r11c_properties.py), and driver-window first-green slots
(__spark_entry__.py annotations).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from idh_etl_demo_spark.catalog import _t, query

# ===========================================================================
# Per-user EWMA — the sequential decay feature
# ===========================================================================
#
# The recency-weighted mean s_i = alpha*x_i + (1-alpha)*s_{i-1} cannot
# be written as an unordered SUM (double addition is not associative,
# and the weights differ per position), so a hash-gated cross-engine
# entry needs BOTH engines to fold the same values in the same order
# with the same per-step expression tree. alpha = 1/2 keeps every
# step's scaling exact (multiplication by 0.5 only adjusts the
# exponent), so the only rounding per step is the single IEEE
# addition — identical on both sides because the tree is identical:
#     step(acc, x) = 0.5*x + 0.5*acc        (seed: s_1 = x_1)
#
# Ordering is (ts, event_id) — event_id is unique, so the fold order
# is total. NULL values would diverge (Spark's seed-on-null restart vs
# DuckDB's sticky NULL), so the landing filter drops them explicitly
# on both sides (testdata carries none; the filter is the contract).
#
# Scale shape: ONE user-keyed exchange. collect_list state is bounded
# by per-user activity (the key is the HIGH-cardinality user axis —
# millions of keys parallelize; per-key sequences are feed-sized, the
# same per-key-array bound doc_sequence_packing rides). For unbounded
# per-key history the streaming entry events_stateful_running_totals
# is the incremental form: EWMA state is one double, updated per
# micro-batch in arrival order.


@query(
    "events_user_ewma",
    """
    with e as (
      select user_id, ts, event_id, value
      from events where value is not null
    ),
    l as (
      select user_id,
             count(*)::bigint as n_events,
             list(value order by ts, event_id) as vs
      from e group by user_id
    ),
    f as (
      select user_id, n_events,
             list_reduce(vs, (a, b) -> 0.5*b + 0.5*a) as ewma,
             vs[-1] as last_value
      from l
    )
    select user_id, n_events, ewma, last_value,
           cast(floor(ewma * 1000000) as bigint) as ewma_upm
    from f
    order by user_id
    """,
)
def events_user_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user EWMA (alpha = 0.5) of event values in (ts, event_id)
    order — the recency-decay feature, folded sequentially with an
    engine-identical IEEE step tree (section comment), hash-gated
    bit-for-bit against DuckDB's list_reduce over the identically
    ordered list. last_value (the fold's final input) and the
    floor-scaled micro-units come along so the decay is auditable
    against the undecayed tail in one frame.

    Scale shape: one user-keyed groupBy; the folded array is bounded
    by per-user activity and the key axis is corpus-cardinality, so
    the stage parallelizes by user. Nothing after the groupBy sees
    more than |users| rows."""
    e = _t(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    l = e.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.array_sort(
            F.collect_list(F.struct("ts", "event_id", "value"))
        ).alias("arr"),
    )
    f = l.select(
        "user_id",
        "n_events",
        F.aggregate(
            F.col("arr"),
            F.lit(None).cast("double"),
            lambda acc, x: F.when(acc.isNull(), x["value"]).otherwise(
                0.5 * x["value"] + 0.5 * acc
            ),
        ).alias("ewma"),
        F.element_at(F.col("arr"), -1)["value"].alias("last_value"),
    )
    return f.select(
        "*",
        F.floor(F.col("ewma") * 1000000).cast("long").alias("ewma_upm"),
    ).orderBy("user_id")


# ===========================================================================
# Column profile — the data-validation summary table
# ===========================================================================
#
# Every pipeline run starts by profiling the snapshot it is about to
# trust: per column, how many rows, how many nulls, how many distinct
# values (Great Expectations' table profile, TFX Data Validation's
# statistics pass). Exact distinct counts per column normally cost one
# scan each; Spark's multi-distinct aggregate plans them as ONE scan +
# ONE Expand (each input row fans to |columns| tagged rows that
# partially aggregate map-side), so the whole profile is a single
# pass. The Expand's x|columns| row amplification is the honest price
# of EXACTNESS at 100 TB — the approximate alternative (one
# HLL/KMV register set per column, no expand) is already in the repo
# (events_distinct_users_hll, orderkey_distinct_kmv) and this table is
# what those sketches are audited against.
#
# Rates are exact int64 ppm (floor division) — no doubles anywhere, so
# the gate is arithmetic-trivial on both engines.

_PROFILE_COLS = [
    "o_orderkey",
    "o_custkey",
    "o_orderstatus",
    "o_totalprice",
    "o_orderdate",
    "o_orderpriority",
]


def _profile_oracle_sql() -> str:
    parts = []
    for c in _PROFILE_COLS:
        parts.append(
            f"""
            select '{c}' as col_name,
                   count(*)::bigint as n_rows,
                   (count(*) - count({c}))::bigint as n_nulls,
                   count(distinct {c})::bigint as n_distinct,
                   ((count(*) - count({c})) * 1000000 // count(*))::bigint
                     as null_ppm,
                   (count(distinct {c}) * 1000000 // count(*))::bigint
                     as distinct_ppm
            from orders
            """
        )
    return " union all ".join(parts) + " order by col_name"


@query("orders_profile", _profile_oracle_sql())
def orders_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-validation profile of the orders snapshot: per column, row
    count, null count, EXACT distinct count, and exact int64 ppm rates
    (section comment — one scan, one Expand; the sketch entries are
    the approximate form this table audits). The property test plants
    a frame WITH nulls and duplicate values and pins every cell
    against a pandas twin (testdata is null-free, so the null path is
    covered by the planted frame)."""
    o = _t(spark, sf_dir, "orders")
    aggs = [F.count(F.lit(1)).cast("long").alias("n_rows")]
    for c in _PROFILE_COLS:
        aggs.append(F.count(F.col(c)).cast("long").alias(f"nn_{c}"))
        aggs.append(
            F.count_distinct(F.col(c)).cast("long").alias(f"nd_{c}")
        )
    one = o.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', nn_{c}, nd_{c}" for c in _PROFILE_COLS
    )
    tall = one.selectExpr(
        "n_rows",
        f"stack({len(_PROFILE_COLS)}, {stack_args})"
        " as (col_name, n_nonnull, n_distinct)",
    )
    return tall.select(
        "col_name",
        "n_rows",
        (F.col("n_rows") - F.col("n_nonnull")).alias("n_nulls"),
        "n_distinct",
        F.expr("(n_rows - n_nonnull) * 1000000 div n_rows").alias(
            "null_ppm"
        ),
        F.expr("n_distinct * 1000000 div n_rows").alias("distinct_ppm"),
    ).orderBy("col_name")


# ===========================================================================
# Edit-distance (Levenshtein) title near-dup join — q-gram prefix filter
# ===========================================================================
#
# Set-overlap joins (Jaccard / containment) see REORDERINGS as
# similarity and transpositions as cheap; edit distance is the
# complementary predicate for short keys — titles, URLs, product
# names — where character-level typos and re-crawl mutations are the
# duplicate signal (the record-linkage classic; Gravano et al. 2001's
# q-gram count filter, Xiao et al. 2008 Ed-Join's prefix pruning).
#
# The relation here: normalized titles (lowercased text,
# whitespace-collapsed, first 64 chars) within Levenshtein distance
# k = 8, over the domain len(title) >= 32 (the count bound below is
# vacuous for shorter strings — the domain predicate IS the
# completeness guard, stated identically in the oracle).
#
# Two theorems drive the plan, both over DISTINCT 3-grams:
#  * COUNT FILTER: ed(A,B) <= k implies every gram value that vanishes
#    consumed >= 1 destroyed occurrence, and one edit destroys <= q
#    occurrences, so |set(A) \ set(B)| <= k*q and
#    shared >= max(n_a, n_b) - k*q.
#  * PREFIX FILTER: under the global rarest-first (df, gram) order,
#    overlap >= T forces the two (n - T + 1)-prefixes to intersect;
#    with T = max(n_a, n_b) - k*q both prefix lengths are <= k*q + 1
#    = 25 — candidates come from 25-rarest-gram buckets, COMPLETE by
#    theorem. The oracle is the all-pairs brute force, so the driver
#    gate re-proves completeness on the real corpus every run.
#
# Verification runs Spark's THRESHOLDED levenshtein(a, b, k) — the
# banded O(k*len) DP (returns -1 past k, the exact distance inside
# it) — DIRECTLY on every candidate, with zero per-pair fan-out: on a
# templated corpus the gram distribution is so narrow (measured 377
# distinct 3-grams at sf0.1) that the prefix filter passes ~all pairs,
# and any verify step that expands the gram stream per pair multiplies
# that near-quadratic candidate set by 62 (measured 350 s vs ~30 s at
# sf0.1). The count-filter bound (shared >= max(n_a, n_b) - k*q, from
# each edit destroying <= q distinct grams) is therefore NOT used as a
# pre-prune; the shared-gram statistic is emitted for survivors only.

_ED_K = 8
_ED_Q = 3
_ED_PREFIX = _ED_K * _ED_Q + 1  # 25
_ED_MINLEN = 32
_ED_SLOT_FACTOR = 2**14  # linear candidate budget: slots <= factor*docs

_ED_TITLE_SQL = """
    with t as (
      select doc_id,
             substr(regexp_replace(lower(text), '[ \\t\\n\\f\\r]+', ' ', 'g'),
                    1, 64) as title
      from documents where text is not null
    ),
    d as (select doc_id, title from t where len(title) >= 32),
    g as (
      select doc_id, title,
             list_distinct(list_transform(
               generate_series(1, len(title) - 2),
               i -> substr(title, i, 3))) as gs
      from d
    )
"""


@query(
    "doc_title_edit_neardup",
    _ED_TITLE_SQL
    + f"""
    select a.doc_id as id_a, b.doc_id as id_b,
           len(a.title)::bigint as len_a, len(b.title)::bigint as len_b,
           len(list_intersect(a.gs, b.gs))::bigint as shared_grams,
           levenshtein(a.title, b.title)::bigint as ed
    from g a join g b on a.doc_id < b.doc_id
    where levenshtein(a.title, b.title) <= {_ED_K}
    order by id_a, id_b
    """,
)
def doc_title_edit_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Levenshtein <= 8 self-join over normalized 64-char titles
    (section comment): candidates from each title's 25 rarest distinct
    3-grams (the Ed-Join prefix bound k*q + 1), verified with the
    k-banded thresholded levenshtein applied DIRECTLY per candidate.
    The oracle is the all-pairs brute force — the gate re-proves the
    prefix filter's completeness corpus-wide every run. The property
    test plants an exact pair, a 1-edit pair, both sides of the k = 8
    boundary, and pins the full relation against a hand-rolled DP twin.

    Scale shape: grams explode from the title projection (64-char
    keys, never document bodies); candidate slots are
    sum over gram buckets of C(prefix_df, 2) on RAREST-first grams,
    and on LOW-GRAM-ENTROPY corpora (templated titles; this testdata
    has ~377 distinct 3-grams at sf0.1) that degrades toward the
    all-pairs relation — which is why per-candidate cost is kept at
    O(k*len) with ZERO fan-out: two id-keyed title-attach hash joins
    and one banded DP per pair (an earlier shared-gram pre-prune that
    expanded 62 gram rows per candidate measured 350 s at sf0.1; this
    shape measures ~30 s on the SAME 12.2M candidates). The count
    filter's shared-gram statistic is computed for SURVIVORS only, as
    an array_intersect projection. One df groupBy, one doc-keyed
    prefix window, the candidate join + distinct, two title joins —
    every post-gram frame is pair- or doc-cardinality."""
    d = (
        _t(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull())
        .select(
            "doc_id",
            F.substring(
                # RE2∩Java whitespace class (the doc_pii_scrub dialect
                # convention) — Java's \s adds \x0B, RE2's does not
                F.regexp_replace(F.lower(F.col("text")), "[ \\t\\n\\f\\r]+", " "),
                1,
                64,
            ).alias("title"),
        )
        .filter(F.length("title") >= _ED_MINLEN)
    )
    grams = _edit_grams(d)
    return _edit_relation(spark, grams, "doc_title_edit_neardup")


def _edit_grams(d: DataFrame) -> DataFrame:
    """Attach each title's DISTINCT 3-gram array to a (doc_id, title)
    frame — the shared front of the edit-join kernel."""
    return d.select(
        "doc_id",
        "title",
        F.array_distinct(
            F.expr(
                f"transform(sequence(1, length(title) - {_ED_Q - 1}),"
                f" i -> substring(title, i, {_ED_Q}))"
            )
        ).alias("gs"),
    )


def _edit_relation(
    spark: SparkSession, grams: DataFrame, entry_name: str
) -> DataFrame:
    """doc_title_edit_neardup's plan over an arbitrary (doc_id, title,
    gs) frame — Ed-Join rarest-prefix candidates, the lazy linear slot
    budget, banded-levenshtein verification with zero per-pair fan-out
    (see the entry's docstring for the full scale argument). Shared
    with catalog_r13's high-entropy variant so the PRUNING path runs
    the identical kernel the degenerate-corpus entry gates."""
    from pyspark.sql import Window

    stream = grams.select("doc_id", F.explode("gs").alias("gram"))
    df_tab = stream.groupBy("gram").agg(
        F.count(F.lit(1)).cast("long").alias("df")
    )
    prefix = (
        stream.join(df_tab, "gram")
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("doc_id").orderBy(
                    F.asc("df"), F.asc("gram")
                )
            ),
        )
        .filter(F.col("rn") <= _ED_PREFIX)
        .select("doc_id", "gram")
    )
    # spread the probe side before the self-join: the source is a few
    # large splits (often ONE task), and the C(prefix_df, 2) expansion
    # inherits the probe side's partitioning — round-robin keeps it
    # balanced whatever the gram skew (measured: the unspread plan ran
    # the 12.2M-pair expansion + DP on a single task, 140 s vs ~30 s)
    # Degeneracy guard — refuse, don't OOM (the ADC-LUT precedent:
    # that entry refuses the 4.3e9-row combo table). Candidate slots
    # are sum over gram buckets of C(prefix_df, 2); an exact edit join
    # is only scale-sane while that stays LINEAR in the corpus (the
    # prefix filter doing its job). On this templated corpus the
    # measured slope is ~11.5k slots/doc at sf0.1 and ~115k/doc at the
    # 10x union (quadratic growth — candidates are ~all pairs), so the
    # budget slots <= 2^14 * n_docs admits every gated SF and REFUSES
    # the 10x shape with a raise instead of a heap death. The guard is
    # LAZY: a 1-row slot estimate cross-joined under every candidate
    # row; the oracle does not replicate it (engine-resource refusal,
    # not semantics — the KN 2^52 guard convention).
    slot_guard = (
        prefix.groupBy("gram")
        .agg(F.count(F.lit(1)).cast("long").alias("pdf"))
        .agg(
            F.sum(F.expr("pdf * (pdf - 1) div 2")).cast("long").alias("slots")
        )
        .crossJoin(
            F.broadcast(grams.agg(F.count(F.lit(1)).alias("n_docs")))
        )
        .select(
            F.when(
                F.col("slots") > _ED_SLOT_FACTOR * F.col("n_docs"),
                F.raise_error(
                    f"{entry_name}: prefix filter degenerated —"
                    " candidate slots exceed the linear budget"
                ),
            )
            .otherwise(F.lit(1))
            .alias("guard_ok")
        )
    )
    cand = (
        prefix.repartition(spark.sparkContext.defaultParallelism)
        .alias("pa")
        .join(
            prefix.alias("pb"),
            (F.col("pa.gram") == F.col("pb.gram"))
            & (F.col("pa.doc_id") < F.col("pb.doc_id")),
        )
        .select(
            F.col("pa.doc_id").alias("id_a"),
            F.col("pb.doc_id").alias("id_b"),
        )
        .distinct()
        # filter (not a bare drop) so column pruning cannot elide the
        # raise_error projection
        .crossJoin(F.broadcast(slot_guard))
        .filter(F.col("guard_ok") == 1)
        .drop("guard_ok")
    )
    # Verification order matters on low-entropy corpora (the measured
    # lesson: a templated title corpus has ~few hundred distinct grams,
    # so the prefix filter degrades toward all-pairs — 12.2M of 12.5M
    # pairs at sf0.1). The candidate set is whatever the theorem
    # yields, but each candidate must cost O(k·len) and ZERO fan-out:
    # attach the two 64-char titles (plain id-keyed hash joins) and run
    # the k-banded levenshtein DIRECTLY; the per-pair gram-stream
    # expansion (62 rows/pair) that a shared-gram pre-prune would need
    # is deferred to SURVIVORS only (|output| pairs), where it becomes
    # an array_intersect projection over the attached gram arrays.
    ta = grams.select(
        F.col("doc_id").alias("id_a"),
        F.col("title").alias("title_a"),
        F.col("gs").alias("gs_a"),
    )
    tb = grams.select(
        F.col("doc_id").alias("id_b"),
        F.col("title").alias("title_b"),
        F.col("gs").alias("gs_b"),
    )
    survivors = (
        cand.join(ta, "id_a")
        .join(tb, "id_b")
        .withColumn(
            "ed",
            F.expr(f"levenshtein(title_a, title_b, {_ED_K})").cast("long"),
        )
        .filter(F.col("ed") >= 0)
    )
    return survivors.select(
        "id_a",
        "id_b",
        F.length("title_a").cast("long").alias("len_a"),
        F.length("title_b").cast("long").alias("len_b"),
        F.size(F.array_intersect("gs_a", "gs_b"))
        .cast("long")
        .alias("shared_grams"),
        "ed",
    ).orderBy("id_a", "id_b")


# ===========================================================================
# Streaming exactly-once ingest dedup — dropDuplicatesWithinWatermark
# ===========================================================================
#
# At-least-once delivery is the default contract of every real ingest
# bus (Kafka redeliveries, retried batch loads, replayed partitions);
# the sink-side fix is keyed dedup state — Structured Streaming's
# dropDuplicatesWithinWatermark. This entry replays the events table
# with TWO injected duplicate patterns a real bus produces:
#   * same-batch double delivery: every event_id % 11 == 0 row lands
#     TWICE in its own micro-batch;
#   * cross-batch redelivery: every event_id % 7 == 0 row is delivered
#     AGAIN in the NEXT micro-batch (and batch 2's redeliveries form a
#     final all-duplicate batch that must emit zero rows).
# The dedup key is event_id alone; the watermark delay spans the whole
# table range, so every redelivery is suppressed by the STATE STORE
# (not dropped-as-late) — the strongest form of the claim. The oracle
# is simply the original events table: value-hash equality proves the
# operator emitted every unique event exactly once and swallowed every
# injected duplicate, i.e. the replayed at-least-once stream recovered
# exactly-once semantics.
#
# Dedup emits rows immediately in append mode (state is only consulted
# to SUPPRESS, never to hold), so no sentinel flush batches are needed
# — unlike the session/interval-join entries.

_SDD_RESULTS: dict[tuple, str] = {}

# register with the shared stream-workdir cleanup so bench cache clears
# and the atexit hook drop the memo together with its scratch dirs
from idh_etl_demo_spark.catalog_r10 import _STREAM_MEMOS  # noqa: E402

_STREAM_MEMOS.append(_SDD_RESULTS)


def _sdd_land(df: DataFrame, landing: str, b: int) -> None:
    """Write one replay micro-batch as a single parquet file with a
    monotonically increasing mtime (maxFilesPerTrigger=1 feeds files in
    mtime order)."""
    import os
    import shutil

    tmp = os.path.join(landing, f"_stage_{b}")
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    part = next(
        f
        for f in os.listdir(tmp)
        if f.endswith(".parquet") and not f.startswith((".", "_"))
    )
    dest = os.path.join(landing, f"batch-{b}.parquet")
    shutil.move(os.path.join(tmp, part), dest)
    shutil.rmtree(tmp, ignore_errors=True)
    os.utime(dest, (1700000000 + b * 60, 1700000000 + b * 60))


@query(
    "events_streaming_dedup",
    """
    select event_id, ts, user_id, event_type,
           cast(round(value * 1000000, 0) as bigint) as value_micros
    from events
    order by event_id
    """,
)
def events_streaming_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-once recovery of an at-least-once stream, oracle-gated:
    the events table replayed as 3 time-range micro-batches with
    same-batch double deliveries (event_id % 11 == 0) and cross-batch
    redeliveries (event_id % 7 == 0, landed again in the NEXT batch,
    plus a final all-duplicate batch) through
    dropDuplicatesWithinWatermark(event_id) in append mode. The oracle
    is the ORIGINAL table — equality proves every unique event emitted
    exactly once and every injected duplicate was suppressed by the
    keyed state store (the watermark delay spans the table, so nothing
    hides behind a late-drop; section comment).

    EAGER by streaming nature (memoized per session+sf; EAGER_EXEMPT;
    scratch dirs registered with the stream-workdir cleanup). At
    100 TB the dedup state shards by event_id across executors
    (RocksDB provider) and the watermark bounds it: ids older than the
    delay leave the store — the batch alternative (a full-history
    anti-join per micro-batch) is exactly what this operator avoids."""
    import datetime as dt
    import os
    import tempfile

    import pyspark.sql.types as T

    from idh_etl_demo_spark.catalog_r10 import _register_stream_workdir

    key = (spark.sparkContext.applicationId, sf_dir)
    out = _SDD_RESULTS.get(key)
    if out is None:
        work = tempfile.mkdtemp(prefix="sdd_replay_")
        _register_stream_workdir(work)
        landing = os.path.join(work, "landing")
        out = os.path.join(work, "emissions")
        os.makedirs(landing, exist_ok=True)
        events = _t(spark, sf_dir, "events").select(
            "event_id",
            "ts",
            "user_id",
            "event_type",
            F.round(F.col("value") * 1000000, 0)
            .cast("long")
            .alias("value_micros"),
        )
        lo, hi = events.agg(F.min("ts"), F.max("ts")).collect()[0]
        span_us = int((hi - lo).total_seconds() * 1_000_000) + 1
        cuts = [lo] + [
            lo + dt.timedelta(microseconds=span_us * i // 3) for i in (1, 2)
        ]
        prev_redeliveries = None
        for b in range(3):
            cond = F.col("ts") >= F.lit(cuts[b])
            if b < 2:
                cond = cond & (F.col("ts") < F.lit(cuts[b + 1]))
            part = events.filter(cond)
            doubled = part.filter(F.col("event_id") % 11 == 0)
            batch = part.unionAll(doubled)
            if prev_redeliveries is not None:
                batch = batch.unionAll(prev_redeliveries)
            _sdd_land(batch, landing, b)
            prev_redeliveries = part.filter(F.col("event_id") % 7 == 0)
        # batch 3: ONLY batch 2's redeliveries — must emit zero rows
        _sdd_land(prev_redeliveries, landing, 3)

        schema = T.StructType(
            [
                T.StructField("event_id", T.LongType()),
                T.StructField("ts", T.TimestampType()),
                T.StructField("user_id", T.LongType()),
                T.StructField("event_type", T.StringType()),
                T.StructField("value_micros", T.LongType()),
            ]
        )
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(landing)
        )
        delay_days = (hi - lo).days + 2
        deduped = stream.withWatermark(
            "ts", f"{delay_days} days"
        ).dropDuplicatesWithinWatermark(["event_id"])

        def sink(batch: DataFrame, batch_id: int) -> None:
            batch.write.mode("append").parquet(out)

        q = (
            deduped.writeStream.foreachBatch(sink)
            .option("checkpointLocation", os.path.join(work, "ckpt"))
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        _SDD_RESULTS[key] = out

    return (
        spark.read.parquet(out)
        .select("event_id", "ts", "user_id", "event_type", "value_micros")
        .orderBy("event_id")
    )


# ===========================================================================
# Misra-Gries heavy hitters — sketch candidates, exact verification
# ===========================================================================
#
# The frequent-items question ("which n-grams exceed a 1/k share?") is
# the other classic streaming sketch next to CMS/KMV/HLL — and
# Misra-Gries (1982; the Space-Saving family) carries a DISTRIBUTED
# completeness theorem that fits this repo's candidate→verify→oracle
# pattern exactly:
#   * per partition p, MG with k counters undercounts any item by at
#     most n_p/(k+1) (each decrement event destroys k+1 occurrences of
#     mass), so every item with local count > n_p/(k+1) SURVIVES;
#   * pigeonhole: global count > n/k implies some partition has local
#     count > n_p/k >= n_p/(k+1) — so the UNION of per-partition MG
#     survivors is a SUPERSET of the global 1/k heavy hitters,
#     whatever the partition layout.
# The engine therefore: runs weighted MG per partition (an
# Arrow-batched kernel — value_counts per batch, batch-decrement
# eviction), broadcasts the bounded candidate set (≤ partitions·k
# rows) as a semi-join runtime filter, exact-counts ONLY candidates,
# and emits items passing the integer cross-multiplied threshold
# cnt·k > n. The final output is partition-layout-INVARIANT (exact
# verification decides), which is what makes the brute-force DuckDB
# oracle a corpus-wide re-proof of the superset theorem on every run.
#
# Scale: the only corpus-sized exchange is the candidate-filtered
# count groupBy — the full n-gram vocabulary never shuffles (the naive
# plan's cost). Candidate state is k counters per task, n/k output.

_HH_K = 640  # counters per partition AND the 1/k share threshold


def _hh_mg_update(counters: dict, k: int, word: str, w: int) -> None:
    """Weighted Misra-Gries update: add w occurrences of word to a
    k-counter summary. Eviction subtracts d = min(w, min counter) from
    EVERY counter and from the incoming weight — each unit of d
    destroys k+1 units of stream mass, so total undercount per
    partition is <= n_p/(k+1) (the module-comment theorem)."""
    if word in counters:
        counters[word] += w
        return
    while w > 0:
        if len(counters) < k:
            counters[word] = w
            return
        d = min(w, min(counters.values()))
        for key in list(counters):
            counters[key] -= d
            if counters[key] <= 0:
                del counters[key]
        w -= d


_HH_BIGRAM_SQL = """
    with t as (
      select string_split(lower(text), ' ') as ws
      from documents where text is not null
    ),
    s as (
      select ws[i] || ' ' || ws[i+1] as bigram
      from t, unnest(generate_series(1, len(ws) - 1)) as u(i)
      where len(ws) >= 2
    ),
    c as (select bigram, count(*)::bigint as cnt from s group by bigram),
    tot as (select sum(cnt)::bigint as n_total from c)
"""


@query(
    "doc_bigram_heavy_hitters",
    _HH_BIGRAM_SQL
    + f"""
    select bigram, cnt, n_total,
           (cnt * 1000000 // n_total)::bigint as share_ppm
    from c cross join tot
    where cnt * {_HH_K} > n_total
    order by cnt desc, bigram
    """,
)
def doc_bigram_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 1/k heavy hitters over word bigrams (k = 640), computed
    the sketch-first way: weighted Misra-Gries per partition (an
    Arrow-batched mapInPandas kernel), union of survivors broadcast as
    a semi-join runtime filter, exact counts for CANDIDATES ONLY, and
    the integer cross-multiplied threshold cnt*k > n. The output is
    partition-layout-invariant and the oracle is the full groupBy
    brute force — the driver gate re-proves the MG superset theorem
    (section comment) corpus-wide every run. The property test plants
    a skewed corpus where MG genuinely evicts, pins the result against
    an exact twin, and unit-tests the undercount bound.

    Scale shape: the n-gram stream crosses ONE exchange (the
    candidate-filtered count groupBy); the full vocabulary never
    shuffles — candidate state is <= tasks*k rows, output <= k rows.
    The 1-row total and the candidate set ride as broadcasts."""
    import pandas as pd

    docs = (
        _t(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull())
        # spread BEFORE the expansion kernel (the §18/round-12 spread
        # audit): a one-split parquet scan would serialize the whole
        # MG phase AND the exploded stream's map side through one task
        # — same convention as _sa_base's pre-tokenize repartition
        .repartition(spark.sparkContext.defaultParallelism)
        .select(F.split(F.lower(F.col("text")), " ").alias("ws"))
        .filter(F.size("ws") >= 2)
    )
    stream = docs.select(
        F.explode(
            F.expr(
                "transform(sequence(0, size(ws) - 2),"
                " i -> concat(ws[i], ' ', ws[i + 1]))"
            )
        ).alias("bigram")
    )

    def mg_partition(batches):
        counters: dict = {}
        for pdf in batches:
            for word, w in pdf["bigram"].value_counts().items():
                _hh_mg_update(counters, _HH_K, word, int(w))
        yield pd.DataFrame({"bigram": list(counters.keys())})

    cand = stream.mapInPandas(mg_partition, "bigram string").distinct()
    counts = (
        stream.join(F.broadcast(cand), "bigram")
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    tot = stream.agg(F.count(F.lit(1)).cast("long").alias("n_total"))
    return (
        counts.crossJoin(F.broadcast(tot))
        .filter(F.col("cnt") * _HH_K > F.col("n_total"))
        .select(
            "bigram",
            "cnt",
            "n_total",
            F.expr("cnt * 1000000 div n_total").alias("share_ppm"),
        )
        .orderBy(F.desc("cnt"), F.asc("bigram"))
    )


# ===========================================================================
# Rolling z-score anomaly flags — engine-exact windowed statistics
# ===========================================================================
#
# The per-key rolling z-score (is this event unusual vs the key's last
# W observations?) is the standard online anomaly feature. Everything
# up to the final division is EXACT INT64: values land as centi-units
# (2-dp data, lossless), the 7-row frame sums/sum-of-squares are
# integer window aggregates (order-independent, so no fold recipe is
# needed), and the z-score is assembled from the cleared-rational
# identity
#     z = (n*x - s) / sqrt( n*(n*q - s^2) / (n - 1) )
# — one sqrt (bit-exact) and one division over an IDENTICAL tree on
# both engines. Windows with n = 1 or zero variance emit NULL (no
# defined z), identically gated on both sides. The int64 bound is
# guarded: with |value_centi| <= 10^8 the worst product
# n*(n*q - s^2) <= 7^3 * 10^16 < 2^63; beyond it the entry raises
# instead of wrapping (the _kn_guarded_p discipline).

_RZ_W = 6  # preceding rows in the frame (frame size = 7)
_RZ_CENTI_BOUND = 10**8


@query(
    "events_rolling_zscore",
    f"""
    with e as (
      select event_id, user_id, ts,
             cast(round(value * 100, 0) as bigint) as value_centi
      from events where value is not null
    ),
    g as (
      select *,
             case when value_centi > {_RZ_CENTI_BOUND}
                  then error('rolling_zscore: centi bound exceeded')
                  else value_centi end as guarded
      from e
    ),
    w as (
      select event_id, user_id, ts, value_centi,
             count(*) over fr as win_n,
             sum(value_centi) over fr as win_sum,
             sum(value_centi * value_centi) over fr as win_sumsq
      from g
      window fr as (partition by user_id order by ts, event_id
                    rows between {_RZ_W} preceding and current row)
    )
    select event_id, user_id, ts, value_centi,
           cast(win_n as bigint) as win_n,
           cast(win_sum as bigint) as win_sum,
           cast(win_sumsq as bigint) as win_sumsq,
           case when win_n > 1 and win_n * win_sumsq - win_sum * win_sum > 0
                then cast(win_n * value_centi - win_sum as double)
                     / sqrt(cast(win_n * (win_n * win_sumsq - win_sum * win_sum)
                                 as double)
                            / cast(win_n - 1 as double))
                else null end as zscore
    from w
    order by event_id
    """,
)
def events_rolling_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user rolling z-score over the trailing 7-event frame —
    exact int64 window sums in centi-units with the cleared-rational
    z identity (section comment): one sqrt + one division in an
    identical IEEE tree, hash-gated bit-for-bit. n = 1 and
    zero-variance frames emit NULL; values past the 10^8 centi bound
    raise instead of wrapping int64.

    Scale shape: ONE user-keyed window (sort within the user
    partition); the frame is 7 rows whatever the corpus, so state per
    task is constant and the stage tracks the scan."""
    from pyspark.sql import Window

    e = (
        _t(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select(
            "event_id",
            "user_id",
            "ts",
            F.round(F.col("value") * 100, 0).cast("long").alias("value_centi"),
        )
        .withColumn(
            "value_centi",
            F.when(
                F.col("value_centi") > _RZ_CENTI_BOUND,
                F.raise_error("rolling_zscore: centi bound exceeded"),
            ).otherwise(F.col("value_centi")),
        )
    )
    fr = (
        Window.partitionBy("user_id")
        .orderBy(F.asc("ts"), F.asc("event_id"))
        .rowsBetween(-_RZ_W, 0)
    )
    w = e.select(
        "event_id",
        "user_id",
        "ts",
        "value_centi",
        F.count(F.lit(1)).over(fr).cast("long").alias("win_n"),
        F.sum("value_centi").over(fr).cast("long").alias("win_sum"),
        F.sum(F.col("value_centi") * F.col("value_centi"))
        .over(fr)
        .cast("long")
        .alias("win_sumsq"),
    )
    var_num = F.col("win_n") * F.col("win_sumsq") - F.col("win_sum") * F.col(
        "win_sum"
    )
    z = (F.col("win_n") * F.col("value_centi") - F.col("win_sum")).cast(
        "double"
    ) / F.sqrt(
        (F.col("win_n") * var_num).cast("double")
        / (F.col("win_n") - 1).cast("double")
    )
    return w.select(
        "event_id",
        "user_id",
        "ts",
        "value_centi",
        "win_n",
        "win_sum",
        "win_sumsq",
        F.when((F.col("win_n") > 1) & (var_num > 0), z)
        .otherwise(F.lit(None).cast("double"))
        .alias("zscore"),
    ).orderBy("event_id")


# ===========================================================================
# Referential-integrity audit — the dbt-test primitive
# ===========================================================================
#
# The most-run data test in every warehouse is the relationship test:
# every child foreign key must resolve to a parent row (dbt's
# `relationships`, Great Expectations'
# expect_column_values_to_be_in_set over a lookup). The audit is two
# LEFT ANTI joins (orders→customer, lineitem→orders) reduced to
# per-relationship counts with exact int64 ppm rates; a NULL child key
# never matches a parent (identical semantics in Spark's left_anti and
# the oracle's NOT EXISTS) and is also counted separately so a
# null-FK regression is distinguishable from a dangling-FK one.
#
# Scale: each anti join shuffles on the FK — the parent side is
# corpus-cardinality, so no broadcast hints (Catalyst may still choose
# broadcast at small SF; at scale it degrades gracefully to a shuffle
# join). Everything after the joins is a handful of count rows.


@query(
    "orders_fk_integrity",
    """
    select 'orders.o_custkey->customer.c_custkey' as relationship,
           (select count(*) from orders)::bigint as n_child,
           (select count(*) from orders where o_custkey is null)::bigint
             as n_null_fk,
           (select count(*) from orders o where not exists
             (select 1 from customer c where c.c_custkey = o.o_custkey)
           )::bigint as n_orphans,
           ((select count(*) from orders o where not exists
             (select 1 from customer c where c.c_custkey = o.o_custkey))
            * 1000000 // (select count(*) from orders))::bigint
             as orphan_ppm
    union all
    select 'lineitem.l_orderkey->orders.o_orderkey' as relationship,
           (select count(*) from lineitem)::bigint,
           (select count(*) from lineitem where l_orderkey is null)::bigint,
           (select count(*) from lineitem l where not exists
             (select 1 from orders o where o.o_orderkey = l.l_orderkey)
           )::bigint,
           ((select count(*) from lineitem l where not exists
             (select 1 from orders o where o.o_orderkey = l.l_orderkey))
            * 1000000 // (select count(*) from lineitem))::bigint
    order by relationship
    """,
)
def orders_fk_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit (section comment): per FK
    relationship, child count, NULL-key count, dangling-key count
    (left anti join), and exact int64 orphan ppm. Testdata is
    FK-consistent, so the orphan path is pinned by a planted property
    frame (dangling keys + a NULL key), like the profile entry's null
    path."""
    rels = [
        (
            "orders.o_custkey->customer.c_custkey",
            _t(spark, sf_dir, "orders").select(
                F.col("o_custkey").alias("fk")
            ),
            _t(spark, sf_dir, "customer").select(
                F.col("c_custkey").alias("pk")
            ),
        ),
        (
            "lineitem.l_orderkey->orders.o_orderkey",
            _t(spark, sf_dir, "lineitem").select(
                F.col("l_orderkey").alias("fk")
            ),
            _t(spark, sf_dir, "orders").select(
                F.col("o_orderkey").alias("pk")
            ),
        ),
    ]
    parts = []
    for name, child, parent in rels:
        orphans = child.join(
            parent, child["fk"] == parent["pk"], "left_anti"
        ).agg(F.count(F.lit(1)).cast("long").alias("n_orphans"))
        stats = child.agg(
            F.count(F.lit(1)).cast("long").alias("n_child"),
            (F.count(F.lit(1)) - F.count("fk"))
            .cast("long")
            .alias("n_null_fk"),
        )
        parts.append(
            stats.crossJoin(F.broadcast(orphans)).select(
                F.lit(name).alias("relationship"),
                "n_child",
                "n_null_fk",
                "n_orphans",
                F.expr("n_orphans * 1000000 div n_child").alias(
                    "orphan_ppm"
                ),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out.orderBy("relationship")


# ===========================================================================
# Per-user Gini impurity — engine-exact distribution diversity
# ===========================================================================
#
# Entropy is the textbook diversity metric but ln() never gates
# bit-identically across engines (the standing BM25-idf lesson); GINI
# IMPURITY 1 − Σp² carries the same signal as an EXACT RATIONAL:
# with per-user type counts c_i and n = Σc_i,
#     gini = (n² − Σc_i²) / n²
# — integer numerator and denominator, ONE IEEE division in an
# identical tree, plus an exact int64 ppm. The 2·10^6 per-user event
# bound keeps (n² − Σc²)·10^6 < 2^62 (guarded raise past it — the
# _kn_guarded_p discipline; per-user activity is feed-bounded, never
# corpus-bounded).

_GINI_N_BOUND = 2 * 10**6


@query(
    "events_user_gini",
    f"""
    with c as (
      select user_id, event_type, count(*)::bigint as c
      from events group by user_id, event_type
    ),
    u as (
      select user_id,
             sum(c)::bigint as n_events,
             count(*)::bigint as n_types,
             sum(c * c)::bigint as sumsq
      from c group by user_id
    ),
    g as (
      select user_id,
             case when n_events > {_GINI_N_BOUND}
                  then error('events_user_gini: per-user bound exceeded')
                  else n_events end as n_events,
             n_types, sumsq
      from u
    )
    select user_id, n_events, n_types, sumsq,
           cast(n_events * n_events - sumsq as double)
             / cast(n_events * n_events as double) as gini,
           ((n_events * n_events - sumsq) * 1000000
             // (n_events * n_events))::bigint as gini_ppm
    from g
    order by user_id
    """,
)
def events_user_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user Gini impurity of the event-type mix — the
    engine-exact diversity metric (section comment: entropy's ln()
    cannot hash-gate; the Gini rational can). Counts are two
    map-side-combined groupBys ((user, type) then user); the impurity
    is one IEEE division over exact int64 operands plus an exact ppm;
    past the 2e6 per-user bound the entry raises instead of wrapping.

    Scale shape: both exchanges key on the corpus-cardinality user
    axis; nothing after the first groupBy exceeds |user×type| rows."""
    c = _t(spark, sf_dir, "events").groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    u = c.groupBy("user_id").agg(
        F.sum("c").cast("long").alias("n_events"),
        F.count(F.lit(1)).cast("long").alias("n_types"),
        F.sum(F.col("c") * F.col("c")).cast("long").alias("sumsq"),
    )
    g = u.withColumn(
        "n_events",
        F.when(
            F.col("n_events") > _GINI_N_BOUND,
            F.raise_error("events_user_gini: per-user bound exceeded"),
        ).otherwise(F.col("n_events")),
    )
    n2 = F.col("n_events") * F.col("n_events")
    return g.select(
        "user_id",
        "n_events",
        "n_types",
        "sumsq",
        ((n2 - F.col("sumsq")).cast("double") / n2.cast("double")).alias(
            "gini"
        ),
        F.expr(
            "(n_events * n_events - sumsq) * 1000000"
            " div (n_events * n_events)"
        ).alias("gini_ppm"),
    ).orderBy("user_id")


# ===========================================================================
# Freshness / gap audit — two-phase max-gap without a hot-key sort
# ===========================================================================
#
# "When did this feed last stall?" is the standing freshness monitor:
# per event_type, the maximum gap between consecutive events. The
# naive plan is ONE window partitioned by event_type — a 5-value key
# that funnels a fifth of a 100 TB stream through one sort task (the
# exact shape the r10 verdict flagged in lineitem_mad_outliers). The
# scale-safe decomposition is the grouped two-phase trick applied to
# GAPS: consecutive-pair gaps are either WITHIN a (type, day) bucket
# — a local window whose partition is the natural per-type-per-day
# grain — or BETWEEN adjacent non-empty buckets, recovered from the
# per-bucket first/last timestamps with a lag over the
# calendar-bounded |types|·|days| bucket table. max(gap) is the max of
# the two families; avg gap needs no window at all (span/(n−1), exact
# int64 µs). The oracle derives everything from ONE per-type lag
# window — the independent single-sort derivation.


@query(
    "events_freshness_audit",
    """
    with g as (
      select event_type, ts,
             epoch_us(ts) - epoch_us(lag(ts) over
               (partition by event_type order by ts, event_id)) as gap_us
      from events
    ),
    s as (
      select event_type,
             count(*)::bigint as n_events,
             min(ts) as first_ts,
             max(ts) as last_ts,
             max(gap_us)::bigint as max_gap_us
      from g group by event_type
    )
    select event_type, n_events, first_ts, last_ts, max_gap_us,
           case when n_events > 1
                then (epoch_us(last_ts) - epoch_us(first_ts))
                       // (n_events - 1)
                else null end::bigint as avg_gap_us
    from s
    order by event_type
    """,
)
def events_freshness_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type feed-freshness audit: max and mean inter-event gap in
    exact int64 microseconds, computed WITHOUT a low-cardinality-key
    sort (section comment): within-(type, day) gaps ride a local
    window at the natural daily grain; cross-bucket gaps come from a
    lag over the |types|·|days| bucket rollup; the mean is the closed
    form span/(n−1). The oracle is the single per-type lag window —
    rank-free equality between the two derivations is the gate. The
    property test plants a feed with its maximum gap ACROSS a day
    boundary (the case the bucket decomposition must not miss) and an
    intra-day stall."""
    from pyspark.sql import Window

    e = _t(spark, sf_dir, "events").select(
        "event_type",
        "ts",
        "event_id",
        # ts arrives TIMESTAMP_NTZ; the session TZ is pinned UTC, so the
        # cast is epoch-faithful and matches DuckDB's naive epoch_us
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
        F.date_trunc("day", F.col("ts")).alias("bucket"),
    )
    wloc = Window.partitionBy("event_type", "bucket").orderBy(
        F.asc("ts"), F.asc("event_id")
    )
    local = e.withColumn("gap_us", F.col("us") - F.lag("us").over(wloc))
    bucket_stats = local.groupBy("event_type", "bucket").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.min("us").alias("first_us"),
        F.max("us").alias("last_us"),
        F.min("ts").alias("first_ts"),
        F.max("ts").alias("last_ts"),
        F.max("gap_us").alias("local_max_gap"),
    )
    wbkt = Window.partitionBy("event_type").orderBy(F.asc("bucket"))
    bridged = bucket_stats.withColumn(
        "boundary_gap", F.col("first_us") - F.lag("last_us").over(wbkt)
    )
    s = bridged.groupBy("event_type").agg(
        F.sum("n").cast("long").alias("n_events"),
        F.min("first_ts").alias("first_ts"),
        F.max("last_ts").alias("last_ts"),
        F.greatest(
            F.max("local_max_gap"), F.max("boundary_gap")
        ).cast("long").alias("max_gap_us"),
        F.min("first_us").alias("span_first"),
        F.max("last_us").alias("span_last"),
    )
    return s.select(
        "event_type",
        "n_events",
        "first_ts",
        "last_ts",
        "max_gap_us",
        F.when(
            F.col("n_events") > 1,
            F.expr("(span_last - span_first) div (n_events - 1)"),
        )
        .otherwise(F.lit(None).cast("long"))
        .alias("avg_gap_us"),
    ).orderBy("event_type")
