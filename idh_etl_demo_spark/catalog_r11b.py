"""Round-11 late-batch entries — lakehouse table-maintenance and
pipeline-planning primitives beyond the reference surface:

- ``events_rollup_cascade``: hypertable-style HIERARCHICAL continuous
  aggregate (TimescaleDB's cagg-on-cagg): hour partials from raw, day
  from HOUR PARTIALS, week from DAY PARTIALS — raw is scanned exactly
  once, every coarser grain is a merge of the finer grain's mergeable
  state (count/sum/min/max). The oracle recomputes every grain
  DIRECTLY from raw, so value-hash equality is the merge-associativity
  theorem instance (the IVM pair's proof pattern applied to the time
  dimension).

- ``orders_chisq_drift``: two-sample chi-square drift audit between
  consecutive order snapshots (1997 vs 1998) over the
  (priority, status) bins — the TFX-data-validation-style monitor a
  training pipeline runs before trusting a new snapshot. Chi-square
  terms are engine-exact: integer bin counts, one identical
  double-expression tree on both sides (the repo's cleared-rational
  convention; PSI is deliberately NOT used because ln() never gates
  bit-identically across engines — the BM25 idf lesson).

- ``events_key_skew_audit``: the partition planner — per-key load for
  the two join/agg keys the events pipeline shuffles on (event_type:
  5-value hot; user_id: uniform), hot keys flagged against a
  1/parallelism share bound, and the SALT FACTOR the repo's
  salted-join rewrite (promo_period_orders_salted, salted_flag_join)
  would need to bring each shard back under the bound. Detail rows
  are HOT KEYS ONLY (the audit output must stay bounded when the key
  space is corpus-sized); per-key-name summary rows always emit.

Entry contract per repo convention: @query registration with a DuckDB
oracle, a shuffle budget with a why-comment (tests/test_plan_shape.py),
bench.py HEADLINE rows, bench_scale probes, property tests vs
pure-Python twins on planted data (tests/test_r11b_properties.py), and
driver-window first-green slots (__spark_entry__.py annotations).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from idh_etl_demo_spark.catalog import _t, query

# ===========================================================================
# Hierarchical continuous aggregate — hour → day → week cascade
# ===========================================================================
#
# TimescaleDB's hierarchical continuous aggregates (and every streaming
# rollup store since) maintain coarse time grains FROM the next finer
# grain's partials, not from raw — correct exactly because
# count/sum/min/max are commutative monoids, so merge(grain) ==
# direct(grain). This entry materializes the cascade and the oracle
# recomputes each grain straight from the raw table: the driver's
# value-hash equality proves the cascade introduces no drift at any
# grain (the same recompute-vs-delta proof pattern as orders_ivm_agg,
# applied along the time dimension).
#
# Values are quantized to integer MICROS at landing (the repo's
# exact-integer parity recipe): int64 sums are associative, so
# re-aggregating hour partials into days cannot disagree with a direct
# day aggregate the way a differently-associated double sum would.
# avg is DERIVED at read time from the merged sums (one IEEE division,
# identical tree both engines) — never maintained as state.

_RC_GRAINS = ("hour", "day", "week")


@query(
    "events_rollup_cascade",
    """
    with ev as (
      select ts, event_type,
             cast(round(value * 1000000, 0) as bigint) as value_micros
      from events
    ),
    direct as (
      select 'hour' as grain, date_trunc('hour', ts) as bucket_start,
             event_type, count(*)::bigint as n_events,
             cast(sum(value_micros) as bigint) as sum_value_micros,
             min(value_micros) as min_value_micros,
             max(value_micros) as max_value_micros
      from ev group by 2, 3
      union all
      select 'day', date_trunc('day', ts), event_type, count(*)::bigint,
             cast(sum(value_micros) as bigint),
             min(value_micros), max(value_micros)
      from ev group by 2, 3
      union all
      select 'week', date_trunc('week', ts), event_type, count(*)::bigint,
             cast(sum(value_micros) as bigint),
             min(value_micros), max(value_micros)
      from ev group by 2, 3
    )
    select grain, bucket_start, event_type, n_events, sum_value_micros,
           min_value_micros, max_value_micros,
           cast(sum_value_micros as double) / cast(n_events as double)
             as avg_value_micros
    from direct
    order by grain, bucket_start, event_type
    """,
)
def events_rollup_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical time rollup (section comment): hour partials from
    raw events, day buckets merged from HOUR partials, week buckets
    merged from DAY partials; output is the union of all three grains.
    The oracle aggregates every grain directly from raw — equality
    proves merge(partials) == direct(raw) at each grain, i.e. the
    cascade a hypertable serves dashboards from is exact.

    Scale shape: raw rows cross exactly ONE exchange (the hour
    groupBy, map-side combined); the day and week groupBys see only
    the previous grain's calendar-bounded partials (|hours|·|types|,
    then |days|·|types| rows — independent of corpus size), and the
    presentation sort sees the union of the three bounded grain
    tables. At 100 TB nothing past the first partial aggregation
    touches event-cardinality data, which is exactly why real rollup
    stores maintain coarse grains from fine partials instead of
    re-scanning raw."""
    ev = _t(spark, sf_dir, "events").select(
        F.col("ts"),
        F.col("event_type"),
        F.round(F.col("value") * 1000000, 0).cast("long").alias("value_micros"),
    )
    hour = ev.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("bucket_start"),
        F.col("event_type"),
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.sum("value_micros").cast("long").alias("sum_value_micros"),
        F.min("value_micros").alias("min_value_micros"),
        F.max("value_micros").alias("max_value_micros"),
    )

    def _merge_up(finer: DataFrame, grain: str) -> DataFrame:
        # the cascade step: coarser grain from the FINER GRAIN'S
        # partials (count→sum, sum→sum, min→min, max→max)
        return finer.groupBy(
            F.date_trunc(grain, F.col("bucket_start")).alias("bucket_start"),
            F.col("event_type"),
        ).agg(
            F.sum("n_events").cast("long").alias("n_events"),
            F.sum("sum_value_micros").cast("long").alias("sum_value_micros"),
            F.min("min_value_micros").alias("min_value_micros"),
            F.max("max_value_micros").alias("max_value_micros"),
        )

    day = _merge_up(hour, "day")
    week = _merge_up(day, "week")
    grains = [
        grained.select(F.lit(name).alias("grain"), "*")
        for name, grained in (("hour", hour), ("day", day), ("week", week))
    ]
    out = grains[0].unionByName(grains[1]).unionByName(grains[2])
    return out.select(
        "grain",
        "bucket_start",
        "event_type",
        "n_events",
        "sum_value_micros",
        "min_value_micros",
        "max_value_micros",
        (
            F.col("sum_value_micros").cast("double")
            / F.col("n_events").cast("double")
        ).alias("avg_value_micros"),
    ).orderBy("grain", "bucket_start", "event_type")


# ===========================================================================
# Two-sample chi-square drift audit — snapshot vs snapshot
# ===========================================================================
#
# Before a training pipeline trusts a new data snapshot it compares the
# new distribution against the last-known-good one (TFX Data
# Validation, Evidently, every drift monitor): per categorical bin,
# observed-new vs expected-under-base counts, chi-square contribution
# per bin. The statistic here is the classic two-sample homogeneity
# term  (cur_i − E_i)² / E_i  with  E_i = n_cur · base_i / n_base,
# algebraically cleared to
#     (cur_i·n_base − base_i·n_cur)² / (n_base · base_i · n_cur)
# — the numerator difference is computed in EXACT int64 (products stay
# < 2^62 under the guarded 2^31 total bound, wrap-checked like
# _kn_guarded_p), and the two divisions/multiplications run in doubles
# with an IDENTICAL expression tree on both engines. Bins present only
# in the new snapshot (base_i = 0) have no defined expectation — they
# are flagged is_new_bin and their term is NULL (a new category is a
# schema-drift signal of its own, not a chi-square contribution).

_CHISQ_TOTAL_BOUND = 2**31


@query(
    "orders_chisq_drift",
    """
    with bins as (
      select o_orderpriority, o_orderstatus,
             cast(sum(case when year(o_orderdate) = 1997 then 1 else 0 end)
                  as bigint) as n_base_bin,
             cast(sum(case when year(o_orderdate) = 1998 then 1 else 0 end)
                  as bigint) as n_cur_bin
      from orders
      where year(o_orderdate) in (1997, 1998)
      group by 1, 2
    ),
    tot as (
      select cast(sum(n_base_bin) as bigint) as n_base,
             cast(sum(n_cur_bin) as bigint) as n_cur
      from bins
    )
    select o_orderpriority, o_orderstatus, n_base_bin, n_cur_bin,
           n_base, n_cur,
           (n_base_bin = 0) as is_new_bin,
           cast(n_cur * n_base_bin as double) / cast(n_base as double)
             as expected_cur,
           case when n_base_bin > 0 then
             (cast(n_cur_bin * n_base - n_base_bin * n_cur as double)
              * cast(n_cur_bin * n_base - n_base_bin * n_cur as double))
             / (cast(n_base as double) * cast(n_base_bin as double)
                * cast(n_cur as double))
           else null end as chisq_term
    from bins cross join tot
    order by o_orderpriority, o_orderstatus
    """,
)
def orders_chisq_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution drift between the 1997 (base) and 1998 (current)
    order snapshots over (priority, status) bins (section comment):
    per-bin observed counts for both snapshots, the expected current
    count under the base distribution, and the exact chi-square
    homogeneity term — the audit table a drift monitor thresholds
    before promoting a snapshot into a training mix.

    Scale shape: ONE pass over the fact table into a map-side-combined
    groupBy on the bin key (bin cardinality = |priorities|·|statuses|,
    data-independent); totals are a second aggregate OVER THE BIN
    TABLE (never a second raw scan) attached as a broadcast 1-row
    frame; every derived column is a projection. The int64 cross
    products are wrap-guarded at a 2^31 total bound (raise, never
    silently wrap — the _kn_guarded_p convention)."""
    o = _t(spark, sf_dir, "orders")
    y = F.year(F.col("o_orderdate"))
    bins = (
        o.filter(y.isin(1997, 1998))
        .groupBy("o_orderpriority", "o_orderstatus")
        .agg(
            F.sum((y == 1997).cast("long")).cast("long").alias("n_base_bin"),
            F.sum((y == 1998).cast("long")).cast("long").alias("n_cur_bin"),
        )
    )
    tot = bins.agg(
        F.sum("n_base_bin").cast("long").alias("n_base"),
        F.sum("n_cur_bin").cast("long").alias("n_cur"),
    )
    guard_ok = (F.col("n_base") < F.lit(_CHISQ_TOTAL_BOUND)) & (
        F.col("n_cur") < F.lit(_CHISQ_TOTAL_BOUND)
    )
    diff = F.col("n_cur_bin") * F.col("n_base") - F.col("n_base_bin") * F.col(
        "n_cur"
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    term = (diff.cast("double") * diff.cast("double")) / (
        d("n_base") * d("n_base_bin") * d("n_cur")
    )
    guarded_term = F.when(
        guard_ok,
        F.when(F.col("n_base_bin") > 0, term).otherwise(F.lit(None)),
    ).otherwise(
        F.raise_error(
            F.lit(
                "chi-square exactness bound exceeded: a snapshot total "
                "reached 2^31, int64 cross products would wrap "
                "(catalog_r11b)"
            )
        ).cast("double")
    )
    return (
        bins.crossJoin(F.broadcast(tot))
        .select(
            "o_orderpriority",
            "o_orderstatus",
            "n_base_bin",
            "n_cur_bin",
            "n_base",
            "n_cur",
            (F.col("n_base_bin") == 0).alias("is_new_bin"),
            (
                (F.col("n_cur") * F.col("n_base_bin")).cast("double")
                / F.col("n_base").cast("double")
            ).alias("expected_cur"),
            guarded_term.alias("chisq_term"),
        )
        .orderBy("o_orderpriority", "o_orderstatus")
    )


# ===========================================================================
# Key-skew audit — the salting planner
# ===========================================================================
#
# Every shuffle in this catalog hashes on some key; a key whose share
# exceeds 1/parallelism caps the stage at one straggler task. This
# audit measures per-key load for the two keys the events pipeline
# shuffles on — event_type (5 values, every one hot by construction)
# and user_id (uniform) — and, for each hot key, the salt factor the
# repo's salted-join rewrite (promo_period_orders_salted,
# salted_flag_join) needs: the smallest S with count/S ≤ total/P,
# i.e. S = ceil(count·P / total), all in exact int64 ceiling division.
#
# Both per-key load tables derive from ONE raw-seeing exchange: raw
# groups once on the composite (event_type, user_id) key, and each
# audited key rolls up from those |types|·|users| partials — the
# rollup-cascade trick applied to the audit itself. Detail rows emit
# for HOT keys only (at 100 TB the key space is corpus-sized; an audit
# that lists every key is itself a scale bug); per-key-name summary
# rows (key count, total, the maximum single-key load and its salt)
# always emit, so a skew-free key still reports measured evidence.

_SKEW_PARALLELISM = 32


@query(
    "events_key_skew_audit",
    f"""
    with pre as (
      select event_type, user_id, count(*)::bigint as n
      from events group by 1, 2
    ),
    loads as (
      select 'event_type' as key_name, event_type as key_value,
             cast(sum(n) as bigint) as n_events_key
      from pre group by 2
      union all
      select 'user_id', cast(user_id as varchar), cast(sum(n) as bigint)
      from pre group by 2
    ),
    tot as (
      select key_name, cast(sum(n_events_key) as bigint) as n_total,
             count(*)::bigint as n_keys,
             max(n_events_key) as max_key_load
      from loads group by 1
    ),
    hot as (
      select l.key_name, l.key_value, l.n_events_key, t.n_keys, t.n_total
      from loads l join tot t using (key_name)
      where l.n_events_key * {_SKEW_PARALLELISM} > t.n_total
    )
    select 'hot_key' as kind, key_name, key_value, n_events_key, n_keys,
           n_total,
           n_events_key * 1000000 // n_total as share_ppm,
           (n_events_key * {_SKEW_PARALLELISM} + n_total - 1) // n_total
             as salt,
           ((n_events_key + (n_events_key * {_SKEW_PARALLELISM} + n_total - 1)
               // n_total - 1)
             // ((n_events_key * {_SKEW_PARALLELISM} + n_total - 1) // n_total))
             * 1000000 // n_total as post_salt_share_ppm
    from hot
    union all
    select 'summary', key_name, null, max_key_load, n_keys, n_total,
           max_key_load * 1000000 // n_total,
           case when max_key_load * {_SKEW_PARALLELISM} > n_total
                then (max_key_load * {_SKEW_PARALLELISM} + n_total - 1)
                       // n_total
                else 1 end,
           ((max_key_load
              + case when max_key_load * {_SKEW_PARALLELISM} > n_total
                     then (max_key_load * {_SKEW_PARALLELISM} + n_total - 1)
                            // n_total
                     else 1 end - 1)
             // case when max_key_load * {_SKEW_PARALLELISM} > n_total
                     then (max_key_load * {_SKEW_PARALLELISM} + n_total - 1)
                            // n_total
                     else 1 end)
             * 1000000 // n_total
    from tot
    order by kind, key_name, n_events_key desc, key_value
    """,
)
def events_key_skew_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hot-key/salting audit for the events pipeline's shuffle keys
    (section comment): per-key load shares against a 1/32 parallelism
    bound, exact-integer salt factors for hot keys, and the post-salt
    share each hot key lands at — the planning table that decides
    whether a join needs the salted rewrite BEFORE it straggles.

    Output: ``hot_key`` detail rows (bounded — only keys over the
    share bound) and one ``summary`` row per audited key (key count,
    total, max single-key load and its salt). All derived columns are
    exact int64 ceiling/floor divisions — ppm shares, never float.

    Scale shape: raw crosses ONE map-side-combined exchange (the
    composite (event_type, user_id) pre-aggregation); both per-key
    load tables and their totals roll up from those partials; the hot
    filter needs the 2-row totals broadcast; the presentation sort
    sees hot + summary rows only."""
    S = _SKEW_PARALLELISM
    pre = (
        _t(spark, sf_dir, "events")
        .groupBy("event_type", "user_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    loads = (
        pre.groupBy("event_type")
        .agg(F.sum("n").cast("long").alias("n_events_key"))
        .select(
            F.lit("event_type").alias("key_name"),
            F.col("event_type").alias("key_value"),
            "n_events_key",
        )
        .unionByName(
            pre.groupBy("user_id")
            .agg(F.sum("n").cast("long").alias("n_events_key"))
            .select(
                F.lit("user_id").alias("key_name"),
                F.col("user_id").cast("string").alias("key_value"),
                "n_events_key",
            )
        )
    )
    tot = loads.groupBy("key_name").agg(
        F.sum("n_events_key").cast("long").alias("n_total"),
        F.count(F.lit(1)).cast("long").alias("n_keys"),
        F.max("n_events_key").alias("max_key_load"),
    )

    def _derived(base: DataFrame, kind: str, load_col: str) -> DataFrame:
        # all quotients via integer `div` — never a double `/` + cast,
        # which can round UP across an integer boundary before the
        # truncation (the exact-int64 convention)
        return (
            base.withColumn("kind", F.lit(kind))
            .withColumn("n_load", F.col(load_col).cast("long"))
            .withColumn(
                "share_ppm", F.expr("(n_load * 1000000) div n_total")
            )
            .withColumn(
                # smallest S' with n/S' ≤ total/P: ceil(n·P / total);
                # 1 when the key is not hot (no split needed)
                "salt",
                F.when(
                    F.col("n_load") * S > F.col("n_total"),
                    F.expr(
                        f"(n_load * {S} + n_total - 1) div n_total"
                    ),
                ).otherwise(F.lit(1).cast("long")),
            )
            .withColumn(
                "post_salt_share_ppm",
                F.expr(
                    "(((n_load + salt - 1) div salt) * 1000000) div n_total"
                ),
            )
        )

    hot = _derived(
        loads.join(F.broadcast(tot), "key_name").filter(
            F.col("n_events_key") * S > F.col("n_total")
        ),
        "hot_key",
        "n_events_key",
    ).select(
        "kind",
        "key_name",
        "key_value",
        "n_events_key",
        "n_keys",
        "n_total",
        "share_ppm",
        "salt",
        "post_salt_share_ppm",
    )
    summary = _derived(tot, "summary", "max_key_load").select(
        "kind",
        "key_name",
        F.lit(None).cast("string").alias("key_value"),
        F.col("max_key_load").alias("n_events_key"),
        "n_keys",
        "n_total",
        "share_ppm",
        "salt",
        "post_salt_share_ppm",
    )
    return hot.unionByName(summary).orderBy(
        "kind", "key_name", F.desc("n_events_key"), "key_value"
    )
