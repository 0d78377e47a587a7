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


# ===========================================================================
# Prefix-filtered set-CONTAINMENT self-join — asymmetric near-dup
# ===========================================================================
#
# The Jaccard join (doc_setsim_prefix_join) is blind to INCLUSION: a
# short document quoted wholesale inside a much larger one has
# |A∩B|/|A| ≈ 1 but Jaccard ≈ |A|/|B| — far under any symmetric
# threshold. Containment C(A→B) = |A∩B| / |A| ≥ t is the predicate
# dedup pipelines use for quote/boilerplate/inclusion mining (Broder's
# original resemblance/containment pair, SSJoin §4), and it has its
# own prefix-filter theorem: if C(A→B) ≥ t then A shares ≥ ⌈t·|A|⌉
# elements with B, so at least one of A's p = |A| − ⌈t·|A|⌉ + 1
# rarest-first prefix elements appears in B — candidates are
# prefix(A) ⋈ FULL-stream(B) on the shingle (only the probe side is
# prefix-truncated; the indexed side must stay complete because the
# match may sit anywhere in B). The oracle is the all-ordered-pairs
# brute force, so every run re-proves the asymmetric filter's
# completeness corpus-wide.

_CONT_T_NUM, _CONT_T_DEN = 4, 5  # containment threshold t = 0.8, rational


def _cont_oracle_prelude() -> str:
    from idh_etl_demo_spark.catalog_r10 import _SSIM_SETS_SQL

    return _SSIM_SETS_SQL


def _cont_parts(spark: SparkSession, sf_dir: str):
    """(prefix, full) frames for the containment candidate join.

    prefix: (id_small, gh, s_a, df) — the probe side's rarest-first
    prefix slots (rank ≤ p = s − ⌈t·s⌉ + 1).
    full: (id_big, gh_b, s_b, r_b) — the COMPLETE indexed-side stream
    (the match may sit anywhere in B), each slot carrying B's size and
    the slot's rarest-first rank within B, so the candidate join can
    apply the two theorem-safe prunes as integer cross-multiplications
    in the join condition:

    - LENGTH: C(A→B) ≥ t forces inter ≥ ⌈t·s_a⌉ and inter ≤ s_b, so
      postings with t_den·s_b < t_num·s_a can never complete a pair.
    - POSITIONAL (first-collision theorem): for a true pair, the
      globally rarest common element e has A-rank ≤ p (else A's prefix
      would miss B entirely) and EVERY common element sits at B-rank
      ≥ r_b(e) (B's rank order is the global (df, gh) order restricted
      to B), so inter ≤ s_b − r_b(e) + 1 — slot rows with
      t_den·(s_b − r_b + 1) < t_num·s_a prune before the distinct.
      Completeness: the first-collision row itself always passes both
      bounds, so every true pair survives. The A-side mirror
      (t_den·(s_a − r_a + 1) ≥ t_num·s_a) is exactly implied by the
      prefix cut r_a ≤ p — 5·(s_a − r + 1) ≥ 5·⌈4·s_a/5⌉ ≥ 4·s_a —
      so it is already applied, for free, by the rn ≤ p filter.
    """
    from idh_etl_demo_spark.catalog_r10 import _ssim_streams

    stream, sizes = _ssim_streams(spark, sf_dir)
    return _cont_parts_of(stream, sizes)


def _cont_parts_of(stream: DataFrame, sizes: DataFrame):
    """_cont_parts over an arbitrary (stream, sizes) pair — the prefix
    cut and both prune columns parameterized by corpus so derived
    corpora (catalog_r13's heavy-tailed SPLIT-re-publication corpus)
    reuse the identical kernel. (Prefix truncation was the REJECTED
    r13 design — slot_reduction 1.0; see catalog_r13's section
    comment.)"""
    from pyspark.sql import Window

    df_tab = stream.groupBy("gh").agg(
        F.count(F.lit(1)).cast("long").alias("df")
    )
    ranked = (
        stream.join(df_tab, "gh")
        .join(sizes, "doc_id")
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("doc_id").orderBy(F.asc("df"), F.asc("gh"))
            ),
        )
    )
    prefix = (
        ranked.withColumn(
            "p",
            F.col("s")
            - F.expr(
                f"({_CONT_T_NUM} * s + {_CONT_T_DEN - 1}) div {_CONT_T_DEN}"
            )
            + 1,
        )
        .filter(F.col("rn") <= F.col("p"))
        .select(
            F.col("doc_id").alias("id_small"),
            "gh",
            F.col("s").alias("s_a"),
            "df",
        )
    )
    full = ranked.select(
        F.col("doc_id").alias("id_big"),
        F.col("gh").alias("gh_b"),
        F.col("s").alias("s_b"),
        F.col("rn").alias("r_b"),
    )
    return prefix, full


def _cont_pruned_cond():
    return (
        (F.col("gh") == F.col("gh_b"))
        & (F.col("id_small") != F.col("id_big"))
        & (
            F.lit(_CONT_T_DEN) * F.col("s_b")
            >= F.lit(_CONT_T_NUM) * F.col("s_a")
        )
        & (
            F.lit(_CONT_T_DEN) * (F.col("s_b") - F.col("r_b") + 1)
            >= F.lit(_CONT_T_NUM) * F.col("s_a")
        )
    )


@query(
    "doc_containment_join",
    f"""
    with {_cont_oracle_prelude()},
    pairs as (
      select a.doc_id as id_small, b.doc_id as id_big,
             cast(len(list_intersect(a.ts, b.ts)) as bigint) as inter,
             a.s as s_small, b.s as s_big
      from ne a join ne b on a.doc_id != b.doc_id
    )
    select id_small, id_big, inter,
           cast(s_small as bigint) as s_small,
           cast(s_big as bigint) as s_big,
           cast(inter as double) / cast(s_small as double) as containment
    from pairs
    where {_CONT_T_DEN} * inter >= {_CONT_T_NUM} * s_small
    order by id_small, id_big
    """,
)
def doc_containment_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact containment ≥ 0.8 self-join over 5-shingle sets (section
    comment): ordered pairs (id_small ⊆~ id_big) where at least 80% of
    the small document's shingles appear in the big one — the
    asymmetric inclusion relation the symmetric Jaccard join cannot
    see. Candidates come from the probe side's rarest-first prefix
    (p = s − ⌈t·s⌉ + 1 shingles) joined against the FULL shingle
    stream under the two theorem-safe prunes (_cont_parts docstring):
    the LENGTH filter 5·s_b ≥ 4·s_a and the first-collision POSITIONAL
    bound 5·(s_b − r_b + 1) ≥ 4·s_a, both integer cross-
    multiplications evaluated inside the gh-keyed hash join so pruned
    slots never reach the distinct or the verification joins.
    Verification counts exact intersections on candidate pairs only;
    the threshold is the integer cross-multiplication
    5·inter ≥ 4·s_small (no float boundary). The oracle is the
    all-ordered-pairs brute force — the gate re-proves the asymmetric
    prefix filter's completeness theorem (WITH both prunes applied) on
    the real corpus every run; doc_containment_audit measures the slot
    reduction the prunes buy.

    Scale shape: same skeleton as doc_setsim_prefix_join — one df
    groupBy, one per-doc rank window over id+hash rows shared by both
    join sides, and candidate expansion Σ over gh of
    prefix_df(gh)·(surviving full slots) — the positional bound caps
    the full side's contribution per probe size, so a deep posting
    list no longer multiplies against every probe. Sizes derive from
    the exploded stream and join as PLAIN hash joins
    (corpus-cardinality, never broadcast). Full sets never shuffle;
    text never leaves the scan."""
    from idh_etl_demo_spark.catalog_r10 import _ssim_streams

    stream, sizes = _ssim_streams(spark, sf_dir)
    return _containment_relation(stream, sizes)


def _containment_relation(stream: DataFrame, sizes: DataFrame) -> DataFrame:
    """doc_containment_join's plan over an arbitrary (stream, sizes)
    corpus — prefix⋈full candidates under both prunes, exact
    intersection verification, integer threshold (see the entry's
    docstring for the full scale argument)."""
    prefix, full = _cont_parts_of(stream, sizes)
    cand = (
        prefix.join(full, _cont_pruned_cond())
        .select("id_small", "id_big")
        .distinct()
    )
    ta = stream.select(F.col("doc_id").alias("id_small"), "gh")
    tb = stream.select(F.col("doc_id").alias("id_big"), "gh")
    inter = (
        cand.join(ta, "id_small")
        .join(tb, ["id_big", "gh"])
        .groupBy("id_small", "id_big")
        .agg(F.count(F.lit(1)).cast("long").alias("inter"))
    )
    sa = sizes.select(
        F.col("doc_id").alias("id_small"), F.col("s").alias("s_small")
    )
    sb = sizes.select(
        F.col("doc_id").alias("id_big"), F.col("s").alias("s_big")
    )
    return (
        inter.join(sa, "id_small")
        .join(sb, "id_big")
        .filter(
            _CONT_T_DEN * F.col("inter") >= _CONT_T_NUM * F.col("s_small")
        )
        .select(
            "id_small",
            "id_big",
            "inter",
            F.col("s_small").cast("long").alias("s_small"),
            F.col("s_big").cast("long").alias("s_big"),
            (
                F.col("inter").cast("double")
                / F.col("s_small").cast("double")
            ).alias("containment"),
        )
        .orderBy("id_small", "id_big")
    )


def _cont_audit_sql(prelude: str) -> str:
    """The containment audit's SQL over any prelude that defines an
    ``ne (doc_id, ts, s)`` CTE — shared by doc_containment_audit and
    catalog_r13's heavy-tailed SPLIT-re-publication corpus (prefix
    truncation was measured useless in r13 and rejected)."""
    return f"""
    with {prelude},
    stream as (select doc_id, unnest(ts) as gh from ne),
    dft as (select gh, count(*)::bigint as df from stream group by gh),
    ranked as (
      select s.doc_id, s.gh, d.df, n.s,
             row_number() over (
               partition by s.doc_id order by d.df asc, s.gh asc) as rn
      from stream s join dft d using (gh) join ne n on n.doc_id = s.doc_id
    ),
    pre as (
      select doc_id as id_small, gh, s as s_a, df from ranked
      where rn <= s - ({_CONT_T_NUM} * s + {_CONT_T_DEN - 1})
                      // {_CONT_T_DEN} + 1
    ),
    ful as (select doc_id as id_big, gh, s as s_b, rn as r_b from ranked),
    pj as (
      select p.id_small, f.id_big
      from pre p join ful f on p.gh = f.gh and p.id_small != f.id_big
       and {_CONT_T_DEN} * f.s_b >= {_CONT_T_NUM} * p.s_a
       and {_CONT_T_DEN} * (f.s_b - f.r_b + 1) >= {_CONT_T_NUM} * p.s_a
    ),
    tots as (
      select (select count(*) from ne)::bigint as n_sets,
             (select coalesce(sum(df - 1), 0) from pre)::bigint
               as unpruned_slots,
             (select count(*) from pj)::bigint as pruned_slots,
             (select count(*) from (
                select distinct id_small, id_big from pj))::bigint
               as n_candidates,
             (select count(*) from ne a join ne b on a.doc_id != b.doc_id
               where {_CONT_T_DEN} * len(list_intersect(a.ts, b.ts))
                     >= {_CONT_T_NUM} * a.s)::bigint as n_qualifying
    )
    select n_sets, unpruned_slots, pruned_slots, n_candidates, n_qualifying,
           case when unpruned_slots > 0
                then cast(pruned_slots as double)
                     / cast(unpruned_slots as double)
                else null end as slot_reduction
    from tots
    """


@query("doc_containment_audit", _cont_audit_sql(_cont_oracle_prelude()))
def doc_containment_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The containment prunes' work reduction, MEASURED (1 row):
    unpruned_slots = Σ over probe prefix slots of (df(gh) − 1) — the
    pair expansions the unpruned prefix⋈full-stream join performs
    (closed form: each prefix slot meets every other posting of its
    shingle) — vs pruned_slots = the expansions surviving the LENGTH
    and POSITIONAL bounds (_cont_parts docstring), alongside the
    distinct candidate count and the number of qualifying pairs.
    slot_reduction = pruned/unpruned is THE number the round-11
    verdict asked to measure: the prunes' value on the real corpus,
    emitted per run so a degradation (a corpus whose sizes defeat the
    length filter) is a visible number, not a slow probe.

    Scale shape: unpruned_slots is an aggregate over the prefix frame
    (never expanded); only the PRUNED join is executed — the audit
    never performs the expansion it reports on. The qualifying count
    re-runs the entry's own plan."""
    from idh_etl_demo_spark.catalog_r10 import _ssim_streams

    stream, sizes = _ssim_streams(spark, sf_dir)
    return _cont_audit_frame(stream, sizes)


def _cont_audit_frame(stream: DataFrame, sizes: DataFrame) -> DataFrame:
    """doc_containment_audit's plan over an arbitrary (stream, sizes)
    corpus (see the entry docstring)."""
    prefix, full = _cont_parts_of(stream, sizes)
    n_sets = sizes.agg(F.count(F.lit(1)).cast("long").alias("n_sets"))
    unpruned = prefix.agg(
        F.coalesce(F.sum(F.col("df") - 1), F.lit(0))
        .cast("long")
        .alias("unpruned_slots")
    )
    pj = prefix.join(full, _cont_pruned_cond()).select("id_small", "id_big")
    pruned = pj.agg(
        F.count(F.lit(1)).cast("long").alias("pruned_slots")
    )
    ncand = pj.distinct().agg(
        F.count(F.lit(1)).cast("long").alias("n_candidates")
    )
    nq = _containment_relation(stream, sizes).agg(
        F.count(F.lit(1)).cast("long").alias("n_qualifying")
    )
    return (
        n_sets.crossJoin(F.broadcast(unpruned))
        .crossJoin(F.broadcast(pruned))
        .crossJoin(F.broadcast(ncand))
        .crossJoin(F.broadcast(nq))
        .select(
            "n_sets",
            "unpruned_slots",
            "pruned_slots",
            "n_candidates",
            "n_qualifying",
            F.when(
                F.col("unpruned_slots") > 0,
                F.col("pruned_slots").cast("double")
                / F.col("unpruned_slots").cast("double"),
            ).alias("slot_reduction"),
        )
    )


# ===========================================================================
# Language-ID confusion matrix — classifier evaluation as a table
# ===========================================================================
#
# The documents table carries GROUND-TRUTH language labels, and
# doc_lang_id predicts from marker-token counts — so the corpus
# supports the evaluation table every curation pipeline keeps next to
# its classifier: the confusion matrix, normalized both ways. Each
# (lang_true, lang_pred) cell carries its count, its row share
# (n / n_true — per-class RECALL on the diagonal, miss distribution
# off it) and its column share (n / n_pred — per-class PRECISION on
# the diagonal, contamination off it). Both shares are one exact
# int64→double division each, identical trees both engines.


def _langid_confusion_sql() -> str:
    from idh_etl_demo_spark.catalog_llm import _WORDS
    from idh_etl_demo_spark.operators.text import LANG_MARKERS

    score_cols = []
    for lang, markers in sorted(LANG_MARKERS.items()):
        inlist = ", ".join(f"'{m}'" for m in markers)
        score_cols.append(
            f"len(list_filter(toks, w -> w in ({inlist}))) as score_{lang}"
        )
    langs = sorted(LANG_MARKERS)
    best = "greatest(" + ", ".join(f"score_{l}" for l in langs) + ")"
    label = "'und'"
    for l in reversed(langs):
        label = (
            f"case when score_{l} = {best} and {best} > 0 "
            f"then '{l}' else {label} end"
        )
    return f"""
    with base as (
      select lang, list_filter({_WORDS}, w -> w != '') as toks
      from documents
    ),
    scored as (select lang, {", ".join(score_cols)} from base),
    pred as (select lang as lang_true, {label} as lang_pred from scored),
    conf as (
      select lang_true, lang_pred, count(*)::bigint as n_docs
      from pred group by 1, 2
    ),
    rt as (
      select lang_true, cast(sum(n_docs) as bigint) as n_true
      from conf group by 1
    ),
    ct as (
      select lang_pred, cast(sum(n_docs) as bigint) as n_pred
      from conf group by 1
    )
    select lang_true, lang_pred, n_docs, n_true, n_pred,
           (lang_true = lang_pred) as is_correct,
           cast(n_docs as double) / cast(n_true as double) as recall_share,
           cast(n_docs as double) / cast(n_pred as double) as precision_share
    from conf join rt using (lang_true) join ct using (lang_pred)
    order by lang_true, lang_pred
    """


@query("doc_langid_confusion", _langid_confusion_sql())
def doc_langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confusion matrix for the doc_lang_id heuristic against the
    documents table's ground-truth labels (section comment): per
    (lang_true, lang_pred) cell, the count, the recall-normalized row
    share and the precision-normalized column share — diagonal cells
    read directly as per-class recall/precision, off-diagonal cells as
    the miss/contamination distribution a curation pipeline uses to
    decide whether the classifier is safe for a language split.

    Scale shape: the classifier is a projection (marker-count argmax —
    no shuffle); the corpus crosses ONE map-side-combined exchange
    (the (true, pred) groupBy, cells bounded by (|langs|+1)²); row and
    column totals re-aggregate the cell table and join back as
    BROADCASTS (bounded by |langs|+1 rows — a legitimate broadcast,
    unlike per-doc tables); the presentation sort sees cells only."""
    from idh_etl_demo_spark.operators.text import language_id

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text", "lang")
    pred = language_id(docs).select(
        F.col("lang").alias("lang_true"), "lang_pred"
    )
    conf = pred.groupBy("lang_true", "lang_pred").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs")
    )
    rt = conf.groupBy("lang_true").agg(
        F.sum("n_docs").cast("long").alias("n_true")
    )
    ct = conf.groupBy("lang_pred").agg(
        F.sum("n_docs").cast("long").alias("n_pred")
    )
    return (
        conf.join(F.broadcast(rt), "lang_true")
        .join(F.broadcast(ct), "lang_pred")
        .select(
            "lang_true",
            "lang_pred",
            "n_docs",
            "n_true",
            "n_pred",
            (F.col("lang_true") == F.col("lang_pred")).alias("is_correct"),
            (F.col("n_docs").cast("double") / F.col("n_true").cast("double"))
            .alias("recall_share"),
            (F.col("n_docs").cast("double") / F.col("n_pred").cast("double"))
            .alias("precision_share"),
        )
        .orderBy("lang_true", "lang_pred")
    )
