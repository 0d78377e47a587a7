"""Driver-facing query catalog.

One entry per operator family in SURVEY §2 (IDs cited per entry), each as a
(spark builder, equivalent ANSI-SQL oracle) pair over the synthetic
benchmark tables (TESTDATA.md). The driver runs both sides at sf0.01 and
hash-compares values — so every expression here is written for cross-engine
determinism:

- double aggregations go through DECIMAL (exact) and come back to double;
- hashes are md5-derived (functions/hashing.py), never engine-native hash();
- floating similarity scores are rounded to 6 dp BEFORE ranking;
- every computed column is aliased identically on both sides.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession, Window
import pyspark.sql.functions as F

from idh_etl_demo_spark.functions.delays import normalized_delay_minutes
from idh_etl_demo_spark.functions.timeutils import (
    is_business_day,
    month_name,
    season,
    time_dim_id,
    time_of_day,
    weekday_name,
    weekday_num,
)
from idh_etl_demo_spark.functions.weather import (
    comfort_score,
    fall_type,
    general_circumstances,
)
from idh_etl_demo_spark.operators.dedup import dedup_keep_first
from idh_etl_demo_spark.operators.mode import mode_per_group


@dataclass(frozen=True)
class QueryEntry:
    name: str
    spark: Callable[[SparkSession, str], DataFrame]
    oracle: Optional[str]  # None → non-SQL-expressible; driver does rows-only
    doc: str = ""


ENTRIES: dict[str, QueryEntry] = {}


def query(name: str, oracle: Optional[str]):
    def deco(fn):
        ENTRIES[name] = QueryEntry(name, fn, oracle, fn.__doc__ or "")
        return fn

    return deco


# (applicationId, sf_dir, table) → DataFrame. DataFrames are lazy and
# immutable, so reusing one skips the file-listing/schema-inference job
# spark.read.parquet runs per call — builders become action-free and the
# scan metadata is resolved once per session instead of once per entry.
_TABLE_CACHE: dict[tuple, DataFrame] = {}


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    key = (spark.sparkContext.applicationId, sf_dir, name)
    cached = _TABLE_CACHE.get(key)
    if cached is None:
        _TABLE_CACHE[key] = cached = _read_table(spark, sf_dir, name)
    return cached


def _read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # calendar expressions (date_format/hour/weekday) must agree with the
    # timezone-naive SQL oracle whatever session the caller built
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    if name == "events":
        # events.parquet carries TIMESTAMP(NANOS), which Spark's parquet
        # reader rejects; read ns as long and integer-divide to µs — the
        # same truncation DuckDB applies when it reads the file.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        return df
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def _dec(col: F.Column, scale: int = 4) -> F.Column:
    return col.cast(f"decimal(18,{scale})")


# ===========================================================================
# Scans, filters, aggregation (SURVEY §2.1 S1/S8, §2.2 P1, §2.4 A1/A2/A7)
# ===========================================================================


@query(
    "pricing_summary",
    """
    select
      l_returnflag,
      l_linestatus,
      cast(sum(cast(l_quantity as decimal(18,4))) as double) as sum_qty,
      cast(sum(cast(l_extendedprice as decimal(18,4))) as double) as sum_base_price,
      cast(sum(cast(l_extendedprice as decimal(18,4))
               * (cast(1 as decimal(18,4)) - cast(l_discount as decimal(18,4)))) as double)
        as sum_disc_price,
      count(*) as count_order
    from lineitem
    where l_shipdate <= timestamp '1998-09-02 00:00:00'
    group by l_returnflag, l_linestatus
    order by l_returnflag, l_linestatus
    """,
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship scan→filter→hash-agg→sort (SURVEY §2.1 S1/S8, §2.4 A1/A2).
    Decimal-exact sums; filter pushed to the parquet scan."""
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp")
    )
    one = F.lit(1).cast("decimal(18,4)")
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(_dec(F.col("l_quantity"))).cast("double").alias("sum_qty"),
            F.sum(_dec(F.col("l_extendedprice"))).cast("double").alias("sum_base_price"),
            F.sum(_dec(F.col("l_extendedprice")) * (one - _dec(F.col("l_discount"))))
            .cast("double")
            .alias("sum_disc_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@query(
    "mode_quantity_per_flag",
    """
    select l_returnflag, mode_qty from (
      select l_returnflag, l_quantity as mode_qty,
             row_number() over (partition by l_returnflag
                                order by count(*) desc, l_quantity desc nulls last) as rn
      from lineitem
      group by l_returnflag, l_quantity
    ) where rn = 1
    """,
)
def mode_quantity_per_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's mode-via-window idiom with count-desc/value-desc
    tie-break (SURVEY §2.4 A4, §2.5 W1, §2.2 P7)."""
    return mode_per_group(
        _t(spark, sf_dir, "lineitem"), ["l_returnflag"], "l_quantity", "mode_qty"
    )


@query(
    "supplier_distinct_parts",
    """
    select l_suppkey,
           count(distinct l_partkey) as n_parts,
           count(*) as n_items
    from lineitem
    group by l_suppkey
    order by l_suppkey
    """,
)
def supplier_distinct_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """count(distinct) per group (SURVEY §2.4 A3)."""
    return (
        _t(spark, sf_dir, "lineitem")
        .groupBy("l_suppkey")
        .agg(
            F.count_distinct(F.col("l_partkey")).alias("n_parts"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy("l_suppkey")
    )


# ===========================================================================
# Window rank / top-k / sort / limit (SURVEY §2.5 W1-W2, §2.6 O1-O3)
# ===========================================================================


@query(
    "top_order_per_customer",
    """
    select o_custkey, o_orderkey, o_totalprice from (
      select o_custkey, o_orderkey, o_totalprice,
             row_number() over (partition by o_custkey
                                order by o_totalprice desc, o_orderkey asc) as rn
      from orders
    ) where rn = 1
    """,
)
def top_order_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-1 per group via ranking window (SURVEY §2.5 W1, §2.6 O3)."""
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        _t(spark, sf_dir, "orders")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("o_custkey", "o_orderkey", "o_totalprice")
    )


@query(
    "top10_expensive_orders",
    """
    select o_orderkey, o_custkey, o_totalprice
    from orders
    order by o_totalprice desc, o_orderkey asc
    limit 10
    """,
)
def top10_expensive_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global sort + limit with deterministic tie-break (SURVEY §2.6 O1/O2)."""
    return (
        _t(spark, sf_dir, "orders")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(10)
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


# ===========================================================================
# Joins (SURVEY §2.3 J1-J9, §2.1 S11)
# ===========================================================================


@query(
    "revenue_by_nation",
    """
    select
      n.n_name,
      cast(sum(cast(l.l_extendedprice as decimal(18,4))
               * (cast(1 as decimal(18,4)) - cast(l.l_discount as decimal(18,4)))) as double)
        as revenue,
      count(*) as n_lineitems
    from lineitem l
    join orders o on l.l_orderkey = o.o_orderkey
    join customer c on o.o_custkey = c.c_custkey
    join nation n on c.c_nationkey = n.n_nationkey
    join region r on n.n_regionkey = r.r_regionkey
    group by n.n_name
    order by n.n_name
    """,
)
def revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star join: fact ⨝ three broadcast dims (SURVEY §2.3 J5-J8 family).
    All dimension sides are broadcast — the fact table never shuffles for
    the joins, only for the final group-by."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name", "n_regionkey")
    region = _t(spark, sf_dir, "region").select("r_regionkey")
    one = F.lit(1).cast("decimal(18,4)")
    return (
        li.join(F.broadcast(orders), li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(cust), F.col("o_custkey") == cust["c_custkey"])
        .join(F.broadcast(nation), F.col("c_nationkey") == nation["n_nationkey"])
        .join(F.broadcast(region), F.col("n_regionkey") == region["r_regionkey"])
        .groupBy("n_name")
        .agg(
            F.sum(_dec(F.col("l_extendedprice")) * (one - _dec(F.col("l_discount"))))
            .cast("double")
            .alias("revenue"),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
        .orderBy("n_name")
    )


@query(
    "customer_order_activity",
    """
    select
      c.c_custkey,
      count(o.o_orderkey) as n_orders,
      case when count(o.o_orderkey) = 0 then 'inactive' else 'active' end as activity
    from customer c
    left join orders o on c.c_custkey = o.o_custkey
    group by c.c_custkey
    order by c.c_custkey
    """,
)
def customer_order_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER join + count-of-nulls→0 + CASE label
    (SURVEY §2.3 J1/J2, §2.7 F1/F2)."""
    cust = _t(spark, sf_dir, "customer").select("c_custkey")
    orders = _t(spark, sf_dir, "orders").select("o_custkey", "o_orderkey")
    return (
        cust.join(orders, cust["c_custkey"] == orders["o_custkey"], "left")
        .groupBy("c_custkey")
        .agg(F.count(F.col("o_orderkey")).alias("n_orders"))
        .select(
            "c_custkey",
            "n_orders",
            F.when(F.col("n_orders") == 0, "inactive").otherwise("active").alias("activity"),
        )
        .orderBy("c_custkey")
    )


@query(
    "expression_key_join",
    """
    with hourly as (
      select 'EV-' || strftime(date_trunc('hour', ts), '%Y-%m-%d-%H') as hour_key,
             count(*) as n_events_in_hour
      from events
      group by 1
    )
    select e.event_id, h.hour_key, h.n_events_in_hour
    from events e
    join hourly h on h.hour_key = 'EV-' || strftime(date_trunc('hour', e.ts), '%Y-%m-%d-%H')
    order by e.event_id
    """,
)
def expression_key_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INNER equi-join on a COMPUTED string key — the reference's weather-id
    join shape (SURVEY §2.3 J6, §2.7 F3/F4)."""
    events = _t(spark, sf_dir, "events")
    key = lambda ts: F.concat(
        F.lit("EV-"), F.date_format(F.date_trunc("hour", ts), "yyyy-MM-dd-HH")
    )
    hourly = (
        events.groupBy(key(F.col("ts")).alias("hour_key"))
        .agg(F.count(F.lit(1)).alias("n_events_in_hour"))
    )
    return (
        events.withColumn("hour_key", key(F.col("ts")))
        .join(F.broadcast(hourly), "hour_key")
        .select("event_id", "hour_key", "n_events_in_hour")
        .orderBy("event_id")
    )


@query(
    "merge_new_customers",
    """
    with staging as (
      select o_custkey, o_orderkey, o_orderdate from (
        select o_custkey, o_orderkey, o_orderdate,
               row_number() over (partition by o_custkey
                                  order by o_orderdate asc, o_orderkey asc) as rn
        from orders
        where o_orderdate >= timestamp '2000-01-01 00:00:00'
      ) where rn = 1
    )
    select s.o_custkey, s.o_orderkey as first_orderkey
    from staging s
    where not exists (
      select 1 from orders t
      where t.o_custkey = s.o_custkey
        and t.o_orderdate < timestamp '2000-01-01 00:00:00'
    )
    order by s.o_custkey
    """,
)
def merge_new_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The merge sink protocol as a query: keyed batch dedup + LEFT ANTI
    insert-if-absent (SURVEY §2.1 S11, §2.4 A5, §2.3 anti-join note)."""
    orders = _t(spark, sf_dir, "orders")
    cutoff = F.lit("2000-01-01").cast("timestamp")
    staging = dedup_keep_first(
        orders.filter(F.col("o_orderdate") >= cutoff).select(
            "o_custkey", "o_orderkey", "o_orderdate"
        ),
        ["o_custkey"],
        order_by=[F.asc("o_orderdate"), F.asc("o_orderkey")],
    )
    target_keys = orders.filter(F.col("o_orderdate") < cutoff).select("o_custkey")
    return (
        staging.join(target_keys, "o_custkey", "left_anti")
        .select("o_custkey", F.col("o_orderkey").alias("first_orderkey"))
        .orderBy("o_custkey")
    )


@query(
    "dedup_first_order",
    """
    select o_custkey, o_orderkey, o_orderdate from (
      select o_custkey, o_orderkey, o_orderdate,
             row_number() over (partition by o_custkey
                                order by o_orderdate asc nulls last, o_orderkey asc nulls last) as rn
      from orders
    ) where rn = 1
    """,
)
def dedup_first_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyed dedup with a deterministic keep-first rule — the distributed
    replacement for pandas drop_duplicates (SURVEY §2.4 A5, §7 hard part 1)."""
    return dedup_keep_first(
        _t(spark, sf_dir, "orders").select("o_custkey", "o_orderkey", "o_orderdate"),
        ["o_custkey"],
        order_by=[F.asc_nulls_last("o_orderdate"), F.asc_nulls_last("o_orderkey")],
    )


@query(
    "union_priority_split",
    """
    select o_orderkey, 'high' as bucket from orders
    where o_orderpriority in ('1-URGENT', '2-HIGH')
    union all
    select o_orderkey, 'low' as bucket from orders
    where o_orderpriority = '5-LOW'
    """,
)
def union_priority_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL of filtered projections (SURVEY §2.6 O4)."""
    orders = _t(spark, sf_dir, "orders")
    high = orders.filter(
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    ).select("o_orderkey", F.lit("high").alias("bucket"))
    low = orders.filter(F.col("o_orderpriority") == "5-LOW").select(
        "o_orderkey", F.lit("low").alias("bucket")
    )
    return high.unionByName(low)


# ===========================================================================
# Scalar function gallery (SURVEY §2.7)
# ===========================================================================


@query(
    "delay_parse_roundtrip",
    r"""
    with tagged as (
      select l_orderkey, l_linenumber,
             cast(l_quantity as bigint)::varchar || ' min'
               || case when l_discount > 0.05 then ' przed czasem' else '' end as delay_str
      from lineitem
    )
    select l_orderkey, l_linenumber, delay_str,
           (case when delay_str like '%min przed czasem%' then -1 else 1 end)
             * cast(regexp_extract(delay_str, '(-?\d+)', 1) as bigint) as delay_mins
    from tagged
    """,
)
def delay_parse_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Polish delay-string parser as a column expression, driven over
    synthesized strings (SURVEY §2.7 F9, §2.9)."""
    li = _t(spark, sf_dir, "lineitem")
    delay_str = F.concat(
        F.col("l_quantity").cast("long").cast("string"),
        F.lit(" min"),
        F.when(F.col("l_discount") > 0.05, " przed czasem").otherwise(""),
    )
    return li.select(
        "l_orderkey",
        "l_linenumber",
        delay_str.alias("delay_str"),
        normalized_delay_minutes(delay_str).alias("delay_mins"),
    )


@query(
    "weather_classify_events",
    """
    with derived as (
      select event_id,
             cast(round(value * 100, 0) as bigint) as v100
      from events
    ),
    bands as (
      select event_id,
             (v100 % 50000) / 1000.0 - 10 as temperature,
             (v100 % 2500) / 100.0 as wind,
             (v100 % 6000) / 100.0 + 40 as humidity,
             v100 % 8 as precip
      from derived
    ),
    scored as (
      select *,
        (case when temperature >= 10 and temperature <= 25 then 2
              when temperature >= 2 and temperature < 10 then 1
              when temperature < 2 or temperature > 35 then -1 else 0 end
         + case when wind < 5 then 2 when wind < 10 then 1
                when wind > 15 then -1 else 0 end
         + case when humidity < 70 then 1 when humidity > 90 then -1 else 0 end
         + case when precip = 0 then 2 when precip > 5 then -1 else 0 end) as score
      from bands
    )
    select event_id, temperature, wind, humidity, precip,
           case when temperature < 2.0 then 'snow' else 'rain' end as fall_type,
           case when score >= 6 then 'ludicrously-divine'
                when score >= 4 then 'titanically-passable'
                when score >= 2 then 'nobly-sufficient'
                when score >= 0 then 'courageously-subpar'
                else 'opera-level-atrocious' end as general_circumstances
    from scored
    order by event_id
    """,
)
def weather_classify_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The weather classifiers (snow/rain + comfort bands) as pure
    expressions over integer-derived inputs (SURVEY §2.7 F15/F16)."""
    ev = _t(spark, sf_dir, "events")
    v100 = F.round(F.col("value") * 100, 0).cast("long")
    df = ev.select(
        "event_id",
        ((v100 % 50000) / F.lit(1000.0) - 10).alias("temperature"),
        ((v100 % 2500) / F.lit(100.0)).alias("wind"),
        ((v100 % 6000) / F.lit(100.0) + 40).alias("humidity"),
        (v100 % 8).alias("precip"),
    )
    return df.select(
        "event_id",
        "temperature",
        "wind",
        "humidity",
        "precip",
        fall_type(F.col("temperature")).alias("fall_type"),
        general_circumstances(
            comfort_score(F.col("temperature"), F.col("wind"), F.col("humidity"), F.col("precip"))
        ).alias("general_circumstances"),
    ).orderBy("event_id")


@query(
    "time_dim_from_events",
    """
    with hours as (select distinct date_trunc('hour', ts) as full_timestamp from events)
    select
      cast(strftime(full_timestamp, '%Y%m%d') as bigint) as id,
      full_timestamp,
      hour(full_timestamp)::bigint as hour_,
      upper(dayname(full_timestamp)) as weekday,
      isodow(full_timestamp)::bigint as weekday_num,
      monthname(full_timestamp) as month_,
      month(full_timestamp)::bigint as month_num,
      case when month(full_timestamp) in (12, 1, 2) then 'winter'
           when month(full_timestamp) in (3, 4, 5) then 'spring'
           when month(full_timestamp) in (6, 7, 8) then 'summer'
           else 'autumn' end as season,
      year(full_timestamp)::bigint as year_,
      case when hour(full_timestamp) between 6 and 9 then 'morning'
           when hour(full_timestamp) between 10 and 13 then 'midday'
           when hour(full_timestamp) between 14 and 17 then 'afternoon'
           when hour(full_timestamp) between 18 and 22 then 'evening'
           else 'night' end as time_of_day,
      isodow(full_timestamp) <= 5 as is_business_day
    from hours
    order by full_timestamp
    """,
)
def time_dim_from_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full TimeDim derivation (day-grain id quirk included) from data
    timestamps (SURVEY §2.7 F17-F20, §1.3)."""
    hours = (
        _t(spark, sf_dir, "events")
        .select(F.date_trunc("hour", F.col("ts")).alias("full_timestamp"))
        .distinct()
    )
    ts = F.col("full_timestamp")
    return hours.select(
        time_dim_id(ts).alias("id"),
        ts.alias("full_timestamp"),
        F.hour(ts).cast("long").alias("hour_"),
        weekday_name(ts).alias("weekday"),
        weekday_num(ts).alias("weekday_num"),
        month_name(ts).alias("month_"),
        F.month(ts).cast("long").alias("month_num"),
        season(F.month(ts)).alias("season"),
        F.year(ts).cast("long").alias("year_"),
        time_of_day(F.hour(ts)).alias("time_of_day"),
        is_business_day(ts).alias("is_business_day"),
    ).orderBy("full_timestamp")


@query(
    "json_extract_filter",
    r"""
    select event_id, event_type,
           cast(json_extract_string(props, '$.k') as bigint) as k_val
    from events
    where regexp_matches(json_extract_string(props, '$.k'), '^\d+$')
      and cast(json_extract_string(props, '$.k') as bigint) % 7 = 0
    order by event_id
    """,
)
def json_extract_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON field extraction + regex digit-guard + cast — the reference's
    dirty-string guard pattern over semi-structured props
    (SURVEY §2.2 P5, §2.7 F6/F7; JSON is beyond-reference)."""
    ev = _t(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k")
    return (
        ev.filter(k.rlike(r"^\d+$") & (k.cast("long") % 7 == 0))
        .select("event_id", "event_type", k.cast("long").alias("k_val"))
        .orderBy("event_id")
    )


@query(
    "events_hourly_tumbling",
    """
    select date_trunc('hour', ts) as hour_start,
           event_type,
           count(*) as n_events,
           cast(sum(cast(value as decimal(18,4))) as double) as sum_value
    from events
    group by 1, 2
    order by hour_start, event_type
    """,
)
def events_hourly_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour window aggregation — the batch equivalent of the
    streaming hourly micro-batch (SURVEY §2.8); the true Structured
    Streaming variant lives in streaming.stream and is pytest-covered."""
    return (
        _t(spark, sf_dir, "events")
        .groupBy(
            F.date_trunc("hour", F.col("ts")).alias("hour_start"),
            F.col("event_type"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(_dec(F.col("value"))).cast("double").alias("sum_value"),
        )
        .orderBy("hour_start", "event_type")
    )


@query(
    "user_sessions",
    """
    with ordered as (
      select user_id, event_id, ts,
             case when lag(ts) over w is null
                    or epoch_us(ts) - epoch_us(lag(ts) over w) > 1800000000
                  then 1 else 0 end as new_session
      from events
      window w as (partition by user_id order by ts asc, event_id asc)
    ),
    sessions as (
      select user_id, event_id, ts,
             sum(new_session) over (partition by user_id order by ts asc, event_id asc
                                    rows unbounded preceding) as session_no
      from ordered
    )
    select user_id, cast(session_no as bigint) as session_no, count(*) as n_events,
           min(ts) as session_start, max(ts) as session_end
    from sessions
    group by user_id, session_no
    order by user_id, session_no
    """,
)
def user_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization (30-min inactivity gap) via lag + running sum —
    analytic windows beyond the reference's ranking-only usage. The
    continuous-stateful variant is streaming/stateful.py
    (applyInPandasWithState), pytest-covered."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.asc("ts"), F.asc("event_id"))
    # events.ts may arrive as TIMESTAMP or TIMESTAMP_NTZ depending on the
    # writer; unix_micros accepts only TIMESTAMP_LTZ. Pin the LTZ type by
    # name: a bare cast("timestamp") resolves through
    # spark.sql.timestampType, so a session configured for TIMESTAMP_NTZ
    # would make it a no-op and unix_micros would still fail. The session
    # timezone is pinned UTC (session.py), so the NTZ->LTZ cast is a
    # bijection and matches DuckDB's epoch_us over naive timestamps.
    ts_utc = F.col("ts").cast("timestamp_ltz")
    gap_us = F.unix_micros(ts_utc) - F.unix_micros(F.lag(ts_utc).over(w))
    new_session = F.when(
        gap_us.isNull() | (gap_us > 1_800_000_000), 1
    ).otherwise(0)
    running = Window.partitionBy("user_id").orderBy(
        F.asc("ts"), F.asc("event_id")
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        ev.withColumn("new_session", new_session)
        .withColumn("session_no", F.sum("new_session").over(running))
        .groupBy("user_id", "session_no")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
        )
        .orderBy("user_id", "session_no")
    )


@query(
    "orders_with_high_value_items",
    """
    select o.o_orderkey, o.o_custkey, o.o_totalprice
    from orders o
    where exists (
      select 1 from lineitem l
      where l.l_orderkey = o.o_orderkey and l.l_extendedprice > 90000
    )
    order by o.o_orderkey
    """,
)
def orders_with_high_value_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI join (EXISTS) — the set-membership counterpart of the
    merge sink's anti join; plans as one broadcast semi probe, no fan-out."""
    orders = _t(spark, sf_dir, "orders")
    big_items = (
        _t(spark, sf_dir, "lineitem")
        .filter(F.col("l_extendedprice") > 90000)
        .select("l_orderkey")
    )
    return (
        orders.join(big_items, orders["o_orderkey"] == big_items["l_orderkey"], "left_semi")
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy("o_orderkey")
    )


@query(
    "price_percentiles",
    """
    select l_returnflag,
           quantile_cont(l_extendedprice, 0.5) as p50,
           quantile_cont(l_extendedprice, 0.95) as p95,
           min(l_extendedprice) as lo,
           max(l_extendedprice) as hi
    from lineitem
    group by l_returnflag
    order by l_returnflag
    """,
)
def price_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT continuous percentiles per group (linear interpolation —
    verified bit-identical to quantile_cont). Use approx_percentile at
    true 100 TB scale; the exact form is the correctness baseline."""
    return (
        _t(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.expr("percentile(l_extendedprice, 0.5)").alias("p50"),
            F.expr("percentile(l_extendedprice, 0.95)").alias("p95"),
            F.min("l_extendedprice").alias("lo"),
            F.max("l_extendedprice").alias("hi"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "value_stats",
    """
    with sums as (
      select event_type,
             count(*) as n,
             sum(cast(value as decimal(18,4))) as s,
             sum(cast(value as decimal(18,4)) * cast(value as decimal(18,4))) as s2
      from events
      group by event_type
    )
    select event_type, n,
           cast(s as double) / n as mean_value,
           (cast(s2 as double) - cast(s as double) * cast(s as double) / n) / (n - 1)
             as var_value
    from sums
    order by event_type
    """,
)
def value_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean/variance computed from DECIMAL-exact moment sums, so results
    are order-independent and engine-reproducible — the pattern for any
    algebraic statistic at scale (built-in stddev sums doubles in shuffle
    order and is not bit-stable)."""
    ev = _t(spark, sf_dir, "events")
    d = F.col("value").cast("decimal(18,4)")
    sums = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(d).alias("s"),
        F.sum(d * d).alias("s2"),
    )
    s = F.col("s").cast("double")
    s2 = F.col("s2").cast("double")
    n = F.col("n")
    return sums.select(
        "event_type",
        "n",
        (s / n).alias("mean_value"),
        ((s2 - s * s / n) / (n - 1)).alias("var_value"),
    ).orderBy("event_type")


@query(
    "doc_word_histogram",
    r"""
    with toks as (
      select unnest(list_filter(string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' '), w -> w != '')) as word
      from documents
    )
    select word, count(*) as freq
    from toks
    group by word
    order by freq desc, word asc
    limit 25
    """,
)
def doc_word_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus word histogram (explode → count → deterministic top-25) —
    the vocabulary-analysis primitive; partial aggregation collapses the
    per-token stream before the shuffle."""
    from idh_etl_demo_spark.operators.text import tokens

    docs = _t(spark, sf_dir, "documents")
    return (
        docs.select(F.explode_outer(tokens(F.col("text"))).alias("word"))
        .filter(F.col("word").isNotNull())
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
        .orderBy(F.desc("freq"), F.asc("word"))
        .limit(25)
    )


@query(
    "customers_active_both_years",
    """
    select o_custkey from orders
    where o_orderdate >= timestamp '1996-01-01 00:00:00'
      and o_orderdate < timestamp '1997-01-01 00:00:00'
    intersect
    select o_custkey from orders
    where o_orderdate >= timestamp '1997-01-01 00:00:00'
      and o_orderdate < timestamp '1998-01-01 00:00:00'
    order by o_custkey
    """,
)
def customers_active_both_years(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT set op (beyond the reference's UNION-only usage)."""
    orders = _t(spark, sf_dir, "orders")
    y96 = orders.filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    ).select("o_custkey")
    y97 = orders.filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    ).select("o_custkey")
    return y96.intersect(y97).orderBy("o_custkey")


@query(
    "customers_churned_97",
    """
    select o_custkey from orders
    where o_orderdate >= timestamp '1996-01-01 00:00:00'
      and o_orderdate < timestamp '1997-01-01 00:00:00'
    except
    select o_custkey from orders
    where o_orderdate >= timestamp '1997-01-01 00:00:00'
      and o_orderdate < timestamp '1998-01-01 00:00:00'
    order by o_custkey
    """,
)
def customers_churned_97(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT set op — active in 1996 but not 1997."""
    orders = _t(spark, sf_dir, "orders")
    y96 = orders.filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    ).select("o_custkey")
    y97 = orders.filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    ).select("o_custkey")
    # subtract = EXCEPT DISTINCT (set semantics); exceptAll would keep a
    # customer whose '96 order count merely exceeds their '97 count
    return y96.subtract(y97).orderBy("o_custkey")


@query(
    "orders_status_pivot",
    """
    select o_orderpriority,
           count(*) filter (o_orderstatus = 'F') as status_f,
           count(*) filter (o_orderstatus = 'O') as status_o,
           count(*) filter (o_orderstatus = 'P') as status_p
    from orders
    group by o_orderpriority
    order by o_orderpriority
    """,
)
def orders_status_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT (status → columns) with an explicit value list — the
    deterministic form that skips Spark's value-discovery job; expressed
    as FILTERed counts in the oracle (the portable equivalent)."""
    return (
        _t(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
        .select(
            "o_orderpriority",
            F.coalesce("F", F.lit(0)).alias("status_f"),
            F.coalesce("O", F.lit(0)).alias("status_o"),
            F.coalesce("P", F.lit(0)).alias("status_p"),
        )
        .orderBy("o_orderpriority")
    )


@query(
    "volume_shipping",
    """
    select supp_nation, cust_nation, l_year,
           cast(sum(volume) as double) as revenue
    from (
      select n1.n_name as supp_nation,
             n2.n_name as cust_nation,
             year(l.l_shipdate) as l_year,
             cast(l.l_extendedprice as decimal(18,4))
               * (cast(1 as decimal(18,4)) - cast(l.l_discount as decimal(18,4))) as volume
      from lineitem l
      join supplier s on s.s_suppkey = l.l_suppkey
      join orders o on o.o_orderkey = l.l_orderkey
      join customer c on c.c_custkey = o.o_custkey
      join nation n1 on n1.n_nationkey = s.s_nationkey
      join nation n2 on n2.n_nationkey = c.c_nationkey
      where n1.n_name != n2.n_name
    )
    group by supp_nation, cust_nation, l_year
    order by supp_nation, cust_nation, l_year
    """,
)
def volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7-shaped multi-nation trade flow: five joins with the nation
    dim used TWICE under different roles, cross-nation filter, per-year
    decimal-exact revenue. Exercises Catalyst's join planning with a
    self-referenced broadcast dim."""
    li = _t(spark, sf_dir, "lineitem")
    supp = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    n1 = nation.select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    one = F.lit(1).cast("decimal(18,4)")
    return (
        li.join(F.broadcast(supp), li["l_suppkey"] == supp["s_suppkey"])
        .join(F.broadcast(orders), li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(cust), F.col("o_custkey") == cust["c_custkey"])
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nk"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nk"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .select(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").alias("l_year"),
            (_dec(F.col("l_extendedprice")) * (one - _dec(F.col("l_discount")))).alias("volume"),
        )
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(F.sum("volume").cast("double").alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@query(
    "small_quantity_revenue",
    """
    with part_avg as (
      select l_partkey,
             cast(sum(cast(l_quantity as decimal(18,4))) as double) / count(*) as avg_qty
      from lineitem
      group by l_partkey
    )
    select l.l_partkey,
           count(*) as n_small,
           cast(sum(cast(l.l_extendedprice as decimal(18,4))) as double) as small_revenue
    from lineitem l
    join part_avg pa on pa.l_partkey = l.l_partkey
    where l.l_quantity < 0.2 * pa.avg_qty
    group by l.l_partkey
    order by l.l_partkey
    """,
)
def small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17-shaped scalar-aggregate comparison: each row judged
    against its group's average (decimal-exact mean, deterministic double
    compare). The per-part aggregate is computed once and broadcast back —
    no correlated-subquery re-execution."""
    li = _t(spark, sf_dir, "lineitem")
    part_avg = li.groupBy("l_partkey").agg(
        (F.sum(_dec(F.col("l_quantity"))).cast("double") / F.count(F.lit(1))).alias("avg_qty")
    )
    return (
        li.join(F.broadcast(part_avg), "l_partkey")
        .filter(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
        .groupBy("l_partkey")
        .agg(
            F.count(F.lit(1)).alias("n_small"),
            F.sum(_dec(F.col("l_extendedprice"))).cast("double").alias("small_revenue"),
        )
        .orderBy("l_partkey")
    )


@query(
    "dq_orders_audit",
    """
    select
      (select count(*) from orders) as n_rows,
      (select count(*) from orders where o_orderkey is null) as null_keys,
      (select count(*) from (
         select o_orderkey from orders group by o_orderkey having count(*) > 1
      )) as duplicate_keys,
      (select count(*) from orders o
       where not exists (select 1 from customer c where c.c_custkey = o.o_custkey)
      ) as dangling_custkeys,
      (select count(*) from orders where o_totalprice <= 0) as nonpositive_totals
    """,
)
def dq_orders_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality audit as one metrics row: null keys, duplicate keys,
    dangling foreign keys (anti join), domain violations — the validation
    layer the reference performs with ad-hoc guards
    (reference: dags/idh_etl.py:190-225), as a single distributed plan."""
    orders = _t(spark, sf_dir, "orders")
    customer_keys = _t(spark, sf_dir, "customer").select("c_custkey")
    # ONE lazy plan: each audit metric is a single-row scalar aggregate,
    # stitched with 1×1 joins (planned as broadcast nested-loop on a single
    # row — no data movement). No driver-side action runs at build time;
    # the catalog stays a registry of lazy builders.
    dup = (
        orders.groupBy("o_orderkey")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > 1)
        .agg(F.count(F.lit(1)).alias("duplicate_keys"))
    )
    dangling = (
        orders.join(
            customer_keys, orders["o_custkey"] == customer_keys["c_custkey"], "left_anti"
        ).agg(F.count(F.lit(1)).alias("dangling_custkeys"))
    )
    agg = orders.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count(F.when(F.col("o_orderkey").isNull(), 1)).alias("null_keys"),
        F.count(F.when(F.col("o_totalprice") <= 0, 1)).alias("nonpositive_totals"),
    )
    return agg.crossJoin(dup).crossJoin(dangling).select(
        "n_rows",
        "null_keys",
        "duplicate_keys",
        "dangling_custkeys",
        "nonpositive_totals",
    )


# ===========================================================================
# Round-2 coverage widening: scalar subqueries, semi/anti joins with
# non-equi predicates, complex OR-of-ANDs pushdown, running/sliding
# windows, cube/grouping sets, unpivot (SURVEY §2 extensions)
# ===========================================================================


@query(
    "parts_above_avg_price",
    """
    select p_partkey, p_name, p_retailprice
    from part
    where p_retailprice > (select avg(p_retailprice) from part)
    order by p_partkey
    """,
)
def parts_above_avg_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar subquery: the global average joins back as a broadcast
    1-row aggregate — no driver-side action, no second scan plan (the
    self-read shares the cached scan)."""
    part = _t(spark, sf_dir, "part")
    avg_price = part.agg(F.avg("p_retailprice").alias("__avg"))
    return (
        part.join(F.broadcast(avg_price))
        .filter(F.col("p_retailprice") > F.col("__avg"))
        .select("p_partkey", "p_name", "p_retailprice")
        .orderBy("p_partkey")
    )


@query(
    "late_orders_by_priority",
    """
    select o_orderpriority, count(*) as n_orders
    from orders o
    where exists (
      select 1 from lineitem l
      where l.l_orderkey = o.o_orderkey
        and l.l_shipdate > o.o_orderdate + interval 60 day
    )
    group by o_orderpriority
    order by o_orderpriority
    """,
)
def late_orders_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS → LEFT SEMI join with a non-equi residual (shipped >60 days
    after order date), then a tiny group-by. TPC-H Q4 shape."""
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    cond = (orders["o_orderkey"] == li["l_orderkey"]) & (
        li["l_shipdate"] > orders["o_orderdate"] + F.expr("interval 60 days")
    )
    return (
        orders.join(li, cond, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .orderBy("o_orderpriority")
    )


@query(
    "supplier_count_by_part_type",
    """
    select p.p_type, count(distinct l.l_suppkey) as supplier_cnt
    from part p
    join lineitem l on l.l_partkey = p.p_partkey
    where p.p_brand <> 'Brand#1'
      and l.l_suppkey not in (select s_suppkey from supplier where s_acctbal < 0)
    group by p.p_type
    order by p.p_type
    """,
)
def supplier_count_by_part_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT IN (no-null key set) → LEFT ANTI join against the excluded
    supplier keys, broadcast part dim, count-distinct. TPC-H Q16 shape."""
    li = _t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    part = _t(spark, sf_dir, "part").filter(F.col("p_brand") != "Brand#1").select(
        "p_partkey", "p_type"
    )
    excluded = (
        _t(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select("s_suppkey")
    )
    return (
        li.join(F.broadcast(excluded), li["l_suppkey"] == excluded["s_suppkey"], "left_anti")
        .join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .groupBy("p_type")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
        .orderBy("p_type")
    )


@query(
    "promo_brand_revenue",
    """
    select
      cast(sum(cast(l_extendedprice as decimal(18,4))
               * (cast(1 as decimal(18,4)) - cast(l_discount as decimal(18,4)))) as double)
        as revenue,
      count(*) as n_lineitems
    from lineitem l
    join part p on p.p_partkey = l.l_partkey
    where (p.p_brand = 'Brand#1' and p.p_size between 1 and 15 and l.l_quantity between 1 and 20)
       or (p.p_brand = 'Brand#2' and p.p_size between 10 and 30 and l.l_quantity between 5 and 35)
    """,
)
def promo_brand_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OR-of-ANDs predicate across both join sides (TPC-H Q19 shape):
    the planner keeps the conjunct-free OR as a post-join filter while
    per-table IsNotNull/partial predicates still push to the scans;
    part is broadcast so the fact side never shuffles."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    one = F.lit(1).cast("decimal(18,4)")
    cond1 = (
        (F.col("p_brand") == "Brand#1")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(1, 20)
    )
    cond2 = (
        (F.col("p_brand") == "Brand#2")
        & F.col("p_size").between(10, 30)
        & F.col("l_quantity").between(5, 35)
    )
    return (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .filter(cond1 | cond2)
        .agg(
            F.sum(_dec(F.col("l_extendedprice")) * (one - _dec(F.col("l_discount"))))
            .cast("double")
            .alias("revenue"),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
    )


@query(
    "customer_balance_by_code",
    """
    with avg_bal as (
      select avg(c_acctbal) as a from customer where c_acctbal > 0
    )
    select
      substring(c_name, length(c_name) - 1, 2) as code,
      count(*) as numcust,
      cast(sum(cast(c_acctbal as decimal(18,4))) as double) as total_bal
    from customer c
    where c_acctbal > (select a from avg_bal)
      and not exists (
        select 1 from orders o
        where o.o_custkey = c.c_custkey
          and o.o_orderdate >= timestamp '2000-01-01 00:00:00'
      )
    group by code
    order by code
    """,
)
def customer_balance_by_code(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: scalar-subquery threshold (broadcast 1-row agg),
    NOT EXISTS → LEFT ANTI on recent-order keys (high-balance customers
    with no orders since 2000), substring-derived group key, decimal-exact
    balance sum. The anti-join probe reads only (o_custkey, o_orderdate) —
    filter + pruning reach the scan."""
    cust = _t(spark, sf_dir, "customer")
    orders_keys = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp"))
        .select("o_custkey")
    )
    avg_bal = cust.filter(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal").alias("__avg")
    )
    code = F.substring(F.col("c_name"), -2, 2).alias("code")
    return (
        cust.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("__avg"))
        .join(orders_keys, cust["c_custkey"] == orders_keys["o_custkey"], "left_anti")
        .groupBy(code)
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(_dec(F.col("c_acctbal"))).cast("double").alias("total_bal"),
        )
        .orderBy("code")
    )


@query(
    "orders_running_total",
    """
    select
      o_custkey,
      o_orderkey,
      cast(sum(cast(o_totalprice as decimal(18,4)))
             over (partition by o_custkey order by o_orderdate asc, o_orderkey asc
                   rows unbounded preceding) as double) as running_spend,
      cast(o_totalprice - coalesce(lag(o_totalprice)
             over (partition by o_custkey order by o_orderdate asc, o_orderkey asc), 0)
           as double) as delta_vs_prev
    from orders
    order by o_custkey, o_orderkey
    """,
)
def orders_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic windows beyond ranking: per-customer running sum
    (decimal-exact) and lag delta over the same window frame — one
    shuffle on o_custkey serves both."""
    orders = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.asc("o_orderdate"), F.asc("o_orderkey"))
    running = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        orders.select(
            "o_custkey",
            "o_orderkey",
            F.sum(_dec(F.col("o_totalprice"))).over(running).cast("double").alias("running_spend"),
            (
                F.col("o_totalprice")
                - F.coalesce(F.lag("o_totalprice").over(w), F.lit(0.0))
            ).cast("double").alias("delta_vs_prev"),
        )
        .orderBy("o_custkey", "o_orderkey")
    )


@query(
    "events_sliding_3h",
    """
    with hops as (
      select e.event_type, e.value,
             date_trunc('hour', e.ts) - to_hours(k) as win_start
      from events e, unnest([0, 1, 2]) as t(k)
    )
    select win_start, event_type,
           count(*) as n_events,
           cast(sum(cast(value as decimal(18,4))) as double) as sum_value
    from hops
    group by win_start, event_type
    order by win_start, event_type
    """,
)
def events_sliding_3h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding (hopping) window aggregation — window(3h, slide 1h): each
    event lands in 3 hourly hops. Same F.window operator the streaming
    variant uses; batch-SQL-expressible so it stays oracle-gated."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "3 hours", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(_dec(F.col("value"))).cast("double").alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("win_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
        .orderBy("win_start", "event_type")
    )


@query(
    "cube_revenue",
    """
    select
      coalesce(l_returnflag, 'ALL') as flag,
      coalesce(l_linestatus, 'ALL') as status,
      (grouping(l_returnflag) * 2 + grouping(l_linestatus)) as gid,
      cast(sum(cast(l_extendedprice as decimal(18,4))) as double) as revenue,
      count(*) as n_rows
    from lineitem
    group by cube (l_returnflag, l_linestatus)
    order by gid, flag, status
    """,
)
def cube_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (returnflag, linestatus) with an explicit grouping id —
    all four grouping sets in one pass (partial aggregation handles the
    expansion map-side; no four-scan union)."""
    li = _t(spark, sf_dir, "lineitem")
    gid = (F.grouping("l_returnflag") * 2 + F.grouping("l_linestatus")).cast("long")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            gid.alias("gid"),
            F.sum(_dec(F.col("l_extendedprice"))).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .select(
            F.coalesce(F.col("l_returnflag"), F.lit("ALL")).alias("flag"),
            F.coalesce(F.col("l_linestatus"), F.lit("ALL")).alias("status"),
            "gid",
            "revenue",
            "n_rows",
        )
        .orderBy("gid", "flag", "status")
    )


@query(
    "lineitem_unpivot",
    """
    select l_orderkey, l_linenumber, measure, value from (
      select l_orderkey, l_linenumber, 'quantity' as measure, l_quantity as value from lineitem
      union all
      select l_orderkey, l_linenumber, 'extendedprice', l_extendedprice from lineitem
      union all
      select l_orderkey, l_linenumber, 'discount', l_discount from lineitem
    )
    where l_orderkey % 100 = 0
    order by l_orderkey, l_linenumber, measure
    """,
)
def lineitem_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long unpivot via stack(): one scan emits all three measures
    (the SQL union-all oracle scans three times; stack is the Spark-native
    single-pass form). Filter still prunes partitions before the expand."""
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 100 == 0)
    return (
        li.select(
            "l_orderkey",
            "l_linenumber",
            F.expr(
                "stack(3, 'quantity', l_quantity, "
                "'extendedprice', l_extendedprice, "
                "'discount', l_discount) as (measure, value)"
            ),
        )
        .orderBy("l_orderkey", "l_linenumber", "measure")
    )


@query(
    "revenue_by_nation_scale",
    """
    select
      n.n_name,
      cast(sum(cast(l.l_extendedprice as decimal(18,4))
               * (cast(1 as decimal(18,4)) - cast(l.l_discount as decimal(18,4)))) as double)
        as revenue,
      count(*) as n_lineitems
    from lineitem l
    join orders o on l.l_orderkey = o.o_orderkey
    join customer c on o.o_custkey = c.c_custkey
    join nation n on c.c_nationkey = n.n_nationkey
    join region r on n.n_regionkey = r.r_regionkey
    group by n.n_name
    order by n.n_name
    """,
)
def revenue_by_nation_scale(spark: SparkSession, sf_dir: str) -> DataFrame:
    """100 TB-shaped variant of revenue_by_nation (NOTES_r1 idea; VERDICT
    round-1 item 10): at cluster scale orders and customer are fact-sized
    and NOT broadcastable, so instead of broadcasting them this plan

    1. pre-aggregates lineitem by l_orderkey FIRST — map-side combine, so
       the shuffle carries (orderkey, rev, cnt) partial aggregates: ~1/4
       the rows and none of the wide columns;
    2. shuffle-joins orders — the lineitem side REUSES the aggregation's
       hash partitioning on l_orderkey, so only orders shuffles;
    3. re-aggregates by custkey (again map-side combined) and joins
       customer the same way (partitioning reuse on o_custkey);
    4. broadcasts only nation/region — 25 and 5 rows at every scale.

    Decimal partial sums re-summed are exact (decimal(38,8) headroom), so
    the result is bit-identical to the one-shot broadcast plan and shares
    its oracle SQL. With AQE on, the two shuffle joins convert back to
    broadcast at small sf — locally this costs about the same as
    revenue_by_nation; at 1000 executors it is the plan that survives.
    """
    li = _t(spark, sf_dir, "lineitem")
    one = F.lit(1).cast("decimal(18,4)")
    li_agg = (
        li.select(
            "l_orderkey",
            (_dec(F.col("l_extendedprice")) * (one - _dec(F.col("l_discount")))).alias("rev"),
        )
        .groupBy("l_orderkey")
        .agg(F.sum("rev").alias("rev"), F.count(F.lit(1)).alias("cnt"))
    )
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust_agg = (
        li_agg.join(orders, li_agg["l_orderkey"] == orders["o_orderkey"])
        .groupBy("o_custkey")
        .agg(F.sum("rev").alias("rev"), F.sum("cnt").alias("cnt"))
    )
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name", "n_regionkey")
    region = _t(spark, sf_dir, "region").select("r_regionkey")
    return (
        cust_agg.join(cust, cust_agg["o_custkey"] == cust["c_custkey"])
        .join(F.broadcast(nation), cust["c_nationkey"] == nation["n_nationkey"])
        .join(F.broadcast(region), nation["n_regionkey"] == region["r_regionkey"])
        .groupBy("n_name")
        .agg(
            F.sum("rev").cast("double").alias("revenue"),
            F.sum("cnt").alias("n_lineitems"),
        )
        .orderBy("n_name")
    )


@query(
    "event_session_windows",
    """
    with ordered as (
      select user_id, event_id, ts,
             case when lag(ts) over w is null
                    or epoch_us(ts) - epoch_us(lag(ts) over w) >= 1800000000
                  then 1 else 0 end as new_session
      from events
      window w as (partition by user_id order by ts asc, event_id asc)
    ),
    sessions as (
      select user_id, ts,
             sum(new_session) over (partition by user_id order by ts asc, event_id asc
                                    rows unbounded preceding) as session_no
      from ordered
    )
    select user_id,
           min(ts) as session_start,
           max(ts) + interval 30 minutes as session_end,
           count(*) as n_events
    from sessions
    group by user_id, session_no
    order by user_id, session_start
    """,
)
def event_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization via Spark's NATIVE session_window (dynamic-gap
    merging inside the aggregation operator — the same operator the
    streaming engine uses for stateful session aggregation, here in
    batch). Complements user_sessions (lag + running-sum islands): one
    shuffle on user_id, no analytic-window pass.

    Exact-semantics note mirrored in the oracle: session_window treats a
    gap of EXACTLY the timeout as a new session (half-open [ts, ts+gap)
    extension — hence >= in the oracle's island test, vs > in
    user_sessions'), and the window end is last event + gap."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id", F.session_window("ts", "30 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
        .orderBy("user_id", "session_start")
    )


@query(
    "order_window_suite",
    """
    select
      o_custkey,
      o_orderkey,
      ntile(4) over w as price_quartile,
      percent_rank() over w as pct_rank,
      cume_dist() over w as cume,
      lead(o_orderkey) over w as next_orderkey,
      lag(o_orderkey) over w as prev_orderkey
    from orders
    where o_custkey % 50 = 0
    window w as (partition by o_custkey order by o_totalprice asc, o_orderkey asc)
    order by o_custkey, o_totalprice asc, o_orderkey
    """,
)
def order_window_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic-window breadth in one pass: ntile, percent_rank,
    cume_dist, lead, lag share ONE window definition — a single sort
    within each customer partition serves all five functions (one
    shuffle, one sort; five window functions, zero extra passes)."""
    o = _t(spark, sf_dir, "orders").filter(F.col("o_custkey") % 50 == 0)
    w = Window.partitionBy("o_custkey").orderBy(
        F.asc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            F.ntile(4).over(w).alias("price_quartile"),
            F.percent_rank().over(w).alias("pct_rank"),
            F.cume_dist().over(w).alias("cume"),
            F.lead("o_orderkey").over(w).alias("next_orderkey"),
            F.lag("o_orderkey").over(w).alias("prev_orderkey"),
        )
        .orderBy("o_custkey", "pct_rank", "o_orderkey")
    )


@query(
    "lineitem_profile",
    """
    select
      count(*) as n_rows,
      count(l_returnflag) as returnflag_nonnull,
      count(distinct l_returnflag) as returnflag_distinct,
      count(distinct l_linestatus) as linestatus_distinct,
      count(distinct l_orderkey) as orderkey_distinct,
      cast(min(l_quantity) as double) as quantity_min,
      cast(max(l_quantity) as double) as quantity_max,
      cast(cast(min(l_shipdate) as date) as varchar) as shipdate_min,
      cast(cast(max(l_shipdate) as date) as varchar) as shipdate_max
    from lineitem
    """,
)
def lineitem_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Table profiling in ONE aggregation pass: row count, per-column
    non-null and exact distinct counts, numeric and date ranges — the
    data-quality profiler every ingest pipeline runs first. Multiple
    count(distinct) in one agg: Spark plans them as a single expand +
    two-stage aggregate, so the table is still scanned once."""
    li = _t(spark, sf_dir, "lineitem")
    return li.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("l_returnflag").alias("returnflag_nonnull"),
        F.count_distinct("l_returnflag").alias("returnflag_distinct"),
        F.count_distinct("l_linestatus").alias("linestatus_distinct"),
        F.count_distinct("l_orderkey").alias("orderkey_distinct"),
        F.min("l_quantity").cast("double").alias("quantity_min"),
        F.max("l_quantity").cast("double").alias("quantity_max"),
        F.min("l_shipdate").cast("date").cast("string").alias("shipdate_min"),
        F.max("l_shipdate").cast("date").cast("string").alias("shipdate_max"),
    )


@query(
    "cheapest_lineitem_per_order",
    """
    with costs as (
      select l_orderkey, l_linenumber, l_partkey,
             cast(l_extendedprice as double) as extendedprice,
             min(l_extendedprice) over (partition by l_orderkey) as min_price
      from lineitem
      where l_orderkey % 100 = 0
    )
    select l_orderkey, l_linenumber, l_partkey, extendedprice
    from costs
    where extendedprice = min_price
    order by l_orderkey, l_linenumber
    """,
)
def cheapest_lineitem_per_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2's core shape: the correlated 'row with the MIN value for
    this group' subquery DECORRELATED into a window-min + equality
    filter — one partitioned pass instead of re-joining an aggregated
    subquery against the fact. Ties at the minimum are all kept,
    matching the SQL semantics (row_number would drop them)."""
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 100 == 0)
    w = Window.partitionBy("l_orderkey")
    price = F.col("l_extendedprice").cast("double")
    return (
        li.select(
            "l_orderkey",
            "l_linenumber",
            "l_partkey",
            price.alias("extendedprice"),
            F.min("l_extendedprice").over(w).cast("double").alias("min_price"),
        )
        .filter(F.col("extendedprice") == F.col("min_price"))
        .select("l_orderkey", "l_linenumber", "l_partkey", "extendedprice")
        .orderBy("l_orderkey", "l_linenumber")
    )


@query(
    "salted_flag_join",
    """
    with dim as (
      select distinct l_returnflag, 'flag_' || l_returnflag as flag_label
      from lineitem
    )
    select d.flag_label,
           count(*) as n_items,
           cast(sum(cast(l.l_quantity as decimal(18,4))) as double) as total_qty
    from lineitem l
    join dim d on d.l_returnflag = l.l_returnflag
    group by d.flag_label
    order by flag_label
    """,
)
def salted_flag_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe join gated for SEMANTICS: l_returnflag has 3 values, so a
    shuffle join on it degenerates to 3 hot partitions; salted_join
    (operators/skew.py) spreads each key over 8 deterministic sub-keys and
    replicates the dim side. The oracle is the PLAIN join — equality
    proves salting is a pure physical rewrite. (Mechanical partition-size
    assertions live in tests/test_skew_and_sql.py; at local test SF
    Catalyst may still broadcast the tiny dim, which is also correct.)"""
    from idh_etl_demo_spark.operators.skew import salted_join

    li = _t(spark, sf_dir, "lineitem").select("l_returnflag", "l_quantity")
    dim = (
        li.select("l_returnflag")
        .distinct()
        .withColumn("flag_label", F.concat(F.lit("flag_"), F.col("l_returnflag")))
    )
    joined = salted_join(li, dim, on=["l_returnflag"], salt_factor=8)
    return (
        joined.groupBy("flag_label")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum(_dec(F.col("l_quantity"))).cast("double").alias("total_qty"),
        )
        .orderBy("flag_label")
    )


@query(
    "two_stage_flag_agg",
    """
    select l_returnflag,
           count(*) as n_items,
           min(l_extendedprice) as min_price,
           max(l_extendedprice) as max_price
    from lineitem
    group by l_returnflag
    order by l_returnflag
    """,
)
def two_stage_flag_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hot-key-safe aggregation gated for semantics: two_stage_agg
    (operators/skew.py) groups by (key, deterministic salt) first, then
    merges partials — count merges by sum; min/max are idempotent. Only
    order-insensitive aggregates ride this path (double sums would be
    order-dependent); the oracle is the direct one-stage group-by."""
    from idh_etl_demo_spark.operators.skew import two_stage_agg

    li = _t(spark, sf_dir, "lineitem")
    return (
        two_stage_agg(
            li,
            ["l_returnflag"],
            {
                "n_items": ("l_returnflag", "count"),
                "min_price": ("l_extendedprice", "min"),
                "max_price": ("l_extendedprice", "max"),
            },
            salt_factor=16,
        )
        .orderBy("l_returnflag")
    )


@query(
    "part_name_fuzzy_pairs",
    """
    with names as (select distinct p_name from part),
    blocked as (
      select p_name, string_split(p_name, ' ')[1] as block_key from names
    )
    select a.p_name as name_a, b.p_name as name_b,
           levenshtein(a.p_name, b.p_name) as distance
    from blocked a
    join blocked b on a.block_key = b.block_key and a.p_name < b.p_name
    where levenshtein(a.p_name, b.p_name) <= 4
    order by name_a, name_b
    """,
)
def part_name_fuzzy_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity resolution primitive: fuzzy-match pairs via edit distance
    with BLOCKING — candidates come from a capped block join on a cheap
    block key (first name token), so the quadratic levenshtein work is
    confined to blocks instead of N²/2 over the corpus. Matching runs on
    the DISTINCT name domain (names repeat across parts), which at 100 TB
    is the difference between |names|² and |rows|² work. A degenerate
    block (a common leading token) would expand quadratically inside one
    task, so the block join is ``blocked_pairs`` with ``max_block`` —
    the same cap + Observation policy as the LSH paths (bounded recall
    loss, never unbounded work). The blocking-key recall trade-off
    (typos in the first token escape the block) is the standard ER
    design; multi-pass blocking on other keys composes the same way."""
    from idh_etl_demo_spark.operators.dedup import blocked_pairs

    names = _t(spark, sf_dir, "part").select("p_name").distinct()
    blocked = names.select(
        F.col("p_name").alias("name"),
        F.split(F.col("p_name"), " ").getItem(0).alias("block_key"),
    )
    pairs = blocked_pairs(blocked, "name", "block_key", max_block=2048)
    return (
        pairs.select(
            F.col("value_a").alias("name_a"), F.col("value_b").alias("name_b")
        )
        .withColumn("distance", F.levenshtein("name_a", "name_b"))
        .filter(F.col("distance") <= 4)
        .orderBy("name_a", "name_b")
    )


@query(
    "orderkey_distinct_kmv",
    """
    with h as (
      select distinct ('0x' || substring(md5(cast(l_orderkey as varchar)), 1, 15))::bigint as hv
      from lineitem
    ),
    bottomk as (select hv from h order by hv limit 256)
    select
      256 as k,
      max(hv) as kth_min_hash,
      cast(floor(255.0 * 1152921504606846976.0 / max(hv)) as bigint) as est_distinct,
      (select count(*) from h) as exact_distinct
    from bottomk
    """,
)
def orderkey_distinct_kmv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate distinct count via a KMV (bottom-k minimum values)
    sketch — the engine-portable alternative to HyperLogLog: md5-derived
    60-bit hashes are identical in every engine, so unlike
    approx_count_distinct the estimate is cross-engine REPRODUCIBLE and
    oracle-gated exactly. Estimator: (k-1)·|space|/kth_min (Bar-Yossef
    et al. 2002). Scale shape: distinct-of-hashes shuffles 8-byte
    digests with map-side combine, the bottom-k is a TakeOrdered (no
    global sort); at 100 TB swap the exact-distinct audit column out and
    keep the sketch. exact_distinct rides along to show the error."""
    li = _t(spark, sf_dir, "lineitem")
    hv = F.conv(
        F.substring(F.md5(F.col("l_orderkey").cast("string")), 1, 15), 16, 10
    ).cast("long")
    h = li.select(hv.alias("hv")).distinct()
    bottomk = h.orderBy("hv").limit(256)
    exact = h.agg(F.count(F.lit(1)).alias("exact_distinct"))
    est = F.floor(
        F.lit(255.0) * F.lit(1152921504606846976.0) / F.col("kth_min_hash")
    ).cast("long")
    return (
        bottomk.agg(
            F.lit(256).cast("int").alias("k"),
            F.max("hv").alias("kth_min_hash"),
        )
        .withColumn("est_distinct", est)
        .crossJoin(exact)
        .select("k", "kth_min_hash", "est_distinct", "exact_distinct")
    )


@query(
    "customer_dense_ids",
    """
    select c_custkey,
           row_number() over (order by c_custkey) as dense_id
    from customer
    order by c_custkey
    """,
)
def customer_dense_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic dense surrogate IDs (1..N by key order) WITHOUT the
    single-partition trap: a bare ``row_number() over (order by key)``
    funnels the whole table through ONE task (and
    monotonically_increasing_id is neither dense nor stable). Instead:

    1. bucket rows by a key range (here key div 100);
    2. count per bucket — a tiny aggregate;
    3. cumulative offsets over the BUCKET TABLE only (the global window
       runs on |buckets| rows, not |table| rows);
    4. broadcast the offsets back and row_number WITHIN each bucket —
       every partition numbers independently.

    dense_id = bucket_offset + within_bucket_rank. The oracle is the
    naive global row_number — equality proves the two-phase assignment
    is exact. Bucketing by a key range keeps it deterministic (hash
    partition ids would not be)."""
    cust = _t(spark, sf_dir, "customer").select("c_custkey")
    bucketed = cust.withColumn("bucket", (F.col("c_custkey") / 100).cast("long"))
    counts = bucketed.groupBy("bucket").agg(F.count(F.lit(1)).alias("n"))
    # global window over the small bucket table only
    w_off = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, Window.currentRow - 1
    )
    offsets = counts.select(
        "bucket", F.coalesce(F.sum("n").over(w_off), F.lit(0)).alias("offset")
    )
    w_in = Window.partitionBy("bucket").orderBy("c_custkey")
    return (
        bucketed.join(F.broadcast(offsets), "bucket")
        .select(
            "c_custkey",
            (F.col("offset") + F.row_number().over(w_in)).alias("dense_id"),
        )
        .orderBy("c_custkey")
    )


@query(
    "promo_period_orders",
    """
    with promos as (
      select i as promo_id,
             date '1995-01-01' + (i * 60)::int as p_start,
             date '1995-01-01' + (i * 60 + 75)::int as p_end
      from range(0, 40) t(i)
    )
    select p.promo_id,
           count(*) as n_orders,
           cast(sum(cast(o.o_totalprice as decimal(18,4))) as double) as total_price
    from promos p
    join orders o on o.o_orderdate >= p.p_start and o.o_orderdate < p.p_end
    group by p.promo_id
    order by promo_id
    """,
)
def promo_period_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE (interval) join, scale-shaped: orders matched to OVERLAPPING
    75-day promo windows (every 60 days, so adjacent windows share 15
    days — a true interval join, not a bucketing function). A naive
    inequality join plans as broadcast-nested-loop (per-row interval
    scan); instead each window EXPLODES into the calendar months it
    touches and the join is an equi-join on the month bucket plus a
    residual between-filter — the standard interval-bucketing rewrite:
    work scales with |rows| · windows-per-bucket, not |rows| · |windows|.
    The oracle is the plain inequality join (DuckDB plans it as an
    IEJoin), so the gate proves the rewrite loses/duplicates nothing on
    the overlap regions."""
    promos = (
        spark.range(40)
        .select(
            F.col("id").alias("promo_id"),
            F.date_add(F.lit("1995-01-01").cast("date"), (F.col("id") * 60).cast("int")).alias("p_start"),
            F.date_add(F.lit("1995-01-01").cast("date"), (F.col("id") * 60 + 75).cast("int")).alias("p_end"),
        )
    )
    promo_months = promos.select(
        "promo_id",
        "p_start",
        "p_end",
        F.explode(
            F.sequence(
                F.trunc("p_start", "MM"),
                F.trunc(F.date_sub("p_end", 1), "MM"),
                F.expr("interval 1 month"),
            )
        ).alias("month"),
    )
    orders = _t(spark, sf_dir, "orders").withColumn(
        "month", F.trunc(F.col("o_orderdate").cast("date"), "MM")
    )
    joined = orders.join(F.broadcast(promo_months), "month").filter(
        (F.col("o_orderdate") >= F.col("p_start"))
        & (F.col("o_orderdate") < F.col("p_end"))
    )
    return (
        joined.groupBy("promo_id")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(_dec(F.col("o_totalprice"))).cast("double").alias("total_price"),
        )
        .orderBy("promo_id")
    )


@query(
    "lineitem_quarantine_report",
    """
    with flagged as (
      select l_orderkey, l_linenumber,
             list_filter([
               case when l_quantity > 45 then 'quantity_gt_45' end,
               case when l_discount >= 0.08 then 'discount_ge_8pct' end,
               case when l_tax > 0.07 then 'tax_gt_7pct' end
             ], x -> x is not null) as reasons
      from lineitem
    ),
    exploded as (
      select unnest(reasons) as reason, l_orderkey
      from flagged
      where len(reasons) > 0
    )
    select reason,
           count(*) as n_rows,
           min(l_orderkey) as sample_orderkey
    from exploded
    group by reason
    order by reason
    """,
)
def lineitem_quarantine_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Validation-split (quarantine) pattern: every row is checked against
    a rule list IN ONE PASS; violating rows fan out one row per violated
    rule (a row can trip several) and aggregate into a per-rule report
    with a reproducible sample key. In the load pipeline the same
    ``reasons`` column routes rows to clean/quarantine sinks — this entry
    gates the rule-evaluation semantics. Complements dq_orders_audit
    (table-level invariants) with row-level rule routing."""
    li = _t(spark, sf_dir, "lineitem")
    reasons = F.array_compact(
        F.array(
            F.when(F.col("l_quantity") > 45, F.lit("quantity_gt_45")),
            F.when(F.col("l_discount") >= 0.08, F.lit("discount_ge_8pct")),
            F.when(F.col("l_tax") > 0.07, F.lit("tax_gt_7pct")),
        )
    )
    return (
        li.select("l_orderkey", "l_linenumber", reasons.alias("reasons"))
        .filter(F.size("reasons") > 0)
        .select("l_orderkey", F.explode("reasons").alias("reason"))
        .groupBy("reason")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("l_orderkey").alias("sample_orderkey"),
        )
        .orderBy("reason")
    )


@query(
    "event_funnel",
    """
    with w1 as (
      select user_id, ts, event_type,
             min(case when event_type = 'view' then ts end)
               over (partition by user_id) as t1
      from events
    ),
    w2 as (
      select *, min(case when event_type = 'click'
                              and ts >= t1 and ts < t1 + interval 24 hours then ts end)
                  over (partition by user_id) as t2
      from w1
    ),
    w3 as (
      select *, min(case when event_type = 'purchase'
                              and ts >= t2 and ts < t2 + interval 24 hours then ts end)
                  over (partition by user_id) as t3
      from w2
    )
    select
      count(distinct case when t1 is not null then user_id end) as n_view,
      count(distinct case when t2 is not null then user_id end) as n_view_click,
      count(distinct case when t3 is not null then user_id end) as n_view_click_purchase
    from w3
    """,
)
def event_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel (view → click → purchase, 24-hour conversion window
    per step): stage k's timestamp is the earliest qualifying event at or
    after stage k-1 and within the window — the product-analytics
    sequence-match primitive. Three chained window-mins share
    ONE user_id partitioning (a single shuffle, three in-partition
    passes); the greedy earliest-next-step choice is the standard funnel
    semantics and is order-deterministic."""
    ev = _t(spark, sf_dir, "events").select("user_id", "ts", "event_type")
    w = Window.partitionBy("user_id")
    t1 = F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(w)
    step1 = ev.withColumn("t1", t1)
    hour = F.expr("interval 24 hours")
    t2 = F.min(
        F.when(
            (F.col("event_type") == "click")
            & (F.col("ts") >= F.col("t1"))
            & (F.col("ts") < F.col("t1") + hour),
            F.col("ts"),
        )
    ).over(w)
    step2 = step1.withColumn("t2", t2)
    t3 = F.min(
        F.when(
            (F.col("event_type") == "purchase")
            & (F.col("ts") >= F.col("t2"))
            & (F.col("ts") < F.col("t2") + hour),
            F.col("ts"),
        )
    ).over(w)
    step3 = step2.withColumn("t3", t3)
    stage = lambda t: F.count_distinct(  # noqa: E731
        F.when(F.col(t).isNotNull(), F.col("user_id"))
    )
    return step3.agg(
        stage("t1").alias("n_view"),
        stage("t2").alias("n_view_click"),
        stage("t3").alias("n_view_click_purchase"),
    )
