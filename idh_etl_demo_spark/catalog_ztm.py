"""Catalog part 3 — the ZTM star-schema builders themselves, driven over
inputs deterministically DERIVED from the synthetic benchmark tables, so the
driver's DuckDB gate exercises the exact production builder code
(plans/star.py), not a re-implementation.

Derivation map (same CTEs on the oracle side):
    trips       ← orders   (trip_id = o_orderkey, route_id = o_custkey % 50)
    stop_times  ← lineitem (trip_id = l_orderkey, stop_id = l_partkey % 100,
                            shape_dist_traveled = l_quantity)
    routes      ← distinct trips.route_id, route_type = route_id % 5
    delays      ← sampled events (Route = user_id % 50, vehicle = user_id % 30,
                            Timestamp = hour of ts, Delay = derived minutes)
    vehicles    ← distinct user_id % 30 (carrier = 'carrier-' || vn % 7)
    stops       ← customer (stop_id = 'S'||c_custkey, name = 'stop-'||c_custkey % 100)
    weather     ← distinct event hours (id = '12375-'||hour, station hard-code
                  mirroring reference src/queries.py:145)
    time_dim    ← distinct event hours (full TimeDim derivation)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
import pyspark.sql.functions as F

from idh_etl_demo_spark.catalog import _t, query
from idh_etl_demo_spark.plans.inputs import (  # noqa: F401  (time derivations reused)
    build_time_dim_rows,
)
from idh_etl_demo_spark.plans.star import (
    build_delay_fact,
    build_line_dim,
    build_stop_dim,
    build_vehicle_dim,
)

# ---------------------------------------------------------------------------
# Spark-side derived inputs
# ---------------------------------------------------------------------------


def _trips(spark, sf_dir) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return o.select(
        (F.col("o_custkey") % 50).cast("string").alias("route_id"),
        F.col("o_orderkey").cast("string").alias("trip_id"),
    )


def _stop_times(spark, sf_dir) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return li.select(
        F.col("l_orderkey").cast("string").alias("trip_id"),
        (F.col("l_partkey") % 100).cast("string").alias("stop_id"),
        F.col("l_quantity").alias("shape_dist_traveled"),
    )


def _routes(spark, sf_dir) -> DataFrame:
    return (
        _trips(spark, sf_dir)
        .select("route_id")
        .distinct()
        .select(
            "route_id", (F.col("route_id").cast("long") % 5).alias("route_type")
        )
    )


def _delays(spark, sf_dir) -> DataFrame:
    ev = _t(spark, sf_dir, "events").filter(F.col("event_id") % 199 == 0)
    v100 = F.round(F.col("value") * 100, 0).cast("long")
    return ev.select(
        F.date_trunc("hour", F.col("ts")).alias("Timestamp"),
        ((v100 % 30) - 5).alias("Delay"),
        (F.col("user_id") % 50).cast("string").alias("Route"),
        F.concat(F.lit("stop-"), (F.col("user_id") % 100).cast("string")).alias("Stop Name"),
        (F.col("user_id") % 30).cast("string").alias("Vehicle No"),
    )


def _vehicles(spark, sf_dir) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return (
        ev.select((F.col("user_id") % 30).cast("long").alias("vn"))
        .distinct()
        .select(
            F.col("vn").cast("string").alias("vehicle_number"),
            F.concat(F.lit("carrier-"), (F.col("vn") % 7).cast("string")).alias("carrier"),
        )
    )


def _stops(spark, sf_dir) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    return c.select(
        F.concat(F.lit("S"), F.col("c_custkey").cast("string")).alias("stop_id"),
        F.concat(F.lit("stop-"), (F.col("c_custkey") % 100).cast("string")).alias("stop_name"),
    )


def _event_hours(spark, sf_dir) -> DataFrame:
    return (
        _t(spark, sf_dir, "events")
        .select(F.date_trunc("hour", F.col("ts")).alias("full_timestamp"))
        .distinct()
    )


# Oracle-side derived inputs (same names, same derivations)
_ZTM_CTES = """
    trips as (
      select (o_custkey % 50)::varchar as route_id, o_orderkey::varchar as trip_id
      from orders
    ),
    stop_times as (
      select l_orderkey::varchar as trip_id, (l_partkey % 100)::varchar as stop_id,
             l_quantity as shape_dist_traveled
      from lineitem
    ),
    routes as (
      select route_id, (route_id::bigint % 5) as route_type
      from (select distinct route_id from trips)
    ),
    delays as (
      select date_trunc('hour', ts) as "Timestamp",
             (cast(round(value * 100, 0) as bigint) % 30) - 5 as "Delay",
             (user_id % 50)::varchar as "Route",
             'stop-' || (user_id % 100)::varchar as "Stop Name",
             (user_id % 30)::varchar as "Vehicle No"
      from events where event_id % 199 = 0
    ),
    vehicles as (
      select vn::varchar as vehicle_number,
             'carrier-' || (vn % 7)::varchar as carrier
      from (select distinct (user_id % 30)::bigint as vn from events)
    ),
    stops as (
      select 'S' || c_custkey::varchar as stop_id,
             'stop-' || (c_custkey % 100)::varchar as stop_name
      from customer
    ),
    event_hours as (select distinct date_trunc('hour', ts) as full_timestamp from events)
"""


@query(
    "ztm_line_dim",
    f"""
    with {_ZTM_CTES},
    len_stats as (
      select t.route_id, t.trip_id, max(st.shape_dist_traveled) as stat
      from trips t left join stop_times st on t.trip_id = st.trip_id
      group by t.route_id, t.trip_id
    ),
    len_mode as (
      select route_id, stat from (
        select route_id, stat,
               row_number() over (partition by route_id
                                  order by count(*) desc, stat desc nulls last) as rn
        from len_stats group by route_id, stat) where rn = 1
    ),
    cnt_stats as (
      select t.route_id, t.trip_id, count(distinct st.stop_id) as stat
      from trips t left join stop_times st on t.trip_id = st.trip_id
      group by t.route_id, t.trip_id
    ),
    cnt_mode as (
      select route_id, stat from (
        select route_id, stat,
               row_number() over (partition by route_id
                                  order by count(*) desc, stat desc nulls last) as rn
        from cnt_stats group by route_id, stat) where rn = 1
    )
    select
      r.route_id as id,
      v.carrier as operator,
      case when r.route_type = 0 then 'tram'
           when r.route_type = 2 then 'rail'
           when r.route_type = 3 then 'bus'
           else 'unknown' end as line_type,
      cast(coalesce(lm.stat, 0) as double) as route_length_km,
      cast(coalesce(cm.stat, 0) as bigint) as stops_amount
    from routes r
    left join delays d on r.route_id = d."Route"
    left join vehicles v on d."Vehicle No" = v.vehicle_number
    left join len_mode lm on r.route_id = lm.route_id
    left join cnt_mode cm on r.route_id = cm.route_id
    order by id, operator
    """,
)
def ztm_line_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The LineDim builder (mode-of-trip-stats + 4 left joins, SURVEY §2.3
    J1-J4, §2.4 A1-A4, §2.5 W1-W2) on derived inputs — production code path
    plans/star.py:build_line_dim."""
    return build_line_dim(
        _routes(spark, sf_dir),
        _trips(spark, sf_dir),
        _stop_times(spark, sf_dir),
        _delays(spark, sf_dir),
        _vehicles(spark, sf_dir),
    ).orderBy("id", "operator")


_DIRTY_VEHICLES_CTE = """
    dirty_vehicles as (
      select
        case when p_partkey % 11 = 0 then null
             when p_partkey % 13 = 0 then '   '
             else 'v' || p_partkey::varchar end as vehicle_number,
        case when p_partkey % 17 = 0 then '' else p_brand end as manufacturer,
        case when p_partkey % 19 = 0 then null else p_type end as type,
        case when p_partkey % 7 = 0 then 'n/a'
             when p_partkey % 7 = 1 then '20' || (p_size % 10)::varchar || 'a'
             when p_partkey % 7 = 2 then null
             else (1990 + p_size % 30)::varchar end as production_year,
        p_name as carrier
      from part
    )
"""


@query(
    "ztm_vehicle_dim",
    f"""
    with {_DIRTY_VEHICLES_CTE}
    select vehicle_number as id, manufacturer as brand, type as v_model,
           production_year::bigint as year_produced
    from dirty_vehicles
    where vehicle_number is not null and trim(vehicle_number) != ''
      and manufacturer is not null and trim(manufacturer) != ''
      and type is not null and trim(type) != ''
      and production_year is not null
      and regexp_matches(production_year, '^\\d+$')
    order by id
    """,
)
def ztm_vehicle_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The VehicleDim builder (blank/null filters + digits-only year guard,
    SURVEY §2.2 P4/P5, §2.7 F5-F7) over deliberately dirtied derived input
    — production code path plans/star.py:build_vehicle_dim."""
    p = _t(spark, sf_dir, "part")
    dirty = p.select(
        F.when(F.col("p_partkey") % 11 == 0, None)
        .when(F.col("p_partkey") % 13 == 0, "   ")
        .otherwise(F.concat(F.lit("v"), F.col("p_partkey").cast("string")))
        .alias("vehicle_number"),
        F.when(F.col("p_partkey") % 17 == 0, "").otherwise(F.col("p_brand")).alias("manufacturer"),
        F.when(F.col("p_partkey") % 19 == 0, None).otherwise(F.col("p_type")).alias("type"),
        F.when(F.col("p_partkey") % 7 == 0, "n/a")
        .when(
            F.col("p_partkey") % 7 == 1,
            F.concat(F.lit("20"), (F.col("p_size") % 10).cast("string"), F.lit("a")),
        )
        .when(F.col("p_partkey") % 7 == 2, None)
        .otherwise((F.lit(1990) + F.col("p_size") % 30).cast("string"))
        .alias("production_year"),
        F.col("p_name").alias("carrier"),
    )
    return build_vehicle_dim(dirty)


@query(
    "ztm_stop_dim",
    """
    select 'S' || c_custkey::varchar as id,
           'stop-' || (c_custkey % 100)::varchar as name,
           cast((c_custkey % 90)::varchar as double) as lat,
           cast((c_custkey % 180)::varchar as double) as lon
    from customer
    """,
)
def ztm_stop_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The StopDim builder (projection + string→double coordinate casts,
    SURVEY §2.2 P1, §2.7 F6) on derived input — production code path
    plans/star.py:build_stop_dim."""
    c = _t(spark, sf_dir, "customer")
    stops = c.select(
        F.concat(F.lit("S"), F.col("c_custkey").cast("string")).alias("stop_id"),
        F.concat(F.lit("stop-"), (F.col("c_custkey") % 100).cast("string")).alias("stop_name"),
        (F.col("c_custkey") % 90).cast("string").alias("stop_lat"),
        (F.col("c_custkey") % 180).cast("string").alias("stop_lon"),
    )
    return build_stop_dim(stops)


@query(
    "ztm_delay_fact",
    f"""
    with {_ZTM_CTES},
    time_dim as (
      select cast(strftime(full_timestamp, '%Y%m%d') as bigint) as id, full_timestamp
      from event_hours
    ),
    weather as (
      select '12375-' || strftime(full_timestamp, '%Y-%m-%d-%H') as id from event_hours
    )
    select d."Delay" as delay_mins,
           t.id as time_id,
           w.id as weather_id,
           v.vehicle_number as vehicle_id,
           r.route_id as line_id,
           s.stop_id as stop_id
    from delays d
    join time_dim t on t.full_timestamp = d."Timestamp"
    join weather w on w.id = '12375-' || strftime(d."Timestamp", '%Y-%m-%d-%H')
    join vehicles v on v.vehicle_number = d."Vehicle No"
    join routes r on r.route_id = d."Route"
    join stops s on s.stop_name = d."Stop Name"
    order by time_id, weather_id, vehicle_id, line_id, stop_id, delay_mins
    """,
)
def ztm_delay_fact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The DelayFact builder (five broadcast inner joins incl. the computed
    weather key, SURVEY §2.3 J5-J9) on derived inputs — production code
    path plans/star.py:build_delay_fact."""
    hours = _event_hours(spark, sf_dir)
    time_dim = hours.select(
        F.date_format("full_timestamp", "yyyyMMdd").cast("long").alias("id"),
        F.col("full_timestamp"),
    )
    weather = hours.select(
        F.concat(
            F.lit("12375-"), F.date_format("full_timestamp", "yyyy-MM-dd-HH")
        ).alias("id")
    )
    return build_delay_fact(
        _delays(spark, sf_dir),
        time_dim,
        weather,
        _vehicles(spark, sf_dir),
        _routes(spark, sf_dir),
        _stops(spark, sf_dir),
    ).orderBy("time_id", "weather_id", "vehicle_id", "line_id", "stop_id", "delay_mins")
