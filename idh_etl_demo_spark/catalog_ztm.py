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
from idh_etl_demo_spark.plans.inputs import clean_weather
from idh_etl_demo_spark.plans.star import (
    build_delay_fact,
    build_line_dim,
    build_stop_dim,
    build_vehicle_dim,
    build_weather_dim,
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


# ---------------------------------------------------------------------------
# IMGW-shaped weather feed derived from events → gates the full cleansing
# chain (two-stage dedup, null filters, half-even rounds, classifiers)
# through the driver oracle. Values are integer-derived so .5 boundaries
# genuinely occur and exercise the half-even rounding parity.
# ---------------------------------------------------------------------------

_WEATHER_FEED_CTE = """
    weather_feed as (
      select
        case when user_id % 4 = 0 then '99999' else '12375' end as id_stacji,
        strftime(date_trunc('hour', ts), '%Y-%m-%d') as data_pomiaru,
        hour(ts)::bigint as godzina_pomiaru,
        case when event_id % 29 = 0 then null
             else (cast(round(value * 100, 0) as bigint) % 700) / 10.0 - 20 end as temperatura,
        case when event_id % 13 = 0 then null
             else (cast(round(value * 100, 0) as bigint) % 120) / 10.0 end as suma_opadu,
        case when event_id % 31 = 0 then null
             else (cast(round(value * 100, 0) as bigint) % 220) / 10.0 end as predkosc_wiatru,
        (cast(round(value * 100, 0) as bigint) % 360) as kierunek_wiatru,
        30 + (cast(round(value * 100, 0) as bigint) % 700) / 10.0 as wilgotnosc_wzgledna,
        case when event_id % 11 = 0 then null
             else 980 + (cast(round(value * 100, 0) as bigint) % 500) / 10.0 end as cisnienie
      from events
      where event_id % 7 = 0
    )
"""

_W_ORDER_1 = (
    "station_id asc nulls last, measurement_date asc nulls last, "
    "temperature asc nulls last, precipitation_mm asc nulls last, "
    "wind_speed_raw asc nulls last, wind_direction_deg asc nulls last, "
    "humidity_percent asc nulls last, pressure_raw asc nulls last"
)
_W_ORDER_2 = _W_ORDER_1.split(", ", 1)[1]


@query(
    "ztm_weather_dim",
    f"""
    with {_WEATHER_FEED_CTE},
    renamed as (
      select id_stacji::varchar as station_id, data_pomiaru::varchar as measurement_date,
             godzina_pomiaru::bigint as hour, temperatura::double as temperature,
             suma_opadu::double as precipitation_mm, predkosc_wiatru::double as wind_speed_raw,
             kierunek_wiatru::bigint as wind_direction_deg,
             wilgotnosc_wzgledna::double as humidity_percent, cisnienie::double as pressure_raw
      from weather_feed
    ),
    dedup_hour as (
      select * exclude (rn) from (
        select *, row_number() over (partition by hour order by {_W_ORDER_1}) as rn
        from renamed) where rn = 1
    ),
    filtered as (
      select * from dedup_hour
      where temperature is not null and wind_speed_raw is not null
    ),
    dedup_station as (
      select * exclude (rn) from (
        select *, row_number() over (partition by station_id, hour order by {_W_ORDER_2}) as rn
        from filtered) where rn = 1
    ),
    biz as (
      select
        station_id || '-' || measurement_date || '-' || lpad(hour::varchar, 2, '0') as id,
        temperature,
        cast(round_even(coalesce(precipitation_mm, 0), 0) as bigint) as fall_mm,
        case when temperature < 2.0 then 'snow' else 'rain' end as fall_type,
        cast(round_even(coalesce(wind_speed_raw, 0), 0) as bigint) as wind_speed_mps,
        wind_direction_deg, humidity_percent,
        cast(round_even(coalesce(pressure_raw, 1013), 0) as bigint) as pressure_hpa
      from dedup_station
    ),
    scored as (
      select *,
        (case when temperature >= 10 and temperature <= 25 then 2
              when temperature >= 2 and temperature < 10 then 1
              when temperature < 2 or temperature > 35 then -1 else 0 end
         + case when wind_speed_mps < 5 then 2 when wind_speed_mps < 10 then 1
                when wind_speed_mps > 15 then -1 else 0 end
         + case when humidity_percent < 70 then 1 when humidity_percent > 90 then -1 else 0 end
         + case when fall_mm = 0 then 2 when fall_mm > 5 then -1 else 0 end) as score
      from biz
    )
    select id, temperature, fall_mm, fall_type, wind_speed_mps, wind_direction_deg,
           humidity_percent, pressure_hpa,
           case when score >= 6 then 'ludicrously-divine'
                when score >= 4 then 'titanically-passable'
                when score >= 2 then 'nobly-sufficient'
                when score >= 0 then 'courageously-subpar'
                else 'opera-level-atrocious' end as general_circumstances
    from scored
    order by id
    """,
)
def ztm_weather_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full weather cleansing chain + WeatherDim builder (SURVEY §2.1
    S3, §2.4 A6, §2.7 F11-F16) on an IMGW-shaped feed derived from events —
    production code path plans/inputs.py:clean_weather."""
    ev = _t(spark, sf_dir, "events").filter(F.col("event_id") % 7 == 0)
    v100 = F.round(F.col("value") * 100, 0).cast("long")
    feed = ev.select(
        F.when(F.col("user_id") % 4 == 0, "99999").otherwise("12375").alias("id_stacji"),
        F.date_format(F.date_trunc("hour", F.col("ts")), "yyyy-MM-dd").alias("data_pomiaru"),
        F.hour(F.col("ts")).cast("long").alias("godzina_pomiaru"),
        F.when(F.col("event_id") % 29 == 0, None)
        .otherwise((v100 % 700) / F.lit(10.0) - 20)
        .alias("temperatura"),
        F.when(F.col("event_id") % 13 == 0, None)
        .otherwise((v100 % 120) / F.lit(10.0))
        .alias("suma_opadu"),
        F.when(F.col("event_id") % 31 == 0, None)
        .otherwise((v100 % 220) / F.lit(10.0))
        .alias("predkosc_wiatru"),
        (v100 % 360).alias("kierunek_wiatru"),
        (F.lit(30) + (v100 % 700) / F.lit(10.0)).alias("wilgotnosc_wzgledna"),
        F.when(F.col("event_id") % 11 == 0, None)
        .otherwise(F.lit(980) + (v100 % 500) / F.lit(10.0))
        .alias("cisnienie"),
    )
    return build_weather_dim(clean_weather(feed)).orderBy("id")


# ---------------------------------------------------------------------------
# As-of join and rollup — beyond-reference relational coverage
# ---------------------------------------------------------------------------


@query(
    "purchase_view_attribution",
    """
    with purchases as (
      select event_id, user_id, ts from events where event_type = 'purchase'
    ),
    views as (
      select user_id, ts as view_ts, event_id as view_event_id
      from events where event_type = 'view'
    )
    select p.event_id, p.user_id, p.ts, v.view_ts as matched_view_ts, v.view_event_id
    from purchases p
    asof join views v on p.user_id = v.user_id and p.ts >= v.view_ts
    order by p.event_id
    """,
)
def purchase_view_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backward as-of join: each purchase attributed to the user's most
    recent prior view. Union + window implementation (operators/asof.py) —
    one shuffle, no range-join explosion."""
    from idh_etl_demo_spark.operators.asof import asof_join

    ev = _t(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id",
        F.col("ts").alias("view_ts"),
        F.col("event_id").alias("view_event_id"),
    )
    return (
        asof_join(
            purchases,
            views,
            on=["user_id"],
            left_ts="ts",
            right_ts="view_ts",
            value_cols=["view_event_id"],
            how="inner",
        )
        .select(
            "event_id",
            "user_id",
            "ts",
            F.col("matched_view_ts"),
            "view_event_id",
        )
        .orderBy("event_id")
    )


@query(
    "rollup_revenue",
    """
    select o_orderpriority, o_orderstatus,
           count(*) as n_orders,
           cast(sum(cast(o_totalprice as decimal(18,4))) as double) as total
    from orders
    group by rollup (o_orderpriority, o_orderstatus)
    order by o_orderpriority nulls first, o_orderstatus nulls first
    """,
)
def rollup_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy totals (order priority → status → grand total) —
    multi-level aggregation beyond the reference's flat group-bys."""
    return (
        _t(spark, sf_dir, "orders")
        .rollup("o_orderpriority", "o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,4)")).cast("double").alias("total"),
        )
        .orderBy(
            F.asc_nulls_first("o_orderpriority"), F.asc_nulls_first("o_orderstatus")
        )
    )
