"""Independent DuckDB implementation of the ZTM star-schema semantics,
used as the test oracle (SURVEY §5). Written from the spec in SURVEY §1-2
(not copied from the reference); deliberately mirrors OUR deterministic
dedup/keep-first rules so Spark results are bit-comparable.
"""

from __future__ import annotations

import duckdb

_DAY = "2024/12/25"

_WEATHER_ORDER_1 = (
    "station_id asc nulls last, measurement_date asc nulls last, "
    "temperature asc nulls last, precipitation_mm asc nulls last, "
    "wind_speed_raw asc nulls last, wind_direction_deg asc nulls last, "
    "humidity_percent asc nulls last, pressure_raw asc nulls last"
)
_WEATHER_ORDER_2 = (
    "measurement_date asc nulls last, temperature asc nulls last, "
    "precipitation_mm asc nulls last, wind_speed_raw asc nulls last, "
    "wind_direction_deg asc nulls last, humidity_percent asc nulls last, "
    "pressure_raw asc nulls last"
)


def register_inputs(con: duckdb.DuckDBPyConnection, root: str, day: str = _DAY) -> None:
    con.execute(
        f"""create or replace view routes as
        select route_id::varchar as route_id, route_type::bigint as route_type
        from read_csv('{root}/gtfs/{day}/routes.csv', header=true, all_varchar=true)"""
    )
    con.execute(
        f"""create or replace view trips as
        select route_id::varchar as route_id, trip_id::varchar as trip_id
        from read_csv('{root}/gtfs/{day}/trips.csv', header=true, all_varchar=true)"""
    )
    con.execute(
        f"""create or replace view stops as
        select stop_id::varchar as stop_id, stop_name::varchar as stop_name,
               stop_lat::varchar as stop_lat, stop_lon::varchar as stop_lon
        from read_csv('{root}/gtfs/{day}/stops.csv', header=true, all_varchar=true)"""
    )
    con.execute(
        f"""create or replace view stop_times as
        select trip_id::varchar as trip_id, stop_id::varchar as stop_id,
               shape_dist_traveled::double as shape_dist_traveled
        from read_csv('{root}/gtfs/{day}/stop_times.csv', header=true, all_varchar=true)"""
    )
    con.execute(
        f"""create or replace view vehicles as
        select vehicle_number::varchar as vehicle_number,
               manufacturer::varchar as manufacturer,
               type::varchar as type,
               production_year::varchar as production_year,
               carrier::varchar as carrier
        from read_csv('{root}/ztm_vehicles_detailed.csv', header=true, all_varchar=true)"""
    )
    con.execute(
        rf"""create or replace view delays as
        select date_trunc('hour', "Timestamp"::timestamp) as "Timestamp",
               (case when "Delay" like '%min przed czasem%' then -1 else 1 end)
                 * cast(regexp_extract("Delay", '(-?\d+)', 1) as bigint) as "Delay",
               "Route"::varchar as "Route",
               "Stop Name"::varchar as "Stop Name",
               "Vehicle No"::varchar as "Vehicle No"
        from read_csv('{root}/delays/{day}/*.csv', header=true, all_varchar=true)"""
    )
    con.execute(
        f"""create or replace view weather as
        with raw as (
          select id_stacji::varchar as station_id,
                 data_pomiaru::varchar as measurement_date,
                 godzina_pomiaru::bigint as hour,
                 temperatura::double as temperature,
                 suma_opadu::double as precipitation_mm,
                 predkosc_wiatru::double as wind_speed_raw,
                 kierunek_wiatru::bigint as wind_direction_deg,
                 wilgotnosc_wzgledna::double as humidity_percent,
                 cisnienie::double as pressure_raw
          from read_csv('{root}/weather/{day}/*.csv', header=true, all_varchar=true)
        ),
        dedup_hour as (
          select * exclude (rn) from (
            select *, row_number() over (partition by hour order by {_WEATHER_ORDER_1}) as rn
            from raw) where rn = 1
        ),
        filtered as (
          select * from dedup_hour
          where temperature is not null and wind_speed_raw is not null
        ),
        dedup_station as (
          select * exclude (rn) from (
            select *, row_number() over (partition by station_id, hour order by {_WEATHER_ORDER_2}) as rn
            from filtered) where rn = 1
        ),
        biz as (
          select
            station_id || '-' || measurement_date || '-' || lpad(hour::varchar, 2, '0') as id,
            temperature,
            cast(round_even(coalesce(precipitation_mm, 0), 0) as bigint) as fall_mm,
            case when temperature < 2.0 then 'snow' else 'rain' end as fall_type,
            cast(round_even(coalesce(wind_speed_raw, 0), 0) as bigint) as wind_speed_mps,
            wind_direction_deg,
            humidity_percent,
            cast(round_even(coalesce(pressure_raw, 1013), 0) as bigint) as pressure_hpa
          from dedup_station
        ),
        scored as (
          select *,
            (case when temperature >= 10 and temperature <= 25 then 2
                  when temperature >= 2 and temperature < 10 then 1
                  when temperature < 2 or temperature > 35 then -1
                  else 0 end
             + case when wind_speed_mps < 5 then 2
                    when wind_speed_mps < 10 then 1
                    when wind_speed_mps > 15 then -1
                    else 0 end
             + case when humidity_percent < 70 then 1
                    when humidity_percent > 90 then -1
                    else 0 end
             + case when fall_mm = 0 then 2
                    when fall_mm > 5 then -1
                    else 0 end) as score
          from biz
        )
        select id, temperature, fall_mm, fall_type, wind_speed_mps,
               wind_direction_deg, humidity_percent, pressure_hpa,
               case when score >= 6 then 'ludicrously-divine'
                    when score >= 4 then 'titanically-passable'
                    when score >= 2 then 'nobly-sufficient'
                    when score >= 0 then 'courageously-subpar'
                    else 'opera-level-atrocious' end as general_circumstances
        from scored"""
    )
    con.execute(
        """create or replace view time_dim as
        select
          cast(strftime(ts, '%Y%m%d') as bigint) as id,
          ts as full_timestamp,
          hour(ts)::bigint as hour_,
          upper(dayname(ts)) as weekday,
          isodow(ts)::bigint as weekday_num,
          monthname(ts) as month_,
          month(ts)::bigint as month_num,
          case when month(ts) in (12, 1, 2) then 'winter'
               when month(ts) in (3, 4, 5) then 'spring'
               when month(ts) in (6, 7, 8) then 'summer'
               else 'autumn' end as season,
          year(ts)::bigint as year_,
          case when hour(ts) between 6 and 9 then 'morning'
               when hour(ts) between 10 and 13 then 'midday'
               when hour(ts) between 14 and 17 then 'afternoon'
               when hour(ts) between 18 and 22 then 'evening'
               else 'night' end as time_of_day,
          isodow(ts) <= 5 as is_business_day
        from (select unnest(generate_series(timestamp '2024-12-25 00:00:00',
                                            timestamp '2024-12-25 23:00:00',
                                            interval 1 hour)) as ts)"""
    )


_MODE_CTE = """
  {name}_stats as (
    select t.route_id, t.trip_id, {agg} as stat
    from trips t left join stop_times st on t.trip_id = st.trip_id
    group by t.route_id, t.trip_id
  ),
  {name}_mode as (
    select route_id, stat from (
      select route_id, stat,
             row_number() over (partition by route_id
                                order by count(*) desc, stat desc nulls last) as rn
      from {name}_stats group by route_id, stat) where rn = 1
  )
"""

LINE_DIM_ORACLE = (
    "with "
    + _MODE_CTE.format(name="len", agg="max(st.shape_dist_traveled)")
    + ", "
    + _MODE_CTE.format(name="cnt", agg="count(distinct st.stop_id)")
    + """
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
    left join cnt_mode cm on r.route_id = cm.route_id"""
)

STOP_DIM_ORACLE = """
  select stop_id as id, stop_name as name,
         stop_lat::double as lat, stop_lon::double as lon
  from stops"""

VEHICLE_DIM_ORACLE = r"""
  select vehicle_number as id, manufacturer as brand, type as v_model,
         production_year::bigint as year_produced
  from vehicles
  where vehicle_number is not null and trim(vehicle_number) != ''
    and manufacturer is not null and trim(manufacturer) != ''
    and type is not null and trim(type) != ''
    and production_year is not null
    and regexp_matches(production_year, '^\d+$')"""

WEATHER_DIM_ORACLE = "select * from weather"

TIME_DIM_ORACLE = "select * from time_dim"

DELAY_FACT_ORACLE = """
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
"""

ORACLES = {
    "LineDim": LINE_DIM_ORACLE,
    "StopDim": STOP_DIM_ORACLE,
    "VehicleDim": VEHICLE_DIM_ORACLE,
    "WeatherDim": WEATHER_DIM_ORACLE,
    "TimeDim": TIME_DIM_ORACLE,
    "DelayFact": DELAY_FACT_ORACLE,
}
