"""Star-schema table builders: 5 dimensions + 1 fact.

Each builder is a pure function over the cleansed input views and returns
a lazy DataFrame whose logical plan Catalyst optimizes end-to-end. Every
inner table of the fact join is a small dimension → broadcast hash joins
(hinted explicitly; AQE would pick them anyway). Semantics mirror the
reference's six SQL queries (reference: src/queries.py:12-149) and key
declarations (reference: src/enums.py:24-35).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from pyspark.sql import DataFrame
import pyspark.sql.functions as F

from idh_etl_demo_spark.operators.mode import mode_per_group


def build_stop_dim(stops: DataFrame) -> DataFrame:
    """Projection + float casts (reference: src/queries.py:77-84)."""
    return stops.select(
        F.col("stop_id").alias("id"),
        F.col("stop_name").alias("name"),
        F.col("stop_lat").cast("double").alias("lat"),
        F.col("stop_lon").cast("double").alias("lon"),
    )


def build_vehicle_dim(vehicles: DataFrame) -> DataFrame:
    """Blank/null filters + digits-only year guard + global sort
    (reference: src/queries.py:86-103). The sort is cosmetic (the sink does
    not preserve it) but kept for oracle diffing — SURVEY §2.6 O1."""
    nonblank = lambda c: F.col(c).isNotNull() & (F.trim(F.col(c)) != "")
    return (
        vehicles.filter(
            nonblank("vehicle_number")
            & nonblank("manufacturer")
            & nonblank("type")
            & F.col("production_year").isNotNull()
            & F.col("production_year").cast("string").rlike(r"^\d+$")
        )
        .select(
            F.col("vehicle_number").alias("id"),
            F.col("manufacturer").alias("brand"),
            F.col("type").alias("v_model"),
            F.col("production_year").cast("long").alias("year_produced"),
        )
        .orderBy("id")
    )


def build_weather_dim(weather: DataFrame) -> DataFrame:
    """Pass-through projection — cleansing happened in plans.inputs
    (reference: src/queries.py:105-117)."""
    return weather.select(
        "id",
        "temperature",
        "fall_mm",
        "fall_type",
        "wind_speed_mps",
        "wind_direction_deg",
        "humidity_percent",
        "pressure_hpa",
        "general_circumstances",
    )


def build_time_dim(time_dim: DataFrame) -> DataFrame:
    """Pass-through projection (reference: src/queries.py:119-133)."""
    return time_dim.select(
        "id",
        "full_timestamp",
        "hour_",
        "weekday",
        "weekday_num",
        "month_",
        "month_num",
        "season",
        "year_",
        "time_of_day",
        "is_business_day",
    )


def _trip_stat_mode(trips: DataFrame, stop_times: DataFrame, agg, out: str) -> DataFrame:
    """Shared shape of the two LineDim rollups (reference: src/queries.py:13-58):
    per-trip statistic over a left join, then most-frequent value per route
    with the count-desc/value-desc tie-break (operators.mode)."""
    per_trip = (
        trips.join(stop_times, on="trip_id", how="left")
        .groupBy("route_id", "trip_id")
        .agg(agg.alias("stat"))
    )
    return mode_per_group(per_trip, ["route_id"], "stat", out)


def build_line_dim(
    routes: DataFrame,
    trips: DataFrame,
    stop_times: DataFrame,
    delays: DataFrame,
    vehicles: DataFrame,
) -> DataFrame:
    """The richest dimension (reference: src/queries.py:12-75).

    route_length_km = mode over trips of max(shape_dist_traveled);
    stops_amount   = mode over trips of count(distinct stop_id);
    operator surfaces through the delays→vehicles fan-out join chain
    (kept as-is for parity: one route may emit several operator rows; the
    merge sink's keyed dedup collapses them deterministically).
    """
    route_length = _trip_stat_mode(
        trips, stop_times, F.max("shape_dist_traveled"), "route_length_km"
    )
    route_stops = _trip_stat_mode(
        trips, stop_times, F.count_distinct(F.col("stop_id")), "stops_amount"
    )

    line_type = (
        F.when(F.col("route_type") == 0, "tram")
        .when(F.col("route_type") == 2, "rail")
        .when(F.col("route_type") == 3, "bus")
        .otherwise("unknown")
    )

    return (
        routes.join(
            F.broadcast(delays.select("Route", "Vehicle No")),
            routes["route_id"] == F.col("Route"),
            "left",
        )
        .join(
            F.broadcast(vehicles.select("vehicle_number", "carrier")),
            F.col("Vehicle No") == F.col("vehicle_number"),
            "left",
        )
        .join(F.broadcast(route_length), on="route_id", how="left")
        .join(F.broadcast(route_stops), on="route_id", how="left")
        .select(
            F.col("route_id").alias("id"),
            F.col("carrier").alias("operator"),
            line_type.alias("line_type"),
            F.coalesce(F.col("route_length_km"), F.lit(0.0)).cast("double").alias("route_length_km"),
            F.coalesce(F.col("stops_amount"), F.lit(0)).cast("long").alias("stops_amount"),
        )
    )


def build_delay_fact(
    delays: DataFrame,
    time_dim: DataFrame,
    weather: DataFrame,
    vehicles: DataFrame,
    routes: DataFrame,
    stops: DataFrame,
) -> DataFrame:
    """Five inner joins onto the cleansed delay feed
    (reference: src/queries.py:135-149).

    The weather join key is computed — station 12375 + the delay's hour
    (J6). All five right sides are dimensions → broadcast; the fact table
    never shuffles. Note the stop join is on the display NAME (fan-out when
    names repeat) — reference parity, flagged in SURVEY §2.3 J9.
    """
    weather_key = F.concat(
        F.lit("12375-"),
        F.date_format(F.col("Timestamp").cast("timestamp"), "yyyy-MM-dd-HH"),
    )
    return (
        delays.alias("d")
        .join(
            F.broadcast(time_dim.alias("t")),
            F.col("t.full_timestamp") == F.col("d.Timestamp"),
        )
        .join(F.broadcast(weather.alias("w")), F.col("w.id") == weather_key)
        .join(
            F.broadcast(vehicles.alias("v")),
            F.col("v.vehicle_number") == F.col("d.Vehicle No"),
        )
        .join(
            F.broadcast(routes.alias("r")),
            F.col("r.route_id") == F.col("d.Route"),
        )
        .join(
            F.broadcast(stops.alias("s")),
            F.col("s.stop_name") == F.col("d.Stop Name"),
        )
        .select(
            F.col("d.Delay").cast("long").alias("delay_mins"),
            F.col("t.id").alias("time_id"),
            F.col("w.id").alias("weather_id"),
            F.col("v.vehicle_number").alias("vehicle_id"),
            F.col("r.route_id").alias("line_id"),
            F.col("s.stop_id").alias("stop_id"),
        )
    )


@dataclass(frozen=True)
class TableSpec:
    """Mirror of the reference's Table enum (reference: src/enums.py:24-35):
    output name, merge keys, and the builder over the cleansed views."""

    name: str
    keys: tuple[str, ...]
    build: Callable[[dict[str, DataFrame]], DataFrame]


TABLES: tuple[TableSpec, ...] = (
    TableSpec("LineDim", ("id",), lambda v: build_line_dim(v["routes"], v["trips"], v["stop_times"], v["delays"], v["vehicles"])),
    TableSpec("StopDim", ("id",), lambda v: build_stop_dim(v["stops"])),
    TableSpec("VehicleDim", ("id",), lambda v: build_vehicle_dim(v["vehicles"])),
    TableSpec("WeatherDim", ("id",), lambda v: build_weather_dim(v["weather"])),
    TableSpec("TimeDim", ("id",), lambda v: build_time_dim(v["time_dim"])),
    TableSpec(
        "DelayFact",
        ("time_id", "weather_id", "vehicle_id", "line_id", "stop_id"),
        lambda v: build_delay_fact(v["delays"], v["time_dim"], v["weather"], v["vehicles"], v["routes"], v["stops"]),
    ),
)
