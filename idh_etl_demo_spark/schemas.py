"""Explicit StructTypes for every input feed and output table.

The reference declares output schemas as BigQuery ``SchemaField`` lists
(reference: src/schemas.py:3-58) and lets pandas infer input dtypes
(src/gtfs.py:22, src/delays.py:23, src/vehicles.py:10, src/weather.py:136).
We declare BOTH explicitly — inferred CSV schemas are a portability hazard
and force a full extra pass over the data at 100 TB.

Type mapping (SURVEY §1.2): STRING→StringType, INT64→LongType,
FLOAT→DoubleType, BOOL→BooleanType, TIMESTAMP→TimestampType.
"""

from __future__ import annotations

from pyspark.sql.types import (
    BooleanType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)


def _s(name: str, nullable: bool = True) -> StructField:
    return StructField(name, StringType(), nullable)


# ---------------------------------------------------------------------------
# Input feeds (CSV). Raw columns arrive as strings where the source is dirty
# (production_year contains "n/a"; delay strings are Polish text) and as
# proper types where the feed is clean.
# ---------------------------------------------------------------------------

ROUTES_SCHEMA = StructType(
    [
        _s("route_id", nullable=False),
        StructField("route_type", LongType()),  # 0=tram 2=rail 3=bus (reference: src/queries.py:62-67)
    ]
)

TRIPS_SCHEMA = StructType(
    [
        _s("route_id", nullable=False),
        _s("trip_id", nullable=False),
    ]
)

STOPS_SCHEMA = StructType(
    [
        _s("stop_id", nullable=False),
        _s("stop_name"),
        _s("stop_lat"),  # cast to double in StopDim (reference: src/queries.py:81)
        _s("stop_lon"),
    ]
)

STOP_TIMES_SCHEMA = StructType(
    [
        _s("trip_id", nullable=False),
        _s("stop_id"),
        StructField("shape_dist_traveled", DoubleType()),
    ]
)

# Column names with spaces, exactly as the upstream feed ships them
# (reference: src/delays.py:45-47, src/queries.py:136-148).
DELAYS_RAW_SCHEMA = StructType(
    [
        _s("Timestamp"),     # ISO datetime string, sub-hour precision
        _s("Delay"),         # "7 min" | "3 min przed czasem" (early)
        _s("Route"),
        _s("Stop Name"),
        _s("Vehicle No"),    # nullable / blank
    ]
)

VEHICLES_SCHEMA = StructType(
    [
        _s("vehicle_number"),
        _s("manufacturer"),
        _s("type"),
        _s("production_year"),  # dirty: "2015", "2015a", "n/a", NULL
        _s("carrier"),
    ]
)

# IMGW feed, Polish column names (reference: src/weather.py:54-64).
WEATHER_RAW_SCHEMA = StructType(
    [
        _s("id_stacji"),
        _s("data_pomiaru"),
        StructField("godzina_pomiaru", LongType()),
        StructField("temperatura", DoubleType()),
        StructField("suma_opadu", DoubleType()),
        StructField("predkosc_wiatru", DoubleType()),
        StructField("kierunek_wiatru", LongType()),
        StructField("wilgotnosc_wzgledna", DoubleType()),
        StructField("cisnienie", DoubleType()),
    ]
)

# ---------------------------------------------------------------------------
# Star-schema outputs (reference: src/schemas.py:3-58, keys src/enums.py:24-35)
# ---------------------------------------------------------------------------

LINE_DIM_SCHEMA = StructType(
    [
        _s("id", nullable=False),
        _s("operator"),
        _s("line_type", nullable=False),
        StructField("route_length_km", DoubleType(), False),
        StructField("stops_amount", LongType(), False),
    ]
)

STOP_DIM_SCHEMA = StructType(
    [
        _s("id", nullable=False),
        _s("name", nullable=False),
        StructField("lat", DoubleType(), False),
        StructField("lon", DoubleType(), False),
    ]
)

VEHICLE_DIM_SCHEMA = StructType(
    [
        _s("id", nullable=False),
        _s("brand", nullable=False),
        _s("v_model", nullable=False),
        StructField("year_produced", LongType(), False),
    ]
)

WEATHER_DIM_SCHEMA = StructType(
    [
        _s("id", nullable=False),
        StructField("temperature", DoubleType(), False),
        StructField("fall_mm", LongType(), False),
        _s("fall_type", nullable=False),
        StructField("wind_speed_mps", LongType(), False),
        StructField("wind_direction_deg", LongType(), False),
        StructField("humidity_percent", DoubleType(), False),
        StructField("pressure_hpa", LongType(), False),
        _s("general_circumstances", nullable=False),
    ]
)

TIME_DIM_SCHEMA = StructType(
    [
        StructField("id", LongType(), False),
        StructField("full_timestamp", TimestampType(), False),
        StructField("hour_", LongType(), False),
        _s("weekday", nullable=False),
        StructField("weekday_num", LongType(), False),
        _s("month_", nullable=False),
        StructField("month_num", LongType(), False),
        _s("season", nullable=False),
        StructField("year_", LongType(), False),
        _s("time_of_day", nullable=False),
        StructField("is_business_day", BooleanType(), False),
    ]
)

DELAY_FACT_SCHEMA = StructType(
    [
        StructField("delay_mins", LongType(), False),
        StructField("time_id", LongType(), False),
        _s("weather_id", nullable=False),
        _s("vehicle_id", nullable=False),
        _s("line_id", nullable=False),
        _s("stop_id", nullable=False),
    ]
)

INPUT_SCHEMAS: dict[str, StructType] = {
    "routes": ROUTES_SCHEMA,
    "trips": TRIPS_SCHEMA,
    "stops": STOPS_SCHEMA,
    "stop_times": STOP_TIMES_SCHEMA,
    "delays": DELAYS_RAW_SCHEMA,
    "vehicles": VEHICLES_SCHEMA,
    "weather": WEATHER_RAW_SCHEMA,
}

OUTPUT_SCHEMAS: dict[str, StructType] = {
    "LineDim": LINE_DIM_SCHEMA,
    "StopDim": STOP_DIM_SCHEMA,
    "VehicleDim": VEHICLE_DIM_SCHEMA,
    "WeatherDim": WEATHER_DIM_SCHEMA,
    "TimeDim": TIME_DIM_SCHEMA,
    "DelayFact": DELAY_FACT_SCHEMA,
}
