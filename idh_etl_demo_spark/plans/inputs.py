"""Cleansed input builders — the reference's loader-side pandas transforms
re-expressed as single lazy DataFrame chains (SURVEY §3.3).

Each builder is a pure function DataFrame → DataFrame; evaluation happens
once, at the sink, with all projections/filters pushed into the scan.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame, SparkSession
import pyspark.sql.functions as F

from idh_etl_demo_spark.functions.delays import hour_floor, normalized_delay_minutes
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
    weather_id,
)
from idh_etl_demo_spark.operators.dedup import dedup_keep_first

# Polish IMGW feed column names → engine names (reference: src/weather.py:53-65)
WEATHER_RENAMES = {
    "id_stacji": "station_id",
    "data_pomiaru": "measurement_date",
    "godzina_pomiaru": "hour",
    "temperatura": "temperature",
    "suma_opadu": "precipitation_mm",
    "predkosc_wiatru": "wind_speed_mps",
    "kierunek_wiatru": "wind_direction_deg",
    "wilgotnosc_wzgledna": "humidity_percent",
    "cisnienie": "pressure_hpa",
}


def clean_delays(raw: DataFrame) -> DataFrame:
    """Normalize the delay feed (reference: src/delays.py:40-54):
    null-safe string vehicle number, signed integer minutes, hour-floored
    timestamp. Nulls stay nulls — never the string "nan" (SURVEY §7.4)."""
    return raw.select(
        hour_floor(F.col("Timestamp")).alias("Timestamp"),
        normalized_delay_minutes(F.col("Delay")).alias("Delay"),
        F.col("Route"),
        F.col("Stop Name"),
        F.col("Vehicle No").cast("string").alias("Vehicle No"),
    )


def clean_weather(raw: DataFrame, streaming: bool = False) -> DataFrame:
    """The weather cleansing chain (reference: src/weather.py:51-121):
    rename → id → casts → null-filter → dedup → fills/rounds → classifiers
    → final projection.

    Dedup parity notes:
    - the reference first drops duplicate ``hour`` values across files
      (src/weather.py:141) and then duplicate (station_id, hour) pairs
      (src/weather.py:88); both keep pandas' nondeterministic "first in
      file order" — we keep the same two-stage semantics but with a
      deterministic lowest-row-wins rule (SURVEY §7 hard part 1).
    - rounding: pandas ``Series.round`` is half-to-even, so we use
      ``F.bround`` (HALF_EVEN), not ``F.round`` (HALF_UP).
    """
    df = raw.select(
        F.col("id_stacji").cast("string").alias("station_id"),
        F.col("data_pomiaru").cast("string").alias("measurement_date"),
        F.col("godzina_pomiaru").cast("long").alias("hour"),
        F.col("temperatura").cast("double").alias("temperature"),
        F.col("suma_opadu").cast("double").alias("precipitation_mm"),
        F.col("predkosc_wiatru").cast("double").alias("wind_speed_raw"),
        F.col("kierunek_wiatru").cast("long").alias("wind_direction_deg"),
        F.col("wilgotnosc_wzgledna").cast("double").alias("humidity_percent"),
        F.col("cisnienie").cast("double").alias("pressure_raw"),
    )
    # deterministic keep-rule: lowest row under this fixed column order wins
    order_cols = [
        "station_id",
        "measurement_date",
        "temperature",
        "precipitation_mm",
        "wind_speed_raw",
        "wind_direction_deg",
        "humidity_percent",
        "pressure_raw",
    ]
    if streaming:
        # ranking windows are illegal on unbounded streams; stateful
        # dropDuplicates keeps the FIRST ARRIVAL per key instead of the
        # batch path's order-based rule (document: survivor differs only
        # when duplicate keys carry different payloads)
        df = df.dropDuplicates(["hour"])
    else:
        df = dedup_keep_first(
            df, ["hour"], order_by=[F.asc_nulls_last(c) for c in order_cols]
        )
    df = df.filter(
        F.col("temperature").isNotNull() & F.col("wind_speed_raw").isNotNull()
    )
    if streaming:
        df = df.dropDuplicates(["station_id", "hour"])
    else:
        df = dedup_keep_first(
            df,
            ["station_id", "hour"],
            order_by=[F.asc_nulls_last(c) for c in order_cols[1:]],
        )
    df = df.withColumn(
        "id",
        weather_id(F.col("station_id"), F.col("measurement_date"), F.col("hour")),
    )
    df = df.withColumns(
        {
            "fall_mm": F.bround(F.coalesce(F.col("precipitation_mm"), F.lit(0.0))).cast("long"),
            "fall_type": fall_type(F.col("temperature")),
            "wind_speed_mps": F.bround(F.coalesce(F.col("wind_speed_raw"), F.lit(0.0))).cast("long"),
            "pressure_hpa": F.bround(F.coalesce(F.col("pressure_raw"), F.lit(1013.0))).cast("long"),
        }
    )
    # the classifier sees post-round wind and fall_mm (reference: src/weather.py:98-106)
    df = df.withColumn(
        "general_circumstances",
        general_circumstances(
            comfort_score(
                F.col("temperature"),
                F.col("wind_speed_mps"),
                F.col("humidity_percent"),
                F.col("fall_mm"),
            )
        ),
    )
    return df.select(
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


def build_time_dim_rows(spark: SparkSession, hours: list[dt.datetime]) -> DataFrame:
    """Synthesize TimeDim rows from logical clock hours — the reference
    emits one row per hourly DAG run (reference: dags/idh_etl.py:74-89).

    Column derivations are pure expressions over the timestamp so the same
    code serves generated batches and data-driven timestamps.
    """
    base = spark.createDataFrame(
        [(h,) for h in hours], "full_timestamp timestamp"
    )
    return build_time_dim(base)


def build_time_dim(base: DataFrame) -> DataFrame:
    """TimeDim column derivations over any frame with a
    ``full_timestamp`` timestamp column (reference: src/schemas.py:37-49,
    src/queries.py:119-133) — the frame-level form of
    ``build_time_dim_rows`` so a data-driven hour clock (catalog_r13's
    ``ztm_time_dim``) exercises the same production builder."""
    ts = F.col("full_timestamp")
    return base.select(
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
    )
