"""CSV feed readers.

The reference reads per-day directory trees with pandas, one file at a time,
then concatenates (reference: src/gtfs.py:16-28, src/delays.py:11-24,
src/weather.py:124-142, src/vehicles.py:7-16). Spark reads a whole glob as
one distributed scan — multi-file union is native, and with a
``dt=YYYY-MM-DD/`` Hive layout the per-day selection becomes partition
pruning instead of driver-side path math.

All readers take explicit schemas (schemas.py): at 100 TB, schema inference
is an extra full pass over the data and a correctness hazard.
"""

from __future__ import annotations

import datetime as dt
import os

from pyspark.sql import DataFrame, SparkSession

from idh_etl_demo_spark.schemas import (
    DELAYS_RAW_SCHEMA,
    INPUT_SCHEMAS,
    VEHICLES_SCHEMA,
    WEATHER_RAW_SCHEMA,
)

GTFS_TABLES = ("routes", "trips", "stops", "stop_times")


def _day_glob(root: str, as_of: dt.date) -> str:
    """``<root>/YYYY/MM/DD/*.csv`` — the reference's landing layout
    (reference: src/delays.py:14, src/weather.py:127)."""
    return os.path.join(root, f"{as_of.year}/{as_of.month:02d}/{as_of.day:02d}", "*.csv")


def _read_csv(spark: SparkSession, path: str, schema) -> DataFrame:
    return (
        spark.read.schema(schema)
        .option("header", True)
        .option("mode", "PERMISSIVE")
        .csv(path)
    )


def _empty(spark: SparkSession, schema) -> DataFrame:
    return spark.createDataFrame([], schema)


def read_gtfs(spark: SparkSession, gtfs_root: str, as_of: dt.date) -> dict[str, DataFrame]:
    """The four GTFS static tables for one service day
    (reference: src/gtfs.py:6-11, 16-28)."""
    day_dir = os.path.join(gtfs_root, f"{as_of.year}/{as_of.month:02d}/{as_of.day:02d}")
    out = {}
    for name in GTFS_TABLES:
        path = os.path.join(day_dir, f"{name}.csv")
        schema = INPUT_SCHEMAS[name]
        out[name] = (
            _read_csv(spark, path, schema)
            if os.path.exists(path)
            else _empty(spark, schema)
        )
    return out


def read_delays(spark: SparkSession, delays_root: str, as_of: dt.date) -> DataFrame:
    """All per-hour delay CSVs of one day as a single scan; empty DataFrame
    when the day has no files (reference: src/delays.py:11-24)."""
    glob = _day_glob(delays_root, as_of)
    if not os.path.isdir(os.path.dirname(glob)):
        return _empty(spark, DELAYS_RAW_SCHEMA)
    return _read_csv(spark, glob, DELAYS_RAW_SCHEMA)


def read_vehicles(spark: SparkSession, vehicles_csv: str) -> DataFrame:
    """The static vehicle registry (reference: src/vehicles.py:7-16)."""
    if not os.path.exists(vehicles_csv):
        return _empty(spark, VEHICLES_SCHEMA)
    return _read_csv(spark, vehicles_csv, VEHICLES_SCHEMA)


def read_weather_raw(spark: SparkSession, weather_root: str, as_of: dt.date) -> DataFrame:
    """All per-hour IMGW weather CSVs of one day; cross-file duplicate hours
    are dropped downstream with a deterministic keep-rule
    (reference: src/weather.py:124-142)."""
    glob = _day_glob(weather_root, as_of)
    if not os.path.isdir(os.path.dirname(glob)):
        return _empty(spark, WEATHER_RAW_SCHEMA)
    return _read_csv(spark, glob, WEATHER_RAW_SCHEMA)
