from idh_etl_demo_spark.sources.csv_feeds import (
    read_gtfs,
    read_delays,
    read_vehicles,
    read_weather_raw,
    GTFS_TABLES,
)
from idh_etl_demo_spark.sources.parquet_tables import load_tables, TESTDATA_TABLES

__all__ = [
    "read_gtfs",
    "read_delays",
    "read_vehicles",
    "read_weather_raw",
    "GTFS_TABLES",
    "load_tables",
    "TESTDATA_TABLES",
]
