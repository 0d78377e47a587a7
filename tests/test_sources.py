"""Source readers: empty-day behavior, multi-file union, date discovery."""

from __future__ import annotations

import datetime as dt

from idh_etl_demo_spark.sources.csv_feeds import (
    read_delays,
    read_gtfs,
    read_weather_raw,
)
from idh_etl_demo_spark.sources.remote import list_date_prefixes

DAY = dt.date(2024, 12, 25)
EMPTY_DAY = dt.date(2024, 12, 26)


def test_multi_file_union(spark, ztm_root):
    delays = read_delays(spark, f"{ztm_root}/delays", DAY)
    assert delays.count() == 11  # 6 + 5 rows across two files
    weather = read_weather_raw(spark, f"{ztm_root}/weather", DAY)
    assert weather.count() == 27  # 13 + 14 rows (incl. cross-file dup)


def test_empty_day_yields_empty_frame_with_schema(spark, ztm_root):
    delays = read_delays(spark, f"{ztm_root}/delays", EMPTY_DAY)
    assert delays.isEmpty()
    assert delays.columns == ["Timestamp", "Delay", "Route", "Stop Name", "Vehicle No"]
    gtfs = read_gtfs(spark, f"{ztm_root}/gtfs", EMPTY_DAY)
    assert set(gtfs) == {"routes", "trips", "stops", "stop_times"}
    assert all(df.isEmpty() for df in gtfs.values())


def test_date_prefix_discovery(spark, ztm_root):
    dates = list_date_prefixes(spark, f"file://{ztm_root}/delays")
    assert dates == [DAY]
