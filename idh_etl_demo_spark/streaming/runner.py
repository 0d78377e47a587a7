"""Hourly micro-batch driver — the reference's Airflow DAG re-expressed as
a plain run loop (reference: dags/idh_etl.py:47-272; SURVEY §3.1).

Per logical hour: build the five cleansed input views for that hour's
partition, build all six star tables, dedup on keys, left-anti-merge into
the parquet targets. There are no shard files and no merge_shards step —
Spark's catalog is the unification (SURVEY §2.1 S9) — and `verify` becomes
real assertions instead of logged failures.

Idempotency: re-running any hour (Airflow catchup semantics) appends
nothing, because every target insert is keyed (operators.merge).
"""

from __future__ import annotations

import datetime as dt
import os

from pyspark.sql import DataFrame, SparkSession

from idh_etl_demo_spark.operators.merge import merge_insert_if_absent
from idh_etl_demo_spark.plans.inputs import build_time_dim_rows, clean_delays, clean_weather
from idh_etl_demo_spark.plans.star import TABLES
from idh_etl_demo_spark.sources.csv_feeds import (
    read_delays,
    read_gtfs,
    read_vehicles,
    read_weather_raw,
)


def build_views(
    spark: SparkSession, data_root: str, logical_hour: dt.datetime
) -> dict[str, DataFrame]:
    """The five loader tasks of the reference's task group
    (reference: dags/idh_etl.py:71-137) as lazy view builders."""
    day = logical_hour.date()
    views = dict(read_gtfs(spark, os.path.join(data_root, "gtfs"), day))
    views["delays"] = clean_delays(read_delays(spark, os.path.join(data_root, "delays"), day))
    views["vehicles"] = read_vehicles(spark, os.path.join(data_root, "ztm_vehicles_detailed.csv"))
    views["weather"] = clean_weather(read_weather_raw(spark, os.path.join(data_root, "weather"), day))
    views["time_dim"] = build_time_dim_rows(spark, [logical_hour])
    return views


def verify_views(views: dict[str, DataFrame]) -> None:
    """The reference's `verify` task logs failures and continues
    (reference: dags/idh_etl.py:166-178); we assert."""
    expected = {"routes", "trips", "stops", "stop_times", "delays", "vehicles", "weather", "time_dim"}
    missing = expected - set(views)
    assert not missing, f"missing input views: {missing}"
    for name, df in views.items():
        assert df.schema.fieldNames(), f"view {name} has no schema"


def run_hour(
    spark: SparkSession,
    data_root: str,
    warehouse_root: str,
    logical_hour: dt.datetime,
) -> dict[str, int]:
    """One logical run: returns rows appended per table."""
    views = build_views(spark, data_root, logical_hour)
    verify_views(views)
    appended = {}
    for spec in TABLES:
        df = spec.build(views)
        if df.isEmpty():
            appended[spec.name] = 0
            continue
        appended[spec.name] = merge_insert_if_absent(
            spark, df, os.path.join(warehouse_root, spec.name), list(spec.keys)
        )
    return appended


def run_day(
    spark: SparkSession,
    data_root: str,
    warehouse_root: str,
    day: dt.date,
    hours: range = range(24),
) -> dict[str, int]:
    """The reference's catchup=True replay of 24 hourly runs
    (reference: dags/idh_etl.py:48-51)."""
    totals: dict[str, int] = {}
    for h in hours:
        res = run_hour(
            spark, data_root, warehouse_root, dt.datetime(day.year, day.month, day.day, h)
        )
        for k, v in res.items():
            totals[k] = totals.get(k, 0) + v
    return totals
