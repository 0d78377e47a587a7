"""Hourly micro-batch driver — the reference's Airflow DAG re-expressed as
a plain run loop (reference: dags/idh_etl.py:47-272; SURVEY §3.1).

Per logical hour: build the five cleansed input views for that hour's
partition, build all six star tables, dedup on keys, left-anti-merge into
the parquet targets. There are no shard files and no merge_shards step —
Spark's catalog is the unification (SURVEY §2.1 S9).

Fault tolerance mirrors the reference's operator defaults
(reference: dags/idh_etl.py:41-44 — retries=3, retry_delay=30 s):
- every per-table unit (build + merge) retries RETRY_ATTEMPTS times with
  RETRY_DELAY_SEC backoff before giving up;
- ``run_day(..., on_error="continue")`` isolates failures per hour the way
  Airflow isolates failed DAG runs — one poisoned hour doesn't abort the
  day's catchup, and because every insert is keyed (operators.merge), the
  failed hour can simply be re-run later.

Idempotency: re-running any hour (Airflow catchup semantics) appends
nothing, because every target insert is keyed (operators.merge).
"""

from __future__ import annotations

import datetime as dt
import os
import time

from pyspark.sql import DataFrame, SparkSession

from idh_etl_demo_spark.operators.merge import (
    merge_insert_if_absent,
    merge_insert_if_absent_bucketed,
)
from idh_etl_demo_spark.plans.inputs import build_time_dim_rows, clean_delays, clean_weather
from idh_etl_demo_spark.plans.star import TABLES
from idh_etl_demo_spark.sources.csv_feeds import (
    read_delays,
    read_gtfs,
    read_vehicles,
    read_weather_raw,
)

RETRY_ATTEMPTS = 3
RETRY_DELAY_SEC = 30.0
_sleep = time.sleep  # injectable for tests


class ViewVerificationError(RuntimeError):
    """A cleansed input view failed its smoke read."""


def bucketed_table_name(warehouse_root: str, table: str) -> str:
    """Catalog-table name for a bucketed star table, scoped to the
    warehouse root: ``wh_<md5(abspath(root))[:8]>_<table>``. Catalog
    names are session-global, so the root hash is what keeps two
    pipelines with different warehouse roots from sharing state."""
    import hashlib

    digest = hashlib.md5(os.path.abspath(warehouse_root).encode()).hexdigest()[:8]
    return f"wh_{digest}_{table}"


def _with_retries(fn, what: str):
    """Reference parity: 3 attempts, fixed 30 s delay
    (dags/idh_etl.py:41-44). Transient executor/IO failures recover;
    deterministic failures surface with the unit name attached."""
    last: Exception | None = None
    for attempt in range(1, RETRY_ATTEMPTS + 1):
        try:
            return fn()
        except Exception as e:  # noqa: BLE001 — retry any task failure, like Airflow
            last = e
            if attempt < RETRY_ATTEMPTS:
                _sleep(RETRY_DELAY_SEC)
    raise RuntimeError(f"{what} failed after {RETRY_ATTEMPTS} attempts") from last


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
    """The reference's `verify` task does a ``select * from t limit 1``
    smoke READ per table (reference: dags/idh_etl.py:166-178). A schema
    check alone would pass on a view that errors at execution, so each
    view is materialized to one row — a per-view job that scans a single
    file split, negligible against the hour's real work."""
    expected = {"routes", "trips", "stops", "stop_times", "delays", "vehicles", "weather", "time_dim"}
    missing = expected - set(views)
    if missing:
        raise ViewVerificationError(f"missing input views: {missing}")
    for name, df in views.items():
        if not df.schema.fieldNames():
            raise ViewVerificationError(f"view {name} has no schema")
        try:
            df.limit(1).collect()
        except Exception as e:  # noqa: BLE001 — surface as verification failure
            raise ViewVerificationError(f"view {name} failed its smoke read: {e}") from e


def run_hour(
    spark: SparkSession,
    data_root: str,
    warehouse_root: str,
    logical_hour: dt.datetime,
    bucketed_tables: dict[str, int] | None = None,
) -> dict[str, int]:
    """One logical run: returns rows appended per table. Each per-table
    unit (build + merge) retries like a reference task instance.

    ``bucketed_tables`` maps a star-table name to a bucket count: those
    tables are loaded through the bucketed catalog merge (table
    ``wh_<root-hash>_<name>``, clustered on the merge keys) instead of the
    path sink, so the hourly anti-join probe never re-shuffles the growing
    target — the load shape that holds at 100 TB (see operators/merge.py).
    The table name embeds a hash of ``warehouse_root`` so two pipelines
    running against different roots in one Spark session get DISTINCT
    catalog tables — without it they would silently share one global
    table and leak appends/idempotency state across environments
    (path-sink tables were always isolated per root; this makes the
    bucketed ones match). ``bucketed_table_name`` computes the mapping."""
    views = build_views(spark, data_root, logical_hour)
    verify_views(views)
    bucketed_tables = bucketed_tables or {}
    appended = {}
    for spec in TABLES:

        def unit(spec=spec):
            df = spec.build(views)
            if df.isEmpty():
                return 0
            if spec.name in bucketed_tables:
                return merge_insert_if_absent_bucketed(
                    spark,
                    df,
                    bucketed_table_name(warehouse_root, spec.name),
                    list(spec.keys),
                    n_buckets=bucketed_tables[spec.name],
                )
            return merge_insert_if_absent(
                spark, df, os.path.join(warehouse_root, spec.name), list(spec.keys)
            )

        appended[spec.name] = _with_retries(unit, f"{spec.name}@{logical_hour:%Y-%m-%dT%H}")
    return appended


def run_day(
    spark: SparkSession,
    data_root: str,
    warehouse_root: str,
    day: dt.date,
    hours: range = range(24),
    on_error: str = "raise",
    failures: list | None = None,
    bucketed_tables: dict[str, int] | None = None,
) -> dict[str, int]:
    """The reference's catchup=True replay of 24 hourly runs
    (reference: dags/idh_etl.py:48-51).

    ``on_error="continue"`` gives per-hour isolation: a failed hour is
    recorded in ``failures`` (list of (datetime, exception)) and the
    replay moves on — merges are keyed, so re-running just the failed
    hours later converges to the same warehouse state."""
    if on_error not in ("raise", "continue"):
        raise ValueError(f"on_error must be 'raise' or 'continue', got {on_error!r}")
    totals: dict[str, int] = {}
    for h in hours:
        logical = dt.datetime(day.year, day.month, day.day, h)
        try:
            res = run_hour(
                spark, data_root, warehouse_root, logical, bucketed_tables=bucketed_tables
            )
        except Exception as e:  # noqa: BLE001 — per-hour isolation
            if on_error == "raise":
                raise
            if failures is not None:
                failures.append((logical, e))
            continue
        for k, v in res.items():
            totals[k] = totals.get(k, 0) + v
    return totals
