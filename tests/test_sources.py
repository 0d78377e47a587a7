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


def test_date_partition_pruning(spark, tmp_path):
    """A date filter on a day-partitioned table must prune at PLANNING
    time: the scan's PartitionFilters carries the predicate and only the
    matching day's files are opened — the mechanism that makes a one-day
    query on a 3-year 100 TB fact table read ~1/1000 of it."""
    import pyspark.sql.functions as F

    from idh_etl_demo_spark.sources.partitioned import (
        read_date_partitioned,
        write_date_partitioned,
    )

    from idh_etl_demo_spark.catalog import _t

    # events.parquet is TIMESTAMP(NANOS) — the catalog reader's ns→µs
    # shim is required before Spark will touch the ts column
    ev = _t(spark, "/root/testdata/sf0.001", "events")
    path = str(tmp_path / "events_by_day")
    write_date_partitioned(ev, path, ts_col="ts")

    table = read_date_partitioned(spark, path)
    n_days = table.select("event_date").distinct().count()
    assert n_days > 1, "testdata spans one day; pruning test needs several"

    one_day = table.select(F.min("event_date")).first()[0]
    q = table.filter(F.col("event_date") == F.lit(one_day))

    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and str(one_day) in plan, plan[:2000]
    # the predicate is satisfied ENTIRELY by pruning — no row-level
    # residual filter reaches the scan
    assert "DataFilters: []" in plan, plan[:2000]

    # physical proof: execution touches only the matching day's files
    # (DataFrame.inputFiles() reflects the unpruned FileIndex, so ask
    # the executed rows which files they came from instead)
    read_files = {
        r[0] for r in q.select(F.input_file_name()).distinct().collect()
    }
    all_files = {
        r[0] for r in table.select(F.input_file_name()).distinct().collect()
    }
    assert read_files and read_files < all_files
    assert all(f"event_date={one_day}" in f for f in read_files)

    # and the data itself round-trips: partition column == to_date(ts)
    got = q.count()
    want = ev.filter(F.to_date("ts") == F.lit(one_day)).count()
    assert got == want > 0


def test_schema_evolution_merge(spark, tmp_path):
    """Batches written months apart gain columns; mergeSchema reconciles
    them into one typed view with nulls for the missing fields — the
    ingestion reality of any long-lived 100 TB table. (Schema merging is
    a read option, not a default, because reconciling footers across
    every file costs planning time at scale — enable it per-read or
    declare the superset schema explicitly.)"""
    import pyspark.sql.functions as F

    path = str(tmp_path / "evolving")
    spark.createDataFrame(
        [(1, "a"), (2, "b")], "id long, payload string"
    ).write.parquet(path + "/batch=1")
    spark.createDataFrame(
        [(3, "c", 0.5)], "id long, payload string, score double"
    ).write.parquet(path + "/batch=2")

    merged = spark.read.option("mergeSchema", "true").parquet(path)
    assert set(merged.columns) == {"id", "payload", "score", "batch"}
    assert dict(merged.dtypes)["score"] == "double"
    rows = {r.id: r.score for r in merged.collect()}
    assert rows == {1: None, 2: None, 3: 0.5}

    # the declared-superset alternative: no footer reconciliation pass
    declared = spark.read.schema(
        "id long, payload string, score double, batch int"
    ).parquet(path)
    assert declared.filter(F.col("score").isNotNull()).count() == 1
