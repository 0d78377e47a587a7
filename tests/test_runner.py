"""Run-loop + merge-sink semantics: idempotent catchup replay
(reference: dags/idh_etl.py:48-51, 242-253; SURVEY §5 idempotency test)."""

from __future__ import annotations

import datetime as dt

import pyspark.sql.functions as F

from idh_etl_demo_spark.operators.merge import merge_insert_if_absent
from idh_etl_demo_spark.streaming.runner import run_day, run_hour

DAY = dt.date(2024, 12, 25)


def test_merge_insert_if_absent(spark, tmp_path):
    target = str(tmp_path / "t")
    batch1 = spark.createDataFrame([(1, "a"), (2, "b"), (2, "b2")], "id int, v string")
    n1 = merge_insert_if_absent(spark, batch1, target, ["id"])
    assert n1 == 2  # keyed dedup inside the batch
    # deterministic keep-first: lowest non-key value survives
    rows = {r.id: r.v for r in spark.read.parquet(target).collect()}
    assert rows == {1: "a", 2: "b"}
    # overlapping re-delivery inserts only the new key
    batch2 = spark.createDataFrame([(2, "zzz"), (3, "c")], "id int, v string")
    n2 = merge_insert_if_absent(spark, batch2, target, ["id"])
    assert n2 == 1
    assert spark.read.parquet(target).count() == 3


def test_day_replay_is_idempotent(spark, ztm_root, tmp_path):
    # a 4-hour slice keeps the test fast; catchup semantics are identical
    hours = range(7, 11)
    wh = str(tmp_path / "warehouse")
    first = run_day(spark, ztm_root, wh, DAY, hours=hours)
    assert first["StopDim"] == 8
    assert first["TimeDim"] == 1  # day-grain id quirk: only first hour survives
    assert first["VehicleDim"] == 5
    assert first["WeatherDim"] > 0
    assert first["LineDim"] == 5
    assert first["DelayFact"] > 0
    # full catchup replay: nothing new anywhere
    second = run_day(spark, ztm_root, wh, DAY, hours=hours)
    assert all(v == 0 for v in second.values()), second
    # replaying a single hour mid-slice is also a no-op
    third = run_hour(spark, ztm_root, wh, dt.datetime(2024, 12, 25, 8))
    assert all(v == 0 for v in third.values()), third
