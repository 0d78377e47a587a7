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


def test_transient_failure_retried_and_replay_idempotent(spark, ztm_root, tmp_path, monkeypatch):
    """Reference parity (dags/idh_etl.py:41-44): a unit that fails once
    recovers on retry; the day replay completes and a full re-run is
    still a no-op."""
    from idh_etl_demo_spark.plans.star import TABLES
    from idh_etl_demo_spark.streaming import runner

    from idh_etl_demo_spark.plans.star import TableSpec

    monkeypatch.setattr(runner, "_sleep", lambda s: None)  # no real 30 s waits
    spec = TABLES[0]
    calls = {"n": 0}

    def flaky_build(views):
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError("transient: executor lost")
        return spec.build(views)

    flaky = TableSpec(spec.name, spec.keys, flaky_build)
    monkeypatch.setattr(runner, "TABLES", (flaky,) + tuple(TABLES[1:]))
    wh = str(tmp_path / "warehouse")
    first = run_day(spark, ztm_root, wh, DAY, hours=range(7, 9))
    assert calls["n"] >= 2  # the retry actually happened
    assert first[spec.name] > 0
    monkeypatch.setattr(runner, "TABLES", TABLES)
    second = run_day(spark, ztm_root, wh, DAY, hours=range(7, 9))
    assert all(v == 0 for v in second.values()), second


def test_poisoned_hour_isolated_with_continue(spark, ztm_root, tmp_path, monkeypatch):
    """A deterministically-failing hour must not abort the day when
    on_error='continue'; it lands in `failures` and the other hours
    complete."""
    import datetime as dt

    from idh_etl_demo_spark.plans.star import TABLES, TableSpec
    from idh_etl_demo_spark.streaming import runner

    monkeypatch.setattr(runner, "_sleep", lambda s: None)
    spec = TABLES[0]

    def poisoned_build(views):
        # poison only hour 8 (views carry the hour through time_dim)
        hour = views["time_dim"].select("hour_").first()[0]
        if hour == 8:
            raise RuntimeError("corrupt partition")
        return spec.build(views)

    poisoned = TableSpec(spec.name, spec.keys, poisoned_build)
    monkeypatch.setattr(runner, "TABLES", (poisoned,) + tuple(TABLES[1:]))
    wh = str(tmp_path / "warehouse")
    failures: list = []
    totals = run_day(
        spark, ztm_root, wh, DAY, hours=range(7, 10), on_error="continue", failures=failures
    )
    assert len(failures) == 1
    assert failures[0][0] == dt.datetime(2024, 12, 25, 8)
    assert totals[spec.name] > 0  # hours 7 and 9 landed
    # on_error='raise' (default) propagates instead
    try:
        run_day(spark, ztm_root, str(tmp_path / "wh2"), DAY, hours=range(8, 9))
        assert False, "expected failure to propagate"
    except RuntimeError:
        pass


def test_verify_catches_broken_view_at_verify_time(spark):
    """A view that errors at EXECUTION (schema fine) must be caught by
    verify_views' smoke read, not later at the sink."""
    import pyspark.sql.functions as F

    from idh_etl_demo_spark.streaming.runner import ViewVerificationError, verify_views

    ok = spark.range(1).select(F.col("id"))
    broken = spark.range(1).select(F.raise_error(F.lit("boom")).alias("x"))
    views = {
        n: ok
        for n in ["routes", "trips", "stops", "stop_times", "delays", "vehicles", "weather"]
    }
    views["time_dim"] = broken
    try:
        verify_views(views)
        assert False, "expected ViewVerificationError"
    except ViewVerificationError as e:
        assert "time_dim" in str(e)


def test_run_hour_bucketed_tables(spark, ztm_root, tmp_path):
    """Opting a star table into the bucketed catalog sink keeps run-loop
    semantics (counts, idempotent replay) while the target is stored
    clustered on its merge keys. The catalog table name is scoped to the
    warehouse root, so distinct roots in one session stay isolated."""
    from idh_etl_demo_spark.streaming.runner import bucketed_table_name

    wh = str(tmp_path / "warehouse")
    tbl = bucketed_table_name(wh, "StopDim")
    spark.sql(f"drop table if exists {tbl}")
    hour = dt.datetime(2024, 12, 25, 8)
    first = run_hour(spark, ztm_root, wh, hour, bucketed_tables={"StopDim": 4})
    assert first["StopDim"] == 8
    assert spark.table(tbl).count() == 8
    # the other tables still went through the path sink
    assert spark.read.parquet(f"{wh}/VehicleDim").count() == first["VehicleDim"]
    # replay: no-op everywhere, bucketed included
    second = run_hour(spark, ztm_root, wh, hour, bucketed_tables={"StopDim": 4})
    assert all(v == 0 for v in second.values()), second
    assert spark.table(tbl).count() == 8

    # a pipeline against a DIFFERENT warehouse root gets its own catalog
    # table: its appends must not leak into (or be suppressed by) ours
    wh2 = str(tmp_path / "warehouse2")
    tbl2 = bucketed_table_name(wh2, "StopDim")
    assert tbl2 != tbl
    spark.sql(f"drop table if exists {tbl2}")
    third = run_hour(spark, ztm_root, wh2, hour, bucketed_tables={"StopDim": 4})
    assert third["StopDim"] == 8  # NOT 0 — a shared table would dedup these away
    assert spark.table(tbl).count() == 8
    assert spark.table(tbl2).count() == 8
    spark.sql(f"drop table if exists {tbl}")
    spark.sql(f"drop table if exists {tbl2}")
