"""Golden end-to-end tests: each star-schema table built by the Spark
engine must match the independent DuckDB oracle over the same CSV feeds
(SURVEY §5)."""

from __future__ import annotations

import datetime as dt

import pytest

from idh_etl_demo_spark.plans.star import TABLES
from idh_etl_demo_spark.streaming.runner import build_views

from tests.compare import assert_frames_equal
from tests.ztm_oracle import ORACLES, register_inputs

DAY_HOURS = [dt.datetime(2024, 12, 25, h) for h in range(24)]


@pytest.fixture(scope="module")
def views(spark, ztm_root):
    """All 24 hourly time rows at once so TimeDim/DelayFact cover the day
    (the per-hour loop is exercised in test_runner)."""
    from idh_etl_demo_spark.plans.inputs import build_time_dim_rows

    v = build_views(spark, ztm_root, DAY_HOURS[0])
    v["time_dim"] = build_time_dim_rows(spark, DAY_HOURS)
    return v


@pytest.fixture(scope="module")
def oracle(ducks, ztm_root):
    register_inputs(ducks, ztm_root)
    return ducks


@pytest.mark.parametrize("spec", TABLES, ids=[t.name for t in TABLES])
def test_star_table_matches_oracle(spec, views, oracle):
    got = spec.build(views).toPandas()
    want = oracle.execute(ORACLES[spec.name]).df()
    assert len(want) > 0, f"oracle produced no rows for {spec.name} — broken fixture"
    assert_frames_equal(got, want)
