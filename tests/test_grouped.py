"""applyInPandas grouped-map: z-score per group matches the expression-
based computation to float tolerance."""

from __future__ import annotations

import math

import pyspark.sql.functions as F
from pyspark.sql import Window

from idh_etl_demo_spark.operators.grouped import zscore_per_group


def test_zscore_matches_window_expressions(spark):
    from idh_etl_demo_spark.catalog import _t

    events = _t(spark, "/root/testdata/sf0.001", "events")
    got = {r.event_id: r.zscore for r in zscore_per_group(events).collect()}

    w = Window.partitionBy("event_type")
    want_df = events.select(
        "event_id",
        (
            (F.col("value") - F.avg("value").over(w))
            / F.stddev_samp("value").over(w)
        ).alias("z"),
    )
    want = {r.event_id: r.z for r in want_df.collect()}
    assert set(got) == set(want)
    for k in got:
        assert math.isclose(got[k], want[k], rel_tol=1e-9, abs_tol=1e-12), k
