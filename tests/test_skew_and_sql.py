"""Salted-join / two-stage-agg correctness (vs unsalted plans) and the
spark.sql surface over the registered star schema."""

from __future__ import annotations

import datetime as dt

import pyspark.sql.functions as F

from idh_etl_demo_spark.operators.skew import salted_join, two_stage_agg
from idh_etl_demo_spark.sql import register_star_schema
from idh_etl_demo_spark.streaming.runner import build_views


def test_salted_join_matches_plain_join(spark):
    # hot key: 90% of rows share key 1
    large = spark.range(0, 2000).select(
        F.when(F.col("id") % 10 < 9, 1).otherwise(F.col("id") % 7).alias("k"),
        F.col("id").alias("payload"),
    )
    small = spark.createDataFrame(
        [(k, f"dim{k}") for k in range(7)], "k long, label string"
    )
    plain = large.join(small, "k").select("k", "payload", "label")
    salted = salted_join(large, small, ["k"], salt_factor=8).select(
        "k", "payload", "label"
    )
    assert sorted(plain.collect()) == sorted(salted.collect())


def test_salted_left_join_matches(spark):
    large = spark.createDataFrame(
        [(1, "a"), (1, "b"), (99, "c")], "k long, payload string"
    )
    small = spark.createDataFrame([(1, "dim1")], "k long, label string")
    plain = large.join(small, "k", "left").select("k", "payload", "label")
    salted = salted_join(large, small, ["k"], salt_factor=4, how="left").select(
        "k", "payload", "label"
    )
    assert sorted(plain.collect(), key=str) == sorted(salted.collect(), key=str)


def test_two_stage_agg_matches_direct(spark):
    df = spark.range(0, 5000).select(
        (F.col("id") % 3).alias("g"), (F.col("id") % 100).alias("v")
    )
    direct = df.groupBy("g").agg(
        F.count(F.lit(1)).alias("n"), F.sum("v").alias("s"), F.max("v").alias("m")
    )
    staged = two_stage_agg(
        df, ["g"], {"n": ("v", "count"), "s": ("v", "sum"), "m": ("v", "max")}
    )
    assert sorted(direct.collect()) == sorted(staged.collect())


def test_sql_surface_over_star_schema(spark, ztm_root):
    views = build_views(spark, ztm_root, dt.datetime(2024, 12, 25, 8))
    names = register_star_schema(spark, views)
    assert "DelayFact" in names and "LineDim" in names
    # a user query joining fact to dims, pure SQL
    out = spark.sql(
        """
        select l.line_type, count(*) as n
        from DelayFact f
        join LineDim l on l.id = f.line_id
        group by l.line_type
        order by l.line_type
        """
    ).collect()
    assert len(out) > 0
    assert all(r.n > 0 for r in out)
