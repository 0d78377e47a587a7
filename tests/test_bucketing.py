"""Bucketed tables: pre-shuffled layout makes repeated equi-joins
shuffle-free — the co-location strategy for 100 TB fact-to-fact joins."""

from __future__ import annotations

import pyspark.sql.functions as F


def test_bucketed_join_is_shuffle_free(spark, tmp_path):
    spark.sql("drop table if exists b_orders")
    spark.sql("drop table if exists b_lineitem")
    orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    lineitem = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    (
        orders.write.format("parquet")
        .bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .mode("overwrite")
        .saveAsTable("b_orders")
    )
    (
        lineitem.write.format("parquet")
        .bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .mode("overwrite")
        .saveAsTable("b_lineitem")
    )
    joined = (
        spark.table("b_lineitem")
        .join(
            spark.table("b_orders").hint("merge"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    plan = joined._jdf.queryExecution().executedPlan().toString()
    # the join itself needs no Exchange: both sides arrive pre-bucketed
    join_section = plan[plan.index("SortMergeJoin") :]
    assert "Exchange hashpartitioning(l_orderkey" not in plan
    assert "Exchange hashpartitioning(o_orderkey" not in plan
    # correctness unchanged
    got = {r.o_orderpriority: r.n for r in joined.collect()}
    want = {
        r.o_orderpriority: r.n
        for r in lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == want
    spark.sql("drop table if exists b_orders")
    spark.sql("drop table if exists b_lineitem")
