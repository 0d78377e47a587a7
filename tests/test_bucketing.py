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


def test_bucketed_merge_probe_is_shuffle_free(spark, tmp_path):
    """The bucketed merge sink's anti-join must only shuffle the incoming
    batch; the target's key projection arrives pre-clustered from the
    bucketed layout (the 100 TB hourly-load shape)."""
    from idh_etl_demo_spark.operators.merge import merge_insert_if_absent_bucketed

    spark.sql("drop table if exists wh_probe_demo")
    b1 = spark.createDataFrame([(i, f"v{i}") for i in range(100)], "id long, v string")
    n1 = merge_insert_if_absent_bucketed(spark, b1, "wh_probe_demo", ["id"], n_buckets=4)
    assert n1 == 100
    # overlapping re-delivery: only new keys append, replay is a no-op
    b2 = spark.createDataFrame([(i, "dup") for i in range(90, 110)], "id long, v string")
    assert merge_insert_if_absent_bucketed(spark, b2, "wh_probe_demo", ["id"], n_buckets=4) == 10
    assert merge_insert_if_absent_bucketed(spark, b2, "wh_probe_demo", ["id"], n_buckets=4) == 0
    assert spark.table("wh_probe_demo").count() == 110
    # keep-first survived for overlapping keys
    assert spark.table("wh_probe_demo").filter("id = 95").collect()[0].v == "v95"
    # plan shape: the same anti-join the sink builds has NO exchange on the
    # target side — only the incoming batch repartitions
    anti = b2.join(spark.table("wh_probe_demo").select("id").hint("merge"), on=["id"], how="left_anti")
    plan = anti._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan and "LeftAnti" in plan
    assert plan.count("Exchange hashpartitioning") == 1, plan
    spark.sql("drop table if exists wh_probe_demo")


def test_bucketed_merge_rejects_null_keys(spark):
    from idh_etl_demo_spark.operators.merge import merge_insert_if_absent_bucketed

    spark.sql("drop table if exists wh_nullkey_demo")
    bad = spark.createDataFrame([(1, "a"), (None, "b")], "id long, v string")
    import pytest

    with pytest.raises(Exception, match="null merge key"):
        merge_insert_if_absent_bucketed(spark, bad, "wh_nullkey_demo", ["id"], n_buckets=2)
    spark.sql("drop table if exists wh_nullkey_demo")


def test_bucketed_merge_crash_mid_publish_no_torn_reads(spark, tmp_path, monkeypatch):
    """The bucketed merge is write-audit-publish, not a bare append: a
    crash halfway through publish leaves the target readable and
    duplicate-free, and the re-run converges to the full state."""
    import os

    from idh_etl_demo_spark.operators import merge as merge_mod
    from idh_etl_demo_spark.operators.merge import merge_insert_if_absent_bucketed

    tbl = "wh_crash_demo"
    spark.sql(f"drop table if exists {tbl}")
    b1 = spark.createDataFrame([(i, f"v{i}") for i in range(100)], "id int, v string")
    assert merge_insert_if_absent_bucketed(spark, b1, tbl, ["id"], n_buckets=4) == 100

    real_publish = merge_mod._publish

    def torn_publish(staging, target):
        # move exactly one staged part file, then die
        moved = 0
        for root, dirs, files in os.walk(staging):
            dirs[:] = [d for d in dirs if not d.startswith(("_", "."))]
            for f in sorted(files):
                if f.endswith(".parquet") and not f.startswith(("_", ".")):
                    os.rename(os.path.join(root, f), os.path.join(target, f))
                    moved += 1
                    raise RuntimeError("simulated crash mid-publish")
        raise AssertionError(f"no files to move (moved={moved})")

    monkeypatch.setattr(merge_mod, "_publish", torn_publish)
    b2 = spark.createDataFrame(
        [(i, f"v{i}") for i in range(90, 120)], "id int, v string"
    )
    try:
        merge_insert_if_absent_bucketed(spark, b2, tbl, ["id"], n_buckets=4)
        assert False, "expected simulated crash"
    except RuntimeError as e:
        assert "simulated crash" in str(e)

    # torn state: target still reads consistently — no dupes, nothing lost
    spark.catalog.refreshTable(tbl)
    rows = spark.table(tbl).collect()
    ids = [r.id for r in rows]
    assert len(ids) == len(set(ids)), "duplicate keys after torn publish"
    assert set(range(100)) <= set(ids), "published rows lost"
    partial = len(ids) - 100  # 0..20 new rows may have landed

    # recovery = re-run: anti-join skips what was published, fills the rest
    monkeypatch.setattr(merge_mod, "_publish", real_publish)
    appended = merge_insert_if_absent_bucketed(spark, b2, tbl, ["id"], n_buckets=4)
    assert appended == 20 - partial
    assert spark.table(tbl).count() == 120
    # crashed staging table was dropped by the re-run's orphan sweep
    leftovers = [
        t.name for t in spark.catalog.listTables()
        if t.name.startswith(f"{tbl}__staging_")
    ]
    assert leftovers == []
    # and the lock was released despite the crash path
    from idh_etl_demo_spark.operators.merge import _table_location

    assert not os.path.exists(os.path.join(_table_location(spark, tbl), "_merge.lock"))
    spark.sql(f"drop table if exists {tbl}")
