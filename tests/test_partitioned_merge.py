"""Partition-pruned merge: the anti-join probe must scan only the
partitions a batch touches, and idempotency must hold per partition."""

from __future__ import annotations

import contextlib
import io

from idh_etl_demo_spark.operators.merge import merge_insert_if_absent


def _formatted(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_partitioned_merge_idempotent_and_pruned(spark, tmp_path):
    target = str(tmp_path / "fact")
    day1 = spark.createDataFrame(
        [("2024-12-25", 1, "a"), ("2024-12-25", 2, "b")], "dt string, id int, v string"
    )
    assert merge_insert_if_absent(spark, day1, target, ["dt", "id"], partition_by=["dt"]) == 2

    day2 = spark.createDataFrame(
        [("2024-12-26", 1, "c"), ("2024-12-26", 3, "d")], "dt string, id int, v string"
    )
    assert merge_insert_if_absent(spark, day2, target, ["dt", "id"], partition_by=["dt"]) == 2

    # replay of day1 (overlapping) appends nothing
    assert merge_insert_if_absent(spark, day1, target, ["dt", "id"], partition_by=["dt"]) == 0
    assert spark.read.parquet(target).count() == 4

    # pruning: a day2-only probe plans partition filters on dt
    probe = spark.read.parquet(target).filter("dt = '2024-12-26'").select("dt", "id")
    plan = _formatted(probe)
    assert "PartitionFilters" in plan
    assert "2024-12-26" in plan[plan.index("PartitionFilters") :].splitlines()[0]


def test_partition_column_must_be_key(spark, tmp_path):
    df = spark.createDataFrame([("x", 1)], "dt string, id int")
    try:
        merge_insert_if_absent(spark, df, str(tmp_path / "t"), ["id"], partition_by=["dt"])
        assert False, "expected ValueError"
    except ValueError as e:
        assert "partition columns" in str(e)
