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


def test_null_partition_value_idempotent(spark, tmp_path):
    """eqNullSafe pruning: rows in the NULL partition must anti-join on
    replay (plain == would null out the clause and re-insert them)."""
    target = str(tmp_path / "fact")
    batch = spark.createDataFrame(
        [(None, 1, "a"), ("2024-12-25", 2, "b")], "dt string, id int, v string"
    )
    assert merge_insert_if_absent(spark, batch, target, ["dt", "id"], partition_by=["dt"]) == 2
    assert merge_insert_if_absent(spark, batch, target, ["dt", "id"], partition_by=["dt"]) == 0
    assert spark.read.parquet(target).count() == 2


def test_crashed_staging_is_invisible(spark, tmp_path):
    """A staging dir left by a crashed run must not be readable as table
    data and must not break or double-count the next merge."""
    target = str(tmp_path / "t")
    first = spark.createDataFrame([(1, "a"), (2, "b")], "id int, v string")
    assert merge_insert_if_absent(spark, first, target, ["id"]) == 2

    # simulate a crash: a staging dir with real parquet inside the target
    import os

    dead = os.path.join(target, "_staging_deadbeef")
    spark.createDataFrame([(99, "ghost")], "id int, v string").write.parquet(dead)

    # readers don't see the ghost row
    assert spark.read.parquet(target).count() == 2
    # replay appends nothing; a new row still merges; ghost never surfaces
    assert merge_insert_if_absent(spark, first, target, ["id"]) == 0
    third = spark.createDataFrame([(3, "c")], "id int, v string")
    assert merge_insert_if_absent(spark, third, target, ["id"]) == 1
    got = {r.id for r in spark.read.parquet(target).collect()}
    assert got == {1, 2, 3}


def test_merge_executes_batch_plan_once(spark, tmp_path, monkeypatch):
    """The appended count must come from the observe()-audited write —
    the ONLY action on the batch plan. The old shape ran count() then
    write (two executions that could even disagree); ban count() outright
    and the merge must still report the right number."""
    from pyspark.sql import DataFrame

    target = str(tmp_path / "t")
    seed = spark.createDataFrame([(1, "a")], "id int, v string")
    merge_insert_if_absent(spark, seed, target, ["id"])

    def _no_count(self):
        raise AssertionError("merge must not run a separate count() action")

    monkeypatch.setattr(DataFrame, "count", _no_count)
    batch = spark.createDataFrame([(2, "b"), (3, "c")], "id int, v string")
    assert merge_insert_if_absent(spark, batch, target, ["id"]) == 2


def test_concurrent_merge_locked(spark, tmp_path):
    import os

    from idh_etl_demo_spark.operators.merge import ConcurrentMergeError

    target = str(tmp_path / "t")
    os.makedirs(target)
    with open(os.path.join(target, "_merge.lock"), "w"):
        pass
    batch = spark.createDataFrame([(1, "a")], "id int, v string")
    try:
        merge_insert_if_absent(spark, batch, target, ["id"])
        assert False, "expected ConcurrentMergeError"
    except ConcurrentMergeError:
        pass
    # lock released by the holder → merge proceeds
    os.unlink(os.path.join(target, "_merge.lock"))
    assert merge_insert_if_absent(spark, batch, target, ["id"]) == 1


def test_stale_lock_dead_owner_reclaimed(spark, tmp_path):
    """A crash after lock-create must not wedge the target forever: a
    lock whose recorded pid is dead is reclaimed by the next merge."""
    import os
    import subprocess
    import time

    target = str(tmp_path / "t")
    os.makedirs(target)
    p = subprocess.Popen(["true"])
    p.wait()  # reaped → pid is dead
    with open(os.path.join(target, "_merge.lock"), "w") as f:
        f.write(f"{p.pid} {time.time()}\n")
    batch = spark.createDataFrame([(1, "a")], "id int, v string")
    assert merge_insert_if_absent(spark, batch, target, ["id"]) == 1
    assert not os.path.exists(os.path.join(target, "_merge.lock"))


def test_stale_lock_ttl_reclaimed(spark, tmp_path):
    """Even with an 'alive' pid (unreachable host scenario), a lock past
    the TTL is reclaimed."""
    import os
    import time

    from idh_etl_demo_spark.operators import merge as merge_mod

    target = str(tmp_path / "t")
    os.makedirs(target)
    with open(os.path.join(target, "_merge.lock"), "w") as f:
        f.write(f"{os.getpid()} {time.time() - merge_mod.LOCK_TTL_SEC - 10}\n")
    batch = spark.createDataFrame([(1, "a")], "id int, v string")
    assert merge_insert_if_absent(spark, batch, target, ["id"]) == 1


def test_fresh_live_lock_blocks(spark, tmp_path):
    import os
    import time

    from idh_etl_demo_spark.operators.merge import ConcurrentMergeError

    target = str(tmp_path / "t")
    os.makedirs(target)
    with open(os.path.join(target, "_merge.lock"), "w") as f:
        f.write(f"{os.getpid()} {time.time()}\n")
    batch = spark.createDataFrame([(1, "a")], "id int, v string")
    try:
        merge_insert_if_absent(spark, batch, target, ["id"])
        assert False, "expected ConcurrentMergeError"
    except ConcurrentMergeError:
        pass


def test_orphan_staging_swept_under_lock(spark, tmp_path):
    """_staging_* leftovers from a crashed run are removed by the next
    merge (which holds the lock, so anything staged is garbage)."""
    import os

    target = str(tmp_path / "t")
    b1 = spark.createDataFrame([(1, "a")], "id int, v string")
    assert merge_insert_if_absent(spark, b1, target, ["id"]) == 1
    orphan = os.path.join(target, "_staging_deadbeef")
    os.makedirs(orphan)
    with open(os.path.join(orphan, "junk.parquet"), "w") as f:
        f.write("not parquet")
    b2 = spark.createDataFrame([(2, "b")], "id int, v string")
    assert merge_insert_if_absent(spark, b2, target, ["id"]) == 1
    assert not os.path.exists(orphan)
    assert spark.read.parquet(target).count() == 2


def test_delta_merge_gated_without_delta(spark):
    """The Delta variant must fail loudly (with install instructions)
    when delta-spark is absent — never half-work."""
    import pytest

    from idh_etl_demo_spark.operators.merge import merge_insert_if_absent_delta

    try:
        import delta  # noqa: F401

        pytest.skip("delta-spark present; gated path not applicable")
    except ImportError:
        pass
    batch = spark.createDataFrame([(1, "a")], "id int, v string")
    with pytest.raises(NotImplementedError, match="delta-spark"):
        merge_insert_if_absent_delta(spark, batch, "wh_delta_demo", ["id"])
