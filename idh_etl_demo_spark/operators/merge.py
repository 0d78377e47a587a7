"""Idempotent insert-if-absent merge sink (write-audit-publish).

The reference loads each batch into a uniquely-named staging table and runs
``MERGE ... WHEN NOT MATCHED BY TARGET THEN INSERT`` in the warehouse
(reference: dags/idh_etl.py:227-268) — the load is atomic and the batch
plan runs once. This sink reproduces both properties on a filesystem:

1. **Anti-join** the deduped batch against the existing target keys
   (LEFT ANTI ≡ WHEN NOT MATCHED INSERT).
2. **Write once** to a hidden staging directory ``_staging_<uuid>`` under
   the target. Spark's file listing ignores ``_``/``.``-prefixed paths, so
   a half-written or crashed staging dir is invisible to every reader and
   to the next run's anti-join — a re-run after a crash recomputes against
   *published* data only and cannot double-insert.
3. **Audit** the appended row count from an ``Observation`` attached to
   the written plan — zero extra jobs, and the count and the written rows
   come from the SAME execution (a count()-then-write pair could disagree
   if input files changed between the two runs).
4. **Publish** by renaming the staged part files into the target tree.
   Each rename is atomic; a crash mid-publish leaves some files published
   and the rest staged-invisible, and the re-run's anti-join skips the
   published keys — insert-if-absent semantics make partial publish safe.

Concurrency: two simultaneous merges into one target are serialized by an
O_EXCL lock file (the filesystem analogue of the warehouse serializing two
MERGE statements). On an object store without atomic create/rename, swap
this sink for a Delta/Iceberg MERGE; the call-site contract is unchanged.

Scale notes:
- Only the target's KEY COLUMNS are scanned for the anti join (column
  pruning reaches the parquet reader), not the whole target.
- The incoming batch of a micro-run is small relative to the target, so we
  keep the incoming side as the probe side; AQE picks broadcast when the
  projected target keys are small, shuffle-hash otherwise. With a bucketed
  target table the anti join is shuffle-free.
- ``partition_by`` prunes the anti-join probe to the partitions the batch
  touches — an hourly batch against a years-deep fact table scans one day.
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import DataFrame, Observation, SparkSession
import pyspark.sql.functions as F

from idh_etl_demo_spark.operators.dedup import dedup_keep_first


class ConcurrentMergeError(RuntimeError):
    """Another merge into the same target holds the lock."""


def _is_hidden(name: str) -> bool:
    return name.startswith("_") or name.startswith(".")


def _has_parquet(path: str) -> bool:
    """True if the *published* table has data (staging/hidden dirs ignored,
    matching Spark's own PathFilter semantics)."""
    if not os.path.isdir(path):
        return False
    for root, dirs, files in os.walk(path):
        dirs[:] = [d for d in dirs if not _is_hidden(d)]
        if any(f.endswith(".parquet") and not _is_hidden(f) for f in files):
            return True
    return False


def _publish(staging: str, target: str) -> None:
    """Atomically-per-file move staged parts (and their partition subdirs)
    into the target tree. Staged filenames embed a task UUID, so renames
    never collide with published files."""
    for root, dirs, files in os.walk(staging):
        dirs[:] = [d for d in dirs if not _is_hidden(d)]
        rel = os.path.relpath(root, staging)
        dest_dir = target if rel == "." else os.path.join(target, rel)
        for f in files:
            if _is_hidden(f) or not f.endswith(".parquet"):
                continue
            os.makedirs(dest_dir, exist_ok=True)
            os.rename(os.path.join(root, f), os.path.join(dest_dir, f))


def _remove_tree(path: str) -> None:
    import shutil

    shutil.rmtree(path, ignore_errors=True)


def merge_insert_if_absent(
    spark: SparkSession,
    incoming: DataFrame,
    target_path: str,
    keys: list[str],
    partition_by: list[str] | None = None,
) -> int:
    """Append rows of ``incoming`` whose key tuple is absent from the
    parquet table at ``target_path``. Returns rows appended.

    Mirrors the reference's pre-merge guards: batch dedup on the key
    columns first (reference: dags/idh_etl.py:214-221) — with an explicit
    deterministic keep-rule instead of pandas' file-order "first".
    """
    if not keys:
        raise ValueError("merge requires unique key columns")
    missing = [k for k in keys if k not in incoming.columns]
    if missing:
        raise ValueError(f"key columns missing from incoming batch: {missing}")
    if len(set(incoming.columns)) != len(incoming.columns):
        raise ValueError(f"duplicate column names in incoming batch: {incoming.columns}")
    partition_by = partition_by or []
    bad = [p for p in partition_by if p not in keys]
    if bad:
        raise ValueError(f"partition columns must be part of the merge key: {bad}")

    batch = dedup_keep_first(incoming, keys)

    os.makedirs(target_path, exist_ok=True)
    lock_path = os.path.join(target_path, "_merge.lock")
    try:
        lock_fd = os.open(lock_path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
    except FileExistsError:
        raise ConcurrentMergeError(
            f"merge already in progress for {target_path} (lock: {lock_path})"
        )
    staging = os.path.join(target_path, f"_staging_{uuid.uuid4().hex}")
    try:
        if _has_parquet(target_path):
            existing = spark.read.parquet(target_path)
            if partition_by:
                touched = [
                    tuple(r[p] for p in partition_by)
                    for r in batch.select(*partition_by).distinct().collect()
                ]
                pred = None
                for values in touched:
                    clause = None
                    for p, v in zip(partition_by, values):
                        # null-safe: a null partition value must still match
                        # the existing null partition, or a re-run would
                        # re-insert those keys (idempotency break).
                        c = F.col(p).eqNullSafe(F.lit(v))
                        clause = c if clause is None else (clause & c)
                    pred = clause if pred is None else (pred | clause)
                if pred is not None:
                    existing = existing.filter(pred)
            # Null-safe key equality: a plain `on=keys` equi-anti-join uses
            # EqualTo, so a row with a NULL key never matches and would be
            # re-inserted on every replay. <=> matches dedup_keep_first's
            # treatment of null as a value, keeping replays idempotent.
            probe = existing.select(*keys)
            cond = None
            for k in keys:
                c = batch[k].eqNullSafe(probe[k])
                cond = c if cond is None else (cond & c)
            batch = batch.join(probe, on=cond, how="left_anti")

        obs = Observation()
        audited = batch.observe(obs, F.count(F.lit(1)).alias("appended"))
        writer = audited.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(staging)  # the ONLY execution of the batch plan
        appended = int(obs.get["appended"])
        if appended:
            _publish(staging, target_path)
        return appended
    finally:
        _remove_tree(staging)
        os.close(lock_fd)
        os.unlink(lock_path)


def merge_insert_if_absent_bucketed(
    spark: SparkSession,
    incoming: DataFrame,
    table: str,
    keys: list[str],
    n_buckets: int = 64,
) -> int:
    """Bucketed-table variant of :func:`merge_insert_if_absent` — the
    100 TB shape of the hourly load.

    The target is a catalog table bucketed (and sorted) by the merge
    keys. Every hourly merge anti-joins the batch against the target's
    keys, and with a path-based target that join re-shuffles the target's
    key projection EVERY hour — at scale, the dominant cost of a load
    into a years-deep fact table. Here the target side arrives
    pre-clustered from the bucketed layout (zero exchange, see
    tests/test_bucketing.py), so only the small incoming batch shuffles,
    and the bucketed APPEND needs no shuffle of historical data either.

    Trade-off vs the path variant: atomicity is delegated to the session
    catalog's append (no filesystem write-audit-publish) — on a
    production lakehouse this function IS a Delta/Iceberg MERGE into a
    clustered table. Idempotency is unchanged: inserts are keyed, so a
    replayed hour appends nothing (same guarantee the runner relies on).

    Keys must be NON-NULL here (star-table surrogate keys are): a
    null-safe join hashes ``(coalesce(k), isnull(k))`` pairs, which does
    not line up with the bucket layout's ``hash(k)`` and would silently
    re-shuffle the target. The guard is an in-plan ``raise_error`` on the
    written key columns — enforced during the one execution, zero extra
    jobs.
    """
    if not keys:
        raise ValueError("merge requires unique key columns")
    missing = [k for k in keys if k not in incoming.columns]
    if missing:
        raise ValueError(f"key columns missing from incoming batch: {missing}")

    batch = dedup_keep_first(incoming, keys)
    for k in keys:
        guarded = F.when(
            F.col(k).isNull(),
            F.raise_error(f"bucketed merge into {table}: null merge key {k}"),
        ).otherwise(F.col(k))
        batch = batch.withColumn(k, guarded.cast(batch.schema[k].dataType))
    if spark.catalog.tableExists(table):
        # plain equi-join on the bucket columns: the target side's bucketed
        # layout satisfies the join's required distribution — no exchange.
        probe = spark.table(table).select(*keys)
        batch = batch.join(probe.hint("merge"), on=keys, how="left_anti")

    obs = Observation()
    audited = batch.observe(obs, F.count(F.lit(1)).alias("appended"))
    (
        audited.write.format("parquet")
        .bucketBy(n_buckets, *keys)
        .sortBy(*keys)
        .mode("append")
        .saveAsTable(table)
    )
    return int(obs.get["appended"])
