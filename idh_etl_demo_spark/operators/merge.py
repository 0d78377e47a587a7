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
MERGE statements). The lock records ``pid timestamp``; a lock whose owner
process is dead, or older than ``LOCK_TTL_SEC``, is STALE — the next merge
reclaims it (atomic rename, so exactly one contender wins) instead of
failing forever on a crash's leftovers. While holding the lock, orphaned
``_staging_*`` directories from crashed runs are swept: no other merge can
be active, so any staging dir present is garbage. On an object store
without atomic create/rename, swap this sink for a Delta/Iceberg MERGE
(see ``merge_insert_if_absent_delta``); the call-site contract is
unchanged.

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
import time
import uuid

from pyspark.sql import DataFrame, Observation, SparkSession
import pyspark.sql.functions as F

from idh_etl_demo_spark.operators.dedup import dedup_keep_first

#: A lock older than this is considered abandoned even if the pid check is
#: inconclusive (e.g. the owning host died and pids aren't comparable).
LOCK_TTL_SEC = 3600.0


class ConcurrentMergeError(RuntimeError):
    """Another merge into the same target holds the lock."""


def _pid_alive(pid: int) -> bool:
    try:
        os.kill(pid, 0)
    except ProcessLookupError:
        return False
    except PermissionError:
        return True  # exists, owned by someone else
    except OSError:
        return True  # inconclusive: assume alive, let the TTL decide
    return True


def _lock_is_stale(lock_path: str, ttl: float = LOCK_TTL_SEC) -> bool:
    """A lock is stale if its recorded owner pid is dead (same-host fast
    path) or its recorded timestamp is past the TTL. A lock file that is
    empty/unreadable (crash between create and write) falls back to the
    file mtime + TTL."""
    try:
        with open(lock_path) as f:
            parts = f.read().split()
        pid, ts = int(parts[0]), float(parts[1])
    except (OSError, ValueError, IndexError):
        try:
            ts = os.path.getmtime(lock_path)
        except OSError:
            return False  # vanished — owner released it; not stale
        return time.time() - ts > ttl
    if not _pid_alive(pid):
        return True
    return time.time() - ts > ttl


def _acquire_merge_lock(target_path: str) -> tuple[int, str]:
    """O_EXCL-create the merge lock, reclaiming a stale one at most once.

    Reclaim is an atomic ``rename`` of the stale lock to a unique name:
    of N contenders observing the same stale lock exactly one rename
    succeeds, and the losers loop back to the O_EXCL create — no window
    where a contender can delete another's FRESH lock (a naive unlink
    would race exactly there)."""
    lock_path = os.path.join(target_path, "_merge.lock")
    for attempt in (1, 2):
        try:
            fd = os.open(lock_path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            os.write(fd, f"{os.getpid()} {time.time()}\n".encode())
            return fd, lock_path
        except FileExistsError:
            if attempt == 2 or not _lock_is_stale(lock_path):
                raise ConcurrentMergeError(
                    f"merge already in progress for {target_path} "
                    f"(lock: {lock_path}; stale locks auto-reclaim after "
                    f"{LOCK_TTL_SEC:.0f}s — to force, remove the file)"
                ) from None
            reclaim = f"{lock_path}.stale_{uuid.uuid4().hex}"
            try:
                os.rename(lock_path, reclaim)
            except FileNotFoundError:
                continue  # another contender reclaimed/released it first
            os.unlink(reclaim)
    raise AssertionError("unreachable")


def _sweep_orphan_staging(target_path: str) -> None:
    """Remove ``_staging_*`` leftovers from crashed merges. Must be called
    while HOLDING the merge lock: with the lock held no other merge is
    active, so every staging dir under the target is an orphan."""
    try:
        names = os.listdir(target_path)
    except FileNotFoundError:
        return
    for name in names:
        if name.startswith("_staging_"):
            _remove_tree(os.path.join(target_path, name))


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
    lock_fd, lock_path = _acquire_merge_lock(target_path)
    staging = os.path.join(target_path, f"_staging_{uuid.uuid4().hex}")
    try:
        _sweep_orphan_staging(target_path)
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


def _table_location(spark: SparkSession, table: str) -> str:
    """Filesystem path of a catalog table's location (local fs only)."""
    for r in spark.sql(f"DESCRIBE TABLE EXTENDED {table}").collect():
        if r.col_name == "Location":
            loc = r.data_type
            if loc.startswith("file:"):
                from urllib.parse import urlparse

                return urlparse(loc).path
            return loc
    raise ValueError(f"no location for table {table}")


def _drop_orphan_staging_tables(spark: SparkSession, table: str) -> None:
    """Drop ``<table>__staging_*`` leftovers from crashed bucketed merges.
    Must be called while HOLDING the target's merge lock (same reasoning
    as :func:`_sweep_orphan_staging`). Dropping a crashed staging table
    discards its un-published rows — correct, because recovery for an
    interrupted merge is re-running it: the re-run recomputes the batch
    and the anti-join re-selects everything not yet published."""
    prefix = f"{table}__staging_".lower()
    for t in spark.catalog.listTables():
        if t.name.lower().startswith(prefix):
            spark.sql(f"DROP TABLE IF EXISTS {t.name}")


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

    Atomicity matches the path variant (write-audit-publish, not a bare
    ``saveAsTable(append)``): the batch plan executes ONCE into a
    uniquely-named staging TABLE (bucketed the same way — Spark encodes
    the bucket id in each part filename, so the files are layout-valid in
    either table), the appended count is audited from the write's own
    Observation, and publish moves the staged part files into the target
    table's location (each rename atomic) before dropping the staging
    table's metadata. A crash mid-publish leaves the un-moved files
    invisible to target readers; the re-run's anti-join skips the
    published keys — exactly the path sink's recovery story. Serialized
    by the same stale-reclaiming merge lock, held in the target table's
    location. On a production lakehouse prefer
    :func:`merge_insert_if_absent_delta` (a real transactional MERGE).

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

    def _stage(df: DataFrame, name: str) -> int:
        obs = Observation()
        audited = df.observe(obs, F.count(F.lit(1)).alias("appended"))
        (
            audited.write.format("parquet")
            .bucketBy(n_buckets, *keys)
            .sortBy(*keys)
            .mode("error")
            .saveAsTable(name)
        )
        return int(obs.get["appended"])

    if not spark.catalog.tableExists(table):
        # initial load: the staged write IS the publish — table metadata
        # appears only after the data files are fully committed.
        return _stage(batch, table)

    target_loc = _table_location(spark, table)
    lock_fd, lock_path = _acquire_merge_lock(target_loc)
    staging_table = f"{table}__staging_{uuid.uuid4().hex[:12]}"
    try:
        _drop_orphan_staging_tables(spark, table)
        # plain equi-join on the bucket columns: the target side's bucketed
        # layout satisfies the join's required distribution — no exchange.
        # Probed INSIDE the lock so no concurrent publish can add keys
        # between the probe and our publish.
        probe = spark.table(table).select(*keys)
        todo = batch.join(probe.hint("merge"), on=keys, how="left_anti")
        appended = _stage(todo, staging_table)
        if appended:
            _publish(_table_location(spark, staging_table), target_loc)
            spark.catalog.refreshTable(table)
        spark.sql(f"DROP TABLE IF EXISTS {staging_table}")
        return appended
    finally:
        os.close(lock_fd)
        os.unlink(lock_path)


def merge_insert_if_absent_delta(
    spark: SparkSession,
    incoming: DataFrame,
    table: str,
    keys: list[str],
) -> int:
    """Transactional insert-if-absent via Delta Lake's MERGE — the
    production-lakehouse form of this sink (single atomic commit, no
    filesystem publish protocol, concurrent writers serialized by the
    Delta log instead of a lock file).

    GATED: requires the ``delta-spark`` package and a session configured
    with the Delta catalog extensions; this container ships neither, so
    the import guard raises with instructions rather than half-working.
    The call-site contract matches the other variants (returns rows
    appended, batch deduped on keys first).
    """
    try:
        from delta.tables import DeltaTable
    except ImportError as e:
        raise NotImplementedError(
            "merge_insert_if_absent_delta needs the delta-spark package "
            "(pip install delta-spark; session must enable "
            "io.delta.sql.DeltaSparkSessionExtension and the Delta "
            "catalog). Use merge_insert_if_absent[_bucketed] on plain "
            "parquet."
        ) from e
    if not keys:
        raise ValueError("merge requires unique key columns")
    batch = dedup_keep_first(incoming, keys)
    if not spark.catalog.tableExists(table):
        batch.write.format("delta").saveAsTable(table)
        return batch.count()
    target = DeltaTable.forName(spark, table)
    cond = " AND ".join(f"t.{k} <=> s.{k}" for k in keys)
    target.alias("t").merge(batch.alias("s"), cond).whenNotMatchedInsertAll().execute()
    hist = target.history(1).select("operationMetrics").collect()
    metrics = hist[0][0] if hist else {}
    return int(metrics.get("numTargetRowsInserted", -1))
