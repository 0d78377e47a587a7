"""Idempotent insert-if-absent merge sink.

The reference loads each batch into a uniquely-named staging table and runs
``MERGE ... WHEN NOT MATCHED BY TARGET THEN INSERT`` in the warehouse
(reference: dags/idh_etl.py:227-268). The Spark-native equivalent is a
LEFT ANTI join of the incoming batch against the existing target keys,
followed by an append — no staging table, no truncate race, identical
semantics (SURVEY §2.1 S11, §3.2).

Scale notes:
- Only the target's KEY COLUMNS are scanned for the anti join (column
  pruning reaches the parquet reader), not the whole target.
- The incoming batch of a micro-run is small relative to the target, so we
  keep the incoming side as the probe side; AQE picks broadcast when the
  projected target keys are small, shuffle-hash otherwise. With a bucketed
  target table the anti join is shuffle-free.
- With Delta/Iceberg available, swap the body for a real atomic MERGE; the
  call-site contract is unchanged.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
import pyspark.sql.functions as F

from idh_etl_demo_spark.operators.dedup import dedup_keep_first


def _has_parquet(path: str) -> bool:
    if not os.path.isdir(path):
        return False
    for root, _dirs, files in os.walk(path):
        if any(f.endswith(".parquet") for f in files):
            return True
    return False


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

    ``partition_by`` (columns that must be a subset of ``keys``) enables
    the 100 TB incremental-load path: the target is laid out Hive-style
    and the anti-join probe reads ONLY the partitions the batch touches —
    an hourly batch against a years-deep fact table scans one day, not the
    table. The partition values of a micro-batch are few, so collecting
    them to build the pruning predicate is a driver-side O(partitions)
    operation, not a data collect.
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
                    c = F.col(p) == F.lit(v)
                    clause = c if clause is None else (clause & c)
                pred = clause if pred is None else (pred | clause)
            if pred is not None:
                existing = existing.filter(pred)
        batch = batch.join(existing.select(*keys), on=keys, how="left_anti")

    appended = batch.count()
    if appended:
        writer = batch.write.mode("append")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(target_path)
    return appended
