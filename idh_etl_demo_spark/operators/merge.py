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

from idh_etl_demo_spark.operators.dedup import dedup_keep_first


def merge_insert_if_absent(
    spark: SparkSession,
    incoming: DataFrame,
    target_path: str,
    keys: list[str],
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

    batch = dedup_keep_first(incoming, keys)

    if os.path.isdir(target_path) and any(
        f.endswith(".parquet") for f in os.listdir(target_path)
    ):
        existing_keys = spark.read.parquet(target_path).select(*keys)
        batch = batch.join(existing_keys, on=keys, how="left_anti")

    appended = batch.count()
    if appended:
        batch.write.mode("append").parquet(target_path)
    return appended
