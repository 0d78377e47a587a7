"""Date-partitioned parquet layout — the 100 TB table format policy.

A day-partitioned directory tree (``.../event_date=2024-01-02/part-*.parquet``)
is the standard large-fact layout: a date-ranged query prunes whole
directories at PLANNING time (PartitionFilters in the scan node), so a
one-day query over a 3-year table opens ~1/1000 of the files before a
single row is read. Pruning composes with row-group predicate pushdown
(PushedFilters) for the non-partition columns.

The reference loads per-day CSV drops into per-run tables (reference:
dags/idh_etl.py:96-140); the Spark-first equivalent is ONE table whose
partition column encodes the day — no per-day table proliferation, and
the hourly micro-batch runner appends into the matching partition.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession


def write_date_partitioned(
    df: DataFrame,
    path: str,
    ts_col: str = "ts",
    partition_col: str = "event_date",
    mode: str = "overwrite",
) -> None:
    """Write ``df`` day-partitioned by ``to_date(ts_col)``.

    ``partitionBy`` moves the date column into the directory key: rows
    land in ``<path>/<partition_col>=<day>/``. Writers running per
    micro-batch append only into the partitions their batch touches.
    """
    (
        df.withColumn(partition_col, F.to_date(F.col(ts_col)))
        .write.partitionBy(partition_col)
        .mode(mode)
        .parquet(path)
    )


def read_date_partitioned(spark: SparkSession, path: str) -> DataFrame:
    """Read the partitioned table; the partition column comes back as a
    real (date-typed) column reconstructed from directory names, and
    filters on it prune directories at planning time."""
    return spark.read.parquet(path)
