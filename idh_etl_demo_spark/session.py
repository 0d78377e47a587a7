"""SparkSession factory.

Defaults are chosen for correctness parity with a SQL oracle and for
scale-out behavior:

- session timezone pinned UTC so ``date_format``/``hour``/`weekday`` match
  wall-clock semantics of timestamp-naive engines (DuckDB, BigQuery UTC).
- AQE on: runtime join-strategy switching (broadcast), skew-join splitting,
  partition coalescing — the knobs that matter at 100 TB.
- Arrow enabled for the few Pandas-UDF paths (multimodal decode plumbing).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "idh-etl-demo-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the session.

    ``master``/``shuffle_partitions`` default from env so the same code runs
    on local[N] in tests and on a real cluster unchanged (on a cluster the
    master comes from spark-submit and AQE coalesces shuffle partitions).
    """
    master = master or os.environ.get("SPARK_MASTER", f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_SHUFFLE_PARTITIONS", "32"))

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        # local single-JVM runs see small files: split aggressively so all
        # cores scan in parallel; a real cluster keeps the 128 MB default
        .config(
            "spark.sql.files.maxPartitionBytes",
            "8388608" if master.startswith("local") else "134217728",
        )
        .config("spark.sql.files.openCostInBytes", "1048576")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", os.environ.get("SPARK_UI_ENABLED", "false"))
        # pin the JVM locale: any remaining date_format('E'/'MMM') pattern
        # must emit English on every cluster (the reference emits fixed
        # English names — src/time_utils.py:3-16). The load-bearing TimeDim
        # names are CASE maps (functions/timeutils.py), this is defense.
        .config("spark.driver.extraJavaOptions", "-Duser.language=en -Duser.country=US")
        .config("spark.executor.extraJavaOptions", "-Duser.language=en -Duser.country=US")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
