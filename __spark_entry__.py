"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

The catalog lives in idh_etl_demo_spark/catalog*.py — one entry per
operator family of SURVEY.md §2 plus the training-data-pipeline
operators (dedup / similarity / text analysis / multimodal).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from idh_etl_demo_spark.catalog import ENTRIES
import idh_etl_demo_spark.catalog_llm  # noqa: F401  (registers entries)
import idh_etl_demo_spark.catalog_ztm  # noqa: F401  (registers entries)

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return ENTRIES["pricing_summary"].spark(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: e.spark for name, e in ENTRIES.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalent for every entry that is
    SQL-expressible (all of them, by construction)."""
    return {name: e.oracle for name, e in ENTRIES.items() if e.oracle is not None}
