"""SQL surface: register the engine's inputs and star-schema outputs as
temp views so users can drive everything with ``spark.sql(...)`` — the
interface the reference's users already speak (its queries are SQL
strings; reference: src/queries.py)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from idh_etl_demo_spark.plans.star import TABLES


def register_star_schema(
    spark: SparkSession, views: dict[str, DataFrame]
) -> list[str]:
    """Register the cleansed input views AND the six derived star tables
    as temp views. Returns the registered names. The star views are lazy —
    querying them through spark.sql composes with further SQL and still
    optimizes as one Catalyst plan."""
    for name, df in views.items():
        df.createOrReplaceTempView(name)
    for spec in TABLES:
        spec.build(views).createOrReplaceTempView(spec.name)
    return [*views.keys(), *[s.name for s in TABLES]]
