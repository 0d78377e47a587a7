"""Mode (most-frequent value) per group.

The reference computes per-group modes with a group→count→row_number
window idiom and a deterministic tie-break — higher value wins
(reference: src/queries.py:22-35,45-58). We keep exactly that idiom:
Spark's built-in ``F.mode`` breaks ties nondeterministically, which would
make results irreproducible and oracle-incomparable (SURVEY §2.4 A4).

Physical shape at scale: two hash aggregations (both with map-side partial
aggregation) + one window over the already-aggregated (group, value) pairs.
The window input is |distinct (group, value)|, not |rows| — tiny relative
to the fact table, so the sort inside each partition is cheap and there is
no skew amplification beyond the group-by itself.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
import pyspark.sql.functions as F


def mode_per_group(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    out_col: str | None = None,
) -> DataFrame:
    """Most frequent ``value_col`` per ``group_cols``; ties → highest value.

    Returns one row per group: ``group_cols + [out_col]``.
    """
    out_col = out_col or value_col
    counted = df.groupBy(*group_cols, value_col).agg(F.count(F.lit(1)).alias("freq"))
    w = Window.partitionBy(*group_cols).orderBy(
        F.desc("freq"), F.desc_nulls_last(value_col)
    )
    return (
        counted.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(*group_cols, F.col(value_col).alias(out_col))
    )
