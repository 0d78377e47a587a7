"""As-of (most-recent-match) join — beyond the reference's equi-joins, the
temporal primitive training-data and feature pipelines need (latest
feature value at example time, attribution, point-in-time correctness).

Implementation is the union + partitioned-window scan, NOT a range join:
tag both sides, union, sort within each key by (ts, right-first), and
carry the latest right-side ROW forward as one struct with
last(ignorenulls). One shuffle on the key, O(n log n) per key, no
quadratic candidate pairs — the shape that survives 100 TB. (A naive
``l.ts >= r.ts`` range join explodes to |L|·|R| per key before picking
the max; and carrying value columns individually instead of as one struct
would mix fields from different right rows when values are NULL.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
import pyspark.sql.functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    value_cols: list[str] | None = None,
    how: str = "inner",
) -> DataFrame:
    """For every left row, attach the right row with the greatest
    ``right_ts`` ≤ ``left_ts`` within the same ``on`` keys (backward
    as-of, inclusive).

    Output: all left columns + ``matched_<right_ts>`` + ``value_cols``
    (default: all right columns except keys and ts). ``how='left'`` keeps
    unmatched left rows with nulls.
    """
    if value_cols is None:
        value_cols = [c for c in right.columns if c not in on and c != right_ts]

    r_struct = F.struct(
        F.col(right_ts).alias("__matched_ts"),
        *[F.col(c) for c in value_cols],
    )
    r_struct_type = right.select(r_struct.alias("__r")).schema["__r"].dataType

    l_tagged = left.select(
        *on,
        F.col(left_ts).alias("__ts"),
        F.lit(0).alias("__is_right"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__l"),
        F.lit(None).cast(r_struct_type).alias("__r"),
    )
    r_tagged = right.select(
        *on,
        F.col(right_ts).alias("__ts"),
        F.lit(1).alias("__is_right"),
        F.lit(None).cast(l_tagged.schema["__l"].dataType).alias("__l"),
        r_struct.alias("__r"),
    )
    unioned = l_tagged.unionByName(r_tagged)
    # right rows sort BEFORE left rows at equal ts → ties match (ts ≥ ts)
    w = (
        Window.partitionBy(*on)
        .orderBy(F.asc("__ts"), F.desc("__is_right"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        "__is_right",
        "__l",
        F.last("__r", ignorenulls=True).over(w).alias("__match"),
    ).filter(F.col("__is_right") == 0)
    if how == "inner":
        carried = carried.filter(F.col("__match").isNotNull())
    return carried.select(
        F.col("__l.*"),
        F.col("__match.__matched_ts").alias(f"matched_{right_ts}"),
        *[F.col(f"__match.{c}").alias(c) for c in value_cols],
    )
