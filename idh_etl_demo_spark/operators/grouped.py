"""Grouped-map Pandas operators (applyInPandas).

The escape hatch for per-group logic that genuinely needs a dataframe
library (model scoring per key, per-group curve fitting). Each group
arrives as ONE pandas DataFrame — so this only scales when groups are
bounded; for unbounded groups use window expressions or
applyInPandasWithState instead. Kept out of hot paths per the engine
rule: Python only at the edge.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

ZSCORE_SCHEMA = StructType(
    [
        StructField("event_id", LongType(), False),
        StructField("event_type", StringType(), False),
        StructField("value", DoubleType(), True),
        StructField("zscore", DoubleType(), True),
    ]
)


def zscore_per_group(events: DataFrame, group_col: str = "event_type") -> DataFrame:
    """Per-group z-score normalization via applyInPandas.

    Deterministic within float math: rows are sorted by event_id before
    the reduction so the accumulation order is fixed.
    """

    def norm(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("event_id")
        v = pdf["value"].to_numpy()
        mean = v.mean()
        std = v.std(ddof=1) if len(v) > 1 else 0.0
        z = (v - mean) / std if std > 0 else v * 0.0
        return pd.DataFrame(
            {
                "event_id": pdf["event_id"].to_numpy(),
                "event_type": pdf["event_type"].to_numpy(),
                "value": v,
                "zscore": z,
            }
        )

    return (
        events.select("event_id", "event_type", "value")
        .groupBy(group_col)
        .applyInPandas(norm, schema=ZSCORE_SCHEMA)
    )
