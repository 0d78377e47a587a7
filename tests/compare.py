"""Order-insensitive DataFrame comparison helpers (Spark vs DuckDB)."""

from __future__ import annotations

import math

import pandas as pd


def canonical(df: pd.DataFrame) -> pd.DataFrame:
    """Sort columns by name, rows by all values, normalize NaN→None."""
    out = df[sorted(df.columns)].copy()
    out = out.sort_values(by=list(out.columns), na_position="last").reset_index(drop=True)
    return out


def assert_frames_equal(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame, rel: float = 1e-9):
    a, b = canonical(spark_pdf), canonical(oracle_pdf)
    assert list(a.columns) == list(b.columns), f"columns differ: {list(a.columns)} vs {list(b.columns)}"
    assert len(a) == len(b), f"row counts differ: {len(a)} vs {len(b)}"
    for col in a.columns:
        for i, (x, y) in enumerate(zip(a[col], b[col])):
            x_null = x is None or (isinstance(x, float) and math.isnan(x)) or x is pd.NaT
            y_null = y is None or (isinstance(y, float) and math.isnan(y)) or y is pd.NaT
            if x_null or y_null:
                assert x_null and y_null, f"{col}[{i}]: {x!r} vs {y!r}"
            elif isinstance(x, float) or isinstance(y, float):
                assert math.isclose(float(x), float(y), rel_tol=rel, abs_tol=1e-12), (
                    f"{col}[{i}]: {x!r} vs {y!r}"
                )
            else:
                assert x == y, f"{col}[{i}]: {x!r} vs {y!r}"
