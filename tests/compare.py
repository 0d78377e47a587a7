"""Order-insensitive DataFrame comparison helpers (Spark vs DuckDB)."""

from __future__ import annotations

import decimal
import math

import pandas as pd


def canonical(df: pd.DataFrame) -> pd.DataFrame:
    """Sort columns by name, rows by all values, normalize NaN→None."""
    out = df[sorted(df.columns)].copy()
    out = out.sort_values(by=list(out.columns), na_position="last").reset_index(drop=True)
    return out


def _col_kind(series: pd.Series) -> str | None:
    """Classify a column as 'i' (integer), 'f' (float), 'b' (bool),
    'M' (datetime), or 'O' (everything else); None if undecidable
    (all-null / empty).  Object columns are classified from their
    first non-null value, because both engines materialize some typed
    columns as object dtype (e.g. Spark decimals)."""
    k = series.dtype.kind
    if k in ("i", "u"):
        return "i"
    if k in ("f", "b", "M", "m"):
        return k
    if k != "O":
        return "O"
    for v in series:
        if v is None or v is pd.NaT:
            continue
        if isinstance(v, bool):
            return "b"
        if isinstance(v, int):
            return "i"
        if isinstance(v, float):
            if math.isnan(v):
                continue
            return "f"
        if isinstance(v, decimal.Decimal):
            return "f"
        return "O"
    return None


def assert_frames_equal(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame, rel: float = 1e-9):
    a, b = canonical(spark_pdf), canonical(oracle_pdf)
    assert list(a.columns) == list(b.columns), f"columns differ: {list(a.columns)} vs {list(b.columns)}"
    assert len(a) == len(b), f"row counts differ: {len(a)} vs {len(b)}"
    # Dtype-kind strictness: the driver's correctness gate hashes TYPED
    # values, so an integer column on one side and float on the other
    # (e.g. a DuckDB HUGEINT windowed sum materializing as float64)
    # must fail here even when every value matches numerically.  The
    # r9 doc_unimax_allocation red row slipped through exactly this
    # gap: 140 (Spark long) vs 140.0 (oracle HUGEINT→float64) passed
    # the tolerant compare at sf0.001 but failed the driver hash.
    for col in a.columns:
        ka, kb = _col_kind(a[col]), _col_kind(b[col])
        if ka is not None and kb is not None:
            assert ka == kb, (
                f"dtype kind differs for {col!r}: spark={ka} ({a[col].dtype}) "
                f"vs oracle={kb} ({b[col].dtype}) — cast the oracle (or the "
                f"Spark side) so both engines emit the same type family"
            )
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
