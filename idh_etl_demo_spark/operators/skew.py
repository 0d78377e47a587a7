"""Skew mitigation utilities.

AQE's skew-join splitting handles most shuffle-join skew automatically
(session.py enables it). These helpers cover the cases AQE can't re-plan:

- ``salted_join``: replicate the small side across N salt buckets and
  spread the large side's hot keys deterministically — turns one
  pathological partition into N even ones. Use when the small side is too
  big to broadcast AND the key histogram is pathological (a handful of
  keys with >>1/shuffle-partitions of the rows).
- ``two_stage_agg``: partial aggregation under a salt, then final — for
  high-cardinality-input/low-cardinality-output aggregations where a few
  groups dominate (classic hot-key count/sum).

Salts are deterministic (xxhash64 of chosen columns, never rand()) so
results stay reproducible run-to-run — the engine-wide rule.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
import pyspark.sql.functions as F


def _salt(cols: list[str], factor: int) -> Column:
    return F.pmod(F.xxhash64(*[F.col(c) for c in cols]), F.lit(factor))


def salted_join(
    large: DataFrame,
    small: DataFrame,
    on: list[str],
    salt_factor: int = 8,
    salt_cols: list[str] | None = None,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the large side's rows spread over ``salt_factor``
    sub-keys and the small side replicated to every sub-key.

    ``salt_cols`` (default: all non-key columns of the large side) feed
    the deterministic salt; rows identical in those columns land in the
    same bucket, which is fine — the goal is spreading the hot KEY, not a
    perfect shuffle.
    """
    if salt_cols is None:
        salt_cols = [c for c in large.columns if c not in on] or on
    salted_large = large.withColumn("__salt", _salt(salt_cols, salt_factor))
    replicated_small = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt_factor - 1)))
    )
    out = salted_large.join(replicated_small, on=[*on, "__salt"], how=how)
    return out.drop("__salt")


def two_stage_agg(
    df: DataFrame,
    group_cols: list[str],
    aggs: dict[str, tuple[str, str]],
    salt_factor: int = 16,
    salt_cols: list[str] | None = None,
) -> DataFrame:
    """Hot-key-safe aggregation: group by (keys, salt) first, then merge.

    ``aggs`` maps output column → (input column, fn) with fn ∈
    {count, sum, min, max}; those are the algebraic aggregates that merge
    exactly (count merges by sum). avg = sum/count downstream.
    """
    if salt_cols is None:
        salt_cols = df.columns
    mergers = {"count": "sum", "sum": "sum", "min": "min", "max": "max"}
    partial = (
        df.withColumn("__salt", _salt(salt_cols, salt_factor))
        .groupBy(*group_cols, "__salt")
        .agg(
            *[
                getattr(F, fn)(F.lit(1) if fn == "count" else col).alias(out)
                for out, (col, fn) in aggs.items()
            ]
        )
    )
    return partial.groupBy(*group_cols).agg(
        *[
            getattr(F, mergers[fn])(out).alias(out)
            for out, (col, fn) in aggs.items()
        ]
    )
