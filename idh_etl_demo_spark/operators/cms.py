"""Count-min sketch as pure relational algebra — the bounded-memory
frequency sketch for heavy-hitter estimation over unbounded key domains
(top-word tracking, hot-key detection for salting decisions, per-key
rate limits), built the same way :mod:`.bloom` builds its bitmap: no JVM
sketch objects, engine-portable md5-slice hashing, counters as a
DataFrame.

The sketch is a d×w counter matrix stored as (row j, column, count)
tuples — at most d·w rows, regardless of key cardinality. Build is ONE
map-side-combined groupBy over the exploded (j, column) stream; that
makes the sketch mergeable for free (union the streams, or sum the
counter tables — exactly how per-partition / per-day sketches combine
at 100 TB). A key's estimate is min_j counter[j, col_j(key)] —
over-count only (collisions add, never subtract), never an under-count:
the one-sided error bound callers gate.

Unlike library CMS implementations (whose estimates depend on private
hash functions), every count here is a deterministic function of the
md5-slice arithmetic — the same numbers fall out of any engine, so an
oracle can gate the ESTIMATES exactly, not just bounds.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
import pyspark.sql.functions as F


def _check_params(w: int, d: int) -> None:
    if not (1 <= d <= 8):
        raise ValueError(f"d must be in 1..8 (32 hex chars / 4), got {d}")
    # upper bound ties to the 16-bit slice in _col_j: a wider sketch
    # would leave columns >= 65536 permanently empty (the min over rows
    # would still be an over-count, but the extra width buys nothing and
    # the eps it advertises is a lie) — reject instead (round-6 advice).
    # Need w > 65536 (eps < ~4e-5)? Widen the slice to 8 hex chars AND
    # update every oracle that reproduces this arithmetic in SQL.
    if w & (w - 1) or not (2 <= w <= 65536):
        raise ValueError(f"w must be a power of two in [2, 65536], got {w}")


def _col_j(key: Column, j: int, w: int) -> Column:
    """Column index of ``key`` in sketch row j: the j-th 16-bit md5
    slice mod w (same slicing idea as bloom's positions; w is capped at
    65536 by :func:`_check_params` so the slice covers every column)."""
    return (
        F.conv(F.substring(F.md5(key), 1 + 4 * j, 4), 16, 10).cast("long")
        % F.lit(w)
    )


def cms_build(
    df: DataFrame, key_col: str, w: int = 1024, d: int = 4
) -> DataFrame:
    """d×w counter table over the (multiset) key stream ``df[key_col]``:
    columns (j, col, cnt), at most d·w rows. One explode to d rows per
    key occurrence, one map-side-combined groupBy — the only shuffle
    carries (j, col) pairs, bounded by d·w after combine."""
    _check_params(w, d)
    key = F.col(key_col)
    rows = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("j"), _col_j(key, j, w).alias("col")
                    )
                    for j in range(d)
                ]
            )
        ).alias("jc")
    )
    return (
        rows.select("jc.j", "jc.col")
        .groupBy("j", "col")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_estimate(
    keys: DataFrame,
    counters: DataFrame,
    key_col: str,
    w: int = 1024,
    d: int = 4,
) -> DataFrame:
    """Attach ``cms_count`` — min over the d counter cells — to every
    row of ``keys``. The counter table broadcasts (≤ d·w rows); each key
    explodes to its d (j, col) probes, joins the broadcast, and takes
    the min: per-key cost is d broadcast lookups, no counter shuffle.
    A key the sketch never saw estimates 0 (empty cells read as 0).

    ``keys`` rows must be DISTINCT: the probe fan-out is regrouped by
    every ``keys`` column, so duplicate rows collapse to one output row
    (deduplicate upstream or carry a row id if multiplicity matters).
    ``j``/``col`` are reserved by the probe struct and may not appear
    in ``keys`` (round-6 advice: both were silent footguns)."""
    _check_params(w, d)
    clash = {"j", "col"} & set(keys.columns)
    if clash:
        raise ValueError(
            f"keys columns {sorted(clash)} collide with the probe struct "
            "fields; rename them before cms_estimate"
        )
    key = F.col(key_col)
    probes = keys.select(
        *keys.columns,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("j"), _col_j(key, j, w).alias("col")
                    )
                    for j in range(d)
                ]
            )
        ).alias("jc"),
    ).select(*keys.columns, "jc.j", "jc.col")
    return (
        probes.join(F.broadcast(counters), ["j", "col"], "left")
        .groupBy(*keys.columns)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("cms_count"))
    )
