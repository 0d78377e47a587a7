"""Round-9 property tests: the ADVICE-r8 hardening fixes (NULL-signature
group semantics, BM25 exactness-bound guard, memoized membership gating
count) and the round-9 catalog entries' pure-Python references."""

from __future__ import annotations

import os

import pyspark.sql.functions as F
import pytest

SF = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


# ---------------------------------------------------------------------------
# ADVICE r8 #1: NULL signatures stay out of dedup groups
# ---------------------------------------------------------------------------


def test_null_signature_group_size_is_zero(spark):
    """The consumers' group-size window counts the SIGNATURE column, so
    rows with NULL signatures (missing/undecodable payloads) report
    occupancy 0 instead of pooling into one phantom dedup group —
    window partitioning treats NULLs as one partition, which count(*)
    would have inflated (ADVICE r8)."""
    from pyspark.sql import Window

    from idh_etl_demo_spark.operators.multimodal import image_ahash

    # two identical 1x1 PPMs (a real group of 2) + two missing payloads
    ppm = b"P6\n1 1\n255\nabc"
    media = spark.createDataFrame(
        [(0, ppm), (1, ppm), (2, None), (3, None)],
        "media_id long, payload binary",
    )
    grp = Window.partitionBy("ahash")
    got = {
        r.media_id: (r.ahash, r.n)
        for r in image_ahash(media, grid=2)
        .withColumn("n", F.count("ahash").over(grp))
        .collect()
    }
    assert got[0][0] is not None and got[0] == got[1]
    assert got[0][1] == 2
    assert got[2][0] is None and got[3][0] is None
    assert got[2][1] == 0 and got[3][1] == 0


# ---------------------------------------------------------------------------
# ADVICE r8 #2: the BM25 exactness bound is checked, not assumed
# ---------------------------------------------------------------------------


def _bm25_inputs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, dl long, token string, tf long, df long, s long, n long"
    )


def test_bm25_guard_passes_in_bound_and_matches_python(spark):
    from idh_etl_demo_spark.catalog_r8 import _bm25_term_score

    rows = [(1, 40, "t", 3, 7, 100_000, 1_000)]
    got = (
        _bm25_inputs(spark, rows)
        .select(_bm25_term_score().alias("score"))
        .collect()[0]
        .score
    )
    n, df, tf, s, dl = 1_000, 7, 3, 100_000, 40
    num = (2 * (n - df) + 1) * 22 * tf * s
    den = (2 * df + 1) * (10 * s * tf + 3 * s + 9 * dl * n)
    assert got == num / den


def test_bm25_guard_raises_past_exactness_bound(spark):
    """Operands at 2^52+ would silently wrap in Spark long arithmetic
    long before any 100 TB corpus notices — the guard must raise."""
    from idh_etl_demo_spark.catalog_r8 import _bm25_term_score

    # s ~ 2^40 tokens with tf·(N−df) ~ 2^20 pushes num past 2^52
    rows = [(1, 40, "t", 1024, 7, 1 << 40, 1 << 10)]
    with pytest.raises(Exception, match="bm25 exactness bound"):
        _bm25_inputs(spark, rows).select(
            _bm25_term_score().alias("score")
        ).collect()


# ---------------------------------------------------------------------------
# ADVICE r8 #3: the membership gating count is memoized per key plan
# ---------------------------------------------------------------------------


def test_membership_gating_count_memoized(spark, monkeypatch):
    """A second build over a semantically-identical key set must reuse
    the memoized gating count instead of re-running the key-side job
    (repeated builder constructions paid it per build — ADVICE r8)."""
    from pyspark.sql import DataFrame

    from idh_etl_demo_spark.operators import dedup

    left = spark.range(0, 100).select(
        F.col("id").alias("doc_id"), (F.col("id") % 7).alias("h")
    )

    def keys():
        return spark.range(0, 3).select(F.col("id").alias("h"))

    first = dedup.membership_semi_join(left, keys(), "h")
    memo_key = (spark.sparkContext.applicationId, keys().semanticHash())
    assert dedup._GATING_COUNTS.get(memo_key) == 3

    def boom(self):
        raise AssertionError("gating count re-ran despite memo")

    monkeypatch.setattr(DataFrame, "count", boom)
    second = dedup.membership_semi_join(left, keys(), "h")
    monkeypatch.undo()
    assert sorted(r.doc_id for r in first.collect()) == sorted(
        r.doc_id for r in second.collect()
    )
