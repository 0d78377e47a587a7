"""Round-8 additions: size-gated membership semi-join, plus the
round's new operators as they land."""

from __future__ import annotations

import os

import pyspark.sql.functions as F

SF = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


def _physical_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_membership_semi_join_gates_on_key_count(spark):
    """Small key sets broadcast; key sets above the threshold fall back
    to a shuffle semi-join. Both strategies must return identical rows
    (the gate is a physical-plan decision, never a semantic one)."""
    from idh_etl_demo_spark.operators.dedup import membership_semi_join

    left = spark.range(0, 1000).select(
        F.col("id").alias("doc_id"), (F.col("id") % 37).alias("h")
    )
    keys = spark.range(0, 10).select(F.col("id").alias("h"))

    small = membership_semi_join(left, keys, "h")
    assert "BroadcastExchange" in _physical_plan(small)

    forced = membership_semi_join(left, keys, "h", broadcast_max_rows=5)
    assert "BroadcastExchange" not in _physical_plan(forced)

    got_small = sorted(r.doc_id for r in small.collect())
    got_forced = sorted(r.doc_id for r in forced.collect())
    assert got_small == got_forced
    # sanity vs python: doc ids whose id % 37 is in 0..9
    want = sorted(i for i in range(1000) if i % 37 < 10)
    assert got_small == want


def test_membership_semi_join_known_count_skips_job(spark):
    """keys_count short-circuits the gating count: a wrong-side count
    forces the fallback even for a tiny key set (documented contract —
    the caller's knowledge wins), without running any job on keys."""
    from idh_etl_demo_spark.operators.dedup import membership_semi_join

    left = spark.range(0, 100).select(
        F.col("id").alias("doc_id"), (F.col("id") % 7).alias("h")
    )
    keys = spark.range(0, 3).select(F.col("id").alias("h"))
    big = membership_semi_join(
        left, keys, "h", keys_count=10**9
    )
    assert "BroadcastExchange" not in _physical_plan(big)
    assert big.count() == len([i for i in range(100) if i % 7 < 3])


def test_passage_decontam_fallback_matches_broadcast_path(spark):
    """doc_decontamination_passages under a forced shuffle semi-join
    (threshold 0) must reproduce the broadcast-path verdicts row for
    row — the production fallback for a benchmark set too large to
    broadcast is exact, not approximate."""
    import idh_etl_demo_spark.catalog_r7  # noqa: F401  (registers entries)
    from idh_etl_demo_spark.catalog_r6 import _CDC_BASE, _CDC_MOD, _CDC_W
    from idh_etl_demo_spark.catalog import ENTRIES
    from idh_etl_demo_spark.operators.dedup import membership_semi_join
    from idh_etl_demo_spark.operators.text import cdc_chunks_arrow

    docs = spark.read.parquet(os.path.join(SF, "documents.parquet"))

    def long_chunks(side):
        return cdc_chunks_arrow(
            side, window=_CDC_W, boundary_mod=_CDC_MOD, base=_CDC_BASE
        ).filter(F.col("chunk_len") >= 16)

    bench_h = (
        long_chunks(docs.filter(F.col("doc_id") % 11 == 0))
        .select("chunk_hash")
        .distinct()
    )
    corp = long_chunks(docs.filter(F.col("doc_id") % 11 != 0)).select(
        "doc_id", "chunk_hash"
    )
    fallback_hits = (
        membership_semi_join(corp, bench_h, "chunk_hash", broadcast_max_rows=0)
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_bench_shared"))
    )
    got = {r.doc_id: r.n_bench_shared for r in fallback_hits.collect()}

    entry = ENTRIES["doc_decontamination_passages"].spark(spark, SF)
    want = {
        r.doc_id: r.n_bench_shared for r in entry.collect() if r.n_bench_shared
    }
    assert got == want
    assert want, "split must yield real contaminations (non-vacuous gate)"
