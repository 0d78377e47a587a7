"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

The catalog lives in idh_etl_demo_spark/catalog*.py — one entry per
operator family of SURVEY.md §2 plus the training-data-pipeline
operators (dedup / similarity / text analysis / multimodal).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from idh_etl_demo_spark.catalog import ENTRIES
import idh_etl_demo_spark.catalog_llm  # noqa: F401  (registers entries)
import idh_etl_demo_spark.catalog_r3  # noqa: F401  (registers entries)
import idh_etl_demo_spark.catalog_r4  # noqa: F401  (registers entries)
import idh_etl_demo_spark.catalog_r5  # noqa: F401  (registers entries)
import idh_etl_demo_spark.catalog_r6  # noqa: F401  (registers entries)
import idh_etl_demo_spark.catalog_ztm  # noqa: F401  (registers entries)

SMOKE_SF_DIR = "/root/testdata/sf0.001"

# The driver verifies the FIRST 50 entries of ``queries()`` — with more
# entries than window rows, ordering is a verification-coverage decision.
# Priority: the reference's actual star schema (ztm_*), then the LLM
# training-data-pipeline suite (dedup / similarity / text / multimodal),
# then the most operator-diverse TPC-H entries. Everything not named here
# follows in registration order and is covered by the repo's own
# parametrized DuckDB-oracle sweep (tests/test_catalog_oracle.py).
# ROUND-6 ROTATION (the round-5 verdict's ask #2): every entry that had
# NEVER had a driver-green row — 22 names, COVERAGE.md rows marked "—"
# — is now in-window, plus the new real-decoder PPM entry. To make room,
# 24 multi-round-green entries (each driver-green 2+ rounds) rotate to
# the sweep-gated tail under the standing family-representation policy:
#  - ztm_vehicle_dim / ztm_stop_dim → tail (star schema keeps line,
#    delay fact, weather dim in-window; the vehicle regex/trim chain
#    stays sweep-gated)
#  - purchase_view_attribution → tail (window-join family keeps
#    orders_rolling_30d / event_type_transitions in-window)
#  - embedding_{ann_hyperplane, near_dup, dup_clusters,
#    centroid_by_label, kmeans_2iter, kcenter_seeds} → tail (family
#    keeps cosine_topk, ann_ivf, ann_audit, kmeans_seeded)
#  - doc_{lang_id, quality, fingerprint_tokens, vocab_topk,
#    length_histogram} → tail (text family keeps gopher_quality,
#    tfidf_topk, bottomk_sketch + incoming oov_rate/balanced_sample)
#  - doc_{hash_sample, decontamination, ngram_novelty} → tail
#    (sampling family keeps incoming doc_balanced_sample; n-gram family
#    keeps doc_ngram_jaccard)
#  - doc_dup_4cliques / doc_lsh_audit → tail (graph family keeps
#    dup_clusters + dup_kcore; audit family keeps embedding_ann_audit)
#  - multimodal_metadata / multimodal_chunks → tail (family keeps the
#    two value-gated kernels + the new REAL-decoder PPM entry)
#  - event_session_windows / revenue_by_nation_scale → tail (events
#    family keeps gap_fill, type_transitions, hourly_anomalies,
#    stateful_running_totals; scale/skew family keeps
#    promo_period_orders_salted)
# Entries first green only in r5 (sequence_packing, pii_scrub,
# lang_mix_weights, chunk_overlap, streaming_snapshot_curation,
# stateful_running_totals) stay in-window for a second hard signal, as
# do the entries whose plans changed this round (gopher, both
# curations, the CC consumers dup_clusters/dup_kcore).
DRIVER_PRIORITY: list[str] = [
    # --- ZTM star schema (reference: src/queries.py) ---
    "ztm_line_dim",
    "ztm_delay_fact",
    "ztm_weather_dim",
    # --- TPC-H / core flagships ---
    "pricing_summary",
    "rollup_revenue",
    "promo_period_orders_salted",
    # --- LLM pipeline: dedup + graph chain ---
    "doc_exact_dedup",
    "doc_minhash_candidates",
    "doc_ngram_jaccard",
    "doc_simhash_neardup",
    "doc_dup_clusters",
    "doc_dup_kcore",
    # --- LLM pipeline: similarity / embeddings ---
    "embedding_cosine_topk",
    "embedding_ann_ivf",
    "embedding_ann_audit",
    "embedding_kmeans_seeded",
    # --- LLM pipeline: text / sketches ---
    "doc_gopher_quality",
    "doc_tfidf_topk",
    "doc_bottomk_sketch",
    # --- LLM pipeline: curation flagships ---
    "doc_corpus_curation",
    "doc_incremental_curation",
    "doc_snapshot_dedup",
    "doc_streaming_snapshot_curation",
    # --- round-5 training-data ops (first green r5 — keep for a 2nd) ---
    "doc_sequence_packing",
    "doc_pii_scrub",
    "doc_lang_mix_weights",
    "doc_chunk_overlap",
    "events_stateful_running_totals",
    # --- multimodal kernels (incl. the round-6 REAL PPM decoder) ---
    "multimodal_image_features",
    "multimodal_frame_sample",
    "multimodal_image_ppm",
    # --- round-6 rotation-in: the never-driver-verified 19 ---
    "event_props_map",
    "user_event_type_map",
    "events_gap_fill",
    "event_type_transitions",
    "orders_rolling_30d",
    "orders_cumulative_distinct",
    "price_percentiles_sketch",
    "event_props_variant",
    "top2_orders_lateral",
    "daily_order_spine_recursive",
    "order_window_bounds",
    "user_weekly_retention",
    "suppliers_full_type_coverage",
    "priority_yearly_growth",
    "events_hourly_anomalies",
    "customer_revenue_pareto",
    "events_distinct_users_hll",
    "doc_balanced_sample",
    "doc_oov_rate",
]


def _ordered_names() -> list[str]:
    prioritized = [n for n in DRIVER_PRIORITY if n in ENTRIES]
    tail = [n for n in ENTRIES if n not in DRIVER_PRIORITY]
    return prioritized + tail


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return ENTRIES["pricing_summary"].spark(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: ENTRIES[name].spark for name in _ordered_names()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalent for every entry that is
    SQL-expressible (all of them, by construction)."""
    return {
        name: ENTRIES[name].oracle
        for name in _ordered_names()
        if ENTRIES[name].oracle is not None
    }
