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
import idh_etl_demo_spark.catalog_r7  # noqa: F401  (registers entries)
import idh_etl_demo_spark.catalog_r8  # noqa: F401  (registers entries)
import idh_etl_demo_spark.catalog_ztm  # noqa: F401  (registers entries)

SMOKE_SF_DIR = "/root/testdata/sf0.001"

# The driver verifies the FIRST 50 entries of ``queries()`` — with more
# entries than window rows, ordering is a verification-coverage decision.
# Priority: the reference's actual star schema (ztm_*), then the LLM
# training-data-pipeline suite (dedup / similarity / text / multimodal),
# then the most operator-diverse TPC-H entries. Everything not named here
# follows in registration order and is covered by the repo's own
# parametrized DuckDB-oracle sweep (tests/test_catalog_oracle.py).
# ROUND-8 ROTATION (the round-7 verdict's ask #2). Rotating IN:
#  - the six round-7 entries that have never had a driver-green row:
#    doc_bpe_token_counts, doc_bucket_quality_sample,
#    multimodal_image_ahash, multimodal_audio_fingerprint,
#    multimodal_video_fingerprint, doc_decontamination_passages
#  - the four stalest sweep rows (last driver-green r4 or older):
#    doc_simhash, doc_simhash60_neardup, embedding_ann_signbit,
#    doc_dup_triangles (freshness recall, family policy)
#  - the 20 round-7 first-greens for a second hard signal (the r6/r7
#    rotation pattern): the 14 r6-crop entries + the 6 new r7 entries
#  - stale r2-green fills for the remaining slots, each marked
#    DISPLACEABLE — new round-8 entries displace them one-for-one as
#    they land (so every new entry gets first-round driver signal)
# Staying: the ZTM star trio + pricing_summary (permanent core) and
# one streaming representative (doc_streaming_snapshot_curation —
# foreachBatch/watermark has no other driver surface).
# Rotating OUT to the sweep-gated tail, by green count: the 5×-green
# r3 crop whose plans are unchanged this round (doc_corpus_curation,
# doc_incremental_curation, doc_dup_clusters, doc_dup_kcore,
# embedding_ann_ivf, embedding_kmeans_seeded — the trained-quantizer
# chain stays driver-gated through the in-window ivf_int8/multiprobe/
# nprobe entries that compose it verbatim) and the 18 round-6
# first-greens that earned their second signal in r7 (promo_period_
# orders_salted, multimodal_image_ppm, event_props_map,
# user_event_type_map, events_gap_fill, event_type_transitions,
# orders_rolling_30d, price_percentiles_sketch, top2_orders_lateral,
# daily_order_spine_recursive, order_window_bounds,
# user_weekly_retention, suppliers_full_type_coverage,
# priority_yearly_growth, events_hourly_anomalies,
# customer_revenue_pareto, events_distinct_users_hll,
# doc_balanced_sample, doc_oov_rate).
DRIVER_PRIORITY: list[str] = [
    # --- ZTM star schema + flagship (reference: src/queries.py) ---
    "ztm_line_dim",
    "ztm_delay_fact",
    "ztm_weather_dim",
    "pricing_summary",
    # --- streaming representative ---
    "doc_streaming_snapshot_curation",
    # --- round-8 rotation-in: the 6 never-driver-green r7 entries ---
    "doc_bpe_token_counts",
    "doc_bucket_quality_sample",
    "multimodal_image_ahash",
    "multimodal_audio_fingerprint",
    "multimodal_video_fingerprint",
    "doc_decontamination_passages",
    # --- round-8 rotation-in: stalest rows (last green r4 or older) ---
    "doc_simhash",
    "doc_simhash60_neardup",
    "embedding_ann_signbit",
    "doc_dup_triangles",
    # --- round-7 first-greens: second hard signal ---
    "multimodal_audio_wav",
    "multimodal_image_resize",
    "multimodal_video_avi",
    "embedding_int8_quantize",
    "embedding_int8_ann_recall",
    "embedding_ivf_int8_search",
    "doc_importance_weights",
    "doc_dsir_sample",
    "doc_bigram_familiarity",
    "doc_decontamination_bloom",
    "doc_cms_word_counts",
    "doc_cdc_chunks",
    "doc_shared_passages",
    "doc_minhash_estimate_audit",
    "embedding_ivf_multiprobe_search",
    "embedding_ivf_nprobe_audit",
    "doc_bpe_merge_steps",
    "doc_bpe_segmentation",
    "embedding_semantic_dedup",
    "doc_ccnet_buckets",
    # --- event family freshness (minimum 5; stalest members) ---
    "events_hourly_tumbling",
    "events_sliding_3h",
    "event_funnel",
    "event_session_windows",
    "event_props_variant",
    # --- embedding family freshness (minimum 8; r3-red history) ---
    "embedding_centroid_by_label",
    # --- round-8 NEW entries (displaced the first five stale fills:
    # cube_revenue, lineitem_unpivot, orders_running_total,
    # orderkey_distinct_kmv, salted_flag_join) ---
    "embedding_pq_codebooks",
    "embedding_pq_search",
    "embedding_ivfpq_search",
    "doc_bm25_topk",
    "doc_contamination_fraction",
    # --- DISPLACEABLE stale fills (r2-green): further new entries
    # --- displace these one-for-one, top to bottom ---
    "customer_dense_ids",
    "promo_brand_revenue",
    "parts_above_avg_price",
    "lineitem_quarantine_report",
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
