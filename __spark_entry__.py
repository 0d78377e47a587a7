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
import idh_etl_demo_spark.catalog_ztm  # noqa: F401  (registers entries)

SMOKE_SF_DIR = "/root/testdata/sf0.001"

# The driver verifies the FIRST 50 entries of ``queries()`` — with more
# entries than window rows, ordering is a verification-coverage decision.
# Priority: the reference's actual star schema (ztm_*), then the LLM
# training-data-pipeline suite (dedup / similarity / text / multimodal),
# then the most operator-diverse TPC-H entries. Everything not named here
# follows in registration order and is covered by the repo's own
# parametrized DuckDB-oracle sweep (tests/test_catalog_oracle.py).
# ROUND-7 ROTATION (the round-6 verdict's ask #1): the 14 round-6
# entries that have never had a driver-green row rotate IN, plus this
# round's new entries. Staying in-window: the three hardest ZTM star
# tables + pricing_summary (the reference's core, permanent), every
# entry whose PLAN changes this round (both curations + the CC
# consumers dup_clusters/dup_kcore — convergence micro-batching;
# embedding_ann_ivf — trained KMeans centroids; embedding_kmeans_seeded
# — now feeds the IVF quantizer), one streaming representative
# (doc_streaming_snapshot_curation — foreachBatch/watermark has no
# other driver surface), and the round-6 first-greens for a second hard
# signal. Rotating OUT to the sweep-gated tail, by green count:
#  - 5-6 greens: rollup_revenue, doc_exact_dedup,
#    doc_minhash_candidates, doc_ngram_jaccard, embedding_cosine_topk,
#    doc_bottomk_sketch (cosine_topk stays the composed truth side of
#    the in-window int8/multiprobe recall audits — its SQL is verified
#    through them verbatim)
#  - 4 greens: doc_simhash_neardup, embedding_ann_audit,
#    doc_gopher_quality, doc_tfidf_topk
#  - 3 greens (r4-r6): doc_snapshot_dedup
#  - 2 greens (r5-r6): doc_sequence_packing, doc_pii_scrub,
#    doc_lang_mix_weights, doc_chunk_overlap,
#    events_stateful_running_totals (stateful op stays pytest-replayed
#    incl. RocksDB; streaming family keeps snapshot curation in-window)
#  - 1 green, superseded by an in-window REAL-decoder sibling:
#    multimodal_frame_sample and multimodal_image_features (fake-path
#    kernels; the real AVI demux `multimodal_video_avi` and the real
#    PPM decoder `multimodal_image_ppm` are the same ops' production
#    forms, and wav/resize keep the family at 5 in-window)
#  - 1 green, family-represented: orders_cumulative_distinct (window
#    family keeps orders_rolling_30d + order_window_bounds +
#    user_weekly_retention) and event_props_variant (props family
#    keeps event_props_map + user_event_type_map) — displaced by the
#    six new round-7 entries, which need first-round driver signal
DRIVER_PRIORITY: list[str] = [
    # --- ZTM star schema + flagship (reference: src/queries.py) ---
    "ztm_line_dim",
    "ztm_delay_fact",
    "ztm_weather_dim",
    "pricing_summary",
    # --- plan changes this round: CC micro-batched convergence ---
    "doc_corpus_curation",
    "doc_incremental_curation",
    "doc_dup_clusters",
    "doc_dup_kcore",
    # --- plan changes this round: trained IVF coarse quantizer ---
    "embedding_ann_ivf",
    "embedding_kmeans_seeded",
    # --- streaming representative ---
    "doc_streaming_snapshot_curation",
    # --- round-7 rotation-in: the 14 never-driver-verified r6 entries ---
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
    # --- round-7 new entries (registered in catalog_r7.py) ---
    "embedding_ivf_multiprobe_search",
    "embedding_ivf_nprobe_audit",
    "doc_bpe_merge_steps",
    "doc_bpe_segmentation",
    "embedding_semantic_dedup",
    "doc_ccnet_buckets",
    # --- round-6 first-greens: second hard signal ---
    "promo_period_orders_salted",
    "multimodal_image_ppm",
    "event_props_map",
    "user_event_type_map",
    "events_gap_fill",
    "event_type_transitions",
    "orders_rolling_30d",
    "price_percentiles_sketch",
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
