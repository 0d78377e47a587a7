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
import idh_etl_demo_spark.catalog_ztm  # noqa: F401  (registers entries)

SMOKE_SF_DIR = "/root/testdata/sf0.001"

# The driver verifies the FIRST 50 entries of ``queries()`` — with more
# entries than window rows, ordering is a verification-coverage decision.
# Priority: the reference's actual star schema (ztm_*), then the LLM
# training-data-pipeline suite (dedup / similarity / text / multimodal),
# then the most operator-diverse TPC-H entries. Everything not named here
# follows in registration order and is covered by the repo's own
# parametrized DuckDB-oracle sweep (tests/test_catalog_oracle.py).
DRIVER_PRIORITY: list[str] = [
    # --- ZTM star schema (reference: src/queries.py) ---
    "ztm_line_dim",
    "ztm_vehicle_dim",
    "ztm_stop_dim",
    "ztm_delay_fact",
    "ztm_weather_dim",
    "purchase_view_attribution",
    "rollup_revenue",
    # --- LLM pipeline: dedup chain ---
    "doc_exact_dedup",
    "doc_minhash_candidates",
    "doc_ngram_jaccard",
    "doc_simhash_neardup",
    "doc_dup_clusters",
    # --- LLM pipeline: similarity / embeddings ---
    "embedding_cosine_topk",
    "embedding_ann_hyperplane",
    "embedding_ann_ivf",
    "embedding_near_dup",
    "embedding_dup_clusters",
    "embedding_centroid_by_label",
    "embedding_kmeans_2iter",
    # --- LLM pipeline: text analysis / sketches / multimodal ---
    "doc_lang_id",
    "doc_quality",
    "doc_gopher_quality",
    "doc_fingerprint_tokens",
    "doc_tfidf_topk",
    "doc_vocab_topk",
    "doc_length_histogram",
    "doc_bottomk_sketch",
    # --- LLM pipeline: round-5 training-data ops ---
    "doc_sequence_packing",
    "doc_pii_scrub",
    "doc_lang_mix_weights",
    "doc_chunk_overlap",
    "doc_hash_sample",
    "doc_decontamination",
    "doc_dup_4cliques",
    "doc_ngram_novelty",
    "doc_corpus_curation",
    "doc_incremental_curation",
    "doc_snapshot_dedup",
    "doc_streaming_snapshot_curation",
    "embedding_kcenter_seeds",
    "embedding_ann_audit",
    "embedding_kmeans_seeded",
    "doc_dup_kcore",
    "doc_lsh_audit",
    "multimodal_metadata",
    "multimodal_chunks",
    # --- TPC-H / core operator diversity (4 slots; families dropped to
    # the pytest-gated tail are each represented by a windowed cousin:
    # mode/top-1 windows by ztm_line_dim, sessionization by
    # event_session_windows, hourly buckets by ztm_delay_fact's time dim,
    # sketches by doc_bottomk_sketch; event_funnel and
    # part_name_fuzzy_pairs rotated to the tail in round 4 — both were
    # driver-green in r2/r3 and stay covered by the pytest sweep.
    # Round 5 rotations (all rotated-out entries were driver-green for
    # 2+ rounds and remain sweep-gated; full mapping in COVERAGE.md):
    #  - merge_new_customers → tail, admits doc_streaming_snapshot_
    #    curation (S11 merge stays driver-exercised through that entry,
    #    whose verdict log + snapshot are built by merge_insert_if_absent)
    #  - doc_simhash, doc_simhash60_neardup → tail (family keeps
    #    doc_simhash_neardup in-window), admit doc_sequence_packing +
    #    doc_pii_scrub
    #  - doc_word_histogram → tail (family keeps doc_length_histogram),
    #    admits doc_lang_mix_weights
    #  - embedding_ann_signbit → tail (ANN family keeps hyperplane, IVF
    #    and the audit in-window), admits doc_chunk_overlap
    #  - doc_dup_triangles → tail (graph family keeps clusters, k-core
    #    and 4-cliques in-window), admits events_stateful_running_totals
    #    — the oracle-gated custom stateful operator (§2.8) ---
    "pricing_summary",
    "event_session_windows",
    "revenue_by_nation_scale",
    "events_stateful_running_totals",
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
