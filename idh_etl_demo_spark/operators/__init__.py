from idh_etl_demo_spark.operators.mode import mode_per_group
from idh_etl_demo_spark.operators.dedup import (
    dedup_keep_first,
    exact_dedup,
    minhash_lsh_candidates,
    simhash,
    ngram_jaccard_pairs,
)
from idh_etl_demo_spark.operators.merge import merge_insert_if_absent
from idh_etl_demo_spark.operators.similarity import (
    cosine_topk_bruteforce,
    cosine_topk_pandas,
    signbit_bucket_ann,
)
from idh_etl_demo_spark.operators.text import (
    token_count,
    quality_features,
    language_id,
    doc_fingerprint,
)
from idh_etl_demo_spark.operators.asof import asof_join
from idh_etl_demo_spark.operators.skew import salted_join, two_stage_agg

__all__ = [
    "mode_per_group",
    "dedup_keep_first",
    "exact_dedup",
    "minhash_lsh_candidates",
    "simhash",
    "ngram_jaccard_pairs",
    "merge_insert_if_absent",
    "cosine_topk_bruteforce",
    "cosine_topk_pandas",
    "signbit_bucket_ann",
    "token_count",
    "quality_features",
    "language_id",
    "doc_fingerprint",
    "asof_join",
    "salted_join",
    "two_stage_agg",
]
