"""Text analysis for training-data pipelines: token counting, quality
scoring, language identification, document fingerprinting.

All pure column expressions (whole-stage codegen, no Python in the hot
path); every function returns named columns so results are directly
oracle-comparable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
import pyspark.sql.functions as F

from idh_etl_demo_spark.operators.dedup import normalize_text

# Tiny per-language stopword marker lists for the n-gram/stopword-hit
# heuristic. Real pipelines plug in fastText et al. via mapInPandas; the
# Spark-side shape (projection + argmax) is identical.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "it", "for", "with"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "auf", "für"],
    "fr": ["le", "la", "les", "et", "est", "une", "pour", "dans", "que", "des"],
    "es": ["el", "la", "los", "que", "de", "es", "una", "por", "con", "para"],
    "zh": ["的", "是", "在", "了", "和", "有", "我", "不", "这", "个"],
}


def tokens(text: Column) -> Column:
    """Whitespace tokens of the normalized text; empty text → empty array."""
    norm = normalize_text(text)
    return F.when(norm == "", F.array().cast("array<string>")).otherwise(
        F.split(norm, " ")
    )


def token_count(text: Column) -> Column:
    """Whitespace token count."""
    return F.size(tokens(text)).cast("long")


def bpe_ish_token_count(text: Column) -> Column:
    """Sub-word-ish token estimate: count of letter-runs, digit-runs and
    punctuation marks (a cheap, deterministic proxy for BPE vocab size)."""
    cleaned = F.regexp_replace(
        F.lower(text), r"[a-z]+|[0-9]+|[^a-z0-9\s]", "#"
    )
    return (
        F.length(cleaned) - F.length(F.regexp_replace(cleaned, "#", ""))
    ).cast("long")


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach document-quality features: length, token count, mean word
    length, punctuation ratio, stopword ratio, alpha ratio."""
    t = F.col(text_col)
    toks = tokens(t)
    n_tok = F.size(toks)
    n_char = F.length(t)
    punct = n_char - F.length(F.regexp_replace(t, r"[^\w\s]", ""))
    alpha = F.length(F.regexp_replace(F.lower(t), r"[^a-z]", ""))
    stop_hits = F.size(
        F.filter(toks, lambda w: w.isin(*LANG_MARKERS["en"]))
    )
    return df.select(
        "*",
        n_char.cast("long").alias("n_chars_measured"),
        n_tok.cast("long").alias("n_tokens"),
        F.when(n_tok > 0, F.length(F.concat_ws("", toks)) / n_tok)
        .otherwise(F.lit(0.0))
        .alias("mean_word_len"),
        F.when(n_char > 0, punct / n_char).otherwise(F.lit(0.0)).alias("punct_ratio"),
        F.when(n_tok > 0, stop_hits / n_tok).otherwise(F.lit(0.0)).alias("stopword_ratio"),
        F.when(n_char > 0, alpha / n_char).otherwise(F.lit(0.0)).alias("alpha_ratio"),
    )


def language_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Marker-token language scores + argmax label (deterministic ties:
    lexicographically first language code wins)."""
    toks = tokens(F.col(text_col))
    scores = [
        F.size(F.filter(toks, lambda w: w.isin(*markers))).alias(f"score_{lang}")
        for lang, markers in sorted(LANG_MARKERS.items())
    ]
    scored = df.select("*", *scores)
    langs = sorted(LANG_MARKERS)
    best = F.greatest(*[F.col(f"score_{l}") for l in langs])
    label = F.lit("und")
    for l in reversed(langs):  # reversed so earlier langs override on ties
        label = F.when(
            (F.col(f"score_{l}") == best) & (best > 0), F.lit(l)
        ).otherwise(label)
    return scored.withColumn("lang_pred", label)


def doc_fingerprint(text: Column) -> Column:
    """Content fingerprint: md5 of normalized text as a 60-bit integer
    (portable across engines; functions/hashing.py)."""
    return F.conv(
        F.substring(F.md5(normalize_text(text)), 1, 15), 16, 10
    ).cast("long")
