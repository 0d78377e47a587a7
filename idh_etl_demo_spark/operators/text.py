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


def cdc_chunks(
    df: DataFrame,
    text_col: str = "text",
    id_cols: tuple = ("doc_id",),
    window: int = 8,
    boundary_mod: int = 64,
    base: int = 31,
) -> DataFrame:
    """Content-defined chunking — rolling-hash boundaries instead of
    fixed offsets, the sub-document dedup primitive (storage dedup,
    near-dup region detection inside long documents): a cut is placed
    after position i whenever the polynomial hash of the trailing
    ``window`` characters ≡ 0 (mod ``boundary_mod``), so boundaries are
    a function of CONTENT — after an insertion/prefix shift, chunking
    re-synchronizes at the next boundary and all later chunks hash
    identically (the property fixed-width chunking lacks; pinned by
    tests/test_r6_properties.py::test_cdc_resynchronizes_after_prefix).

    Output: one row per chunk — id_cols + (chunk_idx, start_pos,
    chunk_len, chunk_hash), contiguous and covering (Σ chunk_len =
    length(text); empty text yields no rows). Expected chunk size ≈
    ``boundary_mod`` chars.

    Everything is exact integer arithmetic on code points (max
    codepoint·baseʷ⁻¹·window ≪ 2⁶³) over character-indexed substrings —
    identical in any engine, so oracles can gate the chunk hashes
    directly. Scale shape: pure per-row array expressions + one
    explode — map-only, no shuffle, O(n·window) work per document."""
    text = F.col(text_col)
    n = F.length(text)
    powers = [base**j for j in range(window)]

    def roll(i: Column) -> Column:
        acc = None
        for j, p in enumerate(powers):
            term = F.ascii(F.substr(text, i - F.lit(j), F.lit(1))).cast(
                "long"
            ) * F.lit(p)
            acc = term if acc is None else acc + term
        return acc

    cuts = F.when(
        n >= window,
        F.filter(
            F.sequence(F.lit(window), n),
            lambda i: roll(i) % boundary_mod == 0,
        ),
    ).otherwise(F.array().cast("array<int>"))
    ends = F.when(
        (F.size(cuts) > 0) & (F.element_at(cuts, -1) == n), cuts
    ).otherwise(F.concat(cuts, F.array(n)))
    starts = F.concat(
        F.array(F.lit(1)),
        F.transform(F.slice(ends, 1, F.size(ends) - 1), lambda e: e + 1),
    )
    pairs = F.zip_with(
        starts, ends, lambda s, e: F.struct(s.alias("s"), e.alias("e"))
    )
    chunk_len = F.col("se.e") - F.col("se.s") + 1
    return (
        df.filter(n > 0)
        .select(*id_cols, text.alias("__t"), F.posexplode(pairs))
        .select(
            *id_cols,
            F.col("pos").cast("long").alias("chunk_idx"),
            F.col("col").alias("se"),
            F.col("__t"),
        )
        .select(
            *id_cols,
            "chunk_idx",
            F.col("se.s").cast("long").alias("start_pos"),
            chunk_len.cast("long").alias("chunk_len"),
            F.md5(F.substr(F.col("__t"), F.col("se.s"), chunk_len)).alias(
                "chunk_hash"
            ),
        )
    )
