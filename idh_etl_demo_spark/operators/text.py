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
    # codepoint array computed ONCE per row: substring(text, i, 1) on a
    # UTF8 string is an O(i) boundary seek, which would make the rolling
    # scan quadratic in document length; split-per-char + element_at is
    # O(n) total and the oracle's naive substring definition gates the
    # rewrite as value-identical
    cp = F.transform(F.split(text, ""), lambda c: F.ascii(c).cast("long"))

    def roll(i: Column) -> Column:
        acc = None
        for j, p in enumerate(powers):
            term = F.element_at(F.col("__cp"), i - F.lit(j)) * F.lit(p)
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
        .withColumn("__cp", cp)
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


def cdc_chunks_arrow(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = 8,
    boundary_mod: int = 64,
    base: int = 31,
) -> DataFrame:
    """Vectorized Arrow kernel computing EXACTLY :func:`cdc_chunks`'s
    output (property-tested equal; both gate against the same naive
    oracle). Why it exists: the expression form runs inside higher-order
    functions (transform/filter), which Spark evaluates on the
    INTERPRETED path — ~window multiplies per character through the
    expression interpreter. Here the rolling hash is one numpy
    sliding-window matrix-vector product per document inside
    ``mapInPandas`` (Arrow-batched, partition-local, still map-only) —
    the same O(n·window) arithmetic at SIMD speed. Measured at sf0.1:
    4.7 s (expressions) → well under a second of kernel time.

    The hash positions, boundary rule, and chunk hashing are bit-
    identical to :func:`cdc_chunks` — md5 over the UTF-8 bytes of the
    character slice, codepoint arithmetic in int64."""
    import hashlib

    import numpy as np
    import pandas as pd

    schema = (
        f"{id_col} long, chunk_idx long, start_pos long, "
        "chunk_len long, chunk_hash string"
    )
    # h_i (i = window..n, 1-based) = Σ_j cp[i-1-j]·base^j, j = 0..window-1
    # sliding_window_view row k holds cp[k .. k+window-1] with i = k+window,
    # so the weight vector is reversed: [base^(window-1), ..., base^0]
    weights = np.array(
        [base ** (window - 1 - m) for m in range(window)], dtype=np.int64
    )

    def kernel(batches):
        for pdf in batches:
            ids, idxs, starts_o, lens_o, hashes = [], [], [], [], []
            for did, text in zip(pdf[id_col], pdf[text_col]):
                if not text:
                    continue
                n = len(text)
                if n >= window:
                    cps = np.fromiter(
                        map(ord, text), dtype=np.int64, count=n
                    )
                    h = (
                        np.lib.stride_tricks.sliding_window_view(cps, window)
                        @ weights
                    )
                    cuts = (np.nonzero(h % boundary_mod == 0)[0] + window).tolist()
                else:
                    cuts = []
                ends = cuts if (cuts and cuts[-1] == n) else cuts + [n]
                s = 1
                for idx, e in enumerate(ends):
                    ids.append(did)
                    idxs.append(idx)
                    starts_o.append(s)
                    lens_o.append(e - s + 1)
                    hashes.append(
                        hashlib.md5(text[s - 1 : e].encode("utf-8")).hexdigest()
                    )
                    s = e + 1
            yield pd.DataFrame(
                {
                    id_col: pd.Series(ids, dtype="int64"),
                    "chunk_idx": pd.Series(idxs, dtype="int64"),
                    "start_pos": pd.Series(starts_o, dtype="int64"),
                    "chunk_len": pd.Series(lens_o, dtype="int64"),
                    "chunk_hash": pd.Series(hashes, dtype="object"),
                }
            )

    return df.select(id_col, text_col).mapInPandas(kernel, schema)
