"""Property-based tests for the round-5 training-data operators:

- PII scrub is IDEMPOTENT (placeholders never re-match) and the Spark
  regex behavior matches a pure-Python re reference on arbitrary text;
- overlapping chunking COVERS every token exactly (last chunk reaches
  the end; stitching the non-overlap prefixes + final chunk rebuilds
  the token stream);
- the balanced-sample membership decision reproduces against a
  pure-Python hashlib implementation of the 56-bit md5 prefix
  threshold (cross-implementation check of the conv/substring idiom).
"""

from __future__ import annotations

import hashlib
import re

from hypothesis import given, settings, strategies as st

import pyspark.sql.functions as F

from idh_etl_demo_spark.catalog_r5 import (
    _BAL_TARGET,
    _CHUNK_S,
    _CHUNK_W,
    _HASH56,
    _PII_EMAIL,
    _PII_PHONE,
)

SETTINGS = dict(max_examples=8, deadline=None)

# text that may or may not contain PII-looking fragments
_PII_FRAGMENTS = st.sampled_from(
    [
        "plain words here",
        "a.user+tag@mail-host.example.org",
        "no at sign mail.example.org",
        "+48 123 456 789",
        "555-123-4567",
        "digits 123 456 but short",
        "trailing dot mail@x.co.",
        "<EMAIL>",
        "<PHONE>",
    ]
)


def _py_scrub(text: str) -> str:
    return re.sub(
        _PII_PHONE, "<PHONE>", re.sub(_PII_EMAIL, "<EMAIL>", text)
    )


@settings(**SETTINGS)
@given(st.lists(st.lists(_PII_FRAGMENTS, min_size=1, max_size=6), min_size=1, max_size=20))
def test_pii_scrub_matches_python_and_is_idempotent(spark, batches):
    rows = [(" ".join(frags),) for frags in batches]
    scrub = F.regexp_replace(
        F.regexp_replace(F.col("t"), _PII_EMAIL, "<EMAIL>"), _PII_PHONE, "<PHONE>"
    )
    out = (
        spark.createDataFrame(rows, "t string")
        .select(scrub.alias("once"))
        .select("once", F.regexp_replace(
            F.regexp_replace(F.col("once"), _PII_EMAIL, "<EMAIL>"),
            _PII_PHONE, "<PHONE>").alias("twice"))
        .collect()
    )
    for (t,), r in zip(rows, out):
        assert r.once == _py_scrub(t), f"scrub mismatch on {t!r}"
        assert r.twice == r.once, f"scrub not idempotent on {t!r}"


@settings(**SETTINGS)
@given(st.lists(st.integers(0, 400), min_size=1, max_size=30))
def test_chunking_covers_every_token(spark, lengths):
    rows = [(i, " ".join(f"w{j}" for j in range(n))) for i, n in enumerate(lengths)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    from idh_etl_demo_spark.operators.dedup import normalize_text

    words = F.filter(F.split(normalize_text(F.col("text")), " "), lambda w: w != "")
    k = df.select(
        "doc_id",
        words.alias("words"),
    ).selectExpr(
        "doc_id",
        "words",
        f"1 + greatest(0, (size(words) - {_CHUNK_W} + {_CHUNK_S} - 1) div {_CHUNK_S})"
        " as n_chunks",
    )
    got = {
        (r.doc_id, r.chunk_idx): r.chunk
        for r in k.select(
            "doc_id",
            F.explode(F.sequence(F.lit(0), F.col("n_chunks") - 1)).alias("chunk_idx"),
            F.slice(
                F.col("words"), F.col("chunk_idx") * _CHUNK_S + 1, F.lit(_CHUNK_W)
            ).alias("chunk"),
        ).collect()
    }
    for i, n in enumerate(lengths):
        toks = [f"w{j}" for j in range(n)]
        idxs = sorted(ci for d, ci in got if d == i)
        assert idxs == list(range(len(idxs)))
        # coverage: stitch non-overlap prefixes of all but the last
        # chunk, then the whole last chunk → exactly the token stream
        stitched: list[str] = []
        for ci in idxs[:-1]:
            stitched.extend(got[(i, ci)][:_CHUNK_S])
        stitched.extend(got[(i, idxs[-1])])
        assert stitched == toks, f"doc {i} (n={n}) not exactly covered"


@settings(**SETTINGS)
@given(st.lists(st.tuples(st.integers(0, 10**7), st.integers(1, 200)), min_size=1, max_size=40))
def test_balanced_sample_threshold_matches_hashlib(spark, pairs):
    """The Spark-side conv(substring(md5(doc_id),1,14),16,10) <
    (target*2^56)//n decision must equal a pure-Python hashlib check."""
    rows = [(doc_id, n) for doc_id, n in pairs]
    df = spark.createDataFrame(rows, "doc_id long, stratum_n long")
    hv = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 14), 16, 10
    ).cast("long")
    got = {
        (r.doc_id, r.stratum_n): r.sampled
        for r in df.select(
            "doc_id",
            "stratum_n",
            (hv < F.expr(f"({_BAL_TARGET} * {_HASH56}L) div stratum_n")).alias(
                "sampled"
            ),
        ).collect()
    }
    for doc_id, n in pairs:
        h = int(hashlib.md5(str(doc_id).encode()).hexdigest()[:14], 16)
        assert got[(doc_id, n)] == (h < (_BAL_TARGET * _HASH56) // n), (
            f"threshold decision diverges for doc_id={doc_id}, n={n}"
        )
