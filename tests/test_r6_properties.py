"""Property-based tests for the round-6 REAL multimodal kernels:

- PPM synthesize → parse is the IDENTITY on (w, h, maxval, raster) for
  arbitrary geometries and raster bytes (the stdlib parser inverts the
  canonical writer exactly);
- PPM parsing is insensitive to header comments/whitespace noise;
- nearest-neighbor resize emits a VALID PPM whose raster is exactly the
  NN index map of the source (cross-checked against an independent
  Python reference), and identity-geometry resize is a byte-level no-op;
- WAV synthesize → decode roundtrips (rate, channels, frame count) and
  the RMS against a pure-Python reference over the same samples.
"""

from __future__ import annotations

import io
import math
import wave as wavmod

from hypothesis import given, settings, strategies as st

from idh_etl_demo_spark.operators.multimodal import (
    _decode_wav,
    _parse_ppm,
    _resize_ppm_nn,
)


def _ppm_bytes(w: int, h: int, raster: bytes, maxval: int = 255) -> bytes:
    return f"P6\n{w} {h}\n{maxval}\n".encode() + raster


@st.composite
def ppm_images(draw):
    w = draw(st.integers(min_value=1, max_value=8))
    h = draw(st.integers(min_value=1, max_value=8))
    maxval = draw(st.integers(min_value=1, max_value=255))
    raster = draw(
        st.binary(min_size=w * h * 3, max_size=w * h * 3).map(
            # samples must be <= maxval per the spec; clamp preserves size
            lambda b, m=maxval: bytes(min(x, m) for x in b)
        )
    )
    return w, h, maxval, raster


@given(ppm_images())
@settings(max_examples=50, deadline=None)
def test_ppm_parse_inverts_writer(img):
    w, h, maxval, raster = img
    assert _parse_ppm(_ppm_bytes(w, h, raster, maxval)) == (w, h, maxval, raster)


@given(ppm_images(), st.sampled_from([b" ", b"\t", b"\n", b"# noise\n", b"  # x\n\t"]))
@settings(max_examples=50, deadline=None)
def test_ppm_parse_ignores_header_noise(img, noise):
    w, h, maxval, raster = img
    noisy = b"P6" + noise + f"{w}{' '}{h}".encode() + noise + f"\n{maxval}\n".encode() + raster
    assert _parse_ppm(noisy) == (w, h, maxval, raster)


@given(
    ppm_images(),
    st.integers(min_value=1, max_value=6),
    st.integers(min_value=1, max_value=6),
)
@settings(max_examples=50, deadline=None)
def test_ppm_resize_matches_nn_reference(img, out_w, out_h):
    w, h, maxval, raster = img
    out = _resize_ppm_nn(_ppm_bytes(w, h, raster, maxval), out_w, out_h)
    ow, oh, omax, oraster = _parse_ppm(out)  # output is itself valid PPM
    assert (ow, oh, omax) == (out_w, out_h, maxval)
    expected = b"".join(
        raster[((y * h // out_h) * w + (x * w // out_w)) * 3 :][:3]
        for y in range(out_h)
        for x in range(out_w)
    )
    assert oraster == expected


@given(ppm_images())
@settings(max_examples=50, deadline=None)
def test_ppm_resize_identity_geometry_is_noop(img):
    w, h, maxval, raster = img
    src = _ppm_bytes(w, h, raster, maxval)
    assert _resize_ppm_nn(src, w, h) == src


@st.composite
def wav_clips(draw):
    rate = draw(st.sampled_from([8000, 16000, 44100]))
    nch = draw(st.integers(min_value=1, max_value=2))
    nframes = draw(st.integers(min_value=1, max_value=64))
    frames = draw(
        st.binary(min_size=nframes * nch, max_size=nframes * nch)
    )
    return rate, nch, frames


@given(wav_clips())
@settings(max_examples=50, deadline=None)
def test_wav_decode_roundtrips_writer(clip):
    rate, nch, frames = clip
    buf = io.BytesIO()
    with wavmod.open(buf, "wb") as w:
        w.setnchannels(nch)
        w.setsampwidth(1)
        w.setframerate(rate)
        w.writeframes(frames)
    got_rate, got_nch, got_n, got_rms = _decode_wav(buf.getvalue())
    assert (got_rate, got_nch) == (rate, nch)
    assert got_n == len(frames) // nch
    ref = (
        math.sqrt(sum((b - 128) ** 2 for b in frames) / len(frames)) / 128.0
    )
    assert got_rms == ref


# ---------------------------------------------------------------------------
# int8 quantization: Spark expression pipeline vs a pure-Python reference
# ---------------------------------------------------------------------------


def _quantize_ref(vec):
    absmax = max((abs(float(x)) for x in vec), default=0.0)
    scale = absmax / 127.0
    if scale == 0:
        return [0] * len(vec), 0.0, 0.0
    # round half away from zero, matching Spark/DuckDB ROUND
    codes = [
        int(math.floor(abs(x) / scale + 0.5)) * (1 if x >= 0 else -1)
        for x in (float(v) for v in vec)
    ]
    max_err = max(abs(float(x) - q * scale) for x, q in zip(vec, codes))
    return codes, scale, max_err


def test_quantize_int8_matches_reference(spark):
    import struct as _struct

    from idh_etl_demo_spark.operators.similarity import quantize_int8

    # deterministic pseudo-random float32 vectors incl. edge shapes
    vecs = [
        [0.0] * 8,                                  # all-zero → scale 0
        [1.0, -1.0, 0.5, -0.5, 127.0, -127.0, 0.25, 63.5],
        [_struct.unpack("f", _struct.pack("f", (i * 37 % 19) - 9.5))[0]
         for i in range(16)],
        [1e-6, -1e-6, 3.3e-5, -4.4e-5],
    ]
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(vecs)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {
        r.vec_id: r for r in quantize_int8(df, "embedding").collect()
    }
    for i, v in enumerate(vecs):
        # reference sees the same float32-rounded values Spark reads
        v32 = [_struct.unpack("f", _struct.pack("f", x))[0] for x in v]
        codes, scale, max_err = _quantize_ref(v32)
        assert list(got[i].q_int8) == codes, f"vec {i} codes"
        assert got[i].scale == scale, f"vec {i} scale"
        assert got[i].max_abs_err <= scale / 2 + 1e-12, f"vec {i} bound"
        assert all(abs(q) <= 127 for q in codes)


def test_int8_ann_recall_non_vacuous(spark):
    """The quantized-serving audit must measure something: every query
    carries a full 5-row truth set, recall is a valid ratio, and at
    least one truth neighbor survives quantization (an all-zero recall
    column would mean the approx side is broken, not 'low recall')."""
    from idh_etl_demo_spark.catalog_r6 import embedding_int8_ann_recall

    rows = embedding_int8_ann_recall(
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert rows, "no query rows"
    assert all(r.n_truth == 5 for r in rows)
    assert all(0 <= r.n_hits <= 5 for r in rows)
    assert all(abs(r.recall_at_5 - r.n_hits / 5.0) < 1e-12 for r in rows)
    assert any(r.n_hits > 0 for r in rows)


def test_importance_weights_bounds_and_direction(spark):
    """DSIR affinity invariants: target ⊆ corpus forces every per-doc
    score into (0, 1], and the target language must score at least as
    high on average as the rest (directional sanity on the fixed
    sf0.001 corpus)."""
    from idh_etl_demo_spark.catalog_r6 import doc_importance_weights

    rows = doc_importance_weights(spark, "/root/testdata/sf0.001").collect()
    assert rows
    assert all(0 < r.affinity <= 1 for r in rows)
    assert all(r.affinity_num <= r.affinity_den for r in rows)
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    lang = {r.doc_id: r.lang for r in docs.select("doc_id", "lang").collect()}
    en = [r.affinity for r in rows if lang[r.doc_id] == "en"]
    rest = [r.affinity for r in rows if lang[r.doc_id] != "en"]
    assert en and rest
    assert sum(en) / len(en) > sum(rest) / len(rest)


# ---------------------------------------------------------------------------
# bloom runtime filter: no false negatives, real selectivity
# ---------------------------------------------------------------------------


def test_bloom_never_drops_members(spark):
    from idh_etl_demo_spark.operators.bloom import (
        bloom_build,
        bloom_might_contain,
    )
    import pyspark.sql.functions as F

    build = spark.range(500).selectExpr("concat('key-', id) s")
    bf = bloom_build(build, "s", m_bits=4096, k=4)
    probe = spark.range(1500).selectExpr("concat('key-', id) s")
    hit = probe.crossJoin(F.broadcast(bf)).filter(
        bloom_might_contain(F.col("s"), F.col("bf"), 4096, 4)
    )
    # every member passes (bloom guarantees no false negatives)
    assert hit.filter("cast(substring(s, 5) as long) < 500").count() == 500
    # the deliberately-undersized 4096-bit map (500 keys * 4 bits) must
    # still reject most of the 1000 non-members — a vacuous all-pass
    # filter means broken hashing/packing
    assert hit.count() < 1100


def test_bloom_parameter_validation():
    import pytest as _pytest

    from idh_etl_demo_spark.operators.bloom import _positions
    import pyspark.sql.functions as F

    with _pytest.raises(ValueError):
        _positions(F.lit("x"), 1000, 4)  # not a power of two
    with _pytest.raises(ValueError):
        _positions(F.lit("x"), 4096, 9)  # k too large for md5 slices


def test_decontam_bloom_prefilter_selective_and_lossless(spark):
    """The bloom pre-filter must actually filter (candidates << corpus
    grams) and must keep every true hit (result equals the exact
    entry's) — the oracle gate proves the second at sf0.01; this pins
    both locally with the internals exposed."""
    import pyspark.sql.functions as F

    from idh_etl_demo_spark.catalog_r3 import doc_decontamination
    from idh_etl_demo_spark.catalog_r6 import doc_decontamination_bloom
    from idh_etl_demo_spark.operators.bloom import (
        bloom_build,
        bloom_might_contain,
    )
    from idh_etl_demo_spark.operators.dedup import word_shingles

    sf = "/root/testdata/sf0.001"
    exact = doc_decontamination(spark, sf).collect()
    bloomed = doc_decontamination_bloom(spark, sf).collect()
    assert exact == bloomed
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    grams = lambda side: (  # noqa: E731
        side.select("doc_id", word_shingles(F.col("text"), 5).alias("sh"))
        .select(F.explode("sh").alias("s"))
        .select(F.md5("s").alias("gh"))
    )
    bench = grams(docs.filter(F.col("doc_id") % 97 == 0)).distinct()
    corpus = grams(docs.filter(F.col("doc_id") % 97 != 0))
    bf = bloom_build(bench, "gh", m_bits=65536, k=4)
    n_corpus = corpus.count()
    n_candidates = (
        corpus.crossJoin(F.broadcast(bf))
        .filter(bloom_might_contain(F.col("gh"), F.col("bf"), 65536, 4))
        .count()
    )
    # selectivity: the pre-filter must cut the confirm join's input
    assert n_candidates < n_corpus / 2, (n_candidates, n_corpus)


# ---------------------------------------------------------------------------
# count-min sketch: one-sided error, collisions exercised, mergeability
# ---------------------------------------------------------------------------


def test_cms_one_sided_error_and_collisions(spark):
    """Estimates never under-count; the undersized width forces real
    collisions (some estimate strictly over-counts)."""
    import pyspark.sql.functions as F

    from idh_etl_demo_spark.operators.cms import cms_build, cms_estimate

    # 40 keys in a 8-wide sketch → collisions guaranteed; frequencies
    # 1..40 so over-counts are visible
    rows = [(f"k{i}",) for i in range(40) for _ in range(i + 1)]
    df = spark.createDataFrame(rows, "word string")
    truth = df.groupBy("word").agg(F.count(F.lit(1)).alias("true_count"))
    counters = cms_build(df, "word", w=8, d=4)
    est = cms_estimate(truth, counters, "word", w=8, d=4).collect()
    assert all(r.cms_count >= r.true_count for r in est)
    assert any(r.cms_count > r.true_count for r in est)


def test_cms_counter_tables_sum_mergeable(spark):
    """Building one sketch over A∪B equals summing the sketches of A
    and B cell-wise — the property that makes per-partition / per-day
    sketches combinable at scale."""
    import pyspark.sql.functions as F

    from idh_etl_demo_spark.operators.cms import cms_build

    a = spark.createDataFrame([(f"a{i % 7}",) for i in range(50)], "word string")
    b = spark.createDataFrame([(f"b{i % 5}",) for i in range(30)], "word string")
    merged = {
        (r.j, r.col): r.cnt
        for r in cms_build(a.unionAll(b), "word", w=16, d=2).collect()
    }
    summed: dict = {}
    for part in (a, b):
        for r in cms_build(part, "word", w=16, d=2).collect():
            summed[(r.j, r.col)] = summed.get((r.j, r.col), 0) + r.cnt
    assert merged == summed


def test_cms_parameter_validation():
    import pytest as _pytest

    from idh_etl_demo_spark.operators.cms import _check_params

    with _pytest.raises(ValueError):
        _check_params(100, 4)  # w not a power of two
    with _pytest.raises(ValueError):
        _check_params(16, 9)  # d too large for md5 slices


# ---------------------------------------------------------------------------
# content-defined chunking: coverage, contiguity, resynchronization
# ---------------------------------------------------------------------------


def test_cdc_chunks_cover_and_are_contiguous(spark):
    import pyspark.sql.functions as F

    from idh_etl_demo_spark.operators.text import cdc_chunks

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    chunks = cdc_chunks(docs).collect()
    by_doc: dict = {}
    for r in chunks:
        by_doc.setdefault(r.doc_id, []).append(r)
    lens = {r.doc_id: r.n for r in docs.select(
        "doc_id", F.length("text").alias("n")).collect()}
    assert set(by_doc) == {d for d, n in lens.items() if n > 0}
    for d, rows in by_doc.items():
        rows.sort(key=lambda r: r.chunk_idx)
        assert rows[0].start_pos == 1
        assert sum(r.chunk_len for r in rows) == lens[d]
        for prev, cur in zip(rows, rows[1:]):
            assert cur.start_pos == prev.start_pos + prev.chunk_len
    # boundaries genuinely fire: multi-chunk docs exist
    assert any(len(rows) > 1 for rows in by_doc.values())


def test_cdc_resynchronizes_after_prefix(spark):
    """THE content-defined property: prepending bytes shifts every
    fixed-width chunk, but CDC boundaries re-synchronize at the next
    content cut — all chunks after the first shared boundary hash
    identically to the original's."""
    import random

    from idh_etl_demo_spark.operators.text import cdc_chunks

    random.seed(13)
    text = "".join(
        random.choice("abcdefghijklmnopqrstuvwxyz 0123456789")
        for _ in range(2000)
    )
    df = spark.createDataFrame(
        [(0, text), (1, "INSERTED-PREFIX-" + text)], "doc_id long, text string"
    )
    rows = cdc_chunks(df).collect()
    h0 = [r.chunk_hash for r in sorted(
        (r for r in rows if r.doc_id == 0), key=lambda r: r.chunk_idx)]
    h1 = [r.chunk_hash for r in sorted(
        (r for r in rows if r.doc_id == 1), key=lambda r: r.chunk_idx)]
    assert len(h0) > 5, "text too short to exercise resync"
    # every original chunk except (at most) the first survives verbatim
    # in the prefixed document's chunking
    assert set(h0[1:]) <= set(h1)
    # and the shared suffix is the overwhelming majority of the chunks
    assert len(set(h0) & set(h1)) >= len(h0) - 1


def test_cdc_matches_python_reference(spark):
    """The Spark expression pipeline reproduces a transparent Python
    reference implementation exactly (boundary positions, chunk spans,
    hashes) on pseudo-random text."""
    import hashlib
    import random

    from idh_etl_demo_spark.operators.text import cdc_chunks

    random.seed(7)
    texts = [
        "".join(
            random.choice("abcdefghijklmnopqrstuvwxyz 0123456789")
            for _ in range(400)
        )
        for _ in range(3)
    ]

    def ref(text, w=8, mod=64, base=31):
        n = len(text)
        cuts = [
            i
            for i in range(w, n + 1)
            if sum(ord(text[i - 1 - j]) * base**j for j in range(w)) % mod
            == 0
        ]
        ends = cuts if (cuts and cuts[-1] == n) else cuts + [n]
        starts = [1] + [e + 1 for e in ends[:-1]]
        return [
            (idx, s, e - s + 1, hashlib.md5(text[s - 1 : e].encode()).hexdigest())
            for idx, (s, e) in enumerate(zip(starts, ends))
        ]

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = cdc_chunks(df).collect()
    for i, t in enumerate(texts):
        act = sorted(
            (r.chunk_idx, r.start_pos, r.chunk_len, r.chunk_hash)
            for r in got
            if r.doc_id == i
        )
        assert act == ref(t), f"doc {i}"


def test_shared_passages_non_vacuous(spark):
    """Cross-document shared passages must exist on the synthetic
    corpus (it repeats phrases heavily) and every reported row must be
    genuinely cross-document."""
    from idh_etl_demo_spark.catalog_r6 import doc_shared_passages

    rows = doc_shared_passages(spark, "/root/testdata/sf0.001").collect()
    assert rows, "no shared passages found"
    assert all(r.n_docs >= 2 for r in rows)
    assert all(r.n_occurrences >= r.n_docs for r in rows)
    assert all(r.chunk_len >= 16 for r in rows)


def test_cdc_arrow_kernel_matches_expression_form(spark):
    """The vectorized Arrow kernel and the pure-expression form are the
    same operator: identical rows on the real corpus (the kernel is
    what the catalog entries run; the expression form is the
    transparent reference)."""
    from idh_etl_demo_spark.operators.text import cdc_chunks, cdc_chunks_arrow

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    a = cdc_chunks(docs).orderBy("doc_id", "chunk_idx").collect()
    b = cdc_chunks_arrow(docs).orderBy("doc_id", "chunk_idx").collect()
    assert a == b and len(a) > 0


# ---------------------------------------------------------------------------
# DSIR resampling: exact integer acceptance, non-vacuous selection
# ---------------------------------------------------------------------------


def test_dsir_sample_matches_python_bigint_reference(spark):
    """Recompute every accept/reject decision in pure-Python bigints
    (no overflow, no floats) from the weights frame and assert the
    entry keeps EXACTLY that set — the decimal(38,0) cross-multiply in
    the Spark plan must agree with unbounded integer arithmetic."""
    import hashlib

    from idh_etl_demo_spark.catalog_r6 import (
        _DSIR_SAMPLE_C,
        _DSIR_U_SPAN,
        doc_dsir_sample,
        doc_importance_weights,
    )

    sf = "/root/testdata/sf0.001"
    weights = doc_importance_weights(spark, sf).collect()
    expected = set()
    for r in weights:
        u = int(hashlib.md5(f"dsir:{r.doc_id}".encode()).hexdigest()[:8], 16)
        if u * r.affinity_den < _DSIR_SAMPLE_C * _DSIR_U_SPAN * r.affinity_num:
            expected.add(r.doc_id)
    got = {r.doc_id for r in doc_dsir_sample(spark, sf).collect()}
    assert got == expected
    # non-vacuous: the C=2 knob must genuinely split the corpus
    assert 0 < len(got) < len(weights)


# ---------------------------------------------------------------------------
# bigram LM familiarity: integer sums match a pure-Python bigram LM
# ---------------------------------------------------------------------------


def test_bigram_familiarity_matches_python_reference(spark):
    """Train the same corpus bigram LM in pure Python (Counter over the
    same normalization) and assert every document's integer numerator
    and denominator — float-free, order-free — match the Spark plan's."""
    import re
    from collections import Counter

    from idh_etl_demo_spark.catalog_r6 import doc_bigram_familiarity

    sf = "/root/testdata/sf0.001"
    docs = spark.read.parquet(f"{sf}/documents.parquet").collect()
    toks = {
        r.doc_id: [
            w
            for w in re.sub(r"\s+", " ", r.text.strip().lower()).split(" ")
            if w != ""
        ]
        for r in docs
    }
    grams = {
        d: [f"{t[i]} {t[i+1]}" for i in range(len(t) - 1)]
        for d, t in toks.items()
    }
    lm = Counter(g for gs in grams.values() for g in gs)
    rows = doc_bigram_familiarity(spark, sf).collect()
    assert len(rows) == len(docs)
    for r in rows:
        gs = grams[r.doc_id]
        assert r.n_bigrams == len(gs)
        assert r.familiarity_num == sum(lm[g] for g in gs)
    # non-vacuous: scores differ across documents (a constant score
    # would mean the per-doc join degenerated)
    assert len({r.familiarity_num for r in rows}) > 1


# ---------------------------------------------------------------------------
# AVI demuxer: writer/parser roundtrip, alignment, validation
# ---------------------------------------------------------------------------


def _avi_bytes(frames, width=1, height=1, declared=None):
    """Minimal-but-structured AVI writer mirroring the catalog entry's
    synthesis (hdrl with avih + strl, movi with 00db chunks, RIFF pad
    bytes after odd-size chunks)."""
    def le32c(n):
        return bytes([n & 255, (n >> 8) & 255, (n >> 16) & 255, (n >> 24) & 255])

    n = len(frames) if declared is None else declared
    avih = (
        b"avih" + le32c(56) + le32c(40000) + le32c(100) + le32c(0) + le32c(0)
        + le32c(n) + le32c(0) + le32c(1) + le32c(4)
        + le32c(width) + le32c(height) + bytes(16)
    )
    strh = (
        b"strh" + le32c(56) + b"vidsDIB " + le32c(0) * 3 + le32c(1)
        + le32c(25) + le32c(0) + le32c(n) + le32c(4) + le32c(0) + le32c(0)
        + bytes([0, 0, 0, 0, 1, 0, 1, 0])
    )
    strf = (
        b"strf" + le32c(40) + le32c(40) + le32c(width) + le32c(height)
        + bytes([1, 0, 32, 0]) + le32c(0) + le32c(4) + le32c(0) * 4
    )
    strl = b"LIST" + le32c(4 + len(strh) + len(strf)) + b"strl" + strh + strf
    hdrl = b"LIST" + le32c(4 + len(avih) + len(strl)) + b"hdrl" + avih + strl
    fchunks = b"".join(
        b"00db" + le32c(len(fb)) + fb + (b"\x00" if len(fb) % 2 else b"")
        for fb in frames
    )
    movi = b"LIST" + le32c(4 + len(fchunks)) + b"movi" + fchunks
    body = b"AVI " + hdrl + movi
    return b"RIFF" + le32c(len(body)) + body


@given(
    st.lists(st.binary(min_size=1, max_size=9), min_size=1, max_size=6),
    st.integers(min_value=1, max_value=64),
    st.integers(min_value=1, max_value=64),
)
@settings(max_examples=50, deadline=None)
def test_avi_parse_inverts_writer(frames, width, height):
    """Roundtrip for arbitrary frame counts/sizes — ODD frame sizes
    exercise the RIFF word-alignment pad byte the walker must skip."""
    from idh_etl_demo_spark.operators.multimodal import _parse_avi

    assert _parse_avi(_avi_bytes(frames, width, height)) == (
        width, height, len(frames), frames,
    )


def test_avi_parser_rejects_malformed():
    import pytest as _pytest

    from idh_etl_demo_spark.operators.multimodal import _parse_avi

    good = _avi_bytes([b"abcd", b"efgh"])
    with _pytest.raises(ValueError, match="not a RIFF/AVI"):
        _parse_avi(b"RIFX" + good[4:])
    with _pytest.raises(ValueError, match="RIFF size"):
        _parse_avi(good[:-2])  # truncation breaks the declared size
    with _pytest.raises(ValueError, match="frame count mismatch"):
        _parse_avi(_avi_bytes([b"abcd", b"efgh"], declared=3))
    with _pytest.raises(ValueError, match="overruns"):
        # corrupt a frame chunk's size field to point past its parent
        bad = bytearray(_avi_bytes([b"abcd"]))
        idx = bad.index(b"00db") + 4
        bad[idx:idx + 4] = bytes([255, 0, 0, 0])
        _parse_avi(bytes(bad))


def test_avi_demux_spark_path(spark):
    """The mapInPandas fan-out: 1 payload row → ceil(n/k) frame rows
    with parsed indices and exact frame hashes."""
    import hashlib

    from idh_etl_demo_spark.operators.multimodal import demux_sample_frames

    frames = [b"aaaa", b"bbbb", b"cccc", b"dddd", b"eeee"]
    df = spark.createDataFrame(
        [(7, _avi_bytes(frames))], "media_id long, payload binary"
    )
    rows = demux_sample_frames(df, every_k=2).orderBy("frame_idx").collect()
    assert [(r.frame_idx, r.n_frames) for r in rows] == [(0, 5), (2, 5), (4, 5)]
    assert [r.frame_md5 for r in rows] == [
        hashlib.md5(frames[i]).hexdigest() for i in (0, 2, 4)
    ]


# ---------------------------------------------------------------------------
# IVF+int8 serving composition: shape + consistency with its two halves
# ---------------------------------------------------------------------------


def test_ivf_int8_search_composes_consistently(spark):
    """The composed serving entry must agree with its halves: same
    query set and same cell restriction as the float IVF entry (the
    coarse quantizer is shared), contiguous ranks ≤ 5, sims in
    [-1, 1]."""
    from collections import defaultdict

    from idh_etl_demo_spark.catalog_r6 import embedding_ivf_int8_search
    from idh_etl_demo_spark.catalog_r7 import embedding_ann_ivf

    sf = "/root/testdata/sf0.001"
    got = embedding_ivf_int8_search(spark, sf).collect()
    assert got
    by_q = defaultdict(list)
    for r in got:
        assert -1.0 - 1e-9 <= r.int8_cosine <= 1.0 + 1e-9
        by_q[r.query_id].append(r.rank)
    for q, ranks in by_q.items():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))
        assert len(ranks) <= 5
    ref = embedding_ann_ivf(spark, sf).collect()
    ref_by_q = defaultdict(set)
    for r in ref:
        ref_by_q[r.query_id].add(r.neighbor_id)
    # identical query universe and cell candidate pools → identical
    # result-set SIZES per query (ranking may differ, membership pool
    # may not)
    assert set(by_q) == set(ref_by_q)
    for q in by_q:
        assert len(by_q[q]) == len(ref_by_q[q])


# ---------------------------------------------------------------------------
# MinHash estimator audit: banding theorem + estimator sanity
# ---------------------------------------------------------------------------


def test_minhash_estimate_audit_banding_invariant(spark):
    """Every candidate pair exists BECAUSE a full 3-row band collided,
    so its signature agreement must be >= 3/12 — a row below that
    proves the banding broken. Also pins estimator sanity: both ratios
    in [0, 1], and the estimate is not vacuously equal to the exact
    value on every row (k=12 resolution is coarser than true Jaccard)."""
    from idh_etl_demo_spark.catalog_r6 import doc_minhash_estimate_audit

    rows = doc_minhash_estimate_audit(spark, "/root/testdata/sf0.001").collect()
    assert rows
    for r in rows:
        assert r.n_agree >= 3, f"pair ({r.id_a},{r.id_b}) agrees on {r.n_agree} < 3"
        assert 0.0 <= r.est_jaccard <= 1.0
        assert 0.0 <= r.exact_jaccard <= 1.0
        assert r.inter_size <= r.union_size
    assert any(r.abs_err > 0 for r in rows)
