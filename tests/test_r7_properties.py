"""Round-7 property tests: trained-IVF serving, multi-probe cell
ranking, and the nprobe audit — each against a pure-Python reference or
an internal-consistency invariant the operator must satisfy."""

from __future__ import annotations

import pyspark.sql.functions as F

SF = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# lloyd_assign_topn vs a pure-Python (dist, cid) ranking
# ---------------------------------------------------------------------------


def test_lloyd_assign_topn_matches_python_reference(spark):
    """Top-n cell ranking must equal the brute-force python sort of
    integer distances with (dist, cid) tie-breaks — including the ×100
    centroid-grid scaling the Lloyd update uses."""
    from idh_etl_demo_spark.operators.kmeans import (
        CENTROID_GRID,
        lloyd_assign_topn,
    )

    vecs = [(i, [(i * 7 + j * 3) % 11 - 5 for j in range(4)]) for i in range(20)]
    cents = [(c, [((c + 1) * 5 + j) % 9 - 4 for j in range(4)]) for c in range(5)]
    vv = spark.createDataFrame(vecs, "vec_id long, v array<long>")
    cf = spark.createDataFrame(
        [(c, [x * CENTROID_GRID for x in cv]) for c, cv in cents],
        "cid long, cv array<long>",
    )
    got = {
        (r.vec_id, r.cell_rank): r.cluster
        for r in lloyd_assign_topn(vv, cf, 3).collect()
    }
    for i, v in vecs:
        ranked = sorted(
            (
                sum(
                    (x * CENTROID_GRID - c * CENTROID_GRID) ** 2
                    for x, c in zip(v, cv)
                ),
                cid,
            )
            for cid, cv in cents
        )
        for rank, (_, cid) in enumerate(ranked[:3], start=1):
            assert got[(i, rank)] == cid, (i, rank)
    # and n=1 equals the argmin (lloyd_assign's contract)
    from idh_etl_demo_spark.operators.kmeans import lloyd_assign

    one = {r.vec_id: r.cluster for r in lloyd_assign(vv, cf).collect()}
    top1 = {
        r.vec_id: r.cluster
        for r in lloyd_assign_topn(vv, cf, 1).collect()
    }
    assert one == top1


# ---------------------------------------------------------------------------
# multi-probe candidates strictly extend single-probe candidates
# ---------------------------------------------------------------------------


def test_multiprobe_extends_single_probe(spark):
    """The nprobe=2 scored frame restricted to cell_rank=1 IS the
    nprobe=1 scan (shared-frame audit precondition), and the second
    cell contributes real extra candidates for at least one query."""
    from collections import defaultdict

    from idh_etl_demo_spark.catalog_r7 import _ivf_int8_scored_frames

    scored = _ivf_int8_scored_frames(spark, SF, 2).collect()
    by_rank = defaultdict(set)
    for r in scored:
        by_rank[r.cell_rank].add((r.query_id, r.neighbor_id))
    assert by_rank[1], "no rank-1 candidates at all"
    assert by_rank[2], "nprobe=2 never probed a second cell"
    # cells are disjoint → a (query, neighbor) pair appears in exactly
    # one probed cell
    assert not (by_rank[1] & by_rank[2])
    single = {
        (r.query_id, r.neighbor_id)
        for r in _ivf_int8_scored_frames(spark, SF, 1).collect()
    }
    assert single == by_rank[1]


def test_nprobe_audit_internally_consistent(spark):
    """Audit invariants: both depths present, candidate counts strictly
    increase with nprobe, hits bounded by truth and by 5·|queries|, and
    on THIS corpus the second probe buys real recall (non-vacuity: the
    single-probe misses that motivated multi-probe exist and shrink)."""
    from idh_etl_demo_spark.catalog_r7 import embedding_ivf_nprobe_audit

    rows = {r.nprobe: r for r in embedding_ivf_nprobe_audit(spark, SF).collect()}
    assert set(rows) == {1, 2}
    r1, r2 = rows[1], rows[2]
    assert r1.n_truth == r2.n_truth > 0
    assert r2.n_candidates > r1.n_candidates
    for r in (r1, r2):
        assert 0 <= r.n_hits <= r.n_truth
        assert abs(r.recall_at_5 - r.n_hits / r.n_truth) < 1e-12
    # pinned corpus: probing the 2nd trained cell must recover some of
    # the cell-boundary misses (0.42 → 0.67 at sf0.001 as of round 7)
    assert r2.n_hits > r1.n_hits


# ---------------------------------------------------------------------------
# BPE merge training vs a pure-Python reference trainer
# ---------------------------------------------------------------------------


def _ref_bpe(word_counts: dict, n_steps: int):
    """Reference BPE trainer (Sennrich et al. 2016 structure): pair
    counts weighted by word frequency, argmax with (count desc, pair
    asc) ties, left-to-right non-overlapping merge application."""
    from collections import Counter

    syms = {w: [c for c in w] for w in word_counts}
    steps = []
    for _ in range(n_steps):
        pc: Counter = Counter()
        for w, cnt in word_counts.items():
            s = syms[w]
            for i in range(len(s) - 1):
                pc[(s[i], s[i + 1])] += cnt
        best = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        (a, b), c = best
        steps.append((a, b, c))
        for w in syms:
            out: list = []
            for s in syms[w]:
                if out and out[-1] == a and s == b:
                    out[-1] = a + b
                else:
                    out.append(s)
            syms[w] = out
    return steps, syms


def test_bpe_matches_python_reference(spark):
    """The distributed 3-step training run must reproduce the reference
    trainer exactly on the real corpus: same merge table (pairs AND
    counts) and same final segmentation for every word type."""
    import re

    from idh_etl_demo_spark.catalog_r7 import (
        _BPE_STEPS,
        doc_bpe_merge_steps,
        doc_bpe_segmentation,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet").select("text").collect()
    wc: dict = {}
    for r in docs:
        norm = re.sub(r"\s+", " ", r.text.strip().lower())
        for w in norm.split(" "):
            if w:
                wc[w] = wc.get(w, 0) + 1
    ref_steps, ref_syms = _ref_bpe(wc, _BPE_STEPS)
    got_steps = [
        (r.left_sym, r.right_sym, r.pair_count)
        for r in doc_bpe_merge_steps(spark, SF).collect()
    ]
    assert got_steps == ref_steps
    got_seg = {
        r.word: (r.word_count, r.n_symbols, r.segmentation)
        for r in doc_bpe_segmentation(spark, SF).collect()
    }
    assert set(got_seg) == set(wc)
    for w, s in ref_syms.items():
        assert got_seg[w] == (wc[w], len(s), " ".join(s)), w
    # non-vacuity: at least one merge actually changed a segmentation
    assert any(len(s) < len(w) for w, s in ref_syms.items())


def test_bpe_token_counts_match_python_reference(spark):
    """Per-document counts under the trained tokenizer must equal the
    python rerun: n_words = whitespace tokens, n_bpe_tokens = Σ over
    the doc's words of the reference segmentation's symbol count — and
    the trained tokenizer must compress (fewer symbols than characters)
    somewhere while never producing fewer symbols than words."""
    import re

    from idh_etl_demo_spark.catalog_r7 import (
        _BPE_STEPS,
        doc_bpe_token_counts,
    )

    rows = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "text"
    ).collect()
    wc: dict = {}
    doc_words = {}
    for r in rows:
        norm = re.sub(r"\s+", " ", r.text.strip().lower())
        ws = [w for w in norm.split(" ") if w]
        doc_words[r.doc_id] = ws
        for w in ws:
            wc[w] = wc.get(w, 0) + 1
    _, ref_syms = _ref_bpe(wc, _BPE_STEPS)
    got = {
        r.doc_id: (r.n_words, r.n_bpe_tokens)
        for r in doc_bpe_token_counts(spark, SF).collect()
    }
    assert set(got) == set(doc_words)
    compressed = False
    for did, ws in doc_words.items():
        want = (len(ws), sum(len(ref_syms[w]) for w in ws))
        assert got[did] == want, did
        n_chars = sum(len(w) for w in ws)
        assert want[0] <= want[1] <= n_chars
        compressed = compressed or want[1] < n_chars
    assert compressed


def test_semantic_dedup_matches_python_reference(spark):
    """The keep/drop verdicts must equal a brute-force python rerun:
    recompute every in-cluster cosine from the quantized vectors and
    apply the keep-first rule — and the threshold must be non-vacuous
    (some vector dropped, most kept)."""
    import math

    from idh_etl_demo_spark.catalog_r3 import _km_trained_frames
    from idh_etl_demo_spark.catalog_r7 import (
        _SEMDEDUP_THRESHOLD,
        embedding_semantic_dedup,
    )

    assigned = {
        r.vec_id: (list(r.v), r.cluster)
        for r in _km_trained_frames(spark, SF, 4)[0].collect()
    }
    by_cluster: dict = {}
    for vid, (v, c) in assigned.items():
        by_cluster.setdefault(c, []).append((vid, v))
    want = {}
    for c, members in by_cluster.items():
        for vid, v in members:
            dup_of = None
            for uid, u in members:
                if uid >= vid:
                    continue
                dot = sum(x * y for x, y in zip(u, v))
                sim = dot / (
                    math.sqrt(sum(x * x for x in u))
                    * math.sqrt(sum(y * y for y in v))
                )
                if sim >= _SEMDEDUP_THRESHOLD and (
                    dup_of is None or uid < dup_of
                ):
                    dup_of = uid
            want[vid] = (c, dup_of is None, dup_of)
    got = {
        r.vec_id: (r.cluster, r.keep, r.dup_of)
        for r in embedding_semantic_dedup(spark, SF).collect()
    }
    assert got == want
    dropped = sum(1 for _, keep, _ in got.values() if not keep)
    assert 0 < dropped < len(got) // 4  # non-vacuous AND selective


def test_ccnet_buckets_cover_and_order(spark):
    """Tercile invariants: every doc bucketed, bucket sizes differ by
    at most one, and the familiarity ORDER respects the buckets (no
    tail doc more familiar than a head doc)."""
    from idh_etl_demo_spark.catalog_r7 import doc_ccnet_buckets

    rows = doc_ccnet_buckets(spark, SF).collect()
    assert len(rows) == 500
    sizes: dict = {}
    for r in rows:
        sizes[r.bucket] = sizes.get(r.bucket, 0) + 1
    assert set(sizes) == {"head", "middle", "tail"}
    assert max(sizes.values()) - min(sizes.values()) <= 1
    lo_head = min(r.familiarity for r in rows if r.bucket == "head")
    hi_mid = max(r.familiarity for r in rows if r.bucket == "middle")
    lo_mid = min(r.familiarity for r in rows if r.bucket == "middle")
    hi_tail = max(r.familiarity for r in rows if r.bucket == "tail")
    assert lo_head >= hi_mid
    assert lo_mid >= hi_tail


def test_image_ahash_matches_python_reference(spark):
    """The aHash kernel vs a brute-force python rerun on non-trivial
    rasters (bigger than the catalog entry's 1-3 px images), including
    the flat-image edge case (all samples equal the mean → hash 0,
    strict comparison) and hash stability under NN upscaling (the
    perceptual property: a 2× blowup of the same image hashes
    identically because NN sampling lands on the same source pixels)."""
    from idh_etl_demo_spark.operators.multimodal import (
        _ahash_ppm,
        _resize_ppm_nn,
    )

    def ppm(w, h, px):
        return f"P6\n{w} {h}\n255\n".encode() + bytes(px)

    def ref(w, h, px, grid=2):
        samples = []
        for y in range(grid):
            for x in range(grid):
                i = ((y * h // grid) * w + (x * w // grid)) * 3
                samples.extend(px[i : i + 3])
        tot = [sum(samples[c::3]) for c in range(3)]
        bits = 0
        for j, s in enumerate(samples):
            bits = (bits << 1) | (s * grid * grid > tot[j % 3])
        return bits

    import random

    rng = random.Random(7)
    for w, h in [(4, 4), (5, 3), (8, 2), (1, 1), (3, 7)]:
        px = [rng.randrange(256) for _ in range(w * h * 3)]
        payload = ppm(w, h, px)
        assert _ahash_ppm(payload) == (w, h, ref(w, h, px)), (w, h)
    flat = ppm(4, 4, [9] * 48)
    assert _ahash_ppm(flat)[2] == 0
    # perceptual stability: NN 2× upscale samples the same pixels
    px = [rng.randrange(256) for _ in range(4 * 4 * 3)]
    orig = ppm(4, 4, px)
    up = _resize_ppm_nn(orig, 8, 8)
    assert _ahash_ppm(orig)[2] == _ahash_ppm(up)[2]


def test_audio_fingerprint_matches_python_reference(spark):
    """The fingerprint kernel vs a python rerun over synthetic WAVs:
    8-bit and 16-bit paths, the short-clip zero-padding rule, and a
    constant clip (no strict increases → fingerprint 0)."""
    import io
    import struct
    import wave as wavmod

    from idh_etl_demo_spark.operators.multimodal import (
        _audio_fingerprint_wav,
    )

    def wav(width, frames_bytes, nch=1):
        buf = io.BytesIO()
        with wavmod.open(buf, "wb") as w:
            w.setnchannels(nch)
            w.setsampwidth(width)
            w.setframerate(8000)
            w.writeframes(frames_bytes)
        return buf.getvalue()

    import random

    rng = random.Random(11)
    samples = [rng.randrange(256) for _ in range(24)]
    want = 0
    for i in range(15):
        want = (want << 1) | (samples[i + 1] > samples[i])
    assert _audio_fingerprint_wav(wav(1, bytes(samples))) == (24, 1, want)
    # 16-bit: signed samples through the same comparison chain
    s16 = [rng.randrange(-32768, 32768) for _ in range(20)]
    want16 = 0
    for i in range(15):
        want16 = (want16 << 1) | (s16[i + 1] > s16[i])
    got = _audio_fingerprint_wav(wav(2, struct.pack("<20h", *s16)))
    assert got == (20, 2, want16)
    # short clip: transitions beyond the stream are deterministic 0-bits
    short = [10, 250, 20]  # 2 real transitions: up, down
    assert _audio_fingerprint_wav(wav(1, bytes(short)))[2] == 1 << 14
    # constant clip: strict > never fires
    assert _audio_fingerprint_wav(wav(1, bytes([77] * 24)))[2] == 0


def test_passage_decontamination_matches_python_reference(spark):
    """Every contamination verdict must be reproducible in python from
    the (already oracle-gated) chunk table: a corpus doc is contaminated
    iff it shares a ≥16-char chunk hash with the % 11 bench split — and
    the measurement must be non-vacuous (some contaminated, most not)."""
    from idh_etl_demo_spark.catalog_r6 import (
        _CDC_BASE,
        _CDC_MOD,
        _CDC_W,
        doc_cdc_chunks,
    )
    from idh_etl_demo_spark.catalog_r7 import doc_decontamination_passages

    chunks = [
        (r.doc_id, r.chunk_hash)
        for r in doc_cdc_chunks(spark, SF).collect()
        if r.chunk_len >= 16
    ]
    bench = {h for d, h in chunks if d % 11 == 0}
    want_n: dict = {}
    want_hit: dict = {}
    corpus_ids = {
        r.doc_id
        for r in spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id")
        .collect()
        if r.doc_id % 11 != 0
    }
    for d, h in chunks:
        if d % 11 == 0:
            continue
        want_n[d] = want_n.get(d, 0) + 1
        if h in bench:
            want_hit[d] = want_hit.get(d, 0) + 1
    got = {
        r.doc_id: (r.n_chunks, r.n_bench_shared, r.contaminated)
        for r in doc_decontamination_passages(spark, SF).collect()
    }
    assert set(got) == corpus_ids
    for d in corpus_ids:
        want = (want_n.get(d, 0), want_hit.get(d, 0), want_hit.get(d, 0) > 0)
        assert got[d] == want, d
    n_cont = sum(1 for v in got.values() if v[2])
    assert 0 < n_cont < len(got) // 10  # non-vacuous AND selective


def test_video_fingerprint_collision_semantics(spark):
    """The clip signature must collide exactly on SAMPLED content:
    two clips identical at the sampled (even) frames but differing at
    an unsampled (odd) frame share a fingerprint; changing a sampled
    frame splits them. Uses the real AVI writer/demux path."""
    import pyspark.sql.functions as F

    from idh_etl_demo_spark.operators.multimodal import demux_sample_frames
    from tests.test_r6_properties import _avi_bytes

    # 4 frames of 4 bytes; sampled idx 0, 2
    base = [b"AAAA", b"BBBB", b"CCCC", b"DDDD"]
    odd_diff = [b"AAAA", b"XXXX", b"CCCC", b"YYYY"]  # same sampled frames
    even_diff = [b"ZZZZ", b"BBBB", b"CCCC", b"DDDD"]  # sampled frame 0 differs
    media = spark.createDataFrame(
        [
            (1, _avi_bytes(base)),
            (2, _avi_bytes(odd_diff)),
            (3, _avi_bytes(even_diff)),
        ],
        "media_id long, payload binary",
    )
    frames = demux_sample_frames(media, every_k=2)
    per_clip = frames.groupBy("media_id").agg(
        F.md5(
            F.concat_ws(
                "",
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("frame_idx", "frame_md5"))
                    ),
                    lambda s: s["frame_md5"],
                ),
            )
        ).alias("fingerprint")
    )
    fp = {r.media_id: r.fingerprint for r in per_clip.collect()}
    assert fp[1] == fp[2]
    assert fp[1] != fp[3]


def test_bucket_quality_sample_matches_python_reference(spark):
    """Every keep decision must be reproducible from the bucket
    assignment + the seeded md5 uniform in pure python, the head must
    be kept in full, and the realized middle/tail rates must sit near
    their configured 1/2 and 1/8 (binomial tolerance)."""
    import hashlib

    from idh_etl_demo_spark.catalog_r7 import (
        _BUCKET_KEEP_NUM,
        doc_bucket_quality_sample,
        doc_ccnet_buckets,
    )

    buckets = {
        r.doc_id: r.bucket for r in doc_ccnet_buckets(spark, SF).collect()
    }
    kept = {
        r.doc_id: (r.bucket, r.u_sample)
        for r in doc_bucket_quality_sample(spark, SF).collect()
    }
    want = {}
    for did, b in buckets.items():
        u = int(hashlib.md5(f"mix:{did}".encode()).hexdigest()[:8], 16)
        if u < _BUCKET_KEEP_NUM[b]:
            want[did] = (b, u)
    assert kept == want
    n_bucket = {b: 0 for b in _BUCKET_KEEP_NUM}
    n_kept = {b: 0 for b in _BUCKET_KEEP_NUM}
    for did, b in buckets.items():
        n_bucket[b] += 1
        n_kept[b] += did in kept
    assert n_kept["head"] == n_bucket["head"]  # head kept in full
    assert 0.3 < n_kept["middle"] / n_bucket["middle"] < 0.7
    assert 0.02 < n_kept["tail"] / n_bucket["tail"] < 0.30


def test_bpe_merge_fold_random_inputs(spark):
    """Hypothesis sweep: the Spark fold equals the reference
    left-to-right non-overlapping merge for ARBITRARY symbol sequences
    and pairs drawn from a small alphabet (maximizing run/overlap
    collisions), batched through one DataFrame per example set."""
    from hypothesis import given, settings
    from hypothesis import strategies as st
    import pyspark.sql.functions as F

    from idh_etl_demo_spark.catalog_r7 import _bpe_merge_step

    sym = st.sampled_from(["a", "b", "ab", "ba"])
    case = st.tuples(
        st.lists(sym, min_size=1, max_size=8), sym, sym
    )

    def ref_merge(syms, a, b):
        out = []
        for s in syms:
            if out and out[-1] == a and s == b:
                out[-1] = a + b
            else:
                out.append(s)
        return out

    @given(st.lists(case, min_size=1, max_size=6))
    @settings(max_examples=20, deadline=None)
    def run(cases):
        df = spark.createDataFrame(
            cases, "syms array<string>, ba string, bb string"
        )
        got = [
            r.m
            for r in df.select(
                F.aggregate(
                    F.col("syms"),
                    F.array().cast("array<string>"),
                    _bpe_merge_step,
                ).alias("m")
            ).collect()
        ]
        assert got == [ref_merge(s, a, b) for s, a, b in cases]

    run()


def test_bpe_merge_fold_non_overlap(spark):
    """The fold's left-to-right non-overlap semantics on the classic
    adversarial inputs — runs of the merged pair ("aaaa" + (a,a) →
    aa aa; "aaa" → aa a) and interleavings ("abab" + (a,b) → ab ab)."""
    import pyspark.sql.functions as F

    from idh_etl_demo_spark.catalog_r7 import _bpe_merge_step

    cases = [
        ("aaaa", "a", "a", ["aa", "aa"]),
        ("aaa", "a", "a", ["aa", "a"]),
        ("abab", "a", "b", ["ab", "ab"]),
        ("bab", "a", "b", ["b", "ab"]),
        ("xyz", "a", "b", ["x", "y", "z"]),
    ]
    df = spark.createDataFrame(
        [(list(w), a, b) for w, a, b, _ in cases],
        "syms array<string>, ba string, bb string",
    )
    got = df.select(
        F.aggregate(
            F.col("syms"), F.array().cast("array<string>"), _bpe_merge_step
        ).alias("m")
    ).collect()
    assert [r.m for r in got] == [want for *_, want in cases]
