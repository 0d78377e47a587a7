"""Planted-twin property tests for the round-14 work.

- The PRODUCTION stored-base SA placement (rank-ladder comparison,
  operators/suffix.extend_delta_states + place_delta_ranks): insertion
  ranks match a pure-Python brute force on adversarial corpora that
  exercise every resolution path — exact-class ties, gap brackets at
  both extremes, past-end pair keys, and the bounded tail-compare loop
  under a stability-exited base build (top level ≪ doc length, every
  class multi-member with identical tails).
- extend_delta_states bracket semantics: an exact state's class content
  equals the delta window, a gap state's neighbors bracket it.
- delta_base_lcp: mixed delta-vs-base LCPs through the extended ladder
  match elementwise token comparison.
"""

from __future__ import annotations

import random

import pyspark.sql.functions as F

import idh_etl_demo_spark.catalog_r11  # noqa: F401  (registers entries)
import idh_etl_demo_spark.catalog_r14  # noqa: F401  (registers entries)
from idh_etl_demo_spark.operators.suffix import (
    extend_delta_states,
    place_delta_ranks,
    suffix_ranks,
)


def _toks_df(spark, rows):
    sdf = spark.createDataFrame(rows, "doc_id long, text string")
    from idh_etl_demo_spark.operators.text import tokens

    return sdf.select("doc_id", tokens(F.col("text")).alias("toks"))


def _brute_ins(base_rows, delta_rows):
    """ins(p) = # base suffixes strictly before the delta suffix under
    (suffix tokens, doc_id, pos) — direct list comparison."""
    base_sufs = []
    for d, text in base_rows:
        t = text.split()
        for p in range(len(t)):
            base_sufs.append((t[p:], d, p))
    want = {}
    for d, text in delta_rows:
        t = text.split()
        for p in range(len(t)):
            key = (t[p:], d, p)
            want[(d, p)] = sum(1 for s in base_sufs if s < key)
    return want


def _check(spark, base_rows, delta_rows):
    base = _toks_df(spark, base_rows).localCheckpoint(eager=True)
    delta = _toks_df(spark, delta_rows).localCheckpoint(eager=True)
    base_final, hist, base_pos = suffix_ranks(base)
    base_lens = base.select(
        "doc_id", F.size("toks").cast("long").alias("n_tokens")
    )
    got = {
        (r.doc_id, r.pos): r.ins
        for r in place_delta_ranks(
            base_final, hist, base_pos, base_lens, delta
        ).collect()
    }
    want = _brute_ins(base_rows, delta_rows)
    assert got == want
    return hist


def test_placement_brute_force_small_vocab(spark):
    """Random small-vocab corpora (heavy prefix collisions): placement
    equals brute force across seeds, including fresh docs, verbatim
    re-crawls, shared-prefix mutants, and unseen-vocabulary docs."""
    rng = random.Random(14)
    for trial in range(3):
        base_rows = [
            (
                i,
                " ".join(
                    f"t{rng.randrange(5)}" for _ in range(rng.randrange(1, 13))
                ),
            )
            for i in range(12)
        ]
        delta_rows = [
            (100, base_rows[3][1]),  # verbatim re-crawl
            (101, base_rows[5][1] + " t1 t0"),  # extended copy
            (102, base_rows[7][1].rsplit(" ", 1)[0] or "t0"),  # prefix cut
            (103, "z9 z8 z7"),  # vocabulary unseen in base → gap chain
            (104, "t0"),  # single token
            (
                105,
                " ".join(
                    f"t{rng.randrange(5)}" for _ in range(rng.randrange(1, 13))
                ),
            ),
        ]
        _check(spark, base_rows, delta_rows)


def test_placement_tail_loop_under_stability_exit(spark):
    """Base = identical 40-token docs with distinct tokens: the seed
    level already separates every distinct suffix content, so the
    build STABILITY-exits with top level 2 ≪ doc length and every
    class holds 3 identical-tail members. Delta re-crawls, extends,
    and mutates mid-document — every ambiguous comparison must run the
    tail-compare loop many rounds and still match brute force."""
    text = " ".join(f"x{j}" for j in range(40))
    base_rows = [(i, text) for i in range(3)]
    mutated = text.split()
    mutated[20] = "x9"  # duplicate of an earlier token, diverges at 20
    delta_rows = [
        (100, text),  # identical → 20-round eq chain → tie-break
        (101, text + " x0"),  # longer than every member → gt late
        (102, " ".join(text.split()[:30])),  # proper prefix → lt late
        (103, " ".join(mutated)),  # diverges deep inside the loop
    ]
    hist = _check(spark, base_rows, delta_rows)
    # the scenario only means something if the exit really fired early
    assert hist[-1][0] < 40, "expected a stability-exited base build"


def test_placement_gap_extremes_and_past_end(spark):
    """Delta suffixes before every base suffix, after every base
    suffix, and pairs whose second block is past-end (short docs);
    plus: the STORED-ARTIFACT path (ladder_artifacts + top_class_frame
    passed in) returns bit-identical insertion ranks to the lazy
    derive-per-call path."""
    from idh_etl_demo_spark.operators.suffix import (
        extend_delta_states,
        ladder_artifacts,
        top_class_frame,
    )

    base_rows = [(0, "b c d e"), (1, "c d"), (2, "d")]
    delta_rows = [
        (100, "a a a a a"),  # strictly before everything at every level
        (101, "z z"),  # strictly after everything
        (102, "b c"),  # past-end second block at level 4 (seen prefix)
        (103, "e"),  # single token, seen
        (104, "b c d e"),  # verbatim re-crawl (tie path)
    ]
    _check(spark, base_rows, delta_rows)
    base = _toks_df(spark, base_rows).localCheckpoint(eager=True)
    delta = _toks_df(spark, delta_rows).localCheckpoint(eager=True)
    bf, hist, bp = suffix_ranks(base)
    blens = base.select(
        "doc_id", F.size("toks").cast("long").alias("n_tokens")
    )
    lazy = {
        (r.doc_id, r.pos): r.ins
        for r in place_delta_ranks(bf, hist, bp, blens, delta).collect()
    }
    arts = ladder_artifacts(hist, bp)
    bf_top = top_class_frame(bf, hist, blens)
    stored = {
        (r.doc_id, r.pos): r.ins
        for r in place_delta_ranks(
            bf,
            hist,
            bp,
            blens,
            delta,
            states=extend_delta_states(hist, bp, delta, artifacts=arts),
            bf_top=bf_top,
        ).collect()
    }
    assert lazy == stored


def test_xsi_stored_base_parity(spark, monkeypatch):
    """The r13 verdict's ask #4: the flag-gated path choice. Both
    routes — combined rebuild (the default below the measured
    break-even) and stored-base update (doc_exact_substr_stored_base)
    — must produce IDENTICAL spans on the probe corpus, and setting
    SPARK_GRAFT_XSI_PATH=stored must actually route the incremental
    entry through the stored-base builder."""
    import pandas as pd

    from idh_etl_demo_spark.catalog import ENTRIES

    sf = "/root/testdata/sf0.001"
    rebuild = (
        ENTRIES["doc_exact_substr_incremental"].spark(spark, sf).toPandas()
    )
    stored = ENTRIES["doc_exact_substr_stored_base"].spark(spark, sf).toPandas()
    pd.testing.assert_frame_equal(rebuild, stored)
    monkeypatch.setenv("SPARK_GRAFT_XSI_PATH", "stored")
    routed = (
        ENTRIES["doc_exact_substr_incremental"].spark(spark, sf).toPandas()
    )
    pd.testing.assert_frame_equal(rebuild, routed)


def test_delta_base_lcp_brute_force(spark):
    """The mixed (delta suffix, base suffix) ladder walk equals
    elementwise token comparison on every cross pair — including long
    identical runs that exercise the repeat-top loop (base stability-
    exits at top level 2 on the identical-docs corpus), boundary-end
    overshoots capped by the tail lengths, and unseen-vocabulary delta
    windows (gap states ⇒ no advance)."""
    from idh_etl_demo_spark.operators.suffix import (
        delta_base_lcp,
        extend_delta_states,
    )

    base_rows = [(0, " ".join(f"x{j}" for j in range(30))),
                 (1, " ".join(f"x{j}" for j in range(30))),
                 (2, "x0 x1 q7 x3")]
    delta_rows = [
        (100, " ".join(f"x{j}" for j in range(30))),  # verbatim run
        (101, " ".join(f"x{j}" for j in range(12)) + " z9"),  # deep split
        (102, "z1 z2"),  # fully unseen
        (103, "x0"),  # single token
    ]
    base = _toks_df(spark, base_rows).localCheckpoint(eager=True)
    delta = _toks_df(spark, delta_rows).localCheckpoint(eager=True)
    _bf, hist, bp = suffix_ranks(base)
    states = extend_delta_states(hist, bp, delta)
    d_pos = delta.select(
        "doc_id", F.posexplode("toks").alias("pos", "token")
    ).select("doc_id", F.col("pos").cast("long").alias("pos"), "token")
    blens = base.select(
        "doc_id", F.size("toks").cast("long").alias("n_tokens")
    )
    dlens = delta.select(
        "doc_id", F.size("toks").cast("long").alias("n_tokens")
    )
    btoks = {d: t.split() for d, t in base_rows}
    dtoks = {d: t.split() for d, t in delta_rows}
    # every (delta position, base position) cross pair
    pairs = []
    for dd, dt in dtoks.items():
        for dp in range(len(dt)):
            for bd, bt in btoks.items():
                for bpp in range(len(bt)):
                    pairs.append((dd, dp, bd, bpp))
    pdf = spark.createDataFrame(
        pairs, "d1 long, p1 long, d2 long, p2 long"
    )
    maxlen = max(
        max(len(t) for t in btoks.values()),
        max(len(t) for t in dtoks.values()),
    )
    got = {
        (r.d1, r.p1, r.d2, r.p2): r.lcp
        for r in delta_base_lcp(
            pdf, states, hist, bp, d_pos, blens, dlens, maxlen
        ).collect()
    }
    for dd, dp, bd, bpp in pairs:
        a, b = dtoks[dd][dp:], btoks[bd][bpp:]
        want = 0
        while want < min(len(a), len(b)) and a[want] == b[want]:
            want += 1
        assert got[(dd, dp, bd, bpp)] == want, (dd, dp, bd, bpp)
    assert hist[-1][0] < 30, "expected a stability-exited base build"


def test_extended_states_bracket_semantics(spark):
    """Top-level states bracket correctly: an exact state's class
    content equals the delta window; a gap state g strictly separates
    class g's content from class g+1's."""
    base_rows = [(0, "a b c d"), (1, "b c"), (2, "c a")]
    delta_rows = [(100, "b d"), (101, "a b c d"), (102, "c")]
    base = _toks_df(spark, base_rows).localCheckpoint(eager=True)
    delta = _toks_df(spark, delta_rows).localCheckpoint(eager=True)
    _final, hist, base_pos = suffix_ranks(base)
    states = extend_delta_states(hist, base_pos, delta)
    top_len, d_top = states[-1]
    h_top = hist[-1][1]
    # base class contents at the top level (end-padded windows)
    btoks = {d: t.split() for d, t in base_rows}
    cls_content = {}
    for r in h_top.collect():
        w = tuple(btoks[r.doc_id][r.pos : r.pos + top_len])
        cls_content.setdefault(r.r, w)
        assert cls_content[r.r] == w, "class id maps to two contents"
    ordered = sorted(cls_content.items())
    assert [c for c, _ in ordered] == list(range(len(ordered)))
    assert [w for _, w in ordered] == sorted(w for _, w in ordered)
    dtoks = {d: t.split() for d, t in delta_rows}
    for r in d_top.collect():
        w = tuple(dtoks[r.doc_id][r.pos : r.pos + top_len])
        if r.e is not None:
            assert cls_content[r.e] == w
        else:
            if r.g >= 0:
                assert cls_content[r.g] < w
            if r.g + 1 in cls_content:
                assert w < cls_content[r.g + 1]
