"""Round-10 property tests.

The r9 verdict's ask #2: the repo's own oracle sweep must be able to
catch the class of bug behind doc_unimax_allocation's red driver row —
an integer column on one engine materializing as float on the other
(DuckDB HUGEINT → pandas float64) while every VALUE matches, which the
old tolerant compare passed silently and the driver's typed hash
failed.  These tests pin the strict behavior of tests/compare.py.
"""

from __future__ import annotations

import pandas as pd
import pytest

from tests.compare import assert_frames_equal


def test_compare_rejects_int_vs_float_identical_values():
    """The injected unimax mutation: 140 vs 140.0 must FAIL even though
    math.isclose passes."""
    spark_side = pd.DataFrame({"lang": ["en", "pl"], "allocation": [140, 7]})
    oracle_side = pd.DataFrame({"lang": ["en", "pl"], "allocation": [140.0, 7.0]})
    with pytest.raises(AssertionError, match="dtype kind differs"):
        assert_frames_equal(spark_side, oracle_side)


def test_compare_rejects_object_int_vs_float():
    """Object-dtype columns holding Python ints (how some DuckDB
    results materialize) must still be classified as integer."""
    spark_side = pd.DataFrame({"v": pd.Series([1, 2], dtype="int64")})
    oracle_side = pd.DataFrame({"v": pd.Series([1.0, 2.0], dtype="object")})
    with pytest.raises(AssertionError, match="dtype kind differs"):
        assert_frames_equal(spark_side, oracle_side)


def test_compare_accepts_matching_int_kinds_of_different_width():
    """int32 vs int64 is the SAME kind family — both engines hash as
    integers; width is not the driver's failure mode."""
    a = pd.DataFrame({"v": pd.Series([1, 2], dtype="int32")})
    b = pd.DataFrame({"v": pd.Series([1, 2], dtype="int64")})
    assert_frames_equal(a, b)


def test_compare_accepts_nullable_int_promoted_to_float_on_both_sides():
    """When a nullable int column promotes to float64, it does so in
    BOTH engines (Arrow/pandas null handling) — same kind, passes."""
    a = pd.DataFrame({"v": pd.Series([1.0, None], dtype="float64")})
    b = pd.DataFrame({"v": pd.Series([1.0, None], dtype="float64")})
    assert_frames_equal(a, b)


def test_compare_still_tolerates_float_noise():
    a = pd.DataFrame({"v": [1.0000000000001]})
    b = pd.DataFrame({"v": [1.0]})
    assert_frames_equal(a, b)


# ---------------------------------------------------------------------------
# ExactSubstr removal spans (Lee et al. 2021) — planted-duplicate property
# tests vs a brute-force pure-Python reference
# ---------------------------------------------------------------------------


def _py_exact_substr(docs: dict[int, list[str]], threshold: int):
    """Brute-force reference: m(d,p) by comparing every suffix against
    every other suffix; spans by sort-and-merge interval union."""
    suffixes = [(d, p) for d, toks in docs.items() for p in range(len(toks))]

    def cpl(a, b):
        ta = docs[a[0]][a[1] :]
        tb = docs[b[0]][b[1] :]
        i = 0
        while i < min(len(ta), len(tb)) and ta[i] == tb[i]:
            i += 1
        return i

    m = {
        s: max((cpl(s, t) for t in suffixes if t != s), default=0)
        for s in suffixes
    }
    spans: dict[int, list[tuple[int, int]]] = {}
    removed: dict[int, set[int]] = {}
    for d, toks in docs.items():
        iv = sorted(
            (p, p + m[(d, p)]) for p in range(len(toks)) if m[(d, p)] >= threshold
        )
        merged: list[list[int]] = []
        for s, e in iv:
            if merged and s <= merged[-1][1]:
                merged[-1][1] = max(merged[-1][1], e)
            else:
                merged.append([s, e])
        spans[d] = [(s, e) for s, e in merged]
        removed[d] = {q for s, e in merged for q in range(s, e)}
    return m, spans, removed


def _planted_corpus():
    """Doc 0/1 share an exact 60-token run (≥ the 50 threshold, at
    DIFFERENT offsets); doc 2/3 share a 40-token run (below threshold —
    must survive); all filler tokens are globally unique."""
    run60 = [f"dup{i}" for i in range(60)]
    run40 = [f"sub{i}" for i in range(40)]
    return {
        0: [f"f0x{i}" for i in range(5)] + run60 + [f"f0y{i}" for i in range(4)],
        1: run60 + [f"f1y{i}" for i in range(7)],
        2: [f"f2x{i}" for i in range(3)] + run40 + [f"f2y{i}" for i in range(3)],
        3: [f"f3x{i}" for i in range(6)] + run40,
    }


def _spark_spans_and_coverage(spark, docs, threshold):
    import pyspark.sql.functions as F

    from idh_etl_demo_spark.operators.suffix import (
        covered_positions,
        dup_len_per_position,
        merge_intervals,
        suffix_lcp_adjacent,
        suffix_ranks,
    )

    base = spark.createDataFrame(
        [(d, toks) for d, toks in docs.items()], "doc_id long, toks array<string>"
    )
    final, history, pos = suffix_ranks(base)
    lens = base.select("doc_id", F.size("toks").cast("long").alias("n_tokens"))
    m = dup_len_per_position(suffix_lcp_adjacent(final, history, pos, lens))
    iv = m.filter(F.col("m") >= threshold).select(
        "doc_id", F.col("pos").alias("s"), (F.col("pos") + F.col("m")).alias("e")
    )
    spans = {
        (r.doc_id, r.span_start, r.span_end)
        for r in merge_intervals(iv).collect()
    }
    tok = base.select("doc_id", F.posexplode("toks").alias("pos", "token")).select(
        "doc_id", F.col("pos").cast("long").alias("pos"), "token"
    )
    cov = covered_positions(tok, m, threshold).collect()
    return spans, cov


def test_exact_substr_planted_duplicate(spark):
    """The planted ≥50-token duplicate is removed EXACTLY (span
    boundaries = the planted range, every occurrence, both docs); the
    40-token duplicate survives untouched; coverage matches the
    brute-force reference position for position."""
    docs = _planted_corpus()
    _, py_spans, py_removed = _py_exact_substr(docs, 50)
    spans, cov = _spark_spans_and_coverage(spark, docs, 50)

    want_spans = {
        (d, s, e) for d, sp in py_spans.items() for s, e in sp
    }
    assert spans == want_spans
    # the planted geometry, explicitly: one span per sharing doc,
    # covering the full 60-token run at its offset; nothing in doc 2/3
    assert py_spans[0] == [(5, 65)] and py_spans[1] == [(0, 60)]
    assert py_spans[2] == [] and py_spans[3] == []

    got_removed: dict[int, set[int]] = {d: set() for d in docs}
    for r in cov:
        if r.removed:
            got_removed[r.doc_id].add(r.pos)
    assert got_removed == py_removed
    # cleaned doc 0 keeps exactly its 9 unique filler tokens
    assert len(docs[0]) - len(got_removed[0]) == 9
    # the sub-threshold duplicate is fully kept
    assert got_removed[2] == set() and got_removed[3] == set()


def test_exact_substr_merges_overlapping_runs(spark):
    """Two qualifying duplicated runs that OVERLAP inside one document
    merge into a single maximal span (the paper's maximal-substring
    semantics) — pinned against the brute-force reference."""
    a = [f"a{i}" for i in range(55)]
    b = [f"b{i}" for i in range(55)]
    docs = {
        # doc 0: run A at [0,55), run B at [50,105) — overlap at [50,55)
        0: a + [f"mid{i}" for i in range(0)] + b[5:] ,
        1: a + [f"g1x{i}" for i in range(3)],
        2: b[5:] + [f"g2x{i}" for i in range(3)],
    }
    _, py_spans, py_removed = _py_exact_substr(docs, 50)
    spans, cov = _spark_spans_and_coverage(spark, docs, 50)
    assert spans == {(d, s, e) for d, sp in py_spans.items() for s, e in sp}
    # doc 0 is one contiguous island, not two
    assert len(py_spans[0]) == 1
    got = {d: {r.pos for r in cov if r.doc_id == d and r.removed} for d in docs}
    assert got == py_removed


def test_compare_skips_kind_check_on_all_null_columns():
    """An all-null column is undecidable on either side — the value
    loop still verifies null parity; the kind gate must not false-fire."""
    a = pd.DataFrame({"v": pd.Series([None, None], dtype="object")})
    b = pd.DataFrame({"v": pd.Series([float("nan"), float("nan")], dtype="float64")})
    assert_frames_equal(a, b)
