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


def test_compare_skips_kind_check_on_all_null_columns():
    """An all-null column is undecidable on either side — the value
    loop still verifies null parity; the kind gate must not false-fire."""
    a = pd.DataFrame({"v": pd.Series([None, None], dtype="object")})
    b = pd.DataFrame({"v": pd.Series([float("nan"), float("nan")], dtype="float64")})
    assert_frames_equal(a, b)
