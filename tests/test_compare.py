"""Unit tests for the oracle-differential comparison harness (compare.py) —
exact equality, the strict tolerance-only-diff-is-still-a-failure rule
(the driver hashes exact values), and hard mismatches. Pure pandas, no
Spark session needed."""

from __future__ import annotations

import pandas as pd

from data_engineering_assignment_spark.compare import compare_frames


def test_exact_match_no_warnings():
    a = pd.DataFrame({"k": [1, 2], "v": [1.5, 2.5]})
    b = pd.DataFrame({"v": [2.5, 1.5], "k": [2, 1]})  # order-insensitive
    res = compare_frames("t", a, b)
    assert res.ok and not res.warnings


def test_float_within_tolerance_fails_strict():
    # The driver hashes EXACT values: a tolerance-only float match must be
    # reported as a rehearsal FAILURE (with the decimal-detour hint), not a
    # warning-pass.
    a = pd.DataFrame({"k": [1], "v": [0.1 + 0.2]})
    b = pd.DataFrame({"k": [1], "v": [0.3]})  # differs by ~5.6e-17
    res = compare_frames("t", a, b)
    assert not res.ok
    assert "ONLY in floats" in res.detail and "decimal detour" in res.detail


def test_float_beyond_tolerance_fails():
    a = pd.DataFrame({"k": [1], "v": [0.3]})
    b = pd.DataFrame({"k": [1], "v": [0.3001]})
    res = compare_frames("t", a, b)
    assert not res.ok


def test_nested_array_tolerance_fails_strict():
    a = pd.DataFrame({"e": [[0.1 + 0.2, 1.0]]})
    b = pd.DataFrame({"e": [[0.3, 1.0]]})
    res = compare_frames("t", a, b)
    assert not res.ok and "ONLY in floats" in res.detail


def test_non_float_mismatch_fails():
    a = pd.DataFrame({"k": ["x"]})
    b = pd.DataFrame({"k": ["y"]})
    assert not compare_frames("t", a, b).ok


def test_row_count_mismatch():
    a = pd.DataFrame({"k": [1, 2]})
    b = pd.DataFrame({"k": [1]})
    res = compare_frames("t", a, b)
    assert not res.ok and "row count" in res.detail
