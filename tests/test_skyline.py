"""Skyline operator: strict-domination semantics on adversarial tiny
frames — the cases the two-phase design exists for — plus a brute-force
property check."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_engineering_assignment_spark.operators.skyline import pareto_max_2d


def _sky(spark, rows, n_buckets=4):
    df = spark.createDataFrame(rows, "k bigint, x double, y bigint")
    out = pareto_max_2d(df, "x", "y", "k", n_buckets=n_buckets)
    return sorted(r.k for r in out.collect())


def _brute(rows):
    keep = []
    for k, x, y in rows:
        dominated = any(
            qx >= x and qy >= y and (qx > x or qy > y)
            for (qk, qx, qy) in rows
            if qk != k
        )
        if not dominated:
            keep.append(k)
    return sorted(keep)


def test_equal_y_higher_x_dominates(spark):
    # (2.0, 5) strictly dominates (1.0, 5): >= both, > on x. This is the
    # case the naive cummax-only filter would miss (phase-2 strict test).
    rows = [(1, 1.0, 5), (2, 2.0, 5)]
    assert _sky(spark, rows) == [2]


def test_equal_x_higher_y_dominates(spark):
    rows = [(1, 2.0, 3), (2, 2.0, 7)]
    assert _sky(spark, rows) == [2]


def test_exact_duplicates_all_survive(spark):
    # duplicates don't dominate each other; both are skyline members
    rows = [(1, 2.0, 5), (2, 2.0, 5), (3, 1.0, 1)]
    assert _sky(spark, rows) == [1, 2]


def test_incomparable_staircase_all_survive(spark):
    rows = [(1, 3.0, 1), (2, 2.0, 2), (3, 1.0, 3)]
    assert _sky(spark, rows) == [1, 2, 3]


def test_matches_brute_force_random(spark):
    import random

    rng = random.Random(7)
    rows = [
        (k, float(rng.randrange(8)), rng.randrange(8)) for k in range(120)
    ]
    assert _sky(spark, rows, n_buckets=8) == _brute(rows)


def test_single_bucket_and_many_buckets_agree(spark):
    import random

    rng = random.Random(11)
    rows = [
        (k, float(rng.randrange(50)), rng.randrange(50)) for k in range(80)
    ]
    assert _sky(spark, rows, n_buckets=1) == _sky(spark, rows, n_buckets=16)
