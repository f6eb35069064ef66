"""As-of join semantics tests: backward lookup, strict vs inclusive ties,
missing-prior nulls, key isolation."""

from __future__ import annotations

from data_engineering_assignment_spark.operators.asof import asof_join


def frames(spark):
    left = spark.createDataFrame(
        [(1, 10.0, "a"), (1, 20.0, "b"), (2, 15.0, "c"), (3, 5.0, "d")],
        "k bigint, t double, tag string",
    )
    right = spark.createDataFrame(
        [(1, 5.0, 100.0), (1, 10.0, 200.0), (1, 18.0, 300.0), (2, 1.0, 400.0)],
        "k bigint, rt double, v double",
    )
    return left, right


def test_asof_strict_backward(spark):
    left, right = frames(spark)
    out = {
        r["tag"]: r["v"]
        for r in asof_join(left, right, "k", "t", "rt", ["v"], strict=True).collect()
    }
    # t=10 strictly after rt=5 only (rt=10 not visible when strict)
    assert out == {"a": 100.0, "b": 300.0, "c": 400.0, "d": None}


def test_asof_inclusive_ties(spark):
    left, right = frames(spark)
    out = {
        r["tag"]: r["v"]
        for r in asof_join(left, right, "k", "t", "rt", ["v"], strict=False).collect()
    }
    # rt=10 visible at t=10 when inclusive
    assert out["a"] == 200.0
    assert out["b"] == 300.0


def test_asof_preserves_left_rows(spark):
    left, right = frames(spark)
    out = asof_join(left, right, "k", "t", "rt", ["v"]).collect()
    assert len(out) == 4
    assert set(r["tag"] for r in out) == {"a", "b", "c", "d"}
