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


def test_asof_null_value_comes_from_matched_row(spark):
    """A NULL in one value column of the matched right row must be returned
    as NULL — not back-filled from an older right row (DuckDB ASOF JOIN
    returns the matched row's values, NULLs included)."""
    left = spark.createDataFrame(
        [(1, 30.0, "x"), (1, 12.0, "y")], "k bigint, t double, tag string"
    )
    right = spark.createDataFrame(
        [(1, 5.0, 100.0, "old"), (1, 20.0, None, "new")],
        "k bigint, rt double, v double, src string",
    )
    out = {
        r["tag"]: (r["v"], r["src"])
        for r in asof_join(left, right, "k", "t", "rt", ["v", "src"]).collect()
    }
    # t=30 matches rt=20 whose v is NULL: both columns from that one row.
    assert out["x"] == (None, "new")
    # t=12 matches rt=5: the non-null older row, untouched.
    assert out["y"] == (100.0, "old")


def test_asof_matches_pandas_merge_asof(spark):
    """Randomized check against pandas' reference implementation."""
    import random

    import pandas as pd

    rng = random.Random(17)
    left_rows = [
        (rng.randint(1, 3), float(rng.randint(0, 100)), i) for i in range(60)
    ]
    right_rows = [
        (rng.randint(1, 3), float(rng.randint(0, 100)), float(i)) for i in range(40)
    ]
    left = spark.createDataFrame(left_rows, "k bigint, t double, lid bigint")
    right = spark.createDataFrame(right_rows, "k bigint, rt double, v double")
    got = {
        r["lid"]: r["v"]
        for r in asof_join(left, right, "k", "t", "rt", ["v"], strict=False).collect()
    }
    lp = pd.DataFrame(left_rows, columns=["k", "t", "lid"]).sort_values("t", kind="stable")
    rp = (
        pd.DataFrame(right_rows, columns=["k", "rt", "v"])
        .sort_values(["rt", "v"], kind="stable")
        # pandas merge_asof takes the LAST of equal-time rows, as does the
        # running-last window; make ties deterministic the same way
    )
    merged = pd.merge_asof(
        lp, rp, left_on="t", right_on="rt", by="k", allow_exact_matches=True
    )
    want = {int(r.lid): (None if pd.isna(r.v) else float(r.v)) for r in merged.itertuples()}
    assert got == want


def test_pit_scd2_none_state_and_boundary(spark):
    """purchase_prior_state_pit semantics: a purchase whose 1h-earlier
    lookup precedes the user's first event lands in 'none'; a state change
    AT exactly lookup time is visible (strict=False, <=)."""
    from pyspark.sql import functions as F

    from data_engineering_assignment_spark.operators.asof import asof_join

    dim = spark.createDataFrame(
        [(1, "view", 1000), (1, "click", 2000)],
        "user_id long, state string, valid_from long",
    )
    purchases = spark.createDataFrame(
        [(10, 1, 500), (11, 1, 2000), (12, 1, 2001)],
        "event_id long, user_id long, lookup_s long",
    )
    out = asof_join(
        purchases, dim, by="user_id", left_ts="lookup_s",
        right_ts="valid_from", value_cols=["state"], strict=False,
    ).select("event_id", F.coalesce("state", F.lit("none")).alias("s"))
    got = {r.event_id: r.s for r in out.collect()}
    assert got == {10: "none", 11: "click", 12: "click"}
