"""Bucketed-join test: same-bucketed tables must join with zero shuffles."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_engineering_assignment_spark import plans
from data_engineering_assignment_spark.operators.bucketing import (
    bucketed_join,
    write_bucketed,
)


def test_bucketed_join_is_shuffle_free(spark):
    left = spark.range(0, 10_000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("a")
    )
    right = spark.range(0, 10_000).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("b")
    )
    write_bucketed(left, "bkt_left", ["k"], n_buckets=8)
    write_bucketed(right, "bkt_right", ["k"], n_buckets=8)
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # disable broadcast so the planner must consider the shuffle question
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = bucketed_join(spark, "bkt_left", "bkt_right", on=["k"])
        assert plans.count_shuffles(joined) == 0
        assert "SortMergeJoin" in plans.simple_plan(joined)
        assert joined.count() == 10_000
        # the unbucketed control plan DOES shuffle both sides
        control = left.join(right, "k")
        assert plans.count_shuffles(control) >= 2
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql("DROP TABLE IF EXISTS bkt_left")
        spark.sql("DROP TABLE IF EXISTS bkt_right")
