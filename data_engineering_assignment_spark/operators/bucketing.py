"""Bucketed-table co-located joins.

For repeated large-×-large joins on a stable key (fact-to-fact, dedup
self-joins, entity resolution), pre-bucketing both sides on the join key
removes the per-query shuffle entirely: Spark's bucketed scan exposes the
hash-partitioning to the planner and SortMergeJoin runs with NO Exchange.
At 100 TB that converts the dominant network cost of every downstream join
into a one-time write cost.

Requires table-backed data (``saveAsTable``) — plain parquet paths do not
carry bucket metadata.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int = 64,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist as a bucketed (and bucket-sorted) parquet table."""
    writer = (
        df.write.mode(mode)
        .format("parquet")
        .bucketBy(n_buckets, *bucket_cols)
    )
    writer = writer.sortBy(*(sort_cols or bucket_cols))
    writer.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: list[str], how: str = "inner"
) -> DataFrame:
    """Join two same-bucketed tables; with matching bucket specs the plan is
    a shuffle-free SortMergeJoin (assert via plans.count_shuffles == 0)."""
    return spark.table(left_table).join(spark.table(right_table), on=on, how=how)
