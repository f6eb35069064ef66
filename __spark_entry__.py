"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

All real logic lives in the ``data_engineering_assignment_spark`` package;
this module only adapts its query catalog to the driver's shape.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from data_engineering_assignment_spark.queries import load_catalog


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (pricing summary: scan → pushed filter → hash agg)."""
    catalog = load_catalog()
    return catalog["pricing_summary"].build(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: q.build for name, q in load_catalog().items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: q.oracle for name, q in load_catalog().items() if q.oracle is not None
    }
