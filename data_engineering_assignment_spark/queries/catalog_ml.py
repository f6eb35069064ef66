"""ML classification query (rows-only check — RandomForest has no SQL
oracle; the driver records row-count/schema stability, unit tests assert
accuracy floors)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tables import load
from . import register


@register(
    "ml_peak_classification",
    oracle=None,  # RF training is not SQL-expressible; gated by tests/test_ml.py
    doc="M1-M7 analog (Assignment-python.py:929-1035): VectorAssembler → "
    "seeded RF → built-in + custom evaluators, one report row per run.",
)
def ml_peak_classification(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..ml import classification_report

    ev = load(spark, sf_dir, "events")
    feats = (
        ev.withColumn("minute_of_day", (F.hour("ts") * 60 + F.minute("ts")).cast("double"))
        .withColumn("dow", F.dayofweek("ts").cast("double"))
        .withColumn(
            "is_peak", F.hour("ts").between(8, 18).cast("int").cast("double")
        )
        .withColumn("hour_of_day", F.hour("ts").cast("double"))
        .select("minute_of_day", "dow", "value", "is_peak", "hour_of_day")
    )
    runs = [
        ("peak_from_time", ["minute_of_day", "dow"], "is_peak", None),
        ("peak_from_value", ["value", "dow"], "is_peak", None),
        ("hour_cyclic", ["minute_of_day", "value"], "hour_of_day", 24),
    ]
    return classification_report(feats, runs, num_trees=10, seed=1)
