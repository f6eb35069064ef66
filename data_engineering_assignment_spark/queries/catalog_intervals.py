"""Interval/range-join queries on the driver tables (the Advanced-2 operator
class, SURVEY.md §2.13 J4, exercised where the oracle can gate it)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.intervals import point_in_interval_join
from ..tables import load
from . import register

_SHIP_LAG_ORACLE = """
WITH j AS (
  SELECT o.o_orderkey, COUNT(*) AS n
  FROM orders o
  JOIN lineitem l
    ON l.l_orderkey = o.o_orderkey
   AND l.l_shipdate >= o.o_orderdate
   AND l.l_shipdate <  o.o_orderdate + INTERVAL 30 DAY
  GROUP BY o.o_orderkey
)
SELECT o.o_orderkey, COALESCE(j.n, 0) AS n_items_30d
FROM orders o LEFT JOIN j USING (o_orderkey)
"""


@register(
    "order_ship_lag_30d",
    oracle=_SHIP_LAG_ORACLE,
    doc="J4 analog (Assignment-python.py:554-584): point-in-interval join via "
    "equi key + range condition; per-order count of items shipped within 30 days.",
)
def order_ship_lag_30d(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    points = li.select(
        F.col("l_orderkey").alias("okey"), F.col("l_shipdate").alias("ship_ts")
    )
    intervals = orders.select(
        F.col("o_orderkey").alias("okey"),
        F.col("o_orderdate").alias("win_start"),
        (F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")).alias("win_end"),
    )
    counts = (
        point_in_interval_join(
            points, intervals, on=["okey"], point_col="ship_ts",
            start_col="win_start", end_col="win_end",
        )
        .groupBy("okey")
        .agg(F.count(F.lit(1)).alias("n_items_30d"))
    )
    return (
        orders.select(F.col("o_orderkey"))
        .join(counts.withColumnRenamed("okey", "o_orderkey"), "o_orderkey", "left")
        .fillna({"n_items_30d": 0})
    )


_ASOF_ORACLE = """
WITH p AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
), c AS (
  SELECT user_id, ts, value FROM events WHERE event_type = 'click'
)
SELECT p.event_id AS purchase_id,
       c.value AS last_click_value,
       (epoch_ms(c.ts) // 1000)::BIGINT AS last_click_epoch
FROM p ASOF LEFT JOIN c
  ON p.user_id = c.user_id AND c.ts < p.ts
"""


@register(
    "purchase_asof_last_click",
    oracle=_ASOF_ORACLE,
    doc="As-of join (custom operator — Spark has no native asof plan): each "
    "purchase gets the most recent PRIOR click of the same user, via the "
    "union + running-last window composition; oracle is DuckDB's native "
    "ASOF JOIN.",
)
def purchase_asof_last_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.asof import asof_join

    ev = load(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id", "ts"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        F.col("ts").alias("click_ts"),
        F.col("value").alias("last_click_value"),
        F.unix_timestamp("ts").alias("last_click_epoch"),
    )
    joined = asof_join(
        purchases,
        clicks,
        by="user_id",
        left_ts="ts",
        right_ts="click_ts",
        value_cols=["last_click_value", "last_click_epoch"],
        strict=True,
    )
    return joined.select("purchase_id", "last_click_value", "last_click_epoch")


_ATTRIBUTION_ORACLE = """
WITH p AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
), c AS (
  SELECT user_id, ts FROM events WHERE event_type = 'click'
), j AS (
  SELECT p.event_id, COUNT(*) AS n
  FROM p JOIN c
    ON c.user_id = p.user_id
   AND c.ts >= p.ts - INTERVAL 30 MINUTE
   AND c.ts <  p.ts
  GROUP BY p.event_id
)
SELECT p.event_id AS purchase_id, COALESCE(j.n, 0) AS n_clicks_30m
FROM p LEFT JOIN j USING (event_id)
"""


@register(
    "click_purchase_attribution",
    oracle=_ATTRIBUTION_ORACLE,
    doc="J4 analog, event-time variant: clicks attributed to a purchase if "
    "within the preceding 30 minutes for the same user (equi key + range).",
)
def click_purchase_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("uid"),
        (F.col("ts") - F.expr("INTERVAL 30 MINUTES")).alias("win_start"),
        F.col("ts").alias("win_end"),
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("uid"), F.col("ts").alias("click_ts")
    )
    counts = (
        point_in_interval_join(
            clicks, purchases, on=["uid"], point_col="click_ts",
            start_col="win_start", end_col="win_end",
        )
        .groupBy("purchase_id")
        .agg(F.count(F.lit(1)).alias("n_clicks_30m"))
    )
    return (
        purchases.select("purchase_id")
        .join(counts, "purchase_id", "left")
        .fillna({"n_clicks_30m": 0})
    )
