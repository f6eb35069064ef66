"""Interval/range-join queries on the driver tables (the Advanced-2 operator
class, SURVEY.md §2.13 J4, exercised where the oracle can gate it)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
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


_PLUSMINUS_ORACLE = """
WITH src AS (
  SELECT o_orderkey AS k, o_custkey AS c FROM orders WHERE o_orderkey % 97 = 0
), m AS (
  SELECT k, c % 20 AS ht, (c % 20 + 7) % 20 AS att, 2700 + k % 300 AS h2,
         40 + k % 10 AS m1, 60 + k % 25 AS m2, 50 + k % 30 AS m3
  FROM src
), ml AS (
  SELECT k, 45 + CAST(CEIL(h2 / 60.0) AS BIGINT) AS mlen FROM m
), iv0 AS (
  SELECT m.k, 100 * ht + j.j AS pid, 'h' AS side, 0 AS on_min,
         CASE j.j WHEN 1 THEN m1 WHEN 2 THEN m2 END AS out_min
  FROM m, (SELECT unnest(range(1, 12)) AS j) j
  UNION ALL SELECT k, 100 * ht + 12, 'h', m1, NULL FROM m
  UNION ALL SELECT k, 100 * ht + 13, 'h', m2, NULL FROM m
  UNION ALL
  SELECT m.k, 100 * att + j.j, 'a', 0, CASE j.j WHEN 3 THEN m3 END
  FROM m, (SELECT unnest(range(1, 12)) AS j) j
  UNION ALL SELECT k, 100 * att + 12, 'a', m3, NULL FROM m
), iv AS (
  SELECT iv0.k, pid, side, on_min, COALESCE(out_min, mlen) AS off_min,
         CASE WHEN on_min < 45 THEN on_min * 60
              ELSE 100000 + (on_min - 45) * 60 END AS on_code,
         CASE WHEN out_min IS NULL THEN 200000
              WHEN out_min < 45 THEN out_min * 60
              ELSE 100000 + (out_min - 45) * 60 END AS off_code
  FROM iv0 JOIN ml ON ml.k = iv0.k
), goals AS (
  SELECT k, CASE WHEN k % 2 = 0 THEN 'a' ELSE 'h' END AS scoring_side,
         600 + (k * 13) % 2400 AS gcode
  FROM m
  UNION ALL
  SELECT k, CASE WHEN k % 3 = 0 THEN 'h' ELSE 'a' END,
         100000 + (k * 29) % h2
  FROM m WHERE k % 5 <> 0
), pm AS (
  SELECT pid, SUM(CASE WHEN g.scoring_side = i.side THEN 1 ELSE -1 END) AS pm
  FROM goals g
  JOIN iv i ON g.k = i.k AND i.on_code <= g.gcode AND g.gcode < i.off_code
  GROUP BY pid
), mins AS (
  SELECT pid, SUM(off_min - on_min) AS minutes FROM iv GROUP BY pid
)
SELECT mins.pid AS playerId,
       CASE WHEN mins.pid % 100 = 1 THEN 'Goalkeeper'
            WHEN mins.pid % 100 <= 5 THEN 'Defender'
            WHEN mins.pid % 100 <= 9 THEN 'Midfielder'
            ELSE 'Forward' END AS role,
       CAST(mins.minutes AS INT) AS minutes,
       CAST(COALESCE(pm.pm, 0) AS INT) AS plusMinus
FROM mins LEFT JOIN pm ON pm.pid = mins.pid
"""


def _synth_football(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    """Deterministic MATCH_SCHEMA-shaped matches + goal/length events derived
    from orders arithmetic (shared by the two plus-minus gates; every
    constant here is mirrored in the SQL oracles)."""
    orders = load(spark, sf_dir, "orders")
    src = orders.filter(F.col("o_orderkey") % 97 == 0).select(
        F.col("o_orderkey").alias("k"), F.col("o_custkey").alias("c")
    )
    m = src.select(
        "k",
        (F.col("c") % 20).alias("ht"),
        ((F.col("c") % 20 + 7) % 20).alias("at"),
        (F.lit(2700) + F.col("k") % 300).alias("h2"),
    )
    k, ht, at = F.col("k"), F.col("ht"), F.col("at")
    m1, m2, m3 = F.lit(40) + k % 10, F.lit(60) + k % 25, F.lit(50) + k % 30

    def team_name(t):
        return F.concat(F.lit("T"), t.cast("string"))

    def sub_struct(pin, pout, minute):
        return F.struct(
            pin.cast("long").alias("playerIn"),
            pout.cast("long").alias("playerOut"),
            minute.cast("long").alias("minute"),
        )

    def null_sub():
        n = F.lit(None).cast("long")
        return F.struct(
            n.alias("playerIn"), n.alias("playerOut"), n.alias("minute")
        )

    def lineup(t):
        return F.transform(
            F.sequence(F.lit(1), F.lit(11)), lambda j: (t * 100 + j).cast("long")
        )

    matches = m.select(
        k.alias("matchId"),
        F.lit("2017-2018").alias("season"),
        F.struct(
            team_name(ht).alias("team"),
            lineup(ht).alias("lineup"),
            sub_struct(ht * 100 + 12, ht * 100 + 1, m1).alias("substitution1"),
            sub_struct(ht * 100 + 13, ht * 100 + 2, m2).alias("substitution2"),
            null_sub().alias("substitution3"),
        ).alias("homeTeamData"),
        F.struct(
            team_name(at).alias("team"),
            lineup(at).alias("lineup"),
            sub_struct(at * 100 + 12, at * 100 + 3, m3).alias("substitution1"),
            null_sub().alias("substitution2"),
            null_sub().alias("substitution3"),
        ).alias("awayTeamData"),
    )
    home_n, away_n = team_name(ht), team_name(at)

    def ev_frame(frame, event, team_col, period, time_col, tags):
        return frame.select(
            k.alias("matchId"),
            home_n.alias("homeTeam"),
            away_n.alias("awayTeam"),
            F.lit(event).alias("event"),
            team_col.alias("eventTeam"),
            F.lit(period).alias("eventPeriod"),
            time_col.cast("double").alias("eventTime"),
            tags.alias("tags"),
        )

    no_tags = F.array().cast("array<string>")
    goal_tag = F.array(F.lit("Goal"))
    length_ev = ev_frame(m, "Pass", home_n, "2H", F.col("h2"), no_tags)
    # eventTeam is the KEEPER's team (the conceding side, Basic-2 semantics)
    g1 = ev_frame(
        m, "Save attempt", F.when(k % 2 == 0, home_n).otherwise(away_n),
        "1H", F.lit(600) + (k * 13) % 2400, goal_tag,
    )
    g2 = ev_frame(
        m.filter(k % 5 != 0), "Save attempt",
        F.when(k % 3 == 0, away_n).otherwise(home_n),
        "2H", (k * 29) % F.col("h2"), goal_tag,
    )
    events = length_ev.unionByName(g1).unionByName(g2)
    return matches, events


def _role_of(pid: F.Column) -> F.Column:
    j = pid % 100
    return (
        F.when(j == 1, "Goalkeeper")
        .when(j <= 5, "Defender")
        .when(j <= 9, "Midfielder")
        .otherwise("Forward")
    )


@register(
    "plusminus_player_stats",
    oracle=_PLUSMINUS_ORACLE,
    doc="SURVEY.md 2.13 Advanced-2 plus-minus pipeline end-to-end "
    "(Assignment-python.py:544-584), driver-gated: matches (lineup arrays, "
    "3-substitution structs with start-of-minute semantics straddling "
    "half-time), events (2H-derived match length, 1H-additional-time goals) "
    "are synthesized deterministically from orders arithmetic, then the "
    "REAL pipeline runs: pipelines/plusminus.player_intervals (struct "
    "access, explode, interval construction) + minutes_played + plus_minus "
    "(point-in-interval goal attribution). The oracle re-derives the same "
    "arithmetic relationally. Scale: the goal join is a per-match equi-join "
    "with constant fan-out; no forced broadcasts of SF-scaled frames.",
)
def plusminus_player_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..pipelines.plusminus import minutes_played, player_intervals, plus_minus

    matches, events = _synth_football(spark, sf_dir)
    intervals = player_intervals(matches, events)
    mins = minutes_played(intervals)
    pm = plus_minus(intervals, events)
    return (
        mins.join(pm, "playerId", "left")
        .fillna({"plusMinus": 0})
        .select(
            "playerId",
            _role_of(F.col("playerId")).alias("role"),
            "minutes",
            "plusMinus",
        )
    )


_TOP_ROLE_ORACLE = """
WITH src AS (
  SELECT o_orderkey AS k, o_custkey AS c FROM orders WHERE o_orderkey % 97 = 0
), m AS (
  SELECT k, c % 20 AS ht, (c % 20 + 7) % 20 AS att, 2700 + k % 300 AS h2,
         40 + k % 10 AS m1, 60 + k % 25 AS m2, 50 + k % 30 AS m3
  FROM src
), ml AS (
  SELECT k, 45 + CAST(CEIL(h2 / 60.0) AS BIGINT) AS mlen FROM m
), iv0 AS (
  SELECT m.k, 100 * ht + j.j AS pid, 0 AS on_min,
         CASE j.j WHEN 1 THEN m1 WHEN 2 THEN m2 END AS out_min
  FROM m, (SELECT unnest(range(1, 12)) AS j) j
  UNION ALL SELECT k, 100 * ht + 12, m1, NULL FROM m
  UNION ALL SELECT k, 100 * ht + 13, m2, NULL FROM m
  UNION ALL
  SELECT m.k, 100 * att + j.j, 0, CASE j.j WHEN 3 THEN m3 END
  FROM m, (SELECT unnest(range(1, 12)) AS j) j
  UNION ALL SELECT k, 100 * att + 12, m3, NULL FROM m
), mins AS (
  SELECT pid, SUM(COALESCE(out_min, mlen) - on_min) AS minutes
  FROM iv0 JOIN ml ON ml.k = iv0.k GROUP BY pid
), named AS (
  SELECT pid,
         CASE WHEN pid % 100 = 1 THEN 'Goalkeeper'
              WHEN pid % 100 <= 5 THEN 'Defender'
              WHEN pid % 100 <= 9 THEN 'Midfielder'
              ELSE 'Forward' END AS role,
         'P ' || pid::VARCHAR AS player,
         'A' || (pid % 5)::VARCHAR AS birthArea,
         CAST(minutes AS INT) AS minutes
  FROM mins
), ranked AS (
  SELECT role, player, birthArea, minutes,
         ROW_NUMBER() OVER (PARTITION BY role ORDER BY minutes DESC, pid ASC) AS rn
  FROM named
)
SELECT role, player, birthArea, minutes FROM ranked WHERE rn = 1
"""


@register(
    "plusminus_top_by_role",
    oracle=_TOP_ROLE_ORACLE,
    doc="SURVEY.md 2.13 Advanced-2 output 1 (Assignment-python.py:572-578), "
    "driver-gated: top player by total minutes per role over the synthetic "
    "fixture stream — exercises the pipeline's roster join, name concat "
    "(concat_ws), and the per-role row_number top-1 with the "
    "(minutes DESC, playerId) tie-break the spec leaves implicit. The "
    "per-role window runs post-aggregation over one row per player — "
    "bounded, not a content-key scan.",
)
def plusminus_top_by_role(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..pipelines.plusminus import most_minutes_by_role, player_intervals

    matches, events = _synth_football(spark, sf_dir)
    intervals = player_intervals(matches, events)
    # synthetic roster: 20 teams x 13 shirts; names/areas are arithmetic in
    # playerId so the oracle derives them without a roster table
    pid = (
        (F.col("t") * 100 + F.col("j")).cast("long").alias("playerId")
    )
    players = (
        spark.range(0, 20)
        .select(F.col("id").alias("t"))
        .select("t", F.explode(F.sequence(F.lit(1), F.lit(13))).alias("j"))
        .select(pid)
        .select(
            "playerId",
            F.lit("P").alias("firstName"),
            F.col("playerId").cast("string").alias("lastName"),
            F.concat(F.lit("A"), (F.col("playerId") % 5).cast("string")).alias(
                "birthArea"
            ),
            _role_of(F.col("playerId")).alias("role"),
        )
    )
    return most_minutes_by_role(intervals, players)


_PIT_SCD2_ORACLE = """
WITH e AS (
  SELECT user_id, event_id, event_type, (epoch_ms(ts) // 1000)::BIGINT AS ts_s
  FROM events
), ch AS (
  SELECT user_id, event_type, ts_s,
         LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts_s, event_id) AS prev
  FROM e
), dim AS (
  SELECT user_id, event_type AS state, ts_s AS valid_from
  FROM ch WHERE prev IS NULL OR prev <> event_type
), p AS (
  SELECT event_id, user_id, ts_s - 3600 AS lookup_s
  FROM e WHERE event_type = 'purchase'
), j AS (
  SELECT p.event_id, p.user_id, d.state
  FROM p ASOF LEFT JOIN dim d
    ON p.user_id = d.user_id AND d.valid_from <= p.lookup_s
)
SELECT COALESCE(state, 'none') AS prior_state,
       COUNT(*)::BIGINT AS n_purchases,
       COUNT(DISTINCT user_id)::BIGINT AS n_users
FROM j
GROUP BY 1
"""


@register(
    "purchase_prior_state_pit",
    oracle=_PIT_SCD2_ORACLE,
    doc="Point-in-time dimension lookup (the temporal-join shape every "
    "SCD-2 warehouse query needs): each purchase joined to the user's "
    "SCD-2 state valid ONE HOUR BEFORE the purchase — change points from "
    "the user_state_scd2 lag build, matched with the as-of operator "
    "(union + running-last window, one shuffle, no range join), "
    "aggregated to purchases/users per prior state. 'none' = user had no "
    "state yet at lookup time. Oracle: DuckDB native ASOF JOIN on the "
    "same change-point CTE.",
)
def purchase_prior_state_pit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.asof import asof_join

    ev = load(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        "event_type",
        F.unix_timestamp("ts").alias("ts_s"),
    )
    w = Window.partitionBy("user_id").orderBy("ts_s", "event_id")
    dim = (
        ev.withColumn("prev", F.lag("event_type").over(w))
        .filter(F.col("prev").isNull() | (F.col("prev") != F.col("event_type")))
        .select(
            "user_id",
            F.col("event_type").alias("state"),
            F.col("ts_s").alias("valid_from"),
        )
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", (F.col("ts_s") - 3600).alias("lookup_s")
    )
    joined = asof_join(
        purchases,
        dim,
        by="user_id",
        left_ts="lookup_s",
        right_ts="valid_from",
        value_cols=["state"],
        strict=False,
    )
    return joined.groupBy(
        F.coalesce(F.col("state"), F.lit("none")).alias("prior_state")
    ).agg(
        F.count(F.lit(1)).alias("n_purchases"),
        F.countDistinct("user_id").alias("n_users"),
    )
