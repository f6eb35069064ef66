"""Event-time window aggregation (batch semantics of Structured Streaming).

The reference has no streaming surface (SURVEY.md section 2.12); these
operators add tumbling/sliding event-time aggregation over an events table
using ``F.window``, which is the exact operator Structured Streaming plans for
``readStream`` inputs — the same code runs in streaming mode
(see ``streaming/`` for the readStream wiring).

Window starts are returned as epoch seconds (bigint) so results are
timezone- and engine-representation-independent.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .aggregates import dsum


def _win_start_epoch(win: Column) -> Column:
    return F.unix_timestamp(win.getField("start")).alias("win_start")


_UNIT_SECONDS = {
    "second": 1, "seconds": 1,
    "minute": 60, "minutes": 60,
    "hour": 3600, "hours": 3600,
    "day": 86400, "days": 86400,
}


def _interval_seconds(interval: str) -> int:
    """'30 minutes' / '1 hour' → seconds (same grammar F.window accepts)."""
    parts = interval.strip().split()
    if len(parts) != 2 or parts[1].lower() not in _UNIT_SECONDS:
        raise ValueError(f"unsupported interval: {interval!r}")
    return int(parts[0]) * _UNIT_SECONDS[parts[1].lower()]


def tumbling_agg(
    events: DataFrame,
    duration: str = "10 minutes",
    ts_col: str = "ts",
    keys: list[str] | None = None,
) -> DataFrame:
    """Tumbling-window counts + exact value sums per (window, *keys)."""
    keys = keys or []
    win = F.window(F.col(ts_col), duration)
    return (
        events.groupBy(win.alias("w"), *keys)
        .agg(F.count(F.lit(1)).alias("n_events"), dsum("value", "total_value"))
        .select(
            _win_start_epoch(F.col("w")), *keys, "n_events", "total_value"
        )
    )


def sliding_agg(
    events: DataFrame,
    duration: str = "10 minutes",
    slide: str = "5 minutes",
    ts_col: str = "ts",
    keys: list[str] | None = None,
) -> DataFrame:
    """Sliding-window (duration, slide) counts + exact value sums."""
    keys = keys or []
    win = F.window(F.col(ts_col), duration, slide)
    return (
        events.groupBy(win.alias("w"), *keys)
        .agg(F.count(F.lit(1)).alias("n_events"), dsum("value", "total_value"))
        .select(
            _win_start_epoch(F.col("w")), *keys, "n_events", "total_value"
        )
    )


def sessionize(
    events: DataFrame,
    gap: str = "30 minutes",
    ts_col: str = "ts",
    user_col: str = "user_id",
) -> DataFrame:
    """Gap-based sessionization via analytic windows (batch equivalent of
    ``F.session_window``): a new session starts when the previous event of the
    same user is more than ``gap`` away.

    Output: (user, session_id, session_start, session_end, n_events) with
    epoch-second bounds.
    """
    from pyspark.sql import Window as W

    gap_secs = _interval_seconds(gap)
    w = W.partitionBy(user_col).orderBy(ts_col)
    ts_sec = F.unix_timestamp(F.col(ts_col))
    marked = events.withColumn(
        "new_session",
        F.when(
            ts_sec - F.lag(ts_sec, 1).over(w) > gap_secs, 1
        ).otherwise(0),
    ).withColumn(
        "session_seq",
        F.sum(F.col("new_session")).over(
            w.rowsBetween(W.unboundedPreceding, W.currentRow)
        ),
    )
    return (
        marked.groupBy(F.col(user_col).alias("user"), F.col("session_seq"))
        .agg(
            F.min(ts_sec).alias("session_start"),
            F.max(ts_sec).alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .withColumn("session_id", F.col("session_seq").cast("long"))
        .select("user", "session_id", "session_start", "session_end", "n_events")
    )
