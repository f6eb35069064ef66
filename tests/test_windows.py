"""Event-time window operator tests: tumbling, sliding, sessionize."""

from __future__ import annotations

from datetime import datetime, timezone

from data_engineering_assignment_spark.operators.windows import (
    sessionize,
    sliding_agg,
    tumbling_agg,
)


def ts(minute, second=0):
    return datetime(2024, 1, 1, 0, minute, second)


def events_df(spark, rows):
    return spark.createDataFrame(
        rows, "user_id bigint, ts timestamp, event_type string, value double"
    )


def _epoch(minute):
    return int(datetime(2024, 1, 1, 0, minute, tzinfo=timezone.utc).timestamp())


def test_tumbling_counts_and_sums(spark):
    df = events_df(
        spark,
        [
            (1, ts(0), "a", 1.0),
            (1, ts(9, 59), "a", 2.0),
            (1, ts(10), "a", 4.0),   # next bucket
            (2, ts(25), "b", 8.0),
        ],
    )
    out = {r["win_start"]: (r["n_events"], r["total_value"])
           for r in tumbling_agg(df, "10 minutes").collect()}
    assert out[_epoch(0)] == (2, 3.0)
    assert out[_epoch(10)] == (1, 4.0)
    assert out[_epoch(20)] == (1, 8.0)


def test_sliding_window_membership(spark):
    df = events_df(spark, [(1, ts(7), "a", 1.0)])
    out = sorted(r["win_start"] for r in sliding_agg(df, "10 minutes", "5 minutes").collect())
    # event at 00:07 belongs to windows [00:00,00:10) and [00:05,00:15)
    assert out == [_epoch(0), _epoch(5)]


def test_sessionize_gap_split(spark):
    df = events_df(
        spark,
        [
            (1, ts(0), "a", 0.0),
            (1, ts(20), "a", 0.0),   # 20m gap < 30m → same session
            (1, ts(55), "a", 0.0),   # 35m gap > 30m → new session
            (2, ts(5), "a", 0.0),    # separate user
        ],
    )
    out = sessionize(df, "30 minutes").collect()
    u1 = sorted(
        [(r["session_start"], r["session_end"], r["n_events"]) for r in out if r["user"] == 1]
    )
    assert u1 == [(_epoch(0), _epoch(20), 2), (_epoch(55), _epoch(55), 1)]
    u2 = [r for r in out if r["user"] == 2]
    assert len(u2) == 1 and u2[0]["n_events"] == 1
