"""Advanced-2 plus-minus pipeline tests on a hand-computed fixture match.

The fixture encodes every edge rule from the spec (Assignment-python.py:
544-566): 2H-derived match length, start-of-minute substitutions, and the
1H-additional-time goal vs minute-45 substitution interplay.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from data_engineering_assignment_spark.pipelines import plusminus as pm
from data_engineering_assignment_spark.schemas import (
    FOOTBALL_EVENT_SCHEMA,
    MATCH_SCHEMA,
    PLAYER_SCHEMA,
)


def sub(p_in, p_out, minute):
    return Row(playerIn=p_in, playerOut=p_out, minute=minute)


def team_data(team, lineup, s1=None, s2=None, s3=None):
    return Row(
        team=team, coachId=1, lineup=lineup, bench=[],
        substitution1=s1 or sub(None, None, None),
        substitution2=s2 or sub(None, None, None),
        substitution3=s3 or sub(None, None, None),
    )


@pytest.fixture(scope="module")
def fixture(spark):
    """Match 1, HOME vs AWAY.

    HOME: starters 1,2; player 2 off / player 3 on at minute 60.
          player 4 on / player 1 off at minute 45 (half-time swap).
    AWAY: starters 11,12; no subs.
    Events: 2H last event at 2845s → len2H = ceil(2845/60) = 48 → match 93min.
    Goals:
      g1: AWAY scores in 1H additional time (1H, 2750s).
      g2: HOME scores at 2H 600s (= minute 55).
      g3: AWAY scores at 2H 2400s (= minute 85).
    """
    matches = spark.createDataFrame(
        [
            Row(
                matchId=1, competition="L1", season="2017-2018", roundId=1,
                gameWeek=1, date=None, status="Played",
                homeTeamData=team_data(
                    "HOME", [1, 2], s1=sub(3, 2, 60), s2=sub(4, 1, 45)
                ),
                awayTeamData=team_data("AWAY", [11, 12]),
            )
        ],
        MATCH_SCHEMA,
    )
    ev = []

    def goal(keeper_team, period, t):
        # keeper's team concedes
        ev.append(
            ("L1", "2017-2018", 1, len(ev), "HOME", "AWAY", "Save attempt",
             None, keeper_team, None, period, float(t), ["Goal"], None, None)
        )

    goal("HOME", "1H", 2750.0)   # g1: AWAY scores, 1H additional time
    goal("AWAY", "2H", 600.0)    # g2: HOME scores at minute 55
    goal("HOME", "2H", 2400.0)   # g3: AWAY scores at minute 85
    # last 2H event defines match length: 2845s → 48 min half
    ev.append(
        ("L1", "2017-2018", 1, 99, "HOME", "AWAY", "Pass", None, "HOME",
         None, "2H", 2845.0, [], None, None)
    )
    events = spark.createDataFrame(ev, FOOTBALL_EVENT_SCHEMA)
    players = spark.createDataFrame(
        [
            Row(playerId=1, firstName="A", lastName="One", birthArea="X", role="Defender", foot="right"),
            Row(playerId=2, firstName="B", lastName="Two", birthArea="X", role="Midfielder", foot="left"),
            Row(playerId=3, firstName="C", lastName="Three", birthArea="Y", role="Forward", foot="right"),
            Row(playerId=4, firstName="D", lastName="Four", birthArea="Y", role="Forward", foot="left"),
            Row(playerId=11, firstName="E", lastName="Five", birthArea="Z", role="Goalkeeper", foot="right"),
            Row(playerId=12, firstName="G", lastName="Six", birthArea="Z", role="Defender", foot="right"),
        ],
        PLAYER_SCHEMA,
    )
    return matches, events, players


def test_match_length_from_2h(spark, fixture):
    matches, events, _ = fixture
    lens = {r["matchId"]: r["len2h"] for r in pm.second_half_lengths(events).collect()}
    assert lens[1] == 48  # ceil(2845/60)


def test_player_intervals_minutes(spark, fixture):
    matches, events, _ = fixture
    iv = {r["playerId"]: r for r in pm.player_intervals(matches, events).collect()}
    # starter never off: 0 → 93
    assert (iv[11]["on_min"], iv[11]["off_min"]) == (0, 93)
    # half-time swap: out at 45 → on minute count 45; in at 45 → 93-45=48
    assert iv[1]["off_min"] == 45
    assert iv[4]["on_min"] == 45
    # minute-60 swap
    assert iv[2]["off_min"] == 60
    assert iv[3]["on_min"] == 60


def test_minutes_and_top_by_role(spark, fixture):
    matches, events, players = fixture
    intervals = pm.player_intervals(matches, events)
    mins = {r["playerId"]: r["minutes"] for r in pm.minutes_played(intervals).collect()}
    assert mins == {1: 45, 2: 60, 3: 33, 4: 48, 11: 93, 12: 93}
    top = {r["role"]: (r["player"], r["minutes"])
           for r in pm.most_minutes_by_role(intervals, players).collect()}
    assert top["Goalkeeper"] == ("E Five", 93)
    assert top["Defender"] == ("G Six", 93)
    assert top["Forward"] == ("D Four", 48)   # 48 > 33


def test_plus_minus_additional_time_rules(spark, fixture):
    """g1 (1H added time, AWAY scores): on-pitch then = HOME 1,2 / AWAY 11,12.
    Player 4 (in at 45) NOT affected; player 1 (out at 45) IS affected.
    g2 (2H 600s = min 55, HOME scores): HOME 4,2 on; AWAY 11,12. Player 3 not
    yet on (enters 60).  g3 (2H 2400s = min 85, AWAY): HOME 4,3; AWAY 11,12.
    Totals: p1 -1; p2 -1+1=0; p3 -1; p4 +1-1=0; p11 +1-1+1=+1; p12 +1."""
    matches, events, players = fixture
    intervals = pm.player_intervals(matches, events)
    res = {r["playerId"]: r["plusMinus"] for r in pm.plus_minus(intervals, events).collect()}
    assert res == {1: -1, 2: 0, 3: -1, 4: 0, 11: 1, 12: 1}


def test_top_plus_minus_threshold(spark, fixture):
    matches, events, players = fixture
    intervals = pm.player_intervals(matches, events)
    out = pm.top_plus_minus(intervals, events, players, threshold=0).collect()
    assert sorted(r["player"] for r in out) == ["E Five", "G Six"]
    assert all(r["plusMinus"] == 1 for r in out)
