"""CDC merge-apply tests: latest-wins upserts, deletes, resurrection."""

from __future__ import annotations

from data_engineering_assignment_spark.operators.cdc import apply_changes


def frames(spark):
    base = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        "k bigint, s string, v double",
    )
    changes = spark.createDataFrame(
        [
            (2, "b2", 21.0, 1, "U"),   # update key 2
            (2, "b3", 22.0, 2, "U"),   # newer update wins
            (3, "c", 30.0, 1, "D"),    # delete key 3
            (4, "d", 40.0, 1, "U"),    # insert new key 4
            (5, "e", 50.0, 1, "U"),    # insert then delete → absent
            (5, "e", 50.0, 2, "D"),
            (6, "f", 60.0, 1, "D"),    # delete then re-insert → present
            (6, "f2", 61.0, 2, "U"),
        ],
        "k bigint, s string, v double, seq int, op string",
    )
    return base, changes


def test_apply_changes_merge_semantics(spark):
    base, changes = frames(spark)
    out = {r["k"]: (r["s"], r["v"]) for r in apply_changes(base, changes, ["k"]).collect()}
    assert out == {
        1: ("a", 10.0),    # untouched base row
        2: ("b3", 22.0),   # latest update wins
        4: ("d", 40.0),    # fresh insert
        6: ("f2", 61.0),   # resurrected after delete
    }


def test_apply_changes_partitioning_independent(spark):
    base, changes = frames(spark)
    a = sorted(map(tuple, apply_changes(base, changes, ["k"]).collect()))
    b = sorted(
        map(
            tuple,
            apply_changes(base.repartition(7), changes.repartition(3), ["k"]).collect(),
        )
    )
    assert a == b
