"""Winnowing fingerprints: literal Python model parity, the shared-substring
guarantee, density telemetry, and the plan shape (one Generate, entity-keyed
window, shuffle-hash pair join with hot-side broadcast anti-join)."""

from __future__ import annotations

import random

from data_engineering_assignment_spark.operators.winnow import (
    winnow_dup_pairs,
    winnow_fingerprints,
    winnow_stats,
)

MOD = 1_000_000_007


def _rhash(s: str) -> int:
    h = 0
    for ch in s:
        h = (h * 31 + ord(ch)) % MOD
    return h


def _model(tokens: list[str], k: int, w: int) -> set[tuple[int, int]]:
    """Reference winnowing: rightmost-minimum per window, distinct picks."""
    hashes = [
        _rhash(" ".join(tokens[j : j + k]))
        for j in range(len(tokens) - k + 1)
    ]
    picks = set()
    for s in range(len(hashes) - w + 1):
        window = hashes[s : s + w]
        m = min(window)
        pos = s + max(i for i, h in enumerate(window) if h == m)
        picks.add((pos, hashes[pos]))
    return picks


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_fingerprints_match_python_model(spark):
    rng = random.Random(7)
    texts = [
        " ".join(rng.choice(["aa", "bb", "cc", "dd"]) for _ in range(n))
        for n in (7, 10, 16, 30)
    ]
    for k, w in ((4, 4), (3, 5), (2, 2)):
        got = {
            (r.doc_id, r.pos, r.rh)
            for r in winnow_fingerprints(_docs(spark, texts), k=k, w=w).collect()
        }
        want = {
            (i, pos, rh)
            for i, t in enumerate(texts)
            for pos, rh in _model(t.split(" "), k, w)
        }
        assert got == want, (k, w)


def test_short_docs_emit_nothing(spark):
    # k + w - 1 = 7 tokens needed for one full window
    df = _docs(spark, ["a b c d e f", "a b c d e f g"])
    out = winnow_fingerprints(df, k=4, w=4).collect()
    assert {r.doc_id for r in out} == {1}


def test_shared_substring_guarantee(spark):
    """Any shared token run of length >= k + w - 1 yields a shared hash."""
    rng = random.Random(13)
    shared = " ".join(rng.choice("pqrs") for _ in range(9))  # 9 >= 4+4-1
    t0 = "x1 x2 x3 " + shared + " y1 y2"
    t1 = "z9 " + shared + " z1 z2 z3 z4"
    fp = winnow_fingerprints(_docs(spark, [t0, t1]), k=4, w=4).collect()
    h0 = {r.rh for r in fp if r.doc_id == 0}
    h1 = {r.rh for r in fp if r.doc_id == 1}
    assert h0 & h1


def test_stats_density_bounds(spark, sf_dir):
    from data_engineering_assignment_spark.tables import load

    out = winnow_stats(load(spark, sf_dir, "documents")).collect()
    assert out
    for r in out:
        assert 1 <= r.n_fp <= r.n_windows
        assert r.n_fp_hashes <= r.n_fp
        # winnowing picks at least one fingerprint per w positions and at
        # most one per position; expected density is 2/(w+1)
        assert 0 < r.density <= 1.0


def test_dup_pairs_plants_near_duplicates(spark):
    base = " ".join(f"tok{i}" for i in range(40))
    texts = [base, base + " extra trailing", "un related words " * 10]
    out = winnow_dup_pairs(_docs(spark, texts), max_df=None).collect()
    assert [(r.doc_a, r.doc_b) for r in out] == [(0, 1)]
    assert out[0].coverage >= 0.9


def test_plan_shapes(spark, sf_dir):
    from data_engineering_assignment_spark.tables import load

    docs = load(spark, sf_dir, "documents")
    stats_plan = (
        winnow_stats(docs)._jdf.queryExecution().executedPlan().toString()
    )
    # one positional hash stream = exactly one Generate; the only window
    # sits on doc_id (entity key)
    assert stats_plan.count("Generate explode") + stats_plan.count(
        "Generate posexplode"
    ) == 1
    pairs_plan = (
        winnow_dup_pairs(docs, checkpoint=False)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "ShuffledHashJoin" in pairs_plan
    assert "CartesianProduct" not in pairs_plan
    # the df-cap drops hot fingerprints via broadcast LEFT ANTI (hot side
    # broadcast, never the kept corpus)
    assert "BroadcastHashJoin" in pairs_plan and "LeftAnti" in pairs_plan
