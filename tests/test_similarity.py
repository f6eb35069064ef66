"""Similarity-search tests: exact cosine top-k golden values and LSH recall."""

from __future__ import annotations

import math
import random

import pytest
from pyspark.sql import functions as F

from data_engineering_assignment_spark.operators.similarity import (
    cosine,
    cosine_topk,
    lsh_bucketed_topk,
)


def test_cosine_column_value(spark):
    df = spark.createDataFrame(
        [([1.0, 0.0], [1.0, 0.0]), ([1.0, 0.0], [0.0, 1.0]), ([1.0, 1.0], [1.0, 0.0])],
        "a array<double>, b array<double>",
    )
    vals = [r["c"] for r in df.select(cosine(F.col("a"), F.col("b")).alias("c")).collect()]
    assert vals[0] == pytest.approx(1.0)
    assert vals[1] == pytest.approx(0.0)
    assert vals[2] == pytest.approx(1 / math.sqrt(2))


def _unit(rng, dim):
    v = [rng.gauss(0, 1) for _ in range(dim)]
    n = math.sqrt(sum(x * x for x in v))
    return [x / n for x in v]


def test_exact_topk_finds_planted_neighbor(spark):
    rng = random.Random(7)
    dim = 16
    base = _unit(rng, dim)
    near = [x + rng.gauss(0, 0.01) for x in base]  # planted ≈1.0 neighbor
    corpus = [(0, base), (1, near)] + [(i, _unit(rng, dim)) for i in range(2, 50)]
    df = spark.createDataFrame(corpus, "vec_id bigint, embedding array<double>")
    out = cosine_topk(df, df.filter(F.col("vec_id") == 0), k=3).collect()
    assert out[0]["neighbor_id"] == 1 and out[0]["rnk"] == 1
    assert out[0]["sim"] > 0.99


def test_lsh_topk_recall_vs_exact(spark):
    rng = random.Random(11)
    dim = 16
    corpus = [(i, _unit(rng, dim)) for i in range(200)]
    df = spark.createDataFrame(corpus, "vec_id bigint, embedding array<double>")
    queries = df.filter(F.col("vec_id") < 5)
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in cosine_topk(df, queries, k=3).collect()
    }
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in lsh_bucketed_topk(df, queries, dim=dim, k=3, planes=2).collect()
    }
    # 2 planes → 4 buckets → each bucket ~50 vectors; recall should be decent
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.4
    # every returned neighbor must share the query's bucket → subsets are sane
    assert all(q != n for q, n in approx)


def test_cosine_pairs_threshold(spark):
    from data_engineering_assignment_spark.operators.similarity import cosine_pairs

    vecs = [
        (1, [1.0, 0.0]), (2, [0.999, 0.01]),   # near-identical pair
        (3, [0.0, 1.0]),                        # orthogonal to both
        (4, [-1.0, 0.0]),                       # opposite
    ]
    df = spark.createDataFrame(vecs, "vec_id bigint, embedding array<double>")
    out = {(r["id_a"], r["id_b"]): r["sim"] for r in cosine_pairs(df, 0.9).collect()}
    assert set(out) == {(1, 2)}
    assert out[(1, 2)] > 0.99


def test_cosine_pairs_blocked_matches_hof(spark):
    import random

    from data_engineering_assignment_spark.operators.similarity import (
        cosine_pairs,
        cosine_pairs_blocked,
    )

    rng = random.Random(5)
    vecs = [(i, [rng.gauss(0, 1) for _ in range(8)]) for i in range(120)]
    df = spark.createDataFrame(vecs, "vec_id bigint, embedding array<double>")
    hof = {(r["id_a"], r["id_b"]): r["sim"] for r in cosine_pairs(df, 0.3).collect()}
    blk = {(r["id_a"], r["id_b"]): r["sim"] for r in cosine_pairs_blocked(df, 0.3).collect()}
    assert hof == blk and len(blk) > 0


def test_cosine_pairs_blocked_refuses_large_corpus(spark):
    """The one driver-collect utility in the tree must refuse to collect a
    corpus above its cap, so it can never back a scale path by accident."""
    import pytest

    from data_engineering_assignment_spark.operators.similarity import (
        cosine_pairs_blocked,
    )

    df = spark.range(200).select(
        F.col("id").alias("vec_id"), F.array(F.lit(1.0)).alias("embedding")
    )
    with pytest.raises(ValueError, match="capped at 100 rows"):
        cosine_pairs_blocked(df, 0.5, max_rows=100)


def test_cosine_pairs_grouped_matches_hof(spark):
    import random

    from data_engineering_assignment_spark.operators.similarity import (
        cosine_pairs,
        cosine_pairs_grouped,
    )

    rng = random.Random(5)
    vecs = [(i, [rng.gauss(0, 1) for _ in range(8)]) for i in range(120)]
    df = spark.createDataFrame(vecs, "vec_id bigint, embedding array<double>")
    hof = {(r["id_a"], r["id_b"]): r["sim"] for r in cosine_pairs(df, 0.3).collect()}
    for n_blocks in (1, 4, 16):  # incl. blocks larger than the corpus/row count
        grp = {
            (r["id_a"], r["id_b"]): r["sim"]
            for r in cosine_pairs_grouped(df, 0.3, n_blocks=n_blocks).collect()
        }
        assert grp == hof and len(grp) > 0


def test_ivf_topk_recall_vs_exact(spark):
    import math
    import random

    from data_engineering_assignment_spark.operators.similarity import (
        cosine_topk,
        ivf_topk,
    )
    from pyspark.sql import functions as F

    rng = random.Random(13)

    def unit(dim=16):
        v = [rng.gauss(0, 1) for _ in range(dim)]
        n = math.sqrt(sum(x * x for x in v))
        return [x / n for x in v]

    df = spark.createDataFrame(
        [(i, unit()) for i in range(200)], "vec_id bigint, embedding array<double>"
    )
    queries = df.filter(F.col("vec_id") < 5)
    exact = {
        (r["query_id"], r["neighbor_id"]) for r in cosine_topk(df, queries, k=3).collect()
    }
    approx_rows = ivf_topk(df, queries, k=3, n_centroids=8, n_probe=4).collect()
    approx = {(r["query_id"], r["neighbor_id"]) for r in approx_rows}
    # probing half the cells on random data should recover most true neighbors
    assert len(exact & approx) / len(exact) >= 0.5
    # ranks are 1..k per query with no duplicate neighbors
    per_q = {}
    for r in approx_rows:
        per_q.setdefault(r["query_id"], []).append(r["rnk"])
    assert all(sorted(v) == list(range(1, len(v) + 1)) for v in per_q.values())


def test_ivf_topk_portable_recall_and_determinism(spark):
    """The oracle-gated portable IVF: decent recall vs exact top-k, rank
    integrity, and partitioning-independence (its whole point is being a
    deterministic function of its inputs)."""
    import math
    import random

    from data_engineering_assignment_spark.operators.similarity import (
        cosine_topk,
        ivf_topk_portable,
    )

    rng = random.Random(13)

    def unit(dim=16):
        v = [rng.gauss(0, 1) for _ in range(dim)]
        n = math.sqrt(sum(x * x for x in v))
        return [x / n for x in v]

    df = spark.createDataFrame(
        [(i, unit()) for i in range(200)], "vec_id bigint, embedding array<double>"
    )
    queries = df.filter(F.col("vec_id") < 5)
    exact = {
        (r["query_id"], r["neighbor_id"]) for r in cosine_topk(df, queries, k=3).collect()
    }
    rows = ivf_topk_portable(df, queries, k=3, n_centroids=8, n_probe=4).collect()
    approx = {(r["query_id"], r["neighbor_id"]) for r in rows}
    assert len(exact & approx) / len(exact) >= 0.5
    per_q = {}
    for r in rows:
        per_q.setdefault(r["query_id"], []).append(r["rnk"])
    assert all(sorted(v) == list(range(1, len(v) + 1)) for v in per_q.values())
    again = ivf_topk_portable(
        df.repartition(7), queries, k=3, n_centroids=8, n_probe=4
    ).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


def _clustered_corpus(spark, n_clusters=4, per_cluster=50, dim=16, spread=0.05):
    """Well-separated clusters: orthogonal axis centers + small noise."""
    import math
    import random

    rng = random.Random(7)
    rows = []
    for c in range(n_clusters):
        center = [1.0 if i == c else 0.0 for i in range(dim)]
        for j in range(per_cluster):
            v = [center[i] + rng.gauss(0, spread) for i in range(dim)]
            n = math.sqrt(sum(x * x for x in v))
            rows.append((c * per_cluster + j, [x / n for x in v], c))
    return spark.createDataFrame(rows, "vec_id bigint, embedding array<double>, cl int")


def test_kmeans_centroids_find_clusters(spark):
    """Two Lloyd iterations on a well-separated corpus must land one
    centroid near each true cluster center (cosine > 0.95) — and the result
    must be partitioning-independent (decimal-detour dimension sums)."""
    import numpy as np

    from data_engineering_assignment_spark.operators.similarity import kmeans_centroids

    df = _clustered_corpus(spark)
    cents = kmeans_centroids(df, n_centroids=4, n_iter=2)
    axes = np.eye(16)[:4]
    # every true center is captured by some centroid
    best = (cents @ axes.T).max(axis=0)
    assert (best > 0.95).all()
    again = kmeans_centroids(df.repartition(7), n_centroids=4, n_iter=2)
    assert np.allclose(cents, again)


def test_ivf_lloyd_refinement_recall(spark):
    """With data-adaptive (refined) cells and 1-cell probing on clustered
    data, IVF recall vs exact must be near-total — each cluster collapses
    into one inverted list."""
    from pyspark.sql import functions as F

    from data_engineering_assignment_spark.operators.similarity import (
        cosine_topk,
        ivf_topk,
    )

    df = _clustered_corpus(spark).select("vec_id", "embedding")
    queries = df.filter(F.col("vec_id") % 50 == 0)  # one per cluster
    exact = {
        (r["query_id"], r["neighbor_id"]) for r in cosine_topk(df, queries, k=3).collect()
    }
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in ivf_topk(df, queries, k=3, n_centroids=4, n_probe=1, n_iter=2).collect()
    }
    assert len(exact & approx) / len(exact) >= 0.9


def test_quantize_int8_roundtrip_and_zero_vector(spark):
    """int8 quantization: codes bounded, max-|x| dimension hits ±127,
    reconstruction error bounded by scale/2 per dim, all-zero vector safe."""
    from data_engineering_assignment_spark.operators.similarity import quantize_int8

    rows = [
        (1, [1.0, -0.5, 0.25, 0.0]),
        (2, [0.0, 0.0, 0.0, 0.0]),
        (3, [-2.0, 1.0, 0.5, -0.25]),
    ]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    out = {r["vec_id"]: r for r in quantize_int8(df).collect()}
    assert out[1]["q"][0] == 127  # max-|x| dim maps to full range
    assert out[2]["q"] == [0, 0, 0, 0] and out[2]["q_scale"] == 0.0
    assert out[3]["q"][0] == -127
    for vid, emb in ((1, rows[0][1]), (3, rows[2][1])):
        s, q = out[vid]["q_scale"], out[vid]["q"]
        assert all(-127 <= c <= 127 for c in q)
        for x, c in zip(emb, q):
            assert abs(x - c * s) <= s / 2 + 1e-12


def test_pq_portable_recall_floor_and_determinism(spark, sf_dir):
    """PQ twin: recall@5 vs exact cosine must hold the floor that backs
    the catalog docstring, and the result must be partitioning-independent."""
    from data_engineering_assignment_spark.operators.similarity import (
        cosine_topk,
        pq_topk_portable,
    )
    from data_engineering_assignment_spark.tables import load

    emb = load(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in cosine_topk(emb, queries, k=5).collect()
    }
    got = pq_topk_portable(emb, queries, k=5, m=32, n_codes=16, dim=64).collect()
    pq = {(r["query_id"], r["neighbor_id"]) for r in got}
    assert len(exact & pq) / len(exact) >= 0.35

    again = {
        (r["query_id"], r["neighbor_id"], r["approx_dist"], r["rnk"])
        for r in pq_topk_portable(
            emb.repartition(7), queries, k=5, m=32, n_codes=16, dim=64
        ).collect()
    }
    assert again == {
        (r["query_id"], r["neighbor_id"], r["approx_dist"], r["rnk"]) for r in got
    }


def test_pq_production_matches_portable_twin(spark, sf_dir):
    """The numpy scan and the portable twin share codebook and semantics;
    numpy's summation order may flip final ulps, so assert the top-5 SETS
    match per query (the fixture has no boundary ties)."""
    from data_engineering_assignment_spark.operators.similarity import (
        pq_topk,
        pq_topk_portable,
    )
    from data_engineering_assignment_spark.tables import load

    emb = load(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    fast = {}
    for r in pq_topk(emb, queries, k=5, m=32, n_codes=16).collect():
        fast.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    twin = {}
    for r in pq_topk_portable(emb, queries, k=5, m=32, n_codes=16, dim=64).collect():
        twin.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    assert fast == twin


def test_semantic_production_matches_portable_twin(spark, sf_dir):
    """semantic_dup_pairs fed the SAME centroids as the portable twin must
    emit the same (id_a, id_b, cell) pair set — the numpy argmax assignment
    and the pinned-fold assignment may differ only in last-ulp sims, so
    assert set parity on pairs and approx-equality on sims (the pq twin
    discipline)."""
    import numpy as np

    from data_engineering_assignment_spark.operators.similarity import (
        _normed,
        semantic_dup_pairs,
        semantic_dup_pairs_portable,
    )
    from data_engineering_assignment_spark.tables import load

    emb = load(spark, sf_dir, "embeddings")
    # the twin's Knuth-hash seed centroids, replicated for the production path
    h_rows = (
        emb.select(
            F.col("vec_id").alias("id"),
            F.col("embedding").cast("array<double>").alias("vec"),
            ((F.col("vec_id") * F.lit(2654435761)) % F.lit(4294967296)).alias("h"),
        )
        .orderBy("h", "id")
        .limit(16)
        .collect()
    )
    cents = _normed(np.array([r["vec"] for r in h_rows], dtype=np.float64))
    prod = {
        (r["id_a"], r["id_b"], r["cell"]): r["sim"]
        for r in semantic_dup_pairs(emb, threshold=0.4, centroids=cents).collect()
    }
    twin = {
        (r["id_a"], r["id_b"], r["cell"]): r["sim"]
        for r in semantic_dup_pairs_portable(emb, threshold=0.4, n_centroids=16).collect()
    }
    assert set(prod) == set(twin)
    assert prod  # non-trivial fixture: some duplicates exist
    for k in prod:
        assert prod[k] == pytest.approx(twin[k], abs=1e-4)


def test_semantic_pairs_are_within_cell_restriction_of_exact(spark, sf_dir):
    """Within-cell pairs must be exactly the cell-equality restriction of
    the exact all-pairs set at the same threshold: no pair invented, and
    every same-cell exact pair found (the SemDeDup trade is cross-cell
    blindness, nothing else)."""
    from data_engineering_assignment_spark.operators.similarity import (
        cosine,
        portable_cells,
        semantic_dup_pairs_portable,
    )
    from data_engineering_assignment_spark.tables import load

    emb = load(spark, sf_dir, "embeddings")
    got = {
        (r["id_a"], r["id_b"])
        for r in semantic_dup_pairs_portable(emb, threshold=0.4, n_centroids=16).collect()
    }
    cells = {r["id"]: r["cell"] for r in portable_cells(emb, 16).collect()}
    n = emb.select(F.col("vec_id").alias("id"), F.col("embedding").cast("array<double>").alias("vec"))
    a, b = n.alias("a"), n.alias("b")
    exact = {
        (r["id_a"], r["id_b"])
        for r in a.join(b, F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.round(cosine(F.col("a.vec"), F.col("b.vec")), 4).alias("sim"),
        )
        .filter(F.col("sim") >= 0.4)
        .collect()
    }
    want = {(x, y) for (x, y) in exact if cells[x] == cells[y]}
    assert got == want


def test_semantic_survivor_stats_rule(spark):
    """Min-id survivor accounting on a hand-built pair table: drops are
    distinct id_b per cell, kept = occupancy - drops."""
    from data_engineering_assignment_spark.operators.similarity import (
        semantic_survivor_stats,
    )

    pairs = spark.createDataFrame(
        [(1, 2, 0, 0.9), (1, 3, 0, 0.8), (2, 3, 0, 0.85), (10, 11, 1, 0.7)],
        "id_a long, id_b long, cell int, sim double",
    )
    occ = spark.createDataFrame(
        [(0, 5), (1, 3), (2, 4)], "cell int, n_points long"
    )
    got = {
        r["cell"]: (r["n_points"], r["n_dup_pairs"], r["n_dropped"], r["n_kept"])
        for r in semantic_survivor_stats(pairs, occ).collect()
    }
    # cell 0: ids 2 and 3 each have a smaller-id dup neighbor -> 2 dropped
    assert got[0] == (5, 3, 2, 3)
    assert got[1] == (3, 1, 1, 2)
    assert got[2] == (4, 0, 0, 4)  # no pairs: zero-filled


def test_semantic_target_cell_rows_occupancy_knob(spark, sf_dir):
    """target_cell_rows is the scale knob: with target >= N the derived k
    collapses to the floor, and with floor 1 the result is EXACTLY the
    brute-force duplicate-pair set (one cell = no cross-cell blindness).
    With a small target the pair set is a subset of brute force (cells can
    only hide pairs, never invent them), every emitted sim re-verifies
    against numpy cosine, and the output is partitioning-independent."""
    import numpy as np

    from data_engineering_assignment_spark.operators.similarity import (
        cosine,
        semantic_dup_pairs,
    )
    from data_engineering_assignment_spark.tables import load

    emb = load(spark, sf_dir, "embeddings")
    n = emb.count()

    # target >= N -> k = max(1, ceil(N/target)) = 1 -> exact all-pairs
    one_cell = {
        (r["id_a"], r["id_b"], r["sim"])
        for r in semantic_dup_pairs(
            emb, threshold=0.4, n_centroids=1, n_iter=0, target_cell_rows=n
        ).collect()
    }
    v = emb.select(
        F.col("vec_id").alias("id"), F.col("embedding").cast("array<double>").alias("vec")
    )
    a, b = v.alias("a"), v.alias("b")
    brute = {
        (r["id_a"], r["id_b"], r["sim"])
        for r in a.join(b, F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.round(cosine(F.col("a.vec"), F.col("b.vec")), 4).alias("sim"),
        )
        .filter(F.col("sim") >= 0.4)
        .collect()
    }
    assert {(x, y) for (x, y, _) in one_cell} == {(x, y) for (x, y, _) in brute}

    # small target -> many cells: subset of brute force, sims re-verified
    got = semantic_dup_pairs(
        emb, threshold=0.4, n_centroids=2, n_iter=1, target_cell_rows=max(1, n // 8)
    ).collect()
    assert got, "fixture has within-cell duplicates"
    pair_set = {(r["id_a"], r["id_b"]) for r in got}
    assert pair_set <= {(x, y) for (x, y, _) in brute}
    vecs = {r["id"]: np.array(r["vec"], dtype=np.float64) for r in v.collect()}
    for r in got:
        assert r["id_a"] < r["id_b"]
        x, y = vecs[r["id_a"]], vecs[r["id_b"]]
        c = float(x @ y / (np.linalg.norm(x) * np.linalg.norm(y)))
        assert r["sim"] == pytest.approx(round(c, 4), abs=2e-4)
        assert r["sim"] >= 0.4

    again = {
        (r["id_a"], r["id_b"], r["cell"], r["sim"])
        for r in semantic_dup_pairs(
            emb.repartition(7),
            threshold=0.4,
            n_centroids=2,
            n_iter=1,
            target_cell_rows=max(1, n // 8),
        ).collect()
    }
    assert again == {(r["id_a"], r["id_b"], r["cell"], r["sim"]) for r in got}


def test_dedup_semantic_kmeans_catalog_entry(spark, sf_dir):
    """The rows-only production catalog query builds on a bare sf_dir and
    emits schema-stable, threshold-valid pairs."""
    from data_engineering_assignment_spark.queries import load_catalog

    df = load_catalog()["dedup_semantic_kmeans"].build(spark, sf_dir)
    assert [f.name for f in df.schema.fields] == ["id_a", "id_b", "cell", "sim"]
    rows = df.collect()
    assert rows
    assert all(r["id_a"] < r["id_b"] and r["sim"] >= 0.4 for r in rows)


def test_semantic_kmeans_production_precision_and_recall_floor(spark, sf_dir):
    """Production path vs exact all-pairs truth: perfect precision (a
    within-cell pair IS an exact pair — cells can hide pairs, never
    invent them) and a pinned recall floor at the aggressive 125-row
    cell target (measured 0.27 on the fixture; the cross-cell blindness
    SemDeDup trades for the quadratic cut, reported per-corpus by
    semantic_recall_telemetry)."""
    from data_engineering_assignment_spark.operators.similarity import (
        cosine_pairs_grouped,
        semantic_dup_pairs,
    )
    from data_engineering_assignment_spark.tables import load

    emb = load(spark, sf_dir, "embeddings")
    prod = {
        (r["id_a"], r["id_b"])
        for r in semantic_dup_pairs(emb, threshold=0.4, target_cell_rows=125).collect()
    }
    exact = {
        (r["id_a"], r["id_b"])
        for r in cosine_pairs_grouped(emb, threshold=0.4).collect()
    }
    assert prod <= exact and prod
    assert len(prod & exact) / len(exact) >= 0.2


def test_incremental_semantic_dedup_statuses(spark):
    """Hand-built corpus/delta: a delta vector colinear with corpus mass is
    'dup' with best_sim ~1; an orthogonal delta vector is 'novel' with 0
    dups; every delta row appears exactly once, on any partitioning."""
    from data_engineering_assignment_spark.operators.similarity import (
        incremental_semantic_dedup,
    )

    def rows(ids_vecs):
        return spark.createDataFrame(
            [(i, [float(x) for x in v]) for i, v in ids_vecs],
            "vec_id long, embedding array<double>",
        )

    corpus = rows([(1, [1, 0, 0, 0]), (2, [0.9, 0.1, 0, 0]), (3, [0, 1, 0, 0])])
    delta = rows([(100, [1, 0.05, 0, 0]), (101, [0, 0, 1, 0])])
    got = {r["vec_id"]: r for r in incremental_semantic_dedup(
        corpus, delta, threshold=0.4, n_centroids=2
    ).collect()}
    assert set(got) == {100, 101}
    assert got[100]["status"] == "dup" and got[100]["n_dups"] >= 1
    assert got[100]["best_sim"] >= 0.9
    assert got[101]["status"] == "novel" and got[101]["n_dups"] == 0

    again = {r["vec_id"]: (r["cell"], r["best_sim"], r["n_dups"], r["status"])
             for r in incremental_semantic_dedup(
                 corpus.repartition(5), delta.repartition(3),
                 threshold=0.4, n_centroids=2).collect()}
    assert again == {k: (v["cell"], v["best_sim"], v["n_dups"], v["status"])
                     for k, v in got.items()}


def test_fround_matches_spark_round_bitwise(spark):
    """_fround_double (the numpy pair scanner's rounding) must equal
    F.round(double, 4) BIT-FOR-BIT — adversarial .xxxx5 midpoints, values
    whose double*10^4 product crosses a midpoint the decimal doesn't, and
    random doubles. This is the contract that keeps production/twin pair
    sets in exact agreement at the threshold boundary."""
    import random
    import struct as _struct

    from data_engineering_assignment_spark.operators.similarity import (
        _fround_double,
    )

    rng = random.Random(42)
    vals = [0.40005, 0.39995, 0.12345, -0.40005, 0.5, -0.5, 0.0, 1.0]
    # doubles just below/above 4-dp midpoints
    for k in range(1, 40):
        m = k / 10000 + 5e-5
        for ulps in (-2, -1, 0, 1, 2):
            (bits,) = _struct.unpack("<q", _struct.pack("<d", m))
            (v,) = _struct.unpack("<d", _struct.pack("<q", bits + ulps))
            vals.append(v)
    vals += [rng.uniform(-1, 1) for _ in range(200)]
    df = spark.createDataFrame([(i, v) for i, v in enumerate(vals)], "i long, x double")
    got = {
        r["i"]: r["r"]
        for r in df.select("i", F.round("x", 4).alias("r")).collect()
    }
    for i, v in enumerate(vals):
        mine = _fround_double(v, 4)
        assert mine == got[i] or (mine == 0.0 and got[i] == 0.0), (v, mine, got[i])


def _clustered_embeddings(spark, n=120, n_clusters=3, dim=8, seed=3):
    import numpy as np

    rng = np.random.default_rng(seed)
    base = np.eye(dim)[:n_clusters] * 10
    rows = [
        (i, (base[i % n_clusters] + rng.normal(0, 0.1, dim)).tolist())
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_hierarchical_equals_flat_at_pinned_splits(spark):
    """Two-level assignment equivalence vs the flat production path: on a
    corpus of well-separated clusters, both the 3x1 split (coarse does
    the clustering, fine trivial) and the 1x3 split (coarse trivial, fine
    Lloyd does the clustering) must reproduce flat k=3's pair set
    EXACTLY, rounded sims included — pinning the cogrouped fine
    assignment, the distributed fine Lloyd, and the composite-cell pair
    scan against the known-good flat path."""
    from data_engineering_assignment_spark.operators.similarity import (
        semantic_dup_pairs,
        semantic_dup_pairs_hier,
    )

    df = _clustered_embeddings(spark)
    flat = {
        (r["id_a"], r["id_b"], r["sim"])
        for r in semantic_dup_pairs(df, threshold=0.9, n_centroids=3, n_iter=2).collect()
    }
    assert flat
    for n_coarse, n_fine in ((3, 1), (1, 3)):
        hier = {
            (r["id_a"], r["id_b"], r["sim"])
            for r in semantic_dup_pairs_hier(
                df, threshold=0.9, n_iter=2 if n_coarse == 3 else 3,
                n_coarse=n_coarse, n_fine=n_fine,
            ).collect()
        }
        assert hier == flat, (n_coarse, n_fine)


def test_hierarchical_cells_cover_every_row(spark):
    """Every input row gets exactly one (cell1, sub) assignment — the
    argmin-hash guarantee seed means no coarse cell can be fine-orphaned,
    and thin coarse cells simply get fewer sub-centroids."""
    from data_engineering_assignment_spark.operators.similarity import (
        hierarchical_cells,
    )

    df = _clustered_embeddings(spark, n=90)
    out = hierarchical_cells(df, n_coarse=4, n_fine=3, n_iter=2).collect()
    assert len(out) == 90
    assert len({r["id"] for r in out}) == 90
    assert all(r["sub"] >= 0 and r["cell1"] >= 0 for r in out)


def test_hierarchical_pair_validity_floor(spark):
    """Every emitted pair must be a genuine duplicate: recomputing the
    cosine row-wise confirms sim >= threshold and id_a < id_b."""
    import numpy as np

    from data_engineering_assignment_spark.operators.similarity import (
        semantic_dup_pairs_hier,
    )

    df = _clustered_embeddings(spark, n=100)
    vecs = {r["vec_id"]: np.array(r["embedding"]) for r in df.collect()}
    pairs = semantic_dup_pairs_hier(
        df, threshold=0.9, target_cell_rows=30
    ).collect()
    assert pairs
    for r in pairs:
        assert r["id_a"] < r["id_b"]
        a, b = vecs[r["id_a"]], vecs[r["id_b"]]
        cos = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))
        assert abs(cos - r["sim"]) < 1.5e-4
        assert r["sim"] >= 0.9


def test_semantic_dup_pairs_empty_corpus_raises(spark):
    """target_cell_rows sizing on an empty corpus fails with a clear
    ValueError instead of an opaque seeding error (r7 advice), matching
    the pq_topk guard."""
    import pytest

    from data_engineering_assignment_spark.operators.similarity import (
        semantic_dup_pairs,
        semantic_dup_pairs_hier,
    )

    empty = spark.createDataFrame([], "vec_id long, embedding array<double>")
    with pytest.raises(ValueError, match="empty corpus"):
        semantic_dup_pairs(empty, target_cell_rows=100)
    with pytest.raises(ValueError, match="empty corpus"):
        semantic_dup_pairs_hier(empty, target_cell_rows=100)


def test_ivfpq_probe_all_equals_pq(spark, sf_dir):
    """With n_probe = n_centroids every cell is probed, so the IVF-PQ
    composition must reproduce the plain PQ twin's ranked output EXACTLY
    — pinning the cell join against the full compressed scan."""
    from pyspark.sql import functions as F

    from data_engineering_assignment_spark.operators.similarity import (
        ivfpq_topk_portable,
        pq_topk_portable,
    )
    from data_engineering_assignment_spark.tables import load

    emb = load(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 5)
    pq = {
        (r["query_id"], r["rnk"]): (r["neighbor_id"], r["approx_dist"])
        for r in pq_topk_portable(emb, q, k=5).collect()
    }
    ivfpq = {
        (r["query_id"], r["rnk"]): (r["neighbor_id"], r["approx_dist"])
        for r in ivfpq_topk_portable(
            emb, q, k=5, n_centroids=8, n_probe=8
        ).collect()
    }
    assert ivfpq == pq
    assert len(pq) == 25


def test_ivfpq_candidates_only_from_probed_cells(spark, sf_dir):
    """With n_probe < n_centroids, every returned neighbor must sit in one
    of its query's probed cells (the inverted-list restriction)."""
    from pyspark.sql import functions as F

    from data_engineering_assignment_spark.operators.similarity import (
        ivfpq_topk_portable,
        portable_cells,
    )
    from data_engineering_assignment_spark.tables import load

    emb = load(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 5)
    out = ivfpq_topk_portable(emb, q, k=5, n_centroids=16, n_probe=4).collect()
    assert out
    # NOTE: ivfpq assigns on NORMALIZED vectors; portable_cells on raw —
    # cosine is scale-invariant up to ulps, so cells agree on this data
    cells = {
        r["id"]: r["cell"] for r in portable_cells(emb, n_centroids=16).collect()
    }
    # rebuild probe sets the same way (top-4 cells per query)
    from data_engineering_assignment_spark.operators.similarity import (
        _pq_prep,
        cosine,
    )
    from pyspark.sql import Window

    qp = _pq_prep(q, "vec_id", "embedding")
    cp = _pq_prep(emb, "vec_id", "embedding")
    h = (F.col("id") * F.lit(2654435761)) % F.lit(4294967296)
    seeds = cp.select("id", "vec", h.alias("h")).orderBy("h", "id").limit(16)
    w = Window.orderBy("h", "id")
    cents = seeds.select(
        (F.row_number().over(w) - 1).cast("int").alias("cell"),
        F.col("vec").alias("cent"),
    )
    aw = Window.partitionBy("id").orderBy(F.desc("_cs"), F.asc("cell"))
    probes = (
        qp.crossJoin(F.broadcast(cents))
        .withColumn("_cs", cosine(F.col("vec"), F.col("cent")))
        .withColumn("_rn", F.row_number().over(aw))
        .filter(F.col("_rn") <= 4)
        .collect()
    )
    probed = {}
    for r in probes:
        probed.setdefault(r["id"], set()).add(r["cell"])
    for r in out:
        assert cells[r["neighbor_id"]] in probed[r["query_id"]], r


def test_rp_projection_matches_numpy(spark):
    """project() equals the numpy matmul with the same literal sign matrix."""
    import numpy as np
    from pyspark.sql import functions as F

    from data_engineering_assignment_spark.operators.projection import (
        jl_signs,
        project,
    )

    rng = np.random.default_rng(5)
    dim, k = 8, 4
    vecs = rng.standard_normal((6, dim)).astype("float32")
    df = spark.createDataFrame(
        [(i, v.tolist()) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )
    got = {
        r.vec_id: r.y
        for r in df.select(
            "vec_id", project(F.col("embedding"), dim, k).alias("y")
        ).collect()
    }
    signs = np.array([jl_signs(dim, j) for j in range(k)])
    for i, v in enumerate(vecs):
        want = signs @ v.astype("float64")
        assert np.allclose(got[i], want, rtol=1e-12), i


def test_rp_distortion_concentrates(spark, sf_dir):
    """JL lemma in practice: mean distortion ~1, spread bounded."""
    from data_engineering_assignment_spark.operators.projection import rp_norm_stats
    from data_engineering_assignment_spark.tables import load

    rows = rp_norm_stats(load(spark, sf_dir, "embeddings"), dim=64, k=16).collect()
    assert rows
    ds = [r.distortion for r in rows]
    mean = sum(ds) / len(ds)
    assert 0.8 < mean < 1.2
    # k=16 gives sigma ~ sqrt(2/k) ~ 0.35; 3-sigma sanity band
    assert all(0.0 < d < 3.0 for d in ds)


def test_rp_stats_plan_no_shuffle(spark, sf_dir):
    from data_engineering_assignment_spark.operators.projection import rp_norm_stats
    from data_engineering_assignment_spark.tables import load

    plan = (
        rp_norm_stats(load(spark, sf_dir, "embeddings"), dim=64, k=16)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
