"""Count-Min sketch: overestimate guarantee, exactness without collisions,
mergeability, and partitioning-independence."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_engineering_assignment_spark.operators.sketches import (
    cms_estimate,
    cms_merge,
    cms_sketch,
)


def _stream(spark, rows):
    return spark.createDataFrame([(t,) for t in rows], "tok string")


def test_cms_never_undercounts_and_is_exact_when_wide(spark):
    import random

    rng = random.Random(7)
    vocab = ["tok%d" % i for i in range(50)]
    stream = [rng.choice(vocab) for _ in range(2000)] + ["hot"] * 500
    df = _stream(spark, stream)
    exact = {r["tok"]: r["n"] for r in df.groupBy("tok").agg(F.count("*").alias("n")).collect()}

    # narrow sketch: must never undercount
    sk = cms_sketch(df, "tok", depth=4, width=32)
    items = df.select("tok").distinct()
    est = {r["tok"]: r["cms_est"] for r in cms_estimate(sk, items, "tok", 4, 32).collect()}
    assert all(est[t] >= exact[t] for t in exact)
    assert est["hot"] >= 500

    # wide sketch: with |vocab| << width, the hot key is almost surely
    # collision-free in at least one of 4 rows → exact
    skw = cms_sketch(df, "tok", depth=4, width=4096)
    estw = {r["tok"]: r["cms_est"] for r in cms_estimate(skw, items, "tok", 4, 4096).collect()}
    assert estw["hot"] == exact["hot"]


def test_cms_merge_equals_whole_sketch(spark):
    a = _stream(spark, ["x"] * 10 + ["y"] * 3)
    b = _stream(spark, ["x"] * 5 + ["z"] * 7)
    whole = cms_sketch(a.unionByName(b), "tok", depth=3, width=64)
    merged = cms_merge(
        cms_sketch(a, "tok", depth=3, width=64),
        cms_sketch(b, "tok", depth=3, width=64),
    )
    assert sorted(map(tuple, whole.collect())) == sorted(map(tuple, merged.collect()))


def test_cms_partitioning_independent(spark):
    df = _stream(spark, ["a", "b", "a", "c"] * 100)
    s1 = sorted(map(tuple, cms_sketch(df, "tok").collect()))
    s2 = sorted(map(tuple, cms_sketch(df.repartition(13), "tok").collect()))
    assert s1 == s2


def test_cms_weighted(spark):
    df = spark.createDataFrame([("a", 5), ("a", 7), ("b", 1)], "tok string, w long")
    sk = cms_sketch(df, "tok", depth=2, width=128, weight_col="w")
    est = {
        r["tok"]: r["cms_est"]
        for r in cms_estimate(sk, df.select("tok").distinct(), "tok", 2, 128).collect()
    }
    assert est["a"] >= 12 and est["b"] >= 1


def test_cms_sketch_streaming_matches_batch(spark, tmp_path):
    """cms_sketch is a plain groupBy aggregation, so the SAME code runs as
    a Structured Streaming query — the streamed sketch over a file source
    must equal the batch sketch bit-for-bit."""
    from data_engineering_assignment_spark import streaming as st

    docs = spark.createDataFrame(
        [("a b c a",), ("b b hot hot hot",), ("c a hot",)], "text string"
    )
    path = str(tmp_path / "toks")
    docs.select(F.explode(F.split("text", " ")).alias("tok")).write.parquet(path)

    batch = cms_sketch(spark.read.parquet(path), "tok", depth=3, width=64)
    stream_in = st.read_parquet_stream(spark, path)
    streamed = st.run_available_now(
        cms_sketch(stream_in, "tok", depth=3, width=64)
    )
    assert sorted(map(tuple, batch.collect())) == sorted(map(tuple, streamed.collect()))
