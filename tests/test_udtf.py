"""Python UDTF surface: SQL-registered table function + parity with the
JVM-side chunker it mirrors."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_engineering_assignment_spark.functions.udtfs import (
    ChunkText,
    register_udtfs,
)
from data_engineering_assignment_spark.operators.corpus import token_chunks


def test_chunk_udtf_from_sql(spark):
    register_udtfs(spark)
    rows = spark.sql(
        "SELECT * FROM chunk_text('a b c d e f g', 3, 2)"
    ).collect()
    got = [(r["chunk_id"], r["n_chunk_tokens"], r["chunk"]) for r in rows]
    assert got == [
        (0, 3, "a b c"),
        (1, 3, "c d e"),
        (2, 3, "e f g"),
        (3, 1, "g"),
    ]


def test_chunk_udtf_matches_jvm_chunker(spark):
    """The Python UDTF and the JVM sequence+explode chunker must agree on
    chunk boundaries and content hashes."""
    docs = spark.createDataFrame(
        [(i, " ".join(f"w{i}_{j}" for j in range(1 + 7 * i))) for i in range(6)],
        "doc_id bigint, text string",
    )
    register_udtfs(spark)
    docs.createOrReplaceTempView("udtf_docs")
    via_udtf = sorted(
        (r["doc_id"], r["chunk_id"], r["n_chunk_tokens"], r["h"])
        for r in spark.sql(
            "SELECT d.doc_id, c.chunk_id, c.n_chunk_tokens, md5(c.chunk) AS h "
            "FROM udtf_docs d, LATERAL chunk_text(d.text, 4, 3) c"
        ).collect()
    )
    via_jvm = sorted(
        (r["doc_id"], r["chunk_id"], r["n_chunk_tokens"], r["chunk_md5"])
        for r in token_chunks(docs, size=4, stride=3).collect()
    )
    assert via_udtf == via_jvm and len(via_jvm) > 6
