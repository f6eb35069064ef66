"""Python UDTFs (user-defined TABLE functions, Spark 4 API surface).

A UDTF maps one input row to zero-or-more output rows with a fixed schema —
the lateral-join generalization of a scalar UDF. These exist to complete
the engine's UDF surface (SURVEY.md §2.9 covers scalar/pandas UDFs; this is
the table-valued tier); they are NOT the hot path. The production chunker
is ``operators.corpus.token_chunks`` (JVM-side sequence + explode, zero
Python) — ``ChunkText`` computes the same chunking per-row in Python for
cases where imperative per-row logic is genuinely required (custom
tokenizers, stateful splitters). Registered with ``useArrow=True`` so rows
cross the boundary in Arrow batches, not pickled one at a time.
"""

from __future__ import annotations

from pyspark.sql.functions import lit, udtf


@udtf(returnType="chunk_id: bigint, n_chunk_tokens: bigint, chunk: string", useArrow=True)
class ChunkText:
    """Yield fixed-stride token chunks of a text (size 64 / stride 48
    mirrors ``token_chunks``'s defaults when called with those literals)."""

    def eval(self, text: str, size: int, stride: int):
        if text is None:
            return
        toks = text.split(" ")
        for chunk_id, start in enumerate(range(0, max(len(toks), 1), stride)):
            window = toks[start : start + size]
            yield chunk_id, len(window), " ".join(window)


def chunk_text(text_col, size: int = 64, stride: int = 48):
    """Table-function call: ``df.lateralJoin(chunk_text(...))`` or
    ``spark.sql`` after ``register_udtfs``."""
    return ChunkText(text_col, lit(size), lit(stride))


def register_udtfs(spark) -> None:
    """Make the UDTFs callable from SQL (``SELECT * FROM chunk_text(...)``)."""
    spark.udtf.register("chunk_text", ChunkText)
