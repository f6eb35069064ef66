"""Custom Python DataSource (Spark 4 DataSource API): a deterministic
synthetic-documents generator.

Demonstrates the engine's connector surface beyond file formats — the
``pyspark.sql.datasource`` API plugs user Python sources into the normal
``spark.read.format(...)`` path with real partition-parallel reads (each
``InputPartition`` generates an independent doc_id range on an executor, so
generation scales with the cluster like any scan; no driver materialization,
no files).

Determinism: content derives from ``doc_id`` through a splitmix-style integer
mix — no RNG state, so the same (n, partitions) options yield byte-identical
tables on every run, executor, and engine. That property is what makes the
source usable for scale testing and for cross-engine oracles.

Usage::

    spark.dataSource.register(SyntheticDocsDataSource)
    df = (spark.read.format("synthetic_docs")
          .option("n", 10_000).option("partitions", 8).load())
"""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

# Same flavor of vocabulary as the driver's documents table — content is
# synthetic engine-words; what matters is determinism, not realism.
VOCAB = [
    "spark", "query", "table", "scan", "join", "merge", "sort", "window",
    "batch", "stream", "filter", "agg", "row", "column", "vector", "hash",
    "the", "a", "of", "and", "to", "in", "is", "it",
]

LANGS = ["en", "fi", "sv", "de"]
SOURCES = ["src0", "src1", "src2", "src3"]

_MASK = (1 << 63) - 1


def _mix(x: int) -> int:
    """splitmix64-style avalanche (63-bit, pure-Python int arithmetic)."""
    x = (x + 0x9E3779B97F4A7C15) & _MASK
    x = ((x ^ (x >> 30)) * 0xBF58476D1CE4E5B9) & _MASK
    x = ((x ^ (x >> 27)) * 0x94D049BB133111EB) & _MASK
    return x ^ (x >> 31)


def make_doc(doc_id: int) -> tuple[int, str, str, str, int]:
    """The one deterministic row function (shared by reader and tests)."""
    h = _mix(doc_id)
    n_tokens = 20 + (h % 101)
    words = []
    w = h
    for _ in range(n_tokens):
        w = _mix(w)
        words.append(VOCAB[w % len(VOCAB)])
    text = " ".join(words)
    return (
        doc_id,
        text,
        LANGS[_mix(doc_id + 1) % len(LANGS)],
        SOURCES[_mix(doc_id + 2) % len(SOURCES)],
        len(text),
    )


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class SyntheticDocsReader(DataSourceReader):
    def __init__(self, options):
        self.n = int(options.get("n", 1000))
        self.num_partitions = int(options.get("partitions", 8))

    def partitions(self):
        per = max(1, -(-self.n // self.num_partitions))
        return [
            _RangePartition(lo, min(lo + per, self.n))
            for lo in range(0, self.n, per)
        ]

    def read(self, partition: _RangePartition):
        for doc_id in range(partition.start, partition.end):
            yield make_doc(doc_id)


class SyntheticDocsDataSource(DataSource):
    """``spark.read.format("synthetic_docs")`` — options: n, partitions."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_docs"

    def schema(self) -> str:
        return "doc_id bigint, text string, lang string, source string, n_chars bigint"

    def reader(self, schema) -> SyntheticDocsReader:
        return SyntheticDocsReader(self.options)


def register_synthetic_docs(spark) -> None:
    spark.dataSource.register(SyntheticDocsDataSource)
