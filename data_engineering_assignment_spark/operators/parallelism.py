"""Input-parallelism guard for CPU-heavy narrow stages.

A parquet scan's parallelism is bounded by the file's row groups: a small-SF
table written as ONE file with ONE row group scans as ONE task, no matter how
many cores the cluster has (byte-range splits below a row group produce empty
tasks, so ``maxPartitionBytes`` / ``openCostInBytes`` tuning cannot help).
That single task then serializes every downstream narrow operator — shingle
explodes, per-token folds — on one core: measured at sf0.1, the whole MinHash
shingle explode ran as 1 task on a 32-core box and dominated the query.

:func:`ensure_min_parallelism` repartitions ONLY when the input's partition
count is below the session's default parallelism. At production scale a
100 TB table has thousands of row groups, the guard is a no-op, and no
shuffle is added where the scan already parallelizes; at small scale it
costs one shuffle of the compact input rows (kilobytes here) to unlock
every core for the expensive narrow stage that follows.

Call it on NARROW (pre-shuffle) inputs only: converting a post-shuffle plan
to an RDD to count partitions can trigger adaptive stage execution.

Apply it ONLY where the guarded stage's per-row CPU dominates the guard's
overhead (one extra shuffle + an RDD partition-count probe, ~0.2-0.7 s at
bench scale). Measured A/B at sf0.1: word-SHINGLE pipelines (concat_ws
string building per n-gram — minhash signatures, boilerplate, benchmark
decontamination) drop 30-60%, while cheap whitespace-token explodes
(tfidf, vocab build/encode, simhash) get 1.5-2x SLOWER with the guard —
their narrow stage was never the bottleneck.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_min_parallelism(df: DataFrame) -> DataFrame:
    """Repartition ``df`` to the session default parallelism iff its current
    partitioning is narrower — the row-group-bound small-file guard. The
    round-robin repartition is deterministic (Spark sorts within input
    partitions before distributing) and every caller's downstream
    aggregation is partitioning-independent, so results never change."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)
