"""2D Pareto frontier (skyline) — distributed prune-and-merge.

Skyline semantics per Borzsony, Kossmann & Stocker, "The Skyline
Operator" (ICDE 2001): a row survives iff no other row strictly
dominates it — is >= on both dimensions and > on at least one. Exact
duplicates never dominate each other, so they all survive together.

The distributed algorithm exploits that skylines compose:
``skyline(A ∪ B) = skyline(skyline(A) ∪ skyline(B))``. Phase 1 prunes
each uniform hash bucket to its local skyline with one cumulative-max
window (bucket keys are synthetic hashes, never content — no hot-key
straggler, CLAUDE.md window invariant). Any globally dominated row is
dominated by a transitive chain of dominators that ends in a bucket
survivor (strict domination is a DAG), so the prune is lossless. Phase 2
resolves the surviving candidates exactly: for random-order 2D data
E[|skyline|] = H_n ≈ ln n, so the candidate set is ~k·ln(n/k) rows —
logarithmic, the same documented-bound discipline as the global
top-k-with-ranks pattern (CLAUDE.md). Its window runs over the
candidates' DISTINCT x values only.

Phase-1 subtlety: after sorting (x desc, y desc, key), the simple
``y >= cummax(previous y)`` filter keeps a row that is dominated by an
equal-y, higher-x predecessor — deliberately. Dropping it would need a
second frame; keeping it only grows the candidate set, and phase 2
removes it exactly (the ``better_max < y`` strict test).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pareto_max_2d(
    df: DataFrame,
    x_col: str,
    y_col: str,
    tie_col: str,
    n_buckets: int = 64,
) -> DataFrame:
    """Rows of ``df`` not strictly dominated on (``x_col``, ``y_col``),
    both maximized. ``tie_col`` supplies the deterministic total order
    within equal (x, y) pairs (any unique key column)."""
    x, y = F.col(x_col), F.col(y_col)
    bucketed = df.withColumn(
        "_sky_bucket", F.pmod(F.xxhash64(tie_col), F.lit(n_buckets))
    )
    wb = (
        Window.partitionBy("_sky_bucket")
        .orderBy(x.desc(), y.desc(), F.asc(tie_col))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cand = (
        bucketed.withColumn("_prev_max", F.max(y_col).over(wb))
        .filter(F.col("_prev_max").isNull() | (y >= F.col("_prev_max")))
        .drop("_sky_bucket", "_prev_max")
    )
    gmax = cand.groupBy(x_col).agg(F.max(y_col).alias("_gmax"))
    wp = Window.orderBy(x.desc()).rowsBetween(Window.unboundedPreceding, -1)
    frontier = gmax.withColumn("_better_max", F.max("_gmax").over(wp))
    return (
        cand.join(frontier, x_col)
        .filter(
            (y == F.col("_gmax"))
            & (F.col("_better_max").isNull() | (F.col("_better_max") < y))
        )
        .drop("_gmax", "_better_max")
    )
