"""As-of (most-recent-prior) join — the canonical time-series operator Spark
has no native physical plan for.

Composed from built-ins with ONE shuffle and no range join: tag both sides,
union by (key, time), and carry the right side's latest ROW forward with a
running `last(struct(values), ignorenulls=True)` window — the struct keeps
all value columns from the single matched row (NULLs included), exactly
DuckDB ASOF JOIN semantics. Cost is a single
sort-within-partition of |left|+|right| rows keyed by the join key — linear
at any scale, no per-row lookups, no broadcast requirement. (The
pandas-on-Spark `merge_asof` does a similar union-sort under the hood; this
version stays in pure DataFrame expressions and supports exact oracle
verification against DuckDB's native ASOF JOIN.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    by: str,
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    strict: bool = True,
) -> DataFrame:
    """For each left row, attach ``value_cols`` from the latest right row of
    the same ``by`` key with right_ts < left_ts (``strict``) or <= left_ts.

    Output: all left columns + value_cols (null when no prior right row).
    Ties at the same instant: with ``strict=True`` a simultaneous right row
    is NOT visible to the left row (matches DuckDB ``ASOF JOIN … ON t < t``).
    """
    left_dtypes = dict(left.dtypes)
    right_dtypes = dict(right.dtypes)
    l_tagged = left.withColumn("_t", F.col(left_ts)).withColumn("_side", F.lit(1))
    for c in value_cols:
        l_tagged = l_tagged.withColumn(c, F.lit(None).cast(right_dtypes[c]))
    r_tagged = right.select(
        F.col(by),
        F.col(right_ts).alias("_t"),
        F.lit(0).alias("_side"),
        *[F.col(c) for c in value_cols],
    )
    for c in left.columns:
        if c != by:
            r_tagged = r_tagged.withColumn(c, F.lit(None).cast(left_dtypes[c]))
    unioned = l_tagged.unionByName(r_tagged.select(*l_tagged.columns))
    # strict: left rows sort BEFORE right rows at equal _t, so a simultaneous
    # right row is not yet visible; non-strict: right rows sort first.
    # value_cols as trailing sort keys make the winner among exactly-equal
    # right timestamps deterministic across partitionings (last = max values).
    side_order = F.asc("_side") if not strict else F.desc("_side")
    w = (
        Window.partitionBy(by)
        .orderBy(F.asc("_t"), side_order, *[F.asc(c) for c in value_cols])
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    # Carry the whole matched right ROW as one struct (null only for left
    # rows), not each value column independently: per-column
    # last(..., ignorenulls) would skip a NULL in one column and take it from
    # an older right row, mixing columns across rows — DuckDB ASOF JOIN
    # returns the matched row's values including its NULLs.
    right_row = F.when(
        F.col("_side") == 0, F.struct(*[F.col(c) for c in value_cols])
    )
    carried = unioned.select(
        "*", F.last(right_row, ignorenulls=True).over(w).alias("_asof_row")
    )
    out = carried.filter(F.col("_side") == 1)
    for c in value_cols:
        out = out.drop(c).withColumn(c, F.col("_asof_row").getField(c))
    return out.drop("_t", "_side", "_asof_row")
