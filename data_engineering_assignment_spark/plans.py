"""Physical-plan inspection helpers.

Perf properties (filter pushdown, column pruning, broadcast joins, partial
aggregation) are asserted in tests via these helpers, so a regression that
silently turns a broadcast join into a 100 TB shuffle fails CI — the plan IS
part of the contract (SURVEY.md §4).
"""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import DataFrame


def _explain(df: DataFrame, mode: str) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode=mode)
    return buf.getvalue()


def formatted_plan(df: DataFrame) -> str:
    return _explain(df, "formatted")


def simple_plan(df: DataFrame) -> str:
    return _explain(df, "simple")


def pushed_filters(df: DataFrame) -> str:
    """The PushedFilters lines of every file scan in the plan."""
    return "\n".join(
        line.strip()
        for line in formatted_plan(df).splitlines()
        if "PushedFilters" in line
    )


def read_schemas(df: DataFrame) -> str:
    """The ReadSchema lines (column pruning evidence) of every file scan."""
    return "\n".join(
        line.strip()
        for line in formatted_plan(df).splitlines()
        if "ReadSchema" in line
    )


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in simple_plan(df) or "BroadcastNestedLoopJoin" in simple_plan(df)


def has_partial_aggregation(df: DataFrame) -> bool:
    """Map-side combine present: >= 2 HashAggregate nodes around a shuffle."""
    return simple_plan(df).count("HashAggregate") >= 2


def count_shuffles(df: DataFrame) -> int:
    return simple_plan(df).count("Exchange")
