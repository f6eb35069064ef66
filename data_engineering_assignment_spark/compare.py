"""Oracle-differential comparison harness (mirrors the driver's t2 gate).

Runs a catalog query on Spark and its oracle SQL on DuckDB over the same
parquet directory, then compares: row count, column-name set, and
order-insensitive values (columns sorted by name, rows sorted, exact equality
with a small float tolerance fallback reported as a warning — the driver
hashes, so we aim for exact).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

import duckdb
import pandas as pd

from .tables import TABLE_NAMES


def run_oracle(sql: str, sf_dir: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    try:
        return con.execute(sql).df()
    finally:
        con.close()


def _canon_value(v):
    if v is None:
        return ("null",)
    if isinstance(v, float):
        if math.isnan(v):
            return ("nan",)
        return ("f", v)
    if isinstance(v, (list, tuple)):
        return ("l", tuple(_canon_value(x) for x in v))
    if hasattr(v, "item"):  # numpy scalar
        return _canon_value(v.item())
    if isinstance(v, pd.Timestamp):
        return ("t", v.isoformat())
    return (type(v).__name__, v)


def _vals_within_tol(a, b, rel: float = 1e-9, abs_: float = 1e-12) -> bool:
    """True when two canonical values are equal or are floats within
    tolerance (recursing into canonical list values)."""
    if a == b:
        return True
    if (
        isinstance(a, tuple)
        and isinstance(b, tuple)
        and len(a) == 2
        and len(b) == 2
        and a[0] == "f"
        and b[0] == "f"
    ):
        return math.isclose(a[1], b[1], rel_tol=rel, abs_tol=abs_)
    if (
        isinstance(a, tuple)
        and isinstance(b, tuple)
        and a[:1] == ("l",)
        and b[:1] == ("l",)
        and len(a[1]) == len(b[1])
    ):
        return all(_vals_within_tol(x, y, rel, abs_) for x, y in zip(a[1], b[1]))
    return False


def _rows_within_tol(a: tuple, b: tuple) -> bool:
    return len(a) == len(b) and all(
        _vals_within_tol(x, y) for x, y in zip(a, b)
    )


def _canon_frame(df: pd.DataFrame) -> list[tuple]:
    df = df.reindex(sorted(df.columns), axis=1)
    rows = [tuple(_canon_value(v) for v in row) for row in df.itertuples(index=False)]
    return sorted(rows, key=repr)


@dataclass
class CompareResult:
    name: str
    ok: bool
    detail: str = ""
    warnings: list[str] = field(default_factory=list)


def compare_frames(name: str, spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame) -> CompareResult:
    if len(spark_pdf) != len(oracle_pdf):
        return CompareResult(name, False, f"row count {len(spark_pdf)} != {len(oracle_pdf)}")
    s_cols, o_cols = sorted(spark_pdf.columns), sorted(oracle_pdf.columns)
    if s_cols != o_cols:
        return CompareResult(name, False, f"columns {s_cols} != {o_cols}")
    s_rows, o_rows = _canon_frame(spark_pdf), _canon_frame(oracle_pdf)
    mismatches = [
        (i, a, b) for i, (a, b) in enumerate(zip(s_rows, o_rows)) if a != b
    ]
    if not mismatches:
        return CompareResult(name, True)
    if all(_rows_within_tol(a, b) for _, a, b in mismatches):
        # The driver hashes EXACT values, so a tolerance-only match would
        # still fail its gate — count it as a rehearsal failure too.
        return CompareResult(
            name,
            False,
            f"{len(mismatches)}/{len(s_rows)} rows differ ONLY in floats "
            "within rel 1e-9 — the driver hashes exact values and would "
            "fail this; route the column through the decimal detour "
            "(operators/aggregates.dround) for bit-exact results",
        )
    i, a, b = mismatches[0]
    return CompareResult(
        name,
        False,
        f"{len(mismatches)}/{len(s_rows)} rows differ; first at sorted-row {i}:\n"
        f"  spark : {a}\n  oracle: {b}",
    )


def check_query(spark, name: str, sf_dir: str) -> CompareResult:
    from .queries import load_catalog

    q = load_catalog()[name]
    if q.oracle is None:
        df = q.build(spark, sf_dir)
        n = df.count()
        return CompareResult(name, True, f"rows-only check: {n} rows")
    spark_pdf = q.build(spark, sf_dir).toPandas()
    oracle_pdf = run_oracle(q.oracle, sf_dir)
    return compare_frames(name, spark_pdf, oracle_pdf)
