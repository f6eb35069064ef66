"""Skew-mitigation operators.

AQE's skew-join splitting (enabled in ``session.RUNTIME_CONF``) handles most
skew at runtime; these operators cover the cases AQE cannot: a *broadcast-
ineligible* dimension joined on a heavy-hitter key, and aggregations whose
single hot group overwhelms one reducer.

``salted_join`` replicates the (smaller) build side ``salt`` ways and
scatters the probe side uniformly across the replicas, so a key holding 50%
of the rows spreads over ``salt`` reducers instead of one.

``two_phase_agg`` is the aggregation analog: pre-aggregate on (key, salt),
then combine — the classic partial-aggregation rescue for hot group keys
when the aggregate itself is algebraic.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(
    probe: DataFrame,
    build: DataFrame,
    on: str,
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the build side replicated ``salt`` ways.

    ``probe`` (large, skewed) gets a uniform random-ish salt derived
    deterministically from its row content hash; ``build`` (smaller) is
    exploded once per salt value. Join key becomes (on, _salt); output drops
    the salt. Deterministic: the salt is a hash of the probe row's key plus
    a per-row monotonic id substitute (xxhash64 of all columns).
    """
    probe_salted = probe.withColumn(
        "_salt", F.pmod(F.xxhash64(*probe.columns), F.lit(salt)).cast("int")
    )
    build_salted = build.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    return (
        probe_salted.join(build_salted, on=[on, "_salt"], how=how).drop("_salt")
    )


def two_phase_agg(
    df: DataFrame,
    keys: list[str],
    aggs: list[tuple[str, str, str]],
    salt: int = 16,
) -> DataFrame:
    """Two-phase (salted) aggregation for hot group keys.

    ``aggs``: (column, fn, alias) with fn in {sum, count, min, max} — the
    algebraic aggregates that re-combine exactly. Phase 1 aggregates on
    (keys, salt); phase 2 combines partials per key.
    """
    combiners = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}
    phase1_exprs = []
    for col, fn, alias in aggs:
        if fn == "count":
            phase1_exprs.append(F.count(F.lit(1)).alias(f"_p_{alias}"))
        elif fn in ("sum", "min", "max"):
            phase1_exprs.append(getattr(F, fn)(col).alias(f"_p_{alias}"))
        else:
            raise ValueError(f"non-algebraic aggregate: {fn}")
    salted = df.withColumn(
        "_salt", F.pmod(F.xxhash64(*df.columns), F.lit(salt)).cast("int")
    )
    partial = salted.groupBy(*keys, "_salt").agg(*phase1_exprs)
    final_exprs = [
        combiners[fn](f"_p_{alias}").alias(alias) for _, fn, alias in aggs
    ]
    return partial.groupBy(*keys).agg(*final_exprs)
