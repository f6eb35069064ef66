"""Mergeable frequency sketches (Count-Min) as plain DataFrames.

A Count-Min sketch is the classic bounded-memory frequency structure for
heavy-hitter queries over unbounded key domains: ``depth`` hash rows ×
``width`` counters, point estimate = min over rows. Represented here AS A
DATAFRAME of (d, bucket, counter) rows, it inherits Spark's execution
properties for free:

  * building is one explode (``depth`` probes per item occurrence) + one
    map-side-combinable aggregation — no per-key state, linear at any
    corpus size, never a vocabulary table;
  * sketches are MERGEABLE by union + re-aggregation (counters are sums),
    so per-partition / per-day sketches combine exactly — asserted in
    tests;
  * estimates never undercount (CM guarantees est >= true), also asserted.

Hashes are affine permutations of ``text.rolling_hash`` over a prime
modulus (the dedup-portable family, operators/dedup.py:298) rather than
xxhash64, so every counter and every estimate is reproducible in ANY
engine — the catalog query ``cms_token_counts`` oracle-checks the sketch
contents bit-for-bit against DuckDB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import PORTABLE_MOD


def cms_bucket(rh: Column, i: int, width: int) -> Column:
    """Row-``i`` bucket of an item whose portable rolling hash is ``rh``."""
    return ((F.lit(2 * i + 1) * rh + F.lit(7919 * i + 13)) % PORTABLE_MOD) % width


def cms_sketch(
    df: DataFrame,
    item_col: str,
    depth: int = 4,
    width: int = 256,
    weight_col: str | None = None,
) -> DataFrame:
    """Build the (d, bucket, counter) sketch from an item-occurrence stream.

    One row per occurrence in ``df`` (duplicates count); ``weight_col``
    switches to weighted counting. Output: depth × width rows at most.
    """
    from .text import rolling_hash

    w = F.col(weight_col).cast("long") if weight_col else F.lit(1).cast("long")
    rh = rolling_hash(item_col)
    probes = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("d"), cms_bucket(rh, i, width).alias("bucket")
                    )
                    for i in range(depth)
                ]
            )
        ).alias("p"),
        w.alias("_w"),
    )
    return probes.groupBy(F.col("p.d").alias("d"), F.col("p.bucket").alias("bucket")).agg(
        F.sum("_w").alias("counter")
    )


def bloom_position(rh: Column, i: int, m_bits: int) -> Column:
    """Probe-``i`` bit position of an item whose portable rolling hash is
    ``rh`` — delegates to :func:`cms_bucket` so the portable
    affine-permutation hash family has exactly ONE definition (a drift in
    either family would silently desynchronize every SQL oracle that
    inlines the constants)."""
    return cms_bucket(rh, i, m_bits)


def bloom_build(
    df: DataFrame,
    item_col: str,
    k: int = 4,
    m_bits: int = 1 << 14,
    hash_col: str | None = None,
) -> DataFrame:
    """Build a Bloom filter over the items as a DataFrame of DISTINCT set
    bit positions (one ``pos`` long column, at most ``min(k*|items|, m_bits)``
    rows — bounded by ``m_bits`` regardless of corpus size, hence always
    broadcast-eligible).

    The membership structure the 100 TB decontamination path wants: the
    exact benchmark-shingle set grows with the benchmark suite, but the
    filter is a fixed ``m_bits`` bits chosen for the target false-positive
    rate (k = 4 probes, m/n ≈ 8 bits/item → ~2.4% FP), so the broadcast
    cost is a constant. Building is one explode + one distinct — map-side
    combinable, linear. ``hash_col`` names a column already holding the
    item's rolling hash — callers that materialize a hashed stream skip
    the per-char fold here.
    """
    from .text import rolling_hash

    rh = F.col(hash_col) if hash_col else rolling_hash(item_col)
    return (
        df.select(
            F.explode(
                F.array(*[bloom_position(rh, i, m_bits) for i in range(k)])
            ).alias("pos")
        )
        .distinct()
    )


def bloom_maybe_contains(
    bloom: DataFrame,
    items: DataFrame,
    item_col: str,
    k: int = 4,
    m_bits: int = 1 << 14,
    flag_col: str = "bloom_hit",
    hash_col: str | None = None,
) -> DataFrame:
    """Probe each row's ``item_col`` against the filter: ``flag_col`` is
    true iff ALL ``k`` probe positions are set (the Bloom "maybe present";
    false is a certainty). ``k`` chained BROADCAST left joins, one per
    probe position — fully NARROW: the probed stream is never exploded,
    regrouped, or shuffled, each row just does k hash lookups against the
    broadcast position set (the filter is bounded by ``m_bits``, so the
    broadcasts are constant-size at any corpus size). ``hash_col`` as in
    :func:`bloom_build` — without it the per-char hash fold is inlined
    into every join condition, so pass a materialized hash column for
    anything large.
    """
    from .text import rolling_hash

    rh = F.col(hash_col) if hash_col else rolling_hash(item_col)
    out = items
    for i in range(k):
        bi = bloom.select(
            F.col("pos").alias(f"_p{i}"), F.lit(1).alias(f"_s{i}")
        )
        out = out.join(
            F.broadcast(bi), bloom_position(rh, i, m_bits) == F.col(f"_p{i}"), "left"
        )
    hit = F.lit(True)
    for i in range(k):
        hit = hit & F.col(f"_s{i}").isNotNull()
    return out.withColumn(flag_col, hit).drop(
        *[c for i in range(k) for c in (f"_p{i}", f"_s{i}")]
    )


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Merge sketches built with identical (depth, width): counters add."""
    merged = sketches[0]
    for s in sketches[1:]:
        merged = merged.unionByName(s)
    return merged.groupBy("d", "bucket").agg(F.sum("counter").alias("counter"))


def cms_estimate(
    sketch: DataFrame,
    items: DataFrame,
    item_col: str,
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Point-estimate each distinct item in ``items``: min over the depth
    rows of its counters (an absent bucket counts 0). Adds ``cms_est``.

    The sketch is depth × width rows — broadcast-sized by construction at
    any corpus size, so the probe join is a broadcast hash join.
    """
    from .text import rolling_hash

    rh = rolling_hash(item_col)
    probes = items.select(
        "*",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("d"), cms_bucket(rh, i, width).alias("bucket")
                    )
                    for i in range(depth)
                ]
            )
        ).alias("p"),
    ).select("*", F.col("p.d").alias("d"), F.col("p.bucket").alias("bucket")).drop("p")
    joined = probes.join(F.broadcast(sketch), ["d", "bucket"], "left").withColumn(
        "_c", F.coalesce(F.col("counter"), F.lit(0).cast("long"))
    )
    others = [c for c in items.columns]
    return joined.groupBy(*others).agg(F.min("_c").alias("cms_est"))
