"""Generate the sf1 scale-probe dataset by 10x replication of sf0.1.

The driver's testdata stops at sf0.1; the empirical scaling probe
(scripts/scale_probe.py, results in SCALE.md) needs one decade more. Each
SF-scaled table is replicated 10x with per-replica key offsets so foreign
keys stay consistent within a replica and join fan-outs scale LINEARLY
(replica r's orders reference replica r's customers, and so on). Fixed
dimensions (region, nation) are copied unchanged, exactly like the driver's
own scaling.

Content perturbation keeps duplicate/near-duplicate structure linear too —
a naive 10x copy would make every document 10-way identical, growing LSH
bucket pair counts QUADRATICALLY instead of modeling a 10x-larger corpus:

  * documents: every token of replica r > 0 gets an ``x{r}`` suffix —
    replica vocabularies are disjoint, so shingle/minhash/simhash structure
    within a replica is preserved exactly while nothing collides across
    replicas (vocabulary grows 10x, as a real corpus decade would).
    n_chars is recomputed from the perturbed text.
  * embeddings: replica r > 0 applies a fixed per-replica permutation of
    the 64 dimensions — an orthogonal transform, so norms and all
    WITHIN-replica cosines are bit-preserved while cross-replica cosines
    decorrelate. label is kept (label distribution unchanged).

Output: /root/repo/.scale/sf1/<table>.parquet (directories, 32 files each —
a 10x dataset legitimately has many row groups, which is exactly what scan
parallelism looks like off local[32] too). Deterministic: no RNG anywhere.

Usage: python scripts/make_scale_data.py [out_dir]
"""

from __future__ import annotations

import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F

from data_engineering_assignment_spark.session import get_spark
from data_engineering_assignment_spark.tables import load

SRC = "/root/testdata/sf0.1"
KEY_OFF = 100_000_000  # above every sf0.1 key
REPLICAS = 10
DIM = 64

# deterministic per-replica dimension permutation: stride by a unit
# coprime with 64 (odd), offset by the replica index
PERMS = {
    r: [((2 * r + 1) * j + 3 * r) % DIM for j in range(DIM)] for r in range(REPLICAS)
}


def _off(col: str, r: int):
    return (F.col(col) + F.lit(r * KEY_OFF)).alias(col)


def replicate(df: DataFrame, r: int, name: str) -> DataFrame:
    if name == "customer":
        return df.select(_off("c_custkey", r), "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
    if name == "supplier":
        return df.select(_off("s_suppkey", r), "s_name", "s_nationkey", "s_acctbal")
    if name == "part":
        return df.select(_off("p_partkey", r), "p_name", "p_brand", "p_type", "p_size", "p_retailprice")
    if name == "orders":
        return df.select(
            _off("o_orderkey", r), _off("o_custkey", r),
            "o_orderstatus", "o_totalprice", "o_orderdate", "o_orderpriority",
        )
    if name == "lineitem":
        return df.select(
            _off("l_orderkey", r), _off("l_partkey", r), _off("l_suppkey", r),
            "l_linenumber", "l_quantity", "l_extendedprice", "l_discount",
            "l_tax", "l_returnflag", "l_linestatus", "l_shipdate",
        )
    if name == "events":
        return df.select(
            _off("event_id", r), "ts", _off("user_id", r), "event_type", "value", "props"
        )
    if name == "documents":
        if r == 0:
            return df
        text = F.concat_ws(
            " ", F.transform(F.split(F.col("text"), " "), lambda t: F.concat(t, F.lit(f"x{r}")))
        )
        return df.select(
            _off("doc_id", r), text.alias("text"), "lang", "source",
            F.length(text).cast("long").alias("n_chars"),
        )
    if name == "embeddings":
        perm = PERMS[r]
        emb = F.array(*[F.col("embedding")[p] for p in perm]).alias("embedding")
        return df.select(_off("vec_id", r), emb, "label")
    raise ValueError(name)


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.scale/sf1"
    if os.path.exists(out):
        shutil.rmtree(out)
    os.makedirs(out)
    spark = get_spark("make-scale-data")
    spark.sparkContext.setLogLevel("ERROR")
    for name in ["region", "nation"]:
        load(spark, SRC, name).write.mode("overwrite").parquet(f"{out}/{name}.parquet")
    for name in ["customer", "supplier", "part", "orders", "lineitem", "events", "documents", "embeddings"]:
        src = load(spark, SRC, name)
        full = None
        for r in range(REPLICAS):
            rep = replicate(src, r, name)
            full = rep if full is None else full.unionByName(rep)
        full.repartition(32).write.mode("overwrite").parquet(f"{out}/{name}.parquet")
        print(f"{name}: {spark.read.parquet(f'{out}/{name}.parquet').count()} rows", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
