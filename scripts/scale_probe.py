"""Empirical scaling probe: wall-time ratio sf0.1 -> sf1 (10x rows).

Runs the given queries (default: the bench board's slowest) at sf0.1 and at
the replicated sf1 dataset (scripts/make_scale_data.py), same timing policy
as bench.py (min of 2 full executions through the noop sink, clearCache
between passes, warm-up first). A query scaling linearly should show a wall
ratio well under 10x on local[32] (sf0.1 underuses the cores; sf1 amortizes
scheduling). Anything above 1.3x the row ratio (>13x) is super-linear and
needs a named cause in SCALE.md.

Run ALONE — concurrent Spark JVMs on this box produce garbage timings.

Usage: python scripts/scale_probe.py [QUERY ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_engineering_assignment_spark.queries import load_catalog
from data_engineering_assignment_spark.session import get_spark
from data_engineering_assignment_spark.tables import TABLE_NAMES, load

SF1_DIR = "/root/repo/.scale/sf1"
DEFAULT = [
    "pricing_summary",
    "events_anomaly_zscore",
    "corpus_boilerplate_3gram",
    "plusminus_player_stats",
    "dedup_minhash_lsh",
    "cosine_topk_ivf",
    "dedup_lsh_portable",
    "brand_revenue",
    "plusminus_top_by_role",
    "doc_simhash_portable",
    "decontaminate_ngram",
    "events_sessionize",
]


def timed(cat, name, spark, sf_dir) -> float:
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        cat[name].build(spark, sf_dir).write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
        spark.catalog.clearCache()
    return round(best, 3)


def main() -> None:
    names = sys.argv[1:] or DEFAULT
    if not os.path.exists(SF1_DIR):
        sys.exit(f"{SF1_DIR} missing - run scripts/make_scale_data.py first")
    spark = get_spark("scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    cat = load_catalog()
    # warm-up: codegen + python-worker pools + first-touch IO on both dirs
    cat["pricing_summary"].build(spark, "/root/testdata/sf0.001").write.format("noop").mode("overwrite").save()
    cat["embedding_near_dup"].build(spark, "/root/testdata/sf0.001").write.format("noop").mode("overwrite").save()
    for t in TABLE_NAMES:
        load(spark, "/root/testdata/sf0.1", t).count()
        load(spark, SF1_DIR, t).count()
    out = {}
    for name in names:
        t01 = timed(cat, name, spark, "/root/testdata/sf0.1")
        t1 = timed(cat, name, spark, SF1_DIR)
        out[name] = {"sf0.1": t01, "sf1": t1, "ratio": round(t1 / t01, 2)}
        print(f"{name}: sf0.1={t01}s sf1={t1}s ratio={t1 / t01:.2f}x", flush=True)
    spark.stop()
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "SCALE_PROBE.json"
    )
    # merge: probing a subset must not drop earlier queries' records
    merged = {}
    if os.path.exists(path):
        with open(path) as f:
            merged = json.load(f)
    merged.update(out)
    with open(path, "w") as f:
        json.dump(merged, f, indent=1)


if __name__ == "__main__":
    main()
