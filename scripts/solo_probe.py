"""5-rep solo probe: adjudicate single-query bench flags (BASELINE.md policy).

bench.py's min-of-2 can still carry roaming multi-second transients (r7:
simhash_hamming_pairs 5.2 s one run, 4.1 s orders_cube the next, both
~0.5-2 s steady). Before believing any per-query regression, probe it with
5 full executions in a calm window (contention markers embedded pre/post,
same discriminator as bench.py) and read the MIN + the spread.

Run ALONE — concurrent Spark JVMs on this box produce garbage timings.

Usage: python scripts/solo_probe.py QUERY [QUERY ...] [--reps N] [--sf DIR]
Prints one JSON line per query plus a final summary line; mirrors the full
result to PROBE_LOCAL.json beside the repo root.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import contention_markers, run_query  # noqa: E402
from data_engineering_assignment_spark.queries import load_catalog  # noqa: E402
from data_engineering_assignment_spark.session import get_spark  # noqa: E402
from data_engineering_assignment_spark.tables import TABLE_NAMES, load  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()

    spark = get_spark("solo_probe")
    spark.sparkContext.setLogLevel("OFF")
    catalog = load_catalog()
    # Same warm-up as bench.py: JVM/codegen + Python-worker pool + table I/O.
    run_query(catalog["pricing_summary"].build(spark, "/root/testdata/sf0.001"))
    run_query(catalog["embedding_near_dup"].build(spark, "/root/testdata/sf0.001"))
    for t in TABLE_NAMES:
        load(spark, args.sf, t).count()

    mk_pre = contention_markers()
    out: dict[str, dict] = {}
    for name in args.queries:
        reps = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            run_query(catalog[name].build(spark, args.sf))
            reps.append(round(time.perf_counter() - t0, 3))
            spark.catalog.clearCache()
        out[name] = {"reps": reps, "min": min(reps), "median": sorted(reps)[len(reps) // 2]}
        print(json.dumps({name: out[name]}, separators=(",", ":")), flush=True)
    mk_post = contention_markers()
    result = {
        "sf": args.sf,
        "marker_st": [mk_pre[0], mk_post[0]],
        "marker_mt": [mk_pre[1], mk_post[1]],
        "probes": out,
    }
    spark.stop()
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "PROBE_LOCAL.json"), "w") as f:
        f.write(json.dumps(result, separators=(",", ":")) + "\n")
    print(json.dumps(result, separators=(",", ":")), flush=True)


if __name__ == "__main__":
    main()
