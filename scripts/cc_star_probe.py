"""One-off solo probe: dedup_clusters_star cost anatomy at sf0.1.

Times (min of 2) the full catalog query, the pair-generation prefix
alone, and one cc_star pass on the same pairs (full - prefix ~= the CC
loop cost). Run ALONE (JVM contention rule); used to decide the round-9
cc_star optimizations. Kept in scripts/ so future rounds can re-measure.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench as _bench
from data_engineering_assignment_spark.queries import load_catalog
from data_engineering_assignment_spark.session import get_spark
from data_engineering_assignment_spark.tables import TABLE_NAMES, load

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"


def timed(fn, reps=2):
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return round(best, 3)


def main() -> None:
    print("markers pre:", _bench.contention_markers())
    spark = get_spark("cc-star-probe")
    cat = load_catalog()
    for t in TABLE_NAMES:
        load(spark, SF, t)
    q = cat["dedup_clusters_star"]

    def run_full():
        q.build(spark, SF).write.format("noop").mode("overwrite").save()
        spark.catalog.clearCache()

    print("full query:", timed(run_full))

    # pair-generation prefix alone (the exact-Jaccard pairs feeding cc_star)
    from data_engineering_assignment_spark.operators.dedup import (
        ngram_jaccard_pairs,
    )

    docs = load(spark, SF, "documents")

    def run_pairs():
        ngram_jaccard_pairs(docs, threshold=0.5).write.format("noop").mode(
            "overwrite"
        ).save()
        spark.catalog.clearCache()

    print("pairs prefix:", timed(run_pairs))

    # cc_star alone on the same pairs (full - prefix ~= the CC loop cost)
    from data_engineering_assignment_spark.operators.graphs import cc_star

    pairs = ngram_jaccard_pairs(docs, threshold=0.5)
    t0 = time.perf_counter()
    cc_star(pairs).write.format("noop").mode("overwrite").save()
    print("cc_star on fresh pairs:", round(time.perf_counter() - t0, 3))
    print("markers post:", _bench.contention_markers())


if __name__ == "__main__":
    main()
