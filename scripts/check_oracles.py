"""Run every catalog query against its DuckDB oracle (driver-gate rehearsal).

Usage: python scripts/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from data_engineering_assignment_spark.compare import check_query
from data_engineering_assignment_spark.queries import load_catalog
from data_engineering_assignment_spark.session import get_spark


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    names = sys.argv[2:] or list(load_catalog())
    spark = get_spark("oracle-check", shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")
    failures = 0
    for name in names:
        t0 = time.time()
        try:
            res = check_query(spark, name, sf_dir)
        except Exception as exc:  # noqa: BLE001
            failures += 1
            print(f"FAIL  {name}: EXCEPTION {type(exc).__name__}: {exc}")
            continue
        dt = time.time() - t0
        status = "ok  " if res.ok else "FAIL"
        if not res.ok:
            failures += 1
        print(f"{status}  {name}  ({dt:.1f}s)  {res.detail}")
    print(f"\n{len(names) - failures}/{len(names)} queries pass")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
