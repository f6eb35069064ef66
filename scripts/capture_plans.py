"""Capture .explain("formatted") for named queries into plans/<tag>/.

Usage: python scripts/capture_plans.py <outdir> <suffix> [query ...]

Writes plans/<outdir>/<query>_<suffix>.txt for each named query (default:
every catalog query). Explain-only — no query execution — so it is safe
to run alongside nothing else in a few seconds; it still builds each
DataFrame, so imports/fixture setup run.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from data_engineering_assignment_spark.queries import load_catalog
from data_engineering_assignment_spark.session import get_spark


def main() -> None:
    outdir, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("capture-plans")
    spark.sparkContext.setLogLevel("OFF")
    catalog = load_catalog()
    if not names:
        names = list(catalog)
    base = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "..", "plans", outdir
    )
    os.makedirs(base, exist_ok=True)
    for name in names:
        try:
            df = catalog[name].build(spark, sf_dir)
            txt = df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:  # noqa: BLE001
            txt = f"EXPLAIN FAILED: {exc}\n"
        with open(os.path.join(base, f"{name}_{suffix}.txt"), "w") as f:
            f.write(txt)
        print(name, flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
