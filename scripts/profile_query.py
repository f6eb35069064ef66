"""Per-query job/stage profiler (guide §1: measure first, empirically).

Runs named catalog queries through the noop sink on a UI-enabled local
session and reports, per query: wall seconds (min of --reps), the number
of Spark JOBS the action fanned into (AQE stage materializations, lazy
localCheckpoints and collect()-style convergence tests each surface as
separate jobs — the job count IS the barrier count the iterative queries
are suspected to be bound on), and a per-job/stage breakdown (stage wall,
executor-summed task time, shuffle read/write bytes, Python eval presence)
pulled from the UI REST API.

Usage: python scripts/profile_query.py [--sf DIR] [--reps N] QUERY ...
Writes /tmp/profile_<query>.json per query and prints a compact summary.
Run ALONE (same contention rule as bench.py).
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession

from data_engineering_assignment_spark.queries import load_catalog
from data_engineering_assignment_spark.session import RUNTIME_CONF


def get_profile_spark() -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS") or "*"
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("profile")
        .config("spark.sql.shuffle.partitions", os.environ.get("SPARK_SHUFFLE_PARTITIONS", "64"))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "16g"))
        .config("spark.ui.enabled", "true")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    for key, value in RUNTIME_CONF.items():
        builder = builder.config(key, value)
    return builder.getOrCreate()


def rest(spark: SparkSession, path: str):
    base = spark.sparkContext.uiWebUrl
    with urllib.request.urlopen(f"{base}/api/v1/applications/{spark.sparkContext.applicationId}{path}") as r:
        return json.load(r)


def main() -> None:
    args = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reps = 2
    names = []
    it = iter(args)
    for a in it:
        if a == "--sf":
            sf_dir = next(it)
        elif a == "--reps":
            reps = int(next(it))
        else:
            names.append(a)
    spark = get_profile_spark()
    spark.sparkContext.setLogLevel("ERROR")
    catalog = load_catalog()

    # warm-up (same rationale as bench.py)
    catalog["pricing_summary"].build(spark, "/root/testdata/sf0.001").write.format("noop").mode("overwrite").save()
    catalog["embedding_near_dup"].build(spark, "/root/testdata/sf0.001").write.format("noop").mode("overwrite").save()
    from data_engineering_assignment_spark.tables import TABLE_NAMES, load

    for t in TABLE_NAMES:
        load(spark, sf_dir, t).count()

    summary = {}
    for name in names:
        sc = spark.sparkContext
        best = float("inf")
        best_group = None
        for rep in range(reps):
            group = f"profile-{name}-{rep}"
            sc.setJobGroup(group, name)
            t0 = time.perf_counter()
            catalog[name].build(spark, sf_dir).write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            sc.setJobGroup(None, None)
            if dt < best:
                best, best_group = dt, group
            spark.catalog.clearCache()
        # map jobs -> this query's best rep via the job group
        jobs = rest(spark, "/jobs")
        stages = {s["stageId"]: s for s in rest(spark, "/stages") if s["status"] != "PENDING"}
        qjobs = [j for j in jobs if j.get("jobGroup") == best_group]
        qjobs.sort(key=lambda j: j["jobId"])
        out_jobs = []
        for j in qjobs:
            jstages = []
            for sid in j.get("stageIds", []):
                s = stages.get(sid)
                if not s or s["status"] == "SKIPPED":
                    continue
                jstages.append(
                    {
                        "stage": sid,
                        "name": s["name"].split("\n")[0][:80],
                        "tasks": s["numCompleteTasks"],
                        "run_ms": s.get("executorRunTime", 0),
                        "cpu_ms": round(s.get("executorCpuTime", 0) / 1e6),
                        "sh_read_mb": round(s.get("shuffleReadBytes", 0) / 1e6, 2),
                        "sh_write_mb": round(s.get("shuffleWriteBytes", 0) / 1e6, 2),
                        "input_mb": round(s.get("inputBytes", 0) / 1e6, 2),
                    }
                )
            sub = j.get("submissionTime")
            comp = j.get("completionTime")
            out_jobs.append(
                {
                    "job": j["jobId"],
                    "desc": (j.get("description") or j.get("name", ""))[:80],
                    "n_stages": len(jstages),
                    "stages": jstages,
                    "submitted": sub,
                    "completed": comp,
                }
            )
        prof = {"query": name, "wall_s": round(best, 3), "n_jobs": len(out_jobs), "jobs": out_jobs}
        with open(f"/tmp/profile_{name}.json", "w") as f:
            json.dump(prof, f, indent=1)
        total_run = sum(s["run_ms"] for j in out_jobs for s in j["stages"])
        n_stages = sum(j["n_stages"] for j in out_jobs)
        summary[name] = {
            "wall_s": round(best, 3),
            "n_jobs": len(out_jobs),
            "n_stages": n_stages,
            "task_run_s": round(total_run / 1000, 2),
        }
        print(json.dumps({name: summary[name]}), flush=True)
    spark.stop()
    print(json.dumps(summary, indent=1))


if __name__ == "__main__":
    main()
