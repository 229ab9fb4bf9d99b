"""Per-query time decomposition for the headline bench set (guide §1).

For each headline query, after bench-identical warmup, measures
separately across 3 passes (per-phase minimum):

- build_s: ``specs[name].fn(spark, sf_dir)`` — Python-side plan
  construction (py4j traffic, file-stat gates, any construction-time
  collect jobs);
- exec_s:  the noop-sink write of the pre-built DataFrame (planning +
  execution on the JVM);
- jobs/stages/tasks: Spark status-tracker deltas for the exec phase —
  AQE query-stage count and task volume, the per-stage fixed-cost
  multiplier at floor-bound scales.

    python tools/profile_headline.py [name ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from pyspark.sql import SparkSession

    from duckdb_distributed_execution_spark.queries import all_queries

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("dde-profile")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "48g")
        .config("spark.locality.wait", "0s")
        .config("spark.sql.codegen.cache.maxEntries", "5000")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    tracker = spark.sparkContext.statusTracker()

    specs = all_queries()
    names = sys.argv[1:] or [
        n for n, s in sorted(specs.items()) if s.headline
    ]

    for name in names:  # warm pass (bench parity)
        spark.catalog.clearCache()
        specs[name].fn(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()

    out = {}
    for name in names:
        best = {"build_s": float("inf"), "exec_s": float("inf")}
        for _ in range(3):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            df = specs[name].fn(spark, sf_dir)
            t1 = time.perf_counter()
            j0 = tracker.getJobIdsForGroup(None)
            df.write.format("noop").mode("overwrite").save()
            t2 = time.perf_counter()
            j1 = tracker.getJobIdsForGroup(None)
            best["build_s"] = min(best["build_s"], t1 - t0)
            if t2 - t1 < best["exec_s"]:
                best["exec_s"] = t2 - t1
                new_jobs = sorted(set(j1) - set(j0))
                nstages = ntasks = 0
                for j in new_jobs:
                    ji = tracker.getJobInfo(j)
                    if ji is None:
                        continue
                    for sid in ji.stageIds:
                        si = tracker.getStageInfo(sid)
                        if si is not None and si.numTasks > 0:
                            nstages += 1
                            ntasks += si.numTasks
                best["jobs"] = len(new_jobs)
                best["stages"] = nstages
                best["tasks"] = ntasks
        out[name] = {
            "build_s": round(best["build_s"], 3),
            "exec_s": round(best["exec_s"], 3),
            "jobs": best.get("jobs"),
            "stages": best.get("stages"),
            "tasks": best.get("tasks"),
        }
        print(name, json.dumps(out[name]), flush=True)

    tot_b = sum(v["build_s"] for v in out.values())
    tot_e = sum(v["exec_s"] for v in out.values())
    print(json.dumps({"total_build_s": round(tot_b, 3),
                      "total_exec_s": round(tot_e, 3)}))


if __name__ == "__main__":
    main()
