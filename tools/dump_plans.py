"""Dump ``explain('formatted')`` for headline (or named) queries to
files — the round-9 plan-evidence capture.

    python tools/dump_plans.py --out plans/r09 --suffix _before [names...]

PYTHONPATH decides which code revision the plans come from; pass
--pkg-root to point at a different checkout (e.g. a git worktree of
the pre-surgery commit) while running THIS script.
"""

from __future__ import annotations

import argparse
import os
import sys


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--suffix", default="")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--pkg-root", default=None)
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    root = args.pkg_root or os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))
    )
    sys.path.insert(0, root)

    from pyspark.sql import SparkSession

    from duckdb_distributed_execution_spark.queries import all_queries

    spark = (
        SparkSession.builder.master("local[32]")
        .appName("dump-plans")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    specs = all_queries()
    names = args.names or [n for n, s in sorted(specs.items()) if s.headline]
    os.makedirs(args.out, exist_ok=True)
    for name in names:
        df = specs[name].fn(spark, args.sf)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(args.out, f"{name}{args.suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print("wrote", path, flush=True)


if __name__ == "__main__":
    main()
