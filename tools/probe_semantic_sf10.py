"""One-pass A/B of semantic_dedup_seeded at organic sf10.

The paired sf10 table (tools/ab_table.py --tag _SF10) excludes this
query for cause: its DuckDB oracle scores all pairs WITHIN each IVF
block, so oracle work grows ~quadratically with per-block membership
(measured 76 s at sf1 → multi-hour at sf10), while the engine's
per-cluster numpy matmul path stays near-linear. This probe puts the
asymmetry on the record with ONE timed pass per engine (no best-of-3
— the point is the complexity class, not the microbenchmark floor).

    python tools/probe_semantic_sf10.py [--sf-dir /tmp/dde_sf10]
    python tools/probe_semantic_sf10.py --skip-duckdb   # engine only
    python tools/probe_semantic_sf10.py --duckdb-timeout 7200
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/tmp/dde_sf10")
    ap.add_argument("--query", default="semantic_dedup_seeded")
    ap.add_argument("--skip-duckdb", action="store_true")
    ap.add_argument("--skip-spark", action="store_true")
    args = ap.parse_args()

    from duckdb_distributed_execution_spark.queries import all_queries

    spec = all_queries()[args.query]
    out: dict = {"query": args.query, "sf_dir": args.sf_dir, "unit": "sec"}

    if not args.skip_spark:
        from pyspark.sql import SparkSession

        spark = (
            SparkSession.builder.master("local[32]")
            .appName("semantic-sf10-probe")
            .config("spark.sql.shuffle.partitions", "32")
            .config("spark.sql.adaptive.enabled", "true")
            .config("spark.sql.session.timeZone", "UTC")
            .config("spark.ui.enabled", "false")
            .config("spark.driver.memory", "48g")
            .getOrCreate()
        )
        spark.sparkContext.setLogLevel("ERROR")
        # one warm pass (JIT/codegen), one timed pass — matches the
        # DuckDB side's single timed evaluation
        spec.fn(spark, args.sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        spec.fn(spark, args.sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        out["spark_sec"] = round(time.perf_counter() - t0, 3)
        spark.stop()

    if not args.skip_duckdb:
        import duckdb

        con = duckdb.connect()
        con.execute(f"SET threads={os.cpu_count()}")
        for t in TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet("
                f"'{os.path.join(args.sf_dir, t + '.parquet')}')"
            )
        t0 = time.perf_counter()
        con.execute(spec.oracle).fetchall()
        out["duckdb_sec"] = round(time.perf_counter() - t0, 3)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
