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

Protocol note (one honest asymmetry): Spark gets one untimed warm
pass (JVM JIT + codegen compilation — fixed cost that vanishes at
scale) before its timed pass, while DuckDB is timed on a single cold
evaluation. For a multi-hour-vs-seconds complexity-class comparison
this is immaterial; for anything tighter use tools/ab_table.py, whose
pairing warms both sides symmetrically.

``--duckdb-timeout SECONDS`` interrupts the oracle after the budget
(duckdb.interrupt from a watchdog thread) and records
``duckdb_timed_out`` with the elapsed floor — so the multi-hour side
of the asymmetry can be demonstrated without burning the hours."""

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
    ap.add_argument(
        "--duckdb-timeout", type=float, default=None, metavar="SECONDS",
        help="interrupt the DuckDB oracle after this many seconds and "
             "record duckdb_timed_out=true (elapsed becomes a floor)",
    )
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
        # one untimed warm pass (JVM JIT + codegen), one timed pass.
        # The DuckDB side is a single cold evaluation — an asymmetry
        # in DuckDB's favor-free direction is impossible to claim, so
        # it is documented (module docstring) rather than hidden; for
        # the complexity-class argument this probe exists to make, a
        # few seconds of JIT warm-up vs a multi-hour quadratic oracle
        # is noise.
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
        import threading

        import duckdb

        con = duckdb.connect()
        con.execute(f"SET threads={os.cpu_count()}")
        for t in TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet("
                f"'{os.path.join(args.sf_dir, t + '.parquet')}')"
            )
        watchdog = None
        if args.duckdb_timeout:
            watchdog = threading.Timer(args.duckdb_timeout, con.interrupt)
            watchdog.daemon = True
            watchdog.start()
        t0 = time.perf_counter()
        try:
            con.execute(spec.oracle).fetchall()
            out["duckdb_sec"] = round(time.perf_counter() - t0, 3)
        except duckdb.InterruptException:
            out["duckdb_sec"] = round(time.perf_counter() - t0, 3)
            out["duckdb_timed_out"] = True
        finally:
            if watchdog is not None:
                watchdog.cancel()

    print(json.dumps(out))


if __name__ == "__main__":
    main()
