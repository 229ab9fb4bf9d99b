"""A/B throughput harness: times each HEADLINE query's DuckDB oracle
SQL on the same parquet at the same scale factor, for comparison with
bench.py's Spark timings.

The reference executes everything on DuckDB (single node per task —
SURVEY §0), so "match-or-beat the reference's single-node throughput"
concretely means: our Spark timing vs this script's DuckDB timing on
identical data and semantics. Mirrors bench.py methodology: one warm
run, then best of three.

    python tools/bench_duckdb.py [--sf /root/testdata/sf0.1]
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
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()
    import re

    # Same sf stamping as bench.py (r5 verdict #2: /tmp/dde_sf1
    # stamped -1.0 under the old exact-prefix parse).
    label = os.environ.get("SPARK_GRAFT_SF_LABEL")
    m = re.search(
        r"sf(\d+(?:\.\d+)?)", os.path.basename(args.sf.rstrip("/"))
    )
    sf = float(label) if label else (float(m.group(1)) if m else -1.0)

    import duckdb

    from duckdb_distributed_execution_spark.queries import all_queries

    con = duckdb.connect()
    con.execute(f"SET threads={os.cpu_count()}")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{os.path.join(args.sf, t + '.parquet')}')"
        )

    specs = all_queries()
    sel = os.environ.get("SPARK_GRAFT_QUERIES")
    names = (
        [n.strip() for n in sel.split(",") if n.strip()]
        if sel
        else [n for n, s in sorted(specs.items()) if s.headline]
    )
    out: dict[str, float] = {}
    for name in names:
        s = specs[name]
        if not s.oracle:
            continue
        con.execute(s.oracle).fetchall()  # warm (buffer cache, JIT-ish)
        best = min(
            _timed(con, s.oracle) for _ in range(3)
        )
        out[name] = round(best, 3)

    # Same session stamp bench.py emits — tools/ab_table.py refuses
    # to pair JSONs from different boots or runs > 30 min apart.
    try:
        with open("/proc/sys/kernel/random/boot_id") as f:
            boot = f.read().strip()
    except OSError:
        boot = "unknown"
    print(json.dumps({
        "metric": "duckdb_oracle_headline_total",
        "value": round(sum(out.values()), 3),
        "unit": "sec",
        "queries": out,
        "sf": sf,
        "threads": os.cpu_count(),
        "ts": round(time.time(), 1),
        "boot_id": boot,
    }))


def _timed(con, sql: str) -> float:
    t0 = time.perf_counter()
    con.execute(sql).fetchall()
    return time.perf_counter() - t0


if __name__ == "__main__":
    main()
