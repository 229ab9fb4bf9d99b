"""Stage-level floor probe for ann_ivf_pq_served_topk (round-9
surgery validation): times the build (assign+encode), the ADC
scoring, and the full query separately at a given sf-dir, so the
README decomposition can attribute the Spark-vs-DuckDB gap to a
stage rather than a guess.

    python tools/probe_pq.py --sf-dir /tmp/dde_sf1 [--reps 3]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    from pyspark.sql import SparkSession, functions as F, Window

    from duckdb_distributed_execution_spark.operators.similarity import (
        ivf_assign_numpy,
        ivf_pq_serve_topk,
        pq_encode_numpy,
        pq_subvectors,
    )
    from duckdb_distributed_execution_spark.queries import all_queries

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.driver.memory", "48g")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    e = spark.read.parquet(os.path.join(args.sf_dir, "embeddings.parquet"))
    cents = e.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("cid"), "embedding"
    )
    cb_src = e.filter((F.col("vec_id") >= 8) & (F.col("vec_id") < 24))
    w = Window.orderBy("vec_id")
    cb_ranked = cb_src.select(
        (F.row_number().over(w) - 1).cast("int").alias("code"), "embedding"
    )
    cb = pq_subvectors(cb_ranked, "code", "embedding", 8, 8).select(
        F.col("__id").alias("code"), "sub", F.col("sv").alias("cv")
    )
    corpus = e.filter(F.col("vec_id") >= 24)

    def t(label, fn):
        best = None
        for _ in range(args.reps):
            t0 = time.perf_counter()
            fn()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        print(f"{label}: {best:.3f}s")
        return best

    # warm JVM/python workers
    corpus.count()

    t("scan_embeddings (count only)", lambda: corpus.count())
    cells = ivf_assign_numpy(corpus, cents)
    t("assign (write.noop)", lambda: cells.write.format("noop")
      .mode("overwrite").save())
    codes = pq_encode_numpy(cells, cb, m=8, dsub=8, passthrough=("cid",))
    t("assign+encode pipelined (noop)", lambda: codes.write.format("noop")
      .mode("overwrite").save())
    q = all_queries()["ann_ivf_pq_served_topk"].fn
    t("full query (collect)", lambda: q(spark, args.sf_dir).collect())


if __name__ == "__main__":
    main()
