"""Fifty-second wave — leave-one-source-out (LOSO) influence: for
every source/domain, the corpus mean quality recomputed WITHOUT that
source, by algebra instead of re-scans.

The curation question ("which domain is dragging the corpus down?")
is usually answered by retraining/rescoring per candidate removal;
for additive metrics the answer is exact from one grouped pass:
loso_mean(s) = (Σq − Σq_s) / (N − n_s). One shuffle to per-source
sums, then |sources|-sized arithmetic against the 1-row corpus
totals — the 100 TB cost is ONE pass regardless of how many sources
are evaluated. Quality is quantized to exact scaled longs so every
mean is bit-identical cross-engine. Reference has no curation
surface (north-star greenfield, BASELINE.json).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from duckdb_distributed_execution_spark.operators import text as X
from duckdb_distributed_execution_spark.queries import load, register


@register(
    "loso_source_influence",
    oracle=f"""
    WITH q AS (
      SELECT source,
             CAST(round({X.oracle_quality_score('text')} * 1000000.0)
                  AS BIGINT) AS qq
      FROM documents),
    s AS (SELECT source, COUNT(*) AS n_s, SUM(qq) AS sq_s
          FROM q GROUP BY source),
    tot AS (SELECT SUM(n_s) AS n, SUM(sq_s) AS sq FROM s)
    SELECT source,
           CAST(n_s AS BIGINT) AS n_docs,
           ROUND((CAST(sq AS DOUBLE) / 1000000.0) / n, 6)
             AS corpus_mean_quality,
           ROUND((CAST(sq - sq_s AS DOUBLE) / 1000000.0) / (n - n_s), 6)
             AS loso_mean_quality,
           ROUND((CAST(sq - sq_s AS DOUBLE) / 1000000.0) / (n - n_s)
                 - (CAST(sq AS DOUBLE) / 1000000.0) / n, 6)
             AS removal_gain
    FROM s CROSS JOIN tot
    """,
)
def loso_source_influence(spark, sf_dir):
    """Per-source leave-one-out corpus quality: removal_gain > 0
    means dropping the source RAISES mean quality (the candidate for
    quota tightening or removal). Exact algebra from one grouped
    pass; the identity Σ n_s·(corpus−loso contribution) telescoping
    to zero is pinned in pytest."""
    d = load(spark, sf_dir, "documents")["documents"]
    q = d.select(
        "source",
        F.round(X.quality_score("text") * 1000000.0)
        .cast("long")
        .alias("qq"),
    )
    s = q.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_s"), F.sum("qq").alias("sq_s")
    )
    tot = s.agg(F.sum("n_s").alias("n"), F.sum("sq_s").alias("sq"))
    corpus_mean = (F.col("sq").cast("double") / F.lit(1000000.0)) / F.col("n")
    loso_mean = (
        (F.col("sq") - F.col("sq_s")).cast("double") / F.lit(1000000.0)
    ) / (F.col("n") - F.col("n_s"))
    return s.crossJoin(F.broadcast(tot)).select(
        "source",
        F.col("n_s").cast("long").alias("n_docs"),
        F.round(corpus_mean, 6).alias("corpus_mean_quality"),
        F.round(loso_mean, 6).alias("loso_mean_quality"),
        F.round(loso_mean - corpus_mean, 6).alias("removal_gain"),
    )
