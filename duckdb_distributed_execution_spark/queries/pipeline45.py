"""Forty-fifth wave — the CCNet corpus split: head/middle/tail
perplexity terciles per language.

Wenzek et al. 2020 (CCNet) partition each language's Common-Crawl
slice into three equal buckets by LM perplexity and keep the
head/middle for training — the canonical composition of the bigram-LM
score (pipeline42) with a per-language rank. Languages are exactly
the LOW-cardinality hot-key window regime (a handful of langs, each
carrying a third of the corpus), so the rank routes through
``keyed_row_number`` (operators/rowid.py), never a plain per-lang
window. Reference has no LM surface (north-star greenfield,
BASELINE.json).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from duckdb_distributed_execution_spark.operators.rowid import (
    keyed_row_number,
)
from duckdb_distributed_execution_spark.queries import load, register
from duckdb_distributed_execution_spark.queries.pipeline42 import (
    PPL_ORACLE_CTES,
    doc_ppl_df,
)


@register(
    "ppl_tercile_buckets",
    oracle=f"""
    WITH {PPL_ORACLE_CTES},
    dl AS (
      SELECT d.lang, p.doc_id, p.ppl
      FROM docppl p JOIN documents d USING (doc_id)),
    nl AS (SELECT lang, COUNT(*) AS n FROM dl GROUP BY lang),
    rk AS (
      SELECT dl.lang, dl.doc_id, dl.ppl, nl.n,
             ROW_NUMBER() OVER (PARTITION BY dl.lang
                                ORDER BY dl.ppl, dl.doc_id) AS rn
      FROM dl JOIN nl ON nl.lang = dl.lang),
    bk AS (
      SELECT lang, ppl,
             CAST((3 * (rn - 1)) // n AS BIGINT) AS bucket
      FROM rk)
    SELECT lang, bucket,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           ROUND(SUM(CAST(round(ppl * 1000.0) AS BIGINT)) / 1000.0
                 / COUNT(*), 4) AS avg_ppl,
           MIN(ppl) AS min_ppl,
           MAX(ppl) AS max_ppl
    FROM bk GROUP BY lang, bucket
    """,
)
def ppl_tercile_buckets(spark, sf_dir):
    """Head (0) / middle (1) / tail (2) perplexity terciles per
    language: bucket = ⌊3·(rank−1)/n⌋ over the (ppl, doc_id) order —
    exact integer arithmetic, so bucket sizes differ by at most one
    and the cut is deterministic. The per-lang rank uses the sampled
    range-bucket keyed_row_number (low-card hot keys); per-bucket
    mean perplexity sums 3-decimal ppl values quantized to exact
    longs (order-free)."""
    d = load(spark, sf_dir, "documents")["documents"]
    ppl = doc_ppl_df(spark, sf_dir).select("doc_id", "ppl")
    # keyed_row_number makes three passes over its input (boundary
    # sample, narrow count, final); the LM scoring behind it is the
    # expensive relation, so materialize the NARROW per-doc scores
    # once (3 columns × |docs| — far smaller than the corpus) instead
    # of recomputing the bigram joins per pass (measured 15.4 s → see
    # README probe row).
    dl = ppl.join(d.select("doc_id", "lang"), "doc_id").localCheckpoint()
    nl = dl.groupBy("lang").agg(F.count(F.lit(1)).alias("n"))
    rk = keyed_row_number(
        dl.select("lang", "doc_id", "ppl"), ["lang"], ["ppl", "doc_id"],
        id_col="rn",
    ).join(F.broadcast(nl), "lang")
    bk = rk.select(
        "lang",
        "ppl",
        F.expr("CAST((3 * (rn - 1)) DIV n AS BIGINT)").alias("bucket"),
    )
    return bk.groupBy("lang", "bucket").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.round(
            F.sum(F.round(F.col("ppl") * 1000.0).cast("long"))
            / F.lit(1000.0)
            / F.count(F.lit(1)),
            4,
        ).alias("avg_ppl"),
        F.min("ppl").alias("min_ppl"),
        F.max("ppl").alias("max_ppl"),
    )
