"""Forty-seventh wave — the streaming perplexity screen: score every
INGESTED document against the frozen corpus bigram LM and quarantine
the high-perplexity tail.

This is the streaming twin of the CCNet filter (pipeline42/45) and a
new streaming SHAPE for the suite: a stream-static join (the LM's
unigram/bigram relations are computed batch-side and joined into the
stream — the "tokenizer/LM trained once, applied at ingest" reality)
followed by a per-doc stateful aggregation (update mode; availableNow
drains and terminates, so state is batch-bounded in the harness;
production bounds it with a watermark on ingest time). The quarantine
threshold is the exact discrete p90 of the corpus's own perplexity —
computed batch-side, baked into the streaming plan as one literal.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from duckdb_distributed_execution_spark.queries import load, register
from duckdb_distributed_execution_spark.queries.pipeline42 import (
    _LAMBDA,
    PPL_ORACLE_CTES,
    doc_ppl_df,
)

_SCALE = 1000000000.0


@register(
    "streaming_ppl_screen",
    oracle=f"""
    WITH {PPL_ORACLE_CTES},
    nn AS (SELECT COUNT(*) AS n FROM docppl),
    thr AS (
      SELECT ppl AS cut
      FROM (SELECT ppl, ROW_NUMBER() OVER (ORDER BY ppl, doc_id) AS rn
            FROM docppl), nn
      WHERE rn = CAST(floor(0.9 * (n - 1)) AS BIGINT) + 1)
    SELECT d.doc_id, d.n_bigrams, d.ppl
    FROM docppl d, thr
    WHERE d.ppl > thr.cut
    """,
)
def streaming_ppl_screen(spark, sf_dir):
    """STREAMING LM screening at ingest: documents arrive as a file
    stream; each row explodes to its bigrams (stateless flatMap),
    joins the STATIC corpus LM relations (vocabulary-bounded unigram
    broadcast + the bigram-count table — the stream-static join
    pattern), aggregates back to one row per doc (update mode), and
    docs whose perplexity exceeds the corpus's exact-rank p90 are
    emitted — the quarantine stream. Scoring arithmetic is identical
    to lm_bigram_perplexity (quantized scaled-long sums), so the
    batch oracle reproduces the exact rows."""
    import os as _os

    from duckdb_distributed_execution_spark.streaming import (
        read_documents_stream,
        run_to_memory,
    )

    # Batch side: the frozen LM + the p90 threshold literal.
    d = load(spark, sf_dir, "documents")["documents"]
    ws = d.select(F.split("text", " ").alias("w"))
    tok = ws.select(F.explode("w").alias("t"))
    uni = tok.groupBy("t").agg(F.count(F.lit(1)).alias("cu"))
    tot_n = uni.agg(F.sum("cu")).first()[0]
    bg_static = (
        ws.filter(F.size("w") >= 2)
        .select(
            F.expr(
                "explode(transform(slice(w, 2, size(w) - 1),"
                " (b, i) -> struct(w[i] AS a, b AS b)))"
            ).alias("p")
        )
        .select("p.a", "p.b")
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("cab"))
    )
    ppl_batch = doc_ppl_df(spark, sf_dir).select("doc_id", "ppl")
    n_docs = ppl_batch.count()
    cut = (
        ppl_batch.orderBy("ppl", "doc_id")
        .offset(int(0.9 * (n_docs - 1)))
        .limit(1)
        .first()["ppl"]
    )

    # Stream side: same arithmetic over the ingested rows.
    stream = read_documents_stream(
        spark, _os.path.join(sf_dir, "documents.parquet")
    )
    sbg = (
        stream.select("doc_id", F.split("text", " ").alias("w"))
        .filter(F.size("w") >= 2)
        .select(
            "doc_id",
            F.expr(
                "explode(transform(slice(w, 2, size(w) - 1),"
                " (b, i) -> struct(w[i] AS a, b AS b)))"
            ).alias("p"),
        )
        .select("doc_id", "p.a", "p.b")
    )
    ua = F.broadcast(uni.select(F.col("t").alias("a"), F.col("cu").alias("ca")))
    ub = F.broadcast(uni.select(F.col("t").alias("b"), F.col("cu").alias("cb")))
    # The interpolation literals MUST be the same doubles the oracle
    # prints (1.0 - 0.9 != 0.1 in binary): import them from pipeline42.
    p = F.lit(_LAMBDA) * (
        F.col("cab").cast("double") / F.col("ca").cast("double")
    ) + F.lit(1.0 - _LAMBDA) * (
        F.col("cb").cast("double") / F.lit(float(tot_n))
    )
    scored = (
        sbg.join(bg_static, ["a", "b"])
        .join(ua, "a")
        .join(ub, "b")
        .select(
            "doc_id",
            F.round(F.log(p) * F.lit(_SCALE)).cast("long").alias("lpq"),
        )
    )
    nll = -(F.sum("lpq") / F.lit(_SCALE)) / F.count(F.lit(1))
    agg = scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_bigrams"),
        F.round(F.exp(nll), 3).alias("ppl"),
    )
    screened = agg.filter(F.col("ppl") > F.lit(cut))
    run_to_memory(screened, "streaming_ppl_screen_sink", mode="update")
    return (
        spark.table("streaming_ppl_screen_sink")
        .groupBy("doc_id")
        .agg(
            F.max("n_bigrams").alias("n_bigrams"),
            F.max("ppl").alias("ppl"),
        )
    )
