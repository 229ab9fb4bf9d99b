"""Corpus statistics / text-curation queries — TF-IDF vocabulary,
benchmark-contamination screening, quantile quality gates, repetition
filters, and masking — the analysis layer a training-data pipeline
runs between dedup and packing.  North-star greenfield (the reference
has no text surface; BASELINE.json mandates it).  All column algebra
stays in whole-stage codegen; every query has an exact DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from duckdb_distributed_execution_spark.operators import dedup as D
from duckdb_distributed_execution_spark.operators import text as X
from duckdb_distributed_execution_spark.queries import load, register

_WS = r"\s+"


def _tok_oracle(expr: str = "text") -> str:
    return f"regexp_split_to_array({X.oracle_normalize(expr)}, '{_WS}')"


# ---------------------------------------------------------------------------
# Vocabulary / TF-IDF
# ---------------------------------------------------------------------------


@register(
    "vocab_topk",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, unnest({_tok_oracle()}) AS term FROM documents)
    SELECT term,
           COUNT(DISTINCT doc_id) AS doc_freq,
           COUNT(*) AS coll_freq
    FROM tok GROUP BY term
    ORDER BY doc_freq DESC, term LIMIT 50
    """,
)
def vocab_topk(spark, sf_dir):
    """Global vocabulary head: top-50 terms by document frequency.
    Explode → two-level agg; map-side combine keeps the shuffle at
    |vocab| not |tokens|, so it holds at corpus scale."""
    d = load(spark, sf_dir, "documents")["documents"]
    tok = d.select(
        "doc_id", F.explode(X.tokens(X.normalize_text("text"))).alias("term")
    )
    return (
        tok.groupBy("term")
        .agg(
            F.countDistinct("doc_id").alias("doc_freq"),
            F.count(F.lit(1)).alias("coll_freq"),
        )
        .orderBy(F.desc("doc_freq"), "term")
        .limit(50)
    )


@register(
    "tfidf_topk",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, unnest({_tok_oracle()}) AS term FROM documents),
    tf AS (
      SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY doc_id, term),
    idf AS (
      SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
    n AS (SELECT COUNT(*) AS n_docs FROM documents),
    scored AS (
      SELECT tf.doc_id, tf.term,
             ROUND(CAST(tf.tf AS DOUBLE)
                   * ln(CAST(n.n_docs AS DOUBLE) / CAST(idf.df AS DOUBLE)),
                   4) AS tfidf
      FROM tf JOIN idf USING (term) CROSS JOIN n),
    ranked AS (
      SELECT doc_id, term, tfidf,
             row_number() OVER (PARTITION BY doc_id
                                ORDER BY tfidf DESC, term) AS rk
      FROM scored)
    SELECT doc_id, term, tfidf FROM ranked WHERE rk <= 3
    """,
)
def tfidf_topk(spark, sf_dir):
    """Top-3 TF-IDF terms per document.  The doc-frequency table is
    |vocab|-sized and broadcast back onto the term-frequency table, so
    the only big shuffle is the (doc, term) grouping.  Scores are
    rounded to 4 decimals before ranking so the ordering is identical
    across engines (libm ln differs in the last ulp)."""
    d = load(spark, sf_dir, "documents")["documents"]
    tok = d.select(
        "doc_id", F.explode(X.tokens(X.normalize_text("text"))).alias("term")
    )
    tf = tok.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    idf = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n = d.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(F.broadcast(idf), "term")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "term",
            F.round(
                F.col("tf").cast("double")
                * F.log(F.col("n_docs").cast("double") / F.col("df").cast("double")),
                4,
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), "term")
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("doc_id", "term", "tfidf")
    )


# ---------------------------------------------------------------------------
# Benchmark contamination screening
# ---------------------------------------------------------------------------

_SHINGLE_N = 2
_BENCH_MOD = 97


@register(
    "contamination_ngram_overlap",
    oracle=f"""
    WITH sh AS (
      SELECT doc_id,
             list_distinct({D.oracle_word_shingles('text', _SHINGLE_N)}) AS s
      FROM documents),
    bench AS (
      SELECT DISTINCT unnest(s) AS g FROM sh WHERE doc_id % {_BENCH_MOD} = 0),
    t AS (
      SELECT doc_id, unnest(s) AS g FROM sh WHERE doc_id % {_BENCH_MOD} <> 0)
    SELECT t.doc_id,
           COUNT(*) AS n_ngrams,
           CAST(SUM(CASE WHEN bench.g IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_hits,
           ROUND(CAST(SUM(CASE WHEN bench.g IS NOT NULL THEN 1 ELSE 0 END)
                      AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 4) AS contamination
    FROM t LEFT JOIN bench ON t.g = bench.g
    GROUP BY t.doc_id
    HAVING SUM(CASE WHEN bench.g IS NOT NULL THEN 1 ELSE 0 END) > 0
    """,
)
def contamination_ngram_overlap(spark, sf_dir):
    """Decontamination screen: fraction of each training document's
    distinct bigram shingles that appear in a held-out benchmark set
    (docs with id % 97 == 0 stand in for the eval suite).  The
    benchmark shingle set is tiny relative to the corpus and is
    BROADCAST — the corpus-side explode never shuffles."""
    from duckdb_distributed_execution_spark.operators import dedup as D

    from duckdb_distributed_execution_spark.functions import (
        ensure_min_parallelism,
    )

    d = load(spark, sf_dir, "documents")["documents"]
    # N-wide shingle compute (single-row-group inputs scan at 1-2
    # tasks), pinned once: the bench branch broadcasts and broadcast
    # subtrees don't share exchange reuse, so unpinned the corpus was
    # re-shingled per branch (measured r6)
    sh = ensure_min_parallelism(d.select("doc_id", "text")).select(
        "doc_id",
        F.array_distinct(D.word_shingles(F.col("text"), _SHINGLE_N)).alias("s"),
    ).localCheckpoint()
    bench = (
        sh.filter(F.col("doc_id") % _BENCH_MOD == 0)
        .select(F.explode("s").alias("g"))
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    t = sh.filter(F.col("doc_id") % _BENCH_MOD != 0).select(
        "doc_id", F.explode("s").alias("g")
    )
    hits = F.sum(F.coalesce(F.col("hit"), F.lit(0))).cast("long")
    return (
        t.join(F.broadcast(bench), "g", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_ngrams"),
            hits.alias("n_hits"),
            F.round(
                hits.cast("double") / F.count(F.lit(1)).cast("double"), 4
            ).alias("contamination"),
        )
        .filter(F.col("n_hits") > 0)
    )


# ---------------------------------------------------------------------------
# Quality gates
# ---------------------------------------------------------------------------


@register(
    "quality_quantile_filter",
    oracle=f"""
    WITH q AS (
      SELECT doc_id, {X.oracle_quality_score('text')} AS score FROM documents),
    thr AS (SELECT quantile_cont(score, 0.1) AS t FROM q)
    SELECT doc_id, ROUND(score, 6) AS score
    FROM q, thr WHERE score < t
    """,
)
def quality_quantile_filter(spark, sf_dir):
    """Drop-the-bottom-decile quality gate: global P10 threshold
    computed as one scalar aggregate (exact percentile), broadcast
    back as a cross join — two passes over the data, no collect."""
    d = load(spark, sf_dir, "documents")["documents"]
    q = d.select("doc_id", X.quality_score("text").alias("score"))
    thr = q.agg(F.expr("percentile(score, 0.1)").alias("t"))
    return (
        q.crossJoin(F.broadcast(thr))
        .filter(F.col("score") < F.col("t"))
        .select("doc_id", F.round("score", 6).alias("score"))
    )


@register(
    "repetition_stats",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, unnest({_tok_oracle()}) AS term FROM documents),
    tf AS (
      SELECT doc_id, term, COUNT(*) AS c FROM tok GROUP BY doc_id, term)
    SELECT doc_id,
           CAST(SUM(c) AS BIGINT) AS n_tokens,
           COUNT(*) AS n_unique,
           ROUND(1.0 - CAST(COUNT(*) AS DOUBLE) / CAST(SUM(c) AS DOUBLE), 4)
             AS rep_frac,
           ROUND(CAST(MAX(c) AS DOUBLE) / CAST(SUM(c) AS DOUBLE), 4)
             AS top_token_share
    FROM tf GROUP BY doc_id
    """,
)
def repetition_stats(spark, sf_dir):
    """Gopher-style repetition signals per document: duplicate-token
    fraction and the share of the single most frequent token.  One
    explode + one (doc, term) grouping; the per-doc rollup rides the
    same partitioning."""
    d = load(spark, sf_dir, "documents")["documents"]
    tok = d.select(
        "doc_id", F.explode(X.tokens(X.normalize_text("text"))).alias("term")
    )
    tf = tok.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("c"))
    return tf.groupBy("doc_id").agg(
        F.sum("c").alias("n_tokens"),
        F.count(F.lit(1)).alias("n_unique"),
        F.round(
            F.lit(1.0) - F.count(F.lit(1)).cast("double") / F.sum("c").cast("double"),
            4,
        ).alias("rep_frac"),
        F.round(F.max("c").cast("double") / F.sum("c").cast("double"), 4).alias(
            "top_token_share"
        ),
    )


_MASK_PAT = r"\b(key|hash|value)\b"


@register(
    "text_mask_terms",
    oracle=f"""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '{_MASK_PAT}')) AS BIGINT)
             AS n_masked,
           CAST(length(regexp_replace(text, '{_MASK_PAT}', '<MASKED>', 'g'))
                AS BIGINT) AS masked_chars
    FROM documents
    WHERE len(regexp_extract_all(text, '{_MASK_PAT}')) > 0
    """,
)
def text_mask_terms(spark, sf_dir):
    """Sensitive-term masking (the PII-scrub shape: regex match count
    + redacted text length).  Pure per-row regexp — embarrassingly
    parallel, no shuffle at any scale."""
    d = load(spark, sf_dir, "documents")["documents"]
    n_masked = F.size(F.regexp_extract_all("text", F.lit(_MASK_PAT), 0)).cast("long")
    return (
        d.select(
            "doc_id",
            n_masked.alias("n_masked"),
            F.length(F.regexp_replace("text", _MASK_PAT, "<MASKED>"))
            .cast("long")
            .alias("masked_chars"),
        )
        .filter(F.col("n_masked") > 0)
    )


@register(
    "text_unigram_logprob",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, unnest({_tok_oracle()}) AS term FROM documents),
    freq AS (
      SELECT term, COUNT(*) AS c FROM tok GROUP BY term),
    tot AS (SELECT SUM(c) AS t FROM freq)
    SELECT tok.doc_id,
           COUNT(*) AS n_tokens,
           ROUND(SUM(CAST(round(ln(CAST(freq.c AS DOUBLE)
                                    / CAST(tot.t AS DOUBLE)) * 1000000000.0)
                          AS BIGINT)) / 1000000000.0 / COUNT(*), 4)
             AS avg_logprob
    FROM tok JOIN freq USING (term) CROSS JOIN tot
    GROUP BY tok.doc_id
    """,
)
def text_unigram_logprob(spark, sf_dir):
    """Unigram language-model scoring: mean log-probability of each
    document under the corpus unigram distribution (the KenLM-style
    statistical quality filter).  The |vocab|-sized frequency table
    broadcasts; per-token log-probs are quantized to scaled longs so
    the per-doc sum is order-independent."""
    d = load(spark, sf_dir, "documents")["documents"]
    tok = d.select(
        "doc_id", F.explode(X.tokens(X.normalize_text("text"))).alias("term")
    )
    freq = tok.groupBy("term").agg(F.count(F.lit(1)).alias("c"))
    tot = freq.agg(F.sum("c").alias("t"))
    lp = F.round(
        F.log(F.col("c").cast("double") / F.col("t").cast("double"))
        * F.lit(1000000000.0)
    ).cast("long")
    return (
        tok.join(F.broadcast(freq), "term")
        .crossJoin(F.broadcast(tot))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(
                F.sum(lp) / F.lit(1000000000.0) / F.count(F.lit(1)), 4
            ).alias("avg_logprob"),
        )
    )
