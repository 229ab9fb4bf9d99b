"""Fifty-seventh wave — TOKENIZER-AWARE contamination (round-6
verdict task 7): benchmark-overlap screening in TOKEN space, the form
eval-suite decontamination actually uses. A word-level n-gram screen
(contamination_ngram_overlap) misses matches whose word boundaries
tokenize away — an eval answer pasted without spaces, code, or any
text where the tokenizer's merges cross what whitespace would split.
Here every document is encoded with the pretrained BPE merge table
(the bpe_apply_fixed tokenizer) and the screen runs over n-grams of
the resulting TOKEN SEQUENCE, spaces excluded, merges crossing word
boundaries impossible by construction (the space character is a
1-char token no merge rule touches), exactly like a real tokenizer's
word-boundary behavior.

Composes two independently-verified operators — the codegen'd BPE
replace-chain encoder (operators/bpe.py) and the distinct-shingle
zip-shift (operators/dedup.py::array_shingles) — into the missing
real-world check. Reference has no contamination surface (north-star
greenfield, BASELINE.json).

Scale shape (100 TB): identical to the word-level screen — the
benchmark token-gram SET is eval-suite-sized and broadcasts; the
corpus side is one encode+shingle pass (fully codegen'd replace
scans, no Python) and the per-doc aggregate map-side combines; the
shingle relation is pinned once because the bench branch broadcasts
and broadcast subtrees don't share exchange reuse.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from duckdb_distributed_execution_spark.functions import (
    ensure_min_parallelism,
)
from duckdb_distributed_execution_spark.operators.bpe import (
    bpe_apply_expr,
    oracle_bpe_apply,
)
from duckdb_distributed_execution_spark.operators.dedup import (
    array_shingles,
    oracle_array_shingles,
)
from duckdb_distributed_execution_spark.queries import load, register
from duckdb_distributed_execution_spark.queries.pipeline42 import BPE_MERGES

_N = 3        # token-gram width
_BMOD = 97    # benchmark stand-in: docs with doc_id % 97 == 0
_SEP = "\x1f"  # gram joiner (unit separator — can't appear in tokens)

_ENC = oracle_bpe_apply("text", BPE_MERGES)
_TOKS = f"list_filter(string_split({_ENC}, '|'), t -> t <> '' AND t <> ' ')"


@register(
    "contamination_token_ngram",
    oracle=f"""
    WITH sh AS (
      SELECT doc_id,
             {oracle_array_shingles(_TOKS, _N, _SEP)} AS s
      FROM documents),
    bench AS (
      SELECT DISTINCT unnest(s) AS g FROM sh WHERE doc_id % {_BMOD} = 0),
    t AS (
      SELECT doc_id, unnest(s) AS g FROM sh WHERE doc_id % {_BMOD} <> 0)
    SELECT t.doc_id,
           COUNT(*) AS n_token_grams,
           CAST(SUM(CASE WHEN bench.g IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_hits,
           ROUND(CAST(SUM(CASE WHEN bench.g IS NOT NULL THEN 1 ELSE 0 END)
                      AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 4)
             AS contamination
    FROM t LEFT JOIN bench ON t.g = bench.g
    GROUP BY t.doc_id
    HAVING SUM(CASE WHEN bench.g IS NOT NULL THEN 1 ELSE 0 END) > 0
    """,
)
def contamination_token_ngram(spark, sf_dir):
    """Per-document benchmark contamination measured over BPE TOKEN
    3-grams: each doc's text is encoded whole (spaces survive as
    unmergeable 1-char tokens, so merges respect word boundaries like
    a real tokenizer), the space tokens are dropped, and the distinct
    token-sequence 3-grams are screened against the benchmark docs'
    (id % 97 == 0) token-gram set. Emits the flagged docs with their
    gram counts and contamination rate — the token-space twin of
    contamination_ngram_overlap, catching overlaps whose WORD
    boundaries differ between train and eval text."""
    d = load(spark, sf_dir, "documents")["documents"]
    enc = bpe_apply_expr(F.col("text"), BPE_MERGES)
    toks = F.filter(
        F.split(enc, "\\|"),
        lambda t: (t != F.lit("")) & (t != F.lit(" ")),
    )
    # N-wide encode+shingle (single-row-group inputs scan 1-2 tasks),
    # pinned once: the bench branch broadcasts and broadcast subtrees
    # don't share exchange reuse (same fix as the word-level screen).
    sh = (
        ensure_min_parallelism(d.select("doc_id", "text"))
        .select("doc_id", array_shingles(toks, _N, _SEP).alias("s"))
        .localCheckpoint()
    )
    bench = (
        sh.filter(F.col("doc_id") % _BMOD == 0)
        .select(F.explode("s").alias("g"))
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    t = sh.filter(F.col("doc_id") % _BMOD != 0).select(
        "doc_id", F.explode("s").alias("g")
    )
    hits = F.sum(F.coalesce(F.col("hit"), F.lit(0))).cast("long")
    return (
        t.join(F.broadcast(bench), "g", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_token_grams"),
            hits.alias("n_hits"),
            F.round(
                hits.cast("double") / F.count(F.lit(1)).cast("double"), 4
            ).alias("contamination"),
        )
        .filter(F.col("n_hits") > 0)
    )
