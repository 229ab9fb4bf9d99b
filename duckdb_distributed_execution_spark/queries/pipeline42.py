"""Forty-second wave — statistical LM quality filtering and tokenizer
application, the two inference-side text ops the data-prep suite was
still missing.

``lm_bigram_perplexity`` is the CCNet-style quality signal (Wenzek et
al. 2020 filter corpora by LM perplexity): an interpolated bigram
language model trained on the corpus itself scores every document's
per-token perplexity — high-perplexity docs are the incoherent /
boilerplate tail a 100 TB ingest drops. ``text_unigram_logprob``
(textstats.py) is the unigram version; bigrams add the adjacency
signal that actually separates shuffled-word junk from prose.

``bpe_apply_fixed`` is the inference half of the BPE family: apply a
FIXED pretrained merge table (the deployment reality — tokenizers are
trained once, applied to every corpus forever) and account tokens.
``bpe_train_merges`` (operators/bpe.py) learns merges; this encodes
with them via a static chain of codegen'd replace() scans — zero
Python in the hot path. Reference has no LM/tokenizer surface
(north-star greenfield, BASELINE.json).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from duckdb_distributed_execution_spark.operators.bpe import (
    bpe_apply_expr,
    bpe_token_count_expr,
    oracle_bpe_apply,
    oracle_bpe_token_count,
)
from duckdb_distributed_execution_spark.queries import load, register

_LAMBDA = 0.9  # bigram weight; (1-λ) backs off to the unigram prior
_SCALE = 1000000000.0  # per-bigram logprob quantization (order-free sums)

# Oracle CTE chain for the per-doc interpolated-bigram score; shared
# with the CCNet tercile split (pipeline45).
PPL_ORACLE_CTES = f"""ws AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    tok AS (SELECT unnest(w) AS t FROM ws),
    uni AS (SELECT t, COUNT(*) AS cu FROM tok GROUP BY t),
    tot AS (SELECT SUM(cu) AS n FROM uni),
    bg AS (
      SELECT doc_id,
             unnest(list_slice(w, 1, len(w) - 1)) AS a,
             unnest(list_slice(w, 2, len(w))) AS b
      FROM ws WHERE len(w) >= 2),
    bgc AS (SELECT a, b, COUNT(*) AS cab FROM bg GROUP BY a, b),
    sc AS (
      SELECT bg.doc_id,
             CAST(round(ln({_LAMBDA} * (CAST(cab AS DOUBLE)
                                        / CAST(ua.cu AS DOUBLE))
                           + {1.0 - _LAMBDA} * (CAST(ub.cu AS DOUBLE)
                                                / CAST(n AS DOUBLE)))
                        * {_SCALE}) AS BIGINT) AS lpq
      FROM bg JOIN bgc USING (a, b)
              JOIN uni ua ON ua.t = bg.a
              JOIN uni ub ON ub.t = bg.b
              CROSS JOIN tot),
    docppl AS (
      SELECT doc_id,
             CAST(COUNT(*) AS BIGINT) AS n_bigrams,
             ROUND(-(SUM(lpq) / {_SCALE}) / COUNT(*), 4) AS avg_nll,
             ROUND(exp(-(SUM(lpq) / {_SCALE}) / COUNT(*)), 3) AS ppl
      FROM sc GROUP BY doc_id)"""


def doc_ppl_df(spark, sf_dir):
    """The per-doc (doc_id, n_bigrams, avg_nll, ppl) relation —
    shared by lm_bigram_perplexity, the CCNet tercile split
    (pipeline45) and Engine.score_quality; mirrors
    PPL_ORACLE_CTES.docppl exactly (implementation:
    operators/text.py::bigram_ppl_scores)."""
    from duckdb_distributed_execution_spark.operators.text import (
        bigram_ppl_scores,
    )

    d = load(spark, sf_dir, "documents")["documents"]
    return bigram_ppl_scores(d, "doc_id", "text", lam=_LAMBDA)


@register(
    "lm_bigram_perplexity",
    oracle=f"""
    WITH {PPL_ORACLE_CTES}
    SELECT doc_id, n_bigrams, avg_nll, ppl FROM docppl
    """,
)
def lm_bigram_perplexity(spark, sf_dir):
    """Per-document perplexity under an interpolated bigram LM trained
    on the corpus: p(b|a) = λ·c(a,b)/c(a) + (1−λ)·c(b)/N. Both terms
    are strictly positive for observed tokens, so no extra smoothing
    floor is needed. Plan: bigram pairs come straight off the token
    array (zip of two slices — no self-join, no window shuffle); the
    bigram-count join keys on (a,b) and is left to AQE (the distinct-
    bigram relation is corpus-sized at 100 TB — a shuffle join — but
    broadcastable below ~10M bigrams); the unigram and total relations
    are vocabulary-bounded broadcasts. Per-bigram log-probs are
    quantized to scaled longs (×1e9) so per-doc sums are
    order-independent and the cross-engine hash is exact (same
    convention as text_unigram_logprob)."""
    return doc_ppl_df(spark, sf_dir)


# Rank-ordered pretrained merge table (Sennrich-style application
# order). Fixed by contract — the production shape is "tokenizer
# trained once, applied everywhere"; chains exercise multi-level
# merges (t+a, b+le, ta+ble → "table" as one token).
BPE_MERGES = (
    ("t", "a"), ("l", "e"), ("b", "le"), ("ta", "ble"),
    ("r", "o"), ("ro", "w"), ("a", "s"), ("h", "as"), ("has", "h"),
    ("e", "r"), ("t", "h"), ("th", "e"), ("a", "n"), ("s", "c"),
    ("sc", "an"), ("o", "r"), ("i", "n"),
)

_ENC_ORACLE = oracle_bpe_apply("word", BPE_MERGES)
_CNT_ORACLE = oracle_bpe_token_count("enc")


@register(
    "bpe_apply_fixed",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS word
      FROM documents),
    vocab AS (
      SELECT word, {_ENC_ORACLE} AS enc
      FROM (SELECT DISTINCT word FROM tok)),
    vc AS (
      SELECT word, {_CNT_ORACLE} AS ntok,
             CAST(length(word) AS BIGINT) AS nchr
      FROM vocab)
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_words,
           CAST(SUM(nchr) AS BIGINT) AS n_chars,
           CAST(SUM(ntok) AS BIGINT) AS n_bpe_tokens,
           ROUND(CAST(SUM(nchr) AS DOUBLE) / CAST(SUM(ntok) AS DOUBLE), 4)
             AS compression
    FROM tok JOIN vc USING (word)
    GROUP BY doc_id
    """,
)
def bpe_apply_fixed(spark, sf_dir):
    """Tokenizer-cost accounting with a pretrained BPE merge table:
    per-document word/char/BPE-token counts and the chars-per-token
    compression ratio (the number a token-budget curriculum multiplies
    by). The encoder runs over the DISTINCT-word vocabulary only —
    vocabulary ≪ token stream at any scale (Heaps' law) — then joins
    back; the vocabulary relation broadcasts. Encoding itself is a
    static chain of merges×passes built-in replace() scans (see
    operators/bpe.py::bpe_apply_expr — fully codegen'd, identical
    leftmost-non-overlapping semantics in the DuckDB oracle)."""
    d = load(spark, sf_dir, "documents")["documents"]
    tok = d.select("doc_id", F.explode(F.split("text", " ")).alias("word"))
    vocab = (
        tok.select("word")
        .distinct()
        .withColumn("enc", bpe_apply_expr(F.col("word"), BPE_MERGES))
        .select(
            "word",
            bpe_token_count_expr("enc").alias("ntok"),
            F.length("word").cast("long").alias("nchr"),
        )
    )
    return (
        tok.join(F.broadcast(vocab), "word")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_words"),
            F.sum("nchr").cast("long").alias("n_chars"),
            F.sum("ntok").cast("long").alias("n_bpe_tokens"),
            F.round(
                F.sum("nchr").cast("double") / F.sum("ntok").cast("double"), 4
            ).alias("compression"),
        )
    )
