"""Wave-42 pins: BPE application semantics vs a strict reference
implementation, and the bigram-LM perplexity contract on a planted
corpus (the oracle harness checks engine-vs-DuckDB parity; these pin
engine-vs-ALGORITHM)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from duckdb_distributed_execution_spark.operators.bpe import (
    bpe_apply_expr,
    bpe_token_count_expr,
)
from duckdb_distributed_execution_spark.queries.pipeline42 import (
    BPE_MERGES,
    bpe_apply_fixed,
    lm_bigram_perplexity,
)

SF = "/root/testdata/sf0.001"


def _bpe_reference(word: str, merges) -> list[str]:
    """Strict one-occurrence-at-a-time BPE: for each merge in rank
    order, repeatedly merge the LEFTMOST occurrence until absent
    (Sennrich-ordered application)."""
    toks = list(word)
    for a, b in merges:
        while True:
            for i in range(len(toks) - 1):
                if toks[i] == a and toks[i + 1] == b:
                    toks[i : i + 2] = [a + b]
                    break
            else:
                break
    return toks


def _encode_with_engine(spark, words, merges):
    df = spark.createDataFrame([(w,) for w in words], "word string")
    rows = df.select(
        "word",
        bpe_apply_expr(F.col("word"), merges).alias("enc"),
        bpe_token_count_expr(
            bpe_apply_expr(F.col("word"), merges)
        ).alias("ntok"),
    ).collect()
    return {r["word"]: (r["enc"], r["ntok"]) for r in rows}


def test_bpe_apply_matches_reference_on_corpus_vocab(spark):
    """Every distinct corpus word encodes to exactly the reference
    token sequence (chained merges t+a / b+le / ta+ble included)."""
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    words = [
        r["w"]
        for r in docs.select(
            F.explode(F.split("text", " ")).alias("w")
        ).distinct().collect()
    ]
    assert len(words) > 10
    got = _encode_with_engine(spark, words, BPE_MERGES)
    for w in words:
        ref = _bpe_reference(w, BPE_MERGES)
        enc, ntok = got[w]
        assert enc == "|" + "|".join(ref) + "|", (w, enc, ref)
        assert ntok == len(ref)


def _scan_reference(word: str, merges, sep="|") -> str:
    """The operator's documented contract: leftmost-non-overlapping
    replace SCANS to fixpoint per merge (str.replace-loop semantics)."""
    s = sep + sep.join(word) + sep if word else sep
    for a, b in merges:
        pat, rep = sep + a + sep + b + sep, sep + a + b + sep
        while pat in s:
            s = s.replace(pat, rep)
    return s


def test_bpe_apply_converges_on_adjacent_runs(spark):
    """The documented hazard: a merge whose pattern repeats
    back-to-back ('aaaa' under (a,a)) needs multiple replace scans.
    passes=3 reaches the scan fixpoint for runs up to 2^3; the result
    equals strict BPE for self-runs <= 4 and diverges only at the
    documented odd-self-run >= 5 split point (operators/bpe.py)."""
    merges = (("a", "a"), ("aa", "aa"))
    words = ["aa", "aaa", "aaaa", "aaaaa", "aaaaaa", "aaaaaaaa", "baab"]
    got = _encode_with_engine(spark, words, merges)
    for w in words:
        assert got[w][0] == _scan_reference(w, merges), (w, got[w][0])
    for w in ["aa", "aaa", "aaaa", "baab"]:
        ref = _bpe_reference(w, merges)
        assert got[w][0] == "|" + "|".join(ref) + "|", (w, got[w][0], ref)
    # The documented divergence, pinned so it can't silently change:
    assert got["aaaaa"][0] == "|aa|a|aa|"
    assert _bpe_reference("aaaaa", merges) == ["aaaa", "a"]


def test_bpe_apply_fixed_doc_accounting(spark):
    """Per-doc accounting: words × chars reconcile with the raw text,
    tokens never exceed chars, compression = chars/tokens."""
    out = {r["doc_id"]: r for r in bpe_apply_fixed(spark, SF).collect()}
    docs = spark.read.parquet(f"{SF}/documents.parquet").collect()
    assert len(out) == len(docs)
    for d in docs:
        words = d["text"].split(" ")
        r = out[d["doc_id"]]
        assert r["n_words"] == len(words)
        assert r["n_chars"] == sum(len(w) for w in words)
        assert 0 < r["n_bpe_tokens"] <= r["n_chars"]
        # abs=6e-5 absorbs HALF_UP (engine+oracle) vs HALF_EVEN
        # (Python round) ties at the 4th decimal.
        assert r["compression"] == pytest.approx(
            r["n_chars"] / r["n_bpe_tokens"], abs=6e-5
        )


def test_lm_bigram_perplexity_contract(spark):
    """Planted corpus: a document made of one endlessly repeated
    bigram (deterministic transitions) must score strictly lower
    perplexity than a document of the same tokens in a shuffled,
    never-repeating order — THE property the CCNet-style filter
    exists for. Also pins ppl = exp(avg_nll) and n_bigrams = n-1."""
    rows = {r["doc_id"]: r for r in lm_bigram_perplexity(spark, SF).collect()}
    docs = spark.read.parquet(f"{SF}/documents.parquet").collect()
    for d in docs:
        n = len(d["text"].split(" "))
        if n >= 2:
            r = rows[d["doc_id"]]
            assert r["n_bigrams"] == n - 1
            # ppl is exp() of the UNROUNDED avg_nll; reconstructing
            # from the 4-decimal avg_nll carries rel error ~e^5e-5.
            assert r["ppl"] == pytest.approx(
                math.exp(r["avg_nll"]), rel=1.2e-4, abs=1e-3
            )
            assert r["ppl"] > 0

    # Planted separation on a synthetic documents table.
    import duckdb_distributed_execution_spark.queries as Q

    rep = " ".join(["alpha", "beta"] * 30)
    toks = ["w%02d" % i for i in range(60)]
    shuf = " ".join(toks)
    df = spark.createDataFrame(
        [(1, rep, "en", "s", len(rep)), (2, shuf, "en", "s", len(shuf))],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    import tempfile

    with tempfile.TemporaryDirectory() as tmp:
        df.write.mode("overwrite").parquet(f"{tmp}/documents.parquet")
        Q._LOAD_CACHE.clear()
        try:
            out = {
                r["doc_id"]: r
                for r in lm_bigram_perplexity(spark, tmp).collect()
            }
        finally:
            Q._LOAD_CACHE.clear()
    assert out[1]["ppl"] < out[2]["ppl"]


def test_bpe_apply_randomized_batch(spark):
    """Seeded randomized sweep: 200 random words over a 3-letter
    alphabet under a random 6-merge table must encode to exactly the
    scan-fixpoint reference, in one Spark job."""
    import random

    rng = random.Random(20260815)
    alpha = "abc"
    merges = []
    toks = list(alpha)
    for _ in range(6):
        a, b = rng.choice(toks), rng.choice(toks)
        merges.append((a, b))
        toks.append(a + b)
    merges = tuple(merges)
    words = [
        "".join(rng.choice(alpha) for _ in range(rng.randrange(1, 12)))
        for _ in range(200)
    ]
    words = sorted(set(words))
    got = _encode_with_engine(spark, words, merges)
    for w in words:
        assert got[w][0] == _scan_reference(w, merges), (w, merges)
