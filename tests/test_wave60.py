"""Wave-60 pins: token-space MinHash-LSH dedup.

The load-bearing claim — word-shingle MinHash measures overlap in
whitespace space, token-shingle MinHash in the MODEL's space — is
pinned with a constructed pair: two documents whose only difference
is a word boundary INSIDE a subword-decomposable word ("rowhash" vs
"row hash"; the BPE merge table reaches row+hash but has no merge
joining them, and the space is an unmergeable 1-char token that gets
dropped). Their token streams are IDENTICAL, so token-space Jaccard
is 1.0 and the pair is a dup; their word-shingle sets differ in every
shingle containing the split word, so word-space MinHash at the same
threshold misses it. Registry-level value equality is the
selfcheck/driver oracle gate."""

from __future__ import annotations

from pyspark.sql import functions as F

from duckdb_distributed_execution_spark.operators import dedup as D
from duckdb_distributed_execution_spark.operators.bpe import bpe_apply_expr
from duckdb_distributed_execution_spark.queries.pipeline42 import BPE_MERGES

_SEP = "\x1f"


def _token_shingles(n=3):
    enc = bpe_apply_expr(F.col("text"), BPE_MERGES)
    toks = F.filter(
        F.split(enc, "\\|"),
        lambda t: (t != F.lit("")) & (t != F.lit(" ")),
    )
    return D.array_shingles(toks, n, _SEP)


def _corpus(spark):
    # The boundary-shifted pair: every occurrence of "rowhash" in doc0
    # is split "row hash" in doc1. Word-shingle sets share only the
    # few shingles not touching the split word (Jaccard ≪ 0.5); token
    # streams are identical (space drops; no row+hash merge exists).
    a = "rowhash table rowhash scan rowhash table scan rowhash"
    b = "row hash table row hash scan row hash table scan row hash"
    rows = [
        (0, a),
        (1, b),
        (2, "alpha beta gamma delta epsilon zeta eta theta"),
        (3, "one two three four five six seven eight nine ten"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_token_streams_identical_across_word_boundary(spark):
    d = _corpus(spark)
    enc = bpe_apply_expr(F.col("text"), BPE_MERGES)
    toks = F.filter(
        F.split(enc, "\\|"),
        lambda t: (t != F.lit("")) & (t != F.lit(" ")),
    )
    got = {
        r["doc_id"]: list(r["t"])
        for r in d.select("doc_id", toks.alias("t")).collect()
    }
    assert got[0] == got[1], "the space must tokenize away"
    assert got[0][:2] == ["row", "hash"]


def test_token_space_catches_what_word_space_misses(spark):
    d = _corpus(spark)
    thresh = 0.5
    word = {
        (r["id_a"], r["id_b"])
        for r in D.minhash_lsh_pairs(
            d, "doc_id", "text", shingle_n=2, num_hashes=8,
            band_size=2, verify_threshold=thresh,
        ).collect()
    }
    token_rows = D.minhash_lsh_pairs(
        d, "doc_id", "text", num_hashes=8, band_size=2,
        verify_threshold=thresh, shingles=_token_shingles(),
    ).collect()
    token = {(r["id_a"], r["id_b"]): r["jaccard"] for r in token_rows}
    assert (0, 1) in token, "token-space MinHash must pair the docs"
    assert token[(0, 1)] == 1.0, "identical token streams => Jaccard 1"
    assert (0, 1) not in word, (
        "if word-space catches this pair the pinned example no longer "
        "demonstrates the gap - rebuild it"
    )
    # and neither space invents unrelated pairs
    assert all(p == (0, 1) for p in token), token
    assert all(p == (0, 1) for p in word), word


def test_registered_query_pairs_are_symmetric_free_and_thresholded(spark):
    from duckdb_distributed_execution_spark.queries import all_queries

    out = all_queries()["dedup_minhash_token_lsh"].fn(
        spark, "/root/testdata/sf0.001"
    )
    rows = out.collect()
    for r in rows:
        assert r["id_a"] < r["id_b"], "pairs must be canonical (a < b)"
        assert r["jaccard"] >= 0.5
