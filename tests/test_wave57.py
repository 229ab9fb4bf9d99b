"""Wave 57 — tokenizer-aware contamination. The ALGORITHM pin (not
just oracle parity): token-space screening must catch an overlap whose
WORD boundaries differ between the benchmark and the training doc —
the exact miss word-level n-gram screens are blind to — and the
whole-text BPE encode must respect word boundaries (space is an
unmergeable token)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def tiny_sf(spark, tmp_path_factory):
    """A minimal documents.parquet: doc 0 is 'benchmark' (id % 97 == 0),
    doc 1 re-spells its trigram with different word boundaries, doc 2
    is clean."""
    p = tmp_path_factory.mktemp("w57")
    spark.createDataFrame(
        [
            (0, "scan the table now please"),
            (1, "xxx scanthe table yyy"),   # same TOKEN stream, other words
            (2, "completely unrelated words here"),
        ],
        "doc_id LONG, text STRING",
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(str(p), "documents.parquet")
    )
    return str(p)


def test_token_screen_catches_boundary_shift(spark, tiny_sf):
    from duckdb_distributed_execution_spark.queries.pipeline57 import (
        contamination_token_ngram,
    )

    rows = {r["doc_id"]: r for r in
            contamination_token_ngram(spark, tiny_sf).collect()}
    # 'scanthe table' tokenizes to [scan, the, table] — identical to the
    # benchmark's token stream — so its trigram hits.
    assert 1 in rows and rows[1]["n_hits"] >= 1
    assert 2 not in rows, "clean doc must not be flagged"


def test_word_screen_misses_the_same_case(spark, tiny_sf):
    """The motivation: the word-level bigram screen does NOT flag
    doc 1 (its word bigrams share nothing with the benchmark's)."""
    from duckdb_distributed_execution_spark.operators import dedup as D

    d = spark.read.parquet(os.path.join(tiny_sf, "documents.parquet"))
    sh = d.select(
        "doc_id", F.array_distinct(D.word_shingles(F.col("text"), 2)).alias("s")
    )
    bench = (
        sh.filter(F.col("doc_id") % 97 == 0)
        .select(F.explode("s").alias("g"))
        .distinct()
    )
    t = sh.filter(F.col("doc_id") % 97 != 0).select(
        "doc_id", F.explode("s").alias("g")
    )
    flagged = t.join(bench, "g").select("doc_id").distinct().collect()
    assert all(r["doc_id"] != 1 for r in flagged), (
        "if the word screen caught this, the wave-57 example is moot"
    )


def test_whole_text_encode_respects_word_boundaries(spark):
    """Space is a 1-char token no merge touches: encoding 'ta ble' must
    NOT merge across the space into 'table'."""
    from duckdb_distributed_execution_spark.operators.bpe import (
        bpe_apply_expr,
    )
    from duckdb_distributed_execution_spark.queries.pipeline42 import (
        BPE_MERGES,
    )

    df = spark.createDataFrame([("ta ble",), ("table",)], "text STRING")
    enc = [
        r["e"]
        for r in df.select(
            bpe_apply_expr(F.col("text"), BPE_MERGES).alias("e")
        ).collect()
    ]
    assert enc[0] == "|ta| |ble|", enc[0]
    assert enc[1] == "|table|", enc[1]


def test_array_shingles_matches_word_shingles_on_words(spark):
    """array_shingles(tokens) must equal word_shingles(text) when the
    array IS the whitespace tokens — the generalization is conservative."""
    from duckdb_distributed_execution_spark.operators import dedup as D
    from duckdb_distributed_execution_spark.operators import text as X

    d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    a = d.select(
        "doc_id",
        F.array_sort(D.word_shingles(F.col("text"), 3)).alias("s"),
    )
    b = d.select(
        "doc_id",
        F.array_sort(
            D.array_shingles(X.tokens(X.normalize_text("text")), 3, " ")
        ).alias("s"),
    )
    assert a.exceptAll(b).limit(1).count() == 0
    assert b.exceptAll(a).limit(1).count() == 0
