"""Unit properties for the round-2 widening operators: product
quantization, Bloom decontamination, bounded-window EWMA."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from tests.conftest import SF_SMOKE


def _pq_codebook(spark, e, m, dsub, k_codes):
    from pyspark.sql import Window

    from duckdb_distributed_execution_spark.operators.similarity import (
        pq_subvectors,
    )

    w = Window.orderBy("vec_id")
    ranked = e.filter(F.col("vec_id") < k_codes).select(
        (F.row_number().over(w) - 1).cast("int").alias("code"), "embedding"
    )
    return pq_subvectors(ranked, "code", "embedding", m, dsub).select(
        F.col("__id").alias("code"), "sub", F.col("sv").alias("cv")
    )


def test_pq_encode_codebook_self_identity(spark):
    """A codebook seed vector must encode to its own code in every
    subspace (its distance to itself is exactly 0)."""
    from duckdb_distributed_execution_spark.operators.similarity import pq_encode
    from duckdb_distributed_execution_spark.queries import load

    e = load(spark, SF_SMOKE, "embeddings")["embeddings"]
    cb = _pq_codebook(spark, e, m=8, dsub=8, k_codes=16)
    from pyspark.sql import Window

    w = Window.orderBy("vec_id")
    seeds = e.filter(F.col("vec_id") < 16).select(
        "vec_id",
        (F.row_number().over(w) - 1).cast("int").alias("expected_code"),
        "embedding",
    )
    codes = pq_encode(seeds, cb, m=8, dsub=8)
    joined = codes.join(
        seeds.select("vec_id", "expected_code"), on="vec_id"
    )
    bad = joined.filter(F.col("code") != F.col("expected_code")).count()
    assert bad == 0
    assert codes.count() == 16 * 8  # every (seed, subspace) encoded


def test_pq_adc_ranks_self_first(spark):
    """When the query vector is itself in the encoded corpus, its ADC
    distance to itself is the pure quantization error — which must
    never exceed the ADC distance to any other vector's codes plus
    that vector's own error, so self lands in the top ranks. We assert
    the weaker deterministic property: rank-1 adist ≤ every other
    adist for each query, and ranks are 1..k dense."""
    from duckdb_distributed_execution_spark.queries import all_queries

    fn = all_queries()["ann_pq_adc_topk"].fn
    rows = fn(spark, SF_SMOKE).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r)
    for q, rs in by_q.items():
        rs.sort(key=lambda r: r.rank)
        assert [r.rank for r in rs] == list(range(1, len(rs) + 1))
        assert all(
            rs[i].adist <= rs[i + 1].adist for i in range(len(rs) - 1)
        )


def test_bloom_no_false_negatives(spark):
    """Every candidate 3-gram that literally appears in the benchmark
    gram set MUST test positive in the Bloom filter — false positives
    are allowed, false negatives never. Checked by comparing the bloom
    screen's per-doc hit count against the exact-overlap count: bloom
    hits >= exact hits for every doc."""
    from duckdb_distributed_execution_spark.operators.dedup import word_shingles
    from duckdb_distributed_execution_spark.queries import all_queries, load

    d = load(spark, SF_SMOKE, "documents")["documents"]
    grams = d.select(
        "doc_id", F.explode(word_shingles(F.col("text"), 3)).alias("g")
    )
    bench_set = grams.filter(F.col("doc_id") % 50 == 0).select("g").distinct()
    exact = (
        grams.filter(F.col("doc_id") % 50 != 0)
        .join(bench_set, on="g", how="left_semi")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("exact_hits"))
    )

    # Re-run the bloom pipeline WITHOUT its >=20% report filter: the
    # no-false-negative property must hold for every doc, not just
    # flagged ones.  (The registered query shares this code path.)
    from duckdb_distributed_execution_spark.queries import pipeline5 as P

    p1 = F.conv(F.substring(F.md5(F.col("g")), 1, 7), 16, 10).cast("long") % P._BLOOM_BITS
    p2 = F.conv(F.substring(F.md5(F.col("g")), 8, 7), 16, 10).cast("long") % P._BLOOM_BITS
    bench = grams.filter(F.col("doc_id") % 50 == 0)
    bpos = bench.select(p1.alias("p")).unionAll(bench.select(p2.alias("p"))).distinct()
    bloom = (
        bpos.select(
            (F.col("p") / P._BLOOM_WORD).cast("int").alias("w"),
            F.expr(
                f"shiftleft(CAST(1 AS BIGINT), CAST(p % {P._BLOOM_WORD} AS INT))"
            ).alias("bv"),
        )
        .groupBy("w")
        .agg(F.bit_or("bv").alias("bits"))
    )
    cand = grams.filter(F.col("doc_id") % 50 != 0).select(
        "doc_id", p1.alias("p1"), p2.alias("p2")
    )
    bv1 = F.expr(f"shiftleft(CAST(1 AS BIGINT), CAST(p1 % {P._BLOOM_WORD} AS INT))")
    bv2 = F.expr(f"shiftleft(CAST(1 AS BIGINT), CAST(p2 % {P._BLOOM_WORD} AS INT))")
    hits = (
        cand.join(
            F.broadcast(bloom.select(F.col("w").alias("w1"), F.col("bits").alias("bits1"))),
            F.col("w1") == (F.col("p1") / P._BLOOM_WORD).cast("int"),
            "left",
        )
        .join(
            F.broadcast(bloom.select(F.col("w").alias("w2"), F.col("bits").alias("bits2"))),
            F.col("w2") == (F.col("p2") / P._BLOOM_WORD).cast("int"),
            "left",
        )
        .select(
            "doc_id",
            F.when(
                (F.coalesce(F.col("bits1"), F.lit(0)).bitwiseAND(bv1) != 0)
                & (F.coalesce(F.col("bits2"), F.lit(0)).bitwiseAND(bv2) != 0),
                1,
            ).otherwise(0).alias("hit"),
        )
    )
    bloom_hits = hits.groupBy("doc_id").agg(F.sum("hit").alias("bloom_hits"))
    merged = exact.join(bloom_hits, on="doc_id", how="left").collect()
    assert merged, "expected at least one doc with exact benchmark overlap"
    for r in merged:
        assert (r.bloom_hits or 0) >= r.exact_hits, (
            f"false negative: doc {r.doc_id} exact={r.exact_hits} "
            f"bloom={r.bloom_hits}"
        )


def test_window_ewma_matches_pandas(spark):
    """window_ewma equals pandas ewm(alpha=.5, adjust=True) restricted
    to the same 11-row trailing window, to 6 decimals (the engine
    computes on integer micros; pandas on raw doubles — agreement to
    the rounding precision is the contract)."""
    pd = pytest.importorskip("pandas")

    from duckdb_distributed_execution_spark.queries import all_queries, load

    fn = all_queries()["window_ewma"].fn
    got = {
        (r.user_id, r.event_id): r.ewma for r in fn(spark, SF_SMOKE).collect()
    }

    ev = (
        load(spark, SF_SMOKE, "events")["events"]
        .filter(F.col("event_type") == "view")
        .select("user_id", "event_id", "ts", "value")
        .toPandas()
    )
    ev = ev.sort_values(["user_id", "ts", "event_id"])
    checked = 0
    for uid, g in ev.groupby("user_id"):
        vals = g["value"].tolist()
        for i in range(len(vals)):
            lo = max(0, i - 10)
            window = vals[lo : i + 1]
            num = sum(
                x * 0.5 ** (len(window) - 1 - j) for j, x in enumerate(window)
            )
            den = sum(0.5 ** (len(window) - 1 - j) for j in range(len(window)))
            expected = num / den
            key = (uid, g["event_id"].iloc[i])
            assert key in got
            assert got[key] == pytest.approx(expected, abs=2e-6)
            checked += 1
    assert checked > 50


def test_pq_adc_recall_gate(spark):
    """Recall@k gate for the PQ-ADC path (round-4 verdict task 8 —
    the banded family's rigor applied here): recall@5 of the ADC
    ranking against the exact squared-L2 ground truth, same corpus /
    queries / codebook as the registered ann_pq_adc_topk query.
    Everything is deterministic (seeded codebook, no RNG), so the
    measured recall pins the config: 0.28 at sf0.01 with the crude
    16-entry codebook on isotropic embeddings (the hardest case —
    production codebooks are k-means-trained per subspace, and
    similarity.kmeans_train exists for that). A silently broken
    codebook or LUT join drops this to ~chance (5/n_corpus ~ 0.01)
    and fails loudly. Top-50 ADC must also cover >= half the exact
    top-5 (measured 0.60) — the re-rank-depth property ADC
    deployments rely on."""
    from pyspark.sql import Window

    from duckdb_distributed_execution_spark.operators.similarity import (
        pq_adc_topk,
        pq_encode,
        sq_l2,
    )
    from duckdb_distributed_execution_spark.queries import load

    sf = "/root/testdata/sf0.01"
    e = load(spark, sf, "embeddings")["embeddings"]
    cb = _pq_codebook(spark, e, m=8, dsub=8, k_codes=16)
    corpus = e.filter(F.col("vec_id") >= 16)
    queries = e.filter((F.col("vec_id") >= 16) & (F.col("vec_id") < 21))
    codes = pq_encode(corpus, cb, m=8, dsub=8)

    q = queries.select(
        F.col("vec_id").alias("query_id"),
        F.transform("embedding", lambda x: x.cast("double")).alias("qv"),
    )
    c = corpus.select(
        F.col("vec_id").alias("neighbor_id"),
        F.transform("embedding", lambda x: x.cast("double")).alias("cv"),
    )
    d = c.join(F.broadcast(q)).select(
        "query_id", "neighbor_id", sq_l2(F.col("qv"), F.col("cv")).alias("d")
    )
    w = Window.partitionBy("query_id").orderBy(F.col("d").asc(), "neighbor_id")
    truth = (
        d.withColumn("rn", F.row_number().over(w))
        .filter("rn <= 5")
        .select("query_id", "neighbor_id")
    )
    n_truth = truth.count()
    assert n_truth == 25

    adc5 = pq_adc_topk(codes, queries, cb, m=8, dsub=8, k=5).select(
        "query_id", "neighbor_id"
    )
    hits5 = truth.join(adc5, ["query_id", "neighbor_id"]).count()
    assert hits5 / n_truth >= 0.24  # measured 0.28 — deterministic

    adc50 = pq_adc_topk(codes, queries, cb, m=8, dsub=8, k=50).select(
        "query_id", "neighbor_id"
    )
    hits50 = truth.join(adc50, ["query_id", "neighbor_id"]).count()
    assert hits50 / n_truth >= 0.5  # measured 0.60


def test_ivf_multiprobe_recall_gate(spark):
    """Recall@k gate for the IVF multiprobe path: recall@5 at
    nprobe=2 against the exact cosine ground truth (measured 0.48 at
    sf0.01 with 8 cells on isotropic embeddings — deterministic), and
    the multiprobe MONOTONICITY property: probing 2 cells can never
    recall less than probing 1 (the single-probe candidate set is a
    subset). A bad nprobe wiring (probing the wrong cells, duplicate
    pairs, a dropped query) breaks one of the two."""
    from pyspark.sql import Window

    from duckdb_distributed_execution_spark.functions import (
        dot_product,
        l2_norm,
    )
    from duckdb_distributed_execution_spark.operators.similarity import (
        ivf_topk,
    )
    from duckdb_distributed_execution_spark.queries import load

    sf = "/root/testdata/sf0.01"
    e = load(spark, sf, "embeddings")["embeddings"]
    cents = e.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("cid"), "embedding"
    )
    corpus = e.filter(F.col("vec_id") >= 8)
    queries = e.filter((F.col("vec_id") >= 8) & (F.col("vec_id") < 13))

    q = queries.select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qv"),
        l2_norm("embedding").alias("qn"),
    )
    c = corpus.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("cv"),
        l2_norm("embedding").alias("cn"),
    )
    sims = c.join(F.broadcast(q)).select(
        "query_id",
        "neighbor_id",
        (dot_product(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn")))
        .alias("sim"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), "neighbor_id")
    truth = (
        sims.withColumn("rn", F.row_number().over(w))
        .filter("rn <= 5")
        .select("query_id", "neighbor_id")
    )
    n_truth = truth.count()
    assert n_truth == 25

    hits = {}
    for nprobe in (1, 2):
        got = ivf_topk(corpus, queries, cents, k=5, nprobe=nprobe).select(
            "query_id", "neighbor_id"
        )
        assert got.count() == 25  # 5 dense ranks per query, no dupes
        hits[nprobe] = truth.join(got, ["query_id", "neighbor_id"]).count()
    assert hits[2] >= hits[1]            # multiprobe monotonicity
    assert hits[2] / n_truth >= 0.44     # measured 0.48 — deterministic
