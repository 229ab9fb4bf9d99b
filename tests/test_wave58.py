"""Wave-58 pins: the TRAINED hashed-feature logistic quality
classifier against independent algorithmic ground truth — a planted
separable corpus the fit must separate, an unquantized numpy GD run
the quantized fit must track, and exact partition-independence of the
integer-gradient contract."""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import functions as F

from duckdb_distributed_execution_spark.operators.mlfit import (
    hashed_features,
    logreg_fit,
)
from duckdb_distributed_execution_spark.queries import all_queries

SF_ORACLE = "/root/testdata/sf0.01"

_B = 16


def _bucket(tok: str) -> int:
    return int(hashlib.md5(tok.encode()).hexdigest()[:7], 16) % _B


def _planted(spark):
    """40 docs: positives repeat 'alpha beta', negatives 'gamma delta'
    (distinct hash buckets checked below) — linearly separable by
    construction."""
    rows = []
    for i in range(40):
        y = i % 2
        base = "alpha beta" if y else "gamma delta"
        rows.append((i, (base + " ") * (3 + i % 3), y))
    df = spark.createDataFrame(rows, "doc_id long, text string, y int")
    return df


def test_planted_signal_separates(spark):
    pos = {_bucket("alpha"), _bucket("beta")}
    neg = {_bucket("gamma"), _bucket("delta")}
    assert pos.isdisjoint(neg), "planted tokens must not collide"
    d = _planted(spark)
    feats = hashed_features(d, "doc_id", "text", _B)
    w = logreg_fit(
        feats, d.select("doc_id", "y"), 40, n_buckets=_B, iters=6,
        lr=1.0 / 16.0,
    )
    # every positive-token bucket must outweigh every negative-token
    # bucket, and the induced per-doc scores must separate perfectly
    assert min(w[b] for b in pos) > max(w[b] for b in neg)
    zrows = (
        feats.join(
            F.broadcast(
                d.sparkSession.createDataFrame(
                    [(b, w[b]) for b in sorted(w)], "bucket long, w long"
                )
            ),
            "bucket",
        )
        .groupBy("doc_id")
        .agg(F.sum(F.col("cnt") * F.col("w")).alias("zn"))
        .join(d.select("doc_id", "y"), "doc_id")
        .collect()
    )
    assert all((r["zn"] > 0) == (r["y"] == 1) for r in zrows)


def test_quantized_fit_tracks_float_gd(spark):
    """The nano-quantized integer fit must agree with an UNQUANTIZED
    float GD run over the same dense feature matrix to ~1e-4 per
    weight after 4 rounds — the quantization is a determinism device,
    not a different optimizer."""
    d = _planted(spark)
    feats = hashed_features(d, "doc_id", "text", _B)
    frows = feats.collect()
    y = {r["doc_id"]: r["y"] for r in d.select("doc_id", "y").collect()}
    X = {}
    for r in frows:
        X.setdefault(r["doc_id"], {})[r["bucket"]] = r["cnt"]
    n = len(y)
    lr = 1.0 / 16.0
    wf = {b: 0.0 for b in range(_B + 1)}
    for _ in range(4):
        g = {b: 0.0 for b in wf}
        for doc, fv in X.items():
            z = sum(c * wf[b] for b, c in fv.items())
            err = 1.0 / (1.0 + math.exp(-z)) - y[doc]
            for b, c in fv.items():
                g[b] += err * c / n
        for b in wf:
            wf[b] -= lr * g[b]
    wq = logreg_fit(
        feats, d.select("doc_id", "y"), n, n_buckets=_B, iters=4, lr=lr
    )
    for b in wf:
        assert abs(wq[b] / 1e9 - wf[b]) < 1e-4, (b, wq[b] / 1e9, wf[b])


def test_fit_partition_independent(spark):
    """Integer-gradient sums are associative: the fit must be
    BIT-identical under any repartitioning of the feature relation."""
    d = _planted(spark)
    lab = d.select("doc_id", "y")
    base = hashed_features(d, "doc_id", "text", _B)
    w3 = logreg_fit(base.repartition(3), lab, 40, n_buckets=_B, iters=3)
    w11 = logreg_fit(base.repartition(11), lab, 40, n_buckets=_B, iters=3)
    assert w3 == w11


def test_apply_rates_consistent(spark):
    """quality_classifier_apply accounting: per-lang rows cover the
    corpus, predicted-positive counts are bounded by n, and mean_p
    lies in (0, 1)."""
    out = all_queries()["quality_classifier_apply"].fn(
        spark, SF_ORACLE
    ).collect()
    total = sum(r["n"] for r in out)
    docs = spark.read.parquet(SF_ORACLE + "/documents.parquet").count()
    assert total == docs
    for r in out:
        assert 0 <= r["n_pred_pos"] <= r["n"]
        assert 0.0 < r["mean_p"] < 1.0


def test_train_learns_positive_bias_direction(spark):
    """On the real corpus the label marginal (en ≈ 44%) pins the bias
    sign story: with all-zero init the first-round bias gradient is
    (0.5 − p̂(en)) > 0, so the bias must move negative and stay finite."""
    rows = all_queries()["quality_classifier_train"].fn(
        spark, SF_ORACLE
    ).collect()
    w = {r["bucket"]: r["weight"] for r in rows}
    assert len(w) == _B + 1
    assert w[_B] < 0.0
    assert all(abs(v) < 50.0 for v in w.values())
