"""Wave-43 pins: sweep-line concurrency on a planted schedule, and
the distributed Gram/PCA operators against numpy ground truth."""

from __future__ import annotations

import datetime as dt

import numpy as np
import pytest
from pyspark.sql import functions as F

from duckdb_distributed_execution_spark.operators.linalg import (
    covariance_matrix,
    pca_components,
    pca_project,
)

SF = "/root/testdata/sf0.001"


def _ts(minute):
    return dt.datetime(2024, 1, 1, 0, minute)


def test_sweep_concurrency_planted(spark):
    """Three users, hand-laid sessions: [0,10], [5,15], [40,50] →
    peak 2, first reached at t=5; a touching boundary (one session
    ends exactly when another starts) counts as concurrent (start
    ties before end)."""
    from duckdb_distributed_execution_spark.queries.pipeline43 import (
        session_concurrency_sweep,
    )
    import duckdb_distributed_execution_spark.queries as Q
    import tempfile

    rows = []
    eid = 0
    for uid, minutes in ((1, (0, 10)), (2, (5, 15)), (3, (40, 50))):
        for m in minutes:
            rows.append((eid, _ts(m), uid, "e", 1.0, "{}"))
            eid += 1
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    with tempfile.TemporaryDirectory() as tmp:
        df.write.mode("overwrite").parquet(f"{tmp}/events.parquet")
        Q._LOAD_CACHE.clear()
        try:
            r = session_concurrency_sweep(spark, tmp).collect()[0]
        finally:
            Q._LOAD_CACHE.clear()
    assert r["peak_concurrency"] == 2
    assert r["peak_at"] == _ts(5)
    assert r["n_sessions"] == 3

    # Touching boundaries: [0,10] and [10,20] from different users.
    rows2 = [
        (0, _ts(0), 1, "e", 1.0, "{}"),
        (1, _ts(10), 1, "e", 1.0, "{}"),
        (2, _ts(10), 2, "e", 1.0, "{}"),
        (3, _ts(20), 2, "e", 1.0, "{}"),
    ]
    df2 = spark.createDataFrame(
        rows2,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    with tempfile.TemporaryDirectory() as tmp:
        df2.write.mode("overwrite").parquet(f"{tmp}/events.parquet")
        Q._LOAD_CACHE.clear()
        try:
            r2 = session_concurrency_sweep(spark, tmp).collect()[0]
        finally:
            Q._LOAD_CACHE.clear()
    assert r2["peak_concurrency"] == 2
    assert r2["peak_at"] == _ts(10)


@pytest.fixture(scope="module")
def emb_xy(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    X = np.vstack(
        [np.asarray(r["embedding"], dtype=np.float64) for r in emb.collect()]
    )
    return emb, X


def test_covariance_matches_numpy(spark, emb_xy):
    """Distributed quantized Gram == np.cov(bias=True) within the
    1e-9 quantization error (amplified by ~2 sums)."""
    emb, X = emb_xy
    n, cov = covariance_matrix(emb, "embedding")
    assert n == X.shape[0]
    ref = np.cov(X, rowvar=False, bias=True)
    assert np.max(np.abs(cov - ref)) < 1e-6


def test_pca_components_and_projection(spark, emb_xy):
    """Driver-eigh PCA over the distributed covariance: eigenvalues
    descending and positive, components orthonormal, and the
    projected coordinates' population variance equals each
    eigenvalue (the defining property of PCA)."""
    emb, X = emb_xy
    q = 6
    mean, vals, comps = pca_components(emb, "embedding", q=q)
    assert np.allclose(mean, X.mean(axis=0), atol=1e-6)
    assert np.all(np.diff(vals) <= 1e-12) and vals[0] > 0
    assert np.allclose(comps @ comps.T, np.eye(q), atol=1e-9)
    # top eigenvalue dominates any single dimension's variance
    assert vals[0] >= X.var(axis=0).max() - 1e-9

    proj = pca_project(emb, "embedding", q=q).collect()
    assert len(proj) == X.shape[0]
    P = np.vstack([np.asarray(r["pca"]) for r in proj])
    assert P.shape == (X.shape[0], q)
    got_var = P.var(axis=0)
    assert np.allclose(got_var, vals, rtol=1e-5, atol=1e-8)
    # projections of orthogonal components are uncorrelated
    off = np.cov(P, rowvar=False, bias=True) - np.diag(got_var)
    assert np.max(np.abs(off)) < 1e-6


def test_pca_trace_identity(spark, emb_xy):
    """Σ all eigenvalues == trace(cov) == Σ per-dim variances — the
    spectral mass conservation identity across three independent
    computations (distributed Gram → eigh; matrix diagonal; raw numpy
    variances)."""
    emb, X = emb_xy
    d = X.shape[1]
    n, cov = covariance_matrix(emb, "embedding")
    _, vals, _ = pca_components(emb, "embedding", q=d)
    assert np.isclose(vals.sum(), np.trace(cov), atol=1e-8)
    assert np.isclose(np.trace(cov), X.var(axis=0).sum(), atol=1e-5)
