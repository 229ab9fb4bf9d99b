"""Wave-48 pins: the conformal coverage guarantee observed on held-out
data, and post-stratification identities."""

from __future__ import annotations

import pytest

from duckdb_distributed_execution_spark.queries.pipeline48 import (
    abtest_poststratified_ate,
    conformal_interval_coverage,
)

SF = "/root/testdata/sf0.01"  # conformal needs calibration mass


def test_conformal_coverage_guarantee(spark):
    """Split-conformal at α=0.1: per-type held-out coverage must sit
    near 90% (finite-sample noise bounded loosely), and the interval
    half-width is positive with sane split sizes."""
    rows = conformal_interval_coverage(spark, SF).collect()
    assert len(rows) >= 3
    for r in rows:
        assert r["n_train"] > 0 and r["n_cal"] > 0 and r["n_test"] > 0
        assert r["half_width"] > 0
        # guarantee: E[coverage] >= 0.9; per-type sample noise at
        # n_test ~ few hundred keeps it well inside [0.8, 1.0].
        assert 0.8 <= r["coverage"] <= 1.0, r
    # aggregate coverage across types should hug the target
    tot = sum(r["n_test"] for r in rows)
    cov = sum(r["coverage"] * r["n_test"] for r in rows) / tot
    assert cov == pytest.approx(0.9, abs=0.05)


def test_poststratified_ate_identities(spark):
    """Weights sum to 1; each stratum's effect is mean1 − mean0; the
    post-stratified ATE (Σ w·effect) stays within the span of the
    per-stratum effects."""
    rows = abtest_poststratified_ate(spark, SF).collect()
    assert rows
    assert sum(r["weight"] for r in rows) == pytest.approx(1.0, abs=1e-4)
    for r in rows:
        assert r["effect"] == pytest.approx(
            r["mean_arm1"] - r["mean_arm0"], abs=3e-6
        )
    ate = sum(r["weight"] * r["effect"] for r in rows)
    lo = min(r["effect"] for r in rows)
    hi = max(r["effect"] for r in rows)
    assert lo - 1e-9 <= ate <= hi + 1e-9
