"""Wave-46 pins: CUPED's defining properties (pooled mean
preservation; reduction ≈ corr² on a planted linear covariate) and
the delta-method CI contract."""

from __future__ import annotations

import datetime as dt
import tempfile

import pytest

import duckdb_distributed_execution_spark.queries as Q
from duckdb_distributed_execution_spark.queries.pipeline46 import (
    abtest_cuped_adjustment,
    ratio_metric_delta_ci,
)

SF = "/root/testdata/sf0.001"


def test_cuped_preserves_pooled_mean_and_reduces_variance(spark):
    rows = {r["arm"]: r for r in abtest_cuped_adjustment(spark, SF).collect()}
    assert set(rows) == {0, 1}
    raw = sum(r["n_users"] * r["mean_y"] for r in rows.values())
    adj = sum(r["n_users"] * r["mean_y_cuped"] for r in rows.values())
    # Pooled Σ(Y − θ(X−μX)) == ΣY exactly; tolerance covers the
    # 6-decimal rounding of the published means.
    n = sum(r["n_users"] for r in rows.values())
    assert adj == pytest.approx(raw, abs=n * 2e-6)
    for r in rows.values():
        assert r["variance_reduction"] <= 1.0
        assert rows[0]["theta"] == rows[1]["theta"]  # pooled θ


def test_cuped_planted_linear_covariate(spark):
    """post = 2·pre per user ⇒ corr(X,Y)=1 ⇒ CUPED removes ~all
    variance (reduction → 1) and θ ≈ 2."""
    rows = []
    eid = 0
    for uid in range(40):
        v = 1.0 + (uid % 7)  # pre-period value, varies across users
        rows.append((eid, dt.datetime(2024, 1, 5), uid, "e", v, "{}"))
        eid += 1
        rows.append((eid, dt.datetime(2024, 1, 20), uid, "e", 2 * v, "{}"))
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
            out = {
                r["arm"]: r
                for r in abtest_cuped_adjustment(spark, tmp).collect()
            }
        finally:
            Q._LOAD_CACHE.clear()
    for r in out.values():
        assert r["theta"] == pytest.approx(2.0, abs=1e-6)
        assert r["variance_reduction"] == pytest.approx(1.0, abs=1e-6)


def test_delta_ci_contract(spark):
    rows = ratio_metric_delta_ci(spark, SF).collect()
    assert {r["arm"] for r in rows} == {0, 1}
    for r in rows:
        assert r["se"] > 0
        assert r["ci_lo"] < r["ratio"] < r["ci_hi"]
        assert r["ci_hi"] - r["ratio"] == pytest.approx(
            r["ratio"] - r["ci_lo"], abs=3e-6
        )
        # the ratio really is Σvalue/Σevents for the arm's post period
        assert r["n_events"] > 0 and r["n_users"] > 0


def test_quantile_effects_match_python_quantiles(spark):
    """QTE rows must equal a direct Python recomputation of the
    exact lower quantiles per arm, and quantiles are monotone in p."""
    from duckdb_distributed_execution_spark.queries.pipeline46 import (
        _per_user,
    )
    from duckdb_distributed_execution_spark.queries.pipeline53 import (
        abtest_quantile_effects,
    )

    u = _per_user(spark, SF).collect()
    by_arm = {0: [], 1: []}
    for r in u:
        by_arm[r["arm"]].append((r["y"], r["user_id"]))
    for arm in by_arm:
        by_arm[arm].sort()
    got = {r["pct"]: r for r in abtest_quantile_effects(spark, SF).collect()}
    assert set(got) == {25, 50, 75, 90}
    for pct, r in got.items():
        for arm, col in ((0, "q_arm0"), (1, "q_arm1")):
            ys = by_arm[arm]
            want = ys[int(pct / 100.0 * (len(ys) - 1))][0] / 100.0
            assert r[col] == pytest.approx(want, abs=5e-3)
        assert r["qte"] == pytest.approx(
            r["q_arm1"] - r["q_arm0"], abs=2e-2
        )
    qs = [got[p]["q_arm0"] for p in (25, 50, 75, 90)]
    assert qs == sorted(qs)
