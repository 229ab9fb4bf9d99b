"""Forty-eighth wave — distribution-free uncertainty and stratified
effect estimation: split-conformal prediction intervals and the
post-stratified ATE.

``conformal_interval_coverage`` is split (inductive) conformal
prediction, Mondrian-stratified by event type: a point model fit on
the train split, nonconformity scores |y − ŷ| on a disjoint
calibration split, the exact-rank ⌈0.9·(n+1)⌉-th score as the
interval half-width, and the OBSERVED coverage on a held-out test
split — the distribution-free ~90% guarantee, measured. All splits
are the deterministic md5 hash (operators/sampling.py), so both
engines cut identical sets. ``abtest_poststratified_ate`` removes
stratum-mix imbalance from an A/B contrast by reweighting per-stratum
effects with POOLED stratum shares — the adjustment that turns a
confounded naive diff into an apples-to-apples one. Reference has
neither surface (north-star greenfield, BASELINE.json).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from duckdb_distributed_execution_spark.operators.rowid import (
    keyed_row_number,
)
from duckdb_distributed_execution_spark.operators.sampling import (
    oracle_sample_bucket,
    sample_bucket,
)
from duckdb_distributed_execution_spark.queries import load, register

_CONF_SALT = "conformal"
_B = 1_000_000  # sampling bucket space (operators/sampling.py)


def _split_col():
    b = sample_bucket(F.col("event_id"), _CONF_SALT)
    return (
        F.when(b < int(0.5 * _B), F.lit("train"))
        .when(b < int(0.75 * _B), F.lit("cal"))
        .otherwise(F.lit("test"))
    )


def _split_sql() -> str:
    b = oracle_sample_bucket("event_id", _CONF_SALT)
    return f"""CASE WHEN {b} < {int(0.5 * _B)} THEN 'train'
                WHEN {b} < {int(0.75 * _B)} THEN 'cal'
                ELSE 'test' END"""


@register(
    "conformal_interval_coverage",
    oracle=f"""
    WITH e AS (
      SELECT event_id, event_type,
             CAST(round(value * 100) AS BIGINT) AS cents,
             {_split_sql()} AS split
      FROM events),
    model AS (
      SELECT event_type,
             CAST(SUM(cents) AS DOUBLE) / COUNT(*) AS pred,
             COUNT(*) AS n_train
      FROM e WHERE split = 'train' GROUP BY event_type),
    cal AS (
      SELECT e.event_type, e.event_id,
             abs(CAST(e.cents AS DOUBLE) - m.pred) AS r
      FROM e JOIN model m USING (event_type) WHERE split = 'cal'),
    ncal AS (SELECT event_type, COUNT(*) AS n_cal FROM cal GROUP BY 1),
    rk AS (
      SELECT event_type, r,
             ROW_NUMBER() OVER (PARTITION BY event_type
                                ORDER BY r, event_id) AS rn
      FROM cal),
    q AS (
      SELECT rk.event_type, rk.r AS qhat, ncal.n_cal
      FROM rk JOIN ncal USING (event_type)
      WHERE rn = CAST(ceil(0.9 * (n_cal + 1)) AS BIGINT)),
    tst AS (
      SELECT e.event_type,
             COUNT(*) AS n_test,
             SUM(CASE WHEN abs(CAST(e.cents AS DOUBLE) - m.pred) <= q.qhat
                 THEN 1 ELSE 0 END) AS covered
      FROM e JOIN model m USING (event_type)
             JOIN q ON q.event_type = e.event_type
      WHERE split = 'test' GROUP BY e.event_type)
    SELECT m.event_type,
           CAST(m.n_train AS BIGINT) AS n_train,
           CAST(q.n_cal AS BIGINT) AS n_cal,
           CAST(t.n_test AS BIGINT) AS n_test,
           ROUND(m.pred / 100.0, 6) AS pred,
           ROUND(q.qhat / 100.0, 6) AS half_width,
           ROUND(CAST(t.covered AS DOUBLE) / t.n_test, 6) AS coverage
    FROM model m JOIN q USING (event_type) JOIN tst t USING (event_type)
    """,
)
def conformal_interval_coverage(spark, sf_dir):
    """Mondrian split-conformal intervals per event type: per-type
    mean model (exact cents), exact-rank ⌈0.9(n+1)⌉ calibration
    quantile via keyed_row_number (types are low-card hot keys — the
    sanctioned scalable rank), and held-out coverage ≈ 90% by the
    conformal guarantee (pytest-gated). Splits are hash-deterministic;
    every join is type-keyed (|types| rows broadcast)."""
    e = load(spark, sf_dir, "events")["events"]
    base = e.select(
        "event_id",
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
        _split_col().alias("split"),
    )
    model = (
        base.filter(F.col("split") == "train")
        .groupBy("event_type")
        .agg(
            (F.sum("cents").cast("double") / F.count(F.lit(1))).alias("pred"),
            F.count(F.lit(1)).alias("n_train"),
        )
    )
    cal = (
        base.filter(F.col("split") == "cal")
        .join(F.broadcast(model), "event_type")
        .select(
            "event_type",
            "event_id",
            F.abs(F.col("cents").cast("double") - F.col("pred")).alias("r"),
        )
    )
    ncal = cal.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_cal"))
    rk = keyed_row_number(cal, ["event_type"], ["r", "event_id"], id_col="rn")
    q = (
        rk.join(F.broadcast(ncal), "event_type")
        .filter(
            F.col("rn")
            == F.ceil(F.lit(0.9) * (F.col("n_cal") + 1)).cast("long")
        )
        .select("event_type", F.col("r").alias("qhat"), "n_cal")
    )
    tst = (
        base.filter(F.col("split") == "test")
        .join(F.broadcast(model.select("event_type", "pred")), "event_type")
        .join(F.broadcast(q), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_test"),
            F.sum(
                F.when(
                    F.abs(F.col("cents").cast("double") - F.col("pred"))
                    <= F.col("qhat"),
                    1,
                ).otherwise(0)
            ).alias("covered"),
        )
    )
    return (
        model.join(q, "event_type")
        .join(tst, "event_type")
        .select(
            "event_type",
            F.col("n_train").cast("long").alias("n_train"),
            F.col("n_cal").cast("long").alias("n_cal"),
            F.col("n_test").cast("long").alias("n_test"),
            F.round(F.col("pred") / F.lit(100.0), 6).alias("pred"),
            F.round(F.col("qhat") / F.lit(100.0), 6).alias("half_width"),
            F.round(
                F.col("covered").cast("double") / F.col("n_test"), 6
            ).alias("coverage"),
        )
    )


_ATE_SALT = "strat_ab"


@register(
    "abtest_poststratified_ate",
    oracle=f"""
    WITH e AS (
      SELECT event_type AS stratum,
             CAST({oracle_sample_bucket('user_id', _ATE_SALT)} % 2
                  AS BIGINT) AS arm,
             CAST(round(value * 100) AS BIGINT) AS cents
      FROM events),
    cell AS (
      SELECT stratum, arm, COUNT(*) AS n, SUM(cents) AS s
      FROM e GROUP BY stratum, arm),
    w AS (
      SELECT stratum, SUM(n) AS n_s FROM cell GROUP BY stratum),
    tot AS (SELECT SUM(n_s) AS n FROM w)
    SELECT c0.stratum,
           CAST(w.n_s AS BIGINT) AS n_s,
           ROUND(CAST(w.n_s AS DOUBLE) / CAST(tot.n AS DOUBLE), 6)
             AS weight,
           ROUND(CAST(c0.s AS DOUBLE) / c0.n / 100.0, 6) AS mean_arm0,
           ROUND(CAST(c1.s AS DOUBLE) / c1.n / 100.0, 6) AS mean_arm1,
           ROUND((CAST(c1.s AS DOUBLE) / c1.n
                  - CAST(c0.s AS DOUBLE) / c0.n) / 100.0, 6) AS effect
    FROM cell c0 JOIN cell c1
           ON c0.stratum = c1.stratum AND c0.arm = 0 AND c1.arm = 1
         JOIN w ON w.stratum = c0.stratum
         CROSS JOIN tot
    """,
)
def abtest_poststratified_ate(spark, sf_dir):
    """Per-stratum A/B effects with POOLED stratum weights — the
    post-stratification table whose weighted sum is the adjusted ATE
    (Σ w_s·effect_s; the identity is pinned in the cross-consistency
    suite). Strata are event types, arms the deterministic md5 user
    split; every relation after the one grouped pass is
    |strata|-sized."""
    e = load(spark, sf_dir, "events")["events"]
    base = e.select(
        F.col("event_type").alias("stratum"),
        (sample_bucket(F.col("user_id"), _ATE_SALT) % 2)
        .cast("long")
        .alias("arm"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    cell = base.groupBy("stratum", "arm").agg(
        F.count(F.lit(1)).alias("n"), F.sum("cents").alias("s")
    )
    w = cell.groupBy("stratum").agg(F.sum("n").alias("n_s"))
    tot = w.agg(F.sum("n_s").alias("n"))
    c0 = cell.filter(F.col("arm") == 0).select(
        "stratum", F.col("n").alias("n0"), F.col("s").alias("s0")
    )
    c1 = cell.filter(F.col("arm") == 1).select(
        "stratum", F.col("n").alias("n1"), F.col("s").alias("s1")
    )
    m0 = F.col("s0").cast("double") / F.col("n0")
    m1 = F.col("s1").cast("double") / F.col("n1")
    return (
        c0.join(c1, "stratum")
        .join(F.broadcast(w), "stratum")
        .crossJoin(F.broadcast(tot))
        .select(
            "stratum",
            F.col("n_s").cast("long").alias("n_s"),
            F.round(
                F.col("n_s").cast("double") / F.col("n").cast("double"), 6
            ).alias("weight"),
            F.round(m0 / F.lit(100.0), 6).alias("mean_arm0"),
            F.round(m1 / F.lit(100.0), 6).alias("mean_arm1"),
            F.round((m1 - m0) / F.lit(100.0), 6).alias("effect"),
        )
    )
