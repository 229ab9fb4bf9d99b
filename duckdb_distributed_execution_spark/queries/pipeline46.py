"""Forty-sixth wave — trustworthy-experimentation estimators beyond
the SRM/Wilson/chi² family: CUPED variance reduction and the
delta-method CI for ratio (per-user-clustered) metrics.

``abtest_cuped_adjustment`` is Deng et al. 2013 (the industry-
standard pre-experiment covariate adjustment): θ = cov(X,Y)/var(X)
from the pooled pre/post per-user metrics, Ŷ = Y − θ(X − μX); the
query reports per-arm means before/after adjustment and the variance
reduction CUPED buys. ``ratio_metric_delta_ci`` handles the metric
family a plain t-interval gets WRONG — ratios of user-level sums
(value per event), whose denominator is random — via the delta
method with the user as the independent unit.

Both use the deterministic md5 split (operators/sampling.py — the
same hash both engines compute), per-user metrics in exact cents,
and corpus moments as exact integer sums, so every downstream double
is bit-identical cross-engine. int64 headroom: Σx² at cents scale
holds to ~1e5 users × ~3.4e6-cent users (~2e18); beyond that drop to
dollar quantization. Reference has no experimentation surface
(north-star greenfield, BASELINE.json).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from duckdb_distributed_execution_spark.operators.sampling import (
    oracle_sample_bucket,
    sample_bucket,
)
from duckdb_distributed_execution_spark.queries import load, register

_CUT = "2024-01-16 00:00:00"  # pre-period: Jan 1–15; post: Jan 16–30
_SALT = "ab"

_PER_USER_SQL = f"""
    u AS (
      SELECT user_id,
             CAST({oracle_sample_bucket('user_id', _SALT)} % 2 AS BIGINT)
               AS arm,
             SUM(CASE WHEN ts < TIMESTAMP '{_CUT}'
                 THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END) AS x,
             SUM(CASE WHEN ts >= TIMESTAMP '{_CUT}'
                 THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END) AS y,
             SUM(CASE WHEN ts >= TIMESTAMP '{_CUT}' THEN 1 ELSE 0 END)
               AS m
      FROM events GROUP BY user_id)
"""


def _per_user(spark, sf_dir):
    e = load(spark, sf_dir, "events")["events"]
    cents = F.round(F.col("value") * 100).cast("long")
    pre = F.col("ts") < F.to_timestamp(F.lit(_CUT))
    return e.groupBy("user_id").agg(
        (sample_bucket(F.col("user_id"), _SALT) % 2)
        .cast("long")
        .alias("arm"),
        F.sum(F.when(pre, cents).otherwise(F.lit(0))).alias("x"),
        F.sum(F.when(~pre, cents).otherwise(F.lit(0))).alias("y"),
        F.sum(F.when(~pre, 1).otherwise(0)).alias("m"),
    )


@register(
    "abtest_cuped_adjustment",
    oracle=f"""
    WITH {_PER_USER_SQL},
    a AS (
      SELECT arm, COUNT(*) AS na,
             SUM(x) AS sx, SUM(y) AS sy,
             SUM(x * x) AS sxx, SUM(x * y) AS sxy,
             SUM(y * y) AS syy
      FROM u GROUP BY arm),
    p AS (
      SELECT SUM(na) AS n, SUM(sx) AS sx, SUM(sy) AS sy,
             SUM(sxx) AS sxx, SUM(sxy) AS sxy
      FROM a),
    th AS (
      SELECT (CAST(sxy AS DOUBLE) / n
              - (CAST(sx AS DOUBLE) / n) * (CAST(sy AS DOUBLE) / n))
             / (CAST(sxx AS DOUBLE) / n
                - (CAST(sx AS DOUBLE) / n) * (CAST(sx AS DOUBLE) / n))
               AS theta,
             CAST(sx AS DOUBLE) / n AS mx
      FROM p)
    SELECT arm, CAST(na AS BIGINT) AS n_users,
           ROUND(CAST(sy AS DOUBLE) / na / 100.0, 6) AS mean_y,
           ROUND((CAST(sy AS DOUBLE) / na
                  - theta * (CAST(sx AS DOUBLE) / na - mx)) / 100.0, 6)
             AS mean_y_cuped,
           ROUND(theta, 6) AS theta,
           ROUND(1.0 - (
             (CAST(syy AS DOUBLE) / na
              - (CAST(sy AS DOUBLE) / na) * (CAST(sy AS DOUBLE) / na))
             - 2.0 * theta * (CAST(sxy AS DOUBLE) / na
              - (CAST(sx AS DOUBLE) / na) * (CAST(sy AS DOUBLE) / na))
             + theta * theta * (CAST(sxx AS DOUBLE) / na
              - (CAST(sx AS DOUBLE) / na) * (CAST(sx AS DOUBLE) / na))
           ) / (CAST(syy AS DOUBLE) / na
              - (CAST(sy AS DOUBLE) / na) * (CAST(sy AS DOUBLE) / na)),
           6) AS variance_reduction
    FROM a CROSS JOIN th
    """,
)
def abtest_cuped_adjustment(spark, sf_dir):
    """CUPED per arm: raw vs covariate-adjusted post-period mean
    (dollars) plus the realized variance reduction
    1 − var(Ŷ)/var(Y). θ is pooled (standard practice — using a
    per-arm θ would bias the contrast). One shuffle to per-user
    metrics, one to per-arm exact moments; everything after is
    arithmetic over a 2-row relation with a 1-row broadcast θ."""
    u = _per_user(spark, sf_dir)
    a = u.groupBy("arm").agg(
        F.count(F.lit(1)).alias("na"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    p = a.agg(
        F.sum("na").alias("n"),
        F.sum("sx").alias("psx"),
        F.sum("sy").alias("psy"),
        F.sum("sxx").alias("psxx"),
        F.sum("sxy").alias("psxy"),
    )
    n = F.col("n").cast("double")
    theta = (
        F.col("psxy").cast("double") / n
        - (F.col("psx").cast("double") / n)
        * (F.col("psy").cast("double") / n)
    ) / (
        F.col("psxx").cast("double") / n
        - (F.col("psx").cast("double") / n)
        * (F.col("psx").cast("double") / n)
    )
    th = p.select(
        theta.alias("theta"),
        (F.col("psx").cast("double") / n).alias("mx"),
    )
    na = F.col("na").cast("double")
    my = F.col("sy").cast("double") / na
    mxa = F.col("sx").cast("double") / na
    var_y = F.col("syy").cast("double") / na - my * my
    cov_a = F.col("sxy").cast("double") / na - mxa * my
    var_x = F.col("sxx").cast("double") / na - mxa * mxa
    t = F.col("theta")
    var_c = var_y - F.lit(2.0) * t * cov_a + t * t * var_x
    return a.crossJoin(F.broadcast(th)).select(
        "arm",
        F.col("na").cast("long").alias("n_users"),
        F.round(my / F.lit(100.0), 6).alias("mean_y"),
        F.round(
            (my - t * (mxa - F.col("mx"))) / F.lit(100.0), 6
        ).alias("mean_y_cuped"),
        F.round(t, 6).alias("theta"),
        F.round(F.lit(1.0) - var_c / var_y, 6).alias("variance_reduction"),
    )


@register(
    "ratio_metric_delta_ci",
    oracle=f"""
    WITH {_PER_USER_SQL},
    a AS (
      SELECT arm, COUNT(*) AS na,
             SUM(y) AS sy, SUM(m) AS sm,
             SUM(y * y) AS syy, SUM(m * m) AS smm, SUM(y * m) AS sym
      FROM u GROUP BY arm),
    d AS (
      SELECT arm, na, sy, sm,
             CAST(sy AS DOUBLE) / CAST(sm AS DOUBLE) AS r,
             CAST(syy AS DOUBLE) / na
               - (CAST(sy AS DOUBLE) / na) * (CAST(sy AS DOUBLE) / na)
               AS vy,
             CAST(smm AS DOUBLE) / na
               - (CAST(sm AS DOUBLE) / na) * (CAST(sm AS DOUBLE) / na)
               AS vm,
             CAST(sym AS DOUBLE) / na
               - (CAST(sy AS DOUBLE) / na) * (CAST(sm AS DOUBLE) / na)
               AS cym,
             CAST(sm AS DOUBLE) / na AS mm
      FROM a),
    s AS (
      SELECT arm, na, sm, r,
             sqrt((vy - 2.0 * r * cym + r * r * vm) / (na * mm * mm))
               AS se
      FROM d)
    SELECT arm, CAST(na AS BIGINT) AS n_users, CAST(sm AS BIGINT)
             AS n_events,
           ROUND(r / 100.0, 6) AS ratio,
           ROUND(se / 100.0, 6) AS se,
           ROUND((r - 1.96 * se) / 100.0, 6) AS ci_lo,
           ROUND((r + 1.96 * se) / 100.0, 6) AS ci_hi
    FROM s
    """,
)
def ratio_metric_delta_ci(spark, sf_dir):
    """Delta-method 95% CI per arm for the ratio metric value-per-
    event (dollars), with the USER as the independent unit — the
    clustered-denominator correction a naive per-event t-interval
    misses. Var(R) ≈ (var_y − 2R·cov + R²·var_m)/(n·μ_m²), all from
    exact integer moments."""
    u = _per_user(spark, sf_dir)
    a = u.groupBy("arm").agg(
        F.count(F.lit(1)).alias("na"),
        F.sum("y").alias("sy"),
        F.sum("m").alias("sm"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("m") * F.col("m")).alias("smm"),
        F.sum(F.col("y") * F.col("m")).alias("sym"),
    )
    na = F.col("na").cast("double")
    r = F.col("sy").cast("double") / F.col("sm").cast("double")
    my = F.col("sy").cast("double") / na
    mm = F.col("sm").cast("double") / na
    vy = F.col("syy").cast("double") / na - my * my
    vm = F.col("smm").cast("double") / na - mm * mm
    cym = F.col("sym").cast("double") / na - my * mm
    d = a.select(
        "arm", "na", "sm",
        r.alias("r"),
        F.sqrt(
            (vy - F.lit(2.0) * r * cym + r * r * vm) / (na * mm * mm)
        ).alias("se"),
    )
    return d.select(
        "arm",
        F.col("na").cast("long").alias("n_users"),
        F.col("sm").cast("long").alias("n_events"),
        F.round(F.col("r") / F.lit(100.0), 6).alias("ratio"),
        F.round(F.col("se") / F.lit(100.0), 6).alias("se"),
        F.round(
            (F.col("r") - F.lit(1.96) * F.col("se")) / F.lit(100.0), 6
        ).alias("ci_lo"),
        F.round(
            (F.col("r") + F.lit(1.96) * F.col("se")) / F.lit(100.0), 6
        ).alias("ci_hi"),
    )
