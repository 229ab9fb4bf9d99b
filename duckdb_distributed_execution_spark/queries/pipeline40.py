"""Fortieth-wave operator — series memory: the autocorrelation
function of total daily event volume at lags 1..7 (a lag-7 peak IS
weekly seasonality; fast decay means memoryless traffic; slow decay
means trends — the one-glance series diagnostic read before any
forecasting model is chosen).

North-star greenfield. Conventions as leadlag_crosscorrelation: five
exact integer moments per lag, Pearson as a fixed expression, edge
windows shrink n rather than zero-padding.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from duckdb_distributed_execution_spark.queries import load, register

_ACF_LAGS = (1, 2, 3, 4, 5, 6, 7)


@register(
    "daily_volume_autocorrelation",
    oracle=f"""
    WITH d AS (
      SELECT CAST(ts AS DATE) AS day, COUNT(*) AS x
      FROM events GROUP BY CAST(ts AS DATE)),
    lags(lag) AS (VALUES {", ".join(f"({k})" for k in _ACF_LAGS)}),
    pairs AS (
      SELECT l.lag, a.x AS xa, b.x AS xb
      FROM lags l
      JOIN d a ON TRUE
      JOIN d b ON b.day = a.day + CAST(l.lag AS INTEGER)),
    s AS (
      SELECT lag, COUNT(*) AS n,
             SUM(xa) AS sa, SUM(xb) AS sb,
             SUM(xa * xb) AS sab, SUM(xa * xa) AS saa,
             SUM(xb * xb) AS sbb
      FROM pairs GROUP BY lag)
    SELECT CAST(lag AS INTEGER) AS lag,
           CAST(n AS BIGINT) AS n_days,
           ROUND(CAST(n * sab - sa * sb AS DOUBLE)
                 / (sqrt(CAST(n * saa - sa * sa AS DOUBLE))
                    * sqrt(CAST(n * sbb - sb * sb AS DOUBLE))), 6)
             AS autocorrelation
    FROM s
    """,
)
def daily_volume_autocorrelation(spark, sf_dir):
    """The ACF of total daily event volume at lags 1..7 — a lag-7
    peak IS weekly seasonality (the frequency-domain twin of
    weekday_seasonality_index's level view), fast decay means
    memoryless traffic, slow decay means trend — the first plot any
    forecaster draws. Same machinery as leadlag_crosscorrelation
    applied to one series against itself: daily counts aggregate
    once, each lag is an equi join on day+lag over the |days|
    aggregate, five exact integer moments per lag, Pearson as one
    fixed expression; partial edge windows shrink n (reported)
    rather than zero-padding."""
    e = load(spark, sf_dir, "events")["events"]
    d = e.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.count(F.lit(1)).alias("x")
    )
    a = d.select("day", F.col("x").alias("xa")).withColumn(
        "lag", F.explode(F.array(*[F.lit(k) for k in _ACF_LAGS]))
    )
    b = d.select(F.col("day").alias("bday"), F.col("x").alias("xb"))
    pairs = a.join(b, F.col("bday") == F.expr("date_add(day, lag)")).select(
        "lag", "xa", "xb"
    )
    s = pairs.groupBy("lag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("xa").alias("sa"),
        F.sum("xb").alias("sb"),
        F.sum(F.col("xa") * F.col("xb")).alias("sab"),
        F.sum(F.col("xa") * F.col("xa")).alias("saa"),
        F.sum(F.col("xb") * F.col("xb")).alias("sbb"),
    )
    num = (F.col("n") * F.col("sab") - F.col("sa") * F.col("sb")).cast("double")
    da = F.sqrt(
        (F.col("n") * F.col("saa") - F.col("sa") * F.col("sa")).cast("double")
    )
    db = F.sqrt(
        (F.col("n") * F.col("sbb") - F.col("sb") * F.col("sb")).cast("double")
    )
    return s.select(
        F.col("lag").cast("int").alias("lag"),
        F.col("n").cast("long").alias("n_days"),
        F.round(num / (da * db), 6).alias("autocorrelation"),
    )
