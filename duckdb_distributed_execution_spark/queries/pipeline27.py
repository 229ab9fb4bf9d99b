"""Twenty-seventh-wave operators — temporal lead–lag structure and
interval estimation: cross-correlation of the click and purchase
daily series at lags −3..+3 (does click volume LEAD purchase
volume?), and Wilson 95% confidence intervals on per-entry-type
session bounce rates (a rate without its interval is a guess at
small n).

North-star greenfield. Conventions: correlation moments are exact
integer power sums (n·Σxy − ΣxΣy over the usual radicals) with
doubles only in the final expression; the Wilson z is one shared
Python literal; session islands identical to the sessionize family.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from duckdb_distributed_execution_spark.queries import load, register

# ---------------------------------------------------------------------------
# Lead–lag cross-correlation of two daily series
# ---------------------------------------------------------------------------

_XC_A = "click"
_XC_B = "purchase"
_XC_LAGS = (-3, -2, -1, 0, 1, 2, 3)


@register(
    "leadlag_crosscorrelation",
    oracle=f"""
    WITH d AS (
      SELECT CAST(ts AS DATE) AS day,
             SUM(CASE WHEN event_type = '{_XC_A}' THEN 1 ELSE 0 END) AS xa,
             SUM(CASE WHEN event_type = '{_XC_B}' THEN 1 ELSE 0 END) AS xb
      FROM events WHERE event_type IN ('{_XC_A}', '{_XC_B}')
      GROUP BY CAST(ts AS DATE)),
    lags(lag) AS (VALUES {", ".join(f"({k})" for k in _XC_LAGS)}),
    pairs AS (
      SELECT l.lag, a.xa, b.xb
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
             AS correlation
    FROM s
    """,
)
def leadlag_crosscorrelation(spark, sf_dir):
    """Lead–lag cross-correlation between the {a} and {b} daily
    series at lags −3..+3 days: corr peaking at a positive lag means
    {a} volume LEADS {b} volume by that many days — the temporal
    causality screen run before any attribution claim. Daily counts
    are one aggregate; each lag pairs the series with itself shifted
    (an equi join on day+lag against the |days|-sized aggregate —
    never raw events); all five moments are exact integer sums, so
    the Pearson value is a fixed expression over exact integers with
    two sqrts. Partial windows at the series edges shrink n per lag
    (reported) rather than zero-padding, which would bias the
    estimate toward 0.""".format(a=_XC_A, b=_XC_B)
    e = load(spark, sf_dir, "events")["events"]
    d = (
        e.filter(F.col("event_type").isin(_XC_A, _XC_B))
        .groupBy(F.col("ts").cast("date").alias("day"))
        .agg(
            F.sum(F.when(F.col("event_type") == _XC_A, 1).otherwise(0)).alias(
                "xa"
            ),
            F.sum(F.when(F.col("event_type") == _XC_B, 1).otherwise(0)).alias(
                "xb"
            ),
        )
    )
    a = d.select("day", "xa").withColumn(
        "lag", F.explode(F.array(*[F.lit(k) for k in _XC_LAGS]))
    )
    b = d.select(F.col("day").alias("bday"), "xb")
    pairs = a.join(
        b, F.col("bday") == F.expr("date_add(day, lag)")
    ).select("lag", "xa", "xb")
    s = pairs.groupBy("lag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("xa").alias("sa"),
        F.sum("xb").alias("sb"),
        F.sum(F.col("xa") * F.col("xb")).alias("sab"),
        F.sum(F.col("xa") * F.col("xa")).alias("saa"),
        F.sum(F.col("xb") * F.col("xb")).alias("sbb"),
    )
    num = (F.col("n") * F.col("sab") - F.col("sa") * F.col("sb")).cast("double")
    da = F.sqrt((F.col("n") * F.col("saa") - F.col("sa") * F.col("sa")).cast("double"))
    db = F.sqrt((F.col("n") * F.col("sbb") - F.col("sb") * F.col("sb")).cast("double"))
    return s.select(
        F.col("lag").cast("int").alias("lag"),
        F.col("n").cast("long").alias("n_days"),
        F.round(num / (da * db), 6).alias("correlation"),
    )


# ---------------------------------------------------------------------------
# Wilson 95% interval on session bounce rates
# ---------------------------------------------------------------------------

_WILSON_Z = 1.959963984540054  # shared literal — never libm-per-engine
_WGAP_US = 1800 * 1_000_000


@register(
    "bounce_rate_wilson_ci",
    oracle=f"""
    WITH o AS (
      SELECT user_id, event_type, epoch_us(ts) AS us, event_id,
             CASE WHEN epoch_us(ts)
                       - lag(epoch_us(ts)) OVER (PARTITION BY user_id
                                                 ORDER BY ts, event_id)
                       > {_WGAP_US}
                  OR lag(epoch_us(ts)) OVER (PARTITION BY user_id
                                             ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS is_start
      FROM events),
    s AS (
      SELECT user_id, event_type, is_start,
             SUM(is_start) OVER (PARTITION BY user_id
                                 ORDER BY us, event_id
                                 ROWS UNBOUNDED PRECEDING) AS sid
      FROM o),
    per AS (
      SELECT user_id, sid, COUNT(*) AS n_events,
             MAX(CASE WHEN is_start = 1 THEN event_type END) AS entry_type
      FROM s GROUP BY user_id, sid),
    r AS (
      SELECT entry_type,
             CAST(COUNT(*) AS DOUBLE) AS n,
             CAST(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS DOUBLE)
               AS k
      FROM per GROUP BY entry_type)
    SELECT entry_type,
           CAST(n AS BIGINT) AS n_sessions,
           CAST(k AS BIGINT) AS bounces,
           ROUND(k / n, 6) AS bounce_rate,
           ROUND(((k / n) + {_WILSON_Z}*{_WILSON_Z} / (2.0 * n)
                  - {_WILSON_Z} * sqrt((k / n) * (1.0 - k / n) / n
                        + {_WILSON_Z}*{_WILSON_Z} / (4.0 * n * n)))
                 / (1.0 + {_WILSON_Z}*{_WILSON_Z} / n), 6) AS ci_low,
           ROUND(((k / n) + {_WILSON_Z}*{_WILSON_Z} / (2.0 * n)
                  + {_WILSON_Z} * sqrt((k / n) * (1.0 - k / n) / n
                        + {_WILSON_Z}*{_WILSON_Z} / (4.0 * n * n)))
                 / (1.0 + {_WILSON_Z}*{_WILSON_Z} / n), 6) AS ci_high
    FROM r
    """,
)
def bounce_rate_wilson_ci(spark, sf_dir):
    """Session bounce rates with WILSON 95% score intervals — the
    interval that stays inside [0,1] and behaves at small n where the
    naive normal interval fails (a 2-of-7 bounce rate without its CI
    is noise read as signal). Sessions are the sessionize family's
    30-minute islands; the 2×2 counts are exact integers; the Wilson
    expression is a fixed tree over (k, n) doubles with the z
    quantile as ONE shared Python literal (never libm-per-engine).
    Everything after the session rollup is |entry types| rows."""
    e = load(spark, sf_dir, "events")["events"]
    us = F.expr("unix_micros(ts)")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    o = e.select(
        "user_id", "event_type", us.alias("us"), "event_id",
        F.when(
            (us - F.lag(us).over(w) > _WGAP_US) | F.lag(us).over(w).isNull(),
            1,
        ).otherwise(0).alias("is_start"),
    )
    ws = Window.partitionBy("user_id").orderBy("us", "event_id").rowsBetween(
        Window.unboundedPreceding, 0
    )
    s = o.select(
        "user_id", "event_type", "is_start",
        F.sum("is_start").over(ws).alias("sid"),
    )
    per = s.groupBy("user_id", "sid").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.max(F.when(F.col("is_start") == 1, F.col("event_type"))).alias(
            "entry_type"
        ),
    )
    r = per.groupBy("entry_type").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(F.when(F.col("n_events") == 1, 1).otherwise(0))
        .cast("double")
        .alias("k"),
    )
    z = F.lit(_WILSON_Z)
    p = F.col("k") / F.col("n")
    center = p + z * z / (2.0 * F.col("n"))
    rad = z * F.sqrt(
        p * (F.lit(1.0) - p) / F.col("n")
        + z * z / (4.0 * F.col("n") * F.col("n"))
    )
    denom = F.lit(1.0) + z * z / F.col("n")
    return r.select(
        "entry_type",
        F.col("n").cast("long").alias("n_sessions"),
        F.col("k").cast("long").alias("bounces"),
        F.round(p, 6).alias("bounce_rate"),
        F.round((center - rad) / denom, 6).alias("ci_low"),
        F.round((center + rad) / denom, 6).alias("ci_high"),
    )
