"""Thirty-ninth-wave operators — contingency interpretation and
habit strength: standardized residuals of the lang×source
contingency table (WHICH cells drive a significant chi² — the
interpretability layer the bare statistic lacks), and the active-day
consistency histogram (how habitual is usage — the behavioral
feature retention models lean on hardest).

North-star greenfield. Conventions: expected counts are exact
rationals scaled through the total (e = row·col/n evaluated as ONE
double division); residuals are fixed double trees; day counts exact
integers.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from duckdb_distributed_execution_spark.queries import load, register

# ---------------------------------------------------------------------------
# Standardized residuals of the lang × source contingency
# ---------------------------------------------------------------------------

_RESID_FLAG = 2.0  # |residual| >= 2 ≈ cell significant at ~95%


@register(
    "chisq_residual_cells",
    oracle=f"""
    WITH o AS (
      SELECT lang, source, COUNT(*) AS obs FROM documents
      GROUP BY lang, source),
    m AS (
      SELECT o.*,
             SUM(obs) OVER (PARTITION BY lang) AS row_t,
             SUM(obs) OVER (PARTITION BY source) AS col_t,
             SUM(obs) OVER () AS n
      FROM o),
    r AS (
      SELECT lang, source, obs,
             CAST(row_t * col_t AS DOUBLE) / CAST(n AS DOUBLE) AS expected
      FROM m)
    SELECT lang, source, CAST(obs AS BIGINT) AS observed,
           ROUND(expected, 4) AS expected,
           ROUND((CAST(obs AS DOUBLE) - expected) / sqrt(expected), 4)
             AS std_residual,
           abs((CAST(obs AS DOUBLE) - expected) / sqrt(expected))
             >= {_RESID_FLAG} AS notable
    FROM r
    """,
)
def chisq_residual_cells(spark, sf_dir):
    """Standardized residuals (o−e)/√e for every lang×source cell —
    the INTERPRETABILITY layer over chi_squared_independence's single
    statistic: a significant chi² says 'something is off'; the
    residual table says WHICH source over-represents which language
    (|residual| ≥ 2 ≈ cell-level significance), which is the
    actionable output when balancing a corpus mix. Marginals ride
    windows over the |cells| aggregate (lang-, source-partitioned and
    full-frame — no re-aggregation); each expected count is the exact
    integer product row·col divided ONCE; residuals are fixed double
    trees."""
    d = load(spark, sf_dir, "documents")["documents"]
    o = d.groupBy("lang", "source").agg(F.count(F.lit(1)).alias("obs"))
    wl = Window.partitionBy("lang")
    ws = Window.partitionBy("source")
    wf = Window.orderBy("lang", "source").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    m = o.select(
        "lang",
        "source",
        "obs",
        F.sum("obs").over(wl).alias("row_t"),
        F.sum("obs").over(ws).alias("col_t"),
        F.sum("obs").over(wf).alias("n"),
    )
    expected = (F.col("row_t") * F.col("col_t")).cast("double") / F.col(
        "n"
    ).cast("double")
    resid = (F.col("obs").cast("double") - expected) / F.sqrt(expected)
    return m.select(
        "lang",
        "source",
        F.col("obs").cast("long").alias("observed"),
        F.round(expected, 4).alias("expected"),
        F.round(resid, 4).alias("std_residual"),
        (F.abs(resid) >= _RESID_FLAG).alias("notable"),
    )


# ---------------------------------------------------------------------------
# Active-day consistency histogram
# ---------------------------------------------------------------------------


@register(
    "user_consistency_histogram",
    oracle="""
    WITH ud AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
    span AS (
      SELECT COUNT(DISTINCT day) AS n_days FROM ud),
    c AS (SELECT user_id, COUNT(*) AS active_days FROM ud GROUP BY user_id),
    h AS (
      SELECT active_days, COUNT(*) AS n_users FROM c GROUP BY active_days)
    SELECT CAST(h.active_days AS BIGINT) AS active_days,
           h.n_users,
           ROUND(CAST(h.active_days AS DOUBLE) / CAST(s.n_days AS DOUBLE), 6)
             AS consistency
    FROM h CROSS JOIN span s
    """,
)
def user_consistency_histogram(spark, sf_dir):
    """Habit strength: the histogram of ACTIVE-DAY counts per user
    with each bucket's consistency ratio (active days / observed
    span) — the single behavioral feature retention models lean on
    hardest (a 28-of-30-days user and a 3-of-30 user with equal event
    totals are different species; raw volume can't see it). The
    distinct (user, day) relation is the only corpus-wide shuffle;
    the histogram and the span ratio run on aggregates. The 1-row
    span joins the |buckets| histogram (the whitelisted scalar
    pattern)."""
    e = load(spark, sf_dir, "events")["events"]
    ud = e.select(
        "user_id", F.col("ts").cast("date").alias("day")
    ).distinct()
    c = ud.groupBy("user_id").agg(F.count(F.lit(1)).alias("active_days"))
    # Span (distinct days) attaches via a full-frame window over the
    # histogram? The span is a property of ud, not of c — compute the
    # max active_days ≠ span in general, so ship it via tagged union:
    # one row carries the span, max-combined into every bucket.
    span = ud.select("day").distinct().agg(F.count(F.lit(1)).alias("n_days"))
    h = c.groupBy("active_days").agg(F.count(F.lit(1)).alias("n_users"))
    u = h.select(
        "active_days", "n_users", F.lit(None).cast("long").alias("n_days")
    ).unionByName(
        span.select(
            F.lit(None).cast("long").alias("active_days"),
            F.lit(None).cast("long").alias("n_users"),
            "n_days",
        )
    )
    wf = Window.orderBy(F.col("active_days").asc_nulls_first()).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    filled = u.select(
        "active_days",
        "n_users",
        F.max("n_days").over(wf).alias("n_days"),
    ).filter(F.col("active_days").isNotNull())
    return filled.select(
        F.col("active_days").cast("long").alias("active_days"),
        "n_users",
        F.round(
            F.col("active_days").cast("double") / F.col("n_days").cast("double"),
            6,
        ).alias("consistency"),
    )
