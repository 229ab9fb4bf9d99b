"""Twenty-ninth-wave operators — robust outlier fences and cohort
value curves: Tukey IQR fences on purchase values per event type
(the boxplot rule — the robust screen that MAD complements), and the
cohort LTV accumulation matrix (cumulative revenue per signup cohort
by weeks since signup — the payback-period read).

North-star greenfield. Conventions: quartiles are exact discrete rank
picks (value-domain histogram is unbounded → rank select with
tie-breaks), fences are fixed expressions over those exact picks,
revenue is exact integer cents with prefix sums inside the cohort
window.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from duckdb_distributed_execution_spark.queries import load, register

# ---------------------------------------------------------------------------
# Tukey IQR fences per event type
# ---------------------------------------------------------------------------


@register(
    "iqr_outlier_fences",
    oracle="""
    WITH r AS (
      SELECT event_type, value,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY value, event_id) AS rn,
             COUNT(*) OVER (PARTITION BY event_type) AS n
      FROM events),
    q AS (
      SELECT event_type,
             MAX(CASE WHEN rn = CAST(ceil(0.25 * n) AS BIGINT)
                      THEN value END) AS q1,
             MAX(CASE WHEN rn = CAST(ceil(0.75 * n) AS BIGINT)
                      THEN value END) AS q3,
             MAX(n) AS n
      FROM r GROUP BY event_type),
    f AS (
      SELECT event_type, n, q1, q3,
             q1 - 1.5 * (q3 - q1) AS lo,
             q3 + 1.5 * (q3 - q1) AS hi
      FROM q)
    SELECT f.event_type,
           CAST(f.n AS BIGINT) AS n_events,
           ROUND(f.q1, 4) AS q1, ROUND(f.q3, 4) AS q3,
           ROUND(f.lo, 4) AS fence_low, ROUND(f.hi, 4) AS fence_high,
           SUM(CASE WHEN e.value < f.lo OR e.value > f.hi
                    THEN 1 ELSE 0 END) AS n_outliers
    FROM f JOIN events e ON e.event_type = f.event_type
    GROUP BY f.event_type, f.n, f.q1, f.q3, f.lo, f.hi
    """,
)
def iqr_outlier_fences(spark, sf_dir):
    """Tukey boxplot fences per event type: exact discrete Q1/Q3
    (rank picks at ceil(0.25·n)/ceil(0.75·n) with event_id
    tie-breaks — quantile_disc semantics, never interpolation), the
    1.5·IQR fences as one fixed double expression over those exact
    picks, and the row count outside them — the classic robust
    screen, complementing robust_mad_outliers with the quartile
    flavor every BI boxplot draws. One keyed rank window plus one
    broadcast of the |types|-row fence relation back over the events
    for the outlier count."""
    e = load(spark, sf_dir, "events")["events"]
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    wa = Window.partitionBy("event_type")
    r = e.select(
        "event_type",
        "value",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wa).alias("n"),
    )
    q = r.groupBy("event_type").agg(
        F.max(
            F.when(F.col("rn") == F.ceil(0.25 * F.col("n")), F.col("value"))
        ).alias("q1"),
        F.max(
            F.when(F.col("rn") == F.ceil(0.75 * F.col("n")), F.col("value"))
        ).alias("q3"),
        F.max("n").alias("n"),
    )
    f = q.select(
        "event_type",
        "n",
        "q1",
        "q3",
        (F.col("q1") - 1.5 * (F.col("q3") - F.col("q1"))).alias("lo"),
        (F.col("q3") + 1.5 * (F.col("q3") - F.col("q1"))).alias("hi"),
    )
    joined = e.select("event_type", "value").join(F.broadcast(f), on="event_type")
    return joined.groupBy(
        "event_type", "n", "q1", "q3", "lo", "hi"
    ).agg(
        F.sum(
            F.when(
                (F.col("value") < F.col("lo")) | (F.col("value") > F.col("hi")),
                1,
            ).otherwise(0)
        ).alias("n_outliers")
    ).select(
        "event_type",
        F.col("n").cast("long").alias("n_events"),
        F.round("q1", 4).alias("q1"),
        F.round("q3", 4).alias("q3"),
        F.round("lo", 4).alias("fence_low"),
        F.round("hi", 4).alias("fence_high"),
        "n_outliers",
    )


# ---------------------------------------------------------------------------
# Cohort LTV accumulation matrix
# ---------------------------------------------------------------------------


@register(
    "cohort_ltv_curve",
    oracle="""
    WITH first_seen AS (
      SELECT user_id,
             date_trunc('week', MIN(CAST(ts AS DATE))) AS cohort
      FROM events GROUP BY user_id),
    rev AS (
      SELECT f.cohort,
             CAST(date_diff('day', f.cohort,
                            date_trunc('week', CAST(e.ts AS DATE))) // 7
                  AS INTEGER) AS wk,
             SUM(CAST(floor(e.value * 100.0 + 0.5) AS BIGINT)) AS cents
      FROM events e
      JOIN first_seen f ON f.user_id = e.user_id
      WHERE e.event_type = 'purchase'
      GROUP BY 1, 2),
    sz AS (SELECT cohort, COUNT(*) AS cohort_users FROM first_seen
           GROUP BY cohort)
    SELECT CAST(r.cohort AS DATE) AS cohort,
           r.wk AS weeks_since_signup,
           CAST(sz.cohort_users AS BIGINT) AS cohort_users,
           CAST(SUM(r.cents) OVER (PARTITION BY r.cohort ORDER BY r.wk
                                   ROWS UNBOUNDED PRECEDING) AS DOUBLE)
             / 100.0 AS cum_revenue,
           ROUND(CAST(SUM(r.cents) OVER (PARTITION BY r.cohort ORDER BY r.wk
                                         ROWS UNBOUNDED PRECEDING) AS DOUBLE)
                 / (100.0 * sz.cohort_users), 6) AS ltv_per_user
    FROM rev r JOIN sz ON sz.cohort = r.cohort
    """,
)
def cohort_ltv_curve(spark, sf_dir):
    """Cohort LTV curves: users cohorted by first-activity week, and
    per (cohort, weeks-since-signup) the CUMULATIVE purchase revenue
    and per-user LTV — the matrix whose curves answer when a cohort
    pays back acquisition cost, the revenue twin of cohort_retention.
    First-seen is one grouped MIN; revenue accumulates in exact
    integer cents with the prefix sum inside a per-cohort window over
    the |cohorts|×|weeks| AGGREGATE; the per-user division is the
    only double. The user->cohort attach is a keyed join on user_id —
    one fact shuffle at 100 TB."""
    e = load(spark, sf_dir, "events")["events"]
    first_seen = e.groupBy("user_id").agg(
        F.date_trunc("week", F.min(F.col("ts").cast("date")))
        .cast("date")
        .alias("cohort")
    )
    rev = (
        e.filter(F.col("event_type") == "purchase")
        .join(first_seen, on="user_id")
        .select(
            "cohort",
            F.expr(
                "div(datediff(date_trunc('week', cast(ts as date)), cohort), 7)"
            )
            .cast("int")
            .alias("wk"),
            F.floor(F.col("value") * 100.0 + 0.5).cast("long").alias("cents"),
        )
        .groupBy("cohort", "wk")
        .agg(F.sum("cents").alias("cents"))
    )
    sz = first_seen.groupBy("cohort").agg(
        F.count(F.lit(1)).alias("cohort_users")
    )
    wc = Window.partitionBy("cohort").orderBy("wk").rowsBetween(
        Window.unboundedPreceding, 0
    )
    out = rev.join(F.broadcast(sz), on="cohort").select(
        F.col("cohort").cast("date").alias("cohort"),
        F.col("wk").alias("weeks_since_signup"),
        F.col("cohort_users").cast("long").alias("cohort_users"),
        (F.sum("cents").over(wc).cast("double") / 100.0).alias("cum_revenue"),
        F.round(
            F.sum("cents").over(wc).cast("double")
            / (100.0 * F.col("cohort_users")),
            6,
        ).alias("ltv_per_user"),
    )
    return out
