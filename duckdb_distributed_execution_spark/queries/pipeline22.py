"""Twenty-second-wave operators — merchandising/engagement analytics:
RFM customer segmentation (the classic recency/frequency/monetary
quintile grid), a weekday seasonality index over event volume
(day-count-normalized, so 30-day months don't bias weekdays), and
Pareto/ABC part classification by revenue (exact integer cumulative
cutoffs).

North-star greenfield. Conventions: money in exact integer cents,
cumulative cutoffs as integer cross-multiplications, ntile/rank
orderings fully tie-broken, doubles only in final divisions.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from duckdb_distributed_execution_spark.queries import load, register

# ---------------------------------------------------------------------------
# RFM segmentation
# ---------------------------------------------------------------------------


@register(
    "rfm_segmentation",
    oracle="""
    WITH c AS (
      SELECT o_custkey,
             COUNT(*) AS frequency,
             SUM(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT))
               AS monetary_cents,
             MAX(o_orderdate) AS last_order
      FROM orders GROUP BY o_custkey),
    r AS (
      SELECT *,
             date_diff('day', last_order,
                       MAX(last_order) OVER ()) AS recency_days
      FROM c),
    s AS (
      SELECT o_custkey, monetary_cents,
             ntile(5) OVER (ORDER BY recency_days DESC, o_custkey) AS r_score,
             ntile(5) OVER (ORDER BY frequency ASC, o_custkey) AS f_score,
             ntile(5) OVER (ORDER BY monetary_cents ASC, o_custkey) AS m_score
      FROM r)
    SELECT CAST(r_score AS INTEGER) AS r_score,
           CAST(f_score AS INTEGER) AS f_score,
           CAST(m_score AS INTEGER) AS m_score,
           COUNT(*) AS n_customers,
           CAST(SUM(monetary_cents) AS DOUBLE) / 100.0 AS segment_revenue
    FROM s GROUP BY r_score, f_score, m_score
    """,
)
def rfm_segmentation(spark, sf_dir):
    """RFM segmentation: each customer's recency (days since last order,
    against the corpus max date), frequency (order count), monetary
    (exact integer cents), scored into quintiles by ntile(5) with
    full (metric, custkey) tie-breaks — 5 is best on every axis — and
    rolled up to the segment grid with customer counts and revenue.
    ntile assignment is engine-identical given a total order (SQL
    standard: earlier buckets take the remainder). The windows rank
    the per-customer AGGREGATE (|customers| rows), not raw orders;
    money stays in integer cents until the final report division.
    At extreme customer cardinality the quintile boundaries come from
    the bucket-refined exact percentiles (operators/quantiles.py)
    instead of a global ntile — same grid, no single-partition
    funnel."""
    o = load(spark, sf_dir, "orders")["orders"]
    c = o.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("frequency"),
        F.sum(
            F.floor(F.col("o_totalprice") * 100.0 + 0.5).cast("long")
        ).alias("monetary_cents"),
        F.max("o_orderdate").alias("last_order"),
    )
    wf = Window.orderBy("o_custkey").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    r = c.withColumn(
        "recency_days",
        F.datediff(F.max("last_order").over(wf), F.col("last_order")),
    )
    s = r.select(
        "o_custkey",
        "monetary_cents",
        F.ntile(5)
        .over(Window.orderBy(F.desc("recency_days"), "o_custkey"))
        .alias("r_score"),
        F.ntile(5)
        .over(Window.orderBy(F.asc("frequency"), "o_custkey"))
        .alias("f_score"),
        F.ntile(5)
        .over(Window.orderBy(F.asc("monetary_cents"), "o_custkey"))
        .alias("m_score"),
    )
    return s.groupBy("r_score", "f_score", "m_score").agg(
        F.count(F.lit(1)).alias("n_customers"),
        (F.sum("monetary_cents").cast("double") / F.lit(100.0)).alias(
            "segment_revenue"
        ),
    ).select(
        F.col("r_score").cast("int").alias("r_score"),
        F.col("f_score").cast("int").alias("f_score"),
        F.col("m_score").cast("int").alias("m_score"),
        "n_customers",
        "segment_revenue",
    )


# ---------------------------------------------------------------------------
# Weekday seasonality index
# ---------------------------------------------------------------------------


@register(
    "weekday_seasonality_index",
    oracle="""
    WITH e AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(strftime(CAST(ts AS DATE), '%w') AS INTEGER) AS wd
      FROM events),
    cnt AS (
      SELECT event_type, wd, COUNT(*) AS x FROM e GROUP BY event_type, wd),
    dspine AS (SELECT DISTINCT day, wd FROM e),
    dw AS (SELECT wd, COUNT(*) AS days_w FROM dspine GROUP BY wd),
    tot AS (
      SELECT event_type, SUM(x) AS total FROM cnt GROUP BY event_type),
    alld AS (SELECT COUNT(*) AS days_all FROM dspine)
    SELECT cnt.event_type, cnt.wd AS weekday,
           CAST(cnt.x AS BIGINT) AS n_events,
           CAST(dw.days_w AS BIGINT) AS n_days,
           ROUND(CAST(cnt.x * a.days_all AS DOUBLE)
                 / CAST(dw.days_w * t.total AS DOUBLE), 6) AS seasonality
    FROM cnt
    JOIN dw ON dw.wd = cnt.wd
    JOIN tot t ON t.event_type = cnt.event_type
    CROSS JOIN alld a
    """,
)
def weekday_seasonality_index(spark, sf_dir):
    """Weekday seasonality of event volume, normalized by how many of
    each weekday the window actually contains (a 30-day window holds
    5 of some weekdays and 4 of others — raw counts would fake a
    ±25% 'effect'): index = (count/days_of_weekday) /
    (total/all_days), computed as one exact integer cross-
    multiplication per cell with a single double division. Weekday
    numbering is strftime %w (0=Sunday) on both engines (Spark
    dayofweek is 1-based — shifted to match). Aggregates are all
    map-side combining; the joins attach |weekdays|- and
    |types|-sized broadcasts."""
    e = load(spark, sf_dir, "events")["events"]
    base = e.select(
        "event_type",
        F.col("ts").cast("date").alias("day"),
        (F.dayofweek(F.col("ts").cast("date")) - 1).alias("wd"),
    )
    cnt = base.groupBy("event_type", "wd").agg(F.count(F.lit(1)).alias("x"))
    dspine = base.select("day", "wd").distinct()
    # days_all rides a full-frame window over the 7-row weekday
    # relation — no 1-row scalar cross join (plancheck bnlj hygiene).
    wf = Window.orderBy("wd").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    dw = dspine.groupBy("wd").agg(F.count(F.lit(1)).alias("days_w")).select(
        "wd", "days_w", F.sum("days_w").over(wf).alias("days_all")
    )
    tot = cnt.groupBy("event_type").agg(F.sum("x").alias("total"))
    return (
        cnt.join(F.broadcast(dw), on="wd")
        .join(F.broadcast(tot), on="event_type")
        .select(
            "event_type",
            F.col("wd").alias("weekday"),
            F.col("x").cast("long").alias("n_events"),
            F.col("days_w").cast("long").alias("n_days"),
            F.round(
                (F.col("x") * F.col("days_all")).cast("double")
                / (F.col("days_w") * F.col("total")).cast("double"),
                6,
            ).alias("seasonality"),
        )
    )


# ---------------------------------------------------------------------------
# Pareto / ABC classification
# ---------------------------------------------------------------------------


@register(
    "pareto_abc_classification",
    oracle="""
    WITH pr AS (
      SELECT l_partkey,
             SUM(CAST(floor(l_extendedprice * (1 - l_discount) * 100.0 + 0.5)
                      AS BIGINT)) AS rev
      FROM lineitem GROUP BY l_partkey),
    r AS (
      SELECT l_partkey, rev,
             SUM(rev) OVER (ORDER BY rev DESC, l_partkey
                            ROWS UNBOUNDED PRECEDING) AS cum,
             SUM(rev) OVER () AS total
      FROM pr),
    cls AS (
      SELECT *,
             CASE WHEN cum * 10 <= total * 8 THEN 'A'
                  WHEN cum * 20 <= total * 19 THEN 'B'
                  ELSE 'C' END AS abc
      FROM r)
    SELECT abc,
           COUNT(*) AS n_parts,
           CAST(SUM(rev) AS DOUBLE) / 100.0 AS class_revenue,
           ROUND(CAST(SUM(rev) AS DOUBLE) / CAST(MAX(total) AS DOUBLE), 6)
             AS revenue_share
    FROM cls GROUP BY abc
    """,
)
def pareto_abc_classification(spark, sf_dir):
    """Pareto/ABC classification of parts by revenue: parts sorted by
    exact-cents revenue; 'A' while the running total stays within 80%
    of corpus revenue, 'B' to 95%, 'C' the tail — the 80/15/5
    inventory-management split. Revenue is exact integer cents
    (price×(1−disc) is one identical per-row double expression,
    floored to cents before any sum) and the class cutoffs are pure
    integer cross-multiplications (cum·10 ≤ total·8), so class
    assignment is engine-exact — no float cumulative share ever
    decides a boundary. The prefix-sum window runs over the per-part
    AGGREGATE; the full-frame total rides the same ordered window
    (one sort, no scalar joins)."""
    li = load(spark, sf_dir, "lineitem")["lineitem"]
    pr = li.groupBy("l_partkey").agg(
        F.sum(
            F.floor(
                F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100.0
                + 0.5
            ).cast("long")
        ).alias("rev")
    )
    w = Window.orderBy(F.desc("rev"), "l_partkey")
    r = pr.select(
        "l_partkey",
        "rev",
        F.sum("rev").over(w.rowsBetween(Window.unboundedPreceding, 0)).alias(
            "cum"
        ),
        F.sum("rev")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing))
        .alias("total"),
    )
    cls = r.withColumn(
        "abc",
        F.when(F.col("cum") * 10 <= F.col("total") * 8, F.lit("A"))
        .when(F.col("cum") * 20 <= F.col("total") * 19, F.lit("B"))
        .otherwise(F.lit("C")),
    )
    return cls.groupBy("abc").agg(
        F.count(F.lit(1)).alias("n_parts"),
        (F.sum("rev").cast("double") / F.lit(100.0)).alias("class_revenue"),
        F.round(
            F.sum("rev").cast("double") / F.max("total").cast("double"), 6
        ).alias("revenue_share"),
    )
