"""Twenty-fourth-wave operators — growth accounting and basket
dispersion: the weekly new/retained/resurrected/churned user ledger
(the canonical growth decomposition: net change never hides churn),
and the Poisson overdispersion test on order basket sizes (is basket
size memoryless, or do large baskets cluster?).

North-star greenfield. Conventions: user-week classification from
lag/lead over the (user, week) pre-aggregate; churn weeks validated
against the week spine by semi-join; the ledger is a tagged union +
pivot aggregate (no per-class joins); dispersion stays in integer
space until one final division, and the over/under call is a pure
integer predicate.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from duckdb_distributed_execution_spark.queries import load, register

# ---------------------------------------------------------------------------
# Weekly growth accounting
# ---------------------------------------------------------------------------


@register(
    "growth_accounting_weekly",
    oracle="""
    WITH uw AS (
      SELECT DISTINCT user_id,
             date_trunc('week', CAST(ts AS DATE)) AS week
      FROM events),
    cl AS (
      SELECT user_id, week,
             MIN(week) OVER (PARTITION BY user_id) AS first_week,
             lag(week) OVER (PARTITION BY user_id ORDER BY week) AS prev_w,
             lead(week) OVER (PARTITION BY user_id ORDER BY week) AS next_w
      FROM uw),
    act AS (
      SELECT week,
             CASE WHEN week = first_week THEN 'new'
                  WHEN prev_w = week - INTERVAL 7 DAY THEN 'retained'
                  ELSE 'resurrected' END AS tag
      FROM cl),
    churn AS (
      SELECT week + INTERVAL 7 DAY AS week, 'churned' AS tag
      FROM cl
      WHERE (next_w IS NULL OR next_w > week + INTERVAL 7 DAY)
        AND week + INTERVAL 7 DAY IN (SELECT DISTINCT week FROM uw)),
    led AS (SELECT * FROM act UNION ALL SELECT * FROM churn)
    SELECT CAST(week AS DATE) AS week,
           SUM(CASE WHEN tag = 'new' THEN 1 ELSE 0 END) AS new_users,
           SUM(CASE WHEN tag = 'retained' THEN 1 ELSE 0 END) AS retained,
           SUM(CASE WHEN tag = 'resurrected' THEN 1 ELSE 0 END)
             AS resurrected,
           SUM(CASE WHEN tag = 'churned' THEN 1 ELSE 0 END) AS churned
    FROM led GROUP BY week
    """,
)
def growth_accounting_weekly(spark, sf_dir):
    """Weekly growth accounting — every active user classified as NEW
    (first week ever), RETAINED (also active the prior week), or
    RESURRECTED (returning after a gap), plus the CHURNED count
    (active prior week, absent now) — the decomposition that stops a
    flat DAU line from hiding equal-and-opposite acquisition and
    churn. Classification is lag/lead over the distinct (user, week)
    pre-aggregate (|users|×|weeks| bounded — the raw corpus shuffles
    once); churn rows emit at week+7 and are validated against the
    observed week spine by an equi semi-join (no churn is charged
    past the corpus horizon); the final ledger is a tagged UNION +
    pivot aggregate — no per-class joins."""
    e = load(spark, sf_dir, "events")["events"]
    uw = e.select(
        "user_id",
        F.date_trunc("week", F.col("ts").cast("date")).cast("date").alias(
            "week"
        ),
    ).distinct()
    wu = Window.partitionBy("user_id")
    wo = wu.orderBy("week")
    cl = uw.select(
        "user_id",
        "week",
        F.min("week").over(wu).alias("first_week"),
        F.lag("week").over(wo).alias("prev_w"),
        F.lead("week").over(wo).alias("next_w"),
    )
    act = cl.select(
        "week",
        F.when(F.col("week") == F.col("first_week"), F.lit("new"))
        .when(F.col("prev_w") == F.date_sub("week", 7), F.lit("retained"))
        .otherwise(F.lit("resurrected"))
        .alias("tag"),
    )
    spine = uw.select("week").distinct()
    churn = (
        cl.filter(
            F.col("next_w").isNull()
            | (F.col("next_w") > F.date_add("week", 7))
        )
        .select(F.date_add("week", 7).alias("week"), F.lit("churned").alias("tag"))
        .join(F.broadcast(spine), on="week", how="left_semi")
    )
    led = act.unionByName(churn)
    return led.groupBy("week").agg(
        F.sum(F.when(F.col("tag") == "new", 1).otherwise(0)).alias("new_users"),
        F.sum(F.when(F.col("tag") == "retained", 1).otherwise(0)).alias(
            "retained"
        ),
        F.sum(F.when(F.col("tag") == "resurrected", 1).otherwise(0)).alias(
            "resurrected"
        ),
        F.sum(F.when(F.col("tag") == "churned", 1).otherwise(0)).alias(
            "churned"
        ),
    )


# ---------------------------------------------------------------------------
# Basket-size overdispersion
# ---------------------------------------------------------------------------


@register(
    "basket_dispersion",
    oracle="""
    WITH b AS (
      SELECT l_orderkey, COUNT(*) AS x FROM lineitem GROUP BY l_orderkey),
    s AS (
      SELECT COUNT(*) AS n, SUM(x) AS sx, SUM(x * x) AS sxx FROM b)
    SELECT CAST(n AS BIGINT) AS n_orders,
           ROUND(CAST(sx AS DOUBLE) / CAST(n AS DOUBLE), 4) AS mean_basket,
           ROUND(CAST(n * sxx - sx * sx AS DOUBLE)
                 / CAST(n * sx AS DOUBLE), 6) AS dispersion_index,
           n * sxx - sx * sx > n * sx AS overdispersed
    FROM s
    """,
)
def basket_dispersion(spark, sf_dir):
    """Poisson overdispersion test on order basket sizes: the
    index-of-dispersion D = variance/mean equals 1 for a memoryless
    (Poisson) basket process; D > 1 means large baskets cluster
    (bulk-buyer segments — stratify before sampling), D < 1 means
    size is regularized (e.g. a UI cap). Both the index and the
    over/under verdict stay in INTEGER space — D = (n·Σx²−(Σx)²)/
    (n·Σx) and the predicate n·Σx²−(Σx)² > n·Σx — so the boundary
    call is engine-exact; the only doubles are two report divisions.
    One map-side-combined aggregate over order keys, then a 1-row
    reduce."""
    li = load(spark, sf_dir, "lineitem")["lineitem"]
    b = li.groupBy("l_orderkey").agg(F.count(F.lit(1)).alias("x"))
    s = b.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    return s.select(
        F.col("n").cast("long").alias("n_orders"),
        F.round(F.col("sx").cast("double") / F.col("n").cast("double"), 4).alias(
            "mean_basket"
        ),
        F.round(
            (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast(
                "double"
            )
            / (F.col("n") * F.col("sx")).cast("double"),
            6,
        ).alias("dispersion_index"),
        (
            F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
            > F.col("n") * F.col("sx")
        ).alias("overdispersed"),
    )
