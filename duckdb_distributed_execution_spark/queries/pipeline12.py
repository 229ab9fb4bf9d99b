"""Twelfth-wave operators — conversion-latency quantiles and
market-basket lift.

Both compose already-proven machinery: the as-of join and exact
interpolated percentiles for click→purchase latency, and the
PMI-style association algebra applied to orders-as-baskets.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from duckdb_distributed_execution_spark.operators.asof import asof_join
from duckdb_distributed_execution_spark.queries import load, register

# ---------------------------------------------------------------------------
# Conversion latency quantiles
# ---------------------------------------------------------------------------


@register(
    "conversion_latency_quantiles",
    oracle="""
    WITH l AS (
      SELECT event_id, user_id, ts FROM events
      WHERE event_type = 'purchase'),
    r AS (
      SELECT user_id, ts FROM events WHERE event_type = 'click'),
    u AS (
      SELECT user_id, ts, 1 AS side, event_id FROM l
      UNION ALL SELECT user_id, ts, 0, NULL FROM r),
    w AS (
      SELECT event_id, user_id, ts,
             last_value(CASE WHEN side = 0 THEN ts END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, side
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS cts
      FROM u),
    gaps AS (
      SELECT user_id % 8 AS cohort,
             epoch_us(ts) - epoch_us(cts) AS gap_us
      FROM w WHERE event_id IS NOT NULL AND cts IS NOT NULL)
    SELECT cohort,
           COUNT(*) AS n_conversions,
           ROUND(quantile_cont(CAST(gap_us AS DOUBLE), 0.5) / 1000000.0, 4)
             AS p50_s,
           ROUND(quantile_cont(CAST(gap_us AS DOUBLE), 0.9) / 1000000.0, 4)
             AS p90_s
    FROM gaps GROUP BY cohort
    """,
)
def conversion_latency_quantiles(spark, sf_dir):
    """Click→purchase conversion latency, p50/p90 per user cohort —
    the time-to-convert metric every growth dashboard tracks.
    Composes two proven pieces: the single-shuffle backward as-of
    join attaches each purchase's most recent click, and Spark's
    exact interpolated percentile (≡ quantile_cont bit-for-bit,
    proven by `percentiles`) summarizes the integer-microsecond
    gaps; seconds rounded to 4. Everything keyed on user, then an
    8-cohort aggregate.
    """
    e = load(spark, sf_dir, "events")["events"]
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = e.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("cts")
    )
    j = asof_join(
        purchases, clicks, on="user_id", left_ts="ts", right_ts="cts",
        right_cols=[], direction="backward",
    )
    gaps = j.filter(F.col("asof_cts").isNotNull()).select(
        (F.col("user_id") % 8).alias("cohort"),
        (F.unix_micros("ts") - F.unix_micros("asof_cts")).alias("gap_us"),
    )
    return gaps.groupBy("cohort").agg(
        F.count(F.lit(1)).alias("n_conversions"),
        F.round(
            F.percentile(F.col("gap_us").cast("double"), F.lit(0.5))
            / 1000000.0,
            4,
        ).alias("p50_s"),
        F.round(
            F.percentile(F.col("gap_us").cast("double"), F.lit(0.9))
            / 1000000.0,
            4,
        ).alias("p90_s"),
    )


# ---------------------------------------------------------------------------
# Market-basket lift
# ---------------------------------------------------------------------------

_LIFT_MIN_SUP = 3


@register(
    "basket_lift_topk",
    oracle=f"""
    WITH items AS (
      SELECT DISTINCT l_orderkey AS o, l_partkey % 97 AS item
      FROM lineitem),
    n AS (SELECT COUNT(DISTINCT o) AS nb FROM items),
    sup AS (SELECT item, COUNT(*) AS s FROM items GROUP BY item),
    pair AS (
      SELECT a.item AS ia, b.item AS ib, COUNT(*) AS sab
      FROM items a JOIN items b ON a.o = b.o AND a.item < b.item
      GROUP BY a.item, b.item),
    scored AS (
      SELECT ia, ib, sab,
             ROUND((CAST(sab AS DOUBLE) / CAST(nb AS DOUBLE))
                   / ((CAST(sa.s AS DOUBLE) / CAST(nb AS DOUBLE))
                      * (CAST(sb.s AS DOUBLE) / CAST(nb AS DOUBLE))),
                   4) AS lift
      FROM pair
      CROSS JOIN n
      JOIN sup sa ON sa.item = pair.ia
      JOIN sup sb ON sb.item = pair.ib
      WHERE sab >= {_LIFT_MIN_SUP})
    SELECT ia, ib, sab, lift FROM scored
    ORDER BY lift DESC, ia, ib LIMIT 25
    """,
)
def basket_lift_topk(spark, sf_dir):
    """Market-basket lift — the association-rule score
    P(a,b)/(P(a)P(b)) over orders as baskets (items folded to 97
    classes so co-occurrence is dense enough to rank): top-25 item
    pairs that co-purchase more than independence predicts. The pair
    join is bounded by items-per-basket (a self-join keyed on the
    order id — never item×item), supports broadcast back at |items|
    scale, lift rounded before the (score, pair)-ordered top-k.
    The PMI twin (`pmi_cooccurrence_topk`) scores adjacency in text;
    this scores co-membership in transactions.
    """
    li = load(spark, sf_dir, "lineitem")["lineitem"]
    items = li.select(
        F.col("l_orderkey").alias("o"),
        (F.col("l_partkey") % 97).alias("item"),
    ).distinct()
    nb = items.agg(F.countDistinct("o").alias("nb"))
    sup = items.groupBy("item").agg(F.count(F.lit(1)).alias("s"))
    b = items.select(F.col("o"), F.col("item").alias("ib"))
    pair = (
        items.join(b, "o")
        .filter(F.col("item") < F.col("ib"))
        .groupBy(F.col("item").alias("ia"), "ib")
        .agg(F.count(F.lit(1)).alias("sab"))
        .filter(F.col("sab") >= _LIFT_MIN_SUP)
    )
    sa = sup.select(F.col("item").alias("ia"), F.col("s").alias("sa"))
    sb = sup.select(F.col("item").alias("ib"), F.col("s").alias("sb"))
    scored = (
        pair.crossJoin(F.broadcast(nb))
        .join(F.broadcast(sa), "ia")
        .join(F.broadcast(sb), "ib")
        .select(
            "ia",
            "ib",
            "sab",
            F.round(
                (F.col("sab").cast("double") / F.col("nb").cast("double"))
                / (
                    (F.col("sa").cast("double") / F.col("nb").cast("double"))
                    * (F.col("sb").cast("double") / F.col("nb").cast("double"))
                ),
                4,
            ).alias("lift"),
        )
    )
    return scored.orderBy(F.desc("lift"), "ia", "ib").limit(25)
