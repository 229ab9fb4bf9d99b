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


# ---------------------------------------------------------------------------
# A/B test two-proportion z-test
# ---------------------------------------------------------------------------


@register(
    "abtest_proportion_ztest",
    oracle="""
    WITH assign AS (
      SELECT user_id,
             CAST('0x' || substr(md5('exp:' || CAST(user_id AS VARCHAR)),
                                 1, 7) AS BIGINT) % 2 AS variant,
             MAX(CASE WHEN event_type = 'purchase'
                       AND CAST(ROUND(value * 100, 0) AS BIGINT) % 97 < 3
                      THEN 1 ELSE 0 END) AS converted
      FROM events GROUP BY 1, 2),
    arm AS (
      SELECT variant, COUNT(*) AS n, SUM(converted) AS conv
      FROM assign GROUP BY variant),
    wide AS (
      SELECT MAX(CASE WHEN variant = 0 THEN n END) AS n0,
             MAX(CASE WHEN variant = 0 THEN conv END) AS c0,
             MAX(CASE WHEN variant = 1 THEN n END) AS n1,
             MAX(CASE WHEN variant = 1 THEN conv END) AS c1
      FROM arm)
    SELECT n0, c0, n1, c1,
           ROUND(CAST(c0 AS DOUBLE) / CAST(n0 AS DOUBLE), 4) AS p0,
           ROUND(CAST(c1 AS DOUBLE) / CAST(n1 AS DOUBLE), 4) AS p1,
           ROUND((CAST(c0 AS DOUBLE) / CAST(n0 AS DOUBLE)
                  - CAST(c1 AS DOUBLE) / CAST(n1 AS DOUBLE))
                 / sqrt((CAST(c0 + c1 AS DOUBLE) / CAST(n0 + n1 AS DOUBLE))
                        * (1.0 - CAST(c0 + c1 AS DOUBLE)
                                 / CAST(n0 + n1 AS DOUBLE))
                        * (1.0 / CAST(n0 AS DOUBLE)
                           + 1.0 / CAST(n1 AS DOUBLE))), 4) AS z
    FROM wide
    """,
)
def abtest_proportion_ztest(spark, sf_dir):
    """Two-proportion z-test for an A/B experiment — the
    decision-making statistic every experimentation platform
    computes: users hash-assigned to variants (deterministic md5
    split, the same assignment function a real platform uses so
    both engines see identical arms), per-user conversion =
    any-purchase, pooled-variance z on the conversion-rate delta.
    Per-user reduction then a 2-row arm aggregate — the fact table
    is scanned once; identical float op order both engines, all
    statistics rounded to 4.
    """
    e = load(spark, sf_dir, "events")["events"]
    variant = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("exp:"), F.col("user_id").cast("string"))),
                1,
                7,
            ),
            16,
            10,
        ).cast("long")
        % 2
    )
    # "converted" = made a qualifying purchase (value-hash slice keeps
    # the rate mid-range; every user purchases SOMETHING in this data,
    # so any-purchase would be the degenerate p=1 → zero variance).
    assign = e.groupBy("user_id", variant.alias("variant")).agg(
        F.max(
            F.when(
                (F.col("event_type") == "purchase")
                & (
                    F.round(F.col("value") * 100, 0).cast("bigint") % 97 < 3
                ),
                1,
            ).otherwise(0)
        ).alias("converted")
    )
    arm = assign.groupBy("variant").agg(
        F.count(F.lit(1)).alias("n"), F.sum("converted").alias("conv")
    )
    wide = arm.agg(
        F.max(F.when(F.col("variant") == 0, F.col("n"))).alias("n0"),
        F.max(F.when(F.col("variant") == 0, F.col("conv"))).alias("c0"),
        F.max(F.when(F.col("variant") == 1, F.col("n"))).alias("n1"),
        F.max(F.when(F.col("variant") == 1, F.col("conv"))).alias("c1"),
    )
    p0 = F.col("c0").cast("double") / F.col("n0").cast("double")
    p1 = F.col("c1").cast("double") / F.col("n1").cast("double")
    pp = (F.col("c0") + F.col("c1")).cast("double") / (
        F.col("n0") + F.col("n1")
    ).cast("double")
    return wide.select(
        "n0",
        "c0",
        "n1",
        "c1",
        F.round(p0, 4).alias("p0"),
        F.round(p1, 4).alias("p1"),
        F.round(
            (p0 - p1)
            / F.sqrt(
                pp
                * (F.lit(1.0) - pp)
                * (
                    F.lit(1.0) / F.col("n0").cast("double")
                    + F.lit(1.0) / F.col("n1").cast("double")
                )
            ),
            4,
        ).alias("z"),
    )


# ---------------------------------------------------------------------------
# Top user journeys
# ---------------------------------------------------------------------------


@register(
    "session_path_topk",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type, ts, event_id,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS rn
      FROM events),
    path AS (
      SELECT user_id,
             string_agg(event_type, '>' ORDER BY rn) AS journey
      FROM seq WHERE rn <= 3 GROUP BY user_id)
    SELECT journey, COUNT(*) AS n_users
    FROM path GROUP BY journey
    ORDER BY n_users DESC, journey LIMIT 15
    """,
)
def session_path_topk(spark, sf_dir):
    """Top user journeys — the first-3-events path distribution
    behind product-analytics flow views: rank each user's events,
    keep the opening triple, concatenate in order, count identical
    journeys. One keyed window + one |paths|-bounded aggregate; the
    ordered concat is deterministic because the rank is
    (ts, event_id)-total-ordered on both engines.
    """
    e = load(spark, sf_dir, "events")["events"]
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "user_id", "event_type", F.row_number().over(w).alias("rn")
    ).filter(F.col("rn") <= 3)
    path = seq.groupBy("user_id").agg(
        F.array_join(
            F.array_sort(
                F.collect_list(F.struct("rn", "event_type"))
            ).getField("event_type"),
            ">",
        ).alias("journey")
    )
    return (
        path.groupBy("journey")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy(F.desc("n_users"), "journey")
        .limit(15)
    )
