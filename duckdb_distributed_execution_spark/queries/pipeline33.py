"""Thirty-third-wave operators — product quality and lifecycle
snapshots: return-rate ranking by part brand (with the corpus
baseline each brand is compared against), and the customer lifecycle
stage snapshot (active / cooling / at-risk / dormant by recency
buckets — the CRM segmentation every re-engagement campaign keys
on).

North-star greenfield. Conventions: rates are exact integer counts
with one final division; the brand ranking orders by an exact
rational evaluated identically on both engines; recency buckets are
integer day comparisons against the corpus max date.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from duckdb_distributed_execution_spark.queries import load, register

# ---------------------------------------------------------------------------
# Return-rate by brand
# ---------------------------------------------------------------------------

_RR_TOPK = 15
_RR_MIN_ITEMS = 50


@register(
    "return_rate_by_brand",
    oracle=f"""
    WITH j AS (
      SELECT p.p_brand,
             CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END AS ret
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey),
    b AS (
      SELECT p_brand, COUNT(*) AS n, SUM(ret) AS r
      FROM j GROUP BY p_brand HAVING COUNT(*) >= {_RR_MIN_ITEMS}),
    tot AS (
      SELECT SUM(n) AS tn, SUM(r) AS tr FROM b)
    SELECT CAST(rn AS INTEGER) AS rank, p_brand,
           CAST(n AS BIGINT) AS n_items,
           CAST(r AS BIGINT) AS n_returned,
           ROUND(CAST(r AS DOUBLE) / CAST(n AS DOUBLE), 6) AS return_rate,
           ROUND(CAST(tr AS DOUBLE) / CAST(tn AS DOUBLE), 6) AS baseline_rate
    FROM (SELECT b.*, t.tn, t.tr,
                 row_number() OVER (
                   ORDER BY CAST(r AS DOUBLE) / CAST(n AS DOUBLE) DESC,
                            p_brand) AS rn
          FROM b CROSS JOIN tot t)
    WHERE rn <= {_RR_TOPK}
    """,
)
def return_rate_by_brand(spark, sf_dir):
    """Product quality screen: the top-{15} part brands by return
    rate (l_returnflag = 'R'), each next to the corpus baseline rate
    — the gap, not the absolute, is the recall-campaign signal.
    Brands under {50} items are excluded (their rates are noise; the
    Wilson-interval machinery of bounce_rate_wilson_ci is the
    finer-grained alternative). One fact join (part side broadcasts),
    one grouped aggregate; the baseline rides a full-frame window
    over the |brands| aggregate on the Spark side; ranking orders by
    the exact rational r/n with a brand tie-break."""
    t = load(spark, sf_dir, "lineitem", "part")
    li, p = t["lineitem"], t["part"]
    j = li.join(
        F.broadcast(p.select("p_partkey", "p_brand")),
        F.col("p_partkey") == F.col("l_partkey"),
    ).select(
        "p_brand",
        F.when(F.col("l_returnflag") == "R", 1).otherwise(0).alias("ret"),
    )
    b = (
        j.groupBy("p_brand")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("ret").alias("r"))
        .filter(F.col("n") >= _RR_MIN_ITEMS)
    )
    wf = Window.orderBy("p_brand").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    withtot = b.select(
        "p_brand",
        "n",
        "r",
        F.sum("n").over(wf).alias("tn"),
        F.sum("r").over(wf).alias("tr"),
    )
    rate = F.col("r").cast("double") / F.col("n").cast("double")
    w = Window.orderBy(rate.desc(), "p_brand")
    return (
        withtot.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= _RR_TOPK)
        .select(
            "rank",
            "p_brand",
            F.col("n").cast("long").alias("n_items"),
            F.col("r").cast("long").alias("n_returned"),
            F.round(rate, 6).alias("return_rate"),
            F.round(
                F.col("tr").cast("double") / F.col("tn").cast("double"), 6
            ).alias("baseline_rate"),
        )
    )


# ---------------------------------------------------------------------------
# Customer lifecycle stage snapshot
# ---------------------------------------------------------------------------

# (stage, max recency in days, exclusive upper bound except the last)
_STAGES = (("active", 7), ("cooling", 14), ("at_risk", 21), ("dormant", None))


@register(
    "lifecycle_stage_snapshot",
    oracle="""
    WITH mx AS (SELECT MAX(CAST(ts AS DATE)) AS asof FROM events),
    rec AS (
      SELECT e.user_id, e.event_type,
             date_diff('day', MAX(CAST(e.ts AS DATE)), mx.asof) AS rdays
      FROM events e CROSS JOIN mx
      GROUP BY e.user_id, e.event_type, mx.asof),
    st AS (
      SELECT event_type,
             CASE WHEN rdays < 2 THEN 'active'
                  WHEN rdays < 5 THEN 'cooling'
                  WHEN rdays < 10 THEN 'at_risk'
                  ELSE 'dormant' END AS stage
      FROM rec),
    tot AS (
      SELECT event_type, COUNT(*) AS n FROM st GROUP BY event_type)
    SELECT st.event_type, stage, COUNT(*) AS n_users,
           ROUND(CAST(COUNT(*) AS DOUBLE) / CAST(MAX(t.n) AS DOUBLE), 6)
             AS share
    FROM st JOIN tot t ON t.event_type = st.event_type
    GROUP BY st.event_type, stage
    """,
)
def lifecycle_stage_snapshot(spark, sf_dir):
    """Engagement-recency snapshot PER SURFACE as of the corpus max
    date: for each event type, users bucketed by days since they last
    emitted it — active (<2 d), cooling (<5 d), at-risk (<10 d),
    dormant — with per-surface stage shares. A user can be active on
    views and dormant on purchases simultaneously; that asymmetry
    (not a single whole-account recency, which this dense corpus
    saturates at 0–2 days) is what a re-engagement campaign targets.
    Last-seen is one grouped MAX per (user, type); the as-of date
    rides a full-frame window over that aggregate; stages are integer
    day comparisons; share denominators attach via a broadcast of the
    |types| totals."""
    e = load(spark, sf_dir, "events")["events"]
    # The as-of date is the max over the per-(user, type) last-seen
    # aggregate (same value as the corpus max) and rides a full-frame
    # window — no 1-row scalar cross join.
    wf0 = Window.orderBy("user_id", "event_type").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    rec = (
        e.groupBy("user_id", "event_type")
        .agg(F.max(F.col("ts").cast("date")).alias("last_seen"))
        .select(
            "event_type",
            F.datediff(
                F.max("last_seen").over(wf0), F.col("last_seen")
            ).alias("rdays"),
        )
    )
    st = rec.select(
        "event_type",
        F.when(F.col("rdays") < 2, F.lit("active"))
        .when(F.col("rdays") < 5, F.lit("cooling"))
        .when(F.col("rdays") < 10, F.lit("at_risk"))
        .otherwise(F.lit("dormant"))
        .alias("stage"),
    )
    tot = st.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    counted = st.groupBy("event_type", "stage").agg(
        F.count(F.lit(1)).alias("n_users")
    )
    return counted.join(F.broadcast(tot), on="event_type").select(
        "event_type",
        "stage",
        "n_users",
        F.round(
            F.col("n_users").cast("double") / F.col("n").cast("double"), 6
        ).alias("share"),
    )
