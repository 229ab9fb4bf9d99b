"""Twenty-third-wave operators — behavioral entropy, fulfillment SLA,
and time-bucketed value bands: per-user event-type entropy (the
spread-vs-scripted behavior read), shipping-latency SLA breach rates
per order priority (with the negative-latency data-quality rate the
synthetic dates actually contain), and weekly exact discrete p50/p90
bands of purchase value.

North-star greenfield. Conventions: entropy terms are per-row doubles
with identical trees exact-decimal-summed (5-term float sums are NOT
order-safe — unlike the 2-term lexical scores); latencies and counts
are exact integers; percentile picks are rank selects, never float
interpolation.
"""

from __future__ import annotations

import math

from pyspark.sql import Window
from pyspark.sql import functions as F

from duckdb_distributed_execution_spark.functions import (
    exact_sum,
    oracle_exact_sum,
)
from duckdb_distributed_execution_spark.queries import load, register

# ---------------------------------------------------------------------------
# Per-user behavioral entropy
# ---------------------------------------------------------------------------


@register(
    "user_event_entropy",
    oracle=f"""
    WITH c AS (
      SELECT user_id, event_type, COUNT(*) AS c FROM events
      GROUP BY user_id, event_type),
    w AS (
      SELECT user_id, c,
             SUM(c) OVER (PARTITION BY user_id) AS tot
      FROM c),
    t AS (
      SELECT user_id,
             COUNT(*) AS n_types,
             SUM(c) AS total,
             {oracle_exact_sum(
                 "-(CAST(c AS DOUBLE) / CAST(tot AS DOUBLE))"
                 " * ln(CAST(c AS DOUBLE) / CAST(tot AS DOUBLE))")}
               AS h
      FROM w GROUP BY user_id)
    SELECT user_id,
           CAST(n_types AS INTEGER) AS n_types,
           CAST(total AS BIGINT) AS n_events,
           ROUND(h, 6) AS entropy,
           ROUND(h / {math.log(5.0)!r}, 6) AS entropy_norm
    FROM t
    """,
)
def user_event_entropy(spark, sf_dir):
    """Behavioral entropy per user: Shannon entropy of the user's
    event-type distribution — near ln(5) means the user exercises the
    whole surface; near 0 means a scripted single-action client (the
    cheap bot read next to interarrival_burstiness). Each −p·ln p
    term is one per-row double expression with an identical tree both
    engines; the ≤5-term per-user reduction goes through the
    exact-decimal sum convention because a 5-term FLOAT sum is
    order-dependent (the 2-term lexical scores elsewhere are safe by
    IEEE commutativity; 5 terms are not). Two map-side-combined
    aggregates on user keys — one shuffle at 100 TB."""
    e = load(spark, sf_dir, "events")["events"]
    c = e.groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("c"))
    tot = F.sum("c").over(Window.partitionBy("user_id"))
    p = F.col("c").cast("double") / tot.cast("double")
    term = -p * F.log(p)
    withterm = c.select("user_id", "c", term.alias("term"))
    t = withterm.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("int").alias("n_types"),
        F.sum("c").cast("long").alias("n_events"),
        exact_sum("term").alias("h"),
    )
    return t.select(
        "user_id",
        "n_types",
        "n_events",
        F.round("h", 6).alias("entropy"),
        F.round(F.col("h") / F.lit(math.log(5.0)), 6).alias("entropy_norm"),
    )


# ---------------------------------------------------------------------------
# Shipping SLA breach by order priority
# ---------------------------------------------------------------------------

_SLA_DAYS = 60


@register(
    "shipping_sla_breach",
    oracle=f"""
    WITH j AS (
      SELECT o.o_orderpriority,
             date_diff('day', CAST(o.o_orderdate AS DATE),
                       CAST(l.l_shipdate AS DATE)) AS lat
      FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey)
    SELECT o_orderpriority,
           COUNT(*) AS n_items,
           ROUND(CAST(SUM(lat) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 4)
             AS mean_latency_days,
           ROUND(CAST(SUM(CASE WHEN lat > {_SLA_DAYS} THEN 1 ELSE 0 END)
                      AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6)
             AS sla_breach_rate,
           ROUND(CAST(SUM(CASE WHEN lat < 0 THEN 1 ELSE 0 END) AS DOUBLE)
                 / CAST(COUNT(*) AS DOUBLE), 6) AS negative_latency_rate
    FROM j GROUP BY o_orderpriority
    """,
)
def shipping_sla_breach(spark, sf_dir):
    """Fulfillment SLA report per order priority: mean order-to-ship
    latency, the fraction beyond a {60}-day SLA, and the fraction
    with NEGATIVE latency (ship before order — a data-quality rate
    this synthetic corpus genuinely contains, and exactly the kind of
    violation `Engine.expect` would gate on in an ingest pipeline).
    Latency is an integer day difference; every reduction is an
    integer count/sum with single final divisions. The orders side
    broadcasts per Catalyst's own threshold; one fact-table pass."""
    t = load(spark, sf_dir, "lineitem", "orders")
    li, o = t["lineitem"], t["orders"]
    j = li.join(o, F.col("o_orderkey") == F.col("l_orderkey")).select(
        "o_orderpriority",
        F.datediff(
            F.col("l_shipdate").cast("date"), F.col("o_orderdate").cast("date")
        ).alias("lat"),
    )
    n = F.count(F.lit(1))
    return j.groupBy("o_orderpriority").agg(
        n.alias("n_items"),
        F.round(F.sum("lat").cast("double") / n.cast("double"), 4).alias(
            "mean_latency_days"
        ),
        F.round(
            F.sum(F.when(F.col("lat") > _SLA_DAYS, 1).otherwise(0)).cast(
                "double"
            )
            / n.cast("double"),
            6,
        ).alias("sla_breach_rate"),
        F.round(
            F.sum(F.when(F.col("lat") < 0, 1).otherwise(0)).cast("double")
            / n.cast("double"),
            6,
        ).alias("negative_latency_rate"),
    )


# ---------------------------------------------------------------------------
# Weekly purchase-value bands (exact discrete percentiles)
# ---------------------------------------------------------------------------


@register(
    "purchase_value_weekly_bands",
    oracle="""
    WITH p AS (
      SELECT date_trunc('week', CAST(ts AS DATE)) AS week,
             value, event_id
      FROM events WHERE event_type = 'purchase'),
    r AS (
      SELECT week, value,
             row_number() OVER (PARTITION BY week
                                ORDER BY value, event_id) AS rn,
             COUNT(*) OVER (PARTITION BY week) AS n
      FROM p)
    SELECT week,
           CAST(MAX(n) AS BIGINT) AS n_purchases,
           ROUND(MAX(CASE WHEN rn = (n + 1) // 2 THEN value END), 4) AS p50,
           ROUND(MAX(CASE WHEN rn = n - (n // 10) THEN value END), 4) AS p90
    FROM r GROUP BY week
    """,
)
def purchase_value_weekly_bands(spark, sf_dir):
    """Weekly p50/p90 bands of purchase value — the monitoring series
    a revenue dashboard draws. Percentiles are EXACT DISCRETE picks
    (the value at rank (n+1)//2 and rank n−n//10, ties broken by
    event_id), so no float interpolation ever crosses engines; the
    pick itself is a conditional MAX over the ranked relation — one
    keyed window + one grouped aggregate, both on the week key. At
    100 TB the rank window partitions by week (thousands of
    partitions, each independently sized); extreme single-week
    volume routes through the bucket-refined exact percentiles
    (operators/quantiles.py) instead."""
    e = load(spark, sf_dir, "events")["events"]
    p = e.filter(F.col("event_type") == "purchase").select(
        F.date_trunc("week", F.col("ts").cast("date")).cast("date").alias(
            "week"
        ),
        "value",
        "event_id",
    )
    w = Window.partitionBy("week").orderBy("value", "event_id")
    wa = Window.partitionBy("week")
    r = p.select(
        "week",
        "value",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wa).alias("n"),
    )
    return r.groupBy("week").agg(
        F.max("n").cast("long").alias("n_purchases"),
        F.round(
            F.max(F.when(F.col("rn") == F.expr("(n + 1) div 2"), F.col("value"))),
            4,
        ).alias("p50"),
        F.round(
            F.max(
                F.when(F.col("rn") == F.col("n") - F.expr("n div 10"), F.col("value"))
            ),
            4,
        ).alias("p90"),
    )
