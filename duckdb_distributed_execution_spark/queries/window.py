"""Window function surface — SURVEY §2.B WINDOW / STREAMING_WINDOW
(query_plan_analyzer.cpp:134-135; the reference delegates these to
single-node DuckDB). Spark distributes: one shuffle on the partition
key, sorted within partitions.

All window orderings use a unique tie-break key so results are
deterministic; running sums go through exact decimal arithmetic."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from duckdb_distributed_execution_spark.functions import EXACT_DECIMAL
from duckdb_distributed_execution_spark.queries import load, register


@register(
    "window_rownum_latest",
    headline=True,
    oracle="""
    SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice
    FROM (
      SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
      FROM orders
    ) WHERE rn = 1
    """,
)
def window_rownum_latest(spark, sf_dir):
    """Latest order per customer — the distributed 'argmax per group'.

    r10: computed as ``max(struct(o_orderdate, o_orderkey, ...))``
    instead of ROW_NUMBER + ``rn = 1`` (guide §2.3: aggregate before
    you shuffle). The struct's lexicographic max picks the same row
    the (o_orderdate DESC, o_orderkey DESC) window head did —
    o_orderkey is unique, so the comparison never reaches the payload
    field — but the plan is a hash aggregate with map-side partials
    (≤1 row per customer per map task crosses the exchange, no sort
    on either side) where the window form sorts every partition twice
    around the exchange even with Spark's WindowGroupLimit top-1
    pushdown. Measured same-session warm: sf1 1.334 → 0.767 s, sf0.1
    0.321 → 0.233 s; rows exceptAll-identical at both scales (pinned
    in tests/test_plans.py) and the oracle still computes the
    ROW_NUMBER form. At 100 TB this shape only improves: partial
    argmax is the textbook combiner-friendly aggregation."""
    o = load(spark, sf_dir, "orders")["orders"]
    m = o.groupBy("o_custkey").agg(
        F.max(
            F.struct("o_orderdate", "o_orderkey", "o_totalprice")
        ).alias("m")
    )
    return m.select(
        "o_custkey",
        F.col("m.o_orderkey").alias("o_orderkey"),
        F.col("m.o_orderdate").alias("o_orderdate"),
        F.col("m.o_totalprice").alias("o_totalprice"),
    )


@register(
    "window_rank_dense",
    oracle="""
    SELECT o_orderkey, o_orderstatus, o_totalprice,
           RANK()       OVER (PARTITION BY o_orderstatus ORDER BY o_totalprice DESC) AS rnk,
           DENSE_RANK() OVER (PARTITION BY o_orderstatus ORDER BY o_totalprice DESC) AS drnk
    FROM orders
    WHERE o_totalprice > 400000
    """,
)
def window_rank_dense(spark, sf_dir):
    o = load(spark, sf_dir, "orders")["orders"]
    w = Window.partitionBy("o_orderstatus").orderBy(F.col("o_totalprice").desc())
    return (
        o.filter(F.col("o_totalprice") > 400000)
        .select(
            "o_orderkey",
            "o_orderstatus",
            "o_totalprice",
            F.rank().over(w).cast("long").alias("rnk"),
            F.dense_rank().over(w).cast("long").alias("drnk"),
        )
    )


@register(
    "window_running_sum",
    oracle="""
    SELECT user_id, event_id, ts,
           CAST(SUM(CAST(value AS DECIMAL(28,6)))
                OVER (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS DOUBLE) AS running_value
    FROM events
    WHERE event_type = 'purchase'
    """,
)
def window_running_sum(spark, sf_dir):
    ev = load(spark, sf_dir, "events")["events"]
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        ev.filter(F.col("event_type") == "purchase")
        .select(
            "user_id",
            "event_id",
            "ts",
            F.sum(F.col("value").cast(EXACT_DECIMAL)).over(w).cast("double")
            .alias("running_value"),
        )
    )


@register(
    "window_lag_lead",
    oracle="""
    SELECT user_id, event_id, ts,
           value - LAG(value)  OVER (PARTITION BY user_id ORDER BY ts, event_id) AS delta_prev,
           LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_type
    FROM events
    """,
)
def window_lag_lead(spark, sf_dir):
    ev = load(spark, sf_dir, "events")["events"]
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "user_id",
        "event_id",
        "ts",
        (F.col("value") - F.lag("value").over(w)).alias("delta_prev"),
        F.lead("event_type").over(w).alias("next_type"),
    )


@register(
    "window_moving_avg",
    oracle="""
    SELECT user_id, event_id,
           CAST(SUM(CAST(value AS DECIMAL(28,6)))
                OVER (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE)
           / COUNT(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
           AS mov_avg
    FROM events
    WHERE event_type = 'view'
    """,
)
def window_moving_avg(spark, sf_dir):
    """ROWS BETWEEN frame — moving average over the trailing 3 events,
    exact-decimal sum / count so it hashes identically."""
    ev = load(spark, sf_dir, "events")["events"]
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-2, Window.currentRow)
    )
    return (
        ev.filter(F.col("event_type") == "view")
        .select(
            "user_id",
            "event_id",
            (
                F.sum(F.col("value").cast(EXACT_DECIMAL)).over(w).cast("double")
                / F.count("value").over(w)
            ).alias("mov_avg"),
        )
    )


@register(
    "events_tumbling_window",
    headline=True,
    oracle="""
    SELECT time_bucket(INTERVAL '5 minutes', ts) AS w_start,
           event_type,
           COUNT(*) AS cnt,
           (SUM(CAST(floor(value * 1000000.0 + 0.5) AS BIGINT))
            / 1000000.0) AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
)
def events_tumbling_window(spark, sf_dir):
    """Tumbling event-time window, batch form. Semantically identical
    to ``F.window(ts, '5 minutes')`` + the streaming plan in
    streaming/__init__.py::windowed_event_counts (which keeps
    F.window — watermarks need it), but expressed as the arithmetic
    epoch bucket with the house scaled-long exact sum: F.window's
    struct expansion + DECIMAL(28,6) accumulation measured 2.9×
    slower at sf10 (0.95 → 0.33 s same-session; DuckDB's
    ``time_bucket`` floors to the same epoch grid — its sub-week
    origin 2000-01-01 is a whole number of 5-minute ticks since the
    epoch, equality pinned in tests/test_window_parity.py)."""
    ev = load(spark, sf_dir, "events")["events"]
    us = F.unix_micros(F.col("ts"))
    w_start = F.timestamp_micros((us - (us % F.lit(300_000_000))).cast("long"))
    return (
        ev.groupBy(w_start.alias("w_start"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            (F.sum(F.floor(F.col("value") * F.lit(1_000_000.0) + F.lit(0.5)))
             / F.lit(1_000_000.0)).alias("sum_value"),
        )
    )


@register(
    "window_percent_ntile",
    oracle="""
    SELECT o_orderkey,
           CAST(PERCENT_RANK() OVER (ORDER BY o_totalprice, o_orderkey) AS DOUBLE) AS pct,
           CAST(NTILE(4) OVER (ORDER BY o_totalprice, o_orderkey) AS BIGINT) AS quartile
    FROM orders
    WHERE o_orderpriority = '1-URGENT'
    """,
)
def window_percent_ntile(spark, sf_dir):
    """Global (unpartitioned) window — Spark plans a single-partition
    sort for the window, which is exactly why the frame is pre-filtered
    to a small slice; a global rank over 100 TB would be re-expressed
    as a range-partitioned sort + offset merge."""
    o = load(spark, sf_dir, "orders")["orders"]
    w = Window.orderBy("o_totalprice", "o_orderkey")
    return (
        o.filter(F.col("o_orderpriority") == "1-URGENT")
        .select(
            "o_orderkey",
            F.percent_rank().over(w).alias("pct"),
            F.ntile(4).over(w).cast("long").alias("quartile"),
        )
    )


@register(
    "time_bucket_15min",
    oracle="""
    SELECT CAST(time_bucket(INTERVAL '15 minutes', ts) AS TIMESTAMP)
             AS bucket_start,
           COUNT(*) AS n,
           COUNT(DISTINCT user_id) AS n_users
    FROM events
    WHERE event_type = 'click'
    GROUP BY 1
    """,
)
def time_bucket_15min(spark, sf_dir):
    """Arbitrary-width time bucketing: Spark's window() ≡ DuckDB
    time_bucket (both quarter-hour aligned for minute-granularity
    widths)."""
    ev = load(spark, sf_dir, "events")["events"]
    return (
        ev.filter(F.col("event_type") == "click")
        .groupBy(F.window("ts", "15 minutes")["start"].alias("bucket_start"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("user_id").alias("n_users"),
        )
    )


@register(
    "window_ignore_nulls",
    oracle="""
    SELECT event_id, user_id,
           last_value(CASE WHEN event_type = 'purchase' THEN value END
                      IGNORE NULLS)
             OVER (PARTITION BY user_id ORDER BY event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS last_purchase_value
    FROM events
    WHERE user_id % 29 = 0
    """,
)
def window_ignore_nulls(spark, sf_dir):
    """IGNORE NULLS window navigation: carry the most recent purchase
    value forward over every event of the user (the gap-fill /
    last-observation-carried-forward idiom)."""
    ev = load(spark, sf_dir, "events")["events"].filter(F.col("user_id") % 29 == 0)
    w = (
        Window.partitionBy("user_id")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    purchase_val = F.when(F.col("event_type") == "purchase", F.col("value"))
    return ev.select(
        "event_id",
        "user_id",
        F.last(purchase_val, ignorenulls=True).over(w).alias("last_purchase_value"),
    )


@register(
    "events_hopping_window",
    oracle="""
    WITH h AS (
      SELECT event_type,
             CAST(time_bucket(INTERVAL '15 minutes', ts)
                  - r.range * INTERVAL '15 minutes' AS TIMESTAMP) AS win_start
      FROM events CROSS JOIN range(2) r
      WHERE event_type IN ('click', 'purchase'))
    SELECT win_start, event_type, COUNT(*) AS n
    FROM h GROUP BY win_start, event_type
    """,
)
def events_hopping_window(spark, sf_dir):
    """Hopping (sliding) windows — 30-minute windows every 15 minutes,
    each event counted in two overlapping windows (the batch twin of
    writeStream window(ts, '30 minutes', '15 minutes'))."""
    ev = load(spark, sf_dir, "events")["events"]
    return (
        ev.filter(F.col("event_type").isin("click", "purchase"))
        .groupBy(
            F.window("ts", "30 minutes", "15 minutes")["start"].alias("win_start"),
            "event_type",
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
