"""Tenth-wave operators — interval coalescing, largest-remainder
proration, CDC change-log compaction.

Three warehouse staples that are all windows-over-keys (no global
stage anywhere): validity-interval consolidation, the exact-cents
allocation every billing system needs, and the replay-the-log
compaction that turns a change stream into current state.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from duckdb_distributed_execution_spark.queries import load, register

# ---------------------------------------------------------------------------
# Interval coalescing (merge overlapping validity windows)
# ---------------------------------------------------------------------------


@register(
    "interval_coalesce",
    oracle="""
    WITH iv AS (
      SELECT user_id,
             epoch_us(ts) AS s,
             epoch_us(ts) + (CAST(ROUND(value * 60, 0) AS BIGINT) + 60)
               * 1000000 AS e
      FROM events),
    marked AS (
      SELECT user_id, s, e,
             CASE WHEN s > COALESCE(
               max(e) OVER (PARTITION BY user_id ORDER BY s, e
                            ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND 1 PRECEDING), -1)
             THEN 1 ELSE 0 END AS new_island
      FROM iv),
    isl AS (
      SELECT user_id, s, e,
             SUM(new_island) OVER (PARTITION BY user_id ORDER BY s, e
                                   ROWS BETWEEN UNBOUNDED PRECEDING
                                            AND CURRENT ROW) AS island
      FROM marked)
    SELECT user_id, island,
           MIN(s) AS start_us, MAX(e) AS end_us, COUNT(*) AS n_merged
    FROM isl GROUP BY user_id, island
    """,
)
def interval_coalesce(spark, sf_dir):
    """Coalesce overlapping per-user activity intervals (each event
    opens a window of 60 + value-scaled seconds) into maximal
    disjoint spans — the validity-interval consolidation behind SCD
    compaction, on-call coverage, and uptime math. Single keyed
    window pass: an interval starts a new island iff its start
    exceeds the running max end of everything before it
    (gaps-and-islands with a running-max instead of adjacency, which
    is what makes it correct for CONTAINED intervals, not just
    chains). Integer microseconds end-to-end.
    """
    e = load(spark, sf_dir, "events")["events"]
    iv = e.select(
        "user_id",
        F.unix_micros("ts").alias("s"),
        (
            F.unix_micros("ts")
            + (F.round(F.col("value") * 60, 0).cast("bigint") + 60) * 1000000
        ).alias("e"),
    )
    prev = (
        Window.partitionBy("user_id")
        .orderBy("s", "e")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    run = (
        Window.partitionBy("user_id")
        .orderBy("s", "e")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    marked = iv.withColumn(
        "new_island",
        F.when(
            F.col("s") > F.coalesce(F.max("e").over(prev), F.lit(-1)), 1
        ).otherwise(0),
    )
    isl = marked.withColumn("island", F.sum("new_island").over(run))
    return isl.groupBy("user_id", "island").agg(
        F.min("s").alias("start_us"),
        F.max("e").alias("end_us"),
        F.count(F.lit(1)).alias("n_merged"),
    )


# ---------------------------------------------------------------------------
# Largest-remainder proration
# ---------------------------------------------------------------------------


@register(
    "prorate_largest_remainder",
    oracle="""
    WITH li AS (
      SELECT l_orderkey, l_linenumber,
             CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT) AS w
      FROM lineitem WHERE l_orderkey % 100 = 0),
    o AS (
      SELECT o_orderkey, CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS t
      FROM orders WHERE o_orderkey % 100 = 0),
    j AS (
      SELECT li.l_orderkey, li.l_linenumber, li.w, o.t,
             SUM(li.w) OVER (PARTITION BY li.l_orderkey) AS tw
      FROM li JOIN o ON o.o_orderkey = li.l_orderkey),
    base AS (
      SELECT *,
             (t * w) // tw AS fl,
             (t * w) % tw AS rem
      FROM j),
    ranked AS (
      SELECT *,
             row_number() OVER (PARTITION BY l_orderkey
                                ORDER BY rem DESC, l_linenumber) AS rk,
             t - SUM(fl) OVER (PARTITION BY l_orderkey) AS short
      FROM base)
    SELECT l_orderkey, l_linenumber,
           fl + CASE WHEN rk <= short THEN 1 ELSE 0 END AS allocated_cents
    FROM ranked
    """,
)
def prorate_largest_remainder(spark, sf_dir):
    """Exact-cents proration: split each order's total across its
    line items proportionally to line value so the allocations SUM
    EXACTLY to the total — the largest-remainder (Hamilton) method
    every billing/revenue-recognition system needs, in pure integer
    arithmetic: floor shares via (total*w) div W, the leftover cents
    going to the largest (total*w) mod W remainders (line-number
    tiebreak). Keyed windows per order; no floats anywhere, so the
    cross-engine contract is bit-exact. Orders subsampled (%% 100)
    only to keep the checked output small.
    """
    loaded = load(spark, sf_dir, "lineitem", "orders")
    li = loaded["lineitem"].filter(F.col("l_orderkey") % 100 == 0).select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.col("l_extendedprice") * 100, 0).cast("bigint").alias("w"),
    )
    o = loaded["orders"].filter(F.col("o_orderkey") % 100 == 0).select(
        F.col("o_orderkey").alias("l_orderkey"),
        F.round(F.col("o_totalprice") * 100, 0).cast("bigint").alias("t"),
    )
    wo = Window.partitionBy("l_orderkey")
    j = li.join(o, "l_orderkey").withColumn("tw", F.sum("w").over(wo))
    base = j.withColumn(
        "fl", F.floor((F.col("t") * F.col("w")) / F.col("tw"))
    ).withColumn("rem", (F.col("t") * F.col("w")) % F.col("tw"))
    ranked = base.withColumn(
        "rk",
        F.row_number().over(
            Window.partitionBy("l_orderkey").orderBy(
                F.desc("rem"), "l_linenumber"
            )
        ),
    ).withColumn("short", F.col("t") - F.sum("fl").over(wo))
    return ranked.select(
        "l_orderkey",
        "l_linenumber",
        (
            F.col("fl")
            + F.when(F.col("rk") <= F.col("short"), 1).otherwise(0)
        ).alias("allocated_cents"),
    )


# ---------------------------------------------------------------------------
# CDC change-log compaction
# ---------------------------------------------------------------------------


@register(
    "cdc_compact_log",
    oracle="""
    WITH log AS (
      SELECT user_id,
             CASE event_type WHEN 'signup' THEN 'I'
                             WHEN 'error' THEN 'D'
                             ELSE 'U' END AS op,
             CAST(ROUND(value * 1000000, 0) AS BIGINT) AS vm,
             ts, event_id
      FROM events),
    ranked AS (
      SELECT *,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rk,
             COUNT(*) OVER (PARTITION BY user_id) AS n_ops
      FROM log)
    SELECT user_id, op AS last_op, vm AS last_value_micros, n_ops
    FROM ranked WHERE rk = 1 AND op <> 'D'
    """,
)
def cdc_compact_log(spark, sf_dir):
    """Change-data-capture compaction — replay an (insert / update /
    delete) log into current state: latest op per key wins, keys
    whose latest op is a delete disappear (tombstone). This is the
    read-side half of every CDC pipeline (the write-side ingest twin
    is the duckdb_remote CDC stream source + Engine.merge_upsert);
    one keyed window, shuffle bounded by the key space. The op
    mapping derives deterministically from event_type so both
    engines replay the identical log.
    """
    e = load(spark, sf_dir, "events")["events"]
    log = e.select(
        "user_id",
        F.when(F.col("event_type") == "signup", "I")
        .when(F.col("event_type") == "error", "D")
        .otherwise("U")
        .alias("op"),
        F.round(F.col("value") * 1000000, 0).cast("bigint").alias("vm"),
        "ts",
        "event_id",
    )
    w = Window.partitionBy("user_id").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    ranked = log.withColumn("rk", F.row_number().over(w)).withColumn(
        "n_ops", F.count(F.lit(1)).over(Window.partitionBy("user_id"))
    )
    return ranked.filter((F.col("rk") == 1) & (F.col("op") != "D")).select(
        "user_id",
        F.col("op").alias("last_op"),
        F.col("vm").alias("last_value_micros"),
        "n_ops",
    )


# ---------------------------------------------------------------------------
# Jaro-Winkler fuzzy-name pairs
# ---------------------------------------------------------------------------


@register(
    "string_jaro_winkler_pairs",
    oracle="""
    WITH c AS (
      SELECT c_custkey, c_name, c_custkey % 40 AS blk
      FROM customer WHERE c_custkey < 400)
    SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
           ROUND(jaro_winkler_similarity(a.c_name, b.c_name), 4) AS jw
    FROM c a JOIN c b ON a.blk = b.blk AND a.c_custkey < b.c_custkey
    WHERE jaro_winkler_similarity(a.c_name, b.c_name) >= 0.9
    """,
)
def string_jaro_winkler_pairs(spark, sf_dir):
    """Fuzzy-name matching with Jaro-Winkler — the record-linkage
    scorer (census/MDM lineage) DuckDB ships natively and Spark
    lacks: re-implemented as an Arrow-batched Pandas UDF
    (operators/strsim.py) over hash-blocked candidate pairs, checked
    against DuckDB's native jaro_winkler_similarity — the UDF's
    matching-window/transposition/prefix-boost arithmetic must agree
    with the C++ implementation pair-for-pair, which is the strongest
    parity check a reimplementation can get. Blocking bounds the
    candidate join exactly like every dedup pair generator; scoring
    is embarrassingly parallel.
    """
    c = (
        load(spark, sf_dir, "customer")["customer"]
        .filter(F.col("c_custkey") < 400)
        .select(
            "c_custkey", "c_name", (F.col("c_custkey") % 40).alias("blk")
        )
    )
    from duckdb_distributed_execution_spark.operators.strsim import (
        jaro_winkler_pairs,
    )

    out = jaro_winkler_pairs(c, "c_custkey", "c_name", "blk", threshold=0.9)
    return out.select("id_a", "id_b", F.round("jw", 4).alias("jw"))


# ---------------------------------------------------------------------------
# Streaming LEFT OUTER stream-stream join (watermark null emission)
# ---------------------------------------------------------------------------

import os  # noqa: E402


@register(
    "streaming_join_left_outer",
    oracle="""
    WITH mx AS (
      SELECT LEAST(
        (SELECT MAX(ts) FROM events WHERE event_type = 'click'),
        (SELECT MAX(ts) FROM events WHERE event_type = 'purchase')) AS m)
    SELECT p.event_id AS purchase_id,
           c.event_id AS click_id,
           p.user_id AS p_user
    FROM events p
    CROSS JOIN mx
    LEFT JOIN events c
      ON c.user_id = p.user_id
     AND c.event_type = 'click'
     AND c.ts <= p.ts
     AND c.ts >= p.ts - INTERVAL '30 minutes'
    WHERE p.event_type = 'purchase'
      AND p.ts <= mx.m - INTERVAL '35 minutes'
    """,
)
def streaming_join_left_outer(spark, sf_dir):
    """LEFT OUTER stream-stream join — the semantics inner joins
    can't give: purchases with NO qualifying click must still emit
    (with NULL click columns), which in streaming only happens once
    the watermark proves no match can arrive. Run as a real
    availableNow stream with a 1-minute watermark. Spark's GLOBAL
    watermark is the MIN over both inputs' (max event time − delay),
    so null emission on drain is guaranteed only for purchases older
    than join-window + delay relative to the EARLIER of the two
    streams' maxima — both engines therefore restrict to purchases
    ≥35 minutes before min(max click ts, max purchase ts), making
    the batch LEFT JOIN oracle exact rather than approximately
    right. State stays bounded by the same watermark in production.
    """
    from duckdb_distributed_execution_spark.streaming import (
        read_events_stream,
        run_to_memory,
    )

    loaded = load(spark, sf_dir, "events")
    ev = loaded["events"]
    stream = read_events_stream(spark, os.path.join(sf_dir, "events.parquet"))
    c = (
        stream.filter(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("c_ts"),
            F.col("event_id").alias("click_id"),
        )
        .withWatermark("c_ts", "1 minute")
    )
    p = (
        stream.filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("p_ts"),
            F.col("event_id").alias("purchase_id"),
        )
        .withWatermark("p_ts", "1 minute")
    )
    j = p.join(
        c,
        F.expr(
            "p_user = c_user AND c_ts <= p_ts "
            "AND c_ts >= p_ts - INTERVAL 30 MINUTES"
        ),
        "leftOuter",
    ).select("purchase_id", "click_id", "p_user", "p_ts")
    run_to_memory(j, "streaming_join_left_outer_sink", mode="append")
    cutoff = ev.agg(
        (
            F.least(
                F.max(
                    F.when(
                        F.col("event_type") == "click", F.unix_micros("ts")
                    )
                ),
                F.max(
                    F.when(
                        F.col("event_type") == "purchase",
                        F.unix_micros("ts"),
                    )
                ),
            )
            - F.lit(35 * 60 * 1000000)
        ).alias("cut")
    )
    return (
        spark.table("streaming_join_left_outer_sink")
        .crossJoin(F.broadcast(cutoff))
        .filter(F.unix_micros("p_ts") <= F.col("cut"))
        .select("purchase_id", "click_id", "p_user")
    )
