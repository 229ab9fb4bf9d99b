"""Thirty-fourth-wave operators — session depth and experiment
trust: exact discrete duration quantiles of user sessions (how long
is a session really? means lie under heavy tails), and the
sample-ratio-mismatch check every A/B readout must pass BEFORE its
p-value means anything.

North-star greenfield. Conventions: session islands identical to the
sessionize family; durations in integer microseconds; quantiles are
rank picks; the SRM chi-square statistic is an exact rational
(o1−o2)²/n with one final division.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from duckdb_distributed_execution_spark.operators.rowid import (
    assign_stable_row_ids,
)
from duckdb_distributed_execution_spark.queries import load, register

_GAP_US = 1800 * 1_000_000

# ---------------------------------------------------------------------------
# Session duration quantiles
# ---------------------------------------------------------------------------


@register(
    "session_duration_quantiles",
    oracle=f"""
    WITH o AS (
      SELECT user_id, epoch_us(ts) AS us, event_id,
             CASE WHEN epoch_us(ts)
                       - lag(epoch_us(ts)) OVER (PARTITION BY user_id
                                                 ORDER BY ts, event_id)
                       > {_GAP_US}
                  OR lag(epoch_us(ts)) OVER (PARTITION BY user_id
                                             ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS is_start
      FROM events),
    s AS (
      SELECT user_id, us, event_id,
             SUM(is_start) OVER (PARTITION BY user_id
                                 ORDER BY us, event_id
                                 ROWS UNBOUNDED PRECEDING) AS sid
      FROM o),
    per AS (
      SELECT user_id, sid,
             COUNT(*) AS n_events,
             MAX(us) - MIN(us) AS dur_us
      FROM s GROUP BY user_id, sid),
    multi AS (SELECT * FROM per WHERE n_events >= 2),
    r AS (
      SELECT dur_us,
             row_number() OVER (ORDER BY dur_us, user_id, sid) AS rn,
             COUNT(*) OVER () AS n
      FROM multi)
    SELECT CAST(MAX(n) AS BIGINT) AS n_multi_event_sessions,
           (SELECT COUNT(*) FROM per WHERE n_events = 1)
             AS n_single_event_sessions,
           ROUND(MAX(CASE WHEN rn = (n + 1) // 2 THEN dur_us END)
                 / 1000000.0, 4) AS p50_seconds,
           ROUND(MAX(CASE WHEN rn = n - (n // 10) THEN dur_us END)
                 / 1000000.0, 4) AS p90_seconds,
           ROUND(MAX(CASE WHEN rn = n THEN dur_us END) / 1000000.0, 4)
             AS max_seconds
    FROM r
    """,
)
def session_duration_quantiles(spark, sf_dir):
    """Session DURATION distribution: exact discrete p50/p90/max of
    first-to-last-event span over multi-event sessions (single-event
    sessions have zero span by construction and are counted
    separately — folding them in would fake a short-session story).
    Sessions are the sessionize family's 30-minute islands; durations
    are exact integer microsecond spans; quantiles are rank picks
    with (duration, user, sid) tie-breaks over the |sessions|
    aggregate — the raw corpus shuffles once."""
    e = load(spark, sf_dir, "events")["events"]
    us = F.expr("unix_micros(ts)")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    o = e.select(
        "user_id", us.alias("us"), "event_id",
        F.when(
            (us - F.lag(us).over(w) > _GAP_US) | F.lag(us).over(w).isNull(), 1
        ).otherwise(0).alias("is_start"),
    )
    ws = Window.partitionBy("user_id").orderBy("us", "event_id").rowsBetween(
        Window.unboundedPreceding, 0
    )
    s = o.select(
        "user_id", "us", "event_id", F.sum("is_start").over(ws).alias("sid")
    )
    per = s.groupBy("user_id", "sid").agg(
        F.count(F.lit(1)).alias("n_events"),
        (F.max("us") - F.min("us")).alias("dur_us"),
    )
    multi = per.filter(F.col("n_events") >= 2)
    # |multi-event sessions| grows with the corpus, so the exact rank
    # pick routes through the range-bucketed stable-row-id operator
    # (operators/rowid.py) instead of an unpartitioned global window —
    # no stage ever sees more than one range bucket's sessions. The
    # total count attaches as a broadcast 1-row scalar.
    rid = assign_stable_row_ids(
        multi, ["dur_us", "user_id", "sid"], id_col="__rid"
    )
    n1 = multi.agg(F.count(F.lit(1)).alias("n"))
    r = rid.crossJoin(F.broadcast(n1)).select(
        "dur_us", (F.col("__rid") + 1).alias("rn"), "n"
    )
    # Single-event count joins in via tagged union (no scalar cross
    # join): one row carrying only the singles count.
    singles = per.filter(F.col("n_events") == 1).agg(
        F.count(F.lit(1)).alias("n_single")
    )
    q = r.agg(
        F.max("n").cast("long").alias("n_multi_event_sessions"),
        F.round(
            F.max(F.when(F.col("rn") == F.expr("(n + 1) div 2"), F.col("dur_us")))
            / 1000000.0,
            4,
        ).alias("p50_seconds"),
        F.round(
            F.max(
                F.when(F.col("rn") == F.col("n") - F.expr("n div 10"), F.col("dur_us"))
            )
            / 1000000.0,
            4,
        ).alias("p90_seconds"),
        F.round(
            F.max(F.when(F.col("rn") == F.col("n"), F.col("dur_us"))) / 1000000.0,
            4,
        ).alias("max_seconds"),
    )
    u = q.select(
        "n_multi_event_sessions",
        F.lit(None).cast("long").alias("n_single_event_sessions"),
        "p50_seconds", "p90_seconds", "max_seconds",
    ).unionByName(
        singles.select(
            F.lit(None).cast("long").alias("n_multi_event_sessions"),
            F.col("n_single").cast("long").alias("n_single_event_sessions"),
            F.lit(None).cast("double").alias("p50_seconds"),
            F.lit(None).cast("double").alias("p90_seconds"),
            F.lit(None).cast("double").alias("max_seconds"),
        )
    )
    return u.agg(
        F.max("n_multi_event_sessions").alias("n_multi_event_sessions"),
        F.max("n_single_event_sessions").alias("n_single_event_sessions"),
        F.max("p50_seconds").alias("p50_seconds"),
        F.max("p90_seconds").alias("p90_seconds"),
        F.max("max_seconds").alias("max_seconds"),
    ).select(
        "n_multi_event_sessions",
        "n_single_event_sessions",
        "p50_seconds",
        "p90_seconds",
        "max_seconds",
    )


# ---------------------------------------------------------------------------
# A/B sample-ratio-mismatch (SRM) check
# ---------------------------------------------------------------------------

_SRM_CHI2_95 = 3.841458820694124  # chi-square(1) 95% quantile, shared literal


@register(
    "abtest_srm_check",
    oracle=f"""
    WITH assign AS (
      SELECT DISTINCT user_id,
             CAST('0x' || substr(md5('exp1:' || CAST(user_id AS VARCHAR)),
                                 1, 7) AS BIGINT) % 2 AS variant
      FROM events),
    c AS (
      SELECT SUM(CASE WHEN variant = 0 THEN 1 ELSE 0 END) AS o0,
             SUM(CASE WHEN variant = 1 THEN 1 ELSE 0 END) AS o1,
             COUNT(*) AS n
      FROM assign)
    SELECT CAST(o0 AS BIGINT) AS control_users,
           CAST(o1 AS BIGINT) AS treatment_users,
           ROUND(CAST((o0 - o1) * (o0 - o1) AS DOUBLE) / CAST(n AS DOUBLE), 6)
             AS chi2,
           CAST((o0 - o1) * (o0 - o1) AS DOUBLE) / CAST(n AS DOUBLE)
             < {_SRM_CHI2_95} AS srm_pass
    FROM c
    """,
)
def abtest_srm_check(spark, sf_dir):
    """Sample-ratio-mismatch check — the trust gate an experiment
    readout must pass BEFORE its p-value means anything (a 50/50
    split that lands 48/52 with enough n means the assignment or
    logging pipeline is broken, and every downstream metric is
    biased). Assignment is the same deterministic md5 hashing as
    abtest_proportion_ztest; the chi-square statistic against the
    50/50 expectation reduces EXACTLY to (o0−o1)²/n — an exact
    rational with one division — and the pass verdict compares it to
    the chi-square(1) 95% quantile as a shared literal. One distinct
    + one 1-row aggregate."""
    e = load(spark, sf_dir, "events")["events"]
    assign = e.select("user_id").distinct().select(
        (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit("exp1:"), F.col("user_id").cast("string"))),
                    1,
                    7,
                ),
                16,
                10,
            ).cast("long")
            % 2
        ).alias("variant")
    )
    c = assign.agg(
        F.sum(F.when(F.col("variant") == 0, 1).otherwise(0)).alias("o0"),
        F.sum(F.when(F.col("variant") == 1, 1).otherwise(0)).alias("o1"),
        F.count(F.lit(1)).alias("n"),
    )
    chi2 = (
        ((F.col("o0") - F.col("o1")) * (F.col("o0") - F.col("o1"))).cast(
            "double"
        )
        / F.col("n").cast("double")
    )
    return c.select(
        F.col("o0").cast("long").alias("control_users"),
        F.col("o1").cast("long").alias("treatment_users"),
        F.round(chi2, 6).alias("chi2"),
        (chi2 < _SRM_CHI2_95).alias("srm_pass"),
    )
