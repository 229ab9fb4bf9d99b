"""Thirty-eighth-wave operators — intra-document stutter and
position-weighted attribution: the maximum same-token RUN per
document (the decoder-loop/stutter screen that corpus-level 3-gram
mass misses), and U-shaped (40/20/40) multi-touch attribution — the
position-weighted model between the first/last-touch extremes.

North-star greenfield. Conventions: runs via gaps-and-islands over
token positions (exact integers); U-weights are exact rationals per
click with the middle mass split evenly; credits exact-decimal-
summed.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from duckdb_distributed_execution_spark.functions import (
    exact_sum,
    oracle_exact_sum,
)
from duckdb_distributed_execution_spark.operators.text import tokens
from duckdb_distributed_execution_spark.queries import load, register

# ---------------------------------------------------------------------------
# Max same-token run per document
# ---------------------------------------------------------------------------

_RUN_FLAG = 4  # flag docs with any run of >= 4 identical tokens


@register(
    "token_run_length_screen",
    oracle=f"""
    WITH p AS (
      SELECT doc_id,
             UNNEST(string_split(text, ' ')) AS tok,
             CAST(generate_subscripts(string_split(text, ' '), 1)
                  AS INTEGER) AS pos
      FROM documents),
    isl AS (
      SELECT doc_id, tok,
             pos - row_number() OVER (PARTITION BY doc_id, tok
                                      ORDER BY pos) AS grp
      FROM p),
    runs AS (
      SELECT doc_id, tok, COUNT(*) AS run_len
      FROM isl GROUP BY doc_id, tok, grp),
    mx AS (
      SELECT doc_id, MAX(run_len) AS max_run FROM runs GROUP BY doc_id)
    SELECT CAST(max_run AS BIGINT) AS max_run,
           COUNT(*) AS n_docs,
           max_run >= {_RUN_FLAG} AS flagged
    FROM mx GROUP BY max_run
    """,
)
def token_run_length_screen(spark, sf_dir):
    """Intra-document STUTTER screen: the longest run of one repeated
    token per document, histogrammed — the signature of a decoder
    loop or template filler ('buy buy buy buy') that corpus-level
    duplicated-3-gram mass (repetition_ngram_dup) dilutes away. Runs
    come from the gaps-and-islands identity on per-(doc, token)
    positions (pos − rank is constant exactly within a consecutive
    run) — one positional explode, two grouped aggregates, all
    integers; the flag threshold (≥ {4}) marks the histogram rows a
    cleaning pass would drop."""
    d = load(spark, sf_dir, "documents")["documents"]
    p = d.select(
        "doc_id", F.posexplode(tokens("text")).alias("pos0", "tok")
    ).select("doc_id", "tok", (F.col("pos0") + 1).alias("pos"))
    w = Window.partitionBy("doc_id", "tok").orderBy("pos")
    isl = p.select(
        "doc_id", "tok", (F.col("pos") - F.row_number().over(w)).alias("grp")
    )
    runs = isl.groupBy("doc_id", "tok", "grp").agg(
        F.count(F.lit(1)).alias("run_len")
    )
    mx = runs.groupBy("doc_id").agg(F.max("run_len").alias("max_run"))
    return mx.groupBy("max_run").agg(F.count(F.lit(1)).alias("n_docs")).select(
        F.col("max_run").cast("long").alias("max_run"),
        "n_docs",
        (F.col("max_run") >= _RUN_FLAG).alias("flagged"),
    )


# ---------------------------------------------------------------------------
# U-shaped multi-touch attribution
# ---------------------------------------------------------------------------

_U_WINDOW_US = 3 * 86_400 * 1_000_000  # same 3-day lookback as first/last


@register(
    "attribution_u_shaped",
    oracle=f"""
    WITH p AS (
      SELECT event_id AS pid, user_id, epoch_us(ts) AS pts, value
      FROM events WHERE event_type = 'purchase'),
    c AS (
      SELECT event_id AS cid, user_id, epoch_us(ts) AS cts,
             CAST(json_extract_string(props, '$.k') AS INTEGER) % 10
               AS campaign
      FROM events WHERE event_type = 'click'),
    m AS (
      SELECT p.pid, p.value, c.campaign, c.cts, c.cid
      FROM p JOIN c ON c.user_id = p.user_id
       AND c.cts <= p.pts AND c.cts >= p.pts - {_U_WINDOW_US}),
    ranked AS (
      SELECT *,
             row_number() OVER (PARTITION BY pid
                                ORDER BY cts ASC, cid ASC) AS rf,
             COUNT(*) OVER (PARTITION BY pid) AS k
      FROM m),
    weighted AS (
      SELECT campaign, value,
             CASE WHEN k = 1 THEN 1.0
                  WHEN k = 2 THEN 0.5
                  WHEN rf = 1 THEN 0.4
                  WHEN rf = k THEN 0.4
                  ELSE 0.2 / CAST(k - 2 AS DOUBLE) END AS w
      FROM ranked)
    SELECT campaign,
           {oracle_exact_sum("w")} AS credited_purchases,
           {oracle_exact_sum("w * value")} AS credited_revenue
    FROM weighted GROUP BY campaign
    """,
)
def attribution_u_shaped(spark, sf_dir):
    """U-shaped (position-based 40/20/40) multi-touch attribution:
    the first and last click of each purchase's 3-day path earn 40%
    credit each, the middle clicks split the remaining 20% evenly
    (k=1 takes all, k=2 splits 50/50) — the standard compromise
    between the first- and last-touch extremes this family already
    computes, and per-purchase weights sum to exactly 1 so total
    credit equals total purchases. Path positions come from one
    (ts, event_id)-tie-broken rank window; each weight is an exact
    rational evaluated identically; credit sums go through the
    exact-decimal convention so partitioning never moves a credit."""
    e = load(spark, sf_dir, "events")["events"]
    us = F.expr("unix_micros(ts)")
    p = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("pid"), "user_id", us.alias("pts"), "value"
    )
    c = e.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("cid"),
        "user_id",
        us.alias("cts"),
        (F.get_json_object("props", "$.k").cast("int") % 10).alias("campaign"),
    )
    m = p.join(c, on="user_id").filter(
        (F.col("cts") <= F.col("pts"))
        & (F.col("cts") >= F.col("pts") - _U_WINDOW_US)
    )
    wf = Window.partitionBy("pid").orderBy(F.asc("cts"), F.asc("cid"))
    wa = Window.partitionBy("pid")
    ranked = m.select(
        "pid",
        "value",
        "campaign",
        F.row_number().over(wf).alias("rf"),
        F.count(F.lit(1)).over(wa).alias("k"),
    )
    w = (
        F.when(F.col("k") == 1, F.lit(1.0))
        .when(F.col("k") == 2, F.lit(0.5))
        .when(F.col("rf") == 1, F.lit(0.4))
        .when(F.col("rf") == F.col("k"), F.lit(0.4))
        .otherwise(F.lit(0.2) / (F.col("k") - 2).cast("double"))
    )
    weighted = ranked.select("campaign", "value", w.alias("w"))
    return weighted.groupBy("campaign").agg(
        exact_sum("w").alias("credited_purchases"),
        exact_sum(F.col("w") * F.col("value")).alias("credited_revenue"),
    )
