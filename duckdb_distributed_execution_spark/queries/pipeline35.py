"""Thirty-fifth-wave operators — model eval depth and statistical
process control: the decile lift table for the corpus quality
classifier (the companion artifact to classifier_auc_eval's single
number), and a p-chart on daily error rates (Shewhart control
limits — the SPC discipline applied to telemetry).

North-star greenfield. Conventions: deciles are fully tie-broken
ntile picks over the scored aggregate; lift is an exact rational
with one division; control limits are fixed double expressions over
exact integer counts with shared literals.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from duckdb_distributed_execution_spark.queries import load, register

# ---------------------------------------------------------------------------
# Classifier decile lift
# ---------------------------------------------------------------------------


@register(
    "classifier_decile_lift",
    oracle="""
    WITH s AS (
      SELECT doc_id, n_chars AS score,
             CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos
      FROM documents),
    d AS (
      SELECT pos,
             ntile(10) OVER (ORDER BY score DESC, doc_id) AS decile
      FROM s),
    g AS (
      SELECT decile, COUNT(*) AS n, SUM(pos) AS np FROM d GROUP BY decile),
    t AS (
      SELECT g.*, SUM(n) OVER () AS tn, SUM(np) OVER () AS tp FROM g)
    SELECT CAST(decile AS INTEGER) AS decile,
           CAST(n AS BIGINT) AS n_docs,
           CAST(np AS BIGINT) AS n_positive,
           ROUND(CAST(np AS DOUBLE) / CAST(n AS DOUBLE), 6) AS positive_rate,
           ROUND((CAST(np AS DOUBLE) / CAST(n AS DOUBLE))
                 / (CAST(tp AS DOUBLE) / CAST(tn AS DOUBLE)), 6) AS lift
    FROM t
    """,
)
def classifier_decile_lift(spark, sf_dir):
    """Decile LIFT table for the 'n_chars predicts lang=en' scorer —
    the eval artifact read next to classifier_auc_eval's single AUC:
    docs ranked by score into ten fully tie-broken ntile buckets,
    each with its positive rate and lift over the base rate (a useful
    scorer front-loads positives into decile 1; lift ≈ 1 everywhere
    means the score is noise). The ntile runs over the |docs|-row
    scored projection with (score, doc_id) total order, so bucket
    assignment is engine-exact; rates and lifts are exact rationals
    with single divisions; the base rate rides a full-frame window
    over the 10-row aggregate."""
    d = load(spark, sf_dir, "documents")["documents"]
    s = d.select(
        "doc_id",
        F.col("n_chars").alias("score"),
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("pos"),
    )
    dec = s.select(
        "pos",
        F.ntile(10).over(Window.orderBy(F.desc("score"), "doc_id")).alias(
            "decile"
        ),
    )
    g = dec.groupBy("decile").agg(
        F.count(F.lit(1)).alias("n"), F.sum("pos").alias("np")
    )
    wf = Window.orderBy("decile").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    t = g.select(
        "decile",
        "n",
        "np",
        F.sum("n").over(wf).alias("tn"),
        F.sum("np").over(wf).alias("tp"),
    )
    rate = F.col("np").cast("double") / F.col("n").cast("double")
    base = F.col("tp").cast("double") / F.col("tn").cast("double")
    return t.select(
        F.col("decile").cast("int").alias("decile"),
        F.col("n").cast("long").alias("n_docs"),
        F.col("np").cast("long").alias("n_positive"),
        F.round(rate, 6).alias("positive_rate"),
        F.round(rate / base, 6).alias("lift"),
    )


# ---------------------------------------------------------------------------
# p-chart on daily error rates
# ---------------------------------------------------------------------------


@register(
    "error_rate_p_chart",
    oracle="""
    WITH d AS (
      SELECT CAST(ts AS DATE) AS day,
             COUNT(*) AS n,
             SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS errs
      FROM events GROUP BY CAST(ts AS DATE)),
    t AS (
      SELECT d.*, SUM(errs) OVER () AS te, SUM(n) OVER () AS tn FROM d),
    lim AS (
      SELECT day, n, errs,
             CAST(errs AS DOUBLE) / CAST(n AS DOUBLE) AS p_day,
             CAST(te AS DOUBLE) / CAST(tn AS DOUBLE) AS p_bar,
             3.0 * sqrt((CAST(te AS DOUBLE) / CAST(tn AS DOUBLE))
                        * (1.0 - CAST(te AS DOUBLE) / CAST(tn AS DOUBLE))
                        / CAST(n AS DOUBLE)) AS margin
      FROM t)
    SELECT day, CAST(n AS BIGINT) AS n_events, CAST(errs AS BIGINT) AS errors,
           ROUND(p_day, 6) AS error_rate,
           ROUND(p_bar - margin, 6) AS lcl,
           ROUND(p_bar + margin, 6) AS ucl,
           p_day > p_bar + margin OR p_day < p_bar - margin
             AS out_of_control
    FROM lim
    """,
)
def error_rate_p_chart(spark, sf_dir):
    """Shewhart p-chart on the daily error rate: per day, the rate
    with the 3σ binomial control limits around the corpus-wide
    center line p̄ ± 3·√(p̄(1−p̄)/n_day) and an out-of-control flag —
    the SPC discipline that separates signal from the noise a naive
    'error rate went up today' alert fires on (limits widen exactly
    when a day has little traffic). Counts are exact integers; p̄ is
    one rational; limits are fixed double trees with the 3σ constant
    as a literal — the flag compares doubles computed identically on
    both engines. Daily aggregation map-side combines; the totals
    ride a full-frame window over the |days| aggregate."""
    e = load(spark, sf_dir, "events")["events"]
    d = e.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0)).alias(
            "errs"
        ),
    )
    wf = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    t = d.select(
        "day",
        "n",
        "errs",
        F.sum("errs").over(wf).alias("te"),
        F.sum("n").over(wf).alias("tn"),
    )
    p_day = F.col("errs").cast("double") / F.col("n").cast("double")
    p_bar = F.col("te").cast("double") / F.col("tn").cast("double")
    margin = F.lit(3.0) * F.sqrt(
        p_bar * (F.lit(1.0) - p_bar) / F.col("n").cast("double")
    )
    return t.select(
        "day",
        F.col("n").cast("long").alias("n_events"),
        F.col("errs").cast("long").alias("errors"),
        F.round(p_day, 6).alias("error_rate"),
        F.round(p_bar - margin, 6).alias("lcl"),
        F.round(p_bar + margin, 6).alias("ucl"),
        ((p_day > p_bar + margin) | (p_day < p_bar - margin)).alias(
            "out_of_control"
        ),
    )
