"""Forty-third wave — interval algebra and dense linear algebra.

``session_concurrency_sweep`` answers the interval-overlap-join
question ("how many sessions overlap?") in its scalable form: instead
of materializing overlapping PAIRS (Θ(n²) when everyone is online at
once), a sweep line over session boundaries (+1 at start, −1 at end)
turns peak concurrency into a global running sum — routed through the
distributed ``assign_running_sum`` operator (one (count, sum) pair
per partition to the driver, never a single-partition window).

``embedding_covariance_topvar`` is the covariance/Gram pass behind
PCA whitening (operators/linalg.py): per-batch numpy partials →
exact quantized combine → the strongest variance/covariance entries.
Reference has neither surface (north-star greenfield, BASELINE.json).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from duckdb_distributed_execution_spark.operators.linalg import (
    covariance_entries,
)
from duckdb_distributed_execution_spark.operators.rowid import (
    assign_running_sum,
)
from duckdb_distributed_execution_spark.queries import load, register

_GAP_US = 1800 * 1_000_000  # 30-minute session gap


@register(
    "session_concurrency_sweep",
    oracle=f"""
    WITH lagged AS (
      SELECT user_id, ts,
             LAG(epoch_us(ts)) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS pe
      FROM events),
    s AS (
      SELECT user_id, ts,
             SUM(CASE WHEN pe IS NULL OR epoch_us(ts) - pe > {_GAP_US}
                 THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY ts
                     ROWS UNBOUNDED PRECEDING) AS sess
      FROM lagged),
    iv AS (SELECT user_id, sess, MIN(ts) AS st, MAX(ts) AS en
           FROM s GROUP BY user_id, sess),
    b AS (SELECT st AS t, 1 AS d FROM iv
          UNION ALL
          SELECT en AS t, -1 AS d FROM iv),
    rs AS (SELECT t, d, SUM(d) OVER (ORDER BY t, d DESC
                                     ROWS UNBOUNDED PRECEDING) AS conc
           FROM b),
    mx AS (SELECT MAX(conc) AS peak FROM rs),
    ns AS (SELECT COUNT(*) AS n_sessions FROM iv)
    SELECT CAST(mx.peak AS BIGINT) AS peak_concurrency,
           (SELECT MIN(t) FROM rs, mx WHERE conc = peak) AS peak_at,
           CAST(ns.n_sessions AS BIGINT) AS n_sessions
    FROM mx, ns
    """,
)
def session_concurrency_sweep(spark, sf_dir):
    """Peak concurrent sessions (30-min-gap sessionization, intervals
    closed at both ends: a start ties BEFORE an end at the same
    instant, so touching sessions count as concurrent). The sweep is
    deterministic under ties: within a (t, d) tie group every
    increment is identical, so the prefix-value multiset — hence the
    max and its earliest timestamp — is order-independent. Boundary
    relation is 2·|sessions| rows; the prefix sum is distributed
    (operators/rowid.py::assign_running_sum), so no stage ever holds
    more than one range bucket."""
    e = load(spark, sf_dir, "events")["events"]
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts"))
    new_s = F.when(
        (us - F.lag(us).over(w)).isNull()
        | ((us - F.lag(us).over(w)) > _GAP_US),
        1,
    ).otherwise(0)
    s = e.select("user_id", "ts", "event_id").withColumn(
        "sess",
        F.sum(new_s).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    iv = s.groupBy("user_id", "sess").agg(
        F.min("ts").alias("st"), F.max("ts").alias("en")
    )
    b = iv.select(F.col("st").alias("t"), F.lit(1).alias("d")).unionAll(
        iv.select(F.col("en").alias("t"), F.lit(-1).alias("d"))
    )
    rs = assign_running_sum(
        b.withColumn("dn", -F.col("d")), ["t", "dn"], "d", out_col="conc"
    )
    mx = rs.agg(F.max("conc").alias("peak"))
    ns = iv.agg(F.count(F.lit(1)).alias("n_sessions"))
    return (
        rs.crossJoin(F.broadcast(mx))
        .filter(F.col("conc") == F.col("peak"))
        .agg(F.min("t").alias("peak_at"), F.first("peak").alias("peak"))
        .crossJoin(F.broadcast(ns))
        .select(
            F.col("peak").cast("long").alias("peak_concurrency"),
            "peak_at",
            F.col("n_sessions").cast("long").alias("n_sessions"),
        )
    )


@register(
    "embedding_covariance_topvar",
    oracle="""
    WITH el AS (
      SELECT vec_id,
             unnest(range(0, len(embedding))) AS i0,
             CAST(unnest(embedding) AS DOUBLE) AS x
      FROM embeddings),
    n AS (SELECT COUNT(*) AS c FROM embeddings),
    ux AS (SELECT i0, SUM(CAST(floor(x * 1000000000.0 + 0.5) AS BIGINT))
             AS sx
           FROM el GROUP BY i0),
    px AS (
      SELECT a.i0 AS i0, b.i0 AS j0,
             SUM(CAST(floor(a.x * b.x * 1000000000.0 + 0.5) AS BIGINT))
               AS sxy
      FROM el a JOIN el b ON a.vec_id = b.vec_id AND a.i0 <= b.i0
      GROUP BY a.i0, b.i0),
    cov AS (
      SELECT px.i0, px.j0,
             (sxy / 1000000000.0) / CAST(c AS DOUBLE)
               - ((ua.sx / 1000000000.0) / CAST(c AS DOUBLE))
                 * ((ub.sx / 1000000000.0) / CAST(c AS DOUBLE)) AS cv
      FROM px JOIN ux ua ON ua.i0 = px.i0
              JOIN ux ub ON ub.i0 = px.j0
              CROSS JOIN n)
    SELECT CAST(i0 + 1 AS BIGINT) AS dim_i,
           CAST(j0 + 1 AS BIGINT) AS dim_j,
           ROUND(cv, 6) AS cov
    FROM (SELECT *, ROW_NUMBER() OVER (ORDER BY abs(cv) DESC, i0, j0)
            AS rn FROM cov)
    WHERE rn <= 15
    """,
)
def embedding_covariance_topvar(spark, sf_dir):
    """The 15 strongest covariance-matrix entries (|cov| desc;
    diagonal = variance) of the embedding corpus — the relation a PCA
    / whitening pass is built from, computed with the two-phase Gram
    pattern (operators/linalg.py): per-batch numpy outer-product
    partials quantized to exact longs, then a D²-bounded combine. The
    final ranking window runs over D(D+1)/2 = 2080 rows — bounded by
    the embedding width, never by the corpus."""
    emb = load(spark, sf_dir, "embeddings")["embeddings"]
    ce = covariance_entries(emb, "embedding")
    w = Window.orderBy(F.abs(F.col("cov")).desc(), "dim_i", "dim_j")
    return (
        ce.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 15)
        .select("dim_i", "dim_j", F.round("cov", 6).alias("cov"))
    )
