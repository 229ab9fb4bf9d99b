"""Twenty-eighth-wave operators — approximate query processing with
honest error certificates: a mergeable 129-bucket histogram sketch
answering p50/p90/p99 with a per-answer error bound CHECKED against
the exact percentile in the same result row, and sampled top-k with
its overlap-vs-exact quality score — the two AQP moves (sketch and
sample) each shipping their own accuracy audit.

North-star greenfield. Conventions: prices in exact integer cents,
bucket arithmetic entirely integral (no float bucket-boundary
hazard), the deterministic sample is the md5-hash Bernoulli idiom of
operators/sampling.py.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from duckdb_distributed_execution_spark.functions import local_rows_df
from duckdb_distributed_execution_spark.queries import load, register

# ---------------------------------------------------------------------------
# Histogram-sketch quantiles with certified error
# ---------------------------------------------------------------------------

_QS_BUCKETS = 128
_QS_PS = (("p50", 0.5), ("p90", 0.9), ("p99", 0.99))


@register(
    "quantile_sketch_bound",
    oracle=f"""
    WITH v AS (
      SELECT CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT) AS c
      FROM lineitem),
    mm AS (
      SELECT MIN(c) AS lo, MAX(c) AS hi, COUNT(*) AS n,
             (MAX(c) - MIN(c)) // {_QS_BUCKETS} + 1 AS width
      FROM v),
    h AS (
      SELECT (v.c - mm.lo) // mm.width AS b, COUNT(*) AS cnt
      FROM v, mm GROUP BY 1),
    cum AS (
      SELECT b, SUM(cnt) OVER (ORDER BY b ROWS UNBOUNDED PRECEDING) AS cum,
             SUM(cnt) OVER (ORDER BY b ROWS UNBOUNDED PRECEDING) - cnt
               AS cum_before
      FROM h),
    ps(p_name, p) AS (VALUES {", ".join(f"('{n}', {p})" for n, p in _QS_PS)}),
    est AS (
      SELECT ps.p_name, ps.p,
             MIN(mm.lo + (cum.b + 1) * mm.width - 1) AS est_c
      FROM ps
      JOIN mm ON TRUE
      JOIN cum ON cum.cum >= CAST(ceil(ps.p * mm.n) AS BIGINT)
              AND cum.cum_before < CAST(ceil(ps.p * mm.n) AS BIGINT)
      GROUP BY ps.p_name, ps.p),
    exact AS (
      {" UNION ALL ".join(f"SELECT '{n}' AS p_name, quantile_disc(c, {p}) AS ec FROM v" for n, p in _QS_PS)})
    SELECT e.p_name,
           CAST(e.est_c AS DOUBLE) / 100.0 AS sketch_estimate,
           CAST(x.ec AS DOUBLE) / 100.0 AS exact_value,
           CAST(e.est_c - x.ec AS BIGINT) AS err_cents,
           e.est_c - x.ec >= 0
             AND e.est_c - x.ec < (SELECT width FROM mm) AS within_bound
    FROM est e JOIN exact x ON x.p_name = e.p_name
    """,
)
def quantile_sketch_bound(spark, sf_dir):
    """Approximate quantiles from a MERGEABLE {128}-bucket histogram
    sketch over price cents, each answer shipped WITH its error
    certificate: the sketch reports the containing bucket's upper
    edge, the same row carries the exact percentile (computed by the
    scale-safe two-level refinement, operators/quantiles.py), and a
    boolean proves 0 ≤ error < bucket_width — the contract an AQP
    layer owes its caller. Everything is INTEGER: cents, width =
    range//{128}+1, bucket = (c−lo)//width, rank = ceil(p·n) — no
    float ever decides a bucket boundary, so sketch and exact are
    engine-identical. The sketch state is {129} counts — mergeable by
    plain addition across partitions/days, which is what makes it the
    100 TB shape (the exact side exists to certify it)."""
    from duckdb_distributed_execution_spark.operators.quantiles import (
        disc_percentiles_by_group,
    )

    li = load(spark, sf_dir, "lineitem")["lineitem"]
    v = li.select(
        F.floor(F.col("l_extendedprice") * 100.0 + 0.5)
        .cast("long")
        .alias("c")
    )
    mm = v.agg(
        F.min("c").alias("lo"),
        F.max("c").alias("hi"),
        F.count(F.lit(1)).alias("n"),
    ).select(
        "lo",
        "hi",
        "n",
        (F.call_function("div", F.col("hi") - F.col("lo"), F.lit(_QS_BUCKETS)) + 1).alias(
            "width"
        ),
    )
    h = (
        v.crossJoin(F.broadcast(mm))
        .select(
            F.call_function("div", F.col("c") - F.col("lo"), F.col("width")).alias("b")
        )
        .groupBy("b")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    wc = Window.orderBy("b").rowsBetween(Window.unboundedPreceding, 0)
    cum = h.select(
        "b",
        F.sum("cnt").over(wc).alias("cum"),
        (F.sum("cnt").over(wc) - F.col("cnt")).alias("cum_before"),
    )
    ps = local_rows_df(spark, list(_QS_PS), "p_name STRING, p DOUBLE")
    est = (
        ps.crossJoin(F.broadcast(mm))
        .join(
            F.broadcast(cum),
            (F.col("cum") >= F.ceil(F.col("p") * F.col("n")))
            & (F.col("cum_before") < F.ceil(F.col("p") * F.col("n"))),
        )
        .groupBy("p_name", "p")
        .agg(
            F.min(
                F.col("lo") + (F.col("b") + 1) * F.col("width") - 1
            ).alias("est_c"),
            F.max("width").alias("width"),
        )
    )
    exact = disc_percentiles_by_group(
        v.withColumn("g", F.lit(1)), "g", "c", list(_QS_PS)
    )
    ex_long = None
    for name, _ in _QS_PS:
        row = exact.select(
            F.lit(name).alias("p_name"), F.col(name).alias("ec")
        )
        ex_long = row if ex_long is None else ex_long.unionByName(row)
    return (
        est.join(ex_long, on="p_name")
        .select(
            "p_name",
            (F.col("est_c").cast("double") / 100.0).alias("sketch_estimate"),
            (F.col("ec").cast("double") / 100.0).alias("exact_value"),
            (F.col("est_c") - F.col("ec")).cast("long").alias("err_cents"),
            (
                (F.col("est_c") - F.col("ec") >= 0)
                & (F.col("est_c") - F.col("ec") < F.col("width"))
            ).alias("within_bound"),
        )
    )


# ---------------------------------------------------------------------------
# Sampled top-k with overlap-vs-exact quality
# ---------------------------------------------------------------------------

_STK_K = 5
_STK_PCT = 20  # md5-hash Bernoulli, 20%


@register(
    "sampled_topk_quality",
    oracle=f"""
    WITH rev AS (
      SELECT l_partkey,
             SUM(CAST(floor(l_extendedprice * (1 - l_discount) * 100.0 + 0.5)
                      AS BIGINT)) AS r
      FROM lineitem GROUP BY l_partkey),
    srev AS (
      SELECT l_partkey,
             SUM(CAST(floor(l_extendedprice * (1 - l_discount) * 100.0 + 0.5)
                      AS BIGINT)) AS r
      FROM lineitem
      WHERE CAST('0x' || substr(md5('stk:' || CAST(l_orderkey AS VARCHAR)
                                    || ':' || CAST(l_linenumber AS VARCHAR)),
                                1, 7) AS BIGINT) % 100 < {_STK_PCT}
      GROUP BY l_partkey),
    topx AS (
      SELECT l_partkey, 'exact' AS src FROM rev
      ORDER BY r DESC, l_partkey LIMIT {_STK_K}),
    tops AS (
      SELECT l_partkey, 'sample' AS src FROM srev
      ORDER BY r DESC, l_partkey LIMIT {_STK_K})
    SELECT {_STK_K} AS k,
           (SELECT COUNT(*) FROM topx JOIN tops USING (l_partkey))
             AS n_overlap,
           ROUND(CAST((SELECT COUNT(*) FROM topx JOIN tops USING (l_partkey))
                      AS DOUBLE) / {_STK_K}, 6) AS overlap_at_k
    """,
)
def sampled_topk_quality(spark, sf_dir):
    """Sampled top-k WITH its quality score: top-{5} parts by revenue
    from a deterministic {20}% md5-hash Bernoulli sample of line
    items, scored by overlap@k against the exact top-{5} in the same
    result — the audit row an AQP layer publishes next to every
    sampled answer (an overlap of 1.0 says the sample suffices;
    a low one says the tail matters and the query must run exact).
    The sample predicate is the engine-portable hash idiom of
    operators/sampling.py (rerun- and engine-stable, no RNG); both
    top-k's are distributed TakeOrdered; the overlap is a join of two
    {5}-row sets."""
    li = load(spark, sf_dir, "lineitem")["lineitem"]
    cents = F.floor(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100.0 + 0.5
    ).cast("long")
    rev = li.groupBy("l_partkey").agg(F.sum(cents).alias("r"))
    keep = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit("stk:"),
                        F.col("l_orderkey").cast("string"),
                        F.lit(":"),
                        F.col("l_linenumber").cast("string"),
                    )
                ),
                1,
                7,
            ),
            16,
            10,
        ).cast("long")
        % 100
        < _STK_PCT
    )
    srev = li.filter(keep).groupBy("l_partkey").agg(F.sum(cents).alias("r"))
    topx = rev.orderBy(F.desc("r"), "l_partkey").limit(_STK_K).select("l_partkey")
    tops = srev.orderBy(F.desc("r"), "l_partkey").limit(_STK_K).select("l_partkey")
    overlap = topx.join(tops, on="l_partkey").agg(
        F.count(F.lit(1)).alias("n_overlap")
    )
    return overlap.select(
        F.lit(_STK_K).alias("k"),
        "n_overlap",
        F.round(F.col("n_overlap").cast("double") / _STK_K, 6).alias(
            "overlap_at_k"
        ),
    )
