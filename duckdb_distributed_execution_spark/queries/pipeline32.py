"""Thirty-second-wave operators — graph shape and customer-base
composition: the degree distribution of the user co-presence graph
(the first plot drawn on any graph, and the scale-free check LSH/
partition strategies depend on), and the repeat-vs-first-time
revenue split per year (how much of the business is the install
base?).

North-star greenfield. Conventions: degrees and counts exact;
first-order attribution via a (date, orderkey)-tie-broken rank;
revenue in exact integer cents.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from duckdb_distributed_execution_spark.queries import load, register

# ---------------------------------------------------------------------------
# Degree distribution of the user co-presence graph
# ---------------------------------------------------------------------------

_DEG_BUCKET_US = 600_000_000  # the kcore query's 10-minute buckets


@register(
    "graph_degree_histogram",
    oracle=f"""
    WITH ev AS (
      SELECT DISTINCT event_type AS et,
             epoch_us(ts) // {_DEG_BUCKET_US} AS b,
             user_id AS u
      FROM events),
    e AS (
      SELECT DISTINCT a.u AS ua, b.u AS ub
      FROM ev a JOIN ev b ON a.et = b.et AND a.b = b.b AND a.u < b.u),
    und AS (SELECT ua AS u, ub AS v FROM e
            UNION ALL SELECT ub, ua FROM e),
    deg AS (SELECT u, COUNT(*) AS degree FROM und GROUP BY u)
    SELECT CAST(degree AS BIGINT) AS degree,
           COUNT(*) AS n_nodes
    FROM deg GROUP BY degree
    """,
)
def graph_degree_histogram(spark, sf_dir):
    """Degree distribution of the user co-presence graph (same edge
    definition as graph_kcore_users: users sharing an event type in a
    10-minute bucket) — the first diagnostic drawn on any graph: a
    heavy tail means hub users that skew-join mitigation and LSH
    bucket caps must absorb; a bell shape means uniform partitioning
    holds. Two grouped aggregates after the bucketed co-occurrence
    join (pair volume bounded by co-presence width, never |users|²);
    the histogram itself is |distinct degrees| rows."""
    e = load(spark, sf_dir, "events")["events"]
    ev = e.select(
        F.col("event_type").alias("et"),
        F.expr(f"unix_micros(ts) div {_DEG_BUCKET_US}").alias("b"),
        F.col("user_id").alias("u"),
    ).distinct()
    a = ev.select("et", "b", F.col("u").alias("ua"))
    bb = ev.select("et", "b", F.col("u").alias("ub"))
    pairs = (
        a.join(bb, on=["et", "b"])
        .filter(F.col("ua") < F.col("ub"))
        .select("ua", "ub")
        .distinct()
    )
    und = pairs.select(F.col("ua").alias("u")).unionAll(
        pairs.select(F.col("ub").alias("u"))
    )
    deg = und.groupBy("u").agg(F.count(F.lit(1)).alias("degree"))
    return deg.groupBy("degree").agg(F.count(F.lit(1)).alias("n_nodes")).select(
        F.col("degree").cast("long").alias("degree"), "n_nodes"
    )


# ---------------------------------------------------------------------------
# Repeat vs first-time revenue split per year
# ---------------------------------------------------------------------------


@register(
    "repeat_revenue_split",
    oracle="""
    WITH r AS (
      SELECT o_custkey, o_orderkey, year(o_orderdate) AS y,
             CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS cents,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_orderdate, o_orderkey) AS rn
      FROM orders)
    SELECT y AS order_year,
           COUNT(*) AS n_orders,
           SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS first_time_orders,
           CAST(SUM(CASE WHEN rn = 1 THEN cents ELSE 0 END) AS DOUBLE)
             / 100.0 AS first_time_revenue,
           CAST(SUM(CASE WHEN rn > 1 THEN cents ELSE 0 END) AS DOUBLE)
             / 100.0 AS repeat_revenue,
           ROUND(CAST(SUM(CASE WHEN rn > 1 THEN cents ELSE 0 END) AS DOUBLE)
                 / CAST(SUM(cents) AS DOUBLE), 6) AS repeat_share
    FROM r GROUP BY y
    """,
)
def repeat_revenue_split(spark, sf_dir):
    """Customer-base composition: per order year, revenue split
    between each customer's FIRST-ever order and all repeat orders,
    with the repeat share — the install-base-vs-acquisition read that
    reframes a flat revenue line. First-order attribution is a
    (order_date, orderkey)-tie-broken rank per customer (one keyed
    window over orders); revenue stays in exact integer cents until
    the report divisions. One shuffle on customer, one on year."""
    o = load(spark, sf_dir, "orders")["orders"]
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    r = o.select(
        F.year("o_orderdate").alias("order_year"),
        F.floor(F.col("o_totalprice") * 100.0 + 0.5).cast("long").alias("cents"),
        F.row_number().over(w).alias("rn"),
    )
    first = F.when(F.col("rn") == 1, F.col("cents")).otherwise(0)
    rep = F.when(F.col("rn") > 1, F.col("cents")).otherwise(0)
    return r.groupBy("order_year").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.when(F.col("rn") == 1, 1).otherwise(0)).alias(
            "first_time_orders"
        ),
        (F.sum(first).cast("double") / 100.0).alias("first_time_revenue"),
        (F.sum(rep).cast("double") / 100.0).alias("repeat_revenue"),
        F.round(
            F.sum(rep).cast("double") / F.sum("cents").cast("double"), 6
        ).alias("repeat_share"),
    )
