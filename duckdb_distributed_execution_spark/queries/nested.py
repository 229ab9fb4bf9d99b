"""CTEs, subqueries, grouping sets/rollup/cube — SURVEY §2.B rows CTE
and "semi/anti/grouping sets/set ops" (the reference never distributes
any of these; query_plan_analyzer.cpp:141-142 marks CTE plans
complex → single node). All native in Spark SQL / DataFrame API."""

from __future__ import annotations

from pyspark.sql import functions as F

from duckdb_distributed_execution_spark.functions import (
    exact_sum,
    oracle_exact_sum,
)
from duckdb_distributed_execution_spark.queries import load, register


@register(
    "cte_revenue",
    oracle=f"""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             {oracle_exact_sum('l_extendedprice * (1 - l_discount)')} AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      GROUP BY 1
    )
    SELECT s.s_suppkey, s.s_name, r.total_revenue
    FROM supplier s JOIN revenue r ON s.s_suppkey = r.supplier_no
    WHERE r.total_revenue > (SELECT CAST(AVG(total_revenue) AS DOUBLE) * 1.0 FROM revenue)
    """,
)
def cte_revenue(spark, sf_dir):
    """TPC-H Q15 shape: CTE + scalar subquery over the CTE. The scalar
    AVG divides identical exact sums by an identical count, so the
    filter boundary is deterministic across engines."""
    t = load(spark, sf_dir, "lineitem", "supplier")
    rev = F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
    revenue = (
        t["lineitem"]
        .filter(F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(exact_sum(rev).alias("total_revenue"))
    )
    threshold = revenue.agg(
        (F.avg("total_revenue") * F.lit(1.0)).alias("t")
    )
    return (
        t["supplier"]
        .join(revenue, F.col("s_suppkey") == F.col("supplier_no"))
        .join(F.broadcast(threshold))
        .filter(F.col("total_revenue") > F.col("t"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


@register(
    "subquery_scalar",
    oracle="""
    SELECT p_partkey, p_name, p_retailprice
    FROM part
    WHERE p_retailprice >
      (SELECT CAST(SUM(CAST(p_retailprice AS DECIMAL(28,6))) AS DOUBLE) / COUNT(p_retailprice)
       FROM part) * 1.03
    """,
)
def subquery_scalar(spark, sf_dir):
    from duckdb_distributed_execution_spark.functions import exact_avg

    p = load(spark, sf_dir, "part")["part"]
    thr = p.agg((exact_avg("p_retailprice") * F.lit(1.03)).alias("thr"))
    return (
        p.join(F.broadcast(thr))
        .filter(F.col("p_retailprice") > F.col("thr"))
        .select("p_partkey", "p_name", "p_retailprice")
    )


@register(
    "subquery_in",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
      AND o_orderstatus = 'O'
    """,
)
def subquery_in(spark, sf_dir):
    t = load(spark, sf_dir, "orders", "customer")
    building = t["customer"].filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    return (
        t["orders"]
        .filter(F.col("o_orderstatus") == "O")
        .join(F.broadcast(building), F.col("o_custkey") == F.col("c_custkey"), "left_semi")
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


@register(
    "exists_correlated",
    oracle="""
    SELECT s_suppkey, s_name FROM supplier s
    WHERE EXISTS (
      SELECT 1 FROM lineitem l
      WHERE l.l_suppkey = s.s_suppkey AND l.l_extendedprice > 90000
    )
    """,
)
def exists_correlated(spark, sf_dir):
    """Correlated EXISTS → decorrelated semi join (Catalyst does the
    decorrelation; the reference's only EXISTS usage is driver-local,
    group_by_distributed.test:73-77)."""
    t = load(spark, sf_dir, "lineitem", "supplier")
    return t["supplier"].alias("s").join(
        t["lineitem"].filter(F.col("l_extendedprice") > 90000).alias("l"),
        F.col("s.s_suppkey") == F.col("l.l_suppkey"),
        "left_semi",
    ).select("s_suppkey", "s_name")


@register(
    "rollup_agg",
    oracle=f"""
    SELECT o_orderstatus, o_orderpriority,
           COUNT(*) AS cnt,
           {oracle_exact_sum('o_totalprice')} AS revenue
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
)
def rollup_agg(spark, sf_dir):
    o = load(spark, sf_dir, "orders")["orders"]
    return o.rollup("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("cnt"),
        exact_sum("o_totalprice").alias("revenue"),
    )


@register(
    "cube_agg",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           COUNT(*) AS cnt,
           {oracle_exact_sum('l_quantity')} AS sum_qty
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def cube_agg(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")["lineitem"]
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("cnt"),
        exact_sum("l_quantity").alias("sum_qty"),
    )


@register(
    "grouping_sets",
    oracle=f"""
    SELECT event_type, user_id % 10 AS user_bucket,
           COUNT(*) AS cnt,
           {oracle_exact_sum('value')} AS sum_value
    FROM events
    GROUP BY GROUPING SETS ((event_type), (user_id % 10), (event_type, user_id % 10))
    """,
)
def grouping_sets(spark, sf_dir):
    load(spark, sf_dir, "events")
    return spark.sql(
        """
        SELECT event_type, user_id % 10 AS user_bucket,
               COUNT(*) AS cnt,
               (SUM(CAST(round(value * 1000000.0) AS BIGINT)) / 1000000.0) AS sum_value
        FROM events
        GROUP BY GROUPING SETS ((event_type), (user_id % 10), (event_type, user_id % 10))
        """
    )
