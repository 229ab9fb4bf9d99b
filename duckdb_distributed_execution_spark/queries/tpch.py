"""TPC-H-shaped analytical queries adapted to the testdata star schema
— the "complex plan" family the reference always punts to a single
DuckDB node (query_utils.cpp:20-35). Each is a genuinely distributed
Spark plan: facts shuffle on join keys, dims broadcast, aggregation is
partial/final, and every query hash-matches the DuckDB oracle.

(Q1 ≡ agg_pricing_summary, Q5 ≡ join_multi_star, Q15 ≡ cte_revenue in
core/joins/nested; this module adds the rest of the representative
shapes.)"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from duckdb_distributed_execution_spark.functions import (
    exact_sum,
    oracle_exact_sum,
)
from duckdb_distributed_execution_spark.queries import load, register


@register(
    "tpch_q3_shipping_priority",
    oracle=f"""
    SELECT l.l_orderkey,
           {oracle_exact_sum('l.l_extendedprice * (1 - l.l_discount)')} AS revenue,
           o.o_orderdate, o.o_orderpriority
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1997-01-01'
      AND l.l_shipdate  > TIMESTAMP '1997-01-01'
    GROUP BY 1, 3, 4
    ORDER BY revenue DESC, l.l_orderkey
    LIMIT 10
    """,
)
def tpch_q3_shipping_priority(spark, sf_dir):
    """Q3: top unshipped-revenue orders for one segment — selective
    dim broadcast + fact-fact shuffle + distributed top-k."""
    t = load(spark, sf_dir, "customer", "orders", "lineitem")
    rev = F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
    building = t["customer"].filter(F.col("c_mktsegment") == "BUILDING")
    orders = t["orders"].filter(
        F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp")
    )
    items = t["lineitem"].filter(
        F.col("l_shipdate") > F.lit("1997-01-01").cast("timestamp")
    )
    return (
        items.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(building), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(exact_sum(rev).alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


@register(
    "tpch_q4_order_priority",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate <  TIMESTAMP '1996-07-01'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate)
    GROUP BY o_orderpriority
    """,
)
def tpch_q4_order_priority(spark, sf_dir):
    """Q4: correlated EXISTS over the fact table → semi join."""
    t = load(spark, sf_dir, "orders", "lineitem")
    o = t["orders"].filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp"))
    )
    late = t["lineitem"].select("l_orderkey", "l_shipdate")
    return (
        o.join(
            late,
            (F.col("l_orderkey") == F.col("o_orderkey"))
            & (F.col("l_shipdate") > F.col("o_orderdate")),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


@register(
    "tpch_q7_volume_shipping",
    oracle=f"""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(EXTRACT(YEAR FROM l.l_shipdate) AS INTEGER) AS l_year,
           {oracle_exact_sum('l.l_extendedprice * (1 - l.l_discount)')} AS revenue
    FROM supplier s
    JOIN lineitem l ON s.s_suppkey = l.l_suppkey
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
    JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
    WHERE n1.n_name < n2.n_name
      AND l.l_shipdate >= TIMESTAMP '1997-01-01'
    GROUP BY 1, 2, 3
    """,
)
def tpch_q7_volume_shipping(spark, sf_dir):
    """Q7: two aliases of the same dim (supplier vs customer nation)
    plus an inequality filter across them."""
    t = load(spark, sf_dir, "supplier", "lineitem", "orders", "customer", "nation")
    rev = F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
    n1 = t["nation"].select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = t["nation"].select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    return (
        t["lineitem"]
        .filter(F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        .join(t["orders"], F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(t["supplier"]), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(t["customer"]), F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(F.col("supp_nation") < F.col("cust_nation"))
        .groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
        )
        .agg(exact_sum(rev).alias("revenue"))
    )


@register(
    "tpch_q10_returned_items",
    oracle=f"""
    SELECT c.c_custkey, c.c_name,
           {oracle_exact_sum('l.l_extendedprice * (1 - l.l_discount)')} AS revenue,
           n.n_name AS nation
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    WHERE l.l_returnflag = 'R'
      AND o.o_orderdate >= TIMESTAMP '1997-01-01'
    GROUP BY 1, 2, 4
    ORDER BY revenue DESC, c.c_custkey
    LIMIT 20
    """,
)
def tpch_q10_returned_items(spark, sf_dir):
    """Q10: top customers by returned-item revenue."""
    t = load(spark, sf_dir, "customer", "orders", "lineitem", "nation")
    rev = F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
    returned = t["lineitem"].filter(F.col("l_returnflag") == "R")
    orders = t["orders"].filter(
        F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp")
    )
    return (
        returned.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(t["customer"]), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", F.col("n_name").alias("nation"))
        .agg(exact_sum(rev).alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "nation")
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


@register(
    "tpch_q14_promo_revenue",
    oracle=f"""
    SELECT
      {oracle_exact_sum("CASE WHEN p.p_type LIKE 'PROMO%' THEN l.l_extendedprice * (1 - l.l_discount) ELSE 0 END")}
        AS promo_revenue,
      {oracle_exact_sum('l.l_extendedprice * (1 - l.l_discount)')} AS total_revenue
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-03-01'
      AND l.l_shipdate <  TIMESTAMP '1997-04-01'
    """,
)
def tpch_q14_promo_revenue(spark, sf_dir):
    """Q14: promo revenue share — conditional aggregate over a
    broadcast dim join."""
    t = load(spark, sf_dir, "lineitem", "part")
    rev = F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
    promo = F.when(F.col("p_type").like("PROMO%"), rev).otherwise(F.lit(0.0))
    return (
        t["lineitem"]
        .filter(
            (F.col("l_shipdate") >= F.lit("1997-03-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
        )
        .join(F.broadcast(t["part"]), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            exact_sum(promo).alias("promo_revenue"),
            exact_sum(rev).alias("total_revenue"),
        )
    )


@register(
    "tpch_q18_large_orders",
    oracle="""
    SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate,
           o.o_totalprice, t.sum_qty
    FROM (SELECT l_orderkey,
                 (SUM(CAST(round(l_quantity * 1000000.0) AS BIGINT)) / 1000000.0)
                   AS sum_qty
          FROM lineitem GROUP BY l_orderkey
          HAVING (SUM(CAST(round(l_quantity * 1000000.0) AS BIGINT)) / 1000000.0) > 150) t
    JOIN orders o   ON o.o_orderkey = t.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    """,
)
def tpch_q18_large_orders(spark, sf_dir):
    """Q18: large-quantity orders — aggregate-then-join (the HAVING
    subquery side drives the join)."""
    t = load(spark, sf_dir, "customer", "orders", "lineitem")
    big = (
        t["lineitem"]
        .groupBy("l_orderkey")
        .agg(exact_sum("l_quantity").alias("sum_qty"))
        .filter(F.col("sum_qty") > 150)
    )
    return (
        big.join(t["orders"], F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(t["customer"]), F.col("c_custkey") == F.col("o_custkey"))
        .select(
            "c_name", "c_custkey", "o_orderkey", "o_orderdate",
            "o_totalprice", "sum_qty",
        )
    )


@register(
    "tpch_q2_min_cost_supplier",
    oracle="""
    WITH pw AS (
      SELECT p.p_partkey, p.p_name, s.s_suppkey, s.s_name, s.s_acctbal,
             ROW_NUMBER() OVER (PARTITION BY p.p_partkey
                                ORDER BY s.s_acctbal DESC, s.s_suppkey) AS rn
      FROM part p
      JOIN lineitem l ON l.l_partkey = p.p_partkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      WHERE p.p_size <= 10)
    SELECT p_partkey, p_name, s_suppkey, s_name, s_acctbal
    FROM pw WHERE rn = 1
    """,
)
def tpch_q2_min_cost_supplier(spark, sf_dir):
    """Q2 shape: best supplier per part — join + per-group argmax via
    window (the distributed 'correlated scalar subquery' rewrite)."""
    t = load(spark, sf_dir, "part", "lineitem", "supplier")
    small = t["part"].filter(F.col("p_size") <= 10)
    joined = (
        t["lineitem"]
        .join(F.broadcast(small), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(t["supplier"]), F.col("s_suppkey") == F.col("l_suppkey"))
    )
    w = Window.partitionBy("p_partkey").orderBy(
        F.col("s_acctbal").desc(), F.col("s_suppkey")
    )
    return (
        joined.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("p_partkey", "p_name", "s_suppkey", "s_name", "s_acctbal")
    )


@register(
    "tpch_q20_part_promotion",
    oracle=f"""
    SELECT s.s_suppkey, s.s_name
    FROM supplier s
    WHERE s.s_suppkey IN (
      SELECT l_suppkey FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      GROUP BY l_suppkey
      HAVING {oracle_exact_sum('l_quantity')} > 12000
    )
    """,
)
def tpch_q20_part_promotion(spark, sf_dir):
    """Q20 shape: suppliers exceeding a shipped-quantity threshold —
    aggregate subquery feeding a semi join."""
    t = load(spark, sf_dir, "supplier", "lineitem")
    heavy = (
        t["lineitem"]
        .filter(F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        .groupBy("l_suppkey")
        .agg(exact_sum("l_quantity").alias("q"))
        .filter(F.col("q") > 12000)
        .select("l_suppkey")
    )
    return (
        t["supplier"]
        .join(F.broadcast(heavy), F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .select("s_suppkey", "s_name")
    )
