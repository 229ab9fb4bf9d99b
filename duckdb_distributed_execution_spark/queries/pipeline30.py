"""Thirtieth-wave operators — financial reconciliation and per-entity
trend portfolios: the order-total reconciliation audit (does the
denormalized o_totalprice match the lineitem roll-up? — in this
synthetic corpus it never does, and 257 orders have no items at all:
exactly what the audit is for), supplier lead-time variance ranking
(supply-consistency risk), and the customer spend-trend mix (what
share of customers are spending more over time — per-entity OLS
slopes classified by their EXACT INTEGER numerator sign).

North-star greenfield. Conventions: money in integer cents before any
cross-row sum, variances from integer power sums, trend classes
decided by integer sign tests — never a float near a boundary.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from duckdb_distributed_execution_spark.queries import load, register

# ---------------------------------------------------------------------------
# Order-total reconciliation audit
# ---------------------------------------------------------------------------


@register(
    "order_total_reconciliation",
    oracle="""
    WITH lc AS (
      SELECT l_orderkey,
             SUM(CAST(floor(l_extendedprice * (1 - l_discount)
                            * (1 + l_tax) * 100.0 + 0.5) AS BIGINT))
               AS calc_cents
      FROM lineitem GROUP BY l_orderkey),
    j AS (
      SELECT o.o_orderstatus,
             CAST(floor(o.o_totalprice * 100.0 + 0.5) AS BIGINT)
               AS head_cents,
             lc.calc_cents
      FROM orders o LEFT JOIN lc ON lc.l_orderkey = o.o_orderkey)
    SELECT o_orderstatus,
           COUNT(*) AS n_orders,
           SUM(CASE WHEN calc_cents IS NULL THEN 1 ELSE 0 END)
             AS n_childless,
           SUM(CASE WHEN calc_cents IS NOT NULL
                     AND abs(head_cents - calc_cents) <= 1
                    THEN 1 ELSE 0 END) AS n_reconciled,
           CAST(SUM(CASE WHEN calc_cents IS NOT NULL
                         THEN abs(head_cents - calc_cents) ELSE 0 END)
                AS DOUBLE) / 100.0 AS total_abs_gap
    FROM j GROUP BY o_orderstatus
    """,
)
def order_total_reconciliation(spark, sf_dir):
    """Financial reconciliation: the denormalized order header total
    vs the lineitem roll-up (price·(1−disc)·(1+tax)), per order
    status — n orders, CHILDLESS orders (header with no items — 257
    in this corpus), reconciled-within-a-cent count, and the total
    absolute gap. The per-row charge goes to integer cents BEFORE the
    per-order sum, so the roll-up is order-independent and
    engine-exact; the audit verdict per order is an integer
    comparison. This corpus reconciles NOWHERE (headers and items are
    generated independently) — which is the point: the audit output
    is the evidence a warehouse needs before trusting either column.
    One fact aggregate + one header join at 100 TB."""
    t = load(spark, sf_dir, "lineitem", "orders")
    li, o = t["lineitem"], t["orders"]
    lc = li.groupBy("l_orderkey").agg(
        F.sum(
            F.floor(
                F.col("l_extendedprice")
                * (1 - F.col("l_discount"))
                * (1 + F.col("l_tax"))
                * 100.0
                + 0.5
            ).cast("long")
        ).alias("calc_cents")
    )
    j = o.join(
        lc, F.col("l_orderkey") == F.col("o_orderkey"), "left"
    ).select(
        "o_orderstatus",
        F.floor(F.col("o_totalprice") * 100.0 + 0.5)
        .cast("long")
        .alias("head_cents"),
        "calc_cents",
    )
    gap = F.abs(F.col("head_cents") - F.col("calc_cents"))
    return j.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.when(F.col("calc_cents").isNull(), 1).otherwise(0)).alias(
            "n_childless"
        ),
        F.sum(
            F.when(F.col("calc_cents").isNotNull() & (gap <= 1), 1).otherwise(0)
        ).alias("n_reconciled"),
        (
            F.sum(
                F.when(F.col("calc_cents").isNotNull(), gap).otherwise(0)
            ).cast("double")
            / 100.0
        ).alias("total_abs_gap"),
    )


# ---------------------------------------------------------------------------
# Supplier lead-time variance ranking
# ---------------------------------------------------------------------------

_SLV_TOPK = 10


@register(
    "supplier_leadtime_variance",
    oracle=f"""
    WITH lat AS (
      SELECT l.l_suppkey,
             date_diff('day', CAST(o.o_orderdate AS DATE),
                       CAST(l.l_shipdate AS DATE)) AS d
      FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey),
    s AS (
      SELECT l_suppkey, COUNT(*) AS n, SUM(d) AS sd,
             SUM(CAST(d AS HUGEINT) * d) AS sdd
      FROM lat GROUP BY l_suppkey HAVING COUNT(*) >= 5)
    SELECT CAST(rn AS INTEGER) AS rank, l_suppkey,
           CAST(n AS BIGINT) AS n_shipments,
           ROUND(CAST(CAST(n AS HUGEINT) * sdd - CAST(sd AS HUGEINT) * sd
                      AS DOUBLE)
                 / CAST(CAST(n AS HUGEINT) * n AS DOUBLE), 4) AS variance_days2
    FROM (SELECT *, row_number() OVER (
            ORDER BY CAST(CAST(n AS HUGEINT) * sdd - CAST(sd AS HUGEINT) * sd
                          AS DOUBLE)
                     / CAST(CAST(n AS HUGEINT) * n AS DOUBLE) DESC,
                     l_suppkey) AS rn
          FROM s)
    WHERE rn <= {_SLV_TOPK}
    """,
)
def supplier_leadtime_variance(spark, sf_dir):
    """Supply-consistency risk: the top-{10} suppliers by POPULATION
    VARIANCE of order-to-ship latency — a supplier with a fine mean
    but huge variance is the one that breaks promise dates. Variance
    comes from exact integer power sums ((n·Σd²−(Σd)²)/n², squares
    through HUGEINT/DECIMAL(38,0)); the ranking key is that exact
    rational evaluated once as a double (identical both engines) with
    a suppkey tie-break. One fact join + one grouped aggregate; the
    rank runs over the |suppliers| aggregate."""
    t = load(spark, sf_dir, "lineitem", "orders")
    li, o = t["lineitem"], t["orders"]
    lat = li.join(o, F.col("o_orderkey") == F.col("l_orderkey")).select(
        "l_suppkey",
        F.datediff(
            F.col("l_shipdate").cast("date"), F.col("o_orderdate").cast("date")
        ).alias("d"),
    )
    dec = "decimal(38,0)"
    s = (
        lat.groupBy("l_suppkey")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("d").alias("sd"),
            F.sum(F.col("d").cast("decimal(18,0)") * F.col("d").cast("decimal(18,0)"))
            .cast(dec)
            .alias("sdd"),
        )
        .filter(F.col("n") >= 5)
    )
    var = (
        F.col("n").cast(dec) * F.col("sdd")
        - F.col("sd").cast(dec) * F.col("sd").cast(dec)
    ).cast("double") / (F.col("n").cast(dec) * F.col("n").cast(dec)).cast(
        "double"
    )
    w = Window.orderBy(var.desc(), "l_suppkey")
    return (
        s.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= _SLV_TOPK)
        .select(
            "rank",
            "l_suppkey",
            F.col("n").cast("long").alias("n_shipments"),
            F.round(var, 4).alias("variance_days2"),
        )
    )


# ---------------------------------------------------------------------------
# Customer spend-trend mix
# ---------------------------------------------------------------------------


@register(
    "customer_spend_trend_mix",
    oracle="""
    WITH ord AS (
      SELECT o_custkey,
             date_diff('day', DATE '1970-01-01',
                       CAST(o_orderdate AS DATE)) AS x,
             CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS y
      FROM orders),
    s AS (
      SELECT o_custkey, COUNT(*) AS n,
             SUM(x) AS sx, SUM(y) AS sy,
             SUM(CAST(x AS HUGEINT) * y) AS sxy,
             SUM(CAST(x AS HUGEINT) * x) AS sxx
      FROM ord GROUP BY o_custkey HAVING COUNT(*) >= 3),
    cl AS (
      SELECT CASE
               WHEN CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx = 0
                 THEN 'flat'
               WHEN CAST(n AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy > 0
                 THEN 'rising'
               WHEN CAST(n AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy < 0
                 THEN 'falling'
               ELSE 'flat' END AS trend
      FROM s),
    tot AS (SELECT COUNT(*) AS total FROM cl)
    SELECT trend,
           COUNT(*) AS n_customers,
           ROUND(CAST(COUNT(*) AS DOUBLE) / CAST(MAX(t.total) AS DOUBLE), 6)
             AS share
    FROM cl CROSS JOIN tot t GROUP BY trend
    """,
)
def customer_spend_trend_mix(spark, sf_dir):
    """The spend-trend PORTFOLIO: every customer with ≥3 orders gets
    an OLS slope of order value (cents) on order date (epoch days),
    classified rising/falling/flat by the sign of the EXACT INTEGER
    numerator n·Σxy−ΣxΣy (the denominator is positive whenever dates
    vary, so the sign test needs no division) — no float ever decides
    a customer's class. The mix of classes is the health read behind
    'are our customers growing?'. One grouped aggregate over orders;
    classification and shares run over the |customers| aggregate.
    The share denominator rides a full-frame window (no scalar cross
    join on the Spark side)."""
    o = load(spark, sf_dir, "orders")["orders"]
    ord_ = o.select(
        "o_custkey",
        F.datediff(F.col("o_orderdate").cast("date"), F.lit("1970-01-01").cast("date")).alias("x"),
        F.floor(F.col("o_totalprice") * 100.0 + 0.5).cast("long").alias("y"),
    )
    dec = "decimal(38,0)"
    s = (
        ord_.groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("x").alias("sx"),
            F.sum("y").alias("sy"),
            F.sum(F.col("x").cast("decimal(18,0)") * F.col("y").cast("decimal(18,0)"))
            .cast(dec)
            .alias("sxy"),
            F.sum(F.col("x").cast("decimal(18,0)") * F.col("x").cast("decimal(18,0)"))
            .cast(dec)
            .alias("sxx"),
        )
        .filter(F.col("n") >= 3)
    )
    den = F.col("n").cast(dec) * F.col("sxx") - F.col("sx").cast(dec) * F.col(
        "sx"
    ).cast(dec)
    num = F.col("n").cast(dec) * F.col("sxy") - F.col("sx").cast(dec) * F.col(
        "sy"
    ).cast(dec)
    cl = s.select(
        F.when(den == 0, F.lit("flat"))
        .when(num > 0, F.lit("rising"))
        .when(num < 0, F.lit("falling"))
        .otherwise(F.lit("flat"))
        .alias("trend")
    )
    wf = Window.partitionBy().rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    counted = cl.groupBy("trend").agg(F.count(F.lit(1)).alias("n_customers"))
    return counted.select(
        "trend",
        "n_customers",
        F.round(
            F.col("n_customers").cast("double")
            / F.sum("n_customers").over(wf).cast("double"),
            6,
        ).alias("share"),
    )
