"""Core relational surface: scan/filter/project, aggregation,
distinct, sort, limit/offset, set ops, scalar expressions.

Reference parity targets (SURVEY §2):
- A1/A2 scan with projection pushdown → Spark parquet scan (column
  pruning AND predicate pushdown, which the reference explicitly
  lacks — distributed_table_scan_function.cpp:41).
- A13/A14 aggregate & group-by merge → Spark partial/final agg
  (exact; no AVG-of-AVGs hazard, result_merger.cpp:42-45).
- A15 distinct merge → df.distinct().
- A17's refusals (ORDER BY / LIMIT / OFFSET never distributed,
  distributed_executor.cpp:230-238) → Spark distributes all three
  (range-partitioned sort, TakeOrderedAndProject).
- §2.C scalar surface: comparisons, BETWEEN, IN, IS NULL, CASE WHEN,
  string concat ||, casts, modulo, OCTET_LENGTH.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from duckdb_distributed_execution_spark.functions import (
    exact_avg,
    exact_sum,
    oracle_exact_avg,
    oracle_exact_sum,
)
from duckdb_distributed_execution_spark.queries import load, register


@register(
    "scan_filter_project",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
    FROM lineitem
    WHERE l_shipdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1996-12-31'
      AND l_discount > 0.05
      AND l_returnflag IN ('A', 'R')
    """,
)
def scan_filter_project(spark, sf_dir):
    """Filter + projection pushed to the parquet scan. The reference
    ships the whole table and filters client-side
    (distributed_table_scan_function.cpp:41); here `.explain` shows
    PushedFilters on the scan."""
    li = load(spark, sf_dir, "lineitem")["lineitem"]
    return li.filter(
        F.col("l_shipdate").between("1996-01-01", "1996-12-31")
        & (F.col("l_discount") > 0.05)
        & F.col("l_returnflag").isin("A", "R")
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")


@register(
    "agg_global",
    oracle=f"""
    SELECT COUNT(*) AS cnt,
           COUNT(DISTINCT l_suppkey) AS n_supp,
           {oracle_exact_sum('l_extendedprice')} AS sum_price,
           MIN(l_extendedprice) AS min_price,
           MAX(l_extendedprice) AS max_price,
           {oracle_exact_avg('l_quantity')} AS avg_qty
    FROM lineitem
    """,
)
def agg_global(spark, sf_dir):
    """Ungrouped aggregate — the reference's AGGREGATE_MERGE path
    (result_merger.cpp:12-54), exact here."""
    li = load(spark, sf_dir, "lineitem")["lineitem"]
    return li.agg(
        F.count(F.lit(1)).alias("cnt"),
        F.countDistinct("l_suppkey").alias("n_supp"),
        exact_sum("l_extendedprice").alias("sum_price"),
        F.min("l_extendedprice").alias("min_price"),
        F.max("l_extendedprice").alias("max_price"),
        exact_avg("l_quantity").alias("avg_qty"),
    )


@register(
    "agg_pricing_summary",
    headline=True,
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {oracle_exact_sum('l_quantity')} AS sum_qty,
           {oracle_exact_sum('l_extendedprice')} AS sum_base_price,
           {oracle_exact_sum('l_extendedprice * (1 - l_discount)')} AS sum_disc_price,
           {oracle_exact_sum('l_extendedprice * (1 - l_discount) * (1 + l_tax)')} AS sum_charge,
           {oracle_exact_avg('l_quantity')} AS avg_qty,
           {oracle_exact_avg('l_extendedprice')} AS avg_price,
           {oracle_exact_avg('l_discount')} AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2001-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def agg_pricing_summary(spark, sf_dir):
    """TPC-H Q1 shape — the flagship grouped aggregation (the
    reference's GROUP_BY_MERGE path, result_merger.cpp:56-139, done
    right: partial/final agg with exact decimal arithmetic).

    r9: aggregates built via spark_exact_sum/avg expression strings —
    one JVM parse each instead of ~10 py4j round trips (plan
    construction was ~40% of this query's bench wall at sf0.1);
    bit-identical results (functions/__init__.py docstring + pytest
    pin)."""
    from duckdb_distributed_execution_spark.functions import (
        spark_exact_avg,
        spark_exact_sum,
    )

    li = load(spark, sf_dir, "lineitem")["lineitem"]
    disc_price = "l_extendedprice * (1 - l_discount)"
    charge = f"{disc_price} * (1 + l_tax)"
    return (
        li.filter(F.expr("l_shipdate <= TIMESTAMP '2001-09-02'"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            spark_exact_sum("l_quantity").alias("sum_qty"),
            spark_exact_sum("l_extendedprice").alias("sum_base_price"),
            spark_exact_sum(disc_price).alias("sum_disc_price"),
            spark_exact_sum(charge).alias("sum_charge"),
            spark_exact_avg("l_quantity").alias("avg_qty"),
            spark_exact_avg("l_extendedprice").alias("avg_price"),
            spark_exact_avg("l_discount").alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@register(
    "agg_count_distinct",
    oracle="""
    SELECT l_returnflag,
           COUNT(DISTINCT l_partkey) AS n_parts,
           COUNT(DISTINCT l_suppkey) AS n_supps,
           COUNT(*) AS cnt
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_count_distinct(spark, sf_dir):
    """COUNT(DISTINCT) per group — distributed via Expand + two-phase
    agg in Spark (the reference runs it single-node,
    row_group_partitioning.test:139-143)."""
    li = load(spark, sf_dir, "lineitem")["lineitem"]
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
        F.count(F.lit(1)).alias("cnt"),
    )


@register(
    "agg_having",
    oracle=f"""
    SELECT o_custkey, COUNT(*) AS n_orders,
           {oracle_exact_sum('o_totalprice')} AS total_spent
    FROM orders
    GROUP BY o_custkey
    HAVING COUNT(*) >= 12
    """,
)
def agg_having(spark, sf_dir):
    o = load(spark, sf_dir, "orders")["orders"]
    return (
        o.groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            exact_sum("o_totalprice").alias("total_spent"),
        )
        .filter(F.col("n_orders") >= 12)
    )


@register(
    "case_when_agg",
    headline=True,
    oracle=f"""
    SELECT CASE WHEN value < 5 THEN 'low'
                WHEN value < 20 THEN 'mid'
                ELSE 'high' END AS bucket,
           COUNT(*) AS cnt,
           {oracle_exact_sum('value')} AS total_value
    FROM events
    GROUP BY 1
    """,
)
def case_when_agg(spark, sf_dir):
    """The reference's benchmark-query shape (benchmark/large_table.sql:26-28):
    CASE-derived category + COUNT + SUM."""
    ev = load(spark, sf_dir, "events")["events"]
    bucket = (
        F.when(F.col("value") < 5, "low")
        .when(F.col("value") < 20, "mid")
        .otherwise("high")
        .alias("bucket")
    )
    return ev.groupBy(bucket).agg(
        F.count(F.lit(1)).alias("cnt"),
        exact_sum("value").alias("total_value"),
    )


@register(
    "distinct_rows",
    oracle="SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",
)
def distinct_rows(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")["lineitem"]
    return li.select("l_returnflag", "l_linestatus").distinct()


@register(
    "sort_topk",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 10
    """,
)
def sort_topk(spark, sf_dir):
    """Distributed top-k → TakeOrderedAndProject (the reference
    refuses to distribute ORDER BY at all,
    distributed_executor.cpp:230-232)."""
    o = load(spark, sf_dir, "orders")["orders"]
    return (
        o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .limit(10)
    )


@register(
    "limit_offset",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    ORDER BY o_orderkey
    LIMIT 20 OFFSET 10
    """,
)
def limit_offset(spark, sf_dir):
    """LIMIT/OFFSET (reference supports these only through scan paging,
    distributed_flight_server.cpp:503-508)."""
    o = load(spark, sf_dir, "orders")["orders"]
    return (
        o.orderBy("o_orderkey").select("o_orderkey", "o_totalprice").offset(10).limit(20)
    )


@register(
    "union_all",
    oracle="""
    SELECT event_id, event_type, value FROM events WHERE event_type = 'click'
    UNION ALL
    SELECT event_id, event_type, value FROM events WHERE value > 40
    """,
)
def union_all(spark, sf_dir):
    ev = load(spark, sf_dir, "events")["events"]
    a = ev.filter(F.col("event_type") == "click").select("event_id", "event_type", "value")
    b = ev.filter(F.col("value") > 40).select("event_id", "event_type", "value")
    return a.unionAll(b)


@register(
    "union_distinct",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    UNION
    SELECT c_custkey AS o_custkey FROM customer WHERE c_acctbal < 0
    """,
)
def union_distinct(spark, sf_dir):
    t = load(spark, sf_dir, "orders", "customer")
    a = t["orders"].filter(F.col("o_orderstatus") == "F").select("o_custkey")
    b = (
        t["customer"]
        .filter(F.col("c_acctbal") < 0)
        .select(F.col("c_custkey").alias("o_custkey"))
    )
    return a.union(b).distinct()


@register(
    "intersect_keys",
    oracle="""
    SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
    INTERSECT
    SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
    """,
)
def intersect_keys(spark, sf_dir):
    o = load(spark, sf_dir, "orders")["orders"]
    a = o.filter(F.col("o_orderstatus") == "O").select(F.col("o_custkey").alias("custkey"))
    b = o.filter(F.col("o_orderstatus") == "F").select(F.col("o_custkey").alias("custkey"))
    return a.intersect(b)


@register(
    "except_keys",
    oracle="""
    SELECT c_custkey FROM customer
    EXCEPT
    SELECT o_custkey AS c_custkey FROM orders
    """,
)
def except_keys(spark, sf_dir):
    t = load(spark, sf_dir, "orders", "customer")
    a = t["customer"].select("c_custkey")
    b = t["orders"].select(F.col("o_custkey").alias("c_custkey"))
    return a.exceptAll(b).distinct()


@register(
    "string_funcs",
    oracle="""
    SELECT doc_id,
           UPPER(source) AS src_upper,
           source || '-' || lang AS src_lang,
           LENGTH(text) AS text_len,
           OCTET_LENGTH(CAST(text AS BLOB)) AS text_bytes,
           SUBSTR(text, 1, 16) AS prefix,
           CASE WHEN text LIKE '%spark%' THEN 1 ELSE 0 END AS has_spark,
           CAST(n_chars AS VARCHAR) AS n_chars_str
    FROM documents
    """,
)
def string_funcs(spark, sf_dir):
    """§2.C scalar surface: concat ||, casts, LIKE, OCTET_LENGTH
    (type_support.test:136-141), substring."""
    d = load(spark, sf_dir, "documents")["documents"]
    return d.select(
        "doc_id",
        F.upper("source").alias("src_upper"),
        F.concat(F.col("source"), F.lit("-"), F.col("lang")).alias("src_lang"),
        F.length("text").cast("long").alias("text_len"),
        F.octet_length(F.col("text").cast("binary")).cast("long").alias("text_bytes"),
        F.substring("text", 1, 16).alias("prefix"),
        F.when(F.col("text").like("%spark%"), 1).otherwise(0).alias("has_spark"),
        F.col("n_chars").cast("string").alias("n_chars_str"),
    )


@register(
    "date_funcs",
    oracle=f"""
    SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS INTEGER) AS yr,
           CAST(EXTRACT(MONTH FROM o_orderdate) AS INTEGER) AS mon,
           COUNT(*) AS n_orders,
           {oracle_exact_sum('o_totalprice')} AS revenue
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01'
    GROUP BY 1, 2
    """,
)
def date_funcs(spark, sf_dir):
    o = load(spark, sf_dir, "orders")["orders"]
    return (
        o.filter(F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        .groupBy(
            F.year("o_orderdate").alias("yr"),
            F.month("o_orderdate").alias("mon"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            exact_sum("o_totalprice").alias("revenue"),
        )
    )


@register(
    "date_trunc_bucket",
    oracle=f"""
    SELECT CAST(DATE_TRUNC('month', ts) AS TIMESTAMP) AS month_start,
           event_type,
           COUNT(*) AS cnt,
           {oracle_exact_avg('value')} AS avg_value
    FROM events
    GROUP BY 1, 2
    """,
)
def date_trunc_bucket(spark, sf_dir):
    ev = load(spark, sf_dir, "events")["events"]
    return ev.groupBy(
        F.date_trunc("month", F.col("ts")).alias("month_start"),
        F.col("event_type"),
    ).agg(
        F.count(F.lit(1)).alias("cnt"),
        exact_avg("value").alias("avg_value"),
    )


@register(
    "modulo_arithmetic",
    oracle=f"""
    SELECT l_orderkey % 7 AS bucket,
           COUNT(*) AS cnt,
           {oracle_exact_sum('l_quantity + l_linenumber')} AS qsum
    FROM lineitem
    GROUP BY 1
    """,
)
def modulo_arithmetic(spark, sf_dir):
    """Modulo + arithmetic — the expression family the reference's own
    task partitioner injects (rowid % N, task_partitioner.cpp:147-150),
    here just a user expression."""
    li = load(spark, sf_dir, "lineitem")["lineitem"]
    return li.groupBy((F.col("l_orderkey") % 7).alias("bucket")).agg(
        F.count(F.lit(1)).alias("cnt"),
        exact_sum(F.col("l_quantity") + F.col("l_linenumber")).alias("qsum"),
    )


@register(
    "agg_empty_input",
    oracle=f"""
    SELECT COUNT(*) AS cnt,
           COUNT(l_quantity) AS cnt_col,
           {oracle_exact_sum('l_quantity')} AS sum_qty,
           MIN(l_extendedprice) AS min_price,
           MAX(l_extendedprice) AS max_price
    FROM lineitem WHERE l_quantity > 1000000
    """,
)
def agg_empty_input(spark, sf_dir):
    """Global aggregate over zero rows — one row: COUNT 0, SUM/MIN/MAX
    NULL (a classic distributed-merge edge: an engine that
    concatenates empty partials returns zero rows instead)."""
    li = load(spark, sf_dir, "lineitem")["lineitem"]
    return li.filter(F.col("l_quantity") > 1000000).agg(
        F.count(F.lit(1)).alias("cnt"),
        F.count("l_quantity").alias("cnt_col"),
        exact_sum("l_quantity").alias("sum_qty"),
        F.min("l_extendedprice").alias("min_price"),
        F.max("l_extendedprice").alias("max_price"),
    )


@register(
    "group_by_null_keys",
    oracle=f"""
    SELECT NULLIF(event_type, 'error') AS etype,
           COUNT(*) AS cnt,
           COUNT(NULLIF(event_type, 'error')) AS cnt_nonnull,
           {oracle_exact_sum('value')} AS sum_value
    FROM events
    GROUP BY 1
    """,
)
def group_by_null_keys(spark, sf_dir):
    """NULL group keys: all NULLs group together (SQL GROUP BY
    semantics), COUNT(col) skips them, COUNT(*) does not."""
    ev = load(spark, sf_dir, "events")["events"]
    etype = F.nullif(F.col("event_type"), F.lit("error"))
    return ev.groupBy(etype.alias("etype")).agg(
        F.count(F.lit(1)).alias("cnt"),
        F.count(etype).alias("cnt_nonnull"),
        exact_sum("value").alias("sum_value"),
    )


@register(
    "join_null_keys",
    oracle="""
    SELECT COUNT(*) AS n_matches,
           COUNT(CASE WHEN b.k IS NULL THEN 1 END) AS n_unmatched_left
    FROM (SELECT NULLIF(user_id % 7, 3) AS k FROM events) a
    LEFT JOIN (SELECT DISTINCT NULLIF(user_id % 7, 5) AS k FROM events) b
      ON a.k = b.k
    """,
)
def join_null_keys(spark, sf_dir):
    """NULL join keys never match (even NULL=NULL) — left rows with
    NULL keys survive a left join unmatched."""
    ev = load(spark, sf_dir, "events")["events"]
    a = ev.select(F.nullif(F.col("user_id") % 7, F.lit(3)).alias("k"))
    b = ev.select(F.nullif(F.col("user_id") % 7, F.lit(5)).alias("k")).distinct()
    j = a.join(b.withColumnRenamed("k", "bk"), a["k"] == F.col("bk"), "left")
    return j.agg(
        F.count(F.lit(1)).alias("n_matches"),
        F.count(F.when(F.col("bk").isNull(), 1)).alias("n_unmatched_left"),
    )


@register(
    "window_frame_firstlast",
    oracle="""
    SELECT user_id, event_id,
           FIRST_VALUE(value) OVER w AS first_v,
           LAST_VALUE(value)  OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS BETWEEN UNBOUNDED PRECEDING
                                             AND UNBOUNDED FOLLOWING) AS last_v,
           NTH_VALUE(value, 2) OVER w AS second_v
    FROM events
    WHERE event_type = 'signup'
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
)
def window_frame_firstlast(spark, sf_dir):
    """FIRST/LAST/NTH_VALUE with an explicit full frame (the default
    running frame makes LAST_VALUE a footgun — pinned here)."""
    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events")["events"]
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return ev.filter(F.col("event_type") == "signup").select(
        "user_id",
        "event_id",
        F.first("value").over(w).alias("first_v"),
        F.last("value").over(w).alias("last_v"),
        F.nth_value("value", 2).over(w).alias("second_v"),
    )


@register(
    "json_extract",
    oracle=f"""
    SELECT CAST(json_extract_string(props, '$.k') AS INTEGER) % 10 AS k_bucket,
           COUNT(*) AS cnt,
           {oracle_exact_sum('value')} AS sum_value
    FROM events
    GROUP BY 1
    """,
)
def json_extract(spark, sf_dir):
    """Semi-structured column access (events.props is a JSON string)."""
    ev = load(spark, sf_dir, "events")["events"]
    k = F.get_json_object("props", "$.k").cast("int")
    return ev.groupBy((k % 10).alias("k_bucket")).agg(
        F.count(F.lit(1)).alias("cnt"),
        exact_sum("value").alias("sum_value"),
    )


@register(
    "range_table_function",
    oracle="""
    SELECT CAST(range AS BIGINT) AS i,
           CAST(range * range AS BIGINT) AS sq
    FROM range(0, 1000, 7)
    """,
)
def range_table_function(spark, sf_dir):
    """Generated-sequence source (DuckDB range() ≡ spark.range):
    produced directly by the driver as a splittable relation — each
    executor generates its slice, no file scan at all."""
    return spark.range(0, 1000, 7).select(
        F.col("id").alias("i"), (F.col("id") * F.col("id")).alias("sq")
    )


@register(
    "intersect_all_keys",
    oracle="""
    SELECT l_suppkey FROM lineitem WHERE l_returnflag = 'R'
    INTERSECT ALL
    SELECT l_suppkey FROM lineitem WHERE l_returnflag = 'A'
    """,
)
def intersect_all_keys(spark, sf_dir):
    """INTERSECT ALL — bag semantics (min of per-side multiplicities),
    distinct from the set-variant intersect_keys."""
    li = load(spark, sf_dir, "lineitem")["lineitem"]
    a = li.filter(F.col("l_returnflag") == "R").select("l_suppkey")
    b = li.filter(F.col("l_returnflag") == "A").select("l_suppkey")
    return a.intersectAll(b)


@register(
    "except_all_keys",
    oracle="""
    SELECT l_suppkey FROM lineitem WHERE l_returnflag = 'R'
    EXCEPT ALL
    SELECT l_suppkey FROM lineitem WHERE l_returnflag = 'A'
    """,
)
def except_all_keys(spark, sf_dir):
    """EXCEPT ALL — bag difference (multiplicity-preserving)."""
    li = load(spark, sf_dir, "lineitem")["lineitem"]
    a = li.filter(F.col("l_returnflag") == "R").select("l_suppkey")
    b = li.filter(F.col("l_returnflag") == "A").select("l_suppkey")
    return a.exceptAll(b)


@register(
    "lateral_topn",
    oracle="""
    SELECT r.r_name AS region, t.n_name AS nation
    FROM region r,
         LATERAL (SELECT n_name FROM nation
                  WHERE n_regionkey = r.r_regionkey
                  ORDER BY n_name LIMIT 2) t
    """,
)
def lateral_topn(spark, sf_dir):
    """Correlated LATERAL derived table (top-2 nations per region) —
    Spark SQL's LATERAL subquery, decorrelated by Catalyst into a
    ranked join rather than a per-row loop."""
    load(spark, sf_dir, "region", "nation")
    return spark.sql("""
        SELECT r.r_name AS region, t.n_name AS nation
        FROM region r,
             LATERAL (SELECT n_name FROM nation
                      WHERE n_regionkey = r.r_regionkey
                      ORDER BY n_name LIMIT 2) t
    """)
