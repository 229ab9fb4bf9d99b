"""Additional SQL-surface breadth: regression aggregates, boolean /
bitwise aggregates, deterministic mode, weighted priority sampling,
higher-order array functions, interval arithmetic, regular-expression
functions, and CSV / JSON-lines format round trips.

These extend SURVEY.md §2.C beyond what the reference's tests exercise
(the reference delegates all scalar/aggregate evaluation to DuckDB —
query_plan_analyzer.cpp:118-163 — so its *surface* is whatever DuckDB
answers; this module keeps widening the oracle-checked subset of that
surface). All distributed mechanics are builtin Catalyst: each query is
a single scan → (optional shuffle) → agg pipeline with no Python in the
hot path.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

from duckdb_distributed_execution_spark.queries import arr_str, load, register

# ---------------------------------------------------------------------------
# Statistical / regression aggregates
# ---------------------------------------------------------------------------


@register(
    "regr_aggregates",
    oracle="""
    SELECT o_orderstatus,
           regr_count(o_totalprice, o_custkey) AS n,
           ROUND(regr_slope(o_totalprice, o_custkey), 8) AS slope,
           ROUND(regr_intercept(o_totalprice, o_custkey), 4) AS icept,
           ROUND(regr_r2(o_totalprice, o_custkey), 8) AS r2,
           ROUND(regr_avgx(o_totalprice, o_custkey), 4) AS avgx,
           ROUND(regr_avgy(o_totalprice, o_custkey), 4) AS avgy
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def regr_aggregates(spark, sf_dir):
    """Linear-regression aggregate family (regr_*): one distributed
    pass computing per-group OLS fit of totalprice on custkey. Exact
    cross-engine equality is impossible for variance-based recurrences,
    so outputs are rounded far above the O(1e-9) drift (same convention
    as stats_aggregates). Scale: partial/final agg, one shuffle on the
    3-value status key."""
    o = load(spark, sf_dir, "orders")["orders"]
    y, x = F.col("o_totalprice"), F.col("o_custkey")
    return o.groupBy("o_orderstatus").agg(
        F.regr_count(y, x).alias("n"),
        F.round(F.regr_slope(y, x), 8).alias("slope"),
        F.round(F.regr_intercept(y, x), 4).alias("icept"),
        F.round(F.regr_r2(y, x), 8).alias("r2"),
        F.round(F.regr_avgx(y, x), 4).alias("avgx"),
        F.round(F.regr_avgy(y, x), 4).alias("avgy"),
    )


@register(
    "bool_bit_aggregates",
    oracle="""
    SELECT l_returnflag,
           bool_and(l_quantity > 0) AS all_pos,
           bool_or(l_discount > 0.09) AS any_big_disc,
           bit_and(CAST(l_quantity AS BIGINT)) AS qty_and,
           bit_or(CAST(l_quantity AS BIGINT)) AS qty_or,
           bit_xor(CAST(l_quantity AS BIGINT)) AS qty_xor,
           ROUND(median(CAST(l_quantity AS BIGINT)), 1) AS med_qty
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def bool_bit_aggregates(spark, sf_dir):
    """BOOL_AND/BOOL_OR, bitwise AND/OR/XOR aggregates, and exact
    MEDIAN — all commutative/associative (median exact, not sketched),
    partial/final merged by Spark. Bitwise aggs on integral quantity;
    median interpolates identically (mean of middle pair) in both
    engines on integral input, exact in double."""
    li = load(spark, sf_dir, "lineitem")["lineitem"]
    q = F.col("l_quantity").cast("bigint")
    return li.groupBy("l_returnflag").agg(
        F.bool_and(F.col("l_quantity") > 0).alias("all_pos"),
        F.bool_or(F.col("l_discount") > 0.09).alias("any_big_disc"),
        F.bit_and(q).alias("qty_and"),
        F.bit_or(q).alias("qty_or"),
        F.bit_xor(q).alias("qty_xor"),
        F.round(F.median(q), 1).alias("med_qty"),
    )


@register(
    "mode_deterministic",
    oracle="""
    WITH counted AS (
        SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS qty,
               COUNT(*) AS cnt
        FROM lineitem GROUP BY 1, 2
    ), ranked AS (
        SELECT l_returnflag, qty, cnt,
               ROW_NUMBER() OVER (PARTITION BY l_returnflag
                                  ORDER BY cnt DESC, qty ASC) AS rn
        FROM counted
    )
    SELECT l_returnflag, qty AS mode_qty, cnt AS mode_count
    FROM ranked WHERE rn = 1
    """,
)
def mode_deterministic(spark, sf_dir):
    """MODE with a deterministic tie-break (smallest value among the
    most frequent). Built-in ``mode()`` is non-deterministic on ties in
    both engines, so the operator is expressed as count + window top-1
    — two shuffles (group, then 3-key window), both tiny after the
    first aggregation collapses cardinality."""
    from pyspark.sql import Window

    li = load(spark, sf_dir, "lineitem")["lineitem"]
    counted = li.groupBy(
        "l_returnflag", F.col("l_quantity").cast("bigint").alias("qty")
    ).agg(F.count("*").alias("cnt"))
    w = Window.partitionBy("l_returnflag").orderBy(
        F.desc("cnt"), F.asc("qty")
    )
    return (
        counted.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "l_returnflag",
            F.col("qty").alias("mode_qty"),
            F.col("cnt").alias("mode_count"),
        )
    )


# ---------------------------------------------------------------------------
# Weighted deterministic sampling
# ---------------------------------------------------------------------------


@register(
    "weighted_sample_topk",
    oracle="""
    WITH scored AS (
        SELECT l_orderkey, l_linenumber,
               CAST(l_quantity AS BIGINT) AS weight,
               (CAST('0x' || substr(md5(
                    CAST(l_orderkey AS VARCHAR) || '-' ||
                    CAST(l_linenumber AS VARCHAR) || '|wsample'), 1, 15)
                 AS BIGINT) % 1000000)
               // CAST(l_quantity AS BIGINT) AS priority
        FROM lineitem
        WHERE l_quantity >= 1
    )
    SELECT l_orderkey, l_linenumber, weight, priority
    FROM scored
    ORDER BY priority ASC, l_orderkey ASC, l_linenumber ASC
    LIMIT 50
    """,
)
def weighted_sample_topk(spark, sf_dir):
    """Deterministic weighted sampling (priority sampling): each row
    gets priority = hash-uniform-bucket ÷ weight (integer division —
    exact on both engines); the k smallest priorities form the sample,
    so inclusion probability scales with weight while remaining a pure
    row function — reproducible on any cluster size, engine, or rerun
    (same rationale as operators/sampling.py). Top-k is a distributed
    TakeOrderedAndProject: no full sort, no shuffle of the data —
    per-partition heaps, merge at the driver of k rows/partition."""
    from duckdb_distributed_execution_spark.operators.dedup import hash60

    li = load(spark, sf_dir, "lineitem")["lineitem"]
    weight = F.col("l_quantity").cast("bigint")
    key = F.concat(
        F.col("l_orderkey").cast("string"),
        F.lit("-"),
        F.col("l_linenumber").cast("string"),
        F.lit("|wsample"),
    )
    bucket = hash60(key) % 1_000_000
    return (
        li.filter(F.col("l_quantity") >= 1)
        .select(
            "l_orderkey",
            "l_linenumber",
            weight.alias("weight"),
            (bucket / weight).cast("bigint").alias("priority"),
        )
        .orderBy(
            F.asc("priority"), F.asc("l_orderkey"), F.asc("l_linenumber")
        )
        .limit(50)
    )


# ---------------------------------------------------------------------------
# Higher-order array functions
# ---------------------------------------------------------------------------


@register(
    "higher_order_array_funcs",
    oracle="""
    WITH arrs AS (
        SELECT n_nationkey,
               range(1, n_nationkey + 4) AS arr
        FROM nation
    )
    SELECT n_nationkey,
           len(arr) AS arr_len,
           list_sum(list_filter(list_transform(arr, x -> x * x),
                                x -> x % 2 = 0)) AS even_sq_sum,
           list_position(arr, 3) AS pos3,
           array_to_string(arr[2:3], ',') AS mid_slice,
           array_to_string(list_reverse(arr), ',') AS rev
    FROM arrs
    """,
)
def higher_order_array_funcs(spark, sf_dir):
    """Higher-order lambda functions over arrays — transform / filter /
    aggregate / slice / reverse on a generated integer sequence (exact
    integer math, no float drift). Catalyst evaluates lambdas
    JVM-side inside codegen; no UDFs. DuckDB mirrors with
    list_transform / list_filter / list_sum.

    Note DuckDB ``range(a, b)`` is end-exclusive and 1-based slicing
    ``arr[2:3]`` is inclusive — mirrored by sequence(a, b-1) and
    slice(arr, 2, 2)."""
    n = load(spark, sf_dir, "nation")["nation"]
    arr = F.sequence(F.lit(1), F.col("n_nationkey") + 3)
    return n.select(
        "n_nationkey",
        F.size(arr).alias("arr_len"),
        F.aggregate(
            F.filter(
                F.transform(arr, lambda x: x * x), lambda x: x % 2 == 0
            ),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).alias("even_sq_sum"),
        F.array_position(arr, 3).alias("pos3"),
        arr_str(F.slice(arr, 2, 2)).alias("mid_slice"),
        arr_str(F.reverse(arr)).alias("rev"),
    )


# ---------------------------------------------------------------------------
# Interval / date arithmetic
# ---------------------------------------------------------------------------


@register(
    "interval_arithmetic",
    oracle="""
    SELECT o_orderkey,
           CAST(o_orderdate + INTERVAL 3 MONTH AS DATE) AS plus3m,
           CAST(o_orderdate - INTERVAL 45 DAY AS DATE) AS minus45d,
           last_day(o_orderdate) AS eom,
           date_diff('day', DATE '1995-01-01', o_orderdate) AS days_since,
           date_part('quarter', o_orderdate) AS qtr,
           CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start
    FROM orders
    WHERE o_orderkey % 97 = 0
    """,
)
def interval_arithmetic(spark, sf_dir):
    """Date ± INTERVAL arithmetic, end-of-month, day differences,
    quarter extraction, month truncation. Month addition clamps to the
    month end identically in both engines (e.g. Jan 31 + 1 month =
    Feb 28). Pure per-row projection — pushed into the scan stage."""
    o = load(spark, sf_dir, "orders")["orders"]
    d = F.col("o_orderdate")
    return o.filter(F.col("o_orderkey") % 97 == 0).select(
        "o_orderkey",
        F.add_months(d, 3).alias("plus3m"),
        F.date_sub(d, 45).alias("minus45d"),
        F.last_day(d).alias("eom"),
        F.datediff(d, F.lit("1995-01-01").cast("date")).alias("days_since"),
        F.quarter(d).cast("long").alias("qtr"),
        F.trunc(d, "month").alias("month_start"),
    )


# ---------------------------------------------------------------------------
# Regular-expression functions
# ---------------------------------------------------------------------------


@register(
    "regex_funcs",
    oracle="""
    SELECT doc_id,
           regexp_extract(text, '([A-Za-z]+)', 1) AS first_word,
           regexp_replace(text, '[0-9]+', '#', 'g') AS digits_masked,
           regexp_matches(text, '[0-9]') AS has_digit,
           len(string_split(text, ' ')) AS n_fields
    FROM documents
    WHERE doc_id % 53 = 0
    """,
)
def regex_funcs(spark, sf_dir):
    """Regex extract / global replace / match-test / split — the core
    text-wrangling scalar surface. Patterns restricted to the
    POSIX-compatible subset where Java and RE2-style engines agree.
    Per-row projection, JVM regex inside codegen (not Python)."""
    d = load(spark, sf_dir, "documents")["documents"]
    t = F.col("text")
    return d.filter(F.col("doc_id") % 53 == 0).select(
        "doc_id",
        F.regexp_extract(t, r"([A-Za-z]+)", 1).alias("first_word"),
        F.regexp_replace(t, r"[0-9]+", "#").alias("digits_masked"),
        t.rlike("[0-9]").alias("has_digit"),
        F.size(F.split(t, " ", -1)).cast("long").alias("n_fields"),
    )


# ---------------------------------------------------------------------------
# Format round trips: CSV and JSON-lines sources/sinks
# ---------------------------------------------------------------------------
# The reference moves all data as Arrow over Flight (SURVEY §2 A19);
# format breadth on ingest is therefore greenfield capability. The
# oracle reads the ORIGINAL parquet: a passing hash proves the
# write→read cycle through the text format is lossless for the typed
# columns involved.

_ROUNDTRIP_ORACLE = """
    SELECT o_orderstatus,
           COUNT(*) AS cnt,
           SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS total_cents,
           MIN(CAST(o_orderdate AS DATE)) AS first_date,
           MAX(CAST(o_orderdate AS DATE)) AS last_date
    FROM orders
    GROUP BY o_orderstatus
"""


def _roundtrip_agg(df):
    # ROUND before the bigint cast: price*100 lands within 1e-9 of an
    # integer, but a bare cast truncates in Spark and rounds in DuckDB.
    return df.groupBy("o_orderstatus").agg(
        F.count("*").alias("cnt"),
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint")).alias(
            "total_cents"
        ),
        F.min("o_orderdate").alias("first_date"),
        F.max("o_orderdate").alias("last_date"),
    )


@register("csv_roundtrip", oracle=_ROUNDTRIP_ORACLE)
def csv_roundtrip(spark, sf_dir):
    """CSV sink + source: write orders to partitioned CSV with header,
    read back with an explicit schema (schema inference is a full
    extra pass — never at scale), aggregate, and hash-match the
    parquet-derived oracle. Cents are fixed-point so the double →
    text → double cycle is exactness-checked too (Spark writes
    shortest-roundtrip decimal representations)."""
    o = load(spark, sf_dir, "orders")["orders"]
    out = os.path.join(
        tempfile.gettempdir(),
        f"dde_csv_roundtrip_{os.path.basename(sf_dir.rstrip('/'))}",
    )
    o.select(
        "o_orderkey",
        "o_orderstatus",
        "o_totalprice",
        F.col("o_orderdate").cast("date").alias("o_orderdate"),
    ).write.mode("overwrite").option("header", "true").csv(out)
    back = (
        spark.read.option("header", "true")
        .schema(
            "o_orderkey BIGINT, o_orderstatus STRING, "
            "o_totalprice DOUBLE, o_orderdate DATE"
        )
        .csv(out)
    )
    return _roundtrip_agg(back)


@register("json_roundtrip", oracle=_ROUNDTRIP_ORACLE)
def json_roundtrip(spark, sf_dir):
    """JSON-lines sink + source (one object per line — the splittable
    layout: executors scan line-parallel, unlike a single JSON array).
    Same lossless-cycle contract as csv_roundtrip."""
    o = load(spark, sf_dir, "orders")["orders"]
    out = os.path.join(
        tempfile.gettempdir(),
        f"dde_json_roundtrip_{os.path.basename(sf_dir.rstrip('/'))}",
    )
    o.select(
        "o_orderkey",
        "o_orderstatus",
        "o_totalprice",
        F.col("o_orderdate").cast("date").alias("o_orderdate"),
    ).write.mode("overwrite").json(out)
    back = spark.read.schema(
        "o_orderkey BIGINT, o_orderstatus STRING, "
        "o_totalprice DOUBLE, o_orderdate DATE"
    ).json(out)
    return _roundtrip_agg(back)
