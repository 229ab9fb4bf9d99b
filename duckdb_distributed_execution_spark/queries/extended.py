"""Extended SQL surface: pivot/unpivot, positional unnest,
statistical aggregates, arg-min/max, conditional aggregation, math /
string / date function breadth, edit-distance dedup, forward as-of,
gap-filled resampling, and the applyInPandas sessionizer checked
against its pure-SQL twin."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from duckdb_distributed_execution_spark.functions import (
    exact_sum,
    oracle_exact_sum,
)
from duckdb_distributed_execution_spark.operators import text as X
from duckdb_distributed_execution_spark.operators.asof import asof_join
from duckdb_distributed_execution_spark.operators.zorder import oracle_zorder_key
from duckdb_distributed_execution_spark.operators.sessionize import (
    sessionize_pandas,
    sessionize_window,
)
from duckdb_distributed_execution_spark.queries import arr_str, load, register


@register(
    "pivot_returnflag",
    oracle=f"""
    SELECT l_linestatus,
           {oracle_exact_sum("CASE WHEN l_returnflag = 'A' THEN l_quantity END")} AS qty_A,
           {oracle_exact_sum("CASE WHEN l_returnflag = 'N' THEN l_quantity END")} AS qty_N,
           {oracle_exact_sum("CASE WHEN l_returnflag = 'R' THEN l_quantity END")} AS qty_R
    FROM lineitem
    GROUP BY l_linestatus
    """,
)
def pivot_returnflag(spark, sf_dir):
    """PIVOT — wide aggregation over a known value set (rewrites to
    the same conditional-aggregate plan as the oracle CASE form)."""
    li = load(spark, sf_dir, "lineitem")["lineitem"]
    p = (
        li.groupBy("l_linestatus")
        .pivot("l_returnflag", ["A", "N", "R"])
        .agg(exact_sum("l_quantity"))
    )
    return p.select(
        "l_linestatus",
        F.col("A").alias("qty_A"),
        F.col("N").alias("qty_N"),
        F.col("R").alias("qty_R"),
    )


@register(
    "unpivot_metrics",
    oracle=f"""
    WITH u AS (
      SELECT 'quantity' AS metric, l_quantity AS val FROM lineitem
      UNION ALL SELECT 'discount', l_discount FROM lineitem
      UNION ALL SELECT 'tax', l_tax FROM lineitem)
    SELECT metric, COUNT(*) AS cnt, {oracle_exact_sum('val')} AS total
    FROM u GROUP BY metric
    """,
)
def unpivot_metrics(spark, sf_dir):
    """UNPIVOT/melt — long-form metric rows from wide columns."""
    li = load(spark, sf_dir, "lineitem")["lineitem"]
    long = li.unpivot(
        [],
        [F.col("l_quantity").alias("quantity"),
         F.col("l_discount").alias("discount"),
         F.col("l_tax").alias("tax")],
        "metric",
        "val",
    )
    return long.groupBy("metric").agg(
        F.count(F.lit(1)).alias("cnt"), exact_sum("val").alias("total")
    )


@register(
    "posexplode_ordinality",
    oracle="""
    SELECT vec_id,
           CAST(generate_subscripts(embedding, 1) - 1 AS INTEGER) AS pos,
           UNNEST(embedding) AS elem
    FROM embeddings
    WHERE vec_id < 3
    """,
)
def posexplode_ordinality(spark, sf_dir):
    """UNNEST WITH ORDINALITY ≡ posexplode (0-based position)."""
    e = load(spark, sf_dir, "embeddings")["embeddings"]
    return (
        e.filter(F.col("vec_id") < 3)
        .select("vec_id", F.posexplode("embedding").alias("pos", "elem"))
    )


@register(
    "stats_aggregates",
    oracle="""
    SELECT o_orderstatus,
           ROUND(stddev_samp(o_totalprice), 4) AS sd,
           ROUND(var_samp(o_totalprice), 2) AS var,
           ROUND(covar_samp(o_totalprice, o_custkey), 2) AS cov,
           ROUND(corr(o_totalprice, o_custkey), 6) AS cor
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def stats_aggregates(spark, sf_dir):
    """Statistical aggregates. These are the one family where exact
    cross-engine equality is impossible (non-associative float
    recurrences), so outputs are rounded at precisions far above the
    O(1e-9) cross-engine drift."""
    o = load(spark, sf_dir, "orders")["orders"]
    return o.groupBy("o_orderstatus").agg(
        F.round(F.stddev_samp("o_totalprice"), 4).alias("sd"),
        F.round(F.var_samp("o_totalprice"), 2).alias("var"),
        F.round(F.covar_samp("o_totalprice", "o_custkey"), 2).alias("cov"),
        F.round(F.corr("o_totalprice", "o_custkey"), 6).alias("cor"),
    )


@register(
    "argminmax",
    oracle="""
    SELECT o_orderstatus,
           arg_min(o_totalprice, o_orderkey) AS first_order_price,
           arg_max(o_totalprice, o_orderkey) AS last_order_price,
           arg_min(o_orderkey, o_orderkey) AS first_orderkey
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def argminmax(spark, sf_dir):
    """min_by/max_by keyed on a UNIQUE column (ties on the ordering
    key would be engine-dependent)."""
    o = load(spark, sf_dir, "orders")["orders"]
    return o.groupBy("o_orderstatus").agg(
        F.min_by("o_totalprice", "o_orderkey").alias("first_order_price"),
        F.max_by("o_totalprice", "o_orderkey").alias("last_order_price"),
        F.min("o_orderkey").alias("first_orderkey"),
    )


@register(
    "conditional_agg",
    oracle=f"""
    SELECT l_returnflag,
           COUNT(CASE WHEN l_discount > 0.05 THEN 1 END) AS n_discounted,
           COUNT(CASE WHEN l_quantity >= 40 THEN 1 END) AS n_bulk,
           {oracle_exact_sum('CASE WHEN l_tax = 0 THEN l_extendedprice ELSE 0 END')}
             AS taxfree_revenue
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def conditional_agg(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")["lineitem"]
    return li.groupBy("l_returnflag").agg(
        F.count(F.when(F.col("l_discount") > 0.05, 1)).alias("n_discounted"),
        F.count(F.when(F.col("l_quantity") >= 40, 1)).alias("n_bulk"),
        exact_sum(
            F.when(F.col("l_tax") == 0, F.col("l_extendedprice")).otherwise(F.lit(0.0))
        ).alias("taxfree_revenue"),
    )


@register(
    "math_funcs",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           ABS(l_discount - 0.05) AS d_abs,
           CAST(CEIL(l_quantity / 7.0) AS BIGINT) AS d_ceil,
           CAST(FLOOR(l_extendedprice / 1000.0) AS BIGINT) AS d_floor,
           ROUND(sqrt(l_extendedprice), 6) AS d_sqrt,
           ROUND(ln(l_extendedprice), 10) AS d_ln,
           ROUND(power(l_quantity, 2.0), 4) AS d_pow,
           GREATEST(l_discount, l_tax) AS d_max2,
           LEAST(l_discount, l_tax) AS d_min2
    FROM lineitem
    WHERE l_orderkey % 97 = 0
    """,
)
def math_funcs(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")["lineitem"]
    return li.filter(F.col("l_orderkey") % 97 == 0).select(
        "l_orderkey",
        "l_linenumber",
        F.abs(F.col("l_discount") - 0.05).alias("d_abs"),
        F.ceil(F.col("l_quantity") / 7.0).alias("d_ceil"),
        F.floor(F.col("l_extendedprice") / 1000.0).alias("d_floor"),
        F.round(F.sqrt("l_extendedprice"), 6).alias("d_sqrt"),
        F.round(F.log("l_extendedprice"), 10).alias("d_ln"),
        F.round(F.pow("l_quantity", F.lit(2.0)), 4).alias("d_pow"),
        F.greatest("l_discount", "l_tax").alias("d_max2"),
        F.least("l_discount", "l_tax").alias("d_min2"),
    )


@register(
    "string_funcs_extended",
    oracle="""
    SELECT doc_id,
           replace(source, 'src', 'source_') AS replaced,
           lpad(lang, 5, '_') AS padded,
           split_part(source, 'c', 1) AS first_part,
           regexp_extract(text, '([a-z]+) ([a-z]+)', 1) AS first_word,
           reverse(lang) AS rev,
           repeat(lang, 2) AS doubled,
           contains(text, 'data') AS has_data,
           starts_with(source, 'src1') AS is_src1,
           CAST(strpos(text, 'spark') AS BIGINT) AS spark_pos
    FROM documents WHERE doc_id < 100
    """,
)
def string_funcs_extended(spark, sf_dir):
    d = load(spark, sf_dir, "documents")["documents"]
    return d.filter(F.col("doc_id") < 100).select(
        "doc_id",
        F.replace(F.col("source"), F.lit("src"), F.lit("source_")).alias("replaced"),
        F.lpad("lang", 5, "_").alias("padded"),
        F.split_part(F.col("source"), F.lit("c"), F.lit(1)).alias("first_part"),
        F.regexp_extract("text", r"([a-z]+) ([a-z]+)", 1).alias("first_word"),
        F.reverse("lang").alias("rev"),
        F.repeat("lang", 2).alias("doubled"),
        F.contains("text", F.lit("data")).alias("has_data"),
        F.startswith("source", F.lit("src1")).alias("is_src1"),
        F.instr("text", "spark").cast("long").alias("spark_pos"),
    )


@register(
    "date_arithmetic",
    oracle="""
    SELECT o_orderkey,
           CAST(o_orderdate + INTERVAL 30 DAY AS TIMESTAMP) AS due_date,
           date_diff('day', TIMESTAMP '1995-01-01', o_orderdate) AS days_since_epoch_start,
           CAST(EXTRACT(QUARTER FROM o_orderdate) AS INTEGER) AS qtr,
           CAST(EXTRACT(DOW FROM o_orderdate) + 1 AS INTEGER) AS dow,
           CAST(EXTRACT(DOY FROM o_orderdate) AS INTEGER) AS doy,
           CAST(floor(epoch(o_orderdate)) AS BIGINT) AS epoch_s,
           CAST(last_day(CAST(o_orderdate AS DATE)) AS DATE) AS month_end
    FROM orders WHERE o_orderkey % 53 = 0
    """,
)
def date_arithmetic(spark, sf_dir):
    o = load(spark, sf_dir, "orders")["orders"]
    return o.filter(F.col("o_orderkey") % 53 == 0).select(
        "o_orderkey",
        (F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")).alias("due_date"),
        F.datediff(F.col("o_orderdate"), F.lit("1995-01-01").cast("timestamp"))
        .cast("long")
        .alias("days_since_epoch_start"),
        F.quarter("o_orderdate").alias("qtr"),
        F.dayofweek("o_orderdate").alias("dow"),
        F.dayofyear("o_orderdate").alias("doy"),
        F.unix_timestamp("o_orderdate").alias("epoch_s"),
        F.last_day("o_orderdate").alias("month_end"),
    )


@register(
    "null_handling",
    oracle="""
    SELECT e.user_id,
           COALESCE(NULLIF(e.event_type, 'error'), 'recovered') AS etype,
           IFNULL(CAST(json_extract_string(e.props, '$.missing') AS VARCHAR), 'absent')
             AS missing_prop,
           CASE WHEN e.value IS NULL THEN -1 ELSE e.value END AS v
    FROM events e WHERE e.event_id < 200
    """,
)
def null_handling(spark, sf_dir):
    ev = load(spark, sf_dir, "events")["events"]
    return ev.filter(F.col("event_id") < 200).select(
        "user_id",
        F.coalesce(
            F.nullif(F.col("event_type"), F.lit("error")), F.lit("recovered")
        ).alias("etype"),
        F.ifnull(
            F.get_json_object("props", "$.missing"), F.lit("absent")
        ).alias("missing_prop"),
        F.when(F.col("value").isNull(), -1.0).otherwise(F.col("value")).alias("v"),
    )


@register(
    "limit_pushed_count",
    oracle="""
    SELECT COUNT(*) AS cnt, MIN(l_orderkey) AS min_key
    FROM (SELECT l_orderkey FROM lineitem ORDER BY l_orderkey LIMIT 1000)
    """,
)
def limit_pushed_count(spark, sf_dir):
    """LIMIT inside a subquery (the reference's scan-paging analog,
    distributed_flight_server.cpp:503-508) — deterministic via sort."""
    li = load(spark, sf_dir, "lineitem")["lineitem"]
    top = li.orderBy("l_orderkey").select("l_orderkey").limit(1000)
    return top.agg(
        F.count(F.lit(1)).alias("cnt"), F.min("l_orderkey").alias("min_key")
    )


@register(
    "dedup_levenshtein",
    oracle="""
    WITH p AS (
      SELECT doc_id, lang,
             substr(TRIM(regexp_replace(regexp_replace(LOWER(text),
                    '[^a-z0-9 ]', ' ', 'g'), '\\s+', ' ', 'g')), 1, 24) AS pfx
      FROM documents WHERE doc_id < 120)
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(levenshtein(a.pfx, b.pfx) AS BIGINT) AS dist
    FROM p a JOIN p b ON a.lang = b.lang AND a.doc_id < b.doc_id
    WHERE levenshtein(a.pfx, b.pfx) <= 12
    """,
)
def dedup_levenshtein(spark, sf_dir):
    """Edit-distance near-dup pairs on normalized 24-char prefixes,
    language-blocked (levenshtein is O(m·n) per pair — at scale it is
    strictly a verification step after cheap blocking, never the
    candidate generator)."""
    from duckdb_distributed_execution_spark.operators.text import normalize_text

    d = load(spark, sf_dir, "documents")["documents"]
    p = d.filter(F.col("doc_id") < 120).select(
        "doc_id", "lang", F.substring(normalize_text("text"), 1, 24).alias("pfx")
    )
    a = p.select(F.col("doc_id").alias("id_a"), F.col("pfx").alias("pa"), "lang")
    b = p.select(F.col("doc_id").alias("id_b"), F.col("pfx").alias("pb"), "lang")
    pairs = a.join(b, on="lang").filter(F.col("id_a") < F.col("id_b"))
    return pairs.select(
        "id_a",
        "id_b",
        F.levenshtein("pa", "pb").cast("long").alias("dist"),
    ).filter(F.col("dist") <= 12)


@register(
    "join_asof_forward",
    oracle="""
    SELECT c.event_id, c.user_id, c.ts,
           p.ts AS next_purchase_ts,
           p.value AS next_purchase_value
    FROM (SELECT * FROM events WHERE event_type = 'click') c
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
      ON c.user_id = p.user_id AND c.ts <= p.ts
    """,
)
def join_asof_forward(spark, sf_dir):
    """Forward as-of: each click matched to the user's NEXT purchase
    at-or-after it (operators/asof.py direction='forward')."""
    ev = load(spark, sf_dir, "events")["events"]
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("value").alias("next_purchase_value")
    )
    joined = asof_join(
        clicks, purchases, on="user_id", left_ts="ts", right_ts="ts",
        right_cols=["next_purchase_value"], direction="forward",
    )
    return joined.select(
        "event_id", "user_id", "ts",
        F.col("asof_ts").alias("next_purchase_ts"),
        "next_purchase_value",
    )


@register(
    "resample_gap_fill",
    oracle=f"""
    WITH grid AS (
      SELECT CAST(h AS TIMESTAMP) AS hour_start, t.event_type
      FROM range(TIMESTAMP '2024-01-01', TIMESTAMP '2024-01-08',
                 INTERVAL 1 HOUR) AS g(h)
      CROSS JOIN (SELECT DISTINCT event_type FROM events) t),
    agg AS (
      SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour_start, event_type,
             COUNT(*) AS cnt, {oracle_exact_sum('value')} AS sum_value
      FROM events
      WHERE ts >= TIMESTAMP '2024-01-01' AND ts < TIMESTAMP '2024-01-08'
      GROUP BY 1, 2)
    SELECT g.hour_start, g.event_type,
           COALESCE(a.cnt, 0) AS cnt,
           COALESCE(a.sum_value, 0.0) AS sum_value
    FROM grid g LEFT JOIN agg a
      ON g.hour_start = a.hour_start AND g.event_type = a.event_type
    """,
)
def resample_gap_fill(spark, sf_dir):
    """Time-series resampling with gap filling: a dense hour×type grid
    (sequence + explode — generated distributed, no driver loop) left
    joined to the sparse hourly aggregate, missing buckets zero-filled."""
    ev = load(spark, sf_dir, "events")["events"]
    types = ev.select("event_type").distinct()
    grid = types.select(
        "event_type",
        F.explode(
            F.sequence(
                F.lit("2024-01-01 00:00:00").cast("timestamp"),
                F.lit("2024-01-07 23:00:00").cast("timestamp"),
                F.expr("INTERVAL 1 HOUR"),
            )
        ).alias("hour_start"),
    )
    agg = (
        ev.filter(
            (F.col("ts") >= F.lit("2024-01-01").cast("timestamp"))
            & (F.col("ts") < F.lit("2024-01-08").cast("timestamp"))
        )
        .groupBy(
            F.date_trunc("hour", "ts").alias("hour_start"), F.col("event_type")
        )
        .agg(F.count(F.lit(1)).alias("cnt"), exact_sum("value").alias("sum_value"))
    )
    return grid.join(agg, on=["hour_start", "event_type"], how="left").select(
        "hour_start",
        "event_type",
        F.coalesce(F.col("cnt"), F.lit(0)).alias("cnt"),
        F.coalesce(F.col("sum_value"), F.lit(0.0)).alias("sum_value"),
    )


@register(
    "recursive_cte_walk",
    oracle="""
    WITH RECURSIVE walk(custkey, k, steps) AS (
      SELECT c_custkey, c_custkey, 0 FROM customer WHERE c_custkey BETWEEN 1 AND 12
      UNION ALL
      SELECT custkey, k * 2, steps + 1 FROM walk WHERE k * 2 <= 3000
    )
    SELECT custkey, COUNT(*) AS n_nodes, MAX(k) AS max_k, MAX(steps) AS depth
    FROM walk GROUP BY custkey
    """,
)
def recursive_cte_walk(spark, sf_dir):
    """WITH RECURSIVE ≡ driver-side fixpoint loop over distributed
    steps (operators/recursive.py): doubling walk from each seed key
    until a bound — the UNION ALL accumulation and per-seed depths
    must match DuckDB's native recursive CTE."""
    from duckdb_distributed_execution_spark.operators.recursive import recursive_cte

    c = load(spark, sf_dir, "customer")["customer"]
    seed = c.filter(F.col("c_custkey").between(1, 12)).select(
        F.col("c_custkey").alias("custkey"),
        F.col("c_custkey").alias("k"),
        F.lit(0).cast("int").alias("steps"),
    )
    walk = recursive_cte(
        seed,
        lambda f: f.select(
            "custkey", (F.col("k") * 2).alias("k"), (F.col("steps") + 1).alias("steps")
        ).filter(F.col("k") <= 3000),
        max_iterations=20,
    )
    return walk.groupBy("custkey").agg(
        F.count(F.lit(1)).alias("n_nodes"),
        F.max("k").alias("max_k"),
        F.max("steps").cast("int").alias("depth"),
    )


@register(
    "range_join_bucketed",
    oracle="""
    SELECT s.s_suppkey, COUNT(*) AS n_parts_in_window,
           MIN(p.p_partkey) AS min_part
    FROM supplier s JOIN part p
      ON p.p_retailprice >= s.s_acctbal / 10.0 - 20.0
     AND p.p_retailprice <  s.s_acctbal / 10.0 + 20.0
    GROUP BY s.s_suppkey
    """,
)
def range_join_bucketed(spark, sf_dir):
    """Interval-containment join via the bucketed range_join operator
    (PIECEWISE_MERGE_JOIN in the reference's taxonomy) — the bucket
    pre-equi-join turns an O(n·m) theta join into a hash join on
    bucket id + candidate refinement."""
    from duckdb_distributed_execution_spark.operators.asof import range_join

    t = load(spark, sf_dir, "supplier", "part")
    intervals = t["supplier"].select(
        "s_suppkey",
        (F.col("s_acctbal") / 10.0 - 20.0).alias("lo"),
        (F.col("s_acctbal") / 10.0 + 20.0).alias("hi"),
    )
    joined = range_join(
        t["part"], intervals, "p_retailprice", "lo", "hi", bucket_width=25.0
    )
    return joined.groupBy("s_suppkey").agg(
        F.count(F.lit(1)).alias("n_parts_in_window"),
        F.min("p_partkey").alias("min_part"),
    )


@register(
    "percentiles",
    oracle="""
    SELECT o_orderstatus,
           quantile_cont(o_totalprice, 0.25) AS p25,
           quantile_cont(o_totalprice, 0.5)  AS p50,
           quantile_cont(o_totalprice, 0.9)  AS p90,
           quantile_cont(o_totalprice, 0.99) AS p99
    FROM orders GROUP BY o_orderstatus
    """,
)
def percentiles(spark, sf_dir):
    """Exact linear-interpolated percentiles — Spark ``percentile``
    and DuckDB ``quantile_cont`` agree bit-for-bit (same (n−1)·p
    interpolation over the sorted values)."""
    o = load(spark, sf_dir, "orders")["orders"]
    return o.groupBy("o_orderstatus").agg(
        F.percentile("o_totalprice", 0.25).alias("p25"),
        F.percentile("o_totalprice", 0.5).alias("p50"),
        F.percentile("o_totalprice", 0.9).alias("p90"),
        F.percentile("o_totalprice", 0.99).alias("p99"),
    )


@register(
    "salted_hot_key_agg",
    headline=True,
    oracle=f"""
    SELECT event_type, COUNT(*) AS cnt,
           {oracle_exact_sum('value')} AS total,
           MAX(value) AS mx
    FROM events GROUP BY event_type
    """,
)
def salted_hot_key_agg(spark, sf_dir):
    """Skew-safe aggregation: only 5 distinct keys over all rows —
    the worst GROUP BY skew shape. Two-phase salted aggregation
    (operators/skew.py) spreads each hot key over 16 reducers; the
    oracle is the plain GROUP BY, proving the decomposition exact."""
    from duckdb_distributed_execution_spark.operators.skew import salted_aggregate

    ev = load(spark, sf_dir, "events")["events"]
    return salted_aggregate(
        ev,
        key="event_type",
        salt_source="event_id",
        partials={
            "cnt": lambda: F.count(F.lit(1)),
            "total": lambda: F.sum(
                F.round(F.col("value") * F.lit(1000000.0)).cast("long")
            ),
            "mx": lambda: F.max("value"),
        },
        finals={
            "cnt": lambda p: F.sum(p).cast("long"),
            "total": lambda p: (F.sum(p) / F.lit(1000000.0)),
            "mx": lambda p: F.max(p),
        },
        num_salts=16,
    )


_SESSION_ORACLE = """
    WITH g AS (
      SELECT user_id, ts,
             CASE WHEN epoch_us(ts)
                       - epoch_us(LAG(ts) OVER (PARTITION BY user_id
                                                ORDER BY ts, event_id))
                       > 1800 * 1000000
                  OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events),
    s AS (
      SELECT user_id, ts,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS UNBOUNDED PRECEDING) AS sess
      FROM g),
    per_sess AS (
      SELECT user_id, sess, COUNT(*) AS n FROM s GROUP BY 1, 2)
    SELECT user_id,
           COUNT(*) AS n_sessions,
           CAST(SUM(n) AS BIGINT) AS n_events,
           MAX(n) AS longest_session
    FROM per_sess GROUP BY user_id
"""


@register("sessionize_pandas_udf", oracle=_SESSION_ORACLE)
def sessionize_pandas_udf(spark, sf_dir):
    """Gap-based sessionization via applyInPandas (Arrow-batched
    grouped custom operator) — oracle is the pure-SQL window
    formulation, proving the pandas path agrees with relational
    semantics exactly."""
    ev = load(spark, sf_dir, "events")["events"]
    return sessionize_pandas(ev, "user_id", "ts", gap_seconds=1800)


@register("sessionize_window_sql", oracle=_SESSION_ORACLE, headline=True)
def sessionize_window_sql(spark, sf_dir):
    """The same sessionization as a pure window-function plan (no
    Python in the hot path — the preferred form at scale)."""
    ev = load(spark, sf_dir, "events")["events"]
    return sessionize_window(ev, "user_id", "ts", gap_seconds=1800)


@register(
    "approx_count_distinct_bound",
    oracle="""
    SELECT o_orderpriority,
           COUNT(DISTINCT o_custkey) AS exact_cnt,
           TRUE AS approx_within_5pct
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def approx_count_distinct_bound(spark, sf_dir):
    """HyperLogLog++ approximate distinct counting (sketch-merge is
    Spark-native, so the 100 TB path is one partial/final agg with
    fixed-size state instead of a distinct shuffle). The approximate
    value itself is engine-specific, so the cross-engine contract is
    the accuracy BOUND: the query emits exact counts plus a boolean
    "HLL estimate within 5% of exact", and the oracle expects TRUE —
    an estimate drifting out of tolerance hash-mismatches the gate."""
    t = load(spark, sf_dir, "orders")["orders"]
    return (
        t.groupBy("o_orderpriority")
        .agg(
            F.countDistinct("o_custkey").alias("exact_cnt"),
            F.approx_count_distinct("o_custkey", rsd=0.02).alias("approx_cnt"),
        )
        .select(
            "o_orderpriority",
            "exact_cnt",
            (
                F.abs(F.col("approx_cnt") - F.col("exact_cnt"))
                <= 0.05 * F.col("exact_cnt")
            ).alias("approx_within_5pct"),
        )
    )


@register(
    "approx_percentile_bound",
    oracle="""
    WITH r AS (
      SELECT l_returnflag AS f, l_extendedprice AS p,
             row_number() OVER (PARTITION BY l_returnflag
                                ORDER BY l_extendedprice) AS rn,
             COUNT(*) OVER (PARTITION BY l_returnflag) AS n
      FROM lineitem),
    m AS (
      SELECT f, p, n FROM r
      WHERE rn = (n + 1) // 2 OR rn = n // 2 + 1)
    SELECT f AS l_returnflag,
           CAST(ROUND(SUM(p) * (3 - COUNT(*)) * 100, 0) AS BIGINT)
             AS exact_p50_cents_x2,
           TRUE AS approx_within_1pct
    FROM m GROUP BY f
    """,
)
def approx_percentile_bound(spark, sf_dir):
    """Greenwald-Khanna approximate percentile (mergeable sketch —
    bounded state per group at any scale, vs the full sort exact
    percentiles need). Same bound-check contract as
    approx_count_distinct_bound: exact median cross-checked, the
    sketch asserted within 1% relative error.

    The exact median is emitted as INTEGER CENTS × 2 (sum of the two
    middle order statistics, doubled when they coincide): interpolated
    medians land on .xx5 boundaries where Spark (BigDecimal of the
    shortest decimal repr) and DuckDB (std::round(x*100)/100) round
    the same double differently — an integer contract has no rounding
    boundary at all. Both engines pick the middle positions with the
    same window + row_number plan."""
    t = load(spark, sf_dir, "lineitem")["lineitem"]
    r = t.select(
        F.col("l_returnflag").alias("f"), F.col("l_extendedprice").alias("p")
    ).select(
        "f",
        "p",
        F.row_number()
        .over(Window.partitionBy("f").orderBy("p"))
        .alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy("f")).alias("n"),
    )
    lo = F.floor((F.col("n") + 1) / 2)
    hi = F.floor(F.col("n") / 2) + 1
    mid = r.filter((F.col("rn") == lo) | (F.col("rn") == hi))
    exact = mid.groupBy("f").agg(
        F.round(F.sum("p") * (F.lit(3) - F.count(F.lit(1))) * 100, 0)
        .cast("bigint")
        .alias("exact_p50_cents_x2")
    )
    approx = t.groupBy(F.col("l_returnflag").alias("f")).agg(
        F.percentile("l_extendedprice", F.lit(0.5)).alias("p50"),
        F.percentile_approx(
            "l_extendedprice", F.lit(0.5), F.lit(1000)
        ).alias("ap50"),
    )
    return (
        exact.join(approx, on="f")
        .select(
            F.col("f").alias("l_returnflag"),
            "exact_p50_cents_x2",
            (
                F.abs(F.col("ap50") - F.col("p50")) <= 0.01 * F.abs(F.col("p50"))
            ).alias("approx_within_1pct"),
        )
    )


@register(
    "array_agg_sorted",
    oracle="""
    SELECT n_regionkey, array_to_string(list_sort(list(n_name)), ',') AS names
    FROM nation
    GROUP BY n_regionkey
    """,
)
def array_agg_sorted(spark, sf_dir):
    """List aggregation (DuckDB list()/array_agg): collect_list is
    partition-order-dependent, so the deterministic contract is the
    SORTED list — identical at any parallelism. Output serialized via
    arr_str (see queries/__init__) so the driver harness can hash it."""
    t = load(spark, sf_dir, "nation")["nation"]
    return t.groupBy("n_regionkey").agg(
        arr_str(F.array_sort(F.collect_list("n_name"))).alias("names")
    )


@register(
    "map_ops_agg",
    oracle="""
    WITH per AS (
      SELECT l_returnflag, l_linestatus, COUNT(*) AS cnt
      FROM lineitem GROUP BY 1, 2)
    SELECT l_returnflag,
           COUNT(*) AS n_statuses,
           string_agg(l_linestatus, ',' ORDER BY l_linestatus) AS statuses,
           MAX(CASE WHEN l_linestatus = 'O' THEN cnt END) AS cnt_o
    FROM per GROUP BY 1
    """,
)
def map_ops_agg(spark, sf_dir):
    """Map-typed columns end-to-end: per-group status→count map built
    with map_from_entries (entries pre-sorted for determinism), then
    read back via map_keys / element_at. The oracle checks the same
    observable scalars relationally — proving Spark's map semantics
    (missing key → NULL) against plain SQL."""
    t = load(spark, sf_dir, "lineitem")["lineitem"]
    per = t.groupBy("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    m = per.groupBy("l_returnflag").agg(
        F.map_from_entries(
            F.array_sort(F.collect_list(F.struct("l_linestatus", "cnt")))
        ).alias("m")
    )
    return m.select(
        "l_returnflag",
        F.size("m").alias("n_statuses"),
        F.array_join(F.map_keys("m"), ",").alias("statuses"),
        F.element_at("m", F.lit("O")).alias("cnt_o"),
    )


# ---------------------------------------------------------------------------
# String aggregation (listagg), time-range window frames, sequence
# packing — late-r1 additions.
# ---------------------------------------------------------------------------


@register(
    "string_agg_sorted",
    oracle="""
    SELECT r.r_name AS region,
           string_agg(n.n_name, ',' ORDER BY n.n_name) AS nations,
           COUNT(*) AS n_nations
    FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name
    """,
)
def string_agg_sorted(spark, sf_dir):
    """listagg/string_agg with an explicit ORDER BY inside the
    aggregate — expressed as collect_list → array_sort → array_join so
    the result is independent of partitioning (a bare string_agg is
    nondeterministic on any parallel engine)."""
    t = load(spark, sf_dir, "nation", "region")
    return (
        t["nation"]
        .join(t["region"], F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy(F.col("r_name").alias("region"))
        .agg(
            F.array_join(F.array_sort(F.collect_list("n_name")), ",").alias("nations"),
            F.count(F.lit(1)).alias("n_nations"),
        )
    )


@register(
    "window_time_range_sum",
    oracle="""
    SELECT event_id, user_id,
           COUNT(*) OVER w AS n_10m,
           (SUM(CAST(round(value * 1000000.0) AS BIGINT)) OVER w
            / 1000000.0) AS sum_10m
    FROM events
    WHERE user_id % 17 = 0
    WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts) // 1000000
                 RANGE BETWEEN 600 PRECEDING AND CURRENT ROW)
    """,
)
def window_time_range_sum(spark, sf_dir):
    """Time-based RANGE window frame: per-user rolling 10-minute event
    count and exact sum.  The frame is keyed on integer epoch seconds
    (RANGE peers = same second, identical in both engines) and the
    rolling sum uses scaled-long fixed point so segment-tree vs
    sliding-accumulator evaluation order cannot drift."""
    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events")["events"].filter(F.col("user_id") % 17 == 0)
    sec = F.unix_timestamp("ts")
    w = (
        Window.partitionBy("user_id")
        .orderBy(sec)
        .rangeBetween(-600, Window.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.count(F.lit(1)).over(w).alias("n_10m"),
        (F.sum(F.round(F.col("value") * F.lit(1000000.0)).cast("long")).over(w)
         / F.lit(1000000.0)).alias("sum_10m"),
    )


_PACK_CAPACITY = 2048
_PACK_BUCKETS = 8


@register(
    "pack_sequences",
    oracle=f"""
    WITH t AS (
      SELECT doc_id,
             CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT)
               AS h,
             CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT)
               AS n_tok
      FROM documents),
    b AS (
      SELECT doc_id, h % {_PACK_BUCKETS} AS bucket, n_tok,
             SUM(n_tok) OVER (PARTITION BY h % {_PACK_BUCKETS}
                              ORDER BY h, doc_id
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND CURRENT ROW) AS cum
      FROM t)
    SELECT doc_id, bucket,
           CAST((cum - n_tok) // {_PACK_CAPACITY} AS BIGINT) AS chunk_id,
           CAST((cum - n_tok) % {_PACK_CAPACITY} AS BIGINT) AS chunk_offset
    FROM b
    """,
)
def pack_sequences(spark, sf_dir):
    """Deterministic sequence packing into fixed-capacity context
    windows (streaming-concat semantics: documents are laid out in a
    pseudorandom but reproducible hash order and split at every
    2048-token boundary).  Packing runs independently inside each of
    N hash buckets, so parallelism scales with the bucket count while
    every (doc → chunk, offset) assignment stays engine- and
    partitioning-independent."""
    from pyspark.sql import Window

    from duckdb_distributed_execution_spark.operators.dedup import hash60

    d = load(spark, sf_dir, "documents")["documents"]
    t = d.select(
        "doc_id",
        hash60(F.col("doc_id").cast("string")).alias("h"),
        X.token_count("text").alias("n_tok"),
    ).withColumn("bucket", F.col("h") % _PACK_BUCKETS)
    w = (
        Window.partitionBy("bucket")
        .orderBy("h", "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    start = F.sum("n_tok").over(w) - F.col("n_tok")
    return t.select(
        "doc_id",
        "bucket",
        (start / F.lit(_PACK_CAPACITY)).cast("long").alias("chunk_id"),
        (start % F.lit(_PACK_CAPACITY)).cast("long").alias("chunk_offset"),
    )


@register(
    "zorder_clustering",
    oracle=f"""
    WITH mx AS (
      SELECT MAX(o_custkey) AS m1, MAX(o_orderkey) AS m2 FROM orders),
    k AS (
      SELECT o_orderkey, o_custkey,
             {oracle_zorder_key(['o_custkey', 'o_orderkey'], ['mx.m1', 'mx.m2'])} AS zk
      FROM orders, mx)
    SELECT CAST(zk >> 34 AS BIGINT) AS zbucket,
           COUNT(*) AS n,
           MAX(o_custkey) - MIN(o_custkey) AS custkey_span,
           MAX(o_orderkey) - MIN(o_orderkey) AS orderkey_span
    FROM k GROUP BY 1
    """,
)
def zorder_clustering(spark, sf_dir):
    """Morton/Z-order clustering key over (o_custkey, o_orderkey) with
    data-derived bounds (cross-joined MAX — table statistics, no
    driver collect): bucketing by the key's high bits yields tight
    bounding boxes in BOTH dimensions simultaneously — the min/max
    spans per bucket are what parquet zone maps would prune on after
    an OPTIMIZE ZORDER rewrite (the lakehouse analog of the
    reference's CREATE INDEX, SURVEY §2.A5)."""
    from duckdb_distributed_execution_spark.operators.zorder import zorder_key

    o = load(spark, sf_dir, "orders")["orders"]
    mx = o.agg(
        F.max("o_custkey").alias("m1"), F.max("o_orderkey").alias("m2")
    )
    k = o.crossJoin(F.broadcast(mx)).select(
        zorder_key(
            [F.col("o_custkey"), F.col("o_orderkey")],
            [F.col("m1"), F.col("m2")],
        ).alias("zk"),
        "o_custkey",
        "o_orderkey",
    )
    return k.groupBy(F.shiftright("zk", 34).cast("long").alias("zbucket")).agg(
        F.count(F.lit(1)).alias("n"),
        (F.max("o_custkey") - F.min("o_custkey")).alias("custkey_span"),
        (F.max("o_orderkey") - F.min("o_orderkey")).alias("orderkey_span"),
    )


_PROFILE_COLS = ("l_quantity", "l_extendedprice", "l_discount", "l_tax")


@register(
    "profile_columns",
    oracle=" UNION ALL ".join(
        f"""
    SELECT '{c}' AS col, COUNT(*) AS n, COUNT({c}) AS n_nonnull,
           COUNT(DISTINCT {c}) AS n_distinct,
           MIN({c}) AS min_val, MAX({c}) AS max_val
    FROM lineitem"""
        for c in _PROFILE_COLS
    ),
)
def profile_columns(spark, sf_dir):
    """SUMMARIZE-style column profile (count/nulls/distinct/min/max
    per column) in ONE scan: all per-column aggregates run in a single
    grouped pass, then melt to long form — never N scans of a 100 TB
    table."""
    li = load(spark, sf_dir, "lineitem")["lineitem"]
    aggs = []
    for c in _PROFILE_COLS:
        aggs += [
            F.count(F.lit(1)).alias(f"{c}__n"),
            F.count(c).alias(f"{c}__nn"),
            F.countDistinct(c).alias(f"{c}__nd"),
            F.min(c).alias(f"{c}__min"),
            F.max(c).alias(f"{c}__max"),
        ]
    wide = li.agg(*aggs)
    parts = [
        wide.select(
            F.lit(c).alias("col"),
            F.col(f"{c}__n").alias("n"),
            F.col(f"{c}__nn").alias("n_nonnull"),
            F.col(f"{c}__nd").alias("n_distinct"),
            F.col(f"{c}__min").alias("min_val"),
            F.col(f"{c}__max").alias("max_val"),
        )
        for c in _PROFILE_COLS
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


_HIST_BINS = 20


@register(
    "histogram_bins",
    oracle=f"""
    WITH mx AS (
      SELECT MIN(o_totalprice) AS lo, MAX(o_totalprice) AS hi FROM orders),
    b AS (
      SELECT LEAST(CAST(FLOOR((o_totalprice - lo)
                              / ((hi - lo) / {_HIST_BINS}.0)) AS BIGINT),
                   {_HIST_BINS - 1}) AS bin
      FROM orders, mx)
    SELECT bin, COUNT(*) AS n FROM b GROUP BY bin
    """,
)
def histogram_bins(spark, sf_dir):
    """Equi-width histogram with data-derived bounds (broadcast scalar
    min/max; identical double expression both engines so bin edges
    agree bit-for-bit)."""
    o = load(spark, sf_dir, "orders")["orders"]
    mx = o.agg(
        F.min("o_totalprice").alias("lo"), F.max("o_totalprice").alias("hi")
    )
    width = (F.col("hi") - F.col("lo")) / F.lit(float(_HIST_BINS))
    b = o.crossJoin(F.broadcast(mx)).select(
        F.least(
            F.floor((F.col("o_totalprice") - F.col("lo")) / width).cast("long"),
            F.lit(_HIST_BINS - 1).cast("long"),
        ).alias("bin")
    )
    return b.groupBy("bin").agg(F.count(F.lit(1)).alias("n"))


@register(
    "funnel_conversion",
    oracle="""
    WITH clicks AS (
      SELECT user_id, MIN(ts) AS first_click
      FROM events WHERE event_type = 'click' GROUP BY user_id),
    conv AS (
      SELECT c.user_id, c.first_click, MIN(e.ts) AS first_purchase
      FROM clicks c
      LEFT JOIN events e
        ON e.user_id = c.user_id AND e.event_type = 'purchase'
       AND e.ts > c.first_click
      GROUP BY c.user_id, c.first_click)
    SELECT COUNT(*) AS n_clickers,
           COUNT(first_purchase) AS n_converted,
           CAST(COUNT(CASE WHEN first_purchase IS NOT NULL
                            AND first_purchase <= first_click
                                + INTERVAL 1 HOUR THEN 1 END)
                AS BIGINT) AS n_converted_1h
    FROM conv
    """,
)
def funnel_conversion(spark, sf_dir):
    """Funnel analysis: click → later purchase conversion, total and
    within one hour.  First-touch timestamps reduce each side to one
    row per user BEFORE the join, so the join input is |users|, not
    |events| — the shape that keeps funnels tractable on 100 TB event
    logs."""
    ev = load(spark, sf_dir, "events")["events"]
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_click"))
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("pts")
    )
    conv = (
        clicks.join(purchases, "user_id", "left")
        .filter(F.col("pts").isNull() | (F.col("pts") > F.col("first_click")))
        .groupBy("user_id", "first_click")
        .agg(F.min("pts").alias("first_purchase"))
    )
    return conv.agg(
        F.count(F.lit(1)).alias("n_clickers"),
        F.count("first_purchase").alias("n_converted"),
        F.count(
            F.when(
                F.col("first_purchase")
                <= F.col("first_click") + F.expr("INTERVAL 1 HOUR"),
                1,
            )
        ).cast("long").alias("n_converted_1h"),
    )


@register(
    "cohort_retention_week5",
    oracle="""
    WITH first_seen AS (
      SELECT user_id,
             CAST(date_trunc('week', MIN(ts)) AS TIMESTAMP) AS cohort_week
      FROM events GROUP BY user_id),
    activity AS (
      SELECT DISTINCT e.user_id,
             CAST(date_trunc('week', e.ts) AS TIMESTAMP) AS act_week
      FROM events e)
    SELECT f.cohort_week,
           date_diff('week', f.cohort_week, a.act_week) AS week_offset,
           COUNT(*) AS n_active
    FROM first_seen f
    JOIN activity a ON f.user_id = a.user_id
    WHERE date_diff('week', f.cohort_week, a.act_week) <= 4
    GROUP BY f.cohort_week, week_offset
    """,
)
def cohort_retention_week5(spark, sf_dir):
    """Cohort retention (first-5-weeks window, timestamp-grain cohort
    key): users grouped by first-seen week, counted in each of their
    first 5 activity weeks. Both sides pre-aggregate to (user, week)
    grain before joining. Registered as the _week5 variant: the weekly
    full-horizon twin lives in pipeline14.py — this one silently
    SHADOWED it for rounds until register() learned to raise on
    duplicates (round 5)."""
    ev = load(spark, sf_dir, "events")["events"]
    wk = lambda c: F.date_trunc("week", c)  # noqa: E731
    first_seen = ev.groupBy("user_id").agg(wk(F.min("ts")).alias("cohort_week"))
    activity = ev.select(
        "user_id", wk(F.col("ts")).alias("act_week")
    ).distinct()
    offset = (
        F.datediff(F.col("act_week"), F.col("cohort_week")) / 7
    ).cast("long")
    return (
        first_seen.join(activity, "user_id")
        .select("cohort_week", offset.alias("week_offset"))
        .filter(F.col("week_offset") <= 4)
        .groupBy("cohort_week", "week_offset")
        .agg(F.count(F.lit(1)).alias("n_active"))
    )


@register(
    "event_sequence_match",
    oracle="""
    WITH s1 AS (
      SELECT user_id, MIN(ts) AS t1 FROM events
      WHERE event_type = 'signup' GROUP BY user_id),
    s2 AS (
      SELECT s1.user_id, s1.t1, MIN(e.ts) AS t2
      FROM s1 JOIN events e
        ON e.user_id = s1.user_id AND e.event_type = 'click' AND e.ts > s1.t1
      GROUP BY s1.user_id, s1.t1),
    s3 AS (
      SELECT s2.user_id, s2.t1, s2.t2, MIN(e.ts) AS t3
      FROM s2 JOIN events e
        ON e.user_id = s2.user_id AND e.event_type = 'purchase'
       AND e.ts > s2.t2
      GROUP BY s2.user_id, s2.t1, s2.t2)
    SELECT user_id, t1, t2, t3 FROM s3
    """,
)
def event_sequence_match(spark, sf_dir):
    """Ordered sequence-pattern matching (MATCH_RECOGNIZE shape):
    users who signup, then click, then purchase, with the earliest
    completion timestamps.  Each step joins the previous step's
    one-row-per-user frontier against a filtered event slice — the
    frontier stays |users|-sized through the whole chain."""
    ev = load(spark, sf_dir, "events")["events"]

    def first_after(frontier, etype, prev_ts, out_ts):
        step = ev.filter(F.col("event_type") == etype).select(
            "user_id", F.col("ts").alias("_ts")
        )
        return (
            frontier.join(step, "user_id")
            .filter(F.col("_ts") > F.col(prev_ts))
            .groupBy(*frontier.columns)
            .agg(F.min("_ts").alias(out_ts))
        )

    s1 = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    s2 = first_after(s1, "click", "t1", "t2")
    s3 = first_after(s2, "purchase", "t2", "t3")
    return s3.select("user_id", "t1", "t2", "t3")


@register(
    "approx_top_k_types",
    oracle="""
    SELECT event_type AS item, COUNT(*) AS cnt
    FROM events GROUP BY event_type
    """,
)
def approx_top_k_types(spark, sf_dir):
    """Heavy-hitters sketch (Spark 4 approx_top_k).  With k ≥ the
    true distinct count the sketch tracks every item exactly, so the
    exploded (item, count) set equals the exact aggregation — same
    accuracy-bound oracle pattern as the HLL/GK queries."""
    load(spark, sf_dir, "events")
    return spark.sql("""
        SELECT t.item AS item, t.count AS cnt
        FROM (SELECT explode(approx_top_k(event_type, 16)) AS t FROM events)
    """)
