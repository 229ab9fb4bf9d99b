"""SQL-surface breadth, second batch: FILTER-clause aggregates,
correlated scalar subqueries, null-aware NOT IN, UNION BY NAME,
windowed z-score normalization, TRY_CAST error handling, and
mergeable HLL sketches (partition-local sketch → union — the shape a
100 TB pre-aggregation pipeline stores and re-merges).

The reference delegates all of this surface to DuckDB per node
(SURVEY.md §2.B, query_plan_analyzer.cpp:118-163); here each is a
declarative Catalyst plan, distributed by construction.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from duckdb_distributed_execution_spark.queries import load, register


@register(
    "agg_filter_clause",
    oracle="""
    SELECT l_returnflag,
           COUNT(*) FILTER (WHERE l_discount > 0.05) AS n_discounted,
           SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT))
               FILTER (WHERE l_quantity >= 25) AS bulk_cents,
           COUNT(DISTINCT l_suppkey) FILTER (WHERE l_tax = 0) AS notax_supps
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_filter_clause(spark, sf_dir):
    """SQL:2003 FILTER clause on aggregates — per-aggregate predicates
    in one grouped pass (one scan, one shuffle; the alternative of N
    filtered self-joins would be N scans). Money in fixed-point cents
    for cross-engine exactness."""
    load(spark, sf_dir, "lineitem")
    return spark.sql("""
        SELECT l_returnflag,
               COUNT(*) FILTER (WHERE l_discount > 0.05) AS n_discounted,
               SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT))
                   FILTER (WHERE l_quantity >= 25) AS bulk_cents,
               COUNT(DISTINCT l_suppkey) FILTER (WHERE l_tax = 0)
                   AS notax_supps
        FROM lineitem
        GROUP BY l_returnflag
    """)


@register(
    "correlated_scalar_subquery",
    oracle="""
    SELECT o.o_orderkey,
           CAST(ROUND(o.o_totalprice * 100) AS BIGINT) AS price_cents
    FROM orders o
    WHERE o.o_totalprice > 2 * (
        SELECT AVG(o2.o_totalprice) FROM orders o2
        WHERE o2.o_custkey = o.o_custkey
    )
    ORDER BY o.o_orderkey
    LIMIT 100
    """,
)
def correlated_scalar_subquery(spark, sf_dir):
    """Correlated scalar subquery (per-customer average) — Catalyst
    decorrelates it into one grouped aggregate + equi-join, so the
    'per-row subquery' costs a single shuffle on o_custkey instead of
    O(n) repeated scans. The 2× guard keeps the comparison away from
    float-equality boundaries (AVG-of-doubles drift is O(1e-9);
    prices are O(1e4) and discrete at cent granularity)."""
    load(spark, sf_dir, "orders")
    return spark.sql("""
        SELECT o.o_orderkey,
               CAST(ROUND(o.o_totalprice * 100) AS BIGINT) AS price_cents
        FROM orders o
        WHERE o.o_totalprice > 2 * (
            SELECT AVG(o2.o_totalprice) FROM orders o2
            WHERE o2.o_custkey = o.o_custkey
        )
        ORDER BY o.o_orderkey
        LIMIT 100
    """)


@register(
    "not_in_null_aware",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer
    WHERE c_custkey NOT IN (
        SELECT CASE WHEN o_totalprice > 100000 THEN o_custkey END
        FROM orders
    )
    ORDER BY c_custkey
    """,
)
def not_in_null_aware(spark, sf_dir):
    """Null-aware anti join: NOT IN over a subquery that produces
    NULLs. Three-valued logic makes the whole result empty if any NULL
    is present UNLESS the engine implements null-aware semantics
    exactly (Spark plans NullAwareAntiJoin / BroadcastNestedLoopJoin;
    naive hash-anti-join would wrongly return rows). The CASE
    guarantees NULLs exist in the list, so a semantics bug flips the
    row count — a sharp oracle."""
    load(spark, sf_dir, "customer", "orders")
    return spark.sql("""
        SELECT c_custkey, c_name
        FROM customer
        WHERE c_custkey NOT IN (
            SELECT CASE WHEN o_totalprice > 100000 THEN o_custkey END
            FROM orders
        )
        ORDER BY c_custkey
    """)


@register(
    "union_by_name",
    oracle="""
    SELECT k, region_name, src FROM (
        SELECT r_regionkey AS k, r_name AS region_name, 'r' AS src
        FROM region
        UNION ALL BY NAME
        SELECT 'n' AS src, n_name AS region_name, n_nationkey + 100 AS k
        FROM nation
    )
    """,
)
def union_by_name(spark, sf_dir):
    """UNION ALL BY NAME — column alignment by name, not position
    (schema-evolution-friendly appends: late files with reordered
    columns still union correctly). unionByName in the DataFrame
    API."""
    t = load(spark, sf_dir, "region", "nation")
    a = t["region"].select(
        F.col("r_regionkey").cast("long").alias("k"),
        F.col("r_name").alias("region_name"),
        F.lit("r").alias("src"),
    )
    b = t["nation"].select(
        F.lit("n").alias("src"),
        F.col("n_name").alias("region_name"),
        (F.col("n_nationkey") + 100).cast("long").alias("k"),
    )
    return a.unionByName(b)


@register(
    "window_zscore",
    oracle="""
    SELECT o_orderkey,
           ROUND((o_totalprice - AVG(o_totalprice) OVER w)
                 / stddev_samp(o_totalprice) OVER w, 4) AS z
    FROM orders
    WINDOW w AS (PARTITION BY o_orderstatus)
    QUALIFY ABS(z) > 1.5
    ORDER BY o_orderkey
    """,
)
def window_zscore(spark, sf_dir):
    """Per-group z-score normalization (feature scaling without a
    separate stats pass): whole-partition window avg/stddev, then a
    QUALIFY-style outlier filter. One shuffle on the group key; the
    window frame is the entire partition so state is two scalars per
    group. Rounded to 4 decimals (variance recurrences are the known
    non-associative family); the |z|>1.5 cut sits away from any
    rounding boundary."""
    o = load(spark, sf_dir, "orders")["orders"]
    w = Window.partitionBy("o_orderstatus")
    z = F.round(
        (F.col("o_totalprice") - F.avg("o_totalprice").over(w))
        / F.stddev_samp("o_totalprice").over(w),
        4,
    )
    return (
        o.select("o_orderkey", z.alias("z"))
        .filter(F.abs(F.col("z")) > 1.5)
        .orderBy("o_orderkey")
    )


@register(
    "try_cast_handling",
    oracle="""
    SELECT doc_id,
           TRY_CAST(token AS INTEGER) AS as_int,
           TRY_CAST(CASE WHEN token LIKE '%-%' THEN token END AS DATE)
             AS as_date,
           COALESCE(TRY_CAST(token AS INTEGER), -1) AS with_default
    FROM (
        SELECT doc_id,
               CASE doc_id % 4
                   WHEN 0 THEN CAST(doc_id AS VARCHAR)
                   WHEN 1 THEN 'not-a-number'
                   WHEN 2 THEN '2021-02-30'
                   ELSE '1999-12-31'
               END AS token
        FROM documents
    )
    WHERE doc_id % 7 = 0
    """,
)
def try_cast_handling(spark, sf_dir):
    """TRY_CAST: malformed values become NULL instead of failing the
    job — at 100 TB a single dirty row must not kill a stage, and a
    try-cast + COALESCE default is the idiomatic quarantine pattern.
    Covers numeric garbage and an impossible calendar date (Feb 30).
    Bare integers are excluded from the DATE cast on both sides:
    engines legitimately disagree on whether '1008' is a year (Spark
    yes, DuckDB no), so a portable pipeline must disambiguate."""
    load(spark, sf_dir, "documents")
    return spark.sql("""
        SELECT doc_id,
               TRY_CAST(token AS INTEGER) AS as_int,
               TRY_CAST(CASE WHEN token LIKE '%-%' THEN token END AS DATE)
             AS as_date,
               COALESCE(TRY_CAST(token AS INTEGER), -1) AS with_default
        FROM (
            SELECT doc_id,
                   CASE doc_id % 4
                       WHEN 0 THEN CAST(doc_id AS STRING)
                       WHEN 1 THEN 'not-a-number'
                       WHEN 2 THEN '2021-02-30'
                       ELSE '1999-12-31'
                   END AS token
            FROM documents
        )
        WHERE doc_id % 7 = 0
    """)


@register(
    "hll_sketch_mergeable",
    oracle="""
    WITH exact_per AS (
        SELECT o_orderpriority,
               COUNT(DISTINCT o_custkey) AS exact_nd
        FROM orders GROUP BY o_orderpriority
    ), exact_all AS (
        SELECT COUNT(DISTINCT o_custkey) AS exact_total FROM orders
    )
    SELECT p.o_orderpriority, p.exact_nd, a.exact_total
    FROM exact_per p CROSS JOIN exact_all a
    """,
)
def hll_sketch_mergeable(spark, sf_dir):
    """Mergeable distinct-count sketches (Apache DataSketches HLL):
    build one sketch per priority group, then UNION the per-group
    sketches and re-estimate the global cardinality — the two-level
    rollup a 100 TB pipeline persists (per-partition sketch bytes,
    re-merged at query time; never re-scanning raw data). The sketch
    estimate is engine-specific, so the query returns the EXACT
    per-group and merged-global distinct counts after asserting the
    sketch estimates are within 5% of them — hash-matching the
    all-exact oracle proves both the sketch pipeline and the bound.

    Reference has nothing like this; its COUNT(DISTINCT) path
    re-aggregates raw values through a temp table
    (result_merger.cpp:56-139)."""
    o = load(spark, sf_dir, "orders")["orders"]
    per = o.groupBy("o_orderpriority").agg(
        F.hll_sketch_agg("o_custkey").alias("sk"),
        F.count_distinct("o_custkey").alias("exact_nd"),
    )
    merged = per.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est_total")
    )
    exact_all = o.agg(F.count_distinct("o_custkey").alias("exact_total"))
    out = (
        per.select(
            "o_orderpriority",
            "exact_nd",
            F.hll_sketch_estimate("sk").alias("est_nd"),
        )
        .crossJoin(F.broadcast(merged))
        .crossJoin(F.broadcast(exact_all))
    )
    ok = (
        (F.abs(F.col("est_nd") - F.col("exact_nd"))
         <= 0.05 * F.col("exact_nd") + 1)
        & (F.abs(F.col("est_total") - F.col("exact_total"))
           <= 0.05 * F.col("exact_total") + 1)
    )
    return out.filter(ok).select(
        "o_orderpriority", "exact_nd", "exact_total"
    )


@register(
    "group_by_all",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           COUNT(*) AS n,
           SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS cents
    FROM lineitem
    GROUP BY ALL
    """,
)
def group_by_all(spark, sf_dir):
    """GROUP BY ALL — group on every non-aggregate select column
    (identical convenience syntax in both engines)."""
    load(spark, sf_dir, "lineitem")
    return spark.sql("""
        SELECT l_returnflag, l_linestatus,
               COUNT(*) AS n,
               SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS cents
        FROM lineitem
        GROUP BY ALL
    """)


@register(
    "select_exclude_replace",
    oracle="""
    SELECT * EXCLUDE (n_regionkey)
             REPLACE (upper(n_name) AS n_name)
    FROM nation
    """,
)
def select_exclude_replace(spark, sf_dir):
    """DuckDB's SELECT * EXCLUDE/REPLACE projection sugar, expressed
    with the DataFrame API's drop + withColumn — same observable
    schema and rows; still a pure column-pruned projection."""
    n = load(spark, sf_dir, "nation")["nation"]
    return n.drop("n_regionkey").withColumn("n_name", F.upper("n_name"))


@register(
    "distinct_on",
    oracle="""
    SELECT DISTINCT ON (o_custkey)
           o_custkey, o_orderkey, o_totalprice
    FROM orders
    ORDER BY o_custkey, o_orderdate DESC, o_orderkey DESC
    """,
)
def distinct_on(spark, sf_dir):
    """DISTINCT ON (k) ... ORDER BY k, tiebreak — latest order per
    customer. DuckDB keeps the first row per key under the ORDER BY;
    Spark expresses the identical contract as a row_number window with
    the same ordering. One shuffle on the key; at scale this beats the
    global sort DISTINCT ON implies (the per-key top-1 never
    materializes a total order)."""
    from pyspark.sql import Window

    o = load(spark, sf_dir, "orders")["orders"]
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_orderdate"), F.desc("o_orderkey")
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("o_custkey", "o_orderkey", "o_totalprice")
    )


@register(
    "inline_values_join",
    oracle="""
    SELECT v.tier, COUNT(*) AS n_orders
    FROM orders o
    JOIN (VALUES ('1-URGENT', 'hot'), ('2-HIGH', 'hot'),
                 ('3-MEDIUM', 'warm'), ('4-NOT SPECIFIED', 'cold'),
                 ('5-LOW', 'cold')) AS v(pri, tier)
      ON o.o_orderpriority = v.pri
    GROUP BY v.tier
    """,
)
def inline_values_join(spark, sf_dir):
    """Inline VALUES relation joined to a fact table — the idiomatic
    small-lookup enrichment. The literal relation is driver-local and
    broadcast by Catalyst: zero shuffle on the fact side."""
    load(spark, sf_dir, "orders")
    return spark.sql("""
        SELECT v.tier, COUNT(*) AS n_orders
        FROM orders o
        JOIN (VALUES ('1-URGENT', 'hot'), ('2-HIGH', 'hot'),
                     ('3-MEDIUM', 'warm'), ('4-NOT SPECIFIED', 'cold'),
                     ('5-LOW', 'cold')) AS v(pri, tier)
          ON o.o_orderpriority = v.pri
        GROUP BY v.tier
    """)


@register(
    "table_checksum",
    oracle="""
    SELECT COUNT(*) AS n_rows,
           bit_xor(CAST('0x' || substr(md5(
               CAST(l_orderkey AS VARCHAR) || '|' ||
               CAST(l_linenumber AS VARCHAR) || '|' ||
               l_returnflag || '|' ||
               CAST(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                    AS VARCHAR)), 1, 15) AS BIGINT)) AS row_xor,
           SUM(CAST('0x' || substr(md5(
               CAST(l_orderkey AS VARCHAR) || '|' ||
               CAST(l_linenumber AS VARCHAR)), 1, 15) AS BIGINT)
               % 1073741824) AS key_sum
    FROM lineitem
    """,
)
def table_checksum(spark, sf_dir):
    """Order-independent table checksum: XOR and SUM of per-row
    content hashes. THE tool for verifying a 100 TB copy/migration
    without sorting either side — one scan per replica, commutative
    combine, O(1) result to compare; any dropped/duplicated/mutated
    row flips it. (The reference's failed-worker silent row drop,
    SURVEY §4.3 #6, is exactly the corruption this detects.)"""
    from duckdb_distributed_execution_spark.operators.dedup import hash60

    li = load(spark, sf_dir, "lineitem")["lineitem"]
    content = F.concat_ws(
        "|",
        F.col("l_orderkey").cast("string"),
        F.col("l_linenumber").cast("string"),
        F.col("l_returnflag"),
        F.round(F.col("l_extendedprice") * 100).cast("bigint").cast("string"),
    )
    key = F.concat_ws(
        "|",
        F.col("l_orderkey").cast("string"),
        F.col("l_linenumber").cast("string"),
    )
    # Key-hash sum folds to 30 bits first: a 64-bit SUM of 60-bit
    # hashes overflows Spark's long (DuckDB silently widens to
    # HUGEINT); 30-bit terms keep ~2^33 rows exact in both engines.
    return li.agg(
        F.count("*").alias("n_rows"),
        F.bit_xor(hash60(content)).alias("row_xor"),
        F.sum(hash60(key) % 1073741824).alias("key_sum"),
    )


@register(
    "window_count_distinct",
    oracle="""
    SELECT o_custkey, o_orderkey,
           COUNT(DISTINCT o_orderpriority)
               OVER (PARTITION BY o_custkey) AS n_priorities
    FROM orders
    WHERE o_custkey % 40 = 1
    ORDER BY o_custkey, o_orderkey
    """,
)
def window_count_distinct(spark, sf_dir):
    """COUNT(DISTINCT) over a window — unsupported directly in Spark
    SQL windows, expressed as size(collect_set() OVER w): identical
    semantics (set cardinality per partition), one shuffle on the
    window key. State per group is the distinct set, bounded here by
    the 5-value priority domain — the pattern to AVOID on unbounded
    domains at scale (use approx sketches there)."""
    from pyspark.sql import Window

    o = load(spark, sf_dir, "orders")["orders"]
    w = Window.partitionBy("o_custkey")
    return (
        o.filter(F.col("o_custkey") % 40 == 1)
        .select(
            "o_custkey",
            "o_orderkey",
            F.size(F.collect_set("o_orderpriority").over(w))
            .cast("long")
            .alias("n_priorities"),
        )
        .orderBy("o_custkey", "o_orderkey")
    )


@register(
    "share_of_total",
    oracle="""
    WITH g AS (
        SELECT l_returnflag || '/' || l_linestatus AS grp,
               SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS cents
        FROM lineitem
        GROUP BY 1
    )
    SELECT grp, cents,
           ROUND(cents * 10000 / SUM(cents) OVER (), 0) AS share_bp
    FROM g
    ORDER BY grp
    """,
)
def share_of_total(spark, sf_dir):
    """Share-of-total (percent-of-whole in basis points): grouped sum
    + an empty-frame window over the 6-row aggregate — the global
    total never touches the fact table twice. Integer basis points via
    exact cents, so no float division drift."""
    from pyspark.sql import Window

    li = load(spark, sf_dir, "lineitem")["lineitem"]
    g = li.groupBy(
        F.concat_ws("/", "l_returnflag", "l_linestatus").alias("grp")
    ).agg(
        F.sum(F.round(F.col("l_extendedprice") * 100).cast("bigint")).alias(
            "cents"
        )
    )
    return g.select(
        "grp",
        "cents",
        F.round(
            F.col("cents") * 10000 / F.sum("cents").over(Window.partitionBy()),
            0,
        ).alias("share_bp"),
    ).orderBy("grp")
