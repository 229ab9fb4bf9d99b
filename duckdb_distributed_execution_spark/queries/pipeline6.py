"""Sixth-wave operators — BM25 retrieval ranking, count-min sketch
frequency estimation, positional join, degree-ordered triangle
counting, bucketed 2-D skyline, Bloom-prefiltered join, nearest-
direction as-of join, and an end-to-end DuckDB-dialect query routed
through the transpiler.

None of these exist in the reference (its SQL surface is SURVEY
§2.C); they extend the engine along the same north-star axes as the
other pipeline modules — corpus retrieval, sketch-based estimation at
100 TB, and join strategies that avoid shuffling the big side. Every
query is oracle-checked: the DuckDB SQL mirrors the exact
construction (same md5-derived hashing, same float operation order,
scores rounded before ranking, integer arithmetic wherever an exact
cross-engine contract is cheap).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from duckdb_distributed_execution_spark.functions import local_rows_df
from duckdb_distributed_execution_spark.operators import text as X
from duckdb_distributed_execution_spark.operators.asof import asof_join
from duckdb_distributed_execution_spark.operators.rowid import (
    assign_stable_row_ids,
)
from duckdb_distributed_execution_spark.queries import load, register

_WS = r"\s+"


def _tok_oracle(expr: str = "text") -> str:
    return f"regexp_split_to_array({X.oracle_normalize(expr)}, '{_WS}')"


def _h(col, salt, mod: int):
    """Deterministic bucket hash shared with the oracles: first 7 hex
    chars of md5(salt || ':' || value) as an integer, mod ``mod``.
    ``salt`` may be a Column for per-row salts (CMS hash rows)."""
    s = salt if not isinstance(salt, str) else F.lit(salt)
    key = F.concat(s.cast("string"), F.lit(":"), col.cast("string"))
    return F.conv(F.substring(F.md5(key), 1, 7), 16, 10).cast("long") % mod


def _oh(expr: str, salt_expr: str, mod: int) -> str:
    """DuckDB mirror of ``_h`` (salt_expr is a SQL expression)."""
    return (
        f"CAST('0x' || substr(md5(CAST({salt_expr} AS VARCHAR) || ':' || "
        f"CAST({expr} AS VARCHAR)), 1, 7) AS BIGINT) % {mod}"
    )


# ---------------------------------------------------------------------------
# Count-min sketch frequency estimation
# ---------------------------------------------------------------------------

_CMS_D = 4  # depth — independent hash rows
_CMS_W = 512  # width — buckets per row


@register(
    "cms_heavy_hitters",
    oracle=f"""
    WITH it AS (SELECT l_partkey AS k FROM lineitem),
    exact AS (SELECT k, COUNT(*) AS exact_cnt FROM it GROUP BY k),
    js AS (SELECT unnest([0,1,2,3]) AS j),
    sketch AS (
      SELECT j, {_oh('k', "'cms' || CAST(j AS VARCHAR)", _CMS_W)} AS bucket,
             COUNT(*) AS cnt
      FROM it CROSS JOIN js GROUP BY 1, 2),
    top AS (SELECT k, exact_cnt FROM exact ORDER BY exact_cnt DESC, k LIMIT 10),
    probe AS (
      SELECT t.k, t.exact_cnt, js.j,
             {_oh('t.k', "'cms' || CAST(js.j AS VARCHAR)", _CMS_W)} AS bucket
      FROM top t CROSS JOIN js)
    SELECT p.k AS l_partkey, p.exact_cnt, MIN(s.cnt) AS cms_est,
           MIN(s.cnt) - p.exact_cnt AS overcount
    FROM probe p JOIN sketch s ON s.j = p.j AND s.bucket = p.bucket
    GROUP BY p.k, p.exact_cnt
    """,
)
def cms_heavy_hitters(spark, sf_dir):
    """Count-min sketch built as a relational operator: depth x width
    bucket-count table (d={d} md5-salted hash rows, w={w} buckets),
    point estimate = MIN over rows of the hashed bucket's count —
    always >= the exact count (collisions only ever add). Validated
    against the exact frequencies of the top-10 heaviest part keys.

    100 TB design: the sketch IS a grouped aggregate — map-side
    partial aggregation collapses each task's contribution to at most
    d*w rows before the shuffle, so the shuffle volume is O(d*w) per
    task regardless of input size, and sketches merge by bucket-wise
    SUM (the same mergeable-state shape as hll_sketch_mergeable).
    Every value is an integer — bit-exact across engines.
    """.format(d=_CMS_D, w=_CMS_W)
    li = load(spark, sf_dir, "lineitem")["lineitem"].select(
        F.col("l_partkey").alias("k")
    )
    js = F.array(*[F.lit(j) for j in range(_CMS_D)])
    exploded = li.select("k", F.explode(js).alias("j"))
    salt = F.concat(F.lit("cms"), F.col("j").cast("string"))
    sketch = (
        exploded.withColumn("bucket", _h(F.col("k"), salt, _CMS_W))
        .groupBy("j", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    exact = li.groupBy("k").agg(F.count(F.lit(1)).alias("exact_cnt"))
    top = exact.orderBy(F.desc("exact_cnt"), "k").limit(10)
    probe = top.select(
        "k", "exact_cnt", F.explode(js).alias("j")
    ).withColumn("bucket", _h(F.col("k"), salt, _CMS_W))
    est = (
        probe.join(F.broadcast(sketch), on=["j", "bucket"])
        .groupBy("k", "exact_cnt")
        .agg(F.min("cnt").alias("cms_est"))
    )
    return est.select(
        F.col("k").alias("l_partkey"),
        "exact_cnt",
        "cms_est",
        (F.col("cms_est") - F.col("exact_cnt")).alias("overcount"),
    )


# ---------------------------------------------------------------------------
# BM25 retrieval
# ---------------------------------------------------------------------------

# (query_id, [term, term]) — exactly two terms per query so the
# per-document score is a sum of <= 2 doubles (commutative, therefore
# order-independent without decimal machinery).
_BM25_QUERIES = [
    ("q1", "spark", "window"),
    ("q2", "hash", "merge"),
    ("q3", "customer", "vector"),
]
_BM25_K1 = 1.2
_BM25_B = 0.75


@register(
    "bm25_retrieval_topk",
    oracle=f"""
    WITH q(query_id, term) AS (
      VALUES {", ".join(f"('{q}', '{t}')" for q, *ts in _BM25_QUERIES for t in ts)}),
    tok AS (
      SELECT doc_id, unnest({_tok_oracle()}) AS term FROM documents),
    dl AS (SELECT doc_id, COUNT(*) AS dl FROM tok GROUP BY doc_id),
    stats AS (
      SELECT COUNT(*) AS n_docs, CAST(SUM(dl) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avgdl
      FROM dl),
    tf AS (
      SELECT t.doc_id, t.term, COUNT(*) AS tf
      FROM tok t WHERE t.term IN (SELECT DISTINCT term FROM q)
      GROUP BY t.doc_id, t.term),
    dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
    contrib AS (
      SELECT q.query_id, tf.doc_id,
             ln(1.0 + (CAST(s.n_docs - d.df AS DOUBLE) + 0.5)
                      / (CAST(d.df AS DOUBLE) + 0.5))
             * ((CAST(tf.tf AS DOUBLE) * {_BM25_K1 + 1.0})
                / (CAST(tf.tf AS DOUBLE)
                   + {_BM25_K1} * ({1.0 - _BM25_B} + {_BM25_B}
                     * (CAST(dl.dl AS DOUBLE) / s.avgdl)))) AS w
      FROM tf
      JOIN q ON q.term = tf.term
      JOIN dfreq d ON d.term = tf.term
      JOIN dl ON dl.doc_id = tf.doc_id
      CROSS JOIN stats s),
    scored AS (
      SELECT query_id, doc_id, ROUND(SUM(w), 4) AS score
      FROM contrib GROUP BY query_id, doc_id),
    ranked AS (
      SELECT query_id, doc_id, score,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY score DESC, doc_id) AS rk
      FROM scored)
    SELECT query_id, rk, doc_id, score FROM ranked WHERE rk <= 5
    """,
)
def bm25_retrieval_topk(spark, sf_dir):
    """BM25 (k1={k1}, b={b}) document retrieval for a broadcast query
    set — the lexical-retrieval half of a RAG stack next to the ANN
    family. The corpus-side work is one (doc, term) aggregation
    semi-joined down to query terms BEFORE any scoring join, so the
    per-query cost is O(matching postings), never O(corpus); doc
    length and df statistics are |vocab|- and O(1)-sized broadcasts.
    Scores are rounded to 4 decimals before ranking (libm ln last-ulp
    divergence), ties broken by doc_id; each query has exactly two
    terms so the float sum is a single commutative add.
    """.format(k1=_BM25_K1, b=_BM25_B)
    d = load(spark, sf_dir, "documents")["documents"]
    q = local_rows_df(
        spark,
        [(qid, t) for qid, *ts in _BM25_QUERIES for t in ts],
        "query_id STRING, term STRING",
    )
    # ONE Arrow pass emits BOTH the per-doc length (BM25's normalizer,
    # counting every token like the old exploded form) and the
    # (doc, term, tf) postings for the six constant query terms
    # (r10, term_counts_arrow — term filter + per-doc count pushed
    # inside the kernel, guide §2.3). The old shape exploded the full
    # token stream across the Arrow boundary into a |distinct
    # (doc, term)| postings exchange and checkpointed THAT; the pinned
    # relation is now O(|docs| + matching postings) narrow rows.
    # localCheckpoint: the kernel output feeds THREE consumers
    # (dl→stats broadcast, dfreq broadcast, the scoring join) and
    # broadcast subtrees don't share exchange reuse — unpinned, the
    # tokenize chain would run once per consumer (measured r6).
    counts = X.term_counts_arrow(
        d, "doc_id", "text",
        sorted({t for _, *ts in _BM25_QUERIES for t in ts}),
        doclen_col="dl",
    ).localCheckpoint()
    dl = counts.filter(F.col("term").isNull()).select("doc_id", "dl")
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"),
        (
            F.sum("dl").cast("double") / F.count(F.lit(1)).cast("double")
        ).alias("avgdl"),
    )
    tf = counts.filter(F.col("term").isNotNull()).select(
        "doc_id", "term", "tf"
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    contrib = (
        tf.join(F.broadcast(q), "term")
        .join(F.broadcast(dfreq), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select(
            "query_id",
            "doc_id",
            (
                F.log(
                    F.lit(1.0)
                    + ((F.col("n_docs") - F.col("df")).cast("double") + 0.5)
                    / (F.col("df").cast("double") + 0.5)
                )
                * (
                    (F.col("tf").cast("double") * F.lit(_BM25_K1 + 1.0))
                    / (
                        F.col("tf").cast("double")
                        + F.lit(_BM25_K1)
                        * (
                            F.lit(1.0 - _BM25_B)
                            + F.lit(_BM25_B)
                            * (F.col("dl").cast("double") / F.col("avgdl"))
                        )
                    )
                )
            ).alias("w"),
        )
    )
    scored = contrib.groupBy("query_id", "doc_id").agg(
        F.round(F.sum("w"), 4).alias("score")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), "doc_id")
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 5)
        .select("query_id", "rk", "doc_id", "score")
    )


# ---------------------------------------------------------------------------
# Positional join
# ---------------------------------------------------------------------------


@register(
    "join_positional",
    oracle="""
    WITH a AS (
      SELECT o_orderkey, row_number() OVER (ORDER BY o_orderkey) - 1 AS pos
      FROM orders),
    b AS (
      SELECT o_orderkey AS key_by_price,
             row_number() OVER (ORDER BY o_totalprice DESC, o_orderkey) - 1 AS pos
      FROM orders)
    SELECT a.pos, a.o_orderkey AS key_seq, b.key_by_price
    FROM a JOIN b USING (pos)
    """,
)
def join_positional(spark, sf_dir):
    """DuckDB POSITIONAL JOIN semantics (pair the i-th rows of two
    relations) for well-ordered inputs: the i-th order by key paired
    with the i-th order by price. A naive row_number() without
    PARTITION BY funnels each side through ONE task; here both sides
    get ids from assign_stable_row_ids (range repartition +
    per-partition offsets — operators/rowid.py), so no stage ever
    sees more than one partition of rows and the pairing join is an
    ordinary shuffle join on the id.
    """
    o = load(spark, sf_dir, "orders")["orders"]
    a = assign_stable_row_ids(
        o.select("o_orderkey"), ["o_orderkey"], id_col="pos"
    )
    # Oracle side ranks by (o_totalprice DESC, o_orderkey ASC); the
    # same total order ascending is (-o_totalprice, o_orderkey).
    b = assign_stable_row_ids(
        o.select(
            F.col("o_orderkey").alias("key_by_price"),
            (F.lit(0) - F.col("o_totalprice")).alias("__neg_price"),
        ),
        ["__neg_price", "key_by_price"],
        id_col="pos",
    ).drop("__neg_price")
    return (
        a.join(b, on="pos")
        .select("pos", F.col("o_orderkey").alias("key_seq"), "key_by_price")
    )


# ---------------------------------------------------------------------------
# Triangle counting (degree-ordered orientation)
# ---------------------------------------------------------------------------

_TRI_N = 2048  # node domain


@register(
    "graph_triangle_count",
    oracle=f"""
    WITH raw AS (
      SELECT o_orderkey % {_TRI_N} AS x,
             {_oh('o_orderkey', "'tri'", _TRI_N)} AS y
      FROM orders),
    edges AS (
      SELECT DISTINCT LEAST(x, y) AS a, GREATEST(x, y) AS b
      FROM raw WHERE x <> y),
    deg AS (
      SELECT n, COUNT(*) AS d FROM (
        SELECT a AS n FROM edges UNION ALL SELECT b FROM edges)
      GROUP BY n),
    oriented AS (
      SELECT CASE WHEN (da.d, e.a) < (db.d, e.b) THEN e.a ELSE e.b END AS src,
             CASE WHEN (da.d, e.a) < (db.d, e.b) THEN e.b ELSE e.a END AS dst
      FROM edges e
      JOIN deg da ON da.n = e.a
      JOIN deg db ON db.n = e.b),
    tri AS (
      SELECT COUNT(*) AS n_triangles
      FROM oriented o1
      JOIN oriented o2 ON o2.src = o1.dst
      JOIN oriented o3 ON o3.src = o1.src AND o3.dst = o2.dst)
    SELECT (SELECT COUNT(*) FROM deg) AS n_nodes,
           (SELECT COUNT(*) FROM edges) AS n_edges,
           n_triangles
    FROM tri
    """,
)
def graph_triangle_count(spark, sf_dir):
    """Distributed triangle counting with degree-ordered orientation
    (the classic wedge-check algorithm): orient every undirected edge
    from its lower-(degree, id) endpoint to the higher one, join the
    oriented edge list with itself to enumerate directed wedges, and
    semi-check the closing edge. Orientation bounds per-node
    out-degree by O(sqrt(m)) on skewed graphs, so the wedge join —
    the step that explodes in a naive E JOIN E JOIN E — stays
    polynomial in the arboricity rather than the max degree, and each
    triangle is counted exactly once (no /6 correction). The graph is
    derived deterministically from orders (node domain {n}, md5 second
    endpoint) identically in both engines.
    """.format(n=_TRI_N)
    o = load(spark, sf_dir, "orders")["orders"]
    raw = o.select(
        (F.col("o_orderkey") % _TRI_N).alias("x"),
        _h(F.col("o_orderkey"), "tri", _TRI_N).alias("y"),
    )
    edges = (
        raw.filter(F.col("x") != F.col("y"))
        .select(
            F.least("x", "y").alias("a"), F.greatest("x", "y").alias("b")
        )
        .distinct()
    )
    deg = (
        edges.select(F.col("a").alias("n"))
        .unionAll(edges.select(F.col("b").alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    da = deg.select(F.col("n").alias("a"), F.col("d").alias("da"))
    db = deg.select(F.col("n").alias("b"), F.col("d").alias("db"))
    lower_first = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))
    )
    oriented = (
        edges.join(F.broadcast(da), "a")
        .join(F.broadcast(db), "b")
        .select(
            F.when(lower_first, F.col("a")).otherwise(F.col("b")).alias("src"),
            F.when(lower_first, F.col("b")).otherwise(F.col("a")).alias("dst"),
        )
    )
    o1 = oriented
    o2 = oriented.select(
        F.col("src").alias("dst"), F.col("dst").alias("w")
    )
    wedges = o1.join(o2, on="dst")  # (src, dst, w): src->dst->w
    closing = oriented.select(
        F.col("src").alias("src"), F.col("dst").alias("w")
    )
    tri = wedges.join(closing, on=["src", "w"], how="left_semi").agg(
        F.count(F.lit(1)).alias("n_triangles")
    )
    counts = edges.agg(F.count(F.lit(1)).alias("n_edges")).crossJoin(
        deg.agg(F.count(F.lit(1)).alias("n_nodes"))
    )
    return counts.crossJoin(tri).select("n_nodes", "n_edges", "n_triangles")


# ---------------------------------------------------------------------------
# 2-D skyline (Pareto frontier)
# ---------------------------------------------------------------------------

_SKY_BUCKETS = 32


@register(
    "skyline_pareto",
    oracle="""
    WITH pts AS (
      SELECT CAST(ROUND(p_retailprice * 100, 0) AS BIGINT) AS price_cents,
             p_size, COUNT(*) AS n_parts
      FROM part GROUP BY 1, 2)
    SELECT p.price_cents, p.p_size, p.n_parts
    FROM pts p
    WHERE NOT EXISTS (
      SELECT 1 FROM pts q
      WHERE q.price_cents >= p.price_cents AND q.p_size >= p.p_size
        AND (q.price_cents > p.price_cents OR q.p_size > p.p_size))
    """,
)
def skyline_pareto(spark, sf_dir):
    """2-D skyline (Pareto frontier: maximize retail price AND size —
    no other part is >= on both and > on one). The oracle states the
    definitional NOT EXISTS; the engine computes it with NO
    quadratic join, via the skyline merge property
    skyline(S) = skyline(U skyline(bucket_i)):

    1. per-bucket pass — points hashed into buckets, each bucket's
       frontier found with two RANGE-frame window maxima (dominated
       iff max(size | price' > price) >= size OR
       max(size | price' >= price) > size), parallel across buckets;
    2. merge pass — the same windows over the (provably small — the
       expected frontier of d-dim random points is O(log^(d-1) n))
       union of bucket frontiers.

    At 100 TB the first pass is embarrassingly parallel and the merge
    input is tiny; nothing is ever compared all-pairs.
    """
    p = load(spark, sf_dir, "part")["part"]
    pts = p.groupBy(
        F.round(F.col("p_retailprice") * 100, 0)
        .cast("bigint")
        .alias("price_cents"),
        "p_size",
    ).agg(F.count(F.lit(1)).alias("n_parts"))

    def frontier(df, part_cols):
        base = Window.partitionBy(*part_cols).orderBy(F.col("price_cents").asc())
        strictly_above = base.rangeBetween(1, Window.unboundedFollowing)
        at_or_above = base.rangeBetween(0, Window.unboundedFollowing)
        a = F.max("p_size").over(strictly_above)
        b = F.max("p_size").over(at_or_above)
        dominated = (a.isNotNull() & (a >= F.col("p_size"))) | (
            b > F.col("p_size")
        )
        return df.withColumn("__dom", dominated).filter(~F.col("__dom")).drop(
            "__dom"
        )

    bucketed = pts.withColumn(
        "__bucket", F.pmod(F.col("price_cents") + F.col("p_size"), _SKY_BUCKETS)
    )
    local = frontier(bucketed, ["__bucket"]).drop("__bucket")
    merged = frontier(local.withColumn("__one", F.lit(0)), ["__one"]).drop(
        "__one"
    )
    return merged.select("price_cents", "p_size", "n_parts")


# ---------------------------------------------------------------------------
# Bloom-prefiltered join
# ---------------------------------------------------------------------------

_BLOOM_M = 16384  # bits
_BLOOM_K = 2  # hash functions


@register(
    "bloom_join_prefilter",
    oracle="""
    SELECT c.c_nationkey,
           COUNT(*) AS n_orders,
           SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) AS total_cents
    FROM orders o
    JOIN customer c ON c.c_custkey = o.o_custkey
    WHERE c.c_mktsegment = 'BUILDING' AND c.c_nationkey < 3
    GROUP BY c.c_nationkey
    """,
)
def bloom_join_prefilter(spark, sf_dir):
    """Join with a Bloom-filter prefilter on the probe side — the
    runtime-filter pattern that matters when the fact table is 100 TB
    and the dimension subset is tiny: the dim side's k md5-derived bit
    positions form a (<= k*|dim|)-row broadcast, the fact side is cut
    by k broadcast LEFT SEMI joins (AND of memberships, all JVM-side,
    no shuffle of the fact), and only the surviving sliver pays the
    exact join. False positives are removed by that exact join, so
    the result — and the oracle — is the plain join; the Bloom stage
    changes cost, never semantics. (Spark's own runtime bloom filters
    target shuffle joins; this form works for any downstream use,
    e.g. feeding the survivors to a Pandas-UDF stage.)
    """
    loaded = load(spark, sf_dir, "orders", "customer")
    o, c = loaded["orders"], loaded["customer"]
    dim = c.filter(
        (F.col("c_mktsegment") == "BUILDING") & (F.col("c_nationkey") < 3)
    ).select("c_custkey", "c_nationkey")
    probe = o.select("o_custkey", "o_totalprice")
    for i in range(_BLOOM_K):
        bits = dim.select(
            _h(F.col("c_custkey"), f"bloom{i}", _BLOOM_M).alias("__bit")
        ).distinct()
        probe = probe.withColumn(
            "__pos", _h(F.col("o_custkey"), f"bloom{i}", _BLOOM_M)
        ).join(
            F.broadcast(bits),
            F.col("__pos") == F.col("__bit"),
            "left_semi",
        ).drop("__pos")
    return (
        probe.join(F.broadcast(dim), probe.o_custkey == dim.c_custkey)
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(
                F.round(F.col("o_totalprice") * 100, 0).cast("bigint")
            ).alias("total_cents"),
        )
    )


# ---------------------------------------------------------------------------
# Nearest-direction as-of join
# ---------------------------------------------------------------------------

_NEAREST_TOL_US = 3_600_000_000  # 1 hour


@register(
    "join_asof_nearest",
    oracle=f"""
    WITH l AS (
      SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
    r AS (
      SELECT event_id AS pid, user_id, ts FROM events
      WHERE event_type = 'purchase'),
    ub AS (
      SELECT user_id, ts, 1 AS side, event_id, NULL AS pid FROM l
      UNION ALL
      SELECT user_id, ts, 0 AS side, NULL AS event_id, pid FROM r),
    bw AS (
      SELECT event_id, user_id, ts,
             last_value(pid IGNORE NULLS) OVER w AS bpid,
             last_value(CASE WHEN side = 0 THEN ts END IGNORE NULLS)
               OVER w AS bts
      FROM ub
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, side
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
    uf AS (
      SELECT user_id, ts, 0 AS side, event_id, NULL AS pid FROM l
      UNION ALL
      SELECT user_id, ts, 1 AS side, NULL AS event_id, pid FROM r),
    fw AS (
      SELECT event_id, user_id, ts,
             first_value(pid IGNORE NULLS) OVER w AS fpid,
             first_value(CASE WHEN side = 1 THEN ts END IGNORE NULLS)
               OVER w AS fts
      FROM uf
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, side
                   ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)),
    joined AS (
      SELECT b.event_id, b.user_id,
             CASE WHEN epoch_us(b.ts) - epoch_us(b.bts)
                       <= {_NEAREST_TOL_US} THEN b.bpid END AS bpid,
             CASE WHEN epoch_us(b.ts) - epoch_us(b.bts)
                       <= {_NEAREST_TOL_US}
                  THEN epoch_us(b.ts) - epoch_us(b.bts) END AS bgap,
             CASE WHEN epoch_us(f.fts) - epoch_us(f.ts)
                       <= {_NEAREST_TOL_US} THEN f.fpid END AS fpid,
             CASE WHEN epoch_us(f.fts) - epoch_us(f.ts)
                       <= {_NEAREST_TOL_US}
                  THEN epoch_us(f.fts) - epoch_us(f.ts) END AS fgap
      FROM bw b
      JOIN fw f ON f.event_id = b.event_id
      WHERE b.event_id IS NOT NULL)
    SELECT event_id, user_id,
           CASE WHEN bpid IS NULL AND fpid IS NULL THEN NULL
                WHEN fpid IS NULL THEN bpid
                WHEN bpid IS NULL THEN fpid
                WHEN bgap <= fgap THEN bpid ELSE fpid END AS matched_pid,
           CASE WHEN bpid IS NULL AND fpid IS NULL THEN NULL
                WHEN fpid IS NULL THEN bgap
                WHEN bpid IS NULL THEN fgap
                WHEN bgap <= fgap THEN bgap ELSE fgap END AS gap_us,
           CASE WHEN bpid IS NULL AND fpid IS NULL THEN NULL
                WHEN fpid IS NULL THEN 'b'
                WHEN bpid IS NULL THEN 'f'
                WHEN bgap <= fgap THEN 'b' ELSE 'f' END AS direction
    FROM joined
    """,
)
def join_asof_nearest(spark, sf_dir):
    """Nearest-direction as-of join (beyond DuckDB's backward/forward
    ASOF): each click matched to its temporally closest purchase by
    the same user within 1 hour, ties to the earlier (backward) side.
    Composed from the existing single-shuffle asof operator run in
    both directions — still two keyed shuffles total, no pairwise
    time join anywhere — then an event-keyed merge picks the smaller
    gap. The oracle mirrors the same union+window construction
    (DuckDB IGNORE NULLS windows), including the equal-timestamp
    side-ordering contract.
    """
    e = load(spark, sf_dir, "events")["events"]
    left = e.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    right = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("pid"), "user_id", F.col("ts").alias("pts")
    )
    tol = F.lit(_NEAREST_TOL_US)
    b = asof_join(
        left, right, on="user_id", left_ts="ts", right_ts="pts",
        right_cols=["pid"], direction="backward",
    ).select(
        "event_id", "user_id", "ts",
        F.col("pid").alias("bpid"),
        (F.unix_micros("ts") - F.unix_micros("asof_pts")).alias("bgap"),
    )
    f = asof_join(
        left, right, on="user_id", left_ts="ts", right_ts="pts",
        right_cols=["pid"], direction="forward",
    ).select(
        F.col("event_id").alias("f_event_id"),
        F.col("pid").alias("fpid"),
        (F.unix_micros("asof_pts") - F.unix_micros("ts")).alias("fgap"),
    )
    j = (
        b.join(f, b.event_id == f.f_event_id)
        .withColumn("bpid", F.when(F.col("bgap") <= tol, F.col("bpid")))
        .withColumn("bgap", F.when(F.col("bpid").isNotNull(), F.col("bgap")))
        .withColumn("fpid", F.when(F.col("fgap") <= tol, F.col("fpid")))
        .withColumn("fgap", F.when(F.col("fpid").isNotNull(), F.col("fgap")))
    )
    pick_b = F.col("fpid").isNull() | (
        F.col("bpid").isNotNull() & (F.col("bgap") <= F.col("fgap"))
    )
    return j.select(
        "event_id",
        "user_id",
        F.when(F.col("bpid").isNull() & F.col("fpid").isNull(), F.lit(None))
        .when(pick_b, F.col("bpid"))
        .otherwise(F.col("fpid"))
        .alias("matched_pid"),
        F.when(F.col("bpid").isNull() & F.col("fpid").isNull(), F.lit(None))
        .when(pick_b, F.col("bgap"))
        .otherwise(F.col("fgap"))
        .alias("gap_us"),
        F.when(F.col("bpid").isNull() & F.col("fpid").isNull(), F.lit(None))
        .when(pick_b, F.lit("b"))
        .otherwise(F.lit("f"))
        .alias("direction"),
    )


# ---------------------------------------------------------------------------
# DuckDB-dialect SQL end-to-end through the transpiler
# ---------------------------------------------------------------------------

_DIALECT_SQL = """
SELECT l_returnflag AS flag,
       (l_orderkey % 7)::VARCHAR AS bucket7,
       COUNT(*) AS cnt,
       COUNT(DISTINCT l_suppkey) AS nsupp
FROM lineitem
WHERE l_shipdate >= '1995-01-01'::DATE AND l_returnflag ~ '[ANR]'
GROUP BY 1, 2
QUALIFY row_number() OVER (PARTITION BY flag
                           ORDER BY cnt DESC, bucket7) <= 3
"""


@register("dialect_duckdb_sql_topk", oracle=_DIALECT_SQL)
def dialect_duckdb_sql_topk(spark, sf_dir):
    """The dialect shim under the correctness gate end-to-end: the
    SAME DuckDB-flavored SQL text — '::' literal and expression casts,
    '~' full-regex match, QUALIFY over a grouped window — is the
    oracle (DuckDB runs it natively) AND the engine input
    (dialect.transpile rewrites it to Spark SQL). Any transpiler
    regression that changes semantics, not just parse, fails the
    value hash, which is exactly the guarantee ADVICE r1 asked the
    shim's rewrites to carry.
    """
    from duckdb_distributed_execution_spark.dialect import transpile

    load(spark, sf_dir, "lineitem")
    return spark.sql(transpile(_DIALECT_SQL))
