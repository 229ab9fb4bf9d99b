"""Eleventh-wave operators — behavioral transition matrices,
top-k-plus-Other reporting rollups, leave-one-out target encoding.

Three everyday analytics/ML-prep shapes: the Markov-style transition
counts behind funnel/Sankey views, the "top 5 and Other" collapse
every BI report needs (done without a second scan), and the
leakage-free categorical encoder feature pipelines use.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from duckdb_distributed_execution_spark.queries import load, register

# ---------------------------------------------------------------------------
# Event transition matrix
# ---------------------------------------------------------------------------


@register(
    "event_transition_matrix",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type AS src,
             lead(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS dst
      FROM events),
    t AS (
      SELECT src, dst, COUNT(*) AS cnt FROM seq
      WHERE dst IS NOT NULL GROUP BY src, dst),
    tot AS (
      SELECT src, SUM(cnt) AS out_total FROM t GROUP BY src)
    SELECT t.src, t.dst, t.cnt,
           ROUND(CAST(t.cnt AS DOUBLE) / CAST(tot.out_total AS DOUBLE), 4)
             AS p
    FROM t JOIN tot USING (src)
    """,
)
def event_transition_matrix(spark, sf_dir):
    """First-order behavioral transition matrix — the Markov counts
    behind funnel and Sankey views: for each user's time-ordered
    event sequence, count src→dst adjacencies and normalize per
    source into transition probabilities. One keyed window (lead) +
    one |types|²-sized aggregate; the normalizing totals join is a
    broadcast of a tiny relation. Counts exact, probabilities rounded
    to 4 with identical division order.
    """
    e = load(spark, sf_dir, "events")["events"]
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        F.col("event_type").alias("src"),
        F.lead("event_type").over(w).alias("dst"),
    ).filter(F.col("dst").isNotNull())
    t = seq.groupBy("src", "dst").agg(F.count(F.lit(1)).alias("cnt"))
    tot = t.groupBy("src").agg(F.sum("cnt").alias("out_total"))
    return t.join(F.broadcast(tot), "src").select(
        "src",
        "dst",
        "cnt",
        F.round(
            F.col("cnt").cast("double") / F.col("out_total").cast("double"), 4
        ).alias("p"),
    )


# ---------------------------------------------------------------------------
# Top-k plus Other rollup
# ---------------------------------------------------------------------------

_TOPK_OTHER_K = 5


@register(
    "topk_plus_other",
    oracle=f"""
    WITH per AS (
      SELECT l_returnflag AS flag, l_partkey AS part, COUNT(*) AS cnt
      FROM lineitem GROUP BY 1, 2),
    ranked AS (
      SELECT *, row_number() OVER (PARTITION BY flag
                                   ORDER BY cnt DESC, part) AS rk
      FROM per)
    SELECT flag,
           CASE WHEN rk <= {_TOPK_OTHER_K} THEN CAST(part AS VARCHAR)
                ELSE 'OTHER' END AS bucket,
           SUM(cnt) AS cnt,
           COUNT(*) AS n_members
    FROM ranked GROUP BY 1, 2
    """,
)
def topk_plus_other(spark, sf_dir):
    """The "top {k} and Other" reporting collapse — every dashboard's
    category widget: per group, keep the {k} heaviest members by
    count and fold the long tail into one OTHER bucket (with its
    member count, so the tail is visible, not hidden). Single
    aggregate → keyed rank window over the AGGREGATED relation
    (|groups × members| rows, never raw facts) → re-aggregate; the
    raw table is scanned once.
    """.format(k=_TOPK_OTHER_K)
    li = load(spark, sf_dir, "lineitem")["lineitem"]
    per = li.groupBy(
        F.col("l_returnflag").alias("flag"),
        F.col("l_partkey").alias("part"),
    ).agg(F.count(F.lit(1)).alias("cnt"))
    rk = Window.partitionBy("flag").orderBy(F.desc("cnt"), "part")
    ranked = per.withColumn("rk", F.row_number().over(rk))
    return ranked.groupBy(
        "flag",
        F.when(
            F.col("rk") <= _TOPK_OTHER_K, F.col("part").cast("string")
        )
        .otherwise("OTHER")
        .alias("bucket"),
    ).agg(
        F.sum("cnt").alias("cnt"), F.count(F.lit(1)).alias("n_members")
    )


# ---------------------------------------------------------------------------
# Leave-one-out target encoding
# ---------------------------------------------------------------------------


@register(
    "target_encode_loo",
    oracle="""
    WITH base AS (
      SELECT o_orderkey, o_orderpriority AS cat,
             CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS y
      FROM orders WHERE o_orderkey % 20 = 0),
    agg AS (
      SELECT cat, SUM(y) AS sy, COUNT(*) AS n FROM base GROUP BY cat)
    SELECT b.o_orderkey, b.cat,
           CASE WHEN a.n > 1
                THEN ROUND(CAST(a.sy - b.y AS DOUBLE)
                           / CAST(a.n - 1 AS DOUBLE) / 100.0, 4)
           END AS loo_mean
    FROM base b JOIN agg a USING (cat)
    """,
)
def target_encode_loo(spark, sf_dir):
    """Leave-one-out target encoding — the leakage-free categorical
    feature: each row's category is replaced by the mean target of
    all OTHER rows in that category ((sum − own) / (n − 1)), so a
    row never sees its own label; singleton categories yield NULL
    instead of a self-leak. One grouped aggregate broadcast back
    onto the rows — no window, no self-join; sums stay integer cents
    until the final rounded division. The standard trick from
    gradient-boosting feature pipelines, at fact-table scale.
    """
    o = load(spark, sf_dir, "orders")["orders"]
    base = o.filter(F.col("o_orderkey") % 20 == 0).select(
        "o_orderkey",
        F.col("o_orderpriority").alias("cat"),
        F.round(F.col("o_totalprice") * 100, 0).cast("bigint").alias("y"),
    )
    agg = base.groupBy("cat").agg(
        F.sum("y").alias("sy"), F.count(F.lit(1)).alias("n")
    )
    return base.join(F.broadcast(agg), "cat").select(
        "o_orderkey",
        "cat",
        F.when(
            F.col("n") > 1,
            F.round(
                (F.col("sy") - F.col("y")).cast("double")
                / (F.col("n") - 1).cast("double")
                / 100.0,
                4,
            ),
        ).alias("loo_mean"),
    )
