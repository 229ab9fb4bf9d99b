"""Eighth-wave operators — SCD point-in-time join, bucket-refined
exact percentiles with winsorization.

`scd_point_in_time_join` is the warehouse pattern the reference's
static-catalog model cannot express (every scan sees one table
state): joining facts to the dimension VERSION that was valid when
the fact happened. `winsorize_clamp` exercises the two-level exact
discrete percentile operator (operators/quantiles.py) built for
value domains where pipeline7's distinct-value histogram would
degenerate.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from duckdb_distributed_execution_spark.operators import dedup as D
from duckdb_distributed_execution_spark.operators.asof import asof_join
from duckdb_distributed_execution_spark.operators.quantiles import (
    disc_percentiles_by_group,
)
from duckdb_distributed_execution_spark.queries import load, register

# ---------------------------------------------------------------------------
# SCD2 point-in-time join
# ---------------------------------------------------------------------------

# Three dimension versions per customer, valid_from staggered so v0
# precedes every order (orders span 1995-2001) and v1/v2 land inside
# the fact range — derived deterministically from c_custkey in both
# engines.
_SCD_DIM_SQL = """
      SELECT c_custkey, v.v,
             CAST(DATE '1993-01-01'
                  + INTERVAL 1 DAY * (v.v * (700 + c_custkey % 50))
                  AS TIMESTAMP) AS valid_from,
             c_mktsegment || '-v' || CAST(v.v AS VARCHAR) AS seg_version
      FROM customer CROSS JOIN (SELECT unnest([0, 1, 2]) AS v) v
"""


@register(
    "scd_point_in_time_join",
    oracle=f"""
    WITH dim AS ({_SCD_DIM_SQL}),
    pit AS (
      SELECT o.o_orderkey, d.v, d.valid_from, d.seg_version,
             row_number() OVER (PARTITION BY o.o_orderkey
                                ORDER BY d.valid_from DESC) AS rk
      FROM orders o
      JOIN dim d ON d.c_custkey = o.o_custkey
                AND d.valid_from <= o.o_orderdate)
    SELECT o_orderkey, v AS version, valid_from, seg_version
    FROM pit WHERE rk = 1
    """,
)
def scd_point_in_time_join(spark, sf_dir):
    """Point-in-time (SCD type-2) join: each order joined to the
    customer-dimension version valid at its order date — the
    correct-as-of-then enrichment every warehouse needs for
    retroactive reporting. The engine side is the single-shuffle
    as-of operator keyed on custkey (union + ordered window, never a
    version×fact range join); the oracle states the definitional
    latest-valid-version-per-fact with a window over the 3-versions
    join. Version history derives deterministically from c_custkey in
    both engines.
    """
    loaded = load(spark, sf_dir, "orders", "customer")
    o, c = loaded["orders"], loaded["customer"]
    dim = c.select(
        "c_custkey",
        F.explode(F.array(F.lit(0), F.lit(1), F.lit(2))).alias("v"),
        "c_mktsegment",
    ).select(
        "c_custkey",
        "v",
        F.date_add(
            F.lit("1993-01-01").cast("date"),
            (F.col("v") * (F.lit(700) + F.col("c_custkey") % 50)).cast("int"),
        )
        .cast("timestamp")
        .alias("valid_from"),
        F.concat(
            F.col("c_mktsegment"), F.lit("-v"), F.col("v").cast("string")
        ).alias("seg_version"),
    )
    fact = o.select(
        "o_orderkey", F.col("o_custkey").alias("c_custkey"), "o_orderdate"
    )
    pit = asof_join(
        fact,
        dim,
        on="c_custkey",
        left_ts="o_orderdate",
        right_ts="valid_from",
        right_cols=["v", "seg_version"],
        direction="backward",
    )
    return pit.filter(F.col("asof_valid_from").isNotNull()).select(
        "o_orderkey",
        F.col("v").alias("version"),
        F.col("asof_valid_from").alias("valid_from"),
        "seg_version",
    )


# ---------------------------------------------------------------------------
# Winsorization via bucket-refined exact percentiles
# ---------------------------------------------------------------------------


@register(
    "winsorize_clamp",
    oracle="""
    WITH v AS (
      SELECT l_returnflag AS flag,
             CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT) AS cents
      FROM lineitem),
    thr AS (
      SELECT flag,
             quantile_disc(cents, 0.05) AS lo,
             quantile_disc(cents, 0.95) AS hi
      FROM v GROUP BY flag)
    SELECT v.flag,
           t.lo, t.hi,
           SUM(CASE WHEN v.cents < t.lo THEN 1 ELSE 0 END) AS n_low,
           SUM(CASE WHEN v.cents > t.hi THEN 1 ELSE 0 END) AS n_high,
           SUM(CASE WHEN v.cents < t.lo THEN t.lo
                    WHEN v.cents > t.hi THEN t.hi
                    ELSE v.cents END) AS winsorized_sum_cents
    FROM v JOIN thr t USING (flag)
    GROUP BY v.flag, t.lo, t.hi
    """,
)
def winsorize_clamp(spark, sf_dir):
    """Winsorization — clamp each group's values to its exact
    [p05, p95] before aggregating, the robust-statistics step that
    keeps a handful of corrupt prices from owning a mean. The
    thresholds come from operators/quantiles.disc_percentiles_by_group
    — the two-level (bucket histogram → single-bucket refine) exact
    quantile_disc that stays bounded on high-cardinality domains
    like cents, where pipeline7's distinct-value histogram would
    window over nearly every row. Thresholds broadcast back onto the
    rows; every output is an integer so the cross-engine contract is
    bit-exact.
    """
    li = load(spark, sf_dir, "lineitem")["lineitem"]
    v = li.select(
        F.col("l_returnflag").alias("flag"),
        F.round(F.col("l_extendedprice") * 100, 0)
        .cast("bigint")
        .alias("cents"),
    )
    thr = disc_percentiles_by_group(
        v, "flag", "cents", [("lo", 0.05), ("hi", 0.95)]
    )
    clamped = F.when(F.col("cents") < F.col("lo"), F.col("lo")).when(
        F.col("cents") > F.col("hi"), F.col("hi")
    ).otherwise(F.col("cents"))
    return (
        v.join(F.broadcast(thr), "flag")
        .groupBy("flag", "lo", "hi")
        .agg(
            F.sum(
                F.when(F.col("cents") < F.col("lo"), 1).otherwise(0)
            ).alias("n_low"),
            F.sum(
                F.when(F.col("cents") > F.col("hi"), 1).otherwise(0)
            ).alias("n_high"),
            F.sum(clamped).alias("winsorized_sum_cents"),
        )
    )


# ---------------------------------------------------------------------------
# Exact set-similarity join (prefix filtering)
# ---------------------------------------------------------------------------

_SETSIM_T = 0.5
_SETSIM_SH = D.oracle_word_shingles("text", 2)
_SETSIM_J = (
    "(CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)"
    " / (CAST(len(a.s) + len(b.s) AS DOUBLE)"
    " - CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)))"
)


@register(
    "setsim_prefix_join",
    oracle=f"""
    WITH d AS (
      SELECT doc_id, {_SETSIM_SH} AS s
      FROM documents WHERE doc_id % 2 = 0)
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           ROUND({_SETSIM_J}, 4) AS jaccard
    FROM d a JOIN d b ON a.doc_id < b.doc_id
    WHERE {_SETSIM_J} >= {_SETSIM_T}
    """,
)
def setsim_prefix_join(spark, sf_dir):
    """EXACT all-pairs Jaccard >= {t} near-dup join via AllPairs/
    PPJoin prefix filtering (operators/dedup.setsim_prefix_join) —
    the no-false-negative complement to MinHash-LSH, for pipelines
    whose dedup must be provably complete. The engine never compares
    all pairs (rare-token prefix equi-join + length filter bound the
    candidates); the ORACLE is the definitional brute-force O(n^2)
    join, so the driver hash-checks that the pruned plan loses
    nothing. Corpus halved (doc_id %% 2) purely to keep the
    quadratic oracle tractable at sf0.1 — the engine side would run
    unfiltered.
    """.format(t=_SETSIM_T)
    from duckdb_distributed_execution_spark.operators.dedup import (
        setsim_prefix_join as _op,
    )

    d = load(spark, sf_dir, "documents")["documents"].filter(
        F.col("doc_id") % 2 == 0
    )
    out = _op(d, "doc_id", "text", shingle_n=2, threshold=_SETSIM_T)
    return out.select("id_a", "id_b", F.round("jaccard", 4).alias("jaccard"))
