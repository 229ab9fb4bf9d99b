"""Ninth-wave operators — exact time-weighted averages, equi-depth
histograms, and PMI co-occurrence scoring.

TWAP is the canonical time-series aggregate (metering, pricing,
monitoring) and needs int128 accumulation to be exact; equi-depth
histograms are the optimizer-statistics twin of the equi-width
`histogram_bins` and reuse the bucket-refined exact percentile
operator; PMI is the standard corpus-association score on top of the
bigram counts the text stack already produces.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from duckdb_distributed_execution_spark.operators import text as X
from duckdb_distributed_execution_spark.operators.quantiles import (
    disc_percentiles_by_group,
)
from duckdb_distributed_execution_spark.queries import load, register

# ---------------------------------------------------------------------------
# Exact time-weighted average (TWAP)
# ---------------------------------------------------------------------------


@register(
    "time_weighted_average",
    oracle="""
    WITH seg AS (
      SELECT user_id,
             CAST(ROUND(value * 1000000, 0) AS BIGINT) AS vm,
             epoch_us(lead(ts) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id))
               - epoch_us(ts) AS dur_us
      FROM events),
    agg AS (
      SELECT user_id,
             SUM(dur_us) AS dur_total_us,
             SUM(CAST(vm AS HUGEINT) * CAST(dur_us AS HUGEINT)) AS num
      FROM seg WHERE dur_us IS NOT NULL
      GROUP BY user_id)
    SELECT user_id, dur_total_us,
           CAST(num AS DECIMAL(38, 0)) AS num_vm_us,
           ROUND(CAST(num AS DOUBLE) / CAST(dur_total_us AS DOUBLE)
                 / 1000000.0, 4) AS twap_r
    FROM agg
    """,
)
def time_weighted_average(spark, sf_dir):
    """Exact per-user time-weighted average: each event's value is
    held until the next event (step interpolation), so the mean
    weights each value by its holding duration — the metering/TWAP
    aggregate that a plain AVG silently gets wrong on irregular
    samples. The value×duration products overflow int64 (micro-value
    × micro-seconds × thousands of events), so accumulation runs in
    DECIMAL(38,0) — the same int128 exactness contract as HUGEINT in
    DuckDB — and the cross-engine hash covers the full-precision
    numerator, not just the rounded ratio. One keyed window (lead)
    plus one grouped sum; nothing global.
    """
    e = load(spark, sf_dir, "events")["events"]
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seg = e.select(
        "user_id",
        F.round(F.col("value") * 1000000, 0).cast("bigint").alias("vm"),
        (
            F.unix_micros(F.lead("ts").over(w)) - F.unix_micros("ts")
        ).alias("dur_us"),
    ).filter(F.col("dur_us").isNotNull())
    agg = seg.groupBy("user_id").agg(
        F.sum("dur_us").alias("dur_total_us"),
        F.sum(
            F.col("vm").cast("decimal(38,0)")
            * F.col("dur_us").cast("decimal(38,0)")
        )
        .cast("decimal(38,0)")
        .alias("num_vm_us"),
    )
    return agg.select(
        "user_id",
        "dur_total_us",
        "num_vm_us",
        F.round(
            F.col("num_vm_us").cast("double")
            / F.col("dur_total_us").cast("double")
            / 1000000.0,
            4,
        ).alias("twap_r"),
    )


# ---------------------------------------------------------------------------
# Equi-depth histogram
# ---------------------------------------------------------------------------


@register(
    "histogram_equidepth",
    oracle="""
    WITH v AS (
      SELECT l_returnflag AS flag,
             CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT) AS cents
      FROM lineitem),
    thr AS (
      SELECT flag,
             quantile_disc(cents, 0.25) AS q1,
             quantile_disc(cents, 0.50) AS q2,
             quantile_disc(cents, 0.75) AS q3
      FROM v GROUP BY flag)
    SELECT v.flag,
           CASE WHEN cents <= q1 THEN 0 WHEN cents <= q2 THEN 1
                WHEN cents <= q3 THEN 2 ELSE 3 END AS bin_id,
           COUNT(*) AS cnt,
           MIN(cents) AS lo, MAX(cents) AS hi
    FROM v JOIN thr USING (flag)
    GROUP BY 1, 2
    """,
)
def histogram_equidepth(spark, sf_dir):
    """Equi-DEPTH histogram (quartile bins — each holds ~25% of the
    group), the boundary statistic query optimizers keep for
    selectivity estimation; the equi-WIDTH twin is `histogram_bins`.
    Boundaries come from the bucket-refined exact percentile operator
    (operators/quantiles.py) and broadcast back onto the rows for a
    single grouped count — two bounded passes, integer-exact
    everywhere.
    """
    li = load(spark, sf_dir, "lineitem")["lineitem"]
    v = li.select(
        F.col("l_returnflag").alias("flag"),
        F.round(F.col("l_extendedprice") * 100, 0)
        .cast("bigint")
        .alias("cents"),
    )
    thr = disc_percentiles_by_group(
        v, "flag", "cents", [("q1", 0.25), ("q2", 0.50), ("q3", 0.75)]
    )
    bin_id = (
        F.when(F.col("cents") <= F.col("q1"), 0)
        .when(F.col("cents") <= F.col("q2"), 1)
        .when(F.col("cents") <= F.col("q3"), 2)
        .otherwise(3)
    )
    return (
        v.join(F.broadcast(thr), "flag")
        .withColumn("bin_id", bin_id)
        .groupBy("flag", "bin_id")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.min("cents").alias("lo"),
            F.max("cents").alias("hi"),
        )
    )


# ---------------------------------------------------------------------------
# PMI co-occurrence
# ---------------------------------------------------------------------------

_PMI_MIN_C = 5


@register(
    "pmi_cooccurrence_topk",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, unnest(regexp_split_to_array(
               {X.oracle_normalize('text')}, '\\s+')) AS t
      FROM documents),
    uni AS (SELECT t, COUNT(*) AS c FROM tok GROUP BY t),
    ntok AS (SELECT SUM(c) AS n FROM uni),
    big AS (
      SELECT doc_id, pr FROM (
        SELECT doc_id,
               unnest(list_transform(
                 range(1, greatest(len(toks) - 1, 0) + 1),
                 i -> toks[i] || ' ' || toks[i + 1])) AS pr
        FROM (SELECT doc_id, regexp_split_to_array(
                {X.oracle_normalize('text')}, '\\s+') AS toks
              FROM documents))),
    bcnt AS (SELECT pr, COUNT(*) AS cab FROM big GROUP BY pr),
    nbig AS (SELECT SUM(cab) AS nb FROM bcnt),
    scored AS (
      SELECT pr, cab,
             ROUND(ln((CAST(cab AS DOUBLE) / CAST(nb AS DOUBLE))
                      / ((CAST(ua.c AS DOUBLE) / CAST(n AS DOUBLE))
                         * (CAST(ub.c AS DOUBLE) / CAST(n AS DOUBLE)))),
                   4) AS pmi
      FROM bcnt
      CROSS JOIN nbig CROSS JOIN ntok
      JOIN uni ua ON ua.t = string_split(pr, ' ')[1]
      JOIN uni ub ON ub.t = string_split(pr, ' ')[2]
      WHERE cab >= {_PMI_MIN_C})
    SELECT pr, cab, pmi FROM scored
    ORDER BY pmi DESC, pr LIMIT 20
    """,
)
def pmi_cooccurrence_topk(spark, sf_dir):
    """Top-20 adjacent-word pairs by pointwise mutual information —
    the collocation score (Church & Hanks) behind phrase mining and
    tokenizer-merge candidates: PMI = ln(p(ab) / (p(a)p(b))) with
    p(ab) over the bigram corpus and unigram marginals over tokens.
    Counts are two grouped aggregates whose shuffles carry distinct
    grams; the unigram table joins back onto bigrams by token key
    (broadcast at |vocab| scale); PMI rounded to 4 before the
    (score, pair)-ordered top-k so ranking is engine-identical.
    Pairs below {m} occurrences are dropped (PMI is noise at tiny
    counts — standard practice).
    """.format(m=_PMI_MIN_C)
    d = load(spark, sf_dir, "documents")["documents"]
    toks = X.tokens(X.normalize_text("text"))
    tok = d.select("doc_id", F.explode(toks).alias("t"))
    uni = tok.groupBy("t").agg(F.count(F.lit(1)).alias("c"))
    ntok = uni.agg(F.sum("c").alias("n"))
    tarr = d.select("doc_id", toks.alias("toks"))
    pairs = tarr.select(
        "doc_id",
        F.explode(
            F.zip_with(
                F.slice(F.col("toks"), 1, F.greatest(F.size("toks") - 1, F.lit(0))),
                F.slice(F.col("toks"), 2, F.greatest(F.size("toks") - 1, F.lit(0))),
                lambda a, b: F.concat(a, F.lit(" "), b),
            )
        ).alias("pr"),
    )
    bcnt = pairs.groupBy("pr").agg(F.count(F.lit(1)).alias("cab"))
    nbig = bcnt.agg(F.sum("cab").alias("nb"))
    ua = uni.select(F.col("t").alias("ta"), F.col("c").alias("ca"))
    ub = uni.select(F.col("t").alias("tb"), F.col("c").alias("cb"))
    scored = (
        bcnt.filter(F.col("cab") >= _PMI_MIN_C)
        .crossJoin(F.broadcast(nbig))
        .crossJoin(F.broadcast(ntok))
        .withColumn("ta", F.split(F.col("pr"), " ").getItem(0))
        .withColumn("tb", F.split(F.col("pr"), " ").getItem(1))
        .join(F.broadcast(ua), "ta")
        .join(F.broadcast(ub), "tb")
        .select(
            "pr",
            "cab",
            F.round(
                F.log(
                    (F.col("cab").cast("double") / F.col("nb").cast("double"))
                    / (
                        (F.col("ca").cast("double") / F.col("n").cast("double"))
                        * (F.col("cb").cast("double") / F.col("n").cast("double"))
                    )
                ),
                4,
            ).alias("pmi"),
        )
    )
    return scored.orderBy(F.desc("pmi"), "pr").limit(20)


# ---------------------------------------------------------------------------
# BPE merge training
# ---------------------------------------------------------------------------

from duckdb_distributed_execution_spark.operators.bpe import (  # noqa: E402
    bpe_train_merges,
    oracle_bpe_sql,
)

_BPE_K = 4
_BPE_TOP = 60


@register(
    "bpe_train_merges",
    oracle=oracle_bpe_sql("text", iterations=_BPE_K, top_words=_BPE_TOP),
)
def bpe_train_merges_q(spark, sf_dir):
    """The first {k} byte-pair-encoding merges learned from the
    corpus (Sennrich-style tokenizer induction) — run as a fully
    relational iterative program (operators/bpe.py): pair counting is
    a keyed window + grouped sum, the left-to-right non-overlapping
    merge is gaps-and-islands + parity, and the DuckDB oracle unrolls
    the SAME K iterations as CTEs, so the whole training trajectory
    (which pair wins each round, at what weighted count) is
    hash-checked cross-engine — not just one step.
    """.format(k=_BPE_K)
    d = load(spark, sf_dir, "documents")["documents"]
    return bpe_train_merges(
        d, "text", iterations=_BPE_K, top_words=_BPE_TOP
    )
