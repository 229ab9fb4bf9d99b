"""Fifty-fifth wave — preference / RLHF-data analytics.

Preference datasets (pairwise "A beats B" judgments) are the raw
material of reward models and RLHF; their standard analytics are a
win matrix, a Bradley-Terry strength fit, margin distributions, and
reward-model calibration. Pairwise outcomes are synthesized
DETERMINISTICALLY from the documents table: consecutive doc_ids
(even, even+1) form a judged pair, each side "played" by its lang,
and the winner is the side with the higher hashed-classifier logit
(exact BIGINT — operators/text.py::hashed_logit; ties go to the lower
doc_id). Swap a real judgments table in and nothing else changes.

Scale shape: the corpus-heavy work (pair join + win-matrix
aggregation, margin quantiles, calibration buckets) is distributed;
the Bradley-Terry MM solver iterates over the collected |models|²
win matrix on the driver — the kmeans-centroid/BPE-merge pattern for
bounded model counts (a judged-model roster is dozens, never
corpus-sized). All iteration arithmetic is term-quantized to scaled
BIGINTs (floor(x·S + 0.5)) before every sum, so the fit is
bit-identical between the engine and the oracle's unrolled-CTE
replay regardless of partitioning or summation order.

Reference has no preference surface (north-star greenfield,
BASELINE.json).
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from duckdb_distributed_execution_spark.functions import local_rows_df
from duckdb_distributed_execution_spark.operators.quantiles import (
    disc_percentiles_by_group,
)
from duckdb_distributed_execution_spark.operators.text import (
    hashed_logit,
    oracle_hashed_logit,
)
from duckdb_distributed_execution_spark.queries import load, register

_BT_ITERS = 10

# Judged pairs: consecutive doc_ids with different langs; winner by
# exact integer logit, ties to the lower id (side a).
_ORACLE_PAIRS = f"""
    d AS (SELECT doc_id, lang, {oracle_hashed_logit('text')} AS logit
          FROM documents),
    p AS (SELECT a.lang AS la, b.lang AS lb,
                 a.logit AS sa, b.logit AS sb,
                 CASE WHEN a.logit >= b.logit THEN a.lang ELSE b.lang END
                   AS wlang
          FROM d a JOIN d b ON b.doc_id = a.doc_id + 1
          WHERE a.doc_id % 2 = 0 AND a.lang <> b.lang)
"""


def _pairs(spark, sf_dir):
    d = (
        load(spark, sf_dir, "documents")["documents"]
        .select("doc_id", "lang", hashed_logit("text").alias("logit"))
    )
    a = d.select(
        F.col("doc_id").alias("ida"), F.col("lang").alias("la"),
        F.col("logit").alias("sa"),
    ).filter(F.col("ida") % 2 == 0)
    b = d.select(
        (F.col("doc_id") - 1).alias("ida"), F.col("lang").alias("lb"),
        F.col("logit").alias("sb"),
    )
    return (
        a.join(b, "ida")
        .filter(F.col("la") != F.col("lb"))
        .select(
            "la", "lb", "sa", "sb",
            F.when(F.col("sa") >= F.col("sb"), F.col("la"))
            .otherwise(F.col("lb"))
            .alias("wlang"),
        )
    )


@register(
    "preference_win_matrix",
    oracle="WITH "
    + _ORACLE_PAIRS
    + """
    SELECT LEAST(la, lb) AS model_a, GREATEST(la, lb) AS model_b,
           COUNT(*) AS n_pairs,
           SUM(CASE WHEN wlang = LEAST(la, lb) THEN 1 ELSE 0 END) AS wins_a,
           SUM(CASE WHEN wlang = GREATEST(la, lb) THEN 1 ELSE 0 END) AS wins_b
    FROM p GROUP BY 1, 2
    """,
)
def preference_win_matrix(spark, sf_dir):
    """Pairwise win matrix over the judged pairs — one row per
    unordered model pair with the head-to-head record. One grouped
    aggregation over the pair relation; output is |models|² rows."""
    p = _pairs(spark, sf_dir)
    ma = F.least("la", "lb")
    mb = F.greatest("la", "lb")
    return (
        p.groupBy(ma.alias("model_a"), mb.alias("model_b"))
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.sum(
                F.when(F.col("wlang") == F.least("la", "lb"), 1).otherwise(0)
            ).alias("wins_a"),
            F.sum(
                F.when(F.col("wlang") == F.greatest("la", "lb"), 1).otherwise(0)
            ).alias("wins_b"),
        )
    )


def _oracle_bt(iters: int) -> str:
    parts = [
        _ORACLE_PAIRS.strip(),
        """po AS (SELECT la AS i, lb AS j, wlang FROM p
                  UNION ALL SELECT lb, la, wlang FROM p),
    wm AS MATERIALIZED (
      SELECT i, j, COUNT(*) AS n,
             SUM(CASE WHEN wlang = i THEN 1 ELSE 0 END) AS w
      FROM po GROUP BY i, j),
    wtot AS MATERIALIZED (SELECT i, SUM(w) AS W FROM wm GROUP BY i),
    r0 AS MATERIALIZED (
      SELECT i, CAST(floor(1e9 / (SELECT COUNT(*) FROM wtot) + 0.5)
                AS BIGINT) AS rn FROM wtot)""",
    ]
    # Every iteration CTE is MATERIALIZED: s{t} references r{t-1}
    # TWICE (ra/rb) and r{t} references u{t} twice (rows + the scalar
    # SUM), so DuckDB's default inlining would re-evaluate the chain
    # 2^iters times — the same pitfall the simhash/k-core oracles hit
    # (queries/llm.py _SIMHASH_UND_ORACLE note).
    for t in range(1, iters + 1):
        parts.append(f"""s{t} AS MATERIALIZED (
      SELECT wm.i,
             SUM(CAST(floor(wm.n * 1e18 / (ra.rn + rb.rn) + 0.5)
                 AS BIGINT)) AS S
      FROM wm JOIN r{t - 1} ra ON ra.i = wm.i
              JOIN r{t - 1} rb ON rb.i = wm.j
      GROUP BY wm.i)""")
        parts.append(f"""u{t} AS MATERIALIZED (
      SELECT s.i, CAST(floor(w.W * 1e18 / s.S + 0.5) AS BIGINT) AS raw
      FROM s{t} s JOIN wtot w ON w.i = s.i)""")
        parts.append(f"""r{t} AS MATERIALIZED (
      SELECT i, CAST(floor(raw * 1e9 / (SELECT SUM(raw) FROM u{t}) + 0.5)
                AS BIGINT) AS rn FROM u{t})""")
    return (
        "WITH "
        + ",\n    ".join(parts)
        + f"""
    SELECT i AS model, ROUND(rn / 1000000000.0, 6) AS strength
    FROM r{iters}"""
    )


@register("preference_bradley_terry", oracle=_oracle_bt(_BT_ITERS))
def preference_bradley_terry(spark, sf_dir):
    """Bradley-Terry model strengths from the pairwise record — the
    standard preference-ranking fit (the static special case of an
    arena-style rating), via {_BT_ITERS} minorization-maximization
    rounds: rᵢ ← Wᵢ / Σⱼ nᵢⱼ/(rᵢ+rⱼ), renormalized to Σr = 1 each
    round.

    Determinism contract: strengths live as scaled-BIGINT nanos; each
    MM term nᵢⱼ·1e18/(rᵢ+rⱼ) is floor(+0.5)-quantized BEFORE the sum
    (integer addition is associative — the pagerank convention,
    operators/graph.py:130), the update and the renormalization are
    single double divisions in identical order on both engines, so 10
    driver-side rounds here replay bit-identically in the oracle's
    unrolled CTE chain. The driver only ever holds the |models|² win
    matrix (the kmeans-centroid budget); the corpus-sized pair scan
    stays distributed."""
    wm_rows = (
        _pairs(spark, sf_dir)
        .select(
            F.col("la").alias("i"), F.col("lb").alias("j"), "wlang"
        )
        .unionAll(
            _pairs(spark, sf_dir).select(
                F.col("lb").alias("i"), F.col("la").alias("j"), "wlang"
            )
        )
        .groupBy("i", "j")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.when(F.col("wlang") == F.col("i"), 1).otherwise(0))
            .alias("w"),
        )
        .collect()
    )
    items = sorted({r["i"] for r in wm_rows})
    W = {i: 0 for i in items}
    for r in wm_rows:
        W[r["i"]] += r["w"]
    rn = {i: int(math.floor(1e9 / len(items) + 0.5)) for i in items}
    for _ in range(_BT_ITERS):
        S = {i: 0 for i in items}
        for r in wm_rows:
            S[r["i"]] += int(
                math.floor(r["n"] * 1e18 / (rn[r["i"]] + rn[r["j"]]) + 0.5)
            )
        raw = {
            i: int(math.floor(W[i] * 1e18 / S[i] + 0.5)) for i in items
        }
        tot = sum(raw.values())
        rn = {
            i: int(math.floor(raw[i] * 1e9 / tot + 0.5)) for i in items
        }
    spark_rows = [(i, round(rn[i] / 1e9, 6)) for i in items]
    return local_rows_df(spark, spark_rows, "model STRING, strength DOUBLE")


@register(
    "preference_margin_quantiles",
    oracle="WITH "
    + _ORACLE_PAIRS
    + """
    SELECT LEAST(la, lb) || '|' || GREATEST(la, lb) AS pair,
           quantile_disc(abs(sa - sb), 0.5) AS p50_margin,
           quantile_disc(abs(sa - sb), 0.9) AS p90_margin
    FROM p GROUP BY 1
    """,
)
def preference_margin_quantiles(spark, sf_dir):
    """Per model-pair margin distribution (|logit difference| — how
    decisive the judgments are): exact p50/p90 through the scalable
    two-level quantile (operators/quantiles.py). Margins are exact
    BIGINTs, so the quantile picks are engine-identical."""
    p = _pairs(spark, sf_dir).select(
        F.concat(
            F.least("la", "lb"), F.lit("|"), F.greatest("la", "lb")
        ).alias("pair"),
        F.abs(F.col("sa") - F.col("sb")).alias("margin"),
    )
    return disc_percentiles_by_group(
        p, "pair", "margin", [("p50_margin", 0.5), ("p90_margin", 0.9)]
    )


@register(
    "reward_calibration_bins",
    oracle=f"""
    WITH d AS (
      SELECT doc_id, {oracle_hashed_logit('text')} AS logit,
             (CAST('0x' || substr(md5(text), 1, 7) AS BIGINT) % 2) AS label
      FROM documents),
    cuts AS (
      SELECT {", ".join(f"quantile_disc(logit, {q / 10.0}) AS c{q}" for q in range(1, 10))}
      FROM d),
    b AS (
      SELECT d.label, d.logit,
             ({" + ".join(f"CASE WHEN d.logit > cuts.c{q} THEN 1 ELSE 0 END" for q in range(1, 10))})
               AS bucket
      FROM d CROSS JOIN cuts)
    SELECT bucket, COUNT(*) AS n,
           ROUND(CAST(SUM(logit) AS DOUBLE) / COUNT(*), 6) AS mean_score,
           ROUND(CAST(SUM(label) AS DOUBLE) / COUNT(*), 6) AS pos_rate
    FROM b GROUP BY bucket
    """,
)
def reward_calibration_bins(spark, sf_dir):
    """Reward-model calibration curve: documents bucketed into score
    deciles (cut points = exact quantile_disc of the integer logit;
    bucket = number of cut points strictly below the score, so ties
    bin identically on both engines), each bucket reporting mean
    score and the observed positive rate of a deterministic
    hash-parity label. A calibrated scorer shows pos_rate monotone in
    mean_score; the decile cuts come from the scalable two-level
    quantile, never a global sort."""
    d = load(spark, sf_dir, "documents")["documents"].select(
        "doc_id",
        hashed_logit("text").alias("logit"),
        (
            F.conv(F.substring(F.md5("text"), 1, 7), 16, 10).cast("long")
            % 2
        ).alias("label"),
    )
    cuts = disc_percentiles_by_group(
        d.withColumn("g", F.lit(1)), "g",
        "logit", [(f"c{q}", q / 10.0) for q in range(1, 10)],
    ).drop("g")
    bucket = None
    for q in range(1, 10):
        term = F.when(F.col("logit") > F.col(f"c{q}"), 1).otherwise(0)
        bucket = term if bucket is None else bucket + term
    return (
        d.crossJoin(F.broadcast(cuts))
        .select("label", "logit", bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(
                F.sum("logit").cast("double") / F.count(F.lit(1)), 6
            ).alias("mean_score"),
            F.round(
                F.sum("label").cast("double") / F.count(F.lit(1)), 6
            ).alias("pos_rate"),
        )
    )
