"""Forty-fourth wave — model-evaluation estimators over sampled
generations: the unbiased pass@k and self-consistency agreement.

``eval_pass_at_k`` is the Chen et al. 2021 (HumanEval) combinatorial
estimator: with n samples per problem and c successes,
pass@k = 1 − C(n−c, k)/C(n, k), computed as the numerically-stable
unrolled product ∏_{i<k} (n−c−i)/(n−i) — the per-problem relation an
eval harness aggregates. ``eval_self_consistency`` is the
majority-vote (Wang et al. 2022) agreement rate: how often samples
agree with the per-problem modal answer. Events stand in as the
samples table (user_id = problem, value thresholded/bucketed =
outcome), documented as the synthetic mapping. Reference has no eval
surface (north-star greenfield, BASELINE.json).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from duckdb_distributed_execution_spark.queries import load, register

_THRESH = 50.0  # success := value > 50 (mixed outcomes at every sf)


def _pass_product_sql(k: int) -> str:
    factors = " * ".join(
        f"(CAST(n - c - {i} AS DOUBLE) / CAST(n - {i} AS DOUBLE))"
        for i in range(k)
    )
    return (
        f"CASE WHEN n - c < {k} THEN 1.0 "
        f"ELSE ROUND(1.0 - {factors}, 6) END"
    )


def _pass_product_col(k: int):
    n, c = F.col("n"), F.col("c")
    prod = F.lit(1.0)
    for i in range(k):
        prod = prod * (
            (n - c - F.lit(i)).cast("double") / (n - F.lit(i)).cast("double")
        )
    return F.when(n - c < k, F.lit(1.0)).otherwise(
        F.round(F.lit(1.0) - prod, 6)
    )


@register(
    "eval_pass_at_k",
    oracle=f"""
    WITH per AS (
      SELECT user_id AS problem_id,
             COUNT(*) AS n,
             SUM(CASE WHEN value > {_THRESH} THEN 1 ELSE 0 END) AS c
      FROM events GROUP BY user_id)
    SELECT problem_id, CAST(n AS BIGINT) AS n, CAST(c AS BIGINT) AS c,
           {_pass_product_sql(5)} AS pass_at_5,
           {_pass_product_sql(10)} AS pass_at_10
    FROM per WHERE n >= 10
    """,
)
def eval_pass_at_k(spark, sf_dir):
    """Unbiased pass@k per problem (user_id = problem, success =
    value > 50 — the synthetic samples mapping): one grouped
    aggregate for (n, c), then the k-term product as a static
    codegen'd expression with identical operation order in the
    oracle, so the doubles are bit-identical cross-engine. Problems
    with n−c < k are exactly 1.0 (every k-subset contains a
    success). Scale: one shuffle on problem_id; the product is
    per-row arithmetic."""
    e = load(spark, sf_dir, "events")["events"]
    per = (
        e.groupBy(F.col("user_id").alias("problem_id"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.when(F.col("value") > _THRESH, 1).otherwise(0)
            ).alias("c"),
        )
        .filter(F.col("n") >= 10)
    )
    return per.select(
        "problem_id",
        F.col("n").cast("long").alias("n"),
        F.col("c").cast("long").alias("c"),
        _pass_product_col(5).alias("pass_at_5"),
        _pass_product_col(10).alias("pass_at_10"),
    )


@register(
    "eval_self_consistency",
    oracle="""
    WITH ans AS (
      SELECT user_id AS problem_id,
             CAST(round(value) AS BIGINT) % 10 AS answer
      FROM events),
    votes AS (
      SELECT problem_id, answer, COUNT(*) AS votes
      FROM ans GROUP BY problem_id, answer),
    ranked AS (
      SELECT problem_id, answer, votes,
             SUM(votes) OVER (PARTITION BY problem_id) AS n,
             ROW_NUMBER() OVER (PARTITION BY problem_id
                                ORDER BY votes DESC, answer) AS rn
      FROM votes)
    SELECT problem_id, answer AS majority_answer,
           CAST(votes AS BIGINT) AS votes, CAST(n AS BIGINT) AS n,
           ROUND(CAST(votes AS DOUBLE) / CAST(n AS DOUBLE), 6)
             AS agreement
    FROM ranked WHERE rn = 1
    """,
)
def eval_self_consistency(spark, sf_dir):
    """Majority-vote self-consistency per problem: the modal answer
    bucket (round(value) mod 10 — the synthetic answer mapping,
    lowest-bucket tiebreak) and the fraction of samples that agree
    with it. The vote relation is (problems × answer buckets)-sized;
    the rank window partitions by problem — per-key work, no global
    window."""
    e = load(spark, sf_dir, "events")["events"]
    ans = e.select(
        F.col("user_id").alias("problem_id"),
        (F.round("value").cast("long") % 10).alias("answer"),
    )
    votes = ans.groupBy("problem_id", "answer").agg(
        F.count(F.lit(1)).alias("votes")
    )
    wp = Window.partitionBy("problem_id")
    wr = Window.partitionBy("problem_id").orderBy(
        F.col("votes").desc(), "answer"
    )
    return (
        votes.withColumn("n", F.sum("votes").over(wp))
        .withColumn("rn", F.row_number().over(wr))
        .filter(F.col("rn") == 1)
        .select(
            "problem_id",
            F.col("answer").alias("majority_answer"),
            F.col("votes").cast("long").alias("votes"),
            F.col("n").cast("long").alias("n"),
            F.round(
                F.col("votes").cast("double") / F.col("n").cast("double"), 6
            ).alias("agreement"),
        )
    )
