"""Forty-ninth wave — contrastive-training data prep: hard-negative
mining over the embedding corpus.

Triplet/InfoNCE training wants, per anchor, the most-similar vectors
with a DIFFERENT label (the near-misses that actually move the
loss). ``ann_hard_negative_mining`` is the exact form: anchors
broadcast, one numpy matmul per Arrow batch with a label mask, exact
per-batch top-k prune — the ann_* exact-scan shape
(operators/similarity.py::hard_negative_topk_numpy). The IVF/LSH
blocked families already provide the approximate path at corpus
scale. Reference has no embedding surface (north-star greenfield,
BASELINE.json).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from duckdb_distributed_execution_spark.operators.similarity import (
    hard_negative_topk_numpy,
)
from duckdb_distributed_execution_spark.queries import load, register

_ORACLE_COSINE = """
    list_dot_product({a}, {b})
    / (sqrt(list_dot_product({a}, {a})) * sqrt(list_dot_product({b}, {b})))
"""


@register(
    "ann_hard_negative_mining",
    oracle=f"""
    WITH a AS (SELECT vec_id AS anchor_id, label AS albl,
                      CAST(embedding AS DOUBLE[]) AS av
               FROM embeddings
               WHERE vec_id < 8
                 AND list_dot_product(CAST(embedding AS DOUBLE[]),
                                      CAST(embedding AS DOUBLE[])) > 0),
         c AS (SELECT vec_id AS neighbor_id, label,
                      CAST(embedding AS DOUBLE[]) AS cv
               FROM embeddings),
         sims AS (
           SELECT anchor_id, neighbor_id,
                  {_ORACLE_COSINE.format(a='av', b='cv')} AS sim
           FROM a JOIN c ON c.label <> a.albl
                        AND list_dot_product(cv, cv) > 0)
    SELECT anchor_id, neighbor_id, CAST(rn AS INTEGER) AS rank,
           ROUND(sim, 4) AS sim
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY anchor_id
                                       ORDER BY sim DESC, neighbor_id) AS rn
          FROM sims)
    WHERE rn <= 3
    """,
)
def ann_hard_negative_mining(spark, sf_dir):
    """Top-3 hardest negatives per anchor (anchors: vec_id < 8, the
    driver-bounded broadcast set; negatives: any vector with a
    different label). Exact by construction — the label mask is
    applied BEFORE the per-batch prune, so a masked-out same-label
    vector can never displace a real candidate. The corpus never
    shuffles; the rank window sees anchors × k × n_batches rows.
    Zero-norm vectors (cosine undefined → NaN) are excluded on BOTH
    sides and BOTH roles: corpus side via the engine's isfinite prune
    and the oracle's list_dot_product(cv,cv) > 0 predicate (ADVICE
    r5 — DuckDB sorts NaN as the largest double, so a degenerate
    embedding would rank FIRST), anchor side via the collect-time
    norm filter and the matching av guard (ADVICE r6 — a zero-norm
    anchor makes every sim NaN: the engine would emit no rows for it
    while the unguarded oracle would rank NaN first)."""
    e = load(spark, sf_dir, "embeddings")["embeddings"]
    anchors = [
        (r["vec_id"], r["label"], [float(x) for x in r["embedding"]])
        for r in e.filter(F.col("vec_id") < 8).collect()
        if any(x != 0.0 for x in r["embedding"])
    ]
    return hard_negative_topk_numpy(
        e, anchors, id_col="vec_id", vec_col="embedding",
        label_col="label", k=3,
    )
