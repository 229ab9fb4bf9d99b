"""Distributed model FITTING with exact cross-engine replay.

The repo's quality/toxicity/language gates so far APPLY fixed weights
(operators/text.py::hashed_logit) and EVALUATE classifiers
(classifier_auc_eval, classifier_decile_lift, reward_calibration_bins)
— nothing TRAINS one. This module closes that gap with the canonical
corpus-filter model: logistic regression over hashed bag-of-words
features (the fastText/CCNet quality-classifier shape), fit by
full-batch gradient descent where every per-document gradient term is
floor(+0.5)-quantized to a scaled BIGINT before summation.

Determinism contract (the Bradley-Terry convention,
queries/pipeline55.py): integer sums are associative, so the per-
bucket gradient is independent of partitioning and summation order;
weight updates are integer arithmetic on nanos; the only float ops
(sigmoid, the /n normalization) are single IEEE expressions evaluated
in identical order on both engines. T driver-side rounds therefore
replay identically in a DuckDB oracle's unrolled MATERIALIZED CTE
chain — with ONE caveat the integer discipline cannot remove: exp()
is a transcendental, and neither the JVM's nor DuckDB's libm is
correctly rounded, so a 1-ulp sigmoid divergence CAN flip a
floor(+0.5) quantization landing exactly on a .5 boundary and cascade
through later rounds. This is the same measure-zero boundary hazard
documented for ivf_assign_numpy (similarity.py) — never observed on
the pinned corpora, caught loudly by the oracle value-hash if it ever
fires, but it is a probabilistic-zero property, not an IEEE identity
guarantee (the +/−/× terms ARE exact; only exp carries ulp risk).

Scale shape: the feature relation is corpus-sized and stays
distributed (pinned once, reused by every round); each round is one
broadcast join + per-doc aggregation + per-bucket aggregation; the
driver only ever holds the (n_buckets+1)-row weight vector — the
kmeans-centroid / BPE-merge budget. Reference has no training surface
(north-star greenfield, BASELINE.json).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from duckdb_distributed_execution_spark.functions import local_rows_df

NANOS = 1_000_000_000


def hashed_features(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 16,
) -> DataFrame:
    """The (id, bucket, cnt) hashed bag-of-words relation: every
    normalized token hashes to ``md5[:7] % n_buckets`` (the
    hashed_logit convention — engine-identical by construction), plus
    one constant bias feature ``bucket = n_buckets, cnt = 1`` per
    document so the intercept trains through the same path as every
    weight."""
    from duckdb_distributed_execution_spark.operators.text import (
        normalize_text,
        tokens,
    )

    tok = df.select(
        F.col(id_col),
        F.explode(tokens(normalize_text(text_col))).alias("__t"),
    )
    feats = tok.select(
        id_col,
        (
            F.conv(F.substring(F.md5("__t"), 1, 7), 16, 10).cast("long")
            % n_buckets
        ).alias("bucket"),
    ).groupBy(id_col, "bucket").agg(F.count(F.lit(1)).alias("cnt"))
    bias = df.select(
        F.col(id_col),
        F.lit(n_buckets).cast("long").alias("bucket"),
        F.lit(1).cast("long").alias("cnt"),
    )
    return feats.unionByName(bias)


def oracle_hashed_features(
    norm_expr: str, n_buckets: int = 16, from_table: str = "documents",
    id_expr: str = "doc_id",
) -> str:
    """DuckDB CTE body mirroring :func:`hashed_features` (unnamed —
    callers wrap it in ``feats AS MATERIALIZED (...)``)."""
    return f"""
      SELECT {id_expr} AS doc_id,
             CAST(CAST('0x' || substr(md5(t), 1, 7) AS BIGINT)
                  % {n_buckets} AS BIGINT) AS bucket,
             COUNT(*) AS cnt
      FROM (SELECT {id_expr},
                   unnest(string_split({norm_expr}, ' ')) AS t
            FROM {from_table})
      GROUP BY 1, 2
      UNION ALL
      SELECT {id_expr}, {n_buckets}, 1 FROM {from_table}"""


def logreg_fit(
    feats: DataFrame,
    labels: DataFrame,
    n_docs: int,
    n_buckets: int = 16,
    iters: int = 4,
    lr: float = 1.0 / 256.0,
    id_col: str = "doc_id",
) -> dict[int, int]:
    """Full-batch logistic-regression GD over a pinned hashed-feature
    relation. Returns the final weights as BIGINT nanos keyed by
    bucket (bias at ``n_buckets``).

    Round arithmetic (each term mirrored verbatim by the oracle CTE
    chain in queries/pipeline58.py::_oracle_logreg):
      zₙ(doc)  = Σ_b cnt·w_b                (exact BIGINT nanos)
      err(doc) = 1/(1+exp(−zₙ/1e9)) − y     (one IEEE expression)
      q(doc,b) = ⌊err·cnt·1e9/n + 0.5⌋      (quantized BEFORE the sum)
      g_b      = Σ_doc q                    (exact BIGINT, order-free)
      w_b     ← w_b − ⌊lr·g_b + 0.5⌋        (integer; lr an exact
                                             dyadic double literal)
    The /n inside the quantization keeps every partial and total under
    2⁵³ at any corpus size (|err| ≤ 1, so |g_b| ≤ 1e9·mean-cnt), and
    saturation is safe: exp(±inf) → {0, inf} and 1/(1+inf) → 0 follow
    IEEE identically on the JVM and DuckDB.

    lr is NOT a free knob: features are raw token counts, so the
    logistic Hessian's top eigenvalue is ~0.25·mean Σ_b cnt_b² —
    hundreds for typical docs — and full-batch GD diverges (observed:
    p saturates and oscillates rail-to-rail) unless lr stays below
    ~2/L. The dyadic default 1/256 is safely inside that bound for
    this corpus shape while still moving weights ~1e7 nanos/round;
    being a power of two it is exact in IEEE double, so the SQL
    literal and the Python float are the same number."""
    spark = feats.sparkSession
    f = feats.join(labels, id_col).localCheckpoint()
    w = {b: 0 for b in range(n_buckets + 1)}
    for _ in range(iters):
        wdf = local_rows_df(
            spark, [(b, w[b]) for b in sorted(w)], "bucket long, w long"
        )
        z = (
            f.join(F.broadcast(wdf), "bucket")
            .groupBy(id_col, "y")
            .agg(F.sum(F.col("cnt") * F.col("w")).alias("zn"))
        )
        err = z.select(
            id_col,
            (
                F.lit(1.0)
                / (F.lit(1.0) + F.exp(-(F.col("zn") / F.lit(1e9))))
                - F.col("y")
            ).alias("err"),
        )
        g_rows = (
            f.join(err, id_col)
            .groupBy("bucket")
            .agg(
                F.sum(
                    F.floor(
                        F.col("err") * F.col("cnt") * F.lit(1e9)
                        / F.lit(float(n_docs))
                        + F.lit(0.5)
                    ).cast("long")
                ).alias("g")
            )
            .collect()
        )
        import math

        for r in g_rows:
            w[r["bucket"]] -= int(math.floor(lr * r["g"] + 0.5))
    return w
