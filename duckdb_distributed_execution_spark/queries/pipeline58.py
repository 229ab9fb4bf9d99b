"""Fifty-eighth wave — TRAINED quality classification.

Every corpus-filtering stack (CCNet, GPT-3 WebText, FineWeb) gates
documents with a LEARNED linear classifier over hashed bag-of-words
features; the repo so far applies fixed hashed weights
(operators/text.py::hashed_logit) and evaluates classifiers
(classifier_auc_eval, classifier_decile_lift) but never trains one.
This wave fits the real thing — full-batch logistic regression,
distributed gradients, quantized exact replay — and then applies the
fit corpus-wide.

Determinism: every per-document gradient term is floor(+0.5)-
quantized to scaled BIGINTs before summation (integer sums are
order-free), weight updates are integer arithmetic, and the sigmoid
is a single IEEE expression evaluated in identical order on both
engines — so 4 driver-side GD rounds replay bit-identically in the
oracle's unrolled MATERIALIZED CTE chain (the Bradley-Terry
convention, queries/pipeline55.py; mechanism in operators/mlfit.py).

Label: lang = 'en' — deterministic from the data, learnable (the
synthetic corpus skews token frequencies by language — the same
signal text_lang_id keys on). Swap a curated-label column in and
nothing else changes.

Scale shape: the hashed-feature relation is corpus-sized and stays
distributed (pinned once, reused by all rounds); each round is one
broadcast weight join + a per-doc agg + a per-bucket agg; the driver
holds only the 17-row weight vector. Reference has no training
surface (north-star greenfield, BASELINE.json).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from duckdb_distributed_execution_spark.functions import local_rows_df
from duckdb_distributed_execution_spark.operators.mlfit import (
    hashed_features,
    logreg_fit,
    oracle_hashed_features,
)
from duckdb_distributed_execution_spark.operators.text import (
    oracle_normalize,
)
from duckdb_distributed_execution_spark.queries import load, register

_B = 16          # feature buckets (bias trains as bucket 16)
_ITERS = 4       # full-batch GD rounds
# Exact dyadic learning rate (see operators/mlfit.py::logreg_fit for
# the stability bound): the SQL literal and the Python float are the
# same IEEE double because 1/256 is a power of two.
_LR = 1.0 / 256.0
# scientific notation → DOUBLE in DuckDB (a plain decimal literal
# would parse as DECIMAL and change the multiplication's type)
_LR_SQL = "3.90625e-3"


def _oracle_chain(iters: int) -> str:
    """The shared CTE chain: normalized docs → hashed features →
    unrolled GD rounds w1..w{iters}. Every round CTE is MATERIALIZED:
    z{t}/g{t} each reference feats and the previous round twice over,
    and default inlining would re-evaluate the chain exponentially
    (the Bradley-Terry/simhash pitfall)."""
    parts = [
        f"""nd AS MATERIALIZED (
      SELECT doc_id, {oracle_normalize('text')} AS norm,
             CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
      FROM documents)""",
        f"""feats AS MATERIALIZED ({oracle_hashed_features(
            'norm', _B, from_table='nd')})""",
        "lab AS MATERIALIZED (SELECT doc_id, y FROM nd)",
        "nn AS (SELECT COUNT(*) AS n FROM nd)",
        f"""w0 AS MATERIALIZED (
      SELECT CAST(range AS BIGINT) AS bucket, CAST(0 AS BIGINT) AS w
      FROM range({_B + 1}))""",
    ]
    for t in range(1, iters + 1):
        parts.append(f"""z{t} AS MATERIALIZED (
      SELECT f.doc_id, SUM(f.cnt * w.w) AS zn
      FROM feats f JOIN w{t - 1} w USING (bucket) GROUP BY 1)""")
        parts.append(f"""e{t} AS MATERIALIZED (
      SELECT z.doc_id,
             1.0 / (1.0 + exp(-(z.zn / 1e9))) - lab.y AS err
      FROM z{t} z JOIN lab USING (doc_id))""")
        parts.append(f"""g{t} AS MATERIALIZED (
      SELECT f.bucket,
             SUM(CAST(floor(e.err * f.cnt * 1e9 / nn.n + 0.5)
                 AS BIGINT)) AS g
      FROM feats f JOIN e{t} e USING (doc_id) CROSS JOIN nn
      GROUP BY 1)""")
        parts.append(f"""w{t} AS MATERIALIZED (
      SELECT w.bucket,
             w.w - CAST(floor({_LR_SQL} * COALESCE(g.g, 0) + 0.5)
                   AS BIGINT) AS w
      FROM w{t - 1} w LEFT JOIN g{t} g USING (bucket))""")
    return "WITH " + ",\n    ".join(parts)


def _fit(spark, sf_dir):
    d = load(spark, sf_dir, "documents")["documents"]
    feats = hashed_features(d, "doc_id", "text", _B)
    lab = d.select(
        "doc_id",
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("y"),
    )
    n = d.count()
    return d, feats, logreg_fit(
        feats, lab, n, n_buckets=_B, iters=_ITERS, lr=_LR
    )


@register(
    "quality_classifier_train",
    oracle=_oracle_chain(_ITERS)
    + f"""
    SELECT bucket, ROUND(w / 1000000000.0, 6) AS weight FROM w{_ITERS}
    """,
)
def quality_classifier_train(spark, sf_dir):
    """Train the hashed-feature logistic quality classifier and emit
    the learned weight vector (bucket {_B} is the bias). The oracle
    re-derives the identical fit from scratch as an unrolled
    MATERIALIZED CTE chain — bit-identical by the quantized-gradient
    contract (operators/mlfit.py::logreg_fit)."""
    _, _, w = _fit(spark, sf_dir)
    rows = [(b, round(w[b] / 1e9, 6)) for b in sorted(w)]
    return local_rows_df(spark, rows, "bucket LONG, weight DOUBLE")


@register(
    "quality_classifier_apply",
    oracle=_oracle_chain(_ITERS)
    + f""",
    zf AS MATERIALIZED (
      SELECT f.doc_id, SUM(f.cnt * w.w) AS zn
      FROM feats f JOIN w{_ITERS} w USING (bucket) GROUP BY 1),
    p AS (
      SELECT d.lang,
             CAST(floor(1e9 / (1.0 + exp(-(z.zn / 1e9))) + 0.5)
                  AS BIGINT) AS pq
      FROM zf z JOIN documents d USING (doc_id))
    SELECT lang, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CASE WHEN pq >= 500000000 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_pred_pos,
           ROUND(SUM(pq) / 1e9 / COUNT(*), 6) AS mean_p
    FROM p GROUP BY lang
    """,
)
def quality_classifier_apply(spark, sf_dir):
    """Apply the trained classifier corpus-wide and report per-lang
    prediction rates — the gate-audit relation an operator reads
    before turning a quality filter on (is the classifier firing on
    the population it should?). Predicted probabilities are
    floor(+0.5)-quantized to nanos so the per-lang mean is an exact
    integer sum on both engines."""
    d, feats, w = _fit(spark, sf_dir)
    spark_w = local_rows_df(
        spark, [(b, w[b]) for b in sorted(w)], "bucket long, w long"
    )
    zf = (
        feats.join(F.broadcast(spark_w), "bucket")
        .groupBy("doc_id")
        .agg(F.sum(F.col("cnt") * F.col("w")).alias("zn"))
    )
    p = zf.join(d.select("doc_id", "lang"), "doc_id").select(
        "lang",
        F.floor(
            F.lit(1e9)
            / (F.lit(1.0) + F.exp(-(F.col("zn") / F.lit(1e9))))
            + F.lit(0.5)
        )
        .cast("long")
        .alias("pq"),
    )
    return p.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(
            F.when(F.col("pq") >= 500000000, 1).otherwise(0)
        )
        .cast("long")
        .alias("n_pred_pos"),
        F.round(
            F.sum("pq") / F.lit(1e9) / F.count(F.lit(1)), 6
        ).alias("mean_p"),
    )
