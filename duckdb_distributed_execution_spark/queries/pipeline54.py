"""Fifty-fourth wave — dataset drift audit.

``table_drift_audit`` is the schema-level data-ops artifact: per
column, null-rate / distinct-count / mean deltas between an early and
a late time slice — the relation a pipeline alerts on before a model
ever sees the skew (PSI, pipeline15, scores ONE column's
distribution; this audits every column's summary stats). One grouped
pass per slice; the column dimension is unpivoted via a UNION of
column-literal selects, so adding a column is adding a row template,
not a shuffle.

(Leave-one-out target encoding already ships as
queries/pipeline11.py::target_encode_loo — a first draft here
duplicated it and was removed; register() now raises on duplicate
names so an overwrite can never be silent again.) Reference has no
data-ops surface (north-star greenfield, BASELINE.json).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from duckdb_distributed_execution_spark.queries import load, register

_CUT = "1996-01-01"  # orders: early slice < cut <= late slice


def _stats_cols(col: str, numeric: bool):
    mean = (
        (F.sum(F.col(col).cast("double")) / F.count(F.lit(1)))
        if numeric
        else F.lit(None).cast("double")
    )
    return [
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col(col).isNull(), 1).otherwise(0)).alias("nulls"),
        F.countDistinct(col).alias("n_distinct"),
        F.round(mean, 4).alias("mean"),
    ]


def _oracle_stats(col: str, numeric: bool, pred: str) -> str:
    mean = (
        f"ROUND(SUM(CAST({col} AS DOUBLE)) / COUNT(*), 4)"
        if numeric
        else "CAST(NULL AS DOUBLE)"
    )
    return f"""SELECT '{col}' AS col, COUNT(*) AS n,
        SUM(CASE WHEN {col} IS NULL THEN 1 ELSE 0 END) AS nulls,
        COUNT(DISTINCT {col}) AS n_distinct, {mean} AS mean
        FROM orders WHERE {pred}"""


_COLS = (
    ("o_custkey", True),
    ("o_totalprice", True),
    ("o_orderstatus", False),
    ("o_orderpriority", False),
    ("o_orderkey", True),
)


@register(
    "table_drift_audit",
    oracle=f"""
    WITH early AS ({' UNION ALL '.join(
        _oracle_stats(c, num, f"o_orderdate < DATE '{_CUT}'")
        for c, num in _COLS)}),
    late AS ({' UNION ALL '.join(
        _oracle_stats(c, num, f"o_orderdate >= DATE '{_CUT}'")
        for c, num in _COLS)})
    SELECT e.col,
           CAST(e.n AS BIGINT) AS n_early, CAST(l.n AS BIGINT) AS n_late,
           ROUND(CAST(l.nulls AS DOUBLE) / l.n
                 - CAST(e.nulls AS DOUBLE) / e.n, 6) AS null_rate_delta,
           CAST(l.n_distinct - e.n_distinct AS BIGINT)
             AS distinct_delta,
           ROUND(l.mean - e.mean, 4) AS mean_delta
    FROM early e JOIN late l ON l.col = e.col
    """,
)
def table_drift_audit(spark, sf_dir):
    """Per-column drift between the pre-/post-1996 order slices:
    null-rate delta, distinct-count delta, mean delta (NULL for
    non-numeric columns). Two filtered grouped passes over the scan;
    the per-column relation is |columns|-sized."""
    o = load(spark, sf_dir, "orders")["orders"]

    def side(pred):
        parts = []
        for c, num in _COLS:
            parts.append(
                o.filter(pred).agg(*_stats_cols(c, num)).select(
                    F.lit(c).alias("col"), "n", "nulls", "n_distinct", "mean"
                )
            )
        out = parts[0]
        for p in parts[1:]:
            out = out.unionAll(p)
        return out

    early = side(F.col("o_orderdate") < F.lit(_CUT).cast("date"))
    late = side(F.col("o_orderdate") >= F.lit(_CUT).cast("date"))
    e = early.select(
        "col",
        F.col("n").alias("ne"),
        F.col("nulls").alias("nullse"),
        F.col("n_distinct").alias("de"),
        F.col("mean").alias("me"),
    )
    l = late.select(
        "col",
        F.col("n").alias("nl"),
        F.col("nulls").alias("nullsl"),
        F.col("n_distinct").alias("dl"),
        F.col("mean").alias("ml"),
    )
    return e.join(l, "col").select(
        "col",
        F.col("ne").cast("long").alias("n_early"),
        F.col("nl").cast("long").alias("n_late"),
        F.round(
            F.col("nullsl").cast("double") / F.col("nl")
            - F.col("nullse").cast("double") / F.col("ne"),
            6,
        ).alias("null_rate_delta"),
        (F.col("dl") - F.col("de")).cast("long").alias("distinct_delta"),
        F.round(F.col("ml") - F.col("me"), 4).alias("mean_delta"),
    )
