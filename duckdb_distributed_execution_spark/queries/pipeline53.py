"""Fifty-third wave — quantile treatment effects: the distributional
A/B contrast (mean effects hide tail movement; QTE at p25/50/75/90
shows WHERE the distribution moved). Exact lower-quantile ranks per
arm over the user-level post-period metric — arms are the ultimate
low-cardinality hot-key regime, so ranks route through
keyed_row_number. Same deterministic md5 arm split and exact-cents
metrics as the CUPED/delta-CI family (pipeline46).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from duckdb_distributed_execution_spark.functions import local_rows_df
from duckdb_distributed_execution_spark.operators.rowid import (
    keyed_row_number,
)
from duckdb_distributed_execution_spark.queries import load, register
from duckdb_distributed_execution_spark.queries.pipeline46 import (
    _PER_USER_SQL,
    _per_user,
)

_PCTS = (25, 50, 75, 90)


@register(
    "abtest_quantile_effects",
    oracle=f"""
    WITH {_PER_USER_SQL},
    na AS (SELECT arm, COUNT(*) AS n FROM u GROUP BY arm),
    rk AS (
      SELECT u.arm, u.y, na.n,
             ROW_NUMBER() OVER (PARTITION BY u.arm
                                ORDER BY u.y, u.user_id) AS rn
      FROM u JOIN na ON na.arm = u.arm),
    p AS (SELECT unnest(ARRAY[{', '.join(str(p) for p in _PCTS)}]) AS pct),
    hits AS (
      SELECT p.pct, rk.arm, rk.y
      FROM rk CROSS JOIN p
      WHERE rk.rn = CAST(floor(p.pct / 100.0 * (rk.n - 1)) AS BIGINT) + 1)
    SELECT pct,
           ROUND(MAX(CASE WHEN arm = 0 THEN y END) / 100.0, 2) AS q_arm0,
           ROUND(MAX(CASE WHEN arm = 1 THEN y END) / 100.0, 2) AS q_arm1,
           ROUND((MAX(CASE WHEN arm = 1 THEN y END)
                  - MAX(CASE WHEN arm = 0 THEN y END)) / 100.0, 2) AS qte
    FROM hits GROUP BY pct
    """,
)
def abtest_quantile_effects(spark, sf_dir):
    """Exact lower-quantile treatment effects (dollars) at
    p25/50/75/90: per-arm rank via keyed_row_number, the target rank
    ⌊p·(n−1)⌋+1 selected by a 4-row broadcast percentile spine, arms
    pivoted into one row per percentile. Integer cents end-to-end —
    no float near a rank boundary."""
    u = _per_user(spark, sf_dir)
    na = u.groupBy("arm").agg(F.count(F.lit(1)).alias("n"))
    rk = keyed_row_number(
        u.select("arm", "user_id", "y"), ["arm"], ["y", "user_id"],
        id_col="rn",
    ).join(F.broadcast(na), "arm")
    pcts = local_rows_df(
        spark.range(0).sparkSession, [(p,) for p in _PCTS], "pct int"
    )
    hits = rk.crossJoin(F.broadcast(pcts)).filter(
        F.col("rn")
        == (
            F.floor(
                F.col("pct") / F.lit(100.0) * (F.col("n") - 1)
            ).cast("long")
            + 1
        )
    )
    q0 = F.max(F.when(F.col("arm") == 0, F.col("y")))
    q1 = F.max(F.when(F.col("arm") == 1, F.col("y")))
    return hits.groupBy("pct").agg(
        F.round(q0 / F.lit(100.0), 2).alias("q_arm0"),
        F.round(q1 / F.lit(100.0), 2).alias("q_arm1"),
        F.round((q1 - q0) / F.lit(100.0), 2).alias("qte"),
    )
