"""Exact discrete percentiles (quantile_disc semantics) at scale.

``percentile_disc_groups`` (queries/pipeline7.py) computes the
ceil(p*n)-rank element through a value histogram — correct and
bounded when the value DOMAIN is small (l_quantity has ~50 distinct
values). For high-cardinality values (prices in cents, latencies in
micros) the distinct-value histogram degenerates to the row count and
its per-group cumulative window becomes the single-task funnel it was
meant to avoid.

``disc_percentiles_by_group`` is the two-level form that stays
bounded for any value distribution:

1. coarse pass — counts per (group, value-bucket) where
   bucket = value // bucket_width; the cumulative scan runs over
   buckets (range/width of them, thousands at most), locating the
   bucket containing each target rank and the residual rank inside
   it;
2. refine pass — only the rows of the ONE matching bucket per
   (group, percentile) are re-examined; a row_number window
   partitioned by (group, percentile) picks the residual-rank
   element. Expected bucket population is n/buckets; a skewed bucket
   is still a tiny fraction of the group.

No stage ever windows over raw rows of a whole group, so the operator
holds at 100 TB where a naive ORDER BY + rank selection (or the
distinct-value histogram) funnels a group through one task. Exact —
result identical to DuckDB ``quantile_disc`` (1-based rank
ceil(p*n) of the ascending sort), which the oracles of
`winsorize_clamp` check end-to-end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from duckdb_distributed_execution_spark.functions import local_rows_df


def disc_percentiles_by_group(
    df: DataFrame,
    group_col: str,
    value_col: str,
    ps: list[tuple[str, float]],
    bucket_width: int = 16384,
) -> DataFrame:
    """Exact discrete percentiles per group for an integer value
    column. ``ps`` is [(output_name, fraction)]; returns one row per
    group with one column per requested percentile."""
    base = df.select(
        F.col(group_col).alias("g"), F.col(value_col).alias("v")
    ).withColumn("b", F.floor(F.col("v") / bucket_width))
    n = base.groupBy("g").agg(F.count(F.lit(1)).alias("n"))
    hist = base.groupBy("g", "b").agg(F.count(F.lit(1)).alias("c"))
    cumw = (
        Window.partitionBy("g")
        .orderBy("b")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    hist = hist.withColumn("cum", F.sum("c").over(cumw)).withColumn(
        "cum_before", F.col("cum") - F.col("c")
    )
    # One (group, percentile, bucket, residual) row per requested p,
    # via a broadcast |ps|-row percentile spine — NOT a unionAll
    # branch per percentile (round 6: the old per-p loop re-planned
    # the hist/cum subtree |ps| times, e.g. 30 compiled shuffles for
    # the 9-cut decile user reward_calibration_bins; one spine join
    # keeps the plan size independent of the percentile count).
    # The spine attach plans as a BroadcastNestedLoopJoin (a constant
    # equi-key would just constant-fold back to one); that is the
    # documented bounded-broadcast pattern — |ps| rows against the
    # BUCKET-HISTOGRAM relation (thousands of rows), never the corpus.
    # Callers are allowlisted in tools/plancheck.py as
    # "quantile-spine".
    spine = F.broadcast(
        local_rows_df(
            df.sparkSession,
            [(name, float(p)) for name, p in ps],
            "p_name STRING, p DOUBLE",
        )
    )
    targets = (
        hist.join(F.broadcast(n), "g")
        .crossJoin(spine)
        .withColumn("r", F.ceil(F.col("p") * F.col("n")))
        .filter(
            (F.col("cum") >= F.col("r"))
            & (F.col("cum_before") < F.col("r"))
        )
        .select(
            "g",
            "p_name",
            "b",
            (F.col("r") - F.col("cum_before")).alias("residual"),
        )
    )
    # Refine: rows of the matching bucket only (broadcast the tiny
    # (group × percentile) target set onto the base relation).
    in_bucket = base.join(F.broadcast(targets), on=["g", "b"])
    rw = Window.partitionBy("g", "p_name").orderBy("v")
    picked = (
        in_bucket.withColumn("rn", F.row_number().over(rw))
        .filter(F.col("rn") == F.col("residual"))
        .select("g", "p_name", "v")
    )
    out = picked.groupBy("g").pivot(
        "p_name", [name for name, _ in ps]
    ).agg(F.first("v"))
    return out.withColumnRenamed("g", group_col)
