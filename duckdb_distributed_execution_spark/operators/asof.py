"""As-of join and range join — operators the reference recognizes but
delegates to single-node DuckDB (ASOF_JOIN / PIECEWISE_MERGE_JOIN /
IE_JOIN, query_plan_analyzer.cpp:125-128; SURVEY §2.B), re-expressed
as *distributed* Spark plans.

``asof_join`` uses the union + ignore-nulls window trick: one shuffle
on the join key, one sort — O(n log n) per partition, no row
explosion, scales to arbitrarily many rows per key. This beats the
naive "join then pick max(right_ts)" plan, which explodes every
left×right pair per key before filtering.

``range_join`` joins on a coarse bucket equality first so Spark plans
a shuffled hash join on the bucket instead of a broadcast
nested-loop over the full cross product, then refines with the exact
range predicate. At 100 TB a pure theta join is a non-starter; the
bucket width trades duplicate candidate pairs against parallelism.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_ts: str,
    right_ts: str,
    right_cols: list[str] | None = None,
    tolerance: Column | None = None,
    direction: str = "backward",
) -> DataFrame:
    """For each left row, attach the right row with the greatest
    ``right_ts <= left_ts`` (``direction="backward"``, DuckDB
    ``ASOF JOIN … ON l.ts >= r.ts``) or the smallest
    ``right_ts >= left_ts`` (``direction="forward"``) within the same
    key group. Equal timestamps match in both directions.

    Left rows with no matching right row keep NULL right columns
    (left outer as-of).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    keys = [on] if isinstance(on, str) else list(on)
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in keys and c != right_ts]

    backward = direction == "backward"
    # Side ordering makes an exactly-equal right timestamp visible to
    # the left row: right before left (backward) / after left (forward).
    l_tag = left.withColumn("__ts", F.col(left_ts)).withColumn(
        "__side", F.lit(1 if backward else 0)
    )
    r_tag = right.select(
        *keys,
        F.col(right_ts).alias("__ts"),
        F.lit(0 if backward else 1).alias("__side"),
        F.col(right_ts).alias("__asof_ts"),
        *[F.col(c).alias(f"__r_{c}") for c in right_cols],
    )
    carried = ["__asof_ts"] + [f"__r_{c}" for c in right_cols]
    unioned = l_tag.unionByName(r_tag, allowMissingColumns=True)
    base = Window.partitionBy(*keys).orderBy(F.col("__ts").asc(), F.col("__side").asc())
    if backward:
        w = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        fill = {c: F.last(c, ignorenulls=True).over(w) for c in carried}
    else:
        w = base.rowsBetween(Window.currentRow, Window.unboundedFollowing)
        fill = {c: F.first(c, ignorenulls=True).over(w) for c in carried}
    filled = unioned.withColumns(fill)
    out = filled.filter(F.col("__side") == (1 if backward else 0))
    if tolerance is not None:
        gap = (
            F.col("__ts") - F.col("__asof_ts")
            if backward
            else F.col("__asof_ts") - F.col("__ts")
        )
        out = out.withColumns(
            {c: F.when(gap <= tolerance, F.col(c)) for c in carried}
        )
    renames = {f"__r_{c}": c for c in right_cols}
    out = out.withColumnsRenamed(renames).withColumnRenamed("__asof_ts", "asof_" + right_ts)
    return out.drop("__ts", "__side")


def range_join(
    left: DataFrame,
    right: DataFrame,
    left_val: str,
    lower: str,
    upper: str,
    bucket_width: float,
    extra_on: list[str] | None = None,
    how: str = "inner",
) -> DataFrame:
    """Join where ``right.lower <= left.left_val < right.upper`` using
    bucketed pre-equi-join. Each right interval is exploded to the
    buckets it overlaps; the join runs on (bucket [, extra keys]) as a
    hash join, then the exact predicate filters candidates."""
    b = F.lit(bucket_width)
    lb = left.withColumn("__bucket", F.floor(F.col(left_val) / b))
    rb = right.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.floor(F.col(lower) / b),
                F.floor((F.col(upper) - F.lit(1e-9)) / b),
            )
        ),
    )
    on = ["__bucket"] + (extra_on or [])
    joined = lb.join(rb, on=on, how=how).filter(
        (F.col(left_val) >= F.col(lower)) & (F.col(left_val) < F.col(upper))
    )
    return joined.drop("__bucket")
