"""Stable global row ids — the Spark-native replacement for the
reference's ``rowid`` virtual column.

The reference's partitioner injects ``rowid BETWEEN a AND b`` /
``rowid % N`` predicates into task SQL (task_partitioner.cpp:86-88,
122-124, 148-149) and its correctness rests on rowid density
(SURVEY §4.3 #4). Spark has no stable rowid:
``monotonically_increasing_id()`` encodes partition ids (gaps, not
reproducible across layouts), and a global ``row_number()`` window
funnels every row through ONE partition — a non-starter at scale.

``assign_stable_row_ids`` is the scalable two-pass form:

1. range-repartition on the order key (a shuffle Spark plans with
   range sampling), sort within partitions;
2. count rows per partition (tiny driver-side collect: one long per
   partition), prefix-sum the counts into per-partition offsets;
3. id = offset[partition] + (within-partition row_number − 1).

The result equals the single-window ``row_number() OVER (ORDER BY
key) − 1`` exactly, but no stage ever sees more than one partition's
rows. Requires a total order (unique key or tiebreak columns) to be
deterministic — same contract the reference silently assumes of
rowid.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def assign_stable_row_ids(
    df: DataFrame,
    order_cols: list[str],
    id_col: str = "row_id",
    num_partitions: int | None = None,
) -> DataFrame:
    """Dense 0-based ids in ``order_cols`` order, distributed via
    range partitioning + per-partition offsets (no global window)."""
    parts = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    ranged = df.repartitionByRange(parts, *order_cols)
    # Pin the partition layout: the counts job and the id-assignment
    # job must see the SAME partitions, but a recomputed
    # repartitionByRange can be re-planned between jobs (AQE
    # coalescing decides from runtime stats) — localCheckpoint
    # materializes the exchange once and truncates the lineage both
    # jobs hang off. (Bug surfaced only at sf0.1: at sf0.01 AQE made
    # the same coalescing decision in both jobs.)
    with_pid = ranged.withColumn(
        "__pid", F.spark_partition_id()
    ).localCheckpoint()
    # One row per partition — bounded by the partition count, never
    # by the data size.
    counts = (
        with_pid.groupBy("__pid").count().orderBy("__pid").collect()
    )
    offsets = {}
    acc = 0
    for r in counts:
        offsets[r["__pid"]] = acc
        acc += r["count"]
    offset_df = df.sparkSession.createDataFrame(
        [(int(p), int(o)) for p, o in offsets.items()], "__pid INT, __off LONG"
    )
    w = Window.partitionBy("__pid").orderBy(*order_cols)
    return (
        with_pid.join(F.broadcast(offset_df), on="__pid")
        .withColumn(
            id_col, F.col("__off") + F.row_number().over(w) - F.lit(1)
        )
        .drop("__pid", "__off")
    )


def keyed_row_number(
    df: DataFrame,
    key_cols: list[str],
    order_cols: list[str],
    id_col: str = "rn",
    num_partitions: int | None = None,
) -> DataFrame:
    """ROW_NUMBER() OVER (PARTITION BY key ORDER BY ...) for
    LOW-CARDINALITY keys without the single-task-per-key window: a
    plain window on a 3-value key funnels a third of the table through
    one task (measured: 63x degradation at the 100x probe,
    README "100x probe"). Here the table range-partitions on
    (key, order) — so one key spans many partitions, each bounded by
    data/parts — and per-(partition, key) counts (driver state:
    one long per partition-key pair, bounded by parts x keys, which is
    what makes this the LOW-cardinality tool; high-cardinality keys
    should use the plain window, which already parallelizes) turn into
    broadcast prefix offsets. id = offset + within-partition
    row_number, 1-based, exactly ROW_NUMBER() semantics given a total
    (key, order) order."""
    parts = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    ranged = df.repartitionByRange(parts, *key_cols, *order_cols)
    with_pid = ranged.withColumn(
        "__pid", F.spark_partition_id()
    ).localCheckpoint()
    counts = with_pid.groupBy("__pid", *key_cols).count().collect()
    per_key: dict = {}
    for r in counts:
        per_key.setdefault(
            tuple(r[k] for k in key_cols), []
        ).append((r["__pid"], r["count"]))
    rows = []
    for key, lst in sorted(per_key.items()):
        acc = 0
        for pid, c in sorted(lst):
            rows.append((int(pid), *key, acc))
            acc += c
    key_fields = [df.schema[k] for k in key_cols]
    schema = T.StructType(
        [T.StructField("__pid", T.IntegerType())]
        + key_fields
        + [T.StructField("__off", T.LongType())]
    )
    offset_df = df.sparkSession.createDataFrame(rows, schema)
    w = Window.partitionBy("__pid", *key_cols).orderBy(*order_cols)
    return (
        with_pid.join(F.broadcast(offset_df), on=["__pid", *key_cols])
        .withColumn(id_col, F.col("__off") + F.row_number().over(w))
        .drop("__pid", "__off")
    )
