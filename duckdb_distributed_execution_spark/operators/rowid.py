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

from duckdb_distributed_execution_spark.functions import local_rows_df


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
    offset_df = local_rows_df(
        df.sparkSession,
        [(int(p), int(o)) for p, o in offsets.items()],
        "__pid INT, __off LONG",
    )
    w = Window.partitionBy("__pid").orderBy(*order_cols)
    return (
        with_pid.join(F.broadcast(offset_df), on="__pid")
        .withColumn(
            id_col, F.col("__off") + F.row_number().over(w) - F.lit(1)
        )
        .drop("__pid", "__off")
    )


def assign_running_sum(
    df: DataFrame,
    order_cols: list[str],
    value_col: str,
    out_col: str = "running_sum",
    id_col: str | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """Global running sum (and optionally a dense 1-based row number)
    in ``order_cols`` order, distributed the same way as
    ``assign_stable_row_ids``: range-repartition on the order key,
    pin the layout with localCheckpoint, collect ONE (count, sum) pair
    per partition, prefix-sum those on the driver, then each partition
    computes offset + within-partition cumulative sum. Equals
    ``SUM(value) OVER (ORDER BY key ROWS UNBOUNDED PRECEDING)``
    exactly for integral values (driver prefix sums are exact longs),
    but no stage ever sees more than one partition's rows — the
    unpartitioned-window replacement for corpus-sized prefix sums
    (e.g. heaps_law_fit's cumulative token counts). Requires a total
    order for determinism, same contract as assign_stable_row_ids."""
    parts = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    ranged = df.repartitionByRange(parts, *order_cols)
    with_pid = ranged.withColumn(
        "__pid", F.spark_partition_id()
    ).localCheckpoint()
    stats = (
        with_pid.groupBy("__pid")
        .agg(
            F.count(F.lit(1)).alias("__c"),
            F.sum(F.col(value_col).cast("long")).alias("__s"),
        )
        .orderBy("__pid")
        .collect()
    )
    rows, n_acc, s_acc = [], 0, 0
    for r in stats:
        rows.append((int(r["__pid"]), n_acc, s_acc))
        n_acc += r["__c"]
        s_acc += int(r["__s"] or 0)
    offset_df = local_rows_df(
        df.sparkSession, rows, "__pid INT, __noff LONG, __soff LONG"
    )
    w = Window.partitionBy("__pid").orderBy(*order_cols)
    out = with_pid.join(F.broadcast(offset_df), on="__pid").withColumn(
        out_col,
        F.col("__soff")
        + F.sum(F.col(value_col).cast("long")).over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    if id_col is not None:
        out = out.withColumn(
            id_col, F.col("__noff") + F.row_number().over(w)
        )
    return out.drop("__pid", "__noff", "__soff")


def _order_struct(df: DataFrame, order_cols: list[str]):
    """The row's order tuple as a struct with stable field names, so
    it compares positionally against boundary literals."""
    return F.struct(
        *[F.col(c).alias(f"_o{i}") for i, c in enumerate(order_cols)]
    )


def _boundary_literal(df: DataFrame, order_cols: list[str], values):
    """One sampled boundary as a struct literal cast to the exact
    column types (lit() would widen Python ints to LONG and break the
    positional struct comparison against INT columns)."""
    return F.struct(
        *[
            F.lit(v).cast(df.schema[c].dataType).alias(f"_o{i}")
            for i, (c, v) in enumerate(zip(order_cols, values))
        ]
    )


def keyed_row_number(
    df: DataFrame,
    key_cols: list[str],
    order_cols: list[str],
    id_col: str = "rn",
    num_partitions: int | None = None,
    sample_rows: int = 100_000,
) -> DataFrame:
    """ROW_NUMBER() OVER (PARTITION BY key ORDER BY ...) for
    LOW-CARDINALITY keys without the single-task-per-key window: a
    plain window on a 3-value key funnels a third of the table through
    one task (measured: 63x degradation at the 100x probe,
    README "100x probe").

    Design (no materialization — an earlier localCheckpoint-based
    variant was 2x SLOWER than the naive window at the 100x probe
    because it wrote 60M full-width rows to block storage):

    1. sample ``order_cols`` tuples (top-k by rand, parallel) and cut
       them into ~2x-parallelism even quantile boundaries on the
       driver;
    2. bucket = count of boundaries <= the row's order tuple — a pure
       column expression (struct comparison against broadcast
       literals), so BOTH passes compute identical buckets with no
       checkpoint and no shuffle replay hazard;
    3. narrow pass: groupBy(bucket, key).count() — partial-agg, reads
       only key+order columns off the scan — prefix-summed per key
       into broadcast offsets (driver state: buckets x keys longs,
       which is what makes this the LOW-cardinality tool;
       high-cardinality keys should use the plain window, which
       already parallelizes);
    4. full-width pass: ONE hash shuffle on (bucket, key) — the
       window's own exchange, now 2x-parallelism-way instead of
       key-cardinality-way — then rn = offset + within-bucket
       row_number. Exactly ROW_NUMBER() semantics given a total
       (key, order) order and a deterministic input (e.g. a file
       scan), 1-based.

    Rows equal to a boundary all land in one bucket, so giant
    tie-groups skew a bucket — same contract as any range scheme.

    Contract: ``key_cols`` must be non-null (enforced — a NULL key
    raises ValueError), and ``order_cols`` should be non-null: NULL
    order tuples compare AFTER non-nulls in the struct-comparison
    bucketing while ROW_NUMBER's default ordering puts nulls FIRST,
    so rn can disagree with the plain window for null order values."""
    parts = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    n_buckets = 2 * parts
    narrow = df.select(*key_cols, *order_cols)
    sample = (
        narrow.select(*order_cols)
        .withColumn("__r", F.rand(42))
        .orderBy("__r")
        .limit(sample_rows)
        .drop("__r")
        .collect()
    )
    tuples = sorted(tuple(r) for r in sample)
    boundaries = []
    seen = set()
    for i in range(1, n_buckets):
        t = tuples[i * len(tuples) // n_buckets] if tuples else None
        if t is not None and t not in seen:
            seen.add(t)
            boundaries.append(t)
    if boundaries:
        cur = _order_struct(df, order_cols)
        blits = [
            _boundary_literal(df, order_cols, b) for b in boundaries
        ]

        def search(lo: int, hi: int):
            # bucket = count of boundaries <= cur, found by a balanced
            # nested-CASE binary search: log2(buckets) codegen'd struct
            # comparisons per row (a filter() over a 63-element literal
            # array was ~60% of the 100x probe's wall — higher-order
            # functions are interpreted, CaseWhen is whole-stage
            # codegen).
            if lo >= hi:
                return F.lit(lo)
            mid = (lo + hi) // 2
            return F.when(cur < blits[mid], search(lo, mid)).otherwise(
                search(mid + 1, hi)
            )

        bucket_expr = search(0, len(blits)).cast("int")
    else:
        bucket_expr = F.lit(0)
    counts = (
        narrow.withColumn("__b", bucket_expr)
        .groupBy("__b", *key_cols)
        .count()
        .collect()
    )
    per_key: dict = {}
    for r in counts:
        key = tuple(r[k] for k in key_cols)
        if any(v is None for v in key):
            raise ValueError(
                "keyed_row_number requires non-null key columns; "
                f"found NULL in key {dict(zip(key_cols, key))!r}"
            )
        per_key.setdefault(key, []).append((r["__b"], r["count"]))
    rows = []
    # Only the per-key bucket order matters for the prefix sum; the
    # outer key order is irrelevant (and Python can't sort mixed
    # None/non-None tuples anyway).
    for key, lst in per_key.items():
        acc = 0
        for b, c in sorted(lst, key=lambda t: t[0]):
            rows.append((int(b), *key, acc))
            acc += c
    key_fields = [df.schema[k] for k in key_cols]
    schema = T.StructType(
        [T.StructField("__b", T.IntegerType())]
        + key_fields
        + [T.StructField("__off", T.LongType())]
    )
    offset_df = local_rows_df(df.sparkSession, rows, schema)
    w = Window.partitionBy("__b", *key_cols).orderBy(*order_cols)
    return (
        df.withColumn("__b", bucket_expr)
        .join(F.broadcast(offset_df), on=["__b", *key_cols])
        .withColumn(id_col, F.col("__off") + F.row_number().over(w))
        .drop("__b", "__off")
    )


def keyed_kth_smallest(
    df: DataFrame,
    key_cols: list[str],
    order_col: str,
    k: int,
) -> DataFrame:
    """Per-key k-th smallest ``order_col`` value — the scalable form
    of a ``rn <= k`` quota check for small k: a row is among its
    key's first k (by a UNIQUE order column) iff
    ``order_col <= kth``, so the quota never needs per-row ranks at
    all. Returns (key_cols..., kth) with kth NULL when the key has
    fewer than k rows (caller treats as "no cut" — every row passes).

    Plan: two-level partial top-k. Each Arrow batch keeps its own k
    smallest per key (state bounded by |keys-in-batch|·k, one narrow
    pass, no shuffle); the combine shuffles only the survivors
    (≤ batches·k rows per key) and sorts that bounded list per key.
    Compare keyed_row_number: 3 passes (sample, counts, rank) and a
    full-relation shuffle — right when every row needs its rank,
    3× overkill when only the k-th THRESHOLD is consumed (measured:
    the sf1 ingest funnel's quota stage). Exactness: any value among
    a key's global k smallest is among its batch's k smallest, so the
    survivor set always contains the true k-th."""
    import pandas as pd  # noqa: F401 (documents the mapInPandas dep)

    dt = dict(df.dtypes)

    def keep_topk(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            yield (
                pdf.sort_values(order_col)
                .groupby(list(key_cols), sort=False)
                .head(k)
            )

    schema = ", ".join(
        f"{c} {dt[c]}" for c in (*key_cols, order_col)
    )
    survivors = df.select(*key_cols, order_col).mapInPandas(
        keep_topk, schema=schema
    )
    lst = F.sort_array(F.collect_list(order_col))
    return survivors.groupBy(*key_cols).agg(
        F.when(
            F.size(lst) >= k, F.element_at(lst, k)
        ).alias("kth")
    )
