"""Z-order (Morton) clustering — the Spark-native answer to the
reference's CREATE INDEX (SURVEY §2.A5: duckherder forwards CREATE
INDEX SQL to the server's DuckDB; a Spark/lakehouse engine instead
clusters the *data layout* so min/max zone maps prune multi-column
predicates — the `OPTIMIZE ZORDER BY` pattern).

``zorder_key`` interleaves the bits of N columns after rank-normalizing
each to a fixed bit budget, entirely in whole-stage-codegen column
algebra.  Sorting by the key gives every parquet row group a tight
bounding box in all N dimensions at once, so a filter on ANY indexed
column skips most row groups at 100 TB — exactly what a secondary
index buys on a single node, minus the random-I/O write path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

BITS_PER_DIM = 21  # 2 dims → 42-bit key, 3 dims → 63-bit: fits a long


def interleave_bits(cols: list[Column], bits: int = BITS_PER_DIM) -> Column:
    """Morton interleave of already-normalized non-negative ints
    (each < 2**bits).  Column i contributes bit b to key position
    b*len(cols)+i."""
    n = len(cols)
    key = F.lit(0).cast("long")
    for i, c in enumerate(cols):
        x = c.cast("long")
        for b in range(bits):
            key = key + F.shiftleft(
                F.shiftright(x, b).bitwiseAND(F.lit(1)), b * n + i
            )
    return key


def oracle_interleave_bits(exprs: list[str], bits: int = BITS_PER_DIM) -> str:
    """DuckDB SQL mirror of interleave_bits."""
    n = len(exprs)
    terms = []
    for i, e in enumerate(exprs):
        for b in range(bits):
            terms.append(f"((({e} >> {b}) & 1) << {b * n + i})")
    return "(" + " + ".join(terms) + ")"


def zorder_key(cols: list[Column], max_vals: list[int | Column],
               bits: int = BITS_PER_DIM) -> Column:
    """Z-order key for non-negative integer columns with known upper
    bounds: each column is scaled into the bit budget
    (x * (2**bits - 1) / max_val) so dimensions weigh equally, then
    bit-interleaved.  Bounds may be literals or columns (e.g. a
    cross-joined MAX() — table statistics at scale).  (For arbitrary
    types, rank-normalize first — approx percentiles give the cut
    points.)"""
    top = (1 << bits) - 1
    norm = []
    for c, m in zip(cols, max_vals):
        mc = F.lit(int(m)).cast("long") if isinstance(m, int) else m.cast("long")
        a = c.cast("long") * F.lit(top)
        # Exact floor division: (a - a % m) is a multiple of m, so the
        # IEEE division is exact — a bare double divide + truncate can
        # disagree with integer // at ulp boundaries.
        norm.append(((a - F.pmod(a, mc)) / mc).cast("long"))
    return interleave_bits(norm, bits)


def oracle_zorder_key(exprs: list[str], max_vals: list[int | str],
                      bits: int = BITS_PER_DIM) -> str:
    top = (1 << bits) - 1
    norm = [
        f"CAST((({e}) * {top}) // ({m}) AS BIGINT)"
        for e, m in zip(exprs, max_vals)
    ]
    return oracle_interleave_bits(norm, bits)


def zorder_rewrite(df: DataFrame, cols: list[str], max_vals: list[int],
                   target_files: int = 0) -> DataFrame:
    """Layout-optimizing rewrite: range-partition + sort by the Morton
    key.  ``repartitionByRange`` samples the key distribution, so file
    sizes stay balanced even when the dimensions are skewed."""
    keyed = df.withColumn(
        "__zkey", zorder_key([F.col(c) for c in cols], max_vals)
    )
    n = target_files or df.sparkSession.sparkContext.defaultParallelism
    return (
        keyed.repartitionByRange(n, "__zkey")
        .sortWithinPartitions("__zkey")
        .drop("__zkey")
    )
