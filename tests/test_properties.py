"""Property-based tests (hypothesis) — beyond the reference's test
strategy (SURVEY §5: it has no property/randomized testing at all).

Two invariants that the engine's correctness story rests on:

1. ``exact_sum`` is partition-order independent: any 2-decimal data
   under any partitioning yields the same double, equal to the exact
   decimal sum.
2. ``asof_join`` matches a brute-force Python reference on arbitrary
   key/timestamp layouts (duplicates, empty sides, unmatched keys).
"""

from __future__ import annotations

from decimal import Decimal

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from duckdb_distributed_execution_spark.functions import exact_sum
from duckdb_distributed_execution_spark.operators.asof import asof_join

# Money-like values: 2 decimals, magnitude up to 1e6.
money = st.integers(min_value=-10**8, max_value=10**8).map(lambda c: c / 100.0)


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(
    vals=st.lists(money, min_size=1, max_size=60),
    nparts=st.integers(min_value=1, max_value=7),
)
def test_exact_sum_partition_independent(spark, vals, nparts):
    expected = float(sum(Decimal(str(v)) for v in vals))
    df = spark.createDataFrame([(v,) for v in vals], "v DOUBLE").repartition(nparts)
    got = df.agg(exact_sum("v").alias("s")).collect()[0].s
    assert got == pytest.approx(expected, abs=1e-9)
    # and bit-identical across two different partitionings
    got2 = (
        spark.createDataFrame([(v,) for v in vals], "v DOUBLE")
        .repartition(max(1, nparts - 1))
        .agg(exact_sum("v").alias("s"))
        .collect()[0]
        .s
    )
    assert got == got2


def _asof_reference(left, right):
    """Brute-force backward as-of: greatest right ts <= left ts per key."""
    out = {}
    for key, lts, lid in left:
        best = None
        for rkey, rts, px in right:
            if rkey == key and rts <= lts and (best is None or rts > best[0]):
                best = (rts, px)
        out[lid] = best
    return out


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(
    left=st.lists(
        st.tuples(st.sampled_from(["a", "b", "c"]),
                  st.integers(min_value=0, max_value=50)),
        min_size=1, max_size=15),
    right=st.lists(
        st.tuples(st.sampled_from(["a", "b"]),
                  st.integers(min_value=0, max_value=50),
                  st.integers(min_value=1, max_value=999)),
        min_size=0, max_size=15),
)
def test_asof_join_matches_reference(spark, left, right):
    left_rows = [(k, t, i) for i, (k, t) in enumerate(left)]
    # de-duplicate right (key, ts) pairs: at equal timestamps the
    # winner among duplicates is unspecified in both implementations.
    seen = set()
    right_rows = []
    for k, t, px in right:
        if (k, t) not in seen:
            seen.add((k, t))
            right_rows.append((k, t, float(px)))
    ldf = spark.createDataFrame(left_rows, "k STRING, ts LONG, lid LONG")
    rdf = (
        spark.createDataFrame(right_rows, "k STRING, ts LONG, px DOUBLE")
        if right_rows
        else spark.createDataFrame([], "k STRING, ts LONG, px DOUBLE")
    )
    got = {
        r.lid: (r.asof_ts, r.px)
        for r in asof_join(ldf, rdf, on="k", left_ts="ts", right_ts="ts",
                           right_cols=["px"]).collect()
    }
    expected = _asof_reference(
        [(k, t, i) for (k, t, i) in left_rows], right_rows
    )
    assert set(got) == set(expected)
    for lid, best in expected.items():
        if best is None:
            assert got[lid] == (None, None)
        else:
            assert got[lid] == best


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(
    n=st.integers(min_value=0, max_value=200),
    nparts=st.integers(min_value=1, max_value=6),
    idparts=st.integers(min_value=1, max_value=6),
)
def test_stable_row_ids_any_layout(spark, n, nparts, idparts):
    """row ids equal the rank of the order key for ANY input layout
    and ANY target partition count — the density/stability contract
    the reference silently assumes of rowid (SURVEY §4.3 #4)."""
    from pyspark.sql import functions as F

    from duckdb_distributed_execution_spark.operators.rowid import (
        assign_stable_row_ids,
    )

    if n == 0:
        return
    df = (
        spark.range(0, n)
        .withColumn("k", F.lit(n - 1) - F.col("id"))
        .repartition(nparts)
    )
    out = assign_stable_row_ids(df, ["k"], num_partitions=idparts)
    got = {r.k: r.row_id for r in out.collect()}
    assert got == {k: k for k in range(n)}


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(
    rows=st.lists(
        st.tuples(st.integers(0, 5), st.integers(-100, 100)),
        min_size=1, max_size=80,
    ),
    salts=st.integers(min_value=1, max_value=8),
)
def test_salted_aggregate_equals_plain(spark, rows, salts):
    """Two-phase salted aggregation is invisible in the result for
    any key histogram and salt count."""
    from pyspark.sql import functions as F

    from duckdb_distributed_execution_spark.operators.skew import (
        salted_aggregate,
    )

    df = spark.createDataFrame(rows, "k INT, v INT")
    plain = {
        (r.k): (r.cnt, r.total, r.mx)
        for r in df.groupBy("k")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum("v").alias("total"),
            F.max("v").alias("mx"),
        )
        .collect()
    }
    salted = {
        (r.k): (r.cnt, r.total, r.mx)
        for r in salted_aggregate(
            df,
            key="k",
            salt_source="v",
            partials={
                "cnt": lambda: F.count(F.lit(1)),
                "total": lambda: F.sum("v"),
                "mx": lambda: F.max("v"),
            },
            finals={
                "cnt": lambda p: F.sum(p).cast("long"),
                "total": lambda p: F.sum(p),
                "mx": lambda p: F.max(p),
            },
            num_salts=salts,
        ).collect()
    }
    assert salted == plain


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=2),    # low-card key
            st.integers(min_value=0, max_value=9),    # heavy-tie order col
        ),
        min_size=1,
        max_size=80,
    ),
    nparts=st.integers(min_value=1, max_value=5),
    sample=st.integers(min_value=5, max_value=80),
)
def test_keyed_row_number_property(spark, rows, nparts, sample):
    """keyed_row_number == ROW_NUMBER() for ARBITRARY low-cardinality
    key layouts, tie densities, bucket counts, and sample sizes —
    including single-row inputs, all-one-key inputs, and boundary
    tie-groups the example-based test can't enumerate."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from duckdb_distributed_execution_spark.operators.rowid import (
        keyed_row_number,
    )

    data = [(k, o, i) for i, (k, o) in enumerate(rows)]
    df = spark.createDataFrame(
        data, "k int, o int, uid long"
    ).repartition(nparts)
    w = Window.partitionBy("k").orderBy("o", "uid")
    expected = {
        (r.k, r.uid): r.rn
        for r in df.withColumn("rn", F.row_number().over(w)).collect()
    }
    got = {
        (r.k, r.uid): r.rn
        for r in keyed_row_number(
            df, ["k"], ["o", "uid"], num_partitions=3, sample_rows=sample
        ).collect()
    }
    assert got == expected


def test_spark_exact_expr_twins_bit_identical(spark):
    """r9: spark_exact_sum/spark_exact_avg (single-parse SQL strings)
    must be bit-identical to exact_sum/exact_avg Column forms — same
    values AND same DOUBLE schema (a bare 1000000.0 literal would
    silently retype the aggregate to decimal)."""
    from pyspark.sql import functions as F

    from duckdb_distributed_execution_spark.functions import (
        exact_avg,
        exact_sum,
        spark_exact_avg,
        spark_exact_sum,
    )

    df = spark.range(10007).select(
        (F.col("id") % 13).alias("k"),
        ((F.col("id") * 97 % 1000) / 100.0 - 3.21).alias("x"),
    )
    a = df.groupBy("k").agg(
        exact_sum("x").alias("s"), exact_avg("x").alias("av"),
        exact_sum(F.col("x") * (F.lit(1) - F.col("x"))).alias("sx"),
    )
    b = df.groupBy("k").agg(
        spark_exact_sum("x").alias("s"), spark_exact_avg("x").alias("av"),
        spark_exact_sum("x * (1 - x)").alias("sx"),
    )
    assert a.schema == b.schema
    ra = sorted(map(tuple, a.collect()))
    rb = sorted(map(tuple, b.collect()))
    assert ra == rb
