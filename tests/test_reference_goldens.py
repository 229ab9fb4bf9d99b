"""The reference's sqllogictest corpus translated to golden pytest
(SURVEY §5 tier 1, FIXTURES.md): the same generated tables, the same
queries, the same golden literals — plus the execution-mode
assertions the reference's tests make against its stats table.

Generation is distributed (spark.range), never a driver-side loop."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def group_by_table(spark):
    # group_by_distributed.test:23-41 — 200k rows, category = i%3 → A/B/C
    return spark.range(200_000).select(
        F.col("id").cast("int").alias("id"),
        F.when(F.col("id") % 3 == 0, "A")
        .when(F.col("id") % 3 == 1, "B")
        .otherwise("C")
        .alias("category"),
        (F.col("id") * 10).cast("int").alias("value"),
    )


def test_group_by_distributed_goldens(group_by_table):
    got = {
        r.category: r.cnt
        for r in group_by_table.groupBy("category")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    # golden: 66667/66667/66666
    assert got == {"A": 66667, "B": 66667, "C": 66666}
    assert group_by_table.filter(F.col("id") > 100_000).count() == 99_999


@pytest.fixture(scope="module")
def multi_rg_table(spark):
    # row_group_partitioning.test:29-51 — 500k rows
    return spark.range(500_000).select(
        F.col("id").cast("int").alias("id"),
        (F.col("id") * 100).cast("long").alias("value"),
        F.element_at(
            F.array(*[F.lit(x) for x in
                      ["electronics", "clothing", "food", "books", "other"]]),
            (F.col("id") % 5 + 1).cast("int"),
        ).alias("category"),
        F.concat(F.lit("Item "), F.col("id")).alias("description"),
    )


def test_row_group_partitioning_goldens(multi_rg_table):
    t = multi_rg_table
    # golden: SUM(value) = 12,499,975,000,000
    assert t.agg(F.sum("value")).collect()[0][0] == 12_499_975_000_000
    # golden: first row group slice (id < 122880)
    row = t.filter(F.col("id") < 122_880).agg(
        F.count(F.lit(1)).alias("c"), F.sum("value").alias("s")
    ).collect()[0]
    assert (row.c, row.s) == (122_880, 754_968_576_000)
    # golden: 100k rows per category; COUNT(DISTINCT id) = 500000
    cats = {r.category: r.c for r in
            t.groupBy("category").agg(F.count(F.lit(1)).alias("c")).collect()}
    assert set(cats.values()) == {100_000}
    assert t.select(F.countDistinct("id")).collect()[0][0] == 500_000


def test_small_table_goldens(spark):
    # small_table_optimization.test:27-114
    small = spark.range(1_000).select(
        F.col("id").cast("int").alias("id"),
        (F.col("id") * 100).cast("long").alias("value"),
    )
    assert small.agg(F.sum("value")).collect()[0][0] == 49_950_000
    tiny = spark.range(100).select(
        F.col("id").alias("id"),
        (F.col("id") * 10).alias("value"),
        F.when(F.col("id") % 3 == 0, "A")
        .when(F.col("id") % 3 == 1, "B")
        .otherwise("C")
        .alias("category"),
    )
    got = {r.category: (r.c, r.s) for r in
           tiny.groupBy("category")
           .agg(F.count(F.lit(1)).alias("c"), F.sum("value").alias("s"))
           .collect()}
    assert got["A"][0] == 34  # ids 0,3,...,99
    assert sum(c for c, _ in got.values()) == 100


def test_benchmark_query_goldens(spark, engine):
    """benchmark/large_table.sql:26-28 — the reference's A/B benchmark
    query over its 500k-row table shape, plus the mode assertion its
    stats table makes."""
    large = spark.range(500_000).select(
        F.col("id").cast("int").alias("id"),
        (F.col("id") * 100).cast("long").alias("value"),
        F.element_at(
            F.array(*[F.lit(x) for x in
                      ["electronics", "clothing", "food", "books", "other"]]),
            (F.col("id") % 5 + 1).cast("int"),
        ).alias("category"),
    )
    large.createOrReplaceTempView("large_table")
    rows = engine.execute(
        "SELECT category, COUNT(*) AS cnt, SUM(value) AS total_value "
        "FROM large_table GROUP BY category"
    )
    got = {r.category: (r.cnt, r.total_value) for r in rows}
    assert got["electronics"][0] == 100_000
    assert sum(v for _, v in got.values()) == 12_499_975_000_000
    st = engine.get_query_execution_stats().collect()[-1]
    assert st.merge_strategy == "GROUP_BY"
    assert st.execution_mode == "NATURAL_PARTITION"  # grouped agg shuffles
    assert st.num_tasks_generated >= 1
