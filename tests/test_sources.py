"""Source/sink connector round trips (csv, json, parquet with
partition pruning)."""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

from duckdb_distributed_execution_spark import sources
from duckdb_distributed_execution_spark.plans import formatted_plan


def test_csv_round_trip(spark):
    df = spark.createDataFrame(
        [(1, "a", 1.5), (2, "b", 2.5), (3, None, None)], "id INT, s STRING, v DOUBLE"
    )
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "t.csv")
        sources.write(df, path, fmt="csv", header="true")
        back = sources.read(spark, path, fmt="csv",
                            schema="id INT, s STRING, v DOUBLE", header="true")
        assert sorted((r.id, r.s, r.v) for r in back.collect()) == sorted(
            (r.id, r.s, r.v) for r in df.collect()
        )


def test_json_round_trip(spark):
    df = spark.createDataFrame(
        [(1, ["x", "y"], {"k": 2})],
        "id INT, tags ARRAY<STRING>, m MAP<STRING, INT>",
    )
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "t.json")
        sources.write(df, path, fmt="json")
        back = sources.read(spark, path, fmt="json",
                            schema="id INT, tags ARRAY<STRING>, m MAP<STRING, INT>")
        r = back.collect()[0]
        assert (r.id, list(r.tags), dict(r.m)) == (1, ["x", "y"], {"k": 2})


def test_partitioned_write_prunes(spark):
    df = spark.createDataFrame(
        [(i, "p%d" % (i % 3), i * 1.0) for i in range(100)],
        "id INT, part STRING, v DOUBLE",
    )
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "t")
        sources.write(df, path, fmt="parquet", partition_by=["part"])
        back = sources.read(spark, path).filter(F.col("part") == "p1")
        assert back.count() == 33
        plan = formatted_plan(back)
        # hive-style partition filter must prune at planning time
        assert "PartitionFilters" in plan and "p1" in plan


def test_unsupported_format_raises(spark):
    import pytest

    with pytest.raises(ValueError):
        sources.read(spark, "/tmp/x", fmt="avro")


def test_orc_round_trip(spark, tmp_path):
    from duckdb_distributed_execution_spark import sources

    df = spark.createDataFrame(
        [(1, "a", 1.5), (2, "b", 2.5)], "id LONG, tag STRING, v DOUBLE"
    )
    path = str(tmp_path / "orc_t")
    sources.write(df, path, fmt="orc")
    back = sources.read(spark, path, fmt="orc")
    assert sorted((r.id, r.tag, r.v) for r in back.collect()) == [
        (1, "a", 1.5), (2, "b", 2.5),
    ]
