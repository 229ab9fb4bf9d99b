"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query smoke check at sf0.001.
``queries()`` — one entry per implemented operator (SURVEY.md §2 +
north-star LLM-pipeline ops), each ``(spark, sf_dir) -> DataFrame``.
``oracle_sql()`` — matching ANSI SQL for the DuckDB oracle; entries
without a reasonable SQL expression (mapInPandas feature extraction,
LSH band-bucket candidate generation) are omitted → rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from duckdb_distributed_execution_spark.queries import all_queries


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the distributed
    star-schema join + exact-decimal grouped aggregation."""
    specs = all_queries()
    return specs["join_multi_star"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec.fn for name, spec in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: spec.oracle
        for name, spec in all_queries().items()
        if spec.oracle is not None
    }
