"""Operators Spark lacks as builtins, plus the large-scale
training-data pipeline suite (dedup, similarity search, text
analysis, multimodal plumbing).

Design rule (SURVEY §7): express each operator as a composition of
DataFrame ops where semantics allow; drop to Arrow-batched
``applyInPandas``/``mapInPandas`` only where they genuinely can't;
never row-at-a-time Python UDFs, never driver-side loops.
"""

from duckdb_distributed_execution_spark.operators.asof import asof_join, range_join

__all__ = ["asof_join", "range_join"]
