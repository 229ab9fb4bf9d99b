"""Physical-plan introspection — the engine's answer to the
reference's query-plan analyzer (query_plan_analyzer.cpp:21-245),
used for execution-mode stats and for the performance test suite
(assert a filter reached the scan, a dim join broadcast, etc.)."""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


@dataclass
class PlanSummary:
    n_exchanges: int            # all Exchange nodes (incl. broadcast)
    n_shuffle_exchanges: int    # hash/range/single-partition shuffles only
    n_broadcast_joins: int
    n_sortmerge_joins: int
    n_shuffle_hash_joins: int
    has_pushed_filters: bool
    has_partial_agg: bool
    wholestage_codegen: bool

    @property
    def n_joins(self) -> int:
        return (
            self.n_broadcast_joins
            + self.n_sortmerge_joins
            + self.n_shuffle_hash_joins
        )


def summarize(df: DataFrame) -> PlanSummary:
    plan = formatted_plan(df)
    # In "formatted" explain, whole-stage-codegen membership is the
    # leading asterisk on a node line ("* Filter (2)"), not the
    # "WholeStageCodegen" label of "simple" mode.
    codegen = "WholeStageCodegen" in plan or "\n* " in plan or plan.startswith("* ")
    n_shuffles = (
        plan.count("Exchange hashpartitioning")
        + plan.count("Exchange rangepartitioning")
        + plan.count("Exchange SinglePartition")
    )
    return PlanSummary(
        n_exchanges=plan.count("Exchange"),
        n_shuffle_exchanges=n_shuffles,
        n_broadcast_joins=plan.count("BroadcastHashJoin"),
        n_sortmerge_joins=plan.count("SortMergeJoin"),
        n_shuffle_hash_joins=plan.count("ShuffledHashJoin"),
        has_pushed_filters="PushedFilters: [" in plan
        and "PushedFilters: []" not in plan,
        has_partial_agg="partial_" in plan or "HashAggregate" in plan,
        wholestage_codegen=codegen,
    )


def scan_read_schema(df: DataFrame) -> list[str]:
    """Column names that actually reach the parquet scan (column
    pruning check — ReadSchema in the formatted plan)."""
    import re

    plan = formatted_plan(df)
    cols: list[str] = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", plan):
        cols.extend(
            c.split(":")[0].strip() for c in m.group(1).split(",") if c.strip()
        )
    return cols
