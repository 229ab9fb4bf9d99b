"""Recursive CTE — Spark has no WITH RECURSIVE (the reference
recognizes RECURSIVE_CTE and delegates to single-node DuckDB,
query_plan_analyzer.cpp:141-142). The standard Spark re-expression is
a driver-side fixpoint loop over distributed steps: each iteration is
a full DataFrame program (distributed), only the loop control runs on
the driver, and the accumulated result is a lazy union tree.

``localCheckpoint`` (or caching) every few iterations keeps the plan
from growing unboundedly — without it, iteration N replans the whole
lineage of iterations 1..N-1."""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame


def recursive_cte(
    seed: DataFrame,
    step: Callable[[DataFrame], DataFrame],
    max_iterations: int = 100,
    checkpoint_every: int = 8,
) -> DataFrame:
    """UNION ALL semantics of ``WITH RECURSIVE t AS (seed UNION ALL
    step(t))``: iterate ``step`` on the previous frontier until it is
    empty, accumulating all rows."""
    acc = seed
    frontier = seed
    for i in range(max_iterations):
        frontier = step(frontier)
        if (i + 1) % checkpoint_every == 0:
            frontier = frontier.localCheckpoint(eager=True)
        if frontier.isEmpty():
            return acc
        acc = acc.unionAll(frontier)
    raise RuntimeError(f"recursive_cte did not converge in {max_iterations} iterations")
