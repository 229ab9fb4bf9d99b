"""Skew mitigation — salting for hot keys.

AQE's skew-join splitting (``spark.sql.adaptive.skewJoin.enabled``,
on by default in the Engine session) handles most skew at runtime by
splitting oversized shuffle partitions. These helpers cover the cases
AQE can't:

- ``salted_aggregate`` — two-phase aggregation when a single GROUP BY
  key dominates (AQE cannot split one key's hash bucket): phase 1
  groups on (key, salt) — map-side combine now spreads the hot key
  over N reducers — phase 2 re-merges the N partials. Only works for
  decomposable aggregates; the helpers take (partial, final) column
  factories.
- ``salted_join`` — replicate the small side N ways, salt the skewed
  fact side randomly... except nothing here is random: the salt is a
  deterministic hash of a secondary column, so results are stable and
  test-checkable.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _salt(col: Column, n: int) -> Column:
    # Deterministic salt from a secondary column — stable across runs
    # (no rand(): results must be reproducible and oracle-checkable).
    return F.pmod(F.xxhash64(col), F.lit(n))


def salted_aggregate(
    df: DataFrame,
    key: str,
    salt_source: str,
    partials: dict[str, Callable[[], Column]],
    finals: dict[str, Callable[[str], Column]],
    num_salts: int = 16,
) -> DataFrame:
    """Two-phase GROUP BY ``key`` with the hot key spread over
    ``num_salts`` reducers.

    ``partials[name]()`` builds the phase-1 aggregate column;
    ``finals[name](partial_col)`` re-merges phase-1 results (e.g.
    partial COUNT → SUM, partial SUM → SUM, partial MIN → MIN)."""
    phase1 = (
        df.withColumn("__salt", _salt(F.col(salt_source), num_salts))
        .groupBy(key, "__salt")
        .agg(*[c().alias(f"__p_{name}") for name, c in partials.items()])
    )
    return phase1.groupBy(key).agg(
        *[c(f"__p_{name}").alias(name) for name, c in finals.items()]
    )


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: str,
    salt_source: str,
    num_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Shuffle join with the fact side salted and the dim side
    replicated ``num_salts`` ways, so one hot join key spreads over
    ``num_salts`` reducers instead of one. Use when the dim side is
    too big to broadcast AND the key histogram is spiked."""
    f_s = fact.withColumn("__salt", _salt(F.col(salt_source), num_salts))
    d_s = dim.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(num_salts - 1)))
    )
    out = f_s.join(d_s, on=[on, "__salt"], how=how)
    return out.drop("__salt")
