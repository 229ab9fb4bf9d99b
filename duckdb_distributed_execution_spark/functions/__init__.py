"""Column-level helper functions — all JVM-side built-ins.

Two concerns live here:

1. **Deterministic aggregation** — floating-point SUM/AVG depend on
   accumulation order, which differs between engines and between runs
   at different partition counts. ``exact_sum``/``exact_avg`` route
   double columns through exact decimal arithmetic so results are
   bit-identical across Spark and the DuckDB oracle (and across
   cluster sizes — a correctness property the reference never had:
   its AVG merge is self-admittedly wrong,
   result_merger.cpp:42-45).

2. **Vector math for the similarity/dedup operators** — cosine/dot
   products over ``array<float>`` columns using ``F.zip_with`` +
   ``F.aggregate``, staying inside whole-stage codegen instead of
   Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Scale 6 losslessly represents any value that originated as a
# ≤2-decimal literal or a product of up to three of them (2+2+2
# decimals), so the double→decimal cast never sits on a rounding tie
# and both engines land on the same decimal. 28 digits total keeps
# sums of ~1e16 such values in range.
EXACT_DECIMAL = "decimal(28,6)"


def exact_sum(col: Column | str) -> Column:
    """Order-independent SUM for double columns: exact decimal
    accumulation, surfaced as DOUBLE. Matches the DuckDB oracle form
    ``CAST(SUM(CAST(x AS DECIMAL(28,6))) AS DOUBLE)`` bit-for-bit."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(EXACT_DECIMAL)).cast("double")


def exact_avg(col: Column | str) -> Column:
    """Order-independent AVG: exact decimal sum divided by count, both
    as doubles — a single IEEE division, identical on any engine.
    Oracle form: ``CAST(SUM(CAST(x AS DECIMAL(28,6))) AS DOUBLE) /
    COUNT(x)``."""
    c = F.col(col) if isinstance(col, str) else col
    return exact_sum(c) / F.count(c)


def oracle_exact_sum(expr: str) -> str:
    """DuckDB SQL text mirroring exact_sum()."""
    return f"CAST(SUM(CAST({expr} AS DECIMAL(28,6))) AS DOUBLE)"


def oracle_exact_avg(expr: str) -> str:
    return f"(CAST(SUM(CAST({expr} AS DECIMAL(28,6))) AS DOUBLE) / COUNT({expr}))"


# ---------------------------------------------------------------------------
# Vector ops (array<float|double> columns)
# ---------------------------------------------------------------------------

def dot_product(a: Column, b: Column) -> Column:
    """Sequential left-to-right double fold of elementwise products —
    whole-stage-codegen'd, no Python."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine_similarity(a: Column, b: Column) -> Column:
    return dot_product(a, b) / (l2_norm(a) * l2_norm(b))


def l2_distance(a: Column, b: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.zip_with(
                a, b,
                lambda x, y: (x.cast("double") - y.cast("double"))
                * (x.cast("double") - y.cast("double")),
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )
