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
   ``F.aggregate``. These higher-order functions run INTERPRETED on
   the JVM (they break whole-stage codegen), but they still beat
   row-at-a-time Python UDFs by avoiding serialization; for hot
   verify paths use the Arrow-batched numpy matmul variants in
   operators/similarity.py (``cosine_verify_numpy``) instead.
"""

from __future__ import annotations

import re
import weakref

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Operator-internal lazy persists (the minhash/ngram/setsim signature
# relations, the k-core edge list, the BPE merge-loop state) are never
# unpersisted by their lazy consumers, so a long-lived multi-query
# session accumulates cached relations (guide §5: unpersist when
# done; bench.py and the plan-pin tests clearCache around them, but a
# real Engine session has no such sweep). Every such persist registers
# here — weak-keyed by the session object so a dropped session frees
# its entries — and Engine.release_operator_caches() unpersists them
# without touching user-managed caches (cache_table / persist calls
# outside the operators).
_TRACKED_PERSISTS: "weakref.WeakKeyDictionary" = weakref.WeakKeyDictionary()


def persist_tracked(df, level=None):
    """``df.persist(level)`` + registration for facade-level release.
    ``level=None`` keeps pyspark's own default storage level."""
    df = df.persist() if level is None else df.persist(level)
    _TRACKED_PERSISTS.setdefault(df.sparkSession, []).append(df)
    return df


def release_operator_persists(spark) -> int:
    """Unpersist every operator-internal tracked persist on this
    session (blocking=False — async block drop, like unpersist()'s
    default). Returns the number of relations released."""
    dfs = _TRACKED_PERSISTS.pop(spark, [])
    for df in dfs:
        df.unpersist()
    return len(dfs)


# Defensive ceiling for the size-gated fused single-task kernels
# (guide §1.2). Every query site routes to a fused kernel only below
# a ~4 MB table_bytes gate (≲50k rows in this repo's corpora), but the
# operators themselves must defend: an ungated future caller passing a
# large relation would otherwise get a silent one-task death march.
# Counted at RUNTIME inside the kernel (driver-side Catalyst estimates
# are unknown for mid-pipeline relations), ~40× above any gated input
# so it can only fire on misuse.
FUSED_KERNEL_MAX_ROWS = 2_000_000


def check_fused_input_rows(n_rows: int, what: str, limit: int | None = None) -> None:
    """Raise if a single-task fused kernel received more rows than any
    gated caller can send — fail loudly instead of serializing a
    large corpus through one task (r9 verdict, What's wrong #5).
    Kernels capture ``limit`` driver-side at construction (the module
    global is read where the operator is built, so tests can lower it;
    executor workers re-import this module and would not see a
    monkeypatched value)."""
    if limit is None:
        limit = FUSED_KERNEL_MAX_ROWS
    if n_rows > limit:
        raise RuntimeError(
            f"{what}: fused single-task kernel received {n_rows} rows "
            f"(max {limit}); this path exists for inputs under the "
            "~4 MB scale gate — route large inputs through the "
            "distributed form"
        )


def local_rows_df(spark, rows, schema):
    """Small driver-side relation as a DataFrame WITHOUT the
    default-parallelism Python-slice tax (guide §4: every Python path
    pays the JVM↔Python boundary). ``createDataFrame(list, schema)``
    parallelizes the pickled rows into defaultParallelism slices, and
    every plan execution then evaluates each slice through its own
    Python-worker read — measured 0.46 s steady-state for a 10-row
    relation at local[32], and 5+ s when a later ``coalesce(1)``
    evaluates the 32 slices sequentially in one task. Slicing by the
    data instead (one slice per ~10k rows) makes the same relation
    cost ~0.2 s. Use for every broadcast-lookup/offset/centroid-style
    relation built from driver-side rows."""
    rows = list(rows)
    n = max(
        1,
        min(
            len(rows) // 10_000 + 1,
            spark.sparkContext.defaultParallelism,
        ),
    )
    if isinstance(schema, str):
        schema = T.StructType.fromDDL(schema)
    return spark.createDataFrame(
        spark.sparkContext.parallelize(rows, n), schema
    )

# Scale 6 losslessly represents any value that originated as a
# ≤2-decimal literal or a product of up to three of them (2+2+2
# decimals), so the double→decimal cast never sits on a rounding tie
# and both engines land on the same decimal. 28 digits total keeps
# sums of ~1e16 such values in range.
EXACT_DECIMAL = "decimal(28,6)"


# Fixed-point scale for the fast exact path: 10^6 covers any value
# that originated as a ≤2-decimal literal or a product of up to three
# of them.
_SCALE = 1_000_000.0


def exact_sum(col: Column | str, wide: bool = False) -> Column:
    """Order-independent SUM for double columns, surfaced as DOUBLE.

    Fast path (default): scale to 6 fixed decimals, snap to LONG via
    ``floor(x·10⁶ + 0.5)``, sum longs (whole-stage-codegen primitive),
    divide back. Exact because the scaled values are integers and long
    addition is associative; Spark runs ANSI mode, so a sum beyond
    ±2^63 (≈9.2e12 in value units) raises ARITHMETIC_OVERFLOW rather
    than wrapping — pass ``wide=True`` to use DECIMAL(28,6)
    accumulation (range 1e22) for columns whose global sum can exceed
    that, e.g. petabyte-scale money totals.

    Why floor-plus-half instead of ``round()``: Spark's round(double)
    drops out of codegen into a per-row BigDecimal conversion — the
    floor form is ~2× faster on an aggregation-bound scan (measured
    at sf0.1) and stays in Math.floor. Tie semantics become
    round-half-toward-+∞ for negatives, but values that originated as
    ≤2-decimal literals (or products of up to three) never sit on the
    micro-scale tie boundary, and the oracle computes the *identical*
    IEEE expression, so cross-engine parity is bit-exact either way.

    Oracle form: ``(SUM(CAST(floor(x * 1000000.0 + 0.5) AS BIGINT)) /
    1000000.0)`` — DuckDB sums into int128, and both engines convert
    the identical integer to double before the final division."""
    c = F.col(col) if isinstance(col, str) else col
    if wide:
        return F.sum(c.cast(EXACT_DECIMAL)).cast("double")
    return F.sum(F.floor(c * F.lit(_SCALE) + F.lit(0.5))) / F.lit(_SCALE)


def exact_sum_partial(col: Column | str) -> Column:
    """Scaled-long PARTIAL of exact_sum for aggregation-below-join
    rewrites: ``sum(floor(x·10⁶ + 0.5))`` kept as a LONG so a later
    ``exact_sum_final`` can re-aggregate the partials exactly (long
    addition is associative — regrouping partial sums is lossless,
    which a double partial would not be). Use when a fact table is
    collapsed per join key before the shuffle and the true group key
    only becomes available after the join."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(F.floor(c * F.lit(_SCALE) + F.lit(0.5)))


def exact_sum_final(col: Column | str) -> Column:
    """FINAL of exact_sum over exact_sum_partial columns — surfaced
    as DOUBLE, bit-identical to a one-shot exact_sum over the
    original rows (and to oracle_exact_sum)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c) / F.lit(_SCALE)


def exact_avg(col: Column | str, wide: bool = False) -> Column:
    """Order-independent AVG: exact sum divided by count, both doubles
    — a single IEEE division, identical on any engine."""
    c = F.col(col) if isinstance(col, str) else col
    return exact_sum(c, wide=wide) / F.count(c)


def spark_exact_sum(expr: str) -> Column:
    """Single-parse Spark-SQL twin of ``exact_sum`` over an expression
    STRING — one py4j round trip instead of ~8 Column calls. Round-9
    profiling showed Python-side plan construction was ~25% of the
    sf0.1 bench wall, nearly all py4j socket latency; the hot builders
    now ship one SQL string per aggregate and let the JVM parser build
    the tree. The ``D`` suffixes are load-bearing: a bare
    ``1000000.0`` parses as DECIMAL(8,1) in SQL text and silently
    retypes the whole aggregate to decimal — with ``D`` every
    intermediate is a DOUBLE, and the result is bit-identical to the
    Column form (pinned in tests/test_properties.py)."""
    return F.expr(
        f"(sum(CAST(floor(({expr}) * 1000000.0D + 0.5D) AS BIGINT))"
        " / 1000000.0D)"
    )


def spark_exact_avg(expr: str) -> Column:
    """Single-parse twin of ``exact_avg`` (see spark_exact_sum)."""
    return F.expr(
        f"((sum(CAST(floor(({expr}) * 1000000.0D + 0.5D) AS BIGINT))"
        f" / 1000000.0D) / count({expr}))"
    )


def oracle_exact_sum(expr: str, wide: bool = False) -> str:
    """DuckDB SQL text mirroring exact_sum()."""
    if wide:
        return f"CAST(SUM(CAST({expr} AS DECIMAL(28,6))) AS DOUBLE)"
    return (
        f"(SUM(CAST(floor(({expr}) * 1000000.0 + 0.5) AS BIGINT))"
        " / 1000000.0)"
    )


def oracle_exact_avg(expr: str, wide: bool = False) -> str:
    return f"({oracle_exact_sum(expr, wide)} / COUNT({expr}))"


def exact_avg_rounded(col: Column | str) -> Column:
    """AVG rounded to 6 decimals with the round-half-away decision
    made in INTEGER space — engine-exact even when the true quotient
    sits exactly on a rounding boundary.

    ``ROUND(avg_double, 6)`` is NOT portable there: Spark rounds the
    shortest decimal repr of the double (BigDecimal HALF_UP), DuckDB
    rounds in binary — with micro-scaled integer sums the quotient
    lands exactly on *.5 micros often enough to matter (seen at
    sf0.1: 192-vector centroid off by 1e-6). Here:
    q = (2·|S| + n) int-div (2·n), micro = sign(S)·q — pure long
    arithmetic both engines compute identically: the int-div is
    Spark's integral ``div`` ≡ DuckDB ``//``, so the quotient stays
    in integer space end-to-end (no 2^53 double-mantissa ceiling; the
    one remaining bound is 2·|S|+n overflowing int64, which ANSI mode
    raises on rather than wrapping — same contract as exact_sum)."""
    c = F.col(col) if isinstance(col, str) else col
    s = F.sum(F.floor(c * F.lit(_SCALE) + F.lit(0.5)))
    n = F.count(c)
    x = F.lit(2) * F.abs(s) + n
    d = F.lit(2) * n
    q = F.call_function("div", x, d)
    micro = F.when(s >= 0, q).otherwise(-q)
    return micro.cast("double") / F.lit(_SCALE)


def oracle_exact_avg_rounded(expr: str) -> str:
    """DuckDB SQL mirroring exact_avg_rounded()."""
    s = f"CAST(SUM(CAST(floor(({expr}) * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT)"
    n = f"COUNT({expr})"
    x = f"(2 * abs({s}) + {n})"
    d = f"(2 * {n})"
    q = f"CAST(({x} // {d}) AS BIGINT)"
    return (
        f"(CAST(CASE WHEN {s} >= 0 THEN {q} ELSE -{q} END AS DOUBLE)"
        " / 1000000.0)"
    )


# ---------------------------------------------------------------------------
# Vector ops (array<float|double> columns)
# ---------------------------------------------------------------------------

_REPARTITION_TRUE_RE = re.compile(r"Repartition \d+, true")


def ensure_min_parallelism(df):
    """Repartition ``df`` up to the cluster's default parallelism when
    its plan would otherwise run on fewer tasks (a single-row-group
    parquet file yields 1-2 input splits regardless of
    maxPartitionBytes, serializing any CPU-heavy stage pinned to the
    scan — interpreted higher-order folds, explode+partial-agg
    tokenization, Arrow/python stages). No-op when the input is
    already well-partitioned, so at production scale (many files/row
    groups) this never adds a shuffle; at toy/badly-compacted scale it
    trades one narrow-row shuffle for N-way compute. Call it on the
    NARROW projected relation feeding the heavy stage, not the raw
    table, so the shuffle moves minimal bytes."""
    sc = df.sparkSession.sparkContext
    # Under AQE, ``df.rdd`` FORCES execution of every upstream query
    # stage just to read a partition count — on a python-kernel chain
    # (assign→encode) that silently runs the whole chain once and
    # throws the result away (measured ~3× the real cost of the
    # wave-62 serve at sf1, round 9). When the plan already contains
    # an explicit-parallelism producer — a user repartition (shuffling
    # ``Repartition N, true`` / ``RepartitionByExpression``; AQE never
    # coalesces those) or a MapInPandas (partition-preserving, and
    # every kernel in this repo min-parallelizes its own input) — the
    # probe can't change anything: skip it. ``coalesce(n)`` renders as
    # ``Repartition n, false`` and REDUCES parallelism, so it must NOT
    # match (it is exactly the narrow-input case the helper fixes).
    plan = df._jdf.queryExecution().analyzed().toString()
    if (
        _REPARTITION_TRUE_RE.search(plan)
        or "RepartitionByExpression" in plan
        or "MapInPandas" in plan
    ):
        return df
    if df.rdd.getNumPartitions() >= sc.defaultParallelism:
        return df
    # Size the fan-out from the INPUT, not the cluster (guide §2:
    # scale-adaptive partitioning). A warm Python stage costs ~15 ms
    # of worker handshake per CONCURRENT task on top of the compute —
    # measured at local[32] on a 10-row identity mapInPandas: 32
    # tasks 0.48-0.57 s steady-state vs 8 tasks 0.24-0.32 vs 1 task
    # 0.17 — so blasting a toy input across every core is pure
    # overhead, while a starved big input serializes real compute.
    # One task per ~64 KB of estimated input (≈250 KB raw text ≈ a
    # few hundred docs ≈ 15-30 ms of kernel compute) reaches the full
    # defaultParallelism by a few MB, i.e. everywhere the fan-out
    # matters; unknown stats (MaxValue sentinel) hit the cap.
    est = int(df._jdf.queryExecution().optimizedPlan().stats()
              .sizeInBytes())
    target = min(sc.defaultParallelism, max(4, est // (64 * 1024)))
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)


def dot_product(a: Column, b: Column) -> Column:
    """Sequential left-to-right double fold of elementwise products.

    JVM-side (no Python round-trip) but NOT whole-stage-codegen'd:
    Spark evaluates higher-order functions (aggregate/zip_with)
    interpreted (see operators/rowid.py keyed_row_number notes).
    Fine for bucket/signature passes over the corpus; for a hot
    verify stage over >~100k candidate PAIRS prefer the Arrow-batched
    numpy path (operators/similarity.py::cosine_verify_numpy) — at
    187k 64-dim pairs numpy SIMD beats the interpreted fold (measured
    round 4, see commit message)."""
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
