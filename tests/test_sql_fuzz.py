"""Grammar-based SQL fuzz parity: randomly generated (seeded,
deterministic) queries from a portable SELECT/WHERE/GROUP BY grammar
run as the SAME SQL text through the dialect shim on Spark and
directly on DuckDB, results compared with the selfcheck
canonicalization. This exercises engine parity on queries nobody
hand-picked — the named inventory checks what we claimed, the fuzzer
checks what we didn't think of.

The grammar deliberately stays inside the cross-engine-deterministic
subset (see queries/__init__ conventions): integer/string/date
columns, COUNT/MIN/MAX/SUM-of-integers aggregates (no double
accumulation), set-semantics outputs (no bare LIMIT without total
order).
"""

from __future__ import annotations

import random

import pytest

from tests.conftest import SF_ORACLE
from tools.selfcheck import table_hash

INT_COLS = ["l_orderkey", "l_partkey", "l_suppkey", "l_linenumber"]
STR_COLS = ["l_returnflag", "l_linestatus"]
ALL_COLS = INT_COLS + STR_COLS

N_QUERIES = 180
SEED = 20260814


def _pred(rng: random.Random) -> str:
    kind = rng.randrange(6)
    if kind == 5:
        d = f"1997-{rng.randrange(1, 13):02d}-{rng.randrange(1, 29):02d}"
        op = rng.choice(["<", ">=", ">"])
        return f"l_shipdate {op} TIMESTAMP '{d}'"
    if kind == 0:
        c = rng.choice(INT_COLS)
        op = rng.choice(["<", "<=", ">", ">=", "=", "<>"])
        return f"{c} {op} {rng.randrange(1, 60000)}"
    if kind == 1:
        c = rng.choice(STR_COLS)
        v = rng.choice(["A", "N", "R", "O", "F"])
        return f"{c} {rng.choice(['=', '<>'])} '{v}'"
    if kind == 2:
        c = rng.choice(INT_COLS)
        lo = rng.randrange(1, 30000)
        return f"{c} BETWEEN {lo} AND {lo + rng.randrange(1, 30000)}"
    if kind == 3:
        c = rng.choice(INT_COLS)
        vals = ", ".join(str(rng.randrange(0, 8)) for _ in range(3))
        return f"{c} % 10 IN ({vals})"
    return f"{rng.choice(ALL_COLS)} IS NOT NULL"


def _where(rng: random.Random) -> str:
    n = rng.randrange(3)
    if n == 0:
        return ""
    preds = [_pred(rng) for _ in range(n)]
    return " WHERE " + f" {rng.choice(['AND', 'OR'])} ".join(preds)


def _agg(rng: random.Random, i: int) -> str:
    kind = rng.randrange(4)
    if kind == 0:
        return f"COUNT(*) AS a{i}"
    if kind == 1:
        return f"COUNT({rng.choice(ALL_COLS)}) AS a{i}"
    if kind == 2:
        return f"{rng.choice(['MIN', 'MAX'])}({rng.choice(ALL_COLS)}) AS a{i}"
    return f"SUM({rng.choice(INT_COLS)}) AS a{i}"


def _query(rng: random.Random) -> str:
    form = rng.random()
    if form < 0.3:
        # grouped aggregate, sometimes with HAVING
        keys = rng.sample(STR_COLS + ["l_linenumber"], rng.randrange(1, 3))
        aggs = [_agg(rng, i) for i in range(rng.randrange(1, 4))]
        having = (
            f" HAVING COUNT(*) > {rng.randrange(1, 500)}"
            if rng.random() < 0.4
            else ""
        )
        return (
            f"SELECT {', '.join(keys + aggs)} FROM lineitem"
            f"{_where(rng)} GROUP BY {', '.join(keys)}{having}"
        )
    if form < 0.35:
        # grouping sets / rollup / cube over two keys. No WHERE: the
        # engines genuinely diverge on EMPTY input (DuckDB emits the
        # grand-total () row per the standard; Spark's Expand-based
        # grouping sets emit nothing) — documented in dialect.py; the
        # fuzzer checks the shared non-empty semantics.
        k1, k2 = rng.sample(STR_COLS + ["l_linenumber"], 2)
        agg = _agg(rng, 0)
        shape = rng.choice(
            [
                f"GROUPING SETS (({k1}), ({k1}, {k2}), ())",
                f"ROLLUP ({k1}, {k2})",
                f"CUBE ({k1}, {k2})",
            ]
        )
        return f"SELECT {k1}, {k2}, {agg} FROM lineitem GROUP BY {shape}"
    if form < 0.4:
        # DISTINCT projection
        cols = rng.sample(ALL_COLS, rng.randrange(1, 3))
        return (
            f"SELECT DISTINCT {', '.join(cols)} FROM lineitem{_where(rng)}"
        )
    if form < 0.5:
        # UNION ALL / UNION of two filtered slices of the same shape
        cols = rng.sample(ALL_COLS, rng.randrange(1, 3))
        op = rng.choice(["UNION ALL", "UNION"])
        return (
            f"SELECT {', '.join(cols)} FROM lineitem{_where(rng)} "
            f"{op} SELECT {', '.join(cols)} FROM lineitem{_where(rng)}"
        )
    if form < 0.55:
        # correlated EXISTS / NOT EXISTS / IN subquery over the fact
        sub = rng.choice(
            [
                "EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey"
                f" AND l_quantity > {rng.randrange(10, 50)})",
                "NOT EXISTS (SELECT 1 FROM lineitem WHERE"
                " l_orderkey = o_orderkey"
                f" AND l_linenumber >= {rng.randrange(2, 7)})",
                "o_orderkey IN (SELECT l_orderkey FROM lineitem WHERE"
                f" l_suppkey % 5 = {rng.randrange(5)})",
            ]
        )
        return (
            f"SELECT o_orderstatus, COUNT(*) AS n FROM orders o "
            f"WHERE {sub} GROUP BY o_orderstatus"
        )
    if form < 0.7:
        # lineitem ⋈ orders equi-join, grouped on an orders attribute
        key = rng.choice(["o_orderstatus", "o_orderpriority"])
        aggs = [_agg(rng, i) for i in range(rng.randrange(1, 3))]
        how = rng.choice(["JOIN", "LEFT JOIN"])
        return (
            f"SELECT {key}, {', '.join(aggs)} FROM orders "
            f"{how} lineitem ON l_orderkey = o_orderkey"
            f"{_where_join(rng)} GROUP BY {key}"
        )
    if form < 0.8:
        # window functions — deterministic: row_number orders by the
        # (l_orderkey, l_linenumber) unique composite; rank/sum windows
        # are value-deterministic regardless of peer order
        part = rng.choice(STR_COLS)
        fn = rng.choice(
            [
                "ROW_NUMBER() OVER (PARTITION BY {p} "
                "ORDER BY l_orderkey, l_linenumber)",
                "RANK() OVER (PARTITION BY {p} ORDER BY l_orderkey)",
                "DENSE_RANK() OVER (PARTITION BY {p} ORDER BY l_linenumber)",
                "SUM(l_linenumber) OVER (PARTITION BY {p})",
                "COUNT(*) OVER (PARTITION BY {p})",
                "MIN(l_orderkey) OVER (PARTITION BY {p} "
                "ORDER BY l_orderkey, l_linenumber ROWS BETWEEN 2 PRECEDING "
                "AND CURRENT ROW)",
            ]
        ).format(p=part)
        return (
            f"SELECT l_orderkey, l_linenumber, {part}, {fn} AS w "
            f"FROM lineitem{_where(rng)}"
        )
    if form < 0.84:
        # QUALIFY top-k per group through the dialect shim (rewritten
        # to an outer helper-column filter; DuckDB runs it natively)
        part = rng.choice(STR_COLS)
        k = rng.randrange(1, 5)
        return (
            f"SELECT {part}, l_orderkey, l_linenumber FROM lineitem"
            f"{_where(rng)} "
            f"QUALIFY ROW_NUMBER() OVER (PARTITION BY {part} "
            f"ORDER BY l_orderkey, l_linenumber) <= {k}"
        )
    if form < 0.88:
        # ORDER BY + LIMIT over the unique composite — a well-defined
        # subset, so the order-insensitive hash still pins it exactly
        cols = rng.sample(ALL_COLS, rng.randrange(1, 3))
        sel = ", ".join(dict.fromkeys(cols + ["l_orderkey", "l_linenumber"]))
        return (
            f"SELECT {sel} FROM lineitem{_where(rng)} "
            f"ORDER BY l_orderkey, l_linenumber LIMIT {rng.randrange(1, 400)}"
        )
    if form < 0.92:
        # INTERSECT / EXCEPT of two filtered slices (set semantics)
        cols = rng.sample(ALL_COLS, rng.randrange(1, 3))
        op = rng.choice(["INTERSECT", "EXCEPT"])
        return (
            f"SELECT {', '.join(cols)} FROM lineitem{_where(rng)} "
            f"{op} SELECT {', '.join(cols)} FROM lineitem{_where(rng)}"
        )
    if form < 0.96:
        # CTE feeding a grouped aggregate
        key = rng.choice(STR_COLS + ["l_linenumber"])
        agg = _agg(rng, 0)
        return (
            f"WITH t AS (SELECT * FROM lineitem{_where(rng)}) "
            f"SELECT {key}, {agg} FROM t GROUP BY {key}"
        )
    # plain projection with portable scalar expressions (CAST through
    # the :: shim syntax, CASE WHEN, string functions, || concat)
    cols = rng.sample(ALL_COLS, rng.randrange(1, 3))
    proj = list(cols)
    extra = rng.randrange(4)
    if extra == 0:
        proj.append(f"({rng.choice(INT_COLS)} % 97)::VARCHAR AS tag")
    elif extra == 1:
        proj.append(
            f"CASE WHEN {rng.choice(INT_COLS)} % 2 = 0 THEN 'even' "
            f"ELSE 'odd' END AS par"
        )
    elif extra == 2:
        proj.append(
            rng.choice(
                [
                    "upper(l_returnflag) AS s",
                    "length(l_linestatus) AS s",
                    "substr(l_returnflag, 1, 1) AS s",
                    "l_returnflag || '_' || l_linestatus AS s",
                    "lower(l_returnflag || l_linestatus) AS s",
                    "CAST(EXTRACT(YEAR FROM l_shipdate) AS BIGINT) AS s",
                    "CAST(EXTRACT(MONTH FROM l_shipdate) AS BIGINT) AS s",
                    "date_trunc('month', l_shipdate) AS s",
                    "CAST(l_shipdate AS DATE) AS s",
                    # dialect-shim operator surface (^/** are power in
                    # DuckDB; ~ is a FULL regex match; values kept
                    # integer-exact so the double results hash-match)
                    "(l_linenumber % 5) ^ 2 AS s",
                    "2 ** (l_suppkey % 6) AS s",
                    "-2 ^ (l_linenumber % 3) AS s",
                    "l_returnflag ~ '[A-Z]' AS s",
                    "l_returnflag !~ '[NR]' AS s",
                    "(l_returnflag || l_linestatus) ~~ 'A%' AS s",
                    "strftime(l_shipdate, '%Y-%m') AS s",
                    "strftime(l_shipdate, '%j/%d') AS s",
                    "date_diff('month', DATE '1995-01-15', l_shipdate) AS s",
                    "date_diff('week', DATE '1996-01-01', l_shipdate) AS s",
                    "epoch(l_shipdate) AS s",
                ]
            )
        )
    return f"SELECT {', '.join(proj)} FROM lineitem{_where(rng)}"


def _where_join(rng: random.Random) -> str:
    # join-safe predicates reference the orders side (always present
    # on both engines for inner and left joins)
    n = rng.randrange(2)
    if n == 0:
        return ""
    kind = rng.randrange(3)
    if kind == 0:
        return f" WHERE o_custkey % 7 = {rng.randrange(7)}"
    if kind == 1:
        return f" WHERE o_orderkey < {rng.randrange(1000, 40000)}"
    return f" WHERE o_orderstatus <> '{rng.choice(['O', 'F', 'P'])}'"


def _gen_queries():
    rng = random.Random(SEED)
    return [(i, _query(rng)) for i in range(N_QUERIES)]


@pytest.fixture(scope="module")
def fuzz_env(spark, duck):
    from duckdb_distributed_execution_spark.queries import load

    load(spark, SF_ORACLE, "lineitem", "orders")
    return spark, duck


def _run_parity(fuzz_env, sql):
    from duckdb_distributed_execution_spark.dialect import transpile

    spark, duck = fuzz_env
    sdf = spark.sql(transpile(sql))
    srows = [tuple(r) for r in sdf.collect()]
    cur = duck.execute(sql)
    dcols = [d[0] for d in cur.description]
    drows = cur.fetchall()
    assert len(srows) == len(drows), f"row count mismatch for: {sql}"
    assert sorted(c.lower() for c in sdf.columns) == sorted(
        c.lower() for c in dcols
    ), f"schema mismatch for: {sql}"
    sh, _ = table_hash(srows, [c.lower() for c in sdf.columns])
    dh, _ = table_hash(drows, [c.lower() for c in dcols])
    assert sh == dh, f"value mismatch for: {sql}"


@pytest.mark.parametrize("i,sql", _gen_queries())
def test_fuzz_query_parity(fuzz_env, i, sql):
    _run_parity(fuzz_env, sql)


# ---------------------------------------------------------------------------
# Wave 2 (round-5): scalar-expression parity — the surface the round-5
# operators lean on (replace() scan chains, quantized ln/exp, modular
# arithmetic) fuzzed as GROUP-BY-expression queries. Separate seed so
# the original 180 queries stay byte-identical.
# ---------------------------------------------------------------------------

N_QUERIES2 = 30
SEED2 = 20260815


def _scalar2(rng: random.Random) -> str:
    kind = rng.randrange(5)
    if kind == 0:
        # nested replace chain (the BPE-encode primitive)
        a, b = rng.sample(["A", "N", "R", "O", "F"], 2)
        return (
            f"replace(replace(l_returnflag || l_linestatus,"
            f" '{a}', 'xx'), '{b}', 'y')"
        )
    if kind == 1:
        # quantized ln on a positive integer expression (the LM
        # scoring primitive: identical doubles, order-free longs)
        m = rng.randrange(7, 97)
        return (
            f"CAST(round(ln(CAST(l_orderkey % {m} + 1 AS DOUBLE))"
            " * 1000000.0) AS BIGINT)"
        )
    if kind == 2:
        # quantized exp of a bounded integer ratio
        m = rng.randrange(3, 9)
        return (
            f"CAST(round(exp(CAST(l_linenumber % {m} AS DOUBLE)"
            f" / {m}.0) * 1000000.0) AS BIGINT)"
        )
    if kind == 3:
        m = rng.randrange(5, 50)
        return f"(l_orderkey * 7 + l_suppkey * 3) % {m}"
    return (
        f"length(replace(l_returnflag || l_linestatus,"
        f" '{rng.choice(['A', 'N', 'R'])}', ''))"
    )


def _query2(rng: random.Random) -> str:
    expr = _scalar2(rng)
    if rng.random() < 0.5:
        return (
            f"SELECT {expr} AS k, COUNT(*) AS n FROM lineitem"
            f"{_where(rng)} GROUP BY 1"
        )
    return (
        f"SELECT l_linenumber, {expr} AS k FROM lineitem{_where(rng)}"
    )


def _gen_queries2():
    rng = random.Random(SEED2)
    return [(i, _query2(rng)) for i in range(N_QUERIES2)]


@pytest.mark.parametrize("i,sql", _gen_queries2())
def test_fuzz_scalar_parity(fuzz_env, i, sql):
    _run_parity(fuzz_env, sql)
