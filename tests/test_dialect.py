"""DuckDB-dialect shim tests: the same DuckDB SQL text runs on real
DuckDB and (transpiled) on Spark, and the results must match — the
"a user of the reference pastes their query unchanged" contract."""

from __future__ import annotations

import math

import pytest

from duckdb_distributed_execution_spark.dialect import transpile
from tests.conftest import SF_ORACLE


def _canon(v):
    if isinstance(v, float):
        return round(v, 9)
    return v


def _run_both(spark, duck, sql: str):
    from duckdb_distributed_execution_spark.queries import load

    load(spark, SF_ORACLE)
    got = sorted(
        tuple(_canon(v) for v in r) for r in spark.sql(transpile(sql)).collect()
    )
    exp = sorted(
        tuple(_canon(v) for v in r) for r in duck.execute(sql).fetchall()
    )
    assert got == exp, f"{got[:3]} != {exp[:3]}"


def test_colon_cast_and_intdiv(spark, duck):
    _run_both(
        spark, duck,
        "SELECT n_nationkey::VARCHAR AS s, n_nationkey // 3 AS q "
        "FROM nation",
    )


def test_chained_and_paren_cast(spark, duck):
    _run_both(
        spark, duck,
        "SELECT (n_nationkey + 1)::BIGINT::VARCHAR AS s FROM nation "
        "WHERE n_nationkey::INT2 < 10",
    )


def test_exclude_rewrite(spark, duck):
    _run_both(
        spark, duck,
        "SELECT * EXCLUDE (r_name) FROM region",
    )


def test_qualify_rewrite(spark, duck):
    _run_both(
        spark, duck,
        "SELECT o_orderkey, o_orderstatus FROM orders "
        "QUALIFY row_number() OVER (PARTITION BY o_orderstatus "
        "ORDER BY o_orderkey) <= 2",
    )


def test_list_function_renames(spark, duck):
    _run_both(
        spark, duck,
        "SELECT n_nationkey, list_contains(list_value(1, 2, 3), "
        "n_nationkey % 4) AS hit FROM nation",
    )


def test_catalog_prefix_strip(spark, duck):
    from duckdb_distributed_execution_spark.queries import load

    load(spark, SF_ORACLE)
    got = spark.sql(
        transpile("SELECT COUNT(*) AS n FROM dh.region", catalog="dh")
    ).collect()[0].n
    assert got == 5


def test_strings_and_comments_untouched():
    sql = (
        "SELECT 'a::b' AS lit, \"weird//name\" -- c::d comment\n"
        "FROM t"
    )
    out = transpile(sql, catalog=None)
    assert "'a::b'" in out and '"weird//name"' in out
    assert "c::d comment" in out
    assert "CAST" not in out


def test_hugeint_alias():
    out = transpile("SELECT x::HUGEINT FROM t", catalog=None)
    assert "CAST(x AS DECIMAL(38,0))" in out


def test_literal_cast(spark, duck):
    # ADVICE r1: '...'::TYPE spans a literal + code token boundary and
    # used to emit an empty-operand CAST.
    _run_both(
        spark, duck,
        "SELECT n_nationkey FROM nation "
        "WHERE '2024-01-01'::DATE < '2024-06-01'::DATE",
    )


def test_literal_cast_text():
    out = transpile("SELECT '2024-01-01'::DATE AS d", catalog=None)
    assert out == "SELECT CAST('2024-01-01' AS DATE) AS d"
    out = transpile("SELECT '1'::INT::VARCHAR AS s", catalog=None)
    assert out == "SELECT CAST(CAST('1' AS INT) AS STRING) AS s"
    out = transpile('SELECT "q col"::INT8 AS v FROM t', catalog=None)
    assert out == 'SELECT CAST("q col" AS BIGINT) AS v FROM t'


def test_qualify_word_in_literal_untouched():
    # ADVICE r1: the QUALIFY scan ran over raw text and spliced apart
    # a string literal containing the word.
    sql = "SELECT * FROM t WHERE note = 'QUALIFY x'"
    assert transpile(sql, catalog=None) == sql


def test_qualify_in_subquery_raises():
    with pytest.raises(NotImplementedError):
        transpile(
            "SELECT * FROM (SELECT a FROM t "
            "QUALIFY row_number() OVER (ORDER BY a) <= 2) s",
            catalog=None,
        )


def test_qualify_with_tail(spark, duck):
    _run_both(
        spark, duck,
        "SELECT o_orderkey, o_orderstatus FROM orders "
        "QUALIFY row_number() OVER (PARTITION BY o_orderstatus "
        "ORDER BY o_orderkey) <= 3 ORDER BY o_orderkey LIMIT 5",
    )


def test_cast_after_comment_raises():
    with pytest.raises(NotImplementedError):
        transpile("SELECT /* c */::INT FROM t", catalog=None)


def test_list_append_and_length_renames(spark, duck):
    _run_both(
        spark, duck,
        "SELECT n_nationkey, "
        "array_length(list_append(list_value(1, 2), n_nationkey % 3)) AS n, "
        "list_contains(list_append(list_value(1, 2), 3), 3) AS has3 "
        "FROM nation",
    )


def test_cast_operand_crossing_literal_spans():
    """Masked cast rewrite: call operands containing string literals,
    literal chains, and mixed expressions all resolve (the old
    per-code-span scan mangled f(l, 'x')::INT)."""
    assert (
        transpile("SELECT list_contains(l, 'x')::INT FROM t", catalog=None)
        == "SELECT CAST(array_contains(l, 'x') AS INT) FROM t"
    )
    assert (
        transpile("SELECT 'x'::VARCHAR::BLOB FROM t", catalog=None)
        == "SELECT CAST(CAST('x' AS STRING) AS BINARY) FROM t"
    )
    assert (
        transpile(
            "SELECT coalesce(b, 'z')::VARCHAR FROM t", catalog=None
        )
        == "SELECT CAST(coalesce(b, 'z') AS STRING) FROM t"
    )


def test_cast_subscript_operands():
    """Trailer-aware operand scan: subscripted bases and chained
    call/subscript trailers all cast the full postfix expression."""
    assert (
        transpile("SELECT a[1]::INT FROM t", catalog=None)
        == "SELECT CAST(a[1] AS INT) FROM t"
    )
    assert (
        transpile("SELECT f(g(x), 'y')[3]::INT FROM t", catalog=None)
        == "SELECT CAST(f(g(x), 'y')[3] AS INT) FROM t"
    )
    assert (
        transpile("SELECT a[1][2]::INT FROM t", catalog=None)
        == "SELECT CAST(a[1][2] AS INT) FROM t"
    )


def test_list_arg_transform_calls(spark, duck):
    """list_prepend / list_slice / list_position: argument-transform
    rewrites verified by running the same DuckDB SQL on both engines."""
    _run_both(
        spark, duck,
        "SELECT n_nationkey, "
        "list_prepend(n_nationkey, list_value(1, 2)) AS lp, "
        "list_slice(list_value(10, 20, 30, 40), 2, 3) AS sl, "
        "list_position(list_value(4, 5), n_nationkey % 6) AS pos "
        "FROM nation",
    )


def test_string_split_literal_separator(spark, duck):
    """string_split with literal separators (space, dot) translates to
    a regex-escaped Spark split; non-literal separators raise."""
    _run_both(
        spark, duck,
        "SELECT n_name, string_split(n_name || ' x.y', ' ') AS words, "
        "string_split('a.b.c', '.') AS dots FROM nation",
    )
    with pytest.raises(NotImplementedError):
        transpile("SELECT string_split(s, sep) FROM t", catalog=None)


def test_power_operator_rewrite(spark, duck):
    """DuckDB ^ / ** are exponentiation (Spark's ^ is XOR — passing it
    through would silently change meaning). Precedence and the unary
    sign fold (-2 ^ 2 = 4 in DuckDB) verified on both engines."""
    _run_both(
        spark, duck,
        "SELECT n_nationkey, n_nationkey ^ 2 AS sq, "
        "2 ** (n_nationkey % 4) AS p2, "
        "-2 ^ 2 AS signed, 2 ^ 3 ^ 2 AS assoc, "
        "1 + n_nationkey ^ 2 * 2 AS prec "
        "FROM nation",
    )


def test_regex_match_operators(spark, duck):
    """~ / !~ are FULL regex matches in DuckDB (anchor-wrapped RLIKE on
    Spark); ~~ / !~~ are LIKE aliases; unary ~ (bitwise NOT) is left
    alone. Operators inside string literals never rewritten."""
    _run_both(
        spark, duck,
        "SELECT n_name, n_name ~ '[A-Z]+' AS full_upper, "
        "n_name ~ 'A.*' AS starts_a, n_name !~ '.*A.*' AS no_a, "
        "n_name ~~ 'A%' AS like_a, n_name !~~ '%A%' AS nlike_a, "
        "~n_nationkey AS bnot, '~ ^ **' AS lit "
        "FROM nation",
    )
    with pytest.raises(NotImplementedError):
        transpile("SELECT s ~* 'x' FROM t", catalog=None)


def test_strftime_translation(spark, duck):
    """strftime C directives → Java date_format pattern, literal
    letters quoted; unknown directives and non-literal formats raise."""
    _run_both(
        spark, duck,
        "SELECT o_orderkey, "
        "strftime(o_orderdate, '%Y-%m-%d') AS iso, "
        "strftime(o_orderdate, 'on %A, %B %d (%j)') AS words "
        "FROM orders WHERE o_orderkey < 100",
    )
    with pytest.raises(NotImplementedError):
        transpile("SELECT strftime(d, fmt) FROM t", catalog=None)
    with pytest.raises(NotImplementedError):
        transpile("SELECT strftime(d, '%Q') FROM t", catalog=None)


def test_date_diff_boundary_semantics(spark, duck):
    """date_diff counts part-boundary crossings in DuckDB; the
    timestampdiff-over-date_trunc rewrite reproduces that exactly
    (bare timestampdiff counts elapsed units and would differ)."""
    _run_both(
        spark, duck,
        "SELECT o_orderkey, "
        "date_diff('day', DATE '1995-01-01', o_orderdate) AS dd, "
        "date_diff('month', DATE '1995-01-15', o_orderdate) AS dm, "
        "date_diff('year', DATE '1995-06-01', o_orderdate) AS dy, "
        "date_diff('week', DATE '1995-01-01', o_orderdate) AS dw, "
        "date_diff('quarter', DATE '1995-02-01', o_orderdate) AS dq "
        "FROM orders WHERE o_orderkey < 200",
    )


def test_epoch_fractional_seconds(spark, duck):
    """epoch() returns fractional seconds as DOUBLE in DuckDB; the
    unix_micros/1e6 rewrite preserves the fraction (unix_timestamp
    would truncate)."""
    _run_both(
        spark, duck,
        "SELECT event_id, epoch(ts) AS es FROM events "
        "WHERE event_id < 50",
    )


def test_catalog_strip_alias_collision():
    """A user alias named like the catalog must survive: the strip
    restricts itself to table positions when `dh` is declared as an
    alias in the query."""
    out = transpile("SELECT dh.x FROM tbl dh", catalog="dh")
    assert "dh.x" in out and "FROM tbl dh" in out
    out = transpile("SELECT dh.x FROM dh.tbl dh", catalog="dh")
    assert "dh.x" in out and "FROM tbl dh" in out  # table position stripped
    out = transpile("SELECT dh.x, y FROM other o JOIN tbl AS dh ON dh.k = o.k",
                    catalog="dh")
    assert out.count("dh.") == 2  # both alias refs intact
    # Without the alias declaration the blanket strip still applies.
    out = transpile("SELECT dh.tbl.col FROM dh.tbl", catalog="dh")
    assert "dh." not in out


def test_catalog_strip_comma_positions():
    """The comma rule applies only inside FROM lists: a comma in a
    SELECT/GROUP BY/ORDER BY list must not strip a same-named alias
    reference right after it (round-3 advisor finding)."""
    # Alias ref preceded by a SELECT-list comma survives.
    out = transpile("SELECT o.k, dh.v FROM other o JOIN tbl AS dh "
                    "ON dh.k = o.k", catalog="dh")
    assert out.count("dh.") == 2  # dh.v + dh.k alias refs intact
    assert "dh.v" in out and "dh.k" in out
    # GROUP BY / ORDER BY list commas also survive.
    out = transpile("SELECT o.k, dh.v FROM other o JOIN tbl AS dh "
                    "ON dh.k = o.k GROUP BY o.k, dh.v ORDER BY o.k, dh.v",
                    catalog="dh")
    assert "GROUP BY o.k, dh.v" in out and "ORDER BY o.k, dh.v" in out
    # Comma inside an actual FROM list still strips the catalog.
    out = transpile("SELECT dh.x FROM a, dh.tbl AS dh", catalog="dh")
    assert "FROM a, tbl AS dh" in out and "SELECT dh.x" in out
    # Subquery SELECT-list comma: last clause keyword is SELECT → keep.
    out = transpile("SELECT 1 FROM t AS dh WHERE EXISTS "
                    "(SELECT a, dh.b FROM u)", catalog="dh")
    assert "a, dh.b" in out
