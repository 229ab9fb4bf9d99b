"""Property tests for the dialect shim's token-safety guarantees
(ADVICE r1: the QUALIFY scan and cast rewriting used to touch string
literals). Hypothesis drives adversarial literal content — keywords,
cast syntax, catalog prefixes, doubled quotes — through transpile()
and asserts the literal spans come out byte-identical."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from duckdb_distributed_execution_spark.dialect import transpile

# Content that each rewrite pass keys on — must never be rewritten
# inside a string literal.
_TRIGGERS = [
    "QUALIFY",
    "qualify x",
    "::DATE",
    "a :: int",
    "dh.tbl",
    "x // y",
    "EXCLUDE",
    "list_contains(a, b)",
    "ORDER BY",
    "LIMIT 5",
    "-- not a comment",
    "/* not a comment */",
    "2 ^ 3",
    "x ** y",
    "a ~ b",
    "s !~~ t",
    "strftime(d, fmt)",
    "date_diff('day', a, b)",
]

_literal_text = st.one_of(
    st.sampled_from(_TRIGGERS),
    st.text(
        alphabet=st.characters(
            codec="ascii", exclude_characters="'\\"
        ),
        max_size=30,
    ),
)


def _quote(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


@given(lit=_literal_text)
@settings(max_examples=200, deadline=None)
def test_literal_content_never_rewritten(lit):
    q = _quote(lit)
    out = transpile(f"SELECT * FROM t WHERE note = {q}")
    assert q in out, f"literal altered: {q!r} -> {out!r}"


@given(lit=_literal_text, lit2=_literal_text)
@settings(max_examples=200, deadline=None)
def test_two_literals_with_rewrites_between(lit, lit2):
    """Rewrites in the surrounding code must fire while both literals
    survive untouched — including when the literal itself is the cast
    operand."""
    q1, q2 = _quote(lit), _quote(lit2)
    out = transpile(
        f"SELECT {q1}::VARCHAR AS a, c // 2 AS b FROM dh.t WHERE x = {q2}"
    )
    assert q1 in out and q2 in out
    assert f"CAST({q1} AS STRING)" in out
    assert " div " in out
    assert "FROM t " in out and "dh.t" not in out.replace(q1, "").replace(q2, "")


@given(lit=_literal_text)
@settings(max_examples=100, deadline=None)
def test_transpile_idempotent(lit):
    """Transpiling already-transpiled SQL is a no-op: every rewrite
    emits forms (CAST, div, EXCEPT, stripped catalog) that no pass
    keys on again."""
    sql = (
        f"SELECT a::INT AS x, b // 2 AS y, {_quote(lit)} AS z "
        "FROM dh.t WHERE c IS NOT NULL"
    )
    once = transpile(sql)
    assert transpile(once) == once


@given(
    comment=st.text(
        alphabet=st.characters(codec="ascii", exclude_characters="\n'\\"),
        max_size=25,
    )
)
@settings(max_examples=100, deadline=None)
def test_line_comment_preserved(comment):
    out = transpile(f"SELECT a FROM t -- {comment}")
    assert f"-- {comment}" in out


# Alias-collision catalog stripping (ADVICE r3: the comma rule used to
# strip alias references after SELECT/GROUP BY/ORDER BY commas).
_ALIAS_DECLS = [
    "FROM tbl AS dh",
    "FROM tbl dh",
    "FROM a, dh.tbl AS dh",
    "FROM other o JOIN tbl AS dh ON dh.k = o.k",
    "FROM other o JOIN dh.tbl dh ON dh.k = o.k",
]
_REF_CLAUSES = [
    "SELECT {r}",
    "SELECT o.k, {r}",
    "SELECT {r}, o.k",
    "SELECT sum({r}), o.k",
]
_TAILS = [
    "",
    " GROUP BY o.k, {r}",
    " ORDER BY o.k, {r}",
    " WHERE {r} > 0",
]


@settings(max_examples=60, deadline=None)
@given(
    decl=st.sampled_from(_ALIAS_DECLS),
    head=st.sampled_from(_REF_CLAUSES),
    tail=st.sampled_from(_TAILS),
)
def test_alias_refs_survive_catalog_strip(decl, head, tail):
    """With an alias named like the catalog declared anywhere in the
    FROM clause, every `dh.col` alias reference must survive — in
    SELECT lists (incl. after commas), GROUP BY/ORDER BY lists, and
    WHERE — while `dh.tbl` table positions strip."""
    ref = "dh.v"
    sql = f"{head.format(r=ref)} {decl}{tail.format(r=ref)}"
    out = transpile(sql, catalog="dh")
    n_refs = sql.count("dh.v") + sql.count("dh.k")
    assert out.count("dh.v") == sql.count("dh.v"), (sql, out)
    assert out.count("dh.k") == sql.count("dh.k"), (sql, out)
    assert "dh.tbl" not in out, (sql, out)
    assert out.count("dh.") == n_refs, (sql, out)
