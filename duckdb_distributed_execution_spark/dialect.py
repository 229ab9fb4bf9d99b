"""DuckDB-dialect SQL shim — run (a documented subset of) DuckDB
SQL unchanged on Spark.

The reference's users write DuckDB SQL against registered tables; the
server strips the catalog prefix and forwards the text
(``SanitizeQuery``, src/utils/catalog_utils.cpp:12-21). Spark SQL
already accepts most of that surface verbatim (Spark 4: ``SELECT *
EXCEPT``, ``GROUP BY ALL``, ``ILIKE``, ``LIMIT/OFFSET``, ``x div y``)
— this module source-rewrites the remaining syntactic deltas:

=====================  ==========================================
DuckDB                 rewritten to
=====================  ==========================================
``expr::TYPE``         ``CAST(expr AS TYPE)``
``a // b``             ``a div b`` (integer division)
``SELECT * EXCLUDE``   ``SELECT * EXCEPT``
``QUALIFY <pred>``     outer-query filter on a helper column
``dh.tbl``             ``tbl`` (catalog prefix strip, like
                       SanitizeQuery)
type aliases           VARCHAR/TEXT→STRING, BLOB→BINARY,
                       HUGEINT→DECIMAL(38,0), unsigned widening
                       (§1.2 of SURVEY.md), INT1/2/4/8, FLOAT4/8
function renames       list_value→array, list_contains→
                       array_contains, list_distinct→array_distinct,
                       list_sort→array_sort, list_position/indexof→
                       array_position, regexp_split_to_array→
                       split, quantile_cont→percentile
arg transforms         list_prepend(e,l)→array_insert(l,1,e);
                       list_slice(l,a,b)→slice(l,a,b-a+1);
                       string_split/str_split/string_to_array with a
                       LITERAL separator → split(s, re-escaped sep)
                       (structural, mask-based — nesting and
                       literal commas handled; non-literal
                       separators raise)
=====================  ==========================================

All rewriting is token-aware (string literals, quoted identifiers and
comments are never touched — including the QUALIFY scan, which runs
over a code-only mask of the statement). Anything outside the table
above is passed through for Spark to parse — unsupported DuckDB
constructs fail loudly at parse time rather than silently changing
meaning; QUALIFY inside a subquery raises ``NotImplementedError``.

Known ENGINE divergence (not a shim issue — found by the SQL fuzzer):
GROUPING SETS/ROLLUP/CUBE over an EMPTY input relation: DuckDB emits
the grand-total ``()`` grouping-set row (one row, aggregates over
zero rows — the standard's behavior, matching a plain global
aggregate); Spark's Expand-based implementation emits no rows at
all. Plain global aggregates agree (both emit one row). Queries whose
grouping-set input can be empty should not rely on the () row.

Known limitation (shared with the reference — ``SanitizeQuery``,
src/utils/catalog_utils.cpp:12-21, which is blinder still and strips
``dh.`` even inside string literals): the catalog-prefix strip
rewrites *any* ``dh.`` qualifier in code spans, so a user-defined
table alias named ``dh`` collides — ``SELECT dh.x FROM tbl dh``
becomes ``SELECT x FROM tbl dh``. Don't alias tables as the catalog
name.
"""

from __future__ import annotations

import re

# DuckDB type name → Spark SQL type name (SURVEY §1.2 widening rules).
TYPE_ALIASES = {
    "varchar": "STRING",
    "text": "STRING",
    "bpchar": "STRING",
    "blob": "BINARY",
    "bytea": "BINARY",
    "bool": "BOOLEAN",
    "logical": "BOOLEAN",
    "int1": "TINYINT",
    "int2": "SMALLINT",
    "int4": "INT",
    "int8": "BIGINT",
    "signed": "INT",
    "float4": "FLOAT",
    "float8": "DOUBLE",
    "real": "FLOAT",
    "utinyint": "SMALLINT",
    "usmallint": "INT",
    "uinteger": "BIGINT",
    "ubigint": "DECIMAL(20,0)",
    "hugeint": "DECIMAL(38,0)",
    "uhugeint": "DECIMAL(38,0)",
}

FUNCTION_RENAMES = {
    "list_value": "array",
    "list_pack": "array",
    "list_contains": "array_contains",
    "list_has": "array_contains",
    "list_distinct": "array_distinct",
    "list_sort": "array_sort",
    "list_reverse": "reverse",
    "list_append": "array_append",
    # list_prepend / list_slice / string_split(literal sep) need
    # ARGUMENT transforms, not renames — handled structurally by
    # _rewrite_arg_calls. list_position / list_indexof return 0 on
    # miss in both engines (verified), so they are plain renames.
    "list_position": "array_position",
    "list_indexof": "array_position",
    "array_length": "size",
    "regexp_split_to_array": "split",
    "str_split_regex": "split",
    "quantile_cont": "percentile",
    "stddev_pop": "stddev_pop",  # identity; documents the audited set
}

_CAST_TARGET = r"[A-Za-z_][A-Za-z_0-9]*(?:\s*\(\s*\d+\s*(?:,\s*\d+\s*)?\))?"


def _split_tokens(sql: str) -> list[tuple[str, str]]:
    """Split into (kind, text) spans where kind is 'code', 'str'
    (single-quoted literal), 'qid' (double-quoted identifier or
    backtick identifier) or 'comment'. Rewrites only apply to 'code'
    spans."""
    spans: list[tuple[str, str]] = []
    i, n = 0, len(sql)
    buf = []

    def flush():
        if buf:
            spans.append(("code", "".join(buf)))
            buf.clear()

    while i < n:
        c = sql[i]
        if c == "'":
            flush()
            j = i + 1
            while j < n:
                if sql[j] == "'" and j + 1 < n and sql[j + 1] == "'":
                    j += 2
                    continue
                if sql[j] == "'":
                    break
                j += 1
            spans.append(("str", sql[i : j + 1]))
            i = j + 1
        elif c == '"' or c == "`":
            flush()
            j = sql.find(c, i + 1)
            j = n - 1 if j == -1 else j
            spans.append(("qid", sql[i : j + 1]))
            i = j + 1
        elif c == "-" and sql[i : i + 2] == "--":
            flush()
            j = sql.find("\n", i)
            j = n if j == -1 else j
            spans.append(("comment", sql[i:j]))
            i = j
        elif c == "/" and sql[i : i + 2] == "/*":
            flush()
            j = sql.find("*/", i)
            j = n - 2 if j == -1 else j
            spans.append(("comment", sql[i : j + 2]))
            i = j + 2
        else:
            buf.append(c)
            i += 1
    flush()
    return spans


def _rewrite_code(code: str, catalog: str | None) -> str:
    if catalog:
        code = re.sub(
            rf"\b{re.escape(catalog)}\.(?=[A-Za-z_])", "", code
        )
    code = _rewrite_casts(code)
    code = re.sub(r"(?<=[\w\s)])//(?=[\w\s(])", " div ", code)
    code = re.sub(r"\bEXCLUDE\b", "EXCEPT", code, flags=re.IGNORECASE)
    for old, new in FUNCTION_RENAMES.items():
        if old != new:
            code = re.sub(rf"\b{old}\s*\(", f"{new}(", code,
                          flags=re.IGNORECASE)
    return code


_FILL_STR = "\x01"
_FILL_COMMENT = "\x02"

# A bare keyword cannot be a cast operand — reaching one means the
# real operand was absent (e.g. "SELECT /* c */::INT").
_NON_OPERAND_KEYWORDS = frozenset(
    "SELECT FROM WHERE AND OR NOT GROUP BY HAVING ORDER LIMIT OFFSET "
    "JOIN ON AS UNION ALL DISTINCT CASE WHEN THEN ELSE END IN IS "
    "BETWEEN LIKE ILIKE EXISTS VALUES SET INSERT UPDATE DELETE".split()
)


def _build_mask(sql: str) -> str:
    """Length-preserving structural mask: code chars verbatim, string/
    quoted-identifier chars → \\x01, comment chars → \\x02. Regex and
    paren scans over the mask can never match inside non-code spans,
    while indices remain valid for the original text."""
    parts = []
    for kind, text in _split_tokens(sql):
        if kind == "code":
            parts.append(text)
        elif kind == "comment":
            parts.append(_FILL_COMMENT * len(text))
        else:
            parts.append(_FILL_STR * len(text))
    return "".join(parts)


# Calls whose Spark twin needs argument REORDERING or arithmetic, not
# just a rename (semantics verified side-by-side on both engines):
#   list_prepend(e, l)   → array_insert(l, 1, e)
#   list_slice(l, a, b)  → slice(l, a, (b)-(a)+1)   (1-based inclusive
#        → start+length; positive indices — the audited subset; DuckDB
#        negative-index slicing is NOT translated and should not be
#        fed through the shim)
def _split_literal_sep(args: list[str]) -> str:
    """``string_split(s, '<literal>')`` → ``split(s, '<re-escaped>')``:
    DuckDB splits on a LITERAL separator, Spark's split takes a Java
    regex — translatable only when the separator is a literal we can
    escape at transpile time. A non-literal separator raises (fail
    loudly, never silently change meaning). Backslashes introduced by
    the escaping are doubled for Spark's C-style string literals."""
    sep = args[1].strip()
    if not (len(sep) >= 2 and sep[0] == "'" and sep[-1] == "'"):
        raise NotImplementedError(
            "string_split with a non-literal separator is not translatable "
            f"(Spark split takes a regex): {args[1]!r}"
        )
    content = sep[1:-1].replace("''", "'")
    escaped = re.escape(content).replace("\\", "\\\\").replace("'", "''")
    return f"split({args[0]}, '{escaped}')"


_ARG_REWRITES: dict[str, tuple[int, "callable"]] = {
    "list_prepend": (2, lambda a: f"array_insert({a[1]}, 1, {a[0]})"),
    "list_slice": (3, lambda a: f"slice({a[0]}, {a[1]}, ({a[2]}) - ({a[1]}) + 1)"),
    "string_split": (2, _split_literal_sep),
    "str_split": (2, _split_literal_sep),
    "string_to_array": (2, _split_literal_sep),
}


def _rewrite_arg_calls(sql: str) -> str:
    """Rewrite the ``_ARG_REWRITES`` calls over the structural mask:
    the call is located in code spans only, its argument list split at
    top-level commas (bracket depth counted on the mask, so commas in
    literals or nested calls never split), and the Spark form emitted.
    Outermost-first; nested occurrences are picked up on the next
    scan over the rewritten text."""
    pat = re.compile(
        r"\b(" + "|".join(_ARG_REWRITES) + r")\s*\(", re.IGNORECASE
    )
    while True:
        mask = _build_mask(sql)
        m = pat.search(mask)
        if m is None:
            return sql
        name = m.group(1).lower()
        depth = 0
        close = -1
        for j in range(m.end() - 1, len(mask)):
            if mask[j] == "(":
                depth += 1
            elif mask[j] == ")":
                depth -= 1
                if depth == 0:
                    close = j
                    break
        if close < 0:
            raise NotImplementedError(
                f"unbalanced parens in {name}() call: " + sql[m.start():][:80]
            )
        inner = sql[m.end(): close]
        inner_mask = mask[m.end(): close]
        args, d, last = [], 0, 0
        for idx, ch in enumerate(inner_mask):
            if ch in "([":
                d += 1
            elif ch in ")]":
                d -= 1
            elif ch == "," and d == 0:
                args.append(inner[last:idx])
                last = idx + 1
        args.append(inner[last:])
        args = [a.strip() for a in args]
        arity, fn = _ARG_REWRITES[name]
        if len(args) != arity:
            raise NotImplementedError(
                f"{name}() expects {arity} args, got {len(args)}: "
                + sql[m.start(): close + 1][:80]
            )
        sql = sql[: m.start()] + fn(args) + sql[close + 1:]


def _rewrite_casts_masked(sql: str) -> str:
    """``operand::TYPE`` → ``CAST(operand AS TYPE)`` over the WHOLE
    statement via the structural mask, so the operand may freely cross
    literal boundaries — ``f(l, 'x')::INT``, ``'2024-01-01'::DATE``,
    chains ``x::INT::VARCHAR`` — cases the old per-code-span scan
    could not see (it mangled a call operand whose parens enclosed a
    literal). Paren balancing counts only code parens (literal parens
    are masked); a ``::`` inside a literal or comment never matches."""
    pat = re.compile(rf"::\s*({_CAST_TARGET})")
    while True:
        mask = _build_mask(sql)
        m = pat.search(mask)
        if m is None:
            return sql
        i = m.start() - 1
        while i >= 0 and (mask[i].isspace() or mask[i] == _FILL_COMMENT):
            i -= 1
        if i < 0:
            raise NotImplementedError(
                "'::' cast with no resolvable operand: " + sql[: m.end()][-80:]
            )
        # Walk the operand's trailers right-to-left: any sequence of
        # (...) call/group and [...] subscript suffixes, then the base
        # (identifier, literal, or bare group) — so a[1]::T,
        # f(x,'s')[2]::T and (e)::T all resolve.
        pos = i
        start = None
        while start is None:
            c = mask[pos]
            if c in ")]":
                open_ch = "(" if c == ")" else "["
                depth = 0
                j = pos
                while j >= 0:
                    if mask[j] == c:
                        depth += 1
                    elif mask[j] == open_ch:
                        depth -= 1
                        if depth == 0:
                            break
                    j -= 1
                if j < 0:
                    raise NotImplementedError(
                        "unbalanced brackets before '::' cast: "
                        + sql[: m.end()][-80:]
                    )
                if j == 0:
                    start = 0
                elif mask[j - 1] in ")]":
                    pos = j - 1  # another trailer precedes
                elif mask[j - 1].isalnum() or mask[j - 1] in "_$.":
                    # function name / subscripted base identifier
                    k = j - 1
                    while k >= 0 and (mask[k].isalnum() or mask[k] in "_$."):
                        k -= 1
                    start = k + 1
                else:
                    start = j  # bare parenthesized group
            elif c == _FILL_STR:
                # The operand IS a literal / quoted identifier.
                j = pos
                while j >= 0 and mask[j] == _FILL_STR:
                    j -= 1
                start = j + 1
            else:
                j = pos
                while j >= 0 and (mask[j].isalnum() or mask[j] in "_$."):
                    j -= 1
                start = j + 1
        operand = sql[start : i + 1]
        if not operand.strip() or operand.upper() in _NON_OPERAND_KEYWORDS:
            raise NotImplementedError(
                "'::' cast with no resolvable operand in this context: "
                + sql[: m.end()][-80:]
            )
        sql = (
            sql[:start]
            + f"CAST({operand} AS {_type_alias(m.group(1))})"
            + sql[m.end():]
        )


def _rewrite_casts(code: str) -> str:
    """``operand::TYPE`` → ``CAST(operand AS TYPE)``. The operand is
    either a (dotted) identifier/number or a balanced parenthesized
    expression; chained casts unwrap left-to-right (innermost
    first). Literal operands are handled earlier by
    ``_rewrite_literal_casts``; a ``::`` with no operand left in this
    span is therefore unsupported input and raises."""
    pat = re.compile(rf"::\s*({_CAST_TARGET})")
    while True:
        m = pat.search(code)
        if m is None:
            return code
        # Scan backward from '::' for the operand start.
        end = m.start()
        i = end - 1
        while i >= 0 and code[i].isspace():
            i -= 1
        if i >= 0 and code[i] == ")":
            depth = 0
            j = i
            while j >= 0:
                if code[j] == ")":
                    depth += 1
                elif code[j] == "(":
                    depth -= 1
                    if depth == 0:
                        break
                j -= 1
            # Include a preceding function name: f(...)::T casts the
            # CALL result, so the operand is "f(...)" not "(...)".
            k = j - 1
            while k >= 0 and (code[k].isalnum() or code[k] in "_$."):
                k -= 1
            start = max(k + 1, 0)
        else:
            j = i
            while j >= 0 and (code[j].isalnum() or code[j] in "_$."):
                j -= 1
            start = j + 1
        operand = code[start : i + 1]
        if not operand.strip():
            raise NotImplementedError(
                "'::' cast with no resolvable operand in this context: "
                + code[: m.end()][-80:]
            )
        code = (
            code[:start]
            + f"CAST({operand} AS {_type_alias(m.group(1))})"
            + code[m.end():]
        )


def _type_alias(t: str) -> str:
    base = re.match(r"[A-Za-z_][A-Za-z_0-9]*", t).group(0)
    mapped = TYPE_ALIASES.get(base.lower())
    if mapped is None:
        return t
    return mapped + t[len(base):] if "(" not in mapped else mapped


def _rewrite_qualify(sql: str, mask: str) -> str:
    """``SELECT ... QUALIFY <pred> [ORDER BY/LIMIT tail]`` →
    helper-column filter in an outer query. Only top-level QUALIFY
    (not inside a subquery) is handled; the predicate may reference
    window functions directly, matching DuckDB semantics.

    ``mask`` is ``sql`` with every non-code span blanked to spaces
    (same length, aligned indices): the QUALIFY search, the paren
    depth counting and the tail ORDER BY/LIMIT scan all run over the
    mask, so literals/identifiers/comments can never match (ADVICE
    r1: the raw-text regex spliced apart a literal containing the
    word QUALIFY)."""
    matches = list(re.finditer(r"\bQUALIFY\b", mask, flags=re.IGNORECASE))
    if not matches:
        return sql
    m = matches[0]
    depth = mask[: m.start()].count("(") - mask[: m.start()].count(")")
    if depth != 0 or len(matches) > 1:
        raise NotImplementedError(
            "QUALIFY inside a subquery is not supported by the dialect "
            "shim; rewrite the inner query with a window + WHERE"
        )
    head, tail = sql[: m.start()], sql[m.end():]
    mtail = mask[m.end():]
    # Split the predicate from a trailing ORDER BY/LIMIT/OFFSET at
    # paren depth 0 only (an ORDER BY inside OVER(...) belongs to the
    # window spec, not the query tail) — scanned over the mask.
    split_at = None
    depth = 0
    for km in re.finditer(r"[()]|\b(?:ORDER\s+BY|LIMIT|OFFSET)\b", mtail,
                          flags=re.IGNORECASE):
        tok = km.group(0)
        if tok == "(":
            depth += 1
        elif tok == ")":
            depth -= 1
        elif depth == 0:
            split_at = km.start()
            break
    pred = tail[:split_at] if split_at is not None else tail
    suffix = tail[split_at:] if split_at is not None else ""
    sel_m = re.match(r"\s*SELECT\b", mask[: m.start()], flags=re.IGNORECASE)
    if not sel_m:
        raise NotImplementedError(
            "QUALIFY is only supported on a plain top-level SELECT"
        )
    inner = (
        head[: sel_m.end()]
        + " *, (" + pred.strip() + ") AS __qualify FROM ("
        + "SELECT " + head[sel_m.end():].strip()
        + ") __q_src"
    )
    # Window predicates must see the source columns; simplest correct
    # form: evaluate the original SELECT in a subquery, then compute
    # the qualify predicate over it — works when the predicate refers
    # to selected columns or windows over them (the DuckDB-idiomatic
    # usage: QUALIFY row_number() OVER (...) <= k references selected
    # columns).
    return (
        "SELECT * EXCEPT (__qualify) FROM (" + inner + ") __q "
        "WHERE __qualify " + suffix
    )


def transpile(sql: str, catalog: str | None = "dh") -> str:
    """Rewrite DuckDB-dialect SQL into Spark SQL (see module doc for
    the audited subset)."""
    sql = _rewrite_arg_calls(sql)
    sql = _rewrite_casts_masked(sql)
    spans = _split_tokens(sql)
    spans = [
        (kind, _rewrite_code(text, catalog) if kind == "code" else text)
        for kind, text in spans
    ]
    out = "".join(text for _, text in spans)
    mask = "".join(
        text if kind == "code" else " " * len(text) for kind, text in spans
    )
    return _rewrite_qualify(out, mask)
