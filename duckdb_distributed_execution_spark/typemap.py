"""DuckDB ↔ Spark type mapping (SURVEY §1.2).

The reference defines its wire type system in
``src/utils/arrow_utils.cpp:498-620`` (``ArrowTypeToDuckDBType``) and
proves it end-to-end in ``test/sql/type_support.test``,
``list_type_support.test`` and ``enum_type_support.test``. This module
re-expresses that type system on Spark's ``pyspark.sql.types``:

- unsigned ints widen (Spark has no unsigned): UTINYINT→Short,
  USMALLINT→Int, UINTEGER→Long, UBIGINT→Decimal(20,0)
- HUGEINT/UHUGEINT → Decimal(38,0) (covers the int128 range the
  reference only moves as VARCHAR/BLOB, arrow_utils.cpp:352-356)
- UUID → canonical 36-char string
- TIME → microseconds-since-midnight as Long (Spark has no TimeType)
- TIMESTAMP_NS truncates to microseconds (TimestampType)
- ENUM → string + declaration-order rank (MIN/MAX/ORDER BY follow
  declaration order per enum_type_support.test:65-82)
- LIST(T) → ArrayType(T); STRUCT/MAP are supported as a superset
  (the reference falls back to VARCHAR for them,
  arrow_utils.cpp:499-502)
"""

from __future__ import annotations

import re

from pyspark.sql import types as T

# Scalar name → Spark type. Parametric types (DECIMAL, LIST, STRUCT,
# MAP, ENUM) are handled in duckdb_to_spark().
_SCALARS: dict[str, T.DataType] = {
    "BOOLEAN": T.BooleanType(),
    "BOOL": T.BooleanType(),
    "TINYINT": T.ByteType(),
    "INT1": T.ByteType(),
    "SMALLINT": T.ShortType(),
    "INT2": T.ShortType(),
    "INTEGER": T.IntegerType(),
    "INT": T.IntegerType(),
    "INT4": T.IntegerType(),
    "BIGINT": T.LongType(),
    "INT8": T.LongType(),
    # Unsigned: widen to the next signed type that holds the range.
    "UTINYINT": T.ShortType(),
    "USMALLINT": T.IntegerType(),
    "UINTEGER": T.LongType(),
    "UBIGINT": T.DecimalType(20, 0),
    # int128: reference can't convert these natively
    # (arrow_utils.cpp:352-356); Decimal(38,0) covers the full range.
    "HUGEINT": T.DecimalType(38, 0),
    "UHUGEINT": T.DecimalType(38, 0),
    "FLOAT": T.FloatType(),
    "REAL": T.FloatType(),
    "FLOAT4": T.FloatType(),
    "DOUBLE": T.DoubleType(),
    "FLOAT8": T.DoubleType(),
    "VARCHAR": T.StringType(),
    "CHAR": T.StringType(),
    "TEXT": T.StringType(),
    "STRING": T.StringType(),
    "BLOB": T.BinaryType(),
    "BYTEA": T.BinaryType(),
    "UUID": T.StringType(),  # canonical 36-char form
    "DATE": T.DateType(),
    # Spark has no TimeType: micros since midnight.
    "TIME": T.LongType(),
    "TIMETZ": T.LongType(),
    "TIMESTAMP": T.TimestampType(),
    "DATETIME": T.TimestampType(),
    "TIMESTAMP_S": T.TimestampType(),
    "TIMESTAMP_MS": T.TimestampType(),
    "TIMESTAMP_NS": T.TimestampType(),  # truncates to micros
    "TIMESTAMPTZ": T.TimestampType(),
    "INTERVAL": T.DayTimeIntervalType(),
    "SQLNULL": T.NullType(),
    "NULL": T.NullType(),
}

_DECIMAL_RE = re.compile(r"^(?:DECIMAL|NUMERIC)\s*\(\s*(\d+)\s*,\s*(\d+)\s*\)$")
_LIST_RE = re.compile(r"^(.+)\[\]$")
_LIST_FN_RE = re.compile(r"^LIST\((.+)\)$")


def _split_top_level(s: str) -> list[str]:
    """Split on commas at bracket depth 0 — quote-aware, so an
    ENUM('a,b') literal or a quoted struct field name never splits."""
    parts: list[str] = []
    buf: list[str] = []
    depth = 0
    quote: str | None = None
    for ch in s:
        if quote:
            buf.append(ch)
            if ch == quote:
                quote = None
            continue
        if ch in "'\"":
            quote = ch
            buf.append(ch)
            continue
        if ch in "(<[":
            depth += 1
        elif ch in ")>]":
            depth -= 1
        if ch == "," and depth == 0:
            parts.append("".join(buf))
            buf = []
        else:
            buf.append(ch)
    if buf:
        parts.append("".join(buf))
    return [p.strip() for p in parts if p.strip()]


def _inner(s: str) -> str:
    """Text between the first '(' and the matching final ')'."""
    i = s.index("(")
    if not s.rstrip().endswith(")"):
        raise ValueError(f"unbalanced type expression: {s!r}")
    return s[i + 1 : s.rstrip().rindex(")")]


def duckdb_to_spark(type_str: str, union_as_struct: bool = False) -> T.DataType:
    """Map a DuckDB type string to the Spark type per SURVEY §1.2.

    STRUCT(...)/MAP(...) map to native StructType/MapType (superset of
    the reference, which flattens both to VARCHAR on the wire —
    arrow_utils.cpp:499-502). UNION defaults to the reference's own
    VARCHAR fallback; ``union_as_struct=True`` opts into the tagged-
    struct superset encoding STRUCT(tag TINYINT, <member> <T>, ...) —
    tag is the 0-based declared member index, exactly one member field
    is non-null per value (DuckDB's own storage layout for unions is
    the same tag + per-member-vector shape)."""
    s = type_str.strip()
    u = s.upper()
    if u in _SCALARS:
        return _SCALARS[u]
    m = _DECIMAL_RE.match(u)
    if m:
        return T.DecimalType(int(m.group(1)), int(m.group(2)))
    if u in ("DECIMAL", "NUMERIC"):
        return T.DecimalType(18, 3)  # DuckDB default
    m = _LIST_RE.match(s) or _LIST_FN_RE.match(s)
    if m:
        return T.ArrayType(duckdb_to_spark(m.group(1)))
    if u.startswith("ENUM"):
        # Declaration-order semantics are handled by enum_rank();
        # storage is plain string. Domain enforcement lives in
        # Engine.insert_into via parse_enum_values().
        return T.StringType()
    if u.startswith("STRUCT") and "(" in s:
        fields = []
        for part in _split_top_level(_inner(s)):
            fname, _, ftyp = part.partition(" ")
            fields.append(
                T.StructField(
                    fname.strip().strip('"'), duckdb_to_spark(ftyp), True
                )
            )
        return T.StructType(fields)
    if u.startswith("MAP") and "(" in s:
        kv = _split_top_level(_inner(s))
        if len(kv) != 2:
            raise ValueError(f"MAP needs exactly 2 type args: {type_str!r}")
        return T.MapType(duckdb_to_spark(kv[0]), duckdb_to_spark(kv[1]), True)
    if u.startswith("UNION"):
        if union_as_struct and "(" in s:
            fields = [T.StructField("tag", T.ByteType(), True)]
            for part in _split_top_level(_inner(s)):
                part = part.strip()
                if part.startswith('"'):
                    # Quoted member name — may contain spaces; split at
                    # the closing quote instead of the first space.
                    close = part.find('"', 1)
                    fname = part[1:close] if close > 0 else ""
                    ftyp = part[close + 1:] if close > 0 else ""
                else:
                    fname, _, ftyp = part.partition(" ")
                fname = fname.strip().strip('"')
                if not fname or not ftyp.strip():
                    raise ValueError(
                        f"UNION member needs '<name> <type>': {part!r}"
                    )
                if fname.lower() == "tag":
                    # The synthetic discriminator field is named 'tag';
                    # a member with the same name would produce an
                    # ambiguous struct and break the documented
                    # tagged-struct contract.
                    raise ValueError(
                        "UNION member name 'tag' collides with the "
                        "synthetic discriminator field; rename the "
                        f"member in {type_str!r}"
                    )
                fields.append(
                    T.StructField(
                        fname,
                        duckdb_to_spark(ftyp, union_as_struct=True),
                        True,
                    )
                )
            return T.StructType(fields)
        # Reference falls back to VARCHAR (arrow_utils.cpp:499-502);
        # Spark has no union type — same default.
        return T.StringType()
    raise ValueError(f"unsupported DuckDB type: {type_str!r}")


_ENUM_VAL_RE = re.compile(r"'((?:[^']|'')*)'")


def parse_enum_values(type_str: str) -> list[str] | None:
    """For ``ENUM('a', 'b', ...)`` return the declared values in
    order (the domain the reference's ENUM enforces on insert —
    enum_type_support.test:20-28); None for any other type."""
    s = type_str.strip()
    if not s.upper().startswith("ENUM") or "(" not in s:
        return None
    return [m.group(1).replace("''", "'") for m in
            _ENUM_VAL_RE.finditer(_inner(s))]


def spark_to_duckdb(dt: T.DataType) -> str:
    """Inverse mapping: Spark type → DuckDB/ANSI SQL type string."""
    if isinstance(dt, T.BooleanType):
        return "BOOLEAN"
    if isinstance(dt, T.ByteType):
        return "TINYINT"
    if isinstance(dt, T.ShortType):
        return "SMALLINT"
    if isinstance(dt, T.IntegerType):
        return "INTEGER"
    if isinstance(dt, T.LongType):
        return "BIGINT"
    if isinstance(dt, T.FloatType):
        return "FLOAT"
    if isinstance(dt, T.DoubleType):
        return "DOUBLE"
    if isinstance(dt, T.DecimalType):
        return f"DECIMAL({dt.precision},{dt.scale})"
    if isinstance(dt, T.StringType):
        return "VARCHAR"
    if isinstance(dt, T.BinaryType):
        return "BLOB"
    if isinstance(dt, T.DateType):
        return "DATE"
    if isinstance(dt, T.TimestampType):
        return "TIMESTAMP"
    if isinstance(dt, T.DayTimeIntervalType):
        return "INTERVAL"
    if isinstance(dt, T.YearMonthIntervalType):
        return "INTERVAL"
    if isinstance(dt, T.ArrayType):
        return f"{spark_to_duckdb(dt.elementType)}[]"
    if isinstance(dt, T.NullType):
        return "SQLNULL"
    if isinstance(dt, T.StructType):
        inner = ", ".join(f"{f.name} {spark_to_duckdb(f.dataType)}" for f in dt.fields)
        return f"STRUCT({inner})"
    if isinstance(dt, T.MapType):
        return f"MAP({spark_to_duckdb(dt.keyType)}, {spark_to_duckdb(dt.valueType)})"
    raise ValueError(f"unsupported Spark type: {dt!r}")


def schema_from_ddl(ddl: str) -> T.StructType:
    """Parse a DuckDB-style column list ``"a INTEGER, b VARCHAR[]"``
    into a Spark StructType using the SURVEY §1.2 mapping."""
    fields = []
    for part in _split_top_level(ddl):
        name, _, typ = part.partition(" ")
        fields.append(T.StructField(name, duckdb_to_spark(typ.strip()), True))
    return T.StructType(fields)


def enum_domains_from_ddl(ddl: str) -> dict[str, list[str]]:
    """Column → declared ENUM values for every ENUM column in a
    DuckDB-style column list (empty dict if none). Tolerates inline
    constraint tails and table-level constraint items."""
    out: dict[str, list[str]] = {}
    for part in _split_constraint_items(ddl):
        if _TABLE_LEVEL_PAT.match(part):
            continue
        name, _, rest = part.partition(" ")
        cm = _depth0_search(rest, _CONSTRAINT_PAT)
        typ = (rest[: cm.start()] if cm else rest).strip()
        vals = parse_enum_values(typ)
        if vals is not None:
            out[name.strip().strip('"')] = vals
    return out


def enum_rank_expr(col: str, values: list[str]) -> str:
    """SQL CASE expression giving an enum column its declaration-order
    rank, so MIN/MAX/ORDER BY match the reference's enum semantics
    (enum_type_support.test:65-82: 'happy' < 'sad' < 'neutral')."""
    whens = " ".join(
        f"WHEN {col} = '{v}' THEN {i}" for i, v in enumerate(values)
    )
    return f"CASE {whens} ELSE NULL END"


# ---------------------------------------------------------------------------
# CREATE TABLE column-list parsing with inline constraints
# ---------------------------------------------------------------------------
#
# DuckDB DDL allows constraints inline with the columns —
#   CREATE TABLE t (id INTEGER PRIMARY KEY, v INT NOT NULL DEFAULT 3,
#                   s VARCHAR UNIQUE CHECK (length(s) > 0),
#                   PRIMARY KEY (a, b), CHECK (v < 100))
# — and the reference forwards that text verbatim to DuckDB. The
# engine parses the same surface: PRIMARY KEY / UNIQUE become enforced
# key sets, NOT NULL / DEFAULT feed the existing per-column
# bookkeeping, CHECK expressions are validated on every insert
# (standard semantics: only a FALSE check violates — NULL passes).
# REFERENCES / FOREIGN KEY clauses are accepted and recorded but not
# enforced (the reference does not exercise them either).

import dataclasses as _dc


class SqlDefault(str):
    """A column DEFAULT captured from DDL as SQL expression text
    (``DEFAULT 3``, ``DEFAULT upper('x')``) — distinguished from a
    plain Python literal default so the insert path evaluates it with
    ``F.expr`` instead of ``F.lit``."""


@_dc.dataclass
class TableConstraints:
    not_null: list[str] = _dc.field(default_factory=list)
    defaults: dict[str, "SqlDefault"] = _dc.field(default_factory=dict)
    keys: list[list[str]] = _dc.field(default_factory=list)  # PK/UNIQUE sets
    checks: list[str] = _dc.field(default_factory=list)
    foreign: list[str] = _dc.field(default_factory=list)  # recorded only


_CONSTRAINT_PAT = re.compile(
    r"\b(NOT\s+NULL|PRIMARY\s+KEY|UNIQUE|DEFAULT|CHECK|NULL|REFERENCES)\b",
    re.IGNORECASE,
)


def _depth0_search(s: str, pat: re.Pattern, start: int = 0):
    """Earliest match of ``pat`` at bracket depth 0 outside quotes.
    Depth counts ONLY () and [] — unlike the type splitter's angle
    brackets, because constraint expressions legitimately contain
    comparison < / > (``CHECK (v > 0)``)."""
    depth = 0
    quote: str | None = None
    i = start
    while i < len(s):
        ch = s[i]
        if quote:
            if ch == quote:
                quote = None
            i += 1
            continue
        if ch in "'\"":
            quote = ch
            i += 1
            continue
        if ch in "([":
            depth += 1
        elif ch in ")]":
            depth -= 1
        elif depth == 0:
            m = pat.match(s, i)
            if m:
                return m
        i += 1
    return None


def _split_constraint_items(s: str) -> list[str]:
    """Split a CREATE TABLE column list on depth-0 commas, counting
    only ()/[] (a CHECK's comparison operators must not perturb the
    depth the way the type splitter's <> handling would)."""
    parts: list[str] = []
    buf: list[str] = []
    depth = 0
    quote: str | None = None
    for ch in s:
        if quote:
            buf.append(ch)
            if ch == quote:
                quote = None
            continue
        if ch in "'\"":
            quote = ch
            buf.append(ch)
            continue
        if ch in "([":
            depth += 1
        elif ch in ")]":
            depth -= 1
        if ch == "," and depth == 0:
            parts.append("".join(buf).strip())
            buf.clear()
        else:
            buf.append(ch)
    if "".join(buf).strip():
        parts.append("".join(buf).strip())
    return parts


def _balanced_group(s: str, open_idx: int) -> int:
    """Index just past the ')' closing the '(' at ``open_idx``."""
    depth = 0
    quote: str | None = None
    for i in range(open_idx, len(s)):
        ch = s[i]
        if quote:
            if ch == quote:
                quote = None
            continue
        if ch in "'\"":
            quote = ch
        elif ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
            if depth == 0:
                return i + 1
    raise ValueError(f"unbalanced parens in DDL: {s[open_idx:][:60]!r}")


def _parse_constraint_tail(col: str, tail: str, out: TableConstraints) -> None:
    i = 0
    n = len(tail)
    while i < n:
        while i < n and tail[i] in " \t\n,":
            i += 1
        if i >= n:
            return
        m = _CONSTRAINT_PAT.match(tail, i)
        if not m:
            raise ValueError(
                f"unsupported column constraint near {tail[i:][:40]!r}"
            )
        kw = re.sub(r"\s+", " ", m.group(1).upper())
        i = m.end()
        if kw == "NOT NULL":
            out.not_null.append(col)
        elif kw == "NULL":
            pass  # explicit nullable — the default
        elif kw == "PRIMARY KEY":
            out.not_null.append(col)
            out.keys.append([col])
        elif kw == "UNIQUE":
            out.keys.append([col])
        elif kw == "CHECK":
            j = tail.find("(", i)
            if j < 0:
                raise ValueError("CHECK without parenthesized expression")
            end = _balanced_group(tail, j)
            out.checks.append(tail[j + 1 : end - 1].strip())
            i = end
        elif kw == "REFERENCES":
            j = tail.find("(", i)
            end = _balanced_group(tail, j) if j >= 0 else n
            out.foreign.append(f"{col} REFERENCES {tail[i:end].strip()}")
            i = end
        elif kw == "DEFAULT":
            nxt = _depth0_search(tail, _CONSTRAINT_PAT, i)
            end = nxt.start() if nxt else n
            # A DEFAULT f(...) call: the call parens hide any keyword
            # inside; a bare scan suffices because _depth0_search
            # skips bracketed spans.
            expr = tail[i:end].strip()
            if not expr:
                raise ValueError(f"DEFAULT with no expression on {col}")
            out.defaults[col] = SqlDefault(expr)
            i = end


_TABLE_LEVEL_PAT = re.compile(
    r"^\s*(PRIMARY\s+KEY|UNIQUE|CHECK|FOREIGN\s+KEY)\b", re.IGNORECASE
)


def parse_create_columns(ddl: str) -> tuple[T.StructType, TableConstraints]:
    """Parse a DuckDB CREATE TABLE column list (types + inline and
    table-level constraints) into (schema, TableConstraints)."""
    fields: list[T.StructField] = []
    cons = TableConstraints()
    for part in _split_constraint_items(ddl):
        tm = _TABLE_LEVEL_PAT.match(part)
        if tm:
            kw = re.sub(r"\s+", " ", tm.group(1).upper())
            j = part.find("(", tm.end())
            if kw in ("PRIMARY KEY", "UNIQUE"):
                end = _balanced_group(part, j)
                cols = [c.strip().strip('"') for c in part[j + 1 : end - 1].split(",")]
                cons.keys.append(cols)
                if kw == "PRIMARY KEY":
                    cons.not_null.extend(cols)
            elif kw == "CHECK":
                end = _balanced_group(part, j)
                cons.checks.append(part[j + 1 : end - 1].strip())
            else:  # FOREIGN KEY — recorded, not enforced
                cons.foreign.append(part)
            continue
        name, _, rest = part.partition(" ")
        name = name.strip().strip('"')
        cm = _depth0_search(rest, _CONSTRAINT_PAT)
        typ = (rest[: cm.start()] if cm else rest).strip()
        fields.append(T.StructField(name, duckdb_to_spark(typ), True))
        if cm:
            _parse_constraint_tail(name, rest[cm.start():], cons)
    return T.StructType(fields), cons
