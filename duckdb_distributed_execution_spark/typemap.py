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


def duckdb_to_spark(type_str: str) -> T.DataType:
    """Map a DuckDB type string to the Spark type per SURVEY §1.2.

    STRUCT(...)/MAP(...) map to native StructType/MapType (superset of
    the reference, which flattens both to VARCHAR on the wire —
    arrow_utils.cpp:499-502). UNION keeps the reference's VARCHAR
    fallback: Spark has no union type either."""
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
        # Reference falls back to VARCHAR (arrow_utils.cpp:499-502);
        # Spark has no union type — same fallback.
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
    DuckDB-style column list (empty dict if none)."""
    out: dict[str, list[str]] = {}
    for part in _split_top_level(ddl):
        name, _, typ = part.partition(" ")
        vals = parse_enum_values(typ.strip())
        if vals is not None:
            out[name] = vals
    return out


def enum_rank_expr(col: str, values: list[str]) -> str:
    """SQL CASE expression giving an enum column its declaration-order
    rank, so MIN/MAX/ORDER BY match the reference's enum semantics
    (enum_type_support.test:65-82: 'happy' < 'sad' < 'neutral')."""
    whens = " ".join(
        f"WHEN {col} = '{v}' THEN {i}" for i, v in enumerate(values)
    )
    return f"CASE {whens} ELSE NULL END"
