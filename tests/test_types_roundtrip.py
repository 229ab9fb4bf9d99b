"""End-to-end type fidelity — the reference's type_support.test /
list_type_support.test translated: build the all-types table through
the Engine, store it, and verify values AND aggregates against DuckDB
reading the same parquet (the strongest form of §1.2 parity)."""

from __future__ import annotations

import datetime
import decimal

import duckdb
import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def typed_table(engine):
    # type_support.test:20-44 shape: min / zero-ish / max / all-NULL
    engine.create_table(
        "type_test_table",
        "col_tinyint TINYINT, col_smallint SMALLINT, col_integer INTEGER, "
        "col_bigint BIGINT, col_utinyint UTINYINT, col_usmallint USMALLINT, "
        "col_uinteger UINTEGER, col_ubigint UBIGINT, col_float FLOAT, "
        "col_double DOUBLE, col_boolean BOOLEAN, col_varchar VARCHAR, "
        "col_date DATE, col_time TIME, col_timestamp TIMESTAMP, "
        "col_blob BLOB, col_decimal DECIMAL(10,2)",
    )
    rows = [
        (-128, -32768, -2147483648, -9223372036854775808, 0, 0,
         0, decimal.Decimal(0), -3.5, -1.25e10, False, "min",
         datetime.date(1900, 1, 1), 0, datetime.datetime(1970, 1, 1),
         b"\x00", decimal.Decimal("-99999999.99")),
        (0, 0, 0, 0, 42, 42, 42, decimal.Decimal(42), 0.0, 0.0, True, "zero",
         datetime.date(2000, 1, 1), 43200_000_000,
         datetime.datetime(2024, 6, 1, 12, 30, 15, 123456), b"abc",
         decimal.Decimal("0.00")),
        (127, 32767, 2147483647, 9223372036854775807, 255, 65535,
         4294967295, decimal.Decimal("18446744073709551615"), 3.5, 1.25e10,
         True, "max", datetime.date(2999, 12, 31), 86399_999_999,
         datetime.datetime(2262, 4, 11, 23, 47, 16), b"\xff\xfe",
         decimal.Decimal("99999999.99")),
        tuple([None] * 17),
    ]
    engine.insert_values("type_test_table", rows)
    yield "type_test_table"
    engine.drop_table("type_test_table", if_exists=True)


def test_all_types_round_trip(engine, typed_table):
    rows = {r.col_varchar: r for r in engine.table(typed_table).collect()}
    mx = rows["max"]
    # unsigned widening holds the reference's golden extremes
    # (UBIGINT max 18446744073709551615, type_support.test:44)
    assert mx.col_ubigint == decimal.Decimal("18446744073709551615")
    assert mx.col_uinteger == 4294967295
    assert mx.col_usmallint == 65535 and mx.col_utinyint == 255
    assert mx.col_bigint == 9223372036854775807
    assert mx.col_blob == bytearray(b"\xff\xfe")
    assert rows["min"].col_decimal == decimal.Decimal("-99999999.99")
    # NULL row is NULL in every column (type_support.test:175-198)
    null_row = [r for r in rows.values() if r.col_varchar is None][0]
    assert all(v is None for v in null_row)


def test_all_types_aggregates_match_duckdb(engine, typed_table):
    """COUNT/MIN/MAX per column must agree with DuckDB reading the
    same parquet files (type_support.test:86-162 analog)."""
    path = engine._tables[typed_table].path
    con = duckdb.connect()
    con.execute(f"CREATE VIEW t AS SELECT * FROM '{path}/*.parquet'")
    for col in ["col_tinyint", "col_integer", "col_bigint", "col_ubigint",
                "col_double", "col_date", "col_time", "col_timestamp",
                "col_decimal", "col_varchar"]:
        d_cnt, d_min, d_max = con.execute(
            f"SELECT COUNT({col}), MIN({col}), MAX({col}) FROM t"
        ).fetchone()
        s = engine.table(typed_table).agg(
            F.count(col).alias("c"), F.min(col).alias("mn"), F.max(col).alias("mx")
        ).collect()[0]
        assert s.c == d_cnt, col
        assert s.mn == d_min and s.mx == d_max, col
    con.close()


def test_octet_length_blob(engine, typed_table):
    # OCTET_LENGTH(blob) — type_support.test:136-141
    got = {
        r.col_varchar: r.n
        for r in engine.table(typed_table)
        .select("col_varchar", F.octet_length("col_blob").alias("n"))
        .collect()
    }
    assert got == {"min": 1, "zero": 3, "max": 2, None: None}


def test_hugeint_extremes(engine):
    """hugeint_test_table analog (type_support.test:233-261): int128
    extremes via Decimal(38,0) — incl. MIN/MAX aggregation."""
    engine.create_table(
        "hugeint_test_table", "id INTEGER, huge_value HUGEINT, uhuge_value UHUGEINT"
    )
    imax = decimal.Decimal(2**127 - 1)
    imin = decimal.Decimal(-(2**127))
    # Decimal(38,0) holds ±(10^38−1); int128 extremes (~1.7e38) exceed
    # that, so parity uses the documented clamp: the largest 38-digit
    # values — still beyond any int64/uint64 (UBIGINT max included).
    big = decimal.Decimal(10**38 - 1)
    # NB: unary minus on a Decimal applies the context precision
    # (default 28 digits) and would silently round to -1E+38 — build
    # the negative literal from the string instead.
    neg_big = decimal.Decimal("-" + str(10**38 - 1))
    engine.insert_values(
        "hugeint_test_table",
        [(1, big, big), (2, neg_big, decimal.Decimal(0)),
         (3, decimal.Decimal(0), decimal.Decimal("18446744073709551615"))],
    )
    r = engine.execute(
        "SELECT MIN(huge_value) AS mn, MAX(huge_value) AS mx, "
        "MAX(uhuge_value) AS umx FROM hugeint_test_table"
    )[0]
    assert r.mn == neg_big and r.mx == big and r.umx == big
    assert imax > big > decimal.Decimal(2**64)  # beyond all 64-bit ranges
    assert imin < neg_big
    engine.drop_table("hugeint_test_table")


def test_uuid_round_trip(engine):
    """uuid_test_table analog (type_support.test:204-215): canonical
    36-char strings, incl. the all-zero UUID and a NULL."""
    engine.create_table(
        "uuid_test_table", "id INTEGER, user_uuid UUID, session_uuid UUID"
    )
    rows = [
        (1, "550e8400-e29b-41d4-a716-446655440000",
         "6ba7b810-9dad-11d1-80b4-00c04fd430c8"),
        (2, None, "6ba7b811-9dad-11d1-80b4-00c04fd430c8"),
        (3, "00000000-0000-0000-0000-000000000000",
         "ffffffff-ffff-ffff-ffff-ffffffffffff"),
    ]
    engine.insert_values("uuid_test_table", rows)
    got = {r.id: (r.user_uuid, r.session_uuid)
           for r in engine.table("uuid_test_table").collect()}
    assert got[3] == ("00000000-0000-0000-0000-000000000000",
                      "ffffffff-ffff-ffff-ffff-ffffffffffff")
    assert got[2][0] is None
    # filtering and MIN/MAX on the canonical form (string ordering)
    assert engine.execute(
        "SELECT COUNT(*) AS c FROM uuid_test_table WHERE user_uuid IS NULL"
    )[0].c == 1
    assert engine.execute(
        "SELECT MIN(user_uuid) AS m FROM uuid_test_table"
    )[0].m == "00000000-0000-0000-0000-000000000000"
    engine.drop_table("uuid_test_table")


def test_interval_round_trip(engine, spark):
    """interval_test_table analog (type_support.test:298-308):
    day-time intervals survive storage and arithmetic. (The
    reference's mixed month+day INTERVAL maps to Spark's two interval
    families — SURVEY §1.2.)"""
    import datetime

    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(1, datetime.timedelta(days=5, hours=6)),
         (2, datetime.timedelta(microseconds=100)),
         (3, None)],
        "id INT, duration INTERVAL DAY TO SECOND",
    )
    got = {r.id: r.duration for r in df.collect()}
    assert got[1] == datetime.timedelta(days=5, hours=6)
    assert got[2] == datetime.timedelta(microseconds=100)
    assert got[3] is None
    # interval arithmetic with timestamps
    shifted = df.filter("id = 1").select(
        (F.lit("2024-01-01 00:00:00").cast("timestamp") + F.col("duration")
         ).alias("t")
    ).collect()[0].t
    assert shifted == datetime.datetime(2024, 1, 6, 6, 0, 0)


@pytest.fixture(scope="module")
def list_table(engine):
    # list_type_support.test:20-37 shape
    engine.create_table(
        "list_test_table",
        "id INTEGER, int_list INTEGER[], varchar_list VARCHAR[], "
        "double_list DOUBLE[], bool_list BOOLEAN[]",
    )
    engine.insert_values(
        "list_test_table",
        [
            (1, [1, 2, 3], ["a", "b", "c"], [1.5, 2.5], [True, False]),
            (2, [10, 20], ["x"], [0.0], [False]),
            (3, [], [], [], []),
            (4, None, None, None, None),
            (5, [7, None, 9], ["p", None], [None, 1.0], [None, True]),
        ],
    )
    yield "list_test_table"
    engine.drop_table("list_test_table", if_exists=True)


def test_list_ops_parity(engine, list_table):
    """len / 1-based index / unnest / list_contains over lists incl.
    empty, NULL, and NULL-element rows (list_type_support.test:56-118)."""
    df = engine.table(list_table)
    got = {
        r.id: (r.n, r.first, r.has2)
        for r in df.select(
            "id",
            F.size("int_list").alias("n"),
            # ANSI mode: element_at on an empty array raises;
            # try_element_at gives DuckDB's l[1]-on-empty NULL semantics
            F.try_element_at("int_list", F.lit(1)).alias("first"),
            F.array_contains("int_list", 2).alias("has2"),
        ).collect()
    }
    assert got[1] == (3, 1, True)
    assert got[2] == (2, 10, False)
    assert got[3] == (0, None, False)
    assert got[4][1] is None and got[4][2] is None  # NULL list
    assert got[5][0] == 3 and got[5][1] == 7
    exploded = df.select("id", F.explode("int_list").alias("e"))
    assert exploded.count() == 8  # 3 + 2 + 0 + (null row skipped) + 3
    # NULL elements survive explode
    assert [r.e for r in exploded.filter("id = 5").collect()] == [7, None, 9]
