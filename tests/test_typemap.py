"""Type-system parity tests (SURVEY §1.2; reference
test/sql/type_support.test, list_type_support.test,
enum_type_support.test)."""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from duckdb_distributed_execution_spark.typemap import (
    duckdb_to_spark,
    enum_rank_expr,
    schema_from_ddl,
    spark_to_duckdb,
)


@pytest.mark.parametrize(
    ("duck", "spark_t"),
    [
        ("BOOLEAN", T.BooleanType()),
        ("TINYINT", T.ByteType()),
        ("SMALLINT", T.ShortType()),
        ("INTEGER", T.IntegerType()),
        ("BIGINT", T.LongType()),
        # unsigned widening (type_support.test:25-28)
        ("UTINYINT", T.ShortType()),
        ("USMALLINT", T.IntegerType()),
        ("UINTEGER", T.LongType()),
        ("UBIGINT", T.DecimalType(20, 0)),
        # int128 (type_support.test:229-261)
        ("HUGEINT", T.DecimalType(38, 0)),
        ("UHUGEINT", T.DecimalType(38, 0)),
        ("FLOAT", T.FloatType()),
        ("DOUBLE", T.DoubleType()),
        ("VARCHAR", T.StringType()),
        ("BLOB", T.BinaryType()),
        ("UUID", T.StringType()),
        ("DATE", T.DateType()),
        ("TIME", T.LongType()),
        ("TIMESTAMP", T.TimestampType()),
        ("TIMESTAMP_NS", T.TimestampType()),
        ("DECIMAL(10,2)", T.DecimalType(10, 2)),
        ("INTEGER[]", T.ArrayType(T.IntegerType())),
        ("VARCHAR[]", T.ArrayType(T.StringType())),
        ("LIST(DOUBLE)", T.ArrayType(T.DoubleType())),
    ],
)
def test_duckdb_to_spark(duck, spark_t):
    assert duckdb_to_spark(duck) == spark_t


def test_unsigned_ranges_fit():
    # UBIGINT max from the reference's golden output
    # (type_support.test:44): 18446744073709551615 must fit.
    assert T.DecimalType(20, 0).precision >= len("18446744073709551615")


def test_roundtrip_core():
    for duck in ["BOOLEAN", "INTEGER", "BIGINT", "DOUBLE", "VARCHAR",
                 "BLOB", "DATE", "TIMESTAMP", "DECIMAL(12,3)", "INTEGER[]"]:
        assert spark_to_duckdb(duckdb_to_spark(duck)).upper().replace(" ", "") in (
            duck.replace(" ", ""),
        )


def test_schema_from_ddl():
    s = schema_from_ddl("id INTEGER, name VARCHAR, vals DOUBLE[], amount DECIMAL(10,2)")
    assert [f.name for f in s.fields] == ["id", "name", "vals", "amount"]
    assert s["vals"].dataType == T.ArrayType(T.DoubleType())
    assert s["amount"].dataType == T.DecimalType(10, 2)


def test_unknown_type_raises():
    with pytest.raises(ValueError):
        duckdb_to_spark("GEOMETRY")


def test_enum_declaration_order(spark):
    """Enum MIN/MAX/ORDER BY follow declaration order, not lexicographic
    (enum_type_support.test:65-82: happy < sad < neutral)."""
    from pyspark.sql import functions as F

    moods = ["happy", "sad", "neutral"]
    df = spark.createDataFrame(
        [(1, "sad"), (2, "happy"), (3, "neutral"), (4, None)],
        "id INT, person_mood STRING",
    )
    rank = F.expr(enum_rank_expr("person_mood", moods))
    ordered = df.filter(F.col("person_mood").isNotNull()).orderBy(rank)
    assert [r.person_mood for r in ordered.collect()] == ["happy", "sad", "neutral"]
    agg = df.agg(
        F.min_by("person_mood", rank).alias("mn"),
        F.max_by("person_mood", rank).alias("mx"),
    ).collect()[0]
    assert (agg.mn, agg.mx) == ("happy", "neutral")


def test_struct_map_ddl_native():
    """STRUCT/MAP DDL maps to native Spark nested types (r2; round 1
    flattened both to StringType — VERDICT item 6). UNION keeps the
    reference's VARCHAR fallback (arrow_utils.cpp:499-502)."""
    st = duckdb_to_spark("STRUCT(a INTEGER, b VARCHAR)")
    assert st == T.StructType(
        [T.StructField("a", T.IntegerType()), T.StructField("b", T.StringType())]
    )
    nested = duckdb_to_spark(
        'STRUCT(pt STRUCT(x DOUBLE, y DOUBLE), tags VARCHAR[])'
    )
    assert isinstance(nested["pt"].dataType, T.StructType)
    assert nested["tags"].dataType == T.ArrayType(T.StringType())
    mp = duckdb_to_spark("MAP(VARCHAR, BIGINT[])")
    assert mp == T.MapType(T.StringType(), T.ArrayType(T.LongType()))
    assert duckdb_to_spark("UNION(num INTEGER, str VARCHAR)") == T.StringType()


def test_struct_map_ddl_roundtrip(spark):
    """A nested CREATE TABLE schema survives a Spark write/read."""
    schema = schema_from_ddl(
        "id BIGINT, loc STRUCT(x DOUBLE, y DOUBLE), counts MAP(VARCHAR, INTEGER)"
    )
    df = spark.createDataFrame(
        [(1, (0.5, 1.5), {"a": 2})], schema
    )
    back = spark.createDataFrame(df.collect(), schema)
    r = back.collect()[0]
    assert r.loc.x == 0.5 and r.counts["a"] == 2
    assert spark_to_duckdb(schema["loc"].dataType) == "STRUCT(x DOUBLE, y DOUBLE)"


def test_parse_enum_values():
    from duckdb_distributed_execution_spark.typemap import (
        enum_domains_from_ddl,
        parse_enum_values,
    )

    assert parse_enum_values("ENUM('happy', 'sad', 'neutral')") == [
        "happy", "sad", "neutral",
    ]
    assert parse_enum_values("ENUM('it''s')") == ["it's"]
    assert parse_enum_values("VARCHAR") is None
    doms = enum_domains_from_ddl(
        "id INTEGER, mood ENUM('happy', 'sad'), note VARCHAR"
    )
    assert doms == {"mood": ["happy", "sad"]}


def test_union_tagged_struct_optin():
    """UNION defaults to the reference's VARCHAR fallback; the opt-in
    maps to the tagged-struct superset with declared member names and
    recursive member types."""
    from pyspark.sql import types as T

    from duckdb_distributed_execution_spark.typemap import duckdb_to_spark

    assert duckdb_to_spark("UNION(num INTEGER, str VARCHAR)") == T.StringType()
    got = duckdb_to_spark(
        "UNION(num INTEGER, str VARCHAR, xs INTEGER[])", union_as_struct=True
    )
    assert got == T.StructType([
        T.StructField("tag", T.ByteType(), True),
        T.StructField("num", T.IntegerType(), True),
        T.StructField("str", T.StringType(), True),
        T.StructField("xs", T.ArrayType(T.IntegerType()), True),
    ])


def test_union_tagged_struct_guards():
    """The synthetic 'tag' discriminator must stay unambiguous: a
    member named 'tag' is rejected, malformed members raise, and
    quoted member names (even with spaces) parse correctly."""
    import pytest as _pytest
    from pyspark.sql import types as T

    from duckdb_distributed_execution_spark.typemap import duckdb_to_spark

    with _pytest.raises(ValueError, match="tag"):
        duckdb_to_spark("UNION(tag INTEGER, str VARCHAR)",
                        union_as_struct=True)
    with _pytest.raises(ValueError, match="tag"):
        duckdb_to_spark('UNION("Tag" INTEGER)', union_as_struct=True)
    with _pytest.raises(ValueError):
        duckdb_to_spark("UNION(lonely)", union_as_struct=True)
    got = duckdb_to_spark('UNION("my member" INTEGER, str VARCHAR)',
                          union_as_struct=True)
    assert got == T.StructType([
        T.StructField("tag", T.ByteType(), True),
        T.StructField("my member", T.IntegerType(), True),
        T.StructField("str", T.StringType(), True),
    ])


def test_union_tagged_struct_roundtrip(spark):
    """Values encoded as tagged structs round-trip through a Spark
    DataFrame with exactly one non-null member per row."""
    from duckdb_distributed_execution_spark.typemap import duckdb_to_spark

    st = duckdb_to_spark("UNION(num INTEGER, str VARCHAR)",
                         union_as_struct=True)
    from pyspark.sql import types as T

    schema = T.StructType([T.StructField("u", st, True)])
    rows = [((0, 42, None),), ((1, None, "hi"),)]
    df = spark.createDataFrame(rows, schema)
    got = [r.u.asDict() for r in df.orderBy("u.tag").collect()]
    assert got == [
        {"tag": 0, "num": 42, "str": None},
        {"tag": 1, "num": None, "str": "hi"},
    ]
