"""events_tumbling_window r9 surgery pin: the arithmetic epoch bucket
(`ts - ts mod 5min` over unix_micros) is row-identical to the
F.window('5 minutes') struct form it replaced — same buckets, same
groups, same scaled-long sums — on the real events corpus. (The
streaming twin keeps F.window: watermarks require it; this pin is
what lets the batch query take the 2.9×-faster arithmetic form
without semantic drift.)"""

from __future__ import annotations

from pyspark.sql import functions as F

from duckdb_distributed_execution_spark.queries import all_queries, load

SF = "/root/testdata/sf0.001"


def _f_window_form(spark, sf_dir):
    ev = load(spark, sf_dir, "events")["events"]
    return (
        ev.groupBy(F.window("ts", "5 minutes").alias("w"),
                   F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            (F.sum(F.floor(F.col("value") * F.lit(1_000_000.0)
                           + F.lit(0.5)))
             / F.lit(1_000_000.0)).alias("sum_value"),
        )
        .select(F.col("w.start").alias("w_start"), "event_type",
                "cnt", "sum_value")
    )


def test_arithmetic_bucket_equals_f_window(spark):
    fast = all_queries()["events_tumbling_window"].fn(spark, SF)
    ref = _f_window_form(spark, SF)
    rows_f = {tuple(r) for r in fast.collect()}
    rows_r = {tuple(r) for r in ref.collect()}
    assert rows_f == rows_r
    assert [f.name for f in fast.schema.fields] == [
        "w_start", "event_type", "cnt", "sum_value",
    ]
    assert dict(fast.dtypes)["w_start"] == "timestamp"
