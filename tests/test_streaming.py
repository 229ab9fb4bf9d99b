"""Structured Streaming tests: the streaming plans must agree with
their batch twins (run with availableNow into a memory sink), and
watermarked session windows must produce sane sessions."""

from __future__ import annotations

import os

from duckdb_distributed_execution_spark import streaming as S
from duckdb_distributed_execution_spark.queries import all_queries
from tests.conftest import SF_SMOKE


def test_stream_batch_parity_tumbling(spark):
    events_path = os.path.join(SF_SMOKE, "events.parquet")
    stream = S.windowed_event_counts(S.read_events_stream(spark, events_path))
    S.run_to_memory(stream, "win_counts")
    got = {
        (r.w_start, r.event_type): (r.cnt, round(r.sum_value, 6))
        for r in spark.table("win_counts").collect()
    }
    batch = all_queries()["events_tumbling_window"].fn(spark, SF_SMOKE)
    expected = {
        (r.w_start, r.event_type): (r.cnt, round(r.sum_value, 6))
        for r in batch.collect()
    }
    assert got == expected
    assert len(got) > 0


def test_stream_stateful_user_counts(spark):
    """applyInPandasWithState keyed state: final per-user running
    counts must equal the batch groupBy counts."""
    events_path = os.path.join(SF_SMOKE, "events.parquet")
    stream = S.running_user_counts_stateful(S.read_events_stream(spark, events_path))
    S.run_to_memory(stream, "user_counts", mode="update")
    # update mode may emit once per micro-batch; the LAST emission per
    # user is the running total.
    rows = spark.table("user_counts").collect()
    final = {}
    for r in rows:
        final[r.user_id] = max(final.get(r.user_id, 0), r.n_events)
    ev = all_queries()["window_lag_lead"].fn(spark, SF_SMOKE)  # registers events view
    expected = {
        r.user_id: r.c
        for r in spark.table("events").groupBy("user_id").agg(
            __import__("pyspark.sql.functions", fromlist=["count"]).count("*").alias("c")
        ).collect()
    }
    assert final == expected


def test_stream_stream_join(spark):
    """Watermarked stream-stream join equals the batch time-range
    join on the same data."""
    from pyspark.sql import functions as F

    events_path = os.path.join(SF_SMOKE, "events.parquet")
    ev_stream = S.read_events_stream(spark, events_path)
    joined = S.stream_stream_join(
        ev_stream.filter("event_type = 'click'"),
        ev_stream.filter("event_type = 'purchase'"),
    )
    q = (joined.writeStream.format("memory").queryName("ssj")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination()
    got = {(r.purchase_id, r.click_id) for r in spark.table("ssj").collect()}

    ev = all_queries()["window_lag_lead"].fn(spark, SF_SMOKE)  # registers events
    batch = spark.sql("""
        SELECT p.event_id AS purchase_id, c.event_id AS click_id
        FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        JOIN (SELECT * FROM events WHERE event_type = 'click') c
          ON p.user_id = c.user_id
         AND c.ts <= p.ts AND c.ts >= p.ts - INTERVAL 30 MINUTES
    """)
    expected = {(r.purchase_id, r.click_id) for r in batch.collect()}
    assert got == expected and len(got) > 0


def test_streaming_dedup(spark):
    """dropDuplicatesWithinWatermark keyed on a derived fingerprint:
    the streamed dedup keeps exactly one event per (user, minute)."""
    from pyspark.sql import functions as F

    events_path = os.path.join(SF_SMOKE, "events.parquet")
    stream = S.read_events_stream(spark, events_path).withColumn(
        "fp", F.concat_ws("|", F.col("user_id"),
                          F.date_trunc("minute", "ts").cast("string"))
    )
    deduped = S.streaming_dedup(stream, ["fp"], watermark="2 hours")
    S.run_to_memory(deduped.groupBy("fp").count(), "dedup_out", mode="complete")
    out = spark.table("dedup_out").collect()
    assert len(out) > 0
    assert all(r["count"] == 1 for r in out)
    # matches the batch distinct count on the same key
    ev = all_queries()["window_lag_lead"].fn(spark, SF_SMOKE)  # registers events
    batch_keys = (
        spark.table("events")
        .select(F.concat_ws("|", F.col("user_id"),
                            F.date_trunc("minute", "ts").cast("string")).alias("fp"))
        .distinct()
        .count()
    )
    assert len(out) == batch_keys


def test_stream_sessionization(spark):
    events_path = os.path.join(SF_SMOKE, "events.parquet")
    stream = S.sessionized_event_counts(
        S.read_events_stream(spark, events_path), gap="30 minutes"
    )
    S.run_to_memory(stream, "sessions")
    rows = spark.table("sessions").collect()
    assert len(rows) > 0
    ev = all_queries()["window_lag_lead"].fn(spark, SF_SMOKE)  # loads events view
    total_events = spark.table("events").count()
    assert sum(r.n_events for r in rows) == total_events
    assert all(r.session_end > r.session_start for r in rows)
