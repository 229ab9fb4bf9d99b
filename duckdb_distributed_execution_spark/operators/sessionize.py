"""Gap-based sessionization — the canonical ``applyInPandas`` custom
grouped operator (SURVEY §7: Pandas-UDF-backed only where DataFrame
ops don't fit; here both implementations exist, and the window-based
one IS the oracle for the pandas one).

At scale: one shuffle on the grouping key either way. The pandas
variant holds one user's events in memory per group — fine for
user-level grouping (bounded per-key cardinality), and the batch size
is Arrow-controlled. The window variant never materializes a group.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

SESSION_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_sessions", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("longest_session", T.LongType()),
    ]
)


def sessionize_window(
    events: DataFrame, user_col: str, ts_col: str, gap_seconds: int
) -> DataFrame:
    """Window-based sessionization: a new session starts where the gap
    from the previous event exceeds ``gap_seconds``."""
    w = Window.partitionBy(user_col).orderBy(ts_col, "event_id")
    # Exact microsecond arithmetic: cast-to-long floors each row's
    # timestamp to whole seconds BEFORE differencing, which shifts the
    # gap by up to ±1 s against the true elapsed time — found by the
    # 10x-scale verify (tools/probe_scale.py --verify) where 39
    # session boundaries sat inside that error band. unix_micros /
    # epoch_us (oracle) compare the true gap on both engines.
    us = F.unix_micros(F.col(ts_col))
    gap = us - F.lag(us).over(w)
    new_session = F.when(
        gap.isNull() | (gap > gap_seconds * 1_000_000), 1
    ).otherwise(0)
    with_sess = events.withColumn("__new", new_session).withColumn(
        "__sess", F.sum("__new").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    per_session = with_sess.groupBy(user_col, "__sess").agg(
        F.count(F.lit(1)).alias("__n")
    )
    return per_session.groupBy(user_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_sessions"),
        F.sum("__n").cast("long").alias("n_events"),
        F.max("__n").cast("long").alias("longest_session"),
    )


def sessionize_pandas(
    events: DataFrame, user_col: str, ts_col: str, gap_seconds: int
) -> DataFrame:
    """Same semantics via applyInPandas — the template for grouped
    custom logic that genuinely needs imperative code."""

    def per_user(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values([ts_col, "event_id"])
        micros = pdf[ts_col].astype("int64") // 1_000  # ns -> us, exact
        gaps = micros.diff()
        new_session = (gaps.isna()) | (gaps > gap_seconds * 1_000_000)
        sess_id = new_session.cumsum()
        sizes = sess_id.value_counts()
        return pd.DataFrame(
            {
                "user_id": [int(pdf[user_col].iloc[0])],
                "n_sessions": [int(sess_id.max())],
                "n_events": [len(pdf)],
                "longest_session": [int(sizes.max())],
            }
        )

    return events.select(user_col, ts_col, "event_id").groupBy(user_col).applyInPandas(
        per_user, schema=SESSION_SCHEMA
    )
