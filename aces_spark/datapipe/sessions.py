"""Event-stream utilities: sessionization and per-entity activity stats.

Batch formulations of the classic streaming ops (the structured-streaming
variants live in ``aces_spark.streaming``): gap-based sessionization is a
lag + cumulative-sum over the per-user ordered window — one shuffle keyed
by ``user_id``, reusing the same partitioning as every other per-entity op.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.timecol import epoch_micros


def sessionize(
    events: DataFrame,
    gap_minutes: int = 30,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Assign a session index per user: a new session starts when the gap
    from the previous event exceeds ``gap_minutes``. Adds ``session_id``
    (0-based per user). Accepts TIMESTAMP or TIMESTAMP_NTZ event times
    (normalized via :func:`aces_spark.functions.timecol.epoch_micros`)."""
    w = Window.partitionBy(user_col).orderBy(F.col(ts_col).asc())
    gap_us = gap_minutes * 60 * 1_000_000
    prev = F.lag(epoch_micros(ts_col)).over(w)
    new_session = F.when(
        prev.isNull() | ((epoch_micros(ts_col) - prev) > gap_us), F.lit(1)
    ).otherwise(F.lit(0))
    return events.withColumn(
        "session_id",
        F.sum(new_session).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)) - 1,
    )


def session_stats(
    events: DataFrame,
    gap_minutes: int = 30,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Per-user session summary: number of sessions, events, and the mean
    session length in seconds (rounded to 3 dp)."""
    s = sessionize(events, gap_minutes, user_col, ts_col)
    # keep session lengths as exact integer microseconds until the final
    # average so Spark and any SQL oracle agree bit-for-bit
    per_session = s.groupBy(user_col, "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        (epoch_micros(F.max(ts_col)) - epoch_micros(F.min(ts_col))).alias("session_us"),
    )
    return per_session.groupBy(user_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_sessions"),
        F.sum("n_events").cast("long").alias("n_events"),
        F.round(F.avg("session_us") / 1_000_000.0, 3).alias("avg_session_secs"),
    )
