"""Stateful Structured-Streaming operators: session windows and
stream deduplication.

The reference sessionises and dedups in daily batch re-runs (dqa/
data_getters.py re-reads whole windows per run). As streams:

- ``streaming_user_sessions`` — native session windows
  (``F.session_window``): state = open session per user, closed by the
  watermark when the 30-min gap passes. The streaming twin of the batch
  sessionize operator (operators/sessionize.py).
- ``streaming_first_seen`` — ``dropDuplicatesWithinWatermark``: keeps
  the first row per key with state bounded by the watermark — the
  streaming form of exact dedup (dqa/data_getters.py:
  identify_duplicates), and the shape a 100 TB ingest pipeline actually
  uses (bounded state, no full-corpus shuffle per batch).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .stock import events_stream, run_to_completion

SESSION_GAP = "30 minutes"
DEDUP_WATERMARK = "1 day"


def streaming_user_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user session windows (30-min gap), run to completion.

    Returns (user_id, session_start, session_end, n_events) where
    session_end = last event + gap (session_window semantics).
    """
    stream = events_stream(spark, sf_dir)
    sessions = (
        stream.withWatermark("ts", SESSION_GAP)
        .groupBy(F.session_window("ts", SESSION_GAP).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss.SSSSSS").alias(
                "session_start"
            ),
            F.date_format(F.col("w.end"), "yyyy-MM-dd HH:mm:ss.SSSSSS").alias(
                "session_end"
            ),
            "n_events",
        )
    )
    return run_to_completion(sessions, spark).orderBy("user_id", "session_start")


def streaming_first_seen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-seen (user_id, event_type) pairs via bounded-state stream
    dedup, aggregated to unique-user counts per type."""
    stream = events_stream(spark, sf_dir)
    kept = (
        stream.withWatermark("ts", DEDUP_WATERMARK)
        .select("user_id", "event_type", "ts")
        .dropDuplicatesWithinWatermark(["user_id", "event_type"])
        .select("user_id", "event_type")
    )
    # append-mode sink of the kept keys; aggregate after completion so
    # the dedup operator itself is what the stream exercises.
    table = run_to_completion(kept, spark, mode="append")
    return (
        table.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_unique_users"))
        .orderBy("event_type")
    )
