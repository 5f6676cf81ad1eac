"""Structured Streaming over the events table: watermarked event-time
windows and sessionization (SURVEY.md §2.9 — scope beyond the batch
reference, built entirely from ``window()`` / ``session_window()`` /
``withWatermark`` built-ins).

The same expressions run in batch (queries/streaming.py, oracle-checked)
and under ``readStream`` here; tests drive the stream with
``Trigger.AvailableNow`` + a memory sink and assert stream == batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_event_counts(
    events: DataFrame,
    window: str = "1 hour",
    slide: str | None = None,
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked tumbling/sliding counts per event_type."""
    win = (
        F.window("ts", window) if slide is None else F.window("ts", window, slide)
    )
    # Parquet TIMESTAMP without isAdjustedToUTC arrives as TIMESTAMP_NTZ,
    # which withWatermark rejects; event-time state tracking needs the
    # instant (LTZ) type. Session tz is pinned to UTC, so the cast is
    # deterministic and stream==batch equality is preserved (both paths
    # go through this function).
    events = events.withColumn("ts", F.col("ts").cast("timestamp"))
    return (
        events.withWatermark("ts", watermark)
        .groupBy(win.alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"), F.sum("value").alias("total_value"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def sessionized_stream(
    events: DataFrame, gap: str = "10 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Watermarked session windows per user (stateful merge op)."""
    events = events.withColumn("ts", F.col("ts").cast("timestamp"))
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"), F.sum("value").alias("total_value"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "total_value",
        )
    )
