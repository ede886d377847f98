"""Streaming windowed aggregation with watermarks (SURVEY.md ST9 and the
section-2.8 window extension): the streaming twin of
operators/mutations.events_tumbling_windows. Late data beyond the watermark
is dropped — the semantic the reference approximates with its age-out TTL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def windowed_event_counts(
    events_stream: DataFrame,
    window: str = "6 hours",
    watermark: str = "1 hour",
) -> DataFrame:
    """Tumbling event-time windows over a streaming event frame; watermark
    bounds state and defines the late-data cutoff."""
    return (
        events_stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.sum("value").alias("sum_value"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n",
            "sum_value",
        )
    )


def start_windowed_query(
    spark: SparkSession,
    events_stream: DataFrame,
    query_name: str = "windowed_counts",
):
    """Bounded run to a memory sink (append mode: only watermark-closed
    windows emit — the exactly-once ledger shape)."""
    agg = windowed_event_counts(events_stream)
    return (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )


def session_window_counts(events_stream: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Session windows (dynamic-gap sessionization) — the streaming twin of
    the batch lag+cumsum sessionization in operators/events.py."""
    return (
        events_stream.withWatermark("ts", "1 hour")
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


def start_session_query(
    spark: SparkSession, events_stream: DataFrame, query_name: str = "sessions"
):
    return (
        session_window_counts(events_stream)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )


def deduped_event_stream(events_stream: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Streaming deduplication: drop exact replays of an event id within the
    watermark horizon (dropDuplicatesWithinWatermark bounds the dedup state,
    unlike a plain dropDuplicates which grows forever) — the exactly-once
    ingest guard for at-least-once sources."""
    return events_stream.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )
