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


def rolling_wau_stream(events_stream: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Streaming twin of operators/timeseries.events_rolling_wau: exact
    rolling 7-day active users, incrementally. Chained stateful operators
    (Spark 3.5+): a sliding 7d/1d window grouped by (window, user) first
    reduces to distinct window-user membership, then a second stateful
    aggregation counts members per window — streaming cannot run
    countDistinct directly, but dedup-then-count is the same exact result
    with watermark-bounded state. Emits ``window_day`` = the last day the
    window covers (w.start + 6 days), matching the batch query's labeling,
    once the watermark closes the window."""
    member = (
        events_stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "7 days", "1 day").alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"))
    )
    return (
        member.groupBy("w")
        .agg(F.count("*").cast("bigint").alias("wau"))
        .select(
            F.date_add(F.col("w.start").cast("date"), 6).alias("window_day"),
            "wau",
        )
    )


def start_rolling_wau_query(
    spark: SparkSession, events_stream: DataFrame, query_name: str = "rolling_wau"
):
    return (
        rolling_wau_stream(events_stream)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )


def hourly_type_counts(events_stream: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Streaming (event_type, hour, c) rollup — the incremental
    materialization of operators/timeseries.hourly_type_counts. The
    trailing-24h anomaly test then runs BATCH over this tiny rollup
    (operators/timeseries.score_rate_anomalies): stream what is unbounded
    (the raw log -> hourly counts), score what is small (hours), sharing
    the scorer so the modes cannot drift."""
    return (
        events_stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").cast("bigint").alias("c"))
        .select(F.col("w.start").alias("hour"), "event_type", "c")
    )


def start_hourly_rollup_query(
    spark: SparkSession, events_stream: DataFrame, query_name: str = "hourly_rollup"
):
    return (
        hourly_type_counts(events_stream)
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
