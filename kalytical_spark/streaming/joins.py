"""Stream-stream interval join (§2.8 depth): correlate two live event
streams — each purchase attributed to the clicks by the same user in the
preceding attribution window — with watermarks on BOTH sides so the join
state is bounded.

This is the Structured Streaming feature the rest of the streaming package
doesn't exercise: two unbounded inputs, a range condition on event time,
and state retention derived from watermark + interval. Spark keeps each
side's rows in state only until the watermark passes the last instant they
could still match (click state: ATTRIBUTION_WINDOW + watermark delay;
purchase state: watermark delay) — at 100 TB/day the state store holds
hours, not the stream.

Semantics: inner join, ``click_ts <= purchase_ts <= click_ts + window``,
equi-key on user_id. Inner stream-stream joins emit matches as they are
found (watermarks bound STATE, not emission), so on an in-order replay the
streamed result equals the batch interval join exactly — pinned in
tests/test_streaming_joins.py.

Reference parity: the reference has no stream-correlation surface (its
mq_poller is a single at-most-once queue); this is part of the engine's
streaming extension family (COVERAGE.md "Streaming extras").
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ATTRIBUTION_WINDOW = "2 hours"
WATERMARK_DELAY = "1 hour"


def _sides(events: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Split one event frame into the click and purchase sides with
    disjoint column names (stream-stream joins forbid ambiguous refs)."""
    clicks = events.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
        F.col("value").alias("purchase_value"),
    )
    return clicks, purchases


def attribution_join(events: DataFrame, window: str = ATTRIBUTION_WINDOW) -> DataFrame:
    """Purchases joined to same-user clicks within the attribution window.
    Works identically on a streaming frame (watermarked, bounded state) and
    a batch frame (watermark is a no-op in batch) — which is exactly how
    the equivalence test pins the semantics. ``window`` widens the lookback
    for batch callers (the multi-touch credit model uses a day); the
    streaming default stays ATTRIBUTION_WINDOW so join state stays small."""
    clicks, purchases = _sides(events)
    if events.isStreaming:
        clicks = clicks.withWatermark("click_ts", WATERMARK_DELAY)
        purchases = purchases.withWatermark("purchase_ts", WATERMARK_DELAY)
    return clicks.join(
        purchases,
        F.expr(
            f"""
            c_user = p_user
            AND purchase_ts >= click_ts
            AND purchase_ts <= click_ts + INTERVAL {window}
            """
        ),
    ).select(
        F.col("c_user").alias("user_id"),
        "click_id",
        "purchase_id",
        "click_ts",
        "purchase_ts",
        "purchase_value",
    )


def attribution_join_outer(
    events: DataFrame, window: str = ATTRIBUTION_WINDOW
) -> DataFrame:
    """LEFT OUTER stream-stream variant: every click emits, matched to its
    in-window purchases or null-padded — the funnel's "no conversion"
    detector. The emission semantics differ fundamentally from inner:
    Spark can only declare a click unmatched once the WATERMARK has passed
    the end of its attribution window (until then a matching purchase may
    still arrive), so null-padded rows trail the data by watermark delay +
    window. State stays watermark-bounded exactly like the inner join;
    tests push a sentinel through to flush the tail and pin
    streamed == batch left join."""
    clicks, purchases = _sides(events)
    if events.isStreaming:
        clicks = clicks.withWatermark("click_ts", WATERMARK_DELAY)
        purchases = purchases.withWatermark("purchase_ts", WATERMARK_DELAY)
    return clicks.join(
        purchases,
        F.expr(
            f"""
            c_user = p_user
            AND purchase_ts >= click_ts
            AND purchase_ts <= click_ts + INTERVAL {window}
            """
        ),
        "leftOuter",
    ).select(
        F.col("c_user").alias("user_id"),
        "click_id",
        "purchase_id",
        "click_ts",
        "purchase_ts",
        "purchase_value",
    )


def stream_static_enrichment(events_stream: DataFrame, defs: DataFrame) -> DataFrame:
    """Stream-static equi-join (the third join mode, completing
    stream-stream above and the foreachBatch folds in maintenance.py):
    each lifecycle micro-batch is enriched with the pipeline catalog. The
    static side is broadcast and RE-RESOLVED per micro-batch — a catalog
    update is visible to the next batch without restarting the query — and
    the join is stateless, so no watermark is involved. Left join: an
    event for an unknown pipeline passes through with null dims (dropping
    it would silently lose data on a catalog lag)."""
    dims = defs.select("pipeline_uuid", "engine", "retry_max")
    return events_stream.join(F.broadcast(dims), "pipeline_uuid", "left")
