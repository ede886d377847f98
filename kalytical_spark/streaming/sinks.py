"""Streaming sinks (SURVEY.md UD4/ST2 streaming path): foreachBatch handing
fire decisions to an execution engine with idempotent, batch-id-keyed
appends — the exactly-once submission ledger that replaces the reference's
fire-and-forget pod creation (engine.py:96-150).

foreachBatch contract: a micro-batch can be REPLAYED after a failure with
the same batch_id; the sink must be idempotent. Here each ledger row carries
its batch_id and replays overwrite that batch's partition (the standard
transactional-append pattern for non-transactional stores).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def dispatch_ledger_sink(ledger_dir: str):
    """Build a foreachBatch function appending fire decisions to a
    batch-partitioned parquet ledger, idempotent under micro-batch replay."""

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        (
            batch_df.withColumn("batch_id", F.lit(batch_id))
            .withColumn(
                "tracking_id",
                F.substring(
                    F.sha2(
                        F.concat_ws(
                            "|", "pipeline_uuid", "sources",
                            # epoch seconds, NOT cast('string'): the string
                            # render depends on spark.sql.session.timeZone,
                            # so a consumer under a different TZ would mint
                            # a different id for the same instant
                            F.unix_timestamp("fired_at").cast("string"),
                        ),
                        256,
                    ),
                    1,
                    10,
                ),
            )
            .write.mode("overwrite")
            .parquet(os.path.join(ledger_dir, f"batch_id={batch_id}"))
        )

    return sink


def start_dispatch_query(
    spark: SparkSession,
    events_stream: DataFrame,
    sf_dir: str,
    ledger_dir: str,
    checkpoint_dir: str,
):
    """The full streaming dispatch pipeline: event stream -> incubation
    state machine -> foreachBatch submission ledger (bounded run)."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    from .incubation import OUTPUT_SCHEMA, STATE_SCHEMA, _update_group, delivery_stream

    deliveries = delivery_stream(spark, events_stream, sf_dir)
    fires = deliveries.groupBy("pipeline_uuid").applyInPandasWithState(
        _update_group,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    return (
        fires.writeStream.foreachBatch(dispatch_ledger_sink(ledger_dir))
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def read_ledger(spark: SparkSession, ledger_dir: str) -> DataFrame:
    return spark.read.option("basePath", ledger_dir).parquet(
        os.path.join(ledger_dir, "batch_id=*")
    )


def cron_origination_stream(
    spark: SparkSession, ticks: DataFrame, sf_dir: str
) -> DataFrame:
    """ST12 streaming form: a clock-tick stream (rate source in production,
    file-based ticks in tests) joined against the scheduled pipelines emits
    origination events at each hourly boundary, deduped within the watermark
    so replayed ticks cannot double-originate. Stable exec ids come from the
    (pipeline, boundary) pair — the idempotence key."""
    from .. import catalog

    catalog.register(spark, sf_dir)
    scheduled = F.broadcast(
        spark.table("pipeline_defs")
        .filter(F.col("schedule").isNotNull())
        .select("pipeline_uuid", "schedule")
    )
    hours = (
        # the watermark delay must cover the WHOLE span over which ticks
        # for one boundary keep arriving (a full hour) — at 10 minutes the
        # boundary's dedup state would be evicted mid-hour and later ticks
        # of the same hour would re-originate it
        ticks.withWatermark("tick_ts", "70 minutes")
        .withColumn("boundary", F.date_trunc("hour", "tick_ts"))
        .dropDuplicatesWithinWatermark(["boundary"])
    )
    return hours.crossJoin(scheduled).select(
        "pipeline_uuid",
        F.lit("origination").alias("event_subtype"),
        F.col("boundary").alias("event_time"),
        F.substring(
            # TZ-independent idempotence key: hash the epoch seconds of the
            # boundary, not its session-timezone string render
            F.md5(
                F.concat(
                    F.col("pipeline_uuid"),
                    F.lit("@"),
                    F.unix_timestamp("boundary").cast("string"),
                )
            ),
            1,
            8,
        ).alias("exec_uuid"),
    )
