"""Structured Streaming control loop (SURVEY.md section 7 phase 4; reference
lifecycle E1/E3): the event stream drives the dependency-trigger state
machine incrementally with applyInPandasWithState keyed by downstream
pipeline, emitting the same Fire decisions the batch replay produces.

Upgrades over the reference, by design (SURVEY.md section 4.3):
* exactly-once via checkpointing + idempotent append sink (the reference
  deletes SQS messages even on failure — at-most-once, mq_poller.py:30);
* the Mongo distributed lock (data_provider.py:157-198) disappears:
  per-key serialized state updates give the same mutual exclusion;
* debounce / age-out (job_culler.py:22,35) map to GroupState timeouts.

The state value holds the accumulated trigger map as parallel arrays
(upstreams, exec_uuids) — GroupState supports struct-of-simple-types best.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..streaming.transitions import TriggerState, apply_delivery, sources_repr

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("pipeline_uuid", T.StringType()),
        T.StructField("fired_at", T.TimestampType()),
        T.StructField("trigger_operator", T.StringType()),
        T.StructField("n_deps", T.IntegerType()),
        T.StructField("sources", T.StringType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("seen_upstreams", T.ArrayType(T.StringType())),
        T.StructField("seen_execs", T.ArrayType(T.StringType())),
    ]
)


def _update_group(
    key: tuple[str],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
    ttl_ms: int | None = None,
) -> Iterator[pd.DataFrame]:
    """applyInPandasWithState update function: fold this micro-batch's
    deliveries for one downstream pipeline through the shared transition.

    ttl_ms is bound by the caller ONLY when the query runs with
    ProcessingTimeTimeout (the resident control loop); bounded/NoTimeout
    runs leave it None so no timeout is ever armed. Config errors surface
    at query construction, never silently here (a swallowed failure would
    disable the ST5 age-out and let keyed state grow unbounded)."""
    (pipeline_uuid,) = key
    if state.hasTimedOut:
        # age-out (ST5): drop the partial trigger map
        state.remove()
        return
    if state.exists:
        upstreams, execs = state.get
        seen = dict(zip(upstreams, execs))
    else:
        seen = {}

    rows: list[dict[str, Any]] = []
    operator = None
    n_deps = 0
    # accumulate EVERY Arrow chunk before folding: a group whose micro-batch
    # spans multiple chunks (arrow.maxRecordsPerBatch) arrives as chunks in
    # arbitrary order — sorting each chunk independently would fold the
    # deliveries out of global event-time order and diverge from the batch
    # replay (verified: interleaved chunks shift fired_at/slot winners)
    import pandas as _pd

    chunks = [pdf for pdf in pdfs if len(pdf)]
    if chunks:
        merged = _pd.concat(chunks, ignore_index=True).sort_values(
            ["event_time", "exec_uuid"], kind="mergesort"
        )
    else:
        merged = None
    if merged is not None:
        for row in merged.itertuples(index=False):
            operator = row.trigger_operator
            n_deps = int(row.n_deps)
            tstate = TriggerState(operator=operator, n_deps=n_deps, seen=seen)
            fire = apply_delivery(tstate, row.upstream_uuid, row.exec_uuid, row.event_time)
            seen = tstate.seen
            if fire is not None:
                rows.append(
                    {
                        "pipeline_uuid": pipeline_uuid,
                        "fired_at": fire.event_time,
                        "trigger_operator": operator,
                        "n_deps": n_deps,
                        "sources": sources_repr(fire.sources),
                    }
                )
    if seen:
        ups = sorted(seen)
        state.update((ups, [seen[u] for u in ups]))
        if ttl_ms is not None:
            # age-out TTL (ST5) — same knob the batch culler uses
            state.setTimeoutDuration(ttl_ms)
    elif state.exists:
        state.remove()
    if rows:
        yield pd.DataFrame(rows, columns=[f.name for f in OUTPUT_SCHEMA.fields])


def delivery_stream(
    spark: SparkSession, events_stream: DataFrame, sf_dir: str
) -> DataFrame:
    """Map a streaming lifecycle-event frame to trigger deliveries (the
    streaming twin of operators/replay._deliveries; dims broadcast)."""
    from .. import catalog

    catalog.register(spark, sf_dir)
    edges = spark.table("dag_edges")
    defs = spark.table("pipeline_defs").select("pipeline_uuid", "trigger_operator")
    n_deps = edges.groupBy("pipeline_uuid").agg(F.count("*").cast("int").alias("n_deps"))
    triggers = events_stream.filter(
        (F.col("event_subtype") == "success") & ~F.col("disable_downstream")
    ).select(F.col("pipeline_uuid").alias("upstream_uuid"), "exec_uuid", "event_time")
    return (
        triggers.join(F.broadcast(edges), "upstream_uuid")
        .join(F.broadcast(defs), "pipeline_uuid")
        .join(F.broadcast(n_deps), "pipeline_uuid")
    )


def start_incubation_query(
    spark: SparkSession,
    events_stream: DataFrame,
    sf_dir: str,
    query_name: str = "incubation_fires",
    bounded: bool = True,
):
    """Wire the streaming state machine to a memory sink — a real deployment
    swaps the source for Kafka/Kinesis and the sink for a checkpointed
    foreachBatch appending to the dispatch ledger.

    bounded=True uses trigger(availableNow) with NoTimeout: drain everything
    available and terminate — the test/replay mode (with processing-time
    timeouts armed, the availableNow run keeps scheduling state-cleanup
    batches and never finishes; processAllAvailable likewise never idles).
    bounded=False is the resident control loop: processing-time trigger with
    the age-out TTL armed."""
    deliveries = delivery_stream(spark, events_stream, sf_dir)
    if bounded:
        update_fn = _update_group
    else:
        import functools

        from ..config import load_config

        # resolve the TTL on the driver, at query construction: a broken
        # config fails the start() instead of silently disabling the age-out
        update_fn = functools.partial(
            _update_group, ttl_ms=load_config().incubating_job_age_out_s * 1000
        )
    fires = deliveries.groupBy("pipeline_uuid").applyInPandasWithState(
        update_fn,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=(
            GroupStateTimeout.NoTimeout if bounded else GroupStateTimeout.ProcessingTimeTimeout
        ),
    )
    writer = fires.writeStream.outputMode("append").format("memory").queryName(query_name)
    if bounded:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime="1 second")
    return writer.start()
