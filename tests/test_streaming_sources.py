"""Stream-source factory tests: the file branch must behave exactly like a
direct readStream; the kafka branch's option map and payload mapping are
pinned without a broker (the mapping runs identically on batch frames)."""

from __future__ import annotations

import os
import tempfile

import pytest
from pyspark.sql import functions as F

from kalytical_spark import catalog
from kalytical_spark.config import KalyticalSparkConfig
from kalytical_spark.streaming import sources
from tests.conftest import SF_SMALL


def _events(spark):
    catalog.register(spark, SF_SMALL)
    return spark.table("lifecycle_events")


def test_file_source_streams_everything(spark):
    ev = _events(spark)
    with tempfile.TemporaryDirectory() as tmp:
        src = os.path.join(tmp, "in")
        ev.write.parquet(src)
        stream = sources.lifecycle_event_stream(spark, ev.schema, path=src)
        assert stream.isStreaming
        q = (
            stream.writeStream.format("memory")
            .queryName("src_file_all")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(120)
        assert spark.table("src_file_all").count() == ev.count()


def test_file_source_requires_path(spark):
    with pytest.raises(ValueError, match="path"):
        sources.lifecycle_event_stream(spark, _events(spark).schema)


def test_kafka_reader_options_contract():
    cfg = KalyticalSparkConfig()
    opts = sources.kafka_reader_options(cfg)
    assert opts["kafka.bootstrap.servers"] == cfg.kafka_bootstrap_servers
    assert opts["subscribe"] == cfg.kafka_topic
    assert opts["startingOffsets"] == "earliest"


def test_kafka_payload_mapping_roundtrip(spark):
    """value-bytes -> canonical schema, proven on a batch frame: serialize
    the real events to JSON exactly as a producer would, parse with the
    factory's mapping, and require a lossless roundtrip."""
    ev = _events(spark).limit(200)
    raw = ev.select(F.to_json(F.struct(*ev.columns)).cast("binary").alias("value"))
    parsed = sources.parse_event_payload(raw, ev.schema)
    # from_json emits nullable fields regardless of input nullability;
    # names and types must match exactly
    assert [(f.name, f.dataType) for f in parsed.schema.fields] == [
        (f.name, f.dataType) for f in ev.schema.fields
    ]
    want = {tuple(r) for r in ev.collect()}
    got = {tuple(r) for r in parsed.collect()}
    assert got == want


def test_unknown_source_rejected(spark):
    cfg = KalyticalSparkConfig(stream_source="carrier-pigeon")
    with pytest.raises(sources.UnknownStreamSourceError):
        sources.lifecycle_event_stream(spark, _events(spark).schema, cfg=cfg)


def test_streaming_culler_matches_batch_and_survives_restart(spark):
    """The culler-as-streaming-query must (1) produce exactly the batch
    culler's decision set per tick, (2) be idempotent/checkpointed: a second
    bounded run over the same tick source adds nothing."""
    from kalytical_spark.operators.dag import dag_cull_decisions
    from kalytical_spark.streaming import culler

    want = {tuple(r) for r in dag_cull_decisions(spark, SF_SMALL).collect()}
    assert want
    with tempfile.TemporaryDirectory() as tmp:
        ticks_src = os.path.join(tmp, "ticks")
        ledger = os.path.join(tmp, "ledger")
        ckpt = os.path.join(tmp, "ckpt")
        spark.createDataFrame([(1,)], "tick int").write.parquet(ticks_src)
        tick_stream = spark.readStream.schema("tick int").parquet(ticks_src)
        q = culler.start_culler_query(
            spark, SF_SMALL, ledger, ckpt, tick_stream=tick_stream
        )
        assert q.awaitTermination(120)
        got_rows = culler.read_culler_ledger(spark, ledger).collect()
        batch_ids = {r.batch_id for r in got_rows}
        got = {tuple(r)[:-1] for r in got_rows}  # strip batch_id (last col)
        assert got == want
        # restart against the same checkpoint: no new ticks -> no new sweeps
        tick_stream2 = spark.readStream.schema("tick int").parquet(ticks_src)
        q2 = culler.start_culler_query(
            spark, SF_SMALL, ledger, ckpt, tick_stream=tick_stream2
        )
        assert q2.awaitTermination(120)
        again = culler.read_culler_ledger(spark, ledger).collect()
        assert len(again) == len(got_rows)
        assert {r.batch_id for r in again} == batch_ids


def test_streaming_culler_resident_mode_starts(spark):
    """Resident mode (no injected tick stream) must come up on the rate
    source and run its first sweep — regression for the fractional
    rowsPerSecond option the rate source rejects (it parses the option as
    a LONG; a float string crashed every production start)."""
    import time

    from kalytical_spark.config import KalyticalSparkConfig
    from kalytical_spark.streaming import culler

    with tempfile.TemporaryDirectory() as tmp:
        ledger = os.path.join(tmp, "ledger")
        ckpt = os.path.join(tmp, "ckpt")
        cfg = KalyticalSparkConfig(incubating_job_culling_interval_s=2)
        q = culler.start_culler_query(spark, SF_SMALL, ledger, ckpt, cfg=cfg)

        def ledger_committed() -> bool:
            # the ledger DIR appears while the first batch is still being
            # written; stopping then kills the write mid-flight and leaves
            # an unreadable directory — so wait for a READABLE batch, not
            # for the path (regression: flaked under co-tenant load)
            try:
                return culler.read_culler_ledger(spark, ledger).count() > 0
            except Exception:
                return False

        try:
            # batch 0 fires immediately with no ticks (skipped by the sink);
            # wait for a later batch to carry a tick and run a real sweep.
            # Deadline generous for co-tenant load.
            deadline = time.time() + 180
            while time.time() < deadline and not ledger_committed():
                if q.exception() is not None:
                    raise AssertionError(q.exception())
                time.sleep(1)
            assert q.exception() is None
            assert ledger_committed(), "no committed sweep within 180s"
        finally:
            q.stop()
        assert culler.read_culler_ledger(spark, ledger).count() > 0
