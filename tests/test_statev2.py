"""transformWithStateInPandas ledger: the final per-pipeline state after
draining the stream must equal the batch recompute, across multi-batch
splits (state carries between micro-batches)."""

from __future__ import annotations

import os
import tempfile

import pytest
from pyspark.sql import functions as F

from kalytical_spark import catalog
from kalytical_spark.streaming import statev2
from tests.conftest import SF_SMALL

# the transformWithState JVM<->Python state server speaks protobuf; this
# container ships a google.protobuf without its descriptor module, which
# crashes the driver worker at init (statev2.py docstring). Skip, exactly
# like the broker-less Kafka contract tests.
try:
    from google.protobuf import descriptor  # noqa: F401

    _HAS_PROTOBUF = True
except ImportError:
    _HAS_PROTOBUF = False

pytestmark = pytest.mark.skipif(
    not _HAS_PROTOBUF,
    reason="google.protobuf.descriptor unavailable: transformWithState "
    "state server cannot start in this container",
)


def test_ledger_state_matches_batch(spark):
    catalog.register(spark, SF_SMALL)
    ev = spark.table("lifecycle_events").select(
        "pipeline_uuid", "event_subtype", "event_time"
    )
    batch = {
        r.pipeline_uuid: (r.n, r.last_subtype)
        for r in ev.groupBy("pipeline_uuid")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.max(F.struct("event_time", "event_subtype"))["event_subtype"].alias(
                "last_subtype"
            ),
        )
        .collect()
    }
    # transformWithState requires the RocksDB state store provider
    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    with tempfile.TemporaryDirectory() as tmp:
        src = os.path.join(tmp, "events")
        ev.repartition(3).write.parquet(src)  # 3 files -> 3 micro-batches
        stream = (
            spark.readStream.schema(ev.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = (
            statev2.pipeline_ledger_stream(stream)
            .writeStream.outputMode("update")
            .format("memory")
            .queryName("ledger_e2e")
            .option("checkpointLocation", os.path.join(tmp, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        try:
            assert q.awaitTermination(180)
        finally:
            q.stop()
        # update mode emits one row per touched key per batch: the LAST
        # emission per key is the final state
        rows = spark.sql("SELECT * FROM ledger_e2e").collect()
    if prev is not None:
        spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)
    else:
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    final: dict[str, tuple] = {}
    for r in rows:  # memory sink preserves batch order
        final[r.pipeline_uuid] = (r.n_events, r.last_subtype)
    assert final == batch and batch
