"""observe() + StreamingQueryListener: per-batch observed metrics must
account for every ingested row, exactly (the aggregates run inside the
query plan, so this also pins that attaching them changes no results)."""

from __future__ import annotations

import os
import tempfile
import time

from pyspark.sql import functions as F

from kalytical_spark import catalog
from kalytical_spark.streaming import observability
from tests.conftest import SF_SMALL


def test_observed_metrics_account_for_every_row(spark):
    catalog.register(spark, SF_SMALL)
    ev = spark.table("lifecycle_events").select(
        "pipeline_uuid", "event_subtype", "event_time"
    )
    total = ev.count()
    n_null = ev.filter(F.col("event_subtype").isNull()).count()
    listener = observability.IngestMetricsListener()
    spark.streams.addListener(listener)
    try:
        with tempfile.TemporaryDirectory() as tmp:
            src = os.path.join(tmp, "events")
            ev.repartition(4).write.parquet(src)  # 4 files -> 4 batches
            stream = (
                spark.readStream.schema(ev.schema)
                .option("maxFilesPerTrigger", 1)
                .parquet(src)
            )
            counted = observability.with_ingest_metrics(stream).groupBy(
                "pipeline_uuid"
            ).count()
            q = (
                counted.writeStream.outputMode("complete")
                .format("memory")
                .queryName("obs_e2e")
                .option("checkpointLocation", os.path.join(tmp, "ckpt"))
                .trigger(availableNow=True)
                .start()
            )
            try:
                assert q.awaitTermination(180)
            finally:
                q.stop()
            # the observation must not perturb the query itself
            assert (
                spark.sql("SELECT SUM(count) FROM obs_e2e").collect()[0][0] == total
            )
        # listener callbacks are async: give the bus a moment to drain
        deadline = time.time() + 30
        while time.time() < deadline and sum(
            r["n_rows"] for r in listener.rows
        ) < total:
            time.sleep(0.5)
    finally:
        spark.streams.removeListener(listener)
    assert listener.progress_events >= 1
    assert sum(r["n_rows"] for r in listener.rows) == total
    assert sum(r["n_null_subtype"] for r in listener.rows) == n_null
    for r in listener.rows:
        assert r["approx_pipelines"] >= 1
