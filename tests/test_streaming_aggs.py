"""Streaming windowed aggregation: closed windows from the streaming query
must equal the batch tumbling-window aggregation for the same data."""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

from kalytical_spark import catalog
from kalytical_spark.streaming import aggregates
from tests.conftest import SF_SMALL


def test_windowed_stream_matches_batch(spark):
    catalog.register(spark, SF_SMALL)
    ev = spark.table("events_ms").select("ts", "event_type", "value")
    with tempfile.TemporaryDirectory() as tmp:
        src = os.path.join(tmp, "events")
        ev.coalesce(1).write.parquet(src)
        stream = spark.readStream.schema(ev.schema).parquet(src)
        q = aggregates.start_windowed_query(spark, stream, "win_e2e")
        try:
            assert q.awaitTermination(120)
        finally:
            q.stop()
        got = {
            (r.window_start, r.event_type): (r.n, round(r.sum_value, 4))
            for r in spark.sql("SELECT * FROM win_e2e").collect()
        }
    batch = (
        ev.groupBy(F.window("ts", "6 hours").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.sum("value").alias("sum_value"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n", "sum_value")
        .collect()
    )
    want = {(r.window_start, r.event_type): (r.n, round(r.sum_value, 4)) for r in batch}
    assert got, "no closed windows emitted"
    # append mode: only watermark-closed windows emit; every emitted window
    # must match the batch result exactly, and most windows should close
    for k, v in got.items():
        assert want[k] == v, k
    assert len(got) >= 0.9 * len(want)
