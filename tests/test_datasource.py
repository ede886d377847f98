"""Custom Python DataSource tests: the tick generator must produce the
exact arithmetic tick sequence, honor its partitioning options (generation
is executor-side), and stream the same sequence in bounded micro-batches
with replayable offsets."""

from __future__ import annotations

import pytest

from kalytical_spark.datasource import register_datasources


@pytest.fixture()
def ticks_spark(spark):
    register_datasources(spark)
    return spark


def _read(spark, **opts):
    r = spark.read.format("kalytical_ticks")
    for k, v in opts.items():
        r = r.option(k, v)
    return r.load()


def test_batch_ticks_exact_sequence(ticks_spark):
    df = _read(ticks_spark, start_epoch=1000, end_epoch=1600, interval_s=60)
    rows = sorted((r.tick_id, r.tick_epoch) for r in df.collect())
    assert rows == [(i, 1000 + 60 * i) for i in range(10)]


def test_batch_ticks_partitioned(ticks_spark):
    df = _read(
        ticks_spark, start_epoch=0, end_epoch=1000, interval_s=1, num_partitions=7
    )
    assert df.rdd.getNumPartitions() == 7
    assert df.count() == 1000
    assert df.select("tick_id").distinct().count() == 1000


def test_empty_range(ticks_spark):
    df = _read(ticks_spark, start_epoch=500, end_epoch=500, interval_s=60)
    assert df.count() == 0


def test_streaming_ticks_match_batch(ticks_spark):
    stream = (
        ticks_spark.readStream.format("kalytical_ticks")
        .option("start_epoch", 1000)
        .option("end_epoch", 1600)
        .option("interval_s", 60)
        .option("max_ticks_per_batch", 3)
        .load()
    )
    # Python stream sources don't support Trigger.AvailableNow (Spark falls
    # back to one batch); drain with processAllAvailable instead — the
    # end_epoch cap makes the source run dry deterministically
    q = (
        stream.writeStream.format("memory")
        .queryName("ticks_stream")
        .outputMode("append")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = sorted(
        (r.tick_id, r.tick_epoch) for r in ticks_spark.table("ticks_stream").collect()
    )
    assert got == [(i, 1000 + 60 * i) for i in range(10)]
