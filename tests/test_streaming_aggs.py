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


def test_session_window_matches_batch_sessionization(spark):
    """Streaming session_window must produce the same (user, n_events)
    session multiset as the batch lag+cumsum sessionization."""
    catalog.register(spark, SF_SMALL)
    ev = spark.table("events_ms").select("ts", "user_id", "event_id")
    with tempfile.TemporaryDirectory() as tmp:
        src = os.path.join(tmp, "events")
        ev.coalesce(1).write.parquet(src)
        stream = spark.readStream.schema(ev.schema).parquet(src)
        q = aggregates.start_session_query(spark, stream, "sess_e2e")
        try:
            assert q.awaitTermination(120)
        finally:
            q.stop()
        got = sorted(
            (r.user_id, r.n_events)
            for r in spark.sql("SELECT * FROM sess_e2e").collect()
        )
    from pyspark.sql import Window as W

    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    # session_window semantics: millisecond precision, a gap of exactly the
    # window duration starts a NEW session (end-exclusive) — the batch twin
    # must use >= on sub-second epoch values, not > on truncated seconds
    gap = F.col("ts").cast("double") - F.lag(F.col("ts").cast("double")).over(w)
    batch = (
        ev.withColumn("new_sess", (gap.isNull() | (gap >= 1800.0)).cast("int"))
        .withColumn("sess_id", F.sum("new_sess").over(w.rowsBetween(W.unboundedPreceding, 0)))
        .groupBy("user_id", "sess_id")
        .agg(F.count("*").alias("n_events"))
        .collect()
    )
    want = sorted((r.user_id, r.n_events) for r in batch)
    # append mode emits only watermark-closed sessions; require near-complete
    # closure and exact agreement on the emitted multiset
    assert len(got) >= 0.9 * len(want)
    want_set: dict = {}
    for k in want:
        want_set[k] = want_set.get(k, 0) + 1
    for k in got:
        assert want_set.get(k, 0) > 0, f"session {k} not in batch result"
        want_set[k] -= 1


def test_streaming_dedup_drops_replays(spark):
    """Feed every event twice (an at-least-once source); the deduped stream
    must emit each event_id exactly once."""
    catalog.register(spark, SF_SMALL)
    ev = spark.table("events_ms").select("event_id", "ts")
    with tempfile.TemporaryDirectory() as tmp:
        src = os.path.join(tmp, "events")
        ev.coalesce(1).write.mode("append").parquet(src)
        ev.coalesce(1).write.mode("append").parquet(src)  # the replay
        stream = spark.readStream.schema(ev.schema).parquet(src)
        q = (
            aggregates.deduped_event_stream(stream)
            .writeStream.outputMode("append")
            .format("memory")
            .queryName("dedup_e2e")
            .trigger(availableNow=True)
            .start()
        )
        try:
            assert q.awaitTermination(120)
        finally:
            q.stop()
        got = [r.event_id for r in spark.sql("SELECT event_id FROM dedup_e2e").collect()]
    assert len(got) == ev.count()
    assert len(got) == len(set(got))


def test_cron_origination_stream(spark):
    """Hourly tick stream (with replayed ticks) originates each scheduled
    pipeline exactly once per hour boundary with stable exec ids."""
    from kalytical_spark.streaming import sinks

    catalog.register(spark, SF_SMALL)
    n_scheduled = (
        spark.table("pipeline_defs").filter(F.col("schedule").isNotNull()).count()
    )
    ticks = spark.createDataFrame(
        [("2024-01-01 10:00:05",), ("2024-01-01 10:30:00",),  # same hour twice
         ("2024-01-01 11:00:01",)],
        "tick_ts string",
    ).select(F.col("tick_ts").cast("timestamp").alias("tick_ts"))
    with tempfile.TemporaryDirectory() as tmp:
        src = os.path.join(tmp, "ticks")
        ticks.coalesce(1).write.parquet(src)
        stream = spark.readStream.schema("tick_ts timestamp").parquet(src)
        q = (
            sinks.cron_origination_stream(spark, stream, SF_SMALL)
            .writeStream.outputMode("append")
            .format("memory")
            .queryName("cron_e2e")
            .trigger(availableNow=True)
            .start()
        )
        try:
            assert q.awaitTermination(120)
        finally:
            q.stop()
        rows = spark.sql("SELECT * FROM cron_e2e").collect()
    assert len(rows) == 2 * n_scheduled  # two distinct hour boundaries
    assert len({(r.pipeline_uuid, r.event_time) for r in rows}) == len(rows)
    assert all(len(r.exec_uuid) == 8 for r in rows)


def test_watermark_drops_late_data(spark):
    """ST9 semantics proof: an event arriving in a later micro-batch with a
    timestamp older than the advanced watermark is dropped from the
    aggregation (append mode) — the late-data discard the reference's
    age-out TTL only approximates."""
    import pyspark.sql.types as T

    schema = T.StructType([
        T.StructField("ts", T.TimestampType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
    ])
    import datetime as dt

    base = dt.datetime(2024, 6, 1, 0, 0, 0)
    with tempfile.TemporaryDirectory() as tmp:
        src = os.path.join(tmp, "ev")
        ckpt = os.path.join(tmp, "ckpt")
        os.makedirs(src)
        batch1 = spark.createDataFrame(
            [(base, "a", 1.0), (base + dt.timedelta(hours=30), "a", 1.0)], schema
        )
        batch1.coalesce(1).write.mode("append").parquet(src)

        sink = os.path.join(tmp, "out")

        def run():
            # parquet sink: the memory sink cannot resume from a checkpoint
            stream = spark.readStream.schema(schema).parquet(src)
            agg = aggregates.windowed_event_counts(stream)  # 6h windows, 1h watermark
            q = (
                agg.writeStream.outputMode("append")
                .format("parquet")
                .option("path", sink)
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            assert q.awaitTermination(120)
            q.stop()

        run()
        # watermark has advanced to ~hour 29; this event is 29h late
        late = spark.createDataFrame([(base + dt.timedelta(minutes=5), "a", 99.0)], schema)
        late.coalesce(1).write.mode("append").parquet(src)
        run()
        rows = spark.read.parquet(sink).orderBy("window_start").collect()
    first_window = [r for r in rows if r.window_start == base]
    assert len(first_window) == 1
    # the late 99.0 must NOT have been folded into the closed first window
    assert first_window[0].n == 1 and first_window[0].sum_value == 1.0


def test_rolling_wau_stream_matches_batch(spark):
    """Streaming rolling 7-day WAU (chained stateful ops: sliding-window
    membership dedup, then per-window count) must equal the batch
    events_rolling_wau on every watermark-closed window."""
    from kalytical_spark.operators import timeseries

    catalog.register(spark, SF_SMALL)
    ev = spark.table("events_ms").select("ts", "user_id")
    with tempfile.TemporaryDirectory() as tmp:
        src = os.path.join(tmp, "events")
        ev.coalesce(1).write.parquet(src)
        stream = spark.readStream.schema(ev.schema).parquet(src)
        q = aggregates.start_rolling_wau_query(spark, stream, "wau_e2e")
        try:
            assert q.awaitTermination(120)
        finally:
            q.stop()
        got = {
            r.window_day: r.wau
            for r in spark.sql("SELECT * FROM wau_e2e").collect()
        }
    want = {
        r.window_day: r.wau
        for r in timeseries.events_rolling_wau(spark, SF_SMALL).collect()
    }
    assert got, "no closed WAU windows emitted"
    overlap = set(got) & set(want)
    # append mode: only watermark-closed windows emit; everything emitted
    # inside the batch label range must match exactly, and most of the
    # batch range must have closed
    assert len(overlap) >= 0.7 * len(want)
    for day in overlap:
        assert got[day] == want[day], day


def test_rate_anomaly_stream_rollup_matches_batch(spark):
    """Stream the unbounded part (raw log -> hourly rollup), batch-score
    the small part (trailing-24h anomaly test over hours) with the SAME
    scorer as the batch query: anomalies over the streamed rollup must
    equal events_rate_anomaly over the closed-hour prefix."""
    from kalytical_spark.operators import timeseries

    catalog.register(spark, SF_SMALL)
    ev = spark.table("events_ms").select("ts", "event_type")
    with tempfile.TemporaryDirectory() as tmp:
        src = os.path.join(tmp, "events")
        ev.coalesce(1).write.parquet(src)
        stream = spark.readStream.schema(ev.schema).parquet(src)
        q = aggregates.start_hourly_rollup_query(spark, stream, "hourly_e2e")
        try:
            assert q.awaitTermination(120)
        finally:
            q.stop()
        rollup = spark.sql("SELECT event_type, hour, c FROM hourly_e2e")
        # the streamed rollup itself must be exact on closed hours
        max_hour = rollup.agg(F.max("hour")).first()[0]
        assert max_hour is not None, "no closed hours emitted"
        batch_rollup = {
            (r.event_type, r.hour): r.c
            for r in timeseries.hourly_type_counts(spark.table("events_ms"))
            .filter(F.col("hour") <= F.lit(max_hour))
            .collect()
        }
        got_rollup = {(r.event_type, r.hour): r.c for r in rollup.collect()}
        assert got_rollup == batch_rollup
        # scoring the streamed rollup reproduces the batch anomaly ledger
        # on the closed prefix (trailing-window scores only look backward)
        got = sorted(
            (r.event_type, r.hour, r.c, r.lhs, r.rhs)
            for r in timeseries.score_rate_anomalies(rollup).collect()
        )
    want = sorted(
        (r.event_type, r.hour, r.c, r.lhs, r.rhs)
        for r in timeseries.events_rate_anomaly(spark, SF_SMALL).collect()
        if r.hour <= max_hour
    )
    assert got == want
