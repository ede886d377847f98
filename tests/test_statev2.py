"""transformWithStateInPandas ledger: the final per-pipeline state after
draining the stream must equal the batch recompute, across multi-batch
splits (state carries between micro-batches).

Two proof layers:
* ``test_processor_transitions_match_batch`` drives PipelineLedgerProcessor
  directly through a faithful fake of the StatefulProcessorHandle/ValueState
  contract — per-key batch splits, carried state, arbitrary split points —
  and compares the final emissions against the batch groupBy recompute.
  This runs in EVERY container (no protobuf state server needed), so the
  transition logic is never unverified here.
* ``test_ledger_state_matches_batch`` is the end-to-end streaming run
  through the real protobuf state server — conftest.py bridges in the
  container's bundled pure-python protobuf via tools/protobuf_shim (driver
  sys.path + worker PYTHONPATH), so this runs here too; the skip guard
  remains only for a container with no protobuf source at all.
"""

from __future__ import annotations

import os
import tempfile

import pandas as pd
import pytest
from pyspark.sql import functions as F

from kalytical_spark import catalog
from kalytical_spark.streaming import statev2
from tests.conftest import SF_SMALL

try:
    from google.protobuf import descriptor  # noqa: F401

    _HAS_PROTOBUF = True
except ImportError:
    _HAS_PROTOBUF = False


class _FakeValueState:
    """ValueState contract subset the processor uses: exists/get/update.
    get() returns the stored tuple, like the real handle's row tuple."""

    def __init__(self):
        self._v = None

    def exists(self) -> bool:
        return self._v is not None

    def get(self):
        return self._v

    def update(self, v) -> None:
        self._v = tuple(v)

    def clear(self) -> None:
        self._v = None


class _FakeHandle:
    def __init__(self):
        self.states: dict[str, _FakeValueState] = {}

    def getValueState(self, name, schema, ttl_duration_ms=None):
        return self.states.setdefault(name, _FakeValueState())


def _drive(events, splits):
    """Run PipelineLedgerProcessor over `events` (list of (uuid, subtype,
    time)) split into micro-batches at the given indices; real semantics:
    one processor instance per key with its own state, handleInputRows
    called once per key per batch that touches it. Returns the final
    emission per key."""
    batches = []
    prev = 0
    for s in [*splits, len(events)]:
        if s > prev:
            batches.append(events[prev:s])
            prev = s
    procs: dict[str, statev2.PipelineLedgerProcessor] = {}
    final: dict[str, tuple] = {}
    for batch in batches:
        by_key: dict[str, list] = {}
        for u, s, t in batch:
            by_key.setdefault(u, []).append((s, t))
        for u, rows in by_key.items():
            if u not in procs:
                procs[u] = statev2.PipelineLedgerProcessor()
                procs[u].init(_FakeHandle())
            # feed as 2 chunks when possible: handleInputRows receives an
            # ITERATOR of pandas frames, and the fold must be chunk-invariant
            mid = max(1, len(rows) // 2)
            chunks = [rows[:mid], rows[mid:]] if len(rows) > 1 else [rows]
            pdfs = (
                pd.DataFrame(
                    {
                        "pipeline_uuid": u,
                        "event_subtype": [s for s, _ in ch],
                        "event_time": [t for _, t in ch],
                    }
                )
                for ch in chunks
                if ch
            )
            (out,) = list(procs[u].handleInputRows((u,), pdfs, None))
            final[u] = (int(out.n_events.iloc[0]), out.last_subtype.iloc[0])
    return final


def test_processor_transitions_match_batch(spark):
    """Transition logic == batch recompute on real fixture events, for
    several batch-split choices (including one event per batch)."""
    catalog.register(spark, SF_SMALL)
    ev = (
        spark.table("lifecycle_events")
        .select("pipeline_uuid", "event_subtype", "event_time")
        .orderBy("event_time", "pipeline_uuid", "event_subtype")
        .limit(120)
    )
    events = [(r.pipeline_uuid, r.event_subtype, r.event_time) for r in ev.collect()]
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
    assert batch
    for splits in ([], [40, 80], [1, 2, 3, 60], list(range(1, len(events)))):
        assert _drive(events, splits) == batch, f"splits={splits[:5]}..."


@pytest.mark.skipif(
    not _HAS_PROTOBUF,
    reason="google.protobuf unavailable: transformWithState "
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


# ---------------------------------------------------------------------------
# IncubationTtlProcessor: event-time timers + ListState on the modern API


class _FakeListState:
    def __init__(self):
        self._rows: list[tuple] = []

    def exists(self) -> bool:
        return bool(self._rows)

    def get(self):
        return iter(list(self._rows))

    def appendValue(self, v) -> None:
        self._rows.append(tuple(v))

    def clear(self) -> None:
        self._rows = []


class _FakeTimerHandle(_FakeHandle):
    def __init__(self):
        super().__init__()
        self.lists: dict[str, _FakeListState] = {}
        self.timers: set[int] = set()

    def getListState(self, name, schema, ttl_duration_ms=None):
        return self.lists.setdefault(name, _FakeListState())

    def registerTimer(self, expiry_ms: int) -> None:
        self.timers.add(expiry_ms)

    def deleteTimer(self, expiry_ms: int) -> None:
        self.timers.discard(expiry_ms)


def _ms(ts) -> int:
    return int(pd.Timestamp(ts).value // 1_000_000)


def _fold_ttl_windows(events):
    """Pure-Python reference: per key, TTL-anchored windows over
    time-ordered events; every window eventually closes (last by timer)."""
    by_key: dict[str, list] = {}
    for u, s, t in sorted(events, key=lambda e: (e[2], e[1])):
        by_key.setdefault(u, []).append((s, t))
    out: dict[str, list] = {}
    for u, rows in by_key.items():
        wins = []
        t0, subs, n = None, set(), 0
        for s, t in rows:
            if t0 is not None and _ms(t) >= _ms(t0) + statev2.INCUBATION_TTL_MS:
                wins.append((t0, n, ",".join(sorted(subs)), "rollover"))
                t0, subs, n = None, set(), 0
            if t0 is None:
                t0 = t
            subs.add(s)
            n += 1
        wins.append((t0, n, ",".join(sorted(subs)), "timer"))
        out[u] = wins
    return out


def _drive_ttl(events, splits):
    """Run IncubationTtlProcessor across micro-batch splits, then fire the
    remaining timers (the end-of-stream watermark sweep). Per-key arrival
    must respect event-time order across batches, as documented."""
    events = sorted(events, key=lambda e: (e[2], e[1]))
    batches, prev = [], 0
    for s in [*splits, len(events)]:
        if s > prev:
            batches.append(events[prev:s])
            prev = s
    procs: dict[str, statev2.IncubationTtlProcessor] = {}
    handles: dict[str, _FakeTimerHandle] = {}
    emitted: dict[str, list] = {}
    for batch in batches:
        by_key: dict[str, list] = {}
        for u, s, t in batch:
            by_key.setdefault(u, []).append((s, t))
        for u, rows in by_key.items():
            if u not in procs:
                procs[u] = statev2.IncubationTtlProcessor()
                handles[u] = _FakeTimerHandle()
                procs[u].init(handles[u])
            mid = max(1, len(rows) // 2)
            chunks = [rows[:mid], rows[mid:]] if len(rows) > 1 else [rows]
            pdfs = (
                pd.DataFrame(
                    {
                        "pipeline_uuid": u,
                        "event_subtype": [s for s, _ in ch],
                        "event_time": [t for _, t in ch],
                    }
                )
                for ch in chunks
                if ch
            )
            for out in procs[u].handleInputRows((u,), pdfs, None):
                r = out.iloc[0]
                emitted.setdefault(u, []).append(
                    (r.window_start, int(r.n_events), r.subtypes, r.closed_by)
                )
    # end-of-stream: watermark passes every registered timer
    class _Expiry:
        def __init__(self, ms):
            self._ms = ms

        def getExpiryTimeInMs(self):
            return self._ms

    for u, h in handles.items():
        for exp in sorted(h.timers):
            for out in procs[u].handleExpiredTimer((u,), None, _Expiry(exp)):
                r = out.iloc[0]
                emitted.setdefault(u, []).append(
                    (r.window_start, int(r.n_events), r.subtypes, r.closed_by)
                )
    return emitted


def test_ttl_processor_windows_match_fold(spark):
    catalog.register(spark, SF_SMALL)
    ev = (
        spark.table("lifecycle_events")
        .select("pipeline_uuid", "event_subtype", "event_time")
        .orderBy("event_time", "pipeline_uuid", "event_subtype")
        .limit(150)
    )
    events = [(r.pipeline_uuid, r.event_subtype, r.event_time) for r in ev.collect()]
    expect = _fold_ttl_windows(events)
    assert expect and any(
        len(w) > 1 for w in expect.values()
    ), "fixture must produce rollovers (multiple TTL windows per key)"
    for splits in ([], [50, 100], [1, 2, 3, 75], list(range(1, len(events)))):
        got = _drive_ttl(events, splits)
        norm = {
            u: [(pd.Timestamp(t), n, s, c) for t, n, s, c in wins]
            for u, wins in got.items()
        }
        want = {
            u: [(pd.Timestamp(t), n, s, c) for t, n, s, c in wins]
            for u, wins in expect.items()
        }
        assert norm == want, f"splits={splits[:5]}..."


@pytest.mark.skipif(
    not _HAS_PROTOBUF,
    reason="google.protobuf unavailable: transformWithState "
    "state server cannot start in this container",
)
def test_incubation_ttl_e2e_timers_fire_on_watermark(spark):
    """End-to-end through the real state server: event-time timers must
    close every key's final window once a far-future sentinel advances the
    global watermark (the repo's sentinel-flush pattern). Source files are
    time-ordered so per-key arrival respects event time."""
    catalog.register(spark, SF_SMALL)
    ev = spark.table("lifecycle_events").select(
        "pipeline_uuid", "event_subtype", "event_time"
    )
    events = [(r.pipeline_uuid, r.event_subtype, r.event_time) for r in ev.collect()]
    expect = _fold_ttl_windows(events)
    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    with tempfile.TemporaryDirectory() as tmp:
        src = os.path.join(tmp, "events")
        os.makedirs(src)
        ordered = sorted(events, key=lambda e: (e[2], e[0], e[1]))
        third = max(1, len(ordered) // 3)
        chunks = [ordered[:third], ordered[third : 2 * third], ordered[2 * third :]]
        sentinel_t = max(e[2] for e in events) + pd.Timedelta(days=365)
        chunks.append([("__sentinel__", "flush", sentinel_t)])
        for i, ch in enumerate(chunks):
            pdf = spark.createDataFrame(
                pd.DataFrame(
                    {
                        "pipeline_uuid": [u for u, _, _ in ch],
                        "event_subtype": [s for _, s, _ in ch],
                        "event_time": [t for _, _, t in ch],
                    }
                ),
                schema=ev.schema,
            )
            pdf.coalesce(1).write.parquet(os.path.join(src, f"b{i}"))
        stream = (
            spark.readStream.schema(ev.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(os.path.join(src, "b*"))
        )
        q = (
            statev2.incubation_ttl_stream(stream)
            .writeStream.outputMode("append")
            .format("memory")
            .queryName("ttl_e2e")
            .option("checkpointLocation", os.path.join(tmp, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        try:
            assert q.awaitTermination(240)
        finally:
            q.stop()
        rows = spark.sql("SELECT * FROM ttl_e2e").collect()
    if prev is not None:
        spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)
    else:
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    got: dict[str, list] = {}
    for r in sorted(rows, key=lambda r: (r.pipeline_uuid, r.window_start)):
        if r.pipeline_uuid == "__sentinel__":
            continue
        got.setdefault(r.pipeline_uuid, []).append(
            (pd.Timestamp(r.window_start), r.n_events, r.subtypes, r.closed_by)
        )
    want = {
        u: sorted(
            [(pd.Timestamp(t), n, s, c) for t, n, s, c in wins],
            key=lambda w: (w[0],),
        )
        for u, wins in expect.items()
    }
    assert got == want and want


# ---------------------------------------------------------------------------
# SubtypeCountsProcessor: MapState (the third typed handle)


class _FakeMapState:
    def __init__(self):
        self._m: dict[tuple, tuple] = {}

    def exists(self) -> bool:
        return bool(self._m)

    def containsKey(self, key) -> bool:
        return tuple(key) in self._m

    def getValue(self, key):
        return self._m[tuple(key)]

    def updateValue(self, key, value) -> None:
        self._m[tuple(key)] = tuple(value)

    def iterator(self):
        return iter(list(self._m.items()))

    def removeKey(self, key) -> None:
        self._m.pop(tuple(key), None)

    def clear(self) -> None:
        self._m = {}


class _FakeMapHandle(_FakeTimerHandle):
    def __init__(self):
        super().__init__()
        self.maps: dict[str, _FakeMapState] = {}

    def getMapState(self, name, key_schema, value_schema, ttl_duration_ms=None):
        return self.maps.setdefault(name, _FakeMapState())


def _expected_dist(events):
    from collections import Counter

    per_key: dict[str, Counter] = {}
    for u, s, _t in events:
        per_key.setdefault(u, Counter())[s] += 1
    return {
        u: ",".join(f"{s}:{n}" for s, n in sorted(c.items()))
        for u, c in per_key.items()
    }


def test_subtype_counts_processor_matches_batch(spark):
    catalog.register(spark, SF_SMALL)
    ev = (
        spark.table("lifecycle_events")
        .select("pipeline_uuid", "event_subtype", "event_time")
        .orderBy("event_time", "pipeline_uuid", "event_subtype")
        .limit(150)
    )
    events = [(r.pipeline_uuid, r.event_subtype, r.event_time) for r in ev.collect()]
    expect = _expected_dist(events)
    for splits in ([], [50, 100], list(range(1, len(events)))):
        batches, prev = [], 0
        for s in [*splits, len(events)]:
            if s > prev:
                batches.append(events[prev:s])
                prev = s
        procs: dict[str, statev2.SubtypeCountsProcessor] = {}
        final: dict[str, str] = {}
        for batch in batches:
            by_key: dict[str, list] = {}
            for u, s, _t in batch:
                by_key.setdefault(u, []).append(s)
            for u, subs in by_key.items():
                if u not in procs:
                    procs[u] = statev2.SubtypeCountsProcessor()
                    procs[u].init(_FakeMapHandle())
                mid = max(1, len(subs) // 2)
                chunks = [subs[:mid], subs[mid:]] if len(subs) > 1 else [subs]
                pdfs = (
                    pd.DataFrame({"pipeline_uuid": u, "event_subtype": ch})
                    for ch in chunks
                    if ch
                )
                (out,) = list(procs[u].handleInputRows((u,), pdfs, None))
                final[u] = out.subtype_counts.iloc[0]
        assert final == expect, f"splits={splits[:5]}..."


@pytest.mark.skipif(
    not _HAS_PROTOBUF,
    reason="google.protobuf unavailable: transformWithState "
    "state server cannot start in this container",
)
def test_subtype_counts_e2e_matches_batch(spark):
    catalog.register(spark, SF_SMALL)
    ev = spark.table("lifecycle_events").select(
        "pipeline_uuid", "event_subtype", "event_time"
    )
    events = [(r.pipeline_uuid, r.event_subtype, r.event_time) for r in ev.collect()]
    expect = _expected_dist(events)
    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    with tempfile.TemporaryDirectory() as tmp:
        src = os.path.join(tmp, "events")
        ev.repartition(3).write.parquet(src)
        stream = (
            spark.readStream.schema(ev.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = (
            statev2.subtype_counts_stream(stream)
            .writeStream.outputMode("update")
            .format("memory")
            .queryName("counts_e2e")
            .option("checkpointLocation", os.path.join(tmp, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        try:
            assert q.awaitTermination(240)
        finally:
            q.stop()
        rows = spark.sql("SELECT * FROM counts_e2e").collect()
    if prev is not None:
        spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)
    else:
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    final: dict[str, str] = {}
    for r in rows:  # memory sink preserves batch order; last emission wins
        final[r.pipeline_uuid] = r.subtype_counts
    assert final == expect and expect


# ---------------------------------------------------------------------------
# WarmStartLedgerProcessor: handleInitialState (the fourth hook)


@pytest.mark.skipif(
    not _HAS_PROTOBUF,
    reason="google.protobuf unavailable: transformWithState "
    "state server cannot start in this container",
)
def test_warm_start_ledger_resumes_from_batch_snapshot(spark):
    """Backfill-takeover pattern: ledger state is bootstrapped from a
    batch snapshot of the FIRST HALF of history, the stream feeds only
    the second half, and the merged result must equal the batch
    recompute over ALL events."""
    catalog.register(spark, SF_SMALL)
    ev = spark.table("lifecycle_events").select(
        "pipeline_uuid", "event_subtype", "event_time"
    )
    mid = ev.selectExpr(
        "percentile_approx(CAST(event_time AS DOUBLE), 0.5) AS m"
    ).collect()[0].m
    first = ev.filter(F.col("event_time").cast("double") <= mid)
    second = ev.filter(F.col("event_time").cast("double") > mid)
    assert first.count() and second.count()

    def ledger(df):
        return {
            r.pipeline_uuid: (r.n, r.last_subtype)
            for r in df.groupBy("pipeline_uuid")
            .agg(
                F.count("*").cast("bigint").alias("n"),
                F.max(F.struct("event_time", "event_subtype"))[
                    "event_subtype"
                ].alias("last_subtype"),
            )
            .collect()
        }

    want = ledger(ev)
    snapshot = first.groupBy("pipeline_uuid").agg(
        F.count("*").cast("bigint").alias("n_events"),
        F.max(F.struct("event_time", "event_subtype"))["event_subtype"].alias(
            "last_subtype"
        ),
        F.max("event_time").alias("last_time"),
    )
    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    with tempfile.TemporaryDirectory() as tmp:
        src = os.path.join(tmp, "events")
        second.repartition(2).write.parquet(src)
        stream = (
            spark.readStream.schema(second.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = (
            statev2.pipeline_ledger_stream_warm(stream, snapshot)
            .writeStream.outputMode("update")
            .format("memory")
            .queryName("warm_e2e")
            .option("checkpointLocation", os.path.join(tmp, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        try:
            assert q.awaitTermination(240)
        finally:
            q.stop()
        rows = spark.sql("SELECT * FROM warm_e2e").collect()
    if prev is not None:
        spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)
    else:
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    # overlay: snapshot keys, replaced by the stream's last emission
    got = {u: (n, s) for u, (n, s) in ledger(first).items()}
    for r in rows:  # memory sink preserves batch order
        got[r.pipeline_uuid] = (r.n_events, r.last_subtype)
    assert got == want and want


# ---------------------------------------------------------------------------
# HoltTrendProcessor: the streaming twin of the batch Holt recurrence


def test_holt_stream_matches_batch(spark):
    """End-to-end through the real state server: replay the event log in
    time-ordered chunks, close the final day with the far-future sentinel
    (watermark-fired timer), and require the final (level, trend,
    forecast) per type to equal the BATCH operator's last-day row — the
    stream==batch equivalence contract every stateful operator here
    carries, now for a numeric recurrence."""
    from kalytical_spark.operators.timeseries import events_holt_trend

    catalog.register(spark, SF_SMALL)
    batch_last = {}
    for r in events_holt_trend(spark, SF_SMALL).collect():
        cur = batch_last.get(r.event_type)
        if cur is None or r.day > cur[0]:
            batch_last[r.event_type] = (
                r.day,
                r.level_milli,
                r.trend_milli,
                r.fc_next_milli,
            )

    ev = spark.table("events_ms").select("event_type", "ts")
    events = [(r.event_type, r.ts) for r in ev.collect()]
    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    with tempfile.TemporaryDirectory() as tmp:
        src = os.path.join(tmp, "events")
        os.makedirs(src)
        ordered = sorted(events, key=lambda e: (e[1], e[0]))
        third = max(1, len(ordered) // 3)
        chunks = [ordered[:third], ordered[third : 2 * third], ordered[2 * third :]]
        sentinel_t = max(t for _, t in events) + pd.Timedelta(days=365)
        chunks.append([("__sentinel__", sentinel_t)])
        for i, ch in enumerate(chunks):
            pdf = spark.createDataFrame(
                pd.DataFrame(
                    {
                        "event_type": [et for et, _ in ch],
                        "ts": [t for _, t in ch],
                    }
                ),
                schema=ev.schema,
            )
            pdf.coalesce(1).write.parquet(os.path.join(src, f"b{i}"))
        stream = (
            spark.readStream.schema(ev.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(os.path.join(src, "b*"))
        )
        q = (
            statev2.holt_trend_stream(stream)
            .writeStream.outputMode("append")
            .format("memory")
            .queryName("holt_e2e")
            .option("checkpointLocation", os.path.join(tmp, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        try:
            assert q.awaitTermination(180)
        finally:
            q.stop()
        rows = spark.sql("SELECT * FROM holt_e2e").collect()
    if prev is not None:
        spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)
    else:
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")

    got = {
        r.event_type: (r.last_day, r.level_milli, r.trend_milli, r.fc_next_milli)
        for r in rows
        if r.event_type != "__sentinel__"
    }
    assert set(got) == set(batch_last) and batch_last
    for et, (day, l, b, fc) in batch_last.items():
        gday, gl, gb, gfc = got[et]
        assert (gday, gl, gb, gfc) == (day, l, b, fc), et


# ---------------------------------------------------------------------------
# PsiDriftProcessor: streaming PSI vs a frozen reference mix


def test_psi_drift_stream_matches_batch(spark):
    """End-to-end through the real state server: per-day PSI emitted by
    the watermark-closed MapState monitor must equal an INDEPENDENT batch
    recomputation (its own arithmetic, not the processor's helper) of the
    same Laplace-smoothed micro-nat PSI against the same frozen
    reference."""
    import math

    catalog.register(spark, SF_SMALL)
    ev = spark.table("events_ms").select("event_type", "ts")
    events = [(r.event_type, r.ts) for r in ev.collect()]

    # frozen reference = the full corpus mix (fit "from history")
    ref: dict = {}
    for et, _t in events:
        ref[et] = ref.get(et, 0) + 1

    # independent batch PSI per day
    by_day: dict = {}
    for et, ts in events:
        d = pd.Timestamp(ts).normalize()
        by_day.setdefault(d, {})
        by_day[d][et] = by_day[d].get(et, 0) + 1
    T_ = len(ref)
    N = sum(ref.values())
    expect = {}
    def _rha(x: float) -> int:
        # half away from zero — the SQL ROUND of operators/drift.py
        return int(math.floor(x + 0.5)) if x >= 0 else int(math.ceil(x - 0.5))

    for d, counts in by_day.items():
        nd = sum(counts.values())
        psi = 0
        for ty in ref:
            c, ct = counts.get(ty, 0), ref[ty]
            lr = _rha(math.log(((c + 1) * (N + T_)) / ((ct + 1) * (nd + T_))) * 1e6)
            num = (c + 1) * (N + T_) - (ct + 1) * (nd + T_)
            psi += _rha(lr * (num / ((nd + T_) * (N + T_))))
        expect[d] = (nd, psi)

    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    with tempfile.TemporaryDirectory() as tmp:
        src = os.path.join(tmp, "events")
        os.makedirs(src)
        ordered = sorted(events, key=lambda e: (e[1], e[0]))
        third = max(1, len(ordered) // 3)
        chunks = [ordered[:third], ordered[third : 2 * third], ordered[2 * third :]]
        sentinel_t = max(t for _, t in events) + pd.Timedelta(days=365)
        chunks.append([("__sentinel__", sentinel_t)])
        for i, ch in enumerate(chunks):
            pdf = spark.createDataFrame(
                pd.DataFrame(
                    {"event_type": [et for et, _ in ch], "ts": [t for _, t in ch]}
                ),
                schema=ev.schema,
            )
            pdf.coalesce(1).write.parquet(os.path.join(src, f"b{i}"))
        stream = (
            spark.readStream.schema(ev.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(os.path.join(src, "b*"))
        )
        q = (
            statev2.psi_drift_stream(stream, ref)
            .writeStream.outputMode("append")
            .format("memory")
            .queryName("psi_e2e")
            .option("checkpointLocation", os.path.join(tmp, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        try:
            assert q.awaitTermination(180)
        finally:
            q.stop()
        rows = spark.sql("SELECT * FROM psi_e2e").collect()
    if prev is not None:
        spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)
    else:
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")

    got = {
        pd.Timestamp(r.day): (r.n_day, r.psi_micro, r.n_unknown, r.drift_flag)
        for r in rows
    }
    # every real day closed by the sentinel watermark must match the batch
    assert set(got) == set(expect) and expect
    for d, (nd, psi) in expect.items():
        gnd, gpsi, gunk, gflag = got[d]
        assert (gnd, gpsi) == (nd, psi), d
        assert gunk == 0  # reference covers the corpus types
        assert gflag == (psi > statev2.PSI_FLAG_MICRO)


class _FakePsiHandle(_FakeHandle):
    def __init__(self):
        super().__init__()
        self.maps: dict[str, _FakeMapState] = {}
        self.timers: set[int] = set()

    def getMapState(self, name, key_schema, value_schema, ttl_duration_ms=None):
        return self.maps.setdefault(name, _FakeMapState())

    def registerTimer(self, expiry_ms: int) -> None:
        self.timers.add(expiry_ms)

    def deleteTimer(self, expiry_ms: int) -> None:
        self.timers.discard(expiry_ms)


def test_psi_processor_split_invariant():
    """Drive PsiDriftProcessor through the fake handle across DIFFERENT
    micro-batch split points: the day-close emission must be identical
    and equal the helper applied to the total counts (state accumulation
    is order- and split-free)."""
    ref = {"click": 60, "view": 30, "purchase": 10}
    day = pd.Timestamp("2026-01-05")
    rows = (
        [("click", day)] * 7
        + [("view", day)] * 5
        + [("purchase", day)] * 2
        + [("mystery", day)] * 3
    )

    def run(splits):
        proc = statev2.PsiDriftProcessor(ref)
        proc.init(_FakePsiHandle())
        prev = 0
        for s in [*splits, len(rows)]:
            if s <= prev:
                continue
            ch = rows[prev:s]
            prev = s
            pdf = pd.DataFrame({"event_type": [t for t, _ in ch]})
            list(proc.handleInputRows((day,), iter([pdf]), None))
        out = list(proc.handleExpiredTimer((day,), None, None))
        assert len(out) == 1
        r = out[0].iloc[0]
        return (
            int(r["n_day"]),
            int(r["n_unknown"]),
            int(r["psi_micro"]),
            bool(r["drift_flag"]),
        )

    a = run([4, 9])
    b = run([1, 2, 3, 10])
    c = run([])
    assert a == b == c
    n_d, psi = statev2.psi_micro_from_counts(
        {"click": 7, "view": 5, "purchase": 2}, ref
    )
    assert a == (n_d, 3, psi, psi > statev2.PSI_FLAG_MICRO)
    # a second close after the state cleared emits nothing
    proc = statev2.PsiDriftProcessor(ref)
    proc.init(_FakePsiHandle())
    pdf = pd.DataFrame({"event_type": ["click"]})
    list(proc.handleInputRows((day,), iter([pdf]), None))
    assert len(list(proc.handleExpiredTimer((day,), None, None))) == 1
    assert list(proc.handleExpiredTimer((day,), None, None)) == []


# ---------------------------------------------------------------------------
# SprtMonitorProcessor: the sequential experimentation monitor


class _FakeExpiredTimer:
    def __init__(self, ms: int):
        self._ms = ms

    def getExpiryTimeInMs(self) -> int:
        return self._ms


def _sprt_days(day0: pd.Timestamp, specs):
    """specs: list of (n, s) per consecutive calendar day -> event rows
    (day, s) with n total rows of which s are successes."""
    rows = []
    for i, (n, s) in enumerate(specs):
        d = day0 + pd.Timedelta(days=i)
        rows += [(d, 1)] * s + [(d, 0)] * (n - s)
    return rows


def test_sprt_processor_split_invariant():
    """The walk after all days close must be identical across micro-batch
    split points AND across timer-callback granularity (one callback per
    day vs one late callback covering several due days), and must equal a
    direct integer fold of the daily counts."""
    from kalytical_spark.operators.stats import (
        SPRT_BOUND_MICRO,
        SPRT_LL_FAILURE_MICRO,
        SPRT_LL_SUCCESS_MICRO,
    )

    day0 = pd.Timestamp("2026-02-01")
    # day 3's success run crosses +ln(19); day 1 dips the walk negative
    specs = [(40, 2), (30, 8), (30, 25), (20, 6)]
    rows = _sprt_days(day0, specs)
    day_ms = [
        int((day0 + pd.Timedelta(days=i)).value // 1_000_000)
        for i in range(len(specs))
    ]

    def run(splits, timer_points):
        proc = statev2.SprtMonitorProcessor(
            SPRT_LL_SUCCESS_MICRO, SPRT_LL_FAILURE_MICRO, SPRT_BOUND_MICRO
        )
        proc.init(_FakePsiHandle())
        prev = 0
        for s in [*splits, len(rows)]:
            if s <= prev:
                continue
            ch = rows[prev:s]
            prev = s
            pdf = pd.DataFrame(
                {"day": [d for d, _ in ch], "s": [v for _, v in ch]}
            )
            list(proc.handleInputRows((3,), iter([pdf]), None))
        outs = []
        for tp in timer_points:
            outs += list(
                proc.handleExpiredTimer((3,), None, _FakeExpiredTimer(tp))
            )
        assert outs
        r = outs[-1].iloc[0]
        return (
            int(r["arm"]),
            int(r["n_days"]),
            int(r["llr_micro"]),
            int(r["max_llr_micro"]),
            int(r["min_llr_micro"]),
            None if pd.isna(r["h1_cross_day"]) else r["h1_cross_day"],
            None if pd.isna(r["h0_cross_day"]) else r["h0_cross_day"],
            str(r["decision"]),
        )

    per_day_timers = [d + statev2.DAY_MS for d in day_ms]
    a = run([17, 60], per_day_timers)
    b = run([1, 2, 3, 50, 90], per_day_timers)
    c = run([], [day_ms[-1] + statev2.DAY_MS])  # one catch-all callback
    assert a == b == c

    # direct fold
    llr, mx, mn, h1 = 0, None, None, None
    for i, (n, s) in enumerate(specs):
        llr += s * SPRT_LL_SUCCESS_MICRO + (n - s) * SPRT_LL_FAILURE_MICRO
        mx = llr if mx is None else max(mx, llr)
        mn = llr if mn is None else min(mn, llr)
        if llr >= SPRT_BOUND_MICRO and h1 is None:
            h1 = pd.Timestamp(day_ms[i], unit="ms")
    assert a == (3, len(specs), llr, mx, mn, h1, None,
                 "accept_h1" if h1 is not None else "continue")
    # the fixture is built to cross: a continue-only run proves nothing
    assert a[7] == "accept_h1" and a[4] < 0


@pytest.mark.skipif(not _HAS_PROTOBUF, reason="no protobuf runtime")
def test_sprt_stream_matches_batch_operator(spark):
    """End-to-end through the real state server: the final per-arm SPRT
    row emitted by the stream must equal the BATCH OPERATOR
    events_sprt_monitor on the same corpus (same literals, same arm hash,
    exact integer walk — equality is exact, not approximate)."""
    from kalytical_spark.operators import stats

    catalog.register(spark, SF_SMALL)
    batch = {
        int(r.arm): r for r in stats.events_sprt_monitor(spark, SF_SMALL).collect()
    }
    ev = spark.table("events_ms").select("event_id", "event_type", "ts")
    events = [(int(r.event_id), r.event_type, r.ts) for r in ev.collect()]

    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    with tempfile.TemporaryDirectory() as tmp:
        src = os.path.join(tmp, "events")
        os.makedirs(src)
        ordered = sorted(events, key=lambda e: (e[2], e[0]))
        third = max(1, len(ordered) // 3)
        chunks = [ordered[:third], ordered[third : 2 * third], ordered[2 * third :]]
        sentinel_t = max(t for _, _, t in events) + pd.Timedelta(days=365)
        chunks.append([(10**9, "__sentinel__", sentinel_t)])
        for i, ch in enumerate(chunks):
            pdf = spark.createDataFrame(
                pd.DataFrame(
                    {
                        "event_id": [e for e, _, _ in ch],
                        "event_type": [et for _, et, _ in ch],
                        "ts": [t for _, _, t in ch],
                    }
                ),
                schema=ev.schema,
            )
            pdf.coalesce(1).write.parquet(os.path.join(src, f"b{i}"))
        stream = (
            spark.readStream.schema(ev.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(os.path.join(src, "b*"))
        )
        q = (
            statev2.sprt_monitor_stream(stream)
            .writeStream.outputMode("append")
            .format("memory")
            .queryName("sprt_e2e")
            .option("checkpointLocation", os.path.join(tmp, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        try:
            assert q.awaitTermination(180)
        finally:
            q.stop()
        rows = spark.sql("SELECT * FROM sprt_e2e").collect()
    if prev is not None:
        spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)
    else:
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")

    final = {}
    for r in rows:
        if int(r.arm) not in final or r.n_days > final[int(r.arm)].n_days:
            final[int(r.arm)] = r
    # the sentinel's own day never closes, so exactly the real arms emit
    assert set(final) == set(batch) and batch
    for arm, b in batch.items():
        g = final[arm]
        assert int(g.n_days) == int(b.n_days), arm
        assert int(g.max_llr_micro) == int(b.max_llr_micro), arm
        assert int(g.min_llr_micro) == int(b.min_llr_micro), arm
        g1 = None if g.h1_cross_day is None else g.h1_cross_day.date()
        g0 = None if g.h0_cross_day is None else g.h0_cross_day.date()
        assert g1 == b.h1_cross_day and g0 == b.h0_cross_day, arm
        assert g.decision == b.decision, arm


# ---------------------------------------------------------------------------
# CusumMonitorProcessor: the frozen-reference online CUSUM twin


def test_cusum_processor_split_invariant():
    """Final walk identical across micro-batch splits and across timer
    granularity, and equal to a direct clamped fold."""
    ref_total, ref_days = 70, 7  # mean 10/day
    slack = (50 * ref_total) // 1000
    h = (500 * ref_total) // 1000
    day0 = pd.Timestamp("2026-03-01")
    counts = [10, 14, 13, 2, 2, 11]  # up-run then a crash then recovery
    rows = []
    for i, n in enumerate(counts):
        rows += [(day0 + pd.Timedelta(days=i),)] * n
    day_ms = [
        int((day0 + pd.Timedelta(days=i)).value // 1_000_000)
        for i in range(len(counts))
    ]

    def run(splits, timer_points):
        proc = statev2.CusumMonitorProcessor(
            {"click": (ref_total, ref_days)}, {"click": 0}, 50, 500
        )
        proc.init(_FakePsiHandle())
        prev = 0
        for s in [*splits, len(rows)]:
            if s <= prev:
                continue
            ch = rows[prev:s]
            prev = s
            pdf = pd.DataFrame({"day": [d for d, in ch]})
            list(proc.handleInputRows(("click",), iter([pdf]), None))
        outs = []
        for tp in timer_points:
            for df in proc.handleExpiredTimer(("click",), None, _FakeExpiredTimer(tp)):
                outs.append(df)
        got = pd.concat(outs, ignore_index=True)
        return [
            (r["day"], int(r["daily_n"]), int(r["s_plus"]), int(r["s_minus"]),
             bool(r["alarm"]))
            for _, r in got.iterrows()
        ]

    per_day = [d + statev2.DAY_MS for d in day_ms]
    a = run([7, 30], per_day)
    b = run([1, 2, 3, 44], per_day)
    c = run([], [day_ms[-1] + statev2.DAY_MS])
    assert a == b == c and len(a) == len(counts)

    sp = sm = 0
    for i, n in enumerate(counts):
        dev = ref_days * n - ref_total
        sp = max(0, sp + dev - slack)
        sm = max(0, sm - dev - slack)
        assert a[i][1:] == (n, sp, sm, max(sp, sm) > h), i
    # the fixture must exercise clamps and both alarm outcomes
    assert any(x[4] for x in a) and not all(x[4] for x in a)


@pytest.mark.skipif(not _HAS_PROTOBUF, reason="no protobuf runtime")
def test_cusum_stream_matches_batch_operator(spark):
    """E2e through the real state server: per-(type, day) monitor rows
    emitted by the stream equal the batch operator exactly — same frozen
    reference, same integer recurrence."""
    from kalytical_spark.operators import timeseries

    catalog.register(spark, SF_SMALL)
    batch = {
        (r.event_type, pd.Timestamp(r.day)): (r.daily_n, r.s_plus, r.s_minus, r.alarm)
        for r in timeseries.events_cusum_monitor(spark, SF_SMALL).collect()
    }
    assert batch
    # fit the same reference the batch operator derives (first week)
    daily = (
        spark.table("events_ms")
        .select("event_type", F.date_trunc("day", "ts").alias("day"))
        .groupBy("event_type", "day")
        .count()
    )
    refs: dict = {}
    starts: dict = {}
    for r in daily.collect():
        refs.setdefault(r.event_type, []).append((pd.Timestamp(r.day), r["count"]))
    ref_map = {}
    for et, pairs in refs.items():
        pairs.sort()
        d0 = pairs[0][0]
        cutoff = d0 + pd.Timedelta(days=timeseries.CUSUM_REF_DAYS)
        inside = [(d, c) for d, c in pairs if d < cutoff]
        ref_map[et] = (sum(c for _, c in inside), len(inside))
        starts[et] = int(cutoff.value // 1_000_000)

    ev = spark.table("events_ms").select("event_id", "event_type", "ts")
    events = [(int(r.event_id), r.event_type, r.ts) for r in ev.collect()]

    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    with tempfile.TemporaryDirectory() as tmp:
        src = os.path.join(tmp, "events")
        os.makedirs(src)
        ordered = sorted(events, key=lambda e: (e[2], e[0]))
        third = max(1, len(ordered) // 3)
        chunks = [ordered[:third], ordered[third : 2 * third], ordered[2 * third :]]
        sentinel_t = max(t for _, _, t in events) + pd.Timedelta(days=365)
        chunks.append([(10**9, "__sentinel__", sentinel_t)])
        for i, ch in enumerate(chunks):
            pdf = spark.createDataFrame(
                pd.DataFrame(
                    {
                        "event_id": [e for e, _, _ in ch],
                        "event_type": [et for _, et, _ in ch],
                        "ts": [t for _, _, t in ch],
                    }
                ),
                schema=ev.schema,
            )
            pdf.coalesce(1).write.parquet(os.path.join(src, f"b{i}"))
        stream = (
            spark.readStream.schema(ev.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(os.path.join(src, "b*"))
        )
        q = (
            statev2.cusum_monitor_stream(stream, ref_map, starts)
            .writeStream.outputMode("append")
            .format("memory")
            .queryName("cusum_e2e")
            .option("checkpointLocation", os.path.join(tmp, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        try:
            assert q.awaitTermination(180)
        finally:
            q.stop()
        rows = spark.sql("SELECT * FROM cusum_e2e").collect()
    if prev is not None:
        spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)
    else:
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")

    got = {
        (r.event_type, pd.Timestamp(r.day)): (r.daily_n, r.s_plus, r.s_minus, r.alarm)
        for r in rows
    }
    assert got == batch


# ---------------------------------------------------------------------------
# ConformalMonitorProcessor: frozen split-conformal coverage twin


def test_conformal_processor_split_invariant():
    """Final coverage identical across splits/timer granularity and equal
    to a direct fold of the frozen residual test over the dense grid."""
    # model: y = 10 + x (a_num/den encode slope via k*sxy-sx*sy etc.);
    # craft simple integers: k=3 calib days x=0,2,4 with y=10,12,14
    xs, ys = [0, 2, 4], [10, 12, 14]
    k = len(xs); sx = sum(xs); sy = sum(ys)
    sxx = sum(x * x for x in xs); sxy = sum(x * y for x, y in zip(xs, ys))
    a_num = k * sxy - sx * sy; den = k * sxx - sx * sx
    # calibration residuals are 0, so q_r = 0: covered iff exactly on line
    d0 = pd.Timestamp("2026-04-01")
    d0_ms = int(d0.value // 1_000_000)
    params = {"click": (d0_ms, k, sx, sy, a_num, den, 0)}
    # real days x=1 (11 -> on line), x=3 (5 -> off line), x=7 (17 -> on;
    # x=5 is a GAP day zero-filled -> off line)
    day_counts = {1: 11, 3: 5, 7: 17}
    rows = []
    for x, n in day_counts.items():
        rows += [(d0 + pd.Timedelta(days=x),)] * n

    def run(splits, timer_points):
        proc = statev2.ConformalMonitorProcessor(params)
        proc.init(_FakePsiHandle())
        prev = 0
        for s in [*splits, len(rows)]:
            if s <= prev:
                continue
            ch = rows[prev:s]
            prev = s
            list(proc.handleInputRows(("click",), iter([pd.DataFrame({"day": [d for d, in ch]})]), None))
        outs = []
        for tp in timer_points:
            for df in proc.handleExpiredTimer(("click",), None, _FakeExpiredTimer(tp)):
                outs.append(df)
        got = pd.concat(outs, ignore_index=True)
        return [
            (int(r["x"]), int(r["c"]), r["covered"], int(r["n_test"]),
             int(r["n_covered"]))
            for _, r in got.iterrows()
        ]

    days_ms = [d0_ms + x * statev2.DAY_MS for x in day_counts]
    per_day = [d + statev2.DAY_MS for d in days_ms]
    a = run([5, 20], per_day)
    b = run([1, 2, 3], per_day)
    c = run([], [days_ms[-1] + statev2.DAY_MS])
    assert a == b == c
    # x=1 covered; x=3 uncovered; gap x=5 (zero) uncovered; x=7 covered
    assert a == [
        (1, 11, True, 1, 1),
        (3, 5, False, 2, 1),
        (7, 17, True, 4, 2),
    ]


@pytest.mark.skipif(not _HAS_PROTOBUF, reason="no protobuf runtime")
def test_conformal_stream_matches_batch_operator(spark):
    """E2e: the stream's final per-type coverage equals
    events_conformal_interval exactly (same frozen model, same integer
    residual test)."""
    from kalytical_spark.operators import drift

    catalog.register(spark, SF_SMALL)
    batch = {
        r.event_type: (r.n_test, r.n_covered, r.coverage_milli)
        for r in drift.events_conformal_interval(spark, SF_SMALL).collect()
    }
    assert batch
    params = {
        r.event_type: (
            int(pd.Timestamp(r.d0_day).value // 1_000_000),
            r.k, r.sx, r.sy, r.a_num, r.den, r.q_r,
        )
        for r in drift.conformal_fit_params(spark, SF_SMALL).collect()
    }
    # the equality precondition: every type's series spans the global
    # grid (otherwise the batch's trailing zero-days have no stream twin)
    spans = (
        spark.table("events_ms")
        .groupBy("event_type")
        .agg(
            F.date_trunc("day", F.min("ts")).alias("dmin"),
            F.date_trunc("day", F.max("ts")).alias("dmax"),
        )
        .collect()
    )
    assert len({(r.dmin, r.dmax) for r in spans}) == 1

    ev = spark.table("events_ms").select("event_id", "event_type", "ts")
    events = [(int(r.event_id), r.event_type, r.ts) for r in ev.collect()]

    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    with tempfile.TemporaryDirectory() as tmp:
        src = os.path.join(tmp, "events")
        os.makedirs(src)
        ordered = sorted(events, key=lambda e: (e[2], e[0]))
        third = max(1, len(ordered) // 3)
        chunks = [ordered[:third], ordered[third : 2 * third], ordered[2 * third :]]
        sentinel_t = max(t for _, _, t in events) + pd.Timedelta(days=365)
        chunks.append([(10**9, "__sentinel__", sentinel_t)])
        for i, ch in enumerate(chunks):
            pdf = spark.createDataFrame(
                pd.DataFrame(
                    {
                        "event_id": [e for e, _, _ in ch],
                        "event_type": [et for _, et, _ in ch],
                        "ts": [t for _, _, t in ch],
                    }
                ),
                schema=ev.schema,
            )
            pdf.coalesce(1).write.parquet(os.path.join(src, f"b{i}"))
        stream = (
            spark.readStream.schema(ev.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(os.path.join(src, "b*"))
        )
        q = (
            statev2.conformal_monitor_stream(stream, params)
            .writeStream.outputMode("append")
            .format("memory")
            .queryName("conf_e2e")
            .option("checkpointLocation", os.path.join(tmp, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        try:
            assert q.awaitTermination(180)
        finally:
            q.stop()
        rows = spark.sql("SELECT * FROM conf_e2e").collect()
    if prev is not None:
        spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)
    else:
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")

    final: dict = {}
    for r in rows:
        if r.event_type not in final or r.x > final[r.event_type].x:
            final[r.event_type] = r
    assert set(final) == set(batch)
    for et, b in batch.items():
        g = final[et]
        assert (g.n_test, g.n_covered, g.coverage_milli) == b, et
