"""Spark 4 `transformWithStateInPandas`: the modern arbitrary-state API
(StatefulProcessor + typed state handles), exercised on a per-pipeline
lifecycle ledger — the successor to the `applyInPandasWithState` control
loop in incubation.py, kept side by side so both stateful surfaces are
covered (Spark 4.0 introduced this API; the older one remains for
migration parity).

Semantics: per pipeline_uuid, maintain a ValueState counter of deliveries
and the latest event subtype, emitting one updated row per key per
micro-batch. Equivalence with the batch groupBy recompute is pinned in
tests/test_statev2.py — mirroring the stream==batch bar every other
streaming operator here meets.

Scale: state is one (count, subtype) record per key in the state store —
RocksDB-backed on a cluster (`spark.sql.streaming.stateStore.providerClass`
must be RocksDBStateStoreProvider — the API refuses the HDFS-backed
default); emission is one row per touched key per batch, so output volume
tracks change volume, not corpus size.

ENVIRONMENT NOTE: the transformWithState state-server protocol speaks
protobuf between the JVM and the Python worker. This container ships no
pip ``protobuf``, so tests/conftest.py bridges in the container's bundled
pure-python runtime via ``tools/protobuf_shim`` (sys.path + PYTHONPATH for
the workers, with the gencode/runtime minor-version gate relaxed — see the
shim's docstrings). With the shim the END-TO-END equivalence test runs and
passes here; the PROCESSOR TRANSITION LOGIC is additionally proven without
any protobuf — tests/test_statev2.py drives PipelineLedgerProcessor
through a faithful fake of the handle/ValueState contract across arbitrary
micro-batch split points and compares against the batch recompute (the
same shared-transitions trick incubation.py uses).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle
from pyspark.sql import types as T

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("pipeline_uuid", T.StringType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("last_subtype", T.StringType()),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("last_subtype", T.StringType()),
        T.StructField("last_time", T.TimestampType()),
    ]
)


class PipelineLedgerProcessor(StatefulProcessor):
    """Counts deliveries per pipeline and tracks the latest subtype by
    event_time (ties broken by subtype string — a total order, so the
    result is independent of batch split points)."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._state = handle.getValueState("ledger", _STATE_SCHEMA)

    def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
        n = 0
        last_t = None
        last_s = None
        for pdf in rows:
            n += len(pdf)
            # latest event_time wins; equal times fall back to subtype order
            idx = pdf.sort_values(
                ["event_time", "event_subtype"]
            ).iloc[-1]
            t, s = idx["event_time"], idx["event_subtype"]
            if last_t is None or (t, s) > (last_t, last_s):
                last_t, last_s = t, s
        if self._state.exists():
            prev_n, prev_s, prev_t = self._state.get()
            n += prev_n
            if prev_t is not None and (last_t is None or (prev_t, prev_s) > (last_t, last_s)):
                last_t, last_s = prev_t, prev_s
        self._state.update((n, last_s, last_t))
        yield pd.DataFrame(
            [{"pipeline_uuid": key[0], "n_events": n, "last_subtype": last_s}]
        )

    def close(self) -> None:
        pass


def pipeline_ledger_stream(events_stream: DataFrame) -> DataFrame:
    """Wire the processor: emitted rows carry each touched pipeline's
    running delivery count and latest subtype after the micro-batch."""
    return (
        events_stream.select("pipeline_uuid", "event_subtype", "event_time")
        .groupBy("pipeline_uuid")
        .transformWithStateInPandas(
            statefulProcessor=PipelineLedgerProcessor(),
            outputStructType=OUTPUT_SCHEMA,
            outputMode="Update",
            timeMode="None",
        )
    )


INCUBATION_TTL_MS = 3 * 24 * 3600 * 1000  # 3-day event-time window per key

TTL_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("pipeline_uuid", T.StringType()),
        T.StructField("window_start", T.TimestampType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("subtypes", T.StringType()),
        T.StructField("closed_by", T.StringType()),
    ]
)

_OPEN_SCHEMA = T.StructType(
    [
        T.StructField("t0", T.TimestampType()),
        T.StructField("n", T.LongType()),
    ]
)

_SUBTYPE_SCHEMA = T.StructType([T.StructField("s", T.StringType())])


class IncubationTtlProcessor(StatefulProcessor):
    """Event-time TTL incubation on the MODERN state API — the ST5
    age-out semantics (incubation.py expresses them on
    applyInPandasWithState) re-expressed with transformWithState's typed
    handles and REAL EVENT-TIME TIMERS: a key's first delivery opens a
    window [t0, t0 + TTL); later deliveries inside the window append to a
    ListState of subtypes; a delivery at or past the boundary closes the
    window inline (emit `closed_by='rollover'`, deleteTimer, re-open);
    the final window of every key is closed by the WATERMARK crossing its
    registered timer (emit `closed_by='timer'` in handleExpiredTimer) —
    the part the old API could only approximate with per-key timeouts.

    Split-point invariance holds when per-key arrival respects event-time
    order across micro-batches (the test feeds time-ordered files);
    within a batch the processor sorts its rows, so intra-batch order is
    free. Emissions are one row per CLOSED window — output tracks window
    churn, not corpus size; state per key is one (t0, n) record + the
    open window's subtype list, cleared on every close."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._handle = handle
        self._open = handle.getValueState("open", _OPEN_SCHEMA)
        self._subtypes = handle.getListState("subtypes", _SUBTYPE_SCHEMA)

    @staticmethod
    def _ms(ts) -> int:
        return int(pd.Timestamp(ts).value // 1_000_000)

    def _close_row(self, key, closed_by: str):
        t0, n = self._open.get()
        subs = sorted({row[0] for row in self._subtypes.get()})
        self._open.clear()
        self._subtypes.clear()
        return pd.DataFrame(
            [
                {
                    "pipeline_uuid": key[0],
                    "window_start": t0,
                    "n_events": n,
                    "subtypes": ",".join(subs),
                    "closed_by": closed_by,
                }
            ]
        )

    def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
        pdf = pd.concat(list(rows), ignore_index=True)
        pdf = pdf.sort_values(["event_time", "event_subtype"])
        for _, r in pdf.iterrows():
            t, s = r["event_time"], r["event_subtype"]
            if self._open.exists():
                t0, n = self._open.get()
                expiry = self._ms(t0) + INCUBATION_TTL_MS
                if self._ms(t) >= expiry:
                    self._handle.deleteTimer(expiry)
                    yield self._close_row(key, "rollover")
                else:
                    self._open.update((t0, n + 1))
                    self._subtypes.appendValue((s,))
                    continue
            self._open.update((t, 1))
            self._subtypes.appendValue((s,))
            self._handle.registerTimer(self._ms(t) + INCUBATION_TTL_MS)

    def handleExpiredTimer(self, key, timerValues, expiredTimerInfo) -> Iterator[pd.DataFrame]:
        # a rollover may have already closed-and-reopened before the old
        # timer's deleteTimer landed; only close if the OPEN window is the
        # one this timer guards
        if self._open.exists():
            t0, _n = self._open.get()
            if self._ms(t0) + INCUBATION_TTL_MS == expiredTimerInfo.getExpiryTimeInMs():
                yield self._close_row(key, "timer")

    def close(self) -> None:
        pass


def incubation_ttl_stream(events_stream: DataFrame, watermark: str = "0 seconds") -> DataFrame:
    """Wire the TTL processor in event-time mode: the watermark drives
    timer expiry, so idle keys age out without new data of their own."""
    return (
        events_stream.select("pipeline_uuid", "event_subtype", "event_time")
        .withWatermark("event_time", watermark)
        .groupBy("pipeline_uuid")
        .transformWithStateInPandas(
            statefulProcessor=IncubationTtlProcessor(),
            outputStructType=TTL_OUTPUT_SCHEMA,
            outputMode="Append",
            timeMode="EventTime",
        )
    )


COUNTS_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("pipeline_uuid", T.StringType()),
        T.StructField("subtype_counts", T.StringType()),
    ]
)

_SUBTYPE_KEY_SCHEMA = T.StructType([T.StructField("s", T.StringType())])
_COUNT_SCHEMA = T.StructType([T.StructField("n", T.LongType())])


class SubtypeCountsProcessor(StatefulProcessor):
    """Per-pipeline subtype histogram on MapState — the third typed
    handle (ValueState: PipelineLedgerProcessor; ListState:
    IncubationTtlProcessor). Each micro-batch emits the key's FULL
    distribution as one deterministic row (subtypes sorted,
    `a:3,b:1` encoding), so the last emission per key equals the batch
    groupBy recompute regardless of split points.

    Scale: state is one map entry per (key, subtype) — bounded by the
    subtype vocabulary, not event volume; per-batch work is one
    pandas value_counts over the key's arrived rows plus point updates
    into the store."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._counts = handle.getMapState(
            "subtype_counts", _SUBTYPE_KEY_SCHEMA, _COUNT_SCHEMA
        )

    def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
        arrived: dict[str, int] = {}
        for pdf in rows:
            for s, c in pdf["event_subtype"].value_counts().items():
                arrived[s] = arrived.get(s, 0) + int(c)
        for s, c in arrived.items():
            prev = (
                self._counts.getValue((s,))[0]
                if self._counts.containsKey((s,))
                else 0
            )
            self._counts.updateValue((s,), (prev + c,))
        dist = sorted((k[0], v[0]) for k, v in self._counts.iterator())
        yield pd.DataFrame(
            [
                {
                    "pipeline_uuid": key[0],
                    "subtype_counts": ",".join(f"{s}:{n}" for s, n in dist),
                }
            ]
        )

    def close(self) -> None:
        pass


def subtype_counts_stream(events_stream: DataFrame) -> DataFrame:
    return (
        events_stream.select("pipeline_uuid", "event_subtype")
        .groupBy("pipeline_uuid")
        .transformWithStateInPandas(
            statefulProcessor=SubtypeCountsProcessor(),
            outputStructType=COUNTS_OUTPUT_SCHEMA,
            outputMode="Update",
            timeMode="None",
        )
    )


class WarmStartLedgerProcessor(PipelineLedgerProcessor):
    """PipelineLedgerProcessor + ``handleInitialState``: the ledger can be
    BOOTSTRAPPED from a batch snapshot (n, last_subtype, last_time per
    key) before the stream starts — the standard warm-start pattern when
    a streaming job takes over from a backfill, covering the fourth and
    final StatefulProcessor hook. Initial state is applied once, in the
    first micro-batch, before that batch's rows."""

    def handleInitialState(self, key, initialState, timerValues) -> None:
        # transformWithStateInPandas hands one pandas DataFrame per key
        row = initialState.iloc[0] if hasattr(initialState, "iloc") else initialState
        self._state.update(
            (int(row["n_events"]), row["last_subtype"], row["last_time"])
        )


def pipeline_ledger_stream_warm(
    events_stream: DataFrame, initial: DataFrame
) -> DataFrame:
    """Wire the warm-started ledger: ``initial`` is a batch frame of
    (pipeline_uuid, n_events, last_subtype, last_time) rows — e.g. the
    batch groupBy over the history already ingested by a backfill."""
    return (
        events_stream.select("pipeline_uuid", "event_subtype", "event_time")
        .groupBy("pipeline_uuid")
        .transformWithStateInPandas(
            statefulProcessor=WarmStartLedgerProcessor(),
            outputStructType=OUTPUT_SCHEMA,
            outputMode="Update",
            timeMode="None",
            initialState=initial.groupBy("pipeline_uuid"),
        )
    )


# ---------------------------------------------------------------------------
# Streaming Holt forecaster: the exact integer level+trend recurrence of
# operators/timeseries.events_holt_trend, maintained incrementally in keyed
# state as days COMPLETE (event-time timers close the last day).

DAY_MS = 86_400_000

HOLT_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("event_type", T.StringType()),
        T.StructField("last_day", T.TimestampType()),
        T.StructField("level_milli", T.LongType()),
        T.StructField("trend_milli", T.LongType()),
        T.StructField("fc_next_milli", T.LongType()),
    ]
)

_HOLT_SCHEMA = T.StructType(
    [
        T.StructField("fday", T.LongType()),  # last FOLDED day (epoch ms)
        T.StructField("l", T.LongType()),
        T.StructField("b", T.LongType()),
        T.StructField("has", T.LongType()),  # 0 until the first fold
    ]
)

_PEND_SCHEMA = T.StructType(
    [
        T.StructField("pday", T.LongType()),  # accumulating day (epoch ms)
        T.StructField("c", T.LongType()),
    ]
)


def _tdiv(a: int, d: int) -> int:
    """Truncated integer division (toward zero) — the convention Spark
    `div` and DuckDB `//` share; Python `//` floors, so spell it out."""
    q = abs(a) // d
    return q if a >= 0 else -q


class HoltTrendProcessor(StatefulProcessor):
    """Streaming twin of events_holt_trend (the batch operator; identical
    integer recurrence, so the two can never drift):

        l_1 = 1000*c_1, b_1 = 0
        l_t = (1000*c_t + l + b) div 2 ; b_t = (l_t - l + 3*b) div 4

    The key's CURRENT day accumulates in a ValueState; a row for a newer
    day finalizes it — folding zero-count days for any calendar gap first,
    exactly like the batch dense grid — and re-arms the event-time timer
    at the new day's end. The LAST day of the stream has no newer row, so
    the WATERMARK closes it (handleExpiredTimer), emitting the final
    (level, trend, one-step forecast) row.

    Split-point invariance holds when per-key arrival respects event-time
    order across micro-batches (the e2e test feeds time-ordered files);
    a day older than the accumulating one is late-beyond-horizon and is
    dropped, which is precisely withWatermark semantics. State per key is
    two fixed-width records — independent of event volume."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._handle = handle
        self._holt = handle.getValueState("holt", _HOLT_SCHEMA)
        self._pend = handle.getValueState("pend", _PEND_SCHEMA)

    @staticmethod
    def _ms(ts) -> int:
        return int(pd.Timestamp(ts).value // 1_000_000)

    def _fold_day(self, target_ms: int, y_milli: int) -> None:
        fday, l, b, has = (
            self._holt.get() if self._holt.exists() else (None, 0, 0, 0)
        )
        if not has:
            self._holt.update((target_ms, y_milli, 0, 1))
            return
        l_new = _tdiv(y_milli + l + b, 2)
        b_new = _tdiv(l_new - l + 3 * b, 4)
        self._holt.update((target_ms, l_new, b_new, 1))

    def _finalize_pending(self) -> None:
        """Fold the accumulating day, zero-filling any calendar gap since
        the last folded day first (the batch dense-grid semantics)."""
        pday, c = self._pend.get()
        if self._holt.exists() and self._holt.get()[3]:
            gap = self._holt.get()[0] + DAY_MS
            while gap < pday:
                self._fold_day(gap, 0)
                gap += DAY_MS
        self._fold_day(pday, 1000 * int(c))
        self._pend.clear()

    def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
        arrived: dict[int, int] = {}
        for pdf in rows:
            for d, c in pdf["day"].value_counts().items():
                arrived[self._ms(d)] = arrived.get(self._ms(d), 0) + int(c)
        for day_ms in sorted(arrived):
            cnt = arrived[day_ms]
            if self._pend.exists():
                pday, c = self._pend.get()
                if day_ms == pday:
                    self._pend.update((pday, c + cnt))
                    continue
                if day_ms < pday:
                    continue  # late beyond the accumulating day: dropped
                self._handle.deleteTimer(pday + DAY_MS)
                self._finalize_pending()
            self._pend.update((day_ms, cnt))
            self._handle.registerTimer(day_ms + DAY_MS)
        return iter(())

    def handleExpiredTimer(self, key, timerValues, expiredTimerInfo) -> Iterator[pd.DataFrame]:
        if not self._pend.exists():
            return
        pday, _c = self._pend.get()
        if pday + DAY_MS != expiredTimerInfo.getExpiryTimeInMs():
            return
        self._finalize_pending()
        fday, l, b, _has = self._holt.get()
        yield pd.DataFrame(
            [
                {
                    "event_type": key[0],
                    "last_day": pd.Timestamp(fday, unit="ms"),
                    "level_milli": l,
                    "trend_milli": b,
                    "fc_next_milli": l + b,
                }
            ]
        )

    def close(self) -> None:
        pass


def holt_trend_stream(events_stream: DataFrame, watermark: str = "0 seconds") -> DataFrame:
    """Wire the Holt processor in event-time mode: ``events_stream`` needs
    (event_type, ts) columns; days are truncated here so the stream and
    the batch operator share one day definition."""
    from pyspark.sql import functions as F

    return (
        events_stream.select(
            "event_type", F.date_trunc("day", F.col("ts")).alias("day")
        )
        .withWatermark("day", watermark)
        .groupBy("event_type")
        .transformWithStateInPandas(
            statefulProcessor=HoltTrendProcessor(),
            outputStructType=HOLT_OUTPUT_SCHEMA,
            outputMode="Append",
            timeMode="EventTime",
        )
    )


# ---------------------------------------------------------------------------
# Streaming PSI drift monitor: the production shape of operators/drift.py —
# a FIXED reference mix (fit from history, shipped with the monitor) and a
# stream that closes each day with its Population Stability Index.

PSI_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("day", T.TimestampType()),
        T.StructField("n_day", T.LongType()),
        T.StructField("n_unknown", T.LongType()),
        T.StructField("psi_micro", T.LongType()),
        T.StructField("drift_flag", T.BooleanType()),
    ]
)

_PSI_MAP_KEY = T.StructType([T.StructField("event_type", T.StringType())])
_PSI_MAP_VAL = T.StructType([T.StructField("c", T.LongType())])
_PSI_UNK = T.StructType([T.StructField("c", T.LongType())])

PSI_FLAG_MICRO = 200_000  # the conventional >0.2 "investigate" bar


def psi_micro_from_counts(
    day_counts: dict[str, int], ref_counts: dict[str, int]
) -> tuple[int, int]:
    """(n_day, psi_micro) of one day's type counts against the reference,
    with the EXACT arithmetic of operators/drift.py: Laplace +1 over the
    reference type universe, one ln per cell quantized to micro-nats, the
    (p - q) factor applied as one multiply-divide of exact integer
    products, rounded per term, then summed as ints. Types outside the
    reference are the caller's n_unknown — a reference fit from history
    covers the universe by construction, so unknowns are themselves a
    drift signal, reported rather than folded in."""
    import math
    from decimal import ROUND_HALF_UP, Decimal

    def _round_half_away(x: float) -> int:
        # Decimal-faithful SQL ROUND: Spark's ROUND(double) is
        # BigDecimal.valueOf(x).setScale(0, HALF_UP) — the double's
        # SHORTEST decimal representation rounded half away from zero.
        # Python repr(x) is the same shortest roundtrip string, so
        # Decimal(repr(x)) reproduces it exactly. (The earlier
        # floor(x+0.5) form diverges by 1 when x+0.5 rounds UP in
        # float64, e.g. x=0.49999999999999994 — ADVICE r7.)
        return int(
            Decimal(repr(x)).quantize(Decimal("1"), rounding=ROUND_HALF_UP)
        )

    t_types = len(ref_counts)
    n_all = sum(ref_counts.values())
    n_d = sum(day_counts.get(ty, 0) for ty in ref_counts)
    psi = 0
    for ty, c_t in ref_counts.items():
        c = day_counts.get(ty, 0)
        lr = _round_half_away(
            math.log(((c + 1) * (n_all + t_types)) / ((c_t + 1) * (n_d + t_types)))
            * 1e6
        )
        num = (c + 1) * (n_all + t_types) - (c_t + 1) * (n_d + t_types)
        den = (n_d + t_types) * (n_all + t_types)
        psi += _round_half_away(lr * (num / den))
    return n_d, psi


class PsiDriftProcessor(StatefulProcessor):
    """Keyed by DAY: accumulate the day's per-type counts in a MapState
    (bounded by the type dimension, independent of event volume), plus an
    unknown-type counter; the event-time timer at day's end — watermark-
    fired, exactly the Holt convention — closes the day, emits its PSI
    against the fixed reference mix, and CLEARS the state, so live state
    is only the days still inside the watermark horizon.

    The reference (type -> count) is fit batch-side (e.g. last month's
    accepted mix) and travels with the processor — the standard
    deployment: monitors compare against a frozen baseline, not against a
    moving self-distribution."""

    def __init__(self, ref_counts: dict[str, int]) -> None:
        self._ref = dict(sorted(ref_counts.items()))

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._handle = handle
        self._counts = handle.getMapState("counts", _PSI_MAP_KEY, _PSI_MAP_VAL)
        self._unk = handle.getValueState("unk", _PSI_UNK)

    def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
        batch: dict[str, int] = {}
        n = 0
        for pdf in rows:
            for ty, c in pdf["event_type"].value_counts().items():
                batch[str(ty)] = batch.get(str(ty), 0) + int(c)
                n += int(c)
        if not n:
            return iter(())
        unk = self._unk.get()[0] if self._unk.exists() else 0
        for ty, c in batch.items():
            if ty in self._ref:
                prev = (
                    self._counts.getValue((ty,))[0]
                    if self._counts.containsKey((ty,))
                    else 0
                )
                self._counts.updateValue((ty,), (prev + c,))
            else:
                unk += c
        self._unk.update((unk,))
        day_ms = int(pd.Timestamp(key[0]).value // 1_000_000)
        self._handle.registerTimer(day_ms + DAY_MS)
        return iter(())

    def handleExpiredTimer(self, key, timerValues, expiredTimerInfo) -> Iterator[pd.DataFrame]:
        day_counts = {k[0]: v[0] for k, v in self._counts.iterator()}
        unk = self._unk.get()[0] if self._unk.exists() else 0
        if not day_counts and not unk:
            return
        n_d, psi = psi_micro_from_counts(day_counts, self._ref)
        self._counts.clear()
        self._unk.clear()
        yield pd.DataFrame(
            [
                {
                    "day": pd.Timestamp(key[0]),
                    "n_day": n_d,
                    "n_unknown": unk,
                    "psi_micro": psi,
                    "drift_flag": psi > PSI_FLAG_MICRO,
                }
            ]
        )

    def close(self) -> None:
        pass


def psi_drift_stream(
    events_stream: DataFrame,
    ref_counts: dict[str, int],
    watermark: str = "0 seconds",
) -> DataFrame:
    """Wire the PSI monitor: needs (event_type, ts); keys by the truncated
    day so batch and stream share one day definition."""
    from pyspark.sql import functions as F

    return (
        events_stream.select(
            "event_type", F.date_trunc("day", F.col("ts")).alias("day")
        )
        .withWatermark("day", watermark)
        .groupBy("day")
        .transformWithStateInPandas(
            statefulProcessor=PsiDriftProcessor(ref_counts),
            outputStructType=PSI_OUTPUT_SCHEMA,
            outputMode="Append",
            timeMode="EventTime",
        )
    )


# ---------------------------------------------------------------------------
# Streaming SPRT early-stopping monitor: the sequential twin of
# operators/stats.events_sprt_monitor. SPRT is sequential BY NATURE (Wald
# 1945: the whole point is deciding while data arrives), so of the batch
# experimentation tier it is the one whose production deployment is a
# stream job: per arm, the cumulative log-likelihood walk adds fixed
# micro-nat literals per success/failure and the arm stops the day the
# walk exits the +-ln(19) boundaries.


SPRT_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("arm", T.LongType()),
        T.StructField("n_days", T.LongType()),
        T.StructField("llr_micro", T.LongType()),
        T.StructField("max_llr_micro", T.LongType()),
        T.StructField("min_llr_micro", T.LongType()),
        T.StructField("h1_cross_day", T.TimestampType()),
        T.StructField("h0_cross_day", T.TimestampType()),
        T.StructField("decision", T.StringType()),
    ]
)

_SPRT_DAY_KEY = T.StructType([T.StructField("day_ms", T.LongType())])
_SPRT_DAY_VAL = T.StructType(
    [T.StructField("n", T.LongType()), T.StructField("s", T.LongType())]
)
_SPRT_WALK = T.StructType(
    [
        T.StructField("llr", T.LongType()),
        T.StructField("n_days", T.LongType()),
        T.StructField("mx", T.LongType()),
        T.StructField("mn", T.LongType()),
        T.StructField("h1_ms", T.LongType()),  # -1 until first up-cross
        T.StructField("h0_ms", T.LongType()),  # -1 until first down-cross
        T.StructField("has", T.LongType()),
    ]
)


class SprtMonitorProcessor(StatefulProcessor):
    """Keyed by ARM: open days accumulate (n, s) in a MapState (bounded by
    the watermark horizon, independent of event volume); the event-time
    timer at each day's end folds every due day IN CALENDAR ORDER into a
    ValueState walk — cumulative llr plus its running max/min and the
    first boundary-crossing days — and emits the arm's monitor row. The
    fold is s*A + (n-s)*B with BIGINT counts and the same fixed integer
    literals as the batch operator, so stream == batch exactly, not up to
    rounding.

    Folding all due days per expiry (not just the expiring one) makes the
    walk independent of timer-callback interleaving when several day
    boundaries pass the watermark in one micro-batch; a callback that
    finds nothing due emits nothing, so output rows = fold events."""

    def __init__(
        self, ll_success_micro: int, ll_failure_micro: int, bound_micro: int
    ) -> None:
        self._a = int(ll_success_micro)
        self._b = int(ll_failure_micro)
        self._bound = int(bound_micro)

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._handle = handle
        self._days = handle.getMapState("days", _SPRT_DAY_KEY, _SPRT_DAY_VAL)
        self._walk = handle.getValueState("walk", _SPRT_WALK)

    @staticmethod
    def _ms(ts) -> int:
        return int(pd.Timestamp(ts).value // 1_000_000)

    def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
        batch: dict[int, list[int]] = {}
        for pdf in rows:
            for d, grp in pdf.groupby("day"):
                acc = batch.setdefault(self._ms(d), [0, 0])
                acc[0] += len(grp)
                acc[1] += int(grp["s"].sum())
        for day_ms, (n, s) in batch.items():
            if self._days.containsKey((day_ms,)):
                pn, ps = self._days.getValue((day_ms,))
                self._days.updateValue((day_ms,), (pn + n, ps + s))
            else:
                self._days.updateValue((day_ms,), (n, s))
            self._handle.registerTimer(day_ms + DAY_MS)
        return iter(())

    def handleExpiredTimer(
        self, key, timerValues, expiredTimerInfo
    ) -> Iterator[pd.DataFrame]:
        expiry = expiredTimerInfo.getExpiryTimeInMs()
        due = sorted(
            k[0] for k, _v in self._days.iterator() if k[0] + DAY_MS <= expiry
        )
        if not due:
            return
        llr, n_days, mx, mn, h1, h0, has = (
            self._walk.get() if self._walk.exists() else (0, 0, 0, 0, -1, -1, 0)
        )
        for day_ms in due:
            n, s = self._days.getValue((day_ms,))
            llr += s * self._a + (n - s) * self._b
            n_days += 1
            mx = llr if not has else max(mx, llr)
            mn = llr if not has else min(mn, llr)
            has = 1
            if llr >= self._bound and h1 < 0:
                h1 = day_ms
            if llr <= -self._bound and h0 < 0:
                h0 = day_ms
            self._days.removeKey((day_ms,))
        self._walk.update((llr, n_days, mx, mn, h1, h0, has))
        if h1 >= 0 and (h0 < 0 or h1 <= h0):
            decision = "accept_h1"
        elif h0 >= 0:
            decision = "accept_h0"
        else:
            decision = "continue"
        yield pd.DataFrame(
            [
                {
                    "arm": int(key[0]),
                    "n_days": n_days,
                    "llr_micro": llr,
                    "max_llr_micro": mx,
                    "min_llr_micro": mn,
                    "h1_cross_day": (
                        pd.Timestamp(h1, unit="ms") if h1 >= 0 else pd.NaT
                    ),
                    "h0_cross_day": (
                        pd.Timestamp(h0, unit="ms") if h0 >= 0 else pd.NaT
                    ),
                    "decision": decision,
                }
            ]
        )

    def close(self) -> None:
        pass


def sprt_monitor_stream(
    events_stream: DataFrame, watermark: str = "0 seconds"
) -> DataFrame:
    """Wire the SPRT monitor: needs (event_id, event_type, ts); the arm
    hash, day truncation, and success flag are computed here with the
    batch operator's exact expressions so the two can never diverge."""
    from pyspark.sql import functions as F

    from ..operators.stats import (
        OPE_ARMS,
        SPRT_BOUND_MICRO,
        SPRT_LL_FAILURE_MICRO,
        SPRT_LL_SUCCESS_MICRO,
    )

    return (
        events_stream.select(
            F.expr(
                "CAST(conv(substring(md5(CAST(event_id AS STRING)), 1, 8), 16, 10)"
                f" AS BIGINT) % {OPE_ARMS}"
            ).alias("arm"),
            F.date_trunc("day", F.col("ts")).alias("day"),
            (F.col("event_type") == "purchase").cast("bigint").alias("s"),
        )
        .withWatermark("day", watermark)
        .groupBy("arm")
        .transformWithStateInPandas(
            statefulProcessor=SprtMonitorProcessor(
                SPRT_LL_SUCCESS_MICRO, SPRT_LL_FAILURE_MICRO, SPRT_BOUND_MICRO
            ),
            outputStructType=SPRT_OUTPUT_SCHEMA,
            outputMode="Append",
            timeMode="EventTime",
        )
    )


# ---------------------------------------------------------------------------
# Streaming CUSUM monitor: the twin of operators/timeseries.
# events_cusum_monitor — an online Page (1954) CUSUM against a FROZEN
# per-type reference (fit batch-side from the series' first week and
# shipped with the processor, the PSI convention). The batch operator
# computes the clamped recurrences via the cumsum/running-extreme window
# identities; the stream folds the SAME exact integers sequentially, so
# the two are equal by construction, not approximately.


CUSUM_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("event_type", T.StringType()),
        T.StructField("day", T.TimestampType()),
        T.StructField("daily_n", T.LongType()),
        T.StructField("s_plus", T.LongType()),
        T.StructField("s_minus", T.LongType()),
        T.StructField("alarm", T.BooleanType()),
    ]
)

_CUSUM_DAY_KEY = T.StructType([T.StructField("day_ms", T.LongType())])
_CUSUM_DAY_VAL = T.StructType([T.StructField("n", T.LongType())])
_CUSUM_WALK = T.StructType(
    [
        T.StructField("s_plus", T.LongType()),
        T.StructField("s_minus", T.LongType()),
    ]
)


class CusumMonitorProcessor(StatefulProcessor):
    """Keyed by event_type: open days accumulate counts in a MapState;
    event-time timers fold due days in calendar order through

        s_plus  = max(0, s_plus  + dev - slack)
        s_minus = max(0, s_minus - dev - slack),  dev = ref_days*n - ref_total

    and emit one monitor row per closed day. Days before the key's
    monitor start (the reference window the baseline was fit on) are
    dropped on input, and unknown types are ignored — a monitor watches
    the universe its baseline covers."""

    def __init__(
        self,
        refs: dict[str, tuple[int, int]],
        mon_start_ms: dict[str, int],
        slack_milli: int,
        h_milli: int,
    ) -> None:
        self._refs = {k: (int(a), int(b)) for k, (a, b) in refs.items()}
        self._start = {k: int(v) for k, v in mon_start_ms.items()}
        self._slack_milli = int(slack_milli)
        self._h_milli = int(h_milli)

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._handle = handle
        self._days = handle.getMapState("days", _CUSUM_DAY_KEY, _CUSUM_DAY_VAL)
        self._walk = handle.getValueState("walk", _CUSUM_WALK)

    @staticmethod
    def _ms(ts) -> int:
        return int(pd.Timestamp(ts).value // 1_000_000)

    def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
        et = key[0]
        if et not in self._refs:
            return iter(())
        start = self._start.get(et, 0)
        batch: dict[int, int] = {}
        for pdf in rows:
            for d, c in pdf["day"].value_counts().items():
                ms = self._ms(d)
                if ms >= start:
                    batch[ms] = batch.get(ms, 0) + int(c)
        for day_ms, n in batch.items():
            prev = (
                self._days.getValue((day_ms,))[0]
                if self._days.containsKey((day_ms,))
                else 0
            )
            self._days.updateValue((day_ms,), (prev + n,))
            self._handle.registerTimer(day_ms + DAY_MS)
        return iter(())

    def handleExpiredTimer(
        self, key, timerValues, expiredTimerInfo
    ) -> Iterator[pd.DataFrame]:
        et = key[0]
        ref = self._refs.get(et)
        if ref is None:
            return
        ref_total, ref_days = ref
        slack = (self._slack_milli * ref_total) // 1000
        h = (self._h_milli * ref_total) // 1000
        expiry = expiredTimerInfo.getExpiryTimeInMs()
        due = sorted(
            k[0] for k, _v in self._days.iterator() if k[0] + DAY_MS <= expiry
        )
        if not due:
            return
        s_plus, s_minus = (
            self._walk.get() if self._walk.exists() else (0, 0)
        )
        out = []
        for day_ms in due:
            n = self._days.getValue((day_ms,))[0]
            dev = ref_days * n - ref_total
            s_plus = max(0, s_plus + dev - slack)
            s_minus = max(0, s_minus - dev - slack)
            out.append(
                {
                    "event_type": et,
                    "day": pd.Timestamp(day_ms, unit="ms"),
                    "daily_n": n,
                    "s_plus": s_plus,
                    "s_minus": s_minus,
                    "alarm": max(s_plus, s_minus) > h,
                }
            )
            self._days.removeKey((day_ms,))
        self._walk.update((s_plus, s_minus))
        yield pd.DataFrame(out)

    def close(self) -> None:
        pass


def cusum_monitor_stream(
    events_stream: DataFrame,
    refs: dict[str, tuple[int, int]],
    mon_start_ms: dict[str, int],
    watermark: str = "0 seconds",
) -> DataFrame:
    """Wire the CUSUM monitor: needs (event_type, ts); the slack/threshold
    literals come from the batch operator so the twins cannot diverge."""
    from pyspark.sql import functions as F

    from ..operators.timeseries import CUSUM_MON_H_MILLI, CUSUM_SLACK_MILLI

    return (
        events_stream.select(
            "event_type", F.date_trunc("day", F.col("ts")).alias("day")
        )
        .withWatermark("day", watermark)
        .groupBy("event_type")
        .transformWithStateInPandas(
            statefulProcessor=CusumMonitorProcessor(
                refs, mon_start_ms, CUSUM_SLACK_MILLI, CUSUM_MON_H_MILLI
            ),
            outputStructType=CUSUM_OUTPUT_SCHEMA,
            outputMode="Append",
            timeMode="EventTime",
        )
    )


# ---------------------------------------------------------------------------
# Streaming split-conformal coverage monitor: the deployment form of
# operators/drift.events_conformal_interval — the model (integer OLS fit
# + calibration-quantile residual q_r) is fit batch-side and FROZEN
# (drift.conformal_fit_params); the stream replays the operator's exact
# integer residual test on each closed held-out (odd-index) day and
# maintains running coverage. Completes the monitor-twin set: PSI, Holt,
# SPRT, CUSUM, conformal.


CONFORMAL_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("event_type", T.StringType()),
        T.StructField("day", T.TimestampType()),
        T.StructField("x", T.LongType()),
        T.StructField("c", T.LongType()),
        T.StructField("covered", T.BooleanType()),
        T.StructField("n_test", T.LongType()),
        T.StructField("n_covered", T.LongType()),
        T.StructField("coverage_milli", T.LongType()),
    ]
)

_CONF_DAY_KEY = T.StructType([T.StructField("day_ms", T.LongType())])
_CONF_DAY_VAL = T.StructType([T.StructField("n", T.LongType())])
_CONF_WALK = T.StructType(
    [
        T.StructField("last_x", T.LongType()),
        T.StructField("n_test", T.LongType()),
        T.StructField("n_covered", T.LongType()),
    ]
)


class ConformalMonitorProcessor(StatefulProcessor):
    """Keyed by event_type. Open days accumulate counts in a MapState;
    event-time timers fold due days in calendar order, ZERO-FILLING any
    calendar gap first (the batch operator's dense-grid semantics, the
    Holt convention), and each odd-index day runs the frozen integer
    residual test |k·den·c − k·a_num·x − sy·den + a_num·sx| <= q_r.
    Even-index days are the calibration set the model was fit on and are
    skipped. One monitor row per closed REAL day carries the running
    (n_test, n_covered, coverage_milli) — the stream's final row per
    type equals the batch operator's coverage columns when the type's
    series spans the grid (asserted in the e2e test)."""

    def __init__(self, params: dict[str, tuple[int, int, int, int, int, int, int]]):
        # event_type -> (d0_ms, k, sx, sy, a_num, den, q_r)
        self._p = {k: tuple(int(x) for x in v) for k, v in params.items()}

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._handle = handle
        self._days = handle.getMapState("days", _CONF_DAY_KEY, _CONF_DAY_VAL)
        self._walk = handle.getValueState("walk", _CONF_WALK)

    @staticmethod
    def _ms(ts) -> int:
        return int(pd.Timestamp(ts).value // 1_000_000)

    def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
        if key[0] not in self._p:
            return iter(())
        batch: dict[int, int] = {}
        for pdf in rows:
            for d, c in pdf["day"].value_counts().items():
                ms = self._ms(d)
                batch[ms] = batch.get(ms, 0) + int(c)
        for day_ms, n in batch.items():
            prev = (
                self._days.getValue((day_ms,))[0]
                if self._days.containsKey((day_ms,))
                else 0
            )
            self._days.updateValue((day_ms,), (prev + n,))
            self._handle.registerTimer(day_ms + DAY_MS)
        return iter(())

    def handleExpiredTimer(
        self, key, timerValues, expiredTimerInfo
    ) -> Iterator[pd.DataFrame]:
        et = key[0]
        p = self._p.get(et)
        if p is None:
            return
        d0_ms, k, sx, sy, a_num, den, q_r = p
        expiry = expiredTimerInfo.getExpiryTimeInMs()
        due = sorted(
            kk[0] for kk, _v in self._days.iterator() if kk[0] + DAY_MS <= expiry
        )
        if not due:
            return
        last_x, n_test, n_cov = (
            self._walk.get() if self._walk.exists() else (-1, 0, 0)
        )

        def fold(x: int, c: int) -> bool | None:
            nonlocal n_test, n_cov
            if x % 2 == 0:
                return None  # calibration day: the model trained on it
            abs_r = abs(k * den * c - k * a_num * x - sy * den + a_num * sx)
            cov = abs_r <= q_r
            n_test += 1
            n_cov += int(cov)
            return cov

        out = []
        for day_ms in due:
            x = (day_ms - d0_ms) // DAY_MS
            for gap_x in range(last_x + 1, x):  # dense-grid zero fill
                fold(gap_x, 0)
            c = self._days.getValue((day_ms,))[0]
            covered = fold(x, c)
            last_x = x
            out.append(
                {
                    "event_type": et,
                    "day": pd.Timestamp(day_ms, unit="ms"),
                    "x": x,
                    "c": c,
                    "covered": covered,
                    "n_test": n_test,
                    "n_covered": n_cov,
                    "coverage_milli": (1000 * n_cov) // n_test if n_test else 0,
                }
            )
            self._days.removeKey((day_ms,))
        self._walk.update((last_x, n_test, n_cov))
        yield pd.DataFrame(out)

    def close(self) -> None:
        pass


def conformal_monitor_stream(
    events_stream: DataFrame,
    params: dict[str, tuple[int, int, int, int, int, int, int]],
    watermark: str = "0 seconds",
) -> DataFrame:
    """Wire the conformal monitor: needs (event_type, ts); ``params`` is
    drift.conformal_fit_params collected to a dict."""
    from pyspark.sql import functions as F

    return (
        events_stream.select(
            "event_type", F.date_trunc("day", F.col("ts")).alias("day")
        )
        .withWatermark("day", watermark)
        .groupBy("event_type")
        .transformWithStateInPandas(
            statefulProcessor=ConformalMonitorProcessor(params),
            outputStructType=CONFORMAL_OUTPUT_SCHEMA,
            outputMode="Append",
            timeMode="EventTime",
        )
    )
