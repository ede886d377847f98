"""Streaming HLL maintenance: micro-batch MAX-merge must converge to the
batch registers exactly (stream == batch), and a replayed fold must be a
no-op (MAX idempotence) — the properties that make the sketch safe under
at-least-once delivery."""

from __future__ import annotations

import os
import tempfile

from kalytical_spark import versioned
from kalytical_spark.operators import sketches
from kalytical_spark.streaming import sketches as ssk
from tests.conftest import SF_ORACLE


def _events(spark):
    return sketches.t(spark, SF_ORACLE, "events_ms").select(
        "event_type", "user_id"
    )


def _register_set(df):
    return {(r.event_type, r.bucket, r.r) for r in df.collect()}


def test_streamed_registers_equal_batch(spark):
    ev = _events(spark)
    batch = _register_set(sketches.sketch_hll_registers(spark, SF_ORACLE))
    with tempfile.TemporaryDirectory() as tmp:
        src = os.path.join(tmp, "feed")
        tbl = os.path.join(tmp, "hll_table")
        ev.repartition(4).write.parquet(src)  # 4 files -> 4 micro-batches
        q = ssk.start_hll_query(
            spark, src, ev.schema, tbl, os.path.join(tmp, "ckpt")
        )
        q.awaitTermination(120)
        v = versioned.current_version(tbl)
        assert v is not None and v >= 4, "one committed version per batch"
        streamed = _register_set(versioned.read_version(spark, tbl, v))
        assert streamed == batch

        # replay idempotence: re-folding the whole feed changes nothing
        sink = ssk.hll_register_sink(tbl)
        sink(spark.read.parquet(src), batch_id=999)
        replayed = _register_set(
            versioned.read_version(spark, tbl, versioned.current_version(tbl))
        )
        assert replayed == batch


def test_partial_feed_registers_are_submerge(spark):
    """Registers from any prefix of the feed are dominated by the full
    batch registers (monotone MAX state — no overshoot possible)."""
    ev = _events(spark)
    half = ev.limit(ev.count() // 2)
    full = {
        (r.event_type, r.bucket): r.r
        for r in ssk.batch_registers(ev).collect()
    }
    part = {
        (r.event_type, r.bucket): r.r
        for r in ssk.batch_registers(half).collect()
    }
    assert part, "non-vacuous prefix"
    for k, r in part.items():
        assert r <= full[k]


def test_streamed_cms_counters_equal_batch_and_replay_noop(spark):
    """CMS maintenance: the SUM-fold over micro-batches must converge to
    the batch counter table exactly, a replayed batch_id must be a no-op
    (the applied-batch ledger — SUM is NOT idempotent, unlike MAX), and a
    NEW batch id re-delivering the same rows must visibly double-count
    (proving the ledger, not accidental idempotence, is what protects
    replays)."""
    ev = sketches.t(spark, SF_ORACLE, "events_ms").select("user_id")
    batch = {(r.d, r.bucket): r.counter for r in ssk.batch_counters(ev).collect()}
    with tempfile.TemporaryDirectory() as tmp:
        src = os.path.join(tmp, "feed")
        tbl = os.path.join(tmp, "cms_table")
        ev.repartition(4).write.parquet(src)
        q = ssk.start_cms_query(spark, src, ev.schema, tbl, os.path.join(tmp, "ckpt"))
        q.awaitTermination(120)
        v = versioned.current_version(tbl)
        assert v is not None and v >= 4, "one committed version per batch"
        streamed = {
            (r.d, r.bucket): r.counter
            for r in versioned.read_version(spark, tbl, v).collect()
        }
        assert streamed == batch

        sink = ssk.cms_counter_sink(tbl)
        # replayed batch_id (0..3 were applied by the stream): no-op
        sink(spark.read.parquet(src), batch_id=0)
        after_replay = {
            (r.d, r.bucket): r.counter
            for r in versioned.read_version(
                spark, tbl, versioned.current_version(tbl)
            ).collect()
        }
        assert after_replay == batch

        # a genuinely NEW batch with the same rows must double every
        # counter — SUM semantics, so the ledger is load-bearing
        sink(spark.read.parquet(src), batch_id=999)
        doubled = {
            (r.d, r.bucket): r.counter
            for r in versioned.read_version(
                spark, tbl, versioned.current_version(tbl)
            ).collect()
        }
        assert doubled == {k: 2 * c for k, c in batch.items()}


def test_streamed_quantile_histogram_equals_batch_and_readout(spark):
    """Quantile-histogram maintenance (the second SUM-fold): micro-batch
    folds converge to the batch decade histogram exactly, a replayed
    batch_id is a no-op, and the quantile readout from the MAINTAINED
    table brackets the exact percentile of the full feed."""
    import os
    import tempfile

    ev = sketches.t(spark, SF_ORACLE, "events_ms").select("value")
    batch = {(r.k, r.d): r.n for r in ssk.batch_value_histogram(ev).collect()}
    with tempfile.TemporaryDirectory() as tmp:
        src = os.path.join(tmp, "feed")
        tbl = os.path.join(tmp, "qh_table")
        ev.repartition(4).write.parquet(src)
        q = ssk.start_quantile_histogram_query(
            spark, src, ev.schema, tbl, os.path.join(tmp, "ckpt")
        )
        q.awaitTermination(120)
        v = versioned.current_version(tbl)
        assert v is not None and v >= 4
        streamed = {
            (r.k, r.d): r.n
            for r in versioned.read_version(spark, tbl, v).collect()
        }
        assert streamed == batch

        # replayed batch_id: ledger makes the SUM-fold a no-op
        sink = ssk.quantile_histogram_sink(tbl)
        sink(spark.read.parquet(src), batch_id=0)
        assert {
            (r.k, r.d): r.n
            for r in versioned.read_version(
                spark, tbl, versioned.current_version(tbl)
            ).collect()
        } == batch

        # quantile readout from the maintained table: the median bin must
        # bracket the exact median of the feed (integer cents)
        n_total = sum(batch.values())
        target = (500 * n_total + 999) // 1000
        cum = 0
        est_lo = est_hi = None
        for (k, d) in sorted(batch):
            cum += batch[(k, d)]
            if cum >= target:
                est_lo, est_hi = d * 10 ** (k - 1), (d + 1) * 10 ** (k - 1)
                break
        cents = sorted(
            r.v
            for r in ev.selectExpr(
                "CAST(CAST(value AS DECIMAL(12,4)) * 100 AS BIGINT) AS v"
            ).collect()
        )
        exact = cents[target - 1]
        assert est_lo <= exact < est_hi
