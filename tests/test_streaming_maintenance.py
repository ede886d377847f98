"""Streaming incremental maintenance: folding the CDC feed through
foreachBatch must land the versioned aggregate exactly on the batch
recompute, across multiple micro-batches, and replays must be no-ops."""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

from kalytical_spark import versioned
from kalytical_spark.operators import incremental
from kalytical_spark.operators.common import DEC
from kalytical_spark.streaming import maintenance
from tests.conftest import SF_ORACLE

_GRP = ["o_orderstatus", "order_month"]


def _with_month(df):
    return df.withColumn(
        "order_month", F.date_trunc("month", "o_orderdate").cast("date")
    )


def _change_feed(spark):
    """Row-level change feed from the synthetic snapshot transition:
    'changed' rows arrive as their -old/+new halves."""
    old, new = incremental._snapshots(spark, SF_ORACLE)
    changes = incremental.diff_snapshots(
        _with_month(old), _with_month(new), "o_orderkey"
    )
    sides = []
    for ctype, side, tag in (
        ("added", "new_row", "added"),
        ("removed", "old_row", "removed"),
        ("changed", "old_row", "changed_old"),
        ("changed", "new_row", "changed_new"),
    ):
        sides.append(
            changes.filter(F.col("change_type") == ctype).select(
                F.lit(tag).alias("change_type"),
                *[F.col(f"{side}.{g}").alias(g) for g in _GRP],
                F.col(f"{side}.o_totalprice").alias("o_totalprice"),
            )
        )
    feed = sides[0]
    for s in sides[1:]:
        feed = feed.unionByName(s)
    return feed


def test_stream_maintenance_equals_recompute(spark):
    old, new = incremental._snapshots(spark, SF_ORACLE)
    with tempfile.TemporaryDirectory() as tmp:
        tbl = os.path.join(tmp, "agg_table")
        # seed: the aggregate of the OLD snapshot, as version 1
        old_agg = (
            _with_month(old)
            .groupBy(*_GRP)
            .agg(
                F.count("*").cast("bigint").alias("n"),
                F.sum(F.col("o_totalprice").cast(DEC))
                .cast("decimal(22,4)")
                .alias("sum_dec"),
            )
        )
        versioned.write_version(old_agg, tbl)
        maintenance.seed_ledger(tbl)  # declare v1 a maintenance snapshot
        # change feed split across files -> multiple micro-batches
        feed = _change_feed(spark)
        src = os.path.join(tmp, "changes")
        feed.repartition(3).write.parquet(src)
        q = maintenance.start_maintenance_query(
            spark,
            src,
            feed.schema,
            tbl,
            _GRP,
            "o_totalprice",
            os.path.join(tmp, "ckpt"),
        )
        try:
            assert q.awaitTermination(120)
        finally:
            q.stop()
        got = {
            (r.o_orderstatus, r.order_month): (r.n, float(r.sum_dec))
            for r in versioned.read_version(spark, tbl).collect()
        }
        want = {
            (r.o_orderstatus, r.order_month): (r.n, float(r.sum_dec))
            for r in _with_month(new)
            .groupBy(*_GRP)
            .agg(
                F.count("*").cast("bigint").alias("n"),
                F.sum(F.col("o_totalprice").cast(DEC))
                .cast("decimal(22,4)")
                .alias("sum_dec"),
            )
            .collect()
        }
        assert got == want
        # replaying an applied batch is a no-op (exactly-once fold)
        v_before = versioned.current_version(tbl)
        applied = maintenance._applied_batches(tbl)
        assert len(applied) >= 2, (
            "per-file triggers must fold multiple micro-batches, "
            f"got {sorted(applied)}"
        )
        sink = maintenance.maintenance_sink(tbl, _GRP, "o_totalprice")
        sink(feed, max(applied))
        assert versioned.current_version(tbl) == v_before

        # compaction is a commit too: it must carry the ledger forward so
        # the exactly-once contract survives maintenance jobs
        versioned.compact_version(spark, tbl, target_files=1)
        assert maintenance._applied_batches(tbl) == applied
        sink(feed, max(applied))  # still a no-op after compaction
        assert versioned.current_version(tbl) == v_before + 1


def test_ledger_is_atomic_with_commit(spark):
    """Crash-safety of the exactly-once contract: a committed snapshot
    without a readable ledger must refuse to fold (never silently treat
    the applied set as empty), and an uncommitted crash leftover must not
    block the replayed commit."""
    import pytest

    with tempfile.TemporaryDirectory() as tmp:
        tbl = os.path.join(tmp, "agg")
        df = spark.range(3).select(
            F.lit("O").alias("o_orderstatus"),
            F.lit(None).cast("date").alias("order_month"),
            F.col("id").cast("bigint").alias("n"),
            F.lit(1).cast("decimal(22,4)").alias("sum_dec"),
        )
        versioned.write_version(df, tbl)
        # seeded version has no ledger: folding must hard-fail, not re-fold
        with pytest.raises(RuntimeError, match="ledger"):
            maintenance._applied_batches(tbl)
        maintenance.seed_ledger(tbl)
        assert maintenance._applied_batches(tbl) == set()
        maintenance.seed_ledger(tbl)  # idempotent

        # simulate a crash between parquet write and pointer swap: an
        # orphan v2 exists but the pointer still names v1. The replayed
        # commit must clean it up and land as v2 with its ledger.
        os.makedirs(os.path.join(tbl, "v2"))
        with open(os.path.join(tbl, "v2", "_partial"), "w") as fh:
            fh.write("x")
        assert versioned.current_version(tbl) == 1

        def ledger(vdir):
            with open(os.path.join(vdir, maintenance._LEDGER), "w") as fh:
                fh.write("[7]")

        assert versioned.write_version(df, tbl, pre_commit=ledger) == 2
        assert maintenance._applied_batches(tbl) == {7}
        assert not os.path.exists(os.path.join(tbl, "v2", "_partial"))


def test_retention_window_vacuums_old_versions(spark):
    """keep_last retention: the sink vacuums snapshot versions beyond the
    window after each commit (nothing else schedules versioned.vacuum on
    a long-lived stream — VERDICT r10 task 7), while time travel keeps
    working for every retained version and the fold stays exactly-once."""
    with tempfile.TemporaryDirectory() as tmp:
        tbl = os.path.join(tmp, "agg")
        sink = maintenance.maintenance_sink(tbl, ["g"], "v", keep_last=2)
        for i in range(5):
            batch = spark.createDataFrame(
                [("added", f"g{i}", float(i + 1))], "change_type string, g string, v double"
            )
            sink(batch, i)
        live = sorted(
            int(d[1:])
            for d in os.listdir(tbl)
            if d.startswith("v") and d[1:].isdigit()
        )
        assert live == [4, 5], live
        assert versioned.current_version(tbl) == 5
        # time travel within the window still works; the current snapshot
        # carries the full ledger
        assert versioned.read_version(spark, tbl, 4).count() == 4
        assert maintenance._applied_batches(tbl) == {0, 1, 2, 3, 4}
        # replay after vacuum is still a no-op
        sink(
            spark.createDataFrame(
                [("added", "g0", 1.0)], "change_type string, g string, v double"
            ),
            0,
        )
        assert versioned.current_version(tbl) == 5


def test_ledger_range_codec():
    """The applied-batch ledger is STORED as inclusive ranges — a flat id
    list rewrote O(batches) bytes per commit, the same quadratic-
    maintenance genus as the r10 pairs-snapshot debt, in metadata. The
    codec must round-trip arbitrary sets, collapse sequential streams to
    one range, and keep reading pre-r11 flat lists."""
    enc, dec = maintenance.encode_ledger, maintenance.decode_ledger
    assert enc(set(range(1000))) == [[0, 999]]  # sequential -> O(1)
    assert enc({5}) == [[5, 5]]
    assert enc(set()) == []
    ragged = {0, 1, 2, 7, 9, 10, 11, 12, 99}
    assert dec(enc(ragged)) == ragged
    assert enc(ragged) == [[0, 2], [7, 7], [9, 12], [99, 99]]
    # pre-r11 flat list (and mixed) still decodes
    assert dec([0, 1, 2, 5]) == {0, 1, 2, 5}
    assert dec([[0, 2], 5]) == {0, 1, 2, 5}
