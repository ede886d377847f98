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
