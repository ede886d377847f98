"""Streaming HLL sketch maintenance: fold event micro-batches into a
versioned register table with a MAX-merge ``foreachBatch`` sink — the
streaming completion of operators/sketches.py.

This is why sketches exist at 100 TB: the streaming side never keeps raw
keys as state. Each micro-batch reduces to at most (groups x 64) register
rows (a two-phase MAX aggregate inside the batch), and the fold is one
keyed full-outer MAX against the current register snapshot. Unlike the
signed-sum maintenance fold (maintenance.py), MAX-merge is IDEMPOTENT and
commutative — a replayed batch folds to the same fixpoint, so
at-least-once delivery needs no applied-batch ledger for correctness
(the versioned pointer swap alone makes torn writes invisible). The
stream==batch equivalence is pinned in tests/test_streaming_sketches.py:
after draining the feed, the register table is row-identical to the batch
sketch_hll_registers over the same events — the mergeability property
that lets 1000 executors (or 1000 micro-batches) sketch independently.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import versioned
from ..operators.sketches import hll_registers_for

# the register aggregation IS the batch operator's (imported whole, not
# re-spelled): one definition, so stream and batch can never drift
batch_registers = hll_registers_for


def hll_register_sink(table_dir: str):
    """foreachBatch fold: MAX-merge the micro-batch's registers into the
    versioned register table. Idempotent by construction (MAX), so replays
    need no ledger — write_version's atomic pointer swap is the only
    commit machinery required."""

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        # crashed-in-the-commit-window recovery: a pointerless complete
        # snapshot is adopted blindly — MAX-merge is idempotent, so
        # re-folding this batch on top reaches the same fixpoint
        versioned.adopt_orphan(table_dir)
        spark = batch_df.sparkSession
        delta = batch_registers(batch_df)
        cur = versioned.current_version(table_dir)
        if cur is None:
            merged = delta
        else:
            old = versioned.read_version(spark, table_dir, cur).withColumnRenamed(
                "r", "r_old"
            )
            merged = (
                old.join(delta.withColumnRenamed("r", "r_new"),
                         ["event_type", "bucket"], "full_outer")
                .select(
                    "event_type",
                    "bucket",
                    F.greatest(
                        F.coalesce("r_old", F.lit(0)),
                        F.coalesce("r_new", F.lit(0)),
                    )
                    .cast("int")
                    .alias("r"),
                )
            )
        versioned.write_version(merged, table_dir)

    return sink


def _start_sink_query(spark, events_dir, schema, checkpoint_dir, sink):
    """Shared wiring for the sketch-maintenance sinks: a file-source feed,
    one file per micro-batch (so the fold is exercised incrementally),
    bounded by availableNow. ONE definition — feed options can never
    diverge between the HLL and CMS queries."""
    feed = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(events_dir)
    )
    return (
        feed.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def start_hll_query(
    spark: SparkSession,
    events_dir: str,
    schema,
    table_dir: str,
    checkpoint_dir: str,
):
    """Wire a file-source event feed into the HLL register sink."""
    return _start_sink_query(
        spark, events_dir, schema, checkpoint_dir, hll_register_sink(table_dir)
    )


# --- Count-min maintenance: the NON-idempotent sketch fold -----------------
#
# HLL merges with MAX (idempotent — replay-safe for free); count-min
# counters merge with SUM, which double-counts on replay. The CMS sink
# therefore uses the maintenance.py commit protocol: the applied-batch
# ledger rides INSIDE the versioned snapshot commit, so at-least-once
# delivery still folds each batch exactly once. Together the two sinks
# pin the two sketch-maintenance regimes a streaming engine needs.

from ..operators.sketches import cms_counters_for  # noqa: E402
from .maintenance import _LEDGER, _applied_batches, _has_ledger  # noqa: E402

# one definition shared with the batch operator — stream and batch can
# never drift (same contract as batch_registers above)
batch_counters = cms_counters_for


def cms_counter_sink(table_dir: str):
    """foreachBatch fold: SUM-merge the micro-batch's count-min counters
    into the versioned counter table, exactly once per batch_id."""
    import json
    import os

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        # crashed-in-the-commit-window recovery: adopt a pointerless
        # complete snapshot ONLY if it carries this sink's applied-batch
        # ledger — its replay check below then keeps the fold exactly-once
        versioned.adopt_orphan(table_dir, validate=_has_ledger)
        applied = _applied_batches(table_dir)
        if batch_id in applied:
            return  # replay of an already-folded batch: no-op
        spark = batch_df.sparkSession
        delta = batch_counters(batch_df)
        cur = versioned.current_version(table_dir)
        if cur is None:
            merged = delta
        else:
            old = versioned.read_version(spark, table_dir, cur).withColumnRenamed(
                "counter", "c_old"
            )
            merged = (
                old.join(
                    delta.withColumnRenamed("counter", "c_new"),
                    ["d", "bucket"],
                    "full_outer",
                )
                .select(
                    "d",
                    "bucket",
                    (
                        F.coalesce("c_old", F.lit(0))
                        + F.coalesce("c_new", F.lit(0))
                    )
                    .cast("bigint")
                    .alias("counter"),
                )
            )

        def commit_ledger(vdir: str) -> None:
            with open(os.path.join(vdir, _LEDGER), "w") as fh:
                json.dump(sorted(applied | {batch_id}), fh)

        versioned.write_version(merged, table_dir, pre_commit=commit_ledger)

    return sink


def start_cms_query(
    spark: SparkSession,
    events_dir: str,
    schema,
    table_dir: str,
    checkpoint_dir: str,
):
    """Wire a file-source event feed into the CMS counter sink (the
    SUM-fold and its exactly-once ledger get exercised batch by batch)."""
    return _start_sink_query(
        spark, events_dir, schema, checkpoint_dir, cms_counter_sink(table_dir)
    )


# --- Quantile-histogram maintenance: the second SUM-fold sketch ------------
#
# The decade-histogram quantile sketch (operators/quantiles.py) merges by
# SUM exactly like the count-min counters, so it rides the SAME ledgered
# commit protocol — one more member of the non-idempotent maintenance
# regime, with quantile readout available from the maintained table at any
# commit point.

from ..operators.quantiles import event_value_cents_histogram  # noqa: E402

# one definition shared with the batch operator (cms_counters_for contract)
batch_value_histogram = event_value_cents_histogram


def quantile_histogram_sink(table_dir: str):
    """foreachBatch fold: SUM-merge the micro-batch's (k, d) decade bins
    into the versioned histogram table, exactly once per batch_id."""
    import json
    import os

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        versioned.adopt_orphan(table_dir, validate=_has_ledger)
        applied = _applied_batches(table_dir)
        if batch_id in applied:
            return  # replay of an already-folded batch: no-op
        spark = batch_df.sparkSession
        delta = batch_value_histogram(batch_df)
        cur = versioned.current_version(table_dir)
        if cur is None:
            merged = delta
        else:
            old = versioned.read_version(spark, table_dir, cur).withColumnRenamed(
                "n", "n_old"
            )
            merged = (
                old.join(
                    delta.withColumnRenamed("n", "n_new"), ["k", "d"], "full_outer"
                )
                .select(
                    "k",
                    "d",
                    (
                        F.coalesce("n_old", F.lit(0)) + F.coalesce("n_new", F.lit(0))
                    )
                    .cast("bigint")
                    .alias("n"),
                )
            )

        def commit_ledger(vdir: str) -> None:
            with open(os.path.join(vdir, _LEDGER), "w") as fh:
                json.dump(sorted(applied | {batch_id}), fh)

        versioned.write_version(merged, table_dir, pre_commit=commit_ledger)

    return sink


def start_quantile_histogram_query(
    spark: SparkSession,
    events_dir: str,
    schema,
    table_dir: str,
    checkpoint_dir: str,
):
    """Wire an event feed (with a ``value`` column) into the quantile
    histogram sink."""
    return _start_sink_query(
        spark, events_dir, schema, checkpoint_dir, quantile_histogram_sink(table_dir)
    )
