"""Streaming incremental view maintenance: a CDC change feed consumed
through ``foreachBatch``, folding signed deltas into a VERSIONED aggregate
table (versioned.py) — the streaming completion of the batch maintenance
algebra in operators/incremental.py.

Contract per micro-batch (replay-safe):
* The batch rows ARE row-level changes: (change_type, group cols, value)
  with change_type in ('added', 'removed', 'changed_old', 'changed_new')
  — a 'changed' row arrives as its -old and +new halves, which makes the
  delta a pure signed sum (no joins inside the hot path).
* The fold reads the CURRENT aggregate snapshot, merges the batch's
  signed deltas (counts integer, sums exact DECIMAL — common.py
  conventions), and commits the result as the NEXT version with the
  applied batch_id recorded in a ledger file INSIDE the snapshot commit.
* Idempotence: a replayed batch_id is detected from the current
  snapshot's ledger and skipped — the versioned pointer swap is atomic,
  so a crash between write and swap leaves the old version current and
  the replay applies cleanly. This is exactly-once maintenance on top of
  at-least-once delivery.

At scale the per-batch work is one small groupBy over the micro-batch
plus a keyed outer merge against the aggregate table — the unchanged
bulk of the FACTS is never touched (the aggregate is the only state), so
throughput is bounded by change volume, not table size.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import versioned
from ..operators.common import DEC

_LEDGER = "_applied_batches.json"


def encode_ledger(ids: set[int]) -> list[list[int]]:
    """Applied-batch ids as sorted inclusive [lo, hi] ranges. foreachBatch
    ids are sequential, so the applied set is a contiguous prefix (plus at
    most a replay frontier) and the encoded form is O(1) ranges — storing
    the flat id list made every ledger commit rewrite O(batches) bytes,
    O(batches^2) over a stream's lifetime: the same quadratic-maintenance
    genus as the r10 pairs-snapshot debt, just in metadata. (The
    in-memory set is still O(batches); at the daily-shard cadence the
    sinks model, that is thousands of ints over years — the stored-bytes
    quadratic was the part that compounded.)"""
    out: list[list[int]] = []
    for b in sorted(ids):
        if out and b == out[-1][1] + 1:
            out[-1][1] = b
        else:
            out.append([b, b])
    return out


def decode_ledger(raw) -> set[int]:
    """Inverse of encode_ledger; also accepts the pre-r11 flat id list so
    existing ledgers keep reading."""
    ids: set[int] = set()
    for item in raw:
        if isinstance(item, int):
            ids.add(item)
        else:
            lo, hi = item
            ids.update(range(lo, hi + 1))
    return ids


def _applied_batches(table_dir: str) -> set[int]:
    """Applied-batch ids from the CURRENT snapshot's ledger. A committed
    version without a readable ledger is corruption, not an empty set —
    silently returning empty would re-fold every replayed batch and break
    the exactly-once contract, so it raises instead. The only empty-set
    case is a table with no committed version at all. A version seeded by
    a plain ``write_version`` (no ledger yet) is declared by the sink via
    ``seed_ledger`` before streaming starts."""
    v = versioned.current_version(table_dir)
    if v is None:
        return set()
    path = os.path.join(table_dir, f"v{v}", _LEDGER)
    try:
        with open(path) as fh:
            return decode_ledger(json.load(fh))
    except (OSError, ValueError) as exc:
        raise RuntimeError(
            f"maintenance table {table_dir} v{v} has no readable batch "
            f"ledger ({exc}); refusing to fold (replays would double-apply)."
            " If this version was seeded outside the sink, call"
            " seed_ledger(table_dir) first."
        ) from exc


def _has_ledger(version_dir: str) -> bool:
    """Adoption validator for ledgered sinks (versioned.adopt_orphan): a
    pointerless complete snapshot is only adoptable if it carries a
    readable applied-batch ledger — proof it was committed by this commit
    protocol, so the per-batch replay check keeps the fold exactly-once
    after adoption. Anything else is foreign data and adopt_orphan raises."""
    try:
        with open(os.path.join(version_dir, _LEDGER)) as fh:
            ledger = json.load(fh)
        if not isinstance(ledger, list):
            return False
        return all(
            isinstance(b, int)
            or (
                isinstance(b, list)
                and len(b) == 2
                and all(isinstance(x, int) for x in b)
            )
            for b in ledger
        )
    except (OSError, ValueError):
        return False


def seed_ledger(table_dir: str) -> None:
    """Attach an empty applied-batch ledger to the current snapshot of a
    table seeded by a plain ``write_version`` (e.g. an initial aggregate
    computed in batch), marking it as a maintenance table from this
    version onward. Idempotent."""
    v = versioned.current_version(table_dir)
    if v is None:
        raise FileNotFoundError(f"no committed version in {table_dir}")
    path = os.path.join(table_dir, f"v{v}", _LEDGER)
    if not os.path.exists(path):
        # write-then-rename (the versioned.py pointer protocol): a crash
        # mid-write must not leave a truncated ledger — the exists() check
        # above would then treat the wedge as done and _applied_batches
        # would raise on every subsequent fold
        tmp = path + ".tmp"
        with open(tmp, "w") as fh:
            json.dump([], fh)
        os.replace(tmp, path)


def maintenance_sink(
    table_dir: str,
    group_cols: list[str],
    value_col: str,
    keep_last: int | None = None,
):
    """Build the foreachBatch function: fold signed CDC deltas into the
    versioned aggregate at ``table_dir`` (schema: group_cols + n +
    sum_dec), exactly once per batch_id.

    ``keep_last``: retention window — after each commit, vacuum snapshot
    versions older than the most recent ``keep_last`` (time travel keeps
    working within the window). Default None keeps ALL versions, which on
    a long-lived stream accumulates one full aggregate snapshot per batch
    — fine for bounded replays and tests, but a production deployment
    should set a window (VERDICT r10 task 7: nothing scheduled the
    offline ``versioned.vacuum`` otherwise). The vacuum runs after the
    pointer swap, so a crash between commit and vacuum just leaves extra
    history for the next batch's sweep. With readers concurrent to the
    stream, use ``keep_last >= 2``: at 1, the version a reader resolved
    from the pointer can be vacuumed the moment the next batch commits —
    the same one-commit race the dedup index's deferred GC gives a grace
    window for."""
    if keep_last is not None and keep_last < 1:
        # validate at WIRING time: versioned.vacuum would raise the same
        # complaint, but only after the first batch's commit — the stream
        # would then advance exactly one ledgered batch per restart
        # forever (commit, crash in vacuum, replay no-op, repeat on the
        # next batch). keep_last=0 is a plausible misreading of the
        # sibling dedup sink's compact_every=0 "disable" convention; the
        # disable spelling here is keep_last=None.
        raise ValueError(
            f"keep_last must be >= 1 or None (None keeps all versions), "
            f"got {keep_last}"
        )

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        # crashed-in-the-commit-window recovery: adopt a pointerless
        # complete snapshot ONLY if it carries this sink's applied-batch
        # ledger; the replay check below then keeps the fold exactly-once
        versioned.adopt_orphan(table_dir, validate=_has_ledger)
        applied = _applied_batches(table_dir)
        if batch_id in applied:
            return  # replay of an already-folded batch: no-op
        spark = batch_df.sparkSession
        sign = (
            F.when(F.col("change_type").isin("added", "changed_new"), 1)
            .when(F.col("change_type").isin("removed", "changed_old"), -1)
            .otherwise(0)
        )
        delta = (
            batch_df.withColumn("sign", sign)
            .groupBy(*group_cols)
            .agg(
                F.sum("sign").cast("bigint").alias("d_n"),
                F.sum(F.col("sign") * F.col(value_col).cast(DEC)).alias("d_sum"),
            )
        )
        cur = versioned.current_version(table_dir)
        if cur is None:
            merged = delta.select(
                *group_cols,
                F.col("d_n").alias("n"),
                F.col("d_sum").cast("decimal(22,4)").alias("sum_dec"),
            )
        else:
            old = versioned.read_version(spark, table_dir, cur)
            merged = old.join(delta, group_cols, "full_outer").select(
                *group_cols,
                (
                    F.coalesce(F.col("n"), F.lit(0))
                    + F.coalesce(F.col("d_n"), F.lit(0))
                )
                .cast("bigint")
                .alias("n"),
                (
                    F.coalesce(F.col("sum_dec"), F.lit(0).cast(DEC))
                    + F.coalesce(F.col("d_sum"), F.lit(0).cast(DEC))
                )
                .cast("decimal(22,4)")
                .alias("sum_dec"),
            )
        merged = merged.filter(F.col("n") > 0)

        def commit_ledger(vdir: str) -> None:
            with open(os.path.join(vdir, _LEDGER), "w") as fh:
                json.dump(encode_ledger(applied | {batch_id}), fh)

        # ledger lands inside v{N} BEFORE the pointer swap: the data and
        # the applied-batch set commit atomically together, so a crash at
        # any point either exposes the old (version, ledger) pair or the
        # new one — never data without its ledger
        versioned.write_version(merged, table_dir, pre_commit=commit_ledger)
        if keep_last is not None:
            versioned.vacuum(table_dir, keep_last)

    return sink


def start_maintenance_query(
    spark: SparkSession,
    changes_dir: str,
    schema,
    table_dir: str,
    group_cols: list[str],
    value_col: str,
    checkpoint_dir: str,
    keep_last: int | None = None,
):
    """Wire a file-source change feed into the maintenance sink (bounded
    by availableNow, like the other streaming queries in this package)."""
    feed = (
        spark.readStream.schema(schema)
        # one file per micro-batch: the fold is exercised incrementally
        # (availableNow honors the read limit and still terminates)
        .option("maxFilesPerTrigger", 1)
        .parquet(changes_dir)
    )
    return (
        feed.writeStream.foreachBatch(
            maintenance_sink(table_dir, group_cols, value_col, keep_last=keep_last)
        )
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
