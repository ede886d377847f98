"""Streaming incremental dedup maintenance (streaming/dedup_maintenance.py):
draining a sharded corpus through the foreachBatch delta-LSH sink must
land the verified-pair snapshot exactly on the monolithic batch mine
(dedup_minhash_lsh), pair-for-pair and jaccard-bit-for-bit; replays of an
applied batch must be exact no-ops; and a crash between the index append
and the pair commit must converge on replay."""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

from kalytical_spark import versioned
from kalytical_spark.operators.common import t
from kalytical_spark.operators import dedup
from kalytical_spark.streaming import dedup_maintenance
from tests.conftest import SF_ORACLE

N_SHARDS = 4


def _sharded_docs(spark, tmp: str) -> tuple[str, object]:
    """The oracle corpus split into N_SHARDS one-file shards (each doc in
    exactly one shard) — the 'daily ingest' replay the sink drains one
    file per micro-batch."""
    docs = t(spark, SF_ORACLE, "documents")
    src = os.path.join(tmp, "doc_shards")
    for i in range(N_SHARDS):
        docs.filter(F.col("doc_id") % N_SHARDS == i).coalesce(1).write.mode(
            "append"
        ).parquet(src)
    return src, docs.schema


def _pairs(rows) -> dict[tuple[int, int], float]:
    return {(r.doc_a, r.doc_b): r.jaccard for r in rows}


def test_stream_dedup_equals_monolithic_mine(spark):
    """Every verified pair is mined at the batch where its later member
    arrives, so the drained snapshot == the full batch mine (same ints,
    same single IEEE division -> identical doubles)."""
    with tempfile.TemporaryDirectory() as tmp:
        src, schema = _sharded_docs(spark, tmp)
        index_dir = os.path.join(tmp, "index")
        q = dedup_maintenance.start_dedup_maintenance_query(
            spark, src, schema, index_dir, os.path.join(tmp, "ckpt")
        )
        try:
            assert q.awaitTermination(300)
        finally:
            q.stop()

        pairs_dir = os.path.join(index_dir, "pairs")
        got = _pairs(versioned.read_version(spark, pairs_dir).collect())
        want = _pairs(dedup.dedup_minhash_lsh(spark, SF_ORACLE).collect())
        assert got == want
        assert len(got) > 0, "fixture corpus must contain near-dup pairs"

        # one committed version per micro-batch, each ledgered
        from kalytical_spark.streaming.maintenance import _applied_batches

        applied = _applied_batches(pairs_dir)
        assert len(applied) == N_SHARDS
        assert versioned.current_version(pairs_dir) == N_SHARDS

        # replaying an applied batch is an exact no-op (exactly-once)
        sink = dedup_maintenance.dedup_index_sink(index_dir)
        batch0 = spark.read.parquet(src).filter(
            F.col("doc_id") % N_SHARDS == 0
        )
        sink(batch0, max(applied))
        assert versioned.current_version(pairs_dir) == N_SHARDS
        assert _pairs(versioned.read_version(spark, pairs_dir).collect()) == want


def test_compaction_preserves_view_and_results(spark):
    """Folding applied batches' delta dirs into one manifest-committed
    segment must keep the stored band/shingle view row-identical, keep
    later batches' mining results identical, and make a crashed compaction
    (segment written, manifest unflipped) an exact no-op."""
    docs = t(spark, SF_ORACLE, "documents")
    shards = [docs.filter(F.col("doc_id") % N_SHARDS == i) for i in range(N_SHARDS)]
    with tempfile.TemporaryDirectory() as tmp:
        # reference: no compaction
        ref_ix = os.path.join(tmp, "ref")
        ref_sink = dedup_maintenance.dedup_index_sink(ref_ix, compact_every=0)
        for i, b in enumerate(shards):
            ref_sink(b, i)
        want = _pairs(
            versioned.read_version(spark, os.path.join(ref_ix, "pairs")).collect()
        )

        # compacted mid-stream: after 2 batches, fold, then keep ingesting
        ix = os.path.join(tmp, "compacted")
        sink = dedup_maintenance.dedup_index_sink(ix, compact_every=0)
        sink(shards[0], 0)
        sink(shards[1], 1)
        before = {
            kind: sorted(
                tuple(r)
                for r in dedup_maintenance._stored(spark, ix, kind).collect()
            )
            for kind in ("bands", "shingles")
        }
        assert dedup_maintenance.compact_dedup_index(spark, ix) > 0
        for kind in ("bands", "shingles"):
            root = os.path.join(ix, kind)
            dirs = dedup_maintenance._live_dirs(spark, root)
            assert len(dirs) == 1 and os.path.basename(dirs[0]).startswith("c")
            # replaced b-dirs are gone from disk after GC
            assert not [d for d in os.listdir(root) if d.startswith("b")]
            after = sorted(
                tuple(r)
                for r in dedup_maintenance._stored(spark, ix, kind).collect()
            )
            assert after == before[kind]
        sink(shards[2], 2)
        sink(shards[3], 3)
        got = _pairs(
            versioned.read_version(spark, os.path.join(ix, "pairs")).collect()
        )
        assert got == want

        # crashed compaction: a c-dir written WITHOUT a manifest flip is
        # invisible — the view falls back to exactly the b-dirs
        crash_ix = os.path.join(tmp, "crash")
        csink = dedup_maintenance.dedup_index_sink(crash_ix, compact_every=0)
        csink(shards[0], 0)
        view0 = dedup_maintenance._live_dirs(spark, os.path.join(crash_ix, "bands"))
        bands = dedup_maintenance._stored(spark, crash_ix, "bands")
        bands.limit(1).write.mode("overwrite").parquet(
            os.path.join(crash_ix, "bands", "c_orphan")
        )
        assert (
            dedup_maintenance._live_dirs(spark, os.path.join(crash_ix, "bands"))
            == view0
        )


def test_crashed_batch_replay_converges(spark):
    """Crash seam: the index deltas were appended but the pair commit
    never happened (the foreachBatch contract's replay case). Re-running
    the sink with the same batch must produce the same snapshot a clean
    run would have — the delta x ALL mine is invariant to the delta
    already being visible in the stored index."""
    docs = t(spark, SF_ORACLE, "documents")
    b0 = docs.filter(F.col("doc_id") % 2 == 0)
    b1 = docs.filter(F.col("doc_id") % 2 == 1)
    with tempfile.TemporaryDirectory() as tmp:
        clean_ix = os.path.join(tmp, "clean")
        sink = dedup_maintenance.dedup_index_sink(clean_ix)
        sink(b0, 0)
        sink(b1, 1)
        want = _pairs(
            versioned.read_version(spark, os.path.join(clean_ix, "pairs")).collect()
        )

        crash_ix = os.path.join(tmp, "crashed")
        sink_c = dedup_maintenance.dedup_index_sink(crash_ix)
        sink_c(b0, 0)
        # simulate the crash: append batch 1's index deltas WITHOUT the
        # pair commit, exactly the state a mid-batch failure leaves
        delta_sh = dedup.shingles_from_docs(b1)
        delta_sh.write.mode("overwrite").parquet(
            dedup_maintenance._delta_dir(crash_ix, "shingles", 1)
        )
        dedup.banded_signatures(delta_sh).write.mode("overwrite").parquet(
            dedup_maintenance._delta_dir(crash_ix, "bands", 1)
        )
        sink_c(b1, 1)  # the replay
        got = _pairs(
            versioned.read_version(spark, os.path.join(crash_ix, "pairs")).collect()
        )
        assert got == want
