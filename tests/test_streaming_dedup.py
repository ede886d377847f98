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


def test_in_sink_tiered_compaction_e2e(spark):
    """Drain 16 one-file shards with compact_every=4 (default tier
    policy): the sink's own periodic size-tiered compactions fire four
    times mid-stream, and the final pair snapshot must still equal the
    monolithic batch mine exactly. Covers the in-sink path end-to-end —
    the main equivalence test's 4 batches never reach the default
    compaction cadence."""
    n_shards = 16
    docs = t(spark, SF_ORACLE, "documents")
    with tempfile.TemporaryDirectory() as tmp:
        src = os.path.join(tmp, "shards")
        for i in range(n_shards):
            docs.filter(F.col("doc_id") % n_shards == i).coalesce(1).write.mode(
                "append"
            ).parquet(src)
        index_dir = os.path.join(tmp, "index")
        q = dedup_maintenance.start_dedup_maintenance_query(
            spark, src, docs.schema, index_dir, os.path.join(tmp, "ckpt"),
            compact_every=4,
        )
        try:
            assert q.awaitTermination(600)
        finally:
            q.stop()
        got = _pairs(
            versioned.read_version(spark, os.path.join(index_dir, "pairs")).collect()
        )
        want = _pairs(dedup.dedup_minhash_lsh(spark, SF_ORACLE).collect())
        assert got == want and len(got) > 0
        # compaction actually fired: c-segments exist in the live view
        live = dedup_maintenance._live_dirs(
            spark, os.path.join(index_dir, "bands")
        )
        assert any(os.path.basename(d).startswith("c") for d in live), live


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
        # min_members=2: two similar-sized deltas share a tier, so the
        # tiered policy folds them (defaults would wait for 4 members)
        assert dedup_maintenance.compact_dedup_index(spark, ix, min_members=2) > 0
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


def _stub_applied(index_dir: str, ids) -> None:
    """Fabricate the pairs-ledger view compact_dedup_index consults, so
    compaction policy can be exercised without running the (expensive)
    mine per batch — the policy only needs to know which batch ids are
    applied."""
    import json

    pdir = os.path.join(index_dir, "pairs", "v1")
    os.makedirs(pdir, exist_ok=True)
    with open(os.path.join(index_dir, "pairs", "_latest"), "w") as fh:
        fh.write("1")
    with open(os.path.join(pdir, "_applied_batches.json"), "w") as fh:
        json.dump(sorted(ids), fh)


def _drain_with_policy(spark, tmp: str, name: str, n_batches: int, **compact_kw):
    """Write n_batches equal-sized band deltas, compacting every 4 with
    the given policy; returns (bytes written by compaction, stored rows)."""
    index_dir = os.path.join(tmp, name)
    rows_per_batch = 5000
    stats: dict = {}
    for i in range(n_batches):
        # distinct ids + incompressible md5 band keys: segment BYTE size
        # stays linear in rows, so the size-tier bucketing behaves as it
        # would on real data (tiny constant deltas are metadata-dominated
        # and would all collapse into one byte-size tier)
        delta = spark.range(i * rows_per_batch, (i + 1) * rows_per_batch).selectExpr(
            "id AS doc_id",
            "CAST(1 AS BIGINT) AS n_sh",
            "'0' AS band_idx",
            "md5(CAST(id AS STRING)) AS band_key",
        ).coalesce(1)
        delta.write.mode("overwrite").parquet(
            dedup_maintenance._delta_dir(index_dir, "bands", i)
        )
        _stub_applied(index_dir, range(i + 1))
        if (i + 1) % 4 == 0:
            dedup_maintenance.compact_dedup_index(
                spark, index_dir, stats=stats, **compact_kw
            )
    rows = dedup_maintenance._stored(spark, index_dir, "bands").count()
    return stats.get("bytes_written", 0), rows


def test_tiered_compaction_write_amplification(spark):
    """The size-tiered policy must rewrite each row O(log N) times over a
    long drain — materially less write I/O than the r9 fold-everything
    policy (recovered here as min_members=2 + one giant tier), at an
    identical stored view."""
    N = 64
    with tempfile.TemporaryDirectory() as tmp:
        full_bytes, full_rows = _drain_with_policy(
            spark, tmp, "full", N, min_members=2, fanout=2**60
        )
        tier_bytes, tier_rows = _drain_with_policy(spark, tmp, "tiered", N)
        assert tier_rows == full_rows == 5000 * N
        # fold-everything rewrites the whole index every 4 batches
        # (quadratic); tiered folds each row ~log_4 times. At 64 batches
        # the analytic ratio is ~2.8x and grows with N — assert the
        # measured separation with headroom for parquet size noise.
        assert full_bytes > 2 * tier_bytes, (full_bytes, tier_bytes)
        # tiered view must stay bounded: live segments O(min_members*logN)
        live = dedup_maintenance._live_dirs(
            spark, os.path.join(tmp, "tiered", "bands")
        )
        assert len(live) <= 8, live


def test_manifest_commit_is_crash_safe(spark):
    """Versioned-manifest protocol: the store is never manifest-less
    mid-commit. A crashed rename leaves the old version readable; a crash
    after the rename (before old-version GC) leaves two versions and the
    reader takes the highest; the next commit sweeps stale versions."""
    import json

    with tempfile.TemporaryDirectory() as tmp:
        root = os.path.join(tmp, "bands")
        os.makedirs(root)
        m1 = dedup_maintenance._write_manifest(
            spark, root, {"version": 0, "next_id": 1, "segments": ["c0"], "replaced": []}
        )
        assert m1["version"] == 1
        assert dedup_maintenance._read_manifest(spark, root)["segments"] == ["c0"]

        # crash BEFORE rename: a tmp file must be invisible to readers
        with open(os.path.join(root, "_segments.v2.json.tmp"), "w") as fh:
            json.dump({"segments": ["cBAD"]}, fh)
        assert dedup_maintenance._read_manifest(spark, root)["segments"] == ["c0"]

        # crash AFTER rename, before old-version GC: both versions on
        # disk, reader takes the highest
        with open(os.path.join(root, "_segments.v2.json"), "w") as fh:
            json.dump(
                {"version": 2, "next_id": 2, "segments": ["c1"], "replaced": []}, fh
            )
        got = dedup_maintenance._read_manifest(spark, root)
        assert got["segments"] == ["c1"] and got["version"] == 2
        assert os.path.exists(os.path.join(root, "_segments.v1.json"))

        # next commit GCs every stale version and becomes the only one
        m3 = dedup_maintenance._write_manifest(spark, root, got)
        assert m3["version"] == 3
        names = [n for n in os.listdir(root) if n.startswith("_segments.v")]
        assert names == ["_segments.v3.json"], names


def test_compaction_sweep_clears_crashed_gc_leftovers(spark):
    """Crash window between the manifest flip and the replaced-list
    prune: replaced b-dirs may survive on disk (invisible) with the
    manifest still listing them. The next compaction's sweep must delete
    them, prune the list, and leave the view untouched."""
    import json

    with tempfile.TemporaryDirectory() as tmp:
        index_dir = os.path.join(tmp, "ix")
        root = os.path.join(index_dir, "bands")
        delta = spark.range(100).selectExpr(
            "id AS doc_id", "CAST(1 AS BIGINT) AS n_sh",
            "'0' AS band_idx", "id AS band_key"
        ).coalesce(1)
        # b0 was folded into c0 but its GC crashed; b1 is live
        for name in ("b0", "b1", "c0"):
            delta.write.mode("overwrite").parquet(os.path.join(root, name))
        dedup_maintenance._write_manifest(
            spark, root,
            {"version": 0, "next_id": 1, "segments": ["c0"], "replaced": ["b0"]},
        )
        _stub_applied(index_dir, [0, 1])
        view_before = dedup_maintenance._live_dirs(spark, root)
        assert [os.path.basename(d) for d in view_before] == ["c0", "b1"]

        # only 2 live segments, different tiers impossible here — defaults
        # won't fold, but the sweep must still run
        dedup_maintenance.compact_dedup_index(spark, index_dir)
        assert not os.path.exists(os.path.join(root, "b0"))
        manifest = dedup_maintenance._read_manifest(spark, root)
        assert manifest["replaced"] == [] and manifest["segments"] == ["c0"]
        assert dedup_maintenance._live_dirs(spark, root) == view_before


def test_legacy_manifest_is_refused(spark):
    """A pre-r10 single-file _segments.json must fail loudly: silently
    ignoring it would drop its compacted segments from the read view and
    the next compaction sweep would GC them (unrecoverable data loss)."""
    import json

    import pytest

    with tempfile.TemporaryDirectory() as tmp:
        root = os.path.join(tmp, "bands")
        os.makedirs(root)
        with open(os.path.join(root, "_segments.json"), "w") as fh:
            json.dump({"segments": ["c0"], "replaced": []}, fh)
        with pytest.raises(RuntimeError, match="legacy"):
            dedup_maintenance._read_manifest(spark, root)


def test_delta_file_fanout_is_bounded(spark):
    """Both per-batch delta writes must land at most _DELTA_PARTITIONS
    data files (the shingle delta by explicit repartition, the band delta
    structurally via the reused doc_id hash partitioning) — the stored
    index is re-read every batch, so per-delta file fan-out is the
    footer-bound failure mode the knob exists to prevent (ADVICE r9)."""
    docs = t(spark, SF_ORACLE, "documents")
    with tempfile.TemporaryDirectory() as tmp:
        ix = os.path.join(tmp, "ix")
        dedup_maintenance.dedup_index_sink(ix, compact_every=0)(docs, 0)
        for kind in ("bands", "shingles"):
            d = os.path.join(ix, kind, "b0")
            files = [f for f in os.listdir(d) if f.endswith(".parquet")]
            assert 1 <= len(files) <= dedup_maintenance._DELTA_PARTITIONS, (
                kind,
                files,
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
