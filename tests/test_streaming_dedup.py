"""Streaming incremental dedup maintenance (streaming/dedup_maintenance.py):
draining a sharded corpus through the foreachBatch delta-LSH sink must
land the verified-pair store exactly on the monolithic batch mine
(dedup_minhash_lsh), pair-for-pair and jaccard-bit-for-bit; replays of an
applied batch must be exact no-ops; a crash between the index append and
the pair commit must converge on replay; and per-batch pair I/O must be
O(|delta pairs|), not O(total pairs) (the r10 full-snapshot rewrite)."""

from __future__ import annotations

import json
import os
import tempfile

import pytest
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
    arrives, so the drained store == the full batch mine (same ints,
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

        got = _pairs(dedup_maintenance.read_pairs(spark, index_dir).collect())
        want = _pairs(dedup.dedup_minhash_lsh(spark, SF_ORACLE).collect())
        assert got == want
        assert len(got) > 0, "fixture corpus must contain near-dup pairs"

        # one pair delta dir per micro-batch, every batch ledgered in the
        # manifest (ledger and segment list commit in ONE rename)
        applied = dedup_maintenance._applied(spark, index_dir)
        assert applied == set(range(N_SHARDS))
        pair_dirs = dedup_maintenance._live_dirs(
            spark, os.path.join(index_dir, "pairs")
        )
        assert len(pair_dirs) == N_SHARDS

        # replaying an applied batch is an exact no-op (exactly-once):
        # no new manifest version, identical pairs
        v_before = dedup_maintenance._read_manifest(
            spark, os.path.join(index_dir, "pairs")
        )["version"]
        sink = dedup_maintenance.dedup_index_sink(index_dir)
        batch0 = spark.read.parquet(src).filter(
            F.col("doc_id") % N_SHARDS == 0
        )
        sink(batch0, max(applied))
        assert (
            dedup_maintenance._read_manifest(
                spark, os.path.join(index_dir, "pairs")
            )["version"]
            == v_before
        )
        assert _pairs(dedup_maintenance.read_pairs(spark, index_dir).collect()) == want


def test_in_sink_tiered_compaction_e2e(spark):
    """Drain 16 one-file shards with compact_every=4 (default tier
    policy): the sink's own periodic size-tiered compactions fire four
    times mid-stream, and the final pair store must still equal the
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
        got = _pairs(dedup_maintenance.read_pairs(spark, index_dir).collect())
        want = _pairs(dedup.dedup_minhash_lsh(spark, SF_ORACLE).collect())
        assert got == want and len(got) > 0
        # compaction actually fired: c-segments exist in the live view
        live = dedup_maintenance._live_dirs(
            spark, os.path.join(index_dir, "bands")
        )
        assert any(os.path.basename(d).startswith("c") for d in live), live
        # and the ledger survived the pairs-store folds verbatim
        assert dedup_maintenance._applied(spark, index_dir) == set(range(n_shards))


def test_compaction_preserves_view_and_results(spark):
    """Folding applied batches' delta dirs into one manifest-committed
    segment must keep the stored band/shingle/pair views row-identical,
    keep later batches' mining results identical, and make a crashed
    compaction (segment written, manifest unflipped) an exact no-op."""
    docs = t(spark, SF_ORACLE, "documents")
    shards = [docs.filter(F.col("doc_id") % N_SHARDS == i) for i in range(N_SHARDS)]
    with tempfile.TemporaryDirectory() as tmp:
        # reference: no compaction
        ref_ix = os.path.join(tmp, "ref")
        ref_sink = dedup_maintenance.dedup_index_sink(ref_ix, compact_every=0)
        for i, b in enumerate(shards):
            ref_sink(b, i)
        want = _pairs(dedup_maintenance.read_pairs(spark, ref_ix).collect())

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
            for kind in ("bands", "shingles", "pairs")
        }
        # min_members=2: two similar-sized deltas share a tier, so the
        # tiered policy folds them (defaults would wait for 4 members)
        assert dedup_maintenance.compact_dedup_index(spark, ix, min_members=2) > 0
        for kind in ("bands", "shingles"):
            root = os.path.join(ix, kind)
            dirs = dedup_maintenance._live_dirs(spark, root)
            assert len(dirs) == 1 and os.path.basename(dirs[0]).startswith("c")
            # DEFERRED GC: folded b-dirs survive the flip (invisible —
            # in-flight readers get a compaction cycle of grace) and the
            # NEXT compaction's entry sweep removes them from disk
            assert [d for d in os.listdir(root) if d.startswith("b")]
        dedup_maintenance.compact_dedup_index(spark, ix, min_members=2)
        for kind in ("bands", "shingles"):
            root = os.path.join(ix, kind)
            assert not [d for d in os.listdir(root) if d.startswith("b")]
            assert dedup_maintenance._read_manifest(spark, root)["replaced"] == []
        for kind in ("bands", "shingles", "pairs"):
            after = sorted(
                tuple(r)
                for r in dedup_maintenance._stored(spark, ix, kind).collect()
            )
            assert after == before[kind]
        assert dedup_maintenance._applied(spark, ix) == {0, 1}
        sink(shards[2], 2)
        sink(shards[3], 3)
        got = _pairs(dedup_maintenance.read_pairs(spark, ix).collect())
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


def _stub_applied(spark, index_dir: str, ids) -> None:
    """Fabricate the pairs-manifest ledger compact_dedup_index consults,
    so compaction policy can be exercised without running the (expensive)
    mine per batch — the policy only needs to know which batch ids are
    applied."""
    root = os.path.join(index_dir, "pairs")
    m = dedup_maintenance._read_manifest(spark, root)
    dedup_maintenance._write_manifest(spark, root, {**m, "applied": sorted(ids)})


def _drain_with_policy(spark, tmp: str, name: str, n_batches: int, **compact_kw):
    """Write n_batches equal-sized band deltas, compacting every 4 with
    the given policy; returns (bytes written by compaction, stored rows)."""
    index_dir = os.path.join(tmp, name)
    rows_per_batch = 5000
    stats: dict = {}
    for i in range(n_batches):
        # distinct ids + incompressible md5-derived keys: segment BYTE
        # size stays linear in rows, so the size-tier bucketing behaves as
        # it would on real data (tiny constant deltas are
        # metadata-dominated and would all collapse into one byte-size
        # tier)
        delta = spark.range(i * rows_per_batch, (i + 1) * rows_per_batch).selectExpr(
            "id AS doc_id",
            "CAST(1 AS BIGINT) AS n_sh",
            "'0' AS band_idx",
            "xxhash64(CAST(id AS STRING)) AS band_key",
        ).coalesce(1)
        delta.write.mode("overwrite").parquet(
            dedup_maintenance._delta_dir(index_dir, "bands", i)
        )
        _stub_applied(spark, index_dir, range(i + 1))
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


def _dir_bytes(d: str) -> int:
    return sum(
        os.path.getsize(os.path.join(root, f))
        for root, _dirs, files in os.walk(d)
        for f in files
    )


def test_pairs_commit_write_amplification(spark):
    """Per-batch pair I/O must be O(|delta pairs|): a 64-batch drain
    through _commit_pairs (delta dirs + periodic tiered folds) must write
    materially fewer bytes than the r10 protocol, which committed
    old UNION new as a complete versioned snapshot every batch —
    O(batches x pairs) lifetime I/O (VERDICT r10 scale debt #2). Both
    sides are measured on identical per-batch deltas, and the segment
    store's final view must equal the union of all deltas exactly."""
    N = 64
    rows_per_batch = 2000

    def delta(i):
        return spark.range(i * rows_per_batch, (i + 1) * rows_per_batch).selectExpr(
            "id AS doc_a", "id + 1000000 AS doc_b", "0.75 AS jaccard"
        )

    with tempfile.TemporaryDirectory() as tmp:
        # r10 protocol: full snapshot per batch (versioned.write_version)
        old_root = os.path.join(tmp, "old_pairs")
        old_bytes = 0
        for i in range(N):
            cur = versioned.current_version(old_root)
            merged = (
                delta(i)
                if cur is None
                else versioned.read_version(spark, old_root, cur)
                .unionByName(delta(i))
                .distinct()
            )
            v = versioned.write_version(merged.coalesce(4), old_root)
            old_bytes += _dir_bytes(os.path.join(old_root, f"v{v}"))

        # r11 protocol: delta dirs + in-protocol tiered compaction
        ix = os.path.join(tmp, "ix")
        stats: dict = {}
        delta_bytes = []
        for i in range(N):
            dedup_maintenance._commit_pairs(spark, ix, i, delta(i), set(range(i)))
            # measured at write time — compaction folds + GCs these dirs
            delta_bytes.append(
                _dir_bytes(dedup_maintenance._delta_dir(ix, "pairs", i))
            )
            if (i + 1) % 4 == 0:
                dedup_maintenance.compact_dedup_index(spark, ix, stats=stats)
        new_bytes = sum(delta_bytes) + stats.get("bytes_written", 0)

        assert (
            dedup_maintenance.read_pairs(spark, ix).count() == N * rows_per_batch
        )
        # analytic ratio at N=64: full-snapshot ~ sum(i)/N = 32.5x the
        # delta volume vs ~1+log_4(N/4) ~ 3x for tiered deltas — assert
        # a wide separation with headroom for parquet overhead noise
        assert old_bytes > 4 * new_bytes, (old_bytes, new_bytes)
        # and the per-batch delta write really is delta-sized: every
        # delta dir within 3x the mean (no hidden full rewrites)
        assert max(delta_bytes) < 3 * (sum(delta_bytes) / len(delta_bytes))


def test_manifest_commit_is_crash_safe(spark):
    """Versioned-manifest protocol: the store is never manifest-less
    mid-commit. A crashed rename leaves the old version readable; a crash
    after the rename (before old-version GC) leaves two versions and the
    reader takes the highest; the next commit sweeps stale versions."""
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

        # next commit GCs stale versions with ONE version of grace (the
        # prior version survives so a reader's listed-highest can never
        # vanish between listStatus and open while the maintainer
        # commits); v1 — older than the grace window — is swept
        m3 = dedup_maintenance._write_manifest(spark, root, got)
        assert m3["version"] == 3
        names = sorted(n for n in os.listdir(root) if n.startswith("_segments.v"))
        assert names == ["_segments.v2.json", "_segments.v3.json"], names


def test_compaction_sweep_clears_crashed_gc_leftovers(spark):
    """Crash window between the manifest flip and the replaced-list
    prune: replaced b-dirs may survive on disk (invisible) with the
    manifest still listing them. The next compaction's sweep must delete
    them, prune the list, and leave the view untouched."""
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
        _stub_applied(spark, index_dir, [0, 1])
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
    with tempfile.TemporaryDirectory() as tmp:
        root = os.path.join(tmp, "bands")
        os.makedirs(root)
        with open(os.path.join(root, "_segments.json"), "w") as fh:
            json.dump({"segments": ["c0"], "replaced": []}, fh)
        with pytest.raises(RuntimeError, match="legacy"):
            dedup_maintenance._read_manifest(spark, root)


def test_string_band_keys_are_refused(spark):
    """A pre-r10 index that never compacted (b-dirs only, STRING band
    keys) passes the legacy-manifest check; without a schema gate it
    fails batches later with an opaque parquet type-conversion error when
    a BIGINT delta is unioned in (ADVICE r10). The stored read must raise
    the same rebuild-the-index message instead."""
    with tempfile.TemporaryDirectory() as tmp:
        ix = os.path.join(tmp, "ix")
        spark.range(10).selectExpr(
            "id AS doc_id", "CAST(1 AS BIGINT) AS n_sh",
            "'0' AS band_idx", "md5(CAST(id AS STRING)) AS band_key"
        ).coalesce(1).write.parquet(os.path.join(ix, "bands", "b0"))
        with pytest.raises(RuntimeError, match="band_key"):
            dedup_maintenance._stored(spark, ix, "bands")


def test_compaction_rejects_degenerate_policy(spark):
    """min_members=1 makes a 1-segment tier permanently 'full' — folding
    1 segment into 1 new segment never shrinks the eligible count and the
    compaction loop would never terminate (ADVICE r10). Reject at entry,
    fanout<2 likewise."""
    with tempfile.TemporaryDirectory() as tmp:
        with pytest.raises(ValueError, match="min_members"):
            dedup_maintenance.compact_dedup_index(
                spark, os.path.join(tmp, "ix"), min_members=1
            )
        with pytest.raises(ValueError, match="fanout"):
            dedup_maintenance.compact_dedup_index(
                spark, os.path.join(tmp, "ix"), fanout=1
            )


def test_migrate_versioned_pairs(spark):
    """A pre-r11 index (pairs as a versioned.py snapshot with a _latest
    pointer) must be refused loudly by every read path, and
    migrate_versioned_pairs must fold the snapshot + its ledger into the
    segment layout in place, after which ingest continues seamlessly."""
    with tempfile.TemporaryDirectory() as tmp:
        ix = os.path.join(tmp, "ix")
        pairs_root = os.path.join(ix, "pairs")
        old = spark.range(50).selectExpr(
            "id AS doc_a", "id + 100 AS doc_b", "0.9 AS jaccard"
        )

        def ledger(vdir):
            with open(os.path.join(vdir, "_applied_batches.json"), "w") as fh:
                json.dump([0, 1, 2], fh)

        versioned.write_version(old, pairs_root, pre_commit=ledger)

        with pytest.raises(RuntimeError, match="pre-r11"):
            dedup_maintenance.read_pairs(spark, ix)
        with pytest.raises(RuntimeError, match="pre-r11"):
            dedup_maintenance._applied(spark, ix)

        dedup_maintenance.migrate_versioned_pairs(spark, ix)
        got = {
            (r.doc_a, r.doc_b) for r in dedup_maintenance.read_pairs(spark, ix).collect()
        }
        assert got == {(i, i + 100) for i in range(50)}
        assert dedup_maintenance._applied(spark, ix) == {0, 1, 2}
        # rerun after completion is a no-op
        dedup_maintenance.migrate_versioned_pairs(spark, ix)
        assert dedup_maintenance._applied(spark, ix) == {0, 1, 2}
        # ingest continues on the migrated store: a later delta commit
        # appends and the ledger grows
        dedup_maintenance._commit_pairs(
            spark,
            ix,
            3,
            spark.range(5).selectExpr(
                "id + 900 AS doc_a", "id + 990 AS doc_b", "0.8 AS jaccard"
            ),
            dedup_maintenance._applied(spark, ix),
        )
        assert dedup_maintenance.read_pairs(spark, ix).count() == 55
        assert dedup_maintenance._applied(spark, ix) == {0, 1, 2, 3}


def test_delta_file_fanout_is_bounded(spark):
    """All three per-batch delta writes must land at most _DELTA_PARTITIONS
    data files (the shingle delta by explicit repartition, the band delta
    structurally via the reused doc_id hash partitioning, the pair delta
    by coalesce) — the stored index is re-read every batch, so per-delta
    file fan-out is the footer-bound failure mode the knob exists to
    prevent (ADVICE r9)."""
    docs = t(spark, SF_ORACLE, "documents")
    with tempfile.TemporaryDirectory() as tmp:
        ix = os.path.join(tmp, "ix")
        dedup_maintenance.dedup_index_sink(ix, compact_every=0)(docs, 0)
        for kind in ("bands", "shingles", "pairs"):
            d = os.path.join(ix, kind, "b0")
            files = [f for f in os.listdir(d) if f.endswith(".parquet")]
            assert 1 <= len(files) <= dedup_maintenance._DELTA_PARTITIONS, (
                kind,
                files,
            )


def test_crashed_batch_replay_converges(spark):
    """Crash seam: the index deltas (and possibly the pair delta) were
    written but the manifest flip never happened (the foreachBatch
    contract's replay case). Re-running the sink with the same batch must
    produce the same store a clean run would have — the delta x ALL mine
    is invariant to the delta already being visible in the stored index,
    and the pair delta dir is rewritten in place."""
    docs = t(spark, SF_ORACLE, "documents")
    b0 = docs.filter(F.col("doc_id") % 2 == 0)
    b1 = docs.filter(F.col("doc_id") % 2 == 1)
    with tempfile.TemporaryDirectory() as tmp:
        clean_ix = os.path.join(tmp, "clean")
        sink = dedup_maintenance.dedup_index_sink(clean_ix)
        sink(b0, 0)
        sink(b1, 1)
        want = _pairs(dedup_maintenance.read_pairs(spark, clean_ix).collect())

        crash_ix = os.path.join(tmp, "crashed")
        sink_c = dedup_maintenance.dedup_index_sink(crash_ix)
        sink_c(b0, 0)
        # simulate the crash: append batch 1's index deltas AND a poisoned
        # pair delta WITHOUT the manifest flip — exactly the widest state
        # a mid-batch failure can leave. The replay must overwrite the
        # poison with the true mine (delta-dir rewrite idempotence).
        delta_sh = dedup.shingles_from_docs(b1)
        delta_sh.write.mode("overwrite").parquet(
            dedup_maintenance._delta_dir(crash_ix, "shingles", 1)
        )
        dedup.banded_signatures(delta_sh).write.mode("overwrite").parquet(
            dedup_maintenance._delta_dir(crash_ix, "bands", 1)
        )
        spark.range(1).selectExpr(
            "-1 AS doc_a", "-2 AS doc_b", "0.99 AS jaccard"
        ).write.mode("overwrite").parquet(
            dedup_maintenance._delta_dir(crash_ix, "pairs", 1)
        )
        sink_c(b1, 1)  # the replay
        got = _pairs(dedup_maintenance.read_pairs(spark, crash_ix).collect())
        assert got == want


def test_reader_grace_across_compaction(spark):
    """Deferred GC contract: a reader that planned its scan over delta
    dirs before the maintainer folded them must still execute (the folded
    dirs are invisible to NEW readers but stay on disk for one compaction
    cycle); after the next cycle's sweep a fresh read plans over the
    segment and sees identical rows."""
    docs = t(spark, SF_ORACLE, "documents")
    with tempfile.TemporaryDirectory() as tmp:
        ix = os.path.join(tmp, "ix")
        sink = dedup_maintenance.dedup_index_sink(ix, compact_every=0)
        sink(docs.filter(F.col("doc_id") % 2 == 0), 0)
        sink(docs.filter(F.col("doc_id") % 2 == 1), 1)
        pre_planned = dedup_maintenance.read_pairs(spark, ix)  # plans over b0,b1
        want = _pairs(dedup_maintenance.read_pairs(spark, ix).collect())
        assert dedup_maintenance.compact_dedup_index(spark, ix, min_members=2) > 0
        # the fold flipped the manifest; the pre-planned scan's files are
        # deferred-GC'd, so executing it NOW still works and agrees
        assert _pairs(pre_planned.collect()) == want
        # next cycle sweeps the folded dirs; a fresh plan reads segments
        dedup_maintenance.compact_dedup_index(spark, ix, min_members=2)
        assert not [
            d for d in os.listdir(os.path.join(ix, "pairs")) if d.startswith("b")
        ]
        assert _pairs(dedup_maintenance.read_pairs(spark, ix).collect()) == want


def test_manifest_read_retries_when_listed_version_vanishes(spark, monkeypatch):
    """Multi-commit reader race: several manifest commits can land inside
    a slow reader's list-then-open window (a compaction call flips once
    per fold), so the listed-highest can be GC'd before the open. The
    read must re-list and converge on the new highest instead of raising
    FileNotFoundException."""
    with tempfile.TemporaryDirectory() as tmp:
        root = os.path.join(tmp, "pairs")
        os.makedirs(root)
        with open(os.path.join(root, "_segments.v7.json"), "w") as fh:
            json.dump(
                {"version": 7, "next_id": 1, "segments": ["c0"],
                 "replaced": [], "applied": [[0, 3]]}, fh
            )
        real = dedup_maintenance._manifest_versions
        calls = {"n": 0}

        def stale_once(sp, r, allow_legacy=False):
            calls["n"] += 1
            if calls["n"] == 1:
                # the reader's original listing saw v5, since GC'd
                return [5]
            return real(sp, r, allow_legacy)

        monkeypatch.setattr(dedup_maintenance, "_manifest_versions", stale_once)
        m = dedup_maintenance._read_manifest(spark, root)
        assert m["version"] == 7 and m["segments"] == ["c0"]
        assert calls["n"] >= 2  # the retry actually re-listed


def test_zero_pair_batches_commit_and_read(spark):
    """A batch with no near-dups must still commit (empty pair delta +
    ledger flip) and the union read must work over empty delta dirs —
    the empty-parquet seam (a 0-row write could in principle land no
    data files) must not break the store."""
    docs = t(spark, SF_ORACLE, "documents")
    with tempfile.TemporaryDirectory() as tmp:
        ix = os.path.join(tmp, "ix")
        sink = dedup_maintenance.dedup_index_sink(ix, compact_every=0)
        # every doc unique: texts disjoint by construction
        b0 = spark.createDataFrame(
            [(i, " ".join(f"tok{i}_{j}" for j in range(12))) for i in range(20)],
            "doc_id long, text string",
        ).withColumn("source", F.lit("s"))
        b1 = spark.createDataFrame(
            [(100 + i, " ".join(f"zz{i}_{j}" for j in range(12))) for i in range(20)],
            "doc_id long, text string",
        ).withColumn("source", F.lit("s"))
        sink(b0, 0)
        sink(b1, 1)
        assert dedup_maintenance._applied(spark, ix) == {0, 1}
        assert dedup_maintenance.read_pairs(spark, ix).count() == 0
        # compaction over empty deltas is also a no-crash path
        dedup_maintenance.compact_dedup_index(spark, ix, min_members=2)
        assert dedup_maintenance.read_pairs(spark, ix).count() == 0
