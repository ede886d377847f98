"""Versioned-table semantics: snapshot isolation (a pinned read never moves),
atomic pointer commits, and the keyed CDC diff between versions."""

from __future__ import annotations

from pyspark.sql import functions as F

from kalytical_spark import versioned


def test_write_read_time_travel(spark, tmp_path):
    tbl = str(tmp_path / "tbl")
    v1_df = spark.range(0, 10).select("id", F.lit("a").alias("val"))
    assert versioned.write_version(v1_df, tbl) == 1
    # v2: drop id 0-1, change id 2, add id 100
    v2_df = (
        spark.range(2, 10)
        .select("id", F.when(F.col("id") == 2, "CHANGED").otherwise("a").alias("val"))
        .unionByName(spark.range(100, 101).select("id", F.lit("a").alias("val")))
    )
    assert versioned.write_version(v2_df, tbl) == 2
    assert versioned.current_version(tbl) == 2
    # current read = v2; pinned read (time travel) = v1, unchanged by v2
    assert versioned.read_version(spark, tbl).count() == 9
    pinned = versioned.read_version(spark, tbl, 1)
    assert pinned.count() == 10
    assert {r.val for r in pinned.collect()} == {"a"}


def test_diff_versions_cdc(spark, tmp_path):
    tbl = str(tmp_path / "tbl")
    versioned.write_version(
        spark.range(0, 10).select("id", F.lit("a").alias("val")), tbl
    )
    versioned.write_version(
        spark.range(2, 10)
        .select("id", F.when(F.col("id") == 2, "CHANGED").otherwise("a").alias("val"))
        .unionByName(spark.range(100, 101).select("id", F.lit("a").alias("val"))),
        tbl,
    )
    diff = {
        (r.id, r.change_type)
        for r in versioned.diff_versions(spark, tbl, 1, 2, "id").collect()
    }
    assert diff == {
        (0, "removed"),
        (1, "removed"),
        (2, "changed"),
        (100, "added"),
    }


def test_failed_write_leaves_pointer_untouched(spark, tmp_path):
    """A commit that fails before the pointer swap (here: pre_commit
    raises after the parquet write) must not advance the pointer —
    readers keep seeing the last committed version — and the crashed
    attempt's leftover directory must not block the retry."""
    import os

    import pytest

    tbl = str(tmp_path / "tbl")
    df = spark.range(0, 5).select("id")
    versioned.write_version(df, tbl)

    def boom(vdir):
        raise OSError("disk gone")

    with pytest.raises(OSError):
        versioned.write_version(df, tbl, pre_commit=boom)
    assert versioned.current_version(tbl) == 1
    assert versioned.read_version(spark, tbl).count() == 5
    # the crashed v2 leftover exists but is uncommitted; the retry reclaims
    # the version number and commits cleanly
    assert os.path.isdir(os.path.join(tbl, "v2"))
    assert versioned.write_version(spark.range(0, 7).select("id"), tbl) == 2
    assert versioned.read_version(spark, tbl).count() == 7


def test_crashed_first_write_recovers(spark, tmp_path):
    """A first-ever commit that dies mid-parquet-write (no _SUCCESS, no
    pointer) must not wedge the table: the replayed commit sweeps the
    incomplete orphan and lands as v1 — the streaming sinks' 'replay the
    batch' recovery contract."""
    import os

    tbl = str(tmp_path / "tbl")
    orphan = os.path.join(tbl, "v1")
    os.makedirs(orphan)
    with open(os.path.join(orphan, "part-00000.parquet"), "wb") as fh:
        fh.write(b"torn write")  # no _SUCCESS marker: incomplete
    assert versioned.write_version(spark.range(0, 5).select("id"), tbl) == 1
    assert versioned.read_version(spark, tbl).count() == 5


def test_complete_snapshot_without_pointer_raises(spark, tmp_path):
    """A committed-looking snapshot (has _SUCCESS) with a lost pointer is
    recoverable history, not a crashed write — writing over it would be
    data loss, so write_version refuses."""
    import os

    import pytest

    tbl = str(tmp_path / "tbl")
    versioned.write_version(spark.range(0, 5).select("id"), tbl)
    os.remove(os.path.join(tbl, "_latest"))  # simulate pointer corruption
    with pytest.raises(RuntimeError, match="no readable"):
        versioned.write_version(spark.range(0, 9).select("id"), tbl)
    # history untouched: pinned read still works
    assert versioned.read_version(spark, tbl, 1).count() == 5


def test_adopt_orphan_recovers_commit_window_crash(spark, tmp_path):
    """A commit that crashed AFTER the parquet write completed (_SUCCESS
    present) but BEFORE the pointer rename leaves a committed-looking
    orphan; adopt_orphan commits the pointer to it instead of wedging."""
    import os

    tbl = str(tmp_path / "tbl")
    versioned.write_version(spark.range(0, 5).select("id"), tbl)
    os.remove(os.path.join(tbl, "_latest"))  # crash in the commit window
    assert versioned.adopt_orphan(tbl) == 1
    assert versioned.current_version(tbl) == 1
    assert versioned.read_version(spark, tbl).count() == 5
    # idempotent: nothing left to adopt, normal writes continue
    assert versioned.adopt_orphan(tbl) is None
    assert versioned.write_version(spark.range(0, 7).select("id"), tbl) == 2


def test_adopt_orphan_validator_gate(spark, tmp_path):
    """A validator that rejects the orphan turns adoption into an explicit
    raise (foreign data: neither adopt nor wipe silently); a passing
    validator adopts. Pointer present or no complete orphan -> no-op."""
    import os

    import pytest

    assert versioned.adopt_orphan(str(tmp_path / "nope")) is None
    tbl = str(tmp_path / "tbl")
    versioned.write_version(spark.range(0, 5).select("id"), tbl)
    assert versioned.adopt_orphan(tbl) is None  # pointer readable: no-op
    os.remove(os.path.join(tbl, "_latest"))
    with pytest.raises(RuntimeError, match="adoption check"):
        versioned.adopt_orphan(tbl, validate=lambda vdir: False)
    assert versioned.adopt_orphan(tbl, validate=os.path.isdir) == 1


def test_ledgered_sink_adopts_own_orphan(spark, tmp_path):
    """The maintenance-sink recovery path end-to-end: the CMS/maintenance
    commit protocol's ledger sidecar makes its own crashed commit
    adoptable, and the adopted ledger then dedupes the replayed batch
    (exactly-once survives the crash window)."""
    import os

    from kalytical_spark.streaming.maintenance import (
        _applied_batches,
        _has_ledger,
    )
    from kalytical_spark.streaming.sketches import cms_counter_sink

    tbl = str(tmp_path / "cms")
    sink = cms_counter_sink(tbl)
    batch = spark.range(0, 50).select((F.col("id") % 7).alias("user_id"))
    sink(batch, 0)
    committed = {
        (r.d, r.bucket): r.counter
        for r in versioned.read_version(spark, tbl).collect()
    }
    os.remove(os.path.join(tbl, "_latest"))  # crash in the commit window
    assert _has_ledger(os.path.join(tbl, "v1"))
    sink(batch, 0)  # at-least-once replay of the same batch
    assert versioned.current_version(tbl) == 1  # adopted, not re-folded
    assert _applied_batches(tbl) == {0}
    after = {
        (r.d, r.bucket): r.counter
        for r in versioned.read_version(spark, tbl).collect()
    }
    assert after == committed  # no double-count


def test_compact_preserves_rows_and_shrinks_files(spark, tmp_path):
    import glob

    tbl = str(tmp_path / "tbl")
    df = spark.range(0, 1000).select("id", (F.col("id") % 7).alias("grp"))
    versioned.write_version(df.repartition(16), tbl)
    before = glob.glob(f"{tbl}/v1/part-*.parquet")
    assert len(before) >= 16
    v = versioned.compact_version(spark, tbl, target_files=2)
    assert v == 2
    after = glob.glob(f"{tbl}/v2/part-*.parquet")
    assert len(after) <= 2
    # contents identical, original snapshot untouched (time travel intact)
    a = {(r.id, r.grp) for r in versioned.read_version(spark, tbl, 2).collect()}
    b = {(r.id, r.grp) for r in versioned.read_version(spark, tbl, 1).collect()}
    assert a == b and len(a) == 1000


def test_vacuum_retention_window(spark, tmp_path):
    tbl = str(tmp_path / "tbl")
    for i in range(4):
        versioned.write_version(
            spark.range(0, 10 + i).select("id"), tbl
        )
    removed = versioned.vacuum(tbl, keep_last=2)
    assert removed == [1, 2]
    # retained versions still time-travel; current pointer unaffected
    assert versioned.current_version(tbl) == 4
    assert versioned.read_version(spark, tbl, 3).count() == 12
    assert versioned.read_version(spark, tbl).count() == 13
    # vacuuming again is a no-op
    assert versioned.vacuum(tbl, keep_last=2) == []
    # keep_last=0 would slice versions[-0:] == everything and silently
    # keep all history; it must be rejected
    import pytest

    with pytest.raises(ValueError):
        versioned.vacuum(tbl, keep_last=0)


def test_schema_evolution_across_versions(spark, tmp_path):
    """Snapshots are independent parquet directories, so a version may add
    a column: the pinned read of each version returns exactly its own
    schema (no cross-version bleed), and the keyed diff between them
    treats every row as changed only when the comparison includes the new
    column's values."""
    from pyspark.sql import functions as F

    tbl = str(tmp_path / "tbl")
    v1 = spark.range(0, 6).select("id", F.lit("a").alias("val"))
    v2 = spark.range(0, 6).select(
        "id", F.lit("a").alias("val"), F.lit(1).alias("added")
    )
    assert versioned.write_version(v1, tbl) == 1
    assert versioned.write_version(v2, tbl) == 2
    assert versioned.read_version(spark, tbl, 1).columns == ["id", "val"]
    assert versioned.read_version(spark, tbl, 2).columns == ["id", "val", "added"]
    # current read follows the pointer and sees the evolved schema
    assert "added" in versioned.read_version(spark, tbl).columns
