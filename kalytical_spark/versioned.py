"""Versioned parquet tables: snapshot writes, time-travel reads, and
version diffs — the lakehouse-lite slice of Delta/Iceberg semantics that
needs no table-format jars, built from primitives Spark always has:
immutable version directories plus an atomically-renamed pointer file.

Semantics:
* ``write_version`` never mutates existing data — each snapshot lands in
  its own ``v<N>`` directory, then the ``_latest`` pointer is swapped by
  an atomic rename. Readers never observe a half-written snapshot: they
  either see the old pointer or the new one (the same commit protocol a
  table format's metadata swap uses, minus the manifest layer).
* ``read_version`` with no version reads the current pointer; pinning a
  version is time travel. Old snapshots remain readable until vacuumed.
* ``diff_versions`` is a keyed FULL OUTER join of two snapshots — the
  added / removed / changed row sets (CDC between snapshots). At scale
  both sides are parquet scans joined on the table key; nothing is
  collected.

The reference has no table-format surface (Mongo upserts in place,
data_provider.py); this generalizes the engine's rewrite-based mutation
family (operators/mutations.py) with history.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_POINTER = "_latest"


def _version_dir(table_dir: str, version: int) -> str:
    return os.path.join(table_dir, f"v{version}")


def current_version(table_dir: str) -> int | None:
    try:
        with open(os.path.join(table_dir, _POINTER)) as fh:
            return int(fh.read().strip())
    except (OSError, ValueError):
        return None


def _uncommitted_versions(table_dir: str, cur: int | None) -> list[int]:
    floor = cur if cur is not None else 0
    try:
        listing = os.listdir(table_dir)
    except OSError:
        return []
    return [
        int(d[1:])
        for d in listing
        if d.startswith("v") and d[1:].isdigit() and int(d[1:]) > floor
    ]


def _commit_pointer(table_dir: str, version: int) -> None:
    """Atomically swap the pointer to ``version`` (write-then-rename)."""
    tmp = os.path.join(table_dir, f"{_POINTER}.tmp.{version}")
    with open(tmp, "w") as fh:
        fh.write(str(version))
    os.replace(tmp, os.path.join(table_dir, _POINTER))


def adopt_orphan(table_dir: str, validate=None) -> int | None:
    """Pointer-missing auto-recovery for sinks that can prove a
    committed-looking orphan is safely adoptable: when the pointer is
    unreadable but a complete snapshot (``_SUCCESS`` present) exists —
    a commit that crashed in the window between the parquet write and the
    pointer rename — commit the pointer to the HIGHEST complete orphan and
    return its version (incomplete orphans above it are left for
    ``write_version``'s normal sweep). Returns None when there is nothing
    to adopt (pointer readable, or no complete orphan).

    ``validate(version_dir)`` must return True for the orphan to be
    adopted; on False this raises (foreign data — wiping OR adopting could
    both be wrong, a human decides). Pass validate=None ONLY for sinks
    whose fold is idempotent (e.g. the HLL MAX-merge): re-folding the
    replayed batch on top of the adopted snapshot reaches the same
    fixpoint, so blind adoption cannot double-count. Non-idempotent sinks
    pass a validator proving the orphan carries their own commit protocol
    (e.g. the applied-batch ledger sidecar), whose replay check then
    supplies exactly-once.
    """
    if current_version(table_dir) is not None:
        return None
    complete = sorted(
        v
        for v in _uncommitted_versions(table_dir, None)
        if os.path.exists(os.path.join(_version_dir(table_dir, v), "_SUCCESS"))
    )
    if not complete:
        return None
    v = complete[-1]
    vdir = _version_dir(table_dir, v)
    if validate is not None and not validate(vdir):
        raise RuntimeError(
            f"{table_dir} has a committed-looking orphan v{v} that failed "
            "the sink's adoption check; refusing to adopt or wipe — recover "
            f"manually (inspect {vdir}, then write the version number to "
            f"{os.path.join(table_dir, _POINTER)} to adopt, or delete the "
            "directory to replay)"
        )
    _commit_pointer(table_dir, v)
    return v


def write_version(df: DataFrame, table_dir: str, pre_commit=None) -> int:
    """Write ``df`` as the next snapshot and atomically swap the pointer.
    Returns the new version number.

    ``pre_commit(version_dir)``, when given, runs after the parquet write
    but BEFORE the pointer swap, so sidecar files (e.g. an idempotence
    ledger) are part of the same atomic commit: a reader that sees the new
    pointer always sees the sidecars, and a crash before the swap leaves
    the old version current with its own sidecars intact.

    The immediate-next version directory, when present, is the
    uncommitted leftover of a crashed write (single-writer protocol); it
    is removed so a replayed commit applies cleanly instead of hitting
    ``errorifexists``. ONLY that one directory is ever purged: deleting
    every v > pointer would turn two recoverable conditions into data
    loss — an unreadable pointer file (current_version() returns None,
    which must NOT be read as "empty table" when snapshots exist; the
    pointer is reconstructible from max(v)) and a concurrent writer's
    in-flight directory. Writers are single-process by contract
    (streaming sinks serialize through foreachBatch).

    Pointer-missing recovery distinguishes two cases by inspecting the
    orphan directories themselves: a snapshot directory WITHOUT parquet's
    ``_SUCCESS`` marker is a crashed in-flight write (e.g. the very first
    commit died mid-``df.write``) — those are swept and the replayed
    commit proceeds from v1, which is exactly the recovery contract the
    streaming sinks rely on ("replay the batch"). A directory WITH
    ``_SUCCESS`` is committed-looking history whose pointer was lost or
    corrupted; wiping it would be data loss, so that case raises and asks
    for explicit pointer recovery instead.

    The heuristic is only sound if committed snapshots always HAVE the
    marker, so that precondition is enforced at write time below: a
    deployment with success markers disabled
    (``mapreduce.fileoutputcommitter.marksuccessfuljobs=false``) fails its
    first commit with a clear error instead of silently creating history
    the recovery path would later mistake for a crashed write.
    """
    import shutil

    os.makedirs(table_dir, exist_ok=True)
    cur = current_version(table_dir)
    if cur is None:
        orphans = _uncommitted_versions(table_dir, None)
        complete = [
            v
            for v in orphans
            if os.path.exists(os.path.join(_version_dir(table_dir, v), "_SUCCESS"))
        ]
        if complete:
            raise RuntimeError(
                f"{table_dir} has complete snapshot directories "
                f"(v{sorted(complete)}) but no readable {_POINTER} pointer; "
                "refusing to write (recover the pointer from the highest "
                "complete version instead of wiping history: "
                "adopt_orphan(table_dir) if the fold is idempotent or the "
                f"orphan passes your sink's validator, or write the version "
                f"number to {os.path.join(table_dir, _POINTER)} manually)"
            )
        for v in orphans:  # crashed first write(s): no complete snapshot exists
            shutil.rmtree(_version_dir(table_dir, v), ignore_errors=True)
    nxt = 1 if cur is None else cur + 1
    shutil.rmtree(_version_dir(table_dir, nxt), ignore_errors=True)
    vdir = _version_dir(table_dir, nxt)
    df.write.mode("errorifexists").parquet(vdir)
    if not os.path.exists(os.path.join(vdir, "_SUCCESS")):
        raise RuntimeError(
            f"{vdir} was written without a _SUCCESS marker "
            "(mapreduce.fileoutputcommitter.marksuccessfuljobs disabled?); "
            "versioned tables require markers — pointer-loss recovery "
            "distinguishes committed snapshots from crashed writes by them"
        )
    if pre_commit is not None:
        pre_commit(vdir)
    _commit_pointer(table_dir, nxt)  # atomic commit
    return nxt


def read_version(
    spark: SparkSession, table_dir: str, version: int | None = None
) -> DataFrame:
    """Read the pinned snapshot (time travel) or the current one."""
    v = current_version(table_dir) if version is None else version
    if v is None:
        raise FileNotFoundError(f"no committed version in {table_dir}")
    return spark.read.parquet(_version_dir(table_dir, v))


def compact_version(
    spark: SparkSession, table_dir: str, target_files: int
) -> int:
    """Compact the current snapshot's small files into ``target_files``
    parquet files and commit the result as a NEW version (the original
    snapshot stays readable — compaction is just another snapshot write,
    so time travel and concurrent readers are untouched). Sidecar files
    committed alongside the current snapshot (``_*.json``, e.g. the
    maintenance ledger) are carried forward so compaction never drops
    table-level state. At scale this is the bin-packing maintenance job
    that keeps scan task counts sane after many incremental writes."""
    import shutil

    cur_v = current_version(table_dir)
    cur = read_version(spark, table_dir, cur_v)
    cur_dir = _version_dir(table_dir, cur_v)

    def carry_sidecars(vdir: str) -> None:
        for fname in os.listdir(cur_dir):
            if fname.startswith("_") and fname.endswith(".json"):
                shutil.copyfile(
                    os.path.join(cur_dir, fname), os.path.join(vdir, fname)
                )

    return write_version(
        cur.coalesce(target_files), table_dir, pre_commit=carry_sidecars
    )


def vacuum(table_dir: str, keep_last: int) -> list[int]:
    """Delete snapshot directories older than the ``keep_last`` most
    recent versions (never the pointer target). Returns the removed
    version numbers. The window is the retention contract: time travel
    keeps working for every retained version."""
    import shutil

    if keep_last < 1:
        # versions[-0:] would slice the WHOLE list and silently keep
        # everything; a retention window below 1 is a caller bug
        raise ValueError(f"keep_last must be >= 1, got {keep_last}")
    cur = current_version(table_dir)
    if cur is None:
        return []
    versions = sorted(
        int(d[1:])
        for d in os.listdir(table_dir)
        if d.startswith("v") and d[1:].isdigit()
    )
    keep = set(versions[-keep_last:]) | {cur}
    removed = []
    for v in versions:
        if v not in keep:
            shutil.rmtree(_version_dir(table_dir, v))
            removed.append(v)
    return removed


def diff_versions(
    spark: SparkSession, table_dir: str, v_old: int, v_new: int, key: str
) -> DataFrame:
    """CDC between snapshots: one row per changed key with change_type in
    ('added', 'removed', 'changed'). Unchanged rows are dropped by a
    whole-row fingerprint comparison, so the diff never materializes the
    common bulk of the table beyond the join itself."""
    old = read_version(spark, table_dir, v_old)
    new = read_version(spark, table_dir, v_new)
    cols = [c for c in old.columns if c != key]
    fp = F.md5(F.to_json(F.struct(*[F.col(c) for c in sorted(cols)])))
    o = old.select(F.col(key).alias("k"), fp.alias("old_fp"))
    n = new.select(F.col(key).alias("k"), fp.alias("new_fp"))
    joined = o.join(n, "k", "full_outer")
    change = (
        F.when(F.col("old_fp").isNull(), F.lit("added"))
        .when(F.col("new_fp").isNull(), F.lit("removed"))
        .when(F.col("old_fp") != F.col("new_fp"), F.lit("changed"))
    )
    return (
        joined.select(F.col("k").alias(key), change.alias("change_type"))
        .filter(F.col("change_type").isNotNull())
    )
