"""Streaming incremental near-dup maintenance: document shards arriving
as a stream, folded through ``foreachBatch`` into a maintained LSH index
(band table + shingle store) plus a ledgered, versioned verified-pair
table — the streaming twin of the batch delta mine in
operators/dedup_incremental.py, completing the incremental family
(the five monitors and the sketch sinks are already twinned; VERDICT r7
task 5 named this the one incremental operator without one).

Maintained state under ``index_dir``:

* ``bands/b<batch_id>/``    — (doc_id, n_sh, band_idx, band_key) delta
* ``shingles/b<batch_id>/`` — (doc_id, shingle) delta
* ``pairs/``                — versioned snapshot (doc_a, doc_b, jaccard)
                              with the applied-batch ledger INSIDE each
                              commit (streaming/maintenance.py protocol)

Per micro-batch (the production daily-ingest shape):

1. band + shingle the batch docs with the FULL mine's construction
   (dedup.shingles_from_docs / dedup.banded_signatures — shared code, so
   stream and batch can never band differently);
2. append both deltas as per-batch directories (``mode=overwrite`` into a
   batch-id-named dir: a replayed batch rewrites the same bytes, so the
   index append is idempotent without a ledger);
3. mine candidates as delta-bands x ALL-bands (the stored index including
   this delta) — never all x all. least/greatest normalization + distinct
   make the candidate set invariant to whether the delta was already
   visible in the stored index, which is exactly what makes a
   crashed-between-append-and-commit replay converge;
4. verify candidates against the shingle store (semi-join pruned to
   candidate docs, two hash joins + count — the dedup_incremental.py
   shape), filter at the shared LSH_VERIFY_THRESHOLD;
5. commit old-pairs UNION new-pairs as the next version of ``pairs/``
   with the batch id folded into the ledger pre-commit — exactly-once on
   top of the file source's at-least-once replay.

Equivalence contract (tests/test_streaming_dedup.py): any verified pair
(a, b) is mined exactly once — at the batch where its LATER member
arrives (both-in-batch pairs at that batch) — so after draining a
sharded corpus the pairs table equals the monolithic
``dedup_minhash_lsh`` mine value-for-value, jaccard doubles included
(same integer n_inter/n_a/n_b, same single IEEE division).

Scale: per-ingest cost is O(|delta| x band collision rate) — the stored
band table is probed on band_key (hash join), the unchanged bulk of the
corpus is never re-shingled, and the pair snapshot only grows by the
delta's verified pairs. The per-batch directories are the honest
append-only index shape (a real deployment would target partitioned
parquet or a table format; compaction of small per-batch files rides
versioned.compact_version, and the band/shingle stores can be compacted
offline without changing any batch's visible contents).

Reference parity: the reference's MQ poller consumes one message batch at
a time and upserts derived state per batch (mq_poller.py:21-44,
facade.py); this sink is that ingest loop re-expressed for the dedup
index, with the reference's at-most-once delete bug (mq_poller.py:30)
deliberately NOT reproduced — the ledger makes replays exact no-ops.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import versioned
from ..operators.dedup import (
    LSH_VERIFY_THRESHOLD,
    banded_signatures,
    shingles_from_docs,
)
from .maintenance import _applied_batches, _has_ledger

_BANDS = "bands"
_SHINGLES = "shingles"
_PAIRS = "pairs"


def _delta_dir(index_dir: str, kind: str, batch_id: int) -> str:
    return os.path.join(index_dir, kind, f"b{batch_id}")


def _stored(spark: SparkSession, index_dir: str, kind: str) -> DataFrame | None:
    """Union of every appended per-batch delta, or None before first
    ingest. Directory names are opaque (b<id>), so this is a plain
    recursive parquet read — no partition-column inference to collide
    with the delta schemas."""
    root = os.path.join(index_dir, kind)
    if not os.path.isdir(root):
        return None
    subdirs = [
        os.path.join(root, d)
        for d in sorted(os.listdir(root))
        if os.path.exists(os.path.join(root, d, "_SUCCESS"))
    ]
    if not subdirs:
        return None
    return spark.read.parquet(*subdirs)


def dedup_index_sink(index_dir: str):
    """Build the foreachBatch function that maintains the LSH index and
    the verified-pair snapshot at ``index_dir`` (module docstring for the
    full protocol)."""

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        pairs_dir = os.path.join(index_dir, _PAIRS)
        versioned.adopt_orphan(pairs_dir, validate=_has_ledger)
        applied = _applied_batches(pairs_dir)
        if batch_id in applied:
            return  # replayed, fully-committed batch: exact no-op

        # 1-2. band + shingle the delta with the full mine's construction,
        # then append idempotently (a replay rewrites the same per-batch dir)
        delta_sh = shingles_from_docs(batch_df)
        delta_sh.write.mode("overwrite").parquet(
            _delta_dir(index_dir, _SHINGLES, batch_id)
        )
        delta_sh = spark.read.parquet(_delta_dir(index_dir, _SHINGLES, batch_id))
        banded_signatures(delta_sh).write.mode("overwrite").parquet(
            _delta_dir(index_dir, _BANDS, batch_id)
        )

        # 3. delta x ALL candidate mine (stored index now includes the delta)
        all_bands = _stored(spark, index_dir, _BANDS)
        delta_bands = spark.read.parquet(_delta_dir(index_dir, _BANDS, batch_id))
        d, o = delta_bands.alias("d"), all_bands.alias("o")
        cand = (
            d.join(
                o,
                (F.col("d.band_idx") == F.col("o.band_idx"))
                & (F.col("d.band_key") == F.col("o.band_key"))
                & (F.col("d.doc_id") != F.col("o.doc_id")),
            )
            .select(
                F.least("d.doc_id", "o.doc_id").alias("doc_a"),
                F.greatest("d.doc_id", "o.doc_id").alias("doc_b"),
                F.least(
                    F.struct("d.doc_id", "d.n_sh"), F.struct("o.doc_id", "o.n_sh")
                )["n_sh"].alias("n_a"),
                F.greatest(
                    F.struct("d.doc_id", "d.n_sh"), F.struct("o.doc_id", "o.n_sh")
                )["n_sh"].alias("n_b"),
            )
            .distinct()
        )

        # 4. exact-Jaccard verification over candidate docs' shingles only
        all_sh = _stored(spark, index_dir, _SHINGLES)
        cand_ids = (
            cand.select(F.col("doc_a").alias("doc_id"))
            .union(cand.select(F.col("doc_b").alias("doc_id")))
            .distinct()
        )
        sh_c = all_sh.join(F.broadcast(cand_ids), "doc_id", "leftsemi")
        inter = (
            cand.select("doc_a", "doc_b")
            .join(sh_c.select(F.col("doc_id").alias("doc_a"), "shingle"), "doc_a")
            .join(
                sh_c.select(F.col("doc_id").alias("doc_b"), "shingle"),
                ["doc_b", "shingle"],
            )
            .groupBy("doc_a", "doc_b")
            .agg(F.count("*").alias("n_inter"))
        )
        new_pairs = (
            cand.join(inter, ["doc_a", "doc_b"])
            .withColumn(
                "jaccard",
                F.col("n_inter").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("n_inter")).cast("double"),
            )
            .filter(F.col("jaccard") >= LSH_VERIFY_THRESHOLD)
            .select("doc_a", "doc_b", "jaccard")
        )

        # 5. ledgered snapshot commit: pairs + applied-batch set, atomic
        cur = versioned.current_version(pairs_dir)
        if cur is None:
            merged = new_pairs
        else:
            # distinct guards the replay seam (a pair re-mined from a
            # crashed batch is already in the snapshot), not batch overlap
            merged = (
                versioned.read_version(spark, pairs_dir, cur)
                .unionByName(new_pairs)
                .distinct()
            )

        def commit_ledger(vdir: str) -> None:
            import json

            with open(os.path.join(vdir, "_applied_batches.json"), "w") as fh:
                json.dump(sorted(applied | {batch_id}), fh)

        versioned.write_version(merged, pairs_dir, pre_commit=commit_ledger)

    return sink


def start_dedup_maintenance_query(
    spark: SparkSession,
    docs_dir: str,
    schema,
    index_dir: str,
    checkpoint_dir: str,
):
    """Wire a file-source document feed into the dedup index sink, one
    shard file per micro-batch (availableNow, like the other sinks)."""
    feed = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(docs_dir)
    )
    return (
        feed.writeStream.foreachBatch(dedup_index_sink(index_dir))
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
