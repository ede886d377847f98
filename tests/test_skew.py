"""Tests for the salted dimension join: the salt actually appears in the
shuffle-join keys (the whole point), replication covers every salt, and
the chunk manifest tiles each asset exactly."""

from __future__ import annotations

from pyspark.sql import functions as F

from kalytical_spark.operators import multimodal, skew
from tests.conftest import SF_ORACLE


def test_salted_join_shuffles_on_salt(spark):
    df = skew.events_salted_dim_join(spark, SF_ORACLE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "ShuffledHashJoin" in plan or "SortMergeJoin" in plan, (
        "the salted join must exercise the shuffle path, not broadcast"
    )
    assert "salt" in plan, "salt must be part of the join keys"


def test_salted_join_spreads_hot_key(spark):
    """Each user's events distribute across multiple salt values — the
    straggler-splitting property."""
    ev = (
        spark.read.parquet(f"{SF_ORACLE}/events.parquet")
        .select("event_id", "user_id")
        .withColumn(
            "salt",
            F.pmod(F.crc32(F.col("event_id").cast("string")), F.lit(skew._R)),
        )
    )
    spread = ev.groupBy("user_id").agg(
        F.countDistinct("salt").alias("n_salts"), F.count("*").alias("n")
    )
    hottest = spread.orderBy(F.desc("n"), "user_id").limit(5).collect()
    assert hottest and hottest[0].n >= skew._R, (
        "fixture should contain users with more events than salts"
    )
    for r in hottest:
        assert r.n_salts >= skew._R // 2, (
            f"user {r.user_id}: {r.n}-event key only spread over "
            f"{r.n_salts}/{skew._R} salts"
        )


def test_chunk_manifest_tiles_exactly(spark):
    rows = multimodal.mm_chunk_manifest(spark, SF_ORACLE).collect()
    assert rows
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    for doc_id, chunks in by_doc.items():
        chunks.sort(key=lambda r: r.chunk_idx)
        assert [c.chunk_idx for c in chunks] == list(range(len(chunks)))
        # contiguous non-overlapping coverage
        pos = 0
        for c in chunks:
            assert c.offset == pos
            assert 0 < c.length <= multimodal._CHUNK_BYTES
            pos += c.length
        # every chunk but the last is full-size
        assert all(
            c.length == multimodal._CHUNK_BYTES for c in chunks[:-1]
        ), doc_id
