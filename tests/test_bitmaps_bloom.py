"""Semantic tests for bitmap set-algebra and Bloom join pruning: bitmap
popcounts must equal the distinct-count ground truth, retention must match
the naive distinct-join spelling, and the Bloom filter must actually prune
(non-vacuous) while never dropping a true match."""

from __future__ import annotations

from pyspark.sql import functions as F

from kalytical_spark.operators import bitmaps, bloomjoin
from kalytical_spark.operators.common import t
from tests.conftest import SF_ORACLE


def test_bitmap_words_popcount_equals_distinct(spark):
    words = bitmaps.events_user_bitmap_words(spark, SF_ORACLE)
    via_bits = {
        (r.event_type, r.day): r.s
        for r in words.groupBy("event_type", "day")
        .agg(F.sum("n_bits").alias("s"))
        .collect()
    }
    truth = {
        (r.event_type, r.day): r.d
        for r in t(spark, SF_ORACLE, "events_ms")
        .select(
            "event_type",
            F.date_trunc("day", F.col("ts")).cast("date").alias("day"),
            "user_id",
        )
        .groupBy("event_type", "day")
        .agg(F.countDistinct("user_id").alias("d"))
        .collect()
    }
    assert via_bits == truth


def test_bitmap_retention_matches_distinct_join(spark):
    got = {
        (r.event_type, r.day): (r.n_active, r.n_retained_next)
        for r in bitmaps.events_bitmap_retention(spark, SF_ORACLE).collect()
    }
    ev = (
        t(spark, SF_ORACLE, "events_ms")
        .select(
            "event_type",
            F.date_trunc("day", F.col("ts")).cast("date").alias("day"),
            "user_id",
        )
        .distinct()
    )
    act = {
        (r.event_type, r.day): r.a
        for r in ev.groupBy("event_type", "day")
        .agg(F.count("*").alias("a"))
        .collect()
    }
    nxt = ev.select(
        "event_type", F.date_sub("day", 1).alias("day"), "user_id"
    )
    ret = {
        (r.event_type, r.day): r.r
        for r in ev.join(nxt, ["event_type", "day", "user_id"])
        .groupBy("event_type", "day")
        .agg(F.count("*").alias("r"))
        .collect()
    }
    naive = {k: (a, ret.get(k, 0)) for k, a in act.items()}
    assert got == naive
    assert any(r > 0 for _, r in got.values()), "retention must be non-vacuous"


def test_bloom_actually_prunes_and_loses_nothing(spark):
    ev = t(spark, SF_ORACLE, "lifecycle_events")
    pruned = bloomjoin.bloom_pruned_fact(spark, SF_ORACLE)
    total, kept = ev.count(), pruned.count()
    true_matches = ev.join(
        bloomjoin._selected_dims(spark, SF_ORACLE).select("pipeline_uuid"),
        "pipeline_uuid",
        "leftsemi",
    ).count()
    # every true match survives the filter...
    assert kept >= true_matches
    # ...and the filter genuinely prunes (way under the full scan; the
    # false-positive allowance is generous vs the ~1% expectation)
    assert kept <= true_matches + 0.1 * total, (total, kept, true_matches)
    assert kept < total


def test_bloom_join_equals_plain_join(spark):
    via_bloom = {
        tuple(r)
        for r in bloomjoin.events_bloom_pruned_join(spark, SF_ORACLE).collect()
    }
    dims = bloomjoin._selected_dims(spark, SF_ORACLE)
    plain = {
        tuple(r)
        for r in t(spark, SF_ORACLE, "lifecycle_events")
        .join(dims, "pipeline_uuid")
        .groupBy("pipeline_uuid", "engine", "schedule")
        .agg(
            F.count("*").cast("bigint").alias("n_events"),
            F.countDistinct("exec_uuid").cast("bigint").alias("n_execs"),
        )
        .collect()
    }
    assert via_bloom == plain and plain
