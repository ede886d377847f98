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
    """A snapshot directory collision (simulated failed writer) must not
    advance the pointer — readers keep seeing the last committed version."""
    import os

    import pytest

    tbl = str(tmp_path / "tbl")
    df = spark.range(0, 5).select("id")
    versioned.write_version(df, tbl)
    # simulate a concurrent/failed writer that already created v2's dir
    os.makedirs(os.path.join(tbl, "v2"))
    with pytest.raises(Exception):
        versioned.write_version(df, tbl)
    assert versioned.current_version(tbl) == 1
    assert versioned.read_version(spark, tbl).count() == 5
