"""Physical-layout toolkit for cluster scale: bucketed tables (co-located
joins with no shuffle) and hash-salted joins (skew mitigation) — the two
techniques SURVEY.md section 4.2 calls out as 'we choose layout'.

At 100 TB these are the difference between a join that shuffles the fact
table every query and one that never does: bucket the fact tables on their
join key at ingest, broadcast true dims, salt only the keys AQE's skew
handling can't fix (e.g. a single hot pipeline_uuid in the event log).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_col: str,
    n_buckets: int = 8,
    sort_col: str | None = None,
) -> None:
    """Persist a table bucketed (and optionally sorted) by its join key; a
    later join of two tables bucketed the same way needs no Exchange."""
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table_name}")
    # a stale location without catalog metadata (fresh session, old warehouse
    # dir) still blocks saveAsTable — clear it
    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    stale = os.path.join(warehouse, table_name.lower())
    if os.path.isdir(stale):
        shutil.rmtree(stale, ignore_errors=True)
    writer = df.write.mode("overwrite").bucketBy(n_buckets, bucket_col)
    if sort_col:
        writer = writer.sortBy(sort_col)
    writer.saveAsTable(table_name)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, key: str
) -> DataFrame:
    """Join two same-bucketed tables on the bucket key (shuffle-free)."""
    return spark.table(left_table).join(spark.table(right_table), key)


def salted_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the left side's hot keys spread across n_salts
    sub-partitions. The right side replicates each row n_salts times
    (explode over the salt range); the left side derives its salt
    deterministically from a hash of the whole row, so the result is
    row-for-row identical to the plain join while the shuffle spreads a
    skewed key over n_salts reducers.

    Use when one side has a pathological hot key; AQE's skew-join splitting
    handles moderate skew automatically, but a single key holding >1 task's
    worth of build-side rows still needs salting.

    Only inner and left joins preserve plain-join semantics: under
    right/full-outer, unmatched right rows would surface once per salt."""
    if how not in ("inner", "left", "left_outer", "leftouter"):
        raise ValueError(f"salted_join supports inner/left joins only, got {how!r}")
    salt = F.pmod(F.hash(F.struct(*[F.col(c) for c in left.columns])), F.lit(n_salts))
    left_s = left.withColumn("__salt", salt)
    right_s = right.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    out = left_s.join(right_s, [key, "__salt"], how)
    return out.drop("__salt")


def morton_key(x: F.Column, y: F.Column, bits: int = 8) -> F.Column:
    """Interleave the low ``bits`` of two integer bucket columns into a
    Morton (Z-order) key — pure shiftleft/AND/OR expressions, fully
    codegen'd. Rows close in Z are close in BOTH dimensions, so range
    partitioning by the key gives every output file a compact (x, y)
    rectangle and min/max file stats prune two-dimensional predicates —
    the multi-dim clustering trick single-column sorting cannot deliver."""
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = z.bitwiseOR(
            F.shiftleft(x.cast("long").bitwiseAND(F.lit(1 << i)), i + 1)
        ).bitwiseOR(F.shiftleft(y.cast("long").bitwiseAND(F.lit(1 << i)), i))
    return z


def write_zordered(
    df: DataFrame,
    path: str,
    x_col: str,
    y_col: str,
    n_files: int = 16,
    bits: int = 8,
) -> None:
    """Write ``df`` as parquet clustered on the Z-order of two columns:
    each column is min/max-scaled into 2^bits rank buckets, the Morton key
    range-partitions the write, and files are sorted within partitions so
    row groups inherit the locality. The scaling stats are one tiny
    aggregate broadcast back over the corpus — at 100 TB this is a single
    extra scan before the clustered write."""
    stats = df.select(
        F.min(x_col).alias("xmn"),
        F.max(x_col).alias("xmx"),
        F.min(y_col).alias("ymn"),
        F.max(y_col).alias("ymx"),
    )
    top = (1 << bits) - 1

    def bucket(c, mn, mx):
        span = F.greatest(F.col(mx) - F.col(mn), F.lit(1))
        scaled = (((F.col(c) - F.col(mn)) * (top + 1)) / span).cast("long")
        return F.least(F.lit(top).cast("long"), scaled)

    keyed = df.crossJoin(F.broadcast(stats)).withColumn(
        "__z", morton_key(bucket(x_col, "xmn", "xmx"), bucket(y_col, "ymn", "ymx"), bits)
    )
    # repartitionByRange estimates its boundaries from a per-partition
    # SAMPLE (default 100 rows); at that size the file edges wobble between
    # runs, which both blurs the clustering and made the layout test flaky.
    # A larger sample makes the boundaries effectively exact; restore the
    # session's setting afterwards.
    spark = df.sparkSession
    conf_key = "spark.sql.execution.rangeExchange.sampleSizePerPartition"
    prev = spark.conf.get(conf_key, None)
    spark.conf.set(conf_key, "5000")
    try:
        (
            keyed.repartitionByRange(n_files, "__z")
            .sortWithinPartitions("__z")
            .drop("xmn", "xmx", "ymn", "ymx", "__z")
            .write.mode("overwrite")
            .parquet(path)
        )
    finally:
        if prev is not None:
            spark.conf.set(conf_key, prev)
        else:
            spark.conf.unset(conf_key)
