"""Bitmap-index analytics: user-presence bitmaps as bit_or word
aggregates, with retention and cross-type overlap computed by popcount
intersection — the roaring-bitmap-style technique OLAP engines (Doris,
ClickHouse, Druid) use to make distinct-user set algebra cheap.

Why this scales: a day of activity per group compresses to
ceil(|users|/63) bigint words built by one map-side-combinable ``bit_or``
aggregate. Retention/funnel questions then become word-aligned
AND + ``bit_count`` over the (group, word) equi-join of two tiny register
tables — the raw event log is scanned ONCE to build the bitmaps and never
re-joined against itself (the naive retention self-join shuffles the
whole log twice). The event fixture's dense bigint user_ids map straight
to (word = id div 63, bit = id % 63); sparse key domains would add a
dictionary-encode step first (dense_rank over the user dim), same shape.

Everything is exact integer arithmetic (shiftleft/bit_or/bit_count —
identical semantics in Spark SQL and DuckDB), so the full family is
oracle-provable, unlike engine-private sketch types.

The reference has no set-algebra surface (runs are Mongo point lookups);
this extends the sketch family (sketches.py) with the EXACT-set sibling
of the HLL registers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .common import t

_WORD = 63  # not 64: DuckDB's checked << cannot form the bigint sign bit


def _day_word_masks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(event_type, day, w, mask): the per-day user-presence bitmap, one
    row per populated 63-bit word (63, not 64 — DuckDB's checked shift
    refuses `1::BIGINT << 63`, and a sign-bit mask would read as negative;
    63-bit words keep every mask positive in both engines)."""
    ev = t(spark, sf_dir, "events_ms").select(
        "event_type",
        F.date_trunc("day", F.col("ts")).cast("date").alias("day"),
        "user_id",
    )
    return (
        ev.select(
            "event_type",
            "day",
            F.expr(f"CAST(user_id div {_WORD} AS INT)").alias("w"),
            F.expr(
                f"shiftleft(CAST(1 AS BIGINT), CAST(user_id % {_WORD} AS INT))"
            ).alias("bit"),
        )
        .groupBy("event_type", "day", "w")
        .agg(F.expr("bit_or(bit)").alias("mask"))
    )


_SQL_DAY_MASKS = f"""
  SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
         CAST(user_id // {_WORD} AS INTEGER) AS w,
         bit_or(CAST(1 AS BIGINT) << CAST(user_id % {_WORD} AS INTEGER)) AS mask
  FROM events_ms
  GROUP BY 1, 2, 3
"""


def events_user_bitmap_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The bitmap register table itself: per (event_type, day) presence
    words with their popcounts — summing n_bits per group IS the exact
    daily-active-user count, no countDistinct shuffle of raw user ids."""
    return _day_word_masks(spark, sf_dir).select(
        "event_type",
        "day",
        "w",
        "mask",
        F.expr("CAST(bit_count(mask) AS INT)").alias("n_bits"),
    )


ORACLE_BITMAP_WORDS = f"""
SELECT event_type, day, w, mask, CAST(bit_count(mask) AS INTEGER) AS n_bits
FROM ({_SQL_DAY_MASKS})
"""


def events_bitmap_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-over-day retention per event_type: active users today, and how
    many of them return tomorrow — popcount(today AND tomorrow) over the
    word-aligned join of the two bitmap rows. The event log is never
    self-joined; only the word registers are."""
    masks = _day_word_masks(spark, sf_dir)
    a = masks.alias("a")
    b = masks.alias("b")
    joined = a.join(
        b,
        (F.col("a.event_type") == F.col("b.event_type"))
        & (F.col("a.w") == F.col("b.w"))
        & (F.col("b.day") == F.date_add(F.col("a.day"), 1)),
        "left",
    )
    return (
        joined.groupBy(
            F.col("a.event_type").alias("event_type"), F.col("a.day").alias("day")
        )
        .agg(
            F.expr("CAST(SUM(bit_count(a.mask)) AS BIGINT)").alias("n_active"),
            F.expr(
                "CAST(COALESCE(SUM(bit_count(a.mask & b.mask)), 0) AS BIGINT)"
            ).alias("n_retained_next"),
        )
    )


ORACLE_BITMAP_RETENTION = f"""
WITH masks AS ({_SQL_DAY_MASKS})
SELECT a.event_type, a.day,
       CAST(SUM(bit_count(a.mask)) AS BIGINT) AS n_active,
       CAST(COALESCE(SUM(bit_count(a.mask & b.mask)), 0) AS BIGINT)
         AS n_retained_next
FROM masks a
LEFT JOIN masks b
  ON a.event_type = b.event_type AND a.w = b.w
 AND b.day = a.day + INTERVAL 1 DAY
GROUP BY 1, 2
"""


# cross-type overlap: pinned pairs, the funnel question "who did A and B
# the same day" as one bitmap AND (type domain is fixture-stable)
_OVERLAP_PAIRS = [("click", "purchase"), ("view", "click"), ("signup", "purchase")]


def events_bitmap_type_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same-day cross-type user overlap for pinned (a, b) type pairs:
    popcount(mask_a AND mask_b) summed over words — the one-join funnel
    primitive (the distinct-join spelling shuffles users twice per pair)."""
    masks = _day_word_masks(spark, sf_dir)
    pairs = spark.createDataFrame(_OVERLAP_PAIRS, ["type_a", "type_b"])
    a = masks.alias("a")
    b = masks.alias("b")
    return (
        F.broadcast(pairs)
        .join(a, F.col("a.event_type") == F.col("type_a"))
        .join(
            b,
            (F.col("b.event_type") == F.col("type_b"))
            & (F.col("b.day") == F.col("a.day"))
            & (F.col("b.w") == F.col("a.w")),
        )
        .groupBy("type_a", "type_b", F.col("a.day").alias("day"))
        .agg(
            F.expr("CAST(SUM(bit_count(a.mask & b.mask)) AS BIGINT)").alias(
                "n_overlap"
            )
        )
        .filter(F.col("n_overlap") > 0)
    )


_PAIR_VALUES = ", ".join(f"('{x}', '{y}')" for x, y in _OVERLAP_PAIRS)

ORACLE_BITMAP_OVERLAP = f"""
WITH masks AS ({_SQL_DAY_MASKS}),
pairs(type_a, type_b) AS (VALUES {_PAIR_VALUES})
SELECT p.type_a, p.type_b, a.day,
       CAST(SUM(bit_count(a.mask & b.mask)) AS BIGINT) AS n_overlap
FROM pairs p
JOIN masks a ON a.event_type = p.type_a
JOIN masks b ON b.event_type = p.type_b AND b.day = a.day AND b.w = a.w
GROUP BY 1, 2, 3
HAVING SUM(bit_count(a.mask & b.mask)) > 0
"""


QUERIES: dict[str, tuple] = {
    "events_user_bitmap_words": (events_user_bitmap_words, ORACLE_BITMAP_WORDS),
    "events_bitmap_retention": (events_bitmap_retention, ORACLE_BITMAP_RETENTION),
    "events_bitmap_type_overlap": (
        events_bitmap_type_overlap,
        ORACLE_BITMAP_OVERLAP,
    ),
}
