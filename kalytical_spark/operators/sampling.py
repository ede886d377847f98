"""Deterministic sampling operators for training-data pipelines: balanced
(inverse-frequency) stratified sampling, exact-k per-stratum sampling, and
reproducible train/val/test splits.

Random sampling (``df.sample``, ``rand()``) is banned in this engine: it
is irreproducible across runs/engines and unauditable. Every selection
here is a pure function of the row key — ``md5(key)`` compared against an
integer-derived hex threshold — so the same row lands in the same sample
on Spark, on DuckDB, and on any re-run at any parallelism. That is what a
100 TB curation pipeline needs: a sample you can re-materialize, diff, and
audit months later.

The reference has no sampling surface (its data plane is Mongo lookups,
src/kalytical/core/data_provider.py); this family is part of the
LLM-pipeline extension mandated by the build brief.

Scale notes:
* The per-stratum count/threshold table is a few rows — broadcast to the
  scan; the filter is then embarrassingly parallel (no shuffle besides
  the final small rollup). At 100 TB the sample predicate runs inside the
  scan stage.
* Exact-k per stratum uses a window top-k (TakeOrdered-like per key) —
  the k x strata result is tiny; the sort is bounded per partition by the
  window's rank cutoff.
* Hash-threshold comparisons stay in the hex-string domain (md5 prefix vs
  ``%07x``-formatted threshold) — lexicographic order on lowercase hex ==
  numeric order, identical in both engines, no float rates anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from .common import t

# Balanced sample: aim for TARGET rows per stratum; strata smaller than
# TARGET are kept whole. Threshold = floor(TARGET * 16^7 / total_n)
# compared against the first 7 hex chars of md5(event_id).
_TARGET = 1000
_HEX_SPACE = 16**7  # 268435456


def events_balanced_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverse-frequency stratified sample of the event log: each
    event_type is downsampled toward ``_TARGET`` rows via a deterministic
    md5-prefix threshold, so hot types shrink and rare types survive —
    the class-balancing step of a training-data pipeline. Returns the
    per-stratum audit row (total, threshold, achieved sample size)."""
    ev = t(spark, sf_dir, "events_ms").select("event_type", "event_id")
    cnts = ev.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("total_n")
    )
    thr = cnts.withColumn(
        "thr",
        F.expr(f"CAST({_TARGET} AS BIGINT) * {_HEX_SPACE} div total_n"),
    )
    keep = (F.col("total_n") <= _TARGET) | (
        F.substring(F.md5(F.col("event_id").cast("string")), 1, 7)
        < F.format_string("%07x", F.col("thr"))
    )
    return (
        ev.join(F.broadcast(thr), "event_type")
        .filter(keep)
        .groupBy("event_type", "total_n", "thr")
        .agg(F.count("*").cast("bigint").alias("sample_n"))
    )


ORACLE_BALANCED_SAMPLE = f"""
WITH cnts AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS total_n
  FROM events_ms GROUP BY 1
), thr AS (
  SELECT event_type, total_n,
         CAST(CAST({_TARGET} AS BIGINT) * {_HEX_SPACE} // total_n AS BIGINT)
           AS thr
  FROM cnts
)
SELECT e.event_type, t.total_n, t.thr,
       CAST(COUNT(*) AS BIGINT) AS sample_n
FROM events_ms e JOIN thr t ON e.event_type = t.event_type
WHERE t.total_n <= {_TARGET}
   OR substring(md5(CAST(e.event_id AS VARCHAR)), 1, 7) < printf('%07x', t.thr)
GROUP BY 1, 2, 3
"""


_K = 50


def events_hash_topk_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-k deterministic sample: per event_type, the ``_K`` rows with
    the smallest (md5(event_id), event_id) — a reproducible 'reservoir'
    whose membership is stable under re-runs and engine changes. The
    window's rank cutoff keeps the per-partition sort bounded."""
    ev = t(spark, sf_dir, "events_ms").select("event_type", "event_id")
    h = F.md5(F.col("event_id").cast("string"))
    w = W.partitionBy("event_type").orderBy(h.asc(), F.col("event_id").asc())
    return (
        ev.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= _K)
        .select("event_type", "event_id", F.col("rk").cast("int").alias("rk"))
    )


ORACLE_HASH_TOPK = f"""
SELECT event_type, event_id, CAST(rk AS INTEGER) AS rk
FROM (
  SELECT event_type, event_id,
         row_number() OVER (
           PARTITION BY event_type
           ORDER BY md5(CAST(event_id AS VARCHAR)), event_id
         ) AS rk
  FROM events_ms
)
WHERE rk <= {_K}
"""


# Split boundaries on the first two hex chars of md5(key): ~80/10/10.
_TRAIN_HI = "cc"  # 204/256 = 79.7%
_VAL_HI = "e6"  # 230/256 = 89.8%


def events_train_val_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reproducible train/val/test assignment (~80/10/10) from the md5 of
    the row key — the split a training pipeline must be able to
    re-materialize exactly. Returns per (event_type, split) counts; the
    assignment itself is the WHERE-able expression, not a stored column."""
    ev = t(spark, sf_dir, "events_ms").select("event_type", "event_id")
    b = F.substring(F.md5(F.col("event_id").cast("string")), 1, 2)
    split = (
        F.when(b < _TRAIN_HI, F.lit("train"))
        .when(b < _VAL_HI, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return (
        ev.withColumn("split", split)
        .groupBy("event_type", "split")
        .agg(F.count("*").cast("bigint").alias("n"))
    )


ORACLE_SPLIT = f"""
SELECT event_type,
       CASE WHEN substring(md5(CAST(event_id AS VARCHAR)), 1, 2) < '{_TRAIN_HI}'
              THEN 'train'
            WHEN substring(md5(CAST(event_id AS VARCHAR)), 1, 2) < '{_VAL_HI}'
              THEN 'val'
            ELSE 'test' END AS split,
       CAST(COUNT(*) AS BIGINT) AS n
FROM events_ms
GROUP BY 1, 2
"""


QUERIES: dict[str, tuple] = {
    "events_balanced_sample": (events_balanced_sample, ORACLE_BALANCED_SAMPLE),
    "events_hash_topk_sample": (events_hash_topk_sample, ORACLE_HASH_TOPK),
    "events_train_val_test_split": (
        events_train_val_test_split,
        ORACLE_SPLIT,
    ),
}
