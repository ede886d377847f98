"""Deterministic weighted sampling: top-k by integer hash-priority, the
weighted sibling of the uniform md5-threshold samplers in sampling.py.

Priority sampling (Duffield-Lund-Thorup shape): each row draws a
pseudo-random priority that grows with its weight, and the sample is the
top-k by priority — heavier rows are proportionally likelier to be kept,
yet membership is a pure function of (key, weight): reproducible across
runs, engines, and partitionings, like every other sampler here.

Exactness: the textbook form uses u^(1/w) (floats, engine-divergent);
this implementation uses the integer surrogate
``priority = (w * 2^40) div (h48 + 1)`` with h48 = first 48 md5 bits of
the key — order-equivalent to w/u for uniform u, and bigint end-to-end
(max w=4096 * 2^40 ~ 4.5e15 < 2^63). Ties break on event_id, a total
order.

Scale: one scan computing the priority inside codegen, one top-k window
per stratum (rank cutoff bounds the per-partition sort) — the same shape
as sampling.events_hash_topk_sample.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from .common import t

from .sketches import _kv_int_sql

_K = 50
_POW2 = 1 << 40
# integer weight from the event's value: milli-scaled, floor 1 so every
# row has nonzero mass (value is bounded small in the fixture). floor()
# before the bigint cast: DuckDB's double->BIGINT cast ROUNDS while
# Spark's truncates — floor puts both on the same integer.
_W_SPARK = "GREATEST(CAST(floor(value * 1000) AS BIGINT), CAST(1 AS BIGINT))"
_W_DUCK = "GREATEST(CAST(floor(value * 1000) AS BIGINT), 1)"


def _h48_sql(key_cast: str) -> str:
    """First 48 md5 bits of the salted key as a bigint — the SHARED
    nibble-polynomial helper from sketches.py (one spelling of the
    hex-to-int technique across the repo), dialect-neutral because
    position(IN) parses in both engines."""
    return _kv_int_sql(f"md5('w:' || {key_cast})")


def events_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per event_type: the k highest-priority events under value-weighted
    priority sampling, with the priority surfaced for auditability."""
    ev = t(spark, sf_dir, "events_ms").select("event_type", "event_id", "value")
    pri = F.expr(
        f"CAST(({_W_SPARK}) * {_POW2} AS BIGINT) div "
        f"(({_h48_sql('CAST(event_id AS STRING)')}) + 1)"
    )
    w = W.partitionBy("event_type").orderBy(
        F.desc("priority"), F.asc("event_id")
    )
    return (
        ev.withColumn("priority", pri)
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= _K)
        .select(
            "event_type",
            F.col("rk").cast("int").alias("rk"),
            "event_id",
            "priority",
        )
    )


_H48_DUCK = _h48_sql("CAST(event_id AS VARCHAR)")

ORACLE_WEIGHTED = f"""
SELECT event_type, CAST(rk AS INTEGER) AS rk, event_id, priority
FROM (
  SELECT event_type, event_id,
         CAST(({_W_DUCK}) * {_POW2} AS BIGINT) // (({_H48_DUCK}) + 1) AS priority,
         row_number() OVER (
           PARTITION BY event_type
           ORDER BY CAST(({_W_DUCK}) * {_POW2} AS BIGINT) // (({_H48_DUCK}) + 1) DESC,
                    event_id
         ) AS rk
  FROM events_ms
)
WHERE rk <= {_K}
"""


QUERIES: dict[str, tuple] = {
    "events_weighted_sample": (events_weighted_sample, ORACLE_WEIGHTED),
}
