"""Skew-mitigated joins: salt-replicated dimension join whose RESULT is
provably identical to the plain join (the oracle runs the unsalted SQL).

The hot-key problem: a shuffle join on user_id sends every row of a hot
user to one task; at 100 TB one straggler partition stalls the stage.
Salting splits each fact-side key into R pseudo-keys and replicates the
dim side R times, so a hot key's rows spread across R tasks. The salt is
internal — it cancels out in the join — so correctness is checkable
against the unsalted oracle, which is exactly what the driver gate does.

Companion to the salted two-phase AGGREGATE (mutations.py): together they
cover the two shuffle shapes skew breaks. AQE's skew-join handles this
adaptively for sort-merge joins; explicit salting is the portable form
that also works under static planning and for the dim-replication case.

Scale notes: the dim side is replicated R times BEFORE its shuffle —
acceptable when |dim| << |fact| (here: one row per user vs the event
log). The fact side computes its salt from a deterministic hash of the
row key, costing one projection, no extra pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .common import t

_R = 8  # salt fan-out


def events_salted_dim_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join the event log to a per-user first-seen dimension under key
    salting, then roll up to (first_seen_week, event_type) counts. The
    salt spreads each user's events over _R join tasks; the oracle is the
    PLAIN unsalted join — green means salting changed nothing but the
    shuffle layout."""
    ev = t(spark, sf_dir, "events_ms").select("user_id", "event_id", "ts", "event_type")
    user_dim = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).cast("date").alias("first_seen_week")
    )
    salted_dim = user_dim.select(
        "user_id",
        "first_seen_week",
        F.explode(F.array(*[F.lit(i) for i in range(_R)])).alias("salt"),
    )
    # salt is any deterministic function of the row — it never appears in
    # the result, so it needs no cross-engine parity
    salted_ev = ev.withColumn("salt", F.pmod(F.crc32(F.col("event_id").cast("string")), F.lit(_R)).cast("int"))
    # force the shuffle-join path: at toy scale AQE would broadcast the dim
    # and no shuffle would exist to salt; the pattern under test is the
    # 100 TB shape where both sides shuffle on the (key, salt) pair
    return (
        salted_ev.join(salted_dim.hint("shuffle_hash"), ["user_id", "salt"])
        .groupBy("first_seen_week", "event_type")
        .agg(F.count("*").cast("bigint").alias("n_events"))
    )


ORACLE_SALTED_JOIN = """
WITH user_dim AS (
  SELECT user_id, CAST(date_trunc('week', MIN(ts)) AS DATE) AS first_seen_week
  FROM events_ms GROUP BY 1
)
SELECT d.first_seen_week, e.event_type, CAST(COUNT(*) AS BIGINT) AS n_events
FROM events_ms e JOIN user_dim d ON e.user_id = d.user_id
GROUP BY 1, 2
"""


QUERIES: dict[str, tuple] = {
    "events_salted_dim_join": (events_salted_dim_join, ORACLE_SALTED_JOIN),
}
