"""As-of and interval (range) joins — SURVEY.md section 2.3 names these as
absent from both the reference and Spark's built-ins; a temporal engine
needs them (match each event to the run that was live when it happened).

As-of = union-and-carry: tag both sides, sort per key by time with the
right side winning ties, and carry the last seen right-row forward with
last(ignorenulls) over an unbounded-preceding window. One shuffle on the
key, no per-row subqueries, no pandas — scales like any window aggregate.
The DuckDB oracle uses its native ASOF JOIN: two completely different
algorithms, one result.

Interval join = equi-join on the key plus a range predicate — Spark plans
the equi part as a hash/sort-merge join and post-filters the range, which
is the right shape when the key is selective (per-pipeline here).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from .common import t


def _dedup_runs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One run per (pipeline, start_time): ties would make as-of matching
    engine-arbitrary; keep the max exec_uuid deterministically."""
    runs = t(spark, sf_dir, "running_jobs")
    w = W.partitionBy("pipeline_uuid", "start_time").orderBy(F.desc("exec_uuid"))
    return (
        runs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("pipeline_uuid", "start_time", F.col("exec_uuid").alias("run_exec"))
    )


def events_asof_runs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For every failure event: the most recent run of that pipeline started
    at or before the event (left as-of join), with staleness in seconds."""
    ev = (
        t(spark, sf_dir, "lifecycle_events")
        .filter(F.col("event_subtype") == "failure")
        .select("pipeline_uuid", "exec_uuid", "event_time")
    )
    runs = _dedup_runs(spark, sf_dir)

    left = ev.select(
        "pipeline_uuid",
        F.col("event_time").alias("ts"),
        F.lit(1).alias("side"),
        "exec_uuid",
        F.lit(None).cast("string").alias("run_exec"),
        F.lit(None).cast("timestamp").alias("start_time"),
    )
    right = runs.select(
        "pipeline_uuid",
        F.col("start_time").alias("ts"),
        F.lit(0).alias("side"),
        F.lit(None).cast("string").alias("exec_uuid"),
        "run_exec",
        "start_time",
    )
    u = left.unionByName(right)
    # right rows sort before left rows at equal ts => a run starting exactly
    # at the event time matches (ASOF >= semantics)
    w = (
        W.partitionBy("pipeline_uuid")
        .orderBy(F.asc("ts"), F.asc("side"), F.asc_nulls_first("run_exec"))
        .rowsBetween(W.unboundedPreceding, 0)
    )
    carried = u.select(
        "pipeline_uuid",
        "ts",
        "side",
        "exec_uuid",
        F.last("run_exec", ignorenulls=True).over(w).alias("matched_run"),
        F.last("start_time", ignorenulls=True).over(w).alias("run_start"),
    )
    return (
        carried.filter(F.col("side") == 1)
        .select(
            "pipeline_uuid",
            "exec_uuid",
            F.col("ts").alias("event_time"),
            "matched_run",
            "run_start",
            (F.unix_timestamp("ts") - F.unix_timestamp("run_start")).alias("staleness_s"),
        )
    )


ORACLE_ASOF = """
WITH runs AS (
  SELECT pipeline_uuid, start_time, exec_uuid AS run_exec FROM (
    SELECT *, row_number() OVER (PARTITION BY pipeline_uuid, start_time
                                 ORDER BY exec_uuid DESC) AS rn
    FROM running_jobs
  ) WHERE rn = 1
), failures AS (
  SELECT pipeline_uuid, exec_uuid, event_time
  FROM lifecycle_events WHERE event_subtype = 'failure'
)
SELECT f.pipeline_uuid, f.exec_uuid, f.event_time,
       r.run_exec AS matched_run,
       r.start_time AS run_start,
       date_diff('second', r.start_time, f.event_time) AS staleness_s
FROM failures f
ASOF LEFT JOIN runs r
  ON f.pipeline_uuid = r.pipeline_uuid AND f.event_time >= r.start_time
"""


def events_during_runs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval join: events that occurred while a run of their pipeline was
    live ([start_time, end_time)), rolled up per run."""
    ev = t(spark, sf_dir, "lifecycle_events").select("pipeline_uuid", "exec_uuid", "event_time")
    runs = t(spark, sf_dir, "running_jobs").filter(F.col("end_time").isNotNull())
    joined = ev.join(
        runs.select("pipeline_uuid", F.col("exec_uuid").alias("run_exec"), "start_time", "end_time"),
        ["pipeline_uuid"],
    ).filter((F.col("event_time") >= F.col("start_time")) & (F.col("event_time") < F.col("end_time")))
    return joined.groupBy("pipeline_uuid", "run_exec").agg(
        F.count("*").alias("n_events_during"),
        F.countDistinct("exec_uuid").alias("n_distinct_events"),
    )


ORACLE_DURING = """
SELECT e.pipeline_uuid, r.exec_uuid AS run_exec,
       CAST(COUNT(*) AS BIGINT) AS n_events_during,
       CAST(COUNT(DISTINCT e.exec_uuid) AS BIGINT) AS n_distinct_events
FROM lifecycle_events e
JOIN running_jobs r
  ON e.pipeline_uuid = r.pipeline_uuid
 AND e.event_time >= r.start_time AND e.event_time < r.end_time
WHERE r.end_time IS NOT NULL
GROUP BY 1, 2
"""


QUERIES: dict[str, tuple] = {
    "events_asof_runs": (events_asof_runs, ORACLE_ASOF),
    "events_during_runs": (events_during_runs, ORACLE_DURING),
}
