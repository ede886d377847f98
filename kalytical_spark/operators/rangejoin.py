"""Range (interval-containment) join: events landing inside running-job
execution windows — ``e.ts BETWEEN r.start_time AND r.end_time`` with NO
equi-key. The reference surfaces job windows and the event log separately
(engine.py:171-197 unmarshals running jobs; data_provider.py:133-147
fetches event history); correlating them is the monitoring query its
users run by hand.

Spark-first scale shape: a naive range join has no equi-condition, so
Catalyst can only plan BroadcastNestedLoopJoin — O(|events| x |jobs|)
comparisons and a broadcast of one whole side; at 100 TB that is the
canonical scale-killer. The bucketized decomposition makes it an
EQUI-join: each job window explodes into the fixed-width time buckets it
spans (bounded: windows are minutes, buckets an hour, so 1-2 rows per
job), each event maps to exactly ONE bucket, and the join key is the
bucket. Because the event side has a single bucket value, no
pair can match twice — no post-join dedup. The exact containment
predicate then filters the per-bucket candidates. Shuffle volume is
O(|events| + |windows x spanned-buckets|), partitioned by bucket (i.e.
by time), and AQE handles hot buckets. The plan test pins the absence of
nested-loop/cartesian operators.

The DuckDB oracle runs the literal BETWEEN join — a genuinely different
(quadratic) evaluation of the same semantics, making the gate a strong
differential test of the bucket decomposition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .common import dsum, sql_dsum, t

# Window spans are 60-660 s (domain.py running_jobs); hour buckets keep the
# explode factor at 1-2 rows per window. At a different window/traffic
# profile the bucket width is THE tuning knob: width >> typical window
# minimizes explode fan-out; width << inter-event spacing minimizes
# per-bucket candidate pairs.
_BUCKET_SECS = 3600


def _bucket(col: str) -> F.Column:
    return F.floor(F.unix_timestamp(F.col(col)) / _BUCKET_SECS).cast("bigint")


def events_during_jobs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per completed job execution: how many events (and how much metric
    mass) landed inside its [start_time, end_time] window."""
    jobs = (
        t(spark, sf_dir, "running_jobs")
        .filter(F.col("end_time").isNotNull())
        .select("exec_uuid", "engine_status", "start_time", "end_time")
    )
    job_buckets = jobs.withColumn(
        "bucket",
        F.explode(F.sequence(_bucket("start_time"), _bucket("end_time"))),
    )
    ev = t(spark, sf_dir, "events_ms").withColumn("bucket", _bucket("ts"))
    contained = ev.join(job_buckets, "bucket").filter(
        (F.col("ts") >= F.col("start_time")) & (F.col("ts") <= F.col("end_time"))
    )
    return contained.groupBy("exec_uuid", "engine_status").agg(
        F.count("*").cast("bigint").alias("n_events"),
        dsum("value").alias("sum_value"),
        F.min("ts").alias("first_event"),
        F.max("ts").alias("last_event"),
    )


ORACLE_EVENTS_DURING_JOBS = f"""
SELECT r.exec_uuid, r.engine_status,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       {sql_dsum("e.value")} AS sum_value,
       MIN(e.ts) AS first_event,
       MAX(e.ts) AS last_event
FROM running_jobs r
JOIN events_ms e ON e.ts >= r.start_time AND e.ts <= r.end_time
WHERE r.end_time IS NOT NULL
GROUP BY 1, 2
"""


QUERIES: dict[str, tuple] = {
    "range_join_events_during_jobs": (events_during_jobs, ORACLE_EVENTS_DURING_JOBS),
}
