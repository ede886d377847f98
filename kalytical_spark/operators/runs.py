"""Running-jobs operators: the engine-manager's pod-list queries re-expressed
over the running_jobs snapshot table (SURVEY.md sections 2.2, 2.5, 2.6).

Reference citations (paths relative to /root/reference):
  F9/F10/O3  status + uuid filter, slice limit  src/kalytical/core/engine.py:46-62
  P5         pod unmarshal / status normalize   src/kalytical/core/engine.py:182-197
  U1/U2      union across engines + dedup       src/kalytical/core/engine.py:49-51
  C6         duration arithmetic                src/kalytical/core/job_culler.py:22

The reference lists ALL pods then filters in Python (its own TODO calls this
"expensive and broken", engine.py:53). Here the filters are Catalyst
predicates pushed into the scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from .common import t


def runs_active_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F9+O3: live jobs (running/pending), most recent first, page of 10."""
    jobs = t(spark, sf_dir, "running_jobs")
    return (
        jobs.filter(F.col("engine_status").isin("running", "pending"))
        .orderBy(F.desc("start_time"), F.desc("exec_uuid"))
        .limit(10)
    )


ORACLE_ACTIVE_TOPK = """
SELECT * FROM running_jobs
WHERE engine_status IN ('running', 'pending')
ORDER BY start_time DESC, exec_uuid DESC
LIMIT 10
"""


def runs_engine_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U1+U2: get_jobs fans out per registered engine and concatenates; the
    Spark shape is unionByName over per-engine frames + status rollup."""
    jobs = t(spark, sf_dir, "running_jobs")
    k8s = jobs.filter(F.col("engine") == "K8sJobEngine")
    local = jobs.filter(F.col("engine") == "LocalEngine")
    return (
        k8s.unionByName(local)
        .distinct()
        .groupBy("engine", "engine_status")
        .agg(F.count("*").alias("n_jobs"), F.countDistinct("pipeline_uuid").alias("n_pipelines"))
    )


ORACLE_ENGINE_UNION = """
SELECT engine, engine_status,
       CAST(COUNT(*) AS BIGINT) AS n_jobs,
       CAST(COUNT(DISTINCT pipeline_uuid) AS BIGINT) AS n_pipelines
FROM (
  SELECT DISTINCT * FROM (
    SELECT * FROM running_jobs WHERE engine = 'K8sJobEngine'
    UNION ALL
    SELECT * FROM running_jobs WHERE engine = 'LocalEngine'
  )
)
GROUP BY 1, 2
"""


def runs_duration_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P5+C6: duration distribution of terminal runs per engine/status —
    nullable end_time replaces the reference's 'NA' sentinel (engine.py:190)."""
    jobs = t(spark, sf_dir, "running_jobs")
    dur = F.unix_timestamp("end_time") - F.unix_timestamp("start_time")
    return (
        jobs.filter(F.col("end_time").isNotNull())
        .groupBy("engine", "engine_status")
        .agg(
            F.count("*").alias("n"),
            F.min(dur).alias("min_dur_s"),
            F.max(dur).alias("max_dur_s"),
            (F.sum(dur).cast("double") / F.count("*").cast("double")).alias("avg_dur_s"),
        )
    )


ORACLE_DURATION_STATS = """
SELECT engine, engine_status,
       CAST(COUNT(*) AS BIGINT) AS n,
       MIN(date_diff('second', start_time, end_time)) AS min_dur_s,
       MAX(date_diff('second', start_time, end_time)) AS max_dur_s,
       CAST(CAST(SUM(date_diff('second', start_time, end_time)) AS BIGINT) AS DOUBLE)
         / CAST(COUNT(*) AS DOUBLE) AS avg_dur_s
FROM running_jobs
WHERE end_time IS NOT NULL
GROUP BY 1, 2
"""


def runs_peak_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sweep-line peak concurrency per engine: the maximum number of
    simultaneously-running jobs over the whole history, and the earliest
    instant attaining it — capacity planning's first question, and the
    temporal generalization of the point-in-time concurrency gate (J4).

    Each run contributes +1 at start_time and -1 at end_time (open runs
    never decrement); the running sum over boundaries IS the concurrency
    curve. Boundary order at equal timestamps is (delta asc, exec_uuid):
    an end releases its slot before a coincident start takes one — the
    same convention a semaphore has — and exec_uuid makes the order (and
    therefore peak_ts) total and cross-engine deterministic.

    Scale: one shuffle keyed by engine; the running sum is a window inside
    each engine partition. Engines are few, so per-key volume is the run
    count — the same bound the duration stats already carry."""
    jobs = t(spark, sf_dir, "running_jobs")
    starts = jobs.select(
        "engine",
        F.col("start_time").alias("ts"),
        F.lit(1).alias("delta"),
        "exec_uuid",
    )
    ends = jobs.filter(F.col("end_time").isNotNull()).select(
        "engine",
        F.col("end_time").alias("ts"),
        F.lit(-1).alias("delta"),
        "exec_uuid",
    )
    w = (
        W.partitionBy("engine")
        .orderBy("ts", "delta", "exec_uuid")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    # peak rides a second window over the SAME engine partitioning, so the
    # union + running sum evaluate once behind one exchange — no self-join
    curve = (
        starts.unionByName(ends)
        .withColumn("running", F.sum("delta").over(w).cast("int"))
        .withColumn("peak", F.max("running").over(W.partitionBy("engine")))
    )
    return curve.groupBy("engine").agg(
        F.max("running").cast("int").alias("peak"),
        F.min(
            F.when(F.col("running") == F.col("peak"), F.col("ts"))
        ).alias("peak_ts"),
        F.count("*").cast("bigint").alias("n_boundaries"),
        F.sum(F.col("delta").cast("bigint")).alias("still_open"),
    )


ORACLE_PEAK_CONCURRENCY = """
WITH boundaries AS (
  SELECT engine, start_time AS ts, 1 AS delta, exec_uuid FROM running_jobs
  UNION ALL
  SELECT engine, end_time, -1, exec_uuid FROM running_jobs WHERE end_time IS NOT NULL
), curve AS (
  SELECT engine, ts, delta,
         CAST(SUM(delta) OVER (PARTITION BY engine ORDER BY ts, delta, exec_uuid
                               ROWS UNBOUNDED PRECEDING) AS INTEGER) AS running
  FROM boundaries
), peaks AS (
  SELECT engine, MAX(running) AS peak FROM curve GROUP BY 1
)
SELECT c.engine,
       p.peak,
       MIN(c.ts) FILTER (c.running = p.peak) AS peak_ts,
       CAST(COUNT(*) AS BIGINT) AS n_boundaries,
       CAST(SUM(c.delta) AS BIGINT) AS still_open
FROM curve c JOIN peaks p USING (engine)
GROUP BY 1, 2
"""


QUERIES: dict[str, tuple] = {
    "runs_active_topk": (runs_active_topk, ORACLE_ACTIVE_TOPK),
    "runs_engine_union": (runs_engine_union, ORACLE_ENGINE_UNION),
    "runs_duration_stats": (runs_duration_stats, ORACLE_DURATION_STATS),
    "runs_peak_concurrency": (runs_peak_concurrency, ORACLE_PEAK_CONCURRENCY),
}
