"""Scheduling + IO-surface operators: cron origination (ST12), bounded log
retrieval (S10), and source/sink format round-trips (the connector surface a
Spark engine exposes beyond the reference's Mongo+SQS pair).

Reference citations (paths relative to /root/reference):
  ST12 cron origination  src/kalytical/core/ext_sched.py:21-54,
                         src/kalytical/core/data_provider.py:69-88
  S10  bounded log fetch src/kalytical/core/engine.py:152-160
  S3   append sinks      src/kalytical/core/data_provider.py:128-131
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .common import SQL_NOW, now_expr, t


def cron_due_originations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST12: the scheduled-origination tick. The reference runs a K8s
    CronJob per scheduled pipeline that curls run_by_pipeline_uuid; here one
    batch tick evaluates every schedule against the (deterministic) clock
    and emits the origination events for the next hourly boundary. Only the
    '0 * * * *' shape exists in the fixtures: due time = next top-of-hour."""
    defs = t(spark, sf_dir, "pipeline_defs")
    now = now_expr(spark, sf_dir)
    next_hour = F.date_trunc("hour", now) + F.expr("INTERVAL 1 HOUR")
    return (
        defs.filter(F.col("schedule").isNotNull())
        .select(
            "pipeline_uuid",
            "schedule",
            F.lit("origination").alias("event_subtype"),
            next_hour.alias("due_time"),
            F.substring(
                F.md5(F.concat(F.col("pipeline_uuid"), F.lit("@"), next_hour.cast("string"))),
                1,
                8,
            ).alias("exec_uuid"),
        )
    )


ORACLE_CRON_DUE = f"""
SELECT pipeline_uuid, schedule,
       'origination' AS event_subtype,
       date_trunc('hour', {SQL_NOW}) + INTERVAL 1 HOUR AS due_time,
       substr(md5(pipeline_uuid || '@' ||
                  CAST(date_trunc('hour', {SQL_NOW}) + INTERVAL 1 HOUR AS STRING)), 1, 8)
         AS exec_uuid
FROM pipeline_defs
WHERE schedule IS NOT NULL
"""


def read_job_logs(spark: SparkSession, log_path: str, max_kb: int = 10, tail_lines: int = 999) -> DataFrame:
    """S10: bounded log retrieval — spark.read.text over captured pod logs
    with the reference's caps (max_kb default 10, tail_lines 999;
    engine.py:152-160). Returns the last `tail_lines` lines within the byte
    budget, newest last."""
    lines = spark.read.text(log_path).withColumn(
        "line_id", F.monotonically_increasing_id()
    )
    tail = lines.orderBy(F.desc("line_id")).limit(tail_lines)
    budget = max_kb * 1024
    from pyspark.sql import Window as W

    w = W.orderBy(F.desc("line_id")).rowsBetween(W.unboundedPreceding, 0)
    bounded = (
        tail.withColumn("cum_bytes", F.sum(F.length("value") + 1).over(w))
        .filter(F.col("cum_bytes") <= budget)
        .orderBy(F.asc("line_id"))
        .select(F.col("value").alias("line"))
    )
    return bounded


def roundtrip_formats(spark: SparkSession, sf_dir: str, out_dir: str | None = None) -> DataFrame:
    """Source/sink surface: write the pipeline catalog to json + csv + orc
    (+ partitioned parquet for the event log) and read each back, proving
    schema-stable round-trips. Returns per-format row counts."""
    defs = t(spark, sf_dir, "pipeline_defs")
    ev = t(spark, sf_dir, "lifecycle_events").limit(1000)
    base = out_dir or tempfile.mkdtemp(prefix="kalytical_io_")
    results = []
    json_path = os.path.join(base, "defs_json")
    defs.write.mode("overwrite").json(json_path)
    results.append(("json", spark.read.json(json_path).count()))
    csv_path = os.path.join(base, "defs_csv")
    defs.write.mode("overwrite").option("header", True).csv(csv_path)
    results.append(
        ("csv", spark.read.option("header", True).schema(defs.schema).csv(csv_path).count())
    )
    orc_path = os.path.join(base, "defs_orc")
    defs.write.mode("overwrite").orc(orc_path)
    results.append(("orc", spark.read.orc(orc_path).count()))
    # date-partitioned parquet: the layout the event log uses at scale
    pq_path = os.path.join(base, "events_parquet")
    ev.withColumn("dt", F.to_date("event_time")).write.mode("overwrite").partitionBy(
        "dt"
    ).parquet(pq_path)
    results.append(("parquet_partitioned", spark.read.parquet(pq_path).count()))
    return spark.createDataFrame(results, schema="format string, n_rows long")


QUERIES: dict[str, tuple] = {
    "cron_due_originations": (cron_due_originations, ORACLE_CRON_DUE),
}
