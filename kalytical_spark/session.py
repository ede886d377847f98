"""SparkSession factory tuned for the driver harness (local[N]) while keeping
settings that transfer to a real multi-executor cluster: AQE with coalescing
and skew-join handling, UTC session timezone (required for DuckDB-oracle
timestamp parity), Arrow for the pandas-UDF slow path.

On a 1000-executor cluster the only knobs that change are master / memory /
shuffle partitions; everything expressed in the operators (broadcast hints,
partitioning columns, decimal-exact aggregation) is cluster-agnostic.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(app_name: str = "kalytical_spark", cpus: int | None = None) -> SparkSession:
    cpus = cpus or DEFAULT_CPUS
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
        # long full-suite runs showed rare 20-40s stalls on whichever query a
        # major GC landed on; a smaller heap with a pause goal bounds them
        .config("spark.driver.extraJavaOptions", "-XX:+UseG1GC -XX:MaxGCPauseMillis=500")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.sql.warehouse.dir", "/tmp/kalytical_warehouse")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def tune_session(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable confs to an externally provided session (the
    driver passes its own SparkSession to entry()/queries(); static confs like
    driver memory cannot change post-start, but these can)."""
    try:
        n_cores = str(spark.sparkContext.defaultParallelism)
    except Exception:
        n_cores = str(DEFAULT_CPUS)
    for key, value in (
        ("spark.sql.session.timeZone", "UTC"),
        ("spark.sql.adaptive.enabled", "true"),
        ("spark.sql.adaptive.coalescePartitions.enabled", "true"),
        ("spark.sql.adaptive.skewJoin.enabled", "true"),
        ("spark.sql.execution.arrow.pyspark.enabled", "true"),
        # a driver-owned session arrives with the 200-partition default:
        # wrong in both directions at our scales; match the core count
        ("spark.sql.shuffle.partitions", n_cores),
    ):
        try:
            spark.conf.set(key, value)
        except Exception:
            pass  # conf locked by the driver; proceed with its values
    return spark
