"""Mutation-as-rewrite operators: the reference's insert/upsert/delete calls
(SURVEY.md section 2.1 S3/S4/S5) re-expressed as immutable DataFrame
rewrites — the lakehouse pattern (append + MERGE-style dedup + anti-join
delete) that replaces Mongo's in-place writes. Without Delta/Iceberg jars in
this image, MERGE is emulated exactly: union + row_number over the key
ordered by version, keep rn=1.

Reference citations (paths relative to /root/reference):
  S3 insert_one      src/kalytical/core/data_provider.py:78-79
  S4 replace_one     src/kalytical/core/data_provider.py:87-88
  S5 delete_one/many src/kalytical/core/data_provider.py:104-105, 246
  C12/C13 trigger-map build/update src/kalytical/core/data_provider.py:210-224
  F11 map-key filter src/kalytical/core/engine.py:178-179

Scale notes: the upsert rewrite shuffles once on the key; at table scale it
becomes MERGE INTO on a Delta/Iceberg table (same logical plan). The delete
is a broadcast anti-join — the delete-key set is always small.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from .common import t


def _updates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A deterministic batch of upserts: new descriptions for every pipeline
    whose key ends in '3' (updates) plus re-keyed copies of the '7' group
    under a 'v2-' prefix (inserts)."""
    defs = t(spark, sf_dir, "pipeline_defs")
    updates = defs.filter(F.col("pipeline_uuid").endswith("3")).withColumn(
        "description", F.concat(F.lit("updated: "), F.col("description"))
    )
    inserts = defs.filter(F.col("pipeline_uuid").endswith("7")).withColumn(
        "pipeline_uuid", F.concat(F.lit("v2-"), F.col("pipeline_uuid"))
    )
    return updates.unionByName(inserts)


def meta_upsert_rewrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S4 (create_or_replace): MERGE-emulation — union base rows (version 0)
    with the update batch (version 1), keep the newest row per key."""
    defs = t(spark, sf_dir, "pipeline_defs")
    merged = defs.withColumn("version", F.lit(0)).unionByName(
        _updates(spark, sf_dir).withColumn("version", F.lit(1))
    )
    w = W.partitionBy("pipeline_uuid").orderBy(F.desc("version"))
    result = (
        merged.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn", "version")
    )
    return result.groupBy(
        F.col("pipeline_uuid").startswith("v2-").alias("is_new_row"),
        F.col("description").startswith("updated: ").alias("is_updated"),
    ).agg(F.count("*").alias("n"))


ORACLE_UPSERT = """
WITH updates AS (
  SELECT * REPLACE ('updated: ' || description AS description)
  FROM pipeline_defs WHERE pipeline_uuid LIKE '%3'
  UNION ALL
  SELECT * REPLACE ('v2-' || pipeline_uuid AS pipeline_uuid)
  FROM pipeline_defs WHERE pipeline_uuid LIKE '%7'
), merged AS (
  SELECT *, 0 AS version FROM pipeline_defs
  UNION ALL
  SELECT *, 1 AS version FROM updates
), deduped AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (PARTITION BY pipeline_uuid
                                 ORDER BY version DESC) AS rn
    FROM merged
  ) WHERE rn = 1
)
SELECT pipeline_uuid LIKE 'v2-%' AS is_new_row,
       description LIKE 'updated: %' AS is_updated,
       CAST(COUNT(*) AS BIGINT) AS n
FROM deduped
GROUP BY 1, 2
"""


def meta_delete_rewrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S5 (delete by predicate): broadcast anti-join of the table against
    the delete-key set; returns the surviving partition of the catalog."""
    defs = t(spark, sf_dir, "pipeline_defs")
    doomed = defs.filter(F.col("schedule").isNotNull()).select("pipeline_uuid")
    survivors = defs.join(F.broadcast(doomed), "pipeline_uuid", "left_anti")
    return survivors.groupBy("engine").agg(
        F.count("*").alias("n_surviving"),
        F.countDistinct("tag_tier").alias("n_tiers"),
    )


ORACLE_DELETE = """
SELECT engine,
       CAST(COUNT(*) AS BIGINT) AS n_surviving,
       CAST(COUNT(DISTINCT tag_tier) AS BIGINT) AS n_tiers
FROM pipeline_defs
WHERE pipeline_uuid NOT IN
  (SELECT pipeline_uuid FROM pipeline_defs WHERE schedule IS NOT NULL)
GROUP BY engine
"""


def incub_trigger_map_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C12+C13+F11 over real MAP columns: build the trigger-state map per
    incubating run (map_from_entries), apply the single-key update the
    reference does on trigger satisfaction ({'$set': {'triggers.<t>': exec}},
    data_provider.py:223-224) via map_concat/map_filter, and probe with
    map_contains_key. Output is flattened to a sorted k=v string because
    DuckDB and Spark MAP value hashing differ."""
    trig = t(spark, sf_dir, "incubating_triggers")
    first_trigger = F.min("trigger_uuid")
    built = trig.groupBy("obj_id", "pipeline_uuid").agg(
        F.map_from_entries(
            F.array_sort(F.collect_list(F.struct("trigger_uuid", "trigger_value")))
        ).alias("triggers"),
        first_trigger.alias("update_key"),
    )
    updated = built.withColumn(
        "triggers",
        F.map_concat(
            F.map_filter(F.col("triggers"), lambda k, v: k != F.col("update_key")),
            F.create_map(F.col("update_key"), F.lit("deadbeef")),
        ),
    )
    return updated.select(
        "obj_id",
        "pipeline_uuid",
        F.map_contains_key(F.col("triggers"), F.col("update_key")).alias("has_updated_key"),
        F.size(F.map_keys(F.col("triggers"))).cast("int").alias("n_triggers"),
        F.array_join(
            F.array_sort(
                F.transform(
                    F.map_entries(F.col("triggers")),
                    lambda e: F.concat(e.getField("key"), F.lit("="), e.getField("value")),
                )
            ),
            ",",
        ).alias("triggers_flat"),
    )


ORACLE_TRIGGER_MAP_OPS = """
WITH updated AS (
  SELECT obj_id, pipeline_uuid, trigger_uuid,
         CASE WHEN trigger_uuid = MIN(trigger_uuid) OVER (PARTITION BY obj_id, pipeline_uuid)
              THEN 'deadbeef' ELSE trigger_value END AS trigger_value
  FROM incubating_triggers
)
SELECT obj_id, pipeline_uuid,
       TRUE AS has_updated_key,
       CAST(COUNT(*) AS INT) AS n_triggers,
       string_agg(trigger_uuid || '=' || trigger_value, ',' ORDER BY trigger_uuid || '=' || trigger_value)
         AS triggers_flat
FROM updated
GROUP BY obj_id, pipeline_uuid
"""


def runs_status_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT / EXCEPT surface (absent from the reference, free in Spark):
    pipelines that had both a failed and a successful run, and those with
    failures only."""
    jobs = t(spark, sf_dir, "running_jobs")
    failed = jobs.filter(F.col("engine_status") == "failed").select("pipeline_uuid")
    succeeded = jobs.filter(F.col("engine_status") == "success").select("pipeline_uuid")
    both = failed.intersect(succeeded).withColumn("set_kind", F.lit("failed_and_succeeded"))
    # subtract = EXCEPT DISTINCT (exceptAll would keep multiset leftovers of
    # pipelines failing more often than they succeed — not the set semantics)
    only_failed = failed.subtract(succeeded).withColumn("set_kind", F.lit("failed_only"))
    # row-level output: an aggregate here would emit a 0-count row on one
    # engine and no row on the other when a set is empty
    return both.unionByName(only_failed)


ORACLE_SETOPS = """
WITH failed AS (
  SELECT DISTINCT pipeline_uuid FROM running_jobs WHERE engine_status = 'failed'
), succeeded AS (
  SELECT DISTINCT pipeline_uuid FROM running_jobs WHERE engine_status = 'success'
), in_both AS (
  SELECT pipeline_uuid FROM failed INTERSECT SELECT pipeline_uuid FROM succeeded
), only_failed AS (
  SELECT pipeline_uuid FROM failed EXCEPT SELECT pipeline_uuid FROM succeeded
)
SELECT pipeline_uuid, 'failed_and_succeeded' AS set_kind FROM in_both
UNION ALL
SELECT pipeline_uuid, 'failed_only' FROM only_failed
"""


def runs_presentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P5+C4: the pod-unmarshal reshape — status normalization (upper/when),
    the reference's '%Y%m%d-%H:%M:%S' presentation format (engine.py:192-196)
    applied only at the edge, and the 'NA' sentinel replaced by NULL-safe
    formatting."""
    jobs = t(spark, sf_dir, "running_jobs")
    return (
        jobs.filter(F.col("engine_status").isin("success", "failed"))
        .select(
            "pipeline_uuid",
            "exec_uuid",
            F.upper("engine_status").alias("status_display"),
            F.date_format("start_time", "yyyyMMdd-HH:mm:ss").alias("start_display"),
            F.coalesce(
                F.date_format("end_time", "yyyyMMdd-HH:mm:ss"), F.lit("NA")
            ).alias("end_display"),
            F.concat_ws(
                "-", "exec_uuid", "pipeline_uuid",
                F.when(F.col("engine") == "K8sJobEngine", F.lit("k8s")).otherwise(F.lit("local")),
            ).alias("common_job_name"),
        )
    )


ORACLE_PRESENTATION = """
SELECT pipeline_uuid, exec_uuid,
       upper(engine_status) AS status_display,
       strftime(start_time, '%Y%m%d-%H:%M:%S') AS start_display,
       COALESCE(strftime(end_time, '%Y%m%d-%H:%M:%S'), 'NA') AS end_display,
       exec_uuid || '-' || pipeline_uuid || '-' ||
         CASE WHEN engine = 'K8sJobEngine' THEN 'k8s' ELSE 'local' END
         AS common_job_name
FROM running_jobs
WHERE engine_status IN ('success', 'failed')
"""


def events_tumbling_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling-window aggregation with the native window() operator (the
    streaming-compatible form; the reference has no window concept at all).
    Oracle emulates the bucketing with epoch arithmetic."""
    ev = t(spark, sf_dir, "events_ms")
    from .common import dsum

    win = F.window("ts", "6 hours")
    return (
        ev.groupBy(win.alias("w"), "event_type")
        .agg(F.count("*").alias("n"), dsum("value").alias("sum_value"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n",
            "sum_value",
        )
    )


ORACLE_TUMBLING = """
SELECT make_timestamp(((floor(epoch(ts))::BIGINT // 21600) * 21600) * 1000000) AS window_start,
       make_timestamp(((floor(epoch(ts))::BIGINT // 21600) * 21600 + 21600) * 1000000) AS window_end,
       event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(value AS DECIMAL(12,4))) AS DOUBLE) AS sum_value
FROM events_ms
GROUP BY 1, 2, 3
"""


APPROX_USERS_EPS = 0.05  # asserted bound = 2.5x the REQUESTED rsd below
# rsd is a STANDARD ERROR, not a hard bound: asserting |err| <= 1x rsd
# (the r9 form, eps == default rsd 0.05) failed at sf0.1, where HLL++
# at 1500 distinct users measured 6.67% error — caught by the r10
# full-oracle robustness pass at sf0.1 (gated sfs happened to pass).
# Requesting rsd 0.02 measures 0.0-0.4% error at every sf, so the 5%
# assert now carries >10x headroom while staying a real accuracy claim.
APPROX_USERS_RSD = 0.02


def events_approx_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate aggregates with a VALUE-CHECKED accuracy bound: the raw
    sketch estimates (approx_count_distinct / percentile_approx) are
    engine-private, so the oracle-comparable output is the exact values
    plus boolean bound assertions — |approx_users - exact| <=
    APPROX_USERS_EPS * exact, and the approximate median landing inside
    the exact [p40, p60] band. The DuckDB twin recomputes the exact side
    and emits TRUE literals: a sketch drifting out of bounds flips the
    boolean and fails the value hash, so sketch accuracy is driver-gated
    instead of rows-only. HLL++ is deterministic for a given input, so
    the booleans are stable across runs."""
    ev = t(spark, sf_dir, "events_ms")
    # COUNT(DISTINCT) must not share an aggregate with the sketch/percentile
    # buffers: Catalyst rewrites that mix through an Expand node and merges
    # the buffers across expanded rows (~10x slower). Everything
    # NON-distinct (both sketches + the exact percentile band) rides one
    # aggregate — no Expand without a distinct — and the lone countDistinct
    # joins back on the low-cardinality event_type
    approx = ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", APPROX_USERS_RSD).alias("approx_users"),
        F.percentile_approx("value", 0.5).alias("approx_median_value"),
        F.expr("percentile(value, 0.4)").alias("p40"),
        F.expr("percentile(value, 0.6)").alias("p60"),
    )
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_users")
    )
    return (
        approx.join(exact, "event_type")
        .select(
            "event_type",
            "exact_users",
            (
                F.abs(F.col("approx_users") - F.col("exact_users"))
                <= F.lit(APPROX_USERS_EPS) * F.col("exact_users")
            ).alias("users_within_eps"),
            (
                (F.col("approx_median_value") >= F.col("p40"))
                & (F.col("approx_median_value") <= F.col("p60"))
            ).alias("median_within_band"),
        )
    )


ORACLE_APPROX_STATS = """
SELECT event_type,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
       TRUE AS users_within_eps,
       TRUE AS median_within_band
FROM events_ms
GROUP BY 1
"""


QUERIES: dict[str, tuple] = {
    "meta_upsert_rewrite": (meta_upsert_rewrite, ORACLE_UPSERT),
    "meta_delete_rewrite": (meta_delete_rewrite, ORACLE_DELETE),
    "incub_trigger_map_ops": (incub_trigger_map_ops, ORACLE_TRIGGER_MAP_OPS),
    "runs_status_setops": (runs_status_setops, ORACLE_SETOPS),
    "runs_presentation": (runs_presentation, ORACLE_PRESENTATION),
    "events_tumbling_windows": (events_tumbling_windows, ORACLE_TUMBLING),
    "events_approx_stats": (events_approx_stats, ORACLE_APPROX_STATS),
}


def events_hot_key_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase salted aggregation for skewed keys: ~90% of events collapse
    onto one 'hot' group; a direct groupBy would send them all to one
    reducer. Phase 1 aggregates by (key, salt-of-16), phase 2 merges the 16
    partials — the shuffle spreads the hot key across 16 reducers. Counts
    and decimal-exact sums are merge-associative, so the result is
    bit-identical to the oracle's plain GROUP BY."""
    ev = t(spark, sf_dir, "events_ms")
    hot_key = F.when(F.col("event_id") % 10 < 9, F.lit("hot")).otherwise(
        F.concat(F.lit("cold-"), (F.col("user_id") % 10).cast("string"))
    )
    salted = ev.withColumn("k", hot_key).withColumn(
        "salt", F.pmod(F.hash("event_id"), F.lit(16))
    )
    partial = salted.groupBy("k", "salt").agg(
        F.count("*").alias("pn"),
        F.sum(F.col("value").cast("decimal(12,4)")).alias("psum"),
    )
    return partial.groupBy("k").agg(
        F.sum("pn").alias("n"),
        F.sum("psum").cast("double").alias("sum_value"),
    )


ORACLE_SALTED_AGG = """
SELECT CASE WHEN event_id % 10 < 9 THEN 'hot'
            ELSE 'cold-' || CAST(user_id % 10 AS STRING) END AS k,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(value AS DECIMAL(12,4))) AS DOUBLE) AS sum_value
FROM events_ms
GROUP BY 1
"""


QUERIES.update(
    {"events_hot_key_salted_agg": (events_hot_key_salted_agg, ORACLE_SALTED_AGG)}
)
