"""Metadata-catalog operators: the reference's MongoDB pipeline_defs queries
re-expressed as DataFrame computations (SURVEY.md section 2.1-2.3, 2.6).

Reference citations (paths relative to /root/reference):
  S1/P1 scan-minus-body      src/kalytical/core/data_provider.py:37,53
  S2/F1 point lookup         src/kalytical/core/data_provider.py:55-65
  F2    prefix filter        src/kalytical/core/data_provider.py:48
  F4    tag filter           src/kalytical/core/data_provider.py:49-51
  F5/J1 downstream-of        src/kalytical/core/data_provider.py:36-37
  J2    dep validation       src/kalytical/core/data_provider.py:71-74
  J3    orphan check         src/kalytical/core/data_provider.py:92-97
  S6    unique-key assert    src/kalytical/core/data_provider.py:26-29
  F8    existence predicate  src/kalytical/core/data_provider.py:32
  F15   trigger routing      src/kalytical/core/dispatcher.py:41-45
  P2/C7 body fetch + json    src/kalytical/core/data_provider.py:123-126

The defs table is tiny relative to the event log at any scale; Spark
broadcasts it in every join below (explicit F.broadcast), so these lookups
stay shuffle-free no matter how large the probe side grows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .common import t

HEADER_COLS = [
    "pipeline_uuid",
    "description",
    "retry_max",
    "concurrency",
    "engine",
    "schedule",
    "trigger_operator",
    "tag_team",
    "tag_tier",
]
_HDR = ", ".join(HEADER_COLS)


def meta_list_by_prefix_tag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F2+F4+S1+P1: list pipeline headers by uuid prefix and tag equality,
    excluding the heavy pipeline_body column (Parquet column pruning does the
    projection at the scan)."""
    defs = t(spark, sf_dir, "pipeline_defs")
    return (
        defs.filter(F.col("pipeline_uuid").startswith("p-1"))
        .filter(F.col("tag_tier") == "tier-1")
        .select(*HEADER_COLS)
    )


ORACLE_LIST = f"""
SELECT {_HDR} FROM pipeline_defs
WHERE pipeline_uuid LIKE 'p-1%' AND tag_tier = 'tier-1'
"""


def meta_point_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S2/F1: describe_pipeline — point lookup by unique key."""
    defs = t(spark, sf_dir, "pipeline_defs")
    return defs.filter(F.col("pipeline_uuid") == "p-7")


ORACLE_POINT = "SELECT * FROM pipeline_defs WHERE pipeline_uuid = 'p-7'"


def meta_downstream_of(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F5/J1: head_downstream_pipelines('p-3') — reverse-dependency lookup via
    array membership on the struct-typed defs view (array_contains), the Spark
    shape of Mongo's $elemMatch."""
    full = t(spark, sf_dir, "pipeline_defs_full")
    return full.filter(
        F.array_contains(F.col("triggers_on.pipeline_uuids"), "p-3")
    ).select(
        "pipeline_uuid",
        F.col("triggers_on.operator").alias("trigger_operator"),
        F.size("triggers_on.pipeline_uuids").cast("int").alias("n_deps"),
        "retry_max",
        "concurrency",
    )


ORACLE_DOWNSTREAM = """
SELECT d.pipeline_uuid,
       d.trigger_operator,
       CAST(cnt.n_deps AS INT) AS n_deps,
       d.retry_max,
       d.concurrency
FROM pipeline_defs d
JOIN (SELECT pipeline_uuid, COUNT(*) AS n_deps FROM dag_edges GROUP BY 1) cnt
  USING (pipeline_uuid)
WHERE d.pipeline_uuid IN
  (SELECT pipeline_uuid FROM dag_edges WHERE upstream_uuid = 'p-3')
"""


def meta_dep_resolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2: create_or_replace validation — per pipeline with declared triggers,
    how many upstream defs resolve (left-semi) and whether any are missing.
    Validated against the catalog AS IT WOULD LOOK after deleting the
    scheduled pipelines (the delete-guard scenario) so the missing-deps
    branch is actually exercised: every edge pointing at a scheduled
    pipeline reports has_missing."""
    defs = (
        t(spark, sf_dir, "pipeline_defs")
        .filter(F.col("schedule").isNull())
        .select("pipeline_uuid")
    )
    edges = t(spark, sf_dir, "dag_edges")
    resolved = edges.join(
        F.broadcast(defs.withColumnRenamed("pipeline_uuid", "upstream_uuid")),
        "upstream_uuid",
        "left_semi",
    )
    n_deps = edges.groupBy("pipeline_uuid").agg(F.count("*").alias("n_deps"))
    n_ok = resolved.groupBy("pipeline_uuid").agg(F.count("*").alias("n_resolved"))
    return (
        n_deps.join(n_ok, "pipeline_uuid", "left")
        .select(
            "pipeline_uuid",
            "n_deps",
            F.coalesce("n_resolved", F.lit(0)).alias("n_resolved"),
            (F.col("n_deps") != F.coalesce("n_resolved", F.lit(0))).alias("has_missing"),
        )
    )


ORACLE_DEP_RESOLUTION = """
SELECT e.pipeline_uuid,
       CAST(COUNT(*) AS BIGINT) AS n_deps,
       CAST(SUM(CASE WHEN d.pipeline_uuid IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_resolved,
       COUNT(*) <> SUM(CASE WHEN d.pipeline_uuid IS NOT NULL THEN 1 ELSE 0 END)
         AS has_missing
FROM dag_edges e
LEFT JOIN (SELECT pipeline_uuid FROM pipeline_defs WHERE schedule IS NULL) d
  ON e.upstream_uuid = d.pipeline_uuid
GROUP BY e.pipeline_uuid
"""


def meta_orphan_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3: before deleting a candidate set of defs, list downstream pipelines
    that would lose upstream dependencies (the delete guard)."""
    defs = t(spark, sf_dir, "pipeline_defs")
    edges = t(spark, sf_dir, "dag_edges")
    doomed = defs.filter(
        (F.col("retry_max") == 3) & (F.col("engine") == "LocalEngine")
    ).select(F.col("pipeline_uuid").alias("upstream_uuid"))
    return (
        edges.join(F.broadcast(doomed), "upstream_uuid")
        .groupBy("pipeline_uuid")
        .agg(F.count("*").alias("n_lost_deps"))
    )


ORACLE_ORPHAN = """
SELECT e.pipeline_uuid, CAST(COUNT(*) AS BIGINT) AS n_lost_deps
FROM dag_edges e
WHERE e.upstream_uuid IN
  (SELECT pipeline_uuid FROM pipeline_defs
   WHERE retry_max = 3 AND engine = 'LocalEngine')
GROUP BY e.pipeline_uuid
"""


def meta_unique_key_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S6: the Mongo unique-index constraint as an assertion query."""
    defs = t(spark, sf_dir, "pipeline_defs")
    return defs.agg(
        F.count("*").alias("n_total"),
        F.countDistinct("pipeline_uuid").alias("n_distinct"),
        (F.count("*") - F.countDistinct("pipeline_uuid")).alias("n_duplicates"),
    )


ORACLE_UNIQUE = """
SELECT CAST(COUNT(*) AS BIGINT) AS n_total,
       CAST(COUNT(DISTINCT pipeline_uuid) AS BIGINT) AS n_distinct,
       CAST(COUNT(*) - COUNT(DISTINCT pipeline_uuid) AS BIGINT) AS n_duplicates
FROM pipeline_defs
"""


def meta_tag_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F4 + aggregation: catalog rollup by tags (map-entry predicates become
    plain column group-bys after tag normalization)."""
    defs = t(spark, sf_dir, "pipeline_defs")
    return defs.groupBy("tag_tier", "tag_team").agg(
        F.count("*").alias("n_pipelines"),
        F.sum(F.col("concurrency").cast("int")).alias("n_concurrent"),
        F.sum(F.col("schedule").isNotNull().cast("int")).alias("n_scheduled"),
        F.sum((F.col("trigger_operator") == "all").cast("int")).alias("n_all_op"),
    )


ORACLE_TAG_STATS = """
SELECT tag_tier, tag_team,
       CAST(COUNT(*) AS BIGINT) AS n_pipelines,
       CAST(SUM(CASE WHEN concurrency THEN 1 ELSE 0 END) AS BIGINT) AS n_concurrent,
       CAST(SUM(CASE WHEN schedule IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_scheduled,
       CAST(SUM(CASE WHEN trigger_operator = 'all' THEN 1 ELSE 0 END) AS BIGINT) AS n_all_op
FROM pipeline_defs
GROUP BY tag_tier, tag_team
"""


def meta_scheduled_roots(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F8: cron-scheduled pipelines (schedule IS NOT NULL) with their
    dependency fan-in (ST12 origination sources)."""
    defs = t(spark, sf_dir, "pipeline_defs")
    edges = t(spark, sf_dir, "dag_edges")
    n_deps = edges.groupBy("pipeline_uuid").agg(F.count("*").alias("n_deps"))
    return (
        defs.filter(F.col("schedule").isNotNull())
        .join(F.broadcast(n_deps), "pipeline_uuid", "left")
        .select(
            "pipeline_uuid",
            "schedule",
            "engine",
            F.coalesce("n_deps", F.lit(0)).alias("n_deps"),
            F.col("trigger_operator").isNull().alias("is_root"),
        )
    )


ORACLE_SCHEDULED = """
SELECT d.pipeline_uuid, d.schedule, d.engine,
       CAST(COALESCE(cnt.n_deps, 0) AS BIGINT) AS n_deps,
       d.trigger_operator IS NULL AS is_root
FROM pipeline_defs d
LEFT JOIN (SELECT pipeline_uuid, COUNT(*) AS n_deps FROM dag_edges GROUP BY 1) cnt
  USING (pipeline_uuid)
WHERE d.schedule IS NOT NULL
"""


def meta_trigger_route(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F15: the dispatcher's fire-now-vs-incubate routing per pipeline —
    fire iff no triggers, operator 'any', or operator 'all' with exactly one
    dependency (dispatcher.py:41-45)."""
    defs = t(spark, sf_dir, "pipeline_defs")
    edges = t(spark, sf_dir, "dag_edges")
    n_deps = edges.groupBy("pipeline_uuid").agg(F.count("*").alias("n_deps"))
    joined = defs.join(F.broadcast(n_deps), "pipeline_uuid", "left").withColumn(
        "n_deps", F.coalesce("n_deps", F.lit(0))
    )
    return joined.select(
        "pipeline_uuid",
        "trigger_operator",
        "n_deps",
        F.when(
            F.col("trigger_operator").isNull()
            | (F.col("trigger_operator") == "any")
            | ((F.col("trigger_operator") == "all") & (F.col("n_deps") == 1)),
            F.lit("fire"),
        )
        .otherwise(F.lit("incubate"))
        .alias("route"),
    )


ORACLE_TRIGGER_ROUTE = """
SELECT d.pipeline_uuid, d.trigger_operator,
       CAST(COALESCE(cnt.n_deps, 0) AS BIGINT) AS n_deps,
       CASE WHEN d.trigger_operator IS NULL OR d.trigger_operator = 'any'
              OR (d.trigger_operator = 'all' AND COALESCE(cnt.n_deps, 0) = 1)
            THEN 'fire' ELSE 'incubate' END AS route
FROM pipeline_defs d
LEFT JOIN (SELECT pipeline_uuid, COUNT(*) AS n_deps FROM dag_edges GROUP BY 1) cnt
  USING (pipeline_uuid)
"""


def meta_body_fetch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P2+C7: fetch_pipeline_body_by_uuid over a prefix set, extracting a
    field from the opaque JSON payload."""
    defs = t(spark, sf_dir, "pipeline_defs")
    return defs.filter(F.col("pipeline_uuid").startswith("p-2")).select(
        "pipeline_uuid",
        "pipeline_body",
        F.get_json_object("pipeline_body", "$.steps").cast("int").alias("n_steps"),
    )


ORACLE_BODY_FETCH = """
SELECT pipeline_uuid, pipeline_body,
       CAST(json_extract_string(pipeline_body, '$.steps') AS INT) AS n_steps
FROM pipeline_defs
WHERE pipeline_uuid LIKE 'p-2%'
"""


def meta_defs_events_reconcile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER reconciliation of the definition table against observed
    lifecycle activity: every pipeline classified as 'active' (defined and
    emitting), 'silent' (defined, zero events), or 'undeclared' (events
    from a uuid with no definition — the operational drift the orphan
    check's anti-join only half-surfaces). The full outer join keeps both
    unmatched sides in one pass; both inputs aggregate to O(pipelines)
    rows before the join, so at scale this is a join of two small
    pre-aggregated frames, not of raw event logs.

    Non-vacuous by construction (every synthetic pipeline is otherwise
    active): every 7th definition gets a '_shadow' twin with no events
    (must classify 'silent') and every 5th pipeline's events get a
    '_rogue' re-key with no definition (must classify 'undeclared') —
    same planted-positive pattern as dedup_exact / decontam."""
    base_defs = t(spark, sf_dir, "pipeline_defs")
    # unbounded suffix + TRY-cast semantics matching the oracle's
    # try_cast(substr(col, 3)): a 10-char cap would truncate an 11-digit
    # suffix that DuckDB parses in full, silently flipping the %-selections
    pnum = F.expr("try_cast(substring(pipeline_uuid, 3) AS INT)")  # 'p-<n>'
    shadow = base_defs.filter(pnum % 7 == 0).withColumn(
        "pipeline_uuid", F.concat(F.col("pipeline_uuid"), F.lit("_shadow"))
    )
    defs = base_defs.unionByName(shadow).select(
        F.col("pipeline_uuid").alias("def_uuid"), "tag_team"
    )
    ev = t(spark, sf_dir, "lifecycle_events")
    rogue = ev.filter(
        F.expr("try_cast(substring(pipeline_uuid, 3) AS INT)") % 5 == 0
    ).withColumn("pipeline_uuid", F.concat(F.col("pipeline_uuid"), F.lit("_rogue")))
    acts = (
        ev.unionByName(rogue)
        .groupBy(F.col("pipeline_uuid").alias("ev_uuid"))
        .agg(F.count("*").alias("n_events"), F.max("event_time").alias("last_seen"))
    )
    joined = defs.join(acts, defs["def_uuid"] == acts["ev_uuid"], "full_outer")
    status = (
        F.when(F.col("def_uuid").isNull(), F.lit("undeclared"))
        .when(F.col("ev_uuid").isNull(), F.lit("silent"))
        .otherwise(F.lit("active"))
    )
    return joined.select(
        F.coalesce(F.col("def_uuid"), F.col("ev_uuid")).alias("pipeline_uuid"),
        status.alias("status"),
        "tag_team",
        F.coalesce(F.col("n_events"), F.lit(0)).cast("bigint").alias("n_events"),
        "last_seen",
    )


ORACLE_RECONCILE = """
WITH defs2 AS (
  SELECT pipeline_uuid, tag_team FROM pipeline_defs
  UNION ALL
  SELECT pipeline_uuid || '_shadow', tag_team FROM pipeline_defs
  WHERE TRY_CAST(substr(pipeline_uuid, 3) AS INT) % 7 = 0
), ev2 AS (
  SELECT pipeline_uuid, event_time FROM lifecycle_events
  UNION ALL
  SELECT pipeline_uuid || '_rogue', event_time FROM lifecycle_events
  WHERE TRY_CAST(substr(pipeline_uuid, 3) AS INT) % 5 = 0
), acts AS (
  SELECT pipeline_uuid AS ev_uuid, CAST(COUNT(*) AS BIGINT) AS n_events,
         MAX(event_time) AS last_seen
  FROM ev2 GROUP BY 1
)
SELECT COALESCE(d.pipeline_uuid, a.ev_uuid) AS pipeline_uuid,
       CASE WHEN d.pipeline_uuid IS NULL THEN 'undeclared'
            WHEN a.ev_uuid IS NULL THEN 'silent'
            ELSE 'active' END AS status,
       d.tag_team,
       COALESCE(a.n_events, 0) AS n_events,
       a.last_seen
FROM defs2 d FULL OUTER JOIN acts a ON d.pipeline_uuid = a.ev_uuid
"""



QUERIES: dict[str, tuple] = {
    "meta_list_by_prefix_tag": (meta_list_by_prefix_tag, ORACLE_LIST),
    "meta_point_lookup": (meta_point_lookup, ORACLE_POINT),
    "meta_downstream_of": (meta_downstream_of, ORACLE_DOWNSTREAM),
    "meta_dep_resolution": (meta_dep_resolution, ORACLE_DEP_RESOLUTION),
    "meta_orphan_check": (meta_orphan_check, ORACLE_ORPHAN),
    "meta_unique_key_check": (meta_unique_key_check, ORACLE_UNIQUE),
    "meta_tag_stats": (meta_tag_stats, ORACLE_TAG_STATS),
    "meta_scheduled_roots": (meta_scheduled_roots, ORACLE_SCHEDULED),
    "meta_trigger_route": (meta_trigger_route, ORACLE_TRIGGER_ROUTE),
    "meta_body_fetch": (meta_body_fetch, ORACLE_BODY_FETCH),
    "meta_defs_events_reconcile": (meta_defs_events_reconcile, ORACLE_RECONCILE),
}
