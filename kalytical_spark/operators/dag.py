"""DAG-resolution operators: dependency firing, incubation crediting, the
culler's decision branches, and the concurrency gate — the heart of the
reference's semantics (SURVEY.md sections 2.3, 2.4, 2.8 and lifecycle E1/E3).

Reference citations (paths relative to /root/reference):
  J1/F15/A4  success event -> downstream fire-vs-incubate
             src/kalytical/core/dispatcher.py:31-46
  A3/O2/J7   oldest-waiting-wins trigger credit
             src/kalytical/core/data_provider.py:204-230
  F13/A4     all-triggers-satisfied check src/kalytical/core/job_culler.py:28
  F12/ST4/ST5 culler branches (debounce / fire / age-out)
             src/kalytical/core/job_culler.py:17-43
  J4/ST10    concurrency gate src/kalytical/core/dispatcher.py:70-96

Scale notes: the event side is unbounded; the DAG edge list and defs are
O(pipelines) and broadcast. The only shuffle in this family is the
window/groupBy keyed by (pipeline, exec) for oldest-wins — partitioned on
the same key the join produced, so AQE coalesces it locally.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from .common import SQL_NOW, now_expr, t

# Culler thresholds (reference reads these from config — job_culler.py:22,35;
# values chosen so all branches occur over the 30-day synthetic clock).
DEBOUNCE_S = 5 * 86400
AGE_OUT_S = 20 * 86400


def dag_fire_decisions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship (E1 steps 3-5 in batch form): for every success event, resolve
    downstream pipelines via the exploded adjacency and classify fire-now vs
    incubate per the any/all trigger operator (dispatcher.py:31-46).

    Plan shape: events >< broadcast(edges) hash join -> broadcast defs join ->
    single hash aggregate. No shuffle on the event side until the final
    low-cardinality rollup.
    """
    ev = t(spark, sf_dir, "lifecycle_events")
    edges = t(spark, sf_dir, "dag_edges")
    defs = t(spark, sf_dir, "pipeline_defs")
    n_deps = edges.groupBy("pipeline_uuid").agg(F.count("*").alias("n_deps"))
    meta = defs.select("pipeline_uuid", "trigger_operator").join(n_deps, "pipeline_uuid")

    triggers = ev.filter(
        (F.col("event_subtype") == "success") & ~F.col("disable_downstream")
    ).select(F.col("pipeline_uuid").alias("upstream_uuid"), "exec_uuid")

    downstream = triggers.join(
        F.broadcast(edges), "upstream_uuid"
    )  # edges.pipeline_uuid = the downstream candidate
    routed = downstream.join(F.broadcast(meta), "pipeline_uuid").withColumn(
        "route",
        F.when(
            (F.col("trigger_operator") == "any")
            | ((F.col("trigger_operator") == "all") & (F.col("n_deps") == 1)),
            F.lit("fire"),
        ).otherwise(F.lit("incubate")),
    )
    return routed.groupBy(
        F.col("pipeline_uuid").alias("downstream_uuid"),
        "trigger_operator",
        "route",
    ).agg(
        F.count("*").alias("n_trigger_events"),
        F.countDistinct("upstream_uuid").alias("n_upstreams_seen"),
    )


ORACLE_FIRE_DECISIONS = """
WITH n_deps AS (
  SELECT pipeline_uuid, COUNT(*) AS n_deps FROM dag_edges GROUP BY 1
), triggers AS (
  SELECT pipeline_uuid AS upstream_uuid, exec_uuid
  FROM lifecycle_events
  WHERE event_subtype = 'success' AND NOT disable_downstream
)
SELECT e.pipeline_uuid AS downstream_uuid,
       d.trigger_operator,
       CASE WHEN d.trigger_operator = 'any'
              OR (d.trigger_operator = 'all' AND n.n_deps = 1)
            THEN 'fire' ELSE 'incubate' END AS route,
       CAST(COUNT(*) AS BIGINT) AS n_trigger_events,
       CAST(COUNT(DISTINCT t.upstream_uuid) AS BIGINT) AS n_upstreams_seen
FROM triggers t
JOIN dag_edges e USING (upstream_uuid)
JOIN pipeline_defs d ON e.pipeline_uuid = d.pipeline_uuid
JOIN n_deps n ON e.pipeline_uuid = n.pipeline_uuid
GROUP BY 1, 2, 3
"""


def dag_oldest_waiting_credit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3/J7: for each success trigger event, exactly ONE incubating run per
    downstream pipeline gets the credit — the oldest whose trigger slot is
    still 'waiting' (data_provider.py:216-224). Window rank over
    (create_time, obj_id) keeps the choice total-ordered and deterministic."""
    ev = t(spark, sf_dir, "lifecycle_events")
    waiting = (
        t(spark, sf_dir, "incubating_triggers")
        .filter(F.col("trigger_value") == "waiting")
        .join(
            t(spark, sf_dir, "incubating_runs").select("obj_id", "create_time"),
            "obj_id",
        )
    )
    triggers = ev.filter(F.col("event_subtype") == "success").select(
        F.col("pipeline_uuid").alias("trigger_uuid"), "exec_uuid"
    )
    matched = triggers.join(waiting, "trigger_uuid")
    # identity = (exec_uuid, trigger_uuid, pipeline): exec_uuid alone is a
    # 32-bit md5 prefix, so two DISTINCT success events colliding on it
    # would otherwise merge into one window and emit one credit instead of
    # one per event (both engines share the partitioning, so the gate
    # cannot see the under-credit)
    w = W.partitionBy("exec_uuid", "trigger_uuid", "pipeline_uuid").orderBy(
        F.col("create_time").asc(), F.col("obj_id").asc()
    )
    return (
        matched.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("exec_uuid", "trigger_uuid", "pipeline_uuid", "obj_id", "create_time")
    )


ORACLE_OLDEST_WAITING = """
WITH waiting AS (
  SELECT it.obj_id, it.pipeline_uuid, it.trigger_uuid, ir.create_time
  FROM incubating_triggers it
  JOIN incubating_runs ir USING (obj_id)
  WHERE it.trigger_value = 'waiting'
), matched AS (
  SELECT e.exec_uuid, w.trigger_uuid, w.pipeline_uuid, w.obj_id, w.create_time,
         row_number() OVER (PARTITION BY e.exec_uuid, w.trigger_uuid, w.pipeline_uuid
                            ORDER BY w.create_time, w.obj_id) AS rn
  FROM lifecycle_events e
  JOIN waiting w ON e.pipeline_uuid = w.trigger_uuid
  WHERE e.event_subtype = 'success'
)
SELECT exec_uuid, trigger_uuid, pipeline_uuid, obj_id, create_time
FROM matched WHERE rn = 1
"""


def dag_all_satisfied(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F13/A4: per incubating run, is every trigger satisfied (bool_and) /
    any satisfied (bool_or) — the culler's completion predicate
    (job_culler.py:28, intended semantics of the buggy all())."""
    trig = t(spark, sf_dir, "incubating_triggers")
    sat = F.col("trigger_value") != "waiting"
    return trig.groupBy("obj_id", "pipeline_uuid").agg(
        F.count("*").alias("n_triggers"),
        F.sum(sat.cast("int")).alias("n_satisfied"),
        F.bool_and(sat).alias("all_satisfied"),
        F.bool_or(sat).alias("any_satisfied"),
    )


ORACLE_ALL_SATISFIED = """
SELECT obj_id, pipeline_uuid,
       CAST(COUNT(*) AS BIGINT) AS n_triggers,
       CAST(SUM(CASE WHEN trigger_value <> 'waiting' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_satisfied,
       bool_and(trigger_value <> 'waiting') AS all_satisfied,
       bool_or(trigger_value <> 'waiting') AS any_satisfied
FROM incubating_triggers
GROUP BY 1, 2
"""


def dag_cull_decisions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F12/ST4/ST5 (E3 in batch form): the culler's branch per incubating run,
    with the reference's branch precedence (job_culler.py:17-43):
      1. concurrency-deferred past the debounce   -> requeue (retry_count+1)
      2. dependency-deferred and all satisfied    -> fire
      3. older than the age-out TTL               -> cull
      4. otherwise                                -> keep
    """
    runs = t(spark, sf_dir, "incubating_runs")
    sat = (
        t(spark, sf_dir, "incubating_triggers")
        .groupBy("obj_id")
        .agg(F.bool_and(F.col("trigger_value") != "waiting").alias("all_satisfied"))
    )
    now = now_expr(spark, sf_dir)
    age = F.unix_timestamp(now) - F.unix_timestamp("create_time")
    joined = runs.join(sat, "obj_id", "left").withColumn(
        "all_satisfied", F.coalesce("all_satisfied", F.lit(False))
    )
    decision = (
        F.when(
            (F.col("reason") == "concurrency") & (F.col("age_s") > DEBOUNCE_S),
            F.lit("requeue"),
        )
        .when(
            (F.col("reason") == "dependencies") & F.col("all_satisfied"),
            F.lit("fire"),
        )
        .when(F.col("age_s") > AGE_OUT_S, F.lit("cull"))
        .otherwise(F.lit("keep"))
    )
    return (
        joined.withColumn("age_s", age)
        .withColumn("decision", decision)
        .withColumn(
            "next_retry_count",
            F.when(
                F.col("decision") == "requeue", F.col("retry_count") + 1
            ).otherwise(F.col("retry_count")),
        )
        .select(
            "obj_id", "pipeline_uuid", "reason", "retry_count",
            "age_s", "all_satisfied", "decision", "next_retry_count",
        )
    )


ORACLE_CULL_DECISIONS = f"""
WITH sat AS (
  SELECT obj_id, bool_and(trigger_value <> 'waiting') AS all_satisfied
  FROM incubating_triggers GROUP BY 1
), joined AS (
  SELECT r.obj_id, r.pipeline_uuid, r.reason, r.retry_count,
         date_diff('second', r.create_time, {SQL_NOW}) AS age_s,
         COALESCE(s.all_satisfied, FALSE) AS all_satisfied
  FROM incubating_runs r LEFT JOIN sat s USING (obj_id)
), decided AS (
  SELECT *,
         CASE WHEN reason = 'concurrency' AND age_s > {DEBOUNCE_S} THEN 'requeue'
              WHEN reason = 'dependencies' AND all_satisfied THEN 'fire'
              WHEN age_s > {AGE_OUT_S} THEN 'cull'
              ELSE 'keep' END AS decision
  FROM joined
)
SELECT obj_id, pipeline_uuid, reason, retry_count, age_s, all_satisfied, decision,
       CASE WHEN decision = 'requeue' THEN retry_count + 1 ELSE retry_count END
         AS next_retry_count
FROM decided
"""


def dag_concurrency_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4/ST10: origination events gated on the running-jobs snapshot — a
    pipeline with a live run and concurrency=false defers (dispatcher.py:70-96).
    The reference scans all pods per event (its acknowledged perf bug,
    engine.py:53); here the running set is aggregated once and broadcast."""
    ev = t(spark, sf_dir, "lifecycle_events")
    running = (
        t(spark, sf_dir, "running_jobs")
        .filter(F.col("engine_status").isin("running", "pending"))
        .select("pipeline_uuid")
        .distinct()
        .withColumn("has_running", F.lit(True))
    )
    defs = t(spark, sf_dir, "pipeline_defs").select("pipeline_uuid", "concurrency")
    orig = ev.filter(F.col("event_subtype") == "origination")
    return (
        orig.groupBy("pipeline_uuid")
        .agg(F.count("*").alias("n_originations"))
        .join(F.broadcast(running), "pipeline_uuid", "left")
        .withColumn("has_running", F.coalesce("has_running", F.lit(False)))
        .join(F.broadcast(defs), "pipeline_uuid")
        .withColumn(
            "decision",
            F.when(
                F.col("has_running") & ~F.col("concurrency"), F.lit("defer")
            ).otherwise(F.lit("submit")),
        )
    )


ORACLE_CONCURRENCY_GATE = """
WITH running AS (
  SELECT DISTINCT pipeline_uuid FROM running_jobs
  WHERE engine_status IN ('running', 'pending')
), orig AS (
  SELECT pipeline_uuid, CAST(COUNT(*) AS BIGINT) AS n_originations
  FROM lifecycle_events WHERE event_subtype = 'origination' GROUP BY 1
)
SELECT o.pipeline_uuid, o.n_originations,
       r.pipeline_uuid IS NOT NULL AS has_running,
       d.concurrency,
       CASE WHEN r.pipeline_uuid IS NOT NULL AND NOT d.concurrency
            THEN 'defer' ELSE 'submit' END AS decision
FROM orig o
LEFT JOIN running r USING (pipeline_uuid)
JOIN pipeline_defs d USING (pipeline_uuid)
"""


QUERIES: dict[str, tuple] = {
    "dag_fire_decisions": (dag_fire_decisions, ORACLE_FIRE_DECISIONS),
    "dag_oldest_waiting_credit": (dag_oldest_waiting_credit, ORACLE_OLDEST_WAITING),
    "dag_all_satisfied": (dag_all_satisfied, ORACLE_ALL_SATISFIED),
    "dag_cull_decisions": (dag_cull_decisions, ORACLE_CULL_DECISIONS),
    "dag_concurrency_gate": (dag_concurrency_gate, ORACLE_CONCURRENCY_GATE),
}
