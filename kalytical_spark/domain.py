"""Kalytical-domain fixture tables derived deterministically from the driver
testdata, written in dialect-shared SQL that parses and evaluates identically
in Spark SQL and DuckDB. The same text is (a) executed by Spark to
materialize the domain views and (b) prepended as a WITH-block to every
DuckDB oracle query — so fixture parity holds by construction.

Schema sources (see SURVEY.md section 1 / FIXTURES.md section B):
  pipeline_defs    <- reference PipelineHeaderModel (pipeline_models.py:22-43)
  dag_edges        <- triggers_on.pipeline_uuids adjacency (pipeline_models.py:11-19)
  lifecycle_events <- LifecycleEventModel (runtime_models.py:5-32)
  running_jobs     <- RunningPipelineModel (runtime_models.py:35-49)
  incubating_runs / incubating_triggers <- IncubatingPipelineModel
                      (runtime_models.py:52-65, triggers map exploded to rows
                      because DuckDB and Spark MAP literals/hashing differ)

Dialect-shared subset used: ||, CAST(x AS STRING/INT/BIGINT), md5(), substr(),
CASE, %, CROSS JOIN, UNION ALL, INTERVAL 1 SECOND * n, date_trunc. Derivations
scale with the scale factor (supplier count drives the pipeline population,
events drive the event log) so benchmarks exercise real volumes.
"""

from __future__ import annotations

# Ordered list of (name, select_sql). The WITH-block is assembled in order so
# later CTEs may reference earlier ones.
_CTES: list[tuple[str, str]] = [
    (
        "sup_n",
        "SELECT COUNT(*) AS n FROM supplier",
    ),
    # events with ts truncated to millisecond: the raw column is parquet
    # TIMESTAMP(NANOS); Spark holds micros, DuckDB nanos — millisecond
    # truncation puts both engines on identical values.
    (
        "events_ms",
        """
        SELECT event_id, date_trunc('millisecond', ts) AS ts,
               user_id, event_type, value, props
        FROM events
        """,
    ),
    # --- pipeline catalog (one pipeline per supplier; ~10/100/1000 by sf) ---
    (
        "pipeline_defs",
        """
        SELECT
          'p-' || CAST(s_suppkey AS STRING)                        AS pipeline_uuid,
          'pipeline for ' || s_name                                AS description,
          CAST(s_suppkey % 4 AS INT)                               AS retry_max,
          (s_suppkey % 5 = 0)                                      AS concurrency,
          CASE WHEN s_suppkey % 2 = 0 THEN 'K8sJobEngine'
               ELSE 'LocalEngine' END                              AS engine,
          CASE WHEN s_suppkey % 10 = 0 THEN
            CASE WHEN s_suppkey % 50 = 0  THEN '*/15 * * * *'
                 WHEN s_suppkey % 50 = 10 THEN '30 2 * * *'
                 WHEN s_suppkey % 50 = 20 THEN '0 9-17/2 * * 1-5'
                 WHEN s_suppkey % 50 = 30 THEN '0 0 1 * 1'
                 WHEN s_suppkey % 50 = 40 THEN '30 6 * * 7'
                 ELSE '0 * * * *' END
          END                                                      AS schedule,
          CASE WHEN s_suppkey % 7 = 0 THEN NULL
               WHEN s_suppkey % 3 = 0 THEN 'all'
               ELSE 'any' END                                      AS trigger_operator,
          CASE WHEN s_suppkey % 6 = 0 THEN 'team-a'
               WHEN s_suppkey % 6 = 1 THEN 'team-b' END            AS tag_team,
          'tier-' || CAST(s_suppkey % 3 AS STRING)                 AS tag_tier,
          '{"steps": ' || CAST(1 + s_suppkey % 5 AS STRING) || '}' AS pipeline_body
        FROM supplier
        """,
    ),
    # --- DAG adjacency: upstream edges for every non-root pipeline.
    # (s+1)%n and (s+17)%n never self-loop for n in {10,100,1000} and never
    # collide with each other (16 % n != 0).
    (
        "dag_edges",
        """
        SELECT 'p-' || CAST(s_suppkey AS STRING)            AS pipeline_uuid,
               'p-' || CAST((s_suppkey + 1) % (SELECT n FROM sup_n) AS STRING)  AS upstream_uuid
        FROM supplier
        WHERE s_suppkey % 7 <> 0
        UNION ALL
        SELECT 'p-' || CAST(s_suppkey AS STRING)            AS pipeline_uuid,
               'p-' || CAST((s_suppkey + 17) % (SELECT n FROM sup_n) AS STRING) AS upstream_uuid
        FROM supplier
        WHERE s_suppkey % 7 <> 0 AND s_suppkey % 2 = 0
        """,
    ),
    # --- lifecycle event log (one kalytical event per driver event row) ---
    (
        "lifecycle_events",
        """
        SELECT
          'job_exec_update'                                  AS event_type,
          CASE WHEN event_id % 10 < 4 THEN 'success'
               WHEN event_id % 10 < 6 THEN 'running'
               WHEN event_id % 10 < 7 THEN 'failure'
               WHEN event_id % 10 < 8 THEN 'origination'
               ELSE 'submitted' END                          AS event_subtype,
          'p-' || CAST(user_id % (SELECT n FROM sup_n) AS STRING)                AS pipeline_uuid,
          substr(md5(CAST(event_id AS STRING)), 1, 8)        AS exec_uuid,
          ts                                                 AS event_time,
          ts + INTERVAL 1 SECOND * (event_id % 30)           AS received_time,
          CAST(event_id % 5 AS INT)                          AS retry_count,
          (event_id % 17 = 0)                                AS disable_downstream
        FROM events_ms
        """,
    ),
    # --- running-jobs snapshot (engine.py:171-197 unmarshal analog) ---
    (
        "running_jobs",
        """
        SELECT
          'p-' || CAST(user_id % (SELECT n FROM sup_n) AS STRING)                        AS pipeline_uuid,
          substr(md5('run' || CAST(event_id AS STRING)), 1, 8)       AS exec_uuid,
          CASE WHEN event_id % 2 = 0 THEN 'K8sJobEngine'
               ELSE 'LocalEngine' END                                AS engine,
          'pod-' || substr(md5('run' || CAST(event_id AS STRING)), 1, 10)
                                                                     AS engine_tracking_id,
          CASE CAST(event_id % 7 AS INT)
               WHEN 0 THEN 'running' WHEN 1 THEN 'waiting'
               WHEN 2 THEN 'pending' WHEN 3 THEN 'success'
               WHEN 4 THEN 'failed'  WHEN 5 THEN 'aborted'
               ELSE 'timed_out' END                                  AS engine_status,
          ts                                                         AS start_time,
          CASE WHEN event_id % 7 >= 3
               THEN ts + INTERVAL 1 SECOND * (60 + event_id % 600) END AS end_time
        FROM events_ms
        WHERE event_id % 3 = 0
        """,
    ),
    # --- incubation store (run_incubation analog, data_provider.py:200-230) ---
    (
        "incubating_runs",
        """
        SELECT
          substr(md5('inc' || CAST(event_id AS STRING)), 1, 12) AS obj_id,
          'p-' || CAST(user_id % (SELECT n FROM sup_n) AS STRING)                   AS pipeline_uuid,
          ts                                                    AS create_time,
          CASE WHEN event_id % 4 = 0 THEN 'concurrency'
               ELSE 'dependencies' END                          AS reason,
          CAST(event_id % 3 AS INT)                             AS retry_count
        FROM events_ms
        WHERE event_id % 5 = 0
        """,
    ),
    # triggers map exploded to (obj_id, trigger_uuid, trigger_value) rows;
    # value is 'waiting' or the satisfying exec_uuid (data_provider.py:210-224)
    (
        "incubating_triggers",
        """
        SELECT
          i.obj_id,
          i.pipeline_uuid,
          e.upstream_uuid AS trigger_uuid,
          CASE WHEN substr(md5(i.obj_id || e.upstream_uuid), 9, 1) < '8'
               THEN 'waiting'
               ELSE substr(md5(i.obj_id || e.upstream_uuid), 1, 8)
          END             AS trigger_value
        FROM incubating_runs i
        JOIN dag_edges e ON i.pipeline_uuid = e.pipeline_uuid
        """,
    ),
]

DOMAIN_TABLES = [name for name, _ in _CTES]

BASE_TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def with_block() -> str:
    """The full WITH-block prefix (valid in Spark SQL and DuckDB)."""
    parts = ",\n".join(f"{name} AS (\n{sql}\n)" for name, sql in _CTES)
    return f"WITH {parts}\n"


def oracle(query_sql: str) -> str:
    """Wrap an oracle query with the shared fixture WITH-block; a body that
    opens its own WITH-clause is merged into the shared one (RECURSIVE moves
    to the front of the merged block, where SQL requires it)."""
    body = query_sql.strip()
    if body.upper().startswith("WITH RECURSIVE"):
        block = with_block()
        assert block.startswith("WITH ")
        return "WITH RECURSIVE " + block[5:] + "," + body[len("WITH RECURSIVE") :]
    if body.upper().startswith("WITH"):
        return with_block() + "," + body[4:]
    return with_block() + body


def domain_select(name: str) -> str:
    """A standalone `WITH ... SELECT * FROM <name>` for materializing one
    derived table (used by the Spark-side catalog)."""
    return with_block() + f"SELECT * FROM {name}"
