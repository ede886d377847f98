"""Schedule-adherence audit: expected cron fire times vs actual
origination events, matched per pipeline with a cogrouped Arrow UDF
(``groupBy().cogroup().applyInPandas``) — the two-sided pandas surface the
UD2 extension row has no other exerciser for.

Semantics: for every scheduled pipeline, enumerate the cron minutes due in
the trailing audit window (reusing scheduling.py's declarative 5-field
matcher — same grammar, same vixie dom/dow quirk), then for each expected
minute find the earliest origination within the tolerance; report per
pipeline how many expected fires happened, how many were answered, and
total/worst lateness in whole seconds (exact integer epoch arithmetic).

Cogroup is the right shape here: both sides are naturally grouped by
pipeline, the per-group matching is a tiny O(n_exp x n_act) array
broadcast (numpy), and neither side needs a pre-join — Spark delivers the
two aligned pandas frames per key. The DuckDB twin spells the same
matching as a range LEFT JOIN + MIN, so the cogrouped Python path is
value-hash-proven against pure SQL (the standing bar for Python paths in
this engine, VERDICT r2 UD2).

Scale: expected-side volume is |schedules| x window-minutes (catalog-
bounded, not data-bounded); the actual side is the origination slice of
the log. Cogroup shuffles both once on pipeline_uuid; per-group state is
a few hundred timestamps.
"""

from __future__ import annotations

from collections.abc import Iterator  # noqa: F401  (doc parity with siblings)

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .common import SQL_NOW, now_expr, t
from .scheduling import _DUCK_MATCH, cron_matched_minutes

AUDIT_WINDOW_MIN = 48 * 60  # trailing 48h of expected fires
TOLERANCE_S = 1800  # an origination within 30 min answers the fire
TOLERANCE_MIN = TOLERANCE_S // 60
# only CLOSED answer windows are audited: a fire due in the last
# TOLERANCE of the window could still be legitimately answered after
# `now`, and counting it as missed would understate adherence — expected
# fires span (now - window, now - tolerance]

_OUT_SCHEMA = T.StructType(
    [
        T.StructField("pipeline_uuid", T.StringType()),
        T.StructField("n_expected", T.IntegerType()),
        T.StructField("n_hit", T.IntegerType()),
        T.StructField("sum_lateness_s", T.LongType()),
        T.StructField("max_lateness_s", T.LongType()),
    ]
)


def _expected_fires(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(pipeline_uuid, exp_s): epoch seconds of every cron minute due in
    (now - window, now - tolerance] — closed answer windows only — per
    scheduled pipeline. Candidate grid is the DISTINCT schedule dimension
    x window minutes."""
    defs = t(spark, sf_dir, "pipeline_defs").filter(F.col("schedule").isNotNull())
    now = now_expr(spark, sf_dir)
    due = cron_matched_minutes(
        spark,
        defs.select("schedule"),
        now,
        TOLERANCE_MIN,
        AUDIT_WINDOW_MIN,
        sign=-1,
    ).select("schedule", F.unix_timestamp("cand_ts").alias("exp_s"))
    return defs.select("pipeline_uuid", "schedule").join(
        F.broadcast(due), "schedule"
    ).select("pipeline_uuid", "exp_s")


def _originations(spark: SparkSession, sf_dir: str) -> DataFrame:
    now = now_expr(spark, sf_dir)
    ev = t(spark, sf_dir, "lifecycle_events").filter(
        F.col("event_subtype") == "origination"
    )
    return ev.filter(
        (F.col("event_time") <= now)
        & (
            F.col("event_time")
            > now - F.expr(f"make_dt_interval(0, 0, {AUDIT_WINDOW_MIN}, 0)")
        )
    ).select(
        "pipeline_uuid",
        F.unix_timestamp(F.date_trunc("second", F.col("event_time"))).alias(
            "act_s"
        ),
    )


def _match_groups(exp_pdf: pd.DataFrame, act_pdf: pd.DataFrame) -> pd.DataFrame:
    if exp_pdf.empty:
        return pd.DataFrame(columns=[f.name for f in _OUT_SCHEMA.fields])
    pid = exp_pdf["pipeline_uuid"].iloc[0]
    exp = exp_pdf["exp_s"].to_numpy(dtype=np.int64)
    act = (
        act_pdf["act_s"].to_numpy(dtype=np.int64)
        if not act_pdf.empty
        else np.empty(0, dtype=np.int64)
    )
    if len(act):
        d = act[None, :] - exp[:, None]  # lateness matrix (n_exp x n_act)
        d = np.where((d >= 0) & (d < TOLERANCE_S), d, np.int64(1 << 62))
        best = d.min(axis=1)
        hits = best < (1 << 62)
        lat = best[hits]
    else:
        hits = np.zeros(len(exp), dtype=bool)
        lat = np.empty(0, dtype=np.int64)
    return pd.DataFrame(
        [
            {
                "pipeline_uuid": pid,
                "n_expected": len(exp),
                "n_hit": int(hits.sum()),
                "sum_lateness_s": int(lat.sum()) if len(lat) else 0,
                "max_lateness_s": int(lat.max()) if len(lat) else 0,
            }
        ]
    )


def dag_schedule_adherence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per scheduled pipeline: expected cron fires in the trailing window,
    how many an origination answered within tolerance, and the total/worst
    answer lateness (whole seconds)."""
    exp = _expected_fires(spark, sf_dir)
    act = _originations(spark, sf_dir)
    return (
        exp.groupBy("pipeline_uuid")
        .cogroup(act.groupBy("pipeline_uuid"))
        .applyInPandas(_match_groups, schema=_OUT_SCHEMA)
    )


ORACLE_ADHERENCE = f"""
WITH now_t AS (SELECT date_trunc('minute', {SQL_NOW}) AS now_min,
                      {SQL_NOW} AS now_ts),
grid AS (
  SELECT s.schedule,
         n.now_min - INTERVAL 1 MINUTE * g.m AS cand_ts
  FROM (SELECT DISTINCT schedule FROM pipeline_defs WHERE schedule IS NOT NULL) s
  CROSS JOIN now_t n
  CROSS JOIN (SELECT unnest(generate_series({TOLERANCE_MIN}, {AUDIT_WINDOW_MIN - 1})) AS m) g
),
exp AS (
  SELECT d.pipeline_uuid,
         CAST(epoch(g.cand_ts) AS BIGINT) AS exp_s
  FROM (SELECT schedule, cand_ts FROM grid WHERE {_DUCK_MATCH}) g
  JOIN pipeline_defs d ON d.schedule = g.schedule
),
act AS (
  SELECT e.pipeline_uuid,
         CAST(epoch(date_trunc('second', e.event_time)) AS BIGINT) AS act_s
  FROM lifecycle_events e CROSS JOIN now_t n
  WHERE e.event_subtype = 'origination'
    AND e.event_time <= n.now_ts
    AND e.event_time > n.now_ts - INTERVAL 1 MINUTE * {AUDIT_WINDOW_MIN}
),
lat AS (
  SELECT e.pipeline_uuid, e.exp_s,
         MIN(CASE WHEN a.act_s >= e.exp_s AND a.act_s - e.exp_s < {TOLERANCE_S}
                  THEN a.act_s - e.exp_s END) AS lat_s
  FROM exp e
  LEFT JOIN act a ON a.pipeline_uuid = e.pipeline_uuid
  GROUP BY 1, 2
)
SELECT pipeline_uuid,
       CAST(COUNT(*) AS INTEGER) AS n_expected,
       CAST(COUNT(lat_s) AS INTEGER) AS n_hit,
       CAST(COALESCE(SUM(lat_s), 0) AS BIGINT) AS sum_lateness_s,
       CAST(COALESCE(MAX(lat_s), 0) AS BIGINT) AS max_lateness_s
FROM lat
GROUP BY 1
"""


QUERIES: dict[str, tuple] = {
    "dag_schedule_adherence": (dag_schedule_adherence, ORACLE_ADHERENCE),
}
