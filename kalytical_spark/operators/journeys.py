"""User-journey analytics: the event-type transition matrix and session
path-trigram mining — the product-analytics family (what follows what, and
which 3-step paths dominate) over the same event log the sessionization /
funnel / attribution operators use.

Shapes: both are per-user (or per-session) windows ordered by
(ts, event_id) feeding map-side-combinable counts — no self-joins, no
collection; the transition matrix is |types|^2 rows and the trigram
report is a TakeOrdered top-k. Shares the ONE sessionization definition
(events.with_session_ids), so session boundaries cannot drift from the
session summary or the streaming session_window twin.

Determinism: row-share ratios are integer milli (1000 * n div row_total);
the top-k carries a full lexicographic tie-break.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from .common import t

_TRIGRAM_TOPK = 20


def events_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(from_type, to_type, n, row_share_milli): consecutive event-type
    transition counts per user-ordered stream, with each row's share of
    its from-type total in integer milli. The first-order Markov picture
    of user behavior."""
    ev = t(spark, sf_dir, "events_ms")
    w = W.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    pairs = (
        ev.select(
            F.col("event_type").alias("from_type"),
            F.lead("event_type").over(w).alias("to_type"),
        )
        .filter(F.col("to_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count("*").cast("bigint").alias("n"))
    )
    return pairs.select(
        "from_type",
        "to_type",
        "n",
        F.expr(
            "CAST(1000 * n div SUM(n) OVER (PARTITION BY from_type) AS BIGINT)"
        ).alias("row_share_milli"),
    )


ORACLE_TRANSITIONS = """
WITH pairs AS (
  SELECT from_type, to_type, CAST(COUNT(*) AS BIGINT) AS n
  FROM (
    SELECT event_type AS from_type,
           lead(event_type) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS to_type
    FROM events_ms
  ) WHERE to_type IS NOT NULL
  GROUP BY 1, 2
)
SELECT from_type, to_type, n,
       CAST(1000 * n // SUM(n) OVER (PARTITION BY from_type) AS BIGINT)
         AS row_share_milli
FROM pairs
"""


def events_session_path_trigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top session path trigrams: within each session (shared
    sessionization definition), the ordered event-type 3-grams, counted
    corpus-wide and top-_TRIGRAM_TOPK reported (count desc, then
    lexicographic). The 'which 3-step journeys dominate' report."""
    from .events import with_session_ids

    ev = with_session_ids(t(spark, sf_dir, "events_ms"))
    w = W.partitionBy("user_id", "sess_id").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    tri = (
        ev.select(
            F.col("event_type").alias("t1"),
            F.lead("event_type", 1).over(w).alias("t2"),
            F.lead("event_type", 2).over(w).alias("t3"),
        )
        .filter(F.col("t3").isNotNull())
        .groupBy("t1", "t2", "t3")
        .agg(F.count("*").cast("bigint").alias("n"))
    )
    return tri.orderBy(F.desc("n"), "t1", "t2", "t3").limit(_TRIGRAM_TOPK)


ORACLE_TRIGRAMS = f"""
WITH flagged AS (
  SELECT user_id, ts, event_id, event_type,
         CASE WHEN lag(ts) OVER w IS NULL
                OR date_diff('second', lag(ts) OVER w, ts) > 1800
              THEN 1 ELSE 0 END AS new_sess
  FROM events_ms
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sess AS (
  SELECT user_id, ts, event_id, event_type,
         SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING) AS sess_id
  FROM flagged
), tri AS (
  SELECT t1, t2, t3, CAST(COUNT(*) AS BIGINT) AS n
  FROM (
    SELECT event_type AS t1,
           lead(event_type, 1) OVER w2 AS t2,
           lead(event_type, 2) OVER w2 AS t3
    FROM sess
    WINDOW w2 AS (PARTITION BY user_id, sess_id ORDER BY ts, event_id)
  ) WHERE t3 IS NOT NULL
  GROUP BY 1, 2, 3
)
SELECT t1, t2, t3, n FROM tri
ORDER BY n DESC, t1, t2, t3 LIMIT {_TRIGRAM_TOPK}
"""


QUERIES: dict[str, tuple] = {
    "events_transition_matrix": (events_transition_matrix, ORACLE_TRANSITIONS),
    "events_session_path_trigrams": (
        events_session_path_trigrams,
        ORACLE_TRIGRAMS,
    ),
}
