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


FUNNEL_STEP_WINDOW_MS = 86_400_000  # each step within 24h of the previous


def events_funnel_ordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered, time-constrained funnel: signup -> click -> purchase,
    each step strictly after the previous one and within 24 hours of it.
    The bitmap family answers the UNORDERED "did A and B" question
    (bitmaps.py); this is the sequenced product-analytics funnel with
    per-step earliest-qualifying-event semantics (min-ts per user at
    every step, so one pass per step — no path explosion).

    Plan: three per-type slices of the fact table, each a
    map-side-combinable min aggregate keyed by user, chained by
    user-keyed joins (step N's slice joins step N-1's per-user earliest
    time). At 100 TB each slice is a pushed-down type filter, the join
    keys are the same user_id hash partitioning re-used stage to stage,
    and nothing wider than (user, ts) shuffles. Timestamps compare as
    epoch millis (bigint) in both engines.

    One summary row: step counts + integer milli conversion rates."""
    ev = t(spark, sf_dir, "events_ms").select(
        "user_id", "event_type", F.unix_millis("ts").alias("tm")
    )
    s1 = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("tm").alias("t1"))
    )
    s2 = (
        ev.filter(F.col("event_type") == "click")
        .join(s1, "user_id")
        .filter(
            (F.col("tm") > F.col("t1"))
            & (F.col("tm") <= F.col("t1") + FUNNEL_STEP_WINDOW_MS)
        )
        .groupBy("user_id")
        .agg(F.min("tm").alias("t2"))
    )
    s3 = (
        ev.filter(F.col("event_type") == "purchase")
        .join(s2, "user_id")
        .filter(
            (F.col("tm") > F.col("t2"))
            & (F.col("tm") <= F.col("t2") + FUNNEL_STEP_WINDOW_MS)
        )
        .groupBy("user_id")
        .agg(F.min("tm").alias("t3"))
    )
    counts = (
        s1.agg(F.count("*").cast("bigint").alias("n_signup"))
        .crossJoin(F.broadcast(s2.agg(F.count("*").cast("bigint").alias("n_click"))))
        .crossJoin(
            F.broadcast(s3.agg(F.count("*").cast("bigint").alias("n_purchase")))
        )
    )
    return counts.select(
        "n_signup",
        "n_click",
        "n_purchase",
        F.expr("CAST(1000 * n_click div n_signup AS BIGINT)").alias(
            "conv_click_milli"
        ),
        F.expr(
            "CASE WHEN n_click > 0 THEN CAST(1000 * n_purchase div n_click AS BIGINT) "
            "ELSE 0 END"
        ).alias("conv_purchase_milli"),
        F.expr("CAST(1000 * n_purchase div n_signup AS BIGINT)").alias(
            "conv_overall_milli"
        ),
    )


ORACLE_FUNNEL = f"""
WITH ev AS (
  SELECT user_id, event_type, epoch_ms(ts) AS tm FROM events_ms
),
s1 AS (
  SELECT user_id, MIN(tm) AS t1 FROM ev WHERE event_type = 'signup'
  GROUP BY user_id
),
s2 AS (
  SELECT e.user_id, MIN(e.tm) AS t2
  FROM ev e JOIN s1 USING (user_id)
  WHERE e.event_type = 'click' AND e.tm > s1.t1
    AND e.tm <= s1.t1 + {FUNNEL_STEP_WINDOW_MS}
  GROUP BY e.user_id
),
s3 AS (
  SELECT e.user_id, MIN(e.tm) AS t3
  FROM ev e JOIN s2 USING (user_id)
  WHERE e.event_type = 'purchase' AND e.tm > s2.t2
    AND e.tm <= s2.t2 + {FUNNEL_STEP_WINDOW_MS}
  GROUP BY e.user_id
),
counts AS (
  SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM s1) AS n_signup,
         (SELECT CAST(COUNT(*) AS BIGINT) FROM s2) AS n_click,
         (SELECT CAST(COUNT(*) AS BIGINT) FROM s3) AS n_purchase
)
SELECT n_signup, n_click, n_purchase,
       CAST(1000 * n_click // n_signup AS BIGINT) AS conv_click_milli,
       CASE WHEN n_click > 0 THEN CAST(1000 * n_purchase // n_click AS BIGINT)
            ELSE 0 END AS conv_purchase_milli,
       CAST(1000 * n_purchase // n_signup AS BIGINT) AS conv_overall_milli
FROM counts
"""


def sessions_peak_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak concurrent sessions per calendar day (the capacity-planning
    sweep): sessions become (+1 at start, -1 after end) deltas, deltas
    collapse to ONE NET ROW PER SECOND (map-side combinable), and a
    running sum per day finds each day's maximum and the first second
    attaining it. Sessions crossing midnight (rare under the 30-minute
    gap rule but legal) are clipped into each day they overlap, so both
    days count them while active.

    Scale: the only corpus-sized work is the sessionization groupBy; the
    sweep's window is partitioned by DAY over at most 2 x 86400 rows per
    partition REGARDLESS of corpus size (per-second collapse first) — the
    repo's no-unpartitioned-window rule holds with a hard row bound
    rather than a digit trick. Shares events.with_session_ids, the one
    sessionization definition."""
    from .events import with_session_ids

    ev = t(spark, sf_dir, "events_ms")
    sess = (
        with_session_ids(ev)
        .groupBy("user_id", "sess_id")
        .agg(
            F.unix_seconds(F.min("ts")).alias("s"),
            F.unix_seconds(F.max("ts")).alias("e"),
        )
    )
    # clip to calendar (UTC epoch) days: one row per (session,
    # day-it-overlaps); pure epoch-day arithmetic, no timezone surface
    days = sess.select(
        "s",
        "e",
        F.explode(
            F.sequence(F.expr("s div 86400"), F.expr("e div 86400"))
        ).alias("dnum"),
    ).select(
        F.expr("date_from_unix_date(CAST(dnum AS INT))").alias("day"),
        F.greatest(F.col("s"), F.col("dnum") * 86400).alias("cs"),
        F.least(F.col("e"), F.col("dnum") * 86400 + 86399).alias("ce"),
    )
    deltas = (
        days.select("day", F.col("cs").alias("t"), F.lit(1).alias("d"))
        .unionByName(
            days.select("day", (F.col("ce") + 1).alias("t"), F.lit(-1).alias("d"))
        )
        .groupBy("day", "t")
        .agg(F.sum("d").alias("net"))
    )
    wday = W.partitionBy("day").orderBy("t").rowsBetween(W.unboundedPreceding, 0)
    swept = deltas.withColumn("conc", F.sum("net").over(wday))
    return swept.groupBy("day").agg(
        F.max("conc").cast("bigint").alias("peak_concurrency"),
        F.min_by(F.col("t"), F.struct((-F.col("conc")).alias("nc"), F.col("t"))).alias(
            "first_peak_epoch_s"
        ),
    )


ORACLE_PEAK = """
WITH flagged AS (
  SELECT user_id, ts, event_id,
         CASE WHEN lag(ts) OVER w IS NULL
                OR date_diff('second', lag(ts) OVER w, ts) > 1800
              THEN 1 ELSE 0 END AS new_sess
  FROM events_ms
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), numbered AS (
  SELECT user_id, ts,
         SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING) AS sess_id
  FROM flagged
), sess AS (
  SELECT user_id, sess_id,
         epoch_ms(MIN(ts)) // 1000 AS s,
         epoch_ms(MAX(ts)) // 1000 AS e
  FROM numbered GROUP BY user_id, sess_id
), clipped AS (
  SELECT DATE '1970-01-01' + CAST(dnum AS INTEGER) AS day,
         GREATEST(s, dnum * 86400) AS cs,
         LEAST(e, dnum * 86400 + 86399) AS ce
  FROM sess, unnest(generate_series(s // 86400, e // 86400)) AS u(dnum)
), deltas AS (
  SELECT day, t, SUM(d) AS net FROM (
    SELECT day, cs AS t, 1 AS d FROM clipped
    UNION ALL
    SELECT day, ce + 1 AS t, -1 AS d FROM clipped
  ) GROUP BY day, t
), swept AS (
  SELECT day, t,
         SUM(net) OVER (PARTITION BY day ORDER BY t ROWS UNBOUNDED PRECEDING)
           AS conc
  FROM deltas
), swept2 AS (
  SELECT day, t, conc, MAX(conc) OVER (PARTITION BY day) AS mx FROM swept
)
SELECT day,
       CAST(MAX(conc) AS BIGINT) AS peak_concurrency,
       CAST(MIN(t) FILTER (WHERE conc = mx) AS BIGINT) AS first_peak_epoch_s
FROM swept2
GROUP BY day
"""


QUERIES: dict[str, tuple] = {
    "events_transition_matrix": (events_transition_matrix, ORACLE_TRANSITIONS),
    "events_session_path_trigrams": (
        events_session_path_trigrams,
        ORACLE_TRIGRAMS,
    ),
    "events_funnel_ordered": (events_funnel_ordered, ORACLE_FUNNEL),
    "sessions_peak_concurrency": (sessions_peak_concurrency, ORACLE_PEAK),
}
