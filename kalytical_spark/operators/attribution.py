"""Marketing-analytics pair over the event log: last-touch revenue
attribution — the report every growth warehouse ships
(the weekly cohort retention matrix sibling lives in timeseries.py), re-expressed as single-shuffle Spark
plans with exact-integer money/ratio arithmetic.

Scale notes:
- Attribution joins the purchase slice against the touch slice on
  user_id with a bounded lookback window; both sides are pushed-down
  type filters over the fact scan, the join is an equi-join on the same
  user_id partitioning, and the per-purchase argmax is map-side
  combinable. No windows over the full log.

The reference (westernspion/kalytical) has no analytics surface; this
family belongs to the mandated warehouse/product-analytics coverage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .common import t

ATTRIB_LOOKBACK_MS = 7 * 86_400_000  # 7-day last-touch window
_TOUCH_TYPES = ("click", "view")


def events_last_touch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue by last-touch channel: each purchase is attributed to the
    latest click/view by the same user in the preceding 7 days (ties
    impossible: (ts, event_id) is unique); purchases with no touch in
    the window report as 'direct'. Money stays exact cents (bigint)."""
    ev = t(spark, sf_dir, "events_ms").select(
        "user_id",
        "event_type",
        "event_id",
        F.unix_millis("ts").alias("tm"),
        (F.col("value").cast("decimal(12,4)") * 100).cast("bigint").alias("cents"),
    )
    purch = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("p_id"),
        F.col("tm").alias("p_tm"),
        "cents",
    )
    touch = ev.filter(F.col("event_type").isin(*_TOUCH_TYPES)).select(
        "user_id",
        F.col("event_type").alias("t_type"),
        F.col("event_id").alias("t_id"),
        F.col("tm").alias("t_tm"),
    )
    # the lookback predicate must be part of the JOIN condition: a
    # post-filter would delete purchases whose user has only
    # out-of-window touches instead of letting them fall through to
    # 'direct' (left-join rows exist per touch, not per purchase)
    j = purch.join(
        touch,
        (purch["user_id"] == touch["user_id"])
        & (touch["t_tm"] < purch["p_tm"])
        & (touch["t_tm"] >= purch["p_tm"] - ATTRIB_LOOKBACK_MS),
        "left",
    )
    last = j.groupBy("p_id").agg(
        F.min("cents").alias("cents"),
        # ordering key as a zero-padded string (tm, then event_id):
        # lexicographic == numeric for fixed width, and both engines'
        # arg-max accept it (DuckDB's arg_max rejects struct keys)
        F.max_by(
            F.col("t_type"),
            F.when(
                F.col("t_tm").isNotNull(),
                F.concat(
                    F.lpad(F.col("t_tm").cast("string"), 13, "0"),
                    F.lpad(F.col("t_id").cast("string"), 12, "0"),
                ),
            ),
        ).alias("channel"),
    )
    return (
        last.select(
            F.coalesce("channel", F.lit("direct")).alias("channel"), "cents"
        )
        .groupBy("channel")
        .agg(
            F.count("*").cast("bigint").alias("n_purchases"),
            F.sum("cents").cast("bigint").alias("revenue_cents"),
        )
    )


ORACLE_ATTRIBUTION = f"""
WITH ev AS (
  SELECT user_id, event_type, event_id, epoch_ms(ts) AS tm,
         CAST(CAST(value AS DECIMAL(12,4)) * 100 AS BIGINT) AS cents
  FROM events_ms
),
purch AS (
  SELECT user_id, event_id AS p_id, tm AS p_tm, cents
  FROM ev WHERE event_type = 'purchase'
),
touch AS (
  SELECT user_id, event_type AS t_type, event_id AS t_id, tm AS t_tm
  FROM ev WHERE event_type IN ('click', 'view')
),
j AS (
  SELECT p.p_id, p.cents, t.t_type, t.t_tm, t.t_id
  FROM purch p LEFT JOIN touch t
    ON p.user_id = t.user_id
   AND t.t_tm < p.p_tm AND t.t_tm >= p.p_tm - {ATTRIB_LOOKBACK_MS}
),
last AS (
  SELECT p_id, MIN(cents) AS cents,
         arg_max(t_type, CASE WHEN t_tm IS NOT NULL THEN
                 lpad(CAST(t_tm AS VARCHAR), 13, '0')
                 || lpad(CAST(t_id AS VARCHAR), 12, '0') END) AS channel
  FROM j GROUP BY p_id
)
SELECT COALESCE(channel, 'direct') AS channel,
       CAST(COUNT(*) AS BIGINT) AS n_purchases,
       CAST(SUM(cents) AS BIGINT) AS revenue_cents
FROM last
GROUP BY 1
"""


def events_linear_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-touch LINEAR attribution: every in-window touch shares the
    purchase's revenue equally. Exact integers: each touch is credited
    floor(cents / n_touches) milli-free, and the DIVISION REMAINDER goes
    to the LAST touch (so per-purchase credit sums exactly to cents and
    the channel totals conserve revenue to the cent — no float leakage).
    Purchases with no in-window touch credit 'direct' in full.

    Same join shape as last-touch; the per-purchase fan-out is bounded
    by the user's 7-day touch count."""
    ev = t(spark, sf_dir, "events_ms").select(
        "user_id",
        "event_type",
        "event_id",
        F.unix_millis("ts").alias("tm"),
        (F.col("value").cast("decimal(12,4)") * 100).cast("bigint").alias("cents"),
    )
    purch = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("p_id"),
        F.col("tm").alias("p_tm"),
        "cents",
    )
    touch = ev.filter(F.col("event_type").isin(*_TOUCH_TYPES)).select(
        "user_id",
        F.col("event_type").alias("t_type"),
        F.col("event_id").alias("t_id"),
        F.col("tm").alias("t_tm"),
    )
    j = purch.join(
        touch,
        (purch["user_id"] == touch["user_id"])
        & (touch["t_tm"] < purch["p_tm"])
        & (touch["t_tm"] >= purch["p_tm"] - ATTRIB_LOOKBACK_MS),
        "left",
    ).select("p_id", "cents", "t_type", "t_tm", "t_id")
    wp = F.expr(
        "count(t_id) OVER (PARTITION BY p_id)"
    )
    rk = F.expr(
        "row_number() OVER (PARTITION BY p_id ORDER BY t_tm, t_id)"
    )
    credited = j.select(
        "p_id",
        "cents",
        F.coalesce("t_type", F.lit("direct")).alias("channel"),
        wp.alias("n_touches"),
        rk.alias("rk"),
    ).withColumn(
        "credit",
        F.when(F.col("n_touches") == 0, F.col("cents")).otherwise(
            F.expr("cents div n_touches")
            + F.when(
                F.col("rk") == F.col("n_touches"),
                F.expr("cents % n_touches"),
            ).otherwise(F.lit(0))
        ),
    )
    return credited.groupBy("channel").agg(
        F.count("*").cast("bigint").alias("n_credits"),
        F.sum("credit").cast("bigint").alias("revenue_cents"),
    )


ORACLE_LINEAR = f"""
WITH ev AS (
  SELECT user_id, event_type, event_id, epoch_ms(ts) AS tm,
         CAST(CAST(value AS DECIMAL(12,4)) * 100 AS BIGINT) AS cents
  FROM events_ms
),
purch AS (
  SELECT user_id, event_id AS p_id, tm AS p_tm, cents
  FROM ev WHERE event_type = 'purchase'
),
touch AS (
  SELECT user_id, event_type AS t_type, event_id AS t_id, tm AS t_tm
  FROM ev WHERE event_type IN ('click', 'view')
),
j AS (
  SELECT p.p_id, p.cents, t.t_type, t.t_tm, t.t_id
  FROM purch p LEFT JOIN touch t
    ON p.user_id = t.user_id
   AND t.t_tm < p.p_tm AND t.t_tm >= p.p_tm - {ATTRIB_LOOKBACK_MS}
),
credited AS (
  SELECT p_id, cents,
         COALESCE(t_type, 'direct') AS channel,
         COUNT(t_id) OVER (PARTITION BY p_id) AS n_touches,
         ROW_NUMBER() OVER (PARTITION BY p_id ORDER BY t_tm, t_id) AS rk
  FROM j
)
SELECT channel,
       CAST(COUNT(*) AS BIGINT) AS n_credits,
       CAST(SUM(CASE WHEN n_touches = 0 THEN cents
                ELSE cents // n_touches
                     + CASE WHEN rk = n_touches THEN cents % n_touches
                            ELSE 0 END END) AS BIGINT) AS revenue_cents
FROM credited
GROUP BY channel
"""


QUERIES: dict[str, tuple] = {
    "events_last_touch_attribution": (
        events_last_touch_attribution,
        ORACLE_ATTRIBUTION,
    ),
    "events_linear_attribution": (events_linear_attribution, ORACLE_LINEAR),
}
