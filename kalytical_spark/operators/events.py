"""Event-history operators: the reference's event_history queries plus the
event-log analytics a Spark engine adds for free (SURVEY.md section 2.2,
2.4-2.5, 2.8).

Reference citations (paths relative to /root/reference):
  F6/F7/O1/A5  history time-range + sort desc + limit
               src/kalytical/core/data_provider.py:133-147
  ST2          subtype routing     src/kalytical/core/dispatcher.py:15-29
  A6/J6        retry-cap check     src/kalytical/core/dispatcher.py:48-58
  ST9          event vs ingest time src/kalytical/core/data_provider.py:128-131
  C7           props JSON decode   src/kalytical/core/mq_poller.py:31-36

Scale notes: the event log is the unbounded table. Every aggregation below
is a single hash-aggregate keyed on low-cardinality columns (map-side
partial agg, no skew); the top-k is TakeOrderedAndProject (no global sort);
the defs join side is broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from .common import SQL_NOW, now_expr, t


def events_recent_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F6+F7+O1: newest failure events in the last 7 days (relative to the
    deterministic data clock), top-20 — Spark plans this as
    TakeOrderedAndProject, never a full sort."""
    ev = t(spark, sf_dir, "lifecycle_events")
    now = now_expr(spark, sf_dir)
    return (
        ev.filter(F.col("event_subtype") == "failure")
        .filter(F.col("received_time") >= now - F.expr("INTERVAL 7 DAYS"))
        .orderBy(F.desc("received_time"), F.desc("exec_uuid"))
        .limit(20)
        .select("event_subtype", "pipeline_uuid", "exec_uuid", "event_time", "received_time", "retry_count")
    )


ORACLE_RECENT_TOPK = f"""
SELECT event_subtype, pipeline_uuid, exec_uuid, event_time, received_time, retry_count
FROM lifecycle_events
WHERE event_subtype = 'failure'
  AND received_time >= {SQL_NOW} - INTERVAL 7 DAY
ORDER BY received_time DESC, exec_uuid DESC
LIMIT 20
"""


def events_subtype_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST2 as batch: route-by-subtype counters (dispatcher handler fan-out)."""
    ev = t(spark, sf_dir, "lifecycle_events")
    return ev.groupBy("event_subtype").agg(
        F.count("*").alias("n_events"),
        F.countDistinct("pipeline_uuid").alias("n_pipelines"),
        F.sum("retry_count").alias("total_retries"),
        F.sum(F.col("disable_downstream").cast("int")).alias("n_disabled"),
    )


ORACLE_SUBTYPE_COUNTS = """
SELECT event_subtype,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(COUNT(DISTINCT pipeline_uuid) AS BIGINT) AS n_pipelines,
       CAST(SUM(retry_count) AS BIGINT) AS total_retries,
       CAST(SUM(CASE WHEN disable_downstream THEN 1 ELSE 0 END) AS BIGINT) AS n_disabled
FROM lifecycle_events
GROUP BY event_subtype
"""


def events_retry_exceeded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6+J6: failure events at-or-over the pipeline's retry_max — the
    MaxPipelineRetryReached condition (dispatcher.py:51-53), defs broadcast."""
    ev = t(spark, sf_dir, "lifecycle_events")
    defs = t(spark, sf_dir, "pipeline_defs").select("pipeline_uuid", "retry_max")
    return (
        ev.filter(F.col("event_subtype") == "failure")
        .join(F.broadcast(defs), "pipeline_uuid")
        .filter(F.col("retry_count") >= F.col("retry_max"))
        .groupBy("pipeline_uuid", "retry_max")
        .agg(
            F.count("*").alias("n_exceeded"),
            F.max("retry_count").alias("max_retry_seen"),
        )
    )


ORACLE_RETRY_EXCEEDED = """
SELECT e.pipeline_uuid, d.retry_max,
       CAST(COUNT(*) AS BIGINT) AS n_exceeded,
       MAX(e.retry_count) AS max_retry_seen
FROM lifecycle_events e
JOIN pipeline_defs d USING (pipeline_uuid)
WHERE e.event_subtype = 'failure' AND e.retry_count >= d.retry_max
GROUP BY e.pipeline_uuid, d.retry_max
"""


def events_ingest_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST9/C6: event-time vs ingest-time lag distribution per subtype (the
    received_time stamp of data_provider.py:130)."""
    ev = t(spark, sf_dir, "lifecycle_events")
    lag = F.unix_timestamp("received_time") - F.unix_timestamp("event_time")
    return ev.groupBy("event_subtype").agg(
        F.min(lag).alias("min_lag_s"),
        F.max(lag).alias("max_lag_s"),
        (F.sum(lag).cast("double") / F.count("*").cast("double")).alias("avg_lag_s"),
    )


ORACLE_INGEST_LAG = """
SELECT event_subtype,
       MIN(date_diff('second', event_time, received_time)) AS min_lag_s,
       MAX(date_diff('second', event_time, received_time)) AS max_lag_s,
       CAST(CAST(SUM(date_diff('second', event_time, received_time)) AS BIGINT) AS DOUBLE)
         / CAST(COUNT(*) AS DOUBLE) AS avg_lag_s
FROM lifecycle_events
GROUP BY event_subtype
"""


def events_daily_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-bucketed rollup over the raw event stream (the windowed-agg
    extension the reference lacks, SURVEY.md section 2.8 note)."""
    ev = t(spark, sf_dir, "events_ms")
    from .common import dsum

    return (
        ev.withColumn("day", F.to_date("ts"))
        .groupBy("day", "event_type")
        .agg(
            F.count("*").alias("n"),
            F.countDistinct("user_id").alias("n_users"),
            dsum("value").alias("sum_value"),
        )
    )


ORACLE_DAILY_ROLLUP = """
SELECT CAST(ts AS DATE) AS day, event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
       CAST(SUM(CAST(value AS DECIMAL(12,4))) AS DOUBLE) AS sum_value
FROM events_ms
GROUP BY 1, 2
"""


def with_session_ids(ev: DataFrame) -> DataFrame:
    """Attach per-user session ids (30-minute inactivity gap split) — the
    ONE definition of sessionization, shared by the session summary below
    and the journey-path miners (journeys.py), so session boundaries can
    never drift between consumers."""
    order = [F.col("ts").asc(), F.col("event_id").asc()]
    w = W.partitionBy("user_id").orderBy(*order)
    gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
    return ev.withColumn(
        "new_sess", (gap.isNull() | (gap > 1800)).cast("int")
    ).withColumn(
        "sess_id", F.sum("new_sess").over(w.rowsBetween(W.unboundedPreceding, 0))
    )


def events_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization: per-user sessions split on 30-minute inactivity gaps
    (lag + cumulative-sum pattern; streaming twin is session_window)."""
    ev = t(spark, sf_dir, "events_ms")
    with_sess = with_session_ids(ev)
    per_sess = with_sess.groupBy("user_id", "sess_id").agg(
        F.count("*").alias("n_events"),
        (F.unix_timestamp(F.max("ts")) - F.unix_timestamp(F.min("ts"))).alias("dur_s"),
    )
    return per_sess.groupBy("user_id").agg(
        F.max("sess_id").alias("n_sessions"),
        F.sum("n_events").alias("n_events"),
        F.max("n_events").alias("max_session_events"),
        F.max("dur_s").alias("max_session_dur_s"),
    )


ORACLE_SESSIONIZATION = """
WITH flagged AS (
  SELECT user_id, ts, event_id,
         CASE WHEN lag(ts) OVER w IS NULL
                OR date_diff('second', lag(ts) OVER w, ts) > 1800
              THEN 1 ELSE 0 END AS new_sess
  FROM events_ms
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sess AS (
  SELECT user_id, ts,
         SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING) AS sess_id
  FROM flagged
), per_sess AS (
  SELECT user_id, sess_id,
         CAST(COUNT(*) AS BIGINT) AS n_events,
         date_diff('second', MIN(ts), MAX(ts)) AS dur_s
  FROM sess GROUP BY 1, 2
)
SELECT user_id,
       CAST(MAX(sess_id) AS BIGINT) AS n_sessions,
       CAST(SUM(n_events) AS BIGINT) AS n_events,
       CAST(MAX(n_events) AS BIGINT) AS max_session_events,
       CAST(MAX(dur_s) AS BIGINT) AS max_session_dur_s
FROM per_sess GROUP BY user_id
"""


def events_props_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C7: decode the opaque JSON props column (mq_poller unmarshal analog)
    and aggregate on the extracted field."""
    ev = t(spark, sf_dir, "events_ms")
    from .common import dsum

    k = F.get_json_object("props", "$.k").cast("int")
    return (
        ev.withColumn("k_bucket", (k - k % 10))
        .groupBy("k_bucket")
        .agg(
            F.count("*").alias("n"),
            dsum("value").alias("sum_value"),
        )
    )


ORACLE_PROPS_JSON = """
SELECT k - k % 10 AS k_bucket,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(value AS DECIMAL(12,4))) AS DOUBLE) AS sum_value
FROM (
  SELECT CAST(json_extract_string(props, '$.k') AS INT) AS k, value
  FROM events_ms
)
GROUP BY 1
"""


def events_rolling_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Moving-window aggregation (ROWS frame): per-user 7-row trailing
    average and max of `value`, ordered by (ts, event_id). ROWS (not RANGE)
    so both engines fold an identical ordered sequence; the float mean is
    rounded to 6 dp (segment-tree vs sliding-sum association noise ~1e-16,
    far below the margin). Bounded per-user output keeps rows stable."""
    ev = t(spark, sf_dir, "events_ms").filter(F.col("user_id") % 10 == 0)
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-6, 0)
    )
    return ev.select(
        "user_id",
        "event_id",
        F.round(F.avg("value").over(w), 6).alias("trail_avg"),
        F.max("value").over(w).alias("trail_max"),
        F.count("*").over(w).cast("bigint").alias("n_in_window"),
    )


ORACLE_ROLLING = """
SELECT user_id, event_id,
       round(AVG(value) OVER w, 6) AS trail_avg,
       MAX(value) OVER w AS trail_max,
       CAST(COUNT(*) OVER w AS BIGINT) AS n_in_window
FROM events_ms
WHERE user_id % 10 = 0
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
"""


def events_value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact (interpolated) percentiles per event_type — the non-sketch twin
    of events_approx_stats. Spark `percentile` and DuckDB `quantile_cont`
    both linearly interpolate over the exact sorted values; rounded to 6 dp
    against last-ulp interpolation noise."""
    ev = t(spark, sf_dir, "events_ms")
    return ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.round(F.expr("percentile(value, 0.5)"), 6).alias("p50"),
        F.round(F.expr("percentile(value, 0.9)"), 6).alias("p90"),
        F.round(F.expr("percentile(value, 0.99)"), 6).alias("p99"),
    )


ORACLE_PERCENTILES = """
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       round(quantile_cont(value, 0.5), 6) AS p50,
       round(quantile_cont(value, 0.9), 6) AS p90,
       round(quantile_cont(value, 0.99), 6) AS p99
FROM events_ms
GROUP BY 1
"""


def events_props_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured decode via Spark 4 VariantType (parse_json ->
    variant_get): the binary-encoded variant path shreds once and reads
    fields without re-parsing the JSON text per extraction — the modern
    engine shape for an opaque props column. Integer-only outputs, so
    cross-engine parity is exact."""
    ev = t(spark, sf_dir, "events_ms")
    v = F.parse_json("props")
    k = F.variant_get(v, "$.k", "int")
    return (
        ev.select(k.alias("k"))
        .groupBy((F.col("k") % 7).alias("k_mod7"))
        .agg(
            F.count("*").alias("n"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
            F.sum("k").cast("bigint").alias("sum_k"),
        )
    )


ORACLE_PROPS_VARIANT = """
SELECT k % 7 AS k_mod7,
       CAST(COUNT(*) AS BIGINT) AS n,
       MIN(k) AS min_k,
       MAX(k) AS max_k,
       CAST(SUM(k) AS BIGINT) AS sum_k
FROM (SELECT CAST(json_extract_string(props, '$.k') AS INT) AS k FROM events_ms)
GROUP BY 1
"""


def events_click_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Click-to-purchase attribution: every purchase joined to the same
    user's clicks in the preceding 2-hour window. Delegates to
    streaming/joins.attribution_join on the BATCH frame — the exact code
    path the stream-stream join runs (watermark is a no-op in batch), so
    this oracle-checks the streaming operator's join semantics at value
    level while tests/test_streaming_joins.py proves stream==batch."""
    from ..streaming import joins

    return joins.attribution_join(t(spark, sf_dir, "events_ms"))


def _attribution_oracle(window: str | None = None) -> str:
    """Interpolates streaming.joins.ATTRIBUTION_WINDOW (or the caller's
    override) so the Spark operator and the DuckDB twin can never drift
    (DuckDB accepts INTERVAL '2 hours' string syntax for the same literal
    Spark parses)."""
    from ..streaming.joins import ATTRIBUTION_WINDOW

    window = window or ATTRIBUTION_WINDOW
    return f"""
SELECT c.user_id,
       c.event_id AS click_id,
       p.event_id AS purchase_id,
       c.ts AS click_ts,
       p.ts AS purchase_ts,
       p.value AS purchase_value
FROM events_ms c
JOIN events_ms p
  ON c.user_id = p.user_id
 AND p.ts >= c.ts
 AND p.ts <= c.ts + INTERVAL '{window}'
WHERE c.event_type = 'click' AND p.event_type = 'purchase'
"""


ORACLE_CLICK_ATTRIBUTION = _attribution_oracle()

# day-long lookback for the credit model: wide enough that multi-touch
# paths (>= 3 clicks before a purchase) actually occur in the fixture at
# every sf, so the U-shape branch is oracle-exercised, never vacuous
CREDIT_WINDOW = "24 hours"


def events_multitouch_credit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Position-based (U-shaped) multi-touch attribution on top of the
    click→purchase join: each purchase's value splits across its
    attributed clicks in EXACT integer milli-weights — 1000 for a single
    touch, 500/500 for two, else 400 to the first and last touch and the
    remaining 200 divided among the middles with the integer remainder
    going to the EARLIEST middles (a deterministic rule both engines
    compute identically; no floating credit ever). Conservation — weights
    sum to exactly 1000 and credit_micro to exactly 1000 * value_milli per
    purchase — is pinned in tests, the property float division can't give.

    The credit lookback is CREDIT_WINDOW (a day) — wider than the 2-hour
    streaming attribution so multi-touch paths actually occur; the join
    definition itself is shared (joins.attribution_join parameterized).

    Scale: the interval join is the bounded-state stream-stream operator
    (joins.py); the credit pass adds one window over purchase_id."""
    from ..streaming import joins

    touches = joins.attribution_join(
        t(spark, sf_dir, "events_ms"), window=CREDIT_WINDOW
    )
    w = W.partitionBy("purchase_id").orderBy("click_ts", "click_id")
    sized = touches.withColumn(
        "touch_rank", F.row_number().over(w).cast("int")
    ).withColumn(
        "n_touches", F.count("*").over(W.partitionBy("purchase_id")).cast("int")
    )
    weight = F.expr(
        """
        CAST(CASE
          WHEN n_touches = 1 THEN 1000
          WHEN n_touches = 2 THEN 500
          WHEN touch_rank = 1 OR touch_rank = n_touches THEN 400
          ELSE 200 div (n_touches - 2)
               + (CASE WHEN touch_rank - 1 <= 200 % (n_touches - 2)
                       THEN 1 ELSE 0 END)
        END AS INT)
        """
    )
    return sized.select(
        "user_id",
        "purchase_id",
        "click_id",
        "touch_rank",
        "n_touches",
        weight.alias("weight_milli"),
        (
            F.expr("CAST(round(purchase_value * 1000) AS BIGINT)")
            * weight.cast("bigint")
        ).alias("credit_micro"),
    )


def _multitouch_oracle() -> str:
    return f"""
WITH touches AS ({_attribution_oracle(CREDIT_WINDOW)}),
sized AS (
  SELECT *,
         CAST(row_number() OVER (PARTITION BY purchase_id
                                 ORDER BY click_ts, click_id) AS INT) AS touch_rank,
         CAST(COUNT(*) OVER (PARTITION BY purchase_id) AS INT) AS n_touches
  FROM touches
)
SELECT user_id, purchase_id, click_id, touch_rank, n_touches,
       CAST(CASE
         WHEN n_touches = 1 THEN 1000
         WHEN n_touches = 2 THEN 500
         WHEN touch_rank = 1 OR touch_rank = n_touches THEN 400
         ELSE 200 // (n_touches - 2)
              + (CASE WHEN touch_rank - 1 <= 200 % (n_touches - 2)
                      THEN 1 ELSE 0 END)
       END AS INTEGER) AS weight_milli,
       CAST(round(purchase_value * 1000) AS BIGINT)
         * CAST(CASE
             WHEN n_touches = 1 THEN 1000
             WHEN n_touches = 2 THEN 500
             WHEN touch_rank = 1 OR touch_rank = n_touches THEN 400
             ELSE 200 // (n_touches - 2)
                  + (CASE WHEN touch_rank - 1 <= 200 % (n_touches - 2)
                          THEN 1 ELSE 0 END)
           END AS BIGINT) AS credit_micro
FROM sized
"""


QUERIES: dict[str, tuple] = {
    "events_multitouch_credit": (events_multitouch_credit, _multitouch_oracle()),
    "events_click_attribution": (events_click_attribution, ORACLE_CLICK_ATTRIBUTION),
    "events_recent_topk": (events_recent_topk, ORACLE_RECENT_TOPK),
    "events_rolling_stats": (events_rolling_stats, ORACLE_ROLLING),
    "events_value_percentiles": (events_value_percentiles, ORACLE_PERCENTILES),
    "events_props_variant": (events_props_variant, ORACLE_PROPS_VARIANT),
    "events_subtype_counts": (events_subtype_counts, ORACLE_SUBTYPE_COUNTS),
    "events_retry_exceeded": (events_retry_exceeded, ORACLE_RETRY_EXCEEDED),
    "events_ingest_lag": (events_ingest_lag, ORACLE_INGEST_LAG),
    "events_daily_rollup": (events_daily_rollup, ORACLE_DAILY_ROLLUP),
    "events_sessionization": (events_sessionization, ORACLE_SESSIONIZATION),
    "events_props_json": (events_props_json, ORACLE_PROPS_JSON),
}


def events_funnel_completion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel analysis (signup -> click -> purchase): per user the
    first signup, the first click strictly after it, and the first purchase
    strictly after that — the step-N-requires-step-N-1 semantics that plain
    per-type MINs get wrong. Three min-aggregations chained by broadcastable
    per-user frames (each stage is O(users) rows); lags are integer epoch
    milliseconds, exact in both engines."""
    ev = t(spark, sf_dir, "events_ms").select("user_id", "event_type", "ts")
    s1 = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_signup"))
    )
    s2 = (
        ev.filter(F.col("event_type") == "click")
        .join(s1, "user_id")
        .filter(F.col("ts") > F.col("t_signup"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    s3 = (
        ev.filter(F.col("event_type") == "purchase")
        .join(s2, "user_id")
        .filter(F.col("ts") > F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    return (
        s1.join(s2, "user_id", "left")
        .join(s3, "user_id", "left")
        .select(
            "user_id",
            "t_signup",
            "t_click",
            "t_purchase",
            (F.unix_millis("t_click") - F.unix_millis("t_signup")).alias(
                "signup_to_click_ms"
            ),
            (F.unix_millis("t_purchase") - F.unix_millis("t_click")).alias(
                "click_to_purchase_ms"
            ),
        )
    )


ORACLE_FUNNEL = """
WITH s1 AS (
  SELECT user_id, MIN(ts) AS t_signup FROM events_ms
  WHERE event_type = 'signup' GROUP BY 1
), s2 AS (
  SELECT e.user_id, MIN(e.ts) AS t_click
  FROM events_ms e JOIN s1 USING (user_id)
  WHERE e.event_type = 'click' AND e.ts > s1.t_signup
  GROUP BY 1
), s3 AS (
  SELECT e.user_id, MIN(e.ts) AS t_purchase
  FROM events_ms e JOIN s2 USING (user_id)
  WHERE e.event_type = 'purchase' AND e.ts > s2.t_click
  GROUP BY 1
)
SELECT s1.user_id, s1.t_signup, s2.t_click, s3.t_purchase,
       epoch_ms(s2.t_click) - epoch_ms(s1.t_signup) AS signup_to_click_ms,
       epoch_ms(s3.t_purchase) - epoch_ms(s2.t_click) AS click_to_purchase_ms
FROM s1 LEFT JOIN s2 USING (user_id) LEFT JOIN s3 USING (user_id)
"""


QUERIES["events_funnel_completion"] = (events_funnel_completion, ORACLE_FUNNEL)


def events_conversion_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversion-latency distribution: how long each funnel transition
    takes across converting users — the population view the per-user
    funnel ledger (events_funnel_completion) feeds. Per transition
    (signup->click, click->purchase): converting-user count and exact
    interpolated p25/p50/p90 latencies in integer epoch-millisecond space
    (percentile/quantile_cont parity per events_value_percentiles, rounded
    to 6 dp against last-ulp interpolation noise).

    Scale: reuses the funnel's chained per-user min-aggregations (O(users)
    rows after the first aggregate); the distribution is one tiny unpivot +
    aggregate on top. Latencies stay exact integers until the final
    interpolation."""
    funnel = events_funnel_completion(spark, sf_dir)
    lat = funnel.selectExpr(
        """
        stack(2,
          'signup_to_click', signup_to_click_ms,
          'click_to_purchase', click_to_purchase_ms
        ) AS (transition, latency_ms)
        """
    ).filter(F.col("latency_ms").isNotNull())
    return lat.groupBy("transition").agg(
        F.count("*").cast("bigint").alias("n_converted"),
        F.round(F.expr("percentile(latency_ms, 0.25)"), 6).alias("p25_ms"),
        F.round(F.expr("percentile(latency_ms, 0.5)"), 6).alias("p50_ms"),
        F.round(F.expr("percentile(latency_ms, 0.9)"), 6).alias("p90_ms"),
        F.max("latency_ms").cast("bigint").alias("max_ms"),
    )


ORACLE_CONVERSION_LATENCY = f"""
WITH funnel AS ({ORACLE_FUNNEL}),
lat AS (
  SELECT 'signup_to_click' AS transition, signup_to_click_ms AS latency_ms
  FROM funnel WHERE signup_to_click_ms IS NOT NULL
  UNION ALL
  SELECT 'click_to_purchase', click_to_purchase_ms
  FROM funnel WHERE click_to_purchase_ms IS NOT NULL
)
SELECT transition,
       CAST(COUNT(*) AS BIGINT) AS n_converted,
       round(quantile_cont(latency_ms, 0.25), 6) AS p25_ms,
       round(quantile_cont(latency_ms, 0.5), 6) AS p50_ms,
       round(quantile_cont(latency_ms, 0.9), 6) AS p90_ms,
       CAST(MAX(latency_ms) AS BIGINT) AS max_ms
FROM lat
GROUP BY 1
"""


QUERIES["events_conversion_latency"] = (
    events_conversion_latency,
    ORACLE_CONVERSION_LATENCY,
)
