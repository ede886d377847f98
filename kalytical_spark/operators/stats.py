"""Distribution-comparison and regression screens over the event log:
two-sample Kolmogorov-Smirnov, per-series ordinary-least-squares trend,
and autocorrelation — the remaining members of the exact-integer
statistics family started in timeseries.py (chi-square, Mann-Whitney,
Theil-Sen, CUSUM).

All three follow the family's exactness convention: every reported
statistic is integer arithmetic on exact counts/cents with identical
truncating-division spelling in both engines, so the DuckDB twin matches
value-exactly (no float tolerance anywhere). Magnitudes are bounded
through sf100 (see per-query notes).

Scale: each query is one map-side-combinable groupBy over the fact table
followed by arithmetic on a tiny aggregated frame (distinct purchase
values, or |types| x |days| rows). Nothing corpus-sized is joined,
windowed, or collected; the KS prefix sum reuses the digit-count
two-level decomposition (no unpartitioned windows).

The reference has no statistics surface at all (its closest analog is
run counting, ``data_provider.py:189-199``); this family exists for the
warehouse/DQ side of the engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from .common import SQL_NOW, t


def events_ks_weekend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov screen on purchase values, weekend
    vs weekday: D = max_v |F_w(v) - F_d(v)|, reported EXACTLY as the
    cross-multiplied integer numerator ks_num = max_v |cum_w(v)*n_d -
    cum_d(v)*n_w| (D = ks_num / (n_w*n_d)), plus the smallest value
    attaining the max (where the distributions diverge most). Complements
    the Mann-Whitney screen: MW sees location shifts, KS sees any shape
    difference.

    Exactness: cum_w*n_d <= n_w*n_d (~1.6e15 at sf100) — bigint-safe.
    Ties between cohorts collapse onto distinct values first, so both
    engines evaluate the ECDF at identical support points.

    Scale: one groupBy onto distinct cents values, then the digit-count
    two-level prefix sum (same decomposition as the quantile anchor and
    Mann-Whitney — no unpartitioned window)."""
    ev = t(spark, sf_dir, "events_ms").filter(F.col("event_type") == "purchase")
    vals = ev.select(
        (F.col("value").cast("decimal(12,4)") * 100).cast("bigint").alias("v"),
        F.dayofweek("ts").isin(1, 7).cast("int").alias("is_weekend"),
    )
    byval = (
        vals.groupBy("v")
        .agg(F.count("*").alias("cnt"), F.sum("is_weekend").alias("cnt_w"))
        .withColumn("k", F.length(F.col("v").cast("string")))
    )
    wk = W.partitionBy("k").orderBy("v").rowsBetween(W.unboundedPreceding, 0)
    within = byval.select(
        "v",
        "k",
        F.sum("cnt").over(wk).alias("cum_in_k"),
        F.sum("cnt_w").over(wk).alias("cum_w_in_k"),
    )
    k_tot = byval.groupBy("k").agg(
        F.sum("cnt").alias("ktot"), F.sum("cnt_w").alias("ktot_w")
    )
    ka, kb = k_tot.alias("ka"), k_tot.alias("kb")
    offsets = (
        ka.join(kb, F.col("kb.k") < F.col("ka.k"), "left")
        .groupBy(F.col("ka.k").alias("k"))
        .agg(
            F.coalesce(F.sum("kb.ktot"), F.lit(0)).alias("off"),
            F.coalesce(F.sum("kb.ktot_w"), F.lit(0)).alias("off_w"),
        )
    )
    tot = byval.agg(
        F.sum("cnt").cast("bigint").alias("n_total"),
        F.sum("cnt_w").cast("bigint").alias("n_w"),
    )
    diffs = (
        within.join(F.broadcast(offsets), "k")
        .crossJoin(F.broadcast(tot))
        .select(
            "v",
            "n_w",
            (F.col("n_total") - F.col("n_w")).alias("n_d"),
            F.expr(
                "abs((cum_w_in_k + off_w) * (n_total - n_w) "
                "- (cum_in_k + off - cum_w_in_k - off_w) * n_w)"
            ).alias("d_num"),
        )
    )
    mx = diffs.agg(F.max("d_num").alias("mx"))
    return (
        diffs.crossJoin(F.broadcast(mx))
        .filter(F.col("d_num") == F.col("mx"))
        .groupBy("n_w", "n_d")
        .agg(
            F.max("d_num").cast("bigint").alias("ks_num"),
            F.min("v").cast("bigint").alias("ks_at_cents"),
        )
    )


ORACLE_KS = """
WITH vals AS (
  SELECT CAST(CAST(value AS DECIMAL(12,4)) * 100 AS BIGINT) AS v,
         CASE WHEN (1 + dayofweek(ts)) IN (1, 7) THEN 1 ELSE 0 END AS is_weekend
  FROM events_ms WHERE event_type = 'purchase'
), byval AS (
  SELECT v, COUNT(*) AS cnt, SUM(is_weekend) AS cnt_w FROM vals GROUP BY 1
), cums AS (
  SELECT v,
         SUM(cnt)   OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS cum,
         SUM(cnt_w) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS cum_w
  FROM byval
), tot AS (
  SELECT CAST(SUM(cnt) AS BIGINT) AS n_total, CAST(SUM(cnt_w) AS BIGINT) AS n_w
  FROM byval
), diffs AS (
  SELECT c.v, t.n_w, t.n_total - t.n_w AS n_d,
         abs(c.cum_w * (t.n_total - t.n_w) - (c.cum - c.cum_w) * t.n_w) AS d_num
  FROM cums c CROSS JOIN tot t
)
SELECT n_w, CAST(n_d AS BIGINT) AS n_d,
       CAST(MAX(d_num) AS BIGINT) AS ks_num,
       CAST(MIN(CASE WHEN d_num = (SELECT MAX(d_num) FROM diffs) THEN v END)
            AS BIGINT) AS ks_at_cents
FROM diffs
GROUP BY n_w, n_d
"""


def events_ols_daily_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type OLS slope over the daily-count series — the
    classical least-squares companion to the Theil-Sen robust trend
    (timeseries.py): slope = (n*Sxy - Sx*Sy) / (n*Sxx - Sx^2), reported
    as slope_milli = 1000*cov_num div var_num plus both exact integer
    sums so an analyst can re-derive intercept/fit. x is days since the
    global first day (shared origin so slopes are comparable across
    types).

    Exactness: x <= ~370, daily counts <= ~1e6 at sf100 -> n*Sxy <=
    ~5e13, 1000x ~5e16 — bigint-safe. Truncating div agrees across
    engines for negative covariances (both truncate toward zero).

    Scale: daily rollup is the only corpus-touching aggregate (map-side
    combinable); the regression sums are a second tiny groupBy — fully
    map-side, no windows, no joins except the broadcast scalar origin."""
    ev = t(spark, sf_dir, "events_ms")
    origin = ev.agg(F.min(F.date_trunc("day", "ts").cast("date")).alias("d0"))
    daily = (
        ev.select("event_type", F.date_trunc("day", "ts").cast("date").alias("day"))
        .groupBy("event_type", "day")
        .agg(F.count("*").cast("bigint").alias("y"))
        .crossJoin(F.broadcast(origin))
        .select(
            "event_type", F.datediff("day", "d0").cast("bigint").alias("x"), "y"
        )
    )
    sums = daily.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n_days"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    return sums.select(
        "event_type",
        "n_days",
        F.expr("CAST(n_days * sxy - sx * sy AS BIGINT)").alias("cov_num"),
        F.expr("CAST(n_days * sxx - sx * sx AS BIGINT)").alias("var_num"),
        F.expr(
            "CAST(1000 * (n_days * sxy - sx * sy) div (n_days * sxx - sx * sx) AS BIGINT)"
        ).alias("slope_milli_per_day"),
    )


ORACLE_OLS = """
WITH origin AS (
  SELECT MIN(CAST(date_trunc('day', ts) AS DATE)) AS d0 FROM events_ms
), daily AS (
  SELECT event_type,
         CAST(date_diff('day', o.d0, CAST(date_trunc('day', ts) AS DATE)) AS BIGINT) AS x,
         CAST(COUNT(*) AS BIGINT) AS y
  FROM events_ms CROSS JOIN origin o
  GROUP BY 1, 2
), sums AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_days,
         SUM(x) AS sx, SUM(y) AS sy, SUM(x * y) AS sxy, SUM(x * x) AS sxx
  FROM daily GROUP BY 1
)
SELECT event_type, n_days,
       CAST(n_days * sxy - sx * sy AS BIGINT) AS cov_num,
       CAST(n_days * sxx - sx * sx AS BIGINT) AS var_num,
       CAST(1000 * (n_days * sxy - sx * sy) // (n_days * sxx - sx * sx) AS BIGINT)
         AS slope_milli_per_day
FROM sums
"""


ACF_MAX_LAG = 7


def events_acf_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation of each event-type daily-count series at calendar
    lags 1..7 — the weekly-seasonality detector (lag-7 spikes =
    day-of-week cycle). Deviations are from the FLOORED per-type mean
    (m = S div n, identical truncation both engines), so r_milli(k) =
    1000 * sum(d_t * d_{t+k}) div sum(d_t^2) is exact integer end to end.

    Exactness: |d| <= daily-count range (~1e6 at sf100), d^2 sums ~1e12
    over ~370 days, 1000x ~1e15 — bigint-safe (this floored-mean form is
    why; n-scaled deviations would overflow at 1000x).

    Scale: lag pairs come from an equi-join of the tiny daily frame to
    itself on (type, day+k) — |types| x |days| x 7 rows, never
    corpus-sized. Missing days simply drop pairs, identically in both
    engines; n_pairs is reported so the reader sees the support."""
    ev = t(spark, sf_dir, "events_ms")
    daily = (
        ev.select("event_type", F.date_trunc("day", "ts").cast("date").alias("day"))
        .groupBy("event_type", "day")
        .agg(F.count("*").cast("bigint").alias("y"))
    )
    means = daily.groupBy("event_type").agg(
        F.expr("CAST(sum(y) div count(*) AS BIGINT)").alias("m")
    )
    dev = (
        daily.join(F.broadcast(means), "event_type")
        .select("event_type", "day", (F.col("y") - F.col("m")).alias("d"))
    )
    den = dev.groupBy("event_type").agg(
        F.sum(F.col("d") * F.col("d")).cast("bigint").alias("den")
    )
    lags = spark.range(1, ACF_MAX_LAG + 1).select(F.col("id").cast("int").alias("lag"))
    a = dev.crossJoin(F.broadcast(lags))
    b = dev.select(
        F.col("event_type").alias("et"),
        F.col("day").alias("day_b"),
        F.col("d").alias("d_b"),
    )
    pairs = a.join(
        b,
        (a.event_type == b.et) & (F.expr("date_add(day, lag)") == F.col("day_b")),
    )
    num = pairs.groupBy("event_type", "lag").agg(
        F.sum(F.col("d") * F.col("d_b")).cast("bigint").alias("num"),
        F.count("*").cast("bigint").alias("n_pairs"),
    )
    return num.join(F.broadcast(den), "event_type").select(
        "event_type",
        "lag",
        "n_pairs",
        F.expr("CAST(1000 * num div den AS BIGINT)").alias("acf_milli"),
    )


ORACLE_ACF = f"""
WITH daily AS (
  SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
         CAST(COUNT(*) AS BIGINT) AS y
  FROM events_ms GROUP BY 1, 2
), means AS (
  SELECT event_type, CAST(SUM(y) // COUNT(*) AS BIGINT) AS m
  FROM daily GROUP BY 1
), dev AS (
  SELECT d.event_type, d.day, d.y - m.m AS d
  FROM daily d JOIN means m ON d.event_type = m.event_type
), den AS (
  SELECT event_type, CAST(SUM(d * d) AS BIGINT) AS den FROM dev GROUP BY 1
), lags AS (
  SELECT CAST(range AS INT) AS lag FROM range(1, {ACF_MAX_LAG + 1})
), num AS (
  SELECT a.event_type, l.lag,
         CAST(SUM(a.d * b.d) AS BIGINT) AS num,
         CAST(COUNT(*) AS BIGINT) AS n_pairs
  FROM dev a
  CROSS JOIN lags l
  JOIN dev b ON a.event_type = b.event_type AND a.day + l.lag = b.day
  GROUP BY 1, 2
)
SELECT n.event_type, n.lag, n.n_pairs,
       CAST(1000 * n.num // d.den AS BIGINT) AS acf_milli
FROM num n JOIN den d ON n.event_type = d.event_type
"""


def events_spearman_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation between each event type's daily VOLUME
    (count) and daily VALUE (sum of cents) — the monotone-association
    screen that complements the linear OLS trend: does more traffic move
    with more money, regardless of the shape of the relationship?

    Exactness: ties take the average rank; DOUBLED average ranks
    (u = 2*RANK + ties - 1) keep everything integer. The three Pearson
    components over doubled ranks (num = n*Suv - Su*Sv and the two
    variance terms) are exact bigints — n_days <= ~370 so every product
    is <= ~1e11, and denx*deny <= ~4e16, bigint-safe at any sf. rho is
    then num / sqrt(denx*deny) computed from those exact integers: IEEE
    sqrt/div on identical inputs is correctly rounded in both engines,
    so even the double is bit-identical.

    Scale: the daily rollup is the only corpus-touching aggregate
    (map-side combinable); ranking windows are partitioned by event_type
    over at most |days| rows each."""
    ev = t(spark, sf_dir, "events_ms")
    daily = (
        ev.select(
            "event_type",
            F.date_trunc("day", "ts").cast("date").alias("day"),
            (F.col("value").cast("decimal(12,4)") * 100).cast("bigint").alias("cents"),
        )
        .groupBy("event_type", "day")
        .agg(
            F.count("*").cast("bigint").alias("x"),
            F.sum("cents").alias("y"),
        )
    )
    wtype = W.partitionBy("event_type")
    ranked = daily.select(
        "event_type",
        (
            2 * F.rank().over(wtype.orderBy("x"))
            + F.count("*").over(W.partitionBy("event_type", "x"))
            - 1
        ).cast("bigint").alias("u"),
        (
            2 * F.rank().over(wtype.orderBy("y"))
            + F.count("*").over(W.partitionBy("event_type", "y"))
            - 1
        ).cast("bigint").alias("v"),
    )
    sums = ranked.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n_days"),
        F.sum("u").alias("su"),
        F.sum("v").alias("sv"),
        F.sum(F.col("u") * F.col("v")).alias("suv"),
        F.sum(F.col("u") * F.col("u")).alias("suu"),
        F.sum(F.col("v") * F.col("v")).alias("svv"),
    )
    return sums.select(
        "event_type",
        "n_days",
        F.expr("CAST(n_days * suv - su * sv AS BIGINT)").alias("num"),
        F.expr("CAST(n_days * suu - su * su AS BIGINT)").alias("denx"),
        F.expr("CAST(n_days * svv - sv * sv AS BIGINT)").alias("deny"),
        F.expr(
            "CASE WHEN n_days * suu - su * su > 0 AND n_days * svv - sv * sv > 0 "
            "THEN CAST(n_days * suv - su * sv AS DOUBLE) / "
            "sqrt(CAST((n_days * suu - su * su) * (n_days * svv - sv * sv) AS DOUBLE)) "
            "END"
        ).alias("rho"),
    )


ORACLE_SPEARMAN = """
WITH daily AS (
  SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
         CAST(COUNT(*) AS BIGINT) AS x,
         SUM(CAST(CAST(value AS DECIMAL(12,4)) * 100 AS BIGINT)) AS y
  FROM events_ms
  GROUP BY 1, 2
), ranked AS (
  SELECT event_type,
         CAST(2 * RANK() OVER (PARTITION BY event_type ORDER BY x)
              + COUNT(*) OVER (PARTITION BY event_type, x) - 1 AS BIGINT) AS u,
         CAST(2 * RANK() OVER (PARTITION BY event_type ORDER BY y)
              + COUNT(*) OVER (PARTITION BY event_type, y) - 1 AS BIGINT) AS v
  FROM daily
), sums AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_days,
         SUM(u) AS su, SUM(v) AS sv,
         SUM(u * v) AS suv, SUM(u * u) AS suu, SUM(v * v) AS svv
  FROM ranked GROUP BY 1
)
SELECT event_type, n_days,
       CAST(n_days * suv - su * sv AS BIGINT) AS num,
       CAST(n_days * suu - su * su AS BIGINT) AS denx,
       CAST(n_days * svv - sv * sv AS BIGINT) AS deny,
       CASE WHEN n_days * suu - su * su > 0 AND n_days * svv - sv * sv > 0
            THEN CAST(n_days * suv - su * sv AS DOUBLE)
                 / sqrt(CAST((n_days * suu - su * su) * (n_days * svv - sv * sv) AS DOUBLE))
       END AS rho
FROM sums
"""


QUERIES: dict[str, tuple] = {
    "events_ks_weekend": (events_ks_weekend, ORACLE_KS),
    "events_ols_daily_trend": (events_ols_daily_trend, ORACLE_OLS),
    "events_acf_daily": (events_acf_daily, ORACLE_ACF),
    "events_spearman_daily": (events_spearman_daily, ORACLE_SPEARMAN),
}


BOOTSTRAP_B = 50  # resamples
# Poisson(1) CDF thresholds scaled by 2^32 (floored; computed at 50-digit
# precision): a uniform 32-bit hash u draws k = #thresholds <= u. Both
# engines compare the SAME integers against the SAME md5-derived u, so
# the bootstrap is deterministic and cross-engine exact.
_POIS1_T = (1580030168, 3160060337, 3950075421, 4213413783, 4279248373, 4292415291)


def events_bootstrap_mean_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson bootstrap 95% CI for the mean purchase value — THE
    bootstrap that works at 100 TB: instead of resampling N rows exactly
    (which needs global coordination), every row independently draws a
    Poisson(1) replication count per resample, and each resample's mean
    is the weight-weighted mean. One pass over (purchases x B), fully
    map-side-combinable; B x |thresholds| is constant work per row.

    Determinism: the replication count comes from 32 bits of
    md5(resample:event_id) compared against hard-coded Poisson CDF
    integer thresholds — no RNG state, same draw in both engines,
    reproducible under retries/stragglers (the property that makes
    hash-seeded bootstraps the production choice anyway).

    Output: one row — the full-sample mean plus the percentile-CI
    bounds, all exact integer milli-cents (order statistics over the
    B=50 resample means via a tiny rank self-join, never a window)."""
    ev = t(spark, sf_dir, "events_ms").filter(F.col("event_type") == "purchase")
    vals = ev.select(
        "event_id",
        (F.col("value").cast("decimal(12,4)") * 100).cast("bigint").alias("cents"),
    )
    k_expr = " + ".join(
        f"CAST(u >= {thr} AS INT)" for thr in _POIS1_T
    )
    drawn = vals.select(
        "event_id",
        "cents",
        F.explode(F.sequence(F.lit(0), F.lit(BOOTSTRAP_B - 1))).alias("r"),
    ).selectExpr(
        "r",
        "cents",
        "CAST(conv(substring(md5(CAST(r AS STRING) || ':' || CAST(event_id AS STRING)), 1, 8), 16, 10) AS BIGINT) AS u",
    ).selectExpr("r", "cents", f"({k_expr}) AS w")
    means = drawn.groupBy("r").agg(
        F.expr("CAST(1000 * sum(w * cents) div sum(w) AS BIGINT)").alias("m")
    )
    a, b = means.alias("a"), means.alias("b")
    ranked = (
        a.join(b, F.expr("(b.m < a.m) OR (b.m = a.m AND b.r <= a.r)"))
        .groupBy(F.col("a.r").alias("r"), F.col("a.m").alias("m"))
        .agg(F.count("*").alias("rk"))
    )
    lo_rk = max(1, int(0.025 * BOOTSTRAP_B))
    hi_rk = min(BOOTSTRAP_B, int(0.975 * BOOTSTRAP_B) + 1)
    point = vals.agg(
        F.expr("CAST(1000 * sum(cents) div count(*) AS BIGINT)").alias("point_milli")
    )
    ci = ranked.agg(
        F.count("*").cast("bigint").alias("n_resamples"),
        F.min(F.when(F.col("rk") == lo_rk, F.col("m"))).alias("ci_lo_milli"),
        F.min(F.when(F.col("rk") == hi_rk, F.col("m"))).alias("ci_hi_milli"),
    )
    return ci.crossJoin(F.broadcast(point)).select(
        "n_resamples", "point_milli", "ci_lo_milli", "ci_hi_milli"
    )


ORACLE_BOOTSTRAP = f"""
WITH vals AS (
  SELECT event_id, CAST(CAST(value AS DECIMAL(12,4)) * 100 AS BIGINT) AS cents
  FROM events_ms WHERE event_type = 'purchase'
),
drawn AS (
  SELECT r, cents,
         {" + ".join(f"CAST(u >= {thr} AS INT)" for thr in _POIS1_T)} AS w
  FROM (
    SELECT r, cents,
           CAST(('0x' || substr(md5(CAST(r AS VARCHAR) || ':' ||
                                     CAST(event_id AS VARCHAR)), 1, 8))
                AS UBIGINT) AS u
    FROM vals, unnest(range(0, {BOOTSTRAP_B})) AS u2(r)
  )
),
means AS (
  SELECT r, CAST(1000 * SUM(w * cents) // SUM(w) AS BIGINT) AS m
  FROM drawn GROUP BY r
),
ranked AS (
  SELECT a.r, a.m, COUNT(*) AS rk
  FROM means a JOIN means b
    ON (b.m < a.m) OR (b.m = a.m AND b.r <= a.r)
  GROUP BY a.r, a.m
),
point AS (
  SELECT CAST(1000 * SUM(cents) // COUNT(*) AS BIGINT) AS point_milli FROM vals
)
SELECT CAST((SELECT COUNT(*) FROM ranked) AS BIGINT) AS n_resamples,
       point_milli,
       (SELECT MIN(CASE WHEN rk = {max(1, int(0.025 * BOOTSTRAP_B))} THEN m END)
        FROM ranked) AS ci_lo_milli,
       (SELECT MIN(CASE WHEN rk = {min(BOOTSTRAP_B, int(0.975 * BOOTSTRAP_B) + 1)} THEN m END)
        FROM ranked) AS ci_hi_milli
FROM point
"""


QUERIES.update(
    {
        "events_bootstrap_mean_ci": (events_bootstrap_mean_ci, ORACLE_BOOTSTRAP),
    }
)


def events_gini_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of per-user activity concentration, per event
    type — the inequality screen that tells a pipeline owner whether a
    type's volume is broad-based or a handful of power users (a Gini
    near 1000 milli on 'error' events is a very different incident than
    one near 0). Exact integer form on the sorted-values identity:
    G = (2 * sum(i * x_i) - (n + 1) * sum(x)) / (n * sum(x)) with i the
    1-based rank under the deterministic total order (x, user_id) — both
    engines rank identically, so numerator/denominator match bit-exactly
    (bounded through sf100: 2 * n * sum(x) < 2^63).

    The per-type global rank never plans a per-type-monolithic window:
    row_number partitions on (event_type, digit-length class of x) and
    adds the per-(type, class) count offsets — the repo's two-level
    prefix-sum convention applied per group."""
    ev = t(spark, sf_dir, "events_ms")
    x = ev.groupBy("event_type", "user_id").agg(
        F.count("*").cast("bigint").alias("x")
    )
    withk = x.withColumn("k", F.length(F.col("x").cast("string")))
    within = withk.withColumn(
        "rn_in_k",
        F.row_number().over(
            W.partitionBy("event_type", "k").orderBy(
                F.col("x").asc(), F.col("user_id").asc()
            )
        ),
    )
    k_tot = withk.groupBy("event_type", "k").agg(F.count("*").alias("ktypes"))
    ka, kb = k_tot.alias("ka"), k_tot.alias("kb")
    offsets = (
        ka.join(
            kb,
            (F.col("kb.event_type") == F.col("ka.event_type"))
            & (F.col("kb.k") < F.col("ka.k")),
            "left",
        )
        .groupBy(F.col("ka.event_type").alias("event_type"), F.col("ka.k").alias("k"))
        .agg(F.coalesce(F.sum("kb.ktypes"), F.lit(0)).alias("rank_off"))
    )
    ranked = within.join(F.broadcast(offsets), ["event_type", "k"]).withColumn(
        "i", F.col("rank_off") + F.col("rn_in_k")
    )
    return (
        ranked.groupBy("event_type")
        .agg(
            F.count("*").cast("bigint").alias("n_users"),
            F.sum("x").cast("bigint").alias("total_events"),
            F.sum(F.col("i") * F.col("x")).cast("bigint").alias("ix"),
        )
        .select(
            "event_type",
            "n_users",
            "total_events",
            F.expr(
                "CAST(1000 * (2 * ix - (n_users + 1) * total_events) "
                "div (n_users * total_events) AS BIGINT)"
            ).alias("gini_milli"),
        )
    )


ORACLE_GINI = """
WITH x AS (
  SELECT event_type, user_id, CAST(COUNT(*) AS BIGINT) AS x
  FROM events_ms GROUP BY 1, 2
),
ranked AS (
  SELECT event_type, x,
         row_number() OVER (PARTITION BY event_type ORDER BY x, user_id) AS i
  FROM x
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_users,
       CAST(SUM(x) AS BIGINT) AS total_events,
       CAST(1000 * (2 * SUM(i * x) - (COUNT(*) + 1) * SUM(x))
            // (COUNT(*) * SUM(x)) AS BIGINT) AS gini_milli
FROM ranked
GROUP BY 1
"""


def runs_kaplan_meier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier survival curve of pipeline-run durations per engine
    (public literature: Kaplan & Meier 1958) — the right-censoring-aware
    answer to "how long do runs live", where still-running jobs (~43% of
    running_jobs) contribute their observed-so-far age (deterministic
    clock now_expr) as censored observations instead of being dropped the
    way runs_duration_stats must.

    Shape: one histogram aggregate per (engine, duration) — events d and
    censorings c — then cumulative windows over the DISTINCT-DURATION
    frame only (bounded by the seconds range, never the run count):
    n_risk is the descending cumulative of d+c (ties follow the standard
    deaths-before-censors convention: a censor at t is still at risk at
    t), and S(t) = exp(cumsum ln(1 - d/n)) snapped to integer
    micro-units. The exhausted-risk edge (d = n at the last event time)
    is guarded explicitly because DuckDB errors on ln(0); both engines
    emit surv_micro = 0 from that point."""
    from .common import now_expr

    jobs = t(spark, sf_dir, "running_jobs")
    now = now_expr(spark, sf_dir)
    obs = jobs.select(
        "engine",
        F.when(
            F.col("end_time").isNotNull(),
            F.unix_timestamp("end_time") - F.unix_timestamp("start_time"),
        )
        .otherwise(F.unix_timestamp(now) - F.unix_timestamp("start_time"))
        .cast("bigint")
        .alias("dur_s"),
        F.col("end_time").isNotNull().cast("int").alias("event"),
    ).filter(F.col("dur_s") >= 0)
    hist = obs.groupBy("engine", "dur_s").agg(
        F.sum("event").cast("bigint").alias("d"),
        F.sum(1 - F.col("event")).cast("bigint").alias("c"),
    )
    w_desc = (
        W.partitionBy("engine")
        .orderBy(F.desc("dur_s"))
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    at_risk = hist.withColumn("n_risk", F.sum(F.col("d") + F.col("c")).over(w_desc))
    ev = at_risk.filter(F.col("d") > 0)
    w_asc = (
        W.partitionBy("engine")
        .orderBy(F.asc("dur_s"))
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    term = F.when(
        F.col("d") < F.col("n_risk"),
        F.log(
            F.lit(1.0)
            - F.col("d").cast("double") / F.col("n_risk").cast("double")
        ),
    ).otherwise(F.lit(0.0))
    died_out = F.max((F.col("d") >= F.col("n_risk")).cast("int")).over(w_asc)
    return (
        ev.withColumn("lnsum", F.sum(term).over(w_asc))
        .withColumn("dead", died_out)
        .select(
            "engine",
            "dur_s",
            "n_risk",
            "d",
            F.when(F.col("dead") == 1, F.lit(0).cast("bigint"))
            .otherwise(
                F.expr("CAST(ROUND(1000000 * EXP(lnsum)) AS BIGINT)")
            )
            .alias("surv_micro"),
        )
    )


ORACLE_KM = f"""
WITH obs AS (
  SELECT engine,
         CAST(CASE WHEN end_time IS NOT NULL
              THEN date_diff('second', start_time, end_time)
              ELSE date_diff('second', start_time, {SQL_NOW}) END AS BIGINT) AS dur_s,
         CASE WHEN end_time IS NOT NULL THEN 1 ELSE 0 END AS event
  FROM running_jobs
),
hist AS (
  SELECT engine, dur_s,
         CAST(SUM(event) AS BIGINT) AS d,
         CAST(SUM(1 - event) AS BIGINT) AS c
  FROM obs WHERE dur_s >= 0 GROUP BY 1, 2
),
at_risk AS (
  SELECT *, SUM(d + c) OVER (PARTITION BY engine ORDER BY dur_s DESC
                             ROWS UNBOUNDED PRECEDING) AS n_risk
  FROM hist
),
ev AS (SELECT * FROM at_risk WHERE d > 0),
curve AS (
  SELECT engine, dur_s, n_risk, d,
         SUM(CASE WHEN d < n_risk
                  THEN LN(1.0 - CAST(d AS DOUBLE) / CAST(n_risk AS DOUBLE))
                  ELSE 0.0 END)
           OVER (PARTITION BY engine ORDER BY dur_s ASC ROWS UNBOUNDED PRECEDING)
           AS lnsum,
         MAX(CASE WHEN d >= n_risk THEN 1 ELSE 0 END)
           OVER (PARTITION BY engine ORDER BY dur_s ASC ROWS UNBOUNDED PRECEDING)
           AS dead
  FROM ev
)
SELECT engine, dur_s, CAST(n_risk AS BIGINT) AS n_risk, d,
       CASE WHEN dead = 1 THEN CAST(0 AS BIGINT)
            ELSE CAST(ROUND(1000000 * EXP(lnsum)) AS BIGINT) END AS surv_micro
FROM curve
"""


def events_cuped_adjustment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED variance reduction (public literature: Deng, Xu, Kohavi &
    Walker 2013, "Improving the sensitivity of online controlled
    experiments") — the experimentation-platform workhorse: regress the
    experiment-period metric on the pre-period covariate and report how
    much metric variance the adjustment removes. Unit = user, metric =
    post-period event count, covariate = pre-period count (periods split
    at the global midpoint epoch-ms, exact integer).

    EXACT INTEGER end to end: the centered second moments are the
    n-scaled forms (n*Sxy_raw - Sx*Sy), theta_micro = (1e6*Sxy) div Sxx,
    and the variance-reduction ratio rho^2 is floor-composed as
    ((1000*Sxy) div Sxx * Sxy) div Syy — a squared term would overflow
    bigint at sf10 (Sxy ~ 1e10), the composed form never exceeds ~1e13
    and truncated division agrees across engines. Scale: one count
    aggregate per (type, user), one moment row per type; nothing wider
    than the user dim shuffles."""
    ev = t(spark, sf_dir, "events_ms")
    mid = ev.agg(
        F.min(F.unix_millis("ts")).alias("mn"), F.max(F.unix_millis("ts")).alias("mx")
    ).select(F.expr("CAST((mn + mx) div 2 AS BIGINT)").alias("mid_ms"))
    per_user = (
        ev.crossJoin(F.broadcast(mid))
        .groupBy("event_type", "user_id")
        .agg(
            F.sum((F.unix_millis("ts") < F.col("mid_ms")).cast("int"))
            .cast("bigint")
            .alias("x"),
            F.sum((F.unix_millis("ts") >= F.col("mid_ms")).cast("int"))
            .cast("bigint")
            .alias("y"),
        )
    )
    m = per_user.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx_raw"),
        F.sum(F.col("y") * F.col("y")).cast("bigint").alias("syy_raw"),
        F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sxy_raw"),
    )
    return m.select(
        "event_type",
        F.col("n").alias("n_users"),
        F.expr("CAST(n * sxy_raw - sx * sy AS BIGINT)").alias("sxy_c"),
        F.expr("CAST(n * sxx_raw - sx * sx AS BIGINT)").alias("sxx_c"),
        F.expr("CAST(n * syy_raw - sy * sy AS BIGINT)").alias("syy_c"),
    ).select(
        "event_type",
        "n_users",
        "sxy_c",
        "sxx_c",
        "syy_c",
        F.expr(
            "CASE WHEN sxx_c = 0 THEN CAST(0 AS BIGINT) "
            "ELSE CAST((1000000 * sxy_c) div sxx_c AS BIGINT) END"
        ).alias("theta_micro"),
        F.expr(
            "CASE WHEN sxx_c = 0 OR syy_c = 0 THEN CAST(0 AS BIGINT) "
            "ELSE CAST(((1000 * sxy_c) div sxx_c * sxy_c) div syy_c AS BIGINT) END"
        ).alias("var_reduction_milli"),
    )


ORACLE_CUPED = """
WITH cm AS (
  SELECT CAST((MIN(epoch_ms(ts)) + MAX(epoch_ms(ts))) // 2 AS BIGINT) AS mid_ms
  FROM events_ms
),
per_user AS (
  SELECT event_type, user_id,
         CAST(SUM(CASE WHEN epoch_ms(ts) < mid_ms THEN 1 ELSE 0 END) AS BIGINT) AS x,
         CAST(SUM(CASE WHEN epoch_ms(ts) >= mid_ms THEN 1 ELSE 0 END) AS BIGINT) AS y
  FROM events_ms CROSS JOIN cm
  GROUP BY 1, 2
),
m AS (
  SELECT event_type,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(x * x) AS BIGINT) AS sxx_raw,
         CAST(SUM(y * y) AS BIGINT) AS syy_raw,
         CAST(SUM(x * y) AS BIGINT) AS sxy_raw
  FROM per_user GROUP BY 1
),
c AS (
  SELECT event_type, n AS n_users,
         CAST(n * sxy_raw - sx * sy AS BIGINT) AS sxy_c,
         CAST(n * sxx_raw - sx * sx AS BIGINT) AS sxx_c,
         CAST(n * syy_raw - sy * sy AS BIGINT) AS syy_c
  FROM m
)
SELECT event_type, n_users, sxy_c, sxx_c, syy_c,
       CASE WHEN sxx_c = 0 THEN CAST(0 AS BIGINT)
            ELSE CAST((1000000 * sxy_c) // sxx_c AS BIGINT) END AS theta_micro,
       CASE WHEN sxx_c = 0 OR syy_c = 0 THEN CAST(0 AS BIGINT)
            ELSE CAST(((1000 * sxy_c) // sxx_c * sxy_c) // syy_c AS BIGINT) END
         AS var_reduction_milli
FROM c
"""


OPE_ARMS = 4
OPE_REWARD_MIN = 50.0  # reward = 1{value > this} (integer reward signal)


def events_offpolicy_ips(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Off-policy evaluation (public literature: Horvitz-Thompson inverse
    propensity scoring; SNIPS per Swaminathan & Joachims 2015): estimate
    what a TARGET assignment policy would have earned from logged
    randomized traffic, without running it. The logging policy is the
    deterministic uniform hash arm = md5(event_id) % OPE_ARMS (known
    propensity 1/K — the md5 trick every deterministic sampler in the
    repo uses); the target policy is the context rule arm = user_id %
    OPE_ARMS; reward is the integer signal value > OPE_REWARD_MIN.

    Exact integers end to end: IPS = K/N * sum(r * match) and SNIPS =
    sum(r * match)/sum(match) are emitted in micro-units via integer
    division from exact counts, with the logged mean reward alongside
    for comparison. One scan, one small aggregate per type."""
    ev = t(spark, sf_dir, "events_ms")
    base = ev.select(
        "event_type",
        F.expr(
            f"CAST(conv(substring(md5(CAST(event_id AS STRING)), 1, 8), 16, 10) AS BIGINT)"
            f" % {OPE_ARMS}"
        ).alias("a_log"),
        (F.col("user_id") % OPE_ARMS).cast("bigint").alias("a_tgt"),
        (F.col("value") > OPE_REWARD_MIN).cast("bigint").alias("r"),
    ).withColumn("match", (F.col("a_log") == F.col("a_tgt")).cast("bigint"))
    return (
        base.groupBy("event_type")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.sum("match").cast("bigint").alias("n_match"),
            F.sum(F.col("r") * F.col("match")).cast("bigint").alias("sum_r_match"),
            F.sum("r").cast("bigint").alias("sum_r_logged"),
        )
        .select(
            "event_type",
            "n",
            "n_match",
            "sum_r_match",
            F.expr(
                f"CAST((1000000 * {OPE_ARMS} * sum_r_match) div n AS BIGINT)"
            ).alias("ips_micro"),
            F.expr(
                "CASE WHEN n_match = 0 THEN CAST(0 AS BIGINT) "
                "ELSE CAST((1000000 * sum_r_match) div n_match AS BIGINT) END"
            ).alias("snips_micro"),
            F.expr("CAST((1000000 * sum_r_logged) div n AS BIGINT)").alias(
                "logged_mean_micro"
            ),
        )
    )


ORACLE_OPE = f"""
WITH obase AS (
  SELECT event_type,
         CAST(('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 8))::UBIGINT
              % {OPE_ARMS} AS BIGINT) AS a_log,
         CAST(user_id % {OPE_ARMS} AS BIGINT) AS a_tgt,
         CAST(CASE WHEN value > {OPE_REWARD_MIN} THEN 1 ELSE 0 END AS BIGINT) AS r
  FROM events_ms
),
om AS (
  SELECT event_type,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CASE WHEN a_log = a_tgt THEN 1 ELSE 0 END) AS BIGINT) AS n_match,
         CAST(SUM(r * CASE WHEN a_log = a_tgt THEN 1 ELSE 0 END) AS BIGINT) AS sum_r_match,
         CAST(SUM(r) AS BIGINT) AS sum_r_logged
  FROM obase GROUP BY 1
)
SELECT event_type, n, n_match, sum_r_match,
       CAST((1000000 * {OPE_ARMS} * sum_r_match) // n AS BIGINT) AS ips_micro,
       CASE WHEN n_match = 0 THEN CAST(0 AS BIGINT)
            ELSE CAST((1000000 * sum_r_match) // n_match AS BIGINT) END AS snips_micro,
       CAST((1000000 * sum_r_logged) // n AS BIGINT) AS logged_mean_micro
FROM om
"""


# chi-square critical value at alpha=0.05 for df = OPE_ARMS - 1 = 3, in
# milli units — a literal shared by both engines (no distribution math
# in-engine)
SRM_CRIT_MILLI_DF3 = 7815


def events_srm_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample-ratio-mismatch check (the experimentation-platform guardrail
    run before ANY A/B readout): chi-square of the logged arm counts
    against the intended uniform split, per event type. The arm
    assignment is events_offpolicy_ips's md5 hash, so this query is the
    validity check for that query's 'known propensity' premise.

    Exact integers: with K arms and n rows, chi2 = sum((c_a - n/K)^2 /
    (n/K)) rescaled by K*n gives chi2_kn = K * sum((K*c_a - n)^2) —
    integers throughout; the milli statistic is chi2_milli = 1000 *
    chi2_kn div (K*K*n) (one truncated division at the end). Flag when
    chi2_milli exceeds the shared df=3 critical literal."""
    ev = t(spark, sf_dir, "events_ms")
    k = OPE_ARMS
    per_arm = (
        ev.select(
            "event_type",
            F.expr(
                f"CAST(conv(substring(md5(CAST(event_id AS STRING)), 1, 8), 16, 10) AS BIGINT)"
                f" % {k}"
            ).alias("arm"),
        )
        .groupBy("event_type", "arm")
        .agg(F.count("*").cast("bigint").alias("c"))
    )
    totals = per_arm.groupBy(F.col("event_type").alias("et")).agg(
        F.sum("c").cast("bigint").alias("n"),
        F.count("*").cast("int").alias("arms_seen"),
    )
    # chi2 = (1/(K*n)) * sum((K*c_a - n)^2); arms with zero rows never
    # appear (they would add n^2) — arms_seen is emitted so the hash pins
    # that all K arms materialized on this fixture
    return (
        per_arm.join(F.broadcast(totals), per_arm.event_type == F.col("et"))
        .groupBy("event_type", "n", "arms_seen")
        .agg(
            F.sum(
                (F.lit(k) * F.col("c") - F.col("n"))
                * (F.lit(k) * F.col("c") - F.col("n"))
            )
            .cast("bigint")
            .alias("s2")
        )
        .select(
            "event_type",
            "n",
            "arms_seen",
            F.expr(f"CAST(1000 * s2 div ({k} * n) AS BIGINT)").alias("chi2_milli"),
        )
        .withColumn("srm_flag", F.col("chi2_milli") > SRM_CRIT_MILLI_DF3)
    )


ORACLE_SRM = f"""
WITH sper AS (
  SELECT event_type,
         CAST(('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 8))::UBIGINT
              % {OPE_ARMS} AS BIGINT) AS arm,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM events_ms GROUP BY 1, 2
),
stot AS (
  SELECT event_type, CAST(SUM(c) AS BIGINT) AS n,
         CAST(COUNT(*) AS INTEGER) AS arms_seen
  FROM sper GROUP BY 1
)
SELECT p.event_type, t.n, t.arms_seen,
       CAST(1000 * SUM(({OPE_ARMS} * p.c - t.n) * ({OPE_ARMS} * p.c - t.n))
            // ({OPE_ARMS} * t.n) AS BIGINT) AS chi2_milli,
       CAST(1000 * SUM(({OPE_ARMS} * p.c - t.n) * ({OPE_ARMS} * p.c - t.n))
            // ({OPE_ARMS} * t.n) AS BIGINT) > {SRM_CRIT_MILLI_DF3} AS srm_flag
FROM sper p JOIN stot t USING (event_type)
GROUP BY 1, 2, 3
"""


QUERIES.update(
    {
        "events_gini_concentration": (events_gini_concentration, ORACLE_GINI),
        "runs_kaplan_meier": (runs_kaplan_meier, ORACLE_KM),
        "events_cuped_adjustment": (events_cuped_adjustment, ORACLE_CUPED),
        "events_offpolicy_ips": (events_offpolicy_ips, ORACLE_OPE),
        "events_srm_check": (events_srm_check, ORACLE_SRM),
    }
)


# two-sided alpha=0.05 and power=0.80 normal quantiles, micro-units — fixed
# literals like the chi-square critical value (no erf in either engine)
Z_ALPHA_HALF_MICRO = 1_959_964
Z_POWER_MICRO = 841_621


def events_abtest_power(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B power analysis — the sizing table read BEFORE launching an
    experiment on this traffic: per treatment arm (vs the md5 arm-0
    baseline shared with events_srm_check / events_offpolicy_ips), the
    minimum detectable effect on purchase value at alpha=0.05 two-sided
    and 80% power, MDE = (z_{a/2} + z_b) * sqrt(var_0/n_0 + var_a/n_a),
    with the per-arm moments next to it. Completes the experimentation
    family: SRM validates the split, CUPED shrinks the variance, this
    query says what the experiment can SEE, and IPS/SNIPS read it out.

    Determinism: per-arm n / sum / sum-of-squares are EXACT (cents in
    BIGINT; the square sum rides DECIMAL(38,0), DuckDB's HUGEINT twin, so
    1e9-row arms can't wrap); the variance, the one sqrt, and the z
    multiply are a single identically-spelled double expression in both
    engines, rounded once to 2 decimals. The z quantiles are shared
    literals — no erf anywhere.

    Scale: one map-side-combinable groupBy(arm) over the purchase rows;
    everything after is a 4-row frame."""
    ev = t(spark, sf_dir, "events_ms").filter(F.col("event_type") == "purchase")
    k = OPE_ARMS
    arms = (
        ev.select(
            F.expr(
                f"CAST(conv(substring(md5(CAST(event_id AS STRING)), 1, 8), 16, 10) AS BIGINT)"
                f" % {k}"
            ).alias("arm"),
            (F.col("value").cast("decimal(12,4)") * 100).cast("bigint").alias("v"),
        )
        .groupBy("arm")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.sum("v").cast("decimal(38,0)").alias("s"),
            F.sum(F.expr("CAST(v AS DECIMAL(38,0)) * v")).alias("s2"),
        )
    )
    base = arms.filter(F.col("arm") == 0).select(
        F.col("n").alias("n_0"), F.col("s").alias("s_0"), F.col("s2").alias("s2_0")
    )
    return (
        arms.filter(F.col("arm") != 0)
        .crossJoin(F.broadcast(base))
        .select(
            "arm",
            "n_0",
            "n",
            F.expr(
                f"ROUND(({Z_ALPHA_HALF_MICRO} + {Z_POWER_MICRO}) / 1e6 * SQRT("
                "  ((CAST(n_0 AS DOUBLE) * CAST(s2_0 AS DOUBLE)"
                "    - CAST(s_0 AS DOUBLE) * CAST(s_0 AS DOUBLE))"
                "   / (CAST(n_0 AS DOUBLE) * (CAST(n_0 AS DOUBLE) - 1))) / n_0"
                "  + ((CAST(n AS DOUBLE) * CAST(s2 AS DOUBLE)"
                "    - CAST(s AS DOUBLE) * CAST(s AS DOUBLE))"
                "   / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1))) / n"
                "), 2)"
            ).alias("mde_cents"),
            F.expr("ROUND(CAST(s_0 AS DOUBLE) / n_0, 2)").alias("mean0_cents"),
        )
    )


ORACLE_ABTEST_POWER = f"""
WITH pw_arms AS (
  SELECT CAST('0x' || substring(md5(CAST(event_id AS VARCHAR)), 1, 8) AS BIGINT)
           % {OPE_ARMS} AS arm,
         CAST(CAST(value AS DECIMAL(12,4)) * 100 AS BIGINT) AS v
  FROM events_ms WHERE event_type = 'purchase'
), pw_m AS (
  SELECT arm, CAST(COUNT(*) AS BIGINT) AS n,
         SUM(v) AS s, SUM(CAST(v AS HUGEINT) * v) AS s2
  FROM pw_arms GROUP BY 1
), pw_base AS (
  SELECT n AS n_0, s AS s_0, s2 AS s2_0 FROM pw_m WHERE arm = 0
)
SELECT a.arm, b.n_0, a.n,
       ROUND(({Z_ALPHA_HALF_MICRO} + {Z_POWER_MICRO}) / 1e6 * SQRT(
         ((CAST(b.n_0 AS DOUBLE) * CAST(b.s2_0 AS DOUBLE)
           - CAST(b.s_0 AS DOUBLE) * CAST(b.s_0 AS DOUBLE))
          / (CAST(b.n_0 AS DOUBLE) * (CAST(b.n_0 AS DOUBLE) - 1))) / b.n_0
         + ((CAST(a.n AS DOUBLE) * CAST(a.s2 AS DOUBLE)
           - CAST(a.s AS DOUBLE) * CAST(a.s AS DOUBLE))
          / (CAST(a.n AS DOUBLE) * (CAST(a.n AS DOUBLE) - 1))) / a.n
       ), 2) AS mde_cents,
       ROUND(CAST(b.s_0 AS DOUBLE) / b.n_0, 2) AS mean0_cents
FROM pw_m a CROSS JOIN pw_base b
WHERE a.arm != 0
"""


QUERIES["events_abtest_power"] = (events_abtest_power, ORACLE_ABTEST_POWER)


# SPRT literals: H0 p=0.180 vs H1 p=0.220 purchase share, alpha=beta=0.05.
# Per-event log-likelihood contributions and the Wald boundaries, micro-nats
# (fixed literals like the z quantiles — no transcendentals at runtime).
SPRT_LL_SUCCESS_MICRO = 200_671   # ln(0.220/0.180)
SPRT_LL_FAILURE_MICRO = -50_010   # ln(0.780/0.820)
SPRT_BOUND_MICRO = 2_944_439      # ln((1-beta)/alpha) = ln(19)


def events_sprt_monitor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald sequential probability-ratio test per experiment arm — the
    early-stopping monitor that reads the experiment DAILY instead of
    waiting for the fixed-horizon readout: the cumulative log-likelihood
    ratio of H1 (purchase share 22.0%) vs H0 (18.0%) is a random walk
    that adds a fixed micro-nat literal per success / per failure, and
    the arm stops the day the walk exits the ±ln(19) Wald boundaries
    (alpha = beta = 0.05). Completes the experimentation family's time
    axis: SRM validates, power sizes, SPRT decides WHEN to stop.

    Determinism: the walk is s·A + (n-s)·B with BIGINT counts and fixed
    integer literals — exact at any scale; the cumulative sum runs in a
    per-arm day-ordered window (bounded by the calendar, never
    unpartitioned); first-crossing selection is an exact conditional MIN.

    Scale: one map-side-combinable (arm, day) rollup collapses the log;
    everything after is |arms| × |days| rows.

    Reference parity: none (no experimentation surface in the reference);
    the arm hash is events_srm_check's."""
    ev = t(spark, sf_dir, "events_ms")
    k = OPE_ARMS
    daily = (
        ev.select(
            F.expr(
                f"CAST(conv(substring(md5(CAST(event_id AS STRING)), 1, 8), 16, 10) AS BIGINT)"
                f" % {k}"
            ).alias("arm"),
            F.date_trunc("day", F.col("ts")).alias("day"),
            (F.col("event_type") == "purchase").cast("bigint").alias("s"),
        )
        .groupBy("arm", "day")
        .agg(F.count("*").cast("bigint").alias("n"), F.sum("s").alias("s"))
    )
    w = W.partitionBy("arm").orderBy("day").rowsBetween(W.unboundedPreceding, 0)
    walk = daily.withColumn(
        "llr_micro",
        F.sum(
            F.expr(
                f"s * {SPRT_LL_SUCCESS_MICRO} + (n - s) * ({SPRT_LL_FAILURE_MICRO})"
            )
        ).over(w),
    )
    return walk.groupBy("arm").agg(
        F.count("*").cast("bigint").alias("n_days"),
        F.max("llr_micro").cast("bigint").alias("max_llr_micro"),
        F.min("llr_micro").cast("bigint").alias("min_llr_micro"),
        F.min(
            F.when(F.col("llr_micro") >= SPRT_BOUND_MICRO, F.col("day"))
        ).cast("date").alias("h1_cross_day"),
        F.min(
            F.when(F.col("llr_micro") <= -SPRT_BOUND_MICRO, F.col("day"))
        ).cast("date").alias("h0_cross_day"),
        F.expr(
            f"CASE WHEN MIN(CASE WHEN llr_micro >= {SPRT_BOUND_MICRO} THEN day END)"
            f"  IS NOT NULL AND (MIN(CASE WHEN llr_micro <= -{SPRT_BOUND_MICRO} THEN day END)"
            f"  IS NULL OR MIN(CASE WHEN llr_micro >= {SPRT_BOUND_MICRO} THEN day END)"
            f"   <= MIN(CASE WHEN llr_micro <= -{SPRT_BOUND_MICRO} THEN day END))"
            f" THEN 'accept_h1'"
            f" WHEN MIN(CASE WHEN llr_micro <= -{SPRT_BOUND_MICRO} THEN day END)"
            f"  IS NOT NULL THEN 'accept_h0' ELSE 'continue' END"
        ).alias("decision"),
    )


ORACLE_SPRT = f"""
WITH sp_daily AS (
  SELECT CAST('0x' || substring(md5(CAST(event_id AS VARCHAR)), 1, 8) AS BIGINT)
           % {OPE_ARMS} AS arm,
         date_trunc('day', ts) AS day,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS s
  FROM events_ms GROUP BY 1, 2
), sp_walk AS (
  SELECT arm, day,
         SUM(s * {SPRT_LL_SUCCESS_MICRO} + (n - s) * ({SPRT_LL_FAILURE_MICRO}))
           OVER (PARTITION BY arm ORDER BY day
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS llr_micro
  FROM sp_daily
)
SELECT arm,
       CAST(COUNT(*) AS BIGINT) AS n_days,
       CAST(MAX(llr_micro) AS BIGINT) AS max_llr_micro,
       CAST(MIN(llr_micro) AS BIGINT) AS min_llr_micro,
       CAST(MIN(CASE WHEN llr_micro >= {SPRT_BOUND_MICRO} THEN day END)
            AS DATE) AS h1_cross_day,
       CAST(MIN(CASE WHEN llr_micro <= -{SPRT_BOUND_MICRO} THEN day END)
            AS DATE) AS h0_cross_day,
       CASE WHEN MIN(CASE WHEN llr_micro >= {SPRT_BOUND_MICRO} THEN day END)
              IS NOT NULL AND (MIN(CASE WHEN llr_micro <= -{SPRT_BOUND_MICRO} THEN day END)
              IS NULL OR MIN(CASE WHEN llr_micro >= {SPRT_BOUND_MICRO} THEN day END)
               <= MIN(CASE WHEN llr_micro <= -{SPRT_BOUND_MICRO} THEN day END))
            THEN 'accept_h1'
            WHEN MIN(CASE WHEN llr_micro <= -{SPRT_BOUND_MICRO} THEN day END)
              IS NOT NULL THEN 'accept_h0' ELSE 'continue' END AS decision
FROM sp_walk
GROUP BY arm
"""


QUERIES["events_sprt_monitor"] = (events_sprt_monitor, ORACLE_SPRT)
