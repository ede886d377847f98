"""RFM customer segmentation over the event log: per purchasing user,
Recency / Frequency / Monetary quintile scores — the standard warehouse
segmentation feeding lifecycle campaigns and churn models.

Quintiles are EXACT NTILE(5) semantics (first n mod 5 buckets take the
extra row) over deterministic total orders (metric, user_id), but the
Spark side never plans an unpartitioned window: the global rank
decomposes as row_number within each metric DIGIT-LENGTH class plus the
tiny per-class offset dim (the repo's two-level prefix-sum convention,
text.py:text_vocab_coverage), and the bucket number is then the
closed-form NTILE formula over (rank, n) with n riding a one-row
broadcast. The DuckDB oracle uses plain ntile() — the cross-engine match
IS the proof the decomposition implements NTILE exactly.

Scale: the per-user rollup is one map-side-combinable hash aggregate on
user_id that reduces the log by orders of magnitude; each of the three
rankings is a window PARTITIONED by digit class (~1-7 classes, but
within-class order is (metric, user_id) so rows spread over the class's
hash partitions... the class itself is the partition key, so hot classes
serialize — the same bounded trade accepted in text_vocab_coverage: class
cardinality is VALUE-range-bounded (digits of a bigint <= 19), and the
ranked frame is the USER dim, already ~5 orders smaller than the log).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from .common import eager_cache, now_expr, t

RFM_BUCKETS = 5


def _global_rank(df: DataFrame, metric: str, descending: bool) -> DataFrame:
    """Append ``rank``: 1-based global row_number over
    (metric ASC|DESC, user_id ASC) without an unpartitioned window —
    row_number within each digit-length class of the non-negative metric
    plus the per-class count offsets (more digits == strictly larger
    metric, so class order is total)."""
    withk = df.withColumn("k", F.length(F.col(metric).cast("string")))
    order = [
        F.col(metric).desc() if descending else F.col(metric).asc(),
        F.col("user_id").asc(),
    ]
    within = withk.withColumn(
        "rn_in_k", F.row_number().over(W.partitionBy("k").orderBy(*order))
    )
    k_tot = withk.groupBy("k").agg(F.count("*").alias("ktypes"))
    ka, kb = k_tot.alias("ka"), k_tot.alias("kb")
    cmp = F.col("kb.k") > F.col("ka.k") if descending else F.col("kb.k") < F.col("ka.k")
    offsets = (
        ka.join(kb, cmp, "left")
        .groupBy(F.col("ka.k").alias("k"))
        .agg(F.coalesce(F.sum("kb.ktypes"), F.lit(0)).alias("rank_off"))
    )
    return (
        within.join(F.broadcast(offsets), "k")
        .withColumn("rank", (F.col("rank_off") + F.col("rn_in_k")).cast("bigint"))
        .drop("k", "rn_in_k", "rank_off")
    )


def _ntile_expr(k: int) -> Column:
    """Closed-form NTILE(k) bucket from a 1-based global ``rank`` and the
    total row count ``n``: the first n mod k buckets hold n div k + 1
    rows, the rest n div k (the SQL-standard allocation both engines
    implement)."""
    q = f"(n div {k})"
    r = f"(n % {k})"
    return F.expr(
        f"CAST(CASE WHEN rank <= ({q} + 1) * {r} THEN (rank - 1) div ({q} + 1) + 1 "
        f"ELSE {r} + (rank - ({q} + 1) * {r} - 1) div {q} + 1 END AS INT)"
    )


def users_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per purchasing user: recency (calendar days from last purchase to
    the dataset clock), frequency (purchase count), monetary (exact summed
    cents), and the three quintile scores — r_score 5 = most recent,
    f_score/m_score 5 = heaviest — plus the concatenated RFM cell."""
    ev = t(spark, sf_dir, "events_ms").filter(F.col("event_type") == "purchase")
    anchor = now_expr(spark, sf_dir)
    # the user dim feeds 3 rankings + the final join UNCACHED: all four
    # branches share one identical groupBy exchange, which Spark's
    # exchange reuse executes exactly once — and with no InMemoryRelation
    # in the plan there are no cache STATISTICS for AQE to race on (the
    # r7 nondeterminism that eager_cache was added to pin came from
    # racing cache stats; removing the cache removes the race AND the
    # ~1 s/call eager count() — VERDICT r9 task 7).
    base = ev.groupBy("user_id").agg(
        F.datediff(F.to_date(F.lit(anchor)), F.to_date(F.max("ts")))
        .cast("bigint")
        .alias("recency_days"),
        F.count("*").cast("bigint").alias("frequency"),
        F.sum((F.col("value").cast("decimal(12,4)") * 100).cast("bigint"))
        .cast("bigint")
        .alias("monetary_cents"),
    )
    n_users = base.agg(F.count("*").cast("bigint").alias("n"))

    def score(metric: str, descending: bool, out: str) -> DataFrame:
        ranked = _global_rank(base.select("user_id", metric), metric, descending)
        return (
            ranked.crossJoin(F.broadcast(n_users))
            .withColumn(out, _ntile_expr(RFM_BUCKETS))
            .select("user_id", out)
        )

    r = score("recency_days", True, "r_score")
    f_ = score("frequency", False, "f_score")
    m = score("monetary_cents", False, "m_score")
    return (
        base.join(r, "user_id")
        .join(f_, "user_id")
        .join(m, "user_id")
        .select(
            "user_id",
            "recency_days",
            "frequency",
            "monetary_cents",
            "r_score",
            "f_score",
            "m_score",
            F.concat_ws(
                "-",
                F.col("r_score").cast("string"),
                F.col("f_score").cast("string"),
                F.col("m_score").cast("string"),
            ).alias("rfm_cell"),
        )
    )


ORACLE_RFM = f"""
WITH purch AS (
  SELECT user_id, ts, value FROM events_ms WHERE event_type = 'purchase'
),
anchor AS (SELECT MAX(ts) AS a FROM events_ms),
base AS (
  SELECT user_id,
         CAST(date_diff('day', CAST(MAX(ts) AS DATE),
                        CAST((SELECT a FROM anchor) AS DATE)) AS BIGINT) AS recency_days,
         CAST(COUNT(*) AS BIGINT) AS frequency,
         CAST(SUM(CAST(CAST(value AS DECIMAL(12,4)) * 100 AS BIGINT)) AS BIGINT) AS monetary_cents
  FROM purch GROUP BY 1
)
SELECT user_id, recency_days, frequency, monetary_cents,
       CAST(ntile({RFM_BUCKETS}) OVER (ORDER BY recency_days DESC, user_id) AS INT) AS r_score,
       CAST(ntile({RFM_BUCKETS}) OVER (ORDER BY frequency, user_id) AS INT) AS f_score,
       CAST(ntile({RFM_BUCKETS}) OVER (ORDER BY monetary_cents, user_id) AS INT) AS m_score,
       CAST(ntile({RFM_BUCKETS}) OVER (ORDER BY recency_days DESC, user_id) AS VARCHAR)
         || '-' ||
       CAST(ntile({RFM_BUCKETS}) OVER (ORDER BY frequency, user_id) AS VARCHAR)
         || '-' ||
       CAST(ntile({RFM_BUCKETS}) OVER (ORDER BY monetary_cents, user_id) AS VARCHAR) AS rfm_cell
FROM base
"""


QUERIES: dict[str, tuple] = {
    "users_rfm_segments": (users_rfm_segments, ORACLE_RFM),
}


WOE_BINS = 5


def users_woe_binning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weight-of-Evidence / Information-Value binning (the credit-scoring
    standard for feature screening): quintile-bin users by PURCHASE
    FREQUENCY, take "top half by exact summed spend" as the binary
    outcome (a deterministic median split — both classes exist by
    construction), and report per bin

        woe_micro = round(1e6 * ln( ((n_pos+1)(N+K)) / ((n_neg+1)(P+K)) ))
        iv_term_micro ≈ (pos_share - neg_share) * woe

    with Laplace +1 smoothing (the drift.py PSI spelling — WOE is PSI's
    per-bin log-ratio with the two distributions being "positives over
    bins" vs "negatives over bins"; IV is exactly the symmetric PSI sum).
    A frequency feature that cleanly separates spenders shows monotone
    WOE and IV >> 0.02; flat WOE kills the feature before a model ever
    sees it.

    Determinism: bins are the exact NTILE(K) closed form over the
    digit-decomposed global rank (the RFM machinery — no unpartitioned
    window); the outcome median split is rank*2 > n, exact; one ln per
    bin, (share-diff) applied as ONE multiply-divide of exact integer
    products, rounded to BIGINT per bin.

    Scale: everything after the per-user rollup is user-dimension-sized;
    the two rank passes partition by digit class.

    Reference parity: none (no scoring surface in the reference); built
    for the warehouse/feature-engineering mandate."""
    ev = t(spark, sf_dir, "events_ms").filter(F.col("event_type") == "purchase")
    # uncached for the same reason as users_rfm_segments' base: the
    # branches share one reused exchange, and no cache means no cache
    # statistics for AQE to race on
    base = ev.groupBy("user_id").agg(
        F.count("*").cast("bigint").alias("frequency"),
        F.sum((F.col("value").cast("decimal(12,4)") * 100).cast("bigint"))
        .cast("bigint")
        .alias("monetary_cents"),
    )
    n_users = base.agg(F.count("*").cast("bigint").alias("n"))

    spend_rank = _global_rank(
        base.select("user_id", "monetary_cents"), "monetary_cents", False
    )
    outcome = (
        spend_rank.crossJoin(F.broadcast(n_users))
        .select(
            "user_id",
            (F.col("rank") * 2 > F.col("n")).cast("int").alias("pos"),
        )
    )
    freq_bin = (
        _global_rank(base.select("user_id", "frequency"), "frequency", False)
        .crossJoin(F.broadcast(n_users))
        .withColumn("bin", _ntile_expr(WOE_BINS))
        .select("user_id", "bin")
    )
    bins = (
        freq_bin.join(outcome, "user_id")
        .groupBy("bin")
        .agg(
            F.count("*").cast("bigint").alias("n_users"),
            F.sum("pos").cast("bigint").alias("n_pos"),
            (F.count("*") - F.sum("pos")).cast("bigint").alias("n_neg"),
        )
    )
    totals = bins.groupBy().agg(
        F.sum("n_pos").cast("bigint").alias("p_tot"),
        F.sum("n_neg").cast("bigint").alias("n_tot"),
    )
    k = WOE_BINS
    return (
        bins.crossJoin(F.broadcast(totals))
        .select(
            "bin",
            "n_users",
            "n_pos",
            "n_neg",
            F.expr(
                f"CAST(ROUND(ln(CAST((n_pos + 1) * (n_tot + {k}) AS DOUBLE)"
                f" / CAST((n_neg + 1) * (p_tot + {k}) AS DOUBLE)) * 1e6) AS BIGINT)"
            ).alias("woe_micro"),
            F.expr(
                f"CAST(ROUND(CAST(ROUND(ln(CAST((n_pos + 1) * (n_tot + {k}) AS DOUBLE)"
                f" / CAST((n_neg + 1) * (p_tot + {k}) AS DOUBLE)) * 1e6) AS BIGINT)"
                f" * (CAST((n_pos + 1) * (n_tot + {k})"
                f"      - (n_neg + 1) * (p_tot + {k}) AS DOUBLE)"
                f"    / CAST((p_tot + {k}) * (n_tot + {k}) AS DOUBLE))) AS BIGINT)"
            ).alias("iv_term_micro"),
        )
    )


ORACLE_WOE = f"""
WITH woe_purch AS (
  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS frequency,
         CAST(SUM(CAST(CAST(value AS DECIMAL(12,4)) * 100 AS BIGINT)) AS BIGINT)
           AS monetary_cents
  FROM events_ms WHERE event_type = 'purchase' GROUP BY 1
), woe_n AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n FROM woe_purch
), woe_users AS (
  SELECT user_id,
         CASE WHEN ROW_NUMBER() OVER (ORDER BY monetary_cents, user_id) * 2
                   > (SELECT n FROM woe_n) THEN 1 ELSE 0 END AS pos,
         CAST(ntile({WOE_BINS}) OVER (ORDER BY frequency, user_id) AS INT) AS bin
  FROM woe_purch
), woe_bins AS (
  SELECT bin, CAST(COUNT(*) AS BIGINT) AS n_users,
         CAST(SUM(pos) AS BIGINT) AS n_pos,
         CAST(COUNT(*) - SUM(pos) AS BIGINT) AS n_neg
  FROM woe_users GROUP BY 1
), woe_tot AS (
  SELECT CAST(SUM(n_pos) AS BIGINT) AS p_tot, CAST(SUM(n_neg) AS BIGINT) AS n_tot
  FROM woe_bins
)
SELECT b.bin, b.n_users, b.n_pos, b.n_neg,
       CAST(ROUND(ln(CAST((b.n_pos + 1) * (t.n_tot + {WOE_BINS}) AS DOUBLE)
            / CAST((b.n_neg + 1) * (t.p_tot + {WOE_BINS}) AS DOUBLE)) * 1e6)
            AS BIGINT) AS woe_micro,
       CAST(ROUND(CAST(ROUND(ln(CAST((b.n_pos + 1) * (t.n_tot + {WOE_BINS}) AS DOUBLE)
            / CAST((b.n_neg + 1) * (t.p_tot + {WOE_BINS}) AS DOUBLE)) * 1e6) AS BIGINT)
            * (CAST((b.n_pos + 1) * (t.n_tot + {WOE_BINS})
                 - (b.n_neg + 1) * (t.p_tot + {WOE_BINS}) AS DOUBLE)
               / CAST((t.p_tot + {WOE_BINS}) * (t.n_tot + {WOE_BINS}) AS DOUBLE)))
            AS BIGINT) AS iv_term_micro
FROM woe_bins b CROSS JOIN woe_tot t
"""


QUERIES["users_woe_binning"] = (users_woe_binning, ORACLE_WOE)
