"""Training-feature extraction and corpus-mix governance — the two batch
reports a large-scale training-data pipeline materializes per refresh.

The reference stops at raw event fetches (data_provider.py:133-147); a
feature store / mix report is the analytical layer above the same log.
Both queries are single hash-aggregate passes with exact arithmetic:

* user_feature_matrix: the classic RFM + behavior profile per user, one
  groupBy over the event log (map-side combinable, shuffles once on
  user_id — at 100 TB this is the canonical feature-backfill shape).
  Recency/tenure are exact epoch-millisecond integers against the
  deterministic data-derived clock; monetary is a decimal-exact sum.
* docs_corpus_mix_report: per (source, lang) document counts and sizes
  with the corpus share in integer basis points (n * 10000 div total) —
  the report that drives mixing-weight decisions; the global total is a
  one-row broadcast, and the share test has no float division.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .common import dsum, now_expr, sql_dsum, t

_EVENT_TYPES = ("click", "purchase", "signup", "error", "view")


def user_feature_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user feature row: recency/frequency/monetary plus per-type
    activity counts — the training-feature backfill over the event log."""
    ev = t(spark, sf_dir, "events_ms")
    now = now_expr(spark, sf_dir)
    aggs = [
        F.count("*").cast("bigint").alias("n_events"),
        F.countDistinct("event_type").cast("bigint").alias("n_types"),
        dsum("value").alias("monetary"),
        (F.unix_millis(now) - F.unix_millis(F.max("ts"))).alias("recency_ms"),
        (F.unix_millis(F.max("ts")) - F.unix_millis(F.min("ts"))).alias("tenure_ms"),
        F.min("ts").alias("first_ts"),
        F.max("ts").alias("last_ts"),
    ]
    aggs += [
        F.sum((F.col("event_type") == et).cast("bigint")).alias(f"n_{et}")
        for et in _EVENT_TYPES
    ]
    return ev.groupBy("user_id").agg(*aggs)


ORACLE_USER_FEATURES = f"""
WITH nowt AS (SELECT MAX(ts) AS now FROM events_ms)
SELECT user_id,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(COUNT(DISTINCT event_type) AS BIGINT) AS n_types,
       {sql_dsum("value")} AS monetary,
       epoch_ms((SELECT now FROM nowt)) - epoch_ms(MAX(ts)) AS recency_ms,
       epoch_ms(MAX(ts)) - epoch_ms(MIN(ts)) AS tenure_ms,
       MIN(ts) AS first_ts,
       MAX(ts) AS last_ts,
       {", ".join(f"CAST(SUM(CAST(event_type = '{et}' AS BIGINT)) AS BIGINT) AS n_{et}" for et in _EVENT_TYPES)}
FROM events_ms
GROUP BY user_id
"""


# share threshold in basis points: a (source, lang) cell above 2.5% of the
# corpus is flagged for mixing-weight review
_MIX_FLAG_BP = 250


def docs_corpus_mix_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus composition ledger per (source, lang): counts, exact char
    mass, share in integer basis points, and the over-representation flag
    that drives mixing-weight review."""
    docs = t(spark, sf_dir, "documents")
    cells = docs.groupBy("source", "lang").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
    )
    total = cells.agg(F.sum("n_docs").alias("corpus_docs"))
    return (
        cells.crossJoin(F.broadcast(total))
        .select(
            "source",
            "lang",
            "n_docs",
            "total_chars",
            F.expr("CAST((n_docs * 10000) div corpus_docs AS BIGINT)").alias(
                "share_bp"
            ),
            (
                F.expr("(n_docs * 10000) div corpus_docs") >= _MIX_FLAG_BP
            ).alias("over_represented"),
        )
    )


ORACLE_MIX_REPORT = f"""
WITH cells AS (
  SELECT source, lang,
         CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(n_chars) AS BIGINT) AS total_chars
  FROM documents GROUP BY 1, 2
), total AS (SELECT SUM(n_docs) AS corpus_docs FROM cells)
SELECT source, lang, n_docs, total_chars,
       CAST((n_docs * 10000) // corpus_docs AS BIGINT) AS share_bp,
       (n_docs * 10000) // corpus_docs >= {_MIX_FLAG_BP} AS over_represented
FROM cells, total
"""


QUERIES: dict[str, tuple] = {
    "user_feature_matrix": (user_feature_matrix, ORACLE_USER_FEATURES),
    "docs_corpus_mix_report": (docs_corpus_mix_report, ORACLE_MIX_REPORT),
}
