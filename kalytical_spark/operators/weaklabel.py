"""Weak-supervision diagnostics over the documents table — the Snorkel-
style labeling-function (LF) analysis (Ratner et al., VLDB 2018) a
training-data pipeline runs before trusting programmatic labels:

* ``docs_weak_lf_report`` — per-LF coverage / overlap / conflict counts,
  the standard LF health matrix that decides which functions enter the
  label model.
* ``docs_weak_label_votes`` — majority-vote label distribution with
  unanimity accounting (the no-learning baseline every label model must
  beat).

Three deterministic LFs vote keep(1) / drop(0) / abstain(-1):
  lf_len   — length gate (long docs keep, very short drop);
  lf_stop  — stopword-ratio gate in exact cross-multiplied integer form;
  lf_lang  — language allowlist (en keeps, zh drops, rest abstain).

Everything is exact integer arithmetic on counts; the only join is the
6-rows-per-doc LF×LF self-pairing on doc_id (a constant multiplier,
partition-local after one shuffle on doc_id).

Scale: per-doc label computation is JVM expression work inside the scan;
the long frame is 3 rows/doc and the pair frame 6 rows/doc — linear in
the corpus with map-side-combinable final aggregates.

Reference parity: the reference has no labeling surface (its only
per-record classification is the event-type decode in
``mq_poller.py:33``); this family exists for the mandated
LLM-training-data curation tier.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .common import t
from .text import STOPWORDS

LF_NAMES = ("lf_len", "lf_stop", "lf_lang")
# lf_len thresholds (chars): >= keep / < drop
LEN_KEEP_GE = 300
LEN_DROP_LT = 100
_SW_ARR = ", ".join(f"'{w}'" for w in STOPWORDS)


def _labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, lf, lab) long frame of the three LF votes; lab in
    {1 keep, 0 drop, -1 abstain}. Stopword gate in exact integer form:
    16·n_stop >= 2·n_tok -> drop, 16·n_stop <= n_tok -> keep."""
    docs = t(spark, sf_dir, "documents").select("doc_id", "text", "lang")
    ts = F.split(F.col("text"), " ")
    n_tok = F.size(ts).cast("bigint")
    n_stop = F.size(F.filter(ts, lambda x: x.isin(STOPWORDS))).cast("bigint")
    lf_len = (
        F.when(F.length("text") >= LEN_KEEP_GE, 1)
        .when(F.length("text") < LEN_DROP_LT, 0)
        .otherwise(-1)
    )
    lf_stop = (
        F.when(16 * n_stop >= 2 * n_tok, 0)
        .when(16 * n_stop <= n_tok, 1)
        .otherwise(-1)
    )
    lf_lang = (
        F.when(F.col("lang") == "en", 1)
        .when(F.col("lang") == "zh", 0)
        .otherwise(-1)
    )
    return docs.select(
        "doc_id",
        F.explode(
            F.array(
                F.struct(F.lit("lf_len").alias("lf"), lf_len.cast("int").alias("lab")),
                F.struct(
                    F.lit("lf_stop").alias("lf"), lf_stop.cast("int").alias("lab")
                ),
                F.struct(
                    F.lit("lf_lang").alias("lf"), lf_lang.cast("int").alias("lab")
                ),
            )
        ).alias("v"),
    ).select("doc_id", "v.lf", "v.lab")


_ORACLE_LABELS = f"""
wl_base AS (
  SELECT doc_id,
         CASE WHEN length(text) >= {LEN_KEEP_GE} THEN 1
              WHEN length(text) < {LEN_DROP_LT} THEN 0 ELSE -1 END AS lf_len,
         CASE WHEN 16 * len(list_filter(string_split(text, ' '),
                                        x -> list_contains([{_SW_ARR}], x)))
                   >= 2 * len(string_split(text, ' ')) THEN 0
              WHEN 16 * len(list_filter(string_split(text, ' '),
                                        x -> list_contains([{_SW_ARR}], x)))
                   <= len(string_split(text, ' ')) THEN 1
              ELSE -1 END AS lf_stop,
         CASE WHEN lang = 'en' THEN 1 WHEN lang = 'zh' THEN 0 ELSE -1 END AS lf_lang
  FROM documents
), wl_long AS (
  SELECT doc_id, 'lf_len' AS lf, lf_len AS lab FROM wl_base
  UNION ALL SELECT doc_id, 'lf_stop', lf_stop FROM wl_base
  UNION ALL SELECT doc_id, 'lf_lang', lf_lang FROM wl_base
)"""


def docs_weak_lf_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-LF health matrix: how often each labeling function fires
    (coverage), fires alongside another (overlap), and fires against a
    disagreeing peer (conflict) — the triage table that decides whether
    an LF is worth keeping. High conflict with low coverage is the
    classic drop signal.

    Exactness: pure counts; coverage_milli is one truncating div.
    Scale: the LF×LF pairing is exactly 6 rows per doc (constant
    fan-out), co-partitioned on doc_id; final aggregate is 3 rows."""
    long = _labels(spark, sf_dir)
    other = long.select(
        "doc_id", F.col("lf").alias("lf2"), F.col("lab").alias("lab2")
    )
    paired = (
        long.join(other, "doc_id")
        .filter(F.col("lf") != F.col("lf2"))
        .groupBy("doc_id", "lf", "lab")
        .agg(
            F.max((F.col("lab2") != -1).cast("int")).alias("other_fired"),
            F.max(
                ((F.col("lab2") != -1) & (F.col("lab2") != F.col("lab"))).cast("int")
            ).alias("other_disagrees"),
        )
    )
    n_docs = t(spark, sf_dir, "documents").groupBy().agg(
        F.count("*").alias("n_docs")
    )
    return (
        paired.groupBy("lf")
        .agg(
            F.sum((F.col("lab") != -1).cast("bigint")).alias("n_fired"),
            F.sum((F.col("lab") == 1).cast("bigint")).alias("n_keep"),
            F.sum((F.col("lab") == 0).cast("bigint")).alias("n_drop"),
            F.sum(
                ((F.col("lab") != -1) & (F.col("other_fired") == 1)).cast("bigint")
            ).alias("n_overlap"),
            F.sum(
                ((F.col("lab") != -1) & (F.col("other_disagrees") == 1)).cast(
                    "bigint"
                )
            ).alias("n_conflict"),
        )
        .crossJoin(F.broadcast(n_docs))
        .select(
            "lf",
            "n_fired",
            "n_keep",
            "n_drop",
            "n_overlap",
            "n_conflict",
            F.expr("CAST((1000 * n_fired) div n_docs AS BIGINT)").alias(
                "coverage_milli"
            ),
        )
    )


ORACLE_LF_REPORT = f"""
WITH {_ORACLE_LABELS}, wl_paired AS (
  SELECT a.doc_id, a.lf, a.lab,
         MAX(CASE WHEN b.lab != -1 THEN 1 ELSE 0 END) AS other_fired,
         MAX(CASE WHEN b.lab != -1 AND b.lab != a.lab THEN 1 ELSE 0 END)
           AS other_disagrees
  FROM wl_long a JOIN wl_long b ON a.doc_id = b.doc_id AND a.lf != b.lf
  GROUP BY 1, 2, 3
), wl_n AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents
)
SELECT lf,
       CAST(SUM(CASE WHEN lab != -1 THEN 1 ELSE 0 END) AS BIGINT) AS n_fired,
       CAST(SUM(CASE WHEN lab = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_keep,
       CAST(SUM(CASE WHEN lab = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_drop,
       CAST(SUM(CASE WHEN lab != -1 AND other_fired = 1 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_overlap,
       CAST(SUM(CASE WHEN lab != -1 AND other_disagrees = 1 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_conflict,
       CAST((1000 * SUM(CASE WHEN lab != -1 THEN 1 ELSE 0 END))
            // (SELECT n_docs FROM wl_n) AS BIGINT) AS coverage_milli
FROM wl_paired
GROUP BY lf
"""


def docs_weak_label_votes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Majority-vote label distribution: per document, keep wins if more
    LFs vote 1 than 0, drop if the reverse, tie/all-abstain stays
    unlabeled (-1). Unanimity = at least two LFs fired and none
    disagreed — the fraction of the corpus where programmatic labels need
    no label model at all.

    Exactness: counts only. Scale: one groupBy(doc_id) over the 3-row-
    per-doc long frame, then a 3-row distribution."""
    votes = (
        _labels(spark, sf_dir)
        .groupBy("doc_id")
        .agg(
            F.sum((F.col("lab") == 1).cast("int")).alias("n_pos"),
            F.sum((F.col("lab") == 0).cast("int")).alias("n_neg"),
        )
        .select(
            F.when(F.col("n_pos") > F.col("n_neg"), 1)
            .when(F.col("n_neg") > F.col("n_pos"), 0)
            .otherwise(-1)
            .alias("vote"),
            (
                (F.col("n_pos") + F.col("n_neg") >= 2)
                & ((F.col("n_pos") == 0) | (F.col("n_neg") == 0))
            )
            .cast("int")
            .alias("unanimous"),
        )
    )
    return votes.groupBy("vote").agg(
        F.count("*").alias("n_docs"),
        F.sum("unanimous").cast("bigint").alias("n_unanimous"),
    )


ORACLE_LABEL_VOTES = f"""
WITH {_ORACLE_LABELS}, wl_votes AS (
  SELECT doc_id,
         SUM(CASE WHEN lab = 1 THEN 1 ELSE 0 END) AS n_pos,
         SUM(CASE WHEN lab = 0 THEN 1 ELSE 0 END) AS n_neg
  FROM wl_long GROUP BY 1
)
SELECT CASE WHEN n_pos > n_neg THEN 1 WHEN n_neg > n_pos THEN 0 ELSE -1 END
         AS vote,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN n_pos + n_neg >= 2 AND (n_pos = 0 OR n_neg = 0)
                THEN 1 ELSE 0 END) AS BIGINT) AS n_unanimous
FROM wl_votes
GROUP BY 1
"""


QUERIES: dict[str, tuple] = {
    "docs_weak_lf_report": (docs_weak_lf_report, ORACLE_LF_REPORT),
    "docs_weak_label_votes": (docs_weak_label_votes, ORACLE_LABEL_VOTES),
}
