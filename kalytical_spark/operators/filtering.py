"""Model-based quality filtering and per-language quota sampling over the
documents table — the "classifier gate" stage of an LLM curation pipeline
(fastText-style linear scorer, then language-balanced selection of the
survivors).

Determinism: the classifier is a linear model evaluated ENTIRELY in
integer arithmetic — features are exact token counts, ratios become
micro-unit integers via floor division, and the decision is a comparison
of the integer logit against zero. No sigmoid, no float weights, no
transcendental calls — so the Spark and DuckDB decisions are identical by
construction, which is exactly what you want from a filter that decides
what goes into a training run (auditable, re-runnable, engine-portable).

Scale notes:
* Scoring is one projection over the scan — pure pyspark.sql.functions,
  whole-stage codegen, no shuffle, no Python.
* The quota sample reuses the md5-threshold scheme (operators/sampling.py):
  the per-language count/threshold dim is a handful of rows, broadcast to
  the scan; selection is partition-local.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .common import t
from .text import STOPWORDS, _SW_SQL

# Integer micro-unit model: logit_u = BIAS - W_TTR*|ttr_u - TTR_CENTER|
# + W_STOP*stop_u - SHORT_PENALTY*[n_tokens < MIN_TOKENS]. Prose-likeness:
# penalize type-token ratios far from the corpus center (random or
# degenerate-repetition text), reward stopword density, hard-penalize
# ultra-short docs. Keep <=> logit_u > 0.
_BIAS = 800_000
_W_TTR = 2
_TTR_CENTER = 450_000
_W_STOP = 3
_MIN_TOKENS = 20
_SHORT_PENALTY = 400_000
_U = 1_000_000


def _features(docs: DataFrame) -> DataFrame:
    toks = F.split(F.col("text"), " ")
    return docs.select(
        "doc_id",
        "lang",
        F.size(toks).cast("bigint").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("bigint").alias("n_distinct"),
        F.size(F.filter(toks, lambda x: x.isin(STOPWORDS)))
        .cast("bigint")
        .alias("n_stop"),
    )


def _logit() -> F.Column:
    ttr_u = F.expr(f"n_distinct * {_U} div n_tokens")
    stop_u = F.expr(f"n_stop * {_U} div n_tokens")
    return (
        F.lit(_BIAS)
        - _W_TTR * F.abs(ttr_u - _TTR_CENTER)
        + _W_STOP * stop_u
        + F.when(F.col("n_tokens") < _MIN_TOKENS, -_SHORT_PENALTY).otherwise(0)
    ).cast("bigint")


_SQL_FEATURES = f"""
  SELECT doc_id, lang,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
         CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT)
           AS n_distinct,
         CAST(len(list_filter(string_split(text, ' '), x -> x IN {_SW_SQL}))
              AS BIGINT) AS n_stop
  FROM documents
"""

_SQL_LOGIT = f"""CAST({_BIAS}
  - {_W_TTR} * abs(n_distinct * {_U} // n_tokens - {_TTR_CENTER})
  + {_W_STOP} * (n_stop * {_U} // n_tokens)
  + CASE WHEN n_tokens < {_MIN_TOKENS} THEN -{_SHORT_PENALTY} ELSE 0 END
  AS BIGINT)"""


def docs_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Score every document with the integer-logit linear model and emit
    the keep/drop decision alongside the features — the auditable filter
    ledger an LLM pipeline keeps for every training-set build."""
    feats = _features(t(spark, sf_dir, "documents"))
    return feats.select(
        "doc_id",
        "lang",
        "n_tokens",
        "n_distinct",
        "n_stop",
        _logit().alias("logit_u"),
        (_logit() > 0).alias("keep"),
    )


ORACLE_CLASSIFIER = f"""
SELECT doc_id, lang, n_tokens, n_distinct, n_stop,
       {_SQL_LOGIT} AS logit_u,
       {_SQL_LOGIT} > 0 AS keep
FROM ({_SQL_FEATURES})
"""


_QUOTA = 50
_HEX_SPACE = 16**7


def docs_language_quota_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-balanced selection of the classifier's survivors: each
    language is capped at ``_QUOTA`` docs via the deterministic
    md5-threshold scheme (small languages kept whole) — the step that
    stops a web-scale corpus from being 90% English. Returns the
    per-language audit row."""
    kept = docs_quality_classifier(spark, sf_dir).filter(F.col("keep"))
    cnts = kept.groupBy("lang").agg(
        F.count("*").cast("bigint").alias("kept_n")
    )
    thr = cnts.withColumn(
        "thr", F.expr(f"CAST({_QUOTA} AS BIGINT) * {_HEX_SPACE} div kept_n")
    )
    keep = (F.col("kept_n") <= _QUOTA) | (
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 7)
        < F.format_string("%07x", F.col("thr"))
    )
    return (
        kept.join(F.broadcast(thr), "lang")
        .filter(keep)
        .groupBy("lang", "kept_n", "thr")
        .agg(F.count("*").cast("bigint").alias("sample_n"))
    )


ORACLE_QUOTA_SAMPLE = f"""
WITH scored AS (
  SELECT doc_id, lang, {_SQL_LOGIT} AS logit_u
  FROM ({_SQL_FEATURES})
), kept AS (
  SELECT doc_id, lang FROM scored WHERE logit_u > 0
), cnts AS (
  SELECT lang, CAST(COUNT(*) AS BIGINT) AS kept_n FROM kept GROUP BY 1
), thr AS (
  SELECT lang, kept_n,
         CAST(CAST({_QUOTA} AS BIGINT) * {_HEX_SPACE} // kept_n AS BIGINT)
           AS thr
  FROM cnts
)
SELECT k.lang, t.kept_n, t.thr, CAST(COUNT(*) AS BIGINT) AS sample_n
FROM kept k JOIN thr t ON k.lang = t.lang
WHERE t.kept_n <= {_QUOTA}
   OR substring(md5(CAST(k.doc_id AS VARCHAR)), 1, 7) < printf('%07x', t.thr)
GROUP BY 1, 2, 3
"""


QUERIES: dict[str, tuple] = {
    "docs_quality_classifier": (docs_quality_classifier, ORACLE_CLASSIFIER),
    "docs_language_quota_sample": (
        docs_language_quota_sample,
        ORACLE_QUOTA_SAMPLE,
    ),
}
