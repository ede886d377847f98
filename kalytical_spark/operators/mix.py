"""The end-to-end training-mix builder: curation -> classifier gate ->
per-language quota -> reproducible train/val/test split, emitting one
bucket per document. This composes the whole LLM-data story the operator
families implement piecewise (curation.py, filtering.py, sampling.py)
into a single declarative plan — the query a data team actually runs to
cut a training set, with every exclusion auditable.

Bucket values: dropped_quality | dropped_exact_dup | dropped_near_dup
(curation fates) -> dropped_classifier (integer-logit gate) ->
dropped_quota (language balance) -> train | val | test.

Determinism notes:
* The quota selection hashes ``'mix:' || doc_id`` and the split hashes
  ``'split:' || doc_id`` — DIFFERENT salts. Reusing one hash would
  correlate the stages (quota keeps small md5 prefixes, so an unsalted
  split would put every selected doc in 'train').
* Everything else inherits the stage operators' exactness: LSH-banded
  near-dup candidates, integer logits, hex-threshold quotas.

Scale: the plan is the union of the stage plans — LSH candidates (never
all-pairs), one projection for the classifier, broadcast threshold dims
for quota and split. No new shuffle shape is introduced by composing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .curation import ORACLE_CURATE_CTES, pipeline_curate_corpus
from .filtering import _SQL_FEATURES, _SQL_LOGIT, _features, _logit
from .sampling import _HEX_SPACE, _TRAIN_HI, _VAL_HI
from .common import t

_MIX_QUOTA = 100


def _salted_hex(prefix: str, col: F.Column, n: int) -> F.Column:
    return F.substring(
        F.md5(F.concat(F.lit(prefix), col.cast("string"))), 1, n
    )


def pipeline_training_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document bucket ledger for the training mix (see module doc)."""
    fate = pipeline_curate_corpus(spark, sf_dir)
    scored = (
        _features(t(spark, sf_dir, "documents"))
        .select("doc_id", (_logit() > 0).alias("clf_ok"))
    )
    staged = fate.join(scored, "doc_id")
    pool = staged.filter((F.col("fate") == "kept") & F.col("clf_ok"))
    thr = (
        pool.groupBy("lang")
        .agg(F.count("*").cast("bigint").alias("pool_n"))
        .withColumn(
            "thr",
            F.expr(f"CAST({_MIX_QUOTA} AS BIGINT) * {_HEX_SPACE} div pool_n"),
        )
    )
    selected = (
        pool.join(F.broadcast(thr), "lang")
        .filter(
            (F.col("pool_n") <= _MIX_QUOTA)
            | (
                _salted_hex("mix:", F.col("doc_id"), 7)
                < F.format_string("%07x", F.col("thr"))
            )
        )
        .select("doc_id", F.lit(True).alias("quota_ok"))
    )
    split_hex = _salted_hex("split:", F.col("doc_id"), 2)
    bucket = (
        F.when(F.col("fate") != "kept", F.col("fate"))
        .when(~F.col("clf_ok"), F.lit("dropped_classifier"))
        .when(F.col("quota_ok").isNull(), F.lit("dropped_quota"))
        .when(split_hex < _TRAIN_HI, F.lit("train"))
        .when(split_hex < _VAL_HI, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return staged.join(selected, "doc_id", "left").select(
        "doc_id", "lang", "n_tokens", bucket.alias("bucket")
    )


def _oracle_mix_ctes() -> str:
    """curation.ORACLE_CURATE_CTES (which already ends in the fate CTE —
    defined exactly once there) + the classifier/quota/split stages."""
    return (
        ORACLE_CURATE_CTES
        + f""", feats AS ({_SQL_FEATURES}
), scored AS (
  SELECT doc_id, {_SQL_LOGIT} > 0 AS clf_ok FROM feats
), pool AS (
  SELECT f.doc_id, f.lang, f.n_tokens
  FROM fate f JOIN scored s USING (doc_id)
  WHERE f.fate = 'kept' AND s.clf_ok
), quota_thr AS (
  SELECT lang, CAST(COUNT(*) AS BIGINT) AS pool_n,
         CAST(CAST({_MIX_QUOTA} AS BIGINT) * {_HEX_SPACE}
              // CAST(COUNT(*) AS BIGINT) AS BIGINT) AS thr
  FROM pool GROUP BY 1
), selected AS (
  SELECT p.doc_id
  FROM pool p JOIN quota_thr t USING (lang)
  WHERE t.pool_n <= {_MIX_QUOTA}
     OR substring(md5('mix:' || CAST(p.doc_id AS VARCHAR)), 1, 7)
          < printf('%07x', t.thr)
), bucketed AS (
  SELECT f.doc_id, f.lang, f.n_tokens,
         CASE WHEN f.fate != 'kept' THEN f.fate
              WHEN NOT s.clf_ok THEN 'dropped_classifier'
              WHEN sel.doc_id IS NULL THEN 'dropped_quota'
              WHEN substring(md5('split:' || CAST(f.doc_id AS VARCHAR)), 1, 2)
                     < '{_TRAIN_HI}' THEN 'train'
              WHEN substring(md5('split:' || CAST(f.doc_id AS VARCHAR)), 1, 2)
                     < '{_VAL_HI}' THEN 'val'
              ELSE 'test' END AS bucket
  FROM fate f
  JOIN scored s USING (doc_id)
  LEFT JOIN selected sel USING (doc_id)
)"""
    )


ORACLE_MIX = (
    _oracle_mix_ctes() + "\nSELECT doc_id, lang, n_tokens, bucket FROM bucketed"
)


def pipeline_training_mix_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The mix dashboard: doc and token counts per (lang, bucket) — what a
    team reviews before launching the training run."""
    mix = pipeline_training_mix(spark, sf_dir)
    return mix.groupBy("lang", "bucket").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("total_tokens"),
    )


ORACLE_MIX_SUMMARY = (
    _oracle_mix_ctes()
    + """
SELECT lang, bucket,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
FROM bucketed GROUP BY 1, 2
"""
)


_TEMP_BUDGET = 1_000_000  # token budget the temperature mix allocates


def mix_language_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled multilingual sampling (the mBERT/XLM-R exponent
    trick, public literature): sampling weight per language proportional
    to n_tokens^tau with tau = 0.5, which up-weights low-resource
    languages relative to their natural share. tau = 0.5 is chosen
    because it has an EXACT integer form — w = floor(sqrt(n_tokens)),
    and floor(sqrt(x)) of a bigint < 2^52 is the identical correctly-
    rounded IEEE value in both engines — so shares, allocations and
    effective-epoch factors are all exact integer milli arithmetic (no
    cross-engine pow() drift; a production tau sweep would rows-only the
    non-half exponents against this gated anchor).

    Reports per language: natural corpus share, temperature share, the
    token allocation under a fixed budget, and effective epochs (how many
    times the language's corpus is traversed — the oversampling number a
    mixture design reviews for degradation risk).

    Scale: one map-side-combinable groupBy(lang) + a 1-row broadcast
    total; everything downstream is per-language scalar arithmetic."""
    docs = t(spark, sf_dir, "documents")
    per_lang = (
        docs.select("lang", F.expr("size(split(text, ' '))").alias("nt"))
        .groupBy("lang")
        .agg(F.sum("nt").cast("bigint").alias("n_tokens"))
        .withColumn("w", F.expr("CAST(FLOOR(SQRT(n_tokens)) AS BIGINT)"))
    )
    totals = per_lang.agg(
        F.sum("n_tokens").alias("tot_tokens"), F.sum("w").alias("tot_w")
    )
    return per_lang.crossJoin(F.broadcast(totals)).select(
        "lang",
        "n_tokens",
        F.expr("CAST(1000 * n_tokens div tot_tokens AS BIGINT)").alias(
            "natural_share_milli"
        ),
        F.expr("CAST(1000 * w div tot_w AS BIGINT)").alias("temp_share_milli"),
        F.expr(f"CAST({_TEMP_BUDGET} * w div tot_w AS BIGINT)").alias(
            "alloc_tokens"
        ),
        F.expr(
            f"CAST(1000 * ({_TEMP_BUDGET} * w div tot_w) div n_tokens AS BIGINT)"
        ).alias("effective_epochs_milli"),
    )


ORACLE_TEMPERATURE = f"""
WITH per_lang AS (
  SELECT lang, CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens,
         CAST(FLOOR(SQRT(CAST(SUM(len(string_split(text, ' '))) AS BIGINT))) AS BIGINT) AS w
  FROM documents GROUP BY 1
),
tot AS (SELECT SUM(n_tokens) AS tot_tokens, SUM(w) AS tot_w FROM per_lang)
SELECT lang, n_tokens,
       CAST(1000 * n_tokens // tot_tokens AS BIGINT) AS natural_share_milli,
       CAST(1000 * w // tot_w AS BIGINT) AS temp_share_milli,
       CAST({_TEMP_BUDGET} * w // tot_w AS BIGINT) AS alloc_tokens,
       CAST(1000 * ({_TEMP_BUDGET} * w // tot_w) // n_tokens AS BIGINT)
         AS effective_epochs_milli
FROM per_lang, tot
"""


QUERIES: dict[str, tuple] = {
    "pipeline_training_mix": (pipeline_training_mix, ORACLE_MIX),
    "pipeline_training_mix_summary": (
        pipeline_training_mix_summary,
        ORACLE_MIX_SUMMARY,
    ),
    "mix_language_temperature": (mix_language_temperature, ORACLE_TEMPERATURE),
}
