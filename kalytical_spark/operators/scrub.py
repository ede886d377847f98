"""PII scrubbing and temperature-based source mixing over the documents
table — two more stages of the training-data pipeline family (alongside
operators/preprocess.py): redact personally-identifiable strings before
training, and rebalance the source mix with temperature sampling.

Design for scale:
* PII redaction is pure ``regexp_count`` / ``regexp_replace`` — JVM-side,
  whole-stage-codegen, zero Python in the row path, embarrassingly
  parallel (no shuffle until the tiny per-doc rollup). At 100 TB this is
  a single map pass over the corpus.
* Temperature sampling needs only a per-source aggregate (8 sources —
  kilobytes) broadcast back against the corpus; the keep-decision is a
  pure hash of the stable doc key, so the sample is deterministic,
  engine-independent, and requires no global ordering or randomness.

Determinism rules (see operators/common.py):
* Regex patterns avoid engine-specific syntax — character classes, ``\\d``,
  ``\\b``, bounded quantifiers only — and are applied in the same order on
  both engines (replacement order matters when patterns could overlap).
* The sampling rate is ``min(1, BUDGET * sqrt(tokens) / tokens)`` — sqrt,
  multiply, divide are all IEEE-correctly-rounded single operations, so
  both engines compute the identical double with NO cross-row float sum
  in the rate path; the rate is rounded to 4dp and compared via integer
  bucket arithmetic (round() before any cast — DuckDB's double->int cast
  rounds where Spark's truncates).

The planted-PII corpus is non-vacuous by construction: every 53rd document
gets a re-keyed copy with synthetic email/phone/IPv4 strings derived from
its doc_id, so the scrub provably fires (same injection pattern as
dedup_exact / decontam_ngram_overlap).

Reference parity: the reference engine has no corpus-scrubbing surface
(kalytical is a pipeline orchestrator; SURVEY.md §2 note) — this module is
part of the LLM-training-data extension family the build brief mandates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .common import t

# Patterns chosen for identical semantics under Java regex (Spark) and RE2
# (DuckDB): no backreferences, no lookaround, no possessive quantifiers.
RE_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
RE_PHONE = r"\b\d{3}-\d{3}-\d{4}\b"
RE_IPV4 = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"

PII_STRIDE = 53  # every 53rd document gets a planted-PII twin
PII_KEY_OFFSET = 300000

# Temperature-sampling constants: rate_s = min(1, BUDGET*sqrt(tok_s)/tok_s).
# BUDGET is in sqrt-token units; smaller sources keep a larger fraction
# (classic temperature flattening with alpha = 0.5).
MIX_BUDGET = 220.0
BUCKETS = 65536  # keep-decision granularity (md5 first 4 hex digits)


def _pii_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents UNION a re-keyed copy of every PII_STRIDE-th doc with
    planted email/phone/IPv4 derived from doc_id (arithmetic identical in
    the SQL twin)."""
    docs = t(spark, sf_dir, "documents").select("doc_id", "source", "text")
    d = F.col("doc_id")
    planted = docs.filter(d % PII_STRIDE == 0).select(
        (d + PII_KEY_OFFSET).alias("doc_id"),
        "source",
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            d.cast("string"),
            F.lit("@example.com or call "),
            F.lit("555-"),
            F.lpad((d * 7 % 1000).cast("string"), 3, "0"),
            F.lit("-"),
            F.lpad((d * 13 % 10000).cast("string"), 4, "0"),
            F.lit(" from 10."),
            (d % 256).cast("string"),
            F.lit("."),
            F.expr("(doc_id DIV 256) % 256").cast("string"),
            F.lit("."),
            (d % 254 + 1).cast("string"),
        ).alias("text"),
    )
    return docs.unionByName(planted)


def pii_scrub_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document PII scrub ledger: counts of each PII class found and
    the md5 of the redacted text (a value-level proof that both engines
    produced byte-identical redactions). Only documents that contained
    any PII are returned — the scrub must provably fire on the planted
    rows and provably NOT fire elsewhere (word-salad corpus has no
    digits/@, so base docs contribute nothing; a base-doc hit would
    surface as an oracle diff)."""
    corpus = _pii_corpus(spark, sf_dir)
    txt = F.col("text")
    redacted = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(txt, RE_EMAIL, "<EMAIL>"), RE_PHONE, "<PHONE>"
        ),
        RE_IPV4,
        "<IP>",
    )
    out = corpus.select(
        "doc_id",
        "source",
        F.regexp_count(txt, F.lit(RE_EMAIL)).cast("bigint").alias("n_emails"),
        F.regexp_count(txt, F.lit(RE_PHONE)).cast("bigint").alias("n_phones"),
        F.regexp_count(txt, F.lit(RE_IPV4)).cast("bigint").alias("n_ipv4"),
        F.length(redacted).cast("bigint").alias("redacted_len"),
        F.md5(redacted).alias("redact_hash"),
    )
    return out.filter(
        (F.col("n_emails") + F.col("n_phones") + F.col("n_ipv4")) > 0
    )


ORACLE_PII = f"""
WITH corpus AS (
  SELECT doc_id, source, text FROM documents
  UNION ALL
  SELECT doc_id + {PII_KEY_OFFSET}, source,
         text || ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com or call '
              || '555-' || lpad(CAST(doc_id * 7 % 1000 AS VARCHAR), 3, '0')
              || '-' || lpad(CAST(doc_id * 13 % 10000 AS VARCHAR), 4, '0')
              || ' from 10.' || CAST(doc_id % 256 AS VARCHAR)
              || '.' || CAST((doc_id // 256) % 256 AS VARCHAR)
              || '.' || CAST(doc_id % 254 + 1 AS VARCHAR)
  FROM documents WHERE doc_id % {PII_STRIDE} = 0
), scrubbed AS (
  SELECT doc_id, source,
         CAST(len(regexp_extract_all(text, '{RE_EMAIL}')) AS BIGINT) AS n_emails,
         CAST(len(regexp_extract_all(text, '{RE_PHONE}')) AS BIGINT) AS n_phones,
         CAST(len(regexp_extract_all(text, '{RE_IPV4}')) AS BIGINT) AS n_ipv4,
         regexp_replace(regexp_replace(regexp_replace(text,
             '{RE_EMAIL}', '<EMAIL>', 'g'),
             '{RE_PHONE}', '<PHONE>', 'g'),
             '{RE_IPV4}', '<IP>', 'g') AS redacted
  FROM corpus
)
SELECT doc_id, source, n_emails, n_phones, n_ipv4,
       CAST(len(redacted) AS BIGINT) AS redacted_len,
       md5(redacted) AS redact_hash
FROM scrubbed
WHERE n_emails + n_phones + n_ipv4 > 0
"""


def mix_temperature_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based source rebalancing (alpha = 0.5): per source,
    rate = min(1, BUDGET * sqrt(total_tokens) / total_tokens), then keep a
    document iff its hash bucket (md5 first 4 hex digits, 0..65535) falls
    under round(rate * 65536). Big sources are downsampled toward the
    sqrt curve; small sources are kept whole — the standard flattening
    used to build training mixes. Reports per (source, lang): corpus and
    kept doc/token counts plus the applied rate.

    Scale: one per-source aggregate (8 rows) broadcast-joined back; the
    keep-decision is a stateless hash filter — one corpus pass, one tiny
    shuffle for the final rollup."""
    docs = t(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        "lang",
        F.size(F.split(F.col("text"), " ")).cast("bigint").alias("n_tok"),
    )
    per_source = docs.groupBy("source").agg(F.sum("n_tok").alias("src_tok"))
    rate = F.round(
        F.least(
            F.lit(1.0),
            F.lit(MIX_BUDGET)
            * F.sqrt(F.col("src_tok").cast("double"))
            / F.col("src_tok").cast("double"),
        ),
        4,
    )
    rated = per_source.select(
        "source", rate.alias("rate"), F.round(rate * BUCKETS).cast("bigint").alias("cut")
    )
    bucket = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4), 16, 10
    ).cast("bigint")
    kept = (
        docs.join(F.broadcast(rated), "source")
        .withColumn("keep", (bucket < F.col("cut")).cast("int"))
    )
    return kept.groupBy("source", "lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tok").alias("n_tokens"),
        F.max("rate").alias("rate"),
        F.sum("keep").cast("bigint").alias("n_kept"),
        F.sum(F.col("keep") * F.col("n_tok")).cast("bigint").alias("tokens_kept"),
    )


ORACLE_MIX = f"""
WITH docs AS (
  SELECT doc_id, source, lang,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
  FROM documents
), rated AS (
  SELECT source,
         ROUND(LEAST(1.0, {MIX_BUDGET} * sqrt(CAST(SUM(n_tok) AS DOUBLE))
                          / CAST(SUM(n_tok) AS DOUBLE)), 4) AS rate
  FROM docs GROUP BY source
), kept AS (
  SELECT d.source, d.lang, d.n_tok, r.rate,
         CASE WHEN CAST('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 4) AS BIGINT)
                   < CAST(ROUND(r.rate * {BUCKETS}) AS BIGINT)
              THEN 1 ELSE 0 END AS keep
  FROM docs d JOIN rated r USING (source)
)
SELECT source, lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
       MAX(rate) AS rate,
       CAST(SUM(keep) AS BIGINT) AS n_kept,
       CAST(SUM(keep * n_tok) AS BIGINT) AS tokens_kept
FROM kept
GROUP BY source, lang
"""


_K_ANON = 5  # minimum group size: quasi-identifier groups below this flag


def events_k_anonymity_audit(spark, sf_dir):
    """k-anonymity audit over the event log's quasi-identifier tuple
    (event_type, day, value decade): per equivalence class, its size and
    whether it violates k — the re-identification screen a privacy review
    runs BEFORE release, completing the PII family (pii_scrub_docs removes
    direct identifiers; this catches indirect ones). The summary row set
    is per-class (bounded by |types| x |days| x |decades|, not corpus
    size); at 100 TB the class rollup is one map-side-combinable groupBy.
    The value decade reuses the quantile sketch's digit-count bucket — a
    coarsening a real release would tune per attribute."""
    from pyspark.sql import functions as F

    from .common import t

    ev = t(spark, sf_dir, "events_ms")
    cents = (F.col("value").cast("decimal(12,4)") * 100).cast("bigint")
    classes = (
        ev.select(
            "event_type",
            F.date_trunc("day", "ts").cast("date").alias("day"),
            F.length(cents.cast("string")).cast("int").alias("value_decade"),
        )
        .groupBy("event_type", "day", "value_decade")
        .agg(F.count("*").cast("bigint").alias("class_size"))
    )
    return classes.select(
        "event_type",
        "day",
        "value_decade",
        "class_size",
        (F.col("class_size") < _K_ANON).alias("violates_k"),
    )


ORACLE_K_ANON = f"""
SELECT event_type,
       CAST(date_trunc('day', ts) AS DATE) AS day,
       CAST(length(CAST(CAST(CAST(value AS DECIMAL(12,4)) * 100 AS BIGINT)
                        AS VARCHAR)) AS INTEGER) AS value_decade,
       CAST(COUNT(*) AS BIGINT) AS class_size,
       COUNT(*) < {_K_ANON} AS violates_k
FROM events_ms
GROUP BY 1, 2, 3
"""


_L_DIV = 3  # minimum sensitive-attribute diversity per class


def events_l_diversity_audit(spark, sf_dir):
    """l-diversity audit: k-anonymity's homogeneity-attack complement.
    The quasi-identifier here is (day, value decade) and the SENSITIVE
    attribute is event_type: a class can be large (k-safe) yet still
    leak if nearly every row shares one sensitive value. Per class:
    size, distinct-sensitive count l, the dominant value's integer milli
    share, and the violates_l flag (l < 3).

    Scale: per-(class, sensitive) counts are one map-side-combinable
    groupBy; the class rollup aggregates that bounded frame (|days| x
    |decades| x |types|). Nothing corpus-sized shuffles twice."""
    from pyspark.sql import functions as F

    from .common import t

    ev = t(spark, sf_dir, "events_ms")
    cents = (F.col("value").cast("decimal(12,4)") * 100).cast("bigint")
    per_sens = (
        ev.select(
            F.date_trunc("day", "ts").cast("date").alias("day"),
            F.length(cents.cast("string")).cast("int").alias("value_decade"),
            "event_type",
        )
        .groupBy("day", "value_decade", "event_type")
        .agg(F.count("*").cast("bigint").alias("n"))
    )
    return (
        per_sens.groupBy("day", "value_decade")
        .agg(
            F.sum("n").cast("bigint").alias("class_size"),
            F.count("*").cast("bigint").alias("l_distinct"),
            F.max("n").cast("bigint").alias("dominant_n"),
        )
        .select(
            "day",
            "value_decade",
            "class_size",
            "l_distinct",
            F.expr("CAST(1000 * dominant_n div class_size AS BIGINT)").alias(
                "dominant_milli"
            ),
            (F.col("l_distinct") < _L_DIV).alias("violates_l"),
        )
    )


ORACLE_L_DIV = f"""
WITH per_sens AS (
  SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
         CAST(length(CAST(CAST(CAST(value AS DECIMAL(12,4)) * 100 AS BIGINT)
                          AS VARCHAR)) AS INTEGER) AS value_decade,
         event_type, CAST(COUNT(*) AS BIGINT) AS n
  FROM events_ms
  GROUP BY 1, 2, 3
)
SELECT day, value_decade,
       CAST(SUM(n) AS BIGINT) AS class_size,
       CAST(COUNT(*) AS BIGINT) AS l_distinct,
       CAST(1000 * MAX(n) // SUM(n) AS BIGINT) AS dominant_milli,
       COUNT(*) < {_L_DIV} AS violates_l
FROM per_sens
GROUP BY 1, 2
"""


QUERIES = {
    "pii_scrub_docs": (pii_scrub_docs, ORACLE_PII),
    "mix_temperature_sample": (mix_temperature_sample, ORACLE_MIX),
    "events_k_anonymity_audit": (events_k_anonymity_audit, ORACLE_K_ANON),
    "events_l_diversity_audit": (events_l_diversity_audit, ORACLE_L_DIV),
}
