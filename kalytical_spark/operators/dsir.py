"""DSIR — Data Selection via Importance Resampling (public literature:
Xie, Santurkar, Ma & Liang 2023): score every raw document by how much it
looks like a TARGET distribution, using hashed n-gram importance weights
ln p_target(f) - ln p_raw(f) summed over the document's features. The
standard pretraining-data selection operator: given a small trusted target
corpus, rank the crawl by target-likeness and resample.

Fixture target = the lang='en' slice (a realistic "select more of the
distribution my eval set lives in" stand-in); features = unigrams +
bigrams hashed into DSIR_BUCKETS buckets (the hashed n-gram trick from
the paper — vocabulary-independent, fixed model size).

Determinism/exactness: bucket hash is the md5-prefix integer (the
simhash/sign-LSH convention); the per-BUCKET log-ratio is snapped ONCE to
integer micro-units (identical LN expression trees from exact
Laplace-smoothed integer counts in both engines), and per-document scores
are then pure bigint sums of bucket weights — no float accumulates across
rows.

Scale: the bucket model is DSIR_BUCKETS rows (constant, broadcast); the
corpus is touched twice (model fit, scoring), each a map-side-combinable
aggregate; the final top-k is TakeOrdered-sized. At 100 TB this is two
scans + a constant-size broadcast — exactly the paper's production shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .common import t

DSIR_BUCKETS = 256
DSIR_TOP_K = 20
_TARGET_LANG = "en"

_SPARK_FEATS = """
concat(
  split(text, ' '),
  CASE WHEN size(split(text, ' ')) < 2 THEN array()
       ELSE transform(sequence(1, size(split(text, ' ')) - 1),
                      i -> concat(element_at(split(text, ' '), i), '_',
                                  element_at(split(text, ' '), i + 1)))
  END
)
"""

_DUCK_FEATS = """
list_concat(
  string_split(text, ' '),
  list_transform(range(1, len(string_split(text, ' '))),
                 i -> string_split(text, ' ')[i] || '_' || string_split(text, ' ')[i + 1])
)
"""


def _bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, lang, bucket) per feature INSTANCE (counts weighted by
    occurrence, the paper's multinomial model)."""
    docs = t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        "lang",
        F.explode(F.expr(_SPARK_FEATS)).alias("f"),
    ).select(
        "doc_id",
        "lang",
        F.expr(
            f"CAST(conv(substring(md5(f), 1, 8), 16, 10) AS BIGINT) % {DSIR_BUCKETS}"
        ).cast("int")
        .alias("bucket"),
    )


def docs_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-DSIR_TOP_K documents by hashed-n-gram importance weight toward
    the target slice, with the per-doc feature count and exact micro
    score."""
    # the exploded feature frame feeds FOUR consumers (raw counts, target
    # counts, totals, scoring) — cache it for the query's duration so the
    # unigram+bigram explode runs once, not four times (7.9 s -> one scan)
    b = _bucketed(spark, sf_dir).cache()
    raw = b.groupBy("bucket").agg(F.count("*").cast("bigint").alias("cr"))
    tgt = (
        b.filter(F.col("lang") == _TARGET_LANG)
        .groupBy("bucket")
        .agg(F.count("*").cast("bigint").alias("ct"))
    )
    totals = b.agg(
        F.count("*").cast("bigint").alias("r_total"),
        F.sum((F.col("lang") == _TARGET_LANG).cast("int")).cast("bigint").alias("t_total"),
    )
    model = (
        raw.join(tgt, "bucket", "left")
        .withColumn("ct", F.coalesce("ct", F.lit(0).cast("bigint")))
        .crossJoin(F.broadcast(totals))
        .select(
            "bucket",
            F.expr(
                f"CAST(ROUND(1000000 * ("
                f"LN(CAST(ct + 1 AS DOUBLE) / CAST(t_total + {DSIR_BUCKETS} AS DOUBLE))"
                f" - LN(CAST(cr + 1 AS DOUBLE) / CAST(r_total + {DSIR_BUCKETS} AS DOUBLE))"
                f")) AS BIGINT)"
            ).alias("w_micro"),
        )
    )
    scored = (
        b.join(F.broadcast(model), "bucket")
        .groupBy("doc_id", "lang")
        .agg(
            F.count("*").cast("bigint").alias("n_feats"),
            F.sum("w_micro").cast("bigint").alias("weight_micro"),
        )
    )
    return (
        scored.orderBy(F.desc("weight_micro"), F.asc("doc_id"))
        .limit(DSIR_TOP_K)
        .select("doc_id", "lang", "n_feats", "weight_micro")
    )


ORACLE_DSIR = f"""
WITH feats AS (
  SELECT doc_id, lang, u.f AS f
  FROM (SELECT doc_id, lang, {_DUCK_FEATS} AS fs FROM documents),
       unnest(fs) AS u(f)
),
b AS (
  SELECT doc_id, lang,
         CAST(('0x' || substr(md5(f), 1, 8))::UBIGINT % {DSIR_BUCKETS} AS INTEGER) AS bucket
  FROM feats
),
raw AS (SELECT bucket, CAST(COUNT(*) AS BIGINT) AS cr FROM b GROUP BY 1),
tgt AS (SELECT bucket, CAST(COUNT(*) AS BIGINT) AS ct FROM b
        WHERE lang = '{_TARGET_LANG}' GROUP BY 1),
totals AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS r_total,
         CAST(SUM(CASE WHEN lang = '{_TARGET_LANG}' THEN 1 ELSE 0 END) AS BIGINT) AS t_total
  FROM b
),
model AS (
  SELECT raw.bucket,
         CAST(ROUND(1000000 * (
           LN(CAST(COALESCE(ct, 0) + 1 AS DOUBLE) / CAST(t_total + {DSIR_BUCKETS} AS DOUBLE))
           - LN(CAST(cr + 1 AS DOUBLE) / CAST(r_total + {DSIR_BUCKETS} AS DOUBLE))
         )) AS BIGINT) AS w_micro
  FROM raw LEFT JOIN tgt ON raw.bucket = tgt.bucket CROSS JOIN totals
),
scored AS (
  SELECT b.doc_id, b.lang,
         CAST(COUNT(*) AS BIGINT) AS n_feats,
         CAST(SUM(m.w_micro) AS BIGINT) AS weight_micro
  FROM b JOIN model m ON b.bucket = m.bucket
  GROUP BY 1, 2
)
SELECT doc_id, lang, n_feats, weight_micro
FROM scored
ORDER BY weight_micro DESC, doc_id
LIMIT {DSIR_TOP_K}
"""


QUERIES: dict[str, tuple] = {
    "docs_dsir_weights": (docs_dsir_weights, ORACLE_DSIR),
}
