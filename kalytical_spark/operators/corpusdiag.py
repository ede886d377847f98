"""Corpus-level diagnostics: novelty decay across ingest order and the
language-ID confusion matrix — the two tables a crawl pipeline reads
before deciding whether another snapshot is worth ingesting and whether
its language router can be trusted.

* ``docs_ngram_novelty`` — per ingest-order decile, what fraction of
  distinct trigrams are NOVEL (first seen in that doc): the marginal-
  value-of-more-data curve. A healthy growing corpus decays slowly; a
  re-crawl of the same sites collapses toward zero and tells you to
  stop paying for ingest.
* ``text_langid_confusion`` — true-language × predicted-language counts
  with per-true-language share, on top of text.py's profile-overlap
  language router. The confusion matrix is the standard router health
  check (and on this shared-vocabulary synthetic corpus it SHOWS the
  router at near-chance — the operator proves the eval machinery, the
  corpus proves nothing).

Exactness: counts and truncating divs only. Scale: novelty is one
distinct-gram explode, one map-side-combinable min(doc_id) per gram
(vocab-sized, shuffle_hash join back), one decile rollup; first-seen
attribution via min is order-free and deterministic. The confusion
matrix aggregates the router's per-doc argmax output — dimension-sized.

Reference parity: no corpus-diagnostic surface exists in the reference
(closest analog: the prefix/tag listing ``data_provider.py:39``);
built for the mandated crawl-ingest decision tier.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .common import t
from .text import ORACLE_LANGID, text_langid_predict

NOVELTY_DECILES = 10


def docs_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trigram novelty by ingest-order decile: a gram is credited as novel
    to the SMALLEST doc_id containing it (doc_id is the ingest-order
    proxy); each decile reports its distinct-gram mass, how much of it was
    novel, and the novelty rate in milli. The decay of novelty_milli
    across deciles is the dedup-ROI / data-value curve.

    Determinism: min(doc_id) attribution is order-free; deciles come from
    the closed-form bucket (doc_id · 10) div (max_doc_id + 1) — no NTILE,
    no unpartitioned window.

    Scale (r11 rework, guide §2.4 "remove shuffles outright"): one
    partition-local gram explode with per-doc dedup (array_distinct
    before exploding), one map-side-combinable groupBy gram (vocab-sized
    output). Novelty credit then needs NO join back on gram: grouping
    the (gram, first_doc) table by first_doc IS the per-doc novel count,
    and the per-doc distinct-gram count is size(array_distinct(...))
    computed map-side — so the old second full shuffle of the gram
    explosion (shuffle_hash probe) is gone; only two doc-sized frames
    meet in a join. The max-doc-id scalar rides a 1-row broadcast."""
    docs = t(spark, sf_dir, "documents").select("doc_id", "text")
    ts = F.split(F.col("text"), " ")
    # tokenize ONCE into a column: referencing split(text) inside the
    # transform lambda re-splits the document per gram (higher-order
    # functions evaluate interpreted, with no common-subexpression
    # elimination across elements — measured 4.5s -> 0.6s at sf0.1)
    eligible = docs.filter(F.size(ts) >= 3).select("doc_id", ts.alias("ts"))
    distinct_grams = F.array_distinct(
        F.expr(
            "transform(sequence(0, size(ts) - 3),"
            " i -> concat_ws(' ', ts[i], ts[i+1], ts[i+2]))"
        )
    )
    grams = eligible.select("doc_id", F.explode(distinct_grams).alias("gram"))
    n_per_doc = eligible.select(
        "doc_id", F.size(distinct_grams).cast("bigint").alias("n_distinct_grams")
    )
    novel_per_doc = (
        grams.groupBy("gram")
        .agg(F.min("doc_id").alias("first_doc"))
        .groupBy("first_doc")
        .agg(F.count("*").alias("n_novel"))
        .withColumnRenamed("first_doc", "doc_id")
    )
    per_doc = n_per_doc.join(novel_per_doc, "doc_id", "left").select(
        "doc_id",
        "n_distinct_grams",
        F.coalesce(F.col("n_novel"), F.lit(0)).cast("bigint").alias("n_novel"),
    )
    max_id = docs.groupBy().agg(F.max("doc_id").alias("max_id"))
    return (
        per_doc.crossJoin(F.broadcast(max_id))
        .withColumn(
            "decile",
            F.expr(f"CAST((doc_id * {NOVELTY_DECILES}) div (max_id + 1) AS BIGINT)"),
        )
        .groupBy("decile")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_distinct_grams").cast("bigint").alias("n_grams"),
            F.sum("n_novel").cast("bigint").alias("n_novel"),
            F.expr(
                "CAST((1000 * SUM(n_novel)) div SUM(n_distinct_grams) AS BIGINT)"
            ).alias("novelty_milli"),
        )
    )


ORACLE_NOVELTY = f"""
WITH nv_grams AS (
  SELECT DISTINCT doc_id, ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] AS gram
  FROM (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
       unnest(range(1, len(ts) - 1)) AS u(i)
  WHERE len(ts) >= 3
), nv_first AS (
  SELECT gram, MIN(doc_id) AS first_doc FROM nv_grams GROUP BY 1
), nv_per_doc AS (
  SELECT g.doc_id,
         CAST(COUNT(*) AS BIGINT) AS n_distinct_grams,
         CAST(SUM(CASE WHEN f.first_doc = g.doc_id THEN 1 ELSE 0 END) AS BIGINT)
           AS n_novel
  FROM nv_grams g JOIN nv_first f USING (gram)
  GROUP BY 1
), nv_max AS (
  SELECT MAX(doc_id) AS max_id FROM documents
)
SELECT CAST((d.doc_id * {NOVELTY_DECILES}) // (m.max_id + 1) AS BIGINT) AS decile,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_distinct_grams) AS BIGINT) AS n_grams,
       CAST(SUM(n_novel) AS BIGINT) AS n_novel,
       CAST((1000 * SUM(n_novel)) // SUM(n_distinct_grams) AS BIGINT)
         AS novelty_milli
FROM nv_per_doc d CROSS JOIN nv_max m
GROUP BY 1
"""


def text_langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-router confusion matrix: (true lang, predicted lang,
    count, per-true-language share in milli). Composes text.py's
    text_langid_predict router — the matrix is the eval artifact the
    router ships with.

    Exactness: counts and one truncating div. Scale: aggregates the
    router's per-doc output down to |langs|² rows."""
    pred = text_langid_predict(spark, sf_dir)
    cm = pred.groupBy("lang", "predicted_lang").agg(F.count("*").alias("n_docs"))
    tot = cm.groupBy("lang").agg(F.sum("n_docs").alias("n_lang"))
    return cm.join(F.broadcast(tot), "lang").select(
        "lang",
        "predicted_lang",
        F.col("n_docs").cast("bigint").alias("n_docs"),
        F.expr("CAST((1000 * n_docs) div n_lang AS BIGINT)").alias("share_milli"),
    )


ORACLE_LANGID_CONFUSION = f"""
WITH cm_pred AS (
  SELECT * FROM ({ORACLE_LANGID})
), cm AS (
  SELECT lang, predicted_lang, CAST(COUNT(*) AS BIGINT) AS n_docs
  FROM cm_pred GROUP BY 1, 2
), cm_tot AS (
  SELECT lang, CAST(SUM(n_docs) AS BIGINT) AS n_lang FROM cm GROUP BY 1
)
SELECT c.lang, c.predicted_lang, c.n_docs,
       CAST((1000 * c.n_docs) // t.n_lang AS BIGINT) AS share_milli
FROM cm c JOIN cm_tot t USING (lang)
"""


QUERIES: dict[str, tuple] = {
    "docs_ngram_novelty": (docs_ngram_novelty, ORACLE_NOVELTY),
    "text_langid_confusion": (text_langid_confusion, ORACLE_LANGID_CONFUSION),
}


BURST_TOP_K = 50


def text_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token burstiness (Church & Gale 1995): for the top-BURST_TOP_K
    tokens by collection frequency, the ratio cf/df — how many times a
    token repeats within the documents it appears in at all. Function
    words hover near cf/df ≈ uniform; bursty content words concentrate.
    Feeds stopword-list induction and BM25 parameter sanity checks.

    Exactness: burst_milli is one truncating div of exact counts; top-k
    carries the (cf DESC, token) unique tie-break.

    Scale: cf and df come from ONE map-side-combinable groupBy over the
    per-doc-deduped and raw token explodes; top-k is a
    TakeOrderedAndProject."""
    docs = t(spark, sf_dir, "documents").select("doc_id", "text")
    ts = F.split(F.col("text"), " ")
    toks = docs.select("doc_id", F.explode(ts).alias("tok"))
    stats = toks.groupBy("tok").agg(
        F.count("*").alias("cf"),
        F.countDistinct("doc_id").alias("df"),
    )
    return (
        stats.select(
            "tok",
            F.col("cf").cast("bigint").alias("cf"),
            F.col("df").cast("bigint").alias("df"),
            F.expr("CAST((1000 * cf) div df AS BIGINT)").alias("burst_milli"),
        )
        .orderBy(F.col("cf").desc(), F.col("tok"))
        .limit(BURST_TOP_K)
    )


ORACLE_BURSTINESS = f"""
WITH bu_toks AS (
  SELECT doc_id, tok
  FROM (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
       unnest(ts) AS u(tok)
), bu_stats AS (
  SELECT tok, CAST(COUNT(*) AS BIGINT) AS cf,
         CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
  FROM bu_toks GROUP BY 1
)
SELECT tok, cf, df, CAST((1000 * cf) // df AS BIGINT) AS burst_milli
FROM bu_stats
ORDER BY cf DESC, tok
LIMIT {BURST_TOP_K}
"""


QUERIES["text_burstiness"] = (text_burstiness, ORACLE_BURSTINESS)
