"""Relevance scoring over the documents table — TF-IDF and BM25, the
standard lexical-ranking primitives a training-data pipeline uses for
quality weighting and query-based corpus slicing.

All pure pyspark.sql.functions (JVM-side, whole-stage codegen): token
explode -> map-side-combinable aggregates -> joins of the per-term
statistics back onto the doc-term frame. Corpus-level scalars (doc count,
average doc length) ride a broadcast crossJoin exactly like the
scalar-subquery operators in subqueries.py.

Join strategy by cardinality class:
* UNBOUNDED per-term stats (TF-IDF's df table — the vocabulary, 10^8+
  terms with ngrams at web scale) must NOT be broadcast-hinted: a forced
  broadcast ignores size and blows driver memory exactly when the corpus
  grows. They ride a shuffle_hash-hinted join on `term`: both sides are
  already keyed by term, per-partition vocab slices stay small, and AQE's
  skew-join splitting handles stopword-heavy probe partitions.
* BOUNDED dims keep explicit broadcasts: BM25's query-term set is LIMIT
  BM25_N_QUERY_TERMS (constant) and the corpus stats are one row.

Determinism: scores are rounded to 6 decimals BEFORE ranking (ln() may
differ in the last ulp across engines; the noise is ~1e-15 of O(1..10)
values, far below the 5e-7 rounding margin); every top-k carries a unique
tie-break.

Scale: nothing corpus-sized is ever collected or broadcast except the
per-TERM statistics (vocabulary-sized, not corpus-sized) and two scalars.
At 100 TB the explode is partition-local and every aggregate has a partial
(map-side) phase; the final per-doc rank is one shuffle on doc_id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from .common import t

TFIDF_TOP_TERMS = 3
BM25_K1 = 1.2
BM25_B = 0.75
BM25_N_QUERY_TERMS = 4
BM25_TOP_DOCS = 5


def _doc_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, term, tf) — term frequency per document."""
    docs = t(spark, sf_dir, "documents")
    return (
        docs.select("doc_id", F.explode(F.split(F.col("text"), " ")).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )


_SQL_DOC_TERMS = """
  SELECT doc_id, u.term AS term, CAST(COUNT(*) AS BIGINT) AS tf
  FROM (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
       unnest(ts) AS u(term)
  GROUP BY 1, 2
"""


def text_tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top TF-IDF terms per document: tf * ln(N / df), rounded to 6 dp,
    top TFIDF_TOP_TERMS per doc (score desc, term asc)."""
    tf = _doc_terms(spark, sf_dir)
    df_ = tf.groupBy("term").agg(F.count("*").alias("df"))
    n_docs = t(spark, sf_dir, "documents").agg(F.count("*").alias("n_docs"))
    scored = (
        tf.join(df_.hint("shuffle_hash"), "term")  # vocab-sized: never broadcast
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "term",
            "tf",
            F.round(
                F.col("tf").cast("double")
                * F.log(F.col("n_docs").cast("double") / F.col("df").cast("double")),
                6,
            ).alias("tfidf"),
        )
    )
    w = W.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= TFIDF_TOP_TERMS)
        .select("doc_id", F.col("rk").cast("int").alias("rk"), "term", "tf", "tfidf")
    )


ORACLE_TFIDF = f"""
WITH tf AS ({_SQL_DOC_TERMS}),
df AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY 1),
n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents),
scored AS (
  SELECT tf.doc_id, tf.term, tf.tf,
         round(CAST(tf.tf AS DOUBLE)
               * ln(CAST(n.n_docs AS DOUBLE) / CAST(df.df AS DOUBLE)), 6) AS tfidf
  FROM tf JOIN df USING (term) CROSS JOIN n
)
SELECT doc_id, CAST(rk AS INT) AS rk, term, tf, tfidf
FROM (
  SELECT *, row_number() OVER (PARTITION BY doc_id
                               ORDER BY tfidf DESC, term) AS rk
  FROM scored
) WHERE rk <= {TFIDF_TOP_TERMS}
"""


def text_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 (k1={BM25_K1}, b={BM25_B}) of every document against the corpus's
    BM25_N_QUERY_TERMS highest-document-frequency terms (a deterministic,
    data-derived query set), returning the BM25_TOP_DOCS best docs per term.

    idf = ln(1 + (N - df + 0.5) / (df + 0.5)) — the Robertson-Sparck-Jones
    smoothed form; dl/avgdl uses exact integer token counts with a single
    double division."""
    tf = _doc_terms(spark, sf_dir)
    df_ = tf.groupBy("term").agg(F.count("*").alias("df"))
    docs = t(spark, sf_dir, "documents")
    dl = docs.select(
        "doc_id", F.size(F.split(F.col("text"), " ")).cast("bigint").alias("dl")
    )
    stats = docs.agg(
        F.count("*").alias("n_docs"),
        F.sum(F.size(F.split(F.col("text"), " ")).cast("bigint")).alias("total_dl"),
    )
    qterms = (
        df_.orderBy(F.desc("df"), F.asc("term"))
        .limit(BM25_N_QUERY_TERMS)
        .select("term", "df")
    )
    nd = F.col("n_docs").cast("double")
    dfd = F.col("df").cast("double")
    idf = F.log(F.lit(1.0) + (nd - dfd + F.lit(0.5)) / (dfd + F.lit(0.5)))
    avgdl = F.col("total_dl").cast("double") / nd
    tfd = F.col("tf").cast("double")
    denom = tfd + F.lit(BM25_K1) * (
        F.lit(1.0) - F.lit(BM25_B) + F.lit(BM25_B) * (F.col("dl").cast("double") / avgdl)
    )
    scored = (
        tf.join(F.broadcast(qterms), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select(
            "term",
            "doc_id",
            "tf",
            F.round(idf * (tfd * F.lit(BM25_K1 + 1.0)) / denom, 6).alias("bm25"),
        )
    )
    w = W.partitionBy("term").orderBy(F.desc("bm25"), F.asc("doc_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= BM25_TOP_DOCS)
        .select("term", F.col("rk").cast("int").alias("rk"), "doc_id", "tf", "bm25")
    )


ORACLE_BM25 = f"""
WITH tf AS ({_SQL_DOC_TERMS}),
df AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY 1),
dl AS (SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS dl FROM documents),
stats AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS total_dl
  FROM documents
),
qterms AS (SELECT term, df FROM df ORDER BY df DESC, term LIMIT {BM25_N_QUERY_TERMS}),
scored AS (
  SELECT tf.term, tf.doc_id, tf.tf,
         round(
           ln(1.0 + (CAST(n_docs AS DOUBLE) - CAST(qterms.df AS DOUBLE) + 0.5)
                    / (CAST(qterms.df AS DOUBLE) + 0.5))
           * (CAST(tf.tf AS DOUBLE) * {BM25_K1 + 1.0})
           / (CAST(tf.tf AS DOUBLE) + {BM25_K1} * (1.0 - {BM25_B} + {BM25_B}
                * (CAST(dl.dl AS DOUBLE) / (CAST(total_dl AS DOUBLE) / CAST(n_docs AS DOUBLE))))),
           6) AS bm25
  FROM tf JOIN qterms USING (term) JOIN dl USING (doc_id) CROSS JOIN stats
)
SELECT term, CAST(rk AS INT) AS rk, doc_id, tf, bm25
FROM (
  SELECT *, row_number() OVER (PARTITION BY term
                               ORDER BY bm25 DESC, doc_id) AS rk
  FROM scored
) WHERE rk <= {BM25_TOP_DOCS}
"""


def text_phrase_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional phrase search: per-document occurrence counts of an
    exact 2-token phrase — the positional-inverted-index primitive
    (lexical retrieval's phrase/proximity operator). The probe phrase is
    the corpus's own most frequent bigram (deterministic tie-break), so
    the query is self-contained; a production search passes the phrase as
    a parameter into the identical plan.

    Scale shape: token adjacency comes from arrays_zip over the token
    array — PARTITION-LOCAL, no positional self-join and no shuffle of
    positions; the phrase-frequency table is vocabulary-sized
    (map-side-combinable groupBy); the probe phrase is ONE broadcast row;
    the only corpus-keyed shuffle is the final per-doc count."""
    docs = t(spark, sf_dir, "documents").select("doc_id", "text")
    ts = F.split(F.col("text"), " ")
    bg = (
        docs.filter(F.size(ts) >= 2)
        .select(
            "doc_id",
            F.explode(
                F.arrays_zip(
                    F.slice(ts, 1, F.size(ts) - 1).alias("w1"),
                    F.slice(ts, 2, F.size(ts) - 1).alias("w2"),
                )
            ).alias("b"),
        )
        .select("doc_id", F.col("b.w1").alias("w1"), F.col("b.w2").alias("w2"))
    )
    top1 = (
        bg.groupBy("w1", "w2")
        .agg(F.count("*").alias("n_corpus"))
        .orderBy(F.desc("n_corpus"), "w1", "w2")
        .limit(1)
    )
    return (
        bg.join(F.broadcast(top1), ["w1", "w2"])
        .groupBy("doc_id")
        .agg(
            F.concat_ws(" ", F.first("w1"), F.first("w2")).alias("phrase"),
            F.count("*").cast("bigint").alias("n_occurrences"),
            F.first("n_corpus").cast("bigint").alias("n_corpus"),
        )
    )


ORACLE_PHRASE = """
WITH splits AS (
  SELECT doc_id, string_split(text, ' ') AS ts FROM documents
), bg2 AS (
  SELECT doc_id, ts[i] AS w1, ts[i + 1] AS w2
  FROM (SELECT doc_id, ts,
               unnest(generate_series(1, len(ts) - 1)) AS i
        FROM splits
        WHERE len(ts) >= 2)
), top1 AS (
  SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS n_corpus
  FROM bg2 GROUP BY 1, 2
  ORDER BY COUNT(*) DESC, w1, w2 LIMIT 1
)
SELECT b.doc_id,
       t.w1 || ' ' || t.w2 AS phrase,
       CAST(COUNT(*) AS BIGINT) AS n_occurrences,
       t.n_corpus
FROM bg2 b JOIN top1 t ON b.w1 = t.w1 AND b.w2 = t.w2
GROUP BY 1, 2, 4
"""


RRF_K = 60  # standard reciprocal-rank-fusion damping constant
RRF_POOL = 20  # per-system candidate depth fed into the fusion
RRF_TOP = 5  # fused results returned per query term
RRF_SCALE = 10**9  # integer contribution = RRF_SCALE // (RRF_K + rank)


def text_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal-rank fusion of two lexical retrieval systems over the
    same data-derived query terms as text_bm25_topk: (a) BM25 and (b)
    length-normalized term density round(tf/dl, 6) — the hybrid-retrieval
    merge step every RAG/training-data pipeline runs (vector+lexical in
    production; two lexical systems here keep both legs oracle-exact).

    Each system contributes RRF_SCALE div (RRF_K + rank) for its top
    RRF_POOL docs — integer division, so the fused score is exact in both
    engines (both truncate toward zero on positives); docs outside a
    system's pool contribute nothing. Top RRF_TOP per term by fused score,
    doc_id tie-break.

    Scale: both legs rank only the qterm-filtered posting slice
    (BM25_N_QUERY_TERMS is a broadcast constant), partitioned per term;
    the fusion is one hash-aggregate on (term, doc_id) and a
    TakeOrderedAndProject-shaped per-term top-k. Nothing corpus-sized is
    collected or broadcast."""
    tf = _doc_terms(spark, sf_dir)
    df_ = tf.groupBy("term").agg(F.count("*").alias("df"))
    docs = t(spark, sf_dir, "documents")
    dl = docs.select(
        "doc_id", F.size(F.split(F.col("text"), " ")).cast("bigint").alias("dl")
    )
    stats = docs.agg(
        F.count("*").alias("n_docs"),
        F.sum(F.size(F.split(F.col("text"), " ")).cast("bigint")).alias("total_dl"),
    )
    qterms = (
        df_.orderBy(F.desc("df"), F.asc("term"))
        .limit(BM25_N_QUERY_TERMS)
        .select("term", "df")
    )
    nd = F.col("n_docs").cast("double")
    dfd = F.col("df").cast("double")
    idf = F.log(F.lit(1.0) + (nd - dfd + F.lit(0.5)) / (dfd + F.lit(0.5)))
    avgdl = F.col("total_dl").cast("double") / nd
    tfd = F.col("tf").cast("double")
    denom = tfd + F.lit(BM25_K1) * (
        F.lit(1.0) - F.lit(BM25_B) + F.lit(BM25_B) * (F.col("dl").cast("double") / avgdl)
    )
    scored = (
        tf.join(F.broadcast(qterms), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select(
            "term",
            "doc_id",
            F.round(idf * (tfd * F.lit(BM25_K1 + 1.0)) / denom, 6).alias("bm25"),
            F.round(tfd / F.col("dl").cast("double"), 6).alias("density"),
        )
    )
    w_bm25 = W.partitionBy("term").orderBy(F.desc("bm25"), F.asc("doc_id"))
    w_dens = W.partitionBy("term").orderBy(F.desc("density"), F.asc("doc_id"))
    ranked = scored.select(
        "term",
        "doc_id",
        F.row_number().over(w_bm25).alias("rk_bm25"),
        F.row_number().over(w_dens).alias("rk_dens"),
    )
    contrib = (
        F.when(F.col("rk_bm25") <= RRF_POOL, F.expr(f"{RRF_SCALE} div ({RRF_K} + rk_bm25)"))
        .otherwise(F.lit(0))
        + F.when(F.col("rk_dens") <= RRF_POOL, F.expr(f"{RRF_SCALE} div ({RRF_K} + rk_dens)"))
        .otherwise(F.lit(0))
    ).cast("bigint")
    n_sys = (
        F.when(F.col("rk_bm25") <= RRF_POOL, 1).otherwise(0)
        + F.when(F.col("rk_dens") <= RRF_POOL, 1).otherwise(0)
    ).cast("int")
    fused = ranked.select(
        "term", "doc_id", contrib.alias("rrf_score"), n_sys.alias("n_systems")
    ).filter(F.col("n_systems") > 0)
    w_f = W.partitionBy("term").orderBy(F.desc("rrf_score"), F.asc("doc_id"))
    return (
        fused.withColumn("rk", F.row_number().over(w_f))
        .filter(F.col("rk") <= RRF_TOP)
        .select(
            "term",
            F.col("rk").cast("int").alias("rk"),
            "doc_id",
            "rrf_score",
            "n_systems",
        )
    )


ORACLE_RRF = f"""
WITH tf AS ({_SQL_DOC_TERMS}),
df AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY 1),
dl AS (SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS dl FROM documents),
stats AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS total_dl
  FROM documents
),
qterms AS (SELECT term, df FROM df ORDER BY df DESC, term LIMIT {BM25_N_QUERY_TERMS}),
scored AS (
  SELECT tf.term, tf.doc_id,
         round(
           ln(1.0 + (CAST(n_docs AS DOUBLE) - CAST(qterms.df AS DOUBLE) + 0.5)
                    / (CAST(qterms.df AS DOUBLE) + 0.5))
           * (CAST(tf.tf AS DOUBLE) * {BM25_K1 + 1.0})
           / (CAST(tf.tf AS DOUBLE) + {BM25_K1} * (1.0 - {BM25_B} + {BM25_B}
                * (CAST(dl.dl AS DOUBLE) / (CAST(total_dl AS DOUBLE) / CAST(n_docs AS DOUBLE))))),
           6) AS bm25,
         round(CAST(tf.tf AS DOUBLE) / CAST(dl.dl AS DOUBLE), 6) AS density
  FROM tf JOIN qterms USING (term) JOIN dl USING (doc_id) CROSS JOIN stats
),
ranked AS (
  SELECT term, doc_id,
         row_number() OVER (PARTITION BY term ORDER BY bm25 DESC, doc_id) AS rk_bm25,
         row_number() OVER (PARTITION BY term ORDER BY density DESC, doc_id) AS rk_dens
  FROM scored
),
fused AS (
  SELECT term, doc_id,
         CAST(CASE WHEN rk_bm25 <= {RRF_POOL} THEN {RRF_SCALE} // ({RRF_K} + rk_bm25) ELSE 0 END
            + CASE WHEN rk_dens <= {RRF_POOL} THEN {RRF_SCALE} // ({RRF_K} + rk_dens) ELSE 0 END
            AS BIGINT) AS rrf_score,
         CAST(CASE WHEN rk_bm25 <= {RRF_POOL} THEN 1 ELSE 0 END
            + CASE WHEN rk_dens <= {RRF_POOL} THEN 1 ELSE 0 END AS INT) AS n_systems
  FROM ranked
)
SELECT term, CAST(rk AS INT) AS rk, doc_id, rrf_score, n_systems
FROM (
  SELECT *, row_number() OVER (PARTITION BY term
                               ORDER BY rrf_score DESC, doc_id) AS rk
  FROM fused WHERE n_systems > 0
) WHERE rk <= {RRF_TOP}
"""


QUERIES: dict[str, tuple] = {
    "text_tfidf_topk": (text_tfidf_topk, ORACLE_TFIDF),
    "text_bm25_topk": (text_bm25_topk, ORACLE_BM25),
    "text_phrase_search": (text_phrase_search, ORACLE_PHRASE),
    "text_rrf_fusion": (text_rrf_fusion, ORACLE_RRF),
}
