"""Embedding-space geometry diagnostics: the mutual-kNN / hubness report
ANN papers run before trusting a vector index (Radovanović et al., JMLR
2010 — high hubness predicts poor recall for IVF-style indexes).

``emb_knn_graph_stats``: over a FIXED-SIZE deterministic sample (the 256
smallest vec_ids by md5 rank — a TakeOrderedAndProject, so the sample
size is constant at ANY corpus size and the quadratic step is bounded by
construction, never corpus-quadratic), build the directed cosine kNN
graph within the sample and report the mutual-degree histogram: how many
nodes have 0..K of their k nearest neighbors reciprocate. A healthy
embedding space shows high mutuality; hub-dominated spaces (many nodes
with mutual degree 0 plus a few ultra-popular neighbors) flag metric
problems before an index is built.

Exactness: cosine follows similarity.py's convention (double transform,
round 4, (cos DESC, vec_id) tie-break); degrees are counts.

Scale: sample selection is a corpus-wide TakeOrderedAndProject on the
md5 rank (no shuffle beyond top-k); the 256×256 score block and
everything after is constant work. The full-corpus kNN graph is what
the IVF family is for — this is its fixed-cost health check.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from .similarity import _cos_rounded

from .common import t

KNN_SAMPLE = 256
KNN_K = 5


def emb_knn_graph_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual-degree histogram of the within-sample cosine kNN graph:
    rows (mutual_degree 0..K, n_nodes). See module docstring."""
    emb = t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    # pin the sample once (it feeds the broadcast side, the score probe and
    # the degree base — uncached it re-ran the corpus TakeOrdered 3x), and
    # spread the probe side: a post-limit frame is ALWAYS one partition, so
    # the K^2 cosine block ran on one core (guide §2.5). Both moves are
    # constant-size at any corpus scale (the sample is KNN_SAMPLE rows).
    sample = (
        emb.withColumn("mk", F.md5(F.col("vec_id").cast("string")))
        .orderBy("mk", "vec_id")
        .limit(KNN_SAMPLE)
        .select("vec_id", "embedding")
        .localCheckpoint()
    )
    probe = sample.repartition(spark.sparkContext.defaultParallelism)
    a = sample.select(F.col("vec_id").alias("qid"), F.col("embedding").alias("qe"))
    scored = (
        F.broadcast(a)
        .join(probe, F.col("vec_id") != F.col("qid"))
        .select(
            "qid",
            "vec_id",
            _cos_rounded(F.col("qe"), F.col("embedding")).alias("cos_sim"),
        )
    )
    w = W.partitionBy("qid").orderBy(F.desc("cos_sim"), F.asc("vec_id"))
    knn = (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= KNN_K)
        .select("qid", "vec_id")
    )
    rev = knn.select(F.col("vec_id").alias("qid"), F.col("qid").alias("vec_id"))
    mutual = knn.join(rev, ["qid", "vec_id"], "semi")
    mdeg = (
        sample.select(F.col("vec_id").alias("qid"))
        .join(mutual.groupBy("qid").agg(F.count("*").alias("md")), "qid", "left")
        .select(F.coalesce("md", F.lit(0)).cast("bigint").alias("mutual_degree"))
    )
    return mdeg.groupBy("mutual_degree").agg(
        F.count("*").cast("bigint").alias("n_nodes")
    )


ORACLE_KNN_GRAPH = f"""
WITH kg_sample AS (
  SELECT vec_id, embedding FROM embeddings
  ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT {KNN_SAMPLE}
), kg_scored AS (
  SELECT a.vec_id AS qid, b.vec_id,
         round(CAST(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                           CAST(b.embedding AS DOUBLE[]))
                    AS DOUBLE), 4) AS cos_sim
  FROM kg_sample a JOIN kg_sample b ON b.vec_id <> a.vec_id
), kg_knn AS (
  SELECT qid, vec_id FROM (
    SELECT qid, vec_id,
           row_number() OVER (PARTITION BY qid
                              ORDER BY cos_sim DESC, vec_id) AS rank
    FROM kg_scored
  ) WHERE rank <= {KNN_K}
), kg_mutual AS (
  SELECT k.qid, k.vec_id FROM kg_knn k
  WHERE EXISTS (SELECT 1 FROM kg_knn r
                WHERE r.qid = k.vec_id AND r.vec_id = k.qid)
), kg_mdeg AS (
  SELECT s.vec_id AS qid, CAST(COALESCE(m.md, 0) AS BIGINT) AS mutual_degree
  FROM kg_sample s
  LEFT JOIN (SELECT qid, COUNT(*) AS md FROM kg_mutual GROUP BY 1) m
    ON m.qid = s.vec_id
)
SELECT mutual_degree, CAST(COUNT(*) AS BIGINT) AS n_nodes
FROM kg_mdeg GROUP BY 1
"""


QUERIES: dict[str, tuple] = {
    "emb_knn_graph_stats": (emb_knn_graph_stats, ORACLE_KNN_GRAPH),
}
