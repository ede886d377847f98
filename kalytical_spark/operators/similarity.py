"""Similarity-search operators over the embeddings table (north star):
brute-force cosine top-k as the correctness baseline, and an IVF-style
two-stage search (coarse centroids -> probe -> within-cell brute force) as
the scale path.

All vector math stays JVM-side: zip_with/aggregate fold over array<double>
(deterministic left-to-right order). Similarities are rounded to 4 decimals
BEFORE ranking so top-k membership is identical across engines (float noise
~1e-6 << 5e-5 rounding margin; ties break on vec_id). Centroid coordinates
are rounded to 6 decimals to absorb summation-order noise in the mean.

Scale notes: brute force is O(Q x N) — fine for a re-rank stage, not a
scan; the IVF variant prunes to nprobe/K of the corpus per query and is the
shape that survives 100 TB (centroids broadcast; per-cell partitions).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from .common import t

TOP_K = 10
N_PROBE = 3
QUERY_STRIDE = 100  # vec_id % 100 == 0 -> query set


def _dbl(col) -> F.Column:
    return F.transform(col, lambda x: x.cast("double"))


def _dot(a, b) -> F.Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v)


def _cos_rounded(a, b) -> F.Column:
    da, db = _dbl(a), _dbl(b)
    return F.round(
        _dot(da, db) / (F.sqrt(_dot(da, da)) * F.sqrt(_dot(db, db))), 4
    )


def sim_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-10: every stride-100 vector as a query against
    the full corpus (excluding itself). Query side is broadcast; the corpus
    scan computes Q similarities per row with no shuffle until the
    per-query top-k window."""
    emb = t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % QUERY_STRIDE == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    scored = (
        F.broadcast(queries)
        .join(emb, F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            "label",
            _cos_rounded(F.col("q_emb"), F.col("embedding")).alias("cos_sim"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "rank", "vec_id", "label", "cos_sim")
    )


ORACLE_TOPK_BRUTEFORCE = f"""
WITH queries AS (
  SELECT vec_id AS query_id, embedding AS q_emb FROM embeddings
  WHERE vec_id % {QUERY_STRIDE} = 0
), scored AS (
  SELECT q.query_id, e.vec_id, e.label,
         round(CAST(list_cosine_similarity(CAST(q.q_emb AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])) AS DOUBLE), 4) AS cos_sim
  FROM queries q JOIN embeddings e ON e.vec_id <> q.query_id
)
SELECT query_id, CAST(rank AS INT) AS rank, vec_id, label, cos_sim
FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY cos_sim DESC, vec_id) AS rank
  FROM scored
) WHERE rank <= {TOP_K}
"""


def _centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label mean embedding with coordinates rounded to 6 decimals
    (absorbs cross-engine summation-order noise in the mean)."""
    emb = t(spark, sf_dir, "embeddings")
    exploded = emb.select(
        "label", F.posexplode(_dbl(F.col("embedding"))).alias("pos", "v")
    )
    return (
        exploded.groupBy("label", "pos")
        .agg(F.round(F.avg("v"), 6).alias("c"))
        .groupBy("label")
        .agg(F.array_sort(F.collect_list(F.struct("pos", "c"))).alias("pc"))
        .select(
            F.col("label").alias("cent_label"),
            F.transform(F.col("pc"), lambda s: s.getField("c")).alias("centroid"),
        )
    )


def sim_topk_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style ANN: coarse quantizer = per-label centroids; each query
    probes its N_PROBE nearest centroids and brute-forces only those cells.
    Returns the per-query top-10 within probed cells (recall vs the exact
    baseline is measured in tests; on this near-random synthetic corpus the
    label cells are weak quantizers, so recall ~ a bit above nprobe/K —
    real clustered embeddings or k-means cells would do far better)."""
    emb = t(spark, sf_dir, "embeddings")
    cents = _centroids(spark, sf_dir)
    queries = emb.filter(F.col("vec_id") % QUERY_STRIDE == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    q_cent = (
        F.broadcast(queries)
        .join(F.broadcast(cents))
        .select(
            "query_id",
            "q_emb",
            "cent_label",
            _cos_rounded(F.col("q_emb"), F.col("centroid")).alias("cent_sim"),
        )
    )
    probe_w = W.partitionBy("query_id").orderBy(F.desc("cent_sim"), F.asc("cent_label"))
    probes = (
        q_cent.withColumn("prk", F.row_number().over(probe_w))
        .filter(F.col("prk") <= N_PROBE)
        .select("query_id", "q_emb", F.col("cent_label").alias("label"))
    )
    scored = F.broadcast(probes).join(emb, ["label"]).filter(
        F.col("vec_id") != F.col("query_id")
    ).select(
        "query_id",
        "vec_id",
        "label",
        _cos_rounded(F.col("q_emb"), F.col("embedding")).alias("cos_sim"),
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "rank", "vec_id", "label", "cos_sim")
    )


ORACLE_TOPK_IVF = f"""
WITH emb_d AS (
  SELECT vec_id, label, embedding,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
  FROM embeddings
), exploded AS (
  SELECT label, u.i AS pos, emb[u.i + 1] AS v
  FROM emb_d, unnest(range(0, len(emb))) AS u(i)
), cent AS (
  SELECT label AS cent_label, pos, round(AVG(v), 6) AS c
  FROM exploded GROUP BY 1, 2
), centroids AS (
  SELECT cent_label, list(c ORDER BY pos) AS centroid FROM cent GROUP BY 1
), queries AS (
  SELECT vec_id AS query_id, embedding AS q_emb FROM embeddings
  WHERE vec_id % {QUERY_STRIDE} = 0
), q_cent AS (
  SELECT q.query_id, q.q_emb, c.cent_label,
         round(CAST(list_cosine_similarity(CAST(q.q_emb AS DOUBLE[]), CAST(c.centroid AS DOUBLE[])) AS DOUBLE), 4) AS cent_sim
  FROM queries q CROSS JOIN centroids c
), probes AS (
  SELECT query_id, q_emb, cent_label AS label FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id
                                 ORDER BY cent_sim DESC, cent_label) AS prk
    FROM q_cent
  ) WHERE prk <= {N_PROBE}
), scored AS (
  SELECT p.query_id, e.vec_id, e.label,
         round(CAST(list_cosine_similarity(CAST(p.q_emb AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])) AS DOUBLE), 4) AS cos_sim
  FROM probes p JOIN embeddings e USING (label)
  WHERE e.vec_id <> p.query_id
)
SELECT query_id, CAST(rank AS INT) AS rank, vec_id, label, cos_sim
FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY cos_sim DESC, vec_id) AS rank
  FROM scored
) WHERE rank <= {TOP_K}
"""


QUERIES: dict[str, tuple] = {
    "sim_topk_bruteforce": (sim_topk_bruteforce, ORACLE_TOPK_BRUTEFORCE),
    "sim_topk_ivf": (sim_topk_ivf, ORACLE_TOPK_IVF),
}
