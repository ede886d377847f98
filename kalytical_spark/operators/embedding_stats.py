"""Embedding aggregation statistics: per-label centroids via the
posexplode + groupBy(label, pos) pattern, and per-label coherence via the
gram identity — the O(N) rewrite of the O(N^2) mean-pairwise-similarity.

Why these two shapes matter at 100 TB:
* The centroid update is THE distributed pattern for embedding
  aggregation (the same one the k-means trainer uses,
  kmeans_ivf.py): explode components, hash-aggregate on (cell/label,
  position), never collect a vector matrix anywhere. Output is
  |labels| x dim rows — independent of corpus size.
* Mean pairwise dot product NEVER needs the pair join:
  sum_{i<j} q_i . q_j = (||sum_i q_i||^2 - sum_i ||q_i||^2) / 2 — two
  linear passes and an identity, instead of an N^2 self-join. At 1000
  executors this is the difference between a broadcast-scale rollup and
  an impossible shuffle.

Determinism: float components are quantized to exact integer micro-units
(floor(val * 1e6) — float->double is exact, the product and floor are
identical IEEE ops in both engines), so every aggregate here is exact
integer arithmetic; the final means are single double divisions. No
float summation order anywhere (common.py conventions).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .common import t

_U = 1_000_000  # micro-unit quantization scale


def _quantized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, label, pos, q): integer micro-unit components."""
    emb = t(spark, sf_dir, "embeddings")
    return emb.select(
        "vec_id",
        "label",
        F.posexplode("embedding").alias("pos", "val"),
    ).select(
        "vec_id",
        "label",
        "pos",
        F.floor(F.col("val").cast("double") * _U).cast("bigint").alias("q"),
    )


# DuckDB twin of _quantized: parallel unnests in the SELECT list zip
# together, giving (component, 0-based position) pairs.
_SQL_QUANTIZED = f"""
  SELECT vec_id, label,
         unnest(generate_series(1, len(embedding))) - 1 AS pos,
         CAST(floor(CAST(unnest(embedding) AS DOUBLE) * {_U}) AS BIGINT) AS q
  FROM embeddings
"""


def emb_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid, component-wise: exact integer sums over the
    exploded components, surfaced with the single-division mean. One hash
    aggregate after a partition-local explode — no shuffle of vectors,
    no driver materialization, |labels| x dim output rows."""
    q = _quantized(spark, sf_dir)
    return q.groupBy("label", "pos").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("q").cast("bigint").alias("sum_q"),
        (
            F.sum("q").cast("double")
            / (F.count("*") * F.lit(_U)).cast("double")
        ).alias("centroid"),
    )


ORACLE_CENTROIDS = f"""
SELECT label, pos,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(q) AS BIGINT) AS sum_q,
       CAST(SUM(q) AS DOUBLE) / CAST(COUNT(*) * {_U} AS DOUBLE) AS centroid
FROM ({_SQL_QUANTIZED})
GROUP BY 1, 2
"""


def emb_label_coherence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label mean pairwise dot product WITHOUT the pair join:
    (||sum of vectors||^2 - sum of squared norms) / 2 over the quantized
    integers — exact, linear, shuffle-light. Also surfaces the mean
    squared norm so the coherence is interpretable as near-cosine (the
    synthetic embeddings are near unit norm)."""
    q = _quantized(spark, sf_dir)
    # per (label, pos): component sum  ->  per label: ||S||^2
    comp = q.groupBy("label", "pos").agg(F.sum("q").alias("s"))
    s2 = comp.groupBy("label").agg(
        F.sum(F.col("s") * F.col("s")).cast("bigint").alias("sum_s2")
    )
    # per vec: squared norm  ->  per label: count + sum of squared norms
    norms = q.groupBy("label", "vec_id").agg(
        F.sum(F.col("q") * F.col("q")).alias("norm2")
    )
    per_label = norms.groupBy("label").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("norm2").cast("bigint").alias("sum_norm2"),
    )
    u2 = float(_U) * float(_U)
    # (||S||^2 - sum ||v||^2) is even by the identity; integer `div` keeps
    # the halving exact where a float `/ 2` would round past 2^53
    pair = F.expr("(sum_s2 - sum_norm2) div 2")
    return (
        per_label.join(s2, "label")
        .filter(F.col("n") > 1)
        .select(
            "label",
            "n",
            pair.cast("bigint").alias("pair_dot_sum"),
            (
                pair.cast("double")
                / ((F.col("n") * (F.col("n") - 1) / 2).cast("double") * F.lit(u2))
            ).alias("mean_pair_dot"),
            (
                F.col("sum_norm2").cast("double")
                / (F.col("n").cast("double") * F.lit(u2))
            ).alias("mean_norm2"),
        )
    )


ORACLE_COHERENCE = f"""
WITH q AS ({_SQL_QUANTIZED}),
comp AS (
  SELECT label, pos, SUM(q) AS s FROM q GROUP BY 1, 2
), s2 AS (
  SELECT label, CAST(SUM(s * s) AS BIGINT) AS sum_s2 FROM comp GROUP BY 1
), norms AS (
  SELECT label, vec_id, SUM(q * q) AS norm2 FROM q GROUP BY 1, 2
), per_label AS (
  SELECT label, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(norm2) AS BIGINT) AS sum_norm2
  FROM norms GROUP BY 1
)
SELECT p.label, p.n,
       CAST((s2.sum_s2 - p.sum_norm2) // 2 AS BIGINT) AS pair_dot_sum,
       CAST((s2.sum_s2 - p.sum_norm2) // 2 AS DOUBLE)
         / (CAST(p.n * (p.n - 1) / 2 AS DOUBLE) * {_U}.0 * {_U}.0)
         AS mean_pair_dot,
       CAST(p.sum_norm2 AS DOUBLE)
         / (CAST(p.n AS DOUBLE) * {_U}.0 * {_U}.0) AS mean_norm2
FROM per_label p JOIN s2 USING (label)
WHERE p.n > 1
"""


_JL_K = 16  # projected dimensionality (64 -> 16: 4x fewer FLOPs downstream)
_JL_SAMPLE = 16  # quality-report sample: vec_id < 16 -> 120 pairs

# deterministic +-1 sign per (input pos, output dim) from md5 — the random
# projection matrix both engines regenerate bit-identically (first hex
# nibble < '8' -> +1; lowercase hex and ASCII compare in both engines)
_JL_SIGN_SQL = (
    "CASE WHEN substring(md5(concat('jl', CAST(pos AS STRING), ':', "
    "CAST(j AS STRING))), 1, 1) < '8' THEN 1 ELSE -1 END"
)


def emb_jl_projection_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Johnson-Lindenstrauss random projection (+-1 signs) of the
    quantized embeddings from 64 to _JL_K dims, with the distance-
    preservation report on a bounded pair sample: for +-1 sign matrices
    E[||Px - Py||^2] = k * ||x - y||^2, so ratio_milli =
    1000 * proj_d2 / (k * orig_d2) concentrates around 1000.

    Scale: the projection is a partition-local explode (dim x k rows per
    vector) into one map-side-combinable hash aggregate — linear, no
    shuffle of vectors, and the ANN that consumes it runs in k dims. The
    pairwise report is the quality anchor on a FIXED sample (pairs of the
    _JL_SAMPLE lowest vec_ids), not the scale path. All integer: the
    quantized components, signs, projections, and both squared distances
    are exact, so the twin recomputes the whole chain value-exactly."""
    q = _quantized(spark, sf_dir).filter(F.col("vec_id") < _JL_SAMPLE)
    proj = (
        q.select(
            "vec_id",
            "pos",
            "q",
            F.explode(F.sequence(F.lit(0), F.lit(_JL_K - 1))).alias("j"),
        )
        .selectExpr("vec_id", "j", f"q * ({_JL_SIGN_SQL}) AS sq")
        .groupBy("vec_id", "j")
        .agg(F.sum("sq").cast("bigint").alias("p"))
    )

    def _d2(frame: DataFrame, comp: str, val: str) -> DataFrame:
        a = frame.select(
            F.col("vec_id").alias("vec_a"), F.col(comp).alias("c"), F.col(val).alias("va")
        )
        b = frame.select(
            F.col("vec_id").alias("vec_b"), F.col(comp).alias("c"), F.col(val).alias("vb")
        )
        return (
            a.join(b, "c")
            .filter(F.col("vec_a") < F.col("vec_b"))
            .groupBy("vec_a", "vec_b")
            .agg(
                F.sum((F.col("va") - F.col("vb")) * (F.col("va") - F.col("vb")))
                .cast("bigint")
                .alias("d2")
            )
        )

    orig = _d2(q, "pos", "q").withColumnRenamed("d2", "orig_d2")
    pd2 = _d2(proj, "j", "p").withColumnRenamed("d2", "proj_d2")
    return (
        orig.join(pd2, ["vec_a", "vec_b"])
        .select(
            "vec_a",
            "vec_b",
            "orig_d2",
            "proj_d2",
            F.expr(f"(1000 * proj_d2) div ({_JL_K} * orig_d2)")
            .cast("bigint")
            .alias("ratio_milli"),
        )
    )


ORACLE_JL = f"""
WITH q AS (
  SELECT * FROM ({_SQL_QUANTIZED}) WHERE vec_id < {_JL_SAMPLE}
), proj AS (
  SELECT vec_id, j, CAST(SUM(q * ({_JL_SIGN_SQL})) AS BIGINT) AS p
  FROM q CROSS JOIN (SELECT unnest(generate_series(0, {_JL_K - 1})) AS j)
  GROUP BY 1, 2
), orig AS (
  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
         CAST(SUM((a.q - b.q) * (a.q - b.q)) AS BIGINT) AS orig_d2
  FROM q a JOIN q b ON a.pos = b.pos AND a.vec_id < b.vec_id
  GROUP BY 1, 2
), pd2 AS (
  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
         CAST(SUM((a.p - b.p) * (a.p - b.p)) AS BIGINT) AS proj_d2
  FROM proj a JOIN proj b ON a.j = b.j AND a.vec_id < b.vec_id
  GROUP BY 1, 2
)
SELECT o.vec_a, o.vec_b, o.orig_d2, p.proj_d2,
       CAST((1000 * p.proj_d2) // ({_JL_K} * o.orig_d2) AS BIGINT)
         AS ratio_milli
FROM orig o JOIN pd2 p ON o.vec_a = p.vec_a AND o.vec_b = p.vec_b
"""


QUERIES: dict[str, tuple] = {
    "emb_label_centroids": (emb_label_centroids, ORACLE_CENTROIDS),
    "emb_label_coherence": (emb_label_coherence, ORACLE_COHERENCE),
    "emb_jl_projection_quality": (emb_jl_projection_quality, ORACLE_JL),
}


def emb_centroid_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-drift screen: per-label L1 distance between the
    centroids of two deterministic cohorts (vec_id parity — the batch
    stand-in for "previous snapshot vs fresh crawl"; production swaps in
    a snapshot column, same plan). Exact arithmetic: component means are
    rationals with per-label constant denominators, so the L1 sum
    cross-multiplies to one bigint numerator per label:
    sum_pos |sa*nb - sb*na|, and drift = num / (na*nb) is a single
    double division per label. Magnitudes: |q| <= 1e6 micro-units,
    sa*nb <= na*nb*1e6 — bigint-safe through millions of vectors per
    label.

    Scale: one groupBy over the exploded components (map-side
    combinable), a |labels|-sized join, no windows, nothing collected.
    Also reports the component with the largest drift (min pos on
    ties)."""
    q = _quantized(spark, sf_dir).withColumn("par", F.col("vec_id") % 2)
    sums = q.groupBy("label", "pos").agg(
        F.sum(F.when(F.col("par") == 0, F.col("q")).otherwise(0)).alias("sa"),
        F.sum(F.when(F.col("par") == 1, F.col("q")).otherwise(0)).alias("sb"),
    )
    counts = (
        q.select("label", "vec_id", "par")
        .distinct()
        .groupBy("label")
        .agg(
            F.sum(F.when(F.col("par") == 0, 1).otherwise(0))
            .cast("bigint")
            .alias("na"),
            F.sum(F.when(F.col("par") == 1, 1).otherwise(0))
            .cast("bigint")
            .alias("nb"),
        )
    )
    per_pos = sums.join(F.broadcast(counts), "label").select(
        "label",
        "pos",
        "na",
        "nb",
        F.abs(F.col("sa") * F.col("nb") - F.col("sb") * F.col("na")).alias("dev"),
    )
    return per_pos.groupBy("label").agg(
        F.min("na").alias("na"),
        F.min("nb").alias("nb"),
        F.sum("dev").cast("bigint").alias("l1_num"),
        # composite numeric argmax key: dev*1024 - pos ranks by dev with
        # a smallest-pos tiebreak (pos < 1024 << the 1024 stride)
        F.max_by(F.col("pos"), F.col("dev") * 1024 - F.col("pos"))
        .cast("bigint")
        .alias("worst_pos"),
        (
            F.sum("dev").cast("double")
            / (F.min("na") * F.min("nb")).cast("double")
        ).alias("drift_l1_micro"),
    )


ORACLE_CENTROID_DRIFT = f"""
WITH q AS ({_SQL_QUANTIZED}),
par AS (SELECT vec_id, label, pos, q, vec_id % 2 AS par FROM q),
sums AS (
  SELECT label, pos,
         SUM(CASE WHEN par = 0 THEN q ELSE 0 END) AS sa,
         SUM(CASE WHEN par = 1 THEN q ELSE 0 END) AS sb
  FROM par GROUP BY 1, 2
),
counts AS (
  SELECT label,
         CAST(COUNT(DISTINCT CASE WHEN par = 0 THEN vec_id END) AS BIGINT) AS na,
         CAST(COUNT(DISTINCT CASE WHEN par = 1 THEN vec_id END) AS BIGINT) AS nb
  FROM par GROUP BY 1
),
per_pos AS (
  SELECT s.label, s.pos, c.na, c.nb,
         CAST(ABS(s.sa * c.nb - s.sb * c.na) AS BIGINT) AS dev
  FROM sums s JOIN counts c USING (label)
)
SELECT label,
       MIN(na) AS na, MIN(nb) AS nb,
       CAST(SUM(dev) AS BIGINT) AS l1_num,
       CAST(arg_max(pos, dev * 1024 - pos) AS BIGINT) AS worst_pos,
       CAST(SUM(dev) AS DOUBLE) / CAST(MIN(na) * MIN(nb) AS DOUBLE)
         AS drift_l1_micro
FROM per_pos
GROUP BY label
"""


QUERIES.update(
    {
        "emb_centroid_drift": (emb_centroid_drift, ORACLE_CENTROID_DRIFT),
    }
)
