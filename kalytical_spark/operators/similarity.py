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


N_HYPERPLANES = 12
LSH_PAIR_THRESHOLD = 0.4
# above this corpus size the normalized index no longer broadcasts; the
# verification falls back to the distributed join path
SIM_INDEX_MAX_ROWS = 2_000_000


def _hyperplanes(dim: int):
    """Deterministic pseudo-random hyperplanes: coordinates derive from md5
    of (plane, dim) so every run/engine/partition sees identical planes."""
    import hashlib

    import numpy as np

    H = np.empty((N_HYPERPLANES, dim), dtype=np.float64)
    for p in range(N_HYPERPLANES):
        for d in range(dim):
            h = hashlib.md5(f"hp{p}:{d}".encode()).digest()
            H[p, d] = int.from_bytes(h[:8], "big") / float(1 << 64) - 0.5
    return H


def sim_lsh_hyperplane_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Label-free near-dup mining via random-hyperplane (sign) LSH: each
    vector hashes to an N_HYPERPLANES-bit sketch (numpy matmul per Arrow
    batch); vectors sharing a band of sign bits become candidates; exact
    cosine verifies. The fully self-contained ANN path when no coarse
    labels/centroids exist — candidates scale with bucket collisions, never
    all pairs."""
    import pandas as pd

    emb = t(spark, sf_dir, "embeddings")
    n_part = spark.sparkContext.defaultParallelism

    def sketch(batches):
        import numpy as np

        H = None
        for pdf in batches:
            V = np.stack(pdf["embedding"].map(lambda a: np.asarray(a, dtype=np.float64)))
            if H is None:
                H = _hyperplanes(V.shape[1])
            bits = (V @ H.T) > 0  # (n, planes)
            weights = 1 << np.arange(N_HYPERPLANES, dtype=np.int64)
            codes = (bits * weights).sum(axis=1).astype("int64")
            yield pd.DataFrame(
                {"vec_id": pdf["vec_id"], "label": pdf["label"], "code": codes}
            )

    sketched = (
        emb.repartition(n_part)
        .mapInPandas(sketch, schema="vec_id long, label int, code long")
        .cache()
    )
    sketched.count()
    # 4 bands of 3 bits: on weakly-separated (near-random) vectors, band
    # match probability at cos 0.4 is ~(0.63)^3 per band -> ~0.68 recall
    # over 4 bands, while still pruning a good share of random pairs; tighter
    # corpora (real near-dups at cos 0.8+) prune far harder with wider bands
    bands = sketched.select(
        "vec_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band_idx"),
                        F.shiftrightunsigned(F.col("code"), 3 * i)
                        .bitwiseAND(F.lit(7))
                        .alias("band_key"),
                    )
                    for i in range(4)
                ]
            )
        ).alias("b"),
    ).select("vec_id", "b.band_idx", "b.band_key")
    l, r = bands.alias("l"), bands.alias("r")
    cand = (
        l.join(
            r,
            (F.col("l.band_idx") == F.col("r.band_idx"))
            & (F.col("l.band_key") == F.col("r.band_key"))
            & (F.col("l.vec_id") < F.col("r.vec_id")),
        )
        .select(F.col("l.vec_id").alias("vec_a"), F.col("r.vec_id").alias("vec_b"))
        .distinct()
    )
    # Verification: broadcast-index when the corpus fits (only id PAIRS move
    # through the shuffle; each task verifies its batch with one einsum);
    # beyond the broadcast budget, fall back to the distributed path — join
    # the two embedding sides onto the candidates and verify per Arrow batch.
    import numpy as np

    if emb.count() > SIM_INDEX_MAX_ROWS:
        ea = emb.select(F.col("vec_id").alias("vec_a"), F.col("embedding").alias("emb_a"))
        eb = emb.select(F.col("vec_id").alias("vec_b"), F.col("embedding").alias("emb_b"))
        with_vecs = cand.join(ea, "vec_a").join(eb, "vec_b")

        def verify_joined(batches):
            import pandas as pd

            for pdf in batches:
                if not len(pdf):
                    continue
                A = np.stack(pdf["emb_a"].map(lambda a: np.asarray(a, dtype=np.float64)))
                B = np.stack(pdf["emb_b"].map(lambda a: np.asarray(a, dtype=np.float64)))
                A /= np.linalg.norm(A, axis=1, keepdims=True)
                B /= np.linalg.norm(B, axis=1, keepdims=True)
                sims = np.round(np.einsum("ij,ij->i", A, B), 4)
                keep = sims >= LSH_PAIR_THRESHOLD
                out = pdf.loc[keep, ["vec_a", "vec_b"]].copy()
                out["cos_sim"] = sims[keep]
                yield out

        return with_vecs.mapInPandas(
            verify_joined, schema="vec_a long, vec_b long, cos_sim double"
        )

    rows = emb.select("vec_id", "embedding").collect()
    ids = np.array([r.vec_id for r in rows], dtype=np.int64)
    V = np.stack([np.asarray(r.embedding, dtype=np.float64) for r in rows])
    V /= np.linalg.norm(V, axis=1, keepdims=True)
    index = {"pos": {int(v): i for i, v in enumerate(ids)}, "V": V}
    bindex = spark.sparkContext.broadcast(index)

    def verify(batches):
        idx = bindex.value
        pos, Vn = idx["pos"], idx["V"]
        for pdf in batches:
            if not len(pdf):
                continue
            a = np.array([pos[int(v)] for v in pdf["vec_a"]])
            b = np.array([pos[int(v)] for v in pdf["vec_b"]])
            sims = np.round(np.einsum("ij,ij->i", Vn[a], Vn[b]), 4)
            keep = sims >= LSH_PAIR_THRESHOLD
            out = pdf.loc[keep, ["vec_a", "vec_b"]].copy()
            out["cos_sim"] = sims[keep]
            yield out

    return cand.mapInPandas(verify, schema="vec_a long, vec_b long, cos_sim double")


QUERIES: dict[str, tuple] = {
    "sim_topk_bruteforce": (sim_topk_bruteforce, ORACLE_TOPK_BRUTEFORCE),
    "sim_topk_ivf": (sim_topk_ivf, ORACLE_TOPK_IVF),
    "sim_lsh_hyperplane_pairs": (sim_lsh_hyperplane_pairs, None),
}
