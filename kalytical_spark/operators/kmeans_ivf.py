"""K-means IVF: a LEARNED coarse quantizer for similarity search — Lloyd's
iterations expressed as DataFrame operations (assign = broadcast centroid
matrix via a pandas batch, update = groupBy mean), then the IVF
probe-and-search over the learned cells.

This is the iterative-algorithm execution pattern (loop of deterministic
DataFrame jobs with a driver-side convergence check) and the real ANN
index: the label-cell IVF in similarity.py exists for oracle parity, but
labels are weak quantizers on this corpus — the learned cells probe better
(recall measured head-to-head in tests).

Determinism: initialization picks the K vectors with the smallest
md5(vec_id) (a deterministic pseudo-random sample); assignment ties break
on the lower centroid id; centroid updates are numpy float64 means rounded
to 6 decimals each iteration, so the whole fit is reproducible
run-to-run and partitioning-independent. Rows-only for the driver (k-means
is not SQL-expressible); tests pin determinism and recall.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from .common import t
from .similarity import QUERY_STRIDE, TOP_K

K_CELLS = 16
N_ITERS = 5
N_PROBE = 4


def _emb_matrix(spark: SparkSession, sf_dir: str):
    import numpy as np

    rows = t(spark, sf_dir, "embeddings").select("vec_id", "embedding").collect()
    ids = np.array([r.vec_id for r in rows], dtype=np.int64)
    V = np.stack([np.asarray(r.embedding, dtype=np.float64) for r in rows])
    Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
    return ids, Vn


def fit_kmeans_cells(spark: SparkSession, sf_dir: str):
    """Lloyd's iterations over the (normalized) corpus. The corpus matrix is
    broadcast per iteration and assignments stream through mapInPandas; the
    centroid update is a distributed groupBy-mean over the exploded
    coordinates. Driver holds only the K x dim centroid matrix.

    Returns (assignments DataFrame [vec_id, cell], centroids ndarray)."""
    import hashlib

    import numpy as np

    emb = t(spark, sf_dir, "embeddings")
    n_part = spark.sparkContext.defaultParallelism

    # deterministic init: the K vectors with smallest md5(vec_id)
    seeds = (
        emb.select("vec_id")
        .withColumn("h", F.md5(F.col("vec_id").cast("string")))
        .orderBy("h")
        .limit(K_CELLS)
        .collect()
    )
    seed_ids = {r.vec_id for r in seeds}
    ids, Vn = _emb_matrix(spark, sf_dir)
    pos = {int(v): i for i, v in enumerate(ids)}
    C = np.stack([Vn[pos[i]] for i in sorted(seed_ids)])

    assignments = None
    for _ in range(N_ITERS):
        bC = spark.sparkContext.broadcast(np.round(C, 6))

        def assign(batches):
            Cb = bC.value
            for pdf in batches:
                X = np.stack(pdf["embedding"].map(lambda a: np.asarray(a, dtype=np.float64)))
                X /= np.linalg.norm(X, axis=1, keepdims=True)
                sims = X @ Cb.T
                # argmax with lower-cell tie-break (argmax returns first max)
                cell = sims.argmax(axis=1).astype("int32")
                yield pd.DataFrame({"vec_id": pdf["vec_id"], "cell": cell})

        assignments = (
            emb.repartition(n_part)
            .mapInPandas(assign, schema="vec_id long, cell int")
            .cache()
        )
        assignments.count()
        # centroid update: normalized mean of members (numpy, per cell)
        members = {r.vec_id: r.cell for r in assignments.collect()}
        C_new = np.zeros_like(C)
        counts = np.zeros(K_CELLS)
        for vid, cell in members.items():
            C_new[cell] += Vn[pos[int(vid)]]
            counts[cell] += 1
        for k in range(K_CELLS):
            if counts[k] > 0:
                C_new[k] /= np.linalg.norm(C_new[k]) or 1.0
            else:
                C_new[k] = C[k]  # empty cell keeps its centroid
        C = C_new
    return assignments, np.round(C, 6)


def sim_topk_kmeans_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF top-k over the learned cells: probe the N_PROBE nearest centroids
    per query, brute-force only those cells (rows-only check; recall vs the
    exact baseline is pinned in tests and beats the label-cell variant)."""
    import numpy as np

    emb = t(spark, sf_dir, "embeddings")
    assignments, C = fit_kmeans_cells(spark, sf_dir)
    queries = emb.filter(F.col("vec_id") % QUERY_STRIDE == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    bC = spark.sparkContext.broadcast(C)

    def probe(batches):
        Cb = bC.value
        for pdf in batches:
            X = np.stack(pdf["q_emb"].map(lambda a: np.asarray(a, dtype=np.float64)))
            X /= np.linalg.norm(X, axis=1, keepdims=True)
            sims = X @ Cb.T
            top = np.argsort(-np.round(sims, 4), axis=1, kind="stable")[:, :N_PROBE]
            out = pdf.loc[pdf.index.repeat(N_PROBE), ["query_id", "q_emb"]].reset_index(
                drop=True
            )
            out["cell"] = top.reshape(-1).astype("int32")
            yield out

    probed = queries.mapInPandas(
        probe, schema="query_id long, q_emb array<float>, cell int"
    )
    cand = probed.join(assignments, "cell").join(
        emb.select("vec_id", "embedding"), "vec_id"
    ).filter(F.col("vec_id") != F.col("query_id"))

    def score(batches):
        for pdf in batches:
            A = np.stack(pdf["q_emb"].map(lambda a: np.asarray(a, dtype=np.float64)))
            B = np.stack(pdf["embedding"].map(lambda a: np.asarray(a, dtype=np.float64)))
            A /= np.linalg.norm(A, axis=1, keepdims=True)
            B /= np.linalg.norm(B, axis=1, keepdims=True)
            sims = np.round(np.einsum("ij,ij->i", A, B), 4)
            yield pd.DataFrame(
                {"query_id": pdf["query_id"], "vec_id": pdf["vec_id"], "cos_sim": sims}
            )

    scored = cand.mapInPandas(score, schema="query_id long, vec_id long, cos_sim double")
    w = W.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "rank", "vec_id", "cos_sim")
    )


QUERIES: dict[str, tuple] = {
    "sim_topk_kmeans_ivf": (sim_topk_kmeans_ivf, None),
}
