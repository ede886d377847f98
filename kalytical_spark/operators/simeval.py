"""ANN quality evaluation built into the engine: recall@k of the IVF
probe path against the exact brute-force top-k, as a first-class query.

A similarity engine that cannot measure its own index quality invites
silent regressions — probe counts, quantizer changes, and data drift all
move recall, and at 100 TB nobody re-runs a notebook to notice. This
report composes the two existing methods (similarity.py) and emits
per-query hit counts plus integer-milli recall, so the eval is exactly as
reproducible as the methods themselves (both are oracle-proven; ties at
the k-th rank break on vec_id in both engines, so the hit sets are
deterministic).

Scale: the report joins two k-row-per-query frames — cost is the two
methods themselves; the comparison adds one co-partitioned join on
(query_id, vec_id) and a per-query rollup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .similarity import (
    ORACLE_TOPK_BRUTEFORCE,
    ORACLE_TOPK_IVF,
    exact_topk_memo,
    sim_topk_ivf,
)


def sim_ivf_recall_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per query: exact top-k size, how many of those the IVF probe path
    recovered, and recall in exact milli-units (1000 * hits // k)."""
    exact = exact_topk_memo(spark, sf_dir).select("query_id", "vec_id")
    approx = (
        sim_topk_ivf(spark, sf_dir)
        .select("query_id", "vec_id")
        .withColumn("hit", F.lit(1))
    )
    return (
        exact.join(approx, ["query_id", "vec_id"], "left")
        .groupBy("query_id")
        .agg(
            F.count("*").cast("int").alias("k_exact"),
            F.sum(F.coalesce("hit", F.lit(0))).cast("int").alias("n_hit"),
        )
        .withColumn(
            "recall_milli",
            F.expr("CAST(1000 * n_hit div k_exact AS INT)"),
        )
    )


ORACLE_RECALL = f"""
WITH exact_tk AS (
  SELECT query_id, vec_id FROM ({ORACLE_TOPK_BRUTEFORCE})
), approx_tk AS (
  SELECT query_id, vec_id FROM ({ORACLE_TOPK_IVF})
)
SELECT e.query_id,
       CAST(COUNT(*) AS INTEGER) AS k_exact,
       CAST(COUNT(a.vec_id) AS INTEGER) AS n_hit,
       CAST(1000 * COUNT(a.vec_id) // COUNT(*) AS INTEGER) AS recall_milli
FROM exact_tk e
LEFT JOIN approx_tk a ON a.query_id = e.query_id AND a.vec_id = e.vec_id
GROUP BY 1
"""


def dedup_lsh_recall_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall of the banded MinHash-LSH miner against the exhaustive
    shared-shingle ground truth at the verify threshold — the exact
    measurement the documented-quadratic ngram-Jaccard baseline exists to
    enable (dedup.py: 'correctness anchor for LSH'). One summary row:
    ground-truth pair count, LSH-found count, hits, and milli recall.
    Precision is 1000 by construction (every LSH pair is exact-verified),
    so recall is the only free variable."""
    from .dedup import (
        LSH_VERIFY_THRESHOLD,
        dedup_minhash_lsh,
        dedup_ngram_jaccard,
    )

    truth = (
        dedup_ngram_jaccard(spark, sf_dir)
        .filter(F.col("jaccard") >= LSH_VERIFY_THRESHOLD)
        .select("doc_a", "doc_b")
    )
    found = (
        dedup_minhash_lsh(spark, sf_dir)
        .select("doc_a", "doc_b")
        .withColumn("hit", F.lit(1))
    )
    return (
        truth.join(found, ["doc_a", "doc_b"], "left")
        .agg(
            F.count("*").cast("bigint").alias("n_truth"),
            F.sum(F.coalesce("hit", F.lit(0))).cast("bigint").alias("n_hit"),
        )
        .withColumn(
            "recall_milli", F.expr("CAST(1000 * n_hit div n_truth AS INT)")
        )
    )


def _oracle_lsh_recall() -> str:
    from .dedup import (
        LSH_VERIFY_THRESHOLD,
        _sql_minhash_lsh_ctes,
        _SQL_SHINGLES,
    )

    return f"""
WITH {_sql_minhash_lsh_ctes()},
truth AS (
  SELECT i.doc_a, i.doc_b
  FROM (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(COUNT(*) AS BIGINT) AS n_inter
    FROM ({_SQL_SHINGLES}) a JOIN ({_SQL_SHINGLES}) b
      ON a.shingle = b.shingle AND a.doc_id < b.doc_id
    GROUP BY 1, 2
  ) i
  JOIN (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_sh FROM ({_SQL_SHINGLES}) GROUP BY 1) sa
    ON i.doc_a = sa.doc_id
  JOIN (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_sh FROM ({_SQL_SHINGLES}) GROUP BY 1) sb
    ON i.doc_b = sb.doc_id
  WHERE CAST(i.n_inter AS DOUBLE) / CAST(sa.n_sh + sb.n_sh - i.n_inter AS DOUBLE)
        >= {LSH_VERIFY_THRESHOLD}
),
found AS (
  SELECT doc_a, doc_b FROM lsh_pairs WHERE jaccard >= {LSH_VERIFY_THRESHOLD}
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_truth,
       CAST(COUNT(f.doc_a) AS BIGINT) AS n_hit,
       CAST(1000 * COUNT(f.doc_a) // COUNT(*) AS INTEGER) AS recall_milli
FROM truth t
LEFT JOIN found f ON f.doc_a = t.doc_a AND f.doc_b = t.doc_b
"""


# Learned-index recall floors (integer milli-recall). The indexes are
# deterministic (fixed seeds, fixed iteration counts), so measured recall
# for a given dataset is a constant: kmeans-IVF is 520/660 milli at
# sf0.001/sf0.01, IVF-PQ 360/560 — floors sit safely below both while
# still catching a real regression (a broken quantizer collapses recall
# toward the 250-milli probe-share chance line).
KMEANS_IVF_RECALL_FLOOR_MILLI = 450
IVFPQ_RECALL_FLOOR_MILLI = 300


def _learned_recall_report(
    exact: DataFrame, approx: DataFrame, floor_milli: int
) -> DataFrame:
    """One summary row: exact-side sizes (oracle-recomputable) plus a
    boolean floor assertion on overall recall. The learned index itself is
    not SQL-expressible, but 'recall >= floor' is a value the driver can
    hash-check: the DuckDB twin recomputes n_queries/k_total from the
    exact top-k and emits TRUE — a recall regression flips the boolean
    and fails the gate (same bounded-oracle trick as events_approx_stats)."""
    # distinct: a duplicate (query_id, vec_id) in the approx top-k would
    # multiply exact rows through the left join and silently inflate both
    # k_total and n_hit (thus recall)
    hit = approx.select("query_id", "vec_id").distinct().withColumn("hit", F.lit(1))
    return (
        exact.select("query_id", "vec_id")
        .join(hit, ["query_id", "vec_id"], "left")
        .agg(
            F.count_distinct("query_id").cast("int").alias("n_queries"),
            F.count("*").cast("bigint").alias("k_total"),
            F.sum(F.coalesce("hit", F.lit(0))).alias("n_hit"),
        )
        .select(
            "n_queries",
            "k_total",
            F.lit(floor_milli).cast("int").alias("recall_floor_milli"),
            (
                F.expr("CAST(1000 * n_hit div k_total AS INT)")
                >= F.lit(floor_milli)
            ).alias("recall_ok"),
        )
    )


def sim_kmeans_ivf_recall_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@k of the learned-cell kmeans-IVF path vs the exact baseline,
    floor-asserted at KMEANS_IVF_RECALL_FLOOR_MILLI."""
    from .kmeans_ivf import sim_topk_kmeans_ivf

    return _learned_recall_report(
        exact_topk_memo(spark, sf_dir),
        sim_topk_kmeans_ivf(spark, sf_dir),
        KMEANS_IVF_RECALL_FLOOR_MILLI,
    )


def sim_ivfpq_recall_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@k of the IVF-PQ (ADC + exact re-rank) path vs the exact
    baseline, floor-asserted at IVFPQ_RECALL_FLOOR_MILLI."""
    from .pq import sim_topk_ivfpq

    return _learned_recall_report(
        exact_topk_memo(spark, sf_dir),
        sim_topk_ivfpq(spark, sf_dir),
        IVFPQ_RECALL_FLOOR_MILLI,
    )


def _oracle_learned_recall(floor_milli: int) -> str:
    return f"""
WITH exact_tk AS (
  SELECT query_id, vec_id FROM ({ORACLE_TOPK_BRUTEFORCE})
)
SELECT CAST(COUNT(DISTINCT query_id) AS INTEGER) AS n_queries,
       CAST(COUNT(*) AS BIGINT) AS k_total,
       CAST({floor_milli} AS INTEGER) AS recall_floor_milli,
       TRUE AS recall_ok
FROM exact_tk
"""


MRL_DIM = 16  # truncated prefix dimensions evaluated against the full 64


def emb_matryoshka_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka (MRL) truncation eval: recall@k of cosine ranking under
    the FIRST MRL_DIM embedding dimensions against the full-dimension
    exact top-k — the measurement that decides how far a
    Matryoshka-trained embedding can be truncated for cheap first-stage
    retrieval before the full-dim re-rank. Per query: exact k, hits
    recovered by the truncated ranking, integer-milli recall.

    Both legs are exhaustive and exact (cosine rounded to 4 dp before
    ranking, vec_id tie-break), so the report is value-provable; on this
    synthetic near-random corpus prefix dims carry ~uniform information,
    making the truncation penalty visible rather than vacuously ~1000.

    Scale: two broadcast-query corpus scans (the declared exhaustive
    baseline shape) + one co-partitioned join of k-row-per-query frames;
    the truncated leg reads 4x less vector data per row — exactly the
    economics the truncation buys at 100 TB."""
    from pyspark.sql import Window as W

    from .common import spread, t as _t
    from .similarity import QUERY_STRIDE, TOP_K, _cos_rounded

    embt = _t(spark, sf_dir, "embeddings")
    queries = embt.filter(F.col("vec_id") % QUERY_STRIDE == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    scored = (
        F.broadcast(queries)
        .join(spread(spark, embt), F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            _cos_rounded(
                F.slice(F.col("q_emb"), 1, MRL_DIM),
                F.slice(F.col("embedding"), 1, MRL_DIM),
            ).alias("cos_t"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos_t"), F.asc("vec_id"))
    trunc_tk = (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "vec_id")
        .withColumn("hit", F.lit(1))
    )
    exact = exact_topk_memo(spark, sf_dir).select("query_id", "vec_id")
    return (
        exact.join(trunc_tk, ["query_id", "vec_id"], "left")
        .groupBy("query_id")
        .agg(
            F.count("*").cast("int").alias("k_exact"),
            F.sum(F.coalesce("hit", F.lit(0))).cast("int").alias("n_hit"),
        )
        .select(
            "query_id",
            F.lit(MRL_DIM).cast("int").alias("mrl_dim"),
            "k_exact",
            "n_hit",
            F.expr("CAST(1000 * n_hit div k_exact AS INT)").alias("recall_milli"),
        )
    )


# integer micro-unit DCG position weights: round(1e6 / log2(p + 1)) for
# rank p, PRE-COMPUTED once in Python and embedded as literals in BOTH
# engines — log2 is transcendental, so evaluating it per-engine would put
# a last-ulp cross-engine diff inside the hash; a shared literal table
# keeps the whole metric exact bigint arithmetic.
def _dcg_weights(k: int) -> list[int]:
    import math

    return [round(1_000_000 / math.log2(p + 1)) for p in range(1, k + 1)]


def emb_matryoshka_ndcg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nDCG@k of the truncated-dim (MRL) ranking against the full-dim
    exact ranking — the position-weighted complement of
    emb_matryoshka_recall (recall treats rank 1 and rank k the same;
    nDCG answers whether truncation loses the TOP of the list or just
    the tail). Graded relevance = TOP_K + 1 - exact_rank (10..1), gain
    weights from the shared integer table, nDCG in exact micro-units
    (integer division), so the whole report is value-provable.

    Scale shape: identical to emb_matryoshka_recall (two broadcast-query
    scans + a k-row-per-query join); the metric adds only bounded
    arithmetic."""
    from pyspark.sql import Window as W

    from .common import spread, t as _t
    from .similarity import QUERY_STRIDE, TOP_K, _cos_rounded

    w_lit = "array({})".format(
        ", ".join(f"{w}L" for w in _dcg_weights(TOP_K))
    )

    embt = _t(spark, sf_dir, "embeddings")
    queries = embt.filter(F.col("vec_id") % QUERY_STRIDE == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    scored = (
        F.broadcast(queries)
        .join(spread(spark, embt), F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            _cos_rounded(
                F.slice(F.col("q_emb"), 1, MRL_DIM),
                F.slice(F.col("embedding"), 1, MRL_DIM),
            ).alias("cos_t"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos_t"), F.asc("vec_id"))
    trunc_tk = (
        scored.withColumn("p", F.row_number().over(w))
        .filter(F.col("p") <= TOP_K)
        .select("query_id", "vec_id", "p")
    )
    exact = exact_topk_memo(spark, sf_dir).select(
        "query_id",
        "vec_id",
        (F.lit(TOP_K + 1) - F.col("rank")).cast("bigint").alias("rel"),
        F.col("rank").alias("exact_rank"),
    )
    dcg = (
        trunc_tk.join(
            exact.select("query_id", "vec_id", "rel"), ["query_id", "vec_id"], "left"
        )
        .groupBy("query_id")
        .agg(
            F.sum(
                F.coalesce("rel", F.lit(0).cast("bigint"))
                * F.expr(f"element_at({w_lit}, p)")
            ).alias("dcg_w")
        )
    )
    idcg = exact.groupBy("query_id").agg(
        F.count("*").cast("int").alias("k_exact"),
        F.sum(F.col("rel") * F.expr(f"element_at({w_lit}, exact_rank)")).alias(
            "idcg_w"
        ),
    )
    return (
        idcg.join(dcg, "query_id")
        .select(
            "query_id",
            F.lit(MRL_DIM).cast("int").alias("mrl_dim"),
            "k_exact",
            "dcg_w",
            "idcg_w",
            F.expr("CAST(1000000 * dcg_w div idcg_w AS INT)").alias("ndcg_micro"),
        )
    )


def _oracle_matryoshka_ndcg() -> str:
    from .similarity import QUERY_STRIDE, TOP_K

    w_lit = "[{}]".format(", ".join(str(w) for w in _dcg_weights(TOP_K)))
    return f"""
WITH exact_tk AS (
  SELECT query_id, vec_id, rank AS exact_rank,
         CAST({TOP_K} + 1 - rank AS BIGINT) AS rel
  FROM ({ORACLE_TOPK_BRUTEFORCE})
), tqueries AS (
  SELECT vec_id AS query_id, embedding AS q_emb FROM embeddings
  WHERE vec_id % {QUERY_STRIDE} = 0
), tscored AS (
  SELECT q.query_id, e.vec_id,
         round(CAST(list_cosine_similarity(
                 CAST(q.q_emb[1:{MRL_DIM}] AS DOUBLE[]),
                 CAST(e.embedding[1:{MRL_DIM}] AS DOUBLE[])) AS DOUBLE), 4) AS cos_t
  FROM tqueries q JOIN embeddings e ON e.vec_id <> q.query_id
), trunc_tk AS (
  SELECT query_id, vec_id, p FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id
                                 ORDER BY cos_t DESC, vec_id) AS p
    FROM tscored
  ) WHERE p <= {TOP_K}
), dcg AS (
  SELECT t.query_id,
         CAST(SUM(COALESCE(e.rel, 0) * ({w_lit})[t.p]) AS BIGINT) AS dcg_w
  FROM trunc_tk t
  LEFT JOIN exact_tk e ON e.query_id = t.query_id AND e.vec_id = t.vec_id
  GROUP BY 1
), idcg AS (
  SELECT query_id, CAST(COUNT(*) AS INTEGER) AS k_exact,
         CAST(SUM(rel * ({w_lit})[exact_rank]) AS BIGINT) AS idcg_w
  FROM exact_tk GROUP BY 1
)
SELECT i.query_id, CAST({MRL_DIM} AS INTEGER) AS mrl_dim,
       i.k_exact, d.dcg_w, i.idcg_w,
       CAST(1000000 * d.dcg_w // i.idcg_w AS INTEGER) AS ndcg_micro
FROM idcg i JOIN dcg d USING (query_id)
"""


def _oracle_matryoshka() -> str:
    from .similarity import QUERY_STRIDE, TOP_K

    return f"""
WITH exact_tk AS (
  SELECT query_id, vec_id FROM ({ORACLE_TOPK_BRUTEFORCE})
), tqueries AS (
  SELECT vec_id AS query_id, embedding AS q_emb FROM embeddings
  WHERE vec_id % {QUERY_STRIDE} = 0
), tscored AS (
  SELECT q.query_id, e.vec_id,
         round(CAST(list_cosine_similarity(
                 CAST(q.q_emb[1:{MRL_DIM}] AS DOUBLE[]),
                 CAST(e.embedding[1:{MRL_DIM}] AS DOUBLE[])) AS DOUBLE), 4) AS cos_t
  FROM tqueries q JOIN embeddings e ON e.vec_id <> q.query_id
), trunc_tk AS (
  SELECT query_id, vec_id FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id
                                 ORDER BY cos_t DESC, vec_id) AS rank
    FROM tscored
  ) WHERE rank <= {TOP_K}
)
SELECT e.query_id,
       CAST({MRL_DIM} AS INTEGER) AS mrl_dim,
       CAST(COUNT(*) AS INTEGER) AS k_exact,
       CAST(COUNT(a.vec_id) AS INTEGER) AS n_hit,
       CAST(1000 * COUNT(a.vec_id) // COUNT(*) AS INTEGER) AS recall_milli
FROM exact_tk e
LEFT JOIN trunc_tk a ON a.query_id = e.query_id AND a.vec_id = e.vec_id
GROUP BY 1
"""


QUERIES: dict[str, tuple] = {
    "emb_matryoshka_recall": (emb_matryoshka_recall, _oracle_matryoshka()),
    "emb_matryoshka_ndcg": (emb_matryoshka_ndcg, _oracle_matryoshka_ndcg()),
    "sim_ivf_recall_report": (sim_ivf_recall_report, ORACLE_RECALL),
    "dedup_lsh_recall_report": (dedup_lsh_recall_report, _oracle_lsh_recall()),
    "sim_kmeans_ivf_recall_report": (
        sim_kmeans_ivf_recall_report,
        _oracle_learned_recall(KMEANS_IVF_RECALL_FLOOR_MILLI),
    ),
    "sim_ivfpq_recall_report": (
        sim_ivfpq_recall_report,
        _oracle_learned_recall(IVFPQ_RECALL_FLOOR_MILLI),
    ),
}
