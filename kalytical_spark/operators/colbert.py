"""Late-interaction multi-vector retrieval (ColBERT-style MaxSim, public
literature: Khattab & Zaharia 2020): each document carries multiple token
vectors; relevance is the sum over QUERY tokens of the best-matching
document token similarity — the retrieval family between single-vector
cosine (similarity.py) and full cross-encoders.

The fixture embeddings are 64-dim single vectors; the multi-vector view
reshapes them as MAXSIM_NTOK=8 token vectors of 8 dims (slices), the
same deterministic reinterpretation trick emb_matryoshka_recall uses for
prefix dims. Real token embeddings would arrive as array<array<float>>;
the operator shape (and the plan) is identical.

Determinism: every (query-token, doc-token) sub-dot is computed as a
fixed-order fold and SNAPPED to an integer once — CAST(ROUND(10000 *
dot) AS BIGINT) — so the max over doc tokens and the sum over query
tokens are pure bigint arithmetic: no float max/sum ordering anywhere
(the round-to-4 convention of similarity.py, hardened to ints before any
aggregation). Tie-breaks on vec_id.

Scale shape: queries are a broadcast dim; scoring is a corpus scan with
per-row NTOK^2 8-dim dots inside ONE whole-stage-codegen projection (no
shuffle until the per-query top-k window — which is TakeOrdered-sized).
Production pairs this exact scorer with the IVF prefilter
(kmeans_ivf.make_probe) for candidate generation; the brute-force form
here is the correctness baseline the pruned path would be recall-gated
against, exactly like sim_topk_bruteforce vs sim_topk_kmeans_ivf.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from .common import t
from .similarity import QUERY_STRIDE, TOP_K

MAXSIM_NTOK = 8  # token vectors per document
MAXSIM_TDIM = 8  # dims per token vector (8 x 8 = the 64-dim fixture)

def _flat_maxsim_expr() -> str:
    """The full MaxSim as ONE flat scalar expression with literal array
    indices — sum over qt of greatest over dt of the integer-snapped
    8-term dot. Higher-order functions (aggregate/transform/zip_with)
    run INTERPRETED per row in Spark; the nested-HOF form of this scorer
    measured 68s for a 2,500-pair scan. The flattened tree (512
    multiply-adds + 64 rounds + 8 greatest) stays inside whole-stage
    codegen (Spark auto-splits oversized generated methods) and the
    term order (k ascending within each dot) matches the oracle's
    list_inner_product loop, so the IEEE sequence is identical."""

    def dot(qt: int, dt: int) -> str:
        terms = " + ".join(
            f"CAST(q_emb[{MAXSIM_TDIM} * {qt} + {k}] AS DOUBLE) * "
            f"CAST(embedding[{MAXSIM_TDIM} * {dt} + {k}] AS DOUBLE)"
            for k in range(MAXSIM_TDIM)
        )
        return f"CAST(ROUND(10000 * ({terms})) AS BIGINT)"

    per_qt = [
        "greatest(" + ", ".join(dot(qt, dt) for dt in range(MAXSIM_NTOK)) + ")"
        for qt in range(MAXSIM_NTOK)
    ]
    return "(" + " + ".join(per_qt) + ")"


_MAXSIM = _flat_maxsim_expr()


def sim_maxsim_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact MaxSim top-k: stride-100 queries against the full corpus,
    score = sum over 8 query tokens of the max over 8 doc tokens of the
    integer-snapped sub-dot (score_e4: similarity in 1e-4 units)."""
    emb = t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % QUERY_STRIDE == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    scored = (
        F.broadcast(queries)
        .join(emb, F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id", F.expr(_MAXSIM).alias("score_e4"))
    )
    w = W.partitionBy("query_id").orderBy(F.desc("score_e4"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "rank", "vec_id", "score_e4")
    )


ORACLE_MAXSIM = f"""
WITH queries AS (
  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS q_emb
  FROM embeddings WHERE vec_id % {QUERY_STRIDE} = 0
), scored AS (
  SELECT q.query_id, e.vec_id,
         list_sum(list_transform(generate_series(0, {MAXSIM_NTOK - 1}), qt ->
           list_max(list_transform(generate_series(0, {MAXSIM_NTOK - 1}), dt ->
             CAST(ROUND(10000 * list_inner_product(
               q.q_emb[{MAXSIM_TDIM} * qt + 1 : {MAXSIM_TDIM} * qt + {MAXSIM_TDIM}],
               CAST(e.embedding AS DOUBLE[])[{MAXSIM_TDIM} * dt + 1 : {MAXSIM_TDIM} * dt + {MAXSIM_TDIM}]
             )) AS BIGINT))))) AS score_e4
  FROM queries q JOIN embeddings e ON e.vec_id <> q.query_id
)
SELECT query_id, CAST(rank AS INT) AS rank, vec_id, CAST(score_e4 AS BIGINT) AS score_e4
FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY score_e4 DESC, vec_id) AS rank
  FROM scored
) WHERE rank <= {TOP_K}
"""


QUERIES: dict[str, tuple] = {
    "sim_maxsim_topk": (sim_maxsim_topk, ORACLE_MAXSIM),
}
