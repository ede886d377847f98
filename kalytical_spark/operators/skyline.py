"""Skyline (Pareto-dominance frontier) queries: the multi-criteria
shortlist operator — "show me the parts no other part beats on BOTH
price and size". Complements the ABC/Pareto cumulative-share analysis
(decision_support.py orders_abc_pareto) with the dominance flavor of
Pareto.

Spark-first: the 2-D skyline (minimize price, maximize size) has an
exact single-pass aggregate+window form — a part survives iff its size
equals the max size AT its price and strictly exceeds the max size over
all STRICTLY cheaper prices. Both maxima come from a per-price groupBy
(map-side combinable over the corpus) followed by a prefix max over the
tiny distinct-price frame, decomposed by price digit-count (two-level
prefix max — the same no-unpartitioned-window trick as the quantile
anchor and Mann-Whitney rank sums). No pair join anywhere, so the plan
is corpus-linear; the naive dominance anti-join is quadratic.

Higher dimensions don't window-decompose, but they distribute the same
way: skyline(S) = skyline(union of per-partition local skylines), so a
D>2 variant runs this (or a local sort-filter) per partition and merges
the tiny frontiers — noted here because the 2-D form below is the local
step of exactly that recipe.

The reference has no multi-criteria surface; this family belongs to the
warehouse/decision-support side of the engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from .common import t


def parts_skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto frontier of parts: cheapest-for-their-size (minimize
    p_retailprice, maximize p_size). A part is dominated iff some part
    is no worse on both axes and strictly better on one; ties on both
    axes survive together (neither dominates). Price is exact integer
    cents (2-dp decimal x 100), so the frontier test is pure integer
    comparison in both engines."""
    parts = t(spark, sf_dir, "part").select(
        "p_partkey",
        "p_name",
        (F.col("p_retailprice").cast("decimal(12,2)") * 100)
        .cast("bigint")
        .alias("price_cents"),
        F.col("p_size").cast("int").alias("p_size"),
    )
    # per distinct price: the best (max) size at that price
    byprice = (
        parts.groupBy("price_cents")
        .agg(F.max("p_size").alias("best_at_price"))
        .withColumn("k", F.length(F.col("price_cents").cast("string")))
    )
    wk = (
        W.partitionBy("k")
        .orderBy("price_cents")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    within = byprice.withColumn("prev_in_k", F.max("best_at_price").over(wk))
    k_best = byprice.groupBy("k").agg(F.max("best_at_price").alias("kbest"))
    ka, kb = k_best.alias("ka"), k_best.alias("kb")
    offsets = (
        ka.join(kb, F.col("kb.k") < F.col("ka.k"), "left")
        .groupBy(F.col("ka.k").alias("k"))
        .agg(F.max("kb.kbest").alias("off"))
    )
    # max best size over all strictly cheaper prices (NULL = none cheaper)
    frontier = within.join(F.broadcast(offsets), "k").select(
        "price_cents",
        "best_at_price",
        F.greatest(
            F.coalesce("prev_in_k", F.lit(-1)), F.coalesce("off", F.lit(-1))
        ).alias("best_cheaper"),
    )
    return (
        parts.join(F.broadcast(frontier), "price_cents")
        .filter(
            (F.col("p_size") == F.col("best_at_price"))
            & (F.col("p_size") > F.col("best_cheaper"))
        )
        .select("p_partkey", "p_name", "price_cents", "p_size")
    )


ORACLE_SKYLINE = """
WITH parts AS (
  SELECT p_partkey, p_name,
         CAST(CAST(p_retailprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS price_cents,
         CAST(p_size AS INT) AS p_size
  FROM part
)
SELECT q.p_partkey, q.p_name, q.price_cents, q.p_size
FROM parts q
WHERE NOT EXISTS (
  SELECT 1 FROM parts p
  WHERE p.price_cents <= q.price_cents AND p.p_size >= q.p_size
    AND (p.price_cents < q.price_cents OR p.p_size > q.p_size)
)
"""


QUERIES: dict[str, tuple] = {
    "parts_skyline": (parts_skyline, ORACLE_SKYLINE),
}
