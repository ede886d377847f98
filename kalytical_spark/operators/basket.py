"""Market-basket association mining over order line items: support /
confidence / lift for co-ordered part pairs — the classic affinity
analysis a commerce warehouse runs on the same star schema the TPC-H
queries read (complements graph.py's co-purchase census, which studies
GRAPH structure; this ranks RULES by statistical strength).

All arithmetic is exact integer milli-units: confidence(a->b) =
1000 * supp_ab div supp_a and lift = 1000 * N * supp_ab div
(supp_a * supp_b) — cross-multiplied forms bounded through sf10 under
ANSI mode (1000 * N^2 < 2^63 for N up to ~3e6 baskets... for larger fleets
the milli scale drops to centi in one place; the repo convention is to keep
the first overflow-safe scale that preserves ranking).

Scale shape:
* ONE shuffle on l_orderkey groups each basket's deduped parts into a
  sorted array; both the item supports AND the C(n,2) pair expansion are
  then JVM-side array transforms over that pinned frame (the
  sketches.py:_copurchase_edges rewrite) — never a second shuffled scan,
  never an all-pairs join on parts; per-order fan-out is bounded by
  basket size (TPC-H <= 7 items; retail O(10^1-10^2)). The DuckDB twin
  keeps the textbook row self-join, so the oracle match also proves the
  array rewrite pair-exact.
* Pair supports are one map-side-combinable hash aggregate; the MIN_SUPP
  filter prunes the long tail before any further join.
* Per-item supports are a PART-keyed (vocabulary-sized) dim: they ride
  shuffle_hash-hinted joins per the repo rule — at catalog scale a forced
  broadcast of item stats is exactly what blows the driver.
* The final rule ranking is a bounded top-RULES_TOP
  (TakeOrderedAndProject), total-ordered by (lift, part_a, part_b).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .common import t

MIN_SUPP = 2  # pairs must co-occur in at least this many baskets
RULES_TOP = 100  # rules returned, ranked by lift
# Baskets larger than this are excluded from the analysis entirely (from
# n_orders, item supports, and pair expansion): a degenerate catalog-wide
# order contributes C(n,2) pair instances — ONE 500-item basket is 124,750
# pairs, quadratic hot-key mass no join strategy fixes — and carries no
# affinity signal (everything co-occurs with everything). Standard
# market-basket practice; TPC-H baskets are <= 7 items, so the cap is a
# no-op on the fixture corpus and the oracle stays value-identical
# (tests/test_skew_adversarial.py plants the 500-item basket and pins the
# exclusion).
MAX_BASKET_ITEMS = 64


def orders_market_basket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top association rules between co-ordered parts: for each pair
    appearing in >= MIN_SUPP baskets, emit supports, directed confidence
    a->b, and lift; return the RULES_TOP strongest by (lift desc, part_a,
    part_b) — a deterministic total order, so the LIMIT boundary is
    cross-engine stable."""
    li = t(spark, sf_dir, "lineitem")
    baskets = (
        li.groupBy("l_orderkey")
        .agg(F.sort_array(F.collect_set("l_partkey")).alias("ps"))
        .filter(F.size("ps") <= MAX_BASKET_ITEMS)  # degenerate-basket cap
        .cache()  # feeds the order count, item supports, and pair expansion
    )
    n_orders = baskets.agg(F.count("*").cast("bigint").alias("n_orders"))
    supp = (
        baskets.select(F.explode("ps").alias("l_partkey"))
        .groupBy("l_partkey")
        .agg(F.count("*").cast("bigint").alias("supp"))
    )
    pair_supp = (
        baskets.select(
            F.explode(
                F.expr(
                    "flatten(transform(ps, (x, i) -> "
                    "transform(slice(ps, i + 2, size(ps)), y -> struct(x AS u, y AS v))))"
                )
            ).alias("p")
        )
        .groupBy(
            F.col("p.u").alias("part_a"),
            F.col("p.v").alias("part_b"),
        )
        .agg(F.count("*").cast("bigint").alias("supp_ab"))
        .filter(F.col("supp_ab") >= MIN_SUPP)
    )
    sa = supp.select(F.col("l_partkey").alias("part_a"), F.col("supp").alias("supp_a"))
    sb = supp.select(F.col("l_partkey").alias("part_b"), F.col("supp").alias("supp_b"))
    rules = (
        pair_supp.join(sa.hint("shuffle_hash"), "part_a")
        .join(sb.hint("shuffle_hash"), "part_b")
        .crossJoin(F.broadcast(n_orders))
        .select(
            "part_a",
            "part_b",
            "supp_ab",
            "supp_a",
            "supp_b",
            F.expr("CAST(1000 * supp_ab div supp_a AS BIGINT)").alias("conf_ab_milli"),
            F.expr(
                "CAST(1000 * n_orders * supp_ab div (supp_a * supp_b) AS BIGINT)"
            ).alias("lift_milli"),
        )
    )
    return rules.orderBy(
        F.desc("lift_milli"), F.asc("part_a"), F.asc("part_b")
    ).limit(RULES_TOP)


ORACLE_BASKET = f"""
WITH items AS (
  SELECT l_orderkey, l_partkey FROM (
    SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
  ) QUALIFY COUNT(*) OVER (PARTITION BY l_orderkey) <= {MAX_BASKET_ITEMS}
),
n AS (SELECT CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_orders FROM items),
supp AS (
  SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS supp FROM items GROUP BY 1
),
pair_supp AS (
  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
         CAST(COUNT(*) AS BIGINT) AS supp_ab
  FROM items a JOIN items b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2
  HAVING COUNT(*) >= {MIN_SUPP}
)
SELECT part_a, part_b, supp_ab,
       sa.supp AS supp_a, sb.supp AS supp_b,
       CAST(1000 * supp_ab // sa.supp AS BIGINT) AS conf_ab_milli,
       CAST(1000 * n.n_orders * supp_ab // (sa.supp * sb.supp) AS BIGINT) AS lift_milli
FROM pair_supp
JOIN supp sa ON sa.l_partkey = part_a
JOIN supp sb ON sb.l_partkey = part_b
CROSS JOIN n
ORDER BY lift_milli DESC, part_a, part_b
LIMIT {RULES_TOP}
"""


QUERIES: dict[str, tuple] = {
    "orders_market_basket": (orders_market_basket, ORACLE_BASKET),
}
