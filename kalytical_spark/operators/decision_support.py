"""Deep decision-support join shapes (TPC-H Q8/Q13/Q18/Q21 analogues on
the synthetic schema): outer-join distributions, having-gated join-backs,
windowed market share, and the double-anti-join "sole late supplier".

The reference's query surface is Mongo find/sort/limit
(src/kalytical/core/data_provider.py); these cover the relational shapes a
warehouse engine must also serve, each chosen for a distinct physical
plan:

* Q13: LEFT OUTER join with a pushed-through join-side predicate, then a
  re-aggregation of the aggregate (distribution of counts). The zero
  bucket only exists because the predicate lives in the JOIN condition,
  not the WHERE — the classic outer-join-filter trap, pinned by a test.
* Q18: having-gated aggregate joined back to its fact — the filtered agg
  is tiny (top ~0.1% of orders), so it broadcasts; the big side is never
  re-shuffled.
* Q21: EXISTS / NOT-EXISTS pair re-expressed as two aggregate gates
  (multi-supplier orders, single-late-supplier orders) — the oracle runs
  the literal correlated EXISTS form, proving the aggregate rewrite
  equivalent. At scale the aggregate form wins: two hash aggregates on
  the already-shuffled orderkey vs two correlated semi-join passes.
* Q8: per-year market share via a window sum over an aggregate — the
  share is one IEEE division of two decimal-exact doubles (common.py
  conventions), bit-identical across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from .common import DEC, t
from .warehouse import _rev

_LATE_DAYS = 60
_Q18_MIN_QTY = 250


def q13_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution of per-customer order counts, excluding urgent orders.
    The priority predicate is part of the LEFT JOIN condition so customers
    with only urgent orders land in the zero bucket instead of vanishing."""
    cust = t(spark, sf_dir, "customer")
    orders = t(spark, sf_dir, "orders")
    per_cust = cust.join(
        orders,
        (cust.c_custkey == orders.o_custkey)
        & (orders.o_orderpriority != "1-URGENT"),
        "left",
    ).groupBy("c_custkey").agg(
        F.count("o_orderkey").cast("bigint").alias("c_count")
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").cast("bigint").alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


ORACLE_Q13 = """
SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
FROM (
  SELECT c_custkey, CAST(COUNT(o_orderkey) AS BIGINT) AS c_count
  FROM customer
  LEFT JOIN orders ON c_custkey = o_custkey
                  AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey
)
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders whose total quantity exceeds the threshold, joined back to
    customer and order attributes. The having-gated aggregate is rare
    enough to broadcast; orders/customer are probed without a re-shuffle."""
    li = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders")
    cust = t(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast(DEC)).alias("qty_dec"))
        .filter(F.col("qty_dec") > _Q18_MIN_QTY)
    )
    return (
        orders.join(
            F.broadcast(big), orders.o_orderkey == F.col("l_orderkey")
        )
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            "o_totalprice",
            F.col("qty_dec").cast("double").alias("total_qty"),
        )
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(100)
    )


ORACLE_Q18 = f"""
SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
       CAST(qty_dec AS DOUBLE) AS total_qty
FROM (
  SELECT l_orderkey, SUM(CAST(l_quantity AS DECIMAL(12,4))) AS qty_dec
  FROM lineitem GROUP BY 1
  HAVING SUM(CAST(l_quantity AS DECIMAL(12,4))) > {_Q18_MIN_QTY}
) big
JOIN orders ON o_orderkey = big.l_orderkey
JOIN customer ON o_custkey = c_custkey
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 100
"""


def q21_sole_late_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers who were the ONLY late supplier on multi-supplier orders
    (lateness = shipped more than _LATE_DAYS after the order date).

    The classic formulation is EXISTS(other supplier) AND NOT EXISTS(other
    late supplier) — the oracle runs exactly that. Here both correlated
    quantifiers collapse into aggregate gates on l_orderkey: orders with
    >1 distinct suppliers, and late-sets with exactly 1 distinct supplier.
    Same rows, two hash aggregates instead of two correlated passes."""
    li = t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    orders = t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    supp = t(spark, sf_dir, "supplier")
    late = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .filter(
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr(f"INTERVAL {_LATE_DAYS} DAYS")
        )
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    multi_supp = (
        li.groupBy("l_orderkey")
        .agg(F.countDistinct("l_suppkey").alias("n_supp"))
        .filter(F.col("n_supp") > 1)
        .select("l_orderkey")
    )
    sole_late = (
        late.groupBy("l_orderkey")
        .agg(F.countDistinct("l_suppkey").alias("n_late"))
        .filter(F.col("n_late") == 1)
        .select("l_orderkey")
    )
    return (
        late.join(multi_supp, "l_orderkey", "left_semi")
        .join(sole_late, "l_orderkey", "left_semi")
        .groupBy("l_suppkey")
        .agg(F.countDistinct("l_orderkey").cast("bigint").alias("numwait"))
        .join(F.broadcast(supp), F.col("l_suppkey") == supp.s_suppkey)
        .select("s_name", "numwait")
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(25)
    )


ORACLE_Q21 = f"""
WITH late AS (
  SELECT DISTINCT l_orderkey, l_suppkey
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE l_shipdate > o_orderdate + INTERVAL {_LATE_DAYS} DAY
)
SELECT s_name, CAST(COUNT(DISTINCT l1.l_orderkey) AS BIGINT) AS numwait
FROM late l1
JOIN supplier ON l1.l_suppkey = s_suppkey
WHERE EXISTS (
        SELECT 1 FROM lineitem l2
        WHERE l2.l_orderkey = l1.l_orderkey
          AND l2.l_suppkey <> l1.l_suppkey
      )
  AND NOT EXISTS (
        SELECT 1 FROM late l3
        WHERE l3.l_orderkey = l1.l_orderkey
          AND l3.l_suppkey <> l1.l_suppkey
      )
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 25
"""


def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-year market share of each supplier nation in the AMERICA
    customers' PROMO-part market. Share = nation revenue / year total —
    numerator and denominator are decimal-exact (window sum over the
    aggregate), surfaced as doubles plus their single-division share."""
    li = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders")
    cust = t(spark, sf_dir, "customer")
    supp = t(spark, sf_dir, "supplier")
    nation = t(spark, sf_dir, "nation")
    region = t(spark, sf_dir, "region")
    part = t(spark, sf_dir, "part")
    rev = (
        li.join(F.broadcast(part.filter(F.col("p_type") == "PROMO")),
                li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, F.col("o_custkey") == cust.c_custkey)
        .join(
            F.broadcast(
                nation.select(
                    F.col("n_nationkey").alias("c_nkey"), "n_regionkey"
                )
            ),
            F.col("c_nationkey") == F.col("c_nkey"),
        )
        .join(F.broadcast(region.filter(F.col("r_name") == "AMERICA")),
              F.col("n_regionkey") == F.col("r_regionkey"))
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(
            F.broadcast(
                nation.select(
                    F.col("n_nationkey").alias("s_nkey"),
                    F.col("n_name").alias("supp_nation"),
                )
            ),
            F.col("s_nationkey") == F.col("s_nkey"),
        )
        .groupBy(
            F.year("o_orderdate").cast("bigint").alias("o_year"),
            "supp_nation",
        )
        .agg(
            F.sum(_rev())
            .cast("decimal(38,6)")
            .alias("rev_dec")
        )
    )
    w = W.partitionBy("o_year")
    return rev.select(
        "o_year",
        "supp_nation",
        F.col("rev_dec").cast("double").alias("nation_rev"),
        F.sum("rev_dec").over(w).cast("decimal(38,6)").cast("double").alias("year_rev"),
    ).withColumn(
        "share", F.col("nation_rev") / F.col("year_rev")
    )


ORACLE_Q8 = f"""
WITH rev AS (
  SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
         sn.n_name AS supp_nation,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,4))
                  * CAST(1 - l_discount AS DECIMAL(12,4)))
              AS DECIMAL(38,6)) AS rev_dec
  FROM lineitem
  JOIN part     ON l_partkey = p_partkey
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation cn ON c_nationkey = cn.n_nationkey
  JOIN region   ON cn.n_regionkey = r_regionkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation sn ON s_nationkey = sn.n_nationkey
  WHERE p_type = 'PROMO' AND r_name = 'AMERICA'
  GROUP BY 1, 2
)
SELECT o_year, supp_nation,
       CAST(rev_dec AS DOUBLE) AS nation_rev,
       CAST(CAST(SUM(rev_dec) OVER (PARTITION BY o_year) AS DECIMAL(38,6))
            AS DOUBLE) AS year_rev,
       CAST(rev_dec AS DOUBLE)
         / CAST(CAST(SUM(rev_dec) OVER (PARTITION BY o_year)
                     AS DECIMAL(38,6)) AS DOUBLE) AS share
FROM rev
"""


def q12_late_shipment_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q12 shape: per line status, how many LATE-shipped lineitems belong
    to urgent/high-priority orders vs others — conditional aggregation
    after an equi-join, the classic two-bucket CASE rollup."""
    li = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders")
    urgent = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .filter(
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr(f"INTERVAL {_LATE_DAYS} DAYS")
        )
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(urgent, 1).otherwise(0))
            .cast("bigint")
            .alias("high_line_count"),
            F.sum(F.when(urgent, 0).otherwise(1))
            .cast("bigint")
            .alias("low_line_count"),
        )
    )


ORACLE_Q12 = f"""
SELECT l_linestatus,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate > o_orderdate + INTERVAL {_LATE_DAYS} DAY
GROUP BY 1
"""


def q14_promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q14 shape: promo-part revenue share of total revenue — two
    decimal-exact conditional sums and one IEEE division; the part dim
    broadcasts onto the lineitem scan."""
    li = t(spark, sf_dir, "lineitem")
    part = t(spark, sf_dir, "part")
    rev = _rev()  # the ONE decimal revenue definition (warehouse.py)
    joined = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    return joined.agg(
        F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0).cast(DEC)))
        .cast("decimal(38,6)")
        .cast("double")
        .alias("promo_revenue"),
        F.sum(rev).cast("decimal(38,6)").cast("double").alias("total_revenue"),
    ).select(
        "promo_revenue",
        "total_revenue",
        (F.lit(100.0) * F.col("promo_revenue") / F.col("total_revenue")).alias(
            "promo_share_pct"
        ),
    )


ORACLE_Q14 = """
WITH sums AS (
  SELECT CAST(CAST(SUM(CASE WHEN p_type = 'PROMO'
                  THEN CAST(l_extendedprice AS DECIMAL(12,4))
                       * CAST(1 - l_discount AS DECIMAL(12,4))
                  ELSE CAST(0 AS DECIMAL(12,4)) END) AS DECIMAL(38,6))
              AS DOUBLE) AS promo_revenue,
         CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,4))
                       * CAST(1 - l_discount AS DECIMAL(12,4)))
                   AS DECIMAL(38,6)) AS DOUBLE) AS total_revenue
  FROM lineitem JOIN part ON l_partkey = p_partkey
)
SELECT promo_revenue, total_revenue,
       100.0 * promo_revenue / total_revenue AS promo_share_pct
FROM sums
"""


_DORMANT_CUTOFF = "2000-01-01 00:00:00"


def q22_dormant_high_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q22 shape: per nation, customers with above-average positive
    account balance and no orders since the dormancy cutoff — a broadcast
    scalar subquery feeding a filter, then an anti join against the recent
    order window, then the rollup. (Plain 'no orders ever' is vacuous on
    this corpus — every customer has orders — so the dormancy window keeps
    the anti join non-vacuous at every scale factor.) The decimal-exact
    global average makes the threshold bit-identical across engines."""
    cust = t(spark, sf_dir, "customer")
    orders = t(spark, sf_dir, "orders")
    nation = t(spark, sf_dir, "nation")
    avg_bal = (
        cust.filter(F.col("c_acctbal") > 0)
        .agg(
            (
                F.sum(F.col("c_acctbal").cast(DEC)).cast("double")
                / F.count("*").cast("double")
            ).alias("avg_bal")
        )
    )
    recent = orders.filter(
        F.col("o_orderdate") >= F.lit(_DORMANT_CUTOFF).cast("timestamp")
    )
    return (
        cust.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal").cast(DEC) > F.col("avg_bal"))
        .join(recent, cust.c_custkey == recent.o_custkey, "left_anti")
        .join(F.broadcast(nation), F.col("c_nationkey") == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count("*").cast("bigint").alias("numcust"),
            F.sum(F.col("c_acctbal").cast(DEC)).cast("double").alias("totacctbal"),
        )
    )


ORACLE_Q22 = f"""
WITH avg_bal AS (
  SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(12,4))) AS DOUBLE)
           / CAST(COUNT(*) AS DOUBLE) AS avg_bal
  FROM customer WHERE c_acctbal > 0
)
SELECT n_name,
       CAST(COUNT(*) AS BIGINT) AS numcust,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(12,4))) AS DOUBLE) AS totacctbal
FROM customer, avg_bal
JOIN nation ON c_nationkey = n_nationkey
WHERE CAST(c_acctbal AS DECIMAL(12,4)) > avg_bal
  AND NOT EXISTS (
        SELECT 1 FROM orders
        WHERE o_custkey = c_custkey
          AND o_orderdate >= TIMESTAMP '{_DORMANT_CUTOFF}'
      )
GROUP BY 1
"""


def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2 shape: per part, the supplier with the cheapest lineitem (argmin
    join). Expressed as a window rank over (price, suppkey) — the
    decorrelated form of Q2's correlated MIN subquery; ties break on
    suppkey so the argmin is total. Supplier and nation dims broadcast."""
    li = t(spark, sf_dir, "lineitem")
    supp = t(spark, sf_dir, "supplier")
    nation = t(spark, sf_dir, "nation")
    w = W.partitionBy("l_partkey").orderBy(
        F.asc("l_extendedprice"), F.asc("l_suppkey")
    )
    best = (
        li.select("l_partkey", "l_suppkey", "l_extendedprice")
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
    )
    return (
        best.join(F.broadcast(supp), best.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), F.col("s_nationkey") == nation.n_nationkey)
        .select(
            F.col("l_partkey").alias("p_partkey"),
            "s_name",
            F.col("n_name").alias("supp_nation"),
            F.col("l_extendedprice").alias("best_price"),
        )
    )


ORACLE_Q2 = """
SELECT l_partkey AS p_partkey, s_name, n_name AS supp_nation,
       l_extendedprice AS best_price
FROM (
  SELECT l_partkey, l_suppkey, l_extendedprice,
         row_number() OVER (PARTITION BY l_partkey
                            ORDER BY l_extendedprice, l_suppkey) AS rk
  FROM lineitem
)
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE rk = 1
"""


def q4_priority_order_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4 shape: per order priority, how many orders have AT LEAST ONE
    late lineitem — EXISTS as a left-semi join, then the rollup. The semi
    join stops probing an order on its first late line (no fan-out)."""
    orders = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem")
    late = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .filter(
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr(f"INTERVAL {_LATE_DAYS} DAYS")
        )
        .select("l_orderkey")
    )
    return (
        orders.join(late, orders.o_orderkey == late.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").cast("bigint").alias("order_count"))
        .orderBy("o_orderpriority")
    )


ORACLE_Q4 = f"""
SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
FROM orders o
WHERE EXISTS (
  SELECT 1 FROM lineitem l
  WHERE l.l_orderkey = o.o_orderkey
    AND l.l_shipdate > o.o_orderdate + INTERVAL {_LATE_DAYS} DAY
)
GROUP BY 1
ORDER BY 1
"""


def q7_nation_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q7 shape: trade volume between two nations by year, in both
    directions — supplier nation and customer nation must differ and form
    the chosen unordered pair. Both nation dims broadcast; revenue stays
    decimal-exact until the final double cast."""
    li = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders")
    cust = t(spark, sf_dir, "customer")
    supp = t(spark, sf_dir, "supplier")
    nation = t(spark, sf_dir, "nation")
    n1 = F.broadcast(
        nation.select(
            F.col("n_nationkey").alias("s_nkey"),
            F.col("n_name").alias("supp_nation"),
        )
    )
    n2 = F.broadcast(
        nation.select(
            F.col("n_nationkey").alias("c_nkey"),
            F.col("n_name").alias("cust_nation"),
        )
    )
    pair = (
        (F.col("supp_nation") == "NATION_3") & (F.col("cust_nation") == "NATION_7")
    ) | ((F.col("supp_nation") == "NATION_7") & (F.col("cust_nation") == "NATION_3"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, F.col("o_custkey") == cust.c_custkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(n1, F.col("s_nationkey") == F.col("s_nkey"))
        .join(n2, F.col("c_nationkey") == F.col("c_nkey"))
        .filter(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("o_orderdate").cast("bigint").alias("l_year"),
        )
        .agg(
            F.sum(_rev())
            .cast("decimal(38,6)")
            .cast("double")
            .alias("revenue")
        )
    )


ORACLE_Q7 = """
SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
       CAST(year(o_orderdate) AS BIGINT) AS l_year,
       CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,4))
                     * CAST(1 - l_discount AS DECIMAL(12,4)))
                 AS DECIMAL(38,6)) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation sn ON s_nationkey = sn.n_nationkey
JOIN nation cn ON c_nationkey = cn.n_nationkey
WHERE (sn.n_name = 'NATION_3' AND cn.n_name = 'NATION_7')
   OR (sn.n_name = 'NATION_7' AND cn.n_name = 'NATION_3')
GROUP BY 1, 2, 3
"""


QUERIES: dict[str, tuple] = {
    "q2_min_cost_supplier": (q2_min_cost_supplier, ORACLE_Q2),
    "q4_priority_order_check": (q4_priority_order_check, ORACLE_Q4),
    "q7_nation_volume_shipping": (q7_nation_volume_shipping, ORACLE_Q7),
    "q13_order_count_distribution": (
        q13_order_count_distribution,
        ORACLE_Q13,
    ),
    "q18_large_volume_customers": (q18_large_volume_customers, ORACLE_Q18),
    "q21_sole_late_supplier": (q21_sole_late_supplier, ORACLE_Q21),
    "q8_market_share": (q8_market_share, ORACLE_Q8),
    "q12_late_shipment_priority": (q12_late_shipment_priority, ORACLE_Q12),
    "q14_promo_revenue_share": (q14_promo_revenue_share, ORACLE_Q14),
    "q22_dormant_high_balance": (q22_dormant_high_balance, ORACLE_Q22),
}


def orders_abc_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC / Pareto classification of parts by revenue: rank every part by
    its lifetime revenue, attach the running revenue share in exact milli
    units, and classify A (first 80% of revenue), B (to 95%), C (tail) —
    the classic inventory-analysis cut.

    Exactness: per-part revenue is DECIMAL-exact at scale 4 (a 2dp price
    times a 2dp discount factor — the product NEVER has more than 4 real
    decimals), so scale-4 integer units need no rounding anywhere; every
    share is then pure BIGINT arithmetic — 1000 * cum div total — and the
    class boundaries can never disagree across engines. Ties rank by part
    key.

    Scale: the global ordered window runs over the PART dimension after
    the fact table is fully aggregated (map-side combinable groupBy), so
    the single-partition sort sees |parts| rows, not |lineitem| — the
    dimension is orders of magnitude smaller than the fact at any sf. For
    a genuinely unbounded ranked dimension the two-pass range-partitioned
    cumulative (skew.py notes) replaces the window; not needed here."""
    li = t(spark, sf_dir, "lineitem")
    rev = li.groupBy("l_partkey").agg(F.sum(_rev()).alias("rev_dec"))
    units = (F.col("rev_dec") * 10000).cast("bigint")  # exact: true scale <= 4
    w_rank = W.orderBy(F.desc("rev_u4"), F.asc("l_partkey"))
    ranked = (
        rev.select("l_partkey", units.alias("rev_u4"))
        .withColumn("rk", F.row_number().over(w_rank).cast("int"))
        .withColumn(
            "cum_u4",
            F.sum("rev_u4").over(w_rank.rowsBetween(W.unboundedPreceding, 0)),
        )
        .withColumn("total_u4", F.sum("rev_u4").over(W.partitionBy()))
    )
    cum_milli = F.expr("CAST(1000 * cum_u4 div total_u4 AS INT)")
    return ranked.select(
        "l_partkey",
        "rev_u4",
        "rk",
        cum_milli.alias("cum_milli"),
        F.when(cum_milli <= 800, "A")
        .when(cum_milli <= 950, "B")
        .otherwise("C")
        .alias("abc_class"),
    )


ORACLE_ABC = """
WITH rev AS (
  SELECT l_partkey,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(22,4))
                  * CAST(1 - l_discount AS DECIMAL(22,4))) * 10000 AS BIGINT)
           AS rev_u4
  FROM lineitem GROUP BY 1
), ranked AS (
  SELECT l_partkey, rev_u4,
         CAST(row_number() OVER w AS INTEGER) AS rk,
         SUM(rev_u4) OVER (w ROWS UNBOUNDED PRECEDING) AS cum_u4,
         SUM(rev_u4) OVER () AS total_u4
  FROM rev
  WINDOW w AS (ORDER BY rev_u4 DESC, l_partkey)
)
SELECT l_partkey, rev_u4, rk,
       CAST(1000 * cum_u4 // total_u4 AS INTEGER) AS cum_milli,
       CASE WHEN 1000 * cum_u4 // total_u4 <= 800 THEN 'A'
            WHEN 1000 * cum_u4 // total_u4 <= 950 THEN 'B'
            ELSE 'C' END AS abc_class
FROM ranked
"""


QUERIES["orders_abc_pareto"] = (orders_abc_pareto, ORACLE_ABC)
