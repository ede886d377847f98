"""Subquery-shaped relational operators: correlated subqueries, scalar
subqueries, EXISTS/NOT EXISTS — the query shapes Catalyst decorrelates into
joins (SURVEY.md section 4.2 'subquery decorrelation ... built-in if our API
emits them'). The reference never issues these; a general engine must.

Each is written in the DataFrame API the way Catalyst plans the decorrelated
form (window argmin / broadcast semi-anti joins / cross-joined scalar agg),
with the oracle in classic subquery SQL — proving the shapes are equivalent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from .common import dsum, sql_dsum, t


def q_cheapest_supplier_per_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (correlated min subquery): for each part, the supplier
    row(s) achieving the minimum account balance among its suppliers —
    decorrelated as a window min (no per-row subquery execution)."""
    li = t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey").distinct()
    supp = t(spark, sf_dir, "supplier")
    joined = li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
    w = W.partitionBy("l_partkey")
    ranked = joined.withColumn("min_bal", F.min("s_acctbal").over(w))
    return (
        ranked.filter(F.col("s_acctbal") == F.col("min_bal"))
        .filter(F.col("l_partkey") % 50 == 0)  # keep the result compact
        .select("l_partkey", "s_suppkey", "s_name", "s_acctbal")
    )


ORACLE_CHEAPEST_SUPPLIER = """
WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
SELECT ps.l_partkey, s.s_suppkey, s.s_name, s.s_acctbal
FROM ps JOIN supplier s ON ps.l_suppkey = s.s_suppkey
WHERE s.s_acctbal = (
    SELECT MIN(s2.s_acctbal)
    FROM ps ps2 JOIN supplier s2 ON ps2.l_suppkey = s2.s_suppkey
    WHERE ps2.l_partkey = ps.l_partkey
)
AND ps.l_partkey % 50 = 0
"""


def q_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT EXISTS as left anti-join: customers with no URGENT order. (Every
    customer in the synthetic data has SOME order, which made the plain
    never-ordered variant a vacuous 0-row check — the priority predicate
    keeps the anti-join non-trivial at every sf; the filter is pushed to the
    right side before the join.)"""
    cust = t(spark, sf_dir, "customer")
    urgent = (
        t(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    return (
        cust.join(urgent, "c_custkey", "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_idle_customers"), dsum("c_acctbal").alias("idle_acctbal"))
    )


ORACLE_NO_ORDERS = f"""
SELECT c_mktsegment,
       CAST(COUNT(*) AS BIGINT) AS n_idle_customers,
       {sql_dsum('c_acctbal')} AS idle_acctbal
FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderpriority = '1-URGENT')
GROUP BY c_mktsegment
"""


def q_above_avg_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar subquery: customers with balance above the global average
    (TPC-H Q22 shape) — the scalar aggregate broadcasts to every row."""
    cust = t(spark, sf_dir, "customer")
    avg_bal = cust.agg(
        (dsum("c_acctbal") / F.count("*").cast("double")).alias("avg_bal")
    )
    return (
        cust.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .groupBy("c_nationkey")
        .agg(
            F.count("*").alias("n_above_avg"),
            dsum("c_acctbal").alias("total_above"),
        )
    )


ORACLE_ABOVE_AVG = f"""
SELECT c_nationkey,
       CAST(COUNT(*) AS BIGINT) AS n_above_avg,
       {sql_dsum('c_acctbal')} AS total_above
FROM customer
WHERE c_acctbal > (
    SELECT {sql_dsum('c_acctbal')} / CAST(COUNT(*) AS DOUBLE) FROM customer
)
GROUP BY c_nationkey
"""


def q_orders_with_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS as left semi-join: orders containing at least one returned
    line item, rolled up by priority."""
    orders = t(spark, sf_dir, "orders")
    returned = (
        t(spark, sf_dir, "lineitem")
        .filter(F.col("l_returnflag") == "R")
        .select(F.col("l_orderkey").alias("o_orderkey"))
    )
    return (
        orders.join(returned, "o_orderkey", "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_orders_with_returns"), dsum("o_totalprice").alias("total_value"))
    )


ORACLE_WITH_RETURNS = f"""
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_orders_with_returns,
       {sql_dsum('o_totalprice')} AS total_value
FROM orders o
WHERE EXISTS (
    SELECT 1 FROM lineitem l
    WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R'
)
GROUP BY o_orderpriority
"""


def q_nation_above_regional_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated aggregate subquery (per-group benchmark comparison):
    nations whose average customer balance beats their region's average —
    decorrelated as two aggregates joined on the correlation key."""
    cust = t(spark, sf_dir, "customer")
    nation = t(spark, sf_dir, "nation")
    joined = cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
    per_nation = joined.groupBy("n_nationkey", "n_name", "n_regionkey").agg(
        (dsum("c_acctbal") / F.count("*").cast("double")).alias("nation_avg")
    )
    per_region = joined.groupBy("n_regionkey").agg(
        (dsum("c_acctbal") / F.count("*").cast("double")).alias("region_avg")
    )
    return (
        per_nation.join(F.broadcast(per_region), "n_regionkey")
        .filter(F.col("nation_avg") > F.col("region_avg"))
        .select("n_name", "nation_avg", "region_avg")
    )


ORACLE_ABOVE_REGIONAL = f"""
WITH joined AS (
  SELECT c.c_acctbal, n.n_nationkey, n.n_name, n.n_regionkey
  FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
), per_nation AS (
  SELECT n_nationkey, n_name, n_regionkey,
         {sql_dsum('c_acctbal')} / CAST(COUNT(*) AS DOUBLE) AS nation_avg
  FROM joined GROUP BY 1, 2, 3
), per_region AS (
  SELECT n_regionkey,
         {sql_dsum('c_acctbal')} / CAST(COUNT(*) AS DOUBLE) AS region_avg
  FROM joined GROUP BY 1
)
SELECT pn.n_name, pn.nation_avg, pr.region_avg
FROM per_nation pn JOIN per_region pr USING (n_regionkey)
WHERE pn.nation_avg > pr.region_avg
"""


QUERIES: dict[str, tuple] = {
    "q_cheapest_supplier_per_part": (q_cheapest_supplier_per_part, ORACLE_CHEAPEST_SUPPLIER),
    "q_customers_without_orders": (q_customers_without_orders, ORACLE_NO_ORDERS),
    "q_above_avg_balance": (q_above_avg_balance, ORACLE_ABOVE_AVG),
    "q_orders_with_returns": (q_orders_with_returns, ORACLE_WITH_RETURNS),
    "q_nation_above_regional_avg": (q_nation_above_regional_avg, ORACLE_ABOVE_REGIONAL),
}
