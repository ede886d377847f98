"""General relational/OLAP queries over the TPC-H-style tables — the generic
analytic surface our engine exposes beyond the reference's own operators
(SURVEY.md section 2.4 note: Spark supplies cube/window/top-k for free; these
are the headline bench queries).

Determinism: all money aggregates use exact decimal arithmetic surfaced as
double (see operators/common.py); every LIMIT has a unique tie-break.

Scale notes: Q1 is a single map-side-combinable hash aggregate; Q3/Q5 join
fact-to-dim with broadcast on every dim side (customer at 100 TB would be
bucketed/shuffled — the code keeps explicit broadcast only for true dims and
lets AQE pick for customer); the window top-k shuffles once on the partition
key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from .common import dsum, dsum_prod, sql_dsum, sql_dsum_prod, t

DEC = "decimal(12,4)"


def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 (pricing summary report) adapted to the driver schema."""
    li = t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice").cast(DEC) * (1 - F.col("l_discount")).cast(DEC)
    charge = disc_price * (1 + F.col("l_tax")).cast(DEC)
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            F.sum(disc_price).cast("decimal(38,6)").cast("double").alias("sum_disc_price"),
            F.sum(charge).cast("decimal(38,6)").cast("double").alias("sum_charge"),
            (dsum("l_quantity") / F.count("*").cast("double")).alias("avg_qty"),
            (dsum("l_extendedprice") / F.count("*").cast("double")).alias("avg_price"),
            (dsum("l_discount") / F.count("*").cast("double")).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


ORACLE_Q1 = f"""
SELECT l_returnflag, l_linestatus,
       {sql_dsum('l_quantity')} AS sum_qty,
       {sql_dsum('l_extendedprice')} AS sum_base_price,
       {sql_dsum_prod('l_extendedprice', '1 - l_discount')} AS sum_disc_price,
       CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,4))
                     * CAST(1 - l_discount AS DECIMAL(12,4))
                     * CAST(1 + l_tax AS DECIMAL(12,4))) AS DECIMAL(38,6)) AS DOUBLE)
         AS sum_charge,
       {sql_dsum('l_quantity')} / CAST(COUNT(*) AS DOUBLE) AS avg_qty,
       {sql_dsum('l_extendedprice')} / CAST(COUNT(*) AS DOUBLE) AS avg_price,
       {sql_dsum('l_discount')} / CAST(COUNT(*) AS DOUBLE) AS avg_disc,
       CAST(COUNT(*) AS BIGINT) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3: top unshipped orders by revenue for one market segment."""
    cust = t(spark, sf_dir, "customer")
    orders = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem")
    cutoff = F.lit("1998-03-15 00:00:00").cast("timestamp")
    return (
        li.filter(F.col("l_shipdate") > cutoff)
        .join(orders.filter(F.col("o_orderdate") < cutoff), li.l_orderkey == orders.o_orderkey)
        .join(
            F.broadcast(cust.filter(F.col("c_mktsegment") == "BUILDING")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dsum_prod(F.col("l_extendedprice"), 1 - F.col("l_discount")).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


ORACLE_Q3 = f"""
SELECT l_orderkey, o_orderdate, o_orderpriority,
       {sql_dsum_prod('l_extendedprice', '1 - l_discount')} AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
  AND l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
GROUP BY 1, 2, 3
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


def q5_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: revenue by nation within one region, requiring the
    supplier and customer to share a nation (5-way join; all dims broadcast)."""
    li = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders")
    cust = t(spark, sf_dir, "customer")
    supp = t(spark, sf_dir, "supplier")
    nation = t(spark, sf_dir, "nation")
    region = t(spark, sf_dir, "region")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, F.col("o_custkey") == cust.c_custkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .filter(F.col("c_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == nation.n_nationkey)
        .join(F.broadcast(region.filter(F.col("r_name") == "ASIA")),
              F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(dsum_prod(F.col("l_extendedprice"), 1 - F.col("l_discount")).alias("revenue"))
    )


ORACLE_Q5 = f"""
SELECT n_name, {sql_dsum_prod('l_extendedprice', '1 - l_discount')} AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE c_nationkey = s_nationkey AND r_name = 'ASIA'
GROUP BY n_name
"""


def q_top_customers_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window top-k: top-5 customers by order value per market segment."""
    cust = t(spark, sf_dir, "customer")
    orders = t(spark, sf_dir, "orders")
    per_cust = (
        orders.groupBy("o_custkey")
        .agg(dsum("o_totalprice").alias("total_value"), F.count("*").alias("n_orders"))
        .join(cust, F.col("o_custkey") == cust.c_custkey)
    )
    w = W.partitionBy("c_mktsegment").orderBy(
        F.desc("total_value"), F.asc("c_custkey")
    )
    return (
        per_cust.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
        .select("c_mktsegment", "c_custkey", "c_name", "total_value", "n_orders", "rank")
    )


ORACLE_TOP_CUSTOMERS = f"""
WITH per_cust AS (
  SELECT o_custkey,
         {sql_dsum('o_totalprice')} AS total_value,
         CAST(COUNT(*) AS BIGINT) AS n_orders
  FROM orders GROUP BY 1
), ranked AS (
  SELECT c.c_mktsegment, c.c_custkey, c.c_name, p.total_value, p.n_orders,
         row_number() OVER (PARTITION BY c.c_mktsegment
                            ORDER BY p.total_value DESC, c.c_custkey) AS rank
  FROM per_cust p JOIN customer c ON p.o_custkey = c.c_custkey
)
SELECT c_mktsegment, c_custkey, c_name, total_value, n_orders, CAST(rank AS INT) AS rank
FROM ranked WHERE rank <= 5
"""


def q_order_priority_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: order counts by status x priority (conditional aggregation —
    the DataFrame .pivot() shape with explicit value list)."""
    orders = t(spark, sf_dir, "orders")
    priorities = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
    return (
        orders.groupBy("o_orderstatus")
        .pivot("o_orderpriority", priorities)
        .agg(F.count(F.lit(1)))
        .na.fill(0, [p for p in priorities])
    )


ORACLE_PRIORITY_PIVOT = """
SELECT o_orderstatus,
       CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS BIGINT)
         AS "1-URGENT",
       CAST(SUM(CASE WHEN o_orderpriority = '2-HIGH' THEN 1 ELSE 0 END) AS BIGINT)
         AS "2-HIGH",
       CAST(SUM(CASE WHEN o_orderpriority = '3-MEDIUM' THEN 1 ELSE 0 END) AS BIGINT)
         AS "3-MEDIUM",
       CAST(SUM(CASE WHEN o_orderpriority = '4-NOT SPECIFIED' THEN 1 ELSE 0 END) AS BIGINT)
         AS "4-NOT SPECIFIED",
       CAST(SUM(CASE WHEN o_orderpriority = '5-LOW' THEN 1 ELSE 0 END) AS BIGINT)
         AS "5-LOW"
FROM orders
GROUP BY o_orderstatus
"""


def q_rollup_nation_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP: customer account balance totals by region/nation with
    subtotals (grouping-set surface the reference lacks entirely)."""
    cust = t(spark, sf_dir, "customer")
    nation = t(spark, sf_dir, "nation")
    region = t(spark, sf_dir, "region")
    joined = cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey).join(
        F.broadcast(region), nation.n_regionkey == region.r_regionkey
    )
    return joined.rollup("r_name", "n_name").agg(
        F.count("*").alias("n_customers"),
        dsum("c_acctbal").alias("total_acctbal"),
    )


ORACLE_ROLLUP = f"""
SELECT r_name, n_name,
       CAST(COUNT(*) AS BIGINT) AS n_customers,
       {sql_dsum('c_acctbal')} AS total_acctbal
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY ROLLUP (r_name, n_name)
"""


QUERIES: dict[str, tuple] = {
    "q1_pricing_summary": (q1_pricing_summary, ORACLE_Q1),
    "q3_shipping_priority": (q3_shipping_priority, ORACLE_Q3),
    "q5_region_revenue": (q5_region_revenue, ORACLE_Q5),
    "q_top_customers_window": (q_top_customers_window, ORACLE_TOP_CUSTOMERS),
    "q_order_priority_pivot": (q_order_priority_pivot, ORACLE_PRIORITY_PIVOT),
    "q_rollup_nation_region": (q_rollup_nation_region, ORACLE_ROLLUP),
}


def q6_revenue_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 (forecast revenue change): pure filter + single aggregate —
    the pushdown showcase (all predicates reach the parquet scan)."""
    li = t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        .filter(F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
        .filter((F.col("l_discount") >= 0.05) & (F.col("l_discount") <= 0.07))
        .filter(F.col("l_quantity") < 24)
        .agg(
            dsum_prod(F.col("l_extendedprice"), F.col("l_discount")).alias("revenue"),
            F.count("*").alias("n_lines"),
        )
    )


ORACLE_Q6 = f"""
SELECT {sql_dsum_prod('l_extendedprice', 'l_discount')} AS revenue,
       CAST(COUNT(*) AS BIGINT) AS n_lines
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 (returned item reporting): top-20 customers by revenue lost
    to returns in a quarter."""
    li = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders")
    cust = t(spark, sf_dir, "customer")
    nation = t(spark, sf_dir, "nation")
    q_start = F.lit("1996-10-01 00:00:00").cast("timestamp")
    q_end = F.lit("1997-01-01 00:00:00").cast("timestamp")
    return (
        li.filter(F.col("l_returnflag") == "R")
        .join(
            orders.filter((F.col("o_orderdate") >= q_start) & (F.col("o_orderdate") < q_end)),
            li.l_orderkey == orders.o_orderkey,
        )
        .join(cust, F.col("o_custkey") == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name", "c_acctbal")
        .agg(dsum_prod(F.col("l_extendedprice"), 1 - F.col("l_discount")).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


ORACLE_Q10 = f"""
SELECT c_custkey, c_name, n_name, c_acctbal,
       {sql_dsum_prod('l_extendedprice', '1 - l_discount')} AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1996-10-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
GROUP BY 1, 2, 3, 4
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


QUERIES.update(
    {
        "q6_revenue_change": (q6_revenue_change, ORACLE_Q6),
        "q10_returned_items": (q10_returned_items, ORACLE_Q10),
    }
)


def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS: order value by (status), (priority), and grand total
    in one pass — the generalized form of rollup/cube the reference lacks."""
    t(spark, sf_dir, "orders")  # ensures the temp view is registered
    return spark.sql(
        f"""
        SELECT o_orderstatus, o_orderpriority,
               CAST(COUNT(*) AS BIGINT) AS n,
               {sql_dsum('o_totalprice')} AS total_value
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


ORACLE_GROUPING_SETS = f"""
SELECT o_orderstatus, o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n,
       {sql_dsum('o_totalprice')} AS total_value
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
"""


def q_cube_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over returnflag x linestatus with quantity totals."""
    li = t(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("n"), dsum("l_quantity").alias("sum_qty")
    )


ORACLE_CUBE = f"""
SELECT l_returnflag, l_linestatus,
       CAST(COUNT(*) AS BIGINT) AS n,
       {sql_dsum('l_quantity')} AS sum_qty
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
"""


def q_unpivot_balances(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT (stack): per-nation wide metrics melted to (metric, value)
    rows — the melt shape for metric stores."""
    cust = t(spark, sf_dir, "customer")
    supp = t(spark, sf_dir, "supplier")
    wide = (
        cust.groupBy("c_nationkey")
        .agg(
            F.count("*").cast("double").alias("n_customers"),
            dsum("c_acctbal").alias("cust_balance"),
        )
        .join(
            supp.groupBy(F.col("s_nationkey").alias("c_nationkey")).agg(
                F.count("*").cast("double").alias("n_suppliers"),
                dsum("s_acctbal").alias("supp_balance"),
            ),
            "c_nationkey",
            "left",
        )
        .na.fill(0.0)
    )
    return wide.selectExpr(
        "c_nationkey AS nationkey",
        """stack(4,
           'n_customers', n_customers,
           'cust_balance', cust_balance,
           'n_suppliers', n_suppliers,
           'supp_balance', supp_balance) AS (metric, value)""",
    )


ORACLE_UNPIVOT = f"""
WITH wide AS (
  SELECT c.c_nationkey AS nationkey,
         CAST(c.n_customers AS DOUBLE) AS n_customers,
         c.cust_balance,
         COALESCE(CAST(s.n_suppliers AS DOUBLE), 0.0) AS n_suppliers,
         COALESCE(s.supp_balance, 0.0) AS supp_balance
  FROM (SELECT c_nationkey, COUNT(*) AS n_customers,
               {sql_dsum('c_acctbal')} AS cust_balance
        FROM customer GROUP BY 1) c
  LEFT JOIN (SELECT s_nationkey, COUNT(*) AS n_suppliers,
                    {sql_dsum('s_acctbal')} AS supp_balance
             FROM supplier GROUP BY 1) s
    ON c.c_nationkey = s.s_nationkey
)
SELECT nationkey, 'n_customers' AS metric, n_customers AS value FROM wide
UNION ALL SELECT nationkey, 'cust_balance', cust_balance FROM wide
UNION ALL SELECT nationkey, 'n_suppliers', n_suppliers FROM wide
UNION ALL SELECT nationkey, 'supp_balance', supp_balance FROM wide
"""


QUERIES.update(
    {
        "q_grouping_sets": (q_grouping_sets, ORACLE_GROUPING_SETS),
        "q_cube_returns": (q_cube_returns, ORACLE_CUBE),
        "q_unpivot_balances": (q_unpivot_balances, ORACLE_UNPIVOT),
    }
)


def scd2_pipeline_outcomes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD type-2 dimension history: each pipeline's last-outcome attribute
    (success/failure) versioned into validity intervals. Consecutive
    identical outcomes are merged (the SCD2 'no-change, no-row' rule);
    each surviving change gets [valid_from, valid_to) via lead() and a
    version number, with the open interval flagged current.

    The window is partitioned per pipeline — at 100 TB the history build
    is one shuffle keyed on the dimension's natural key with no global
    sort; this is exactly how warehouse dimension loads run on Spark.
    Pure window functions over exact timestamps — deterministic."""
    ev = t(spark, sf_dir, "lifecycle_events")
    outcomes = ev.filter(
        F.col("event_subtype").isin("success", "failure")
    ).select(
        "pipeline_uuid",
        F.col("event_subtype").alias("outcome"),
        "event_time",
        "exec_uuid",
    )
    w = W.partitionBy("pipeline_uuid").orderBy("event_time", "exec_uuid")
    changed = outcomes.withColumn("prev", F.lag("outcome").over(w)).filter(
        F.col("prev").isNull() | (F.col("prev") != F.col("outcome"))
    )
    w2 = W.partitionBy("pipeline_uuid").orderBy("event_time", "exec_uuid")
    return changed.select(
        "pipeline_uuid",
        "outcome",
        F.col("event_time").alias("valid_from"),
        F.lead("event_time").over(w2).alias("valid_to"),
        F.lead("event_time").over(w2).isNull().alias("is_current"),
        F.row_number().over(w2).cast("int").alias("version"),
    )


ORACLE_SCD2 = """
WITH outcomes AS (
  SELECT pipeline_uuid, event_subtype AS outcome, event_time, exec_uuid
  FROM lifecycle_events
  WHERE event_subtype IN ('success', 'failure')
), changed AS (
  SELECT * FROM (
    SELECT pipeline_uuid, outcome, event_time, exec_uuid,
           LAG(outcome) OVER (PARTITION BY pipeline_uuid
                              ORDER BY event_time, exec_uuid) AS prev
    FROM outcomes
  ) WHERE prev IS NULL OR prev <> outcome
)
SELECT pipeline_uuid, outcome,
       event_time AS valid_from,
       LEAD(event_time) OVER w AS valid_to,
       (LEAD(event_time) OVER w IS NULL) AS is_current,
       CAST(ROW_NUMBER() OVER w AS INT) AS version
FROM changed
WINDOW w AS (PARTITION BY pipeline_uuid ORDER BY event_time, exec_uuid)
"""


QUERIES.update(
    {
        "scd2_pipeline_outcomes": (scd2_pipeline_outcomes, ORACLE_SCD2),
    }
)
