"""The remaining TPC-H decision-support shapes (Q9/Q11/Q15/Q16/Q17/Q19/
Q20 analogues), completing the full 22-query family on the synthetic
schema. The reference's query surface is Mongo find/sort/limit
(src/kalytical/core/data_provider.py:103-147); these are the deep
relational shapes a warehouse engine must additionally serve.

The synthetic schema has no ``partsupp`` table and no supplier comments,
so the shapes are adapted without losing their physical-plan point:
``DISTINCT (l_partkey, l_suppkey)`` is the part-supplier relationship,
``p_retailprice`` stands in for supply cost, and a supplier-name pattern
stands in for the Q16 complaints exclusion. Each query keeps the plan
property the original exists to exercise:

* Q9: a star join where EVERY dim side broadcasts — the fact table
  shuffles exactly once, for the (nation, year) aggregate. Profit is a
  decimal-exact sum of products, so the oracle comparison is bit-exact.
* Q11: group-share vs a global threshold — a two-level aggregate with the
  scalar total broadcast back; the threshold test is decimal-exact
  cross-multiplication (value * n_parts * 4 > total * 5), no division.
* Q15: argmax over an aggregate view via a broadcast scalar max and a
  decimal-exact equality — the classic "create view revenue" query
  without materializing a view.
* Q16: derive-distinct relationship, broadcast anti-join exclusion, then
  COUNT(DISTINCT) re-aggregation.
* Q17: the correlated per-part average subquery, decorrelated into an
  aggregate-then-broadcast-join; the 50%-of-average test is exact integer
  cross-multiplication (2*qty*n < s) since quantities are integral.
* Q19: a three-way disjunction of (brand, size, quantity) conjuncts kept
  as ONE broadcast hash join + codegen filter — not a union of three
  scans; Catalyst pushes the common part-side disjuncts below the join.
* Q20: two aggregates over the same (partkey[, suppkey]) shuffle key —
  the half-of-total-supply test reuses one exchange — then broadcast
  semi-join reductions to the supplier list.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .common import DEC, t

_REV = "CAST(l_extendedprice AS DECIMAL(12,4)) * CAST(1 - l_discount AS DECIMAL(12,4))"


def _rev() -> F.Column:
    return F.col("l_extendedprice").cast(DEC) * (1 - F.col("l_discount")).cast(DEC)


# --------------------------------------------------------------------------
# Q9: product-type profit by nation and year


def q9_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Profit on 'widget' parts per supplier nation per ship year. Profit =
    revenue - retail cost of the shipped quantity, all decimal-exact. The
    part/supplier/nation dims all broadcast; the lineitem fact shuffles
    once, into the final ~(25 nations x 7 years) aggregate."""
    li = t(spark, sf_dir, "lineitem")
    part = t(spark, sf_dir, "part").filter(F.col("p_name").like("%widget%"))
    sup = t(spark, sf_dir, "supplier")
    nation = t(spark, sf_dir, "nation")
    amount = _rev() - F.col("p_retailprice").cast(DEC) * F.col("l_quantity").cast(DEC)
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .join(F.broadcast(nation), sup.s_nationkey == nation.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("l_shipdate").cast("int").alias("o_year"),
        )
        .agg(F.sum(amount).cast("decimal(38,6)").cast("double").alias("sum_profit"))
    )


ORACLE_Q9 = f"""
SELECT n_name AS nation,
       CAST(year(l_shipdate) AS INT) AS o_year,
       CAST(CAST(SUM({_REV}
                     - CAST(p_retailprice AS DECIMAL(12,4))
                       * CAST(l_quantity AS DECIMAL(12,4))) AS DECIMAL(38,6))
            AS DOUBLE) AS sum_profit
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE p_name LIKE '%widget%'
GROUP BY 1, 2
"""


# --------------------------------------------------------------------------
# Q11: important parts by share of regional supply value

_Q11_REGION = "EUROPE"
# part qualifies when value > 5/4 of the mean share (cross-multiplied:
# value * n_parts * 4 > total * 5) — a scale-free threshold that stays
# non-vacuous from sf0.001 (max/mean ~1.9) upward
_Q11_NUM, _Q11_DEN = 5, 4


def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parts whose supply value from EUROPE-region suppliers exceeds 5/4 of
    the mean per-part share of the regional total. (TPC-H's literal
    1/10000-of-total fraction is scale-dependent by design — it must be
    divided by SF — so the scale-free mean-multiple keeps the query
    non-vacuous at every sf.) Two-level aggregate: the per-part rollup
    shuffles on partkey; the grand total and part count are ONE scalar row
    broadcast back; the threshold is decimal cross-multiplication
    (value * n_parts * 4 > total * 5) so no division exists in either
    engine."""
    li = t(spark, sf_dir, "lineitem")
    sup = t(spark, sf_dir, "supplier")
    nation = t(spark, sf_dir, "nation")
    region = t(spark, sf_dir, "region").filter(F.col("r_name") == _Q11_REGION)
    regional_sup = (
        sup.join(F.broadcast(nation), sup.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select("s_suppkey")
    )
    scoped = li.join(F.broadcast(regional_sup), li.l_suppkey == F.col("s_suppkey"))
    per_part = scoped.groupBy("l_partkey").agg(
        F.sum(F.col("l_extendedprice").cast(DEC)).cast("decimal(38,4)").alias("value_dec")
    )
    total = per_part.agg(
        F.sum("value_dec").cast("decimal(38,4)").alias("total_dec"),
        F.count("*").cast("bigint").alias("n_parts"),
    )
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(
            F.col("value_dec") * F.col("n_parts") * _Q11_DEN
            > F.col("total_dec") * _Q11_NUM
        )
        .select(
            F.col("l_partkey").alias("partkey"),
            F.col("value_dec").cast("double").alias("supply_value"),
        )
    )


ORACLE_Q11 = f"""
WITH regional_sup AS (
  SELECT s_suppkey FROM supplier
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = '{_Q11_REGION}'
), per_part AS (
  SELECT l_partkey,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,4))) AS DECIMAL(38,4))
           AS value_dec
  FROM lineitem JOIN regional_sup ON l_suppkey = s_suppkey
  GROUP BY 1
)
SELECT l_partkey AS partkey, CAST(value_dec AS DOUBLE) AS supply_value
FROM per_part
WHERE value_dec * (SELECT CAST(COUNT(*) AS BIGINT) FROM per_part) * {_Q11_DEN}
      > (SELECT SUM(value_dec) FROM per_part) * {_Q11_NUM}
"""


# --------------------------------------------------------------------------
# Q15: top supplier by revenue in a ship-date window

_Q15_START = "1996-01-01 00:00:00"
_Q15_END = "1997-01-01 00:00:00"


def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier(s) with the maximum revenue over the 1996 ship window —
    the revenue 'view' is a per-supplier aggregate, the max is one scalar
    broadcast, and the tie-safe selection is decimal-exact equality (the
    double cast happens only at presentation)."""
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit(_Q15_START).cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(_Q15_END).cast("timestamp"))
    )
    sup = t(spark, sf_dir, "supplier")
    revenue = li.groupBy("l_suppkey").agg(
        F.sum(_rev()).cast("decimal(38,6)").alias("rev_dec")
    )
    max_rev = revenue.agg(F.max("rev_dec").alias("max_dec"))
    return (
        revenue.crossJoin(F.broadcast(max_rev))
        .filter(F.col("rev_dec") == F.col("max_dec"))
        .join(F.broadcast(sup), F.col("l_suppkey") == sup.s_suppkey)
        .select(
            F.col("s_suppkey").alias("suppkey"),
            "s_name",
            F.col("rev_dec").cast("double").alias("total_revenue"),
        )
    )


ORACLE_Q15 = f"""
WITH revenue AS (
  SELECT l_suppkey,
         CAST(SUM({_REV}) AS DECIMAL(38,6)) AS rev_dec
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '{_Q15_START}'
    AND l_shipdate < TIMESTAMP '{_Q15_END}'
  GROUP BY 1
)
SELECT s_suppkey AS suppkey, s_name, CAST(rev_dec AS DOUBLE) AS total_revenue
FROM revenue JOIN supplier ON l_suppkey = s_suppkey
WHERE rev_dec = (SELECT MAX(rev_dec) FROM revenue)
"""


# --------------------------------------------------------------------------
# Q16: supplier counts by part descriptor, with exclusions

_Q16_EXCL_BRAND = "Brand#3"
_Q16_EXCL_TYPE = "PROMO"
_Q16_SIZES = (1, 7, 13, 19, 25, 31, 37, 43, 49)


def q16_part_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How many distinct suppliers can supply each qualifying (brand,
    type, size) descriptor. The part-supplier relationship is derived as
    DISTINCT (l_partkey, l_suppkey); 'complaint' suppliers (name ending
    in 7 — the schema has no comment text) are removed with a broadcast
    anti-join before the COUNT(DISTINCT) rollup."""
    li = t(spark, sf_dir, "lineitem")
    part = t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != _Q16_EXCL_BRAND)
        & (F.col("p_type") != _Q16_EXCL_TYPE)
        & F.col("p_size").isin(*_Q16_SIZES)
    )
    complainers = t(spark, sf_dir, "supplier").filter(
        F.col("s_name").like("%7")
    ).select("s_suppkey")
    partsupp = li.select("l_partkey", "l_suppkey").distinct()
    return (
        partsupp.join(
            F.broadcast(complainers),
            partsupp.l_suppkey == F.col("s_suppkey"),
            "left_anti",
        )
        .join(F.broadcast(part), F.col("l_partkey") == part.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").cast("bigint").alias("supplier_cnt"))
    )


ORACLE_Q16 = f"""
SELECT p_brand, p_type, p_size,
       CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
JOIN part ON l_partkey = p_partkey
WHERE p_brand <> '{_Q16_EXCL_BRAND}'
  AND p_type <> '{_Q16_EXCL_TYPE}'
  AND p_size IN {_Q16_SIZES}
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_name LIKE '%7')
GROUP BY 1, 2, 3
"""


# --------------------------------------------------------------------------
# Q17: small-quantity-order revenue

_Q17_BRAND = "Brand#3"


def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Average yearly revenue lost if small orders (quantity below half
    the part's average) of Brand#3 parts were not taken. The per-part
    average is the classic correlated subquery, decorrelated into one
    aggregate joined back broadcast; the below-half test is exact integer
    cross-multiplication (2*qty*n < s) — quantities are integral, so no
    float average exists in either engine."""
    li = t(spark, sf_dir, "lineitem")
    part = t(spark, sf_dir, "part").filter(F.col("p_brand") == _Q17_BRAND)
    scoped = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    per_part = scoped.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum(F.col("l_quantity").cast("bigint")).alias("s"),
    )
    small = scoped.join(F.broadcast(per_part), scoped.l_partkey == F.col("pk")).filter(
        F.col("l_quantity").cast("bigint") * 2 * F.col("n") < F.col("s")
    )
    return small.agg(
        (
            F.sum(F.col("l_extendedprice").cast(DEC)).cast("decimal(38,6)").cast("double")
            / F.lit(7.0)
        ).alias("avg_yearly")
    )


ORACLE_Q17 = f"""
WITH scoped AS (
  SELECT l_partkey, CAST(l_quantity AS BIGINT) AS qty, l_extendedprice
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_brand = '{_Q17_BRAND}'
), per_part AS (
  SELECT l_partkey AS pk, CAST(COUNT(*) AS BIGINT) AS n,
         SUM(qty) AS s
  FROM scoped GROUP BY 1
)
SELECT CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,4))) AS DECIMAL(38,6))
            AS DOUBLE) / 7.0 AS avg_yearly
FROM scoped JOIN per_part ON l_partkey = pk
WHERE qty * 2 * n < s
"""


# --------------------------------------------------------------------------
# Q19: disjunctive-predicate revenue

_Q19_BRANCHES = (
    ("Brand#1", 1, 20, 1, 25),
    ("Brand#2", 10, 30, 1, 30),
    ("Brand#4", 20, 40, 1, 35),
)


def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue from three alternative (brand, quantity-range, size-range)
    order profiles — the classic OR-of-ANDs predicate spanning both join
    sides. Expressed as ONE broadcast hash join with the disjunction as a
    codegen filter (no union of scans); Catalyst pushes the part-only
    disjuncts (brand/size) below the join build side."""
    li = t(spark, sf_dir, "lineitem")
    part = t(spark, sf_dir, "part")
    joined = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    cond = None
    for brand, qlo, qhi, slo, shi in _Q19_BRANCHES:
        branch = (
            (F.col("p_brand") == brand)
            & F.col("l_quantity").between(qlo, qhi)
            & F.col("p_size").between(slo, shi)
        )
        cond = branch if cond is None else (cond | branch)
    return joined.filter(cond).agg(
        F.sum(_rev()).cast("decimal(38,6)").cast("double").alias("revenue")
    )


def _q19_sql_cond() -> str:
    return " OR ".join(
        f"(p_brand = '{b}' AND l_quantity BETWEEN {qlo} AND {qhi}"
        f" AND p_size BETWEEN {slo} AND {shi})"
        for b, qlo, qhi, slo, shi in _Q19_BRANCHES
    )


ORACLE_Q19 = f"""
SELECT CAST(CAST(SUM({_REV}) AS DECIMAL(38,6)) AS DOUBLE) AS revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE {_q19_sql_cond()}
"""


# --------------------------------------------------------------------------
# Q20: dominant suppliers of a part family in a year

_Q20_PREFIX = "small%"
_Q20_YEAR = 1997


def q20_dominant_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers who shipped more than half of some 'small *' part's 1997
    volume. Both the per-(part, supplier) and per-part quantity rollups
    hash on partkey, so the second reuses the first's shuffle; the
    dominance test is integer cross-multiplication (2*qty_ps > qty_p) and
    the supplier dim joins broadcast at the end."""
    li = t(spark, sf_dir, "lineitem").filter(F.year("l_shipdate") == _Q20_YEAR)
    part = t(spark, sf_dir, "part").filter(F.col("p_name").like(_Q20_PREFIX))
    sup = t(spark, sf_dir, "supplier")
    scoped = li.join(F.broadcast(part), li.l_partkey == part.p_partkey).select(
        "l_partkey", "l_suppkey", F.col("l_quantity").cast("bigint").alias("qty")
    )
    per_ps = scoped.groupBy("l_partkey", "l_suppkey").agg(
        F.sum("qty").alias("qty_ps")
    )
    per_p = per_ps.groupBy("l_partkey").agg(F.sum("qty_ps").alias("qty_p"))
    dominant = (
        per_ps.join(per_p, "l_partkey")
        .filter(F.col("qty_ps") * 2 > F.col("qty_p"))
        .select("l_suppkey")
        .distinct()
    )
    return dominant.join(F.broadcast(sup), dominant.l_suppkey == sup.s_suppkey).select(
        F.col("s_suppkey").alias("suppkey"), "s_name"
    )


ORACLE_Q20 = f"""
WITH scoped AS (
  SELECT l_partkey, l_suppkey, CAST(l_quantity AS BIGINT) AS qty
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE year(l_shipdate) = {_Q20_YEAR} AND p_name LIKE '{_Q20_PREFIX}'
), per_ps AS (
  SELECT l_partkey, l_suppkey, SUM(qty) AS qty_ps
  FROM scoped GROUP BY 1, 2
), per_p AS (
  SELECT l_partkey, SUM(qty_ps) AS qty_p FROM per_ps GROUP BY 1
)
SELECT DISTINCT s_suppkey AS suppkey, s_name
FROM per_ps
JOIN per_p USING (l_partkey)
JOIN supplier ON l_suppkey = s_suppkey
WHERE qty_ps * 2 > qty_p
"""


QUERIES: dict[str, tuple] = {
    "q9_product_type_profit": (q9_product_type_profit, ORACLE_Q9),
    "q11_important_parts": (q11_important_parts, ORACLE_Q11),
    "q15_top_supplier": (q15_top_supplier, ORACLE_Q15),
    "q16_part_supplier_counts": (q16_part_supplier_counts, ORACLE_Q16),
    "q17_small_quantity_revenue": (q17_small_quantity_revenue, ORACLE_Q17),
    "q19_disjunctive_revenue": (q19_disjunctive_revenue, ORACLE_Q19),
    "q20_dominant_suppliers": (q20_dominant_suppliers, ORACLE_Q20),
}


COMPACT_TARGET_BYTES = 100_000  # compaction bin target
_ROW_BYTES = 100  # modeled parquet bytes per order row


def orders_compaction_plan(spark, sf_dir):
    """Small-file compaction planner — the table-maintenance pass every
    lakehouse runs: within each (order month) partition, pack the
    per-priority files into target-sized bins by NEXT-FIT over the
    deterministic (priority) order: bin = cumulative-bytes-before div
    target. File sizes are modeled as rows x a fixed row-byte estimate
    (a real deployment reads them from the manifest — same plan).

    Output: one row per planned output bin with its input-file count,
    bytes, and an undersized flag (< half target — the trailing
    remainder bin each partition may keep).

    Scale: file stats are one map-side-combinable groupBy; the
    prefix-sum window is partitioned by MONTH over at most |priorities|
    rows — bounded regardless of corpus size."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from .common import t

    orders = t(spark, sf_dir, "orders")
    files = (
        orders.select(
            F.date_trunc("month", "o_orderdate").cast("date").alias("month"),
            "o_orderpriority",
        )
        .groupBy("month", "o_orderpriority")
        .agg((F.count("*") * _ROW_BYTES).cast("bigint").alias("bytes"))
    )
    wm = (
        W.partitionBy("month")
        .orderBy("o_orderpriority")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    binned = files.withColumn(
        "bin",
        F.expr(
            f"CAST(coalesce(sum(bytes) OVER (PARTITION BY month "
            f"ORDER BY o_orderpriority ROWS BETWEEN UNBOUNDED PRECEDING "
            f"AND 1 PRECEDING), 0) div {COMPACT_TARGET_BYTES} AS BIGINT)"
        ),
    )
    del wm
    return binned.groupBy("month", "bin").agg(
        F.count("*").cast("bigint").alias("n_input_files"),
        F.sum("bytes").cast("bigint").alias("bin_bytes"),
        (F.sum("bytes") < COMPACT_TARGET_BYTES / 2).alias("undersized"),
    )


ORACLE_COMPACTION = f"""
WITH files AS (
  SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
         o_orderpriority,
         CAST(COUNT(*) * {_ROW_BYTES} AS BIGINT) AS bytes
  FROM orders GROUP BY 1, 2
),
binned AS (
  SELECT month, o_orderpriority, bytes,
         CAST(COALESCE(SUM(bytes) OVER (PARTITION BY month
                ORDER BY o_orderpriority ROWS BETWEEN UNBOUNDED PRECEDING
                AND 1 PRECEDING), 0) // {COMPACT_TARGET_BYTES} AS BIGINT) AS bin
  FROM files
)
SELECT month, bin,
       CAST(COUNT(*) AS BIGINT) AS n_input_files,
       CAST(SUM(bytes) AS BIGINT) AS bin_bytes,
       SUM(bytes) < {COMPACT_TARGET_BYTES} / 2 AS undersized
FROM binned
GROUP BY 1, 2
"""


QUERIES.update(
    {
        "orders_compaction_plan": (orders_compaction_plan, ORACLE_COMPACTION),
    }
)
