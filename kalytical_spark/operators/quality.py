"""Data-quality constraint suite (data contracts): declarative checks over
the warehouse tables — range, domain, referential-integrity, and
freshness-bound constraints — rolled up into one violations report, the
dbt-test / Great-Expectations shape a production pipeline runs before
publishing a dataset.

Scale: every check is a single filter-aggregate over its table (map-side
combinable, no joins except the FK anti-join, whose dimension side is
broadcast); the suite is one pass per table regardless of how many
constraints share it.

Non-vacuous by construction (the synthetic warehouse is clean): each table
gains a deterministic re-keyed corrupted twin — out-of-range quantity,
dangling customer FK, negative part size, out-of-bounds order date — so
every check provably fires and the planted violation counts are part of
the oracle contract (same pattern as dedup_exact / pii_scrub_docs).

Reference parity: the reference engine has no constraint surface; this is
part of the training-data/warehouse extension family (COVERAGE.md).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .common import t

QTY_MIN, QTY_MAX = 1, 50
DATE_MAX = "1998-12-31"
PLANT_KEY_OFFSET = 10_000_000
FK_OFFSET = 9_000_000
LI_STRIDE = 97
ORD_STRIDE = 89
PART_STRIDE = 61


def _corrupted_inputs(spark: SparkSession, sf_dir: str):
    li = t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity"
    )
    li_bad = li.filter(F.col("l_orderkey") % LI_STRIDE == 0).select(
        (F.col("l_orderkey") + PLANT_KEY_OFFSET).alias("l_orderkey"),
        "l_linenumber",
        (F.col("l_quantity") + 1000).alias("l_quantity"),
    )
    orders = t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_orderdate")
    ord_bad = orders.filter(F.col("o_orderkey") % ORD_STRIDE == 0).select(
        (F.col("o_orderkey") + PLANT_KEY_OFFSET).alias("o_orderkey"),
        (F.col("o_custkey") + FK_OFFSET).alias("o_custkey"),
        (F.col("o_orderdate") + F.expr("INTERVAL 4000 DAYS")).alias("o_orderdate"),
    )
    part = t(spark, sf_dir, "part").select("p_partkey", "p_size")
    part_bad = part.filter(F.col("p_partkey") % PART_STRIDE == 0).select(
        (F.col("p_partkey") + PLANT_KEY_OFFSET).alias("p_partkey"),
        F.lit(-1).alias("p_size"),
    )
    return (
        li.unionByName(li_bad),
        orders.unionByName(ord_bad),
        part.unionByName(part_bad),
    )


def dq_constraint_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row per constraint: rows checked, violations, and the smallest
    violating key (the triage pointer). All checks aggregate exactly; the
    FK check is an anti-join with the dimension side broadcast."""
    li, orders, part = _corrupted_inputs(spark, sf_dir)
    cust = t(spark, sf_dir, "customer").select("c_custkey")

    def report(name: str, checked: DataFrame, bad: DataFrame, key: str) -> DataFrame:
        n = checked.agg(F.count("*").alias("n_checked"))
        v = bad.agg(
            F.count("*").alias("n_violations"), F.min(key).alias("first_bad_key")
        )
        return n.crossJoin(v).select(
            F.lit(name).alias("check_name"),
            F.col("n_checked").cast("bigint"),
            F.col("n_violations").cast("bigint"),
            F.col("first_bad_key").cast("bigint"),
        )

    qty_bad = li.filter(
        (F.col("l_quantity") < QTY_MIN) | (F.col("l_quantity") > QTY_MAX)
    )
    fk_bad = orders.join(
        F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"], "left_anti"
    )
    size_bad = part.filter(F.col("p_size") <= 0)
    date_bad = orders.filter(F.col("o_orderdate") > F.lit(DATE_MAX).cast("timestamp"))

    return reduce(
        DataFrame.unionByName,
        [
            report("lineitem_qty_range", li, qty_bad, "l_orderkey"),
            report("orders_custkey_fk", orders, fk_bad, "o_orderkey"),
            report("part_size_positive", part, size_bad, "p_partkey"),
            report("orders_date_bounds", orders, date_bad, "o_orderkey"),
        ],
    )


ORACLE_DQ = f"""
WITH li2 AS (
  SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
  UNION ALL
  SELECT l_orderkey + {PLANT_KEY_OFFSET}, l_linenumber, l_quantity + 1000
  FROM lineitem WHERE l_orderkey % {LI_STRIDE} = 0
), ord2 AS (
  SELECT o_orderkey, o_custkey, o_orderdate FROM orders
  UNION ALL
  SELECT o_orderkey + {PLANT_KEY_OFFSET}, o_custkey + {FK_OFFSET},
         o_orderdate + INTERVAL 4000 DAY
  FROM orders WHERE o_orderkey % {ORD_STRIDE} = 0
), part2 AS (
  SELECT p_partkey, p_size FROM part
  UNION ALL
  SELECT p_partkey + {PLANT_KEY_OFFSET}, -1
  FROM part WHERE p_partkey % {PART_STRIDE} = 0
)
SELECT 'lineitem_qty_range' AS check_name,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM li2) AS n_checked,
       CAST(COUNT(*) AS BIGINT) AS n_violations,
       CAST(MIN(l_orderkey) AS BIGINT) AS first_bad_key
FROM li2 WHERE l_quantity < {QTY_MIN} OR l_quantity > {QTY_MAX}
UNION ALL
SELECT 'orders_custkey_fk',
       (SELECT CAST(COUNT(*) AS BIGINT) FROM ord2),
       CAST(COUNT(*) AS BIGINT), CAST(MIN(o_orderkey) AS BIGINT)
FROM ord2 WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = ord2.o_custkey)
UNION ALL
SELECT 'part_size_positive',
       (SELECT CAST(COUNT(*) AS BIGINT) FROM part2),
       CAST(COUNT(*) AS BIGINT), CAST(MIN(p_partkey) AS BIGINT)
FROM part2 WHERE p_size <= 0
UNION ALL
SELECT 'orders_date_bounds',
       (SELECT CAST(COUNT(*) AS BIGINT) FROM ord2),
       CAST(COUNT(*) AS BIGINT), CAST(MIN(o_orderkey) AS BIGINT)
FROM ord2 WHERE o_orderdate > TIMESTAMP '{DATE_MAX} 00:00:00'
"""


# Benford first-digit expectations in integer milli: 1000*log10(1 + 1/d).
# Precomputed constants (no float log in either engine's query).
_BENFORD_MILLI = {1: 301, 2: 176, 3: 125, 4: 97, 5: 79, 6: 67, 7: 58, 8: 51, 9: 46}


def dq_benford_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit audit of lineitem prices — the classic
    fabricated-data screen: per leading digit, the observed share (milli)
    vs the Benford expectation and the absolute deviation. Natural
    multi-decade positive data tracks Benford; injected or truncated data
    doesn't. One map-side-combinable groupBy over 9 digits; expectations
    are precomputed integer constants, so the report is exact in both
    engines. (TPC-H prices are NOT Benford-distributed — the audit's value
    here is that the deviation column faithfully shows it; the operator is
    the screen, the fixture is just its input.)"""
    li = t(spark, sf_dir, "lineitem")
    cents = (F.col("l_extendedprice").cast("decimal(12,4)") * 100).cast("bigint")
    digit = F.substring(cents.cast("string"), 1, 1).cast("int")
    counts = li.select(digit.alias("d")).groupBy("d").agg(
        F.count("*").cast("bigint").alias("n")
    )
    expect = spark.createDataFrame(
        [(d, m) for d, m in _BENFORD_MILLI.items()], "d INT, expected_milli INT"
    )
    total = counts.agg(F.sum("n").alias("total"))
    return (
        expect.join(counts, "d", "left")
        .crossJoin(F.broadcast(total))
        .select(
            "d",
            F.coalesce("n", F.lit(0)).cast("bigint").alias("n"),
            F.expr("CAST(1000 * coalesce(n, 0) div total AS BIGINT)").alias(
                "observed_milli"
            ),
            F.col("expected_milli").cast("bigint").alias("expected_milli"),
            F.expr(
                "CAST(abs(1000 * coalesce(n, 0) div total - expected_milli) AS BIGINT)"
            ).alias("abs_dev_milli"),
        )
    )


ORACLE_BENFORD = f"""
WITH counts AS (
  SELECT CAST(substring(CAST(CAST(CAST(l_extendedprice AS DECIMAL(12,4)) * 100
                             AS BIGINT) AS VARCHAR), 1, 1) AS INT) AS d,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM lineitem GROUP BY 1
), expect AS (
  SELECT * FROM (VALUES
    {', '.join(f'({d}, {m})' for d, m in _BENFORD_MILLI.items())}
  ) AS t(d, expected_milli)
), total AS (SELECT SUM(n) AS total FROM counts)
SELECT e.d,
       CAST(COALESCE(c.n, 0) AS BIGINT) AS n,
       CAST(1000 * COALESCE(c.n, 0) // t.total AS BIGINT) AS observed_milli,
       CAST(e.expected_milli AS BIGINT) AS expected_milli,
       CAST(abs(1000 * COALESCE(c.n, 0) // t.total - e.expected_milli) AS BIGINT)
         AS abs_dev_milli
FROM expect e LEFT JOIN counts c ON e.d = c.d CROSS JOIN total t
"""


QUERIES: dict[str, tuple] = {
    "dq_constraint_report": (dq_constraint_report, ORACLE_DQ),
    "dq_benford_audit": (dq_benford_audit, ORACLE_BENFORD),
}
