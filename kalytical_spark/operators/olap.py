"""Multi-dimensional OLAP aggregation surface: ROLLUP, CUBE, GROUPING
SETS, and PIVOT over the event log — the subtotal/cross-tab family every
reporting layer sits on.

Spark-first: ``df.rollup`` / ``df.cube`` / ``df.groupBy().pivot()`` and
SQL ``GROUPING SETS`` all plan as a single Expand + two-phase hash
aggregate — one pass over the fact table produces every subtotal level,
with map-side partial combine per grouping set. That is the 100 TB shape:
no per-level re-scan, no union of N aggregates (what the naive rewrite
would do), and the Expand multiplies rows only by the number of grouping
sets (2-4 here), before partial aggregation collapses them.

Exactness: value sums follow the events.py convention — sum in
DECIMAL(12,4) (exact, order-independent) and cast the total to DOUBLE at
the end, so both engines emit bit-identical doubles. Grouping flags use
ANSI GROUPING(col) (Spark ``F.grouping``), identical in DuckDB. Subtotal
rows carry NULL group keys in both engines.

The reference has no multi-dimensional aggregation (its rollups are Mongo
aggregation pipelines over run counts at most); this family generalizes
SURVEY §2.4 A1-A6 to the subtotal lattice.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .common import t

_SUM_VALUE = "CAST(SUM(CAST(value AS DECIMAL(12,4))) AS DOUBLE)"


def events_rollup_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical subtotals via ROLLUP(event_type, day): per-(type, day)
    rows, per-type subtotals, and the grand total in ONE aggregate pass
    (Expand + partial agg — never one scan per level)."""
    ev = t(spark, sf_dir, "events_ms").select(
        "event_type", F.date_trunc("day", F.col("ts")).cast("date").alias("day"), "value"
    )
    return ev.rollup("event_type", "day").agg(
        F.grouping("event_type").cast("int").alias("g_type"),
        F.grouping("day").cast("int").alias("g_day"),
        F.count("*").cast("bigint").alias("n"),
        F.expr(_SUM_VALUE).alias("sum_value"),
    )


ORACLE_ROLLUP = f"""
SELECT event_type, day,
       CAST(GROUPING(event_type) AS INTEGER) AS g_type,
       CAST(GROUPING(day) AS INTEGER) AS g_day,
       CAST(COUNT(*) AS BIGINT) AS n,
       {_SUM_VALUE} AS sum_value
FROM (SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day, value FROM events_ms)
GROUP BY ROLLUP (event_type, day)
"""


def events_cube_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full cross-tab subtotals via CUBE(event_type, month): all four
    grouping sets — (type, month), (type), (month), () — from one Expand
    pass."""
    ev = t(spark, sf_dir, "events_ms").select(
        "event_type", F.month(F.col("ts")).cast("int").alias("mon"), "value"
    )
    return ev.cube("event_type", "mon").agg(
        F.grouping("event_type").cast("int").alias("g_type"),
        F.grouping("mon").cast("int").alias("g_mon"),
        F.count("*").cast("bigint").alias("n"),
        F.expr(_SUM_VALUE).alias("sum_value"),
    )


ORACLE_CUBE = f"""
SELECT event_type, mon,
       CAST(GROUPING(event_type) AS INTEGER) AS g_type,
       CAST(GROUPING(mon) AS INTEGER) AS g_mon,
       CAST(COUNT(*) AS BIGINT) AS n,
       {_SUM_VALUE} AS sum_value
FROM (SELECT event_type, CAST(month(ts) AS INTEGER) AS mon, value
      FROM events_ms)
GROUP BY CUBE (event_type, mon)
"""


def events_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS ((event_type), (day), ()) — the general form
    ROLLUP/CUBE desugar to, exercised through Spark SQL directly (there is
    no DataFrame-API spelling). Still one Expand + aggregate plan."""
    ev = t(spark, sf_dir, "events_ms").select(
        "event_type", F.date_trunc("day", F.col("ts")).cast("date").alias("day"), "value"
    )
    ev.createOrReplaceTempView("olap_gs_events")
    return spark.sql(
        f"""
        SELECT event_type, day,
               CAST(GROUPING(event_type) AS INT) AS g_type,
               CAST(GROUPING(day) AS INT) AS g_day,
               CAST(COUNT(*) AS BIGINT) AS n,
               {_SUM_VALUE} AS sum_value
        FROM olap_gs_events
        GROUP BY GROUPING SETS ((event_type), (day), ())
        """
    )


ORACLE_GROUPING_SETS = f"""
SELECT event_type, day,
       CAST(GROUPING(event_type) AS INTEGER) AS g_type,
       CAST(GROUPING(day) AS INTEGER) AS g_day,
       CAST(COUNT(*) AS BIGINT) AS n,
       {_SUM_VALUE} AS sum_value
FROM (SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day, value FROM events_ms)
GROUP BY GROUPING SETS ((event_type), (day), ())
"""


# the event-type domain is fixed by the testdata generator at every sf;
# pinning it keeps the pivot schema stable (PIVOT with inferred values
# would need an extra distinct pass AND make the output schema data-driven)
_PIVOT_TYPES = ["click", "error", "purchase", "signup", "view"]


def events_pivot_daily_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-tab PIVOT: one row per day, one count column per event type.
    Explicit value list -> single-pass Expand aggregate with a stable
    schema (inference would cost a distinct scan and drift with data)."""
    ev = t(spark, sf_dir, "events_ms").select(
        F.date_trunc("day", F.col("ts")).cast("date").alias("day"), "event_type"
    )
    piv = ev.groupBy("day").pivot("event_type", _PIVOT_TYPES).count()
    return piv.select(
        "day",
        *[
            F.coalesce(F.col(c).cast("bigint"), F.lit(0)).alias(f"n_{c}")
            for c in _PIVOT_TYPES
        ],
    )


_PIVOT_CASES = ",\n       ".join(
    f"CAST(COALESCE(SUM(CASE WHEN event_type = '{c}' THEN 1 END), 0) AS BIGINT)"
    f" AS n_{c}"
    for c in _PIVOT_TYPES
)

ORACLE_PIVOT = f"""
SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
       {_PIVOT_CASES}
FROM events_ms
GROUP BY 1
"""


QUERIES: dict[str, tuple] = {
    "events_rollup_report": (events_rollup_report, ORACLE_ROLLUP),
    "events_cube_report": (events_cube_report, ORACLE_CUBE),
    "events_grouping_sets": (events_grouping_sets, ORACLE_GROUPING_SETS),
    "events_pivot_daily_types": (events_pivot_daily_types, ORACLE_PIVOT),
}
