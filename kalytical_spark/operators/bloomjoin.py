"""Deterministic Bloom-filter join pruning: pre-filter the fact side of a
selective join with a tiny md5-derived Bloom filter built from the dim
side, then run the exact join on the survivors — proven result-identical
to the plain join (the DuckDB oracle IS the plain join; no Bloom math
appears in it at all, so a false NEGATIVE anywhere would hash-mismatch).

Why this matters at 100 TB: when the dim side is selective but too large
to broadcast as rows, its Bloom filter (m bits — kilobytes) still
broadcasts, and the fact scan drops non-joining rows BEFORE the join
shuffle. That is Spark's InjectRuntimeFilter / DPP idea made explicit,
deterministic, and engine-portable: positions come from md5 slices, not
an engine-private hash, so the same filter can be built once and shipped
to any system. False positives only cost wasted shuffle rows (the exact
join removes them); false negatives are impossible by construction
(every dim key set every one of its k bits).

Shape: build = one groupBy over k exploded bit positions -> <= m/64 rows
of (block, mask); probe = k broadcast joins on block + bit tests, fully
inside the scan stage; then the ordinary equi-join on the ~selectivity
fraction that survives. The skew.py salted join proves "rewrite == plain"
for shuffle-shape; this proves it for scan-reduction — the two
result-preserving physical rewrites a planner owes you.

Reference parity: none (the reference joins in Mongo lookups,
src/kalytical/core/data_provider.py); this is engine-infrastructure for
the mandated scale story.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .common import t

M_BITS = 1024  # filter size (16 bigint words)
K_HASH = 3  # hash functions; ~1% false positives at 100 keys


def _pos_expr(key_sql: str, j: int):
    """Bit position j for a key: 24 md5 bits mod M_BITS (conv is
    Spark-only — fine, the oracle never computes positions)."""
    return F.expr(
        f"CAST(conv(substring(md5('b{j}:' || {key_sql}), 1, 6), 16, 10) "
        f"AS BIGINT) % {M_BITS}"
    )


def _selected_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The selective dim subset: scheduled K8s pipelines (~10%)."""
    return (
        t(spark, sf_dir, "pipeline_defs")
        .filter(
            (F.col("engine") == "K8sJobEngine") & F.col("schedule").isNotNull()
        )
        .select("pipeline_uuid", "engine", "schedule")
    )


def _bloom_blocks(dims: DataFrame) -> DataFrame:
    """(block, mask) Bloom words from the dim keys: k positions per key,
    OR-folded per 64-bit block — map-side combinable, <= M_BITS/64 rows."""
    pos = reduce(
        DataFrame.unionAll,
        [
            dims.select(_pos_expr("pipeline_uuid", j).alias("pos"))
            for j in range(K_HASH)
        ],
    )
    return (
        pos.select(
            F.expr("CAST(pos div 64 AS INT)").alias("block"),
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT))").alias(
                "bit"
            ),
        )
        .groupBy("block")
        .agg(F.expr("bit_or(bit)").alias("mask"))
    )


def bloom_pruned_fact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lifecycle_events rows surviving the dim Bloom filter — every true
    match survives (no false negatives); a small false-positive fraction
    rides along for the exact join to discard."""
    ev = t(spark, sf_dir, "lifecycle_events")
    blooms = _bloom_blocks(_selected_dims(spark, sf_dir))
    out = ev
    for j in range(K_HASH):
        pos = _pos_expr("pipeline_uuid", j)
        bj = blooms.withColumnRenamed("block", f"block{j}").withColumnRenamed(
            "mask", f"mask{j}"
        )
        out = (
            out.withColumn(f"pos{j}", pos)
            .join(
                F.broadcast(bj),
                F.expr(f"CAST(pos{j} div 64 AS INT)") == F.col(f"block{j}"),
                "left",
            )
            .filter(
                F.expr(
                    f"(shiftright(COALESCE(mask{j}, CAST(0 AS BIGINT)), "
                    f"CAST(pos{j} % 64 AS INT)) & 1) = 1"
                )
            )
            .drop(f"pos{j}", f"block{j}", f"mask{j}")
        )
    return out


def events_bloom_pruned_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per scheduled-K8s pipeline: lifecycle event count and distinct
    executions, computed through the Bloom-pruned fact scan + exact join.
    The oracle is the PLAIN join — equality proves zero false negatives
    and that the exact join scrubbed every false positive."""
    dims = _selected_dims(spark, sf_dir)
    pruned = bloom_pruned_fact(spark, sf_dir)
    return (
        pruned.join(F.broadcast(dims), "pipeline_uuid")
        .groupBy("pipeline_uuid", "engine", "schedule")
        .agg(
            F.count("*").cast("bigint").alias("n_events"),
            F.countDistinct("exec_uuid").cast("bigint").alias("n_execs"),
        )
    )


ORACLE_BLOOM_JOIN = """
SELECT p.pipeline_uuid, p.engine, p.schedule,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(COUNT(DISTINCT e.exec_uuid) AS BIGINT) AS n_execs
FROM lifecycle_events e
JOIN pipeline_defs p ON e.pipeline_uuid = p.pipeline_uuid
WHERE p.engine = 'K8sJobEngine' AND p.schedule IS NOT NULL
GROUP BY 1, 2, 3
"""


QUERIES: dict[str, tuple] = {
    "events_bloom_pruned_join": (events_bloom_pruned_join, ORACLE_BLOOM_JOIN),
}
