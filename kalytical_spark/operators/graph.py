"""Graph operators over the dependency DAG: bounded multi-hop reachability
(the transitive form of the reference's one-hop downstream lookup,
data_provider.py:36-37) and impact analysis.

Implementation: iterative frontier expansion — k self-joins of the edge
list, deduped per level. The edge list is O(pipelines) and broadcast, so
each hop is a broadcast join with no shuffle of the accumulated frontier;
depth is bounded because the synthetic DAG (+1 mod n edges) contains cycles,
as real pipeline graphs may transiently. The oracle is a DuckDB recursive
CTE with the same depth bound — two very different execution strategies,
one result.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .common import t

MAX_HOPS = 3


def dag_transitive_downstream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All pipelines reachable within MAX_HOPS downstream hops of each root
    ('downstream of X, transitively') with the minimal hop distance."""
    edges = t(spark, sf_dir, "dag_edges").select(
        F.col("upstream_uuid").alias("src"), F.col("pipeline_uuid").alias("dst")
    )
    frontier = edges.withColumn("hops", F.lit(1))
    levels = [frontier]
    for _ in range(MAX_HOPS - 1):
        frontier = (
            frontier.alias("f")
            .join(F.broadcast(edges.alias("e")), F.col("f.dst") == F.col("e.src"))
            .select(
                F.col("f.src").alias("src"),
                F.col("e.dst").alias("dst"),
                (F.col("f.hops") + 1).alias("hops"),
            )
        )
        levels.append(frontier)
    all_paths = reduce(DataFrame.unionByName, levels)
    return (
        all_paths.filter(F.col("src") != F.col("dst"))  # mask cycle self-returns
        .groupBy(F.col("src").alias("pipeline_uuid"), F.col("dst").alias("downstream_uuid"))
        .agg(F.min("hops").cast("int").alias("min_hops"))
    )


ORACLE_TRANSITIVE = f"""
WITH RECURSIVE reach AS (
  SELECT upstream_uuid AS src, pipeline_uuid AS dst, 1 AS hops
  FROM dag_edges
  UNION ALL
  SELECT r.src, e.pipeline_uuid AS dst, r.hops + 1
  FROM reach r JOIN dag_edges e ON r.dst = e.upstream_uuid
  WHERE r.hops < {MAX_HOPS}
)
SELECT src AS pipeline_uuid, dst AS downstream_uuid,
       CAST(MIN(hops) AS INT) AS min_hops
FROM reach
WHERE src <> dst
GROUP BY 1, 2
"""


def dag_impact_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blast radius per pipeline: how many downstreams within MAX_HOPS, and
    how many of those have retries configured (the 'what breaks if X fails'
    operational query)."""
    reach = dag_transitive_downstream(spark, sf_dir)
    defs = t(spark, sf_dir, "pipeline_defs").select(
        F.col("pipeline_uuid").alias("downstream_uuid"),
        (F.col("retry_max") > 0).alias("has_retries"),
    )
    return (
        reach.join(F.broadcast(defs), "downstream_uuid")
        .groupBy("pipeline_uuid")
        .agg(
            F.count("*").alias("n_downstream"),
            F.sum(F.col("has_retries").cast("int")).alias("n_with_retries"),
            F.min("min_hops").cast("int").alias("nearest_hop"),
            F.max("min_hops").cast("int").alias("farthest_hop"),
        )
    )


ORACLE_IMPACT = f"""
WITH RECURSIVE reach AS (
  SELECT upstream_uuid AS src, pipeline_uuid AS dst, 1 AS hops
  FROM dag_edges
  UNION ALL
  SELECT r.src, e.pipeline_uuid AS dst, r.hops + 1
  FROM reach r JOIN dag_edges e ON r.dst = e.upstream_uuid
  WHERE r.hops < {MAX_HOPS}
), dedup AS (
  SELECT src, dst, MIN(hops) AS min_hops FROM reach WHERE src <> dst GROUP BY 1, 2
)
SELECT d.src AS pipeline_uuid,
       CAST(COUNT(*) AS BIGINT) AS n_downstream,
       CAST(SUM(CASE WHEN p.retry_max > 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_with_retries,
       CAST(MIN(d.min_hops) AS INT) AS nearest_hop,
       CAST(MAX(d.min_hops) AS INT) AS farthest_hop
FROM dedup d JOIN pipeline_defs p ON d.dst = p.pipeline_uuid
GROUP BY 1
"""


QUERIES: dict[str, tuple] = {
    "dag_transitive_downstream": (dag_transitive_downstream, ORACLE_TRANSITIVE),
    "dag_impact_analysis": (dag_impact_analysis, ORACLE_IMPACT),
}
