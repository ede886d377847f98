"""Blocked fuzzy string matching: edit-distance entity resolution over
part names — the record-linkage primitive the dedup family lacks (shingle
Jaccard and MinHash catch token-level similarity; typo-class corruption
needs edit distance).

Shape: candidate generation by BLOCKING (equi-join on (p_brand, p_size) —
the standard record-linkage move that turns the quadratic all-pairs into
per-block pair sets), then `levenshtein` verification inside each block.
Blocking is an equi shuffle join; at 100 TB the block key is chosen so
block sizes stay bounded (here <= tens of parts per (brand, size)) and a
skewed block would be chunk-capped like the embedding gram blocks
(dedup.py EMB_BLOCK_CAP).

Non-vacuity: deterministic planted corruptions — parts with
p_partkey % 97 == 0 get a single-character-deletion twin at partkey +
(7 << 40) (the next free plant offset, per the plant-offset registry in
dedup.py) with brand/size preserved, so every plant lands in its
original's block at edit distance exactly 1. Random same-block name pairs
of 20+-char five-word names sit far above the threshold, so the match set
is exactly the plants — and the oracle twin re-derives plants, blocks,
and distances (Spark and DuckDB `levenshtein` are the same classic DP —
verified identical on probes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .common import t

_PLANT_OFFSET = 7 << 40
_PLANT_MOD = 97
_EDIT_MAX = 2


def _universe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parts plus their planted single-deletion twins."""
    part = t(spark, sf_dir, "part").select("p_partkey", "p_name", "p_brand", "p_size")
    pos = (F.col("p_partkey") % 20 + 1).cast("int")
    mutated = part.filter(F.col("p_partkey") % _PLANT_MOD == 0).select(
        (F.col("p_partkey") + F.lit(_PLANT_OFFSET)).alias("p_partkey"),
        F.concat(
            F.expr("substring(p_name, 1, CAST(p_partkey % 20 AS INT))"),
            F.expr("substring(p_name, CAST(p_partkey % 20 AS INT) + 2)"),
        ).alias("p_name"),
        "p_brand",
        "p_size",
    )
    del pos
    return part.unionByName(mutated)


def part_fuzzy_name_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(key_a, key_b, name_a, name_b, edit_dist) pairs within EDIT_MAX,
    candidates blocked on (p_brand, p_size)."""
    u = _universe(spark, sf_dir)
    a = u.select(
        F.col("p_partkey").alias("key_a"),
        F.col("p_name").alias("name_a"),
        "p_brand",
        "p_size",
    )
    b = u.select(
        F.col("p_partkey").alias("key_b"),
        F.col("p_name").alias("name_b"),
        "p_brand",
        "p_size",
    )
    return (
        a.join(b, ["p_brand", "p_size"])
        .filter(F.col("key_a") < F.col("key_b"))
        .withColumn("edit_dist", F.levenshtein("name_a", "name_b"))
        .filter(F.col("edit_dist") <= _EDIT_MAX)
        .select("key_a", "key_b", "name_a", "name_b", "edit_dist")
    )


ORACLE_FUZZY = f"""
WITH universe AS (
  SELECT p_partkey, p_name, p_brand, p_size FROM part
  UNION ALL
  SELECT p_partkey + {_PLANT_OFFSET},
         substring(p_name, 1, CAST(p_partkey % 20 AS INT))
           || substring(p_name, CAST(p_partkey % 20 AS INT) + 2),
         p_brand, p_size
  FROM part WHERE p_partkey % {_PLANT_MOD} = 0
)
SELECT a.p_partkey AS key_a, b.p_partkey AS key_b,
       a.p_name AS name_a, b.p_name AS name_b,
       CAST(levenshtein(a.p_name, b.p_name) AS INTEGER) AS edit_dist
FROM universe a
JOIN universe b
  ON a.p_brand = b.p_brand AND a.p_size = b.p_size
 AND a.p_partkey < b.p_partkey
WHERE levenshtein(a.p_name, b.p_name) <= {_EDIT_MAX}
"""


QUERIES: dict[str, tuple] = {
    "part_fuzzy_name_match": (part_fuzzy_name_match, ORACLE_FUZZY),
}
