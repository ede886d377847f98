"""Document-boundary-respecting sequence packing: greedy length-bucketed
bin packing of whole documents into fixed-capacity training sequences —
the packing variant used when crossing document boundaries is not
acceptable (SFT / instruction data), complementing the concat-and-chop
packer in preprocess.pack_context_windows (which models pretraining
packing where chopping is fine).

Scheme (the standard parallelizable approximation of first-fit-decreasing;
true FFD is inherently sequential and would funnel the corpus through one
driver loop): round each document's token count up to its power-of-2
length bucket, so every document in bucket 2^b consumes a fixed
``PACK_CAP div 2^b`` slot budget — packs then fall out of plain integer
rank arithmetic (rank div docs_per_pack) with NO sequential state, one
row_number per (source, bucket, shard) group. Padding waste is bounded:
a doc wastes < half its slot (power-of-2 rounding) plus the pack tail,
and the efficiency rollup reports the realized fill against the
theoretical lower bound ``ceil(tokens / capacity)`` so the quality of
the approximation is itself a measured, oracle-checked number.

Scale: the only non-embarrassingly-parallel step is the per-group
row_number; groups are (source x bucket x PACK_SHARDS) so no partition
sees more than corpus/|groups| rows — PACK_SHARDS is the knob that
tracks cluster size (packing is per-ingest-shard in production anyway,
the same argument pack_context_windows makes for its per-source window).
Everything else is one groupBy.

Determinism: token counts are whitespace splits (the repo's shared
convention); bucket assignment is an exact integer CASE chain (no
float log2 — Spark's LOG2 is Math.log ratios and rounds 2^k edges);
slot order is (n_tok desc, doc_id); oversize docs (> PACK_CAP tokens)
are truncated to capacity and flagged, one per pack.

Reference scope: no packing surface in the reference (a job orchestrator);
this is part of the mandated LLM-training-data-pipeline family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from .common import t

PACK_CAP = 512  # tokens per training sequence (preprocess.PACK_WINDOW twin)
PACK_SHARDS = 8  # parallelism of the per-group rank; scales with the cluster

_BUCKETS = [1 << b for b in range(10)]  # 1..512 == PACK_CAP


def _bucket_expr(n_tok) -> F.Column:
    """Smallest power of two >= least(n_tok, PACK_CAP) — exact integer
    CASE chain, engine-identical (float log2 misrounds 2^k edges)."""
    capped = F.least(n_tok, F.lit(PACK_CAP))
    expr = F.lit(_BUCKETS[-1])
    for b in reversed(_BUCKETS[:-1]):
        expr = F.when(capped <= b, F.lit(b)).otherwise(expr)
    return expr


def _sql_bucket(n_tok: str) -> str:
    out = str(_BUCKETS[-1])
    for b in reversed(_BUCKETS[:-1]):
        out = f"CASE WHEN LEAST({n_tok}, {PACK_CAP}) <= {b} THEN {b} ELSE {out} END"
    return out


def _assignments(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        F.size(F.split("text", " ")).cast("bigint").alias("n_tok"),
    )
    staged = docs.select(
        "doc_id",
        "source",
        "n_tok",
        F.least(F.col("n_tok"), F.lit(PACK_CAP)).cast("bigint").alias("packed_tok"),
        (F.col("n_tok") > PACK_CAP).alias("truncated"),
        _bucket_expr(F.col("n_tok")).cast("bigint").alias("len_bucket"),
        F.pmod(F.col("doc_id"), F.lit(PACK_SHARDS)).cast("bigint").alias("pshard"),
    )
    w = W.partitionBy("source", "len_bucket", "pshard").orderBy(
        F.desc("n_tok"), F.asc("doc_id")
    )
    # pack index via exact integer arithmetic only (div, never float /):
    # docs_per_pack = PACK_CAP div len_bucket (both powers of two)
    return staged.withColumn("rn", F.row_number().over(w).cast("bigint")).select(
        "*",
        F.expr(f"(rn - 1) div ({PACK_CAP} div len_bucket)")
        .cast("bigint")
        .alias("pack_idx"),
    ).select(
        "doc_id",
        "source",
        "n_tok",
        "packed_tok",
        "truncated",
        "len_bucket",
        F.concat_ws(
            "|",
            F.col("source"),
            F.col("len_bucket").cast("string"),
            F.col("pshard").cast("string"),
            F.col("pack_idx").cast("string"),
        ).alias("pack_id"),
    )


def docs_pack_assignments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document pack assignment (doc_id, source, n_tok, packed_tok,
    truncated, len_bucket, pack_id) — deterministic, no sequential state."""
    return _assignments(spark, sf_dir)


def docs_packing_efficiency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source packing scorecard: pack count vs the theoretical lower
    bound, realized fill, padding waste, truncation count — the number a
    pipeline owner actually watches (overhead_milli is the price of the
    boundary-respecting constraint + the bucketing approximation)."""
    a = _assignments(spark, sf_dir)
    per_pack = a.groupBy("source", "pack_id").agg(
        F.sum("packed_tok").alias("pack_tokens")
    )
    packs = per_pack.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n_packs"),
        F.sum("pack_tokens").cast("bigint").alias("packed_tokens"),
    )
    docs = a.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum(F.col("truncated").cast("bigint")).cast("bigint").alias("n_truncated"),
    )
    lb = F.expr(f"(packed_tokens + {PACK_CAP} - 1) div {PACK_CAP}").cast("bigint")
    return (
        docs.join(packs, "source")
        .select(
            "source",
            "n_docs",
            "n_truncated",
            "n_packs",
            "packed_tokens",
            (F.col("n_packs") * PACK_CAP - F.col("packed_tokens"))
            .cast("bigint")
            .alias("padding_tokens"),
            F.expr(f"(1000 * packed_tokens) div (n_packs * {PACK_CAP})")
            .cast("bigint")
            .alias("fill_milli"),
            lb.alias("lower_bound_packs"),
            F.expr(
                f"(1000 * (n_packs - (packed_tokens + {PACK_CAP} - 1) div {PACK_CAP}))"
                f" div ((packed_tokens + {PACK_CAP} - 1) div {PACK_CAP})"
            )
            .cast("bigint")
            .alias("overhead_milli"),
        )
    )


_SQL_ASSIGN = f"""
  SELECT doc_id, source, n_tok,
         LEAST(n_tok, {PACK_CAP}) AS packed_tok,
         n_tok > {PACK_CAP} AS truncated,
         len_bucket,
         source || '|' || CAST(len_bucket AS VARCHAR) || '|'
           || CAST(pshard AS VARCHAR) || '|'
           || CAST((rn - 1) // ({PACK_CAP} // len_bucket) AS VARCHAR) AS pack_id
  FROM (
    SELECT doc_id, source, n_tok, len_bucket, pshard,
           ROW_NUMBER() OVER (PARTITION BY source, len_bucket, pshard
                              ORDER BY n_tok DESC, doc_id) AS rn
    FROM (
      SELECT doc_id, source,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
             CAST({_sql_bucket("CAST(len(string_split(text, ' ')) AS BIGINT)")} AS BIGINT) AS len_bucket,
             doc_id % {PACK_SHARDS} AS pshard
      FROM documents
    )
  )
"""

ORACLE_ASSIGN = f"""
SELECT doc_id, source, CAST(n_tok AS BIGINT) AS n_tok,
       CAST(packed_tok AS BIGINT) AS packed_tok, truncated,
       CAST(len_bucket AS BIGINT) AS len_bucket, pack_id
FROM ({_SQL_ASSIGN})
"""

ORACLE_EFFICIENCY = f"""
WITH a AS ({_SQL_ASSIGN}),
per_pack AS (
  SELECT source, pack_id, SUM(packed_tok) AS pack_tokens
  FROM a GROUP BY 1, 2
),
packs AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_packs,
         CAST(SUM(pack_tokens) AS BIGINT) AS packed_tokens
  FROM per_pack GROUP BY 1
),
docs AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(CASE WHEN truncated THEN 1 ELSE 0 END) AS BIGINT) AS n_truncated
  FROM a GROUP BY 1
)
SELECT d.source, d.n_docs, d.n_truncated, p.n_packs, p.packed_tokens,
       CAST(p.n_packs * {PACK_CAP} - p.packed_tokens AS BIGINT) AS padding_tokens,
       CAST((1000 * p.packed_tokens) // (p.n_packs * {PACK_CAP}) AS BIGINT) AS fill_milli,
       CAST((p.packed_tokens + {PACK_CAP} - 1) // {PACK_CAP} AS BIGINT) AS lower_bound_packs,
       CAST((1000 * (p.n_packs - (p.packed_tokens + {PACK_CAP} - 1) // {PACK_CAP}))
            // ((p.packed_tokens + {PACK_CAP} - 1) // {PACK_CAP}) AS BIGINT) AS overhead_milli
FROM docs d JOIN packs p USING (source)
"""


QUERIES: dict[str, tuple] = {
    "docs_pack_assignments": (docs_pack_assignments, ORACLE_ASSIGN),
    "docs_packing_efficiency": (docs_packing_efficiency, ORACLE_EFFICIENCY),
}
