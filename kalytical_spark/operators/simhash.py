"""SimHash near-duplicate detection (north-star dedup family): 64-bit
token-weighted SimHash per document via an Arrow-batched pandas UDF
(hashlib-md5 bit sampling — deterministic everywhere), then candidate
mining by banding the fingerprint into four 16-bit chunks (documents within
Hamming distance 3 share at least one exact chunk, pigeonhole) and exact
Hamming verification of candidates only.

Not SQL-expressible in DuckDB without the same bit machinery, so the driver
records rows-only checks; tests verify against a pure-Python reference
implementation and pin the banding recall guarantee.

Scale shape: fingerprinting is embarrassingly parallel (one pass, Arrow
batches); candidate generation joins on 4 x 16-bit band keys — the same
bucket-join pattern as MinHash-LSH, no all-pairs stage anywhere.
"""

from __future__ import annotations

import hashlib

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .common import t

HAMMING_THRESHOLD = 3
N_BANDS = 4  # 16 bits each; d <= 3 guarantees >= 1 exact band match


def simhash64(text: str) -> int:
    """64-bit SimHash over whitespace tokens (md5-seeded bit votes)."""
    votes = [0] * 64
    for tok in text.split(" "):
        h = int.from_bytes(hashlib.md5(tok.encode()).digest()[:8], "big")
        for b in range(64):
            votes[b] += 1 if (h >> b) & 1 else -1
    fp = 0
    for b in range(64):
        if votes[b] > 0:
            fp |= 1 << b
    return fp


def _simhash_i64(s: str) -> int:
    """simhash64 two's-complemented into int64 so LongType holds all 64 bits."""
    fp = simhash64(s)
    return fp - (1 << 64) if fp >= (1 << 63) else fp


def _simhash_batch(texts: pd.Series) -> pd.Series:
    """Vectorized SimHash over one Arrow batch: md5 runs once per UNIQUE
    token in the batch; the 64 bit-votes per token occurrence are a numpy
    unpackbits + scatter-add, not a per-token Python loop. Bit-for-bit
    identical to simhash64 (the pure-Python reference pinned in tests)."""
    import numpy as np

    token_lists = [t.split(" ") for t in texts]
    counts = np.array([len(toks) for toks in token_lists])
    if counts.sum() == 0:
        return pd.Series(np.zeros(len(texts), dtype=np.int64))
    doc_idx = np.repeat(np.arange(len(texts)), counts)
    uniq, inv = np.unique(np.concatenate(token_lists), return_inverse=True)
    digests = b"".join(hashlib.md5(tok.encode()).digest()[:8] for tok in uniq)
    h_bytes = np.frombuffer(digests, dtype=np.uint8).reshape(-1, 8)
    # bit b of int.from_bytes(digest[:8], 'big') == little-endian unpack of
    # the byte-reversed digest
    bits = np.unpackbits(h_bytes[:, ::-1], axis=1, bitorder="little")
    signs = bits.astype(np.int64) * 2 - 1  # (n_uniq, 64) of +-1 votes
    if len(texts) * len(uniq) <= 1 << 22:
        # dense (doc x uniq-token) count matrix + one matmul — much faster
        # than scatter-add when the batch vocabulary is modest. Cap at
        # ~32 MB int64 per worker: with 32 concurrent Python workers a
        # larger dense path multiplies into gigabytes of transient memory
        cnt = np.bincount(
            doc_idx * len(uniq) + inv, minlength=len(texts) * len(uniq)
        ).reshape(len(texts), len(uniq))
        votes = cnt @ signs
    else:
        votes = np.zeros((len(texts), 64), dtype=np.int64)
        np.add.at(votes, doc_idx, signs[inv])
    weights = np.left_shift(np.uint64(1), np.arange(64, dtype=np.uint64))
    fp = ((votes > 0).astype(np.uint64) * weights).sum(axis=1, dtype=np.uint64)
    return pd.Series(fp.view(np.int64))


def doc_simhashes(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    n_part = spark.sparkContext.defaultParallelism
    # pandas_udf built lazily: decorating at import time needs a live session
    udf = F.pandas_udf(_simhash_batch, "long")
    return docs.repartition(n_part).select(
        "doc_id", udf(F.col("text")).alias("simhash")
    )


def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs with Hamming(simhash_a, simhash_b) <= 3, found via
    16-bit band buckets + exact verification (bit_count on XOR, JVM-side)."""
    sh = doc_simhashes(spark, sf_dir).cache()
    sh.count()
    bands = sh.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band_idx"),
                        F.shiftrightunsigned(F.col("simhash"), 16 * i)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("band_key"),
                    )
                    for i in range(N_BANDS)
                ]
            )
        ).alias("b"),
    ).select("doc_id", "simhash", F.col("b.band_idx"), F.col("b.band_key"))
    l, r = bands.alias("l"), bands.alias("r")
    cand = (
        l.join(
            r,
            (F.col("l.band_idx") == F.col("r.band_idx"))
            & (F.col("l.band_key") == F.col("r.band_key"))
            & (F.col("l.doc_id") < F.col("r.doc_id")),
        )
        .select(
            F.col("l.doc_id").alias("doc_a"),
            F.col("r.doc_id").alias("doc_b"),
            F.col("l.simhash").alias("sh_a"),
            F.col("r.simhash").alias("sh_b"),
        )
        .distinct()
    )
    return (
        cand.withColumn(
            "hamming", F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
        )
        .filter(F.col("hamming") <= HAMMING_THRESHOLD)
        .select("doc_a", "doc_b", "hamming")
    )


QUERIES: dict[str, tuple] = {
    "dedup_simhash": (dedup_simhash, None),
}
