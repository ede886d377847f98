"""Multimodal-column plumbing (north star): image/audio/video payloads are
opaque BINARY columns with typed metadata. The container has no media
libraries, so the actual decode is stubbed behind a deterministic fake
(clearly marked below) — but the Spark-side machinery is real and tested:
binary schema, Arrow-batched mapInPandas with controlled batch size, typed
feature StructType output, and partition-aware processing.

At scale: payload columns are read lazily (Parquet column pruning keeps
metadata-only queries from touching the bytes); decode runs partition-local
with spark.sql.execution.arrow.maxRecordsPerBatch bounding executor memory;
feature extraction emits a narrow typed schema so downstream joins never
reshuffle blobs.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .common import banded_candidate_pairs, t


def _with_payload(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Derive an opaque binary payload column from the documents table (the
    testdata carries no real media; the bytes stand in for encoded frames).

    spread: every audio/image/video decode pass (mapInPandas) consumes
    this frame, and a small media file scans as ONE partition — the whole
    multimodal family was decoding on a single Python worker (guide §2.5;
    measured 3.7/4.4 -> 0.6 s on the RLE roundtrip/stats at sf0.1). At
    cluster scale the scan already has >= cores splits and this is a
    no-op, so payload bytes are never shuffled on a real corpus."""
    from .common import spread

    docs = t(spark, sf_dir, "documents")
    return spread(
        spark,
        docs.select(
            "doc_id",
            "source",
            F.col("text").cast("binary").alias("payload"),
            F.lit("application/octet-stream").alias("mime_type"),
        ),
    )


def mm_binary_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-only scan over binary payloads: sizes and content hashes per
    source — never decodes, and at scale never even materializes the blob
    beyond the projected columns."""
    payloads = _with_payload(spark, sf_dir)
    return payloads.groupBy("source").agg(
        F.count("*").alias("n_assets"),
        F.sum(F.length("payload")).alias("total_bytes"),
        F.min(F.length("payload")).cast("bigint").alias("min_bytes"),
        F.max(F.length("payload")).cast("bigint").alias("max_bytes"),
        F.countDistinct(F.sha2("payload", 256)).alias("n_distinct_hashes"),
    )


ORACLE_BINARY_STATS = """
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_assets,
       CAST(SUM(octet_length(encode(text))) AS BIGINT) AS total_bytes,
       CAST(MIN(octet_length(encode(text))) AS BIGINT) AS min_bytes,
       CAST(MAX(octet_length(encode(text))) AS BIGINT) AS max_bytes,
       CAST(COUNT(DISTINCT sha256(text)) AS BIGINT) AS n_distinct_hashes
FROM documents
GROUP BY source
"""


_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("content_hash", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("feature_norm", T.DoubleType()),
    ]
)


def _decode_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """STUB DECODER: a real deployment would decode image/audio bytes here
    (PIL/librosa/ffmpeg are not in this container). This deterministic fake
    derives pseudo-dimensions and a pseudo-feature from the payload hash so
    the full Arrow batch path, schema contract, and partition behavior are
    exercised end-to-end."""
    for pdf in batches:
        out = {
            "doc_id": pdf["doc_id"],
            "source": pdf["source"],
            "n_bytes": pdf["payload"].map(len).astype("int64"),
        }
        hashes = pdf["payload"].map(lambda b: hashlib.sha256(bytes(b)).hexdigest())
        out["content_hash"] = hashes
        out["width"] = hashes.map(lambda h: 64 + int(h[:4], 16) % 1984).astype("int32")
        out["height"] = hashes.map(lambda h: 64 + int(h[4:8], 16) % 1984).astype("int32")
        out["n_frames"] = hashes.map(lambda h: 1 + int(h[8:10], 16) % 64).astype("int32")
        # floor-quantized to 1e-6: exact integer floor then one IEEE
        # division — identical in any engine (python round() would use
        # banker's rounding, which SQL ROUND does not)
        out["feature_norm"] = hashes.map(
            lambda h: (int(h[10:18], 16) * 10**6 // 0xFFFFFFFF) / 1e6
        )
        yield pd.DataFrame(out)


# --- Pluggable decoder registry (the real-deployment seam) -----------------
#
# A deployment with media libraries registers its decoder here
# (register_decoder("pil", fn)) and selects it per query; the default
# "stub" keeps the oracle-proven hash-arithmetic path. A registered
# decoder sees (payload_bytes, mime_type) and returns (width, height,
# n_frames, feature_norm); it is pickled to executors, so it must live in
# a module importable there (pickled by reference) or be a closure
# (cloudpickle ships those by value). A real decoder's output is not
# SQL-recomputable, so
# non-stub runs are rows-only — the stub twin remains the CORRECTNESS
# proof of the surrounding Arrow plumbing. Seam doc: DEPLOY.md.
DECODERS: dict = {}


def register_decoder(name: str, fn) -> None:
    """Register fn(payload: bytes, mime_type: str) -> (width, height,
    n_frames, feature_norm) under ``name`` for mm_decode_features."""
    DECODERS[name] = fn


def _stub_decode(payload: bytes, mime_type: str) -> tuple[int, int, int, float]:
    """Per-row form of the stub decoder — same hash arithmetic as
    _decode_batch (pinned equal in tests), usable as a registry entry."""
    h = hashlib.sha256(payload).hexdigest()
    return (
        64 + int(h[:4], 16) % 1984,
        64 + int(h[4:8], 16) % 1984,
        1 + int(h[8:10], 16) % 64,
        (int(h[10:18], 16) * 10**6 // 0xFFFFFFFF) / 1e6,
    )


register_decoder("stub", _stub_decode)


def mm_decode_features(
    spark: SparkSession, sf_dir: str, decoder: str = "stub"
) -> DataFrame:
    """Decode/feature-extract over binary payloads via Arrow-batched
    mapInPandas. Oracle-backed DESPITE the Python path: the default stub
    decoder is pure hash arithmetic, so the DuckDB twin re-derives every
    field from sha256 hex nibbles — the value-hash gate then proves the
    Arrow batch plumbing byte-identical to the declarative reference.

    ``decoder`` selects a registered decoder (register_decoder); non-stub
    decoders run the same plumbing with real (non-SQL-recomputable) decode
    and are rows-only by nature. Unknown names raise at plan time, on the
    driver, not per-task."""
    payloads = _with_payload(spark, sf_dir)
    if decoder == "stub":
        # vectorized stub path (hash series math) — the benched default
        return payloads.mapInPandas(_decode_batch, schema=_FEATURE_SCHEMA)
    if decoder not in DECODERS:
        raise KeyError(
            f"unknown decoder {decoder!r}; registered: {sorted(DECODERS)}"
        )
    fn = DECODERS[decoder]

    def _decode_via_registry(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                payload = bytes(r.payload)
                width, height, n_frames, feature_norm = fn(payload, r.mime_type)
                rows.append(
                    {
                        "doc_id": r.doc_id,
                        "source": r.source,
                        "n_bytes": len(payload),
                        "content_hash": hashlib.sha256(payload).hexdigest(),
                        "width": width,
                        "height": height,
                        "n_frames": n_frames,
                        "feature_norm": feature_norm,
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in _FEATURE_SCHEMA.fields])

    return payloads.mapInPandas(_decode_via_registry, schema=_FEATURE_SCHEMA)


def _hexval(col: str, off: int, n: int) -> str:
    """SQL for int(h[off:off+n], 16) over the sha256 hex string (0-based
    off, like the python slice in _decode_batch)."""
    terms = []
    for k in range(n):
        terms.append(
            f"(strpos('0123456789abcdef', substring({col}, {off + k + 1}, 1)) - 1)"
            + (f" * {16 ** (n - 1 - k)}" if k < n - 1 else "")
        )
    return "(" + " + ".join(terms) + ")"


_SQL_DECODE = f"""
  SELECT doc_id, source,
         CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
         sha256(text) AS content_hash,
         CAST(64 + {_hexval('sha256(text)', 0, 4)} % 1984 AS INTEGER) AS width,
         CAST(64 + {_hexval('sha256(text)', 4, 4)} % 1984 AS INTEGER) AS height,
         CAST(1 + {_hexval('sha256(text)', 8, 2)} % 64 AS INTEGER) AS n_frames,
         CAST(CAST({_hexval('sha256(text)', 10, 8)} * 1000000 // 4294967295
                   AS BIGINT) AS DOUBLE) / 1000000.0 AS feature_norm
  FROM documents
"""

ORACLE_DECODE = _SQL_DECODE


def mm_feature_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Post-decode analytics: the narrow feature frame aggregates without
    ever reshuffling payload bytes."""
    feats = mm_decode_features(spark, sf_dir)
    return feats.groupBy("source").agg(
        F.count("*").alias("n_assets"),
        F.sum(F.col("width").cast("bigint") * F.col("height").cast("bigint")).alias(
            "total_pixels"
        ),
        F.sum("n_frames").alias("total_frames"),
        F.min("feature_norm").alias("min_feature_norm"),
        F.max("feature_norm").alias("max_feature_norm"),
    )


ORACLE_FEATURE_ROLLUP = f"""
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_assets,
       CAST(SUM(CAST(width AS BIGINT) * CAST(height AS BIGINT)) AS BIGINT)
         AS total_pixels,
       CAST(SUM(n_frames) AS BIGINT) AS total_frames,
       MIN(feature_norm) AS min_feature_norm,
       MAX(feature_norm) AS max_feature_norm
FROM ({_SQL_DECODE})
GROUP BY 1
"""


_FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_bytes", T.BinaryType()),
        T.StructField("target_w", T.IntegerType()),
        T.StructField("target_h", T.IntegerType()),
    ]
)

SAMPLE_EVERY_N = 8
RESIZE_TO = (224, 224)


def _sample_frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """STUB FRAME SAMPLER/RESIZER: a real deployment decodes video bytes and
    emits every Nth frame resized to RESIZE_TO (ffmpeg/PIL absent in this
    container). The fake slices the payload into fixed-size 'frames' so the
    one-to-many Arrow batch contract (one asset row -> many frame rows) and
    the byte-column handling are exercised for real."""
    for pdf in batches:
        out: list[dict] = []
        for row in pdf.itertuples(index=False):
            payload = bytes(row.payload)
            chunk = 64
            n_frames = max(1, len(payload) // chunk)
            for idx in range(0, n_frames, SAMPLE_EVERY_N):
                out.append(
                    {
                        "doc_id": row.doc_id,
                        "frame_idx": idx,
                        "frame_bytes": payload[idx * chunk : (idx + 1) * chunk],
                        "target_w": RESIZE_TO[0],
                        "target_h": RESIZE_TO[1],
                    }
                )
        yield pd.DataFrame(out, columns=[f.name for f in _FRAME_SCHEMA.fields])


def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling over video-shaped binary payloads: one asset row fans
    out to every-Nth-frame rows via mapInPandas. Oracle-backed like the
    decode stub: the fake 'frames' are byte slices, so the SQL twin emits
    the identical slices via substring arithmetic — proving the one-to-many
    Arrow fan-out byte-identical (a real ffmpeg sampler would be rows-only).
    The Arrow plumbing carries the raw BINARY frame; the query output
    projects it to hex so the comparison frame is string-typed (raw BLOBs
    are unhashable in the driver's pandas canonicalization)."""
    payloads = _with_payload(spark, sf_dir)
    frames = payloads.mapInPandas(_sample_frames, schema=_FRAME_SCHEMA)
    return frames.select(
        "doc_id",
        "frame_idx",
        F.hex(F.col("frame_bytes")).alias("frame_hex"),
        "target_w",
        "target_h",
    )


# NOTE: DuckDB substring() has no BLOB overload; char slicing stands in for
# byte slicing, which is exact here because the synthetic corpus is pure
# ASCII (verified: octet_length == length for every doc at every sf).
ORACLE_FRAME_SAMPLE = f"""
SELECT doc_id,
       CAST(idx AS INTEGER) AS frame_idx,
       hex(encode(substring(text, idx * 64 + 1, 64))) AS frame_hex,
       CAST({RESIZE_TO[0]} AS INTEGER) AS target_w,
       CAST({RESIZE_TO[1]} AS INTEGER) AS target_h
FROM (
  SELECT doc_id, text,
         unnest(generate_series(
           0, GREATEST(octet_length(encode(text)) // 64, 1) - 1,
           {SAMPLE_EVERY_N})) AS idx
  FROM documents
)
"""


PHASH_BANDS = 4
PHASH_BITS_PER_BAND = 16  # 4 x 16 = 64: hamming<=3 pairs always collide
PHASH_HAMMING_MAX = 3
# every 50th asset re-ingested with one corrupted byte (re-keyed +200000):
# the re-crawl / re-encode scenario a media dedup exists for — guarantees
# the miner has true positives (same non-vacuous pattern as dedup_exact)
PHASH_PLANT_STRIDE = 50
PHASH_PLANT_OFFSET = 4 << 40


def _ahash_codes(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """64-bit average-hash per payload: mean byte value of 64 equal slices,
    bit b = slice_mean(b) > global_mean. This is the byte-level analog of
    the image aHash (a real deployment would decode pixels first); crucially
    it is LOCALITY-PRESERVING — a few corrupted bytes flip at most a few
    bits — which is what makes the banding non-vacuous. Emits the four
    16-bit band keys so candidate generation and hamming verification stay
    JVM-side."""
    import numpy as np

    for pdf in batches:
        out = {"doc_id": pdf["doc_id"]}
        codes = np.zeros((len(pdf), 64), dtype=bool)
        for i, b in enumerate(pdf["payload"]):
            arr = np.frombuffer(bytes(b), dtype=np.uint8)
            L = max(1, -(-len(arr) // 64))  # ceil
            padded = np.zeros(L * 64, dtype=np.int64)
            padded[: len(arr)] = arr
            # slice_mean(b) > grand_mean, cross-multiplied into exact
            # integers (64 * S_b > sum S) — no float means, so near-tie
            # bits are stable and the SQL twin can reproduce them exactly
            sums = padded.reshape(64, L).sum(axis=1)
            codes[i] = 64 * sums > sums.sum()
        w = 1 << np.arange(PHASH_BITS_PER_BAND, dtype=np.int64)
        for band in range(PHASH_BANDS):
            seg = codes[:, band * PHASH_BITS_PER_BAND : (band + 1) * PHASH_BITS_PER_BAND]
            out[f"band{band}"] = (seg * w).sum(axis=1).astype("int32")
        yield pd.DataFrame(out)


def mm_phash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate binary assets via perceptual-hash banding: aHash codes
    per payload (Arrow batches), band-bucket candidate pairs (pigeonhole:
    hamming<=3 over 64 bits guarantees a 16-bit band match), exact hamming
    verification with JVM bit_count on the band XORs. No all-pairs stage;
    the planted corrupted re-ingests must always surface (pinned in tests).

    Oracle-backed: the integer aHash vote (64*S_b > sum S) and ASCII byte
    values make the whole miner SQL-expressible (_sql_phash), so the
    driver value-hash gate covers it alongside the numpy differential."""
    payloads = _with_payload(spark, sf_dir)
    plant = (
        payloads.filter(F.col("doc_id") % PHASH_PLANT_STRIDE == 0)
        .withColumn("doc_id", F.col("doc_id") + PHASH_PLANT_OFFSET)
        .withColumn(
            "payload",
            F.concat(F.lit(b"X"), F.expr("substring(payload, 2, length(payload))")),
        )
    )
    corpus = payloads.unionByName(plant)
    n_part = spark.sparkContext.defaultParallelism
    band_fields = ", ".join(f"band{b} int" for b in range(PHASH_BANDS))
    sketched = (
        corpus.repartition(n_part)
        .mapInPandas(_ahash_codes, schema=f"doc_id long, {band_fields}")
        .cache()
    )
    sketched.count()
    pairs = banded_candidate_pairs(
        sketched, "doc_id", PHASH_BANDS, carry_bands=True
    )
    hamming = sum(
        F.bit_count(
            F.col(f"l_band{b}").bitwiseXOR(F.col(f"r_band{b}")).cast("long")
        )
        for b in range(PHASH_BANDS)
    )
    return pairs.select(
        F.col("id_a").alias("doc_a"),
        F.col("id_b").alias("doc_b"),
        hamming.cast("int").alias("hamming"),
    ).filter(F.col("hamming") <= PHASH_HAMMING_MAX)


def _sql_phash() -> str:
    """DuckDB twin of the aHash miner: byte values via ascii() over the
    ASCII corpus, slice sums grouped by (i-1)//L, the cross-multiplied
    integer vote 64*S_b > sum(S), band keys as shifted bit sums, the same
    band-bucket candidate join, and xor+bit_count Hamming verification."""
    band_defs = ",\n         ".join(
        f"CAST(SUM(CASE WHEN b // 16 = {k} THEN bit * (1 << (b % 16)) "
        f"ELSE 0 END) AS INTEGER) AS band{k}"
        for k in range(PHASH_BANDS)
    )
    band_union = "\n  UNION ALL\n".join(
        f"  SELECT doc_id, {k} AS band_idx, band{k} AS band_key FROM bands"
        for k in range(PHASH_BANDS)
    )
    ham = " + ".join(
        f"bit_count(xor(a.band{k}, b.band{k}))" for k in range(PHASH_BANDS)
    )
    return f"""WITH corpus AS (
  SELECT doc_id, text AS payload FROM documents
  UNION ALL
  SELECT doc_id + {PHASH_PLANT_OFFSET}, 'X' || substring(text, 2)
  FROM documents WHERE doc_id % {PHASH_PLANT_STRIDE} = 0
), vals AS (
  SELECT doc_id,
         unnest(generate_series(1, length(payload))) AS i,
         GREATEST((length(payload) + 63) // 64, 1) AS L,
         payload
  FROM corpus
), slice_sums AS (
  SELECT doc_id, (i - 1) // L AS b,
         SUM(ascii(substring(payload, i, 1))) AS s
  FROM vals GROUP BY 1, 2
), totals AS (
  SELECT doc_id, SUM(s) AS tot FROM slice_sums GROUP BY 1
), grid AS (
  SELECT c.doc_id, unnest(generate_series(0, 63)) AS b FROM corpus c
), bits AS (
  SELECT g.doc_id, g.b,
         CASE WHEN 64 * COALESCE(ss.s, 0) > COALESCE(t.tot, 0)
              THEN 1 ELSE 0 END AS bit
  FROM grid g
  LEFT JOIN slice_sums ss ON g.doc_id = ss.doc_id AND g.b = ss.b
  LEFT JOIN totals t ON g.doc_id = t.doc_id
), bands AS (
  SELECT doc_id,
         {band_defs}
  FROM bits GROUP BY doc_id
), long AS (
{band_union}
), cand AS (
  SELECT DISTINCT l.doc_id AS doc_a, r.doc_id AS doc_b
  FROM long l JOIN long r
    ON l.band_idx = r.band_idx AND l.band_key = r.band_key
   AND l.doc_id < r.doc_id
)
SELECT c.doc_a, c.doc_b, CAST({ham} AS INTEGER) AS hamming
FROM cand c
JOIN bands a ON c.doc_a = a.doc_id
JOIN bands b ON c.doc_b = b.doc_id
WHERE {ham} <= {PHASH_HAMMING_MAX}
"""


ORACLE_PHASH = _sql_phash()


_CHUNK_BYTES = 256


def mm_chunk_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chunk-plan manifest for binary assets: one row per fixed-size byte
    range (offset, length) a downstream decode fleet would fetch — the
    distributed work-list builder for processing 100 TB of media without
    any worker ever holding a whole asset. Pure metadata arithmetic: the
    payload bytes are never shuffled, only lengths; the explode fans each
    asset into ceil(n_bytes / chunk) bounded rows."""
    payloads = _with_payload(spark, sf_dir)
    sized = payloads.select(
        "doc_id", "source", F.length("payload").cast("bigint").alias("n_bytes")
    )
    n_chunks = F.ceil(F.col("n_bytes") / _CHUNK_BYTES).cast("bigint")
    return (
        sized.select(
            "doc_id",
            "source",
            "n_bytes",
            F.explode(
                F.sequence(F.lit(0).cast("bigint"), n_chunks - 1)
            ).alias("chunk_idx"),
        )
        .select(
            "doc_id",
            "source",
            "chunk_idx",
            (F.col("chunk_idx") * _CHUNK_BYTES).cast("bigint").alias("offset"),
            F.least(
                F.lit(_CHUNK_BYTES).cast("bigint"),
                F.col("n_bytes") - F.col("chunk_idx") * _CHUNK_BYTES,
            ).alias("length"),
        )
    )


ORACLE_CHUNK_MANIFEST = f"""
WITH sized AS (
  SELECT doc_id, source,
         CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
  FROM documents
), fanned AS (
  SELECT doc_id, source, n_bytes,
         unnest(generate_series(0,
             CAST(ceil(n_bytes / {_CHUNK_BYTES}.0) AS BIGINT) - 1)) AS chunk_idx
  FROM sized
)
SELECT doc_id, source, chunk_idx,
       CAST(chunk_idx * {_CHUNK_BYTES} AS BIGINT) AS offset,
       CAST(least({_CHUNK_BYTES}, n_bytes - chunk_idx * {_CHUNK_BYTES})
            AS BIGINT) AS length
FROM fanned
"""


QUERIES: dict[str, tuple] = {
    "mm_binary_stats": (mm_binary_stats, ORACLE_BINARY_STATS),
    "mm_chunk_manifest": (mm_chunk_manifest, ORACLE_CHUNK_MANIFEST),
    "mm_decode_features": (mm_decode_features, ORACLE_DECODE),
    "mm_feature_rollup": (mm_feature_rollup, ORACLE_FEATURE_ROLLUP),
    "mm_frame_sample": (mm_frame_sample, ORACLE_FRAME_SAMPLE),
    "mm_phash_neardup": (mm_phash_neardup, ORACLE_PHASH),
}
