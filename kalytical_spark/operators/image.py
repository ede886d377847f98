"""Image-shaped multimodal codec: a REAL uncompressed image format (8-bit
palettized BMP, BITMAPINFOHEADER) encoded and decoded from scratch through
the same Arrow ``mapInPandas`` seam the stub image features use
(multimodal.py) — the image twin of the WAV codec in audio.py, closing the
r5 review note that image decode was identity-stub-only.

Payload bytes are treated as 8-bit grayscale pixels of a BMP_WIDTH-wide
image (the torchvision-style decode contract: bytes in, HxW array out).
The encoder emits a spec-conformant file — 14-byte BITMAPFILEHEADER,
40-byte BITMAPINFOHEADER, 256-entry BGRX grayscale palette, and pixel
rows stored BOTTOM-UP with 4-byte row padding (BMP_WIDTH = 30 makes the
stride 32, so the padding path is actually exercised). The parser is an
honest spec walk: magic, declared file size, pixel-data offset, header
fields, palette indirection, row de-padding and vertical flip — it raises
on malformed input rather than guessing. A parser bug (wrong stride, row
order, palette index, offset) changes pixel_sum or flips roundtrip_exact
and fails the value hash.

The DuckDB twin recomputes every output field from the ORIGINAL document
bytes (corpus is pure ASCII, so char codes == payload bytes — the
convention multimodal.py established): geometry and file size are integer
arithmetic over the byte length, pixel_sum is the byte-value sum (the
encoder's zero padding adds nothing), and the roundtrip boolean is the
bounded-oracle TRUE assertion. Real compressed codecs (JPEG/PNG) plug in
at this exact seam as rows-only operators (DEPLOY.md).

Scale: per-asset decode is one numpy reshape — no shuffle at all; the
output is one fixed-width row per asset. At 100 TB this is the
embarrassingly parallel map stage of a media-ingest pipeline.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

BMP_WIDTH = 30  # pixels per row -> stride 32: row padding genuinely exercised
_BMP_HDR = 14 + 40 + 256 * 4  # file header + info header + grayscale palette


def _encode_bmp(arr_u8: np.ndarray, width: int = BMP_WIDTH) -> bytes:
    """Pack unsigned-8 samples as an 8-bit palettized BMP (grayscale
    identity palette, bottom-up rows, 4-byte-aligned stride); the last row
    zero-pads to width, padding columns zero-pad each row to stride."""
    n = len(arr_u8)
    height = max(1, -(-n // width))
    stride = (width + 3) // 4 * 4
    px = np.zeros(height * width, dtype=np.uint8)
    px[:n] = arr_u8
    rows = px.reshape(height, width)
    padded = np.zeros((height, stride), dtype=np.uint8)
    padded[:, :width] = rows
    pixels = padded[::-1].tobytes()  # bottom-up storage
    file_size = _BMP_HDR + len(pixels)
    file_hdr = struct.pack("<2sIHHI", b"BM", file_size, 0, 0, _BMP_HDR)
    info_hdr = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 8, 0, len(pixels), 2835, 2835, 256, 0
    )
    palette = bytes(bytearray(v for g in range(256) for v in (g, g, g, 0)))
    return file_hdr + info_hdr + palette + pixels


def _parse_bmp(buf: bytes) -> tuple[int, int, int, np.ndarray]:
    """Honest BMP walk: validate magic/size/offset, parse BITMAPINFOHEADER,
    read the palette, de-pad and flip the bottom-up rows, resolve palette
    indices to gray values. Returns (width, height, stride, pixels HxW)."""
    if len(buf) < 14 + 40 or buf[:2] != b"BM":
        raise ValueError("not a BMP file")
    _magic, file_size, _r1, _r2, off_bits = struct.unpack("<2sIHHI", buf[:14])
    if file_size != len(buf):
        raise ValueError("declared size mismatch")
    (hdr_size, width, height, planes, bpp, compression, _img_size, _xp, _yp,
     clr_used, _clr_imp) = struct.unpack("<IiiHHIIiiII", buf[14:54])
    if hdr_size != 40 or planes != 1 or bpp != 8 or compression != 0:
        raise ValueError(f"unsupported BMP variant {hdr_size}/{bpp}/{compression}")
    if height <= 0 or width <= 0:
        raise ValueError("top-down or degenerate bitmap unsupported")
    n_colors = clr_used or 256
    pal_raw = np.frombuffer(buf[54 : 54 + n_colors * 4], dtype=np.uint8).reshape(-1, 4)
    if off_bits != 54 + n_colors * 4:
        raise ValueError("unexpected pixel-data offset")
    stride = (width + 3) // 4 * 4
    data = np.frombuffer(buf[off_bits : off_bits + stride * height], dtype=np.uint8)
    if len(data) != stride * height:
        raise ValueError("truncated pixel data")
    idx = data.reshape(height, stride)[::-1, :width]  # flip + de-pad
    gray = pal_raw[:, 1]  # G channel of the BGRX palette (identity here)
    return width, height, stride, gray[idx]


_BMP_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("row_stride", T.IntegerType()),
        T.StructField("file_bytes", T.LongType()),
        T.StructField("pixel_sum", T.LongType()),
        T.StructField("roundtrip_exact", T.BooleanType()),
    ]
)


def _bmp_roundtrip(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        out: list[dict] = []
        for row in pdf.itertuples(index=False):
            src = np.frombuffer(bytes(row.payload), dtype=np.uint8)
            bmp = _encode_bmp(src)
            width, height, stride, pixels = _parse_bmp(bmp)
            flat = pixels.reshape(-1)
            exact = bool(
                np.array_equal(flat[: len(src)], src) and not flat[len(src) :].any()
            )
            out.append(
                {
                    "doc_id": row.doc_id,
                    "width": width,
                    "height": height,
                    "row_stride": stride,
                    "file_bytes": len(bmp),
                    "pixel_sum": int(flat.sum(dtype=np.int64)),
                    "roundtrip_exact": exact,
                }
            )
        yield pd.DataFrame(out, columns=[f.name for f in _BMP_SCHEMA.fields])


def mm_image_bmp_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Encode each payload as a real 8-bit palettized BMP, decode it with
    the from-scratch parser, and report geometry + pixel checksum. The
    DuckDB twin recomputes every field from the original bytes — equality
    proves the full encode->parse->palette->de-pad->flip chain."""
    from .audio import _payloads

    return _payloads(spark, sf_dir).mapInPandas(_bmp_roundtrip, schema=_BMP_SCHEMA)


ORACLE_BMP_ROUNDTRIP = f"""
SELECT d.doc_id,
       CAST({BMP_WIDTH} AS INTEGER) AS width,
       CAST(GREATEST(1, CAST(CEIL(octet_length(encode(d.text)) / {BMP_WIDTH}.0) AS BIGINT)) AS INTEGER) AS height,
       CAST({(BMP_WIDTH + 3) // 4 * 4} AS INTEGER) AS row_stride,
       CAST({_BMP_HDR} + GREATEST(1, CAST(CEIL(octet_length(encode(d.text)) / {BMP_WIDTH}.0) AS BIGINT)) * {(BMP_WIDTH + 3) // 4 * 4} AS BIGINT) AS file_bytes,
       CAST(COALESCE(p.s, 0) AS BIGINT) AS pixel_sum,
       TRUE AS roundtrip_exact
FROM documents d
LEFT JOIN (
  SELECT doc_id, SUM(CAST(ascii(substring(d2.text, s.i, 1)) AS BIGINT)) AS s
  FROM (SELECT doc_id,
               unnest(generate_series(1, octet_length(encode(text)))) AS i
        FROM documents) s
  JOIN documents d2 USING (doc_id)
  GROUP BY 1
) p ON d.doc_id = p.doc_id
"""


QUERIES: dict[str, tuple] = {
    "mm_image_bmp_roundtrip": (mm_image_bmp_roundtrip, ORACLE_BMP_ROUNDTRIP),
}
