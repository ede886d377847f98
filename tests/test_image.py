"""BMP codec: honest-parse behavior, byte-exact roundtrip on arbitrary
payloads (hypothesis), and malformed-input rejection — the image twin of
the WAV codec tests."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from kalytical_spark.operators import image


def test_bmp_codec_honest_parse():
    src = np.arange(97, dtype=np.int64).astype(np.uint8)
    bmp = image._encode_bmp(src)
    assert bmp[:2] == b"BM"
    width, height, stride, pixels = image._parse_bmp(bmp)
    assert (width, height, stride) == (image.BMP_WIDTH, 4, 32)
    flat = pixels.reshape(-1)
    assert np.array_equal(flat[: len(src)], src)
    assert not flat[len(src) :].any()


@settings(max_examples=60, deadline=None)
@given(payload=st.binary(min_size=0, max_size=400))
def test_bmp_roundtrip_arbitrary_bytes(payload):
    src = np.frombuffer(payload, dtype=np.uint8)
    width, height, stride, pixels = image._parse_bmp(image._encode_bmp(src))
    flat = pixels.reshape(-1)
    assert np.array_equal(flat[: len(src)], src)
    assert not flat[len(src) :].any()
    assert height == max(1, -(-len(src) // image.BMP_WIDTH))
    assert stride % 4 == 0 and stride >= width


def test_bmp_rejects_malformed():
    good = image._encode_bmp(np.array([1, 2, 3], dtype=np.uint8))
    with pytest.raises(ValueError):
        image._parse_bmp(b"XXjunk")
    with pytest.raises(ValueError):
        image._parse_bmp(good[:-3])  # declared size mismatch
    # unsupported variant: flip bpp field to 24
    bad = bytearray(good)
    bad[28] = 24
    with pytest.raises(ValueError):
        image._parse_bmp(bytes(bad))


# --- BI_RLE8: real compression, exact decode -------------------------------


def test_rle8_codec_honest_parse_and_split():
    # a run longer than 255 must split at the count ceiling: 300 equal
    # bytes inside one row -> pairs of 255 + 45
    src = np.full(300, 7, dtype=np.uint8)
    bmp = image._encode_bmp_rle8(src)
    width, height, rle_bytes, pixels = image._parse_bmp_rle8(bmp)
    assert (width, height) == (image.RLE_WIDTH, 1)
    flat = pixels.reshape(-1)
    assert np.array_equal(flat[:300], src) and not flat[300:].any()
    # stream = (255,7)(45,7) + zero-pad run (212,0) + EOB = 3 pairs + EOB
    assert rle_bytes == 2 * 3 + 2 * 1


def test_rle8_compresses_runs():
    # genuinely compressed: a runny payload's stream is far smaller than
    # the pixel grid (identity encodings can't pass this)
    src = np.repeat(np.arange(16, dtype=np.uint8), 64)  # 1024 px, 16 runs
    bmp = image._encode_bmp_rle8(src)
    _, height, rle_bytes, _ = image._parse_bmp_rle8(bmp)
    assert rle_bytes < height * image.RLE_WIDTH / 10


@settings(max_examples=60, deadline=None)
@given(payload=st.binary(min_size=0, max_size=1200))
def test_rle8_roundtrip_arbitrary_bytes(payload):
    src = np.frombuffer(payload, dtype=np.uint8)
    width, height, rle_bytes, pixels = image._parse_bmp_rle8(
        image._encode_bmp_rle8(src)
    )
    flat = pixels.reshape(-1)
    assert np.array_equal(flat[: len(src)], src)
    assert not flat[len(src) :].any()
    assert height == max(1, -(-len(src) // image.RLE_WIDTH))
    # the whole stream is 2-byte tokens: runs + one EOL per row but the
    # last + EOB
    assert rle_bytes % 2 == 0 and rle_bytes >= 2 * height


def test_rle8_decodes_absolute_and_delta_modes():
    # hand-built stream using what the encoder never emits: absolute mode
    # (00 03 a b c + pad) then a delta skip (00 02 dx dy) then EOB —
    # decoder must execute both per spec
    w = image.RLE_WIDTH
    stream = bytes([0, 3, 9, 8, 7, 0,  # absolute: 3 literals + pad byte
                    0, 2, 5, 0,        # delta: skip 5 px on this row
                    2, 4,              # encoded run: 2 x 4
                    0, 1])             # EOB
    hdr = image._encode_bmp_rle8(np.zeros(1, dtype=np.uint8))[: image._RLE_HDR]
    import struct as _s
    file_hdr = _s.pack("<2sIHHI", b"BM", image._RLE_HDR + len(stream), 0, 0,
                       image._RLE_HDR)
    info_hdr = _s.pack("<IiiHHIIiiII", 40, w, 1, 1, 8, 1, len(stream),
                       2835, 2835, 256, 0)
    buf = file_hdr + info_hdr + hdr[54:image._RLE_HDR] + stream
    width, height, rle_bytes, pixels = image._parse_bmp_rle8(buf)
    row = pixels.reshape(-1)
    assert list(row[:3]) == [9, 8, 7]          # absolute literals
    assert not row[3:8].any()                  # delta-skipped px are zero
    assert list(row[8:10]) == [4, 4]           # encoded run after the skip
    assert not row[10:].any()


def test_rle8_accepts_trailing_eol_before_eob():
    # spec-conformant third-party streams may end the FINAL row with an
    # EOL escape before EOB (positioning x=0 past-the-end); the decoder
    # must accept it — but a DRAWING op after that EOL is malformed
    import struct as _s
    w = image.RLE_WIDTH
    stream = bytes([2, 7,      # encoded run: 2 x 7 on the only row
                    0, 0,      # EOL on the last row (legal)
                    0, 1])     # EOB
    pal = image._encode_bmp_rle8(np.zeros(1, dtype=np.uint8))[54: image._RLE_HDR]
    file_hdr = _s.pack("<2sIHHI", b"BM", image._RLE_HDR + len(stream), 0, 0,
                       image._RLE_HDR)
    info_hdr = _s.pack("<IiiHHIIiiII", 40, w, 1, 1, 8, 1, len(stream),
                       2835, 2835, 256, 0)
    width, height, rle_bytes, pixels = image._parse_bmp_rle8(
        file_hdr + info_hdr + pal + stream
    )
    assert (width, height) == (w, 1)
    assert list(pixels.reshape(-1)[:2]) == [7, 7]
    # drawing past the trailing EOL must still raise
    bad = bytes([2, 7, 0, 0, 1, 9, 0, 1])
    bad_hdr = _s.pack("<2sIHHI", b"BM", image._RLE_HDR + len(bad), 0, 0,
                      image._RLE_HDR)
    bad_info = _s.pack("<IiiHHIIiiII", 40, w, 1, 1, 8, 1, len(bad),
                       2835, 2835, 256, 0)
    with pytest.raises(ValueError, match="overruns"):
        image._parse_bmp_rle8(bad_hdr + bad_info + pal + bad)
    # and a SECOND EOL past the end must raise too
    bad2 = bytes([2, 7, 0, 0, 0, 0, 0, 1])
    bad2_hdr = _s.pack("<2sIHHI", b"BM", image._RLE_HDR + len(bad2), 0, 0,
                       image._RLE_HDR)
    bad2_info = _s.pack("<IiiHHIIiiII", 40, w, 1, 1, 8, 1, len(bad2),
                        2835, 2835, 256, 0)
    with pytest.raises(ValueError, match="EOL past"):
        image._parse_bmp_rle8(bad2_hdr + bad2_info + pal + bad2)


def test_rle8_rejects_malformed():
    good = image._encode_bmp_rle8(np.array([1, 1, 2], dtype=np.uint8))
    with pytest.raises(ValueError):
        image._parse_bmp_rle8(good[:-3])  # declared size mismatch
    # uncompressed bitmap fed to the RLE parser
    flat = image._encode_bmp(np.array([1, 2, 3], dtype=np.uint8))
    with pytest.raises(ValueError):
        image._parse_bmp_rle8(flat)
    # truncate the stream: strip EOB but keep headers consistent
    import struct as _s
    no_eob = bytearray(good[:-2])
    _s.pack_into("<I", no_eob, 2, len(no_eob))          # file size
    _s.pack_into("<I", no_eob, 14 + 20, good[14 + 20] - 2)  # biSizeImage
    with pytest.raises(ValueError, match="end-of-bitmap|truncated"):
        image._parse_bmp_rle8(bytes(no_eob))
    # a run that overruns its row
    w = image.RLE_WIDTH
    bad_stream = bytes([255, 1] * ((w // 255) + 1) + [0, 1])
    hdr14 = _s.pack("<2sIHHI", b"BM", image._RLE_HDR + len(bad_stream), 0, 0,
                    image._RLE_HDR)
    info = _s.pack("<IiiHHIIiiII", 40, w, 1, 1, 8, 1, len(bad_stream),
                   2835, 2835, 256, 0)
    pal = good[54:image._RLE_HDR]
    with pytest.raises(ValueError, match="overruns"):
        image._parse_bmp_rle8(hdr14 + info + pal + bad_stream)
