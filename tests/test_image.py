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
