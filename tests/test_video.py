"""AVI codec: honest nested-chunk parse, idx1 cross-check, byte-exact
roundtrip on arbitrary payloads (hypothesis), and malformed-input
rejection — the video leg of the multimodal codec trio (WAV, BMP, AVI)."""

from __future__ import annotations

import struct

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from kalytical_spark.operators import video


def test_avi_codec_honest_parse():
    src = np.arange(300, dtype=np.int64).astype(np.uint8)  # 2 frames (256+44)
    avi = video._encode_avi(src)
    assert avi[:4] == b"RIFF" and avi[8:12] == b"AVI "
    w, h, us_pf, n_frames, frames, index_ok = video._parse_avi(avi)
    assert (w, h, us_pf, n_frames) == (
        video.FRAME_W,
        video.FRAME_H,
        video.US_PER_FRAME,
        2,
    )
    assert index_ok
    decoded = np.frombuffer(b"".join(frames), dtype=np.uint8)
    assert np.array_equal(decoded[: len(src)], src)
    assert not decoded[len(src) :].any()


@settings(max_examples=60, deadline=None)
@given(payload=st.binary(min_size=0, max_size=1200))
def test_avi_roundtrip_arbitrary_bytes(payload):
    src = np.frombuffer(payload, dtype=np.uint8)
    w, h, _us, n_frames, frames, index_ok = video._parse_avi(
        video._encode_avi(src)
    )
    assert (w, h) == (video.FRAME_W, video.FRAME_H)
    assert n_frames == -(-len(src) // video.FRAME_BYTES)
    assert index_ok
    decoded = (
        np.frombuffer(b"".join(frames), dtype=np.uint8)
        if frames
        else np.empty(0, dtype=np.uint8)
    )
    assert np.array_equal(decoded[: len(src)], src)
    assert not decoded[len(src) :].any()


def test_avi_rejects_malformed():
    good = video._encode_avi(np.array([1, 2, 3], dtype=np.uint8))
    with pytest.raises(ValueError):
        video._parse_avi(b"RIFFjunkWAVE")
    with pytest.raises(ValueError):
        video._parse_avi(good[:-5])  # truncated RIFF payload
    # unsupported pixel format: flip the strf bit depth to 24
    pos = good.find(b"strf") + 8 + 14
    bad = bytearray(good)
    bad[pos] = 24
    with pytest.raises(ValueError):
        video._parse_avi(bytes(bad))


def test_avi_detects_lying_index():
    """An idx1 whose offsets don't match the measured movi layout must
    flip index_consistent — the check a real demuxer performs."""
    good = video._encode_avi(np.arange(600, dtype=np.int64).astype(np.uint8))
    assert video._parse_avi(good)[5]
    idx_pos = good.rfind(b"idx1")
    # corrupt the first index entry's offset field (bytes 8..12 of entry)
    bad = bytearray(good)
    (off,) = struct.unpack("<I", bad[idx_pos + 16 : idx_pos + 20])
    bad[idx_pos + 16 : idx_pos + 20] = struct.pack("<I", off + 2)
    assert not video._parse_avi(bytes(bad))[5]
