"""Baseline JPEG codec (operators/jpeg.py): lossy round-trip bounds,
marker structure, scope rejections, junk tolerance."""

import struct

import numpy as np
import pytest

from miniodb_spark.operators.jpeg import decode_jpeg_pixels, jpeg_bytes
from miniodb_spark.operators.multimodal import parse_image_header


@pytest.mark.parametrize("v", [0, 64, 128, 200, 255])
def test_flat_grayscale_roundtrips_exactly(v):
    px = bytes([v]) * (16 * 16)
    out = decode_jpeg_pixels(jpeg_bytes(px, 16, 16, 1))
    err = np.abs(
        np.frombuffer(out["pixels"], np.uint8).astype(int) - v).max()
    assert err <= 1  # DC-only blocks: at most quantization rounding


def test_marker_structure_is_spec_shaped():
    j = jpeg_bytes(bytes(64), 8, 8, 1)
    assert j[:2] == b"\xff\xd8" and j[-2:] == b"\xff\xd9"
    assert b"\xff\xdb" in j and b"\xff\xc4" in j  # DQT + DHT
    assert b"\xff\xc0" in j and b"\xff\xda" in j  # SOF0 + SOS
    # the shared header parser reads our dims
    assert parse_image_header(j) == {"format": "jpeg", "width": 8,
                                     "height": 8}


def test_smooth_gradient_bounded_error_and_partial_blocks():
    w, h = 24, 17  # non-multiple of 8 exercises edge replication
    img = bytes(int(127 + 120 * np.sin(x / 10) * np.cos(y / 9))
                for y in range(h) for x in range(w))
    out = decode_jpeg_pixels(jpeg_bytes(img, w, h, 1))
    assert (out["width"], out["height"], out["channels"]) == (w, h, 1)
    err = np.abs(np.frombuffer(out["pixels"], np.uint8).astype(float)
                 - np.frombuffer(img, np.uint8).astype(float))
    assert err.mean() < 3 and err.max() < 30


def test_color_444_roundtrip():
    px = bytes([180, 60, 200]) * (8 * 8)
    out = decode_jpeg_pixels(jpeg_bytes(px, 8, 8, 3))
    assert out["channels"] == 3
    arr = np.frombuffer(out["pixels"], np.uint8).reshape(8, 8, 3).astype(int)
    assert np.abs(arr - np.array([180, 60, 200])).max() <= 4


def test_scope_rejections_return_none():
    good = jpeg_bytes(bytes(64), 8, 8, 1)
    # progressive frame marker (SOF2) instead of SOF0
    prog = good.replace(b"\xff\xc0", b"\xff\xc2", 1)
    assert decode_jpeg_pixels(prog) is None
    # 4:2:0 subsampling flagged in SOF (sampling byte 0x22)
    sof_at = good.index(b"\xff\xc0")
    sub = bytearray(good)
    sub[sof_at + 11] = 0x22  # component 1 sampling factors
    assert decode_jpeg_pixels(bytes(sub)) is None
    # junk / truncation
    assert decode_jpeg_pixels(b"") is None
    assert decode_jpeg_pixels(b"\xff\xd8junk") is None
    assert decode_jpeg_pixels(good[:len(good) // 2]) is None


def test_encoder_validation():
    with pytest.raises(ValueError, match="channels"):
        jpeg_bytes(b"\x00", 1, 1, 2)
    with pytest.raises(ValueError, match="dimensions"):
        jpeg_bytes(b"\x00" * 10, 2, 2, 1)


def test_byte_stuffing_survives():
    """Images whose entropy stream contains 0xFF bytes must round-trip
    (stuffing/unstuffing) — high-frequency noise makes them likely."""
    rng = np.random.RandomState(11)
    for seed in range(3):
        img = rng.randint(0, 256, size=16 * 16, dtype=np.uint8).tobytes()
        out = decode_jpeg_pixels(jpeg_bytes(img, 16, 16, 1))
        assert out is not None and len(out["pixels"]) == 256
