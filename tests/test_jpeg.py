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
    # arithmetic-coded frame marker (SOF9) instead of SOF0
    arith = good.replace(b"\xff\xc0", b"\xff\xc9", 1)
    assert decode_jpeg_pixels(arith) is None
    # SOF2 on a baseline-shaped single scan is malformed progressive
    # (Ss=0 with Se=63): junk-tolerant None, never a raise
    assert decode_jpeg_pixels(good.replace(b"\xff\xc0", b"\xff\xc2", 1)) is None
    # sampling factors outside T.81's 1..4 range
    sof_at = good.index(b"\xff\xc0")
    bad = bytearray(good)
    bad[sof_at + 11] = 0x55  # component 1 sampling factors 5x5
    assert decode_jpeg_pixels(bytes(bad)) is None
    zero = bytearray(good)
    zero[sof_at + 11] = 0x00
    assert decode_jpeg_pixels(bytes(zero)) is None
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


def test_color_420_roundtrip_bounded_error():
    """4:2:0 chroma-subsampled encode/decode (2x2 Y sampling, 16x16
    MCUs, box-averaged chroma): gray-chroma images round-trip within
    the same <3-level bound as 4:4:4; saturated-chroma images stay
    bounded (subsampling is lossy on chroma edges by design)."""
    for (w, h) in [(16, 16), (17, 13), (33, 9), (8, 8), (31, 15)]:
        xx, yy = np.meshgrid(np.arange(w * 1.0), np.arange(h * 1.0))
        plane = 127 + 100 * np.sin(xx / 7 + 1) * np.cos(yy / 5)
        img = np.repeat(plane[:, :, None], 3, axis=2)
        raw = np.clip(np.round(img), 0, 255).astype(np.uint8).tobytes()
        out = decode_jpeg_pixels(jpeg_bytes(raw, w, h, 3, subsample=True))
        assert out is not None
        assert (out["width"], out["height"], out["channels"]) == (w, h, 3)
        err = np.abs(
            np.frombuffer(out["pixels"], np.uint8).astype(float)
            - np.frombuffer(raw, np.uint8).astype(float)
        ).mean()
        assert err < 3.0, (w, h, err)
        # strong-chroma variant: bounded, looser (coarse chroma QT +
        # 2x2 averaging)
        color = np.stack([plane, np.roll(plane, 3, axis=1),
                          255 - plane], axis=2)
        rawc = np.clip(np.round(color), 0, 255).astype(np.uint8).tobytes()
        outc = decode_jpeg_pixels(jpeg_bytes(rawc, w, h, 3, subsample=True))
        assert outc is not None
        errc = np.abs(
            np.frombuffer(outc["pixels"], np.uint8).astype(float)
            - np.frombuffer(rawc, np.uint8).astype(float)
        ).mean()
        assert errc < 12.0, (w, h, errc)


def test_420_smaller_than_444_on_color():
    """The point of subsampling: 4:2:0 spends 6 blocks per 16x16 MCU
    where 4:4:4 spends 12 — file must shrink on non-trivial images."""
    w, h = 48, 32
    xx, yy = np.meshgrid(np.arange(w * 1.0), np.arange(h * 1.0))
    plane = 127 + 100 * np.sin(xx / 7) * np.cos(yy / 5)
    img = np.stack([plane, np.roll(plane, 3, axis=1), 255 - plane], axis=2)
    raw = np.clip(np.round(img), 0, 255).astype(np.uint8).tobytes()
    full = jpeg_bytes(raw, w, h, 3, subsample=False)
    sub = jpeg_bytes(raw, w, h, 3, subsample=True)
    assert len(sub) < len(full)
    # and the SOF advertises 2x2 Y sampling
    sof_at = sub.index(b"\xff\xc0")
    assert sub[sof_at + 11] == 0x22


def test_422_decode_via_crafted_sof():
    """The decoder generalizes over sampling factors, not just 4:2:0:
    a 4:2:2 stream (Y 2x1) hand-assembled from the encoder's
    primitives decodes with correct dims. Build it by encoding a
    half-width chroma pair alongside full-width luma."""
    from miniodb_spark.operators.jpeg import (
        _AC_BITS, _AC_SYMBOLS, _BitWriter, _DC_BITS, _DC_SYMBOLS,
        _QT_CHROMA, _QT_LUMA, _dht_segment, _dqt_segment, _encode_block,
    )
    import struct as _struct

    w, h = 16, 8  # one MCU: 2 Y blocks + 1 Cb + 1 Cr
    xx, yy = np.meshgrid(np.arange(w * 1.0), np.arange(h * 1.0))
    y_plane = 127 + 100 * np.sin(xx / 7) * np.cos(yy / 5)
    cb = np.full((8, 8), 128.0)
    cr = np.full((8, 8), 128.0)
    bw = _BitWriter()
    dc = [0, 0, 0]
    for bx in range(2):
        dc[0] = _encode_block(y_plane[:, bx * 8:bx * 8 + 8], _QT_LUMA,
                              dc[0], bw)
    dc[1] = _encode_block(cb, _QT_CHROMA, dc[1], bw)
    dc[2] = _encode_block(cr, _QT_CHROMA, dc[2], bw)
    entropy = bw.flush()
    sof_comps = bytes([1, 0x21, 0]) + bytes([2, 0x11, 1]) + bytes([3, 0x11, 1])
    sof = b"\xff\xc0" + _struct.pack(">HBHHB", 17, 8, h, w, 3) + sof_comps
    sos = (b"\xff\xda" + _struct.pack(">HB", 12, 3)
           + bytes([1, 0x00, 2, 0x11, 3, 0x11]) + b"\x00\x3f\x00")
    dht = (_dht_segment(0, 0, _DC_BITS, _DC_SYMBOLS)
           + _dht_segment(1, 0, _AC_BITS, _AC_SYMBOLS)
           + _dht_segment(0, 1, _DC_BITS, _DC_SYMBOLS)
           + _dht_segment(1, 1, _AC_BITS, _AC_SYMBOLS))
    payload = (b"\xff\xd8" + _dqt_segment(0, _QT_LUMA)
               + _dqt_segment(1, _QT_CHROMA) + dht + sof + sos
               + entropy + b"\xff\xd9")
    out = decode_jpeg_pixels(payload)
    assert out is not None
    assert (out["width"], out["height"], out["channels"]) == (w, h, 3)
    # luma must survive: compare the decoded Y back against the source
    px = np.frombuffer(out["pixels"], np.uint8).reshape(h, w, 3).astype(float)
    y_back = 0.299 * px[..., 0] + 0.587 * px[..., 1] + 0.114 * px[..., 2]
    assert np.abs(y_back - y_plane).mean() < 3.0


def test_jpeg_property_roundtrip_random_images():
    """Property sweep: random dims (including non-multiple-of-MCU),
    channels, and subsampling must always produce a decodable file
    with correct dims, and smooth content stays within bounded error.
    Deterministic seeds (no hypothesis here: each case costs a full
    encode+decode, so a fixed 24-case grid beats example shrinking)."""
    rng = np.random.RandomState(7)
    for trial in range(24):
        w = int(rng.randint(1, 40))
        h = int(rng.randint(1, 40))
        ch = 1 if trial % 2 == 0 else 3
        sub = trial % 4 == 1  # only meaningful for ch=3
        # smooth low-frequency content (JPEG's design envelope)
        xx, yy = np.meshgrid(np.arange(w * 1.0), np.arange(h * 1.0))
        base = 127 + 80 * np.sin(xx / 9 + trial) * np.cos(yy / 6)
        img = np.repeat(base[:, :, None], ch, axis=2)
        raw = np.clip(np.round(img), 0, 255).astype(np.uint8).tobytes()
        out = decode_jpeg_pixels(jpeg_bytes(raw, w, h, ch, subsample=sub))
        assert out is not None, (w, h, ch, sub)
        assert (out["width"], out["height"], out["channels"]) == (w, h, ch)
        assert len(out["pixels"]) == w * h * ch
        err = np.abs(
            np.frombuffer(out["pixels"], np.uint8).astype(float)
            - np.frombuffer(raw, np.uint8).astype(float)
        ).mean()
        assert err < 4.0, (w, h, ch, sub, err)


def test_jpeg_decoder_never_raises_on_mutations():
    """Junk tolerance holds for the generalized decoder: single-byte
    mutations of a valid 4:2:0 file either decode or return None —
    never raise (the registry's mapInPandas contract)."""
    xx, yy = np.meshgrid(np.arange(24.0), np.arange(16.0))
    plane = np.clip(
        np.round(127 + 90 * np.sin(xx / 5) * np.cos(yy / 4)), 0, 255
    )
    raw = np.repeat(plane[:, :, None], 3, axis=2).astype(np.uint8).tobytes()
    good = jpeg_bytes(raw, 24, 16, 3, subsample=True)
    rng = np.random.RandomState(3)
    for _ in range(60):
        pos = int(rng.randint(0, len(good)))
        val = int(rng.randint(0, 256))
        mutated = good[:pos] + bytes([val]) + good[pos + 1:]
        decode_jpeg_pixels(mutated)  # must not raise
