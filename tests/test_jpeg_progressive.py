"""Progressive JPEG (SOF2, T.81 Annex G): the progressive encoder
writes the SAME quantized coefficients as the baseline encoder, so the
two files must decode bit-identically — an exact oracle, stronger than
the bounded-error bounds the lossy round-trip tests use."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from miniodb_spark.operators.jpeg import (
    decode_jpeg_pixels,
    jpeg_bytes,
    jpeg_bytes_progressive,
)
from miniodb_spark.operators.multimodal import parse_image_header


def _test_image(w, h, ch, seed=7):
    rng = np.random.default_rng(seed)
    x = np.linspace(0, 255, w)[None, :] * np.ones((h, 1))
    base = np.clip(x + rng.normal(0, 30, (h, w)), 0, 255)
    px = np.repeat(base[:, :, None], ch, axis=2).astype(np.uint8)
    if ch == 3:
        px[:, :, 1] = np.clip(px[:, :, 1] * 0.5 + 40, 0, 255).astype(np.uint8)
        px[:, :, 2] = 255 - px[:, :, 2]
    return px.tobytes()


@pytest.mark.parametrize("dims", [(8, 8), (16, 16), (24, 17), (5, 3),
                                  (64, 48), (33, 9)])
@pytest.mark.parametrize("ch,sub", [(1, False), (3, False), (3, True)])
def test_progressive_decodes_bit_identically_to_baseline(dims, ch, sub):
    w, h = dims
    raw = _test_image(w, h, ch)
    d_base = decode_jpeg_pixels(jpeg_bytes(raw, w, h, ch, subsample=sub))
    d_prog = decode_jpeg_pixels(
        jpeg_bytes_progressive(raw, w, h, ch, subsample=sub))
    assert d_prog is not None
    assert d_prog == d_base  # width, height, channels AND pixel bytes


@pytest.mark.parametrize("ri", [1, 2, 7])
def test_progressive_with_restart_markers(ri):
    raw = _test_image(40, 24, 3)
    d_base = decode_jpeg_pixels(jpeg_bytes(raw, 40, 24, 3, subsample=True))
    d_prog = decode_jpeg_pixels(jpeg_bytes_progressive(
        raw, 40, 24, 3, subsample=True, restart_interval=ri))
    assert d_prog == d_base


def test_flat_image_exercises_long_eob_runs():
    # every AC band is all-zero -> the whole scan is one EOBn run
    flat = bytes([123]) * (64 * 64)
    b = jpeg_bytes_progressive(flat, 64, 64, 1)
    d = decode_jpeg_pixels(b)
    assert d == decode_jpeg_pixels(jpeg_bytes(flat, 64, 64, 1))
    err = np.abs(np.frombuffer(d["pixels"], np.uint8).astype(int) - 123)
    assert err.max() <= 1


def test_progressive_file_is_sof2_and_header_parses():
    raw = _test_image(16, 16, 3)
    b = jpeg_bytes_progressive(raw, 16, 16, 3)
    assert b"\xff\xc2" in b and b"\xff\xc0" not in b
    # 1 DC + 2 AC bands x 3 comps + 2 AC refines x 3 comps + 1 DC refine
    assert b.count(b"\xff\xda") == 14
    assert parse_image_header(b) == {"format": "jpeg", "width": 16,
                                     "height": 16}


def test_truncated_progressive_returns_none_not_raise():
    raw = _test_image(24, 24, 3)
    b = jpeg_bytes_progressive(raw, 24, 24, 3)
    for cut in (len(b) // 4, len(b) // 2, len(b) - 3):
        out = decode_jpeg_pixels(b[:cut])  # decode-or-None, never a raise
        assert out is None or isinstance(out, dict)


@settings(max_examples=25, deadline=None)
@given(st.data())
def test_progressive_mutation_fuzz_never_raises(data):
    raw = _test_image(16, 16, 1, seed=3)
    b = bytearray(jpeg_bytes_progressive(raw, 16, 16, 1))
    n = data.draw(st.integers(1, 6))
    for _ in range(n):
        i = data.draw(st.integers(2, len(b) - 3))
        b[i] = data.draw(st.integers(0, 255))
    out = decode_jpeg_pixels(bytes(b))  # decode-or-None, never a raise
    assert out is None or isinstance(out, dict)


@settings(max_examples=10, deadline=None)
@given(w=st.integers(1, 40), h=st.integers(1, 40),
       ch=st.sampled_from([1, 3]), seed=st.integers(0, 99))
def test_progressive_equals_baseline_property(w, h, ch, seed):
    raw = _test_image(w, h, ch, seed=seed)
    assert decode_jpeg_pixels(jpeg_bytes_progressive(raw, w, h, ch)) == \
        decode_jpeg_pixels(jpeg_bytes(raw, w, h, ch))
