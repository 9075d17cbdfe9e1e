"""PNG pixel decode / WAV sample decode / resize — the real codec paths
that retire the pre-round-7 stubs. All stdlib-verified: the encoder
writes spec-correct filtered PNGs, the decoder must invert every filter
type exactly."""

import struct
import zlib

import pytest

from miniodb_spark.operators.multimodal import (
    decode_media,
    decode_png_pixels,
    decode_wav_samples,
    fake_features,
    pixel_features,
    png_bytes,
    resize_image,
    resize_pixels,
    wav_bytes,
)


@pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4])
@pytest.mark.parametrize("channels", [1, 3])
def test_png_roundtrip_every_filter(filter_type, channels):
    w, h, seed = 17, 5, 9
    px = decode_png_pixels(
        png_bytes(w, h, seed=seed, channels=channels,
                  filter_type=filter_type))
    assert px is not None
    assert (px["width"], px["height"], px["channels"]) == (w, h, channels)
    stride = w * channels
    assert px["pixels"] == bytes(
        (seed + i + y * stride) % 251 for y in range(h) for i in range(stride)
    )


def test_png_decode_rgba_and_gray_alpha():
    """Decoder handles color types the encoder doesn't emit (4=LA, 6=RGBA)
    — build the file by hand."""

    def chunk(ctype, body):
        return (struct.pack(">I", len(body)) + ctype + body
                + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF))

    for color_type, ch in ((4, 2), (6, 4)):
        w, h = 3, 2
        ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
        raw = b"".join(
            b"\x00" + bytes((y * w * ch + i) % 256 for i in range(w * ch))
            for y in range(h))
        payload = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
                   + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b""))
        px = decode_png_pixels(payload)
        assert px is not None and px["channels"] == ch
        assert px["pixels"] == bytes((k % 256) for k in range(w * h * ch))


def test_png_decode_multiple_idat_chunks():
    """IDAT may be split arbitrarily (spec §5.6) — zlib stream spans
    chunks."""

    def chunk(ctype, body):
        return (struct.pack(">I", len(body)) + ctype + body
                + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF))

    base = png_bytes(8, 3, seed=2)
    expected = decode_png_pixels(base)["pixels"]
    ihdr = struct.pack(">IIBBBBB", 8, 3, 8, 0, 0, 0, 0)
    raw = zlib.compress(b"".join(
        b"\x00" + bytes((2 + x + y * 8) % 251 for x in range(8))
        for y in range(3)))
    split = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
             + chunk(b"IDAT", raw[:7]) + chunk(b"IDAT", raw[7:])
             + chunk(b"IEND", b""))
    px = decode_png_pixels(split)
    assert px is not None and px["pixels"] == expected


def test_png_decode_rejects_garbage():
    good = png_bytes(8, 4, seed=1, filter_type=4)
    assert decode_png_pixels(b"") is None
    assert decode_png_pixels(b"not a png at all") is None
    assert decode_png_pixels(good[:len(good) // 2]) is None  # mid-IDAT cut
    corrupt = bytearray(good)
    corrupt[40] ^= 0xFF
    assert decode_png_pixels(bytes(corrupt)) is None  # chunk CRC fails
    # bad filter byte
    def chunk(ctype, body):
        return (struct.pack(">I", len(body)) + ctype + body
                + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF))
    ihdr = struct.pack(">IIBBBBB", 2, 1, 8, 0, 0, 0, 0)
    bad_filter = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
                  + chunk(b"IDAT", zlib.compress(b"\x07\x01\x02"))
                  + chunk(b"IEND", b""))
    assert decode_png_pixels(bad_filter) is None
    # 16-bit depth unsupported
    ihdr16 = struct.pack(">IIBBBBB", 2, 1, 16, 0, 0, 0, 0)
    deep = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr16)
            + chunk(b"IDAT", zlib.compress(b"\x00" + b"\x00" * 4))
            + chunk(b"IEND", b""))
    assert decode_png_pixels(deep) is None


def test_wav_sample_decode_exact():
    pcm = struct.pack("<8h", 0, 1000, -1000, 32767, -32768, 5, -5, 0)
    out = decode_wav_samples(wav_bytes(pcm, rate=16000, channels=1))
    assert out["samples"] == [0, 1000, -1000, 32767, -32768, 5, -5, 0]
    assert out["rate"] == 16000 and out["channels"] == 1
    assert decode_wav_samples(b"RIFFjunk") is None
    assert decode_wav_samples(png_bytes(2, 2)) is None


def test_decode_media_dispatch():
    img = decode_media(png_bytes(4, 2, seed=1))
    assert img["kind"] == "image" and (img["width"], img["height"]) == (4, 2)
    au = decode_media(wav_bytes(struct.pack("<2h", 1, -1)))
    assert au["kind"] == "audio" and au["samples"] == [1, -1]
    with pytest.raises(ValueError, match="malformed gif"):
        decode_media(b"GIF89a" + struct.pack("<HH", 3, 3) + b"\x00" * 16)
    jpeg_hdr = b"\xff\xd8\xff\xc0\x00\x11\x08\x00\x05\x00\x07" + b"\x00" * 8
    with pytest.raises(ValueError, match="unsupported jpeg variant"):
        decode_media(jpeg_hdr)
    # a real baseline JPEG decodes through the dispatch
    from miniodb_spark.operators.jpeg import jpeg_bytes

    m = decode_media(jpeg_bytes(bytes([90]) * 64, 8, 8, 1))
    assert m["kind"] == "image" and m["channels"] == 1
    with pytest.raises(ValueError, match="unrecognized"):
        decode_media(b"plain text", mime="text/plain")


def test_resize_nearest_neighbor_exact():
    px = decode_png_pixels(png_bytes(4, 4, seed=0))
    src = px["pixels"]
    # 4->2 per axis samples centers (i+0.5)*2 -> source index 1 and 3
    down = resize_pixels(px, 2, 2)
    assert down["pixels"] == bytes(
        [src[1 * 4 + 1], src[1 * 4 + 3], src[3 * 4 + 1], src[3 * 4 + 3]])
    up = resize_pixels(px, 8, 8)
    assert (up["width"], up["height"], len(up["pixels"])) == (8, 8, 64)
    # upscale duplicates: output (0,0) and (1,1) both sample source (0,0)
    assert up["pixels"][0] == src[0] and up["pixels"][8 + 1] == src[0]
    # rgb: channel triples move together
    rgb = decode_png_pixels(png_bytes(4, 1, seed=3, channels=3))
    r1 = resize_pixels(rgb, 2, 1)
    s = rgb["pixels"]
    assert r1["pixels"] == s[3:6] + s[9:12]
    with pytest.raises(ValueError, match="positive"):
        resize_pixels(px, 0, 2)


def test_resize_image_end_to_end():
    out = resize_image(png_bytes(6, 6, seed=4), 3, 3)
    assert (out["width"], out["height"]) == (3, 3)
    # works across formats: GIF and baseline JPEG decode + resize too
    from miniodb_spark.operators.multimodal import gif_bytes
    from miniodb_spark.operators.jpeg import jpeg_bytes

    out = resize_image(gif_bytes(6, 4, seed=1), 3, 2)
    assert (out["width"], out["height"], out["channels"]) == (3, 2, 3)
    out = resize_image(jpeg_bytes(bytes([70]) * 64, 8, 8, 1), 4, 4)
    assert (out["width"], out["height"]) == (4, 4)
    # pixel_features also spans formats
    assert pixel_features(gif_bytes(8, 8, seed=2)) is not None
    assert pixel_features(jpeg_bytes(bytes([70]) * 64, 8, 8, 1)) is not None
    with pytest.raises(ValueError, match="decodable image"):
        resize_image(b"nope", 2, 2)


def test_pixel_features_histogram():
    f = pixel_features(png_bytes(16, 16, seed=3))
    assert len(f) == 8 and abs(sum(f) - 1.0) < 1e-9
    assert all(v >= 0 for v in f)
    assert pixel_features(b"junk") is None
    # constant-zero image -> all mass in bin 0
    def chunk(ctype, body):
        return (struct.pack(">I", len(body)) + ctype + body
                + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF))
    ihdr = struct.pack(">IIBBBBB", 4, 1, 8, 0, 0, 0, 0)
    zeros = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
             + chunk(b"IDAT", zlib.compress(b"\x00" + b"\x00" * 4))
             + chunk(b"IEND", b""))
    assert pixel_features(zeros) == [1.0, 0, 0, 0, 0, 0, 0, 0]
    # fallback path used by extract_features(use_real_decoder=True)
    assert pixel_features(b"x") or fake_features(b"x")


def test_image_pixel_stats_registry_parity():
    """The new registry entry's Spark result must match its DuckDB
    oracle at the smoke SF (same check the driver runs)."""
    import duckdb

    from conftest import SF_SMOKE
    from miniodb_spark.queries import get_registry

    from test_oracle_parity import TABLES, _canon

    spec = get_registry()["image_pixel_stats"]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_SMOKE}/{t}.parquet')"
        )
    from miniodb_spark.session import get_spark

    spark = get_spark("miniodb_spark_tests")
    sdf = spec.fn(spark, SF_SMOKE)
    srows = [tuple(r) for r in sdf.collect()]
    scols = sdf.columns
    cur = con.execute(spec.oracle)
    orows = cur.fetchall()
    ocols = [d[0] for d in cur.description]
    assert sorted(scols) == sorted(ocols)
    assert _canon(srows, scols) == _canon(orows, ocols)


@pytest.mark.parametrize("dims", [(1, 1), (7, 3), (48, 6), (255, 2)])
def test_gif_roundtrip(dims):
    from miniodb_spark.operators.multimodal import (
        decode_gif_pixels, gif_bytes, parse_image_header,
    )

    w, h = dims
    g = gif_bytes(w, h, seed=9)
    assert parse_image_header(g) == {"format": "gif", "width": w, "height": h}
    px = decode_gif_pixels(g)
    assert (px["width"], px["height"], px["channels"]) == (w, h, 3)
    assert px["pixels"] == b"".join(
        bytes([(9 + k) % 251] * 3) for k in range(w * h))


def test_gif_lzw_kwkwk_and_code_growth():
    """The decoder must handle the KwKwK self-referencing code and
    variable code width — the parts a literal-only stream never hits."""
    from miniodb_spark.operators.multimodal import _gif_lzw_decode

    def pack(codes, size):
        acc = nbits = 0
        out = bytearray()
        for c in codes:
            acc |= c << nbits
            nbits += size
            while nbits >= 8:
                out.append(acc & 0xFF)
                acc >>= 8
                nbits -= 8
        if nbits:
            out.append(acc & 0xFF)
        return bytes(out)

    # min_code_size=2: clear=4, eoi=5; code 6 right after '1' is KwKwK
    assert _gif_lzw_decode(pack([4, 1, 6, 5], 3), 2) == bytes([1, 1, 1])
    # real compression: 'abababab' as codes with dict reuse
    # clear, a(0), b(1), 6('ab'), 8('aba'... wait next: 6 adds, 7='ba'),
    # keep simple: 0,1,6,7 -> a b ab b a? decode and check prefix property
    out = _gif_lzw_decode(pack([4, 0, 1, 6, 5], 3), 2)
    assert out == bytes([0, 1, 0, 1])


def test_gif_decode_rejects_garbage():
    from miniodb_spark.operators.multimodal import (
        decode_gif_pixels, gif_bytes,
    )

    assert decode_gif_pixels(b"") is None
    assert decode_gif_pixels(b"GIF89a" + b"\x00" * 5) is None
    good = gif_bytes(6, 4, seed=2)
    assert decode_gif_pixels(good[:len(good) // 2]) is None
    # interlace flag set -> out of scope, clean None
    tampered = bytearray(good)
    # image descriptor packed byte: header(6)+LSD(7)+GCT(768)+1 -> offset
    idesc = 6 + 7 + 768
    assert tampered[idesc] == 0x2C
    tampered[idesc + 9] |= 0x40
    assert decode_gif_pixels(bytes(tampered)) is None


def test_decode_media_gif_branch():
    from miniodb_spark.operators.multimodal import decode_media, gif_bytes

    m = decode_media(gif_bytes(3, 2, seed=1))
    assert m["kind"] == "image" and m["channels"] == 3
