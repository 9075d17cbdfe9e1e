"""WAV/RIFF container metadata: real stdlib encode (wave) round-tripped
through the struct-level header parser — the honest decode slice
available without codec libraries."""

from miniodb_spark.operators.multimodal import (
    audio_metadata,
    parse_wav_header,
    wav_bytes,
)


def test_parse_wav_header_roundtrip():
    pcm = bytes(range(256)) * 8  # 2048 bytes -> 1024 frames @16-bit mono
    h = parse_wav_header(wav_bytes(pcm, rate=16000, channels=1, width=2))
    assert h["channels"] == 1
    assert h["sample_rate"] == 16000
    assert h["bits_per_sample"] == 16
    assert h["duration_ms"] == (1024 * 1000) // 16000

    stereo = parse_wav_header(wav_bytes(pcm, rate=44100, channels=2, width=2))
    assert stereo["channels"] == 2
    assert stereo["duration_ms"] == ((2048 // 4) * 1000) // 44100


def test_parse_wav_header_rejects_junk():
    assert parse_wav_header(b"") is None
    assert parse_wav_header(b"plain text, definitely not audio") is None
    assert parse_wav_header(b"RIFF\x00\x00\x00\x00JUNK") is None
    # truncated mid-header must not raise
    good = wav_bytes(b"\x01\x02" * 100)
    assert parse_wav_header(good[:10]) is None


def test_audio_metadata_mixed_batch(spark):
    rows = [
        (1, wav_bytes(b"\x00\x01" * 500, rate=8000)),   # 500 frames
        (2, b"not audio at all"),
        (3, wav_bytes(b"\x00\x01" * 4000, rate=16000, channels=2)),
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    got = {r["media_id"]: r for r in audio_metadata(df).collect()}
    assert got[1]["is_wav"] and got[1]["sample_rate"] == 8000
    assert got[1]["duration_ms"] == (500 * 1000) // 8000
    assert not got[2]["is_wav"] and got[2]["channels"] is None
    assert got[3]["channels"] == 2 and got[3]["sample_rate"] == 16000


def test_parse_image_header_formats():
    import struct
    import zlib

    from miniodb_spark.operators.multimodal import (
        image_metadata, parse_image_header, png_bytes,
    )

    png = png_bytes(17, 5, seed=3)
    # the encoder emits a genuinely decodable PNG: IDAT inflates to
    # h * (1 + w) filter-prefixed scanline bytes
    idat_off = png.index(b"IDAT") + 4
    idat_len = struct.unpack(">I", png[png.index(b"IDAT") - 4: png.index(b"IDAT")])[0]
    assert len(zlib.decompress(png[idat_off: idat_off + idat_len])) == 5 * 18
    assert parse_image_header(png) == {"format": "png", "width": 17, "height": 5}

    gif = b"GIF89a" + struct.pack("<HH", 320, 200) + b"\x00\x00\x00"
    assert parse_image_header(gif) == {"format": "gif", "width": 320, "height": 200}

    # minimal JPEG: SOI + APP0 stub + SOF0 with dims 64x48
    app0 = b"\xff\xe0" + struct.pack(">H", 4) + b"JF"
    sof0 = b"\xff\xc0" + struct.pack(">H", 11) + b"\x08" + struct.pack(">HH", 48, 64) + b"\x01\x01\x11\x00"
    jpeg = b"\xff\xd8" + app0 + sof0
    assert parse_image_header(jpeg) == {"format": "jpeg", "width": 64, "height": 48}

    assert parse_image_header(b"not an image") is None
    assert parse_image_header(b"") is None
    assert parse_image_header(png[:12]) is None  # truncated


def test_image_metadata_dataframe(spark):
    from miniodb_spark.operators.multimodal import image_metadata, png_bytes

    df = spark.createDataFrame(
        [(1, png_bytes(9, 4)), (2, b"junk")], "media_id long, payload binary"
    )
    got = {r["media_id"]: r for r in image_metadata(df).collect()}
    assert got[1]["format"] == "png" and (got[1]["width"], got[1]["height"]) == (9, 4)
    assert got[2]["format"] is None


def test_parsers_never_raise_on_fuzz():
    """Container parsers must be total: arbitrary bytes (including
    prefixes that start like valid magic) return a result or None,
    never raise — corrupted payloads are routine at corpus scale."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from miniodb_spark.operators.multimodal import (
        parse_image_header, parse_wav_header, png_bytes, wav_bytes,
    )

    magics = [b"", b"RIFF", b"RIFF1234WAVE", b"\x89PNG\r\n\x1a\n",
              b"GIF89a", b"\xff\xd8", wav_bytes(b"\x01\x02" * 8)[:20],
              png_bytes(3, 3)[:15]]

    @settings(max_examples=300, deadline=None)
    @given(prefix=st.sampled_from(magics), tail=st.binary(max_size=64))
    def run(prefix, tail):
        parse_wav_header(prefix + tail)
        parse_image_header(prefix + tail)

    run()
