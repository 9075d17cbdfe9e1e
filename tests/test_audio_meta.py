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
