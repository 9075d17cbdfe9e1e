"""Multimodal column handling: opaque binary payloads + typed metadata.

Images/audio/video are carried as ``binary`` columns with a metadata
struct (mime, width/height/duration, source). The Spark-side plumbing
— schema, batched Arrow transfer, ``mapInPandas`` feature extraction,
partition sizing — is real and tested; the actual codec step is
stubbed (decode libraries aren't available in this environment) behind
``decode_stub`` which raises ``NotImplementedError``, with a
deterministic fake (`fake_features`) used to exercise the pipeline.

Scale notes: binary payloads dominate row size, so feature extraction
uses ``mapInPandas`` (streamed Arrow batches — one pass, no shuffle)
and `repartition_for_payloads` targets ~64 MB of payload per task to
keep executor memory flat.
"""

from __future__ import annotations

import hashlib
import zlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType(), True),
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.LongType(), True),
                    T.StructField("source", T.StringType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload_bytes", T.LongType(), True),
        T.StructField("payload_sha1", T.StringType(), True),
        T.StructField("feature", T.ArrayType(T.DoubleType()), True),
    ]
)


def decode_stub(payload: bytes, mime: str):
    """The real codec hook (PIL/ffmpeg/torchaudio live here in a full
    deployment). Deliberately unimplemented in this environment."""
    raise NotImplementedError(
        "media decoding requires codec libraries not present in this build; "
        "use fake_features for pipeline testing"
    )


def fake_features(payload: bytes, dims: int = 8) -> list[float]:
    """Deterministic stand-in for a decoded-feature vector: bytes →
    crc32-seeded values. Stable across runs and processes."""
    seed = zlib.crc32(payload or b"")
    return [((seed >> (i * 4)) & 0xFF) / 255.0 for i in range(dims)]


def extract_features(df: DataFrame, use_stub_decoder: bool = False) -> DataFrame:
    """mapInPandas feature extraction over Arrow batches. The UDF sees
    pandas DataFrames with a `payload` bytes column — the same shape a
    real decoder would consume."""

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            if use_stub_decoder:
                mimes = pdf["meta"].apply(lambda m: (m or {}).get("mime"))
                feats = [decode_stub(p, m) for p, m in zip(payloads, mimes)]
            else:
                feats = [fake_features(p) for p in payloads]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload_bytes": payloads.apply(lambda p: len(p or b"")).astype("int64"),
                    "payload_sha1": payloads.apply(
                        lambda p: hashlib.sha1(p or b"").hexdigest()
                    ),
                    "feature": feats,
                }
            )

    return df.mapInPandas(_extract, FEATURE_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("frame_bytes", T.LongType(), True),
        T.StructField("frame_sha1", T.StringType(), True),
    ]
)


def resize_stub(payload: bytes, width: int, height: int):
    """The real resize hook (PIL/opencv in a full deployment).
    Deliberately unimplemented in this environment — the Spark-side
    plumbing around it (schema, Arrow batching, payload-sized
    partitioning) is what this module proves."""
    raise NotImplementedError(
        "image resize requires codec libraries not present in this build"
    )


def sample_frames(df: DataFrame, n_frames: int = 4) -> DataFrame:
    """Frame sampling over opaque video payloads via mapInPandas: split
    each payload into ``n_frames`` evenly-strided byte slices — the
    exact batch shape a real keyframe extractor produces (one output row
    per (media, frame) with per-frame bytes + digest). One streaming
    pass over Arrow batches, no shuffle; at scale, feed it through
    :func:`repartition_for_payloads` first so tasks are sized by
    payload volume."""

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {
                "media_id": [], "frame_idx": [], "frame_bytes": [], "frame_sha1": []
            }
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                data = payload or b""
                stride = max(1, len(data) // n_frames)
                for i in range(n_frames):
                    frame = data[i * stride : (i + 1) * stride]
                    out["media_id"].append(mid)
                    out["frame_idx"].append(i)
                    out["frame_bytes"].append(len(frame))
                    out["frame_sha1"].append(hashlib.sha1(frame).hexdigest())
            yield pd.DataFrame(out)

    return df.mapInPandas(_sample, FRAME_SCHEMA)


def repartition_for_payloads(df: DataFrame, total_bytes: int,
                             target_task_bytes: int = 64 * 1024 * 1024) -> DataFrame:
    """Size tasks by payload volume, not row count."""
    parts = max(1, int(total_bytes / target_task_bytes))
    return df.repartition(parts)


# -- real container-metadata decode (no codec libraries needed) --------------
#
# Unlike pixel/sample decoding (stubbed above), *container headers* are
# plain struct layouts — parsing them needs only the stdlib. WAV/RIFF is
# implemented fully; this is the honest slice of "decode" available in
# a codec-less environment, and the exact shape a mapInPandas metadata
# pass takes at 100 TB (one streamed Arrow pass, header-only reads).

WAV_META_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("is_wav", T.BooleanType(), False),
        T.StructField("channels", T.IntegerType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("bits_per_sample", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
    ]
)


def wav_bytes(pcm: bytes, rate: int = 8000, channels: int = 1,
              width: int = 2) -> bytes:
    """Encode raw PCM into a WAV container via the stdlib ``wave``
    module (used by tests and the synthetic registry entry — a real
    encoder, so the parser below is verified against genuine files)."""
    import io
    import wave

    usable = len(pcm) - (len(pcm) % (channels * width))
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(width)
        w.setframerate(rate)
        w.writeframes(pcm[:usable])
    return buf.getvalue()


def parse_wav_header(payload: bytes) -> dict | None:
    """Parse a RIFF/WAVE header with chunk iteration (fmt + data).
    Returns None for non-WAV payloads; never raises on junk bytes."""
    import struct

    b = payload or b""
    if len(b) < 12 or b[0:4] != b"RIFF" or b[8:12] != b"WAVE":
        return None
    pos, fmt, data_size = 12, None, None
    while pos + 8 <= len(b):
        cid = b[pos : pos + 4]
        (size,) = struct.unpack_from("<I", b, pos + 4)
        body = pos + 8
        if cid == b"fmt " and body + 16 <= len(b):
            _, ch, rate, _, block_align, bits = struct.unpack_from(
                "<HHIIHH", b, body
            )
            fmt = {"channels": ch, "sample_rate": rate,
                   "block_align": block_align, "bits_per_sample": bits}
        elif cid == b"data":
            data_size = min(size, len(b) - body)
        pos = body + size + (size % 2)  # chunks are word-aligned
    if fmt is None or data_size is None or fmt["block_align"] == 0:
        return None
    n_frames = data_size // fmt["block_align"]
    return fmt | {
        "duration_ms": (n_frames * 1000) // max(fmt["sample_rate"], 1),
    }


IMAGE_META_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("format", T.StringType(), True),  # png/gif/jpeg/None
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
    ]
)


def png_bytes(width: int, height: int, seed: int = 0) -> bytes:
    """Encode a REAL (decoder-valid) grayscale PNG with stdlib zlib +
    struct only: IHDR + deterministic-pixel IDAT + IEND, each chunk
    CRC32'd per the PNG spec. Used by tests and the synthetic registry
    entry so the parser below is verified against genuine files."""
    import struct
    import zlib

    def chunk(ctype: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body)) + ctype + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)  # 8-bit gray
    raw = b"".join(
        b"\x00" + bytes(((seed + x + y * width) % 251) for x in range(width))
        for y in range(height)
    )
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def parse_image_header(payload: bytes) -> dict | None:
    """Dimensions from PNG (IHDR), GIF (logical screen descriptor) or
    JPEG (first SOF0/SOF2 marker) headers — plain struct layouts, no
    codec libraries. Returns None for anything else; never raises."""
    import struct

    b = payload or b""
    if b[:8] == b"\x89PNG\r\n\x1a\n" and len(b) >= 24 and b[12:16] == b"IHDR":
        w, h = struct.unpack_from(">II", b, 16)
        return {"format": "png", "width": w, "height": h}
    if b[:6] in (b"GIF87a", b"GIF89a") and len(b) >= 10:
        w, h = struct.unpack_from("<HH", b, 6)
        return {"format": "gif", "width": w, "height": h}
    if b[:2] == b"\xff\xd8":  # JPEG SOI; walk markers to a frame header
        pos = 2
        while pos + 9 <= len(b) and b[pos] == 0xFF:
            marker, size = b[pos + 1], struct.unpack_from(">H", b, pos + 2)[0]
            if marker in (0xC0, 0xC1, 0xC2):  # SOF0/1/2
                h, w = struct.unpack_from(">HH", b, pos + 5)
                return {"format": "jpeg", "width": w, "height": h}
            if marker == 0xD9:
                break
            pos += 2 + size
        return None
    return None


def image_metadata(df: DataFrame) -> DataFrame:
    """mapInPandas image-header extraction — same streamed header-only
    shape as :func:`audio_metadata`."""

    def _meta(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: dict[str, list] = {k.name: [] for k in IMAGE_META_SCHEMA}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                h = parse_image_header(payload)
                rows["media_id"].append(mid)
                rows["format"].append(h["format"] if h else None)
                rows["width"].append(h["width"] if h else None)
                rows["height"].append(h["height"] if h else None)
            yield pd.DataFrame(rows)

    return df.mapInPandas(_meta, IMAGE_META_SCHEMA)


def audio_metadata(df: DataFrame) -> DataFrame:
    """mapInPandas WAV-metadata extraction over binary payloads — one
    streamed Arrow pass, header-only parsing, no shuffle."""

    def _meta(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: dict[str, list] = {k.name: [] for k in WAV_META_SCHEMA}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                h = parse_wav_header(payload)
                rows["media_id"].append(mid)
                rows["is_wav"].append(h is not None)
                rows["channels"].append(h["channels"] if h else None)
                rows["sample_rate"].append(h["sample_rate"] if h else None)
                rows["bits_per_sample"].append(h["bits_per_sample"] if h else None)
                rows["duration_ms"].append(h["duration_ms"] if h else None)
            yield pd.DataFrame(rows)

    return df.mapInPandas(_meta, WAV_META_SCHEMA)


def synthetic_media_df(spark, sf_dir: str) -> DataFrame:
    """Build a media table from the documents fixture: text bytes as the
    opaque payload (the container has no real images; the plumbing —
    binary column, metadata struct, Arrow batching — is identical)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.encode("text", "utf-8").alias("payload"),
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
            F.col("source").alias("source"),
        ).alias("meta"),
    )


def register_queries(register) -> None:
    @register(
        "multimodal_payload_stats",
        """
        SELECT source,
               CAST(count(*) AS BIGINT)          AS n_media,
               CAST(sum(length(text)) AS BIGINT) AS total_bytes,
               CAST(max(length(text)) AS BIGINT) AS max_bytes
        FROM documents GROUP BY source ORDER BY source
        """,
        doc="binary-payload size stats by source (payload = utf-8 text bytes; "
            "ascii corpus ⇒ char length == byte length for the oracle)",
        tags=("llm", "capability"),
    )
    def multimodal_payload_stats(spark, sf_dir):
        media = synthetic_media_df(spark, sf_dir)
        return (
            media.select(F.col("meta.source").alias("source"),
                         F.length("payload").alias("nbytes"))
            .groupBy("source")
            .agg(
                F.count("*").alias("n_media"),
                F.sum("nbytes").cast("bigint").alias("total_bytes"),
                F.max("nbytes").cast("bigint").alias("max_bytes"),
            )
            .orderBy("source")
        )

    @register(
        "multimodal_frame_sample",
        """
        SELECT true AS frames_ok,
               (SELECT CAST(count(*) * 4 AS BIGINT)
                FROM documents WHERE doc_id < 30)  AS n_frames
        """,
        doc="mapInPandas frame sampling self-check: exactly n_frames strided "
            "slices per media row, per-frame sha1 consistent with a JVM-side "
            "substring digest on frame 0, output 1:n with the input",
        tags=("llm", "capability"),
    )
    def multimodal_frame_sample(spark, sf_dir):
        n_frames = 4
        media = synthetic_media_df(spark, sf_dir).filter(F.col("media_id") < 30)
        frames = sample_frames(media, n_frames=n_frames)
        # JVM cross-check on frame 0: sha1 of the first len/n_frames bytes
        jvm = media.select(
            "media_id",
            F.sha1(
                F.expr(
                    f"substring(payload, 1, greatest(1, int(length(payload) / {n_frames})))"
                )
            ).alias("sha_jvm"),
        )
        f0 = frames.filter(F.col("frame_idx") == 0).join(jvm, "media_id")
        n_bad = f0.filter(F.col("frame_sha1") != F.col("sha_jvm")).count()
        n_total = frames.count()
        per_media_ok = (
            frames.groupBy("media_id").count().filter(F.col("count") != n_frames).count()
            == 0
        )
        ok = bool(n_bad == 0 and per_media_ok and n_total > 0)
        return spark.createDataFrame(
            [(ok, n_total)], "frames_ok boolean, n_frames long"
        )

    @register(
        "audio_wav_metadata",
        """
        SELECT doc_id,
               true  AS is_wav,
               1     AS channels,
               8000  AS sample_rate,
               CAST(((octet_length(encode(text)) // 2) * 1000) // 8000
                    AS BIGINT) AS duration_ms
        FROM documents WHERE doc_id < 50 ORDER BY doc_id
        """,
        doc="REAL WAV decode round-trip: payloads are genuine WAV files "
            "(stdlib wave encoder over the doc's utf-8 bytes as 16-bit mono "
            "8 kHz PCM), parsed back by the struct-level RIFF header parser "
            "in a mapInPandas pass; the oracle recomputes the expected "
            "duration from the utf-8 BYTE length (octet_length, not "
            "n_chars — they diverge on any non-ASCII fixture regeneration)",
        tags=("llm", "capability"),
    )
    def audio_wav_metadata(spark, sf_dir):
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet").filter(
            F.col("doc_id") < 50
        )

        def _encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                yield pd.DataFrame(
                    {
                        "media_id": pdf["doc_id"],
                        "payload": [
                            wav_bytes(t.encode("utf-8")) for t in pdf["text"]
                        ],
                    }
                )

        media = docs.select("doc_id", "text").mapInPandas(
            _encode,
            T.StructType(
                [
                    T.StructField("media_id", T.LongType(), False),
                    T.StructField("payload", T.BinaryType(), True),
                ]
            ),
        )
        return (
            audio_metadata(media)
            .select(
                F.col("media_id").alias("doc_id"),
                "is_wav",
                F.col("channels").cast("int"),
                F.col("sample_rate").cast("int"),
                "duration_ms",
            )
            .orderBy("doc_id")
        )

    @register(
        "image_png_metadata",
        """
        SELECT doc_id,
               'png'                                AS format,
               CAST(1 + n_chars % 64 AS INTEGER)    AS width,
               CAST(1 + doc_id % 8 AS INTEGER)      AS height
        FROM documents WHERE doc_id < 40 ORDER BY doc_id
        """,
        doc="REAL PNG decode round-trip: genuine grayscale PNGs (stdlib "
            "zlib/struct encoder, spec-correct chunk CRCs) with dimensions "
            "derived from doc columns, parsed back by the IHDR header "
            "parser in a mapInPandas pass; the oracle recomputes the "
            "expected dimensions from the same arithmetic",
        tags=("llm", "capability"),
    )
    def image_png_metadata(spark, sf_dir):
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet").filter(
            F.col("doc_id") < 40
        )

        def _encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                yield pd.DataFrame(
                    {
                        "media_id": pdf["doc_id"],
                        "payload": [
                            png_bytes(1 + int(n) % 64, 1 + int(d) % 8, seed=int(d))
                            for d, n in zip(pdf["doc_id"], pdf["n_chars"])
                        ],
                    }
                )

        media = docs.select("doc_id", "n_chars").mapInPandas(
            _encode,
            T.StructType(
                [
                    T.StructField("media_id", T.LongType(), False),
                    T.StructField("payload", T.BinaryType(), True),
                ]
            ),
        )
        return (
            image_metadata(media)
            .select(F.col("media_id").alias("doc_id"), "format",
                    "width", "height")
            .orderBy("doc_id")
        )

    @register(
        "media_sniff_dispatch",
        """
        SELECT doc_id,
               CASE WHEN doc_id % 3 = 0 THEN 'wav'
                    WHEN doc_id % 3 = 1 THEN 'png'
                    ELSE 'unknown' END AS media_format
        FROM documents WHERE doc_id < 60 ORDER BY doc_id
        """,
        doc="mixed-modality dispatch over one binary column: payloads are "
            "genuine WAVs (doc_id%3=0), genuine PNGs (%3=1) or raw text "
            "(%3=2), classified by the container parsers in one "
            "mapInPandas pass — the per-row format routing a multimodal "
            "pipeline does before modality-specific decode fan-out",
        tags=("llm", "capability"),
    )
    def media_sniff_dispatch(spark, sf_dir):
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet").filter(
            F.col("doc_id") < 60
        )

        def _encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                payloads = []
                for d, t in zip(pdf["doc_id"], pdf["text"]):
                    if d % 3 == 0:
                        payloads.append(wav_bytes(t.encode("utf-8")))
                    elif d % 3 == 1:
                        payloads.append(png_bytes(1 + int(d) % 32, 2, seed=int(d)))
                    else:
                        payloads.append(t.encode("utf-8"))
                yield pd.DataFrame({"media_id": pdf["doc_id"], "payload": payloads})

        media = docs.select("doc_id", "text").mapInPandas(
            _encode,
            T.StructType(
                [
                    T.StructField("media_id", T.LongType(), False),
                    T.StructField("payload", T.BinaryType(), True),
                ]
            ),
        )

        def _sniff(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                fmts = []
                for p in pdf["payload"]:
                    img = parse_image_header(p)
                    if img is not None:
                        fmts.append(img["format"])
                        continue
                    wav = parse_wav_header(p)
                    fmts.append("wav" if wav is not None else "unknown")
                yield pd.DataFrame({"doc_id": pdf["media_id"],
                                    "media_format": fmts})

        return media.mapInPandas(
            _sniff,
            T.StructType(
                [
                    T.StructField("doc_id", T.LongType(), False),
                    T.StructField("media_format", T.StringType(), True),
                ]
            ),
        ).orderBy("doc_id")

    @register(
        "multimodal_features",
        """
        SELECT true AS features_ok,
               (SELECT CAST(count(*) AS BIGINT) FROM documents WHERE doc_id < 50)
                   AS n_media
        """,
        doc="mapInPandas feature extraction self-check: the Python/Arrow batch "
            "path's sha1 + byte-length must match JVM-side sha1()/length() "
            "expressions row-for-row, every feature vector must have the full "
            "8 dims, and extraction must be 1:1 with the input (decode stubbed; "
            "scalar output keeps the result hashable for the canonicalizer)",
        tags=("llm", "capability"),
    )
    def multimodal_features(spark, sf_dir):
        media = synthetic_media_df(spark, sf_dir).filter(F.col("media_id") < 50)
        feats = extract_features(media)
        jvm = media.select(
            "media_id",
            F.sha1("payload").alias("sha_jvm"),
            F.length("payload").cast("long").alias("len_jvm"),
        )
        joined = feats.join(jvm, "media_id")
        n_media = joined.count()
        n_bad = joined.filter(
            (F.col("payload_sha1") != F.col("sha_jvm"))
            | (F.col("payload_bytes") != F.col("len_jvm"))
            | (F.size("feature") != 8)
        ).count()
        ok = bool(n_media > 0 and n_bad == 0)
        return spark.createDataFrame(
            [(ok, n_media)], "features_ok boolean, n_media long"
        )
