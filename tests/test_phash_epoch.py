"""Unit tests for the perceptual dHash and the seeded epoch shuffle."""

from pyspark.sql import functions as F

from miniodb_spark.operators.multimodal import (
    decode_png_pixels,
    dhash64,
    png_bytes_from_pixels,
)
from miniodb_spark.operators.sampling import epoch_shuffle


def _px(pixels: bytes, w: int, h: int):
    return decode_png_pixels(png_bytes_from_pixels(pixels, w, h))


def test_png_from_pixels_roundtrip():
    pix = bytes(range(0, 192))  # 16x12 gradient
    px = _px(pix, 16, 12)
    assert (px["width"], px["height"], px["channels"]) == (16, 12, 1)
    assert px["pixels"] == pix


def test_dhash_invariant_to_uniform_brightness_shift():
    base = bytes((i * 7 + (i // 16) * 13) % 150 + 20 for i in range(16 * 12))
    shifted = bytes(b + 40 for b in base)  # max 209, no clipping
    assert dhash64(_px(base, 16, 12)) == dhash64(_px(shifted, 16, 12))


def test_dhash_changes_on_content_change():
    base = bytes((i * 7) % 150 + 20 for i in range(16 * 12))
    flipped = bytes(reversed(base))
    assert dhash64(_px(base, 16, 12)) != dhash64(_px(flipped, 16, 12))


def test_dhash_fits_long_range():
    # an image whose first comparison sets the MSB must still be a
    # valid signed 64-bit value (two's complement view)
    desc = bytes(max(0, 200 - i) for i in range(16 * 12))
    v = dhash64(_px(desc, 16, 12))
    assert -(1 << 63) <= v < (1 << 63)


def test_dhash_rgb_reduces_to_grayscale():
    gray = bytes((i * 5) % 180 + 20 for i in range(8 * 8))
    rgb = b"".join(bytes([g, g, g]) for g in gray)
    px_rgb = decode_png_pixels(png_bytes_from_pixels(rgb, 8, 8, channels=3))
    assert dhash64(_px(gray, 8, 8)) == dhash64(px_rgb)


def test_epoch_shuffle_is_deterministic_and_seed_sensitive(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    e1 = epoch_shuffle(docs, seed=1).collect()
    e1b = epoch_shuffle(docs, seed=1).collect()
    assert sorted(map(tuple, e1)) == sorted(map(tuple, e1b))
    e2 = {r["doc_id"]: (r["shard_id"], r["pos_in_shard"])
          for r in epoch_shuffle(docs, seed=2).collect()}
    moved = sum(
        1 for r in e1 if e2[r["doc_id"]] != (r["shard_id"], r["pos_in_shard"])
    )
    assert moved > len(e1) * 0.8  # a new seed reshuffles nearly everything


def test_epoch_shuffle_positions_are_dense_per_shard(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = epoch_shuffle(docs, seed=3, n_shards=4)
    assert out.count() == docs.count()
    per = (
        out.groupBy("shard_id")
        .agg(F.count("*").alias("n"), F.max("pos_in_shard").alias("mx"),
             F.min("pos_in_shard").alias("mn"))
        .collect()
    )
    assert {r["shard_id"] for r in per} == {0, 1, 2, 3}
    for r in per:
        assert (r["mn"], r["mx"]) == (1, r["n"])  # dense 1..n ranks


def test_dominant_freq_two_tone_picks_stronger():
    import math
    import struct

    import numpy as np

    from miniodb_spark.operators.multimodal import decode_wav_samples, wav_bytes

    rate, n = 8000, 1600
    s = [
        int(9000 * math.sin(2 * math.pi * 1000 * i / rate)
            + 3000 * math.sin(2 * math.pi * 400 * i / rate))
        for i in range(n)
    ]
    dec = decode_wav_samples(wav_bytes(struct.pack(f"<{n}h", *s), rate=rate))
    mag = np.abs(np.fft.rfft(np.asarray(dec["samples"], dtype=np.float64)))
    mag[0] = 0.0
    assert int(round(int(np.argmax(mag)) * rate / n)) == 1000


def test_quality_classifier_holdout_auc(spark, sf_dir):
    from miniodb_spark.queries import get_registry

    row = get_registry()["quality_classifier_auc"].fn(spark, sf_dir).first()
    assert row["auc_ok"] is True
    assert row["n_train"] > 0 and row["n_test"] > 0


def test_bigram_logprob_penalizes_rare_order(spark):
    # 'a b' appears twice, 'b z' once: doc 3 (rare continuation) must
    # score below doc 1 (common continuation).
    docs = spark.createDataFrame(
        [(1, "a b c"), (2, "a b c"), (3, "b z a")],
        "doc_id long, text string",
    )
    from miniodb_spark.operators.text import bigram_logprob

    rows = {r["doc_id"]: r["lm2_score"] for r in bigram_logprob(docs).collect()}
    assert rows[3] < rows[1]
    assert rows[1] == rows[2]


def test_contrastive_pairs_properties(spark, sf_dir):
    from miniodb_spark.operators.sampling import contrastive_pairs

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    pairs = contrastive_pairs(docs, n_batches=8).collect()
    by_id = {r["doc_id"]: r for r in pairs}
    batches = {}
    for r in pairs:
        batches.setdefault(r["batch_id"], set()).add(r["doc_id"])
    for r in pairs:
        # the negative is a different doc from the SAME batch
        assert r["neg_doc_id"] != r["doc_id"]
        assert r["neg_doc_id"] in batches[r["batch_id"]]
    # deterministic across runs
    again = {r["doc_id"]: r["neg_doc_id"]
             for r in contrastive_pairs(docs, n_batches=8).collect()}
    assert again == {k: v["neg_doc_id"] for k, v in by_id.items()}


def test_image_near_dup_perturbation_hamming_profile():
    # the one-sampled-pixel perturbation used by image_near_dup_hamming
    # must stay within the banding bound (<=2 bits: one sample point
    # touches two horizontal comparisons) and produce GENUINE nonzero
    # distances for some groups, so the Hamming-verify path is
    # exercised by real near-dups, not only exact matches.
    from miniodb_spark.operators.multimodal import (
        decode_png_pixels,
        dhash64,
        png_bytes_from_pixels,
    )

    w, h = 16, 12

    def pattern(g):
        from miniodb_spark.operators.multimodal import lcg_pixels

        return lcg_pixels(g * 2246822519 + 5, w * h)

    dists = []
    for g in range(10):
        base = pattern(g)
        v2 = bytearray(base)
        v2[6 * 16 + 7] = 250
        h0 = dhash64(decode_png_pixels(png_bytes_from_pixels(bytes(base), w, h)))
        h2 = dhash64(decode_png_pixels(png_bytes_from_pixels(bytes(v2), w, h)))
        dists.append(bin((h0 ^ h2) & ((1 << 64) - 1)).count("1"))
    assert all(d <= 2 for d in dists), dists
    assert any(d >= 1 for d in dists), dists
