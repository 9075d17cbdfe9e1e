"""Unit tests for the round-7 batch-serving additions:

- ``knn_join``: batched exact k-NN (two-stage partial top-k) must agree
  with per-query brute force, including deterministic tie-breaks.
- ``bloom_bitmap`` / ``bloom_prefilter_dedup``: the Bloom prefilter must
  have zero false negatives and therefore produce output identical to
  the plain-join ``incremental_dedup``.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from miniodb_spark.operators.dedup import (
    bloom_bitmap,
    bloom_prefilter_dedup,
    incremental_dedup,
)
from miniodb_spark.operators.similarity import cosine_topk, knn_join


def test_knn_join_matches_per_query_brute_force(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 3)
    corpus = emb.filter(F.col("vec_id") >= 3)
    joined = {
        (r["query_id"], r["rnk"]): r["neighbor_id"]
        for r in knn_join(queries, corpus, k=5).collect()
    }
    for q in queries.collect():
        expected = [
            r["vec_id"]
            for r in cosine_topk(corpus, [float(x) for x in q["embedding"]], 5).collect()
        ]
        got = [joined[(q["vec_id"], rnk)] for rnk in range(1, 6)]
        assert got == expected, f"query {q['vec_id']}: {got} != {expected}"


def test_knn_join_tie_break_is_lowest_id(spark):
    # corpus rows 10 and 11 are the same vector -> identical sim, the
    # lower neighbor_id must win rank 1 in both stages.
    rows = [(10, [1.0, 0.0]), (11, [1.0, 0.0]), (12, [0.0, 1.0])]
    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    queries = spark.createDataFrame([(0, [2.0, 0.0])], "vec_id long, embedding array<double>")
    got = [
        (r["rnk"], r["neighbor_id"])
        for r in knn_join(queries, corpus, k=2).orderBy("rnk").collect()
    ]
    assert got == [(1, 10), (2, 11)]


def test_knn_join_partial_stage_bounds_rows(spark):
    # stage 1 emits <= Q*k rows per Arrow batch no matter the batch size:
    # with one 200-row partition, the pre-window candidate set is Q*k.
    rows = [(i, [float(i % 7), float(i % 5), 1.0]) for i in range(200)]
    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<double>").coalesce(1)
    queries = spark.createDataFrame(
        [(1000, [1.0, 0.0, 0.0]), (1001, [0.0, 1.0, 0.0])],
        "vec_id long, embedding array<double>",
    )
    out = knn_join(queries, corpus, k=4).collect()
    assert len(out) == 2 * 4
    assert {r["query_id"] for r in out} == {1000, 1001}


def test_bloom_bitmap_no_false_negatives(spark):
    fps = [f"{i:032x}" for i in range(1, 500)]
    df = spark.createDataFrame([(f,) for f in fps], "fp string")
    bm = bloom_bitmap(df, m_bits=1 << 16, n_hashes=4)
    bits = np.frombuffer(bm.tobytes(), dtype=np.uint8)
    for f in fps:
        h1 = np.uint64(int(f[:16], 16))
        h2 = np.uint64(int(f[16:32], 16))
        for i in range(4):
            pos = (h1 + np.uint64(i) * h2) & np.uint64((1 << 16) - 1)
            assert (bits[int(pos >> np.uint64(3))] >> int(pos & np.uint64(7))) & 1 == 1


def test_bloom_bitmap_rejects_non_power_of_two(spark):
    df = spark.createDataFrame([("0" * 32,)], "fp string")
    with pytest.raises(ValueError):
        bloom_bitmap(df, m_bits=1000)


def test_bloom_prefilter_equals_plain_incremental(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    cut = docs.agg(F.expr("max(doc_id) div 2")).first()[0]
    normalized = F.regexp_replace(F.trim(F.lower(F.col("text"))), r"\s+", " ")
    existing = docs.filter(F.col("doc_id") < cut).select(
        F.md5(normalized.cast("binary")).alias("fp")
    )
    batch = docs.filter(F.col("doc_id") >= cut)
    plain = {
        (r["doc_id"], r["status"]) for r in incremental_dedup(batch, existing).collect()
    }
    bloomed = {
        (r["doc_id"], r["status"])
        for r in bloom_prefilter_dedup(batch, existing).collect()
    }
    assert bloomed == plain


def test_bloom_prefilter_tiny_filter_still_exact(spark, sf_dir):
    # An undersized (256-bit) filter saturates with false POSITIVES --
    # every row funnels through the store join, and the result must
    # still be exact because positives are always verified.
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").filter(
        F.col("doc_id") < 100
    )
    normalized = F.regexp_replace(F.trim(F.lower(F.col("text"))), r"\s+", " ")
    existing = docs.filter(F.col("doc_id") < 50).select(
        F.md5(normalized.cast("binary")).alias("fp")
    )
    batch = docs.filter(F.col("doc_id") >= 50)
    plain = {
        (r["doc_id"], r["status"]) for r in incremental_dedup(batch, existing).collect()
    }
    bloomed = {
        (r["doc_id"], r["status"])
        for r in bloom_prefilter_dedup(batch, existing, m_bits=256).collect()
    }
    assert bloomed == plain


def test_bloom_prefilter_crafted_duplicates_hit_all_statuses(spark):
    # The parquet fixtures contain no duplicate fingerprints, so the
    # dup branches need crafted input: store holds A; batch has a
    # store dup (A), an in-batch dup pair (B,B as whitespace variants),
    # and a fresh doc.
    store_docs = spark.createDataFrame(
        [(1, "alpha beta gamma")], "doc_id long, text string"
    )
    norm = F.regexp_replace(F.trim(F.lower(F.col("text"))), r"\s+", " ")
    existing = store_docs.select(F.md5(norm.cast("binary")).alias("fp"))
    batch = spark.createDataFrame(
        [
            (10, "ALPHA   beta gamma"),   # normalizes to the stored fp
            (11, "delta epsilon"),        # first of the in-batch pair
            (12, "  Delta   Epsilon "),   # whitespace variant of 11
            (13, "unique zeta"),          # fresh
        ],
        "doc_id long, text string",
    )
    expected = {
        10: "dup_of_existing",
        11: "kept",
        12: "dup_in_batch",
        13: "kept",
    }
    got = {
        r["doc_id"]: r["status"]
        for r in bloom_prefilter_dedup(batch, existing).collect()
    }
    assert got == expected
    # and the plain-join path agrees on the same crafted input
    plain = {
        r["doc_id"]: r["status"]
        for r in incremental_dedup(batch, existing).collect()
    }
    assert plain == expected


def test_knn_join_empty_query_batch(spark):
    corpus = spark.createDataFrame(
        [(1, [1.0, 0.0])], "vec_id long, embedding array<double>"
    )
    empty_q = corpus.filter(F.col("vec_id") < 0)
    out = knn_join(empty_q, corpus, k=3)
    assert out.count() == 0
    assert out.columns == ["query_id", "neighbor_id", "rnk", "sim"]


def test_prefix_filter_jaccard_complete_vs_brute_force(spark):
    from itertools import combinations

    from miniodb_spark.operators.dedup import prefix_filter_jaccard_pairs

    texts = {
        1: "apple banana cherry date elderberry fig",
        2: "apple banana cherry date elderberry grape",   # J=5/7 < 4/5
        3: "apple banana cherry date elderberry fig",     # J=1 with 1
        4: "kiwi lemon mango nectarine orange papaya",
        5: "kiwi lemon mango nectarine orange papaya",    # J=1 with 4
        6: "zebra yak xerus wolf viper urial",
    }
    docs = spark.createDataFrame(
        [(i, t) for i, t in texts.items()], "doc_id long, text string"
    )
    got = {
        (r["id_a"], r["id_b"])
        for r in prefix_filter_jaccard_pairs(docs).collect()
    }
    expected = set()
    sets = {i: set(t.split()) for i, t in texts.items()}
    for a, b in combinations(sorted(sets), 2):
        inter = len(sets[a] & sets[b])
        uni = len(sets[a] | sets[b])
        if inter * 5 >= 4 * uni:
            expected.add((a, b))
    assert got == expected
    assert (1, 3) in got and (4, 5) in got and (1, 2) not in got


def test_bloom_prefilter_string_ids(spark):
    """Review repro: the probe schema once hardcoded `doc_id long`, so
    string-id corpora crashed; the contract is type-generic parity
    with incremental_dedup."""
    store_docs = spark.createDataFrame(
        [("s-1", "alpha beta gamma")], "doc_id string, text string"
    )
    norm = F.regexp_replace(F.trim(F.lower(F.col("text"))), r"\s+", " ")
    existing = store_docs.select(F.md5(norm.cast("binary")).alias("fp"))
    batch = spark.createDataFrame(
        [
            ("s-10", "ALPHA   beta gamma"),  # stored fp
            ("s-11", "delta epsilon"),       # first of the in-batch pair
            ("s-12", " Delta  Epsilon "),    # variant of s-11
            ("s-13", "unique zeta"),         # fresh
        ],
        "doc_id string, text string",
    )
    expected = {
        "s-10": "dup_of_existing",
        "s-11": "kept",
        "s-12": "dup_in_batch",
        "s-13": "kept",
    }
    got = {
        r["doc_id"]: r["status"]
        for r in bloom_prefilter_dedup(batch, existing).collect()
    }
    assert got == expected
    plain = {
        r["doc_id"]: r["status"]
        for r in incremental_dedup(batch, existing).collect()
    }
    assert plain == expected
