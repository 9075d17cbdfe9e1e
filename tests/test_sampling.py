"""Temperature mixing + stratified split: exact-integer quota math,
hash-threshold scale selector, and split determinism."""

import math

from pyspark.sql import functions as F

from miniodb_spark.operators.sampling import (
    stratified_split,
    temperature_quotas,
    temperature_sample,
    temperature_sample_hash,
)


def test_quotas_match_integer_recompute(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    got = {r["source"]: (r["sz"], r["w"], r["quota"])
           for r in temperature_quotas(docs, 200).collect()}
    sizes = {r["source"]: r["sum(n_chars)"]
             for r in docs.groupBy("source").agg(F.sum("n_chars")).collect()}
    ws = {s: math.isqrt(sz) for s, sz in sizes.items()}
    tw = sum(ws.values())
    for s, sz in sizes.items():
        assert got[s] == (sz, ws[s], (200 * ws[s]) // tw)


def test_quota_total_bounded_by_target(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    total = temperature_quotas(docs, 200).agg(F.sum("quota")).first()[0]
    assert total <= 200  # floor division never over-allocates


def test_temperature_sample_respects_quotas(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    quotas = {r["source"]: r["quota"]
              for r in temperature_quotas(docs, 200).collect()}
    picked = temperature_sample(docs, 200).groupBy("source").count().collect()
    for r in picked:
        assert r["count"] == min(
            quotas[r["source"]],
            docs.filter(F.col("source") == r["source"]).count(),
        )


def test_hash_selector_tracks_quota_without_window(spark, sf_dir):
    """The shuffle-free selector lands within binomial noise of the
    quota and never uses a window (no per-source sort in the plan)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    sel = temperature_sample_hash(docs, 200)
    assert "Window" not in sel._jdf.queryExecution().executedPlan().toString()
    total_quota = temperature_quotas(docs, 200).agg(F.sum("quota")).first()[0]
    n = sel.count()
    # 4 sigma of Binomial(total_quota, ~1) slack
    assert abs(n - total_quota) <= 4 * math.sqrt(total_quota) + 5


def test_stratified_split_deterministic_and_layout_independent(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    a = {r["doc_id"]: r["split"]
         for r in stratified_split(docs).select("doc_id", "split").collect()}
    b = {r["doc_id"]: r["split"]
         for r in stratified_split(docs.repartition(13))
         .select("doc_id", "split").collect()}
    assert a == b
    counts = {k: 0 for k in ("train", "val", "test")}
    for v in a.values():
        counts[v] += 1
    n = len(a)
    assert counts["train"] > counts["val"] and counts["train"] > counts["test"]
    assert counts["train"] / n > 0.6  # 80% nominal, md5 buckets wobble


def test_pack_sequences_crafted(spark):
    """Offsets and bins follow the concat-and-chunk rule per shard."""
    from miniodb_spark.operators.sampling import pack_sequences

    rows = [
        (1, "a b c", "s1"),        # 3 tokens, start 0, bin 0
        (2, "d e f g", "s1"),      # start 3, bin 0
        (3, "h i", "s1"),          # start 7, bin 1 (capacity 4)
        (10, "x y z w v", "s2"),   # start 0, bin 0
        (11, "k", "s2"),           # start 5, bin 1
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    got = {r["doc_id"]: (r["n_tokens"], r["start_offset"], r["bin_id"])
           for r in pack_sequences(df, capacity=4).collect()}
    assert got == {
        1: (3, 0, 0), 2: (4, 3, 0), 3: (2, 7, 1),
        10: (5, 0, 0), 11: (1, 5, 1),
    }


def test_incremental_dedup_statuses(spark):
    """Crafted batch: store dup, in-batch dup, and fresh rows classify
    correctly, with store membership taking precedence."""
    from pyspark.sql import functions as F

    from miniodb_spark.operators.dedup import incremental_dedup

    store_docs = spark.createDataFrame(
        [(1, "already seen"), (2, "old news")], "doc_id long, text string")
    normalized = F.regexp_replace(F.trim(F.lower(F.col("text"))), r"\s+", " ")
    store = store_docs.select(F.md5(normalized.cast("binary")).alias("fp"))

    batch = spark.createDataFrame(
        [
            (10, "Already   SEEN"),   # normalizes onto store fp
            (11, "brand new"),        # first sighting
            (12, "brand new"),        # dup of 11 within the batch
            (13, "already seen"),     # store dup AND batch dup -> store wins
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["status"]
           for r in incremental_dedup(batch, store).collect()}
    assert got == {
        10: "dup_of_existing",
        11: "kept",
        12: "dup_in_batch",
        13: "dup_of_existing",
    }
