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
