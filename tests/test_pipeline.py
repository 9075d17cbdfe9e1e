"""End-to-end training-corpus pipeline: stage interactions that the
single-stage tests can't see."""

from pyspark.sql import functions as F

from miniodb_spark.operators.pipeline import prepare_training_corpus


def test_pipeline_dedups_whitespace_variants(spark):
    """Two docs differing only in whitespace collapse to one survivor
    BEFORE quotas are computed (clean→fingerprint ordering)."""
    body = " ".join(f"alpha{i} beta{i} gamma{i}" for i in range(20))
    rows = [
        (1, body, "s1"),
        (2, body.replace(" ", "   "), "s1"),   # whitespace variant of 1
        (3, body + " extra tail words here", "s1"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = prepare_training_corpus(df, target_rows=3, capacity=64,
                                  min_words=10)
    ids = {r["doc_id"] for r in out.collect()}
    assert 2 not in ids          # the variant deduped away
    assert ids <= {1, 3}


def test_pipeline_packing_never_crosses_splits(spark, sf_dir):
    """Bins are scoped to (split, source): recomputing offsets within
    each output shard reproduces the pipeline's bin assignment, so no
    context window can straddle train/val/test."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = prepare_training_corpus(docs).collect()
    assert out
    by_shard = {}
    for r in sorted(out, key=lambda r: (r["split"], r["source"], r["doc_id"])):
        key = (r["split"], r["source"])
        off = by_shard.get(key, 0)
        assert r["start_offset"] == off          # offsets restart per shard
        assert r["bin_id"] == off // 512
        by_shard[key] = off + r["n_tokens"]


def test_pipeline_is_one_catalyst_plan(spark, sf_dir):
    """The composition stays declarative: building the pipeline
    DataFrame triggers no jobs (no eager collect/checkpoint between
    stages) so Catalyst optimizes the whole flow at once."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    tracker = spark.sparkContext.statusTracker()
    before = len(tracker.getJobIdsForGroup(None) or [])
    df = prepare_training_corpus(docs)
    after = len(tracker.getJobIdsForGroup(None) or [])
    assert df.schema is not None
    assert after == before


def test_write_training_shards_manifest_matches_disk(spark, sf_dir, tmp_path):
    import json
    import os

    from miniodb_spark.operators.pipeline import (
        prepare_training_corpus,
        write_training_shards,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    packed = prepare_training_corpus(docs, target_rows=60, min_words=5)
    out = str(tmp_path / "shards")
    manifest = write_training_shards(packed, out)

    # manifest totals agree with the source aggregates
    assert manifest["total_docs"] == packed.count()
    assert manifest["total_tokens"] == (
        packed.agg({"n_tokens": "sum"}).first()[0]
    )
    # the committed file equals the returned dict and the tmp is gone
    with open(os.path.join(out, "_manifest.json")) as f:
        assert json.load(f) == manifest
    assert not [f for f in os.listdir(out) if ".tmp" in f]

    # shard directories exist per manifest and read-back is lossless
    back = spark.read.parquet(out)
    assert back.count() == manifest["total_docs"]
    for s in manifest["shards"]:
        split, source = s["shard"].split("/", 1)
        assert os.path.isdir(os.path.join(out, f"split={split}", f"source={source}"))
        n = back.filter(
            (back["split"] == split) & (back["source"] == source)
        ).count()
        assert n == s["n_docs"]
