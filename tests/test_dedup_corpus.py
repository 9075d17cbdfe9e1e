"""Corpus-level dedup: pairs → connected components → anti-join."""

from pyspark.sql import functions as F

from miniodb_spark.operators.dedup import (
    deduplicate_corpus,
    minhash_lsh_pairs,
    minhash_signatures,
    token_jaccard_pairs,
)


def test_components_keep_min_id(spark):
    docs = spark.createDataFrame([(i, f"d{i}") for i in range(8)], "doc_id long, text string")
    # components: {0,1,2} via 0-1,1-2; {5,6}; singletons 3,4,7
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (5, 6)], "id_a long, id_b long"
    )
    kept = sorted(r["doc_id"] for r in deduplicate_corpus(docs, pairs).collect())
    assert kept == [0, 3, 4, 5, 7]


def test_no_pairs_is_identity(spark):
    docs = spark.createDataFrame([(1, "a"), (2, "b")], "doc_id long, text string")
    pairs = spark.createDataFrame([], "id_a long, id_b long")
    assert deduplicate_corpus(docs, pairs).count() == 2


def test_end_to_end_minhash_dedup(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    # make genuine near-dups: clone 5 docs with one word changed
    clones = (
        docs.filter(F.col("doc_id") < 5)
        .select(
            (F.col("doc_id") + 100_000).alias("doc_id"),
            F.concat(F.col("text"), F.lit(" extra")).alias("text"),
            "lang", "source", "n_chars",
        )
    )
    corpus = docs.unionByName(clones)
    sigs = minhash_signatures(corpus)
    pairs = minhash_lsh_pairs(sigs).filter(F.col("jaccard_est") >= 0.5)
    deduped = deduplicate_corpus(corpus, pairs)
    n_before, n_after = corpus.count(), deduped.count()
    assert n_after <= n_before - 4  # ≥4 of the 5 clones caught (LSH is approximate)
    # originals (min ids) survive
    kept = {r["doc_id"] for r in deduped.filter(F.col("doc_id") < 5).collect()}
    assert kept == {0, 1, 2, 3, 4}
