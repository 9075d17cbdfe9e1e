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


def test_distributed_cc_matches_union_find(spark):
    docs = spark.createDataFrame(
        [(i, f"d{i}") for i in range(12)], "doc_id long, text string"
    )
    # a 5-chain (worst case for naive propagation), a triangle, a 2-clique
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (3, 4), (6, 7), (7, 8), (6, 8), (10, 11)],
        "id_a long, id_b long",
    )
    small = sorted(
        r["doc_id"]
        for r in deduplicate_corpus(docs, pairs, distributed_threshold=10**9).collect()
    )
    large = sorted(
        r["doc_id"]
        for r in deduplicate_corpus(docs, pairs, distributed_threshold=0).collect()
    )
    assert small == large == [0, 5, 6, 9, 10]


def test_force_distributed_skips_precount_same_result(spark):
    """force_distributed must (a) take the distributed path regardless of
    edge count and (b) never run the sizing count() job over the pair
    pipeline — asserted by feeding pairs whose count() raises."""
    docs = spark.createDataFrame(
        [(i, f"d{i}") for i in range(6)], "doc_id long, text string"
    )
    pairs = spark.createDataFrame([(0, 1), (1, 2), (4, 5)], "id_a long, id_b long")
    forced = sorted(
        r["doc_id"]
        for r in deduplicate_corpus(
            docs, pairs, distributed_threshold=10**9, force_distributed=True
        ).collect()
    )
    assert forced == [0, 3, 4]

    class NoCountPairs:
        """Duck-typed pairs whose sizing count is forbidden."""

        def __init__(self, df):
            self._df = df

        def count(self):
            raise AssertionError("force_distributed must not pre-count pairs")

        def __getattr__(self, name):
            return getattr(self._df, name)

    forced2 = sorted(
        r["doc_id"]
        for r in deduplicate_corpus(
            docs, NoCountPairs(pairs), force_distributed=True
        ).collect()
    )
    assert forced2 == [0, 3, 4]


def test_connected_components_direct(spark):
    from miniodb_spark.operators.dedup import connected_components

    pairs = spark.createDataFrame(
        [(3, 7), (7, 1), (9, 3), (20, 21)], "id_a long, id_b long"
    )
    comp = {
        r["node"]: r["component"] for r in connected_components(pairs).collect()
    }
    assert comp == {1: 1, 3: 1, 7: 1, 9: 1, 20: 20, 21: 20}


def test_band_cap_bounds_duplicate_saturated_corpus(spark):
    # 400 identical docs: uncapped LSH would materialize ~80k pairs from a
    # single bucket per band; the cap drops the oversized buckets entirely
    docs = spark.createDataFrame(
        [(i, "the same exact text repeated verbatim for every row") for i in range(400)],
        "doc_id long, text string",
    )
    sigs = minhash_signatures(docs)
    capped = minhash_lsh_pairs(sigs, max_bucket_size=100)
    assert capped.count() == 0  # every bucket exceeds the cap → dropped
    uncapped = minhash_lsh_pairs(sigs, max_bucket_size=None).limit(5)
    assert uncapped.count() == 5  # without the guard the pairs do explode


def test_hot_token_cap_filters_stopwords(spark):
    # docs share only the stopword "the"; with the cap the join input for
    # "the" is removed, so no pair survives
    docs = spark.createDataFrame(
        [(1, "the apple orchard"), (2, "the quantum vacuum"), (3, "the iron hull")],
        "doc_id long, text string",
    )
    uncapped = token_jaccard_pairs(docs, threshold=0.1)
    assert uncapped.count() == 3  # all pairs share 'the' at jaccard 1/5
    capped = token_jaccard_pairs(docs, threshold=0.1, max_doc_freq=2)
    assert capped.count() == 0


def test_simhash_block_bucketing_complete(spark):
    from miniodb_spark.operators.dedup import simhash_near_pairs

    # signatures crafted so diffs spread across both 16-bit halves —
    # the old 2-half bucketing missed these; 4-block must find them
    sigs = spark.createDataFrame(
        [(1, 0b0), (2, 0b1 | (1 << 17))],  # hamming 2: bits 0 and 17
        "doc_id long, simhash long",
    )
    got = [(r["id_a"], r["id_b"], r["hamming"]) for r in simhash_near_pairs(sigs).collect()]
    assert got == [(1, 2, 2)]


def test_distributed_cc_on_real_pair_volume(spark, sf_dir):
    """Force the distributed path on the full exact-Jaccard pair list
    (thousands of edges incl. large merged components) and require exact
    agreement with driver union-find."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    pairs = token_jaccard_pairs(docs, threshold=0.5).localCheckpoint(eager=True)
    assert pairs.count() > 1000
    small = {r["doc_id"] for r in
             deduplicate_corpus(docs, pairs, distributed_threshold=10**12).collect()}
    large = {r["doc_id"] for r in
             deduplicate_corpus(docs, pairs, distributed_threshold=0).collect()}
    assert small == large
    assert 0 < len(small) < docs.count()


def test_simhash_bucket_cap_bounds_saturated_corpus(spark):
    """Pathological skew: hundreds of identical signatures collapse onto
    one (block, key) bucket per block — the cap must drop those buckets
    so the verify join input stays bounded, while untouched small
    buckets still pair up."""
    from miniodb_spark.operators.dedup import simhash_near_pairs

    rows = [(i, 0) for i in range(300)]  # 300 identical sigs
    # a genuine small pair: shares a distinctive block-0 key (0x1234 —
    # NOT the saturated key 0), differs only in bit 60
    rows += [(1000, 0x1234), (1001, 0x1234 | (1 << 60))]
    sigs = spark.createDataFrame(rows, "doc_id long, simhash long")
    capped = simhash_near_pairs(sigs, max_bucket_size=50)
    got = {(r["id_a"], r["id_b"]) for r in capped.collect()}
    # the saturated component is dropped entirely; the small pair survives
    assert got == {(1000, 1001)}
    # without the guard the identical block explodes into ~300²/2 pairs
    uncapped = simhash_near_pairs(sigs, max_bucket_size=None).limit(10)
    assert uncapped.count() == 10


def test_simhash_64bit_defaults_and_sign_bit(spark, sf_dir):
    """The scale default is a 64-bit signature (16-bit block keys); bit
    63 wraps to the long sign bit and must survive ANSI overflow
    checking. All-'z' docs drive every token hash's high bit the same
    way, exercising the top bits deterministically."""
    from miniodb_spark.operators.dedup import simhash

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(50)
    sigs = simhash(docs)  # default bits=64 — must not raise under ANSI
    vals = [r["simhash"] for r in sigs.collect()]
    assert len(vals) == 50
    # 64-bit signatures genuinely use the upper half of the key space
    assert any((v >> 32) & 0xFFFFFFFF for v in vals)
    # sign bit reachable without arithmetic overflow
    one_doc = spark.createDataFrame([(1, "z")], "doc_id long, text string")
    assert simhash(one_doc).count() == 1


def test_char_ngram_hot_gram_cap(spark):
    """Docs share only the ubiquitous gram 'the' (inside every text);
    with the doc-freq cap those posting lists are removed before the
    join, so no cross-doc pair survives — while a genuinely similar
    pair below the cap still matches."""
    from miniodb_spark.operators.dedup import char_ngram_jaccard_pairs

    docs = spark.createDataFrame(
        [
            (1, "the apple orchard blooms"),
            (2, "the quantum vacuum decays"),
            (3, "the iron hull rusts"),
            (4, "zygote xylem quartz"),
            (5, "zygote xylem quartzy"),
        ],
        "doc_id long, text string",
    )
    uncapped = char_ngram_jaccard_pairs(docs, n=3, threshold=0.03)
    assert uncapped.filter("id_a < 4 AND id_b < 4").count() == 3
    capped = char_ngram_jaccard_pairs(docs, n=3, threshold=0.03, max_doc_freq=2)
    got = {(r["id_a"], r["id_b"]) for r in capped.collect()}
    assert (4, 5) in got                       # real near-dup survives
    assert not any(a < 4 and b < 4 for a, b in got if (a, b) != (4, 5))


def test_substring_dup_spans_crafted(spark):
    """Two documents sharing an exact 40-char span show dup positions
    covering exactly that span's k-gram windows; a unique doc shows
    zero (Lee et al. 2022 ExactSubstr semantics)."""
    from miniodb_spark.operators.dedup import substring_dup_spans

    shared = "the exact same forty character span here"  # 40 chars
    assert len(shared) == 40
    # boundary chars differ on both sides so the common substring is
    # EXACTLY the 40-char span (a shared space would extend it)
    a = "prefix-oneX" + shared + "Psuffix-alpha"
    b = "other-preY" + shared + "Qending-beta"
    c = "completely unrelated text with no overlap at all whatsoever"
    df = spark.createDataFrame(
        [(0, a), (1, b), (2, c)], "doc_id long, text string")
    out = {r["doc_id"]: r for r in substring_dup_spans(df, k=20).collect()}
    # a 40-char shared span yields exactly 40-20+1 = 21 shared positions
    assert out[0]["n_dup_spans"] == 21
    assert out[1]["n_dup_spans"] == 21
    assert out[2]["n_dup_spans"] == 0
    assert out[0]["n_spans"] == len(a) - 19
    assert out[2]["dup_span_frac"] == 0.0
    assert out[0]["dup_span_frac"] == round(21 / (len(a) - 19), 6)


def test_signature_store_builds_once_and_matches_uncached(spark, sf_dir):
    """SignatureStore: one build per (app, key), checkpointed reuse,
    invalidate forces rebuild, and the cached pipeline's pairs are
    byte-identical to the uncached pipeline's."""
    from pyspark.sql import functions as F

    from miniodb_spark.operators.dedup import (
        SignatureStore, minhash_lsh_pairs, minhash_signatures,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").filter(
        F.col("doc_id") < 200
    )
    store = SignatureStore()
    builds = []

    def _builder():
        builds.append(1)
        return minhash_signatures(docs)

    s1 = store.get_or_build(spark, ("mh", "k1"), _builder)
    s2 = store.get_or_build(spark, ("mh", "k1"), _builder)
    assert len(builds) == 1 and s1 is s2
    store.get_or_build(spark, ("mh", "k2"), _builder)
    assert len(builds) == 2  # distinct key builds
    store.invalidate(("mh", "k1"))
    store.get_or_build(spark, ("mh", "k1"), _builder)
    assert len(builds) == 3  # invalidate forces rebuild

    cached = {
        (r["id_a"], r["id_b"], r["jaccard_est"])
        for r in minhash_lsh_pairs(s1).collect()
    }
    uncached = {
        (r["id_a"], r["id_b"], r["jaccard_est"])
        for r in minhash_lsh_pairs(minhash_signatures(docs)).collect()
    }
    assert cached == uncached


def test_containment_is_asymmetric_where_jaccard_is_not(spark):
    """A short doc embedded verbatim in a long one: containment
    C(short->long) = 1.0 while C(long->short) and symmetric Jaccard
    stay low — the doc-inside-doc signal the operator exists for."""
    from miniodb_spark.operators.dedup import (
        token_containment_pairs,
        token_jaccard_pairs,
    )

    short = "alpha beta gamma"
    long_ = short + " " + " ".join(f"w{i}" for i in range(27))  # 30 tokens
    docs = spark.createDataFrame(
        [(1, short), (2, long_)], "doc_id long, text string")
    pairs = {
        (r["id_a"], r["id_b"]): r["containment"]
        for r in token_containment_pairs(docs, threshold=0.0).collect()
    }
    assert pairs[(1, 2)] == 1.0  # all of short is inside long
    assert pairs[(2, 1)] == 3 / 30  # only 3 of long's 30 tokens hit
    jac = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in token_jaccard_pairs(docs, threshold=0.0).collect()
    }
    assert jac[(1, 2)] == 3 / 30  # symmetric: union-dominated


def test_containment_hot_token_cap_changes_vocabulary_not_score_shape(spark):
    from miniodb_spark.operators.dedup import token_containment_pairs

    # "the" appears in every doc; capped out it cannot create pairs
    docs = spark.createDataFrame(
        [(i, f"the unique{i} token{i}") for i in range(5)],
        "doc_id long, text string",
    )
    uncapped = token_containment_pairs(docs, threshold=0.0).count()
    capped = token_containment_pairs(docs, threshold=0.0,
                                     max_doc_freq=3).count()
    assert uncapped == 20  # every ordered pair shares "the"
    assert capped == 0


def test_signature_table_persists_and_joins_without_exchange(spark, sf_dir):
    """The cluster-durable SignatureStore: signatures written as a
    bucketed table round-trip exactly (same LSH pairs as the direct
    path), and an id-equi-join between the signature table and a
    co-bucketed corpus table needs no exchange on either side."""
    from miniodb_spark import plans
    from miniodb_spark.operators.dedup import (
        load_signature_table,
        minhash_lsh_pairs,
        minhash_signatures,
        persist_signature_table,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").filter(
        F.col("doc_id") < 120)
    sigs = minhash_signatures(docs)
    persist_signature_table(sigs, "sig_tbl", num_buckets=4)
    from miniodb_spark.bucketing import write_bucketed

    write_bucketed(docs.select("doc_id", "source"), "corpus_ids",
                   "doc_id", num_buckets=4)
    try:
        loaded = load_signature_table(spark, "sig_tbl")
        direct = {
            (r["id_a"], r["id_b"], r["jaccard_est"])
            for r in minhash_lsh_pairs(sigs).collect()
        }
        stored = {
            (r["id_a"], r["id_b"], r["jaccard_est"])
            for r in minhash_lsh_pairs(loaded).collect()
        }
        assert direct == stored and stored  # non-vacuous round trip
        # survivor-resolution shape: id join against a co-bucketed table
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            j = loaded.join(spark.table("corpus_ids"), "doc_id")
            assert j.count() == 120
            assert plans.num_shuffles(j) == 0, plans.simple_plan(j)
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    finally:
        spark.sql("DROP TABLE IF EXISTS sig_tbl")
        spark.sql("DROP TABLE IF EXISTS corpus_ids")


def test_minhash_lsh_probe_guard_equivalence(spark):
    # r18 guard shape: the aggregated-probe + anti-join guard must drop
    # EXACTLY the rows the old window-count guard dropped, in both the
    # healthy regime (no bucket over the cap — probe empty, rows flow
    # untouched) and the mixed regime (some buckets over the cap, some
    # under). Reference implementation of the old guard inline.
    from pyspark.sql import Window as W

    # mixed corpus: a 30-doc near-identical cluster (oversized under
    # cap=20 in every band) + distinct filler docs (healthy buckets)
    rows = [(i, "cluster text shared verbatim by all members") for i in range(30)]
    rows += [(100 + i, f"unique filler document number {i} with words {i * 7}")
             for i in range(40)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    sigs = minhash_signatures(docs)

    def window_guard_pairs(sigs, cap):
        # the pre-r18 guard, reconstructed: window count over (band, bh)
        num_hashes, bands = 16, 4
        r = num_hashes // bands
        band_cols = [
            F.xxhash64(*[F.col(f"mh_{b * r + i}") for i in range(r)]).alias(f"band_{b}")
            for b in range(bands)
        ]
        banded = sigs.select(
            "doc_id", *[F.col(f"mh_{i}") for i in range(num_hashes)], *band_cols
        )
        exploded = banded.select(
            "doc_id",
            F.array(*[F.col(f"mh_{i}") for i in range(num_hashes)]).alias("sig"),
            F.explode(
                F.array(*[F.struct(F.lit(b).alias("band"),
                                   F.col(f"band_{b}").alias("bh"))
                          for b in range(bands)])
            ).alias("bk"),
        ).select("doc_id", "sig", F.col("bk.band").alias("band"),
                 F.col("bk.bh").alias("bh"))
        exploded = (
            exploded.withColumn("_bn", F.count("*").over(W.partitionBy("band", "bh")))
            .filter(F.col("_bn") <= cap)
            .drop("_bn")
        )
        a, b = exploded.alias("a"), exploded.alias("b")
        return (
            a.join(b, (F.col("a.band") == F.col("b.band"))
                   & (F.col("a.bh") == F.col("b.bh"))
                   & (F.col("a.doc_id") < F.col("b.doc_id")))
            .select(F.col("a.doc_id").alias("id_a"),
                    F.col("b.doc_id").alias("id_b"))
            .dropDuplicates(["id_a", "id_b"])
        )

    for cap in (20, 1000):  # 20: cluster buckets oversized; 1000: healthy
        got = sorted(
            (r["id_a"], r["id_b"])
            for r in minhash_lsh_pairs(sigs, max_bucket_size=cap).collect()
        )
        want = sorted(
            (r["id_a"], r["id_b"])
            for r in window_guard_pairs(sigs, cap).collect()
        )
        assert got == want, f"cap={cap}: probe guard diverged from window guard"
    # healthy regime really is the no-guard row set
    unguarded = sorted(
        (r["id_a"], r["id_b"])
        for r in minhash_lsh_pairs(sigs, max_bucket_size=None).collect()
    )
    healthy = sorted(
        (r["id_a"], r["id_b"])
        for r in minhash_lsh_pairs(sigs, max_bucket_size=1000).collect()
    )
    assert healthy == unguarded
