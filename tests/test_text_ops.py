"""Unit tests for the round-6 text-pipeline operators (PII detection,
unigram-LM quality, benchmark contamination) on crafted inputs — the
synthetic corpus is PII-free and contamination-light, so these pin the
semantics the parity suite can't distinguish from vacuous zeros."""

from miniodb_spark.operators.text import (
    clean_text,
    contamination_pairs,
    pii_signals,
    unigram_logprob,
)


def test_clean_text_crafted(spark):
    docs = spark.createDataFrame(
        [
            (1, "a\x00b\tc\nd"),            # control chars -> single spaces
            (2, "  spaced    out\t\ttext "),
            (3, "already clean"),
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in clean_text(docs).collect()}
    assert rows[1]["text_clean"] == "a b c d"
    assert rows[2]["text_clean"] == "spaced out text"
    assert rows[3]["text_clean"] == "already clean"
    assert rows[3]["n_removed"] == 0
    assert rows[2]["n_removed"] == len("  spaced    out\t\ttext ") - len(
        "spaced out text"
    )


def test_pii_signals_crafted(spark):
    docs = spark.createDataFrame(
        [
            (1, "contact alice@example.com or bob.smith@sub.domain.org today"),
            (2, "server at 192.168.1.1 and 10.0.0.255 responded"),
            (3, "call 555-123-4567 or 555.867.5309 now"),
            (4, "ssn 123-45-6789 leaked"),
            (5, "clean prose with no identifiers at all"),
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in pii_signals(docs).collect()}
    assert rows[1]["n_email"] == 2 and rows[1]["has_pii"]
    assert rows[2]["n_ipv4"] == 2
    assert rows[3]["n_phone"] == 2
    assert rows[4]["n_ssn"] == 1
    # the SSN shape (3-2-4 digits) must not also count as a phone (3-3/4-4)
    assert rows[4]["n_phone"] == 0
    assert not rows[5]["has_pii"]
    assert rows[5]["n_email"] == rows[5]["n_ipv4"] == 0


def test_unigram_logprob_orders_quality(spark):
    """A doc of corpus-frequent tokens must outscore a doc of unique
    garbage tokens under the corpus's own unigram LM."""
    common = "the cat sat on the mat"
    docs = spark.createDataFrame(
        [(i, common) for i in range(10)] + [(10, "zxqv wkjh qpzm vvnx bbgt")],
        "doc_id long, text string",
    )
    scores = {r["doc_id"]: r["lm_score"] for r in unigram_logprob(docs).collect()}
    assert scores[0] > scores[10]
    # identical docs score identically (deterministic rounding)
    assert scores[0] == scores[5]


def test_contamination_pairs_semantics(spark):
    probes = spark.createDataFrame(
        [(0, "alpha beta gamma delta epsilon zeta")], "doc_id long, text string"
    )
    cands = spark.createDataFrame(
        [
            # shares exactly the shingle "alpha beta gamma delta epsilon"
            (100, "x alpha beta gamma delta epsilon y"),
            (101, "completely different words here okay"),  # shares none
            (102, "tiny"),                                  # shorter than width
            # shares both probe shingles
            (103, "alpha beta gamma delta epsilon zeta omega"),
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r["n_shared_shingles"]
        for r in contamination_pairs(cands, probes).collect()
    }
    assert got == {100: 1, 103: 2}


def test_gopher_quality_crafted(spark):
    """The Gopher rules must discriminate: normal prose passes, a
    too-short doc, a symbol-heavy doc, and a stopword-free keyword list
    each fail their specific rule (Rae et al. 2021 §A1.1)."""
    from miniodb_spark.operators.text import gopher_quality

    prose = ("the quick brown fox jumps over the lazy dog and then runs "
             "away to be with the other foxes that have made peace ") * 3
    short = "too short to pass"
    symbols = " ".join(["####", "1234", "%%%", "the", "and"] * 20)
    keywords = " ".join(["spark", "parquet", "shuffle", "column"] * 20)
    df = spark.createDataFrame(
        [(0, prose.strip()), (1, short), (2, symbols), (3, keywords)],
        "doc_id long, text string")
    out = {r["doc_id"]: r for r in gopher_quality(df).collect()}
    assert out[0]["gopher_pass"] is True
    assert out[1]["gopher_pass"] is False  # word count < 50
    assert out[1]["n_words"] == 4
    assert out[2]["gopher_pass"] is False  # alpha fraction <= 0.8
    assert out[2]["alpha_word_frac"] < 0.8
    assert out[3]["gopher_pass"] is False  # no stopwords
    assert out[3]["stopword_hits"] == 0


def test_repetition_fractions_crafted(spark):
    """Boilerplate (one repeated phrase) maxes the fractions; varied
    text keeps them low (Rae et al. 2021 §A1.2)."""
    from miniodb_spark.operators.text import repetition_fractions

    boiler = " ".join(["click here now"] * 20)          # one 3-gram dominates
    varied = " ".join(f"w{i}" for i in range(60))       # all grams unique
    df = spark.createDataFrame(
        [(0, boiler), (1, varied)], "doc_id long, text string")
    out = {r["doc_id"]: r for r in repetition_fractions(df).collect()}
    assert out[0]["top_2gram_frac"] > 0.3
    assert out[0]["dup_3gram_frac"] == 1.0   # every 3-gram repeats
    assert out[1]["top_2gram_frac"] < 0.05
    assert out[1]["dup_3gram_frac"] == 0.0
    # regression: docs with <3 tokens must be excluded, not crash the
    # gram expressions (sequence(0, size-n) goes descending for short
    # docs and element_at threw before the filter was applied first)
    short = spark.createDataFrame(
        [(0, "solo"), (1, "two words"), (2, "now three tokens here")],
        "doc_id long, text string")
    got = {r["doc_id"] for r in repetition_fractions(short).collect()}
    assert got == {2}


def test_bpe_train_and_segment(spark):
    """BPE merge learning is deterministic and frequency-driven: on a
    corpus dominated by one repeated word, the first merges build that
    word's subwords; segmentation with learned merges is lossless."""
    from miniodb_spark.operators.text import bpe_segment, bpe_train

    df = spark.createDataFrame(
        [(0, "banana banana banana apple"), (1, "banana apple apple"),
         (2, "band bandana banana")],
        "doc_id long, text string")
    merges = bpe_train(df, n_merges=10)
    assert len(merges) == 10
    # 'an' is the most frequent pair across banana/bandana/band
    assert merges[0] == ("a", "n")
    # lossless reconstruction for every word
    for w in ("banana", "apple", "bandana", "band", "unseenword"):
        assert "".join(bpe_segment(w, merges)) == w
    # after enough merges the dominant word becomes a single token
    big = bpe_train(df, n_merges=30)
    assert bpe_segment("banana", big) == ["banana"]
    # determinism across runs
    assert bpe_train(df, n_merges=10) == merges


def test_chunk_documents_boundaries(spark):
    """Chunk arithmetic: stride = chunk - overlap; consecutive chunks
    share exactly `overlap` tokens; the tail chunk is short, never
    empty; a short doc yields one chunk."""
    from miniodb_spark.operators.text import chunk_documents

    import pytest as _pytest

    long_doc = " ".join(f"w{i}" for i in range(95))
    short_doc = "a b c"
    df = spark.createDataFrame(
        [(0, long_doc), (1, short_doc)], "doc_id long, text string")
    out = chunk_documents(df, chunk_tokens=50, overlap=10).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    c0 = sorted(by_doc[0], key=lambda r: r["chunk_idx"])
    # 95 tokens, stride 40 -> starts at 0, 40, 80 -> 3 chunks
    assert [r["chunk_idx"] for r in c0] == [0, 1, 2]
    assert [r["n_chunk_tokens"] for r in c0] == [50, 50, 15]
    # overlap: last 10 tokens of chunk0 == first 10 of chunk1
    t0 = c0[0]["chunk_text"].split(" ")
    t1 = c0[1]["chunk_text"].split(" ")
    assert t0[-10:] == t1[:10]
    assert t0[0] == "w0" and t1[0] == "w40"
    c1 = by_doc[1]
    assert len(c1) == 1 and c1[0]["n_chunk_tokens"] == 3
    with _pytest.raises(ValueError, match="overlap"):
        chunk_documents(df, chunk_tokens=10, overlap=10)


def test_winnowing_guarantees_per_window_coverage(spark, sf_dir):
    """Winnowing's defining local property (Schleimer et al. 2003): at
    least one selected fingerprint position inside EVERY window of w
    consecutive gram positions."""
    from miniodb_spark.queries import get_registry
    from pyspark.sql import functions as F

    reg = get_registry()
    # reconstruct per-doc selected positions by rerunning the entry's
    # building blocks is heavy; instead check the guarantee from the
    # fingerprint counts: density must be >= 1 fingerprint per w grams
    # (the per-window coverage bound) and <= the number of grams.
    out = {r["doc_id"]: r["n_fingerprints"]
           for r in reg["winnow_fingerprints"].fn(spark, sf_dir).collect()}
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").filter(
        (F.col("doc_id") < 60) & (F.length("text") >= 5)
    )
    for r in docs.select("doc_id", F.length("text").alias("L")).collect():
        npos = r["L"] - 4
        n_windows = npos - 3
        if n_windows <= 0:
            continue
        n_fp = out[r["doc_id"]]
        # one selection can cover at most w=4 overlapping windows
        assert n_fp >= (n_windows + 3) // 4, (r["doc_id"], n_fp, n_windows)
        assert n_fp <= npos


def test_char_entropy_separates_prose_from_runs(spark):
    from pyspark.sql import functions as F

    docs = spark.createDataFrame(
        [(0, "the quick brown fox jumps over the lazy dog"),
         (1, "aaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaa")],
        "doc_id long, text string",
    )
    chars = docs.select(
        "doc_id", F.length("text").alias("L"),
        F.explode(F.split(F.lower(F.col("text")), "")).alias("ch"),
    ).filter(F.col("ch") != "")
    p = F.col("n") / F.col("L")
    ent = {
        r["doc_id"]: r["e"]
        for r in chars.groupBy("doc_id", "ch", "L")
        .agg(F.count("*").alias("n"))
        .groupBy("doc_id")
        .agg((-F.sum(p * F.log(p))).alias("e"))
        .collect()
    }
    assert ent[1] < 0.01 < 2.0 < ent[0]  # run ~0 nats, prose ~3 nats
