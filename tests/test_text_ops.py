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
