"""Text analysis operators: stats, token counting, quality scoring,
language ID, document fingerprinting.

All hot-path expressions are built-in ``pyspark.sql.functions`` (JVM,
whole-stage codegen) — no Python UDFs. Every operator is a narrow
projection over the ``text`` column, so at 100 TB the parquet scan
reads one column and the work pipelines inside one stage (no shuffle
except final aggregation).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..fixtures import fixture_df
from ..queries.base import bounded_sort

# english stopwords for the quality stopword-ratio signal (a high ratio
# is normal prose; near-zero suggests keyword spam / non-linguistic text)
EN_STOPWORDS = [
    "the", "and", "of", "to", "a", "in", "is", "it", "that", "for",
    "on", "with", "as", "was", "at", "by", "an", "be", "this", "are",
]

# stopword markers for the n-gram-free language heuristic; scoring is
# "how many distinct marker words of language L appear in the doc".
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is", "with", "for"],
    "es": ["el", "la", "de", "que", "los", "con", "por"],
    "de": ["der", "die", "und", "das", "ist", "mit", "ein"],
    "fr": ["le", "la", "les", "des", "est", "avec", "une"],
}


def tokens_col(col: str = "text"):
    """Whitespace tokens of lowercased text."""
    return F.split(F.lower(F.col(col)), " ")


def text_stats(df: DataFrame, col: str = "text") -> DataFrame:
    """Per-document stats: chars, tokens, distinct tokens, avg token
    length, space ratio — the quality-scoring raw features."""
    toks = tokens_col(col)
    n_chars = F.length(F.col(col)).cast("bigint")
    n_tokens = F.size(toks).cast("bigint")
    return df.withColumns(
        {
            "n_chars_calc": n_chars,
            "n_tokens": n_tokens,
            "n_distinct_tokens": F.size(F.array_distinct(toks)).cast("bigint"),
            "avg_token_len": (n_chars - n_tokens + 1) / n_tokens,
            "ttr": F.size(F.array_distinct(toks)) / F.size(toks),  # type-token ratio
        }
    )


def quality_score(df: DataFrame, col: str = "text") -> DataFrame:
    """Composite quality score in [0,1]: length band + lexical diversity.
    Deterministic arithmetic (SQL-expressible for the oracle)."""
    toks = tokens_col(col)
    n_tokens = F.size(toks)
    ttr = F.size(F.array_distinct(toks)) / n_tokens
    len_score = F.least(n_tokens / F.lit(50.0), F.lit(1.0))
    return df.withColumn("quality", (0.5 * len_score + 0.5 * ttr).cast("double"))


def fingerprint(df: DataFrame, col: str = "text") -> DataFrame:
    """Document fingerprint: md5 of the whitespace-normalized, lowercased
    text — the exact-dedup key that survives formatting noise."""
    normalized = F.regexp_replace(F.trim(F.lower(F.col(col))), r"\s+", " ")
    return df.withColumn("fingerprint", F.md5(normalized.cast("binary")))


def quality_signals(df: DataFrame, col: str = "text") -> DataFrame:
    """Per-document quality raw signals: punctuation ratio (chars that
    are neither alphanumeric nor space / all chars) and stopword ratio
    (stopword token occurrences / tokens). Pure expressions — narrow
    single-column scan, no UDF, no shuffle."""
    toks = tokens_col(col)
    n_chars = F.length(F.col(col))
    n_punct = F.length(F.regexp_replace(F.col(col), r"[a-zA-Z0-9 ]", ""))
    stops = F.array(*[F.lit(w) for w in EN_STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stops, t)))
    return df.withColumns(
        {
            "punct_ratio": (n_punct / n_chars).cast("double"),
            "stopword_ratio": (n_stop / F.size(toks)).cast("double"),
        }
    )


def vocabulary_stats(df: DataFrame, col: str = "text",
                     min_doc_freq: int = 1) -> DataFrame:
    """Corpus vocabulary: per-token document frequency + total
    occurrences. One explode + one groupBy (single shuffle on the
    token); the natural input for stopword discovery, hot-token caps
    and tokenizer vocabulary construction."""
    toks = df.select(
        F.explode(F.split(F.lower(F.col(col)), " ")).alias("token"),
        F.col("doc_id"),
    )
    return (
        toks.groupBy("token")
        .agg(
            F.countDistinct("doc_id").cast("bigint").alias("doc_freq"),
            F.count("*").cast("bigint").alias("occurrences"),
        )
        .filter(F.col("doc_freq") >= min_doc_freq)
    )


def tfidf_top_terms(
    df: DataFrame,
    col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
) -> DataFrame:
    """Top-k TF-IDF terms per document: tf(term, doc) · ln(N / df(term))
    over lowercase whitespace tokens. All relational — explode → tf agg
    → df agg → join → window top-k; the df side is a per-term aggregate
    (tiny vs the corpus) and broadcastable. Ranking uses the score
    rounded to 6 decimals with a term tie-break so ordering is
    deterministic and engine-portable (raw float ULP ordering is not)."""
    from pyspark.sql import Window as W

    toks = df.select(F.col(id_col), F.explode(F.split(F.lower(F.col(col)), " ")).alias("t"))
    tf = toks.groupBy(id_col, "t").agg(F.count("*").alias("tf"))
    n_docs = df.select(id_col).distinct().count()
    dfreq = toks.groupBy("t").agg(F.countDistinct(id_col).alias("df"))
    score = F.round(F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df")), 6)
    scored = tf.join(F.broadcast(dfreq), "t").select(
        id_col, F.col("t").alias("term"), score.alias("tfidf")
    )
    w = W.partitionBy(id_col).orderBy(F.col("tfidf").desc(), F.col("term"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select(id_col, "term", "tfidf", F.col("rk").cast("bigint").alias("rk"))
    )


def language_id(df: DataFrame, col: str = "text") -> DataFrame:
    """Marker-word language heuristic: score each language by distinct
    marker hits in the token set; predict the argmax (ties → 'und').
    Pure array intrinsics — no UDF, no shuffle."""
    toks = F.array_distinct(tokens_col(col))
    scores = [
        F.size(F.array_intersect(toks, F.array(*[F.lit(w) for w in words]))).alias(
            f"score_{lang}"
        )
        for lang, words in LANG_MARKERS.items()
    ]
    scored = df.select("*", *scores)
    langs = list(LANG_MARKERS)
    best = F.greatest(*[F.col(f"score_{l}") for l in langs])
    pred = F.when(best <= 0, F.lit("und"))
    for l in langs:
        pred = pred.when(F.col(f"score_{l}") == best, F.lit(l))
    return scored.withColumn("lang_pred", pred).drop(*[f"score_{l}" for l in langs])


# PII patterns: deliberately simple expressions that parse identically
# under Java regex (Spark) and RE2 (DuckDB) so the oracle agrees
# byte-for-byte. Real deployments would extend the pattern set; the
# operator shape (regexp_count over a narrow text scan) is the point.
PII_EMAIL = r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}"
PII_IPV4 = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PII_PHONE = r"\b\d{3}[-.]\d{3,4}[-.]\d{4}\b"
PII_SSN = r"\b\d{3}-\d{2}-\d{4}\b"


def pii_signals(df: DataFrame, col: str = "text") -> DataFrame:
    """Per-document PII hit counts (emails / IPv4s / phone-shaped /
    SSN-shaped) + a redaction-needed flag — the scrub-before-training
    pass every large-scale text pipeline runs. Pure JVM regexp_count
    over a narrow scan: no UDF, no shuffle, linear in corpus size."""
    c = F.col(col)
    n_email = F.regexp_count(c, F.lit(PII_EMAIL))
    n_ip = F.regexp_count(c, F.lit(PII_IPV4))
    n_phone = F.regexp_count(c, F.lit(PII_PHONE))
    n_ssn = F.regexp_count(c, F.lit(PII_SSN))
    return df.withColumns(
        {
            "n_email": n_email.cast("bigint"),
            "n_ipv4": n_ip.cast("bigint"),
            "n_phone": n_phone.cast("bigint"),
            "n_ssn": n_ssn.cast("bigint"),
            "has_pii": (n_email + n_ip + n_phone + n_ssn > 0),
        }
    )


def _alnum_tokens(col: str = "text"):
    """Non-empty lowercase alphanumeric token runs (the BPE-ish
    pre-tokenization shared with token_counts_bpe)."""
    toks = F.split(F.lower(F.col(col)), r"[^a-z0-9]+")
    return F.filter(toks, lambda t: t != "")


def unigram_logprob(
    df: DataFrame, col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document average token log-probability under the corpus's own
    unigram distribution — the classic cheap LM-quality proxy (docs of
    rare/garbled tokens score low, ordinary prose scores high).

    score(d) = avg_{t in d} ln c(t) − ln N, computed as two aggregations
    over one exploded token relation: per-token corpus counts joined
    back to occurrences (shuffle on token — fine at 100 TB, the token
    relation is what any TF-IDF job shuffles), and the corpus total N
    crossed in as a broadcast single-row aggregate (never collected to
    the driver)."""
    toks = df.select(F.col(id_col), F.explode(_alnum_tokens(col)).alias("tok"))
    counts = toks.groupBy("tok").agg(F.count("*").alias("c"))
    total = toks.agg(F.count("*").alias("n_total"))
    return (
        toks.join(counts, "tok")
        .crossJoin(F.broadcast(total))
        .groupBy(id_col)
        .agg(
            F.count("*").cast("bigint").alias("n_tokens"),
            F.round(
                F.avg(F.log(F.col("c"))) - F.first(F.log(F.col("n_total"))), 4
            ).alias("lm_score"),
        )
    )


def bigram_logprob(
    df: DataFrame, col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document average conditional bigram log-probability under the
    corpus's own MLE bigram model — one step up from
    :func:`unigram_logprob` as an LM-quality proxy: it scores token
    ORDER, not just token choice (shuffled word salad keeps its unigram
    score but collapses here).

    score(d) = avg_{(w1,w2) in d} [ln c(w1,w2) − ln c(w1,·)], where
    c(w1,·) counts bigrams starting with w1, so every conditional is a
    true probability and no smoothing is needed when scoring the
    training corpus itself (every observed bigram has c ≥ 1).

    Spark shape: bigrams come from a pure Catalyst zip of two array
    slices (no posexplode self-join), then two groupBy counts joined
    back to occurrences — the same token-relation shuffle any TF-IDF
    job pays, with map-side combine on both counts."""
    ts = _alnum_tokens(col)
    n = F.size(ts)
    pairs = F.zip_with(
        F.slice(ts, 1, F.greatest(n - 1, F.lit(0))),
        F.slice(ts, 2, F.greatest(n - 1, F.lit(0))),
        lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
    )
    bg = (
        df.filter(n >= 2)
        .select(F.col(id_col), F.explode(pairs).alias("p"))
        .select(id_col, F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
    )
    cb = bg.groupBy("w1", "w2").agg(F.count("*").alias("cb"))
    cw = bg.groupBy("w1").agg(F.count("*").alias("cw"))
    return (
        bg.join(cb, ["w1", "w2"]).join(cw, "w1")
        .groupBy(id_col)
        .agg(
            F.count("*").cast("bigint").alias("n_bigrams"),
            F.round(F.avg(F.log("cb") - F.log("cw")), 4).alias("lm2_score"),
        )
    )


def contamination_pairs(
    candidates: DataFrame,
    probes: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 5,
) -> DataFrame:
    """Benchmark-contamination check: candidate docs sharing word
    ``shingle_n``-grams with a (small) probe/benchmark set — the
    decontamination pass run before training on scraped corpora.

    Scale shape: the probe side (a benchmark suite, ~10⁴–10⁵ docs) is
    tiny next to the corpus, so its distinct shingle set is broadcast
    and the corpus side never shuffles — one narrow scan + broadcast
    hash join, linear in corpus size. Shingles are xxhash64'd so the
    broadcast is 8 bytes each. Returns per-candidate overlap counts
    (distinct shared shingles)."""

    def shingles(df: DataFrame) -> DataFrame:
        ts = _alnum_tokens(text_col)
        k = F.size(ts) - (shingle_n - 1)
        # sequence(1, k) flips to a DESCENDING [1, 0] when k < 1 — docs
        # shorter than the shingle width must produce no shingles at all
        grams = F.when(
            k >= 1,
            F.transform(
                F.sequence(F.lit(1), k),
                lambda i: F.xxhash64(F.array_join(F.slice(ts, i, shingle_n), " ")),
            ),
        ).otherwise(F.array().cast("array<bigint>"))
        return df.select(
            F.col(id_col), F.explode(F.array_distinct(grams)).alias("sh")
        )

    probe_sh = shingles(probes).select("sh").distinct()
    cand_sh = shingles(candidates)
    return (
        cand_sh.join(F.broadcast(probe_sh), "sh")
        .groupBy(id_col)
        .agg(F.count("*").cast("bigint").alias("n_shared_shingles"))
    )


def clean_text(df: DataFrame, col: str = "text") -> DataFrame:
    """Normalization scrub run before dedup/tokenization in a training
    pipeline: control characters → space, whitespace runs collapsed,
    ends trimmed. Pure expressions (JVM, no UDF); emits the cleaned
    text plus how many characters the scrub removed (a cheap
    corpus-health signal — a high removal rate flags binary junk)."""
    c = F.col(col)
    no_ctl = F.regexp_replace(c, r"[\x00-\x1F\x7F]", " ")
    cleaned = F.trim(F.regexp_replace(no_ctl, r"\s+", " "))
    return df.withColumns(
        {
            "text_clean": cleaned,
            "n_removed": (F.length(c) - F.length(cleaned)).cast("bigint"),
        }
    )


GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_quality(df: DataFrame, col: str = "text") -> DataFrame:
    """Gopher-style document quality rules (public technique: Rae et
    al. 2021, "Scaling Language Models: ... Gopher", §A1.1): word-count
    band, mean-word-length band, alphabetic-word fraction, stopword
    presence. Pure JVM expressions, zero shuffle — the arithmetic is
    SQL-expressible so the oracle recomputes it exactly.

    The line-shape rules (bullet/ellipsis fractions) are omitted: the
    fixture corpus is single-line, and their implementation is the
    same split+filter shape pinned here."""
    toks = tokens_col(col)
    n_words = F.size(toks).cast("bigint")
    # sum of word lengths = chars minus the (n-1) separating spaces
    mean_word_len = (F.length(F.col(col)) - n_words + 1) / n_words
    alpha_frac = F.size(F.filter(toks, lambda t: t.rlike("[a-z]"))) / n_words
    stop_hits = F.size(
        F.array_intersect(
            F.array_distinct(toks),
            F.array(*[F.lit(w) for w in GOPHER_STOPWORDS]),
        )
    ).cast("bigint")
    return df.withColumns(
        {
            "n_words": n_words,
            "mean_word_len": F.round(mean_word_len, 6),
            "alpha_word_frac": F.round(alpha_frac, 6),
            "stopword_hits": stop_hits,
            "gopher_pass": (
                n_words.between(50, 100_000)
                & mean_word_len.between(3.0, 10.0)
                & (alpha_frac > 0.8)
                & (stop_hits >= 2)
            ),
        }
    )


def repetition_fractions(df: DataFrame, col: str = "text",
                         id_col: str = "doc_id") -> DataFrame:
    """Gopher repetition filters (Rae et al. 2021 §A1.2): the fraction
    of a document covered by its most frequent word 2-gram and the
    fraction of word 3-grams that are duplicated within the document.
    High values flag boilerplate/spam for training-data filtering.

    Shape: per-doc gram explosion -> one shuffle on (doc, gram) ->
    per-doc aggregate. Gram cardinality is bounded by document length,
    so partitions stay document-sized at corpus scale; there is no
    corpus-wide state (contrast `substring_dup_spans`, which is the
    cross-document variant)."""
    toks = tokens_col(col)

    def grams(n: int):
        # total expressions: clamp the sequence bound and use
        # try_element_at so short documents cannot throw — Catalyst may
        # collapse the projection with the size filter and evaluate it
        # on rows the filter would drop (observed: a 2-token doc threw
        # INVALID_ARRAY_INDEX_IN_ELEMENT_AT despite a preceding filter)
        return F.transform(
            F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0))),
            lambda i: F.concat_ws(
                " ", *[F.try_element_at(toks, i + j + 1) for j in range(n)]
            ),
        )

    base = df.filter(F.size(toks) >= 3).select(
        id_col, grams(2).alias("g2"), grams(3).alias("g3")
    )
    g2 = (
        base.select(id_col, F.explode("g2").alias("gram"))
        .groupBy(id_col, "gram").count()
        .groupBy(id_col)
        .agg(F.max("count").alias("top2"), F.sum("count").alias("tot2"))
    )
    g3 = (
        base.select(id_col, F.explode("g3").alias("gram"))
        .groupBy(id_col, "gram").count()
        .groupBy(id_col)
        .agg(
            F.sum(F.when(F.col("count") > 1, F.col("count")).otherwise(0)).alias("dup3"),
            F.sum("count").alias("tot3"),
        )
    )
    return (
        g2.join(g3, id_col)
        .select(
            id_col,
            F.round(F.col("top2") / F.col("tot2"), 6).alias("top_2gram_frac"),
            F.round(F.col("dup3") / F.col("tot3"), 6).alias("dup_3gram_frac"),
        )
    )


def _bpe_merge_loop(word_counts: dict[tuple[str, ...], int],
                    n_merges: int) -> list[tuple[str, str]]:
    """Classic BPE merge loop (public algorithm: Sennrich, Haddow,
    Birch 2016, "Neural Machine Translation of Rare Words with Subword
    Units", alg. 1) over a word→count table. Ties on pair frequency
    break lexicographically so training is deterministic across runs
    and engines."""
    words = {tuple(w): c for w, c in word_counts.items()}
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: dict[tuple[str, str], int] = {}
        for sym, c in words.items():
            for i in range(len(sym) - 1):
                p = (sym[i], sym[i + 1])
                pairs[p] = pairs.get(p, 0) + c
        if not pairs:
            break
        # deterministic: highest count, then lexicographically smallest
        top = max(pairs.values())
        best_pair = min(p for p, c in pairs.items() if c == top)
        merges.append(best_pair)
        merged = best_pair[0] + best_pair[1]
        out: dict[tuple[str, ...], int] = {}
        for sym, c in words.items():
            new: list[str] = []
            i = 0
            while i < len(sym):
                if (i < len(sym) - 1
                        and sym[i] == best_pair[0]
                        and sym[i + 1] == best_pair[1]):
                    new.append(merged)
                    i += 2
                else:
                    new.append(sym[i])
                    i += 1
            key = tuple(new)
            out[key] = out.get(key, 0) + c
        words = out
    return merges


def bpe_train(df: DataFrame, col: str = "text", n_merges: int = 30,
              max_words: int = 100_000) -> list[tuple[str, str]]:
    """Distributed BPE tokenizer training: the corpus-scale step (word
    frequency aggregation — one token shuffle over the whole corpus)
    runs in Spark; the merge loop runs on the collected word→count
    table, which is VOCABULARY-sized, not corpus-sized (the same
    bounded-driver-state argument as the sketch registry: 100 TB of
    text still collapses to ≤``max_words`` distinct words, capped by
    frequency). This is how production tokenizer trainers consume
    corpora — counts in, merges out."""
    wc = (
        df.select(F.explode(_alnum_tokens(col)).alias("w"))
        .groupBy("w").count()
        .orderBy(F.col("count").desc(), F.col("w"))
        .limit(max_words)
        .collect()
    )
    return _bpe_merge_loop({tuple(r["w"]): r["count"] for r in wc}, n_merges)


def bpe_segment(word: str, merges: list[tuple[str, str]]) -> list[str]:
    """Apply learned merges to one word (greedy in merge-rank order —
    the standard BPE inference)."""
    sym = list(word)
    for a, b in merges:
        i, out = 0, []
        while i < len(sym):
            if i < len(sym) - 1 and sym[i] == a and sym[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(sym[i])
                i += 1
        sym = out
    return sym




def chunk_documents(df: DataFrame, chunk_tokens: int = 50,
                    overlap: int = 10, col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """Sliding-window chunking — the context-window preparation step a
    training/embedding pipeline runs before tokenization: fixed-size
    token chunks with overlap so no boundary context is lost. One row
    per (doc, chunk) via posexplode of slice expressions — per-row
    work, no shuffle; chunk count is ceil(n_tokens / stride), bounded
    by document length."""
    if not 0 <= overlap < chunk_tokens:
        raise ValueError("need 0 <= overlap < chunk_tokens")
    stride = chunk_tokens - overlap
    toks = tokens_col(col)
    # k = 0 .. floor((n-1)/stride): every start k*stride falls inside
    last_k = F.floor((F.size(toks) - 1) / stride).cast("int")
    return (
        df.select(id_col, F.explode(
            F.sequence(F.lit(0), last_k)).alias("chunk_idx"), toks.alias("_t"))
        .select(
            id_col,
            F.col("chunk_idx").cast("bigint").alias("chunk_idx"),
            F.slice(F.col("_t"), F.col("chunk_idx") * stride + 1,
                    chunk_tokens).alias("_chunk"),
        )
        .select(
            id_col, "chunk_idx",
            F.concat_ws(" ", F.col("_chunk")).alias("chunk_text"),
            F.size("_chunk").cast("bigint").alias("n_chunk_tokens"),
        )
    )

# ---------------------------------------------------------------------------
# registry entries
# ---------------------------------------------------------------------------


def register_queries(register) -> None:
    @register(
        "text_stats_by_lang",
        """
        SELECT lang,
               CAST(count(*) AS BIGINT)                                  AS n_docs,
               CAST(sum(length(text)) AS BIGINT)                         AS total_chars,
               avg(CAST(len(string_split(text, ' ')) AS DOUBLE))         AS avg_tokens,
               CAST(min(n_chars) AS BIGINT)                              AS min_chars,
               CAST(max(n_chars) AS BIGINT)                              AS max_chars
        FROM documents GROUP BY lang ORDER BY lang
        """,
        doc="corpus text statistics by language (length/token distributions)",
        tags=("llm", "capability"),
    )
    def text_stats_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
        docs = fixture_df(spark, sf_dir, "documents")
        return (
            docs.groupBy("lang")
            .agg(
                F.count("*").alias("n_docs"),
                F.sum(F.length("text")).cast("bigint").alias("total_chars"),
                F.avg(F.size(F.split("text", " ")).cast("double")).alias("avg_tokens"),
                F.min("n_chars").cast("bigint").alias("min_chars"),
                F.max("n_chars").cast("bigint").alias("max_chars"),
            )
            # lang is an ISO-code enum (≤ a few hundred values at any
            # corpus size): single-partition output sort instead of a
            # range exchange + its sampling job — shared helper so the
            # contract/rationale lives in one place (r17 ADVICE)
            .transform(lambda d: bounded_sort(d, "lang"))
        )

    @register(
        "token_counts",
        """
        SELECT doc_id,
               CAST(len(string_split(text, ' ')) AS BIGINT)                 AS n_tokens,
               CAST(len(list_distinct(string_split(lower(text), ' '))) AS BIGINT)
                                                                            AS n_distinct
        FROM documents WHERE doc_id < 100 ORDER BY doc_id
        """,
        doc="whitespace token counting per document",
        tags=("llm", "capability"),
    )
    def token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
        docs = fixture_df(spark, sf_dir, "documents").filter(
            F.col("doc_id") < 100
        )
        return docs.select(
            "doc_id",
            F.size(F.split("text", " ")).cast("bigint").alias("n_tokens"),
            F.size(F.array_distinct(F.split(F.lower("text"), " ")))
            .cast("bigint")
            .alias("n_distinct"),
        ).orderBy("doc_id")

    @register(
        "token_counts_bpe",
        """
        SELECT doc_id,
               CAST(len(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                                    t -> t <> '')) AS BIGINT) AS n_bpe_tokens
        FROM documents WHERE doc_id < 100 ORDER BY doc_id
        """,
        doc="BPE-ish pre-tokenization count: split on non-alphanumeric runs "
            "(the whitespace-split upper bound refines into subword-ready units)",
        tags=("llm", "capability"),
    )
    def token_counts_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
        docs = fixture_df(spark, sf_dir, "documents").filter(
            F.col("doc_id") < 100
        )
        toks = F.split(F.lower("text"), r"[^a-z0-9]+")
        nonempty = F.filter(toks, lambda t: t != "")
        return docs.select(
            "doc_id", F.size(nonempty).cast("bigint").alias("n_bpe_tokens")
        ).orderBy("doc_id")

    @register(
        "doc_fingerprint",
        """
        SELECT doc_id,
               md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')) AS fingerprint
        FROM documents WHERE doc_id < 50 ORDER BY doc_id
        """,
        doc="normalized-text md5 fingerprint (exact-dedup key)",
        tags=("llm", "capability"),
    )
    def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
        docs = fixture_df(spark, sf_dir, "documents").filter(
            F.col("doc_id") < 50
        )
        return fingerprint(docs).select("doc_id", "fingerprint").orderBy("doc_id")

    @register(
        "quality_scores",
        """
        WITH t AS (
          SELECT doc_id,
                 CAST(len(string_split(text, ' ')) AS DOUBLE) AS n_tokens,
                 CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE) AS n_distinct
          FROM documents)
        SELECT doc_id,
               0.5 * least(n_tokens / 50.0, 1.0) + 0.5 * (n_distinct / n_tokens) AS quality
        FROM t WHERE doc_id < 100 ORDER BY doc_id
        """,
        doc="composite document quality score (length band + lexical diversity)",
        tags=("llm", "capability"),
    )
    def quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
        docs = fixture_df(spark, sf_dir, "documents").filter(
            F.col("doc_id") < 100
        )
        toks = F.split("text", " ")
        n_tokens = F.size(toks).cast("double")
        n_distinct = F.size(F.array_distinct(toks)).cast("double")
        return docs.select(
            "doc_id",
            (
                0.5 * F.least(n_tokens / 50.0, F.lit(1.0)) + 0.5 * (n_distinct / n_tokens)
            ).alias("quality"),
        ).orderBy("doc_id")

    @register(
        "vocabulary_stats",
        """
        WITH toks AS (
          SELECT doc_id, unnest(string_split(lower(text), ' ')) AS token
          FROM documents)
        SELECT token,
               CAST(count(DISTINCT doc_id) AS BIGINT) AS doc_freq,
               CAST(count(*) AS BIGINT)               AS occurrences
        FROM toks GROUP BY token
        HAVING count(DISTINCT doc_id) >= 50
        ORDER BY token
        """,
        doc="corpus vocabulary with document frequency (stopword discovery / "
            "hot-token-cap input); min_doc_freq 50 keeps output bounded",
        tags=("llm", "capability"),
    )
    def vocabulary_stats_q(spark: SparkSession, sf_dir: str) -> DataFrame:
        docs = fixture_df(spark, sf_dir, "documents")
        return vocabulary_stats(docs, min_doc_freq=50).orderBy("token")

    @register(
        "tfidf_top_terms",
        """
        WITH toks AS (
          SELECT doc_id, unnest(string_split(lower(text), ' ')) AS t
          FROM documents),
        tf AS (SELECT doc_id, t, count(*) AS tf FROM toks GROUP BY doc_id, t),
        dfq AS (SELECT t, count(DISTINCT doc_id) AS df FROM toks GROUP BY t),
        n AS (SELECT count(DISTINCT doc_id) AS n_docs FROM documents),
        scored AS (
          SELECT tf.doc_id, tf.t AS term,
                 round(tf.tf * ln(CAST(n.n_docs AS DOUBLE) / dfq.df), 6) AS tfidf
          FROM tf JOIN dfq ON tf.t = dfq.t CROSS JOIN n),
        ranked AS (
          SELECT doc_id, term, tfidf,
                 CAST(row_number() OVER (PARTITION BY doc_id
                      ORDER BY tfidf DESC, term) AS BIGINT) AS rk
          FROM scored)
        SELECT doc_id, term, tfidf, rk FROM ranked
        WHERE rk <= 5 AND doc_id < 50
        ORDER BY doc_id, rk
        """,
        doc="top-5 TF-IDF terms per document (tf x ln(N/df), rounded ranking "
            "with term tie-break for engine-portable ordering)",
        tags=("llm", "capability"),
    )
    def tfidf_top_terms_q(spark: SparkSession, sf_dir: str) -> DataFrame:
        docs = fixture_df(spark, sf_dir, "documents")
        return (
            tfidf_top_terms(docs, k=5)
            .filter(F.col("doc_id") < 50)
            .orderBy("doc_id", "rk")
        )

    _stop_list_sql = ", ".join(f"'{w}'" for w in EN_STOPWORDS)

    @register(
        "quality_signals",
        f"""
        SELECT doc_id,
               CAST(length(regexp_replace(text, '[a-zA-Z0-9 ]', '', 'g')) AS DOUBLE)
                   / length(text)                                   AS punct_ratio,
               CAST(len(list_filter(string_split(lower(text), ' '),
                                    t -> list_contains([{_stop_list_sql}], t)))
                    AS DOUBLE)
                   / len(string_split(lower(text), ' '))            AS stopword_ratio
        FROM documents WHERE doc_id < 100 ORDER BY doc_id
        """,
        doc="quality raw signals: punctuation ratio + stopword-occurrence ratio "
            "(keyword-spam / non-linguistic text detectors)",
        tags=("llm", "capability"),
    )
    def quality_signals_q(spark: SparkSession, sf_dir: str) -> DataFrame:
        docs = fixture_df(spark, sf_dir, "documents").filter(
            F.col("doc_id") < 100
        )
        return quality_signals(docs).select(
            "doc_id", "punct_ratio", "stopword_ratio"
        ).orderBy("doc_id")

    # the oracle mirrors language_id() exactly: distinct lowercase tokens,
    # per-language distinct-marker-hit counts, argmax with ties resolved in
    # LANG_MARKERS insertion order (en, es, de, fr), zero hits → 'und'.
    _lang_oracle_scores = ",\n               ".join(
        "len(list_intersect(toks, [{}])) AS s_{}".format(
            ", ".join(f"'{w}'" for w in words), lang
        )
        for lang, words in LANG_MARKERS.items()
    )
    _lang_oracle_best = "greatest({})".format(
        ", ".join(f"s_{lang}" for lang in LANG_MARKERS)
    )
    _lang_oracle_case = "\n                    ".join(
        f"WHEN s_{lang} = {_lang_oracle_best} THEN '{lang}'" for lang in LANG_MARKERS
    )

    @register(
        "lang_id_heuristic",
        f"""
        WITH t AS (
          SELECT lang, list_distinct(string_split(lower(text), ' ')) AS toks
          FROM documents),
        s AS (
          SELECT lang,
               {_lang_oracle_scores}
          FROM t),
        p AS (
          SELECT lang,
                 CASE WHEN {_lang_oracle_best} <= 0 THEN 'und'
                    {_lang_oracle_case}
                 END AS lang_pred
          FROM s)
        SELECT lang, lang_pred, CAST(count(*) AS BIGINT) AS n
        FROM p GROUP BY lang, lang_pred ORDER BY lang, lang_pred
        """,
        doc="marker-word language ID vs the labeled lang column (accuracy matrix)",
        tags=("llm", "capability"),
    )
    def lang_id_heuristic(spark: SparkSession, sf_dir: str) -> DataFrame:
        docs = fixture_df(spark, sf_dir, "documents")
        return (
            language_id(docs)
            .groupBy("lang", "lang_pred")
            .agg(F.count("*").alias("n"))
            .orderBy("lang", "lang_pred")
        )

    @register(
        "pii_detect",
        f"""
        SELECT doc_id,
               CAST(len(regexp_extract_all(text, '{PII_EMAIL}')) AS BIGINT) AS n_email,
               CAST(len(regexp_extract_all(text, '{PII_IPV4}')) AS BIGINT)  AS n_ipv4,
               CAST(len(regexp_extract_all(text, '{PII_PHONE}')) AS BIGINT) AS n_phone,
               CAST(len(regexp_extract_all(text, '{PII_SSN}')) AS BIGINT)   AS n_ssn,
               (len(regexp_extract_all(text, '{PII_EMAIL}'))
                + len(regexp_extract_all(text, '{PII_IPV4}'))
                + len(regexp_extract_all(text, '{PII_PHONE}'))
                + len(regexp_extract_all(text, '{PII_SSN}'))) > 0 AS has_pii
        FROM documents WHERE doc_id < 200 ORDER BY doc_id
        """,
        doc="PII hit counts (email/IPv4/phone/SSN shapes) + redaction flag — "
            "the scrub-before-training pass; pure regexp_count, narrow scan",
        tags=("llm", "capability"),
    )
    def pii_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
        docs = fixture_df(spark, sf_dir, "documents").filter(
            F.col("doc_id") < 200
        )
        return pii_signals(docs).select(
            "doc_id", "n_email", "n_ipv4", "n_phone", "n_ssn", "has_pii"
        ).orderBy("doc_id")

    @register(
        "unigram_logprob_quality",
        """
        WITH toks AS (
          SELECT doc_id, t AS tok
          FROM documents,
               unnest(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                                  x -> x <> '')) AS u(t)
        ),
        cnt AS (SELECT tok, count(*) AS c FROM toks GROUP BY tok),
        tot AS (SELECT count(*) AS n_total FROM toks)
        SELECT toks.doc_id,
               CAST(count(*) AS BIGINT) AS n_tokens,
               round(avg(ln(cnt.c)) - any_value(ln(tot.n_total)), 4) AS lm_score
        FROM toks JOIN cnt USING (tok) CROSS JOIN tot
        WHERE toks.doc_id < 100
        GROUP BY toks.doc_id ORDER BY toks.doc_id
        """,
        doc="avg token log-prob under the corpus's own unigram LM — the cheap "
            "LM-quality proxy (rare/garbled tokens score low); counts over the "
            "full corpus, scores reported for doc_id < 100",
        tags=("llm", "capability"),
    )
    def unigram_logprob_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
        docs = fixture_df(spark, sf_dir, "documents")
        return (
            unigram_logprob(docs)
            .filter(F.col("doc_id") < 100)
            .orderBy("doc_id")
        )

    @register(
        "benchmark_contamination",
        """
        WITH docs_t AS (
          SELECT doc_id,
                 list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                             x -> x <> '') AS ts
          FROM documents
        ),
        sh AS (
          SELECT doc_id, array_to_string(list_slice(ts, i, i + 4), ' ') AS g
          FROM docs_t, unnest(generate_series(1, len(ts) - 4)) AS s(i)
          WHERE len(ts) >= 5
        ),
        probe AS (SELECT DISTINCT g FROM sh WHERE doc_id < 20),
        cand AS (SELECT DISTINCT doc_id, g FROM sh WHERE doc_id >= 20)
        SELECT cand.doc_id, CAST(count(*) AS BIGINT) AS n_shared_shingles
        FROM cand JOIN probe USING (g)
        GROUP BY cand.doc_id ORDER BY cand.doc_id
        """,
        doc="benchmark-contamination: candidates sharing word 5-grams with the "
            "probe set (doc_id < 20 stands in for a benchmark suite); probe "
            "shingles broadcast, corpus side never shuffles",
        tags=("llm", "capability"),
    )
    def benchmark_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
        docs = fixture_df(spark, sf_dir, "documents")
        return contamination_pairs(
            docs.filter(F.col("doc_id") >= 20), docs.filter(F.col("doc_id") < 20)
        ).orderBy("doc_id")

    @register(
        "source_quota_sample",
        """
        WITH ranked AS (
          SELECT doc_id, source, n_chars,
                 row_number() OVER (PARTITION BY source
                                    ORDER BY n_chars DESC, doc_id) AS rnk
          FROM documents
        )
        SELECT doc_id, source, n_chars, CAST(rnk AS BIGINT) AS rnk
        FROM ranked WHERE rnk <= 5 ORDER BY source, rnk
        """,
        doc="per-source quota enforcement (data-mixing): keep the top-5 "
            "longest docs per source via a partitioned row_number — one "
            "shuffle on source, deterministic tie-break, the exact shape "
            "a mixture-weights sampler takes at corpus scale",
        tags=("llm", "capability"),
    )
    def source_quota_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
        from pyspark.sql import Window as W

        docs = fixture_df(spark, sf_dir, "documents")
        w = W.partitionBy("source").orderBy(F.desc("n_chars"), F.asc("doc_id"))
        return (
            docs.select("doc_id", "source", "n_chars",
                        F.row_number().over(w).cast("bigint").alias("rnk"))
            .filter(F.col("rnk") <= 5)
            .orderBy("source", "rnk")
        )

    @register(
        "text_normalize",
        r"""
        WITH c AS (
          SELECT doc_id,
                 trim(regexp_replace(
                     regexp_replace(text, '[\x00-\x1F\x7F]', ' ', 'g'),
                     '\s+', ' ', 'g')) AS text_clean,
                 text
          FROM documents WHERE doc_id < 100
        )
        SELECT doc_id,
               md5(text_clean)                                       AS clean_md5,
               CAST(length(text) - length(text_clean) AS BIGINT)     AS n_removed
        FROM c ORDER BY doc_id
        """,
        doc="normalization scrub (control chars -> space, whitespace "
            "collapsed, trimmed) - the standard pre-dedup cleanup; md5 of "
            "the cleaned text keeps the oracle compact",
        tags=("llm", "capability"),
    )
    def text_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
        docs = fixture_df(spark, sf_dir, "documents").filter(
            F.col("doc_id") < 100
        )
        return (
            clean_text(docs)
            .select(
                "doc_id",
                F.md5(F.col("text_clean").cast("binary")).alias("clean_md5"),
                "n_removed",
            )
            .orderBy("doc_id")
        )

    @register(
        "gopher_quality_filter",
        """
        WITH w AS (
          SELECT doc_id, string_split(text, ' ') AS toks,
                 length(text) AS nc
          FROM documents
        )
        SELECT doc_id,
               CAST(len(toks) AS BIGINT) AS n_words,
               ROUND((nc - len(toks) + 1) / len(toks), 6) AS mean_word_len,
               ROUND(len(list_filter(toks, t -> regexp_matches(t, '[a-z]')))
                     / len(toks), 6) AS alpha_word_frac,
               CAST(len(list_intersect(list_distinct(toks),
                    ['the','be','to','of','and','that','have','with']))
                    AS BIGINT) AS stopword_hits,
               (len(toks) BETWEEN 50 AND 100000
                AND (nc - len(toks) + 1) / len(toks) BETWEEN 3.0 AND 10.0
                AND len(list_filter(toks, t -> regexp_matches(t, '[a-z]')))
                    / len(toks) > 0.8
                AND len(list_intersect(list_distinct(toks),
                    ['the','be','to','of','and','that','have','with'])) >= 2
               ) AS gopher_pass
        FROM w ORDER BY doc_id
        """,
        doc="Gopher document-quality rules (Rae et al. 2021 §A1.1): "
            "word-count band [50,100k], mean word length [3,10], "
            "alphabetic-word fraction >0.8, >=2 distinct stopwords. Pure "
            "JVM expressions, zero shuffle; the oracle recomputes the "
            "identical arithmetic over string_split",
        tags=("llm", "capability"),
    )
    def gopher_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
        docs = fixture_df(spark, sf_dir, "documents")
        return (
            gopher_quality(docs)
            .select("doc_id", "n_words", "mean_word_len",
                    "alpha_word_frac", "stopword_hits", "gopher_pass")
            .orderBy("doc_id")
        )

    @register(
        "repetition_fractions",
        """
        WITH toks AS (
          SELECT doc_id, string_split(text, ' ') AS w FROM documents
          WHERE len(string_split(text, ' ')) >= 3
        ), g2 AS (
          SELECT doc_id, w[g.k] || ' ' || w[g.k+1] AS gram
          FROM toks JOIN generate_series(1, 250) AS g(k)
            ON g.k <= len(w) - 1
        ), g3 AS (
          SELECT doc_id, w[g.k] || ' ' || w[g.k+1] || ' ' || w[g.k+2] AS gram
          FROM toks JOIN generate_series(1, 250) AS g(k)
            ON g.k <= len(w) - 2
        ), a2 AS (
          SELECT doc_id, max(c) AS top2, sum(c) AS tot2
          FROM (SELECT doc_id, gram, count(*) AS c FROM g2
                GROUP BY doc_id, gram)
          GROUP BY doc_id
        ), a3 AS (
          SELECT doc_id,
                 sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS dup3,
                 sum(c) AS tot3
          FROM (SELECT doc_id, gram, count(*) AS c FROM g3
                GROUP BY doc_id, gram)
          GROUP BY doc_id
        )
        SELECT a2.doc_id,
               ROUND(top2 / tot2, 6) AS top_2gram_frac,
               ROUND(dup3 / tot3, 6) AS dup_3gram_frac
        FROM a2 JOIN a3 ON a2.doc_id = a3.doc_id
        ORDER BY a2.doc_id
        """,
        doc="Gopher repetition filters (Rae et al. 2021 §A1.2): "
            "fraction covered by the most frequent word 2-gram + "
            "fraction of word 3-grams duplicated within the doc - the "
            "boilerplate/spam signals of a training-data pipeline; one "
            "(doc, gram) shuffle, document-bounded state (the oracle "
            "enumerates gram positions via a constant-bound "
            "generate_series join because DuckDB table functions can't "
            "take lateral column bounds)",
        tags=("llm", "capability"),
    )
    def repetition_fractions_q(spark: SparkSession, sf_dir: str) -> DataFrame:
        docs = fixture_df(spark, sf_dir, "documents")
        return repetition_fractions(docs).orderBy("doc_id")

    @register(
        "bpe_train_merges",
        "SELECT true AS bpe_ok, CAST(30 AS BIGINT) AS n_merges",
        doc="distributed BPE tokenizer training self-check (Sennrich et "
            "al. 2016): merges learned from Spark's corpus-wide word-"
            "frequency aggregation must equal merges learned by an "
            "independent pure-python recount of the same collected text "
            "(deterministic tie-break), and segmenting every corpus word "
            "with the learned merges must exactly reconstruct it "
            "(lossless subword property). Corpus-scale step is one token "
            "shuffle; the merge loop runs on the vocabulary-sized count "
            "table. The python recount runs on a DETERMINISTIC BOUNDED "
            "slice (md5 hash-band of doc_ids, TakeOrdered-capped at 512 "
            "docs) and the distributed trainer is pointed at the same "
            "slice — so the check itself never collects corpus-sized "
            "data, no matter the SF",
        tags=("llm", "capability"),
    )
    def bpe_train_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
        import re as _re

        docs = fixture_df(spark, sf_dir, "documents")
        # deterministic hash-band + cap: the subset is a function of the
        # data only (no sampling seed), spread across the corpus by the
        # md5 band, and its driver footprint is fixed at <=512 docs —
        # orderBy+limit plans as TakeOrdered, a distributed top-k, so
        # the full corpus is scanned but never collected
        band = docs.filter(
            F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4),
                   16, 10).cast("long") % 4 == 0
        )
        sub = band.orderBy("doc_id").limit(512)
        merges = bpe_train(sub, n_merges=30)

        # independent reference: recount words in pure python from the
        # SAME bounded slice (the check's point is the distributed count
        # path, not the merge loop it shares)
        texts = [r["text"] for r in sub.select("text").collect()]
        counts: dict[tuple[str, ...], int] = {}
        for t in texts:
            for w in _re.split(r"[^a-z0-9]+", t.lower()):
                if w:
                    counts[tuple(w)] = counts.get(tuple(w), 0) + 1
        ref = _bpe_merge_loop(counts, 30)

        # lossless segmentation: merges never corrupt a word
        vocab = {w for t in texts for w in _re.split(r"[^a-z0-9]+", t.lower()) if w}
        lossless = all("".join(bpe_segment(w, merges)) == w for w in vocab)

        ok = bool(merges == ref and len(merges) == 30 and lossless)
        return spark.createDataFrame(
            [(ok, len(merges))], "bpe_ok boolean, n_merges long"
        )

    @register(
        "doc_chunking",
        """
        WITH t AS (
          SELECT doc_id, string_split(text, ' ') AS w FROM documents
        ), c AS (
          SELECT doc_id, g.k AS chunk_idx,
                 w[(g.k * 40 + 1):(g.k * 40 + 50)] AS chunk
          FROM t JOIN generate_series(0, 63) AS g(k)
            ON g.k * 40 < len(w)
        )
        SELECT doc_id,
               CAST(chunk_idx AS BIGINT)      AS chunk_idx,
               array_to_string(chunk, ' ')    AS chunk_text,
               CAST(len(chunk) AS BIGINT)     AS n_chunk_tokens
        FROM c ORDER BY doc_id, chunk_idx
        """,
        doc="sliding-window document chunking (50-token chunks, 10-token "
            "overlap -> stride 40) — the context-window prep step before "
            "embedding/training; pure slice expressions, zero shuffle "
            "beyond the result sort. Oracle mirrors the chunk arithmetic "
            "with DuckDB's 1-based inclusive list slicing",
        tags=("llm", "capability"),
    )
    def doc_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
        docs = fixture_df(spark, sf_dir, "documents")
        return chunk_documents(docs).orderBy("doc_id", "chunk_idx")

    @register(
        "bigram_logprob_quality",
        """
        WITH t AS (
          SELECT doc_id,
                 list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                             x -> x <> '') AS ts
          FROM documents),
        bg AS (
          SELECT doc_id, ts[i] AS w1, ts[i + 1] AS w2
          FROM (SELECT doc_id, ts,
                       unnest(generate_series(1, len(ts) - 1)) AS i
                FROM t WHERE len(ts) >= 2) x),
        cb AS (SELECT w1, w2, count(*) AS cb FROM bg GROUP BY w1, w2),
        cw AS (SELECT w1, count(*) AS cw FROM bg GROUP BY w1)
        SELECT b.doc_id,
               CAST(count(*) AS BIGINT) AS n_bigrams,
               round(avg(ln(cb.cb) - ln(cw.cw)), 4) AS lm2_score
        FROM bg b
        JOIN cb ON b.w1 = cb.w1 AND b.w2 = cb.w2
        JOIN cw ON b.w1 = cw.w1
        WHERE b.doc_id < 100
        GROUP BY b.doc_id ORDER BY b.doc_id
        """,
        doc="per-document MLE bigram conditional log-probability (word-"
            "order-aware LM quality, one step past the unigram proxy): "
            "avg ln c(w1,w2) - ln c(w1,.) over corpus-trained counts; "
            "bigrams built from zipped array slices (pure Catalyst, no "
            "posexplode self-join)",
        tags=("llm",),
    )
    def bigram_logprob_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
        docs = fixture_df(spark, sf_dir, "documents")
        return (
            bigram_logprob(docs)
            .filter(F.col("doc_id") < 100)
            .orderBy("doc_id")
        )

    @register(
        "winnow_fingerprints",
        """
        WITH d AS (
          SELECT doc_id, lower(text) AS t, length(text) AS L
          FROM documents WHERE doc_id < 60 AND length(text) >= 5),
        g0 AS (
          SELECT doc_id, pos, md5(substr(t, pos, 5)) AS hx, npos
          FROM (SELECT doc_id, t, L - 4 AS npos,
                       unnest(generate_series(1, L - 4)) AS pos
                FROM d) x),
        g AS (
          SELECT doc_id, pos, npos,
                 (((ascii(substr(hx,1,1)) - CASE WHEN ascii(substr(hx,1,1)) >= 97
                      THEN 87 ELSE 48 END) * 16
                  + (ascii(substr(hx,2,1)) - CASE WHEN ascii(substr(hx,2,1)) >= 97
                      THEN 87 ELSE 48 END)) * 16
                  + (ascii(substr(hx,3,1)) - CASE WHEN ascii(substr(hx,3,1)) >= 97
                      THEN 87 ELSE 48 END)) * 16
                  + (ascii(substr(hx,4,1)) - CASE WHEN ascii(substr(hx,4,1)) >= 97
                      THEN 87 ELSE 48 END) AS h
          FROM g0),
        win AS (
          SELECT doc_id, t, mn FROM (
            SELECT doc_id, pos AS t, npos,
                   min(h) OVER (PARTITION BY doc_id ORDER BY pos
                                ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS mn
            FROM g) x
          WHERE t <= npos - 3),
        sel AS (
          SELECT w.doc_id, w.t, max(g.pos) AS sp
          FROM win w JOIN g
            ON g.doc_id = w.doc_id AND g.pos BETWEEN w.t AND w.t + 3
               AND g.h = w.mn
          GROUP BY w.doc_id, w.t),
        fp AS (SELECT DISTINCT doc_id, sp FROM sel)
        SELECT f.doc_id,
               CAST(count(*) AS BIGINT) AS n_fingerprints,
               CAST(sum(g.h) AS BIGINT) AS fp_checksum
        FROM fp f JOIN g ON g.doc_id = f.doc_id AND g.pos = f.sp
        GROUP BY f.doc_id ORDER BY f.doc_id
        """,
        doc="winnowing document fingerprints (Schleimer/Wilkerson/Aiken "
            "SIGMOD'03, the MOSS algorithm): 16-bit md5-derived hashes of "
            "char 5-grams, rightmost-minimum selected per sliding window "
            "of 4 — guarantees a fingerprint density of ~2/(w+1) with "
            "at least one selection per window, the local property plain "
            "mod-p fingerprinting lacks; entry returns per-doc "
            "fingerprint count + checksum",
        tags=("llm",),
    )
    def winnow_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
        from .sampling import _hex_digit

        k, w = 5, 4
        docs = (
            fixture_df(spark, sf_dir, "documents")
            .filter((F.col("doc_id") < 60) & (F.length("text") >= k))
            .select("doc_id", F.lower(F.col("text")).alias("t"),
                    F.length("text").alias("L"))
        )
        g = docs.select(
            "doc_id",
            (F.col("L") - (k - 1)).alias("npos"),
            F.explode(F.sequence(F.lit(1), F.col("L") - (k - 1))).alias("pos"),
            "t",
        ).select(
            "doc_id", "npos", "pos",
            F.md5(F.expr(f"substr(t, pos, {k})")).alias("hx"),
        )
        h = F.lit(0)
        for i in range(1, 5):
            h = h * 16 + _hex_digit(F.substring("hx", i, 1))
        g = g.select("doc_id", "npos", "pos", h.alias("h"))

        from pyspark.sql import Window as W

        frame = W.partitionBy("doc_id").orderBy("pos").rowsBetween(0, w - 1)
        win = (
            g.withColumn("mn", F.min("h").over(frame))
            .filter(F.col("pos") <= F.col("npos") - (w - 1))
            .select("doc_id", F.col("pos").alias("t"), "mn")
        )
        sel = (
            win.alias("w")
            .join(
                g.alias("g"),
                (F.col("g.doc_id") == F.col("w.doc_id"))
                & F.col("g.pos").between(F.col("w.t"), F.col("w.t") + (w - 1))
                & (F.col("g.h") == F.col("w.mn")),
            )
            .groupBy(F.col("w.doc_id").alias("doc_id"), F.col("w.t").alias("t"))
            .agg(F.max("g.pos").alias("sp"))
        )
        fp = sel.select("doc_id", "sp").distinct()
        return (
            fp.alias("f")
            .join(
                g.alias("g2"),
                (F.col("g2.doc_id") == F.col("f.doc_id"))
                & (F.col("g2.pos") == F.col("f.sp")),
            )
            .groupBy(F.col("f.doc_id").alias("doc_id"))
            .agg(
                F.count("*").cast("long").alias("n_fingerprints"),
                F.sum("g2.h").cast("long").alias("fp_checksum"),
            )
            .orderBy("doc_id")
        )

    @register(
        "char_entropy_quality",
        """
        WITH c AS (
          SELECT doc_id, t.ch, length(text) AS L
          FROM documents,
               UNNEST(string_split_regex(lower(text), '')) AS t(ch)
          WHERE doc_id < 100 AND length(text) > 0),
        k AS (SELECT doc_id, ch, L, count(*) AS n
              FROM c GROUP BY doc_id, ch, L)
        SELECT doc_id,
               CAST(count(*) AS BIGINT) AS n_distinct_chars,
               round(-sum((n * 1.0 / L) * ln(n * 1.0 / L)), 4) AS entropy
        FROM k GROUP BY doc_id ORDER BY doc_id
        """,
        doc="per-document Shannon character entropy (nats) — the cheap "
            "gibberish/compression-artifact signal: natural prose sits "
            "in a narrow entropy band, base64 blobs and aaaa-runs fall "
            "far outside it; explode-chars + two count aggs, the same "
            "token-relation shape every text op pays",
        tags=("llm",),
    )
    def char_entropy_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
        docs = fixture_df(spark, sf_dir, "documents").filter(
            (F.col("doc_id") < 100) & (F.length("text") > 0)
        )
        chars = docs.select(
            "doc_id",
            F.length("text").alias("L"),
            F.explode(F.split(F.lower(F.col("text")), "")).alias("ch"),
        ).filter(F.col("ch") != "")
        p = F.col("n") / F.col("L")
        return (
            chars.groupBy("doc_id", "ch", "L")
            .agg(F.count("*").alias("n"))
            .groupBy("doc_id")
            .agg(
                F.count("*").cast("long").alias("n_distinct_chars"),
                F.round(-F.sum(p * F.log(p)), 4).alias("entropy"),
            )
            .orderBy("doc_id")
        )

    @register(
        "bpe_encode_corpus",
        """
        SELECT true AS encode_ok,
               (SELECT CAST(count(*) AS BIGINT)
                FROM documents WHERE doc_id < 200) AS n_docs,
               (SELECT CAST(sum(length(array_to_string(
                        list_filter(string_split_regex(lower(text),
                                    '[^a-z0-9]+'), x -> x <> ''), ''))) AS BIGINT)
                FROM documents WHERE doc_id < 200) AS total_alnum_chars
        """,
        doc="distributed BPE ENCODE over the corpus with the trained "
            "merge table broadcast to executors (the inference half of "
            "bpe_train): every word's segmentation must concatenate "
            "back to the word (lossless), per-word piece counts never "
            "exceed character counts, and the character mass the "
            "encoder saw must equal the oracle's SQL-computed total — "
            "a tokenization-drift bug between the Python and SQL "
            "tokenizers breaks the count equality",
        tags=("llm", "capability"),
    )
    def bpe_encode_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
        from collections.abc import Iterator as _Iter

        import pandas as pd

        docs = fixture_df(spark, sf_dir, "documents").filter(
            F.col("doc_id") < 200
        )
        merges = bpe_train(docs, n_merges=30)

        def _encode(batches: _Iter[pd.DataFrame]) -> _Iter[pd.DataFrame]:
            import re

            tok_re = re.compile(r"[^a-z0-9]+")
            for pdf in batches:
                ok, chars, pieces, n = True, 0, 0, 0
                for text in pdf["text"]:
                    n += 1
                    words = [w for w in tok_re.split(str(text).lower()) if w]
                    for w in words:
                        seg = bpe_segment(w, merges)
                        if "".join(seg) != w or len(seg) > len(w):
                            ok = False
                        chars += len(w)
                        pieces += len(seg)
                yield pd.DataFrame(
                    {"ok": [ok and pieces <= chars], "n_docs": [n],
                     "chars": [chars], "pieces": [pieces]}
                )

        parts = docs.select("text").mapInPandas(
            _encode, "ok boolean, n_docs long, chars long, pieces long"
        ).collect()
        return spark.createDataFrame(
            [(
                bool(all(r["ok"] for r in parts)),
                int(sum(r["n_docs"] for r in parts)),
                int(sum(r["chars"] for r in parts)),
            )],
            "encode_ok boolean, n_docs long, total_alnum_chars long",
        )

    @register(
        "boilerplate_ngrams",
        """
        WITH toks AS (
          SELECT doc_id, string_split(text, ' ') AS t FROM documents
        ),
        grams AS (
          SELECT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS g
          FROM toks, UNNEST(range(1, len(t) - 1)) AS r(i)
        ),
        boiler AS (
          SELECT g FROM grams GROUP BY g HAVING COUNT(DISTINCT doc_id) >= 5
        ),
        perdoc AS (
          SELECT d.doc_id,
                 CAST(COUNT(*) AS BIGINT) AS n_grams,
                 CAST(SUM(CASE WHEN b.g IS NOT NULL THEN 1 ELSE 0 END)
                      AS BIGINT) AS n_boiler
          FROM grams d LEFT JOIN boiler b USING (g)
          GROUP BY d.doc_id
        )
        SELECT doc_id, n_grams, n_boiler,
               round(n_boiler * 1.0 / n_grams, 6) AS boiler_frac
        FROM perdoc WHERE n_boiler > 0 ORDER BY doc_id
        """,
        doc="cross-document boilerplate detection (the corpus-level face "
            "of C4's repeated-line removal): word 3-grams occurring in "
            ">=5 distinct docs are boilerplate; per-doc boilerplate "
            "fraction flags template-heavy documents. Distinct from "
            "substring_dup_spans (within-doc) and winnow_fingerprints "
            "(pairwise overlap): this is a corpus-global phrase "
            "frequency. Scale shape: one shuffle to count grams (the "
            "corpus-sized table; at 100 TB you shuffle xxhash64(g) "
            "instead of the strings to cut width — strings kept here "
            "for oracle parity), then the small boiler set broadcasts "
            "back (AQE) and one per-doc agg.",
        tags=("llm",),
    )
    def boilerplate_ngrams(spark, sf_dir):
        from pyspark.sql import Window as W

        docs = fixture_df(spark, sf_dir, "documents")
        toks = docs.select(
            "doc_id", F.posexplode(F.split(F.col("text"), " ")).alias("pos", "tok")
        )
        w = W.partitionBy("doc_id").orderBy("pos")
        nxt1, nxt2 = F.lead("tok", 1).over(w), F.lead("tok", 2).over(w)
        grams = toks.select(
            "doc_id",
            F.concat_ws(" ", F.col("tok"), nxt1, nxt2).alias("g"),
            nxt2.isNotNull().alias("_full"),
        ).filter("_full").drop("_full")
        boiler = (
            grams.groupBy("g")
            .agg(F.count_distinct("doc_id").alias("nd"))
            .filter(F.col("nd") >= 5)
            .select("g", F.lit(1).alias("_b"))
        )
        return (
            grams.join(boiler, "g", "left")
            .groupBy("doc_id")
            .agg(
                F.count("*").alias("n_grams"),
                F.sum(F.when(F.col("_b").isNotNull(), 1).otherwise(0))
                .cast("bigint").alias("n_boiler"),
            )
            .filter(F.col("n_boiler") > 0)
            .select(
                "doc_id", "n_grams", "n_boiler",
                F.round(F.col("n_boiler") / F.col("n_grams"), 6)
                .alias("boiler_frac"),
            )
            .orderBy("doc_id")
        )

    @register(
        "ngram_novelty",
        """
        WITH toks AS (
          SELECT doc_id, string_split(text, ' ') AS t FROM documents
        ),
        grams AS (
          SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS g
          FROM toks, UNNEST(range(1, len(t) - 1)) AS r(i)
        ),
        firsts AS (SELECT g, min(doc_id) AS first_doc FROM grams GROUP BY g)
        SELECT gr.doc_id,
               CAST(count(*) AS BIGINT) AS n_distinct_grams,
               CAST(sum(CASE WHEN f.first_doc = gr.doc_id THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_novel,
               round(sum(CASE WHEN f.first_doc = gr.doc_id THEN 1 ELSE 0 END)
                     * 1.0 / count(*), 6) AS novelty
        FROM grams gr JOIN firsts f USING (g)
        GROUP BY gr.doc_id ORDER BY gr.doc_id
        """,
        doc="per-document n-gram novelty: the fraction of a doc's "
            "distinct 3-grams whose FIRST corpus occurrence (min doc_id "
            "= ingestion order) is this doc — the duplication-"
            "attribution view used to audit corpus ordering and "
            "incremental crawls (a doc full of already-seen phrases "
            "scores near 0). Spark shape: distinct grams (shuffle on "
            "(doc, g)), first-occurrence via min window over g (shuffle "
            "on g), per-doc agg — the window reuses nothing but stays "
            "one pass; no join needed where the oracle uses one",
        tags=("llm",),
    )
    def ngram_novelty(spark, sf_dir):
        from pyspark.sql import Window as W

        docs = fixture_df(spark, sf_dir, "documents")
        toks = docs.select(
            "doc_id", F.posexplode(F.split(F.col("text"), " ")).alias("pos", "tok")
        )
        w = W.partitionBy("doc_id").orderBy("pos")
        nxt1, nxt2 = F.lead("tok", 1).over(w), F.lead("tok", 2).over(w)
        grams = (
            toks.select(
                "doc_id",
                F.concat_ws(" ", F.col("tok"), nxt1, nxt2).alias("g"),
                nxt2.isNotNull().alias("_full"),
            )
            .filter("_full")
            .select("doc_id", "g")
            .distinct()
        )
        first_doc = F.min("doc_id").over(W.partitionBy("g"))
        return (
            grams.withColumn("first_doc", first_doc)
            .groupBy("doc_id")
            .agg(
                F.count("*").alias("n_distinct_grams"),
                F.sum(
                    F.when(F.col("first_doc") == F.col("doc_id"), 1).otherwise(0)
                ).cast("bigint").alias("n_novel"),
            )
            .select(
                "doc_id", "n_distinct_grams", "n_novel",
                F.round(F.col("n_novel") / F.col("n_distinct_grams"), 6)
                .alias("novelty"),
            )
            .orderBy("doc_id")
        )

    @register(
        "pmi_collocations",
        """
        WITH toks AS (
          SELECT string_split(lower(text), ' ') AS t FROM documents
        ),
        big AS (
          SELECT unnest(list_transform(range(1, len(t)),
                                       i -> t[i] || ' ' || t[i+1])) AS bg
          FROM toks
        ),
        bc AS (SELECT bg, count(*) AS c FROM big GROUP BY bg),
        uni AS (SELECT unnest(t) AS w FROM toks),
        uc AS (SELECT w, count(*) AS c FROM uni GROUP BY w),
        nb AS (SELECT sum(c) AS n FROM bc),
        nu AS (SELECT sum(c) AS n FROM uc)
        SELECT b.bg AS bigram, CAST(b.c AS BIGINT) AS n,
               round(ln((b.c * 1.0 / nb.n) /
                        ((u1.c * 1.0 / nu.n) * (u2.c * 1.0 / nu.n))), 6)
                 AS pmi
        FROM bc b
        JOIN uc u1 ON u1.w = string_split(b.bg, ' ')[1]
        JOIN uc u2 ON u2.w = string_split(b.bg, ' ')[2]
        CROSS JOIN nb CROSS JOIN nu
        WHERE b.c >= greatest(25, CAST(floor(nb.n / 10000.0) AS BIGINT))
        ORDER BY bigram
        """,
        doc="collocation mining via pointwise mutual information: "
            "ln(p(xy) / (p(x)p(y))) over whitespace bigrams with a "
            "min-count support filter (the phrase-mining primitive for "
            "tokenizer/vocab curation). Scale shape: bigram and unigram "
            "count tables are vocabulary-sized; the unigram enrichment "
            "joins carry no forced hint (AQE broadcasts them while they "
            "fit, degrades to shuffle when a web-scale vocabulary does "
            "not) and only the single-row totals are hint-broadcast — "
            "corpus bytes are scanned exactly once per n-gram order, and "
            "no per-bigram value accumulates across partitions (PMI is a "
            "pure function of four counts). The min-count support is "
            "CORPUS-DERIVED: greatest(25, total_bigrams/10000) — 25 is "
            "the statistical-stability floor (PMI is noise below ~25 "
            "observations) and the linear term keeps the result "
            "vocabulary-bounded as the corpus grows instead of admitting "
            "every noise bigram that crosses a fixed count at web scale; "
            "identical integer derivation on both engines",
        tags=("llm",),
    )
    def pmi_collocations(spark, sf_dir):
        docs = fixture_df(spark, sf_dir, "documents")
        t = docs.select(F.split(F.lower("text"), " ").alias("t"))
        pairs = t.select(
            F.explode(
                F.expr(
                    "zip_with(slice(t, 1, size(t) - 1), "
                    "slice(t, 2, size(t) - 1), "
                    "(a, b) -> struct(a AS w1, b AS w2))"
                )
            ).alias("p")
        ).select("p.w1", "p.w2")
        bc = pairs.groupBy("w1", "w2").agg(F.count("*").alias("c"))
        uc = (
            t.select(F.explode("t").alias("w"))
            .groupBy("w")
            .agg(F.count("*").alias("uc"))
        )
        nb = bc.agg(F.sum("c").alias("nb"))
        nu = uc.agg(F.sum("uc").alias("nu"))
        u1 = uc.withColumnRenamed("w", "w1").withColumnRenamed("uc", "c1")
        u2 = uc.withColumnRenamed("w", "w2").withColumnRenamed("uc", "c2")
        # No hard broadcast hint on u1/u2: a web-scale unigram vocabulary
        # is tens of millions of rows, and a forced F.broadcast would
        # override AQE's size judgment (driver/executor OOM risk) where an
        # unhinted join degrades to shuffle gracefully. At test scale AQE
        # still broadcasts them (plan-gated in test_plans.py). Hints stay
        # only on the single-row totals nb/nu.
        # support threshold derived from the corpus size (nb is a 1-row
        # broadcast, so the filter is a scalar comparison applied during
        # the bigram-count scan — no extra shuffle)
        thr = F.greatest(
            F.lit(25).cast("bigint"),
            F.floor(F.col("nb") / 10000.0).cast("bigint"),
        )
        return (
            bc.crossJoin(F.broadcast(nb))
            .filter(F.col("c") >= thr)
            .join(u1, "w1")
            .join(u2, "w2")
            .crossJoin(F.broadcast(nu))
            .select(
                F.concat_ws(" ", "w1", "w2").alias("bigram"),
                F.col("c").cast("bigint").alias("n"),
                F.round(
                    F.log(
                        (F.col("c") / F.col("nb"))
                        / ((F.col("c1") / F.col("nu"))
                           * (F.col("c2") / F.col("nu")))
                    ),
                    6,
                ).alias("pmi"),
            )
            .orderBy("bigram")
        )

    @register(
        "kl_divergence_sources",
        """
        WITH toks AS (
          SELECT source, unnest(string_split(lower(text), ' ')) AS w
          FROM documents
        ),
        sc AS (SELECT source, w, count(*) AS c FROM toks GROUP BY 1, 2),
        st AS (SELECT source, sum(c) AS n FROM sc GROUP BY 1),
        gc AS (SELECT w, sum(c) AS gcnt FROM sc GROUP BY 1),
        gt AS (SELECT sum(gcnt) AS gn FROM gc)
        SELECT sc.source,
               round(sum((sc.c * 1.0 / st.n) *
                         ln((sc.c * 1.0 / st.n) / (gc.gcnt * 1.0 / gt.gn))),
                     4) AS kl_nats
        FROM sc JOIN st USING (source) JOIN gc USING (w) CROSS JOIN gt
        GROUP BY sc.source ORDER BY sc.source
        """,
        doc="per-source distribution drift: KL(source unigram dist || "
            "corpus unigram dist) — the source-mixing diagnostic that "
            "flags a crawl slice whose vocabulary departed from the "
            "blend. All intermediates are (source x vocab)- or "
            "vocab-sized; per-source totals broadcast by hint (bounded "
            "by source count); the vocab-sized global count table joins "
            "unhinted so AQE decides; the final sum is one agg over the "
            "sc table. Rounded to 4 (summed doubles accumulate in "
            "engine-specific order)",
        tags=("llm",),
    )
    def kl_divergence_sources(spark, sf_dir):
        docs = fixture_df(spark, sf_dir, "documents")
        toks = docs.select(
            "source", F.explode(F.split(F.lower("text"), " ")).alias("w")
        )
        sc = toks.groupBy("source", "w").agg(F.count("*").alias("c"))
        st = sc.groupBy("source").agg(F.sum("c").alias("n"))
        gc = sc.groupBy("w").agg(F.sum("c").alias("gcnt"))
        gt = gc.agg(F.sum("gcnt").alias("gn"))
        term = (F.col("c") / F.col("n")) * F.log(
            (F.col("c") / F.col("n")) / (F.col("gcnt") / F.col("gn"))
        )
        # gc is vocabulary-sized (unbounded at web scale) — no hard
        # broadcast hint; AQE broadcasts it at test scale (plan-gated).
        # st (one row per source) and gt (scalar) keep their hints.
        return (
            sc.join(F.broadcast(st), "source")
            .join(gc, "w")
            .crossJoin(F.broadcast(gt))
            .groupBy("source")
            .agg(F.round(F.sum(term), 4).alias("kl_nats"))
            .orderBy("source")
        )

    @register(
        "vocab_jaccard_sources",
        """
        WITH v AS (
          SELECT DISTINCT source, unnest(string_split(lower(text), ' ')) AS w
          FROM documents
        ),
        sz AS (SELECT source, count(*) AS n FROM v GROUP BY 1),
        ix AS (
          SELECT a.source AS source_a, b.source AS source_b,
                 count(*) AS i
          FROM v a JOIN v b ON a.w = b.w AND a.source < b.source
          GROUP BY 1, 2
        )
        SELECT source_a, source_b, CAST(i AS BIGINT) AS n_common,
               round(i * 1.0 / (sa.n + sb.n - i), 6) AS jaccard
        FROM ix
        JOIN sz sa ON sa.source = source_a
        JOIN sz sb ON sb.source = source_b
        ORDER BY source_a, source_b
        """,
        doc="pairwise vocabulary overlap between sources (exact Jaccard "
            "over distinct-token sets) — the corpus-composition view of "
            "which slices are near-redundant. The distinct (source, "
            "token) table is at most sources x vocab; the self-join "
            "shuffles on the token key and the output is sources^2 "
            "rows, so nothing here grows with corpus bytes",
        tags=("llm",),
    )
    def vocab_jaccard_sources(spark, sf_dir):
        docs = fixture_df(spark, sf_dir, "documents")
        v = docs.select(
            "source", F.explode(F.split(F.lower("text"), " ")).alias("w")
        ).distinct()
        sz = v.groupBy("source").agg(F.count("*").alias("n"))
        a = v.alias("a")
        b = v.alias("b")
        ix = (
            a.join(b, (F.col("a.w") == F.col("b.w"))
                   & (F.col("a.source") < F.col("b.source")))
            .groupBy(
                F.col("a.source").alias("source_a"),
                F.col("b.source").alias("source_b"),
            )
            .agg(F.count("*").alias("i"))
        )
        sa = F.broadcast(
            sz.withColumnRenamed("source", "source_a")
            .withColumnRenamed("n", "na")
        )
        sb = F.broadcast(
            sz.withColumnRenamed("source", "source_b")
            .withColumnRenamed("n", "nb")
        )
        return (
            ix.join(sa, "source_a")
            .join(sb, "source_b")
            .select(
                "source_a", "source_b",
                F.col("i").cast("bigint").alias("n_common"),
                F.round(
                    F.col("i") / (F.col("na") + F.col("nb") - F.col("i")), 6
                ).alias("jaccard"),
            )
            .orderBy("source_a", "source_b")
        )

    @register(
        "dup_cluster_size_dist",
        """
        WITH h AS (
          SELECT md5(substr(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g'),
                            1, 50)) AS fp
          FROM documents
        ),
        c AS (SELECT fp, count(*) AS sz FROM h GROUP BY fp)
        SELECT CAST(sz AS BIGINT) AS cluster_size,
               CAST(count(*) AS BIGINT) AS n_clusters,
               CAST(sz * count(*) AS BIGINT) AS n_docs
        FROM c GROUP BY sz ORDER BY sz
        """,
        doc="duplicate cluster-size histogram over normalized 50-char "
            "prefix fingerprints: the dedup *audit* view (how much of "
            "the corpus sits in clusters of size k — prefix clustering "
            "catches boilerplate-led documents that exact full-text "
            "hashing misses). Two key-bounded aggs — fingerprint then "
            "size — with map-side partials; the second agg's domain is "
            "the handful of distinct cluster sizes",
        tags=("llm",),
    )
    def dup_cluster_size_dist(spark, sf_dir):
        docs = fixture_df(spark, sf_dir, "documents")
        fp = F.md5(
            F.substring(
                F.regexp_replace(F.trim(F.lower("text")), r"\s+", " "),
                1, 50,
            )
        )
        c = (
            docs.select(fp.alias("fingerprint"))
            .groupBy("fingerprint")
            .agg(F.count("*").alias("sz"))
        )
        return (
            c.groupBy(F.col("sz").cast("bigint").alias("cluster_size"))
            .agg(F.count("*").alias("n_clusters"))
            .select(
                "cluster_size",
                F.col("n_clusters").cast("bigint").alias("n_clusters"),
                (F.col("cluster_size") * F.col("n_clusters"))
                .cast("bigint").alias("n_docs"),
            )
            .orderBy("cluster_size")
        )


def register_vocab_coverage(register) -> None:
    @register(
        "vocab_coverage_curve",
        """
        WITH w AS (
          SELECT unnest(list_filter(
                   string_split_regex(lower(text), '[^a-z0-9]+'),
                   x -> x <> '')) AS w
          FROM documents),
        c AS (SELECT w, CAST(count(*) AS BIGINT) AS n FROM w GROUP BY 1),
        tot AS (SELECT sum(n) AS t, count(*) AS v FROM c),
        r AS (
          SELECT n, row_number() OVER (ORDER BY n DESC, w) AS rnk
          FROM c),
        k AS (SELECT unnest([100, 1000, 10000]) AS k)
        SELECT k.k AS vocab_size,
               CAST(min(tot.v) AS BIGINT) AS n_distinct_words,
               CAST(sum(CASE WHEN r.rnk <= k.k THEN r.n ELSE 0 END)
                    AS BIGINT) AS covered_tokens,
               CAST(min(tot.t) AS BIGINT) AS total_tokens,
               round(CAST(sum(CASE WHEN r.rnk <= k.k THEN r.n ELSE 0 END)
                          AS DOUBLE) / min(tot.t), 6) AS coverage
        FROM r CROSS JOIN k CROSS JOIN tot
        GROUP BY k.k ORDER BY k.k
        """,
        doc="Vocabulary coverage curve: the fraction of corpus tokens "
            "covered by the top-k most frequent words for k in "
            "{100, 1k, 10k} — the number that sizes a tokenizer "
            "vocabulary (and explains why BPE exists: word-level "
            "coverage saturates slowly on heavy-tailed corpora; "
            "companion to zipf_slope_top_tokens and bpe_train). One "
            "word-frequency shuffle; only the top-10k ranks can ever "
            "matter (max k), so the shortlist is TakeOrderedAndProject "
            "(per-partition top-10k, merge — the zipf_slope_top_tokens "
            "pattern) and the rank window runs over AT MOST 10k rows "
            "no matter the corpus size; totals come from the full "
            "vocabulary aggregate. A web-scale vocabulary (hundreds of "
            "millions of typo/URL/number words at 100 TB) never sorts "
            "in one task (round-11 verdict task 2).",
        tags=("llm", "capability"),
    )
    def vocab_coverage_curve(spark, sf_dir):
        from pyspark.sql import functions as F

        docs = fixture_df(spark, sf_dir, "documents")
        words = docs.select(
            F.explode(
                F.filter(
                    F.split(F.lower(F.col("text")), "[^a-z0-9]+"),
                    lambda x: x != "",
                )
            ).alias("w")
        )
        c = words.groupBy("w").agg(F.count("*").cast("bigint").alias("n"))
        tot = c.agg(
            F.sum("n").cast("bigint").alias("t"),
            F.count("*").cast("bigint").alias("v"),
        )
        from pyspark.sql import Window as W

        # shortlist FIRST (TakeOrderedAndProject — bounded at 10k rows,
        # the largest k), then rank within the shortlist: the window
        # input is capped by construction, never vocabulary-sized
        top = c.orderBy(F.col("n").desc(), "w").limit(10000)
        r = top.select(
            "n",
            F.row_number()
            .over(W.orderBy(F.col("n").desc(), "w"))
            .alias("rnk"),
        )
        ks = docs.sparkSession.createDataFrame(
            [(100,), (1000,), (10000,)], "k long"
        )
        joined = r.crossJoin(F.broadcast(ks)).crossJoin(F.broadcast(tot))
        return (
            joined.groupBy("k")
            .agg(
                F.min("v").cast("bigint").alias("n_distinct_words"),
                F.sum(F.when(F.col("rnk") <= F.col("k"), F.col("n"))
                      .otherwise(F.lit(0))).cast("bigint")
                .alias("covered_tokens"),
                F.min("t").cast("bigint").alias("total_tokens"),
                F.round(
                    F.sum(F.when(F.col("rnk") <= F.col("k"), F.col("n"))
                          .otherwise(F.lit(0))).cast("double")
                    / F.min("t"),
                    6,
                ).alias("coverage"),
            )
            .select(
                F.col("k").alias("vocab_size"),
                "n_distinct_words", "covered_tokens",
                "total_tokens", "coverage",
            )
            .orderBy("vocab_size")
        )
