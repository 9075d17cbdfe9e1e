"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Scale design notes (the point of each variant):

- **exact**: one hash-shuffle on the fingerprint — the cheapest pass,
  run it first; at 100 TB this is a single groupBy over a 16-byte key.
- **exact n-gram Jaccard**: quadratic in the worst case; bounded here
  by joining on shared tokens (inverted-index join) so only pairs with
  ≥1 common token materialize. The *oracle-checked* ground truth for
  the approximate variants at small SF.
- **MinHash+LSH**: the scale path. Signatures are built with k
  independent hash functions entirely in JVM expressions
  (``xxhash64(seed_i, shingle)`` + min-aggregate — no UDF), then
  banded: equal band-hash ⇒ candidate pair. Cost is linear in corpus
  size + output pairs; the band join is a shuffle on band keys.
- **SimHash**: 64-bit signature via per-bit majority vote of token
  hashes; near-dups = signatures within small Hamming distance,
  bucketed by 4 disjoint 16-bit blocks — by pigeonhole, any pair with
  Hamming ≤ 3 agrees exactly on at least one block, so block-bucketing
  is *complete* (no missed pairs) for the default distance. 16-bit
  block keys (65k buckets/block) plus a ``max_bucket_size`` cap keep
  the verify join bounded at corpus scale.
- **incremental / Bloom-prefiltered**: the steady-state shapes — an
  arriving batch checks a fingerprint store instead of re-deduping the
  corpus; the Bloom gate (``bloom_prefilter_dedup``) keeps all but the
  true-dup sliver of the batch away from the store join entirely.
- **prefix-filtered similarity join** (PPJoin family): rarest-first
  token ordering lets only each set's short prefix enter the inverted
  join — the candidate-generation strategy that stays feasible when
  common tokens dominate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..fixtures import fixture_df


def shingles(col, n: int = 3):
    """Word n-gram shingles of lowercased text, as an array column.

    Pure Catalyst expression — but note ``slice`` inside ``transform``
    makes this O(tokens²) per row in codegen. Fine for short strings
    (titles, ids); for document-scale text use the posexplode +
    window-``lead`` path in :func:`minhash_signatures`, which is linear."""
    toks = F.split(F.lower(col), " ")
    k = F.greatest(F.size(toks) - (n - 1), F.lit(1))
    return F.transform(
        F.sequence(F.lit(0), k - 1),
        lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
    )


def exact_duplicates(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Group by normalized-text md5; return one row per distinct text
    with the representative (min id) and duplicate count."""
    normalized = F.regexp_replace(F.trim(F.lower(F.col(text_col))), r"\s+", " ")
    return (
        df.select(F.col(id_col), F.md5(normalized.cast("binary")).alias("fp"))
        .groupBy("fp")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count("*").cast("bigint").alias("n_copies"),
        )
    )


def shingle_hashes(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
) -> DataFrame:
    """(id, h0) — one xxhash64 per word-n-gram shingle occurrence.

    Linear in token count: posexplode tokens → window ``lead`` builds
    each shingle from its n successors → one base hash per shingle.
    Two rejected alternatives, both measured at sf0.1 (5k docs):
    ``transform(sequence, slice)`` is O(tokens²) inside codegen (144 s
    vs ~4 s); ``transform(sequence, element_at×n)`` is linear and
    shuffle-free but 4× slower end-to-end (3.5 s vs 0.9 s) because
    higher-order-function lambdas evaluate interpreted per element
    while the window path stays inside whole-stage codegen. Shared by
    MinHash signatures and the exact shingle-Jaccard ground truth so
    both operate on identical shingle sets."""
    from pyspark.sql import Window as W

    toks = F.split(F.lower(F.col(text_col)), " ")
    ex = df.select(F.col(id_col), F.posexplode(toks).alias("pos", "tok"))
    w = W.partitionBy(id_col).orderBy("pos")
    successors = [F.lead("tok", i).over(w) for i in range(1, shingle_n)]
    return ex.select(
        F.col(id_col),
        F.col("pos"),
        F.xxhash64(F.col("tok"), *successors).alias("h0"),
        successors[-1].isNotNull().alias("full"),
    ).filter(F.col("full") | (F.col("pos") == 0))  # short docs keep 1 partial shingle


class SignatureStore:
    """Process-local store of eagerly-materialized signature DataFrames.

    At 100 TB, MinHash signatures are a TABLE, not a per-query
    intermediate: they are computed once per corpus generation (at
    ingest, or by a scheduled job), persisted next to the corpus, and
    every LSH/dedup query joins against the stored signatures instead
    of re-shingling the whole corpus. Recomputing signatures per query
    is the single largest avoidable cost in the pipeline — the shingle
    explode + window is linear in total token count, i.e. in corpus
    bytes, while the banded pair join touches only signature rows
    (corpus cardinality × num_hashes longs, ~3 orders of magnitude
    smaller).

    This class models that steady state inside one process:
    ``get_or_build(spark, key, builder)`` materializes the builder's
    DataFrame via ``localCheckpoint(eager=True)`` on first use and
    reuses the checkpointed result until ``invalidate``. Entries are
    keyed per Spark application (a checkpoint dies with its context) —
    a new session never sees a stale handle. On a real cluster the
    same role is played by a parquet signature table partitioned like
    the corpus; this store is the session-local analogue.
    """

    def __init__(self) -> None:
        self._sigs: dict[tuple, DataFrame] = {}

    def get_or_build(self, spark: SparkSession, key: tuple | str,
                     builder) -> DataFrame:
        full_key = (spark.sparkContext.applicationId,) + (
            tuple(key) if isinstance(key, tuple) else (key,)
        )
        df = self._sigs.get(full_key)
        if df is None:
            df = builder().localCheckpoint(eager=True)
            self._sigs[full_key] = df
        return df

    def invalidate(self, key: tuple | str | None = None) -> None:
        """Drop one key's entries (any application) or everything —
        call after the underlying corpus changes generation."""
        if key is None:
            self._sigs.clear()
            return
        tail = tuple(key) if isinstance(key, tuple) else (key,)
        for k in [k for k in self._sigs if k[1:] == tail]:
            del self._sigs[k]


#: module-level store: one signature build per (corpus, params) per
#: Spark application, shared by every caller in the process
SIGNATURES = SignatureStore()


def persist_signature_table(
    df: DataFrame,
    table_name: str,
    id_col: str = "doc_id",
    num_buckets: int = 16,
) -> None:
    """The cluster-durable form of :class:`SignatureStore`: write the
    signature DataFrame as a bucketed (+bucket-sorted) parquet table,
    bucketed by the document id. Signatures survive the Spark
    application (the in-process store's checkpoint does not), and every
    downstream id-equi-join — survivor resolution after pair finding,
    enriching incremental-dedup probes, joining signatures back to the
    corpus — reads co-located buckets with NO exchange on the signature
    side. The banded LSH self-join still shuffles on (band, bucket) as
    it must; what the table removes is the per-query re-shingle AND the
    recurring id-join shuffles around it."""
    from ..bucketing import write_bucketed

    write_bucketed(df, table_name, id_col, num_buckets=num_buckets)


def load_signature_table(spark: SparkSession, table_name: str) -> DataFrame:
    """Read a persisted signature table (bucket metadata comes from the
    session catalog, so joins on the bucket column skip the exchange)."""
    return spark.table(table_name)


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    shingle_n: int = 3,
) -> DataFrame:
    """MinHash signature per document: for each of ``num_hashes`` seeded
    hash functions, the min over the doc's word-n-gram shingles.

    One base xxhash64 per shingle (:func:`shingle_hashes`) → k derived
    hashes → min-aggregate. MinHash over a multiset equals MinHash over
    the set, so no distinct pass is needed. Shuffles: one on id for the
    window, one for the agg."""
    sh = shingle_hashes(df, text_col, id_col, shingle_n)
    aggs = [
        F.min(F.xxhash64(F.lit(i), F.col("h0"))).alias(f"mh_{i}")
        for i in range(num_hashes)
    ]
    return sh.groupBy(id_col).agg(*aggs)


def shingle_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.5,
    shingle_n: int = 3,
) -> DataFrame:
    """Exact Jaccard over *distinct shingle-hash sets* — the quantity
    MinHash actually estimates (token-set Jaccard is a different
    measure: docs sharing vocabulary in a different order score high on
    token sets but low on shingles). Inverted-index join on the shingle
    hash, same shape and scale behavior as :func:`token_jaccard_pairs`.
    Used as ground truth for the LSH recall self-check."""
    sh = shingle_hashes(df, text_col, id_col, shingle_n).select(id_col, "h0").distinct()
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("sz"))
    a, b = sh.alias("a"), sh.alias("b")
    common = (
        a.join(
            b,
            (F.col("a.h0") == F.col("b.h0"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .groupBy(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .agg(F.count("*").alias("common"))
    )
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("sz").alias("sz_b"))
    jac = F.col("common") / (F.col("sz_a") + F.col("sz_b") - F.col("common"))
    return (
        common.join(sa, "id_a")
        .join(sb, "id_b")
        .select("id_a", "id_b", jac.cast("double").alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


def minhash_lsh_pairs(
    sigs: DataFrame,
    id_col: str = "doc_id",
    num_hashes: int = 16,
    bands: int = 4,
    max_bucket_size: int | None = 2000,
) -> DataFrame:
    """Band the signatures and self-join on (band, band_hash) to get
    candidate pairs with their estimated Jaccard (fraction of equal
    signature components). Collision probability for a pair with true
    Jaccard s: 1-(1-s^r)^b with r = num_hashes // bands.

    ``max_bucket_size`` is the scale guard: a duplicate-saturated corpus
    puts thousands of docs into one (band, band_hash) bucket, and the
    self-join inside that bucket is quadratic (10k docs ⇒ ~50M pairs).

    r18 guard shape (replaces the r15 window count — guide §2.4): an
    EXACT aggregated probe ``groupBy(band, bh).count().filter(> cap)``
    decides whether any oversized bucket exists. On a healthy corpus
    (the common case) the probe is empty and the banded rows flow to
    the self-join UNTOUCHED — the old window guard shuffled and sorted
    every exploded row on (band, bh) just to compute counts that were
    all under the cap, paying ~2× the no-guard cost at every scale.
    The probe shuffles only map-side-combined (band, bh, partial_count)
    triples — bounded by distinct bucket keys per map partition, not by
    rows. When the probe DOES find oversized buckets, they are removed
    with a broadcast anti-join on the aggregated key set (≤ N·bands/cap
    keys by pigeonhole). Pair output is byte-identical to the window
    form in both regimes: both drop exactly the rows whose exact
    (band, bh) count exceeds the cap (pinned by
    test_minhash_lsh_probe_guard_equivalence). The probe's isEmpty is
    a driver decision on an aggregate, not data work (§5) — the §8
    decide-with-small-rows pattern. Docs in a dropped bucket still pair
    through their other ``bands - 1`` buckets, and *identical* docs are
    caught by the cheaper :func:`exact_duplicates` pass that should
    always run first; the trade-off is recall loss only for near-dup
    clusters larger than the cap that collide in every band."""
    r = num_hashes // bands
    band_cols = [
        F.xxhash64(*[F.col(f"mh_{b * r + i}") for i in range(r)]).alias(f"band_{b}")
        for b in range(bands)
    ]
    banded = sigs.select(
        id_col, *[F.col(f"mh_{i}") for i in range(num_hashes)], *band_cols
    )
    exploded = banded.select(
        id_col,
        F.array(*[F.col(f"mh_{i}") for i in range(num_hashes)]).alias("sig"),
        F.explode(
            F.array(*[F.struct(F.lit(b).alias("band"), F.col(f"band_{b}").alias("bh"))
                      for b in range(bands)])
        ).alias("bk"),
    ).select(id_col, "sig", F.col("bk.band").alias("band"), F.col("bk.bh").alias("bh"))
    if max_bucket_size is not None:
        oversized = (
            exploded.groupBy("band", "bh")
            .agg(F.count("*").alias("_bn"))
            .filter(F.col("_bn") > max_bucket_size)
            .select("band", "bh")
        )
        if not oversized.isEmpty():
            exploded = exploded.join(
                F.broadcast(oversized), ["band", "bh"], "left_anti")

    a = exploded.alias("a")
    b = exploded.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bh") == F.col("b.bh"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.col("a.sig").alias("sig_a"),
            F.col("b.sig").alias("sig_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    est = (
        F.size(
            F.filter(
                F.zip_with("sig_a", "sig_b", lambda x, y: x == y), lambda eq: eq
            )
        )
        / F.lit(num_hashes)
    ).cast("double")
    return pairs.select("id_a", "id_b", est.alias("jaccard_est"))


def simhash(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
            bits: int = 64) -> DataFrame:
    """SimHash signature: per-bit majority vote over token hashes.
    Expressed as explode → per-bit ±1 contributions → sum — one shuffle
    on the id, no UDF.

    Default is 64 bits: with 4 bucket blocks that gives 16-bit block
    keys (65k buckets per block) in :func:`simhash_near_pairs`, vs 256
    buckets at 32 bits — at web-corpus N the 8-bit keys put ~N/256 docs
    in *every* bucket and the verify join goes quadratic regardless of
    content. The signature is assembled with ``bitwiseOR`` +
    ``shiftleft`` (not arithmetic sum) so bit 63 — which wraps to the
    long sign bit — is safe under ANSI overflow checking."""
    ex = df.select(
        F.col(id_col),
        F.explode(F.split(F.lower(F.col(text_col)), " ")).alias("tok"),
    ).select(F.col(id_col), F.xxhash64("tok").alias("h"))
    bit_aggs = [
        F.sum(
            F.when(F.shiftright(F.col("h"), i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"b{i}")
        for i in range(bits)
    ]
    votes = ex.groupBy(id_col).agg(*bit_aggs)
    sig = F.lit(0).cast("long")
    for i in range(bits):
        bit = F.when(
            F.col(f"b{i}") > 0, F.shiftleft(F.lit(1).cast("long"), i)
        ).otherwise(F.lit(0).cast("long"))
        sig = sig.bitwiseOR(bit)
    return votes.select(F.col(id_col), sig.alias("simhash"))


def simhash_near_pairs(sigs: DataFrame, id_col: str = "doc_id",
                       max_hamming: int = 3, bits: int = 64,
                       blocks: int = 4,
                       max_bucket_size: int | None = 2000) -> DataFrame:
    """Pairs within Hamming ≤ max_hamming: bucket on each of ``blocks``
    disjoint bit-blocks, verify exact Hamming distance with bit_count.

    Completeness: by pigeonhole, a pair with ≤ max_hamming differing
    bits spread over ``blocks`` blocks has at least one block with zero
    differing bits whenever max_hamming < blocks — so with the default
    4 blocks the block-join provably finds *every* pair at distance ≤ 3
    (the exact filter then removes false candidates). This is asserted
    against brute force by the `dedup_simhash` self-check.

    Scale guards (same pattern as :func:`minhash_lsh_pairs`, including
    its r18 probe-based guard shape — exact aggregated bucket counts
    decide whether any bucket exceeds the cap; the healthy path flows
    untouched to the self-join instead of paying a full-row window
    shuffle+sort, and oversized keys are removed by broadcast
    anti-join): 64-bit signatures give 16-bit block keys, and
    ``max_bucket_size`` drops any (block, key) bucket larger than the
    cap before the self-join — a duplicate-saturated corpus collapses
    onto one signature and would otherwise self-join quadratically.
    Identical docs belong to the cheaper :func:`exact_duplicates` pass
    that should always run first; the completeness guarantee then holds
    among the surviving buckets."""
    if max_hamming >= blocks:
        raise ValueError(
            f"blocks={blocks} cannot guarantee completeness for "
            f"max_hamming={max_hamming}; need blocks > max_hamming"
        )
    block_bits = bits // blocks
    mask = (1 << block_bits) - 1
    keyed = sigs.select(
        id_col,
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("part"),
                        F.shiftright(F.col("simhash"), j * block_bits)
                        .bitwiseAND(F.lit(mask))
                        .alias("key"),
                    )
                    for j in range(blocks)
                ]
            )
        ).alias("bk"),
    ).select(id_col, "simhash", F.col("bk.part").alias("part"), F.col("bk.key").alias("key"))
    if max_bucket_size is not None:
        oversized = (
            keyed.groupBy("part", "key")
            .agg(F.count("*").alias("_bn"))
            .filter(F.col("_bn") > max_bucket_size)
            .select("part", "key")
        )
        if not oversized.isEmpty():
            keyed = keyed.join(
                F.broadcast(oversized), ["part", "key"], "left_anti")
    a, b = keyed.alias("a"), keyed.alias("b")
    hamming = F.bit_count(
        F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
    )
    return (
        a.join(
            b,
            (F.col("a.part") == F.col("b.part"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            hamming.alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .dropDuplicates(["id_a", "id_b"])
    )


def token_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.5,
    max_doc_freq: int | None = None,
) -> DataFrame:
    """Exact Jaccard over distinct-token sets via inverted-index join:
    explode tokens → join on token → count common → |A∪B| from per-doc
    sizes. Only pairs sharing ≥1 token are ever materialized.

    ``max_doc_freq`` is the scale guard: a token appearing in k docs
    contributes k² rows to the self-join, so ubiquitous tokens (stop
    words) dominate cost while carrying no dedup signal. When set,
    tokens whose document frequency exceeds the cap are removed from
    the vocabulary *before* both the join and the per-doc set sizes —
    the result is exact Jaccard over the filtered vocabulary (a
    well-defined, documented semantic, not an approximation of the
    unfiltered one). Recall trade-off: two docs overlapping only in
    dropped hot tokens score 0; for near-dup detection that is the
    desired behavior (stopword overlap isn't duplication)."""
    toks = df.select(
        F.col(id_col),
        F.explode(F.array_distinct(F.split(F.lower(F.col(text_col)), " "))).alias("w"),
    )
    if max_doc_freq is not None:
        doc_freq = toks.groupBy("w").agg(F.count("*").alias("_df"))
        toks = (
            toks.join(doc_freq.filter(F.col("_df") <= max_doc_freq), "w", "inner")
            .drop("_df")
        )
    sizes = toks.groupBy(id_col).agg(F.count("*").alias("sz"))
    a, b = toks.alias("a"), toks.alias("b")
    common = (
        a.join(b, (F.col("a.w") == F.col("b.w")) & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
        .groupBy(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .agg(F.count("*").alias("common"))
    )
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("sz").alias("sz_b"))
    jac = F.col("common") / (F.col("sz_a") + F.col("sz_b") - F.col("common"))
    return (
        common.join(sa, "id_a")
        .join(sb, "id_b")
        .select("id_a", "id_b", jac.cast("double").alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


def token_containment_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.9,
    max_doc_freq: int | None = None,
) -> DataFrame:
    """Asymmetric set containment C(A->B) = |A n B| / |A| over distinct
    token sets — the doc-inside-doc signal symmetric Jaccard misses: a
    short page embedded verbatim in a long one scores near 1.0 on
    containment but low on Jaccard (union is dominated by the long
    side). Directed pairs, both orientations. Same inverted-index join
    shape as :func:`token_jaccard_pairs` (pairs exist only through a
    shared token; ``max_doc_freq`` caps hot-token fan-out); the score
    is a single int/int division, so the threshold compares
    bit-identical doubles on any engine."""
    toks = df.select(
        F.col(id_col),
        F.explode(F.array_distinct(F.split(F.lower(F.col(text_col)), " "))).alias("w"),
    )
    if max_doc_freq is not None:
        doc_freq = toks.groupBy("w").agg(F.count("*").alias("_df"))
        toks = (
            toks.join(doc_freq.filter(F.col("_df") <= max_doc_freq), "w", "inner")
            .drop("_df")
        )
    sizes = toks.groupBy(id_col).agg(F.count("*").alias("sz"))
    a, b = toks.alias("a"), toks.alias("b")
    common = (
        a.join(b, (F.col("a.w") == F.col("b.w"))
               & (F.col(f"a.{id_col}") != F.col(f"b.{id_col}")))
        .groupBy(F.col(f"a.{id_col}").alias("id_a"),
                 F.col(f"b.{id_col}").alias("id_b"))
        .agg(F.count("*").alias("common"))
    )
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("sz").alias("sz_a"))
    cont = F.col("common") / F.col("sz_a")
    return (
        common.join(sa, "id_a")
        .select("id_a", "id_b", cont.cast("double").alias("containment"))
        .filter(F.col("containment") >= threshold)
    )


def connected_components(
    pairs: DataFrame,
    max_iter: int = 25,
) -> DataFrame:
    """Distributed connected components over an edge list (``id_a``,
    ``id_b``) via alternating large-star / small-star (Kiveris et al.,
    "Connected Components in MapReduce and Beyond", SoCC'14 — public
    algorithm). Returns (``node``, ``component``) with component = the
    minimum node id of the component.

    Everything is DataFrame groupBy/join — no driver-side edge
    materialization, so the edge list can exceed driver memory. Each
    round is two shuffles; convergence is O(log n) rounds. Lineage is
    truncated per round with ``localCheckpoint`` (an iterative plan
    otherwise grows exponentially), and the convergence test piggybacks
    on a count + checksum aggregate (one small job per round, no
    collect of edges)."""
    e = pairs.select(F.col("id_a").alias("u"), F.col("id_b").alias("v"))
    prev_sig = None
    for _ in range(max_iter):
        # large-star: connect every neighbor larger than u to the minimum
        # of u's closed neighborhood.
        sym = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        mins = sym.groupBy("u").agg(F.min("v").alias("mn"))
        m = F.least(F.col("u"), F.col("mn"))
        e = (
            sym.join(mins, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), m.alias("v"))
            .distinct()
        )
        # small-star: point u and all its smaller neighbors at the minimum.
        dirn = e.select(
            F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
        ).filter(F.col("u") != F.col("v"))
        mins = dirn.groupBy("u").agg(F.min("v").alias("mn"))
        e = (
            dirn.join(mins, "u")
            .select(F.col("v").alias("u"), F.col("mn").alias("v"))
            .filter(F.col("u") != F.col("v"))
            .union(mins.select("u", F.col("mn").alias("v")))
            .distinct()
            .localCheckpoint(eager=True)
        )
        sig = e.agg(
            F.count("*").alias("n"),
            F.bit_xor(F.xxhash64("u", "v")).alias("cks"),
        ).first()
        cur = (sig["n"], sig["cks"])
        if cur == prev_sig:
            break
        prev_sig = cur
    # converged: every edge is (node → component root); roots map to themselves
    return e.select(F.col("u").alias("node"), F.col("v").alias("component")).union(
        e.select(F.col("v").alias("node"), F.col("v").alias("component"))
    ).distinct()


def char_ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.5,
    max_doc_freq: int | None = None,
) -> DataFrame:
    """Exact Jaccard over distinct character n-gram sets — robust to
    tokenization differences (catches near-dups that differ by
    punctuation/spacing, which token- and word-shingle-level measures
    miss). Same inverted-index-join scale shape as
    :func:`token_jaccard_pairs`. The n-gram build is a HOF ``transform``
    (interpreted per element — acceptable for a ground-truth operator
    run on bounded samples; the scale path for approximate char-level
    dedup is MinHash over these same grams).

    ``max_doc_freq`` is the hot-gram guard, identical in semantics to
    the token variant's hot-token cap but *more* necessary here: common
    character 3-grams (`` th``, ``e a``) appear in essentially every
    English document, so the unguarded inverted-index join is Σk² over
    near-corpus-sized posting lists. With the cap, grams whose document
    frequency exceeds it are removed before both the join and the
    per-doc set sizes — the result is exact Jaccard over the filtered
    gram vocabulary (a defined semantic, not an approximation)."""
    s = F.lower(F.col(text_col))
    k = F.greatest(F.length(s) - (n - 1), F.lit(1))
    grams = F.array_distinct(
        F.transform(F.sequence(F.lit(1), k), lambda i: F.substring(s, i, n))
    )
    toks = df.select(F.col(id_col), F.explode(grams).alias("g"))
    if max_doc_freq is not None:
        # the interpreted HOF gram build would otherwise be re-evaluated
        # by doc_freq, both join sides and the size aggregation (4×);
        # materialize it once — bounded-sample inputs make this cheap
        toks = toks.localCheckpoint(eager=True)
        doc_freq = toks.groupBy("g").agg(F.count("*").alias("_df"))
        toks = (
            toks.join(doc_freq.filter(F.col("_df") <= max_doc_freq), "g", "inner")
            .drop("_df")
        )
    sizes = toks.groupBy(id_col).agg(F.count("*").alias("sz"))
    a, b = toks.alias("a"), toks.alias("b")
    common = (
        a.join(b, (F.col("a.g") == F.col("b.g")) & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
        .groupBy(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .agg(F.count("*").alias("common"))
    )
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("sz").alias("sz_b"))
    jac = F.col("common") / (F.col("sz_a") + F.col("sz_b") - F.col("common"))
    return (
        common.join(sa, "id_a")
        .join(sb, "id_b")
        .select("id_a", "id_b", jac.cast("double").alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


def deduplicate_corpus(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    distributed_threshold: int = 100_000,
    force_distributed: bool = False,
) -> DataFrame:
    """Drop near-duplicates: given candidate pairs (id_a < id_b), keep one
    representative (the min id) per connected component.

    Two paths, picked by edge-list size:

    - **small** (≤ ``distributed_threshold`` pairs): driver-side
      union-find over the collected pairs, drop-list applied as a
      broadcast anti-join. Cheapest when near-dup pairs ≪ corpus.
    - **large**: distributed large-star/small-star
      (:func:`connected_components`) — a duplicate-saturated corpus
      (common for web crawl at 100 TB) produces an edge list that
      swamps the driver, so components are computed entirely in
      DataFrame ops and the drop-list never leaves the cluster (the
      anti-join shuffles instead of broadcasting).

    ``force_distributed=True`` skips the sizing ``count()`` job and goes
    straight to the distributed path — the right call when the caller
    already knows the corpus is duplicate-saturated (a 100 TB crawl) and
    the extra pre-count over the pair pipeline would roughly double the
    work before components even start.
    """
    if force_distributed or pairs.count() > distributed_threshold:
        comp = connected_components(pairs)
        drop_df = comp.filter(F.col("node") != F.col("component")).select(
            F.col("node").alias(id_col)
        )
        return df.join(drop_df, on=id_col, how="left_anti")

    edges = pairs.select("id_a", "id_b").collect()
    parent: dict = {}

    def find(x):
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            # keep the smaller id as the root so the representative is min
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo

    for e in edges:
        parent.setdefault(e["id_a"], e["id_a"])
        parent.setdefault(e["id_b"], e["id_b"])
        union(e["id_a"], e["id_b"])

    drop = [x for x in parent if find(x) != x]
    if not drop:
        return df
    spark = df.sparkSession
    drop_df = spark.createDataFrame([(x,) for x in drop], f"{id_col} long")
    return df.join(F.broadcast(drop_df), on=id_col, how="left_anti")


def substring_dup_spans(df: DataFrame, k: int = 20, col: str = "text",
                        id_col: str = "doc_id") -> DataFrame:
    """Substring-level exact duplication (public technique: Lee et al.
    2022, "Deduplicating Training Data Makes Language Models Better" —
    their ExactSubstr finds repeated spans ACROSS documents, which
    document-level dedup misses). Per document: how many of its
    character ``k``-gram positions also occur in at least one *other*
    document.

    Spark shape: per-position k-gram explosion (linear — ~n_chars
    grams per doc) → one shuffle on the gram for a distinct-doc count
    → join back → per-doc aggregate. At 100 TB the raw 20-char gram is
    a 20-byte shuffle key ~20× the text volume; the production path
    hashes grams to 8 bytes first (``F.xxhash64`` — collisions only
    overcount dup spans by ~2^-64 per pair) and the suffix-array
    approach in the paper trades this shuffle for a global sort. Raw
    grams are kept here so the DuckDB oracle compares exact strings."""
    eligible = df.filter(F.length(F.col(col)) >= k)
    gram = F.col(col).substr(F.col("pos"), F.lit(k))
    grams = (
        eligible.select(
            id_col,
            F.explode(
                F.sequence(F.lit(1), F.length(F.col(col)) - (k - 1))
            ).alias("pos"),
            F.col(col),
        )
        .select(id_col, gram.alias("gram"))
    )
    gram_docs = grams.groupBy("gram").agg(
        F.countDistinct(id_col).alias("nd")
    )
    return (
        grams.join(gram_docs, "gram")
        .groupBy(id_col)
        .agg(
            F.count("*").cast("bigint").alias("n_spans"),
            F.sum(F.when(F.col("nd") >= 2, 1).otherwise(0))
            .cast("bigint").alias("n_dup_spans"),
        )
        .select(
            id_col, "n_spans", "n_dup_spans",
            F.round(F.col("n_dup_spans") / F.col("n_spans"), 6)
            .alias("dup_span_frac"),
        )
    )


# ---------------------------------------------------------------------------
# registry entries
# ---------------------------------------------------------------------------


def incremental_dedup(
    batch: DataFrame,
    existing_fps: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Classify a new ingest batch against an existing fingerprint
    store — the production dedup shape: the corpus is deduped once,
    after which every arriving batch is checked against the store
    instead of re-deduping the world. Statuses:

    - ``dup_of_existing``: fingerprint already in the store;
    - ``dup_in_batch``: a lower-id row in the same batch shares the
      fingerprint (keep-min-id within the batch);
    - ``kept``: first sighting — its fp is what gets appended to the
      store.

    ``existing_fps`` is a one-column (``fp``) relation. Scale shape:
    one shuffle of the batch on the 16-byte fp (window min), then a
    left join against the store — broadcast when the store fits,
    shuffle hash join on fp otherwise; bucketing the store by fp makes
    the join one-sided. The batch never joins itself row-by-row."""
    with_fp = _fp_with_batch_min(batch, text_col, id_col)
    marked = with_fp.join(
        existing_fps.select("fp").distinct().withColumn("_seen", F.lit(True)),
        "fp",
        "left",
    )
    return marked.select(F.col(id_col), _incremental_status(id_col).alias("status"))


def _fp_with_batch_min(batch: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Shared fingerprint core for the incremental-dedup family:
    (id, fp=md5(normalized text), _mn=min id in the batch sharing fp)."""
    from pyspark.sql import Window as W

    normalized = F.regexp_replace(F.trim(F.lower(F.col(text_col))), r"\s+", " ")
    return batch.select(
        F.col(id_col), F.md5(normalized.cast("binary")).alias("fp")
    ).withColumn("_mn", F.min(id_col).over(W.partitionBy("fp")))


def _incremental_status(id_col: str):
    """Shared status precedence: store hit > in-batch dup > kept."""
    return (
        F.when(F.col("_seen"), F.lit("dup_of_existing"))
        .when(F.col("_mn") < F.col(id_col), F.lit("dup_in_batch"))
        .otherwise(F.lit("kept"))
    )


def _bloom_positions(fps, m_bits: int, n_hashes: int):
    """Bit positions for a sequence of md5-hex fingerprints via
    Kirsch-Mitzenmacher double hashing (position_i = h1 + i*h2 with h1,
    h2 the two 64-bit halves of the digest itself). THE single
    definition shared by the bitmap build and the probe — any drift
    between the two sides would silently break the no-false-negative
    invariant."""
    import numpy as np

    h1 = np.array([int(s[:16], 16) for s in fps], dtype=np.uint64)
    h2 = np.array([int(s[16:32], 16) for s in fps], dtype=np.uint64)
    return [
        (h1 + np.uint64(i) * h2) & np.uint64(m_bits - 1)
        for i in range(n_hashes)
    ]


def bloom_bitmap(
    fps_df: DataFrame,
    fp_col: str = "fp",
    m_bits: int = 1 << 20,
    n_hashes: int = 4,
):
    """Distributed Bloom-filter build over a fingerprint relation.

    The fingerprints are md5 hex, so the two 64-bit halves of the
    digest itself serve as the double-hashing pair (Kirsch &
    Mitzenmacher 2006: position_i = h1 + i*h2 — k positions from one
    hash, no extra hashing). Each partition accumulates ONE m-bit
    partial bitmap across its Arrow batches; the driver ORs the
    per-partition bitmaps. The collect is bounded by
    n_partitions * m/8 bytes (128 KiB each at the default m=2^20),
    never by row count — at larger m, OR hierarchically via a
    groupBy on a partition-group key first.
    """
    import numpy as np
    import pandas as pd

    if m_bits & (m_bits - 1):
        raise ValueError("m_bits must be a power of two")
    nbytes = m_bits // 8

    def _part(batches):
        bm = np.zeros(nbytes, dtype=np.uint8)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            for pos in _bloom_positions(pdf[fp_col], m_bits, n_hashes):
                np.bitwise_or.at(
                    bm,
                    (pos >> np.uint64(3)).astype(np.int64),
                    (np.uint8(1) << (pos & np.uint64(7)).astype(np.uint8)),
                )
        yield pd.DataFrame({"bitmap": [bm.tobytes()]})

    parts = fps_df.select(fp_col).mapInPandas(_part, "bitmap binary").collect()
    out = np.zeros(nbytes, dtype=np.uint8)
    for r in parts:
        out |= np.frombuffer(r["bitmap"], dtype=np.uint8)
    return out


def bloom_prefilter_dedup(
    batch: DataFrame,
    existing_fps: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    m_bits: int = 1 << 20,
    n_hashes: int = 4,
) -> DataFrame:
    """``incremental_dedup`` with a Bloom prefilter on the store join —
    the shape that wins when the fingerprint store dwarfs the arriving
    batch (the steady state of a 100 TB corpus: billions of stored
    fps, millions per batch). A direct left join shuffles or probes
    the whole batch against the store; here only the Bloom-POSITIVE
    rows (true dups + the ~0.01%% false-positive residue at m=2^20,
    k=4) reach the store join, and Bloom-negative rows are classified
    ``kept``/``dup_in_batch`` with zero store IO — Bloom filters have
    no false negatives, so the output is EXACTLY ``incremental_dedup``'s
    (the oracle compares against the plain-join semantics).

    Reference scope: the reference has no incremental dedup at all
    (ingest is append-only, internal/ingest/writer.go); this extends
    the LLM-pipeline family. The bitmap is built distributed
    (``bloom_bitmap``) and shipped to executors in task closures
    (128 KiB at the default sizing).
    """
    bm = bloom_bitmap(existing_fps, m_bits=m_bits, n_hashes=n_hashes)
    bm_bytes = bm.tobytes()

    with_fp = _fp_with_batch_min(batch, text_col, id_col)

    def _probe(batches):
        import numpy as np

        bits = np.frombuffer(bm_bytes, dtype=np.uint8)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            maybe = np.ones(len(pdf), dtype=bool)
            for pos in _bloom_positions(pdf["fp"], m_bits, n_hashes):
                maybe &= (
                    bits[(pos >> np.uint64(3)).astype(np.int64)]
                    >> (pos & np.uint64(7)).astype(np.uint8)
                ) & 1 == 1
            out = pdf.copy()
            out["maybe_seen"] = maybe
            yield out

    # localCheckpoint: the candidate/negative branches below both read
    # `probed`; without materialization Spark would clone the whole
    # window+probe subtree into each branch and Bloom-probe the batch
    # twice — the cost the filter exists to avoid. The checkpoint is
    # batch-sized (the small side by construction).
    # derive the id/_mn field types from the input so non-long id
    # columns (string/int ids) keep working — the contract is "exactly
    # incremental_dedup's output", which is type-generic (_mn is
    # min(id) over a window, hence the id's type)
    id_type = with_fp.schema[id_col].dataType.simpleString()
    probed = with_fp.mapInPandas(
        _probe,
        f"{id_col} {id_type}, fp string, _mn {id_type}, maybe_seen boolean",
    ).localCheckpoint()
    store = existing_fps.select("fp").distinct().withColumn(
        "_seen", F.lit(True)
    )
    # only the Bloom-positive sliver joins the store (with a bucketed
    # store this is the only shuffle: ε·batch rows); negatives are
    # definitively unseen — no false negatives — and bypass with zero
    # store IO.
    confirmed = probed.filter(F.col("maybe_seen")).join(store, "fp", "left")
    negatives = probed.filter(~F.col("maybe_seen")).withColumn(
        "_seen", F.lit(None).cast("boolean")
    )
    marked = confirmed.select(id_col, "_mn", "_seen").unionByName(
        negatives.select(id_col, "_mn", "_seen")
    )
    return marked.select(F.col(id_col), _incremental_status(id_col).alias("status"))


def register_queries(register) -> None:
    register_prefix_filter(register)

    @register(
        "substring_dup_spans",
        """
        WITH g AS (
          SELECT doc_id, substr(text, s.k, 20) AS gram
          FROM documents JOIN generate_series(1, 2000) AS s(k)
            ON s.k <= length(text) - 19
          WHERE length(text) >= 20
        ), gd AS (
          SELECT gram, count(DISTINCT doc_id) AS nd FROM g GROUP BY gram
        )
        SELECT g.doc_id,
               CAST(count(*) AS BIGINT) AS n_spans,
               CAST(sum(CASE WHEN gd.nd >= 2 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_dup_spans,
               ROUND(sum(CASE WHEN gd.nd >= 2 THEN 1 ELSE 0 END)
                     / count(*), 6) AS dup_span_frac
        FROM g JOIN gd USING (gram)
        GROUP BY g.doc_id ORDER BY g.doc_id
        """,
        doc="substring-level exact dedup (Lee et al. 2022 ExactSubstr "
            "re-expressed relationally): per-doc fraction of 20-char "
            "positions whose gram also occurs in another document — the "
            "cross-document repeated-span signal document-level dedup "
            "misses; oracle enumerates positions via a constant-bound "
            "generate_series join",
        tags=("llm", "capability"),
    )
    def substring_dup_spans_q(spark: SparkSession, sf_dir: str) -> DataFrame:
        docs = fixture_df(spark, sf_dir, "documents")
        return substring_dup_spans(docs).orderBy("doc_id")

    @register(
        "dedup_exact_groups",
        """
        WITH fp AS (
          SELECT doc_id,
                 md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')) AS fp
          FROM documents)
        SELECT fp, CAST(min(doc_id) AS BIGINT) AS keep_id,
               CAST(count(*) AS BIGINT) AS n_copies
        FROM fp GROUP BY fp ORDER BY keep_id
        """,
        doc="exact dedup: hash-groupBy on normalized-text fingerprint",
        tags=("llm", "capability"),
    )
    def dedup_exact_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
        docs = fixture_df(spark, sf_dir, "documents")
        return exact_duplicates(docs).orderBy("keep_id")

    @register(
        "dedup_token_jaccard",
        """
        WITH toks AS (
          SELECT doc_id, unnest(list_distinct(string_split(lower(text), ' '))) AS w
          FROM documents WHERE doc_id < 200),
        sizes AS (SELECT doc_id, count(*) AS sz FROM toks GROUP BY doc_id),
        common AS (
          SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS common
          FROM toks a JOIN toks b ON a.w = b.w AND a.doc_id < b.doc_id
          GROUP BY 1, 2)
        SELECT id_a, id_b,
               CAST(common AS DOUBLE) / (sa.sz + sb.sz - common) AS jaccard
        FROM common
        JOIN sizes sa ON sa.doc_id = id_a
        JOIN sizes sb ON sb.doc_id = id_b
        WHERE CAST(common AS DOUBLE) / (sa.sz + sb.sz - common) >= 0.5
        ORDER BY id_a, id_b
        """,
        doc="exact n-gram(1) Jaccard near-dup pairs via inverted-index join",
        tags=("llm", "capability"),
    )
    def dedup_token_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
        docs = fixture_df(spark, sf_dir, "documents").filter(
            F.col("doc_id") < 200
        )
        return token_jaccard_pairs(docs, threshold=0.5).orderBy("id_a", "id_b")

    @register(
        "dedup_containment_pairs",
        """
        WITH toks AS (
          SELECT doc_id, unnest(list_distinct(string_split(lower(text), ' '))) AS w
          FROM documents WHERE doc_id < 200),
        sizes AS (SELECT doc_id, count(*) AS sz FROM toks GROUP BY doc_id),
        common AS (
          SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS common
          FROM toks a JOIN toks b ON a.w = b.w AND a.doc_id <> b.doc_id
          GROUP BY 1, 2)
        SELECT id_a, id_b, CAST(common AS DOUBLE) / sa.sz AS containment
        FROM common JOIN sizes sa ON sa.doc_id = id_a
        WHERE CAST(common AS DOUBLE) / sa.sz >= 0.9
        ORDER BY id_a, id_b
        """,
        doc="asymmetric containment near-dup (|A n B|/|A|, directed): "
            "catches short-doc-inside-long-doc duplication that "
            "symmetric Jaccard under-scores; same inverted-index join "
            "bound as the jaccard entries",
        tags=("llm", "capability"),
    )
    def dedup_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
        docs = fixture_df(spark, sf_dir, "documents").filter(
            F.col("doc_id") < 200
        )
        return token_containment_pairs(docs, threshold=0.9).orderBy(
            "id_a", "id_b")

    @register(
        "dedup_token_jaccard_capped",
        """
        WITH toks0 AS (
          SELECT doc_id, unnest(list_distinct(string_split(lower(text), ' '))) AS w
          FROM documents WHERE doc_id < 200),
        dfq AS (SELECT w, count(*) AS c FROM toks0 GROUP BY w),
        toks AS (SELECT t.doc_id, t.w FROM toks0 t JOIN dfq USING (w) WHERE c <= 60),
        sizes AS (SELECT doc_id, count(*) AS sz FROM toks GROUP BY doc_id),
        common AS (
          SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS common
          FROM toks a JOIN toks b ON a.w = b.w AND a.doc_id < b.doc_id
          GROUP BY 1, 2)
        SELECT id_a, id_b,
               CAST(common AS DOUBLE) / (sa.sz + sb.sz - common) AS jaccard
        FROM common
        JOIN sizes sa ON sa.doc_id = id_a
        JOIN sizes sb ON sb.doc_id = id_b
        WHERE CAST(common AS DOUBLE) / (sa.sz + sb.sz - common) >= 0.5
        ORDER BY id_a, id_b
        """,
        doc="token-Jaccard with the hot-token guard active (doc-freq cap 60): "
            "exact Jaccard over the capped vocabulary, oracle mirrors the cap "
            "— proves the guard's semantics, not just its boundedness",
        tags=("llm", "capability"),
    )
    def dedup_token_jaccard_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
        docs = fixture_df(spark, sf_dir, "documents").filter(
            F.col("doc_id") < 200
        )
        return token_jaccard_pairs(docs, threshold=0.5, max_doc_freq=60).orderBy(
            "id_a", "id_b"
        )

    @register(
        "dedup_char_ngram_jaccard",
        """
        WITH grams AS (
          SELECT doc_id,
                 unnest(list_distinct(
                   [substring(lower(text), i, 3)
                    FOR i IN range(1, greatest(length(text) - 1, 2))])) AS g
          FROM documents WHERE doc_id < 150),
        sizes AS (SELECT doc_id, count(*) AS sz FROM grams GROUP BY doc_id),
        common AS (
          SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS common
          FROM grams a JOIN grams b ON a.g = b.g AND a.doc_id < b.doc_id
          GROUP BY 1, 2)
        SELECT id_a, id_b,
               CAST(common AS DOUBLE) / (sa.sz + sb.sz - common) AS jaccard
        FROM common
        JOIN sizes sa ON sa.doc_id = id_a
        JOIN sizes sb ON sb.doc_id = id_b
        WHERE CAST(common AS DOUBLE) / (sa.sz + sb.sz - common) >= 0.6
        ORDER BY id_a, id_b
        """,
        doc="exact character-3-gram Jaccard near-dup pairs (tokenization-"
            "robust ground truth; inverted-index join)",
        tags=("llm", "capability"),
    )
    def dedup_char_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
        docs = fixture_df(spark, sf_dir, "documents").filter(
            F.col("doc_id") < 150
        )
        return char_ngram_jaccard_pairs(docs, n=3, threshold=0.6).orderBy(
            "id_a", "id_b"
        )

    @register(
        "dedup_char_ngram_capped",
        """
        WITH grams0 AS (
          SELECT doc_id,
                 unnest(list_distinct(
                   [substring(lower(text), i, 3)
                    FOR i IN range(1, greatest(length(text) - 1, 2))])) AS g
          FROM documents WHERE doc_id < 150),
        dfq AS (SELECT g, count(*) AS c FROM grams0 GROUP BY g),
        grams AS (SELECT t.doc_id, t.g FROM grams0 t JOIN dfq USING (g) WHERE c <= 40),
        sizes AS (SELECT doc_id, count(*) AS sz FROM grams GROUP BY doc_id),
        common AS (
          SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS common
          FROM grams a JOIN grams b ON a.g = b.g AND a.doc_id < b.doc_id
          GROUP BY 1, 2)
        SELECT id_a, id_b,
               CAST(common AS DOUBLE) / (sa.sz + sb.sz - common) AS jaccard
        FROM common
        JOIN sizes sa ON sa.doc_id = id_a
        JOIN sizes sb ON sb.doc_id = id_b
        WHERE CAST(common AS DOUBLE) / (sa.sz + sb.sz - common) >= 0.6
        ORDER BY id_a, id_b
        """,
        doc="char-3-gram Jaccard with the hot-gram guard active (doc-freq cap "
            "40): exact Jaccard over the capped gram vocabulary — the oracle "
            "mirrors the cap, proving the guard's semantics exactly as the "
            "token variant's capped entry does",
        tags=("llm", "capability"),
    )
    def dedup_char_ngram_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
        docs = fixture_df(spark, sf_dir, "documents").filter(
            F.col("doc_id") < 150
        )
        return char_ngram_jaccard_pairs(
            docs, n=3, threshold=0.6, max_doc_freq=40
        ).orderBy("id_a", "id_b")

    @register(
        "dedup_minhash_lsh",
        "SELECT true AS lsh_recall_ok",
        doc="MinHash+LSH near-dup recall self-check: candidate pairs must cover "
            "≥70% of the exact shingle-set Jaccard ≥0.7 ground-truth pairs — "
            "the similarity MinHash estimates (theory: P(candidate | s=0.7) = "
            "1-(1-0.7^4)^4 ≈ 0.67, rising to ≈0.99 at s=0.9, with 16 hashes / "
            "4 bands; the fixture's qualifying pairs are ≥0.9)",
        tags=("llm", "capability"),
    )
    def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
        docs = fixture_df(spark, sf_dir, "documents")
        # materialize the signatures once: the band self-join reads them
        # twice, and at scale the signature table is written out and
        # reused. localCheckpoint truncates lineage without pinning
        # executor memory across repeated invocations the way persist()
        # accumulation would.
        sigs = minhash_signatures(docs).localCheckpoint(eager=True)
        cand = minhash_lsh_pairs(sigs).select("id_a", "id_b")
        truth = shingle_jaccard_pairs(docs, threshold=0.7).select("id_a", "id_b")
        n_truth = truth.count()
        n_hit = truth.join(cand, ["id_a", "id_b"], "left_semi").count()
        recall = n_hit / max(1, n_truth)
        ok = bool(n_truth > 0 and recall >= 0.7)
        return spark.createDataFrame([(ok,)], "lsh_recall_ok boolean")

    @register(
        "dedup_simhash",
        "SELECT true AS simhash_ok",
        doc="SimHash completeness self-check: 4-block bucketed Hamming≤3 pairs "
            "must equal brute-force all-pairs Hamming≤3 over the same signatures "
            "(pigeonhole guarantees the block join misses nothing at d<blocks; "
            "max_bucket_size=None keeps the production-only scale cap out of "
            "the completeness comparison — the brute-force truth is uncapped)",
        tags=("llm", "capability"),
    )
    def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
        docs = fixture_df(spark, sf_dir, "documents")
        sigs = simhash(docs).localCheckpoint(eager=True)
        bucketed = simhash_near_pairs(sigs, max_bucket_size=None).select("id_a", "id_b")
        a, b = sigs.alias("a"), sigs.alias("b")
        brute = (
            a.join(b, F.col("a.doc_id") < F.col("b.doc_id"))
            .filter(
                F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))) <= 3
            )
            .select(
                F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b")
            )
        )
        n_brute = brute.count()
        missing = brute.exceptAll(bucketed).count()
        extra = bucketed.exceptAll(brute).count()
        ok = bool(n_brute > 0 and missing == 0 and extra == 0)
        return spark.createDataFrame([(ok,)], "simhash_ok boolean")

    @register(
        "dedup_corpus_survivors",
        "SELECT true AS cc_ok",
        doc="corpus dedup self-check: distributed large-star/small-star connected "
            "components must produce exactly the same survivor set as driver-side "
            "union-find over the same exact-Jaccard ≥0.8 pair list",
        tags=("llm", "capability"),
    )
    def dedup_corpus_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
        docs = fixture_df(spark, sf_dir, "documents").filter(
            F.col("doc_id") < 200
        )
        pairs = token_jaccard_pairs(docs, threshold=0.8).localCheckpoint(eager=True)
        small = deduplicate_corpus(docs, pairs, distributed_threshold=10**12)
        large = deduplicate_corpus(docs, pairs, distributed_threshold=0)
        n_small = small.count()
        diff = (
            small.select("doc_id").exceptAll(large.select("doc_id")).count()
            + large.select("doc_id").exceptAll(small.select("doc_id")).count()
        )
        ok = bool(n_small > 0 and diff == 0)
        return spark.createDataFrame([(ok,)], "cc_ok boolean")

    @register(
        "dedup_incremental",
        """
        WITH cut AS (SELECT max(doc_id) // 2 AS c FROM documents),
        fp AS (
          SELECT doc_id,
                 md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')) AS fp
          FROM documents),
        old AS (SELECT DISTINCT f.fp FROM fp f, cut WHERE f.doc_id < cut.c),
        b AS (
          SELECT f.doc_id, f.fp,
                 min(f.doc_id) OVER (PARTITION BY f.fp) AS mn
          FROM fp f, cut WHERE f.doc_id >= cut.c)
        SELECT b.doc_id,
               CASE WHEN o.fp IS NOT NULL THEN 'dup_of_existing'
                    WHEN b.mn < b.doc_id THEN 'dup_in_batch'
                    ELSE 'kept' END AS status
        FROM b LEFT JOIN old o ON b.fp = o.fp
        ORDER BY b.doc_id
        """,
        doc="incremental dedup of an arriving batch against the existing "
            "corpus fingerprint store (upper half of doc_id vs lower "
            "half): dup_of_existing / dup_in_batch / kept per doc — the "
            "production shape where only the delta is re-checked, never "
            "the whole corpus",
        tags=("llm",),
    )
    def dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
        docs = fixture_df(spark, sf_dir, "documents")
        cut = docs.agg(F.expr("max(doc_id) div 2")).first()[0]
        normalized = F.regexp_replace(F.trim(F.lower(F.col("text"))), r"\s+", " ")
        existing = docs.filter(F.col("doc_id") < cut).select(
            F.md5(normalized.cast("binary")).alias("fp")
        )
        batch = docs.filter(F.col("doc_id") >= cut)
        return incremental_dedup(batch, existing).orderBy("doc_id")

    @register(
        "dedup_bloom_prefilter",
        """
        WITH cut AS (SELECT (2 * max(doc_id)) // 3 AS c FROM documents),
        fp AS (
          SELECT doc_id,
                 md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')) AS fp
          FROM documents),
        old AS (SELECT DISTINCT f.fp FROM fp f, cut WHERE f.doc_id < cut.c),
        b AS (
          SELECT f.doc_id, f.fp,
                 min(f.doc_id) OVER (PARTITION BY f.fp) AS mn
          FROM fp f, cut WHERE f.doc_id >= cut.c)
        SELECT b.doc_id,
               CASE WHEN o.fp IS NOT NULL THEN 'dup_of_existing'
                    WHEN b.mn < b.doc_id THEN 'dup_in_batch'
                    ELSE 'kept' END AS status
        FROM b LEFT JOIN old o ON b.fp = o.fp
        ORDER BY b.doc_id
        """,
        doc="Bloom-prefiltered incremental dedup (lower 2/3 of doc_id as "
            "the fingerprint store, upper 1/3 as the arriving batch): a "
            "distributed-built 2^20-bit Bloom filter screens the batch so "
            "only Bloom-positive rows join the store; no false negatives "
            "means the output is bit-identical to the plain-join "
            "incremental dedup, which is exactly what the oracle checks",
        tags=("llm",),
    )
    def dedup_bloom_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
        docs = fixture_df(spark, sf_dir, "documents")
        cut = docs.agg(F.expr("2 * max(doc_id) div 3")).first()[0]
        normalized = F.regexp_replace(F.trim(F.lower(F.col("text"))), r"\s+", " ")
        existing = docs.filter(F.col("doc_id") < cut).select(
            F.md5(normalized.cast("binary")).alias("fp")
        )
        batch = docs.filter(F.col("doc_id") >= cut)
        return bloom_prefilter_dedup(batch, existing).orderBy("doc_id")


def prefix_filter_jaccard_pairs(
    df: DataFrame,
    threshold_num: int = 4,
    threshold_den: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Set-similarity self-join via PREFIX FILTERING (the PPJoin family
    — Chaudhuri/Ganti/Kaushik ICDE'06, Xiao et al. WWW'08): order each
    document's distinct tokens by ascending global frequency (rarest
    first); two sets with Jaccard >= t MUST share a token within their
    first |set| - ceil(t*|set|) + 1 tokens, so only prefix tokens enter
    the inverted-index join. Against the plain inverted-index join
    (``dedup_token_jaccard``) this shrinks the candidate space by the
    prefix ratio (~1-t) PER DOC on both sides — the difference between
    a feasible and an infeasible self-join when common tokens dominate.

    The threshold is the rational ``threshold_num/threshold_den`` and
    every comparison is integer arithmetic (prefix length via
    ceil-division, final check ``inter*den >= num*(|A|+|B|-inter)``), so
    no float boundary can flip a pair between engines. Returns exact
    (id_a, id_b, inter, uni) for verified pairs.

    Scale shape: one token-frequency aggregate (broadcastable), one
    window per doc for the frequency ranking, the prefix-token inverted
    join, then exact verification joining only candidate pairs back to
    the token relation. Hot tokens appear in prefixes only for docs
    where every rarer token is absent — the skew cap the plain join
    needs explicitly falls out of the ordering here.
    """
    from pyspark.sql import Window as W

    from .text import _alnum_tokens

    toks = (
        df.select(F.col(id_col), F.explode(_alnum_tokens(text_col)).alias("tok"))
        .distinct()
    )
    sz = toks.groupBy(id_col).agg(F.count("*").alias("sz"))
    gdf = toks.groupBy("tok").agg(F.count("*").alias("gdf"))
    ranked = (
        toks.join(F.broadcast(gdf), "tok")
        .withColumn(
            "rn",
            F.row_number().over(
                W.partitionBy(id_col).orderBy("gdf", "tok")
            ),
        )
        .join(sz, id_col)
    )
    # prefix_len = sz - ceil(t*sz) + 1, all integer
    ceil_t_sz = F.expr(
        f"cast(({threshold_num} * sz + {threshold_den} - 1) div {threshold_den} as int)"
    )
    prefix = ranked.filter(F.col("rn") <= F.col("sz") - ceil_t_sz + 1)
    a = prefix.select(F.col(id_col).alias("id_a"), "tok")
    b = prefix.select(F.col(id_col).alias("id_b"), "tok")
    cand = (
        a.join(b, "tok")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    ta = toks.select(F.col(id_col).alias("id_a"), "tok")
    tb = toks.select(F.col(id_col).alias("id_b"), "tok")
    inter = (
        cand.join(ta, "id_a")
        .join(tb, ["id_b", "tok"])
        .groupBy("id_a", "id_b")
        .agg(F.count("*").cast("long").alias("inter"))
    )
    sa = sz.select(F.col(id_col).alias("id_a"), F.col("sz").alias("sza"))
    sb = sz.select(F.col(id_col).alias("id_b"), F.col("sz").alias("szb"))
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn("uni", (F.col("sza") + F.col("szb") - F.col("inter")).cast("long"))
        .filter(
            F.col("inter") * threshold_den >= F.lit(threshold_num) * F.col("uni")
        )
        .select("id_a", "id_b", "inter", "uni")
    )


def register_prefix_filter(register) -> None:
    @register(
        "dedup_prefix_filter_jaccard",
        """
        WITH tok AS (
          SELECT DISTINCT doc_id, t.tok
          FROM documents,
               UNNEST(list_filter(string_split_regex(lower(text),
                      '[^a-z0-9]+'), x -> x <> '')) AS t(tok)
          WHERE doc_id < 60),
        sz AS (SELECT doc_id, count(*) AS sz FROM tok GROUP BY doc_id),
        gdf AS (SELECT tok, count(*) AS gdf FROM tok GROUP BY tok),
        ranked AS (
          SELECT k.doc_id, k.tok, s.sz,
                 row_number() OVER (PARTITION BY k.doc_id
                                    ORDER BY g.gdf, k.tok) AS rn
          FROM tok k JOIN gdf g ON k.tok = g.tok
                     JOIN sz s ON k.doc_id = s.doc_id),
        pre AS (
          SELECT doc_id, tok FROM ranked
          WHERE rn <= sz - ((4 * sz + 4) // 5) + 1),
        cand AS (
          SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
          FROM pre a JOIN pre b
            ON a.tok = b.tok AND a.doc_id < b.doc_id),
        i AS (
          SELECT c.id_a, c.id_b, count(*) AS inter
          FROM cand c
          JOIN tok ta ON ta.doc_id = c.id_a
          JOIN tok tb ON tb.doc_id = c.id_b AND tb.tok = ta.tok
          GROUP BY c.id_a, c.id_b)
        SELECT CAST(i.id_a AS BIGINT) AS id_a,
               CAST(i.id_b AS BIGINT) AS id_b,
               CAST(i.inter AS BIGINT) AS inter,
               CAST(sa.sz + sb.sz - i.inter AS BIGINT) AS uni
        FROM i JOIN sz sa ON sa.doc_id = i.id_a
               JOIN sz sb ON sb.doc_id = i.id_b
        WHERE i.inter * 5 >= 4 * (sa.sz + sb.sz - i.inter)
        ORDER BY id_a, id_b
        """,
        doc="set-similarity self-join via prefix filtering (PPJoin "
            "family, Chaudhuri'06/Xiao'08): rarest-first token ordering, "
            "only the |s|-ceil(t|s|)+1 prefix enters the inverted-index "
            "join, candidates verified with exact integer arithmetic "
            "(inter*5 >= 4*uni for t=4/5) — no float boundary can flip "
            "a pair between engines",
        tags=("llm",),
    )
    def dedup_prefix_filter_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
        docs = fixture_df(spark, sf_dir, "documents").filter(
            F.col("doc_id") < 60
        )
        return prefix_filter_jaccard_pairs(docs).orderBy("id_a", "id_b")
