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
- **SimHash**: 32-bit signature via per-bit majority vote of token
  hashes; near-dups = signatures within small Hamming distance,
  bucketed by signature halves (Hamming ≤ d pairs must agree on one
  half for d ≤ 16).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


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


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    shingle_n: int = 3,
) -> DataFrame:
    """MinHash signature per document: for each of ``num_hashes`` seeded
    hash functions, the min over the doc's word-n-gram shingles.

    Linear in token count: posexplode tokens → window ``lead`` builds
    each shingle from its n successors → one base xxhash64 per shingle
    → k derived hashes → min-aggregate. (A ``transform(sequence,
    slice)`` formulation is O(tokens²) per doc inside codegen — it was
    144 s for 5k docs at sf0.1 vs ~4 s for this plan.) MinHash over a
    multiset equals MinHash over the set, so no distinct pass is
    needed. Shuffles: one on id for the window, one for the agg."""
    from pyspark.sql import Window as W

    toks = F.split(F.lower(F.col(text_col)), " ")
    ex = df.select(F.col(id_col), F.posexplode(toks).alias("pos", "tok"))
    w = W.partitionBy(id_col).orderBy("pos")
    successors = [F.lead("tok", i).over(w) for i in range(1, shingle_n)]
    sh = ex.select(
        F.col(id_col),
        F.col("pos"),
        F.xxhash64(F.col("tok"), *successors).alias("h0"),
        successors[-1].isNotNull().alias("full"),
    ).filter(F.col("full") | (F.col("pos") == 0))  # short docs keep 1 partial shingle
    aggs = [
        F.min(F.xxhash64(F.lit(i), F.col("h0"))).alias(f"mh_{i}")
        for i in range(num_hashes)
    ]
    return sh.groupBy(id_col).agg(*aggs)


def minhash_lsh_pairs(
    sigs: DataFrame,
    id_col: str = "doc_id",
    num_hashes: int = 16,
    bands: int = 4,
) -> DataFrame:
    """Band the signatures and self-join on (band, band_hash) to get
    candidate pairs with their estimated Jaccard (fraction of equal
    signature components). Collision probability for a pair with true
    Jaccard s: 1-(1-s^r)^b with r = num_hashes // bands."""
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
            bits: int = 32) -> DataFrame:
    """SimHash signature: per-bit majority vote over token hashes.
    Expressed as explode → per-bit ±1 contributions → sum — one shuffle
    on the id, no UDF."""
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
    sig = None
    for i in range(bits):
        bit = F.when(F.col(f"b{i}") > 0, F.lit(1 << i)).otherwise(F.lit(0))
        sig = bit if sig is None else (sig + bit)
    return votes.select(F.col(id_col), sig.cast("long").alias("simhash"))


def simhash_near_pairs(sigs: DataFrame, id_col: str = "doc_id",
                       max_hamming: int = 3, bits: int = 32) -> DataFrame:
    """Candidate pairs within Hamming ≤ max_hamming: bucket on each
    16-bit half (a pair within distance ≤ 16 must collide on one half),
    verify exact Hamming distance with bit_count."""
    half_lo = F.col("simhash").bitwiseAND(F.lit((1 << 16) - 1))
    half_hi = F.shiftright(F.col("simhash"), 16).bitwiseAND(F.lit((1 << 16) - 1))
    keyed = sigs.select(
        id_col,
        "simhash",
        F.explode(
            F.array(
                F.struct(F.lit(0).alias("part"), half_lo.alias("key")),
                F.struct(F.lit(1).alias("part"), half_hi.alias("key")),
            )
        ).alias("bk"),
    ).select(id_col, "simhash", F.col("bk.part").alias("part"), F.col("bk.key").alias("key"))
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
) -> DataFrame:
    """Exact Jaccard over distinct-token sets via inverted-index join:
    explode tokens → join on token → count common → |A∪B| from per-doc
    sizes. Only pairs sharing ≥1 token are ever materialized."""
    toks = df.select(
        F.col(id_col),
        F.explode(F.array_distinct(F.split(F.lower(F.col(text_col)), " "))).alias("w"),
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


def deduplicate_corpus(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
) -> DataFrame:
    """Drop near-duplicates: given candidate pairs (id_a < id_b), keep one
    representative (the min id) per connected component.

    The component computation runs driver-side union-find over the
    *pairs*, which is output-sized (near-dup pairs ≪ corpus — at 100 TB
    you may have billions of docs but the pair list at a 0.8+ threshold
    is orders smaller; if it isn't, the corpus is mostly duplicates and
    you have a different problem). The drop-list then applies as a
    broadcast anti-join — one distributed pass over the corpus."""
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


# ---------------------------------------------------------------------------
# registry entries
# ---------------------------------------------------------------------------


def register_queries(register) -> None:
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
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
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
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet").filter(
            F.col("doc_id") < 200
        )
        return token_jaccard_pairs(docs, threshold=0.5).orderBy("id_a", "id_b")

    @register(
        "dedup_minhash_lsh",
        None,  # approximate: no SQL oracle; ground truth = dedup_token_jaccard
        doc="MinHash+LSH candidate near-dup pairs (16 hashes, 4 bands)",
        tags=("llm", "capability"),
    )
    def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        # materialize the signatures once: the band self-join reads them
        # twice, and at scale the signature table is written out and
        # reused. localCheckpoint truncates lineage without pinning
        # executor memory across repeated invocations the way persist()
        # accumulation would.
        sigs = minhash_signatures(docs).localCheckpoint(eager=True)
        return minhash_lsh_pairs(sigs).filter(F.col("jaccard_est") >= 0.5).orderBy(
            "id_a", "id_b"
        )

    @register(
        "dedup_simhash",
        None,  # approximate: no SQL oracle
        doc="SimHash near-dup pairs (32-bit signature, Hamming ≤ 3)",
        tags=("llm", "capability"),
    )
    def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        return simhash_near_pairs(simhash(docs)).orderBy("id_a", "id_b")
