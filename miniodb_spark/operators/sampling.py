"""Corpus sampling / mixing operators for training-data assembly.

Reference scope: the reference engine exposes per-table scan + SQL
sampling only (``internal/query/engine.go`` SELECT surface); these
operators extend it with the mixing steps an LLM-data pipeline runs
between dedup and tokenization:

- **Temperature-weighted source mixing** (multinomial alpha-sampling a
  la GPT-3 / XLM-R data mixing, alpha=0.5): upweight small sources,
  downweight dominant ones, with per-source quotas computed in *exact
  integer arithmetic* (floor-sqrt weights, integer division) so the
  result is bit-reproducible across engines — no float rounding
  boundary can flip a quota between Spark and an external validator.
- **Deterministic stratified split**: md5-keyed train/val/test
  assignment — stable under re-runs, insertion order, and partitioning,
  because the split key is a pure function of the row id.
- **Sequence packing / epoch shuffle / contrastive pairing**: the
  batch-assembly tail of the pipeline — concat-and-chunk packing,
  seeded shard permutations for epoch order, and in-batch-negative
  pairing; every assignment is a pure function of (seed, id).

Scale shape: quota computation is one map-side-combinable groupBy over
the source column (|sources| rows out); quota application broadcasts
the quota table. The rank-based selector needs a per-source total
order (one shuffle; fine while quotas are bounded); the hash-threshold
selector is the 100 TB path — selection becomes a pure per-row
predicate with no window and no shuffle beyond the counts agg.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..fixtures import fixture_df


def _md5_key(id_col: str):
    """Deterministic pseudo-random sort key: md5 of the stringified id.

    md5 hex is identical across engines (unlike xxhash64 seeds or
    engine-native ``hash()``), which keeps every selector below
    oracle-checkable."""
    return F.md5(F.col(id_col).cast("string"))


def _hex_digit(c):
    """Value 0..15 of a single lowercase hex char, by ascii arithmetic
    ('0'-'9' → 48-57, 'a'-'f' → 97-102) — portable to any SQL engine,
    unlike conv()/strtol, and *uniform* (raw ascii codes are not)."""
    a = F.ascii(c)
    return a - F.when(a >= 97, F.lit(87)).otherwise(F.lit(48))


def _md5_bucket(id_col: str, buckets: int = 100):
    """Integer bucket in [0, buckets) from the first four md5 hex
    digits — uniform over 0..65535 before the modulo (bias from
    65536 % buckets is ≤1 part in 655 for buckets=100)."""
    h = _md5_key(id_col)
    raw = F.lit(0)
    for i in range(1, 5):
        raw = raw * 16 + _hex_digit(F.substring(h, i, 1))
    return raw % buckets


def temperature_quotas(
    df: DataFrame,
    target_rows: int,
    source_col: str = "source",
    size_col: str = "n_chars",
) -> DataFrame:
    """Per-source row quotas under alpha=0.5 temperature sampling.

    weight_s = floor(sqrt(sum(size_s)));  quota_s = (target * weight_s)
    div sum(weights). sqrt is IEEE-correctly-rounded and everything
    else is integer math, so quotas are engine-independent. Returns
    (source, sz, w, quota)."""
    sizes = df.groupBy(source_col).agg(F.sum(size_col).alias("sz"))
    sizes = sizes.withColumn(
        "w", F.floor(F.sqrt(F.col("sz").cast("double"))).cast("long")
    )
    tot = sizes.agg(F.sum("w").alias("tw"))
    return (
        sizes.crossJoin(F.broadcast(tot))
        .withColumn("quota", F.expr(f"({int(target_rows)} * w) div tw"))
        .drop("tw")
    )


def temperature_sample(
    df: DataFrame,
    target_rows: int,
    id_col: str = "doc_id",
    source_col: str = "source",
    size_col: str = "n_chars",
) -> DataFrame:
    """Exact-quota selector: rank rows per source by md5(id) and keep
    the first quota_s. One shuffle for the per-source window; use
    :func:`temperature_sample_hash` when quotas are unbounded."""
    quotas = temperature_quotas(df, target_rows, source_col, size_col)
    rn = F.row_number().over(
        Window.partitionBy(source_col).orderBy(_md5_key(id_col), F.col(id_col))
    )
    return (
        df.withColumn("rnk", rn.cast("long"))
        .join(F.broadcast(quotas.select(source_col, "quota")), source_col)
        .filter(F.col("rnk") <= F.col("quota"))
        .select(id_col, source_col, "rnk")
    )


def temperature_sample_hash(
    df: DataFrame,
    target_rows: int,
    id_col: str = "doc_id",
    source_col: str = "source",
    size_col: str = "n_chars",
) -> DataFrame:
    """Shuffle-free quota selector (the 100 TB path): keep a row iff
    its md5 bucket falls under quota_s / count_s — a pure per-row
    predicate against the broadcast quota table, no per-source sort.
    Selected counts are binomially distributed around the quota
    (±O(sqrt(quota))) rather than exact."""
    counts = df.groupBy(source_col).agg(F.count("*").alias("n_rows"))
    quotas = temperature_quotas(df, target_rows, source_col, size_col).join(
        counts, source_col
    )
    bucket = _md5_bucket(id_col, 65536)
    return (
        df.join(F.broadcast(quotas.select(source_col, "quota", "n_rows")), source_col)
        .filter(bucket * F.col("n_rows") < F.col("quota") * F.lit(65536))
        .select(id_col, source_col)
    )


def stratified_split(
    df: DataFrame,
    id_col: str = "doc_id",
    train_pct: int = 80,
    val_pct: int = 10,
) -> DataFrame:
    """Adds a deterministic ``split`` column (train/val/test) keyed on
    md5(id) mod 100 — a pure projection, zero shuffle, stable across
    re-runs and repartitioning. Holdout membership must never depend on
    partition layout or ingestion order; a hash of the id is the only
    thing that guarantees that at scale."""
    bucket = _md5_bucket(id_col, 100)
    split = (
        F.when(bucket < train_pct, F.lit("train"))
        .when(bucket < train_pct + val_pct, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return df.withColumn("split", split)


def pack_sequences(
    df: DataFrame,
    capacity: int = 512,
    id_col: str = "doc_id",
    text_col: str = "text",
    shard_col: str = "source",
) -> DataFrame:
    """Concat-and-chunk sequence packing — the standard LLM pretraining
    batch-assembly step: documents are concatenated in ``id_col`` order
    within each shard and split every ``capacity`` tokens; a document's
    bin is where its first token lands (documents may straddle bins,
    exactly like the real packed token stream).

    Returns (shard, id, n_tokens, start_offset, bin_id).

    Scale shape: the running offset is a per-shard window cumsum —
    parallel across shards, which is how production packing runs anyway
    (you pack within an output shard, never across the whole corpus; a
    corpus-global order would serialize into one partition). Token
    counts are a codegen ``size(split(...))``; no UDF anywhere."""
    n_tokens = F.size(F.split(F.col(text_col), " ")).cast("long")
    w = Window.partitionBy(shard_col).orderBy(id_col).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    with_tok = df.withColumn("n_tokens", n_tokens)
    end_offset = F.sum("n_tokens").over(w)
    return (
        with_tok.withColumn("start_offset", (end_offset - F.col("n_tokens")))
        .withColumn("bin_id", F.expr(f"start_offset div {int(capacity)}"))
        .select(shard_col, id_col, "n_tokens", "start_offset", "bin_id")
    )


def epoch_shuffle(
    df: DataFrame,
    seed: int,
    n_shards: int = 8,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic seeded global shuffle into training shards — the
    epoch-order randomization step between corpus assembly and the
    training dataloader. Each row gets a pseudo-random key
    ``md5(seed || ':' || id)``; its shard is the key's 16-bit prefix
    mod ``n_shards`` and its position is the key-order rank within the
    shard. A different ``seed`` yields an independent permutation (new
    epoch), and the whole assignment is a pure function of (seed, id):
    re-runs, partition layout, and ingestion order cannot change it.

    Scale shape: shard assignment is a zero-shuffle projection; the
    within-shard rank is one window per shard (parallel across shards —
    a GLOBAL permutation rank would serialize the corpus into a single
    partition, which is exactly what sharding exists to avoid). At
    100 TB you skip the rank column entirely and write
    ``partitionBy(shard).sortWithinPartitions(key)`` — the dataloader
    consumes shards in seeded order; the rank here is what makes the
    entry oracle-checkable.

    Reference scope: no analog in the reference (its scan order is
    storage order); part of the LLM-pipeline extension family.
    """
    key = F.md5(F.concat_ws(":", F.lit(str(int(seed))), F.col(id_col).cast("string")))
    raw = F.lit(0)
    for i in range(1, 5):
        raw = raw * 16 + _hex_digit(F.substring(key, i, 1))
    shard = (raw % n_shards).cast("long")
    rn = F.row_number().over(
        Window.partitionBy("shard_id").orderBy("shuffle_key", id_col)
    )
    return (
        df.select(F.col(id_col), key.alias("shuffle_key"), shard.alias("shard_id"))
        .withColumn("pos_in_shard", rn.cast("long"))
        .select(id_col, "shard_id", "pos_in_shard")
    )


def register_queries(register) -> None:
    @register(
        "temperature_source_mix",
        """
        WITH sz AS (
          SELECT source, CAST(sum(n_chars) AS BIGINT) AS sz,
                 CAST(floor(sqrt(CAST(sum(n_chars) AS DOUBLE))) AS BIGINT) AS w
          FROM documents GROUP BY source),
        tot AS (SELECT CAST(sum(w) AS BIGINT) AS tw FROM sz),
        quota AS (SELECT source, (200 * w) // tw AS quota FROM sz, tot),
        ranked AS (
          SELECT doc_id, source,
                 row_number() OVER (
                   PARTITION BY source
                   ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rnk
          FROM documents)
        SELECT r.doc_id, r.source, CAST(r.rnk AS BIGINT) AS rnk
        FROM ranked r JOIN quota q ON r.source = q.source
        WHERE r.rnk <= q.quota
        ORDER BY r.source, r.rnk
        """,
        doc="alpha=0.5 temperature-weighted source mixing (GPT-3-style "
            "multinomial reweighting): per-source quotas from floor-sqrt "
            "char-mass weights in exact integer arithmetic, rows picked "
            "by md5-rank within source — fully oracle-checked because no "
            "float rounding can flip a quota",
        tags=("llm",),
    )
    def temperature_source_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
        docs = fixture_df(spark, sf_dir, "documents")
        return temperature_sample(docs, 200).orderBy("source", "rnk")

    @register(
        "stratified_split_counts",
        """
        WITH h AS (
          SELECT doc_id, n_chars,
                 md5(CAST(doc_id AS VARCHAR)) AS hx
          FROM documents),
        d AS (
          SELECT n_chars,
                 (ascii(substr(hx,1,1))
                    - CASE WHEN ascii(substr(hx,1,1)) >= 97 THEN 87 ELSE 48 END) AS d1,
                 (ascii(substr(hx,2,1))
                    - CASE WHEN ascii(substr(hx,2,1)) >= 97 THEN 87 ELSE 48 END) AS d2,
                 (ascii(substr(hx,3,1))
                    - CASE WHEN ascii(substr(hx,3,1)) >= 97 THEN 87 ELSE 48 END) AS d3,
                 (ascii(substr(hx,4,1))
                    - CASE WHEN ascii(substr(hx,4,1)) >= 97 THEN 87 ELSE 48 END) AS d4
          FROM h),
        s AS (SELECT n_chars,
                     (((d1*16 + d2)*16 + d3)*16 + d4) % 100 AS bucket FROM d)
        SELECT CASE WHEN bucket < 80 THEN 'train'
                    WHEN bucket < 90 THEN 'val'
                    ELSE 'test' END AS split,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(n_chars) AS BIGINT) AS total_chars
        FROM s GROUP BY 1 ORDER BY split
        """,
        doc="deterministic md5-keyed train/val/test split (80/10/10): "
            "membership is a pure function of doc_id — stable across "
            "re-runs, partitioning, and ingestion order; entry returns "
            "per-split doc and char counts",
        tags=("llm",),
    )
    def stratified_split_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
        docs = fixture_df(spark, sf_dir, "documents")
        return (
            stratified_split(docs)
            .groupBy("split")
            .agg(
                F.count("*").alias("n_docs"),
                F.sum("n_chars").alias("total_chars"),
            )
            .orderBy("split")
        )

    @register(
        "sequence_packing",
        """
        WITH t AS (
          SELECT source, doc_id,
                 CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
          FROM documents),
        o AS (
          SELECT source, doc_id, n_tokens,
                 CAST(sum(n_tokens) OVER (
                   PARTITION BY source ORDER BY doc_id
                   ROWS UNBOUNDED PRECEDING) - n_tokens AS BIGINT)
                   AS start_offset
          FROM t)
        SELECT source, doc_id, n_tokens, start_offset,
               start_offset // 512 AS bin_id
        FROM o ORDER BY source, doc_id
        """,
        doc="concat-and-chunk sequence packing (per-shard document "
            "concatenation split every 512 tokens — the LLM pretraining "
            "batch-assembly step): per-doc start offset via a per-shard "
            "window cumsum, bin = start div capacity; parallel across "
            "shards, codegen token counts, no UDF",
        tags=("llm",),
    )
    def sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
        docs = fixture_df(spark, sf_dir, "documents")
        return pack_sequences(docs, capacity=512).orderBy("source", "doc_id")

    @register(
        "epoch_shuffle_shards",
        """
        WITH k AS (
          SELECT doc_id,
                 md5('1:' || CAST(doc_id AS VARCHAR)) AS key
          FROM documents),
        d AS (
          SELECT doc_id, key,
                 (ascii(substr(key,1,1))
                    - CASE WHEN ascii(substr(key,1,1)) >= 97 THEN 87 ELSE 48 END) AS d1,
                 (ascii(substr(key,2,1))
                    - CASE WHEN ascii(substr(key,2,1)) >= 97 THEN 87 ELSE 48 END) AS d2,
                 (ascii(substr(key,3,1))
                    - CASE WHEN ascii(substr(key,3,1)) >= 97 THEN 87 ELSE 48 END) AS d3,
                 (ascii(substr(key,4,1))
                    - CASE WHEN ascii(substr(key,4,1)) >= 97 THEN 87 ELSE 48 END) AS d4
          FROM k),
        s AS (
          SELECT doc_id, key,
                 (((d1*16 + d2)*16 + d3)*16 + d4) % 8 AS shard_id
          FROM d)
        SELECT CAST(doc_id AS BIGINT) AS doc_id,
               CAST(shard_id AS BIGINT) AS shard_id,
               CAST(row_number() OVER (
                      PARTITION BY shard_id
                      ORDER BY key, doc_id) AS BIGINT) AS pos_in_shard
        FROM s ORDER BY shard_id, pos_in_shard
        """,
        doc="deterministic seeded epoch shuffle into 8 training shards: "
            "shard + within-shard position are pure functions of "
            "(seed, doc_id) via md5, so the training order is exactly "
            "reproducible across engines and re-runs; a new seed yields "
            "an independent permutation for the next epoch",
        tags=("llm",),
    )
    def epoch_shuffle_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
        docs = fixture_df(spark, sf_dir, "documents")
        return epoch_shuffle(docs, seed=1, n_shards=8).orderBy(
            "shard_id", "pos_in_shard"
        )

    @register(
        "contrastive_pair_mining",
        """
        WITH k AS (
          SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS key
          FROM documents),
        d AS (
          SELECT doc_id, key,
                 (ascii(substr(key,1,1))
                    - CASE WHEN ascii(substr(key,1,1)) >= 97 THEN 87 ELSE 48 END) AS d1,
                 (ascii(substr(key,2,1))
                    - CASE WHEN ascii(substr(key,2,1)) >= 97 THEN 87 ELSE 48 END) AS d2,
                 (ascii(substr(key,3,1))
                    - CASE WHEN ascii(substr(key,3,1)) >= 97 THEN 87 ELSE 48 END) AS d3,
                 (ascii(substr(key,4,1))
                    - CASE WHEN ascii(substr(key,4,1)) >= 97 THEN 87 ELSE 48 END) AS d4
          FROM k),
        b AS (
          SELECT doc_id, key,
                 (((d1*16 + d2)*16 + d3)*16 + d4) % 16 AS batch_id
          FROM d),
        p AS (
          SELECT doc_id, batch_id,
                 coalesce(
                   lead(doc_id) OVER w,
                   first_value(doc_id) OVER (
                     PARTITION BY batch_id ORDER BY key, doc_id
                     ROWS BETWEEN UNBOUNDED PRECEDING
                              AND UNBOUNDED FOLLOWING)) AS neg_doc_id
          FROM b WINDOW w AS (PARTITION BY batch_id ORDER BY key, doc_id))
        SELECT CAST(doc_id AS BIGINT) AS doc_id,
               CAST(batch_id AS BIGINT) AS batch_id,
               CAST(neg_doc_id AS BIGINT) AS neg_doc_id
        FROM p WHERE neg_doc_id <> doc_id
        ORDER BY doc_id
        """,
        doc="deterministic in-batch-negative pairing for contrastive/"
            "retriever training (SimCLR / DPR batch shape): md5-bucket "
            "batch assignment + cyclic next-in-md5-order negatives — the "
            "pairing is a pure function of doc_id, so training batches "
            "are reproducible across engines and re-runs",
        tags=("llm",),
    )
    def contrastive_pair_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
        docs = fixture_df(spark, sf_dir, "documents")
        return contrastive_pairs(docs, n_batches=16).orderBy("doc_id")


def contrastive_pairs(
    df: DataFrame,
    n_batches: int = 16,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic contrastive-pair assembly for embedding/retriever
    training (in-batch negatives, the SimCLR / DPR batch shape): every
    document is assigned to a pseudo-random batch (md5 bucket), and its
    hard-wired negative is the NEXT document in md5 order within the
    batch (cyclic — the last wraps to the first). Positives are the
    document's own chunks (see ``text.chunk_documents``); this operator
    pins the (anchor, negative) pairing.

    Everything is a pure function of (id), so the pairing is
    reproducible across engines, re-runs and partitionings — the
    property that makes a training run repeatable. Batches with a
    single document yield no pair (a self-negative is useless) and are
    filtered.

    Scale shape: one shuffle on batch_id (windows parallel across
    batches); batch sizes are corpus/n_batches — pick n_batches so a
    batch fits a partition, exactly like the epoch-shuffle shards.
    """
    key = _md5_key(id_col)
    batch = (_md5_bucket(id_col, n_batches)).cast("long")
    w = Window.partitionBy("batch_id").orderBy("pair_key", id_col)
    w_all = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    neg = F.coalesce(
        F.lead(id_col).over(w), F.first(id_col).over(w_all)
    )
    return (
        df.select(
            F.col(id_col), key.alias("pair_key"), batch.alias("batch_id")
        )
        .withColumn("neg_doc_id", neg.cast("long"))
        .filter(F.col("neg_doc_id") != F.col(id_col))
        .select(id_col, "batch_id", "neg_doc_id")
    )
