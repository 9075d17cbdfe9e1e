"""End-to-end training-data pipeline composition.

Chains the individually-tested stages into the canonical corpus
preparation flow — the thing a user of this engine actually runs
against 100 TB of raw documents:

    clean → quality gate → exact dedup → temperature mixing
          → stratified split → sequence packing

Every stage is a pure DataFrame transformation (the whole pipeline is
one Catalyst plan — Spark fuses/pipelines the narrow stages and the
optimizer sees all of it at once), and every stage's arithmetic is
SQL-expressible, so the *entire composed pipeline* is verified against
a single DuckDB oracle, not just stage-by-stage.

Shuffle budget end-to-end (see SCALE.md): fp window (dedup) + quota agg
+ per-source rank + per-shard pack cumsum = 4 key-bounded shuffles; the
clean/gate/split stages are codegen projections that ride along.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..fixtures import fixture_df

from .sampling import pack_sequences, stratified_split, temperature_sample
from .text import clean_text, tokens_col


def quality_gate(
    df: DataFrame,
    text_col: str = "text_clean",
    min_words: int = 30,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    min_alpha_frac: float = 0.8,
    min_stopword_hits: int = 0,
) -> DataFrame:
    """Parameterized Gopher-style gate (Rae et al. 2021 §A1.1 with
    tunable thresholds — production pipelines always retune these per
    corpus; the defaults here keep synthetic/lorem corpora alive by
    not requiring English stopwords). Pure JVM expressions."""
    from .text import GOPHER_STOPWORDS

    toks = tokens_col(text_col)
    n_words = F.size(toks).cast("bigint")
    mean_word_len = (F.length(F.col(text_col)) - n_words + 1) / n_words
    alpha_frac = F.size(F.filter(toks, lambda t: t.rlike("[a-z]"))) / n_words
    stop_hits = F.size(
        F.array_intersect(
            F.array_distinct(toks),
            F.array(*[F.lit(w) for w in GOPHER_STOPWORDS]),
        )
    )
    keep = (
        n_words.between(min_words, max_words)
        & mean_word_len.between(min_mean_word_len, max_mean_word_len)
        & (alpha_frac > min_alpha_frac)
        & (stop_hits >= min_stopword_hits)
    )
    return df.filter(keep)


def prepare_training_corpus(
    df: DataFrame,
    target_rows: int = 150,
    capacity: int = 512,
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
    min_words: int = 30,
) -> DataFrame:
    """The composed pipeline. Returns one row per selected document:
    (id, source, split, n_tokens, start_offset, bin_id) — exactly what
    a downstream tokenizer-writer consumes to emit packed shards.

    Stage order matters and mirrors production practice: clean before
    fingerprinting (so whitespace variants dedup together), gate before
    dedup (don't pay the fp shuffle for junk), dedup before mixing (so
    quotas count unique documents), split before packing (a context
    window must never straddle train/test — packing shards on
    split/source)."""
    cleaned = clean_text(df, text_col)
    gated = quality_gate(cleaned, "text_clean", min_words=min_words)

    normalized = F.regexp_replace(
        F.trim(F.lower(F.col("text_clean"))), r"\s+", " "
    )
    with_fp = gated.withColumn("fp", F.md5(normalized.cast("binary")))
    surv = (
        with_fp.withColumn(
            "_mn", F.min(id_col).over(Window.partitionBy("fp"))
        )
        .filter(F.col(id_col) == F.col("_mn"))
        .withColumn("n_chars_clean", F.length("text_clean").cast("long"))
    )

    picked = temperature_sample(
        surv, target_rows, id_col, source_col, "n_chars_clean"
    ).join(surv.select(id_col, "text_clean"), id_col)

    with_split = stratified_split(picked, id_col)
    sharded = with_split.withColumn(
        "shard", F.concat_ws("/", "split", source_col)
    )
    packed = pack_sequences(sharded, capacity, id_col, "text_clean", "shard")
    return packed.join(
        with_split.select(id_col, source_col, "split"), id_col
    ).select(id_col, source_col, "split", "n_tokens", "start_offset", "bin_id")


def register_queries(register) -> None:
    @register(
        "training_pipeline_e2e",
        r"""
        WITH cleaned AS (
          SELECT doc_id, source,
                 trim(regexp_replace(
                     regexp_replace(text, '[\x00-\x1F\x7F]', ' ', 'g'),
                     '\s+', ' ', 'g')) AS tc
          FROM documents),
        g AS (
          SELECT doc_id, source, tc,
                 string_split(lower(tc), ' ') AS toks, length(tc) AS nc
          FROM cleaned),
        gated AS (
          SELECT doc_id, source, tc FROM g
          WHERE len(toks) BETWEEN 30 AND 100000
            AND (nc - len(toks) + 1) / len(toks) BETWEEN 3.0 AND 10.0
            AND len(list_filter(toks, t -> regexp_matches(t, '[a-z]')))
                / len(toks) > 0.8),
        fp AS (
          SELECT doc_id, source, tc,
                 md5(regexp_replace(trim(lower(tc)), '\s+', ' ', 'g')) AS fp
          FROM gated),
        surv AS (
          SELECT doc_id, source, tc FROM (
            SELECT *, min(doc_id) OVER (PARTITION BY fp) AS mn FROM fp)
          WHERE doc_id = mn),
        sz AS (SELECT source,
                      CAST(floor(sqrt(CAST(sum(length(tc)) AS DOUBLE)))
                           AS BIGINT) AS w
               FROM surv GROUP BY source),
        tot AS (SELECT CAST(sum(w) AS BIGINT) AS tw FROM sz),
        quota AS (SELECT source, (150 * w) // tw AS q FROM sz, tot),
        ranked AS (
          SELECT s.doc_id, s.source, s.tc,
                 row_number() OVER (
                   PARTITION BY s.source
                   ORDER BY md5(CAST(s.doc_id AS VARCHAR)), s.doc_id) AS rnk
          FROM surv s),
        picked AS (
          SELECT r.doc_id, r.source, r.tc
          FROM ranked r JOIN quota q ON r.source = q.source
          WHERE r.rnk <= q.q),
        hx AS (SELECT doc_id, source, tc,
                      md5(CAST(doc_id AS VARCHAR)) AS h FROM picked),
        dig AS (
          SELECT doc_id, source, tc,
                 (ascii(substr(h,1,1)) - CASE WHEN ascii(substr(h,1,1)) >= 97
                                              THEN 87 ELSE 48 END) AS d1,
                 (ascii(substr(h,2,1)) - CASE WHEN ascii(substr(h,2,1)) >= 97
                                              THEN 87 ELSE 48 END) AS d2,
                 (ascii(substr(h,3,1)) - CASE WHEN ascii(substr(h,3,1)) >= 97
                                              THEN 87 ELSE 48 END) AS d3,
                 (ascii(substr(h,4,1)) - CASE WHEN ascii(substr(h,4,1)) >= 97
                                              THEN 87 ELSE 48 END) AS d4
          FROM hx),
        spl AS (
          SELECT doc_id, source, tc,
                 CASE WHEN (((d1*16+d2)*16+d3)*16+d4) % 100 < 80 THEN 'train'
                      WHEN (((d1*16+d2)*16+d3)*16+d4) % 100 < 90 THEN 'val'
                      ELSE 'test' END AS split
          FROM dig),
        o AS (
          SELECT doc_id, source, split,
                 CAST(len(string_split(tc, ' ')) AS BIGINT) AS n_tokens,
                 CAST(sum(len(string_split(tc, ' '))) OVER (
                        PARTITION BY split, source ORDER BY doc_id
                        ROWS UNBOUNDED PRECEDING)
                      - len(string_split(tc, ' ')) AS BIGINT) AS start_offset
          FROM spl)
        SELECT doc_id, source, split, n_tokens, start_offset,
               start_offset // 512 AS bin_id
        FROM o ORDER BY doc_id
        """,
        doc="the full training-data pipeline composed end-to-end "
            "(clean → quality gate → exact dedup → temperature mixing "
            "→ stratified split → per-shard sequence packing) verified "
            "against ONE DuckDB oracle — the composition itself is "
            "under test, not just the stages; 4 key-bounded shuffles "
            "total, everything else codegen projections",
        tags=("llm",),
    )
    def training_pipeline_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
        docs = fixture_df(spark, sf_dir, "documents")
        return prepare_training_corpus(docs).orderBy("doc_id")


def write_training_shards(
    df: DataFrame,
    path: str,
    shard_cols: tuple[str, ...] = ("split", "source"),
    files_per_shard: int = 4,
    id_col: str = "doc_id",
) -> dict:
    """Terminal pipeline stage: materialize the packed corpus as
    shard-partitioned parquet plus an atomically-committed
    ``_manifest.json`` — the contract a training dataloader consumes
    (which shards exist, how many documents/tokens/bins each holds,
    corpus totals).

    Scale shape: repartition on (shard_cols, salt) before the write,
    where the salt is ``pmod(hash(id), files_per_shard)`` — bare
    low-cardinality shard columns would collapse each terabyte-scale
    shard into ONE write task, while no repartition at all sprays
    one-file-per-input-task into every shard directory; the bounded
    salt keeps both parallelism and file counts under control. The
    manifest is built from a groupBy of the WRITTEN data read back —
    shard-cardinality-sized, so the driver-side JSON is bounded by the
    number of shards, never rows — and committed through the ``fs``
    abstraction's atomic write (tmp + rename), which also keeps the
    manifest working on hdfs://-style roots where raw ``open()`` can't
    reach (same commit discipline as ``mutations.py``).

    Reference scope: the reference's export surface is per-table parquet
    objects (internal/storage/writer.go); sharded training output with a
    dataloader manifest is part of the LLM-pipeline extension family.
    """
    import json

    from .. import fs as fsmod

    salt = F.pmod(F.hash(F.col(id_col)), F.lit(int(files_per_shard)))
    df.repartition(*[F.col(c) for c in shard_cols], salt).write.mode(
        "overwrite"
    ).partitionBy(*shard_cols).parquet(path)

    spark = df.sparkSession
    written = spark.read.parquet(path)
    agg_cols = [F.count("*").cast("long").alias("n_docs")]
    if "n_tokens" in written.columns:
        agg_cols.append(F.sum("n_tokens").cast("long").alias("n_tokens"))
    if "bin_id" in written.columns:
        agg_cols.append(
            (F.countDistinct("bin_id")).cast("long").alias("n_bins")
        )
    per_shard = written.groupBy(*shard_cols).agg(*agg_cols).collect()
    shards = sorted(
        (
            {
                "shard": "/".join(str(r[c]) for c in shard_cols),
                **{
                    k: int(r[k])
                    for k in r.asDict()
                    if k not in shard_cols
                },
            }
            for r in per_shard
        ),
        key=lambda s: s["shard"],
    )
    manifest = {
        "shard_cols": list(shard_cols),
        "n_shards": len(shards),
        "total_docs": sum(s["n_docs"] for s in shards),
        "total_tokens": sum(s.get("n_tokens", 0) for s in shards),
        "shards": shards,
    }
    # underscore prefix: Spark/Hadoop file listings skip _-prefixed
    # names, so the manifest can live inside the dataset root without
    # breaking read-back of the parquet shards
    fsmod.get_fs(spark, path).write_bytes(
        fsmod.join(path, "_manifest.json"),
        json.dumps(manifest, indent=1, sort_keys=True).encode(),
    )
    return manifest
