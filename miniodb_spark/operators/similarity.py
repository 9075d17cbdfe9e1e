"""Similarity search over embedding columns (array<float>).

- **Brute-force cosine top-k**: the correctness baseline. Dot product
  and norms are pure Catalyst array expressions (``zip_with`` +
  ``aggregate``) over doubles — JVM-side, codegen'd, no UDF. At scale
  this is a single narrow scan + TakeOrderedAndProject: linear, no
  shuffle except the final top-k reduction.
- **Random-hyperplane LSH ANN**: the scale path. Each vector gets a
  b-bit bucket from sign(v·plane_i) with fixed seeded planes; queries
  probe only their bucket (and optionally neighbors). Bucketing is a
  deterministic column expression, so the bucketed table can be
  written out partitioned by bucket — probes become partition-pruned
  scans.
- **Embedding near-dup**: pairs with cosine ≥ threshold via the same
  LSH buckets (self-join within bucket), verified exactly.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..fixtures import fixture_df


def _as_double(col):
    return F.col(col).cast("array<double>") if isinstance(col, str) else col.cast("array<double>")


def dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def norm(a):
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x))


def cosine(a, b):
    return dot(a, b) / (norm(a) * norm(b))


def cosine_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Brute-force cosine top-k against a literal query vector."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    sim = cosine(_as_double(vec_col), q)
    return (
        df.select(F.col(id_col), sim.alias("cosine_sim"))
        .orderBy(F.col("cosine_sim").desc(), F.col(id_col))
        .limit(k)
    )


def hyperplanes(dim: int, bits: int = 16, seed: int = 42) -> np.ndarray:
    """Fixed random hyperplanes — deterministic across runs/executors."""
    rng = np.random.RandomState(seed)
    return rng.randn(bits, dim)


def lsh_bucket_col(vec_col: str, planes: np.ndarray):
    """b-bit signed-projection bucket id as a column expression."""
    bucket = F.lit(0).cast("long")
    v = _as_double(vec_col)
    for i, plane in enumerate(planes):
        p = F.array(*[F.lit(float(x)) for x in plane])
        bit = F.when(dot(v, p) > 0, F.lit(1 << i)).otherwise(F.lit(0))
        bucket = bucket + bit
    return bucket.cast("long")


def lsh_bucketize(df: DataFrame, vec_col: str = "embedding", bits: int = 8,
                  seed: int = 42) -> DataFrame:
    dim = len(df.select(vec_col).first()[0])
    planes = hyperplanes(dim, bits, seed)
    return df.withColumn("lsh_bucket", lsh_bucket_col(vec_col, planes))


def ann_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    bits: int = 8,
    seed: int = 42,
    probe_hamming: int = 1,
) -> DataFrame:
    """ANN top-k: score only vectors whose LSH bucket is within
    ``probe_hamming`` bits of the query's bucket (multi-probe)."""
    dim = len(query_vec)
    planes = hyperplanes(dim, bits, seed)
    qbits = sum((1 << i) for i, p in enumerate(planes) if float(np.dot(p, query_vec)) > 0)
    bucketed = df.withColumn("lsh_bucket", lsh_bucket_col(vec_col, planes))
    candidates = bucketed.filter(
        F.bit_count(F.col("lsh_bucket").bitwiseXOR(F.lit(qbits))) <= probe_hamming
    )
    return cosine_topk(candidates, query_vec, k, vec_col, id_col)


def write_bucketed(df: DataFrame, path: str, vec_col: str = "embedding",
                   bits: int = 8, seed: int = 42, source=None) -> None:
    """Materialize the LSH-bucketed table partitioned by bucket — the
    100 TB storage layout for ANN serving: the bucket expression is
    deterministic, so probes against the written table filter on
    ``lsh_bucket`` and Spark prunes to the probed partition directories
    (no full scan; proven by
    ``test_similarity_scale.py::test_probe_is_partition_pruned``).

    ``source`` (an :class:`miniodb_spark.serving.IndexSource`, from
    ``engine.index_source(table)``) stamps the staleness sidecar: the
    base table's nonce is snapshotted BEFORE the build so a racing
    mutation makes the index stale, never silently fresh."""
    ver = source.current() if source is not None else None
    lsh_bucketize(df, vec_col, bits, seed).write.mode("overwrite").partitionBy(
        "lsh_bucket"
    ).parquet(path)
    if source is not None:
        from ..serving import stamp_index

        stamp_index(df.sparkSession, path, source, ver)


def probe_bucketed(spark: SparkSession, path: str, query_vec: list[float],
                   k: int = 10, vec_col: str = "embedding",
                   id_col: str = "vec_id", bits: int = 8, seed: int = 42,
                   probe_hamming: int = 1,
                   on_stale: str = "raise") -> DataFrame:
    """ANN top-k against a :func:`write_bucketed` table. The bucket
    filter is a partition filter → partition-pruned scan. Enforces the
    staleness contract first (stamped indexes raise — or warn, per
    ``on_stale`` — when the base table mutated after the build)."""
    from ..serving import check_index

    check_index(spark, path, on_stale)
    dim = len(query_vec)
    planes = hyperplanes(dim, bits, seed)
    qbits = sum((1 << i) for i, p in enumerate(planes) if float(np.dot(p, query_vec)) > 0)
    probe = [
        b for b in range(1 << bits)
        if bin(b ^ qbits).count("1") <= probe_hamming
    ]
    df = spark.read.parquet(path).filter(F.col("lsh_bucket").isin(probe))
    return cosine_topk(df, query_vec, k, vec_col, id_col)


class IVFIndex:
    """Inverted-file ANN index: k-means centroids (trained on a bounded
    driver-side sample — at 100 TB you never need more than ~100k sampled
    vectors to place centroids), cluster assignment as a vectorized
    Pandas UDF (one numpy matmul per Arrow batch), queries probe the
    ``nprobe`` nearest centroid cells only.

    The assignment column is deterministic, so the bucketed table can be
    written out partitioned by ``ivf_cell`` — probes then become
    partition-pruned scans, the same storage trick as the LSH path."""

    def __init__(self, n_cells: int = 16, seed: int = 42, iters: int = 10):
        self.n_cells = n_cells
        self.seed = seed
        self.iters = iters
        self.centroids: np.ndarray | None = None  # (k, dim), L2-normalized

    def fit(self, df: DataFrame, vec_col: str = "embedding", sample: int = 10_000) -> "IVFIndex":
        rows = df.select(vec_col).limit(sample).collect()
        return self.fit_x(np.array([r[0] for r in rows], dtype=np.float64))

    def fit_x(self, x: np.ndarray) -> "IVFIndex":
        """Array-level training (shared with :class:`IVFPQIndex`)."""
        x = x / (np.linalg.norm(x, axis=1, keepdims=True) + 1e-12)
        rng = np.random.RandomState(self.seed)
        cent = x[rng.choice(len(x), size=min(self.n_cells, len(x)), replace=False)]
        for _ in range(self.iters):  # spherical k-means (cosine)
            assign = np.argmax(x @ cent.T, axis=1)
            for c in range(len(cent)):
                members = x[assign == c]
                if len(members):
                    m = members.mean(axis=0)
                    cent[c] = m / (np.linalg.norm(m) + 1e-12)
        self.centroids = cent
        return self

    def assign_cells(self, df: DataFrame, vec_col: str = "embedding") -> DataFrame:
        cent = self.centroids

        @F.pandas_udf("int")
        def _cell(v: pd.Series) -> pd.Series:
            x = np.array(v.tolist(), dtype=np.float64)
            x /= np.linalg.norm(x, axis=1, keepdims=True) + 1e-12
            return pd.Series(np.argmax(x @ cent.T, axis=1).astype("int32"))

        return df.withColumn("ivf_cell", _cell(F.col(vec_col)))

    def save(self, path: str) -> None:
        """Persist trained centroids as JSON — the index definition is
        tiny (k × dim floats) and must outlive the session so probes
        against a :func:`write_ivf` table use the exact centroids the
        table was partitioned with."""
        import json

        with open(path, "w", encoding="utf-8") as fh:
            json.dump(
                {"n_cells": self.n_cells, "seed": self.seed,
                 "centroids": self.centroids.tolist()},
                fh,
            )

    @classmethod
    def load(cls, path: str) -> "IVFIndex":
        import json

        with open(path, encoding="utf-8") as fh:
            doc = json.load(fh)
        idx = cls(n_cells=doc["n_cells"], seed=doc["seed"])
        idx.centroids = np.asarray(doc["centroids"], dtype=np.float64)
        return idx

    def query_cells(self, query_vec: list[float], nprobe: int = 4) -> list[int]:
        q = np.asarray(query_vec, dtype=np.float64)
        q /= np.linalg.norm(q) + 1e-12
        sims = self.centroids @ q
        return [int(i) for i in np.argsort(-sims)[:nprobe]]


def ivf_topk(
    df: DataFrame,
    index: IVFIndex,
    query_vec: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    nprobe: int = 4,
) -> DataFrame:
    """ANN top-k through the IVF index: score only the probed cells."""
    cells = index.query_cells(query_vec, nprobe)
    bucketed = index.assign_cells(df, vec_col)
    return cosine_topk(
        bucketed.filter(F.col("ivf_cell").isin(cells)), query_vec, k, vec_col, id_col
    )


def write_ivf(df: DataFrame, index: "IVFIndex", path: str,
              vec_col: str = "embedding", source=None) -> None:
    """Materialize the IVF-assigned table partitioned by cell — same
    serving trick as :func:`write_bucketed`: the assignment is
    deterministic given the trained centroids, so probes against the
    written table prune to the nprobe cell directories. ``source``
    stamps the staleness sidecar (nonce snapshotted pre-build)."""
    ver = source.current() if source is not None else None
    index.assign_cells(df, vec_col).write.mode("overwrite").partitionBy(
        "ivf_cell"
    ).parquet(path)
    if source is not None:
        from ..serving import stamp_index

        stamp_index(df.sparkSession, path, source, ver)


def probe_ivf(spark: SparkSession, path: str, index: "IVFIndex",
              query_vec: list[float], k: int = 10,
              vec_col: str = "embedding", id_col: str = "vec_id",
              nprobe: int = 4, on_stale: str = "raise") -> DataFrame:
    """ANN top-k against a :func:`write_ivf` table; the cell filter is a
    partition filter → partition-pruned scan. Enforces the staleness
    contract first."""
    from ..serving import check_index

    check_index(spark, path, on_stale)
    cells = index.query_cells(query_vec, nprobe)
    df = spark.read.parquet(path).filter(F.col("ivf_cell").isin(cells))
    return cosine_topk(df, query_vec, k, vec_col, id_col)


def embedding_near_dup_pairs(
    df: DataFrame,
    threshold: float = 0.95,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    bits: int = 16,
    seed: int = 42,
    max_bucket_size: int | None = 2000,
) -> DataFrame:
    """Near-duplicate vector pairs: LSH-bucket self-join + exact cosine
    verification (bucket join bounds the quadratic blowup).

    Scale guards (same pattern as ``dedup.minhash_lsh_pairs``): the
    default is 16 hyperplanes (65k buckets — at 8 bits every one of the
    256 buckets holds ~N/256 vectors at corpus scale and the verify join
    goes quadratic regardless of content), and ``max_bucket_size`` drops
    any bucket larger than the cap before the self-join — a corpus
    saturated with copies of one vector collapses onto a single bucket
    that would otherwise self-join quadratically. Exact-duplicate
    vectors belong to a cheaper hash-groupBy pass run first; recall
    among surviving buckets is the usual signed-projection bound."""
    bucketed = lsh_bucketize(df, vec_col, bits, seed).select(
        id_col, vec_col, "lsh_bucket"
    )
    if max_bucket_size is not None:
        from pyspark.sql import Window as W

        bucket_n = F.count("*").over(W.partitionBy("lsh_bucket"))
        bucketed = (
            bucketed.withColumn("_bn", bucket_n)
            .filter(F.col("_bn") <= max_bucket_size)
            .drop("_bn")
        )
    a, b = bucketed.alias("a"), bucketed.alias("b")
    sim = cosine(_as_double(f"a.{vec_col}"), _as_double(f"b.{vec_col}"))
    return (
        a.join(
            b,
            (F.col("a.lsh_bucket") == F.col("b.lsh_bucket"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            sim.alias("cosine_sim"),
        )
        .filter(F.col("cosine_sim") >= threshold)
    )


def semantic_dedup_survivors(
    df: DataFrame,
    index: "IVFIndex | None" = None,
    threshold: float = 0.9,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_cells: int = 16,
    max_cell_size: int | None = 2000,
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al.,
    arXiv:2303.09540): cluster the embeddings with spherical k-means,
    then inside each cluster drop every vector that has a lower-id
    cluster-mate with cosine >= ``threshold`` (greedy keep-min-id — the
    same survivor rule as ``dedup.corpus_survivors``). Returns the full
    id set with ``sem_cell`` and ``is_kept`` columns.

    Scale shape: the only quadratic work is the within-cell self-join,
    bounded by cluster size — at corpus scale ``n_cells`` grows ~sqrt(N)
    (FAISS guidance) so cells stay ~sqrt(N)-sized, and ``max_cell_size``
    hard-caps degenerate clusters (a corpus saturated with one vector
    collapses into one cell; those rows are kept un-deduped rather than
    joined quadratically, mirroring ``embedding_near_dup_pairs``'s
    guard). Cell assignment is a vectorized pandas_udf over broadcast
    centroids; the pair join shuffles on ``sem_cell`` only.
    """
    if index is None:
        index = IVFIndex(n_cells=n_cells).fit(df, vec_col)
    assigned = index.assign_cells(df, vec_col).select(
        F.col(id_col), F.col(vec_col), F.col("ivf_cell").alias("sem_cell")
    )
    joinable = assigned
    if max_cell_size is not None:
        from pyspark.sql import Window as W

        cell_n = F.count("*").over(W.partitionBy("sem_cell"))
        joinable = (
            assigned.withColumn("_cn", cell_n)
            .filter(F.col("_cn") <= max_cell_size)
            .drop("_cn")
        )
    a, b = joinable.alias("a"), joinable.alias("b")
    sim = cosine(_as_double(f"a.{vec_col}"), _as_double(f"b.{vec_col}"))
    dropped = (
        a.join(
            b,
            (F.col("a.sem_cell") == F.col("b.sem_cell"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .filter(sim >= F.lit(threshold))
        .select(F.col(f"b.{id_col}").alias(id_col))
        .distinct()
    )
    return assigned.select(id_col, "sem_cell").join(
        dropped.withColumn("_drop", F.lit(True)), id_col, "left"
    ).select(
        id_col,
        "sem_cell",
        F.coalesce(~F.col("_drop"), F.lit(True)).alias("is_kept"),
    )


def corpus_centroid(df: DataFrame, vec_col: str = "embedding") -> list[float]:
    """Per-dimension mean of an embedding column, computed distributed:
    posexplode → per-dimension avg (a shuffle of dim-sized cardinality,
    map-side combined) → a dim-length collect. The collect is bounded by
    the embedding dimension, never by corpus size."""
    rows = (
        df.select(F.posexplode(_as_double(vec_col)).alias("pos", "val"))
        .groupBy("pos")
        .agg(F.avg("val").alias("c"))
        .orderBy("pos")
        .collect()
    )
    return [float(r["c"]) for r in rows]


def centroid_outliers(
    df: DataFrame,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    centroid: list[float] | None = None,
) -> DataFrame:
    """Top-k embedding outliers by Euclidean distance to the corpus
    centroid — the standard first-pass filter for mislabeled / corrupt
    vectors before ANN indexing. The centroid is broadcast as a literal
    array; the distance is a pure Catalyst fold (zip_with + aggregate),
    so scoring is a narrow codegen scan and the only reduction is the
    final TakeOrderedAndProject."""
    if centroid is None:
        centroid = corpus_centroid(df, vec_col)
    cent = F.array(*[F.lit(float(c)) for c in centroid])
    sq = F.zip_with(_as_double(vec_col), cent, lambda x, c: (x - c) * (x - c))
    dist = F.sqrt(F.aggregate(sq, F.lit(0.0), lambda acc, x: acc + x))
    return (
        df.select(F.col(id_col), dist.alias("dist_raw"))
        .orderBy(F.col("dist_raw").desc(), F.col(id_col))
        .limit(k)
        .select(id_col, F.round("dist_raw", 4).alias("dist4"))
    )


def quantize_int8(
    df: DataFrame, vec_col: str = "embedding", id_col: str = "vec_id"
) -> DataFrame:
    """Symmetric per-vector int8 quantization — the standard 4× storage
    compression for embedding serving (scale = 127 / max|x|, code =
    round(x·scale) clamped to [-127, 127]). Keeps (id, codes, scale);
    dequantization is codes / scale.

    Pure Catalyst array expressions (transform / array_max) — codegen,
    no UDF, no shuffle: quantization is a narrow map over the scan.
    Compare PQIndex for the 21× product-quantization path; int8 is the
    cheap general-purpose tier that preserves exact dimensionality."""
    v = _as_double(vec_col)
    maxabs = F.array_max(F.transform(v, lambda x: F.abs(x)))
    scale = F.when(maxabs > 0, F.lit(127.0) / maxabs).otherwise(F.lit(1.0))
    code = F.transform(
        v,
        lambda x: F.greatest(
            F.lit(-127), F.least(F.lit(127), F.round(x * scale).cast("int"))
        ),
    )
    return df.select(
        F.col(id_col),
        code.alias("q_codes"),
        scale.alias("q_scale"),
    )


def knn_join(
    queries_df: DataFrame,
    corpus_df: DataFrame,
    k: int = 3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Batched k-NN join: exact cosine top-k neighbors in ``corpus_df``
    for EVERY vector in ``queries_df`` at once (the batch-serving /
    retrieval-training shape — e.g. mining hard negatives for a whole
    query set — where per-query ``cosine_topk`` calls would launch Q
    jobs and rescan the corpus Q times).

    Two-stage partial top-k, the only shape that survives 100 TB:

    1. The query batch (bounded — a serving batch, not a table) is
       collected once and closed over as a dense float64 matrix. Each
       corpus Arrow batch computes all Q similarities with ONE numpy
       matmul (vectorized, Arrow-fed ``mapInPandas``) and emits only
       its per-query top-k — ≤ Q·k rows per batch regardless of batch
       size. The corpus is scanned once, projected to (id, vec), and
       never shuffled.
    2. The surviving Q·k·n_batches candidate rows (tiny) take one
       window over query_id for the global rank.

    Tie-break inside stage 1 matches stage 2 exactly — (sim desc,
    neighbor_id asc) via lexsort — so boundary ties cannot flip the
    final result between engines. A window over the RAW corpus×queries
    product would shuffle N·Q rows; this shuffles Q·k·n_batches.

    Reference scope: the reference engine has no vector surface at all
    (its QueryData path is SQL-only — internal/query/engine.go); this
    is part of the LLM-pipeline extension family alongside
    ``cosine_topk`` / IVF / PQ serving.
    """
    qrows = queries_df.select(id_col, vec_col).collect()
    if not qrows:
        return queries_df.sparkSession.createDataFrame(
            [], "query_id long, neighbor_id long, rnk long, sim double"
        )
    qids = np.asarray([int(r[0]) for r in qrows], dtype=np.int64)
    qmat = np.asarray([[float(x) for x in r[1]] for r in qrows], dtype=np.float64)
    qnorm = np.linalg.norm(qmat, axis=1)
    qnorm[qnorm == 0] = 1.0

    def _partial(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            cmat = np.asarray(
                [[float(x) for x in v] for v in pdf[vec_col]], dtype=np.float64
            )
            cnorm = np.linalg.norm(cmat, axis=1)
            cnorm[cnorm == 0] = 1.0
            sims = (cmat @ qmat.T) / np.outer(cnorm, qnorm)
            ids = pdf[id_col].to_numpy(dtype=np.int64)
            kk = min(k, len(pdf))
            out_q, out_n, out_s = [], [], []
            for j in range(len(qids)):
                order = np.lexsort((ids, -sims[:, j]))[:kk]
                out_q.extend([qids[j]] * kk)
                out_n.extend(ids[order])
                out_s.extend(sims[order, j])
            yield pd.DataFrame(
                {"query_id": out_q, "neighbor_id": out_n, "sim": out_s}
            )

    partial = corpus_df.select(id_col, vec_col).mapInPandas(
        _partial, "query_id long, neighbor_id long, sim double"
    )
    from pyspark.sql import Window as W

    w = W.partitionBy("query_id").orderBy(F.col("sim").desc(), "neighbor_id")
    return (
        partial.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("query_id", "neighbor_id", F.col("rnk").cast("long").alias("rnk"), "sim")
    )


# ---------------------------------------------------------------------------
# registry entries
# ---------------------------------------------------------------------------


class PQIndex:
    """Product-quantization codes for memory-bounded ANN — the
    compression scale path: 100 TB of float embeddings don't fit an
    uncompressed serving tier, but m sub-codes of log2(k) bits each
    (64-dim float32 = 256 B → m=8, k=16 ⇒ 4 B, a 64× compression) do.

    Public technique (Jégou, Douze, Schmid, "Product Quantization for
    Nearest Neighbor Search", TPAMI 2011): split each L2-normalized
    vector into ``m`` subvectors, k-means each subspace (trained on a
    bounded driver-side sample, like :class:`IVFIndex`), store only the
    per-subspace centroid indices. Search is ADC (asymmetric distance
    computation): the query stays exact, a per-query (m × k) table of
    subspace inner products is computed once on the driver and the
    per-vector score is ``m`` table lookups — a vectorized numpy gather
    per Arrow batch, no float vectors ever scanned."""

    def __init__(self, m: int = 8, k: int = 16, seed: int = 42, iters: int = 12):
        self.m = m
        self.k = k
        self.seed = seed
        self.iters = iters
        self.codebooks: np.ndarray | None = None  # (m, k, dim//m)

    def _split(self, x: np.ndarray) -> np.ndarray:
        n, dim = x.shape
        assert dim % self.m == 0, f"dim {dim} not divisible by m={self.m}"
        return x.reshape(n, self.m, dim // self.m)

    def fit(self, df: DataFrame, vec_col: str = "embedding",
            sample: int = 10_000) -> "PQIndex":
        rows = df.select(vec_col).limit(sample).collect()
        return self.fit_x(np.array([r[0] for r in rows], dtype=np.float64))

    def fit_x(self, x: np.ndarray, normalize: bool = True) -> "PQIndex":
        """Array-level training. ``normalize=False`` fits the codebooks
        on raw inputs — used by :class:`IVFPQIndex`, whose PQ stage
        quantizes *residuals* (not unit vectors)."""
        if normalize:
            x = x / (np.linalg.norm(x, axis=1, keepdims=True) + 1e-12)
        sub = self._split(x)  # (n, m, d/m)
        rng = np.random.RandomState(self.seed)
        books = []
        for j in range(self.m):
            xs = sub[:, j, :]
            k = min(self.k, len(xs))
            cent = xs[rng.choice(len(xs), size=k, replace=False)]
            for _ in range(self.iters):  # plain L2 k-means per subspace
                d2 = ((xs[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
                assign = np.argmin(d2, axis=1)
                for c in range(k):
                    members = xs[assign == c]
                    if len(members):
                        cent[c] = members.mean(axis=0)
            books.append(cent)
        self.codebooks = np.stack(books)  # (m, k, d/m)
        return self

    def encode(self, df: DataFrame, vec_col: str = "embedding") -> DataFrame:
        """Append ``pq_code`` (array<int>, length m). The float vector
        column can then be dropped from the serving copy — the codes +
        tiny codebooks are the index."""
        books = self.codebooks
        m = self.m

        @F.pandas_udf("array<int>")
        def _code(v: pd.Series) -> pd.Series:
            x = np.array(v.tolist(), dtype=np.float64)
            x /= np.linalg.norm(x, axis=1, keepdims=True) + 1e-12
            sub = x.reshape(len(x), m, -1)
            codes = np.empty((len(x), m), dtype=np.int32)
            for j in range(m):
                d2 = ((sub[:, j, None, :] - books[j][None, :, :]) ** 2).sum(axis=2)
                codes[:, j] = np.argmin(d2, axis=1)
            return pd.Series(list(codes))

        return df.withColumn("pq_code", _code(F.col(vec_col)))

    def adc_table(self, query_vec: list[float]) -> np.ndarray:
        """(m × k) table of subspace inner products for one query."""
        q = np.asarray(query_vec, dtype=np.float64)
        q /= np.linalg.norm(q) + 1e-12
        qs = q.reshape(self.m, -1)  # (m, d/m)
        return np.einsum("mkd,md->mk", self.codebooks, qs)


def pq_topk(
    encoded: DataFrame,
    index: PQIndex,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
) -> DataFrame:
    """ADC top-k over PQ codes: per-row score is m table lookups (one
    numpy gather per Arrow batch); the plan is a narrow (id, code) scan
    + TakeOrderedAndProject — no float embeddings are read at all."""
    table = index.adc_table(query_vec)
    m = index.m

    @F.pandas_udf("double")
    def _score(codes: pd.Series) -> pd.Series:
        c = np.array(codes.tolist(), dtype=np.int64)  # (n, m)
        return pd.Series(table[np.arange(m)[None, :], c].sum(axis=1))

    return (
        encoded.select(F.col(id_col), _score(F.col("pq_code")).alias("adc_sim"))
        .orderBy(F.col("adc_sim").desc(), F.col(id_col))
        .limit(k)
    )


def pq_rerank_topk(
    df: DataFrame,
    encoded: DataFrame,
    index: PQIndex,
    query_vec: list[float],
    k: int = 10,
    shortlist: int = 50,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """The standard PQ serving pattern: ADC prunes the corpus to a
    ``shortlist`` over codes alone (narrow compressed scan), then exact
    cosine re-ranks only the shortlist's float vectors — a broadcast
    semi-join of ``shortlist`` ids against the vector table, so the
    expensive column is read for a few dozen rows regardless of corpus
    size. Compression bounds the scan; re-ranking restores the exact
    top-k ordering within the shortlist."""
    short_ids = pq_topk(encoded, index, query_vec, shortlist, id_col).select(id_col)
    candidates = df.join(F.broadcast(short_ids), id_col, "left_semi")
    return cosine_topk(candidates, query_vec, k, vec_col, id_col)


class IVFPQIndex:
    """IVF×PQ composition — the actual 100 TB ANN serving architecture
    (FAISS's IVFADC; Jégou/Douze/Schmid TPAMI 2011 §V): a coarse IVF
    quantizer routes each vector to a cell, and PQ encodes the
    **residual** ``v - centroid(cell)`` with codebooks shared across
    cells. The serving copy stores only ``(id, ivf_cell, pq_code)``
    partitioned by cell, so a probe

    1. prunes to ``nprobe`` cell *directories* (partition pruning — the
       IVF half), then
    2. scans only the 96-bit codes inside them (compression — the PQ
       half), scoring ``q·v ≈ q·c_cell + Σ_j table[j][code_j]`` with one
       per-query (m × k) ADC table and a numpy gather per Arrow batch.

    Against a 100 TB float corpus the probe reads a few GB of codes from
    a few directories; the float column is touched only by the optional
    exact re-rank of a ~50-id broadcast shortlist."""

    def __init__(self, n_cells: int = 16, m: int = 16, k: int = 64,
                 seed: int = 42):
        self.ivf = IVFIndex(n_cells=n_cells, seed=seed)
        self.pq = PQIndex(m=m, k=k, seed=seed)

    def fit(self, df: DataFrame, vec_col: str = "embedding",
            sample: int = 10_000) -> "IVFPQIndex":
        rows = df.select(vec_col).limit(sample).collect()
        x = np.array([r[0] for r in rows], dtype=np.float64)
        x /= np.linalg.norm(x, axis=1, keepdims=True) + 1e-12
        self.ivf.fit_x(x)
        assign = np.argmax(x @ self.ivf.centroids.T, axis=1)
        self.pq.fit_x(x - self.ivf.centroids[assign], normalize=False)
        return self

    def encode(self, df: DataFrame, vec_col: str = "embedding") -> DataFrame:
        """Append ``ivf_cell`` + residual ``pq_code`` in ONE vectorized
        pass (a struct-returning pandas UDF — cell assignment and
        residual quantization share the normalized batch)."""
        cent, books, m = self.ivf.centroids, self.pq.codebooks, self.pq.m

        @F.pandas_udf("struct<ivf_cell:int, pq_code:array<int>>")
        def _enc(v: pd.Series) -> pd.DataFrame:
            x = np.array(v.tolist(), dtype=np.float64)
            x /= np.linalg.norm(x, axis=1, keepdims=True) + 1e-12
            cells = np.argmax(x @ cent.T, axis=1)
            sub = (x - cent[cells]).reshape(len(x), m, -1)
            codes = np.empty((len(x), m), dtype=np.int32)
            for j in range(m):
                d2 = ((sub[:, j, None, :] - books[j][None, :, :]) ** 2).sum(axis=2)
                codes[:, j] = np.argmin(d2, axis=1)
            return pd.DataFrame({"ivf_cell": cells.astype("int32"),
                                 "pq_code": list(codes)})

        return (
            df.withColumn("_enc", _enc(F.col(vec_col)))
            .withColumn("ivf_cell", F.col("_enc.ivf_cell"))
            .withColumn("pq_code", F.col("_enc.pq_code"))
            .drop("_enc")
        )

    def save(self, path: str) -> None:
        import json

        with open(path, "w", encoding="utf-8") as fh:
            json.dump({
                "n_cells": self.ivf.n_cells, "m": self.pq.m,
                "k": self.pq.k, "seed": self.ivf.seed,
                "centroids": self.ivf.centroids.tolist(),
                "codebooks": self.pq.codebooks.tolist(),
            }, fh)

    @classmethod
    def load(cls, path: str) -> "IVFPQIndex":
        import json

        with open(path, encoding="utf-8") as fh:
            doc = json.load(fh)
        idx = cls(n_cells=doc["n_cells"], m=doc["m"], k=doc["k"],
                  seed=doc["seed"])
        idx.ivf.centroids = np.asarray(doc["centroids"], dtype=np.float64)
        idx.pq.codebooks = np.asarray(doc["codebooks"], dtype=np.float64)
        return idx


def ivfpq_topk(
    encoded: DataFrame,
    index: IVFPQIndex,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    nprobe: int = 4,
) -> DataFrame:
    """IVFADC top-k over an :meth:`IVFPQIndex.encode` table: probe the
    ``nprobe`` nearest cells only, score codes via the shared-codebook
    ADC table plus the per-cell ``q·centroid`` bias (a tiny literal map
    — nprobe entries). The plan is a cell-filtered narrow
    (id, cell, code) scan + TakeOrderedAndProject."""
    import itertools

    cells = index.ivf.query_cells(query_vec, nprobe)
    table = index.pq.adc_table(query_vec)
    q = np.asarray(query_vec, dtype=np.float64)
    q /= np.linalg.norm(q) + 1e-12
    bias = {c: float(index.ivf.centroids[c] @ q) for c in cells}
    m = index.pq.m

    @F.pandas_udf("double")
    def _res_sim(codes: pd.Series) -> pd.Series:
        c = np.array(codes.tolist(), dtype=np.int64)  # (n, m)
        return pd.Series(table[np.arange(m)[None, :], c].sum(axis=1))

    bias_map = F.create_map(*itertools.chain.from_iterable(
        (F.lit(c), F.lit(bias[c])) for c in cells))
    return (
        encoded.filter(F.col("ivf_cell").isin(cells))
        .select(F.col(id_col), F.col("ivf_cell"),
                _res_sim(F.col("pq_code")).alias("_res"))
        .select(F.col(id_col),
                (bias_map[F.col("ivf_cell")] + F.col("_res")).alias("adc_sim"))
        .orderBy(F.col("adc_sim").desc(), F.col(id_col))
        .limit(k)
    )


def ivfpq_rerank_topk(
    df: DataFrame,
    encoded: DataFrame,
    index: IVFPQIndex,
    query_vec: list[float],
    k: int = 10,
    shortlist: int = 50,
    nprobe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Full IVFPQ serving: cell-pruned ADC shortlist over codes, exact
    cosine re-rank of the shortlist's float vectors via broadcast
    semi-join (same pattern as :func:`pq_rerank_topk`)."""
    short_ids = ivfpq_topk(encoded, index, query_vec, shortlist, id_col,
                           nprobe).select(id_col)
    candidates = df.join(F.broadcast(short_ids), id_col, "left_semi")
    return cosine_topk(candidates, query_vec, k, vec_col, id_col)


def write_ivfpq(df: DataFrame, index: IVFPQIndex, path: str,
                vec_col: str = "embedding", id_col: str = "vec_id",
                source=None) -> None:
    """Materialize the IVFPQ serving copy: ONLY (id, cell, code) —
    no float vectors — partitioned by cell. At 64-dim float32 this is
    ~21× smaller than the embedding table; probes prune to nprobe
    directories of it. ``source`` stamps the staleness sidecar (nonce
    snapshotted pre-build)."""
    ver = source.current() if source is not None else None
    index.encode(df, vec_col).select(id_col, "ivf_cell", "pq_code").write.mode(
        "overwrite"
    ).partitionBy("ivf_cell").parquet(path)
    if source is not None:
        from ..serving import stamp_index

        stamp_index(df.sparkSession, path, source, ver)


def probe_ivfpq(spark: SparkSession, path: str, index: IVFPQIndex,
                query_vec: list[float], k: int = 10, id_col: str = "vec_id",
                nprobe: int = 4, on_stale: str = "raise") -> DataFrame:
    """ADC top-k against a :func:`write_ivfpq` table; the cell filter is
    a partition filter → directory-pruned scan of codes only. Enforces
    the staleness contract first."""
    from ..serving import check_index

    check_index(spark, path, on_stale)
    return ivfpq_topk(spark.read.parquet(path), index, query_vec, k,
                      id_col, nprobe)


def register_queries(register) -> None:
    @register(
        "embedding_cosine_topk",
        """
        WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
        SELECT vec_id,
               round(list_cosine_similarity(CAST(embedding AS DOUBLE[]),
                                            CAST(qv AS DOUBLE[])), 4) AS sim4
        FROM embeddings, q
        WHERE vec_id <> 0
        ORDER BY list_cosine_similarity(CAST(embedding AS DOUBLE[]),
                                        CAST(qv AS DOUBLE[])) DESC, vec_id
        LIMIT 10
        """,
        doc="brute-force cosine top-10 against the vec_id=0 vector (rounded to 4dp "
            "to absorb cross-engine float summation order)",
        tags=("llm", "capability"),
    )
    def embedding_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
        emb = fixture_df(spark, sf_dir, "embeddings")
        # the query vector arrives as a broadcast 1-row cross join, not
        # a .first() driver roundtrip: one DAG instead of a blocking
        # collect + a 64-literal expression tree (guide §5 — keep the
        # driver out of the query path; measured -0.13 s at sf0.1)
        # limit(1) pins the single-query-vector contract (r17 ADVICE):
        # were the fixture ever to carry duplicate vec_id=0 rows, the
        # cross join would otherwise fan every similarity row out per
        # duplicate instead of scoring against one vector
        q = F.broadcast(
            emb.filter(F.col("vec_id") == 0)
            .select(_as_double("embedding").alias("_qv"))
            .limit(1)
        )
        sim = cosine(_as_double("embedding"), F.col("_qv"))
        return (
            emb.filter(F.col("vec_id") != 0)
            .crossJoin(q)
            .select("vec_id", sim.alias("sim_raw"))
            .orderBy(F.col("sim_raw").desc(), F.col("vec_id"))
            .limit(10)
            .select("vec_id", F.round("sim_raw", 4).alias("sim4"))
        )

    @register(
        "embedding_ann_recall",
        "SELECT true AS recall_ok",
        doc="LSH-bucketed ANN recall@10 ≥ 0.4 vs brute force (multi-probe, 4-bit "
            "buckets — random uncorrelated vectors are the worst case for LSH, so "
            "the bound is deliberately loose; real embedding corpora cluster)",
        tags=("llm", "capability"),
    )
    def embedding_ann_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
        emb = fixture_df(spark, sf_dir, "embeddings")
        qv = [float(x) for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]]
        exact = {r["vec_id"] for r in cosine_topk(emb.filter(F.col("vec_id") != 0), qv, 10).collect()}
        approx = {
            r["vec_id"]
            for r in ann_topk(
                emb.filter(F.col("vec_id") != 0), qv, 10, bits=4, probe_hamming=2
            ).collect()
        }
        recall = len(exact & approx) / max(1, len(exact))
        return spark.createDataFrame([(recall >= 0.4,)], "recall_ok boolean")

    @register(
        "embedding_ivf_recall",
        "SELECT true AS ivf_recall_ok",
        doc="IVF ANN recall@10 ≥ 0.4 vs brute force (16 spherical-kmeans cells, "
            "nprobe=4 ⇒ scans ~25% of vectors; random vectors are LSH/IVF's "
            "worst case — clustered real corpora do far better)",
        tags=("llm", "capability"),
    )
    def embedding_ivf_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
        emb = fixture_df(spark, sf_dir, "embeddings")
        qv = [float(x) for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]]
        rest = emb.filter(F.col("vec_id") != 0)
        index = IVFIndex(n_cells=16).fit(rest)
        exact = {r["vec_id"] for r in cosine_topk(rest, qv, 10).collect()}
        approx = {r["vec_id"] for r in ivf_topk(rest, index, qv, 10, nprobe=4).collect()}
        recall = len(exact & approx) / max(1, len(exact))
        return spark.createDataFrame([(recall >= 0.4,)], "ivf_recall_ok boolean")

    @register(
        "embedding_pq_recall",
        "SELECT true AS pq_recall_ok",
        doc="product-quantization ANN recall@10 ≥ 0.7 vs brute force "
            "(m=16 subspaces × 64 centroids = 96 bits/vector, 21× "
            "compression of the 64-dim float32 fixture; ADC shortlist of "
            "50 over codes alone, exact cosine re-rank of the shortlist "
            "— measured 1.0 on the fixture; random vectors are the "
            "worst case for quantization)",
        tags=("llm", "capability"),
    )
    def embedding_pq_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
        emb = fixture_df(spark, sf_dir, "embeddings")
        qv = [float(x) for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]]
        rest = emb.filter(F.col("vec_id") != 0)
        index = PQIndex(m=16, k=64).fit(rest)
        encoded = index.encode(rest)
        exact = {r["vec_id"] for r in cosine_topk(rest, qv, 10).collect()}
        approx = {
            r["vec_id"]
            for r in pq_rerank_topk(rest, encoded, index, qv, 10).collect()
        }
        recall = len(exact & approx) / max(1, len(exact))
        return spark.createDataFrame([(recall >= 0.7,)], "pq_recall_ok boolean")

    @register(
        "ivfpq_topk",
        "SELECT true AS ivfpq_recall_ok",
        doc="IVF×PQ composed ANN (FAISS IVFADC; Jégou TPAMI'11 §V) "
            "recall@10 ≥ 0.5 vs brute force: coarse 16-cell IVF routing + "
            "shared-codebook PQ over residuals (m=16 × 64 centroids = "
            "96-bit codes), nprobe=8 cell-pruned ADC shortlist of 50, "
            "exact cosine re-rank — measured 0.9-1.0 on the fixtures; "
            "serving scans only (id, cell, code) columns of probed cell "
            "partitions (plan-asserted in test_similarity_scale.py)",
        tags=("llm", "capability"),
    )
    def ivfpq_topk_entry(spark: SparkSession, sf_dir: str) -> DataFrame:
        emb = fixture_df(spark, sf_dir, "embeddings")
        qv = [float(x) for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]]
        rest = emb.filter(F.col("vec_id") != 0)
        index = IVFPQIndex(n_cells=16, m=16, k=64).fit(rest)
        encoded = index.encode(rest)
        exact = {r["vec_id"] for r in cosine_topk(rest, qv, 10).collect()}
        approx = {
            r["vec_id"]
            for r in ivfpq_rerank_topk(rest, encoded, index, qv, 10,
                                       nprobe=8).collect()
        }
        recall = len(exact & approx) / max(1, len(exact))
        return spark.createDataFrame([(recall >= 0.5,)],
                                     "ivfpq_recall_ok boolean")

    @register(
        "filtered_ann_recall",
        "SELECT true AS filtered_ann_ok",
        doc="FILTERED vector search (ANN under a metadata predicate — the "
            "case real vector stores struggle with): top-10 by cosine "
            "among label=3 vectors only, via PRE-filtering — the "
            "predicate is applied to the cell-assigned serving table "
            "before ranking, against ONE shared IVF index fit on the "
            "full corpus (no per-predicate index). Recall@10 >= 0.4 vs "
            "the exact filtered brute force (measured 0.5-0.6 across "
            "fixtures at nprobe=6; post-filtering — rank first, filter "
            "after — would silently return < k rows on selective "
            "predicates, which is why the pre-filter order matters). "
            "At scale the predicate prunes the same (id, cell, code) "
            "partitions the unfiltered path reads",
        tags=("llm", "capability"),
    )
    def filtered_ann_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
        emb = fixture_df(spark, sf_dir, "embeddings")
        qv = [float(x)
              for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]]
        rest = emb.filter(F.col("vec_id") != 0)
        filt = rest.filter(F.col("label") == 3)  # pre-filter, shared index
        index = IVFIndex(n_cells=16).fit(rest)
        exact = {r["vec_id"] for r in cosine_topk(filt, qv, 10).collect()}
        approx = {r["vec_id"]
                  for r in ivf_topk(filt, index, qv, 10, nprobe=6).collect()}
        recall = len(exact & approx) / max(1, len(exact))
        return spark.createDataFrame([(recall >= 0.4,)],
                                     "filtered_ann_ok boolean")

    @register(
        "embedding_near_dup",
        "SELECT true AS near_dup_ok",
        doc="embedding near-dup structural self-check: the LSH-bucketed pair set "
            "must equal exactly {brute-force pairs ≥ threshold whose endpoints "
            "share an LSH bucket} — verifies bucketing, self-join, and exact "
            "verification against ground truth computed without LSH (threshold "
            "0.4 so the fixture's random vectors yield a non-empty truth set; "
            "bits=8 here so same-bucket truth pairs exist at fixture N, and "
            "max_bucket_size=None so the check isolates bucketing+verification "
            "from the scale guard, whose saturated-bucket behavior is pinned by "
            "test_skew.py::test_embedding_bucket_cap_bounds_saturated_corpus)",
        tags=("llm", "capability"),
    )
    def embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
        threshold = 0.4
        emb = fixture_df(spark, sf_dir, "embeddings")
        lsh_pairs = embedding_near_dup_pairs(
            emb, threshold=threshold, bits=8, max_bucket_size=None
        ).select("id_a", "id_b")
        # ground truth without LSH: brute-force all pairs ≥ threshold, then
        # restrict to same-bucket pairs (what a correct bucketed join returns)
        bucketed = lsh_bucketize(emb).select("vec_id", "embedding", "lsh_bucket")
        a, b = bucketed.alias("a"), bucketed.alias("b")
        sim = cosine(_as_double("a.embedding"), _as_double("b.embedding"))
        brute = (
            a.join(b, F.col("a.vec_id") < F.col("b.vec_id"))
            .select(
                F.col("a.vec_id").alias("id_a"),
                F.col("b.vec_id").alias("id_b"),
                sim.alias("cosine_sim"),
                (F.col("a.lsh_bucket") == F.col("b.lsh_bucket")).alias("same_bucket"),
            )
            .filter(F.col("cosine_sim") >= threshold)
        ).localCheckpoint(eager=True)
        n_truth = brute.count()
        expected = brute.filter("same_bucket").select("id_a", "id_b")
        diff = (
            expected.exceptAll(lsh_pairs).count()
            + lsh_pairs.exceptAll(expected).count()
        )
        ok = bool(n_truth > 0 and diff == 0)
        return spark.createDataFrame([(ok,)], "near_dup_ok boolean")

    @register(
        "semantic_dedup",
        "SELECT true AS semantic_dedup_ok",
        doc="SemDeDup (Abbas et al. arXiv:2303.09540) structural "
            "self-check: k-means-cluster the embeddings, drop within-"
            "cluster cosine>=0.4 lower-id duplicates, then verify three "
            "properties computed independently from the survivor set — "
            "(1) the fixture actually produced drops, (2) no two kept "
            "vectors in the same cell have cosine>=threshold, (3) every "
            "dropped vector has a lower-id cell-mate with "
            "cosine>=threshold (threshold 0.4: the fixture's random "
            "vectors never reach the production 0.9)",
        tags=("llm", "capability"),
    )
    def semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
        threshold = 0.4
        emb = fixture_df(spark, sf_dir, "embeddings")
        marked = semantic_dedup_survivors(
            emb, threshold=threshold, max_cell_size=None
        ).localCheckpoint(eager=True)
        with_vec = marked.join(emb.select("vec_id", "embedding"), "vec_id")
        a, b = with_vec.alias("a"), with_vec.alias("b")
        sim = cosine(_as_double("a.embedding"), _as_double("b.embedding"))
        cell_pairs = a.join(
            b,
            (F.col("a.sem_cell") == F.col("b.sem_cell"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        ).select(
            F.col("a.is_kept").alias("kept_a"),
            F.col("b.is_kept").alias("kept_b"),
            F.col("b.vec_id").alias("id_b"),
            (sim >= threshold).alias("is_dup"),
        ).localCheckpoint(eager=True)
        n_dropped = marked.filter(~F.col("is_kept")).count()
        kept_dup_pairs = cell_pairs.filter(
            F.col("kept_a") & F.col("kept_b") & F.col("is_dup")
        ).count()
        # ids with a lower-id same-cell duplicate — must equal the dropped
        # set exactly (set equality, not just count equality)
        justified = cell_pairs.filter(F.col("is_dup")).select(
            F.col("id_b").alias("vec_id")
        ).distinct()
        dropped_ids = marked.filter(~F.col("is_kept")).select("vec_id")
        set_diff = (
            justified.exceptAll(dropped_ids).count()
            + dropped_ids.exceptAll(justified).count()
        )
        ok = bool(n_dropped > 0 and kept_dup_pairs == 0 and set_diff == 0)
        return spark.createDataFrame([(ok,)], "semantic_dedup_ok boolean")

    @register(
        "embedding_outliers",
        """
        WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
                   FROM embeddings),
        u AS (SELECT vec_id, unnest(v) AS val,
                     unnest(range(1, len(v)+1)) AS pos FROM e),
        c AS (SELECT pos, avg(val) AS cv FROM u GROUP BY pos),
        d AS (SELECT u.vec_id,
                     sqrt(sum((u.val - c.cv)*(u.val - c.cv))) AS dist
              FROM u JOIN c USING (pos) GROUP BY u.vec_id)
        SELECT vec_id, round(dist, 4) AS dist4
        FROM d ORDER BY dist DESC, vec_id LIMIT 10
        """,
        doc="top-10 embedding outliers by Euclidean distance to the "
            "per-dimension corpus centroid (mislabeled/corrupt-vector "
            "screen): centroid via posexplode + dim-cardinality agg, "
            "distance as a codegen zip_with fold against the broadcast "
            "centroid literal, TakeOrderedAndProject reduction; rounded "
            "to 4dp to absorb cross-engine float summation order",
        tags=("llm", "capability"),
    )
    def embedding_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
        emb = fixture_df(spark, sf_dir, "embeddings")
        return centroid_outliers(emb, k=10)

    @register(
        "embedding_quantize_int8",
        """
        WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
                   FROM embeddings WHERE vec_id < 100),
        s AS (SELECT vec_id, v,
                     127.0 / list_aggregate(list_transform(v, x -> abs(x)),
                                            'max') AS sc
              FROM e),
        q AS (SELECT vec_id,
                     list_transform(
                       v, x -> greatest(-127, least(127,
                               CAST(round(x * sc) AS INTEGER)))) AS code
              FROM s)
        SELECT vec_id,
               CAST(list_aggregate(code, 'sum') AS BIGINT) AS q_sum,
               CAST(list_aggregate(code, 'min') AS INTEGER) AS q_min,
               CAST(list_aggregate(code, 'max') AS INTEGER) AS q_max
        FROM q ORDER BY vec_id
        """,
        doc="symmetric per-vector int8 quantization (4x embedding "
            "compression for serving): scale = 127/max|x|, code = "
            "round(x*scale) clamped; entry returns integer code "
            "summaries (sum/min/max per vector) so the oracle compare "
            "is exact integer equality, no float tolerance",
        tags=("llm", "capability"),
    )
    def embedding_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
        emb = fixture_df(spark, sf_dir, "embeddings").filter(
            F.col("vec_id") < 100
        )
        q = quantize_int8(emb)
        codes = F.col("q_codes")
        return q.select(
            "vec_id",
            F.aggregate(codes, F.lit(0).cast("long"),
                        lambda acc, x: acc + x).alias("q_sum"),
            F.array_min(codes).alias("q_min"),
            F.array_max(codes).alias("q_max"),
        ).orderBy("vec_id")

    @register(
        "knn_batch_join",
        """
        WITH q AS (SELECT vec_id AS query_id,
                          CAST(embedding AS DOUBLE[]) AS qv
                   FROM embeddings WHERE vec_id < 5),
        c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS cv
              FROM embeddings WHERE vec_id >= 5),
        s AS (SELECT q.query_id, c.vec_id AS neighbor_id,
                     list_cosine_similarity(cv, qv) AS sim
              FROM q, c),
        r AS (SELECT query_id, neighbor_id, sim,
                     row_number() OVER (
                       PARTITION BY query_id
                       ORDER BY sim DESC, neighbor_id) AS rnk
              FROM s)
        SELECT CAST(query_id AS BIGINT) AS query_id,
               CAST(neighbor_id AS BIGINT) AS neighbor_id,
               CAST(rnk AS BIGINT) AS rnk,
               round(sim, 4) AS sim4
        FROM r WHERE rnk <= 3
        ORDER BY query_id, rnk
        """,
        doc="batched exact k-NN join (retrieval-training shape: top-3 "
            "corpus neighbors for every query in one corpus scan): one "
            "numpy matmul per Arrow batch emits per-query partial top-k, "
            "then one tiny window ranks Q*k*n_batches survivors — the "
            "corpus itself is never shuffled; rounded to 4dp to absorb "
            "cross-engine float summation order",
        tags=("llm",),
    )
    def knn_batch_join(spark: SparkSession, sf_dir: str) -> DataFrame:
        emb = fixture_df(spark, sf_dir, "embeddings")
        res = knn_join(
            emb.filter(F.col("vec_id") < 5),
            emb.filter(F.col("vec_id") >= 5),
            k=3,
        )
        return res.select(
            "query_id", "neighbor_id", "rnk", F.round("sim", 4).alias("sim4")
        ).orderBy("query_id", "rnk")

    @register(
        "mmr_diversified_topk",
        "SELECT true AS mmr_ok, CAST(8 AS BIGINT) AS k",
        doc="maximal marginal relevance selection (Carbonell & Goldstein "
            "1998): diversified top-8 from a DISTRIBUTED cosine top-24 "
            "shortlist (TakeOrdered — one corpus scan, no global sort), "
            "then the inherently-sequential greedy runs on the 24-row "
            "shortlist driver-side — the honest scale architecture for "
            "MMR, whose objective couples every pick to all prior picks. "
            "Self-check: the shortlist's JVM-expression similarities are "
            "re-derived in numpy (1e-9 agreement), the loop-form greedy "
            "must match an independent vectorized-argmax formulation "
            "pick for pick, and the first pick must be the similarity "
            "argmax (lambda=1 degeneracy)",
        tags=("llm", "capability"),
    )
    def mmr_diversified_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
        import numpy as np

        emb = fixture_df(spark, sf_dir, "embeddings")
        qv = [float(x) for x in
              emb.filter(F.col("vec_id") == 0).first()["embedding"]]
        q = F.array(*[F.lit(x) for x in qv])
        short = (
            emb.filter(F.col("vec_id") != 0)
            .select("vec_id", "embedding",
                    cosine(_as_double("embedding"), q).alias("sim"))
            .orderBy(F.col("sim").desc(), "vec_id")
            .limit(24)
            .collect()
        )
        ids = [int(r["vec_id"]) for r in short]
        V = np.array([[float(x) for x in r["embedding"]] for r in short])
        spark_sims = np.array([float(r["sim"]) for r in short])

        qn = np.array(qv) / np.linalg.norm(qv)
        Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
        np_sims = Vn @ qn
        sims_agree = bool(np.max(np.abs(np_sims - spark_sims)) < 1e-9)

        lam, k = 0.7, 8
        pair = Vn @ Vn.T

        def greedy_loop():
            sel: list[int] = []
            cand = list(range(len(ids)))
            while len(sel) < k and cand:
                best = max(
                    cand,
                    key=lambda i: (
                        lam * np_sims[i]
                        - (1 - lam) * max((pair[i][j] for j in sel),
                                          default=0.0),
                        -ids[i],
                    ),
                )
                sel.append(best)
                cand.remove(best)
            return sel

        def greedy_vec():
            sel: list[int] = []
            mask = np.ones(len(ids), dtype=bool)
            while len(sel) < k and mask.any():
                div = (pair[:, sel].max(axis=1) if sel
                       else np.zeros(len(ids)))
                score = np.where(mask, lam * np_sims - (1 - lam) * div,
                                 -np.inf)
                top = score.max()
                # deterministic tie-break: smallest vec_id among maxima
                tied = [i for i in np.flatnonzero(score == top)]
                best = min(tied, key=lambda i: ids[i])
                sel.append(best)
                mask[best] = False
            return sel

        a, b = greedy_loop(), greedy_vec()
        ok = bool(sims_agree and a == b and len(a) == k
                  and a[0] == int(np.argmax(np_sims)))
        return spark.createDataFrame([(ok, k)], "mmr_ok boolean, k long")


def register_norm_audit(register) -> None:
    @register(
        "embedding_norm_audit",
        """
        WITH n AS (
          SELECT label,
                 sqrt(list_sum(list_transform(
                       CAST(embedding AS DOUBLE[]), x -> x * x)))
                   AS nrm,
                 len(embedding) AS dim
          FROM embeddings)
        SELECT label,
               CAST(count(*) AS BIGINT) AS n,
               CAST(min(dim) AS BIGINT) AS min_dim,
               CAST(max(dim) AS BIGINT) AS max_dim,
               round(min(nrm), 4) AS min_norm,
               round(avg(nrm), 4) AS mean_norm,
               round(max(nrm), 4) AS max_norm,
               CAST(count(CASE WHEN nrm < 1e-6 THEN 1 END) AS BIGINT)
                 AS n_degenerate
        FROM n GROUP BY label ORDER BY label
        """,
        doc="Embedding QA gate: per-label L2-norm distribution, "
            "dimension consistency, and degenerate (near-zero) vector "
            "count — the audit run before building any ANN index, "
            "since a zero vector breaks cosine and a dimension mix "
            "breaks everything (write_ivf/write_ivfpq assume this "
            "passed). Norms are sequential per-vector reductions "
            "(F.aggregate == list_sum: same left-fold order, identical "
            "doubles); one grouped aggregate, zero shuffle beyond it; "
            "round-4 on the norm stats absorbs the avg's partial-sum "
            "order.",
        tags=("llm", "capability"),
    )
    def embedding_norm_audit(spark, sf_dir):
        emb = fixture_df(spark, sf_dir, "embeddings")
        nrm = F.sqrt(
            F.aggregate(
                _as_double("embedding"),
                F.lit(0.0),
                lambda acc, x: acc + x * x,
            )
        )
        n = emb.select(
            "label", nrm.alias("nrm"), F.size("embedding").alias("dim")
        )
        return (
            n.groupBy("label")
            .agg(
                F.count("*").cast("bigint").alias("n"),
                F.min("dim").cast("bigint").alias("min_dim"),
                F.max("dim").cast("bigint").alias("max_dim"),
                F.round(F.min("nrm"), 4).alias("min_norm"),
                F.round(F.avg("nrm"), 4).alias("mean_norm"),
                F.round(F.max("nrm"), 4).alias("max_norm"),
                F.count(F.when(F.col("nrm") < 1e-6, 1)).cast("bigint")
                .alias("n_degenerate"),
            )
            .orderBy("label")
        )
