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
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


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


def embedding_near_dup_pairs(
    df: DataFrame,
    threshold: float = 0.95,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    bits: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Near-duplicate vector pairs: LSH-bucket self-join + exact cosine
    verification (bucket join bounds the quadratic blowup)."""
    bucketed = lsh_bucketize(df, vec_col, bits, seed).select(
        id_col, vec_col, "lsh_bucket"
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


# ---------------------------------------------------------------------------
# registry entries
# ---------------------------------------------------------------------------


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
        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        qv = emb.filter(F.col("vec_id") == 0).first()["embedding"]
        q = F.array(*[F.lit(float(x)) for x in qv])
        sim = cosine(_as_double("embedding"), q)
        return (
            emb.filter(F.col("vec_id") != 0)
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
        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
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
        "embedding_near_dup",
        None,  # LSH candidate generation isn't SQL-expressible; exact verify inside
        doc="embedding near-duplicate pairs (cosine ≥ 0.95 within LSH buckets)",
        tags=("llm", "capability"),
    )
    def embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        pairs = embedding_near_dup_pairs(emb, threshold=0.95)
        return pairs.select(
            "id_a", "id_b", F.round("cosine_sim", 4).alias("sim4")
        ).orderBy("id_a", "id_b")
