"""Scale-path proof for ANN serving: the bucketed embedding table is
written partitioned by lsh_bucket, and probes prune to the probed
partitions instead of scanning the corpus."""

from pyspark.sql import functions as F

from miniodb_spark import plans
from miniodb_spark.operators.similarity import (
    cosine_topk,
    probe_bucketed,
    write_bucketed,
)


def test_probe_is_partition_pruned(spark, sf_dir, tmp_path):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    path = str(tmp_path / "emb_bucketed")
    write_bucketed(emb, path, bits=4)

    qv = [float(x) for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]]
    probed = probe_bucketed(spark, path, qv, k=10, bits=4, probe_hamming=2)

    # the bucket predicate must be a PARTITION filter (directory pruning),
    # not a post-scan row filter
    pf = " ".join(plans.partition_filters(probed))
    assert "lsh_bucket" in pf, plans.formatted_plan(probed)
    # and it must actually return sane neighbors: recall vs brute force
    exact = {r["vec_id"] for r in cosine_topk(emb.filter(F.col("vec_id") != 0),
                                              qv, 10).collect()}
    got = {r["vec_id"] for r in probed.filter(F.col("vec_id") != 0).collect()}
    assert len(exact & got) / 10 >= 0.4  # random vectors: LSH worst case


def test_bucketed_layout_round_trips(spark, sf_dir, tmp_path):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    path = str(tmp_path / "emb_bucketed2")
    write_bucketed(emb, path, bits=4)
    back = spark.read.parquet(path)
    assert back.count() == emb.count()
    assert back.select("lsh_bucket").distinct().count() <= 16


def test_ivf_probe_is_partition_pruned(spark, sf_dir, tmp_path):
    from miniodb_spark.operators.similarity import IVFIndex, probe_ivf, write_ivf

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    rest = emb.filter(F.col("vec_id") != 0)
    index = IVFIndex(n_cells=16).fit(rest)
    path = str(tmp_path / "emb_ivf")
    write_ivf(rest, index, path)

    qv = [float(x) for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]]
    probed = probe_ivf(spark, path, index, qv, k=10, nprobe=4)
    pf = " ".join(plans.partition_filters(probed))
    assert "ivf_cell" in pf, plans.formatted_plan(probed)
    exact = {r["vec_id"] for r in cosine_topk(rest, qv, 10).collect()}
    got = {r["vec_id"] for r in probed.collect()}
    assert len(exact & got) / 10 >= 0.4


def test_ivf_index_save_load_identical_assignments(spark, sf_dir, tmp_path):
    from miniodb_spark.operators.similarity import IVFIndex

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    idx = IVFIndex(n_cells=8).fit(emb)
    p = str(tmp_path / "ivf.json")
    idx.save(p)
    idx2 = IVFIndex.load(p)
    a = idx.assign_cells(emb).select("vec_id", "ivf_cell")
    b = idx2.assign_cells(emb).select("vec_id", "ivf_cell")
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
    assert idx.query_cells([0.1] * 64, nprobe=3) == idx2.query_cells([0.1] * 64, nprobe=3)


def test_pq_codes_compress_and_rank(spark, sf_dir):
    """PQ: codes are m small ints (the compression claim), encoding is
    deterministic, and ADC ranking over codes alone correlates with
    exact cosine (top-1 exact neighbor lands in a small ADC shortlist)."""
    from pyspark.sql import functions as F

    from miniodb_spark.operators.similarity import (
        PQIndex, cosine_topk, pq_rerank_topk, pq_topk,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qv = [float(x) for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]]
    rest = emb.filter(F.col("vec_id") != 0)
    idx = PQIndex(m=16, k=64).fit(rest)
    enc = idx.encode(rest)

    row = enc.select("pq_code").first()
    assert len(row["pq_code"]) == 16
    assert all(0 <= c < 64 for c in row["pq_code"])
    # deterministic encoding: two runs produce identical codes
    a = {r["vec_id"]: r["pq_code"] for r in enc.select("vec_id", "pq_code").collect()}
    b = {r["vec_id"]: r["pq_code"]
         for r in idx.encode(rest).select("vec_id", "pq_code").collect()}
    assert a == b

    exact_top1 = cosine_topk(rest, qv, 1).first()["vec_id"]
    shortlist = {r["vec_id"] for r in pq_topk(enc, idx, qv, 50).collect()}
    assert exact_top1 in shortlist
    # rerank returns exact order within the shortlist
    rr = [r["vec_id"] for r in pq_rerank_topk(rest, enc, idx, qv, 5).collect()]
    assert rr[0] == exact_top1


def test_ivfpq_probe_scans_codes_only(spark, sf_dir, tmp_path):
    """The IVFPQ serving probe must (a) prune to the probed cell
    partitions and (b) read ONLY the (id, code) columns — the float
    embedding column never exists in the serving copy, and the scan
    schema proves nothing wide sneaks back in."""
    from miniodb_spark.operators.similarity import (
        IVFPQIndex, cosine_topk, probe_ivfpq, write_ivfpq,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    rest = emb.filter(F.col("vec_id") != 0)
    index = IVFPQIndex(n_cells=16, m=16, k=64).fit(rest)
    path = str(tmp_path / "emb_ivfpq")
    write_ivfpq(rest, index, path)

    qv = [float(x) for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]]
    probed = probe_ivfpq(spark, path, index, qv, k=10, nprobe=8)

    pf = " ".join(plans.partition_filters(probed))
    assert "ivf_cell" in pf, plans.formatted_plan(probed)
    cols = plans.scan_columns(probed)
    assert "embedding" not in cols, cols
    assert cols <= {"vec_id", "pq_code", "ivf_cell"}, cols
    # ADC-only shortlist still finds most exact neighbors at nprobe=8
    exact = {r["vec_id"] for r in cosine_topk(rest, qv, 10).collect()}
    got = {r["vec_id"] for r in probed.collect()}
    assert len(exact & got) / 10 >= 0.4


def test_ivfpq_residual_encoding_and_save_load(spark, sf_dir, tmp_path):
    from miniodb_spark.operators.similarity import IVFPQIndex

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    idx = IVFPQIndex(n_cells=8, m=8, k=16).fit(emb)
    enc = idx.encode(emb)
    row = enc.select("ivf_cell", "pq_code").first()
    assert 0 <= row["ivf_cell"] < 8
    assert len(row["pq_code"]) == 8 and all(0 <= c < 16 for c in row["pq_code"])
    # save/load reproduces identical cells AND codes
    p = str(tmp_path / "ivfpq.json")
    idx.save(p)
    idx2 = IVFPQIndex.load(p)
    a = {r["vec_id"]: (r["ivf_cell"], tuple(r["pq_code"]))
         for r in enc.select("vec_id", "ivf_cell", "pq_code").collect()}
    b = {r["vec_id"]: (r["ivf_cell"], tuple(r["pq_code"]))
         for r in idx2.encode(emb).select("vec_id", "ivf_cell", "pq_code").collect()}
    assert a == b


def test_semantic_dedup_crafted_clusters(spark):
    """SemDeDup on a crafted corpus: two tight clusters plus an
    orthogonal singleton. Within each tight cluster only the min-id
    vector survives; the singleton always survives."""
    import numpy as np

    from miniodb_spark.operators.similarity import semantic_dedup_survivors

    rng = np.random.RandomState(7)
    base_a = rng.randn(8)
    base_b = rng.randn(8)
    rows = []
    # ids 0-2: jittered copies of base_a (cosine ~1); ids 10-11: base_b
    for i in range(3):
        rows.append((i, (base_a + 0.001 * rng.randn(8)).tolist()))
    for i in (10, 11):
        rows.append((i, (base_b + 0.001 * rng.randn(8)).tolist()))
    rows.append((20, np.eye(8)[0].tolist()))  # singleton
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    marked = semantic_dedup_survivors(df, threshold=0.95, n_cells=3)
    got = {r["vec_id"]: r["is_kept"] for r in marked.collect()}
    assert got[0] is True and got[1] is False and got[2] is False
    assert got[10] is True and got[11] is False
    assert got[20] is True


def test_semantic_dedup_cell_cap_keeps_saturated_cells(spark):
    """A degenerate cell larger than max_cell_size is never self-joined:
    its rows pass through kept — the scale guard trades recall for a
    bounded join, identical to the near-dup bucket cap."""
    import numpy as np

    from miniodb_spark.operators.similarity import semantic_dedup_survivors

    base = np.ones(8)
    rows = [(i, base.tolist()) for i in range(50)]  # exact ties -> one cell
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    marked = semantic_dedup_survivors(df, threshold=0.9, n_cells=2,
                                      max_cell_size=10)
    kept = marked.filter("is_kept").count()
    assert kept == 50  # every cell saturated -> nothing joined, all kept


def test_centroid_outliers_match_numpy(spark, sf_dir):
    """Distance-to-centroid scores and ranking match a numpy recompute."""
    import numpy as np

    from miniodb_spark.operators.similarity import centroid_outliers

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    rows = emb.select("vec_id", "embedding").collect()
    x = np.array([r["embedding"] for r in rows], dtype=np.float64)
    ids = np.array([r["vec_id"] for r in rows])
    d = np.sqrt(((x - x.mean(axis=0)) ** 2).sum(axis=1))
    order = np.lexsort((ids, -d))[:10]
    expected = [(int(ids[i]), round(float(d[i]), 4)) for i in order]

    got = [(r["vec_id"], r["dist4"]) for r in centroid_outliers(emb, 10).collect()]
    assert got == expected


def test_centroid_outlier_scoring_is_scan_plus_topk(spark, sf_dir):
    """Once the centroid literal is known, scoring shuffles nothing:
    the plan is a narrow scan + TakeOrderedAndProject."""
    from miniodb_spark.operators.similarity import (
        centroid_outliers,
        corpus_centroid,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cent = corpus_centroid(emb)
    plan = (
        centroid_outliers(emb, 10, centroid=cent)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "TakeOrderedAndProject" in plan
    assert "Exchange" not in plan


def test_quantize_int8_roundtrip_error_bounded(spark, sf_dir):
    """Dequantized vectors sit within half a quantization step of the
    original in every dimension, codes span the int8 range, and
    quantization adds no shuffle (pure projection)."""
    import numpy as np

    from miniodb_spark.operators.similarity import quantize_int8

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").limit(50)
    q = quantize_int8(emb)
    assert "Exchange" not in q._jdf.queryExecution().executedPlan().toString()

    joined = q.join(emb.select("vec_id", "embedding"), "vec_id").collect()
    assert joined
    for r in joined:
        x = np.array(r["embedding"], dtype=np.float64)
        codes = np.array(r["q_codes"], dtype=np.float64)
        assert codes.min() >= -127 and codes.max() <= 127
        deq = codes / r["q_scale"]
        step = 1.0 / r["q_scale"]
        assert np.abs(deq - x).max() <= 0.5 * step + 1e-9
