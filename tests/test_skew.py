"""Salted joins / two-phase aggregation equal their unsalted plans."""

from pyspark.sql import functions as F

from miniodb_spark.skew import salted_join, two_phase_agg


def test_salted_join_matches_plain(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        F.col("l_suppkey").alias("k"), "l_quantity"
    )
    supp = spark.read.parquet(f"{sf_dir}/supplier.parquet").select(
        F.col("s_suppkey").alias("k"), "s_name"
    )
    plain = li.join(supp, "k").agg(
        F.count("*").alias("n"), F.sum("l_quantity").alias("q")
    ).first()
    salted = salted_join(li, supp, on="k", salts=4).agg(
        F.count("*").alias("n"), F.sum("l_quantity").alias("q")
    ).first()
    assert (salted["n"], round(salted["q"], 6)) == (plain["n"], round(plain["q"], 6))


def test_salted_left_join_keeps_unmatched(spark):
    big = spark.createDataFrame([(1, "a"), (2, "b"), (99, "c")], "k int, v string")
    small = spark.createDataFrame([(1, "x")], "k int, w string")
    out = salted_join(big, small, on="k", how="left", salts=4).collect()
    assert len(out) == 3
    assert {r["k"]: r["w"] for r in out} == {1: "x", 2: None, 99: None}


def test_embedding_bucket_cap_bounds_saturated_corpus(spark):
    """Pathological skew for the embedding near-dup guard: hundreds of
    identical vectors collapse onto one LSH bucket — max_bucket_size
    must drop that bucket so the verify self-join stays bounded, while
    a genuine near-pair in an untouched small bucket still survives."""
    from miniodb_spark.operators.similarity import embedding_near_dup_pairs

    sat = [(i, [1.0, 0.0, 0.0, 0.0]) for i in range(300)]  # one bucket
    # a genuine near-pair along a different direction (cosine ≈ 0.9995);
    # both land in the same non-saturated bucket, far from the spike
    good = [(1000, [0.0, 1.0, 0.03, 0.0]), (1001, [0.0, 1.0, 0.0, 0.03])]
    emb = spark.createDataFrame(
        sat + good, "vec_id long, embedding array<double>"
    )
    capped = embedding_near_dup_pairs(emb, threshold=0.95, bits=8,
                                      max_bucket_size=50)
    got = {(r["id_a"], r["id_b"]) for r in capped.collect()}
    # the saturated bucket is dropped entirely; the small pair survives
    assert got == {(1000, 1001)}
    # without the guard the identical vectors explode into ~300²/2 pairs
    uncapped = embedding_near_dup_pairs(emb, threshold=0.95, bits=8,
                                        max_bucket_size=None).limit(10)
    assert uncapped.count() == 10


def test_two_phase_agg_matches_plain(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    plain = {
        r["user_id"]: (r["n"], round(r["total"], 6))
        for r in ev.groupBy("user_id")
        .agg(F.count("*").alias("n"), F.sum("value").alias("total"))
        .collect()
    }
    salted = {
        r["user_id"]: (r["n"], round(r["total"], 6))
        for r in two_phase_agg(ev, "user_id", "value").collect()
    }
    assert salted == plain
