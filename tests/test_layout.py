"""Z-order layout: the Morton-clustered write must make parquet footer
stats selective on BOTH participating columns, where a single-column
sort is selective on one and useless on the other."""

from pyspark.sql import functions as F

from miniodb_spark.layout import (
    file_clustering_report,
    morton_interleave,
    zorder_value,
    zorder_write,
)


def test_morton_interleave_known_bits(spark):
    # x=0b11, y=0b01 with 2 bits -> z bits (y1 x1 y0 x0) = 0b0111 = 7
    df = spark.range(1).select(
        morton_interleave([F.lit(3).cast("long"), F.lit(1).cast("long")],
                          2).alias("z"))
    assert df.first()["z"] == 0b0111
    # x=0b10, y=0b11 -> bits y1 x1 y0 x0 = 1 1 1 0 = 0b1110 = 14
    df = spark.range(1).select(
        morton_interleave([F.lit(2).cast("long"), F.lit(3).cast("long")],
                          2).alias("z"))
    assert df.first()["z"] == 0b1110


def test_zorder_value_locality(spark):
    """Nearby points in 2-D must land in nearby Z-ranges: the average
    |z(a)-z(b)| for neighboring cells is far below random pairs'."""
    df = spark.range(0, 1024).select(
        (F.col("id") % 32).alias("x"), (F.col("id") / 32).cast("long").alias("y"))
    z = zorder_value(df, ["x", "y"], bits=5)
    rows = {(r["x"], r["y"]): r["_zorder"] for r in z.collect()}
    assert len(set(rows.values())) == 1024  # bijective on the full grid
    # Morton locality: moving one cell in x flips low-order bits only
    assert abs(rows[(3, 7)] - rows[(4, 7)]) < abs(rows[(3, 7)] - rows[(31, 0)])


def test_zorder_write_clusters_both_columns(spark, sf_dir, tmp_path):
    """events sorted by ts alone: per-file user_id ranges span ~the
    whole domain (no pruning). Z-ordered by (user_id, ts): BOTH columns'
    per-file widths shrink well below 1.0."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "user_id",
        F.unix_micros(F.col("ts").cast("timestamp")).cast("double")
        .alias("ts_d"))

    linear = str(tmp_path / "linear")
    (ev.repartitionByRange(8, "ts_d").sortWithinPartitions("ts_d")
       .write.mode("overwrite").parquet(linear))
    zpath = str(tmp_path / "zorder")
    # 16 Z-ranges split each of the 2 dimensions ~sqrt(16)=4 ways
    zorder_write(ev, zpath, ["user_id", "ts_d"], bits=10, num_files=16)

    lin = file_clustering_report(linear, ["user_id", "ts_d"])
    zed = file_clustering_report(zpath, ["user_id", "ts_d"])
    # the linear layout clusters ts but NOT user_id
    assert lin["ts_d"] < 0.35, lin
    assert lin["user_id"] > 0.8, lin
    # z-order clusters BOTH: each per-file width well under half the
    # domain, so footer min/max prunes on either filter column
    assert zed["user_id"] < 0.55 * lin["user_id"], (lin, zed)
    assert zed["ts_d"] < 0.55, (lin, zed)
    # row count survives the rewrite
    assert spark.read.parquet(zpath).count() == ev.count()


def test_zorder_validation(spark):
    import pytest

    df = spark.range(10).select(F.col("id").alias("a"),
                                (F.col("id") * 2).alias("b"))
    with pytest.raises(ValueError, match="at least one"):
        zorder_value(df, [])
    with pytest.raises(ValueError, match="overflows"):
        zorder_value(df, ["a", "b"], bits=32)
    # constant column degrades gracefully (cell 0 everywhere)
    const = df.withColumn("c", F.lit(5))
    out = zorder_value(const, ["a", "c"], bits=8)
    assert out.select("_zorder").distinct().count() == 10
