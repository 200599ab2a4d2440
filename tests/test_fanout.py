"""operators/skew.fan_out_narrow_scan: repartition single-split local
scans before compute-bound kernels, identity everywhere else."""

from __future__ import annotations

from pyspark.sql import functions as F

from datagouv_tools_spark.operators.skew import (
    _size_bytes,
    fan_out_narrow_scan,
)


def test_size_parse():
    assert _size_bytes("134217728b") == 134217728
    assert _size_bytes("128m") == 128 << 20
    assert _size_bytes("1g") == 1 << 30
    assert _size_bytes(" 64KB ") == 64 << 10
    assert _size_bytes("42") == 42


def test_single_split_scan_fans_out(spark, tmp_path):
    path = str(tmp_path / "tiny.parquet")
    spark.range(1000).withColumn("v", F.col("id") * 2).coalesce(
        1
    ).write.parquet(path)
    df = spark.read.parquet(path)
    out = fan_out_narrow_scan(df)
    assert (
        out.rdd.getNumPartitions()
        == spark.sparkContext.defaultParallelism
    )
    # rows unchanged (order-insensitive)
    assert sorted(r.id for r in out.collect()) == list(range(1000))


def test_wide_scan_passes_through(spark, tmp_path):
    path = str(tmp_path / "tiny2.parquet")
    spark.range(100).coalesce(1).write.parquet(path)
    df = spark.read.parquet(path)
    old = spark.conf.get("spark.sql.files.maxPartitionBytes")
    # pretend the file spans multiple splits: threshold below its size
    spark.conf.set("spark.sql.files.maxPartitionBytes", "16b")
    try:
        assert fan_out_narrow_scan(df) is df
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", old)


def test_local_relation_passes_through(spark):
    df = spark.createDataFrame([(1,), (2,)], "x int")
    assert fan_out_narrow_scan(df) is df
