"""Bloom pre-filtering (functions/bloom.py): zero false negatives (the
exactness contract), measured false-positive rate within theory, and
the actual map-side drop on the query's own data."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from datagouv_tools_spark.functions.bloom import (
    bloom_build,
    bloom_contains,
    bloom_prefilter_join,
)


def test_no_false_negatives_and_fp_rate(spark):
    """Every inserted key passes; non-member pass rate stays within 3×
    the analytic (1-e^(-kn/m))^k bound (slack for hash clustering)."""
    keys = spark.createDataFrame([(i,) for i in range(0, 2000)], "k bigint")
    words = bloom_build(keys, "k", m_bits=1 << 14, k=4)
    n, m, k = 2000, 1 << 14, 4
    fp_theory = (1 - math.exp(-k * n / m)) ** k

    probe = spark.createDataFrame([(i,) for i in range(0, 20000)], "k bigint")
    hits = probe.filter(bloom_contains(words, F.col("k"))).count()
    members = 2000
    fp_observed = (hits - members) / 18000
    assert hits >= members, "false negative: an inserted key failed the filter"
    assert fp_observed <= 3 * fp_theory + 0.01, (fp_observed, fp_theory)


def test_prefilter_join_equals_plain_join(spark):
    probe = spark.createDataFrame(
        [(i, i % 7) for i in range(1000)], "k bigint, v int"
    )
    build = spark.createDataFrame([(i,) for i in range(0, 1000, 50)], "k bigint")
    got = sorted(
        (r.k, r.v)
        for r in bloom_prefilter_join(probe, build, "k").collect()
    )
    want = sorted(
        (r.k, r.v) for r in probe.join(build, "k", "left_semi").collect()
    )
    assert got == want


def test_map_side_drop_measured(spark, sf_dir):
    """The scale claim, measured on the query's own data: the bloom
    filter alone (before any join) discards the overwhelming share of
    probe rows for a selective build side."""
    li = spark.read.parquet(sf_dir + "/lineitem.parquet").select("l_orderkey")
    orders = spark.read.parquet(sf_dir + "/orders.parquet")
    big = orders.filter(F.col("o_totalprice") > 480000).select("o_orderkey")
    sel = big.count() / orders.count()
    words = bloom_build(big, "o_orderkey", m_bits=1 << 16, k=4)
    total = li.count()
    kept = li.filter(bloom_contains(words, F.col("l_orderkey"))).count()
    # kept fraction ≈ build selectivity + FP rate — far below half
    assert kept / total <= sel + 0.05, (kept, total, sel)


def test_md5_mode_is_deterministic_and_correct(spark):
    """md5 hash mode: identical words across builds and partitionings
    (the cross-engine reproducibility mode), and no false negatives."""
    keys = spark.createDataFrame([(i,) for i in range(100)], "k bigint")
    b1 = bloom_build(keys, "k", m_bits=4096, hash_mode="md5")
    b2 = bloom_build(keys.repartition(7), "k", m_bits=4096, hash_mode="md5")
    assert b1 == b2 and len(b1) == 64
    hits = keys.filter(
        bloom_contains(b1, F.col("k"), hash_mode="md5")
    ).count()
    assert hits == 100


def test_build_validates_word_size(spark):
    import pytest

    keys = spark.createDataFrame([(1,)], "k bigint")
    with pytest.raises(ValueError):
        bloom_build(keys, "k", m_bits=100)
    words = bloom_build(keys, "k", m_bits=128)
    with pytest.raises(ValueError):
        bloom_contains(words, F.col("k"), m_bits=256)
