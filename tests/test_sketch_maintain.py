"""Streaming CMS maintenance (streaming/sketch_maintain.py): the store
after any batch prefix equals the batch-computed sketch of the union,
replays are no-ops (the in-state tag is load-bearing: CMS add has no
ids to heal with), and estimates never undercount."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from datagouv_tools_spark.operators.sketches import cms_cells
from datagouv_tools_spark.streaming.sketch_maintain import (
    cms_estimate,
    cms_maintain_batch,
    foreach_batch_cms_maintainer,
    read_cms,
)

B0 = ["the", "cat", "the", "mat", "sat"]
B1 = ["the", "dog", "sat", "sat"]


def _toks(spark, words):
    return spark.createDataFrame([(w,) for w in words], "tok string")


def _cells(spark, path):
    return sorted(
        (r["i"], r["idx"], r["c"]) for r in read_cms(spark, path).collect()
    )


def test_two_batches_equal_batch_sketch_and_replay_noop(spark, tmp_path):
    path = str(tmp_path / "cms")
    cms_maintain_batch(_toks(spark, B0), path, "r", 0, width=64)
    cms_maintain_batch(_toks(spark, B1), path, "r", 1, width=64)
    want = sorted(
        (r["i"], r["idx"], r["c"])
        for r in cms_cells(_toks(spark, B0 + B1), width=64).collect()
    )
    got = _cells(spark, path)
    assert got == want

    # redelivery of batch 1: tag says applied → no double-add
    cms_maintain_batch(_toks(spark, B1), path, "r", 1, width=64)
    assert _cells(spark, path) == want
    # out-of-order replay of batch 0: tag is newer → no-op
    cms_maintain_batch(_toks(spark, B0), path, "r", 0, width=64)
    assert _cells(spark, path) == want


def test_estimates_never_undercount(spark, tmp_path):
    path = str(tmp_path / "cms")
    cms_maintain_batch(_toks(spark, B0), path, "r", 0, width=64)
    cms_maintain_batch(_toks(spark, B1), path, "r", 1, width=64)
    exact = Counter(B0 + B1)
    est = cms_estimate(spark, path, list(exact) + ["absent"])
    for w, n in exact.items():
        assert est[w] >= n, (w, est[w], n)
    # an absent token can only collide upward, never negative
    assert est["absent"] >= 0


def test_streaming_end_to_end(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    path = str(tmp_path / "cms")
    ckpt = str(tmp_path / "ckpt")
    _toks(spark, B0).coalesce(1).write.parquet(str(src / "f1"))
    _toks(spark, B1).coalesce(1).write.parquet(str(src / "f2"))
    stream = (
        spark.readStream.schema("tok string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "*"))
    )
    q = (
        stream.writeStream.foreachBatch(
            foreach_batch_cms_maintainer(path, ckpt, width=64)
        )
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    want = sorted(
        (r["i"], r["idx"], r["c"])
        for r in cms_cells(_toks(spark, B0 + B1), width=64).collect()
    )
    assert _cells(spark, path) == want
