"""Persisted text MinHash band index (operators/text_index): stored
entries must serve candidate generation with NO recomputation and be
bit-faithful to the recompute-per-query operators."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datagouv_tools_spark.operators import text_index as ti
from datagouv_tools_spark.operators.dedup import (
    minhash_cluster_edges,
    minhash_pairs,
)
from datagouv_tools_spark.sources.catalog import load_table


@pytest.fixture(scope="module")
def index(spark, sf_dir, tmp_path_factory):
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    path = str(tmp_path_factory.mktemp("textidx") / "idx")
    return ti.text_index_build(docs, path), docs


def test_stored_pairs_match_live_kernel(spark, index):
    idx, docs = index
    want = sorted(
        map(
            tuple,
            minhash_pairs(
                docs, "text", "doc_id", k=64, bands=16,
                token_hash="md5", band_key="values",
            ).collect(),
        )
    )
    got = sorted(map(tuple, idx.candidate_pairs().collect()))
    assert got == want and want


def test_stored_star_edges_match_live_kernel(spark, index):
    idx, docs = index
    want = sorted(
        map(
            tuple,
            minhash_cluster_edges(
                docs, "text", "doc_id", k=64, bands=16,
                token_hash="md5", band_key="values",
            ).collect(),
        )
    )
    got = sorted(map(tuple, idx.star_edges().collect()))
    assert got == want and want


def test_open_and_search_never_resignature(spark, index, monkeypatch):
    """After open, candidate generation must touch ONLY the store —
    stub the signature builder to raise and search anyway."""
    idx, _docs = index

    def boom(*a, **k):
        raise AssertionError("signature recomputation in the search path")

    monkeypatch.setattr(ti, "_band_entries", boom)
    reopened = ti.text_index_open(spark, idx.path)
    assert reopened.candidate_pairs().count() > 0
    assert reopened.star_edges().count() > 0


def test_append_equals_build_over_union(spark, sf_dir, tmp_path):
    """Nothing is trained, so an appended index must be EXACTLY a
    fresh build over the union — and the redelivery anti-join must
    make a full replay a no-op."""
    docs = load_table(spark, sf_dir, "documents")
    first = docs.filter(F.col("doc_id") < 60)
    more = docs.filter((F.col("doc_id") >= 60) & (F.col("doc_id") < 100))

    grown_path = str(tmp_path / "grown")
    idx = ti.text_index_build(first, grown_path)
    ti.text_index_append(idx, more)

    union_path = str(tmp_path / "union")
    union_idx = ti.text_index_build(
        docs.filter(F.col("doc_id") < 100), union_path
    )
    assert sorted(map(tuple, idx.candidate_pairs().collect())) == sorted(
        map(tuple, union_idx.candidate_pairs().collect())
    )

    before = idx.entries().count()
    ti.text_index_append(idx, more, anti_join_existing=True)  # replay
    assert idx.entries().count() == before


def test_streaming_text_index_ingest_with_replay_and_crash_heal(
    spark, sf_dir, tmp_path
):
    """Continuous text-index maintenance: a 2-file stream grows the
    index to exactly the build-over-union state; a full checkpoint
    replay appends nothing (ledger); a simulated crash window (data
    appended, ledger row lost) heals via the membership anti-join."""
    import shutil

    from datagouv_tools_spark.operators.text_index import (
        stream_text_index_append,
        text_index_append,
        text_index_build,
    )

    docs = load_table(spark, sf_dir, "documents")
    base = docs.filter(F.col("doc_id") < 40)
    idx = ti.text_index_build(base, str(tmp_path / "idx"))

    src = tmp_path / "src"
    src.mkdir()
    docs.filter((F.col("doc_id") >= 40) & (F.col("doc_id") < 70)).select(
        "doc_id", "text"
    ).coalesce(1).write.parquet(str(src / "f1"))
    docs.filter((F.col("doc_id") >= 70) & (F.col("doc_id") < 100)).select(
        "doc_id", "text"
    ).coalesce(1).write.parquet(str(src / "f2"))

    def start(ckpt):
        stream = (
            spark.readStream.schema("doc_id bigint, text string")
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src / "*"))
        )
        return stream_text_index_append(stream, idx, ckpt)

    ckpt = str(tmp_path / "ckpt")
    start(ckpt).awaitTermination(120)

    union_idx = text_index_build(
        docs.filter(F.col("doc_id") < 100), str(tmp_path / "union")
    )
    assert sorted(map(tuple, idx.entries().collect())) == sorted(
        map(tuple, union_idx.entries().collect())
    )

    # full replay from a FRESH checkpoint (new run key): the ledger
    # doesn't apply, but the membership heal makes it a no-op
    before = idx.entries().count()
    start(str(tmp_path / "ckpt2")).awaitTermination(120)
    assert idx.entries().count() == before

    # crash window: data landed, ledger row lost → redelivery heals
    shutil.rmtree(f"{idx.path}/applied_batches")
    start(str(tmp_path / "ckpt3")).awaitTermination(120)
    assert idx.entries().count() == before


def test_compact_shrinks_files_keeps_rows(spark, sf_dir, tmp_path):
    import glob

    from datagouv_tools_spark.operators.text_index import (
        text_index_append,
        text_index_build,
        text_index_compact,
    )

    docs = load_table(spark, sf_dir, "documents")
    idx = ti.text_index_build(
        docs.filter(F.col("doc_id") < 30), str(tmp_path / "idx")
    )
    for lo in (30, 60):
        text_index_append(
            idx,
            docs.filter((F.col("doc_id") >= lo) & (F.col("doc_id") < lo + 30)),
        )
    before_rows = sorted(map(tuple, idx.entries().collect()))
    n_files = lambda: len(  # noqa: E731
        glob.glob(f"{idx.path}/bands/band_idx=*/*.parquet")
    )
    files_before = n_files()
    text_index_compact(idx)
    assert n_files() < files_before
    assert sorted(map(tuple, idx.entries().collect())) == before_rows
