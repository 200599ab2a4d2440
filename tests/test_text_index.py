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
