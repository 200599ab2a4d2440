"""Unit tests for fixed-point PageRank (operators/pagerank.py)."""

from __future__ import annotations

from datagouv_tools_spark.operators.pagerank import (
    SCALE,
    pagerank_fixed_point,
)


def _ranks(spark, nodes, edges, iters):
    ndf = spark.createDataFrame([(n,) for n in nodes], "token string")
    edf = spark.createDataFrame(edges, "src string, dst string, w long")
    out = pagerank_fixed_point(ndf, edf, iters).collect()
    return {r.token: r.pr for r in out}


def test_path_graph_center_wins(spark):
    """a—b—c (undirected): the center accumulates both endpoints'
    mass and must outrank them; endpoints tie by symmetry."""
    edges = [
        ("a", "b", 1), ("b", "a", 1),
        ("b", "c", 1), ("c", "b", 1),
    ]
    pr = _ranks(spark, ["a", "b", "c"], edges, iters=3)
    assert pr["b"] > pr["a"] == pr["c"]


def test_mass_is_bounded_and_floor_loss_small(spark):
    """Total fixed-point mass stays within floor-loss of SCALE: never
    above, and the per-step loss is bounded by (#edges + #nodes) units."""
    edges = [
        ("a", "b", 2), ("b", "a", 2),
        ("b", "c", 1), ("c", "b", 1),
        ("c", "a", 3), ("a", "c", 3),
    ]
    pr = _ranks(spark, ["a", "b", "c"], edges, iters=4)
    total = sum(pr.values())
    assert total <= SCALE
    assert total >= SCALE - 4 * (6 + 3) * 100  # generous floor-loss bound


def test_isolated_node_keeps_teleport_only(spark):
    """A node with no edges receives exactly the teleport share."""
    edges = [("a", "b", 1), ("b", "a", 1)]
    pr = _ranks(spark, ["a", "b", "z"], edges, iters=2)
    assert pr["z"] == 150_000_000 // 3
    assert pr["a"] == pr["b"] > pr["z"]
