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


# ---------------------------------------------------------------------------
# triangle_counts
# ---------------------------------------------------------------------------


def _tri(spark, und_pairs):
    from datagouv_tools_spark.operators.pagerank import triangle_counts

    und = spark.createDataFrame(und_pairs, "u string, v string")
    rows = triangle_counts(und).collect()
    return {r["token"]: (r["degree"], r["tri_cnt"]) for r in rows}


def test_triangle_k4_every_node_in_three(spark):
    """K4 has C(4,3)=4 triangles; each node sits in exactly 3 and has
    degree 3."""
    k4 = [("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"), ("b", "d"), ("c", "d")]
    got = _tri(spark, k4)
    assert got == {x: (3, 3) for x in "abcd"}


def test_triangle_counted_once_not_per_orientation(spark):
    """One triangle plus a pendant edge: the pendant node closes no
    triangle and is absent; corners count the triangle exactly once."""
    g = [("a", "b"), ("b", "c"), ("a", "c"), ("c", "d")]
    got = _tri(spark, g)
    assert got == {"a": (2, 1), "b": (2, 1), "c": (3, 1)}
    assert "d" not in got


def test_triangle_hub_skew_orientation(spark):
    """A hub adjacent to everyone in a 5-cycle: fan/wheel graph. The
    wheel W5 has 5 triangles; hub in all 5, rim nodes in 2 each —
    and the degree orientation must not double count around the hub."""
    rim = ["r0", "r1", "r2", "r3", "r4"]
    g = [(min(a, b), max(a, b)) for a, b in zip(rim, rim[1:] + rim[:1])]
    g += [("h" if "h" < r else r, r if "h" < r else "h") for r in rim]
    got = _tri(spark, g)
    assert got["h"] == (5, 5)
    for r in rim:
        assert got[r] == (3, 2)


# ---------------------------------------------------------------------------
# kcore_peel
# ---------------------------------------------------------------------------


def _kcore(spark, und_pairs, k, rounds):
    from datagouv_tools_spark.operators.pagerank import kcore_peel

    und = spark.createDataFrame(und_pairs, "u string, v string")
    return sorted(
        (r["u"], r["v"]) for r in kcore_peel(und, k, rounds).collect()
    )


def test_kcore_strips_pendant_chain(spark):
    """Triangle with a pendant path: the 2-core is the triangle; the
    path peels off over two rounds (d needs e gone first)."""
    g = [("a", "b"), ("b", "c"), ("a", "c"), ("c", "d"), ("d", "e")]
    tri = [("a", "b"), ("a", "c"), ("b", "c")]
    assert _kcore(spark, g, k=2, rounds=1) == sorted(tri + [("c", "d")])
    assert _kcore(spark, g, k=2, rounds=2) == sorted(tri)
    assert _kcore(spark, g, k=2, rounds=3) == sorted(tri)  # fixpoint


def test_kcore_k3_keeps_k4_drops_triangle(spark):
    """K4 survives the 3-core; a disjoint triangle (degree 2) doesn't."""
    k4 = [("p", "q"), ("p", "r"), ("p", "s"), ("q", "r"), ("q", "s"), ("r", "s")]
    tri = [("x", "y"), ("y", "z"), ("x", "z")]
    assert _kcore(spark, k4 + tri, k=3, rounds=1) == sorted(k4)


# ---------------------------------------------------------------------------
# bfs_hops
# ---------------------------------------------------------------------------


def _bfs(spark, nodes, und_edges, sources, rounds):
    from datagouv_tools_spark.operators.pagerank import bfs_hops

    nd = spark.createDataFrame([(n,) for n in nodes], "token string")
    sym = und_edges + [(b, a) for a, b in und_edges]
    ed = spark.createDataFrame(sym, "src string, dst string")
    src = spark.createDataFrame([(s,) for s in sources], "token string")
    out = bfs_hops(nd, ed, src, rounds)
    return {r["token"]: r["hops"] for r in out.collect()}


def test_bfs_path_graph_exact_hops(spark):
    got = _bfs(spark, list("abcde"), [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e")], ["a"], 3)
    assert got == {"a": 0, "b": 1, "c": 2, "d": 3, "e": None}


def test_bfs_multi_source_takes_nearest(spark):
    got = _bfs(spark, list("abcd"), [("a", "b"), ("b", "c"), ("c", "d")], ["a", "d"], 2)
    assert got == {"a": 0, "b": 1, "c": 1, "d": 0}


def test_bfs_disconnected_stays_null(spark):
    got = _bfs(spark, ["x", "y", "z"], [("x", "y")], ["x"], 3)
    assert got == {"x": 0, "y": 1, "z": None}
