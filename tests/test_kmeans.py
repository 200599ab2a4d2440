"""Unit tests for fixed-point Lloyd k-means (operators/kmeans.py)."""

from __future__ import annotations

import numpy as np

from datagouv_tools_spark.operators.kmeans import kmeans_fixed_point


def _blob_frame(spark, rng, centers, n_per, spread=0.01):
    rows = []
    vid = 0
    for c in centers:
        for _ in range(n_per):
            v = rng.normal(0, spread, size=len(c)) + np.array(c)
            rows.append((vid, [float(x) for x in v.clip(-0.52, 0.52)]))
            vid += 1
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_recovers_planted_blobs(spark):
    """Three well-separated blobs, k=3: after two rounds each cluster
    holds exactly one blob (sizes 40/40/40) and inertia is tiny
    relative to the blob separation."""
    rng = np.random.default_rng(11)
    emb = _blob_frame(
        spark,
        rng,
        centers=[(0.4, 0.4, 0.0, 0.0), (-0.4, 0.3, 0.0, 0.0), (0.0, -0.45, 0.1, 0.0)],
        n_per=40,
    )
    centroids, final = kmeans_fixed_point(emb, k=3, iters=2, dim=4)
    sizes = sorted(
        r.n for r in final.groupBy("cid").count().withColumnRenamed("count", "n").collect()
    )
    assert sizes == [40, 40, 40]
    # every within-cluster distance is far below the inter-blob gap
    max_dist = final.agg({"dist": "max"}).collect()[0][0]
    assert max_dist < (0.2 * 1000) ** 2


def test_deterministic_across_runs(spark):
    """Same input twice → identical centroids and assignment (no RNG,
    no order-dependence)."""
    rng = np.random.default_rng(5)
    emb = _blob_frame(
        spark, rng, centers=[(0.3, -0.2), (-0.25, 0.35)], n_per=25
    )
    c1, f1 = kmeans_fixed_point(emb, k=2, iters=2, dim=2)
    c2, f2 = kmeans_fixed_point(emb, k=2, iters=2, dim=2)
    assert sorted((r.cid, tuple(r.c)) for r in c1.collect()) == sorted(
        (r.cid, tuple(r.c)) for r in c2.collect()
    )
    assert sorted(map(tuple, f1.collect())) == sorted(map(tuple, f2.collect()))
