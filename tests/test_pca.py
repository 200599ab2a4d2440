"""Unit tests for fixed-point power iteration (operators/pca.py)."""

from __future__ import annotations

import numpy as np

from datagouv_tools_spark.operators.pca import power_iteration_milli


def test_recovers_dominant_direction(spark):
    """On a strongly anisotropic synthetic cloud the fixed-point
    iterate must align with numpy's true top eigenvector (|cos| ≥
    0.99 after 3 rounds — quantization costs a little, direction
    survives)."""
    rng = np.random.default_rng(7)
    d = 8
    direction = np.zeros(d)
    direction[2] = 0.45
    direction[5] = -0.3
    x = rng.normal(0, 0.01, size=(300, d)) + np.outer(
        rng.normal(0, 1.0, 300), direction
    )
    x = np.clip(x, -0.52, 0.52)
    emb = spark.createDataFrame(
        [(i, [float(v) for v in row]) for i, row in enumerate(x)],
        "vec_id long, embedding array<float>",
    )
    v, mx = power_iteration_milli(emb, iters=3, dim=d)
    assert mx > 0
    # compare against numpy's eigen-solve of the quantized Gram matrix
    q = np.round(x * 1000)
    gram = q.T @ q
    w, vecs = np.linalg.eigh(gram)
    top = vecs[:, np.argmax(w)]
    got = np.array(v, dtype=float)
    cos = abs(got @ top) / (np.linalg.norm(got) * np.linalg.norm(top))
    assert cos >= 0.99, cos


def test_gram_fusion_matches_per_round_reference(spark):
    """The one-pass Gram form must equal the per-round distributed form
    BIT FOR BIT — integer addition regroups exactly, so v and mx match
    a Python-int reference that mirrors the old round structure
    (dot = Xv per vector, then u = X'dot) without ever forming G."""
    rng = np.random.default_rng(11)
    d, n = 6, 120
    x = rng.normal(0, 0.25, size=(n, d)).clip(-0.52, 0.52)
    emb = spark.createDataFrame(
        [(i, [float(v) for v in row]) for i, row in enumerate(x)],
        "vec_id long, embedding array<float>",
    )
    iters = 3
    got_v, got_mx = power_iteration_milli(emb, iters=iters, dim=d)

    # reference: per-round u = X'(Xv) in exact Python ints
    q = [[int(v) for v in row] for row in np.round(x * 1000)]
    ref_v, ref_mx = [1000] * d, 1000
    for _ in range(iters):
        dots = [sum(row[e] * ref_v[e] for e in range(d)) for row in q]
        u = [
            sum(q[i][dd] * dots[i] for i in range(n)) for dd in range(d)
        ]
        ref_mx = max(abs(val) for val in u)
        ref_v = [
            (1 if u[dd] >= 0 else -1) * ((abs(u[dd]) * 1000) // ref_mx)
            for dd in range(d)
        ]
    assert got_v == ref_v
    assert got_mx == ref_mx


def test_linf_normalization_bounds(spark):
    """After each round the iterate is L∞-normalized: max |v| == 1000
    exactly, all components within ±1000."""
    rng = np.random.default_rng(3)
    x = rng.normal(0, 0.2, size=(50, 4)).clip(-0.5, 0.5)
    emb = spark.createDataFrame(
        [(i, [float(v) for v in row]) for i, row in enumerate(x)],
        "vec_id long, embedding array<float>",
    )
    v, _ = power_iteration_milli(emb, iters=2, dim=4)
    assert max(abs(c) for c in v) == 1000
    assert all(-1000 <= c <= 1000 for c in v)


def test_perceptron_separable_converges(spark):
    """On linearly separable data the batch perceptron must reach zero
    misclassifications within a few rounds."""
    rng = np.random.default_rng(9)
    rows = []
    for i in range(60):
        pos = i < 30
        base = 0.35 if pos else -0.35
        v = rng.normal(base, 0.05, size=4).clip(-0.52, 0.52)
        rows.append((i, [float(x) for x in v], 0 if pos else 1))
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    from datagouv_tools_spark.operators.perceptron import perceptron_train

    w, stats = perceptron_train(emb, positive_label=0, iters=5, dim=4)
    assert stats[-1]["n_misclassified"] == 0
    assert any(v != 0 for v in w)
