"""Fixed-point power iteration — the dominant principal direction of an
embedding corpus, distributed and value-hash-exact.

Float power iteration is doubly order-dependent (dot products AND the
Gram accumulation are partition-order float sums), so this runs in
INTEGER arithmetic end to end: embeddings quantize to milli units
(`ROUND(x*1000)`, identical in both engines), each iteration is

    dot_i = Σ_d  x_{i,d} · v_d           (per-vector projection)
    u_d   = Σ_i  x_{i,d} · dot_i         (Gram-vector product, X'Xv)
    v'_d  = sgn(u_d) · (|u_d|·1000) // max_j |u_j|   (L∞ normalize)

— all int64 sums and divisions. L∞ normalization replaces the L2 norm
so no sqrt enters the contract, and the division is written
sign-magnitude so every engine agrees on negatives: DuckDB's `//`
truncates toward zero like Spark's `div`, but Python's `//` FLOORS —
operating on |u| makes all three truncate identically (and defends
against any engine that floors).

Scale: each iteration is two shuffles — (vec_id) for the projections,
(dim) for the Gram product — both map-side-combined; the 64-value
rank-1 state crosses the driver between rounds (the bounded-driver
pattern shared with the BPE winner collect). int64 headroom: with
|x|≤0.53 (milli ≤ 530), dim 64 and v ≤ 1000, |u| ≤ 530·3.4e7·n — safe
to n ≈ 5e5 vectors; beyond that drop the quantization to centi units
or tree-aggregate in 128-bit pieces.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def power_iteration_milli(
    emb: DataFrame, iters: int, dim: int
) -> tuple[list[int], int]:
    """Run ``iters`` fixed-point power-iteration rounds.

    ``emb`` needs columns ``vec_id`` and ``embedding`` (array<float>).
    Returns (v_milli list of length ``dim``, max|u| of the final
    round).
    """
    spark = emb.sparkSession
    q = emb.select(
        "vec_id", F.posexplode("embedding").alias("pos", "xf")
    ).select(
        "vec_id",
        (F.col("pos") + 1).alias("i"),
        F.round(F.col("xf").cast("double") * 1000, 0)
        .cast("bigint")
        .alias("x"),
    ).persist()
    q.count()
    v = [1000] * dim
    mx = 1000
    for _ in range(iters):
        vdf = spark.createDataFrame(
            [(i + 1, v[i]) for i in range(dim)], "i int, v long"
        )
        dot = (
            q.join(F.broadcast(vdf), "i")
            .groupBy("vec_id")
            .agg(F.sum(F.col("x") * F.col("v")).cast("bigint").alias("dot"))
        )
        u_rows = (
            q.join(dot, "vec_id")
            .groupBy("i")
            .agg(F.sum(F.col("x") * F.col("dot")).cast("bigint").alias("u"))
            .collect()
        )
        u = {r.i: r.u for r in u_rows}
        mx = max(abs(u.get(i + 1, 0)) for i in range(dim))
        v = [
            (1 if u.get(i + 1, 0) >= 0 else -1)
            * ((abs(u.get(i + 1, 0)) * 1000) // mx)
            for i in range(dim)
        ]
    q.unpersist()
    return v, mx


def power_iteration_oracle_sql(iters: int, dim: int) -> str:
    """DuckDB twin: the same quantization, iterations, and
    sign-magnitude normalization as one CTE chain."""
    head = f"""
    WITH q AS (
      SELECT vec_id, g.i,
             CAST(ROUND(CAST(embedding[g.i] AS DOUBLE) * 1000, 0) AS BIGINT)
               AS x
      FROM embeddings, LATERAL UNNEST(generate_series(1, {dim})) AS g(i)
    ),
    v0 AS (SELECT g.i, CAST(1000 AS BIGINT) AS v
           FROM (SELECT unnest(generate_series(1, {dim})) AS i) g)"""
    rounds = []
    for r in range(1, iters + 1):
        rounds.append(
            f""",
    dot{r} AS (
      SELECT q.vec_id, CAST(SUM(q.x * v.v) AS BIGINT) AS dot
      FROM q JOIN v{r - 1} v USING (i) GROUP BY q.vec_id
    ),
    u{r} AS (
      SELECT q.i, CAST(SUM(q.x * d.dot) AS BIGINT) AS u
      FROM q JOIN dot{r} d USING (vec_id) GROUP BY q.i
    ),
    v{r} AS (
      SELECT i,
             CAST(CASE WHEN u >= 0 THEN (ABS(u) * 1000)
                            // (SELECT MAX(ABS(u)) FROM u{r})
                  ELSE -((ABS(u) * 1000)
                            // (SELECT MAX(ABS(u)) FROM u{r}))
                  END AS BIGINT) AS v
      FROM u{r}
    )"""
        )
    tail = f"""
    SELECT CAST(v{iters}.i AS BIGINT) AS dim_idx, v{iters}.v AS v_milli,
           (SELECT CAST(MAX(ABS(u)) AS BIGINT) FROM u{iters}) AS u_abs_max
    FROM v{iters}
    ORDER BY dim_idx"""
    return head + "".join(rounds) + tail
