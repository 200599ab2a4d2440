"""Fixed-point power iteration — the dominant principal direction of an
embedding corpus, distributed and value-hash-exact.

Float power iteration is doubly order-dependent (dot products AND the
Gram accumulation are partition-order float sums), so this runs in
INTEGER arithmetic end to end: embeddings quantize to milli units
(`ROUND(x*1000)`, identical in both engines). Mathematically each
iteration is

    dot_i = Σ_d  x_{i,d} · v_d           (per-vector projection)
    u_d   = Σ_i  x_{i,d} · dot_i         (Gram-vector product, X'Xv)
    v'_d  = sgn(u_d) · (|u_d|·1000) // max_j |u_j|   (L∞ normalize)

— all int64 sums and divisions. L∞ normalization replaces the L2 norm
so no sqrt enters the contract, and the division is written
sign-magnitude so every engine agrees on negatives: DuckDB's `//`
truncates toward zero like Spark's `div`, but Python's `//` FLOORS —
operating on |u| makes all three truncate identically (and defends
against any engine that floors).

Execution fuses the k distributed rounds into ONE pass (guide §2.4/§5):
u = X'(Xv) = (X'X)v, and the d×d Gram matrix G = X'X does not depend on
v — so G is computed distributed ONCE (upper triangle, one map-side-
combined aggregation over per-row pair products; d(d+1)/2 ≈ 2k rows
ever shuffle) and the k rounds become O(d²) exact-integer driver math.
Integer addition is associative, so regrouping Σ_i x_{i,d}(Σ_e x_{i,e}
v_e) into Σ_e G[d,e]·v_e is bit-identical to the per-round distributed
form (test-pinned). Versus k rounds × (broadcast join + two shuffles +
a collect), this is one job at any corpus size.

int64 headroom: with |x|≤0.53 (milli ≤ 530), G entries |G| ≤ 530²·n —
safe to n ≈ 3e13 vectors; u is computed in Python (arbitrary
precision), so the engine-side bound is G alone. Beyond that drop the
quantization to centi units. The d² per-row expansion assumes bounded
embedding dim (64 here); it is the d ≪ n regime of the PCA primitive.
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
    from datagouv_tools_spark.operators.skew import fan_out_narrow_scan

    # One distributed pass: per-row upper-triangle pair products of the
    # milli-quantized vector, map-side-aggregated to d(d+1)/2 Gram
    # cells. try_element_at: a short array contributes NULL (skipped by
    # sum) for its missing dims, matching the posexplode form where a
    # missing dim simply had no rows.
    tri = (
        fan_out_narrow_scan(emb.select("embedding"))
        .select(
            F.expr(
                "transform(embedding, __pe ->"
                " cast(round(cast(__pe as double) * 1000, 0) as bigint))"
            ).alias("xm")
        )
        .select(
            F.explode(
                F.expr(
                    f"flatten(transform(sequence(1, {dim}), __pi ->"
                    f" transform(sequence(__pi, {dim}), __pj ->"
                    " struct(__pi as i, __pj as j,"
                    " try_element_at(xm, __pi)"
                    " * try_element_at(xm, __pj) as p))))"
                )
            ).alias("c")
        )
        .select("c.i", "c.j", "c.p")
    )
    g_rows = tri.groupBy("i", "j").agg(F.sum("p").alias("g")).collect()
    gram = [[0] * dim for _ in range(dim)]
    for r in g_rows:
        g = int(r["g"]) if r["g"] is not None else 0
        gram[r["i"] - 1][r["j"] - 1] = g
        gram[r["j"] - 1][r["i"] - 1] = g

    v = [1000] * dim
    mx = 1000
    for _ in range(iters):
        u = [
            sum(gram[d][e] * v[e] for e in range(dim)) for d in range(dim)
        ]
        mx = max(abs(x) for x in u)
        v = [
            (1 if u[d] >= 0 else -1) * ((abs(u[d]) * 1000) // mx)
            for d in range(dim)
        ]
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
