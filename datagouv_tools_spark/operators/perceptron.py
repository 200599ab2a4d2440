"""Distributed batch perceptron — linear-classifier training with an
exact cross-engine contract, and not a single division.

The batch (gradient) perceptron update is pure integer arithmetic once
the inputs are quantized: milli-int features, labels ±1, scores are
int64 dot products, and each round adds Σ_{misclassified} y·x to the
weight vector. No learning-rate division, no normalization — the
classic mistake-driven update is already fixed-point. That makes a
genuinely trained model (not a pinned-weight scorer like
doc_quality_logit) value-hash-verifiable in DuckDB round for round.

Scale: each round is one broadcast of the dim-sized weight vector, one
map-local score per vector, and one (dim) -combined aggregation of the
misclassified updates — the standard data-parallel batch gradient
shape. Weight state crosses the driver between rounds (bounded: dim
ints), like every iterative operator in this engine.

int64 headroom: |w_d| grows ≤ rounds·n·max|x| ≈ R·n·530; scores ≤
|w|·530·64 — safe past 1e8 vectors for small R.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from datagouv_tools_spark.functions.litfast import lit_bigint_array


def perceptron_train(
    emb: DataFrame, positive_label: int, iters: int, dim: int
) -> tuple[list[int], list[dict]]:
    """Train one-vs-rest for ``positive_label``.

    ``emb`` needs (vec_id, embedding array<float>, label int). Returns
    (final weights, per-round stats dicts with n_misclassified and
    w_l1_after).
    """
    q = emb.select(
        "vec_id",
        F.when(F.col("label") == positive_label, 1)
        .otherwise(-1)
        .cast("bigint")
        .alias("y"),
        F.transform(
            F.col("embedding"),
            lambda v: F.round(v.cast("double") * 1000, 0).cast("bigint"),
        ).alias("xq"),
    ).persist()
    q.count()
    w = [0] * dim
    stats: list[dict] = []
    for r in range(iters):
        # one expr round-trip per round for the dim-wide weight literal
        # (functions/litfast) — the F.lit loop cost ~1k py4j calls/round
        warr = lit_bigint_array(w)
        score = F.aggregate(
            F.zip_with(F.col("xq"), warr, lambda a, b: a * b),
            F.lit(0).cast("bigint"),
            lambda acc, t: acc + t,
        )
        mis = q.select("y", "xq", score.alias("s")).filter(
            F.col("y") * F.col("s") <= 0
        )
        # one action per round: every misclassified row explodes into
        # one row per pos, so a pos group's count(1) IS the
        # misclassified-row count — no separate count job. Read it off
        # pos 0 specifically: posexplode emits pos 0 for every
        # non-empty array, so the count is exact even if a ragged or
        # truncated embedding ever shorts the higher positions (an
        # unsorted collect()'s first row would be a nondeterministic
        # group).
        upd_rows = (
            mis.select(F.posexplode("xq").alias("pos", "x"), "y")
            .groupBy("pos")
            .agg(
                F.sum(F.col("y") * F.col("x")).cast("bigint").alias("u"),
                F.count(F.lit(1)).cast("bigint").alias("c"),
            )
            .collect()
        )
        n_mis = next((int(r_.c) for r_ in upd_rows if r_.pos == 0), 0)
        upd = {int(r_.pos): int(r_.u) for r_ in upd_rows}
        w = [w[i] + upd.get(i, 0) for i in range(dim)]
        stats.append(
            {
                "round": r + 1,
                "n_misclassified": int(n_mis),
                "w_l1_after": sum(abs(v) for v in w),
            }
        )
    q.unpersist()
    return w, stats


def perceptron_cte_sql(positive_label: int, iters: int, dim: int) -> str:
    """The shared DuckDB CTE chain (no final SELECT): long-format
    corpus ``q``, zero weights ``w0``, per-round score/mistake/update
    CTEs ending at ``w{iters}`` and the ``st{r}`` stat rows — reused by
    the training-trajectory oracle and the calibration oracle."""
    head = f"""
    WITH q AS (
      SELECT vec_id,
             CAST(CASE WHEN label = {positive_label} THEN 1 ELSE -1 END
                  AS BIGINT) AS y,
             g.i,
             CAST(ROUND(CAST(embedding[g.i] AS DOUBLE) * 1000, 0) AS BIGINT)
               AS x
      FROM embeddings, LATERAL UNNEST(generate_series(1, {dim})) AS g(i)
    ),
    w0 AS (SELECT g.i, CAST(0 AS BIGINT) AS w
           FROM (SELECT unnest(generate_series(1, {dim})) AS i) g)"""
    rounds = []
    for r in range(1, iters + 1):
        rounds.append(
            f""",
    s{r} AS (
      SELECT q.vec_id, ANY_VALUE(q.y) AS y,
             CAST(SUM(q.x * w.w) AS BIGINT) AS s
      FROM q JOIN w{r - 1} w USING (i) GROUP BY q.vec_id
    ),
    m{r} AS (SELECT vec_id, y FROM s{r} WHERE y * s <= 0),
    u{r} AS (
      SELECT q.i, CAST(SUM(m.y * q.x) AS BIGINT) AS u
      FROM q JOIN m{r} m USING (vec_id) GROUP BY q.i
    ),
    w{r} AS (
      SELECT w.i, CAST(w.w + COALESCE(u.u, 0) AS BIGINT) AS w
      FROM w{r - 1} w LEFT JOIN u{r} u USING (i)
    ),
    st{r} AS (
      SELECT CAST({r} AS BIGINT) AS round,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM m{r})
               AS n_misclassified,
             (SELECT CAST(SUM(ABS(w)) AS BIGINT) FROM w{r}) AS w_l1_after
    )"""
        )
    return head + "".join(rounds)


def perceptron_oracle_sql(positive_label: int, iters: int, dim: int) -> str:
    """DuckDB twin: identical rounds over the long-format corpus."""
    union = "\n    UNION ALL ".join(
        f"SELECT * FROM st{r}" for r in range(1, iters + 1)
    )
    return (
        perceptron_cte_sql(positive_label, iters, dim)
        + f"\n    {union}\n    ORDER BY round"
    )
