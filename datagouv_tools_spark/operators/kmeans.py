"""Fixed-point Lloyd k-means on Spark — clustering with an exact
cross-engine contract.

Float k-means is order-dependent three ways (distance sums, centroid
mean sums, tie-handling); this implementation pins all of them:
embeddings quantize to milli ints (`ROUND(x*1000)`), distances are
integer Σ(x−c)², assignment ties break to the smallest centroid id,
and centroid updates are sign-magnitude integer means
(`sgn(s)·(|s|//n)` — DuckDB's `//` truncates toward zero, same as
Spark's `div`; the sign-magnitude form is kept anyway so Python-side
folds — whose `//` FLOORS — reproduce the same values, and to defend
against engines that floor). Initialization is
deterministic: the k vectors with the smallest vec_ids, cluster id =
their rank. Every round is therefore bit-reproducible and the whole
iterative clustering is value-hash-checkable in DuckDB.

Scale: the k·dim centroid state NEVER visits the driver after init —
rounds chain inside one lazy DAG, each round's centroids riding into
the next assignment as a one-row broadcast ``array<struct<cid,c>>``
singleton (a broadcast-exchange subquery, not a collect). Assignment
is map-local (a transform over the broadcast candidates + array_min;
no (vec × centroid) row explosion, no shuffle); the update shuffles
only (cid, dim) partial sums with map-side combine. The corpus is
quantized once into an eager localCheckpoint so each round's scan
reads the materialized ints, not the raw parquet lineage. Centroid
values travel as data rather than inlined literals, so the generated
code is byte-identical across rounds and janino compiles it once
(the literal version re-compiled a 512-constant tree every round —
at sf0.1 the compile dominated the arithmetic).

int64 headroom: |x|,|c| ≤ ~1060 milli ⇒ per-dim squared term ≤ 4.5e6,
per-vector distance ≤ 2.9e8 (dim 64); inertia sums stay safe past 1e9
vectors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _quantized(emb: DataFrame) -> DataFrame:
    xq = F.transform(
        F.col("embedding"),
        lambda v: F.round(v.cast("double") * 1000, 0).cast("bigint"),
    )
    return emb.select("vec_id", xq.alias("xq"))


def _cands(cents: DataFrame) -> DataFrame:
    """Collapse a (cid, c) centroid frame into the one-row
    ``array<struct<cid,c>>`` singleton `_assign` broadcasts; sorted by
    cid so the candidate order (and thus the generated code) is
    deterministic."""
    return cents.agg(
        F.array_sort(F.collect_list(F.struct("cid", "c"))).alias("cands")
    )


def _assign(q: DataFrame, cands_df: DataFrame) -> DataFrame:
    """(vec_id, cid, dist, xq): nearest centroid, ties to smallest cid
    — array_min over struct(dist, cid) candidates, map-local."""
    best = F.array_min(
        F.transform(
            F.col("cands"),
            lambda s: F.struct(
                F.aggregate(
                    F.zip_with(
                        F.col("xq"), s["c"], lambda a, b: (a - b) * (a - b)
                    ),
                    F.lit(0).cast("bigint"),
                    lambda acc, t: acc + t,
                ).alias("dist"),
                s["cid"].alias("cid"),
            ),
        )
    )
    return q.crossJoin(F.broadcast(cands_df)).select(
        "vec_id",
        best["cid"].alias("cid"),
        best["dist"].alias("dist"),
        "xq",
    )


def _update(a: DataFrame) -> DataFrame:
    """New (cid, c) centroids from an assignment: per-(cid, dim)
    partial sums (map-side combined), then sign-magnitude integer
    means re-assembled into the dim-ordered centroid array. `floor` on
    the |s|/n magnitude equals truncation because |s| ≥ 0."""
    mag = lambda t: F.floor(F.abs(t["s"]) / t["n"]).cast("bigint")  # noqa: E731
    return (
        a.select("cid", F.posexplode("xq").alias("pos", "x"))
        .groupBy("cid", "pos")
        .agg(
            F.sum("x").cast("bigint").alias("s"),
            F.count(F.lit(1)).cast("bigint").alias("n"),
        )
        .groupBy("cid")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "s", "n"))),
                lambda t: F.when(t["s"] >= 0, mag(t)).otherwise(-mag(t)),
            ).alias("c")
        )
    )


def kmeans_fixed_point(
    emb: DataFrame, k: int, iters: int, dim: int
) -> tuple[DataFrame, DataFrame]:
    """Run ``iters`` Lloyd rounds; returns ``(cents, final)`` — the
    final (cid, c array<bigint>) centroid frame and the final
    assignment (vec_id, cid, dist) against it. Both are LAZY: the only
    eager work here is quantizing the corpus and collecting the k
    init vectors; the rounds execute as broadcast-exchange subqueries
    of whatever action the caller runs."""
    q = _quantized(emb).localCheckpoint(eager=True)
    spark = emb.sparkSession
    init_rows = q.orderBy("vec_id").limit(k).collect()
    cents = spark.createDataFrame(
        [(i + 1, [int(v) for v in row.xq]) for i, row in enumerate(init_rows)],
        "cid bigint, c array<bigint>",
    )
    for _ in range(iters):
        cents = _update(_assign(q, _cands(cents)))
    final = _assign(q, _cands(cents)).select("vec_id", "cid", "dist")
    return cents, final


def kmeans_assign_cte_sql(k: int, iters: int, dim: int) -> str:
    """The shared DuckDB CTE chain (no final SELECT): long-format
    quantized corpus ``q``, init ``c0``, per-round distance/assign/
    update ``d{r}/a{r}/c{r}``, and the final assignment ``a{iters+1}``
    against ``c{iters}``. ``kmeans_oracle_sql`` and downstream
    composites (semantic dedup) append their own SELECTs."""
    head = f"""
    WITH q AS (
      SELECT vec_id, g.i,
             CAST(ROUND(CAST(embedding[g.i] AS DOUBLE) * 1000, 0) AS BIGINT)
               AS x
      FROM embeddings, LATERAL UNNEST(generate_series(1, {dim})) AS g(i)
    ),
    initv AS (
      SELECT vec_id, ROW_NUMBER() OVER (ORDER BY vec_id) AS cid
      FROM (SELECT DISTINCT vec_id FROM q ORDER BY vec_id LIMIT {k})
    ),
    c0 AS (
      SELECT CAST(initv.cid AS BIGINT) AS cid, q.i, q.x AS c
      FROM q JOIN initv USING (vec_id)
    )"""
    rounds = []
    for r in range(1, iters + 1):
        rounds.append(
            f""",
    d{r} AS (
      SELECT q.vec_id, c.cid,
             CAST(SUM((q.x - c.c) * (q.x - c.c)) AS BIGINT) AS dist
      FROM q JOIN c{r - 1} c USING (i) GROUP BY q.vec_id, c.cid
    ),
    a{r} AS (
      SELECT vec_id, cid, dist FROM (
        SELECT vec_id, cid, dist,
               ROW_NUMBER() OVER (PARTITION BY vec_id
                                  ORDER BY dist, cid) AS rn
        FROM d{r}
      ) WHERE rn = 1
    ),
    c{r} AS (
      SELECT a.cid, q.i,
             CAST(CASE WHEN SUM(q.x) >= 0
                  THEN ABS(SUM(q.x)) // COUNT(*)
                  ELSE -(ABS(SUM(q.x)) // COUNT(*)) END AS BIGINT) AS c
      FROM q JOIN a{r} a USING (vec_id) GROUP BY a.cid, q.i
    )"""
        )
    fin = iters + 1
    tail = f""",
    d{fin} AS (
      SELECT q.vec_id, c.cid,
             CAST(SUM((q.x - c.c) * (q.x - c.c)) AS BIGINT) AS dist
      FROM q JOIN c{iters} c USING (i) GROUP BY q.vec_id, c.cid
    ),
    a{fin} AS (
      SELECT vec_id, cid, dist FROM (
        SELECT vec_id, cid, dist,
               ROW_NUMBER() OVER (PARTITION BY vec_id
                                  ORDER BY dist, cid) AS rn
        FROM d{fin}
      ) WHERE rn = 1
    )"""
    return head + "".join(rounds) + tail


def kmeans_oracle_sql(k: int, iters: int, dim: int) -> str:
    """DuckDB twin: same init, rounds, tie-breaks, and sign-magnitude
    centroid means as one CTE chain over the long-format corpus."""
    fin = iters + 1
    tail = f""",
    cl1 AS (
      SELECT cid, CAST(SUM(ABS(c)) AS BIGINT) AS c_l1 FROM c{iters}
      GROUP BY cid
    )
    SELECT a.cid AS cluster_id,
           CAST(COUNT(*) AS BIGINT) AS n_vecs,
           CAST(SUM(a.dist) AS BIGINT) AS inertia,
           cl1.c_l1
    FROM a{fin} a JOIN cl1 USING (cid)
    GROUP BY a.cid, cl1.c_l1
    ORDER BY cluster_id"""
    return kmeans_assign_cte_sql(k, iters, dim) + tail
