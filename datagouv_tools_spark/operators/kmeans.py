"""Fixed-point Lloyd k-means on Spark — clustering with an exact
cross-engine contract.

Float k-means is order-dependent three ways (distance sums, centroid
mean sums, tie-handling); this implementation pins all of them:
embeddings quantize to milli ints (`ROUND(x*1000)`), distances are
integer Σ(x−c)², assignment ties break to the smallest centroid id,
and centroid updates are sign-magnitude integer means
(`sgn(s)·(|s|//n)` — negative integer division FLOORS in DuckDB but
TRUNCATES in Spark, so both operate on magnitudes). Initialization is
deterministic: the k vectors with the smallest vec_ids, cluster id =
their rank. Every round is therefore bit-reproducible and the whole
iterative clustering is value-hash-checkable in DuckDB.

Scale: assignment is a broadcast of k·dim centroid literals against
the corpus (map-local zip_with arithmetic, one argmin groupBy on
vec_id is avoided entirely — the min is computed with min_by over the
k candidate structs per row... no: candidates are generated per row by
a transform over the broadcast array, so NO per-(vec,centroid) row
explosion leaves the map side); centroid updates shuffle (cid, dim)
partial sums with map-side combine. The k·dim state (≤ a few KB)
crosses the driver between rounds — the same bounded-driver pattern as
the BPE winners and the power-iteration vector.

int64 headroom: |x|,|c| ≤ ~1060 milli ⇒ per-dim squared term ≤ 4.5e6,
per-vector distance ≤ 2.9e8 (dim 64); inertia sums stay safe past 1e9
vectors.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _quantized(emb: DataFrame) -> DataFrame:
    xq = F.transform(
        F.col("embedding"),
        lambda v: F.round(v.cast("double") * 1000, 0).cast("bigint"),
    )
    return emb.select("vec_id", xq.alias("xq"))


def _dist_to(c_lit: list[int]) -> Column:
    carr = F.array(*[F.lit(int(v)) for v in c_lit])
    return F.aggregate(
        F.zip_with(F.col("xq"), carr, lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("bigint"),
        lambda acc, t: acc + t,
    )


def _assign(q: DataFrame, centroids: dict[int, list[int]]) -> DataFrame:
    """(vec_id, cid, dist): nearest centroid, ties to smallest cid —
    computed map-local via a least() over per-centroid struct exprs."""
    cands = [
        F.struct(
            _dist_to(c).alias("dist"), F.lit(cid).cast("bigint").alias("cid")
        )
        for cid, c in sorted(centroids.items())
    ]
    best = F.least(*cands) if len(cands) > 1 else cands[0]
    return q.select(
        "vec_id",
        best["cid"].alias("cid"),
        best["dist"].alias("dist"),
        "xq",
    )


def kmeans_fixed_point(
    emb: DataFrame, k: int, iters: int, dim: int
) -> tuple[dict[int, list[int]], DataFrame]:
    """Run ``iters`` Lloyd rounds; returns (final centroids, final
    assignment DataFrame with (vec_id, cid, dist) against them)."""
    q = _quantized(emb).persist()
    init_rows = (
        q.orderBy("vec_id").limit(k).collect()
    )
    centroids = {
        r_i + 1: list(row.xq) for r_i, row in enumerate(init_rows)
    }
    for _ in range(iters):
        a = _assign(q, centroids)
        sums = (
            a.select("cid", F.posexplode("xq").alias("pos", "x"))
            .groupBy("cid", "pos")
            .agg(
                F.sum("x").cast("bigint").alias("s"),
                F.count(F.lit(1)).cast("bigint").alias("n"),
            )
            .collect()
        )
        nxt: dict[int, list[int]] = {}
        for row in sums:
            vec = nxt.setdefault(int(row.cid), [0] * dim)
            s, n = int(row.s), int(row.n)
            mag = abs(s) // n
            vec[int(row.pos)] = mag if s >= 0 else -mag
        centroids = nxt
    final = _assign(q, centroids).select("vec_id", "cid", "dist")
    q.unpersist()
    return centroids, final


def kmeans_oracle_sql(k: int, iters: int, dim: int) -> str:
    """DuckDB twin: same init, rounds, tie-breaks, and sign-magnitude
    centroid means as one CTE chain over the long-format corpus."""
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
    ),
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
    return head + "".join(rounds) + tail
