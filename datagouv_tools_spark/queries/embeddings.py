"""Embedding analytics: ANN search (LSH/IVF/PQ), near-dup, clustering, classical-ML baselines.

Mechanically split from the flat queries.py (r10); see the package
__init__ for conventions. Registration side effects only — import
through ``datagouv_tools_spark.queries``."""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datagouv_tools_spark.functions.litfast import (
    lit_bigint_array,
    lit_bigint_matrix,
)
from ._registry import query, t
from ._common import _sql_lsh_band_ctes

@query(
    "emb_cosine_topk",
    """
    WITH q AS (SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id < 10),
    c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS embedding FROM embeddings),
    p AS (
      SELECT q.qid AS query_id, e.vec_id,
             ROUND(list_dot_product(q.qv, e.embedding)
                   / (sqrt(list_dot_product(q.qv, q.qv)) * sqrt(list_dot_product(e.embedding, e.embedding))), 6) AS sim
      FROM q JOIN c e ON e.vec_id <> q.qid
    ),
    r AS (SELECT query_id, vec_id, sim,
                 ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY sim DESC, vec_id) AS rk
          FROM p)
    SELECT query_id, vec_id, sim, rk FROM r WHERE rk <= 5
    ORDER BY query_id, rk
    """,
)
def emb_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k (operators/similarity.cosine_topk):
    10 query vectors × full corpus, k=5. The exact-ANN baseline; the
    query side is broadcast so the corpus is never shuffled."""
    from datagouv_tools_spark.operators.similarity import cosine_topk

    emb = t(spark, sf_dir, "embeddings")
    queries_df = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    return cosine_topk(queries_df, emb, k=5).orderBy("query_id", "rk")


@query(
    "emb_near_dup_pairs",
    """
    WITH c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS embedding FROM embeddings)
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           ROUND(list_dot_product(a.embedding, b.embedding)
                 / (sqrt(list_dot_product(a.embedding, a.embedding)) * sqrt(list_dot_product(b.embedding, b.embedding))), 6) AS sim
    FROM c a JOIN c b ON a.vec_id < b.vec_id
    WHERE ROUND(list_dot_product(a.embedding, b.embedding)
                / (sqrt(list_dot_product(a.embedding, a.embedding)) * sqrt(list_dot_product(b.embedding, b.embedding))), 6) >= 0.4
    ORDER BY id_a, id_b
    """,
)
def emb_near_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (threshold 0.4), exact,
    via the DISTRIBUTED block-matrix kernel (operators/similarity.
    cosine_pairs_blocked): block pairs fan out to task groups, each
    runs one BLAS matmul — no driver collect, no corpus broadcast, so
    the same code path survives a corpus that doesn't fit any single
    node. (cosine_pairs_exact remains the bounded in-bucket verifier
    after LSH blocking.)"""
    from datagouv_tools_spark.operators.similarity import cosine_pairs_blocked

    emb = t(spark, sf_dir, "embeddings")
    return cosine_pairs_blocked(emb, "vec_id", "embedding", threshold=0.4).orderBy(
        "id_a", "id_b"
    )


#: DuckDB twin of ivf_topk(n_lists=16, nprobe=4, seed=42): reselects
#: the same 16 coarse centroids (cross-engine md5 hash order), redoes
#: the cosine argmax list assignment and per-query probe ranking, and
#: reranks candidates — the whole inverted-file pipeline is
#: deterministic, so even this "approximate" operator hash-matches.
_SQL_IVF_ORACLE = """
    WITH c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS embedding FROM embeddings),
    cent0 AS (
      SELECT vec_id, embedding,
             ('0x' || substr(md5(vec_id::VARCHAR || '-42'), 1, 15))::BIGINT AS h
      FROM c ORDER BY h ASC, vec_id ASC LIMIT 16
    ),
    cent AS (
      SELECT ROW_NUMBER() OVER (ORDER BY h, vec_id) - 1 AS list_id,
             list_transform(embedding,
                 x -> x / sqrt(list_dot_product(embedding, embedding))) AS cv
      FROM cent0
    ),
    sims AS (
      SELECT c.vec_id, cent.list_id,
             ROUND(list_dot_product(c.embedding, cent.cv)
                   / sqrt(list_dot_product(c.embedding, c.embedding)), 6) AS csim
      FROM c, cent
    ),
    ranked AS (
      SELECT vec_id, list_id,
             ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY csim DESC, list_id) AS crk
      FROM sims
    ),
    lists AS (SELECT vec_id, list_id FROM ranked WHERE crk = 1),
    probes AS (SELECT vec_id AS query_id, list_id FROM ranked WHERE vec_id < 10 AND crk <= 4),
    p AS (
      SELECT pr.query_id, a.vec_id,
             ROUND(list_dot_product(q.embedding, e.embedding)
                   / (sqrt(list_dot_product(q.embedding, q.embedding))
                      * sqrt(list_dot_product(e.embedding, e.embedding))), 6) AS sim
      FROM probes pr
      JOIN lists a ON a.list_id = pr.list_id AND a.vec_id <> pr.query_id
      JOIN c q ON q.vec_id = pr.query_id
      JOIN c e ON e.vec_id = a.vec_id
    ),
    r AS (SELECT query_id, vec_id, sim,
                 ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY sim DESC, vec_id) AS rk
          FROM p)
    SELECT query_id, vec_id, sim, rk FROM r WHERE rk <= 5
    ORDER BY query_id, rk
    """


@query("ivf_ann_topk", _SQL_IVF_ORACLE)
def ivf_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF approximate nearest neighbors (operators/similarity.
    ivf_topk): 16 coarse lists, 4 probed per query, exact cosine within
    probed lists. The inverted-file scale path next to LSH
    (lsh_ann_topk); recall vs brute force asserted in tests; the full
    pipeline (centroid sampling → assignment → probing → rerank) is
    deterministic and oracle-checked."""
    from datagouv_tools_spark.operators.similarity import ivf_topk

    emb = t(spark, sf_dir, "embeddings")
    queries_df = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    return ivf_topk(queries_df, emb, k=5, n_lists=16, nprobe=4).orderBy(
        "query_id", "rk"
    )


@query(
    "emb_label_centroids",
    """
    WITH dims AS (
      SELECT label, CAST(i AS BIGINT) AS dim_idx, embedding[i] AS dim_val
      FROM embeddings, (SELECT unnest(generate_series(1, 4)) AS i)
    )
    SELECT label, dim_idx,
           CAST(SUM(CAST(FLOOR(CAST(dim_val AS DOUBLE) * 100000000) AS BIGINT))
             AS BIGINT) AS dim_sum_scaled,
           COUNT(*) AS n
    FROM dims
    GROUP BY label, dim_idx
    ORDER BY label, dim_idx
    """,
)
def emb_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label vector centroid accumulation (first 4 dims shown):
    posexplode to (label, dim, value), exact-decimal sums per cell —
    the positional array aggregation every class-centroid / k-means
    update step needs. Scale: explode is map-local; the shuffle
    carries (label, dim) partial sums — map-side combine collapses
    rows-per-task to |labels| x dims. Determinism: each float dim is
    floor-scaled to an integer (float->decimal CASTS round differently
    across engines; floor of identical doubles cannot), summed exactly
    as BIGINT. (Means = dim_sum_scaled / (1e8 * n), left to the
    consumer to keep the oracle in exact arithmetic.)"""
    emb = t(spark, sf_dir, "embeddings")
    exploded = emb.select(
        "label", F.posexplode("embedding").alias("pos", "dim_val")
    ).filter(F.col("pos") <= 3)
    return (
        exploded.groupBy("label", (F.col("pos") + 1).cast("long").alias("dim_idx"))
        .agg(
            F.sum(
                F.floor(F.col("dim_val").cast("double") * F.lit(1e8)).cast("long")
            ).alias("dim_sum_scaled"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("label", "dim_idx")
    )


@query(
    "emb_quantize_error",
    """
    WITH q AS (
      SELECT label,
             list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) AS m,
             CAST(embedding AS DOUBLE[]) AS v
      FROM embeddings
    ),
    e AS (
      SELECT label,
             CAST(list_sum(list_transform(v,
                 x -> CAST(FLOOR(abs(x - ROUND(x * (127.0 / m)) / (127.0 / m))
                                 * 100000000) AS BIGINT))) AS BIGINT) AS err_scaled
      FROM q WHERE m > 0
    )
    SELECT label,
           COUNT(*) AS n_vectors,
           CAST(SUM(err_scaled) AS BIGINT) AS total_err_scaled
    FROM e
    GROUP BY label
    ORDER BY label
    """,
)
def emb_quantize_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Int8 symmetric scalar quantization audit: per vector, quantize
    each dim with scale 127/max|x| (round half-up), dequantize, and
    accumulate the absolute reconstruction error — the compression
    screen run before shipping embeddings to an ANN index. Determinism:
    all per-element float ops are identical expression-for-expression
    in both engines; the error is floor-scaled to integers BEFORE any
    accumulation, so sums are exact. Scale: element-wise map work, one
    shuffle on label with map-side partial sums."""
    emb = t(spark, sf_dir, "embeddings")
    v = F.transform("embedding", lambda x: x.cast("double"))
    m = F.array_max(F.transform("embedding", lambda x: F.abs(x.cast("double"))))
    scale = F.lit(127.0) / m
    err_scaled = F.aggregate(
        F.transform(
            v,
            lambda x: F.floor(F.abs(x - F.round(x * scale) / scale) * F.lit(100000000.0)).cast(
                "bigint"
            ),
        ),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )
    return (
        emb.select("label", m.alias("m"), err_scaled.alias("err_scaled"))
        .filter(F.col("m") > 0)
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vectors"),
            F.sum("err_scaled").alias("total_err_scaled"),
        )
        .orderBy("label")
    )


def _sql_random_projection_oracle() -> str:
    """DuckDB twin of random_projection(64→8, seed 42): the projection
    matrix rows are the same deterministic literals as the Spark side,
    and list_dot_product matches the JVM ``dot`` accumulation order."""
    import math

    from datagouv_tools_spark.operators.similarity import _hyperplanes

    planes = _hyperplanes(64, 8, seed=42)
    scale = repr(1.0 / math.sqrt(8))
    cols = ",\n           ".join(
        f"ROUND(list_dot_product(embedding, [{', '.join(repr(w) for w in plane)}]) * {scale}, 6) AS p{j}"
        for j, plane in enumerate(planes)
    )
    return f"""
    SELECT vec_id,
           {cols}
    FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS embedding FROM embeddings)
    WHERE vec_id < 20
    ORDER BY vec_id
    """


@query("emb_random_projection", _sql_random_projection_oracle())
def emb_random_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dimensionality reduction for embedding pipelines
    (operators/similarity.random_projection): 64→8 JL preview vectors,
    shown flattened (p0..p7) for the 20 lowest ids so the driver can
    hash them. At corpus scale the projection runs at ingest and the
    previews feed candidate generation."""
    from datagouv_tools_spark.operators.similarity import random_projection

    emb = t(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 20)
    proj = random_projection(emb, "embedding", in_dim=64, out_dim=8)
    return proj.select(
        "vec_id", *[F.col("projected")[j].alias(f"p{j}") for j in range(8)]
    ).orderBy("vec_id")


def _sql_pq_oracle() -> str:
    """DuckDB twin of pq_codebooks + pq_encode (8 subspaces × 16 codes
    over 64-dim vectors): the codebook sample is reselected by the same
    md5-min-of-id rule as the IVF oracle, per-subspace squared-L2
    distances accumulate left-associatively over the same dimension
    order as the Spark expression tree (bit-identical doubles), and the
    argmin tie-break (ROUND@6 then smaller code id) matches the
    struct-min exactly."""
    dist_cols = []
    for s in range(8):
        terms = " + ".join(
            f"(e[{s * 8 + d + 1}]-cv[{s * 8 + d + 1}])*(e[{s * 8 + d + 1}]-cv[{s * 8 + d + 1}])"
            for d in range(8)
        )
        dist_cols.append(f"ROUND({terms}, 6) AS d{s}")
    argmins = ",\n    ".join(
        f"a{s} AS (SELECT vec_id, code, d{s}, "
        f"ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d{s}, code) AS rk FROM d)"
        for s in range(8)
    )
    code_cols = ", ".join(f"CAST(a{s}.code AS INT) AS code_{s}" for s in range(8))
    err_sum = " + ".join(f"a{s}.d{s}" for s in range(8))
    joins = "\n    ".join(
        f"JOIN (SELECT vec_id, code, d{s} FROM a{s} WHERE rk = 1) a{s} USING (vec_id)"
        for s in range(8)
    )
    return f"""
    WITH c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings WHERE vec_id < 50),
    cent0 AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS cv,
             ('0x' || substr(md5(vec_id::VARCHAR || '-42'), 1, 15))::BIGINT AS h
      FROM embeddings ORDER BY h ASC, vec_id ASC LIMIT 16
    ),
    cent AS (SELECT ROW_NUMBER() OVER (ORDER BY h, vec_id) - 1 AS code, cv FROM cent0),
    d AS (SELECT c.vec_id, cent.code, {", ".join(dist_cols)} FROM c, cent),
    {argmins}
    SELECT v.vec_id, {code_cols},
           ROUND({err_sum}, 6) AS recon_err
    FROM (SELECT DISTINCT vec_id FROM c) v
    {joins}
    ORDER BY vec_id
    """


@query("emb_pq_codes", _sql_pq_oracle())
def emb_pq_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product quantization (operators/similarity.pq_encode): 64-dim
    embeddings → 8 sub-vector codes from 16-entry codebooks + exact
    reconstruction error — the compression audit behind a PQ ANN index
    (8 bytes/vector instead of 256).

    Scale: encoding is a pure JVM expression tree (no UDF, no shuffle)
    — at 100 TB it encodes at scan speed; the codebook is a bounded
    16-row driver sample, the same determinism contract as IVF."""
    from datagouv_tools_spark.operators.similarity import pq_codebooks, pq_encode

    emb = t(spark, sf_dir, "embeddings")
    books = pq_codebooks(
        emb, "vec_id", "embedding", dim=64, n_subspaces=8, n_codes=16
    )
    enc = pq_encode(
        emb.filter(F.col("vec_id") < 50).select("vec_id", "embedding"), books
    )
    return enc.select(
        "vec_id", *[f"code_{s}" for s in range(8)], "recon_err"
    ).orderBy("vec_id")


def _sql_pq_adc_oracle(query_vec_id: int = 0) -> str:
    """DuckDB twin of pq_encode + pq_adc_topk: codes are recomputed by
    the same md5-sample/argmin rule as ``_sql_pq_oracle``; the LUT is
    recomputed from the raw centroid and query-vector values with the
    same dimension-order left-associative sums the Python driver uses
    (IEEE doubles — bit-identical), and only the final 8-term sum is
    rounded. Ties ORDER BY adc_dist, vec_id. ``query_vec_id`` selects
    the query vector (the batch oracle unions several)."""
    dist_cols = []
    lut_cols = []
    for s in range(8):
        enc_terms = " + ".join(
            f"(e[{s * 8 + d + 1}]-cv[{s * 8 + d + 1}])*(e[{s * 8 + d + 1}]-cv[{s * 8 + d + 1}])"
            for d in range(8)
        )
        dist_cols.append(f"ROUND({enc_terms}, 6) AS d{s}")
        lut_terms = " + ".join(
            f"(qe[{s * 8 + d + 1}]-cv[{s * 8 + d + 1}])*(qe[{s * 8 + d + 1}]-cv[{s * 8 + d + 1}])"
            for d in range(8)
        )
        lut_cols.append(f"{lut_terms} AS l{s}")
    argmins = ",\n    ".join(
        f"a{s} AS (SELECT vec_id, code, "
        f"ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d{s}, code) AS rk FROM d)"
        for s in range(8)
    )
    joins = "\n    ".join(
        f"JOIN (SELECT vec_id, code FROM a{s} WHERE rk = 1) a{s} USING (vec_id)\n"
        f"    JOIN (SELECT code AS c{s}, l{s} FROM lut) lut{s} ON lut{s}.c{s} = a{s}.code"
        for s in range(8)
    )
    adc = " + ".join(f"lut{s}.l{s}" for s in range(8))
    return f"""
    WITH c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
    cent0 AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS cv,
             ('0x' || substr(md5(vec_id::VARCHAR || '-42'), 1, 15))::BIGINT AS h
      FROM embeddings ORDER BY h ASC, vec_id ASC LIMIT 16
    ),
    cent AS (SELECT ROW_NUMBER() OVER (ORDER BY h, vec_id) - 1 AS code, cv FROM cent0),
    q AS (SELECT CAST(embedding AS DOUBLE[]) AS qe FROM embeddings
          WHERE vec_id = {int(query_vec_id)}),
    lut AS (SELECT cent.code, {", ".join(lut_cols)} FROM cent, q),
    d AS (SELECT c.vec_id, cent.code, {", ".join(dist_cols)} FROM c, cent),
    {argmins}
    SELECT v.vec_id, ROUND({adc}, 6) AS adc_dist
    FROM (SELECT DISTINCT vec_id FROM c) v
    {joins}
    ORDER BY adc_dist, vec_id
    LIMIT 10
    """


@query("emb_pq_adc_topk", _sql_pq_adc_oracle())
def emb_pq_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ asymmetric-distance search (operators/similarity.pq_adc_topk):
    top-10 nearest corpus vectors to the vec_id=0 query by summed
    per-subspace lookup-table distances over the 8-byte PQ codes — the
    search side of the PQ index whose encode side is ``emb_pq_codes``.

    Scale: the whole corpus is touched only by scan-speed map work
    (encode = HOF expression, distance = 8 array lookups + adds from a
    128-double broadcast-as-literal LUT); top-k plans as
    TakeOrderedAndProject (per-partition heaps, k·P driver merge) — no
    corpus shuffle anywhere. The only driver materializations are the
    16 sampled centroids and the single query vector."""
    from datagouv_tools_spark.operators.similarity import (
        pq_adc_topk,
        pq_codebooks,
        pq_encode,
    )

    emb = t(spark, sf_dir, "embeddings")
    books = pq_codebooks(
        emb, "vec_id", "embedding", dim=64, n_subspaces=8, n_codes=16
    )
    qv = [
        float(x)
        for x in emb.filter(F.col("vec_id") == 0).select("embedding").first()[
            "embedding"
        ]
    ]
    codes = pq_encode(emb.select("vec_id", "embedding"), books).select(
        "vec_id", *[f"code_{s}" for s in range(8)]
    )
    return pq_adc_topk(codes, qv, books, k=10)


def _sql_ivfpq_oracle() -> str:
    """DuckDB twin of ivfpq_topk(n_lists=8, nprobe=2, 8×16 books,
    query = vec_id 0): the IVF half reuses _SQL_IVF_ORACLE's CTE shapes
    (md5-min centroid sample, cosine argmax assignment, probe ranking),
    the PQ half reuses _sql_pq_adc_oracle's (md5-min code sample,
    per-subspace argmin codes, LUT recomputed from raw values in
    dimension order) — composed so ADC runs ONLY over rows whose
    assigned list is probed by the query."""
    dist_cols = []
    lut_cols = []
    for s in range(8):
        enc_terms = " + ".join(
            f"(e[{s * 8 + d + 1}]-cv[{s * 8 + d + 1}])*(e[{s * 8 + d + 1}]-cv[{s * 8 + d + 1}])"
            for d in range(8)
        )
        dist_cols.append(f"ROUND({enc_terms}, 6) AS d{s}")
        lut_terms = " + ".join(
            f"(qe[{s * 8 + d + 1}]-cv[{s * 8 + d + 1}])*(qe[{s * 8 + d + 1}]-cv[{s * 8 + d + 1}])"
            for d in range(8)
        )
        lut_cols.append(f"{lut_terms} AS l{s}")
    argmins = ",\n    ".join(
        f"a{s} AS (SELECT vec_id, code, "
        f"ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d{s}, code) AS rk FROM d)"
        for s in range(8)
    )
    joins = "\n    ".join(
        f"JOIN (SELECT vec_id, code FROM a{s} WHERE rk = 1) a{s} USING (vec_id)\n"
        f"    JOIN (SELECT code AS c{s}, l{s} FROM lut) lut{s} ON lut{s}.c{s} = a{s}.code"
        for s in range(8)
    )
    adc = " + ".join(f"lut{s}.l{s}" for s in range(8))
    return f"""
    WITH c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
    icent0 AS (
      SELECT vec_id, e AS cv0,
             ('0x' || substr(md5(vec_id::VARCHAR || '-42'), 1, 15))::BIGINT AS h
      FROM c ORDER BY h ASC, vec_id ASC LIMIT 8
    ),
    icent AS (
      SELECT ROW_NUMBER() OVER (ORDER BY h, vec_id) - 1 AS list_id,
             list_transform(cv0, x -> x / sqrt(list_dot_product(cv0, cv0))) AS cv
      FROM icent0
    ),
    isims AS (
      SELECT c.vec_id, icent.list_id,
             ROUND(list_dot_product(c.e, icent.cv)
                   / sqrt(list_dot_product(c.e, c.e)), 6) AS csim
      FROM c, icent
    ),
    iranked AS (
      SELECT vec_id, list_id,
             ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY csim DESC, list_id) AS crk
      FROM isims
    ),
    lists AS (SELECT vec_id, list_id FROM iranked WHERE crk = 1),
    probes AS (SELECT list_id FROM iranked WHERE vec_id = 0 AND crk <= 2),
    pruned AS (
      SELECT c.vec_id, c.e FROM c
      JOIN lists USING (vec_id)
      WHERE lists.list_id IN (SELECT list_id FROM probes)
    ),
    pcent0 AS (
      SELECT vec_id, e AS cv,
             ('0x' || substr(md5(vec_id::VARCHAR || '-42'), 1, 15))::BIGINT AS h
      FROM c ORDER BY h ASC, vec_id ASC LIMIT 16
    ),
    pcent AS (SELECT ROW_NUMBER() OVER (ORDER BY h, vec_id) - 1 AS code, cv FROM pcent0),
    q AS (SELECT e AS qe FROM c WHERE vec_id = 0),
    lut AS (SELECT pcent.code, {", ".join(lut_cols)} FROM pcent, q),
    d AS (SELECT p.vec_id, pcent.code, {", ".join(dist_cols)}
          FROM (SELECT vec_id, e FROM pruned) p, pcent),
    {argmins}
    SELECT v.vec_id, ROUND({adc}, 6) AS adc_dist
    FROM (SELECT DISTINCT vec_id FROM pruned) v
    {joins}
    ORDER BY adc_dist, vec_id
    LIMIT 10
    """


@query("emb_ivfpq_topk", _sql_ivfpq_oracle())
def emb_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-ADC composed search (operators/similarity.ivfpq_topk): the
    query (vec_id 0) probes its 2 nearest of 8 coarse lists, and PQ
    asymmetric distance scores ONLY rows assigned to those lists — the
    actual billion-vector index shape (probe pruning × compressed
    scan), composed from the separately-oracle-checked ivf_ann_topk
    and emb_pq_adc_topk halves.

    Scale: pure map work (assign kernel → list filter → encode → 8 LUT
    lookups) + TakeOrdered; ZERO corpus exchanges (plan-guarded). The
    list filter sits BEFORE encode, so compressed-domain scoring runs
    on ~nprobe/n_lists of the corpus; with the persisted index the
    filter becomes partition pruning at the scan."""
    from datagouv_tools_spark.operators.similarity import ivfpq_topk

    emb = t(spark, sf_dir, "embeddings")
    qv = [
        float(x)
        for x in emb.filter(F.col("vec_id") == 0).select("embedding").first()[
            "embedding"
        ]
    ]
    return ivfpq_topk(
        emb, qv, k=10, n_lists=8, nprobe=2, n_subspaces=8, n_codes=16
    )


def _ann_index(spark: SparkSession, sf_dir: str):
    """Open (or build-on-first-use) the persisted ANN index for
    ``sf_dir`` under the system temp dir. The version tag in the path
    pins the build parameters — bump it if defaults change, so a stale
    index can never serve a mismatched query."""
    import os
    import tempfile

    from datagouv_tools_spark.operators.ann_index import index_build, index_open

    base = os.path.join(
        tempfile.gettempdir(),
        "spark_graft_ann_L8_S8_C16_B10x10_seed42_v1",
        os.path.basename(sf_dir.rstrip("/")),
    )
    try:
        return index_open(spark, base)
    except Exception:
        return index_build(t(spark, sf_dir, "embeddings"), base)


def _query_vec0(spark: SparkSession, sf_dir: str) -> list[float]:
    emb = t(spark, sf_dir, "embeddings")
    return [
        float(x)
        for x in emb.filter(F.col("vec_id") == 0).select("embedding").first()[
            "embedding"
        ]
    ]


@query("emb_pq_adc_topk_indexed", _sql_pq_adc_oracle())
def emb_pq_adc_topk_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """emb_pq_adc_topk served from the PERSISTED index
    (operators/ann_index): codes, codebooks, and centroids are loaded
    from the build-once parquet artifacts — no sampling, no encode, no
    codebook recomputation in the search path (pinned by a stub test
    and a plan guard: the plan is scan → LUT projection → TakeOrdered).
    Results are identical to the recompute-per-query variant, so the
    SAME oracle hash-checks both — which is itself the proof that the
    stored index is bit-faithful."""
    idx = _ann_index(spark, sf_dir)
    return idx.adc_topk(_query_vec0(spark, sf_dir), k=10, nprobe=None)


@query("emb_ivfpq_topk_indexed", _sql_ivfpq_oracle())
def emb_ivfpq_topk_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """emb_ivfpq_topk served from the PERSISTED index: the probe filter
    becomes PartitionFilters on the ``__list``-partitioned stored codes
    (plan-guarded), so a 2-of-8-lists probe reads ~1/4 of the index
    files and touches nothing else — the 100 TB search shape where
    build cost is amortized across every query. Same oracle as the
    compose-per-query variant."""
    idx = _ann_index(spark, sf_dir)
    return idx.adc_topk(_query_vec0(spark, sf_dir), k=10, nprobe=2)


@query(
    "emb_lsh_near_dup_pairs",
    f"""
    WITH {_sql_lsh_band_ctes()}
    SELECT c.id_a, c.id_b,
           ROUND(list_dot_product(a.embedding, b.embedding)
                 / (sqrt(list_dot_product(a.embedding, a.embedding))
                    * sqrt(list_dot_product(b.embedding, b.embedding))), 6) AS sim
    FROM cand c
    JOIN c0 a ON a.vec_id = c.id_a
    JOIN c0 b ON b.vec_id = c.id_b
    WHERE ROUND(list_dot_product(a.embedding, b.embedding)
                / (sqrt(list_dot_product(a.embedding, a.embedding))
                   * sqrt(list_dot_product(b.embedding, b.embedding))), 6) >= 0.4
    ORDER BY id_a, id_b
    """,
)
def emb_lsh_near_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Candidate-bounded near-dup pairs over embeddings
    (operators/similarity.cosine_pairs_lsh) as a standalone query: the
    scale-contract sibling of emb_near_dup_pairs (exact all-pairs via
    the blocked kernel). Banded multiprobe sign-LSH candidates from an
    equi-join on (band, bucket), exact cosine verified on candidates
    only — the one embedding pair generator whose every stage is linear
    at 100 TB; recall per sim level quantified in the operator
    docstring. The oracle recomputes the identical LSH front."""
    from datagouv_tools_spark.operators.similarity import cosine_pairs_lsh

    emb = t(spark, sf_dir, "embeddings")
    return cosine_pairs_lsh(
        emb, "vec_id", "embedding", threshold=0.4, dim=64
    ).orderBy("id_a", "id_b")


def _sql_adc_batch_oracle() -> str:
    """Batch-retrieval oracle: the single-query ADC oracle instantiated
    per query vector and unioned with its qid."""
    parts = [
        f"SELECT CAST({qid} AS BIGINT) AS qid, * FROM ({_sql_pq_adc_oracle(qid)}) u{qid}"
        for qid in (0, 1, 2)
    ]
    return (
        "\n    UNION ALL\n    ".join(parts)
        + "\n    ORDER BY qid, adc_dist, vec_id"
    )


@query("emb_adc_topk_batch", _sql_adc_batch_oracle())
def emb_adc_topk_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batched ANN retrieval: top-10 ADC neighbors for THREE query
    vectors in ONE pass over the persisted index's stored codes
    (operators/similarity.pq_adc_topk_batch via AnnIndex.adc_topk_batch)
    — the offline-retrieval shape, where a stored query workload is
    scored against the corpus in a single job instead of one scan per
    query. Per query the rows are bit-identical to the single-query
    search (the oracle IS three instantiations of the single-query
    oracle, unioned).

    Scale: one corpus scan total; the Arrow kernel does S code-gathers
    + adds per (row, query) from a broadcast |Q|·S·C LUT tensor, and
    emits only margin-pruned per-partition candidates (≤ partitions ×
    |Q| × (k + ties) rows) — the final per-query rank runs over that
    tiny set, never the corpus. Rounding happens JVM-side (Spark
    HALF_UP) so batch == single-query even at midpoints."""
    idx = _ann_index(spark, sf_dir)
    emb = t(spark, sf_dir, "embeddings")
    qs = {
        int(r["vec_id"]): [float(x) for x in r["embedding"]]
        for r in emb.filter(F.col("vec_id") < 3).collect()
    }
    return idx.adc_topk_batch(qs, k=10).orderBy("qid", "adc_dist", "vec_id")


def _power_iteration_oracle() -> str:
    from datagouv_tools_spark.operators.pca import power_iteration_oracle_sql

    return power_iteration_oracle_sql(3, 64)


@query("emb_power_iteration_pc1", _power_iteration_oracle())
def emb_power_iteration_pc1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dominant principal direction of the embedding corpus by THREE
    fixed-point power-iteration rounds (operators/pca.py): integer
    milli quantization, L∞ normalization with sign-magnitude division
    so negative components divide identically cross-engine. The
    distributed eigen-solve is value-hash-checked bit for bit — the
    'PCA over 100 TB of embeddings' primitive with an exact oracle.

    Scale: the 64×64 integer Gram matrix is computed distributed ONCE
    (one map-side-combined aggregation; 2,080 upper-triangle cells ever
    shuffle) and the three rounds are exact O(d²) driver math — one job
    instead of rounds × (join + two shuffles + collect), identical
    values because integer addition regroups exactly."""
    from datagouv_tools_spark.operators.pca import power_iteration_milli

    emb = t(spark, sf_dir, "embeddings")
    v, mx = power_iteration_milli(emb, iters=3, dim=64)
    return spark.createDataFrame(
        [(i + 1, v[i], mx) for i in range(64)],
        "dim_idx bigint, v_milli bigint, u_abs_max bigint",
    ).orderBy("dim_idx")


@query(
    "emb_knn_accuracy",
    """
    WITH qv AS (
      SELECT vec_id AS qid, embedding AS qe, label AS qlabel
      FROM embeddings WHERE vec_id < 50
    ),
    d AS (
      SELECT qv.qid, qv.qlabel, e.vec_id, e.label,
             CAST(list_sum(list_transform(
               generate_series(1, 64),
               i -> (CAST(ROUND(CAST(qv.qe[i] AS DOUBLE) * 1000, 0) AS BIGINT)
                     - CAST(ROUND(CAST(e.embedding[i] AS DOUBLE) * 1000, 0)
                            AS BIGINT))
                  * (CAST(ROUND(CAST(qv.qe[i] AS DOUBLE) * 1000, 0) AS BIGINT)
                     - CAST(ROUND(CAST(e.embedding[i] AS DOUBLE) * 1000, 0)
                            AS BIGINT))))
              AS BIGINT) AS dist
      FROM qv, embeddings e
      WHERE e.vec_id <> qv.qid
    ),
    nn AS (
      SELECT qid, qlabel, label FROM (
        SELECT qid, qlabel, label,
               ROW_NUMBER() OVER (PARTITION BY qid
                                  ORDER BY dist, vec_id) AS rn
        FROM d
      ) WHERE rn <= 5
    ),
    votes AS (
      SELECT qid, qlabel, label, COUNT(*) AS nv FROM nn
      GROUP BY qid, qlabel, label
    ),
    pred AS (
      SELECT qid, qlabel, label AS plabel FROM (
        SELECT qid, qlabel, label,
               ROW_NUMBER() OVER (PARTITION BY qid
                                  ORDER BY nv DESC, label) AS rn
        FROM votes
      ) WHERE rn = 1
    )
    SELECT CAST(qlabel AS BIGINT) AS label,
           CAST(COUNT(*) AS BIGINT) AS n_queries,
           CAST(SUM(CASE WHEN plabel = qlabel THEN 1 ELSE 0 END) AS BIGINT)
             AS n_correct,
           CAST((SUM(CASE WHEN plabel = qlabel THEN 1 ELSE 0 END) * 1000)
                // COUNT(*) AS BIGINT) AS accuracy_mille
    FROM pred
    GROUP BY qlabel
    ORDER BY label
    """,
)
def emb_knn_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-NN classifier evaluation: leave-one-out 5-NN majority vote for
    a 50-query sample against the full corpus, accuracy per true label
    in integer mille. Distances are integer squared L2 on the shared
    milli quantization; neighbor AND vote ties break deterministically
    (dist→vec_id, votes→smallest label) so the eval is value-hash-exact.

    Scale: the 50-row query sample is broadcast against the corpus scan
    (candidate rows = |Q|·|corpus|, map-local arithmetic, per-query
    top-5 via the rank window over the candidate stream); a production
    eval swaps the exact scan for AnnIndex.adc_topk_batch — same
    metrics, index-served candidates."""
    from datagouv_tools_spark.operators.skew import fan_out_narrow_scan

    emb = t(spark, sf_dir, "embeddings")
    xq = F.transform(
        F.col("embedding"),
        lambda v: F.round(v.cast("double") * 1000, 0).cast("bigint"),
    )
    # the |Q|x|corpus| distance arithmetic is compute-bound map work:
    # unblock the single-split corpus-scan case (guide §2.5; no-op on
    # multi-split inputs — measured a 1.1 s single-task stage here)
    corpus = fan_out_narrow_scan(emb).select("vec_id", "label", xq.alias("x"))
    qv = (
        emb.filter(F.col("vec_id") < 50)
        .select(
            F.col("vec_id").alias("qid"),
            F.col("label").alias("qlabel"),
            xq.alias("qx"),
        )
    )
    from pyspark.sql import Window as W

    d = (
        corpus.crossJoin(F.broadcast(qv))
        .filter(F.col("vec_id") != F.col("qid"))
        .select(
            "qid",
            "qlabel",
            "vec_id",
            "label",
            F.aggregate(
                F.zip_with(
                    F.col("qx"), F.col("x"), lambda a, b: (a - b) * (a - b)
                ),
                F.lit(0).cast("bigint"),
                lambda acc, t: acc + t,
            ).alias("dist"),
        )
    )
    nn = (
        d.withColumn(
            "rn",
            F.row_number().over(
                W.partitionBy("qid").orderBy("dist", "vec_id")
            ),
        )
        .filter(F.col("rn") <= 5)
        .select("qid", "qlabel", "label")
    )
    votes = nn.groupBy("qid", "qlabel", "label").agg(
        F.count(F.lit(1)).alias("nv")
    )
    pred = (
        votes.withColumn(
            "rn",
            F.row_number().over(
                W.partitionBy("qid").orderBy(F.desc("nv"), F.asc("label"))
            ),
        )
        .filter(F.col("rn") == 1)
        .select("qid", "qlabel", F.col("label").alias("plabel"))
    )
    return (
        pred.groupBy(F.col("qlabel").cast("bigint").alias("label"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_queries"),
            F.sum(F.when(F.col("plabel") == F.col("qlabel"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_correct"),
            F.expr(
                "cast((sum(case when plabel = qlabel then 1 else 0 end)"
                " * 1000) div count(1) as bigint)"
            ).alias("accuracy_mille"),
        )
        .orderBy("label")
    )


_STUMP_THRESHOLDS = (-400, -200, 0, 200, 400)


@query(
    "emb_decision_stump",
    f"""
    WITH q AS (
      SELECT vec_id,
             CAST(CASE WHEN label = 0 THEN 1 ELSE 0 END AS BIGINT) AS y,
             g.i,
             CAST(ROUND(CAST(embedding[g.i] AS DOUBLE) * 1000, 0) AS BIGINT)
               AS x
      FROM embeddings, LATERAL UNNEST(generate_series(1, 64)) AS g(i)
    ),
    cand AS (
      SELECT q.i AS dim_idx, t.thr,
             CAST(SUM(CASE WHEN q.x <= t.thr THEN 1 ELSE 0 END) AS BIGINT)
               AS n_l,
             CAST(SUM(CASE WHEN q.x <= t.thr THEN q.y ELSE 0 END) AS BIGINT)
               AS p_l,
             CAST(SUM(CASE WHEN q.x > t.thr THEN 1 ELSE 0 END) AS BIGINT)
               AS n_r,
             CAST(SUM(CASE WHEN q.x > t.thr THEN q.y ELSE 0 END) AS BIGINT)
               AS p_r
      FROM q, (SELECT unnest([{", ".join(str(v) for v in _STUMP_THRESHOLDS)}])
               AS thr) t
      GROUP BY q.i, t.thr
    ),
    scored AS (
      SELECT dim_idx, CAST(thr AS BIGINT) AS thr, n_l, p_l, n_r, p_r,
             CAST((n_l * (CASE WHEN n_l > 0 THEN 1000000
                    - (p_l * p_l + (n_l - p_l) * (n_l - p_l)) * 1000000
                      // (n_l * n_l) ELSE 0 END)
                   + n_r * (CASE WHEN n_r > 0 THEN 1000000
                    - (p_r * p_r + (n_r - p_r) * (n_r - p_r)) * 1000000
                      // (n_r * n_r) ELSE 0 END))
                  // (n_l + n_r) AS BIGINT) AS gini_ppm
      FROM cand
    )
    SELECT dim_idx, thr, n_l, p_l, n_r, p_r, gini_ppm
    FROM scored
    ORDER BY gini_ppm, dim_idx, thr
    LIMIT 5
    """,
)
def emb_decision_stump(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decision-stump learning: the best single-feature threshold split
    for 'label == 0' by weighted Gini impurity over a fixed milli
    threshold grid — tree induction's inner loop as ONE aggregation.
    Gini is integer ppm (1e6 − (p²+(n−p)²)·1e6 // n²), so the split
    ranking is bit-exact cross-engine; top-5 candidate splits surface
    with their left/right class counts.

    Scale: the (dim × threshold) candidate grid is evaluated in a
    single map-side-combined pass over the exploded feature stream —
    output is |dims|·|grid| rows regardless of corpus size (the same
    bounded-output shape as the CMS sketch); production replaces the
    fixed grid with sketch-derived quantile candidates, same plan."""
    emb = t(spark, sf_dir, "embeddings")
    q = emb.select(
        F.when(F.col("label") == 0, 1).otherwise(0).cast("bigint").alias("y"),
        F.posexplode(
            F.transform(
                F.col("embedding"),
                lambda v: F.round(v.cast("double") * 1000, 0).cast("bigint"),
            )
        ).alias("pos", "x"),
    ).select((F.col("pos") + 1).alias("dim_idx"), "x", "y")
    thr = spark.createDataFrame(
        [(int(v),) for v in _STUMP_THRESHOLDS], "thr bigint"
    )
    cand = (
        q.crossJoin(F.broadcast(thr))
        .groupBy("dim_idx", "thr")
        .agg(
            F.sum(F.when(F.col("x") <= F.col("thr"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_l"),
            F.sum(F.when(F.col("x") <= F.col("thr"), F.col("y")).otherwise(0))
            .cast("bigint")
            .alias("p_l"),
            F.sum(F.when(F.col("x") > F.col("thr"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_r"),
            F.sum(F.when(F.col("x") > F.col("thr"), F.col("y")).otherwise(0))
            .cast("bigint")
            .alias("p_r"),
        )
    )
    gini_side = (
        "(case when {n} > 0 then 1000000"
        " - ({p} * {p} + ({n} - {p}) * ({n} - {p})) * 1000000"
        " div ({n} * {n}) else 0 end)"
    )
    gl = gini_side.format(n="n_l", p="p_l")
    gr = gini_side.format(n="n_r", p="p_r")
    return (
        cand.select(
            "dim_idx",
            "thr",
            "n_l",
            "p_l",
            "n_r",
            "p_r",
            F.expr(
                f"cast((n_l * {gl} + n_r * {gr}) div (n_l + n_r) as bigint)"
            ).alias("gini_ppm"),
        )
        .orderBy("gini_ppm", "dim_idx", "thr")
        .limit(5)
    )


def _perceptron_oracle() -> str:
    from datagouv_tools_spark.operators.perceptron import (
        perceptron_oracle_sql,
    )

    return perceptron_oracle_sql(0, 4, 64)


@query("emb_perceptron_train", _perceptron_oracle())
def emb_perceptron_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A genuinely TRAINED linear classifier (operators/perceptron.py):
    four batch-perceptron rounds, one-vs-rest for label 0, in pure
    integer arithmetic — quantized features, ±1 labels, mistake-driven
    Σ y·x updates, no division anywhere — so the full training
    trajectory (per-round misclassification counts and weight L1 mass)
    value-hash-matches the DuckDB replay. Complements doc_quality_logit
    (a pinned-weight scorer) with actual distributed learning.

    Scale: per round one dim-sized weight broadcast, map-local scores,
    and one (dim)-combined update aggregation; only dim ints cross the
    driver between rounds."""
    from datagouv_tools_spark.operators.perceptron import perceptron_train

    emb = t(spark, sf_dir, "embeddings")
    _, stats = perceptron_train(emb, positive_label=0, iters=4, dim=64)
    return spark.createDataFrame(
        [(s["round"], s["n_misclassified"], s["w_l1_after"]) for s in stats],
        "round bigint, n_misclassified bigint, w_l1_after bigint",
    ).orderBy("round")


def _kmeans_oracle() -> str:
    from datagouv_tools_spark.operators.kmeans import kmeans_oracle_sql

    return kmeans_oracle_sql(8, 2, 64)


@query("emb_kmeans_clusters", _kmeans_oracle())
def emb_kmeans_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed Lloyd k-means (operators/kmeans.py): k=8, two update
    rounds plus a final assignment, ENTIRELY in integer fixed point —
    milli-quantized vectors, integer squared distances, smallest-cid
    tie-breaks, sign-magnitude centroid means — so the iterative
    clustering result (sizes, inertia, centroid L1 mass) hash-matches
    the DuckDB replay exactly. Deterministic init: the 8 smallest
    vec_ids.

    Scale: assignment never explodes (vec × centroid) rows — the k
    candidate distances are a map-local array_min over a one-row
    broadcast centroid singleton; only (cid, dim) partial sums shuffle
    for the update, and the k·dim centroid state chains between rounds
    as broadcast-exchange subqueries — after init it never visits the
    driver."""
    from datagouv_tools_spark.operators.kmeans import kmeans_fixed_point

    emb = t(spark, sf_dir, "embeddings")
    cents, final = kmeans_fixed_point(emb, k=8, iters=2, dim=64)
    cl1 = cents.select(
        "cid",
        F.aggregate(
            F.col("c"), F.lit(0).cast("bigint"), lambda acc, v: acc + F.abs(v)
        ).alias("c_l1"),
    )
    return (
        final.groupBy("cid")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_vecs"),
            F.sum("dist").cast("bigint").alias("inertia"),
        )
        .join(cl1, "cid")
        .select(
            F.col("cid").alias("cluster_id"), "n_vecs", "inertia", "c_l1"
        )
        .orderBy("cluster_id")
    )


def _mmr_oracle(k: int = 5, n_cand: int = 20) -> str:
    """DuckDB twin of the MMR query: identical candidate cut, identical
    greedy recurrence unrolled k rounds, identical round-before-max and
    round-after-blend arithmetic, identical (score desc, id) ties."""
    cos = (
        "ROUND(list_dot_product({a}, {b})"
        " / (sqrt(list_dot_product({a}, {a}))"
        " * sqrt(list_dot_product({b}, {b}))), 6)"
    )
    head = f"""
    WITH q AS (
      SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0
    ),
    c0 AS (
      SELECT vec_id, v, rel FROM (
        SELECT e.vec_id, CAST(e.embedding AS DOUBLE[]) AS v,
               {cos.format(a="CAST(e.embedding AS DOUBLE[])", b="q.qv")} AS rel
        FROM embeddings e CROSS JOIN q
        WHERE e.vec_id > 0
      ) ORDER BY rel DESC, vec_id LIMIT {n_cand}
    ),
    s1 AS (
      SELECT 1 AS rank, vec_id, v, rel, ROUND(0.7 * rel, 6) AS score
      FROM c0 ORDER BY rel DESC, vec_id LIMIT 1
    )"""
    rounds = []
    for r in range(2, k + 1):
        prev = f"s{r - 1}"
        rounds.append(
            f""",
    m{r} AS (
      SELECT c.vec_id, c.v, c.rel,
             MAX({cos.format(a="c.v", b="s.v")}) AS ms
      FROM c0 c CROSS JOIN {prev} s
      WHERE c.vec_id NOT IN (SELECT vec_id FROM {prev})
      GROUP BY c.vec_id, c.v, c.rel
    ),
    p{r} AS (
      SELECT {r} AS rank, vec_id, v, rel,
             ROUND(0.7 * rel - 0.3 * ms, 6) AS score
      FROM m{r} ORDER BY score DESC, vec_id LIMIT 1
    ),
    s{r} AS (SELECT * FROM {prev} UNION ALL SELECT * FROM p{r})"""
        )
    tail = f"""
    SELECT rank, vec_id, rel, score FROM s{k} ORDER BY rank"""
    return head + "".join(rounds) + tail


@query("emb_mmr_rerank", _mmr_oracle())
def emb_mmr_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Diversity-aware top-k (operators/retrieval.mmr_rerank): the
    vec_id-0 query's top-20 cosine candidates re-ranked by Maximal
    Marginal Relevance (λ=0.7, k=5) — each greedy round trades
    relevance against the pick's maximum similarity to what's already
    selected, the standard redundancy cut after any ANN/BM25 stage.
    The DuckDB oracle unrolls the identical five rounds, so every pick
    and blended score is value-hash-checked.

    Scale: the corpus appears ONLY in the candidate cut (one broadcast-
    query scan + TakeOrdered-20, same shape as emb_cosine_topk); the
    greedy rounds touch the bounded candidate set joined against a
    ≤k-row broadcast — constant work regardless of corpus size."""
    from datagouv_tools_spark.functions.vectors import cosine
    from datagouv_tools_spark.operators.retrieval import mmr_rerank

    emb = t(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    qv = emb.filter(F.col("vec_id") == 0).select(
        F.lit(1).alias("__one"), F.col("v").alias("__qv")
    )
    cands = (
        emb.filter(F.col("vec_id") > 0)
        .withColumn("__one", F.lit(1))
        .join(F.broadcast(qv), "__one")
        .select("vec_id", "v", F.round(cosine("v", "__qv"), 6).alias("rel"))
        .orderBy(F.desc("rel"), "vec_id")
        .limit(20)
        .localCheckpoint()
    )
    return mmr_rerank(cands, "vec_id", "v", "rel", k=5, lam=0.7).orderBy(
        "rank"
    )


@query(
    "emb_dedup_threshold_sweep",
    """
    WITH c AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS embedding FROM embeddings
    ),
    p AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             ROUND(list_dot_product(a.embedding, b.embedding)
                   / (sqrt(list_dot_product(a.embedding, a.embedding))
                      * sqrt(list_dot_product(b.embedding, b.embedding))), 6)
               AS sim
      FROM c a JOIN c b ON a.vec_id < b.vec_id
    ),
    kept AS (SELECT * FROM p WHERE sim >= 0.3),
    buckets AS (
      SELECT CAST(floor(sim * 10) AS BIGINT) AS thresh_deci,
             CAST(COUNT(*) AS BIGINT) AS n_pairs,
             BIT_XOR(('0x' || substr(md5(id_a::VARCHAR || ':' || id_b::VARCHAR), 1, 15))::BIGINT)
               AS pair_xor
      FROM kept GROUP BY 1
    )
    SELECT thresh_deci, n_pairs,
           CAST(SUM(n_pairs) OVER (ORDER BY thresh_deci DESC
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             AS n_at_or_above,
           pair_xor
    FROM buckets
    ORDER BY thresh_deci DESC
    """,
)
def emb_dedup_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup threshold tuning in ONE pass: every cosine pair ≥0.3
    (exact distributed block-matrix kernel) bucketed by similarity
    decile, with the reverse-cumulative pair count — the
    "pairs you would merge at each threshold" curve that picks the
    operating point BEFORE anyone runs the expensive full dedup at the
    wrong cutoff. Per-bucket pair_xor pins the exact membership of
    every band.

    Scale: the pair generation is the same blocked BLAS kernel as
    emb_near_dup_pairs (block pairs fan out, no corpus broadcast);
    the sweep itself adds one bounded aggregation + a 7-row window.
    One pass serves every candidate threshold — a per-threshold rerun
    would scan the corpus O(|grid|) times."""
    from pyspark.sql.window import Window

    from datagouv_tools_spark.operators.similarity import cosine_pairs_blocked

    emb = t(spark, sf_dir, "embeddings")
    pairs = cosine_pairs_blocked(emb, "vec_id", "embedding", threshold=0.3)
    buckets = (
        pairs.select(
            F.floor(F.col("sim") * 10).cast("bigint").alias("thresh_deci"),
            "id_a",
            "id_b",
        )
        .groupBy("thresh_deci")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
            F.expr(
                "bit_xor(cast(conv(substring(md5(concat_ws(':', id_a, id_b)), 1, 15), 16, 10) as bigint))"
            ).alias("pair_xor"),
        )
    )
    w = Window.orderBy(F.desc("thresh_deci")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        buckets.select(
            "thresh_deci",
            "n_pairs",
            F.sum("n_pairs").over(w).cast("bigint").alias("n_at_or_above"),
            "pair_xor",
        )
        .orderBy(F.desc("thresh_deci"))
    )


def _semantic_dedup_oracle() -> str:
    from datagouv_tools_spark.operators.kmeans import kmeans_assign_cte_sql

    # cos(a,b) >= 0.40  ⟺  dot > 0 AND dot²·10⁴ ≥ 1600·‖a‖²·‖b‖² — all
    # in int64: |x| ≤ 0.53 ⇒ |xq| ≤ 530 ⇒ dot ≤ 64·530² ≈ 1.8e7,
    # dot²·10⁴ ≈ 3.2e18 < 2⁶³. list_inner_product sums 64 products each
    # ≤ 2.8e5 — exactly representable in double, so the BIGINT cast is
    # exact.
    return (
        kmeans_assign_cte_sql(8, 2, 64)
        + """,
    vq AS (
      SELECT a3.vec_id, a3.cid,
             list(q.x ORDER BY q.i) AS xq,
             CAST(SUM(q.x * q.x) AS BIGINT) AS nn
      FROM a3 JOIN q USING (vec_id)
      GROUP BY a3.vec_id, a3.cid
    ),
    dup AS (
      SELECT DISTINCT b.cid, b.vec_id
      FROM vq a JOIN vq b
        ON a.cid = b.cid AND a.vec_id < b.vec_id
      WHERE CAST(list_inner_product(a.xq, b.xq) AS BIGINT) > 0
        AND CAST(list_inner_product(a.xq, b.xq) AS BIGINT)
            * CAST(list_inner_product(a.xq, b.xq) AS BIGINT) * 10000
            >= 1600 * a.nn * b.nn
    ),
    dstat AS (
      SELECT cid, CAST(COUNT(*) AS BIGINT) AS n_dupes,
             CAST(SUM(vec_id) AS BIGINT) AS dup_id_sum
      FROM dup GROUP BY cid
    )
    SELECT v.cid AS cluster_id,
           CAST(COUNT(*) AS BIGINT) AS n_vecs,
           CAST(COALESCE(MAX(d.n_dupes), 0) AS BIGINT) AS n_dupes,
           CAST(COUNT(*) - COALESCE(MAX(d.n_dupes), 0) AS BIGINT)
             AS n_kept,
           CAST(COALESCE(MAX(d.dup_id_sum), 0) AS BIGINT) AS dup_id_sum
    FROM vq v LEFT JOIN dstat d ON v.cid = d.cid
    GROUP BY v.cid
    ORDER BY cluster_id"""
    )


@query("emb_semantic_dedup", _semantic_dedup_oracle())
def emb_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540) composed end to
    end: k-means the embedding corpus (operators/kmeans.py, fixed-point
    Lloyd, k=8, 2 rounds), then WITHIN each cluster mark every vector
    that has a lower-id neighbor with cos ≥ 0.40 as a semantic
    duplicate (min-id canonical keep — the deterministic analog of the
    paper's keep-one-per-ε-ball). The cosine test is exact integer
    arithmetic on milli-quantized vectors (dot²·10⁴ ≥ 1600·n_a·n_b with
    dot > 0 — no sqrt, no float), so per-cluster sizes, dup counts, and
    the dup-id checksum value-hash-match the DuckDB replay of the whole
    pipeline.

    Scale: clustering is the whole point — pair generation is an
    equi-join on cluster id, never a corpus cross; the paper's regime
    uses k ≈ √N clusters so cluster sizes (and the per-cluster pair
    quadratic) stay bounded as the corpus grows, and the join key count
    grows with k, avoiding skew. Here k=8 pins the tiny-fixture
    contract; production swaps k, nothing else."""
    from datagouv_tools_spark.operators.kmeans import kmeans_fixed_point

    emb = t(spark, sf_dir, "embeddings")
    _, final = kmeans_fixed_point(emb, k=8, iters=2, dim=64)
    xq = F.transform(
        F.col("embedding"),
        lambda v: F.round(v.cast("double") * 1000, 0).cast("bigint"),
    )
    q = emb.select("vec_id", xq.alias("xq"))
    v = (
        final.select("vec_id", "cid")
        .join(q, "vec_id")
        .select(
            "cid",
            "vec_id",
            "xq",
            F.aggregate(
                F.zip_with(
                    F.col("xq"), F.col("xq"), lambda a, b: a * b
                ),
                F.lit(0).cast("bigint"),
                lambda acc, x: acc + x,
            ).alias("nn"),
        )
        .localCheckpoint(eager=True)
    )
    # within-cluster verify as an Arrow integer-matmul kernel: one
    # G = X·Xᵀ per cluster group replaces ~|cluster|²/2 codegen
    # zip_with dot products (measured 8.3 s → ~4 s at sf0.1); int64
    # matmul is exact (dot ≤ 1.8e7, dot²·10⁴ ≤ 3.2e18 < 2⁶³)
    def _cluster_dups(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        order = np.argsort(pdf["vec_id"].to_numpy())
        ids = pdf["vec_id"].to_numpy()[order]
        X = np.array(list(pdf["xq"].to_numpy()[order]), dtype=np.int64)
        G = X @ X.T
        nn = np.diag(G)
        dup_mask = np.zeros(len(ids), dtype=bool)
        cond = (G > 0) & (G * G * 10000 >= 1600 * np.outer(nn, nn))
        iu = np.triu_indices(len(ids), k=1)
        rows, cols = iu
        hit = cond[rows, cols]
        dup_mask[np.unique(cols[hit])] = True
        return pd.DataFrame(
            {
                "cid": pdf["cid"].iloc[:1].repeat(int(dup_mask.sum())),
                "vec_id": ids[dup_mask],
            }
        )

    dup = v.groupBy("cid").applyInPandas(
        _cluster_dups, "cid bigint, vec_id bigint"
    )
    dstat = dup.groupBy("cid").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_dupes"),
        F.sum("vec_id").cast("bigint").alias("dup_id_sum"),
    )
    return (
        v.groupBy("cid")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_vecs"))
        .join(dstat, "cid", "left")
        .select(
            F.col("cid").alias("cluster_id"),
            "n_vecs",
            F.coalesce("n_dupes", F.lit(0).cast("bigint")).alias("n_dupes"),
            (
                F.col("n_vecs")
                - F.coalesce("n_dupes", F.lit(0).cast("bigint"))
            )
            .cast("bigint")
            .alias("n_kept"),
            F.coalesce("dup_id_sum", F.lit(0).cast("bigint")).alias(
                "dup_id_sum"
            ),
        )
        .orderBy("cluster_id")
    )


def _kcenter_oracle() -> str:
    return """
    WITH RECURSIVE v AS (
      SELECT vec_id,
             list_transform(embedding,
               x -> CAST(ROUND(CAST(x AS DOUBLE)*1000, 0) AS BIGINT)) AS xq
      FROM embeddings
    ),
    dist AS (
      SELECT a.vec_id AS va, b.vec_id AS vb,
             CAST(list_inner_product(
               list_transform(range(64), i -> a.xq[i+1] - b.xq[i+1]),
               list_transform(range(64), i -> a.xq[i+1] - b.xq[i+1]))
               AS BIGINT) AS d2
      FROM v a JOIN v b ON a.vec_id <> b.vec_id
    ),
    sel AS (
      SELECT 1 AS r, [ (SELECT MIN(vec_id) FROM v) ] AS ids,
             (SELECT MIN(vec_id) FROM v) AS pick, CAST(0 AS BIGINT) AS d2
      UNION ALL
      SELECT s.r + 1, list_append(s.ids, p.pick), p.pick, p.d2
      FROM sel s, LATERAL (
        SELECT va AS pick, MIN(d2) AS d2
        FROM dist
        WHERE list_contains(s.ids, vb) AND NOT list_contains(s.ids, va)
        GROUP BY va
        ORDER BY MIN(d2) DESC, va
        LIMIT 1
      ) p
      WHERE s.r < 8
    )
    SELECT r AS sel_rank, pick AS vec_id, d2 AS d2_at_pick
    FROM sel ORDER BY sel_rank"""


@query("emb_kcenter_coreset", _kcenter_oracle())
def emb_kcenter_coreset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy k-center (Gonzalez farthest-point) CORESET selection —
    the diversity-sampling primitive for training-data subset picking:
    start from the smallest vec_id, then 7 times add the vector
    farthest (integer squared distance on milli-quantized coords, ties
    to smallest id) from everything selected so far. Each pick's
    distance-to-set is the 2-approximation certificate of the k-center
    radius. The DuckDB twin replays the identical greedy order with a
    WITH RECURSIVE selection over the pair-distance relation.

    Scale: each of the k rounds is one corpus scan — a map-local
    array_min over the ≤k-entry center set inlined as a nested-array
    LITERAL (k·d bigints ≤ a few thousand for coreset-sized k — well
    inside janino limits, and it deletes the per-round LocalRelation
    broadcast + BNLJ crossJoin the values-as-data form paid: measured
    in-session 7.0 → 5.7 s min-of-3 at sf0.1) followed by a
    TakeOrdered(1); no pair materialization, no shuffle beyond the
    top-1. k scans of 100 TB is the known lower bound for exact greedy
    k-center; sketch variants subsample between rounds, same plan
    shape."""
    emb = t(spark, sf_dir, "embeddings")
    xq = F.transform(
        F.col("embedding"),
        lambda v: F.round(v.cast("double") * 1000, 0).cast("bigint"),
    )
    q = emb.select("vec_id", xq.alias("xq")).localCheckpoint(eager=True)
    first = q.orderBy("vec_id").limit(1).collect()[0]
    picks = [(1, int(first.vec_id), 0)]
    centers = [[int(x) for x in first.xq]]
    for r in range(2, 9):
        # one expr round-trip for the (r-1)x64 center literal matrix;
        # the nested F.lit loop cost ~1.5k py4j calls per round
        cands = lit_bigint_matrix(centers)
        mind = F.array_min(
            F.transform(
                cands,
                lambda c: F.aggregate(
                    F.zip_with(
                        F.col("xq"), c, lambda a, b: (a - b) * (a - b)
                    ),
                    F.lit(0).cast("bigint"),
                    lambda acc, x: acc + x,
                ),
            )
        )
        chosen = [p[1] for p in picks]
        row = (
            q.filter(~F.col("vec_id").isin(chosen))
            .select("vec_id", "xq", mind.alias("mind"))
            .orderBy(F.desc("mind"), F.asc("vec_id"))
            .limit(1)
            .collect()[0]
        )
        picks.append((r, int(row.vec_id), int(row.mind)))
        centers.append([int(x) for x in row.xq])
    return spark.createDataFrame(
        picks, "sel_rank int, vec_id bigint, d2_at_pick bigint"
    ).orderBy("sel_rank")


@query(
    "emb_hard_negatives",
    """
    WITH q AS (
      SELECT vec_id,
             list_transform(embedding,
               x -> CAST(ROUND(CAST(x AS DOUBLE)*1000, 0) AS BIGINT)) AS xq,
             label
      FROM embeddings
    ),
    anchors AS (SELECT * FROM q WHERE vec_id < 10),
    d AS (
      SELECT a.vec_id AS anchor_id, a.label AS anchor_label,
             c.vec_id, c.label,
             CAST(list_inner_product(
               list_transform(range(64), i -> a.xq[i+1] - c.xq[i+1]),
               list_transform(range(64), i -> a.xq[i+1] - c.xq[i+1]))
               AS BIGINT) AS d2
      FROM anchors a JOIN q c ON c.vec_id <> a.vec_id
    ),
    hp AS (
      SELECT anchor_id, vec_id AS hard_pos_id, d2 AS hard_pos_d2
      FROM (SELECT anchor_id, vec_id, d2,
                   ROW_NUMBER() OVER (PARTITION BY anchor_id
                     ORDER BY d2 DESC, vec_id) AS rk
            FROM d WHERE label = anchor_label) WHERE rk = 1
    ),
    hn AS (
      SELECT anchor_id, vec_id AS hard_neg_id, d2 AS hard_neg_d2
      FROM (SELECT anchor_id, vec_id, d2,
                   ROW_NUMBER() OVER (PARTITION BY anchor_id
                     ORDER BY d2 ASC, vec_id) AS rk
            FROM d WHERE label <> anchor_label) WHERE rk = 1
    )
    SELECT hp.anchor_id, hp.hard_pos_id, hp.hard_pos_d2,
           hn.hard_neg_id, hn.hard_neg_d2,
           CAST(hp.hard_pos_d2 - hn.hard_neg_d2 AS BIGINT) AS violation
    FROM hp JOIN hn USING (anchor_id)
    ORDER BY anchor_id
    """,
)
def emb_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRIPLET MINING for contrastive training: per anchor the hardest
    positive (farthest same-label vector) and hardest negative (nearest
    different-label vector) in exact integer squared distance, plus the
    margin violation (pos_d2 − neg_d2; positive = the triplet the loss
    actually learns from). Deterministic tie-breaks to the smallest
    vec_id.

    Scale: the 10 anchors broadcast; distances are ONE map-local pass
    over the corpus (no pair shuffle) and the per-anchor argmax/argmin
    reduce as a 20-row aggregate — the same TakeOrdered shape as the
    ANN search path, so mining scales to any corpus the scan does."""
    emb = t(spark, sf_dir, "embeddings")
    xq = F.transform(
        F.col("embedding"),
        lambda v: F.round(v.cast("double") * 1000, 0).cast("bigint"),
    )
    q = emb.select("vec_id", xq.alias("xq"), "label")
    anchors = q.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("anchor_id"),
        F.col("xq").alias("aq"),
        F.col("label").alias("anchor_label"),
    )
    d2 = F.aggregate(
        F.zip_with(F.col("aq"), F.col("xq"), lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )
    d = (
        q.crossJoin(F.broadcast(anchors))
        .filter(F.col("vec_id") != F.col("anchor_id"))
        .select(
            "anchor_id",
            "anchor_label",
            "vec_id",
            "label",
            d2.alias("d2"),
        )
    )
    hp = (
        d.filter(F.col("label") == F.col("anchor_label"))
        .groupBy("anchor_id")
        .agg(
            F.max(F.struct(F.col("d2"), (-F.col("vec_id")).alias("nv"))).alias(
                "m"
            )
        )
        .select(
            "anchor_id",
            (-F.col("m.nv")).cast("bigint").alias("hard_pos_id"),
            F.col("m.d2").alias("hard_pos_d2"),
        )
    )
    hn = (
        d.filter(F.col("label") != F.col("anchor_label"))
        .groupBy("anchor_id")
        .agg(F.min(F.struct("d2", "vec_id")).alias("m"))
        .select(
            "anchor_id",
            F.col("m.vec_id").alias("hard_neg_id"),
            F.col("m.d2").alias("hard_neg_d2"),
        )
    )
    return (
        hp.join(hn, "anchor_id")
        .select(
            "anchor_id",
            "hard_pos_id",
            "hard_pos_d2",
            "hard_neg_id",
            "hard_neg_d2",
            (F.col("hard_pos_d2") - F.col("hard_neg_d2"))
            .cast("bigint")
            .alias("violation"),
        )
        .orderBy("anchor_id")
    )


def _ivf_recall_curve_oracle() -> str:
    head = """
    WITH c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS embedding FROM embeddings),
    cent0 AS (
      SELECT vec_id, embedding,
             ('0x' || substr(md5(vec_id::VARCHAR || '-42'), 1, 15))::BIGINT AS h
      FROM c ORDER BY h ASC, vec_id ASC LIMIT 16
    ),
    cent AS (
      SELECT ROW_NUMBER() OVER (ORDER BY h, vec_id) - 1 AS list_id,
             list_transform(embedding,
                 x -> x / sqrt(list_dot_product(embedding, embedding))) AS cv
      FROM cent0
    ),
    sims AS (
      SELECT c.vec_id, cent.list_id,
             ROUND(list_dot_product(c.embedding, cent.cv)
                   / sqrt(list_dot_product(c.embedding, c.embedding)), 6)
               AS csim
      FROM c, cent
    ),
    ranked AS (
      SELECT vec_id, list_id,
             ROW_NUMBER() OVER (PARTITION BY vec_id
                                ORDER BY csim DESC, list_id) AS crk
      FROM sims
    ),
    lists AS (SELECT vec_id, list_id FROM ranked WHERE crk = 1),
    exact AS (
      SELECT q.vec_id AS query_id, e.vec_id,
             ROW_NUMBER() OVER (PARTITION BY q.vec_id ORDER BY
               ROUND(list_dot_product(q.embedding, e.embedding)
                 / (sqrt(list_dot_product(q.embedding, q.embedding))
                    * sqrt(list_dot_product(e.embedding, e.embedding))), 6)
               DESC, e.vec_id) AS rk
      FROM c q JOIN c e ON e.vec_id <> q.vec_id
      WHERE q.vec_id < 10
    ),
    ex5 AS (SELECT query_id, vec_id FROM exact WHERE rk <= 5)"""
    parts = []
    sel = []
    for np_ in (1, 2, 4, 8):
        parts.append(f""",
    p{np_} AS (
      SELECT pr.vec_id AS query_id, a.vec_id,
             ROW_NUMBER() OVER (PARTITION BY pr.vec_id ORDER BY
               ROUND(list_dot_product(q.embedding, e.embedding)
                 / (sqrt(list_dot_product(q.embedding, q.embedding))
                    * sqrt(list_dot_product(e.embedding, e.embedding))), 6)
               DESC, a.vec_id) AS rk
      FROM (SELECT vec_id, list_id FROM ranked
            WHERE vec_id < 10 AND crk <= {np_}) pr
      JOIN lists a ON a.list_id = pr.list_id AND a.vec_id <> pr.vec_id
      JOIN c q ON q.vec_id = pr.vec_id
      JOIN c e ON e.vec_id = a.vec_id
    ),
    h{np_} AS (
      SELECT CAST({np_} AS BIGINT) AS nprobe,
             CAST(COUNT(*) AS BIGINT) AS n_hits
      FROM (SELECT query_id, vec_id FROM p{np_} WHERE rk <= 5) t
      JOIN ex5 USING (query_id, vec_id)
    )""")
        sel.append(f"SELECT nprobe, n_hits FROM h{np_}")
    union = "\n    UNION ALL\n    ".join(sel)
    return (
        head
        + "".join(parts)
        + f"""
    SELECT nprobe, n_hits,
           CAST(n_hits * 1000 // 50 AS BIGINT) AS recall_mille
    FROM ({union})
    ORDER BY nprobe"""
    )


@query("emb_ivf_recall_curve", _ivf_recall_curve_oracle())
def emb_ivf_recall_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ANN quality/cost TRADEOFF, measured: recall@5 of IVF search
    against the exact brute-force top-5 as nprobe sweeps 1→8 of 16
    lists (10 query vectors, 50 truth pairs). Every stage — centroid
    sampling, list assignment, probe ranking, rerank, and the exact
    baseline — is deterministic, so the whole recall CURVE value-hash
    matches the DuckDB replay; this is the artifact that picks nprobe
    for a latency budget instead of folklore.

    Scale (r8): ONE IVF pass serves the whole sweep — probes for
    nprobe=p are exactly the first p of the nprobe=8 fan-out, so the
    corpus is list-assigned once, joined against the 8-probe query fan
    once (each candidate pair tagged with its probe RANK), and every
    sweep point is a rank-filtered slice ranked by one
    (nprobe, query)-partitioned window. Was 4 ivf_topk passes (each
    with its own centroid job); now 1 centroid job + 1 assigned-corpus
    scan + the exact-baseline scan. Per point the candidate work is
    still ~nprobe/16 of the corpus (the IVF bargain); the recall join
    is 50 truth rows against ≤50 result rows per point. Production
    sweeps the persisted index (emb_ivfpq_topk_indexed) the same way
    without re-clustering.

    Precondition: each sweep point must yield ≥1 candidate pair (true
    at every real SF: probe 1 always contains the query's own rank-1
    list). A degenerate corpus where some nprobe produced ZERO rows
    would drop that sweep row from the groupBy, where the pre-r8
    per-point aggregation emitted recall 0 — same caveat class as
    events_value_deciles_sketch's empty-sample guard."""
    from pyspark.sql.window import Window

    from datagouv_tools_spark.functions.vectors import cosine
    from datagouv_tools_spark.operators.similarity import (
        _ivf_centroids,
        _probe_lists,
        cosine_topk,
        ivf_assign,
    )

    emb = t(spark, sf_dir, "embeddings")
    queries_df = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    ex5 = cosine_topk(queries_df, emb, k=5).select(
        "query_id", "vec_id", F.lit(1).alias("__hit")
    )
    corpus = emb.select("vec_id", "embedding")
    cents = _ivf_centroids(corpus, "vec_id", "embedding", 16, 42)
    corpus_l = ivf_assign(
        corpus, "embedding", 16, 42, cents=cents, id_col="vec_id"
    )
    q8 = _probe_lists(queries_df, "query_vec", cents, n=8, rank_col="__prk")
    pairs = (
        F.broadcast(q8)
        .join(corpus_l, "__list")
        .filter(F.col("query_id") != F.col("vec_id"))
        .select(
            "query_id",
            "vec_id",
            "__prk",
            F.round(cosine("query_vec", "embedding"), 6).alias("sim"),
        )
    )
    # each sweep point = the candidates whose list ranks within nprobe
    tall = pairs.select(
        "query_id",
        "vec_id",
        "sim",
        F.explode(
            F.filter(
                F.array(*[F.lit(p) for p in (1, 2, 4, 8)]),
                lambda p: p >= F.col("__prk"),
            )
        ).alias("nprobe"),
    )
    w = Window.partitionBy("nprobe", "query_id").orderBy(
        F.desc("sim"), F.asc("vec_id")
    )
    got = (
        tall.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 5)
        .select("nprobe", "query_id", "vec_id")
    )
    return (
        got.join(F.broadcast(ex5), ["query_id", "vec_id"], "left")
        .groupBy(F.col("nprobe").cast("bigint").alias("nprobe"))
        .agg(F.count("__hit").cast("bigint").alias("n_hits"))
        .select(
            "nprobe",
            "n_hits",
            F.expr("cast(n_hits * 1000 div 50 as bigint)").alias(
                "recall_mille"
            ),
        )
        .orderBy("nprobe")
    )


def _matryoshka_oracle() -> str:
    head = """
    WITH c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS embedding
               FROM embeddings),
    exact AS (
      SELECT q.vec_id AS query_id, e.vec_id,
             ROW_NUMBER() OVER (PARTITION BY q.vec_id ORDER BY
               ROUND(list_dot_product(q.embedding, e.embedding)
                 / (sqrt(list_dot_product(q.embedding, q.embedding))
                    * sqrt(list_dot_product(e.embedding, e.embedding))), 6)
               DESC, e.vec_id) AS rk
      FROM c q JOIN c e ON e.vec_id <> q.vec_id
      WHERE q.vec_id < 10
    ),
    ex5 AS (SELECT query_id, vec_id FROM exact WHERE rk <= 5)"""
    parts, sel = [], []
    for d in (8, 16, 32, 64):
        parts.append(f""",
    t{d} AS (
      SELECT q.vec_id AS query_id, e.vec_id,
             ROW_NUMBER() OVER (PARTITION BY q.vec_id ORDER BY
               ROUND(list_dot_product(q.s, e.s)
                 / (sqrt(list_dot_product(q.s, q.s))
                    * sqrt(list_dot_product(e.s, e.s))), 6)
               DESC, e.vec_id) AS rk
      FROM (SELECT vec_id, list_slice(embedding, 1, {d}) AS s FROM c) q
      JOIN (SELECT vec_id, list_slice(embedding, 1, {d}) AS s FROM c) e
        ON e.vec_id <> q.vec_id
      WHERE q.vec_id < 10
    ),
    h{d} AS (
      SELECT CAST({d} AS BIGINT) AS n_dims,
             CAST(COUNT(*) AS BIGINT) AS n_hits
      FROM (SELECT query_id, vec_id FROM t{d} WHERE rk <= 5) t
      JOIN ex5 USING (query_id, vec_id)
    )""")
        sel.append(f"SELECT n_dims, n_hits FROM h{d}")
    union = "\n    UNION ALL\n    ".join(sel)
    return (
        head
        + "".join(parts)
        + f"""
    SELECT n_dims, n_hits,
           CAST(n_hits * 1000 // 50 AS BIGINT) AS recall_mille
    FROM ({union})
    ORDER BY n_dims"""
    )


@query("emb_matryoshka_recall", _matryoshka_oracle())
def emb_matryoshka_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DIMENSION-TRUNCATION tradeoff, measured (the Matryoshka / MRL
    question): recall@5 of exact cosine search using only the first
    8/16/32/64 dimensions against full-dimension truth — the curve
    that decides how many dims a serving index actually stores. Every
    point is deterministic (rounded cosine, vec_id tie-breaks), so the
    curve value-hash-matches the DuckDB replay.

    Scale (r8): ONE corpus pass — all four prefix-dim cosines are
    computed per pair in the same select and exploded into a
    (n_dims, query_id) tall frame, so one window exchange ranks all
    four curves at once (|Q|·|D|-bounded groups, never
    corpus-partitioned). Prefix NORMS are precomputed per ROW (once
    per corpus/query vector, not per pair), so per-pair work is just
    the four prefix dots; each dot accumulates sequentially over
    element_at — bit-identical to dot-of-slice and to DuckDB's
    list_dot_product fold, keeping the rounded-to-6 hash exact. The
    64-dim prefix IS the full-dimension truth, so exact top-5 falls
    out of the same pass; the ≤|D|·|Q|·k-row top table is pinned
    (localCheckpoint) before the recall self-join. Was 5 sequential
    cosine_topk corpus scans."""
    from pyspark.sql.window import Window

    dims = (8, 16, 32, 64)

    # every per-dim expression renders as ONE parsed SQL string
    # (functions/litfast rationale): the Column-op loops here cost ~3k
    # py4j round-trips per build for identical expression trees

    def _prefix_dot(a: str, b: str, d: int) -> str:
        # sequential fold i=1..d of double products: the exact
        # accumulation order of dot(slice(a,1,d), slice(b,1,d))
        return (
            f"aggregate(sequence(1, {d}), CAST(0.0 AS DOUBLE),"
            f" (acc, i) -> acc + CAST(element_at({a}, i) AS DOUBLE)"
            f" * CAST(element_at({b}, i) AS DOUBLE))"
        )

    def _with_prefix_norms(df: DataFrame, vec: str, prefix: str) -> DataFrame:
        def _norm(d: int) -> str:
            sliced = f"slice({vec}, 1, {d})"
            return (
                f"sqrt(aggregate(zip_with({sliced}, {sliced},"
                " (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),"
                " CAST(0.0 AS DOUBLE), (acc, x) -> acc + x))"
            )

        return df.select(
            "*",
            *[F.expr(_norm(d)).alias(f"{prefix}{d}") for d in dims],
        )

    emb = t(spark, sf_dir, "embeddings")
    queries_df = _with_prefix_norms(
        emb.filter(F.col("vec_id") < 10).select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("query_vec"),
        ),
        "query_vec",
        "qn",
    )
    corpus = _with_prefix_norms(
        emb.select("vec_id", "embedding"), "embedding", "en"
    )
    pairs = (
        F.broadcast(queries_df)
        .crossJoin(corpus)
        .filter(F.col("query_id") != F.col("vec_id"))
    )

    def _sim(d: int) -> str:
        dp = _prefix_dot("query_vec", "embedding", d)
        return (
            f"CASE WHEN (qn{d} > 0) AND (en{d} > 0)"
            f" THEN round({dp} / (qn{d} * en{d}), 6) END"
        )

    sims = F.expr(
        "array("
        + ",".join(
            f"named_struct('n_dims', CAST({d} AS BIGINT), 'sim', {_sim(d)})"
            for d in dims
        )
        + ")"
    )
    tall = pairs.select(
        "query_id", "vec_id", F.explode(sims).alias("s")
    ).select("query_id", "vec_id", "s.n_dims", "s.sim")
    w = Window.partitionBy("n_dims", "query_id").orderBy(
        F.desc("sim"), F.asc("vec_id")
    )
    top = (
        tall.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 5)
        .select("n_dims", "query_id", "vec_id")
        .localCheckpoint()  # ≤|D|·|Q|·k rows; both join sides read it
    )
    ex5 = top.filter(F.col("n_dims") == 64).select(
        "query_id", "vec_id", F.lit(1).alias("__hit")
    )
    return (
        top.join(F.broadcast(ex5), ["query_id", "vec_id"], "left")
        .groupBy("n_dims")
        .agg(F.count("__hit").cast("bigint").alias("n_hits"))
        .select(
            "n_dims",
            "n_hits",
            F.expr("cast(n_hits * 1000 div 50 as bigint)").alias(
                "recall_mille"
            ),
        )
        .orderBy("n_dims")
    )


def _calibration_oracle() -> str:
    from datagouv_tools_spark.operators.perceptron import perceptron_cte_sql

    return (
        perceptron_cte_sql(0, 4, 64)
        + """,
    sc AS (
      SELECT q.vec_id, ANY_VALUE(q.y) AS y,
             CAST(SUM(q.x * w.w) AS BIGINT) AS s
      FROM q JOIN w4 w USING (i) GROUP BY q.vec_id
    ),
    rk AS (
      SELECT vec_id, y, s,
             ROW_NUMBER() OVER (ORDER BY s DESC, vec_id) AS r,
             COUNT(*) OVER () AS n
      FROM sc
    )
    SELECT CAST((r - 1) * 10 // n AS BIGINT) AS bin,
           CAST(COUNT(*) AS BIGINT) AS n_vecs,
           CAST(COUNT(*) FILTER (y = 1) AS BIGINT) AS n_pos,
           CAST(COUNT(*) FILTER (y = 1) * 1000 // COUNT(*) AS BIGINT)
             AS pos_rate_mille,
           CAST(SUM(s) AS BIGINT) AS sum_score
    FROM rk GROUP BY 1 ORDER BY bin"""
    )


@query("emb_calibration_bins", _calibration_oracle())
def emb_calibration_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The RELIABILITY DIAGRAM for a trained classifier: the 4-round
    integer perceptron's scores rank the corpus into score deciles
    (rank-based bins, ties to vec_id), and each bin reports its actual
    positive rate in exact mille — monotone-decreasing rates mean the
    score ORDERS well; the rate-vs-bin shape is the calibration curve
    every model-based filter (doc_quality_logit-style) should ship
    with. Training, scoring, binning, and rates are all integer-exact,
    so the whole eval hash-matches the DuckDB training replay.

    Scale (r7): training is the perceptron's dim-bounded rounds;
    scoring is one map-local pass with the weight array as data;
    binning uses the distributed two-pass rank
    (operators/ranking.distributed_row_number) — no single-partition
    window over the corpus-sized score rows."""
    from datagouv_tools_spark.operators.perceptron import perceptron_train
    from datagouv_tools_spark.operators.ranking import (
        distributed_row_number_total,
    )

    emb = t(spark, sf_dir, "embeddings")
    w, _ = perceptron_train(emb, positive_label=0, iters=4, dim=64)
    warr = lit_bigint_array(w)
    score = F.aggregate(
        F.zip_with(F.col("xq"), warr, lambda a, b: a * b),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )
    q = emb.select(
        "vec_id",
        F.when(F.col("label") == 0, 1).otherwise(-1).cast("bigint").alias("y"),
        F.transform(
            F.col("embedding"),
            lambda v: F.round(v.cast("double") * 1000, 0).cast("bigint"),
        ).alias("xq"),
    ).select("vec_id", "y", score.alias("s"))
    # DESC on the bigint score = ASC on its negation (exact); the rank
    # comes from the distributed two-pass rank; n falls out of the same
    # bounded offsets collect as a driver literal (pin_input: the score
    # pass materializes once, not once more for the boundary sampler)
    ranked, ntot = distributed_row_number_total(
        q.select("y", "s", "vec_id"),
        [(-F.col("s")), F.col("vec_id")],
        rank_col="r",
        pin_input=True,
    )
    rk = ranked.select("y", "s", F.col("r").cast("bigint").alias("r"))
    return (
        rk.groupBy(
            F.expr(f"cast((r - 1) * 10 div {max(ntot, 1)} as bigint)").alias(
                "bin"
            )
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_vecs"),
            F.count(F.when(F.col("y") == 1, 1)).cast("bigint").alias("n_pos"),
            F.expr(
                "cast(count(case when y = 1 then 1 end) * 1000"
                " div count(1) as bigint)"
            ).alias("pos_rate_mille"),
            F.sum("s").cast("bigint").alias("sum_score"),
        )
        .orderBy("bin")
    )


def _auc_oracle() -> str:
    from datagouv_tools_spark.operators.perceptron import perceptron_cte_sql

    return (
        perceptron_cte_sql(0, 4, 64)
        + """,
    sc AS (
      SELECT q.vec_id, ANY_VALUE(q.y) AS y,
             CAST(SUM(q.x * w.w) AS BIGINT) AS s
      FROM q JOIN w4 w USING (i) GROUP BY q.vec_id
    ),
    rk AS (
      SELECT y,
             ROW_NUMBER() OVER (ORDER BY s, vec_id) AS r
      FROM sc
    ),
    agg AS (
      SELECT CAST(SUM(CASE WHEN y = 1 THEN r ELSE 0 END) AS BIGINT)
               AS rank_sum,
             CAST(COUNT(*) FILTER (y = 1) AS BIGINT) AS n_pos,
             CAST(COUNT(*) FILTER (y <> 1) AS BIGINT) AS n_neg
      FROM rk
    )
    SELECT n_pos, n_neg,
           CAST(rank_sum - n_pos * (n_pos + 1) // 2 AS BIGINT) AS u_stat,
           CAST((rank_sum - n_pos * (n_pos + 1) // 2) * 1000000
                // (n_pos * n_neg) AS BIGINT) AS auc_ppm
    FROM agg"""
    )


@query("emb_classifier_auc", _auc_oracle())
def emb_classifier_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROC AUC of the trained perceptron as the EXACT Mann-Whitney
    rank-sum: AUC = (Σ positive ranks − n₊(n₊+1)/2) / (n₊·n₋), every
    term an integer (deterministic rank ties by vec_id), emitted in
    floor ppm — the threshold-free ordering metric beside
    emb_calibration_bins' threshold-wise rates, hash-matched against
    the full DuckDB training replay.

    Scale (r7): one score pass, the distributed two-pass rank
    (operators/ranking.distributed_row_number — no single-partition
    window over the corpus-sized score rows), a 3-integer reduce."""
    from datagouv_tools_spark.operators.perceptron import perceptron_train
    from datagouv_tools_spark.operators.ranking import distributed_row_number

    emb = t(spark, sf_dir, "embeddings")
    w, _ = perceptron_train(emb, positive_label=0, iters=4, dim=64)
    warr = lit_bigint_array(w)
    score = F.aggregate(
        F.zip_with(F.col("xq"), warr, lambda a, b: a * b),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )
    q = emb.select(
        "vec_id",
        F.when(F.col("label") == 0, 1).otherwise(-1).cast("bigint").alias("y"),
        F.transform(
            F.col("embedding"),
            lambda v: F.round(v.cast("double") * 1000, 0).cast("bigint"),
        ).alias("xq"),
    ).select("vec_id", "y", score.alias("s"))
    rk = distributed_row_number(
        q.select("y", "s", "vec_id"),
        [F.col("s"), F.col("vec_id")],
        rank_col="r",
        # pin: the score pass materializes once instead of re-running
        # for the range layout's boundary sampler
        pin_input=True,
    ).select("y", F.col("r").cast("bigint").alias("r"))
    return rk.agg(
        F.count(F.when(F.col("y") == 1, 1)).cast("bigint").alias("n_pos"),
        F.count(F.when(F.col("y") != 1, 1)).cast("bigint").alias("n_neg"),
        F.sum(F.when(F.col("y") == 1, F.col("r")).otherwise(0))
        .cast("bigint")
        .alias("rank_sum"),
    ).select(
        "n_pos",
        "n_neg",
        F.expr("cast(rank_sum - n_pos * (n_pos + 1) div 2 as bigint)").alias(
            "u_stat"
        ),
        F.expr(
            "cast((rank_sum - n_pos * (n_pos + 1) div 2) * 1000000"
            " div (n_pos * n_neg) as bigint)"
        ).alias("auc_ppm"),
    )


@query(
    "emb_hubness_profile",
    """
    WITH c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS embedding
               FROM embeddings),
    ranked AS (
      SELECT q.vec_id AS query_id, e.vec_id AS nb,
             ROW_NUMBER() OVER (PARTITION BY q.vec_id ORDER BY
               ROUND(list_dot_product(q.embedding, e.embedding)
                 / (sqrt(list_dot_product(q.embedding, q.embedding))
                    * sqrt(list_dot_product(e.embedding, e.embedding))),
                 6) DESC, e.vec_id) AS rk
      FROM c q JOIN c e ON e.vec_id <> q.vec_id
    ),
    knn AS (SELECT query_id, nb FROM ranked WHERE rk <= 5),
    deg AS (SELECT nb AS vec_id, COUNT(*) AS d FROM knn GROUP BY nb),
    indeg AS (
      SELECT c.vec_id, COALESCE(deg.d, 0) AS in_deg
      FROM c LEFT JOIN deg ON deg.vec_id = c.vec_id
    )
    SELECT CAST(in_deg AS BIGINT) AS in_degree,
           CAST(COUNT(*) AS BIGINT) AS n_vecs,
           CAST(MAX(CASE WHEN in_deg >= 15 THEN 1 ELSE 0 END) AS INTEGER)
             AS is_hub_band
    FROM indeg
    GROUP BY in_deg
    ORDER BY in_degree
    """,
)
def emb_hubness_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space HEALTH check: the in-degree distribution of the
    exact 5-NN graph — how often each vector appears in other vectors'
    neighbor lists. A heavy right tail (hubs with in-degree ≫ k) is the
    classic high-dimensional pathology that silently degrades kNN
    classification and ANN recall; the profile is the metric an
    embedding QA gate alarms on. Exact cosine, deterministic ties, so
    the whole histogram value-hash-matches.

    Scale: the all-pairs 5-NN here is the audit-slice form; production
    computes neighbor lists with the ANN index (same output contract)
    and the in-degree histogram stays a two-aggregation reduction."""
    from datagouv_tools_spark.operators.similarity import (
        cosine_knn_blocked,
    )

    emb = t(spark, sf_dir, "embeddings")
    # exact 5-NN via the blocked top-k kernel: the O(n²) BLAS multiply
    # is inherent, but only O(n·B·k) candidate rows ever leave a task —
    # r11 kept a full pair stream + both-directions union + corpus
    # window here (the union alone re-ran the all-pairs kernel twice);
    # at sf0.1 that was job-floor noise, at sf1 it was 100% of a 78 s
    # query (BENCH_SF1), which is the shape 100 TB amplifies.
    knn = cosine_knn_blocked(
        emb, "vec_id", "embedding", k=5
    ).select("vec_id")
    indeg = (
        emb.select("vec_id")
        .join(
            knn.groupBy("vec_id").agg(
                F.count(F.lit(1)).cast("bigint").alias("in_deg")
            ),
            "vec_id",
            "left",
        )
        .select(
            F.coalesce("in_deg", F.lit(0).cast("bigint")).alias("in_deg")
        )
    )
    return (
        indeg.groupBy(F.col("in_deg").alias("in_degree"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_vecs"),
            F.max(
                F.when(F.col("in_deg") >= 15, 1).otherwise(0)
            )
            .cast("int")
            .alias("is_hub_band"),
        )
        .orderBy("in_degree")
    )
