"""Fixed-point PageRank on Spark — iterative graph ranking with a
bit-exact cross-engine contract.

PageRank's float arithmetic is order-dependent (partition-order sums),
so this implementation runs entirely in INTEGER fixed point: ranks are
nano-units of total mass (1e9 = everything), per-edge contributions are
``(rank * w) // wdeg`` floor divisions, and the damping update is
``teleport + (85 * inflow) // 100``. Floor division loses a bounded
trickle of mass per step (documented semantics, identical in Spark and
DuckDB), in exchange for value-hash-checkable iterative graph compute —
the same trick the engine uses for its sketches.

Scale: each iteration is one equi-join of the edge list against the
current rank vector (both partitioned by src) plus a groupBy(dst) with
map-side combine — the standard |E|-shuffle-per-round distributed
PageRank. The node spine and weighted degrees are computed once and
checkpointed; each round's rank vector is an eager localCheckpoint, so
round R's plan (and the returned DataFrame's lineage) is one join-agg
deep, never R rounds deep.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SCALE = 1_000_000_000  # rank unit: nano-mass
TELEPORT_NANO = 150_000_000  # 0.15 * SCALE


def pagerank_fixed_point(
    nodes: DataFrame, edges: DataFrame, iters: int
) -> DataFrame:
    """Ranks after ``iters`` damped fixed-point iterations.

    ``nodes``: one column ``token`` (the vertex id). ``edges``: columns
    ``src, dst, w`` (directed, pre-symmetrized by the caller for
    undirected graphs). Returns (token, pr_nano).
    """
    # Loop invariants and each round's rank vector are materialized
    # with eager localCheckpoint: without it every iteration
    # re-executes the full upstream lineage (no ReusedExchange fires —
    # AQE re-plans each subtree, so textual identity breaks), turning R
    # rounds into O(R²) scans — and unlike persist()+count() (the
    # pre-r7 form), checkpointing also TRUNCATES the logical plan, so
    # the returned DataFrame's lineage is O(1) deep instead of
    # re-embedding all R rounds (the dedup_clusters pattern; measured
    # there 33→6 s, and it keeps downstream consumers' analyzed plans
    # from exploding — doc_textrank_keywords carried 386 exchanges).
    nodes = nodes.localCheckpoint()
    edges = edges.localCheckpoint()
    nn = nodes.agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    wdeg = (
        edges.groupBy("src")
        .agg(F.sum("w").cast("bigint").alias("wd"))
        .localCheckpoint()
    )
    ranks = nodes.crossJoin(F.broadcast(nn)).select(
        "token", F.expr(f"{SCALE} div n").alias("pr")
    )
    from datagouv_tools_spark.operators.ckpt import RoundCheckpointer

    ckpt = RoundCheckpointer()
    for _ in range(iters):
        inflow = (
            edges.join(ranks.withColumnRenamed("token", "src"), "src")
            .join(wdeg, "src")
            .select("dst", F.expr("(pr * w) div wd").alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").cast("bigint").alias("inflow"))
            .withColumnRenamed("dst", "token")
        )
        ranks = (
            nodes.crossJoin(F.broadcast(nn))
            .join(inflow, "token", "left")
            .select(
                "token",
                F.expr(
                    f"{TELEPORT_NANO} div n"
                    " + (85 * coalesce(inflow, 0)) div 100"
                ).alias("pr"),
            )
        )
        # materialize the round and release the previous round's blocks
        ranks = ckpt(ranks)
    return ranks


def label_propagation(
    nodes: DataFrame, edges: DataFrame, iters: int
) -> DataFrame:
    """Community detection by synchronous weighted label propagation.

    Each node starts labeled with itself; every round it adopts the
    label with the highest total incident edge weight among its
    neighbors' labels (ties → lexicographically smallest label, so the
    update is fully deterministic — the classic LPA caveat about random
    tie-breaks is engineered away and the result is value-hash-exact
    cross-engine). Nodes with no neighbors keep their own label.
    Returns (token, label) after ``iters`` rounds.

    Scale: one |E| shuffle per round (edges ⋈ labels on src, then the
    (dst, label) weight aggregation) plus a per-node argmax window over
    the label-weight rows — both map-side-combinable; same iterative
    hygiene as :func:`pagerank_fixed_point` (checkpointed invariants,
    per-round lineage-truncating materialization).
    """
    from pyspark.sql import Window as W

    nodes = nodes.localCheckpoint()
    edges = edges.localCheckpoint()
    from datagouv_tools_spark.operators.ckpt import RoundCheckpointer

    ckpt = RoundCheckpointer()
    labels = nodes.select("token", F.col("token").alias("label"))
    for _ in range(iters):
        lw = (
            edges.join(
                labels.select(
                    F.col("token").alias("src"), F.col("label")
                ),
                "src",
            )
            .groupBy("dst", "label")
            .agg(F.sum("w").cast("bigint").alias("lw"))
        )
        win = W.partitionBy("dst").orderBy(F.desc("lw"), F.asc("label"))
        best = (
            lw.withColumn("__rn", F.row_number().over(win))
            .filter(F.col("__rn") == 1)
            .select(F.col("dst").alias("token"), "label")
        )
        labels = ckpt(
            nodes.join(best, "token", "left").select(
                "token",
                F.coalesce("label", F.col("token")).alias("label"),
            )
        )
    return labels


def token_communities_oracle_sql(iters: int, tokens_sql: str) -> str:
    """DuckDB twin of the token-graph label-propagation query."""
    head = f"""
    WITH toks AS (SELECT {tokens_sql} AS ts FROM documents),
    bg AS (
      SELECT unnest(list_transform(generate_series(1, len(ts) - 1),
                    i -> ts[i] || ' ' || ts[i + 1])) AS p
      FROM toks WHERE len(ts) >= 2
    ),
    e1 AS (
      SELECT split_part(p, ' ', 1) AS src, split_part(p, ' ', 2) AS dst,
             CAST(COUNT(*) AS BIGINT) AS w
      FROM bg GROUP BY 1, 2
    ),
    edges AS (
      SELECT src, dst, CAST(SUM(w) AS BIGINT) AS w FROM (
        SELECT src, dst, w FROM e1 WHERE src <> dst
        UNION ALL
        SELECT dst AS src, src AS dst, w FROM e1 WHERE src <> dst
      ) GROUP BY src, dst
    ),
    nodes AS (SELECT DISTINCT unnest(ts) AS token FROM toks),
    l0 AS (SELECT token, token AS label FROM nodes)"""
    rounds = []
    for r in range(iters):
        rounds.append(
            f""",
    lw{r + 1} AS (
      SELECT e.dst, l.label, CAST(SUM(e.w) AS BIGINT) AS lw
      FROM edges e JOIN l{r} l ON e.src = l.token
      GROUP BY e.dst, l.label
    ),
    b{r + 1} AS (
      SELECT dst AS token, label FROM (
        SELECT dst, label,
               ROW_NUMBER() OVER (PARTITION BY dst
                                  ORDER BY lw DESC, label) AS rn
        FROM lw{r + 1}
      ) WHERE rn = 1
    ),
    l{r + 1} AS (
      SELECT nodes.token, COALESCE(b.label, nodes.token) AS label
      FROM nodes LEFT JOIN b{r + 1} b USING (token)
    )"""
        )
    tail = f"""
    SELECT label AS community,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           MIN(token) AS min_token,
           BIT_XOR(('0x' || substr(md5(token), 1, 15))::BIGINT) AS member_xor
    FROM l{iters}
    GROUP BY label
    ORDER BY n_tokens DESC, community LIMIT 20"""
    return head + "".join(rounds) + tail


def textrank_oracle_sql(iters: int, tokens_sql: str) -> str:
    """DuckDB twin of the token-graph TextRank query: same node spine,
    symmetrized adjacent-token edges, and ``iters`` fixed-point rounds
    as a CTE chain."""
    head = f"""
    WITH toks AS (SELECT {tokens_sql} AS ts FROM documents),
    bg AS (
      SELECT unnest(list_transform(generate_series(1, len(ts) - 1),
                    i -> ts[i] || ' ' || ts[i + 1])) AS p
      FROM toks WHERE len(ts) >= 2
    ),
    e1 AS (
      SELECT split_part(p, ' ', 1) AS src, split_part(p, ' ', 2) AS dst,
             CAST(COUNT(*) AS BIGINT) AS w
      FROM bg GROUP BY 1, 2
    ),
    edges AS (
      SELECT src, dst, CAST(SUM(w) AS BIGINT) AS w FROM (
        SELECT src, dst, w FROM e1 WHERE src <> dst
        UNION ALL
        SELECT dst AS src, src AS dst, w FROM e1 WHERE src <> dst
      ) GROUP BY src, dst
    ),
    nodes AS (SELECT DISTINCT unnest(ts) AS token FROM toks),
    nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM nodes),
    wdeg AS (SELECT src, CAST(SUM(w) AS BIGINT) AS wd
             FROM edges GROUP BY src),
    r0 AS (SELECT token, CAST({SCALE} // n AS BIGINT) AS pr
           FROM nodes CROSS JOIN nn)"""
    rounds = []
    for r in range(iters):
        rounds.append(
            f""",
    i{r + 1} AS (
      SELECT e.dst AS token, CAST(SUM((r.pr * e.w) // d.wd) AS BIGINT)
               AS inflow
      FROM edges e JOIN r{r} r ON e.src = r.token
        JOIN wdeg d ON e.src = d.src
      GROUP BY e.dst
    ),
    r{r + 1} AS (
      SELECT nodes.token,
             CAST({TELEPORT_NANO} // n
                  + (85 * COALESCE(i{r + 1}.inflow, 0)) // 100 AS BIGINT)
               AS pr
      FROM nodes CROSS JOIN nn LEFT JOIN i{r + 1} USING (token)
    )"""
        )
    tail = f"""
    SELECT token, pr AS pr_nano FROM r{iters}
    ORDER BY pr DESC, token LIMIT 20"""
    return head + "".join(rounds) + tail


def triangle_counts(und: DataFrame) -> DataFrame:
    """Per-node triangle participation via the degree-oriented
    "forward" algorithm (Schank & Wagner 2005; the shape every
    distributed triangle counter uses).

    ``und``: DISTINCT undirected edges as ``(u, v)`` with ``u < v``
    (one row per edge, no self-loops). Returns
    ``(token, degree, tri_cnt)`` for every node that closes at least
    one triangle.

    Each edge is oriented from its lower ``(degree, token)`` endpoint
    to the higher one, so the oriented out-degree of EVERY node —
    including a hub adjacent to half the graph — is bounded by the
    graph's arboricity-scale ordering rank. The wedge join
    ``(a→b)⋈(b→c)`` therefore cannot quadratically explode on skewed
    degree distributions, which is exactly what kills the naive
    3-way edge self-join at 100 TB. Each triangle is produced exactly
    once, at its lowest-ordered corner.
    """
    deg = (
        # both endpoints from ONE pass over the edge list — the
        # union-of-two-selects form evaluates the caller's edge
        # lineage twice (union branches are planned independently;
        # column pruning specializes them, so nothing dedups the work)
        und.select(F.explode(F.array("u", "v")).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).cast("bigint").alias("degree"))
    )
    du = deg.select(F.col("token").alias("u"), F.col("degree").alias("du"))
    dv = deg.select(F.col("token").alias("v"), F.col("degree").alias("dv"))
    keyed = und.join(du, "u").join(dv, "v")
    fwd = F.struct(F.col("du"), F.col("u")) < F.struct(F.col("dv"), F.col("v"))
    # o feeds the wedge-close three ways and deg twice — materialize
    # the invariants once (same loop-invariant discipline as
    # pagerank_fixed_point above; localCheckpoint also truncates the
    # lineage so the three consumers share ONE build, not three copies)
    deg = deg.localCheckpoint()
    o = keyed.select(
        F.when(fwd, F.col("u")).otherwise(F.col("v")).alias("src"),
        F.when(fwd, F.col("v")).otherwise(F.col("u")).alias("dst"),
    ).localCheckpoint()
    e1 = o.select(F.col("src").alias("a"), F.col("dst").alias("b"))
    e2 = o.select(F.col("src").alias("b"), F.col("dst").alias("c"))
    e3 = o.select(F.col("src").alias("a"), F.col("dst").alias("c"))
    tri = e1.join(e2, "b").join(e3, ["a", "c"])
    per_node = (
        tri.select(F.explode(F.array("a", "b", "c")).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).cast("bigint").alias("tri_cnt"))
    )
    return per_node.join(deg, "token").select("token", "degree", "tri_cnt")


def triangles_oracle_sql(tokens_sql: str) -> str:
    """DuckDB twin of the token-graph triangle query: same undirected
    dedup, same (degree, token) orientation, same one-per-triangle
    wedge-close join, same ppm fixed-point clustering coefficients."""
    return f"""
    WITH toks AS (SELECT {tokens_sql} AS ts FROM documents),
    bg AS (
      SELECT unnest(list_transform(generate_series(1, len(ts) - 1),
                    i -> ts[i] || ' ' || ts[i + 1])) AS p
      FROM toks WHERE len(ts) >= 2
    ),
    pairs AS (
      SELECT split_part(p, ' ', 1) AS x, split_part(p, ' ', 2) AS y
      FROM bg
    ),
    und AS (
      SELECT DISTINCT least(x, y) AS u, greatest(x, y) AS v
      FROM pairs WHERE x <> y
    ),
    deg AS (
      SELECT token, CAST(COUNT(*) AS BIGINT) AS degree FROM (
        SELECT u AS token FROM und UNION ALL SELECT v AS token FROM und
      ) GROUP BY token
    ),
    o AS (
      SELECT CASE WHEN (du.degree, e.u) < (dv.degree, e.v)
                  THEN e.u ELSE e.v END AS src,
             CASE WHEN (du.degree, e.u) < (dv.degree, e.v)
                  THEN e.v ELSE e.u END AS dst
      FROM und e
      JOIN deg du ON e.u = du.token
      JOIN deg dv ON e.v = dv.token
    ),
    tri AS (
      SELECT e1.src AS a, e1.dst AS b, e2.dst AS c
      FROM o e1
      JOIN o e2 ON e1.dst = e2.src
      JOIN o e3 ON e3.src = e1.src AND e3.dst = e2.dst
    ),
    pn AS (
      SELECT token, CAST(COUNT(*) AS BIGINT) AS tri_cnt FROM (
        SELECT a AS token FROM tri
        UNION ALL SELECT b AS token FROM tri
        UNION ALL SELECT c AS token FROM tri
      ) GROUP BY token
    ),
    gtot AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_tri_total FROM tri
    ),
    wedges AS (
      SELECT CAST(SUM(degree * (degree - 1) // 2) AS BIGINT) AS n_wedges
      FROM deg
    )
    SELECT token, degree, tri_cnt,
           (2 * tri_cnt * 1000000) // (degree * (degree - 1)) AS lcc_ppm,
           n_tri_total,
           (3 * n_tri_total * 1000000) // n_wedges AS global_cc_ppm
    FROM pn JOIN deg USING (token)
    CROSS JOIN gtot CROSS JOIN wedges
    ORDER BY tri_cnt DESC, token LIMIT 20"""


def kcore_peel(und: DataFrame, k: int, rounds: int) -> DataFrame:
    """``rounds`` synchronous peeling rounds toward the k-core: each
    round recomputes degrees in the CURRENT subgraph and drops every
    node below ``k`` (with all its edges). A fixed round count keeps
    the result deterministic and the DAG bounded; peeling converges
    monotonically, so extra rounds only ever remove more — callers
    size ``rounds`` to the graph's peel depth (the diameter-ish small
    number real graphs have) or iterate to a fixpoint with a count
    check per round.

    ``und``: DISTINCT undirected edges (u, v), u < v. Returns the
    surviving edges after the last round.

    Scale: a round is one degree aggregation (map-side combined) plus
    two broadcast-able semi-joins of the edge list against the
    surviving-node set; each round's edges are materialized to
    truncate lineage — the pagerank loop-invariant discipline.
    """
    from datagouv_tools_spark.operators.ckpt import RoundCheckpointer

    ckpt = RoundCheckpointer()
    edges = und
    for _ in range(rounds):
        deg = (
            edges.select(F.col("u").alias("token"))
            .unionByName(edges.select(F.col("v").alias("token")))
            .groupBy("token")
            .agg(F.count(F.lit(1)).alias("deg"))
        )
        keep = deg.filter(F.col("deg") >= k).select("token")
        edges = (
            edges.join(
                keep.withColumnRenamed("token", "u"), "u", "left_semi"
            )
            .join(keep.withColumnRenamed("token", "v"), "v", "left_semi")
            .select("u", "v")
        )
        edges = ckpt(edges)
    return edges


def kcore_oracle_sql(tokens_sql: str, k: int, rounds: int) -> str:
    """DuckDB twin of the token-graph k-core query: identical edge
    build, ``rounds`` unrolled peel CTEs, identical final report."""
    head = f"""
    WITH toks AS (SELECT {tokens_sql} AS ts FROM documents),
    bg AS (
      SELECT unnest(list_transform(generate_series(1, len(ts) - 1),
                    i -> ts[i] || ' ' || ts[i + 1])) AS p
      FROM toks WHERE len(ts) >= 2
    ),
    pairs AS (
      SELECT split_part(p, ' ', 1) AS x, split_part(p, ' ', 2) AS y
      FROM bg
    ),
    e0 AS (
      SELECT DISTINCT least(x, y) AS u, greatest(x, y) AS v
      FROM pairs WHERE x <> y
    )"""
    body = []
    for r in range(rounds):
        body.append(
            f""",
    d{r + 1} AS (
      SELECT token, CAST(COUNT(*) AS BIGINT) AS deg FROM (
        SELECT u AS token FROM e{r} UNION ALL SELECT v AS token FROM e{r}
      ) GROUP BY token
    ),
    keep{r + 1} AS (SELECT token FROM d{r + 1} WHERE deg >= {k}),
    e{r + 1} AS (
      SELECT u, v FROM e{r}
      WHERE u IN (SELECT token FROM keep{r + 1})
        AND v IN (SELECT token FROM keep{r + 1})
    )"""
        )
    tail = f""",
    fdeg AS (
      SELECT token, CAST(COUNT(*) AS BIGINT) AS core_deg FROM (
        SELECT u AS token FROM e{rounds}
        UNION ALL SELECT v AS token FROM e{rounds}
      ) GROUP BY token
    ),
    tot AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_core_nodes,
             CAST(SUM(core_deg) AS BIGINT) // 2 AS n_core_edges
      FROM fdeg
    )
    SELECT token, core_deg, n_core_nodes, n_core_edges
    FROM fdeg CROSS JOIN tot
    ORDER BY core_deg DESC, token LIMIT 20"""
    return head + "".join(body) + tail


def bfs_hops(
    nodes: DataFrame, edges: DataFrame, sources: DataFrame, rounds: int
) -> DataFrame:
    """Multi-source breadth-first hop distances by synchronous
    min-distance propagation: ``rounds`` rounds of "my distance is the
    min of my neighbors' + 1", the textbook Pregel relaxation — after R
    rounds every node within R hops of a source carries its exact hop
    distance (unreached nodes report NULL).

    ``nodes``: (token); ``edges``: (src, dst), pre-symmetrized for
    undirected graphs; ``sources``: (token) seed set. Returns
    (token, hops).

    Scale: each round is ONE |E| equi-join against the current
    frontier-bearing distance vector plus a min-combine — the same
    per-round shape and persisted-invariant discipline as
    pagerank_fixed_point; distances are materialized per round to
    truncate lineage.
    """
    edges = edges.localCheckpoint()
    dist = (
        nodes.join(sources.withColumn("__s", F.lit(0)), "token", "left")
        .select("token", F.col("__s").cast("bigint").alias("hops"))
        .localCheckpoint()
    )
    from datagouv_tools_spark.operators.ckpt import RoundCheckpointer

    ckpt = RoundCheckpointer()
    for _ in range(rounds):
        relaxed = (
            edges.join(
                dist.filter(F.col("hops").isNotNull()).withColumnRenamed(
                    "token", "src"
                ),
                "src",
            )
            .select(F.col("dst").alias("token"), (F.col("hops") + 1).alias("h"))
            .groupBy("token")
            .agg(F.min("h").alias("h"))
        )
        dist = ckpt(
            dist.join(relaxed, "token", "left").select(
                "token", F.least("hops", "h").alias("hops")
            )
        )
    return dist


def bfs_oracle_sql(tokens_sql: str, source_pred: str, rounds: int) -> str:
    """DuckDB twin of the token-graph BFS query: same edge build, same
    ``rounds`` min-relaxation CTE rounds, same hop histogram."""
    head = f"""
    WITH toks AS (SELECT {tokens_sql} AS ts FROM documents),
    bg AS (
      SELECT unnest(list_transform(generate_series(1, len(ts) - 1),
                    i -> ts[i] || ' ' || ts[i + 1])) AS p
      FROM toks WHERE len(ts) >= 2
    ),
    e1 AS (
      SELECT split_part(p, ' ', 1) AS src, split_part(p, ' ', 2) AS dst
      FROM bg WHERE split_part(p, ' ', 1) <> split_part(p, ' ', 2)
    ),
    edges AS (
      SELECT DISTINCT src, dst FROM (
        SELECT src, dst FROM e1 UNION ALL SELECT dst, src FROM e1
      )
    ),
    nodes AS (SELECT DISTINCT unnest(ts) AS token FROM toks),
    d0 AS (
      SELECT token,
             CASE WHEN {source_pred} THEN CAST(0 AS BIGINT) END AS hops
      FROM nodes
    )"""
    body = []
    for r in range(rounds):
        body.append(
            f""",
    r{r + 1} AS (
      SELECT e.dst AS token, CAST(MIN(d.hops + 1) AS BIGINT) AS h
      FROM edges e JOIN d{r} d ON e.src = d.token
      WHERE d.hops IS NOT NULL
      GROUP BY e.dst
    ),
    d{r + 1} AS (
      SELECT d.token, LEAST(d.hops, r.h) AS hops
      FROM d{r} d LEFT JOIN r{r + 1} r USING (token)
    )"""
        )
    tail = f"""
    SELECT hops, CAST(COUNT(*) AS BIGINT) AS n_tokens,
           MIN(token) AS min_token,
           BIT_XOR(('0x' || substr(md5(token), 1, 15))::BIGINT) AS member_xor
    FROM d{rounds}
    GROUP BY hops
    ORDER BY hops NULLS LAST"""
    return head + "".join(body) + tail
