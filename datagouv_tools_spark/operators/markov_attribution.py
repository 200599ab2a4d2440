"""Markov-chain multi-touch attribution with removal effects.

Single-touch rules (the engine's events_attribution_last_touch) credit
each conversion to one touchpoint; the Markov removal-effect model
(Anderl et al. 2014, the standard data-driven attribution method)
credits every channel by how much the corpus-wide conversion
probability DROPS when that channel is removed from the journey graph:

1. per user, the ordered touch journey up to (exclusive) the first
   conversion event becomes a path start → t1 → … → tn → conv|null;
2. paths aggregate into a first-order transition matrix
   T[i][j] = P(next = j | current = i);
3. absorption probability P(conv | start) comes from fixed-point
   iteration p ← T·p with p(conv) ≡ 1, p(null) ≡ 0;
4. removal effect of channel c = the drop in P(conv | start) when
   every walk through c is failed (p(c) clamped to 0);
5. attribution share = each channel's removal effect, normalized.

Determinism contract (repo-wide convention): probabilities are integer
ppm — transition rows normalize with one truncating division, each
iteration is Σ T_ppm·p_ppm followed by ONE truncating `// 1e6` — so
the whole iterative solve is bit-reproducible and the DuckDB oracle
(an unrolled CTE chain, one per removal scenario) hash-matches
exactly. int64 headroom: each iteration term ≤ 1e12, summed over
≤ |states| ≤ ~10 transitions.

Scale shape: the DISTRIBUTED work is journey extraction — one shuffle
on user_id for the per-user window (first-conversion cutoff + LEAD
pairing, no self-join) — and the (src, dst) edge count with map-side
combine. What crosses the driver is the transition matrix itself:
≤ (|channels|+3)² integers, the same bounded-driver pattern as the
BPE winners; the |channels|+1 fixed-point solves then cost nothing.
The reference repo has no analytics code (SURVEY.md §2.6 scope).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PPM = 1_000_000


def journey_edges(
    ev: DataFrame,
    channels: tuple[str, ...],
    conv_type: str = "purchase",
) -> DataFrame:
    """(src, dst) transition edges of every user journey.

    Journey = the user's ``channels`` events strictly before their
    first ``conv_type`` event (all of them when the user never
    converts), ordered by the total key (ts, event_id). Emitted edges:
    start→first touch, touch→next touch, last touch→conv/null, and
    start→conv for users whose first event already converts.
    """
    from pyspark.sql import Window as W

    ev = ev.select("user_id", "ts", "event_id", "event_type").filter(
        F.col("event_type").isin(*channels, conv_type)
    )
    order = F.struct("ts", "event_id")
    wu = W.partitionBy("user_id")
    fp = F.min(
        F.when(F.col("event_type") == conv_type, order)
    ).over(wu)
    marked = ev.withColumn("__fp", fp)
    pre = marked.filter(
        (F.col("event_type") != conv_type)
        & (F.col("__fp").isNull() | (order < F.col("__fp")))
    )
    ws = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = pre.select(
        "user_id",
        "event_type",
        F.col("__fp").isNotNull().alias("converted"),
        F.row_number().over(ws).alias("rn"),
        F.lead("event_type").over(ws).alias("nxt"),
    )
    first_edges = seq.filter(F.col("rn") == 1).select(
        F.lit("start").alias("src"), F.col("event_type").alias("dst")
    )
    step_edges = seq.select(
        F.col("event_type").alias("src"),
        F.coalesce(
            F.col("nxt"),
            F.when(F.col("converted"), F.lit("conv")).otherwise(F.lit("null")),
        ).alias("dst"),
    )
    # converted users whose FIRST event is the conversion: no pre rows
    direct = (
        marked.groupBy("user_id")
        .agg(
            F.max(F.col("__fp").isNotNull()).alias("converted"),
            F.sum(
                (
                    (F.col("event_type") != conv_type)
                    & (F.col("__fp").isNull() | (order < F.col("__fp")))
                ).cast("long")
            ).alias("n_pre"),
        )
        .filter(F.col("converted") & (F.col("n_pre") == 0))
        .select(F.lit("start").alias("src"), F.lit("conv").alias("dst"))
    )
    return first_edges.unionByName(step_edges).unionByName(direct)


def _solve_absorption(
    tprob: dict[tuple[str, str], int], iters: int, removed: str | None
) -> dict[str, int]:
    """Fixed-point p ← T·p in integer ppm, mirroring the oracle's CTE
    chain: p holds only source states + conv; absent states read 0;
    the removed channel reads 0 (every walk through it fails)."""
    srcs = sorted({s for s, _ in tprob})
    p: dict[str, int] = {"conv": PPM}
    for _ in range(iters):
        nxt: dict[str, int] = {}
        for i in srcs:
            tot = 0
            for (s, d), t_ppm in tprob.items():
                if s != i:
                    continue
                pj = 0 if d == removed else p.get(d, 0)
                tot += t_ppm * pj
            nxt[i] = tot // PPM
        nxt["conv"] = PPM
        p = nxt
    return p


def markov_removal_attribution(
    ev: DataFrame,
    channels: tuple[str, ...],
    iters: int = 16,
    conv_type: str = "purchase",
) -> DataFrame:
    """Per-channel removal effect + normalized attribution, ppm."""
    spark = ev.sparkSession
    counts = (
        journey_edges(ev, channels, conv_type)
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    )
    by_src: dict[str, int] = {}
    for r in counts:
        by_src[r.src] = by_src.get(r.src, 0) + int(r.cnt)
    tprob = {
        (r.src, r.dst): (int(r.cnt) * PPM) // by_src[r.src] for r in counts
    }
    base = _solve_absorption(tprob, iters, removed=None).get("start", 0)
    rows = []
    for c in sorted(channels):
        rem = _solve_absorption(tprob, iters, removed=c).get("start", 0)
        effect = max(base - rem, 0)
        rows.append((c, rem, base, effect))
    total = sum(e for *_, e in rows)
    out = [
        (
            c,
            rem,
            base,
            effect,
            (effect * PPM) // total if total > 0 else 0,
        )
        for c, rem, base, effect in rows
    ]
    return spark.createDataFrame(
        out,
        "channel string, removal_conv_ppm bigint, base_conv_ppm bigint,"
        " removal_effect_ppm bigint, attribution_ppm bigint",
    ).orderBy("channel")


def markov_oracle_sql(
    channels: tuple[str, ...], iters: int = 16, conv_type: str = "purchase"
) -> str:
    """DuckDB twin: identical journey edges, ppm transition matrix,
    and one RECURSIVE fixed-point chain per removal scenario.

    Recursive CTEs (DuckDB allows aggregation in the recursive term)
    instead of ``iters`` unrolled CTEs per scenario: the unrolled form
    planned 80+ chained join CTEs and took minutes to optimize; the
    recursive form is five 7-row iterations. The absorbing 'conv'
    state persists through iterations as a p=1.0 SELF-LOOP row added
    to the matrix (the standard absorbing-chain formulation), so the
    recursive term needs exactly one reference to its own CTE. An
    INNER join on dst matches the solver's read-absent-as-zero
    semantics: a state missing from iteration r contributes 0 to
    every r+1 sum either way."""
    chan_list = ", ".join(f"'{c}'" for c in channels)
    head = f"""
    WITH RECURSIVE ev AS (
      SELECT user_id, ts, event_id, event_type FROM events
      WHERE event_type IN ({chan_list}, '{conv_type}')
    ),
    fp AS (
      SELECT user_id, ts, event_id FROM (
        SELECT user_id, ts, event_id,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS rn
        FROM ev WHERE event_type = '{conv_type}'
      ) WHERE rn = 1
    ),
    pre AS (
      SELECT e.user_id, e.event_type, e.ts, e.event_id,
             fp.user_id IS NOT NULL AS converted
      FROM ev e LEFT JOIN fp USING (user_id)
      WHERE e.event_type <> '{conv_type}'
        AND (fp.user_id IS NULL OR (e.ts, e.event_id) < (fp.ts, fp.event_id))
    ),
    seq AS (
      SELECT user_id, event_type, converted,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS rn,
             LEAD(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS nxt
      FROM pre
    ),
    edges AS (
      SELECT 'start' AS src, event_type AS dst FROM seq WHERE rn = 1
      UNION ALL
      SELECT event_type,
             COALESCE(nxt, CASE WHEN converted THEN 'conv' ELSE 'null' END)
      FROM seq
      UNION ALL
      SELECT 'start', 'conv'
      FROM fp LEFT JOIN (SELECT DISTINCT user_id FROM pre) p USING (user_id)
      WHERE p.user_id IS NULL
    ),
    tcnt AS (SELECT src, dst, COUNT(*) AS cnt FROM edges GROUP BY src, dst),
    tprob AS (
      SELECT src, dst,
             CAST(cnt * {PPM} // SUM(cnt) OVER (PARTITION BY src) AS BIGINT)
               AS p_ppm
      FROM tcnt
      UNION ALL
      SELECT 'conv', 'conv', {PPM}
    )"""
    scenarios: list[tuple[str, str | None]] = [("b", None)] + [
        (f"r{i}", c) for i, c in enumerate(sorted(channels))
    ]
    parts = [head]
    for tag, removed in scenarios:
        clamp = (
            f"CASE WHEN t.dst = '{removed}' THEN 0 ELSE p.p END"
            if removed is not None
            else "p.p"
        )
        parts.append(
            f""",
    p{tag} AS (
      SELECT 0 AS it, 'conv' AS state, CAST({PPM} AS BIGINT) AS p
      UNION ALL
      SELECT p.it + 1, t.src,
             CAST(SUM(t.p_ppm * {clamp}) // {PPM} AS BIGINT)
      FROM tprob t JOIN p{tag} p ON p.state = t.dst
      WHERE p.it < {iters}
      GROUP BY t.src, p.it
    )"""
        )
    res_rows = "\n      UNION ALL ".join(
        f"SELECT '{c}' AS channel,"
        f" COALESCE((SELECT p FROM pr{i}"
        f" WHERE it = {iters} AND state = 'start'), 0)"
        f" AS removal_conv_ppm"
        for i, c in enumerate(sorted(channels))
    )
    parts.append(
        f""",
    basev AS (
      SELECT CAST(COALESCE((SELECT p FROM pb
                            WHERE it = {iters} AND state = 'start'), 0)
                  AS BIGINT) AS b
    ),
    res AS (
      {res_rows}
    ),
    eff AS (
      SELECT channel, removal_conv_ppm, basev.b AS base_conv_ppm,
             CAST(GREATEST(basev.b - removal_conv_ppm, 0) AS BIGINT)
               AS removal_effect_ppm
      FROM res CROSS JOIN basev
    )
    SELECT channel,
           CAST(removal_conv_ppm AS BIGINT) AS removal_conv_ppm,
           base_conv_ppm,
           removal_effect_ppm,
           CAST(CASE WHEN SUM(removal_effect_ppm) OVER () > 0
                THEN removal_effect_ppm * {PPM}
                     // SUM(removal_effect_ppm) OVER ()
                ELSE 0 END AS BIGINT) AS attribution_ppm
    FROM eff
    ORDER BY channel"""
    )
    return "".join(parts)
