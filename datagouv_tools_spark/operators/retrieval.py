"""Lexical + fused retrieval over the document corpus.

The retrieval half of a RAG/training-data pipeline: BM25 term scoring
(the Robertson/Spärck Jones family every search engine ships) and
reciprocal-rank fusion (Cormack et al. 2009) for combining rankings
from different scorers. No reference analog (jferard/datagouv_tools
has no text-retrieval code); this extends the engine's text-analysis
surface the same way similarity.py extends its vector surface.

Determinism contract (the repo-wide convention): scoring uses ONLY
+, *, / double arithmetic in a pinned evaluation order — IEEE 754
basic ops are correctly rounded, so Spark and DuckDB produce
bit-identical doubles. That rules out ``ln``: libm logs are not
correctly rounded and may differ across engines by an ULP, which a
value-hash oracle would catch. The IDF here is therefore the RATIONAL
form idf'(t) = (N − df_t + 0.5) / (df_t + 0.5) — the argument of the
standard log-IDF, monotone in df_t exactly like it (log is monotone),
so single-term rankings are identical and multi-term rankings weight
rare terms more aggressively. A deployment preferring classic BM25
drops ``F.log`` around one expression and gives up cross-engine
bit-equality, nothing else.

Scale shape:
- corpus stats (N, total tokens) and per-term document frequencies are
  ONE map-side-combining aggregation each — |terms| + 2 scalars to the
  driver, never rows;
- per-doc scoring is map-local array arithmetic over the scan (tf via
  ``F.filter`` on the token array — no explode, no shuffle);
- top-k is TakeOrdered (score desc, id asc), never a full sort;
- RRF ranks come from window functions over the ALREADY-REDUCED
  candidate sets (two top-n lists), not the corpus.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from datagouv_tools_spark.functions.text import tokens

__all__ = [
    "bm25_scores",
    "bm25_topk",
    "rrf_fuse",
    "corpus_stats",
    "bm25_counter_increments",
    "bm25_stats_from_counters",
    "proximity_rerank",
]

K1 = 1.2
B = 0.75


from datagouv_tools_spark.functions.litfast import (
    sql_double as _sql_d,
    sql_ref as _sql_ref,
    sql_string as _sql_str,
)


def corpus_stats(
    docs: DataFrame,
    terms: list[str],
    text_col: str = "text",
    tokens_col: str | None = None,
) -> tuple[int, int, dict[str, int]]:
    """(N docs, total tokens, per-term document frequency) in one
    aggregation pass. Every component is an integer COUNT — ADD-
    mergeable across shards/batches, which is what lets a streaming
    counter store (streaming/counter_maintain.py) keep them fresh
    without corpus rescans.

    ``tokens_col`` names an ALREADY-TOKENIZED array column — pass it
    when the caller tokenizes once and shares the array across several
    scoring passes (multi-query evals), skipping the regex re-split."""
    if tokens_col:
        # one parsed expr per term instead of ~30 Column-op round-trips
        # (functions/litfast rationale); identical aggregate expressions
        ts_sql = _sql_ref(tokens_col)
        per_term = [
            F.expr(
                f"sum(cast(array_contains({ts_sql}, {_sql_str(t)}) as long))"
            ).alias(f"__df_{i}")
            for i, t in enumerate(terms)
        ]
        ts = F.col(tokens_col)
    else:
        ts = tokens(text_col)
        per_term = [
            F.sum(F.array_contains(ts, F.lit(t)).cast("long")).alias(
                f"__df_{i}"
            )
            for i, t in enumerate(terms)
        ]
    row = docs.agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum(F.size(ts)).alias("__tot"),
        *per_term,
    ).first()
    dfs = {t: int(row[f"__df_{i}"]) for i, t in enumerate(terms)}
    return int(row["__n"]), int(row["__tot"]), dfs


def bm25_scores(
    docs: DataFrame,
    terms: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = K1,
    b: float = B,
    round_to: int = 6,
    stats: tuple[int, int, dict[str, int]] | None = None,
    tokens_col: str | None = None,
) -> DataFrame:
    """Append ``bm25`` (rational-IDF BM25, rounded@round_to) for the
    given query terms to every document. Zero-scoring docs are kept —
    callers filter or top-k as needed.

    Per-term contribution, evaluated LEFT-ASSOCIATIVELY over terms in
    the given order (the oracle mirrors the order):

        idf'(t) · (tf · (k1+1)) / (tf + k1·(1 − b + b·(dl / avgdl)))

    with avgdl computed as one double division of exact integers.

    ``stats`` (the :func:`corpus_stats` triple) skips the stats pass —
    pass the values a streaming counter store maintains
    (streaming/counter_maintain.py) and scoring is a single map-local
    pass over the candidate docs, no corpus aggregation at all.
    """
    n, tot, dfs = stats if stats is not None else corpus_stats(
        docs, terms, text_col, tokens_col
    )
    if tokens_col:
        # Whole score as ONE parsed SQL expression (the Column-operator
        # loop cost ~100+ py4j round-trips PER TERM — functions/litfast
        # rationale). Same tree: SQL * and / are left-associative and
        # equal-precedence like Python's, the float constants embed via
        # exact shortest-repr casts, and avgdl / (1-b) / idf folding
        # happens on identical IEEE doubles whether Python or Catalyst
        # evaluates the constant subtrees.
        ts_sql = _sql_ref(tokens_col)
        dl = f"CAST(size({ts_sql}) AS DOUBLE)"
        avgdl = float(tot) / float(n) if n else 1.0
        nrm = (
            f"({_sql_d(k1)} * ({_sql_d(1.0 - b)}"
            f" + {_sql_d(b)} * ({dl} / {_sql_d(avgdl)})))"
        )
        terms_sql = []
        for t in terms:
            idf = (float(n - dfs[t]) + 0.5) / (float(dfs[t]) + 0.5)
            tf = (
                f"CAST(size(filter({ts_sql}, x -> x = {_sql_str(t)}))"
                " AS DOUBLE)"
            )
            terms_sql.append(
                f"{_sql_d(idf)} * ({tf} * {_sql_d(k1 + 1.0)})"
                f" / ({tf} + {nrm})"
            )
        score_sql = " + ".join(f"({t})" for t in terms_sql)
        return docs.withColumn(
            "bm25", F.expr(f"round({score_sql}, {int(round_to)})")
        )
    ts = tokens(text_col)
    dl = F.size(ts).cast("double")
    avgdl = F.lit(float(tot)) / F.lit(float(n)) if n else F.lit(1.0)
    norm = F.lit(k1) * (
        F.lit(1.0 - b) + F.lit(b) * (dl / avgdl)
    )
    score: Column | None = None
    for t in terms:
        idf = (F.lit(float(n - dfs[t])) + F.lit(0.5)) / (
            F.lit(float(dfs[t])) + F.lit(0.5)
        )
        tf = F.size(F.filter(ts, lambda x: x == F.lit(t))).cast("double")
        term_score = idf * (tf * F.lit(k1 + 1.0)) / (tf + norm)
        score = term_score if score is None else score + term_score
    return docs.withColumn("bm25", F.round(score, round_to))


def bm25_topk(
    docs: DataFrame,
    terms: list[str],
    k: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
    stats: tuple[int, int, dict[str, int]] | None = None,
    tokens_col: str | None = None,
) -> DataFrame:
    """Top-k by BM25, ties to the smaller id (total order → unique
    result set; the plan is TakeOrdered, no corpus sort)."""
    scored = bm25_scores(
        docs, terms, text_col, id_col, stats=stats, tokens_col=tokens_col
    )
    return (
        scored.filter(F.col("bm25") > 0.0)
        .orderBy(F.desc("bm25"), F.asc(id_col))
        .limit(k)
    )


def rrf_fuse(
    rankings: list[DataFrame],
    id_col: str = "doc_id",
    c: int = 60,
    round_to: int = 6,
) -> DataFrame:
    """Reciprocal-rank fusion: each input carries (id, rank) with rank
    1-based; the fused score is Σ_i 1/(c + rank_i), summed over the
    rankings IN ORDER (absent → no contribution), rounded@round_to.
    1/(c+r) is one correctly-rounded division and the sum order is
    pinned, so the oracle matches bit-for-bit. Returns (id, rrf)."""
    fused: DataFrame | None = None
    for i, r in enumerate(rankings):
        part = r.select(
            id_col, F.col("rank").alias(f"__r{i}")
        )
        fused = part if fused is None else fused.join(part, id_col, "full_outer")
    assert fused is not None, "rrf_fuse needs at least one ranking"
    score: Column | None = None
    for i in range(len(rankings)):
        contrib = F.when(
            F.col(f"__r{i}").isNotNull(),
            F.lit(1.0) / (F.lit(float(c)) + F.col(f"__r{i}").cast("double")),
        ).otherwise(F.lit(0.0))
        score = contrib if score is None else score + contrib
    return fused.select(id_col, F.round(score, round_to).alias("rrf"))


def bm25_counter_increments(
    docs: DataFrame, terms: list[str], text_col: str = "text"
) -> DataFrame:
    """One micro-batch's contribution to the BM25 corpus stats as
    generic (key, val) counter increments: ``__n_docs``,
    ``__tot_tokens``, and ``df:{term}`` per lexicon term — the rows a
    streaming ADD-merge counter store folds in. Bounded output:
    |terms| + 2 rows regardless of batch size (one map-side-combining
    aggregation)."""
    ts = tokens(text_col)
    row = docs.agg(
        F.count(F.lit(1)).alias("__n"),
        F.coalesce(F.sum(F.size(ts)), F.lit(0)).alias("__tot"),
        *[
            F.sum(F.array_contains(ts, F.lit(t)).cast("long")).alias(
                f"__df_{i}"
            )
            for i, t in enumerate(terms)
        ],
    )
    pairs = [
        F.struct(F.lit("__n_docs").alias("key"), F.col("__n").cast("bigint").alias("val")),
        F.struct(F.lit("__tot_tokens").alias("key"), F.col("__tot").cast("bigint").alias("val")),
        *[
            F.struct(
                F.lit(f"df:{t}").alias("key"),
                F.coalesce(F.col(f"__df_{i}"), F.lit(0)).cast("bigint").alias("val"),
            )
            for i, t in enumerate(terms)
        ],
    ]
    return row.select(F.explode(F.array(*pairs)).alias("kv")).select(
        "kv.key", "kv.val"
    )


def bm25_stats_from_counters(
    counters: dict[str, int], terms: list[str]
) -> tuple[int, int, dict[str, int]]:
    """Reassemble the :func:`corpus_stats` triple from a counter map
    (``streaming/counter_maintain.read_counters``)."""
    return (
        int(counters.get("__n_docs", 0)),
        int(counters.get("__tot_tokens", 0)),
        {t: int(counters.get(f"df:{t}", 0)) for t in terms},
    )


def proximity_rerank(
    candidates: DataFrame,
    terms: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    absent_gap: int = 1_000_000,
) -> DataFrame:
    """REAL reranking signal over a candidate set — no model stub:
    classic term-proximity. Appends

    - ``n_present``: how many distinct query terms the doc contains;
    - ``min_gap``: the smallest token-position distance between
      occurrences of two DIFFERENT query terms (``absent_gap`` when
      fewer than two are present) — tight phrases beat scattered
      mentions, the signal BM25's bag-of-words misses.

    Rerank order (the completing stage of candidate-gen → fuse →
    rerank): n_present desc, min_gap asc, then the caller's base score.
    All-integer arithmetic — bit-exact cross-engine.

    Scale: runs on the CANDIDATE set (top-n from BM25/ANN), never the
    corpus; per doc the work is |terms| position-array builds plus
    pairwise |A|·|B| gap minima over per-term occurrence counts —
    map-local array expressions, no shuffle, no UDF."""
    ts = tokens(text_col)

    def _positions(term: str) -> Column:
        return F.filter(
            F.transform(
                ts,
                lambda x, i: F.when(x == F.lit(term), i).otherwise(F.lit(-1)),
            ),
            lambda p: p >= 0,
        )

    pos = {t: _positions(t) for t in terms}
    present = None
    for t in terms:
        p = (F.size(pos[t]) > 0).cast("int")
        present = p if present is None else present + p
    gap = F.lit(int(absent_gap))
    for i in range(len(terms)):
        for j in range(i + 1, len(terms)):
            a, b = pos[terms[i]], pos[terms[j]]
            pair_min = F.coalesce(
                F.array_min(
                    F.flatten(
                        F.transform(
                            a,
                            lambda x: F.transform(b, lambda y: F.abs(x - y)),
                        )
                    )
                ),
                F.lit(int(absent_gap)),
            )
            gap = F.least(gap, pair_min)
    return candidates.withColumn("n_present", present.cast("int")).withColumn(
        "min_gap", gap.cast("int")
    )


def mmr_rerank(
    cands: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    rel_col: str = "rel",
    k: int = 5,
    lam: float = 0.7,
) -> DataFrame:
    """Maximal Marginal Relevance re-ranking (Carbonell & Goldstein
    1998): greedily pick ``k`` results, each round taking the candidate
    maximizing ``lam·rel − (1−lam)·max_sim_to_already_selected`` — the
    standard diversity-aware final stage after any relevance ranker.

    The greedy recurrence is intrinsically sequential in k, so the
    plan is k tiny rounds over the BOUNDED candidate set (the caller's
    top-N, already reduced by BM25/ANN — never the corpus): each round
    is one constant-key equi-join of the remaining candidates against
    the ≤k-row broadcast selected set, a per-candidate max, and an
    argmax with a total (score desc, id) tie-break. Similarities are
    rounded to 6 before the max and the blended score rounded again,
    so ULP drift cannot reorder picks cross-engine.

    ``cands``: (id, vector, rel) with rel already rounded. Returns
    (rank, id, rel, score) for the k picks.
    """
    from datagouv_tools_spark.functions.vectors import cosine

    sel = (
        cands.orderBy(F.desc(rel_col), id_col)
        .limit(1)
        .select(
            F.lit(1).alias("rank"),
            id_col,
            vec_col,
            rel_col,
            F.round(F.lit(lam) * F.col(rel_col), 6).alias("score"),
        )
        .localCheckpoint()
    )
    for r in range(2, k + 1):
        rest = cands.join(sel.select(id_col), id_col, "left_anti")
        sel_vecs = sel.select(
            F.lit(1).alias("__one"), F.col(vec_col).alias("__sv")
        )
        scored = (
            rest.withColumn("__one", F.lit(1))
            .join(F.broadcast(sel_vecs), "__one")
            .select(
                id_col,
                vec_col,
                rel_col,
                F.round(cosine(vec_col, "__sv"), 6).alias("__s"),
            )
            .groupBy(id_col, vec_col, rel_col)
            .agg(F.max("__s").alias("__ms"))
        )
        pick = (
            scored.select(
                F.lit(r).alias("rank"),
                id_col,
                vec_col,
                rel_col,
                F.round(
                    F.lit(lam) * F.col(rel_col)
                    - F.lit(1.0 - lam) * F.col("__ms"),
                    6,
                ).alias("score"),
            )
            .orderBy(F.desc("score"), id_col)
            .limit(1)
        )
        # the selected set is ≤k tiny rows but its lineage embeds every
        # previous round twice (anti-join + sim join) — left lazy, the
        # plan doubles per round (measured: 40 BNLJ subtrees at k=5).
        # localCheckpoint pins the rows and truncates the recurrence.
        sel = sel.unionByName(pick).localCheckpoint()
    return sel.drop(vec_col)
