"""Fuzzy-key matching: blocked edit-distance joins for record linkage.

The dedup problem the reference's own domain poses (SIRENE company
registries, FANTOIR street names: near-identical strings that exact
fingerprints miss), expressed scale-first: an ALL-PAIRS Levenshtein
join is O(n²) string kernels and dies at any size, so candidates come
from a deterministic BLOCKING key equi-join (same-block rows only) and
the edit-distance verify runs on candidates alone — the classic
blocking/verification split of record-linkage systems, the same
candidate-then-verify architecture as the MinHash/LSH near-dup front.

Both stages are JVM built-ins (``F.levenshtein`` inside codegen, no
UDF) and DuckDB ships the identical classic Levenshtein, so fuzzy
matches are value-hash oracle-checkable cross-engine.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "fuzzy_pairs",
    "prefix_length_block",
    "sorted_neighborhood_pairs",
    "deletion_neighborhood_pairs",
]


def prefix_length_block(key_col: str, prefix_len: int) -> Column:
    """The standard cheap blocking key: (first ``prefix_len`` chars,
    total length). Misses pairs whose edits touch the prefix or change
    the length beyond the block — the documented recall trade every
    blocking scheme makes; widen by unioning candidates from several
    block definitions (e.g. prefix of the REVERSED string) when recall
    matters more than candidate count."""
    return F.concat_ws(
        "|",
        F.substring(F.col(key_col), 1, prefix_len),
        F.length(F.col(key_col)).cast("string"),
    )


def fuzzy_pairs(
    df: DataFrame,
    key_col: str,
    id_col: str,
    block: Column,
    max_distance: int = 1,
) -> DataFrame:
    """Candidate pairs (id_a < id_b) whose keys are within
    ``max_distance`` edits, generated ONLY within blocks.

    Scale shape: one shuffle of (block, id, key) on the block key; the
    per-block self-join is the quadratic zone, so block granularity is
    the operator's real knob — size blocks so m² string kernels per
    block stay executor-friendly, exactly the bucket-width discipline
    the LSH near-dup front documents. Levenshtein only ever runs on
    same-block candidates, inside whole-stage codegen."""
    keyed = df.select(
        F.col(id_col), F.col(key_col), block.alias("__block")
    )
    a = keyed.select(
        F.col(id_col).alias("id_a"),
        F.col(key_col).alias("__ka"),
        "__block",
    )
    b = keyed.select(
        F.col(id_col).alias("id_b"),
        F.col(key_col).alias("__kb"),
        "__block",
    )
    return (
        a.join(b, "__block")
        .filter(F.col("id_a") < F.col("id_b"))
        # threshold arg = banded DP with early exit (returns -1 beyond
        # the bound instead of filling the full matrix) — the kernel
        # cost per candidate drops from O(|a|·|b|) to O(k·min(|a|,|b|)).
        # Kept rows carry the TRUE distance, so results (and the plain-
        # levenshtein oracle) are unchanged.
        .withColumn(
            "distance", F.levenshtein("__ka", "__kb", max_distance)
        )
        .filter((F.col("distance") >= 0) & (F.col("distance") <= max_distance))
        .select("id_a", "id_b", "distance")
    )


def sorted_neighborhood_pairs(
    df: DataFrame,
    key_col: str,
    id_col: str,
    sort_key: Column,
    window: int = 5,
    max_distance: int = 1,
) -> DataFrame:
    """Sorted-neighborhood candidate pairs (Hernández & Stolfo 1995):
    rank rows by ``sort_key`` (id tie-break) and compare each row only
    against the ``window`` rows after it, then verify with the banded
    Levenshtein. The other classic blocking scheme: where a prefix
    block misses edits that touch the prefix, a sliding neighborhood
    over a well-chosen sort key still co-locates them — production
    systems union candidates from several passes with different keys.

    Scale shape: candidates come from an EQUI-join on (rank + offset)
    — offsets exploded from a literal 1..window sequence — so the
    candidate count is exactly n·window, linear in the data, never a
    quadratic block zone. Ranking is the repo's range-partitioned
    two-pass rank (operators/ranking.distributed_row_number): one
    parallel range shuffle + local sort + bounded offset carry — no
    ``Exchange SinglePartition`` anywhere, so the sort that feeds the
    neighborhood scales with the cluster instead of funneling the
    corpus through one task. Rank values equal the global row_number
    exactly (equivalence is pytest-pinned), so pair generation and
    the verify are unchanged.
    """
    from datagouv_tools_spark.operators.ranking import distributed_row_number

    ranked = distributed_row_number(
        df.select(F.col(id_col), F.col(key_col)),
        [sort_key, F.col(id_col)],
        rank_col="__rn",
        # pin: the (id, key) projection is two narrow columns — cheaper
        # to materialize once than to recompute the caller's derivation
        # for the range layout's boundary sampler
        pin_input=True,
    )
    a = ranked.select(
        F.col(id_col).alias("id_a"),
        F.col(key_col).alias("__ka"),
        "__rn",
        F.explode(
            F.sequence(F.lit(1), F.lit(window))
        ).alias("__off"),
    ).select("id_a", "__ka", (F.col("__rn") + F.col("__off")).alias("__rn"))
    b = ranked.select(
        F.col(id_col).alias("id_b"), F.col(key_col).alias("__kb"), "__rn"
    )
    return (
        a.join(b, "__rn")
        .withColumn("distance", F.levenshtein("__ka", "__kb", max_distance))
        .filter(
            (F.col("distance") >= 0) & (F.col("distance") <= max_distance)
        )
        .select(
            F.least("id_a", "id_b").alias("id_a"),
            F.greatest("id_a", "id_b").alias("id_b"),
            "distance",
        )
        .distinct()
    )


def deletion_neighborhood_pairs(
    df: DataFrame,
    key_col: str,
    id_col: str,
    max_distance: int = 1,
) -> DataFrame:
    """ALL pairs within edit distance 1, via FastSS deletion
    neighborhoods (Bocek et al. 2007) — complete recall with LINEAR
    candidate volume, no blocking-key recall trade and no quadratic
    block zone.

    Why it exists (r11): ``prefix_length_block`` is only as good as
    the data — on registry-style uniform keys (``Customer#%09d``,
    SIRENE's zero-padded SIREN numbers) every row shares one
    (prefix, length) block and the "m² per block" discipline silently
    becomes n² corpus-wide (measured: the x1000 curve sweep hung on
    exactly this shape — 150k same-block names = 11G kernel pairs).
    Deletion neighborhoods have no such degenerate input: two keys are
    within one edit IFF they share a member of their deletion-1
    neighborhoods (the key itself plus every single-character
    deletion), so candidates come from an EQUI-join on variant
    strings. A key of length L yields L+1 variants — n·(L+1) rows
    total, and a variant's multiplicity is bounded by the true
    near-duplicate density, not by how the corpus happens to block.
    The Levenshtein verify (shared variant only implies distance ≤ 2)
    then runs on candidates alone, inside codegen.

    Right tool for SHORT keys (names, identifiers: the shuffle moves
    ~L·(L+1) bytes per row); for long text use the MinHash/LSH front.
    ``max_distance`` is pinned to 1 — higher k needs k-deletion
    neighborhoods whose variant count grows L^k; raise loudly rather
    than silently under-recall."""
    if max_distance != 1:
        raise ValueError(
            "deletion_neighborhood_pairs implements max_distance=1 "
            "(k-deletion neighborhoods for k>1 grow as L^k; use "
            "fuzzy_pairs with a domain blocking key instead)"
        )
    variants = F.expr(
        f"""array_union(
              array({key_col}),
              if(length({key_col}) = 0,
                 array({key_col}),
                 transform(sequence(1, length({key_col})),
                           i -> concat(substring({key_col}, 1, i - 1),
                                       substring({key_col}, i + 1,
                                                 length({key_col}) - i)))))"""
    )
    keyed = df.select(
        F.col(id_col),
        F.col(key_col),
        F.explode(variants).alias("__var"),
    # Pre-partition the variant table ONCE by the join key so the
    # self-join's two sides share a single exchange (ReusedExchange in
    # the plan): one shuffle of n·(L+1) variant rows instead of two.
    # No explicit partition count — AQE sizes the layout from the
    # actual shuffle bytes (guide §2.2).
    ).repartition(F.col("__var"))
    a = keyed.select(
        F.col(id_col).alias("id_a"), F.col(key_col).alias("__ka"), "__var"
    )
    b = keyed.select(
        F.col(id_col).alias("id_b"), F.col(key_col).alias("__kb"), "__var"
    )
    return (
        # MERGE hint: both sides are the SAME SF-scaling exploded
        # table, so the only sane strategy at scale is sort-merge over
        # the shared layout. Without the hint, Catalyst's size estimate
        # at bench scale puts the build side under
        # autoBroadcastJoinThreshold and BROADCASTS the scaling
        # variant table — collect + build + ship of the whole exploded
        # set (measured 2.6x slower than SMJ at sf0.1, and the
        # estimate would flip strategies with SF; guide §3.1: pick the
        # join strategy deliberately).
        a.hint("merge").join(b, "__var")
        .filter(F.col("id_a") < F.col("id_b"))
        # VERIFY FIRST, dedupe after: a pair can share several
        # variants, but the banded Levenshtein is ~free per candidate
        # while a distinct over (ids, key, key) string rows costs a
        # wide shuffle of the whole candidate set. Verifying the raw
        # join output leaves a distinct over three narrow int columns
        # of only the TRUE matches (measured 16x faster at sf0.1:
        # 6.9s -> 0.4s, same 262,500 pairs).
        .withColumn("distance", F.levenshtein("__ka", "__kb", 1))
        .filter((F.col("distance") >= 0) & (F.col("distance") <= 1))
        .select("id_a", "id_b", "distance")
        .distinct()
    )
