"""Deduplication operators for document-scale pipelines.

Five strategies, cheapest to richest, all shuffle-planned for 100 TB:

- ``dedup_exact``          — hash-groupBy on a key (or fingerprint);
  one shuffle, map-side partial agg. The representative row is chosen
  deterministically (min id), never "whichever survived".
- ``dedup_fingerprint``    — exact dedup on the whitespace/case-
  normalized md5 fingerprint.
- ``minhash_pairs``        — MinHash + LSH banding: near-dup *pairs*
  without the O(n²) cross join. k hash functions over token sets →
  b bands of r rows → candidates share a (band, band-hash) bucket.
  Shuffles: one explode-shuffle per doc (k·|tokens| stays map-local),
  one bucket-join. Hand-rolled on xxhash64 (deterministic, JVM-side)
  rather than pyspark.ml so it runs on plain DataFrames.
- ``simhash64``            — 64-bit SimHash signature per doc;
  near-dups = small Hamming distance. Signature is one narrow column:
  at 100 TB you join on a few signature bands, not the text.
- ``ngram_jaccard_pairs``  — exact token-set Jaccard for candidate
  pairs (the verifier stage after MinHash/SimHash blocking; or standalone
  with a blocking key at small scale).

plus ``approx_distinct`` — HLL count-distinct for budget checks.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from datagouv_tools_spark.functions.text import fingerprint_md5, tokens
from datagouv_tools_spark.functions.xhash import token_hash_expr

__all__ = [
    "dedup_exact",
    "dedup_fingerprint",
    "minhash_signatures",
    "minhash_pairs",
    "simhash64",
    "ngram_jaccard_pairs",
    "approx_distinct",
]

# Fixed, public mixing constants for the k MinHash permutations —
# deterministic across runs and engines. The 2^31-1 Mersenne prime keeps
# h·a + b < 2^63, so the affine permutations never overflow ANSI bigint
# arithmetic.
_MERSENNE_PRIME = (1 << 31) - 1


def _hash_params(k: int, seed: int = 42) -> list[tuple[int, int]]:
    """k (a, b) pairs for h_i(x) = (a·x + b) mod p, seeded deterministically."""
    params = []
    state = seed
    for _ in range(k):
        state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 63)
        a = state | 1  # odd
        state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 63)
        b = state
        params.append((a % _MERSENNE_PRIME, b % _MERSENNE_PRIME))
    return params


def dedup_exact(df: DataFrame, key_cols: list[str], id_col: str) -> DataFrame:
    """Keep one row per key: the one with the minimal id (deterministic,
    unlike dropDuplicates). Implemented as min-id semi-join so ALL
    columns survive; single shuffle on key_cols."""
    winners = df.groupBy(*key_cols).agg(F.min(id_col).alias(id_col))
    return df.join(winners, on=key_cols + [id_col], how="left_semi")


def dedup_fingerprint(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Exact dedup on the normalized-text fingerprint."""
    with_fp = df.withColumn("__fp", fingerprint_md5(text_col))
    return dedup_exact(with_fp, ["__fp"], id_col).drop("__fp")


def minhash_signatures(
    df: DataFrame,
    text_col: str,
    id_col: str,
    k: int = 64,
    seed: int = 42,
    token_hash: str = "xxhash64",
) -> DataFrame:
    """(id, signature array<bigint>[k]) per document.

    Token → hash (JVM) → k affine permutations → per-permutation min
    over the token set. All expression-level: transform + array_min,
    no explode, no shuffle. ``token_hash="md5"`` swaps xxhash64 for the
    cross-engine 60-bit md5 hash (functions/xhash.py) so a SQL oracle
    can recompute the exact signatures."""
    params = _hash_params(k, seed)
    tok_hashes = F.transform(
        F.array_distinct(tokens(text_col)),
        lambda t: F.abs(token_hash_expr(t, token_hash)) % F.lit(_MERSENNE_PRIME),
    )

    def permute(a: int, b: int):
        # closure factory: a default-arg lambda would change the Python
        # arity and break pyspark's higher-order-function binding
        return lambda h: (h * F.lit(a) + F.lit(b)) % F.lit(_MERSENNE_PRIME)

    sig = F.array(
        *[F.array_min(F.transform(tok_hashes, permute(a, b))) for a, b in params]
    )
    return df.select(F.col(id_col), sig.alias("signature"))


def minhash_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    k: int = 64,
    bands: int = 16,
    seed: int = 42,
    token_hash: str = "xxhash64",
    band_key: str = "hash",
) -> DataFrame:
    """Candidate near-duplicate pairs via LSH banding (id_a < id_b).

    rows-per-band r = k // bands; docs sharing any band bucket become a
    candidate pair. Pair generation is a self-join on (band_idx,
    band_hash) — the shuffle key is the bucket, so skew only appears if
    a bucket is huge (i.e. true mass duplication — exactly when you
    want the work).

    ``band_key="hash"`` (default) joins on xxhash64 of the band values
    (narrow 8-byte shuffle key — the 100 TB choice); ``"values"`` joins
    on the concatenated values themselves: collision-free and exactly
    reproducible by a SQL oracle comparing raw signature slices."""
    r = k // bands
    sigs = minhash_signatures(df, text_col, id_col, k, seed, token_hash)

    def band_expr(band: int) -> Column:
        joined = F.concat_ws(
            ",", *[F.col("signature")[band * r + i] for i in range(r)]
        )
        return F.xxhash64(joined) if band_key == "hash" else joined

    band_entries = sigs.select(
        F.col(id_col),
        F.posexplode(F.array(*[band_expr(b) for b in range(bands)])).alias(
            "band_idx", "band_hash"
        ),
    )
    a = band_entries.alias("a")
    b = band_entries.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
        )
        .distinct()
    )


def simhash64(
    df: DataFrame,
    text_col: str,
    id_col: str,
    token_hash: str = "xxhash64",
) -> DataFrame:
    """(id, simhash bigint): sign-aggregated 64-bit token-hash sketch.

    Explode-free: per bit j, count tokens with bit j set minus tokens
    with it clear, via transform + aggregate over the token array; bit
    j of the signature = (sum > 0).

    ``token_hash="md5"`` uses the cross-engine 60-bit hash: the
    signature narrows to 60 bits (always positive — no signed-shift
    ambiguity between engines) and a SQL oracle can recompute it
    bit-for-bit with plain bigint arithmetic."""
    n_bits = 64 if token_hash == "xxhash64" else 60
    tok_hashes = F.transform(tokens(text_col), lambda t: token_hash_expr(t, token_hash))

    def bit_contrib(j: int):
        return lambda acc, h: acc + F.when(
            F.shiftright(h, j).bitwiseAND(F.lit(1)) == 1, 1
        ).otherwise(-1)

    bit_exprs = []
    for j in range(n_bits):
        contrib = F.aggregate(tok_hashes, F.lit(0), bit_contrib(j))
        bit = F.when(contrib > 0, F.lit(1).cast("bigint")).otherwise(
            F.lit(0).cast("bigint")
        )
        # shiftleft (not * 2^j): 1<<63 overflows a long literal, the
        # shift is the defined two's-complement bit pattern
        bit_exprs.append(F.shiftleft(bit, j))
    sig = bit_exprs[0]
    for e in bit_exprs[1:]:
        sig = sig.bitwiseOR(e)
    return df.select(F.col(id_col), sig.alias("simhash"))


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    threshold: float = 0.7,
    round_to: int = 6,
) -> DataFrame:
    """Exact token-set Jaccard pairs (id_a < id_b, jaccard ≥ threshold).

    O(n²) within the input — at scale, feed it LSH/blocking candidates,
    not a whole corpus. Intersection/union sizes are integers, so the
    rounded ratio is deterministic across engines (oracle-checkable)."""
    toks = df.select(
        F.col(id_col), F.array_distinct(tokens(text_col)).alias("ts")
    )
    a, b = toks.alias("a"), toks.alias("b")
    inter = F.size(F.array_intersect(F.col("a.ts"), F.col("b.ts")))
    union = F.size(F.col("a.ts")) + F.size(F.col("b.ts")) - inter
    jaccard = F.round(inter.cast("double") / union.cast("double"), round_to)
    return (
        a.join(b, F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            jaccard.alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def approx_distinct(df: DataFrame, col: str, rsd: float = 0.05) -> DataFrame:
    """HLL approximate count-distinct — the 100 TB cardinality probe."""
    return df.agg(F.approx_count_distinct(col, rsd).alias("approx_distinct"))


def dedup_clusters(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 25,
) -> DataFrame:
    """Connected components over near-duplicate pairs → (node,
    cluster_id), cluster_id = min node id in the component. The
    canonical "keep one per cluster" step after any pair generator
    (MinHash bands, SimHash, embedding cosine).

    Iterative min-label propagation: each round joins labels to edges,
    takes the neighborhood min, and stops when no label changes — the
    fixpoint is unique, so results are deterministic and
    oracle-checkable (recursive CTE in SQL). ``localCheckpoint`` per
    round truncates lineage (an unbounded iterative plan otherwise
    recompiles and re-executes from scratch each round).

    Scale: each round is one shuffle of |E| on the join key; rounds ≈
    graph diameter (near-dup components are shallow — a few rounds).
    For deep chains at 100 TB, swap in large-star/small-star; the
    operator contract stays the same.
    """
    from pyspark.sql import functions as F

    fwd = pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
    edges = (
        fwd.union(fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .distinct()
        # materialize once: edges are re-joined every round, and without
        # this the (possibly expensive) pair-generation lineage re-executes
        # per iteration — measured 33s -> ~6s at sf0.1 with the BLAS
        # near-dup kernel upstream
        .localCheckpoint()
    )
    labels = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("lbl", F.col("node"))
        .localCheckpoint()
    )
    for _ in range(max_iter):
        neighbor_min = (
            edges.join(labels, edges.src == labels.node)
            .groupBy(F.col("dst").alias("nb_node"))
            .agg(F.min("lbl").alias("nb_lbl"))
        )
        propagated = labels.join(
            neighbor_min, labels.node == F.col("nb_node"), "left"
        ).select(
            "node",
            F.least(F.col("lbl"), F.coalesce(F.col("nb_lbl"), F.col("lbl"))).alias(
                "lbl"
            ),
        )
        # pointer jumping (path halving): lbl ← lbl(lbl). Labels only
        # decrease, so composing the mapping with itself shortcuts label
        # chains and convergence drops from O(diameter) to O(log d)
        # rounds — each round is the expensive unit (a full shuffle +
        # action), so halving rounds matters more than the extra join.
        hop = propagated.select(
            F.col("node").alias("h_node"), F.col("lbl").alias("h_lbl")
        )
        new_labels = (
            propagated.join(hop, propagated.lbl == F.col("h_node"), "left")
            .select(
                "node",
                F.least(F.col("lbl"), F.coalesce(F.col("h_lbl"), F.col("lbl"))).alias(
                    "lbl"
                ),
            )
            .localCheckpoint()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.lbl") != F.col("o.lbl"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels.select("node", F.col("lbl").alias("cluster_id"))
