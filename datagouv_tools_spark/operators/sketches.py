"""Mergeable sketch builders shared by the query surface and the
streaming maintainers.

Three sketches, one design rule — constant-size state with an exact
merge operation, so shards/batches/days combine without touching raw
data again:

- **Count-min** (`cms_cells`): d×w integer cells; frequency estimate =
  min over rows; merge = cell-wise ADD. Estimates never undercount.
- **MinCount / KMV distinct** (`mincount_buckets`): per group, k bucket
  minima of the hash tail; distinct estimate = Σ (2^53/(m_b+1) − 1);
  merge = bucket-wise MIN.
- **Fixed-bin histogram** (`histogram_cells`): per group, ≤ n_bins
  integer counts; quantile estimate = first bin whose cumulative count
  reaches ⌈q·total⌉ (`histogram_quantiles`), error bounded by one bin
  width; merge = bin-wise ADD. Integer-exact end to end — the one
  distribution sketch whose estimates a SQL oracle reproduces
  bit-for-bit (t-digest/KLL centroids are float-order-dependent).

CMS and MinCount run in md5 hash mode by default here because the
query surface (doc_token_cms, events_distinct_sketch) pins
cross-engine oracles on md5 arithmetic; production pipelines that
don't need a DuckDB twin can swap xxhash64 for ~2× cheaper hashing
with identical structure. The histogram needs no hash at all.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from datagouv_tools_spark.functions.xhash import md5_hash60

__all__ = [
    "cms_index",
    "cms_cells",
    "cms_cells_single_digest",
    "mincount_buckets",
    "histogram_cells",
    "histogram_quantiles",
]


def cms_index(tok: Column, i: Column, width: int = 1024) -> Column:
    """Counter index of token ``tok`` in CMS row ``i`` (md5 mode — the
    exact arithmetic doc_token_cms's oracle reproduces)."""
    return md5_hash60(F.concat(tok, F.lit(":cms"), i.cast("string"))) % width


def cms_cells(
    tokens: DataFrame,
    token_col: str = "tok",
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Aggregate a token-occurrence stream into CMS cells ``(i, idx,
    c)`` — one map-side-combining aggregation over the d×-exploded
    stream; output is ≤ depth·width rows regardless of vocabulary."""
    rows = F.array(*[F.lit(i) for i in range(depth)])
    return (
        tokens.select(F.col(token_col).alias("tok"), F.explode(rows).alias("i"))
        .select("i", cms_index(F.col("tok"), F.col("i"), width).alias("idx"))
        .groupBy("i", "idx")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def cms_cells_single_digest(
    tokens: DataFrame,
    token_col: str = "tok",
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """`cms_cells`, but all ``depth`` row indexes come from disjoint
    7-hex-char (28-bit) slices of ONE md5 digest per token — one hash
    instead of ``depth``, which is the dominant cost of a key-stream
    sketch (measured ~3.5× on the join-size estimator's build). The
    slices are independent enough for w ≤ 2^28-ish widths; callers
    needing depth·28 > 128 bits fall back to `cms_cells`.

    DuckDB twin per row i:
        ('0x' || substr(md5(tok), 1 + i*7, 7))::BIGINT % width
    """
    if depth * 7 > 32:
        raise ValueError("md5 digest has 32 hex chars; depth must be <= 4")
    digest = F.md5(F.col(token_col))
    idxs = F.array(
        *[
            F.conv(F.substring(digest, 1 + 7 * i, 7), 16, 10).cast("bigint")
            % width
            for i in range(depth)
        ]
    )
    return (
        tokens.select(F.posexplode(idxs).alias("i", "idx"))
        .groupBy("i", "idx")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def mincount_buckets(
    df: DataFrame,
    group_cols: list[str],
    key: Column,
    n_buckets: int = 64,
    salt: str = ":ds",
) -> DataFrame:
    """Per-group MinCount buckets ``(… group cols …, b, mv)`` — the
    events_distinct_sketch state. Merge across shards by min(mv)."""
    h = md5_hash60(F.concat(key.cast("string"), F.lit(salt)))
    return (
        df.select(*group_cols, h.alias("__h"))
        .select(
            *group_cols,
            (F.col("__h") % n_buckets).alias("b"),
            F.expr("__h DIV 128").alias("v"),
        )
        .groupBy(*group_cols, "b")
        .agg(F.min("v").alias("mv"))
    )


def histogram_cells(
    df: DataFrame,
    group_cols: list[str],
    value: Column,
    bin_width: float = 25.0,
    n_bins: int = 20,
) -> DataFrame:
    """Per-group fixed-bin histogram ``(… group cols …, b, c)``:
    b = min(floor(value / bin_width), n_bins − 1) (the last bin absorbs
    the tail), c = count. One map-side-combining aggregation; output is
    ≤ |groups| · n_bins rows regardless of input size. Merge across
    shards/batches by bin-wise ADD (non-idempotent — streaming
    maintenance needs the CMS-style replay tag)."""
    b = F.greatest(
        F.lit(0),
        F.least(
            F.floor(value / F.lit(float(bin_width))).cast("int"),
            F.lit(int(n_bins) - 1),
        ),
    )
    return (
        df.select(*group_cols, b.alias("b"))
        .groupBy(*group_cols, "b")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def histogram_quantiles(
    cells: DataFrame,
    group_cols: list[str],
    q_milles: list[int],
    bin_width: float = 25.0,
) -> DataFrame:
    """Quantile estimates from histogram cells: for each q (given in
    permille so the rank arithmetic stays integer-exact), the estimate
    is the UPPER EDGE of the first bin whose cumulative count reaches
    rank = ⌈q‰ · total / 1000⌉ — deterministic, mergeable-input, and
    within one bin width of the true quantile by construction. Output:
    group cols + total + ``p{q}`` bigint columns (edge = (b+1)·width,
    rounded to bigint — exact for integer widths).

    Scale: the input is the SKETCH (≤ groups × bins rows), so the
    window/aggregation here is over bounded state, never raw data."""
    agg = cells.groupBy(*group_cols).agg(
        F.sum("c").alias("total"),
        F.sort_array(F.collect_list(F.struct("b", "c"))).alias("bins"),
    )
    cols = [*group_cols, F.col("total").cast("bigint").alias("total")]
    for qm in q_milles:
        # cumulative scan over the ≤ n_bins array: first bin whose
        # running count reaches rank = ⌈total·qm/1000⌉ (pure integers)
        edge_bin = F.expr(
            "bins[CAST(aggregate(bins, named_struct('cum', CAST(0 AS BIGINT),"
            " 'idx', -1, 'found', -1),"
            " (acc, x) -> named_struct("
            "   'cum', acc.cum + x.c,"
            "   'idx', acc.idx + 1,"
            "   'found', CASE WHEN acc.found >= 0 THEN acc.found"
            f"     WHEN acc.cum + x.c >= CAST((total * {int(qm)} + 999) DIV 1000 AS BIGINT)"
            "     THEN acc.idx + 1 ELSE -1 END),"
            " acc -> acc.found) AS INT)].b"
        )
        cols.append(
            (
                (edge_bin.cast("bigint") + F.lit(1))
                * F.lit(int(bin_width))
            ).cast("bigint").alias(f"p{qm}")
        )
    return agg.select(*cols)
