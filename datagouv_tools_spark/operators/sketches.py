"""Mergeable sketch builders shared by the query surface and the
streaming maintainers.

Two sketches, one design rule — constant-size state with an exact
merge operation, so shards/batches/days combine without touching raw
data again:

- **Count-min** (`cms_cells`): d×w integer cells; frequency estimate =
  min over rows; merge = cell-wise ADD. Estimates never undercount.
- **MinCount / KMV distinct** (`mincount_buckets`): per group, k bucket
  minima of the hash tail; distinct estimate = Σ (2^53/(m_b+1) − 1);
  merge = bucket-wise MIN.

Both run in md5 hash mode by default here because the query surface
(doc_token_cms, events_distinct_sketch) pins cross-engine oracles on
md5 arithmetic; production pipelines that don't need a DuckDB twin can
swap xxhash64 for ~2× cheaper hashing with identical structure.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from datagouv_tools_spark.functions.xhash import md5_hash60

__all__ = ["cms_index", "cms_cells", "mincount_buckets"]


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
