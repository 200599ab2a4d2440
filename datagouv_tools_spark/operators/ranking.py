"""Distributed total-order ranking — global ``row_number`` without a
single-partition sort.

A plain ``row_number() OVER (ORDER BY k)`` plans ``Exchange
SinglePartition``: every row funnels into ONE task that sorts the whole
table — the classic scale cliff of global ranks. This module provides
the two-pass range-partitioned equivalent used across the repo's scale
paths (the layout the sweep-line / cumulative-distinct queries
document):

1. ``repartitionByRange(P, key)`` — one parallel shuffle; partition i
   holds the i-th key range, so concatenating partitions in id order IS
   the global sort order.
2. ``sortWithinPartitions(key)`` + ``monotonically_increasing_id()`` —
   a local sort (no exchange) and a partition-local position: Spark
   encodes ``mid = pid·2³³ + row-in-partition``, assigned in the sorted
   row order because the nondeterministic projection cannot be
   reordered past the sort.
3. The per-partition row counts are a BOUNDED domain (≤ P rows, the
   partition count — thousands at 100 TB, never data-sized), collected
   to the driver to build the running offset per partition, carried
   back with a broadcast hash join. No window over the counts, so no
   ``Exchange SinglePartition`` appears even for the offset carry.

The partition layout is pinned with an eager ``localCheckpoint`` BEFORE
the counts are read: ``repartitionByRange`` samples its boundaries per
job, so without the checkpoint the count job and the consuming job
could each draw different boundaries and the offsets would not match
the pids. The checkpoint both freezes the layout and lets downstream
consumers (self-joins over the ranked rows) re-read materialized
partitions instead of re-shuffling.

Rank values equal the global ``row_number`` exactly — the order is the
lexicographic (key, tiebreak) tuple order, which range partitioning
preserves across partition boundaries — so swapping this in under any
consumer leaves results (and value-hash oracles) unchanged.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "distributed_row_number",
    "distributed_ntile",
    "distributed_rank_cumsum",
]


def distributed_row_number(
    df: DataFrame,
    order_by: list[Column],
    rank_col: str = "__rn",
    num_ranges: int = 0,
) -> DataFrame:
    """``df`` plus ``rank_col`` = 1-based global row number ordered by
    ``order_by`` (caller supplies a total order — append a unique id as
    the last sort key), computed with one range shuffle and no
    single-partition exchange.

    The returned frame is backed by an eager ``localCheckpoint`` (the
    layout pin described in the module docstring), so callers that scan
    it multiple times — e.g. both sides of a neighborhood self-join —
    re-read materialized partitions.
    """
    spark = df.sparkSession
    if num_ranges <= 0:
        num_ranges = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))

    sort_cols = [c.alias(f"__sk{i}") for i, c in enumerate(order_by)]
    keyed = df.select("*", *sort_cols)
    sk_names = [f"__sk{i}" for i in range(len(order_by))]
    laid = (
        keyed.repartitionByRange(num_ranges, *[F.col(c) for c in sk_names])
        .sortWithinPartitions(*sk_names)
        .withColumn("__mid", F.monotonically_increasing_id())
        .localCheckpoint()
    )
    # mid = pid·2³³ + local position (0-based); split it back out.
    laid = laid.select(
        "*",
        F.shiftright("__mid", 33).alias("__pid"),
        (F.col("__mid") - (F.shiftright("__mid", 33) * (1 << 33))).alias(
            "__lrn"
        ),
    )
    # Bounded driver round-trip: ≤ num_ranges rows, never data-sized.
    counts = sorted(
        (r["__pid"], r["n"])
        for r in laid.groupBy("__pid").agg(F.count(F.lit(1)).alias("n")).collect()
    )
    offsets, acc = [], 0
    for pid, n in counts:
        offsets.append((pid, acc))
        acc += n
    if not offsets:
        return laid.select(
            *df.columns, (F.lit(1) + F.col("__lrn")).alias(rank_col)
        )
    off_df = spark.createDataFrame(offsets, "__pid bigint, __off bigint")
    return (
        laid.join(F.broadcast(off_df), "__pid")
        .select(
            *df.columns,
            (F.col("__off") + F.col("__lrn") + 1).alias(rank_col),
        )
    )


def distributed_ntile(
    df: DataFrame,
    n_buckets: int,
    order_by: list[Column],
    bucket_col: str = "__bucket",
    num_ranges: int = 0,
) -> DataFrame:
    """``df`` plus ``bucket_col`` = NTILE(n_buckets) over the given
    total order, without a single-partition window sort.

    NTILE is pure arithmetic on (rank, n): with q = n div k and
    r = n mod k, the first r buckets hold q+1 rows and the rest q (the
    SQL-standard rule, identical in Spark and DuckDB) — so the rank
    from :func:`distributed_row_number` plus one scalar row count
    reproduces NTILE exactly, and any consumer's value-hash oracle is
    unchanged by the swap.
    """
    ranked = distributed_row_number(
        df, order_by, rank_col="__rk", num_ranges=num_ranges
    )
    n = ranked.agg(F.max("__rk").cast("bigint").alias("__n"))
    k = int(n_buckets)
    bucket = F.expr(
        f"CASE WHEN __rk <= (__n % {k}) * (__n div {k} + 1)"
        f"     THEN (__rk + __n div {k}) div (__n div {k} + 1)"
        f"     ELSE (__n % {k}) + 1 + (__rk - (__n % {k}) * (__n div {k} + 1) - 1)"
        f"          div (__n div {k}) END"
    )
    return (
        ranked.crossJoin(F.broadcast(n))
        .select(*df.columns, bucket.cast("int").alias(bucket_col))
    )


def distributed_rank_cumsum(
    df: DataFrame,
    order_by: list[Column],
    sum_col: str,
    rank_col: str = "__rn",
    cumsum_col: str = "__cum",
    num_ranges: int = 0,
) -> DataFrame:
    """``df`` plus ``rank_col`` (global row number) AND ``cumsum_col``
    (running sum of ``sum_col`` over the same total order) — the
    distributed prefix-sum layout: one range shuffle pins the order,
    per-partition totals (a bounded ≤num_ranges-row collect) become
    broadcast rank/sum offsets, and the within-partition running sum
    rides a window PARTITIONED BY the range id — a parallel hash
    exchange, never an Exchange SinglePartition.

    The classic Pareto / cumulative-share / equi-depth machinery at
    cluster scale: ``cumsum_col`` equals the single-task
    ``SUM() OVER (ORDER BY ...)`` exactly (integer sums — no
    reassociation drift), so consumers' value-hash oracles are
    unchanged by the swap.
    """
    from pyspark.sql.window import Window

    spark = df.sparkSession
    if num_ranges <= 0:
        num_ranges = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))

    sort_cols = [c.alias(f"__sk{i}") for i, c in enumerate(order_by)]
    keyed = df.select("*", *sort_cols)
    sk_names = [f"__sk{i}" for i in range(len(order_by))]
    laid = (
        keyed.repartitionByRange(num_ranges, *[F.col(c) for c in sk_names])
        .sortWithinPartitions(*sk_names)
        .withColumn("__mid", F.monotonically_increasing_id())
        .localCheckpoint()
    )
    laid = laid.select(
        "*",
        F.shiftright("__mid", 33).alias("__pid"),
        (F.col("__mid") - (F.shiftright("__mid", 33) * (1 << 33))).alias(
            "__lrn"
        ),
    )
    # Bounded driver round-trip: ≤ num_ranges rows of (count, sum).
    per_pid = sorted(
        (r["__pid"], r["n"], r["s"])
        for r in laid.groupBy("__pid")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(sum_col).cast("bigint").alias("s"),
        )
        .collect()
    )
    offsets, n_acc, s_acc = [], 0, 0
    for pid, n, s in per_pid:
        offsets.append((pid, n_acc, s_acc))
        n_acc += n
        s_acc += int(s or 0)
    if not offsets:
        return laid.select(
            *df.columns,
            (F.lit(1) + F.col("__lrn")).alias(rank_col),
            F.col(sum_col).cast("bigint").alias(cumsum_col),
        )
    off_df = spark.createDataFrame(
        offsets, "__pid bigint, __noff bigint, __soff bigint"
    )
    win = (
        Window.partitionBy("__pid")
        .orderBy(*sk_names)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        laid.join(F.broadcast(off_df), "__pid")
        .select(
            *df.columns,
            (F.col("__noff") + F.col("__lrn") + 1).alias(rank_col),
            (
                F.col("__soff")
                + F.sum(F.col(sum_col)).over(win).cast("bigint")
            )
            .cast("bigint")
            .alias(cumsum_col),
        )
    )
