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

Partition-count sizing: when the caller passes no ``num_ranges`` hint,
the range shuffle is emitted WITHOUT an explicit partition count, which
marks it AQE-coalescible — Spark's CoalesceShufflePartitions then sizes
the layout from the actual shuffle bytes (merging only ADJACENT
partitions, so range order is preserved and the pid→offset math is
unaffected). Aggregate-grain inputs (an RFM table of 15k customers)
collapse to a handful of partitions instead of ``shuffle.partitions``
near-empty ones, while a 100 TB input still fans out to
``bytes / advisoryPartitionSizeInBytes`` ranges. With AQE disabled the
no-hint path degrades to ``shuffle.partitions``, the pre-round-8
behavior.

Descending orders ride ascending sorts on NEGATED keys at the call
sites (``-F.col(x)``): exact for the non-null bounded integers those
callers rank, but note the precondition — Spark's ``desc`` is
nulls-last while ASC-on-negation puts nulls FIRST, and ``-x`` overflows
on ``LONG_MIN`` under ANSI mode. Callers ranking nullable or full-range
keys must pre-coalesce / widen, or sort on an order-reversing bijection
that handles nulls explicitly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "distributed_row_number",
    "distributed_row_number_total",
    "distributed_ntile",
    "distributed_rank_cumsum",
]


def _range_layout(
    keyed: DataFrame, sk_names: list[str], num_ranges: int
) -> DataFrame:
    """Range shuffle for the sort keys: explicit count when hinted,
    otherwise an AQE-coalescible shuffle sized from the actual bytes
    (adjacent-only merges keep range order, so the pid math holds)."""
    cols = [F.col(c) for c in sk_names]
    if num_ranges > 0:
        return keyed.repartitionByRange(num_ranges, *cols)
    return keyed.repartitionByRange(*cols)


# Offsets for this many ranges or fewer inline as a flat literal CASE
# (whole-stage codegen, zero extra exchange); above it, a broadcast hash
# join on the ≤num_ranges-row offset table. AQE-coalesced aggregate-grain
# layouts land well under this; only genuinely large layouts pay the join.
_INLINE_CARRY_MAX = 64


def _carry_case(pid: Column, pairs: list[tuple[int, int]]) -> Column:
    """Flat literal CASE mapping partition id → driver-computed offset.

    Every pid seen in the data appears in ``pairs`` by construction (the
    offsets were counted from the same materialized layout), so no
    fallthrough branch is needed."""
    expr = F.when(pid == F.lit(pairs[0][0]), F.lit(pairs[0][1]).cast("bigint"))
    for p, v in pairs[1:]:
        expr = expr.when(pid == F.lit(p), F.lit(v).cast("bigint"))
    return expr


def _split_layout(
    df: DataFrame,
    order_by: list[Column],
    num_ranges: int,
    pin_input: bool = False,
) -> tuple[DataFrame, list[str]]:
    """Range-shuffle ``df`` on ``order_by``, pin the layout with an eager
    ``localCheckpoint``, and split ``monotonically_increasing_id`` into
    (``__pid``, ``__lrn``) = (range id, 0-based position within range).

    ``pin_input`` materializes ``df`` itself first: the range exchange's
    boundary sampler computes its child ONCE MORE before the shuffle, so
    an expensive upstream (a fact-table aggregation) would otherwise run
    twice. Callers ranking a derived aggregate should pin; callers
    ranking an already-materialized frame (a previous layout's output,
    a raw scan) should not pay the extra copy."""
    if pin_input:
        df = df.localCheckpoint()
    sort_cols = [c.alias(f"__sk{i}") for i, c in enumerate(order_by)]
    keyed = df.select("*", *sort_cols)
    sk_names = [f"__sk{i}" for i in range(len(order_by))]
    laid = (
        _range_layout(keyed, sk_names, num_ranges)
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
    return laid, sk_names


def _row_number_total(
    df: DataFrame,
    order_by: list[Column],
    rank_col: str,
    num_ranges: int,
    pin_input: bool = False,
) -> tuple[DataFrame, int]:
    """Shared core: (ranked frame, total row count) — the count falls out
    of the same bounded offsets collect, so NTILE-style consumers get
    ``n`` as a driver literal with no extra aggregation job."""
    spark = df.sparkSession
    laid, _sk = _split_layout(df, order_by, num_ranges, pin_input)
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
        return (
            laid.select(
                *df.columns, (F.lit(1) + F.col("__lrn")).alias(rank_col)
            ),
            0,
        )
    if len(offsets) <= _INLINE_CARRY_MAX:
        off = _carry_case(F.col("__pid"), offsets)
        ranked = laid.select(
            *df.columns, (off + F.col("__lrn") + 1).alias(rank_col)
        )
    else:
        off_df = spark.createDataFrame(offsets, "__pid bigint, __off bigint")
        ranked = laid.join(F.broadcast(off_df), "__pid").select(
            *df.columns,
            (F.col("__off") + F.col("__lrn") + 1).alias(rank_col),
        )
    return ranked, acc


def distributed_row_number(
    df: DataFrame,
    order_by: list[Column],
    rank_col: str = "__rn",
    num_ranges: int = 0,
    pin_input: bool = False,
) -> DataFrame:
    """``df`` plus ``rank_col`` = 1-based global row number ordered by
    ``order_by`` (caller supplies a total order — append a unique id as
    the last sort key), computed with one range shuffle and no
    single-partition exchange.

    The returned frame is backed by an eager ``localCheckpoint`` (the
    layout pin described in the module docstring), so callers that scan
    it multiple times — e.g. both sides of a neighborhood self-join —
    re-read materialized partitions.

    ``num_ranges`` <= 0 (the default) lets AQE size the range layout
    from the shuffle bytes (see module docstring); pass an explicit
    count only to pin a layout for tests or a known co-partitioning.
    """
    ranked, _total = _row_number_total(
        df, order_by, rank_col, num_ranges, pin_input
    )
    return ranked


def distributed_row_number_total(
    df: DataFrame,
    order_by: list[Column],
    rank_col: str = "__rn",
    num_ranges: int = 0,
    pin_input: bool = False,
) -> tuple[DataFrame, int]:
    """:func:`distributed_row_number` plus the total row count, which
    falls out of the same bounded offsets collect — consumers that bin
    or normalize by ``n`` (calibration deciles, boundary-rank cuts) get
    it as a driver literal instead of paying a max-rank aggregation job
    and a scalar broadcast join."""
    return _row_number_total(df, order_by, rank_col, num_ranges, pin_input)


def distributed_ntile(
    df: DataFrame,
    n_buckets: int,
    order_by: list[Column],
    bucket_col: str = "__bucket",
    num_ranges: int = 0,
    pin_input: bool = False,
) -> DataFrame:
    """``df`` plus ``bucket_col`` = NTILE(n_buckets) over the given
    total order, without a single-partition window sort.

    NTILE is pure arithmetic on (rank, n): with q = n div k and
    r = n mod k, the first r buckets hold q+1 rows and the rest q (the
    SQL-standard rule, identical in Spark and DuckDB) — so the rank
    from :func:`distributed_row_number` plus one scalar row count
    reproduces NTILE exactly, and any consumer's value-hash oracle is
    unchanged by the swap.

    ``n`` falls out of the rank pass's own bounded offsets collect, so
    the bucket arithmetic is pure literal math on the rank — no extra
    aggregation job, no scalar broadcast. With q = 0 (n < n_buckets)
    the ELSE branch is unreachable (every rank lands in the first
    ``n mod k`` singleton buckets); its divisor is still clamped to 1
    so no branch can divide by zero.
    """
    ranked, n = _row_number_total(
        df, order_by, "__rk", num_ranges, pin_input
    )
    k = int(n_buckets)
    q, r = divmod(n, k)
    bucket = F.expr(
        f"CASE WHEN __rk <= {r * (q + 1)}"
        f"     THEN (__rk + {q}) div {q + 1}"
        f"     ELSE {r + 1} + (__rk - {r * (q + 1) + 1}) div {max(q, 1)} END"
    )
    return ranked.select(*df.columns, bucket.cast("int").alias(bucket_col))


def distributed_rank_cumsum(
    df: DataFrame,
    order_by: list[Column],
    sum_col: str,
    rank_col: str = "__rn",
    cumsum_col: str = "__cum",
    num_ranges: int = 0,
    pin_input: bool = False,
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
    laid, sk_names = _split_layout(df, order_by, num_ranges, pin_input)
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
    win = (
        Window.partitionBy("__pid")
        .orderBy(*sk_names)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    run = F.sum(F.col(sum_col)).over(win).cast("bigint")
    if len(offsets) <= _INLINE_CARRY_MAX:
        noff = _carry_case(F.col("__pid"), [(p, n0) for p, n0, _ in offsets])
        soff = _carry_case(F.col("__pid"), [(p, s0) for p, _, s0 in offsets])
        return laid.select(
            *df.columns,
            (noff + F.col("__lrn") + 1).alias(rank_col),
            (soff + run).cast("bigint").alias(cumsum_col),
        )
    off_df = spark.createDataFrame(
        offsets, "__pid bigint, __noff bigint, __soff bigint"
    )
    return (
        laid.join(F.broadcast(off_df), "__pid")
        .select(
            *df.columns,
            (F.col("__noff") + F.col("__lrn") + 1).alias(rank_col),
            (F.col("__soff") + run).cast("bigint").alias(cumsum_col),
        )
    )
