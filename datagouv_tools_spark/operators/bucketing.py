"""Bucketed-table layout: the shuffle-free co-located join.

At 100 TB the dominant cost of a repeated fact-fact join (orders ⋈
lineitem every night) is re-shuffling both sides on the join key every
run. Spark's answer is table bucketing: write each side ONCE with
``bucketBy(n, key)`` so rows are hash-clustered into the same bucket
scheme on disk, and every later equi-join on that key plans as a
SortMergeJoin with ZERO Exchange operators — the shuffle happened at
write time, amortized over every subsequent read.

This module is the engine's layout primitive for that pattern (the
batch analog of what `sinks/sink.py` does with repartitionByRange for
range layouts). `write_bucketed` pins one file per bucket (a
`repartition(n, key)` before the write) so the reader gets exactly n
well-formed buckets; `assert_colocated_join` is the plan guard used by
tests.

Spark-first notes:
- ``bucketBy`` requires a catalog table (`saveAsTable`) — there is no
  path-only bucketed write. We register the table with an EXPLICIT
  ``path`` option so the layout lands where the caller says (a lake
  prefix in production, a temp dir in tests) and never depends on the
  session's warehouse dir being writable.
- Both sides must use the SAME bucket count on the SAME key; Spark
  then plans scan→(sort)→SMJ with no Exchange on either side. With
  ``sortBy(key)`` at write time the per-bucket sort is also free when
  each bucket is a single file.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    path: str,
    key: str,
    n_buckets: int = 8,
    sort: bool = True,
) -> None:
    """Write ``df`` as a bucketed catalog table at an explicit path.

    One file per bucket: the pre-write ``repartition(n_buckets, key)``
    puts every row of a bucket into one task, so the bucketed reader
    never needs a per-bucket merge-sort of many small files.
    Overwrite-idempotent: re-running replaces the table.
    """
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    w = (
        df.repartition(n_buckets, key)
        .write.format("parquet")
        .mode("overwrite")
        .option("path", path)
        .bucketBy(n_buckets, key)
    )
    if sort:
        w = w.sortBy(key)
    w.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, key: str
) -> DataFrame:
    """Equi-join two same-bucketed catalog tables on their bucket key.

    When both tables were written by ``write_bucketed`` with the same
    ``n_buckets`` and ``key``, the physical plan is a SortMergeJoin
    with no Exchange on either side — verify with
    ``assert_colocated_join`` in tests.
    """
    return spark.table(left_table).join(spark.table(right_table), key)


def assert_colocated_join(joined: DataFrame) -> None:
    """Raise if the join plan re-shuffles either side.

    The contract of a bucketed co-located join: the executed plan
    contains a SortMergeJoin and NO Exchange operator anywhere under
    it (broadcast is also absent — this guard is meant to be called
    with autoBroadcastJoinThreshold=-1 so the SMJ path is forced).
    """
    plan = joined._jdf.queryExecution().executedPlan().toString()
    if "SortMergeJoin" not in plan:
        raise AssertionError(f"expected SortMergeJoin, got:\n{plan}")
    if "Exchange" in plan:
        raise AssertionError(f"bucketed join re-shuffled:\n{plan}")
