"""Partitioned JDBC reader — the north-star ingest path.

The reference reads its RDBMS through single-connection DB-API cursors
(`dg_tools_script.py:49-57` in the reference repo). The Spark engine
reads through the JDBC data source, and the difference that matters at
scale is *partitioned* pulls: without ``partitionColumn`` bounds Spark
opens ONE connection and drags the whole table through it; with them,
``num_partitions`` executors each pull a key-range slice concurrently,
and Catalyst pushes filters/projections into the generated per-slice
SQL.

No database server exists in the test container, so these helpers are
exercised by option-construction tests; the reader itself is the
built-in ``spark.read.format("jdbc")``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

__all__ = ["jdbc_read_options", "read_jdbc_table"]


def jdbc_read_options(
    url: str,
    table: str,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int = 32,
    fetch_size: int = 10_000,
    **extra: str,
) -> dict[str, str]:
    """Build the option map for a partitioned JDBC read.

    ``table`` may be a table name or a pushdown subquery alias
    (``"(SELECT …) t"``). Partition bounds don't filter — rows outside
    [lower, upper) all land in the first/last slice — they only shape
    the per-partition WHERE ranges, so rough bounds (min/max of a
    SERIAL key) are fine.
    """
    opts: dict[str, str] = {
        "url": url,
        "dbtable": table,
        "fetchsize": str(fetch_size),
    }
    if partition_column is not None:
        if lower_bound is None or upper_bound is None:
            raise ValueError("partition_column requires lower_bound and upper_bound")
        opts.update(
            partitionColumn=partition_column,
            lowerBound=str(lower_bound),
            upperBound=str(upper_bound),
            numPartitions=str(num_partitions),
        )
    opts.update(extra)
    return opts


def read_jdbc_table(
    spark: SparkSession,
    url: str,
    table: str,
    **kwargs,
) -> DataFrame:
    """``spark.read.format("jdbc")`` with the options above. Pair with
    ``sinks/pg_copy.copy_dataframe`` for the reference's full
    read-transform-write loop at cluster parallelism."""
    reader = spark.read.format("jdbc")
    for k, v in jdbc_read_options(url, table, **kwargs).items():
        reader = reader.option(k, v)
    return reader.load()
