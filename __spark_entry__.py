"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query at sf0.001;
``queries()`` / ``oracle_sql()`` expose the engine's declared query
surface (datagouv_tools_spark/queries.py) for the duckdb correctness
gate at sf0.01.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from datagouv_tools_spark import queries as q


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: TPC-H Q1 analog on /root/testdata/sf0.001."""
    return q.q1_pricing_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(q.QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each query (where expressible)."""
    return dict(q.ORACLE)
