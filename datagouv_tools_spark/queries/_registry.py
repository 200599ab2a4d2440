"""Query registry: the QUERIES/ORACLE dicts every thematic module
registers into, the @query decorator, and the shared decimal/table
helpers. Split from the flat queries.py header (r10)."""

from __future__ import annotations

from collections.abc import Callable

# Module-level so get_type_hints can resolve pandas-UDF callback
# annotations (PySpark infers the applyInPandas eval type from them).
import pandas as pd

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from datagouv_tools_spark.sources.catalog import load_table

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLE: dict[str, str] = {}

DEC = "decimal(18,4)"


def query(name: str, oracle: str | None = None):
    """Register a query (and its DuckDB oracle) under ``name``."""

    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE[name] = oracle
        return fn

    return deco


def dec(col: str | Column) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(DEC)


def dround(c: Column, scale: int = 2) -> Column:
    """Round an exact decimal and surface it as double (both engines agree)."""
    return F.round(c, scale).cast("double")


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)
