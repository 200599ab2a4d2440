"""Catalog of the driver-provided parquet testdata tables.

At 100 TB these would be partitioned parquet/iceberg table roots instead
of single files; the loader stays identical (``spark.read.parquet`` on a
directory prunes partitions and pushes filters down to the scan).
"""

from __future__ import annotations

import os
import weakref

from pyspark.sql import DataFrame, SparkSession

TESTDATA_TABLES: tuple[str, ...] = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

#: Dimension tables small enough to always broadcast in joins.
BROADCAST_TABLES: frozenset[str] = frozenset(
    {"region", "nation", "supplier", "part", "customer"}
)


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


#: Per-session catalog of loaded-table DataFrames. This memoizes the
#: driver-side PLAN HANDLE only — the unresolved logical plan that
#: ``spark.read.parquet`` + the nanos normalization produce — exactly
#: the role a metastore/catalog table plays on a real cluster (schema
#: known once, not re-inferred per query). NO DATA OR RESULTS ARE
#: CACHED: DataFrames are immutable and lazy, every action on a
#: memoized frame re-reads the parquet files from disk (no ``.cache``
#: / ``.persist`` anywhere near this path). Without the memo each
#: query pays schema inference + two conf round-trips + plan analysis
#: per table load (~0.4 s of driver-side latency per call at any SF —
#: it is py4j/planning cost, not data cost). Keyed weakly by session
#: so a stopped session's entries are collectable, and by the resolved
#: path so distinct sf_dirs never alias.
_TABLE_MEMO: "weakref.WeakKeyDictionary[SparkSession, dict[tuple[str, str], DataFrame]]" = (
    weakref.WeakKeyDictionary()
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    try:
        per_session = _TABLE_MEMO.setdefault(spark, {})
    except TypeError:  # pragma: no cover - non-weakrefable session stub
        per_session = {}
    key = (os.path.abspath(sf_dir), name)
    cached = per_session.get(key)
    if cached is not None:
        return cached
    # The caller may hand us a vanilla SparkSession (the correctness
    # driver does); make the confs this catalog depends on hold there
    # too. events.parquet stores TIMESTAMP(NANOS), which Spark can only
    # read as long via the legacy conf; the testdata is tz-naive
    # throughout, so UTC is the only correct session zone for the
    # long-ns → timestamp_ntz conversion below.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = spark.read.parquet(table_path(sf_dir, name))
    df = _normalize_nanos_timestamps(df)
    per_session[key] = df
    return df


def _normalize_nanos_timestamps(df: DataFrame) -> DataFrame:
    """Convert nanosecond-timestamp columns read as long (see session.py
    ``spark.sql.legacy.parquet.nanosAsLong``) to timestamp_ntz.

    Integer ``div`` (not float /) — epoch nanoseconds exceed 2**53 and
    would lose precision through a double.
    """
    from pyspark.sql import functions as F

    for field_name, dtype in df.dtypes:
        if field_name == "ts" and dtype == "bigint":
            micros = F.expr(f"`{field_name}` div 1000").cast("long")
            df = df.withColumn(
                field_name, F.timestamp_micros(micros).cast("timestamp_ntz")
            )
    return df


def load_tables(
    spark: SparkSession,
    sf_dir: str,
    names: tuple[str, ...] = TESTDATA_TABLES,
    register_views: bool = False,
) -> dict[str, DataFrame]:
    """Load the testdata tables; optionally register them as temp views."""
    out: dict[str, DataFrame] = {}
    for name in names:
        df = load_table(spark, sf_dir, name)
        if register_views:
            df.createOrReplaceTempView(name)
        out[name] = df
    return out
