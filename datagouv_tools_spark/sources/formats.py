"""Format-agnostic table IO: parquet / ORC / JSON-lines / CSV behind
one read/write pair.

The reference ingests CSV, zipped CSV, and fixed-width only; a
Spark-first engine gets the columnar formats for free and should expose
them uniformly — ORC in particular shares parquet's predicate-pushdown
and column-pruning path in the DataSource V2 scan, so the plan-level
guarantees in tests/test_plans.py hold for both.

Semantics pinned here (and tested in tests/test_schema.py):

- ``write_table(..., fmt)``/``read_table(..., fmt)`` round-trip any
  DataFrame schema the engine uses (timestamps, decimals, arrays,
  binary — note JSON/CSV caveats below).
- An explicit schema is REQUIRED for self-describing-less formats
  (json/csv): inference samples the data (extra scan; nondeterministic
  widths at scale) and silently widens ints to bigints. Parquet/ORC
  embed their schema.
- JSON writes binary as base64, CSV cannot hold arrays/binary at all —
  ``write_table`` raises early on an unrepresentable schema instead of
  letting Spark write lossy output.

At 100 TB: parquet/ORC for anything queried (columnar + pushdown);
JSON-lines only at ingest boundaries; CSV only for interchange with
the reference's DB loaders (sinks/pg_copy.py renders its own CSV).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

__all__ = ["read_table", "write_table", "FORMATS"]

FORMATS = ("parquet", "orc", "json", "csv")

#: Spark CSV can neither write nor faithfully read nested/binary cells.
_CSV_FORBIDDEN = (T.ArrayType, T.MapType, T.StructType, T.BinaryType)


def _check_writable(schema: T.StructType, fmt: str) -> None:
    if fmt == "csv":
        for f in schema.fields:
            if isinstance(f.dataType, _CSV_FORBIDDEN):
                raise ValueError(
                    f"CSV cannot represent column {f.name!r} of type "
                    f"{f.dataType.simpleString()}; use parquet/orc"
                )


def write_table(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    **options,
) -> None:
    if fmt not in FORMATS:
        raise ValueError(f"unknown format {fmt!r}: {FORMATS}")
    _check_writable(df.schema, fmt)
    writer = df.write.format(fmt).mode(mode)
    if fmt == "csv":
        writer = writer.option("header", True)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.options(**options).save(path)


def read_table(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema: T.StructType | str | None = None,
    **options,
) -> DataFrame:
    if fmt not in FORMATS:
        raise ValueError(f"unknown format {fmt!r}: {FORMATS}")
    if fmt in ("json", "csv") and schema is None:
        raise ValueError(
            f"{fmt} is not self-describing: pass an explicit schema "
            "(inference re-scans the data and widens types nondeterministically)"
        )
    reader = spark.read.format(fmt)
    if schema is not None:
        reader = reader.schema(schema)
    if fmt == "csv":
        reader = reader.option("header", True)
    return reader.options(**options).load(path)
