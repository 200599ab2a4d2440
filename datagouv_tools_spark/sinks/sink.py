"""Sinks: where DataFrames leave the engine (SURVEY §2.2 K1-K11).

Design (mirrors the reference's provider/executor split, U6):

- ``SqlDialect`` (schema/ddl.py) renders SQL text.
- A ``StatementExecutor`` runs it: ``DryRunExecutor`` records the
  statements (K11 — the reference's FakeConnection re-expressed, and
  the test seam for golden-sequence tests); ``DbApiExecutor`` drives a
  real DB-API connection when one is available.
- ``SqlSink`` sequences the load the way the reference does
  (K1→K2→K3→load→K9→K8→K10): drop, create, truncate, bulk load, analyze,
  index-after-load, commit.

The bulk-load path on a cluster: ``df.write.jdbc`` does batched INSERT
from every partition in parallel (numPartitions connections — the
reference's 4 consumer threads generalized). The PostgreSQL COPY fast
path (sinks/pg_copy.py) streams CSV per partition through COPY FROM
STDIN, the 10× path the reference uses.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import DataFrame
from pyspark.sql import types as T

from datagouv_tools_spark.schema.ddl import (
    EmptyIndexProvider,
    IndexProvider,
    SqlDialect,
    get_dialect,
)

__all__ = [
    "StatementExecutor",
    "DryRunExecutor",
    "DbApiExecutor",
    "SqlSink",
    "ParquetSink",
    "BucketedTableSink",
    "dbapi_insert_loader",
    "jdbc_loader",
]


class StatementExecutor:
    """Executes rendered SQL statements (U6 executor half)."""

    def execute(self, statement: str) -> None:
        raise NotImplementedError

    def commit(self) -> None:
        raise NotImplementedError


@dataclass
class DryRunExecutor(StatementExecutor):
    """Records statements instead of executing (K11). The golden-
    sequence tests assert on ``statements`` exactly as the reference's
    FakeConnection tests assert on logged SQL."""

    statements: list[str] = field(default_factory=list)

    def execute(self, statement: str) -> None:
        self.statements.append(statement)

    def commit(self) -> None:
        self.statements.append("COMMIT")


@dataclass
class DbApiExecutor(StatementExecutor):
    """Thin adapter over a live DB-API v2 connection."""

    connection: object

    def execute(self, statement: str) -> None:
        cursor = self.connection.cursor()
        try:
            cursor.execute(statement)
        finally:
            cursor.close()

    def commit(self) -> None:
        self.connection.commit()


@dataclass
class SqlSink:
    """Schema-aware SQL sink with the reference's load sequence.

    ``write(df, table)``:
      1. DROP TABLE IF EXISTS / CREATE TABLE (aligned, commented DDL)
      2. TRUNCATE (dialects that separate create/empty)
      3. data load — ``loader`` callback (JDBC batched INSERT, COPY
         fast path, or dry-run no-op)
      4. ANALYZE (dialects that collect stats)
      5. CREATE INDEX (after load — bulk-load optimization kept)
      6. COMMIT
    """

    dialect: SqlDialect
    executor: StatementExecutor
    index_provider: IndexProvider = field(default_factory=EmptyIndexProvider)
    loader: Callable[[DataFrame, str], None] | None = None

    @classmethod
    def dry_run(cls, rdbms: str = "pg", index_provider: IndexProvider | None = None) -> "SqlSink":
        return cls(
            dialect=get_dialect(rdbms),
            executor=DryRunExecutor(),
            index_provider=index_provider or EmptyIndexProvider(),
        )

    @property
    def statements(self) -> list[str]:
        assert isinstance(self.executor, DryRunExecutor)
        return self.executor.statements

    def write(self, df: DataFrame, table: str, schema: T.StructType | None = None) -> None:
        schema = schema or df.schema
        self.executor.execute(self.dialect.drop_table(table))
        self.executor.execute(self.dialect.create_table(table, schema))
        truncate = self.dialect.truncate(table)
        if truncate:
            self.executor.execute(truncate)
        self.executor.commit()
        if self.loader is not None:
            self.loader(df, table)
        else:
            copy_stmt = self.dialect.copy_from_csv(table)
            if copy_stmt:
                # dry-run: record the bulk-load statement that would run
                self.executor.execute(copy_stmt)
        analyze = self.dialect.analyze(table)
        if analyze:
            self.executor.execute(analyze)
        self.executor.commit()
        for index in self.index_provider.get_indices(table, schema):
            self.executor.execute(self.dialect.drop_index(index))
            self.executor.execute(self.dialect.create_index(index))
        self.executor.commit()


def dbapi_insert_loader(connection, dialect: SqlDialect, batch_size: int = 10_000):
    """K6 row-insert fallback over a live DB-API v2 connection
    (sqlite3, pg8000, ...): batched ``executemany`` of the dialect's
    parameterized INSERT — the reference's insert_all/executemany path
    (sql/sqlite.py:58-68).

    Scale note: rows stream through the driver via ``toLocalIterator``
    one partition at a time (never a full collect), but a single DB
    connection is still a funnel — at cluster scale use ``jdbc_loader``
    (one connection per partition) or the COPY fast path; this loader
    exists for serverless DBs (sqlite) and modest reference-parity
    loads."""

    import datetime
    import decimal

    def coerce(v):
        # DB-API drivers disagree on rich types (sqlite3 deprecated its
        # date adapters; Decimal is unsupported there): ship ISO/decimal
        # strings, which every server parses into the typed column.
        if isinstance(v, (datetime.date, datetime.datetime, decimal.Decimal)):
            return str(v)
        return v

    def load(df: DataFrame, table: str) -> None:
        stmt = dialect.insert_statement(table, df.schema)
        cursor = connection.cursor()
        try:
            batch: list[tuple] = []
            for row in df.toLocalIterator():
                batch.append(tuple(coerce(v) for v in row))
                if len(batch) >= batch_size:
                    cursor.executemany(stmt, batch)
                    batch = []
            if batch:
                cursor.executemany(stmt, batch)
        finally:
            cursor.close()
        connection.commit()

    return load


def jdbc_loader(url: str, properties: dict[str, str], num_partitions: int | None = None):
    """Loader writing via Spark's JDBC batched-INSERT writer (K6 at
    cluster parallelism: one connection per partition)."""

    def load(df: DataFrame, table: str) -> None:
        if num_partitions:
            df = df.repartition(num_partitions)
        df.write.mode("append").options(**properties).jdbc(url=url, table=table, mode="append")

    return load


@dataclass
class ParquetSink:
    """Lake-native sink: the 100 TB default. Partitioned parquet +
    optional bucketing; RDBMS loading then becomes a partition-parallel
    COPY from staged files.

    ``range_by`` range-partitions + sorts rows by the given columns
    before writing, so each output file covers a DISJOINT value range
    and its parquet min/max statistics prune whole files for range
    predicates — the second layout lever next to directory partitioning
    (``partition_by`` prunes directories; ``range_by`` prunes files and
    row groups within the scan).

    ``fmt`` selects the lake format through ``sources.formats`` —
    "parquet" (default) or "orc" keep the identical pushdown/pruning
    plan properties (both are DataSource scans with min/max stats);
    json/csv are accepted for interchange staging but inherit that
    module's representability guards."""

    base_path: str
    partition_by: tuple[str, ...] = ()
    range_by: tuple[str, ...] = ()
    range_partitions: int | None = None
    fmt: str = "parquet"

    def write(self, df: DataFrame, table: str, mode: str = "overwrite") -> str:
        from datagouv_tools_spark.sources.formats import write_table

        path = f"{self.base_path.rstrip('/')}/{table}"
        if self.range_by:
            cols = [df[c] for c in self.range_by]
            if self.range_partitions:
                df = df.repartitionByRange(self.range_partitions, *cols)
            else:
                df = df.repartitionByRange(*cols)
            df = df.sortWithinPartitions(*self.range_by)
        write_table(
            df,
            path,
            fmt=self.fmt,
            mode=mode,
            partition_by=list(self.partition_by) or None,
        )
        return path


@dataclass
class BucketedTableSink:
    """Bucketed managed tables: pre-shuffle ONCE at write time so every
    later equi-join/agg on the bucket key plans with zero exchanges —
    the 100 TB answer to a fact⋈fact join that would otherwise shuffle
    both sides every query. Requires saveAsTable (bucket metadata lives
    in the metastore); tests assert the no-exchange plan property.
    """

    n_buckets: int
    bucket_cols: tuple[str, ...]
    sort_cols: tuple[str, ...] = ()
    base_path: str | None = None  # external table location; default = warehouse dir

    def write(self, df: DataFrame, table: str, mode: str = "overwrite") -> None:
        writer = df.write.mode(mode).bucketBy(self.n_buckets, *self.bucket_cols)
        if self.sort_cols:
            writer = writer.sortBy(*self.sort_cols)
        if self.base_path:
            writer = writer.option("path", f"{self.base_path.rstrip('/')}/{table}")
        writer.saveAsTable(table)


def compact_parquet(
    spark,
    path: str,
    out_path: str,
    target_file_bytes: int = 128 << 20,
) -> tuple[int, int]:
    """Small-files compaction — the standing maintenance job of any
    100 TB parquet lake (streaming sinks and over-parallel writes leave
    thousands of KB-sized files; scan cost is then dominated by file
    open/footer overhead, not bytes).

    Sizes the output by BYTES, not file count: reads the source file
    sizes through the Hadoop FileSystem API, targets
    ``ceil(total / target_file_bytes)`` output files, and rewrites with
    a round-robin repartition (even sizes, no skew from partition
    residue). Writes to ``out_path`` — swapping directories atomically
    is the caller's move (same staging pattern as ``staged_copy``).

    Returns (n_files_before, n_files_after).
    """
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    src = jvm.org.apache.hadoop.fs.Path(path)
    fs = src.getFileSystem(conf)
    listed = list(fs.listStatus(src))
    subdirs = [
        s.getPath().getName()
        for s in listed
        if s.isDirectory() and not s.getPath().getName().startswith("_")
    ]
    if subdirs:
        # a partitioned dataset: compacting the root would both misread
        # total bytes (directories aren't files) and rewrite partition
        # columns into data columns, destroying directory pruning.
        # Compaction granularity IS the partition directory.
        raise ValueError(
            f"{path} contains partition directories ({subdirs[:3]}...); "
            "compact each partition directory individually"
        )
    statuses = [
        s for s in listed
        if s.isFile() and not s.getPath().getName().startswith("_")
    ]
    n_before = len(statuses)
    total = sum(s.getLen() for s in statuses)
    n_out = max(1, -(-total // target_file_bytes))

    df = spark.read.parquet(path)
    df.repartition(int(n_out)).write.mode("overwrite").parquet(out_path)

    out = jvm.org.apache.hadoop.fs.Path(out_path)
    n_after = len(
        [
            s for s in fs.listStatus(out)
            if s.isFile() and s.getPath().getName().endswith(".parquet")
        ]
    )
    return n_before, n_after


def resolve_pg_load(
    connection,
    dsn: str | None,
    bulk_copy: bool,
    rdbms: str,
    dialect: "SqlDialect",
):
    """Shared connection/loader dispatch for the import pipelines
    (sirene/fantoir/deces — the reference's bulk_copy flag):

    - ``dsn`` set + rdbms "pg": DDL runs over a connection built from
      the DSN; ``bulk_copy=True`` loads through the distributed COPY
      fast path (sinks/pg_copy.copy_loader), else batched INSERTs.
    - explicit ``connection``: batched INSERTs over it (sqlite et al.).
    - neither: (None, None) — the caller wires a dry-run sink.

    Returns (connection, loader)."""
    if dsn is not None and rdbms != "pg":
        # silently ignoring the DSN would fall back to a dry-run sink
        # that prints SQL and exits 0 — loud failure instead
        raise ValueError(
            f"--dsn is only supported for rdbms 'pg' (got {rdbms!r}); "
            f"pass a DB-API connection for other databases"
        )
    if connection is None and dsn is not None and rdbms == "pg":
        from datagouv_tools_spark.sinks.pg_copy import _connect

        connection = _connect(dsn)
    if connection is None:
        return None, None
    if bulk_copy and dsn is not None and rdbms == "pg":
        from datagouv_tools_spark.sinks.pg_copy import copy_loader

        return connection, copy_loader(dsn)
    return connection, dbapi_insert_loader(connection, dialect)
