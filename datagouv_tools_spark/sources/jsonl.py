"""JSON-Lines corpus reader — the de-facto interchange format for
large-scale text/training datasets (one JSON document per line,
gzip-splittable at the file level).

Scale rules baked in:

- **Explicit schema, never inference.** ``spark.read.json`` without a
  schema runs a full extra pass over 100 TB just to guess types, and
  the guess can drift between ingest runs. Callers pass a StructType
  (or use ``DOCUMENT_SCHEMA``).
- **Corrupt lines are data, not exceptions.** PERMISSIVE mode with a
  ``_corrupt_record`` column; ``split_corrupt`` separates clean rows
  from quarantine rows so a bad shard never kills a 10-hour job, and
  the quarantine count is monitorable.
- **Column pruning still applies**: JSON scan prunes top-level fields
  by the required schema (narrower reads for narrow queries).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["DOCUMENT_SCHEMA", "read_jsonl", "split_corrupt"]

#: Canonical text-corpus document shape (mirrors the documents table).
DOCUMENT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("source", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("text", T.StringType()),
    ]
)

_CORRUPT = "_corrupt_record"


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: T.StructType = DOCUMENT_SCHEMA,
    multiline: bool = False,
) -> DataFrame:
    """Schema'd JSONL read with corrupt-record capture.

    The returned frame carries ``_corrupt_record`` (NULL for clean
    rows); pipe through ``split_corrupt`` before analytics.
    """
    full = T.StructType(list(schema.fields) + [T.StructField(_CORRUPT, T.StringType())])
    return (
        spark.read.schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", _CORRUPT)
        .option("multiLine", str(multiline).lower())
        .json(path)
    )


def split_corrupt(df: DataFrame, multiline: bool = False) -> tuple[DataFrame, DataFrame]:
    """(clean, quarantine): clean rows lose the corrupt column;
    quarantine keeps the raw line for replay/debugging.

    ``multiline`` must echo the ``read_jsonl`` flag: the quarantine
    branch re-parses the files LINE-wise, which would flag every
    fragment of a valid multi-line document as corrupt — so for
    multiline sources it refuses rather than lying.

    Spark disallows plans whose only referenced scan column is the
    internal corrupt-record column (QUERY_ONLY_CORRUPT_RECORD_COLUMN) —
    and column pruning reduces a corrupt-only projection to exactly
    that. The quarantine branch therefore re-derives bad lines from a
    ``text`` scan + ``from_json`` null-out: same files, no caching, and
    the clean branch still prunes to the fields it needs.
    """
    clean = df.filter(F.col(_CORRUPT).isNull()).drop(_CORRUPT)
    if multiline:
        raise NotImplementedError(
            "quarantine extraction is line-oriented; for multiLine JSON "
            "use the clean frame and count corrupt docs via the reader's "
            "_corrupt_record column alongside a cached read"
        )
    return clean, _quarantine_from_text(df)


def _quarantine_from_text(df: DataFrame) -> DataFrame:
    spark = df.sparkSession
    # Recover source paths + parse schema from the reader-produced frame.
    paths = df.inputFiles()
    schema = T.StructType(df.schema.fields)  # includes the corrupt field
    lines = spark.read.text(list(paths) if paths else [])
    # from_json honors columnNameOfCorruptRecord when the field is part
    # of its schema: malformed lines land there, parseable-but-sparse
    # lines (e.g. '{}') stay clean — the PERMISSIVE reader's semantics,
    # minus the file-scan-level QUERY_ONLY_CORRUPT_RECORD restriction.
    parsed = lines.select(
        F.from_json(
            F.col("value"), schema, {"columnNameOfCorruptRecord": _CORRUPT}
        ).alias("p")
    )
    return parsed.filter(F.col(f"p.{_CORRUPT}").isNotNull()).select(
        F.col(f"p.{_CORRUPT}").alias("raw_line")
    )
