"""Streaming source + sink helpers for the events table.

``read_events_stream`` is the ``readStream`` twin of
``sources.catalog.load_table(..., "events")``: same nanos-as-long
parquet quirk, same long→timestamp_ntz normalization, but through the
file-stream source so every downstream operator sees a genuinely
streaming DataFrame (micro-batched by file, ``maxFilesPerTrigger``).

``run_to_memory`` drives any streaming DataFrame to completion with an
``availableNow`` trigger into a memory sink — bounded-input replay, the
test/oracle harness for streaming operators. At 100 TB the same
pipelines write to kafka/parquet sinks with ``processingTime``
triggers; only this runner is test-only.
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

__all__ = ["events_raw_schema", "read_events_stream", "run_to_memory"]


def _events_ts_is_nanos(sf_dir: str) -> bool:
    """True when events.parquet stores ts as TIMESTAMP(NANOS) (readable
    only as int64 via ``nanosAsLong``) or as a raw int64.

    The testdata generator has shipped both nanosecond and microsecond
    encodings across rounds; a one-footer driver-side sniff keeps the
    stream schema in lockstep with whatever is on disk, mirroring the
    batch catalog's dtype-driven normalization
    (sources/catalog.py:_normalize_nanos_timestamps).
    """
    import pyarrow.parquet as pq

    try:
        ts_type = (
            pq.read_schema(os.path.join(sf_dir, "events.parquet")).field("ts").type
        )
    except Exception:
        # pyarrow only probes LOCAL paths; for hdfs://, s3a://, etc.
        # (which the Spark reader itself accepts) default to the nanos
        # encoding the testdata generator ships — callers on remote
        # filesystems with microsecond timestamps can pass the schema
        # explicitly via events_raw_schema(nanos=False)
        return True
    return getattr(ts_type, "unit", None) == "ns" or str(ts_type) == "int64"


def events_raw_schema(nanos: bool) -> StructType:
    """events.parquet as the file-stream source must declare it (file
    streams require an explicit schema): ts is raw int64
    epoch-nanoseconds under ``nanosAsLong``, a plain timestamp
    otherwise."""
    return StructType(
        [
            StructField("event_id", LongType()),
            StructField("ts", LongType() if nanos else TimestampType()),
            StructField("user_id", LongType()),
            StructField("event_type", StringType()),
            StructField("value", DoubleType()),
            StructField("props", StringType()),
        ]
    )


def read_events_stream(
    spark: SparkSession, sf_dir: str, max_files_per_trigger: int = 1
) -> DataFrame:
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    nanos = _events_ts_is_nanos(sf_dir)
    raw = (
        spark.readStream.schema(events_raw_schema(nanos))
        .option("maxFilesPerTrigger", max_files_per_trigger)
        # the file-stream source requires a directory path; the glob
        # filter selects just the events file out of the shared sf_dir
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    if not nanos:
        return raw
    # TimestampType (not NTZ: watermarks require it); session tz is UTC
    # above, so wall-clock values equal the batch catalog's NTZ ones.
    micros = F.expr("ts div 1000").cast("long")
    return raw.withColumn("ts", F.timestamp_micros(micros))


def run_to_memory(
    df: DataFrame,
    output_mode: str = "complete",
    name: str | None = None,
    state_partitions: int | None = 2,
) -> DataFrame:
    """Replay a bounded stream to its final result (availableNow →
    memory sink), return the result as a static DataFrame.

    ``complete`` mode emits final window/session aggregates regardless
    of the end-of-input watermark; use ``append`` to observe
    watermark-gated emission instead.

    ``state_partitions`` pins ``spark.sql.shuffle.partitions`` for the
    stream's state stores (captured at first start, immutable for the
    checkpoint's lifetime): a fresh bounded replay doesn't need one
    state store per session core — every state-store instance costs a
    per-batch open/commit, and stream-stream joins keep FOUR stores per
    partition, so the default is small (r7 measured the per-batch fixed
    cost roughly linear in the count; r8 re-measured 4->2 partitions
    cutting a bounded stream-stream join replay ~25-30%). Pass None to
    inherit the session
    setting (what a long-lived production stream would size
    explicitly).
    """
    name = name or f"mem_{uuid.uuid4().hex[:12]}"
    spark = df.sparkSession
    conf_key = "spark.sql.shuffle.partitions"
    old = spark.conf.get(conf_key)
    if state_partitions is not None:
        spark.conf.set(conf_key, str(state_partitions))
    try:
        q = (
            df.writeStream.format("memory")
            .queryName(name)
            .outputMode(output_mode)
            .trigger(availableNow=True)
            .start()
        )
        try:
            q.awaitTermination()
        finally:
            q.stop()
    finally:
        if state_partitions is not None:
            spark.conf.set(conf_key, old)
    return spark.table(name)
