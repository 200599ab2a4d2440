"""Event-time window operators — one code path for batch AND streams.

``F.window`` / ``F.session_window`` are defined on event time, not on
execution mode, so each helper here accepts either a static or a
streaming DataFrame: the batch form is the oracle-checkable twin of the
streaming form (tests assert stream == batch on the same input). A
watermark is attached only when the input actually streams — on a
static frame it would be a no-op that Spark disallows in some plans.

The reference has no stream processing at all — its closest artifact is
the bounded producer/consumer thread fan-out in
``import_fantoir.py:42-102`` (reference repo), which Spark's own
partitioned execution replaces. These operators are the driver's
north-star streaming surface over the ``events`` table.

Scale: windowed aggregation shuffles on (window, keys); with watermarks
the state store evicts windows older than the watermark, so state is
bounded by (delay / slide) × |keys| regardless of input volume. Session
windows keep one open session per key — bounded by |keys|.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["tumbling_agg", "sliding_agg", "session_agg", "dedup_events"]


def _with_watermark(df: DataFrame, ts_col: str, delay: str | None) -> DataFrame:
    if df.isStreaming and delay is not None:
        return df.withWatermark(ts_col, delay)
    return df


def _windowed_agg(
    df: DataFrame,
    window_col: Column,
    keys: tuple[str, ...],
    aggs: Mapping[str, Column],
) -> DataFrame:
    out = df.groupBy(window_col.alias("w"), *keys).agg(
        *[c.alias(name) for name, c in aggs.items()]
    )
    return out.select(
        F.col("w.start").alias("window_start"),
        F.col("w.end").alias("window_end"),
        *keys,
        *aggs.keys(),
    )


def tumbling_agg(
    df: DataFrame,
    duration: str,
    aggs: Mapping[str, Column],
    keys: tuple[str, ...] = (),
    ts_col: str = "ts",
    watermark: str | None = "10 minutes",
) -> DataFrame:
    """Fixed, non-overlapping event-time windows of ``duration``."""
    df = _with_watermark(df, ts_col, watermark)
    return _windowed_agg(df, F.window(ts_col, duration), keys, aggs)


def sliding_agg(
    df: DataFrame,
    duration: str,
    slide: str,
    aggs: Mapping[str, Column],
    keys: tuple[str, ...] = (),
    ts_col: str = "ts",
    watermark: str | None = "10 minutes",
) -> DataFrame:
    """Overlapping windows of ``duration`` advancing every ``slide``:
    each event lands in duration/slide windows."""
    df = _with_watermark(df, ts_col, watermark)
    return _windowed_agg(df, F.window(ts_col, duration, slide), keys, aggs)


def session_agg(
    df: DataFrame,
    gap: str,
    aggs: Mapping[str, Column],
    keys: tuple[str, ...] = (),
    ts_col: str = "ts",
    watermark: str | None = "10 minutes",
) -> DataFrame:
    """Dynamic-length sessions: a session absorbs events that arrive
    strictly less than ``gap`` after the previous event, i.e. a new
    session starts when ts - prev_ts >= gap (window end = last + gap).
    SQL twin: gaps-and-islands (LAG + running SUM)."""
    df = _with_watermark(df, ts_col, watermark)
    return _windowed_agg(df, F.session_window(ts_col, gap), keys, aggs)


def dedup_events(
    df: DataFrame,
    keys: tuple[str, ...],
    ts_col: str = "ts",
    watermark: str | None = "10 minutes",
) -> DataFrame:
    """Exactly-once by key: batch ``dropDuplicates``; on a stream,
    ``dropDuplicatesWithinWatermark`` so the key-set state is evicted
    past the watermark instead of growing without bound."""
    if df.isStreaming and watermark is not None:
        return df.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
            list(keys)
        )
    return df.dropDuplicates(list(keys))
