"""Stream-stream interval join.

Joins two event streams on a key plus a time-interval condition
(right_ts in [left_ts - lower, left_ts + upper]). On streams BOTH sides
carry watermarks and the interval bounds the buffered state: each side
retains only rows younger than watermark + the interval span, so state
is O(rate × (delay + interval)) regardless of stream age — this is the
condition under which Spark accepts an inner stream-stream join at all.

The same function works on static frames (the batch twin is the
oracle-checkable form; tests assert stream == batch).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["interval_join"]


def interval_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    lower: str = "0 seconds",
    upper: str = "10 minutes",
    left_ts: str = "ts",
    right_ts: str = "ts",
    watermark: str | None = "10 minutes",
    how: str = "inner",
) -> DataFrame:
    """right_ts ∈ [left_ts - lower, left_ts + upper], equi on ``on``.

    Column name collisions: rename before calling (the join keeps both
    sides' columns except the duplicated key).
    """
    if left.isStreaming and watermark is not None:
        left = left.withWatermark(left_ts, watermark)
    if right.isStreaming and watermark is not None:
        right = right.withWatermark(right_ts, watermark)
    lt, rt = F.col(left_ts), F.col(right_ts)
    cond = (
        (left[on] == right[on])
        & (rt >= lt - F.expr(f"INTERVAL {lower}"))
        & (rt <= lt + F.expr(f"INTERVAL {upper}"))
    )
    return left.join(right, cond, how).drop(right[on])
