"""Custom stateful streaming operator: per-user running totals.

What built-in windowed aggregation can't express: state that survives
across micro-batches with per-key update semantics and an emitted row
per batch. Implemented with ``applyInPandasWithState`` (Arrow-batched,
grouped state) — the escape hatch SURVEY.md §7.3 reserves for operators
Spark lacks.

Scale: state is one (count, sum) pair per user key, partitioned by the
groupBy hash — O(|users|) across the cluster, no unbounded growth. Use
a timeout (``GroupStateTimeout.ProcessingTimeTimeout``) to evict idle
keys when the key domain churns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

__all__ = ["running_user_totals"]

_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("sum_value", DoubleType()),
    ]
)

_STATE_SCHEMA = StructType(
    [StructField("n", LongType()), StructField("s", DoubleType())]
)


def _update(key, pdf_iter, state: GroupState):
    import pandas as pd

    n, s = state.get if state.exists else (0, 0.0)
    for pdf in pdf_iter:
        n += len(pdf)
        s += float(pdf["value"].sum())
    state.update((n, s))
    yield pd.DataFrame({"user_id": [key[0]], "n_events": [n], "sum_value": [s]})


def running_user_totals(events: DataFrame) -> DataFrame:
    """(user_id, n_events, sum_value) updated every micro-batch; on a
    bounded replay the last emitted row per user equals the batch
    ``groupBy(user_id).agg(count, sum)``."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update,
        outputStructType=_OUTPUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
