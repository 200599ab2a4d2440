"""Change-data-capture: apply a changelog to materialize a snapshot.

``apply_changelog`` folds an ordered stream of keyed upsert/delete
records into the latest surviving row per key — the merge primitive
behind CDC ingestion (Debezium-style feeds), SCD1 dimensions, and
compacted-topic materialization.

Scale shape: ONE shuffle on the key; the window's rank-limit plans a
WindowGroupLimit, so each task keeps only the newest record per key
before the merge (the same pre-shuffle pruning as latest-event-per-key).
Tombstones are dropped AFTER picking the newest record, so a delete
followed by nothing stays deleted and a re-insert after a delete
survives — exact changelog semantics, not "filter deletes first".
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = ["apply_changelog"]


def apply_changelog(
    changes: DataFrame,
    key_cols: Sequence[str] | str,
    order_cols: Sequence[str] | str,
    op_col: str = "op",
    delete_op: str = "D",
) -> DataFrame:
    """Latest surviving row per key.

    ``order_cols`` must totally order changes per key (e.g. (ts,
    change_id)) — ties would make "latest" ambiguous and
    nondeterministic across engines.
    """
    key_cols = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    order_cols = [order_cols] if isinstance(order_cols, str) else list(order_cols)
    w = Window.partitionBy(*key_cols).orderBy(*[F.desc(c) for c in order_cols])
    return (
        changes.withColumn("__rk", F.row_number().over(w))
        .filter((F.col("__rk") == 1) & (F.col(op_col) != delete_op))
        .drop("__rk", op_col)
    )
