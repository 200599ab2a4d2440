"""As-of (point-in-time) join — an operator Spark lacks natively.

For each left row, attach the most recent right row of the same key
with ``right_ts <= left_ts`` (backward direction). The naive form is a
range self-join (quadratic blow-up per key); this implementation is the
scalable composition SURVEY.md §7.3 prescribes instead of a custom
physical operator:

    tag → union → one shuffle on key → in-partition sort by
    (ts, side, tiebreak) → ``last(right payload, ignoreNulls)`` running
    window → keep left rows.

Cost at 100 TB: exactly one shuffle of |L| + |R| rows on the join key
(same as any co-partitioned join), linear scan per partition, no state
beyond the window's single carried value. Skewed keys salt the same
way any groupBy does.

Tie semantics: at equal timestamps the right row sorts before the left
row (inclusive backward match); among equal right timestamps the
largest ``tiebreak`` wins — a total order, so results are
deterministic and oracle-checkable (LAST_VALUE IGNORE NULLS in SQL).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = ["asof_join_backward"]


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_payload: tuple[str, ...] = (),
    tiebreak: str | None = None,
) -> DataFrame:
    """Backward as-of join. Returns all left columns plus each right
    payload column as ``<name>_asof`` (NULL when no prior right row).

    ``tiebreak``: right-side column ordering equal-timestamp right rows
    (last one wins); required for determinism when right_ts can tie.
    """
    left_cols = left.columns
    payload = list(right_payload)

    l_tagged = left.select(
        F.col(on).alias("__k"),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__is_left"),
        F.lit(None).cast("long").alias("__tb"),
        *[F.col(c) for c in left_cols],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"{c}_asof") for c in payload],
    )
    r_tagged = right.select(
        F.col(on).alias("__k"),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__is_left"),
        (F.col(tiebreak).cast("long") if tiebreak else F.lit(0)).alias("__tb"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_cols],
        *[F.col(c).alias(f"{c}_asof") for c in payload],
    )

    w = (
        Window.partitionBy("__k")
        .orderBy(F.asc("__ts"), F.asc("__is_left"), F.asc_nulls_first("__tb"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = l_tagged.unionByName(r_tagged)
    for c in payload:
        carried = carried.withColumn(
            f"{c}_asof", F.last(f"{c}_asof", ignorenulls=True).over(w)
        )
    return carried.filter(F.col("__is_left") == 1).select(
        *left_cols, *[f"{c}_asof" for c in payload]
    )
