"""2-D skyline (Pareto-dominance) operator.

A point survives the skyline iff no other point is at-least-as-good on
both dimensions and strictly better on one. The implementation is the
sort-filter skyline: collapse points to distinct levels of the
minimized dimension, sweep a cumulative max of the maximized dimension
over the levels in order, and keep a point iff it beats every
strictly-better level's best AND is its own level's best. Equal
(min, max) ties all survive — neither dominates the other.

Scale: the only data-sized shuffle is whatever aggregation produced
the points; the ordered sweep runs over DISTINCT minimize-levels
(bounded by value quantization, ≪ points), and the verdict joins back
by level. For extreme level counts, pre-filter with a local skyline
per partition (mapPartitions) and feed the union of survivors to this
same operator — skyline is idempotent and distributive over unions,
so the refinement changes cost, never results.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def skyline_2d(points: DataFrame, min_col: str, max_col: str) -> DataFrame:
    """Rows of ``points`` not Pareto-dominated under (minimize
    ``min_col``, maximize ``max_col``). All other columns pass through.
    Both dimension columns must be non-null."""
    lvl = points.groupBy(min_col).agg(F.max(max_col).alias("__lvl_max"))
    w = Window.orderBy(min_col).rowsBetween(Window.unboundedPreceding, -1)
    run = lvl.select(
        min_col,
        "__lvl_max",
        F.coalesce(F.max("__lvl_max").over(w), F.lit(None)).alias("__run_max"),
    )
    return (
        points.join(run, min_col)
        .filter(
            (
                F.col("__run_max").isNull()
                | (F.col(max_col) > F.col("__run_max"))
            )
            & (F.col(max_col) == F.col("__lvl_max"))
        )
        .drop("__lvl_max", "__run_max")
    )
