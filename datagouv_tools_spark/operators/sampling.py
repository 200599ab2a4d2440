"""Deterministic weighted sampling operators.

``pps_systematic`` implements systematic probability-proportional-to-
size sampling (classic survey methodology — Madow 1949): walk the rows
of each group in a stable order, accumulate weights, and keep each row
whose cumulative weight crosses one of ``k`` evenly spaced thresholds.
A row with twice the weight is twice as likely to be kept; rows heavier
than total/k are always kept (selected once). Selection is a pure
integer-arithmetic function of the data — no rand(), so the sample is
byte-stable across engines, reruns, and cluster layouts, and the
``doc_pps_sample`` query's DuckDB oracle reproduces it exactly.

Scale: one window per group (the same per-group sequential shape as
doc_pack_bins — shard the group key if one group outgrows a task);
all arithmetic stays in codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = ["pps_systematic"]


def pps_systematic(
    df: DataFrame,
    group_col: str,
    order_col: str,
    weight: Column,
    k: int,
    rank_col: str | None = None,
) -> DataFrame:
    """Keep ~``k`` rows per group with probability proportional to
    ``weight`` (a positive integer Column). Input columns pass through;
    ``rank_col`` (optional) adds the 1-based threshold index."""
    cum_w = Window.partitionBy(group_col).orderBy(order_col)
    tot_w = Window.partitionBy(group_col)
    with_w = df.withColumn("__w", weight.cast("bigint"))
    with_cum = with_w.withColumn("__cum", F.sum("__w").over(cum_w)).withColumn(
        "__total", F.sum("__w").over(tot_w)
    )
    sel = with_cum.filter(
        F.expr(f"({k} * __cum) DIV __total > ({k} * (__cum - __w)) DIV __total")
    )
    if rank_col is not None:
        sel = sel.withColumn(
            rank_col, F.expr(f"({k} * __cum) DIV __total").cast("bigint")
        )
    return sel.drop("__w", "__cum", "__total")
