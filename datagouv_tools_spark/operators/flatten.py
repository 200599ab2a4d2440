"""Array → fixed columns pivot (SURVEY §2.5 C6; reference
fichier_personnes_decedees.py:186-192: prenoms[:8] padded with NULL)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["flatten_array_to_columns"]


def flatten_array_to_columns(
    df: DataFrame,
    array_col: str,
    n: int,
    prefix: str,
    drop_source: bool = True,
    start_index: int = 1,
) -> DataFrame:
    """Explode an array column into exactly ``n`` scalar columns
    ``{prefix}{start_index}..{prefix}{start_index+n-1}``, padding with
    NULL — pure projection, no shuffle, codegen-friendly. ``F.get``
    (not ``getItem``) so a short array yields NULL instead of an ANSI
    out-of-bounds error."""
    cols: list[Column] = [
        F.get(F.col(array_col), i).alias(f"{prefix}{start_index + i}") for i in range(n)
    ]
    out = df.select("*", *cols)
    return out.drop(array_col) if drop_source else out
