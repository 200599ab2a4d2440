"""Code-table lookups (SURVEY §2.5 C8; reference fantoir.py:220-243).

The reference looks codes up in an in-process dict. The Spark-native
equivalents, chosen by table size:

- **map-literal expression** (``code_lookup_expr``): for tables up to a
  few thousand entries, inline a ``F.create_map`` literal — evaluated
  JVM-side inside codegen, zero shuffle, zero join. This is what the
  191-entry nature-de-voie table uses.
- **broadcast join** (``code_lookup_join``): for bigger dimension
  tables — still shuffle-free on the fact side.

Both keep the reference's fall-through-to-input behavior via coalesce
(nature_voie("unknown") → "unknown").

The code/label pairs live in ``data/nature_voie.csv`` (public FANTOIR
reference data, one row per code).
"""

from __future__ import annotations

import csv
from functools import lru_cache
from importlib import resources
from itertools import chain

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "nature_voie_by_code",
    "code_by_nature_voie",
    "nature_voie",
    "code_voie",
    "code_lookup_expr",
    "code_lookup_join",
]


@lru_cache(maxsize=1)
def nature_voie_by_code() -> dict[str, str]:
    """code → label, e.g. 'RUE' → 'RUE' / 'ACH' → 'ANCIEN CHEMIN'."""
    with resources.files("datagouv_tools_spark.data").joinpath(
        "nature_voie.csv"
    ).open(newline="", encoding="utf-8") as f:
        return {row["code"]: row["label"] for row in csv.DictReader(f)}


@lru_cache(maxsize=1)
def code_by_nature_voie() -> dict[str, str]:
    """Inverted table; multi-code labels are comma-split like the
    reference (fantoir.py:220-221)."""
    inverted: dict[str, str] = {}
    for code, label in nature_voie_by_code().items():
        for part in label.split(","):
            inverted.setdefault(part.strip(), code)
    return inverted


def code_lookup_expr(
    col: Column | str, table: dict[str, str], default_to_input: bool = True
) -> Column:
    """Inline map-literal lookup (JVM-side, codegen-friendly)."""
    c = F.col(col) if isinstance(col, str) else col
    mapping = F.create_map(*[F.lit(x) for x in chain.from_iterable(table.items())])
    looked_up = F.try_element_at(mapping, c)
    return F.coalesce(looked_up, c) if default_to_input else looked_up


def nature_voie(col: Column | str) -> Column:
    """Column expression: nature-of-way code → label (C8)."""
    return code_lookup_expr(col, nature_voie_by_code())


def code_voie(col: Column | str) -> Column:
    """Column expression: label → nature-of-way code (inverse C8)."""
    return code_lookup_expr(col, code_by_nature_voie())


def code_lookup_join(
    df: DataFrame,
    key_col: str,
    table: dict[str, str],
    value_col: str = "label",
    default_to_input: bool = True,
) -> DataFrame:
    """Broadcast-join variant for larger code tables: builds a 2-column
    dimension DataFrame and left-joins it with an explicit broadcast
    hint (no shuffle of the fact side at any scale). The dim is a
    JVM-side map-literal explode (LocalRelation), not createDataFrame —
    a Python-RDD build side costs seconds of Py4J overhead per run."""
    spark = df.sparkSession
    mapping = F.create_map(*[F.lit(x) for x in chain.from_iterable(table.items())])
    dim = (
        spark.range(1)
        .select(F.explode(mapping))
        .select(F.col("key").alias("__code"), F.col("value").alias(value_col))
    )
    out = df.join(F.broadcast(dim), df[key_col] == dim["__code"], "left").drop("__code")
    if default_to_input:
        out = out.withColumn(value_col, F.coalesce(F.col(value_col), F.col(key_col)))
    return out
