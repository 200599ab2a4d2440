"""SIRENE "dessin" (external schema CSV) → Spark StructType
(SURVEY §1.3 mode 1, §2.1 S2; reference import_sirene.py:99-196).

A dessin is a small driver-side CSV with header
``Nom,Libellé,Longueur,Type,Ordre`` describing one data table's columns.
We parse it eagerly on the driver (it's tiny), build a rank-ordered
StructType whose field metadata carries the caption (comment), declared
length, rank and DDL type — everything the DDL generator and index
providers need downstream.

Scale note: schema files are O(100) rows; only the *data* zips are
cluster-scale. Parsing schemas on the driver is the right topology.
"""

from __future__ import annotations

import csv
import io
from dataclasses import dataclass
from pathlib import Path
from typing import Callable, Iterable

from pyspark.sql import types as T

from datagouv_tools_spark.functions.names import to_snake
from datagouv_tools_spark.schema.types import (
    PatchedSireneTypeConverter,
    TypeConverter,
)

__all__ = ["DessinField", "parse_dessin", "dessin_to_struct", "SireneSchema"]

DESSIN_COLUMNS = ("Nom", "Libellé", "Longueur", "Type", "Ordre")


@dataclass(frozen=True)
class DessinField:
    """One dessin row: declared column of the target table."""

    name: str  # camelCase source name
    caption: str  # French caption → column comment
    length: int
    domain_type: str  # Texte / Liste de codes / Numérique / Date
    rank: int  # 1-based column order


def parse_dessin(source: str | Path | io.TextIOBase) -> list[DessinField]:
    """Read a dessin CSV into rank-sorted DessinFields.

    Accepts a path or an open text stream. Rows with a missing name are
    skipped; rank ties keep file order (stable sort).
    """
    if isinstance(source, (str, Path)):
        with open(source, newline="", encoding="utf-8") as f:
            return parse_dessin(f)
    reader = csv.DictReader(source)
    fields = []
    for row in reader:
        name = (row.get("Nom") or "").strip()
        if not name:
            continue
        fields.append(
            DessinField(
                name=name,
                caption=(row.get("Libellé") or "").strip(),
                length=int(row.get("Longueur") or 0),
                domain_type=(row.get("Type") or "Texte").strip(),
                rank=int(row.get("Ordre") or 0),
            )
        )
    fields.sort(key=lambda f: f.rank)
    return fields


def dessin_to_struct(
    table_name: str,
    fields: Iterable[DessinField],
    type_converter: TypeConverter | None = None,
    process_names: Callable[[str], str] | None = to_snake,
) -> T.StructType:
    """Build the typed, renamed, rank-ordered StructType for a table.

    Field metadata keys: ``comment`` (caption), ``length``, ``rank``,
    ``sql_type`` (DDL name), ``source_name`` (pre-rename).
    """
    conv = type_converter or PatchedSireneTypeConverter()
    rename = process_names or (lambda s: s)
    struct_fields = []
    for f in sorted(fields, key=lambda f: f.rank):
        sql_type = conv.get_type(table_name, f.name, f.domain_type, f.length)
        struct_fields.append(
            T.StructField(
                rename(f.name),
                sql_type.spark_type,
                nullable=True,
                metadata={
                    "comment": f.caption,
                    "length": f.length,
                    "rank": f.rank,
                    "sql_type": sql_type.name,
                    "source_name": f.name,
                },
            )
        )
    return T.StructType(struct_fields)


@dataclass
class SireneSchema:
    """A parsed dessin bound to its table name (reference
    SireneSchemaParser, import_sirene.py:132-184)."""

    table_name: str
    fields: list[DessinField]

    @classmethod
    def from_path(cls, table_name: str, dessin_path: str | Path) -> "SireneSchema":
        return cls(table_name=table_name, fields=parse_dessin(dessin_path))

    def to_struct(
        self,
        type_converter: TypeConverter | None = None,
        process_names: Callable[[str], str] | None = to_snake,
    ) -> T.StructType:
        return dessin_to_struct(self.table_name, self.fields, type_converter, process_names)
