"""Fixed-width record formats → Spark substring projections
(SURVEY §2.1 S5/S6, §2.3 P1/F3; reference fantoir.py:246-396,
fichier_personnes_decedees.py:77-116).

A ``RecordFormat`` declares named byte-slices of a fixed-width line.
``projection()`` compiles it to a list of JVM-side ``F.substring``
columns over a ``spark.read.text`` DataFrame — the whole parse stays in
whole-stage codegen; no Python touches row data.

Filler fields (``is_filler=True``) are declared for documentation but
excluded from the projection (column pruning at the schema level, P1).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from datagouv_tools_spark.functions.names import sanitize

__all__ = ["FixedWidthField", "RecordFormat", "FANTOIR_FORMATS", "classify_fantoir_record"]


@dataclass(frozen=True)
class FixedWidthField:
    """1-based start position + length, as in the FANTOIR spec."""

    start: int
    length: int
    description: str
    is_filler: bool = False

    @property
    def column_name(self) -> str:
        return sanitize(self.description)


@dataclass(frozen=True)
class RecordFormat:
    name: str
    fields: tuple[FixedWidthField, ...]

    @property
    def header(self) -> list[str]:
        return [f.column_name for f in self.fields if not f.is_filler]

    def projection(self, value_col: str = "value", trim: bool = True) -> list[Column]:
        """Compile to substring column expressions (non-filler only)."""
        cols = []
        for f in self.fields:
            if f.is_filler:
                continue
            c = F.substring(F.col(value_col), f.start, f.length)
            if trim:
                c = F.rtrim(c)
            cols.append(c.alias(f.column_name))
        return cols

    def apply(self, lines: DataFrame, value_col: str = "value", trim: bool = True) -> DataFrame:
        return lines.select(*self.projection(value_col, trim))


def _f(start: int, length: int, description: str, filler: bool = False) -> FixedWidthField:
    return FixedWidthField(start, length, description, filler)


# FANTOIR record layouts (FIXTURES.md §2, reference fantoir.py:310-385).
# Non-filler fields only — fillers are implicit gaps; unlike the
# reference we don't enumerate them, the substring projection simply
# skips the bytes.

FANTOIR_HEADER = RecordFormat(
    "header",
    (
        _f(12, 25, "libellé du centre de production du fichier"),
        _f(37, 8, "date de situation du fichier"),
        _f(45, 8, "date de production du fichier"),
    ),
)

FANTOIR_DIRECTION = RecordFormat(
    "direction",
    (
        _f(1, 2, "code département"),
        _f(3, 1, "code direction"),
        _f(12, 30, "libellé direction"),
    ),
)

FANTOIR_COMMUNE = RecordFormat(
    "commune",
    (
        _f(1, 2, "code département"),
        _f(3, 1, "code direction"),
        _f(4, 3, "code commune"),
        _f(11, 1, "clé rivoli"),
        _f(12, 30, "libellé commune"),
        _f(43, 1, "type de la commune"),
        _f(46, 1, "caractère rur"),
        _f(50, 1, "caractère de population"),
        _f(53, 7, "population réelle"),
        _f(60, 7, "population à part"),
        _f(67, 7, "population fictive"),
        _f(74, 1, "caractère d'annulation"),
        _f(75, 7, "date d'annulation"),
        _f(82, 7, "date de création de l'article"),
    ),
)

FANTOIR_VOIE = RecordFormat(
    "voie",
    (
        _f(1, 2, "code département"),
        _f(3, 1, "code direction"),
        _f(4, 3, "code commune"),
        _f(7, 4, "identifiant de la voie dans la commune"),
        _f(11, 1, "clé rivoli"),
        _f(12, 4, "code nature de voie"),
        _f(16, 26, "libellé voie"),
        _f(43, 1, "type de la commune"),
        _f(46, 1, "caractère rur"),
        _f(49, 1, "caractère de voie"),
        _f(50, 1, "caractère de population"),
        _f(60, 7, "population à part"),
        _f(67, 7, "population fictive"),
        _f(74, 1, "caractère d'annulation"),
        _f(75, 7, "date d'annulation"),
        _f(82, 7, "date de création de l'article"),
        _f(104, 5, "code identifiant majic de la voie"),
        _f(109, 1, "type de voie"),
        _f(110, 1, "caractère du lieu-dit"),
        _f(113, 8, "dernier mot entièrement alphabétique du libellé de la voie"),
    ),
)

FANTOIR_FORMATS: dict[str, RecordFormat] = {
    fmt.name: fmt
    for fmt in (FANTOIR_HEADER, FANTOIR_DIRECTION, FANTOIR_COMMUNE, FANTOIR_VOIE)
}


def classify_fantoir_record(value_col: str = "value") -> Column:
    """Positional record-type predicate ladder (F3; reference
    fantoir.py:388-396): byte 1 NUL → header; byte 4 blank → direction;
    byte 8 blank → commune; else voie."""
    c = F.col(value_col)
    return (
        F.when(F.substring(c, 1, 1) == "\x00", F.lit("header"))
        .when(F.substring(c, 4, 1) == " ", F.lit("direction"))
        .when(F.substring(c, 8, 1) == " ", F.lit("commune"))
        .otherwise(F.lit("voie"))
        .alias("record_type")
    )


# INSEE deaths file layout (FIXTURES.md §3; reference
# fichier_personnes_decedees.py:78-92 — 0-based slices there, 1-based
# starts here).
DECES_FORMAT = RecordFormat(
    "deces",
    (
        _f(1, 80, "nom et prénoms"),
        _f(81, 1, "sexe"),
        _f(82, 8, "date de naissance"),
        _f(90, 5, "code du lieu de naissance"),
        _f(95, 30, "commune de naissance"),
        _f(125, 30, "pays de naissance"),
        _f(155, 8, "date de décès"),
        _f(163, 5, "code du lieu de décès"),
        _f(168, 9, "numéro d'acte de décès"),
    ),
)
