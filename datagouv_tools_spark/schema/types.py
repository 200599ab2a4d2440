"""SQL type catalog + domain-type converters (SURVEY §1.2, §2.7 U1;
reference sql/sql_type.py, import_sirene.py:227-262).

Each ``SqlType`` knows three things:

- its DDL rendering (``render``), parametrizable — ``decimal(10, 2)``,
  ``timestamp(5) without time zone``;
- its Spark type (``spark_type``) for StructType construction;
- its cast expression (via functions/casts.typed_cast) for turning the
  all-string CSV/fixed-width scan output into typed columns.

Deliberate divergences from the reference (documented, SURVEY §7.4):
the reference's DATE caster calls a method that doesn't exist
(sql_type.py:94-95 would crash); we parse dates correctly. INTERVAL is
unimplemented there (sql_type.py:137); Spark gives DayTimeIntervalType
for free so we map it.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import types as T

from datagouv_tools_spark.functions.casts import typed_cast

__all__ = [
    "SqlType",
    "SQL_TYPES",
    "TypeConverter",
    "DefaultTypeConverter",
    "SireneTypeConverter",
    "PatchedSireneTypeConverter",
]


@dataclass(frozen=True)
class SqlType:
    """A scalar SQL type: DDL name + Spark type + optional DDL suffix."""

    name: str
    spark_type: T.DataType = field(default_factory=T.StringType)
    suffix: str = ""

    def render(self, *params) -> str:
        """DDL rendering with optional parameters.

        >>> SQL_TYPES["decimal"].render(10, 2)
        'decimal(10, 2)'
        >>> SQL_TYPES["timestamp without time zone"].render(5)
        'timestamp(5) without time zone'
        >>> SQL_TYPES["text"].render()
        'text'
        """
        base = self.name.split(" ")[0]
        rest = self.name[len(base):]
        if params:
            rendered = f"{base}({', '.join(str(p) for p in params)}){rest}"
        else:
            rendered = self.name
        return f"{rendered}{self.suffix}" if self.suffix else rendered

    def cast(self, col):
        return typed_cast(col, self.name)


def _mk(name: str, spark_type: T.DataType) -> SqlType:
    return SqlType(name=name, spark_type=spark_type)


SQL_TYPES: dict[str, SqlType] = {
    t.name: t
    for t in [
        _mk("smallint", T.ShortType()),
        _mk("integer", T.IntegerType()),
        _mk("bigint", T.LongType()),
        _mk("serial", T.IntegerType()),
        _mk("bigserial", T.LongType()),
        _mk("decimal", T.DecimalType(38, 9)),
        _mk("numeric", T.DecimalType(38, 9)),
        _mk("money", T.DecimalType(19, 2)),
        _mk("real", T.FloatType()),
        _mk("double precision", T.DoubleType()),
        _mk("character varying", T.StringType()),
        _mk("varchar", T.StringType()),
        _mk("character", T.StringType()),
        _mk("char", T.StringType()),
        _mk("text", T.StringType()),
        _mk("bytea", T.BinaryType()),
        _mk("timestamp", T.TimestampNTZType()),
        _mk("timestamp without time zone", T.TimestampNTZType()),
        _mk("timestamp with time zone", T.TimestampType()),
        _mk("date", T.DateType()),
        _mk("time", T.StringType()),  # no TIME type in Spark
        _mk("time without time zone", T.StringType()),
        _mk("time with time zone", T.StringType()),
        _mk("interval", T.DayTimeIntervalType()),
        _mk("boolean", T.BooleanType()),
    ]
}


class TypeConverter:
    """Strategy mapping a schema row's domain type to a SqlType (U1)."""

    def get_type(self, table: str, field_name: str, domain_type: str, length: int) -> SqlType:
        raise NotImplementedError


class DefaultTypeConverter(TypeConverter):
    """Everything TEXT — the reference's schema-on-read fallback
    (sql/generic.py:360-362)."""

    def get_type(self, table, field_name, domain_type, length):  # noqa: D102
        return SQL_TYPES["text"]


#: Dessin domain types → SQL types (import_sirene.py:227-232).
_SIRENE_MAP = {
    "Texte": "text",
    "Liste de codes": "text",
    "Date": "date",
    "Numérique": "numeric",
}


class SireneTypeConverter(TypeConverter):
    def get_type(self, table, field_name, domain_type, length):  # noqa: D102
        return SQL_TYPES[_SIRENE_MAP.get(domain_type, "text")]


class PatchedSireneTypeConverter(SireneTypeConverter):
    """The reference's dirty-data patch layer (import_sirene.py:235-250):

    - a Date whose declared length ≠ 10 cannot be a real yyyy-MM-dd
      date → degrade to text;
    - StockEtablissement.numeroVoieEtablissement is declared numeric but
      contains junk → force text.
    """

    FORCED_TEXT = {("stockEtablissement".lower(), "numeroVoieEtablissement".lower())}

    def get_type(self, table, field_name, domain_type, length):  # noqa: D102
        if domain_type == "Date" and length != 10:
            return SQL_TYPES["text"]
        if (table.lower(), field_name.lower()) in self.FORCED_TEXT:
            return SQL_TYPES["text"]
        return super().get_type(table, field_name, domain_type, length)
