from datagouv_tools_spark.schema.types import (
    SqlType,
    SQL_TYPES,
    DefaultTypeConverter,
    SireneTypeConverter,
    PatchedSireneTypeConverter,
)
from datagouv_tools_spark.schema.dessin import DessinField, parse_dessin, dessin_to_struct
from datagouv_tools_spark.schema.record_format import FixedWidthField, RecordFormat

__all__ = [
    "SqlType",
    "SQL_TYPES",
    "DefaultTypeConverter",
    "SireneTypeConverter",
    "PatchedSireneTypeConverter",
    "DessinField",
    "parse_dessin",
    "dessin_to_struct",
    "FixedWidthField",
    "RecordFormat",
]
