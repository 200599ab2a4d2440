"""Column-expression casts matching the reference's type semantics
(SURVEY §2.5 C1–C4, §1.2; reference sql/sql_type.py, fichier_personnes_decedees.py).

All of these are built from JVM-side ``pyspark.sql.functions`` — they
stay inside whole-stage codegen; no Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["strict_boolean", "lenient_date_struct", "lenient_date", "typed_cast"]

#: Token sets of the reference's strict boolean parser
#: (sql_type.py:77-83). Spark's cast("boolean") accepts y/n/t/f but NOT
#: on/off, and silently nulls unknown tokens under non-ANSI — so the
#: reference semantics need an explicit expression.
TRUE_TOKENS = ("true", "yes", "on", "1")
FALSE_TOKENS = ("false", "no", "off", "0")


def strict_boolean(col: Column | str, on_error: str = "null") -> Column:
    """Parse the reference's boolean token set.

    on_error='null' → unknown tokens become NULL (Spark-idiomatic);
    on_error='fail' → raise at runtime like the reference (via
    raise_error), for strict-ingest mode.
    """
    c = F.lower(F.trim(F.col(col) if isinstance(col, str) else col))
    expr = F.when(c.isin(*TRUE_TOKENS), F.lit(True)).when(
        c.isin(*FALSE_TOKENS), F.lit(False)
    )
    if on_error == "fail":
        return expr.otherwise(
            F.when(c.isNull(), F.lit(None).cast("boolean")).otherwise(
                F.raise_error(F.concat(F.lit("unexpected boolean value: "), c)).cast(
                    "boolean"
                )
            )
        )
    return expr.otherwise(F.lit(None).cast("boolean"))


def lenient_date_struct(col: Column | str) -> Column:
    """Parse AAAAMMJJ into a (year, month, day) struct, keeping partial
    dates like '19400000' representable (reference LenientDate,
    fichier_personnes_decedees.py:36-46; any parse failure → (0,0,0)).

    Spark's DateType cannot hold 1940-00-00; the struct preserves the
    reference's semantics losslessly, and ``lenient_date`` derives the
    nullable DateType view.
    """
    c = F.col(col) if isinstance(col, str) else col
    digits = F.when(c.rlike(r"^[0-9]{8}$"), c)
    year = F.coalesce(digits.substr(1, 4).try_cast("int"), F.lit(0))
    month = F.coalesce(digits.substr(5, 2).try_cast("int"), F.lit(0))
    day = F.coalesce(digits.substr(7, 2).try_cast("int"), F.lit(0))
    return F.struct(year.alias("year"), month.alias("month"), day.alias("day"))


def lenient_date(col: Column | str) -> Column:
    """Nullable DateType view of a lenient AAAAMMJJ string: NULL unless
    the full date is valid (make_date validates real calendars)."""
    c = F.col(col) if isinstance(col, str) else col
    valid = c.rlike(r"^[0-9]{8}$")
    return F.when(
        valid,
        F.try_to_timestamp(c, F.lit("yyyyMMdd")).cast("date"),
    ).otherwise(F.lit(None).cast("date"))


def typed_cast(col: Column | str, sql_type_name: str) -> Column:
    """Cast a string column per the reference's SQL-type casters
    (C1/C3): numeric types via try_cast (dirty data → NULL, never a job
    abort under ANSI mode), dates/timestamps via try_to_timestamp with
    the reference's fixed formats."""
    c = F.col(col) if isinstance(col, str) else col
    name = sql_type_name.lower()
    if name in ("smallint",):
        return c.try_cast("smallint")
    if name in ("integer", "int", "serial"):
        return c.try_cast("int")
    if name in ("bigint", "bigserial"):
        return c.try_cast("bigint")
    if name in ("real",):
        return c.try_cast("float")
    if name in ("double precision", "double"):
        return c.try_cast("double")
    if name in ("decimal", "numeric", "money"):
        return c.try_cast("decimal(38,9)")
    if name == "boolean":
        return strict_boolean(c)
    if name == "date":
        return F.try_to_timestamp(c, F.lit("yyyy-MM-dd")).cast("date")
    if name.startswith("timestamp"):
        return F.try_to_timestamp(c, F.lit("yyyy-MM-dd HH:mm:ss"))
    if name.startswith("time"):
        # Spark has no TIME type (reference sql_type.py:98-103); keep the
        # validated string form.
        return F.when(c.rlike(r"^\d{2}:\d{2}:\d{2}$"), c)
    if name == "bytea":
        return c.cast("binary")
    return c  # text family: identity, like the reference
