"""Vector math over array<float> embedding columns — pure JVM-side
expressions (F.zip_with / F.aggregate), no UDFs, codegen-friendly.

Determinism: products are cast to double *before* the sequential
aggregate, matching DuckDB's list_dot_product accumulation order, so
oracle comparisons agree bit-for-bit after rounding.

Scale: these are per-row expressions (no shuffle). For 100 TB ANN see
operators/similarity.py — brute force is the per-partition kernel,
LSH bucketing bounds the candidate set.

Construction cost: when callers pass COLUMN NAMES (the common case),
each helper renders its whole expression as ONE SQL string parsed by a
single ``F.expr`` round-trip — the Column-operator form costs ~150
(dot) to ~500 (cosine) py4j round-trips per call site (~70-160 ms of
query build time each, measured; see functions/litfast for the
rationale). Column inputs (e.g. lambda variables inside ``transform``)
keep the Column path; both forms build the same expression tree, so
plans and results are identical (test-pinned equivalence).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from datagouv_tools_spark.functions.litfast import sql_ref

__all__ = ["dot", "norm", "cosine", "normalize"]

#: zip_with product with the double casts applied BEFORE accumulation —
#: textual twin of the lambda in ``_dot_cols``.
_DOT_SQL = (
    "aggregate(zip_with({a}, {b},"
    " (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),"
    " CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)"
)


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def _sql_ref(col: Column | str) -> str | None:
    """Backtick-quoted SQL reference for a plain column name (dotted
    names split into parts, matching ``F.col``); None for a Column
    object (not renderable as text)."""
    return sql_ref(col) if isinstance(col, str) else None


def _dot_sql(a: str, b: str) -> str:
    return _DOT_SQL.format(a=a, b=b)


def _dot_cols(a: Column | str, b: Column | str) -> Column:
    products = F.zip_with(
        _c(a), _c(b), lambda x, y: x.cast("double") * y.cast("double")
    )
    return F.aggregate(products, F.lit(0.0), lambda acc, x: acc + x)


def dot(a: Column | str, b: Column | str) -> Column:
    """Σ aᵢ·bᵢ with double accumulation in element order."""
    sa, sb = _sql_ref(a), _sql_ref(b)
    if sa is not None and sb is not None:
        return F.expr(_dot_sql(sa, sb))
    return _dot_cols(a, b)


def norm(a: Column | str) -> Column:
    sa = _sql_ref(a)
    if sa is not None:
        return F.expr(f"sqrt({_dot_sql(sa, sa)})")
    return F.sqrt(_dot_cols(a, a))


def cosine(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity; NULL when either norm is zero."""
    sa, sb = _sql_ref(a), _sql_ref(b)
    if sa is not None and sb is not None:
        d = _dot_sql(sa, sb)
        na = f"sqrt({_dot_sql(sa, sa)})"
        nb = f"sqrt({_dot_sql(sb, sb)})"
        return F.expr(
            f"CASE WHEN ({na} > 0) AND ({nb} > 0)"
            f" THEN {d} / ({na} * {nb}) END"
        )
    d = _dot_cols(a, b)
    na, nb = F.sqrt(_dot_cols(a, a)), F.sqrt(_dot_cols(b, b))
    return F.when((na > 0) & (nb > 0), d / (na * nb))


def normalize(a: Column | str) -> Column:
    """L2-normalize (pre-normalizing the corpus once turns cosine top-k
    into dot-product top-k — the standard 100 TB trick)."""
    sa = _sql_ref(a)
    if sa is not None:
        n = f"sqrt({_dot_sql(sa, sa)})"
        # `__nx` as the lambda variable: {n} re-references the column
        # inside the lambda body, and SQL lambda variables capture by
        # name — a vector column literally named `x` would be shadowed.
        return F.expr(
            f"CASE WHEN {n} > 0"
            f" THEN transform({sa}, __nx -> CAST(__nx AS DOUBLE) / {n}) END"
        )
    n = F.sqrt(_dot_cols(a, a))
    return F.when(n > 0, F.transform(_c(a), lambda x: x.cast("double") / n))
