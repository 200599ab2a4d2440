"""Vector math over array<float> embedding columns — pure JVM-side
expressions (F.zip_with / F.aggregate), no UDFs, codegen-friendly.

Determinism: products are cast to double *before* the sequential
aggregate, matching DuckDB's list_dot_product accumulation order, so
oracle comparisons agree bit-for-bit after rounding.

Scale: these are per-row expressions (no shuffle). For 100 TB ANN see
operators/similarity.py — brute force is the per-partition kernel,
LSH bucketing bounds the candidate set.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["dot", "norm", "cosine", "normalize"]


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dot(a: Column | str, b: Column | str) -> Column:
    """Σ aᵢ·bᵢ with double accumulation in element order."""
    products = F.zip_with(_c(a), _c(b), lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(products, F.lit(0.0), lambda acc, x: acc + x)


def norm(a: Column | str) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity; NULL when either norm is zero."""
    d = dot(a, b)
    na, nb = norm(a), norm(b)
    return F.when((na > 0) & (nb > 0), d / (na * nb))


def normalize(a: Column | str) -> Column:
    """L2-normalize (pre-normalizing the corpus once turns cosine top-k
    into dot-product top-k — the standard 100 TB trick)."""
    n = norm(a)
    return F.when(n > 0, F.transform(_c(a), lambda x: x.cast("double") / n))
