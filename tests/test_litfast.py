"""functions/litfast: single-expr literal arrays must equal the
per-element F.lit loop form bit-for-bit (values AND types), because
every converted operator (minhash permutations, simhash masks,
perceptron weights, k-center centers, JL projection planes) relies on
that equivalence for its oracle hash."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datagouv_tools_spark.functions.litfast import (
    lit_bigint_array,
    lit_bigint_matrix,
    lit_double_array,
    lit_double_matrix,
)

BIGINTS = [0, 1, -1, 5, (1 << 62), -(1 << 63), (1 << 63) - 1]
DOUBLES = [0.0, -0.0, 0.1, -2.5, 1e-300, 1.7976931348623157e308, 3.3e-5]


def _one(spark, col):
    return spark.range(1).select(col.alias("x")).collect()[0][0]


def test_bigint_array_matches_lit_loop(spark):
    fast = _one(spark, lit_bigint_array(BIGINTS))
    loop = _one(
        spark, F.array(*[F.lit(v).cast("bigint") for v in BIGINTS])
    )
    assert fast == loop == BIGINTS


def test_double_array_matches_lit_loop_bitwise(spark):
    import struct

    fast = _one(spark, lit_double_array(DOUBLES))
    loop = _one(spark, F.array(*[F.lit(float(v)) for v in DOUBLES]))
    assert [struct.pack("d", v) for v in fast] == [
        struct.pack("d", v) for v in loop
    ] == [struct.pack("d", v) for v in DOUBLES]


def test_matrices_and_empty(spark):
    rows = [[1, 2], [3, -4]]
    assert _one(spark, lit_bigint_matrix(rows)) == rows
    drows = [[0.5, -1.25], [3.3e-5, 0.0]]
    assert _one(spark, lit_double_matrix(drows)) == drows
    empty = _one(spark, lit_bigint_array([]))
    assert empty == []
    # empty arrays keep a usable element type (not NullType)
    df = spark.range(1).select(lit_bigint_array([]).alias("x"))
    assert df.schema["x"].dataType.simpleString() == "array<bigint>"


def test_bigint_guards():
    with pytest.raises(ValueError):
        lit_bigint_array([1 << 63])
    with pytest.raises(ValueError):
        lit_bigint_array([1.5])


def test_nonfinite_doubles(spark):
    import math

    vals = [float("nan"), float("inf"), float("-inf")]
    got = _one(spark, lit_double_array(vals))
    assert math.isnan(got[0]) and got[1] == math.inf and got[2] == -math.inf
