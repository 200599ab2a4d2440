"""Tests for the fixed-point EWMA fold (operators/timeseries.py)."""

from __future__ import annotations

from datetime import datetime

from datagouv_tools_spark.operators.timeseries import ewma_fold


def _run(spark, rows):
    pts = spark.createDataFrame(rows, "k string, h timestamp, xm bigint")
    out = ewma_fold(pts, "k", "h", "xm", 300).collect()
    return sorted(((r["k"], r["i"], r["ewma"]) for r in out))


def test_ewma_matches_hand_fold(spark):
    """s1=x1; s2=(300*2000+700*1000)//1000=1300; s3=(300*500+700*1300)//1000=1060."""
    h = lambda i: datetime(2024, 1, 1, i)  # noqa: E731
    rows = [("a", h(0), 1000), ("a", h(1), 2000), ("a", h(2), 500)]
    assert _run(spark, rows) == [("a", 1, 1000), ("a", 2, 1300), ("a", 3, 1060)]


def test_ewma_series_are_independent_and_time_ordered(spark):
    """Two interleaved series fold independently; out-of-order input
    rows are sorted by time inside the fold."""
    h = lambda i: datetime(2024, 1, 1, i)  # noqa: E731
    rows = [
        ("b", h(1), 0),
        ("a", h(0), 1000),
        ("b", h(0), 1000),
        ("a", h(1), 1000),
    ]
    got = _run(spark, rows)
    assert got == [
        ("a", 1, 1000),
        ("a", 2, 1000),  # constant series stays put
        ("b", 1, 1000),
        ("b", 2, 700),   # (300*0 + 700*1000) // 1000
    ]


def test_ewma_truncating_division_is_the_contract(spark):
    """The fold truncates (div), never rounds: (300*1 + 700*0)//1000 = 0."""
    h = lambda i: datetime(2024, 1, 1, i)  # noqa: E731
    rows = [("c", h(0), 0), ("c", h(1), 1)]
    assert _run(spark, rows) == [("c", 1, 0), ("c", 2, 0)]
