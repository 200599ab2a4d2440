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


def test_ewma_negative_values_truncate_toward_zero(spark):
    """Negative observations must truncate like DuckDB's `//` (toward
    zero), not Python's floor: s2 = (300*-2500 + 700*1000) // 1000 is
    -50 truncating, -50 here too, but s3 = (300*1 + 700*-50) = -34700
    → trunc -34, floor -35. The fold must produce -34."""
    h = lambda i: datetime(2024, 1, 1, i)  # noqa: E731
    rows = [("n", h(0), 1000), ("n", h(1), -2500), ("n", h(2), 1)]
    got = _run(spark, rows)
    assert got == [("n", 1, 1000), ("n", 2, -50), ("n", 3, -34)]


def test_ewma_negative_matches_duckdb_recurrence(spark):
    """End-to-end cross-engine parity on a sign-mixed series: the
    Spark fold and the documented DuckDB recursive-CTE oracle must
    value-agree for negatives (the _tdiv fix; ADVICE r6)."""
    import duckdb

    from datagouv_tools_spark.operators.timeseries import ewma_oracle_sql

    h = lambda i: datetime(2024, 1, 1, i)  # noqa: E731
    xs = [1000, -2500, 1, -7, 333, -999, 12]
    rows = [("m", h(i), x) for i, x in enumerate(xs)]
    spark_got = _run(spark, rows)

    con = duckdb.connect()
    pts = ", ".join(
        f"('m', TIMESTAMP '2024-01-01 {i:02d}:00:00', {x})"
        for i, x in enumerate(xs)
    )
    sql = ewma_oracle_sql(
        f"SELECT * FROM (VALUES {pts}) AS t(k, h, xm)", "k", "h", "xm", 300
    )
    duck_got = sorted(
        (r[0], int(r[2]), int(r[4])) for r in con.execute(sql).fetchall()
    )
    assert spark_got == duck_got


# ---------------------------------------------------------------------------
# debounce_fold
# ---------------------------------------------------------------------------


def _deb(spark, rows, gap):
    from datagouv_tools_spark.operators.timeseries import debounce_fold

    ev = spark.createDataFrame(rows, "k string, h timestamp, eid bigint")
    out = debounce_fold(ev, ["k"], "h", "eid", gap)
    return {r["eid"]: r["kept"] for r in out.collect()}


def test_debounce_suppressed_event_does_not_reset_clock(spark):
    """Events at t=0, 5, 9, 11 with gap 10: 5 and 9 are suppressed, and
    11 is KEPT because the clock runs from the kept t=0 — a lag()-based
    filter would wrongly suppress 11 (9 is only 2 away)."""
    from datetime import datetime, timedelta

    t0 = datetime(2024, 1, 1)
    rows = [
        ("u", t0 + timedelta(seconds=s), i)
        for i, s in enumerate([0, 5, 9, 11])
    ]
    got = _deb(spark, rows, gap=10_000_000)
    assert got == {0: 1, 1: 0, 2: 0, 3: 1}


def test_debounce_keys_are_independent_and_ties_by_id(spark):
    from datetime import datetime

    t0 = datetime(2024, 1, 1)
    rows = [("a", t0, 2), ("a", t0, 1), ("b", t0, 3)]
    got = _deb(spark, rows, gap=1_000_000)
    # same timestamp: lower id is "first" and kept; the other suppressed
    assert got == {1: 1, 2: 0, 3: 1}


# ---------------------------------------------------------------------------
# holt_fold
# ---------------------------------------------------------------------------


def _holt(spark, xs, a=300, b=200):
    from datetime import datetime, timedelta

    from datagouv_tools_spark.operators.timeseries import holt_fold

    t0 = datetime(2024, 1, 1)
    rows = [("s", t0 + timedelta(hours=i), x) for i, x in enumerate(xs)]
    pts = spark.createDataFrame(rows, "k string, h timestamp, xm bigint")
    out = holt_fold(pts, "k", "h", "xm", a, b).orderBy("i").collect()
    return [(r["level"], r["trend"]) for r in out]


def test_holt_matches_hand_fold(spark):
    """x=[1000,2000]: l2=(300*2000+700*(1000+0))//1000=1300,
    b2=(200*(1300-1000)+800*0)//1000=60."""
    assert _holt(spark, [1000, 2000]) == [(1000, 0), (1300, 60)]


def test_holt_linear_series_trend_tracks_slope(spark):
    """On a long exact ramp the trend state approaches the true slope."""
    xs = [1000 * i for i in range(1, 41)]
    lvl, tr = _holt(spark, xs)[-1]
    assert 800 <= tr <= 1000  # true slope 1000/step, fixed-point lag

def test_holt_negative_trend_truncates_like_engines(spark):
    """Declining series: trend goes negative; values must match the
    truncate-toward-zero recurrence (floor would differ)."""
    from datagouv_tools_spark.operators.timeseries import _tdiv

    xs = [10000, 5000, 2000, 1000]
    lvl = tr = None
    expect = []
    for x in xs:
        if lvl is None:
            lvl, tr = x, 0
        else:
            prev = lvl
            lvl = _tdiv(300 * x + 700 * (lvl + tr), 1000)
            tr = _tdiv(200 * (lvl - prev) + 800 * tr, 1000)
        expect.append((lvl, tr))
    got = _holt(spark, xs)
    assert got == expect and got[-1][1] < 0
