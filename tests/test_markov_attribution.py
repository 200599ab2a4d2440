"""Unit tests for Markov removal-effect attribution
(operators/markov_attribution.py)."""

from __future__ import annotations

import datetime as dt

import duckdb

from datagouv_tools_spark.operators.markov_attribution import (
    PPM,
    _solve_absorption,
    journey_edges,
    markov_oracle_sql,
    markov_removal_attribution,
)

CH = ("click", "view")


def _ts(m):
    return dt.datetime(2024, 1, 1, 0, m)


def _events(spark, rows):
    return spark.createDataFrame(
        [
            (i, _ts(m), u, et, 0.0, "{}")
            for i, (u, m, et) in enumerate(rows)
        ],
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )


def test_journey_edges_shapes(spark):
    """Three journey shapes: converting path, non-converting path, and
    a first-event conversion (start→conv)."""
    ev = _events(
        spark,
        [
            (1, 0, "click"),
            (1, 1, "view"),
            (1, 2, "purchase"),
            (1, 3, "click"),  # post-conversion: excluded
            (2, 0, "view"),
            (2, 1, "view"),
            (3, 0, "purchase"),
        ],
    )
    got = sorted(
        (r.src, r.dst)
        for r in journey_edges(ev, CH).collect()
    )
    assert got == sorted(
        [
            ("start", "click"),
            ("click", "view"),
            ("view", "conv"),
            ("start", "view"),
            ("view", "view"),
            ("view", "null"),
            ("start", "conv"),
        ]
    )


def test_solver_hand_computed():
    """start→click (ppm 1e6), click→conv 0.5 / click→null 0.5: base
    absorption = 0.5; removing click zeroes it."""
    t = {
        ("start", "click"): PPM,
        ("click", "conv"): PPM // 2,
        ("click", "null"): PPM // 2,
    }
    p = _solve_absorption(t, iters=4, removed=None)
    assert p["start"] == PPM // 2
    p_rm = _solve_absorption(t, iters=4, removed="click")
    assert p_rm["start"] == 0


def test_spark_matches_duckdb_small(spark, tmp_path):
    """Full attribution through BOTH engines on a 4-user corpus with
    every journey shape present."""
    rows = [
        (1, 0, "click"),
        (1, 1, "view"),
        (1, 2, "purchase"),
        (2, 0, "view"),
        (2, 1, "view"),
        (3, 0, "purchase"),
        (4, 0, "click"),
        (4, 1, "purchase"),
        (4, 2, "purchase"),
    ]
    ev = _events(spark, rows)
    got = [
        tuple(r)
        for r in markov_removal_attribution(ev, CH, iters=8).collect()
    ]
    path = str(tmp_path / "events.parquet")
    ev.toPandas().to_parquet(path)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{path}'")
    want = [
        tuple(r)
        for r in con.execute(markov_oracle_sql(CH, iters=8)).fetchall()
    ]
    assert got == want
    # shares normalize to ~1e6 (truncation can undershoot slightly)
    total = sum(r[4] for r in got)
    assert got and 0 < total <= PPM
