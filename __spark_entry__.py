"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query at sf0.001;
``queries()`` / ``oracle_sql()`` expose the engine's declared query
surface (datagouv_tools_spark/queries/) for the duckdb correctness
gate at sf0.01.
"""

from __future__ import annotations

import json
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

from datagouv_tools_spark import queries as q


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: TPC-H Q1 analog on /root/testdata/sf0.001."""
    return q.q1_pricing_summary(spark, "/root/testdata/sf0.001")


def _snapshot_counts() -> tuple[dict[str, int], dict[str, int]]:
    """(checked, green) counts per query across past driver snapshots
    (CORRECTNESS_r*.json).

    The driver's correctness gate samples a bounded prefix of ``queries()``.
    Ordering by the green counts rotates never-yet-green queries to the
    front, so every query lands in some round's hard signal and a red
    verdict is retried before any merely-unsampled query.
    """
    counts: dict[str, int] = {name: 0 for name in q.QUERIES}
    greens: dict[str, int] = {name: 0 for name in q.QUERIES}
    for path in sorted(Path(__file__).resolve().parent.glob("CORRECTNESS_r*.json")):
        try:
            seen = json.loads(path.read_text())
        except (OSError, ValueError):
            continue
        for name, entry in seen.items():
            # an errored row (harness crash, e.g. the r03 array-shape
            # TypeErrors) produced no verdict — treat as never checked
            # so the fixed query rotates back to the front
            if isinstance(entry, dict) and entry.get("err") is not None:
                continue
            if name in counts:
                counts[name] += 1
                if isinstance(entry, dict) and all(
                    entry.get(k) for k in ("rows_match", "schema_match", "hash_match")
                ):
                    greens[name] += 1
    return counts, greens


def _rotated_names() -> list[str]:
    counts, greens = _snapshot_counts()
    order = list(q.QUERIES)
    # Sampled-but-never-green queries carry a standing red verdict — they
    # outrank even never-sampled ones (which at least aren't known-bad),
    # then ascending green coverage rotates the rest through the sample.
    return sorted(
        order,
        key=lambda name: (
            not (counts[name] > 0 and greens[name] == 0),
            greens[name],
            order.index(name),
        ),
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.

    Least-driver-checked queries first (see ``_snapshot_counts``); the full
    surface is always present.
    """
    return {name: q.QUERIES[name] for name in _rotated_names()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each query (where expressible)."""
    return {name: q.ORACLE[name] for name in _rotated_names() if name in q.ORACLE}
