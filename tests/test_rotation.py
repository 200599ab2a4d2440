"""Driver-rotation invariants (__spark_entry__._rotated_names).

The correctness gate samples a bounded prefix of ``queries()`` per
round; the rotation must (a) front-load queries with a standing red
verdict, then (b) never-yet-green queries in DECLARATION order — so a
query appended at the tail of queries.py cannot jump ahead of older
never-sampled queries and push them out of the next round's sample.
No SparkSession needed: this is pure ordering logic over the committed
CORRECTNESS_r*.json snapshots.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import __spark_entry__ as entry  # noqa: E402
from datagouv_tools_spark import queries as q  # noqa: E402


def test_rotation_covers_exactly_the_declared_surface():
    names = entry._rotated_names()
    assert sorted(names) == sorted(q.QUERIES)
    assert set(q.ORACLE) <= set(q.QUERIES)


def test_never_sampled_queries_keep_declaration_order():
    counts, greens = entry._snapshot_counts()
    rotated = entry._rotated_names()
    order = list(q.QUERIES)
    never = [n for n in rotated if counts[n] == 0 and greens[n] == 0]
    # never-sampled queries appear in declaration order relative to
    # each other — tail adds stay behind older never-sampled ones
    assert never == sorted(never, key=order.index)


def test_red_verdicts_outrank_unsampled_and_greens_rotate_back():
    counts, greens = entry._snapshot_counts()
    rotated = entry._rotated_names()
    reds = [n for n in rotated if counts[n] > 0 and greens[n] == 0]
    if reds:  # no standing reds as of r6 — guard stays meaningful later
        assert rotated[: len(reds)] == reds
    # every green-before query sits after every never-sampled one
    first_green = next(
        (i for i, n in enumerate(rotated) if greens[n] > 0), len(rotated)
    )
    assert all(
        greens[n] > 0 or (counts[n] > 0 and greens[n] == 0)
        for n in rotated[first_green:]
    )
