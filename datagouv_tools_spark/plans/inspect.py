"""Physical-plan inspection — the engine's scale guardrails.

The reference has no optimizer to test (SURVEY.md §4: its only
"pruning" is the schema-driven filler drop). In a Catalyst engine the
equivalent discipline is asserting the *properties of the chosen
plan*: filters reach the parquet scan, projections prune the read
schema, small dimensions broadcast, fact tables shuffle at most once.
These helpers turn `.explain("formatted")` output into testable
predicates so a regression that silently de-optimizes a query (a lost
pushdown, a broadcast that became a shuffle) fails CI instead of
surfacing as a 100× slowdown at 100 TB.

Also the K11 parity seam: the reference's dry-run mode logs the SQL it
*would* run (`import_sirene.py:78-93` in the reference repo); here
``physical_plan`` is the engine analog — inspect the plan without
executing it.
"""

from __future__ import annotations

import io
import re
from contextlib import redirect_stdout

from pyspark.sql import DataFrame

__all__ = [
    "physical_plan",
    "pushed_filters",
    "read_schemas",
    "exchange_count",
    "has_broadcast_hash_join",
    "has_shuffle_join",
    "codegen_stage_count",
]


def physical_plan(df: DataFrame, mode: str = "formatted") -> str:
    """The physical plan as text (pre-execution; AQE may still improve
    it at runtime — these checks assert the static lower bound)."""
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def pushed_filters(df: DataFrame) -> list[str]:
    """Every PushedFilters entry across the plan's file scans."""
    plan = physical_plan(df)
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", plan):
        out.extend(s.strip() for s in m.group(1).split(",") if s.strip())
    return out


def read_schemas(df: DataFrame) -> list[str]:
    """ReadSchema of each file scan — the columns actually read; a scan
    reading columns the query never touches is a pruning failure."""
    plan = physical_plan(df)
    return re.findall(r"ReadSchema: (struct<[^\n]*>)", plan)


def exchange_count(df: DataFrame) -> int:
    """Number of shuffle exchanges (excludes broadcast exchanges).
    Every one is a full network redistribution of its input — the
    unit of cost that must not grow with refactors.

    Counted on the simple-mode plan: formatted mode splits the node
    name and its partitioning arguments onto different lines, which a
    single-line pattern silently misses (every count reads 0 and any
    upper-bound assertion passes vacuously)."""
    plan = physical_plan(df, "simple")
    return len(
        re.findall(r"Exchange (?:hash|range)partitioning", plan)
    )


def has_broadcast_hash_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in physical_plan(df)


def has_shuffle_join(df: DataFrame) -> bool:
    plan = physical_plan(df)
    return "SortMergeJoin" in plan or "ShuffledHashJoin" in plan


def codegen_stage_count(df: DataFrame) -> int:
    """WholeStageCodegen spans; hot paths should sit inside one."""
    return len(set(re.findall(r"WholeStageCodegen \((\d+)\)", physical_plan(df, "simple"))))
