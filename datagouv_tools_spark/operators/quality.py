"""Data-quality expectations over DataFrames — the validation layer a
100 TB ingest runs before publishing a table (deequ/dbt-test-shaped,
re-expressed as pure DataFrame aggregates).

Design: every check COMPILES TO ONE AGGREGATE EXPRESSION, so an entire
suite runs as a single pass over the table (one job, one scan, map-side
partials) — never one action per check. Violations are counted, not
collected; sampling offenders for debugging is a separate bounded
query.

Checks return (check, n_violations) rows; a table passes when every
count is zero.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "Check",
    "not_null",
    "unique",
    "accepted_values",
    "in_range",
    "matches",
    "run_checks",
    "quarantine",
    "referential_violations",
]


@dataclass(frozen=True)
class Check:
    """A named violation counter: ``expr`` is a boolean per-row column
    (True = violation) OR ``agg`` a ready aggregate count column."""

    name: str
    expr: Column | None = None
    agg: Column | None = None

    def as_agg(self) -> Column:
        if self.agg is not None:
            return self.agg.alias(self.name)
        return F.sum(F.when(self.expr, 1).otherwise(0)).cast("bigint").alias(self.name)


def not_null(col: str) -> Check:
    return Check(f"not_null_{col}", expr=F.col(col).isNull())


def accepted_values(col: str, values: Sequence[str]) -> Check:
    return Check(
        f"accepted_values_{col}",
        expr=~F.col(col).isin(*values) | F.col(col).isNull(),
    )


def in_range(col: str, lo, hi) -> Check:
    return Check(
        f"in_range_{col}",
        expr=F.col(col).isNull() | (F.col(col) < lo) | (F.col(col) > hi),
    )


def matches(col: str, pattern: str) -> Check:
    return Check(
        f"matches_{col}",
        expr=F.col(col).isNull() | ~F.col(col).rlike(pattern),
    )


def unique(cols: Sequence[str] | str) -> Check:
    """Duplicate-row count for a candidate key: COUNT(*) − COUNT(DISTINCT key).
    Runs in the same single aggregate as the row-level checks."""
    cols = [cols] if isinstance(cols, str) else list(cols)
    name = "unique_" + "_".join(cols)
    return Check(
        name,
        agg=(F.count(F.lit(1)) - F.countDistinct(*[F.col(c) for c in cols])).cast(
            "bigint"
        ),
    )


def run_checks(df: DataFrame, checks: Sequence[Check]) -> DataFrame:
    """Run the whole suite in ONE aggregation pass; returns long-form
    (check, n_violations) rows, ordered by check name."""
    wide = df.agg(*[c.as_agg() for c in checks])
    stack_args = ", ".join(f"'{c.name}', `{c.name}`" for c in checks)
    return (
        wide.select(
            F.expr(f"stack({len(checks)}, {stack_args}) AS (`check`, n_violations)")
        )
        .orderBy("check")
    )


def referential_violations(
    fact: DataFrame, dim: DataFrame, fact_key: str, dim_key: str
) -> DataFrame:
    """Foreign-key orphans: fact rows whose key has no dim match
    (anti join — dim side broadcast when small). Returns the orphan
    rows; count() it for the violation number."""
    return fact.join(
        dim.select(F.col(dim_key).alias(fact_key)), on=fact_key, how="left_anti"
    )


def quarantine(
    df: DataFrame, checks: Sequence[Check]
) -> tuple[DataFrame, DataFrame]:
    """Split ``df`` into (clean, quarantined) by the suite's ROW-LEVEL
    checks — the publish-or-hold decision a 100 TB ingest makes per
    row, where ``run_checks`` only counts. Quarantined rows carry a
    ``violations`` column (comma-joined check names, deterministic
    order) so a repair job can route by cause; clean rows pass every
    check.

    Aggregate-only checks (``unique``) have no per-row predicate and
    are rejected loudly — deciding WHICH duplicate to quarantine is a
    policy (keep-min-id dedup lives in operators/dedup.py), not a row
    test. One shared plan: the violation flags are computed once, both
    outputs filter the same projection (Spark reuses the scan; no
    second pass over raw data)."""
    row_checks = []
    for c in checks:
        if c.expr is None:
            raise ValueError(
                f"check '{c.name}' is aggregate-only (no per-row "
                "predicate) — quarantine() takes row-level checks; "
                "handle duplicates with operators/dedup.py policies"
            )
        row_checks.append(c)
    flags = F.array_compact(
        F.array(
            *[
                F.when(c.expr, F.lit(c.name)).otherwise(F.lit(None))
                for c in row_checks
            ]
        )
    )
    flagged = df.withColumn(
        "violations", F.array_join(flags, ",")
    )
    clean = flagged.filter(F.col("violations") == "").drop("violations")
    bad = flagged.filter(F.col("violations") != "")
    return clean, bad
