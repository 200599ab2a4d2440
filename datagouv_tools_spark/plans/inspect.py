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


# --- broadcast-hint grain audit -------------------------------------
#
# TPC-H's customer/supplier/part tables LOOK dimensional but scale
# linearly with SF (~2 TB of customer at 100 TB): an explicit
# ``F.broadcast`` hint on them bypasses AQE's runtime size check and
# turns into a guaranteed driver/executor OOM at cluster scale, while
# the same query with no hint still broadcasts when the side is
# genuinely small. These helpers classify every broadcast hint in a
# query's ANALYZED logical plan by the grain of what it pins.

_SCALING_PREFIX = {
    "l_": "lineitem",
    "o_": "orders",
    "c_": "customer",
    "s_": "supplier",
    "p_": "part",
    "ps_": "partsupp",
    "event_": "events",
    "doc_": "documents",
    "vec_": "embeddings",
}
# key-grain columns: grouping BY one of these keeps entity grain (the
# aggregate output still scales with SF); a literal filter ON one of
# these pins cardinality to a constant (doc_id < 40, vec_id IN (...)).
_KEY_COL = (
    r"\b(?:doc_id|vec_id|event_id|user_id|session_id|media_id"
    r"|[a-z]{1,2}_(?:cust|supp|part|order|nation|region)key)"
)
_BOUNDING_FILTER = re.compile(
    # literal on the right, possibly wrapped: `< 40`, `< cast(10 as
    # bigint)`, `IN (1,2,3)`, `IN (cast(7 as bigint), ...)`
    _KEY_COL + r"#\d+L?\)?\s*(?:<|<=|=|IN)\s*\(?\s*(?:cast\(\s*)?-?\d"
)
_GROUP_KEY = re.compile(_KEY_COL + r"#\d+")
# top-k bound: a Filter pinning a window-rank column to a literal
# (rk <= 5, __prk <= 8). Name-based — the repo's rank columns all
# carry rk/rank/rn; per-ENTITY top-k would be a false negative, but
# every broadcast top-k here ranks within a literal-pinned query set.
_RANK_FILTER = re.compile(
    r"\b\w*(?:rk|rank|rn)\w*#\d+L?\s*(?:<=|<|=)\s*(?:cast\(\s*)?\d"
)


def _jchildren(node):
    ch = node.children()
    return [ch.apply(i) for i in range(ch.length())]


def scaling_broadcast_tables(df: DataFrame) -> list[str]:
    """Names of SF-scaling base tables pinned under a broadcast hint.

    Walks each BROADCAST ``ResolvedHint`` subtree in the analyzed
    logical plan (merge/shuffle_hash hints are the OOM-safe
    alternatives and are never flagged); a branch is *bounded* (stops
    the walk) at a Limit, at an Aggregate whose grouping keys carry no
    entity-key column (scalar totals, day/month/type domains), or at a
    conjunction-only Filter that pins an entity key or a window-rank
    column to literals (probe sets, top-k eval truth sets — a filter
    containing OR never bounds, since one disjunct can admit the whole
    table, and a filter containing NOT never bounds, since the inner
    comparison of `key != 5` / `~(key < 10)` would otherwise match
    _BOUNDING_FILTER while admitting essentially the whole table; an
    always-bounding OR/NOT shows up as a flagged-for-review false
    positive, the safe direction for a must-be-zero gate).
    Anything else recurses, and reaching a scan of an SF-scaling table
    (classified by its first output column prefix) flags that table.
    Empty list = every broadcast hint in the plan is
    constant-cardinality. Heuristic, reviewer-aid grade: used by
    tools/planaudit.py (`broadcast_scaling`) and pinned at zero across
    the whole query surface by tests."""
    found: list[str] = []
    root = df._jdf.queryExecution().analyzed()
    stack = [root]
    hints = []
    while stack:
        n = stack.pop()
        if n.nodeName() == "ResolvedHint":
            try:
                strategy = n.hints().toString()
            except Exception:
                strategy = "broadcast"  # be conservative: audit it
            if "broadcast" in strategy.lower():
                hints.append(n)
        stack.extend(_jchildren(n))
    for hint in hints:
        stack = _jchildren(hint)
        while stack:
            n = stack.pop()
            name = n.nodeName()
            if name in ("GlobalLimit", "LocalLimit", "LocalRelation"):
                continue
            if name == "Aggregate":
                gs = n.groupingExpressions()
                keys = " ".join(
                    gs.apply(i).toString() for i in range(gs.length())
                )
                if not _GROUP_KEY.search(keys):
                    continue  # bounded-domain aggregate
            elif name == "Filter":
                cond = n.condition().toString()
                if " OR " not in cond and "NOT " not in cond and (
                    _BOUNDING_FILTER.search(cond)
                    or _RANK_FILTER.search(cond)
                ):
                    continue  # entity key or window rank pinned
            elif name in ("LogicalRelation", "Relation"):
                first = n.output().apply(0).name()
                for prefix, table in _SCALING_PREFIX.items():
                    if first.startswith(prefix):
                        found.append(table)
                        break
                continue
            stack.extend(_jchildren(n))
    return sorted(set(found))
