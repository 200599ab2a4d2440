"""The engine's declared query surface (SURVEY.md §2.6 + analytics ops).

Each query is a named callable ``(spark, sf_dir) -> DataFrame`` written
with the DataFrame API (so Catalyst plans it), paired with an ANSI-SQL
oracle string that DuckDB runs on the same parquet tables. The driver
hash-compares both at sf=0.01.

Determinism conventions (the whole file follows these):

- **Float aggregates go through exact decimal arithmetic** on BOTH sides
  (`CAST(x AS DECIMAL(18,4))`, multiply/sum in decimal, `ROUND(.., k)`,
  then cast to double). Summing doubles is order-dependent across Spark
  partitions vs DuckDB's scan order; decimal sums are exact, so both
  engines produce bit-identical doubles after the final cast.
- Every computed column is aliased identically in the DataFrame code and
  the SQL.
- Every ranking/limit has a total tie-break key, so top-k sets are unique.
- Rounded similarity scores are ranked AFTER rounding, with an id
  tie-break, so ULP-level differences cannot reorder results.

Scale notes are attached per query: which side is broadcast, where the
shuffles are, and why the plan survives 100 TB.
"""

from __future__ import annotations

from ._registry import DEC, ORACLE, QUERIES, QueryFn, dec, dround, query, t

from . import _common  # noqa: F401  (shared helpers)
from . import tpch, core, events, docs, embeddings, multimodal, streaming  # noqa: F401  (registration)

# The pre-split flat module exposed every query function and helper as
# a module attribute (tests and tools import a handful directly, e.g.
# queries._SQL_FP, queries.hybrid_dedup_clusters). Preserve that
# surface: hoist each thematic module's public-and-single-underscore
# names, which are unique by construction (they lived in one flat
# module).
_hoist_origin: dict[str, str] = {}
for _m in (_common, tpch, core, events, docs, embeddings, multimodal, streaming):
    for _k, _v in vars(_m).items():
        if _k.startswith("__"):
            continue
        # Cross-module imports (F, SparkSession, the helpers every
        # thematic module pulls from _common) legitimately recur and
        # refer to the SAME object; a same-name DIFFERENT object means
        # two modules defined conflicting public symbols — that would
        # silently shadow at the package level (ADVICE r10), so fail
        # loudly instead.
        if _k in _hoist_origin:
            if globals()[_k] is not _v:
                raise ImportError(
                    f"queries package hoist collision: {_k!r} defined "
                    f"with different values in {_hoist_origin[_k]} and "
                    f"{_m.__name__}"
                )
            continue
        if _k not in globals():
            globals()[_k] = _v
            _hoist_origin[_k] = _m.__name__
del _m, _k, _v
