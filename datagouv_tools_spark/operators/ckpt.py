"""Round-scoped ``localCheckpoint`` with explicit block release.

Iterative operators (PageRank, label propagation, BFS, k-core peel,
connected components) materialize each round with an eager
``localCheckpoint`` to truncate lineage — but the PREVIOUS round's
checkpoint blocks are then only released when the JVM ContextCleaner
happens to GC the reference, so high iteration counts accumulate
storage memory/disk across rounds.

:class:`RoundCheckpointer` keeps a handle to the previous round's
checkpointed JVM RDD and unpersists it (non-blocking) as soon as the
next round has materialized — at which point no future plan can read
it, because every consumer is derived from the NEW checkpoint. The
final round's blocks are never released (callers return and consume
that frame); callers that fully consume the result can call
:meth:`release` afterwards.

Safety: a ``localCheckpoint``'s blocks are the ONLY copy of its data
(lineage is truncated), so release strictly follows the next round's
eager materialization. The handle is taken straight off the
checkpointed frame's own ``LogicalRDD`` — no persistent-RDD-registry
diffing, so concurrently persisted RDDs (streaming maintainers on
other threads) are never touched.

Measured cost (local[32], sf0.1 textrank, 12 rounds): ~20-30 ms per
round of JVM reflection + unpersist bookkeeping — a deliberate trade
for storage bounded at one round's blocks instead of all R rounds'.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

__all__ = ["RoundCheckpointer"]


class RoundCheckpointer:
    """Callable: ``df -> df.localCheckpoint()`` that unpersists the
    previous round's checkpoint once the new one is materialized."""

    def __init__(self) -> None:
        self._prev = None

    @staticmethod
    def _checkpoint_rdd(df: DataFrame):
        """JVM RDD behind an eagerly checkpointed frame's LogicalRDD;
        None when the plan shape is unexpected (non-classic session) —
        release then degrades to the old GC-when-collected behavior."""
        try:
            plan = df._jdf.queryExecution().analyzed()
            if plan.getClass().getSimpleName() != "LogicalRDD":
                return None
            return plan.rdd()
        except Exception:
            return None

    def __call__(self, df: DataFrame) -> DataFrame:
        out = df.localCheckpoint()  # eager: materializes before return
        prev, self._prev = self._prev, self._checkpoint_rdd(out)
        if prev is not None:
            try:
                prev.unpersist(False)
            except Exception:
                pass
        return out

    def release(self) -> None:
        """Release the LAST round's blocks too — only after the caller
        has fully consumed (collected/written) the final frame."""
        prev, self._prev = self._prev, None
        if prev is not None:
            try:
                prev.unpersist(False)
            except Exception:
                pass
