"""Incremental rollup maintenance: keep a grouped aggregate fresh by
applying change deltas instead of recomputing from 100 TB of base data.

The classic materialized-view maintenance split (Gupta & Mumick's
taxonomy, standard in warehouse engines):

- **Self-maintainable measures** — ``count``, ``sum`` (hence ``avg``):
  the new state is a pure function of (old state, delta). ``apply`` is
  one aggregation over the delta (|delta| rows, map-side combining)
  plus one outer merge join on the group key against the stored rollup
  — the base table is NEVER read. Deletes subtract; keys whose live
  row count reaches zero leave the rollup.
- **Non-self-maintainable measures** — ``min``/``max``: an insert can
  only improve them (mergeable), but a delete that removes the current
  extremum needs a look at surviving base rows. ``dirty_keys`` returns
  exactly the groups where that can happen (a delete value equal to
  the stored extremum); the caller recomputes min/max for those keys
  only, partition-pruned if the base is keyed/bucketed — cost is
  O(affected partitions), not O(base).

``maintain_rollup`` composes the two: delta-merge everything algebraic,
recompute extrema only for dirty keys. The equality contract (delta
maintenance == full recompute over base∪delta) is pinned by
tests/test_incremental.py, including delete-the-minimum,
delete-the-whole-group, and re-insert-after-delete cases.

Delta format: one row per change with ``op_col`` ∈ {insert, delete} —
an update is modeled as delete(old)+insert(new), the standard CDC
decomposition (Debezium "before"/"after" images).

REQUIRED SESSION CONF for the no-base-shuffle scale contract: the
delta-derived join sides here carry no broadcast hint (a backfill-scale
delta must degrade to a shuffle, not OOM), so the runtime broadcast of
a normal CDC batch comes from AQE's SMJ→BHJ conversion — and Spark's
default ``spark.sql.adaptive.nonEmptyPartitionRatioForBroadcastJoin``
(0.2) DEMOTES that conversion exactly for the tiny-delta shape (a
5-row dirty-key set leaves most build-side shuffle partitions empty).
Set it to ``0.0`` (``session.get_spark`` does) or a vanilla session
will sort-merge the dirty-key semi-join and drag the full base through
an exchange; ``tests/test_plans.py`` pins the conversion on the
AQE-final plan.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "aggregate_base",
    "apply_delta",
    "dirty_keys",
    "maintain_join",
    "maintain_rollup",
]


def _keys(key_cols: Sequence[str] | str) -> list[str]:
    return [key_cols] if isinstance(key_cols, str) else list(key_cols)


def aggregate_base(
    base: DataFrame, key_cols: Sequence[str] | str, value_col: str
) -> DataFrame:
    """The rollup shape this module maintains: per-key count, sum
    (exact decimal), min, max of ``value_col``."""
    ks = _keys(key_cols)
    return base.groupBy(*ks).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col(value_col).cast("decimal(28,6)")).alias("total"),
        F.min(value_col).alias("vmin"),
        F.max(value_col).alias("vmax"),
    )


def apply_delta(
    rollup: DataFrame,
    delta: DataFrame,
    key_cols: Sequence[str] | str,
    value_col: str,
    op_col: str = "op",
    delete_op: str = "D",
) -> DataFrame:
    """Merge a change delta into the stored rollup WITHOUT reading the
    base table. count/sum are exact; min/max are exact for pure-insert
    deltas and an upper/lower BOUND for groups with deletes — run
    :func:`dirty_keys` + targeted recompute (or use
    :func:`maintain_rollup`) when exact extrema matter.

    Returns the merged rollup (groups with zero surviving rows dropped).
    """
    ks = _keys(key_cols)
    sign = F.when(F.col(op_col) == delete_op, F.lit(-1)).otherwise(F.lit(1))
    d = delta.groupBy(*ks).agg(
        F.sum(sign).alias("__dn"),
        F.sum(sign * F.col(value_col).cast("decimal(28,6)")).alias("__dtotal"),
        F.min(
            F.when(F.col(op_col) != delete_op, F.col(value_col))
        ).alias("__dmin"),
        F.max(
            F.when(F.col(op_col) != delete_op, F.col(value_col))
        ).alias("__dmax"),
    )
    r = rollup.select(
        *ks,
        F.col("n").alias("__n"),
        F.col("total").alias("__total"),
        F.col("vmin").alias("__vmin"),
        F.col("vmax").alias("__vmax"),
    )
    merged = r.join(d, ks, "full_outer").select(
        *ks,
        (F.coalesce("__n", F.lit(0)) + F.coalesce("__dn", F.lit(0))).alias("n"),
        (
            F.coalesce(F.col("__total"), F.lit(0).cast("decimal(28,6)"))
            + F.coalesce(F.col("__dtotal"), F.lit(0).cast("decimal(28,6)"))
        ).cast("decimal(28,6)").alias("total"),
        F.least("__vmin", "__dmin").alias("vmin"),
        F.greatest("__vmax", "__dmax").alias("vmax"),
    )
    return merged.filter(F.col("n") > 0)


def dirty_keys(
    rollup: DataFrame,
    delta: DataFrame,
    key_cols: Sequence[str] | str,
    value_col: str,
    op_col: str = "op",
    delete_op: str = "D",
) -> DataFrame:
    """Groups whose min/max can no longer be derived from (state,
    delta): a delete matched the group's CANDIDATE extremum — the
    merge of the stored extremum with the delta's own inserts — so the
    second-best value is unknown without looking at surviving base
    rows. Comparing against the stored extremum alone is not enough:
    a delta that inserts 10 into a group whose stored max is 5 and
    then deletes a 10 would otherwise leave the rollup claiming
    max=10 (found by the hypothesis sweep in
    tests/test_incremental.py). Keys-only DataFrame — small enough
    for AQE to broadcast into a partition-pruned base scan."""
    ks = _keys(key_cols)
    ins_ext = (
        delta.filter(F.col(op_col) != delete_op)
        .groupBy(*ks)
        .agg(
            F.min(value_col).alias("__imin"),
            F.max(value_col).alias("__imax"),
        )
    )
    cand = (
        rollup.select(*ks, "vmin", "vmax")
        .join(ins_ext, ks, "full_outer")
        .select(
            *ks,
            F.least("vmin", "__imin").alias("__cmin"),
            F.greatest("vmax", "__imax").alias("__cmax"),
        )
    )
    dels = delta.filter(F.col(op_col) == delete_op).select(
        *ks, F.col(value_col).alias("__dv")
    )
    return (
        dels.join(cand, ks, "inner")
        .filter((F.col("__dv") == F.col("__cmin")) | (F.col("__dv") == F.col("__cmax")))
        .select(*ks)
        .distinct()
    )


def maintain_rollup(
    rollup: DataFrame,
    delta: DataFrame,
    base_after: DataFrame,
    key_cols: Sequence[str] | str,
    value_col: str,
    op_col: str = "op",
    delete_op: str = "D",
) -> DataFrame:
    """Exact incremental maintenance: algebraic delta merge for every
    group + min/max recompute restricted to :func:`dirty_keys`.

    ``base_after`` is the post-delta base table (or a reader for it) —
    it is touched ONLY via a semi-join on the dirty keys, so with a
    key-partitioned/bucketed base the scan prunes to the affected
    partitions. Equality with a full recompute is the tested contract.
    """
    ks = _keys(key_cols)
    merged = apply_delta(rollup, delta, ks, value_col, op_col, delete_op)
    dk = dirty_keys(rollup, delta, ks, value_col, op_col, delete_op)
    # no broadcast hint on the delta-derived sides: a normal CDC batch
    # is tiny and AQE broadcasts it at runtime anyway, while a
    # backfill/mass-erasure delta that outgrows memory degrades to a
    # shuffle join instead of OOMing the way a forced hint would
    fixed = aggregate_base(
        base_after.join(dk, ks, "left_semi"), ks, value_col
    ).select(*ks, F.col("vmin").alias("__fmin"), F.col("vmax").alias("__fmax"))
    return (
        merged.join(fixed, ks, "left_outer")
        .select(
            *ks,
            "n",
            "total",
            F.coalesce("__fmin", "vmin").alias("vmin"),
            F.coalesce("__fmax", "vmax").alias("vmax"),
        )
    )


def maintain_join(
    view: DataFrame,
    a_old: DataFrame,
    b_old: DataFrame,
    da: DataFrame,
    db: DataFrame,
    key_cols: Sequence[str] | str,
    op_col: str = "op",
    delete_op: str = "D",
) -> DataFrame:
    """Incremental maintenance of a materialized equi-join view
    ``V = A ⋈ B`` under two-sided CDC deltas — the join half of the
    Gupta-Mumick delta rules (the rollup half is :func:`maintain_rollup`).

    With signed multiplicities (insert = +1, delete = -1):

        (A+ΔA) ⋈ (B+ΔB) = V  +  ΔA⋈B  +  A⋈ΔB  +  ΔA⋈ΔB

    so the view's net change is three DELTA-SIZED joins — the stored
    view and the base tables are never re-joined. Rows are assumed
    set-semantic as FULL tuples (each base row unique, an update
    arrives as delete(old-image)+insert(new) — the standard Debezium
    decomposition), so each joined row's net sign lands in {-1, 0, +1}:
    negatives become full-row tombstones, positives become appends.
    Tombstones match on every view column — a shorter key would also
    delete innocent siblings that happen to share it (non-null columns
    required, exact-equality types only).

    Scale: ``ΔA⋈B`` / ``A⋈ΔB`` keep the delta on the build side (AQE
    broadcasts a normal-sized CDC batch at runtime; no forced hint, so
    a backfill-scale delta shuffles instead of OOMing), the base scans
    stay partition-prunable on a key-bucketed layout, and the final
    apply is ONE pass over the stored view with a delta-sized
    tombstone set (merge-on-read shape) plus an append —
    no |V| shuffle anywhere. Equality with a from-scratch re-join of
    the post-delta bases is the tested contract.
    """
    ks = _keys(key_cols)
    view_cols = view.columns

    def signed(d: DataFrame, tag: str) -> DataFrame:
        return d.select(
            *[c for c in d.columns if c != op_col],
            F.when(F.col(op_col) == delete_op, F.lit(-1))
            .otherwise(F.lit(1))
            .cast("bigint")
            .alias(tag),
        )

    sa, sb = signed(da, "__sa"), signed(db, "__sb")
    t1 = sa.join(b_old, ks).select(*view_cols, F.col("__sa").alias("__s"))
    t2 = a_old.join(sb, ks).select(*view_cols, F.col("__sb").alias("__s"))
    t3 = sa.join(sb, ks).select(
        *view_cols, (F.col("__sa") * F.col("__sb")).alias("__s")
    )
    net = (
        t1.unionByName(t2)
        .unionByName(t3)
        .groupBy(*view_cols)
        .agg(F.sum("__s").alias("__net"))
    )
    removals = net.filter(F.col("__net") < 0).select(*view_cols)
    additions = net.filter(F.col("__net") > 0).select(*view_cols)
    # tombstones are delta-sized: AQE broadcasts them when small, and
    # an oversized backfill delta shuffles instead of forcing an OOM
    return view.join(removals, view_cols, "left_anti").unionByName(
        additions
    )
