"""Skew mitigation: salted two-phase aggregation and salted joins.

At 100 TB a handful of hot keys (one `event_type`, one mega-customer)
can pin an entire stage on one reducer. Two standard remedies, both
pure DataFrame compositions (Catalyst/AQE handle everything else):

- **Salted aggregation** — append a random salt to the key, partially
  aggregate on (key, salt) spreading the hot key over N reducers, then
  aggregate the N partials. Correct for any algebraic aggregate
  (sum/count/min/max); results are identical to the unsalted groupBy,
  so the whole transform is oracle-checkable.
- **Salted join** — explode the dim side N ways (one copy per salt),
  salt the fact side randomly; the hot fact key then hash-joins
  against N dim copies on N reducers. Only needed when the dim is too
  big to broadcast AND the fact is skewed; AQE's skew-join handles
  sort-merge cases automatically (`spark.sql.adaptive.skewJoin`), so
  reach for this only when AQE can't see the skew (e.g. aggregation
  before the join hides it).

``F.rand(seed)`` is used for salt: per-row uniform, no shuffle of its
own, and the seed keeps runs reproducible for tests.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["salted_agg", "salted_join_inner", "fan_out_narrow_scan"]


def _size_bytes(v: str) -> int:
    """Parse a Spark byte-size conf value ('134217728', '128m', '1g')."""
    s = v.strip().lower()
    mult = 1
    for suffix, m in (
        ("kb", 1 << 10), ("k", 1 << 10),
        ("mb", 1 << 20), ("m", 1 << 20),
        ("gb", 1 << 30), ("g", 1 << 30),
        ("b", 1),
    ):
        if s.endswith(suffix):
            s, mult = s[: -len(suffix)], m
            break
    return int(s) * mult


def fan_out_narrow_scan(df: DataFrame) -> DataFrame:
    """Round-robin repartition a SINGLE-SPLIT local scan to the session
    parallelism before a CPU-heavy map pass; identity otherwise.

    Guide §2.5 "input skew": one small input file = one scan task, so a
    compute-bound per-row kernel downstream (per-gram md5, per-replica
    hashing) serializes on one core while the rest of the cluster
    idles — measured 0.5-1.7 s single-task stages across eight queries
    on this corpus. The probe compares the scan's total input bytes
    (driver-side file metadata, no job) against
    ``spark.sql.files.maxPartitionBytes``: a dataset big enough to span
    several splits fans out on its own, so AT SCALE THIS IS A NO-OP —
    no shuffle is ever added to real inputs, only to the
    single-file/below-one-split case where the shuffle is trivially
    cheap relative to the serialized kernel it unblocks. Non-local or
    unlistable sources conservatively return the input unchanged.

    Keyless round-robin repartition is retry-safe (Spark sorts before
    repartitioning, SPARK-23207) and every downstream operator in this
    engine is partitioning-insensitive (algebraic aggregates,
    deterministic hashes), so results are unchanged.
    """
    import os
    from urllib.parse import urlparse

    spark = df.sparkSession
    try:
        files = df.inputFiles()
    except Exception:
        return df
    if not files:
        return df
    total = 0
    for f in files:
        parsed = urlparse(f)
        if parsed.scheme not in ("", "file"):
            return df
        try:
            total += os.path.getsize(parsed.path)
        except OSError:
            return df
    try:
        max_split = _size_bytes(
            spark.conf.get("spark.sql.files.maxPartitionBytes", "134217728b")
        )
    except ValueError:
        return df
    if total > max_split:
        return df
    return df.repartition(spark.sparkContext.defaultParallelism)

#: aggregate name -> (partial expr factory, final expr factory)
_MERGEABLE = {
    "sum": (F.sum, F.sum),
    "count": (lambda c: F.count(c), F.sum),
    "min": (F.min, F.min),
    "max": (F.max, F.max),
}


def salted_agg(
    df: DataFrame,
    keys: tuple[str, ...],
    aggs: Mapping[str, tuple[str, Column]],
    n_salts: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Two-phase groupBy: partial agg on (keys, salt), final on keys.

    ``aggs``: output name → (agg kind in {sum,count,min,max}, column).
    Result equals ``df.groupBy(keys).agg(...)`` exactly — the salt only
    changes the shuffle distribution, not the algebra.
    """
    salted = df.withColumn("__salt", (F.rand(seed) * n_salts).cast("int"))
    partial = salted.groupBy(*keys, "__salt").agg(
        *[
            _MERGEABLE[kind][0](col).alias(f"__p_{name}")
            for name, (kind, col) in aggs.items()
        ]
    )
    return partial.groupBy(*keys).agg(
        *[
            _MERGEABLE[kind][1](F.col(f"__p_{name}")).alias(name)
            for name, (kind, _) in aggs.items()
        ]
    )


def salted_join_inner(
    fact: DataFrame,
    dim: DataFrame,
    on: str,
    n_salts: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Inner equi-join with the dim side replicated ``n_salts``× so a
    skewed fact key spreads over ``n_salts`` reducers. Row-for-row
    equal to ``fact.join(dim, on)``; costs n_salts× the dim shuffle
    volume — use only when dim can't broadcast and AQE can't see the
    skew."""
    fact_s = fact.withColumn("__salt", (F.rand(seed) * n_salts).cast("int"))
    dim_s = dim.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    return fact_s.join(dim_s, [on, "__salt"]).drop("__salt")
