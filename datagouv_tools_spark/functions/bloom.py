"""Broadcast Bloom-filter pre-filtering for selective joins.

The 100 TB join problem this solves: a semi/inner join whose build side
is selective (say 1% of orders) still shuffles the ENTIRE probe side —
every lineitem row travels to its join partition before any of it can
be discarded. Engines fix this with runtime filters (Spark's own
``spark.sql.optimizer.runtime.bloomFilter`` injects one when statistics
cooperate); this module is the explicit, deterministic version the
engine controls: build an m-bit Bloom filter of the build-side keys
(a tiny distributed aggregation — m/64 bigint words), inline it as an
array literal in the probe-side plan, and drop non-members map-side
BEFORE the shuffle. False positives pass the filter and are removed by
the real join that follows, so results are EXACT for any (m, k) — the
filter only changes how many rows shuffle, never the answer (which is
why the query oracle is simply the plain join).

Everything is md5-derived integer arithmetic (``functions/xhash.py``),
so membership decisions are deterministic and cross-engine: a DuckDB
twin can reproduce the exact surviving row set when a test wants to
pin it.

Sizing: false-positive rate ≈ (1 − e^(−k·n/m))^k. The default m=2^16,
k=4 holds ~4 700 keys at 1% FP — size m to the build side (the filter
travels to every task; 2^16 bits = 8 KiB, 2^23 = 1 MiB — still cheap
against reading a row from 100 TB).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from datagouv_tools_spark.functions.xhash import md5_hash60

__all__ = ["bloom_build", "bloom_contains", "bloom_prefilter_join"]

#: signed-bigint values of 1<<b for b in 0..63 (bit 63 wraps negative);
#: a 64-element lookup replaces shiftleft-by-a-Column, which the
#: DataFrame API does not expose (F.shiftleft takes a literal count)
_BIT_VALUES = [(1 << b) - ((1 << 64) if b == 63 else 0) for b in range(64)]


def _bit_of(pos: Column) -> Column:
    arr = F.array(*[F.lit(v).cast("bigint") for v in _BIT_VALUES])
    return F.element_at(arr, (pos % 64).cast("int") + 1)


def _positions(key: Column, m_bits: int, k: int) -> list[Column]:
    return [
        md5_hash60(F.concat(key.cast("string"), F.lit(f":bf{i}"))) % m_bits
        for i in range(k)
    ]


def bloom_build(
    keys: DataFrame, key_col: str, m_bits: int = 1 << 16, k: int = 4
) -> list[int]:
    """Build the filter as ``m_bits/64`` bigint words with one
    distributed bit_or aggregation (map-side combining; the driver
    receives only the word list)."""
    if m_bits % 64:
        raise ValueError("m_bits must be a multiple of 64")
    pos = F.explode(F.array(*_positions(F.col(key_col), m_bits, k))).alias("p")
    words = (
        keys.select(pos)
        .select(
            F.expr("p DIV 64").alias("w"),
            _bit_of(F.col("p")).alias("b"),
        )
        .groupBy("w")
        .agg(F.bit_or("b").alias("bits"))
        .collect()
    )
    out = [0] * (m_bits // 64)
    for r in words:
        out[int(r["w"])] = int(r["bits"])
    return out


def bloom_contains(
    words: list[int], key: Column, m_bits: int | None = None, k: int = 4
) -> Column:
    """Membership test as pure JVM expressions over the inlined word
    array — evaluates inside whole-stage codegen on the probe side."""
    m = m_bits if m_bits is not None else len(words) * 64
    if len(words) * 64 != m:
        raise ValueError("word list does not match m_bits")
    arr = F.array(*[F.lit(w).cast("bigint") for w in words])
    cond = F.lit(True)
    for p in _positions(key, m, k):
        word = F.element_at(arr, F.floor(p / 64).cast("int") + 1)
        cond = cond & (word.bitwiseAND(_bit_of(p)) != 0)
    return cond


def bloom_prefilter_join(
    probe: DataFrame,
    build: DataFrame,
    probe_key: str,
    build_key: str | None = None,
    how: str = "left_semi",
    m_bits: int = 1 << 16,
    k: int = 4,
) -> DataFrame:
    """Exact join with a Bloom pre-filter on the probe side: non-member
    probe rows die map-side before the shuffle; the real join then
    removes the filter's false positives. ``build`` should already be
    reduced to its selective key set."""
    bk = build_key or probe_key
    words = bloom_build(build.select(bk).distinct(), bk, m_bits, k)
    pre = probe.filter(bloom_contains(words, F.col(probe_key), m_bits, k))
    right = build.select(F.col(bk).alias(probe_key)).distinct()
    return pre.join(right, probe_key, how)
