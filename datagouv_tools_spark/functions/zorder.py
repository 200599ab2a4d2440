"""Z-order (Morton) keys for multi-dimensional data-skipping layout.

Parquet scans prune at two granularities: partition directories and
row-group/file min-max statistics. Sorting a table by ONE column makes
its min-max ranges tight for that column only — a filter on any other
column still reads every file. Interleaving the bits of k columns into
one Morton key and range-partition-sorting by it gives every file a
small HYPER-RECTANGLE of the key space, so min-max pruning works for
EVERY interleaved column at once — the layout trick behind
Delta/Iceberg ``OPTIMIZE ZORDER BY`` (public algorithm: Morton 1966;
same bit-spreading as the classic interleave-by-magic-masks).

Everything here is integer bit arithmetic on JVM-side expressions
(shiftleft/&/| inside whole-stage codegen — no UDFs), and the identical
operators exist in DuckDB, so Morton keys are oracle-checkable
cross-engine (``sql_morton2``).

Scale: ``zorder_write`` is one repartitionByRange shuffle (range
exchange on the key, AQE-coalescible) + a within-partition sort — the
same cost as any sorted write; the payoff is that subsequent selective
scans on ANY keyed dimension skip most files. Re-cluster periodically
as data arrives (the compaction hook ``sinks/sink.py compact_parquet``
is the natural place).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "spread_bits2",
    "morton2",
    "sql_morton2",
    "sql_morton3",
    "zorder_write",
    "spread_bits3",
    "morton3",
]

#: magic masks spreading bits to even positions (dilate-by-2)
_SPREAD_MASKS_2D = [
    (16, 0x0000FFFF0000FFFF),
    (8, 0x00FF00FF00FF00FF),
    (4, 0x0F0F0F0F0F0F0F0F),
    (2, 0x3333333333333333),
    (1, 0x5555555555555555),
]


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def spread_bits2(col: Column | str, bits: int = 21) -> Column:
    """Spread the low ``bits`` (≤21) bits of a non-negative bigint so
    consecutive input bits land two positions apart (positions 0,2,4…)."""
    if not 1 <= bits <= 21:
        raise ValueError("2-D spread supports 1..21 bits per dimension")
    x = _c(col).cast("bigint").bitwiseAND(F.lit((1 << bits) - 1))
    for shift, mask in _SPREAD_MASKS_2D:
        x = (x.bitwiseOR(F.shiftleft(x, shift))).bitwiseAND(F.lit(mask))
    return x


def morton2(colx: Column | str, coly: Column | str, bits: int = 21) -> Column:
    """2-D Morton key: bits of x on even positions, y on odd. Inputs
    must be non-negative; clamp/shift signed or continuous values into
    [0, 2^bits) first (rank or fixed-width binning both work)."""
    return spread_bits2(colx, bits).bitwiseOR(
        F.shiftleft(spread_bits2(coly, bits), 1)
    )


def _sql_spread(expr: str, masks: list[tuple[int, int]], bits: int, tag: str) -> str:
    """Linear-size SQL twin of the mask chain. Each step references the
    previous one ONCE through a named derived-table alias — textual
    substitution of the accumulated string (the r5 shape) doubled the
    expression per step (2^5 = 32 copies of the input), making higher
    bit counts and the 3-D twin impractical. The chain nests inside a
    correlated scalar subquery, so the result is still a plain SQL
    EXPRESSION embeddable anywhere a column is (DuckDB decorrelates
    it; ``tag`` keeps sibling spreads' aliases distinct).

    Intermediates are HUGEINT: Spark's shiftleft silently wraps at 64
    bits (Java semantics) while DuckDB RAISES on BIGINT shift overflow
    — the 3-D chain's ``<< 32`` hits that. Shifting in 128-bit keeps
    the would-wrap bits, and the step mask (< 2^63) discards exactly
    the bits wrapping would have lost, so the engines still agree
    bit-for-bit; the final cast returns to BIGINT."""
    inner = f"(SELECT (({expr}) & {(1 << bits) - 1})::HUGEINT AS __{tag}0)"
    for i, (shift, mask) in enumerate(masks):
        prev, cur = f"__{tag}{i}", f"__{tag}{i + 1}"
        inner = (
            f"(SELECT (({prev} | ({prev} << {shift})) & {mask}) AS {cur} "
            f"FROM {inner} AS __q{tag}{i})"
        )
    return (
        f"(SELECT (__{tag}{len(masks)})::BIGINT "
        f"FROM {inner} AS __q{tag}{len(masks)})"
    )


def _sql_spread2(expr: str, bits: int = 21, tag: str = "sx") -> str:
    return _sql_spread(expr, _SPREAD_MASKS_2D, bits, tag)


def sql_morton2(expr_x: str, expr_y: str, bits: int = 21) -> str:
    """DuckDB twin of :func:`morton2` (same masks, same operators)."""
    return (
        f"({_sql_spread2(expr_x, bits, 'sx')} | "
        f"({_sql_spread2(expr_y, bits, 'sy')} << 1))"
    )


def sql_morton3(expr_x: str, expr_y: str, expr_z: str, bits: int = 21) -> str:
    """DuckDB twin of :func:`morton3` — practical now that the spread
    is linear-size (the quadratic textual form made 3-D prohibitive)."""
    return (
        f"({_sql_spread(expr_x, _SPREAD_MASKS_3D, bits, 'tx')} | "
        f"({_sql_spread(expr_y, _SPREAD_MASKS_3D, bits, 'ty')} << 1) | "
        f"({_sql_spread(expr_z, _SPREAD_MASKS_3D, bits, 'tz')} << 2))"
    )


def zorder_write(
    df: DataFrame,
    path: str,
    cols: tuple[str, ...],
    *,
    bits: int = 21,
    num_files: int = 8,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as parquet clustered by the Morton key of two or
    three integer columns: range-partition on the key (each output file
    owns a contiguous key range = a small hyper-rectangle of the
    clustered space), sort within partitions (tight row-group stats),
    drop the key from the stored schema. Readers need no cooperation —
    plain parquet min-max pruning on any clustered column now skips
    non-matching files."""
    if len(cols) == 2:
        key = morton2(cols[0], cols[1], bits)
    elif len(cols) == 3:
        key = morton3(cols[0], cols[1], cols[2], bits)
    else:
        raise ValueError("zorder_write clusters 2 or 3 columns")
    keyed = df.withColumn("__zkey", key)
    (
        keyed.repartitionByRange(num_files, "__zkey")
        .sortWithinPartitions("__zkey")
        .drop("__zkey")
        .write.mode(mode)
        .parquet(path)
    )


#: magic masks spreading bits to every third position (dilate-by-3)
_SPREAD_MASKS_3D = [
    (32, 0x1F00000000FFFF),
    (16, 0x1F0000FF0000FF),
    (8, 0x100F00F00F00F00F),
    (4, 0x10C30C30C30C30C3),
    (2, 0x1249249249249249),
]


def spread_bits3(col: Column | str, bits: int = 21) -> Column:
    """Spread the low ``bits`` (≤21) bits so consecutive input bits land
    three positions apart (positions 0,3,6… — the 3-D interleave)."""
    if not 1 <= bits <= 21:
        raise ValueError("3-D spread supports 1..21 bits per dimension")
    x = _c(col).cast("bigint").bitwiseAND(F.lit((1 << bits) - 1))
    for shift, mask in _SPREAD_MASKS_3D:
        x = (x.bitwiseOR(F.shiftleft(x, shift))).bitwiseAND(F.lit(mask))
    return x


def morton3(
    colx: Column | str, coly: Column | str, colz: Column | str, bits: int = 21
) -> Column:
    """3-D Morton key: x on positions ≡0 (mod 3), y ≡1, z ≡2 — three
    filter dimensions sharing one clustering key (the practical ceiling:
    per-dimension selectivity decays as the root of the dimension count,
    so beyond 3-4 columns min-max pruning stops paying)."""
    return (
        spread_bits3(colx, bits)
        .bitwiseOR(F.shiftleft(spread_bits3(coly, bits), 1))
        .bitwiseOR(F.shiftleft(spread_bits3(colz, bits), 2))
    )
