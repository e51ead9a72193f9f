"""Z-order (Morton) curve helpers for multi-dimensional data layout.

Sorting a table by the bit-interleaved value of two key columns before
writing makes every output file's min/max statistics tight on BOTH
dimensions at once — the standard lakehouse layout trick for 2-D scan
pruning (a predicate on either key, or a rectangle on both, skips most
files; a plain sort on one key only prunes that key).  At 100 TB the
layout op is ``repartitionByRange(z).sortWithinPartitions(z)`` + write:
one range exchange, no driver state.

Everything here is exact int64 bit arithmetic (the classic
parallel-prefix bit spread), so the curve value is reproducible across
engines and the DuckDB twin hash-matches bit for bit.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Parallel-prefix spread masks: insert one 0 between each of the low
#: 31 bits (x | x<<16 ... pattern), so two spread values interleave
#: into one non-negative int64.
_SPREAD_STEPS: list[tuple[int, int]] = [
    (16, 0x0000FFFF0000FFFF),
    (8, 0x00FF00FF00FF00FF),
    (4, 0x0F0F0F0F0F0F0F0F),
    (2, 0x3333333333333333),
    (1, 0x5555555555555555),
]

#: Inputs are masked to 31 bits so the interleaved value stays a
#: positive int64 (2 x 31 interleaved bits = 62 bits).
INPUT_MASK = 0x7FFFFFFF


def _spread(x: Column) -> Column:
    x = x.bitwiseAND(F.lit(INPUT_MASK))
    for shift, mask in _SPREAD_STEPS:
        x = (x.bitwiseOR(F.shiftleft(x, shift))).bitwiseAND(F.lit(mask))
    return x


def morton_interleave(x: Column, y: Column) -> Column:
    """Z-order value of two non-negative integer columns: the bits of
    ``x`` land on even positions, ``y`` on odd.  Inputs are masked to
    31 bits; the result is a non-negative int64."""
    return _spread(x.cast("long")).bitwiseOR(
        F.shiftleft(_spread(y.cast("long")), 1)
    )


def _spread_sql(expr: str) -> str:
    s = f"({expr} & {INPUT_MASK})"
    for shift, mask in _SPREAD_STEPS:
        s = f"(({s} | ({s} << {shift})) & {mask})"
    return s


def morton_interleave_sql(x: str, y: str) -> str:
    """DuckDB twin of :func:`morton_interleave` (same masks, same
    shifts, bit-identical int64 result)."""
    return f"({_spread_sql(x)} | ({_spread_sql(y)} << 1))"
