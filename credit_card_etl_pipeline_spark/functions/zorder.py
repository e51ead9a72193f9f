"""Z-order (Morton) clustering keys for multi-dimensional data
skipping.

A table sorted on ONE column skips row groups only for filters on that
column; interleaving the bits of several range-normalized columns
produces a single sort key whose contiguous ranges are axis-aligned
rectangles in key space — so row-group min/max footers become tight on
EVERY participating column at once (the layout behind Delta's
``OPTIMIZE ZORDER BY``).  Normalizing each column to a fixed bucket
domain first is load-bearing: interleaving raw values lets the widest
column's high bits dominate the ordering and the narrow columns
degenerate to full-span row groups.

All arithmetic is integer (truncating-division bucketing, shift/mask
interleave), so the key — and therefore the layout — is deterministic
and reproducible cross-engine.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Bits per dimension: 256 buckets is plenty to steer row-group-sized
#: ranges while keeping the interleave expression small.
ZBITS = 8


def range_bucket(col: Column, vmin: Column, vmax: Column) -> Column:
    """Min-max scale an integer column onto [0, 2^ZBITS): exact
    truncating integer arithmetic, monotone in the input."""
    return (
        ((col - vmin) * (1 << ZBITS)) / (vmax - vmin + 1)
    ).cast("long")


def morton_key(buckets: list[Column], bits: int = ZBITS) -> Column:
    """Interleave the low ``bits`` of each bucket column round-robin
    (dimension d's bit b lands at position b*len + d)."""
    n = len(buckets)
    z: Column = F.lit(0).cast("long")
    for b in range(bits):
        for d, col in enumerate(buckets):
            z = z + F.shiftleft(
                F.shiftright(col, b).bitwiseAND(F.lit(1)), b * n + d
            )
    return z
