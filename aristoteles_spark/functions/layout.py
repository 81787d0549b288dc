"""Multi-dimensional data-layout expressions (Z-order / Morton).

Z-ordering is the lakehouse answer to "my queries filter on TWO
columns": interleave the bits of both dimensions into one key, cluster
storage by its high bits, and any rectangular query box touches only
the handful of coarse cells that intersect it — min/max pruning works
on both dimensions at once instead of only the sort-leading one.

``morton16`` builds the 16-bit interleave as a pure Catalyst bit
expression (shift/and/or — whole-stage codegen, no UDF); ``zcell``
takes its high bits as the storage-cell key; ``cells_for_box``
enumerates the cell ids intersecting a query box (driver-side, O(cells
in box) — the z-index range decomposition a reader pushes into
partition pruning).

The reference has no layout concern (one SQLite file per station,
aristoteles/aristoteles.py:229); this serves the engine's 100 TB
layout surface (SURVEY.md §7.4).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

BITS = 8  # per dimension -> 16-bit z
CELL_SHIFT = 8  # zcell = z >> 8: 16x16 coarse blocks, 256-cell space


def morton16(x: Column, y: Column) -> Column:
    """Interleave two 8-bit non-negative ints into a 16-bit Morton key:
    bit i of x lands at 2i, bit i of y at 2i+1. Pure bit expressions —
    codegen'd, no UDF."""
    z = None
    for i in range(BITS):
        xb = F.shiftleft(F.shiftright(x, i).bitwiseAND(F.lit(1)), 2 * i)
        yb = F.shiftleft(
            F.shiftright(y, i).bitwiseAND(F.lit(1)), 2 * i + 1
        )
        term = xb.bitwiseOR(yb)
        z = term if z is None else z.bitwiseOR(term)
    return z


def zcell(x: Column, y: Column, shift: int = CELL_SHIFT) -> Column:
    """Coarse Z-cell id: the top bits of the Morton key (the storage
    clustering / partition key)."""
    return F.shiftright(morton16(x, y), shift)


def morton16_py(x: int, y: int) -> int:
    """Python reference of morton16 (cell enumeration + tests)."""
    z = 0
    for i in range(BITS):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


def cells_for_box(
    x_lo: int, x_hi: int, y_lo: int, y_hi: int, shift: int = CELL_SHIFT
) -> list[int]:
    """Z-cell ids intersecting the inclusive box [x_lo,x_hi]×[y_lo,y_hi].

    With zcell = z >> 8, each cell covers a 16×16 block whose
    coordinates are the high 4 bits of each dimension, so the
    enumeration is the Morton interleave of the coarse coordinate
    ranges — O(cells touched), computed driver-side and pushed into
    the reader as a partition-key IN filter."""
    half = shift // 2  # bits dropped per dimension
    out = []
    for xh in range(x_lo >> half, (x_hi >> half) + 1):
        for yh in range(y_lo >> half, (y_hi >> half) + 1):
            out.append(morton16_py(xh, yh))
    return sorted(out)
