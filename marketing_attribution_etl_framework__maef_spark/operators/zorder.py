"""Z-order (Morton) clustering values for multi-dimensional layout.

Min/max row-group pruning only skips data when each file's value
range is narrow; sorting by ONE column gives that for one dimension
and destroys it for the others. Interleaving the bits of several
columns (the Morton / Z-order curve — what Delta's OPTIMIZE ZORDER
and Iceberg's sort orders implement) gives every participating column
locality at once: a write sorted by the interleaved value produces
files whose per-column min/max ranges all shrink ~by the file-count
root, so predicates on ANY of the columns prune.

Pure integer bit algebra (unrolled shifts, whole-stage codegen; no
UDF). Inputs must already be non-negative integers below 2^bits —
real pipelines first rank/scale each dimension (date -> day number,
id -> bucket); that normalization is use-case-specific and left to
the caller. The locality claim is pinned by a test that reads real
parquet row-group statistics (pyarrow) and checks that z-sorted files
carry strictly tighter per-column ranges than a one-column sort.
"""

from __future__ import annotations

from functools import reduce
from operator import add

from pyspark.sql import Column
from pyspark.sql import functions as F


def zorder_value(cols: list[Column], bits: int = 16) -> Column:
    """Interleave the low ``bits`` bits of each column into one long:
    bit b of column c lands at position b * len(cols) + c."""
    n = len(cols)
    if n < 2:
        raise ValueError("z-ordering needs at least two columns")
    if bits * n > 63:
        raise ValueError(f"{n} cols x {bits} bits exceeds a signed long")
    terms = [
        F.shiftleft(F.shiftright(c.cast("long"), b).bitwiseAND(F.lit(1)), b * n + i)
        for i, c in enumerate(cols)
        for b in range(bits)
    ]
    return reduce(add, terms).cast("long")
