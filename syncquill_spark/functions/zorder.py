"""Z-order (Morton) clustering keys for multi-dimensional file layout.

Sorting a table by the bit-interleaved key of several columns places
rows that are close in ANY of those dimensions into nearby file
ranges, so min/max zone maps prune scans for predicates on any
participating column — the idea behind Delta/Iceberg OPTIMIZE ZORDER,
here as a plain expression usable with repartitionByRange +
sortWithinPartitions before a parquet write.

Pure bit arithmetic on JVM-side expressions (codegen, no UDF), and the
same arithmetic is expressible in any SQL engine — so the key is
oracle-checkable bit-for-bit.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column
from pyspark.sql import functions as F


def zorder_key(cols: list[Column | str], bits: int = 16) -> Column:
    """Interleave the low ``bits`` bits of each column into one long.

    Inputs must be non-negative integers below 2**bits — bucketize or
    rank unbounded/skewed domains first (e.g. ``col % 1024`` or an
    ``ntile``); out-of-range bits are masked off, never an error.
    ``len(cols) * bits`` must fit in a signed 64-bit key.
    """
    d = len(cols)
    # explicit raises, not asserts: stripped under -O, and bits=0
    # previously fell through to reduce() over zero terms — a bare
    # TypeError instead of a named refusal (r15 battery)
    if d < 1:
        raise ValueError("zorder_key needs at least one column")
    if bits < 1:
        raise ValueError(f"bits must be positive, got {bits}")
    if d * bits > 63:
        raise ValueError(
            f"interleaved key must fit in 63 bits: {d} cols x {bits} bits"
        )
    terms = []
    for j, c in enumerate(cols):
        col = (F.col(c) if isinstance(c, str) else c).cast("long")
        for i in range(bits):
            bit = F.shiftright(col, i).bitwiseAND(F.lit(1))
            terms.append(F.shiftleft(bit, i * d + j))
    return reduce(lambda a, b: a + b, terms).cast("long")


def zorder_key_sql(exprs: list[str], bits: int = 16) -> str:
    """The identical key as engine-portable SQL (oracle twin) — with
    the identical refusals (ADVICE r15: bits=0 emitted the invalid SQL
    '()' and an over-wide key silently diverged from the Python form's
    raise)."""
    d = len(exprs)
    if d < 1:
        raise ValueError("zorder_key_sql needs at least one expression")
    if bits < 1:
        raise ValueError(f"bits must be positive, got {bits}")
    if d * bits > 63:
        raise ValueError(
            f"interleaved key must fit in 63 bits: {d} exprs x {bits} bits"
        )
    terms = [
        f"(((CAST({e} AS BIGINT) >> {i}) & 1) << {i * d + j})"
        for j, e in enumerate(exprs)
        for i in range(bits)
    ]
    return "(" + " + ".join(terms) + ")"
