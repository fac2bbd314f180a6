"""Data-layout functions: space-filling-curve clustering keys.

At 100 TB the dominant cost is what you DON'T read: sorting/
partitioning a table by a Z-ORDER (Morton) key clusters rows that are
close in SEVERAL dimensions into the same parquet row groups, so
min/max pruning works for predicates on ANY prefix-queried dimension
— the technique behind Delta/Iceberg ``OPTIMIZE ZORDER BY``. Spark
has no built-in z-value expression; this one is pure Column
arithmetic (shifts as multiplies, both-engine-safe below bit 62), so
the key — and any clustering statistics computed from it — is
reproducible in ANSI SQL and under oracle check (q93).

Usage for layout:  ``df.repartitionByRange(N, zorder_key(...))
.sortWithinPartitions(zorder_key(...)).write.parquet(...)`` — range
partitioning on the z-value gives each output file a tight z-range,
which is a tight hyper-rectangle in the original dimensions.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def zorder_key(cols: list[Column], bits: int = 20) -> Column:
    """Morton-interleave the low ``bits`` of each column (after
    clamping to [0, 2^bits)) into one long. With k columns the key
    uses k·bits ≤ 62 bits (guarded) — bit i of column j lands at
    position i·k + j, so sorting by the key alternates dimensions at
    every scale: the prefix property that makes z-ranges
    hyper-rectangles.

    Columns must be non-negative integers (map timestamps/doubles to
    rank or epoch first — standard z-order practice). Built entirely
    from %, floor-div and multiply-by-2^n: no native shift needed, so
    the same expression evaluates identically in any SQL engine.
    """
    k = len(cols)
    if k * bits > 62:
        raise ValueError(f"{k} cols x {bits} bits exceeds the 62-bit "
                         "sign-safe budget; lower bits")
    out = F.lit(0).cast("long")
    cap = F.lit(1 << bits).cast("long")
    for j, c in enumerate(cols):
        v = F.least(F.greatest(c.cast("long"), F.lit(0)), cap - 1)
        for i in range(bits):
            bit = (v / F.lit(1 << i).cast("long")).cast("long") % 2
            out = out + bit * F.lit(1 << (i * k + j)).cast("long")
    return out


def zorder_key_sql(col_exprs: list[str], bits: int = 20) -> str:
    """Generated ANSI-SQL twin of ``zorder_key`` (same clamp, same
    place values) for oracle checks and non-Spark consumers."""
    k = len(col_exprs)
    if k * bits > 62:
        raise ValueError("bit budget exceeded")
    terms = []
    for j, e in enumerate(col_exprs):
        v = (f"LEAST(GREATEST(CAST({e} AS BIGINT), 0), "
             f"{(1 << bits) - 1})")
        for i in range(bits):
            terms.append(f"(({v} // {1 << i}) % 2) * {1 << (i * k + j)}")
    return "(" + " + ".join(terms) + ")"
