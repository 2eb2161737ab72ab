"""Data-layout keys: Z-order (Morton) interleaving for multi-column
scan locality.

The reference stores tracklets under nested HAR paths keyed by
(task, video) only (DataManagingApp.java:235-394) — one-dimensional
locality.  At 100 TB a table is pruned on MORE than one predicate
column (time AND price, camera AND hour), and min/max zone maps only
help if rows that are close in BOTH dimensions land in the same file.
Z-ordering — interleaving the bits of the quantized dimension values —
is the standard fix (Delta/Iceberg ``OPTIMIZE ZORDER BY``): sorting by
the interleaved key gives every file a tight bounding box in every
participating dimension, so any single-column min/max index stays
selective.

Everything here is a plain column EXPRESSION (shift/and/or
arithmetic): it runs inside whole-stage codegen, never a UDF, and the
DuckDB mirror is generated from the identical bit plan so the oracle
is engine-exact.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def zorder_key(cols: list[Column], bits: int = 8) -> Column:
    """Interleave the low ``bits`` bits of each (already-quantized,
    non-negative integer) column into one Morton key.

    PRECONDITION — quantize into ``[0, 2^bits)`` first: only the low
    ``bits`` bits are interleaved, so an unquantized value silently
    ALIASES modulo ``2^bits`` (e.g. raw days-since-epoch ≈ 19 700 under
    the default 8 bits puts rows 256 days apart in the same cell and
    destroys the clustering this key exists to provide). Bucket with
    ``value // step`` against the column's actual range, or
    ``pmod(value, 2^bits)`` only when the column is genuinely cyclic
    (day-of-year, hour-of-day).

    Column i contributes bit b to output position ``b * n + (n-1-i)``
    — i.e. dimension 0 owns the most-significant bit of each group, so
    the sort order is a balanced sweep over all dimensions.  Pure
    shift/mask arithmetic: codegen-friendly, no shuffle, no UDF.
    """
    n = len(cols)
    if n < 1:
        raise ValueError("zorder_key needs at least one column")
    if bits * n > 62:
        raise ValueError("interleaved key must fit in a signed 64-bit long")
    key = F.lit(0).cast("long")
    for i, c in enumerate(cols):
        q = c.cast("long")
        for b in range(bits):
            key = key + F.shiftleft(
                F.shiftright(q, b).bitwiseAND(F.lit(1)), b * n + (n - 1 - i)
            )
    return key


def zorder_key_sql(cols: list[str], bits: int = 8) -> str:
    """DuckDB mirror of :func:`zorder_key` — same bit plan, generated
    from the same loop, so both engines agree term for term."""
    n = len(cols)
    terms = []
    for i, c in enumerate(cols):
        for b in range(bits):
            # outer parens are load-bearing: '+' binds tighter than '<<'
            terms.append(f"(((({c}) >> {b}) & 1) << {b * n + (n - 1 - i)})")
    return "(" + " + ".join(terms) + ")"
