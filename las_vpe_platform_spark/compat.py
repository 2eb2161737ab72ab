"""Engine-portable helpers for oracle-exact comparison.

``round()`` is NOT portable across engines: Spark rounds via exact
BigDecimal expansion of the double, DuckDB scales in floating point —
they disagree whenever a value sits on a decimal .5 boundary (which is
systematic when inputs carry fixed decimal precision). ``pround``
computes floor(x * 10^n + 0.5) / 10^n in pure IEEE double ops, which
every engine evaluates bit-identically; ``sql_round`` emits the same
expression as SQL for the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def pround(c: Column | str, n: int) -> Column:
    """Portable round-half-up: floor(x * 10^n + 0.5) / 10^n."""
    col = F.col(c) if isinstance(c, str) else c
    factor = float(10**n)
    return F.floor(col.cast("double") * factor + F.lit(0.5)) / factor


def sql_round(expr: str, n: int) -> str:
    """The DuckDB-side mirror of :func:`pround`."""
    factor = float(10**n)
    return f"floor(({expr}) * {factor} + 0.5) / {factor}"


def pround_expr(expr: str, n: int) -> str:
    """:func:`pround` as a Spark SQL string for ``selectExpr``.

    Wide (100+ col) projections should be built with ONE selectExpr
    call — per-column Column trees cost ~6 py4j round trips each
    (~2 s of driver time at 125 columns, measured). The ``D`` suffixes
    keep the literals DOUBLE; bare ``1000000.0`` parses as DECIMAL in
    Spark SQL and would flip the output type.
    """
    factor = float(10**n)
    return f"floor(CAST({expr} AS DOUBLE) * {factor}D + 0.5D) / {factor}D"
