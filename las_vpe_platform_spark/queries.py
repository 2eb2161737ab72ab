"""Unified query registry: name -> (spark_callable, oracle_sql | None).

The driver contract (__spark_entry__.py) exposes this as ``queries()``
and ``oracle_sql()``; tests iterate it to verify every entry against
DuckDB locally before the driver does.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from las_vpe_platform_spark.queries_data import DATA_QUERIES
from las_vpe_platform_spark.queries_domain import DOMAIN_QUERIES
from las_vpe_platform_spark.queries_relational import RELATIONAL_QUERIES
from las_vpe_platform_spark.queries_streaming import STREAMING_QUERIES

QueryFn = Callable[[SparkSession, str], DataFrame]

# name -> (callable, oracle_sql or None for rows-only checks)
CATALOG: dict[str, tuple[QueryFn, str | None]] = {}
CATALOG.update(RELATIONAL_QUERIES)
CATALOG.update(DATA_QUERIES)
CATALOG.update(DOMAIN_QUERIES)
CATALOG.update(STREAMING_QUERIES)


def queries() -> dict[str, QueryFn]:
    return {name: fn for name, (fn, _sql) in CATALOG.items()}


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, (_fn, sql) in CATALOG.items() if sql is not None}
