"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query on sf0.001; ``queries()`` /
``oracle_sql()`` expose the full catalog from
las_vpe_platform_spark.queries (one entry per implemented operator
family from SURVEY.md §2 plus the data-pipeline operator set).
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

# make the repo importable no matter where the driver runs from
_REPO = str(Path(__file__).resolve().parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from las_vpe_platform_spark import queries as _catalog  # noqa: E402
from las_vpe_platform_spark.queries_domain import (  # noqa: E402
    d12_similar_persons_in_window,
)

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query; driver checks rows>0 and a stable schema.

    The reference's end-to-end analytic: ranked similar persons (with
    attributes) for every probe in one camera/time bucket — the
    TRACK_ATTRRECOG + getLinkedPedestrians path as one Spark plan
    (SURVEY §7.2 step 3).
    """
    return d12_similar_persons_in_window(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _catalog.queries()


def oracle_sql() -> dict[str, str]:
    return _catalog.oracle_sql()
