"""Aggregation operators (SURVEY §2.5 A1-A4).

A1 — the reference's per-tracklet attribute averaging
(DeepMARCaffe2Native.java:169-179 reduces per-sample CNN outputs with
reflection-driven Attributes.add/div, Attributes.java:446-475) — is a
106-column grouped AVG: one hash aggregate with map-side partials,
fully codegen'd, no reflection, no Python.
"""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def wide_avg(df: DataFrame, group_cols: list[str], value_cols: Iterable[str]) -> DataFrame:
    """Grouped mean over many value columns at once (A1).

    ``groupBy(keys).agg(avg(c) for c in cols)`` — Spark plans this as a
    single partial+final hash aggregate regardless of column count, so
    the 106-attribute average costs one shuffle of one row per group.
    """
    return df.groupBy(*group_cols).agg(
        *[F.avg(c).alias(c) for c in value_cols]
    )


def completeness_check(
    df: DataFrame,
    group_col: str,
    expected_col: str,
) -> DataFrame:
    """Groups whose row count reached the expected per-group total (A2).

    The HAR-packing trigger (DataManagingApp.java:320-325) checks
    ``dirCount - 1 == numTracklets`` by listing HDFS directories; here
    it is a grouped count compared to the expected value carried on the
    rows themselves — one aggregate, no filesystem listing.
    """
    return (
        df.groupBy(group_col)
        .agg(
            F.count(F.lit(1)).alias("actual_count"),
            F.max(expected_col).alias("expected_count"),
        )
        .filter(F.col("actual_count") == F.col("expected_count"))
    )
