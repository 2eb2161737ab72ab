"""Aggregation operators (SURVEY §2.5 A1-A4).

A1 — the reference's per-tracklet attribute averaging
(DeepMARCaffe2Native.java:169-179 reduces per-sample CNN outputs with
reflection-driven Attributes.add/div, Attributes.java:446-475) — is a
125-column grouped AVG: one hash aggregate with map-side partials,
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
    the 125-attribute average costs one shuffle of one row per group.
    One parsed ``F.expr`` per column instead of avg().alias() trees
    keeps driver-side py4j chatter ~3x lower on wide schemas.
    """
    return df.groupBy(*group_cols).agg(
        *[F.expr(f"avg({c}) AS {c}") for c in value_cols]
    )


def wide_avg_pandas(
    df: DataFrame, group_cols: list[str], value_cols: Iterable[str]
) -> DataFrame:
    """A1 as a grouped-map UDAF (applyInPandas) — the §2.10 surface for
    aggregations that genuinely need Python (learned pooling, trimmed
    means). The built-in ``wide_avg`` is the fast path; this is the
    extension shape, parity-tested against it.
    """
    value_cols = list(value_cols)
    out_schema = ", ".join(
        [f"{c} string" for c in group_cols] + [f"{c} double" for c in value_cols]
    )

    def agg(pdf):
        import pandas as pd

        out = {c: [pdf[c].iloc[0]] for c in group_cols}
        for c in value_cols:
            out[c] = [pdf[c].mean()]
        return pd.DataFrame(out)

    return df.groupBy(*group_cols).applyInPandas(agg, out_schema)


def approx_distinct_profile(
    df: DataFrame, group_cols: list[str], key_col: str, rsd: float = 0.05
) -> DataFrame:
    """Sketch-based distinct counting (HyperLogLog++), the scale path
    for completeness-style counters (SURVEY §7.2 step 6): one pass, a
    few KB of state per group, mergeable across partitions."""
    return df.groupBy(*group_cols).agg(
        F.approx_count_distinct(key_col, rsd).alias("approx_distinct"),
        F.count(key_col).alias("n_rows"),
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
