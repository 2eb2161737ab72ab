"""Sampling operators (SURVEY §2.3 P9, §2.6 W4).

``Tracklet.sample(n)`` (alg/pedestrian/tracking/Tracklet.java:148-172)
keeps n evenly-spaced bounding boxes of a tracklet and nulls the rest;
modes: -1 keep-all, 0 drop-all, n even-spaced. Re-expressed as
higher-order array functions (JVM-side) plus a row-level variant for
exploded layouts.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W


def sample_array_even(arr: Column | str, n: int) -> Column:
    """Evenly-spaced n-element subsample of an array (order kept).

    Interval arithmetic mirrors Tracklet.java:158-170: with L elements
    keep indices i*ceil(L/n) for i in 0..n-1 (clamped). n=-1 keeps all,
    n=0 yields an empty array.
    """
    c = F.col(arr) if isinstance(arr, str) else arr
    if n < 0:
        return c
    if n == 0:
        return F.slice(c, 1, 0)
    length = F.size(c)
    step = F.ceil(length.cast("double") / F.lit(n)).cast("int")
    idx = F.sequence(F.lit(0), F.lit(n - 1))
    positions = F.array_distinct(
        F.transform(idx, lambda i: F.least(i * step + 1, length))
    )
    return F.when(length > 0, F.transform(positions, lambda p: F.element_at(c, p))).otherwise(
        F.slice(c, 1, 0)
    )


def even_spaced_sample(
    df: DataFrame,
    group_cols: list[str],
    order_cols: str | list[str],
    every_k: int,
) -> DataFrame:
    """Row-level even sampling: keep every k-th row per group by order.

    The exploded-layout analog of ``Tracklet.sample`` for when the
    location sequence is one row per bounding box. One shuffle on the
    group key; rank arithmetic stays in the window operator.
    ``order_cols`` must be a deterministic total order within each
    group (add tiebreak columns if the primary sort key repeats).
    """
    if isinstance(order_cols, str):
        order_cols = [order_cols]
    w = W.partitionBy(*group_cols).orderBy(*[F.col(c) for c in order_cols])
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter((F.col("_rn") - 1) % every_k == 0)
        .drop("_rn")
    )
