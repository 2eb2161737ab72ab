"""As-of (point-in-time) join — a time-series operator Spark lacks.

The reference's closest analog is the bufDuration-windowed late-data
join (SURVEY §2.4 J4/J5: "an as-of-style tolerance join in time");
this is the general form: for every left row, the single most recent
right row at-or-before its timestamp (optionally within a tolerance,
per matching key).

Spark-first formulation — union + window, NOT a range cross join:
tag both sides, union them, sort per key by (ts, side), and carry the
latest right values forward with ``last(ignorenulls=True)``. One
shuffle on the key, one in-partition sort; no quadratic candidate
generation, no per-group pandas. This is the scale plan for 100 TB
time-series: cost == sort-merge of the two inputs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: list[str],
    tolerance_seconds: float | None = None,
    right_value_cols: list[str] | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """For each left row: values of the latest right row with
    ``right.on <= left.on`` and equal ``by`` keys.

    ``tolerance_seconds`` nulls out matches older than the tolerance
    (exactly the reference's 600 s bufDuration contract, J4/J5).
    Output = all left columns + ``<col><suffix>`` for each right value
    column + ``<on><suffix>`` (the matched right timestamp, nullable).
    """
    if right_value_cols is None:
        right_value_cols = [c for c in right.columns if c not in (*by, on)]

    lhs = left.withColumn("_side", F.lit(1))
    # the whole right row travels as ONE struct so a single
    # last(ignorenulls=True) carries ts + every value column atomically
    # — per-column carries could mix values from different right rows
    # whenever the most recent right row holds a NULL in one column
    rhs = right.select(
        *by,
        F.col(on),
        F.struct(
            F.col(on).alias("_asof_ts"),
            *[F.col(c).alias(c) for c in right_value_cols],
        ).alias("_rv"),
    ).withColumn("_side", F.lit(0))

    unioned = lhs.unionByName(rhs, allowMissingColumns=True)
    # right rows sort before left rows at the same timestamp, so an
    # exact-timestamp right match IS visible to the left row (<=, not <)
    w = (
        W.partitionBy(*by)
        .orderBy(F.col(on).asc(), F.col("_side").asc())
        .rowsBetween(W.unboundedPreceding, 0)
    )
    carr = F.last("_rv", ignorenulls=True).over(w)
    matched = unioned.select(
        "*",
        *[carr.getField(c).alias(f"_carr_{c}") for c in right_value_cols],
        carr.getField("_asof_ts").alias("_carr_ts"),
    ).filter(F.col("_side") == 1)

    if tolerance_seconds is not None:
        in_range = (
            F.unix_micros(F.col(on).cast("timestamp"))
            - F.unix_micros(F.col("_carr_ts").cast("timestamp"))
        ) <= int(tolerance_seconds * 1_000_000)
    else:
        in_range = F.lit(True)

    return matched.select(
        *left.columns,
        *[
            F.when(in_range, F.col(f"_carr_{c}")).alias(f"{c}{suffix}")
            for c in right_value_cols
        ],
        F.when(in_range, F.col("_carr_ts")).alias(f"{on}{suffix}"),
    )
