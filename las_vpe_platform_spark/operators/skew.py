"""Skew-mitigation join utilities.

AQE's skew-join splitting (enabled in session.py) handles most cases
at runtime; explicit salting remains the tool for pathological hot
keys in shuffle joins whose skewed side is the BUILD side, or when AQE
is unavailable (streaming micro-batches). SURVEY §0's scale notes call
this out as the hot-key plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    how: str = "inner",
    n_salts: int = 16,
) -> DataFrame:
    """Equi-join with the left side salted and the right side replicated.

    Left rows get a deterministic per-row salt in [0, n_salts); right
    rows are exploded once per salt value, so each (key, salt) shard
    joins independently — a hot key's rows spread over ``n_salts``
    tasks instead of one. Result equals ``left.join(right, on, how)``
    for inner/left joins (right replication makes right-side
    multiplicity per shard identical to the unsalted join).
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left joins")
    salted_left = left.withColumn(
        "_salt", F.pmod(F.hash(F.monotonically_increasing_id()), F.lit(n_salts))
    )
    replicated_right = right.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return salted_left.join(replicated_right, on=[on, "_salt"], how=how).drop("_salt")
