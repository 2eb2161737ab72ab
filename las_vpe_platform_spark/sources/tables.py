"""Batch parquet sources (SURVEY §2.1 S3/S4/S6/S7 analogs).

The driver's ``events`` table is written with TIMESTAMP(NANOS), which
Spark's vectorized parquet reader rejects; with
``spark.sql.legacy.parquet.nanosAsLong=true`` it arrives as a long,
which we floor-divide to microseconds — exactly DuckDB's behavior when
it truncates nanos to its micro-precision TIMESTAMP, so oracle
comparisons stay bit-identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        # runtime-settable SQL conf — the driver's session may not have
        # it; required to scan TIMESTAMP(NANOS) parquet at all
        try:
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        except Exception:
            pass
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and isinstance(df.schema["ts"].dataType, T.LongType):
        # nanos-long -> TIMESTAMP_NTZ via pure wall-clock arithmetic.
        # NTZ (not timestamp_micros -> LTZ) so downstream date_trunc /
        # string casts are session-timezone independent — DuckDB's
        # TIMESTAMP is naive, and the driver's session TZ is unknown.
        # days+secs split keeps the secs Decimal(18,6) conversion exact.
        ntz = F.lit("1970-01-01 00:00:00").cast("timestamp_ntz") + F.make_interval(
            days=F.expr("(ts div 1000) div 86400000000").cast("int"),
            secs=F.expr("(ts div 1000) % 86400000000").cast("double") / F.lit(1e6),
        )
        df = df.withColumn("ts", ntz)
    return df
