"""Streaming query catalog entries.

Each entry drives a REAL Structured Streaming query (file source ->
watermarked computation -> memory sink, run to completion) and returns
the final table, which is hash-comparable against a batch DuckDB
oracle. This is the engine's T1/T2 parity evidence: the streaming plan
computes the same answer as the batch plan.
"""

from __future__ import annotations

import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from las_vpe_platform_spark.sources.tables import load_table
from las_vpe_platform_spark.streaming.engine import (
    file_stream,
    run_to_completion,
    windowed_counts,
)

# Watermarks require an absolute (LTZ) event-time column, so the
# streaming path keeps epoch micros end-to-end: source carries the raw
# long, the stream converts to TIMESTAMP, and outputs are epoch ints —
# absolute quantities, independent of the session timezone.
RAW_EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts_micros", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def s01_stream_windowed_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5-minute tumbling-window event counts, computed by a streaming
    query (complete mode) over a re-landed copy of the events table.

    Output uses epoch seconds for the window start so the comparison is
    session-timezone independent.
    """
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:
        pass
    raw = spark.read.parquet(f"{sf_dir}/events.parquet").withColumn(
        "ts_micros", F.expr("ts div 1000")
    ).drop("ts")
    src = tempfile.mkdtemp(prefix="s01_events_")
    # 8 files / 4 per trigger = 2 micro-batches: still proves
    # incremental multi-trigger processing (the many-trigger case is
    # covered by tests/test_streaming.py) without paying 8 triggers of
    # harness overhead in the bench
    raw.coalesce(8).write.mode("overwrite").parquet(src)
    stream = file_stream(spark, src, RAW_EVENTS_SCHEMA, max_files_per_trigger=4).withColumn(
        "ts", F.timestamp_micros("ts_micros")
    )
    agg = windowed_counts(stream, "ts", ["event_type"], "5 minutes", "10 minutes")
    name = f"s01_out_{uuid.uuid4().hex[:8]}"
    return run_to_completion(
        agg.select(
            # epoch seconds: absolute, identical in every session TZ
            F.unix_timestamp(F.col("window.start")).alias("window_start_epoch"),
            "event_type",
            "n",
        ),
        name,
        output_mode="complete",
    )


S01_SQL = """
SELECT (epoch_us(ts) // 300000000) * 300 AS window_start_epoch,
       event_type, count(*) AS n
FROM events GROUP BY 1, 2
"""

def s02_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming exact dedup of (user_id, event_type) via
    dropDuplicatesWithinWatermark, run to completion over the
    re-landed events table; the delay spans the dataset so the result
    equals batch DISTINCT and is exactly oracle-checkable (the
    bounded-state behavior itself is pytest-covered)."""
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:
        pass
    from las_vpe_platform_spark.streaming.engine import dedup_stream

    raw = spark.read.parquet(f"{sf_dir}/events.parquet").withColumn(
        "ts_micros", F.expr("ts div 1000")
    ).drop("ts")
    src = tempfile.mkdtemp(prefix="s02_events_")
    raw.coalesce(8).write.mode("overwrite").parquet(src)
    stream = file_stream(spark, src, RAW_EVENTS_SCHEMA, max_files_per_trigger=4).withColumn(
        "ts", F.timestamp_micros("ts_micros")
    )
    deduped = dedup_stream(
        stream, ["user_id", "event_type"], "ts", delay="8760 hours"
    ).select("user_id", "event_type")
    name = f"s02_out_{uuid.uuid4().hex[:8]}"
    return run_to_completion(deduped, name, output_mode="append")


S02_SQL = """
SELECT DISTINCT user_id, event_type FROM events
"""

STREAMING_QUERIES = {
    "s01_stream_windowed_counts": (s01_stream_windowed_counts, S01_SQL),
    "s02_stream_dedup": (s02_stream_dedup, S02_SQL),
}
