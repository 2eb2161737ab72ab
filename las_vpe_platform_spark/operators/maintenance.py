"""Table maintenance: compaction + completeness (SURVEY K4).

The reference packs each completed task's per-tracklet HDFS directory
trees into ``.har`` archives on a dedicated Kafka-consumer thread
(TrackletPackingThread, DataManagingApp.java:235-394) because millions
of small files kill HDFS. Parquet tables don't have per-row file
trees, so the equivalent is (a) the same completeness trigger as a
DataFrame predicate and (b) a small-file compaction rewrite — the
OPTIMIZE analog.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from las_vpe_platform_spark.operators.aggregates import completeness_check


def packable_tasks(tracklets: DataFrame) -> DataFrame:
    """Tasks whose tracklet count reached num_tracklets (the HAR-packing
    trigger, DataManagingApp.java:320-325) — pure A2, no file listing."""
    return completeness_check(tracklets, group_col="task_id", expected_col="num_tracklets")


def compact_parquet_table(
    spark: SparkSession,
    table_dir: str,
    target_file_mb: int = 128,
    partition_by: list[str] | None = None,
) -> int:
    """Rewrite a parquet table into ~target-sized files; returns the new
    file count.

    Sizing by current on-disk bytes (not row counts) so the result is
    stable across schema width. Writes to a sibling temp dir then
    atomically swaps, so readers never see a half-compacted table.
    """
    size_bytes = 0
    for root, _dirs, files in os.walk(table_dir):
        size_bytes += sum(os.path.getsize(os.path.join(root, f)) for f in files if f.endswith(".parquet"))
    n_files = max(1, size_bytes // (target_file_mb * 1024 * 1024))

    df = spark.read.parquet(table_dir)
    tmp_dir = table_dir.rstrip("/") + "._compacting"
    writer = df.repartition(int(n_files)).write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(tmp_dir)

    old_dir = table_dir.rstrip("/") + "._old"
    os.rename(table_dir, old_dir)
    os.rename(tmp_dir, table_dir)
    import shutil

    shutil.rmtree(old_dir)
    return sum(
        1
        for root, _d, files in os.walk(table_dir)
        for f in files
        if f.endswith(".parquet")
    )


def table_stats(spark: SparkSession, table_dir: str) -> DataFrame:
    """File-level stats for deciding when to compact."""
    rows = []
    for root, _dirs, files in os.walk(table_dir):
        for f in files:
            if f.endswith(".parquet"):
                p = os.path.join(root, f)
                rows.append((p, os.path.getsize(p)))
    return spark.createDataFrame(rows, "path string, bytes long").agg(
        F.count(F.lit(1)).alias("n_files"),
        F.sum("bytes").alias("total_bytes"),
        F.avg("bytes").alias("avg_bytes"),
    )
