"""Bucketed and partitioned table layout (the co-location toolkit).

At 100 TB the dominant cost of tracklet⨝attribute-shaped joins is the
shuffle of the fact tables. Two layout tools remove it:

- ``write_partitioned``: hive-style partition directories (e.g. by
  video date) → partition PRUNING for time/camera-scoped queries
  (the reference approximated this with its {videoID}/{taskID} HDFS
  tree, SURVEY §1.2).
- ``write_bucketed``: pre-hash rows into N buckets on the join key →
  two tables bucketed the same way sort-merge-join with NO exchange
  on either side. This is the Spark replacement for the reference's
  "everything through 10 Kafka partitions" co-location.

Bucketing requires a saveAsTable catalog entry (bucket metadata lives
in the metastore, not the files).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_partitioned(
    df: DataFrame, path: str, partition_cols: list[str], mode: str = "overwrite"
) -> None:
    """Partition-directory layout; readers get partition pruning on
    ``partition_cols`` predicates (visible as PartitionFilters in the
    scan node)."""
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    num_buckets: int = 32,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed (and optionally sorted) managed table.

    Joining two tables bucketed identically on the join key produces a
    SortMergeJoin with zero Exchange operators — verified by
    tests/test_bucketing.py against the physical plan.
    """
    writer = df.write.mode(mode).bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def plan_has_exchange(df: DataFrame) -> bool:
    """True if the physical plan contains a shuffle (Exchange) node —
    the thing bucketing is supposed to eliminate."""
    spark = df.sparkSession
    plan = df._jdf.queryExecution().executedPlan().toString()
    return "Exchange" in plan


def drop_table(spark: SparkSession, table: str) -> None:
    spark.sql(f"DROP TABLE IF EXISTS {table}")
