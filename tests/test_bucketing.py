"""Bucketed/partitioned layout tests: shuffle elimination + pruning."""

from __future__ import annotations

from pyspark.sql import functions as F

from las_vpe_platform_spark.fixtures import FIXTURES_DIR
from las_vpe_platform_spark.operators.bucketing import (
    drop_table,
    plan_has_exchange,
    write_bucketed,
    write_partitioned,
)


def _fx(spark, name):
    return spark.read.parquet(str(FIXTURES_DIR / f"{name}.parquet"))


def test_bucketed_join_has_no_shuffle(spark):
    tr = _fx(spark, "tracklets").select("tracklet_key", "video_id", "start_frame_index")
    at = _fx(spark, "attributes").select("tracklet_key", "gender_male")
    drop_table(spark, "b_tracklets")
    drop_table(spark, "b_attributes")
    try:
        write_bucketed(tr, "b_tracklets", ["tracklet_key"], 8, sort_cols=["tracklet_key"])
        write_bucketed(at, "b_attributes", ["tracklet_key"], 8, sort_cols=["tracklet_key"])
        bt = spark.table("b_tracklets")
        ba = spark.table("b_attributes")
        # hint merge: with tiny test tables the planner would broadcast
        # (which ignores buckets); at fact×fact scale SMJ is the real
        # strategy and buckets remove both exchanges
        joined = bt.hint("merge").join(ba, on="tracklet_key")
        assert not plan_has_exchange(joined)
        # and the result is correct
        plain = tr.join(at, on="tracklet_key")
        assert joined.count() == plain.count()
    finally:
        drop_table(spark, "b_tracklets")
        drop_table(spark, "b_attributes")


def test_partition_pruning(spark, tmp_path):
    tr = _fx(spark, "tracklets").withColumn(
        "cam", F.substring("video_id", 1, 5)
    ).select("cam", "tracklet_key", "start_frame_index")
    path = str(tmp_path / "by_cam")
    write_partitioned(tr, path, ["cam"])
    scan = spark.read.parquet(path).filter(F.col("cam") == "CAM01")
    plan = scan._jdf.queryExecution().executedPlan().toString()
    # the cam predicate must appear as a PartitionFilter (directory
    # pruning), not a data filter
    assert "PartitionFilters" in plan
    assert "cam" in plan.split("PartitionFilters", 1)[1].split("]", 1)[0]
    assert scan.count() == tr.filter(F.col("cam") == "CAM01").count()


def test_bucketed_snapshot_diff_has_no_shuffle(spark):
    """SCALE.md's q91 claim made concrete: land both snapshot sides
    bucketed on the key with the fingerprint MATERIALIZED, and the
    full-outer CDC join plans with zero exchanges — at 100 TB the diff
    costs two bucketed scans plus the final (4-row) aggregate."""
    docs = _fx(spark, "tracklets")  # any keyed fixture works as the snapshot base
    old = docs.select(
        F.col("tracklet_key").alias("key"), F.md5("video_id").alias("old_hash")
    )
    new = docs.filter(F.col("serial_number") != 3).select(
        F.col("tracklet_key").alias("key"), F.md5("task_id").alias("new_hash")
    )
    drop_table(spark, "b_snap_old")
    drop_table(spark, "b_snap_new")
    try:
        write_bucketed(old, "b_snap_old", ["key"], 8, sort_cols=["key"])
        write_bucketed(new, "b_snap_new", ["key"], 8, sort_cols=["key"])
        bo = spark.table("b_snap_old")
        bn = spark.table("b_snap_new")
        joined = bo.hint("merge").join(bn, on="key", how="full_outer").select(
            F.when(F.col("old_hash").isNull(), F.lit("added"))
            .when(F.col("new_hash").isNull(), F.lit("removed"))
            .when(F.col("old_hash") != F.col("new_hash"), F.lit("changed"))
            .otherwise(F.lit("unchanged"))
            .alias("change_type")
        )
        assert not plan_has_exchange(joined)
        # semantics preserved vs the unbucketed plan: same change_type
        # DISTRIBUTION, not just total rows (a swapped added/removed
        # branch would keep counts equal and slip a count-only check)
        classify = (
            F.when(F.col("old_hash").isNull(), F.lit("added"))
            .when(F.col("new_hash").isNull(), F.lit("removed"))
            .when(F.col("old_hash") != F.col("new_hash"), F.lit("changed"))
            .otherwise(F.lit("unchanged"))
            .alias("change_type")
        )
        plain = old.join(new, on="key", how="full_outer").select(classify)
        as_counts = lambda df: {  # noqa: E731
            r["change_type"]: r["count"] for r in df.groupBy("change_type").count().collect()
        }
        got, want = as_counts(joined), as_counts(plain)
        # new ⊆ old keys here, so 'removed' and 'changed' must both be
        # populated (added is structurally 0 for this snapshot pair)
        assert got == want and got.get("removed", 0) > 0 and got.get("changed", 0) > 0
    finally:
        drop_table(spark, "b_snap_old")
        drop_table(spark, "b_snap_new")
