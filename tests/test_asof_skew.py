"""As-of join and salted-join operator tests."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from las_vpe_platform_spark.operators.asof import asof_join
from las_vpe_platform_spark.operators.skew import salted_join


def _ts(s):
    return datetime.fromisoformat(s)


def test_asof_join_semantics(spark):
    left = spark.createDataFrame(
        [
            (1, "u1", _ts("2024-01-01 10:00:00")),
            (2, "u1", _ts("2024-01-01 10:05:00")),
            (3, "u2", _ts("2024-01-01 10:00:00")),
            (4, "u3", _ts("2024-01-01 10:00:00")),   # no right partner
        ],
        "id long, user string, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            ("u1", _ts("2024-01-01 09:58:00"), 100),
            ("u1", _ts("2024-01-01 10:03:00"), 101),
            ("u1", _ts("2024-01-01 10:06:00"), 102),  # after everything
            ("u2", _ts("2024-01-01 10:00:00"), 200),  # exact-ts match
        ],
        "user string, ts timestamp, v int",
    )
    out = {
        r["id"]: r["v_right"]
        for r in asof_join(left, right, on="ts", by=["user"], right_value_cols=["v"]).collect()
    }
    assert out == {1: 100, 2: 101, 3: 200, 4: None}


def test_asof_join_null_in_latest_right_row_is_not_backfilled(spark):
    # the most recent right row has v=NULL, w=32; an older row has
    # v=31. The carried values must all come from the SAME (latest)
    # right row: v_right must be NULL, not backfilled to 31.
    left = spark.createDataFrame(
        [(1, "u1", _ts("2024-01-01 10:00:00"))], "id long, user string, ts timestamp"
    )
    right = spark.createDataFrame(
        [
            ("u1", _ts("2024-01-01 09:00:00"), 31, 31),
            ("u1", _ts("2024-01-01 09:30:00"), None, 32),
        ],
        "user string, ts timestamp, v int, w int",
    )
    row = asof_join(
        left, right, on="ts", by=["user"], right_value_cols=["v", "w"]
    ).collect()[0]
    assert row["v_right"] is None
    assert row["w_right"] == 32
    assert row["ts_right"] == _ts("2024-01-01 09:30:00")


def test_asof_join_tolerance(spark):
    left = spark.createDataFrame(
        [(1, "u1", _ts("2024-01-01 11:00:00"))], "id long, user string, ts timestamp"
    )
    right = spark.createDataFrame(
        [("u1", _ts("2024-01-01 09:00:00"), 7)], "user string, ts timestamp, v int"
    )
    loose = asof_join(left, right, on="ts", by=["user"], right_value_cols=["v"]).collect()
    tight = asof_join(
        left, right, on="ts", by=["user"], tolerance_seconds=1800, right_value_cols=["v"]
    ).collect()
    assert loose[0]["v_right"] == 7
    assert tight[0]["v_right"] is None


def test_salted_join_equals_plain_join(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select("l_orderkey", "l_quantity")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderpriority"
    )
    plain = (
        li.join(orders, on="l_orderkey")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("l_quantity"), 2).alias("s"))
    )
    salted = (
        salted_join(li, orders, on="l_orderkey", n_salts=8)
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("l_quantity"), 2).alias("s"))
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))
