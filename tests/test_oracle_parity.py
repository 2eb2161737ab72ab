"""Spark-vs-DuckDB parity for every catalog query — the local replica
of the driver's CORRECTNESS gate (row count + column names + order-
insensitive value comparison).

This module runs at sf0.01 — the driver's own scale — rather than the
sf0.001 the rest of the suite uses (VERDICT r2 #7): volume-sensitive
bugs (join duplication, overflow, bucket occupancy) can hide at
sf0.001. ``SPARK_GRAFT_TEST_SF_DIR`` still overrides both.
"""

from __future__ import annotations

import math
import os

import duckdb
import pytest

from las_vpe_platform_spark.queries import CATALOG

PARITY_SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.01")


@pytest.fixture(scope="module")
def sf_dir():
    return PARITY_SF_DIR


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for name in (
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ):
        path = f"{PARITY_SF_DIR}/{name}.parquet"
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{path}'")
    yield con
    con.close()


def _normalize(rows, columns):
    """Order-insensitive canonical form: sort columns by name, then rows."""
    order = sorted(range(len(columns)), key=lambda i: columns[i])

    def norm_val(v):
        if v is None:
            return ("\x00null",)
        if isinstance(v, float):
            if math.isnan(v):
                return ("nan",)
            # collapse -0.0 / float noise at display precision
            return (repr(round(v, 9)),)
        return (str(v),)

    normed = [tuple(norm_val(row[i]) for i in order) for row in rows]
    return sorted(normed)


@pytest.mark.parametrize("name", sorted(CATALOG.keys()))
def test_query_matches_oracle(name, spark, duck, sf_dir):
    from las_vpe_platform_spark.operators.staging import unpersist_all

    fn, sql = CATALOG[name]
    sdf = fn(spark, sf_dir)
    spark_rows = [tuple(r) for r in sdf.collect()]
    spark_cols = sdf.columns
    unpersist_all()  # caller-controlled staging lifecycle (staging.py)

    if sql is None:
        pytest.skip(f"{name}: rows-only check (no oracle)")

    res = duck.execute(sql)
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column mismatch {spark_cols} vs {duck_cols}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count {len(spark_rows)} vs {len(duck_rows)}"
    )
    sn = _normalize(spark_rows, spark_cols)
    dn = _normalize(duck_rows, duck_cols)
    mismatches = [(a, b) for a, b in zip(sn, dn) if a != b]
    assert not mismatches, f"{name}: first mismatches {mismatches[:3]}"


def test_timezone_independence(spark, duck, sf_dir):
    """TZ-sensitive queries must match the (naive-timestamp) oracle even
    under a non-UTC session timezone — the driver's session TZ is not
    ours to control."""
    tz_queries = [
        "q09_last_events",
        "q10_events_minutely",
        "q15_frame_time_arithmetic",
        "q16_event_type_pivot",
        "q46_multi_distinct",
        "s01_stream_windowed_counts",
        # the flagship's hour windows + watermark must stay epoch-
        # aligned under any session TZ (ntz landing + timestamp_micros;
        # the tracker UDTF round-trips session-tz-naive both ways)
        "s24_stream_track_attr_reid",
    ]
    original = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "Asia/Kolkata")
    try:
        for name in tz_queries:
            fn, sql = CATALOG[name]
            sdf = fn(spark, sf_dir)
            srows = [tuple(r) for r in sdf.collect()]
            res = duck.execute(sql)
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
            assert _normalize(srows, sdf.columns) == _normalize(drows, dcols), name
    finally:
        spark.conf.set("spark.sql.session.timeZone", original)
