"""Kafka deploy contract (S1/K1 — SparkStreamingApp.java:129-190,
KafkaHelper.scala:55-144).

The container has no Kafka broker or connector jars, so the live path
can't execute here. What CAN be pinned — and is the entire
deployment-facing surface — is the contract: the exact reader/writer
options the builders emit, and the record<->TaskData projections,
which run fine on batch DataFrames. README "Kafka deployment" carries
the jar manifest; if these tests pass and those jars are on the
classpath, `kafka_stream`/`kafka_sink` is paint-by-numbers.
"""

from __future__ import annotations

import json
from datetime import datetime

from pyspark.sql import functions as F

from las_vpe_platform_spark.streaming.engine import (
    kafka_payload,
    kafka_sink_options,
    kafka_source_options,
    taskdata_projection,
)


def test_source_options_exact():
    assert kafka_source_options("b1:9092,b2:9092", ["pedestrian-tracking-task"]) == {
        "kafka.bootstrap.servers": "b1:9092,b2:9092",
        "subscribe": "pedestrian-tracking-task",
        "startingOffsets": "latest",
    }
    # multi-topic subscribe is comma-joined; backpressure knob is
    # stringly-typed as the DataSource API requires
    opts = kafka_source_options("b:9092", ["t1", "t2"], max_offsets_per_trigger=5000)
    assert opts["subscribe"] == "t1,t2"
    assert opts["maxOffsetsPerTrigger"] == "5000"


def test_sink_options_exact():
    assert kafka_sink_options("b:9092", "attr-out", "/ckpt/attr") == {
        "kafka.bootstrap.servers": "b:9092",
        "topic": "attr-out",
        "checkpointLocation": "/ckpt/attr",
    }


def test_taskdata_projection_schema(spark):
    # shape of the kafka source relation (fixed by the connector)
    records = spark.createDataFrame(
        [
            (
                "tracking-result",
                bytearray(b"k1"),
                bytearray(b"payload"),
                datetime(2024, 1, 1, 10, 0, 0),
            )
        ],
        "topic string, key binary, value binary, timestamp timestamp",
    )
    out = taskdata_projection(records)
    assert [(f.name, f.dataType.simpleString()) for f in out.schema.fields] == [
        ("payload_type", "string"),
        ("task_id", "string"),
        ("payload", "binary"),
        ("event_ts", "timestamp"),
    ]
    row = out.collect()[0]
    assert row["payload_type"] == "tracking-result"
    assert row["task_id"] == "k1"


def test_kafka_payload_roundtrip(spark):
    df = spark.createDataFrame(
        [("t1", "CAM01/video-1", 3)], "task_id string, video_url string, n int"
    )
    out = kafka_payload(df)
    assert [(f.name, f.dataType.simpleString()) for f in out.schema.fields] == [
        ("key", "string"),
        ("value", "string"),
    ]
    row = out.collect()[0]
    assert row["key"] == "t1"
    assert json.loads(row["value"]) == {
        "task_id": "t1",
        "video_url": "CAM01/video-1",
        "n": 3,
    }
    # and the value parses back with from_json (the consumer-side path)
    back = out.select(
        F.from_json("value", "task_id string, video_url string, n int").alias("d")
    ).select("d.*")
    assert back.collect()[0]["video_url"] == "CAM01/video-1"
