"""F2/F10 binary pack/unpack tests."""

from __future__ import annotations

import struct

from pyspark.sql import functions as F

from las_vpe_platform_spark.fixtures import FIXTURES_DIR
from las_vpe_platform_spark.functions.binary import (
    fill_attributes,
    pack_bounding_box,
    roundtrip_feature,
)
from las_vpe_platform_spark.schemas import ATTRIBUTE_NAMES


def _fx(spark, name):
    return spark.read.parquet(str(FIXTURES_DIR / f"{name}.parquet"))


def test_feature_bytes_roundtrip(spark):
    feats = _fx(spark, "features").limit(20)
    rt = roundtrip_feature(feats)
    rows = rt.select("feature", "feature_rt", F.length("_bytes").alias("nb")).collect()
    assert len(rows) == 20
    for r in rows:
        assert r["nb"] == 4 * len(r["feature"])  # Feature1024: 4096 bytes
        assert list(r["feature"]) == list(r["feature_rt"])


def test_fill_attributes_mapping(spark):
    n = len(ATTRIBUTE_NAMES)
    df = spark.range(1).select(
        F.array(*[F.lit(float(i)) for i in range(n)]).alias("fc8")
    )
    out = df.select(*fill_attributes("fc8"))
    assert out.columns == list(ATTRIBUTE_NAMES)
    row = out.collect()[0]
    assert row["gender_male"] == 0.0                    # ATTR_LIST position 0
    assert row[ATTRIBUTE_NAMES[-1]] == float(n - 1)     # last position


def test_pack_bounding_box_layout(spark):
    tr = _fx(spark, "tracklets").limit(5)
    boxes = tr.select(F.explode("location_sequence").alias("box")).filter(
        F.col("box.patch_data").isNotNull()
    )
    packed = boxes.select("box", pack_bounding_box("box").alias("b")).collect()
    assert packed
    for r in packed:
        x, y, w, h = struct.unpack("<4i", r["b"][:16])
        assert (x, y, w, h) == (r["box"]["x"], r["box"]["y"], r["box"]["width"], r["box"]["height"])
        assert r["b"][16:] == bytes(r["box"]["patch_data"])
