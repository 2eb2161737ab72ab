"""Multimodal operator tests: binary columns, Arrow-batched decode
plumbing, video-cutting source."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from las_vpe_platform_spark.fixtures import FIXTURES_DIR, PATCH_H, PATCH_W
from las_vpe_platform_spark.operators.multimodal import (
    cut_video_frames,
    extract_patch_features,
    patch_metadata,
    resize_patches,
)


def _fx(spark, name):
    return spark.read.parquet(str(FIXTURES_DIR / f"{name}.parquet"))


def test_patch_metadata(spark):
    tr = _fx(spark, "tracklets")
    meta = patch_metadata(tr).collect()
    assert len(meta) == tr.count()
    for r in meta[:100]:
        assert 1 <= r["n_patches"] <= 5
        assert r["total_patch_bytes"] == r["n_patches"] * PATCH_W * PATCH_H * 3


def test_extract_patch_features(spark):
    tr = _fx(spark, "tracklets").limit(50)
    feats = extract_patch_features(tr).collect()
    assert len(feats) == 50
    for r in feats:
        assert len(r["patch_feature"]) == 16
        assert math.isclose(sum(r["patch_feature"]), 1.0, abs_tol=1e-9)
    # determinism across runs / partitionings
    again = {
        r["tracklet_key"]: r["patch_feature"]
        for r in extract_patch_features(tr.repartition(7)).collect()
    }
    for r in feats:
        assert again[r["tracklet_key"]] == r["patch_feature"]


def test_resize_patches_known_values(spark):
    """Hand-computed nearest-neighbor resize: a 2x2 BGR patch scaled to
    1x1 keeps exactly pixel (0,0); to 4x4 it replicates each source
    pixel 2x2 (src = (y*H//outH, x*W//outW))."""
    import numpy as np

    src = np.arange(12, dtype=np.uint8).reshape(2, 2, 3)  # 2x2x3
    df = spark.createDataFrame(
        [("t1", [{"x": 0, "y": 0, "width": 2, "height": 2, "patch_data": src.tobytes()}])],
        "tracklet_key string, location_sequence array<struct<x:int,y:int,width:int,height:int,patch_data:binary>>",
    )
    one = resize_patches(df, out_w=1, out_h=1).collect()[0]
    assert bytes(one["resized"]) == src[0, 0].tobytes()
    four = resize_patches(df, out_w=4, out_h=4).collect()[0]
    expect = src[np.ix_([0, 0, 1, 1], [0, 0, 1, 1])]
    assert bytes(four["resized"]) == expect.tobytes()
    assert (four["out_w"], four["out_h"]) == (4, 4)


def test_resize_patches_fixture_shape(spark):
    tr = _fx(spark, "tracklets").limit(20)
    rows = resize_patches(tr, out_w=2, out_h=2).collect()
    assert len(rows) == 20
    for r in rows:
        assert len(r["resized"]) == 2 * 2 * 3


def test_cut_video_frames(spark):
    vids = _fx(spark, "videos").limit(8)
    frames = cut_video_frames(vids, max_frames_per_fragment=1000, frame_stride=250)
    rows = frames.collect()
    assert len(rows) > 0
    by_video = {}
    for r in rows:
        by_video.setdefault(r["video_id"], []).append(r)
        assert len(r["frame_data"]) == 16
        assert r["fragment_id"] == r["frame_index"] // 1000
    for vid, vrows in by_video.items():
        idxs = sorted(r["frame_index"] for r in vrows)
        assert idxs[0] == 0
        assert all(b - a == 250 for a, b in zip(idxs, idxs[1:]))


def test_decimate_audio_known_values(spark):
    import numpy as np

    from las_vpe_platform_spark.operators.multimodal import decimate_audio

    src = np.array([0, 1, -2, 3, 4, -5, 6, 7, 8], dtype="<i2")
    df = spark.createDataFrame(
        [("c1", src.tobytes())], "clip_id string, pcm binary"
    )
    row = decimate_audio(df, factor=4).collect()[0]
    assert np.frombuffer(bytes(row["decimated"]), dtype="<i2").tolist() == [0, 4, 8]
    assert row["factor"] == 4


def test_decimate_audio_fixture_shape(spark):
    from las_vpe_platform_spark.fixtures import FIXTURES_DIR
    from las_vpe_platform_spark.operators.multimodal import decimate_audio

    clips = spark.read.parquet(str(FIXTURES_DIR / "audio_clips.parquet"))
    rows = decimate_audio(clips, factor=4).collect()
    assert len(rows) == 128
    for r in rows:
        assert len(r["decimated"]) % 2 == 0 and len(r["decimated"]) > 0


def test_cut_video_frames_decoder_injection(spark):
    """The real-codec path is one argument: a custom decoder's frames
    flow through fragmenting/schema/batching unchanged."""
    from las_vpe_platform_spark.operators.multimodal import cut_video_frames

    videos = spark.createDataFrame(
        [("v1", 4.0, 25, 1)],
        "video_id string, duration_s double, fps_num int, fps_den int",
    )

    def two_frame_decoder(video_id, duration_s, fps_num, fps_den, frame_stride):
        yield 0, b"frame-zero"
        yield 1500, b"frame-late"

    rows = {
        r["frame_index"]: (r["fragment_id"], bytes(r["frame_data"]))
        for r in cut_video_frames(videos, decoder=two_frame_decoder).collect()
    }
    assert rows == {0: (0, b"frame-zero"), 1500: (1, b"frame-late")}


def test_m07_tolerates_patchless_tracklets(spark):
    """m07's content-hash side must skip tracklets whose retained-patch
    list is empty instead of aborting under ANSI element_at (review
    finding r3) — mirroring the oracle's len(...) > 0 guard."""
    from pyspark.sql import functions as F

    from las_vpe_platform_spark.queries_domain import _fx, m07_patch_neardup

    # the real fixture plus one synthetic patchless tracklet appended
    tr = _fx(spark, "tracklets")
    patchless = tr.limit(1).withColumn(
        "location_sequence",
        F.expr(
            "transform(location_sequence,"
            " b -> named_struct('height', b.height, 'patch_data',"
            " CAST(NULL AS BINARY), 'width', b.width, 'x', b.x, 'y', b.y))"
        ),
    ).withColumn("tracklet_key", F.lit("patchless-key"))
    import las_vpe_platform_spark.queries_domain as qd
    orig = qd._fx
    try:
        qd._fx = lambda s, name: (
            tr.unionByName(patchless) if name == "tracklets" else orig(s, name)
        )
        out = m07_patch_neardup(spark, "unused")
        rows = out.collect()  # must not raise
        assert all(r["n_members"] >= 2 for r in rows)
    finally:
        qd._fx = orig
