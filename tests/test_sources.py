"""Source tests: binaryFile video catalog scan, webcam stub."""

from __future__ import annotations

from pathlib import Path

from las_vpe_platform_spark.sources.video import video_files, webcam_stream
from las_vpe_platform_spark.streaming.engine import run_to_completion


def _make_video_tree(root: Path) -> list[str]:
    """CAM{c}/{date}/{video_id}.h264 tree with fake payloads."""
    made = []
    for cam in ("CAM01", "CAM02"):
        d = root / cam / "20160310"
        d.mkdir(parents=True)
        for i in range(3):
            vid = f"{cam}_2016031008{i:02d}00-2016031008{i:02d}30"
            p = d / f"{vid}.h264"
            p.write_bytes(b"\x00\x01" * 64)
            made.append(vid)
    # a non-matching file that the glob must skip
    (root / "CAM01" / "20160310" / "notes.txt").write_text("skip me")
    return made


def test_video_files_recursive_scan(spark, tmp_path):
    expected = _make_video_tree(tmp_path)
    df = video_files(spark, str(tmp_path))
    rows = df.collect()
    assert {r["video_id"] for r in rows} == set(expected)
    assert all(r["length"] == 128 for r in rows)
    # start_ts parsed from the name (F7)
    assert all(r["start_ts"] is not None for r in rows)
    assert "content" not in df.columns  # metadata-only scan


def test_video_files_with_content(spark, tmp_path):
    _make_video_tree(tmp_path)
    df = video_files(spark, str(tmp_path), with_content=True)
    row = df.limit(1).collect()[0]
    assert bytes(row["content"]) == b"\x00\x01" * 64


def test_webcam_stream_stub(spark):
    stream = webcam_stream(spark, camera_id="CAM07", frames_per_second=50)
    # rate source ticks in processing time; grab whatever arrived quickly
    import time

    q = stream.writeStream.format("memory").queryName("webcam_t").start()
    try:
        time.sleep(2.5)
        q.processAllAvailable()
    finally:
        q.stop()
    rows = spark.table("webcam_t").collect()
    assert rows, "webcam stub produced no frames"
    assert all(r["camera_id"] == "CAM07" for r in rows)
    idxs = sorted(r["frame_index"] for r in rows)
    assert idxs == list(range(idxs[0], idxs[-1] + 1))
