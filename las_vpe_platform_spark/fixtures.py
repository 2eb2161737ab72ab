"""Seeded, deterministic domain fixtures (FIXTURES.md; SURVEY §5).

Mirrors the reference's Fake* test doubles
(vpe/debug/FakePedestrianTracker.java:28-79 — 3-32 tracklets/video,
<=31 boxes, 5 retained samples; FakeRecognizer.java:27-36;
FakePedestrianReIDerWithAttr.java:43-49) as numpy/pyarrow generators
producing parquet. Everything is a pure function of (seed, key) so the
DuckDB oracle can re-read identical bytes from the same files.

Run ``python -m las_vpe_platform_spark.fixtures`` to (re)generate
``fixtures/*.parquet`` at the repo root.
"""

from __future__ import annotations

import hashlib
import math
import uuid
from datetime import datetime, timedelta, timezone
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from las_vpe_platform_spark.schemas import ATTRIBUTE_NAMES

SEED = 42
FIXTURES_DIR = Path(__file__).resolve().parent.parent / "fixtures"

N_VIDEOS = 64
FPS_NUM, FPS_DEN = 25, 2  # 12.5 fps (Neo4jConnector.java:53-54)
PATCH_W, PATCH_H = 4, 4   # tiny patches keep fixtures small; shape is what matters
ATTR_DROP_RATE = 0.1      # ~10% of tracklets never get attributes (late-data case)
FEATURE_DIM = 1024        # Feature1024.java:27-106


def _h32(*parts) -> int:
    """Deterministic 32-bit hash of joined parts (engine-independent)."""
    s = ":".join(str(p) for p in parts)
    return int.from_bytes(hashlib.md5(s.encode()).digest()[:4], "big")


def _hfloat(*parts) -> float:
    """[-0.5, 0.5) float from a hash (FIXTURES.md §3 generation rule)."""
    return _h32(*parts) / 2**32 - 0.5


def gen_videos() -> pa.Table:
    base = datetime(2016, 3, 10, 8, 0, 0, tzinfo=timezone.utc)
    rng = np.random.default_rng(SEED)
    rows = []
    for i in range(N_VIDEOS):
        camera_id = f"CAM{(i % 8) + 1:02d}"
        start = base + timedelta(minutes=10 * i)
        duration = int(rng.integers(300, 601))
        end = start + timedelta(seconds=duration)
        video_id = f"{camera_id}_{start:%Y%m%d%H%M%S}-{end:%Y%m%d%H%M%S}"
        rows.append(
            {
                "video_id": video_id,
                "camera_id": camera_id,
                "url": f"hdfs://videos/{camera_id}/{start:%Y%m%d}/{video_id}.h264",
                "start_ts": start.replace(tzinfo=None),
                "duration_s": duration,
                "width": 1920,
                "height": 1080,
                "fps_num": FPS_NUM,
                "fps_den": FPS_DEN,
            }
        )
    t = pa.Table.from_pylist(rows)
    return t.set_column(
        t.schema.get_field_index("start_ts"),
        "start_ts",
        t.column("start_ts").cast(pa.timestamp("us")),
    )


def fake_track_video(video_id: str, video_start: datetime) -> list[dict]:
    """The fake tracker: video row -> deterministic tracklet rows.

    Pure function of (SEED, video_id) — per-video RNG seeding makes it
    order-independent, so a distributed UDTF (pipeline stage) produces
    byte-identical output to this generator regardless of partitioning.
    Distribution parity with FakePedestrianTracker.java:28-79
    (3-32 tracklets/video, <=31 boxes, <=5 retained samples).
    """
    rng = np.random.default_rng(_h32(SEED, "track", video_id))
    n = int(rng.integers(3, 33))
    task_id = str(uuid.uuid5(uuid.NAMESPACE_URL, video_id))
    rows = []
    for serial in range(n):
        n_boxes = int(rng.integers(1, 32))
        start_frame = int(rng.integers(1, 10001))
        start_ts = video_start + timedelta(
            microseconds=start_frame * (FPS_DEN * 1_000_000 // FPS_NUM)
        )
        # <=5 evenly spaced samples keep patch bytes (Tracklet.sample)
        n_samples = min(5, n_boxes)
        step = -(-n_boxes // n_samples)  # ceil
        sample_pos = {min(i * step, n_boxes - 1) for i in range(n_samples)}
        seq = []
        for b in range(n_boxes):
            patch = None
            if b in sample_pos:
                prng = np.random.default_rng(_h32(SEED, video_id, serial, b))
                patch = prng.integers(0, 256, PATCH_W * PATCH_H * 3, dtype=np.uint8).tobytes()
            seq.append(
                {
                    "x": int(rng.integers(0, 1920 - 64)),
                    "y": int(rng.integers(0, 1080 - 128)),
                    "width": PATCH_W,
                    "height": PATCH_H,
                    "patch_data": patch,
                }
            )
        stored = None
        if rng.random() < 0.1:  # claim-check rows (TrackletOrURL)
            stored = f"/metadata/{video_id}/{task_id}/{serial}"
        rows.append(
            {
                "video_id": video_id,
                "serial_number": serial,
                "tracklet_key": f"{video_id}_tarid{serial}",
                "task_id": task_id,
                "num_tracklets": n,
                "start_frame_index": start_frame,
                "start_ts": start_ts,
                "location_sequence": seq,
                "stored_url": stored,
            }
        )
    return rows


def gen_tracklets(videos: pa.Table) -> pa.Table:
    rows = []
    for vrow in videos.to_pylist():
        rows.extend(fake_track_video(vrow["video_id"], vrow["start_ts"]))
    t = pa.Table.from_pylist(rows)
    return t.set_column(
        t.schema.get_field_index("start_ts"),
        "start_ts",
        t.column("start_ts").cast(pa.timestamp("us")),
    )


def gen_attribute_samples(tracklets: pa.Table) -> pa.Table:
    """Per-sample fake recognizer outputs (pre-A1-aggregation rows)."""
    rows = []
    for trow in tracklets.select(["tracklet_key", "location_sequence"]).to_pylist():
        key = trow["tracklet_key"]
        if _hfloat(SEED, "attr_drop", key) + 0.5 < ATTR_DROP_RATE:
            continue  # simulates attributes that never arrive (late data)
        sample_idxs = [
            i for i, b in enumerate(trow["location_sequence"]) if b["patch_data"] is not None
        ]
        for s in sample_idxs:
            row = {"tracklet_key": key, "sample_idx": s}
            for name in ATTRIBUTE_NAMES:
                row[name] = _hfloat(SEED, key, s, name)
            rows.append(row)
    return pa.Table.from_pylist(rows)


def gen_attributes(samples: pa.Table) -> pa.Table:
    """Tracklet-level attributes = mean over samples (the A1 golden)."""
    df = samples.to_pandas()
    agg = df.groupby("tracklet_key", as_index=False)[list(ATTRIBUTE_NAMES)].mean()
    return pa.Table.from_pandas(agg, preserve_index=False)


def gen_features(tracklets: pa.Table) -> pa.Table:
    keys = tracklets.column("tracklet_key").to_pylist()
    rows = []
    for key in keys:
        rng = np.random.default_rng(_h32(SEED, "feature", key))
        v = rng.standard_normal(FEATURE_DIM).astype(np.float32)
        # np.linalg.norm reduces in SIMD/BLAS order — hardware-dependent
        # at the ULP level, which broke byte-reproducible regeneration
        # across hosts. math.fsum is exactly rounded on every platform,
        # and the subsequent float32 division is IEEE-exact, so the
        # committed parquet now regenerates bit-identically anywhere.
        nrm = math.sqrt(math.fsum(float(x) * float(x) for x in v))
        v /= np.float32(nrm)
        rows.append({"tracklet_key": key, "feature": v.tolist()})
    return pa.Table.from_pylist(
        rows,
        schema=pa.schema(
            [
                pa.field("tracklet_key", pa.string()),
                pa.field("feature", pa.list_(pa.float32())),
            ]
        ),
    )


def gen_similarity_edges(features: pa.Table, k: int = 16) -> pa.Table:
    keys = features.column("tracklet_key").to_pylist()
    vecs = {r["tracklet_key"]: np.array(r["feature"], dtype=np.float64) for r in features.to_pylist()}
    n = len(keys)
    rows = []
    for idx, key in enumerate(keys):
        rng = np.random.default_rng(_h32(SEED, "edges", key))
        partners = rng.choice(n, size=min(k, n - 1) + 1, replace=False)
        count = 0
        for p in partners:
            if keys[p] == key or count >= k:
                continue
            sim = float(vecs[key] @ vecs[keys[p]])
            rows.append({"node_a": key, "node_b": keys[p], "similarity": np.float32(sim)})
            count += 1
    return pa.Table.from_pylist(
        rows,
        schema=pa.schema(
            [
                pa.field("node_a", pa.string()),
                pa.field("node_b", pa.string()),
                pa.field("similarity", pa.float32()),
            ]
        ),
    )


def gen_term_sigs(tracklets: pa.Table) -> pa.Table:
    task_ids = sorted(set(tracklets.column("task_id").to_pylist()))
    base = datetime(2016, 3, 10, 9, 0, 0)
    rows = [
        {"task_id": t, "sig_ts": base + timedelta(seconds=i)}
        for i, t in enumerate(task_ids)
        if _h32(SEED, "term", t) % 100 < 5  # ~5% of tasks killed
    ]
    t = pa.Table.from_pylist(rows)
    return t.set_column(
        t.schema.get_field_index("sig_ts"),
        "sig_ts",
        t.column("sig_ts").cast(pa.timestamp("us")),
    )


def gen_commands(videos: pa.Table) -> pa.Table:
    cmds = ["track", "track-attrrecog", "attrrecog", "reid", "attrrecog-reid", "track-attrrecog-reid"]
    base = datetime(2016, 3, 10, 7, 0, 0)
    rows = []
    vurls = videos.column("url").to_pylist()
    for i in range(48):
        cmd = cmds[i % len(cmds)]
        if i % 4 == 0:
            # directory prefix — exercises S4 recursive expansion
            url = vurls[i % len(vurls)].rsplit("/", 1)[0]
        else:
            url = vurls[i % len(vurls)]
        rows.append(
            {
                "command": cmd,
                "video_url": url,
                "tracking_conf_file": f"CAM{(i % 8) + 1:02d}_0.conf",
                "tracklet_serial_num": (i % 3) if cmd in ("attrrecog", "reid") else None,
                "submit_ts": base + timedelta(seconds=30 * i),
            }
        )
    t = pa.Table.from_pylist(rows)
    return t.set_column(
        t.schema.get_field_index("submit_ts"),
        "submit_ts",
        t.column("submit_ts").cast(pa.timestamp("us")),
    )


def gen_audio_clips(n_clips: int = 128) -> pa.Table:
    """Deterministic int16 PCM clips — the audio face of the
    multimodal binary-column pattern (image patches / video frames /
    audio waveforms all travel as opaque bytes + typed metadata)."""
    rows = []
    for i in range(n_clips):
        rng = np.random.default_rng(_h32(SEED, "audio", i))
        n = int(rng.integers(512, 2049))
        pcm = (
            rng.integers(-32768, 32768, n, dtype=np.int64)
            .astype("<i2")
            .tobytes()
        )
        rows.append(
            {
                "clip_id": f"clip{i:04d}",
                "sample_rate": 16000,
                "n_samples": n,
                "pcm": pcm,
            }
        )
    return pa.Table.from_pylist(rows)


def generate_all(outdir: str | Path = FIXTURES_DIR) -> dict[str, int]:
    outdir = Path(outdir)
    outdir.mkdir(parents=True, exist_ok=True)
    videos = gen_videos()
    tracklets = gen_tracklets(videos)
    samples = gen_attribute_samples(tracklets)
    attributes = gen_attributes(samples)
    features = gen_features(tracklets)
    edges = gen_similarity_edges(features)
    term_sigs = gen_term_sigs(tracklets)
    commands = gen_commands(videos)
    audio = gen_audio_clips()
    tables = {
        "videos": videos,
        "tracklets": tracklets,
        "attribute_samples": samples,
        "attributes": attributes,
        "features": features,
        "similarity_edges": edges,
        "term_sigs": term_sigs,
        "commands": commands,
        "audio_clips": audio,
    }
    for name, table in tables.items():
        pq.write_table(table, outdir / f"{name}.parquet")
    return {name: table.num_rows for name, table in tables.items()}


if __name__ == "__main__":
    counts = generate_all()
    for name, n in counts.items():
        print(f"{name}: {n} rows")
