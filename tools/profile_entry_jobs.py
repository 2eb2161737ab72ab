#!/usr/bin/env python3
"""Round-12 measurement: per-job wall/task-time breakdown of one
catalog entry via the UI REST API (profile_q160 pattern).

Usage: SPARK_GRAFT_SF_DIR=... python tools/profile_entry_jobs.py <entry>
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

os.environ.setdefault("SPARK_GRAFT_CPUS", "32")


def main() -> None:
    from tools.profile_q160 import get_spark_with_ui, rest

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    name = sys.argv[1]
    spark = get_spark_with_ui()
    spark.read.parquet(f"{sf_dir}/region.parquet").count()
    spark.range(32).repartition(32).mapInPandas(lambda it: it, "id long").count()
    app_id = spark.sparkContext.applicationId

    from las_vpe_platform_spark.operators.staging import unpersist_all
    from las_vpe_platform_spark.queries import CATALOG

    fn = CATALOG[name][0]
    # warm run
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    unpersist_all()
    jobs_before = {j["jobId"] for j in rest(f"applications/{app_id}/jobs")}
    t0 = time.perf_counter()
    df = fn(spark, sf_dir)
    t_build = time.perf_counter() - t0
    df.write.format("noop").mode("overwrite").save()
    unpersist_all()
    wall = time.perf_counter() - t0
    jobs = [
        j
        for j in rest(f"applications/{app_id}/jobs")
        if j["jobId"] not in jobs_before
    ]
    jobs.sort(key=lambda j: j["jobId"])
    out = []
    for j in jobs:
        sub = j["submissionTime"]
        comp = j.get("completionTime")
        out.append(
            {
                "job": j["jobId"],
                "submitted": sub.split("T")[1].rstrip("GMT"),
                "done": (comp or "").split("T")[-1].rstrip("GMT"),
                "tasks": j["numCompletedTasks"],
                "stages": len(j["stageIds"]),
            }
        )
    print(json.dumps({"name": name, "wall": round(wall, 3),
                      "build": round(t_build, 3), "n_jobs": len(jobs)}))
    for o in out:
        print(json.dumps(o))


if __name__ == "__main__":
    main()
