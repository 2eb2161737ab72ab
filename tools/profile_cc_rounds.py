#!/usr/bin/env python3
"""Round-12 measurement: per-round wall/job/stage/task accounting of
connected_components on q55's LSH pair graph at sf0.1, via a patched
copy of the loop + the UI REST API (profile_q160 pattern)."""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

os.environ.setdefault("SPARK_GRAFT_CPUS", "32")

from pyspark.sql import functions as F  # noqa: E402


def rest(path: str):
    url = f"http://localhost:4049/api/v1/{path}"
    with urllib.request.urlopen(url, timeout=10) as r:
        return json.loads(r.read())


def main() -> None:
    from tools.profile_q160 import get_spark_with_ui  # noqa: E402

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark_with_ui()
    spark.read.parquet(f"{sf_dir}/region.parquet").count()
    cores = spark.sparkContext.defaultParallelism
    spark.range(cores).repartition(cores).mapInPandas(lambda it: it, "id long").count()
    app_id = spark.sparkContext.applicationId

    from las_vpe_platform_spark.operators.dedup import minhash_lsh_candidates
    from las_vpe_platform_spark.queries_data import (
        MINHASH_BANDS, MINHASH_HASHES, MINHASH_K, _t,
    )

    docs = _t(spark, sf_dir, "documents")
    pairs = minhash_lsh_candidates(
        docs, id_col="doc_id", text_col="text",
        shingle_k=MINHASH_K, num_hashes=MINHASH_HASHES, bands=MINHASH_BANDS,
    )

    # --- inlined connected_components with per-round timing ---------------
    marks = []

    def mark(label):
        marks.append((label, time.perf_counter(),
                      [j["jobId"] for j in rest(f"applications/{app_id}/jobs")]))

    mark("start")
    e = pairs.selectExpr("id_a AS a", "id_b AS b").localCheckpoint(eager=False)
    sym = e.union(e.selectExpr("b AS a", "a AS b")).localCheckpoint(eager=False)
    labels = (
        sym.select(F.col("a").alias("node")).distinct()
        .withColumn("component", F.col("node")).localCheckpoint(eager=False)
    )
    prev_sum = labels.agg(F.sum("component")).collect()[0][0]
    mark("setup+sum0")

    def step(lbl):
        parents = lbl.selectExpr("node AS component", "component AS _cc")
        shortcut = lbl.join(parents, on="component").select(
            "node", F.col("_cc").alias("component"))
        neighbor = (
            sym.join(lbl, on=F.col("b") == F.col("node"), how="inner")
            .select(F.col("a").alias("node"), "component"))
        return (neighbor.unionAll(shortcut).unionAll(lbl)
                .groupBy("node").agg(F.min("component").alias("component")))

    for i in range(25):
        labels = step(labels).localCheckpoint(eager=False)
        new_sum = labels.agg(F.sum("component")).collect()[0][0]
        mark(f"round{i + 1}")
        if new_sum == prev_sum:
            break
        prev_sum = new_sum

    out = []
    for (l0, t0, j0), (l1, t1, j1) in zip(marks, marks[1:]):
        out.append({"phase": l1, "wall_s": round(t1 - t0, 3),
                    "new_jobs": len(set(j1) - set(j0))})
    print(json.dumps(out, indent=1))

    # stage detail for the LAST full round's jobs
    jobs = rest(f"applications/{app_id}/jobs")
    last_round_jobs = sorted(set(marks[-1][2]) - set(marks[-2][2]))
    detail = []
    for jid in last_round_jobs:
        j = next(x for x in jobs if x["jobId"] == jid)
        for sid in j["stageIds"]:
            try:
                stg = rest(f"applications/{app_id}/stages/{sid}")[0]
            except Exception:
                continue
            detail.append({
                "job": jid, "stage": sid, "tasks": stg["numCompleteTasks"],
                "ms": stg.get("executorRunTime"),
                "name": stg["name"].split("\n")[0][:60],
            })
    print(json.dumps(detail, indent=1))


if __name__ == "__main__":
    main()
