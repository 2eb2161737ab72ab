#!/usr/bin/env python3
"""q160 adjudication probe (VERDICT r11 'What's wrong' #1).

Runs q160_local_bridges N times at sf0.1 with the Spark UI enabled,
recording per-run wall / window-steal / process-tree CPU, then pulls
per-stage task-time, GC and spill distributions for the slowest and
fastest runs from the UI REST API, plus the LSH band-occupancy
histogram of the staged q160_pairs input (the hot-posting-bucket
hypothesis). Writes a JSON report to stdout.
"""

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

from pyspark.sql import SparkSession, functions as F  # noqa: E402

import bench  # noqa: E402
from las_vpe_platform_spark.operators.staging import unpersist_all  # noqa: E402


def get_spark_with_ui():
    from las_vpe_platform_spark import session as S

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    b = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("q160_profile")
        .config("spark.sql.shuffle.partitions", str(max(cpus, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", S._default_driver_memory())
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", "4049")
        .config("spark.sql.autoBroadcastJoinThreshold", str(32 * 1024 * 1024))
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.files.maxPartitionBytes", str(16 * 1024 * 1024))
        .config("spark.sql.files.openCostInBytes", str(1 * 1024 * 1024))
    )
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def rest(path: str):
    url = f"http://localhost:4049/api/v1/{path}"
    with urllib.request.urlopen(url, timeout=10) as r:
        return json.loads(r.read())


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    n_runs = int(os.environ.get("Q160_RUNS", "5"))
    spark = get_spark_with_ui()
    spark.read.parquet(f"{sf_dir}/region.parquet").count()
    cores = spark.sparkContext.defaultParallelism
    spark.range(cores).repartition(cores).mapInPandas(lambda it: it, "id long").count()

    from las_vpe_platform_spark.queries import CATALOG

    fn = CATALOG["q160_local_bridges"][0]

    app_id = spark.sparkContext.applicationId
    runs = []
    for i in range(n_runs):
        jobs_before = {j["jobId"] for j in rest(f"applications/{app_id}/jobs")}
        j0, c0 = bench._jiffies(), bench._tree_cpu_sec()
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        unpersist_all()
        wall = time.perf_counter() - t0
        j1, c1 = bench._jiffies(), bench._tree_cpu_sec()
        st = (
            round(100.0 * (j1[1] - j0[1]) / (j1[0] - j0[0]), 2)
            if j0 and j1 and j1[0] > j0[0]
            else None
        )
        jobs_after = [j for j in rest(f"applications/{app_id}/jobs") if j["jobId"] not in jobs_before]
        stage_ids = sorted({s for j in jobs_after for s in j["stageIds"]})
        runs.append(
            {
                "run": i,
                "wall": round(wall, 3),
                "steal": st,
                "cpu_ow": round((c1 - c0) / wall, 2) if c0 is not None and c1 is not None else None,
                "stage_ids": stage_ids,
            }
        )
        print(f"run {i}: wall={wall:.2f}s steal={st} cpu_ow={runs[-1]['cpu_ow']}", file=sys.stderr)

    # stage-level detail for slowest + fastest run
    detail = {}
    for tag, run in (("slowest", max(runs, key=lambda r: r["wall"])),
                     ("fastest", min(runs, key=lambda r: r["wall"]))):
        stages = []
        for sid in run["stage_ids"]:
            try:
                for att in rest(f"applications/{app_id}/stages/{sid}"):
                    if att["status"] not in ("COMPLETE", "FAILED"):
                        continue
                    q = rest(
                        f"applications/{app_id}/stages/{sid}/{att['attemptId']}/taskSummary?quantiles=0.0,0.5,0.95,1.0"
                    )
                    stages.append(
                        {
                            "stage": sid,
                            "name": att["name"].split("\n")[0][:80],
                            "tasks": att["numCompleteTasks"],
                            "stage_ms": (att.get("executorRunTime")),
                            "task_ms_q": q.get("executorRunTime"),
                            "gc_ms_q": q.get("jvmGcTime"),
                            "spill_bytes_q": q.get("memoryBytesSpilled"),
                            "shuffle_read_q": [
                                x for x in q.get("shuffleReadMetrics", {}).get("readBytes", [])
                            ]
                            if isinstance(q.get("shuffleReadMetrics"), dict)
                            else None,
                        }
                    )
            except Exception as e:  # stage may have been skipped
                stages.append({"stage": sid, "err": str(e)[:80]})
        # keep only stages with real work, sorted by total run time
        stages = [s for s in stages if s.get("stage_ms")]
        stages.sort(key=lambda s: -(s.get("stage_ms") or 0))
        detail[tag] = {"run": run["run"], "wall": run["wall"], "stages": stages[:8]}

    # LSH band occupancy of the q160 candidate input (hot-bucket check)
    from las_vpe_platform_spark.operators.dedup import banded_signatures
    from las_vpe_platform_spark.queries_data import (
        MINHASH_BANDS,
        MINHASH_HASHES,
        MINHASH_K,
        _t,
    )

    docs = _t(spark, sf_dir, "documents")
    banded = banded_signatures(
        docs, "doc_id", "text", MINHASH_K, MINHASH_HASHES, MINHASH_BANDS
    )
    occ = (
        banded.groupBy("band")
        .count()
        .agg(
            F.count("*").alias("n_buckets"),
            F.max("count").alias("max_occ"),
            F.expr("percentile_approx(count, 0.999)").alias("p999_occ"),
            F.expr("percentile_approx(count, 0.99)").alias("p99_occ"),
            F.sum(F.col("count") * (F.col("count") - 1) / 2).alias("total_pairs_upper"),
            F.sum(
                F.when(
                    F.col("count") == F.max("count").over
                    if False
                    else F.lit(False),
                    0,
                )
            ).alias("_unused"),
        )
        .drop("_unused")
        .first()
    )
    top_buckets = (
        banded.groupBy("band").count().orderBy(F.desc("count")).limit(5).collect()
    )

    report = {
        "runs": runs,
        "stage_detail": detail,
        "lsh_occupancy": {
            "n_buckets": occ["n_buckets"],
            "max_occ": occ["max_occ"],
            "p99_occ": occ["p99_occ"],
            "p999_occ": occ["p999_occ"],
            "total_candidate_pairs_upper": int(occ["total_pairs_upper"]),
            "top5_bucket_sizes": [r["count"] for r in top_buckets],
        },
    }
    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
