#!/usr/bin/env python3
"""Round-12 measurement: split each entry's wall into driver-side
plan construction+optimization (fn() + executedPlan materialization)
vs execution (noop sink), 2 runs each. Catalyst planning is
single-threaded driver work (guide §7.3) — at sf0.1 with tiny data it
can rival execution; at 100 TB it is the same absolute cost, so
cutting it is a scale-neutral win.

Usage: python tools/plan_vs_exec.py name [name ...]
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

from las_vpe_platform_spark.operators.staging import unpersist_all  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from las_vpe_platform_spark.queries import CATALOG  # noqa: E402
    from las_vpe_platform_spark.session import get_spark  # noqa: E402

    spark = get_spark("plan_vs_exec")
    spark.read.parquet(f"{sf_dir}/region.parquet").count()
    cores = spark.sparkContext.defaultParallelism
    spark.range(cores).repartition(cores).mapInPandas(lambda it: it, "id long").count()

    for name in sys.argv[1:]:
        fn = CATALOG[name][0]
        res = []
        for i in range(2):
            spark.sparkContext.setJobDescription(f"{name} pve {i}")
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            t1 = time.perf_counter()
            df._jdf.queryExecution().executedPlan()
            t2 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            unpersist_all()
            t3 = time.perf_counter()
            res.append({
                "build_s": round(t1 - t0, 3),
                "plan_s": round(t2 - t1, 3),
                "exec_s": round(t3 - t2, 3),
                "total_s": round(t3 - t0, 3),
            })
        print(json.dumps({"name": name, "runs": res}), flush=True)


if __name__ == "__main__":
    main()
