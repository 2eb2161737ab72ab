#!/usr/bin/env python3
"""Round-12 measurement: stage split of the shared MinHash-LSH
subtree (exploded_shingles -> minhash_signatures -> banded self-join
-> distinct pairs) that ~21 catalog entries pay per invocation.

Times each prefix of the pipeline with the noop sink (guide §1.4), 3
runs each, plus plan-construction/optimization time separately, and
reports Spark job/stage counts per prefix via the status tracker.
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

import bench  # noqa: E402
from las_vpe_platform_spark.operators.staging import unpersist_all  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from las_vpe_platform_spark.operators.dedup import (  # noqa: E402
        banded_signatures,
        exploded_shingles,
        minhash_lsh_candidates,
        minhash_signatures,
    )
    from las_vpe_platform_spark.queries_data import (  # noqa: E402
        MINHASH_BANDS,
        MINHASH_HASHES,
        MINHASH_K,
        _t,
    )
    from las_vpe_platform_spark.session import get_spark  # noqa: E402

    spark = get_spark("profile_lsh")
    spark.read.parquet(f"{sf_dir}/region.parquet").count()
    cores = spark.sparkContext.defaultParallelism
    spark.range(cores).repartition(cores).mapInPandas(lambda it: it, "id long").count()
    st = spark.sparkContext.statusTracker()

    docs = _t(spark, sf_dir, "documents")

    def mk_shingles():
        return exploded_shingles(docs, "doc_id", "text", MINHASH_K)

    def mk_sigs():
        return minhash_signatures(docs, "doc_id", "text", MINHASH_K, MINHASH_HASHES)

    def mk_banded():
        return banded_signatures(
            docs, "doc_id", "text", MINHASH_K, MINHASH_HASHES, MINHASH_BANDS
        )

    def mk_pairs():
        return minhash_lsh_candidates(
            docs, id_col="doc_id", text_col="text",
            shingle_k=MINHASH_K, num_hashes=MINHASH_HASHES, bands=MINHASH_BANDS,
        )

    stages = [
        ("1_exploded_shingles", mk_shingles),
        ("2_minhash_signatures", mk_sigs),
        ("3_banded_signatures", mk_banded),
        ("4_lsh_candidates", mk_pairs),
    ]
    for name, mk in stages:
        walls, plans, steals = [], [], []
        jobs0 = len(st.getJobIdsForGroup(None) or [])
        for i in range(3):
            spark.sparkContext.setJobDescription(f"lsh {name} run {i}")
            t0 = time.perf_counter()
            df = mk()
            # force analysis+optimization (driver-side) without execution
            df._jdf.queryExecution().executedPlan()
            t1 = time.perf_counter()
            j0 = bench._jiffies()
            df.write.format("noop").mode("overwrite").save()
            unpersist_all()
            t2 = time.perf_counter()
            j1 = bench._jiffies()
            plans.append(round(t1 - t0, 3))
            walls.append(round(t2 - t1, 3))
            if j0 and j1 and j1[0] > j0[0]:
                steals.append(round(100.0 * (j1[1] - j0[1]) / (j1[0] - j0[0]), 2))
        njobs = len(st.getJobIdsForGroup(None) or []) - jobs0
        print(json.dumps({
            "stage": name,
            "plan_s": plans,
            "exec_s": walls,
            "min_exec": min(walls),
            "steal": steals,
            "jobs_3runs": njobs,
        }), flush=True)


if __name__ == "__main__":
    main()
