#!/usr/bin/env python3
"""Per-stage profile of q133 (weighted All-Pairs join) at 10x — the
SCALE.md addendum chasing the 5.0x wall-clock row (VERDICT r7 #5).

Rebuilds weighted_cosine_pairs stage by stage with parquet
materialization BETWEEN stages, so each stage's wall time is isolated
(the production operator fuses them; this decomposition is for
attribution only). Same synthetic corpus family as the round-6 row:
40-word vocabulary, ~100-token docs, trigram shingles.

Usage: python tools/profile_q133.py [small_docs] [mult]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from las_vpe_platform_spark.session import get_spark

VOCAB = [f"w{i:02d}" for i in range(40)]
DOC_TOKENS = int(os.environ.get("Q133_DOC_TOKENS", "100"))
K = 3
T_NUM, T_DEN = 8, 10


def make_docs(spark, n: int):
    vocab = F.array(*[F.lit(w) for w in VOCAB])
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.array_join(
            F.transform(
                F.sequence(F.lit(1), F.lit(DOC_TOKENS)),
                lambda i: F.element_at(
                    vocab, (F.pmod(F.hash(F.col("id") * 1000 + i), 40) + 1).cast("int")
                ),
            ),
            " ",
        ).alias("text"),
    )


def timed(label, df, path, stats):
    t0 = time.perf_counter()
    df.write.mode("overwrite").parquet(path)
    wall = round(time.perf_counter() - t0, 2)
    n = df.sparkSession.read.parquet(path).count()
    stats[label] = {"wall_s": wall, "rows": n}
    return df.sparkSession.read.parquet(path)


def profile(spark, n_docs: int, root: str) -> dict:
    from las_vpe_platform_spark.operators.dedup import exploded_shingles

    stats: dict = {}
    docs = make_docs(spark, n_docs)

    ex = timed(
        "1_explode", exploded_shingles(docs, "doc_id", "text", K),
        f"{root}/ex", stats,
    )
    base_df = (
        ex.withColumn("_df", F.count(F.lit(1)).over(W.partitionBy("shingle")))
        .withColumn("w", F.expr("1000 div _df").cast("bigint"))
        .filter(F.col("w") > 0)
        .withColumn("na2", F.sum(F.col("w") * F.col("w")).over(W.partitionBy("doc_id_")))
        .withColumn("uw", F.col("w").cast("double") / F.sqrt(F.col("na2").cast("double")))
        .withColumn("cmax", F.max("uw").over(W.partitionBy("shingle")))
    )
    base = timed("2_base_windows", base_df, f"{root}/base", stats)

    thr = T_NUM / T_DEN
    ws = (
        W.partitionBy("doc_id_")
        .orderBy(F.asc("_df"), F.asc("shingle"))
        .rowsBetween(W.currentRow, W.unboundedFollowing)
    )
    prefix_df = (
        base.withColumn("_sb", F.sum(F.col("uw") * F.col("cmax")).over(ws))
        .filter(F.col("_sb") >= F.lit(thr - 1e-9))
        .select("doc_id_", "shingle")
    )
    prefix = timed("3_prefix_bound", prefix_df, f"{root}/prefix", stats)

    cand_df = (
        prefix.selectExpr("doc_id_ AS id_a", "shingle")
        .join(prefix.selectExpr("doc_id_ AS id_b", "shingle"), on="shingle")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .dropDuplicates()
    )
    cand = timed("4_candidates", cand_df, f"{root}/cand", stats)

    pa = base.selectExpr("doc_id_ AS id_a", "shingle", "w AS _wa", "na2 AS _na2")
    pb = base.selectExpr("doc_id_ AS id_b", "shingle", "w AS _wb", "na2 AS _nb2")
    dots = (
        cand.join(pa, on="id_a")
        .join(pb, on=["id_b", "shingle"])
        .groupBy("id_a", "id_b")
        .agg(
            F.sum(F.col("_wa") * F.col("_wb")).alias("dot"),
            F.min("_na2").alias("na2"),
            F.min("_nb2").alias("nb2"),
        )
        .filter(
            (F.col("dot") >= 0)
            & (
                F.lit(T_DEN * T_DEN) * F.col("dot") * F.col("dot")
                >= F.lit(T_NUM * T_NUM) * F.col("na2") * F.col("nb2")
            )
        )
    )
    timed("5_verify", dots, f"{root}/out", stats)
    return stats


def main() -> None:
    small = int(sys.argv[1]) if len(sys.argv) > 1 else 5000
    mult = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    spark = get_spark("profile_q133", cpus=8)
    root = tempfile.mkdtemp(prefix="q133_prof_")
    out = {}
    for label, n in (("1x", small), (f"{mult}x", small * mult)):
        out[label] = profile(spark, n, f"{root}/{label}")
    print("| stage | 1x wall / rows | 10x wall / rows | ratio |")
    print("|---|---|---|---|")
    for stage in out["1x"]:
        a, b = out["1x"][stage], out[f"{mult}x"][stage]
        r = round(b["wall_s"] / max(a["wall_s"], 0.01), 1)
        print(
            f"| {stage} | {a['wall_s']} s / {a['rows']} | "
            f"{b['wall_s']} s / {b['rows']} | {r}x |"
        )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
