#!/usr/bin/env python3
"""Local scaling experiment (SCALE.md's measured table).

Generates deterministic synthetic events (driver schema, spark.range +
hash-derived columns — no external data) at two sizes and times three
representative operators warm. Usage:

    python tools/scale_experiment.py [small_rows] [big_rows]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from las_vpe_platform_spark.operators.asof import asof_join
from las_vpe_platform_spark.session import get_spark

EVENT_TYPES = ["click", "view", "purchase", "signup", "error"]


def make_events(spark, n_rows: int, path: str) -> None:
    df = (
        spark.range(n_rows)
        .withColumn("event_id", F.col("id"))
        .withColumn("ts", F.timestamp_micros(F.lit(1_704_067_200_000_000) + F.col("id") * 25_000))
        .withColumn("user_id", F.pmod(F.hash("id"), F.lit(50_000)).cast("long"))
        .withColumn(
            "event_type",
            F.element_at(
                F.array(*[F.lit(x) for x in EVENT_TYPES]),
                (F.pmod(F.hash(F.col("id") + 7), F.lit(5)) + 1).cast("int"),
            ),
        )
        .withColumn("value", F.pmod(F.hash(F.col("id") + 13), F.lit(100_000)) / 100.0)
        .drop("id")
    )
    df.write.mode("overwrite").parquet(path)


def bench(spark, path: str) -> dict[str, float]:
    ev = spark.read.parquet(path)
    out: dict[str, float] = {}

    t0 = time.perf_counter()
    ev.groupBy(F.date_trunc("minute", "ts"), "event_type").agg(
        F.count(F.lit(1)), F.sum("value")
    ).write.format("noop").mode("overwrite").save()
    out["minutely_agg"] = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.col("ts").cast("long") - F.lag(F.col("ts").cast("long")).over(w)
    (
        ev.withColumn("new_s", F.when(gap > 1800, 1).otherwise(0))
        .groupBy("user_id")
        .agg((F.sum("new_s") + 1).alias("n_sessions"), F.count(F.lit(1)))
        .write.format("noop")
        .mode("overwrite")
        .save()
    )
    out["sessionize"] = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    p = ev.filter(F.col("event_type") == "purchase").select("event_id", "user_id", "ts")
    c = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("click_id"))
    )
    asof_join(p, c, on="ts", by=["user_id"], right_value_cols=["click_id"]).write.format(
        "noop"
    ).mode("overwrite").save()
    out["asof_join"] = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    from las_vpe_platform_spark.operators.joins import range_join

    windows = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("p_start"),
        (F.col("ts") + F.expr("INTERVAL 30 MINUTES")).alias("p_end"),
    )
    points = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("event_id").alias("click_id"), "ts"
    )
    range_join(
        points, windows, left_point="ts", right_start="p_start",
        right_end="p_end", by=["user_id"], bucket_seconds=1800,
    ).groupBy("user_id").count().write.format("noop").mode("overwrite").save()
    out["range_join"] = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    from las_vpe_platform_spark.operators.dedup import winnow_fingerprints

    docs = ev.select(
        F.col("event_id").alias("doc_id"),
        F.concat_ws(
            " ", "event_type", F.col("value").cast("string"),
            F.col("user_id").cast("string"), F.col("ts").cast("string"),
        ).alias("text"),
    )
    winnow_fingerprints(docs, "doc_id", "text").selectExpr(
        "doc_id", "size(fingerprints) AS n"
    ).write.format("noop").mode("overwrite").save()
    out["winnow"] = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    from las_vpe_platform_spark.operators.aggregates import hll_distinct

    hll_distinct(ev, ["event_type"], "user_id", m=64).write.format(
        "noop"
    ).mode("overwrite").save()
    out["hll_sketch"] = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    # q89 shape: corpus-sized word groupBy, pair explode on the vocab only
    words = ev.select(
        F.explode(
            F.split(F.concat_ws(" ", "event_type", F.col("user_id").cast("string")), " ")
        ).alias("w")
    ).filter(F.length("w") >= 2)
    wf = words.groupBy("w").agg(F.count(F.lit(1)).alias("freq"))
    (
        wf.select(
            "w", "freq",
            F.explode(F.sequence(F.lit(1), F.length("w") - 1)).alias("i"),
        )
        .select(
            F.col("w").substr(F.col("i"), F.lit(1)).alias("a"),
            F.col("w").substr(F.col("i") + 1, F.lit(1)).alias("b"),
            "freq",
        )
        .groupBy("a", "b")
        .agg(F.sum("freq"))
        .write.format("noop")
        .mode("overwrite")
        .save()
    )
    out["bpe_pairs"] = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    # q108 shape: per-user ordered window (lead x2) + trigram aggregate
    w108 = W.partitionBy("user_id").orderBy("ts", "event_id")
    (
        ev.select(
            "user_id",
            F.col("event_type").alias("e1"),
            F.lead("event_type", 1).over(w108).alias("e2"),
            F.lead("event_type", 2).over(w108).alias("e3"),
        )
        .filter(F.col("e3").isNotNull())
        .groupBy("e1", "e2", "e3")
        .agg(F.count(F.lit(1)).alias("n"), F.countDistinct("user_id"))
        .orderBy(F.desc("n"), "e1", "e2", "e3")
        .limit(15)
        .write.format("noop")
        .mode("overwrite")
        .save()
    )
    out["event_trigrams"] = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    # q109 shape: first-seen per user, join back, cohort x age counts
    days = ev.select("user_id", F.to_date("ts").alias("day"))
    first = days.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    aged = (
        days.join(first, "user_id")
        .select("user_id", "cohort_day", F.datediff("day", "cohort_day").alias("age"))
        .distinct()
    )
    sizes = aged.filter("age = 0").groupBy("cohort_day").count()
    (
        aged.groupBy("cohort_day", "age")
        .count()
        .join(F.broadcast(sizes.withColumnRenamed("count", "sz")), "cohort_day")
        .write.format("noop")
        .mode("overwrite")
        .save()
    )
    out["cohort_retention"] = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    # q115 shape: one user-keyed window + types² aggregate + entropy
    w115 = W.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        ev.select(
            F.col("event_type").alias("e1"),
            F.lead("event_type", 1).over(w115).alias("e2"),
        )
        .filter(F.col("e2").isNotNull())
        .groupBy("e1", "e2")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    tot = pairs.groupBy("e1").agg(F.sum("c").alias("n"))
    (
        pairs.join(F.broadcast(tot), "e1")
        .withColumn("p", F.col("c") / F.col("n"))
        .groupBy("e1")
        .agg((-F.sum(F.col("p") * F.log2("p"))).alias("h"))
        .write.format("noop")
        .mode("overwrite")
        .save()
    )
    out["transition_entropy"] = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    # q112 shape: rarest-bigram anchor join + instr verify. Synthetic
    # docs are hash-unique in their value token, so rarest-bigram df
    # ~ 1 and candidate mass stays linear — the operator's design case
    from las_vpe_platform_spark.operators.dedup import containment_pairs

    docs112 = ev.select(
        F.col("event_id").alias("doc_id"),
        F.concat_ws(
            " ", "event_type", F.col("user_id").cast("string"),
            F.col("value").cast("string"),
        ).alias("text"),
    )
    containment_pairs(docs112, "doc_id", "text").groupBy().count().write.format(
        "noop"
    ).mode("overwrite").save()
    from las_vpe_platform_spark.operators.staging import unpersist_all

    unpersist_all()
    out["containment"] = round(time.perf_counter() - t0, 2)
    return out


def make_vectors(spark, n_rows: int, dim: int, path: str) -> None:
    """Deterministic synthetic gallery: hash-derived float coordinates."""
    spark.range(n_rows).select(
        F.col("id").alias("vec_id"),
        F.expr(
            f"transform(sequence(1, {dim}),"
            " i -> CAST(pmod(hash(id * 64 + i), 2000) - 1000 AS FLOAT) / 1000.0)"
        ).alias("embedding"),
    ).write.mode("overwrite").parquet(path)


def bench_vectors(spark, path: str, n_probes: int = 500) -> dict[str, float]:
    """BLAS pairwise top-k: cost must scale linearly with gallery rows
    (probes fixed) — the d14/q27 ranking path at fleet scale."""
    from las_vpe_platform_spark.operators.joins import pairwise_similarity_topk

    gal = spark.read.parquet(path)
    probes = gal.limit(n_probes)
    t0 = time.perf_counter()
    pairwise_similarity_topk(
        probes, gal, probe_key="vec_id", gallery_key="vec_id",
        vector_col="embedding", k=10,
    ).write.format("noop").mode("overwrite").save()
    out = {"blas_topk": round(time.perf_counter() - t0, 2)}

    t0 = time.perf_counter()
    # q114 shape: the one-pass Gramian aggregate over the SYMMETRIC
    # j >= i triangle (the slice-explode q114 actually runs; the
    # shuffle is ≤ d²/2 rows REGARDLESS of input size)
    (
        gal.select(F.posexplode("embedding").alias("i", "xi"), "embedding")
        .select(
            "i", F.col("xi").cast("double").alias("xi"),
            F.posexplode(F.expr("slice(embedding, i + 1, 64 - i)")).alias(
                "j0", "xj"
            ),
        )
        .select("i", "xi", (F.col("i") + F.col("j0")).alias("j"),
                F.col("xj").cast("double").alias("xj"))
        .groupBy("i", "j")
        .agg(F.sum(F.col("xi") * F.col("xj")), F.count(F.lit(1)))
        .write.format("noop")
        .mode("overwrite")
        .save()
    )
    out["pca_gramian"] = round(time.perf_counter() - t0, 2)
    return out


def main() -> None:
    small = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    big = int(sys.argv[2]) if len(sys.argv) > 2 else 10_000_000
    spark = get_spark("scale-experiment")
    make_events(spark, small, "/tmp/scale_exp_small")
    make_events(spark, big, "/tmp/scale_exp_big")
    bench(spark, "/tmp/scale_exp_small")  # warm
    r_small = bench(spark, "/tmp/scale_exp_small")
    r_big = bench(spark, "/tmp/scale_exp_big")
    make_vectors(spark, small // 10, 64, "/tmp/scale_exp_vec_small")
    make_vectors(spark, big // 10, 64, "/tmp/scale_exp_vec_big")
    bench_vectors(spark, "/tmp/scale_exp_vec_small")  # warm
    r_small.update(bench_vectors(spark, "/tmp/scale_exp_vec_small"))
    r_big.update(bench_vectors(spark, "/tmp/scale_exp_vec_big"))
    print(f"{small} rows:", r_small)
    print(f"{big} rows:", r_big)
    print("ratios:", {k: round(r_big[k] / max(r_small[k], 0.01), 1) for k in r_small})


if __name__ == "__main__":
    main()
