#!/usr/bin/env python3
"""Round-12 measurement: compare shingle-construction strategies for
the shared MinHash-LSH subtree (guide §1.1 first-principles vs §2.4
remove-shuffles-outright).

Variants, timed end-to-end with the noop sink at $SPARK_GRAFT_SF_DIR:

  A. current: exploded_shingles (posexplode + lead window, ONE token
     shuffle by doc_id, windowed concat, dropDuplicates) ->
     minhash signatures (grouped MIN reusing the doc_id partitioning)
  B. zip-stream: slice+arrays_zip+explode per row (NO exchange before
     the aggregate), non-distinct shingles straight into the grouped
     MIN (per-doc MIN is duplicate-insensitive; the DuckDB oracle
     aggregates the non-distinct stream too) with map-side partials
  C. HOF-stream: word_shingles-style transform(sequence) WITHOUT
     array_distinct, exploded, into the grouped MIN (the interpreted-
     lambda alternative the r5 docstring measured 2.4x slower -
     re-measured here against the no-shuffle framing)
  D/E. distinct postings: current exploded_shingles vs zip-stream +
     dropDuplicates (for consumers that DO need distinct (doc,shingle))

Also checks B/C produce signatures bit-equal to A, and E's rows equal
D's, before any timing is trusted.
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

from pyspark.sql import DataFrame, functions as F  # noqa: E402

from las_vpe_platform_spark.operators.staging import unpersist_all  # noqa: E402


def zip_shingle_stream(df: DataFrame, id_col: str, text_col: str, k: int) -> DataFrame:
    base = df.select(
        F.col(id_col).alias("doc_id_"),
        F.array_remove(F.split(F.trim(F.col(text_col)), r"\s+"), "").alias("_toks"),
    )
    L = F.greatest(F.size("_toks") - F.lit(k - 1), F.lit(0))
    zipped = F.arrays_zip(*[F.slice("_toks", i + 1, L) for i in range(k)])
    out = base.select("doc_id_", F.explode(zipped).alias("_sh"))
    return out.select(
        "doc_id_",
        F.concat_ws(" ", *[F.col("_sh").getField(str(i)) for i in range(k)]).alias(
            "shingle"
        ),
    )


def hof_shingle_stream(df: DataFrame, id_col: str, text_col: str, k: int) -> DataFrame:
    toks = F.filter(
        F.split(F.trim(F.col(text_col)), r"\s+"), lambda t: t != F.lit("")
    )
    base = df.select(F.col(id_col).alias("doc_id_"), toks.alias("_toks"))
    n = F.size("_toks")
    idx = F.when(n >= k, F.sequence(F.lit(1), n - (k - 1))).otherwise(
        F.array_repeat(F.lit(1), 0)
    )
    sh = F.transform(idx, lambda i: F.concat_ws(" ", F.slice("_toks", i, k)))
    return base.select("doc_id_", F.explode(sh).alias("shingle"))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    runs = int(os.environ.get("RUNS", "3"))
    from las_vpe_platform_spark.operators.dedup import (  # noqa: E402
        exploded_shingles,
    )
    from las_vpe_platform_spark.functions.text import (  # noqa: E402
        MINHASH_COEFFS,
        MINHASH_PRIME,
        shingle_hash60,
    )
    from las_vpe_platform_spark.queries_data import (  # noqa: E402
        MINHASH_HASHES,
        MINHASH_K,
        _t,
    )
    from las_vpe_platform_spark.session import get_spark  # noqa: E402

    spark = get_spark("profile_shingles")
    spark.read.parquet(f"{sf_dir}/region.parquet").count()
    cores = spark.sparkContext.defaultParallelism
    spark.range(cores).repartition(cores).mapInPandas(lambda it: it, "id long").count()

    docs = _t(spark, sf_dir, "documents")

    def sigs_over(exploded: DataFrame) -> DataFrame:
        h = shingle_hash60("shingle")
        lo = h.bitwiseAND(F.lit((1 << 30) - 1))
        hi = F.shiftright(h, 30)
        hashed = exploded.select("doc_id_", lo.alias("_lo"), hi.alias("_hi"))
        mins = [
            F.min(
                (F.lit(a) * F.col("_lo") + F.lit(b) * F.col("_hi") + F.lit(c))
                % MINHASH_PRIME
            ).alias(f"mh{i}")
            for i, (a, b, c) in enumerate(MINHASH_COEFFS[:MINHASH_HASHES])
        ]
        return hashed.groupBy("doc_id_").agg(*mins)

    variants = {
        "A_sigs_window_distinct": lambda: sigs_over(
            exploded_shingles(docs, "doc_id", "text", MINHASH_K)
        ),
        "B_sigs_zip_stream": lambda: sigs_over(
            zip_shingle_stream(docs, "doc_id", "text", MINHASH_K)
        ),
        "C_sigs_hof_stream": lambda: sigs_over(
            hof_shingle_stream(docs, "doc_id", "text", MINHASH_K)
        ),
        "D_postings_window": lambda: exploded_shingles(
            docs, "doc_id", "text", MINHASH_K
        ),
        "E_postings_zip_dedup": lambda: zip_shingle_stream(
            docs, "doc_id", "text", MINHASH_K
        ).dropDuplicates(["doc_id_", "shingle"]),
    }

    # --- equivalence gates first -----------------------------------------
    a = variants["A_sigs_window_distinct"]().cache()
    for name in ("B_sigs_zip_stream", "C_sigs_hof_stream"):
        other = variants[name]()
        diff = a.exceptAll(other).count() + other.exceptAll(a).count()
        print(json.dumps({"equiv": name, "vs": "A", "diff_rows": diff}))
        assert diff == 0, f"{name} signatures differ from A"
    d = variants["D_postings_window"]().cache()
    e = variants["E_postings_zip_dedup"]()
    diff = d.exceptAll(e).count() + e.exceptAll(d).count()
    print(json.dumps({"equiv": "E_postings_zip_dedup", "vs": "D", "diff_rows": diff}))
    assert diff == 0
    a.unpersist()
    d.unpersist()

    # --- timing ----------------------------------------------------------
    for name, mk in variants.items():
        walls = []
        for _ in range(runs):
            t0 = time.perf_counter()
            mk().write.format("noop").mode("overwrite").save()
            unpersist_all()
            walls.append(round(time.perf_counter() - t0, 3))
        print(json.dumps({"variant": name, "walls": walls, "min": min(walls)}))


if __name__ == "__main__":
    main()
