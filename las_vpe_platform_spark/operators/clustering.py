"""Distributed k-means (Lloyd) over embedding columns.

The production companion to the SemDeDup kept-set operator
(similarity.semantic_dedup_keep): SemDeDup's paper clusters with
k-means before within-cluster pruning; the SRP buckets there are the
training-free stand-in. This module is the trained-clusters path,
shaped for Spark's execution model:

- centroids live in a k-row frame BROADCAST to every assignment task
  (k is small; the data never shuffles for assignment),
- each Lloyd iteration is ONE grouped aggregation keyed by (cluster,
  position) with map-side partials — the classic MapReduce k-means,
- iteration count is fixed and unrolled, so the whole refinement is a
  finite Catalyst plan chain, checkpoint-free at these depths.

Engine determinism: coordinates are lifted to 2^30 fixed-point BIGINTs
before any aggregation (the q57 PageRank trick), so per-cluster sums
are order-independent exact integers and both engines derive
bit-identical centroids -> identical assignments. Float means would
accumulate in shuffle order and could flip a boundary assignment
between engines.

Initialization is the md5 hash-order of the id column (take the k
hash-smallest vectors): deterministic, engine-portable, and unbiased
with respect to the data layout — the k-means++ upgrade is a seeding
swap, not a structural change.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W

FIXED_POINT = 1 << 30


def kmeans_assign(
    vectors: DataFrame,
    id_col: str,
    vector_col: str,
    k: int = 8,
    iterations: int = 2,
) -> DataFrame:
    """Lloyd k-means; returns (id, cluster) after ``iterations``
    refinement steps from md5 hash-order seeds.

    Per iteration: assignment is a broadcast crossJoin against the
    k-row centroid frame (argmin via min_by over an exact-integer
    distance), and the update is one (cluster, position) grouped SUM
    of fixed-point BIGINTs. Shuffle volume per iteration is
    k x dim + N assignment rows — never a vector exchange.
    """
    if iterations < 1:  # ValueError, not assert: must survive python -O
        raise ValueError("kmeans_assign requires iterations >= 1")
    fp = vectors.select(
        F.col(id_col).alias("_id"),
        F.expr(
            f"transform({vector_col},"
            f" x -> CAST(floor(CAST(x AS DOUBLE) * {FIXED_POINT}.0D + 0.5D)"
            " AS BIGINT))"
        ).alias("_vfp"),
    )
    # hash-order seeding: the k vectors with the smallest md5(id).
    # The global row_number window runs on the k-row seed frame only
    # (post-limit), so the single-partition sort it implies is k rows.
    seeds = (
        fp.withColumn("_h", F.md5(F.col("_id").cast("string")))
        .orderBy("_h", "_id")
        .limit(k)
    )
    cents = seeds.withColumn(
        "cluster", F.row_number().over(W.orderBy("_h", "_id")) - 1
    ).select("cluster", F.col("_vfp").alias("_cfp"))

    dist = (
        "aggregate(zip_with(_vfp, _cfp, (x, c) ->"
        " (CAST(x AS DOUBLE) - c) * (CAST(x AS DOUBLE) - c)),"
        " CAST(0 AS DOUBLE), (acc, v) -> acc + v)"
    )
    for _ in range(iterations):
        cfp_double = cents.select(
            "cluster",
            F.expr("transform(_cfp, c -> CAST(c AS DOUBLE))").alias("_cfp"),
        )
        assigned = (
            fp.crossJoin(F.broadcast(cfp_double))
            .withColumn("_dist", F.expr(dist))
            .groupBy("_id")
            .agg(
                F.min_by("cluster", F.struct("_dist", "cluster")).alias("cluster")
            )
        )
        sums = (
            assigned.join(fp, on="_id")
            .select("cluster", F.posexplode("_vfp").alias("pos", "val"))
            .groupBy("cluster", "pos")
            .agg(F.sum("val").alias("s"), F.count(F.lit(1)).alias("n"))
        )
        cents = (
            sums.withColumn("m", F.col("s").cast("double") / F.col("n"))
            .groupBy("cluster")
            .agg(
                F.array_sort(F.collect_list(F.struct("pos", "m")))
                .getField("m")
                .alias("_cfp")
            )
        )
    return assigned.select(
        F.col("_id").alias(id_col), F.col("cluster").cast("int").alias("cluster")
    )


def kmeans_assign_sql(
    table: str,
    id_col: str,
    vector_col: str,
    dim: int,
    k: int = 8,
    iterations: int = 2,
) -> str:
    """DuckDB mirror of :func:`kmeans_assign`: same fixed-point lift,
    same hash-order seeds, same unrolled iterations."""
    parts = [
        f"""_fp AS (
  SELECT {id_col} AS _id,
         list_transform({vector_col},
                        x -> CAST(floor(x::DOUBLE * {FIXED_POINT}.0 + 0.5)
                                  AS BIGINT)) AS _vfp
  FROM {table}
)""",
        f"""_c0 AS (
  SELECT (row_number() OVER (ORDER BY md5(_id::VARCHAR), _id) - 1) AS cluster,
         list_transform(_vfp, c -> c::DOUBLE) AS _cfp
  FROM (SELECT * FROM _fp ORDER BY md5(_id::VARCHAR), _id LIMIT {k})
)""",
    ]
    prev = "_c0"
    dist = (
        f"list_sum(list_transform(generate_series(1, {dim}),"
        " i -> (f._vfp[i]::DOUBLE - c._cfp[i]) * (f._vfp[i]::DOUBLE - c._cfp[i])))"
    )
    assigned = None
    for it in range(iterations):
        assigned = f"_a{it}"
        parts.append(f"""{assigned} AS (
  SELECT _id, cluster FROM (
    SELECT f._id, c.cluster,
           row_number() OVER (PARTITION BY f._id
                              ORDER BY {dist}, c.cluster) AS rn
    FROM _fp f CROSS JOIN {prev} c
  ) WHERE rn = 1
)""")
        nxt = f"_c{it + 1}"
        parts.append(f"""{nxt} AS (
  SELECT cluster, list(m ORDER BY pos) AS _cfp FROM (
    SELECT a.cluster, t.i AS pos, sum(f._vfp[t.i])::DOUBLE / count(*) AS m
    FROM {assigned} a JOIN _fp f USING (_id),
         unnest(generate_series(1, {dim})) AS t(i)
    GROUP BY a.cluster, t.i
  ) GROUP BY cluster
)""")
        prev = nxt
    ctes = ",\n".join(parts)
    return f"""
WITH {ctes}
SELECT _id AS {id_col}, cluster::INT AS cluster FROM {assigned}
"""
