"""Similarity search over embedding columns (ANN for J9 at scale).

The reference's pairwise comparer (J9,
ExternPedestrianComparerUsingAttr.java:170-194) is an O(probes ×
gallery) primitive; at 100 TB the gallery side must be pruned. Two
paths:

- ``brute_force_topk`` — exact: broadcast the (small) probe set,
  score the full gallery scan, per-probe top-k. Linear in gallery,
  no gallery shuffle. The correctness baseline.
- ``ivf_topk`` — IVF-style approximate: pick deterministic centroid
  rows, assign every vector to its nearest centroid (broadcast
  centroids), then search only the probe's ``nprobe`` nearest
  centroid buckets. Equi-join on centroid id replaces the cross
  product; recall < 1 by design, deterministic given the centroid
  choice (so still oracle-checkable).

All cosine scoring precomputes L2 norms once per vector below the
join (bit-identical results, one fold per row instead of three per
pair).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from las_vpe_platform_spark.functions.vector import dot_product, l2_norm
from las_vpe_platform_spark.operators.joins import pairwise_similarity_topk

# exact search is the same operator as the ReID ranking join
brute_force_topk = pairwise_similarity_topk


def _nearest_centroids(
    vectors: DataFrame,
    centroids: DataFrame,
    id_col: str,
    vector_col: str,
    keep: int,
) -> DataFrame:
    """Rank centroids per vector by cosine (norms precomputed), keep
    the best ``keep``; ties broken by centroid id."""
    c = F.broadcast(
        centroids.select(
            "centroid_id", F.col(vector_col).alias("_cvec")
        ).withColumn("_cnorm", l2_norm("_cvec"))
    )
    v = vectors.withColumn("_vnorm", l2_norm(vector_col))
    scored = v.crossJoin(c).withColumn(
        "_csim", dot_product(vector_col, "_cvec") / (F.col("_vnorm") * F.col("_cnorm"))
    )
    w = W.partitionBy(id_col).orderBy(F.desc("_csim"), F.asc("centroid_id"))
    return (
        scored.withColumn("_crank", F.row_number().over(w))
        .filter(F.col("_crank") <= keep)
        .drop("_cvec", "_cnorm", "_vnorm", "_csim", "_crank")
    )


def assign_centroids(
    vectors: DataFrame,
    centroids: DataFrame,
    id_col: str,
    vector_col: str,
    centroid_id_col: str = "centroid_id",
) -> DataFrame:
    """Assign each vector to its single nearest centroid."""
    cents = centroids.withColumnRenamed(centroid_id_col, "centroid_id")
    return _nearest_centroids(vectors, cents, id_col, vector_col, keep=1)


def ivf_topk(
    probes: DataFrame,
    gallery: DataFrame,
    probe_key: str,
    gallery_key: str,
    vector_col: str = "embedding",
    k: int = 5,
    num_centroids_mod: int = 50,
    nprobe: int = 2,
) -> DataFrame:
    """Approximate per-probe top-k via IVF bucketing.

    Centroids = gallery rows where ``key % num_centroids_mod == 0``
    (deterministic, seedless — reproducible in SQL). Gallery vectors
    are assigned to their nearest centroid; probes search their
    ``nprobe`` nearest centroid buckets only.
    """
    centroids = gallery.filter(
        (F.col(gallery_key) % num_centroids_mod) == 0
    ).select(F.col(gallery_key).alias("centroid_id"), F.col(vector_col))

    gal_assigned = assign_centroids(
        gallery.select(F.col(gallery_key), F.col(vector_col)),
        centroids,
        id_col=gallery_key,
        vector_col=vector_col,
    ).select(
        F.col(gallery_key).alias("gallery_key"),
        F.col(vector_col).alias("_gvec"),
        "centroid_id",
    ).withColumn("_gnorm", l2_norm("_gvec"))

    probe_buckets = _nearest_centroids(
        probes.select(F.col(probe_key).alias("probe_key"), F.col(vector_col).alias("_pvec")),
        centroids.withColumnRenamed(vector_col, "_pvec"),
        id_col="probe_key",
        vector_col="_pvec",
        keep=nprobe,
    ).withColumn("_pnorm", l2_norm("_pvec"))

    scored = (
        probe_buckets.join(gal_assigned, on="centroid_id")
        .withColumn(
            "similarity",
            dot_product("_pvec", "_gvec") / (F.col("_pnorm") * F.col("_gnorm")),
        )
        .select("probe_key", "gallery_key", "similarity")
    )
    w = W.partitionBy("probe_key").orderBy(F.desc("similarity"), F.asc("gallery_key"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)
