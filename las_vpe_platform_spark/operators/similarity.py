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
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from las_vpe_platform_spark.functions.vector import cosine_similarity
from las_vpe_platform_spark.operators.joins import pairwise_similarity_topk

# exact search is the same operator as the ReID ranking join
brute_force_topk = pairwise_similarity_topk


def assign_centroids(
    vectors: DataFrame,
    centroids: DataFrame,
    id_col: str,
    vector_col: str,
    centroid_id_col: str = "centroid_id",
) -> DataFrame:
    """Assign each vector to its nearest centroid (max cosine).

    Broadcast-cross-join against the small centroid set + one window;
    ties broken by centroid id for determinism.
    """
    c = centroids.select(
        F.col(centroid_id_col), F.col(vector_col).alias("_cvec")
    )
    scored = vectors.crossJoin(F.broadcast(c)).withColumn(
        "_csim", cosine_similarity(vector_col, "_cvec")
    )
    w = W.partitionBy(id_col).orderBy(F.desc("_csim"), F.asc(centroid_id_col))
    return (
        scored.withColumn("_crank", F.row_number().over(w))
        .filter(F.col("_crank") == 1)
        .drop("_cvec", "_crank")
    )


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
    )

    # probe -> its nprobe nearest centroids
    c = centroids.select("centroid_id", F.col(vector_col).alias("_cvec"))
    probe_sel = probes.select(
        F.col(probe_key).alias("probe_key"), F.col(vector_col).alias("_pvec")
    )
    probe_buckets = (
        probe_sel.crossJoin(F.broadcast(c))
        .withColumn("_csim", cosine_similarity("_pvec", "_cvec"))
        .withColumn(
            "_crank",
            F.row_number().over(
                W.partitionBy("probe_key").orderBy(F.desc("_csim"), F.asc("centroid_id"))
            ),
        )
        .filter(F.col("_crank") <= nprobe)
        .select("probe_key", "_pvec", "centroid_id")
    )

    scored = (
        probe_buckets.join(gal_assigned, on="centroid_id")
        .withColumn("similarity", cosine_similarity("_pvec", "_gvec"))
        .select("probe_key", "gallery_key", "similarity")
    )
    w = W.partitionBy("probe_key").orderBy(F.desc("similarity"), F.asc("gallery_key"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)
