"""Join operators (SURVEY §2.4 J1-J9).

The reference's relational centerpiece is the ReID dual-source join
(PedestrianReIDUsingAttrApp.java:136-243): a per-batch full outer join
plus two manual 600 s late-data re-join windows (J1-J6). In batch that
is exactly one full outer join; in streaming, one watermarked
stream-stream join (see streaming/engine.py). The pairwise comparison
primitive (J9, ExternPedestrianComparerUsingAttr.java:170-194) becomes
a crossJoin + similarity expression + per-probe top-k window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W


def full_outer_assemble(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    how: str = "full_outer",
) -> DataFrame:
    """Tracklet ⨝ Attributes assembly (J1+J6).

    The reference unions instant matches with two windowed late-data
    re-joins (J4/J5); in one Spark plan the union collapses into a
    single join — matched rows have both sides, unmatched rows carry
    nulls exactly like the reference's outer remainders.
    """
    return left.join(right, on=on, how=how)


def point_lookup(df: DataFrame, key_col: str, key_value) -> DataFrame:
    """Point query by key (J8 / S9 Neo4j MATCH-by-id analog).

    A filter, not a join: partition pruning + parquet min/max row-group
    skipping make this the fast path at scale.
    """
    return df.filter(F.col(key_col) == F.lit(key_value))


def pairwise_similarity_topk(
    probes: DataFrame,
    gallery: DataFrame,
    probe_key: str,
    gallery_key: str,
    vector_col: str = "embedding",
    k: int = 10,
) -> DataFrame:
    """Probe-vs-gallery similarity ranking (J9 + W1/W2).

    crossJoin of probes × gallery with a JVM-side cosine expression,
    then per-probe top-k via window rank — the batch re-expression of
    the socket-offloaded comparer + IDRANK output
    (PedestrianReIDer.java:38, PedestrianReIDUsingAttrApp.java:226-228).

    Norms are precomputed per vector BEFORE the cross product (one fold
    per row instead of one per pair — same bits, 3x less work), so the
    per-pair expression is the dot product alone.

    Scale: the probe side is broadcast (probes are few); for gallery ×
    gallery workloads use the LSH variants in operators/similarity.py.
    """
    from las_vpe_platform_spark.functions.vector import dot_product, l2_norm

    p = probes.select(
        F.col(probe_key).alias("probe_key"),
        F.col(vector_col).alias("_pvec"),
    ).withColumn("_pnorm", l2_norm("_pvec"))
    g = gallery.select(
        F.col(gallery_key).alias("gallery_key"),
        F.col(vector_col).alias("_gvec"),
    ).withColumn("_gnorm", l2_norm("_gvec"))
    denom = F.col("_pnorm") * F.col("_gnorm")
    scored = (
        F.broadcast(p)
        .crossJoin(g)
        .withColumn(
            "similarity",
            F.when(denom > 0, dot_product("_pvec", "_gvec") / denom),
        )
        .drop("_pvec", "_gvec", "_pnorm", "_gnorm")
    )
    w = W.partitionBy("probe_key").orderBy(F.desc("similarity"), F.asc("gallery_key"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )
