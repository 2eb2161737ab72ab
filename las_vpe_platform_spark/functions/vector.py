"""Vector column functions over array<float>/array<double> embeddings.

The reference's Feature1024 (alg/pedestrian/reid/Feature1024.java:27-106)
stores 1024 floats as bytes and compares pedestrians via a socket-
offloaded similarity primitive (J9). Here vectors are native array
columns and similarity is a JVM-side fold — no Python, no sockets.

All math is done in double precision (elements cast on entry) so
results match a DuckDB oracle to ~1e-12.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def dot_product(a: Column | str, b: Column | str) -> Column:
    """Elementwise dot product via zip_with + aggregate (codegen'd)."""
    za = F.zip_with(_col(a), _col(b), lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(za, F.lit(0.0), lambda acc, v: acc + v)


def l2_norm(a: Column | str) -> Column:
    """Euclidean norm."""
    sq = F.aggregate(
        _col(a), F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")
    )
    return F.sqrt(sq)


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    """cosine(a, b); null-safe zero denominators return NULL."""
    denom = l2_norm(a) * l2_norm(b)
    return F.when(denom > 0, dot_product(a, b) / denom)
