"""Binary pack/unpack functions (SURVEY §2.8 F2/F10).

The reference moves three binary layouts around:
- ``Feature1024``: 1024 float32s as 4096 little-endian bytes
  (alg/pedestrian/reid/Feature1024.java:93-106)
- ``BoundingBox.toBytes()``: 16-byte header (x,y,w,h int32) + BGR
  pixels (Tracklet.java:244-254)
- DeepMAR FC8 output: a float[] mapped positionally onto the 125 named
  attribute fields via ATTR_LIST (DeepMAR.java:144-159, 164-289)

Float <-> byte conversions have no JVM builtin, so they run as
Arrow-batched pandas UDFs (numpy frombuffer/tobytes — vectorized, no
per-row Python loops); the FC8 name mapping is a pure projection.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from las_vpe_platform_spark.schemas import ATTRIBUTE_NAMES


def fill_attributes(vec: Column | str, prefix_cols: list[str] | None = None):
    """FC8 float array -> the 125 named attribute columns (F2).

    ``select(*fill_attributes("fc8"))`` — pure column mapping, the
    Spark form of DeepMAR.fillAttributes' reflection loop.
    """
    c = F.col(vec) if isinstance(vec, str) else vec
    return [c.getItem(i).alias(name) for i, name in enumerate(ATTRIBUTE_NAMES)]


# NB: pandas_udf construction needs an active SparkSession in Spark 4,
# so the UDFs are built lazily on first use and cached.
_UDF_CACHE: dict[str, object] = {}


def _unpack_feature_fn(b: pd.Series) -> pd.Series:
    # ONE frombuffer over the whole Arrow batch, then split — the
    # float decode never runs per row
    import numpy as np

    mask = b.notna().to_numpy()
    out: list = [None] * len(b)
    vals = b.to_numpy()[mask]
    if len(vals):
        flat = np.frombuffer(b"".join(vals), dtype="<f4")
        lens = np.fromiter((len(v) >> 2 for v in vals), dtype=np.int64, count=len(vals))
        parts = np.split(flat, np.cumsum(lens)[:-1])
        for i, p in zip(np.flatnonzero(mask), parts):
            out[i] = p
    return pd.Series(out, index=b.index, dtype=object)


def _pack_feature_fn(a: pd.Series) -> pd.Series:
    # concatenate -> one tobytes -> slice per row (memcpy, no float
    # conversion in Python)
    import numpy as np

    mask = a.notna().to_numpy()
    out: list = [None] * len(a)
    vals = a.to_numpy()[mask]
    if len(vals):
        arrs = [np.asarray(v, dtype="<f4") for v in vals]
        buf = np.concatenate(arrs).tobytes() if arrs else b""
        ends = np.cumsum([4 * len(v) for v in arrs])
        starts = np.concatenate(([0], ends[:-1]))
        for i, s, e in zip(np.flatnonzero(mask), starts, ends):
            out[i] = buf[s:e]
    return pd.Series(out, index=a.index, dtype=object)


def _pack_bbox_fn(box: pd.DataFrame) -> pd.Series:
    # struct columns arrive as a pandas DataFrame of their fields;
    # all four int32 headers are built in one vectorized ndarray
    import numpy as np

    headers = np.empty((len(box), 4), dtype="<i4")
    for j, name in enumerate(("x", "y", "width", "height")):
        headers[:, j] = box[name].to_numpy()
    return pd.Series(
        [
            h.tobytes() + (b"" if p is None else bytes(p))
            for h, p in zip(headers, box["patch_data"])
        ],
        index=box.index,
    )


def _udf(name: str, fn, returns: str):
    if name not in _UDF_CACHE:
        _UDF_CACHE[name] = F.pandas_udf(returns)(fn)
    return _UDF_CACHE[name]


def unpack_feature_bytes(c: Column | str) -> Column:
    """4*n little-endian bytes -> array<float> (Feature1024 decode)."""
    return _udf("unpack_feature", _unpack_feature_fn, "array<float>")(
        F.col(c) if isinstance(c, str) else c
    )


def pack_feature_bytes(c: Column | str) -> Column:
    """array<float> -> little-endian float32 bytes (Feature1024 encode)."""
    return _udf("pack_feature", _pack_feature_fn, "binary")(
        F.col(c) if isinstance(c, str) else c
    )


def pack_bounding_box(c: Column | str) -> Column:
    """struct<x,y,width,height,patch_data> -> 16-byte int32 header +
    pixel bytes (BoundingBox.toBytes parity, Tracklet.java:244-254)."""
    return _udf("pack_bbox", _pack_bbox_fn, "binary")(
        F.col(c) if isinstance(c, str) else c
    )


def roundtrip_feature(df: DataFrame, feature_col: str = "feature") -> DataFrame:
    """feature -> bytes -> feature; used to verify the byte layout."""
    return df.withColumn("_bytes", pack_feature_bytes(feature_col)).withColumn(
        "feature_rt", unpack_feature_bytes("_bytes")
    )
