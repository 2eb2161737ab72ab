"""Video file sources (SURVEY S3/S4/S8).

The reference opens raw ``.h264`` files as buffered HDFS InputStreams
inside the tracking stream (PedestrianTrackingApp.java:211-218) and
expands directory URLs recursively by hand
(HDFSReader.listSubfiles, vpe/data/HDFSReader.java:62-77). Spark's
``binaryFile`` source replaces both: recursive lookup, path filtering,
and (crucially) predicate pushdown on file metadata — the content
column is only materialized for rows that survive.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from las_vpe_platform_spark.functions.scalar import video_id_from_url, video_start_ts


def video_files(
    spark: SparkSession,
    root: str,
    glob: str = "*.h264",
    with_content: bool = False,
) -> DataFrame:
    """Recursive video-file catalog scan (S3+S4).

    Returns (path, length, modificationTime, video_id, start_ts[, content]).
    ``with_content=False`` keeps the scan metadata-only — Spark prunes
    the ``content`` column at the reader, so cataloguing a petabyte of
    video reads only file listings.
    """
    df = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .option("recursiveFileLookup", "true")
        .load(root)
    )
    cols = ["path", "length", "modificationTime"]
    if with_content:
        cols.append("content")
    return df.select(*cols).withColumns(
        {
            "video_id": video_id_from_url("path"),
            "start_ts": video_start_ts(video_id_from_url("path")),
        }
    )


def webcam_stream(
    spark: SparkSession,
    camera_id: str = "CAM00",
    frames_per_second: int = 12,
) -> DataFrame:
    """Webcam source stub (S8).

    The reference's real-time webcam path is itself unimplemented
    (MessageHandlingApp.java:145-148 throws NotImplementedException;
    only FakeWebCameraConnector exists). Parity: a rate-source-backed
    fake producing one frame-descriptor row per tick; a real connector
    would replace the payload synthesis with camera IO inside a
    foreachBatch/custom data source.
    """
    rate = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", str(frames_per_second))
        .load()
    )
    return rate.select(
        F.lit(camera_id).alias("camera_id"),
        F.col("value").alias("frame_index"),
        F.col("timestamp").alias("capture_ts"),
        F.md5(F.concat(F.lit(camera_id), F.lit(":"), F.col("value").cast("string")))
        .cast("binary")
        .alias("frame_data"),
    )
