"""Routing / demux / cancellation operators (SURVEY §2.3 P1-P5).

In the reference every inter-stage hop is a Kafka topic of serialized
TaskData, demuxed per type (SparkStreamingApp.java:249-263), filtered
per port (Stream.java:72-76) and screened against a kill pool
(TaskController.java:38-80). Here all of that is filters on routing
columns of one unified DataFrame — Catalyst pushes them into the scan.
"""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def demux(df: DataFrame, type_col: str, types: Iterable[str]) -> dict[str, DataFrame]:
    """Split one typed stream into per-type streams (P2).

    Mirrors the per-DataType filter fan-out of
    SparkStreamingApp.java:258-262. Each returned frame is a filter on
    the shared scan — no data movement until an action.
    """
    return {t: df.filter(F.col(type_col) == F.lit(t)) for t in types}


def port_filter(df: DataFrame, port: str, ports_col: str = "dest_ports") -> DataFrame:
    """Keep rows routed to ``port`` (P3; Stream.java:72-76).

    dest_ports is an array<string> routing column; array_contains is a
    codegen'd predicate, pushed below later joins by Catalyst.
    """
    return df.filter(F.array_contains(F.col(ports_col), port))


def term_sig_filter(
    df: DataFrame,
    kill_list: DataFrame,
    key: str = "task_id",
) -> DataFrame:
    """Drop rows whose task id appears in the kill list (P4).

    The reference keeps an in-memory pool of the last 100 TERM_SIG
    UUIDs and filters every input (SparkStreamingApp.java:253-256,
    TaskController.java:38-80). The set-membership test is a LEFT ANTI
    join; the kill list is tiny, so Catalyst broadcasts it — no shuffle
    of the main stream.
    """
    return df.join(F.broadcast(kill_list.select(key).distinct()), on=key, how="left_anti")
