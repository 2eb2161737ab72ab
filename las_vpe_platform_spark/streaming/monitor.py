"""Streaming metrics collection (SURVEY K9/A3/A5 analogs).

The reference runs a MonitorThread posting host/JVM JSON reports to a
``monitor-report`` Kafka topic every 10 s (vpe/ctrl/MonitorThread.java:
37,121-183) and logs per-batch message counts and per-stage ms/record
probes by hand (SparkStreamingApp.java:170-177,
PedestrianAttrRecogApp.java:200-243). Structured Streaming already
emits all of that per micro-batch through StreamingQueryListener
progress events — this module just collects them queryably.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQueryListener


class MetricsCollector(StreamingQueryListener):
    """Collects per-batch progress (rows/sec, batch duration, state
    rows) for every streaming query on the session.

    Usage::

        collector = MetricsCollector.install(spark)
        ... run streaming queries ...
        collector.report(spark).show()
    """

    def __init__(self) -> None:
        self.progress: list[dict] = []

    @classmethod
    def install(cls, spark: SparkSession) -> "MetricsCollector":
        collector = cls()
        spark.streams.addListener(collector)
        return collector

    def uninstall(self, spark: SparkSession) -> None:
        spark.streams.removeListener(self)

    # -- listener callbacks --------------------------------------------------

    def onQueryStarted(self, event) -> None:  # noqa: N802 (Spark API)
        pass

    def onQueryProgress(self, event) -> None:  # noqa: N802
        p = json.loads(event.progress.json)
        self.progress.append(
            {
                "query_name": p.get("name"),
                "batch_id": p.get("batchId"),
                "timestamp": p.get("timestamp"),
                "num_input_rows": p.get("numInputRows"),
                "input_rows_per_second": p.get("inputRowsPerSecond"),
                "process_rows_per_second": p.get("processedRowsPerSecond"),
                "batch_duration_ms": (p.get("durationMs") or {}).get("triggerExecution"),
            }
        )

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        pass

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass

    # -- reporting -----------------------------------------------------------

    def report(self, spark: SparkSession) -> DataFrame:
        """Progress records as a DataFrame (the monitor-report topic
        equivalent, minus the Kafka hop)."""
        if not self.progress:
            return spark.createDataFrame(
                [],
                "query_name string, batch_id long, timestamp string, "
                "num_input_rows long, input_rows_per_second double, "
                "process_rows_per_second double, batch_duration_ms long",
            )
        return spark.createDataFrame(self.progress)
