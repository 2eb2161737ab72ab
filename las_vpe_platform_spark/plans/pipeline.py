"""Pipeline DSL + command compiler + batch executor (SURVEY §3.1).

The reference compiles pipeline commands into a per-task
``ExecutionPlan`` DAG (vpe/ctrl/TaskData.java:162-343) that is Java-
serialized into EVERY Kafka message and executed stage-by-stage by
long-running Spark Streaming apps, each marking its node executed
(TaskData.java:332-337) and producing to the successors' topics.

Spark-native re-architecture: the plan is a driver-side object only —
nodes become DataFrame transformations chained inside ONE Spark plan,
so the inter-stage Kafka hops (a full serialize/produce/consume/
deserialize cycle per edge) collapse into Catalyst exchanges, and
Catalyst sees the whole pipeline at once (filter pushdown through all
stages, shared scans, whole-stage codegen across stage boundaries).

Command vocabulary parity: MessageHandlingApp.java:113-125 and the
per-command plan builders at :214-337.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from las_vpe_platform_spark.operators.aggregates import wide_avg
from las_vpe_platform_spark.operators.joins import pairwise_similarity_topk
from las_vpe_platform_spark.operators.routing import term_sig_filter
from las_vpe_platform_spark.schemas import ATTRIBUTE_NAMES


@dataclass
class Node:
    """One execution of a Stream with parameters (ExecutionPlan.Node,
    TaskData.java:235-342)."""

    node_id: int
    stream: str
    exec_data: dict[str, Any] = field(default_factory=dict)
    # (successor node_id, port name) — Node.outputTo(Port)
    out_edges: list[tuple[int, str]] = field(default_factory=list)
    executed: bool = False


class ExecutionPlan:
    """DAG of Nodes (TaskData.ExecutionPlan, TaskData.java:162-227).

    Unlike the reference, the plan never ships with data — it lives on
    the driver and compiles to one Spark logical plan, so ``combine``
    (merging executed-markers from two plan copies that travelled on
    different Kafka branches, :179-183) degenerates to a set union and
    ``mark_executed`` no longer needs to free per-message memory.
    """

    def __init__(self) -> None:
        self.nodes: dict[int, Node] = {}
        self._counter = 0

    def add_node(self, stream: str, exec_data: dict[str, Any] | None = None) -> int:
        node_id = self._counter
        self._counter += 1
        self.nodes[node_id] = Node(node_id, stream, exec_data or {})
        return node_id

    def link(self, src: int, dst: int, port: str = "DEFAULT") -> None:
        self.nodes[src].out_edges.append((dst, port))

    def parents_of(self, node_id: int) -> list[tuple[int, str]]:
        return [
            (n.node_id, port)
            for n in self.nodes.values()
            for (dst, port) in n.out_edges
            if dst == node_id
        ]

    def topo_order(self) -> list[Node]:
        indeg = {i: 0 for i in self.nodes}
        for n in self.nodes.values():
            for dst, _ in n.out_edges:
                indeg[dst] += 1
        ready = sorted(i for i, d in indeg.items() if d == 0)
        order: list[Node] = []
        while ready:
            i = ready.pop(0)
            order.append(self.nodes[i])
            for dst, _ in self.nodes[i].out_edges:
                indeg[dst] -= 1
                if indeg[dst] == 0:
                    ready.append(dst)
            ready.sort()
        if len(order) != len(self.nodes):
            raise ValueError("cycle in execution plan")
        return order

    def mark_executed(self, node_id: int) -> None:
        self.nodes[node_id].executed = True

    def combine(self, other: "ExecutionPlan") -> None:
        for node_id, node in other.nodes.items():
            if node.executed and node_id in self.nodes:
                self.nodes[node_id].executed = True


# --- command vocabulary (MessageHandlingApp.java:113-125) -------------------
# stream names; sinks mirror DataManagingApp's saving streams

TRACKING = "tracking"
ATTR_RECOG = "attr_recog"
REID = "reid"
TRACKLET_SAVING = "tracklet_saving"
ATTR_SAVING = "attr_saving"
IDRANK_SAVING = "idrank_saving"
RETRIEVE_TRACKLET = "retrieve_tracklet"          # J8/S6 point retrieval
RETRIEVE_TRACKLET_ATTR = "retrieve_tracklet_attr"

COMMANDS = (
    "track",
    "track-attrrecog",
    "attrrecog",
    "reid",
    "attrrecog-reid",
    "track-attrrecog-reid",
)


def compile_command(command: str, params: dict[str, Any] | None = None) -> ExecutionPlan:
    """Command string -> ExecutionPlan (the switch at
    MessageHandlingApp.java:214-337; no optimizer, plan = command shape).
    """
    params = params or {}
    plan = ExecutionPlan()
    if command == "track":
        t = plan.add_node(TRACKING, params)
        plan.link(t, plan.add_node(TRACKLET_SAVING), "TRACKLET")
    elif command == "track-attrrecog":
        t = plan.add_node(TRACKING, params)
        a = plan.add_node(ATTR_RECOG)
        plan.link(t, a, "TRACKLET")
        plan.link(t, plan.add_node(TRACKLET_SAVING), "TRACKLET")
        plan.link(a, plan.add_node(ATTR_SAVING), "ATTRIBUTES")
    elif command == "attrrecog":
        r = plan.add_node(RETRIEVE_TRACKLET, params)
        a = plan.add_node(ATTR_RECOG)
        plan.link(r, a, "TRACKLET")
        plan.link(a, plan.add_node(ATTR_SAVING), "ATTRIBUTES")
    elif command == "reid":
        r = plan.add_node(RETRIEVE_TRACKLET_ATTR, params)
        d = plan.add_node(REID)
        plan.link(r, d, "TRACKLET_ATTR")
        plan.link(d, plan.add_node(IDRANK_SAVING), "IDRANK")
    elif command == "attrrecog-reid":
        r = plan.add_node(RETRIEVE_TRACKLET, params)
        a = plan.add_node(ATTR_RECOG)
        d = plan.add_node(REID)
        plan.link(r, a, "TRACKLET")
        plan.link(r, d, "TRACKLET")
        plan.link(a, d, "ATTRIBUTES")
        plan.link(a, plan.add_node(ATTR_SAVING), "ATTRIBUTES")
        plan.link(d, plan.add_node(IDRANK_SAVING), "IDRANK")
    elif command == "track-attrrecog-reid":
        t = plan.add_node(TRACKING, params)
        a = plan.add_node(ATTR_RECOG)
        d = plan.add_node(REID)
        plan.link(t, a, "TRACKLET")
        plan.link(t, d, "TRACKLET")
        plan.link(a, d, "ATTRIBUTES")
        plan.link(t, plan.add_node(TRACKLET_SAVING), "TRACKLET")
        plan.link(a, plan.add_node(ATTR_SAVING), "ATTRIBUTES")
        plan.link(d, plan.add_node(IDRANK_SAVING), "IDRANK")
    else:
        raise ValueError(f"unknown command {command!r}; known: {COMMANDS}")
    return plan


# --- batch executor ---------------------------------------------------------


class BatchExecutor:
    """Executes a compiled plan as chained DataFrame transformations.

    Stage lambdas replace the reference's per-app foreachRDD bodies;
    sink stages write partitioned parquet (the Parquet re-expression of
    the HDFS/HAR tracklet store + Neo4j person table, SURVEY K2-K8).

    ``term_sigs`` (optional) applies the P4 cancellation anti-join at
    the source, exactly where SparkStreamingApp.java:253-256 does.
    """

    def __init__(
        self,
        spark: SparkSession,
        output_dir: str | None = None,
        tracker: str = "fake",
        recognizer: str = "fake_sql",
        gallery: DataFrame | None = None,
        term_sigs: DataFrame | None = None,
    ) -> None:
        from las_vpe_platform_spark.providers import (
            RECOGNIZER_AVG_PROVIDERS,
            RECOGNIZER_PROVIDERS,
            TRACKER_PROVIDERS,
        )

        self.spark = spark
        self.output_dir = output_dir
        self.track_fn = TRACKER_PROVIDERS[tracker]
        self.recog_fn = RECOGNIZER_PROVIDERS[recognizer]
        self.recog_avg_fn = RECOGNIZER_AVG_PROVIDERS.get(recognizer)
        self.gallery = gallery
        self.term_sigs = term_sigs
        self._plan: ExecutionPlan | None = None  # set for the duration of run()
        self._stages: dict[str, Callable[[Node, dict[str, DataFrame]], DataFrame]] = {
            TRACKING: self._stage_tracking,
            ATTR_RECOG: self._stage_attr_recog,
            REID: self._stage_reid,
            RETRIEVE_TRACKLET: self._stage_retrieve_tracklet,
            RETRIEVE_TRACKLET_ATTR: self._stage_retrieve_tracklet_attr,
            TRACKLET_SAVING: self._sink("tracklets"),
            ATTR_SAVING: self._sink("attributes"),
            IDRANK_SAVING: self._sink("id_ranks"),
        }

    # -- stages ------------------------------------------------------------

    def _stage_tracking(self, node: Node, inputs: dict[str, DataFrame]) -> DataFrame:
        videos = inputs["SOURCE"]
        # unit-of-work repartition: tracking cost is per-VIDEO, so the
        # task split must not inherit the source's file-block layout (a
        # single-file catalog arrives as ONE partition and would track
        # every video serially in one Python worker). Same rationale as
        # the reference's per-video task fan-out
        # (PedestrianTrackingApp.java: one RDD element per video).
        par = videos.sparkSession.sparkContext.defaultParallelism
        if videos.rdd.getNumPartitions() < par:
            videos = videos.repartition(par)
        tracklets = self.track_fn(videos)
        if self.term_sigs is not None:
            tracklets = term_sig_filter(tracklets, self.term_sigs, key="task_id")
        return tracklets

    def _stage_retrieve_tracklet(self, node: Node, inputs: dict[str, DataFrame]) -> DataFrame:
        # S6/S7: read the stored tracklets table (claim-check resolution
        # is a scan, not per-row HDFS IO)
        df = inputs["SOURCE"]
        serial = node.exec_data.get("tracklet_serial_num")
        if serial is not None:
            df = df.filter(F.col("serial_number") == int(serial))
        return df

    def _stage_retrieve_tracklet_attr(self, node: Node, inputs: dict[str, DataFrame]) -> DataFrame:
        tracklets = self._stage_retrieve_tracklet(node, inputs)
        attrs = inputs["ATTR_TABLE"]
        return tracklets.join(attrs, on="tracklet_key", how="inner")

    def _explode_samples(self, tracklets: DataFrame) -> DataFrame:
        # one row per retained (patch-bearing) bounding box — the
        # BatchRecognizer input shape (P8/P9)
        return (
            tracklets.select(
                "tracklet_key",
                F.posexplode("location_sequence").alias("sample_idx", "box"),
            )
            .filter(F.col("box.patch_data").isNotNull())
            .select("tracklet_key", "sample_idx")
        )

    def _stage_attr_recog(self, node: Node, inputs: dict[str, DataFrame]) -> DataFrame:
        from las_vpe_platform_spark.providers import recognizer_drop_filter

        tracklets = inputs["TRACKLET"]
        samples = self._explode_samples(tracklets)
        samples = samples.filter(recognizer_drop_filter(samples))
        if self.recog_avg_fn is not None:
            # fused recognize + A1 average (expression-defined
            # recognizers compile ~2x faster this way; values identical)
            return self.recog_avg_fn(samples)
        per_sample = self.recog_fn(samples)
        # A1: the 125-column per-tracklet average
        return wide_avg(per_sample, ["tracklet_key"], ATTRIBUTE_NAMES)

    def _stage_reid(self, node: Node, inputs: dict[str, DataFrame]) -> DataFrame:
        # J1/J6 assembly then J9+W2 ranking against the feature gallery
        if "TRACKLET_ATTR" in inputs:
            assembled = inputs["TRACKLET_ATTR"]
        else:
            attrs = inputs["ATTRIBUTES"].select("tracklet_key", ATTRIBUTE_NAMES[0])
            if self._attrs_subsume_tracklets(node):
                # Join elimination: when the TRACKLET input is the SAME
                # in-plan tracking node that (via ATTR_RECOG) produced
                # ATTRIBUTES, every attr row's tracklet_key already
                # passed through tracking + the recognizer drop filter,
                # so attrs' keys ⊆ tracklet keys and the inner join is
                # an identity.  Joining anyway makes Catalyst evaluate
                # the tracker mapInPandas subtree TWICE inside one plan
                # (it does not dedupe shared Python-UDTF subtrees, and
                # caching the patch-bearing frame was measured slower
                # than re-running the fake tracker) — at scale that
                # doubles the dominant video->tracklet stage.  The join
                # is kept for storage-fed plans (attrrecog-reid), where
                # the TRACKLET re-scan is a cheap parquet read.
                assembled = attrs
            else:
                tracklets = inputs["TRACKLET"].select("tracklet_key")
                assembled = tracklets.join(attrs, on="tracklet_key", how="inner")
        if self.gallery is None:
            raise ValueError("reid stage requires a feature gallery DataFrame")
        probes = assembled.select("tracklet_key").join(
            self.gallery, on="tracklet_key", how="inner"
        )
        k = int(node.exec_data.get("k", 10))
        ranked = pairwise_similarity_topk(
            probes,
            self.gallery,
            probe_key="tracklet_key",
            gallery_key="tracklet_key",
            vector_col="feature",
            k=k,
        )
        return ranked.groupBy("probe_key").agg(
            F.array_sort(
                F.collect_list(F.struct("rank", "gallery_key"))
            ).getField("gallery_key").alias("id_rank")
        )

    def _attrs_subsume_tracklets(self, node: Node) -> bool:
        """True iff the reid node's TRACKLET parent is an in-plan
        TRACKING node that is also an ancestor of its ATTRIBUTES parent
        — the structural condition under which attrs' tracklet_keys are
        a subset of the tracklet keys and the assembly join can be
        eliminated (see _stage_reid)."""
        plan = self._plan
        if plan is None:
            return False
        t_parents = [p for p, port in plan.parents_of(node.node_id) if port == "TRACKLET"]
        a_parents = [p for p, port in plan.parents_of(node.node_id) if port == "ATTRIBUTES"]
        if len(t_parents) != 1 or len(a_parents) != 1:
            return False
        t_id = t_parents[0]
        if plan.nodes[t_id].stream != TRACKING:
            return False
        # t_id must feed (transitively) the ATTRIBUTES parent
        seen: set[int] = set()
        stack = [a_parents[0]]
        while stack:
            nid = stack.pop()
            for pid, _port in plan.parents_of(nid):
                if pid == t_id:
                    return True
                if pid not in seen:
                    seen.add(pid)
                    stack.append(pid)
        return False

    def _sink(self, table: str) -> Callable[[Node, dict[str, DataFrame]], DataFrame]:
        def write(node: Node, inputs: dict[str, DataFrame]) -> DataFrame:
            df = next(iter(inputs.values()))
            if self.output_dir is not None:
                df.write.mode("overwrite").parquet(f"{self.output_dir}/{table}")
            return df

        return write

    # -- driver ------------------------------------------------------------

    def run(self, plan: ExecutionPlan, source: DataFrame, **extra_inputs: DataFrame) -> dict[str, DataFrame]:
        """Execute the plan; returns {stream_name: output DataFrame}.

        ``source`` feeds root nodes (the fan-out of §3.1 step 4);
        ``extra_inputs`` supplies named side tables (e.g. ATTR_TABLE).
        """
        results: dict[int, DataFrame] = {}
        outputs: dict[str, DataFrame] = {}
        self._plan = plan
        try:
            for node in plan.topo_order():
                parents = plan.parents_of(node.node_id)
                if parents:
                    inputs = {port: results[pid] for pid, port in parents}
                else:
                    inputs = {"SOURCE": source}
                inputs.update({k: v for k, v in extra_inputs.items() if k not in inputs})
                df = self._stages[node.stream](node, inputs)
                results[node.node_id] = df
                outputs[node.stream] = df
                plan.mark_executed(node.node_id)
        finally:
            self._plan = None
        return outputs
