"""Round-10 operator tests: structural invariants the oracle hash
can't articulate on its own (the test-strategy counterpart of
test_round9_ops.py for this round's entries), plus the pinned Spark
watermark semantics s35's emission rule depends on."""

from __future__ import annotations

import random
import tempfile
import time
import uuid

from pyspark.sql import functions as F
from pyspark.sql import types as T


# --- s35: the watermark contract, pinned --------------------------------------


def test_watermark_semantics_pinned(spark):
    """Pin the four Spark behaviors s35's oracle prices (probed on
    pyspark 4.1; a version bump that changes any of them must fail HERE,
    not as a silent oracle mismatch):

    1. lagged filter: a late row arriving one batch after the max
       event time advanced is still ACCEPTED (batch 1 runs under the
       INITIAL watermark);
    2. drop boundary: a row whose window the watermark has passed is
       dropped, with the predicate ``window_end <= wm`` (equality
       drops);
    3. final flush: append mode emits exactly the windows with
       ``window_end <= max_event_time - delay`` (equality emits);
    4. the extra-lag discriminator (ADVICE r10): batch N's drop filter
       is governed by data through batch N-2 ONLY — a batch-1 row that
       RAISES the max event time does not tighten batch 2's filter, so
       a batch-2 row whose window end sits between wm(batch0) and
       wm(batch0 U batch1) is ACCEPTED (the batch0-U-batch1 formula
       s35's oracle used through round 10 would have dropped it).
    """
    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts_micros", T.LongType()),
        ]
    )
    # max0 = 10000 s, delay 700 s -> wm(batch0) = 9300 s == end of
    # [9000, 9300); batch1 raises the max to 10900 s -> wm(b0 U b1) =
    # 10200 s == end of [9900, 10200) — both boundaries probed exactly
    s0 = [(1, 10_000_000_000), (2, 9_100_000_000)]
    s1 = [
        (10, 9_150_000_000),  # behavior 1: late, accepted (initial wm)
        (11, 10_900_000_000),  # raises max: wm(b0 U b1) = 10200
    ]
    s2 = [
        (20, 9_250_000_000),  # behavior 2: end 9300 == wm(b0) -> dropped
        (21, 9_950_000_000),  # behavior 4: end 10200 > wm(b0) = 9300 ->
        #                       accepted, though 10200 <= wm(b0 U b1)
    ]
    src = tempfile.mkdtemp(prefix="wm_pin_")
    for i, rows in enumerate((s0, s1, s2)):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(f"{src}/s{i}")
        time.sleep(1.05)  # sequential mtimes -> batch order
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{src}/*")
        .withColumn("ts", F.timestamp_micros("ts_micros"))
    )
    agg = (
        stream.withWatermark("ts", "700 seconds")
        .groupBy(F.window("ts", "300 seconds"))
        .agg(F.collect_set("event_id").alias("ids"))
    )
    name = f"wm_pin_{uuid.uuid4().hex[:6]}"
    q = (
        agg.select(F.unix_timestamp("window.start").alias("ws"), "ids")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    out = {r["ws"]: sorted(r["ids"]) for r in spark.table(name).collect()}
    # behavior 3: final wm = 10900 - 700 = 10200; emitted = ends <= 10200
    #             (equality emits: [9900, 10200) IS emitted); [10800,
    #             11100) end 11100 > 10200 -> id 11 absent
    # behavior 1: id 10 accepted despite wm(b0) being past its window end
    # behavior 2: id 20 dropped (end 9300 == wm(b0), equality drops)
    # behavior 4: id 21 PRESENT — under the batch0-U-batch1 watermark
    #             formula (wm 10200, end 10200 <= 10200) it would drop
    assert out == {9000: [2, 10], 9900: [1, 21]}


def test_s35_late_cohorts_priced_exactly(spark, sf_dir, duck):
    """The s35 output differs from the naive all-rows aggregation in
    exactly the priced ways: cohort-B rows below the watermark are
    absent, and trailing windows are unfinalized — i.e. the entry is a
    real stress (some drop or truncation occurs at this scale), and
    nothing else deviates."""
    from las_vpe_platform_spark.operators.staging import unpersist_all
    from las_vpe_platform_spark.queries_streaming import (
        S35_SQL,
        s35_stream_late_data_stress,
    )

    got = {
        (r["window_start_epoch"], r["event_type"]): r["n"]
        for r in s35_stream_late_data_stress(spark, sf_dir).collect()
    }
    unpersist_all()
    want = {
        (r[0], r[1]): r[2] for r in duck.execute(S35_SQL).fetchall()
    }
    assert got == want
    naive = {
        (r[0], r[1]): r[2]
        for r in duck.execute(
            "SELECT (epoch_us(ts) // 300000000) * 300, event_type, "
            "count(*)::BIGINT FROM events GROUP BY 1, 2"
        ).fetchall()
    }
    # the stress is real: the watermark actually suppressed something
    assert got != naive
    # and every emitted count is <= the naive count for that group
    # (drops only remove rows, never add)
    for k, n in got.items():
        assert n <= naive[k]


# --- q179: two-stage retrieval invariants --------------------------------------


def test_q179_rerank_is_a_permutation_of_stage1(spark, sf_dir):
    """Stage 2 must re-ORDER stage 1's candidates, never introduce new
    ones: every (probe, gallery) pair in the output exists in the IVF
    candidate list with the same stage-1 rank, each probe emits
    exactly min(TSR_FINAL_K, candidates) rows, and rank_reranked is a
    dense 1..k per probe."""
    from las_vpe_platform_spark.operators.similarity import ivf_topk
    from las_vpe_platform_spark.operators.staging import unpersist_all
    from las_vpe_platform_spark.queries_data import (
        IVF_CENTROID_MOD,
        IVF_NPROBE,
        TSR_CAND_K,
        TSR_FINAL_K,
        TSR_PROBE_MOD,
        q179_two_stage_retrieval,
    )
    from las_vpe_platform_spark.sources.tables import load_table

    out = q179_two_stage_retrieval(spark, sf_dir).collect()
    unpersist_all()
    emb = load_table(spark, sf_dir, "embeddings")
    probes = emb.filter(F.col("vec_id") % TSR_PROBE_MOD == 3)
    cand = {
        (r["probe_key"], r["gallery_key"]): r["rank"]
        for r in ivf_topk(
            probes, emb, probe_key="vec_id", gallery_key="vec_id",
            vector_col="embedding", k=TSR_CAND_K,
            num_centroids_mod=IVF_CENTROID_MOD, nprobe=IVF_NPROBE,
        ).collect()
    }
    unpersist_all()
    per_probe: dict = {}
    for r in out:
        key = (r["probe_key"], r["gallery_key"])
        assert key in cand, f"reranked pair {key} not in stage-1 candidates"
        assert r["rank_first"] == cand[key]
        per_probe.setdefault(r["probe_key"], []).append(r["rank_reranked"])
    n_cands_per_probe: dict = {}
    for p, _g in cand:
        n_cands_per_probe[p] = n_cands_per_probe.get(p, 0) + 1
    assert set(per_probe) == set(n_cands_per_probe)
    for p, rks in per_probe.items():
        expect = min(TSR_FINAL_K, n_cands_per_probe[p])
        assert sorted(rks) == list(range(1, expect + 1))


# --- q180: compaction-plan invariants -------------------------------------------


def test_q180_actions_partition_and_groups_fill(spark, sf_dir):
    """Action thresholds are exact vs the recomputed target; compact
    groups water-fill (each group's bytes <= target + one member's
    overshoot and group ids are contiguous from 0); split counts are
    ceil(bytes/target) and >= 3 by the >2x-target rule."""
    import math

    from las_vpe_platform_spark.operators.staging import unpersist_all
    from las_vpe_platform_spark.queries_data import (
        EDGE_COMPACT_BINS,
        q180_edge_compaction_plan,
    )

    rows = q180_edge_compaction_plan(spark, sf_dir).collect()
    unpersist_all()
    total = sum(r["est_bytes"] for r in rows)
    target = (total + EDGE_COMPACT_BINS - 1) // EDGE_COMPACT_BINS
    groups: dict = {}
    for r in rows:
        if r["est_bytes"] * 2 < target:
            assert r["action"] == "compact" and r["group_id"] is not None
            assert r["n_splits"] is None
            groups.setdefault(r["group_id"], 0)
            groups[r["group_id"]] += r["est_bytes"]
        elif r["est_bytes"] > 2 * target:
            assert r["action"] == "split" and r["group_id"] is None
            assert r["n_splits"] == math.ceil(r["est_bytes"] / target)
            assert r["n_splits"] >= 3
        else:
            assert r["action"] == "keep"
            assert r["group_id"] is None and r["n_splits"] is None
    if groups:
        assert sorted(groups) == list(range(min(groups), max(groups) + 1))


# --- k-truss seed: adjacency intersection == brute force ------------------------


def test_all_support_seed_matches_bruteforce_random_graphs(spark):
    """The adjacency-intersection seed must equal brute-force triangle
    support on arbitrary graphs — including triangle-free and
    hub-skewed shapes (the r10 seed rewrite's correctness anchor,
    independent of the LSH graph the catalog exercises)."""
    from las_vpe_platform_spark.operators.graph import ktruss_peel

    rng = random.Random(1009)
    for trial, (n, p) in enumerate([(12, 0.4), (25, 0.15), (18, 0.6)]):
        edges = [
            (a, b)
            for a in range(n)
            for b in range(a + 1, n)
            if rng.random() < p
        ]
        if not edges:
            continue
        adj: dict = {}
        for a, b in edges:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        want = {(a, b): len(adj[a] & adj[b]) for a, b in edges}
        df = spark.createDataFrame(edges, ["src", "dst"])
        # k=2 deletes nothing (support >= 0 always), so the returned
        # table IS the seed support of the full graph
        got = {
            (r["a"], r["b"]): r["support"]
            for r in ktruss_peel(df, k=2, rounds=1).collect()
        }
        assert got == want, f"trial {trial}"


def test_ktruss_early_exit_matches_full_rounds(spark):
    """The scalar convergence exits must not change the fixed point:
    a graph that converges in one round returns the same table when
    asked for many rounds (the extra rounds short-circuit)."""
    from las_vpe_platform_spark.operators.graph import ktruss_peel

    # two 4-cliques sharing a bridge edge: the bridge (support 0) and
    # nothing else peels at k=3
    cliq = lambda off: [(off + i, off + j) for i in range(4) for j in range(i + 1, 4)]
    edges = cliq(0) + cliq(10) + [(3, 10)]
    df = spark.createDataFrame(edges, ["src", "dst"])
    one = sorted(
        tuple(r) for r in ktruss_peel(df, k=3, rounds=2).collect()
    )
    many = sorted(
        tuple(r) for r in ktruss_peel(df, k=3, rounds=6).collect()
    )
    assert one == many
    assert all(s >= 1 for (_a, _b, s) in one)  # bridge edge peeled
    assert len(one) == 12  # two 4-cliques survive intact
