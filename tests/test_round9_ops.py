"""Round-9 operator tests: structural invariants the oracle hash
can't articulate on its own (the test-strategy counterpart of
test_round8_ops.py for this round's entries)."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_local_bridges_have_no_common_neighbor(spark, sf_dir):
    """Every reported local bridge must have endpoints with ZERO common
    neighbors in the candidate graph, and every unreported edge must
    have at least one — checked against a brute-force adjacency map."""
    from las_vpe_platform_spark.operators.dedup import minhash_lsh_candidates
    from las_vpe_platform_spark.operators.staging import unpersist_all
    from las_vpe_platform_spark.queries_data import (
        MINHASH_BANDS,
        MINHASH_HASHES,
        MINHASH_K,
        q160_local_bridges,
    )
    from las_vpe_platform_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    pairs = {
        (r["id_a"], r["id_b"])
        for r in minhash_lsh_candidates(
            docs, id_col="doc_id", text_col="text",
            shingle_k=MINHASH_K, num_hashes=MINHASH_HASHES, bands=MINHASH_BANDS,
        ).select("id_a", "id_b").collect()
    }
    got = {(r["id_a"], r["id_b"]): r for r in q160_local_bridges(spark, sf_dir).collect()}
    unpersist_all()
    adj: dict = {}
    for a, b in pairs:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    want = {(a, b) for a, b in pairs if not (adj[a] & adj[b])}
    assert set(got) == want
    for (a, b), r in got.items():
        assert r["deg_a"] == len(adj[a]) and r["deg_b"] == len(adj[b])
        assert r["is_pendant"] == int(min(len(adj[a]), len(adj[b])) == 1)


def test_ivf_cell_split_invariants(spark, sf_dir):
    """Split plan sanity: the two seeds are distinct members of their
    cell, every member lands on exactly one side, and the number of
    planned splits is the heaviest-octile count."""
    from las_vpe_platform_spark.operators.similarity import assign_centroids
    from las_vpe_platform_spark.operators.staging import unpersist_all
    from las_vpe_platform_spark.queries_data import (
        IVF_CENTROID_MOD,
        Q162_SPLIT_DIV,
        q162_ivf_cell_split,
    )
    from las_vpe_platform_spark.sources.tables import load_table

    out = q162_ivf_cell_split(spark, sf_dir).collect()
    unpersist_all()
    emb = load_table(spark, sf_dir, "embeddings")
    cen = emb.filter(F.col("vec_id") % IVF_CENTROID_MOD == 0).selectExpr(
        "vec_id AS centroid_id", "embedding"
    )
    assigned = assign_centroids(
        emb.select("vec_id", "embedding"), cen, id_col="vec_id", vector_col="embedding"
    )
    members: dict = {}
    for r in assigned.collect():
        members.setdefault(r["centroid_id"], set()).add(r["vec_id"])
    unpersist_all()
    n_cells = len(members)
    # cells with >= 2 members rank into the octile; singletons would
    # drop at the seed_b inner join — count the expected non-degenerate
    expected_splits = -(-n_cells // Q162_SPLIT_DIV)
    assert len(out) <= expected_splits
    for r in out:
        cell = members[r["centroid_id"]]
        assert r["seed_a"] in cell and r["seed_b"] in cell
        assert r["seed_a"] != r["seed_b"]
        assert r["n_to_a"] + r["n_to_b"] == r["n_members"] == len(cell)
        assert r["n_to_a"] >= 1 and r["n_to_b"] >= 1  # each seed sides with itself


def test_compaction_plan_partitions_inventory(spark, sf_dir):
    """Bins partition the file inventory exactly: byte totals add up,
    file ranges are contiguous and non-overlapping in file_id order."""
    from las_vpe_platform_spark.operators.staging import unpersist_all
    from las_vpe_platform_spark.queries_data import LAYOUT_FILES, q166_compaction_plan
    from las_vpe_platform_spark.sources.tables import load_table

    out = sorted(
        q166_compaction_plan(spark, sf_dir).collect(), key=lambda r: r["bin_id"]
    )
    unpersist_all()
    docs = load_table(spark, sf_dir, "documents")
    total_bytes = docs.agg(F.sum("n_chars")).collect()[0][0]
    assert sum(r["total_bytes"] for r in out) == total_bytes
    assert sum(r["n_files"] for r in out) == LAYOUT_FILES
    for a, b in zip(out, out[1:]):
        assert a["file_hi"] + 1 == b["file_lo"], "bins not contiguous"
    assert out[0]["file_lo"] == 0 and out[-1]["file_hi"] == LAYOUT_FILES - 1


def test_silence_trim_bounds(spark, sf_dir):
    """Trim indices are consistent: first <= last when voiced, lead +
    tail trims never exceed the window count, and an all-voiced clip
    trims nothing."""
    from las_vpe_platform_spark.operators.staging import unpersist_all
    from las_vpe_platform_spark.queries_domain import m16_audio_silence_trim

    rows = m16_audio_silence_trim(spark, sf_dir).collect()
    unpersist_all()
    assert rows
    for r in rows:
        if r["first_voiced"] is None:
            assert r["last_voiced"] is None
            assert r["n_lead_trimmed"] == r["n_windows"]
            assert r["n_tail_trimmed"] == 0
        else:
            assert 0 <= r["first_voiced"] <= r["last_voiced"] < r["n_windows"]
            assert r["n_lead_trimmed"] == r["first_voiced"]
            assert r["n_tail_trimmed"] == r["n_windows"] - 1 - r["last_voiced"]
        assert r["n_lead_trimmed"] + r["n_tail_trimmed"] <= r["n_windows"]


def test_clustering_coefficient_matches_brute_force(spark, sf_dir):
    """c(v) against a Python adjacency-map reference: triangle counts
    from pairwise neighbor intersection, coefficient in [0, 1]."""
    from las_vpe_platform_spark.operators.dedup import minhash_lsh_candidates
    from las_vpe_platform_spark.operators.staging import unpersist_all
    from las_vpe_platform_spark.queries_data import (
        MINHASH_BANDS,
        MINHASH_HASHES,
        MINHASH_K,
        q167_clustering_coefficient,
    )
    from las_vpe_platform_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    pairs = {
        (r["id_a"], r["id_b"])
        for r in minhash_lsh_candidates(
            docs, id_col="doc_id", text_col="text",
            shingle_k=MINHASH_K, num_hashes=MINHASH_HASHES, bands=MINHASH_BANDS,
        ).select("id_a", "id_b").collect()
    }
    got = {r["node"]: r for r in q167_clustering_coefficient(spark, sf_dir).collect()}
    unpersist_all()
    adj: dict = {}
    for a, b in pairs:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    want = {v for v, ns in adj.items() if len(ns) >= 2}
    assert set(got) == want
    for v in want:
        ns = adj[v]
        tri = sum(len(adj[u] & ns) for u in ns) // 2
        r = got[v]
        assert r["deg"] == len(ns) and r["n_triangles"] == tri
        assert 0.0 <= r["coeff"] <= 1.0
        import math

        expect = math.floor((2 * tri / (len(ns) * (len(ns) - 1))) * 1e6 + 0.5) / 1e6
        assert abs(r["coeff"] - expect) < 1e-12


def test_novelty_saturation_shape(spark, sf_dir):
    """Slice 0's novelty is 1.0 by construction (nothing earlier), every
    rate is in (0, 1], and novel counts sum to the global distinct
    shingle count."""
    from las_vpe_platform_spark.operators.dedup import exploded_shingles
    from las_vpe_platform_spark.operators.staging import unpersist_all
    from las_vpe_platform_spark.queries_data import DECONTAM_N, q168_novelty_saturation
    from las_vpe_platform_spark.sources.tables import load_table

    rows = sorted(
        q168_novelty_saturation(spark, sf_dir).collect(), key=lambda r: r["slice"]
    )
    unpersist_all()
    assert rows[0]["slice"] == 0 and rows[0]["novelty_rate"] == 1.0
    for r in rows:
        assert 0.0 < r["novelty_rate"] <= 1.0
        assert r["n_novel"] <= r["n_distinct"] <= r["n_shingles"]
    docs = load_table(spark, sf_dir, "documents")
    total_distinct = (
        exploded_shingles(docs, "doc_id", "text", DECONTAM_N)
        .select("shingle")
        .distinct()
        .count()
    )
    assert sum(r["n_novel"] for r in rows) == total_distinct


def test_s30_gate_equals_batch_q60(spark, sf_dir):
    """The streaming gate's appended log equals batch q60 row-for-row
    (per-doc flags are functions of the static eval set alone)."""
    from las_vpe_platform_spark.operators.staging import unpersist_all
    from las_vpe_platform_spark.queries_data import q60_decontaminate
    from las_vpe_platform_spark.queries_streaming import s30_stream_contamination_gate

    streamed = {
        r["doc_id"]: (r["n_shared"], r["contaminated"])
        for r in s30_stream_contamination_gate(spark, sf_dir).collect()
    }
    batch = {
        r["doc_id"]: (r["n_shared"], r["contaminated"])
        for r in q60_decontaminate(spark, sf_dir).collect()
    }
    unpersist_all()
    assert streamed == batch


def test_s29_drift_equals_batch_q104(spark, sf_dir):
    """The streaming fold's final answer equals batch q104 row-for-row
    (additive counts => batching-invariant)."""
    from las_vpe_platform_spark.operators.staging import unpersist_all
    from las_vpe_platform_spark.queries_data import q104_source_drift
    from las_vpe_platform_spark.queries_streaming import s29_stream_source_drift

    key = lambda r: (r["source_a"], r["source_b"])  # noqa: E731
    streamed = {key(r): r for r in s29_stream_source_drift(spark, sf_dir).collect()}
    unpersist_all()
    batch = {key(r): r for r in q104_source_drift(spark, sf_dir).collect()}
    unpersist_all()
    assert set(streamed) == set(batch)
    for k, r in streamed.items():
        b = batch[k]
        assert (
            r["vocab"], r["tokens_a"], r["tokens_b"], r["js_divergence"]
        ) == (b["vocab"], b["tokens_a"], b["tokens_b"], b["js_divergence"])
