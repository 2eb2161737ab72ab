"""PageRank operator invariants (operators/graph.py)."""

from __future__ import annotations

from las_vpe_platform_spark.operators.graph import PR_SCALE, pagerank_fixed_point


def _pr(spark, edges, iterations=5):
    df = spark.createDataFrame(edges, ["src", "dst"])
    return {
        r["node"]: r["rank_fp"]
        for r in pagerank_fixed_point(df, iterations=iterations).collect()
    }


def test_pagerank_star_center_dominates(spark):
    # undirected star: center 0 linked to 1..5
    edges = [(0, i) for i in range(1, 6)] + [(i, 0) for i in range(1, 6)]
    ranks = _pr(spark, edges)
    assert ranks[0] > max(ranks[i] for i in range(1, 6))
    # leaves are symmetric -> identical fixed-point ranks, no float noise
    assert len({ranks[i] for i in range(1, 6)}) == 1


def test_pagerank_mass_conserved_within_rounding(spark):
    edges = [(0, 1), (1, 0), (1, 2), (2, 1), (2, 0), (0, 2)]
    ranks = _pr(spark, edges)
    total = sum(ranks.values())
    # floor divisions only ever DROP mass; bounded by iters * edges ulps
    assert total <= PR_SCALE
    assert total > PR_SCALE - 1000


def test_pagerank_ring_is_uniform(spark):
    n = 6
    edges = [(i, (i + 1) % n) for i in range(n)] + [((i + 1) % n, i) for i in range(n)]
    ranks = _pr(spark, edges)
    assert len(set(ranks.values())) == 1


def _kcore_py(pairs, k, rounds):
    """Sequential reference peel: same synchronous rounds."""
    adj = {}
    for a, b in pairs:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    surv = set(adj)
    for _ in range(rounds):
        surv = {n for n in surv if len(adj[n] & surv) >= k}
    return {n: len(adj[n] & surv) for n in surv}


def test_kcore_matches_python_reference(spark):
    from las_vpe_platform_spark.operators.graph import kcore_peel

    # triangle 0-1-2 (2-core) + a tail 2-3-4 (peels away) + an
    # isolated edge 5-6 (peels) + a 4-clique 7,8,9,10 (3-core)
    pairs = [(0, 1), (1, 2), (0, 2), (2, 3), (3, 4), (5, 6)]
    pairs += [(a, b) for a in (7, 8, 9, 10) for b in (7, 8, 9, 10) if a < b]
    df = spark.createDataFrame(pairs, ["src", "dst"])
    for k in (2, 3):
        got = {
            r["node"]: r["core_degree"]
            for r in kcore_peel(df, k=k, rounds=4).collect()
        }
        assert got == _kcore_py(pairs, k, 4), k


def test_kcore_defensive_against_dirty_input(spark):
    # ADVICE r6: duplicate pairs, reversed duplicates, and self-loops
    # must NOT inflate degrees — kcore_peel canonicalizes its input,
    # so the dirty edge list yields the same core as the clean one
    from las_vpe_platform_spark.operators.graph import kcore_peel

    clean = [(0, 1), (1, 2), (0, 2), (2, 3)]
    dirty = clean + [(1, 0), (0, 1), (3, 3), (2, 0)]
    cdf = spark.createDataFrame(clean, ["src", "dst"])
    ddf = spark.createDataFrame(dirty, ["src", "dst"])
    for k in (2, 3):
        want = {
            r["node"]: r["core_degree"]
            for r in kcore_peel(cdf, k=k, rounds=4).collect()
        }
        got = {
            r["node"]: r["core_degree"]
            for r in kcore_peel(ddf, k=k, rounds=4).collect()
        }
        assert got == want == _kcore_py(clean, k, 4), k


def test_q134_extra_round_is_fixed_point(spark, sf_dir):
    """The catalog's KCORE_ROUNDS must have converged: one extra round
    changes nothing (the q120/LPA unrolled-iteration contract)."""
    from las_vpe_platform_spark.operators.dedup import minhash_lsh_candidates
    from las_vpe_platform_spark.operators.graph import kcore_peel
    from las_vpe_platform_spark.queries_data import (
        KCORE_K,
        KCORE_ROUNDS,
        MINHASH_BANDS,
        MINHASH_HASHES,
        MINHASH_K,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    pairs = minhash_lsh_candidates(
        docs, id_col="doc_id", text_col="text",
        shingle_k=MINHASH_K, num_hashes=MINHASH_HASHES, bands=MINHASH_BANDS,
    )
    at_r = sorted(
        (r["node"], r["core_degree"])
        for r in kcore_peel(pairs, "id_a", "id_b", KCORE_K, KCORE_ROUNDS).collect()
    )
    at_r1 = sorted(
        (r["node"], r["core_degree"])
        for r in kcore_peel(
            pairs, "id_a", "id_b", KCORE_K, KCORE_ROUNDS + 1
        ).collect()
    )
    assert at_r == at_r1 and len(at_r) > 0
