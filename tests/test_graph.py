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
