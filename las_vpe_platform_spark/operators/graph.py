"""Graph centrality over edge lists (beyond-reference: near-dup
canonicalization).

The reference walks its Neo4j person graph one hop at a time
(GraphDatabaseConnector.java getLinkedPedestrians); d13 covers that
traversal shape. This module adds whole-graph iterative centrality —
the standard way a dedup pipeline picks the CANONICAL document inside
each near-duplicate cluster (highest-centrality member) instead of an
arbitrary min-id keeper.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PR_SCALE = 10**12  # fixed-point denominator: rank 1.0 == 10^12


def symmetrize_edges(e: DataFrame, a: str = "a", b: str = "b") -> DataFrame:
    """(a,b) ∪ (b,a) in ONE pass over ``e``: explode a two-element
    struct array map-side instead of ``e.union(e.swap)`` (r12, guide
    §2.4 — remove duplicated subtree scans outright). The union form
    evaluates an UNMATERIALIZED child subtree once per branch — for
    the graph entries that child is the whole LSH pair generation, so
    it ran twice — and when callers dodge that by checkpointing the
    child first, the checkpoint costs an extra materialization job
    and a second pass over the blocks. The explode is a Generate
    inside whole-stage codegen: one scan, zero extra jobs, and at
    cluster scale one fewer full pass over a corpus-sized edge list.
    Output multiset, column names and types are identical to the
    union form.
    """
    pair = F.explode(
        F.array(
            F.struct(F.col(a).alias(a), F.col(b).alias(b)),
            F.struct(F.col(b).alias(a), F.col(a).alias(b)),
        )
    )
    return e.select(pair.alias("_sym")).select(f"_sym.{a}", f"_sym.{b}")


def pagerank_fixed_point(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 5,
    scale: int = PR_SCALE,
) -> DataFrame:
    """PageRank with damping 0.85 in exact fixed-point integer
    arithmetic: rank values are BIGINTs scaled by ``scale``.

    Why integers: float PageRank sums per-edge contributions in
    shuffle-partition order, so the low bits differ run-to-run and
    engine-to-engine. With integer ranks every operation — floor
    division by out-degree, the 85/100 damping, the BIGINT sum — is
    exact and order-independent, so two engines (or two cluster runs)
    produce bit-identical ranks. Rounding error vs. real PageRank is
    at most ``iterations * outdeg`` ulps of 1/scale (~1e-9 here),
    far below anything that affects ranking order.

    Update rule (dangling-free graphs; symmetric near-dup edge lists
    always qualify since every node has degree >= 1):

        share(u -> v)  = rank(u) div outdeg(u)
        rank'(v)       = (15 * scale) div (100 * n)
                         + (85 * sum(shares into v)) div 100

    Execution shape per iteration: one shuffle join of ranks with the
    (checkpointed, degree-annotated) edge list + one grouped sum —
    exactly a Pregel superstep. ``iterations`` is fixed (power-method
    convergence is geometric; 5 rounds separates duplicates' centrality
    decisively), so the whole thing is ONE Catalyst plan per call with
    linear lineage; edge/node subtrees are localCheckpoint'd so the
    (possibly expensive) upstream pair-generation runs once, not once
    per iteration (checkpoints are lazy — eager=False — so plan
    construction runs zero jobs and the final action materializes
    them once). At 1000-executor scale, pre-partition ``edges`` by
    ``src`` and ranks co-shuffle onto it each round; state is 16 bytes
    per node.
    """
    e = edges.selectExpr(f"{src} AS src", f"{dst} AS dst").localCheckpoint(eager=False)
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    ewd = e.join(deg, "src").localCheckpoint(eager=False)
    nodes = (  # both endpoints in one scan of the checkpointed edges (r12)
        e.select(F.explode(F.array("src", "dst")).alias("node")).distinct()
    )
    n_df = nodes.agg(F.count(F.lit(1)).alias("n"))
    nodes = nodes.crossJoin(F.broadcast(n_df)).localCheckpoint(eager=False)
    ranks = nodes.selectExpr("node", "n", f"CAST({scale} AS BIGINT) div n AS rank")
    for _ in range(iterations):
        contrib = (
            ranks.join(ewd, ranks.node == ewd.src)
            .selectExpr("dst AS node", "rank div outdeg AS share")
            .groupBy("node")
            .agg(F.sum("share").alias("shares"))
        )
        ranks = nodes.join(contrib, "node", "left").selectExpr(
            "node",
            "n",
            f"CAST(15 * {scale} AS BIGINT) div (100 * n)"
            " + (85 * coalesce(shares, CAST(0 AS BIGINT))) div 100 AS rank",
        )
    return ranks.selectExpr("node", "CAST(rank AS BIGINT) AS rank_fp")


def pagerank_sql(
    edges_cte: str, iterations: int = 5, scale: int = PR_SCALE
) -> str:
    """DuckDB mirror of :func:`pagerank_fixed_point`, iterations
    unrolled as chained CTEs (recursive CTEs disallow the grouped
    aggregate the update rule needs). ``edges_cte`` must yield
    (src, dst). Generated from the same parameters as the Spark side,
    so both engines compute bit-identical fixed-point ranks."""
    base = f"(15 * {scale}::BIGINT) // (100 * nd.n)"
    parts = [
        f"""_edges AS ({edges_cte}),
_deg AS (SELECT src, count(*) AS outdeg FROM _edges GROUP BY src),
_ewd AS (SELECT e.src, e.dst, d.outdeg FROM _edges e JOIN _deg d USING (src)),
_nodes AS (SELECT src AS node FROM _edges UNION SELECT dst FROM _edges),
_nn AS (SELECT count(*) AS n FROM _nodes),
_pr0 AS (SELECT node, n, {scale}::BIGINT // n AS rank FROM _nodes, _nn)"""
    ]
    for i in range(1, iterations + 1):
        parts.append(
            f"""_c{i} AS (
  SELECT e.dst AS node, sum(p.rank // e.outdeg)::BIGINT AS shares
  FROM _pr{i - 1} p JOIN _ewd e ON e.src = p.node GROUP BY e.dst
),
_pr{i} AS (
  SELECT nd.node, nd.n,
         ({base} + (85 * coalesce(c.shares, 0)) // 100)::BIGINT AS rank
  FROM _pr0 nd LEFT JOIN _c{i} c USING (node)
)"""
        )
    return (
        "WITH "
        + ",\n".join(parts)
        + f"\nSELECT node, rank::BIGINT AS rank_fp FROM _pr{iterations}"
    )


def label_propagation(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    rounds: int = 3,
) -> DataFrame:
    """Synchronous label propagation (Raghavan et al. 2007) over an
    undirected edge list — COMMUNITY detection, the denser-than-
    connectivity grouping the dedup pipeline wants when q55's
    connected components chain unrelated documents through one bridge
    pair: a node adopts the label most frequent among its neighbors,
    so sparse bridges lose the vote and dense near-dup blobs keep it.

    Deterministic contract (LPA is notoriously order-dependent; this
    pins it): labels start as the node id; ALL nodes update
    simultaneously each round (synchronous, not the paper's sequential
    sweep); a node's new label is the most frequent among its
    NEIGHBORS' current labels, ties to the smallest label (a node has
    no implicit self-vote, but a SELF-LOOP edge is a real neighbor
    relation and — being symmetrized like every edge — contributes the
    node's own label twice, which the property test pins); ``rounds``
    is fixed — the engine-independent formulation an oracle can
    replay exactly.

    Execution shape: the symmetrized edge list is built once; each
    round is one join (neighbor labels) + one grouped count + one
    per-node top-1 window — a Pregel superstep, state 16 B/node.
    ``rounds`` is small and fixed so the whole thing stays ONE lazy
    Catalyst plan (no per-round checkpoint needed — lineage grows
    linearly, unlike CC's data-dependent loop).  Returns (node,
    label) after the final round.
    """
    e = edges.selectExpr(f"{src} AS a", f"{dst} AS b")
    sym = symmetrize_edges(e).localCheckpoint(
        eager=False
    )  # referenced every round — lazy-truncate like the CC/PageRank loops
    # (one-pass symmetrization, r12: the union form computed the whole
    # upstream pair subtree once per branch before materialization)
    labels = (
        sym.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
    )
    from pyspark.sql import Window as W

    for _ in range(rounds):
        contrib = sym.join(
            labels.withColumnRenamed("node", "b"), on="b"
        ).select(F.col("a").alias("node"), "label")
        counts = contrib.groupBy("node", "label").agg(
            F.count(F.lit(1)).alias("cnt")
        )
        w = W.partitionBy("node").orderBy(F.desc("cnt"), F.asc("label"))
        labels = (
            counts.withColumn("_r", F.row_number().over(w))
            .filter(F.col("_r") == 1)
            .select("node", "label")
        )
    return labels


def kcore_peel(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    k: int = 2,
    rounds: int = 4,
) -> DataFrame:
    """k-core decomposition by synchronous peeling, ``rounds`` rounds
    unrolled into ONE lazy plan: each round drops every node whose
    degree among SURVIVING nodes is < k, until the survivor set is a
    fixed point — the densest-substructure filter between plain
    connected components (q55: any bridge chains clusters) and
    triangle counting (q94: local only). Training-data use: a near-dup
    cluster's k-core is its template-generated heart; the peeled
    fringe is organic variation worth keeping.

    ``rounds`` is fixed so both engines run the identical computation
    (the DuckDB mirror unrolls the same rounds as chained CTEs);
    convergence for the catalog graphs is asserted by running one
    EXTRA round in tests (peel(R+1) == peel(R)) at every pinned scale
    — the q120/LPA contract. All arithmetic is integer (degrees), so
    the survivor set is bit-identical on any engine.

    Input contract (same as :func:`kcore_sql`): unordered UNIQUE
    pairs with no self-loops. Duplicate pairs or self-loops would
    inflate count(*)-degrees and wrongly keep nodes in the core
    (ADVICE r6), so the input is defensively canonicalized here —
    least/greatest + distinct + a!=b — one edge-list-sized dedup
    shuffle, a no-op pass-through when the contract already holds
    (q134's LSH pairs are canonical unique by construction).

    Execution shape per round: two semi-joins restrict the
    (lazily-checkpointed, symmetrized) edge list to surviving
    endpoints, then one grouped count — a Pregel superstep, linear in
    surviving edges; per-round ``localCheckpoint(eager=False)``
    truncates lineage (the documented iterative-loop carve-out from
    the staging rule). At cluster scale, pre-partition the edge list
    by ``a`` and survivors co-shuffle onto it each round.
    """
    e = (
        edges.selectExpr(
            f"least({src}, {dst}) AS a", f"greatest({src}, {dst}) AS b"
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    # one-pass symmetrization (r12): the union form ran the whole
    # canonicalizing distinct subtree once per branch inside the
    # checkpoint's materialization job
    sym = symmetrize_edges(e).localCheckpoint(eager=False)
    surv = sym.select(F.col("a").alias("node")).distinct()
    for _ in range(rounds):
        alive = sym.join(
            surv.withColumnRenamed("node", "a"), "a", "left_semi"
        ).join(surv.withColumnRenamed("node", "b"), "b", "left_semi")
        deg = alive.groupBy("a").agg(F.count(F.lit(1)).alias("degree"))
        surv = (
            deg.filter(F.col("degree") >= k)
            .select(F.col("a").alias("node"))
            .localCheckpoint(eager=False)
        )
    # degrees WITHIN the final core (at the fixed point the last
    # filter removed nothing, but degrees must be re-restricted so a
    # non-converged call still reports core-internal degrees)
    final = sym.join(
        surv.withColumnRenamed("node", "a"), "a", "left_semi"
    ).join(surv.withColumnRenamed("node", "b"), "b", "left_semi")
    return final.groupBy(F.col("a").alias("node")).agg(
        F.count(F.lit(1)).cast("bigint").alias("core_degree")
    )


def kcore_sql(edges_cte: str, k: int = 2, rounds: int = 4) -> str:
    """DuckDB mirror of :func:`kcore_peel`, rounds unrolled as chained
    CTEs. ``edges_cte`` must yield (src, dst) unordered unique pairs."""
    parts = [
        f"""_kedges AS ({edges_cte}),
_ksym AS (SELECT src AS a, dst AS b FROM _kedges
          UNION ALL SELECT dst, src FROM _kedges),
_n0 AS (SELECT DISTINCT a AS node FROM _ksym)"""
    ]
    for i in range(1, rounds + 1):
        parts.append(
            f"""_d{i} AS (
  SELECT a, count(*) AS degree FROM _ksym
  WHERE a IN (SELECT node FROM _n{i - 1})
    AND b IN (SELECT node FROM _n{i - 1})
  GROUP BY a
),
_n{i} AS (SELECT a AS node FROM _d{i} WHERE degree >= {k})"""
        )
    return (
        "WITH "
        + ",\n".join(parts)
        + f""",
_fin AS (
  SELECT a, count(*) AS degree FROM _ksym
  WHERE a IN (SELECT node FROM _n{rounds})
    AND b IN (SELECT node FROM _n{rounds})
  GROUP BY a
)
SELECT a AS node, degree::BIGINT AS core_degree FROM _fin"""
    )


def adjacency_support(graph: DataFrame) -> DataFrame:
    """Exact triangle support of EVERY edge of a canonical (a < b,
    distinct) edge list by adjacency intersection: support(a, b) =
    |N(a) ∩ N(b)|, with neighbor sets carried as arrays and
    intersected JVM-side (``array_intersect`` inside whole-stage
    codegen) — no triangle rows are ever materialized and no 3x edge
    explode is paid (measured sf0.1, 181k edges / 11.3M triangles:
    4.5 s vs 13.5 s for degree-oriented wedge enumeration + explode +
    count). Work and shuffle are sum(deg^2)-bounded (each edge row
    carries its endpoints' neighbor arrays through one join); on LSH
    near-dup graphs the max degree is already capped by band-bucket
    occupancy, which keeps the per-row arrays small. Every edge of
    ``graph`` gets a row (empty intersection = 0), so no outer join is
    needed on top. :func:`ktruss_peel` uses this for its one-time
    seed — per-round deltas go through its wedge-anchored subset
    recompute instead."""
    sym = symmetrize_edges(graph)  # one scan, not union(graph, swap)
    adj = sym.groupBy("a").agg(F.collect_list("b").alias("nbrs"))
    par = graph.sparkSession.sparkContext.defaultParallelism
    return (
        graph.join(adj.selectExpr("a", "nbrs AS _na"), "a")
        .join(adj.selectExpr("a AS b", "nbrs AS _nb"), "b")
        # r12 (guide §2.5): the intersect projection is CPU-dense on
        # byte-SMALL rows, so AQE's byte-based partition coalescing
        # serializes it onto a handful of tasks (measured 3 tasks /
        # 2.2 s of a 64-task-capable box at sf0.1) — spread it to the
        # cluster's parallelism first. Hash keys, not round-robin, to
        # skip the sort-before-repartition pass.
        .repartition(par, "a", "b")
        .select(
            "a",
            "b",
            F.size(F.array_intersect("_na", "_nb")).cast("long").alias("support"),
        )
    )


def ktruss_peel(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    k: int = 3,
    rounds: int = 3,
) -> DataFrame:
    """k-truss decomposition by synchronous EDGE peeling, ``rounds``
    rounds unrolled into one lazy plan: each round drops every edge
    whose triangle support among SURVIVING edges is < k-2, until the
    survivor set is a fixed point. The edge-strength counterpart of
    :func:`kcore_peel` (k-core peels NODES by degree): a k-truss is
    the strictest of the cohesion filters here — every surviving edge
    sits in >= k-2 triangles whose other two edges also survive — so
    the q134 core minus the q158 truss is exactly the "held together
    by weak ties" mass a dedup verifier should re-check before CC
    merges clusters through it (q154 measures those weak ties one
    round deep; this iterates them away).

    Same engine-parity contract as kcore_peel: fixed ``rounds``
    unrolled identically in the DuckDB mirror (:func:`ktruss_sql`),
    integer support arithmetic, defensive canonicalization of the
    input, convergence asserted in tests by running one EXTRA round.

    Execution shape (r9 rewrite, VERDICT r8 'Next round' #3; r10 seed
    rewrite + convergence exits, VERDICT r9 #3): the WHOLE
    decomposition pays exactly ONE full support pass — adjacency
    intersection, |N(a) ∩ N(b)| per edge via JVM-side array_intersect
    (see :func:`adjacency_support`; measured 3x faster at sf0.1 than both
    the r9 wedge join and a degree-oriented triangle enumeration,
    because no triangle row is ever materialized) — to seed an EXACT
    incremental support table. Every round
    then advances that table by SUPPORT-DELTA: an edge that shared no
    prior-graph triangle with a deleted edge cannot have lost support
    — its stored value stays exact — so only the edges
    triangle-adjacent to a deletion ("affected") are recomputed,
    against the survivor adjacency. Per-round cost is bounded by the
    deletion mass's wedge count; a deletion-free round is a no-op
    (AQE propagates the empty frames), which is what makes the pinned
    fixed-point rounds cheap (measured sf0.1: round 1 deletes 305 of
    181k edges with ZERO affected survivors — the old recompute-all
    loop paid two more full wedge passes for nothing). The maintained
    table IS the output: support within the final graph, bit-equal to
    a full recompute (pytest vs a naive sequential reference). Per-
    round localCheckpoint(eager=False) truncates lineage (the
    iterative-loop carve-out from the staging rule).
    """
    par = edges.sparkSession.sparkContext.defaultParallelism
    cur = (
        edges.selectExpr(
            f"least({src}, {dst}) AS a", f"greatest({src}, {dst}) AS b"
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
        # keyed repartition: the checkpointed edge list otherwise
        # inherits the candidate join's few output partitions, serializing
        # every wedge join on 2 tasks (measured at sf0.1)
        .repartition(par, "a")
        .localCheckpoint(eager=False)
    )

    def _sym(e: DataFrame) -> DataFrame:
        return symmetrize_edges(e)

    def _support_of(subset: DataFrame, graph: DataFrame) -> DataFrame:
        """Triangle support of each ``subset`` edge within ``graph``."""
        sym = _sym(graph)
        return (
            subset.join(sym.selectExpr("a", "b AS c"), "a")
            .filter(F.col("c") != F.col("b"))
            .join(sym.selectExpr("a AS b", "b AS c"), ["b", "c"])
            .groupBy("a", "b")
            .agg(F.count(F.lit(1)).alias("support"))
        )

    # invariant: supp = exact triangle support WITHIN cur, for every
    # edge of cur (the seed emits one row per edge, 0 when triangle-free)
    supp = adjacency_support(cur).localCheckpoint(eager=False)
    for _ in range(rounds):
        deleted = (
            supp.filter(F.col("support") < k - 2)
            .select("a", "b")
            .localCheckpoint(eager=False)
        )
        # scalar convergence check (the connected-components carve-out:
        # ONE boolean of driver traffic per round): an empty deletion
        # set means supp is already the fixed point — every remaining
        # unrolled round would be an identity no-op, each paying ~6
        # materialized checkpoint jobs. The pinned-``rounds`` contract
        # is unchanged (rounds stays the upper bound; the SQL mirror
        # unrolls blindly and extra rounds are identities there too).
        if deleted.isEmpty():
            break
        survivors = supp.filter(F.col("support") >= k - 2)
        prev = cur
        cur = (
            survivors.select("a", "b")
            .repartition(par, "a")
            .localCheckpoint(eager=False)
        )
        # triangles of the PREVIOUS graph that contain a deleted edge:
        # the other two edges are the only possible support losers
        sym_prev = _sym(prev)
        tri = (
            deleted.join(sym_prev.selectExpr("a", "b AS c"), "a")
            .filter(F.col("c") != F.col("b"))
            .join(sym_prev.selectExpr("a AS b", "b AS c"), ["b", "c"])
        )
        # both non-deleted edges of each triangle in ONE pass over the
        # (unmaterialized) wedge join — the union form computed `tri`
        # once per branch (r12, guide §2.4)
        aff_pair = F.explode(
            F.array(
                F.struct(
                    F.expr("least(a, c)").alias("a"),
                    F.expr("greatest(a, c)").alias("b"),
                ),
                F.struct(
                    F.expr("least(b, c)").alias("a"),
                    F.expr("greatest(b, c)").alias("b"),
                ),
            )
        )
        aff = (
            tri.select(aff_pair.alias("_p"))
            .select("_p.a", "_p.b")
            .distinct()
            .join(cur, ["a", "b"], "left_semi")
            .repartition(par, "a")
            .localCheckpoint(eager=False)
        )
        # second scalar check: deletions that share no prior-graph
        # triangle with any survivor leave every stored support exact
        # (the common case on LSH graphs — measured sf0.1 round 1:
        # 305 deletions, ZERO affected) — skip the recompute DAG and
        # its checkpoint jobs; survivors sit on the checkpointed supp
        if aff.isEmpty():
            supp = survivors
            continue
        recomputed = aff.join(_support_of(aff, cur), ["a", "b"], "left").select(
            "a", "b", F.coalesce("support", F.lit(0)).alias("support")
        )
        supp = (
            survivors.join(aff, ["a", "b"], "left_anti")
            .unionByName(recomputed)
            .localCheckpoint(eager=False)
        )
    return supp.select("a", "b", F.col("support").cast("bigint").alias("support"))


def ktruss_sql(edges_cte: str, k: int = 3, rounds: int = 3) -> str:
    """DuckDB mirror of :func:`ktruss_peel`, rounds unrolled as chained
    CTEs. ``edges_cte`` must yield (src, dst) unordered unique pairs."""
    # every CTE is MATERIALIZED: DuckDB inlines plain CTEs per
    # reference, and the unrolled rounds reference each survivor set
    # multiple times — inlining would re-run the whole chain per
    # reference (exponential; the q127 MATERIALIZED lesson)
    parts = [
        f"""_tedges AS MATERIALIZED ({edges_cte}),
_t0 AS MATERIALIZED (SELECT least(src, dst) AS a, greatest(src, dst) AS b
        FROM _tedges WHERE src != dst GROUP BY 1, 2)"""
    ]
    for i in range(1, rounds + 1):
        p = i - 1
        parts.append(
            f"""_y{p} AS MATERIALIZED (SELECT a, b FROM _t{p} UNION ALL SELECT b, a FROM _t{p}),
_s{i} AS MATERIALIZED (
  SELECT e.a, e.b, count(*) AS support
  FROM _t{p} e
  JOIN _y{p} s1 ON s1.a = e.a
  JOIN _y{p} s2 ON s2.a = e.b AND s2.b = s1.b
  WHERE s1.b != e.b
  GROUP BY 1, 2
),
_t{i} AS MATERIALIZED (
  SELECT e.a, e.b FROM _t{p} e LEFT JOIN _s{i} s ON s.a = e.a AND s.b = e.b
  WHERE coalesce(s.support, 0) >= {k - 2}
)"""
        )
    r = rounds
    return (
        "WITH "
        + ",\n".join(parts)
        + f""",
_yf AS MATERIALIZED (SELECT a, b FROM _t{r} UNION ALL SELECT b, a FROM _t{r}),
_sf AS MATERIALIZED (
  SELECT e.a, e.b, count(*) AS support
  FROM _t{r} e
  JOIN _yf s1 ON s1.a = e.a
  JOIN _yf s2 ON s2.a = e.b AND s2.b = s1.b
  WHERE s1.b != e.b
  GROUP BY 1, 2
)
SELECT e.a, e.b, coalesce(s.support, 0)::BIGINT AS support
FROM _t{r} e LEFT JOIN _sf s ON s.a = e.a AND s.b = e.b"""
    )
