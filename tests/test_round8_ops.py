"""Round-8 operator tests: incremental SCD2 merge, equi-depth
histogram, triangle support — the structural invariants the oracle
hash can't articulate on its own."""

from __future__ import annotations

from pyspark.sql import functions as F


def _runs_set(df):
    return {
        (r["user_id"], r["tier"], r["valid_from_us"], r["valid_to_us"],
         r["n_events"], r["is_current"])
        for r in df.collect()
    }


def test_scd2_merge_equals_batch_history(spark):
    """Folding time-ordered batches through scd2_merge must reproduce
    scd2_history over the union exactly — for every split point,
    including splits inside a run and splits at a tier change."""
    from las_vpe_platform_spark.operators.maintenance import scd2_history, scd2_merge

    # hash-derived changelog: 40 users x 30 events, ~4 tiers
    ev = spark.range(1200).selectExpr(
        "id AS event_id",
        "id % 40 AS user_id",
        "1000000 * CAST(id / 40 AS BIGINT) AS us",
        "CAST(pmod(hash(CAST(id / 40 AS BIGINT) * 40 + id % 40), 4) AS INT) AS tier",
    )
    want = _runs_set(scd2_history(ev, "user_id", "tier", "us", "event_id"))
    for split_us in (1_000_000 * 7, 1_000_000 * 15, 1_000_000 * 29):
        b1 = ev.filter(F.col("us") < split_us)
        b2 = ev.filter(F.col("us") >= split_us)
        stored = scd2_history(b1, "user_id", "tier", "us", "event_id")
        folded = scd2_merge(
            stored, scd2_history(b2, "user_id", "tier", "us", "event_id"), "user_id"
        )
        assert _runs_set(folded) == want, f"diverged at split {split_us}"


def test_scd2_merge_three_way_fold(spark):
    """Associativity over more than two batches (the s26 shape: 4
    micro-batches folding sequentially)."""
    from las_vpe_platform_spark.operators.maintenance import scd2_history, scd2_merge

    ev = spark.range(900).selectExpr(
        "id AS event_id",
        "id % 30 AS user_id",
        "1000000 * CAST(id / 30 AS BIGINT) AS us",
        "CAST(pmod(hash(CAST(id / 30 AS BIGINT) * 31 + id % 30), 3) AS INT) AS tier",
    )
    want = _runs_set(scd2_history(ev, "user_id", "tier", "us", "event_id"))
    acc = None
    for lo, hi in ((0, 10), (10, 20), (20, 31)):
        b = ev.filter(
            (F.col("us") >= 1_000_000 * lo) & (F.col("us") < 1_000_000 * hi)
        )
        runs = scd2_history(b, "user_id", "tier", "us", "event_id")
        acc = runs if acc is None else scd2_merge(acc, runs, "user_id")
        # materialize each fold like the versioned-parquet RMW does
        acc = spark.createDataFrame(acc.collect(), acc.schema)
    assert _runs_set(acc) == want


def test_scd2_merge_guards(spark):
    """ADVICE r8: (a) a second tracked attribute column must raise at
    the boundary (the extend/close reconstruction handles exactly one);
    (b) a batch violating the time-ordered landing contract must fail
    loudly at execution, not silently corrupt run boundaries."""
    import pytest
    from py4j.protocol import Py4JJavaError

    from las_vpe_platform_spark.operators.maintenance import scd2_history, scd2_merge

    ev = spark.range(100).selectExpr(
        "id AS event_id",
        "id % 5 AS user_id",
        "1000000 * CAST(id / 5 AS BIGINT) AS us",
        "CAST(pmod(hash(id), 3) AS INT) AS tier",
    )
    early = scd2_history(ev.filter("us < 10000000"), "user_id", "tier", "us", "event_id")
    late = scd2_history(ev.filter("us >= 10000000"), "user_id", "tier", "us", "event_id")

    with pytest.raises(ValueError, match="exactly one attribute"):
        scd2_merge(early, late.withColumn("extra_attr", F.lit(1)), "user_id")

    # feed batches in the WRONG order: the stored table already holds
    # the late runs, so the early batch lands out of contract
    with pytest.raises((Py4JJavaError, Exception), match="landing contract"):
        scd2_merge(late, early, "user_id").collect()


def test_equidepth_histogram_is_equi_depth(spark, sf_dir):
    """Bucket sizes of the exact equi-depth histogram differ by at most
    one, buckets are contiguous in value order, and they partition the
    table."""
    from las_vpe_platform_spark.queries_data import HIST_BUCKETS, q152_equidepth_histogram
    from las_vpe_platform_spark.sources.tables import load_table

    out = q152_equidepth_histogram(spark, sf_dir).orderBy("bucket").collect()
    n_docs = load_table(spark, sf_dir, "documents").count()
    sizes = [r["n_docs"] for r in out]
    assert sum(sizes) == n_docs
    assert max(sizes) - min(sizes) <= 1, f"not equi-depth: {sizes}"
    assert [r["bucket"] for r in out] == list(range(HIST_BUCKETS))
    for a, b in zip(out, out[1:]):
        assert a["hi"] <= b["lo"], "buckets overlap in value order"


def test_edge_triangle_support_toy_graph(spark):
    """Known graph: a triangle (1,2,3) plus a pendant edge (3,4).
    Triangle edges have support 1, the pendant has support 0."""
    from las_vpe_platform_spark.operators.dedup import minhash_lsh_candidates  # noqa: F401
    from pyspark.sql import Window  # noqa: F401

    pairs = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (3, 4)], "id_a long, id_b long"
    )
    sym = pairs.unionByName(pairs.selectExpr("id_b AS id_a", "id_a AS id_b"))
    wedges = (
        pairs.join(sym.selectExpr("id_a", "id_b AS c"), "id_a")
        .filter(F.col("c") != F.col("id_b"))
        .join(sym.selectExpr("id_a AS id_b", "id_b AS c"), ["id_b", "c"])
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("support"))
    )
    got = {
        (r["id_a"], r["id_b"]): r["support"]
        for r in pairs.join(wedges, ["id_a", "id_b"], "left")
        .fillna(0, "support")
        .collect()
    }
    assert got == {(1, 2): 1, (1, 3): 1, (2, 3): 1, (3, 4): 0}


def test_cdc_chunking_boundary_invariance(spark):
    """Content-defined chunking must assign identical chunk identities
    to a shared passage regardless of its position: two docs sharing a
    long token run produce overlapping (n_toks, wsum) chunk keys."""
    from las_vpe_platform_spark.queries_data import q155_cdc_chunking  # noqa: F401
    from las_vpe_platform_spark.functions.text import shingle_hash60
    from pyspark.sql import Window as W

    shared = " ".join(f"tok{i}" for i in range(64))
    docs = spark.createDataFrame(
        [
            (1, "a", "pre1 pre2 " + shared),
            (2, "b", "zzz1 zzz2 zzz3 zzz4 zzz5 " + shared),
        ],
        "doc_id long, source string, text string",
    )
    toks = docs.select(
        "doc_id",
        F.posexplode(F.split(F.trim("text"), r"\s+")).alias("pos", "tok"),
    )
    flagged = toks.select(
        "doc_id", "pos",
        (shingle_hash60("tok") % F.lit(1000003)).alias("h"),
        (shingle_hash60("tok") % F.lit(8) == 0).cast("long").alias("b"),
    )
    wd = W.partitionBy("doc_id").orderBy("pos")
    chunked = flagged.withColumn(
        "chunk",
        F.coalesce(F.sum("b").over(wd.rowsBetween(W.unboundedPreceding, -1)), F.lit(0)),
    ).withColumn(
        "rk", F.row_number().over(W.partitionBy("doc_id", "chunk").orderBy("pos"))
    )
    keys = (
        chunked.groupBy("doc_id", "chunk")
        .agg(F.count(F.lit(1)).alias("n_toks"), F.sum(F.col("h") * F.col("rk")).alias("wsum"))
        .select("doc_id", "n_toks", "wsum")
        .collect()
    )
    k1 = {(r["n_toks"], r["wsum"]) for r in keys if r["doc_id"] == 1}
    k2 = {(r["n_toks"], r["wsum"]) for r in keys if r["doc_id"] == 2}
    # interior chunks of the shared run align after the first boundary
    assert len(k1 & k2) >= 2, f"no shared chunk identities: {k1} vs {k2}"


def test_ktruss_delta_matches_naive_reference(spark):
    """The support-delta rounds (r9 rewrite) must reproduce the naive
    recompute-everything peel ROUND FOR ROUND. Reference implemented
    sequentially in Python on a random-ish hash graph dense enough to
    force multi-round peeling (k=4), including partial convergence."""
    from las_vpe_platform_spark.operators.graph import ktruss_peel

    # deterministic pseudo-random graph: 60 nodes, ~200 edges
    edges = [
        ((h := (i * 2654435761) % (60 * 59)) // 59, h % 59)
        for i in range(260)
    ]
    edges = {(min(a, b), max(a, b)) for a, b in edges if a != b}

    def naive(es, k, rounds):
        cur = set(es)
        for _ in range(rounds):
            adj: dict = {}
            for a, b in cur:
                adj.setdefault(a, set()).add(b)
                adj.setdefault(b, set()).add(a)
            supp = {
                (a, b): len(adj[a] & adj[b]) for a, b in cur
            }
            cur = {e for e in cur if supp[e] >= k - 2}
        adj = {}
        for a, b in cur:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        return {(a, b, len(adj[a] & adj[b])) for a, b in cur}

    df = spark.createDataFrame(sorted(edges), "src long, dst long")
    for k, rounds in ((3, 2), (4, 3), (5, 4)):
        got = {
            (r["a"], r["b"], r["support"])
            for r in ktruss_peel(df, k=k, rounds=rounds).collect()
        }
        assert got == naive(edges, k, rounds), f"diverged at k={k} rounds={rounds}"


def test_ktruss_toy_graph_and_convergence(spark):
    """Known graph: triangle (1,2,3) + pendant (3,4) + a path (5,6),(6,7).
    The 3-truss keeps exactly the triangle (support 1 each); pendant and
    path edges peel. Convergence: one extra round changes nothing."""
    from las_vpe_platform_spark.operators.graph import ktruss_peel

    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (3, 4), (5, 6), (6, 7)],
        "src long, dst long",
    )
    got = {
        (r["a"], r["b"], r["support"])
        for r in ktruss_peel(edges, k=3, rounds=3).collect()
    }
    assert got == {(1, 2, 1), (1, 3, 1), (2, 3, 1)}
    more = {
        (r["a"], r["b"], r["support"])
        for r in ktruss_peel(edges, k=3, rounds=4).collect()
    }
    assert more == got


def test_q158_converged_at_pinned_rounds(spark, sf_dir):
    """The catalog graph must be at the fixed point at KTRUSS_ROUNDS:
    one extra round returns the identical edge set (the q134 contract)."""
    from las_vpe_platform_spark.operators.graph import ktruss_peel
    from las_vpe_platform_spark.queries_data import (
        KTRUSS_K,
        KTRUSS_ROUNDS,
        MINHASH_BANDS,
        MINHASH_HASHES,
        MINHASH_K,
    )
    from las_vpe_platform_spark.operators.dedup import minhash_lsh_candidates
    from las_vpe_platform_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    pairs = minhash_lsh_candidates(
        docs, id_col="doc_id", text_col="text",
        shingle_k=MINHASH_K, num_hashes=MINHASH_HASHES, bands=MINHASH_BANDS,
    )
    base = {
        (r["a"], r["b"], r["support"])
        for r in ktruss_peel(pairs, "id_a", "id_b", KTRUSS_K, KTRUSS_ROUNDS).collect()
    }
    extra = {
        (r["a"], r["b"], r["support"])
        for r in ktruss_peel(
            pairs, "id_a", "id_b", KTRUSS_K, KTRUSS_ROUNDS + 1
        ).collect()
    }
    assert base == extra, "KTRUSS_ROUNDS not at fixed point — bump the constant"


def test_weighted_quantiles_coverage_property(spark, sf_dir):
    """p-th weighted quantile semantics: the reported value's cumulative
    token weight reaches p% of the source total, and the next-smaller
    distinct value's does not."""
    from pyspark.sql import functions as F

    from las_vpe_platform_spark.functions.text import token_count
    from las_vpe_platform_spark.operators.staging import unpersist_all
    from las_vpe_platform_spark.queries_data import WQ_PS, q159_weighted_quantiles
    from las_vpe_platform_spark.sources.tables import load_table

    out = {r["source"]: r for r in q159_weighted_quantiles(spark, sf_dir).collect()}
    unpersist_all()
    docs = (
        load_table(spark, sf_dir, "documents")
        .select(
            "source",
            F.col("n_chars").cast("bigint").alias("v"),
            token_count("text").cast("bigint").alias("w"),
        )
        .filter(F.col("w") > 0)
        .collect()
    )
    by_src: dict = {}
    for r in docs:
        by_src.setdefault(r["source"], []).append((r["v"], r["w"]))
    for src, rows in by_src.items():
        rows.sort()
        tot = sum(w for _, w in rows)
        assert out[src]["total_tokens"] == tot
        for p in WQ_PS:
            qv = out[src][f"p{p}"]
            cum_at = sum(w for v, w in rows if v <= qv)
            cum_below = sum(w for v, w in rows if v < qv)
            assert cum_at * 100 >= p * tot, (src, p, qv)
            # the quantile is the MINIMAL such value: everything
            # strictly below it must fall short of p
            assert cum_below * 100 < p * tot, (src, p, qv)
