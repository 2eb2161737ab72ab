"""Round-5 hardening: q102 insert-key namespace, hll_bucketed input
validation, streaming-harness empty input, and the staging contract
(lazy materialization + caller-controlled unpersist)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F


def test_q102_insert_keys_never_collide_past_1m_rows(spark, tmp_path):
    """VERDICT r4 'What's wrong' #2: the old ``doc_id + 1000000``
    insert remap collided with real doc_ids once the table passed 1M
    rows, silently turning inserts into updates — and both engines
    applied the same remap, so oracle parity could never catch it.
    The negative namespace (-doc_id - 1) is disjoint from every
    non-negative id regardless of table size.

    Ids here straddle the old collision boundary: with the old remap,
    doc_id=13 (an 'I' op) would have landed on 1_000_013 — an existing
    row below. The assertion is the MERGE invariant itself: every 'I'
    op creates a NEW row, so n('inserted') == n(I-ops) exactly.
    """
    from las_vpe_platform_spark.queries_data import q102_apply_cdc

    ids = list(range(0, 100)) + [1_000_000 + i for i in range(100)] + [2_000_026]
    docs = spark.createDataFrame(
        [(i, "real", 10) for i in ids], "doc_id long, source string, n_chars long"
    )
    sf = str(tmp_path)
    docs.write.parquet(f"{sf}/documents.parquet")

    out = {r["source"]: r for r in q102_apply_cdc(spark, sf).collect()}

    def op(i):
        if i % 11 == 4:
            return "D"
        if i % 7 == 2:
            return "U"
        if i % 13 == 0:
            return "I"
        return None

    n_inserts = sum(1 for i in ids if op(i) == "I")
    assert n_inserts > 0
    assert out["inserted"]["n_docs"] == n_inserts
    # insert keys live strictly below zero — disjoint from any real id
    assert out["inserted"]["max_id"] < 0
    # and the surviving real rows are exactly the non-deleted ones
    n_kept = sum(1 for i in ids if op(i) != "D")
    assert out["real"]["n_docs"] == n_kept


def test_hll_bucketed_rejects_reserved_columns(spark):
    """VERDICT r4 'What's wrong' #3: an input already carrying
    ``_bucket``/``_rho`` produced ambiguous duplicate columns
    downstream; now it raises like ``hll_distinct`` does for bad m."""
    from las_vpe_platform_spark.operators.aggregates import hll_bucketed

    df = spark.range(5).select(
        F.col("id").alias("k"), F.lit(1).alias("_bucket")
    )
    with pytest.raises(ValueError, match="_bucket"):
        hll_bucketed(df, "k")
    # clean input still works
    ok = hll_bucketed(spark.range(5).selectExpr("id AS k"), "k")
    assert {"_bucket", "_rho"} <= set(ok.columns)


def test_sliced_parquet_stream_rejects_empty_input(spark):
    """VERDICT r4 'What's wrong' #4: zero input rows made min/max
    return NULL and the slicer died with a TypeError; now it raises a
    clear ValueError naming the problem."""
    from las_vpe_platform_spark.queries_streaming import (
        RAW_EVENTS_SCHEMA,
        _sliced_parquet_stream,
    )

    empty = spark.createDataFrame([], RAW_EVENTS_SCHEMA)
    with pytest.raises(ValueError, match="no rows"):
        _sliced_parquet_stream(spark, empty, "t_empty_")


def test_stream_scratch_dirs_under_one_root(spark):
    """Slice/re-land dirs nest under a single per-process root that is
    registered for removal at exit — no orphan dirs accumulating
    across a suite run (VERDICT r4 'What's wrong' #4)."""
    from las_vpe_platform_spark.queries_streaming import (
        _SCRATCH_ROOT,
        _scratch_dir,
    )

    a = _scratch_dir("t_a_")
    b = _scratch_dir("t_b_")
    assert _SCRATCH_ROOT, "root created on first use"
    root = _SCRATCH_ROOT[0]
    assert a.startswith(root) and b.startswith(root) and a != b
    assert os.path.isdir(a) and os.path.isdir(b)


def test_staging_default_is_lazy_and_unpersist_releases(spark):
    """The staging contract (VERDICT r4 'What's wrong' #1): the
    default materializer must run ZERO jobs at plan-construction time
    (localCheckpoint ran the subtree eagerly) and must be releasable
    by the caller via unpersist_all()."""
    from pyspark.sql import DataFrame

    from las_vpe_platform_spark.operators.staging import (
        persist_disk,
        unpersist_all,
    )

    tracker = spark.sparkContext.statusTracker()
    before = tracker.getJobIdsForGroup(None)
    df = spark.range(1000).selectExpr("id", "id * 2 AS v")
    staged = persist_disk(df, "t_stage")
    assert isinstance(staged, DataFrame)
    after = tracker.getJobIdsForGroup(None)
    assert len(after) == len(before), "persist_disk must not run a job"
    # materializes on first action, then the caller releases it
    assert staged.count() == 1000
    assert staged.storageLevel.useDisk
    released = unpersist_all()
    assert released >= 1
    assert not staged.storageLevel.useDisk


def test_operator_plan_construction_runs_zero_jobs(spark, sf_dir):
    """Building the refactored operators' DataFrames (CMS, IVF, IVF2,
    n-gram Jaccard, PPJoin, DSIR, bloom probe) must execute no Spark
    jobs until an action — the done-criterion for the staging refactor
    (plan capture used to run the staged subtrees eagerly)."""
    from las_vpe_platform_spark.operators.aggregates import cms_heavy_hitters
    from las_vpe_platform_spark.operators.bloom import bloom_build, bloom_probe
    from las_vpe_platform_spark.operators.dedup import (
        ngram_jaccard_pairs,
        prefix_filter_pairs,
    )
    from las_vpe_platform_spark.operators.sampling import hashed_ngram_importance
    from las_vpe_platform_spark.operators.similarity import ivf2_topk, ivf_topk
    from las_vpe_platform_spark.operators.staging import unpersist_all

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    probes = emb.filter(F.col("vec_id") % 100 == 7)

    tracker = spark.sparkContext.statusTracker()
    before = len(tracker.getJobIdsForGroup(None))
    cms_heavy_hitters(docs, ["source"], d=2, w=16, k=3)
    ngram_jaccard_pairs(docs.limit(50), "doc_id", "text", threshold=0.5)
    prefix_filter_pairs(docs.limit(50), "doc_id", "text", threshold=0.5)
    hashed_ngram_importance(
        docs.limit(50), docs.limit(20), "doc_id", "text", buckets=16
    )
    ivf_topk(probes, emb, "vec_id", "vec_id", k=3)
    ivf2_topk(probes, emb, "vec_id", "vec_id", k=3)
    bloom_probe(
        docs.select("doc_id"), "doc_id", bloom_build(docs.select("doc_id"), "doc_id")
    )
    after = len(tracker.getJobIdsForGroup(None))
    unpersist_all()
    assert after == before, (
        f"operator construction ran {after - before} Spark job(s); "
        "staging must be lazy"
    )


def test_staging_writer_roundtrip(spark, tmp_path):
    """The cluster-grade materializer: writes parquet under the
    staging dir and reads it back — durable across executor loss and
    driver restart, at the cost of one eager job."""
    from las_vpe_platform_spark.operators.staging import staging_writer

    mat = staging_writer(str(tmp_path))
    df = spark.range(100).selectExpr("id", "id % 7 AS g")
    staged = mat(df, "roundtrip")
    assert staged.count() == 100
    assert sorted(staged.columns) == ["g", "id"]
    # the frame landed on disk under the hint-prefixed path
    import os

    names = os.listdir(tmp_path)
    assert any(n.startswith("roundtrip_") for n in names)


def test_passthrough_enables_streaming_composition(spark, tmp_path):
    """An operator taking a Materializer can run inside a streaming
    plan with passthrough (persist of the static side is legal too,
    but passthrough proves the hook removes every materialization):
    bloom-probe a rate stream against a static member set."""
    from las_vpe_platform_spark.operators.bloom import bloom_build, bloom_probe
    from las_vpe_platform_spark.operators.staging import passthrough

    members = spark.range(0, 50).select(F.col("id").alias("k"))
    blocks = bloom_build(members, "k", m=1024, k=4)
    stream = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", "100")
        .load()
        .select(F.col("value").alias("k"))
    )
    probed = bloom_probe(
        stream, "k", blocks, m=1024, k=4, materialize=passthrough
    )
    assert probed.isStreaming
    q = (
        probed.writeStream.format("memory")
        .queryName("t_bloom_stream")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    out = spark.sql("SELECT * FROM t_bloom_stream")
    assert "bloom_pass" in out.columns


def test_cms_bucketed_rejects_reserved_key_columns(spark):
    """ANY input column colliding with the reserved _b0.._b{d-1}
    bucket names must raise — key collisions produce ambiguity, and a
    NON-key _b0 would be silently clobbered by the projection
    (review r5 widened the guard from key_cols to all columns)."""
    from las_vpe_platform_spark.operators.aggregates import cms_bucketed

    df = spark.range(5).selectExpr("id AS _b0", "id AS k")
    with pytest.raises(ValueError, match="_b0"):
        cms_bucketed(df, ["_b0", "k"], d=2, w=16)
    with pytest.raises(ValueError, match="_b0"):  # non-key collision
        cms_bucketed(df, ["k"], d=2, w=16)
    ok = cms_bucketed(spark.range(5).selectExpr("id AS k"), ["k"], d=2, w=16)
    assert {"_b0", "_b1"} <= set(ok.columns)


def test_landed_events_shared_and_filtered_never_alias(spark, sf_dir):
    """The per-process streaming landing cache: one copy per
    (sf_dir, filter) — repeated calls reuse it, and a filtered landing
    never aliases the full one."""
    from las_vpe_platform_spark.queries_streaming import (
        _LANDED,
        _landed_events8,
    )

    a = _landed_events8(spark, sf_dir)
    b = _landed_events8(spark, sf_dir)
    assert a == b, "same key must reuse the landed copy"
    f = _landed_events8(spark, sf_dir, event_types=("click", "purchase"))
    assert f != a, "filtered landing must not alias the full landing"
    full_rows = spark.read.parquet(a).count()
    filt = spark.read.parquet(f)
    assert filt.count() < full_rows
    types = {r["event_type"] for r in filt.select("event_type").distinct().collect()}
    assert types <= {"click", "purchase"}
    assert ("events8", sf_dir, None) in _LANDED


def test_staged_frames_recover_after_block_loss(spark, sf_dir):
    """The recoverability claim of the staging refactor, exercised:
    unpersisting a staged frame AFTER plan construction but BEFORE the
    action simulates total cache loss — the consumer must recompute
    through lineage and produce the identical result (eager
    localCheckpoint had no lineage to recompute through)."""
    from las_vpe_platform_spark.operators.aggregates import cms_heavy_hitters
    from las_vpe_platform_spark.operators.staging import unpersist_all

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    intact = cms_heavy_hitters(docs, ["source"], d=4, w=64, k=5)
    expected = sorted(tuple(r) for r in intact.collect())
    unpersist_all()

    lost = cms_heavy_hitters(docs, ["source"], d=4, w=64, k=5)
    released = unpersist_all()  # drop every staged block pre-action
    assert released >= 1
    got = sorted(tuple(r) for r in lost.collect())
    assert got == expected


def test_sampled_quantiles_close_to_exact(spark):
    """q110's bottom-hash sample must actually estimate well, not just
    be portable: on 20k skewed values per group, the sampled p50/p90
    must land within the order-statistics tolerance (~1/sqrt(256) in
    rank space) of the exact quantiles."""
    from las_vpe_platform_spark.queries_relational import q110_sampled_quantiles

    n = 20_000
    df = spark.range(n).selectExpr(
        "'g' AS event_type",
        "id AS event_id",
        # skewed (quadratic) values: rank tolerance must hold anyway
        "CAST(id * id AS DOUBLE) / 1e6 AS value",
        # loader contract: events tables carry a ts column
        "timestamp_micros(CAST(1704067200000000 + id AS BIGINT)) AS ts",
    )
    import tempfile

    d = tempfile.mkdtemp(prefix="q110_t_")
    df.write.mode("overwrite").parquet(f"{d}/events.parquet")
    row = q110_sampled_quantiles(spark, d).collect()[0]
    assert row["n"] == n and row["sample_n"] == 256
    # rank-space check: the value at estimated p is value(rank p*n ± eps*n)
    eps = 3.0 / (256 ** 0.5)  # ~3 sigma of the order statistic
    for p, est in ((0.5, row["p50_est"]), (0.9, row["p90_est"])):
        lo = ((p - eps) * n) ** 2 / 1e6
        hi = ((p + eps) * n) ** 2 / 1e6
        assert lo <= est <= hi, (p, est, lo, hi)


def test_eager_local_checkpoint_materializer(spark):
    """The opt-in round-3-behavior materializer: eager (runs the
    subtree at call time) and lineage-truncating — kept for
    single-session batch jobs that want blocks dropped with the JVM."""
    from las_vpe_platform_spark.operators.staging import eager_local_checkpoint

    tracker = spark.sparkContext.statusTracker()
    before = len(tracker.getJobIdsForGroup(None))
    staged = eager_local_checkpoint(spark.range(100).selectExpr("id * 3 AS v"))
    after = len(tracker.getJobIdsForGroup(None))
    assert after > before, "eager form must run the subtree immediately"
    assert staged.count() == 100


def test_sampled_quantiles_tiny_group_no_overflow(spark, tmp_path):
    """Review r5: groups with n <= 64 made (2^60 div n) * 512 overflow
    BIGINT under ANSI before the accept-all OR-branch could apply; the
    CASE now short-circuits so tiny groups never evaluate the product
    and their quantiles are exact (sample == group)."""
    from las_vpe_platform_spark.queries_relational import q110_sampled_quantiles

    df = spark.range(10).selectExpr(
        "'tiny' AS event_type",
        "id AS event_id",
        "CAST(id AS DOUBLE) AS value",
        "timestamp_micros(CAST(1704067200000000 + id AS BIGINT)) AS ts",
    )
    d = str(tmp_path)
    df.write.mode("overwrite").parquet(f"{d}/events.parquet")
    row = q110_sampled_quantiles(spark, d).collect()[0]
    assert row["n"] == 10 and row["sample_n"] == 10
    assert row["p50_est"] == 4.5  # exact interpolated median of 0..9
