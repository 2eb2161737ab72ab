"""Physical-plan regression tests — the scale properties the engine
must keep (SURVEY §4): filter/column pushdown into scans, broadcast of
dimension tables, no shuffles where layout makes them unnecessary.
Guards against silent plan regressions when operators are refactored.
"""

from __future__ import annotations

from conftest import outside_cached_plans

from las_vpe_platform_spark.queries_relational import (
    q01_pricing_summary,
    q04_regional_revenue,
)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_q01_scan_pushdown(spark, sf_dir):
    plan = _plan(q01_pricing_summary(spark, sf_dir))
    # the shipdate predicate reaches the parquet reader
    assert "PushedFilters" in plan
    assert "l_shipdate" in plan.split("PushedFilters", 1)[1].split("]", 1)[0]
    # column pruning: l_orderkey is never read
    read_schema = plan.split("ReadSchema", 1)[1].splitlines()[0]
    assert "l_orderkey" not in read_schema
    assert "l_quantity" in read_schema


def test_q04_broadcasts_all_dimensions(spark, sf_dir):
    plan = _plan(q04_regional_revenue(spark, sf_dir))
    # 5 dimension joins, all broadcast — the fact table never shuffles
    assert plan.count("BroadcastHashJoin") == 5
    assert "SortMergeJoin" not in plan
    # exactly one shuffle: the final group-by exchange
    import re

    exchanges = re.findall(r"Exchange hashpartitioning", plan)
    assert len(exchanges) <= 1


def test_term_sig_filter_broadcasts(spark, sf_dir):
    from pyspark.sql import functions as F

    from las_vpe_platform_spark.operators.routing import term_sig_filter

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    kills = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        F.col("o_orderkey").alias("l_orderkey")
    ).limit(10)
    plan = _plan(term_sig_filter(li, kills, key="l_orderkey"))
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan


def test_winnow_fingerprints_no_shuffle(spark, sf_dir):
    # winnowing is per-document array work: the plan must contain no
    # exchange at all — it pipelines with the scan at any scale
    from las_vpe_platform_spark.operators.dedup import winnow_fingerprints

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = _plan(winnow_fingerprints(docs, id_col="doc_id", text_col="text"))
    assert "Exchange" not in plan


def test_q65_bm25_distributed_topk(spark, sf_dir):
    # global top-k must be TakeOrderedAndProject (per-partition heaps +
    # driver merge), never a single-partition global Sort
    from las_vpe_platform_spark.queries_data import q65_bm25_topk

    plan = _plan(q65_bm25_topk(spark, sf_dir))
    assert "TakeOrderedAndProject" in plan
    assert "Exchange SinglePartition" not in plan.split("TakeOrderedAndProject")[0]


def test_q66_sq8_gallery_never_shuffles(spark, sf_dir):
    # probes broadcast over the gallery scan: the gallery lineage must
    # contain no hash exchange (codes/norms are computed in-scan)
    from las_vpe_platform_spark.queries_data import q66_sq8_ann_topk

    plan = _plan(q66_sq8_ann_topk(spark, sf_dir))
    assert "BroadcastNestedLoopJoin" in plan
    # the only hash exchange allowed is the per-probe window rank —
    # every hash exchange in the plan must key on probe_key
    import re

    all_hash = re.findall(r"Exchange hashpartitioning\((\w+)", plan)
    other_hash = [m for m in all_hash if m != "probe_key"]
    assert not other_hash, f"unexpected gallery-side shuffle on {other_hash}"
    assert len(all_hash) >= 1  # the rank window itself does shuffle probes


def test_d14_single_tracker_invocation(spark, sf_dir):
    # The flagship track->attrrecog->reid DAG (VERDICT r2 'What's
    # wrong' #1): Catalyst does not dedupe shared Python-UDTF subtrees,
    # so if the reid stage joined tracking output against attr output
    # the tracker mapInPandas would run TWICE in one plan. After the
    # structural join elimination in BatchExecutor._stage_reid, the
    # tracker subtree runs exactly ONCE — consumed eagerly by the
    # probe-matrix collect in pairwise_similarity_topk — and the only
    # MapInPandas left in the lazy plan is the BLAS scorer streaming
    # over the gallery; no tracker node may appear in it at all.
    from las_vpe_platform_spark.queries_domain import d14_pipeline_reid

    plan = _plan(d14_pipeline_reid(spark, sf_dir))
    assert plan.count("MapInPandas") == 1, "tracker subtree leaked into reid plan"
    assert "location_sequence" not in plan, "tracker subtree leaked into reid plan"
    # ranking half: gallery streams through the scorer with NO
    # gallery-side exchange; the only shuffle is the candidate window
    # (batches x probes x k rows) on probe_key
    import re

    hash_ex = re.findall(r"Exchange hashpartitioning\((\w+)", plan)
    assert all(c == "probe_key" for c in hash_ex), hash_ex


def test_q68_salt_stays_broadcast_no_sort_merge(spark, sf_dir):
    # salted join: the skewed probe side must NOT shuffle — salts are
    # exploded onto the (broadcast) build side, so the only hash
    # exchange is the final priority aggregate
    import re

    from las_vpe_platform_spark.queries_data import q68_salted_join_agg

    plan = _plan(q68_salted_join_agg(spark, sf_dir))
    assert "BroadcastHashJoin" in plan and "_salt" in plan
    assert "SortMergeJoin" not in plan
    keys = set(re.findall(r"Exchange hashpartitioning\((\w+)", plan))
    assert keys <= {"o_orderpriority"}, f"unexpected shuffle keys: {keys}"


def test_q69_overlap_joins_distinct_spans_only(spark, sf_dir):
    # the self-join runs on DISTINCT (source, span_fp) rows — the
    # pre-join aggregate must appear on both sides so cost is
    # Sum_span C(sources,2), never doc x doc; all shuffles key on the
    # span fingerprint (plus source), none on doc ids
    import re

    from las_vpe_platform_spark.queries_data import q69_source_overlap

    plan = _plan(q69_source_overlap(spark, sf_dir))
    assert plan.count("HashAggregate(keys=[source") >= 4  # partial+final x 2 sides
    shuffle_keys = re.findall(r"Exchange hashpartitioning\(([^)]+)\)", plan)
    for k in shuffle_keys:
        assert "doc_id" not in k


def test_q74_global_topk_is_take_ordered(spark, sf_dir):
    # association-ranked global top-k must be per-partition heaps +
    # driver merge, never a single-partition sort of all candidates
    from las_vpe_platform_spark.queries_data import q74_pmi_collocations

    plan = _plan(q74_pmi_collocations(spark, sf_dir))
    assert "TakeOrderedAndProject" in plan
    assert "Exchange SinglePartition" not in plan.split("TakeOrderedAndProject")[0]


def test_q67_anti_join_on_fingerprint_only(spark, sf_dir):
    # both stages key on the fingerprint; the stored side must not
    # shuffle anything wider, and the incoming side shuffles once for
    # the keeper aggregate
    from las_vpe_platform_spark.queries_data import q67_incremental_dedup

    plan = _plan(q67_incremental_dedup(spark, sf_dir))
    assert "LeftAnti" in plan
    import re

    keys = set(re.findall(r"Exchange hashpartitioning\((\w+)", plan))
    assert keys <= {"fingerprint"}, f"non-fingerprint shuffle: {keys}"


def test_q31_only_exchange_is_bucket_groupby(spark, sf_dir):
    # bucketed near-dup pairs: the gram-matmul kernel receives each
    # bucket whole; the ONLY exchange is the groupBy on the bucket id
    # (a second exchange would mean the quadratic pair stage shuffles
    # pair rows, which must never happen)
    import re

    from las_vpe_platform_spark.queries_data import q31_embedding_neardup

    plan = _plan(q31_embedding_neardup(spark, sf_dir))
    hash_ex = re.findall(r"Exchange hashpartitioning\((\w+)", plan)
    assert hash_ex and all(c == "bucket" for c in hash_ex), hash_ex
    assert "FlatMapGroupsInPandas" in plan


def test_q80_semantic_dedup_no_pair_shuffle(spark, sf_dir):
    # SemDeDup kept-set: cluster kernel + anti-join; every hash
    # exchange keys on the cluster id or the anti-join id — never on a
    # pair row
    import re

    from las_vpe_platform_spark.queries_data import q80_semantic_dedup

    plan = _plan(q80_semantic_dedup(spark, sf_dir))
    hash_ex = re.findall(r"Exchange hashpartitioning\((\w+)", plan)
    assert hash_ex and all(c in ("cluster", "vec_id") for c in hash_ex), hash_ex


def test_q89_pair_explosion_on_vocab_only(spark, sf_dir):
    # the corpus-sized work is ONE word groupBy; the pair explode and
    # its aggregate run above it (vocab-sized). Plan: exactly two hash
    # exchanges, and the scan reads only the text column.
    import re

    from las_vpe_platform_spark.queries import CATALOG

    plan = _plan(CATALOG["q89_bpe_pair_counts"][0](spark, sf_dir))
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 2
    read_schema = plan.split("ReadSchema", 1)[1].splitlines()[0]
    assert "text" in read_schema and "doc_id" not in read_schema
    # global top-k never sorts the full pair table
    assert "TakeOrderedAndProject" in plan


def test_q92_zorder_single_exchange_two_columns(spark, sf_dir):
    # the Morton key is pure codegen arithmetic: only shuffle is the
    # final block aggregate, and the scan reads exactly the two
    # dimension columns
    import re

    from las_vpe_platform_spark.queries import CATALOG

    plan = _plan(CATALOG["q92_zorder_layout"][0](spark, sf_dir))
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1
    read_schema = plan.split("ReadSchema", 1)[1].splitlines()[0]
    assert "o_totalprice" in read_schema and "o_orderdate" in read_schema
    assert "o_orderkey" not in read_schema
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_q91_fingerprints_computed_below_join(spark, sf_dir):
    # CDC diff must hash the wide text column BEFORE the full-outer
    # join so only (doc_id, 32-byte hash, n_chars) crosses the
    # exchanges. The FORMATTED plan lists each Exchange node's actual
    # input columns as "Input [k]: [...]" — assert none of them carries
    # the text column (a hash-above-the-join regression shows
    # "...text#N" there; validated against a deliberately-bad plan).
    import io
    import re
    from contextlib import redirect_stdout

    from las_vpe_platform_spark.queries import CATALOG

    df = CATALOG["q91_snapshot_diff"][0](spark, sf_dir)
    plan = _plan(df)
    assert "SortMergeJoin" in plan and "FullOuter" in plan
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    blocks = re.split(r"\n\(\d+\) ", buf.getvalue())
    exchange_blocks = [b for b in blocks if b.startswith("Exchange")]
    assert len(exchange_blocks) >= 2, "expected join-side exchanges"
    for b in exchange_blocks:
        m = re.search(r"Input \[\d+\]: \[([^\]]*)\]", b)
        assert m, f"no Input list on Exchange block: {b[:120]}"
        assert "text#" not in m.group(1), (
            f"wide column crosses an exchange: {m.group(1)}"
        )


def test_q96_group_sample_partial_topk(spark, sf_dir):
    # the rank<=k filter must compile to WindowGroupLimit: per-
    # partition partial top-k BEFORE the group exchange, so a huge
    # group ships only k rows per input partition
    import re

    from las_vpe_platform_spark.queries import CATALOG

    plan = _plan(CATALOG["q96_group_sample"][0](spark, sf_dir))
    assert "WindowGroupLimit" in plan
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1



def test_q106_ppjoin_staged_postings_no_cartesian(spark, sf_dir):
    # PPJoin's exactness must never come from a cartesian verify: the
    # candidate join is an equi-join on the prefix shingle, and every
    # reference to postings/sizes/prefix reads the STAGED frame — the
    # shingle explode (Generate) runs only inside the staged builds,
    # zero times in the consuming lineage (the r4 lesson: the slowest
    # bench query must carry a plan audit trail)
    from las_vpe_platform_spark.queries import CATALOG

    plan = _plan(CATALOG["q106_prefix_filter_join"][0](spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    outside = outside_cached_plans(plan)
    assert "InMemoryTableScan" in plan, "staged frames must be cached"
    assert "Generate" not in outside, (
        "shingle explode re-ran outside the staged postings build"
    )


def test_q94_wedge_join_single_lsh_subtree(spark, sf_dir):
    # the LSH candidate subtree (signature explode + band join) must
    # run ONCE into the staged pair list; the r12 adjacency-support
    # triangle count and the degree aggregate read the cache. The only
    # Generates allowed in the consuming lineage are the constant
    # 2-element explode(array(...)) fan-outs over the staged pairs
    # (symmetrization + degree endpoints) — never the shingle/
    # signature explode (the d14 double-tracker lesson applied to the
    # dup graph)
    from las_vpe_platform_spark.queries import CATALOG

    plan = _plan(CATALOG["q94_triangle_count"][0](spark, sf_dir))
    assert "CartesianProduct" not in plan
    outside = outside_cached_plans(plan)
    assert "InMemoryTableScan" in plan, "pair list must be staged"
    gen_lines = [ln for ln in outside.splitlines() if "Generate" in ln]
    assert gen_lines, "pair fan-out should consume the staged pairs"
    for ln in gen_lines:
        assert "explode(array(" in ln, (
            "non-constant Generate outside the staged pair build "
            "(LSH signature subtree re-ran?): " + ln.strip()
        )


def test_q142_docfreq_is_grouped_not_window(spark, sf_dir):
    # r12: shingle doc-frequency must be a grouped aggregate over the
    # STAGED postings joined onto the (evidence-sized) shared rows —
    # never a count() window over the full posting stream, which
    # shuffled + sorted every corpus posting and forced a second
    # staged materialization. The only window allowed anywhere in the
    # plan is exploded_shingles' per-doc lead() inside the cached
    # build; the consuming lineage must carry no Window at all.
    from las_vpe_platform_spark.queries import CATALOG

    plan = _plan(CATALOG["q142_pair_evidence"][0](spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "InMemoryTableScan" in plan, "postings must be staged"
    assert "windowspecdefinition(shingle" not in plan, (
        "doc-frequency regressed to a corpus-posting window"
    )
    outside = outside_cached_plans(plan)
    assert "Window" not in outside, (
        "a window ran in the consuming lineage (outside the staged "
        "shingle build)"
    )


def test_q108_topk_is_take_ordered(spark, sf_dir):
    # the global trigram top-k must be TakeOrderedAndProject (per-
    # partition heaps + driver merge), never a single-partition sort;
    # and the only exchanges are the per-user window + the trigram
    # aggregate + the distinct-user count
    from las_vpe_platform_spark.queries import CATALOG

    plan = _plan(CATALOG["q108_event_trigrams"][0](spark, sf_dir))
    assert "TakeOrderedAndProject" in plan
    assert "Exchange SinglePartition" not in plan.split("TakeOrderedAndProject")[0]


def test_q109_only_forced_broadcast_is_calendar_bounded(spark, sf_dir):
    # the user-dimension join must NOT be forced broadcast (10^9 users
    # at scale) — only the cohort-day denominator side is, and that
    # side is calendar-bounded. AQE may still choose broadcast for the
    # user join at tiny sf; the assertion is on the LOGICAL plan's
    # explicit hints, not the runtime choice.
    from las_vpe_platform_spark.queries import CATALOG

    df = CATALOG["q109_cohort_retention"][0](spark, sf_dir)
    logical = df._jdf.queryExecution().optimizedPlan().toString()
    # exactly one explicit broadcast hint survives to the optimized
    # plan as a ResolvedHint/broadcast marker on the sizes subtree
    assert logical.lower().count("broadcast") <= 1


def test_catalog_batch_plans_have_no_cartesian_product(spark, sf_dir):
    """Catalog-wide scale invariants, one pass over every batch plan:

    1. No CartesianProduct — Spark emits it only when a cross join's
       build side cannot broadcast, i.e. a full-product shuffle at
       100 TB. Broadcast crossJoins of 1-row aggregate frames compile
       to BroadcastNestedLoopJoin and are fine.
    2. No BatchEvalPython — the row-at-a-time Python UDF node. The
       engine rule (SCALE.md 'Python boundaries') is Arrow-batched
       pandas stages only (ArrowEvalPython / MapInPandas /
       FlatMapGroupsInPandas), and only where a model genuinely runs.

    Streaming entries are excluded (calling them RUNS the stream);
    everything else constructs lazily enough to plan-check cheaply.
    """
    from las_vpe_platform_spark.operators.staging import unpersist_all
    from las_vpe_platform_spark.queries import CATALOG

    cartesian, row_udfs = [], []
    for name, (fn, _sql) in CATALOG.items():
        if name.startswith("s"):  # streaming: construction executes
            continue
        plan = _plan(fn(spark, sf_dir))
        if "CartesianProduct" in plan:
            cartesian.append(name)
        if "BatchEvalPython" in plan:
            row_udfs.append(name)
    unpersist_all()
    assert not cartesian, f"non-broadcast cross joins in: {cartesian}"
    assert not row_udfs, f"row-at-a-time Python UDFs in: {row_udfs}"


def test_d17_trajectory_stats_exchange_free(spark, sf_dir):
    # trajectory stats are pure array expressions over the struct
    # column: the plan must be Project over the scan — zero exchanges,
    # so a 100 TB tracklet table streams through in one stage
    from las_vpe_platform_spark.queries import CATALOG

    plan = _plan(CATALOG["d17_trajectory_stats"][0](spark, sf_dir))
    assert "Exchange" not in plan


def test_d19_partial_topk_and_no_forced_broadcast(spark, sf_dir):
    # the per-node strongest-match selection must compile to
    # WindowGroupLimit (per-partition partial top-k BEFORE the node_a
    # exchange) — at 10^9 tracklets the edge table never fully sorts;
    # only the camera dim carries an explicit broadcast hint, so the
    # tracklet-side joins stay free to pick SMJ at scale
    from las_vpe_platform_spark.queries import CATALOG

    plan = _plan(CATALOG["d19_camera_transitions"][0](spark, sf_dir))
    assert "WindowGroupLimit" in plan
    assert "CartesianProduct" not in plan


def test_d20_attribute_predicate_in_scan(spark, sf_dir):
    # the attribute predicate is the selective step and must run
    # INSIDE the parquet scan: pushed filters on both queried columns,
    # and the 126-column attribute table prunes to exactly key + the
    # two queried scores
    from las_vpe_platform_spark.queries import CATALOG

    import contextlib
    import io

    # the compact plan string elides long pushed-filter lists — use the
    # formatted explain, which prints each scan's full detail
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        CATALOG["d20_attribute_search"][0](spark, sf_dir).explain("formatted")
    plan = buf.getvalue()
    pushed = plan.split("PushedFilters", 1)[1].split("]", 1)[0]
    assert "GreaterThan(gender_male,0.0)" in pushed
    assert "GreaterThan(accessory_backpack,0.0)" in pushed
    assert (
        "struct<tracklet_key:string,gender_male:double,accessory_backpack:double>"
        in plan
    )
    assert "WindowGroupLimit" in plan


def test_s13_assignment_is_join_free(spark, tmp_path):
    # the stream-side contract: nearest-centroid assignment is a pure
    # column expression over plan-time literals — NO stream-static
    # join, and the only aggregate is the per-cell occupancy (bounded
    # state). Built unstarted over an empty dir: zero jobs.
    from las_vpe_platform_spark.queries_streaming import (
        EMBEDDINGS_SCHEMA,
        ivf_assign_cells,
    )

    stream = (
        spark.readStream.schema(EMBEDDINGS_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(tmp_path))
    )
    cells = ivf_assign_cells(stream, [(0, [1.0, 0.0]), (100, [0.0, 1.0])])
    plan = cells._jdf.queryExecution().analyzed().toString()
    assert "Join" not in plan
    assert plan.count("Aggregate") == 1


def test_q111_pq_gallery_never_shuffles(spark, sf_dir):
    # same contract as q66: probes broadcast over the gallery scan;
    # the only hash exchange is the per-probe rank window. The
    # codebook build must be TakeOrderedAndProject (per-partition
    # top-n_codes merge), NOT a global sort of the gallery.
    from las_vpe_platform_spark.queries_data import q111_pq_ann_topk

    plan = _plan(q111_pq_ann_topk(spark, sf_dir))
    assert "BroadcastNestedLoopJoin" in plan
    assert "TakeOrderedAndProject" in plan
    import re

    all_hash = re.findall(r"Exchange hashpartitioning\((\w+)", plan)
    other_hash = [m for m in all_hash if m != "probe_key"]
    assert not other_hash, f"unexpected gallery-side shuffle on {other_hash}"
    assert len(all_hash) >= 1


def test_s14_survivor_branch_is_stateless(spark, tmp_path):
    # the survivor branch must carry NO join and NO aggregate — it is
    # the stateless fast path that forwards ~1/16 of rows; built
    # unstarted over an empty dir: zero jobs
    from las_vpe_platform_spark.queries_streaming import (
        RAW_EVENTS_SCHEMA,
        quantile_survivors,
    )

    stream = (
        spark.readStream.schema(RAW_EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(tmp_path))
    )
    plan = quantile_survivors(stream)._jdf.queryExecution().analyzed().toString()
    assert "Join" not in plan
    assert "Aggregate" not in plan


def test_q112_anchor_topk_and_no_nested_loop(spark, sf_dir):
    # containment dedup: the rarest-bigram anchor (row_number == 1)
    # must compile to WindowGroupLimit (per-partition top-1 BEFORE the
    # doc exchange), and every join must be a hash equi-join — the
    # whole point is that no text-vs-text nested loop exists anywhere
    from las_vpe_platform_spark.queries import CATALOG

    plan = CATALOG["q112_containment_dedup"][0](
        spark, sf_dir
    )._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan


def test_d21_banded_equi_join_no_nested_loop(spark, sf_dir):
    # co-appearance: the pair join must be an equi-join on the
    # (video, frame-bucket) band — never a per-video nested loop —
    # and both sides must explode into their bucket keys (Generate)
    from las_vpe_platform_spark.queries import CATALOG

    plan = CATALOG["d21_cotravel_pairs"][0](
        spark, sf_dir
    )._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan
    assert plan.count("Generate explode") >= 2


def test_q113_both_lists_are_topk_reductions(spark, sf_dir):
    # RRF fusion: the lexical and semantic lists must each reach the
    # fusion as TakeOrderedAndProject top-N reductions — a full sort
    # of either scored table would defeat the rank-based design
    from las_vpe_platform_spark.queries import CATALOG

    plan = CATALOG["q113_rrf_fusion"][0](
        spark, sf_dir
    )._jdf.queryExecution().executedPlan().toString()
    assert plan.count("TakeOrderedAndProject") >= 2


def test_ivf_assignment_fold_gallery_never_shuffles(spark, sf_dir):
    # round-5 rewrite: centroid assignment is a broadcast array fold
    # (one projection), not a crossJoin + rank window — the ONLY hash
    # exchange left in flat IVF is the final per-probe rank window.
    from las_vpe_platform_spark.queries_data import q29_embedding_ivf_topk
    import re

    plan = _plan(q29_embedding_ivf_topk(spark, sf_dir))
    all_hash = re.findall(r"Exchange hashpartitioning\((\w+)", plan)
    other = [m for m in all_hash if m != "probe_key"]
    assert not other, f"gallery-side shuffle reappeared on {other}"
    assert len(all_hash) >= 1


def test_q118_ivfpq_single_exchange_on_probe_key(spark, sf_dir):
    # composed IVF-PQ: cell assignment, residuals, codebook encode and
    # ADC tables are all column expressions under broadcasts; the
    # gallery is scanned (assign + encode) but NEVER hash-shuffled.
    from las_vpe_platform_spark.queries_data import q118_ivfpq_topk
    import re

    plan = _plan(q118_ivfpq_topk(spark, sf_dir))
    all_hash = re.findall(r"Exchange hashpartitioning\((\w+)", plan)
    other = [m for m in all_hash if m != "probe_key"]
    assert not other, f"unexpected gallery-side shuffle on {other}"
    assert len(all_hash) >= 1
    # codebook build stays a per-partition top-n (never a global sort)
    assert "TakeOrderedAndProject" in plan


def test_q126_recall_exchanges_probe_keyed_only(spark, sf_dir):
    # the recall harness runs the q118 codec AND the exact BLAS branch
    # by construction (2x work IS the semantics), but it must add no
    # gallery-side shuffle of its own: outside the staged (cached)
    # codec subtrees, every hash exchange — both rank windows, the
    # hit join, the recall aggregate — leads with probe_key.
    from las_vpe_platform_spark.queries_data import q126_ivfpq_recall
    import re

    plan = outside_cached_plans(_plan(q126_ivfpq_recall(spark, sf_dir)))
    all_hash = re.findall(r"Exchange hashpartitioning\((\w+)", plan)
    other = [m for m in all_hash if m != "probe_key"]
    assert not other, f"non-probe-keyed exchange in the recall harness: {other}"
    assert len(all_hash) >= 3  # two rank windows + join/aggregate
    # the exact branch is present (BLAS scorer), the codec staged
    assert "MapInPandas" in plan


def test_q70_ivf2_gallery_never_shuffles(spark, sf_dir):
    # round-5 fold: both descent levels are broadcast folds and the
    # probe side broadcasts into the bucket join — the gallery is
    # never hash-partitioned. Remaining exchanges move only the fine
    # table (cell-map build on centroid_id) + the probe rank window.
    from las_vpe_platform_spark.queries_data import q70_ivf2_topk
    import re

    plan = _plan(q70_ivf2_topk(spark, sf_dir))
    all_hash = re.findall(r"Exchange hashpartitioning\((\w+)", plan)
    other = [m for m in all_hash if m not in ("probe_key", "centroid_id")]
    assert not other, f"gallery-side shuffle reappeared on {other}"


def test_q122_scd2_single_exchange(spark, sf_dir):
    # gaps-and-islands: the lag flag, the island running sum, the runs
    # aggregate AND the lead() closing edge all share ONE user_id
    # exchange — the SCALE.md claim, enforced.
    from las_vpe_platform_spark.queries_data import q122_scd2_history
    import re

    plan = _plan(q122_scd2_history(spark, sf_dir))
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1


def test_q123_bootstrap_replicate_reduction_is_map_side(spark, sf_dir):
    # the Poisson-bootstrap claim: the replicate explode collapses
    # MAP-SIDE, so the (group, b) exchange ships groups x B partial
    # rows, never data x B — there must be a partial HashAggregate
    # BETWEEN that exchange and the Generate node.
    from las_vpe_platform_spark.queries_data import q123_bootstrap_ci

    plan = q123_bootstrap_ci(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    lines = plan.splitlines()
    exch = next(
        i for i, l in enumerate(lines)
        if "Exchange hashpartitioning" in l and ", b#" in l
    )
    gen = next(i for i, l in enumerate(lines) if "Generate" in l)
    assert exch < gen, "replicate exchange should sit above the explode"
    between = "\n".join(lines[exch:gen])
    assert "HashAggregate" in between, (
        "no map-side partial between the replicate exchange and the "
        "explode — the shuffle would ship data x B rows"
    )


def test_s18_asof_enrich_stream_plan_is_stateless(spark, sf_dir):
    # stream-static joins hold nothing across batches: the streaming
    # side of s18 carries NO watermark and NO stateful operator — the
    # interval condition runs as a plain per-batch join.
    from las_vpe_platform_spark.queries_streaming import RAW_EVENTS_SCHEMA
    import tempfile

    from pyspark.sql import functions as F

    dim = spark.createDataFrame(
        [(1, 0, 0, None)],
        "d_user long, tier int, valid_from_us long, valid_to_us long",
    )
    stream = (
        spark.readStream.schema(RAW_EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(tempfile.mkdtemp(prefix="s18_plan_"))
        .filter(F.col("event_type") == "click")
        .select("event_id", "user_id", F.col("ts_micros").alias("click_us"))
    )
    joined = stream.join(
        F.broadcast(dim),
        (F.col("user_id") == F.col("d_user"))
        & (F.col("click_us") >= F.col("valid_from_us"))
        & (F.col("valid_to_us").isNull() | (F.col("click_us") < F.col("valid_to_us"))),
        "left",
    )
    plan = joined._jdf.queryExecution().analyzed().toString()
    assert "Join" in plan
    assert "EventTimeWatermark" not in plan


def test_q140_global_ranks_are_distributed(spark, sf_dir):
    # VERDICT r6 'What's wrong' #2: the global quantile ranks must be
    # the two-phase distributed prefix scan (range shuffle + Arrow
    # cumsum + broadcast offsets), never a corpus-sized global window.
    # Every Window node must be either source-partitioned (the
    # per-source ranks) or the partition-count offsets fold (_pid,
    # one row per partition) — a windowspecdefinition ordering the
    # corpus by n_chars without a partition spec is the scale-kill.
    from las_vpe_platform_spark.queries_data import q140_quantile_normalize

    plan = _plan(q140_quantile_normalize(spark, sf_dir))
    assert "MapInPandas" in plan, "two-phase rank scan missing"
    for line in plan.splitlines():
        if "windowspecdefinition(" not in line:
            continue
        spec = line.split("windowspecdefinition(", 1)[1]
        assert spec.startswith("source") or spec.startswith("_pid"), (
            f"unpartitioned corpus-sized window in q140 plan: {line.strip()}"
        )


def test_node_rank_family_windows_are_distributed(spark, sf_dir):
    # VERDICT r7 'What's wrong' #1: the node/dictionary rank tables of
    # the pair-graph family (q127 negative sampling, q136 triplet
    # mining, q137 entity resolution) must come from the two-phase
    # distributed scan (operators.packing.global_ranks), never an
    # unpartitioned row_number window over the node table — at 10^11
    # docs that table is plausibly 10^9 rows through ONE WindowExec
    # task. Allowed windows: anything with a partition spec, or the
    # partition-count offsets fold (_pid, one row per partition).
    from las_vpe_platform_spark.operators.staging import unpersist_all
    from las_vpe_platform_spark.queries_data import (
        q127_negative_edge_samples,
        q136_triplet_mining,
        q137_entity_resolution,
    )
    from tests.conftest import outside_cached_plans

    for fn in (q127_negative_edge_samples, q136_triplet_mining,
               q137_entity_resolution):
        plan = _plan(fn(spark, sf_dir))
        assert "MapInPandas" in plan, f"{fn.__name__}: two-phase scan missing"
        for line in plan.splitlines():
            if "windowspecdefinition(" not in line:
                continue
            spec = line.split("windowspecdefinition(", 1)[1]
            first_arg = spec.split(",", 1)[0]
            # unpartitioned window <=> the FIRST windowspec argument is
            # already a sort spec (carries ASC/DESC) instead of a
            # partition column; the only one allowed is the tiny _pid
            # offsets fold (one row per partition)
            if " ASC" in first_arg or " DESC" in first_arg:
                assert first_arg.startswith("_pid"), (
                    f"{fn.__name__}: unpartitioned window in plan: {line.strip()}"
                )
        unpersist_all()


def test_global_ranks_matches_row_number_and_string_keys(spark):
    # the generalized two-phase scan must equal row_number()-1+start
    # over the same total order, for BOTH long and string keys, at any
    # partitioning of the input
    from las_vpe_platform_spark.operators.packing import global_ranks

    longs = spark.range(0, 997).selectExpr("id * 7 % 1009 AS node").distinct()
    got = {
        (r["node"], r["rk"])
        for r in global_ranks(longs.repartition(13), ["node"]).collect()
    }
    want = {
        (n, i) for i, n in enumerate(sorted(r["node"] for r in longs.collect()))
    }
    assert got == want

    strs = spark.createDataFrame(
        [(f"name_{i*37%211:03d}", i) for i in range(211)], "s string, v int"
    )
    got2 = {
        (r["s"], r["nid"])
        for r in global_ranks(strs.repartition(7), ["s"], rank_col="nid", start=1).collect()
    }
    want2 = {
        (s, i + 1)
        for i, s in enumerate(sorted(r["s"] for r in strs.collect()))
    }
    assert got2 == want2


def test_s24_stream_plan_has_three_stateful_operators(spark, sf_dir):
    # the flagship's analyzed plan must contain EXACTLY the designed
    # state: two windowed aggregations + one stream-stream join, with
    # the ranking mapInPandas stateless above them — a silent plan
    # change (e.g. an extra dedup or a lost watermark) would alter
    # state size and emission semantics
    import tempfile

    from las_vpe_platform_spark.queries_streaming import s24_build_stream

    df = s24_build_stream(spark, tempfile.mkdtemp(prefix="s24_plan_"))
    plan = df._jdf.queryExecution().analyzed().toString()
    assert plan.count("EventTimeWatermark") == 2, "both branches watermarked"
    assert "Join FullOuter" in plan
    assert "MapInPandas" in plan
    agg_count = plan.count("Aggregate [window")
    assert agg_count >= 2, f"expected 2 windowed aggregations, saw {agg_count}"


def test_s25_monitor_never_collects_gallery(spark, sf_dir):
    # VERDICT r8 "What's wrong" #1: the recall monitor must not
    # materialize the gallery on the driver. (a) structurally — the
    # query body performs no driver materialization at all (the only
    # driver-sized object per trigger is the PROBE batch inside
    # pairwise_similarity_topk, bounded by maxFilesPerTrigger); (b)
    # behaviorally — streaming output equals batch q84 row-for-row,
    # which holds for any batching because per-probe results depend
    # only on (probe row, static gallery).
    import inspect

    from las_vpe_platform_spark import queries_streaming as qs
    from las_vpe_platform_spark.operators.staging import unpersist_all
    from las_vpe_platform_spark.queries_data import q84_ann_recall

    body = inspect.getsource(qs.s25_stream_ann_recall)
    assert ".collect(" not in body and ".toPandas(" not in body, (
        "s25 must not materialize tables on the driver"
    )
    streamed = {
        r["probe_key"]: (r["n_hits"], r["recall"])
        for r in qs.s25_stream_ann_recall(spark, sf_dir).collect()
    }
    batch = {
        r["probe_key"]: (r["n_hits"], r["recall"])
        for r in q84_ann_recall(spark, sf_dir).collect()
    }
    unpersist_all()
    assert streamed == batch


def test_s27_s28_plans_are_stateless(spark, sf_dir):
    # the live command paths hold NO streaming state: stateless
    # filters + stream-static broadcast joins + mapInPandas ranking —
    # no watermark, no streaming aggregation, no stream-stream join
    import tempfile

    from pyspark.sql import functions as F

    from las_vpe_platform_spark.fixtures import FIXTURES_DIR
    from las_vpe_platform_spark.operators.joins import broadcast_gallery_topk
    from las_vpe_platform_spark.providers import recognizer_drop_filter
    from las_vpe_platform_spark.queries_streaming import S27_K, S27_SERIAL

    batch = spark.read.parquet(str(FIXTURES_DIR / "tracklets.parquet"))
    stream = (
        spark.readStream.schema(batch.schema)
        .option("maxFilesPerTrigger", "2")
        .parquet(tempfile.mkdtemp(prefix="s27_plan_"))
    )
    sel = stream.filter(F.col("serial_number") == S27_SERIAL)
    retained = F.filter(
        "location_sequence", lambda b: b.getField("patch_data").isNotNull()
    )
    kept = sel.filter(F.size(retained) > 0)
    kept = kept.filter(recognizer_drop_filter(kept)).select("tracklet_key")
    features = spark.read.parquet(str(FIXTURES_DIR / "features.parquet"))
    probes = kept.join(F.broadcast(features), "tracklet_key", "inner")
    df = broadcast_gallery_topk(
        probes, features, probe_key="tracklet_key", gallery_key="tracklet_key",
        vector_col="feature", k=S27_K, passthrough=["tracklet_key"],
    )
    plan = df._jdf.queryExecution().analyzed().toString()
    assert "EventTimeWatermark" not in plan
    assert "Aggregate" not in plan
    assert "MapInPandas" in plan


def test_q159_no_per_source_window(spark, sf_dir):
    # exact weighted quantiles must NOT sort a source inside one task:
    # every window in the plan is the tiny _pid offsets fold (from
    # global_ranks / pack_sequences); the per-source cumulative weight
    # telescopes from the GLOBAL prefix instead
    from las_vpe_platform_spark.operators.staging import unpersist_all
    from las_vpe_platform_spark.queries_data import q159_weighted_quantiles

    plan = _plan(q159_weighted_quantiles(spark, sf_dir))
    assert plan.count("MapInPandas") >= 1, "two-phase scans missing"
    for line in plan.splitlines():
        if "windowspecdefinition(" not in line:
            continue
        spec = line.split("windowspecdefinition(", 1)[1]
        first_arg = spec.split(",", 1)[0]
        if " ASC" in first_arg or " DESC" in first_arg:
            assert first_arg.startswith("_pid"), (
                f"unpartitioned window in q159 plan: {line.strip()}"
            )
        else:
            assert first_arg.startswith("_pid") or first_arg.startswith("source"), (
                f"unexpected window partition in q159 plan: {line.strip()}"
            )
    unpersist_all()


def test_q158_seed_is_adjacency_intersection(spark, sf_dir):
    # the r10 seed: per-edge support comes from array_intersect over
    # collected neighbor arrays — no triangle row is ever materialized,
    # and the intersection is a codegen expression, not a Python
    # boundary. The ktruss entry's own executed plan ends at a
    # checkpoint boundary, so assert on the seed operator's plan over
    # the same LSH edge list it seeds from.
    from las_vpe_platform_spark.operators.dedup import minhash_lsh_candidates
    from las_vpe_platform_spark.operators.graph import adjacency_support
    from las_vpe_platform_spark.queries_data import (
        MINHASH_BANDS,
        MINHASH_HASHES,
        MINHASH_K,
    )
    from las_vpe_platform_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    pairs = minhash_lsh_candidates(
        docs, id_col="doc_id", text_col="text",
        shingle_k=MINHASH_K, num_hashes=MINHASH_HASHES, bands=MINHASH_BANDS,
    ).selectExpr("id_a AS a", "id_b AS b")
    plan = _plan(adjacency_support(pairs))
    assert "array_intersect" in plan
    assert "collect_list" in plan
    assert "ArrowEvalPython" not in plan  # support math never in Python


def test_q179_exchanges_probe_keyed_only(spark, sf_dir):
    # two-stage retrieval: stage 1 is the ivf_topk shape (gallery never
    # hash-shuffles — its assignment rides broadcast folds), stage 2
    # adds only probe-keyed windows; outside the staged (cached)
    # subtrees every hash exchange leads with probe_key.
    import re

    from las_vpe_platform_spark.queries_data import q179_two_stage_retrieval

    plan = outside_cached_plans(_plan(q179_two_stage_retrieval(spark, sf_dir)))
    all_hash = re.findall(r"Exchange hashpartitioning\((\w+)", plan)
    other = [m for m in all_hash if m != "probe_key"]
    assert not other, f"unexpected gallery-side shuffle on {other}"


def test_q180_single_corpus_pass_then_metadata(spark, sf_dir):
    # the compaction plan touches the (staged) LSH pair set with ONE
    # hash-partition aggregate; everything after rides the tiny
    # partition summary (pack_sequences' range exchange + broadcasts),
    # so no exchange above the summary may be corpus-keyed.
    from las_vpe_platform_spark.queries_data import q180_edge_compaction_plan

    plan = outside_cached_plans(_plan(q180_edge_compaction_plan(spark, sf_dir)))
    assert "CartesianProduct" not in plan
    # the only hash exchanges lead with part_id (the 48-row summary key)
    import re

    all_hash = re.findall(r"Exchange hashpartitioning\((\w+)", plan)
    # part_id (the summary key) and pack_sequences' internal _pid
    # offset fold are the only legal hash-exchange keys up here
    other = [m for m in all_hash if m not in ("part_id", "_pid")]
    assert not other, f"unexpected corpus-keyed shuffle on {other}"
