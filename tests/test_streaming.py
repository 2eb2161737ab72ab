"""Structured Streaming backend tests: batch/stream parity (SURVEY §7.2
step 5 — "same fixture in, same tables out").
"""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from las_vpe_platform_spark.sources.tables import load_table
from las_vpe_platform_spark.streaming.engine import (
    file_stream,
    foreach_batch_upsert,
    run_to_completion,
    stream_term_sig_filter,
    watermarked_full_outer_join,
    windowed_counts,
)

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


@pytest.fixture(scope="module")
def events_dir(spark, sf_dir, tmp_path_factory):
    """Re-land the events table as a multi-file parquet directory so the
    file stream sees several micro-batches."""
    out = str(tmp_path_factory.mktemp("events_stream"))
    shutil.rmtree(out, ignore_errors=True)
    (load_table(spark, sf_dir, "events")
     .withColumn("ts", F.col("ts").cast("timestamp"))  # LTZ: watermarks need absolute time
     .repartition(4).write.mode("overwrite").parquet(out))
    return out


def test_windowed_counts_matches_batch(spark, events_dir):
    stream = file_stream(spark, events_dir, EVENTS_SCHEMA, max_files_per_trigger=2)
    agg = windowed_counts(stream, "ts", ["event_type"], "5 minutes", "10 minutes")
    got = run_to_completion(
        agg.select(
            F.col("window.start").cast("string").alias("window_start"),
            "event_type",
            "n",
        ),
        "windowed_counts_t",
        output_mode="complete",
    )
    batch = (
        spark.read.parquet(events_dir)
        .groupBy(
            F.date_trunc("minute", "ts").alias("m"), "event_type"
        )  # placeholder; real compare below
    )
    expected = (
        spark.read.parquet(events_dir)
        .groupBy(
            F.window("ts", "5 minutes").getField("start").cast("string").alias("window_start"),
            "event_type",
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    g = {(r["window_start"], r["event_type"]): r["n"] for r in got.collect()}
    e = {(r["window_start"], r["event_type"]): r["n"] for r in expected.collect()}
    assert g == e and len(g) > 0


def test_stream_term_sig_filter(spark, events_dir):
    kills = spark.createDataFrame([(1,), (2,), (3,)], ["user_id"])
    stream = file_stream(spark, events_dir, EVENTS_SCHEMA, max_files_per_trigger=2)
    alive = stream_term_sig_filter(stream, kills, key="user_id")
    got = run_to_completion(alive, "term_sig_t")
    users = {r["user_id"] for r in got.select("user_id").distinct().collect()}
    assert not users & {1, 2, 3}
    total_all = spark.read.parquet(events_dir).count()
    total_killed = (
        spark.read.parquet(events_dir).filter(F.col("user_id").isin(1, 2, 3)).count()
    )
    assert got.count() == total_all - total_killed


def test_watermarked_full_outer_join_parity(spark, events_dir, tmp_path):
    """Stream-stream full outer == batch full outer once all data is
    processed (the J1-J7 replacement, with in-range matching).

    Exact parity needs (a) arrival disorder bounded by the watermark —
    here a single trigger — and (b) a watermark-advancing sentinel so
    the final unmatched rows flush out of the state store. The
    reference's processing-time windows had the same end-of-stream
    caveat (unflushed bufDuration remainders at shutdown).
    """
    src = str(tmp_path / "join_src")
    base = spark.read.parquet(events_dir)
    max_ts = base.agg(F.max("ts")).collect()[0][0]
    sentinel = spark.createDataFrame(
        [
            (-999, max_ts, -1, "click", 0.0, "{}"),
            (-998, max_ts, -1, "purchase", 0.0, "{}"),
        ],
        EVENTS_SCHEMA,
    ).withColumn("ts", F.col("ts") + F.expr("INTERVAL 1 hour"))
    base.unionByName(sentinel).coalesce(1).write.mode("overwrite").parquet(src)

    stream = file_stream(spark, src, EVENTS_SCHEMA, max_files_per_trigger=999)
    # split one stream into two sides by event type (tracklet/attr analog)
    left = stream.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("key"), F.col("ts").alias("l_ts"), "event_id"
    )
    right = stream.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("key"), F.col("ts").alias("r_ts"),
        F.col("event_id").alias("r_event_id"),
    )
    joined = watermarked_full_outer_join(
        left, right, on=["key"], left_ts="l_ts", right_ts="r_ts", buf_duration="10 minutes"
    )
    got = run_to_completion(
        joined.filter(~F.col("event_id").isin(-999, -998) | F.col("event_id").isNull())
        .filter(~F.col("r_event_id").isin(-999, -998) | F.col("r_event_id").isNull())
        .filter(F.col("event_id").isNotNull() | F.col("r_event_id").isNotNull())
        .select("event_id", "r_event_id"),
        "wm_join_t",
        output_mode="append",
    )
    batch = spark.read.parquet(events_dir)
    bl = batch.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("key"), F.col("ts").alias("l_ts"), "event_id"
    )
    br = batch.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("key"), F.col("ts").alias("r_ts"),
        F.col("event_id").alias("r_event_id"),
    )
    bj = bl.join(
        br,
        (bl.key == br.key)
        & (br.r_ts >= bl.l_ts - F.expr("INTERVAL 10 minutes"))
        & (br.r_ts <= bl.l_ts + F.expr("INTERVAL 10 minutes")),
        "full_outer",
    ).select("event_id", "r_event_id")

    def canon(df):
        return sorted(
            (
                -1 if r["event_id"] is None else r["event_id"],
                -1 if r["r_event_id"] is None else r["r_event_id"],
            )
            for r in df.collect()
        )

    assert canon(got) == canon(bj)
    assert got.count() > 0


def test_foreach_batch_upsert_idempotent(spark, events_dir, tmp_path):
    target = str(tmp_path / "sinked")
    sink = foreach_batch_upsert(target, key_cols=["event_id"])
    stream = file_stream(spark, events_dir, EVENTS_SCHEMA, max_files_per_trigger=2)
    q = stream.writeStream.foreachBatch(sink).start()
    q.processAllAvailable()
    q.stop()
    written = spark.read.parquet(target)
    assert written.count() == spark.read.parquet(events_dir).count()
    assert written.select("event_id").distinct().count() == written.count()


def test_upsert_same_key_across_epochs_reads_once(spark, tmp_path):
    """K3/K5 cross-epoch parity: the same key written in two different
    epochs resolves to ONE row (the later epoch's values) on the
    canonical read path."""
    from las_vpe_platform_spark.streaming.engine import read_upsert_table

    target = str(tmp_path / "upsert")
    sink = foreach_batch_upsert(target, key_cols=["k"])
    epoch0 = spark.createDataFrame([("a", 1), ("b", 1)], "k string, v int")
    epoch1 = spark.createDataFrame([("b", 2), ("c", 2)], "k string, v int")
    sink(epoch0, 0)
    sink(epoch1, 1)
    # raw table holds the duplicate; the canonical view resolves it
    assert spark.read.parquet(target).count() == 4
    got = {r["k"]: r["v"] for r in read_upsert_table(spark, target, ["k"]).collect()}
    assert got == {"a": 1, "b": 2, "c": 2}
    # a retried epoch overwrites itself — still one row per key
    sink(epoch1, 1)
    got = {r["k"]: r["v"] for r in read_upsert_table(spark, target, ["k"]).collect()}
    assert got == {"a": 1, "b": 2, "c": 2}


def test_compact_upsert_table_folds_epochs_latest_wins(spark, tmp_path):
    """VERDICT r2 'What's missing' #5: N overlapping epoch dirs fold
    into ONE snapshot dir; read_upsert_table is identical before and
    after, and a LATER stream epoch still wins its keys."""
    import os

    from las_vpe_platform_spark.operators.maintenance import compact_upsert_table
    from las_vpe_platform_spark.streaming.engine import read_upsert_table

    target = str(tmp_path / "upsert")
    sink = foreach_batch_upsert(target, key_cols=["k"])
    sink(spark.createDataFrame([("a", 1), ("b", 1)], "k string, v int"), 0)
    sink(spark.createDataFrame([("b", 2), ("c", 2)], "k string, v int"), 1)
    sink(spark.createDataFrame([("c", 3), ("d", 3)], "k string, v int"), 2)

    before = {r["k"]: r["v"] for r in read_upsert_table(spark, target, ["k"]).collect()}
    assert compact_upsert_table(spark, target, key_cols=["k"]) == 3
    epoch_dirs = [d for d in os.listdir(target) if d.startswith("epoch=")]
    assert epoch_dirs == ["epoch=2"]
    after = {r["k"]: r["v"] for r in read_upsert_table(spark, target, ["k"]).collect()}
    assert after == before == {"a": 1, "b": 2, "c": 3, "d": 3}

    # the stream keeps running: a later epoch still beats the snapshot
    sink(spark.createDataFrame([("d", 4)], "k string, v int"), 3)
    got = {r["k"]: r["v"] for r in read_upsert_table(spark, target, ["k"]).collect()}
    assert got == {"a": 1, "b": 2, "c": 3, "d": 4}

    # idempotent: a single-epoch table is a no-op... (after epoch 3
    # there are two dirs again, so fold once more, then no-op)
    assert compact_upsert_table(spark, target, key_cols=["k"]) == 2
    assert compact_upsert_table(spark, target, key_cols=["k"]) == 0


def test_metrics_collector(spark, events_dir):
    from las_vpe_platform_spark.streaming.monitor import MetricsCollector

    collector = MetricsCollector.install(spark)
    try:
        stream = file_stream(spark, events_dir, EVENTS_SCHEMA, max_files_per_trigger=2)
        run_to_completion(stream.groupBy("event_type").count(), "metrics_t", "complete")
        import time

        for _ in range(20):  # listener callbacks are async
            if collector.progress:
                break
            time.sleep(0.5)
        report = collector.report(spark)
        rows = report.collect()
        assert rows, "no progress events collected"
        assert sum(r["num_input_rows"] or 0 for r in rows) > 0
    finally:
        collector.uninstall(spark)


def test_stateful_sessionization(spark, events_dir):
    """Streaming closed sessions == batch sessionization's closed
    sessions (every session except each user's last one)."""
    from las_vpe_platform_spark.streaming.stateful import sessionize_stream

    stream = file_stream(spark, events_dir, EVENTS_SCHEMA, max_files_per_trigger=999)
    sessions = sessionize_stream(stream, "user_id", "ts", gap_seconds=1800)
    got = run_to_completion(sessions, "sessions_t", output_mode="append")

    # batch reference: lag/gap sessionization, drop each user's last session
    from pyspark.sql import Window as W

    ev = spark.read.parquet(events_dir)
    w = W.partitionBy("user_id").orderBy("ts")
    gap = F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))
    sess = (
        ev.withColumn("new_s", F.when(gap > 1800 * 1_000_000, 1).otherwise(0))
        .withColumn("sid", F.sum("new_s").over(w.rowsBetween(W.unboundedPreceding, 0)))
        .groupBy("user_id", "sid")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )
    last_sid = sess.groupBy("user_id").agg(F.max("sid").alias("max_sid"))
    closed_batch = sess.join(last_sid, on="user_id").filter(
        F.col("sid") < F.col("max_sid")
    )

    def canon(df):
        return sorted(
            (r["user_id"], str(r["session_start"]), str(r["session_end"]), r["n_events"])
            for r in df.collect()
        )

    assert canon(got) == canon(closed_batch)
    assert got.count() > 0


def test_stateful_sessionization_tws_parity(spark, events_dir):
    """The transformWithStateInPandas sessionizer (Spark 4 successor
    API, RocksDB state store) produces byte-identical closed sessions
    to the applyInPandasWithState one.

    Environment-gated like the Kafka integration: the TWS Python
    driver worker imports google.protobuf, which this container lacks
    (no pip allowed). The processor's session math is the SAME code
    path as the tested applyInPandasWithState sessionizer.
    """
    import pytest

    try:
        from google.protobuf import descriptor  # noqa: F401
    except ImportError:
        pytest.skip(
            "transformWithStateInPandas needs the protobuf package "
            "(absent in this container; no pip installs allowed)"
        )
    from las_vpe_platform_spark.streaming.stateful import (
        sessionize_stream,
        sessionize_stream_tws,
    )

    prior = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        stream = file_stream(spark, events_dir, EVENTS_SCHEMA, max_files_per_trigger=999)
        got_tws = run_to_completion(
            sessionize_stream_tws(stream, "user_id", "ts", gap_seconds=1800),
            "sessions_tws_t",
            output_mode="append",
        )
        rows_tws = sorted(
            (r["user_id"], str(r["session_start"]), str(r["session_end"]), r["n_events"])
            for r in got_tws.collect()
        )
    finally:
        if prior is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prior)
    stream = file_stream(spark, events_dir, EVENTS_SCHEMA, max_files_per_trigger=999)
    got_aip = run_to_completion(
        sessionize_stream(stream, "user_id", "ts", gap_seconds=1800),
        "sessions_aip_t",
        output_mode="append",
    )
    rows_aip = sorted(
        (r["user_id"], str(r["session_start"]), str(r["session_end"]), r["n_events"])
        for r in got_aip.collect()
    )
    assert rows_tws == rows_aip and len(rows_tws) > 0


def test_streaming_tracking_pipeline(spark, tmp_path):
    """The tracking stage on a STREAM of videos (the reference's actual
    operating mode: HDFSVideoTrackingStream) — mapInPandas UDTF applied
    to a streaming frame, sunk with foreachBatch, equal to batch."""
    from las_vpe_platform_spark.fixtures import FIXTURES_DIR
    from las_vpe_platform_spark.providers import fake_tracker

    videos = spark.read.parquet(str(FIXTURES_DIR / "videos.parquet")).limit(16)
    src = str(tmp_path / "video_stream")
    videos.repartition(4).write.mode("overwrite").parquet(src)

    schema = videos.schema
    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", "1").parquet(src)
    )
    tracked = fake_tracker(stream)
    target = str(tmp_path / "tracklets_out")

    def sink(batch, epoch_id):
        if batch.count():
            batch.write.mode("append").parquet(target)

    q = tracked.writeStream.foreachBatch(sink).start()
    q.processAllAvailable()
    q.stop()

    got = spark.read.parquet(target).select("tracklet_key", "num_tracklets")
    want = fake_tracker(videos).select("tracklet_key", "num_tracklets")
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_streaming_track_attrrecog_pipeline(spark, tmp_path):
    """track -> attrrecog on a video stream via foreachBatch (tracklet
    locality per micro-batch: each video's tracklets and samples are
    complete within its batch, so the A1 average needs no cross-batch
    state). Output equals the batch pipeline (catalog d11)."""
    from las_vpe_platform_spark.fixtures import FIXTURES_DIR
    from las_vpe_platform_spark.operators.aggregates import wide_avg
    from las_vpe_platform_spark.plans.pipeline import BatchExecutor, compile_command
    from las_vpe_platform_spark.providers import (
        fake_recognizer_sql,
        fake_tracker,
        recognizer_drop_filter,
    )
    from las_vpe_platform_spark.schemas import ATTRIBUTE_NAMES

    videos = spark.read.parquet(str(FIXTURES_DIR / "videos.parquet")).limit(8)
    src = str(tmp_path / "vstream")
    videos.repartition(2).write.mode("overwrite").parquet(src)
    target = str(tmp_path / "attrs_out")

    def attr_stage(batch_videos, epoch_id):
        if not batch_videos.count():
            return
        tracked = fake_tracker(batch_videos)
        samples = (
            tracked.select(
                "tracklet_key", F.posexplode("location_sequence").alias("sample_idx", "box")
            )
            .filter(F.col("box.patch_data").isNotNull())
            .select("tracklet_key", "sample_idx")
        )
        samples = samples.filter(recognizer_drop_filter(samples))
        attrs = wide_avg(fake_recognizer_sql(samples), ["tracklet_key"], ATTRIBUTE_NAMES)
        attrs.write.mode("append").parquet(target)

    stream = (
        spark.readStream.schema(videos.schema).option("maxFilesPerTrigger", "1").parquet(src)
    )
    q = stream.writeStream.foreachBatch(attr_stage).start()
    q.processAllAvailable()
    q.stop()

    got = {r["tracklet_key"]: r for r in spark.read.parquet(target).collect()}
    batch_out = BatchExecutor(spark).run(compile_command("track-attrrecog"), videos)
    want = {r["tracklet_key"]: r for r in batch_out["attr_recog"].collect()}
    assert set(got) == set(want) and len(got) > 0
    import math

    for key in list(got)[:30]:
        for name in ATTRIBUTE_NAMES[:8]:
            assert math.isclose(got[key][name], want[key][name], abs_tol=1e-9)


def test_stateful_sessionization_event_time_flush(spark, events_dir, tmp_path):
    """With event-time timeouts EVERY session flushes once the
    watermark passes it — streaming output equals FULL batch
    sessionization (not just sessions with a closing successor)."""
    from las_vpe_platform_spark.streaming.stateful import sessionize_stream_event_time

    # sentinel far in the future advances the watermark past all real
    # sessions on the final trigger
    src = str(tmp_path / "sess_src")
    base = spark.read.parquet(events_dir)
    max_ts = base.agg(F.max("ts")).collect()[0][0]
    sentinel = spark.createDataFrame(
        [(-999, max_ts, -1, "click", 0.0, "{}")], EVENTS_SCHEMA
    ).withColumn("ts", F.col("ts") + F.expr("INTERVAL 10 hours"))
    base.unionByName(sentinel).coalesce(1).write.mode("overwrite").parquet(src)

    stream = file_stream(spark, src, EVENTS_SCHEMA, max_files_per_trigger=999)
    sessions = sessionize_stream_event_time(
        stream, "user_id", "ts", gap_seconds=1800, watermark="1 second"
    )
    got = run_to_completion(
        sessions.filter(F.col("user_id") != -1), "sessions_et_t", output_mode="append"
    )

    from pyspark.sql import Window as W

    ev = spark.read.parquet(events_dir)
    w = W.partitionBy("user_id").orderBy("ts")
    gap = F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))
    all_batch = (
        ev.withColumn("new_s", F.when(gap > 1800 * 1_000_000, 1).otherwise(0))
        .withColumn("sid", F.sum("new_s").over(w.rowsBetween(W.unboundedPreceding, 0)))
        .groupBy("user_id", "sid")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )

    def canon(df):
        return sorted(
            (r["user_id"], str(r["session_start"]), str(r["session_end"]), r["n_events"])
            for r in df.collect()
        )

    assert canon(got) == canon(all_batch)
    assert got.count() == all_batch.count() > 0


def test_streaming_reid_join_domain(spark, tmp_path):
    """The reference's centerpiece on domain payloads: a tracklet
    stream full-outer-joined with an attribute stream under watermarks
    (PedestrianReIDUsingAttrApp's J1-J7 collapsed to one join). The
    fixture's ~10% attribute-less tracklets must surface as unmatched
    left rows; matched pairs must carry both sides."""
    from las_vpe_platform_spark.fixtures import FIXTURES_DIR

    tr = (
        spark.read.parquet(str(FIXTURES_DIR / "tracklets.parquet"))
        .select("tracklet_key", F.col("start_ts").cast("timestamp").alias("t_ts"))
    )
    at = (
        spark.read.parquet(str(FIXTURES_DIR / "attributes.parquet"))
        .join(tr, on="tracklet_key")
        .select("tracklet_key", F.col("t_ts").alias("a_ts"), "gender_male")
    )
    max_ts = tr.agg(F.max("t_ts")).collect()[0][0]
    t_src, a_src = str(tmp_path / "t_src"), str(tmp_path / "a_src")
    t_sent = spark.createDataFrame([("__sentinel_t", max_ts)], "tracklet_key string, t_ts timestamp") \
        .withColumn("t_ts", F.col("t_ts") + F.expr("INTERVAL 2 hours"))
    a_sent = spark.createDataFrame([("__sentinel_a", max_ts, 0.0)],
                                   "tracklet_key string, a_ts timestamp, gender_male double") \
        .withColumn("a_ts", F.col("a_ts") + F.expr("INTERVAL 2 hours"))
    tr.unionByName(t_sent).coalesce(1).write.mode("overwrite").parquet(t_src)
    at.unionByName(a_sent).coalesce(1).write.mode("overwrite").parquet(a_src)

    t_stream = file_stream(spark, t_src, "tracklet_key string, t_ts timestamp", 999)
    a_stream = file_stream(
        spark, a_src, "tracklet_key string, a_ts timestamp, gender_male double", 999
    )
    # watermarked full outer on key + bufDuration time range
    lw = t_stream.withWatermark("t_ts", "10 minutes")
    rw = a_stream.withColumnRenamed("tracklet_key", "a_key").withWatermark("a_ts", "10 minutes")
    cond = (
        (lw["tracklet_key"] == rw["a_key"])
        & (rw["a_ts"] >= lw["t_ts"] - F.expr("INTERVAL 10 minutes"))
        & (rw["a_ts"] <= lw["t_ts"] + F.expr("INTERVAL 10 minutes"))
    )
    out = lw.join(rw, cond, "full_outer").select("tracklet_key", "a_key", "gender_male")
    got = run_to_completion(
        out.filter(
            (~F.col("tracklet_key").isin("__sentinel_t") | F.col("tracklet_key").isNull())
            & (~F.col("a_key").isin("__sentinel_a") | F.col("a_key").isNull())
        ),
        "reid_domain_t",
        output_mode="append",
    )
    n_tracklets = tr.count()
    n_attrs = at.count()
    matched = got.filter(F.col("tracklet_key").isNotNull() & F.col("a_key").isNotNull())
    t_only = got.filter(F.col("a_key").isNull() & F.col("tracklet_key").isNotNull())
    assert matched.count() == n_attrs          # every attribute row matches its tracklet
    assert t_only.count() == n_tracklets - n_attrs  # the ~10% attribute-less remainder
    assert matched.filter(F.col("gender_male").isNull()).count() == 0


def test_checkpoint_recovery_exactly_once(spark, events_dir, tmp_path):
    """T3/T4: a restarted query resumes from its checkpoint — files
    processed before the restart are NOT reprocessed, new files are,
    and the idempotent sink yields exactly-once output overall."""
    src = str(tmp_path / "recov_src")
    ckpt = str(tmp_path / "recov_ckpt")
    target = str(tmp_path / "recov_out")
    base = spark.read.parquet(events_dir)
    first_half = base.filter(F.col("event_id") % 2 == 0)
    second_half = base.filter(F.col("event_id") % 2 == 1)
    first_half.coalesce(2).write.mode("overwrite").parquet(src)

    sink = foreach_batch_upsert(target, key_cols=["event_id"])

    def run_once():
        q = (
            spark.readStream.schema(EVENTS_SCHEMA)
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run_once()
    written_1 = spark.read.parquet(target)
    assert written_1.count() == first_half.count()

    # new data lands; restart from the same checkpoint
    second_half.coalesce(2).write.mode("append").parquet(src)
    run_once()
    written_2 = spark.read.parquet(target)
    assert written_2.count() == base.count()                       # nothing lost
    assert written_2.select("event_id").distinct().count() == base.count()  # nothing duplicated


def test_dedup_stream_bounded_state_reemits_after_horizon(spark, tmp_path):
    """dropDuplicatesWithinWatermark contract: duplicates inside the
    delay horizon are dropped; a duplicate arriving after the
    watermark passed key_ts + delay re-emits (state was reclaimed) —
    the bounded-state trade documented on dedup_stream."""
    import pyspark.sql.types as T

    from las_vpe_platform_spark.streaming.engine import (
        dedup_stream,
        file_stream,
    )

    schema = T.StructType(
        [T.StructField("k", T.StringType()), T.StructField("ts_s", T.LongType())]
    )
    src = tmp_path / "src"
    src.mkdir()

    def land(name, rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(str(src / name))

    base = 1_700_000_000
    # batch 1: key A at t0 (+ in-horizon duplicate); batch 2 advances
    # the watermark far past t0 + 10min; batch 3 lets the eviction
    # land (state cleanup uses the PREVIOUS batch's closing watermark,
    # so expired state survives exactly one extra batch); batch 4
    # repeats key A after its state is gone
    land("b1", [("A", base), ("A", base + 60), ("B", base)])
    land("b2", [("C", base + 7200)])
    land("b3", [("D", base + 7210)])
    land("b4", [("A", base + 7260)])

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .option("latestFirst", "false")
        .parquet(str(src / "*"))
        .withColumn("ts", F.timestamp_seconds("ts_s"))
    )
    deduped = dedup_stream(stream, ["k"], "ts", delay="10 minutes").select("k")
    q = (
        deduped.writeStream.outputMode("append")
        .format("memory")
        .queryName("dedup_horizon")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = sorted(r["k"] for r in spark.sql("SELECT k FROM dedup_horizon").collect())
    # A emitted twice (horizon passed between b1 and b4), rest once
    assert got == ["A", "A", "B", "C", "D"]


def test_locf_state_recovered_across_restart(spark, sf_dir, tmp_path):
    """T3 for CUSTOM state (applyInPandasWithState): stop the LOCF
    stream after the first time slice, restart from the checkpoint
    over a newly-landed second slice, and every slice-2 row must carry
    the slice-1 fill value until its user's next click — i.e. the
    two-scalar state was restored, not rebuilt. Oracle: batch window
    LOCF over the full table."""
    from pyspark.sql import Window as W

    from las_vpe_platform_spark.streaming.stateful import locf_stream

    ev = (
        load_table(spark, sf_dir, "events")
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .select("event_id", "ts", "user_id", "event_type", "value", "props")
    )
    lo, hi = ev.agg(F.min("ts"), F.max("ts")).first()
    mid = lo + (hi - lo) / 2
    src = str(tmp_path / "locf_src")
    ckpt = str(tmp_path / "locf_ckpt")
    out = str(tmp_path / "locf_out")
    ev.filter(F.col("ts") < mid).coalesce(1).write.mode("overwrite").parquet(src)

    def run_once():
        stream = (
            spark.readStream.schema(EVENTS_SCHEMA)
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
        )
        q = (
            locf_stream(stream, fill_type="click")
            .writeStream.outputMode("append")
            .format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run_once()
    n_first = spark.read.parquet(out).count()
    assert n_first == ev.filter(F.col("ts") < mid).count()

    # second slice lands; RESTART from the same checkpoint
    ev.filter(F.col("ts") >= mid).coalesce(1).write.mode("append").parquet(src)
    run_once()

    got = {
        r["event_id"]: r["filled_click_value"]
        for r in spark.read.parquet(out).collect()
    }
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    want = {
        r["event_id"]: r["want"]
        for r in ev.select(
            "event_id",
            F.last(
                F.when(F.col("event_type") == "click", F.col("value")),
                ignorenulls=True,
            ).over(w).alias("want"),
        ).collect()
    }
    assert got.keys() == want.keys()
    mismatch = [k for k in got if (got[k] is None) != (want[k] is None)
                or (got[k] is not None and abs(got[k] - want[k]) > 1e-9)]
    assert not mismatch, f"{len(mismatch)} rows lost their carried state, e.g. {mismatch[:5]}"


def test_trigram_state_recovered_across_restart(spark, sf_dir, tmp_path):
    """T3 for the trigram miner's custom state: stop after the first
    time slice, restart from the checkpoint over a newly-landed second
    slice — the boundary trigrams (spanning the restart) must appear
    exactly once, i.e. the two-event-type carry was restored, not
    rebuilt and not replayed. Oracle: batch lead()-window trigrams
    over the full table."""
    from pyspark.sql import Window as W

    from las_vpe_platform_spark.streaming.stateful import trigram_stream

    ev = (
        load_table(spark, sf_dir, "events")
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .select("event_id", "ts", "user_id", "event_type", "value", "props")
    )
    lo, hi = ev.agg(F.min("ts"), F.max("ts")).first()
    mid = lo + (hi - lo) / 2
    src = str(tmp_path / "tri_src")
    ckpt = str(tmp_path / "tri_ckpt")
    out = str(tmp_path / "tri_out")
    ev.filter(F.col("ts") < mid).coalesce(1).write.mode("overwrite").parquet(src)

    def run_once():
        stream = (
            spark.readStream.schema(EVENTS_SCHEMA)
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
        )
        q = (
            trigram_stream(stream)
            .writeStream.outputMode("append")
            .format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run_once()
    ev.filter(F.col("ts") >= mid).coalesce(1).write.mode("append").parquet(src)
    run_once()

    got = sorted(
        (r["user_id"], r["e1"], r["e2"], r["e3"])
        for r in spark.read.parquet(out).collect()
    )
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    want = sorted(
        (r["user_id"], r["e1"], r["e2"], r["e3"])
        for r in ev.select(
            "user_id",
            F.col("event_type").alias("e1"),
            F.lead("event_type", 1).over(w).alias("e2"),
            F.lead("event_type", 2).over(w).alias("e3"),
        )
        .filter(F.col("e3").isNotNull())
        .collect()
    )
    assert got == want, (
        f"trigram multiset diverged after restart: {len(got)} vs {len(want)}"
    )


def test_ivf_assign_cells_argmax_and_tiebreak(spark):
    # the assignment contract the s13 oracle mirrors: nearest centroid
    # by cosine, ties broken toward the LARGER centroid id (array_max
    # on (sim, id) structs == ORDER BY sim DESC, id DESC)
    from las_vpe_platform_spark.queries_streaming import ivf_assign_cells

    rows = [
        (1, [1.0, 0.0], 0),   # exactly centroid 0's direction
        (2, [0.0, 2.0], 0),   # exactly centroid 100's direction
        (3, [1.0, 1.0], 0),   # equidistant -> tie -> larger id (100)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    out = {
        r["centroid_id"]: r["n_assigned"]
        for r in ivf_assign_cells(
            df, [(0, [1.0, 0.0]), (100, [0.0, 1.0])]
        ).collect()
    }
    assert out == {0: 1, 100: 2}


def test_s14_survivor_rate_and_bounds(spark, sf_dir):
    # the sketch's data-movement claim: only ~1/RATE_DIV of rows cross
    # to the survivor sink (md5 is uniform, so the realized rate sits
    # near the nominal one), and estimates stay inside the group's
    # true value range
    from las_vpe_platform_spark.queries_streaming import (
        S14_RATE_DIV,
        s14_stream_quantile_sketch,
    )

    out = s14_stream_quantile_sketch(spark, sf_dir).collect()
    assert out
    total_n = sum(r["n"] for r in out)
    total_s = sum(r["sample_n"] for r in out)
    nominal = total_n / S14_RATE_DIV
    assert nominal / 3 <= total_s <= nominal * 3, (total_s, nominal)
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    rng = {
        r["event_type"]: (r["mn"], r["mx"])
        for r in ev.groupBy("event_type")
        .agg(F.min("value").alias("mn"), F.max("value").alias("mx"))
        .collect()
    }
    for r in out:
        mn, mx = rng[r["event_type"]]
        for c in ("p50_est", "p90_est", "p99_est"):
            assert mn - 1e-6 <= r[c] <= mx + 1e-6, (r["event_type"], c, r[c])
        assert r["sample_n"] <= r["n"]


def test_anomaly_state_recovered_across_restart(spark, sf_dir, tmp_path):
    """T3 for the anomaly detector's custom state: stop after the
    first time slice, restart from the checkpoint over a second slice
    — slice-2 flags must be computed against the FULL running (n, sum,
    sumsq), i.e. the three-scalar state was restored, not rebuilt.
    Oracle: batch running-window statistics over the full table."""
    from pyspark.sql import Window as W

    from las_vpe_platform_spark.streaming.stateful import (
        ANOMALY_MIN_N,
        ANOMALY_NSIGMA,
        anomaly_stream,
    )

    ev = (
        load_table(spark, sf_dir, "events")
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .select("event_id", "ts", "user_id", "event_type", "value", "props")
    )
    lo, hi = ev.agg(F.min("ts"), F.max("ts")).first()
    mid = lo + (hi - lo) / 2
    src = str(tmp_path / "anom_src")
    ckpt = str(tmp_path / "anom_ckpt")
    out = str(tmp_path / "anom_out")
    ev.filter(F.col("ts") < mid).coalesce(1).write.mode("overwrite").parquet(src)

    def run_once():
        stream = (
            spark.readStream.schema(EVENTS_SCHEMA)
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
        )
        q = (
            anomaly_stream(stream)
            .writeStream.outputMode("append")
            .format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run_once()
    ev.filter(F.col("ts") >= mid).coalesce(1).write.mode("append").parquet(src)
    run_once()

    got = sorted(r["event_id"] for r in spark.read.parquet(out).collect())
    w = (
        W.partitionBy("event_type")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    stats = ev.select(
        "event_id",
        "value",
        F.count("value").over(w).alias("n_prev"),
        F.sum("value").over(w).alias("s_prev"),
        F.sum(F.col("value") * F.col("value")).over(w).alias("ss_prev"),
    )
    want = sorted(
        r["event_id"]
        for r in stats.filter(
            (F.col("n_prev") >= ANOMALY_MIN_N)
            & (
                F.abs(F.col("value") - F.col("s_prev") / F.col("n_prev"))
                > ANOMALY_NSIGMA
                * F.sqrt(
                    F.greatest(
                        (
                            F.col("ss_prev")
                            - F.col("s_prev") * F.col("s_prev") / F.col("n_prev")
                        )
                        / (F.col("n_prev") - 1),
                        F.lit(0.0),
                    )
                )
            )
        ).collect()
    )
    assert got == want, (
        f"anomaly set diverged after restart: {len(got)} vs {len(want)}"
    )


# --- s24: the live track->attrrecog->reid flagship ---------------------------


def test_broadcast_gallery_topk_matches_batch_blas(spark):
    """The streaming-safe broadcast-gallery ranking must agree with the
    batch BLAS operator (pairwise_similarity_topk) on the same probe
    set — same tie-break, same top-k, per probe."""
    from las_vpe_platform_spark.fixtures import FIXTURES_DIR
    from las_vpe_platform_spark.operators.joins import (
        broadcast_gallery_topk,
        pairwise_similarity_topk,
    )

    features = spark.read.parquet(str(FIXTURES_DIR / "features.parquet"))
    probes = features.filter(F.col("tracklet_key").contains("CAM01")).limit(40)
    got = broadcast_gallery_topk(
        probes, features, probe_key="tracklet_key", gallery_key="tracklet_key",
        vector_col="feature", k=5, passthrough=["tracklet_key"],
    ).select("tracklet_key", "rank", "gallery_key")
    want = pairwise_similarity_topk(
        probes, features, probe_key="tracklet_key", gallery_key="tracklet_key",
        vector_col="feature", k=5,
    ).select(
        F.col("probe_key").alias("tracklet_key"), F.col("rank").cast("long"), "gallery_key"
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_broadcast_gallery_topk_null_vector_passthrough(spark):
    """A probe row with a NULL vector emits exactly ONE row with NULL
    rank/gallery_key (the leftover-flush contract of the live path)."""
    from las_vpe_platform_spark.fixtures import FIXTURES_DIR
    from las_vpe_platform_spark.operators.joins import broadcast_gallery_topk

    features = spark.read.parquet(str(FIXTURES_DIR / "features.parquet"))
    probes = features.limit(3).withColumn(
        "feature",
        F.when(F.col("tracklet_key") > "", None).cast("array<float>"),
    )
    out = broadcast_gallery_topk(
        probes, features, probe_key="tracklet_key", gallery_key="tracklet_key",
        vector_col="feature", k=5, passthrough=["tracklet_key"],
    ).collect()
    assert len(out) == 3
    assert all(r["rank"] is None and r["gallery_key"] is None for r in out)


def test_s24_emission_and_fanout_contract(spark, sf_dir):
    """The flagship's structural invariants, independent of the oracle:
    every matched tracklet emits exactly S24_K ranked rows; every
    recognizer-dropped tracklet emits exactly ONE null row; the emitted
    key set is exactly {window_end <= max(start_ts) - watermark} — the
    empirically derived multi-stateful emission rule pinned by
    S17_PINNED_SPARK_MINOR."""
    import pyspark

    from las_vpe_platform_spark.fixtures import FIXTURES_DIR
    from las_vpe_platform_spark.providers import recognizer_drop_filter
    from las_vpe_platform_spark.queries_streaming import (
        S24_K,
        S24_WM_MINUTES,
        s24_stream_track_attr_reid,
    )
    from las_vpe_platform_spark.queries_streaming import S17_PINNED_SPARK_MINOR

    assert tuple(int(x) for x in pyspark.__version__.split(".")[:2]) == (
        S17_PINNED_SPARK_MINOR
    ), "Spark minor bumped: re-derive the s24 emission rule batch-by-batch"

    out = s24_stream_track_attr_reid(spark, sf_dir).cache()
    tr = spark.read.parquet(str(FIXTURES_DIR / "tracklets.parquet"))
    mx = tr.agg(F.max("start_ts")).first()[0]
    gate = (
        F.unix_micros(F.date_trunc("hour", "start_ts"))
        + F.lit(3_600_000_000)
        <= F.unix_micros(F.lit(mx)) - F.lit(S24_WM_MINUTES * 60_000_000)
    )
    emitted = tr.filter(gate)
    kept = emitted.filter(recognizer_drop_filter(emitted))
    n_kept = kept.count()
    n_drop = emitted.count() - n_kept
    per_key = out.groupBy("tracklet_key").agg(
        F.count(F.lit(1)).alias("n"),
        F.max(F.col("rank").isNull().cast("int")).alias("has_null"),
    )
    assert per_key.filter((F.col("has_null") == 0) & (F.col("n") == S24_K)).count() == n_kept
    assert per_key.filter((F.col("has_null") == 1) & (F.col("n") == 1)).count() == n_drop
    assert per_key.count() == n_kept + n_drop
    out.unpersist()
