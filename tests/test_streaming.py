"""Structured Streaming tests: the true streaming path (readStream →
watermark → windowed agg / stateful dedup → memory sink), which the
batch oracle cannot score (SURVEY §5.2: non-SQL-expressible ops get
engine-side tests instead)."""

from __future__ import annotations

import time
from datetime import datetime, timedelta

import pyspark.sql.functions as F

from big_data_audio_classification_spark.streaming.events import (
    stream_dedup,
    stream_sessionize,
    stream_static_enrich,
    stream_tumbling_counts,
)

BASE = datetime(2024, 1, 1, 0, 0, 0)


def _event_rows():
    rows = []
    for i in range(100):
        rows.append(
            (
                i,
                BASE + timedelta(minutes=i % 50),
                i % 7,
                ["click", "view", "error"][i % 3],
                float(i),
                '{"k": %d}' % i,
            )
        )
    # duplicate event ids to exercise dedup
    rows += rows[:10]
    return rows


def _run_to_completion(stream_df, name):
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode("append" if name == "dedup_sink" else "complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    for _ in range(60):
        if not q.isActive:
            break
        time.sleep(1)
    return q


def _memory_stream(spark, tmp_path):
    """File-based streaming source over a one-batch parquet drop."""
    rows = _event_rows()
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    path = str(tmp_path / "events_stream")
    df.coalesce(1).write.mode("overwrite").parquet(path)
    return spark.readStream.schema(df.schema).parquet(path)


def test_stream_tumbling_counts(spark, tmp_path):
    src = _memory_stream(spark, tmp_path)
    _run_to_completion(stream_tumbling_counts(src), "tumbling_sink")
    out = spark.sql("select * from tumbling_sink").collect()
    assert len(out) > 0
    # total event count preserved across windows
    assert sum(r.n for r in out) == 110


def test_stream_dedup_removes_duplicate_ids(spark, tmp_path):
    src = _memory_stream(spark, tmp_path)
    q = (
        stream_dedup(src)
        .writeStream.format("memory")
        .queryName("dedup_sink")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = spark.sql("select * from dedup_sink").collect()
    ids = [r.event_id for r in out]
    assert len(ids) == len(set(ids)) == 100  # 110 in, 100 unique out


def test_stream_sessionize(spark, tmp_path):
    src = _memory_stream(spark, tmp_path)
    _run_to_completion(stream_sessionize(src), "session_sink")
    out = spark.sql("select * from session_sink").collect()
    assert len(out) > 0
    assert sum(r.n_events for r in out) == 110


def test_stream_static_join_enriches(spark, tmp_path):
    src = _memory_stream(spark, tmp_path)
    user_dim = spark.createDataFrame(
        [(u, "vip" if u % 2 == 0 else "std") for u in range(5)],
        "user_id long, segment string",
    )
    q = (
        stream_static_enrich(src, user_dim)
        .writeStream.format("memory")
        .queryName("enrich_sink")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = spark.sql("select * from enrich_sink").collect()
    assert len(out) == 110  # left join preserves every event
    for r in out:
        if r.user_id < 5:
            assert r.segment == ("vip" if r.user_id % 2 == 0 else "std")
        else:
            assert r.segment is None


def test_foreachbatch_sink(spark, tmp_path):
    """foreachBatch: arbitrary batch-DataFrame sink (here: parquet with
    epoch column) — the escape hatch for sinks Spark lacks natively."""
    src = _memory_stream(spark, tmp_path)
    out_dir = str(tmp_path / "fb_out")

    def write_batch(batch_df, epoch_id):
        batch_df.withColumn("epoch", F.lit(epoch_id)).write.mode("append").parquet(
            out_dir
        )

    q = (
        src.writeStream.foreachBatch(write_batch)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    back = spark.read.parquet(out_dir)
    assert back.count() == 110
    assert "epoch" in back.columns


def test_rate_source_counts(spark):
    """rate-micro-batch source: one deterministic 100-row batch → ten
    modulo buckets of 10 each (complete mode; bounded 10-key state)."""
    from big_data_audio_classification_spark.streaming.events import stream_rate_counts

    q = (
        stream_rate_counts(spark, rows_per_batch=100)
        .writeStream.format("memory")
        .queryName("rate_sink")
        .outputMode("complete")
        .trigger(once=True)
        .start()
    )
    q.awaitTermination(120)
    out = {r.bucket: r.n for r in spark.sql("select * from rate_sink").collect()}
    assert out == {b: 10 for b in range(10)}


def test_stream_stream_join_matches_batch(spark, tmp_path):
    """Stream-stream time-bounded join must produce exactly the rows the
    identical batch join produces once both streams drain."""
    from big_data_audio_classification_spark.streaming.events import stream_stream_join

    src = _memory_stream(spark, tmp_path)
    clicks = src.filter(F.col("event_type") == "click")
    purchases = src.filter(F.col("event_type") == "view")  # stand-in purchase stream
    q = (
        stream_stream_join(clicks, purchases)
        .writeStream.format("memory")
        .queryName("ssj_sink")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql(
        "select count(*) n, count(distinct purchase_id) dp from ssj_sink"
    ).first()

    batch = spark.createDataFrame(
        _event_rows(),
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    )
    bc = batch.filter(F.col("event_type") == "click").selectExpr(
        "user_id", "ts as click_ts", "event_id as click_id"
    )
    bp = batch.filter(F.col("event_type") == "view").selectExpr(
        "user_id", "ts as purchase_ts", "event_id as purchase_id"
    )
    expected = (
        bc.join(
            bp,
            (bc.user_id == bp.user_id)
            & (F.col("purchase_ts") >= F.col("click_ts"))
            & (F.col("purchase_ts") <= F.col("click_ts") + F.expr("INTERVAL 20 MINUTES")),
        )
        .count()
    )
    assert got.n == expected
    assert got.n > 0


def test_stream_stream_left_join_emits_unmatched(spark, tmp_path):
    """Left-outer stream-stream join: matched rows equal the batch inner
    join; null-padded rows are a subset of the batch anti side (rows
    newer than the final watermark legitimately stay buffered)."""
    from big_data_audio_classification_spark.streaming.events import (
        stream_stream_left_join,
    )

    src = _memory_stream(spark, tmp_path)
    clicks = src.filter(F.col("event_type") == "click")
    purchases = src.filter(F.col("event_type") == "view")
    q = (
        stream_stream_left_join(clicks, purchases)
        .writeStream.format("memory")
        .queryName("sslj_sink")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    batch = spark.createDataFrame(
        _event_rows(),
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    )
    bc = batch.filter(F.col("event_type") == "click").selectExpr(
        "user_id", "ts as click_ts", "event_id as click_id"
    )
    bp = batch.filter(F.col("event_type") == "view").selectExpr(
        "user_id as p_user_id", "ts as purchase_ts", "event_id as purchase_id"
    )
    cond = (
        (bc.user_id == bp.p_user_id)
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (F.col("purchase_ts") <= F.col("click_ts") + F.expr("INTERVAL 20 MINUTES"))
    )
    matched_expect = {
        (r.click_id, r.purchase_id) for r in bc.join(bp, cond).collect()
    }
    unmatched_expect = {
        r.click_id for r in bc.join(bp, cond, "left_anti").collect()
    }

    got = spark.sql("select click_id, purchase_id from sslj_sink").collect()
    got_matched = {(r.click_id, r.purchase_id) for r in got if r.purchase_id is not None}
    got_null = {r.click_id for r in got if r.purchase_id is None}
    assert got_matched == matched_expect
    assert got_null <= unmatched_expect
    assert len(got) > 0


def test_observe_metrics_on_batch(spark, sf_dir):
    """`df.observe` — operational row/value metrics collected during a
    real action with zero extra passes (accumulator-backed)."""
    from pyspark.sql import Observation

    from big_data_audio_classification_spark.sources.catalog import load_table

    o = load_table(spark, sf_dir, "orders")
    obs = Observation("orders_metrics")
    observed = o.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("o_totalprice").alias("sum_price"),
        F.max("o_orderdate").alias("max_date"),
    )
    n = observed.filter(F.col("o_totalprice") > 0).count()
    metrics = obs.get
    assert metrics["n_rows"] == o.count() == n
    assert metrics["sum_price"] > 0


def test_incremental_rollup_partials_merge_exactly(spark, tmp_path):
    """Feed the event log in TWO micro-batches (separate file drops,
    shared checkpoint) through the append-partials continuous
    aggregate; the merge-on-read serving view must equal the one-shot
    batch rollup over all events."""
    from big_data_audio_classification_spark.streaming.events import (
        rollup_serving_view,
        stream_incremental_rollup,
    )

    rows = _event_rows()
    schema = (
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    )
    src_dir = str(tmp_path / "drops")
    partials = str(tmp_path / "partials")
    ckpt = str(tmp_path / "ckpt")

    def run_available(drop, subdir):
        spark.createDataFrame(drop, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src_dir)
        stream = spark.readStream.schema(
            spark.read.parquet(src_dir).schema
        ).parquet(src_dir)
        q = (
            stream_incremental_rollup(stream, partials)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_available(rows[:60], "a")
    run_available(rows[60:], "b")

    got = {
        (r["bucket"], r["n"], round(r["sv"], 6))
        for r in rollup_serving_view(spark, partials).collect()
    }
    want = {
        (r["bucket"], r["n"], round(r["sv"], 6))
        for r in (
            spark.createDataFrame(rows, schema)
            .groupBy(F.window("ts", "1 minute").start.alias("bucket"))
            .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("sv"))
            .collect()
        )
    }
    assert got == want
    # the store really is incremental: more than one batch contributed
    n_batches = (
        spark.read.parquet(partials).select("batch_id").distinct().count()
    )
    assert n_batches >= 2


def test_incremental_rollup_sink_is_idempotent_per_batch(spark, tmp_path):
    """foreachBatch delivers at-least-once: re-running the same
    micro-batch (same batch_id) must not double-count — the sink
    overwrites its own batch_id partition (dynamic partition
    overwrite), so a retry is a no-op for the serving view."""
    from big_data_audio_classification_spark.streaming.events import (
        rollup_serving_view,
    )

    rows = _event_rows()[:40]
    schema = (
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    )
    batch = spark.createDataFrame(rows, schema)
    partials = str(tmp_path / "partials_idem")

    def run_sink(batch_df, batch_id):
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        (
            batch_df.groupBy(F.window("ts", "1 minute").start.alias("bucket"))
            .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("sv"))
            .withColumn("batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .partitionBy("batch_id")
            .parquet(partials)
        )

    run_sink(batch, 0)
    first = sorted(
        (r["bucket"], r["n"], round(r["sv"], 6))
        for r in rollup_serving_view(spark, partials).collect()
    )
    run_sink(batch, 0)  # simulated retry of the SAME micro-batch
    second = sorted(
        (r["bucket"], r["n"], round(r["sv"], 6))
        for r in rollup_serving_view(spark, partials).collect()
    )
    assert first == second


def test_output_modes_append_vs_complete(spark, tmp_path):
    """Output-mode semantics on one windowed aggregation: COMPLETE
    re-emits every window each trigger; APPEND emits a window exactly
    once, only after the watermark closes it. With availableNow over a
    finite drop, complete shows all windows while append withholds
    those the final watermark hasn't passed."""
    from big_data_audio_classification_spark.streaming.events import (
        stream_tumbling_counts,
    )

    src = _memory_stream(spark, tmp_path)
    agg = stream_tumbling_counts(src)

    qc = (
        agg.writeStream.format("memory").queryName("modes_complete")
        .outputMode("complete").trigger(availableNow=True).start()
    )
    qc.awaitTermination(120)
    complete_rows = spark.sql("SELECT * FROM modes_complete").collect()

    src2 = _memory_stream(spark, tmp_path)
    qa = (
        stream_tumbling_counts(src2)
        .writeStream.format("memory").queryName("modes_append")
        .outputMode("append").trigger(availableNow=True).start()
    )
    qa.awaitTermination(120)
    append_rows = spark.sql("SELECT * FROM modes_append").collect()

    # complete sees every window; append only watermark-closed ones
    assert len(complete_rows) > 0
    assert len(append_rows) <= len(complete_rows)
    closed = {(r["window_start"], r["event_type"]) for r in append_rows}
    all_w = {(r["window_start"], r["event_type"]) for r in complete_rows}
    assert closed <= all_w
    # every appended (closed) window agrees with the complete result
    cvals = {(r["window_start"], r["event_type"]): (r["n"], r["sum_value"])
             for r in complete_rows}
    for r in append_rows:
        assert cvals[(r["window_start"], r["event_type"])] == (r["n"], r["sum_value"])


def test_dedup_state_evicts_beyond_watermark(spark, tmp_path):
    """dropDuplicatesWithinWatermark vs plain dropDuplicates: the
    within-watermark form only suppresses duplicates whose event times
    fall inside the watermark horizon. A duplicate id arriving in a
    later micro-batch, with an event time far past the evicted state,
    is admitted AGAIN — that bounded-state trade is exactly what makes
    infinite-stream dedup feasible."""
    from big_data_audio_classification_spark.streaming.events import stream_dedup

    schema = (
        "event_id long, ts timestamp, user_id long, "
        "event_type string, value double, props string"
    )
    early = [
        (i, BASE + timedelta(minutes=i % 5), i, "click", 1.0, "{}")
        for i in range(20)
    ]
    early += early[:5]  # in-horizon duplicates: must be dropped
    # same ids, 6 hours later — state for them is long evicted
    # watermark advancer: fresh ids 3 h in — after this batch the
    # watermark (max ts - 15 min) is far past the early state's
    # expiry (early ts + 15 min), so the early keys are evicted
    advance = [
        (100 + i, BASE + timedelta(hours=3, minutes=i), i, "view", 1.0, "{}")
        for i in range(5)
    ]
    # second advancer: state eviction applies the advanced watermark
    # only at the END of the batch after it advances, so one more
    # batch must pass before the early keys are actually purged
    advance2 = [
        (200 + i, BASE + timedelta(hours=4, minutes=i), i, "view", 1.0, "{}")
        for i in range(5)
    ]
    late = [
        (i, BASE + timedelta(hours=6, minutes=i), i, "click", 1.0, "{}")
        for i in range(5)
    ]
    path = tmp_path / "dedup_evict"
    for name, rows in (
        ("b1", early),
        ("b2", advance),
        ("b3", advance2),
        ("b4", late),
    ):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(str(path / name))
        time.sleep(1.1)  # distinct mtimes -> deterministic batch order

    src = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(path / "*"))
    )
    q = (
        stream_dedup(src)
        .writeStream.format("memory")
        .queryName("dedup_evict_sink")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    out = spark.sql("select event_id, ts from dedup_evict_sink").collect()
    # 20 unique early (5 in-horizon dups dropped) + 2x5 advancers
    # + 5 re-admitted late
    assert len(out) == 35
    readmitted = [r for r in out if r.ts >= BASE + timedelta(hours=6)]
    assert len(readmitted) == 5


def test_stream_restart_from_checkpoint_is_exactly_once(spark, tmp_path):
    """Kill a streaming query between micro-batches and restart it from
    the same checkpoint: the offset log must resume where it stopped —
    every input row appears in the sink exactly once, none dropped,
    none doubled. This is the recovery contract a production pipeline
    leans on."""
    schema = (
        "event_id long, ts timestamp, user_id long, "
        "event_type string, value double, props string"
    )
    path = tmp_path / "ckpt_restart"
    n_files, rows_per = 4, 25
    for f in range(n_files):
        rows = [
            (f * rows_per + i, BASE + timedelta(minutes=f * rows_per + i),
             i, "click", 1.0, "{}")
            for i in range(rows_per)
        ]
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(str(path / "in" / f"f{f}"))
        time.sleep(1.1)

    out_dir = str(path / "out")
    ckpt = str(path / "ckpt")

    def start():
        src = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(str(path / "in" / "*"))
        )
        return (
            src.writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )

    # first run: stop after at least one committed batch, mid-drain
    q = start()
    for _ in range(600):
        if len(q.recentProgress) >= 2:
            break
        time.sleep(0.1)
    q.stop()
    q.awaitTermination(60)
    n_first = spark.read.parquet(out_dir).count()
    assert n_first < n_files * rows_per, "nothing left to recover"

    # restart from the same checkpoint: drains the remainder only
    q2 = start()
    q2.awaitTermination(180)
    for _ in range(60):
        if not q2.isActive:
            break
        time.sleep(1)
    got = spark.read.parquet(out_dir)
    ids = [r.event_id for r in got.select("event_id").collect()]
    assert len(ids) == n_files * rows_per, f"{len(ids)} rows after recovery"
    assert len(set(ids)) == n_files * rows_per, "duplicated rows on restart"


def test_stream_drift_partials_merge_equals_batch(spark, tmp_path):
    """Streaming drift monitor: per-micro-batch fixed-bin histogram
    partials, appended by foreachBatch and merged on read, must give
    EXACTLY the PSI a single batch pass computes — integer count
    partials compose under addition, whatever the batch boundaries."""
    from big_data_audio_classification_spark.streaming.events import (
        drift_partials,
        drift_partials_sink,
        psi_from_partials,
    )

    rows = _event_rows()
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    src_dir = str(tmp_path / "drift_stream")
    # three separate files -> three micro-batches with maxFilesPerTrigger=1
    for i in range(3):
        df.filter(F.col("event_id") % 3 == i).coalesce(1).write.mode(
            "append"
        ).parquet(src_dir)
    stream = (
        spark.readStream.schema(df.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    partials_dir = str(tmp_path / "drift_partials")
    split, lo, hi, nbins = "2024-01-01 00:25:00", 0.0, 120.0, 10
    q = (
        drift_partials_sink(stream, partials_dir, split, lo, hi, nbins)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    streamed = {
        r["event_type"]: r["psi"]
        for r in psi_from_partials(spark.read.parquet(partials_dir)).collect()
    }
    batch = {
        r["event_type"]: r["psi"]
        for r in psi_from_partials(
            drift_partials(df, split, lo, hi, nbins)
        ).collect()
    }
    assert streamed == batch
    assert len(streamed) == 3  # click / view / error
    # partials genuinely came from multiple micro-batches
    n_batches = (
        spark.read.parquet(partials_dir).select("batch_id").distinct().count()
    )
    assert n_batches >= 2


def test_stream_cms_partials_merge_equals_batch(spark, tmp_path):
    """Streaming CMS: per-micro-batch sketch blobs, appended by
    foreachBatch and cellwise-merged on read, must equal the
    single-shot batch sketch EXACTLY — same hash family (same seed)
    means grid addition is the sketch's native merge."""
    from big_data_audio_classification_spark.operators.sketch_cms import (
        cms_estimate_long,
        decode_cms,
        merge_cms_blobs,
    )
    from big_data_audio_classification_spark.streaming.events import (
        cms_partials,
        cms_partials_sink,
    )

    eps, conf, seed = 0.01, 0.95, 7
    rows = _event_rows()
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    src_dir = str(tmp_path / "cms_stream")
    for i in range(3):
        df.filter(F.col("event_id") % 3 == i).coalesce(1).write.mode(
            "append"
        ).parquet(src_dir)
    stream = (
        spark.readStream.schema(df.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    partials_dir = str(tmp_path / "cms_partials")
    q = (
        cms_partials_sink(stream, partials_dir, eps, conf, seed)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    blobs = [
        bytes(r["sketch"])
        for r in spark.read.parquet(partials_dir).collect()
    ]
    assert len(blobs) == 3  # one per micro-batch
    total_m, hash_m, grid_m = merge_cms_blobs(blobs)

    batch_blob = bytes(
        cms_partials(df, F.col("event_id") % 512, eps, conf, seed)
        .collect()[0]["sketch"]
    )
    total_b, hash_b, grid_b = decode_cms(batch_blob)
    assert (total_m, hash_m, grid_m) == (total_b, hash_b, grid_b)
    for k in range(0, 512, 37):  # spot-probe the merged sketch
        assert cms_estimate_long(k, hash_m, grid_m) == cms_estimate_long(
            k, hash_b, grid_b
        )
