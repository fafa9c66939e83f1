"""applyInPandasWithState custom stateful operator test."""

from __future__ import annotations

import time
from datetime import datetime, timedelta

from big_data_audio_classification_spark.streaming.stateful import running_user_counters

BASE = datetime(2024, 1, 1)


def test_running_user_counters(spark, tmp_path):
    rows = [
        (i, BASE + timedelta(seconds=i), i % 3, "click", float(i), "{}")
        for i in range(30)
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    )
    src_path = str(tmp_path / "stateful_src")
    df.coalesce(1).write.mode("overwrite").parquet(src_path)
    stream = spark.readStream.schema(df.schema).parquet(src_path)

    q = (
        running_user_counters(stream)
        .writeStream.format("memory")
        .queryName("stateful_sink")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    expected = {}
    for i in range(30):
        n, s = expected.get(i % 3, (0, 0.0))
        expected[i % 3] = (n + 1, s + float(i))

    def snapshot():
        out = spark.sql(
            "select user_id, max(n_events) as n, max(sum_value) as s "
            "from stateful_sink group by user_id"
        ).collect()
        return {r.user_id: (r.n, r.s) for r in out}

    # The operator registers ProcessingTimeTimeouts, so even under
    # trigger(availableNow) the query stays ACTIVE after draining the
    # input (pending timeout batches) — the old awaitTermination(120)
    # + 60x1s poll burned the full 180 s every run. Poll the memory
    # sink for the expected final counters instead (one availableNow
    # batch emits every group's final update), then stop the query —
    # same assertion, seconds instead of minutes, and no orphaned
    # stream left running for the rest of the suite.
    got = {}
    deadline = time.time() + 120
    while time.time() < deadline:
        got = snapshot()
        if got == expected:
            break
        if not q.isActive:
            got = snapshot()
            break
        time.sleep(0.5)
    q.stop()
    assert got == expected


def test_transform_with_state_running_max(spark, tmp_path):
    from big_data_audio_classification_spark.streaming import stateful

    if not stateful.HAS_TWS:
        import pytest

        pytest.skip("transformWithStateInPandas unavailable")
    rows = [
        (i, datetime(2024, 1, 1) + timedelta(minutes=i), i % 3, "click", float(i), "{}")
        for i in range(30)
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    )
    path = str(tmp_path / "tws_stream")
    df.coalesce(1).write.mode("overwrite").parquet(path)
    src = spark.readStream.schema(df.schema).parquet(path)
    q = (
        stateful.running_user_max(src)
        .writeStream.format("memory")
        .queryName("tws_sink")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = {r.user_id: r.max_value for r in spark.sql("select * from tws_sink").collect()}
    # per-user max of value = max event id with that residue
    for u in range(3):
        assert out[u] == max(float(i) for i in range(30) if i % 3 == u)
