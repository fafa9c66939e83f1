"""Event-time windowing over the ``events`` table.

Batch and streaming share the same ``window()`` / ``session_window()``
expressions (SURVEY §2.B "Streaming"): the functions here run in batch
mode so the DuckDB oracle can score them; ``streaming.jobs`` wires the
identical expressions into ``readStream``/``writeStream`` with
watermarks (tested in tests/test_streaming.py — the driver's oracle
cannot run a stream).

Scale notes: tumbling/sliding window aggregation is a plain hash
aggregate keyed by (window, key) — partial aggregation map-side, one
shuffle. Session windows need per-key ordered merging; Spark's native
``session_window`` does this with a per-key sort inside the aggregate —
the shuffle is still only keyed by user, no global sort.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from big_data_audio_classification_spark.registry import query
from big_data_audio_classification_spark.sources.catalog import load_table


@query(
    "events_tumbling_window",
    oracle="""
        SELECT epoch_us(time_bucket(INTERVAL '10 minutes', ts)) AS window_start,
               event_type,
               COUNT(*)             AS n,
               ROUND(SUM(value), 2) AS sum_value
        FROM events
        GROUP BY 1, 2
    """,
    tags=("events", "window-time"),
)
def events_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 10-minute event-time windows (epoch-aligned, matching
    DuckDB ``time_bucket``). Window start is emitted as epoch micros —
    integer-exact for the oracle hash, TZ-proof."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "10 minutes").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.unix_micros(F.col("w.start")).alias("window_start"),
            "event_type",
            "n",
            "sum_value",
        )
    )


@query(
    "events_sliding_window",
    oracle="""
        WITH b AS (
            SELECT time_bucket(INTERVAL '5 minutes', ts) AS b5, value FROM events
        ),
        w AS (
            SELECT b5 AS ws, value FROM b
            UNION ALL
            SELECT b5 - INTERVAL '5 minutes' AS ws, value FROM b
        )
        SELECT epoch_us(ws)         AS window_start,
               COUNT(*)             AS n,
               ROUND(SUM(value), 2) AS sum_value
        FROM w
        GROUP BY ws
    """,
    tags=("events", "window-time"),
)
def events_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding windows (10 min length, 5 min slide): each event lands in
    exactly two windows. The oracle materializes the same two-window
    assignment explicitly."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "10 minutes", "5 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.unix_micros(F.col("w.start")).alias("window_start"),
            "n",
            "sum_value",
        )
    )


@query(
    "events_session_window",
    oracle="""
        WITH o AS (
            SELECT user_id, ts, value,
                   LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
            FROM events
        ),
        f AS (
            SELECT user_id, ts, value,
                   CASE WHEN prev IS NULL
                             OR ts - prev >= INTERVAL '30 minutes' THEN 1
                        ELSE 0 END AS new_sess
            FROM o
        ),
        s AS (
            SELECT user_id, ts, value,
                   SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                                       ROWS UNBOUNDED PRECEDING) AS sess_id
            FROM f
        )
        SELECT user_id,
               epoch_us(MIN(ts))    AS session_start,
               COUNT(*)             AS n_events,
               ROUND(SUM(value), 2) AS sum_value
        FROM s
        GROUP BY user_id, sess_id
    """,
    tags=("events", "window-time", "session"),
)
def events_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows (30-min gap) per user via native
    ``session_window``. Oracle = gaps-and-islands SQL: a new session
    starts when the gap to the previous event is >= the gap timeout
    (Spark merges events while next.start < current.end = ts + gap)."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            "user_id",
            F.unix_micros(F.col("w.start")).alias("session_start"),
            "n_events",
            "sum_value",
        )
    )


@query(
    "events_dedup_by_id",
    oracle="""
        SELECT event_id, COUNT(*) AS n
        FROM (SELECT DISTINCT event_id, user_id, event_type FROM events)
        GROUP BY event_id
        HAVING COUNT(*) > 1
    """,
    tags=("events", "dedup"),
)
def events_dedup_by_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyed dedup sanity: after dropDuplicates on the natural key the
    id is unique (streaming analog: dropDuplicates under watermark,
    exercised in tests/test_streaming.py). Empty result == no dup keys."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.select("event_id", "user_id", "event_type")
        .dropDuplicates()
        .groupBy("event_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > 1)
    )


# ---------------------------------------------------------------------------
# True streaming constructions (not oracle-checkable; driven by tests).
# ---------------------------------------------------------------------------
def stream_tumbling_counts(events_stream: DataFrame) -> DataFrame:
    """readStream → watermark → tumbling agg. Late events beyond 15 min
    are dropped; state for closed windows is evicted — bounded state at
    any scale."""
    return (
        events_stream.withWatermark("ts", "15 minutes")
        .groupBy(F.window("ts", "10 minutes"), F.col("event_type"))
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(
            F.col("window.start").alias("window_start"),
            "event_type",
            "n",
            "sum_value",
        )
    )


def stream_sessionize(events_stream: DataFrame) -> DataFrame:
    """Native session windows under watermark."""
    return (
        events_stream.withWatermark("ts", "15 minutes")
        .groupBy(F.session_window("ts", "30 minutes").alias("w"), F.col("user_id"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("session_start"), "user_id", "n_events")
    )


def stream_dedup(events_stream: DataFrame) -> DataFrame:
    """Stateful exact dedup by event_id under watermark — state is
    evicted once the watermark passes, keeping memory bounded on an
    unbounded stream."""
    return events_stream.withWatermark("ts", "15 minutes").dropDuplicatesWithinWatermark(
        ["event_id"]
    )


def stream_stream_join(clicks: DataFrame, purchases: DataFrame) -> DataFrame:
    """Stream-stream inner join: attribute each purchase to a prior
    click by the same user within 20 minutes.

    Both sides carry watermarks and the join condition bounds event time
    (``p.ts BETWEEN c.ts AND c.ts + 20 min``), so Spark can compute how
    long each side's rows must be buffered and evict join state once the
    watermark passes — bounded state on two unbounded streams. Without
    the time bound the state would grow forever; Spark rejects unbounded
    stream-stream outer joins for exactly that reason.
    """
    c = clicks.select(
        F.col("user_id"),
        F.col("ts").alias("click_ts"),
        F.col("event_id").alias("click_id"),
    ).withWatermark("click_ts", "30 minutes")
    p = purchases.select(
        F.col("user_id"),
        F.col("ts").alias("purchase_ts"),
        F.col("event_id").alias("purchase_id"),
        F.col("value"),
    ).withWatermark("purchase_ts", "30 minutes")
    return c.join(
        p,
        (c["user_id"] == p["user_id"])
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (F.col("purchase_ts") <= F.col("click_ts") + F.expr("INTERVAL 20 MINUTES")),
    ).select(
        c["user_id"], "click_id", "purchase_id", "click_ts", "purchase_ts", "value"
    )


def stream_rate_counts(spark: SparkSession, rows_per_batch: int = 100) -> DataFrame:
    """Built-in ``rate-micro-batch`` source → modulo-bucketed counts.

    The rate source is Spark's synthetic unbounded generator —
    ``(timestamp, value)`` rows at a deterministic ``rowsPerBatch`` per
    trigger — the standard way to drive a streaming topology with no
    external system. The demo aggregation is keyed by ``value % 10``,
    so each micro-batch updates a fixed 10-key state: bounded state on
    an unbounded stream (complete output mode).
    """
    return (
        spark.readStream.format("rate-micro-batch")
        .option("rowsPerBatch", rows_per_batch)
        .option("numPartitions", 4)
        .load()
        .withColumn("bucket", F.pmod("value", F.lit(10)))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def stream_static_enrich(events_stream: DataFrame, user_dim: DataFrame) -> DataFrame:
    """Stream-static join: enrich the event stream against a static
    dimension. Spark re-plans the static side per micro-batch; with a
    small dim the join is a broadcast hash join inside every batch — no
    streaming state at all (unlike stream-stream joins)."""
    return events_stream.join(F.broadcast(user_dim), "user_id", "left").select(
        "event_id", "ts", "user_id", "segment", "event_type", "value"
    )


def stream_stream_left_join(clicks: DataFrame, purchases: DataFrame) -> DataFrame:
    """Stream-stream LEFT OUTER join: every click, attributed to a
    purchase within 20 minutes when one exists, emitted with nulls when
    none arrives.

    Outer stream-stream joins require BOTH watermarks and a time-bound
    join condition (same as the inner form) because the null-padded side
    can only be emitted once the watermark proves no match can still
    arrive — an unmatched click is held in state until event time passes
    ``click_ts + 20 min + watermark delay``, then released with nulls.
    Rows newer than the final watermark stay unemitted at shutdown; the
    batch left join is the drained-stream reference (tested)."""
    c = clicks.select(
        F.col("user_id"),
        F.col("ts").alias("click_ts"),
        F.col("event_id").alias("click_id"),
    ).withWatermark("click_ts", "10 minutes")
    p = purchases.select(
        F.col("user_id").alias("p_user_id"),
        F.col("ts").alias("purchase_ts"),
        F.col("event_id").alias("purchase_id"),
        F.col("value"),
    ).withWatermark("purchase_ts", "10 minutes")
    return c.join(
        p,
        (c["user_id"] == p["p_user_id"])
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (F.col("purchase_ts") <= F.col("click_ts") + F.expr("INTERVAL 20 MINUTES")),
        "leftOuter",
    ).select("user_id", "click_id", "purchase_id", "click_ts", "purchase_ts", "value")


@query(
    "events_multires_rollup",
    oracle="""
        WITH minute AS (
            SELECT time_bucket(INTERVAL '1 minute', ts) AS b,
                   COUNT(*) AS n, SUM(value) AS sv
            FROM events GROUP BY 1
        )
        SELECT 'minute' AS resolution, epoch_us(b) AS bucket_start,
               n, ROUND(sv, 2) AS sum_value
        FROM minute
        UNION ALL
        SELECT 'hour', epoch_us(time_bucket(INTERVAL '1 hour', b)),
               CAST(SUM(n) AS BIGINT), ROUND(SUM(sv), 2)
        FROM minute GROUP BY 2
        UNION ALL
        SELECT 'day', epoch_us(time_bucket(INTERVAL '1 day', b)),
               CAST(SUM(n) AS BIGINT), ROUND(SUM(sv), 2)
        FROM minute GROUP BY 2
    """,
    tags=("events", "rollup", "timeseries"),
)
def events_multires_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-resolution time rollup (the hypertable continuous-aggregate
    shape): minute, hour and day buckets in ONE pass over the raw
    events — only the minute rollup touches raw data; hour rolls up
    from minute and day from hour, because count/sum are mergeable.

    At 100 TB the raw table is shuffled exactly once (map-side combined
    into minute buckets, bounded cardinality = time-range / 1 min);
    every coarser resolution aggregates the previous rollup — kilobytes,
    not the fact table. This is also the maintenance shape: persist the
    minute rollup, re-derive coarser levels from it incrementally."""
    e = load_table(spark, sf_dir, "events")
    minute = (
        e.groupBy(F.window("ts", "1 minute").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("sv"))
        .select(F.col("w.start").alias("b"), "n", "sv")
    )
    minute.cache()  # reused by two coarser rollups below
    out_minute = minute.select(
        F.lit("minute").alias("resolution"),
        F.unix_micros("b").alias("bucket_start"),
        "n",
        F.round("sv", 2).alias("sum_value"),
    )
    hour = (
        minute.groupBy(F.date_trunc("hour", "b").alias("b"))
        .agg(F.sum("n").alias("n"), F.sum("sv").alias("sv"))
    )
    out_hour = hour.select(
        F.lit("hour").alias("resolution"),
        F.unix_micros("b").alias("bucket_start"),
        "n",
        F.round("sv", 2).alias("sum_value"),
    )
    out_day = (
        hour.groupBy(F.date_trunc("day", "b").alias("b"))
        .agg(F.sum("n").alias("n"), F.sum("sv").alias("sv"))
        .select(
            F.lit("day").alias("resolution"),
            F.unix_micros("b").alias("bucket_start"),
            "n",
            F.round("sv", 2).alias("sum_value"),
        )
    )
    return out_minute.unionAll(out_hour).unionAll(out_day)


def stream_incremental_rollup(events_stream: DataFrame, partials_dir: str):
    """Streaming continuous aggregate, the mergeable-partials design:
    each micro-batch APPENDS its minute-bucket partial aggregates
    (count, sum) to a partitioned store; nothing is read-modify-written
    inside the hot path (an in-place upsert of the whole rollup per
    batch is the scale-killer — it re-shuffles the entire history every
    trigger). The serving view merges partials on read
    (``rollup_serving_view``); a periodic compaction job can fold old
    partials without changing any reader's results, exactly like the
    HLL partial-merge path in ``agg_hll_partial_merge``.

    Returns the started query (caller awaits termination)."""

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        # Partitioned by batch_id + DYNAMIC partition overwrite: a
        # retried micro-batch replaces its own partition instead of
        # appending a duplicate — foreachBatch is at-least-once, so the
        # sink must be idempotent per batch_id to get exactly-once.
        spark = batch_df.sparkSession
        key = "spark.sql.sources.partitionOverwriteMode"
        prev = spark.conf.get(key, None)
        spark.conf.set(key, "dynamic")
        try:
            (
                batch_df.groupBy(
                    F.window("ts", "1 minute").start.alias("bucket")
                )
                .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("sv"))
                .withColumn("batch_id", F.lit(batch_id))
                .write.mode("overwrite")
                .partitionBy("batch_id")
                .parquet(partials_dir)
            )
        finally:
            spark.conf.set(key, prev) if prev else spark.conf.unset(key)

    return events_stream.writeStream.foreachBatch(sink)


def rollup_serving_view(spark: SparkSession, partials_dir: str) -> DataFrame:
    """Merge-on-read over the appended partials: the serving rollup is
    always exact regardless of how many micro-batches (or compactions)
    produced the store, because count/sum are mergeable."""
    return (
        spark.read.parquet(partials_dir)
        .groupBy("bucket")
        .agg(F.sum("n").alias("n"), F.sum("sv").alias("sv"))
    )


# ---------------------------------------------------------------------------
# Streaming drift monitor: fixed-bin histogram partials per micro-batch,
# merged on read — the streaming form of stats_psi_drift. Fixed bins
# (not data-derived bounds) are what make the partials mergeable across
# batches: count partials compose under addition, bounds don't.
# ---------------------------------------------------------------------------
DRIFT_EPS = 1e-6


def drift_partials(
    df: DataFrame, split_ts: str, lo: float, hi: float, nbins: int
) -> DataFrame:
    """(event_type, side, bin) -> cnt histogram over FIXED bins; runs
    identically on a batch DataFrame or inside foreachBatch. side 'b'
    = baseline (ts < split), 'c' = current."""
    width = (hi - lo) / nbins
    return (
        df.select(
            "event_type",
            F.when(F.col("ts") < F.lit(split_ts).cast("timestamp"), "b")
            .otherwise("c")
            .alias("side"),
            F.least(
                F.lit(nbins - 1),
                F.greatest(
                    F.lit(0), F.floor((F.col("value") - lo) / width)
                ),
            )
            .cast("int")
            .alias("bin"),
        )
        .groupBy("event_type", "side", "bin")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def drift_partials_sink(events_stream: DataFrame, partials_dir: str,
                        split_ts: str, lo: float, hi: float, nbins: int):
    """foreachBatch sink appending each micro-batch's histogram
    partials (plus the batch id for idempotent replay auditing)."""

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        (
            drift_partials(batch_df, split_ts, lo, hi, nbins)
            .withColumn("batch_id", F.lit(batch_id))
            .write.mode("append")
            .parquet(partials_dir)
        )

    return events_stream.writeStream.foreachBatch(sink)


def psi_from_partials(partials: DataFrame) -> DataFrame:
    """Merge (sum) histogram partials, then PSI per event type — the
    same eps-floored formula as ``stats_psi_drift``. Exact regardless
    of how many micro-batches produced the partials: integer counts
    compose under addition."""
    from pyspark.sql import Window

    h = partials.groupBy("event_type", "side", "bin").agg(
        F.sum("cnt").alias("cnt")
    )
    wide = (
        h.groupBy("event_type", "bin")
        .pivot("side", ["b", "c"])
        .sum("cnt")
        .na.fill(0)
    )
    per_type = Window.partitionBy("event_type")
    pq = wide.select(
        "event_type",
        F.greatest(
            F.col("b").cast("double") / F.sum("b").over(per_type),
            F.lit(DRIFT_EPS),
        ).alias("p"),
        F.greatest(
            F.col("c").cast("double") / F.sum("c").over(per_type),
            F.lit(DRIFT_EPS),
        ).alias("q"),
    )
    return pq.groupBy("event_type").agg(
        F.round(
            F.sum((F.col("p") - F.col("q")) * F.log(F.col("p") / F.col("q"))),
            9,
        ).alias("psi")
    )


# ---------------------------------------------------------------------------
# Streaming count-min partials: the CMS analog of the drift monitor's
# histogram partials. Each micro-batch emits ONE sketch blob (built with
# the same eps/conf/seed, so every blob shares the same hash family);
# blobs OR-merge by cellwise addition — exact, whatever the batch
# boundaries. Merge/probe helpers live in operators/sketch_cms.py.


def cms_partials(df: DataFrame, key_col, eps: float, conf: float, seed: int) -> DataFrame:
    """One count_min_sketch blob over ``key_col``; runs identically on
    a batch DataFrame or inside foreachBatch."""
    return df.select(key_col.alias("k")).agg(
        F.expr(f"count_min_sketch(k, {eps}d, {conf}d, {seed})").alias("sketch")
    )


def cms_partials_sink(events_stream: DataFrame, partials_dir: str,
                      eps: float, conf: float, seed: int):
    """foreachBatch sink appending each micro-batch's CMS blob (plus
    the batch id for idempotent replay auditing). Keys events by
    ``event_id % 512`` to match the batch probe query."""

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        (
            cms_partials(batch_df, F.col("event_id") % 512, eps, conf, seed)
            .withColumn("batch_id", F.lit(batch_id))
            .write.mode("append")
            .parquet(partials_dir)
        )

    return events_stream.writeStream.foreachBatch(sink)
