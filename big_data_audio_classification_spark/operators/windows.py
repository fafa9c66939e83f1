"""Window-function family: ranking, lag/lead, running aggregates, top-k.

Reference parity: the generator's running cumulative duration (R7,
``/root/reference/src/data_generator.py:14,20-21``) is the canonical
running-sum window; the phrase-boundary ``lag`` (R23,
``voice_classifier.py:125``) and global time sort (R43, ``:305``)
generalize to the lag/lead and ordering exemplars here.

Scale notes: every window here is ``partitionBy(key).orderBy(...)`` —
one hash shuffle on the partition key, then a per-partition sort; no
global sort. Unpartitioned global windows (a single ordered partition)
are avoided everywhere except tiny inputs — at 100 TB a global window is
a single-task bottleneck. Frames are explicit ``rowsBetween`` (the
default RANGE frame with ties is both slower and subtly different).
Top-k per group = row_number + filter: shuffles once and never
materializes a global sort.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from big_data_audio_classification_spark.registry import query
from big_data_audio_classification_spark.sources.catalog import load_table


@query(
    "window_running_spend",
    oracle="""
        SELECT o_custkey, o_orderkey,
               ROUND(SUM(o_totalprice) OVER (
                   PARTITION BY o_custkey
                   ORDER BY o_orderdate, o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_spend
        FROM orders
    """,
    tags=("window",),
)
def window_running_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running cumulative sum per customer (R7's cumulative-seconds
    pattern, data_generator.py:20-21). Deterministic tie-break on the
    unique key keeps the cumsum well-defined under ordering ties."""
    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum("o_totalprice").over(w), 2).alias("running_spend"),
    )


@query(
    "window_rank_family",
    oracle="""
        SELECT c_custkey, c_mktsegment,
               ROW_NUMBER()   OVER w AS rn,
               RANK()         OVER w AS rnk,
               DENSE_RANK()   OVER w AS drnk,
               NTILE(4)       OVER w AS quartile,
               ROUND(PERCENT_RANK() OVER w, 6) AS pct_rank
        FROM customer
        WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey)
    """,
    tags=("window",),
)
def window_rank_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """row_number / rank / dense_rank / ntile / percent_rank."""
    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey")
    )
    return c.select(
        "c_custkey",
        "c_mktsegment",
        F.row_number().over(w).alias("rn"),
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
    )


@query(
    "window_lag_lead_events",
    oracle="""
        SELECT event_id, user_id,
               ROUND(value, 2) AS value,
               ROUND(LAG(value)  OVER w, 2) AS prev_value,
               ROUND(LEAD(value) OVER w, 2) AS next_value,
               epoch_us(ts) - epoch_us(LAG(ts) OVER w) AS micros_since_prev
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
    tags=("window", "events"),
)
def window_lag_lead_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead with event-time deltas (R23's phrase-boundary lag,
    voice_classifier.py:125, generalized to per-user event streams)."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return e.select(
        "event_id",
        "user_id",
        F.round("value", 2).alias("value"),
        F.round(F.lag("value").over(w), 2).alias("prev_value"),
        F.round(F.lead("value").over(w), 2).alias("next_value"),
        (F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))).alias(
            "micros_since_prev"
        ),
    )


@query(
    "window_first_last_value",
    oracle="""
        SELECT DISTINCT o_custkey,
               FIRST_VALUE(o_orderkey) OVER w AS first_order,
               LAST_VALUE(o_orderkey)  OVER w AS last_order
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                     ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
    tags=("window",),
)
def window_first_last_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first_value/last_value over an explicit full-partition frame
    (the default frame would make last_value ≡ current row)."""
    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return o.select(
        "o_custkey",
        F.first("o_orderkey").over(w).alias("first_order"),
        F.last("o_orderkey").over(w).alias("last_order"),
    ).dropDuplicates()


@query(
    "window_moving_avg",
    oracle="""
        SELECT user_id, event_id,
               ROUND(AVG(value) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4) AS ma3
        FROM events
    """,
    tags=("window", "events"),
)
def window_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding 3-row moving average per user."""
    e = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-2, Window.currentRow)
    )
    return e.select(
        "user_id", "event_id", F.round(F.avg("value").over(w), 4).alias("ma3")
    )


@query(
    "topk_orders_per_customer",
    oracle="""
        SELECT o_custkey, o_orderkey, o_totalprice
        FROM (
            SELECT o_custkey, o_orderkey, o_totalprice,
                   ROW_NUMBER() OVER (PARTITION BY o_custkey
                                      ORDER BY o_totalprice DESC, o_orderkey) AS rn
            FROM orders
        ) WHERE rn <= 3
    """,
    tags=("window", "topk"),
)
def topk_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer — the scalable top-k-per-group shape
    (one shuffle, per-partition sort, no global sort; AQE handles skewed
    customers)."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        o.select(
            "o_custkey", "o_orderkey", "o_totalprice",
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") <= 3)
        .drop("rn")
    )


@query(
    "global_topk_orders",
    oracle="""
        SELECT o_orderkey, o_totalprice
        FROM orders
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT 20
    """,
    tags=("window", "topk", "sort"),
)
def global_topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k via orderBy + limit — Catalyst compiles this to
    TakeOrderedAndProject: per-partition heap top-k then a k-row merge
    on one task. O(k) driver memory at any scale, unlike a global sort
    (R43's ``sort_values`` made scale-safe)."""
    o = load_table(spark, sf_dir, "orders")
    return o.select("o_orderkey", "o_totalprice").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    ).limit(20)


TRAIL_DAYS = 30


@query(
    "window_range_interval",
    oracle=f"""
        SELECT o_orderkey, o_custkey,
               ROUND(SUM(o_totalprice) OVER (
                   PARTITION BY o_custkey
                   ORDER BY epoch(o_orderdate)
                   RANGE BETWEEN {TRAIL_DAYS} * 86400 PRECEDING
                         AND CURRENT ROW), 2) AS trailing_30d
        FROM orders
    """,
    tags=("window", "range-frame", "timeseries"),
)
def window_range_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE-framed window over event time: per customer, the trailing
    30-day revenue ending at each order — a true value-based frame
    (rows enter/leave by timestamp distance, not row position). Ordered
    on integer epoch seconds so both engines frame identically; ties in
    the ordering value are handled by RANGE semantics (peers aggregate
    together), which is the point of the exemplar."""
    o = load_table(spark, sf_dir, "orders")
    # tz-proof epoch seconds (calendar arithmetic — see stats.py)
    secs = (
        F.datediff(F.to_date("o_orderdate"), F.lit("1970-01-01")).cast("long")
        * 86400
        + F.hour("o_orderdate").cast("long") * 3600
        + F.minute("o_orderdate").cast("long") * 60
        + F.second("o_orderdate").cast("long")
    )
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(secs.alias("es"))
        .rangeBetween(-TRAIL_DAYS * 86400, 0)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.round(F.sum("o_totalprice").over(w), 2).alias("trailing_30d"),
    )


# --- round-5 carrier: first-time 'rolling' window entry --------------


@query(
    "window_rolling_minmax_scale",
    oracle="""
        WITH w AS (
            SELECT event_id, user_id, value,
                   MIN(value) OVER (PARTITION BY user_id
                       ORDER BY ts, event_id
                       ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS lo,
                   MAX(value) OVER (PARTITION BY user_id
                       ORDER BY ts, event_id
                       ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS hi,
                   COUNT(*)  OVER (PARTITION BY user_id
                       ORDER BY ts, event_id
                       ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS n_win
            FROM events
        )
        SELECT event_id, user_id, n_win,
               ROUND(lo, 4) AS roll_min,
               ROUND(hi, 4) AS roll_max,
               ROUND(CASE WHEN hi > lo THEN (value - lo) / (hi - lo)
                          ELSE 0.5 END, 6) AS scaled
        FROM w
    """,
    tags=("window", "rolling", "events"),
)
def window_rolling_minmax_scale(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling min-max normalization (trailing 4-row frame per user) —
    the online feature-scaling transform of a streaming featurizer,
    as three frame-shared window aggregates plus arithmetic. The frame
    orders by (ts, event_id) — the unique-key tiebreak every window
    ordering here carries (cross-engine determinism idiom). Degenerate
    frames (hi == lo) pin to 0.5, matching the oracle CASE. One
    user-keyed shuffle serves all three aggregates (same frame → one
    Window node)."""
    e = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-3, Window.currentRow)
    )
    lo, hi = F.min("value").over(w), F.max("value").over(w)
    return e.select(
        "event_id",
        "user_id",
        F.count(F.lit(1)).over(w).alias("n_win"),
        F.round(lo, 4).alias("roll_min"),
        F.round(hi, 4).alias("roll_max"),
        F.round(
            F.when(hi > lo, (F.col("value") - lo) / (hi - lo)).otherwise(0.5), 6
        ).alias("scaled"),
    )


# --- round-6 carrier: first-time 'rolling' entry ----------------------

TRIM_WIN = 2  # rows on each side of the 5-row centered rolling frame


@query(
    "window_rolling_trimmed_mean",
    oracle=f"""
        WITH w AS (
            SELECT event_id, user_id, ts, value,
                   SUM(value) OVER f   AS s,
                   MIN(value) OVER f   AS lo,
                   MAX(value) OVER f   AS hi,
                   COUNT(*) OVER f     AS n
            FROM events
            WINDOW f AS (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN {TRIM_WIN} PRECEDING
                                  AND {TRIM_WIN} FOLLOWING)
        )
        SELECT event_id, user_id,
               CAST(n AS BIGINT) AS n_win,
               ROUND(CASE WHEN n > 2 THEN (s - lo - hi) / (n - 2)
                          ELSE s / n END, 6) + 0 AS trimmed_mean,
               -- + 0 normalizes DuckDB's -0.0 (ROUND of a tiny negative)
               -- to +0.0: Spark's BigDecimal round never emits -0.0, and
               -- the driver's typed hash distinguishes the sign bit
               -- (r06 red row: 33 negative-zero residual cells).
               ROUND(value - CASE WHEN n > 2 THEN (s - lo - hi) / (n - 2)
                                  ELSE s / n END, 6) + 0 AS residual
        FROM w
    """,
    tags=("window", "rolling", "robust", "events"),
)
def window_rolling_trimmed_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling EXTREMA-TRIMMED mean (drop the min and max of each 5-row
    centered frame, average the rest) and its residual — the
    spike-robust smoother used on sensor streams, expressed entirely
    with built-in window aggregates (sum/min/max/count over ONE shared
    frame) instead of a per-frame sort or UDF. Truncated edge frames
    fall back to the plain mean when ≤2 rows. One shuffle on user_id;
    the four aggregates share the same window spec so Spark evaluates
    them in a single WindowExec pass. Sibling of
    ``window_rolling_minmax_scale`` (certified r05)."""
    e = load_table(spark, sf_dir, "events")
    f = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-TRIM_WIN, TRIM_WIN)
    )
    s, lo, hi, n = (
        F.sum("value").over(f),
        F.min("value").over(f),
        F.max("value").over(f),
        F.count(F.lit(1)).over(f),
    )
    tmean = F.when(n > 2, (s - lo - hi) / (n - 2)).otherwise(s / n)
    return e.select(
        "event_id",
        "user_id",
        n.cast("bigint").alias("n_win"),
        F.round(tmean, 6).alias("trimmed_mean"),
        F.round(F.col("value") - tmean, 6).alias("residual"),
    )


# --- round-7 spare carrier: linear-decay rolling weighted mean ----------

WMA_WIN = 5  # trailing rows in the weighted window (weights 1..5)


@query(
    "window_rolling_weighted_mean",
    oracle=f"""
        WITH x AS (
            SELECT event_id, user_id, value,
                   LAG(value, 1) OVER w AS v1,
                   LAG(value, 2) OVER w AS v2,
                   LAG(value, 3) OVER w AS v3,
                   LAG(value, 4) OVER w AS v4
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        )
        SELECT event_id, user_id,
               ROUND((5 * value + COALESCE(4 * v1, 0) + COALESCE(3 * v2, 0)
                      + COALESCE(2 * v3, 0) + COALESCE(1 * v4, 0))
                     / (5.0 + CASE WHEN v1 IS NULL THEN 0 ELSE 4 END
                            + CASE WHEN v2 IS NULL THEN 0 ELSE 3 END
                            + CASE WHEN v3 IS NULL THEN 0 ELSE 2 END
                            + CASE WHEN v4 IS NULL THEN 0 ELSE 1 END), 6)
                   AS wma
        FROM x
    """,
    tags=("window", "rolling", "events"),
)
def window_rolling_weighted_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LINEARLY-DECAYING rolling weighted mean (WMA-5: weight n for
    the current row down to 1 for the oldest) — the classic
    trend-following smoother between the uniform rolling mean and the
    EWMA (``events_ewma_deviation``). Spark states it as explicit LAGs
    over ONE shared window spec (a single WindowExec pass, no frame
    re-sort per weight); truncated leading frames renormalize by the
    weights actually present, matching the oracle's NULL-guarded
    arithmetic exactly."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    lags = [F.col("value")] + [
        F.lag("value", i).over(w) for i in range(1, WMA_WIN)
    ]
    num = sum(
        F.coalesce(F.lit(WMA_WIN - i) * lags[i], F.lit(0.0))
        for i in range(WMA_WIN)
    )
    den = sum(
        F.when(lags[i].isNull(), 0.0).otherwise(float(WMA_WIN - i))
        for i in range(WMA_WIN)
    )
    return e.select(
        "event_id",
        "user_id",
        F.round(num / den, 6).alias("wma"),
    )


# --- round-8 spare: TIME-range rolling stats ----------------------------

ROLL_TIME_S = 7200  # trailing 2-hour window


@query(
    "window_rolling_time_stats",
    oracle=f"""
        SELECT event_id, user_id,
               CAST(COUNT(*) OVER f AS BIGINT)      AS n_2h,
               ROUND(AVG(value) OVER f, 6)          AS mean_2h,
               ROUND(value - AVG(value) OVER f, 6)  AS dev_from_2h
        FROM events
        WINDOW f AS (PARTITION BY user_id ORDER BY epoch_us(ts)
                     RANGE BETWEEN {ROLL_TIME_S * 1_000_000} PRECEDING
                           AND CURRENT ROW)
    """,
    tags=("window", "rolling", "window-time", "events"),
)
def window_rolling_time_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TIME-based rolling stats: trailing 2-HOUR count/mean per user —
    a RANGE frame on integer epoch micros, so rows enter and leave by
    CLOCK distance, not row position (the row-framed siblings:
    ``window_rolling_trimmed_mean``, ``window_rolling_weighted_mean``).
    Irregular event spacing is the point: n_2h varies per row, which no
    ROWS frame can express. Equal-timestamp peers aggregate together
    (RANGE semantics) in both engines. One shuffle on user_id."""
    e = load_table(spark, sf_dir, "events")
    f = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-ROLL_TIME_S * 1_000_000, 0)
    )
    return e.select(
        "event_id",
        "user_id",
        F.count(F.lit(1)).over(f).cast("bigint").alias("n_2h"),
        F.round(F.avg("value").over(f), 6).alias("mean_2h"),
        F.round(F.col("value") - F.avg("value").over(f), 6).alias(
            "dev_from_2h"
        ),
    )
