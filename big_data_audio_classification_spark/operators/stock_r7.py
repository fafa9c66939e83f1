"""Round-7-built spare carriers: one fresh, never-certified exemplar for
every REQUIRED_FAMILY_TAG whose never-certified stock dropped below 2
after the r07 driver-window rotation — so the r08 AND r09 rotations can
both draw a first-time carrier from every family (the stocking rule
SURVEY §12 set in round 6).

Same contract as every other operator module: each query pairs an
idiomatic Spark DataFrame plan with a DuckDB oracle that states the SAME
semantics through an independent formulation, every computed column is
aliased identically on both sides, float outputs are kept bit-stable
(exact integer/cents arithmetic up to one final float expression written
in the same operation order on both engines — the house idiom from
``stats_ipw_ate``/``analytics_jenks_breaks``), and the scale story for
100 TB is in each docstring.

Reference parity: these extend the §2.B mandated surface (SURVEY.md §2);
reference-derived rows cite `/root/reference/src` file:line where one
exists.
"""

from __future__ import annotations

import os

import pandas as pd  # noqa: F401  (pandas UDAF kernels)
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from big_data_audio_classification_spark.registry import query
from big_data_audio_classification_spark.scratch import SCRATCH_DIR as _SCRATCH
from big_data_audio_classification_spark.sources.catalog import load_table

# Single source of truth for the IVF coarse-centroid count (oracle
# strings interpolate it at decoration time, so a change in
# similarity.py moves BOTH engines together).
from big_data_audio_classification_spark.operators.similarity import (  # noqa: E402
    IVF_CELLS as _IVF_CELLS,
)

# ---------------------------------------------------------------------------
# asof: forward direction with bounded look-AHEAD
# ---------------------------------------------------------------------------

ASOF_FWD_TOLERANCE_S = 3600  # 1 h look-ahead window


@query(
    "join_asof_forward_tolerance",
    oracle=f"""
        WITH e AS (SELECT event_id AS error_id, user_id, ts
                   FROM events WHERE event_type = 'error'),
             p AS (SELECT event_id AS pid, user_id, ts
                   FROM events WHERE event_type = 'purchase'),
             j AS (SELECT e.error_id, e.user_id, p.pid, p.ts AS pts,
                          ROW_NUMBER() OVER (
                              PARTITION BY e.error_id
                              ORDER BY (p.pid IS NULL),
                                       p.ts ASC, p.pid ASC) AS rn
                   FROM e LEFT JOIN p
                     ON p.user_id = e.user_id
                    AND p.ts >= e.ts
                    AND epoch_us(p.ts) - epoch_us(e.ts)
                        <= {ASOF_FWD_TOLERANCE_S * 1000000})
        SELECT error_id, user_id,
               pid                  AS next_purchase_id,
               CAST(pts AS VARCHAR) AS next_purchase_ts,
               pid IS NOT NULL      AS recovered
        FROM j WHERE rn = 1
    """,
    tags=("relational", "join", "asof", "events"),
)
def join_asof_forward_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FORWARD as-of with a bounded look-AHEAD (pandas
    ``merge_asof(direction='forward', tolerance=1h)``): the earliest
    purchase at-or-after each error event, NULL when the user never
    converts inside the window — the did-the-user-recover join. The
    mirror image of ``join_asof_backward_tolerance``: one union of the
    two event streams, one FORWARD carry window (first following
    value = last preceding value under ts DESC), tolerance as a
    post-carry predicate. Single shuffle keyed by user_id; the
    oracle's rank-over-left-join is the independent quadratic-free
    formulation. Among equal-ts purchases the smallest pid wins on
    both sides."""
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts",
        F.lit(1).alias("is_p"),
        F.col("event_id").alias("pid_src"),
        F.lit(None).cast("long").alias("error_id"),
    )
    errors = ev.filter(F.col("event_type") == "error").select(
        "user_id", "ts",
        F.lit(0).alias("is_p"),
        F.lit(None).cast("long").alias("pid_src"),
        F.col("event_id").alias("error_id"),
    )
    # Forward carry = backward carry over ts DESC. At equal ts the
    # purchase must sort AFTER the error in carry order (>= semantics),
    # and among equal-ts purchases the SMALLEST pid must win -> order
    # purchases by pid DESC under the DESC scan so the last carried
    # value is the smallest pid.
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").desc(), F.col("is_p").desc(),
                 F.col("pid_src").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    p_ts = F.when(F.col("is_p") == 1, F.col("ts"))
    carried = purchases.unionByName(errors).select(
        "error_id", "user_id", "ts", "is_p",
        F.last("pid_src", ignorenulls=True).over(w).alias("next_id"),
        F.last(p_ts, ignorenulls=True).over(w).alias("next_ts"),
    ).filter(F.col("is_p") == 0)
    fresh = (
        F.col("next_ts").isNotNull()
        & (
            F.unix_micros("next_ts") - F.unix_micros("ts")
            <= ASOF_FWD_TOLERANCE_S * 1_000_000
        )
    )
    return carried.select(
        "error_id",
        "user_id",
        F.when(fresh, F.col("next_id")).alias("next_purchase_id"),
        F.when(fresh, F.col("next_ts")).cast("string").alias("next_purchase_ts"),
        fresh.alias("recovered"),
    )


# ---------------------------------------------------------------------------
# setop: multiset INTERSECT ALL / EXCEPT ALL census
# ---------------------------------------------------------------------------


@query(
    "set_multiset_intersect_except",
    oracle="""
        WITH f AS (SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'),
             u AS (SELECT o_custkey FROM orders
                   WHERE o_orderpriority = '1-URGENT'),
             ia AS (SELECT o_custkey FROM f INTERSECT ALL
                    SELECT o_custkey FROM u),
             ea AS (SELECT o_custkey FROM f EXCEPT ALL
                    SELECT o_custkey FROM u),
             id AS (SELECT o_custkey FROM f INTERSECT
                    SELECT o_custkey FROM u),
             ed AS (SELECT o_custkey FROM f EXCEPT
                    SELECT o_custkey FROM u)
        SELECT CAST((SELECT COUNT(*) FROM ia) AS BIGINT) AS n_intersect_all,
               CAST((SELECT COUNT(*) FROM ea) AS BIGINT) AS n_except_all,
               CAST((SELECT COUNT(*) FROM id) AS BIGINT) AS n_intersect_distinct,
               CAST((SELECT COUNT(*) FROM ed) AS BIGINT) AS n_except_distinct
    """,
    tags=("relational", "setop", "orders"),
)
def set_multiset_intersect_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MULTISET set operations, measured: INTERSECT ALL / EXCEPT ALL
    (bag semantics — min/count-difference of multiplicities) against
    their DISTINCT forms on the same two order streams — the four
    cardinalities that separate Spark's ``intersectAll``/``exceptAll``
    from ``intersect``/``subtract`` (UNION census:
    ``set_union_vs_union_all``). Each leg is one shuffle keyed by the
    value; at 100 TB all four are count-aggregates over the same
    hash-partitioned exchange, reusable across legs. Output is one
    scale-free row."""
    o = load_table(spark, sf_dir, "orders")
    f = o.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    u = o.filter(F.col("o_orderpriority") == "1-URGENT").select("o_custkey")

    def n(df: DataFrame, alias: str) -> DataFrame:
        return df.agg(F.count(F.lit(1)).cast("bigint").alias(alias))

    out = n(f.intersectAll(u), "n_intersect_all")
    for leg in (
        n(f.exceptAll(u), "n_except_all"),
        n(f.intersect(u), "n_intersect_distinct"),
        n(f.subtract(u), "n_except_distinct"),
    ):
        out = out.crossJoin(F.broadcast(leg))
    return out


# ---------------------------------------------------------------------------
# subquery: correlated above-the-customer-average filter, exact cents
# ---------------------------------------------------------------------------


@query(
    "subquery_correlated_above_avg",
    oracle="""
        WITH o AS (SELECT o_custkey, o_orderpriority,
                          CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
                   FROM orders)
        SELECT o_orderpriority AS priority,
               CAST(COUNT(*) AS BIGINT) AS n_above,
               CAST(SUM(cents) AS BIGINT) AS cents_above
        FROM o
        WHERE cents * (SELECT COUNT(*) FROM o i
                       WHERE i.o_custkey = o.o_custkey)
              > (SELECT SUM(cents) FROM o i
                 WHERE i.o_custkey = o.o_custkey)
        GROUP BY o_orderpriority
    """,
    tags=("relational", "subquery", "orders"),
)
def subquery_correlated_above_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CORRELATED scalar subquery — orders strictly above their own
    customer's average order value — decorrelated the way Catalyst
    (and every planner since Kim '82) rewrites it: one per-customer
    aggregate joined back, predicate applied post-join. The comparison
    is kept in EXACT integers (``cents * n > sum_cents`` instead of
    ``price > avg``), so the filter is ULP-proof on both engines; the
    oracle states the textbook correlated form. One aggregate + one
    equi-join keyed by customer — co-partitioned, no second shuffle
    at 100 TB."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderpriority",
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
    )
    per_cust = o.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("n_cust"),
        F.sum("cents").alias("sum_cents"),
    )
    return (
        o.join(per_cust, "o_custkey")
        .filter(F.col("cents") * F.col("n_cust") > F.col("sum_cents"))
        .groupBy(F.col("o_orderpriority").alias("priority"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_above"),
            F.sum("cents").cast("bigint").alias("cents_above"),
        )
    )


# ---------------------------------------------------------------------------
# range-join: point-in-interval, day-bucketed equi-join form
# ---------------------------------------------------------------------------

PII_WINDOW_H = 4  # clicks counted inside [signup, signup + 4h)


@query(
    "join_range_point_in_interval",
    oracle=f"""
        WITH s AS (SELECT event_id AS signup_id, user_id, ts,
                          epoch_us(ts) AS lo,
                          epoch_us(ts) + {PII_WINDOW_H * 3600 * 1000000} AS hi
                   FROM events WHERE event_type = 'signup'),
             c AS (SELECT user_id, epoch_us(ts) AS t FROM events
                   WHERE event_type = 'click')
        SELECT s.signup_id, s.user_id,
               CAST(s.ts AS VARCHAR) AS signup_ts,
               CAST(COUNT(c.t) AS BIGINT) AS n_clicks_in_window
        FROM s LEFT JOIN c
          ON c.user_id = s.user_id AND c.t >= s.lo AND c.t < s.hi
        GROUP BY s.signup_id, s.user_id, s.ts
    """,
    tags=("relational", "join", "range-join", "events"),
)
def join_range_point_in_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """POINT-IN-INTERVAL range join in the 100 TB form: clicks landing
    inside each signup's 4-hour activation window. A naive non-equi
    join degenerates to per-user nested loops; here both sides are
    bucketed by calendar DAY — a 4 h interval overlaps at most 2 day
    buckets, so each interval is exploded into ≤ 2 bucket rows and the
    join becomes an EQUI-join on (user_id, day) with the range
    predicate as a residual filter (same family as
    ``join_range_month_overlap``, point-vs-interval instead of
    interval-vs-interval). Left join keeps zero-click signups with an
    honest 0."""
    ev = load_table(spark, sf_dir, "events")
    us = F.unix_micros("ts")
    window_us = PII_WINDOW_H * 3600 * 1_000_000
    s = ev.filter(F.col("event_type") == "signup").select(
        F.col("event_id").alias("signup_id"),
        "user_id",
        F.col("ts").alias("signup_ts_t"),
        us.alias("lo"),
        (us + window_us).alias("hi"),
    )
    day_us = 86_400 * 1_000_000
    s_b = s.select(
        "*",
        F.explode(
            F.sequence(
                (F.col("lo") / day_us).cast("bigint"),
                # hi is exclusive: the last covered bucket is (hi-1) // day
                ((F.col("hi") - 1) / day_us).cast("bigint"),
            )
        ).alias("day_bucket"),
    )
    c = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        us.alias("t"),
        (us / day_us).cast("bigint").alias("day_bucket"),
    )
    hits = (
        s_b.join(
            c,
            (s_b.user_id == c.user_id)
            & (s_b.day_bucket == c.day_bucket)
            & (c.t >= s_b.lo)
            & (c.t < s_b.hi),
            "left",
        )
        .groupBy(
            "signup_id", s_b.user_id.alias("user_id"), "signup_ts_t", "lo"
        )
        .agg(F.count(c.t).cast("bigint").alias("n_bucket_clicks"))
    )
    # the ≤2-bucket explode duplicates the signup row; counts are
    # per-(signup, bucket) partial sums — re-aggregate to the interval
    return (
        hits.groupBy("signup_id", "user_id")
        .agg(
            F.max(F.col("signup_ts_t").cast("string")).alias("signup_ts"),
            F.sum("n_bucket_clicks").cast("bigint").alias("n_clicks_in_window"),
        )
        .select("signup_id", "user_id", "signup_ts", "n_clicks_in_window")
    )


# ---------------------------------------------------------------------------
# sketch: KMV (k minimum values) distinct-count estimator
# ---------------------------------------------------------------------------

KMV_K = 32
KMV_SPACE = 4294967296  # 2^32: the portable md5-derived hash domain


@query(
    "agg_kmv_distinct_sketch",
    oracle=f"""
        WITH h AS (
            SELECT DISTINCT o_orderpriority AS priority,
                   CAST(('0x' || substr(md5(CAST(o_custkey AS VARCHAR)), 1, 8))
                        AS BIGINT) AS hv
            FROM orders
        ),
        r AS (
            SELECT priority, hv,
                   ROW_NUMBER() OVER (PARTITION BY priority ORDER BY hv) AS rk,
                   COUNT(*) OVER (PARTITION BY priority) AS n_exact
            FROM h
        )
        SELECT priority,
               CAST(MAX(n_exact) AS BIGINT) AS n_distinct_exact,
               CAST(CASE WHEN MAX(n_exact) < {KMV_K} THEN MAX(n_exact)
                    ELSE CAST(FLOOR(({KMV_K} - 1.0) * {KMV_SPACE}
                              / MAX(CASE WHEN rk = {KMV_K} THEN hv END))
                         AS BIGINT) END AS BIGINT) AS kmv_estimate
        FROM r WHERE rk <= {KMV_K}
        GROUP BY priority
    """,
    tags=("aggregate", "sketch", "orders"),
)
def agg_kmv_distinct_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV (k-minimum-values) DISTINCT-COUNT sketch, k=32: keep the k
    smallest portable hashes per group; the k-th minimum's position in
    the hash space estimates the distinct count as (k−1)/x̂ — the
    classic Bar-Yossef bottom-k estimator HLL superseded but every
    engine still ships (DataSketches' theta sketch IS this). Hashes
    are md5-derived 32-bit (engine-portable, the house scheme), the
    estimate is one exact integer division, and groups smaller than k
    fall back to the exact count — so every output cell is an exact
    integer, bit-stable by construction. At 100 TB the bottom-k per
    group is a rank window over the DISTINCT hash set — mergeable,
    fixed memory, and the exact side (for the error column) drops
    away leaving a k-row-per-group sketch."""
    from big_data_audio_classification_spark.operators.dedup import token_hash

    o = load_table(spark, sf_dir, "orders")
    h = o.select(
        F.col("o_orderpriority").alias("priority"),
        token_hash(F.col("o_custkey").cast("string")).alias("hv"),
    ).distinct()
    wr = Window.partitionBy("priority").orderBy("hv")
    wn = Window.partitionBy("priority")
    r = h.select(
        "priority",
        "hv",
        F.row_number().over(wr).alias("rk"),
        F.count(F.lit(1)).over(wn).alias("n_exact"),
    ).filter(F.col("rk") <= KMV_K)
    kth = F.max(F.when(F.col("rk") == KMV_K, F.col("hv")))
    return r.groupBy("priority").agg(
        F.max("n_exact").cast("bigint").alias("n_distinct_exact"),
        F.when(F.max("n_exact") < KMV_K, F.max("n_exact"))
        .otherwise(
            F.floor((KMV_K - 1.0) * KMV_SPACE / kth).cast("bigint")
        )
        .cast("bigint")
        .alias("kmv_estimate"),
    )


# ---------------------------------------------------------------------------
# grouping: ROLLUP subtotal levels selected via GROUPING_ID
# ---------------------------------------------------------------------------


@query(
    "agg_grouping_id_subtotals",
    oracle="""
        SELECT COALESCE(o_orderstatus, '<all>')   AS status,
               COALESCE(o_orderpriority, '<all>') AS priority,
               CAST(GROUPING(o_orderstatus) * 2
                    + GROUPING(o_orderpriority) AS BIGINT) AS gid,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS cents
        FROM orders
        GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
        HAVING GROUPING(o_orderstatus) * 2 + GROUPING(o_orderpriority) > 0
    """,
    tags=("aggregate", "grouping", "orders"),
)
def agg_grouping_id_subtotals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP with the SUBTOTAL LEVELS ONLY — ``grouping_id`` used as a
    post-aggregation filter (HAVING gid > 0), keeping the
    status-subtotal and grand-total rows and dropping the leaf level —
    the materialized-subtotal feed a reporting layer actually stores
    (full hierarchy: ``agg_rollup_time_hierarchy``; CUBE:
    ``agg_cube_share_of_total``). Money stays exact integer cents
    under DECIMAL(38). ROLLUP is one shuffle with partial aggregation
    at every level — the gid filter prunes output, not work, which is
    the honest statement of what HAVING does here."""
    o = load_table(spark, sf_dir, "orders")
    gid = F.grouping_id("o_orderstatus", "o_orderpriority")
    return (
        o.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            gid.cast("bigint").alias("gid"),
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
            .cast("bigint")
            .alias("cents"),
        )
        .filter(F.col("gid") > 0)
        .select(
            F.coalesce("o_orderstatus", F.lit("<all>")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("<all>")).alias("priority"),
            "gid",
            "n",
            "cents",
        )
    )


# ---------------------------------------------------------------------------
# udaf/pandas: robust tail-weight ratio via interpolated deciles
# ---------------------------------------------------------------------------


def _decile_px100(k: int) -> str:
    """Exact linear-interpolated percentile ×100 in integer cent units:
    with 1-based sorted list ``xs`` of exact cents and ``n`` rows,
    rank h = (n-1)·k/100 splits into lo = ((n-1)k)//100 and
    rem = ((n-1)k)%100, and 100·p = 100·xs[lo+1] + rem·(xs[lo+2]−xs[lo+1])
    — pure BIGINT arithmetic, the one formula BOTH engines evaluate."""
    lo = f"(((n - 1) * {k}) // 100)"
    a = f"xs[{lo} + 1]"
    b = f"COALESCE(xs[{lo} + 2], {a})"
    return f"({a} * 100 + (((n - 1) * {k}) % 100) * ({b} - {a}))"


@query(
    "agg_pandas_udaf_decile_ratio",
    oracle=f"""
        WITH c AS (
            SELECT l_linestatus AS status,
                   CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS cents
            FROM lineitem
        ),
        g AS (
            SELECT status, CAST(COUNT(*) AS BIGINT) AS n,
                   list(cents ORDER BY cents) AS xs
            FROM c GROUP BY status
        )
        SELECT status, n,
               ROUND(CAST({_decile_px100(90)} - {_decile_px100(10)} AS DOUBLE)
                     / CAST({_decile_px100(75)} - {_decile_px100(25)} AS DOUBLE),
                     4) AS decile_iqr_ratio
        FROM g
    """,
    tags=("aggregate", "udaf", "pandas", "robust", "lineitem"),
)
def agg_pandas_udaf_decile_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TAIL-WEIGHT ratio (P90−P10)/(P75−P25) per line status as a
    grouped-agg pandas UDF — a robust kurtosis proxy (≈ 1.9 for the
    uniform, ≈ 2.44 for the normal, larger for heavy tails) joining
    the Arrow-UDAF family (trimmed mean r05, weighted gmean r06, MAD /
    IQR stocked r06). Percentiles are computed over EXACT integer
    cents with the rank split into integer lo/rem parts, so every
    interpolated percentile is itself an exact BIGINT (×100) and the
    only float op is the final ratio division — the same expression
    the oracle evaluates, closing the np.percentile-vs-quantile_cont
    interpolation-ULP hazard (r07 advice; the class that produced both
    r06 red rows). At 100 TB swap the per-group buffer for the
    two-phase exact-percentile plan (``agg_percentiles_twophase``) —
    same answer, bounded memory."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def decile_iqr_ratio(v: pd.Series) -> float:
        xs = np.sort(
            np.rint(v.to_numpy(dtype=np.float64) * 100).astype(np.int64)
        )
        n = len(xs)

        def px100(k: int) -> int:
            lo, rem = divmod((n - 1) * k, 100)
            a = int(xs[lo])
            b = int(xs[lo + 1]) if lo + 1 < n else a
            return a * 100 + rem * (b - a)

        return float(px100(90) - px100(10)) / float(px100(75) - px100(25))

    # Spark disallows mixing a grouped-agg pandas UDF with JVM
    # aggregates in one agg() (INVALID_PANDAS_UDF_PLACEMENT), so the
    # row count must also ride through Arrow — the same constraint
    # behind agg_pandas_udaf_mad/iqr's n_rows kernels.
    @pandas_udf("long")
    def n_rows(v: pd.Series) -> int:
        return len(v)

    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy(F.col("l_linestatus").alias("status")).agg(
        n_rows("l_extendedprice").alias("n"),
        F.round(decile_iqr_ratio("l_extendedprice"), 4).alias(
            "decile_iqr_ratio"
        ),
    )


# ---------------------------------------------------------------------------
# math: inverse-trig battery
# ---------------------------------------------------------------------------


@query(
    "scalar_math_inverse_trig",
    oracle="""
        SELECT l_orderkey, l_linenumber,
               ROUND(ATAN2(l_quantity, l_extendedprice / 1000.0), 6)
                                                          AS angle_rad,
               ROUND(DEGREES(ATAN2(l_quantity, l_extendedprice / 1000.0)), 6)
                                                          AS angle_deg,
               ROUND(ASIN(l_discount * 2.0), 6)           AS disc_asin,
               ROUND(ACOS(1.0 - l_tax), 6)                AS tax_acos,
               ROUND(CBRT(l_extendedprice), 6)            AS price_cbrt,
               ROUND(RADIANS(l_quantity), 6)              AS qty_rad,
               CAST(SIGN(l_discount - 0.05) AS BIGINT)    AS disc_side
        FROM lineitem
    """,
    tags=("scalar", "math", "lineitem"),
)
def scalar_math_inverse_trig(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INVERSE-TRIG battery: atan2 (the quadrant-correct angle every
    geo/vector feature needs), its degree form, asin/acos on bounded
    inputs (l_discount ≤ 0.1 ⇒ 2d ≤ 0.2; 1−l_tax ∈ [0.92, 1.0] — both
    inside the principal domain), cube root, radians, and the
    three-valued sign — the direction-feature vocabulary completing
    the forward-trig haversine battery (``scalar_math_haversine``,
    r06) and the log battery (``scalar_math_log1p_hypot``). Row-local,
    JVM-side, whole-stage-codegen'd; no shuffle at any SF."""
    li = load_table(spark, sf_dir, "lineitem")
    q, d, t, p = (F.col(c) for c in
                  ("l_quantity", "l_discount", "l_tax", "l_extendedprice"))
    angle = F.atan2(q, p / 1000.0)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(angle, 6).alias("angle_rad"),
        F.round(F.degrees(angle), 6).alias("angle_deg"),
        F.round(F.asin(d * 2.0), 6).alias("disc_asin"),
        F.round(F.acos(1.0 - t), 6).alias("tax_acos"),
        F.round(F.cbrt(p), 6).alias("price_cbrt"),
        F.round(F.radians(q), 6).alias("qty_rad"),
        F.signum(d - 0.05).cast("bigint").alias("disc_side"),
    )


# ---------------------------------------------------------------------------
# json: object-shape introspection (keys, lengths, typed reads)
# ---------------------------------------------------------------------------


@query(
    "scalar_json_object_shape",
    oracle="""
        WITH j AS (
            SELECT event_id,
                   '{"k": ' || json_extract_string(props, '$.k')
                   || ', "type": "' || event_type
                   || '", "vals": [' || CAST(event_id % 5 AS VARCHAR)
                   || ', ' || CAST(event_id % 3 AS VARCHAR) || ']}' AS doc
            FROM events
        )
        SELECT event_id,
               array_to_string(list_sort(json_keys(doc)), ',') AS keys_sorted,
               CAST(len(json_keys(doc)) AS BIGINT)             AS n_keys,
               CAST(json_array_length(doc, '$.vals') AS BIGINT) AS n_vals,
               CAST(json_extract_string(doc, '$.vals[0]') AS BIGINT)
                                                               AS first_val,
               CAST(json_extract_string(doc, '$.k') AS BIGINT) AS k_typed
        FROM j
    """,
    tags=("scalar", "json", "events"),
)
def scalar_json_object_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON OBJECT-SHAPE introspection: enumerate keys
    (``json_object_keys``), count them, measure a nested array's
    length (``json_array_length``), and read typed leaves — the
    schema-discovery pass run before committing a ``from_json`` schema
    on a semi-structured feed (validity side:
    ``scalar_json_schema_validity``). Keys are emitted SORTED and
    serialized so the contract is order-independent; all row-local,
    one parse feeding four readers."""
    e = load_table(spark, sf_dir, "events")
    doc = F.concat(
        F.lit('{"k": '), F.get_json_object("props", "$.k"),
        F.lit(', "type": "'), F.col("event_type"),
        F.lit('", "vals": ['), (F.col("event_id") % 5).cast("string"),
        F.lit(", "), (F.col("event_id") % 3).cast("string"), F.lit("]}"),
    )
    return e.select(
        "event_id",
        F.array_join(F.array_sort(F.json_object_keys(doc)), ",").alias(
            "keys_sorted"
        ),
        F.size(F.json_object_keys(doc)).cast("bigint").alias("n_keys"),
        F.json_array_length(F.get_json_object(doc, "$.vals"))
        .cast("bigint")
        .alias("n_vals"),
        F.get_json_object(doc, "$.vals[0]").cast("bigint").alias("first_val"),
        F.get_json_object(doc, "$.k").cast("bigint").alias("k_typed"),
    )


# ---------------------------------------------------------------------------
# variant: mixed-type object with typed gets and null discipline
# ---------------------------------------------------------------------------


@query(
    "scalar_variant_mixed_scalars",
    oracle="""
        WITH v AS (
            SELECT event_id,
                   '{"i": ' || json_extract_string(props, '$.k')
                   || ', "f": ' || CAST(event_id % 7 AS VARCHAR) || '.5'
                   || ', "s": "' || event_type || '"'
                   || ', "b": ' || CASE WHEN event_id % 2 = 0
                                        THEN 'true' ELSE 'false' END
                   || ', "z": null}' AS doc
            FROM events
        )
        SELECT event_id,
               CAST(json_extract_string(doc, '$.i') AS BIGINT)  AS i_typed,
               CAST(json_extract_string(doc, '$.f') AS DOUBLE)  AS f_typed,
               json_extract_string(doc, '$.s')                  AS s_typed,
               CAST(json_extract_string(doc, '$.b') AS BOOLEAN) AS b_typed,
               json_type(doc, '$.z') = 'NULL'                   AS z_is_null,
               json_extract_string(doc, '$.missing') IS NULL    AS missing_null
        FROM v
    """,
    tags=("scalar", "variant", "events"),
)
def scalar_variant_mixed_scalars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VARIANT with every scalar kind in one value: int, fraction,
    string, boolean, an explicit JSON null, and an absent path — one
    ``parse_json`` feeding six typed ``variant_get`` reads, including
    the two null disciplines the type distinguishes
    (``is_variant_null`` for a PRESENT null vs NULL-result for a
    MISSING path) — the semi-structured contract the JSON-string
    functions can't express (object paths:
    ``scalar_variant_typed_paths``; arrays:
    ``scalar_variant_array_paths``). Row-local, single parse."""
    e = load_table(spark, sf_dir, "events")
    doc = F.concat(
        F.lit('{"i": '), F.get_json_object("props", "$.k"),
        F.lit(', "f": '), (F.col("event_id") % 7).cast("string"), F.lit(".5"),
        F.lit(', "s": "'), F.col("event_type"), F.lit('"'),
        F.lit(', "b": '),
        F.when(F.col("event_id") % 2 == 0, "true").otherwise("false"),
        F.lit(', "z": null}'),
    )
    v = F.parse_json(doc)
    return e.select(
        "event_id",
        F.try_variant_get(v, "$.i", "bigint").alias("i_typed"),
        F.try_variant_get(v, "$.f", "double").alias("f_typed"),
        F.try_variant_get(v, "$.s", "string").alias("s_typed"),
        F.try_variant_get(v, "$.b", "boolean").alias("b_typed"),
        F.is_variant_null(F.variant_get(v, "$.z", "variant")).alias(
            "z_is_null"
        ),
        F.try_variant_get(v, "$.missing", "string").isNull().alias(
            "missing_null"
        ),
    )


# ---------------------------------------------------------------------------
# array: integer-sequence set algebra, closed-form oracle
# ---------------------------------------------------------------------------


@query(
    "array_sequence_set_algebra",
    oracle="""
        WITH s AS (
            SELECT o_orderkey,
                   o_orderkey % 7 AS a_lo, o_orderkey % 7 + 5 AS a_hi,
                   o_orderkey % 5 AS b_lo, o_orderkey % 5 + 4 AS b_hi
            FROM orders
        ),
        ov AS (
            SELECT *,
                   GREATEST(0, LEAST(a_hi, b_hi)
                               - GREATEST(a_lo, b_lo) + 1) AS n_common
            FROM s
        )
        SELECT o_orderkey,
               CAST(n_common AS BIGINT)                    AS n_intersect,
               CAST(6 + 5 - n_common AS BIGINT)            AS n_union,
               CAST(6 - n_common AS BIGINT)                AS n_a_only,
               CAST(CASE WHEN b_lo BETWEEN a_lo AND a_hi
                         THEN b_lo - a_lo + 1 ELSE 0 END AS BIGINT)
                                                           AS b_lo_pos_in_a,
               n_common = 5 AND a_lo <= b_lo AND b_hi <= a_hi
                                                           AS b_subset_of_a
        FROM ov
    """,
    tags=("scalar", "array", "orders"),
)
def array_sequence_set_algebra(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ARRAY SET ALGEBRA on strictly-increasing integer sequences:
    intersect/union/except sizes, membership position
    (``array_position``), and the subset predicate — computed with
    Spark's native array functions, while the oracle derives every
    answer in CLOSED FORM from interval arithmetic (two consecutive
    integer ranges intersect in max(0, min(hi)−max(lo)+1) elements) —
    two genuinely independent formulations. All integers, bit-exact by
    construction; row-local, no shuffle, codegen'd."""
    o = load_table(spark, sf_dir, "orders")
    a = F.sequence(F.col("o_orderkey") % 7, F.col("o_orderkey") % 7 + 5)
    b = F.sequence(F.col("o_orderkey") % 5, F.col("o_orderkey") % 5 + 4)
    inter = F.array_intersect(a, b)
    return o.select(
        "o_orderkey",
        F.size(inter).cast("bigint").alias("n_intersect"),
        F.size(F.array_union(a, b)).cast("bigint").alias("n_union"),
        F.size(F.array_except(a, b)).cast("bigint").alias("n_a_only"),
        F.array_position(a, F.element_at(b, 1)).cast("bigint").alias(
            "b_lo_pos_in_a"
        ),
        (F.size(F.array_except(b, a)) == 0).alias("b_subset_of_a"),
    )


# ---------------------------------------------------------------------------
# map: aggregated histogram map serialized with a canonical key order
# ---------------------------------------------------------------------------


@query(
    "scalar_map_user_type_histogram",
    oracle="""
        WITH c AS (
            SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS n
            FROM events GROUP BY user_id, event_type
        )
        SELECT user_id,
               '{' || string_agg('"' || event_type || '":' || CAST(n AS VARCHAR),
                                 ',' ORDER BY event_type) || '}' AS hist_json,
               CAST(COUNT(*) AS BIGINT)                          AS n_types,
               CAST(MAX(n) AS BIGINT)                            AS max_type_n
        FROM c
        GROUP BY user_id
    """,
    tags=("scalar", "map", "events"),
)
def scalar_map_user_type_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user EVENT-TYPE HISTOGRAM AS A MAP: counts per type
    collected into a ``map<string,bigint>`` via ``map_from_entries``
    over a KEY-SORTED entry list, serialized with ``to_json`` — the
    canonical-order discipline that makes a map column comparable,
    diffable, and oracle-checkable at all (Spark map serialization
    follows entry order; sorting the entries first makes it
    deterministic). The oracle builds the same JSON with an ORDER BY
    inside ``string_agg``. Two shuffles both keyed by user — the
    second reuses the first's partitioning at 100 TB."""
    e = load_table(spark, sf_dir, "events")
    c = e.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    return (
        c.groupBy("user_id")
        .agg(
            F.map_from_entries(
                F.array_sort(F.collect_list(F.struct("event_type", "n")))
            ).alias("hist"),
            F.count(F.lit(1)).cast("bigint").alias("n_types"),
            F.max("n").cast("bigint").alias("max_type_n"),
        )
        .select(
            "user_id",
            F.to_json("hist").alias("hist_json"),
            "n_types",
            "max_type_n",
        )
    )


# ---------------------------------------------------------------------------
# dedup / minhash / lsh: band bucket-size profile (index health)
# ---------------------------------------------------------------------------


def _lsh_bucket_profile_sql() -> str:
    from big_data_audio_classification_spark.operators.dedup import (
        LSH_BANDS,
        LSH_ROWS,
        _minhash_sql,
    )

    band_exprs = ", ".join(
        "CONCAT_WS('_', "
        + ", ".join(f"m{b * LSH_ROWS + r}" for r in range(LSH_ROWS))
        + f") AS band{b}"
        for b in range(LSH_BANDS)
    )
    unions = "\n            UNION ALL\n            ".join(
        f"SELECT doc_id, {b} AS band_id, band{b} AS band_hash FROM sig_bands"
        for b in range(LSH_BANDS)
    )
    return f"""
        WITH sig AS ({_minhash_sql()}),
        sig_bands AS (SELECT doc_id, {band_exprs} FROM sig),
        bands AS (
            {unions}
        ),
        buckets AS (
            SELECT band_id, band_hash, CAST(COUNT(*) AS BIGINT) AS s
            FROM bands GROUP BY band_id, band_hash
        )
        SELECT CAST(band_id AS BIGINT)                       AS band_id,
               CAST(COUNT(*) AS BIGINT)                      AS n_buckets,
               CAST(MAX(s) AS BIGINT)                        AS max_bucket,
               CAST(SUM(CASE WHEN s = 1 THEN 1 ELSE 0 END) AS BIGINT)
                                                             AS n_singletons,
               CAST(SUM(s * (s - 1) // 2) AS BIGINT)         AS pair_mass
        FROM buckets GROUP BY band_id
    """


@query(
    "dedup_lsh_bucket_profile",
    oracle=_lsh_bucket_profile_sql(),
    tags=("dedup", "minhash", "lsh", "report", "documents"),
)
def dedup_lsh_bucket_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH BUCKET-SIZE PROFILE per band: bucket count, largest bucket,
    singleton count, and the PAIR MASS Σ s·(s−1)/2 — the exact number
    of candidate pairs each band will emit, known BEFORE running the
    self-join. This is the go/no-go health check for an LSH index at
    100 TB: one hot bucket of size s costs s² verification, and this
    report prices it with one groupBy instead of materializing the
    pairs (candidate-count sweep across configs:
    ``dedup_minhash_band_sweep``; the pair join itself:
    ``dedup_minhash_lsh_pairs``). Signature pass runs once; the
    profile is a two-level aggregation, output = 4 rows at any SF."""
    from big_data_audio_classification_spark.operators.dedup import (
        LSH_BANDS,
        LSH_ROWS,
        minhash_signature,
    )

    d = load_table(spark, sf_dir, "documents")
    sig = minhash_signature(d, "doc_id", "text")
    bands = sig.select(
        "doc_id",
        F.posexplode(
            F.array(
                *[
                    F.concat_ws(
                        "_",
                        *[F.col(f"m{b * LSH_ROWS + r}") for r in range(LSH_ROWS)],
                    )
                    for b in range(LSH_BANDS)
                ]
            )
        ).alias("band_id", "band_hash"),
    )
    buckets = bands.groupBy("band_id", "band_hash").agg(
        F.count(F.lit(1)).cast("bigint").alias("s")
    )
    return buckets.groupBy(F.col("band_id").cast("bigint").alias("band_id")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_buckets"),
        F.max("s").cast("bigint").alias("max_bucket"),
        F.sum(F.when(F.col("s") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("n_singletons"),
        # Σ s(s−1) accumulated in DECIMAL(38,0) then halved with exact
        # decimal division: bigint s·(s−1) wraps silently past 3e9-doc
        # buckets and double `/2` loses exactness past 2^53, while the
        # DuckDB oracle promotes to HUGEINT (r07 advice)
        (F.sum(F.col("s").cast("decimal(38,0)") * (F.col("s") - 1)) / 2)
        .cast("bigint")
        .alias("pair_mass"),
    )


# ---------------------------------------------------------------------------
# dedup / simhash: prefix-length collision schedule
# ---------------------------------------------------------------------------

SIMHASH_PREFIX_BITS = (8, 16, 24)


def _simhash_prefix_sql() -> str:
    from big_data_audio_classification_spark.operators.dedup import _simhash_sql

    legs = "\n        UNION ALL\n        ".join(
        f"""SELECT {bits} AS prefix_bits,
                   simhash >> {32 - bits} AS bucket
            FROM sh"""
        for bits in SIMHASH_PREFIX_BITS
    )
    return f"""
        WITH sh AS ({_simhash_sql()}),
        pb AS (
        {legs}
        ),
        buckets AS (
            SELECT prefix_bits, bucket, CAST(COUNT(*) AS BIGINT) AS s
            FROM pb GROUP BY prefix_bits, bucket
        )
        SELECT CAST(prefix_bits AS BIGINT)            AS prefix_bits,
               CAST(COUNT(*) AS BIGINT)               AS n_buckets,
               CAST(MAX(s) AS BIGINT)                 AS max_bucket,
               CAST(SUM(s * (s - 1) // 2) AS BIGINT)  AS pair_mass
        FROM buckets GROUP BY prefix_bits
    """


@query(
    "dedup_simhash_prefix_schedule",
    oracle=_simhash_prefix_sql(),
    tags=("dedup", "simhash", "report", "documents"),
)
def dedup_simhash_prefix_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash PREFIX-COLLAPSE schedule: bucket statistics (count,
    largest, candidate pair mass) at 8/16/24-bit fingerprint prefixes
    — the tuning table for prefix-blocked near-dup search (longer
    prefix → fewer, cleaner candidates but lower recall for distant
    bit flips; Manku et al.'s permuted-table design picks prefixes off
    exactly this curve). One fingerprint pass; each prefix length is a
    shift + groupBy over the SAME 1-row-per-doc frame (the 3-way
    explode multiplies fingerprints, never documents' text); output =
    3 rows at any SF."""
    from big_data_audio_classification_spark.operators.dedup import dedup_simhash

    # no persist: the 3 legs each re-derive the 1-row-per-doc
    # fingerprint frame (cheap), and a persisted frame would pin
    # executor storage for the rest of a long gate/bench session
    sh = dedup_simhash(spark, sf_dir)
    legs = [
        sh.select(
            F.lit(bits).alias("prefix_bits"),
            F.shiftright(F.col("simhash"), 32 - bits).alias("bucket"),
        )
        for bits in SIMHASH_PREFIX_BITS
    ]
    pb = legs[0]
    for leg in legs[1:]:
        pb = pb.unionByName(leg)
    buckets = pb.groupBy("prefix_bits", "bucket").agg(
        F.count(F.lit(1)).cast("bigint").alias("s")
    )
    return buckets.groupBy(
        F.col("prefix_bits").cast("bigint").alias("prefix_bits")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_buckets"),
        F.max("s").cast("bigint").alias("max_bucket"),
        # same exact DECIMAL(38,0) pair-mass idiom as
        # dedup_lsh_bucket_profile (r07 advice)
        (F.sum(F.col("s").cast("decimal(38,0)") * (F.col("s") - 1)) / 2)
        .cast("bigint")
        .alias("pair_mass"),
    )


# ---------------------------------------------------------------------------
# text / tfidf / topk: BM25 ranking with a fixed conjunctive query
# ---------------------------------------------------------------------------

BM25_TERMS = ("table", "query", "spark")
BM25_K1 = 1.2
BM25_B = 0.75
BM25_TOPK = 10


def _bm25_sql() -> str:
    t1, t2, t3 = BM25_TERMS
    tf_cols = ", ".join(
        f"CAST(SUM(CASE WHEN tok = '{t}' THEN 1 ELSE 0 END) AS BIGINT) AS tf{i}"
        for i, t in enumerate(BM25_TERMS, 1)
    )
    df_cols = ", ".join(
        f"CAST(SUM(CASE WHEN tf{i} > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df{i}"
        for i in range(1, 4)
    )
    # per-term score written as ONE shared expression template so both
    # engines evaluate the identical float DAG
    score = " + ".join(
        f"""(LN(1.0 + (n_docs - df{i} + 0.5) / (df{i} + 0.5))
             * (tf{i} * ({BM25_K1} + 1.0))
             / (tf{i} + {BM25_K1} * (1.0 - {BM25_B} + {BM25_B} * dl / avgdl)))"""
        for i in range(1, 4)
    )
    return f"""
        WITH toks AS (
            SELECT doc_id,
                   UNNEST(list_filter(string_split(text, ' '),
                                      t -> t <> '')) AS tok
            FROM documents
        ),
        per_doc AS (
            SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dl, {tf_cols}
            FROM toks GROUP BY doc_id
        ),
        corpus AS (
            SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs,
                   CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl, {df_cols}
            FROM per_doc
        ),
        scored AS (
            SELECT doc_id, dl, tf1, tf2, tf3,
                   ROUND({score}, 6) AS bm25
            FROM per_doc, corpus
            WHERE tf1 + tf2 + tf3 > 0
        )
        SELECT doc_id, dl, tf1, tf2, tf3, bm25,
               CAST(rn AS BIGINT) AS rank
        FROM (SELECT *, ROW_NUMBER() OVER (ORDER BY bm25 DESC, doc_id) AS rn
              FROM scored)
        WHERE rn <= {BM25_TOPK}
    """


@query(
    "text_bm25_rank",
    oracle=_bm25_sql(),
    tags=("text", "tfidf", "topk", "documents"),
)
def text_bm25_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 ranking (k1=1.2, b=0.75) for a fixed 3-term query — the
    retrieval scoring function that superseded raw tf-idf (Robertson/
    Okapi; the Lucene default). Everything upstream of the score is
    EXACT integers (tf per term via conditional aggregation — no
    pivot shuffle; dl; df; N), and the score itself is ONE shared
    float expression template with the three per-term contributions
    summed in FIXED textual order on both engines — the bit-stability
    discipline for float scoring. Corpus stats are a 1-row broadcast;
    top-k is a rank over scored docs only (zero-match docs pruned
    before the sort). tf-idf siblings: ``text_tfidf_query_rank``
    (r06), ``text_tfidf_field_boost`` (stock)."""
    from big_data_audio_classification_spark.operators.dedup import tokens_col

    d = load_table(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.explode(tokens_col(F.col("text"))).alias("tok"))
    tf_aggs = [
        F.sum(F.when(F.col("tok") == t, 1).otherwise(0))
        .cast("bigint")
        .alias(f"tf{i}")
        for i, t in enumerate(BM25_TERMS, 1)
    ]
    per_doc = toks.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("dl"), *tf_aggs
    )
    corpus = per_doc.agg(
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        (F.sum("dl").cast("double") / F.count(F.lit(1))).alias("avgdl"),
        *[
            F.sum(F.when(F.col(f"tf{i}") > 0, 1).otherwise(0))
            .cast("double")
            .alias(f"df{i}")
            for i in range(1, 4)
        ],
    )
    def term_score(i: int):
        tf = F.col(f"tf{i}")
        df = F.col(f"df{i}")
        idf = F.log(1.0 + (F.col("n_docs") - df + 0.5) / (df + 0.5))
        return (
            idf
            * (tf * (BM25_K1 + 1.0))
            / (tf + BM25_K1 * (1.0 - BM25_B + BM25_B * F.col("dl") / F.col("avgdl")))
        )

    scored = (
        per_doc.crossJoin(F.broadcast(corpus))
        .filter(F.col("tf1") + F.col("tf2") + F.col("tf3") > 0)
        .select(
            "doc_id", "dl", "tf1", "tf2", "tf3",
            F.round(term_score(1) + term_score(2) + term_score(3), 6).alias(
                "bm25"
            ),
        )
    )
    w = Window.orderBy(F.col("bm25").desc(), "doc_id")
    return (
        scored.select("*", F.row_number().over(w).cast("bigint").alias("rank"))
        .filter(F.col("rank") <= BM25_TOPK)
    )


# ---------------------------------------------------------------------------
# lm: Jelinek-Mercer smoothed query likelihood
# ---------------------------------------------------------------------------

JM_LAMBDA = 0.7  # document weight; (1-λ) goes to the collection model
JM_TERMS = ("table", "query", "stream")


def _jm_sql() -> str:
    tf_cols = ", ".join(
        f"CAST(SUM(CASE WHEN tok = '{t}' THEN 1 ELSE 0 END) AS BIGINT) AS tf{i}"
        for i, t in enumerate(JM_TERMS, 1)
    )
    cf_cols = ", ".join(
        f"CAST(SUM(tf{i}) AS DOUBLE) AS cf{i}" for i in range(1, 4)
    )
    ll = " + ".join(
        f"""LN({JM_LAMBDA} * tf{i} / dl
               + {1.0 - JM_LAMBDA} * cf{i} / clen)"""
        for i in range(1, 4)
    )
    return f"""
        WITH toks AS (
            SELECT doc_id,
                   UNNEST(list_filter(string_split(text, ' '),
                                      t -> t <> '')) AS tok
            FROM documents
        ),
        per_doc AS (
            SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dl, {tf_cols}
            FROM toks GROUP BY doc_id
        ),
        corpus AS (
            SELECT CAST(SUM(dl) AS DOUBLE) AS clen, {cf_cols} FROM per_doc
        )
        SELECT doc_id, dl, tf1, tf2, tf3,
               ROUND({ll}, 6) AS query_loglik
        FROM per_doc, corpus
    """


@query(
    "text_lm_jelinek_mercer",
    oracle=_jm_sql(),
    tags=("text", "lm", "documents"),
)
def text_lm_jelinek_mercer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JELINEK-MERCER smoothed query log-likelihood (λ=0.7): each
    document scores a fixed 3-term query under the interpolated
    language model λ·tf/dl + (1−λ)·cf/|C| — the query-likelihood
    retrieval model (Zhai & Lafferty) whose collection interpolation
    keeps zero-tf documents scoreable (absolute discounting sibling:
    ``text_lm_absolute_discount``; perplexity:
    ``text_perplexity_outliers``). All counts exact integers; the
    log-likelihood is one fixed-order 3-term float expression per row
    against a 1-row broadcast of collection stats — the same
    bit-stability discipline as ``text_bm25_rank``. One token pass,
    one aggregate, no sort."""
    from big_data_audio_classification_spark.operators.dedup import tokens_col

    d = load_table(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.explode(tokens_col(F.col("text"))).alias("tok"))
    per_doc = toks.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("dl"),
        *[
            F.sum(F.when(F.col("tok") == t, 1).otherwise(0))
            .cast("bigint")
            .alias(f"tf{i}")
            for i, t in enumerate(JM_TERMS, 1)
        ],
    )
    corpus = per_doc.agg(
        F.sum("dl").cast("double").alias("clen"),
        *[F.sum(f"tf{i}").cast("double").alias(f"cf{i}") for i in range(1, 4)],
    )
    ll = None
    for i in range(1, 4):
        term = F.log(
            JM_LAMBDA * F.col(f"tf{i}") / F.col("dl")
            + (1.0 - JM_LAMBDA) * F.col(f"cf{i}") / F.col("clen")
        )
        ll = term if ll is None else ll + term
    return per_doc.crossJoin(F.broadcast(corpus)).select(
        "doc_id", "dl", "tf1", "tf2", "tf3",
        F.round(ll, 6).alias("query_loglik"),
    )


# ---------------------------------------------------------------------------
# ivf: second-choice margin per cell (quantization confidence)
# ---------------------------------------------------------------------------


@query(
    "sim_ivf_second_choice_margin",
    oracle=f"""
        WITH c AS (SELECT vec_id AS cell_id, embedding FROM embeddings
                   WHERE vec_id < {_IVF_CELLS}),
        d AS (
            SELECT e.vec_id, c.cell_id,
                   list_sum(list_transform(list_zip(c.embedding, e.embedding),
                            p -> (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))
                               * (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))))
                       AS d2
            FROM embeddings e CROSS JOIN c
        ),
        r AS (
            SELECT vec_id, cell_id, SQRT(d2) AS dist,
                   ROW_NUMBER() OVER (PARTITION BY vec_id
                                      ORDER BY d2, cell_id) AS rn
            FROM d
        ),
        m AS (
            SELECT vec_id,
                   MAX(CASE WHEN rn = 1 THEN cell_id END) AS cell_id,
                   MAX(CASE WHEN rn = 2 THEN dist END)
                       - MAX(CASE WHEN rn = 1 THEN dist END) AS margin
            FROM r WHERE rn <= 2 GROUP BY vec_id
        ),
        cells AS (
            SELECT cell_id,
                   CAST(COUNT(*) AS BIGINT)       AS n_vectors,
                   list(margin ORDER BY vec_id)   AS ms,
                   MIN(margin)                    AS min_margin,
                   CAST(SUM(CASE WHEN margin < 0.5 THEN 1 ELSE 0 END)
                        AS BIGINT)                AS n_ambiguous
            FROM m GROUP BY cell_id
        )
        SELECT cell_id, n_vectors,
               ROUND(list_sum(ms) / n_vectors, 6) AS mean_margin,
               ROUND(min_margin, 6)               AS min_margin,
               n_ambiguous
        FROM cells
    """,
    tags=("similarity", "ivf", "embeddings"),
)
def sim_ivf_second_choice_margin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF SECOND-CHOICE MARGIN per cell: the gap d₂−d₁ between each
    vector's nearest and second-nearest coarse centroid — the
    quantization-confidence statistic that directly predicts how much
    recall nprobe=1 loses (vectors with small margins are the ones a
    single-probe search misassigns; cell sizes alone —
    ``sim_ivf_cell_balance`` — can't see this). Broadcast the
    centroids, map-only distance scoring, one rank window per vector,
    then an O(cells)-row aggregate; per-vector margins are
    deterministic row-local floats and the per-cell MEAN runs as a
    vec_id-ordered SEQUENTIAL in-row fold (an engine-side AVG across
    rows is summation-order-dependent — the audio_energy_flatness
    lesson applied before certification this time); min and the
    threshold count are order-free. The margin threshold (0.5) counts
    the ambiguous population per cell. At 100 TB cap the per-cell
    margin array or histogram the margins instead."""
    from big_data_audio_classification_spark.functions.vector import (
        l2_dist_sq,
        to_double,
    )

    em = load_table(spark, sf_dir, "embeddings")
    cents = em.filter(F.col("vec_id") < _IVF_CELLS).select(
        F.col("vec_id").alias("cell_id"), F.col("embedding").alias("c_emb")
    )
    d2 = l2_dist_sq(to_double(F.col("c_emb")), to_double(F.col("embedding")))
    scored = em.crossJoin(F.broadcast(cents)).select(
        "vec_id", "cell_id", d2.alias("d2s")
    )
    w = Window.partitionBy("vec_id").orderBy("d2s", "cell_id")
    r = scored.select(
        "vec_id", "cell_id", F.sqrt("d2s").alias("dist"),
        F.row_number().over(w).alias("rn"),
    ).filter(F.col("rn") <= 2)
    m = r.groupBy("vec_id").agg(
        F.max(F.when(F.col("rn") == 1, F.col("cell_id"))).alias("cell_id"),
        (
            F.max(F.when(F.col("rn") == 2, F.col("dist")))
            - F.max(F.when(F.col("rn") == 1, F.col("dist")))
        ).alias("margin"),
    )
    cells = m.groupBy("cell_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_vectors"),
        F.transform(
            F.array_sort(F.collect_list(F.struct("vec_id", "margin"))),
            lambda s: s.getField("margin"),
        ).alias("ms"),
        F.min("margin").alias("min_margin"),
        F.sum(F.when(F.col("margin") < 0.5, 1).otherwise(0))
        .cast("bigint")
        .alias("n_ambiguous"),
    )
    mean_margin = (
        F.aggregate(F.col("ms"), F.lit(0.0), lambda acc, p: acc + p)
        / F.col("n_vectors")
    )
    return cells.select(
        "cell_id",
        "n_vectors",
        F.round(mean_margin, 6).alias("mean_margin"),
        F.round("min_margin", 6).alias("min_margin"),
        "n_ambiguous",
    )


# ---------------------------------------------------------------------------
# feature-selection: mRMR first-iteration ranking
# ---------------------------------------------------------------------------

MRMR_DIMS = 8  # score dims 0..7; dim 0 is the already-selected anchor
MRMR_Q = 10000  # fixed-point scale: x -> round(x * 1e4) exact integer


def _mrmr_sql() -> str:
    # sufficient statistics for corr(x_d, label) and corr(x_d, x_0) —
    # accumulated over EXACT fixed-point integers (scale {MRMR_Q}) so
    # the cross-row sums are order-independent on both engines; the
    # correlations are then fixed-order float expressions over the
    # 1-row exact frame (cast-to-double of an int < 2^53 is exact).
    stat_cols = []
    for d in range(MRMR_DIMS):
        stat_cols += [
            f"CAST(SUM(x{d}) AS DOUBLE) AS s{d}",
            f"CAST(SUM(x{d} * x{d}) AS DOUBLE) AS ss{d}",
            f"CAST(SUM(x{d} * y) AS DOUBLE) AS sy{d}",
            f"CAST(SUM(x{d} * x0) AS DOUBLE) AS sx0_{d}",
        ]
    xs = ", ".join(
        f"CAST(ROUND(CAST(embedding[{d + 1}] AS DOUBLE) * {MRMR_Q}) AS BIGINT)"
        f" AS x{d}"
        for d in range(MRMR_DIMS)
    )
    legs = "\n        UNION ALL\n        ".join(
        f"""SELECT {d} AS dim,
                   (n * sy{d} - s{d} * sy) /
                   (SQRT(n * ss{d} - s{d} * s{d}) * SQRT(n * ssy - sy * sy))
                       AS relevance,
                   (n * sx0_{d} - s{d} * s0) /
                   (SQRT(n * ss{d} - s{d} * s{d}) * SQRT(n * ss0 - s0 * s0))
                       AS redundancy
            FROM stats"""
        for d in range(1, MRMR_DIMS)
    )
    return f"""
        WITH base AS (
            SELECT CAST(label AS BIGINT) AS y, {xs}
            FROM embeddings
        ),
        stats AS (
            SELECT CAST(COUNT(*) AS DOUBLE) AS n,
                   CAST(SUM(y) AS DOUBLE) AS sy,
                   CAST(SUM(y * y) AS DOUBLE) AS ssy,
                   {", ".join(stat_cols)}
            FROM base
        ),
        scores AS (
        {legs}
        )
        SELECT CAST(dim AS BIGINT) AS dim,
               ROUND(relevance, 6)  AS relevance,
               ROUND(redundancy, 6) AS redundancy,
               ROUND(ABS(relevance) - ABS(redundancy), 6) AS mrmr_score,
               CAST(ROW_NUMBER() OVER (
                   ORDER BY ABS(relevance) - ABS(redundancy) DESC, dim)
                   AS BIGINT) AS rank
        FROM scores
    """


@query(
    "ml_mrmr_feature_rank",
    oracle=_mrmr_sql(),
    tags=("ml", "feature-selection", "embeddings"),
)
def ml_mrmr_feature_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mRMR (minimum-redundancy-maximum-relevance) FIRST ITERATION:
    with dim 0 already selected, rank dims 1..7 by |corr(x, label)| −
    |corr(x, x₀)| — the Peng et al. greedy step that picks features
    informative about the target but NOT about what's already chosen
    (pure-relevance siblings: ``ml_anova_f_selection`` r06,
    ``ml_chi2_feature_selection`` stock). ONE pass computes every
    sufficient statistic (n, Σx, Σx², Σxy, Σxx₀ per dim — 34 aggregates
    map-side combined) over FIXED-POINT integers (x → round(x·10⁴), so
    the cross-row sums are EXACT and order-independent — raw float
    sums here would make the rank itself partition-order-dependent);
    the correlations and the score are fixed-order float expressions
    over that 1-row exact frame. At 100 TB this is one scan regardless
    of how many candidate features enter the round."""
    em = load_table(spark, sf_dir, "embeddings")
    base = em.select(
        F.col("label").cast("bigint").alias("y"),
        *[
            F.round(F.col("embedding").getItem(d).cast("double") * MRMR_Q)
            .cast("bigint")
            .alias(f"x{d}")
            for d in range(MRMR_DIMS)
        ],
    )
    aggs = [
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("y").cast("double").alias("sy"),
        F.sum(F.col("y") * F.col("y")).cast("double").alias("ssy"),
    ]
    for d in range(MRMR_DIMS):
        x = F.col(f"x{d}")
        # x² and x·x₀ reach 1e8/row: accumulate in DECIMAL(38,0) so the
        # sums stay exact at any row count — Spark bigint SUM wraps
        # silently (non-ANSI) while the DuckDB oracle promotes to
        # HUGEINT (r07 advice); identical exact integers cast to
        # identical doubles
        aggs += [
            F.sum(x).cast("double").alias(f"s{d}"),
            F.sum(x.cast("decimal(38,0)") * x).cast("double").alias(f"ss{d}"),
            F.sum(x * F.col("y")).cast("double").alias(f"sy{d}"),
            F.sum(x.cast("decimal(38,0)") * F.col("x0"))
            .cast("double")
            .alias(f"sx0_{d}"),
        ]
    stats = base.agg(*aggs)
    legs = []
    for d in range(1, MRMR_DIMS):
        n = F.col("n")
        rel = (n * F.col(f"sy{d}") - F.col(f"s{d}") * F.col("sy")) / (
            F.sqrt(n * F.col(f"ss{d}") - F.col(f"s{d}") * F.col(f"s{d}"))
            * F.sqrt(n * F.col("ssy") - F.col("sy") * F.col("sy"))
        )
        red = (n * F.col(f"sx0_{d}") - F.col(f"s{d}") * F.col("s0")) / (
            F.sqrt(n * F.col(f"ss{d}") - F.col(f"s{d}") * F.col(f"s{d}"))
            * F.sqrt(n * F.col("ss0") - F.col("s0") * F.col("s0"))
        )
        legs.append(
            stats.select(
                F.lit(d).cast("bigint").alias("dim"),
                rel.alias("relevance"),
                red.alias("redundancy"),
            )
        )
    scores = legs[0]
    for leg in legs[1:]:
        scores = scores.unionByName(leg)
    w = Window.orderBy(
        (F.abs(F.col("relevance")) - F.abs(F.col("redundancy"))).desc(), "dim"
    )
    return scores.select(
        "dim",
        F.round("relevance", 6).alias("relevance"),
        F.round("redundancy", 6).alias("redundancy"),
        F.round(F.abs(F.col("relevance")) - F.abs(F.col("redundancy")), 6).alias(
            "mrmr_score"
        ),
        F.row_number().over(w).cast("bigint").alias("rank"),
    )


# ---------------------------------------------------------------------------
# encoding: smoothed count/target encoding, exact-integer core
# ---------------------------------------------------------------------------

ENC_SMOOTHING_M = 10  # pseudo-observations pulled toward the global prior


@query(
    "ml_count_encoding_smoothed",
    oracle=f"""
        WITH o AS (
            SELECT c.c_mktsegment AS segment,
                   CAST(ROUND(t.o_totalprice * 100) AS BIGINT) AS cents
            FROM orders t JOIN customer c ON t.o_custkey = c.c_custkey
        ),
        g AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_total,
                     CAST(SUM(cents) AS BIGINT) AS cents_total FROM o)
        SELECT segment,
               CAST(COUNT(*) AS BIGINT) AS n,
               ROUND(CAST(COUNT(*) AS DOUBLE) / MAX(g.n_total), 6)
                                        AS freq_encoding,
               ROUND((CAST(SUM(cents) AS DOUBLE)
                      + {ENC_SMOOTHING_M}.0
                        * (CAST(MAX(g.cents_total) AS DOUBLE) / MAX(g.n_total)))
                     / (COUNT(*) + {ENC_SMOOTHING_M}) / 100.0, 4)
                                        AS target_encoding
        FROM o, g
        GROUP BY segment
    """,
    tags=("ml", "encoding", "orders"),
)
def ml_count_encoding_smoothed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CATEGORY ENCODINGS with Bayesian smoothing: frequency encoding
    (share of rows) and m-estimate target encoding — the per-category
    mean pulled toward the global prior by m=10 pseudo-observations,
    the standard high-cardinality-category defense against small-n
    overfitting (leave-one-out variant: ``ml_target_encoding_oof``,
    r04; unsmoothed ordinal/freq: ``ml_ordinal_freq_encoding``,
    stock). Sums stay EXACT integer cents; each output is a fixed
    two-division float expression, bit-stable on both engines. One
    join (customer side broadcastable) + one aggregate; the global
    prior is a 1-row broadcast."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    base = o.join(F.broadcast(c), o.o_custkey == c.c_custkey).select(
        F.col("c_mktsegment").alias("segment"),
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
    )
    g = base.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_total"),
        F.sum("cents").cast("bigint").alias("cents_total"),
    )
    return (
        base.crossJoin(F.broadcast(g))
        .groupBy("segment")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.round(
                F.count(F.lit(1)).cast("double") / F.max("n_total"), 6
            ).alias("freq_encoding"),
            F.round(
                (
                    F.sum("cents").cast("double")
                    + float(ENC_SMOOTHING_M)
                    * (F.max("cents_total").cast("double") / F.max("n_total"))
                )
                / (F.count(F.lit(1)) + ENC_SMOOTHING_M)
                / 100.0,
                4,
            ).alias("target_encoding"),
        )
    )


# ---------------------------------------------------------------------------
# reference: parity-labelled duration shares over the phrase catalog
# ---------------------------------------------------------------------------


def _ref_parity_shares_sql() -> str:
    from big_data_audio_classification_spark.operators.reference_pipeline import (
        _SEGMENTS_SQL,
    )

    return f"""
        WITH seg AS ({_SEGMENTS_SQL}),
        tot AS (SELECT SUM(dur) AS total_dur FROM seg)
        SELECT speaker,
               CAST(COUNT(*) AS BIGINT)       AS n_phrases,
               SUM(dur)                       AS speaker_dur,
               ROUND(SUM(dur) / MAX(tot.total_dur), 6) AS dur_share,
               MAX(seconds)                   AS last_cum_second
        FROM seg, tot
        GROUP BY speaker
    """


@query(
    "ref_parity_duration_shares",
    oracle=_ref_parity_shares_sql(),
    tags=("reference", "aggregate", "window"),
)
def ref_parity_duration_shares(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference R3+R7+R19 composed: per-SPEAKER duration share of the
    phrase catalog — parity labels (R3, `src/data_generator.py`),
    cumulative seconds (R7), and the group-by reduction (R19) in one
    report (the per-phrase ledger itself: ``ref_segments_cumsum``).
    Durations are whole seconds stored as doubles (exactly
    representable), so the sums are exact and the single share
    division is bit-stable. The phrase table is one tiny broadcast at
    any SF — the 100 TB form partitions the cumulative window by
    recording id, as ``ref_segments_cumsum`` documents."""
    from big_data_audio_classification_spark.operators.reference_pipeline import (
        segments,
    )

    seg = segments(spark)
    tot = seg.agg(F.sum("dur").alias("total_dur"))
    return (
        seg.crossJoin(F.broadcast(tot))
        .groupBy("speaker")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_phrases"),
            F.sum("dur").alias("speaker_dur"),
            F.round(F.sum("dur") / F.max("total_dur"), 6).alias("dur_share"),
            F.max("seconds").alias("last_cum_second"),
        )
    )


# ---------------------------------------------------------------------------
# audio-math: crest factor per frame, rolled up per channel
# ---------------------------------------------------------------------------

CREST_FRAME = 64  # samples per frame, matches the RMS/ZCR framing


@query(
    "audio_crest_factor",
    oracle=f"""
        WITH x AS (
            SELECT user_id, CAST(ROUND(value * 100) AS BIGINT) AS c,
                   ROW_NUMBER() OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS rn
            FROM events
        ),
        frames AS (
            SELECT user_id,
                   CAST((rn - 1) // {CREST_FRAME} AS BIGINT) AS frame,
                   (CAST(MAX(c) AS DOUBLE) / 100.0)
                   / SQRT(CAST(SUM(c * c) AS DOUBLE)
                          / (COUNT(*) * 10000.0)) AS crest
            FROM x GROUP BY user_id, (rn - 1) // {CREST_FRAME}
        ),
        ch AS (
            SELECT user_id,
                   CAST(COUNT(*) AS BIGINT)   AS n_frames,
                   list(crest ORDER BY frame) AS cs,
                   MAX(crest)                 AS max_crest,
                   MIN(crest)                 AS min_crest
            FROM frames GROUP BY user_id
        )
        SELECT user_id, n_frames,
               ROUND(list_sum(cs) / n_frames, 6) AS mean_crest,
               ROUND(max_crest, 6)               AS max_crest,
               ROUND(min_crest, 6)               AS min_crest
        FROM ch
    """,
    tags=("audio", "audio-math", "events"),
)
def audio_crest_factor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CREST FACTOR per frame (peak ÷ RMS — the impulsiveness measure
    that separates percussive from steady material; dB siblings:
    ``audio_rms_db_frames`` r06, flatness: ``audio_energy_flatness``),
    rolled up per channel. Same row_number÷N framing as the whole
    framed-audio family; per-frame peak and energy are EXACT integer
    cents (one division + one sqrt per frame), and the cross-frame
    mean runs as a SEQUENTIAL frame-ordered in-row fold — the
    deterministic-summation idiom the r07 bit-exact sweep forced onto
    ``audio_energy_flatness`` (engine-side AVG over frames is
    ULP-unstable under ROUND). max/min are order-free. Strictly
    positive signal keeps RMS nonzero and the division total."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    c = F.round(F.col("value") * 100).cast("bigint")
    x = e.select(
        "user_id",
        c.alias("c"),
        ((F.row_number().over(w) - 1) / CREST_FRAME).cast("bigint").alias(
            "frame"
        ),
    )
    frames = x.groupBy("user_id", "frame").agg(
        (
            (F.max("c").cast("double") / 100.0)
            / F.sqrt(
                F.sum(F.col("c") * F.col("c")).cast("double")
                / (F.count(F.lit(1)) * 10000.0)
            )
        ).alias("crest")
    )
    ch = frames.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_frames"),
        F.transform(
            F.array_sort(F.collect_list(F.struct("frame", "crest"))),
            lambda s: s.getField("crest"),
        ).alias("cs"),
        F.max("crest").alias("max_crest"),
        F.min("crest").alias("min_crest"),
    )
    mean_crest = (
        F.aggregate(F.col("cs"), F.lit(0.0), lambda acc, p: acc + p)
        / F.col("n_frames")
    )
    return ch.select(
        "user_id",
        "n_frames",
        F.round(mean_crest, 6).alias("mean_crest"),
        F.round("max_crest", 6).alias("max_crest"),
        F.round("min_crest", 6).alias("min_crest"),
    )


# ---------------------------------------------------------------------------
# skew: salt-factor planning table from the key-frequency census
# ---------------------------------------------------------------------------

SALT_TARGET_PARTS = 32  # executor-slot count the salt plan levels for


@query(
    "skew_salt_factor_plan",
    oracle=f"""
        WITH f AS (
            SELECT event_type, CAST(COUNT(*) AS BIGINT) AS freq
            FROM events GROUP BY event_type
        ),
        g AS (SELECT CAST(SUM(freq) AS BIGINT) AS total FROM f),
        plan AS (
            SELECT event_type, freq,
                   CAST(CEIL(CAST(g.total AS DOUBLE) / {SALT_TARGET_PARTS})
                        AS BIGINT) AS target_rows,
                   GREATEST(1, CAST(CEIL(CAST(freq AS DOUBLE) /
                       CEIL(CAST(g.total AS DOUBLE) / {SALT_TARGET_PARTS}))
                       AS BIGINT)) AS salt_k
            FROM f, g
        )
        SELECT event_type, freq, target_rows, salt_k,
               CAST(CEIL(CAST(freq AS DOUBLE) / salt_k) AS BIGINT)
                   AS max_salted_load,
               salt_k > 1 AS needs_salting
        FROM plan
    """,
    tags=("scale", "skew", "events"),
)
def skew_salt_factor_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SALT-FACTOR PLANNING table: from the key-frequency census,
    derive per key the salt fan-out k = ⌈freq ÷ target⌉ that levels
    its rows across 32 partitions, and the resulting worst partition
    load — the numbers you compute BEFORE keying a 100 TB shuffle
    (the executed two-path form: ``skew_hot_key_two_path_join`` r06;
    the frequency census alone: ``skew_key_frequency_profile``
    stock). One aggregate + a 1-row broadcast; every output is exact
    integer arithmetic (CEIL of an exact ratio), output = |keys|
    rows."""
    e = load_table(spark, sf_dir, "events")
    f = e.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("freq")
    )
    g = f.agg(F.sum("freq").cast("bigint").alias("total"))
    target = F.ceil(F.col("total").cast("double") / SALT_TARGET_PARTS).cast(
        "bigint"
    )
    plan = f.crossJoin(F.broadcast(g)).select(
        "event_type",
        "freq",
        target.alias("target_rows"),
        F.greatest(
            F.lit(1).cast("bigint"),
            F.ceil(F.col("freq").cast("double") / target).cast("bigint"),
        ).alias("salt_k"),
    )
    return plan.select(
        "event_type",
        "freq",
        "target_rows",
        "salt_k",
        F.ceil(F.col("freq").cast("double") / F.col("salt_k"))
        .cast("bigint")
        .alias("max_salted_load"),
        (F.col("salt_k") > 1).alias("needs_salting"),
    )


# ---------------------------------------------------------------------------
# session: gap-sessionized duration deciles via exact order statistics
# ---------------------------------------------------------------------------

SESSION_GAP_S = 1800  # 30 min, the house sessionization gap


@query(
    "events_session_duration_deciles",
    oracle=f"""
        WITH x AS (
            SELECT user_id, event_id, epoch_us(ts) AS t,
                   CASE WHEN epoch_us(ts)
                             - LAG(epoch_us(ts)) OVER (PARTITION BY user_id
                                                       ORDER BY ts, event_id)
                             > {SESSION_GAP_S * 1000000}
                        OR LAG(epoch_us(ts)) OVER (PARTITION BY user_id
                                                   ORDER BY ts, event_id)
                           IS NULL
                        THEN 1 ELSE 0 END AS new_s
            FROM events
        ),
        s AS (
            SELECT user_id, t,
                   SUM(new_s) OVER (PARTITION BY user_id
                                    ORDER BY t, event_id
                                    ROWS UNBOUNDED PRECEDING)
                       AS session_no
            FROM x
        ),
        durs AS (
            SELECT user_id, session_no,
                   (MAX(t) - MIN(t)) // 1000000 AS dur_s
            FROM s GROUP BY user_id, session_no
        ),
        ranked AS (
            SELECT dur_s,
                   ROW_NUMBER() OVER (ORDER BY dur_s) AS rk,
                   COUNT(*) OVER () AS n
            FROM durs
        )
        SELECT CAST(d.dec AS BIGINT) AS decile,
               CAST(MAX(CASE WHEN rk = CAST(CEIL(n * d.dec / 10.0) AS BIGINT)
                             THEN dur_s END) AS BIGINT) AS dur_s
        FROM ranked, (SELECT UNNEST(range(1, 10)) AS dec) d
        GROUP BY d.dec
    """,
    tags=("events", "session", "window", "robust"),
)
def events_session_duration_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SESSION-DURATION DECILES under the house 30-min-gap
    sessionization (``events_session_gap_stats``, certified r06
    retry): gap flag → running-sum session ids → per-session duration
    in whole seconds → the d1..d9 decile table read by EXACT order
    statistic (value at rank ⌈n·q⌉ — type-1 quantile, integer in,
    integer out, no interpolation, bit-stable by construction). The
    oracle states the textbook global ROW_NUMBER; the engine reads
    each rank off the DURATION-VALUE LEDGER instead (r11 — the former
    rank window moved every session row into one task): durations are
    whole seconds, so grouping by value gives a ledger bounded by the
    CLOCK (max session length in seconds), not by data; one
    ledger-sized cumulative window locates the unique value whose
    [cum_before, cum_before+cnt) span contains each rank. Value at
    rank is tie-invariant, so the ledger read equals the oracle's
    ROW_NUMBER pick exactly. Output = 9 rows."""
    e = load_table(spark, sf_dir, "events")
    wo = Window.partitionBy("user_id").orderBy("ts", "event_id")
    x = e.select(
        "user_id",
        "event_id",
        F.unix_micros("ts").alias("t"),
        F.when(
            F.lag(F.unix_micros("ts")).over(wo).isNull()
            | (
                F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(wo)
                > SESSION_GAP_S * 1_000_000
            ),
            1,
        )
        .otherwise(0)
        .alias("new_s"),
    )
    ws = (
        Window.partitionBy("user_id")
        .orderBy("t", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    s = x.select("user_id", "t", F.sum("new_s").over(ws).alias("session_no"))
    durs = s.groupBy("user_id", "session_no").agg(
        ((F.max("t") - F.min("t")) / 1_000_000).cast("bigint").alias("dur_s")
    )
    led = durs.groupBy("dur_s").agg(F.count(F.lit(1)).alias("cnt"))
    wcum = Window.orderBy("dur_s").rowsBetween(Window.unboundedPreceding, -1)
    led = led.withColumn(
        "cum_before", F.coalesce(F.sum("cnt").over(wcum), F.lit(0))
    )
    tot = led.agg(F.sum("cnt").alias("n"))
    ranks = (
        spark.range(1, 10)
        .select(F.col("id").alias("dec"))
        .crossJoin(F.broadcast(tot))
        .select(
            "dec",
            F.ceil(F.col("n") * F.col("dec") / 10.0).cast("bigint").alias("rk"),
        )
    )
    return (
        ranks.join(
            F.broadcast(led),
            (F.col("rk") > F.col("cum_before"))
            & (F.col("rk") <= F.col("cum_before") + F.col("cnt")),
        )
        .groupBy(F.col("dec").cast("bigint").alias("decile"))
        .agg(F.max("dur_s").cast("bigint").alias("dur_s"))
    )


# ---------------------------------------------------------------------------
# udtf: leading word-bigram emitter
# ---------------------------------------------------------------------------

BIGRAM_PREFIX = 6     # bigrams emitted per document
BIGRAM_DOC_CAP = 150  # documents scanned (bounded-output exemplar)


@query(
    "udtf_word_bigrams",
    oracle=f"""
        WITH w AS (
            SELECT doc_id,
                   CAST(generate_subscripts(l, 1) AS BIGINT) AS pos,
                   UNNEST(l) AS tok
            FROM (SELECT doc_id,
                         list_filter(string_split(text, ' '),
                                     t -> t <> '') AS l
                  FROM documents WHERE doc_id < {BIGRAM_DOC_CAP})
        )
        SELECT doc_id, CAST(pos AS BIGINT) AS pos,
               tok || ' ' || nxt AS bigram
        FROM (SELECT doc_id, pos, tok,
                     LEAD(tok) OVER (PARTITION BY doc_id ORDER BY pos) AS nxt
              FROM w)
        WHERE pos <= {BIGRAM_PREFIX} AND nxt IS NOT NULL
    """,
    tags=("udtf", "text", "documents"),
)
def udtf_word_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WORD-BIGRAM UDTF: a Python table function walks each document
    once and yields its leading 6 bigrams with positions — the
    shingling kernel as per-row iteration, where the oracle needs an
    explode + two windows (ROW_NUMBER for position, LEAD for the
    successor) to state the same thing — two independent professional
    formulations (the full n-gram families live in
    ``dedup_ngram_jaccard`` / ``text_pmi_collocations``; UDTF
    siblings: ``udtf_run_length_tokens`` r06, ``udtf_char_topfreq``
    stock). Positions come from ``generate_subscripts`` over the
    token list — guaranteed list order, not scan order (a bare
    PARTITION BY window would depend on DuckDB's parallel delivery
    order). Arrow-batched, text never shuffles, ≤ 6 rows per
    document."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="pos long, bigram string")
    class WordBigrams:
        def eval(self, text: str):
            if not text:
                return
            toks = [t for t in text.split(" ") if t]
            for i in range(min(BIGRAM_PREFIX, len(toks) - 1)):
                yield i + 1, toks[i] + " " + toks[i + 1]

    spark.udtf.register("word_bigrams", WordBigrams)
    load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") < BIGRAM_DOC_CAP
    ).createOrReplaceTempView("udtf_bigram_docs_in")
    return spark.sql(
        """
        SELECT d.doc_id, b.pos, b.bigram
        FROM udtf_bigram_docs_in d, LATERAL word_bigrams(d.text) b
        """
    )


# ---------------------------------------------------------------------------
# csv: TSV dialect (tab separator, custom null token) roundtrip
# ---------------------------------------------------------------------------


@query(
    "sink_csv_tsv_dialect_roundtrip",
    oracle="""
        SELECT source,
               CAST(COUNT(*) AS BIGINT)                       AS n,
               CAST(SUM(CASE WHEN lang <> 'en' THEN 1 ELSE 0 END) AS BIGINT)
                                                              AS n_nonen_null,
               CAST(SUM(n_chars) AS BIGINT)                   AS total_chars,
               CAST(MIN(doc_id) AS BIGINT)                    AS min_doc_id
        FROM documents
        GROUP BY source
    """,
    tags=("sink", "csv", "documents"),
)
def sink_csv_tsv_dialect_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TSV DIALECT roundtrip: tab separator + a custom NULL token
    (``\\N``, the classic MySQL-dump convention) written and read
    back with the SAME dialect options — non-English lang values are
    nulled on write, survive the wire as ``\\N``, and come back as
    SQL NULLs the aggregate can count (dialect family:
    ``sink_csv_options_roundtrip`` r03, gzip r06-stock, quote-all
    stock, hive-partitioned r06). The oracle restates the aggregates
    from the parquet truth — the roundtrip is the thing under test.
    Text is space-tokenized (never contains tabs), making TSV the
    natural quoting-free dialect here."""
    path = os.path.join(_SCRATCH, "sink_csv_tsv_dialect_roundtrip")
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        F.when(F.col("lang") == "en", F.col("lang")).alias("lang_en_only"),
        "n_chars",
    )
    (
        d.write.mode("overwrite")
        .option("header", True)
        .option("sep", "\t")
        .option("nullValue", "\\N")
        .csv(path)
    )
    back = spark.read.csv(
        path,
        header=True,
        sep="\t",
        nullValue="\\N",
        schema="doc_id long, source string, lang_en_only string, n_chars long",
    )
    return back.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.when(F.col("lang_en_only").isNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("n_nonen_null"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
        F.min("doc_id").cast("bigint").alias("min_doc_id"),
    )


# ---------------------------------------------------------------------------
# rolling: windowed skewness / kurtosis from exact power sums
# ---------------------------------------------------------------------------

RSK_WINDOW = 24  # rows preceding (25-row frame with the current row)
RSK_MIN_N = 5    # emit NULL moments below this frame population


@query(
    "window_rolling_skew_kurt",
    oracle=f"""
        WITH x AS (
            SELECT event_id, user_id, ts,
                   CAST(ROUND(value * 100) AS BIGINT) AS c
            FROM events
        ),
        s AS (
            SELECT event_id, user_id,
                   CAST(COUNT(*) OVER w AS DOUBLE)          AS n,
                   CAST(SUM(c) OVER w AS DOUBLE)            AS s1,
                   CAST(SUM(c * c) OVER w AS DOUBLE)        AS s2,
                   CAST(SUM(CAST(c * c AS DECIMAL(38, 0)) * c)
                        OVER w AS DOUBLE)                   AS s3,
                   CAST(SUM(CAST(c * c AS DECIMAL(38, 0))
                            * CAST(c * c AS DECIMAL(38, 0))) OVER w AS DOUBLE)
                                                            AS s4
            FROM x
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN {RSK_WINDOW} PRECEDING AND CURRENT ROW)
        ),
        m AS (
            SELECT event_id, user_id, n,
                   s2 / n - (s1 / n) * (s1 / n) AS m2,
                   s3 / n - 3.0 * (s1 / n) * (s2 / n)
                          + 2.0 * (s1 / n) * (s1 / n) * (s1 / n) AS m3,
                   s4 / n - 4.0 * (s1 / n) * (s3 / n)
                          + 6.0 * (s1 / n) * (s1 / n) * (s2 / n)
                          - 3.0 * (s1 / n) * (s1 / n) * (s1 / n) * (s1 / n)
                              AS m4
            FROM s
        )
        SELECT event_id, user_id, CAST(n AS BIGINT) AS n,
               CASE WHEN n >= {RSK_MIN_N} AND m2 > 0
                    THEN ROUND(m3 / (SQRT(m2) * SQRT(m2) * SQRT(m2)), 6)
               END AS roll_skew,
               CASE WHEN n >= {RSK_MIN_N} AND m2 > 0
                    THEN ROUND(m4 / (m2 * m2) - 3.0, 6)
               END AS roll_kurt
        FROM m
    """,
    tags=("window", "rolling", "events"),
)
def window_rolling_skew_kurt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLING SKEWNESS and EXCESS KURTOSIS over a 25-row frame — the
    shape moments that flag regime changes a rolling mean/stddev
    can't see. The house bit-stability idiom end-to-end: the four
    power sums S₁..S₄ accumulate EXACT integer cents inside the
    window frame (S₄ in DECIMAL(38) — cents⁴ × 25 rows overflows
    int64), every engine-visible float is derived from those exact
    integers through ONE shared expression template (the m₂/m₃/m₄
    central-moment expansions, written in identical operation order
    in both dialects), and frames too small for a third moment emit
    honest NULLs. One shuffle keyed by channel; the frame is
    row-bounded so state is O(window) — the same plan shape as every
    certified rolling carrier (trimmed mean r07-retry, weighted mean
    stock)."""
    e = load_table(spark, sf_dir, "events")
    c = F.round(F.col("value") * 100).cast("bigint")
    x = e.select("event_id", "user_id", "ts", c.alias("c"))
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-RSK_WINDOW, Window.currentRow)
    )
    cc = F.col("c") * F.col("c")
    s = x.select(
        "event_id",
        "user_id",
        F.count(F.lit(1)).over(w).cast("double").alias("n"),
        F.sum("c").over(w).cast("double").alias("s1"),
        F.sum(cc).over(w).cast("double").alias("s2"),
        # cc*c in DECIMAL(38,0) like s4: Spark bigint SUM wraps silently
        # (non-ANSI) past int64 while DuckDB promotes to HUGEINT — the
        # decimal accumulator keeps both engines exact at any magnitude
        # (r07 advice)
        F.sum(cc.cast("decimal(38,0)") * F.col("c"))
        .over(w)
        .cast("double")
        .alias("s3"),
        F.sum(cc.cast("decimal(38,0)") * cc.cast("decimal(38,0)"))
        .over(w)
        .cast("double")
        .alias("s4"),
    )
    n, s1, s2, s3, s4 = (F.col(k) for k in ("n", "s1", "s2", "s3", "s4"))
    mu = s1 / n
    m2 = s2 / n - mu * mu
    m3 = s3 / n - 3.0 * mu * (s2 / n) + 2.0 * mu * mu * mu
    m4 = (
        s4 / n
        - 4.0 * mu * (s3 / n)
        + 6.0 * mu * mu * (s2 / n)
        - 3.0 * mu * mu * mu * mu
    )
    ok = (n >= RSK_MIN_N) & (m2 > 0)
    return s.select(
        "event_id",
        "user_id",
        n.cast("bigint").alias("n"),
        F.when(ok, F.round(m3 / (F.sqrt(m2) * F.sqrt(m2) * F.sqrt(m2)), 6))
        .alias("roll_skew"),
        F.when(ok, F.round(m4 / (m2 * m2) - 3.0, 6)).alias("roll_kurt"),
    )


# ---------------------------------------------------------------------------
# decomposition: day-of-week additive profile with exact remainders
# ---------------------------------------------------------------------------


@query(
    "analytics_dow_additive_profile",
    oracle="""
        WITH daily AS (
            SELECT CAST(o_orderdate AS DATE) AS d,
                   dayofweek(CAST(o_orderdate AS DATE)) + 1 AS dow,
                   CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                        AS BIGINT) AS cents
            FROM orders GROUP BY 1, 2
        ),
        g AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
                     CAST(SUM(cents) AS BIGINT) AS total FROM daily),
        agg AS (
            SELECT dow, CAST(COUNT(*) AS BIGINT) AS nd,
                   CAST(SUM(cents) AS BIGINT) AS dow_cents
            FROM daily GROUP BY dow
        ),
        dev AS (
            SELECT d.dow,
                   CAST(SUM(ABS(d.cents * a.nd - a.dow_cents)) AS BIGINT)
                       AS sum_abs_dev_nd
            FROM daily d JOIN agg a ON d.dow = a.dow
            GROUP BY d.dow
        )
        SELECT CAST(a.dow AS BIGINT) AS dow,
               a.nd AS n_days,
               ROUND(CAST(a.dow_cents AS DOUBLE) / a.nd / 100.0, 4)
                   AS dow_mean,
               ROUND(CAST(a.dow_cents AS DOUBLE) / a.nd / 100.0
                     - CAST(g.total AS DOUBLE) / g.n_days / 100.0, 4)
                   AS dow_effect,
               ROUND(CAST(dev.sum_abs_dev_nd AS DOUBLE)
                     / a.nd / a.nd / 100.0, 4)
                   AS remainder_mad
        FROM agg a JOIN dev ON a.dow = dev.dow, g
    """,
    tags=("analytics", "decomposition", "timeseries", "orders"),
)
def analytics_dow_additive_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ADDITIVE day-of-week decomposition profile: per weekday, the
    mean daily revenue, its EFFECT (deviation from the grand daily
    mean — the seasonal component of level + season + remainder), and
    the remainder's mean absolute deviation — with the MAD numerator
    kept in EXACT integers by scaling before subtracting
    (|cents·n_d − Σcents| is integer math; dividing by n_d² once at
    the end is the only float op), the same trick the house uses
    everywhere a difference-of-floats would wobble (sibling
    decompositions: ``analytics_seasonal_strength`` r06,
    ``analytics_multiplicative_decomp`` stock, remainder ACF in the
    r07 window). Two aggregates over the daily frame (which is
    O(days) — tiny at any SF) after one group-by over orders."""
    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.to_date("o_orderdate").alias("d"),
        F.dayofweek(F.to_date("o_orderdate")).alias("dow"),
    ).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
        .cast("bigint")
        .alias("cents")
    )
    g = daily.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        F.sum("cents").cast("bigint").alias("total"),
    )
    agg = daily.groupBy("dow").agg(
        F.count(F.lit(1)).cast("bigint").alias("nd"),
        F.sum("cents").cast("bigint").alias("dow_cents"),
    )
    dev = (
        daily.join(agg, "dow")
        .groupBy("dow")
        .agg(
            F.sum(
                F.abs(F.col("cents") * F.col("nd") - F.col("dow_cents"))
            )
            .cast("bigint")
            .alias("sum_abs_dev_nd")
        )
    )
    return (
        agg.join(dev, "dow")
        .crossJoin(F.broadcast(g))
        .select(
            F.col("dow").cast("bigint").alias("dow"),
            F.col("nd").alias("n_days"),
            F.round(
                F.col("dow_cents").cast("double") / F.col("nd") / 100.0, 4
            ).alias("dow_mean"),
            F.round(
                F.col("dow_cents").cast("double") / F.col("nd") / 100.0
                - F.col("total").cast("double") / F.col("n_days") / 100.0,
                4,
            ).alias("dow_effect"),
            F.round(
                F.col("sum_abs_dev_nd").cast("double")
                / F.col("nd")
                / F.col("nd")
                / 100.0,
                4,
            ).alias("remainder_mad"),
        )
    )


# ---------------------------------------------------------------------------
# causal: stratified (blocked) treatment-effect table
# ---------------------------------------------------------------------------


@query(
    "stats_stratified_ate",
    oracle="""
        WITH base AS (
            SELECT c.c_mktsegment AS stratum,
                   CAST(c.c_custkey % 2 AS BIGINT) AS treated,
                   CAST(ROUND(t.o_totalprice * 100) AS BIGINT) AS cents
            FROM orders t JOIN customer c ON t.o_custkey = c.c_custkey
        ),
        s AS (
            SELECT stratum,
                   CAST(SUM(treated) AS BIGINT)                    AS n1,
                   CAST(SUM(1 - treated) AS BIGINT)                AS n0,
                   CAST(SUM(treated * cents) AS BIGINT)            AS s1,
                   CAST(SUM((1 - treated) * cents) AS BIGINT)      AS s0,
                   SUM(treated * CAST(cents AS DECIMAL(38, 0))
                       * CAST(cents AS DECIMAL(38, 0)))            AS ss1,
                   SUM((1 - treated) * CAST(cents AS DECIMAL(38, 0))
                       * CAST(cents AS DECIMAL(38, 0)))            AS ss0
            FROM base GROUP BY stratum
        )
        SELECT stratum, n1, n0,
               ROUND((CAST(s1 AS DOUBLE) / n1
                      - CAST(s0 AS DOUBLE) / n0) / 100.0, 4) AS diff_dollars,
               ROUND(SQRT(
                   (CAST(ss1 AS DOUBLE) / n1
                    - (CAST(s1 AS DOUBLE) / n1) * (CAST(s1 AS DOUBLE) / n1))
                       / (n1 - 1)
                   + (CAST(ss0 AS DOUBLE) / n0
                      - (CAST(s0 AS DOUBLE) / n0) * (CAST(s0 AS DOUBLE) / n0))
                       / (n0 - 1)) / 100.0, 4)               AS se_dollars
        FROM s
    """,
    tags=("stats", "causal", "inference", "orders"),
)
def stats_stratified_ate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STRATIFIED (blocked) treatment-effect table: within each
    customer segment, the treated-minus-control mean outcome and its
    Neyman standard error — the blocked-experiment estimator that
    removes between-stratum variance from the comparison (IPW
    weighting: ``stats_ipw_ate``, certified r06; diff-in-diff /
    regression-discontinuity: ``stats_did_estimator`` /
    ``stats_rdd_local_means`` in the r07 window and stock). The
    treatment flag is the deterministic custkey parity; all six
    sufficient statistics per stratum are EXACT integers (squared
    cents in DECIMAL(38) — cents² × group size overflows int64 past
    sf0.1), and the effect and SE are fixed-order float expressions
    over them — the ``stats_ipw_ate`` bit-stability idiom. One
    broadcast join + one aggregate; output = |strata| rows."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    base = o.join(F.broadcast(c), o.o_custkey == c.c_custkey).select(
        F.col("c_mktsegment").alias("stratum"),
        (F.col("c_custkey") % 2).cast("bigint").alias("treated"),
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
    )
    t = F.col("treated")
    cents = F.col("cents")
    cd = cents.cast("decimal(38,0)")
    s = base.groupBy("stratum").agg(
        F.sum(t).cast("bigint").alias("n1"),
        F.sum(1 - t).cast("bigint").alias("n0"),
        F.sum(t * cents).cast("bigint").alias("s1"),
        F.sum((1 - t) * cents).cast("bigint").alias("s0"),
        F.sum(t * cd * cd).alias("ss1"),
        F.sum((1 - t) * cd * cd).alias("ss0"),
    )
    n1, n0 = F.col("n1"), F.col("n0")
    m1 = F.col("s1").cast("double") / n1
    m0 = F.col("s0").cast("double") / n0
    v1 = (F.col("ss1").cast("double") / n1 - m1 * m1) / (n1 - 1)
    v0 = (F.col("ss0").cast("double") / n0 - m0 * m0) / (n0 - 1)
    return s.select(
        "stratum",
        "n1",
        "n0",
        F.round((m1 - m0) / 100.0, 4).alias("diff_dollars"),
        F.round(F.sqrt(v1 + v0) / 100.0, 4).alias("se_dollars"),
    )
