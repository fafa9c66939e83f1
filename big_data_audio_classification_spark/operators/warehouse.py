"""Warehouse-maintenance operators: SCD Type-2 dimension apply,
time-series gap-fill over a dimension spine, and two-pass winsorized
statistics — the table-maintenance shapes every analytics deployment
runs nightly around its fact tables.

Scale notes:
* SCD2 apply is ONE equi-join on the business key followed by a
  row-explode of at most 2 versions per matched key — the dimension is
  scanned once, never twice; the change batch (typically ≪ dim) is the
  probe side. No MERGE engine support needed: the versioned output is a
  pure function of (dim, changes), expressible as join + explode.
* Gap-fill builds its spine from dimensions × a generated calendar
  (bounded cardinality, independent of fact size), aggregates the fact
  table once (map-side combined), and BROADCASTS the bounded aggregate
  onto the spine — the fact table never joins the spine directly.
* Winsorize is the two-pass global-bound pattern (same shape as
  power_to_db's global max in operators/audio.py): pass 1 reduces to a
  single percentile row, which is broadcast into the pass-2 clamp —
  no per-group buffering of raw values beyond the percentile agg
  itself (the approx sketch is the 100 TB swap-in, same plan).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from big_data_audio_classification_spark.registry import query
from big_data_audio_classification_spark.sources.catalog import load_table

SCD2_MOD = 10  # c_custkey % 10 == 3 -> tonight's segment change
SCD2_EFF = "2000-01-01"
SCD2_OPEN = "1995-01-01"


@query(
    "scd2_customer_segment",
    oracle=f"""
        WITH dim AS (
            SELECT c_custkey, c_mktsegment AS segment,
                   DATE '{SCD2_OPEN}' AS valid_from,
                   CAST(NULL AS DATE) AS valid_to
            FROM customer
        ),
        changes AS (
            SELECT c_custkey, 'UPGRADED' AS new_segment,
                   DATE '{SCD2_EFF}' AS eff
            FROM customer WHERE c_custkey % {SCD2_MOD} = 3
        ),
        merged AS (
            SELECT d.c_custkey, d.segment, d.valid_from,
                   ch.eff AS valid_to, FALSE AS is_current
            FROM dim d JOIN changes ch USING (c_custkey)
            UNION ALL
            SELECT c_custkey, new_segment AS segment, eff AS valid_from,
                   CAST(NULL AS DATE) AS valid_to, TRUE AS is_current
            FROM changes
            UNION ALL
            SELECT d.c_custkey, d.segment, d.valid_from, d.valid_to,
                   TRUE AS is_current
            FROM dim d ANTI JOIN changes ch USING (c_custkey)
        )
        SELECT c_custkey, segment,
               STRFTIME(valid_from, '%Y-%m-%d') AS valid_from,
               STRFTIME(valid_to, '%Y-%m-%d')   AS valid_to,
               is_current
        FROM merged
    """,
    tags=("warehouse", "scd2", "customer"),
)
def scd2_customer_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type-2 apply: merge a change batch (derived here as every
    custkey ≡ 3 mod 10 moving to segment 'UPGRADED' effective
    2000-01-01) into the customer dimension, emitting full version
    history — matched keys close their old row (valid_to = eff) and
    open a new current row; unmatched keys pass through.

    One left join on the business key, then an explode of a 1-or-2
    element version array — the dim is scanned once and at most one
    shuffle happens (the join); there is no second pass and no
    driver-side diffing."""
    c = load_table(spark, sf_dir, "customer")
    dim = c.select(
        "c_custkey",
        F.col("c_mktsegment").alias("segment"),
        F.lit(SCD2_OPEN).cast("date").alias("valid_from"),
        F.lit(None).cast("date").alias("valid_to"),
    )
    changes = c.filter(F.col("c_custkey") % SCD2_MOD == 3).select(
        "c_custkey",
        F.lit("UPGRADED").alias("new_segment"),
        F.lit(SCD2_EFF).cast("date").alias("eff"),
    )
    joined = dim.join(changes, "c_custkey", "left")
    versions = F.when(
        F.col("new_segment").isNull(),
        # unchanged: pass the row through, still current
        F.array(
            F.struct(
                F.col("segment"),
                F.col("valid_from"),
                F.col("valid_to"),
                F.lit(True).alias("is_current"),
            )
        ),
    ).otherwise(
        # changed: close the old version, open the new one
        F.array(
            F.struct(
                F.col("segment"),
                F.col("valid_from"),
                F.col("eff").alias("valid_to"),
                F.lit(False).alias("is_current"),
            ),
            F.struct(
                F.col("new_segment").alias("segment"),
                F.col("eff").alias("valid_from"),
                F.lit(None).cast("date").alias("valid_to"),
                F.lit(True).alias("is_current"),
            ),
        )
    )
    return (
        joined.select("c_custkey", F.explode(versions).alias("v"))
        .select(
            "c_custkey",
            "v.segment",
            # dates formatted to strings: the driver's value hash is
            # typed, and Spark DATE surfaces as datetime.date objects
            # while DuckDB DATE surfaces as datetime64 (null -> NaT).
            F.date_format("v.valid_from", "yyyy-MM-dd").alias("valid_from"),
            F.date_format("v.valid_to", "yyyy-MM-dd").alias("valid_to"),
            "v.is_current",
        )
    )


@query(
    "gapfill_monthly_revenue",
    oracle="""
        WITH months AS (
            SELECT CAST(m AS DATE) AS month
            FROM unnest(generate_series(DATE '1995-01-01', DATE '2001-08-01',
                                        INTERVAL 1 MONTH)) AS t(m)
        ),
        spine AS (SELECT n_name, month FROM nation CROSS JOIN months),
        rev AS (
            SELECT n_name, CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
                   SUM(o_totalprice) AS rev
            FROM orders
            JOIN customer ON c_custkey = o_custkey
            JOIN nation ON n_nationkey = c_nationkey
            GROUP BY 1, 2
        )
        SELECT s.n_name, STRFTIME(s.month, '%Y-%m-%d') AS month,
               ROUND(COALESCE(r.rev, 0.0), 2) AS revenue,
               ROUND(SUM(COALESCE(r.rev, 0.0)) OVER (
                   PARTITION BY s.n_name ORDER BY s.month), 2) AS cum_revenue
        FROM spine s LEFT JOIN rev r USING (n_name, month)
        ORDER BY n_name, month
    """,
    tags=("warehouse", "gapfill", "timeseries", "orders"),
)
def gapfill_monthly_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap-fill: a dense nation × month spine (every month
    1995-01..2001-08 for every nation, even months with no orders),
    zero-filled monthly revenue, and the carry-forward running total.

    The spine is dims × generated calendar — bounded cardinality that
    never depends on fact size. The fact table is aggregated ONCE
    (map-side combine into ≤ |spine| rows) and that bounded result is
    broadcast onto the spine; the window runs over spine-sized data."""
    nation = load_table(spark, sf_dir, "nation")
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    from pyspark.sql import Window

    months = spark.range(1).select(
        F.explode(
            F.sequence(
                F.lit("1995-01-01").cast("date"),
                F.lit("2001-08-01").cast("date"),
                F.expr("interval 1 month"),
            )
        ).alias("month")
    )
    spine = nation.select("n_name").crossJoin(F.broadcast(months))
    rev = (
        orders.join(cust, orders["o_custkey"] == cust["c_custkey"])
        .join(
            F.broadcast(nation.select("n_nationkey", F.col("n_name").alias("rn_name"))),
            cust["c_nationkey"] == F.col("n_nationkey"),
        )
        .groupBy(
            F.col("rn_name").alias("n_name"),
            F.trunc("o_orderdate", "month").alias("month"),
        )
        .agg(F.sum("o_totalprice").alias("rev"))
    )
    w = Window.partitionBy("n_name").orderBy("month")
    return (
        spine.join(F.broadcast(rev), ["n_name", "month"], "left")
        .select(
            "n_name",
            F.date_format("month", "yyyy-MM-dd").alias("month"),
            F.round(F.coalesce("rev", F.lit(0.0)), 2).alias("revenue"),
            F.round(
                F.sum(F.coalesce("rev", F.lit(0.0))).over(w), 2
            ).alias("cum_revenue"),
        )
        .orderBy("n_name", "month")
    )


@query(
    "winsorize_order_prices",
    oracle="""
        WITH bounds AS (
            SELECT quantile_cont(o_totalprice, 0.01) AS lo,
                   quantile_cont(o_totalprice, 0.99) AS hi
            FROM orders
        )
        SELECT o_orderpriority,
               COUNT(*) AS n,
               ROUND(AVG(o_totalprice), 2) AS avg_raw,
               ROUND(AVG(LEAST(GREATEST(o_totalprice, lo), hi)), 2) AS avg_wins,
               CAST(SUM(CASE WHEN o_totalprice < lo THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_clamped_lo,
               CAST(SUM(CASE WHEN o_totalprice > hi THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_clamped_hi
        FROM orders, bounds
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
    """,
    tags=("warehouse", "winsorize", "quality", "orders"),
)
def winsorize_order_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized (p01/p99-clamped) price statistics per order
    priority — the outlier-robust aggregate every metrics pipeline
    wants before averaging heavy-tailed values.

    Two-pass global-bound pattern: pass 1 reduces the table to ONE row
    of exact percentiles (swap in percentile_approx at 100 TB — same
    plan, sketch state), which is cross-join-broadcast into the pass-2
    clamp + group-by; raw values are never buffered per group."""
    o = load_table(spark, sf_dir, "orders")
    bounds = o.agg(
        F.expr("percentile(o_totalprice, 0.01)").alias("lo"),
        F.expr("percentile(o_totalprice, 0.99)").alias("hi"),
    )
    clamped = F.least(F.greatest(F.col("o_totalprice"), F.col("lo")), F.col("hi"))
    return (
        o.crossJoin(F.broadcast(bounds))
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("o_totalprice"), 2).alias("avg_raw"),
            F.round(F.avg(clamped), 2).alias("avg_wins"),
            F.sum((F.col("o_totalprice") < F.col("lo")).cast("long")).alias(
                "n_clamped_lo"
            ),
            F.sum((F.col("o_totalprice") > F.col("hi")).cast("long")).alias(
                "n_clamped_hi"
            ),
        )
        .orderBy("o_orderpriority")
    )


INTERP_BUCKET_SEC = 3600  # hourly buckets
_MICRO = 1_000_000        # fixed-point micro-units


@query(
    "gapfill_linear_interpolation",
    oracle=f"""
        WITH obs AS (
            SELECT user_id,
                   epoch_us(ts) // (CAST({INTERP_BUCKET_SEC} AS BIGINT) * 1000000)
                       AS hour_idx,
                   CAST(FLOOR(MAX(value) * {_MICRO}) AS BIGINT) AS vm
            FROM events GROUP BY 1, 2
        ),
        spine AS (
            SELECT user_id, UNNEST(generate_series(MIN(hour_idx),
                                                   MAX(hour_idx))) AS hour_idx
            FROM obs GROUP BY user_id
        ),
        j AS (
            SELECT s.user_id, s.hour_idx, o.vm
            FROM spine s LEFT JOIN obs o
              ON s.user_id = o.user_id AND s.hour_idx = o.hour_idx
        ),
        f AS (
            SELECT user_id, hour_idx, vm,
                   last_value(vm IGNORE NULLS) OVER
                       (PARTITION BY user_id ORDER BY hour_idx
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS pv,
                   last_value(CASE WHEN vm IS NOT NULL THEN hour_idx END
                              IGNORE NULLS) OVER
                       (PARTITION BY user_id ORDER BY hour_idx
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS pt,
                   first_value(vm IGNORE NULLS) OVER
                       (PARTITION BY user_id ORDER BY hour_idx
                        ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
                       AS nv,
                   first_value(CASE WHEN vm IS NOT NULL THEN hour_idx END
                               IGNORE NULLS) OVER
                       (PARTITION BY user_id ORDER BY hour_idx
                        ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
                       AS nt
            FROM j
        )
        SELECT user_id, hour_idx,
               vm AS v_obs_micros,
               CASE
                   WHEN vm IS NOT NULL THEN vm
                   WHEN pv IS NOT NULL AND nv IS NOT NULL THEN
                        (pv * (nt - hour_idx) + nv * (hour_idx - pt))
                        // (nt - pt)
                   ELSE COALESCE(pv, nv) END AS v_filled_micros,
               (vm IS NULL) AS is_gap
        FROM f
    """,
    tags=("warehouse", "timeseries", "interpolation", "events"),
)
def gapfill_linear_interpolation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap-fill with LINEAR INTERPOLATION: build each
    user's dense hourly spine, then fill missing buckets by
    interpolating between the nearest observed values on both sides
    (carry-forward/backward at the edges) — the hypertable
    `interpolate()` / pandas `interpolate(method='time')` operator.

    Values travel as fixed-point MICRO-UNIT bigints and the
    interpolation is pure integer arithmetic (weighted mean with
    integer division): floating-point would hit cross-engine
    decimal-rounding divergence exactly at the midpoints interpolation
    loves to produce (x.xxxxxx5 ties round differently under Spark's
    decimal-string HALF_UP vs DuckDB's binary rounding), while the
    integer form is bit-exact everywhere.

    The carry windows use last/first with ignorenulls over the dense
    spine: O(1) state per row, no self-join against the observation
    table, no per-gap search.

    Scale: spine join and all four carry windows share ONE
    hash-partitioning by user_id (single shuffle); the observation agg
    before it is map-side combined. At 100 TB the spine is generated,
    never materialized — it streams straight into the window stage."""
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "events")
    obs = (
        e.select(
            "user_id",
            (F.unix_micros("ts") / F.lit(INTERP_BUCKET_SEC * 1_000_000))
            .cast("bigint")
            .alias("hour_idx"),
            "value",
        )
        .groupBy("user_id", "hour_idx")
        .agg(
            F.floor(F.max("value") * _MICRO).cast("bigint").alias("vm")
        )
    )
    spine = (
        obs.groupBy("user_id")
        .agg(F.min("hour_idx").alias("lo"), F.max("hour_idx").alias("hi"))
        .select("user_id", F.explode(F.sequence("lo", "hi")).alias("hour_idx"))
    )
    j = spine.join(obs, ["user_id", "hour_idx"], "left")
    back = (
        Window.partitionBy("user_id")
        .orderBy("hour_idx")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    fwd = (
        Window.partitionBy("user_id")
        .orderBy("hour_idx")
        .rowsBetween(0, Window.unboundedFollowing)
    )
    t_of_obs = F.when(F.col("vm").isNotNull(), F.col("hour_idx"))
    f_ = (
        j.withColumn("pv", F.last("vm", ignorenulls=True).over(back))
        .withColumn("pt", F.last(t_of_obs, ignorenulls=True).over(back))
        .withColumn("nv", F.first("vm", ignorenulls=True).over(fwd))
        .withColumn("nt", F.first(t_of_obs, ignorenulls=True).over(fwd))
    )
    # integer weighted mean; operands are non-negative (value > 0), so
    # trunc-vs-floor division semantics never diverge
    interp = F.expr(
        "(pv * (nt - hour_idx) + nv * (hour_idx - pt)) div (nt - pt)"
    )
    filled = (
        F.when(F.col("vm").isNotNull(), F.col("vm"))
        .when(F.col("pv").isNotNull() & F.col("nv").isNotNull(), interp)
        .otherwise(F.coalesce("pv", "nv"))
    )
    return f_.select(
        "user_id",
        "hour_idx",
        F.col("vm").alias("v_obs_micros"),
        filled.alias("v_filled_micros"),
        F.col("vm").isNull().alias("is_gap"),
    )


MERGE_MOD = 7  # o_orderkey % 7 == 2 -> tonight's updates; == 3 -> inserts


@query(
    "merge_upsert_orders",
    oracle=f"""
        WITH changes AS (
            SELECT o_orderkey, 'P' AS new_status,
                   ROUND(o_totalprice + 10.0, 2) AS new_price
            FROM orders WHERE o_orderkey % {MERGE_MOD} = 2
            UNION ALL
            SELECT o_orderkey + (SELECT MAX(o_orderkey) + 1 FROM orders),
                   'O', 100.0
            FROM orders WHERE o_orderkey % {MERGE_MOD} = 3
        )
        SELECT COALESCE(t.o_orderkey, c.o_orderkey)     AS o_orderkey,
               COALESCE(c.new_status, t.o_orderstatus)  AS o_orderstatus,
               ROUND(COALESCE(c.new_price, t.o_totalprice), 2) AS o_totalprice,
               CASE WHEN t.o_orderkey IS NULL THEN 'inserted'
                    WHEN c.o_orderkey IS NULL THEN 'unchanged'
                    ELSE 'updated' END                  AS merge_action
        FROM orders t FULL OUTER JOIN changes c USING (o_orderkey)
    """,
    tags=("warehouse", "merge", "upsert", "orders"),
)
def merge_upsert_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO semantics (upsert) without a MERGE engine: target
    FULL OUTER JOIN changes on the business key — matched rows take
    the update, unmatched-target rows pass through, unmatched-change
    rows are inserts; the action is tagged per row.

    This is exactly what Delta/Iceberg MERGE compiles to underneath
    (minus file-level pruning): ONE key-partitioned join, target
    scanned once. The change set here is derived deterministically
    (keys ≡ 2 mod 7 add a flat fee (an additive update keeps rounding tie-free cross-engine), keys ≡ 3 mod 7 shifted into an
    insert range) so the oracle can restate it."""
    o = load_table(spark, sf_dir, "orders")
    updates = o.filter(F.col("o_orderkey") % MERGE_MOD == 2).select(
        "o_orderkey",
        F.lit("P").alias("new_status"),
        F.round(F.col("o_totalprice") + 10.0, 2).alias("new_price"),
    )
    # insert keys shifted past the real key space by an aggregate
    # bound (max+1) so synthetic keys can NEVER collide with real
    # ones at any SF — the bound is a 1-row broadcast, and the oracle
    # restates the same scalar subquery
    bound = o.agg((F.max("o_orderkey") + 1).alias("key_shift"))
    inserts = (
        o.filter(F.col("o_orderkey") % MERGE_MOD == 3)
        .crossJoin(F.broadcast(bound))
        .select(
            (F.col("o_orderkey") + F.col("key_shift")).alias("o_orderkey"),
            F.lit("O").alias("new_status"),
            F.lit(100.0).alias("new_price"),
        )
    )
    changes = updates.unionAll(inserts)
    t = o.select("o_orderkey", "o_orderstatus", "o_totalprice")
    j = t.join(changes, "o_orderkey", "full_outer")
    return j.select(
        "o_orderkey",
        F.coalesce("new_status", "o_orderstatus").alias("o_orderstatus"),
        F.round(F.coalesce("new_price", "o_totalprice"), 2).alias(
            "o_totalprice"
        ),
        F.when(F.col("o_orderstatus").isNull(), "inserted")
        .when(F.col("new_status").isNull(), "unchanged")
        .otherwise("updated")
        .alias("merge_action"),
    )


@query(
    "scd2_point_in_time_join",
    oracle=f"""
        WITH dim AS (
            SELECT c_custkey, c_mktsegment AS segment,
                   DATE '{SCD2_OPEN}' AS valid_from,
                   CAST(NULL AS DATE) AS valid_to
            FROM customer
        ),
        changes AS (
            SELECT c_custkey, 'UPGRADED' AS new_segment,
                   DATE '{SCD2_EFF}' AS eff
            FROM customer WHERE c_custkey % {SCD2_MOD} = 3
        ),
        versions AS (
            SELECT d.c_custkey, d.segment, d.valid_from,
                   ch.eff AS valid_to
            FROM dim d JOIN changes ch USING (c_custkey)
            UNION ALL
            SELECT c_custkey, new_segment, eff, CAST(NULL AS DATE)
            FROM changes
            UNION ALL
            SELECT d.c_custkey, d.segment, d.valid_from, d.valid_to
            FROM dim d ANTI JOIN changes ch USING (c_custkey)
        )
        SELECT segment,
               CAST(COUNT(*) AS BIGINT)            AS n_orders,
               ROUND(SUM(o_totalprice), 2)         AS revenue,
               STRFTIME(MIN(o_orderdate), '%Y-%m-%d') AS first_day,
               STRFTIME(MAX(o_orderdate), '%Y-%m-%d') AS last_day
        FROM orders o
        JOIN versions v
          ON o.o_custkey = v.c_custkey
         AND CAST(o.o_orderdate AS DATE) >= v.valid_from
         AND (v.valid_to IS NULL OR CAST(o.o_orderdate AS DATE) < v.valid_to)
        GROUP BY segment
        ORDER BY segment
    """,
    tags=("warehouse", "scd2", "point-in-time", "orders"),
)
def scd2_point_in_time_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time correct dimension lookup — the feature-store /
    training-data staple: each fact row joins the dimension VERSION
    that was valid at the fact's own event time (no leakage of future
    attribute values into past examples). Orders before the SCD2
    effective date see the original segment; later orders of changed
    keys see 'UPGRADED'.

    Scale: ONE equi-join on the business key (the validity predicate
    rides along as a residual filter — at ≤2 versions per key the
    fan-out is bounded); no window, no per-fact version search. The
    revenue rollup keeps the checked output compact while pinning
    every fact's version routing."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    dim = c.select(
        "c_custkey",
        F.col("c_mktsegment").alias("segment"),
        F.lit(SCD2_OPEN).cast("date").alias("valid_from"),
        F.lit(None).cast("date").alias("valid_to"),
    )
    changes = c.filter(F.col("c_custkey") % SCD2_MOD == 3).select(
        "c_custkey",
        F.lit("UPGRADED").alias("new_segment"),
        F.lit(SCD2_EFF).cast("date").alias("eff"),
    )
    closed = dim.join(changes, "c_custkey").select(
        "c_custkey", "segment", "valid_from", F.col("eff").alias("valid_to")
    )
    opened = changes.select(
        "c_custkey",
        F.col("new_segment").alias("segment"),
        F.col("eff").alias("valid_from"),
        F.lit(None).cast("date").alias("valid_to"),
    )
    untouched = dim.join(changes, "c_custkey", "left_anti")
    versions = closed.unionByName(opened).unionByName(untouched)
    od = F.col("o_orderdate").cast("date")
    j = o.join(
        versions,
        (F.col("o_custkey") == F.col("c_custkey"))
        & (od >= F.col("valid_from"))
        & (F.col("valid_to").isNull() | (od < F.col("valid_to"))),
    )
    return (
        j.groupBy("segment")
        .agg(
            F.count("*").cast("bigint").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
            F.date_format(F.min("o_orderdate"), "yyyy-MM-dd").alias("first_day"),
            F.date_format(F.max("o_orderdate"), "yyyy-MM-dd").alias("last_day"),
        )
        .orderBy("segment")
    )


DIFF_MOD = 13  # %13==4 deleted yesterday; ==5 price-changed


@query(
    "snapshot_diff_orders",
    oracle=f"""
        WITH yesterday AS (
            SELECT o_orderkey,
                   CASE WHEN o_orderkey % {DIFF_MOD} = 5
                        THEN ROUND(o_totalprice + 5.0, 2)
                        ELSE o_totalprice END AS o_totalprice,
                   o_orderstatus
            FROM orders WHERE o_orderkey % {DIFF_MOD} <> 4
            UNION ALL
            SELECT o_orderkey + (SELECT MAX(o_orderkey) + 1 FROM orders),
                   50.0, 'X'
            FROM orders WHERE o_orderkey % {DIFF_MOD} = 6
        ),
        d AS (
            SELECT COALESCE(t.o_orderkey, y.o_orderkey) AS o_orderkey,
                   CASE WHEN y.o_orderkey IS NULL THEN 'added'
                        WHEN t.o_orderkey IS NULL THEN 'removed'
                        WHEN t.o_totalprice <> y.o_totalprice
                          OR t.o_orderstatus <> y.o_orderstatus THEN 'changed'
                        ELSE 'unchanged' END AS diff_kind
            FROM orders t FULL OUTER JOIN yesterday y USING (o_orderkey)
        )
        SELECT diff_kind,
               CAST(COUNT(*) AS BIGINT)  AS n_rows,
               CAST(MIN(o_orderkey) AS BIGINT) AS min_key,
               CAST(MAX(o_orderkey) AS BIGINT) AS max_key
        FROM d GROUP BY diff_kind
        ORDER BY diff_kind
    """,
    tags=("warehouse", "diff", "audit", "orders"),
)
def snapshot_diff_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Table snapshot diff (the audit/reconciliation operator): compare
    today's orders against a derived 'yesterday' snapshot and classify
    every key as added / removed / changed / unchanged (all four kinds
    exercised: yesterday lacks the %13==4 keys and carries synthetic
    keys today lacks) — ONE full-outer
    join on the key with column-level compare, each table scanned once.
    The per-kind rollup keeps the checked output compact while pinning
    the complete classification (counts + key extrema).

    Scale: the join is the only shuffle; at 100 TB add a row-hash
    column (xxhash64 of the compared struct) so the change compare
    moves 8 bytes per row instead of every column."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderstatus"
    )
    yesterday = (
        o.filter(F.col("o_orderkey") % DIFF_MOD != 4)
        .select(
            "o_orderkey",
            F.when(
                F.col("o_orderkey") % DIFF_MOD == 5,
                F.round(F.col("o_totalprice") + 5.0, 2),
            )
            .otherwise(F.col("o_totalprice"))
            .alias("y_totalprice"),
            F.col("o_orderstatus").alias("y_orderstatus"),
        )
        .unionByName(
            # synthetic keys shifted past max(o_orderkey) so they can
            # never collide with real keys at any SF (1-row broadcast
            # bound, restated as a scalar subquery in the oracle)
            o.filter(F.col("o_orderkey") % DIFF_MOD == 6)
            .crossJoin(
                F.broadcast(o.agg((F.max("o_orderkey") + 1).alias("key_shift")))
            )
            .select(
                (F.col("o_orderkey") + F.col("key_shift")).alias("o_orderkey"),
                F.lit(50.0).alias("y_totalprice"),
                F.lit("X").alias("y_orderstatus"),
            )
        )
    )
    j = o.join(yesterday, "o_orderkey", "full_outer")
    kind = (
        F.when(F.col("y_totalprice").isNull() & F.col("y_orderstatus").isNull(), "added")
        .when(F.col("o_totalprice").isNull(), "removed")
        .when(
            (F.col("o_totalprice") != F.col("y_totalprice"))
            | (F.col("o_orderstatus") != F.col("y_orderstatus")),
            "changed",
        )
        .otherwise("unchanged")
    )
    return (
        j.select("o_orderkey", kind.alias("diff_kind"))
        .groupBy("diff_kind")
        .agg(
            F.count("*").cast("bigint").alias("n_rows"),
            F.min("o_orderkey").cast("bigint").alias("min_key"),
            F.max("o_orderkey").cast("bigint").alias("max_key"),
        )
        .orderBy("diff_kind")
    )


MV_DELTA_MOD = 5  # o_orderkey % 5 == 0 -> tonight's delta batch


@query(
    "agg_incremental_maintenance",
    oracle=f"""
        SELECT o_orderstatus,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT))
                    AS BIGINT)          AS revenue_cents,
               ROUND(CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT))
                          AS DOUBLE) / 100.0 / COUNT(*), 6) AS avg_price
        FROM orders
        GROUP BY o_orderstatus
        ORDER BY o_orderstatus
    """,
    tags=("warehouse", "aggregate", "incremental", "materialized-view"),
)
def agg_incremental_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental materialized-view maintenance: the per-status revenue
    view is NOT recomputed from scratch when a delta batch lands —
    yesterday's aggregate STATE (sum, count per group) is unioned with
    the delta's partial state and merged by one algebraic combine
    (sum-of-sums, sum-of-counts; avg derived at read time from the
    merged state). The oracle is the full recompute over base ∪ delta —
    the maintenance identity the pattern must satisfy. Revenue is held
    as exact integer cents (FLOOR(x*100+0.5) both engines) so the
    merged sum is bit-identical to the recomputed sum regardless of
    addition order — the same fixed-point discipline a production MV
    needs, because float partial sums drift from their recompute.

    Scale: this is the batch twin of the streaming partial-state sink
    (streaming/events.py stream_incremental_rollup) and of every
    map-side combine Spark plans: only the delta is scanned at refresh
    (here both sides derive from one table, filter-disjoint at the
    scan); state per group is two longs; the merge is one keyed
    shuffle of |groups| rows, not |rows|."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderstatus",
        F.floor(F.col("o_totalprice") * 100 + 0.5)
        .cast("bigint")
        .alias("cents"),
    )
    base = o.filter(F.col("o_orderkey") % MV_DELTA_MOD != 0)
    delta = o.filter(F.col("o_orderkey") % MV_DELTA_MOD == 0)

    def partial_state(df: DataFrame) -> DataFrame:
        return df.groupBy("o_orderstatus").agg(
            F.count("*").alias("cnt"), F.sum("cents").alias("cents")
        )

    merged = (
        partial_state(base)
        .unionByName(partial_state(delta))
        .groupBy("o_orderstatus")
        .agg(F.sum("cnt").alias("n_orders"), F.sum("cents").alias("revenue_cents"))
    )
    return merged.select(
        "o_orderstatus",
        F.col("n_orders").cast("bigint"),
        F.col("revenue_cents").cast("bigint"),
        F.round(
            F.col("revenue_cents").cast("double") / 100.0 / F.col("n_orders"), 6
        ).alias("avg_price"),
    ).orderBy("o_orderstatus")


_ZM_THRESHOLD_CENTS = 40_000_000  # predicate: o_totalprice > $400k


@query(
    "warehouse_zone_map_skipping",
    oracle=f"""
        WITH parts AS (
            SELECT CAST(o_orderdate AS DATE) AS day,
                   COUNT(*) AS n_rows,
                   MIN(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS lo,
                   MAX(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS hi
            FROM orders GROUP BY 1
        ),
        cls AS (
            SELECT day, n_rows,
                   CASE WHEN hi <= {_ZM_THRESHOLD_CENTS} THEN 'skipped'
                        WHEN lo >  {_ZM_THRESHOLD_CENTS} THEN 'full_match'
                        ELSE 'partial' END AS zone
            FROM parts
        )
        SELECT CAST(COUNT(*) AS BIGINT) AS n_partitions,
               CAST(SUM(CASE WHEN zone = 'skipped' THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_skipped,
               CAST(SUM(CASE WHEN zone = 'full_match' THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_full_match,
               CAST(SUM(CASE WHEN zone = 'partial' THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_partial,
               CAST(SUM(CASE WHEN zone = 'skipped' THEN n_rows ELSE 0 END)
                    AS BIGINT) AS rows_skipped,
               ROUND(SUM(CASE WHEN zone = 'skipped' THEN n_rows ELSE 0 END)
                     * 1.0 / SUM(n_rows), 4) AS row_skip_ratio
        FROM cls
    """,
    tags=("warehouse", "layout", "partition-pruning", "orders", "monitoring"),
)
def warehouse_zone_map_skipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zone-map (min/max statistics) skipping report: for day-
    partitioned orders and the predicate totalprice > $400k, classify
    every partition as skipped (max under threshold), full-match (min
    over), or partial — exactly the parquet row-group / Iceberg
    manifest pruning model. The skip ratio is the number layout
    decisions (partitioning grain, Z-ORDER — see scale_zorder_layout)
    are made to maximize; this operator MEASURES it instead of
    guessing.

    100 TB design: the statistics frame is one map-side-combinable
    aggregate (a real lakehouse reads it from file footers for free);
    classification and ratios run on the tiny per-partition frame.
    """
    o = load_table(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("bigint")
    parts = o.groupBy(F.col("o_orderdate").cast("date").alias("day")).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min(cents).alias("lo"),
        F.max(cents).alias("hi"),
    )
    zone = (
        F.when(F.col("hi") <= _ZM_THRESHOLD_CENTS, "skipped")
        .when(F.col("lo") > _ZM_THRESHOLD_CENTS, "full_match")
        .otherwise("partial")
    )
    cls = parts.select("n_rows", zone.alias("zone"))
    skipped_rows = F.sum(F.when(F.col("zone") == "skipped", F.col("n_rows")).otherwise(0))
    return cls.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_partitions"),
        F.sum(F.when(F.col("zone") == "skipped", 1).otherwise(0))
        .cast("bigint")
        .alias("n_skipped"),
        F.sum(F.when(F.col("zone") == "full_match", 1).otherwise(0))
        .cast("bigint")
        .alias("n_full_match"),
        F.sum(F.when(F.col("zone") == "partial", 1).otherwise(0))
        .cast("bigint")
        .alias("n_partial"),
        skipped_rows.cast("bigint").alias("rows_skipped"),
        F.round(skipped_rows * 1.0 / F.sum("n_rows"), 4).alias("row_skip_ratio"),
    )


# --- Bloom-filter runtime semi-join pre-filter ------------------------
# The row-level data-skipping model behind Spark AQE runtime filters,
# Iceberg/Parquet bloom metadata, and semi-join pushdown: hash the
# build-side keys into an m-bit filter, drop probe rows whose bits
# miss, and pay only a measurable false-positive rate. k=3 hashes via
# the Kirsch-Mitzenmacher double-hash construction over the portable
# md5 idiom so both engines compute bit-identical filters.

BLOOM_M = 8192  # filter bits
BLOOM_K = 3  # hashes per key

_BLOOM_SEG = "BUILDING"


def _bloom_h(prefix: str, key_sql: str) -> str:
    return (
        f"CAST(('0x' || substr(md5('{prefix}' || CAST({key_sql} AS VARCHAR)), 1, 8)) "
        "AS BIGINT)"
    )


@query(
    "warehouse_bloom_filter_semijoin",
    oracle=f"""
        WITH ks AS (SELECT UNNEST([0, 1, 2]) AS i),
        build AS (
            SELECT DISTINCT c_custkey FROM customer
            WHERE c_mktsegment = '{_BLOOM_SEG}'
        ),
        bits AS (
            SELECT DISTINCT
                   ({_bloom_h('b1', 'c_custkey')}
                    + i * {_bloom_h('b2', 'c_custkey')}) % {BLOOM_M} AS bit
            FROM build CROSS JOIN ks
        ),
        pk AS (SELECT DISTINCT o_custkey FROM orders),
        pbits AS (
            SELECT DISTINCT o_custkey,
                   ({_bloom_h('b1', 'o_custkey')}
                    + i * {_bloom_h('b2', 'o_custkey')}) % {BLOOM_M} AS bit
            FROM pk CROSS JOIN ks
        ),
        nb AS (SELECT o_custkey, COUNT(*) AS n_bits FROM pbits GROUP BY 1),
        nh AS (
            SELECT p.o_custkey, COUNT(*) AS n_hit
            FROM pbits p JOIN bits b USING (bit) GROUP BY 1
        ),
        pass AS (
            SELECT nb.o_custkey FROM nb JOIN nh USING (o_custkey)
            WHERE nh.n_hit = nb.n_bits
        ),
        probe AS (
            SELECT o.o_custkey,
                   CASE WHEN p.o_custkey IS NOT NULL THEN 1 ELSE 0 END AS bloom_pass,
                   CASE WHEN b.c_custkey IS NOT NULL THEN 1 ELSE 0 END AS exact_hit
            FROM orders o
            LEFT JOIN pass p ON o.o_custkey = p.o_custkey
            LEFT JOIN build b ON o.o_custkey = b.c_custkey
        )
        SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM build) AS n_build_keys,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM bits) AS n_bits_set,
               (SELECT ROUND(COUNT(*) * 1.0 / {BLOOM_M}, 4) FROM bits) AS fill_ratio,
               CAST(COUNT(*) AS BIGINT) AS n_probe_rows,
               CAST(SUM(bloom_pass) AS BIGINT) AS n_pass_rows,
               CAST(SUM(exact_hit) AS BIGINT) AS n_exact_rows,
               CAST(SUM(bloom_pass) - SUM(exact_hit) AS BIGINT) AS n_fp_rows,
               ROUND((SUM(bloom_pass) - SUM(exact_hit)) * 1.0
                     / (COUNT(*) - SUM(exact_hit)), 4) AS observed_fpr
        FROM probe
    """,
    tags=("warehouse", "bloom-filter", "runtime-filter", "join", "orders", "customer"),
)
def warehouse_bloom_filter_semijoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter semi-join pre-filter with a measured false-positive
    rate: build an m=8192-bit, k=3 filter over the BUILDING-segment
    customer keys, push every order row through it, and compare the
    bloom verdict against exact membership. This is the row-level
    data-skipping layer under Spark's AQE runtime filters and
    Iceberg/Parquet bloom metadata — the zone-map report
    (warehouse_zone_map_skipping) measures block-level pruning; this
    measures the row-level residue. Bloom filters never false-negative,
    so n_pass_rows >= n_exact_rows always, and observed_fpr is the
    price of skipping the exact join on the fast path.

    100 TB design: the filter is built from the SMALL dimension side
    (one distinct + explode-k aggregate, <= m rows) and broadcast; the
    fact table is probed via its distinct-key frame (bounded by key
    cardinality, not row count) so per-row hashing never shuffles fact
    rows. Hashes use the portable md5 idiom (dedup.token_hash) so the
    DuckDB oracle computes a bit-identical filter.
    """
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    ks = spark.range(BLOOM_K).select(F.col("id").alias("i"))

    def h(prefix: str, col: F.Column) -> F.Column:
        return F.conv(
            F.substring(F.md5(F.concat(F.lit(prefix), col.cast("string"))), 1, 8),
            16,
            10,
        ).cast("bigint")

    build = (
        cust.where(F.col("c_mktsegment") == _BLOOM_SEG)
        .select("c_custkey")
        .distinct()
    )
    bits = (
        build.crossJoin(F.broadcast(ks))
        .select(
            ((h("b1", F.col("c_custkey")) + F.col("i") * h("b2", F.col("c_custkey")))
             % BLOOM_M).alias("bit")
        )
        .distinct()
    )
    pk = orders.select("o_custkey").distinct()
    pbits = (
        pk.crossJoin(F.broadcast(ks))
        .select(
            "o_custkey",
            ((h("b1", F.col("o_custkey")) + F.col("i") * h("b2", F.col("o_custkey")))
             % BLOOM_M).alias("bit"),
        )
        .distinct()
    )
    nb = pbits.groupBy("o_custkey").agg(F.count(F.lit(1)).alias("n_bits"))
    nh = (
        pbits.join(F.broadcast(bits), "bit")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_hit"))
    )
    passed = (
        nb.join(nh, "o_custkey")
        .where(F.col("n_hit") == F.col("n_bits"))
        .select("o_custkey")
    )
    probe = (
        orders.select("o_custkey")
        .join(F.broadcast(passed.withColumn("bp", F.lit(1))), "o_custkey", "left")
        .join(
            F.broadcast(build.withColumnRenamed("c_custkey", "o_custkey")
                        .withColumn("eh", F.lit(1))),
            "o_custkey",
            "left",
        )
        .select(
            F.coalesce(F.col("bp"), F.lit(0)).alias("bloom_pass"),
            F.coalesce(F.col("eh"), F.lit(0)).alias("exact_hit"),
        )
    )
    n_build = build.agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    n_bits = bits.agg(
        F.count(F.lit(1)).cast("bigint").alias("c"),
        F.round(F.count(F.lit(1)) * 1.0 / BLOOM_M, 4).alias("fill"),
    )
    agg = probe.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_probe_rows"),
        F.sum("bloom_pass").cast("bigint").alias("n_pass_rows"),
        F.sum("exact_hit").cast("bigint").alias("n_exact_rows"),
        (F.sum("bloom_pass") - F.sum("exact_hit")).cast("bigint").alias("n_fp_rows"),
        F.round(
            (F.sum("bloom_pass") - F.sum("exact_hit")) * 1.0
            / (F.count(F.lit(1)) - F.sum("exact_hit")),
            4,
        ).alias("observed_fpr"),
    )
    return (
        agg.crossJoin(F.broadcast(n_build.select(F.col("c").alias("n_build_keys"))))
        .crossJoin(
            F.broadcast(
                n_bits.select(
                    F.col("c").alias("n_bits_set"), F.col("fill").alias("fill_ratio")
                )
            )
        )
        .select(
            "n_build_keys",
            "n_bits_set",
            "fill_ratio",
            "n_probe_rows",
            "n_pass_rows",
            "n_exact_rows",
            "n_fp_rows",
            "observed_fpr",
        )
    )


# --- Small-file compaction planning (size-ordered bin packing) --------

COMPACT_TARGET_BYTES = 32_768  # target compacted file size
COMPACT_ROW_BYTES = 64  # modeled bytes per order row


@query(
    "warehouse_compaction_binpack",
    oracle=f"""
        WITH files AS (
            SELECT CAST(o_orderdate AS DATE) AS day,
                   COUNT(*) * {COMPACT_ROW_BYTES} AS bytes
            FROM orders GROUP BY 1
        ),
        packed AS (
            SELECT bytes,
                   CAST(FLOOR(
                       (SUM(bytes) OVER (ORDER BY bytes DESC, day) - bytes)
                       * 1.0 / {COMPACT_TARGET_BYTES}) AS BIGINT) AS bin
            FROM files
        ),
        bins AS (
            SELECT bin, SUM(bytes) AS bin_bytes, COUNT(*) AS n_files
            FROM packed GROUP BY 1
        )
        SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM files) AS n_files,
               (SELECT CAST(SUM(CASE WHEN bytes < {COMPACT_TARGET_BYTES // 2}
                                     THEN 1 ELSE 0 END) AS BIGINT)
                FROM files) AS n_small_files,
               (SELECT CAST(SUM(bytes) AS BIGINT) FROM files) AS total_bytes,
               CAST(COUNT(*) AS BIGINT) AS n_bins,
               CAST(MAX(bin_bytes) AS BIGINT) AS max_bin_bytes,
               CAST(MAX(n_files) AS BIGINT) AS max_files_per_bin,
               ROUND(SUM(bin_bytes) * 1.0
                     / (COUNT(*) * {COMPACT_TARGET_BYTES}), 4) AS avg_fill_ratio
        FROM bins
    """,
    tags=("warehouse", "compaction", "layout", "small-files", "orders"),
)
def warehouse_compaction_binpack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction plan: model each day-partition of orders
    as one data file (rows x 64 B), then pack files into target-size
    output bins by size-descending sequential fill — the exact
    bin-packing rule behind Iceberg's rewriteDataFiles binpack and
    Spark AQE's shuffle-partition coalescing (cumulative size // target
    = bin id). Reports the before (file count, small-file count) and
    after (bin count, max bin size/fanout, fill ratio) of the rewrite
    so table maintenance is a measured decision, not a guess.

    100 TB design: file statistics come from ONE map-side-combinable
    aggregate (a real lakehouse reads them from manifest metadata
    without touching data); the pack itself is a window over the tiny
    per-file frame — thousands of files, not billions of rows. The
    single-partition window is bounded by file count by construction.
    """
    o = load_table(spark, sf_dir, "orders")
    files = o.groupBy(F.col("o_orderdate").cast("date").alias("day")).agg(
        (F.count(F.lit(1)) * COMPACT_ROW_BYTES).alias("bytes")
    )
    from pyspark.sql import Window

    w = Window.orderBy(F.col("bytes").desc(), F.col("day"))
    packed = files.select(
        "bytes",
        F.floor(
            (F.sum("bytes").over(w) - F.col("bytes")) * 1.0 / COMPACT_TARGET_BYTES
        ).cast("bigint").alias("bin"),
    )
    bins = packed.groupBy("bin").agg(
        F.sum("bytes").alias("bin_bytes"), F.count(F.lit(1)).alias("n_files")
    )
    file_stats = files.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_files"),
        F.sum(
            F.when(F.col("bytes") < COMPACT_TARGET_BYTES // 2, 1).otherwise(0)
        ).cast("bigint").alias("n_small_files"),
        F.sum("bytes").cast("bigint").alias("total_bytes"),
    )
    bin_stats = bins.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_bins"),
        F.max("bin_bytes").cast("bigint").alias("max_bin_bytes"),
        F.max("n_files").cast("bigint").alias("max_files_per_bin"),
        F.round(
            F.sum("bin_bytes") * 1.0 / (F.count(F.lit(1)) * COMPACT_TARGET_BYTES), 4
        ).alias("avg_fill_ratio"),
    )
    return file_stats.crossJoin(F.broadcast(bin_stats)).select(
        "n_files",
        "n_small_files",
        "total_bytes",
        "n_bins",
        "max_bin_bytes",
        "max_files_per_bin",
        "avg_fill_ratio",
    )


# --- CDC APPLY CHANGES (ordered upsert/delete compaction + merge) ------

CDC_STALE_MOD = 10  # base snapshot is missing custkeys = 0 (mod 10)
CDC_DELETE_MOD = 19  # orderkeys = 0 (mod 19) arrive as DELETE changes


@query(
    "warehouse_cdc_apply",
    oracle=f"""
        WITH base AS (
            SELECT c_custkey AS k,
                   CAST(ROUND(c_acctbal * 100) AS BIGINT) AS bal
            FROM customer WHERE c_custkey % {CDC_STALE_MOD} != 0
        ),
        changes AS (
            SELECT o_custkey AS k, o_orderkey AS seq,
                   CASE WHEN o_orderkey % {CDC_DELETE_MOD} = 0
                        THEN 'D' ELSE 'U' END AS op,
                   CAST(ROUND(o_totalprice * 100) AS BIGINT) AS new_bal
            FROM orders
        ),
        last_change AS (
            SELECT k, max_by(op, seq) AS op, max_by(new_bal, seq) AS new_bal
            FROM changes GROUP BY k
        ),
        merged AS (
            SELECT COALESCE(b.k, c.k) AS k,
                   CASE WHEN c.k IS NULL THEN 'kept'
                        WHEN c.op = 'U' AND b.k IS NOT NULL THEN 'updated'
                        WHEN c.op = 'U' THEN 'inserted'
                        WHEN b.k IS NOT NULL THEN 'deleted'
                        ELSE 'delete_noop' END AS action,
                   CASE WHEN c.k IS NULL THEN b.bal
                        WHEN c.op = 'U' THEN c.new_bal
                        ELSE 0 END AS bal
            FROM base b FULL OUTER JOIN last_change c ON b.k = c.k
        )
        SELECT action,
               CAST(COUNT(*) AS BIGINT) AS n_keys,
               CAST(SUM(bal) AS BIGINT) AS bal_cents
        FROM merged GROUP BY action ORDER BY action
    """,
    tags=("warehouse", "cdc", "merge", "join", "customer", "orders"),
)
def warehouse_cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """APPLY CHANGES INTO semantics (the Delta Live Tables / Iceberg
    upsert-stream contract): an ordered CDC stream of upserts and
    deletes — here derived from orders: sequence = o_orderkey, DELETE
    when the key ≡ 0 mod 19, else UPSERT of the new balance — is
    compacted to each key's LAST change and merged into a stale base
    snapshot (customers with custkey ≢ 0 mod 10, so changes on the
    missing tenth surface as inserts). The summary groups the merge
    outcome: kept / updated / inserted / deleted / delete_noop with
    resulting balance cents.

    Shape is the production CDC pattern at 100 TB: the change stream
    folds FIRST (one map-side-combined ``max_by(value, seq)`` per key
    — no window over the raw stream), and only the compacted one-row-
    per-key frame joins the snapshot (one equi-join). Deletes of
    absent keys are counted, not applied, matching the idempotent
    replay contract. ``max_by`` is deterministic because the sequence
    column is unique.

    Reference analog: the overwrite-style sink of
    /root/reference/src/data_generator.py:40-42 upgraded to the
    incremental merge a mutable 100 TB table actually needs.
    """
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    base = c.where(F.col("c_custkey") % CDC_STALE_MOD != 0).select(
        F.col("c_custkey").alias("k"),
        F.round(F.col("c_acctbal") * 100).cast("bigint").alias("bal"),
    )
    changes = o.select(
        F.col("o_custkey").alias("k"),
        F.col("o_orderkey").alias("seq"),
        F.when(F.col("o_orderkey") % CDC_DELETE_MOD == 0, "D")
        .otherwise("U")
        .alias("op"),
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("new_bal"),
    )
    last_change = changes.groupBy("k").agg(
        F.max_by("op", "seq").alias("op"),
        F.max_by("new_bal", "seq").alias("new_bal"),
    )
    b, ch = base.alias("b"), last_change.alias("c")
    merged = b.join(ch, F.col("b.k") == F.col("c.k"), "full_outer").select(
        F.when(F.col("c.k").isNull(), "kept")
        .when((F.col("c.op") == "U") & F.col("b.k").isNotNull(), "updated")
        .when(F.col("c.op") == "U", "inserted")
        .when(F.col("b.k").isNotNull(), "deleted")
        .otherwise("delete_noop")
        .alias("action"),
        F.when(F.col("c.k").isNull(), F.col("b.bal"))
        .when(F.col("c.op") == "U", F.col("c.new_bal"))
        .otherwise(F.lit(0))
        .alias("bal"),
    )
    return (
        merged.groupBy("action")
        .agg(
            F.count("*").cast("bigint").alias("n_keys"),
            F.sum("bal").cast("bigint").alias("bal_cents"),
        )
        .orderBy("action")
    )
