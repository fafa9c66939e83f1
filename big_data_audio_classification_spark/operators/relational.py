"""Relational core: projections, filters, every join flavor, set ops.

Reference parity: the reference's only relational moves are a
scalar-predicate filter (``/root/reference/src/voice_classifier.py:103``),
a key dedup (``:104``) and a nested-loop interval join (``:126-134``).
Here each family is generalized to its idiomatic Spark form over the
driver tables; the interval/range join pattern (R24) appears as
``join_range_bands`` (broadcast non-equi join) — the 100 TB variant
bucket-joins instead (see operators/reference_pipeline.py).

Scale notes:
* Dimension sides of joins (region/nation/supplier, inline band dims) are
  explicitly ``broadcast()``-hinted — at 100 TB the fact side never
  shuffles for these joins.
* Fact-fact joins (orders ⋈ lineitem) rely on sort-merge + AQE; both
  sides are pre-partitioned on the join key by the shuffle, and AQE
  handles skew splitting.
* Filters are plain Column predicates on the scan → Catalyst pushes them
  into the parquet reader (verified in tests/test_plans.py).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from big_data_audio_classification_spark.registry import query
from big_data_audio_classification_spark.sources.catalog import load_table


# --------------------------------------------------------------------------
# Flagship: pricing summary (scan → filter → agg → sort in one query).
# Exercises predicate pushdown, partial aggregation, and a tiny final sort.
# --------------------------------------------------------------------------
@query(
    "pricing_summary",
    oracle="""
        SELECT l_returnflag, l_linestatus,
               ROUND(SUM(l_quantity), 2)                                        AS sum_qty,
               ROUND(SUM(l_extendedprice), 2)                                   AS sum_base_price,
               ROUND(SUM(l_extendedprice * (1 - l_discount)), 2)                AS sum_disc_price,
               ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)  AS sum_charge,
               ROUND(AVG(l_quantity), 4)                                        AS avg_qty,
               ROUND(AVG(l_extendedprice), 4)                                   AS avg_price,
               ROUND(AVG(l_discount), 4)                                        AS avg_disc,
               COUNT(*)                                                         AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
    """,
    tags=("relational", "aggregate", "flagship"),
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q1-style pricing summary over lineitem."""
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# --------------------------------------------------------------------------
# Filter predicate family (R17 generalized): AND/OR/NOT, BETWEEN, IN,
# LIKE, IS NULL. All predicates sit directly on the scan → pushdown.
# --------------------------------------------------------------------------
@query(
    "filter_predicates",
    oracle="""
        SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice,
               l_returnflag, l_linestatus
        FROM lineitem
        WHERE l_quantity BETWEEN 10 AND 20
          AND l_returnflag IN ('A', 'R')
          AND NOT (l_linestatus = 'O')
          AND (l_discount < 0.02 OR l_tax > 0.06)
          AND l_extendedprice IS NOT NULL
    """,
    tags=("relational", "filter"),
)
def filter_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compound predicate filter; every conjunct is pushdown-eligible."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(
        F.col("l_quantity").between(10, 20)
        & F.col("l_returnflag").isin("A", "R")
        & ~(F.col("l_linestatus") == "O")
        & ((F.col("l_discount") < 0.02) | (F.col("l_tax") > 0.06))
        & F.col("l_extendedprice").isNotNull()
    ).select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice",
        "l_returnflag", "l_linestatus",
    )


@query(
    "filter_like_null",
    oracle="""
        SELECT c_custkey, c_name, c_mktsegment
        FROM customer
        WHERE c_name LIKE '%1%' AND c_mktsegment IS NOT NULL
          AND c_acctbal >= 0
    """,
    tags=("relational", "filter"),
)
def filter_like_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIKE + null-check predicates."""
    c = load_table(spark, sf_dir, "customer")
    return c.filter(
        F.col("c_name").like("%1%")
        & F.col("c_mktsegment").isNotNull()
        & (F.col("c_acctbal") >= 0)
    ).select("c_custkey", "c_name", "c_mktsegment")


@query(
    "case_when_tiers",
    oracle="""
        SELECT CASE WHEN o_totalprice < 50000 THEN 'low'
                    WHEN o_totalprice < 150000 THEN 'mid'
                    ELSE 'high' END              AS price_tier,
               COUNT(*)                          AS n_orders,
               ROUND(SUM(o_totalprice), 2)       AS total
        FROM orders
        GROUP BY 1
        ORDER BY price_tier
    """,
    tags=("relational", "projection"),
)
def case_when_tiers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE/WHEN projection feeding an aggregate."""
    o = load_table(spark, sf_dir, "orders")
    tier = (
        F.when(F.col("o_totalprice") < 50000, "low")
        .when(F.col("o_totalprice") < 150000, "mid")
        .otherwise("high")
    )
    return (
        o.select(tier.alias("price_tier"), "o_totalprice")
        .groupBy("price_tier")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
        )
        .orderBy("price_tier")
    )


# --------------------------------------------------------------------------
# Join family. Dim joins broadcast; fact-fact joins sort-merge under AQE.
# --------------------------------------------------------------------------
@query(
    "join_inner_revenue_by_nation",
    oracle="""
        SELECT n_name,
               ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
               COUNT(*)                                          AS n_items
        FROM customer
        JOIN nation   ON c_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        JOIN orders   ON o_custkey   = c_custkey
        JOIN lineitem ON l_orderkey  = o_orderkey
        WHERE r_name IN ('AMERICA', 'ASIA')
        GROUP BY n_name
        ORDER BY n_name
    """,
    tags=("relational", "join", "aggregate"),
)
def join_inner_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5-way inner join (TPC-H Q5 shape): broadcast dims, shuffle facts."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r.filter(F.col("r_name").isin("AMERICA", "ASIA"))),
              n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
            .alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy("n_name")
    )


@query(
    "join_left_order_counts",
    oracle="""
        SELECT c_custkey, c_mktsegment,
               COUNT(o_orderkey)                       AS n_orders,
               ROUND(COALESCE(SUM(o_totalprice), 0), 2) AS spend
        FROM customer
        LEFT JOIN orders ON o_custkey = c_custkey
        GROUP BY c_custkey, c_mktsegment
    """,
    tags=("relational", "join"),
)
def join_left_order_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join keeping customers with zero orders."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey", "c_mktsegment")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.round(F.coalesce(F.sum("o_totalprice"), F.lit(0.0)), 2).alias("spend"),
        )
    )


@query(
    "join_right_order_customers",
    oracle="""
        SELECT c_custkey, c_mktsegment,
               COUNT(o_orderkey)                        AS n_orders,
               ROUND(COALESCE(SUM(o_totalprice), 0), 2) AS spend
        FROM orders
        RIGHT JOIN customer ON o_custkey = c_custkey
        GROUP BY c_custkey, c_mktsegment
    """,
    tags=("relational", "join"),
)
def join_right_order_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right outer join: every customer survives even with zero orders
    (mirror of ``join_left_order_counts`` with the build side flipped —
    SURVEY §2.B names inner/left/right/full explicitly). Catalyst plans
    right-outer as the mirrored left-outer; at scale prefer putting the
    preserved (smaller) side on the broadcastable side."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        o.join(c, o.o_custkey == c.c_custkey, "right")
        .groupBy("c_custkey", "c_mktsegment")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.round(F.coalesce(F.sum("o_totalprice"), F.lit(0.0)), 2).alias("spend"),
        )
    )


@query(
    "join_full_outer_daily",
    oracle="""
        WITH od AS (SELECT CAST(o_orderdate AS DATE) AS d, COUNT(*) AS n_orders
                    FROM orders GROUP BY 1),
             sd AS (SELECT CAST(l_shipdate AS DATE) AS d, COUNT(*) AS n_ships
                    FROM lineitem GROUP BY 1)
        SELECT CAST(COALESCE(od.d, sd.d) AS VARCHAR) AS day,
               COALESCE(n_orders, 0) AS n_orders,
               COALESCE(n_ships, 0)  AS n_ships
        FROM od FULL OUTER JOIN sd ON od.d = sd.d
    """,
    tags=("relational", "join"),
)
def join_full_outer_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join of two pre-aggregated daily series."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    od = o.groupBy(F.to_date("o_orderdate").alias("d")).agg(
        F.count(F.lit(1)).alias("n_orders")
    )
    sd = li.groupBy(F.to_date("l_shipdate").alias("d")).agg(
        F.count(F.lit(1)).alias("n_ships")
    )
    return (
        od.join(sd, od.d == sd.d, "full_outer")
        .select(
            F.coalesce(od.d, sd.d).cast("string").alias("day"),
            F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
            F.coalesce("n_ships", F.lit(0)).alias("n_ships"),
        )
    )


@query(
    "join_semi_active_customers",
    oracle="""
        SELECT c_custkey, c_name
        FROM customer c
        WHERE EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F')
    """,
    tags=("relational", "join"),
)
def join_semi_active_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join ≡ EXISTS; no duplication of the left side."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


@query(
    "join_anti_customers_without_orders",
    oracle="""
        SELECT c_custkey, c_name, c_mktsegment
        FROM customer c
        WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
    tags=("relational", "join"),
)
def join_anti_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join ≡ NOT EXISTS."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name", "c_mktsegment"
    )


@query(
    "join_cross_region_status",
    oracle="""
        SELECT r_name, s.o_orderstatus AS status
        FROM region
        CROSS JOIN (SELECT DISTINCT o_orderstatus FROM orders) s
    """,
    tags=("relational", "join"),
)
def join_cross_region_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cartesian product of two tiny inputs (broadcast NLJ)."""
    r = load_table(spark, sf_dir, "region")
    s = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderstatus").alias("status")
    ).distinct()
    return r.select("r_name").crossJoin(F.broadcast(s))


@query(
    "join_range_bands",
    oracle="""
        SELECT band, COUNT(*) AS n_orders, ROUND(AVG(o_totalprice), 4) AS avg_price
        FROM orders
        JOIN (VALUES ('low', 0.0, 60000.0),
                     ('mid', 60000.0, 180000.0),
                     ('high', 180000.0, 1e18)) AS bands(band, lo, hi)
          ON o_totalprice >= lo AND o_totalprice < hi
        GROUP BY band
        ORDER BY band
    """,
    tags=("relational", "join", "range-join"),
)
def join_range_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-equi (range) join against a broadcast band dimension — the
    R24 interval-join pattern (``/root/reference/src/voice_classifier.py:126-134``)
    in its Spark-native form: BroadcastNestedLoopJoin over a tiny dim.
    At 100 TB with a large dim, bucket both sides by floor(x/Δ) to turn
    this into an equi-join + residual predicate."""
    o = load_table(spark, sf_dir, "orders")
    bands = spark.createDataFrame(
        [("low", 0.0, 60000.0), ("mid", 60000.0, 180000.0), ("high", 180000.0, 1e18)],
        "band string, lo double, hi double",
    )
    return (
        o.join(
            F.broadcast(bands),
            (F.col("o_totalprice") >= F.col("lo")) & (F.col("o_totalprice") < F.col("hi")),
        )
        .groupBy("band")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.avg("o_totalprice"), 4).alias("avg_price"),
        )
        .orderBy("band")
    )


@query(
    "join_self_same_day_pairs",
    oracle="""
        SELECT a.o_orderkey AS k1, b.o_orderkey AS k2
        FROM orders a
        JOIN orders b
          ON a.o_custkey = b.o_custkey
         AND CAST(a.o_orderdate AS DATE) = CAST(b.o_orderdate AS DATE)
         AND a.o_orderkey < b.o_orderkey
    """,
    tags=("relational", "join"),
)
def join_self_same_day_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Self equi-join with residual inequality predicate."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", F.to_date("o_orderdate").alias("d")
    )
    a, b = o.alias("a"), o.alias("b")
    return a.join(
        b,
        (F.col("a.o_custkey") == F.col("b.o_custkey"))
        & (F.col("a.d") == F.col("b.d"))
        & (F.col("a.o_orderkey") < F.col("b.o_orderkey")),
    ).select(F.col("a.o_orderkey").alias("k1"), F.col("b.o_orderkey").alias("k2"))


# --------------------------------------------------------------------------
# Set operations + distinct (R18 generalized).
# --------------------------------------------------------------------------
@query(
    "set_union_segments",
    oracle="""
        SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        UNION
        SELECT c_custkey FROM customer WHERE c_acctbal > 5000
    """,
    tags=("relational", "setop"),
)
def set_union_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (distinct) of two key sets."""
    c = load_table(spark, sf_dir, "customer")
    a = c.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    b = c.filter(F.col("c_acctbal") > 5000).select("c_custkey")
    return a.union(b).distinct()


@query(
    "set_intersect_segments",
    oracle="""
        SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        INTERSECT
        SELECT c_custkey FROM customer WHERE c_acctbal > 1000
    """,
    tags=("relational", "setop"),
)
def set_intersect_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (distinct) of two key sets — the set-op sibling of
    ``set_union_segments``; lowers to a distinct-aggregated semi-join
    (one shuffle on the key), never a cartesian."""
    c = load_table(spark, sf_dir, "customer")
    a = c.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    b = c.filter(F.col("c_acctbal") > 1000).select("c_custkey")
    return a.intersect(b)


@query(
    "set_except_segments",
    oracle="""
        SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        EXCEPT
        SELECT c_custkey FROM customer WHERE c_acctbal > 1000
    """,
    tags=("relational", "setop"),
)
def set_except_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL EXCEPT (distinct): any row appearing in b is fully removed
    from a. ``df.subtract`` has exactly these semantics; the previous
    ``exceptAll().distinct()`` form kept a survivor when a value had
    higher multiplicity in a than b — correct only for unique keys."""
    c = load_table(spark, sf_dir, "customer")
    a = c.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    b = c.filter(F.col("c_acctbal") > 1000).select("c_custkey")
    return a.subtract(b)


@query(
    "distinct_flag_status",
    oracle="SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",
    tags=("relational", "setop", "dedup"),
)
def distinct_flag_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dropDuplicates (R18: the reference's discarded
    ``drop_duplicates(subset='speaker')`` at voice_classifier.py:104,
    here actually applied)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select("l_returnflag", "l_linestatus").dropDuplicates()


@query(
    "sql_frontdoor_revenue",
    oracle="""
        SELECT o_orderpriority,
               COUNT(*)                     AS n_orders,
               ROUND(SUM(o_totalprice), 2)  AS total
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
    """,
    tags=("relational", "sql"),
)
def sql_frontdoor_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The engine's SQL front door: the identical ANSI text the oracle
    runs, executed via ``spark.sql`` over the catalog's temp views —
    same Catalyst plan as the DataFrame form (SQL and DataFrame APIs
    are two parsers over one optimizer)."""
    from big_data_audio_classification_spark.sources.catalog import register_temp_views

    register_temp_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderpriority,
               COUNT(*)                     AS n_orders,
               ROUND(SUM(o_totalprice), 2)  AS total
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
        """
    )


@query(
    "sql_lateral_top_customer",
    oracle="""
        SELECT n.n_name, s.c_name, s.c_acctbal
        FROM nation n, LATERAL (
            SELECT c_name, c_acctbal
            FROM customer
            WHERE c_nationkey = n.n_nationkey
            ORDER BY c_acctbal DESC, c_name
            LIMIT 1
        ) s
    """,
    tags=("relational", "sql", "lateral"),
)
def sql_lateral_top_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery (Spark 4 SQL surface): per nation,
    the single highest-balance customer. The lateral form is the SQL
    users write for per-row "top-N of a related table"; Catalyst
    decorrelates it into the same window/aggregate plan the DataFrame
    top-k-per-group produces — no per-row re-execution, one shuffle
    keyed by the correlation key. Same text runs on DuckDB verbatim."""
    from big_data_audio_classification_spark.sources.catalog import (
        register_temp_views,
    )

    register_temp_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT n.n_name, s.c_name, s.c_acctbal
        FROM nation n, LATERAL (
            SELECT c_name, c_acctbal
            FROM customer
            WHERE c_nationkey = n.n_nationkey
            ORDER BY c_acctbal DESC, c_name
            LIMIT 1
        ) s
        """
    )


@query(
    "sql_recursive_month_rollup",
    oracle="""
        WITH RECURSIVE m(mth) AS (
            SELECT 1
            UNION ALL
            SELECT mth + 1 FROM m WHERE mth < 12
        )
        SELECT m.mth,
               COUNT(o_orderkey)                        AS n_orders,
               ROUND(COALESCE(SUM(o_totalprice), 0), 2) AS total
        FROM m
        LEFT JOIN orders ON EXTRACT(MONTH FROM o_orderdate) = m.mth
        GROUP BY m.mth
        ORDER BY m.mth
    """,
    tags=("relational", "sql", "recursive"),
)
def sql_recursive_month_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE (Spark 4.1 SQL surface): a generated month spine
    LEFT-JOINed to order rollups, so months with zero orders still
    appear — the standard "dense calendar axis" reporting shape. The
    recursion is driver-side tiny (12 rows); the fact-side plan is an
    ordinary pre-aggregated join, so the shape scales like any
    broadcast-dim join. Identical text runs on DuckDB."""
    from big_data_audio_classification_spark.sources.catalog import (
        register_temp_views,
    )

    register_temp_views(spark, sf_dir)
    return spark.sql(
        """
        WITH RECURSIVE m(mth) AS (
            SELECT 1
            UNION ALL
            SELECT mth + 1 FROM m WHERE mth < 12
        )
        SELECT m.mth,
               COUNT(o_orderkey)                        AS n_orders,
               ROUND(COALESCE(SUM(o_totalprice), 0), 2) AS total
        FROM m
        LEFT JOIN orders ON EXTRACT(MONTH FROM o_orderdate) = m.mth
        GROUP BY m.mth
        ORDER BY m.mth
        """
    )


_SQL_EXISTS_CORRELATED = """
    SELECT c.c_custkey,
           c.c_mktsegment,
           (SELECT COUNT(*) FROM orders o
            WHERE o.o_custkey = c.c_custkey)           AS n_orders,
           (SELECT ROUND(MAX(o.o_totalprice), 2) FROM orders o
            WHERE o.o_custkey = c.c_custkey)           AS max_price
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_totalprice >
                        (SELECT AVG(o2.o_totalprice) FROM orders o2))
"""


@query(
    "sql_exists_correlated",
    oracle=_SQL_EXISTS_CORRELATED,
    tags=("relational", "sql", "subquery"),
)
def sql_exists_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated-subquery SQL surface: correlated scalar subqueries
    (COUNT / MAX per outer row) and a correlated EXISTS whose predicate
    nests an uncorrelated scalar aggregate. Catalyst decorrelates all
    three into aggregate-then-join plans — no per-row re-execution, so
    the shape is two keyed joins at any scale, not O(rows) subquery
    runs. Identical text runs on DuckDB."""
    from big_data_audio_classification_spark.sources.catalog import (
        register_temp_views,
    )

    register_temp_views(spark, sf_dir)
    return spark.sql(_SQL_EXISTS_CORRELATED)


@query(
    "sql_pipe_syntax",
    oracle="""
        SELECT o_orderpriority,
               CAST(COUNT(*) AS BIGINT)    AS n,
               ROUND(AVG(o_totalprice), 2) AS avg_price
        FROM orders
        WHERE o_orderstatus = 'F'
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
    """,
    tags=("relational", "sql", "pipe"),
)
def sql_pipe_syntax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 SQL pipe syntax (`|>`): the same logical plan as the
    traditional form, composed as a linear dataflow — parser sugar over
    the identical Catalyst pipeline (the oracle states the traditional
    spelling; both engines agree on the result)."""
    from big_data_audio_classification_spark.sources.catalog import (
        register_temp_views,
    )

    register_temp_views(spark, sf_dir)
    return spark.sql(
        """
        FROM orders
        |> WHERE o_orderstatus = 'F'
        |> AGGREGATE COUNT(*) AS n, ROUND(AVG(o_totalprice), 2) AS avg_price
           GROUP BY o_orderpriority
        |> ORDER BY o_orderpriority
        """
    )


_SQL_GROUP_BY_ALL = """
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_quantity), 2)      AS sum_qty,
           COUNT(*)                       AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY ALL
    ORDER BY ALL
"""


@query(
    "sql_group_by_all",
    oracle=_SQL_GROUP_BY_ALL,
    tags=("relational", "sql", "spark4"),
)
def sql_group_by_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY ALL / ORDER BY ALL (Spark 4 + DuckDB dialect surface):
    the IDENTICAL query text runs on both engines — non-aggregate
    select items become the grouping key, the full select list the
    ordering. Same Catalyst plan as the explicit form."""
    from big_data_audio_classification_spark.sources.catalog import (
        register_temp_views,
    )

    register_temp_views(spark, sf_dir)
    return spark.sql(_SQL_GROUP_BY_ALL)


# exact integer cents: FLOOR of bit-identical doubles is engine-exact,
# while ROUND(x, 2) ties (x.xx5) split between Spark's decimal-string
# HALF_UP and DuckDB's binary rounding
_SQL_LATERAL_ALIAS = """
    SELECT o_orderkey,
           CAST(FLOOR(o_totalprice * 5) AS BIGINT)     AS fee_cents,
           fee_cents * 2                               AS fee_doubled,
           CAST(FLOOR(o_totalprice * 100) AS BIGINT)
               - fee_cents                             AS net_cents
    FROM orders
    WHERE o_orderkey % 100 = 7
"""


@query(
    "sql_lateral_column_alias",
    oracle=_SQL_LATERAL_ALIAS,
    tags=("relational", "sql", "spark4"),
)
def sql_lateral_column_alias(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lateral column aliases (Spark ≥3.4, DuckDB native): a select
    item referencing a sibling alias (`fee_cents * 2`) in the SAME select
    list — identical text on both engines; Catalyst inlines the alias,
    so the plan is a single Project, not nested subqueries."""
    from big_data_audio_classification_spark.sources.catalog import (
        register_temp_views,
    )

    register_temp_views(spark, sf_dir)
    return spark.sql(_SQL_LATERAL_ALIAS)


# Shared verbatim by the Spark front door AND the DuckDB oracle — one
# ANSI text, two engines, hash-identical results.
_RECURSIVE_REACH_SQL = """
        WITH RECURSIVE bounds AS (SELECT MAX(c_custkey) AS nn FROM customer),
        edges AS (
            SELECT c_custkey AS src, 1 + (c_custkey * 48271) % nn AS dst
            FROM customer CROSS JOIN bounds
            WHERE 1 + (c_custkey * 48271) % nn <> c_custkey
            UNION ALL
            SELECT c_custkey, 1 + (c_custkey * 16807) % nn
            FROM customer CROSS JOIN bounds
            WHERE 1 + (c_custkey * 16807) % nn <> c_custkey
        ),
        reach AS (
            SELECT c_custkey AS node, 0 AS hop
            FROM customer WHERE c_custkey <= 3
            UNION ALL
            SELECT e.dst, r.hop + 1
            FROM reach r JOIN edges e ON e.src = r.node
            WHERE r.hop < 4
        )
        SELECT node, CAST(MIN(hop) AS INTEGER) AS min_hop
        FROM reach GROUP BY node
"""


@query(
    "sql_recursive_reachability",
    oracle=_RECURSIVE_REACH_SQL,
    tags=("relational", "sql", "recursive", "graph"),
)
def sql_recursive_reachability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DATA-DRIVEN recursive CTE through the SQL front door (Spark 4.1
    UnionLoop execution): min-hop reachability over the key-derived
    referral graph, the recursion JOINING a real table each step — not
    just a generated spine (cf. sql_recursive_month_rollup). The ONE
    SQL text here is executed verbatim by BOTH engines, so the oracle
    row is a literal same-query cross-engine differential.

    The iterative-DataFrame twin (`graph_khop_reachability`) pins the
    equivalent hand-scheduled plan; this entry proves the declarative
    spelling lands on the same fixpoint. Each recursive step is an
    equi-join on src — the scale shape is one co-located join per hop,
    frontier-bounded."""
    from big_data_audio_classification_spark.sources.catalog import (
        register_temp_views,
    )

    register_temp_views(spark, sf_dir)
    return spark.sql(_RECURSIVE_REACH_SQL)


@query(
    "sql_parameterized_identifier",
    oracle="""
        SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n,
               ROUND(SUM(o_totalprice), 2) AS total
        FROM orders
        WHERE o_totalprice > 100000.0
        GROUP BY o_orderstatus
    """,
    tags=("relational", "sql", "parameterized"),
)
def sql_parameterized_identifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parameterized SQL with the IDENTIFIER() clause (Spark 4 front
    door): the table name binds through ``IDENTIFIER(:tbl)`` and the
    predicate through a typed ``:thresh`` parameter — the
    injection-safe templating surface a query service exposes instead
    of string interpolation. The oracle states the fully-resolved
    query; binding must change nothing about the plan (same pushdown,
    same aggregate)."""
    from big_data_audio_classification_spark.sources.catalog import (
        register_temp_views,
    )

    register_temp_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderstatus, COUNT(*) AS n,
               ROUND(SUM(o_totalprice), 2) AS total
        FROM IDENTIFIER(:tbl)
        WHERE o_totalprice > :thresh
        GROUP BY o_orderstatus
        """,
        args={"tbl": "orders", "thresh": 100000.0},
    )


@query(
    "sql_pivot_clause",
    oracle="""
        SELECT o_orderpriority,
               ROUND(COALESCE(SUM(CASE WHEN o_orderstatus = 'F'
                                       THEN o_totalprice END), 0), 2) AS f_total,
               ROUND(COALESCE(SUM(CASE WHEN o_orderstatus = 'O'
                                       THEN o_totalprice END), 0), 2) AS o_total,
               ROUND(COALESCE(SUM(CASE WHEN o_orderstatus = 'P'
                                       THEN o_totalprice END), 0), 2) AS p_total
        FROM orders
        GROUP BY o_orderpriority
    """,
    tags=("relational", "sql", "pivot", "orders"),
)
def sql_pivot_clause(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SQL PIVOT clause (Spark 4 surface — the declarative sibling
    of the DataFrame ``groupBy().pivot()`` in ``agg_pivot_status``):
    revenue by priority pivoted wide over the three order statuses.
    The oracle states the engine-neutral conditional-aggregation
    desugaring, which is also the PHYSICAL plan Spark compiles PIVOT
    to — one map-side-combined aggregation, no extra shuffle for the
    pivot itself.

    Pivot values are enumerated literally (IN ('F','O','P')): at 100 TB
    an unenumerated pivot would need a distinct-scan planning pass, so
    the explicit list is the scale-safe form."""
    o = load_table(spark, sf_dir, "orders")
    o.createOrReplaceTempView("orders_for_pivot")
    return spark.sql(
        """
        SELECT o_orderpriority,
               ROUND(COALESCE(f_total, 0), 2) AS f_total,
               ROUND(COALESCE(o_total, 0), 2) AS o_total,
               ROUND(COALESCE(p_total, 0), 2) AS p_total
        FROM (
            SELECT o_orderpriority, o_orderstatus, o_totalprice
            FROM orders_for_pivot
        )
        PIVOT (
            SUM(o_totalprice)
            FOR o_orderstatus IN ('F' AS f_total, 'O' AS o_total, 'P' AS p_total)
        )
        """
    )


# --- round-5 carriers: first-time 'asof' and 'range-join' entries ----


@query(
    "join_asof_forward_view",
    oracle="""
        WITH s AS (SELECT event_id AS signup_id, user_id, ts
                   FROM events WHERE event_type = 'signup'),
             v AS (SELECT event_id AS view_id, user_id, ts
                   FROM events WHERE event_type = 'view'),
             j AS (SELECT s.signup_id, s.user_id, v.view_id,
                          v.ts AS view_ts,
                          ROW_NUMBER() OVER (
                              PARTITION BY s.signup_id
                              ORDER BY v.ts ASC, v.view_id ASC) AS rn
                   FROM s LEFT JOIN v
                     ON v.user_id = s.user_id AND v.ts >= s.ts)
        SELECT signup_id, user_id, view_id,
               CAST(view_ts AS VARCHAR) AS view_ts
        FROM j WHERE rn = 1
    """,
    tags=("relational", "join", "asof", "events"),
)
def join_asof_forward_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FORWARD as-of join (pandas ``merge_asof(direction='forward')``):
    the EARLIEST view at or after each signup per user — the activation
    funnel question. Same single-shuffle union + carry plan as the
    backward as-of (``join_asof_purchase_click``) with the window
    running unbounded-FOLLOWING instead of preceding: events of both
    kinds interleave on (user, ts), and ``first_value(view ts)`` over
    the forward frame lands the match without any join explosion."""
    ev = load_table(spark, sf_dir, "events")
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id",
        "ts",
        F.lit(1).alias("is_view"),
        F.col("event_id").alias("view_id_src"),
        F.lit(None).cast("long").alias("signup_id"),
    )
    signups = ev.filter(F.col("event_type") == "signup").select(
        "user_id",
        "ts",
        F.lit(0).alias("is_view"),
        F.lit(None).cast("long").alias("view_id_src"),
        F.col("event_id").alias("signup_id"),
    )
    # Forward frame: at equal ts the view must be visible to the signup
    # (ts >= s.ts is inclusive), so views sort BEFORE signups on ties;
    # among equal-ts views the smallest view_id wins, matching the
    # oracle's (ts ASC, view_id ASC) rank.
    w = (
        Window.partitionBy("user_id")
        .orderBy(
            F.col("ts").asc(), F.col("is_view").desc(), F.col("view_id_src").asc()
        )
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    carried = views.unionByName(signups).select(
        "signup_id",
        "user_id",
        "ts",
        F.first("view_id_src", ignorenulls=True).over(w).alias("view_id"),
        F.first(F.when(F.col("is_view") == 1, F.col("ts")), ignorenulls=True)
        .over(w)
        .alias("view_ts"),
        "is_view",
    )
    return carried.filter(F.col("is_view") == 0).select(
        "signup_id",
        "user_id",
        "view_id",
        F.col("view_ts").cast("string").alias("view_ts"),
    )


RANGE_BUCKET = 10.0  # bucket width for the bucketed points-in-intervals join


@query(
    "join_range_bucketed_points",
    oracle=f"""
        WITH iv AS (
            SELECT event_id % 50 AS iv_id,
                   CAST(event_id % 50 AS DOUBLE) * 2.0       AS lo,
                   CAST(event_id % 50 AS DOUBLE) * 2.0 + 15.0 AS hi
            FROM events GROUP BY event_id % 50
        )
        SELECT iv.iv_id,
               CAST(COUNT(e.event_id) AS BIGINT) AS n_points,
               ROUND(SUM(e.value), 4)            AS sum_value
        FROM iv LEFT JOIN events e
          ON e.value >= iv.lo AND e.value < iv.hi
        GROUP BY iv.iv_id
    """,
    tags=("relational", "join", "range-join", "scale", "events"),
)
def join_range_bucketed_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Points-in-intervals range join in its BUCKETED (100 TB) form:
    quantize the value axis into width-Δ buckets, explode each interval
    onto the buckets it overlaps (bounded: ⌈len/Δ⌉+1 per interval),
    equi-join points on their bucket, then apply the exact [lo, hi)
    predicate as a residual filter. Spark executes a shuffled hash join
    keyed on the bucket — no broadcast-nested-loop (the plain
    non-equi form is ``join_range_bands``). The oracle states the
    SEMANTICS (plain non-equi join); the bucketing is pure plan
    strategy, invisible in the result."""
    ev = load_table(spark, sf_dir, "events")
    iv = (
        ev.select((F.col("event_id") % 50).alias("iv_id"))
        .distinct()
        .select(
            "iv_id",
            (F.col("iv_id").cast("double") * 2.0).alias("lo"),
            (F.col("iv_id").cast("double") * 2.0 + 15.0).alias("hi"),
        )
    )
    # interval → overlapped buckets (sequence is bounded by ⌈15/Δ⌉+1)
    iv_b = iv.select(
        "iv_id",
        "lo",
        "hi",
        F.explode(
            F.sequence(
                F.floor(F.col("lo") / RANGE_BUCKET),
                F.floor(F.col("hi") / RANGE_BUCKET),
            )
        ).alias("bucket"),
    )
    pts = ev.select(
        "event_id", "value", F.floor(F.col("value") / RANGE_BUCKET).alias("bucket")
    )
    hits = (
        iv_b.join(pts, "bucket")
        .filter((F.col("value") >= F.col("lo")) & (F.col("value") < F.col("hi")))
        .groupBy("iv_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_points"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
    )
    return (
        iv.select("iv_id")
        .join(hits, "iv_id", "left")
        .select(
            "iv_id",
            F.coalesce("n_points", F.lit(0).cast("bigint")).alias("n_points"),
            "sum_value",
        )
    )


# --- round-6 carriers: first-time 'asof' and 'range-join' entries ----

ASOF_TOL_S = 600  # nearest-match tolerance (seconds)


@query(
    "join_asof_nearest_tolerance",
    oracle=f"""
        WITH p AS (SELECT event_id AS purchase_id, user_id, ts
                   FROM events WHERE event_type = 'purchase'),
             c AS (SELECT event_id AS cid, user_id, ts
                   FROM events WHERE event_type = 'click'),
             j AS (SELECT p.purchase_id, p.user_id, c.cid,
                          c.ts AS cts,
                          ABS(epoch_us(c.ts) - epoch_us(p.ts)) AS adiff,
                          ROW_NUMBER() OVER (
                              PARTITION BY p.purchase_id
                              ORDER BY (c.cid IS NULL),
                                       ABS(epoch_us(c.ts) - epoch_us(p.ts)),
                                       c.ts ASC, c.cid ASC) AS rn
                   FROM p LEFT JOIN c
                     ON c.user_id = p.user_id
                    AND ABS(epoch_us(c.ts) - epoch_us(p.ts))
                        <= {ASOF_TOL_S} * 1000000)
        SELECT purchase_id, user_id,
               cid                     AS click_id,
               CAST(cts AS VARCHAR)    AS click_ts,
               CAST(adiff AS BIGINT)   AS diff_us
        FROM j WHERE rn = 1
    """,
    tags=("relational", "join", "asof", "events"),
)
def join_asof_nearest_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEAREST as-of join with tolerance (pandas ``merge_asof(
    direction='nearest', tolerance=...)``): the click closest in time to
    each purchase by the same user, within ±10 min, ties to the EARLIER
    click then the smaller click_id. Completes the as-of triptych
    (backward ``join_asof_purchase_click``, forward
    ``join_asof_forward_view``).

    Plan: the oracle's abs-diff rank needs a time-banded join; the
    Spark side instead runs the single-shuffle union + TWO window
    passes — a backward pass (clicks sort before same-ts purchases,
    click_id DESC so ``last`` lands the smallest id) carries the latest
    click at-or-before, a forward pass carries the earliest click
    at-or-after — then one CASE picks the nearer in-tolerance side.
    No join explosion: each purchase reads exactly two candidates."""
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        "ts",
        F.lit(1).alias("is_click"),
        F.col("event_id").alias("cid_src"),
        F.lit(None).cast("long").alias("purchase_id"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        F.lit(0).alias("is_click"),
        F.lit(None).cast("long").alias("cid_src"),
        F.col("event_id").alias("purchase_id"),
    )
    u = clicks.unionByName(purchases)
    wb = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("is_click").desc(),
                 F.col("cid_src").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("is_click").asc(),
                 F.col("cid_src").asc())
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    click_ts = F.when(F.col("is_click") == 1, F.col("ts"))
    carried = u.select(
        "purchase_id",
        "user_id",
        "ts",
        "is_click",
        F.last("cid_src", ignorenulls=True).over(wb).alias("prev_id"),
        F.last(click_ts, ignorenulls=True).over(wb).alias("prev_ts"),
        F.first("cid_src", ignorenulls=True).over(wf).alias("next_id"),
        F.first(click_ts, ignorenulls=True).over(wf).alias("next_ts"),
    ).filter(F.col("is_click") == 0)
    tol_us = ASOF_TOL_S * 1_000_000
    pd_us = F.unix_micros("ts") - F.unix_micros("prev_ts")
    nd_us = F.unix_micros("next_ts") - F.unix_micros("ts")
    prev_ok = F.col("prev_ts").isNotNull() & (pd_us <= tol_us)
    next_ok = F.col("next_ts").isNotNull() & (nd_us <= tol_us)
    take_prev = prev_ok & (~next_ok | (pd_us <= nd_us))
    take_next = next_ok & ~take_prev
    return carried.select(
        "purchase_id",
        "user_id",
        F.when(take_prev, F.col("prev_id"))
        .when(take_next, F.col("next_id"))
        .alias("click_id"),
        F.when(take_prev, F.col("prev_ts"))
        .when(take_next, F.col("next_ts"))
        .cast("string")
        .alias("click_ts"),
        F.when(take_prev, pd_us)
        .when(take_next, nd_us)
        .cast("bigint")
        .alias("diff_us"),
    )


ORDER_ACTIVE_DAYS = 7  # each order is "active" for 7 days from order date


@query(
    "join_range_month_overlap",
    oracle=f"""
        WITH months AS (
            SELECT DISTINCT date_trunc('month', o_orderdate) AS m
            FROM orders
        ),
        ov AS (
            SELECT months.m,
                   o.o_orderkey,
                   epoch_us(LEAST(months.m + INTERVAL 1 MONTH,
                                  o.o_orderdate
                                  + INTERVAL {ORDER_ACTIVE_DAYS} DAY))
                   - epoch_us(GREATEST(months.m, o.o_orderdate)) AS ov_us
            FROM months JOIN orders o
              ON o.o_orderdate < months.m + INTERVAL 1 MONTH
             AND o.o_orderdate + INTERVAL {ORDER_ACTIVE_DAYS} DAY > months.m
        )
        SELECT CAST(m AS VARCHAR)                        AS month_start,
               CAST(COUNT(*) AS BIGINT)                  AS n_orders,
               CAST(SUM(ov_us) // 3600000000 AS BIGINT)  AS overlap_hours
        FROM ov GROUP BY m
    """,
    tags=("relational", "join", "range-join", "window-time", "orders"),
)
def join_range_month_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval×calendar OVERLAP-LENGTH range join: each order is
    active for 7 days; per calendar month, how many active intervals
    overlap it and for how many total hours — the resource-occupancy
    rollup. The oracle states it as a raw range join; the Spark plan is
    the 100 TB BUCKETED form: an order's 7-day interval spans at most 2
    month buckets, so ``explode(sequence(month(start), month(end-1us)))``
    emits ≤2 candidate rows per order and the join is a pure EQUI-join
    on the month bucket (shuffle-hash, AQE-splittable) — no
    non-equi-condition nested loop anywhere. Sibling of
    ``join_range_bucketed_points`` (value-bucketed; certified r05),
    this is the time-bucketed variant."""
    # o_orderdate arrives TIMESTAMP_NTZ; integer epoch math needs the
    # session-UTC TIMESTAMP form (same normalization load_table applies
    # to events.ts).
    o = load_table(spark, sf_dir, "orders").withColumn(
        "odate", F.col("o_orderdate").cast("timestamp")
    )
    end_ts = F.timestamp_micros(
        F.unix_micros("odate") + ORDER_ACTIVE_DAYS * 86_400_000_000
    )
    months = o.select(
        F.date_trunc("month", "odate").alias("m")
    ).distinct()
    cand = o.select(
        "o_orderkey",
        "odate",
        end_ts.alias("end_ts"),
        F.explode(
            F.sequence(
                F.date_trunc("month", "odate"),
                F.date_trunc(
                    "month",
                    F.timestamp_micros(F.unix_micros(end_ts) - 1),
                ),
                F.expr("INTERVAL 1 MONTH"),
            )
        ).alias("m"),
    )
    ov_us = F.least(
        F.unix_micros(F.col("m") + F.expr("INTERVAL 1 MONTH")),
        F.unix_micros("end_ts"),
    ) - F.greatest(F.unix_micros("m"), F.unix_micros("odate"))
    return (
        cand.join(months, "m")
        .select("m", ov_us.alias("ov_us"))
        .filter(F.col("ov_us") > 0)
        .groupBy("m")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            # exact integer floor-division mirroring the oracle's `//` —
            # Spark `/` is double math and only stays exact here while
            # every boundary is midnight-aligned (advice r06)
            F.expr("SUM(ov_us) DIV 3600000000")
            .cast("bigint")
            .alias("overlap_hours"),
        )
        .select(
            F.date_format("m", "yyyy-MM-dd").alias("month_start"),
            "n_orders",
            "overlap_hours",
        )
    )


# --- round-7 spare carriers: asof / setop / grouping / range-join ----

LOCF_GRID_HOURS = 6  # grid step for the carry-forward alignment


@query(
    "join_asof_locf_grid",
    oracle=f"""
        WITH grid AS (
            SELECT u.user_id, g.gts
            FROM (SELECT DISTINCT user_id FROM events) u,
                 (SELECT UNNEST(generate_series(
                      TIMESTAMP '2024-01-01 00:00:00',
                      TIMESTAMP '2024-01-30 18:00:00',
                      INTERVAL {LOCF_GRID_HOURS} HOUR)) AS gts) g
        ),
        j AS (
            SELECT grid.user_id, grid.gts, e.value, e.ts, e.event_id,
                   ROW_NUMBER() OVER (
                       PARTITION BY grid.user_id, grid.gts
                       ORDER BY (e.event_id IS NULL),
                                e.ts DESC, e.event_id DESC) AS rn
            FROM grid LEFT JOIN events e
              ON e.user_id = grid.user_id AND e.ts <= grid.gts
        )
        SELECT user_id,
               CAST(gts AS VARCHAR)     AS grid_ts,
               ROUND(value, 4)          AS locf_value,
               event_id                 AS src_event_id
        FROM j WHERE rn = 1
    """,
    tags=("relational", "join", "asof", "events", "window-time"),
)
def join_asof_locf_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-observation-carried-forward GRID ALIGNMENT — the as-of
    join that turns an irregular event stream into a regular 6-hour
    panel (the feature-store snapshot shape). The oracle states it as
    a banded left join + rank; the Spark side runs the single-shuffle
    union + carry: grid rows and events interleave on (user, ts), one
    unbounded-PRECEDING window carries the latest event value/id onto
    every grid row (events sort before grid points at equal ts, and
    among equal-ts events the larger event_id wins, matching the
    oracle's ts DESC, event_id DESC rank). Completes the as-of family
    (backward / forward / nearest / grid).

    Scale: the grid is |users| × |grid points| rows — a constant per
    user — and the carry is the same one-shuffle window as every other
    as-of here; no time-banded join ever forms."""
    ev = load_table(spark, sf_dir, "events")
    users = ev.select("user_id").distinct()
    grid_pts = spark.sql(
        f"""SELECT explode(sequence(
                TIMESTAMP '2024-01-01 00:00:00',
                TIMESTAMP '2024-01-30 18:00:00',
                INTERVAL {LOCF_GRID_HOURS} HOURS)) AS gts"""
    )
    grid = users.crossJoin(F.broadcast(grid_pts)).select(
        "user_id",
        F.col("gts").alias("ts"),
        F.lit(0).alias("is_event"),
        F.lit(None).cast("double").alias("value_src"),
        F.lit(None).cast("long").alias("event_id_src"),
    )
    evs = ev.select(
        "user_id",
        "ts",
        F.lit(1).alias("is_event"),
        F.col("value").alias("value_src"),
        F.col("event_id").alias("event_id_src"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("is_event").desc(),
                 F.col("event_id_src").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = evs.unionByName(grid).select(
        "user_id",
        "ts",
        "is_event",
        F.last("value_src", ignorenulls=True).over(w).alias("locf_value"),
        F.last("event_id_src", ignorenulls=True).over(w).alias("src_event_id"),
    )
    return carried.filter(F.col("is_event") == 0).select(
        "user_id",
        F.col("ts").cast("string").alias("grid_ts"),
        F.round("locf_value", 4).alias("locf_value"),
        "src_event_id",
    )


@query(
    "set_symdiff_active_customers",
    oracle="""
        WITH y95 AS (SELECT DISTINCT o_custkey FROM orders
                     WHERE o_orderdate >= TIMESTAMP '1995-01-01'
                       AND o_orderdate <  TIMESTAMP '1996-01-01'),
             y98 AS (SELECT DISTINCT o_custkey FROM orders
                     WHERE o_orderdate >= TIMESTAMP '1998-01-01'
                       AND o_orderdate <  TIMESTAMP '1999-01-01')
        SELECT 'only_1995' AS cohort, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(MIN(o_custkey) AS BIGINT) AS min_key
        FROM (SELECT o_custkey FROM y95 EXCEPT SELECT o_custkey FROM y98)
        UNION ALL
        SELECT 'only_1998', CAST(COUNT(*) AS BIGINT),
               CAST(MIN(o_custkey) AS BIGINT)
        FROM (SELECT o_custkey FROM y98 EXCEPT SELECT o_custkey FROM y95)
        UNION ALL
        SELECT 'both', CAST(COUNT(*) AS BIGINT),
               CAST(MIN(o_custkey) AS BIGINT)
        FROM (SELECT o_custkey FROM y95 INTERSECT SELECT o_custkey FROM y98)
    """,
    tags=("relational", "setop", "orders"),
)
def set_symdiff_active_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort SYMMETRIC DIFFERENCE via set operators: customers active
    only in 1995, only in 1998, and in both — churn/retention triage
    as EXCEPT / INTERSECT (the distinct-set forms; the ALL-multiset
    forms live in ``set_except_intersect_all``). Each leg is one
    distinct-aggregate + hash set-op — no join explosion — and the
    3-row rollup makes the output scale-free."""
    o = load_table(spark, sf_dir, "orders").withColumn(
        "odate", F.col("o_orderdate").cast("timestamp")
    )
    y95 = o.filter(
        (F.col("odate") >= "1995-01-01") & (F.col("odate") < "1996-01-01")
    ).select("o_custkey").distinct()
    y98 = o.filter(
        (F.col("odate") >= "1998-01-01") & (F.col("odate") < "1999-01-01")
    ).select("o_custkey").distinct()

    def leg(name, df):
        return df.agg(
            F.lit(name).alias("cohort"),
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.min("o_custkey").cast("bigint").alias("min_key"),
        )

    return (
        leg("only_1995", y95.exceptAll(y98).distinct())
        .unionByName(leg("only_1998", y98.exceptAll(y95).distinct()))
        .unionByName(leg("both", y95.intersect(y98)))
    )


@query(
    "agg_groupingsets_mixed",
    oracle="""
        SELECT COALESCE(o_orderstatus, '<all>')    AS status,
               COALESCE(o_orderpriority, '<all>')  AS priority,
               CAST(GROUPING(o_orderstatus) * 2
                    + GROUPING(o_orderpriority) AS BIGINT) AS gid,
               CAST(COUNT(*) AS BIGINT)            AS n,
               ROUND(SUM(o_totalprice), 2)         AS total
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
                                (o_orderpriority), ())
    """,
    tags=("aggregate", "grouping", "orders"),
)
def agg_groupingsets_mixed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS with a NON-LATTICE selection — the
    fine-cell, one marginal, and grand total, deliberately skipping
    the (status) marginal that CUBE would emit — the report shape
    where each level is chosen, not derived. grouping_id disambiguates
    the '<all>' placeholder from a genuine value. One pass over the
    fact table (Spark expands sets map-side, same as the oracle)."""
    o = load_table(spark, sf_dir, "orders")
    o.createOrReplaceTempView("orders_gsets_in")
    return spark.sql(
        """
        SELECT COALESCE(o_orderstatus, '<all>')    AS status,
               COALESCE(o_orderpriority, '<all>')  AS priority,
               CAST(grouping_id() AS BIGINT)       AS gid,
               CAST(COUNT(*) AS BIGINT)            AS n,
               ROUND(SUM(o_totalprice), 2)         AS total
        FROM orders_gsets_in
        GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
                                (o_orderpriority), ())
        """
    )


OVD_ACTIVE_DAYS = 7  # interval length for the overlap-degree profile


@query(
    "join_range_overlap_degree",
    oracle=f"""
        WITH iv AS (
            SELECT o_orderkey AS k, o_orderdate AS s,
                   o_orderdate + INTERVAL {OVD_ACTIVE_DAYS} DAY AS e
            FROM orders WHERE o_orderkey % 20 = 0
        ),
        deg AS (
            SELECT a.k, COUNT(b.k) AS degree
            FROM iv a LEFT JOIN iv b
              ON a.k <> b.k AND a.s < b.e AND b.s < a.e
            GROUP BY a.k
        )
        SELECT CAST(degree AS BIGINT)      AS degree,
               CAST(COUNT(*) AS BIGINT)    AS n_intervals
        FROM deg GROUP BY degree
    """,
    tags=("relational", "join", "range-join", "orders"),
)
def join_range_overlap_degree(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval OVERLAP-DEGREE profile: for each (sampled) order's
    7-day interval, how many sibling intervals overlap it, rolled into
    a degree histogram — the concurrency/occupancy distribution. The
    oracle states the raw self range-join; Spark runs the BUCKETED
    form: each interval explodes to its ≤2 month buckets, candidates
    pair within a bucket (equi-join), the exact overlap predicate
    prunes, and DISTINCT collapses pairs seen in both buckets. The
    histogram output is O(max degree) rows at any SF."""
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderkey") % 20 == 0
    ).withColumn("odate", F.col("o_orderdate").cast("timestamp"))
    iv = o.select(
        F.col("o_orderkey").alias("k"),
        F.unix_micros("odate").alias("s"),
        (F.unix_micros("odate") + OVD_ACTIVE_DAYS * 86_400_000_000).alias("e"),
    )
    cand = iv.select(
        "k", "s", "e",
        F.explode(
            F.sequence(
                F.date_trunc("month", F.timestamp_micros("s")),
                F.date_trunc("month", F.timestamp_micros(F.col("e") - 1)),
            )
        ).alias("m"),
    )
    a, b = cand.alias("a"), cand.alias("b")
    overl = (
        a.join(
            b,
            (F.col("a.m") == F.col("b.m"))
            & (F.col("a.k") != F.col("b.k"))
            & (F.col("a.s") < F.col("b.e"))
            & (F.col("b.s") < F.col("a.e")),
        )
        .select(F.col("a.k").alias("k"), F.col("b.k").alias("kb"))
        .distinct()
    )
    deg = (
        iv.join(overl, "k", "left")
        .groupBy("k")
        .agg(F.count("kb").alias("degree"))
    )
    return deg.groupBy(F.col("degree").cast("bigint").alias("degree")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_intervals")
    )


# --- round-8 spare tranche: asof / setop / grouping / range-join -------

ASOF_LOOKBACK_S = 900  # backward-only tolerance (15 min)


@query(
    "join_asof_backward_tolerance",
    oracle=f"""
        WITH p AS (SELECT event_id AS purchase_id, user_id, ts
                   FROM events WHERE event_type = 'purchase'),
             c AS (SELECT event_id AS cid, user_id, ts
                   FROM events WHERE event_type = 'click'),
             j AS (SELECT p.purchase_id, p.user_id, c.cid, c.ts AS cts,
                          ROW_NUMBER() OVER (
                              PARTITION BY p.purchase_id
                              ORDER BY (c.cid IS NULL),
                                       c.ts DESC, c.cid ASC) AS rn
                   FROM p LEFT JOIN c
                     ON c.user_id = p.user_id
                    AND c.ts <= p.ts
                    AND epoch_us(p.ts) - epoch_us(c.ts)
                        <= {ASOF_LOOKBACK_S} * 1000000)
        SELECT purchase_id, user_id,
               cid                   AS click_id,
               CAST(cts AS VARCHAR)  AS click_ts,
               cid IS NOT NULL       AS attributed
        FROM j WHERE rn = 1
    """,
    tags=("relational", "join", "asof", "events"),
)
def join_asof_backward_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backward as-of with a BOUNDED LOOKBACK (pandas
    ``merge_asof(direction='backward', tolerance=15min)``): the latest
    click at-or-before each purchase, but only if it happened within
    the attribution window — stale matches become NULL instead of
    leaking credit. Same single-shuffle union + backward carry as the
    unbounded form (``join_asof_purchase_click``), with the tolerance
    applied as a post-carry predicate — the carry itself never widens,
    so bounding the lookback costs zero extra plan. Among equal-ts
    clicks the smallest click_id wins (click_id DESC in the carry
    order, matching the oracle's ts DESC, cid ASC rank)."""
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts",
        F.lit(1).alias("is_click"),
        F.col("event_id").alias("cid_src"),
        F.lit(None).cast("long").alias("purchase_id"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts",
        F.lit(0).alias("is_click"),
        F.lit(None).cast("long").alias("cid_src"),
        F.col("event_id").alias("purchase_id"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("is_click").desc(),
                 F.col("cid_src").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    click_ts = F.when(F.col("is_click") == 1, F.col("ts"))
    carried = clicks.unionByName(purchases).select(
        "purchase_id", "user_id", "ts", "is_click",
        F.last("cid_src", ignorenulls=True).over(w).alias("prev_id"),
        F.last(click_ts, ignorenulls=True).over(w).alias("prev_ts"),
    ).filter(F.col("is_click") == 0)
    fresh = (
        F.col("prev_ts").isNotNull()
        & (
            F.unix_micros("ts") - F.unix_micros("prev_ts")
            <= ASOF_LOOKBACK_S * 1_000_000
        )
    )
    return carried.select(
        "purchase_id",
        "user_id",
        F.when(fresh, F.col("prev_id")).alias("click_id"),
        F.when(fresh, F.col("prev_ts")).cast("string").alias("click_ts"),
        fresh.alias("attributed"),
    )


@query(
    "set_union_vs_union_all",
    oracle="""
        WITH u_all AS (
            SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
            UNION ALL
            SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
        ),
        u_dist AS (SELECT DISTINCT o_custkey FROM u_all)
        SELECT CAST((SELECT COUNT(*) FROM u_all) AS BIGINT)   AS n_union_all,
               CAST((SELECT COUNT(*) FROM u_dist) AS BIGINT)  AS n_union_distinct,
               CAST((SELECT COUNT(*) FROM u_all)
                    - (SELECT COUNT(*) FROM u_dist) AS BIGINT) AS n_duplicates
    """,
    tags=("relational", "setop", "orders"),
)
def set_union_vs_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION vs UNION ALL semantics, measured: the multiset size, the
    distinct size, and the duplicate mass their difference exposes —
    the dedup-cost census every pipeline wants before choosing the
    operator (``union`` in Spark = UNION ALL; ``distinct()`` is the
    extra shuffle). One pass builds the multiset; the distinct leg is
    the only shuffle; output is one scale-free row."""
    o = load_table(spark, sf_dir, "orders")
    u_all = o.filter(F.col("o_orderstatus") == "F").select(
        "o_custkey"
    ).unionAll(
        o.filter(F.col("o_orderpriority") == "1-URGENT").select("o_custkey")
    )
    n_all = u_all.agg(F.count(F.lit(1)).cast("bigint").alias("n_union_all"))
    n_dist = u_all.distinct().agg(
        F.count(F.lit(1)).cast("bigint").alias("n_union_distinct")
    )
    return (
        n_all.crossJoin(F.broadcast(n_dist))
        .select(
            "n_union_all",
            "n_union_distinct",
            (F.col("n_union_all") - F.col("n_union_distinct"))
            .cast("bigint")
            .alias("n_duplicates"),
        )
    )


@query(
    "agg_rollup_time_hierarchy",
    oracle="""
        SELECT COALESCE(CAST(yr AS VARCHAR), '<all>')  AS year,
               COALESCE(CAST(qtr AS VARCHAR), '<all>') AS quarter,
               CAST(GROUPING(yr) * 2 + GROUPING(qtr) AS BIGINT) AS gid,
               CAST(COUNT(*) AS BIGINT)                AS n,
               ROUND(CAST(SUM(cents) AS DOUBLE) / 100.0, 2) AS total
        FROM (SELECT year(o_orderdate) AS yr,
                     quarter(o_orderdate) AS qtr,
                     CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
              FROM orders)
        GROUP BY ROLLUP (yr, qtr)
    """,
    tags=("aggregate", "grouping", "window-time", "orders"),
)
def agg_rollup_time_hierarchy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP over the natural TIME hierarchy (year ⊃ quarter): the
    fiscal drill-down report in one pass — (year, quarter) cells, year
    subtotals, grand total — with grouping_id disambiguating the
    '<all>' placeholder (lattice sibling: ``agg_cube_share_of_total``;
    non-lattice: ``agg_groupingsets_mixed``). Hierarchical rollups are
    the cheap grouping-sets case: each level nests, so map-side
    partials combine across levels. Totals accumulate EXACT cents
    (DECIMAL(38,0)/HUGEINT — the grand-total cell spans the whole
    table, exactly where a float SUM's combine order varies with
    shuffle arrival and can flip a ROUND boundary, the flake class
    the r10-continuation sweep caught live in
    ``analytics_abc_pareto``); the only float is the final /100
    display division."""
    o = load_table(spark, sf_dir, "orders").select(
        F.year(F.col("o_orderdate").cast("timestamp")).alias("yr"),
        F.quarter(F.col("o_orderdate").cast("timestamp")).alias("qtr"),
        F.round(F.col("o_totalprice") * 100)
        .cast("bigint")
        .cast("decimal(38,0)")
        .alias("cents"),
    )
    return (
        o.rollup("yr", "qtr")
        .agg(
            F.grouping_id().cast("bigint").alias("gid"),
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.round(F.sum("cents").cast("double") / 100.0, 2).alias("total"),
        )
        .select(
            F.coalesce(F.col("yr").cast("string"), F.lit("<all>")).alias(
                "year"
            ),
            F.coalesce(F.col("qtr").cast("string"), F.lit("<all>")).alias(
                "quarter"
            ),
            "gid",
            "n",
            "total",
        )
    )


@query(
    "join_range_log_bands_overlap",
    oracle="""
        WITH bands AS (
            SELECT b.b AS band_id,
                   POW(2.0, b.b)     AS lo,
                   POW(2.0, b.b + 2) AS hi
            FROM (SELECT UNNEST(range(9, 18)) AS b) b
        )
        SELECT band_id,
               CAST(COUNT(o.o_orderkey) AS BIGINT) AS n_orders,
               ROUND(SUM(o.o_totalprice), 2)       AS total_in_band
        FROM bands LEFT JOIN orders o
          ON o.o_totalprice >= bands.lo AND o.o_totalprice < bands.hi
        GROUP BY band_id
    """,
    tags=("relational", "join", "range-join", "orders"),
)
def join_range_log_bands_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OVERLAPPING log-scale band join: each band spans two octaves
    ([2^b, 2^(b+2))), so every value lands in exactly two bands — a
    genuine interval join, not a disguised group-by. Spark runs the
    bucketed form: a value's candidate bands are floor(log2(v)) and
    floor(log2(v))−1 (derived map-side, 2 rows per order), joined to
    the 9-row band dim by EQUALITY with the exact predicate as the
    residual — no non-equi nested loop at any scale (linear-band
    sibling: ``join_range_bands``, broadcast non-equi, certified r01)."""
    o = load_table(spark, sf_dir, "orders")
    bands = spark.range(9, 18).select(
        F.col("id").cast("int").alias("band_id"),
        F.pow(F.lit(2.0), F.col("id")).alias("lo"),
        F.pow(F.lit(2.0), F.col("id") + 2).alias("hi"),
    )
    lg = F.floor(F.log2("o_totalprice")).cast("int")
    cand = o.select(
        "o_orderkey", "o_totalprice",
        F.explode(F.array(lg, lg - 1)).alias("band_id"),
    )
    hits = cand.join(F.broadcast(bands), "band_id").filter(
        (F.col("o_totalprice") >= F.col("lo"))
        & (F.col("o_totalprice") < F.col("hi"))
    )
    return (
        bands.join(hits.select("band_id", "o_orderkey", "o_totalprice"),
                   "band_id", "left")
        .groupBy("band_id")
        .agg(
            F.count("o_orderkey").cast("bigint").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_in_band"),
        )
    )
