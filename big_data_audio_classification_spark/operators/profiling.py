"""Data-profiling operators: per-column quality summary and numeric
histograms — the checks every ingestion pipeline runs before admitting a
new snapshot (null drift, cardinality drift, range drift, distribution
shape).

Scale notes:
* The column profile is ONE aggregation pass over the table — every
  per-column statistic is a separate aggregate expression in the same
  ``agg()``, so Spark computes all of them in a single scan with
  map-side partial aggregation; the row-per-column layout is a
  driver-free ``stack`` unpivot of that one aggregate row. The exact
  ``countDistinct`` per column is the oracle-checkable form; at 100 TB
  swap in ``approx_count_distinct`` (same plan shape, sketch state).
* The histogram is a map-only bucket assignment + one keyed count —
  fixed bounds make it a single pass (data-dependent bounds need the
  two-pass min/max -> bucket form, same as power_to_db's global-max
  pattern in operators/audio.py).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from big_data_audio_classification_spark.registry import query
from big_data_audio_classification_spark.sources.catalog import load_table

HIST_WIDTH = 50_000.0  # o_totalprice bucket width
HIST_MAX_BUCKET = 11  # values past the last edge clamp into it


@query(
    "profile_orders_columns",
    oracle="""
        SELECT 'o_orderkey' AS col_name,
               CAST(SUM(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
               COUNT(DISTINCT o_orderkey) AS n_distinct,
               CAST(MIN(o_orderkey) AS DOUBLE) AS min_num,
               CAST(MAX(o_orderkey) AS DOUBLE) AS max_num
        FROM orders
        UNION ALL
        SELECT 'o_custkey',
               CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
               COUNT(DISTINCT o_custkey),
               CAST(MIN(o_custkey) AS DOUBLE),
               CAST(MAX(o_custkey) AS DOUBLE)
        FROM orders
        UNION ALL
        SELECT 'o_totalprice',
               CAST(SUM(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END) AS BIGINT),
               COUNT(DISTINCT o_totalprice),
               ROUND(CAST(MIN(o_totalprice) AS DOUBLE), 2),
               ROUND(CAST(MAX(o_totalprice) AS DOUBLE), 2)
        FROM orders
        UNION ALL
        SELECT 'o_orderdate',
               CAST(SUM(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END) AS BIGINT),
               COUNT(DISTINCT o_orderdate),
               CAST(epoch(MIN(o_orderdate)) AS DOUBLE),
               CAST(epoch(MAX(o_orderdate)) AS DOUBLE)
        FROM orders
        UNION ALL
        SELECT 'o_orderpriority',
               CAST(SUM(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END) AS BIGINT),
               COUNT(DISTINCT o_orderpriority),
               NULL, NULL
        FROM orders
        UNION ALL
        SELECT 'o_orderstatus',
               CAST(SUM(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) AS BIGINT),
               COUNT(DISTINCT o_orderstatus),
               NULL, NULL
        FROM orders
        ORDER BY col_name
    """,
    tags=("profiling", "quality", "orders"),
)
def profile_orders_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-column quality profile of ``orders`` — null count, exact
    distinct count, numeric/date min-max — computed in ONE scan: every
    statistic is an aggregate expression in a single ``agg``, and the
    row-per-column layout falls out of a ``stack`` unpivot of the lone
    aggregate row (no driver loop, no second pass)."""
    o = load_table(spark, sf_dir, "orders")

    def nulls(c: str):
        return F.sum(F.col(c).isNull().cast("long")).alias(f"{c}_nulls")

    agged = o.agg(
        *[nulls(c) for c in (
            "o_orderkey", "o_custkey", "o_totalprice",
            "o_orderdate", "o_orderpriority", "o_orderstatus",
        )],
        F.countDistinct("o_orderkey").alias("o_orderkey_nd"),
        F.countDistinct("o_custkey").alias("o_custkey_nd"),
        F.countDistinct("o_totalprice").alias("o_totalprice_nd"),
        F.countDistinct("o_orderdate").alias("o_orderdate_nd"),
        F.countDistinct("o_orderpriority").alias("o_orderpriority_nd"),
        F.countDistinct("o_orderstatus").alias("o_orderstatus_nd"),
        F.min("o_orderkey").cast("double").alias("o_orderkey_min"),
        F.max("o_orderkey").cast("double").alias("o_orderkey_max"),
        F.min("o_custkey").cast("double").alias("o_custkey_min"),
        F.max("o_custkey").cast("double").alias("o_custkey_max"),
        F.round(F.min("o_totalprice").cast("double"), 2).alias("o_totalprice_min"),
        F.round(F.max("o_totalprice").cast("double"), 2).alias("o_totalprice_max"),
        F.unix_timestamp(F.min("o_orderdate")).cast("double").alias("o_orderdate_min"),
        F.unix_timestamp(F.max("o_orderdate")).cast("double").alias("o_orderdate_max"),
    )
    return agged.selectExpr(
        """stack(6,
            'o_orderkey', o_orderkey_nulls, o_orderkey_nd,
                o_orderkey_min, o_orderkey_max,
            'o_custkey', o_custkey_nulls, o_custkey_nd,
                o_custkey_min, o_custkey_max,
            'o_orderdate', o_orderdate_nulls, o_orderdate_nd,
                o_orderdate_min, o_orderdate_max,
            'o_orderpriority', o_orderpriority_nulls, o_orderpriority_nd,
                CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
            'o_orderstatus', o_orderstatus_nulls, o_orderstatus_nd,
                CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
            'o_totalprice', o_totalprice_nulls, o_totalprice_nd,
                o_totalprice_min, o_totalprice_max
        ) AS (col_name, n_nulls, n_distinct, min_num, max_num)"""
    ).orderBy("col_name")


@query(
    "profile_price_histogram",
    oracle=f"""
        SELECT LEAST(CAST(FLOOR(o_totalprice / {HIST_WIDTH}) AS BIGINT),
                     {HIST_MAX_BUCKET}) AS bucket,
               LEAST(CAST(FLOOR(o_totalprice / {HIST_WIDTH}) AS BIGINT),
                     {HIST_MAX_BUCKET}) * {HIST_WIDTH} AS lo,
               COUNT(*) AS n
        FROM orders
        GROUP BY 1, 2
        ORDER BY bucket
    """,
    tags=("profiling", "quality", "orders"),
)
def profile_price_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram of ``o_totalprice`` (width {HIST_WIDTH},
    overflow clamped into the top bucket): bucket assignment is a pure
    projection, so the whole histogram is a map-side-combined count —
    one scan, one tiny shuffle of at most n_buckets rows per task."""
    o = load_table(spark, sf_dir, "orders")
    bucket = F.least(
        F.floor(F.col("o_totalprice") / HIST_WIDTH), F.lit(HIST_MAX_BUCKET)
    ).cast("bigint")
    return (
        o.select(bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n"))
        .select("bucket", (F.col("bucket") * HIST_WIDTH).alias("lo"), "n")
        .orderBy("bucket")
    )


@query(
    "profile_column_entropy",
    oracle="""
        WITH c AS (
            SELECT col, v, COUNT(*) AS n
            FROM (
                SELECT 'o_orderstatus' AS col, o_orderstatus AS v FROM orders
                UNION ALL
                SELECT 'o_orderpriority', o_orderpriority FROM orders
                UNION ALL
                SELECT 'status_priority',
                       o_orderstatus || '|' || o_orderpriority FROM orders
            ) GROUP BY col, v
        ),
        t AS (SELECT col, SUM(n) AS tot, COUNT(*) AS n_distinct
              FROM c GROUP BY col)
        SELECT c.col,
               CAST(MAX(t.n_distinct) AS BIGINT) AS n_distinct,
               ROUND(-SUM((CAST(c.n AS DOUBLE) / t.tot)
                          * log2(CAST(c.n AS DOUBLE) / t.tot)), 6)
                   AS entropy_bits,
               ROUND(-SUM((CAST(c.n AS DOUBLE) / t.tot)
                          * log2(CAST(c.n AS DOUBLE) / t.tot))
                     / log2(CAST(MAX(t.n_distinct) AS DOUBLE)), 6)
                   AS normalized
        FROM c JOIN t ON c.col = t.col
        GROUP BY c.col
    """,
    tags=("profiling", "entropy", "orders"),
)
def profile_column_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy per categorical column (plus the joint column,
    so entropy_bits(joint) vs the marginals reads off the dependence) —
    the information-theoretic complement of null/distinct profiling,
    and the same plug-in estimator the reference's mutual-information
    scoring builds on (voice_classifier.py:150-153).

    Scale: one unpivot-style union keyed on (col, value) → one
    aggregate per column; the per-column totals table is tiny and
    joined back broadcast."""
    o = load_table(spark, sf_dir, "orders")
    stacked = o.select(
        F.expr(
            "stack(3, "
            "'o_orderstatus', o_orderstatus, "
            "'o_orderpriority', o_orderpriority, "
            "'status_priority', o_orderstatus || '|' || o_orderpriority"
            ") AS (col, v)"
        )
    )
    c = stacked.groupBy("col", "v").agg(F.count("*").alias("n"))
    t = c.groupBy("col").agg(
        F.sum("n").alias("tot"), F.count("*").alias("n_distinct")
    )
    p = F.col("n").cast("double") / F.col("tot")
    return (
        c.join(F.broadcast(t), "col")
        .groupBy("col")
        .agg(
            F.max("n_distinct").cast("bigint").alias("n_distinct"),
            F.round(-F.sum(p * F.log2(p)), 6).alias("entropy_bits"),
            F.round(
                -F.sum(p * F.log2(p))
                / F.log2(F.max("n_distinct").cast("double")),
                6,
            ).alias("normalized"),
        )
    )


@query(
    "profile_benford_first_digit",
    oracle="""
        WITH d AS (
            SELECT CAST(substr(CAST(CAST(FLOOR(o_totalprice) AS BIGINT) AS VARCHAR),
                               1, 1) AS BIGINT) AS digit
            FROM orders WHERE o_totalprice >= 1
        ),
        c AS (SELECT digit, COUNT(*) AS n FROM d GROUP BY digit),
        t AS (SELECT SUM(n) AS tot FROM c)
        SELECT digit,
               CAST(n AS BIGINT)                          AS n,
               ROUND(CAST(n AS DOUBLE) / tot, 6)          AS observed,
               ROUND(log2(1.0 + 1.0 / digit) / log2(10.0), 6) AS benford,
               ROUND(ABS(CAST(n AS DOUBLE) / tot
                         - log2(1.0 + 1.0 / digit) / log2(10.0)), 6)
                                                          AS abs_dev
        FROM c CROSS JOIN t
        ORDER BY digit
    """,
    tags=("profiling", "benford", "orders"),
)
def profile_benford_first_digit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit screen over order totals: observed
    leading-digit frequencies against log10(1 + 1/d) — the classic
    fraud/synthetic-data smell test (synthetic uniform prices, like
    these, deviate loudly; organic financial data does not).

    First digit via FLOOR-then-string truncation (exact in both
    engines — DuckDB's bare double->BIGINT cast ROUNDS while Spark's
    truncates, so the floor is stated explicitly —
    no float log10 flooring, which disagrees at power-of-ten
    boundaries); expected frequencies via log2 ratios so both engines
    evaluate the identical expression tree.

    Scale: one map + one 9-row aggregate; the total broadcast back."""
    o = load_table(spark, sf_dir, "orders")
    d = o.filter(F.col("o_totalprice") >= 1).select(
        F.substring(
            F.col("o_totalprice").cast("bigint").cast("string"), 1, 1
        )
        .cast("bigint")
        .alias("digit")
    )
    c = d.groupBy("digit").agg(F.count("*").alias("n"))
    t = c.agg(F.sum("n").alias("tot"))
    benford = F.log2(1.0 + 1.0 / F.col("digit")) / F.log2(F.lit(10.0))
    obs = F.col("n").cast("double") / F.col("tot")
    return (
        c.crossJoin(F.broadcast(t))
        .select(
            "digit",
            F.col("n").cast("bigint").alias("n"),
            F.round(obs, 6).alias("observed"),
            F.round(benford, 6).alias("benford"),
            F.round(F.abs(obs - benford), 6).alias("abs_dev"),
        )
        .orderBy("digit")
    )


@query(
    "profile_dq_rules",
    oracle="""
        WITH o AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(COUNT(*) - COUNT(DISTINCT o_orderkey) AS BIGINT)
                       AS dup_keys,
                   CAST(SUM(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END)
                        AS BIGINT) AS bad_price,
                   CAST(SUM(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END)
                        AS BIGINT) AS null_date
            FROM orders
        ),
        l AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(CASE WHEN l_discount < 0 OR l_discount > 1
                                 THEN 1 ELSE 0 END) AS BIGINT) AS bad_disc
            FROM lineitem
        ),
        j AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(CASE WHEN o.o_orderkey IS NULL
                                 THEN 1 ELSE 0 END) AS BIGINT) AS orphans,
                   CAST(SUM(CASE WHEN o.o_orderkey IS NOT NULL
                                  AND li.l_shipdate < o.o_orderdate
                                 THEN 1 ELSE 0 END) AS BIGINT) AS ship_early
            FROM lineitem li LEFT JOIN orders o
              ON li.l_orderkey = o.o_orderkey
        )
        SELECT rule, n_checked, n_violations,
               n_violations = 0 AS passed
        FROM (
            SELECT 'orders_pk_unique' AS rule, n AS n_checked,
                   dup_keys AS n_violations FROM o
            UNION ALL
            SELECT 'orders_price_positive', n, bad_price FROM o
            UNION ALL
            SELECT 'orders_date_not_null', n, null_date FROM o
            UNION ALL
            SELECT 'lineitem_discount_in_unit_range', n, bad_disc FROM l
            UNION ALL
            SELECT 'lineitem_fk_has_order', n, orphans FROM j
            UNION ALL
            SELECT 'lineitem_ships_after_order', n, ship_early FROM j
        )
    """,
    tags=("profiling", "data-quality", "constraints", "orders", "lineitem"),
)
def profile_dq_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-quality assertion suite (the Deequ pattern):
    primary-key uniqueness, range checks, not-null, referential
    integrity, and a cross-table temporal-order rule, emitted as one
    row per rule with violation counts and a pass flag.

    All single-table rules for a table fold into ONE aggregation pass
    (conditional sums share the scan); the two referential/temporal
    rules share ONE fact-keyed left join. The rule ledger is what a
    100 TB ingestion gate diffs snapshot-over-snapshot — counts, not
    row dumps, so output size is O(rules)."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    oagg = o.agg(
        F.count("*").cast("bigint").alias("n"),
        (F.count("*") - F.countDistinct("o_orderkey"))
        .cast("bigint")
        .alias("dup_keys"),
        F.sum((F.col("o_totalprice") <= 0).cast("int"))
        .cast("bigint")
        .alias("bad_price"),
        F.sum(F.col("o_orderdate").isNull().cast("int"))
        .cast("bigint")
        .alias("null_date"),
    )
    lagg = li.agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum(
            ((F.col("l_discount") < 0) | (F.col("l_discount") > 1)).cast("int")
        )
        .cast("bigint")
        .alias("bad_disc"),
    )
    j = li.join(o, li.l_orderkey == o.o_orderkey, "left").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum(F.col("o_orderkey").isNull().cast("int"))
        .cast("bigint")
        .alias("orphans"),
        F.sum(
            (
                F.col("o_orderkey").isNotNull()
                & (F.col("l_shipdate") < F.col("o_orderdate"))
            ).cast("int")
        )
        .cast("bigint")
        .alias("ship_early"),
    )

    def rule(src: DataFrame, name: str, viol: str) -> DataFrame:
        return src.select(
            F.lit(name).alias("rule"),
            F.col("n").alias("n_checked"),
            F.col(viol).alias("n_violations"),
        )

    rules = (
        rule(oagg, "orders_pk_unique", "dup_keys")
        .unionByName(rule(oagg, "orders_price_positive", "bad_price"))
        .unionByName(rule(oagg, "orders_date_not_null", "null_date"))
        .unionByName(rule(lagg, "lineitem_discount_in_unit_range", "bad_disc"))
        .unionByName(rule(j, "lineitem_fk_has_order", "orphans"))
        .unionByName(rule(j, "lineitem_ships_after_order", "ship_early"))
    )
    return rules.select(
        "rule", "n_checked", "n_violations",
        (F.col("n_violations") == 0).alias("passed"),
    )


# --- Schema discovery: functional + inclusion dependencies ---------------


@query(
    "profile_functional_dependencies",
    oracle="""
        WITH cands AS (
            SELECT 'o_orderkey->o_custkey' AS fd,
                   CAST(COUNT(*) AS BIGINT) AS n_lhs,
                   CAST(SUM(CASE WHEN d > 1 THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_violating
            FROM (SELECT o_orderkey, COUNT(DISTINCT o_custkey) AS d
                  FROM orders GROUP BY o_orderkey)
            UNION ALL
            SELECT 'o_custkey->o_orderpriority',
                   CAST(COUNT(*) AS BIGINT),
                   CAST(SUM(CASE WHEN d > 1 THEN 1 ELSE 0 END) AS BIGINT)
            FROM (SELECT o_custkey, COUNT(DISTINCT o_orderpriority) AS d
                  FROM orders GROUP BY o_custkey)
            UNION ALL
            SELECT 'c_custkey->c_mktsegment',
                   CAST(COUNT(*) AS BIGINT),
                   CAST(SUM(CASE WHEN d > 1 THEN 1 ELSE 0 END) AS BIGINT)
            FROM (SELECT c_custkey, COUNT(DISTINCT c_mktsegment) AS d
                  FROM customer GROUP BY c_custkey)
            UNION ALL
            SELECT 'c_nationkey->c_mktsegment',
                   CAST(COUNT(*) AS BIGINT),
                   CAST(SUM(CASE WHEN d > 1 THEN 1 ELSE 0 END) AS BIGINT)
            FROM (SELECT c_nationkey, COUNT(DISTINCT c_mktsegment) AS d
                  FROM customer GROUP BY c_nationkey)
        )
        SELECT fd, n_lhs, n_violating,
               CAST(n_violating = 0 AS BOOLEAN) AS holds,
               ROUND(1.0 - n_violating * 1.0 / n_lhs, 6) AS fd_strength
        FROM cands ORDER BY fd
    """,
    tags=("profiling", "schema-discovery", "fd", "orders", "customer"),
)
def profile_functional_dependencies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Functional-dependency validation (the Metanome/data-profiling
    primitive): for each candidate A→B, group by A and count groups
    where B is not single-valued — zero violations means the FD holds;
    `fd_strength` (the g3-style fraction of conforming groups) grades
    near-FDs. The panel checks two true keys (order→customer,
    customer→segment) and two expected failures (customer→priority,
    nation→segment).

    Each candidate is ONE map-side-combined group-distinct aggregate
    folded to a single row — FD checking at 100 TB is embarrassingly
    aggregate-shaped, which is why profilers run panels of thousands
    of candidates in a handful of scans (all candidates on the same
    table can share one scan via grouping sets; stated here as the
    per-candidate form the oracle can mirror)."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")

    def fd(df, lhs, rhs, name):
        g = df.groupBy(lhs).agg(F.count_distinct(rhs).alias("d"))
        return g.agg(
            F.lit(name).alias("fd"),
            F.count("*").cast("bigint").alias("n_lhs"),
            F.sum(F.when(F.col("d") > 1, 1).otherwise(0))
            .cast("bigint")
            .alias("n_violating"),
        )
    parts = [
        fd(o, "o_orderkey", "o_custkey", "o_orderkey->o_custkey"),
        fd(o, "o_custkey", "o_orderpriority", "o_custkey->o_orderpriority"),
        fd(c, "c_custkey", "c_mktsegment", "c_custkey->c_mktsegment"),
        fd(c, "c_nationkey", "c_mktsegment", "c_nationkey->c_mktsegment"),
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out.select(
        "fd",
        "n_lhs",
        "n_violating",
        (F.col("n_violating") == 0).alias("holds"),
        F.round(
            1.0 - F.col("n_violating") * 1.0 / F.col("n_lhs"), 6
        ).alias("fd_strength"),
    ).orderBy("fd")


@query(
    "profile_inclusion_dependencies",
    oracle="""
        WITH cands AS (
            SELECT 'orders.o_custkey<=customer.c_custkey' AS ind,
                   (SELECT CAST(COUNT(DISTINCT o_custkey) AS BIGINT)
                    FROM orders) AS n_lhs,
                   (SELECT CAST(COUNT(*) AS BIGINT) FROM
                       (SELECT DISTINCT o_custkey FROM orders
                        WHERE o_custkey NOT IN
                            (SELECT c_custkey FROM customer))) AS n_missing
            UNION ALL
            SELECT 'customer.c_custkey<=orders.o_custkey',
                   (SELECT CAST(COUNT(DISTINCT c_custkey) AS BIGINT)
                    FROM customer),
                   (SELECT CAST(COUNT(*) AS BIGINT) FROM
                       (SELECT DISTINCT c_custkey FROM customer
                        WHERE c_custkey NOT IN
                            (SELECT o_custkey FROM orders)))
            UNION ALL
            SELECT 'lineitem.l_orderkey<=orders.o_orderkey',
                   (SELECT CAST(COUNT(DISTINCT l_orderkey) AS BIGINT)
                    FROM lineitem),
                   (SELECT CAST(COUNT(*) AS BIGINT) FROM
                       (SELECT DISTINCT l_orderkey FROM lineitem
                        WHERE l_orderkey NOT IN
                            (SELECT o_orderkey FROM orders)))
        )
        SELECT ind, n_lhs, n_missing,
               CAST(n_missing = 0 AS BOOLEAN) AS holds,
               ROUND(1.0 - n_missing * 1.0 / n_lhs, 6) AS coverage
        FROM cands ORDER BY ind
    """,
    tags=("profiling", "schema-discovery", "ind", "join", "orders"),
)
def profile_inclusion_dependencies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inclusion-dependency (foreign-key) discovery: for each candidate
    A ⊆ B, the distinct LHS values missing from the RHS — zero missing
    means the IND holds and A is FK-shaped. The panel finds both real
    FKs (orders→customer, lineitem→orders) and measures the reverse
    direction's coverage (customers without orders).

    Shape: distinct-collapse each side FIRST, then a LEFT ANTI
    equi-join counts the escapees — the LHS never joins at record
    grain, and the RHS collapses to its key set (broadcast when
    dimension-sized). IND panels are how profilers reverse-engineer
    joinability across a 100 TB lake; this is that primitive with its
    exact semantics stated relationally."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    li = load_table(spark, sf_dir, "lineitem")

    def ind(lhs_df, lhs, rhs_df, rhs, name):
        l = lhs_df.select(F.col(lhs).alias("k")).distinct()
        r = rhs_df.select(F.col(rhs).alias("k")).distinct()
        return (
            l.join(r, "k", "left_anti")
            .agg(F.count("*").cast("bigint").alias("n_missing"))
            .crossJoin(
                F.broadcast(
                    l.agg(F.count("*").cast("bigint").alias("n_lhs"))
                )
            )
            .select(F.lit(name).alias("ind"), "n_lhs", "n_missing")
        )
    parts = [
        ind(o, "o_custkey", c, "c_custkey",
            "orders.o_custkey<=customer.c_custkey"),
        ind(c, "c_custkey", o, "o_custkey",
            "customer.c_custkey<=orders.o_custkey"),
        ind(li, "l_orderkey", o, "o_orderkey",
            "lineitem.l_orderkey<=orders.o_orderkey"),
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out.select(
        "ind",
        "n_lhs",
        "n_missing",
        (F.col("n_missing") == 0).alias("holds"),
        F.round(1.0 - F.col("n_missing") * 1.0 / F.col("n_lhs"), 6).alias(
            "coverage"
        ),
    ).orderBy("ind")
