"""Product-analytics operators over the events stream table: ordered
funnel conversion, retention cohorts, ordered string aggregation, and
JSON serialization (the write direction of the JSON family).

Funnels and cohorts are the two queries every event warehouse runs
daily; both reduce to one user-keyed aggregation — no self-joins, no
window-per-stage, no row explosion.

Scale notes:
* Funnel: ONE groupBy(user_id) with conditional min aggregates (the
  pivot-by-predicate pattern) replaces the naive k-way self-join of
  the event log with itself; the follow-up stage rollup aggregates
  |users| rows down to k stages. One data-sized shuffle total.
* Cohorts: first-touch per user (one agg), broadcast back onto the
  events (the user->cohort map is |users| rows, dimension-sized),
  then one (cohort, offset) agg. Two keyed shuffles, both map-side
  combined.
* String agg: collect_set stays bounded because the value domain is
  bounded (priorities); ordering is imposed with array_sort so the
  result is deterministic under any partitioning.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from big_data_audio_classification_spark.registry import query
from big_data_audio_classification_spark.sources.catalog import load_table

FUNNEL = ("view", "click", "purchase")


@query(
    "events_funnel_conversion",
    oracle="""
        WITH u AS (
            SELECT user_id,
                   MIN(ts) FILTER (WHERE event_type = 'view')     AS t_view,
                   MIN(ts) FILTER (WHERE event_type = 'click')    AS t_click,
                   MIN(ts) FILTER (WHERE event_type = 'purchase') AS t_purchase
            FROM events GROUP BY user_id
        ),
        s AS (
            SELECT CAST(COUNT(*) FILTER (WHERE t_view IS NOT NULL) AS BIGINT)
                       AS n_view,
                   CAST(COUNT(*) FILTER (WHERE t_click > t_view) AS BIGINT)
                       AS n_click,
                   CAST(COUNT(*) FILTER (WHERE t_click > t_view
                                           AND t_purchase > t_click) AS BIGINT)
                       AS n_purchase
            FROM u
        )
        SELECT stage, n_users,
               ROUND(CAST(n_users AS DOUBLE)
                     / NULLIF(MAX(n_users) OVER (), 0), 6) AS pct_of_entry
        FROM s
        UNPIVOT (n_users FOR stage IN (n_view AS 'view', n_click AS 'click',
                                       n_purchase AS 'purchase'))
    """,
    tags=("events", "analytics", "funnel"),
)
def events_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel (view -> click -> purchase): a user converts a
    stage only if their FIRST event of that stage happens strictly
    after their first event of the previous stage. One conditional-min
    aggregation per user replaces the k-way self-join."""
    e = load_table(spark, sf_dir, "events")
    firsts = e.groupBy("user_id").agg(
        *[
            F.min(F.when(F.col("event_type") == s, F.col("ts"))).alias(f"t_{s}")
            for s in FUNNEL
        ]
    )
    counts = firsts.agg(
        F.count(F.when(F.col("t_view").isNotNull(), 1)).alias("n_view"),
        F.count(F.when(F.col("t_click") > F.col("t_view"), 1)).alias("n_click"),
        F.count(
            F.when(
                (F.col("t_click") > F.col("t_view"))
                & (F.col("t_purchase") > F.col("t_click")),
                1,
            )
        ).alias("n_purchase"),
    )
    long = counts.unpivot([], [f"n_{s}" for s in FUNNEL], "stage", "n_users").select(
        F.regexp_replace("stage", "^n_", "").alias("stage"), "n_users"
    )
    entry = long.agg(F.max("n_users").alias("entry"))
    return long.crossJoin(F.broadcast(entry)).select(
        "stage",
        "n_users",
        F.round(
            F.col("n_users").cast("double") / F.nullif("entry", F.lit(0)), 6
        ).alias("pct_of_entry"),
    )


@query(
    "events_retention_cohorts",
    oracle="""
        WITH first_touch AS (
            SELECT user_id,
                   CAST(date_trunc('week', MIN(ts)) AS DATE) AS cohort_week
            FROM events GROUP BY user_id
        )
        SELECT STRFTIME(cohort_week, '%Y-%m-%d') AS cohort_week,
               CAST(FLOOR(date_diff('day', cohort_week,
                                    CAST(e.ts AS DATE)) / 7.0) AS INT)
                   AS week_offset,
               CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS n_active
        FROM events e JOIN first_touch f USING (user_id)
        GROUP BY 1, 2
    """,
    tags=("events", "analytics", "cohort"),
)
def events_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retention cohorts: users grouped by first-seen ISO week, counted
    distinct in each subsequent week offset. The user->cohort map is
    dimension-sized and broadcast back onto the event log; the final
    agg is map-side-combined on (cohort, offset)."""
    e = load_table(spark, sf_dir, "events")
    first_touch = e.groupBy("user_id").agg(
        F.trunc(F.min("ts"), "week").alias("cohort_week")
    )
    return (
        e.join(F.broadcast(first_touch), "user_id")
        .select(
            F.date_format("cohort_week", "yyyy-MM-dd").alias("cohort_week"),
            F.floor(
                F.datediff(F.to_date("ts"), F.col("cohort_week")) / 7.0
            )
            .cast("int")
            .alias("week_offset"),
            "user_id",
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.count_distinct("user_id").alias("n_active"))
    )


@query(
    "agg_string_concat",
    oracle="""
        SELECT o_orderstatus,
               string_agg(DISTINCT o_orderpriority, ','
                          ORDER BY o_orderpriority) AS priorities,
               CAST(COUNT(DISTINCT o_orderpriority) AS BIGINT) AS n_priorities
        FROM orders
        GROUP BY o_orderstatus
    """,
    tags=("aggregate", "string", "listagg"),
)
def agg_string_concat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation (LISTAGG/string_agg): distinct values
    sorted then joined, deterministic under any partitioning (an
    unordered listagg is nondeterministic by definition — the sort is
    the portable form). collect_set stays bounded: the value domain is
    the 5 priorities, not the row count."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.concat_ws(",", F.array_sort(F.collect_set("o_orderpriority"))).alias(
            "priorities"
        ),
        F.count_distinct("o_orderpriority").alias("n_priorities"),
    )


@query(
    "scalar_to_json",
    oracle="""
        SELECT o_orderkey,
               to_json(struct_pack(
                   key := o_orderkey,
                   status := o_orderstatus,
                   price := ROUND(o_totalprice, 2),
                   day := STRFTIME(o_orderdate, '%Y-%m-%d')
               )) AS doc,
               to_json([o_orderkey, o_custkey]) AS key_pair
        FROM orders
    """,
    tags=("scalar", "json", "serialization"),
)
def scalar_to_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON serialization (the write direction of the from_json /
    get_json_object family): struct and array assembly -> compact JSON
    text. Field order is definition order in both engines; both emit
    compact separators, so the text is byte-identical."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.to_json(
            F.struct(
                F.col("o_orderkey").alias("key"),
                F.col("o_orderstatus").alias("status"),
                F.round("o_totalprice", 2).alias("price"),
                F.date_format("o_orderdate", "yyyy-MM-dd").alias("day"),
            )
        ).alias("doc"),
        F.to_json(F.array("o_orderkey", "o_custkey")).alias("key_pair"),
    )
