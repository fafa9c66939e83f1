"""Experimentation & survival analytics: Kaplan-Meier product-limit
curves and the two-proportion A/B z-test.

Rounds out the hypothesis-testing family (Welch t, Mann-Whitney U,
chi², KS, effect sizes — stats.py) with the two remaining staples of a
product-analytics stack: "how long do customers survive" and "did the
B arm convert better". Both are single-aggregation-pass constructions
the DuckDB gate can verify value-for-value.

Scale notes:
* Kaplan-Meier: customers collapse to one (duration, event) row each
  (one groupBy over orders), then d_i / at-risk n_i / the running
  product all come from windows PARTITIONED BY segment over the
  distinct-duration AGGREGATE (bounded by the calendar span). The
  product-limit Π(1 − d/n) is evaluated as exp(Σ ln(1 − d/n)) — a
  running-sum window, numerically stable, no multiplication chain.
* A/B z-test: one aggregation over per-user conversion flags; the z
  statistic, pooled variance, and the fixed-critical-value decision
  (±1.96) are pure scalar algebra — no CDF needed, so no erf
  approximation to keep in cross-engine lockstep (same contract as
  stats_welch_ttest's 95% decision).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from big_data_audio_classification_spark.registry import query
from big_data_audio_classification_spark.sources.catalog import load_table

KM_CENSOR_DAYS = 60  # still-active horizon: last order this close to
# the dataset's max date ⇒ censored (no churn event observed)
KM_MAX_STEPS = 40  # first N event times per segment in the output


@query(
    "stats_kaplan_meier",
    oracle=f"""
        WITH horizon AS (
            SELECT MAX(CAST(o_orderdate AS DATE)) AS maxd FROM orders
        ),
        subj AS (
            SELECT c.c_mktsegment AS segment,
                   date_diff('day', MIN(CAST(o.o_orderdate AS DATE)),
                             MAX(CAST(o.o_orderdate AS DATE))) AS duration,
                   CASE WHEN date_diff('day',
                                       MAX(CAST(o.o_orderdate AS DATE)),
                                       MAX(h.maxd)) > {KM_CENSOR_DAYS}
                        THEN 1 ELSE 0 END AS event
            FROM orders o
            JOIN customer c ON c.c_custkey = o.o_custkey
            CROSS JOIN horizon h
            GROUP BY c.c_mktsegment, o.o_custkey
        ),
        seg AS (
            SELECT segment, CAST(COUNT(*) AS BIGINT) AS n_subjects
            FROM subj GROUP BY segment
        ),
        steps AS (
            SELECT segment, duration AS t,
                   CAST(SUM(event) AS BIGINT) AS d,
                   CAST(COUNT(*) AS BIGINT) AS leaving
            FROM subj GROUP BY segment, duration
        ),
        risk AS (
            SELECT s.segment, s.t, s.d,
                   g.n_subjects
                   - COALESCE(SUM(s.leaving) OVER (
                         PARTITION BY s.segment ORDER BY s.t
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                     ), 0) AS n_risk
            FROM steps s JOIN seg g ON g.segment = s.segment
        ),
        km AS (
            SELECT segment, t, d, n_risk,
                   ROUND(EXP(SUM(LN(1.0 - CAST(d AS DOUBLE) / n_risk)) OVER (
                       PARTITION BY segment ORDER BY t
                   )), 6) AS s_km
            FROM risk
            WHERE d > 0
        )
        SELECT segment, CAST(t AS BIGINT) AS t,
               d, CAST(n_risk AS BIGINT) AS n_risk, s_km
        FROM km
        QUALIFY ROW_NUMBER() OVER (PARTITION BY segment ORDER BY t)
                <= {KM_MAX_STEPS}
    """,
    tags=("stats", "survival", "window", "orders", "customer"),
)
def stats_kaplan_meier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier survival curves per market segment: subject =
    customer, duration = days between first and last order, churn
    event observed unless the last order is within 60 days of the
    dataset horizon (censored). S(t) = Π_{t_i ≤ t} (1 − d_i/n_i),
    first 40 event times per segment.

    The product-limit runs as exp(Σ ln(1−d/n)) — a segment-partitioned
    running-sum window over the distinct-duration aggregate; at-risk
    counts come from the same aggregate's cumulative exits. Orders
    shuffle once (per-customer collapse); everything after is
    spine-sized."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    maxd = F.broadcast(
        o.agg(F.max(F.col("o_orderdate").cast("date")).alias("maxd"))
    )
    subj = (
        o.join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .crossJoin(maxd)
        .groupBy(F.col("c_mktsegment").alias("segment"), "o_custkey")
        .agg(
            F.datediff(
                F.max(F.col("o_orderdate").cast("date")),
                F.min(F.col("o_orderdate").cast("date")),
            ).alias("duration"),
            F.when(
                F.datediff(
                    F.max("maxd"), F.max(F.col("o_orderdate").cast("date"))
                )
                > KM_CENSOR_DAYS,
                1,
            )
            .otherwise(0)
            .alias("event"),
        )
    )
    seg = subj.groupBy("segment").agg(F.count("*").alias("n_subjects"))
    steps = subj.groupBy("segment", F.col("duration").alias("t")).agg(
        F.sum("event").alias("d"), F.count("*").alias("leaving")
    )
    w_prev = (
        Window.partitionBy("segment")
        .orderBy("t")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    risk = (
        steps.join(F.broadcast(seg), "segment")
        .withColumn(
            "n_risk",
            F.col("n_subjects")
            - F.coalesce(F.sum("leaving").over(w_prev), F.lit(0)),
        )
    )
    w_cum = Window.partitionBy("segment").orderBy("t")
    km = (
        risk.where(F.col("d") > 0)
        .withColumn(
            "s_km",
            F.round(
                F.exp(
                    F.sum(
                        F.log(1.0 - F.col("d").cast("double") / F.col("n_risk"))
                    ).over(w_cum)
                ),
                6,
            ),
        )
        .withColumn("rk", F.row_number().over(w_cum))
        .where(F.col("rk") <= KM_MAX_STEPS)
    )
    return km.select(
        "segment",
        F.col("t").cast("bigint").alias("t"),
        "d",
        F.col("n_risk").cast("bigint").alias("n_risk"),
        "s_km",
    )


@query(
    "stats_ab_proportion_test",
    oracle="""
        WITH arms AS (
            SELECT event_id % 2 AS arm, CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(CASE WHEN event_type = 'purchase'
                                 THEN 1 ELSE 0 END) AS BIGINT) AS conv
            FROM events GROUP BY event_id % 2
        ),
        wide AS (
            SELECT
                MAX(CASE WHEN arm = 0 THEN n END)    AS n_a,
                MAX(CASE WHEN arm = 0 THEN conv END) AS conv_a,
                MAX(CASE WHEN arm = 1 THEN n END)    AS n_b,
                MAX(CASE WHEN arm = 1 THEN conv END) AS conv_b
            FROM arms
        )
        SELECT n_a, conv_a, n_b, conv_b,
               ROUND(CAST(conv_a AS DOUBLE) / n_a, 6) AS p_a,
               ROUND(CAST(conv_b AS DOUBLE) / n_b, 6) AS p_b,
               ROUND((CAST(conv_b AS DOUBLE) / n_b - CAST(conv_a AS DOUBLE) / n_a)
                     / SQRT((CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b))
                            * (1 - CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b))
                            * (1.0 / n_a + 1.0 / n_b)), 6) AS z,
               ABS((CAST(conv_b AS DOUBLE) / n_b - CAST(conv_a AS DOUBLE) / n_a)
                   / SQRT((CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b))
                          * (1 - CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b))
                          * (1.0 / n_a + 1.0 / n_b))) > 1.959963985
                   AS significant_95
        FROM wide
    """,
    tags=("stats", "abtest", "aggregate", "events"),
)
def stats_ab_proportion_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion A/B z-test: events split into arms by event_id
    parity, success = 'purchase'; pooled-variance z plus the
    fixed-critical-value 95% decision (|z| > 1.96 — no CDF, so nothing
    to approximate cross-engine). (The testdata's user population is
    tiny and universally converting, so the unit of randomization is
    the event — the test mechanics are identical.)

    One map-side-combinable 2-row aggregate, then scalar algebra —
    O(1) output from one shuffle."""
    e = load_table(spark, sf_dir, "events")
    arms = e.groupBy((F.col("event_id") % 2).alias("arm")).agg(
        F.count("*").alias("n"),
        F.sum(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("conv"),
    )
    wide = arms.agg(
        F.max(F.when(F.col("arm") == 0, F.col("n"))).alias("n_a"),
        F.max(F.when(F.col("arm") == 0, F.col("conv"))).alias("conv_a"),
        F.max(F.when(F.col("arm") == 1, F.col("n"))).alias("n_b"),
        F.max(F.when(F.col("arm") == 1, F.col("conv"))).alias("conv_b"),
    )
    p_a = F.col("conv_a").cast("double") / F.col("n_a")
    p_b = F.col("conv_b").cast("double") / F.col("n_b")
    pool = (F.col("conv_a") + F.col("conv_b")).cast("double") / (
        F.col("n_a") + F.col("n_b")
    )
    z = (p_b - p_a) / F.sqrt(
        pool * (1 - pool) * (1.0 / F.col("n_a") + 1.0 / F.col("n_b"))
    )
    return wide.select(
        "n_a",
        "conv_a",
        "n_b",
        "conv_b",
        F.round(p_a, 6).alias("p_a"),
        F.round(p_b, 6).alias("p_b"),
        F.round(z, 6).alias("z"),
        (F.abs(z) > 1.959963985).alias("significant_95"),
    )
