"""Invariant tests for the warehouse-maintenance operators (their
value-level correctness is oracle-checked; these assert the structural
contracts a user relies on)."""

from __future__ import annotations

import pyspark.sql.functions as F

from big_data_audio_classification_spark.operators import warehouse
from big_data_audio_classification_spark.sources.catalog import load_table


def test_scd2_version_accounting(spark, sf_dir):
    """Output rows = |dim| + |changes| (each changed key gains exactly
    one extra version); every key has exactly one current row; closed
    rows have valid_to = the new version's valid_from."""
    out = warehouse.scd2_customer_segment(spark, sf_dir).cache()
    n_cust = load_table(spark, sf_dir, "customer").count()
    n_changed = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") % warehouse.SCD2_MOD == 3)
        .count()
    )
    assert out.count() == n_cust + n_changed
    current = out.filter("is_current").groupBy("c_custkey").count()
    assert current.filter("count != 1").count() == 0
    assert current.count() == n_cust
    closed = out.filter(~F.col("is_current"))
    assert closed.count() == n_changed
    assert closed.filter(F.col("valid_to").isNull()).count() == 0
    out.unpersist()


def test_gapfill_spine_is_dense(spark, sf_dir):
    """Every nation has every month exactly once (80 months 1995-01..
    2001-08), revenue is never null, and cum_revenue is monotone
    non-decreasing per nation."""
    out = warehouse.gapfill_monthly_revenue(spark, sf_dir).cache()
    n_nations = load_table(spark, sf_dir, "nation").count()
    assert out.count() == n_nations * 80
    per = out.groupBy("n_name").agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("month").alias("nd"),
    )
    assert per.filter("n != 80 or nd != 80").count() == 0
    assert out.filter(F.col("revenue").isNull()).count() == 0
    from pyspark.sql import Window

    w = Window.partitionBy("n_name").orderBy("month")
    lagged = out.withColumn("prev", F.lag("cum_revenue").over(w))
    assert lagged.filter(F.col("cum_revenue") < F.col("prev")).count() == 0
    out.unpersist()


def test_winsorize_bounds_hold(spark, sf_dir):
    """Winsorized mean sits between the clamp bounds; clamp counts sum
    to ~2% of rows (p01/p99 tails)."""
    out = warehouse.winsorize_order_prices(spark, sf_dir)
    rows = out.collect()
    total = sum(r.n for r in rows)
    clamped = sum(r.n_clamped_lo + r.n_clamped_hi for r in rows)
    # exact percentiles -> at most ~1% in each tail (plus ties slack)
    assert 0 < clamped <= 0.03 * total
    for r in rows:
        assert r.avg_wins > 0
        # clamping only the low tail can only raise the mean; only the
        # high tail, only lower it
        if r.n_clamped_hi == 0:
            assert r.avg_wins >= r.avg_raw - 0.01
        if r.n_clamped_lo == 0:
            assert r.avg_wins <= r.avg_raw + 0.01
