"""Round-3 business-analytics invariants: RFM, LTV, DQ rules, sliding
HLL, association rules."""

from __future__ import annotations

import pyspark.sql.functions as F

from big_data_audio_classification_spark.operators import (
    aggregates,
    analytics,
    baskets,
    profiling,
)
from big_data_audio_classification_spark.sources.catalog import load_table


def test_rfm_scores_partition_customers(spark, sf_dir):
    rows = analytics.analytics_rfm_segmentation(spark, sf_dir).collect()
    n_cust = (
        load_table(spark, sf_dir, "orders").select("o_custkey").distinct().count()
    )
    assert sum(r["n_customers"] for r in rows) == n_cust
    for r in rows:
        assert 1 <= r["r_score"] <= 5
        assert 1 <= r["f_score"] <= 5
        assert 1 <= r["m_score"] <= 5
        assert r["avg_monetary"] > 0


def test_cohort_ltv_is_monotone_per_cohort(spark, sf_dir):
    rows = analytics.events_cohort_ltv(spark, sf_dir).collect()
    by_cohort: dict[str, list] = {}
    for r in rows:
        by_cohort.setdefault(r["cohort_week"], []).append(r)
    assert by_cohort
    for rs in by_cohort.values():
        rs.sort(key=lambda r: r["week_offset"])
        ltvs = [r["cum_ltv_per_user"] for r in rs]
        assert ltvs == sorted(ltvs)  # cumulative revenue never decreases
        assert all(v > 0 for v in ltvs)


def test_dq_rules_ledger_is_consistent(spark, sf_dir):
    rows = profiling.profile_dq_rules(spark, sf_dir).collect()
    assert len(rows) == 6
    names = {r["rule"] for r in rows}
    assert "orders_pk_unique" in names and "lineitem_fk_has_order" in names
    for r in rows:
        assert r["n_checked"] > 0
        assert 0 <= r["n_violations"] <= r["n_checked"]
        assert r["passed"] == (r["n_violations"] == 0)
    # the synthetic generator emits unique order keys — that rule must hold
    pk = next(r for r in rows if r["rule"] == "orders_pk_unique")
    assert pk["passed"]


def test_hll_sliding_window_dominates_daily_distinct(spark, sf_dir):
    got = {
        r["day"]: r
        for r in aggregates.agg_hll_sliding_distinct(spark, sf_dir).collect()
    }
    daily = {
        r["day"]: r["n"]
        for r in load_table(spark, sf_dir, "events")
        .select(F.date_format(F.to_date("ts"), "yyyy-MM-dd").alias("day"), "user_id")
        .distinct()
        .groupBy("day")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert set(got) == set(daily)
    for day, r in got.items():
        # a trailing-7-day union can never see fewer users than its last day
        assert r["n_users_exact"] >= daily[day]
        assert r["sketch_within_tol"]


def test_association_rules_measures_in_range(spark, sf_dir):
    rows = baskets.baskets_association_rules(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["antecedent"] != r["consequent"]
        assert r["pair_support"] >= baskets.BASKET_MIN_SUPPORT
        assert 0 < r["confidence"] <= 1
        assert r["lift"] > 0
    lifts = [r["lift"] for r in rows]
    assert lifts == sorted(lifts, reverse=True)


def test_abc_pareto_classes_partition_brand_revenue(spark, sf_dir):
    rows = analytics.analytics_abc_pareto(spark, sf_dir).collect()
    by_brand: dict[str, dict] = {}
    for r in rows:
        by_brand.setdefault(r["p_brand"], {})[r["abc"]] = r
    for brand, classes in by_brand.items():
        total_share = sum(r["revenue_share"] for r in classes.values())
        assert abs(total_share - 1.0) < 1e-4, (brand, total_share)
        if "A" in classes and "C" in classes:
            # Pareto: A holds more revenue per part than C
            a, c = classes["A"], classes["C"]
            assert a["revenue"] / a["n_parts"] > c["revenue"] / c["n_parts"]


def test_mom_growth_first_month_is_null_and_avg_bounded(spark, sf_dir):
    rows = sorted(
        analytics.analytics_mom_growth(spark, sf_dir).collect(),
        key=lambda r: r["month"],
    )
    assert rows[0]["mom_growth"] is None
    for r in rows[1:]:
        assert r["mom_growth"] is not None
        assert r["revenue_3mo_avg"] > 0


def test_bitmap_distinct_equals_count_distinct(spark, sf_dir):
    """Bitmap OR-merged partials must reproduce plain countDistinct
    exactly — bitmaps are exact, unlike HLL."""
    import pyspark.sql.functions as F2

    got = {
        r["l_returnflag"]: r["n_suppliers"]
        for r in aggregates.agg_bitmap_exact_distinct(spark, sf_dir).collect()
    }
    direct = {
        r["l_returnflag"]: r["n"]
        for r in load_table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(F2.countDistinct("l_suppkey").alias("n"))
        .collect()
    }
    assert got == direct


def test_linear_attribution_conserves_conversions(spark, sf_dir):
    """Credit conservation: total attributed conversions across touch
    types equals the number of purchases that HAVE at least one touch
    in the lookback, and every touch's credit is positive."""
    import math

    import pyspark.sql.functions as F

    from big_data_audio_classification_spark.operators.analytics import (
        ATTR_TOUCHES,
        ATTR_WINDOW_MIN,
        events_attribution_linear,
    )
    from big_data_audio_classification_spark.sources.catalog import load_table

    rows = events_attribution_linear(spark, sf_dir).collect()
    total_credit = sum(r["attributed_conversions"] for r in rows)
    e = load_table(spark, sf_dir, "events")
    p = e.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("pid"), F.col("user_id").alias("pu"),
        F.col("ts").alias("pts"),
    )
    t = e.where(F.col("event_type").isin(*ATTR_TOUCHES)).select(
        F.col("user_id").alias("tu"), F.col("ts").alias("tts")
    )
    touched = (
        p.join(
            t,
            (F.col("tu") == F.col("pu"))
            & (F.col("tts") <= F.col("pts"))
            & (
                F.unix_micros("pts") - F.unix_micros("tts")
                <= ATTR_WINDOW_MIN * 60_000_000
            ),
            "left_semi",
        ).count()
    )
    assert math.isclose(total_credit, touched, abs_tol=0.05)
    assert all(r["attributed_conversions"] > 0 for r in rows)
    assert {r["touch_type"] for r in rows} <= set(ATTR_TOUCHES)


def test_bot_regularity_matches_pandas_replay(spark, sf_dir):
    """Entropy ranking must match an independent pandas replay of the
    gap-bucket entropy computation."""
    import math

    import pandas as pd

    from big_data_audio_classification_spark.operators.analytics import (
        _BOT_MIN_GAPS,
        _BOT_TOPK,
        analytics_bot_regularity,
    )

    pdf = pd.read_parquet(f"{sf_dir}/events.parquet")[
        ["user_id", "ts", "event_id"]
    ].sort_values(["user_id", "ts", "event_id"])
    expected = []
    for uid, g in pdf.groupby("user_id"):
        us = pd.Series(g["ts"].values.astype("datetime64[us]").astype("int64"))
        gaps = us.diff().dropna().astype("int64")
        if len(gaps) < _BOT_MIN_GAPS:
            continue
        buckets = (gaps // 1_000_000 + 1).apply(lambda x: math.floor(math.log2(x)))
        counts = buckets.value_counts()
        n = counts.sum()
        ent = math.log2(n) - sum(c * math.log2(c) for c in counts) / n
        expected.append((round(ent, 6), uid, int(n)))
    expected.sort()
    expected = [(u, n, e) for e, u, n in expected[:_BOT_TOPK]]

    got = [
        (r.user_id, r.n_gaps, r.gap_entropy)
        for r in analytics_bot_regularity(spark, sf_dir).collect()
    ]
    assert got == expected


def test_max_drawdown_matches_numpy_replay(spark, sf_dir):
    """Peak/trough/drawdown must equal a numpy running-max replay."""
    import numpy as np
    import pandas as pd

    from big_data_audio_classification_spark.operators.analytics import (
        analytics_max_drawdown,
    )

    pdf = pd.read_parquet(f"{sf_dir}/orders.parquet")
    cents = (pdf["o_totalprice"] * 100).round().astype("int64")
    daily = cents.groupby(
        pd.to_datetime(pdf["o_orderdate"]).dt.normalize()
    ).sum().sort_index()
    vals = daily.to_numpy()
    runmax = np.maximum.accumulate(vals)
    dd = runmax - vals
    ti = int(np.argmax(dd))  # argmax returns the FIRST max — same tiebreak
    peak_c = runmax[ti]
    pi = int(np.argmax(vals[: ti + 1] == peak_c))

    r = analytics_max_drawdown(spark, sf_dir).collect()[0]
    assert r.trough_day == daily.index[ti].strftime("%Y-%m-%d")
    assert r.peak_day == daily.index[pi].strftime("%Y-%m-%d")
    assert abs(r.max_drawdown - dd[ti] / 100.0) < 1e-6
    assert r.peak_rev >= r.trough_rev
    assert 0 <= r.dd_pct <= 100
