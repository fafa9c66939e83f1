"""Invariants for the rolling-actives / decomposition / robust-trend /
causal-inference batch, complementing the tri-SF DuckDB oracle gate
with direct Python/numpy replays and structural properties the oracle
restates rather than independently proves."""

from __future__ import annotations

import math
from collections import defaultdict

import numpy as np
import pyspark.sql.functions as F

from big_data_audio_classification_spark.operators.experiments import (
    DID_Z95,
    stats_diff_in_diff,
    stats_median_ci,
)
from big_data_audio_classification_spark.operators.timeseries import (
    analytics_stl_decomposition,
    events_rolling_active_users,
    stats_theil_sen,
)
from big_data_audio_classification_spark.sources.catalog import load_table


def _daily_revenue(spark, sf_dir):
    rows = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.col("o_orderdate").cast("date").alias("d"))
        .agg(F.round(F.sum("o_totalprice"), 2).alias("rev"))
        .orderBy("d")
        .collect()
    )
    return [(r["d"], r["rev"]) for r in rows]


def test_rolling_actives_matches_set_replay(spark, sf_dir):
    out = {r["day"]: r for r in events_rolling_active_users(spark, sf_dir).collect()}
    ud = (
        load_table(spark, sf_dir, "events")
        .select(F.col("ts").cast("date").alias("d"), "user_id")
        .distinct()
        .collect()
    )
    by_day = defaultdict(set)
    for r in ud:
        by_day[r["d"]].add(r["user_id"])
    assert set(out) == set(by_day)
    for day, row in out.items():
        dau = len(by_day[day])
        window_users = set()
        for d, users in by_day.items():
            if 0 <= (day - d).days <= 6:
                window_users |= users
        assert row["dau"] == dau
        assert row["wau_7d"] == len(window_users)
        assert row["wau_7d"] >= row["dau"]
        assert 0 < row["stickiness"] <= 1
        assert math.isclose(
            row["stickiness"], dau / len(window_users), abs_tol=5.01e-5
        )


def test_stl_decomposition_identities(spark, sf_dir):
    rows = analytics_stl_decomposition(spark, sf_dir).orderBy("d").collect()
    n = len(rows)
    # Row-frame moving average: exactly the first/last 3 spine rows
    # lack a full 7-day window.
    for i, r in enumerate(rows):
        if i < 3 or i >= n - 3:
            assert r["trend"] is None
            assert r["remainder"] is None
            assert r["is_anomaly"] is None
        else:
            assert r["trend"] is not None
            # additive identity at output rounding (half-up vs half-even
            # rounding can differ by one grid step at exact boundaries)
            assert (
                abs(r["remainder"] - (r["rev"] - r["trend"] - r["seasonal"]))
                < 5.01e-5
            )
            assert r["is_anomaly"] == (abs(r["robust_z"]) > 3.5)
    # Mean-centered weekday indices: 7 distinct values summing to ~0.
    seasonal_by_dow = {}
    for r in rows:
        seasonal_by_dow[r["d"].isoweekday()] = r["seasonal"]
    assert len(seasonal_by_dow) == 7
    assert abs(sum(seasonal_by_dow.values())) < 7 * 5e-5 + 1e-9


def test_theil_sen_matches_numpy_replay(spark, sf_dir):
    out = stats_theil_sen(spark, sf_dir).collect()[0]
    daily = _daily_revenue(spark, sf_dir)
    epoch = __import__("datetime").date(1970, 1, 1)
    x = np.array([(d - epoch).days for d, _ in daily], dtype=np.float64)
    y = np.array([rev for _, rev in daily])
    i, j = np.triu_indices(len(x), k=1)
    slopes = (y[j] - y[i]) / (x[j] - x[i])
    assert out["n_days"] == len(x)
    assert out["n_pairs"] == len(slopes)
    assert math.isclose(out["ts_slope"], float(np.median(slopes)), abs_tol=5.01e-7)
    assert math.isclose(
        out["ts_intercept"],
        float(np.median(y - out["ts_slope"] * x)),
        abs_tol=5.01e-5,
    )
    # OLS cross-check against polyfit.
    slope_np, intercept_np = np.polyfit(x, y, 1)
    assert math.isclose(out["ols_slope"], slope_np, rel_tol=1e-4, abs_tol=1e-4)
    assert math.isclose(out["ols_intercept"], intercept_np, rel_tol=1e-4, abs_tol=1)


def test_diff_in_diff_matches_pandas_replay(spark, sf_dir):
    out = stats_diff_in_diff(spark, sf_dir).collect()[0]
    o = load_table(spark, sf_dir, "orders").toPandas()
    c = load_table(spark, sf_dir, "customer").toPandas()
    j = o.merge(c, left_on="o_custkey", right_on="c_custkey")
    treat = (j["c_nationkey"] % 2 == 0).to_numpy()
    post = (j["o_orderdate"] >= np.datetime64("1998-01-01")).to_numpy()
    price = j["o_totalprice"].to_numpy()
    cells = {
        "tp": price[treat & post],
        "t0": price[treat & ~post],
        "cp": price[~treat & post],
        "c0": price[~treat & ~post],
    }
    m = {k: v.mean() for k, v in cells.items()}
    did = (m["tp"] - m["t0"]) - (m["cp"] - m["c0"])
    se = math.sqrt(sum(v.var(ddof=1) / len(v) for v in cells.values()))
    assert out["n_tp"] == len(cells["tp"])
    for k, name in [("tp", "m_treat_post"), ("t0", "m_treat_pre"),
                    ("cp", "m_ctrl_post"), ("c0", "m_ctrl_pre")]:
        assert math.isclose(out[name], m[k], rel_tol=0, abs_tol=2e-6)
    assert math.isclose(out["did_estimate"], did, abs_tol=5e-6)
    assert math.isclose(out["se"], se, rel_tol=1e-6, abs_tol=1e-3)
    assert math.isclose(out["z_score"], did / se, rel_tol=1e-3, abs_tol=2e-4)
    assert out["significant_95"] == (abs(did / se) > DID_Z95)


def test_median_ci_matches_order_stat_replay(spark, sf_dir):
    out = stats_median_ci(spark, sf_dir).collect()[0]
    v = np.sort(
        load_table(spark, sf_dir, "orders").toPandas()["o_totalprice"].to_numpy()
    )
    n = len(v)
    assert out["n"] == n
    klo = max(1, math.floor((n - DID_Z95 * math.sqrt(n)) / 2))
    khi = min(n, math.ceil((n + DID_Z95 * math.sqrt(n)) / 2) + 1)
    km1, km2 = (n + 1) // 2, n // 2 + 1
    assert out["ci_lo"] == v[klo - 1]
    assert out["ci_hi"] == v[khi - 1]
    assert math.isclose(
        out["median_exact"], (v[km1 - 1] + v[km2 - 1]) / 2, abs_tol=5.01e-5
    )
    assert out["ci_lo"] <= out["median_exact"] <= out["ci_hi"]
