"""Invariants for the rolling-actives / decomposition / robust-trend /
causal-inference batch, complementing the tri-SF DuckDB oracle gate
with direct Python/numpy replays and structural properties the oracle
restates rather than independently proves."""

from __future__ import annotations

import math
from collections import defaultdict

import numpy as np
import pytest
import pyspark.sql.functions as F

from big_data_audio_classification_spark.operators.experiments import (
    Z95_TWO_SIDED,
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
    from datetime import date

    out = {
        date.fromisoformat(r["day"]): r
        for r in events_rolling_active_users(spark, sf_dir).collect()
    }
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
    from datetime import date

    seasonal_by_dow = {}
    for r in rows:
        seasonal_by_dow[date.fromisoformat(r["d"]).isoweekday()] = r["seasonal"]
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
    assert out["significant_95"] == (abs(did / se) > Z95_TWO_SIDED)


def test_median_ci_matches_order_stat_replay(spark, sf_dir):
    out = stats_median_ci(spark, sf_dir).collect()[0]
    v = np.sort(
        load_table(spark, sf_dir, "orders").toPandas()["o_totalprice"].to_numpy()
    )
    n = len(v)
    assert out["n"] == n
    klo = max(1, math.floor((n - Z95_TWO_SIDED * math.sqrt(n)) / 2))
    khi = min(n, math.ceil((n + Z95_TWO_SIDED * math.sqrt(n)) / 2) + 1)
    km1, km2 = (n + 1) // 2, n // 2 + 1
    assert out["ci_lo"] == v[klo - 1]
    assert out["ci_hi"] == v[khi - 1]
    assert math.isclose(
        out["median_exact"], (v[km1 - 1] + v[km2 - 1]) / 2, abs_tol=5.01e-5
    )
    assert out["ci_lo"] <= out["median_exact"] <= out["ci_hi"]


def test_isotonic_minimax_equals_numpy_pava(spark, sf_dir):
    """The closed-form minimax fit must equal the sequential weighted
    PAVA solution (the classical identity the query's design rests on),
    and be monotone non-decreasing in the month index."""
    from big_data_audio_classification_spark.operators.ml_closed_form import (
        ml_isotonic_minimax,
    )

    rows = ml_isotonic_minimax(spark, sf_dir).orderBy("month_idx").collect()
    y = np.array([r["y_mean"] for r in rows])
    w = np.array([r["n_orders"] for r in rows], dtype=np.float64)
    fit = np.array([r["fit_isotonic"] for r in rows])
    # weighted PAVA via pooling stacks: each block is [Σwy, Σw, members]
    blocks = []
    for yi, wi in zip(y, w):
        blocks.append([wi * yi, wi, 1])
        while len(blocks) > 1 and (
            blocks[-2][0] / blocks[-2][1] >= blocks[-1][0] / blocks[-1][1]
        ):
            b = blocks.pop()
            blocks[-1][0] += b[0]
            blocks[-1][1] += b[1]
            blocks[-1][2] += b[2]
    expanded = []
    for swy, sw, cnt in blocks:
        expanded.extend([swy / sw] * cnt)
    assert len(expanded) == len(fit)
    assert np.allclose(fit, expanded, atol=1e-4)
    assert np.all(np.diff(fit) >= -1e-9)  # monotone


def test_zipf_fit_matches_numpy_replay(spark, sf_dir):
    from big_data_audio_classification_spark.operators.text import (
        ZIPF_TOP,
        text_zipf_fit,
    )

    out = text_zipf_fit(spark, sf_dir).collect()[0]
    docs = load_table(spark, sf_dir, "documents").select("text").collect()
    from collections import Counter

    c = Counter()
    for r in docs:
        c.update(t for t in r["text"].split(" ") if t)
    assert out["n_vocab"] == len(c)
    assert out["n_tokens"] == sum(c.values())
    head = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:ZIPF_TOP]
    lnr = np.log(np.arange(1, len(head) + 1, dtype=np.float64))
    lnc = np.log(np.array([n for _, n in head], dtype=np.float64))
    slope, intercept = np.polyfit(lnr, lnc, 1)
    assert math.isclose(out["zipf_slope"], slope, abs_tol=1e-4)
    assert math.isclose(out["zipf_intercept"], intercept, abs_tol=1e-4)
    assert out["zipf_slope"] < 0  # frequency decays with rank
    assert 0.0 <= out["r2"] <= 1.0


def test_mode_deterministic_matches_counter(spark, sf_dir):
    from big_data_audio_classification_spark.operators.aggregates import (
        agg_mode_deterministic,
    )

    out = {
        r["o_orderstatus"]: (r["mode_priority"], r["mode_count"])
        for r in agg_mode_deterministic(spark, sf_dir).collect()
    }
    rows = (
        load_table(spark, sf_dir, "orders")
        .select("o_orderstatus", "o_orderpriority")
        .collect()
    )
    from collections import Counter, defaultdict

    per = defaultdict(Counter)
    for r in rows:
        per[r["o_orderstatus"]][r["o_orderpriority"]] += 1
    for status, cnt in per.items():
        # ties resolve to the lexicographically largest value
        best = max(cnt.items(), key=lambda kv: (kv[1], kv[0]))
        assert out[status] == (best[0], best[1])


def test_power_analysis_matches_formula(spark, sf_dir):
    from big_data_audio_classification_spark.operators.experiments import (
        PWR_REL_EFFECT,
        PWR_Z80,
        stats_power_analysis,
    )

    for r in stats_power_analysis(spark, sf_dir).collect():
        assert math.isclose(
            r["mde"], PWR_REL_EFFECT * r["mean_value"], abs_tol=2e-6
        )
        expected = 2 * ((Z95_TWO_SIDED + PWR_Z80) * r["sd_value"] / r["mde"]) ** 2
        assert math.isclose(r["n_required_per_arm"], expected, rel_tol=1e-3)
        assert r["n_required_per_arm"] > 0


def test_nelson_aalen_dominates_kaplan_meier(spark, sf_dir):
    """Cross-estimator consistency: since 1−x ≤ e^−x, the Fleming-
    Harrington survival exp(−H_NA) must be ≥ the Kaplan-Meier product
    limit at every shared step, and H_NA must be non-decreasing."""
    from collections import defaultdict

    from big_data_audio_classification_spark.operators.experiments import (
        stats_kaplan_meier,
        stats_nelson_aalen,
    )

    km = {
        (r["segment"], r["t"]): r["s_km"]
        for r in stats_kaplan_meier(spark, sf_dir).collect()
    }
    na_rows = stats_nelson_aalen(spark, sf_dir).collect()
    assert na_rows
    by_seg = defaultdict(list)
    for r in na_rows:
        by_seg[r["segment"]].append((r["t"], r["h_na"], r["s_fh"]))
        key = (r["segment"], r["t"])
        assert key in km  # same steps: shared subject/risk construction
        assert r["s_fh"] >= km[key] - 1e-6
    for steps in by_seg.values():
        steps.sort()
        hs = [h for _, h, _ in steps]
        assert all(b >= a - 1e-9 for a, b in zip(hs, hs[1:]))


def test_mann_kendall_matches_numpy_replay(spark, sf_dir):
    """Direct S/variance/tau replay from the daily series, and
    agreement in direction with the Theil-Sen slope sign."""
    from big_data_audio_classification_spark.operators.timeseries import (
        stats_mann_kendall_trend,
    )

    out = stats_mann_kendall_trend(spark, sf_dir).collect()[0]
    daily = _daily_revenue(spark, sf_dir)
    y = np.array([rev for _, rev in daily])
    n = len(y)
    i, j = np.triu_indices(n, k=1)
    s = int(np.sign(y[j] - y[i]).sum())
    assert out["n_days"] == n
    assert out["s_stat"] == s
    _, counts = np.unique(y, return_counts=True)
    tie_var = int(sum(t * (t - 1) * (2 * t + 5) for t in counts if t > 1))
    var_s = (n * (n - 1) * (2 * n + 5) - tie_var) / 18.0
    assert math.isclose(out["var_s"], var_s, abs_tol=0.006)
    z = (s - 1) / math.sqrt(var_s) if s > 0 else ((s + 1) / math.sqrt(var_s) if s < 0 else 0.0)
    assert math.isclose(out["z"], z, abs_tol=5.01e-5)
    tie_pairs = int(sum(t * (t - 1) // 2 for t in counts if t > 1))
    d_full = n * (n - 1) / 2
    tau = s / math.sqrt((d_full - tie_pairs) * d_full)
    assert math.isclose(out["kendall_tau_b"], tau, abs_tol=5.01e-7)
    ts = stats_theil_sen(spark, sf_dir).collect()[0]
    if out["trend"] == "increasing":
        assert ts["ts_slope"] > 0
    elif out["trend"] == "decreasing":
        assert ts["ts_slope"] < 0


def test_cumulative_users_is_monotone_and_totals(spark, sf_dir):
    from big_data_audio_classification_spark.operators.timeseries import (
        events_cumulative_distinct_users,
    )

    rows = (
        events_cumulative_distinct_users(spark, sf_dir).orderBy("day").collect()
    )
    total_users = (
        load_table(spark, sf_dir, "events").select("user_id").distinct().count()
    )
    cums = [r["cumulative_users"] for r in rows]
    assert all(b >= a for a, b in zip(cums, cums[1:]))  # monotone
    assert cums[-1] == total_users  # every user counted exactly once
    assert sum(r["new_users"] for r in rows) == total_users


def test_harmonic_fit_matches_numpy_lstsq(spark, sf_dir):
    """Direct replay: design matrix [1, sin(2πdow/7), cos(2πdow/7)]
    least squares vs the covariance-Cramer closed form, plus the
    amplitude identity."""
    from big_data_audio_classification_spark.operators.timeseries import (
        analytics_harmonic_fit,
    )

    out = analytics_harmonic_fit(spark, sf_dir).collect()[0]
    daily = _daily_revenue(spark, sf_dir)
    y = np.array([rev for _, rev in daily])
    dow = np.array([d.isoweekday() - 1 for d, _ in daily])
    s = np.sin(2 * np.pi * dow / 7)
    c = np.cos(2 * np.pi * dow / 7)
    X = np.column_stack([np.ones_like(s), s, c])
    beta, *_ = np.linalg.lstsq(X, y, rcond=None)
    assert out["n_days"] == len(y)
    assert math.isclose(out["level"], beta[0], abs_tol=5e-3)
    assert math.isclose(out["b_sin"], beta[1], abs_tol=5e-3)
    assert math.isclose(out["b_cos"], beta[2], abs_tol=5e-3)
    assert math.isclose(
        out["amplitude"],
        math.hypot(out["b_sin"], out["b_cos"]),
        abs_tol=2e-4,
    )
    resid = y - X @ beta
    r2 = 1 - resid.var() / y.var()
    assert math.isclose(out["r2"], r2, abs_tol=1e-6)
    assert 0.0 <= out["r2"] <= 1.0


def test_anova_matches_pandas_replay(spark, sf_dir):
    from big_data_audio_classification_spark.operators.experiments import (
        stats_anova_oneway,
    )

    out = stats_anova_oneway(spark, sf_dir).collect()[0]
    pdf = (
        load_table(spark, sf_dir, "orders")
        .select("o_orderpriority", "o_totalprice")
        .toPandas()
    )
    groups = [g["o_totalprice"].to_numpy() for _, g in pdf.groupby("o_orderpriority")]
    n_total = sum(len(g) for g in groups)
    k = len(groups)
    grand = pdf["o_totalprice"].mean()
    ssb = sum(len(g) * (g.mean() - grand) ** 2 for g in groups)
    ssw = sum((len(g) - 1) * g.var(ddof=1) for g in groups)
    f = (ssb / (k - 1)) / (ssw / (n_total - k))
    assert out["n_total"] == n_total and out["k"] == k
    assert math.isclose(out["f_stat"], f, rel_tol=1e-4)
    assert math.isclose(out["eta_squared"], ssb / (ssb + ssw), abs_tol=1e-6)
    assert 0.0 <= out["eta_squared"] <= 1.0


def test_decision_stump_matches_numpy_exhaustive_replay(spark, sf_dir):
    """Recompute the histogram split search in numpy: identical
    binning, exhaustive weighted-Gini argmin, same tie-break."""
    import numpy as np

    from big_data_audio_classification_spark.operators.ml_closed_form import (
        STUMP_BINS,
        ml_decision_stump,
    )

    out = ml_decision_stump(spark, sf_dir).collect()[0]

    rows = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_extendedprice", "l_returnflag")
        .collect()
    )
    x = np.array([r["l_extendedprice"] for r in rows])
    y = np.array([1 if r["l_returnflag"] == "R" else 0 for r in rows])
    lo, hi = x.min(), x.max()
    bins = np.minimum(
        STUMP_BINS - 1,
        np.floor((x - lo) / ((hi - lo) / STUMP_BINS)).astype(np.int64),
    )
    n_b = np.bincount(bins, minlength=STUMP_BINS)
    p_b = np.bincount(bins, weights=y, minlength=STUMP_BINS)
    nl, pl = np.cumsum(n_b), np.cumsum(p_b)
    nt, pt = nl[-1], pl[-1]
    valid = (nl > 0) & (nt - nl > 0)

    def gini(p, n):
        return 1.0 - (p / n) ** 2 - ((n - p) / n) ** 2

    gw = np.where(
        valid,
        (nl * gini(np.maximum(pl, 0), np.maximum(nl, 1))
         + (nt - nl) * gini(pt - pl, np.maximum(nt - nl, 1))) / nt,
        np.inf,
    )
    best = int(np.argmin(gw))  # argmin takes the first (lowest bin) tie

    assert out["split_bin"] == best
    assert out["n_left"] == nl[best] and out["n_right"] == nt - nl[best]
    assert out["pos_left"] == pl[best] and out["pos_right"] == pt - pl[best]
    assert out["gini_split"] == pytest.approx(gw[best], abs=1e-6)
    assert out["gini_root"] == pytest.approx(gini(pt, nt), abs=1e-6)
    assert out["gain"] == pytest.approx(gini(pt, nt) - gw[best], abs=1e-6)
    assert out["gain"] >= 0
    assert out["split_value"] == pytest.approx(
        lo + (best + 1) * (hi - lo) / STUMP_BINS, abs=1e-6
    )


def test_ipw_ate_matches_pandas_replay(spark, sf_dir):
    """Hajek-IPW-with-discrete-propensity == stratified estimator: the
    pandas replay computes both the point estimate and Neyman SE."""
    import math

    import pandas as pd

    from big_data_audio_classification_spark.operators.experiments import (
        stats_ipw_ate,
    )

    o = pd.read_parquet(f"{sf_dir}/orders.parquet")
    o["t"] = (o["o_orderpriority"] == "1-URGENT").astype(int)
    o["y"] = (o["o_totalprice"] * 100).round().astype("int64")
    ate = se2 = 0.0
    used = 0
    groups = o.groupby("o_orderstatus")
    big_n = sum(
        len(g) for _, g in groups if 0 < g["t"].sum() < len(g)
    )
    for _, g in groups:
        n_t = g["t"].sum()
        if n_t == 0 or n_t == len(g):
            continue
        used += 1
        w = len(g) / big_n
        yt, yc = g.loc[g["t"] == 1, "y"], g.loc[g["t"] == 0, "y"]
        ate += w * (yt.mean() - yc.mean())
        se2 += w * w * (yt.var(ddof=0) / len(yt) + yc.var(ddof=0) / len(yc))

    row = stats_ipw_ate(spark, sf_dir).collect()[0]
    assert row.n_strata_used == used
    assert row.n_units == big_n
    assert math.isclose(row.ate_ipw, ate / 100.0, abs_tol=2e-5)
    assert math.isclose(row.se_ate, math.sqrt(se2) / 100.0, rel_tol=1e-6, abs_tol=1e-4)


def test_empirical_bayes_shrinkage_properties(spark, sf_dir):
    """EB shrinkage: pandas replay of the MoM prior + hard invariants
    (shrunk rates lie strictly between raw rate and pooled mean unless
    they coincide; thinnest customers shrink most)."""
    import math

    import pandas as pd

    from big_data_audio_classification_spark.operators.experiments import (
        stats_empirical_bayes_rates,
    )

    o = pd.read_parquet(f"{sf_dir}/orders.parquet")
    o["x"] = (o["o_orderpriority"] == "1-URGENT").astype(int)
    per = o.groupby("o_custkey")["x"].agg(["count", "sum"]).rename(
        columns={"count": "n", "sum": "x"}
    )
    sn, sx = per["n"].sum(), per["x"].sum()
    m = sx / sn
    sxx = (per["x"] * per["x"] / per["n"]).sum()
    snn = (per["n"] * per["n"]).sum()
    v_raw = (sxx - m * sx) / (sn - snn / sn)
    kappa = min(max((m * (1 - m) / v_raw - 1) if v_raw > 0 else 1e6, 0.0), 1e6)

    rows = stats_empirical_bayes_rates(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert math.isclose(r.kappa, round(kappa, 4), abs_tol=2e-4)
        assert math.isclose(r.pooled_m, round(m, 6), abs_tol=2e-6)
        expected = (r.x + kappa * m) / (r.n + kappa)
        assert math.isclose(r.eb_rate, expected, abs_tol=2e-6)
        lo, hi = sorted((r.raw_rate, round(m, 6)))
        assert lo - 1e-6 <= r.eb_rate <= hi + 1e-6
