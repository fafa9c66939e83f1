"""Invariants for the survival/A-B experimentation operators: a direct
Python Kaplan-Meier replay, curve monotonicity, and a from-scratch
two-proportion z recomputation."""

from __future__ import annotations

import math

import pytest
from collections import defaultdict

import pyspark.sql.functions as F

from big_data_audio_classification_spark.operators.experiments import (
    KM_CENSOR_DAYS,
    stats_ab_proportion_test,
    stats_kaplan_meier,
)
from big_data_audio_classification_spark.sources.catalog import load_table


def _subjects(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    rows = (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .groupBy("c_mktsegment", "o_custkey")
        .agg(
            F.min(F.col("o_orderdate").cast("date")).alias("first"),
            F.max(F.col("o_orderdate").cast("date")).alias("last"),
        )
        .collect()
    )
    horizon = max(r["last"] for r in rows)
    return [
        (
            r["c_mktsegment"],
            (r["last"] - r["first"]).days,
            1 if (horizon - r["last"]).days > KM_CENSOR_DAYS else 0,
        )
        for r in rows
    ]


def test_kaplan_meier_matches_direct_replay(spark, sf_dir):
    subj = _subjects(spark, sf_dir)
    by_seg = defaultdict(list)
    for seg, dur, ev in subj:
        by_seg[seg].append((dur, ev))
    expected = {}
    for seg, items in by_seg.items():
        items.sort()
        n = len(items)
        s = 1.0
        i = 0
        while i < len(items):
            t = items[i][0]
            d = sum(1 for x in items if x[0] == t and x[1] == 1)
            leaving = sum(1 for x in items if x[0] == t)
            if d > 0:
                s *= 1.0 - d / n
                expected[(seg, t)] = (d, n, s)
            n -= leaving
            while i < len(items) and items[i][0] == t:
                i += 1
    got = stats_kaplan_meier(spark, sf_dir).collect()
    assert len(got) > 0
    for r in got:
        d, n_risk, s = expected[(r["segment"], r["t"])]
        assert r["d"] == d and r["n_risk"] == n_risk
        assert abs(r["s_km"] - s) < 1e-5, (r, s)


def test_kaplan_meier_curve_shape(spark, sf_dir):
    rows = stats_kaplan_meier(spark, sf_dir).collect()
    by_seg = defaultdict(list)
    for r in rows:
        by_seg[r["segment"]].append((r["t"], r["s_km"], r["n_risk"]))
    for seg, pts in by_seg.items():
        pts.sort()
        for (t1, s1, n1), (t2, s2, n2) in zip(pts, pts[1:]):
            assert s2 < s1 + 1e-12, (seg, t1, t2)  # non-increasing
            assert n2 < n1, (seg, t1, t2)  # at-risk strictly shrinks
        assert all(0.0 < s <= 1.0 for _, s, _ in pts)


def test_ab_test_z_matches_manual(spark, sf_dir):
    e = load_table(spark, sf_dir, "events").collect()
    arms = {0: [0, 0], 1: [0, 0]}
    for r in e:
        a = r["event_id"] % 2
        arms[a][0] += 1
        arms[a][1] += 1 if r["event_type"] == "purchase" else 0
    (n_a, c_a), (n_b, c_b) = arms[0], arms[1]
    pool = (c_a + c_b) / (n_a + n_b)
    z = (c_b / n_b - c_a / n_a) / math.sqrt(
        pool * (1 - pool) * (1 / n_a + 1 / n_b)
    )
    row = stats_ab_proportion_test(spark, sf_dir).collect()[0]
    assert (row["n_a"], row["conv_a"], row["n_b"], row["conv_b"]) == (
        n_a,
        c_a,
        n_b,
        c_b,
    )
    assert abs(row["z"] - z) < 1e-5
    assert row["significant_95"] == (abs(z) > 1.959963985)


def test_bh_fdr_step_up_property(spark, sf_dir):
    """BH validity: rejections form exactly the prefix {rk <= k*} of the
    p-ascending order, with k* the largest rank where p <= rk*q/m, and
    the erf-based p-values agree with math.erfc."""
    from big_data_audio_classification_spark.operators.experiments import (
        BH_Q,
        stats_bh_fdr,
    )

    rows = sorted(stats_bh_fdr(spark, sf_dir).collect(), key=lambda r: r["rk"])
    m = len(rows)
    k_star = max((r["rk"] for r in rows if r["p"] <= r["rk"] * BH_Q / m), default=0)
    for r in rows:
        assert r["rejected"] == (r["rk"] <= k_star), r
        # A&S polynomial |err| < 1.5e-7, plus the 1e-6 rounding
        exact_p = math.erfc(abs(r["z"]) / math.sqrt(2))
        assert abs(r["p"] - exact_p) < 5e-6, r
    ps = [r["p"] for r in rows]
    assert ps == sorted(ps)


def test_quantile_normalize_aligns_deciles(spark, sf_dir):
    """Every source's decile maps to the SAME target value (that's the
    point of quantile normalization), decile cell sizes are balanced
    (NTILE), and the target is the cross-source mean of raw means."""
    from collections import defaultdict

    from big_data_audio_classification_spark.operators.experiments import (
        stats_quantile_normalize,
    )

    rows = stats_quantile_normalize(spark, sf_dir).collect()
    by_decile = defaultdict(list)
    for r in rows:
        by_decile[r["decile"]].append(r)
    for dec, cells in by_decile.items():
        targets = {r["qnorm_value"] for r in cells}
        assert len(targets) == 1, (dec, targets)
        mean_raw = sum(r["raw_mean"] for r in cells) / len(cells)
        assert abs(next(iter(targets)) - mean_raw) < 1e-4
    sizes = defaultdict(set)
    for r in rows:
        sizes[r["source"]].add(r["n_docs"])
    for src, ns in sizes.items():
        assert max(ns) - min(ns) <= 1, (src, ns)  # NTILE balance


def test_bandit_posteriors_match_beta_moments(spark, sf_dir):
    from big_data_audio_classification_spark.operators.experiments import (
        stats_bandit_posteriors,
    )

    rows = stats_bandit_posteriors(spark, sf_dir).collect()
    assert len(rows) == 4
    leaders = [r for r in rows if r["is_leader"]]
    assert len(leaders) >= 1
    best_mean = max(r["post_mean"] for r in rows)
    for r in rows:
        a, b = r["conv"] + 1, r["n"] - r["conv"] + 1
        mean = a / (a + b)
        sd = math.sqrt(a * b / ((a + b) ** 2 * (a + b + 1)))
        assert abs(r["post_mean"] - mean) < 1e-5
        assert abs(r["post_sd"] - sd) < 1e-5
        assert r["ci_lo"] < mean < r["ci_hi"]
        if r["is_leader"]:
            assert r["post_mean"] == best_mean
            assert r["p_best_beats"] == 1.0
        else:
            assert 0.5 <= r["p_best_beats"] <= 1.0


def test_join_skew_selfjoin_prediction_is_exact(spark, sf_dir):
    from collections import Counter

    from big_data_audio_classification_spark.operators.scale_patterns import (
        profile_join_skew,
    )

    keys = [
        r["l_partkey"]
        for r in load_table(spark, sf_dir, "lineitem")
        .select("l_partkey")
        .collect()
    ]
    counts = Counter(keys)
    row = profile_join_skew(spark, sf_dir).collect()[0]
    assert row["n_rows"] == len(keys)
    assert row["n_keys"] == len(counts)
    assert row["max_mult"] == max(counts.values())
    assert row["selfjoin_rows"] == sum(c * c for c in counts.values())
    assert row["p50_mult"] <= row["p99_mult"] <= row["max_mult"]
    # the prediction is literally the self-join's output cardinality
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey")
    joined = li.alias("a").join(li.alias("b"), "l_partkey").count()
    assert joined == row["selfjoin_rows"]


def test_runs_test_matches_manual_replay(spark, sf_dir):
    from big_data_audio_classification_spark.operators.experiments import (
        stats_runs_test,
    )

    daily = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.col("o_orderdate").cast("date").alias("d"))
        .agg(F.round(F.sum("o_totalprice"), 2).alias("rev"))
        .orderBy("d")
        .collect()
    )
    signs = []
    for prev, cur in zip(daily, daily[1:]):
        if cur["rev"] > prev["rev"]:
            signs.append(1)
        elif cur["rev"] < prev["rev"]:
            signs.append(-1)
    n1 = signs.count(1)
    n2 = signs.count(-1)
    runs = 1 + sum(1 for a, b in zip(signs, signs[1:]) if a != b)
    row = stats_runs_test(spark, sf_dir).collect()[0]
    assert (row["n_up"], row["n_down"], row["n_runs"]) == (n1, n2, runs)
    e = 2 * n1 * n2 / (n1 + n2) + 1
    var = 2 * n1 * n2 * (2 * n1 * n2 - n1 - n2) / ((n1 + n2) ** 2 * (n1 + n2 - 1))
    assert abs(row["z"] - (runs - e) / math.sqrt(var)) < 1e-5


def test_poisson_bootstrap_matches_numpy_lcg_replay(spark, sf_dir):
    """Replicate the counter-based LCG + inverse-CDF weights in numpy
    and recompute every output column independently."""
    import numpy as np

    from big_data_audio_classification_spark.operators.experiments import (
        BOOT_REPLICATES,
        LCG_A,
        LCG_C,
        LCG_M,
        POISSON1_CDF,
        stats_poisson_bootstrap_ci,
    )

    out = stats_poisson_bootstrap_ci(spark, sf_dir).collect()[0]

    o = (
        load_table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_totalprice")
        .collect()
    )
    keys = np.array([r["o_orderkey"] for r in o], dtype=np.int64)
    cents = np.rint(
        np.array([r["o_totalprice"] for r in o]) * 100
    ).astype(np.int64)
    reps = np.arange(BOOT_REPLICATES, dtype=np.int64)
    s0 = (keys[:, None] * BOOT_REPLICATES + reps[None, :]) % LCG_M
    x1 = (LCG_A * s0 + LCG_C) % LCG_M
    x2 = (LCG_A * x1 + LCG_C) % LCG_M
    u = x2 / float(LCG_M)
    w = np.searchsorted(np.array(POISSON1_CDF), u, side="right")
    m = np.round(
        (w * cents[:, None]).sum(axis=0) / 100.0 / w.sum(axis=0), 6
    )
    point = cents.sum() / 100.0 / len(cents)
    se = float(np.sqrt(((m - m.mean()) ** 2).sum() / (len(m) - 1)))

    assert out["n_replicates"] == BOOT_REPLICATES
    assert out["point_mean"] == pytest.approx(round(point, 6), abs=1e-6)
    assert out["boot_mean"] == pytest.approx(float(m.mean()), abs=1e-4)
    assert out["boot_se"] == pytest.approx(se, rel=1e-6)
    # the interval brackets the point estimate and is symmetric
    assert out["ci_lo"] < out["point_mean"] < out["ci_hi"]
    assert (out["ci_hi"] - out["point_mean"]) == pytest.approx(
        out["point_mean"] - out["ci_lo"], abs=0.02
    )
    # weights behave like Poisson(1): overall mean multiplicity ~ 1
    assert abs(w.mean() - 1.0) < 0.01


def test_cuped_matches_numpy_replay(spark, sf_dir):
    """Recompute theta, the adjusted means, and the variance-reduction
    percentages from scratch in numpy, and check the CUPED invariant
    that pooled-weighted adjustments cancel (Σ n·(adj − raw) = 0)."""
    import numpy as np

    from big_data_audio_classification_spark.operators.experiments import (
        CUPED_SPLIT,
        stats_cuped_adjustment,
    )

    out = {r["arm"]: r for r in stats_cuped_adjustment(spark, sf_dir).collect()}

    rows = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .select("user_id", "ts", "value")
        .collect()
    )
    split = __import__("datetime").datetime.fromisoformat(CUPED_SPLIT)
    per_user = defaultdict(lambda: [0, 0])  # user -> [x_cents, y_cents]
    for r in rows:
        per_user[r["user_id"]][0 if r["ts"] < split else 1] += int(
            round(r["value"] * 100)
        )
    users = sorted(per_user)
    x = np.array([per_user[u][0] / 100.0 for u in users])
    y = np.array([per_user[u][1] / 100.0 for u in users])
    arm = np.array([u % 2 for u in users])
    theta = np.cov(x, y, bias=True)[0, 1] / np.var(x)
    xbar = x.mean()
    deltas = []
    for a in (0, 1):
        m = arm == a
        raw = y[m].mean()
        adj = raw - theta * (x[m].mean() - xbar)
        assert out[a]["n"] == int(m.sum())
        assert out[a]["mean_metric"] == pytest.approx(raw, abs=1e-5)
        assert out[a]["mean_cuped"] == pytest.approx(adj, abs=1e-5)
        assert out[a]["theta"] == pytest.approx(theta, abs=1e-5)
        y_adj = y[m] - theta * x[m]
        red = 100 * (1 - np.var(y_adj) / np.var(y[m]))
        assert out[a]["var_reduction_pct"] == pytest.approx(red, abs=1e-3)
        deltas.append(m.sum() * (adj - raw))
    assert abs(sum(deltas)) < 1e-6 * len(users)


def test_permutation_test_matches_numpy_lcg_replay(spark, sf_dir):
    """Null distribution and p-value must equal a numpy replay of the
    counter-based LCG reassignment."""
    import numpy as np
    import pandas as pd

    from big_data_audio_classification_spark.operators.experiments import (
        LCG_A, LCG_C, LCG_M,
        PERM_OFFSET, PERM_REPLICATES,
        stats_permutation_test,
    )

    pdf = pd.read_parquet(f"{sf_dir}/orders.parquet")
    cents = (pdf["o_totalprice"] * 100).round().astype("int64").to_numpy()
    keys = pdf["o_orderkey"].astype("int64").to_numpy()
    arm = (pdf["o_custkey"] % 2).to_numpy()
    obs = round(
        cents[arm == 1].sum() / 100.0 / (arm == 1).sum()
        - cents[arm == 0].sum() / 100.0 / (arm == 0).sum(), 6)

    ds = []
    for rep in range(PERM_REPLICATES):
        s0 = (keys * PERM_REPLICATES + rep + PERM_OFFSET) % LCG_M
        x2 = (LCG_A * ((LCG_A * s0 + LCG_C) % LCG_M) + LCG_C) % LCG_M
        side = (x2 / LCG_M >= 0.5).astype(int)
        if side.sum() == 0 or (1 - side).sum() == 0:
            continue
        ds.append(round(
            cents[side == 1].sum() / 100.0 / (side == 1).sum()
            - cents[side == 0].sum() / 100.0 / (side == 0).sum(), 6))
    ds = np.array(ds)
    p = round((1.0 + (np.abs(ds) >= abs(obs)).sum()) / (1.0 + len(ds)), 4)

    r = stats_permutation_test(spark, sf_dir).collect()[0]
    assert r.n_perms == len(ds)
    assert abs(r.obs_diff - round(obs, 4)) < 1e-9
    assert abs(r.null_mean - round(ds.mean(), 4)) < 1e-9
    assert abs(r.p_value - p) < 1e-9
    # arms are a hash split of a null effect: the test must not reject
    assert r.p_value > 0.01


def test_logrank_matches_pandas_replay(spark, sf_dir):
    """O-E, variance, and z must equal a pandas replay of the
    hypergeometric accumulation."""
    import pandas as pd

    from big_data_audio_classification_spark.operators.experiments import (
        KM_CENSOR_DAYS,
        stats_logrank_test,
    )

    pdf = pd.read_parquet(f"{sf_dir}/orders.parquet")
    pdf["d"] = pd.to_datetime(pdf["o_orderdate"]).dt.normalize()
    maxd = pdf["d"].max()
    subj = pdf.groupby("o_custkey").agg(first=("d", "min"), last=("d", "max"))
    subj["g"] = (subj.index % 2).astype(int)
    subj["duration"] = (subj["last"] - subj["first"]).dt.days
    subj["event"] = ((maxd - subj["last"]).dt.days > KM_CENSOR_DAYS).astype(int)

    o1 = e1 = v = 0.0
    for t in sorted(subj["duration"].unique()):
        at = subj[subj["duration"] >= t]
        ev = subj[subj["duration"] == t]
        nt, dt = len(at), int(ev["event"].sum())
        n1 = int((at["g"] == 1).sum())
        d1 = int(ev.loc[ev["g"] == 1, "event"].sum())
        if dt > 0 and nt > 1:
            o1 += d1
            e1 += dt * n1 / nt
            v += dt * (n1 / nt) * (1 - n1 / nt) * (nt - dt) / (nt - 1)

    r = stats_logrank_test(spark, sf_dir).collect()[0]
    assert r.o1 == int(o1)
    assert abs(r.e1 - e1) < 1e-5
    assert abs(r.var_logrank - v) < 1e-5
    assert abs(r.z - (o1 - e1) / v**0.5) < 1e-3
    assert abs(r.chi2 - r.z**2) < 1e-2


def test_jackknife_ratio_matches_numpy_replay(spark, sf_dir):
    """θ, bias, and se must equal a numpy delete-one-bucket replay;
    the CI must cover the point estimate and agree with the bootstrap
    CI's order of magnitude."""
    import numpy as np
    import pandas as pd

    from big_data_audio_classification_spark.operators.experiments import (
        JK_BUCKETS,
        stats_jackknife_ratio,
    )

    pdf = pd.read_parquet(f"{sf_dir}/orders.parquet")
    cents = (pdf["o_totalprice"] * 100).round().astype("int64")
    g = (pdf["o_custkey"] % JK_BUCKETS).to_numpy()
    s = np.array([cents[g == i].sum() for i in range(JK_BUCKETS)])
    n = np.array([(g == i).sum() for i in range(JK_BUCKETS)])
    keep = n > 0
    s, n = s[keep], n[keep]
    theta = s.sum() / 100.0 / n.sum()
    loo = np.round((s.sum() - s) / 100.0 / (n.sum() - n), 6)
    G = len(loo)
    se = np.sqrt((G - 1.0) / G * ((loo**2).sum() - loo.sum() ** 2 / G))
    bias = (G - 1) * (loo.mean() - theta)

    r = stats_jackknife_ratio(spark, sf_dir).collect()[0]
    assert r.n_buckets == G
    assert abs(r.theta - theta) < 1e-5
    assert abs(r.jk_bias - bias) < 1e-5
    assert abs(r.jk_se - se) < 1e-5
    assert r.ci_lo < r.theta < r.ci_hi


def test_sprt_matches_numpy_walk_replay(spark, sf_dir):
    """Decision day, decision, and the stopped llr must equal a numpy
    replay of the Wald walk; early stopping must never overrun the
    horizon."""
    import numpy as np
    import pandas as pd

    from big_data_audio_classification_spark.operators.experiments import (
        SPRT_A, SPRT_B, SPRT_LLR_F, SPRT_LLR_S,
        stats_sprt_sequential,
    )

    pdf = pd.read_parquet(f"{sf_dir}/orders.parquet")
    day = pd.to_datetime(pdf["o_orderdate"]).dt.normalize()
    g = pd.DataFrame(
        {"n": 1, "s": (pdf["o_orderstatus"] == "F").astype(int)}
    ).groupby(day).sum().sort_index()
    cs, cn = g["s"].cumsum().to_numpy(), g["n"].cumsum().to_numpy()
    llr = np.round(cs * SPRT_LLR_S + (cn - cs) * SPRT_LLR_F, 6)
    hit = np.where((llr >= SPRT_A) | (llr <= SPRT_B))[0]

    r = stats_sprt_sequential(spark, sf_dir).collect()[0]
    assert r.n_days == len(g)
    assert abs(r.final_llr - llr[-1]) < 1e-9
    if len(hit):
        i = hit[0]
        assert r.decision_day == g.index[i].strftime("%Y-%m-%d")
        assert r.decision == ("accept_h1" if llr[i] >= SPRT_A else "accept_h0")
        assert abs(r.llr_at_decision - llr[i]) < 1e-9
        assert r.trials_at_decision == cn[i] <= cn[-1]
    else:
        assert r.decision == "continue"


def test_rmst_matches_pandas_km_integral(spark, sf_dir):
    """RMST per arm must equal a pandas KM replay integrated to tau,
    and must be bounded by tau."""
    import pandas as pd

    from big_data_audio_classification_spark.operators.experiments import (
        KM_CENSOR_DAYS,
        RMST_TAU,
        stats_rmst,
    )

    pdf = pd.read_parquet(f"{sf_dir}/orders.parquet")
    pdf["d"] = pd.to_datetime(pdf["o_orderdate"]).dt.normalize()
    maxd = pdf["d"].max()
    subj = pdf.groupby("o_custkey").agg(first=("d", "min"), last=("d", "max"))
    subj["g"] = (subj.index % 2).astype(int)
    subj["dur"] = (subj["last"] - subj["first"]).dt.days
    subj["event"] = ((maxd - subj["last"]).dt.days > KM_CENSOR_DAYS).astype(int)

    rows = {r.g: r for r in stats_rmst(spark, sf_dir).collect()}
    for g in (0, 1):
        grp = subj[subj["g"] == g]
        n_risk = len(grp)
        s = 1.0
        prev_t, prev_s = 0, 1.0
        auc = 0.0
        last_t, last_s = 0, 1.0
        for t in sorted(grp["dur"].unique()):
            at = grp[grp["dur"] == t]
            d = int(at["event"].sum())
            # exact replay of the step integral with per-step rounding
            if d > 0 and t <= RMST_TAU:
                auc += prev_s * (t - prev_t)
                s *= 1 - d / n_risk
                prev_t, prev_s = t, round(s, 6)
                last_t, last_s = t, round(s, 6)
            n_risk -= len(at)
        rmst = auc + last_s * (RMST_TAU - last_t)
        r = rows[g]
        assert abs(r.rmst - rmst) < 0.51  # step-rounding tolerance
        assert 0 < r.rmst <= RMST_TAU
        assert r.last_event_t == last_t
