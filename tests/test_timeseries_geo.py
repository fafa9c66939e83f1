"""Invariant tests for the round-3 timeseries/geo/closed-form-ML/CMS
batch, complementing the tri-SF DuckDB oracle gate with properties the
oracle cannot state (recursion parity, dominance soundness, brute-force
distance parity, one-sided sketch guarantees, numpy OLS parity).
"""

from __future__ import annotations

import math

import numpy as np
import pyspark.sql.functions as F

from big_data_audio_classification_spark.operators.geo import (
    GEO_LAT_MULT,
    GEO_LON_MULT,
    GEO_MOD,
    GEO_RADIUS_KM,
    analytics_skyline_pareto,
    geo_cell_distance_join,
)
from big_data_audio_classification_spark.operators.graph import (
    KHOP_SEEDS,
    graph_khop_reachability,
)
from big_data_audio_classification_spark.operators.ml_closed_form import (
    ml_naive_bayes_tokens,
    ml_ols_normal_equations,
)
from big_data_audio_classification_spark.operators.sketch_cms import (
    CMS_DOMAIN,
    CMS_EPS,
    CMS_SEED,
    cms_estimate_long,
    decode_cms,
)
from big_data_audio_classification_spark.operators.timeseries import (
    events_cusum_changepoint,
    events_markov_transitions,
)
from big_data_audio_classification_spark.sources.catalog import load_table


def test_markov_rows_normalize(spark, sf_dir):
    rows = events_markov_transitions(spark, sf_dir).collect()
    by_cur: dict[str, float] = {}
    for r in rows:
        by_cur[r["cur_type"]] = by_cur.get(r["cur_type"], 0.0) + r["p_next"]
    for cur, total in by_cur.items():
        assert abs(total - 1.0) < 1e-4, (cur, total)


def test_cusum_closed_form_equals_recursion(spark, sf_dir):
    """S_t = cum_t − min(0, min cum) must equal the textbook recursion
    S_t = max(0, S_{t-1} + y_t) replayed directly on the day series."""
    e = load_table(spark, sf_dir, "events")
    daily = (
        e.groupBy(F.col("ts").cast("date").alias("d"))
        .agg(F.round(F.avg("value"), 6).alias("x"))
        .orderBy("d")
        .collect()
    )
    xs = [r["x"] for r in daily]
    mu = sum(xs) / len(xs)
    sd = math.sqrt(sum((x - mu) ** 2 for x in xs) / len(xs))
    s, expected = 0.0, {}
    for r, x in zip(daily, xs):
        s = max(0.0, s + (x - mu - 0.5 * sd))
        expected[str(r["d"])] = s
    got = events_cusum_changepoint(spark, sf_dir).collect()
    assert len(got) > 0
    for r in got:
        assert abs(r["cusum_pos"] - expected[r["d"]]) < 1e-4, r


def test_skyline_frontier_is_sound_and_complete(spark, sf_dir):
    parts = [
        (r["p_partkey"], r["p_retailprice"], r["p_size"])
        for r in load_table(spark, sf_dir, "part")
        .select("p_partkey", "p_retailprice", "p_size")
        .collect()
    ]

    def dominated(p):
        return any(
            q[1] <= p[1] and q[2] >= p[2] and (q[1] < p[1] or q[2] > p[2])
            for q in parts
        )

    expected = {p[0] for p in parts if not dominated(p)}
    got = {
        r["p_partkey"] for r in analytics_skyline_pareto(spark, sf_dir).collect()
    }
    assert got == expected


def test_geo_join_matches_bruteforce(spark, sf_dir):
    cust = load_table(spark, sf_dir, "customer").select("c_custkey").collect()
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey").collect()

    def coords(key):
        return (
            (key * GEO_LAT_MULT) % GEO_MOD / 1e4,
            (key * GEO_LON_MULT) % GEO_MOD / 1e4,
        )

    def hav(lat1, lon1, lat2, lon2):
        dlat = math.radians(lat2 - lat1)
        dlon = math.radians(lon2 - lon1)
        a = (
            math.sin(dlat / 2) ** 2
            + math.cos(math.radians(lat1))
            * math.cos(math.radians(lat2))
            * math.sin(dlon / 2) ** 2
        )
        return 2 * 6371.0 * math.asin(math.sqrt(a))

    brute = []
    for c in cust:
        clat, clon = coords(c["c_custkey"])
        for s in supp:
            slat, slon = coords(s["s_suppkey"])
            d = round(hav(clat, clon, slat, slon), 3)
            if d <= GEO_RADIUS_KM:
                brute.append((d, c["c_custkey"], s["s_suppkey"]))
    brute.sort()
    got = [
        (r["dist_km"], r["c_custkey"], r["s_suppkey"])
        for r in geo_cell_distance_join(spark, sf_dir).collect()
    ]
    assert got == brute[: len(got)]


def test_khop_hops_are_consistent(spark, sf_dir):
    rows = graph_khop_reachability(spark, sf_dir).collect()
    hops = {r["node"]: r["min_hop"] for r in rows}
    seeds = {n for n, h in hops.items() if h == 0}
    keys = [
        r["c_custkey"]
        for r in load_table(spark, sf_dir, "customer")
        .select("c_custkey")
        .collect()
    ]
    assert seeds == {k for k in keys if k <= KHOP_SEEDS}
    n = max(keys)
    for node, h in hops.items():
        if h == 0:
            continue
        preds = [
            u
            for u, hu in hops.items()
            if hu == h - 1
            and node in (1 + u * 48271 % n, 1 + u * 16807 % n)
            and node != u
        ]
        assert preds, (node, h)


def test_ols_matches_numpy_lstsq(spark, sf_dir):
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_returnflag", "l_quantity", "l_discount", "l_extendedprice")
        .collect()
    )
    got = {r["l_returnflag"]: r for r in ml_ols_normal_equations(spark, sf_dir).collect()}
    for flag in got:
        rows = [r for r in li if r["l_returnflag"] == flag]
        X = np.array([[1.0, r["l_quantity"], r["l_discount"]] for r in rows])
        y = np.array([r["l_extendedprice"] for r in rows])
        beta, *_ = np.linalg.lstsq(X, y, rcond=None)
        assert abs(got[flag]["beta0"] - beta[0]) < 1e-2
        assert abs(got[flag]["beta_qty"] - beta[1]) < 1e-4
        assert abs(got[flag]["beta_disc"] - beta[2]) < 1e-2
        resid = y - X @ beta
        r2 = 1 - resid @ resid / ((y - y.mean()) @ (y - y.mean()))
        assert abs(got[flag]["r2"] - r2) < 1e-6


def test_naive_bayes_covers_every_doc(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    docs_n = docs.count()
    majority = (
        docs.groupBy("lang").count().agg(F.max("count")).collect()[0][0]
    )
    rows = ml_naive_bayes_tokens(spark, sf_dir).collect()
    assert sum(r["n_docs"] for r in rows) == docs_n
    diag = sum(r["n_docs"] for r in rows if r["lang"] == r["pred_lang"])
    # resubstitution NB must beat the majority-class baseline (the
    # synthetic corpus shares most vocabulary across langs, so the
    # margin is real but not dramatic)
    assert diag > majority, (diag, majority, docs_n)


def test_cms_estimate_is_one_sided_for_all_keys(spark, sf_dir):
    """CMS overestimates only — est ≥ exact must hold DETERMINISTICALLY
    for every key in the domain (not just the 8 probes), and the ε·N
    bound must hold for the vast majority."""
    o = load_table(spark, sf_dir, "orders").select(
        (F.col("o_custkey") % CMS_DOMAIN).alias("k")
    )
    blob = bytes(
        o.agg(
            F.expr(
                f"count_min_sketch(k, {CMS_EPS}d, 0.99d, {CMS_SEED})"
            ).alias("s")
        ).collect()[0]["s"]
    )
    total, hash_a, table = decode_cms(blob)
    exact = {
        r["k"]: r["cnt"]
        for r in o.groupBy("k").agg(F.count("*").alias("cnt")).collect()
    }
    assert total == sum(exact.values())
    slack = math.ceil(CMS_EPS * total)
    n_out_of_bound = 0
    for k, cnt in exact.items():
        est = cms_estimate_long(k, hash_a, table)
        assert est >= cnt, (k, est, cnt)
        if est > cnt + slack:
            n_out_of_bound += 1
    assert n_out_of_bound <= max(1, len(exact) // 100)


def test_acf_matches_numpy_on_day_series(spark, sf_dir):
    from big_data_audio_classification_spark.operators.timeseries import (
        analytics_acf_daily,
    )

    daily = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.col("o_orderdate").cast("date").alias("d"))
        .agg(F.round(F.sum("o_totalprice"), 2).alias("rev"))
        .orderBy("d")
        .collect()
    )
    by_day = {r["d"]: r["rev"] for r in daily}
    xs = np.array([r["rev"] for r in daily])
    mu, ss = xs.mean(), ((xs - xs.mean()) ** 2).sum()
    import datetime

    got = {r["lag_d"]: r for r in analytics_acf_daily(spark, sf_dir).collect()}
    assert set(got) == set(range(1, 15))
    for k, r in got.items():
        num, n_pairs = 0.0, 0
        for rr in daily:
            d2 = rr["d"] + datetime.timedelta(days=k)
            if d2 in by_day:
                num += (rr["rev"] - mu) * (by_day[d2] - mu)
                n_pairs += 1
        assert r["n_pairs"] == n_pairs
        assert abs(r["acf"] - num / ss) < 1e-4, (k, r["acf"], num / ss)
        assert -1.0 <= r["acf"] <= 1.0


def test_forecast_eval_mase_denominator_is_naive1(spark, sf_dir):
    from big_data_audio_classification_spark.operators.timeseries import (
        analytics_forecast_eval,
    )

    daily = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.col("o_orderdate").cast("date").alias("d"))
        .agg(F.round(F.sum("o_totalprice"), 2).alias("rev"))
        .orderBy("d")
        .collect()
    )
    import datetime

    by_day = {r["d"]: r["rev"] for r in daily}
    errs, naive = [], []
    for r in daily:
        prev7 = r["d"] - datetime.timedelta(days=7)
        prev1 = r["d"] - datetime.timedelta(days=1)
        if prev7 in by_day:
            errs.append(abs(r["rev"] - by_day[prev7]))
        if prev1 in by_day:
            naive.append(abs(r["rev"] - by_day[prev1]))
    row = analytics_forecast_eval(spark, sf_dir).collect()[0]
    assert row["n_forecasts"] == len(errs)
    mae = sum(errs) / len(errs)
    assert abs(row["mae"] - mae) < 0.02
    assert abs(row["mase"] - mae / (sum(naive) / len(naive))) < 1e-4
    assert 0.0 < row["smape"] < 2.0


def test_seasonal_indices_average_to_one_weighted(spark, sf_dir):
    from big_data_audio_classification_spark.operators.timeseries import (
        events_seasonal_dow_index,
    )

    rows = events_seasonal_dow_index(spark, sf_dir).collect()
    assert {r["dow"] for r in rows} == set(range(1, 8))
    n = sum(r["n_days"] for r in rows)
    weighted = sum(r["seasonal_index"] * r["n_days"] for r in rows) / n
    assert abs(weighted - 1.0) < 1e-4  # Σ n_d·(mean_d/gmu) / N = 1


def test_top_paths_match_bruteforce_trigrams(spark, sf_dir):
    from collections import Counter, defaultdict

    from big_data_audio_classification_spark.operators.timeseries import (
        events_top_paths,
    )

    ev = (
        load_table(spark, sf_dir, "events")
        .select("user_id", "ts", "event_id", "event_type")
        .collect()
    )
    by_user = defaultdict(list)
    for r in ev:
        by_user[r["user_id"]].append((r["ts"], r["event_id"], r["event_type"]))
    tri = Counter()
    for seq in by_user.values():
        seq.sort()
        types = [t for _, _, t in seq]
        for i in range(len(types) - 2):
            tri[tuple(types[i : i + 3])] += 1
    got = events_top_paths(spark, sf_dir).collect()
    ranked = sorted(tri.items(), key=lambda kv: (-kv[1], kv[0]))
    want = [(k[0], k[1], k[2], n) for k, n in ranked[: len(got)]]
    assert [(r["e1"], r["e2"], r["e3"], r["n_paths"]) for r in got] == want


def test_segment_migration_rows_normalize_and_cover(spark, sf_dir):
    from big_data_audio_classification_spark.operators.timeseries import (
        analytics_segment_migration,
    )

    rows = analytics_segment_migration(spark, sf_dir).collect()
    assert all(1 <= r["seg_before"] <= 5 and 1 <= r["seg_after"] <= 5 for r in rows)
    from collections import defaultdict

    by_from = defaultdict(float)
    for r in rows:
        by_from[r["seg_before"]] += r["p_move"]
    for seg, total in by_from.items():
        assert abs(total - 1.0) < 1e-4, (seg, total)


def test_nearest_supplier_matches_bruteforce(spark, sf_dir):
    from big_data_audio_classification_spark.operators.geo import (
        GEO_KNN_CUST_CAP,
        geo_nearest_supplier,
    )

    cust = [
        r["c_custkey"]
        for r in load_table(spark, sf_dir, "customer")
        .where(F.col("c_custkey") < GEO_KNN_CUST_CAP)
        .select("c_custkey")
        .collect()
    ]
    supp = [
        r["s_suppkey"]
        for r in load_table(spark, sf_dir, "supplier")
        .select("s_suppkey")
        .collect()
    ]

    def coords(key):
        return (
            (key * GEO_LAT_MULT) % GEO_MOD / 1e4,
            (key * GEO_LON_MULT) % GEO_MOD / 1e4,
        )

    def hav(lat1, lon1, lat2, lon2):
        dlat = math.radians(lat2 - lat1)
        dlon = math.radians(lon2 - lon1)
        a = (
            math.sin(dlat / 2) ** 2
            + math.cos(math.radians(lat1))
            * math.cos(math.radians(lat2))
            * math.sin(dlon / 2) ** 2
        )
        return 2 * 6371.0 * math.asin(math.sqrt(a))

    want = {}
    for c in cust:
        clat, clon = coords(c)
        best = None
        for s in supp:
            slat, slon = coords(s)
            d = round(hav(clat, clon, slat, slon), 3)
            if d <= 50.0 and (best is None or (d, s) < best):
                best = (d, s)
        if best:
            want[c] = (best[1], best[0])
    got = {
        r["c_custkey"]: (r["nearest_suppkey"], r["dist_km"])
        for r in geo_nearest_supplier(spark, sf_dir).collect()
    }
    assert got == want


def test_paa_sax_matches_pandas_replay(spark, sf_dir):
    """SAX symbols and z-scores must match a pandas replay of the
    daily-cents -> segment-PAA -> z-normalize -> bin pipeline."""
    import math

    import pandas as pd

    from big_data_audio_classification_spark.operators.timeseries import (
        _SAX_BP,
        _SAX_SEG_DAYS,
        timeseries_paa_sax,
    )

    o = pd.read_parquet(f"{sf_dir}/orders.parquet")[["o_orderdate", "o_totalprice"]]
    o["d"] = o["o_orderdate"].dt.date
    o["cents"] = (o["o_totalprice"] * 100).round().astype("int64")
    daily = o.groupby("d")["cents"].sum().sort_index()
    d0 = daily.index.min()
    n = len(daily)
    mu = daily.sum() / n
    sigma = math.sqrt(float((daily.astype(object) ** 2).sum()) / n - mu * mu)
    seg = daily.groupby(
        daily.index.map(lambda d: (d - d0).days // _SAX_SEG_DAYS)
    ).agg(["sum", "count"])
    expected = {}
    for seg_no, row in seg.iterrows():
        z = (row["sum"] / row["count"] - mu) / sigma
        sym = "a" if z < -_SAX_BP else "b" if z < 0 else "c" if z < _SAX_BP else "d"
        expected[seg_no] = (int(row["count"]), round(z, 6), sym)

    got = timeseries_paa_sax(spark, sf_dir).collect()
    assert len(got) == len(expected)
    for r in got:
        nds, z, sym = expected[r.seg_no]
        assert (r.n_days_seg, r.symbol) == (nds, sym)
        assert abs(r.z - z) < 2e-6


def test_hampel_filter_matches_pandas_replay(spark, sf_dir):
    """Flagged days must equal a pandas rolling-median/MAD replay."""
    import numpy as np
    import pandas as pd

    from big_data_audio_classification_spark.operators.timeseries import (
        HAMPEL_K,
        MAD_CONSISTENCY,
        window_hampel_filter,
    )

    pdf = pd.read_parquet(f"{sf_dir}/orders.parquet")
    cents = (pdf["o_totalprice"] * 100).round().astype("int64")
    daily = (
        cents.groupby(pd.to_datetime(pdf["o_orderdate"]).dt.normalize())
        .sum()
        .sort_index()
    )
    vals = daily.to_numpy()
    flags = {}
    for i in range(3, len(vals) - 3):
        fr = np.sort(vals[i - 3 : i + 4])
        m = fr[3]
        md = np.sort(np.abs(fr - m))[3]
        if md > 0 and abs(vals[i] - m) > HAMPEL_K * MAD_CONSISTENCY * md:
            flags[daily.index[i].strftime("%Y-%m-%d")] = round(
                (vals[i] - m) / (MAD_CONSISTENCY * md), 4
            )

    rows = window_hampel_filter(spark, sf_dir).collect()
    assert {r.d for r in rows} == set(flags)
    for r in rows:
        assert abs(r.hampel_z - flags[r.d]) < 1e-9


def test_granger_lite_matches_numpy_two_model_fit(spark, sf_dir):
    """Both R² values and the F statistic must equal numpy lstsq fits
    of the restricted and full lagged models."""
    import numpy as np
    import pandas as pd

    from big_data_audio_classification_spark.operators.timeseries import (
        stats_granger_lite,
    )

    pdf = pd.read_parquet(f"{sf_dir}/events.parquet")
    day = pd.to_datetime(pdf["ts"]).dt.normalize()
    cents = (pdf["value"] * 100).round().astype("int64")
    y = cents.where(pdf["event_type"] == "purchase", 0).groupby(day).sum()
    x = (pdf["event_type"] == "click").astype(int).groupby(day).sum()
    df = pd.DataFrame({"y": y, "x": x}).sort_index()
    yv = df["y"].to_numpy(dtype=float)[1:]
    yl = df["y"].to_numpy(dtype=float)[:-1]
    xl = df["x"].to_numpy(dtype=float)[:-1]

    def r2(X):
        A = np.column_stack([np.ones(len(yv))] + X)
        beta, *_ = np.linalg.lstsq(A, yv, rcond=None)
        resid = yv - A @ beta
        return 1 - resid.var() / yv.var()

    r2_r, r2_f = r2([yl]), r2([yl, xl])
    n = len(yv)
    f_stat = (r2_f - r2_r) / ((1 - r2_f) / (n - 3))

    r = stats_granger_lite(spark, sf_dir).collect()[0]
    assert r.n_days == n
    assert abs(r.r2_restricted - r2_r) < 1e-5
    assert abs(r.r2_full - r2_f) < 1e-5
    assert abs(r.f_stat - f_stat) < 1e-2
    assert r.r2_full >= r.r2_restricted - 1e-12
