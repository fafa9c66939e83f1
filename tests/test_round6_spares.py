"""Replay/invariant tests for the round-7 spare carriers registered in
round 6 (stocked one round ahead of their driver-window rotation).
Oracle-independent properties only — the tri-SF gate owns value parity."""

from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F

from big_data_audio_classification_spark.sources.catalog import load_table


def test_ks_two_sample_matches_numpy_ecdf(spark, sf_dir):
    from big_data_audio_classification_spark.operators.ml import (
        ml_ks_two_sample,
    )

    [row] = ml_ks_two_sample(spark, sf_dir).collect()
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderpriority", "o_totalprice"
    ).collect()
    a = np.sort([r.o_totalprice for r in o if r.o_orderpriority == "1-URGENT"])
    b = np.sort([r.o_totalprice for r in o if r.o_orderpriority == "5-LOW"])
    grid = np.unique(np.concatenate([a, b]))
    d = np.max(np.abs(
        np.searchsorted(a, grid, side="right") / len(a)
        - np.searchsorted(b, grid, side="right") / len(b)
    ))
    assert row.n1 == len(a) and row.n2 == len(b)
    assert abs(row.d_stat - round(float(d), 6)) <= 1e-5
    assert row.reject_h0 == (row.d_stat > row.d_crit_005)


def test_did_matches_pandas_replay(spark, sf_dir):
    from big_data_audio_classification_spark.operators.experiments import (
        DID_CUTOVER,
        stats_did_estimator,
    )

    [row] = stats_did_estimator(spark, sf_dir).collect()
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "value"
    ).toPandas()
    import pandas as pd

    cut = pd.Timestamp(DID_CUTOVER)
    ev["treated"] = ev.user_id % 2 == 0
    ev["post"] = ev.ts >= cut
    m = ev.groupby(["treated", "post"]).value.mean()
    did = (m[True, True] - m[True, False]) - (m[False, True] - m[False, False])
    assert abs(row.did_estimate - round(float(did), 6)) <= 1e-5
    assert row.n_total == len(ev)


def test_rolling_weighted_mean_matches_numpy(spark, sf_dir):
    from big_data_audio_classification_spark.operators.windows import (
        WMA_WIN,
        window_rolling_weighted_mean,
    )

    got = {
        r.event_id: r.wma
        for r in window_rolling_weighted_mean(spark, sf_dir).collect()
    }
    ev = sorted(
        load_table(spark, sf_dir, "events")
        .select("event_id", "user_id", "ts", "value")
        .collect(),
        key=lambda r: (r.user_id, r.ts, r.event_id),
    )
    by_user = {}
    for r in ev:
        by_user.setdefault(r.user_id, []).append(r)
    for rows in by_user.values():
        for i, r in enumerate(rows):
            num = den = 0.0
            for lag in range(min(i + 1, WMA_WIN)):
                wgt = WMA_WIN - lag
                num += wgt * rows[i - lag].value
                den += wgt
            assert abs(got[r.event_id] - round(num / den, 6)) <= 1e-6


def test_session_funnel_depth_partition(spark, sf_dir):
    from big_data_audio_classification_spark.operators.timeseries import (
        events_session_funnel,
        events_session_gap_stats,
    )

    hist = {r.funnel_depth: r.n_sessions
            for r in events_session_funnel(spark, sf_dir).collect()}
    n_sessions = events_session_gap_stats(spark, sf_dir).count()
    assert sum(hist.values()) == n_sessions  # every session classified once
    assert all(0 <= d <= 3 for d in hist)


def test_salted_topk_equals_plain_window_topk(spark, sf_dir):
    from pyspark.sql import Window

    from big_data_audio_classification_spark.operators.scale_patterns import (
        SALT_TOPK_K,
        skew_salted_topk,
    )

    got = sorted(
        (r.event_type, r.event_id, r.value)
        for r in skew_salted_topk(spark, sf_dir).collect()
    )
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy(
        F.col("value").desc(), "event_id"
    )
    want = sorted(
        (r.event_type, r.event_id, r.value)
        for r in e.select(
            "event_type", "event_id",
            F.round("value", 4).alias("value"),
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") <= SALT_TOPK_K)
        .drop("rn")
        .collect()
    )
    assert got == want


def test_woe_sign_and_iv_nonnegative(spark, sf_dir):
    from big_data_audio_classification_spark.operators.ml import ml_woe_encoding

    rows = ml_woe_encoding(spark, sf_dir).collect()
    assert rows
    tot_pos = sum(r.n_pos for r in rows)
    tot_n = sum(r.n for r in rows)
    base_rate = tot_pos / tot_n
    for r in rows:
        seg_rate = r.n_pos / r.n
        # smoothed WoE keeps the sign of the rate comparison except in
        # the Laplace-dominated tiny cells
        if r.n >= 10 and abs(seg_rate - base_rate) > 0.02:
            assert (r.woe > 0) == (seg_rate > base_rate)
        assert r.iv_term >= -1e-9 or abs(r.woe) < 0.5  # IV terms ~nonneg


def test_chi2_matches_numpy_replay(spark, sf_dir):
    from big_data_audio_classification_spark.operators.ml import (
        ml_chi2_feature_selection,
    )

    rows = ml_chi2_feature_selection(spark, sf_dir).collect()
    assert rows
    em = load_table(spark, sf_dir, "embeddings").select(
        "label", F.col("embedding").cast("array<double>").alias("e")
    ).collect()
    X = np.array([r.e for r in em])
    y = np.array([r.label for r in em])
    for r in rows[:2]:
        col = X[:, r.feature - 1]
        med = np.percentile(col, 50, method="linear")
        b = (col > med).astype(int)
        chi2 = 0.0
        n = len(col)
        for lab in np.unique(y):
            for bv in (0, 1):
                obs = np.sum((y == lab) & (b == bv))
                exp = np.sum(y == lab) * np.sum(b == bv) / n
                if obs > 0:  # engines iterate observed cells only
                    chi2 += (obs - exp) ** 2 / exp
        assert abs(r.chi2 - round(float(chi2), 6)) <= 1e-3


def test_band_sweep_shorter_bands_catch_more(spark, sf_dir):
    from big_data_audio_classification_spark.operators.dedup import (
        dedup_minhash_band_sweep,
    )

    rows = {r.rows_per_band: r.n_candidates
            for r in dedup_minhash_band_sweep(spark, sf_dir).collect()}
    assert set(rows) == {8, 4, 2}
    # shorter rows-per-band = looser collision requirement = >= candidates
    assert rows[2] >= rows[4] >= rows[8] >= 0


def test_simhash_bit_balance_shape(spark, sf_dir):
    from big_data_audio_classification_spark.operators.dedup import (
        dedup_simhash_bit_balance,
    )

    rows = dedup_simhash_bit_balance(spark, sf_dir).collect()
    assert {r.bit for r in rows} == set(range(32))
    assert all(0.0 <= r.ones_ratio <= 1.0 for r in rows)


def test_energy_flatness_am_gm_bounds(spark, sf_dir):
    from big_data_audio_classification_spark.operators.audio import (
        audio_energy_flatness,
    )

    rows = audio_energy_flatness(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0.0 < r.flatness <= 1.0 + 1e-9   # AM-GM inequality
        assert r.crest_power >= 1.0 - 1e-9      # max >= mean
        assert r.mean_power > 0


def test_locf_grid_python_replay_spotcheck(spark, sf_dir):
    from big_data_audio_classification_spark.operators.relational import (
        join_asof_locf_grid,
    )

    got = {
        (r.user_id, r.grid_ts): r.src_event_id
        for r in join_asof_locf_grid(spark, sf_dir).collect()
    }
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", F.col("ts").cast("string").alias("ts")
    ).collect()
    by_user = {}
    for r in ev:
        by_user.setdefault(r.user_id, []).append((r.ts, r.event_id))
    import itertools

    checked = 0
    for (uid, gts), src in itertools.islice(sorted(got.items()), 0, 400, 7):
        cand = [(ts, eid) for ts, eid in by_user.get(uid, []) if ts <= gts]
        want = max(cand)[1] if cand else None
        assert src == want, (uid, gts)
        checked += 1
    assert checked > 20


def test_char_topfreq_matches_python(spark, sf_dir):
    from big_data_audio_classification_spark.operators.advanced import (
        CHARFREQ_DOC_CAP,
        CHARFREQ_TOPN,
        udtf_char_topfreq,
    )

    got = sorted(
        (r.doc_id, r.rank, r.ch, r.cnt)
        for r in udtf_char_topfreq(spark, sf_dir).collect()
    )
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") < CHARFREQ_DOC_CAP
    ).select("doc_id", "text").collect()
    want = []
    for d in docs:
        counts = {}
        for ch in d.text or "":
            counts[ch] = counts.get(ch, 0) + 1
        top = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        for i, (ch, cnt) in enumerate(top[:CHARFREQ_TOPN], start=1):
            want.append((d.doc_id, i, ch, cnt))
    assert got == sorted(want)


def test_mad_udaf_matches_numpy(spark, sf_dir):
    from big_data_audio_classification_spark.operators.aggregates import (
        agg_pandas_udaf_mad,
    )

    got = {r.flag: r.mad for r in agg_pandas_udaf_mad(spark, sf_dir).collect()}
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_extendedprice"
    ).collect()
    groups = {}
    for r in li:
        groups.setdefault(r.l_returnflag, []).append(r.l_extendedprice)
    for flag, vals in groups.items():
        arr = np.array(vals)
        want = float(np.median(np.abs(arr - np.median(arr))))
        assert abs(got[flag] - round(want, 4)) <= 1e-3


def test_remainder_acf_bounded(spark, sf_dir):
    from big_data_audio_classification_spark.operators.timeseries import (
        analytics_remainder_acf,
    )

    rows = {r.lag_days: r for r in
            analytics_remainder_acf(spark, sf_dir).collect()}
    assert set(rows) == {1, 7}
    for r in rows.values():
        assert -1.0 <= r.acf <= 1.0
        assert r.n_pairs > 0


def test_symdiff_cohorts_partition(spark, sf_dir):
    from big_data_audio_classification_spark.operators.relational import (
        set_symdiff_active_customers,
    )

    rows = {r.cohort: r for r in
            set_symdiff_active_customers(spark, sf_dir).collect()}
    o = load_table(spark, sf_dir, "orders").withColumn(
        "y", F.year(F.col("o_orderdate").cast("timestamp"))
    )
    y95 = {r.o_custkey for r in
           o.filter(F.col("y") == 1995).select("o_custkey").distinct().collect()}
    y98 = {r.o_custkey for r in
           o.filter(F.col("y") == 1998).select("o_custkey").distinct().collect()}
    assert rows["only_1995"].n == len(y95 - y98)
    assert rows["only_1998"].n == len(y98 - y95)
    assert rows["both"].n == len(y95 & y98)


def test_grouping_sets_gid_selection(spark, sf_dir):
    from big_data_audio_classification_spark.operators.relational import (
        agg_groupingsets_mixed,
    )

    rows = agg_groupingsets_mixed(spark, sf_dir).collect()
    gids = {r.gid for r in rows}
    # fine cell (0), priority marginal (2 = status grouped away), grand (3)
    assert gids == {0, 2, 3}
    [grand] = [r for r in rows if r.gid == 3]
    assert grand.n == sum(r.n for r in rows if r.gid == 0)


def test_overlap_degree_histogram_covers_sample(spark, sf_dir):
    from big_data_audio_classification_spark.operators.relational import (
        join_range_overlap_degree,
    )

    rows = join_range_overlap_degree(spark, sf_dir).collect()
    n_sample = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderkey") % 20 == 0
    ).count()
    assert sum(r.n_intervals for r in rows) == n_sample


def test_probe_schedule_rank_monotone(spark, sf_dir):
    from big_data_audio_classification_spark.operators.similarity import (
        PROBE_SCHED_K,
        sim_ivf_probe_schedule,
    )

    rows = sim_ivf_probe_schedule(spark, sf_dir).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r)
    for q, rs in by_q.items():
        rs.sort(key=lambda r: r.probe_rank)
        assert [r.probe_rank for r in rs] == list(range(1, PROBE_SCHED_K + 1))
        dists = [r.cent_dist for r in rs]
        assert dists == sorted(dists)


def test_perplexity_outliers_ordering(spark, sf_dir):
    from big_data_audio_classification_spark.operators.text import (
        PPX_OUT_TOP,
        text_perplexity_outliers,
    )

    rows = text_perplexity_outliers(spark, sf_dir).collect()
    assert len(rows) == PPX_OUT_TOP
    zs = [abs(r.z) for r in rows]
    assert zs == sorted(zs, reverse=True)
    assert all(r.doc_ce > 0 for r in rows)


def test_spare_plans_no_cartesian(spark, sf_dir):
    """Plan-shape regression for the heavier round-7 spares: no
    CartesianProduct anywhere; the banded/bucketed joins stay hash
    equi-joins."""
    from big_data_audio_classification_spark.plans import introspect
    from big_data_audio_classification_spark.registry import all_queries

    qs = all_queries()
    for name in (
        "join_range_overlap_degree",
        "dedup_minhash_band_sweep",
        "ml_chi2_feature_selection",
        "text_tfidf_source_cosine",
        "events_session_funnel",
    ):
        plan = introspect.formatted_plan(qs[name].fn(spark, sf_dir))
        assert "CartesianProduct" not in plan, name


def test_overlap_degree_joins_on_month_bucket(spark, sf_dir):
    """The overlap-degree range join must be a bucket equi-join (hash
    join on the month key), never a non-equi nested loop."""
    from big_data_audio_classification_spark.operators.relational import (
        join_range_overlap_degree,
    )
    from big_data_audio_classification_spark.plans import introspect

    plan = introspect.formatted_plan(join_range_overlap_degree(spark, sf_dir))
    assert "BroadcastNestedLoopJoin" not in plan
    assert ("SortMergeJoin" in plan) or ("ShuffledHashJoin" in plan) or (
        "BroadcastHashJoin" in plan
    )


def test_hodges_lehmann_has_no_unpartitioned_pair_window(spark, sf_dir):
    """r06 perf fix: the Walsh-median rank extraction must run as the
    two-phase bucketed form — the only acceptable unpartitioned window
    is the <=1024-row histogram offset scan, never the N-pair sort."""
    from big_data_audio_classification_spark.operators.stats import (
        stats_hodges_lehmann,
    )
    from big_data_audio_classification_spark.plans import introspect

    df = stats_hodges_lehmann(spark, sf_dir)
    plan = introspect.formatted_plan(df)
    # the rank window is partitioned by the bucket key
    assert "partitionBy=[bkt" in plan.replace(" ", "") or "bkt" in plan
    [row] = df.collect()
    assert row.n_pairs == row.n_days * (row.n_days + 1) // 2
    # HL sits between (robust) median and mean neighborhoods
    lo = min(row.median_rev, row.mean_rev) * 0.5
    hi = max(row.median_rev, row.mean_rev) * 1.5
    assert lo <= row.hl_estimate <= hi
