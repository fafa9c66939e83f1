"""Replay/invariant tests for the round-6 operators: the 21 family
carriers and the 4 rows-only → quality-gate conversions. Each test
pins a property INDEPENDENT of the DuckDB oracle (the tri-SF gate
already checks those), usually a pure-Python/numpy replay."""

from __future__ import annotations

import math

import numpy as np
import pyspark.sql.functions as F

from big_data_audio_classification_spark.plans import introspect
from big_data_audio_classification_spark.sources.catalog import load_table


def test_haversine_matches_python_replay(spark, sf_dir):
    from big_data_audio_classification_spark.operators.scalars import (
        scalar_math_haversine,
    )

    rows = scalar_math_haversine(spark, sf_dir).collect()
    for r in rows[:25]:
        lat = ((r.c_custkey * 37) % 18000) / 100.0 - 90.0
        lon = ((r.c_custkey * 73) % 36000) / 100.0 - 180.0
        dphi = math.radians(48.8566 - lat)
        dlam = math.radians(2.3522 - lon)
        a = (
            math.sin(dphi / 2) ** 2
            + math.cos(math.radians(lat))
            * math.cos(math.radians(48.8566))
            * math.sin(dlam / 2) ** 2
        )
        d = 2 * 6371.0088 * math.asin(math.sqrt(a))
        assert abs(r.dist_km - round(d, 4)) <= 1e-4


def test_asof_nearest_matches_python_replay(spark, sf_dir):
    from big_data_audio_classification_spark.operators.relational import (
        ASOF_TOL_S,
        join_asof_nearest_tolerance,
    )

    got = {
        r.purchase_id: (r.click_id, r.diff_us)
        for r in join_asof_nearest_tolerance(spark, sf_dir).collect()
    }
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", F.unix_micros("ts").alias("us")
    ).collect()
    clicks = {}
    for r in ev:
        if r.event_type == "click":
            clicks.setdefault(r.user_id, []).append((r.us, r.event_id))
    tol = ASOF_TOL_S * 1_000_000
    n_checked = 0
    for r in ev:
        if r.event_type != "purchase":
            continue
        cand = [
            (abs(us - r.us), us, cid)
            for us, cid in clicks.get(r.user_id, [])
            if abs(us - r.us) <= tol
        ]
        want = min(cand)[2] if cand else None
        want_diff = min(cand)[0] if cand else None
        assert got[r.event_id] == (want, want_diff), r.event_id
        n_checked += 1
    assert n_checked == len(got) > 0


def test_rolling_trimmed_mean_matches_numpy(spark, sf_dir):
    from big_data_audio_classification_spark.operators.windows import (
        TRIM_WIN,
        window_rolling_trimmed_mean,
    )

    got = {
        r.event_id: (r.n_win, r.trimmed_mean)
        for r in window_rolling_trimmed_mean(spark, sf_dir).collect()
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
        vals = np.array([r.value for r in rows])
        for i, r in enumerate(rows):
            w = vals[max(0, i - TRIM_WIN): i + TRIM_WIN + 1]
            tm = (
                (w.sum() - w.min() - w.max()) / (len(w) - 2)
                if len(w) > 2
                else w.mean()
            )
            n_win, got_tm = got[r.event_id]
            assert n_win == len(w)
            assert abs(got_tm - round(float(tm), 6)) <= 1e-6


def test_cube_share_adds_to_100_per_level(spark, sf_dir):
    from big_data_audio_classification_spark.operators.aggregates import (
        agg_cube_share_of_total,
    )

    rows = agg_cube_share_of_total(spark, sf_dir).collect()
    by_gid = {}
    for r in rows:
        by_gid.setdefault(r.gid, []).append(r)
    # every rollup level partitions the same total -> shares sum to 100
    for gid, level in by_gid.items():
        assert abs(sum(r.pct_of_grand for r in level) - 100.0) < 1e-2, gid
    [grand] = by_gid[3]
    assert grand.n == sum(r.n for r in by_gid[0])


def test_weighted_gmean_matches_numpy(spark, sf_dir):
    from big_data_audio_classification_spark.operators.aggregates import (
        agg_pandas_udaf_weighted_gmean,
    )

    got = {
        (r.flag, r.status): r.w_gmean
        for r in agg_pandas_udaf_weighted_gmean(spark, sf_dir).collect()
    }
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_linestatus", "l_extendedprice", "l_quantity"
    ).collect()
    groups = {}
    for r in li:
        groups.setdefault((r.l_returnflag, r.l_linestatus), []).append(
            (r.l_extendedprice, r.l_quantity)
        )
    for k, vals in groups.items():
        x = np.array([v[0] for v in vals])
        w = np.array([v[1] for v in vals])
        want = float(np.exp(np.sum(w * np.log(x)) / np.sum(w)))
        assert abs(got[k] - round(want, 4)) <= 1e-3


def test_month_overlap_bounds(spark, sf_dir):
    from big_data_audio_classification_spark.operators.relational import (
        ORDER_ACTIVE_DAYS,
        join_range_month_overlap,
    )

    rows = join_range_month_overlap(spark, sf_dir).collect()
    starts = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.date_format(F.date_trunc("month", "o_orderdate"),
                               "yyyy-MM-dd").alias("m"))
        .count()
        .collect()
    )
    start_counts = {r.m: r["count"] for r in starts}
    for r in rows:
        # a month overlaps at least every order that STARTS in it, and
        # no interval contributes more than its full length
        assert r.n_orders >= start_counts.get(r.month_start, 0)
        assert 0 < r.overlap_hours <= r.n_orders * ORDER_ACTIVE_DAYS * 24


def test_minhash_estimate_is_calibrated(spark, sf_dir):
    from big_data_audio_classification_spark.operators.dedup import (
        dedup_minhash_jaccard_estimate,
    )

    rows = dedup_minhash_jaccard_estimate(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r.est_jaccard <= 1.0
        assert 0.0 <= r.exact_jaccard <= 1.0
        assert abs(r.abs_err - round(abs(r.est_jaccard - r.exact_jaccard), 4)) <= 1e-3
    # 16 permutations -> binomial std <= 0.125; the mean error must be
    # far below a broken estimator's ~0.5
    assert np.mean([r.abs_err for r in rows]) < 0.25


def test_simhash_histogram_radius_column(spark, sf_dir):
    from big_data_audio_classification_spark.operators.dedup import (
        SIMHASH_MAX_HAMMING,
        dedup_simhash_distance_histogram,
    )

    rows = dedup_simhash_distance_histogram(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r.hamming <= 64
        want = r.n_pairs if r.hamming <= SIMHASH_MAX_HAMMING else 0
        assert r.n_within_radius == want


def test_skew_two_path_equals_plain_join(spark, sf_dir):
    from big_data_audio_classification_spark.operators.scale_patterns import (
        skew_hot_key_two_path_join,
    )

    got = sorted(
        (r.user_id, r.segment, r.n_events, r.sum_value)
        for r in skew_hot_key_two_path_join(spark, sf_dir).collect()
    )
    e = load_table(spark, sf_dir, "events")
    c = load_table(spark, sf_dir, "customer")
    want = sorted(
        (r.user_id, r.segment, r.n_events, r.sum_value)
        for r in e.join(c, e["user_id"] == c["c_custkey"])
        .groupBy("user_id")
        .agg(
            F.any_value("c_mktsegment").alias("segment"),
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .collect()
    )
    assert got == want
    plan = introspect.formatted_plan(skew_hot_key_two_path_join(spark, sf_dir))
    assert "BroadcastHashJoin" in plan  # the hot path really broadcasts
    assert "CartesianProduct" not in plan


def test_anova_f_matches_numpy_replay(spark, sf_dir):
    from big_data_audio_classification_spark.operators.ml import (
        ml_anova_f_selection,
    )

    rows = ml_anova_f_selection(spark, sf_dir).collect()
    assert rows
    em = load_table(spark, sf_dir, "embeddings").select(
        "label", F.col("embedding").cast("array<double>").alias("e")
    ).collect()
    X = np.array([r.e for r in em])
    y = np.array([r.label for r in em])
    for r in rows[:3]:
        col = X[:, r.feature - 1]
        groups = [col[y == g] for g in np.unique(y)]
        k, n = len(groups), len(col)
        ssb = sum(len(g) * (g.mean() - col.mean()) ** 2 for g in groups)
        ssw = sum(((g - g.mean()) ** 2).sum() for g in groups)
        f = (ssb / (k - 1)) / (ssw / (n - k))
        assert abs(r.f_stat - round(float(f), 6)) <= 1e-4
        assert r.k_groups == k and r.n == n
    # ranking is descending
    fs = [r.f_stat for r in rows]
    assert fs == sorted(fs, reverse=True)


def test_report_macro_micro_consistency(spark, sf_dir):
    from big_data_audio_classification_spark.operators.ml import (
        ml_report_macro_micro,
    )

    rows = {r.cls: r for r in ml_report_macro_micro(spark, sf_dir).collect()}
    cls_rows = [r for c, r in rows.items() if not c.startswith("<")]
    macro, micro = rows["<macro>"], rows["<micro>"]
    assert abs(macro.precision_ - round(
        float(np.mean([r.precision_ for r in cls_rows])), 6)) <= 1e-5
    assert abs(macro.f1 - round(
        float(np.mean([r.f1 for r in cls_rows])), 6)) <= 1e-5
    assert micro.precision_ == micro.recall_ == micro.f1  # single-label
    assert macro.support == micro.support == sum(r.support for r in cls_rows)


def test_rms_db_peak_is_zero(spark, sf_dir):
    from big_data_audio_classification_spark.operators.audio import (
        audio_rms_db_frames,
    )

    rows = audio_rms_db_frames(spark, sf_dir).collect()
    assert rows
    assert max(r.db_fs for r in rows) == 0.0  # the peak frame is 0 dBFS
    assert all(r.db_fs <= 0.0 and r.rms >= 0.0 for r in rows)
    n = load_table(spark, sf_dir, "events").count()
    assert sum(r.n_samples for r in rows) == n


def test_rle_udtf_matches_python_replay(spark, sf_dir):
    from big_data_audio_classification_spark.operators.advanced import (
        RLE_DOC_CAP,
        udtf_run_length_tokens,
    )

    got = sorted(
        (r.doc_id, r.tok, r.start_pos, r.run_len)
        for r in udtf_run_length_tokens(spark, sf_dir).collect()
    )
    docs = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < RLE_DOC_CAP)
        .select("doc_id", "text")
        .collect()
    )
    want = []
    for d in docs:
        toks = d.text.split(" ")
        s = 0
        for i in range(1, len(toks) + 1):
            if i == len(toks) or toks[i] != toks[s]:
                if i - s >= 2:
                    want.append((d.doc_id, toks[s], s + 1, i - s))
                s = i
    assert got == sorted(want)


def test_csv_partitioned_roundtrip_equals_parquet(spark, sf_dir):
    from big_data_audio_classification_spark.operators.advanced import (
        sink_csv_partitioned_roundtrip,
    )

    got = sorted(
        tuple(r) for r in sink_csv_partitioned_roundtrip(spark, sf_dir).collect()
    )
    want = sorted(
        tuple(r)
        for r in load_table(spark, sf_dir, "documents")
        .groupBy("lang", "source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
            F.min("doc_id").cast("bigint").alias("min_doc_id"),
        )
        .collect()
    )
    assert got == want


def test_ivf_cell_balance_partitions_corpus(spark, sf_dir):
    from big_data_audio_classification_spark.operators.similarity import (
        IVF_CELLS,
        sim_ivf_cell_balance,
    )

    rows = sim_ivf_cell_balance(spark, sf_dir).collect()
    n = load_table(spark, sf_dir, "embeddings").count()
    assert sum(r.n_vectors for r in rows) == n
    assert all(0.0 <= r.avg_dist <= r.max_dist for r in rows)
    # balance ratios average to 1 over the K cells (empty cells absent)
    assert abs(sum(r.balance_ratio for r in rows) / IVF_CELLS - 1.0) < 1e-3


def test_seasonal_strength_in_unit_interval(spark, sf_dir):
    from big_data_audio_classification_spark.operators.timeseries import (
        analytics_seasonal_strength,
    )

    rows = analytics_seasonal_strength(spark, sf_dir).collect()
    assert {r.dow for r in rows} == set(range(1, 8))
    s = {r.seasonal_strength for r in rows}
    assert len(s) == 1  # one corpus-level strength repeated per row
    assert 0.0 <= s.pop() <= 1.0
    # seasonal indices are centered residual means: they nearly cancel
    total = sum(r.seasonal_idx * r.n_days for r in rows)
    days = sum(r.n_days for r in rows)
    assert abs(total / days) < 1e4  # same scale as daily revenue noise


def test_mllib_lsh_gate_and_w2v_contract(spark, sf_dir):
    from big_data_audio_classification_spark.operators.similarity import (
        sim_minhash_mllib_join,
    )
    from big_data_audio_classification_spark.operators.text import text_word2vec

    [g] = sim_minhash_mllib_join(spark, sf_dir).collect()
    assert g.n_truth > 0 and g.recall_floor_ok and g.precision_exact
    [w] = text_word2vec(spark, sf_dir).collect()
    assert w.vec_dim == 16 and w.norms_positive and w.n_vocab > 0
