"""Replay/invariant tests for the round-5 operators: the rows-only →
SQL conversions (deterministic Lloyd, hash split, Misra-Gries heavy
hitters, RP-LSH, unrolled PageRank/Markov) and the new family carriers.
Each test pins a property INDEPENDENT of the DuckDB oracle (which the
tri-SF gate already checks), usually a pure-Python/numpy replay."""

from __future__ import annotations

import math

import numpy as np
import pyspark.sql.functions as F


def test_benjamini_hochberg_matches_python_replay(spark, sf_dir):
    from big_data_audio_classification_spark.operators.stats import (
        BH_ALPHA,
        BH_CELLS,
        BH_THRESHOLDS,
        stats_benjamini_hochberg,
    )

    rows = stats_benjamini_hochberg(spark, sf_dir).collect()
    assert len(rows) == BH_CELLS
    # thresholds strictly decrease (larger i → looser critical value)
    assert all(a > b for a, b in zip(BH_THRESHOLDS, BH_THRESHOLDS[1:]))
    # step-up replay on the returned z's: rejected == rank <= k*
    by_rank = sorted(rows, key=lambda r: r.rank)
    ks = [r.rank for r in by_rank if abs(r.z) >= BH_THRESHOLDS[r.rank - 1]]
    kstar = max(ks) if ks else 0
    for r in by_rank:
        assert r.rejected == (r.rank <= kstar)
    # the z-threshold form equals the p-value form: p = 2(1-Φ(|z|))
    for r in by_rank:
        p = 1.0 - math.erf(abs(r.z) / math.sqrt(2.0))
        assert (p <= (r.rank / BH_CELLS) * BH_ALPHA + 1e-12) == (
            abs(r.z) >= BH_THRESHOLDS[r.rank - 1] - 1e-9
        )


def test_markov_stationary_is_fixed_point(spark, sf_dir):
    from big_data_audio_classification_spark.operators.timeseries import (
        events_markov_stationary,
        events_markov_transitions,
    )

    pi = {
        r.state: r.stationary_prob
        for r in events_markov_stationary(spark, sf_dir).collect()
    }
    assert abs(sum(pi.values()) - 1.0) < 1e-6
    p = {
        (r.cur_type, r.next_type): r.n_trans
        for r in events_markov_transitions(spark, sf_dir).collect()
    }
    outs = {}
    for (i, _j), n in p.items():
        outs[i] = outs.get(i, 0) + n
    # one more application of P moves π by ≲ the convergence residual
    nxt = {}
    for (i, j), n in p.items():
        nxt[j] = nxt.get(j, 0.0) + pi.get(i, 0.0) * (n / outs[i])
    for s in pi:
        assert abs(nxt.get(s, 0.0) - pi[s]) < 1e-5


def test_kmeans_lloyd_partition_and_determinism(spark, sf_dir):
    from big_data_audio_classification_spark.operators.ml import (
        ml_kmeans_embeddings,
    )
    from big_data_audio_classification_spark.sources.catalog import load_table

    a = sorted(
        (r.prediction, r.n, r.avg_dist)
        for r in ml_kmeans_embeddings(spark, sf_dir).collect()
    )
    n_vec = load_table(spark, sf_dir, "embeddings").count()
    assert sum(n for _, n, _ in a) == n_vec  # every vector assigned once
    b = sorted(
        (r.prediction, r.n, r.avg_dist)
        for r in ml_kmeans_embeddings(spark, sf_dir).collect()
    )
    assert a == b  # re-run bitwise deterministic


def test_hash_split_is_key_deterministic(spark, sf_dir):
    from big_data_audio_classification_spark.operators.ml import (
        ml_train_test_split,
    )

    rows = ml_train_test_split(spark, sf_dir).collect()
    n = {"train": 0, "test": 0}
    for r in rows:
        n[r.split] += r.n
    total = n["train"] + n["test"]
    assert 0.7 < n["train"] / total < 0.9  # hash buckets ≈ 80/20
    again = ml_train_test_split(spark, sf_dir).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


def test_freq_items_equals_plain_exact_counts(spark, sf_dir):
    """The two-pass Misra-Gries result must equal the single-pass exact
    heavy-hitter set (sketch candidates are a guaranteed superset)."""
    from big_data_audio_classification_spark.operators.text import (
        FREQ_SUPPORT,
        text_freq_items,
    )
    from big_data_audio_classification_spark.sources.catalog import load_table

    got = {(r.tok, r.freq) for r in text_freq_items(spark, sf_dir).collect()}
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        F.explode(F.filter(F.split("text", " "), lambda t: t != "")).alias("tok")
    )
    n = toks.count()
    exact = {
        (r.tok, r.freq)
        for r in toks.groupBy("tok")
        .agg(F.count(F.lit(1)).cast("bigint").alias("freq"))
        .filter(F.col("freq") > FREQ_SUPPORT * n)
        .collect()
    }
    assert got == exact and got


def test_brp_lsh_returns_true_distances_sorted(spark, sf_dir):
    from big_data_audio_classification_spark.operators.similarity import (
        sim_brp_lsh_ann,
    )
    from big_data_audio_classification_spark.sources.catalog import load_table

    rows = sim_brp_lsh_ann(spark, sf_dir).collect()
    assert rows
    emb = {
        r.vec_id: np.asarray(r.embedding, dtype=np.float64)
        for r in load_table(spark, sf_dir, "embeddings").collect()
    }
    q = emb[0]
    dists = [r.l2_dist for r in rows]
    assert dists == sorted(dists)
    for r in rows:  # reported distance is the true L2, not a bucket artifact
        assert abs(r.l2_dist - np.sqrt(((emb[r.vec_id] - q) ** 2).sum())) < 1e-4


def test_ivf_nprobe_recall_is_monotone(spark, sf_dir):
    from big_data_audio_classification_spark.operators.similarity import (
        sim_ivf_nprobe_sweep,
    )

    rows = sim_ivf_nprobe_sweep(spark, sf_dir).collect()
    by_q: dict = {}
    for r in rows:
        by_q.setdefault(r.query_id, {})[r.nprobe] = r.recall_at_k
    for q, rec in by_q.items():
        assert rec[1] <= rec[2] + 1e-9 <= rec[4] + 2e-9, (q, rec)


def test_mel_filterbank_weights_match_numpy(spark, sf_dir):
    from big_data_audio_classification_spark.operators.audio import (
        audio_mel_filterbank_weights,
        mel_filterbank,
    )

    fb = mel_filterbank()
    got = {
        (r.mel, r.bin): r.weight
        for r in audio_mel_filterbank_weights(spark, sf_dir).collect()
    }
    # every >1e-6 numpy weight is present and equal to 6 decimals
    n_checked = 0
    for m in range(fb.shape[0]):
        for i in range(fb.shape[1]):
            if fb[m, i] > 1e-6:
                assert abs(got[(m, i)] - fb[m, i]) < 5e-6, (m, i)
                n_checked += 1
    assert n_checked == len(got)


def test_session_gap_stats_cover_all_events(spark, sf_dir):
    from big_data_audio_classification_spark.operators.timeseries import (
        events_session_gap_stats,
    )
    from big_data_audio_classification_spark.sources.catalog import load_table

    rows = events_session_gap_stats(spark, sf_dir).collect()
    n_events = load_table(spark, sf_dir, "events").count()
    assert sum(r.n_events for r in rows) == n_events
    assert all(r.duration_sec >= 0 for r in rows)


def test_trimmed_mean_matches_numpy_replay(spark, sf_dir):
    from big_data_audio_classification_spark.operators.aggregates import (
        TRIM_FRAC,
        agg_pandas_udaf_trimmed_mean,
    )
    from big_data_audio_classification_spark.sources.catalog import load_table

    got = {
        r.status: (r.n, r.trimmed_mean)
        for r in agg_pandas_udaf_trimmed_mean(spark, sf_dir).collect()
    }
    o = load_table(spark, sf_dir, "orders").collect()
    groups: dict = {}
    for r in o:
        groups.setdefault(r.o_orderstatus, []).append(r.o_totalprice)
    for status, vals in groups.items():
        arr = np.sort(np.asarray(vals))
        k = int(np.floor(TRIM_FRAC * len(arr)))
        exp = round(float(np.mean(arr[k : len(arr) - k])), 4)
        assert got[status][0] == len(vals)
        assert abs(got[status][1] - exp) < 1e-6


def test_containment_fast_path_no_window_on_shingles(spark, sf_dir):
    """The r05 df-cap must be an aggregate+semi-join, not a shingle-
    keyed window (the 8 s sf0.1 regression shape)."""
    from big_data_audio_classification_spark.operators.dedup import (
        dedup_containment_join_xxhash,
    )

    plan = dedup_containment_join_xxhash(spark, sf_dir)._jdf.queryExecution().toString()
    assert "Window" not in plan


def test_ppmi_neighbors_cosine_bounds_and_symmetric_metric(spark, sf_dir):
    from big_data_audio_classification_spark.operators.text import (
        PPMI_PROBES,
        PPMI_TOPN,
        text_ppmi_neighbors,
    )

    rows = text_ppmi_neighbors(spark, sf_dir).collect()
    assert 0 < len(rows) <= PPMI_PROBES * PPMI_TOPN
    by_probe: dict = {}
    for r in rows:
        assert -1.000001 <= r.cos_sim <= 1.000001
        by_probe.setdefault(r.probe, []).append(r.cos_sim)
    for sims in by_probe.values():
        assert sims == sorted(sims, reverse=True)  # ranked descending


def test_pq_codebook_covers_every_subvector(spark, sf_dir):
    from big_data_audio_classification_spark.operators.similarity import (
        PQCB_K,
        PQCB_M,
        sim_pq_codebook_lloyd,
    )
    from big_data_audio_classification_spark.sources.catalog import load_table

    rows = sim_pq_codebook_lloyd(spark, sf_dir).collect()
    n_vec = load_table(spark, sf_dir, "embeddings").count()
    per_sub: dict = {}
    for r in rows:
        assert 0 <= r.codeword < PQCB_K
        assert r.sq_error >= 0
        per_sub[r.subspace] = per_sub.get(r.subspace, 0) + r.n
    assert set(per_sub) == set(range(PQCB_M))
    assert all(v == n_vec for v in per_sub.values())  # every (vec, sub) assigned


def test_isotonic_calibration_monotone_and_mass_preserving(spark, sf_dir):
    """PAVA invariants: fitted values are nondecreasing in the bin, and
    the weighted mean of fitted equals the weighted mean of raw rates
    (L2 projection preserves the weighted total)."""
    from big_data_audio_classification_spark.operators.ml import (
        ml_isotonic_calibration,
    )

    rows = sorted(ml_isotonic_calibration(spark, sf_dir).collect(),
                  key=lambda r: r.bin)
    assert rows
    fitted = [r.fitted for r in rows]
    assert all(a <= b + 1e-9 for a, b in zip(fitted, fitted[1:]))
    wsum = sum(r.n for r in rows)
    raw_mean = sum(r.n * r.raw_rate for r in rows) / wsum
    fit_mean = sum(r.n * r.fitted for r in rows) / wsum
    assert abs(raw_mean - fit_mean) < 1e-4


def test_jenks_breaks_is_optimal_vs_bruteforce(spark, sf_dir):
    """The DP segmentation must beat or match EVERY alternative split:
    brute-force all C(n-1, k-1) boundary choices on the binned data
    (n ≤ 40 at sf0.001) and compare total SSE."""
    from itertools import combinations

    import pyspark.sql.functions as F

    from big_data_audio_classification_spark.operators.analytics import (
        JENKS_BINS,
        JENKS_BUCKET,
        JENKS_K,
        analytics_jenks_breaks,
    )
    from big_data_audio_classification_spark.sources.catalog import load_table

    rows = analytics_jenks_breaks(spark, sf_dir).collect()
    assert len(rows) == JENKS_K
    got_total = rows[0].total_sse
    assert all(abs(r.total_sse - got_total) < 1e-9 for r in rows)
    # exact brute force over the binned frame
    o = load_table(spark, sf_dir, "orders").where(
        F.col("o_totalprice") < JENKS_BINS * JENKS_BUCKET
    )
    b = sorted(
        (r.bin, r.w, r.s, r.ss)
        for r in o.groupBy(
            F.floor(F.col("o_totalprice") / JENKS_BUCKET).cast("bigint").alias("bin")
        )
        .agg(
            F.count(F.lit(1)).cast("double").alias("w"),
            F.sum("o_totalprice").alias("s"),
            F.sum(F.col("o_totalprice") * F.col("o_totalprice")).alias("ss"),
        )
        .collect()
    )
    n = len(b)

    def sse(lo, hi):  # inclusive 0-based indices
        w = sum(b[i][1] for i in range(lo, hi + 1))
        s = sum(b[i][2] for i in range(lo, hi + 1))
        ss = sum(b[i][3] for i in range(lo, hi + 1))
        return ss - s * s / w

    best = min(
        sum(
            sse(lo, hi)
            for lo, hi in zip((0,) + tuple(c), tuple(x - 1 for x in c) + (n - 1,))
        )
        for c in combinations(range(1, n), JENKS_K - 1)
    )
    assert abs(got_total - round(best, 2)) < 0.05  # same optimum


def test_conformal_coverage_near_target(spark, sf_dir):
    """Split-conformal guarantee: empirical test coverage must sit at
    or above ~(1 - alpha) minus sampling noise."""
    from big_data_audio_classification_spark.operators.ml import (
        CONF_ALPHA,
        ml_conformal_interval,
    )

    r = ml_conformal_interval(spark, sf_dir).first()
    assert r.n_train > r.n_calib > 0 and r.n_test > 0
    assert r.qhat > 0
    # binomial noise bound: 3 sigma at the test size
    sigma = (CONF_ALPHA * (1 - CONF_ALPHA) / r.n_test) ** 0.5
    assert r.coverage >= (1 - CONF_ALPHA) - 3 * sigma
