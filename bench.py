"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line — {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec, ...}, "value_warm": ..., "sf": ...} — with
compact separators and 2-decimal per-query times so the full line
(≈1.9 kB at 62 queries) stays inside the driver's 2000-char tail
capture; value_warm is dropped first if the line ever outgrows it.

Methodology: per-query cost at sf0.1 is dominated by one-time plan/
codegen compile (~0.3-0.6 s; warm reruns are 2-7x faster), so each query
is timed cold (first run, directly comparable to BENCH_r01) and then
warm as the MEDIAN OF 3 reruns (single warm runs showed ~2x jitter on
sub-second queries in r03). Regressions should be judged warm-for-warm;
``value`` stays the cold total for driver compatibility.

Driver-capture history: r03's line truncated past ~30 queries, and the
r09 58-query line outgrew the 2000-char tail capture entirely
(BENCH_r09.json ``parsed: null``) — hence the two-line format above
(per-query dict on its own sacrificial line, short summary LAST). Full
detail (full-precision cold times, warm medians, warm samples,
run-once timings) is written to BENCH_LOCAL.json in-repo.

``ref_e2e_train`` (the reference's full audio->features->PCA->MI->MLP
lifecycle) is timed once — an MLlib fit is not a rerunnable lazy plan —
and reported under ``queries_once``, outside the round-over-round
``value`` total (training actions and lazy queries don't compare).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from big_data_audio_classification_spark.registry import all_queries
from big_data_audio_classification_spark.session import get_spark

# Headline set: one representative per operator family, heaviest variants.
# grouped_zscore_applyinpandas is intentionally NOT here: it times Arrow
# serialization of a window-expressible computation (kept registered as
# the applyInPandas API exemplar, not an engine benchmark).
HEADLINE = [
    "pricing_summary",
    "join_inner_revenue_by_nation",
    "join_left_order_counts",
    "join_range_bands",
    "join_asof_purchase_click",
    "agg_stats_by_flag",
    "agg_count_distinct",
    # the 100 TB percentile path (histogram pass + candidate-bin
    # resolve, no per-group value buffering) holds the headline slot;
    # the built-in percentile() form stays registered as the exemplar
    # of the anti-pattern it replaces (buffers every per-group value
    # in few reducers — the repo's 10x experiment, SURVEY §8).
    "agg_percentiles_twophase",
    "agg_cube",
    "window_running_spend",
    "window_lag_lead_events",
    "topk_orders_per_customer",
    "scalar_math_functions",
    "scalar_json_from_json_agg",
    "scalar_map_functions",
    "array_embedding_stats",
    "events_session_window",
    "dedup_exact_hash",
    "dedup_minhash_keep_first",
    "text_quality_score",
    "sim_cosine_topk",
    "skew_twophase_distinct",
    # round-2 flagship additions (no r01 counterpart; totals comparable
    # only against rounds that include them)
    "tpch_q3_shipping_priority",
    "text_unigram_logprob",
    "curation_token_budget_select",
    # round-3 flagship additions: the exact set-similarity join, sparse
    # retrieval, and batch sessionization
    "dedup_prefix_filter_join",
    "retrieval_bm25_topk",
    "events_gap_islands_sessions",
    # round-3b flagship additions: blocked fuzzy linkage, distributed
    # rank statistics, bounded-state EWMA, and the bigram LM scorer
    "er_blocked_fuzzy_parts",
    "stats_mann_whitney_u",
    "events_ewma_deviation",
    "text_bigram_logprob",
    # round-3c flagship additions: the cell-bucketed spatial join, the
    # aggregate-only survival curve, and the relational NB classifier
    "geo_cell_distance_join",
    "stats_kaplan_meier",
    "ml_naive_bayes_tokens",
    # round-4 flagship additions: blob-content Hamming-LSH near-dup and
    # the banded-MinHash recall quality gate
    "mm_phash_banded_neardup",
    "dedup_lsh_recall",
    # round-5 flagship additions (VERDICT r04 item 5): the four heavy
    # round-4 operators whose regressions were untracked, plus the
    # engine-hash containment variant the 100 TB path actually runs
    "dedup_containment_join",
    "dedup_containment_join_xxhash",
    "stats_hodges_lehmann",
    "sim_kcenter_seeds",
    "ml_gbt_residual_rounds",
    # round-6 flagship additions (VERDICT r05 item 7): the iterative-
    # oracle capstones get round-over-round tracking, plus this round's
    # heaviest new pair-generator
    "ml_isotonic_calibration",
    "analytics_jenks_breaks",
    "ml_conformal_interval",
    "dedup_minhash_jaccard_estimate",
    # round-7 flagship additions (VERDICT r06 item 6: carry the now-
    # permanent retry plus this round's heaviest new operators; the
    # 46-query shared subset above stays frozen for round-over-round
    # comparability)
    "window_rolling_trimmed_mean",
    "window_rolling_skew_kurt",
    "text_bm25_rank",
    "dedup_lsh_bucket_profile",
    # round-8 flagship additions (the r08 stock tranches; the 50-query
    # shared subset above stays frozen for round-over-round
    # comparability — report the shared-50 ratio vs BENCH_r07)
    "window_rolling_drawdown",
    "mm_payload_adler_checksum",
    "text_lm_dirichlet_prior",
    "dedup_lsh_amplification_curve",
    # round-9 flagship additions (the r09 stock tranches; the 54-query
    # shared subset above stays frozen for round-over-round
    # comparability — report the shared-54 ratio vs BENCH_r08)
    "dedup_lsh_bucket_entropy",
    "dedup_simhash_multiprobe16",
    "ml_point_biserial_selection",
    "text_topk_salient_terms",
    # round-10 flagship additions (the r10 stock tranche + the bounded-
    # round CC conversion; the 58-query shared subset above stays frozen
    # for round-over-round comparability — report the shared-58 ratio vs
    # BENCH_r09 / its committed quiet-window run)
    "dedup_cc_bounded_histogram",
    "sketch_countmin_heavy_hitters",
    "text_lm_bigram_oov_rate",
    "udtf_session_paths",
]

# Timed once (eager MLlib fit inside — there is no "warm rerun" of a
# training action that doesn't retrain).
RUN_ONCE = ["ref_e2e_train"]


def final_line(total: float, cold: dict, warm_total: float, sf_val,
               cap: int = 1990) -> str:
    """Build the driver-contract stdout line: ONE compact JSON object
    kept within ``cap`` chars of the driver's 2000-char tail capture.

    Fallback ladder (r11, ADVICE r10: one fallback was one flagship
    away from re-triggering the r09 parsed:null clip): (1) the full
    line with 2-decimal per-query times and value_warm; (2) drop
    value_warm (~21 chars, the r10 behavior); (3) round per-query
    times to 1 decimal; (4) totals-only with an empty queries map —
    degraded but parseable, never a clipped line."""
    base = {
        "metric": "headline_queries_total_sec",
        "value": total,
        "unit": "sec",
        "queries": {k: round(v, 2) for k, v in cold.items()},
        "value_warm": warm_total,
        "sf": sf_val,
    }
    candidates = [base]
    no_warm = dict(base)
    del no_warm["value_warm"]
    candidates.append(no_warm)
    one_dec = dict(no_warm)
    one_dec["queries"] = {k: round(v, 1) for k, v in cold.items()}
    candidates.append(one_dec)
    totals_only = dict(one_dec)
    totals_only["queries"] = {}
    candidates.append(totals_only)
    for obj in candidates:
        line = json.dumps(obj, separators=(",", ":"))
        if len(line) <= cap:
            return line
    return line  # totals-only always fits in practice


def _run(qs, name, spark, sf_dir) -> float:
    t0 = time.time()
    df = qs[name].fn(spark, sf_dir)
    df.write.format("noop").mode("overwrite").save()
    return round(time.time() - t0, 3)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    spark = get_spark("bench")
    qs = all_queries()
    names = [n for n in HEADLINE if n in qs]

    # Warm the JVM/codegen once with the flagship before timing.
    qs["pricing_summary"].fn(spark, sf_dir).collect()

    cold: dict[str, float] = {}
    warm: dict[str, float] = {}
    warm_samples: dict[str, list[float]] = {}
    for name in names:
        cold[name] = _run(qs, name, spark, sf_dir)
        warm_samples[name] = sorted(_run(qs, name, spark, sf_dir) for _ in range(3))
        warm[name] = warm_samples[name][1]
    # RUN_ONCE actions (MLlib training) are reported separately so
    # "value" stays the lazy-query total, comparable round-over-round.
    once: dict[str, float] = {}
    for name in RUN_ONCE:
        if name in qs:
            once[name] = _run(qs, name, spark, sf_dir)

    total = round(sum(cold.values()), 3)
    sf_val = float(sf) if sf.replace(".", "").isdigit() else sf
    detail = {
        "metric": "headline_queries_total_sec",
        "value": total,
        "unit": "sec",
        "queries": cold,
        "queries_warm": warm,
        "warm_samples": warm_samples,
        "value_warm": round(sum(warm.values()), 3),
        "queries_once": once,
        "sf": sf_val,
    }
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "BENCH_LOCAL.json"), "w") as f:
        json.dump(detail, f, indent=1)
    # BENCH_r09 came back parsed:null — the 58-query one-line JSON at
    # full precision with spaced separators outgrew the driver's
    # 2000-char tail capture, clipping the line START. The driver
    # contract wants ONE JSON line carrying metric/value/unit/queries/
    # sf, so the LAST line is exactly that, kept inside the capture by
    # compact separators + 2-decimal per-query times (62 queries ≈
    # 1900 chars; measured against the 2000-char tail). Full-precision
    # cold/warm detail stays in BENCH_LOCAL.json, and value_warm is
    # only appended when the line still fits.
    print(final_line(total, cold, round(sum(warm.values()), 3), sf_val))
    spark.stop()


if __name__ == "__main__":
    main()
