"""Query registry — the single source of truth for the driver contract.

Every implemented operator registers an exemplar query here via the
``@query`` decorator. ``__spark_entry__.queries()`` / ``oracle_sql()``
are thin views over this registry: each entry pairs a Spark DataFrame
builder ``(spark, sf_dir) -> DataFrame`` with (when SQL-expressible) an
equivalent ANSI-SQL string the DuckDB oracle can run on the same parquet
tables. Non-SQL-expressible operators (LSH, MLlib fits, streaming state)
register with ``oracle=None`` → the driver records a rows-only check.

Column-name parity rule: the driver sorts columns by name before value
hashing, so every computed column is aliased identically in the Spark
code and the oracle SQL (see SURVEY.md §5.2).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class EngineQuery:
    name: str
    fn: QueryFn
    oracle: str | None
    tags: tuple[str, ...] = field(default_factory=tuple)
    doc: str = ""


_REGISTRY: dict[str, EngineQuery] = {}


def query(name: str, oracle: str | None = None, tags: tuple[str, ...] = ()):
    """Register an exemplar query under ``name``.

    ``oracle`` is DuckDB-flavored ANSI SQL over the pre-registered views
    (region nation customer supplier part orders lineitem events
    documents embeddings), or None for rows-only checks.
    """

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        _REGISTRY[name] = EngineQuery(
            name=name, fn=fn, oracle=oracle, tags=tuple(tags), doc=fn.__doc__ or ""
        )
        return fn

    return deco


# The driver's CORRECTNESS gate records the FIRST 50 queries in
# registration order. This window is curated so those 50 rows sample
# every operator family (relational/join/setop, agg incl. sketches and
# the two-phase exact percentile, window/topk, scalar string/date/math/
# json/variant/array/map, dedup incl. the linear-output LSH path, text,
# similarity incl. IVF ANN, ML reports/MI, reference-parity ops,
# corpus curation (contamination, one-plan pipeline, SemDeDup,
# unigram-LM quality), regression aggregates, correlated subqueries,
# multimodal mapInPandas, skew/scale patterns incl. dynamic partition
# pruning, warehouse maintenance (SCD2, gap-fill), profiling, PII
# scrubbing, event-time windows, UDTF, pandas UDAF, sinks) rather than
# the import-order prefix.
# Everything else stays registered and oracle-checked locally —
# members displaced across rounds (filter_predicates, join_left_...,
# agg_stats_by_flag, agg_count_distinct, agg_percentiles in r02;
# join_semi/anti (family still repped by inner/right/range/as-of),
# sim_semdedup and text_contamination_overlap in r03 — displaced for
# the new retrieval / exact-similarity-join / interpolation /
# sessionization families, whose tags the window now samples)
# were already driver-green in an earlier CORRECTNESS ledger.
# Round-3 rotation: every r01/r02-certified entry rotated out; 36 of 50
# are FIRST-TIME driver checks (tpch/warehouse/stats/retrieval/sql
# families plus this round's new KS, WAV-decode, and determinism-fixed
# queries). The 14 already-certified anchors remain only because their
# family tag exists nowhere else in the SQL-oracled registry
# (tests/test_registry.py::test_window_samples_every_family).
# Round-3b: five first-time entries whose EVERY family tag stays
# covered by other window members (text_token_stats, mm_metadata_stats,
# events_tumbling_window, tpch_q5_local_supplier, agg_hll_partial_merge
# — the last's sketch family was already driver-certified in r02 via
# agg_approx_count_distinct/agg_percentile_approx) made room for five
# NEW operator families that have never appeared in any driver ledger:
# drift monitoring (PSI/JSD), record linkage, rank-based hypothesis
# testing, ranking-quality evaluation, and EWMA anomaly screening.
# The displaced five remain tri-SF green in the local gate.
DRIVER_WINDOW: tuple[str, ...] = (
    # first-time: greedy family cover over never-driver-checked queries
    "tpch_q3_shipping_priority",
    "scalar_regexp_functions",
    # round-3e: the two NEW families added at round close (one-pass
    # Poisson-bootstrap resampling; histogram decision-stump tree
    # induction) displace sim_blocked_gemm_topk and
    # ml_ols_normal_equations — the only two members every one of
    # whose family tags stays window-covered (sim/topk/embeddings by
    # sim_ivf_assign + er_blocked_fuzzy_parts; ml/regression/
    # closed-form by ml_naive_bayes_tokens + stats_theil_sen +
    # ml_isotonic... carriers). Both displaced entries remain tri-SF
    # green in the local gate.
    "stats_poisson_bootstrap_ci",
    "ml_decision_stump",
    "ref_interval_join_bucketed",
    "ml_best_feature_by_mi",
    "sql_lateral_top_customer",
    "events_ewma_deviation",
    # round-3f: CUPED covariate adjustment (a NEW experimentation
    # family) displaces window_range_interval — the plain window
    # family was driver-certified in r01/r02 and stays sampled by
    # events_cusum_changepoint / analytics_skyline_pareto /
    # stats_kaplan_meier; range frames remain tri-SF green locally.
    "stats_cuped_adjustment",
    "array_posexplode_outer",
    "stats_psi_drift",
    "sim_ivf_assign",
    "er_blocked_fuzzy_parts",
    "set_intersectall_flags",
    "grouped_zscore_applyinpandas",
    "join_asof_tolerance",
    "ml_distinct_classes",
    "skew_salted_join",
    "tpch_q18_large_orders",
    "stats_mann_whitney_u",
    # first-time: this round's new / determinism-hardened queries
    "mm_wav_decode_stats",
    "stats_ks_two_sample",
    "merge_upsert_orders",
    "retrieval_ranking_metrics",
    "scd2_point_in_time_join",
    # round-3d: five NEW never-driver-checked families (rolling distinct
    # actives, seasonal-trend decomposition, robust Theil-Sen trend,
    # difference-in-differences causal inference, order-statistic
    # median CI) displace four first-time entries whose every family
    # tag stays window-covered (stats_ks_binned_ecdf by
    # stats_ks_two_sample + agg_count_min_sketch; events_ohlc_bars by
    # cusum/ewma; snapshot_diff_orders by merge_upsert + scd2;
    # retrieval_phrase_positions by retrieval_ranking_metrics) and the
    # one certified anchor whose family tag is no longer solely carried
    # (agg_regression_by_flag, r01-green; 'regression' now carried by
    # ml_ols_normal_equations and stats_theil_sen). The displaced five
    # remain tri-SF green in the local gate.
    "events_rolling_active_users",
    "analytics_stl_decomposition",
    "stats_theil_sen",
    "stats_diff_in_diff",
    "stats_median_ci",
    # round-3c: eight never-driver-checked NEW families (timeseries/
    # CUSUM, spatial join, closed-form OLS, relational naive Bayes,
    # count-min sketch, k-hop BFS, Kaplan-Meier survival, skyline)
    # displace eight first-time entries whose every family tag stays
    # window-covered (the displaced eight remain tri-SF green in the
    # local gate and their families are sampled by other members).
    "events_cusum_changepoint",
    "geo_cell_distance_join",
    "ml_naive_bayes_tokens",
    "agg_count_min_sketch",
    "graph_khop_reachability",
    "stats_kaplan_meier",
    "analytics_skyline_pareto",
    # already-certified anchors: sole carriers of a required family tag
    "agg_rollup",
    "scalar_math_functions",
    "scalar_variant_extract",
    "scalar_map_functions",
    "dedup_minhash_keep_first",
    "dedup_simhash",
    "text_tfidf_top_terms",
    "text_unigram_logprob",
    "ml_confusion_matrix",
    "ref_power_to_db",
    "events_session_window",
    "udtf_split_words",
    "sink_csv_roundtrip",
)


def all_queries() -> dict[str, EngineQuery]:
    # Import side-effect modules exactly once; each registers its queries.
    import big_data_audio_classification_spark.queries  # noqa: F401

    missing = [n for n in DRIVER_WINDOW if n not in _REGISTRY]
    if missing:
        raise ValueError(f"DRIVER_WINDOW names unregistered queries: {missing}")
    ordered = {n: _REGISTRY[n] for n in DRIVER_WINDOW}
    ordered.update((n, q) for n, q in _REGISTRY.items() if n not in ordered)
    return ordered


def spark_queries() -> dict[str, QueryFn]:
    return {n: q.fn for n, q in all_queries().items()}


def oracle_sqls() -> dict[str, str]:
    return {n: q.oracle for n, q in all_queries().items() if q.oracle is not None}
