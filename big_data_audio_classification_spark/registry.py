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
# every operator family (tests/test_registry.py enforces the tag
# cover) rather than the import-order prefix, and is ROTATED each
# round so never-driver-checked queries get certified: everything
# displaced from an earlier window stays registered and tri-SF green
# in the local gate (scripts/check_oracle.py), and 118 distinct
# queries were driver-certified across r01–r03 ledgers.
#
# Round-4 rotation: 48 of the 50 r03 rows came back green, so all 48
# rotate out. This window holds
#   * 2 retries — scalar_regexp_functions / ml_distinct_classes were
#     `err` in r03 (array-typed outputs broke the driver's pandas
#     canonicalizer; both now serialize via array_join and must come
#     back green),
#   * 33 more FIRST-TIME entries chosen by greedy family cover over the
#     174 never-driver-checked SQL-oracled queries (sql/tpch/sketch/
#     window/dedup-CC/text/curation/similarity/multimodal/profiling/
#     warehouse/timeseries families), including the round-4 additions
#     sim_ivf_recall_at_k (sole 'ivf' carrier), dedup_lsh_recall, and
#     mm_phash_banded_neardup (the last two swapped in for the equally
#     never-checked dedup_ngram_jaccard / mm_frame_sample, which stay
#     tri-SF green locally and rotate into r05), and
#   * 15 already-certified anchors kept ONLY because they are the
#     sole remaining carriers of a required family tag (asof,
#     grouping, math, variant, map, simhash, tfidf, feature-selection,
#     range-join, audio-math, udaf, csv, rolling, decomposition,
#     causal).
# NOTE: earlier comments here claimed sim_semdedup / text_token_stats /
# mm_metadata_stats were driver-green in r02 — the r01–r03 ledger
# files show none of them ever appeared; they are counted (and
# rotated in) as first-time entries.
DRIVER_WINDOW: tuple[str, ...] = (
    # retries: r03 `err` rows, outputs now serialized
    "scalar_regexp_functions",
    "ml_distinct_classes",
    # first-time: SQL surface (recursive CTE, PIVOT clause)
    "sql_recursive_month_rollup",
    "sql_pivot_clause",
    # first-time: TPC-H (pushdown, join+topk, correlated-subquery)
    "tpch_q6_forecast_revenue",
    "tpch_q10_returned_items",
    "tpch_q21_waiting_supplier",
    # first-time: set ops / sketches / windows
    "set_exceptall_flags",
    "agg_hll_partial_merge",
    "agg_approx_top_k",
    "window_range_interval",
    # first-time: scalar families
    "scalar_to_json",
    "array_higher_order_predicates",
    # first-time: dedup / text / curation
    "dedup_cc_transitive_oracle",
    "dedup_lsh_recall",
    "text_langid_heuristic",
    "text_bigram_logprob",
    "text_zipf_fit",
    "curation_pack_sequences",
    # first-time: similarity incl. the new ANN recall gate
    "sim_ivf_recall_at_k",
    "sim_semdedup",
    "sim_pq_adc_topk",
    "sim_blocked_gemm_topk",
    # first-time: ML evaluation / inference / reference parity
    "ml_calibration_bins",
    "ml_roc_auc",
    "ml_argmax_probability",
    "ref_dedup_by_key",
    # first-time: multimodal / scale / skew / streaming-time / UDTF
    "mm_phash_banded_neardup",
    "profile_join_skew",
    "bucketed_colocated_join",
    "events_tumbling_window",
    "udtf_table_arg_sessions",
    "sink_parquet_partitioned_roundtrip",
    # first-time: robust-trend stats + warehouse audit diff
    "stats_mann_kendall_trend",
    "snapshot_diff_orders",
    # already-certified anchors: sole carriers of a required family tag
    "join_asof_tolerance",       # asof
    "agg_rollup",                # grouping
    "scalar_math_functions",     # math
    "scalar_variant_extract",    # variant
    "scalar_map_functions",      # map
    "dedup_simhash",             # simhash
    "text_tfidf_top_terms",      # tfidf
    "ml_best_feature_by_mi",     # feature-selection
    "ref_interval_join_bucketed",  # range-join
    "ref_power_to_db",           # audio-math
    "grouped_zscore_applyinpandas",  # udaf
    "sink_csv_roundtrip",        # csv
    "events_rolling_active_users",   # rolling
    "analytics_stl_decomposition",   # decomposition
    "stats_diff_in_diff",        # causal
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
