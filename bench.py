"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec, ...}, "sf": ...}.
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
HEADLINE = [
    "pricing_summary",
    "join_inner_revenue_by_nation",
    "join_left_order_counts",
    "join_range_bands",
    "join_asof_purchase_click",
    "agg_stats_by_flag",
    "agg_count_distinct",
    "agg_percentiles",
    # agg_percentiles_twophase is the 100 TB path (no per-group buffering)
    # but pays a ~10-join plan-compile cost that dominates at sf0.1 —
    # registered + oracle-checked, not a headline timing.
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
    "grouped_zscore_applyinpandas",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    spark = get_spark("bench")
    qs = all_queries()
    names = [n for n in HEADLINE if n in qs]

    # Warm the JVM/codegen once with the flagship before timing.
    qs["pricing_summary"].fn(spark, sf_dir).collect()

    timings: dict[str, float] = {}
    for name in names:
        t0 = time.time()
        df = qs[name].fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.time() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
