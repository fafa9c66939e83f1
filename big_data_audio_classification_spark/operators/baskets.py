"""Market-basket / co-occurrence mining over order line items:
support-filtered item-pair counts (the relational a-priori step) and
MLlib FPGrowth frequent itemsets + association rules.

Scale notes:
* Pair generation self-joins lineitem ON the order key only — the
  quadratic term is bounded by basket size (TPC-H baskets are ~4-7
  lines), so the blow-up factor is a small constant, not corpus-sized;
  the support filter then collapses the output. This is the same
  bounded-block discipline as the dedup exemplars.
* FPGrowth compresses baskets into a prefix tree per partition and
  mines locally before a single merge — MLlib's distributed PFP
  (parallel FP-growth) partitioning by item suffix. Rows-only check:
  itemset mining order is engine-internal; the SQL sibling pins the
  pair-level ground truth and the pytest cross-checks the two.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from big_data_audio_classification_spark.registry import query
from big_data_audio_classification_spark.sources.catalog import load_table

BASKET_MIN_SUPPORT = 5  # absolute pair-count threshold


@query(
    "basket_item_pairs",
    oracle=f"""
        WITH b AS (
            SELECT DISTINCT l_orderkey, l_partkey % 100 AS item
            FROM lineitem
        )
        SELECT a.item AS item_a, b.item AS item_b,
               CAST(COUNT(*) AS BIGINT) AS support
        FROM b a JOIN b b ON a.l_orderkey = b.l_orderkey
                         AND a.item < b.item
        GROUP BY a.item, b.item
        HAVING COUNT(*) >= {BASKET_MIN_SUPPORT}
        ORDER BY support DESC, item_a, item_b
        LIMIT 50
    """,
    tags=("baskets", "co-occurrence", "lineitem"),
)
def basket_item_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequent item PAIRS by co-occurrence within an order (the
    a-priori 2-itemset step): one self-join keyed on the order, pair
    ordered a < b so each unordered pair counts once, support filter.
    Items are bucketed part keys (part % 100) so pair supports clear
    the threshold at test scale — the shape is identical for raw keys.

    Scale: the join is ONE order-keyed equi-join; within-basket pair
    fan-out is basket²  (a small constant), and map-side combine
    collapses the pair counts before the shuffle."""
    li = load_table(spark, sf_dir, "lineitem")
    b = li.select(
        "l_orderkey", (F.col("l_partkey") % 100).alias("item")
    ).distinct()
    a2, b2 = b.alias("a"), b.alias("b")
    return (
        a2.join(
            b2,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.item") < F.col("b.item")),
        )
        .groupBy(F.col("a.item").alias("item_a"), F.col("b.item").alias("item_b"))
        .agg(F.count("*").cast("bigint").alias("support"))
        .filter(F.col("support") >= BASKET_MIN_SUPPORT)
        .orderBy(F.desc("support"), "item_a", "item_b")
        .limit(50)
    )


FP_MIN_SUPPORT = 0.004
FP_MIN_CONFIDENCE = 0.3


@query(
    "ml_fpgrowth_baskets",
    oracle=None,  # itemset mining internals; cross-checked against the
    # SQL pair counts in tests/test_baskets.py
    tags=("baskets", "fpgrowth", "mllib", "lineitem"),
)
def ml_fpgrowth_baskets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MLlib FPGrowth frequent itemsets over order baskets (items =
    bucketed part keys), minSupport 0.4%. Returns itemsets with their
    absolute frequency, largest first.

    Docstring parity note: the reference has no basket mining; this is
    part of the mandated beyond-reference analytics surface."""
    from pyspark.ml.fpm import FPGrowth

    li = load_table(spark, sf_dir, "lineitem")
    baskets = (
        li.select("l_orderkey", (F.col("l_partkey") % 100).alias("item"))
        .distinct()
        .groupBy("l_orderkey")
        .agg(F.collect_set("item").alias("items"))
    )
    fp = FPGrowth(
        itemsCol="items",
        minSupport=FP_MIN_SUPPORT,
        minConfidence=FP_MIN_CONFIDENCE,
    )
    model = fp.fit(baskets)
    return (
        model.freqItemsets.select(
            F.array_sort("items").alias("itemset"),
            F.col("freq").cast("bigint").alias("freq"),
        )
        .orderBy(F.desc("freq"), F.col("itemset").cast("string"))
        .limit(500)
    )
