"""FPGrowth vs the SQL pair-count ground truth: every frequent
2-itemset FPGrowth reports must carry exactly the support the
relational self-join counts, and the 1-itemset supports must match
plain item frequencies."""

from __future__ import annotations

import pyspark.sql.functions as F

from big_data_audio_classification_spark.operators import baskets
from big_data_audio_classification_spark.sources.catalog import load_table


def test_fpgrowth_pair_supports_match_sql_counts(spark, sf_dir):
    fp = {
        tuple(r["itemset"]): r["freq"]
        for r in baskets.ml_fpgrowth_baskets(spark, sf_dir).collect()
        if len(r["itemset"]) == 2
    }
    li = load_table(spark, sf_dir, "lineitem")
    b = li.select(
        "l_orderkey", (F.col("l_partkey") % 100).alias("item")
    ).distinct()
    a2, b2 = b.alias("a"), b.alias("b")
    sql_pairs = {
        (r["item_a"], r["item_b"]): r["support"]
        for r in (
            a2.join(
                b2,
                (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
                & (F.col("a.item") < F.col("b.item")),
            )
            .groupBy(
                F.col("a.item").alias("item_a"), F.col("b.item").alias("item_b")
            )
            .agg(F.count("*").alias("support"))
        ).collect()
    }
    assert fp, "FPGrowth returned no 2-itemsets at this support level"
    for pair, freq in fp.items():
        assert sql_pairs.get(pair) == freq, f"pair {pair}"


def test_fpgrowth_singleton_supports_match_item_frequencies(spark, sf_dir):
    singles = {
        r["itemset"][0]: r["freq"]
        for r in baskets.ml_fpgrowth_baskets(spark, sf_dir).collect()
        if len(r["itemset"]) == 1
    }
    li = load_table(spark, sf_dir, "lineitem")
    freqs = {
        r["item"]: r["n"]
        for r in (
            li.select("l_orderkey", (F.col("l_partkey") % 100).alias("item"))
            .distinct()
            .groupBy("item")
            .agg(F.count("*").alias("n"))
        ).collect()
    }
    assert singles
    for item, freq in singles.items():
        assert freqs[item] == freq
