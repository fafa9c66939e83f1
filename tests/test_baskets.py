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
        tuple(int(x) for x in r["itemset"].split(",")): r["freq"]
        for r in baskets.ml_fpgrowth_baskets(spark, sf_dir).collect()
        if r["itemset"].count(",") == 1  # r05: itemsets serialize as csv
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
        int(r["itemset"]): r["freq"]
        for r in baskets.ml_fpgrowth_baskets(spark, sf_dir).collect()
        if "," not in r["itemset"]  # r05: itemsets serialize as csv
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


def test_prefixspan_patterns_are_antimonotone(spark, sf_dir):
    """Sequential-pattern support is anti-monotone: a length-2 pattern
    can never be more frequent than either of its items, and every
    returned pattern meets the minimum-support threshold."""
    import math

    import pyspark.sql.functions as F

    from big_data_audio_classification_spark.operators.baskets import (
        PSPAN_MIN_SUPPORT,
        PSPAN_PREFIX_LEN,
        ml_prefixspan_sequences,
    )
    from big_data_audio_classification_spark.sources.catalog import load_table

    rows = {r["pattern"]: r["freq"] for r in ml_prefixspan_sequences(spark, sf_dir).collect()}
    n_users = (
        load_table(spark, sf_dir, "events").select("user_id").distinct().count()
    )
    thresh = math.ceil(PSPAN_MIN_SUPPORT * n_users)
    assert rows, "no frequent patterns found"
    for pat, freq in rows.items():
        assert freq >= thresh
        parts = pat.split(">")
        assert 1 <= len(parts) <= 2
        if len(parts) == 2:
            for p in parts:
                # components of a frequent pattern are frequent (and at
                # least as frequent) — Apriori property
                assert p in rows and rows[p] >= freq
