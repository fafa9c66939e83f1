"""Semantics tests for the advanced operator exemplars."""

from __future__ import annotations

import pyspark.sql.functions as F

from big_data_audio_classification_spark.operators import advanced
from big_data_audio_classification_spark.sources.catalog import load_table


def test_asof_join_covers_every_purchase(spark, sf_dir):
    """Left as-of: exactly one output row per purchase event; matched
    click never later than the purchase."""
    ev = load_table(spark, sf_dir, "events")
    n_purchases = ev.filter(F.col("event_type") == "purchase").count()
    out = advanced.join_asof_purchase_click(spark, sf_dir)
    assert out.count() == n_purchases
    late = out.join(
        ev.select(F.col("event_id").alias("purchase_id"), F.col("ts").alias("p_ts")),
        "purchase_id",
    ).filter(F.col("click_ts").cast("timestamp") > F.col("p_ts"))
    assert late.count() == 0


def test_asof_join_is_latest_click(spark, sf_dir):
    """The matched click is the maximal eligible one (no later click by
    the same user at-or-before the purchase)."""
    ev = load_table(spark, sf_dir, "events")
    out = advanced.join_asof_purchase_click(spark, sf_dir).filter(
        F.col("click_id").isNotNull()
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("c_ts")
    )
    purchases = ev.select(
        F.col("event_id").alias("purchase_id"), F.col("ts").alias("p_ts")
    )
    better = (
        out.join(purchases, "purchase_id")
        .join(clicks, "user_id")
        .filter(
            (F.col("c_ts") <= F.col("p_ts"))
            & (F.col("c_ts") > F.col("click_ts").cast("timestamp"))
        )
    )
    assert better.count() == 0


def test_multiset_algebra(spark, sf_dir):
    """|A ∩all B| + |A \\all B| = |A| for multisets."""
    li = load_table(spark, sf_dir, "lineitem")
    a = li.filter(F.col("l_quantity") <= 25).select("l_returnflag", "l_linestatus")
    n_inter = advanced.set_intersectall_flags(spark, sf_dir).count()
    # intersectall uses a different B; check exceptall against its own B
    b = li.filter(F.col("l_quantity") <= 10).select("l_returnflag", "l_linestatus")
    n_except = advanced.set_exceptall_flags(spark, sf_dir).count()
    assert n_except == a.count() - b.count()  # b ⊆ a here
    assert n_inter > 0


def test_union_by_name_aligns_columns(spark, sf_dir):
    out = advanced.set_union_by_name(spark, sf_dir)
    assert out.columns == ["acct_key", "balance", "side"]
    sides = {r.side for r in out.select("side").distinct().collect()}
    assert sides <= {"customer", "supplier"}


def test_udtf_word_counts_match_builtin(spark, sf_dir):
    """UDTF fan-out row count == posexplode(split()) row count."""
    out_n = advanced.udtf_split_words(spark, sf_dir).count()
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    builtin_n = docs.select(
        F.posexplode(F.split("text", " ", -1)).alias("pos", "word")
    ).count()
    assert out_n == builtin_n > 0


def test_weighted_udaf_between_min_max(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    bounds = li.groupBy("l_returnflag").agg(
        F.min("l_extendedprice").alias("lo"), F.max("l_extendedprice").alias("hi")
    )
    out = advanced.agg_pandas_udaf_weighted(spark, sf_dir).join(bounds, "l_returnflag")
    bad = out.filter(
        (F.col("weighted_avg_price") < F.col("lo"))
        | (F.col("weighted_avg_price") > F.col("hi"))
    ).count()
    assert bad == 0


def test_zscore_group_stats(spark, sf_dir):
    """Per group: mean(z) ≈ 0 and pop-std(z) ≈ 1."""
    out = advanced.grouped_zscore_applyinpandas(spark, sf_dir)
    stats = out.groupBy("o_orderstatus").agg(
        F.avg("zscore").alias("mu"), F.stddev_pop("zscore").alias("sd")
    )
    for r in stats.collect():
        assert abs(r.mu) < 1e-3
        assert abs(r.sd - 1.0) < 1e-3


def test_parquet_roundtrip_preserves_counts(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 30)
    out = advanced.sink_parquet_partitioned_roundtrip(spark, sf_dir)
    assert out.agg(F.sum("n")).first()[0] == li.count()


def test_sortwithin_partition_local_order(spark, sf_dir):
    """Rows are sorted by (custkey, orderdate) within each partition."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")

    def is_sorted(it):
        rows = list(it)
        yield all(a <= b for a, b in zip(rows, rows[1:]))

    parts = (
        o.repartition(8, "o_custkey")
        .sortWithinPartitions("o_custkey", "o_orderdate")
        .select("o_custkey", "o_orderdate")
        .rdd.mapPartitions(is_sorted)
        .collect()
    )
    assert all(parts)


def test_connected_components_matches_union_find(spark, sf_dir):
    """Spark CC over the LSH bucket graph == Python union-find on the
    same candidate pairs, with min-doc_id component labels."""
    from big_data_audio_classification_spark.operators import dedup

    pairs = [
        (r.id_a, r.id_b)
        for r in dedup.dedup_minhash_lsh_pairs(spark, sf_dir).collect()
    ]
    docs = [
        r.doc_id
        for r in dedup.dedup_minhash_signatures(spark, sf_dir)
        .select("doc_id")
        .collect()
    ]
    parent = {d: d for d in docs}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    expected = {d: find(d) for d in docs}

    got = {
        r.doc_id: r.component
        for r in dedup.dedup_connected_components(spark, sf_dir).collect()
    }
    assert got == expected


def test_hll_partial_merge_tracks_direct_sketch(spark, sf_dir):
    """Merging per-(flag,status) sketches tracks both the direct sketch
    and the exact count — the mergeability contract. (Union is not
    bit-identical to direct sketching: DataSketches coerces sketch state
    on union, so estimates agree approximately, not exactly.)"""
    import pyspark.sql.functions as F

    from big_data_audio_classification_spark.sources.catalog import load_table

    li = load_table(spark, sf_dir, "lineitem")
    merged = (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(F.hll_sketch_agg("l_orderkey").alias("sk"))
        .groupBy("l_returnflag")
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est"))
    )
    direct = li.groupBy("l_returnflag").agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("l_orderkey")).alias("est")
    )
    exact = li.groupBy("l_returnflag").agg(
        F.countDistinct("l_orderkey").alias("n")
    )
    m = {r.l_returnflag: r.est for r in merged.collect()}
    d = {r.l_returnflag: r.est for r in direct.collect()}
    e = {r.l_returnflag: r.n for r in exact.collect()}
    for flag, n in e.items():
        assert abs(m[flag] - d[flag]) / n < 0.01
        assert abs(m[flag] - n) / n < 0.05


def test_udtf_table_arg_sessions_match_session_window(spark, sf_dir):
    """Cross-API consistency: the TABLE-arg UDTF's per-user session
    count must equal the number of session_window groups per user (same
    30-min gap; micro-precision timestamps make the exact-boundary
    half-open edge unreachable), and event counts must total the
    stream."""
    from collections import Counter

    from big_data_audio_classification_spark.operators.advanced import (
        udtf_table_arg_sessions,
    )
    from big_data_audio_classification_spark.sources.catalog import load_table
    from big_data_audio_classification_spark.streaming.events import (
        events_session_window,
    )

    out = {r["user_id"]: r for r in udtf_table_arg_sessions(spark, sf_dir).collect()}
    total_events = load_table(spark, sf_dir, "events").count()
    assert sum(r["n_events"] for r in out.values()) == total_events
    sw = Counter(
        r["user_id"] for r in events_session_window(spark, sf_dir).collect()
    )
    assert set(out) == set(sw)
    for uid, r in out.items():
        assert r["n_sessions"] == sw[uid]
        assert 1 <= r["n_sessions"] <= r["n_events"]


def test_kmv_matches_numpy_bottomk_and_merges(spark, sf_dir):
    """The KMV row must equal a numpy bottom-k replay, and the sketch
    must be mergeable: union sketch == truncated merge of part
    sketches."""
    import hashlib

    import pandas as pd

    from big_data_audio_classification_spark.operators.aggregates import (
        KMV_HEX,
        KMV_K,
        KMV_SCALE,
        agg_kmv_distinct,
    )

    pdf = pd.read_parquet(f"{sf_dir}/orders.parquet")
    keys = pdf["o_custkey"].unique()

    def h(v):
        return int(hashlib.md5(str(v).encode()).hexdigest()[:KMV_HEX], 16)

    hs = sorted({h(k) for k in keys})
    bottom = hs[:KMV_K]
    kth_u = bottom[-1] / KMV_SCALE
    est = (len(bottom) - 1) / kth_u

    r = agg_kmv_distinct(spark, sf_dir).collect()[0]
    assert r.k == len(bottom)
    assert r.exact_distinct == len(keys)
    assert abs(r.kth_min_u - round(kth_u, 9)) < 1e-12
    assert abs(r.est_distinct - est) < 1e-3
    # KMV standard error is ~1/sqrt(k-2); allow 4 sigma.
    assert r.rel_err_pct < 400.0 / (KMV_K - 2) ** 0.5

    # Mergeability: split keys by parity, sketch each, merge, truncate.
    part = [
        sorted({h(k) for k in keys if k % 2 == p})[:KMV_K] for p in (0, 1)
    ]
    merged = sorted(set(part[0]) | set(part[1]))[:KMV_K]
    assert merged == bottom


def test_schema_evolution_nulls_only_old_generation(spark, sf_dir):
    """Every batch-1 row must carry NULL n_regionkey; every batch-2 row
    must match the dimension exactly."""
    import pandas as pd

    from big_data_audio_classification_spark.operators.advanced import (
        sink_parquet_schema_evolution,
    )

    nat = pd.read_parquet(f"{sf_dir}/nation.parquet")
    rows = sink_parquet_schema_evolution(spark, sf_dir).collect()
    assert len(rows) == 2 * len(nat)
    region_of = dict(zip(nat["n_nationkey"], nat["n_regionkey"]))
    for r in rows:
        if r.b == 1:
            assert r.n_regionkey is None
        else:
            assert r.n_regionkey == region_of[r.n_nationkey]
