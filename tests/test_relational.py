"""Contract smoke + semantics tests for the relational core."""

from __future__ import annotations

import pyspark.sql.functions as F

from big_data_audio_classification_spark.operators import relational, windows
from big_data_audio_classification_spark.sources.catalog import load_table


def test_pricing_summary_smoke(spark, sf_dir):
    rows = relational.pricing_summary(spark, sf_dir).collect()
    assert len(rows) > 0
    cols = set(rows[0].asDict())
    assert {"l_returnflag", "sum_qty", "avg_price", "count_order"} <= cols
    # every group's avg*count ≈ sum (internal consistency)
    for r in rows:
        assert abs(r.avg_qty * r.count_order - r.sum_qty) / max(r.sum_qty, 1) < 1e-3


def test_semi_plus_anti_partition_customers(spark, sf_dir):
    """semi(with F-orders) and anti(no orders) are disjoint; anti+having
    orders = all customers."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    n_cust = c.count()
    with_orders = c.join(o, c.c_custkey == o.o_custkey, "left_semi").count()
    without = relational.join_anti_customers_without_orders(spark, sf_dir).count()
    assert with_orders + without == n_cust


def test_left_join_keeps_all_customers(spark, sf_dir):
    out = relational.join_left_order_counts(spark, sf_dir)
    n_cust = load_table(spark, sf_dir, "customer").count()
    assert out.count() == n_cust


def test_range_join_partitions_orders(spark, sf_dir):
    out = relational.join_range_bands(spark, sf_dir).collect()
    n_orders = load_table(spark, sf_dir, "orders").count()
    assert sum(r.n_orders for r in out) == n_orders  # bands tile the domain


def test_set_algebra(spark, sf_dir):
    """|A ∪ B| = |A| + |B| - |A ∩ B| over the segment key sets."""
    c = load_table(spark, sf_dir, "customer")
    a = c.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    b = c.filter(F.col("c_acctbal") > 1000).select("c_custkey")
    union = a.union(b).distinct().count()
    inter = a.intersect(b).count()
    assert union == a.count() + b.count() - inter
    assert relational.set_except_segments(spark, sf_dir).count() == a.count() - inter


def test_topk_per_group_bound(spark, sf_dir):
    out = windows.topk_orders_per_customer(spark, sf_dir)
    per_group = out.groupBy("o_custkey").count().agg(F.max("count")).first()[0]
    assert per_group <= 3


def test_running_sum_matches_group_total(spark, sf_dir):
    """Window cumsum's final value per key == groupBy sum (SURVEY §5.3
    property: window-sum vs group-sum consistency)."""
    o = load_table(spark, sf_dir, "orders")
    cum = windows.window_running_spend(spark, sf_dir)
    final = cum.groupBy("o_custkey").agg(F.max("running_spend").alias("w"))
    direct = o.groupBy("o_custkey").agg(F.round(F.sum("o_totalprice"), 2).alias("g"))
    joined = final.join(direct, "o_custkey")
    bad = joined.filter(F.abs(F.col("w") - F.col("g")) > 0.011).count()
    assert bad == 0


def test_twophase_percentiles_match_builtin(spark, sf_dir):
    """The distributed two-phase exact percentile must equal Spark's own
    buffering percentile() bit-for-bit after the shared 1e-4 rounding."""
    from big_data_audio_classification_spark.operators.aggregates import (
        agg_percentiles,
        agg_percentiles_twophase,
    )

    builtin = {
        r.l_linestatus: (r.p50_price, r.p90_price)
        for r in agg_percentiles(spark, sf_dir).collect()
    }
    twophase = {
        r.l_linestatus: (r.p50_price, r.p90_price)
        for r in agg_percentiles_twophase(spark, sf_dir).collect()
    }
    assert builtin == twophase


def test_lateral_top_customer_matches_window_topk(spark, sf_dir):
    """The LATERAL correlated top-1 equals the window row_number top-1."""
    from pyspark.sql import Window

    out = {
        (r.n_name, r.c_name): r.c_acctbal
        for r in relational.sql_lateral_top_customer(spark, sf_dir).collect()
    }
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    w = Window.partitionBy("n_name").orderBy(
        F.col("c_acctbal").desc(), F.col("c_name")
    )
    expect = {
        (r.n_name, r.c_name): r.c_acctbal
        for r in c.join(n, c.c_nationkey == n.n_nationkey)
        .select("n_name", "c_name", "c_acctbal", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") == 1)
        .collect()
    }
    assert out == expect


def test_recursive_month_rollup_dense_axis(spark, sf_dir):
    """All 12 months present even when no orders fall in one."""
    rows = relational.sql_recursive_month_rollup(spark, sf_dir).collect()
    assert [r.mth for r in rows] == list(range(1, 13))
    total_orders = sum(r.n_orders for r in rows)
    assert total_orders == load_table(spark, sf_dir, "orders").count()


def test_containment_join_matches_python_replay(spark, sf_dir):
    """Pairs and both containment directions must equal a pure-python
    shingle replay, and containment must dominate Jaccard."""
    import hashlib

    import pandas as pd

    from big_data_audio_classification_spark.operators.dedup import (
        CONT_DF_CAP,
        CONT_SHINGLE,
        CONT_THRESHOLD,
        dedup_containment_join,
    )

    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    prof = {}
    for doc_id, text in zip(docs["doc_id"], docs["text"]):
        toks = [t for t in text.split(" ") if t]
        hs = {
            int(
                hashlib.md5(
                    " ".join(toks[i : i + CONT_SHINGLE]).encode()
                ).hexdigest()[:15],
                16,
            )
            for i in range(len(toks) - CONT_SHINGLE + 1)
        }
        if hs:
            prof[doc_id] = hs
    df = {}
    for hs in prof.values():
        for h in hs:
            df[h] = df.get(h, 0) + 1
    kept = {d: {h for h in hs if df[h] <= CONT_DF_CAP} for d, hs in prof.items()}

    expected = {}
    ids = sorted(kept)
    by_h = {}
    for d in ids:
        for h in kept[d]:
            by_h.setdefault(h, []).append(d)
    cand = {
        (a, b)
        for lst in by_h.values()
        for i, a in enumerate(lst)
        for b in lst[i + 1:]
    }
    for a, b in cand:
        inter = len(kept[a] & kept[b])
        cab, cba = inter / len(kept[a]), inter / len(kept[b])
        if max(cab, cba) >= CONT_THRESHOLD:
            expected[(a, b)] = (inter, round(cab, 6), round(cba, 6))

    rows = dedup_containment_join(spark, sf_dir).collect()
    got = {(r.id_a, r.id_b): (r.n_common, r.c_ab, r.c_ba) for r in rows}
    assert got == expected
    for (a, b), (inter, cab, cba) in expected.items():
        jac = inter / len(kept[a] | kept[b])
        assert max(cab, cba) >= jac  # containment dominates Jaccard


def test_keep_best_dedup_prefers_quality_and_partitions(spark, sf_dir):
    """Keep-best must (a) agree with keep-first on WHICH docs are
    duplicates of something, (b) choose reps of >= quality, and (c)
    every doc's rep must itself be kept-or-better within one hop."""
    import pandas as pd

    from big_data_audio_classification_spark.operators.dedup import (
        dedup_minhash_keep_best,
        dedup_minhash_keep_first,
    )

    docs = pd.read_parquet(f"{sf_dir}/documents.parquet").set_index("doc_id")
    best = {r.doc_id: r for r in dedup_minhash_keep_best(spark, sf_dir).collect()}
    first = {r.doc_id: r for r in dedup_minhash_keep_first(spark, sf_dir).collect()}
    assert set(best) == set(first)
    for d, r in best.items():
        # a doc that lost under keep-best lost to a strictly better
        # (quality, -id) key — never to a worse document
        if not r.is_kept:
            assert r.rep != d
            q, rq = docs.loc[d, "n_chars"], docs.loc[r.rep, "n_chars"]
            assert (rq, -r.rep) > (q, -d)
        else:
            assert r.rep == d
    kept = sum(1 for r in best.values() if r.is_kept)
    assert 0 < kept <= len(best)


def test_source_overlap_matrix_matches_python_replay(spark, sf_dir):
    """Jaccard/overlap per source pair must equal a pure-python shingle
    replay, and overlap_coef must dominate jaccard."""
    import hashlib

    import pandas as pd

    from big_data_audio_classification_spark.operators.text import (
        OVERLAP_SHINGLE,
        text_source_overlap_matrix,
    )

    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    sets = {}
    for src, text in zip(docs["source"], docs["text"]):
        toks = [t for t in text.split(" ") if t]
        s = sets.setdefault(src, set())
        for i in range(len(toks) - OVERLAP_SHINGLE + 1):
            g = " ".join(toks[i : i + OVERLAP_SHINGLE])
            s.add(int(hashlib.md5(g.encode()).hexdigest()[:15], 16))

    rows = text_source_overlap_matrix(spark, sf_dir).collect()
    names = sorted(sets)
    seen = {(r.src_a, r.src_b) for r in rows}
    # zero-intersection pairs are absent by design (inner hash join)
    for i, a in enumerate(names):
        for b in names[i + 1:]:
            if (a, b) not in seen:
                assert not (sets[a] & sets[b]), (a, b)
    for r in rows:
        a, b = sets[r.src_a], sets[r.src_b]
        inter = len(a & b)
        assert r.n_common == inter
        assert abs(r.jaccard - inter / len(a | b)) < 1e-6
        assert abs(r.overlap_coef - inter / min(len(a), len(b))) < 1e-6
        assert r.overlap_coef >= r.jaccard


def test_containment_xxhash_variant_matches_md5(spark, sf_dir):
    """The engine-hash containment variant (r05) must produce the
    identical pair set: shingle hashes are opaque identifiers, so the
    df-cap, sizes, and intersections are hash-invariant up to 64-bit
    collisions (~1e-8 at this corpus)."""
    from big_data_audio_classification_spark.operators.dedup import (
        dedup_containment_join,
        dedup_containment_join_xxhash,
    )

    md5_rows = sorted(
        (r.id_a, r.id_b, r.n_common, r.c_ab, r.c_ba)
        for r in dedup_containment_join(spark, sf_dir).collect()
    )
    xx_rows = sorted(
        (r.id_a, r.id_b, r.n_common, r.c_ab, r.c_ba)
        for r in dedup_containment_join_xxhash(spark, sf_dir).collect()
    )
    assert md5_rows == xx_rows and md5_rows
