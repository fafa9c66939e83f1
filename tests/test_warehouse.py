"""Invariant tests for the warehouse-maintenance operators (their
value-level correctness is oracle-checked; these assert the structural
contracts a user relies on)."""

from __future__ import annotations

import pyspark.sql.functions as F

from big_data_audio_classification_spark.operators import warehouse
from big_data_audio_classification_spark.sources.catalog import load_table


def test_scd2_version_accounting(spark, sf_dir):
    """Output rows = |dim| + |changes| (each changed key gains exactly
    one extra version); every key has exactly one current row; closed
    rows have valid_to = the new version's valid_from."""
    out = warehouse.scd2_customer_segment(spark, sf_dir).cache()
    n_cust = load_table(spark, sf_dir, "customer").count()
    n_changed = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") % warehouse.SCD2_MOD == 3)
        .count()
    )
    assert out.count() == n_cust + n_changed
    current = out.filter("is_current").groupBy("c_custkey").count()
    assert current.filter("count != 1").count() == 0
    assert current.count() == n_cust
    closed = out.filter(~F.col("is_current"))
    assert closed.count() == n_changed
    assert closed.filter(F.col("valid_to").isNull()).count() == 0
    out.unpersist()


def test_gapfill_spine_is_dense(spark, sf_dir):
    """Every nation has every month exactly once (80 months 1995-01..
    2001-08), revenue is never null, and cum_revenue is monotone
    non-decreasing per nation."""
    out = warehouse.gapfill_monthly_revenue(spark, sf_dir).cache()
    n_nations = load_table(spark, sf_dir, "nation").count()
    assert out.count() == n_nations * 80
    per = out.groupBy("n_name").agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("month").alias("nd"),
    )
    assert per.filter("n != 80 or nd != 80").count() == 0
    assert out.filter(F.col("revenue").isNull()).count() == 0
    from pyspark.sql import Window

    w = Window.partitionBy("n_name").orderBy("month")
    lagged = out.withColumn("prev", F.lag("cum_revenue").over(w))
    assert lagged.filter(F.col("cum_revenue") < F.col("prev")).count() == 0
    out.unpersist()


def test_winsorize_bounds_hold(spark, sf_dir):
    """Winsorized mean sits between the clamp bounds; clamp counts sum
    to ~2% of rows (p01/p99 tails)."""
    out = warehouse.winsorize_order_prices(spark, sf_dir)
    rows = out.collect()
    total = sum(r.n for r in rows)
    clamped = sum(r.n_clamped_lo + r.n_clamped_hi for r in rows)
    # exact percentiles -> at most ~1% in each tail (plus ties slack)
    assert 0 < clamped <= 0.03 * total
    for r in rows:
        assert r.avg_wins > 0
        # clamping only the low tail can only raise the mean; only the
        # high tail, only lower it
        if r.n_clamped_hi == 0:
            assert r.avg_wins >= r.avg_raw - 0.01
        if r.n_clamped_lo == 0:
            assert r.avg_wins <= r.avg_raw + 0.01


def test_bloom_semijoin_no_false_negatives_and_low_fpr(spark, sf_dir):
    """Bloom filters never false-negative: every exact-member row must
    pass, and the observed FPR stays under a loose ceiling implied by
    the fill ratio (p_fp ~= fill^k)."""
    from big_data_audio_classification_spark.operators.warehouse import (
        BLOOM_K,
        warehouse_bloom_filter_semijoin,
    )

    r = warehouse_bloom_filter_semijoin(spark, sf_dir).collect()[0]
    assert r.n_pass_rows >= r.n_exact_rows  # no false negatives
    assert r.n_fp_rows == r.n_pass_rows - r.n_exact_rows
    assert 0.0 < r.fill_ratio < 1.0
    # Kirsch-Mitzenmacher k-hash filter: FPR ~ fill^k; allow 4x slack
    # for the small-key-set variance at test scale
    assert r.observed_fpr <= max(4 * r.fill_ratio**BLOOM_K, 0.02)


def test_bloom_bitmap_replica(spark, sf_dir):
    """The Spark-side bit set must equal a pure-Python md5 replica of
    the Kirsch-Mitzenmacher construction over the build keys."""
    import hashlib

    from big_data_audio_classification_spark.operators.warehouse import (
        BLOOM_K,
        BLOOM_M,
        _BLOOM_SEG,
        warehouse_bloom_filter_semijoin,
    )
    from big_data_audio_classification_spark.sources.catalog import load_table

    keys = [
        r.c_custkey
        for r in load_table(spark, sf_dir, "customer")
        .where(f"c_mktsegment = '{_BLOOM_SEG}'")
        .select("c_custkey")
        .distinct()
        .collect()
    ]
    bits = set()
    for k in keys:
        h1 = int(hashlib.md5(f"b1{k}".encode()).hexdigest()[:8], 16)
        h2 = int(hashlib.md5(f"b2{k}".encode()).hexdigest()[:8], 16)
        for i in range(BLOOM_K):
            bits.add((h1 + i * h2) % BLOOM_M)
    r = warehouse_bloom_filter_semijoin(spark, sf_dir).collect()[0]
    assert r.n_build_keys == len(keys)
    assert r.n_bits_set == len(bits)


def test_compaction_binpack_invariants(spark, sf_dir):
    """Bin packing conserves bytes, caps every bin at target + one
    file (sequential fill overshoots by at most the file that crosses
    the boundary), and never increases the file count."""
    from big_data_audio_classification_spark.operators.warehouse import (
        COMPACT_TARGET_BYTES,
        warehouse_compaction_binpack,
    )

    r = warehouse_compaction_binpack(spark, sf_dir).collect()[0]
    assert 1 <= r.n_bins <= r.n_files
    assert r.max_files_per_bin <= r.n_files
    assert 0 < r.avg_fill_ratio <= 1.0 + 1e-9
    # sequential fill: a bin holds < target before its last file, and
    # each file is itself < target here (day partitions are small), so
    # a bin can overshoot by at most one file's bytes < 2x target
    assert r.max_bin_bytes < 2 * COMPACT_TARGET_BYTES
    assert r.total_bytes <= r.n_bins * r.max_bin_bytes


def test_cdc_apply_matches_pandas_replay(spark, sf_dir):
    """The merge-outcome census must equal a pandas last-change replay,
    and the actions must partition base and change keys exactly."""
    import pandas as pd

    from big_data_audio_classification_spark.operators.warehouse import (
        CDC_DELETE_MOD,
        CDC_STALE_MOD,
        warehouse_cdc_apply,
    )

    cust = pd.read_parquet(f"{sf_dir}/customer.parquet")
    orders = pd.read_parquet(f"{sf_dir}/orders.parquet")
    base_keys = set(cust.loc[cust["c_custkey"] % CDC_STALE_MOD != 0, "c_custkey"])
    last = orders.sort_values("o_orderkey").groupby("o_custkey").last()
    rows = {r.action: r for r in warehouse_cdc_apply(spark, sf_dir).collect()}

    is_del = last.index.to_series().map(
        lambda k: last.loc[k, "o_orderkey"] % CDC_DELETE_MOD == 0
    )
    upd = sum(1 for k in last.index if k in base_keys and not is_del[k])
    ins = sum(1 for k in last.index if k not in base_keys and not is_del[k])
    dele = sum(1 for k in last.index if k in base_keys and is_del[k])
    noop = sum(1 for k in last.index if k not in base_keys and is_del[k])
    kept = len(base_keys) - upd - dele

    def n(action):
        return rows[action].n_keys if action in rows else 0

    assert n("updated") == upd
    assert n("inserted") == ins
    assert n("deleted") == dele
    assert n("kept") == kept
    assert n("delete_noop") == noop
    # actions partition base ∪ change keys; final table = kept+upd+ins
    assert kept + upd + dele == len(base_keys)
    assert upd + ins + dele + noop == len(last)
