"""Small-file compaction: lossless rewrite, file-count contraction,
and plan arithmetic."""

from __future__ import annotations

import os

import pyspark.sql.functions as F

from big_data_audio_classification_spark.sources.compaction import (
    compact_parquet,
    plan_compaction,
)
from big_data_audio_classification_spark.sources.catalog import load_table


def _parquet_files(path):
    return [
        f
        for f in os.listdir(path)
        if f.endswith(".parquet") and not f.startswith(("_", "."))
    ]


def test_compaction_merges_small_files_losslessly(spark, sf_dir, tmp_path):
    src = load_table(spark, sf_dir, "orders")
    frag_dir = str(tmp_path / "fragmented")
    # simulate a degraded table: 64 tiny appends
    src.repartition(64).write.mode("overwrite").parquet(frag_dir)
    n_before = len(_parquet_files(frag_dir))
    assert n_before >= 60

    before = src.groupBy("o_orderstatus").agg(
        F.count("*").alias("n"), F.round(F.sum("o_totalprice"), 2).alias("s")
    ).collect()

    report = compact_parquet(spark, frag_dir, target_bytes=1 << 30)
    n_after = len(_parquet_files(frag_dir))
    assert n_after == report["n_output_files"] == 1
    assert report["n_files"] == n_before
    assert report["rows"] == src.count()

    after_df = spark.read.parquet(frag_dir)
    after = after_df.groupBy("o_orderstatus").agg(
        F.count("*").alias("n"), F.round(F.sum("o_totalprice"), 2).alias("s")
    ).collect()
    assert sorted(map(tuple, after)) == sorted(map(tuple, before))
    assert not os.path.exists(frag_dir + ".__compact__")
    assert not os.path.exists(frag_dir + ".__old__")


def test_compaction_plan_respects_target_and_never_splits(spark, sf_dir, tmp_path):
    src = load_table(spark, sf_dir, "orders")
    d = str(tmp_path / "t")
    src.repartition(8).write.mode("overwrite").parquet(d)
    total = sum(
        os.path.getsize(os.path.join(d, f)) for f in _parquet_files(d)
    )
    # tiny target -> would want many files, but plan caps at current count
    plan_small = plan_compaction(d, target_bytes=1)
    assert plan_small["n_output_files"] == plan_small["n_files"] == 8
    # huge target -> single file
    assert plan_compaction(d, target_bytes=10 * total)["n_output_files"] == 1
