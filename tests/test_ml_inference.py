"""Lifecycle + layout operator tests (R20, R29, R34, R38–R42)."""

from __future__ import annotations

import pyspark.sql.functions as F

from big_data_audio_classification_spark.operators import ml_inference
from big_data_audio_classification_spark.sources.catalog import load_table


def test_transpose_roundtrip_identity(spark, sf_dir):
    """long→wide transpose reproduces the original wide values."""
    out = ml_inference.ml_transpose_long_wide(spark, sf_dir)
    em = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 200)
    direct = em.select(
        "vec_id",
        *[
            F.round(F.element_at(F.col("embedding").cast("array<double>"), i + 1), 6).alias(f"x{i}")
            for i in range(ml_inference.N_DIMS)
        ],
    )
    assert out.count() == direct.count()
    assert out.exceptAll(direct).count() == 0


def test_permutation_deterministic_and_content_preserving(spark, sf_dir):
    a = ml_inference.ml_shuffle_permutation(spark, sf_dir).collect()
    b = ml_inference.ml_shuffle_permutation(spark, sf_dir).collect()
    assert a == b  # same seed → same permutation
    em_n = load_table(spark, sf_dir, "embeddings").count()
    assert len(a) == em_n
    assert len({r.vec_id for r in a}) == em_n  # a true permutation


def test_rowid_join_alignment(spark, sf_dir):
    """Row-id alignment matches the direct (same-row) pairing."""
    out = ml_inference.ml_rowid_positional_join(spark, sf_dir)
    em = load_table(spark, sf_dir, "embeddings")
    assert out.count() == em.count()
    direct = em.select(
        F.round(F.element_at(F.col("embedding").cast("array<double>"), 1), 6).alias("x"),
        "label",
    )
    assert out.select("x", "label").exceptAll(direct).count() == 0


def test_pipeline_save_load_invariants(spark, sf_dir):
    out = ml_inference.ml_pipeline_save_load(spark, sf_dir)
    rows = out.collect()
    assert len(rows) > 0
    p_cols = [c for c in out.columns if c.startswith("p_")]
    n_classes = (
        load_table(spark, sf_dir, "embeddings").select("label").distinct().count()
    )
    assert len(p_cols) == n_classes
    k = len(p_cols)
    for r in rows[:100]:
        probs = [r[c] for c in p_cols]
        assert abs(sum(probs) - 1.0) < 1e-2  # rounded to 4 decimals
        # decoded prediction is the argmax class
        best = p_cols[max(range(k), key=lambda i: probs[i])].removeprefix("p_")
        if max(probs) - sorted(probs)[-2] > 1e-3:  # skip near-ties
            assert r.pred_class == best
