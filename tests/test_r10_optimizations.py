"""Focused equivalence pins for the r10 optimization-round rewrites.

Each optimization changed an operator's INTERNALS while the oracle gate
pinned its OUTPUT; these tests additionally pin the internal
equivalence arguments themselves (see OPTIMIZATION_r10.md), so a future
refactor that breaks the argument fails here even before the
cross-engine gate runs.
"""

from __future__ import annotations

import math

import pyspark.sql.functions as F
import pytest


def test_percentiles_twophase_matches_numpy_quantile_cont(spark, sf_dir):
    """The 1-join + conditional-agg assembly (r10) must still produce
    exact QUANTILE_CONT(0.5/0.9) semantics — numpy's linear
    interpolation on the raw column is the independent reference."""
    import numpy as np

    from big_data_audio_classification_spark.operators.aggregates import (
        agg_percentiles_twophase,
    )
    from big_data_audio_classification_spark.sources.catalog import load_table

    out = {
        r["l_linestatus"]: (r["p50_price"], r["p90_price"])
        for r in agg_percentiles_twophase(spark, sf_dir).collect()
    }
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_linestatus", "l_extendedprice"
    ).collect()
    by_g: dict[str, list[float]] = {}
    for r in li:
        by_g.setdefault(r["l_linestatus"], []).append(r["l_extendedprice"])
    assert set(out) == set(by_g)
    for g, vals in by_g.items():
        p50 = float(np.percentile(np.array(vals), 50, method="linear"))
        p90 = float(np.percentile(np.array(vals), 90, method="linear"))
        assert out[g][0] == pytest.approx(round(p50, 4), abs=1e-9), g
        assert out[g][1] == pytest.approx(round(p90, 4), abs=1e-9), g


def test_conformal_qhat_takeordered_equals_rank_k(spark):
    """min of the (n-k+1) LARGEST == the k-th SMALLEST (value-at-rank
    is tie-invariant) — the r10 rewrite's core claim, checked on a
    frame with heavy ties."""
    import random

    rnd = random.Random(7)
    vals = [round(rnd.uniform(0, 10), 1) for _ in range(500)]  # many ties
    df = spark.createDataFrame([(v,) for v in vals], "r double")
    n = len(vals)
    for alpha in (0.1, 0.25):
        k = int(math.ceil((n + 1) * (1.0 - alpha)))
        got = (
            df.orderBy(F.col("r").desc())
            .limit(n - k + 1)
            .agg(F.min("r"))
            .first()[0]
        )
        assert got == sorted(vals)[k - 1]


def test_gbt_grid_regroup_equals_per_row_histograms(spark, sf_dir):
    """The one-scan (qb, db) grid (r10) must regroup to the identical
    per-feature integer histograms the 4-scan union produced."""
    from big_data_audio_classification_spark.sources.catalog import load_table

    li = load_table(spark, sf_dir, "lineitem")
    base = li.select(
        F.round(F.col("l_extendedprice") * 100).cast("bigint").alias("y"),
        F.col("l_quantity").cast("bigint").alias("qb"),
        F.round(F.col("l_discount") * 100).cast("bigint").alias("db"),
    )
    direct = {
        (r["f"], r["bin"]): (r["n"], r["s"])
        for r in base.select(F.lit("qty").alias("f"), F.col("qb").alias("bin"), "y")
        .unionAll(base.select(F.lit("disc").alias("f"), F.col("db").alias("bin"), "y"))
        .groupBy("f", "bin")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("y").alias("s"))
        .collect()
    }
    grid = base.groupBy("qb", "db").agg(
        F.count(F.lit(1)).alias("gn"), F.sum("y").alias("gs")
    )
    regrouped = {
        (r["f"], r["bin"]): (r["n"], r["s"])
        for r in grid.select(F.lit("qty").alias("f"), F.col("qb").alias("bin"), "gn", "gs")
        .unionAll(grid.select(F.lit("disc").alias("f"), F.col("db").alias("bin"), "gn", "gs"))
        .groupBy("f", "bin")
        .agg(F.sum("gn").alias("n"), F.sum("gs").alias("s"))
        .collect()
    }
    assert direct == regrouped


def test_cc_bounded_drop_of_least_join_is_identity(spark, sf_dir):
    """r10 removed the per-round LEFT JOIN + LEAST because a doc's own
    bucket bounds its proposal: re-run one propagation round BOTH ways
    on the real band table and require identical labels."""
    from big_data_audio_classification_spark.operators.dedup import (
        _lsh_band_table,
    )
    from big_data_audio_classification_spark.sources.catalog import load_table

    bands = _lsh_band_table(load_table(spark, sf_dir, "documents")).localCheckpoint(
        eager=True
    )
    reps = bands.select("doc_id").distinct().select(
        "doc_id", F.col("doc_id").alias("rep")
    )
    bucket_rep = (
        bands.join(reps, "doc_id")
        .groupBy("band_id", "band_hash")
        .agg(F.min("rep").alias("b_rep"))
    )
    proposed = (
        bands.join(bucket_rep, ["band_id", "band_hash"])
        .groupBy("doc_id")
        .agg(F.min("b_rep").alias("p_rep"))
    )
    with_join = {
        r["doc_id"]: r["rep"]
        for r in reps.join(proposed, "doc_id", "left")
        .select(
            "doc_id",
            F.least(F.col("rep"), F.coalesce("p_rep", F.col("rep"))).alias("rep"),
        )
        .collect()
    }
    without = {r["doc_id"]: r["p_rep"] for r in proposed.collect()}
    assert with_join == without


def test_jaccard_array_intersect_equals_token_join(spark, sf_dir):
    """|array_intersect(distinct tokens)| must equal the exploded
    token-join intersection count for every sampled candidate pair —
    the r10 verify rewrite's core claim."""
    from big_data_audio_classification_spark.operators.dedup import (
        MHEST_SAMPLE_MOD,
        tokens_col,
    )
    from big_data_audio_classification_spark.sources.catalog import load_table

    d = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") % MHEST_SAMPLE_MOD == 0
    )
    tok = d.select(
        "doc_id", F.explode(tokens_col(F.col("text"))).alias("tok")
    ).distinct()
    ta = tok.select(F.col("doc_id").alias("id_a"), "tok")
    tb = tok.select(F.col("doc_id").alias("id_b"), "tok")
    joined = {
        (r["id_a"], r["id_b"]): r["ci"]
        for r in ta.join(tb, "tok")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("ci"))
        .collect()
    }
    arr = d.select(
        "doc_id", F.array_sort(F.array_distinct(tokens_col(F.col("text")))).alias("a")
    )
    aa = arr.select(F.col("doc_id").alias("id_a"), F.col("a").alias("arr_a"))
    bb = arr.select(F.col("doc_id").alias("id_b"), F.col("a").alias("arr_b"))
    via_arrays = {
        (r["id_a"], r["id_b"]): r["ci"]
        for r in aa.crossJoin(bb)
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a", "id_b",
            F.size(F.array_intersect("arr_a", "arr_b")).alias("ci"),
        )
        .filter(F.col("ci") >= 1)
        .collect()
    }
    assert joined == via_arrays
