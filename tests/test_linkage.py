"""Entity-resolution linkage + ranking-metric invariants (round 3)."""

from __future__ import annotations

from math import comb

import pyspark.sql.functions as F

from big_data_audio_classification_spark.operators import linkage, retrieval
from big_data_audio_classification_spark.plans import introspect
from big_data_audio_classification_spark.sources.catalog import load_table


def test_er_pair_counts_match_block_combinatorics(spark, sf_dir):
    """Every within-block pair must be checked exactly once:
    sum(n_pairs) over blocks == sum C(|block|, 2)."""
    rows = linkage.er_blocked_fuzzy_parts(spark, sf_dir).collect()
    blocks = (
        load_table(spark, sf_dir, "part")
        .groupBy(
            "p_brand", F.split_part("p_name", F.lit(" "), F.lit(1)).alias("t")
        )
        .count()
        .collect()
    )
    expected = sum(comb(b["count"], 2) for b in blocks)
    assert sum(r["n_pairs"] for r in rows) == expected
    for r in rows:
        assert r["n_exact"] + r["n_near"] <= r["n_pairs"]
        assert r["n_linked"] >= r["n_exact"]  # lev=0 implies sim=1.0
        assert 0.0 <= r["avg_lev"]


def test_er_join_is_equi_not_cartesian(spark, sf_dir):
    """The blocked self-join must plan as an equi-join on the block
    key — never CartesianProduct / BroadcastNestedLoopJoin."""
    df = linkage.er_blocked_fuzzy_parts(spark, sf_dir)
    plan = introspect.formatted_plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert not introspect.has_python_udf(df)


def test_ranking_metrics_bounds(spark, sf_dir):
    row = retrieval.retrieval_ranking_metrics(spark, sf_dir).collect()[0]
    assert 0.0 <= row["p_at_k"] <= 1.0
    assert 0.0 <= row["mrr_at_k"] <= 1.0
    assert 0.0 <= row["ndcg"] <= 1.0 + 1e-9
    assert row["dcg"] <= row["idcg"] + 1e-9
    assert row["n_relevant"] <= row["n_candidates"]


def test_ranking_topk_avoids_global_sort(spark, sf_dir):
    df = retrieval.retrieval_ranking_metrics(spark, sf_dir)
    assert "TakeOrderedAndProject" in introspect.formatted_plan(df)


def test_maxsim_matches_numpy_replay(spark, sf_dir):
    """Late-interaction MaxSim: a dense numpy replay (slice -> per-token
    max dot -> sum -> top-5) must reproduce the distributed ranking."""
    import numpy as np

    em = spark.read.parquet(f"{sf_dir}/embeddings.parquet").collect()
    vecs = {
        r.vec_id: np.asarray(r.embedding, dtype=np.float64).reshape(
            retrieval._MAXSIM_TOKENS, retrieval._MAXSIM_DIM
        )
        for r in em
    }
    nq = retrieval._MAXSIM_N_QUERIES
    expected = []
    for qid in sorted(v for v in vecs if v < nq):
        scores = []
        for did in sorted(v for v in vecs if v >= nq):
            dots = vecs[qid] @ vecs[did].T  # (q_tok, d_tok)
            scores.append((round(float(dots.max(axis=1).sum()), 6), did))
        scores.sort(key=lambda t: (-t[0], t[1]))
        for rank, (score, did) in enumerate(scores[: retrieval._MAXSIM_TOPK], 1):
            expected.append((qid, did, score, rank))

    got = [
        (r.query_id, r.doc_id, r.score, r.rank)
        for r in retrieval.retrieval_maxsim_late_interaction(spark, sf_dir).collect()
    ]
    assert got == expected


def test_golden_record_matches_pandas_survivorship(spark, sf_dir):
    """Survivor fields must equal a pandas replay of the merge rules,
    and singleton clusters must be excluded."""
    import pandas as pd

    from big_data_audio_classification_spark.operators.linkage import (
        er_golden_record,
    )

    p = pd.read_parquet(f"{sf_dir}/part.parquet")
    rows = {
        (r.p_brand, r.p_name): r for r in er_golden_record(spark, sf_dir).collect()
    }
    for (brand, name), g in p.groupby(["p_brand", "p_name"]):
        if len(g) <= 1:
            assert (brand, name) not in rows
            continue
        r = rows.pop((brand, name))
        assert r.master_id == g["p_partkey"].min()
        assert r.n_records == len(g)
        votes = g.groupby("p_type").size()
        top = max(votes.items(), key=lambda kv: (kv[1], kv[0]))[0]
        assert r.survived_type == top
        assert r.survived_size == g["p_size"].max()
        assert abs(r.survived_price - round(g["p_retailprice"].max(), 2)) < 1e-9
        assert r.had_conflict == (
            g["p_type"].nunique() > 1 or g["p_size"].nunique() > 1
        )
    assert not rows
