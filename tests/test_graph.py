"""PageRank parity: the distributed iteration must match a numpy
power-iteration replica built from the same k-NN edge list."""

from __future__ import annotations

import numpy as np

from big_data_audio_classification_spark.operators import graph


def _numpy_pagerank(edges, n_nodes, ids):
    idx = {v: i for i, v in enumerate(ids)}
    r = np.full(n_nodes, 1.0 / n_nodes)
    for _ in range(graph.PR_ITERS):
        contrib = np.zeros(n_nodes)
        for s, d in edges:
            contrib[idx[d]] += r[idx[s]] / graph.KNN_K
        r = (1.0 - graph.PR_DAMPING) / n_nodes + graph.PR_DAMPING * contrib
    return {v: r[idx[v]] for v in ids}


def test_pagerank_matches_numpy_power_iteration(spark, sf_dir):
    edges = [(r["src"], r["dst"]) for r in graph.knn_edges(spark, sf_dir).collect()]
    ids = sorted({s for s, _ in edges})
    expected = _numpy_pagerank(edges, len(ids), ids)
    got = {
        r["vec_id"]: r["pagerank"]
        for r in graph.graph_pagerank_knn(spark, sf_dir).collect()
    }
    assert set(got) == set(expected)
    for v in expected:
        assert abs(got[v] - expected[v]) < 1e-6, f"node {v}"


def test_pagerank_is_a_distribution_over_reachable_mass(spark, sf_dir):
    rows = graph.graph_pagerank_knn(spark, sf_dir).collect()
    total = sum(r["pagerank"] for r in rows)
    # no dangling nodes -> total mass stays 1 (up to rounding)
    assert abs(total - 1.0) < 1e-4
    assert all(r["pagerank"] > 0 for r in rows)


def test_knn_edges_uniform_outdegree(spark, sf_dir):
    deg = (
        graph.knn_edges(spark, sf_dir)
        .groupBy("src")
        .count()
        .select("count")
        .distinct()
        .collect()
    )
    assert [r["count"] for r in deg] == [graph.KNN_K]
