"""PageRank parity: the distributed iteration must match a numpy
power-iteration replica built from the same k-NN edge list."""

from __future__ import annotations

import numpy as np
import pytest

from big_data_audio_classification_spark.operators import graph


@pytest.fixture(scope="module")
def pagerank_rows(spark, sf_dir):
    """graph_pagerank_knn is the suite's single most expensive replay
    (PR_ITERS distributed rounds); collect it ONCE for the two tests
    that read it instead of re-running the whole iteration per test."""
    return graph.graph_pagerank_knn(spark, sf_dir).collect()


def _numpy_pagerank(edges, n_nodes, ids):
    idx = {v: i for i, v in enumerate(ids)}
    r = np.full(n_nodes, 1.0 / n_nodes)
    for _ in range(graph.PR_ITERS):
        contrib = np.zeros(n_nodes)
        for s, d in edges:
            contrib[idx[d]] += r[idx[s]] / graph.KNN_K
        r = (1.0 - graph.PR_DAMPING) / n_nodes + graph.PR_DAMPING * contrib
    return {v: r[idx[v]] for v in ids}


def test_pagerank_matches_numpy_power_iteration(spark, sf_dir, pagerank_rows):
    edges = [(r["src"], r["dst"]) for r in graph.knn_edges(spark, sf_dir).collect()]
    ids = sorted({s for s, _ in edges})
    expected = _numpy_pagerank(edges, len(ids), ids)
    got = {r["vec_id"]: r["pagerank"] for r in pagerank_rows}
    assert set(got) == set(expected)
    for v in expected:
        assert abs(got[v] - expected[v]) < 1e-6, f"node {v}"


def test_pagerank_is_a_distribution_over_reachable_mass(pagerank_rows):
    rows = pagerank_rows
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


def test_degree_assortativity_matches_python_replay(spark, sf_dir):
    """Assortativity must equal a pure-Python replay over the same
    deterministic k-NN edge list."""
    import math

    import numpy as np
    import pyarrow.parquet as pq

    from big_data_audio_classification_spark.operators.graph import (
        KNN_K,
        graph_degree_assortativity,
    )

    tbl = pq.read_table(f"{sf_dir}/embeddings.parquet")
    ids = np.array(tbl.column("vec_id").to_pylist())
    X = np.array(tbl.column("embedding").to_pylist(), dtype=np.float64)
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    sims = np.round(Xn @ Xn.T, 6)
    edges = []
    order = np.argsort(ids)
    ids, sims = ids[order], sims[np.ix_(order, order)]
    for i, src in enumerate(ids):
        cand = sorted(
            (( -sims[i, j], ids[j]) for j in range(len(ids)) if j != i)
        )[:KNN_K]
        edges.extend((src, dst) for _, dst in cand)
    indeg = {}
    for _, dst in edges:
        indeg[dst] = indeg.get(dst, 0) + 1
    xs = np.array([indeg.get(s, 0) for s, _ in edges], dtype=np.int64)
    ys = np.array([indeg.get(d, 0) for _, d in edges], dtype=np.int64)
    n = len(edges)
    num = n * (xs * ys).sum() - xs.sum() * ys.sum()
    den = math.sqrt(n * (xs * xs).sum() - xs.sum() ** 2) * math.sqrt(
        n * (ys * ys).sum() - ys.sum() ** 2
    )
    expected = round(num / den, 6)

    row = graph_degree_assortativity(spark, sf_dir).collect()[0]
    assert row.n_edges == n
    assert row.n_nodes == len(ids)
    assert abs(row.assortativity - expected) < 2e-6


def test_adamic_adar_matches_networkx_free_replay(spark, sf_dir):
    """Top-10 AA pairs must equal a pure-python common-neighbor
    replay, and no predicted pair may be an existing edge."""
    import math

    import pandas as pd

    from big_data_audio_classification_spark.operators.graph import (
        AA_TOPK,
        TRI_NODES,
        graph_adamic_adar,
    )

    ev = pd.read_parquet(f"{sf_dir}/events.parquet")["event_id"]
    edges = set()
    for eid in ev:
        u, v = eid % TRI_NODES, (eid * 7 + 3) % TRI_NODES
        if u != v:
            edges.add((min(u, v), max(u, v)))
    nbrs = {}
    for u, v in edges:
        nbrs.setdefault(u, set()).add(v)
        nbrs.setdefault(v, set()).add(u)

    scores = {}
    nodes = sorted(nbrs)
    for i, u in enumerate(nodes):
        for w in nodes[i + 1:]:
            if (u, w) in edges:
                continue
            common = nbrs[u] & nbrs[w]
            if common:
                scores[(u, w)] = (
                    round(sum(1 / math.log(len(nbrs[z])) for z in common), 6),
                    len(common),
                )
    top = sorted(scores.items(), key=lambda kv: (-kv[1][0], kv[0]))[:AA_TOPK]

    rows = graph_adamic_adar(spark, sf_dir).collect()
    assert len(rows) == len(top)
    for r, ((u, w), (s, nc)) in zip(rows, top):
        assert (r.u, r.w) == (u, w)
        assert (r.u, r.w) not in edges
        assert r.n_common == nc
        assert abs(r.aa_score - s) < 1e-6


def test_mutual_knn_matches_numpy_replay(spark, sf_dir):
    """Mutuality and label-agreement must equal a numpy exact-kNN
    replay, and mutual agreement must beat the random-pair base rate."""
    import numpy as np
    import pandas as pd

    from big_data_audio_classification_spark.operators.graph import (
        KNN_K,
        sim_mutual_knn,
    )

    pdf = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    X = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
    ids = pdf["vec_id"].to_numpy()
    labels = dict(zip(pdf["vec_id"], pdf["label"]))
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    S = np.round(Xn @ Xn.T, 6)
    np.fill_diagonal(S, -np.inf)

    edges = set()
    for i in range(len(ids)):
        order = sorted(range(len(ids)), key=lambda j: (-S[i, j], ids[j]))
        for j in order[:KNN_K]:
            edges.add((ids[i], ids[j]))
    mutual = {(u, v) for (u, v) in edges if (v, u) in edges and u < v}
    same = sum(1 for (u, v) in mutual if labels[u] == labels[v])

    r = sim_mutual_knn(spark, sf_dir).collect()[0]
    assert r.n_edges == len(edges)
    assert r.n_mutual_pairs == len(mutual)
    assert r.same_label_pairs == same
    # structural invariants: each mutual pair consumes 2 of the k·n
    # directed edges, so the rate is a proper fraction
    assert 0 < r.mutual_rate <= 1
    assert abs(r.mutual_rate - 2 * len(mutual) / len(edges)) < 1e-6


def test_kcore_matches_python_peeling_and_converged(spark, sf_dir):
    """The surviving core must equal an exhaustive python peel run to
    TRUE fixpoint (proving the round budget suffices), every core
    degree must be >= k, and the core must be maximal."""
    import hashlib

    from big_data_audio_classification_spark.operators.graph import (
        KCORE_EVENTS,
        KCORE_K,
        KCORE_NODES,
        graph_kcore,
    )

    def h(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:8], 16) % KCORE_NODES

    edges = set()
    for e in range(KCORE_EVENTS):
        u, v = h(f"{e}u"), h(f"{e}v")
        if u != v:
            edges.add((min(u, v), max(u, v)))
    while True:  # peel to true fixpoint, no round budget
        deg = {}
        for u, v in edges:
            deg[u] = deg.get(u, 0) + 1
            deg[v] = deg.get(v, 0) + 1
        bad = {n for n, d in deg.items() if d < KCORE_K}
        if not bad:
            break
        edges = {(u, v) for u, v in edges if u not in bad and v not in bad}

    rows = graph_kcore(spark, sf_dir).collect()
    assert {r.node: r.core_degree for r in rows} == deg
    assert all(r.core_degree >= KCORE_K for r in rows)
