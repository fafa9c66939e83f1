"""Product-quantization ANN invariants.

The PQ codebook is data-derived (subvectors of the first ``PQ_K``
corpus vectors), so the whole encode → ADC → top-k pipeline is
deterministic and can be differentially tested against an independent
single-node numpy implementation — same spirit as the audio mel-frame
parity tests (numpy ground truth vs the distributed plan).
"""

from __future__ import annotations

import numpy as np

from big_data_audio_classification_spark.operators import similarity
from big_data_audio_classification_spark.sources.catalog import load_table


def _numpy_pq_topk(vecs: dict[int, np.ndarray]) -> dict[int, list[tuple]]:
    M, S, K = similarity.PQ_M, similarity.PQ_SUB, similarity.PQ_K
    ids = sorted(vecs)
    cb = {(m, c): vecs[c][m * S : (m + 1) * S] for m in range(M) for c in range(K)}
    # encode: nearest codeword per (vector, subspace), ties -> lowest code
    codes = {}
    for v in ids:
        for m in range(M):
            sub = vecs[v][m * S : (m + 1) * S]
            d2 = [(float(np.sum((sub - cb[(m, c)]) ** 2)), c) for c in range(K)]
            codes[(v, m)] = min(d2)[1]
    out = {}
    for q in range(similarity.N_QUERIES):
        lut = {
            (m, c): float(np.sum((vecs[q][m * S : (m + 1) * S] - cb[(m, c)]) ** 2))
            for m in range(M)
            for c in range(K)
        }
        scored = [
            (round(sum(lut[(m, codes[(n, m)])] for m in range(M)), 6), n)
            for n in ids
            if n != q
        ]
        out[q] = sorted(scored)[: similarity.TOP_K]
    return out


def test_pq_matches_numpy_reference(spark, sf_dir):
    em = load_table(spark, sf_dir, "embeddings").collect()
    vecs = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64) for r in em}
    expected = _numpy_pq_topk(vecs)
    got = {}
    for r in similarity.sim_pq_adc_topk(spark, sf_dir).collect():
        got.setdefault(r["query_id"], []).append((r["adc_d2"], r["neighbor_id"]))
    assert set(got) == set(expected)
    for q in expected:
        got_q = sorted(got[q])
        for (ed, en), (gd, gn) in zip(expected[q], got_q):
            assert en == gn, f"query {q}: neighbor {gn} != expected {en}"
            assert abs(ed - gd) < 1e-6, f"query {q}: adc {gd} != {ed}"


def test_pq_topk_is_k_rows_per_query(spark, sf_dir):
    df = similarity.sim_pq_adc_topk(spark, sf_dir)
    counts = df.groupBy("query_id").count().collect()
    assert len(counts) == similarity.N_QUERIES
    assert all(c["count"] == similarity.TOP_K for c in counts)


def test_ivf_recall_floor(spark, sf_dir):
    """ANN quality gate: IVF probe search must retain most of the exact
    brute-force top-k at the demo nprobe/cell settings. Observed recall
    at sf0.001 is 0.8-1.0 per query (mean 0.9); the floor leaves jitter
    room without letting a broken probe path (recall ~k/cells) pass."""
    rows = similarity.sim_ivf_recall_at_k(spark, sf_dir).collect()
    assert len(rows) == similarity.N_QUERIES
    recalls = {r.query_id: r.recall_at_k for r in rows}
    assert all(v >= 0.6 for v in recalls.values()), recalls
    assert sum(recalls.values()) / len(recalls) >= 0.8, recalls
    assert all(r.n_exact == similarity.TOP_K for r in rows)


def test_matryoshka_prefix_recall_floor(spark, sf_dir):
    """The 16-dim prefix ranking must retain a meaningful fraction of
    the full-vector top-10 (floor 0.2 — random overlap for k=10 of
    ~500 would be ~0.02), and counters must be consistent."""
    from big_data_audio_classification_spark.operators.similarity import (
        sim_matryoshka_prefix_eval,
    )

    rows = sim_matryoshka_prefix_eval(spark, sf_dir).collect()
    assert rows
    total_hit = total = 0
    for r in rows:
        assert 0 <= r.n_hit <= r.n_exact
        total_hit += r.n_hit
        total += r.n_exact
    assert total_hit / total >= 0.2


def test_knn_classifier_matches_numpy_replay(spark, sf_dir):
    """k-NN majority vote must match a dense numpy replay including the
    smallest-label tie resolution."""
    from collections import Counter

    import numpy as np
    import pyarrow.parquet as pq

    from big_data_audio_classification_spark.operators.similarity import (
        _KNN_K,
        _KNN_QUERIES,
        ml_knn_classifier_eval,
    )

    tbl = pq.read_table(f"{sf_dir}/embeddings.parquet")
    ids = np.array(tbl.column("vec_id").to_pylist())
    X = np.array(tbl.column("embedding").to_pylist(), dtype=np.float64)
    y = np.array(tbl.column("label").to_pylist())
    qm, cm = ids < _KNN_QUERIES, ids >= _KNN_QUERIES
    Xq, Xc = X[qm], X[cm]
    yq, yc = y[qm], y[cm]
    cid = ids[cm]
    sims = (Xq / np.linalg.norm(Xq, axis=1, keepdims=True)) @ (
        Xc / np.linalg.norm(Xc, axis=1, keepdims=True)
    ).T
    correct = 0
    for i in range(len(Xq)):
        order = sorted(zip(-np.round(sims[i], 6), cid, yc))[:_KNN_K]
        votes = Counter(lbl for _, _, lbl in order)
        vmax = max(votes.values())
        pred = min(l for l, v in votes.items() if v == vmax)
        correct += int(pred == yq[i])

    row = ml_knn_classifier_eval(spark, sf_dir).collect()[0]
    assert row.n_queries == len(Xq)
    assert row.n_correct == correct
    assert row.accuracy == round(correct / len(Xq), 4)


def test_kcenter_seeds_match_numpy_greedy(spark, sf_dir):
    """Seed sequence must equal the numpy greedy farthest-point
    replay, and the coverage radius must be non-increasing."""
    import numpy as np
    import pandas as pd

    from big_data_audio_classification_spark.operators.similarity import (
        KCENTER_K,
        sim_kcenter_seeds,
    )

    pdf = pd.read_parquet(f"{sf_dir}/embeddings.parquet").sort_values("vec_id")
    X = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
    ids = pdf["vec_id"].to_numpy()

    seeds = [0]
    mind = np.round(((X - X[0]) ** 2).sum(axis=1), 6)
    seps = [0.0]
    for _ in range(1, KCENTER_K):
        # argmax with vec_id tiebreak = first occurrence of the max
        j = int(np.argmax(mind))
        seeds.append(j)
        seps.append(float(mind[j]))
        mind = np.minimum(mind, np.round(((X - X[j]) ** 2).sum(axis=1), 6))

    rows = sim_kcenter_seeds(spark, sf_dir).collect()
    assert [r.vec_id for r in rows] == [int(ids[j]) for j in seeds]
    for r, sep in zip(rows, seps):
        assert abs(r.sep - round(sep, 6)) < 1e-9
    radii = [r.sep for r in rows[1:]]
    assert radii == sorted(radii, reverse=True)
