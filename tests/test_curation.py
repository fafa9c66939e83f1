"""Semantics tests for the corpus-curation operators: packing greedy
invariants, sampling determinism, resampling keep-rule, SemDeDup
cluster/keep coherence."""

from __future__ import annotations

import pyspark.sql.functions as F

from big_data_audio_classification_spark.operators import curation, similarity
from big_data_audio_classification_spark.sources.catalog import load_table


def test_pack_sequences_greedy_invariants(spark, sf_dir):
    out = curation.curation_pack_sequences(spark, sf_dir).collect()
    n_docs = load_table(spark, sf_dir, "documents").count()
    assert len(out) == n_docs  # every doc packed exactly once

    by_group: dict[tuple, list] = {}
    for r in out:
        by_group.setdefault((r.source, r.pack_id), []).append(r)
    for (source, pack_id), rows in by_group.items():
        total = sum(r.n_tokens for r in rows)
        # budget respected unless the pack is a single over-budget doc
        assert total <= curation.PACK_BUDGET or len(rows) == 1

    # packs are contiguous in doc_id order and greedy: the first doc of
    # pack p+1 would have overflowed pack p
    by_source: dict[str, list] = {}
    for r in out:
        by_source.setdefault(r.source, []).append(r)
    for source, rows in by_source.items():
        rows.sort(key=lambda r: r.doc_id)
        pack_ids = [r.pack_id for r in rows]
        assert pack_ids == sorted(pack_ids)  # non-decreasing along doc_id
        assert pack_ids[0] == 0
        assert set(pack_ids) == set(range(max(pack_ids) + 1))  # no gaps
        cur = 0
        for r in rows:
            if r.pack_id > 0 and cur > 0 and r.doc_id == min(
                x.doc_id for x in rows if x.pack_id == r.pack_id
            ):
                prev_total = sum(
                    x.n_tokens for x in rows if x.pack_id == r.pack_id - 1
                )
                assert prev_total + r.n_tokens > curation.PACK_BUDGET


def test_pack_sequences_deterministic(spark, sf_dir):
    a = sorted(map(tuple, curation.curation_pack_sequences(spark, sf_dir).collect()))
    b = sorted(map(tuple, curation.curation_pack_sequences(spark, sf_dir).collect()))
    assert a == b


def test_sample_per_source_size_and_determinism(spark, sf_dir):
    out = curation.curation_sample_per_source(spark, sf_dir)
    sizes = {r.source: r.n for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()}
    totals = {
        r.source: r.n
        for r in load_table(spark, sf_dir, "documents")
        .groupBy("source")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    for source, n in sizes.items():
        assert n == min(curation.SAMPLE_K, totals[source])
    again = sorted(map(tuple, curation.curation_sample_per_source(spark, sf_dir).collect()))
    assert sorted(map(tuple, out.collect())) == again


def test_importance_resample_bounds(spark, sf_dir):
    out = curation.curation_importance_resample(spark, sf_dir).collect()
    assert len(out) > 0
    for r in out:
        assert 0 <= r.n_kept <= r.n_docs
        if r.n_kept > 0:
            assert 0.0 <= r.avg_quality_kept <= 1.0 + 1e-9


def test_semdedup_keeps_cluster_minimum(spark, sf_dir):
    """Every cluster's lowest vec_id is always kept (it has no lower-id
    mate), and at least one vector per cluster survives."""
    out = similarity.sim_semdedup(spark, sf_dir).collect()
    by_cell: dict[int, list] = {}
    for r in out:
        by_cell.setdefault(r.cell_id, []).append(r)
    for cell, rows in by_cell.items():
        lowest = min(rows, key=lambda r: r.vec_id)
        assert lowest.kept
        assert any(r.kept for r in rows)


def test_token_budget_two_phase_equals_global_window(spark, sf_dir):
    """The bin-parallel two-phase selection must keep exactly the same
    documents as the naive single-partition global running sum."""
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    from big_data_audio_classification_spark.operators import curation

    df = curation.curation_token_budget_select(spark, sf_dir)
    got = {(r["doc_id"], r["cum_tokens"]) for r in df.collect()}

    # recompute the keep-set with the naive global running-sum window
    # over the same quality scores and compare.
    from big_data_audio_classification_spark.operators.dedup import tokens_col
    from big_data_audio_classification_spark.operators.text import (
        STOPWORDS,
        _count_in,
    )
    from big_data_audio_classification_spark.sources.catalog import load_table

    d = load_table(spark, sf_dir, "documents")
    toks = tokens_col(F.col("text"))
    base = d.select("doc_id", toks.alias("toks")).filter(F.size("toks") > 0)
    n_tokens = F.size("toks").cast("double")
    n_stop = _count_in(F.col("toks"), STOPWORDS).cast("double")
    ttr = F.size(F.array_distinct("toks")).cast("double") / n_tokens
    quality = F.round(
        F.least(n_tokens / 64, F.lit(1.0)) * 0.4
        + F.least(n_stop / n_tokens * 5, F.lit(1.0)) * 0.3
        + ttr * 0.3,
        6,
    )
    w = Window.orderBy(F.col("quality").desc(), "doc_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    naive = (
        base.select("doc_id", F.size("toks").alias("n_tokens"), quality.alias("quality"))
        .select("doc_id", F.sum("n_tokens").over(w).alias("cum_tokens"))
        .filter(F.col("cum_tokens") <= curation.TOKEN_BUDGET)
    )
    want = {(r["doc_id"], r["cum_tokens"]) for r in naive.collect()}
    assert got == want


def test_token_weighted_median_splits_token_mass(spark, sf_dir):
    """At the reported threshold, docs scoring <= q* must hold >= half
    the source's tokens, and docs scoring < q* strictly less — the
    defining property of a weighted median."""
    import pyspark.sql.functions as F

    from big_data_audio_classification_spark.operators import curation, text
    from big_data_audio_classification_spark.operators.dedup import tokens_col
    from big_data_audio_classification_spark.sources.catalog import load_table

    got = {
        r["source"]: r
        for r in curation.curation_token_weighted_median(spark, sf_dir).collect()
    }
    d = load_table(spark, sf_dir, "documents")
    toks = tokens_col(F.col("text"))
    n_tokens = F.size("toks").cast("double")
    n_stop = text._count_in(F.col("toks"), text.STOPWORDS).cast("double")
    ttr = F.size(F.array_distinct("toks")).cast("double") / n_tokens
    q = F.round(
        F.least(n_tokens / 64, F.lit(1.0)) * 0.4
        + F.least(n_stop / n_tokens * 5, F.lit(1.0)) * 0.3
        + ttr * 0.3,
        6,
    )
    rows = (
        d.select("source", toks.alias("toks"))
        .filter(F.size("toks") > 0)
        .select("source", F.size("toks").cast("long").alias("w"), q.alias("q"))
        .collect()
    )
    by_src: dict[str, list] = {}
    for r in rows:
        by_src.setdefault(r["source"], []).append((r["q"], r["w"]))
    for src, pairs in by_src.items():
        tot = sum(w for _, w in pairs)
        qstar = got[src]["wmedian_quality"]
        at_or_below = sum(w for qq, w in pairs if qq <= qstar)
        strictly_below = sum(w for qq, w in pairs if qq < qstar)
        assert at_or_below >= tot / 2.0
        assert strictly_below < tot / 2.0
        assert got[src]["total_tokens"] == tot


def test_lsh_recall_gate_floor(spark, sf_dir):
    """The banded-MinHash generator must surface >= 85% of true
    Jaccard>=0.9 pairs on the audit sample (theory predicts ~0.95+ for
    the J>=0.9 mixture at b=4, r=4), and the counters must be
    internally consistent."""
    from big_data_audio_classification_spark.operators.dedup import dedup_lsh_recall

    row = dedup_lsh_recall(spark, sf_dir).collect()[0]
    assert row.n_truth > 0
    assert row.n_hit <= row.n_truth
    assert row.n_hit <= row.n_candidates
    assert row.recall >= 0.85


def test_feature_hashing_matches_python_replay(spark, sf_dir):
    """Signed feature hashing must match a pure-Python md5 replay for
    every (doc, bucket) cell."""
    import hashlib

    import pyarrow.parquet as pq

    from big_data_audio_classification_spark.operators.ml import (
        _FH_DIM,
        ml_feature_hashing,
    )

    tbl = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    expected = {}
    for did, text in zip(
        tbl.column("doc_id").to_pylist(), tbl.column("text").to_pylist()
    ):
        for tok in (t for t in text.split(" ") if t):
            hv = int(hashlib.md5(tok.encode()).hexdigest()[:8], 16)
            key = (did, hv % _FH_DIM)
            expected[key] = expected.get(key, 0) + (
                1 if (hv // _FH_DIM) % 2 == 0 else -1
            )

    got = {
        (r.doc_id, r.bucket): r.fval
        for r in ml_feature_hashing(spark, sf_dir).collect()
    }
    assert got == expected


def test_curriculum_head_is_easy_first_and_deterministic(spark, sf_dir):
    """The certified curriculum head: bins non-decreasing, starts at
    bin 0, md5-ordered within bin, and stable across invocations."""
    from big_data_audio_classification_spark.operators.curation import (
        _CURR_HEAD,
        curation_curriculum_order,
    )

    rows = curation_curriculum_order(spark, sf_dir).collect()
    assert len(rows) == _CURR_HEAD
    assert [r.sample_order for r in rows] == list(range(1, _CURR_HEAD + 1))
    bins = [r.bin for r in rows]
    assert bins == sorted(bins)
    assert bins[0] == 0
    again = curation_curriculum_order(spark, sf_dir).collect()
    assert [r.doc_id for r in rows] == [r.doc_id for r in again]


def test_cdc_chunks_match_python_replay(spark, sf_dir):
    """Content-defined chunking must match a pure-Python rolling-hash
    replay: same chunk population, dedup ratio, and mean size."""
    import hashlib

    import pyarrow.parquet as pq

    from big_data_audio_classification_spark.operators.dedup import (
        _CDC_DIV,
        _CDC_W,
        dedup_cdc_chunks,
    )

    tbl = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    digs, total, lens = set(), 0, 0
    ndocs = 0
    for text in tbl.column("text").to_pylist():
        if not text:
            continue
        ndocs += 1
        L = len(text)
        cuts = sorted(
            {
                i + _CDC_W - 1
                for i in range(1, L - _CDC_W + 2)
                if int(
                    hashlib.md5(text[i - 1 : i - 1 + _CDC_W].encode()).hexdigest()[:8],
                    16,
                )
                % _CDC_DIV
                == 0
            }
            | {L}
        )
        s = 1
        for e in cuts:
            chunk = text[s - 1 : e]
            digs.add(hashlib.md5(chunk.encode()).hexdigest())
            total += 1
            lens += len(chunk)
            s = e + 1

    row = dedup_cdc_chunks(spark, sf_dir).collect()[0]
    assert row.n_docs == ndocs
    assert row.n_chunks == total
    assert row.n_unique_chunks == len(digs)
    assert row.dedup_ratio == round(1.0 - len(digs) / total, 6)
    assert row.avg_chunk_chars == round(lens / total, 2)


def test_chi2_keywords_match_python_replay(spark, sf_dir):
    """Chi2 keyword ranking must match a pure-Python contingency
    replay, including the positive-association filter and tiebreaks."""
    from collections import Counter

    import pyarrow.parquet as pq

    from big_data_audio_classification_spark.operators.text import (
        _CHI2_TOPK,
        text_chi2_keywords,
    )

    tbl = pq.read_table(f"{sf_dir}/documents.parquet", columns=["source", "text"])
    ts = Counter()
    for src, text in zip(
        tbl.column("source").to_pylist(), tbl.column("text").to_pylist()
    ):
        for tok in (t for t in text.split(" ") if t):
            ts[(tok, src)] += 1
    tot_t = Counter()
    tot_s = Counter()
    for (tok, src), a in ts.items():
        tot_t[tok] += a
        tot_s[src] += a
    big_n = sum(ts.values())

    per_source = {}
    for (tok, src), a in ts.items():
        ad = a * 1.0 * (big_n - tot_t[tok] - tot_s[src] + a)
        bc = (tot_t[tok] - a) * 1.0 * (tot_s[src] - a)
        if ad <= bc:
            continue
        chi2 = round(
            big_n
            * (ad - bc) ** 2
            / (
                tot_t[tok]
                * 1.0
                * (big_n - tot_t[tok])
                * tot_s[src]
                * (big_n - tot_s[src])
            ),
            6,
        )
        per_source.setdefault(src, []).append((-chi2, tok, a))
    expected = []
    for src in sorted(per_source):
        ranked = sorted(per_source[src])[:_CHI2_TOPK]
        for rank, (negchi, tok, a) in enumerate(ranked, 1):
            expected.append((src, tok, a, -negchi, rank))

    got = [
        (r.source, r.tok, r.n_occurrences, r.chi2, r.rank)
        for r in text_chi2_keywords(spark, sf_dir).collect()
    ]
    assert got == expected


def test_burrows_delta_matches_python_replay(spark, sf_dir):
    """Burrows' Delta must match a pure-Python replay (top-M words,
    per-source relative freqs, per-word z-scores, pairwise mean |dz|)."""
    import math
    from collections import Counter

    import pyarrow.parquet as pq

    from big_data_audio_classification_spark.operators.text import (
        _DELTA_TOP_WORDS,
        text_burrows_delta,
    )

    tbl = pq.read_table(f"{sf_dir}/documents.parquet", columns=["source", "text"])
    counts, stot, glob = {}, Counter(), Counter()
    for src, text in zip(
        tbl.column("source").to_pylist(), tbl.column("text").to_pylist()
    ):
        for tok in (t for t in text.split(" ") if t):
            counts[(src, tok)] = counts.get((src, tok), 0) + 1
            stot[src] += 1
            glob[tok] += 1
    top = [
        t for t, _ in sorted(glob.items(), key=lambda kv: (-kv[1], kv[0]))
    ][:_DELTA_TOP_WORDS]
    sources = sorted(stot)
    z = {}
    for tok in top:
        fs = {s: counts.get((s, tok), 0) / stot[s] for s in sources}
        mu = sum(fs.values()) / len(sources)
        sd = math.sqrt(sum((v - mu) ** 2 for v in fs.values()) / len(sources))
        for s in sources:
            z[(s, tok)] = (fs[s] - mu) / sd
    expected = {}
    for i, sa in enumerate(sources):
        for sb in sources[i + 1 :]:
            expected[(sa, sb)] = round(
                sum(abs(z[(sa, t)] - z[(sb, t)]) for t in top) / len(top), 6
            )

    got = {
        (r.source_a, r.source_b): r.delta
        for r in text_burrows_delta(spark, sf_dir).collect()
    }
    assert set(got) == set(expected)
    for k in expected:
        assert abs(got[k] - expected[k]) < 2e-6


def test_weighted_minhash_matches_python_replay(spark, sf_dir):
    """Occurrence-indexed (multiset) minhash signatures must match a
    pure-Python md5 replay for every doc."""
    import hashlib
    from collections import Counter

    import pyarrow.parquet as pq

    from big_data_audio_classification_spark.operators.dedup import (
        _A,
        _B,
        _MERSENNE,
        _WMH_K,
        dedup_minhash_weighted,
    )

    tbl = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    expected = {}
    for did, text in zip(
        tbl.column("doc_id").to_pylist(), tbl.column("text").to_pylist()
    ):
        seen = Counter()
        hvs = []
        for tok in (t for t in text.split(" ") if t):
            seen[tok] += 1
            key = f"{tok}#{seen[tok]}"
            hvs.append(int(hashlib.md5(key.encode()).hexdigest()[:8], 16))
        expected[did] = tuple(
            min((hv * _A[j] + _B[j]) % _MERSENNE for hv in hvs)
            for j in range(_WMH_K)
        )

    got = {
        r.doc_id: tuple(r[f"m{j}"] for j in range(_WMH_K))
        for r in dedup_minhash_weighted(spark, sf_dir).collect()
    }
    assert got == expected


def test_k_anonymity_pandas_replica(spark, sf_dir):
    """The audit's class frame must match an independent pandas
    groupby over the same quasi-identifier tuple."""
    import pandas as pd

    from big_data_audio_classification_spark.operators.curation import (
        K_ANON_BAND_CENTS,
        K_ANON_K,
        curation_k_anonymity,
    )

    pdf = pd.read_parquet(f"{sf_dir}/orders.parquet")
    pdf["yr"] = pd.to_datetime(pdf["o_orderdate"]).dt.year
    pdf["band"] = (
        (pdf["o_totalprice"] * 100).round().astype("int64") // K_ANON_BAND_CENTS
    )
    g = pdf.groupby(["yr", "o_orderpriority", "o_orderstatus"]).agg(
        n=("o_orderkey", "size"), l=("band", "nunique")
    )
    r = curation_k_anonymity(spark, sf_dir).collect()[0]
    assert r.n_classes == len(g)
    assert r.n_rows == int(g["n"].sum())
    assert r.k_anonymity == int(g["n"].min())
    assert r.rows_at_risk == int(g.loc[g["n"] < K_ANON_K, "n"].sum())
    assert r.l_diversity == int(g["l"].min())
    assert 0.0 <= r.risk_ratio <= 1.0


def test_sampling_quota_sums_to_budget_and_matches_hamilton(spark, sf_dir):
    """Quotas must sum exactly to the budget and equal a fraction-based
    Hamilton replay."""
    import pandas as pd

    from big_data_audio_classification_spark.operators.curation import (
        QUOTA_BUDGET,
        curation_sampling_quota,
    )

    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    chars = docs.groupby("source")["n_chars"].sum()
    total = chars.sum()
    floor_q = (QUOTA_BUDGET * chars) // total
    rem = (QUOTA_BUDGET * chars) % total
    leftover = QUOTA_BUDGET - floor_q.sum()
    order = sorted(chars.index, key=lambda s: (-rem[s], s))
    quota = {
        s: int(floor_q[s]) + (1 if i < leftover else 0)
        for i, s in enumerate(order)
    }

    rows = curation_sampling_quota(spark, sf_dir).collect()
    assert sum(r.quota for r in rows) == QUOTA_BUDGET
    for r in rows:
        assert r.quota == quota[r.source]
        # quota never deviates from exact proportionality by >= 1 seat
        assert abs(r.quota - QUOTA_BUDGET * chars[r.source] / total) < 1
