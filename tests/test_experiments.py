"""Invariants for the survival/A-B experimentation operators: a direct
Python Kaplan-Meier replay, curve monotonicity, and a from-scratch
two-proportion z recomputation."""

from __future__ import annotations

import math
from collections import defaultdict

import pyspark.sql.functions as F

from big_data_audio_classification_spark.operators.experiments import (
    KM_CENSOR_DAYS,
    stats_ab_proportion_test,
    stats_kaplan_meier,
)
from big_data_audio_classification_spark.sources.catalog import load_table


def _subjects(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    rows = (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .groupBy("c_mktsegment", "o_custkey")
        .agg(
            F.min(F.col("o_orderdate").cast("date")).alias("first"),
            F.max(F.col("o_orderdate").cast("date")).alias("last"),
        )
        .collect()
    )
    horizon = max(r["last"] for r in rows)
    return [
        (
            r["c_mktsegment"],
            (r["last"] - r["first"]).days,
            1 if (horizon - r["last"]).days > KM_CENSOR_DAYS else 0,
        )
        for r in rows
    ]


def test_kaplan_meier_matches_direct_replay(spark, sf_dir):
    subj = _subjects(spark, sf_dir)
    by_seg = defaultdict(list)
    for seg, dur, ev in subj:
        by_seg[seg].append((dur, ev))
    expected = {}
    for seg, items in by_seg.items():
        items.sort()
        n = len(items)
        s = 1.0
        i = 0
        while i < len(items):
            t = items[i][0]
            d = sum(1 for x in items if x[0] == t and x[1] == 1)
            leaving = sum(1 for x in items if x[0] == t)
            if d > 0:
                s *= 1.0 - d / n
                expected[(seg, t)] = (d, n, s)
            n -= leaving
            while i < len(items) and items[i][0] == t:
                i += 1
    got = stats_kaplan_meier(spark, sf_dir).collect()
    assert len(got) > 0
    for r in got:
        d, n_risk, s = expected[(r["segment"], r["t"])]
        assert r["d"] == d and r["n_risk"] == n_risk
        assert abs(r["s_km"] - s) < 1e-5, (r, s)


def test_kaplan_meier_curve_shape(spark, sf_dir):
    rows = stats_kaplan_meier(spark, sf_dir).collect()
    by_seg = defaultdict(list)
    for r in rows:
        by_seg[r["segment"]].append((r["t"], r["s_km"], r["n_risk"]))
    for seg, pts in by_seg.items():
        pts.sort()
        for (t1, s1, n1), (t2, s2, n2) in zip(pts, pts[1:]):
            assert s2 < s1 + 1e-12, (seg, t1, t2)  # non-increasing
            assert n2 < n1, (seg, t1, t2)  # at-risk strictly shrinks
        assert all(0.0 < s <= 1.0 for _, s, _ in pts)


def test_ab_test_z_matches_manual(spark, sf_dir):
    e = load_table(spark, sf_dir, "events").collect()
    arms = {0: [0, 0], 1: [0, 0]}
    for r in e:
        a = r["event_id"] % 2
        arms[a][0] += 1
        arms[a][1] += 1 if r["event_type"] == "purchase" else 0
    (n_a, c_a), (n_b, c_b) = arms[0], arms[1]
    pool = (c_a + c_b) / (n_a + n_b)
    z = (c_b / n_b - c_a / n_a) / math.sqrt(
        pool * (1 - pool) * (1 / n_a + 1 / n_b)
    )
    row = stats_ab_proportion_test(spark, sf_dir).collect()[0]
    assert (row["n_a"], row["conv_a"], row["n_b"], row["conv_b"]) == (
        n_a,
        c_a,
        n_b,
        c_b,
    )
    assert abs(row["z"] - z) < 1e-5
    assert row["significant_95"] == (abs(z) > 1.959963985)
