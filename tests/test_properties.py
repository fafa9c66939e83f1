"""Property-based tests (SURVEY §5.3): operator algebra laws over
hypothesis-generated small tables on local Spark.

Each law is engine-agnostic — it must hold for ANY correct relational
engine, so a violation is an engine bug, not a fixture artifact:
* dedup idempotence:        dd(dd(X)) == dd(X)
* union-count algebra:      |A ∪all B| == |A| + |B|
* inclusion-exclusion:      |A ∪ B| == |A| + |B| − |A ∩ B|  (set form)
* window-sum consistency:   last running sum per key == group sum
* join cardinality bounds:  |A ⋈ B on k| ≤ |A|·|B|; semi ≤ |A|; inner
                            with unique right key ≤ |A|
"""

from __future__ import annotations

import pyspark.sql.functions as F
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Window

ROWS = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=5),           # key
        st.integers(min_value=-100, max_value=100),      # value
    ),
    min_size=0,
    max_size=30,
)

SETTINGS = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _df(spark, rows):
    return spark.createDataFrame(rows or [(0, 0)], "k int, v int").limit(
        len(rows)
    )


@given(rows=ROWS)
@SETTINGS
def test_dedup_idempotent(spark, rows):
    df = _df(spark, rows)
    once = df.dropDuplicates()
    assert once.count() == once.dropDuplicates().count()
    assert once.count() == len(set(rows))


@given(a=ROWS, b=ROWS)
@SETTINGS
def test_union_all_counts(spark, a, b):
    da, db = _df(spark, a), _df(spark, b)
    assert da.unionAll(db).count() == len(a) + len(b)


@given(a=ROWS, b=ROWS)
@SETTINGS
def test_inclusion_exclusion(spark, a, b):
    da, db = _df(spark, a).distinct(), _df(spark, b).distinct()
    union = da.union(db).distinct().count()
    inter = da.intersect(db).count()
    assert union == da.count() + db.count() - inter


@given(rows=ROWS)
@SETTINGS
def test_running_sum_matches_group_sum(spark, rows):
    df = _df(spark, rows).withColumn("rid", F.monotonically_increasing_id())
    w = Window.partitionBy("k").orderBy("rid").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = df.select("k", F.sum("v").over(w).alias("run"))
    final = cum.groupBy("k").agg(F.max("run").alias("max_run"))
    # max of running sum ≥ total only when negatives exist; compare the
    # LAST running value instead: count rows where run == group total
    direct = df.groupBy("k").agg(F.sum("v").alias("total"))
    # every group's final (by rid) running value equals the group total
    last_run = (
        df.select("k", "rid", "v")
        .withColumn("run", F.sum("v").over(w))
        .withColumn(
            "rn",
            F.row_number().over(Window.partitionBy("k").orderBy(F.col("rid").desc())),
        )
        .filter(F.col("rn") == 1)
        .select("k", "run")
    )
    joined = last_run.join(direct, "k")
    assert joined.filter(F.col("run") != F.col("total")).count() == 0
    assert final.count() == direct.count()


@given(a=ROWS, b=ROWS)
@SETTINGS
def test_join_cardinality_bounds(spark, a, b):
    da, db = _df(spark, a), _df(spark, b)
    n_inner = da.join(db, "k").count()
    assert n_inner <= max(len(a), 1) * max(len(b), 1)
    n_semi = da.join(db, "k", "left_semi").count()
    assert n_semi <= len(a)
    # inner join against a unique-key right side never multiplies
    db_unique = db.dropDuplicates(["k"])
    assert da.join(db_unique, "k").count() <= len(a)
    # left join preserves left cardinality with unique right key
    assert da.join(db_unique, "k", "left").count() == len(a)


# ---------------------------------------------------------------------------
# Round-2 operator laws.
# ---------------------------------------------------------------------------
PAIRS = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=255),
        st.integers(min_value=0, max_value=255),
    ),
    min_size=1,
    max_size=24,
)


@given(pairs=PAIRS)
@SETTINGS
def test_morton_code_laws(spark, pairs):
    """Z-order key laws: morton(a,b) = morton(a,0) + morton(0,b)
    (disjoint bit planes), and monotone in each coordinate with the
    other held at zero — which is exactly what makes the interleave a
    valid clustering key for both dimensions."""
    from big_data_audio_classification_spark.operators.scale_patterns import (
        ZBITS,
    )

    def py_morton(a: int, b: int) -> int:
        m = 0
        for i in range(ZBITS):
            m += ((a >> i) & 1) << (2 * i)
            m += ((b >> i) & 1) << (2 * i + 1)
        return m

    df = spark.createDataFrame(pairs, "a int, b int")
    import pyspark.sql.functions as F

    morton = None
    for i in range(ZBITS):
        pa = F.shiftleft(F.shiftright("a", i).bitwiseAND(F.lit(1)), 2 * i)
        sa = F.shiftleft(F.shiftright("b", i).bitwiseAND(F.lit(1)), 2 * i + 1)
        term = pa + sa
        morton = term if morton is None else morton + term
    got = {(r["a"], r["b"]): r["m"] for r in df.select("a", "b", morton.alias("m")).collect()}
    for (a, b), m in got.items():
        assert m == py_morton(a, b)
        assert m == py_morton(a, 0) + py_morton(0, b)
    xs = sorted({a for a, _ in pairs})
    assert [py_morton(x, 0) for x in xs] == sorted(py_morton(x, 0) for x in xs)


def test_token_budget_keep_set_is_prefix_closed(spark, sf_dir):
    """If a document is kept, every strictly better-quality document
    (ties broken by doc_id) is also kept — the selection is a prefix of
    the global quality ordering, whatever the budget."""
    from big_data_audio_classification_spark.operators import curation

    kept = curation.curation_token_budget_select(spark, sf_dir).collect()
    kept_ids = {r["doc_id"] for r in kept}
    order = sorted(kept, key=lambda r: (-r["quality"], r["doc_id"]))
    # within the kept set, cum_tokens must be consistent with the order
    running = 0
    for r in order:
        running += r["n_tokens"]
        assert r["cum_tokens"] == running
        assert r["doc_id"] in kept_ids


def test_funnel_counts_are_monotone(spark, sf_dir):
    from big_data_audio_classification_spark.operators import analytics

    by_stage = {
        r["stage"]: r["n_users"]
        for r in analytics.events_funnel_conversion(spark, sf_dir).collect()
    }
    assert by_stage["view"] >= by_stage["click"] >= by_stage["purchase"]
    assert by_stage["purchase"] >= 0


# ---- round-3 laws ----

WORDS = st.lists(
    st.sampled_from(["a", "b", "c", "d", "e", "f"]),
    min_size=8,
    max_size=40,
)


@given(st.lists(WORDS, min_size=1, max_size=4))
@SETTINGS
def test_winnowing_covers_every_window(spark, docs):
    """The defining winnowing guarantee: every FULL window of w
    consecutive gram positions contains at least one selected
    fingerprint position — for ANY word sequence."""
    from big_data_audio_classification_spark.operators import retrieval

    df = spark.createDataFrame(
        [(i, ws) for i, ws in enumerate(docs)], "doc_id long, words array<string>"
    )
    sel = retrieval.winnowing_selections(df).collect()
    w = retrieval.WINNOW_W
    enc = 1 << 21
    by_doc: dict[int, set[int]] = {}
    n_windows: dict[int, int] = {}
    for r in sel:
        pos = enc - (r["fp"] % enc)
        by_doc.setdefault(r["doc_id"], set()).add(pos)
        n_windows[r["doc_id"]] = max(n_windows.get(r["doc_id"], 0), r["pos"])
    for doc_id, last_p in n_windows.items():
        picked = by_doc[doc_id]
        for p in range(w, last_p + 1):
            assert any(p - w + 1 <= s <= p for s in picked), (
                f"doc {doc_id}: window ending at {p} holds no fingerprint"
            )


@given(st.lists(WORDS, min_size=2, max_size=5))
@SETTINGS
def test_prefix_filter_join_equals_brute_force(spark, docs):
    """The prefix-filter candidate pruning must be LOSSLESS: its output
    equals the brute-force all-pairs Jaccard join for any corpus."""
    from big_data_audio_classification_spark.operators import dedup

    theta, n = 0.5, 2
    df = spark.createDataFrame(
        [(i, ws) for i, ws in enumerate(docs)], "doc_id long, words array<string>"
    )
    got = {
        (r["doc_a"], r["doc_b"]): (r["n_common"], r["jaccard"])
        for r in dedup.prefix_filter_pairs(df, theta, n).collect()
    }
    sets = {
        i: {" ".join(ws[j : j + n]) for j in range(len(ws) - n + 1)}
        for i, ws in enumerate(docs)
        if len(ws) >= n
    }
    expected = {}
    ids = sorted(sets)
    for x in ids:
        for y in ids:
            if x < y:
                inter = len(sets[x] & sets[y])
                union = len(sets[x] | sets[y])
                if union and inter / union >= theta:
                    expected[(x, y)] = (inter, round(inter / union, 6))
    assert got == expected


def test_interpolation_bounded_by_neighbors(spark, sf_dir):
    """Every interpolated gap value lies between its two bounding
    observations (weighted-mean invariant), and observed rows pass
    through unchanged."""
    from big_data_audio_classification_spark.operators import warehouse

    rows = warehouse.gapfill_linear_interpolation(spark, sf_dir).collect()
    by_user: dict[int, list] = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(r)
    checked_gaps = 0
    for series in by_user.values():
        series.sort(key=lambda r: r["hour_idx"])
        obs = [(i, r) for i, r in enumerate(series) if not r["is_gap"]]
        for r in series:
            if not r["is_gap"]:
                assert r["v_filled_micros"] == r["v_obs_micros"]
        for (i1, r1), (i2, r2) in zip(obs, obs[1:]):
            lo, hi = sorted((r1["v_obs_micros"], r2["v_obs_micros"]))
            for r in series[i1 + 1 : i2]:
                assert lo <= r["v_filled_micros"] <= hi
                checked_gaps += 1
    assert checked_gaps > 0, "fixture produced no gaps to check"


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    pts=st.lists(
        st.tuples(st.integers(0, 20), st.integers(0, 20)), min_size=1, max_size=40
    )
)
def test_skyline_window_form_equals_dominance_definition(spark, pts):
    """The single-window skyline over the distinct grid must equal the
    O(n²) dominance definition on arbitrary (price, size) multisets —
    including duplicate points, ties on one axis, and degenerate
    single-point inputs."""
    rows = [(i, float(p), s) for i, (p, s) in enumerate(pts)]
    df = spark.createDataFrame(rows, "id long, price double, size int")
    grid = df.select("price", "size").distinct()
    w = (
        Window.orderBy(F.col("price").asc(), F.col("size").desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    frontier = (
        grid.withColumn("prev_max", F.max("size").over(w))
        .where(F.col("prev_max").isNull() | (F.col("size") > F.col("prev_max")))
        .select("price", "size")
    )
    got = {
        r["id"]
        for r in df.join(frontier, ["price", "size"], "left_semi").collect()
    }
    expected = {
        i
        for i, (p, s) in enumerate(pts)
        if not any(
            q_p <= p and q_s >= s and (q_p < p or q_s > s) for q_p, q_s in pts
        )
    }
    assert got == expected


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    xs=st.lists(
        st.floats(-50, 50, allow_nan=False, allow_infinity=False),
        min_size=2,
        max_size=60,
    ),
    mu=st.floats(-5, 5, allow_nan=False, allow_infinity=False),
    k=st.floats(0, 2, allow_nan=False, allow_infinity=False),
)
def test_cusum_closed_form_equals_recursion_on_random_series(spark, xs, mu, k):
    """S_t = cum_t − min(0, running-min cum) must replicate the
    textbook recursion S_t = max(0, S_{t−1} + (x_t − μ − k)) on
    arbitrary series — the algebraic identity the CUSUM operator
    rests on, checked beyond the fixed testdata."""
    rows = [(i, float(x)) for i, x in enumerate(xs)]
    df = spark.createDataFrame(rows, "t int, x double")
    w = Window.orderBy("t")
    got = {
        r["t"]: r["s"]
        for r in df.withColumn("cum", F.sum(F.col("x") - mu - k).over(w))
        .withColumn("s", F.col("cum") - F.least(F.lit(0.0), F.min("cum").over(w)))
        .collect()
    }
    s = 0.0
    for i, x in enumerate(xs):
        s = max(0.0, s + (x - mu - k))
        assert abs(got[i] - s) < 1e-6 * max(1.0, abs(s)), (i, got[i], s)
