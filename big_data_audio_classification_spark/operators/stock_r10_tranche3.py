"""Round-10 pre-stock tranche 3: raise every REQUIRED_FAMILY_TAG that
sat at exactly 3 never-certified carriers to >= 4, so the r11, r12 AND
r13 rotations can all run with zero carrier-building (extends the r08
pre-stocking pattern one round further than tranche 2).

Same contract as stock_r10.py / stock_r10_tranche2.py: idiomatic Spark
plan + independently-formulated DuckDB oracle, identical aliases, exact
integers up to one fixed-order float expression, ordered in-row folds
for any cross-row float reduction, ``+ 0`` guards where a ROUND can
land on zero, DECIMAL(38,0)/HUGEINT accumulators where int64 could wrap
at 100 TB, full gating battery per carrier (tri-SF bit-exact, dtypes,
two-config partition robustness, replay pytest) before window
eligibility.
"""

from __future__ import annotations

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from big_data_audio_classification_spark.registry import query
from big_data_audio_classification_spark.sources.catalog import load_table

# ---------------------------------------------------------------------------
# asof: most recent signup strictly at-or-before each purchase
# ---------------------------------------------------------------------------

ASOF_SIGNUP_TOL_US = 14 * 86400 * 1_000_000  # 14 days


@query(
    "join_asof_prior_signup_lag",
    oracle=f"""
        WITH p AS (SELECT event_id AS purchase_id, user_id, ts
                   FROM events WHERE event_type = 'purchase'),
        s AS (SELECT event_id AS sid, user_id, ts AS sts
              FROM events WHERE event_type = 'signup'),
        ranked AS (
            SELECT p.purchase_id, p.user_id, p.ts, s.sid, s.sts,
                   ROW_NUMBER() OVER (
                       PARTITION BY p.purchase_id
                       ORDER BY (s.sid IS NULL), s.sts DESC, s.sid DESC) AS rn
            FROM p LEFT JOIN s
              ON s.user_id = p.user_id AND s.sts <= p.ts
             AND epoch_us(p.ts) - epoch_us(s.sts) <= {ASOF_SIGNUP_TOL_US}
        )
        SELECT purchase_id, user_id, sid AS signup_id,
               epoch_us(ts) - epoch_us(sts) AS lag_us
        FROM ranked WHERE rn = 1
    """,
    tags=("relational", "join", "asof", "events", "window-time"),
)
def join_asof_prior_signup_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BACKWARD AS-OF join purchase→signup: each purchase carries the
    user's LATEST signup at-or-before it within a 14-day tolerance
    (the attribution-window join — how long after signup do users
    convert), NULL lag when the signup predates the window. Spark
    computes the carry from one unioned stream with a single
    running-max window (signups sort before purchases at equal ts via
    a kind key, so a Δt=0 signup is visible), then applies the
    tolerance as a post-carry predicate — one shuffle keyed by
    user_id, O(1) window state, NEVER a range join; the oracle's
    ranked left join with the tolerance in ON (never WHERE — it must
    not kill preserved rows) is the independent formulation
    (house siblings: ``join_asof_nearest_abs``,
    ``join_asof_prior_error_latency``). Everything integer (epoch
    microseconds). 100 TB: the union shuffles once on user_id; skewed
    users are bounded by per-user event counts, not the join."""
    e = load_table(spark, sf_dir, "events")
    signups = e.filter(F.col("event_type") == "signup").select(
        "user_id", "ts", F.lit(0).alias("kind"),
        F.col("event_id").alias("eid"),
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.lit(1).alias("kind"),
        F.col("event_id").alias("eid"),
    )
    s = signups.unionByName(purchases)
    us = F.unix_micros("ts")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("kind").asc(), F.col("eid").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # carry the latest signup (ts, id) seen so far; equal-ts ties break
    # toward the LARGEST signup id (the house backward convention)
    carried = s.withColumn(
        "carry",
        F.max(
            F.when(
                F.col("kind") == 0, F.struct(F.col("ts").alias("sts"), F.col("eid").alias("sid"))
            )
        ).over(w),
    )
    out = (
        carried.filter(F.col("kind") == 1)
        .select(
            F.col("eid").alias("purchase_id"),
            "user_id",
            us.alias("pus"),
            F.col("carry.sid").alias("sid"),
            F.unix_micros(F.col("carry.sts")).alias("sus"),
        )
        .withColumn(
            "in_tol",
            F.col("sid").isNotNull()
            & ((F.col("pus") - F.col("sus")) <= F.lit(ASOF_SIGNUP_TOL_US)),
        )
    )
    return out.select(
        "purchase_id",
        "user_id",
        F.when(F.col("in_tol"), F.col("sid")).alias("signup_id"),
        F.when(F.col("in_tol"), F.col("pus") - F.col("sus")).alias("lag_us"),
    )


# ---------------------------------------------------------------------------
# variant: present-null vs missing-path census
# ---------------------------------------------------------------------------


@query(
    "scalar_variant_null_vs_missing_census",
    oracle="""
        WITH v AS (
            SELECT event_type,
                   CASE WHEN event_id % 3 = 0
                        THEN '{"v": ' || json_extract_string(props, '$.k')
                             || ', "n": null}'
                        ELSE '{"v": ' || json_extract_string(props, '$.k')
                             || '}' END AS doc
            FROM events
        ),
        f AS (
            SELECT event_type,
                   CAST(json_extract_string(doc, '$.v') AS BIGINT) AS v_typed,
                   json_type(doc, '$.n') = 'NULL' AS n_present_null,
                   json_type(doc, '$.n') IS NULL  AS n_missing
            FROM v
        )
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CASE WHEN n_present_null THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_present_null,
               CAST(SUM(CASE WHEN n_missing THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_missing,
               CAST(SUM(v_typed) AS BIGINT) AS v_sum
        FROM f GROUP BY event_type
    """,
    tags=("scalar", "variant", "json", "events"),
)
def scalar_variant_null_vs_missing_census(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """VARIANT NULL-DISCIPLINE CENSUS: the aggregate face of the
    present-null vs missing-path distinction (the per-row probe is
    ``scalar_variant_mixed_scalars``) — a third of the documents carry
    an EXPLICIT ``"n": null``, the rest omit the key entirely, and the
    census counts each discipline per event_type: ``is_variant_null``
    over a present path vs SQL-NULL from ``try_variant_get`` on a
    missing one. This is the contract a schema-inference pass needs
    (a column that is 30%% explicit-null and 70%% absent is NOT a 100%%
    nullable column). The typed-int sum rides along so the VARIANT
    decode path is value-checked, not just flag-checked. All exact
    integers. 100 TB: map-only parse + one keyed aggregate."""
    e = load_table(spark, sf_dir, "events")
    doc = F.when(
        F.col("event_id") % 3 == 0,
        F.concat(
            F.lit('{"v": '),
            F.get_json_object("props", "$.k"),
            F.lit(', "n": null}'),
        ),
    ).otherwise(
        F.concat(
            F.lit('{"v": '), F.get_json_object("props", "$.k"), F.lit("}")
        )
    )
    v = F.parse_json(doc)
    probe = F.try_variant_get(v, "$.n", "variant")
    f = e.select(
        "event_type",
        F.try_variant_get(v, "$.v", "bigint").alias("v_typed"),
        F.coalesce(F.is_variant_null(probe), F.lit(False)).alias(
            "n_present_null"
        ),
        probe.isNull().alias("n_missing"),
    )
    return f.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.when(F.col("n_present_null"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_present_null"),
        F.sum(F.when(F.col("n_missing"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_missing"),
        F.sum("v_typed").cast("bigint").alias("v_sum"),
    )


# ---------------------------------------------------------------------------
# tfidf: BM25 probe-term scoring
# ---------------------------------------------------------------------------

BM25_K1 = 1.2
BM25_B = 0.75
BM25_TERMS = ("column", "window", "scan")


def _bm25_sql() -> str:
    probes = ", ".join(f"'{t}'" for t in BM25_TERMS)
    # one fixed-order term expression per probe, summed in literal
    # probe order (t0 + t1 + t2) — never a data-ordered aggregate
    term_exprs = []
    for i, t in enumerate(BM25_TERMS):
        term_exprs.append(
            f"""(LN((stats.n_docs - df{i} + 0.5) / (df{i} + 0.5) + 1.0)
                 * (tf{i} * {BM25_K1 + 1.0})
                 / (tf{i} + {BM25_K1} * (1.0 - {BM25_B}
                    + {BM25_B} * dl / (CAST(stats.total_len AS DOUBLE)
                                       / stats.n_docs))))"""
        )
    score = " + ".join(term_exprs)
    tf_cols = ", ".join(
        f"""CAST(SUM(CASE WHEN tok = '{t}' THEN 1 ELSE 0 END) AS BIGINT)
            AS tf{i}"""
        for i, t in enumerate(BM25_TERMS)
    )
    df_cols = ", ".join(
        f"""CAST(SUM(CASE WHEN tf{i} > 0 THEN 1 ELSE 0 END) AS BIGINT)
            AS df{i}"""
        for i in range(len(BM25_TERMS))
    )
    return f"""
        WITH toks AS (
            SELECT doc_id,
                   UNNEST(list_filter(string_split(text, ' '),
                                      t -> t <> '')) AS tok
            FROM documents
        ),
        dt AS (
            SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dl, {tf_cols}
            FROM toks GROUP BY doc_id
        ),
        stats AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
                   CAST(SUM(dl) AS BIGINT) AS total_len,
                   {df_cols}
            FROM dt
        )
        SELECT doc_id, dl, tf0, tf1, tf2,
               ROUND({score}, 6) + 0 AS bm25
        FROM dt, stats
        WHERE tf0 + tf1 + tf2 > 0
    """


@query(
    "text_tfidf_bm25_probe_ranking",
    oracle=_bm25_sql(),
    tags=("text", "tfidf", "documents"),
)
def text_tfidf_bm25_probe_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 (Robertson/Spärck Jones) probe-term scoring — the ranking
    function the tf-idf family graduates into (k1=1.2 saturates term
    frequency, b=0.75 length-normalizes against the corpus mean; the
    plain tf-idf variants live in ``text_tfidf_idf_variants``):
    score(d) = Σ_t IDF(t) · tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl))
    with the +0.5-smoothed IDF (arg ≥ 1, so LN is self-guarded even
    for a vanished vocabulary — no CASE needed, per the r09 advice
    class). Every count (tf, df, dl, N, Σdl) is an exact integer from
    one token aggregate; the score is a FIXED-ORDER sum of three
    per-probe expressions written in literal probe order on both
    engines — never a data-ordered float reduction. Zero-hit docs are
    excluded by an exact integer predicate. 100 TB: one token-keyed
    aggregate + a broadcast 1-row stats frame; scores are map-only."""
    d = load_table(spark, sf_dir, "documents")
    from big_data_audio_classification_spark.operators.dedup import tokens_col

    toks = d.select(
        "doc_id", F.explode(tokens_col(F.col("text"))).alias("tok")
    )
    aggs = [F.count(F.lit(1)).cast("bigint").alias("dl")] + [
        F.sum(F.when(F.col("tok") == t, 1).otherwise(0))
        .cast("bigint")
        .alias(f"tf{i}")
        for i, t in enumerate(BM25_TERMS)
    ]
    dt = toks.groupBy("doc_id").agg(*aggs)
    stats = dt.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("dl").cast("bigint").alias("total_len"),
        *[
            F.sum(F.when(F.col(f"tf{i}") > 0, 1).otherwise(0))
            .cast("bigint")
            .alias(f"df{i}")
            for i in range(len(BM25_TERMS))
        ],
    )
    avgdl = F.col("total_len").cast("double") / F.col("n_docs")
    score = None
    for i in range(len(BM25_TERMS)):
        tf = F.col(f"tf{i}")
        idf = F.log(
            (F.col("n_docs") - F.col(f"df{i}") + 0.5)
            / (F.col(f"df{i}") + 0.5)
            + 1.0
        )
        t = (
            idf
            * (tf * (BM25_K1 + 1.0))
            / (tf + BM25_K1 * (1.0 - BM25_B + BM25_B * F.col("dl") / avgdl))
        )
        score = t if score is None else score + t
    return (
        dt.crossJoin(F.broadcast(stats))
        .filter((F.col("tf0") + F.col("tf1") + F.col("tf2")) > 0)
        .select(
            "doc_id", "dl", "tf0", "tf1", "tf2",
            F.round(score, 6).alias("bm25"),
        )
    )


# ---------------------------------------------------------------------------
# regression: two-segment piecewise OLS at a fixed knot
# ---------------------------------------------------------------------------

PIECEWISE_KNOT_DAY = 15


def _piecewise_sql() -> str:
    return f"""
        WITH base AS (
            SELECT event_type,
                   CASE WHEN day(ts) <= {PIECEWISE_KNOT_DAY}
                        THEN 'early' ELSE 'late' END AS segment,
                   CAST(day(ts) AS BIGINT) AS x,
                   CAST(ROUND(value * 100) AS BIGINT) AS y
            FROM events
        ),
        m AS (
            SELECT event_type, segment,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(x) AS BIGINT) AS sx,
                   CAST(SUM(x * x) AS BIGINT) AS sxx,
                   SUM(CAST(y AS HUGEINT)) AS sy,
                   SUM(CAST(x AS HUGEINT) * y) AS sxy
            FROM base GROUP BY event_type, segment
        )
        SELECT event_type, segment, n, sx,
               CAST(sy AS BIGINT) AS sy,
               CASE WHEN CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx > 0
                    THEN ROUND((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                                - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                               / (CAST(n AS DOUBLE) * sxx
                                  - CAST(sx AS DOUBLE) * sx)
                               / 100.0, 6) + 0
                    ELSE NULL END AS slope_per_day,
               CASE WHEN CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx > 0
                    THEN ROUND((CAST(sxx AS DOUBLE) * CAST(sy AS DOUBLE)
                                - CAST(sx AS DOUBLE) * CAST(sxy AS DOUBLE))
                               / (CAST(n AS DOUBLE) * sxx
                                  - CAST(sx AS DOUBLE) * sx)
                               / 100.0, 6) + 0
                    ELSE NULL END AS intercept_value
        FROM m
    """


@query(
    "ml_piecewise_linear_knot",
    oracle=_piecewise_sql(),
    tags=("ml", "regression", "events"),
)
def ml_piecewise_linear_knot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TWO-SEGMENT PIECEWISE OLS at a fixed knot (day 15): value-cents
    regressed on day-of-month independently for the early and late
    halves per event_type — the broken-stick model a trend monitor
    fits when a mid-month launch might have changed the slope (the
    single-segment siblings live in the regression family;
    segmentation by a FIXED knot keeps the design data-independent,
    so the oracle is plain SQL, not a search). Slope and intercept
    both come from the ALL-INTEGER closed forms (n·Σxy−Σx·Σy)/den and
    (Σxx·Σy−Σx·Σxy)/den — no running float anywhere; y-moments
    accumulate in DECIMAL(38,0)/HUGEINT (Σxy adds a ×31 on cents —
    the r09-advice int64-wrap class), x-moments stay int64 (x ≤ 31).
    The final division casts the exact moments to double PER-MOMENT
    inside ONE expression written identically on both engines —
    including den = n·Σx²−(Σx)², whose int64 product form would wrap
    asymmetrically at ~3×10⁹ rows per group (Spark silent, DuckDB
    raising); degenerate single-day segments degrade to NULL via the
    den > 0 CASE.
    100 TB: one map-side-combinable moment aggregate."""
    e = load_table(spark, sf_dir, "events")
    x = F.dayofmonth("ts").cast("bigint")
    y = F.round(F.col("value") * 100).cast("bigint")
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    base = e.select(
        "event_type",
        F.when(x <= PIECEWISE_KNOT_DAY, "early").otherwise("late").alias(
            "segment"
        ),
        x.alias("x"),
        y.alias("y"),
    )
    m = base.groupBy("event_type", "segment").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
        F.sum(dec(F.col("y"))).alias("sy_dec"),
        F.sum(dec(F.col("x") * F.col("y"))).alias("sxy_dec"),
    )
    den = (
        F.col("n").cast("double") * F.col("sxx")
        - F.col("sx").cast("double") * F.col("sx")
    )
    slope = (
        F.col("n").cast("double") * F.col("sxy_dec").cast("double")
        - F.col("sx").cast("double") * F.col("sy_dec").cast("double")
    ) / den / 100.0
    intercept = (
        F.col("sxx").cast("double") * F.col("sy_dec").cast("double")
        - F.col("sx").cast("double") * F.col("sxy_dec").cast("double")
    ) / den / 100.0
    return m.select(
        "event_type",
        "segment",
        "n",
        "sx",
        F.col("sy_dec").cast("bigint").alias("sy"),
        F.when(den > 0, F.round(slope, 6)).alias("slope_per_day"),
        F.when(den > 0, F.round(intercept, 6)).alias("intercept_value"),
    )


# ---------------------------------------------------------------------------
# subquery: quantified ANY/ALL comparisons
# ---------------------------------------------------------------------------


@query(
    "subquery_any_all_quantified",
    oracle="""
        WITH bench AS (
            SELECT o_totalprice AS p FROM orders
            WHERE o_orderpriority = '1-URGENT' AND o_orderstatus = 'F'
        )
        SELECT o_orderpriority AS priority,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CASE WHEN o_totalprice > ALL (SELECT p FROM bench)
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_gt_all,
               CAST(SUM(CASE WHEN o_totalprice > ANY (SELECT p FROM bench)
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_gt_any
        FROM orders GROUP BY o_orderpriority
    """,
    tags=("relational", "subquery", "sql", "orders"),
)
def subquery_any_all_quantified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """QUANTIFIED-COMPARISON census: per priority, how many orders
    price above ALL vs above ANY of the urgent-finished benchmark set
    — the > ALL / > ANY surface DuckDB evaluates natively while Spark
    SQL (which has no quantified comparisons) states the SAME
    predicate through scalar MAX/MIN subqueries: x > ALL S ⟺
    x > (SELECT MAX(p)), x > ANY S ⟺ x > (SELECT MIN(p)) — on a
    non-empty benchmark these are exactly equivalent, and the
    benchmark is non-empty at every SF (urgent+F orders exist; an
    empty set would make ALL vacuously true vs MAX NULL, which is why
    the docstring pins the non-empty contract). Price comparisons are
    raw parquet doubles on both engines (no arithmetic, so exact).
    Counts are exact ints. 100 TB: the benchmark extremes are a 1-row
    broadcast; the census is one map-side-combinable aggregate."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView(
        "anyall_orders_in"
    )
    return spark.sql(
        """
        WITH bench AS (
            SELECT MAX(o_totalprice) AS maxp, MIN(o_totalprice) AS minp
            FROM anyall_orders_in
            WHERE o_orderpriority = '1-URGENT' AND o_orderstatus = 'F'
        )
        SELECT o_orderpriority AS priority,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CASE WHEN o_totalprice > (SELECT maxp FROM bench)
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_gt_all,
               CAST(SUM(CASE WHEN o_totalprice > (SELECT minp FROM bench)
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_gt_any
        FROM anyall_orders_in GROUP BY o_orderpriority
        """
    )


# ---------------------------------------------------------------------------
# ivf: coarse-centroid geometry report
# ---------------------------------------------------------------------------


def _centroid_geometry_sql() -> str:
    from big_data_audio_classification_spark.operators.similarity import (
        IVF_CELLS,
    )

    return f"""
        WITH c AS (SELECT vec_id AS cell_id, embedding FROM embeddings
                   WHERE vec_id < {IVF_CELLS}),
        pairs AS (
            SELECT a.cell_id AS ca, b.cell_id AS cb,
                   list_sum(list_transform(list_zip(a.embedding, b.embedding),
                            p -> (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))
                               * (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))))
                       AS d2
            FROM c a JOIN c b ON a.cell_id <> b.cell_id
        ),
        per AS (
            SELECT ca AS cell_id,
                   MIN(d2) AS min_d2, MAX(d2) AS max_d2
            FROM pairs GROUP BY ca
        ),
        diam AS (SELECT MAX(d2) AS diam_d2 FROM pairs)
        SELECT cell_id,
               ROUND(SQRT(min_d2), 6) AS nn_dist,
               ROUND(SQRT(max_d2), 6) AS far_dist,
               ROUND(SQRT(diam.diam_d2), 6) AS diameter
        FROM per, diam
    """


@query(
    "sim_ivf_centroid_geometry",
    oracle=_centroid_geometry_sql(),
    tags=("similarity", "ivf", "report", "embeddings"),
)
def sim_ivf_centroid_geometry(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COARSE-CENTROID GEOMETRY report: per-centroid nearest-neighbor
    and farthest-neighbor L2 distance plus the codebook diameter —
    the codebook-quality view that predicts IVF probe waste (two
    centroids closer than a typical cell radius split one true
    cluster across cells, so nprobe=1 recall craters; siblings:
    ``sim_ivf_cell_balance`` for population, ``sim_ivf_cell_radius_
    profile`` for residuals). Each pairwise distance folds the 64
    dims IN INDEX ORDER on both engines (zip_with/aggregate vs
    list_zip/list_sum — deterministic same-order sums of identical
    doubles); MIN/MAX over the 7 neighbor distances are order-free,
    and sqrt commutes with both (monotone), so it runs once on the
    selected d2. 100 TB: the centroid set is O(cells) rows —
    the whole report is a broadcast-sized crunch independent of
    corpus size."""
    from big_data_audio_classification_spark.functions.vector import (
        l2_dist_sq,
        to_double,
    )
    from big_data_audio_classification_spark.operators.similarity import (
        IVF_CELLS,
    )

    em = load_table(spark, sf_dir, "embeddings")
    c = em.filter(F.col("vec_id") < IVF_CELLS).select(
        F.col("vec_id").alias("cell_id"),
        to_double(F.col("embedding")).alias("emb"),
    )
    a = c.select(F.col("cell_id").alias("ca"), F.col("emb").alias("ea"))
    b = c.select(F.col("cell_id").alias("cb"), F.col("emb").alias("eb"))
    d2 = l2_dist_sq(F.col("ea"), F.col("eb"))
    pairs = (
        a.join(b, F.col("ca") != F.col("cb"))
        .select("ca", "cb", d2.alias("d2"))
    )
    per = pairs.groupBy(F.col("ca").alias("cell_id")).agg(
        F.min("d2").alias("min_d2"), F.max("d2").alias("max_d2")
    )
    diam = pairs.agg(F.max("d2").alias("diam_d2"))
    return per.crossJoin(F.broadcast(diam)).select(
        "cell_id",
        F.round(F.sqrt("min_d2"), 6).alias("nn_dist"),
        F.round(F.sqrt("max_d2"), 6).alias("far_dist"),
        F.round(F.sqrt("diam_d2"), 6).alias("diameter"),
    )


# ---------------------------------------------------------------------------
# feature-selection: Haldane-corrected log odds ratio per dimension
# ---------------------------------------------------------------------------

OR_DIMS = 16


@query(
    "ml_odds_ratio_selection",
    oracle=f"""
        WITH x AS (
            SELECT CAST(generate_subscripts(embedding[1:{OR_DIMS}], 1) - 1
                        AS BIGINT) AS dim,
                   UNNEST(embedding[1:{OR_DIMS}]) AS v,
                   label % 2 = 0 AS pos
            FROM embeddings
        ),
        t AS (
            SELECT dim,
                   CAST(SUM(CASE WHEN v > 0 AND pos THEN 1 ELSE 0 END)
                        AS BIGINT) AS a,
                   CAST(SUM(CASE WHEN v > 0 AND NOT pos THEN 1 ELSE 0 END)
                        AS BIGINT) AS b,
                   CAST(SUM(CASE WHEN v <= 0 AND pos THEN 1 ELSE 0 END)
                        AS BIGINT) AS c,
                   CAST(SUM(CASE WHEN v <= 0 AND NOT pos THEN 1 ELSE 0 END)
                        AS BIGINT) AS d
            FROM x GROUP BY dim
        )
        SELECT dim, a, b, c, d,
               ROUND(LN(((a + 0.5) * (d + 0.5)) / ((b + 0.5) * (c + 0.5))), 6)
                   + 0 AS log_odds
        FROM t
    """,
    tags=("ml", "feature-selection", "embeddings"),
)
def ml_odds_ratio_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LOG ODDS-RATIO feature screen with HALDANE-ANSCOMBE correction:
    per embedding dimension (first 16), the 2×2 association between
    the sign of the coordinate and the even-label class, scored as
    ln((a+½)(d+½) / ((b+½)(c+½))) — the epidemiology-grade effect
    size the MI/chi2/Fisher siblings don't give (it is SIGNED, so a
    ranking by |log-OR| also says WHICH class the feature votes for;
    the +½ correction keeps a zero cell finite instead of ±∞ — no
    CASE guard needed, by construction). The four cells are exact
    integers from one aggregate over the dimension-exploded prefix;
    the score is ONE fixed-order float expression. 100 TB: explode
    multiplies rows ×16, then one map-side-combinable aggregate with
    a 16-row result."""
    em = load_table(spark, sf_dir, "embeddings")
    x = em.select(
        F.posexplode(F.slice("embedding", 1, OR_DIMS)).alias("dim0", "v"),
        (F.col("label") % 2 == 0).alias("pos"),
    ).select(F.col("dim0").cast("bigint").alias("dim"), "v", "pos")
    t = x.groupBy("dim").agg(
        F.sum(F.when((F.col("v") > 0) & F.col("pos"), 1).otherwise(0))
        .cast("bigint")
        .alias("a"),
        F.sum(F.when((F.col("v") > 0) & ~F.col("pos"), 1).otherwise(0))
        .cast("bigint")
        .alias("b"),
        F.sum(F.when((F.col("v") <= 0) & F.col("pos"), 1).otherwise(0))
        .cast("bigint")
        .alias("c"),
        F.sum(F.when((F.col("v") <= 0) & ~F.col("pos"), 1).otherwise(0))
        .cast("bigint")
        .alias("d"),
    )
    log_odds = F.log(
        ((F.col("a") + 0.5) * (F.col("d") + 0.5))
        / ((F.col("b") + 0.5) * (F.col("c") + 0.5))
    )
    return t.select(
        "dim", "a", "b", "c", "d", F.round(log_odds, 6).alias("log_odds")
    )


# ---------------------------------------------------------------------------
# encoding: frequency-rank encoding applied back to the fact stream
# ---------------------------------------------------------------------------


@query(
    "ml_frequency_rank_encoding",
    oracle="""
        WITH cnt AS (
            SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n
            FROM events GROUP BY event_type
        ),
        enc AS (
            SELECT event_type, n,
                   CAST(ROW_NUMBER() OVER (ORDER BY n DESC, event_type)
                        AS BIGINT) AS rank_enc,
                   ROUND(CAST(n AS DOUBLE)
                         / (SELECT SUM(n) FROM cnt), 6) AS freq_enc
            FROM cnt
        )
        SELECT e.rank_enc, e.event_type, e.n, e.freq_enc,
               CAST(SUM(CAST(ROUND(ev.value * 100) AS BIGINT)) AS BIGINT)
                   AS total_cents
        FROM events ev JOIN enc e ON ev.event_type = e.event_type
        GROUP BY e.rank_enc, e.event_type, e.n, e.freq_enc
    """,
    tags=("ml", "encoding", "events"),
)
def ml_frequency_rank_encoding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FREQUENCY-RANK ENCODING fitted AND applied: the categorical
    event_type maps to (rank-by-frequency, relative-frequency) codes —
    the leakage-free unsupervised cousin of target encoding (house
    siblings: one-hot, binary, hashing-trick, WOE, OOF-target) — and
    the code table is then JOINED BACK to the fact stream, proving
    the applied path, not just the dictionary (total value-cents per
    encoded class rides through the join as an exact integer). Rank
    ties break lexicographically; relative frequency is one float
    division off exact counts. 100 TB: the code table is |categories|
    rows → broadcast join; both aggregates map-side combine."""
    e = load_table(spark, sf_dir, "events")
    cnt = e.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    tot = cnt.agg(F.sum("n").alias("tot"))
    enc = (
        cnt.crossJoin(F.broadcast(tot))
        .select(
            "event_type",
            "n",
            F.row_number()
            .over(Window.orderBy(F.col("n").desc(), "event_type"))
            .cast("bigint")
            .alias("rank_enc"),
            F.round(F.col("n").cast("double") / F.col("tot"), 6).alias(
                "freq_enc"
            ),
        )
    )
    cents = F.round(F.col("value") * 100).cast("bigint")
    return (
        e.select("event_type", cents.alias("cents"))
        .join(F.broadcast(enc), "event_type")
        .groupBy("rank_enc", "event_type", "n", "freq_enc")
        .agg(F.sum("cents").cast("bigint").alias("total_cents"))
    )


# ---------------------------------------------------------------------------
# reference/audio-math: peak-relative amplitude census
# ---------------------------------------------------------------------------


@query(
    "ref_clip_amplitude_census",
    oracle="""
        WITH a AS (
            SELECT event_type,
                   ABS(CAST(ROUND(value * 100) AS BIGINT)) AS amp
            FROM events
        ),
        pk AS (
            SELECT event_type, CAST(MAX(amp) AS BIGINT) AS peak
            FROM a GROUP BY event_type
        )
        SELECT a.event_type,
               CAST(COUNT(*) AS BIGINT) AS n,
               ROUND(MAX(pk.peak) / 100.0, 2) AS peak_value,
               CAST(SUM(CASE WHEN 10 * a.amp >= 9 * pk.peak
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_near_peak,
               ROUND(CAST(SUM(CASE WHEN 10 * a.amp >= 9 * pk.peak
                                   THEN 1 ELSE 0 END) AS DOUBLE)
                     / COUNT(*), 6) + 0 AS near_peak_ratio
        FROM a JOIN pk ON a.event_type = pk.event_type
        GROUP BY a.event_type
    """,
    tags=("reference", "audio-math", "events"),
)
def ref_clip_amplitude_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PEAK-RELATIVE AMPLITUDE census — the reference normalizes every
    spectrogram against its own maximum (``power_to_db(S, ref=np.max)``,
    reference voice_classifier.py:83), so "how much signal sits within
    10% of peak" is ITS loudness contract re-expressed relationally:
    per event_type, the peak |amplitude| and the share of samples in
    the top decile band. The two-pass global-max-then-compare shape
    is R15's (audio_power_db); here the band predicate is EXACT
    integer arithmetic (10·|cents| ≥ 9·peak — never a float threshold
    off peak·0.9), amplitudes are cents, and the only floats are the
    final display division and ratio. 100 TB: two map-side-combinable
    aggregates over the same scan + a broadcast-sized peak join."""
    e = load_table(spark, sf_dir, "events")
    amp = F.abs(F.round(F.col("value") * 100).cast("bigint"))
    a = e.select("event_type", amp.alias("amp"))
    pk = a.groupBy("event_type").agg(
        F.max("amp").cast("bigint").alias("peak")
    )
    j = a.join(F.broadcast(pk), "event_type")
    near = F.when(10 * F.col("amp") >= 9 * F.col("peak"), 1).otherwise(0)
    return j.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.round(F.max("peak") / 100.0, 2).alias("peak_value"),
        F.sum(near).cast("bigint").alias("n_near_peak"),
        F.round(
            F.sum(near).cast("double") / F.count(F.lit(1)), 6
        ).alias("near_peak_ratio"),
    )


# ---------------------------------------------------------------------------
# range-join: containment nesting depth within a customer's intervals
# ---------------------------------------------------------------------------


@query(
    "join_range_nesting_depth",
    oracle="""
        WITH iv AS (
            SELECT o_orderkey, o_custkey,
                   CAST(date_diff('day', DATE '1970-01-01',
                                  CAST(o_orderdate AS DATE)) AS BIGINT) AS s,
                   CAST(date_diff('day', DATE '1970-01-01',
                                  CAST(o_orderdate AS DATE))
                        + o_orderkey % 7 + 1 AS BIGINT) AS e
            FROM orders
        )
        SELECT a.o_orderkey, a.o_custkey AS custkey,
               CAST(COUNT(*) AS BIGINT) AS depth
        FROM iv a JOIN iv b
          ON a.o_custkey = b.o_custkey
         AND a.o_orderkey <> b.o_orderkey
         AND b.s <= a.s AND a.e <= b.e
        GROUP BY a.o_orderkey, a.o_custkey
    """,
    tags=("join", "range-join", "orders"),
)
def join_range_nesting_depth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERVAL CONTAINMENT DEPTH: how many of the SAME customer's
    other order intervals fully contain each order's interval
    ([orderdate, orderdate + key%7+1 days), half-open) — the nesting
    census an overlap auditor runs before flattening ranges (the
    overlap/point-in-interval siblings measure intersection; this is
    the strictly stronger ⊆ relation). Days are exact integer epoch
    quotients (date_diff — never unix_micros on the TIMESTAMP_NTZ
    order date, which Spark rejects). The self-join carries the
    EQUI-key o_custkey, so Spark shuffles both sides once on custkey
    and containment filters within ~10-row groups — never a cartesian
    (the r08 scale audit class); only contained orders emit (inner
    join + GROUP BY ≡ depth ≥ 1). 100 TB: per-customer groups are
    bounded, so the worst case is the largest single customer, not
    the table."""
    o = load_table(spark, sf_dir, "orders")
    day = F.expr(
        "CAST(datediff(CAST(o_orderdate AS DATE), DATE '1970-01-01') AS BIGINT)"
    )
    iv = o.select(
        "o_orderkey",
        "o_custkey",
        day.alias("s"),
        (day + F.col("o_orderkey") % 7 + 1).cast("bigint").alias("e"),
    )
    a = iv.select(
        F.col("o_orderkey"),
        F.col("o_custkey"),
        F.col("s").alias("as_"),
        F.col("e").alias("ae"),
    )
    b = iv.select(
        F.col("o_orderkey").alias("b_orderkey"),
        F.col("o_custkey").alias("b_custkey"),
        F.col("s").alias("bs"),
        F.col("e").alias("be"),
    )
    j = a.join(
        b,
        (F.col("o_custkey") == F.col("b_custkey"))
        & (F.col("o_orderkey") != F.col("b_orderkey"))
        & (F.col("bs") <= F.col("as_"))
        & (F.col("ae") <= F.col("be")),
    )
    return j.groupBy(
        "o_orderkey", F.col("o_custkey").alias("custkey")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("depth"))


# ---------------------------------------------------------------------------
# session: inter-event gap coefficient of variation per session
# ---------------------------------------------------------------------------

SESSION_GAP_US = 30 * 60 * 1_000_000


@query(
    "events_session_gap_cv",
    oracle=f"""
        WITH seq AS (
            SELECT user_id, event_id, ts,
                   epoch_us(ts) AS us,
                   LAG(epoch_us(ts)) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
            FROM events
        ),
        flagged AS (
            SELECT user_id, event_id, us,
                   CASE WHEN prev_us IS NULL
                             OR us - prev_us > {SESSION_GAP_US}
                        THEN 1 ELSE 0 END AS new_s
            FROM seq
        ),
        sess AS (
            SELECT user_id, event_id, us,
                   CAST(SUM(new_s) OVER (
                       PARTITION BY user_id ORDER BY us, event_id
                       ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sess_idx
            FROM flagged
        ),
        gaps AS (
            SELECT user_id, sess_idx,
                   us - LAG(us) OVER (
                       PARTITION BY user_id, sess_idx
                       ORDER BY us, event_id) AS g
            FROM sess
        ),
        m AS (
            SELECT user_id, sess_idx,
                   CAST(COUNT(g) AS BIGINT) AS n_gaps,
                   CAST(SUM(g) AS BIGINT) AS sg,
                   SUM(CAST(g AS HUGEINT) * g) AS sgg
            FROM gaps GROUP BY user_id, sess_idx
        )
        SELECT user_id, sess_idx, n_gaps, sg AS total_gap_us,
               CASE WHEN sg > 0
                    THEN ROUND(SQRT(GREATEST(
                              CAST(n_gaps AS DOUBLE) * CAST(sgg AS DOUBLE)
                              - CAST(sg AS DOUBLE) * CAST(sg AS DOUBLE), 0.0))
                          / CAST(sg AS DOUBLE), 6) + 0
                    ELSE NULL END AS gap_cv
        FROM m WHERE n_gaps >= 2
    """,
    tags=("events", "session", "window-time", "window"),
)
def events_session_gap_cv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTER-EVENT GAP burstiness per session: the coefficient of
    variation √(n·Σg² − (Σg)²)/Σg of the within-session gaps (the
    population CV off exact integer moments in one radical — CV≈0 is
    metronomic bot cadence, CV≫1 is bursty human reading; the
    level sibling is ``events_session_gap_stats``). Sessions are the
    house 30-minute-gap rule with the (ts, event_id) tiebreak on BOTH
    engines; Σg stays int64 (gaps ≤ 30 min), but Σg² does NOT
    (one 30-min gap squared is 3.2e18 — a third of int64 range), so
    the square accumulates in DECIMAL(38,0)/HUGEINT — the r09-advice
    wrap class caught at design time. GREATEST(…, 0) absorbs the
    equal-gaps catastrophic cancellation (a tiny negative under
    float rounding must not feed SQRT); an all-zero-gap session
    (every event at one timestamp) degrades to NULL via the sg > 0
    CASE on BOTH engines — never an engine-specific 0/0 (the r09
    log-zero advice class, guarded at design time). Only ≥3-event
    sessions emit.
    100 TB: one shuffle on user_id reused by every window; the
    moment aggregate map-side combines."""
    e = load_table(spark, sf_dir, "events")
    us = F.unix_micros("ts")
    wseq = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select("user_id", "event_id", "ts", us.alias("us")).withColumn(
        "prev_us", F.lag("us").over(wseq)
    )
    flagged = seq.withColumn(
        "new_s",
        F.when(
            F.col("prev_us").isNull()
            | ((F.col("us") - F.col("prev_us")) > SESSION_GAP_US),
            1,
        ).otherwise(0),
    )
    wcum = (
        Window.partitionBy("user_id")
        .orderBy("us", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    sess = flagged.withColumn(
        "sess_idx", F.sum("new_s").over(wcum).cast("bigint")
    )
    wg = Window.partitionBy("user_id", "sess_idx").orderBy("us", "event_id")
    gaps = sess.withColumn("g", F.col("us") - F.lag("us").over(wg))
    m = gaps.groupBy("user_id", "sess_idx").agg(
        F.count("g").cast("bigint").alias("n_gaps"),
        F.sum("g").cast("bigint").alias("sg"),
        F.sum(F.col("g").cast("decimal(38,0)") * F.col("g")).alias("sgg"),
    )
    cv = F.sqrt(
        F.greatest(
            F.col("n_gaps").cast("double") * F.col("sgg").cast("double")
            - F.col("sg").cast("double") * F.col("sg").cast("double"),
            F.lit(0.0),
        )
    ) / F.col("sg").cast("double")
    return m.filter(F.col("n_gaps") >= 2).select(
        "user_id",
        "sess_idx",
        "n_gaps",
        F.col("sg").alias("total_gap_us"),
        F.when(F.col("sg") > 0, F.round(cv, 6)).alias("gap_cv"),
    )


# ---------------------------------------------------------------------------
# udtf: per-position digit census of order totals (Benford face)
# ---------------------------------------------------------------------------

DIGIT_MAX_POS = 8
DIGIT_SAMPLE_MOD = 11  # systematic 1-in-11 sample: o_orderkey % 11 = 5


@query(
    "udtf_value_digits",
    oracle=f"""
        WITH c AS (
            SELECT CAST(CAST(ROUND(o_totalprice * 100) AS BIGINT) AS VARCHAR)
                   AS s
            FROM orders WHERE o_orderkey % {DIGIT_SAMPLE_MOD} = 5
        ),
        d AS (
            SELECT CAST(generate_subscripts(string_split_regex(s, ''), 1)
                        AS BIGINT) AS pos,
                   CAST(ascii(UNNEST(string_split_regex(s, ''))) - 48
                        AS BIGINT) AS digit
            FROM c
        )
        SELECT pos, digit, CAST(COUNT(*) AS BIGINT) AS n
        FROM d WHERE pos <= {DIGIT_MAX_POS}
        GROUP BY pos, digit
    """,
    tags=("udtf", "scalar", "math", "orders"),
)
def udtf_value_digits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PER-POSITION DIGIT CENSUS of order totals via a Python UDTF —
    the Benford's-law audit face (position 1 should be log-skewed
    toward small digits on organic monetary data; a uniform leading
    digit is the classic fabricated-data tell): a table function
    walks the decimal-cents string of each total and yields (pos,
    digit) rows, aggregated to a ≤ 8×10-row census over a SYSTEMATIC
    1-in-11 sample (o_orderkey%11=5 — deterministic,
    scale-proportional, and key-stride-free for sequential orderkeys;
    the cap exists because the Python UDTF's per-row emission is the
    scan cost, measured 4.6× wall at 10× rows unsampled, and the
    Arrow UDTF variant benched 6× SLOWER still — batch overhead
    dwarfs these 2-tuple yields). The oracle restates the emission
    with generate_subscripts over a character split — two independent
    formulations of positional digit extraction. Cents are exact;
    counts exact. UDTF siblings: ``udtf_char_trigrams``,
    ``udtf_array_deltas``, ``udtf_session_paths``. 100 TB: the sample
    predicate pushes to the scan; the census map-side combines."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="pos long, digit long")
    class ValueDigits:
        def eval(self, cents: int):
            if cents is None:
                return
            for i, ch in enumerate(str(cents)[:DIGIT_MAX_POS]):
                yield i + 1, ord(ch) - 48

    spark.udtf.register("value_digits", ValueDigits)
    load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderkey") % DIGIT_SAMPLE_MOD == 5
    ).select(
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents")
    ).createOrReplaceTempView("udtf_digit_orders_in")
    return spark.sql(
        """
        SELECT d.pos, d.digit, CAST(COUNT(*) AS BIGINT) AS n
        FROM udtf_digit_orders_in o, LATERAL value_digits(o.cents) d
        GROUP BY d.pos, d.digit
        """
    )


# ---------------------------------------------------------------------------
# udaf: modal value and its share per group (pandas grouped-agg)
# ---------------------------------------------------------------------------


@query(
    "agg_pandas_udaf_mode_share",
    oracle="""
        WITH c AS (
            SELECT event_type, CAST(ROUND(value * 100) AS BIGINT) AS cents
            FROM events
        ),
        g AS (
            SELECT event_type, cents, CAST(COUNT(*) AS BIGINT) AS cnt
            FROM c GROUP BY event_type, cents
        ),
        r AS (
            SELECT event_type, cents, cnt,
                   ROW_NUMBER() OVER (PARTITION BY event_type
                                      ORDER BY cnt DESC, cents ASC) AS rn
            FROM g
        ),
        tot AS (
            SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n
            FROM c GROUP BY event_type
        )
        SELECT tot.event_type, tot.n,
               r.cents AS mode_cents,
               r.cnt AS mode_n,
               ROUND(CAST(r.cnt AS DOUBLE) / tot.n, 6) + 0 AS mode_share
        FROM tot JOIN r ON tot.event_type = r.event_type AND r.rn = 1
    """,
    tags=("aggregate", "udaf", "pandas", "events"),
)
def agg_pandas_udaf_mode_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MODAL VALUE + MODAL SHARE per event_type as a grouped-agg
    pandas UDAF — the discrete-location estimator the quantile
    siblings (midhinge / decile-ratio / MAD) can't give, and the
    degenerate-distribution tell (mode_share → 1 means the column is
    effectively constant; price-point data like cents is exactly
    where the mode is meaningful). Ties break toward the SMALLEST
    value — pinned in the kernel by np.unique's ascending sort (first
    argmax wins) and in the oracle by ORDER BY cnt DESC, cents ASC.
    All exact integers through Arrow; the share is one float division
    off two exact counts (JVM-side — never Python round, the r10
    kernel rule). Row count rides through Arrow too (the n_rows
    pattern — pandas and JVM aggregates can't mix). At 100 TB the
    per-group buffer swaps for the g/r CTE shape the oracle itself
    uses (count-then-rank, map-side combinable)."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def mode_cents(v: pd.Series) -> int:
        vals, counts = np.unique(v.to_numpy(dtype=np.int64), return_counts=True)
        return int(vals[int(np.argmax(counts))])

    @pandas_udf("long")
    def mode_n(v: pd.Series) -> int:
        _, counts = np.unique(v.to_numpy(dtype=np.int64), return_counts=True)
        return int(counts.max())

    @pandas_udf("long")
    def n_rows(v: pd.Series) -> int:
        return len(v)

    e = load_table(spark, sf_dir, "events").select(
        "event_type", F.round(F.col("value") * 100).cast("bigint").alias("cents")
    )
    g = e.groupBy("event_type").agg(
        n_rows("cents").alias("n"),
        mode_cents("cents").alias("mode_cents"),
        mode_n("cents").alias("mode_n"),
    )
    return g.select(
        "event_type",
        "n",
        "mode_cents",
        "mode_n",
        F.round(F.col("mode_n").cast("double") / F.col("n"), 6).alias(
            "mode_share"
        ),
    )


# ---------------------------------------------------------------------------
# csv: pipe-delimited single-quote dialect roundtrip
# ---------------------------------------------------------------------------


@query(
    "sink_csv_pipe_quotechar_roundtrip",
    oracle="""
        WITH x AS (
            SELECT doc_id,
                   'a|' || chr(39) || CAST(doc_id AS VARCHAR) || chr(39)
                   || '|' || source AS tricky
            FROM documents
        )
        SELECT CAST(COUNT(*) AS BIGINT)                        AS n,
               CAST(SUM(length(tricky)) AS BIGINT)             AS total_len,
               CAST(SUM(CASE WHEN tricky LIKE '%|%' THEN 1 ELSE 0 END)
                    AS BIGINT)                                 AS n_with_pipe,
               CAST(SUM(CASE WHEN contains(tricky, chr(39)) THEN 1 ELSE 0 END)
                    AS BIGINT)                                 AS n_with_quote
        FROM x
    """,
    tags=("sink", "csv", "documents"),
)
def sink_csv_pipe_quotechar_roundtrip(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """PIPE-DELIMITED, SINGLE-QUOTE-QUOTED CSV dialect roundtrip:
    fields that embed BOTH the pipe delimiter and the single-quote
    quote character, written with ``sep='|', quote="'"`` and read
    back with the SAME options — the non-default-dialect case where
    writer/reader asymmetry corrupts silently (RFC-double-quote
    sibling: ``sink_csv_escape_roundtrip``; the dialect battery also
    covers TSV / gzip / quote-all / multiLine / null-sentinel). The
    contract aggregates the RECONSTRUCTED values (count, total
    length, delimiter-carrying and quote-carrying rows) against
    parquet truth computed directly by the oracle — any dropped or
    doubled character moves total_len. Per-task write, vectorized
    read."""
    import os as _os

    from big_data_audio_classification_spark.scratch import SCRATCH_DIR

    path = _os.path.join(SCRATCH_DIR, "sink_csv_pipe_quotechar_roundtrip")
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.lit("a|'"),
            F.col("doc_id").cast("string"),
            F.lit("'|"),
            F.col("source"),
        ).alias("tricky"),
    )
    (
        d.write.mode("overwrite")
        .option("header", True)
        .option("sep", "|")
        .option("quote", "'")
        .option("escape", "\\")
        .csv(path)
    )
    back = spark.read.csv(
        path,
        header=True,
        sep="|",
        quote="'",
        escape="\\",
        schema="doc_id long, tricky string",
    )
    return back.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.length("tricky")).cast("bigint").alias("total_len"),
        F.sum(F.when(F.col("tricky").contains("|"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_with_pipe"),
        F.sum(F.when(F.col("tricky").contains("'"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_with_quote"),
    )


# ---------------------------------------------------------------------------
# sql: inline VALUES dimension joined to the fact table
# ---------------------------------------------------------------------------

PRIORITY_WEIGHTS = (
    ("1-URGENT", 5),
    ("2-HIGH", 4),
    ("3-MEDIUM", 3),
    ("4-NOT SPECIFIED", 2),
    ("5-LOW", 1),
    ("9-PHANTOM", 7),  # matches nothing: pins LEFT-JOIN zero semantics
)


def _values_sql() -> str:
    rows = ", ".join(f"('{p}', {w})" for p, w in PRIORITY_WEIGHTS)
    return f"""
        SELECT p.priority, p.weight,
               CAST(COUNT(o.o_orderkey) AS BIGINT) AS n_orders,
               CAST(COUNT(o.o_orderkey) AS BIGINT) * p.weight AS weighted_n,
               CAST(COALESCE(SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT)),
                             0) AS BIGINT) AS total_cents
        FROM (VALUES {rows}) p(priority, weight)
        LEFT JOIN orders o ON o.o_orderpriority = p.priority
        GROUP BY p.priority, p.weight
    """


@query(
    "sql_values_inline_table",
    oracle=_values_sql(),
    tags=("relational", "sql", "orders"),
)
def sql_values_inline_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INLINE ``VALUES`` DIMENSION joined to the fact table — the
    literal-table surface every SQL dialect ships but spells
    differently (Spark: ``FROM VALUES ... AS p(...)``; DuckDB:
    ``(VALUES ...) p(...)``), exercised end-to-end through a LEFT
    join so the dimension drives the result: a phantom priority row
    that matches nothing must still emit with zero counts (the
    silent-empty-group class — COUNT(col) not COUNT(*), COALESCE'd
    sum). Weighted count is exact integer arithmetic off the inline
    weight. 100 TB: a 6-row literal dimension is the canonical
    broadcast side; the fact scan aggregates map-side."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView(
        "sqlvals_orders_in"
    )
    rows = ", ".join(f"('{p}', {w})" for p, w in PRIORITY_WEIGHTS)
    return spark.sql(
        f"""
        SELECT p.priority, p.weight,
               CAST(COUNT(o.o_orderkey) AS BIGINT) AS n_orders,
               CAST(COUNT(o.o_orderkey) AS BIGINT) * p.weight AS weighted_n,
               CAST(COALESCE(SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT)),
                             0) AS BIGINT) AS total_cents
        FROM VALUES {rows} AS p(priority, weight)
        LEFT JOIN sqlvals_orders_in o ON o.o_orderpriority = p.priority
        GROUP BY p.priority, p.weight
        """
    )


# ---------------------------------------------------------------------------
# decomposition: level + day-of-week + residual over daily totals
# ---------------------------------------------------------------------------


@query(
    "analytics_level_dow_rolling_decomp",
    oracle="""
        WITH daily AS (
            SELECT CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
                        AS BIGINT) AS day_num,
                   CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
                       AS c
            FROM events GROUP BY 1
        ),
        w7 AS (
            SELECT day_num, c,
                   CAST(SUM(c) OVER (ORDER BY day_num
                        ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS BIGINT)
                       AS roll,
                   CAST(COUNT(*) OVER (ORDER BY day_num
                        ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS BIGINT)
                       AS cnt7
            FROM daily
        ),
        full7 AS (
            SELECT day_num, c, roll, (day_num + 4) % 7 AS dow,
                   7 * c - roll AS dev7
            FROM w7 WHERE cnt7 = 7
        ),
        dowfx AS (
            SELECT dow, CAST(SUM(dev7) AS BIGINT) AS sum_dev,
                   CAST(COUNT(*) AS BIGINT) AS n_dow
            FROM full7 GROUP BY dow
        )
        SELECT f.day_num, f.dow,
               ROUND(f.c / 100.0, 2) AS day_total,
               ROUND(f.roll / 700.0, 6) + 0 AS level,
               ROUND(CAST(d.sum_dev AS DOUBLE) / d.n_dow / 700.0, 6) + 0
                   AS dow_effect,
               ROUND(f.dev7 / 700.0
                     - CAST(d.sum_dev AS DOUBLE) / d.n_dow / 700.0, 6) + 0
                   AS resid
        FROM full7 f JOIN dowfx d ON f.dow = d.dow
    """,
    tags=("analytics", "decomposition", "rolling", "window", "events"),
)
def analytics_level_dow_rolling_decomp(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """ADDITIVE LEVEL + DAY-OF-WEEK + RESIDUAL decomposition of the
    daily revenue series: level = centered 7-day rolling mean (only
    full windows emit), weekday effect = mean deviation per dow,
    residual = what neither explains — the classic seasonal-naive
    decomposition (STL's integer-exact little sibling; house kin:
    ``analytics_dow_additive_profile``, ``analytics_rolling_seasonal_
    resid``). The trick that keeps it bit-exact: deviations are
    SCALED BY 7 so ``dev7 = 7·c − roll`` stays an exact integer
    (never a float rolling mean subtracted row-wise), and dow is
    computed ARITHMETICALLY as (epoch_day+4)%7 — never an engine
    dayofweek (Spark and DuckDB disagree by +1, the r0x quirk
    class). Every float is one fixed-order expression off exact
    integers, ``+ 0``-guarded (deviations round to −0.0 freely).
    100 TB: daily totals map-side combine; the window runs over
    |days| rows — driver-scale, not data-scale."""
    e = load_table(spark, sf_dir, "events")
    day_num = F.expr(
        "CAST(datediff(CAST(ts AS DATE), DATE '1970-01-01') AS BIGINT)"
    )
    cents = F.round(F.col("value") * 100).cast("bigint")
    daily = e.select(day_num.alias("day_num"), cents.alias("cents")).groupBy(
        "day_num"
    ).agg(F.sum("cents").cast("bigint").alias("c"))
    w7 = Window.orderBy("day_num").rowsBetween(-3, 3)
    wd = daily.select(
        "day_num",
        "c",
        F.sum("c").over(w7).cast("bigint").alias("roll"),
        F.count(F.lit(1)).over(w7).cast("bigint").alias("cnt7"),
    )
    full7 = wd.filter(F.col("cnt7") == 7).select(
        "day_num",
        "c",
        "roll",
        ((F.col("day_num") + 4) % 7).alias("dow"),
        (7 * F.col("c") - F.col("roll")).alias("dev7"),
    )
    dowfx = full7.groupBy("dow").agg(
        F.sum("dev7").cast("bigint").alias("sum_dev"),
        F.count(F.lit(1)).cast("bigint").alias("n_dow"),
    )
    j = full7.join(F.broadcast(dowfx), "dow")
    dow_eff = F.col("sum_dev").cast("double") / F.col("n_dow") / 700.0
    return j.select(
        "day_num",
        "dow",
        F.round(F.col("c") / 100.0, 2).alias("day_total"),
        F.round(F.col("roll") / 700.0, 6).alias("level"),
        F.round(dow_eff, 6).alias("dow_effect"),
        F.round(F.col("dev7") / 700.0 - dow_eff, 6).alias("resid"),
    )


# ---------------------------------------------------------------------------
# causal: Mantel-Haenszel pooled odds ratio across strata
# ---------------------------------------------------------------------------

MH_STRATA = 5


@query(
    "stats_mantel_haenszel_or",
    oracle=f"""
        WITH ut AS (
            SELECT user_id,
                   MAX(CASE WHEN event_type = 'error' AND day(ts) < 3
                            THEN 1 ELSE 0 END) AS t,
                   MAX(CASE WHEN event_type = 'purchase'
                            THEN 1 ELSE 0 END) AS y
            FROM events GROUP BY user_id
        ),
        cells AS (
            SELECT user_id % {MH_STRATA} AS stratum,
                   CAST(SUM(CASE WHEN t = 1 AND y = 1 THEN 1 ELSE 0 END)
                        AS BIGINT) AS a,
                   CAST(SUM(CASE WHEN t = 1 AND y = 0 THEN 1 ELSE 0 END)
                        AS BIGINT) AS b,
                   CAST(SUM(CASE WHEN t = 0 AND y = 1 THEN 1 ELSE 0 END)
                        AS BIGINT) AS c,
                   CAST(SUM(CASE WHEN t = 0 AND y = 0 THEN 1 ELSE 0 END)
                        AS BIGINT) AS d,
                   CAST(COUNT(*) AS BIGINT) AS n_i
            FROM ut GROUP BY user_id % {MH_STRATA}
        ),
        folds AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n_strata,
                   CAST(SUM(n_i) AS BIGINT) AS n_users,
                   CAST(SUM(a) AS BIGINT) AS a_total,
                   list_sum(list(CAST(a * d AS DOUBLE) / n_i
                                 ORDER BY stratum)) AS mh_num,
                   list_sum(list(CAST(b * c AS DOUBLE) / n_i
                                 ORDER BY stratum)) AS mh_den
            FROM cells
        )
        SELECT n_strata, n_users, a_total,
               CASE WHEN mh_den > 0
                    THEN ROUND(mh_num / mh_den, 6) + 0
                    ELSE NULL END AS mh_odds_ratio
        FROM folds
    """,
    tags=("stats", "causal", "inference", "events"),
)
def stats_mantel_haenszel_or(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MANTEL-HAENSZEL POOLED ODDS RATIO: the stratified 2×2
    association estimate Σ(aᵢdᵢ/nᵢ) / Σ(bᵢcᵢ/nᵢ) — the
    confounder-adjusted effect the causal family's IV/DR siblings
    assume away (stratifying on user_id%5 blocks any covariate that
    correlates with the stratum; treatment = an early error event
    (before day 3 — every user has a signup, so signup can't vary),
    outcome = ever-purchased). Each stratum's term is ONE float
    expression off exact integer cells; the two 5-term sums fold
    STRATUM-ORDERED on both engines (Spark sorted-struct fold vs
    DuckDB ordered list_sum — the house cross-row float rule even
    for 5 terms). An all-treated stratum (sf0.001 stratum 1)
    contributes 0 to both sums — the degenerate guard the docstring
    pins; a zero pooled denominator degrades to NULL. 100 TB:
    user-level flags map-side combine; strata are O(1) rows."""
    e = load_table(spark, sf_dir, "events")
    ut = e.groupBy("user_id").agg(
        F.max(
            F.when(
                (F.col("event_type") == "error") & (F.dayofmonth("ts") < 3), 1
            ).otherwise(0)
        ).alias("t"),
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("y"),
    )
    cells = ut.groupBy((F.col("user_id") % MH_STRATA).alias("stratum")).agg(
        F.sum(F.when((F.col("t") == 1) & (F.col("y") == 1), 1).otherwise(0))
        .cast("bigint")
        .alias("a"),
        F.sum(F.when((F.col("t") == 1) & (F.col("y") == 0), 1).otherwise(0))
        .cast("bigint")
        .alias("b"),
        F.sum(F.when((F.col("t") == 0) & (F.col("y") == 1), 1).otherwise(0))
        .cast("bigint")
        .alias("c"),
        F.sum(F.when((F.col("t") == 0) & (F.col("y") == 0), 1).otherwise(0))
        .cast("bigint")
        .alias("d"),
        F.count(F.lit(1)).cast("bigint").alias("n_i"),
    )
    num_t = (F.col("a") * F.col("d")).cast("double") / F.col("n_i")
    den_t = (F.col("b") * F.col("c")).cast("double") / F.col("n_i")
    scored = cells.select("stratum", "n_i", "a", num_t.alias("nt"), den_t.alias("dt"))
    ordered = lambda col: F.transform(  # noqa: E731
        F.array_sort(F.collect_list(F.struct("stratum", col))),
        lambda s: s[col],
    )
    folds = scored.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_strata"),
        F.sum("n_i").cast("bigint").alias("n_users"),
        F.sum("a").cast("bigint").alias("a_total"),
        F.aggregate(ordered("nt"), F.lit(0.0), lambda acc, x: acc + x).alias(
            "mh_num"
        ),
        F.aggregate(ordered("dt"), F.lit(0.0), lambda acc, x: acc + x).alias(
            "mh_den"
        ),
    )
    return folds.select(
        "n_strata",
        "n_users",
        "a_total",
        F.when(
            F.col("mh_den") > 0, F.round(F.col("mh_num") / F.col("mh_den"), 6)
        ).alias("mh_odds_ratio"),
    )


# ---------------------------------------------------------------------------
# skew: top-key concentration profile
# ---------------------------------------------------------------------------

SKEW_TOPK = 10


@query(
    "skew_topk_key_share",
    oracle=f"""
        WITH cnt AS (
            SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events
            FROM events GROUP BY user_id
        ),
        tot AS (SELECT CAST(SUM(n_events) AS BIGINT) AS total FROM cnt),
        rk AS (
            SELECT user_id, n_events,
                   CAST(ROW_NUMBER() OVER (ORDER BY n_events DESC, user_id)
                        AS BIGINT) AS rk,
                   CAST(SUM(n_events) OVER (ORDER BY n_events DESC, user_id
                        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
            FROM cnt
        )
        SELECT rk, user_id, n_events,
               ROUND(CAST(n_events AS DOUBLE) / tot.total, 6) AS share,
               ROUND(CAST(cum AS DOUBLE) / tot.total, 6) AS cum_share
        FROM rk, tot WHERE rk <= {SKEW_TOPK}
    """,
    tags=("skew", "scale", "topk", "events"),
)
def skew_topk_key_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TOP-KEY CONCENTRATION profile: the 10 heaviest user_ids with
    per-key and CUMULATIVE share of all events — the skew diagnosis
    that decides whether a shuffle needs salting (cum_share(10) ≈ 1
    means ten keys own the stage; the distribution-level siblings:
    ``skew_key_gini_imbalance`` for the Gini, ``skew_salt_
    effectiveness`` for the fix's effect). Counts and the running
    cumulative are exact integers (the int-window-sum is BIGINT-cast
    on the oracle side — the r05 HUGEINT fetch class); shares are
    one division each off the exact total. Full (count, user_id)
    tiebreak. 100 TB: one map-side-combinable count + a 10-row
    top-k — the profile itself never shuffles the fact table
    twice."""
    e = load_table(spark, sf_dir, "events")
    cnt = e.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events")
    )
    tot = cnt.agg(F.sum("n_events").cast("bigint").alias("total"))
    w = Window.orderBy(F.col("n_events").desc(), "user_id")
    wc = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    rk = cnt.select(
        F.row_number().over(w).cast("bigint").alias("rk"),
        "user_id",
        "n_events",
        F.sum("n_events").over(wc).cast("bigint").alias("cum"),
    )
    return (
        rk.filter(F.col("rk") <= SKEW_TOPK)
        .crossJoin(F.broadcast(tot))
        .select(
            "rk",
            "user_id",
            "n_events",
            F.round(F.col("n_events").cast("double") / F.col("total"), 6)
            .alias("share"),
            F.round(F.col("cum").cast("double") / F.col("total"), 6)
            .alias("cum_share"),
        )
    )
