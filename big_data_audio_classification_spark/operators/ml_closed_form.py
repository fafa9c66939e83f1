"""Closed-form distributed ML: multi-feature OLS solved from
single-pass sufficient statistics, and a multinomial naive-Bayes
classifier expressed entirely as relational aggregates.

These complement the MLlib paths (ml.py fits, ml_inference.py
pipelines) with the "ML as a query" idiom that actually scales to
100 TB: when the model has a closed form, the whole fit is ONE
aggregation pass — no iterative driver program, no parameter server,
and the math is restatable in ANSI SQL so the DuckDB gate can verify
the distributed fit value-for-value (which it cannot for MLlib's
iterative solvers). Reference analog: the feature-scoring +
model-selection steps of `/root/reference/src/voice_classifier.py:150`
(score features, pick the best) re-expressed as algebra the optimizer
can push map-side.

Scale notes:
* OLS: var_pop/covar_pop are algebraic moments — map-side partials,
  one shuffle on the group key, O(groups) output. The 2-feature normal
  equations invert analytically (Cramer on the centered Gram matrix);
  centering via covariances (not raw Σx²) keeps the system
  well-conditioned at any magnitude.
* Naive Bayes: train = two token-keyed aggregations (class priors,
  per-(class, token) counts with add-1 smoothing); score = explode
  tokens ×k classes, LEFT join the class-conditional table (vocab ×
  classes — broadcastable), one per-(doc, class) sum, one per-doc
  argmax window. Text itself never shuffles — only (doc_id, tok)
  pairs move.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from big_data_audio_classification_spark.registry import query
from big_data_audio_classification_spark.sources.catalog import load_table


@query(
    "ml_ols_normal_equations",
    oracle="""
        WITH s AS (
            SELECT l_returnflag,
                   CAST(COUNT(*) AS BIGINT)                    AS n,
                   AVG(l_quantity)                             AS mx1,
                   AVG(l_discount)                             AS mx2,
                   AVG(l_extendedprice)                        AS my,
                   covar_pop(l_quantity, l_extendedprice)      AS c1y,
                   covar_pop(l_discount, l_extendedprice)      AS c2y,
                   covar_pop(l_quantity, l_discount)           AS c12,
                   var_pop(l_quantity)                         AS v1,
                   var_pop(l_discount)                         AS v2,
                   var_pop(l_extendedprice)                    AS vy
            FROM lineitem GROUP BY l_returnflag
        )
        SELECT l_returnflag, n,
               ROUND((c1y*v2 - c2y*c12) / (v1*v2 - c12*c12), 6) AS beta_qty,
               ROUND((c2y*v1 - c1y*c12) / (v1*v2 - c12*c12), 6) AS beta_disc,
               ROUND(my - (c1y*v2 - c2y*c12) / (v1*v2 - c12*c12) * mx1
                        - (c2y*v1 - c1y*c12) / (v1*v2 - c12*c12) * mx2, 4)
                   AS beta0,
               ROUND(((c1y*v2 - c2y*c12) * c1y + (c2y*v1 - c1y*c12) * c2y)
                     / ((v1*v2 - c12*c12) * vy), 8) AS r2
        FROM s
    """,
    tags=("ml", "regression", "aggregate", "closed-form"),
)
def ml_ols_normal_equations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-feature OLS (price ~ quantity + discount) per return flag,
    solved in closed form from ONE aggregation pass: the centered
    normal equations ``C·β = c_y`` inverted by Cramer's rule on the
    2×2 covariance matrix; intercept recovered from the means, R² =
    β·c_y / var(y).

    Everything is an algebraic moment — partial-aggregable, one
    shuffle, O(groups) rows out. This is the fit MLlib's iterative
    LinearRegression converges to, computed exactly in one scan and
    cross-engine verified (the gate can't do that for an iterative
    solver)."""
    li = load_table(spark, sf_dir, "lineitem")
    x1, x2, y = F.col("l_quantity"), F.col("l_discount"), F.col("l_extendedprice")
    s = li.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.avg(x1).alias("mx1"),
        F.avg(x2).alias("mx2"),
        F.avg(y).alias("my"),
        F.covar_pop(x1, y).alias("c1y"),
        F.covar_pop(x2, y).alias("c2y"),
        F.covar_pop(x1, x2).alias("c12"),
        F.var_pop(x1).alias("v1"),
        F.var_pop(x2).alias("v2"),
        F.var_pop(y).alias("vy"),
    )
    det = F.col("v1") * F.col("v2") - F.col("c12") * F.col("c12")
    b1 = (F.col("c1y") * F.col("v2") - F.col("c2y") * F.col("c12")) / det
    b2 = (F.col("c2y") * F.col("v1") - F.col("c1y") * F.col("c12")) / det
    return s.select(
        "l_returnflag",
        "n",
        F.round(b1, 6).alias("beta_qty"),
        F.round(b2, 6).alias("beta_disc"),
        F.round(
            F.col("my") - b1 * F.col("mx1") - b2 * F.col("mx2"), 4
        ).alias("beta0"),
        F.round(
            (b1 * F.col("c1y") + b2 * F.col("c2y")) / F.col("vy"), 8
        ).alias("r2"),
    )


@query(
    "ml_naive_bayes_tokens",
    oracle="""
        WITH toks AS (
            SELECT doc_id, lang,
                   UNNEST(list_filter(string_split(text, ' '),
                          t -> t <> '')) AS tok
            FROM documents
        ),
        cls AS (
            SELECT lang AS c, CAST(COUNT(*) AS DOUBLE) AS nd
            FROM documents GROUP BY lang
        ),
        tot AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_all FROM documents),
        vocab AS (SELECT CAST(COUNT(DISTINCT tok) AS DOUBLE) AS v FROM toks),
        wc AS (
            SELECT lang AS c, tok, CAST(COUNT(*) AS DOUBLE) AS cnt
            FROM toks GROUP BY lang, tok
        ),
        ctot AS (SELECT c, SUM(cnt) AS ctoks FROM wc GROUP BY c),
        scored AS (
            SELECT t.doc_id, t.lang AS actual, cls.c,
                   ROUND(SUM(LN((COALESCE(wc.cnt, 0) + 1)
                                / (ctot.ctoks + vocab.v)))
                         + LN(cls.nd / tot.n_all), 6) AS score
            FROM toks t
            CROSS JOIN cls
            JOIN ctot ON ctot.c = cls.c
            CROSS JOIN vocab
            CROSS JOIN tot
            LEFT JOIN wc ON wc.c = cls.c AND wc.tok = t.tok
            GROUP BY t.doc_id, t.lang, cls.c, cls.nd, ctot.ctoks,
                     vocab.v, tot.n_all
        ),
        pred AS (
            SELECT doc_id, actual, c AS pred_lang,
                   ROW_NUMBER() OVER (
                       PARTITION BY doc_id ORDER BY score DESC, c
                   ) AS rk
            FROM scored
        )
        SELECT actual AS lang, pred_lang, COUNT(*) AS n_docs
        FROM pred WHERE rk = 1
        GROUP BY actual, pred_lang
    """,
    tags=("ml", "text", "classifier", "documents", "closed-form"),
)
def ml_naive_bayes_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multinomial naive Bayes (predict ``lang`` from tokens, add-1
    smoothing, resubstitution eval) as pure aggregates: class priors +
    per-(class, token) likelihoods from two groupBys; scoring explodes
    each document's tokens × k classes, LEFT-joins the broadcastable
    class-conditional table, sums log-probabilities per (doc, class),
    and takes the per-doc argmax (score rounded before ranking, class
    name as tiebreak — cross-engine deterministic). Output is the
    k×k confusion rollup.

    Scale: only (doc_id, tok) pairs shuffle; the likelihood table is
    vocab×k (broadcast), priors/vocab-size are scalar broadcasts, and
    the argmax window partitions by doc_id."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        "lang",
        F.explode(
            F.filter(F.split("text", " "), lambda t: t != "")
        ).alias("tok"),
    )
    cls = docs.groupBy(F.col("lang").alias("c")).agg(
        F.count("*").cast("double").alias("nd")
    )
    tot = docs.agg(F.count("*").cast("double").alias("n_all"))
    vocab = toks.agg(F.countDistinct("tok").cast("double").alias("v"))
    wc = toks.groupBy(F.col("lang").alias("c"), "tok").agg(
        F.count("*").cast("double").alias("cnt")
    )
    ctot = wc.groupBy("c").agg(F.sum("cnt").alias("ctoks"))
    # collapse to term frequencies BEFORE the ×k class explode: a token
    # appearing tf times contributes tf·ln(p) — identical sum, but the
    # scored relation shrinks from (total tokens × k) to (distinct
    # tokens per doc × k) rows. The oracle states the per-occurrence
    # form; the values agree exactly (the 1e-6 rounding absorbs the
    # re-associated float sum).
    dtf = toks.groupBy("doc_id", "lang", "tok").agg(
        F.count("*").cast("double").alias("tf")
    )
    scored = (
        dtf.alias("t")
        .crossJoin(F.broadcast(cls))
        .join(F.broadcast(ctot), "c")
        .crossJoin(F.broadcast(vocab))
        .crossJoin(F.broadcast(tot))
        .join(
            F.broadcast(
                wc.select(
                    F.col("c").alias("wc_c"),
                    F.col("tok").alias("wc_tok"),
                    "cnt",
                )
            ),
            (F.col("wc_c") == F.col("c")) & (F.col("wc_tok") == F.col("t.tok")),
            "left",
        )
        .groupBy(
            F.col("t.doc_id").alias("doc_id"),
            F.col("t.lang").alias("actual"),
            "c",
            "nd",
            "ctoks",
            "v",
            "n_all",
        )
        .agg(
            F.round(
                F.sum(
                    F.col("tf")
                    * F.ln(
                        (F.coalesce(F.col("cnt"), F.lit(0.0)) + 1)
                        / (F.col("ctoks") + F.col("v"))
                    )
                )
                + F.ln(F.col("nd") / F.col("n_all")),
                6,
            ).alias("score")
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("score").desc(), F.col("c"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") == 1)
        .groupBy(F.col("actual").alias("lang"), F.col("c").alias("pred_lang"))
        .agg(F.count("*").alias("n_docs"))
    )


@query(
    "ml_isotonic_minimax",
    oracle="""
        WITH mo AS (
            SELECT CAST((EXTRACT(YEAR FROM o_orderdate) - 1995) * 12
                        + EXTRACT(MONTH FROM o_orderdate) - 1 AS BIGINT) AS m,
                   COUNT(*) AS n,
                   SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS s
            FROM orders GROUP BY 1
        ),
        pref AS (
            SELECT m, n, s,
                   SUM(s) OVER (ORDER BY m) AS cs,
                   SUM(n) OVER (ORDER BY m) AS cn
            FROM mo
        ),
        iv AS (
            SELECT a.m AS i, b.m AS j,
                   CAST(b.cs - (a.cs - a.s) AS DOUBLE)
                       / (b.cn - (a.cn - a.n)) / 100.0 AS avg_ij
            FROM pref a JOIN pref b ON a.m <= b.m
        ),
        sm AS (
            SELECT i, j,
                   MIN(avg_ij) OVER (PARTITION BY i ORDER BY j DESC) AS mn
            FROM iv
        ),
        fit AS (SELECT j AS m, MAX(mn) AS fit_raw FROM sm GROUP BY j)
        SELECT mo.m AS month_idx,
               mo.n AS n_orders,
               ROUND(CAST(mo.s AS DOUBLE) / 100.0 / mo.n, 6) AS y_mean,
               ROUND(fit.fit_raw, 6) AS fit_isotonic
        FROM mo JOIN fit ON mo.m = fit.m
    """,
    tags=("ml", "regression", "isotonic", "closed-form", "orders"),
)
def ml_isotonic_minimax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted isotonic (monotone non-decreasing) regression of mean
    monthly order value vs month index, solved in CLOSED FORM by the
    minimax identity ŷ_k = max_{i≤k} min_{j≥k} avg(y_i..y_j) — the
    exact PAVA (pool-adjacent-violators) solution without PAVA's
    sequential pooling loop, so it is expressible as pure windows and
    cross-engine verifiable (a pytest proves minimax == numpy PAVA).

    The 100 TB shape: raw orders collapse to the calendar-bounded MONTH
    spine first (one aggregation); the interval-average table is built
    from integer-exact prefix sums over that ~80-row spine, the suffix
    min is one i-partitioned window over the ≤k² interval grid, and the
    final max is a j-keyed aggregation of the same grid. Every division
    is exact-int/exact-int → double, so min/max comparisons are
    bit-identical in both engines."""
    o = load_table(spark, sf_dir, "orders")
    mo = o.groupBy(
        (
            (F.year("o_orderdate") - 1995) * 12 + F.month("o_orderdate") - 1
        )
        .cast("bigint")
        .alias("m")
    ).agg(
        F.count("*").alias("n"),
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint")).alias("s"),
    )
    wp = Window.orderBy("m")
    pref = mo.select(
        "m", "n", "s",
        F.sum("s").over(wp).alias("cs"),
        F.sum("n").over(wp).alias("cn"),
    )
    a = pref.select(
        F.col("m").alias("i"),
        (F.col("cs") - F.col("s")).alias("s_before"),
        (F.col("cn") - F.col("n")).alias("n_before"),
    )
    b = pref.select(
        F.col("m").alias("j"), F.col("cs").alias("cs_j"), F.col("cn").alias("cn_j")
    )
    iv = a.join(b, F.col("i") <= F.col("j")).select(
        "i", "j",
        (
            (F.col("cs_j") - F.col("s_before")).cast("double")
            / (F.col("cn_j") - F.col("n_before"))
            / 100.0
        ).alias("avg_ij"),
    )
    wsuf = Window.partitionBy("i").orderBy(F.col("j").desc())
    sm = iv.withColumn("mn", F.min("avg_ij").over(wsuf))
    fit = sm.groupBy(F.col("j").alias("m")).agg(F.max("mn").alias("fit_raw"))
    return mo.join(fit, "m").select(
        F.col("m").alias("month_idx"),
        F.col("n").alias("n_orders"),
        F.round(F.col("s").cast("double") / 100.0 / F.col("n"), 6).alias("y_mean"),
        F.round(F.col("fit_raw"), 6).alias("fit_isotonic"),
    )


STUMP_BINS = 128  # histogram resolution for split finding


@query(
    "ml_decision_stump",
    oracle=f"""
        WITH bounds AS (
            SELECT MIN(l_extendedprice) AS lo, MAX(l_extendedprice) AS hi
            FROM lineitem
        ),
        hist AS (
            SELECT LEAST({STUMP_BINS - 1},
                         CAST(FLOOR((l.l_extendedprice - b.lo)
                                    / ((b.hi - b.lo) / {STUMP_BINS}))
                              AS BIGINT)) AS bin,
                   COUNT(*) AS n,
                   SUM(CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END) AS p
            FROM lineitem l, bounds b
            GROUP BY 1
        ),
        cum AS (
            SELECT bin,
                   SUM(n) OVER (ORDER BY bin ROWS UNBOUNDED PRECEDING) AS nl,
                   SUM(p) OVER (ORDER BY bin ROWS UNBOUNDED PRECEDING) AS pl,
                   SUM(n) OVER () AS nt,
                   SUM(p) OVER () AS pt
            FROM hist
        ),
        cand AS (
            SELECT bin, nl, pl, nt - nl AS nr, pt - pl AS pr, nt, pt,
                   (nl * (1.0 - POWER(pl * 1.0 / nl, 2)
                              - POWER((nl - pl) * 1.0 / nl, 2))
                    + (nt - nl) * (1.0 - POWER((pt - pl) * 1.0 / (nt - nl), 2)
                              - POWER(((nt - nl) - (pt - pl)) * 1.0
                                      / (nt - nl), 2))) / nt AS gini_w
            FROM cum WHERE nl > 0 AND nt - nl > 0
        ),
        best AS (
            SELECT * FROM cand ORDER BY gini_w, bin LIMIT 1
        )
        SELECT CAST(bin AS BIGINT) AS split_bin,
               ROUND((SELECT lo FROM bounds)
                     + (bin + 1) * (((SELECT hi FROM bounds)
                                     - (SELECT lo FROM bounds))
                                    / {STUMP_BINS}), 6) AS split_value,
               CAST(nl AS BIGINT) AS n_left,
               CAST(nr AS BIGINT) AS n_right,
               CAST(pl AS BIGINT) AS pos_left,
               CAST(pr AS BIGINT) AS pos_right,
               ROUND(1.0 - POWER(pt * 1.0 / nt, 2)
                         - POWER((nt - pt) * 1.0 / nt, 2), 6) AS gini_root,
               ROUND(gini_w, 6) AS gini_split,
               ROUND(1.0 - POWER(pt * 1.0 / nt, 2)
                         - POWER((nt - pt) * 1.0 / nt, 2) - gini_w, 6) AS gain
        FROM best
    """,
    tags=("ml", "classifier", "tree", "closed-form"),
)
def ml_decision_stump(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Histogram-based decision-stump induction (is this line item a
    return?) — the split-finding kernel of every gradient-boosted-tree
    system (XGBoost approx / LightGBM) expressed as pure relational
    aggregation, so the exact best split on 100 TB costs two scans and
    a 128-row window.

    Phase 1 computes the global feature range (1-row broadcast); phase
    2 folds the fact table into a 128-bin (count, positives)
    histogram — algebraic, map-side combined, one shuffle of at most
    128 rows. Every candidate threshold's weighted Gini impurity
    then comes from cumulative sums OVER the tiny histogram: the
    O(n * candidates) naive search collapses to O(n + bins). The split
    decision (argmin weighted Gini, ties to the lowest bin) and the
    root-impurity gain are exact integer-count algebra, shared
    verbatim with the oracle; empty-side candidates are excluded.

    Reference analog: the feature-scoring + best-feature argmax of
    `/root/reference/src/voice_classifier.py:150-153`, upgraded from
    scoring whole columns to scoring every threshold within a column.
    """
    li = load_table(spark, sf_dir, "lineitem")
    bounds = li.agg(
        F.min("l_extendedprice").alias("lo"),
        F.max("l_extendedprice").alias("hi"),
    )
    width = (F.col("hi") - F.col("lo")) / STUMP_BINS
    hist = (
        li.crossJoin(F.broadcast(bounds))
        .select(
            F.least(
                F.lit(STUMP_BINS - 1),
                F.floor((F.col("l_extendedprice") - F.col("lo")) / width),
            ).alias("bin"),
            (F.col("l_returnflag") == "R").cast("bigint").alias("y"),
        )
        .groupBy("bin")
        .agg(F.count("*").alias("n"), F.sum("y").alias("p"))
    )
    wcum = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    wall = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cum = hist.select(
        "bin",
        F.sum("n").over(wcum).alias("nl"),
        F.sum("p").over(wcum).alias("pl"),
        F.sum("n").over(wall).alias("nt"),
        F.sum("p").over(wall).alias("pt"),
    )

    def gini(pos, n):
        return (
            1.0
            - F.pow(pos * 1.0 / n, 2)
            - F.pow((n - pos) * 1.0 / n, 2)
        )

    nl, pl = F.col("nl"), F.col("pl")
    nr, pr = F.col("nt") - F.col("nl"), F.col("pt") - F.col("pl")
    cand = cum.filter((nl > 0) & (nr > 0)).select(
        "bin", "nl", "pl", "nt", "pt",
        nr.alias("nr"), pr.alias("pr"),
        ((nl * gini(pl, nl) + nr * gini(pr, nr)) / F.col("nt")).alias(
            "gini_w"
        ),
    )
    best = cand.orderBy("gini_w", "bin").limit(1)
    root = gini(F.col("pt"), F.col("nt"))
    return best.crossJoin(F.broadcast(bounds)).select(
        F.col("bin").cast("bigint").alias("split_bin"),
        F.round(
            F.col("lo") + (F.col("bin") + 1) * width, 6
        ).alias("split_value"),
        F.col("nl").cast("bigint").alias("n_left"),
        F.col("nr").cast("bigint").alias("n_right"),
        F.col("pl").cast("bigint").alias("pos_left"),
        F.col("pr").cast("bigint").alias("pos_right"),
        F.round(root, 6).alias("gini_root"),
        F.round(F.col("gini_w"), 6).alias("gini_split"),
        F.round(root - F.col("gini_w"), 6).alias("gain"),
    )


# --- Logistic regression: one exact IRLS / Newton step ----------------

IRLS_PRICE_SCALE = 1e-7  # cents -> $100k units, keeps XtX well-conditioned


@query(
    "ml_logistic_irls_step",
    oracle=f"""
        WITH base AS (
            SELECT CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y,
                   CAST(ROUND(o_totalprice * 100) AS BIGINT) AS c,
                   CAST(year(o_orderdate) - 1995 AS BIGINT) AS yr
            FROM orders
        ),
        s AS (
            SELECT CAST(COUNT(*) AS DOUBLE) AS n,
                   CAST(SUM(y) AS DOUBLE) AS sy,
                   CAST(SUM(c) AS DOUBLE) * {IRLS_PRICE_SCALE} AS a12,
                   CAST(SUM(yr) AS DOUBLE) AS a13,
                   CAST(SUM(c * c) AS DOUBLE)
                       * {IRLS_PRICE_SCALE} * {IRLS_PRICE_SCALE} AS a22,
                   CAST(SUM(c * yr) AS DOUBLE) * {IRLS_PRICE_SCALE} AS a23,
                   CAST(SUM(yr * yr) AS DOUBLE) AS a33,
                   CAST(SUM(y * c) AS DOUBLE) * {IRLS_PRICE_SCALE} AS syc,
                   CAST(SUM(y * yr) AS DOUBLE) AS syyr
            FROM base
        ),
        m AS (
            SELECT n, sy,
                   n AS a11, a12, a13, a22, a23, a33,
                   sy - n / 2 AS g1,
                   syc - a12 / 2 AS g2,
                   syyr - a13 / 2 AS g3,
                   a22 * a33 - a23 * a23 AS c11,
                   a13 * a23 - a12 * a33 AS c12,
                   a12 * a23 - a13 * a22 AS c13,
                   n * a33 - a13 * a13 AS c22,
                   a12 * a13 - n * a23 AS c23,
                   n * a22 - a12 * a12 AS c33
            FROM s
        )
        SELECT CAST(n AS BIGINT) AS n,
               CAST(sy AS BIGINT) AS n_pos,
               ROUND(4 * (c11 * g1 + c12 * g2 + c13 * g3)
                     / (a11 * c11 + a12 * c12 + a13 * c13), 6) AS beta0,
               ROUND(4 * (c12 * g1 + c22 * g2 + c23 * g3)
                     / (a11 * c11 + a12 * c12 + a13 * c13), 6) AS beta_price,
               ROUND(4 * (c13 * g1 + c23 * g2 + c33 * g3)
                     / (a11 * c11 + a12 * c12 + a13 * c13), 6) AS beta_year
        FROM m
    """,
    tags=("ml", "classifier", "logistic", "closed-form", "aggregate"),
)
def ml_logistic_irls_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One exact IRLS (Newton) step of logistic regression — is the
    order fulfilled? ~ (price, order year) — from beta = 0, where the
    step has the closed form ``4 (X'X)^-1 X'(y - 1/2)`` (at beta=0
    every weight is p(1-p) = 1/4). This is the distributed-sufficient-
    statistics pattern every data-parallel GLM solver uses: the fact
    table folds into nine algebraic moments (one map-side-combined
    aggregate), and the 3x3 Newton solve runs on the single moment row
    via the adjugate — no per-row coefficients ever shuffle.

    Determinism across engines: y, price cents, and year offsets are
    exact integers, so every moment is an exact integer sum (Spark
    sums the squared-cents column as decimal; DuckDB promotes to
    HUGEINT) cast to double once — both engines then evaluate the
    identical IEEE expression tree. Further IRLS steps would need
    per-row sigmoid weights (order-dependent double sums), which is
    exactly why the cross-engine contract pins the ONE provably exact
    step; MLlib's LogisticRegression is the iterative continuation.

    Reference analog: the model-fitting stage of
    /root/reference/src/voice_classifier.py:229-265, restated as the
    aggregate form a 100 TB GLM fit actually ships.
    """
    o = load_table(spark, sf_dir, "orders")
    y = (F.col("o_orderstatus") == "F").cast("bigint")
    c = F.round(F.col("o_totalprice") * 100).cast("bigint")
    yr = (F.year("o_orderdate") - 1995).cast("bigint")
    base = o.select(y.alias("y"), c.alias("c"), yr.alias("yr"))
    dec = F.col("c").cast("decimal(19,0)")
    s = base.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("y").cast("double").alias("sy"),
        (F.sum("c").cast("double") * IRLS_PRICE_SCALE).alias("a12"),
        F.sum("yr").cast("double").alias("a13"),
        (F.sum(dec * dec).cast("double") * IRLS_PRICE_SCALE * IRLS_PRICE_SCALE).alias(
            "a22"
        ),
        (F.sum(F.col("c") * F.col("yr")).cast("double") * IRLS_PRICE_SCALE).alias(
            "a23"
        ),
        F.sum(F.col("yr") * F.col("yr")).cast("double").alias("a33"),
        (F.sum(F.col("y") * F.col("c")).cast("double") * IRLS_PRICE_SCALE).alias(
            "syc"
        ),
        F.sum(F.col("y") * F.col("yr")).cast("double").alias("syyr"),
    )
    a11, a12, a13 = F.col("n"), F.col("a12"), F.col("a13")
    a22, a23, a33 = F.col("a22"), F.col("a23"), F.col("a33")
    m = s.select(
        "n",
        "sy",
        (F.col("sy") - F.col("n") / 2).alias("g1"),
        (F.col("syc") - a12 / 2).alias("g2"),
        (F.col("syyr") - a13 / 2).alias("g3"),
        (a22 * a33 - a23 * a23).alias("c11"),
        (a13 * a23 - a12 * a33).alias("c12"),
        (a12 * a23 - a13 * a22).alias("c13"),
        (a11 * a33 - a13 * a13).alias("c22"),
        (a12 * a13 - a11 * a23).alias("c23"),
        (a11 * a22 - a12 * a12).alias("c33"),
        a12.alias("a12"),
        a13.alias("a13"),
    )
    det = (
        F.col("n") * F.col("c11") + F.col("a12") * F.col("c12")
        + F.col("a13") * F.col("c13")
    )
    return m.select(
        F.col("n").cast("bigint").alias("n"),
        F.col("sy").cast("bigint").alias("n_pos"),
        F.round(
            4 * (F.col("c11") * F.col("g1") + F.col("c12") * F.col("g2")
                 + F.col("c13") * F.col("g3")) / det, 6
        ).alias("beta0"),
        F.round(
            4 * (F.col("c12") * F.col("g1") + F.col("c22") * F.col("g2")
                 + F.col("c23") * F.col("g3")) / det, 6
        ).alias("beta_price"),
        F.round(
            4 * (F.col("c13") * F.col("g1") + F.col("c23") * F.col("g2")
                 + F.col("c33") * F.col("g3")) / det, 6
        ).alias("beta_year"),
    )


# --- Gradient boosting: two exact histogram-split residual rounds -----

GBT_LR = 0.5  # shrinkage applied to the round-1 stump before round 2


@query(
    "ml_gbt_residual_rounds",
    oracle=f"""
        WITH base AS (
            SELECT CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS y,
                   CAST(l_quantity AS BIGINT) AS qb,
                   CAST(ROUND(l_discount * 100) AS BIGINT) AS db
            FROM lineitem
        ),
        u AS (
            SELECT 'qty' AS f, qb AS bin, y, qb, db FROM base
            UNION ALL
            SELECT 'disc' AS f, db AS bin, y, qb, db FROM base
        ),
        tot AS (
            SELECT CAST(COUNT(*) AS DOUBLE) AS nt,
                   CAST(SUM(y) AS DOUBLE) AS st
            FROM base
        ),
        hist1 AS (
            SELECT f, bin, COUNT(*) AS n, SUM(y) AS s FROM u GROUP BY 1, 2
        ),
        cum1 AS (
            SELECT f, bin,
                   CAST(SUM(n) OVER w AS DOUBLE) AS nl,
                   CAST(SUM(s) OVER w AS DOUBLE) AS sl
            FROM hist1
            WINDOW w AS (PARTITION BY f ORDER BY bin ROWS UNBOUNDED PRECEDING)
        ),
        cand1 AS (
            SELECT f, bin, nl, sl, nt, st,
                   POWER(sl - nl * (st / nt), 2) / nl
                   + POWER((st - sl) - (nt - nl) * (st / nt), 2) / (nt - nl)
                       AS gain
            FROM cum1, tot WHERE nl > 0 AND nt - nl > 0
        ),
        r1 AS (
            SELECT f, bin, nl, sl, nt, st, gain,
                   st / nt AS p0,
                   (sl - nl * (st / nt)) / nl AS vl,
                   ((st - sl) - (nt - nl) * (st / nt)) / (nt - nl) AS vr
            FROM cand1 ORDER BY gain DESC, f, bin LIMIT 1
        ),
        hist2 AS (
            SELECT u.f, u.bin, COUNT(*) AS n, SUM(u.y) AS s,
                   SUM(CASE WHEN (r.f = 'qty' AND u.qb <= r.bin)
                              OR (r.f = 'disc' AND u.db <= r.bin)
                       THEN 1 ELSE 0 END) AS na
            FROM u, r1 r GROUP BY 1, 2
        ),
        cum2 AS (
            SELECT f, bin,
                   CAST(SUM(n) OVER w AS DOUBLE) AS nl2,
                   CAST(SUM(s) OVER w AS DOUBLE) AS sl2,
                   CAST(SUM(na) OVER w AS DOUBLE) AS nal2
            FROM hist2
            WINDOW w AS (PARTITION BY f ORDER BY bin ROWS UNBOUNDED PRECEDING)
        ),
        cand2 AS (
            SELECT c.f, c.bin, c.nl2, r.nt,
                   c.sl2 - c.nl2 * r.p0
                   - {GBT_LR} * (c.nal2 * r.vl + (c.nl2 - c.nal2) * r.vr)
                       AS rsl,
                   (r.st - c.sl2) - (r.nt - c.nl2) * r.p0
                   - {GBT_LR} * ((r.nl - c.nal2) * r.vl
                                 + ((r.nt - c.nl2) - (r.nl - c.nal2)) * r.vr)
                       AS rsr
            FROM cum2 c, r1 r WHERE c.nl2 > 0 AND r.nt - c.nl2 > 0
        ),
        best2 AS (
            SELECT f, bin, nl2, nt,
                   rsl / nl2 AS vl, rsr / (nt - nl2) AS vr,
                   POWER(rsl, 2) / nl2 + POWER(rsr, 2) / (nt - nl2) AS gain
            FROM cand2 ORDER BY gain DESC, f, bin LIMIT 1
        )
        SELECT * FROM (
            SELECT CAST(1 AS BIGINT) AS rnd, f AS feature,
                   CAST(bin AS BIGINT) AS split_bin,
                   CAST(nl AS BIGINT) AS n_left,
                   CAST(nt - nl AS BIGINT) AS n_right,
                   ROUND(vl / 100, 4) AS leaf_left,
                   ROUND(vr / 100, 4) AS leaf_right,
                   ROUND(gain / nt / 10000, 4) AS mean_gain
            FROM r1
            UNION ALL
            SELECT CAST(2 AS BIGINT), f, CAST(bin AS BIGINT),
                   CAST(nl2 AS BIGINT), CAST(nt - nl2 AS BIGINT),
                   ROUND(vl / 100, 4), ROUND(vr / 100, 4),
                   ROUND(gain / nt / 10000, 4)
            FROM best2
        ) ORDER BY rnd
    """,
    tags=("ml", "regression", "tree", "boosting", "closed-form"),
)
def ml_gbt_residual_rounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two rounds of depth-1 gradient boosting (squared loss) on line-
    item price with histogram split finding over quantity and discount
    — the training kernel of XGBoost/LightGBM expressed relationally.
    Round 1 fits the best stump to the mean-centered target across
    BOTH feature histograms; round 2 re-fits against the residual left
    by the shrunk (lr=0.5) round-1 stump, choosing feature and
    threshold again. Every residual sum is reconstructed from exact
    integer (count, sum-of-cents) histograms — residuals are never
    materialized per row, which is what makes a boosting round on
    100 TB cost one map-side-combined histogram aggregate plus a
    window over <=61 bins, independent of row count. The fact is
    scanned ONCE (r10): both rounds' histograms — and the round-2
    in-left counts, which depend only on (qb, db) — regroup a single
    checkpointed (qb, db) grid of exact integer partials.

    Determinism: both engines see identical integer histograms, apply
    the identical IEEE double expression tree for gains/leaves, and
    break argmax ties (gain desc, feature, bin) identically.

    Reference analog: extends ml_decision_stump (the reference's
    feature-scoring stage, voice_classifier.py:150-153) into the
    iterative-ensemble regime its Keras training loop represents.
    """
    li = load_table(spark, sf_dir, "lineitem")
    base = li.select(
        F.round(F.col("l_extendedprice") * 100).cast("bigint").alias("y"),
        F.col("l_quantity").cast("bigint").alias("qb"),
        F.round(F.col("l_discount") * 100).cast("bigint").alias("db"),
    )
    # ONE fact scan (r10 optimization): the fact collapses map-side to
    # the <=|qty|x|disc| (qb, db) grid of exact integer (count, cents)
    # partials; tot, both round-1 feature histograms AND the round-2
    # histograms (including the in-left counts, which depend only on
    # (qb, db)) are regroupings of that grid — sums of bigint partials
    # regroup associatively, so every downstream integer is unchanged.
    # Previously the fact was scanned 4x (tot + the 2-leg union twice).
    grid = (
        base.groupBy("qb", "db")
        .agg(
            F.count(F.lit(1)).alias("gn"),
            F.sum("y").alias("gs"),
        )
        .localCheckpoint(eager=True)
    )
    u = grid.select(
        F.lit("qty").alias("f"), F.col("qb").alias("bin"), "gn", "gs", "qb", "db"
    ).unionAll(
        grid.select(
            F.lit("disc").alias("f"), F.col("db").alias("bin"), "gn", "gs", "qb", "db"
        )
    )
    tot = grid.agg(
        F.sum("gn").cast("double").alias("nt"),
        F.sum("gs").cast("double").alias("st"),
    )
    hist1 = u.groupBy("f", "bin").agg(
        F.sum("gn").alias("n"), F.sum("gs").alias("s")
    )
    w = (
        Window.partitionBy("f")
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum1 = hist1.select(
        "f",
        "bin",
        F.sum("n").over(w).cast("double").alias("nl"),
        F.sum("s").over(w).cast("double").alias("sl"),
    )
    nt, st, nl, sl = F.col("nt"), F.col("st"), F.col("nl"), F.col("sl")
    p0 = st / nt
    cand1 = (
        cum1.crossJoin(F.broadcast(tot))
        .where((nl > 0) & (nt - nl > 0))
        .select(
            "f", "bin", "nl", "sl", "nt", "st",
            (
                F.pow(sl - nl * p0, 2) / nl
                + F.pow((st - sl) - (nt - nl) * p0, 2) / (nt - nl)
            ).alias("gain"),
        )
    )
    r1 = (
        cand1.orderBy(F.col("gain").desc(), "f", "bin")
        .limit(1)
        .select(
            F.col("f").alias("rf"),
            F.col("bin").alias("rbin"),
            F.col("nl").alias("rnl"),
            "nt",
            "st",
            F.col("gain").alias("gain1"),
            p0.alias("p0"),
            ((sl - nl * p0) / nl).alias("vl1"),
            (((st - sl) - (nt - nl) * p0) / (nt - nl)).alias("vr1"),
        )
    )
    in_left = (
        (F.col("rf") == "qty") & (F.col("qb") <= F.col("rbin"))
    ) | ((F.col("rf") == "disc") & (F.col("db") <= F.col("rbin")))
    hist2 = (
        u.crossJoin(F.broadcast(r1))
        .groupBy("f", "bin")
        .agg(
            F.sum("gn").alias("n"),
            F.sum("gs").alias("s"),
            F.sum(F.when(in_left, F.col("gn")).otherwise(0)).alias("na"),
        )
    )
    cum2 = hist2.select(
        "f",
        "bin",
        F.sum("n").over(w).cast("double").alias("nl2"),
        F.sum("s").over(w).cast("double").alias("sl2"),
        F.sum("na").over(w).cast("double").alias("nal2"),
    )
    nl2, sl2, nal2 = F.col("nl2"), F.col("sl2"), F.col("nal2")
    rsl = sl2 - nl2 * F.col("p0") - GBT_LR * (
        nal2 * F.col("vl1") + (nl2 - nal2) * F.col("vr1")
    )
    rsr = (F.col("st") - sl2) - (F.col("nt") - nl2) * F.col("p0") - GBT_LR * (
        (F.col("rnl") - nal2) * F.col("vl1")
        + ((F.col("nt") - nl2) - (F.col("rnl") - nal2)) * F.col("vr1")
    )
    cand2 = (
        cum2.crossJoin(F.broadcast(r1))
        .where((nl2 > 0) & (F.col("nt") - nl2 > 0))
        .select(
            "f", "bin", "nl2", "nt",
            rsl.alias("rsl"), rsr.alias("rsr"),
        )
    )
    best2 = (
        cand2.select(
            "f", "bin", "nl2", "nt",
            (F.col("rsl") / nl2).alias("vl"),
            (F.col("rsr") / (F.col("nt") - nl2)).alias("vr"),
            (
                F.pow(F.col("rsl"), 2) / nl2
                + F.pow(F.col("rsr"), 2) / (F.col("nt") - nl2)
            ).alias("gain"),
        )
        .orderBy(F.col("gain").desc(), "f", "bin")
        .limit(1)
    )
    row1 = r1.select(
        F.lit(1).cast("bigint").alias("rnd"),
        F.col("rf").alias("feature"),
        F.col("rbin").cast("bigint").alias("split_bin"),
        F.col("rnl").cast("bigint").alias("n_left"),
        (F.col("nt") - F.col("rnl")).cast("bigint").alias("n_right"),
        F.round(F.col("vl1") / 100, 4).alias("leaf_left"),
        F.round(F.col("vr1") / 100, 4).alias("leaf_right"),
        F.round(F.col("gain1") / F.col("nt") / 10000, 4).alias("mean_gain"),
    )
    row2 = best2.select(
        F.lit(2).cast("bigint").alias("rnd"),
        F.col("f").alias("feature"),
        F.col("bin").cast("bigint").alias("split_bin"),
        F.col("nl2").cast("bigint").alias("n_left"),
        (F.col("nt") - F.col("nl2")).cast("bigint").alias("n_right"),
        F.round(F.col("vl") / 100, 4).alias("leaf_left"),
        F.round(F.col("vr") / 100, 4).alias("leaf_right"),
        F.round(F.col("gain") / F.col("nt") / 10000, 4).alias("mean_gain"),
    )
    return row1.unionAll(row2).orderBy("rnd")


# --- Ridge regression path from one shared moment pass ----------------

RIDGE_LAMBDAS = (0.0, 0.1, 1.0)  # penalties in standardized units


@query(
    "ml_ridge_path",
    oracle=f"""
        WITH s AS (
            SELECT CAST(COUNT(*) AS BIGINT)               AS n,
                   AVG(l_quantity)                        AS mx1,
                   AVG(l_discount)                        AS mx2,
                   AVG(l_extendedprice)                   AS my,
                   covar_pop(l_quantity, l_extendedprice) AS c1y,
                   covar_pop(l_discount, l_extendedprice) AS c2y,
                   covar_pop(l_quantity, l_discount)      AS c12,
                   var_pop(l_quantity)                    AS v1,
                   var_pop(l_discount)                    AS v2,
                   var_pop(l_extendedprice)               AS vy
            FROM lineitem
        ),
        r AS (
            SELECT n, mx1, mx2, my, v1, v2, vy,
                   c12 / SQRT(v1 * v2) AS r12,
                   c1y / SQRT(v1 * vy) AS r1y,
                   c2y / SQRT(v2 * vy) AS r2y
            FROM s
        ),
        lam AS (SELECT CAST(UNNEST([{", ".join(repr(v) for v in RIDGE_LAMBDAS)}])
                AS DOUBLE) AS lam),
        path AS (
            SELECT l.lam, r.n, r.mx1, r.mx2, r.my, r.v1, r.v2, r.vy,
                   ((1 + l.lam) * r.r1y - r.r12 * r.r2y)
                       / ((1 + l.lam) * (1 + l.lam) - r.r12 * r.r12) AS b1s,
                   ((1 + l.lam) * r.r2y - r.r12 * r.r1y)
                       / ((1 + l.lam) * (1 + l.lam) - r.r12 * r.r12) AS b2s
            FROM lam l CROSS JOIN r
        )
        SELECT lam, n,
               ROUND(b1s * SQRT(vy / v1), 6) AS beta_qty,
               ROUND(b2s * SQRT(vy / v2), 6) AS beta_disc,
               ROUND(my - b1s * SQRT(vy / v1) * mx1
                        - b2s * SQRT(vy / v2) * mx2, 4) AS beta0,
               ROUND(SQRT(b1s * b1s + b2s * b2s), 6) AS coef_l2
        FROM path ORDER BY lam
    """,
    tags=("ml", "regression", "ridge", "closed-form", "aggregate"),
)
def ml_ridge_path(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ridge regularization path (price ~ quantity + discount) at
    λ ∈ {{0, 0.1, 1}}: the standardized 2×2 system (R + λI)·b = r_y is
    inverted analytically per λ and back-transformed to raw-scale
    coefficients; λ=0 reproduces ml_ols_normal_equations exactly, and
    coef_l2 exposes the shrinkage monotonically collapsing toward 0.

    The entire PATH costs one aggregation pass: all λ values share the
    same ten sufficient statistics, re-solved per penalty by a 3-row
    literal explode over the broadcast one-row moment frame. This is
    why closed-form hyperparameter sweeps at 100 TB are one scan, not
    one scan per candidate — the standardized (correlation) form also
    keeps the system conditioned regardless of raw feature scales
    (quantity variance ~200 vs discount ~1e-3).

    Reference analog: the model-selection sweep of
    /root/reference/src/voice_classifier.py:232-265 (per-candidate
    retraining) restated as moment reuse.
    """
    li = load_table(spark, sf_dir, "lineitem")
    x1, x2, y = F.col("l_quantity"), F.col("l_discount"), F.col("l_extendedprice")
    s = li.agg(
        F.count("*").alias("n"),
        F.avg(x1).alias("mx1"),
        F.avg(x2).alias("mx2"),
        F.avg(y).alias("my"),
        F.covar_pop(x1, y).alias("c1y"),
        F.covar_pop(x2, y).alias("c2y"),
        F.covar_pop(x1, x2).alias("c12"),
        F.var_pop(x1).alias("v1"),
        F.var_pop(x2).alias("v2"),
        F.var_pop(y).alias("vy"),
    )
    r = s.select(
        "n", "mx1", "mx2", "my", "v1", "v2", "vy",
        (F.col("c12") / F.sqrt(F.col("v1") * F.col("v2"))).alias("r12"),
        (F.col("c1y") / F.sqrt(F.col("v1") * F.col("vy"))).alias("r1y"),
        (F.col("c2y") / F.sqrt(F.col("v2") * F.col("vy"))).alias("r2y"),
    )
    lam = F.explode(
        F.array(*[F.lit(v) for v in RIDGE_LAMBDAS])
    ).alias("lam")
    path = r.select(lam, "*")
    det = (1 + F.col("lam")) * (1 + F.col("lam")) - F.col("r12") * F.col("r12")
    b1s = ((1 + F.col("lam")) * F.col("r1y") - F.col("r12") * F.col("r2y")) / det
    b2s = ((1 + F.col("lam")) * F.col("r2y") - F.col("r12") * F.col("r1y")) / det
    beta1 = b1s * F.sqrt(F.col("vy") / F.col("v1"))
    beta2 = b2s * F.sqrt(F.col("vy") / F.col("v2"))
    return path.select(
        "lam",
        "n",
        F.round(beta1, 6).alias("beta_qty"),
        F.round(beta2, 6).alias("beta_disc"),
        F.round(
            F.col("my") - beta1 * F.col("mx1") - beta2 * F.col("mx2"), 4
        ).alias("beta0"),
        F.round(F.sqrt(b1s * b1s + b2s * b2s), 6).alias("coef_l2"),
    ).orderBy("lam")


# --- Learning curve (data-scaling law) from one moment pass ------------

LC_BUCKETS = 10  # hash buckets; bucket 9 is the fixed holdout


@query(
    "ml_scaling_curve",
    oracle=f"""
        WITH base AS (
            SELECT l_orderkey % {LC_BUCKETS} AS b,
                   CAST(l_quantity AS BIGINT) AS x,
                   CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS y
            FROM lineitem
        ),
        parts AS (
            SELECT b, COUNT(*) AS n,
                   SUM(x) AS sx, SUM(y) AS sy,
                   SUM(x * x) AS sxx, SUM(x * y) AS sxy,
                   SUM(y * y) AS syy
            FROM base GROUP BY b
        ),
        train AS (
            SELECT b AS frac_buckets,
                   SUM(n)   OVER w AS n,
                   SUM(sx)  OVER w AS sx,  SUM(sy)  OVER w AS sy,
                   SUM(sxx) OVER w AS sxx, SUM(sxy) OVER w AS sxy,
                   SUM(syy) OVER w AS syy
            FROM parts WHERE b < {LC_BUCKETS - 1}
            WINDOW w AS (ORDER BY b ROWS UNBOUNDED PRECEDING)
        ),
        hold AS (
            SELECT CAST(n AS DOUBLE) AS hn, sx AS hsx, sy AS hsy,
                   sxx AS hsxx, sxy AS hsxy, syy AS hsyy
            FROM parts WHERE b = {LC_BUCKETS - 1}
        ),
        fit AS (
            SELECT frac_buckets, n,
                   (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                   / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                       AS slope,
                   (CAST(sy AS DOUBLE)
                    - (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                      / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                      * sx) / n AS icept,
                   n AS tn, sx, sy, sxx, sxy, syy
            FROM train WHERE frac_buckets IN (0, 2, 4, {LC_BUCKETS - 2})
        )
        SELECT CAST(frac_buckets + 1 AS BIGINT) AS train_buckets,
               CAST(tn AS BIGINT) AS n_train,
               ROUND(slope / 100, 6) AS slope,
               ROUND(icept / 100, 4) AS intercept,
               ROUND(POWER(CAST(tn AS DOUBLE) * sxy
                           - CAST(sx AS DOUBLE) * sy, 2)
                     / ((CAST(tn AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                        * (CAST(tn AS DOUBLE) * syy
                           - CAST(sy AS DOUBLE) * sy)), 6) AS train_r2,
               ROUND((hsyy / hn - 2 * icept * hsy / hn - 2 * slope * hsxy / hn
                      + icept * icept + 2 * icept * slope * hsx / hn
                      + slope * slope * hsxx / hn) / 10000, 4)
                   AS test_mse
        FROM fit, hold
        ORDER BY train_buckets
    """,
    tags=("ml", "regression", "learning-curve", "closed-form", "window"),
)
def ml_scaling_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Learning curve / data-scaling law from ONE pass: price ~
    quantity is fit on nested training fractions (hash buckets 0..k
    for k ∈ {0,2,4,8}; bucket 9 is the fixed holdout) and each fit's
    held-out MSE is evaluated WITHOUT touching rows again — per-bucket
    integer moment partials cumulate over the 9-row bucket frame, the
    per-fraction slope/intercept/R² are closed-form algebra over the
    cumulative moments, and the holdout MSE expands algebraically as
    E[(y−a−bx)²] = m_yy − 2a·m_y − 2b·m_xy + a² + 2ab·m_x + b²·m_xx
    over the holdout's own moment row.

    This is how data-scaling studies ("is more training data still
    buying accuracy?") must run at 100 TB: ONE map-side-combined
    groupBy produces 10 moment rows; every nested subset, every fit,
    and every evaluation is derived from those — never one scan per
    fraction. Exact integer sums (quantity, cents) make the algebra
    bit-identical cross-engine.

    Reference analog: the fixed single train/test split of
    /root/reference/src/voice_classifier.py:208-231, upgraded to the
    sample-efficiency curve.
    """
    li = load_table(spark, sf_dir, "lineitem")
    base = li.select(
        (F.col("l_orderkey") % LC_BUCKETS).alias("b"),
        F.col("l_quantity").cast("bigint").alias("x"),
        F.round(F.col("l_extendedprice") * 100).cast("bigint").alias("y"),
    )
    ydec = F.col("y").cast("decimal(19,0)")
    parts = base.groupBy("b").agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        # y is cents (~1e7): sum of y^2 exceeds int64 at sf>=0.1, so the
        # squared-cents moment rides a wide decimal (DuckDB: HUGEINT)
        F.sum(ydec * ydec).alias("syy"),
    )
    w = Window.orderBy("b").rowsBetween(Window.unboundedPreceding, 0)
    train = parts.where(F.col("b") < LC_BUCKETS - 1).select(
        F.col("b").alias("frac_buckets"),
        *[
            F.sum(c).over(w).alias(c)
            for c in ("n", "sx", "sy", "sxx", "sxy", "syy")
        ],
    )
    hold = parts.where(F.col("b") == LC_BUCKETS - 1).select(
        F.col("n").cast("double").alias("hn"),
        F.col("sx").alias("hsx"),
        F.col("sy").alias("hsy"),
        F.col("sxx").alias("hsxx"),
        F.col("sxy").alias("hsxy"),
        F.col("syy").cast("double").alias("hsyy"),
    )
    nd = F.col("n").cast("double")
    sxd, syd = F.col("sx").cast("double"), F.col("sy").cast("double")
    slope = (nd * F.col("sxy") - sxd * F.col("sy")) / (
        nd * F.col("sxx") - sxd * F.col("sx")
    )
    icept = (syd - slope * F.col("sx")) / F.col("n")
    r2 = F.pow(nd * F.col("sxy") - sxd * F.col("sy"), 2) / (
        (nd * F.col("sxx") - sxd * F.col("sx"))
        * (nd * F.col("syy").cast("double") - syd * F.col("sy"))
    )
    fit = train.where(
        F.col("frac_buckets").isin(0, 2, 4, LC_BUCKETS - 2)
    ).select(
        (F.col("frac_buckets") + 1).cast("bigint").alias("train_buckets"),
        F.col("n").cast("bigint").alias("n_train"),
        slope.alias("slope_raw"),
        icept.alias("icept_raw"),
        r2.alias("r2_raw"),
    )
    hn = F.col("hn")
    mse = (
        F.col("hsyy") / hn
        - 2 * F.col("icept_raw") * F.col("hsy") / hn
        - 2 * F.col("slope_raw") * F.col("hsxy") / hn
        + F.col("icept_raw") * F.col("icept_raw")
        + 2 * F.col("icept_raw") * F.col("slope_raw") * F.col("hsx") / hn
        + F.col("slope_raw") * F.col("slope_raw") * F.col("hsxx") / hn
    )
    return (
        fit.crossJoin(F.broadcast(hold))
        .select(
            "train_buckets",
            "n_train",
            F.round(F.col("slope_raw") / 100, 6).alias("slope"),
            F.round(F.col("icept_raw") / 100, 4).alias("intercept"),
            F.round(F.col("r2_raw"), 6).alias("train_r2"),
            F.round(mse / 10000, 4).alias("test_mse"),
        )
        .orderBy("train_buckets")
    )


# --- Drop-column feature importance from shared moments -----------------


@query(
    "ml_drop_column_importance",
    oracle="""
        WITH s AS (
            SELECT covar_pop(l_quantity, l_extendedprice)
                       / SQRT(var_pop(l_quantity)
                              * var_pop(l_extendedprice)) AS r1y,
                   covar_pop(l_discount, l_extendedprice)
                       / SQRT(var_pop(l_discount)
                              * var_pop(l_extendedprice)) AS r2y,
                   covar_pop(l_quantity, l_discount)
                       / SQRT(var_pop(l_quantity)
                              * var_pop(l_discount)) AS r12,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM lineitem
        ),
        full_fit AS (
            SELECT n, r1y, r2y, r12,
                   ((r1y - r12 * r2y) * r1y + (r2y - r12 * r1y) * r2y)
                       / (1 - r12 * r12) AS r2_full
            FROM s
        ),
        feats AS (
            SELECT 'quantity' AS feature, n, r2_full,
                   r2y * r2y AS r2_without,
                   (r1y - r12 * r2y)
                       / SQRT((1 - r12 * r12) * (1 - r2y * r2y))
                       AS partial_corr
            FROM full_fit
            UNION ALL
            SELECT 'discount', n, r2_full,
                   r1y * r1y,
                   (r2y - r12 * r1y)
                       / SQRT((1 - r12 * r12) * (1 - r1y * r1y))
            FROM full_fit
        )
        SELECT feature, n,
               ROUND(r2_full, 6) AS r2_full,
               ROUND(r2_without, 6) AS r2_without,
               ROUND(r2_full - r2_without, 6) AS delta_r2,
               ROUND(partial_corr, 6) AS partial_corr
        FROM feats ORDER BY feature
    """,
    tags=("ml", "feature-importance", "closed-form", "aggregate"),
)
def ml_drop_column_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drop-column feature importance for the two-feature OLS (price ~
    quantity + discount) WITHOUT retraining: the full-model R², each
    leave-one-feature-out R², their gap ΔR² (the importance), and the
    partial correlation of each feature given the other — all closed
    algebra over the SAME correlation moments ml_ols_normal_equations
    already computes in one pass.

    The production contrast: permutation/drop-column importance as
    usually implemented retrains once per feature (p extra passes over
    100 TB). For linear models the (p+1)-choose-2 correlation matrix
    IS the sufficient statistic — every submodel's fit is a determinant
    ratio over the one matrix. One scan, p·(p+1)/2 moments, zero
    refits. Reference analog: the per-feature mutual-information
    scoring loop of /root/reference/src/voice_classifier.py:150-153.
    """
    li = load_table(spark, sf_dir, "lineitem")
    x1, x2, y = F.col("l_quantity"), F.col("l_discount"), F.col("l_extendedprice")
    s = li.agg(
        (
            F.covar_pop(x1, y) / F.sqrt(F.var_pop(x1) * F.var_pop(y))
        ).alias("r1y"),
        (
            F.covar_pop(x2, y) / F.sqrt(F.var_pop(x2) * F.var_pop(y))
        ).alias("r2y"),
        (
            F.covar_pop(x1, x2) / F.sqrt(F.var_pop(x1) * F.var_pop(x2))
        ).alias("r12"),
        F.count("*").cast("bigint").alias("n"),
    )
    r1y, r2y, r12 = F.col("r1y"), F.col("r2y"), F.col("r12")
    r2_full = (
        (r1y - r12 * r2y) * r1y + (r2y - r12 * r1y) * r2y
    ) / (1 - r12 * r12)
    full_fit = s.select("n", "r1y", "r2y", "r12", r2_full.alias("r2_full"))
    q = full_fit.select(
        F.lit("quantity").alias("feature"),
        "n",
        "r2_full",
        (r2y * r2y).alias("r2_without"),
        (
            (r1y - r12 * r2y)
            / F.sqrt((1 - r12 * r12) * (1 - r2y * r2y))
        ).alias("partial_corr"),
    )
    d = full_fit.select(
        F.lit("discount").alias("feature"),
        "n",
        "r2_full",
        (r1y * r1y).alias("r2_without"),
        (
            (r2y - r12 * r1y)
            / F.sqrt((1 - r12 * r12) * (1 - r1y * r1y))
        ).alias("partial_corr"),
    )
    return (
        q.unionAll(d)
        .select(
            "feature",
            "n",
            F.round(F.col("r2_full"), 6).alias("r2_full"),
            F.round(F.col("r2_without"), 6).alias("r2_without"),
            F.round(F.col("r2_full") - F.col("r2_without"), 6).alias(
                "delta_r2"
            ),
            F.round(F.col("partial_corr"), 6).alias("partial_corr"),
        )
        .orderBy("feature")
    )


# --- Bias-variance decomposition over the bucket ensemble ---------------


@query(
    "ml_bias_variance",
    oracle=f"""
        WITH base AS (
            SELECT l_orderkey % {LC_BUCKETS} AS b,
                   CAST(l_quantity AS BIGINT) AS x,
                   CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS y
            FROM lineitem
        ),
        parts AS (
            SELECT b, CAST(COUNT(*) AS DOUBLE) AS n,
                   CAST(SUM(x) AS DOUBLE) AS sx,
                   CAST(SUM(y) AS DOUBLE) AS sy,
                   CAST(SUM(x * x) AS DOUBLE) AS sxx,
                   CAST(SUM(x * y) AS DOUBLE) AS sxy,
                   CAST(SUM(y * CAST(y AS HUGEINT)) AS DOUBLE) AS syy
            FROM base GROUP BY b
        ),
        fits AS (
            SELECT b,
                   (n * sxy - sx * sy) / (n * sxx - sx * sx) AS s,
                   (sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n
                       AS a
            FROM parts WHERE b < {LC_BUCKETS - 1}
        ),
        ens AS (
            SELECT CAST(COUNT(*) AS DOUBLE) AS m,
                   AVG(a) AS abar, AVG(s) AS sbar,
                   AVG(a * a) - AVG(a) * AVG(a) AS var_a,
                   AVG(s * s) - AVG(s) * AVG(s) AS var_s,
                   AVG(a * s) - AVG(a) * AVG(s) AS cov_as
            FROM fits
        ),
        hold AS (
            SELECT n AS hn, sx / n AS mx, sxx / n AS mxx,
                   sy / n AS my, syy / n AS myy, sxy / n AS mxy
            FROM parts WHERE b = {LC_BUCKETS - 1}
        )
        SELECT CAST(e.m AS BIGINT) AS n_models,
               ROUND((e.var_a + 2 * e.cov_as * h.mx + e.var_s * h.mxx)
                     / 10000, 4) AS avg_variance,
               ROUND((h.myy - 2 * e.abar * h.my - 2 * e.sbar * h.mxy
                      + e.abar * e.abar + 2 * e.abar * e.sbar * h.mx
                      + e.sbar * e.sbar * h.mxx) / 10000, 4)
                   AS mean_model_mse,
               ROUND(((h.myy - 2 * e.abar * h.my - 2 * e.sbar * h.mxy
                       + e.abar * e.abar + 2 * e.abar * e.sbar * h.mx
                       + e.sbar * e.sbar * h.mxx)
                      + (e.var_a + 2 * e.cov_as * h.mx + e.var_s * h.mxx))
                     / 10000, 4) AS expected_single_model_mse
        FROM ens e, hold h
    """,
    tags=("ml", "bias-variance", "closed-form", "aggregate"),
)
def ml_bias_variance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bias-variance decomposition WITHOUT retraining or rescoring: the
    nine training buckets each fit their own closed-form 1-feature OLS
    (price ~ quantity), and over the held-out bucket the ensemble's
    prediction VARIANCE — E_x[Var_models(â + ŝx)] = Var(a) +
    2·Cov(a,s)·E[x] + Var(s)·E[x²] — the mean-model MSE, and the
    expected single-model MSE (= mean-model MSE + variance, the
    bias-variance identity) all close algebraically over (a) the
    9-model coefficient moments and (b) the holdout's own moment row.

    This is the full Domingos decomposition from ONE scan: per-bucket
    integer moments → 9 (a,s) pairs → 5 ensemble moments; no model
    ever scores a row. The identity expected_single_model_mse =
    mean_model_mse + avg_variance is asserted in the pytest replay
    against literally-trained numpy models. Squared-cents moments ride
    HUGEINT/decimal per the house overflow rule.

    Reference analog: quantifies WHY voice_classifier.py:232-265's
    single train/test split under-estimates generalization error —
    the variance term is invisible to one split.
    """
    li = load_table(spark, sf_dir, "lineitem")
    base = li.select(
        (F.col("l_orderkey") % LC_BUCKETS).alias("b"),
        F.col("l_quantity").cast("bigint").alias("x"),
        F.round(F.col("l_extendedprice") * 100).cast("bigint").alias("y"),
    )
    ydec = F.col("y").cast("decimal(19,0)")
    parts = base.groupBy("b").agg(
        F.count("*").cast("double").alias("n"),
        F.sum("x").cast("double").alias("sx"),
        F.sum("y").cast("double").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("double").alias("sxx"),
        F.sum(F.col("x") * F.col("y")).cast("double").alias("sxy"),
        F.sum(ydec * ydec).cast("double").alias("syy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    slope = (n * F.col("sxy") - sx * sy) / (n * F.col("sxx") - sx * sx)
    fits = parts.where(F.col("b") < LC_BUCKETS - 1).select(
        slope.alias("s"), ((sy - slope * sx) / n).alias("a")
    )
    ens = fits.agg(
        F.count("*").cast("double").alias("m"),
        F.avg("a").alias("abar"),
        F.avg("s").alias("sbar"),
        (F.avg(F.col("a") * F.col("a")) - F.avg("a") * F.avg("a")).alias(
            "var_a"
        ),
        (F.avg(F.col("s") * F.col("s")) - F.avg("s") * F.avg("s")).alias(
            "var_s"
        ),
        (F.avg(F.col("a") * F.col("s")) - F.avg("a") * F.avg("s")).alias(
            "cov_as"
        ),
    )
    hold = parts.where(F.col("b") == LC_BUCKETS - 1).select(
        (F.col("sx") / n).alias("mx"),
        (F.col("sxx") / n).alias("mxx"),
        (F.col("sy") / n).alias("my"),
        (F.col("syy") / n).alias("myy"),
        (F.col("sxy") / n).alias("mxy"),
    )
    j = ens.crossJoin(F.broadcast(hold))
    var_term = (
        F.col("var_a")
        + 2 * F.col("cov_as") * F.col("mx")
        + F.col("var_s") * F.col("mxx")
    )
    mse_mean = (
        F.col("myy")
        - 2 * F.col("abar") * F.col("my")
        - 2 * F.col("sbar") * F.col("mxy")
        + F.col("abar") * F.col("abar")
        + 2 * F.col("abar") * F.col("sbar") * F.col("mx")
        + F.col("sbar") * F.col("sbar") * F.col("mxx")
    )
    return j.select(
        F.col("m").cast("bigint").alias("n_models"),
        F.round(var_term / 10000, 4).alias("avg_variance"),
        F.round(mse_mean / 10000, 4).alias("mean_model_mse"),
        F.round((mse_mean + var_term) / 10000, 4).alias(
            "expected_single_model_mse"
        ),
    )
