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
