"""Round-9-built spare carriers + the round's contract conversion.

The r09 driver-window rotation (registry.py) drains the LAST
never-certified carriers of two REQUIRED_FAMILY_TAGs — ``lm`` (the
judge-directed LM-smoothing must-enters) and ``mapInPandas`` (the full
Arrow-kernel family entered the window) — so this tranche restocks both
to 2-deep for the r10/r11 rotations, per the stocking rule SURVEY §12
set in round 6:

* ``text_lm_witten_bell``      — Witten-Bell smoothed query likelihood
  (the diversity-adaptive interpolation: λ_d from the TYPE count).
* ``text_lm_stupid_backoff``   — document bigram LM with corpus-unigram
  stupid backoff (Brants et al. 2007, α=0.4).
* ``mm_payload_rle_runs``      — run-length structure of the payload
  bytes via an Arrow kernel (itertools.groupby) vs a LAG/run-id oracle.
* ``mm_payload_bit_density``   — payload popcount via numpy unpackbits
  vs a shift-and-mask relational oracle.

Plus the judge's r08 item-7 conversion:

* ``ml_pca_variance_contract`` — the SQL-oracled face of the rows-only
  ``ml_pca_embeddings`` (operators/ml.py, reference R21): per-dimension
  covariance moments oracle-exact, MLlib's eigen-spectrum gated by
  denominator-free invariants (sign- and basis-indeterminacy never
  touches the compared values).

Same contract as every other operator module: idiomatic Spark DataFrame
plan + independently-formulated DuckDB oracle, identical aliases both
sides, exact-integer arithmetic up to one final fixed-order float
expression, -0.0 ``+ 0`` guards on any ROUND that can land on zero, and
a 100 TB scale story per docstring.
"""

from __future__ import annotations

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from big_data_audio_classification_spark.registry import query
from big_data_audio_classification_spark.sources.catalog import load_table

# ---------------------------------------------------------------------------
# lm: Witten-Bell smoothed query likelihood
# ---------------------------------------------------------------------------

WB_TERMS = ("data", "the", "stream")  # all present at every SF (cf > 0)


def _eq(term: str):
    # Single-arg lambda factory: F.filter treats a TWO-arg lambda as
    # (element, index), so the default-arg capture idiom would bind the
    # positional index, not the closed-over term.
    return lambda t: t == term


def _pair_eq(a: str, b: str):
    return lambda p: (p["a"] == a) & (p["b"] == b)


def _witten_bell_sql() -> str:
    tf_cols = ", ".join(
        f"CAST(len(list_filter(l, t -> t = '{t}')) AS BIGINT) AS tf{i}"
        for i, t in enumerate(WB_TERMS, 1)
    )
    cf_cols = ", ".join(
        f"CAST(SUM(tf{i}) AS DOUBLE) AS cf{i}"
        for i in range(1, len(WB_TERMS) + 1)
    )
    # cf{i} > 0 guard (r09 ADVICE): if a probe term ever had zero corpus
    # frequency the LN argument is 0 — DuckDB raises Out of Range while
    # Spark yields NULL. tf > 0 implies cf > 0 (cf = Σ tf), so guarding
    # on cf alone covers the argument; a vocabulary shift now degrades
    # to a NULL-vs-NULL match instead of an oracle crash.
    ll = " + ".join(
        f"CASE WHEN cf{i} > 0"
        f" THEN LN((tf{i} + u_types * cf{i} / clen) / (dl + u_types))"
        f" ELSE NULL END"
        for i in range(1, len(WB_TERMS) + 1)
    )
    return f"""
        WITH toks AS (
            SELECT doc_id,
                   list_filter(string_split(text, ' '), t -> t <> '') AS l
            FROM documents
        ),
        pd AS (
            SELECT doc_id,
                   CAST(len(l) AS BIGINT)                AS dl,
                   CAST(len(list_distinct(l)) AS BIGINT) AS u_types,
                   {tf_cols}
            FROM toks WHERE len(l) > 0
        ),
        corpus AS (
            SELECT CAST(SUM(dl) AS DOUBLE) AS clen, {cf_cols} FROM pd
        )
        SELECT doc_id, dl, u_types,
               {", ".join(f"tf{i}" for i in range(1, len(WB_TERMS) + 1))},
               ROUND({ll}, 6) AS query_loglik
        FROM pd, corpus
    """


@query(
    "text_lm_witten_bell",
    oracle=_witten_bell_sql(),
    tags=("text", "lm", "documents"),
)
def text_lm_witten_bell(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WITTEN-BELL smoothed query log-likelihood: the interpolation
    weight adapts to each document's lexical DIVERSITY — λ_d =
    dl/(dl + U_d) with U_d the distinct-type count, so a repetitive
    document (few types) trusts the collection model more than a
    varied one of the same length. Algebraically P(w|d) =
    (tf + U_d·cf/|C|)/(dl + U_d): the Dirichlet-prior shape
    (``text_lm_dirichlet_prior``) with μ replaced by the PER-DOCUMENT
    type count — completing the smoothing family (JM: fixed λ; AD:
    subtracted mass; Dirichlet: fixed prior; WB: diversity prior;
    GT/KN: count reallocation). All counts exact integers computed
    ARRAY-SIDE (len/list_filter/list_distinct — the token list never
    explodes, no shuffle on the token); the log-likelihood is one
    fixed-order 3-term float expression per row against a 1-row
    broadcast of collection stats. One scan, one |docs|-row aggregate,
    one 1-row aggregate; at 100 TB nothing but (doc_id, 6 ints)
    shuffles."""
    d = load_table(spark, sf_dir, "documents")
    from big_data_audio_classification_spark.operators.dedup import tokens_col

    toks = d.select("doc_id", tokens_col(F.col("text")).alias("l")).filter(
        F.size("l") > 0
    )
    per_doc = toks.select(
        "doc_id",
        F.size("l").cast("bigint").alias("dl"),
        F.size(F.array_distinct("l")).cast("bigint").alias("u_types"),
        *[
            F.size(F.filter("l", _eq(t))).cast("bigint").alias(f"tf{i}")
            for i, t in enumerate(WB_TERMS, 1)
        ],
    )
    corpus = per_doc.agg(
        F.sum("dl").cast("double").alias("clen"),
        *[
            F.sum(f"tf{i}").cast("double").alias(f"cf{i}")
            for i in range(1, len(WB_TERMS) + 1)
        ],
    )
    ll = None
    for i in range(1, len(WB_TERMS) + 1):
        # Same cf > 0 guard as the oracle: an unseen corpus term yields
        # NULL on both engines rather than Spark-NULL vs DuckDB-crash.
        term = F.when(
            F.col(f"cf{i}") > 0,
            F.log(
                (
                    F.col(f"tf{i}")
                    + F.col("u_types") * F.col(f"cf{i}") / F.col("clen")
                )
                / (F.col("dl") + F.col("u_types"))
            ),
        )
        ll = term if ll is None else ll + term
    return per_doc.crossJoin(F.broadcast(corpus)).select(
        "doc_id",
        "dl",
        "u_types",
        *[f"tf{i}" for i in range(1, len(WB_TERMS) + 1)],
        F.round(ll, 6).alias("query_loglik"),
    )


# ---------------------------------------------------------------------------
# lm: document bigram LM with corpus-unigram stupid backoff
# ---------------------------------------------------------------------------

SB_ALPHA = 0.4  # the Brants et al. (2007) backoff constant
SB_BIGRAMS = (("data", "stream"), ("the", "table"))  # ~6% of docs hit
# each bigram, so both the in-document branch and the backoff branch
# carry real traffic at every SF (verified r09).


def _stupid_backoff_sql() -> str:
    per_doc = []
    for i, (w1, w2) in enumerate(SB_BIGRAMS, 1):
        per_doc.append(
            f"CAST(len(list_filter(l, t -> t = '{w1}')) AS BIGINT) AS tf1_{i}"
        )
        per_doc.append(
            f"CAST(len(list_filter(l, t -> t = '{w2}')) AS BIGINT) AS tfw2_{i}"
        )
        per_doc.append(
            f"""CAST(CASE WHEN len(l) >= 2 THEN len(list_filter(
                    range(len(l) - 1),
                    i -> l[i + 1] = '{w1}' AND l[i + 2] = '{w2}'))
                ELSE 0 END AS BIGINT) AS tf12_{i}"""
        )
    # cf2 > 0 guard on the backoff branch (r09 ADVICE): a zero corpus
    # frequency would make LOG2 raise Out of Range on DuckDB but yield
    # NULL on Spark; guarded, both engines degrade to NULL. tf12 > 0
    # implies tf1 > 0 (the bigram contains w1), so the in-document
    # branch needs no guard.
    score = " + ".join(
        f"""CASE WHEN tf12_{i} > 0
                 THEN LOG2(CAST(tf12_{i} AS DOUBLE) / tf1_{i})
                 WHEN cf2_{i} > 0
                 THEN LOG2({SB_ALPHA} * cf2_{i} / clen)
                 ELSE NULL END"""
        for i in range(1, len(SB_BIGRAMS) + 1)
    )
    cf_cols = ", ".join(
        f"CAST(SUM(tfw2_{i}) AS DOUBLE) AS cf2_{i}"
        for i in range(1, len(SB_BIGRAMS) + 1)
    )
    return f"""
        WITH toks AS (
            SELECT doc_id,
                   list_filter(string_split(text, ' '), t -> t <> '') AS l
            FROM documents
        ),
        pd AS (
            SELECT doc_id, CAST(len(l) AS BIGINT) AS dl, {", ".join(per_doc)}
            FROM toks WHERE len(l) > 0
        ),
        corpus AS (SELECT CAST(SUM(dl) AS DOUBLE) AS clen, {cf_cols} FROM pd)
        SELECT doc_id, tf12_1, tf1_1, tf12_2, tf1_2,
               ROUND({score}, 6) + 0 AS sb_log2
        FROM pd, corpus
    """


@query(
    "text_lm_stupid_backoff",
    oracle=_stupid_backoff_sql(),
    tags=("text", "lm", "documents"),
)
def text_lm_stupid_backoff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STUPID BACKOFF (Brants et al. 2007) — the web-scale LM rule that
    skips discounting entirely: score a fixed 2-bigram query per
    document as S(w2|w1,d) = tf12/tf1 when the DOCUMENT contains the
    bigram, else α·cf(w2)/|C| backing off to the CORPUS unigram
    (α=0.4). The branchy CASE is the operator's whole point — at web
    scale normalized discounting (KN) costs a join per order, stupid
    backoff costs none. Counts are computed ARRAY-SIDE on both engines
    (Spark filter(sequence)/slice-zip vs DuckDB list_filter over
    range — independent positional formulations); the text never
    shuffles. One |docs|-row aggregate + a 1-row corpus broadcast; the
    per-row score is one fixed-order 2-term float expression, oracle
    ``+ 0``-guarded (a doc scoring exactly 0 would round to DuckDB
    -0.0). 100 TB: identical plan, bigger scan."""
    d = load_table(spark, sf_dir, "documents")
    from big_data_audio_classification_spark.operators.dedup import tokens_col

    toks = d.select("doc_id", tokens_col(F.col("text")).alias("l")).filter(
        F.size("l") > 0
    )
    n = F.size("l")
    cols = [F.col("doc_id"), n.cast("bigint").alias("dl")]
    for i, (w1, w2) in enumerate(SB_BIGRAMS, 1):
        cols.append(
            F.size(F.filter("l", _eq(w1))).cast("bigint").alias(f"tf1_{i}")
        )
        cols.append(
            F.size(F.filter("l", _eq(w2))).cast("bigint").alias(f"tfw2_{i}")
        )
        pairs = F.arrays_zip(
            F.slice(F.col("l"), 1, n - 1).alias("a"),
            F.slice(F.col("l"), 2, n - 1).alias("b"),
        )
        hit = F.size(F.filter(pairs, _pair_eq(w1, w2)))
        cols.append(
            F.when(n >= 2, hit).otherwise(F.lit(0)).cast("bigint").alias(f"tf12_{i}")
        )
    per_doc = toks.select(*cols)
    corpus = per_doc.agg(
        F.sum("dl").cast("double").alias("clen"),
        *[
            F.sum(f"tfw2_{i}").cast("double").alias(f"cf2_{i}")
            for i in range(1, len(SB_BIGRAMS) + 1)
        ],
    )
    score = None
    for i in range(1, len(SB_BIGRAMS) + 1):
        # Mirrors the oracle's guarded CASE: backoff only when cf2 > 0,
        # NULL otherwise (see the guard rationale in the SQL builder).
        term = F.when(
            F.col(f"tf12_{i}") > 0,
            F.log2(F.col(f"tf12_{i}").cast("double") / F.col(f"tf1_{i}")),
        ).when(
            F.col(f"cf2_{i}") > 0,
            F.log2(SB_ALPHA * F.col(f"cf2_{i}") / F.col("clen")),
        )
        score = term if score is None else score + term
    return per_doc.crossJoin(F.broadcast(corpus)).select(
        "doc_id", "tf12_1", "tf1_1", "tf12_2", "tf1_2",
        F.round(score, 6).alias("sb_log2"),
    )


# ---------------------------------------------------------------------------
# mapInPandas: run-length structure of the payload bytes
# ---------------------------------------------------------------------------


@query(
    "mm_payload_rle_runs",
    oracle="""
        WITH ch AS (
            SELECT doc_id,
                   UNNEST(string_split_regex(text, '')) AS c,
                   CAST(generate_subscripts(
                        string_split_regex(text, ''), 1) AS BIGINT) AS i
            FROM documents
        ),
        -- string_split_regex('','') yields [''] — drop the phantom so
        -- an empty payload contributes zero characters (same contract
        -- as mm_payload_adler_checksum, r08 review)
        marks AS (
            SELECT doc_id, i,
                   CASE WHEN LAG(c) OVER (PARTITION BY doc_id ORDER BY i)
                             IS DISTINCT FROM c
                        THEN 1 ELSE 0 END AS new_run
            FROM ch WHERE c <> ''
        ),
        runs AS (
            SELECT doc_id, i,
                   CAST(SUM(new_run) OVER (PARTITION BY doc_id ORDER BY i)
                        AS BIGINT) AS run_id
            FROM marks
        ),
        rl AS (
            SELECT doc_id, run_id, CAST(COUNT(*) AS BIGINT) AS rlen
            FROM runs GROUP BY doc_id, run_id
        ),
        s AS (
            SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_runs,
                   CAST(MAX(rlen) AS BIGINT)        AS max_run
            FROM rl GROUP BY doc_id
        )
        SELECT d.doc_id,
               CAST(length(d.text) AS BIGINT) AS n_bytes,
               COALESCE(s.n_runs, 0)          AS n_runs,
               COALESCE(s.max_run, 0)         AS max_run
        FROM documents d LEFT JOIN s ON d.doc_id = s.doc_id
    """,
    tags=("multimodal", "mapInPandas", "documents"),
)
def mm_payload_rle_runs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RUN-LENGTH structure of the payload bytes via ``mapInPandas``:
    each Arrow batch is scanned in Python with ``itertools.groupby``
    (the RLE primitive every binary-payload compressor/profiler runs
    first — a payload whose max_run is large is blank-padded or
    synthetic), while the oracle restates the runs RELATIONALLY: a LAG
    change-mark, a running-sum run-id, and a per-run count — two
    genuinely different formulations of the same partition of the byte
    string. ASCII payloads keep bytes == codepoints (asserted loudly,
    the mm_payload_byte_histogram contract); empty payloads emit
    (0, 0, 0) via the documents LEFT JOIN on the oracle side and the
    groupby-of-empty on the Spark side. Pure integers end-to-end; the
    Python boundary emits ONE row per document. At 100 TB the kernel
    rides the payload-decode scan — no shuffle at all."""
    import itertools

    def batches(it):
        for pdf in it:
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                assert text.isascii(), (
                    f"doc {doc_id}: non-ASCII text breaks the "
                    "byte==codepoint oracle contract"
                )
                payload = text.encode("utf-8")
                run_lens = [
                    len(list(g)) for _, g in itertools.groupby(payload)
                ]
                rows.append(
                    (
                        int(doc_id),
                        len(payload),
                        len(run_lens),
                        max(run_lens, default=0),
                    )
                )
            if rows:
                yield pd.DataFrame(
                    rows, columns=["doc_id", "n_bytes", "n_runs", "max_run"]
                )

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return d.mapInPandas(
        batches, "doc_id long, n_bytes long, n_runs long, max_run long"
    )


# ---------------------------------------------------------------------------
# mapInPandas: payload popcount / bit density
# ---------------------------------------------------------------------------


@query(
    "mm_payload_bit_density",
    oracle="""
        WITH ch AS (
            SELECT doc_id, ascii(UNNEST(string_split_regex(text, ''))) AS b
            FROM documents
        ),
        s AS (
            -- shift-and-mask popcount: ASCII < 128 pins bit 7 to zero,
            -- so 7 masked shifts cover the byte (the Spark side
            -- asserts the same contract with payload.isascii())
            SELECT doc_id,
                   CAST(SUM((b & 1) + ((b >> 1) & 1) + ((b >> 2) & 1)
                          + ((b >> 3) & 1) + ((b >> 4) & 1)
                          + ((b >> 5) & 1) + ((b >> 6) & 1))
                        AS BIGINT) AS total_bits
            FROM ch WHERE b IS NOT NULL AND b > 0 AND b < 128
            GROUP BY doc_id
        )
        SELECT d.doc_id,
               CAST(length(d.text) AS BIGINT) AS n_bytes,
               COALESCE(s.total_bits, 0)      AS total_bits,
               CASE WHEN length(d.text) > 0
                    THEN ROUND(CAST(COALESCE(s.total_bits, 0) AS DOUBLE)
                               / (8 * length(d.text)), 6) + 0
               END AS ones_frac
        FROM documents d LEFT JOIN s ON d.doc_id = s.doc_id
    """,
    tags=("multimodal", "mapInPandas", "documents"),
)
def mm_payload_bit_density(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PAYLOAD POPCOUNT via ``mapInPandas``: each Arrow batch's bytes
    are bit-unpacked VECTORIZED in numpy (``unpackbits`` over
    ``frombuffer`` — the entropy-proxy fingerprint a multimodal ingest
    computes to flag all-zero / saturated / encrypted payloads), while
    the oracle restates the popcount as seven masked shifts summed
    relationally — independent formulations of the same integer.
    ASCII guard pins bytes == codepoints (and bit 7 == 0, which the
    oracle's 7-shift form exploits; ascii('\\0') cannot occur in a
    parquet string column and b > 0 merely documents that). The
    ones_frac ratio is ONE float division of exact integers done
    JVM-SIDE after the kernel (never in Python — round-half behavior
    differs), oracle ``+ 0``-guarded. One row per document out of the
    Python boundary; at 100 TB the kernel rides the decode scan."""
    import numpy as np

    def batches(it):
        for pdf in it:
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                assert text.isascii(), (
                    f"doc {doc_id}: non-ASCII text breaks the "
                    "byte==codepoint oracle contract"
                )
                payload = np.frombuffer(text.encode("utf-8"), dtype=np.uint8)
                rows.append(
                    (
                        int(doc_id),
                        int(payload.size),
                        int(np.unpackbits(payload).sum()) if payload.size else 0,
                    )
                )
            if rows:
                yield pd.DataFrame(
                    rows, columns=["doc_id", "n_bytes", "total_bits"]
                )

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    counted = d.mapInPandas(
        batches, "doc_id long, n_bytes long, total_bits long"
    )
    return counted.select(
        "doc_id",
        "n_bytes",
        "total_bits",
        F.when(
            F.col("n_bytes") > 0,
            F.round(
                F.col("total_bits").cast("double") / (8 * F.col("n_bytes")), 6
            ),
        ).alias("ones_frac"),
    )


# ---------------------------------------------------------------------------
# ml: PCA covariance-moment contract (the r09 rows-only conversion)
# ---------------------------------------------------------------------------

PCA_GATE_TOL = 1e-9


@query(
    "ml_pca_variance_contract",
    oracle="""
        WITH x AS (
            SELECT vec_id,
                   CAST(generate_subscripts(embedding, 1) AS BIGINT) AS dim,
                   CAST(UNNEST(embedding) AS DOUBLE) AS v
            FROM embeddings
        ),
        m AS (
            SELECT dim,
                   CAST(COUNT(*) AS BIGINT) AS n_vecs,
                   list_sum(list(v ORDER BY vec_id))     AS s1,
                   list_sum(list(v * v ORDER BY vec_id)) AS s2
            FROM x GROUP BY dim
        )
        SELECT dim, n_vecs,
               ROUND((s2 - s1 * s1 / CAST(n_vecs AS DOUBLE))
                     / CAST(n_vecs AS DOUBLE), 6) + 0 AS var_pop,
               TRUE AS pca_gates_ok
        FROM m
    """,
    tags=("ml", "pca", "mllib", "report", "embeddings"),
)
def ml_pca_variance_contract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PCA COVARIANCE-MOMENT CONTRACT — the SQL-oracled face of the
    rows-only ``ml_pca_embeddings`` (reference R21), the same
    conversion move as the r07/r08 metadata/loss/vocab contracts: the
    per-dimension covariance moments are ORACLE-EXACT, and MLlib's
    eigen-spectrum is gated by DENOMINATOR-FREE invariants that sign/
    basis indeterminacy (why PCA is rows-only) cannot touch.

    Value-compared: per-dimension population variance of the
    embeddings — Σv and Σv² reduced via the SEQUENTIAL vec_id-ordered
    fold (Spark ``aggregate(transform(array_sort(collect_list(...))))``
    vs DuckDB ``list_sum(list(v ORDER BY vec_id))``, the house
    deterministic-summation idiom; float32→double casts are exact),
    then ONE fixed-order float expression, ``+ 0``-guarded.

    Gated (pca_gates_ok must be TRUE; the oracle emits TRUE): with
    p = explainedVariance of the centered PCA(k=4) fit, (a) p is
    nonincreasing, (b) Σp ≤ 1, (c) p₁ ≥ max_j var_j / Σ_j var_j — the
    largest eigenvalue of a covariance matrix dominates its largest
    diagonal entry, and the RATIO form cancels the n vs n−1
    denominator between MLlib's covariance and the oracle's population
    moments. Any eigensolver/centering regression flips the gate on
    all 64 rows → driver red row.

    Scale: the moment pass is one shuffle keyed by dim (64 groups; at
    100 TB the ordered fold becomes a two-level fold over fixed-size
    chunks, same associativity-free discipline); the PCA fit is
    MLlib's distributed Gramian (O(d²) driver solve, d=64)."""
    from pyspark.ml import Pipeline
    from pyspark.ml.feature import PCA, StandardScaler
    from pyspark.ml.functions import array_to_vector

    em = load_table(spark, sf_dir, "embeddings")
    ex = em.select(
        "vec_id", F.posexplode("embedding").alias("pos", "raw")
    ).select(
        "vec_id",
        (F.col("pos") + 1).cast("bigint").alias("dim"),
        F.col("raw").cast("double").alias("v"),
    )
    ordered = F.transform(
        F.array_sort(F.collect_list(F.struct("vec_id", "v"))),
        lambda s: s["v"],
    )
    # localCheckpoint: the gate summary collect() below and the returned
    # frame both read this 64-row aggregate — without it the heavy
    # posexplode + per-dim ordered-fold pass would execute twice
    # (round-9 close review). eager=True materializes now; unlike a bare
    # persist() the checkpointed blocks are released by the context
    # cleaner when the frame is GC'd, so a 600-query sweep doesn't
    # accumulate them in executor storage (r09 ADVICE; house pattern
    # analytics.py:1507).
    moments = ex.groupBy("dim").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_vecs"),
        F.aggregate(ordered, F.lit(0.0), lambda a, x: a + x).alias("s1"),
        F.aggregate(ordered, F.lit(0.0), lambda a, x: a + x * x).alias("s2"),
    ).localCheckpoint(eager=True)
    nd = F.col("n_vecs").cast("double")
    var_expr = (F.col("s2") - F.col("s1") * F.col("s1") / nd) / nd

    # MLlib eigen-spectrum gate (driver-side: explainedVariance is a
    # driver object by construction; the 1-row moment summary is the
    # only collect and is dimension-bounded).
    pipe = Pipeline(
        stages=[
            StandardScaler(
                inputCol="raw_vec", outputCol="centered",
                withMean=True, withStd=False,
            ),
            PCA(k=4, inputCol="centered", outputCol="pc"),
        ]
    )
    to_double = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    fitted = pipe.fit(
        em.select("vec_id", array_to_vector(to_double).alias("raw_vec"))
    )
    p = list(fitted.stages[-1].explainedVariance)
    summary = moments.agg(
        F.max(var_expr).alias("max_var"), F.sum(var_expr).alias("tot_var")
    ).collect()[0]
    gates_ok = (
        all(p[i] + PCA_GATE_TOL >= p[i + 1] for i in range(len(p) - 1))
        and sum(p) <= 1.0 + PCA_GATE_TOL
        and p[0] + PCA_GATE_TOL >= summary["max_var"] / summary["tot_var"]
    )
    return moments.select(
        "dim",
        "n_vecs",
        F.round(var_expr, 6).alias("var_pop"),
        F.lit(bool(gates_ok)).alias("pca_gates_ok"),
    )
