"""Round-10 stock tranche: never-certified spare carriers for the
r11/r12 driver-window rotations.

The r10 rotation (registry.py) drains the ``lm`` and ``mapInPandas``
REQUIRED_FAMILY_TAGs to zero never-certified spares (all three of each
entered the window as judge-directed must-enters) and dips ~34 other
tags from 3-deep to 2-deep. This tranche restores every tag to >= 3
never-certified SQL-oracled spares, per the stocking rule SURVEY §12
set in round 6 and the r09 verdict item 5.

Same contract as every other operator module: idiomatic Spark DataFrame
plan + independently-formulated DuckDB oracle, identical aliases both
sides, exact-integer arithmetic up to one final fixed-order float
expression (ordered in-row folds for any cross-row float reduction),
-0.0 ``+ 0`` guards on ROUNDs that can land on zero, decimal(38,0)/
HUGEINT accumulators wherever an int64 product/sum could wrap at 100 TB,
and a scale story per docstring. Every carrier passes the full gating
battery (tri-SF bit-exact oracle, dtype kinds, two-config partition
robustness, replay pytest) before it is eligible for a window.
"""

from __future__ import annotations

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from big_data_audio_classification_spark.registry import query
from big_data_audio_classification_spark.sources.catalog import load_table

# ---------------------------------------------------------------------------
# lm: add-k (Laplace / Lidstone) smoothed query log-likelihood
# ---------------------------------------------------------------------------

ADDK_K = 0.5  # Lidstone's half — the Jeffreys-prior member of the family
ADDK_TERMS = ("data", "query")


def _eq(term: str):
    # Single-arg lambda factory (r09 lesson): F.filter dispatches a
    # TWO-arg lambda as (element, index), so the default-arg capture
    # idiom would bind the positional index, not the closed-over term.
    return lambda t: t == term


def _addk_sql() -> str:
    tf_cols = ", ".join(
        f"CAST(len(list_filter(l, t -> t = '{t}')) AS BIGINT) AS tf{i}"
        for i, t in enumerate(ADDK_TERMS, 1)
    )
    ll = " + ".join(
        f"LN((tf{i} + {ADDK_K}) / (dl + {ADDK_K} * vsize))"
        for i in range(1, len(ADDK_TERMS) + 1)
    )
    return f"""
        WITH toks AS (
            SELECT doc_id,
                   list_filter(string_split(text, ' '), t -> t <> '') AS l
            FROM documents
        ),
        pd AS (
            SELECT doc_id, CAST(len(l) AS BIGINT) AS dl, {tf_cols}
            FROM toks WHERE len(l) > 0
        ),
        vocab AS (
            SELECT CAST(COUNT(DISTINCT tok) AS DOUBLE) AS vsize
            FROM (SELECT UNNEST(l) AS tok FROM toks)
        )
        SELECT doc_id, dl,
               {", ".join(f"tf{i}" for i in range(1, len(ADDK_TERMS) + 1))},
               ROUND({ll}, 6) AS query_loglik
        FROM pd, vocab
    """


@query("text_lm_laplace_addk", oracle=_addk_sql(), tags=("text", "lm", "documents"))
def text_lm_laplace_addk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ADD-k (Lidstone, k=0.5) smoothed query log-likelihood — the
    oldest smoothing rule in the family ledger (JM: fixed λ; Dirichlet:
    fixed prior; WB: diversity prior; GT/KN: count reallocation;
    add-k: flat pseudo-count): P(w|d) = (tf + k)/(dl + k·V) with V the
    CORPUS vocabulary size. Unlike the log-guarded WB/backoff
    smoothers, the argument is strictly positive by construction
    (tf + k >= k > 0), so no vocabulary shift can ever zero it — this
    carrier pins the family's no-guard-needed base case. Counts are
    exact integers computed ARRAY-SIDE (the token list never explodes
    for tf; V needs one distinct-token aggregate); the log-likelihood
    is one fixed-order 2-term float expression per row against a 1-row
    broadcast. 100 TB: one scan + one |docs|-row project + one
    distinct-token aggregate (map-side combinable)."""
    d = load_table(spark, sf_dir, "documents")
    from big_data_audio_classification_spark.operators.dedup import tokens_col

    toks = d.select("doc_id", tokens_col(F.col("text")).alias("l")).filter(
        F.size("l") > 0
    )
    per_doc = toks.select(
        "doc_id",
        F.size("l").cast("bigint").alias("dl"),
        *[
            F.size(F.filter("l", _eq(t))).cast("bigint").alias(f"tf{i}")
            for i, t in enumerate(ADDK_TERMS, 1)
        ],
    )
    vocab = (
        d.select(
            F.explode(tokens_col(F.col("text"))).alias("tok")
        )
        .agg(F.countDistinct("tok").cast("double").alias("vsize"))
    )
    ll = None
    for i in range(1, len(ADDK_TERMS) + 1):
        term = F.log(
            (F.col(f"tf{i}") + F.lit(ADDK_K))
            / (F.col("dl") + F.lit(ADDK_K) * F.col("vsize"))
        )
        ll = term if ll is None else ll + term
    return per_doc.crossJoin(F.broadcast(vocab)).select(
        "doc_id",
        "dl",
        *[f"tf{i}" for i in range(1, len(ADDK_TERMS) + 1)],
        F.round(ll, 6).alias("query_loglik"),
    )


# ---------------------------------------------------------------------------
# lm: source-vs-corpus unigram log-likelihood ratio (domain LM score)
# ---------------------------------------------------------------------------

LLR_TERMS = ("data", "table")


def _llr_sql() -> str:
    tf_cols = ", ".join(
        f"CAST(len(list_filter(l, t -> t = '{t}')) AS BIGINT) AS tf{i}"
        for i, t in enumerate(LLR_TERMS, 1)
    )
    scf_cols = ", ".join(
        f"CAST(SUM(tf{i}) AS BIGINT) AS scf{i}"
        for i in range(1, len(LLR_TERMS) + 1)
    )
    ccf_cols = ", ".join(
        f"CAST(SUM(scf{i}) AS BIGINT) AS ccf{i}"
        for i in range(1, len(LLR_TERMS) + 1)
    )
    llr = " + ".join(
        f"tf{i} * (LOG2((scf{i} + 1.0) / (slen + vsize))"
        f" - LOG2((ccf{i} + 1.0) / (clen + vsize)))"
        for i in range(1, len(LLR_TERMS) + 1)
    )
    return f"""
        WITH toks AS (
            SELECT doc_id, source,
                   list_filter(string_split(text, ' '), t -> t <> '') AS l
            FROM documents
        ),
        pd AS (
            SELECT doc_id, source, CAST(len(l) AS BIGINT) AS dl, {tf_cols}
            FROM toks WHERE len(l) > 0
        ),
        src AS (
            SELECT source, CAST(SUM(dl) AS BIGINT) AS slen, {scf_cols}
            FROM pd GROUP BY source
        ),
        corpus AS (
            SELECT CAST(SUM(slen) AS BIGINT) AS clen, {ccf_cols} FROM src
        ),
        vocab AS (
            SELECT CAST(COUNT(DISTINCT tok) AS DOUBLE) AS vsize
            FROM (SELECT UNNEST(l) AS tok FROM toks)
        )
        SELECT pd.doc_id, pd.source,
               {", ".join(f"tf{i}" for i in range(1, len(LLR_TERMS) + 1))},
               ROUND({llr}, 6) + 0 AS domain_llr
        FROM pd JOIN src ON pd.source = src.source, corpus, vocab
    """


@query("text_lm_source_loglik_ratio", oracle=_llr_sql(), tags=("text", "lm", "documents"))
def text_lm_source_loglik_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DOMAIN-vs-BACKGROUND unigram log-likelihood ratio — the
    in-domain data-selection score of Moore & Lewis (ACL 2010): each
    document scores Σ tf·(log2 P_src(w) − log2 P_corpus(w)) under its
    OWN source's add-one unigram LM vs the corpus LM. Positive = the
    probe terms are source-typical; the score family is the standard
    pretraining-corpus curation filter. All counts exact integers
    (array-side tf; source/corpus totals via two keyed aggregates);
    per-row LLR is ONE fixed-order float expression from six exact
    integers + two broadcast scalars, ``+ 0``-guarded (tf=0 rows score
    exactly 0 → DuckDB ROUND could emit -0.0). 100 TB: the source
    aggregate is |sources| rows, broadcast back — nothing but
    (doc_id, source, 2 ints) ever shuffles."""
    d = load_table(spark, sf_dir, "documents")
    from big_data_audio_classification_spark.operators.dedup import tokens_col

    toks = d.select(
        "doc_id", "source", tokens_col(F.col("text")).alias("l")
    ).filter(F.size("l") > 0)
    per_doc = toks.select(
        "doc_id",
        "source",
        F.size("l").cast("bigint").alias("dl"),
        *[
            F.size(F.filter("l", _eq(t))).cast("bigint").alias(f"tf{i}")
            for i, t in enumerate(LLR_TERMS, 1)
        ],
    )
    src = per_doc.groupBy("source").agg(
        F.sum("dl").cast("bigint").alias("slen"),
        *[
            F.sum(f"tf{i}").cast("bigint").alias(f"scf{i}")
            for i in range(1, len(LLR_TERMS) + 1)
        ],
    )
    corpus = src.agg(
        F.sum("slen").cast("bigint").alias("clen"),
        *[
            F.sum(f"scf{i}").cast("bigint").alias(f"ccf{i}")
            for i in range(1, len(LLR_TERMS) + 1)
        ],
    )
    vocab = (
        d.select(F.explode(tokens_col(F.col("text"))).alias("tok"))
        .agg(F.countDistinct("tok").cast("double").alias("vsize"))
    )
    llr = None
    for i in range(1, len(LLR_TERMS) + 1):
        term = F.col(f"tf{i}") * (
            F.log2(
                (F.col(f"scf{i}") + F.lit(1.0))
                / (F.col("slen") + F.col("vsize"))
            )
            - F.log2(
                (F.col(f"ccf{i}") + F.lit(1.0))
                / (F.col("clen") + F.col("vsize"))
            )
        )
        llr = term if llr is None else llr + term
    return (
        per_doc.join(F.broadcast(src), "source")
        .crossJoin(F.broadcast(corpus))
        .crossJoin(F.broadcast(vocab))
        .select(
            "doc_id",
            "source",
            *[f"tf{i}" for i in range(1, len(LLR_TERMS) + 1)],
            F.round(llr, 6).alias("domain_llr"),
        )
    )


# ---------------------------------------------------------------------------
# lm: bigram out-of-vocabulary (coverage) rate against the corpus model
# ---------------------------------------------------------------------------

OOV_MIN_DOCS = 2  # a bigram is "in vocabulary" if seen in >= 2 documents


def _bigram_oov_sql() -> str:
    return f"""
        WITH toks AS (
            SELECT doc_id,
                   list_filter(string_split(text, ' '), t -> t <> '') AS l
            FROM documents
        ),
        bg AS (
            SELECT doc_id,
                   UNNEST(list_transform(
                       range(len(l) - 1),
                       i -> l[i + 1] || ' ' || l[i + 2])) AS bigram
            FROM toks WHERE len(l) >= 2
        ),
        vocab AS (
            SELECT bigram
            FROM bg GROUP BY bigram
            HAVING COUNT(DISTINCT doc_id) >= {OOV_MIN_DOCS}
        ),
        per_doc AS (
            SELECT bg.doc_id,
                   CAST(COUNT(*) AS BIGINT) AS n_bigrams,
                   CAST(SUM(CASE WHEN v.bigram IS NULL THEN 0 ELSE 1 END)
                        AS BIGINT) AS n_covered
            FROM bg LEFT JOIN vocab v ON bg.bigram = v.bigram
            GROUP BY bg.doc_id
        )
        SELECT t.doc_id,
               COALESCE(p.n_bigrams, 0) AS n_bigrams,
               COALESCE(p.n_covered, 0) AS n_covered,
               CASE WHEN p.n_bigrams > 0
                    THEN ROUND(1.0 - CAST(p.n_covered AS DOUBLE)
                               / p.n_bigrams, 6) + 0
                    ELSE NULL END AS oov_rate
        FROM toks t LEFT JOIN per_doc p ON t.doc_id = p.doc_id
    """


@query("text_lm_bigram_oov_rate", oracle=_bigram_oov_sql(), tags=("text", "lm", "documents"))
def text_lm_bigram_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BIGRAM OOV RATE against the corpus bigram vocabulary — the LM
    evaluation axis the smoothing family presumes: how much of each
    document's bigram stream is COVERED by bigrams attested in >= 2
    distinct documents (a bigram always attests itself, so the >= 2
    floor makes coverage mean 'seen elsewhere'). High OOV = the
    document the n-gram LM will serve worst, and the standard
    contamination/novelty triage in corpus curation. Adjacent bigrams
    via the house positional formulation (Spark slice+arrays_zip vs
    DuckDB list_transform(range)); the vocabulary is one
    doc-distinct-count aggregate; coverage is a LEFT JOIN + exact
    counts; oov_rate is one float division, ``+ 0``-guarded (a fully
    covered document rounds to exactly 0). Documents with < 2 tokens
    survive with n_bigrams=0 / NULL rate via the outer join — a
    coverage oracle must never drop rows. 100 TB: bigram strings
    shuffle once for the vocab aggregate and once for the probe join —
    both keyed on the bigram, AQE-coalesced."""
    d = load_table(spark, sf_dir, "documents")
    from big_data_audio_classification_spark.operators.dedup import tokens_col

    toks = d.select("doc_id", tokens_col(F.col("text")).alias("l"))
    n = F.size("l")
    bg = toks.filter(n >= 2).select(
        "doc_id",
        F.explode(
            F.zip_with(
                F.slice(F.col("l"), 1, n - 1),
                F.slice(F.col("l"), 2, n - 1),
                lambda a, b: F.concat_ws(" ", a, b),
            )
        ).alias("bigram"),
    )
    vocab = (
        bg.groupBy("bigram")
        .agg(F.countDistinct("doc_id").alias("ndocs"))
        .filter(F.col("ndocs") >= OOV_MIN_DOCS)
        .select("bigram")
    )
    per_doc = (
        bg.join(vocab.withColumn("hit", F.lit(1)), "bigram", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_bigrams"),
            F.sum(F.when(F.col("hit").isNull(), 0).otherwise(1))
            .cast("bigint")
            .alias("n_covered"),
        )
    )
    return (
        toks.select("doc_id")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_bigrams", F.lit(0)).cast("bigint").alias("n_bigrams"),
            F.coalesce("n_covered", F.lit(0)).cast("bigint").alias("n_covered"),
            F.when(
                F.col("n_bigrams") > 0,
                F.round(
                    1.0 - F.col("n_covered").cast("double") / F.col("n_bigrams"),
                    6,
                ),
            ).alias("oov_rate"),
        )
    )


# ---------------------------------------------------------------------------
# mapInPandas: Shannon entropy of the payload byte distribution
# ---------------------------------------------------------------------------


@query(
    "mm_payload_shannon_entropy",
    oracle="""
        WITH ch AS (
            SELECT doc_id,
                   ascii(UNNEST(string_split_regex(text, ''))) AS b
            FROM documents
        ),
        counts AS (
            SELECT doc_id, b, CAST(COUNT(*) AS BIGINT) AS c
            FROM ch WHERE b IS NOT NULL AND b > 0
            GROUP BY doc_id, b
        ),
        folded AS (
            SELECT doc_id,
                   CAST(SUM(c) AS BIGINT) AS n_bytes,
                   CAST(COUNT(*) AS BIGINT) AS n_distinct,
                   list_sum(list(c * LOG2(c) ORDER BY b)) AS s
            FROM counts GROUP BY doc_id
        )
        SELECT d.doc_id,
               COALESCE(f.n_bytes, 0)    AS n_bytes,
               COALESCE(f.n_distinct, 0) AS n_distinct,
               CASE WHEN f.n_bytes > 0
                    THEN ROUND(LOG2(f.n_bytes) - f.s / f.n_bytes, 6) + 0
                    ELSE NULL END AS entropy_bits
        FROM documents d LEFT JOIN folded f ON d.doc_id = f.doc_id
    """,
    tags=("multimodal", "mapInPandas", "documents"),
)
def mm_payload_shannon_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SHANNON ENTROPY of the payload byte distribution via
    ``mapInPandas`` — the compressibility/randomness probe every
    binary-ingest pipeline runs before deciding codec treatment (text
    ~4.5 bits; ciphertext ~8). The kernel bincounts bytes in numpy and
    folds c·log2(c) SEQUENTIALLY in ascending byte order — exactly the
    oracle's ``list_sum(list(c*LOG2(c) ORDER BY b))`` — then H =
    log2(n) − s/n as ONE fixed-order float expression (the algebraic
    restatement of −Σp·log2 p that keeps every intermediate exact-int
    derived; a np.sum pairwise reduction would be ULP-divergent from
    the SQL fold). ``+ 0``-guarded on BOTH sides: a single-byte-value
    payload gives log2(n) − n·log2(n)/n, which can land a half-ULP
    below zero. ASCII contract asserted per document (byte ==
    codepoint); empty payloads survive as NULL via the LEFT JOIN. One
    Arrow row per document; at 100 TB the kernel rides the decode
    scan, nothing shuffles."""
    import math

    import numpy as np

    def batches(it):
        for pdf in it:
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                assert text.isascii(), (
                    f"doc {doc_id}: non-ASCII text breaks the "
                    "byte==codepoint oracle contract"
                )
                b = np.frombuffer(text.encode("utf-8"), dtype=np.uint8)
                n = int(b.size)
                if n:
                    counts = np.bincount(b)
                    present = counts[counts > 0]
                    s = 0.0
                    for c in present:  # ascending byte order: bincount
                        c = float(int(c))
                        s += c * math.log2(c)
                    h = round(math.log2(n) - s / n, 6) + 0
                    rows.append((int(doc_id), n, int(present.size), h))
                else:
                    rows.append((int(doc_id), 0, 0, None))
            if rows:
                yield pd.DataFrame(
                    rows,
                    columns=["doc_id", "n_bytes", "n_distinct", "entropy_bits"],
                )

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return d.mapInPandas(
        batches,
        "doc_id long, n_bytes long, n_distinct long, entropy_bits double",
    )


# ---------------------------------------------------------------------------
# mapInPandas: XOR checksum + per-byte popcount parity census
# ---------------------------------------------------------------------------


@query(
    "mm_payload_xor_parity",
    oracle="""
        WITH ch AS (
            SELECT doc_id,
                   CAST(ascii(UNNEST(string_split_regex(text, '')))
                        AS BIGINT) AS b
            FROM documents
        ),
        s AS (
            SELECT doc_id,
                   CAST(COUNT(*) AS BIGINT)            AS n_bytes,
                   CAST(bit_xor(b) AS BIGINT)          AS xor_byte,
                   CAST(SUM(bit_count(b)) AS BIGINT)   AS total_popcount,
                   CAST(SUM(bit_count(b) % 2) AS BIGINT) AS n_odd_parity
            FROM ch WHERE b IS NOT NULL AND b > 0
            GROUP BY doc_id
        )
        SELECT d.doc_id,
               COALESCE(s.n_bytes, 0)        AS n_bytes,
               COALESCE(s.xor_byte, 0)       AS xor_byte,
               COALESCE(s.total_popcount, 0) AS total_popcount,
               COALESCE(s.n_odd_parity, 0)   AS n_odd_parity
        FROM documents d LEFT JOIN s ON d.doc_id = s.doc_id
    """,
    tags=("multimodal", "mapInPandas", "documents"),
)
def mm_payload_xor_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XOR CHECKSUM + POPCOUNT PARITY census via ``mapInPandas`` — the
    longitudinal-redundancy check (LRC) and per-byte parity bits that
    serial-framing and RAID-style integrity layers compute, here as a
    vectorized Arrow kernel: xor_byte = ⊕ all bytes
    (np.bitwise_xor.reduce), total_popcount = Σ bit_count(b) via
    np.unpackbits, n_odd_parity = bytes whose popcount is odd. The
    oracle restates all three RELATIONALLY with DuckDB's bit_xor
    aggregate and bit_count scalar — genuinely independent
    formulations of the same pure integers (XOR is order-free, so no
    fold discipline needed). Empty payloads pin 0 via the documents
    LEFT JOIN (the Adler/Fletcher review class). One Arrow row per
    document; at 100 TB the kernel rides the payload scan."""
    import numpy as np

    def batches(it):
        for pdf in it:
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                assert text.isascii(), (
                    f"doc {doc_id}: non-ASCII text breaks the "
                    "byte==codepoint oracle contract"
                )
                b = np.frombuffer(text.encode("utf-8"), dtype=np.uint8)
                if b.size:
                    pops = np.unpackbits(b.reshape(-1, 1), axis=1).sum(axis=1)
                    rows.append(
                        (
                            int(doc_id),
                            int(b.size),
                            int(np.bitwise_xor.reduce(b)),
                            int(pops.sum(dtype=np.int64)),
                            int((pops % 2).sum(dtype=np.int64)),
                        )
                    )
                else:
                    rows.append((int(doc_id), 0, 0, 0, 0))
            if rows:
                yield pd.DataFrame(
                    rows,
                    columns=[
                        "doc_id",
                        "n_bytes",
                        "xor_byte",
                        "total_popcount",
                        "n_odd_parity",
                    ],
                )

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return d.mapInPandas(
        batches,
        "doc_id long, n_bytes long, xor_byte long, total_popcount long,"
        " n_odd_parity long",
    )


# ---------------------------------------------------------------------------
# mapInPandas: first-difference (delta) profile of the payload bytes
# ---------------------------------------------------------------------------


@query(
    "mm_payload_diff_profile",
    oracle="""
        WITH ch AS (
            SELECT doc_id,
                   CAST(ascii(UNNEST(string_split_regex(text, '')))
                        AS BIGINT) AS b,
                   CAST(generate_subscripts(
                        string_split_regex(text, ''), 1) AS BIGINT) AS i
            FROM documents
        ),
        d2 AS (
            SELECT a.doc_id, b2.b - a.b AS d
            FROM ch a JOIN ch b2
              ON a.doc_id = b2.doc_id AND b2.i = a.i + 1
        ),
        s AS (
            SELECT doc_id,
                   CAST(COUNT(*) AS BIGINT)                     AS n_steps,
                   CAST(SUM(CASE WHEN d > 0 THEN 1 ELSE 0 END) AS BIGINT)
                                                                AS n_up,
                   CAST(SUM(CASE WHEN d < 0 THEN 1 ELSE 0 END) AS BIGINT)
                                                                AS n_down,
                   CAST(SUM(ABS(d)) AS BIGINT)                  AS sum_abs_delta,
                   CAST(MAX(ABS(d)) AS BIGINT)                  AS max_abs_delta
            FROM d2 GROUP BY doc_id
        )
        SELECT doc.doc_id,
               COALESCE(s.n_steps, 0)       AS n_steps,
               COALESCE(s.n_up, 0)          AS n_up,
               COALESCE(s.n_down, 0)        AS n_down,
               COALESCE(s.sum_abs_delta, 0) AS sum_abs_delta,
               COALESCE(s.max_abs_delta, 0) AS max_abs_delta
        FROM documents doc LEFT JOIN s ON doc.doc_id = s.doc_id
    """,
    tags=("multimodal", "mapInPandas", "documents"),
)
def mm_payload_diff_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FIRST-DIFFERENCE (delta-encoding) profile of the payload bytes
    via ``mapInPandas`` — the statistic a delta/varint codec consults
    before choosing an encoding (small |Δ| = delta-friendly, monotone
    runs = RLE-on-delta friendly): step direction census (n_up /
    n_down), total and max |Δ|, all from np.diff on the byte array.
    The oracle restates the diffs RELATIONALLY as a positional
    self-join on i+1 (generate_subscripts — never bare ROW_NUMBER) —
    an independent formulation of the same exact integers. Payloads
    shorter than 2 bytes pin all-zeros via the documents LEFT JOIN.
    One Arrow row per document; at 100 TB the kernel rides the
    payload scan, the oracle's join stays inside one document (the
    production form IS the kernel — the join restatement exists only
    to cross-check it)."""
    import numpy as np

    def batches(it):
        for pdf in it:
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                assert text.isascii(), (
                    f"doc {doc_id}: non-ASCII text breaks the "
                    "byte==codepoint oracle contract"
                )
                b = np.frombuffer(text.encode("utf-8"), dtype=np.uint8)
                if b.size >= 2:
                    dd = np.diff(b.astype(np.int64))
                    ad = np.abs(dd)
                    rows.append(
                        (
                            int(doc_id),
                            int(dd.size),
                            int((dd > 0).sum()),
                            int((dd < 0).sum()),
                            int(ad.sum(dtype=np.int64)),
                            int(ad.max()),
                        )
                    )
                else:
                    rows.append((int(doc_id), 0, 0, 0, 0, 0))
            if rows:
                yield pd.DataFrame(
                    rows,
                    columns=[
                        "doc_id",
                        "n_steps",
                        "n_up",
                        "n_down",
                        "sum_abs_delta",
                        "max_abs_delta",
                    ],
                )

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return d.mapInPandas(
        batches,
        "doc_id long, n_steps long, n_up long, n_down long,"
        " sum_abs_delta long, max_abs_delta long",
    )


# ---------------------------------------------------------------------------
# udaf/pandas: Shannon entropy of the cents last-digit distribution
# ---------------------------------------------------------------------------


@query(
    "agg_pandas_udaf_entropy",
    oracle="""
        WITH x AS (
            SELECT event_type,
                   ABS(CAST(ROUND(value * 100) AS BIGINT)) % 10 AS digit
            FROM events
        ),
        counts AS (
            SELECT event_type, digit, CAST(COUNT(*) AS BIGINT) AS c
            FROM x GROUP BY event_type, digit
        )
        SELECT event_type,
               CAST(SUM(c) AS BIGINT)   AS n,
               CAST(COUNT(*) AS BIGINT) AS n_digits,
               ROUND(LOG2(CAST(SUM(c) AS DOUBLE))
                     - list_sum(list(c * LOG2(c) ORDER BY digit))
                       / SUM(c), 6) + 0 AS digit_entropy_bits
        FROM counts GROUP BY event_type
    """,
    tags=("aggregate", "udaf", "pandas", "events"),
)
def agg_pandas_udaf_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPED PANDAS-UDAF ENTROPY: Shannon entropy of the cents
    LAST-DIGIT distribution per event type — the Benford-style
    fabricated-data probe (a synthetic uniform generator scores ~log2
    10 ≈ 3.32 bits; human-priced values cluster on 0/5/9 digits). The
    kernel is a grouped-agg pandas UDF (Arrow batch per group):
    np.bincount over digits 0..9 then the SEQUENTIAL ascending-digit
    c·log2(c) fold, H = log2(n) − s/n — the identical formula sequence
    the oracle folds with ``list_sum(list(... ORDER BY digit))``.
    Row counts ride through Arrow too (grouped-agg pandas UDFs cannot
    mix with JVM aggregates in one agg — the r05 n_rows kernel
    pattern). Digits via abs(cents) % 10 on BOTH engines (DuckDB %
    follows the dividend sign; abs pins the convention). ``+ 0``:
    a single-digit group lands exactly on zero. 100 TB: partial
    aggregation doesn't apply to UDAFs — the shuffle is keyed on
    event_type (5 groups), so the entropy kernel sees one Arrow
    stream per type; the oracle's relational form is the map-side
    combinable production path."""
    import math

    import numpy as np
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def n_rows(v: pd.Series) -> int:
        return int(len(v))

    @pandas_udf("long")
    def n_digits(v: pd.Series) -> int:
        cents = np.rint(v.to_numpy(dtype=np.float64) * 100).astype(np.int64)
        return int(np.unique(np.abs(cents) % 10).size)

    @pandas_udf("double")
    def digit_entropy(v: pd.Series) -> float:
        cents = np.rint(v.to_numpy(dtype=np.float64) * 100).astype(np.int64)
        digits = np.abs(cents) % 10
        counts = np.bincount(digits, minlength=10)
        n = int(digits.size)
        s = 0.0
        for c in counts:  # ascending digit order == oracle's ORDER BY
            if c > 0:
                c = float(int(c))
                s += c * math.log2(c)
        return round(math.log2(n) - s / n, 6) + 0

    e = load_table(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        n_rows("value").alias("n"),
        n_digits("value").alias("n_digits"),
        digit_entropy("value").alias("digit_entropy_bits"),
    )


# ---------------------------------------------------------------------------
# asof + window-time: purchase latency since the user's prior error
# ---------------------------------------------------------------------------

ASOF_ERR_TOL_S = 3600  # backward tolerance: errors older than 1h don't match


@query(
    "join_asof_prior_error_latency",
    oracle=f"""
        WITH p AS (
            SELECT e.ts,
                   (SELECT MAX(e2.ts) FROM events e2
                    WHERE e2.user_id = e.user_id
                      AND e2.event_type = 'error'
                      AND e2.ts <= e.ts) AS prior_err
            FROM events e WHERE e.event_type = 'purchase'
        ),
        lat AS (
            SELECT to_timestamp((epoch_us(ts) // 3600000000) * 3600)
                       AS wstart,
                   CASE WHEN prior_err IS NOT NULL
                         AND epoch_us(ts) - epoch_us(prior_err)
                             <= {ASOF_ERR_TOL_S * 1_000_000}
                        THEN epoch_us(ts) - epoch_us(prior_err)
                        ELSE NULL END AS lat_us
            FROM p
        )
        SELECT strftime(wstart, '%Y-%m-%d %H:%M:%S') AS window_start,
               CAST(COUNT(*) AS BIGINT)       AS n_purchases,
               CAST(COUNT(lat_us) AS BIGINT)  AS n_matched,
               CASE WHEN COUNT(lat_us) > 0
                    THEN ROUND(CAST(CAST(SUM(lat_us) AS HUGEINT) AS DOUBLE)
                               / COUNT(lat_us) / 1000000.0, 6)
                    ELSE NULL END AS mean_latency_sec
        FROM lat GROUP BY wstart
    """,
    tags=("join", "asof", "window-time", "events"),
)
def join_asof_prior_error_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BACKWARD AS-OF join + TUMBLING-WINDOW rollup in one operator:
    each purchase matches the same user's most recent error at-or-
    before it (1h tolerance), then hourly windows aggregate match rate
    and mean error→purchase latency — the incident-impact dashboard
    shape. The as-of rides the UNION + running ``last(ignorenulls)``
    formulation (one shuffle keyed by user, no pair explosion; ties
    ordered error-before-purchase then event_id so an equal-timestamp
    error is visible to the purchase); the oracle restates it as a
    correlated MAX subquery — independent formulations of the as-of
    contract. Latencies are EXACT integer microseconds; the sum
    accumulates in DECIMAL(38,0)/HUGEINT (Σ lat_us reaches 3.6e9 per
    row — int64 wraps past ~2.5e9 matched rows); the mean is one float
    division. Tumbling boundary = Spark ``window('1 hour')`` vs integer
    epoch floor-division. 100 TB: user-keyed shuffle + window-keyed
    aggregate, both AQE-coalesced; tolerance lives in the expression,
    never a WHERE that would drop unmatched purchases."""
    e = load_table(spark, sf_dir, "events")
    base = e.filter(F.col("event_type").isin("purchase", "error")).select(
        "user_id",
        "ts",
        "event_id",
        (F.col("event_type") == "purchase").alias("is_p"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "is_p", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    prior = F.last(
        F.when(~F.col("is_p"), F.col("ts")), ignorenulls=True
    ).over(w)
    p = base.withColumn("prior_err", prior).filter(F.col("is_p"))
    lat_us = F.unix_micros("ts") - F.unix_micros("prior_err")
    lat = p.select(
        F.window("ts", "1 hour").alias("w"),
        F.when(
            F.col("prior_err").isNotNull()
            & (lat_us <= ASOF_ERR_TOL_S * 1_000_000),
            lat_us,
        ).alias("lat_us"),
    )
    agg = lat.groupBy(F.col("w.start").alias("wstart")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_purchases"),
        F.count("lat_us").cast("bigint").alias("n_matched"),
        F.sum(F.col("lat_us").cast("decimal(38,0)")).alias("s"),
    )
    return agg.select(
        F.date_format("wstart", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
        "n_purchases",
        "n_matched",
        F.when(
            F.col("n_matched") > 0,
            F.round(
                F.col("s").cast("double") / F.col("n_matched") / 1_000_000.0,
                6,
            ),
        ).alias("mean_latency_sec"),
    )


# ---------------------------------------------------------------------------
# setop: weekday-vs-weekend active-user set algebra per event type
# ---------------------------------------------------------------------------


@query(
    "set_except_weekday_weekend",
    oracle="""
        WITH wd AS (
            SELECT DISTINCT event_type, user_id FROM events
            WHERE dayofweek(ts) NOT IN (0, 6)
        ),
        we AS (
            SELECT DISTINCT event_type, user_id FROM events
            WHERE dayofweek(ts) IN (0, 6)
        ),
        wd_only AS (SELECT * FROM wd EXCEPT SELECT * FROM we),
        we_only AS (SELECT * FROM we EXCEPT SELECT * FROM wd),
        both_ AS (SELECT * FROM wd INTERSECT SELECT * FROM we)
        SELECT t.event_type,
               COALESCE(a.n, 0) AS n_weekday_only,
               COALESCE(b.n, 0) AS n_weekend_only,
               COALESCE(c.n, 0) AS n_both
        FROM (SELECT DISTINCT event_type FROM events) t
        LEFT JOIN (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n
                   FROM wd_only GROUP BY event_type) a
               ON t.event_type = a.event_type
        LEFT JOIN (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n
                   FROM we_only GROUP BY event_type) b
               ON t.event_type = b.event_type
        LEFT JOIN (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n
                   FROM both_ GROUP BY event_type) c
               ON t.event_type = c.event_type
    """,
    tags=("relational", "setop", "events"),
)
def set_except_weekday_weekend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WEEKDAY/WEEKEND audience set algebra: per event type, how many
    users act ONLY on weekdays (EXCEPT), only on weekends (reverse
    EXCEPT), or both (INTERSECT) — three true set operations over the
    composite (event_type, user_id) key, not boolean-flag aggregation
    in disguise: the operator under test is Spark's EXCEPT/INTERSECT
    DISTINCT rewrite (anti/semi hash joins after a distinct — visible
    in the plan) against DuckDB's native set operators. Day-of-week
    convention pinned cross-engine (Spark dayofweek = DuckDB
    dayofweek + 1, so weekend is Spark {1,7} / DuckDB {0,6} — the r05
    hazard class). Event types that lose every user to one side keep a
    zero row via the outer spine. 100 TB: each leg is one distinct on
    (type, user) — map-side combinable — and the set ops shuffle the
    deduplicated keys only."""
    e = load_table(spark, sf_dir, "events")
    dow = F.dayofweek("ts")  # 1=Sunday .. 7=Saturday
    wd = (
        e.filter(~dow.isin(1, 7)).select("event_type", "user_id").distinct()
    )
    we = e.filter(dow.isin(1, 7)).select("event_type", "user_id").distinct()
    wd_only = wd.exceptAll(we.intersect(wd))  # == EXCEPT DISTINCT on distinct inputs
    we_only = we.exceptAll(wd.intersect(we))
    both = wd.intersect(we)
    spine = e.select("event_type").distinct()

    def _cnt(df: DataFrame, name: str) -> DataFrame:
        return df.groupBy("event_type").agg(
            F.count(F.lit(1)).cast("bigint").alias(name)
        )

    out = (
        spine.join(_cnt(wd_only, "n_weekday_only"), "event_type", "left")
        .join(_cnt(we_only, "n_weekend_only"), "event_type", "left")
        .join(_cnt(both, "n_both"), "event_type", "left")
    )
    return out.select(
        "event_type",
        F.coalesce("n_weekday_only", F.lit(0)).cast("bigint").alias("n_weekday_only"),
        F.coalesce("n_weekend_only", F.lit(0)).cast("bigint").alias("n_weekend_only"),
        F.coalesce("n_both", F.lit(0)).cast("bigint").alias("n_both"),
    )


# ---------------------------------------------------------------------------
# grouping: CUBE cells scored as a share of their PARENT margin
# ---------------------------------------------------------------------------


@query(
    "agg_cube_share_of_parent",
    oracle="""
        WITH c AS (
            SELECT grouping(o_orderpriority, o_orderstatus) AS gid,
                   o_orderpriority AS priority, o_orderstatus AS status,
                   CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                        AS BIGINT) AS cents,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM orders GROUP BY CUBE(o_orderpriority, o_orderstatus)
        ),
        keyed AS (
            SELECT *,
                   CASE gid WHEN 0 THEN 'P:' || priority
                            WHEN 1 THEN 'ALL' WHEN 2 THEN 'ALL'
                            ELSE NULL END AS parent_key,
                   CASE gid WHEN 1 THEN 'P:' || priority
                            WHEN 3 THEN 'ALL'
                            ELSE NULL END AS self_key
            FROM c
        )
        SELECT CAST(ch.gid AS BIGINT)          AS gid,
               COALESCE(ch.priority, 'ALL')    AS priority,
               COALESCE(ch.status, 'ALL')      AS status,
               ch.n, ch.cents,
               CASE WHEN pa.cents IS NOT NULL
                    THEN ROUND(CAST(ch.cents AS DOUBLE) / pa.cents, 6) + 0
                    ELSE NULL END AS share_of_parent
        FROM keyed ch LEFT JOIN keyed pa ON ch.parent_key = pa.self_key
    """,
    tags=("aggregate", "grouping", "orders"),
)
def agg_cube_share_of_parent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE cells scored as a SHARE OF THEIR PARENT margin — the drill-
    down ratio an OLAP frontend renders next to every cell ((p,s) over
    (p,ALL); (p,ALL) and (ALL,s) over the grand total; the grand total
    itself has no parent → NULL): one CUBE aggregate self-joined on a
    derived parent key built from the GROUPING bitmask (Spark
    grouping_id == DuckDB grouping(a,b) — same standard bit order,
    verified r10). Distinct from ``agg_cube_share_of_total`` (every
    cell over ONE denominator — no hierarchy walk). Cents exact;
    share is one float division, ``+ 0``-guarded. 100 TB: the cube is
    |priorities|×|statuses| + margins (~30 rows) after one map-side-
    combinable aggregate; the parent join is a broadcast of those same
    rows — no second scan."""
    o = load_table(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("bigint")
    c = (
        o.select(
            F.col("o_orderpriority").alias("priority"),
            F.col("o_orderstatus").alias("status"),
            cents.alias("cents"),
        )
        .cube("priority", "status")
        .agg(
            F.grouping_id().alias("gid"),
            F.sum("cents").cast("bigint").alias("cents"),
            F.count(F.lit(1)).cast("bigint").alias("n"),
        )
    )
    keyed = c.select(
        "*",
        F.when(F.col("gid") == 0, F.concat(F.lit("P:"), F.col("priority")))
        .when(F.col("gid").isin(1, 2), F.lit("ALL"))
        .alias("parent_key"),
        F.when(F.col("gid") == 1, F.concat(F.lit("P:"), F.col("priority")))
        .when(F.col("gid") == 3, F.lit("ALL"))
        .alias("self_key"),
    )
    pa = keyed.select(
        F.col("self_key").alias("pa_key"), F.col("cents").alias("pa_cents")
    ).filter(F.col("pa_key").isNotNull())
    return (
        keyed.join(
            F.broadcast(pa), keyed["parent_key"] == pa["pa_key"], "left"
        )
        .select(
            F.col("gid").cast("bigint").alias("gid"),
            F.coalesce("priority", F.lit("ALL")).alias("priority"),
            F.coalesce("status", F.lit("ALL")).alias("status"),
            "n",
            "cents",
            F.when(
                F.col("pa_cents").isNotNull(),
                F.round(F.col("cents").cast("double") / F.col("pa_cents"), 6),
            ).alias("share_of_parent"),
        )
    )


# ---------------------------------------------------------------------------
# sketch + skew: portable Count-Min heavy-hitter workflow
# ---------------------------------------------------------------------------

CMHH_DEPTH = 4
CMHH_WIDTH = 64
CMHH_TOPK = 10
_CMHH_M = 2147483647  # 2^31 - 1, matches the MinHash permutation family
_CMHH_A = [2 * j + 3 for j in range(CMHH_DEPTH)]
_CMHH_B = [7919 * (j + 1) % _CMHH_M for j in range(CMHH_DEPTH)]


def _cmhh_sql() -> str:
    rows = ", ".join(
        f"((hv * {_CMHH_A[j]} + {_CMHH_B[j]}) % {_CMHH_M}) % {CMHH_WIDTH}"
        for j in range(CMHH_DEPTH)
    )
    ests = ", ".join(
        f"""(SELECT cm.c FROM cm
             WHERE cm.j = {j} AND cm.b =
                   ((t.hv * {_CMHH_A[j]} + {_CMHH_B[j]}) % {_CMHH_M})
                   % {CMHH_WIDTH})"""
        for j in range(CMHH_DEPTH)
    )
    return f"""
        WITH h AS (
            SELECT user_id,
                   CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))
                        AS BIGINT) AS hv
            FROM events
        ),
        buckets AS (
            SELECT UNNEST([{rows}]) AS b,
                   UNNEST(range({CMHH_DEPTH})) AS j
            FROM h
        ),
        cm AS (
            SELECT j, b, CAST(COUNT(*) AS BIGINT) AS c
            FROM buckets GROUP BY j, b
        ),
        exact AS (
            SELECT user_id, MIN(hv) AS hv, CAST(COUNT(*) AS BIGINT) AS exact_cnt
            FROM h GROUP BY user_id
        ),
        top AS (
            SELECT user_id, hv, exact_cnt,
                   CAST(ROW_NUMBER() OVER (ORDER BY exact_cnt DESC, user_id)
                        AS BIGINT) AS rk
            FROM exact QUALIFY rk <= {CMHH_TOPK}
        )
        SELECT rk, user_id, exact_cnt,
               least({ests}) AS cm_est,
               least({ests}) - exact_cnt AS overestimate
        FROM top t
    """


@query(
    "sketch_countmin_heavy_hitters",
    oracle=_cmhh_sql(),
    tags=("sketch", "skew", "scale", "aggregate", "events"),
)
def sketch_countmin_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PORTABLE Count-Min HEAVY-HITTER workflow — the skew-triage use
    of the sketch (vs ``agg_count_min_sketch``, which probes Spark's
    native opaque blob for fixed keys and checks ε-bounds): build a
    depth-4 × width-64 CM grid from md5-derived affine row hashes
    (the MinHash permutation family — every term engine-portable),
    take the EXACT top-10 users by frequency (rank with user_id
    tiebreak), and report each one's CM estimate and overestimate =
    est − exact (>= 0 ALWAYS: CM never undercounts — the property a
    salting planner relies on when it sizes salt factors from sketch
    estimates instead of a second exact pass). All integers. 100 TB:
    the grid is a 256-cell map-side-combinable aggregate (the
    mergeable partial every executor ships); exact counts are one
    keyed aggregate; the probe join touches 10×4 grid cells —
    broadcast both ways."""
    e = load_table(spark, sf_dir, "events")
    hv = F.conv(
        F.substring(F.md5(F.col("user_id").cast("string")), 1, 8), 16, 10
    ).cast("bigint")
    h = e.select(F.col("user_id"), hv.alias("hv"))
    bucket_cols = [
        ((F.col("hv") * _CMHH_A[j] + _CMHH_B[j]) % _CMHH_M % CMHH_WIDTH).alias(
            f"b{j}"
        )
        for j in range(CMHH_DEPTH)
    ]
    cm = (
        h.select(
            F.posexplode(
                F.array(*[c for c in bucket_cols])
            ).alias("j", "b")
        )
        .groupBy("j", "b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    exact = h.groupBy("user_id").agg(
        F.min("hv").alias("hv"),
        F.count(F.lit(1)).cast("bigint").alias("exact_cnt"),
    )
    rk = F.row_number().over(
        Window.orderBy(F.col("exact_cnt").desc(), "user_id")
    )
    top = exact.select("*", rk.cast("bigint").alias("rk")).filter(
        F.col("rk") <= CMHH_TOPK
    )
    probe = top.select(
        "rk",
        "user_id",
        "exact_cnt",
        F.posexplode(
            F.array(
                *[
                    (F.col("hv") * _CMHH_A[j] + _CMHH_B[j])
                    % _CMHH_M
                    % CMHH_WIDTH
                    for j in range(CMHH_DEPTH)
                ]
            )
        ).alias("j", "b"),
    )
    est = (
        probe.join(F.broadcast(cm), ["j", "b"])
        .groupBy("rk", "user_id", "exact_cnt")
        .agg(F.min("c").cast("bigint").alias("cm_est"))
    )
    return est.select(
        "rk",
        "user_id",
        "exact_cnt",
        "cm_est",
        (F.col("cm_est") - F.col("exact_cnt")).cast("bigint").alias("overestimate"),
    )


# ---------------------------------------------------------------------------
# string + topk: token 3-char suffix census
# ---------------------------------------------------------------------------

SUFFIX_TOPK = 10
SUFFIX_MIN_LEN = 4


@query(
    "scalar_string_suffix_census",
    oracle=f"""
        WITH toks AS (
            SELECT UNNEST(list_filter(string_split(text, ' '),
                                      t -> t <> '')) AS tok
            FROM documents
        ),
        sfx AS (
            SELECT right(tok, 3) AS suffix3, tok
            FROM toks WHERE length(tok) >= {SUFFIX_MIN_LEN}
        ),
        agg AS (
            SELECT suffix3,
                   CAST(COUNT(*) AS BIGINT)            AS n_tokens,
                   CAST(COUNT(DISTINCT tok) AS BIGINT) AS n_distinct_tokens,
                   MIN(tok)                            AS example_token
            FROM sfx GROUP BY suffix3
        )
        SELECT CAST(ROW_NUMBER() OVER (ORDER BY n_tokens DESC, suffix3)
                    AS BIGINT) AS rk,
               suffix3, n_tokens, n_distinct_tokens, example_token
        FROM agg QUALIFY rk <= {SUFFIX_TOPK}
    """,
    tags=("scalar", "string", "topk", "documents"),
)
def scalar_string_suffix_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TOP-K TOKEN SUFFIX census — the morphological profile
    (derivational suffix frequencies) a language-ID or stemmer-
    calibration pass reads first: 3-char suffixes of tokens >= 4 chars,
    ranked by occurrence with full tiebreak (count DESC, suffix ASC —
    a top-k over strings is only deterministic with the tiebreak
    spelled out), each with its distinct-token support and the
    lexicographically-first example. String kernel: right()/length()
    — identical names and semantics on both engines. All integers.
    100 TB: one explode + one suffix-keyed aggregate (map-side
    combinable), then a 10-row global top-k — the two-phase
    rank-then-limit every distributed top-k compiles to."""
    d = load_table(spark, sf_dir, "documents")
    from big_data_audio_classification_spark.operators.dedup import tokens_col

    toks = d.select(F.explode(tokens_col(F.col("text"))).alias("tok"))
    sfx = toks.filter(F.length("tok") >= SUFFIX_MIN_LEN).select(
        F.expr("right(tok, 3)").alias("suffix3"), "tok"
    )
    agg = sfx.groupBy("suffix3").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
        F.countDistinct("tok").cast("bigint").alias("n_distinct_tokens"),
        F.min("tok").alias("example_token"),
    )
    rk = F.row_number().over(
        Window.orderBy(F.col("n_tokens").desc(), "suffix3")
    )
    return (
        agg.select(rk.cast("bigint").alias("rk"), "*")
        .filter(F.col("rk") <= SUFFIX_TOPK)
        .select("rk", "suffix3", "n_tokens", "n_distinct_tokens", "example_token")
    )


# ---------------------------------------------------------------------------
# math: log/exp/root battery over exact integer quantities
# ---------------------------------------------------------------------------


@query(
    "scalar_math_log_exp_battery",
    oracle="""
        WITH q AS (
            SELECT CAST(l_quantity AS BIGINT) AS qty,
                   CAST(COUNT(*) AS BIGINT)   AS n
            FROM lineitem GROUP BY CAST(l_quantity AS BIGINT)
        )
        SELECT qty, n,
               ROUND(LN(qty), 6)             AS ln_q,
               ROUND(LOG10(qty), 6)          AS log10_q,
               ROUND(LOG2(qty), 6)           AS log2_q,
               ROUND(SQRT(qty), 6)           AS sqrt_q,
               ROUND(CBRT(qty), 6)           AS cbrt_q,
               ROUND(EXP(1.0 / qty), 6)      AS exp_inv_q,
               ROUND(POWER(qty, 1.5), 6)     AS pow_1_5
        FROM q
    """,
    tags=("scalar", "math", "lineitem"),
)
def scalar_math_log_exp_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRANSCENDENTAL-FUNCTION battery over exact integer quantities —
    the cross-engine libm parity contract (sibling of
    ``scalar_math_rounding_battery``, which pins rounding modes): ln /
    log10 / log2 / sqrt / cbrt / exp / power evaluated on the DISTINCT
    integer quantity domain (~50 rows after one map-side-combinable
    aggregate, so each libm call happens once per distinct input on
    identical arguments — bit-identical results on one host's libm,
    and any engine that substituted a fast-math approximation would
    red-flag instantly). Arguments >= 1 keep every log nonnegative (no
    -0.0 exposure) and every function total. 100 TB: the battery cost
    is the group-by; the transcendentals run on the 50-row result."""
    li = load_table(spark, sf_dir, "lineitem")
    q = li.groupBy(
        F.col("l_quantity").cast("bigint").alias("qty")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    return q.select(
        "qty",
        "n",
        F.round(F.log(F.col("qty")), 6).alias("ln_q"),
        F.round(F.log10("qty"), 6).alias("log10_q"),
        F.round(F.log2("qty"), 6).alias("log2_q"),
        F.round(F.sqrt("qty"), 6).alias("sqrt_q"),
        F.round(F.cbrt("qty"), 6).alias("cbrt_q"),
        F.round(F.exp(1.0 / F.col("qty")), 6).alias("exp_inv_q"),
        F.round(F.pow("qty", F.lit(1.5)), 6).alias("pow_1_5"),
    )
