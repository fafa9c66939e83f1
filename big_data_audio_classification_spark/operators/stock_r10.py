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
    coverage oracle must never drop rows. 100 TB: the occurrence
    stream collapses map-side to (doc, bigram, cnt) in one combined
    aggregate (checkpointed, shared by vocab + probe); only collapsed
    rows shuffle — once keyed on the bigram for the vocab, once for
    the probe join, AQE-coalesced."""
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
    # Collapse the occurrence stream to per-(doc, bigram) counts ONCE
    # (r10): the map-side-combined groupBy shrinks both downstream
    # shuffles (duplicate in-document bigrams stop shuffling), the
    # vocab distinct-doc count becomes a plain count(*) (rows are
    # (doc, bigram)-distinct by construction — no distinct-agg state),
    # and the checkpoint lets the vocab aggregate AND the probe join
    # share one materialization instead of re-running scan+explode.
    # n_bigrams = sum(cnt) and n_covered = sum(cnt * covered) regroup
    # the same exact integers the per-occurrence form counted.
    bgc = (
        bg.groupBy("doc_id", "bigram")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .localCheckpoint(eager=False)
    )
    vocab = (
        bgc.groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("ndocs"))
        .filter(F.col("ndocs") >= OOV_MIN_DOCS)
        .select("bigram")
    )
    per_doc = (
        bgc.join(vocab.withColumn("hit", F.lit(1)), "bigram", "left")
        .groupBy("doc_id")
        .agg(
            F.sum("cnt").cast("bigint").alias("n_bigrams"),
            F.sum(F.when(F.col("hit").isNull(), 0).otherwise(F.col("cnt")))
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
    the SQL fold). The kernel emits FULL precision and the ROUND runs
    JVM-side (Python round() is half-even, engine ROUND half-away —
    the bit_density divergence class); the oracle's ``+ 0`` guards the
    single-byte-value payload, where log2(n) − n·log2(n)/n can land a
    half-ULP below zero. ASCII contract asserted per document (byte ==
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
                    # full precision out of the kernel; ROUND happens
                    # JVM-side below (Python round() is half-EVEN, the
                    # engines round half-away — the bit_density class)
                    h = math.log2(n) - s / n
                    rows.append((int(doc_id), n, int(present.size), h))
                else:
                    rows.append((int(doc_id), 0, 0, None))
            if rows:
                yield pd.DataFrame(
                    rows,
                    columns=["doc_id", "n_bytes", "n_distinct", "entropy_bits"],
                )

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    raw = d.mapInPandas(
        batches,
        "doc_id long, n_bytes long, n_distinct long, entropy_bits double",
    )
    return raw.select(
        "doc_id",
        "n_bytes",
        "n_distinct",
        F.round("entropy_bits", 6).alias("entropy_bits"),
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
        # full precision out of the kernel; ROUND runs JVM-side below
        # (Python round() is half-even, engine ROUND half-away)
        return math.log2(n) - s / n

    e = load_table(spark, sf_dir, "events")
    agg = e.groupBy("event_type").agg(
        n_rows("value").alias("n"),
        n_digits("value").alias("n_digits"),
        digit_entropy("value").alias("h_raw"),
    )
    return agg.select(
        "event_type",
        "n",
        "n_digits",
        F.round("h_raw", 6).alias("digit_entropy_bits"),
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
    # one materialization of the md5-derived row hashes: the grid AND
    # the exact counts both consume h (r10 — was two full scans, each
    # re-computing md5 per row)
    h = e.select(F.col("user_id"), hv.alias("hv")).localCheckpoint(
        eager=False
    )
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
    # top-10 via TakeOrderedAndProject (per-partition heaps merged on
    # the driver), NOT a row_number window over every distinct user —
    # that window moves ALL users into one partition at 100 TB (r10).
    # The rank re-attaches by a window over the <=10 surviving rows;
    # the total order (exact_cnt DESC, user_id) is identical, so
    # limit-10 + rank == the former rank-then-filter.
    rk = F.row_number().over(
        Window.orderBy(F.col("exact_cnt").desc(), "user_id")
    )
    top = (
        exact.orderBy(F.col("exact_cnt").desc(), "user_id")
        .limit(CMHH_TOPK)
        .select("*", rk.cast("bigint").alias("rk"))
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


# ---------------------------------------------------------------------------
# json + variant: extraction-path crosswalk census
# ---------------------------------------------------------------------------


@query(
    "scalar_json_variant_crosswalk",
    oracle="""
        WITH x AS (
            SELECT event_type,
                   CAST(json_extract(props, '$.k') AS BIGINT) AS k
            FROM events
        )
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT)  AS n,
               CAST(COUNT(k) AS BIGINT)  AS n_extractable,
               CAST(COUNT(k) AS BIGINT)  AS n_agree,
               CAST(SUM(k) AS BIGINT)    AS sum_k,
               CAST(MIN(k) AS BIGINT)    AS min_k,
               CAST(MAX(k) AS BIGINT)    AS max_k
        FROM x GROUP BY event_type
    """,
    tags=("scalar", "json", "variant", "events"),
)
def scalar_json_variant_crosswalk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-vs-VARIANT extraction CROSSWALK: the same ``$.k`` path read
    THREE ways on the Spark side — string-path ``get_json_object``,
    schema-full ``from_json``, and Spark 4's binary-encoded
    ``parse_json`` + ``try_variant_get`` — with ``n_agree`` counting
    rows where all three produce the same value. The operator pins the
    migration contract a lakehouse needs before swapping stringly-JSON
    columns for VARIANT: any parser/caster divergence (whitespace,
    overflow, null-vs-missing) splits n_agree from n_extractable and
    the driver's hash sees it (the oracle, with one parser, asserts
    they coincide). Sums/extrema exact integers. 100 TB: all three
    extractions are map-only expressions in one projection — the
    census costs one event_type-keyed aggregate."""
    from pyspark.sql.types import LongType, StructField, StructType

    e = load_table(spark, sf_dir, "events")
    k_str = F.get_json_object("props", "$.k").cast("bigint")
    k_schema = F.from_json(
        F.col("props"), StructType([StructField("k", LongType())])
    )["k"]
    k_var = F.try_variant_get(F.parse_json("props"), "$.k", "bigint")
    x = e.select(
        "event_type",
        k_str.alias("k1"),
        k_schema.alias("k2"),
        k_var.alias("k3"),
    )
    agree = (
        F.col("k1").isNotNull()
        & (F.col("k1") == F.col("k2"))
        & (F.col("k2") == F.col("k3"))
    )
    return x.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.count("k1").cast("bigint").alias("n_extractable"),
        F.sum(F.when(agree, 1).otherwise(0)).cast("bigint").alias("n_agree"),
        F.sum("k1").cast("bigint").alias("sum_k"),
        F.min("k1").cast("bigint").alias("min_k"),
        F.max("k1").cast("bigint").alias("max_k"),
    )


# ---------------------------------------------------------------------------
# array + map: entries-array -> map -> ordered value fold
# ---------------------------------------------------------------------------


@query(
    "scalar_map_array_pivot_fold",
    oracle="""
        WITH s AS (
            SELECT o_orderpriority AS priority, o_orderstatus AS status,
                   CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                        AS BIGINT) AS cents
            FROM orders GROUP BY o_orderpriority, o_orderstatus
        )
        SELECT priority,
               CAST(COUNT(*) AS BIGINT) AS n_statuses,
               CAST(SUM(cents) AS BIGINT) AS total_cents,
               string_agg(status || ':' || CAST(cents AS VARCHAR),
                          ',' ORDER BY status) AS kv_serialized
        FROM s GROUP BY priority
    """,
    tags=("scalar", "array", "map", "orders"),
)
def scalar_map_array_pivot_fold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ENTRIES-ARRAY → MAP → ORDERED-FOLD pipeline: per order priority,
    collect (status, exact-cents) entries, sort them (map entry order
    is engine-private — serialization MUST come from the sorted array,
    never from map iteration), build a real MapType via
    ``map_from_entries``, then fold the map's values back to a total
    with ``aggregate(map_values(...))`` and serialize the sorted
    entries as the portable ``k:v,...`` string. The operator pins the
    map-column round-trip contract (array→map→array) a feature-store
    export needs; the oracle never builds a map at all — it asserts
    the VALUES with a keyed aggregate + ordered string_agg, which is
    what makes a nondeterministic map iteration observable. All exact
    integers. 100 TB: one groupBy(priority, status) map-side-
    combinable aggregate, then |priorities| in-row folds over
    |statuses|-entry arrays."""
    o = load_table(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("bigint")
    s = o.groupBy(
        F.col("o_orderpriority").alias("priority"),
        F.col("o_orderstatus").alias("status"),
    ).agg(F.sum(cents).cast("bigint").alias("cents"))
    per_p = s.groupBy("priority").agg(
        F.array_sort(
            F.collect_list(F.struct(F.col("status"), F.col("cents")))
        ).alias("entries")
    )
    m = F.map_from_entries("entries")
    total = F.aggregate(
        F.map_values(m), F.lit(0).cast("bigint"), lambda a, v: a + v
    )
    kv = F.array_join(
        F.transform(
            F.col("entries"),
            lambda s_: F.concat_ws(":", s_["status"], s_["cents"].cast("string")),
        ),
        ",",
    )
    return per_p.select(
        "priority",
        F.size(F.map_keys(m)).cast("bigint").alias("n_statuses"),
        total.cast("bigint").alias("total_cents"),
        kv.alias("kv_serialized"),
    )


# ---------------------------------------------------------------------------
# lsh: Gini imbalance of bucket occupancy per band
# ---------------------------------------------------------------------------


def _lsh_gini_sql() -> str:
    from big_data_audio_classification_spark.operators.dedup import (
        LSH_BANDS,
        LSH_ROWS,
        _minhash_sql,
    )

    band_exprs = ", ".join(
        "CONCAT_WS('_', "
        + ", ".join(f"m{b * LSH_ROWS + r}" for r in range(LSH_ROWS))
        + f") AS band{b}"
        for b in range(LSH_BANDS)
    )
    unions = "\n            UNION ALL\n            ".join(
        f"SELECT doc_id, {b} AS band_id, band{b} AS band_hash FROM sig_bands"
        for b in range(LSH_BANDS)
    )
    return f"""
        WITH sig AS ({_minhash_sql()}),
        sig_bands AS (SELECT doc_id, {band_exprs} FROM sig),
        bands AS (
            {unions}
        ),
        buckets AS (
            SELECT band_id, band_hash, CAST(COUNT(*) AS BIGINT) AS n
            FROM bands GROUP BY band_id, band_hash
        ),
        ranked AS (
            SELECT band_id, n,
                   CAST(ROW_NUMBER() OVER (PARTITION BY band_id
                        ORDER BY n, band_hash) AS BIGINT) AS i,
                   CAST(COUNT(*) OVER (PARTITION BY band_id) AS BIGINT) AS k
            FROM buckets
        )
        SELECT CAST(band_id AS BIGINT) AS band_id,
               CAST(MAX(k) AS BIGINT)  AS n_buckets,
               CAST(SUM(n) AS BIGINT)  AS n_docs,
               ROUND(CAST(SUM((2 * i - k - 1)
                              * CAST(n AS HUGEINT)) AS DOUBLE)
                     / (CAST(MAX(k) AS DOUBLE) * SUM(n)), 6) + 0
                   AS gini
        FROM ranked GROUP BY band_id
    """


@query(
    "dedup_lsh_bucket_gini",
    oracle=_lsh_gini_sql(),
    tags=("dedup", "lsh", "minhash", "report", "documents"),
)
def dedup_lsh_bucket_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GINI IMBALANCE of LSH bucket occupancy per band — the
    third axis of the index-health dashboard (entropy:
    ``dedup_lsh_bucket_entropy``; size histogram:
    ``dedup_lsh_bucket_profile``): G = Σ(2i−k−1)·x_i / (k·Σx) over
    bucket sizes ranked ascending, the standard concentration score —
    0 = uniform buckets, →1 = one mega-bucket owns the band (the
    quadratic-verify disaster the entropy view flags logarithmically;
    Gini is the linear early-warning). The numerator is EXACT — rank ×
    size products accumulate in DECIMAL(38,0)/HUGEINT (2i·n wraps
    int64 past ~2e9 buckets × big n; equal sizes make the sum
    rank-tie invariant, so the band_hash tiebreak only pins engine
    determinism) — and Gini is ONE float division, ``+ 0``-guarded
    (a perfectly uniform band lands exactly on 0). 100 TB: banding +
    one keyed count + one rank window per band; output is |bands|
    rows."""
    from big_data_audio_classification_spark.operators.dedup import (
        _lsh_band_table,
    )

    d = load_table(spark, sf_dir, "documents")
    buckets = (
        _lsh_band_table(d)
        .groupBy("band_id", "band_hash")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    w = Window.partitionBy("band_id").orderBy("n", "band_hash")
    ranked = buckets.select(
        "band_id",
        "n",
        F.row_number().over(w).cast("bigint").alias("i"),
        F.count(F.lit(1))
        .over(Window.partitionBy("band_id"))
        .cast("bigint")
        .alias("k"),
    )
    num = F.sum(
        ((2 * F.col("i") - F.col("k") - 1)).cast("decimal(38,0)")
        * F.col("n").cast("decimal(38,0)")
    )
    agg = ranked.groupBy("band_id").agg(
        F.max("k").cast("bigint").alias("n_buckets"),
        F.sum("n").cast("bigint").alias("n_docs"),
        num.alias("num"),
    )
    return agg.select(
        F.col("band_id").cast("bigint").alias("band_id"),
        "n_buckets",
        "n_docs",
        F.round(
            F.col("num").cast("double")
            / (F.col("n_buckets").cast("double") * F.col("n_docs")),
            6,
        ).alias("gini"),
    )


# ---------------------------------------------------------------------------
# simhash: popcount-parity x top-nibble census
# ---------------------------------------------------------------------------


def _simhash_parity_sql() -> str:
    from big_data_audio_classification_spark.operators.dedup import (
        _simhash_sql,
    )

    return f"""
        WITH fp AS ({_simhash_sql()})
        SELECT CAST(bit_count(simhash) % 2 AS BIGINT) AS parity,
               CAST(simhash >> 28 AS BIGINT)          AS top_nibble,
               CAST(COUNT(*) AS BIGINT)               AS n_docs,
               CAST(MIN(doc_id) AS BIGINT)            AS min_doc_id
        FROM fp GROUP BY parity, top_nibble
    """


@query(
    "dedup_simhash_parity_planes",
    oracle=_simhash_parity_sql(),
    tags=("dedup", "simhash", "documents"),
)
def dedup_simhash_parity_planes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SIMHASH PARITY-PLANE census: the (popcount parity, top nibble)
    contingency of the 32-bit fingerprints — the cheap structural
    audit of a simhash index (a healthy Charikar fingerprint
    population splits parity ~50/50 and spreads the 16 top-nibble
    cells; a skewed plane means degenerate token weighting upstream,
    and any popcount/shift discrepancy between engines is instantly
    visible). Fingerprints from the house 32-bit SimHash; parity via
    ``bit_count % 2``, plane via ``>> 28`` — exact integers on both
    engines. Output <= 32 rows. 100 TB: rides the fingerprint
    aggregate; the census is a 32-cell map-side-combinable rollup."""
    from big_data_audio_classification_spark.operators.dedup import (
        dedup_simhash as _simhash_query,
    )

    fp = _simhash_query(spark, sf_dir)
    return fp.groupBy(
        (F.bit_count("simhash") % 2).cast("bigint").alias("parity"),
        F.shiftright(F.col("simhash"), 28).cast("bigint").alias("top_nibble"),
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.min("doc_id").cast("bigint").alias("min_doc_id"),
    )


# ---------------------------------------------------------------------------
# tfidf + topk: IDF formulation comparison for the heaviest terms
# ---------------------------------------------------------------------------

IDF_TOPK = 20


@query(
    "text_tfidf_idf_variants",
    oracle=f"""
        WITH toks AS (
            SELECT doc_id,
                   UNNEST(list_distinct(list_filter(string_split(text, ' '),
                                                    t -> t <> ''))) AS term
            FROM documents
        ),
        df AS (
            SELECT term, CAST(COUNT(*) AS BIGINT) AS df
            FROM toks GROUP BY term
        ),
        n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents),
        top AS (
            SELECT term, df, n_docs,
                   CAST(ROW_NUMBER() OVER (ORDER BY df DESC, term)
                        AS BIGINT) AS rk
            FROM df, n QUALIFY rk <= {IDF_TOPK}
        )
        SELECT rk, term, df, n_docs,
               ROUND(LN(CAST(n_docs AS DOUBLE) / df), 6) + 0 AS idf_raw,
               ROUND(LN((n_docs + 1.0) / (df + 1)) + 1.0, 6) AS idf_smooth,
               ROUND(LN((n_docs - df + 0.5) / (df + 0.5)), 6) + 0
                   AS idf_bm25
        FROM top
    """,
    tags=("text", "tfidf", "topk", "documents"),
)
def text_tfidf_idf_variants(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IDF FORMULATION comparison for the top-20 document-frequency
    terms — the three weights every retrieval stack chooses between:
    raw ln(N/df), sklearn's smoothed ln((N+1)/(df+1))+1, and BM25's
    probabilistic ln((N−df+0.5)/(df+0.5)) which goes NEGATIVE for
    terms in more than half the corpus — exactly the head terms this
    top-k selects, so the sign flip is exercised, and why idf_raw
    and idf_bm25 carry ``+ 0`` guards (df = N rounds raw to exactly
    -0.0 on DuckDB). df is doc-distinct (array-side list_distinct
    before the explode — a term repeated in one document counts
    once); rank carries the term tiebreak. 100 TB: one term-keyed
    count + a 20-row global top-k; the three floats are per-row
    expressions over two exact integers."""
    d = load_table(spark, sf_dir, "documents")
    from big_data_audio_classification_spark.operators.dedup import tokens_col

    toks = d.select(
        "doc_id",
        F.explode(F.array_distinct(tokens_col(F.col("text")))).alias("term"),
    )
    df = toks.groupBy("term").agg(F.count(F.lit(1)).cast("bigint").alias("df"))
    n = d.agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
    rk = F.row_number().over(Window.orderBy(F.col("df").desc(), "term"))
    top = (
        df.crossJoin(F.broadcast(n))
        .select(rk.cast("bigint").alias("rk"), "term", "df", "n_docs")
        .filter(F.col("rk") <= IDF_TOPK)
    )
    nd = F.col("n_docs").cast("double")
    return top.select(
        "rk",
        "term",
        "df",
        "n_docs",
        F.round(F.log(nd / F.col("df")), 6).alias("idf_raw"),
        F.round(F.log((F.col("n_docs") + 1.0) / (F.col("df") + 1)) + 1.0, 6)
        .alias("idf_smooth"),
        F.round(
            F.log((F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)),
            6,
        ).alias("idf_bm25"),
    )


# ---------------------------------------------------------------------------
# encoding + regression: Helmert contrasts with per-level effects
# ---------------------------------------------------------------------------


@query(
    "ml_helmert_contrast_effects",
    oracle="""
        WITH lv AS (
            SELECT o_orderpriority AS level,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                        AS BIGINT) AS s
            FROM orders GROUP BY o_orderpriority
        ),
        rk AS (
            SELECT level, n, s,
                   CAST(ROW_NUMBER() OVER (ORDER BY level) AS BIGINT) AS rk,
                   CAST(s AS DOUBLE) / n AS mean_c
            FROM lv
        ),
        prior AS (
            SELECT j.level, j.rk, j.n, j.mean_c,
                   list_sum(list(i.mean_c ORDER BY i.rk)) AS prior_sum
            FROM rk j JOIN rk i ON i.rk < j.rk
            GROUP BY j.level, j.rk, j.n, j.mean_c
        )
        SELECT r.level, r.rk, r.n,
               ROUND(r.mean_c, 6) AS mean_cents,
               CASE WHEN p.prior_sum IS NOT NULL
                    THEN ROUND(r.mean_c - p.prior_sum / (r.rk - 1), 6) + 0
                    ELSE NULL END AS helmert_effect
        FROM rk r LEFT JOIN prior p ON r.level = p.level
    """,
    tags=("ml", "encoding", "regression", "closed-form", "orders"),
)
def ml_helmert_contrast_effects(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HELMERT CONTRAST encoding with closed-form effects: level j
    (alphabetical rank — the house alphabetAsc encoding convention,
    reference R28) is scored against the MEAN OF ALL PRIOR LEVELS,
    effect_j = mean_j − (Σ_{i<j} mean_i)/(j−1) — exactly the
    coefficient an OLS on Helmert-coded dummies recovers, computed
    here without a solver (the contrast matrix is triangular, so the
    normal equations collapse). Per-level means are one float division
    of exact cents/count each; the prior-mean sum is the house
    SEQUENTIAL rank-ordered fold (Spark
    aggregate(transform(array_sort(collect_list)))) vs DuckDB
    ``list_sum(list(mean_c ORDER BY rk))`` — never an engine-order
    float sum), and the effect is one fixed-order expression,
    ``+ 0``-guarded (two equal adjacent means round to a signed
    zero). Level 1 has no prior → NULL. 100 TB: one map-side-
    combinable aggregate to |levels| rows; the contrast walk is a
    |levels|² self-join on a 5-row frame."""
    o = load_table(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("bigint")
    lv = o.groupBy(F.col("o_orderpriority").alias("level")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(cents).cast("bigint").alias("s"),
    )
    rk = lv.select(
        "level",
        "n",
        F.row_number().over(Window.orderBy("level")).cast("bigint").alias("rk"),
        (F.col("s").cast("double") / F.col("n")).alias("mean_c"),
    )
    j = rk.alias("j")
    i = rk.alias("i")
    pairs = j.join(i, F.col("i.rk") < F.col("j.rk")).select(
        F.col("j.level").alias("level"),
        F.col("i.rk").alias("irk"),
        F.col("i.mean_c").alias("imean"),
    )
    prior = pairs.groupBy("level").agg(
        F.aggregate(
            F.transform(
                F.array_sort(F.collect_list(F.struct("irk", "imean"))),
                lambda s: s["imean"],
            ),
            F.lit(0.0),
            lambda a, x: a + x,
        ).alias("prior_sum")
    )
    return (
        rk.join(prior, "level", "left")
        .select(
            "level",
            "rk",
            "n",
            F.round("mean_c", 6).alias("mean_cents"),
            F.when(
                F.col("prior_sum").isNotNull(),
                F.round(
                    F.col("mean_c") - F.col("prior_sum") / (F.col("rk") - 1), 6
                ),
            ).alias("helmert_effect"),
        )
    )


# ---------------------------------------------------------------------------
# subquery + sql: correlated scalar subquery census
# ---------------------------------------------------------------------------


def _scalar_subquery_census_sql(ctbl: str, otbl: str) -> str:
    return f"""
        WITH cust AS (
            SELECT c.c_mktsegment AS segment, c.c_custkey,
                   (SELECT MAX(CAST(ROUND(o.o_totalprice * 100) AS BIGINT))
                    FROM {otbl} o
                    WHERE o.o_custkey = c.c_custkey) AS max_cents
            FROM {ctbl} c
        ),
        g AS (
            SELECT CAST(SUM(max_cents) AS DOUBLE) / COUNT(max_cents)
                       AS global_avg
            FROM cust
        )
        SELECT segment,
               CAST(COUNT(*) AS BIGINT)         AS n_customers,
               CAST(COUNT(max_cents) AS BIGINT) AS n_with_orders,
               CAST(SUM(CASE WHEN max_cents >
                                  (SELECT global_avg FROM g)
                             THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_above_global_avg
        FROM cust GROUP BY segment
    """


@query(
    "subquery_scalar_correlated_census",
    oracle=_scalar_subquery_census_sql("customer", "orders"),
    tags=("relational", "subquery", "sql", "customer", "orders"),
)
def subquery_scalar_correlated_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CORRELATED + UNCORRELATED SCALAR SUBQUERY census: each
    customer's biggest order via a correlated scalar subquery (NULL
    for order-less customers — the outer row must survive), compared
    against a global average computed by an UNCORRELATED scalar
    subquery, rolled up per market segment. ONE SQL spec executed by
    BOTH engines (sibling of ``subquery_exists_census``, which pins
    EXISTS decorrelation — this pins SCALAR-subquery decorrelation:
    Catalyst must rewrite the correlated MAX to an aggregate + outer
    join, and the global average to a broadcast scalar, or it
    re-executes per row). The average divides an EXACT bigint/HUGEINT
    cents sum by an exact count in one float division (never engine-
    side AVG of doubles — the r06 plan-order class; exactness holds
    to 2^53 cents ≈ $90 trillion of single-customer max orders).
    Counts exact."""
    load_table(spark, sf_dir, "customer").createOrReplaceTempView(
        "v_sub_cust_r10"
    )
    load_table(spark, sf_dir, "orders").createOrReplaceTempView(
        "v_sub_ord_r10"
    )
    return spark.sql(
        _scalar_subquery_census_sql("v_sub_cust_r10", "v_sub_ord_r10")
    )


# ---------------------------------------------------------------------------
# ivf: per-cell radius profile (quantization-quality dashboard)
# ---------------------------------------------------------------------------


def _ivf_radius_sql() -> str:
    from big_data_audio_classification_spark.operators.similarity import (
        IVF_CELLS,
    )

    return f"""
        WITH c AS (SELECT vec_id AS cell_id, embedding FROM embeddings
                   WHERE vec_id < {IVF_CELLS}),
        d AS (
            SELECT b.vec_id, a.cell_id,
                   list_sum(list_transform(list_zip(a.embedding, b.embedding),
                            p -> (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))
                               * (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))))
                       AS d2
            FROM c a CROSS JOIN embeddings b
        ),
        assigned AS (
            SELECT vec_id, cell_id, d2
            FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
                            ORDER BY d2, cell_id) AS rn FROM d)
            WHERE rn = 1
        )
        SELECT CAST(cell_id AS BIGINT) AS cell_id,
               CAST(COUNT(*) AS BIGINT) AS n_members,
               ROUND(MAX(d2), 6) AS max_d2,
               ROUND(list_sum(list(d2 ORDER BY vec_id)) / COUNT(*), 6)
                   AS mean_d2
        FROM assigned GROUP BY cell_id
    """


@query(
    "sim_ivf_cell_radius_profile",
    oracle=_ivf_radius_sql(),
    tags=("similarity", "ivf", "report", "embeddings"),
)
def sim_ivf_cell_radius_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF CELL RADIUS profile — the quantization-quality dashboard
    read before trusting an nprobe setting: per cell, member count,
    max squared distance (the cell radius that bounds how far a
    true neighbor can hide) and mean squared distance (the
    quantization error a PQ refinement would shave). Complements
    ``sim_ivf_cell_balance`` (counts only) and
    ``sim_ivf_residual_energy`` (vector residual sums) with the
    DISTANCE distribution. Assignment is the house broadcast-
    centroid argmin (d2 + cell_id tiebreak); each d2 is the in-row
    SEQUENTIAL zip fold (index order, both engines); the cross-member
    mean folds vec_id-ordered — never an engine-order float sum.
    ``+ 0`` unneeded: d2 >= 0 and a zero mean is exactly +0.0 on both
    engines (no negative rounding path). 100 TB: map-only scoring
    against |cells| broadcast centroids, one cell-keyed aggregate;
    the ordered fold becomes a two-level chunk fold at extreme cell
    sizes (cell_balance flags those first)."""
    from big_data_audio_classification_spark.functions.vector import (
        l2_dist_sq,
        to_double,
    )
    from big_data_audio_classification_spark.operators.similarity import (
        IVF_CELLS,
    )

    em = load_table(spark, sf_dir, "embeddings")
    cents = em.filter(F.col("vec_id") < IVF_CELLS).select(
        F.col("vec_id").alias("cell_id"), F.col("embedding").alias("c_emb")
    )
    d2 = l2_dist_sq(to_double(F.col("c_emb")), to_double(F.col("embedding")))
    scored = em.crossJoin(F.broadcast(cents)).select(
        "vec_id", "cell_id", d2.alias("d2")
    )
    w = Window.partitionBy("vec_id").orderBy("d2", "cell_id")
    assigned = (
        scored.select("*", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") == 1)
        .select("vec_id", "cell_id", "d2")
    )
    ordered = F.transform(
        F.array_sort(F.collect_list(F.struct("vec_id", "d2"))),
        lambda s: s["d2"],
    )
    agg = assigned.groupBy("cell_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_members"),
        F.max("d2").alias("mx"),
        F.aggregate(ordered, F.lit(0.0), lambda a, x: a + x).alias("s"),
    )
    return agg.select(
        F.col("cell_id").cast("bigint").alias("cell_id"),
        "n_members",
        F.round("mx", 6).alias("max_d2"),
        F.round(F.col("s") / F.col("n_members"), 6).alias("mean_d2"),
    )


# ---------------------------------------------------------------------------
# feature-selection: information-gain ratio of sign splits
# ---------------------------------------------------------------------------

GAIN_DIMS = 8


@query(
    "ml_gain_ratio_selection",
    oracle=f"""
        WITH x AS (
            SELECT vec_id, label,
                   UNNEST(embedding) AS v,
                   generate_subscripts(embedding, 1) AS dim
            FROM embeddings
        ),
        cells AS (
            SELECT CAST(dim AS BIGINT) AS dim,
                   CASE WHEN v > 0 THEN 1 ELSE 0 END AS branch,
                   CAST(label AS BIGINT) AS label,
                   CAST(COUNT(*) AS BIGINT) AS c
            FROM x WHERE dim <= {GAIN_DIMS}
            GROUP BY dim, branch, label
        ),
        lab AS (
            SELECT dim, label, CAST(SUM(c) AS BIGINT) AS t
            FROM cells GROUP BY dim, label
        ),
        br AS (
            SELECT dim, branch, CAST(SUM(c) AS BIGINT) AS nb
            FROM cells GROUP BY dim, branch
        ),
        f_cell AS (
            SELECT dim, list_sum(list(c * LOG2(c)
                                      ORDER BY branch, label)) AS s_cell,
                   CAST(SUM(c) AS BIGINT) AS n
            FROM cells GROUP BY dim
        ),
        f_lab AS (
            SELECT dim, list_sum(list(t * LOG2(t) ORDER BY label)) AS s_lab
            FROM lab GROUP BY dim
        ),
        f_br AS (
            SELECT dim, list_sum(list(nb * LOG2(nb) ORDER BY branch)) AS s_br
            FROM br GROUP BY dim
        )
        SELECT c.dim, c.n,
               ROUND(LOG2(c.n) - l.s_lab / c.n, 6) + 0  AS h_label,
               ROUND(LOG2(c.n) - l.s_lab / c.n
                     - (b.s_br - c.s_cell) / c.n, 6) + 0 AS info_gain,
               ROUND(LOG2(c.n) - b.s_br / c.n, 6) + 0   AS split_info,
               CASE WHEN LOG2(c.n) - b.s_br / c.n > 0
                    THEN ROUND((LOG2(c.n) - l.s_lab / c.n
                                - (b.s_br - c.s_cell) / c.n)
                               / (LOG2(c.n) - b.s_br / c.n), 6) + 0
                    ELSE NULL END AS gain_ratio
        FROM f_cell c JOIN f_lab l ON c.dim = l.dim
                      JOIN f_br b ON c.dim = b.dim
    """,
    tags=("ml", "feature-selection", "embeddings"),
)
def ml_gain_ratio_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INFORMATION-GAIN RATIO (Quinlan's C4.5 criterion) of the sign
    split v>0 for the first 8 embedding dimensions — the
    split-bias-corrected sibling of the MI/chi2/ANOVA selection family
    (reference R26): gain_ratio = (H(label) − H(label|split)) /
    split_info, where plain gain would favor many-way splits (binary
    here, so the ratio mostly rescales — the carrier pins the
    FORMULA). All entropies decompose into Σ c·log2(c) over EXACT
    integer counts, each reduced by the house ORDERED fold (cells by
    (branch,label), label totals by label, branch totals by branch) so
    H(label), info_gain and split_info are fixed-order float
    expressions; every ROUND is ``+ 0``-guarded (one-class or
    one-branch dims land exactly on zero) and a degenerate split
    (split_info = 0) degrades to NULL on both engines. 100 TB: one
    posexplode filtered to 8 dims + three keyed aggregates over <= 160
    exact-count rows."""
    em = load_table(spark, sf_dir, "embeddings")
    x = em.select(
        "vec_id",
        "label",
        F.posexplode("embedding").alias("pos", "v"),
    ).filter(F.col("pos") < GAIN_DIMS)
    cells = x.groupBy(
        (F.col("pos") + 1).cast("bigint").alias("dim"),
        F.when(F.col("v") > 0, 1).otherwise(0).alias("branch"),
        F.col("label").cast("bigint").alias("label"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("c"))

    def _fold(df: DataFrame, keys: list, val: str, out: str) -> DataFrame:
        ordered = F.transform(
            F.array_sort(F.collect_list(F.struct(*keys, val))),
            lambda s: s[val] * F.log2(s[val]),
        )
        return df.groupBy("dim").agg(
            F.aggregate(ordered, F.lit(0.0), lambda a, t: a + t).alias(out),
            F.sum(val).cast("bigint").alias(f"_n_{out}"),
        )

    f_cell = _fold(cells, ["branch", "label"], "c", "s_cell").withColumnRenamed(
        "_n_s_cell", "n"
    )
    lab = cells.groupBy("dim", "label").agg(
        F.sum("c").cast("bigint").alias("t")
    )
    f_lab = _fold(lab, ["label"], "t", "s_lab").drop("_n_s_lab")
    br = cells.groupBy("dim", "branch").agg(
        F.sum("c").cast("bigint").alias("nb")
    )
    f_br = _fold(br, ["branch"], "nb", "s_br").drop("_n_s_br")
    j = f_cell.join(f_lab, "dim").join(f_br, "dim")
    n = F.col("n")
    h_label = F.log2(n) - F.col("s_lab") / n
    info_gain = h_label - (F.col("s_br") - F.col("s_cell")) / n
    split_info = F.log2(n) - F.col("s_br") / n
    return j.select(
        "dim",
        "n",
        F.round(h_label, 6).alias("h_label"),
        F.round(info_gain, 6).alias("info_gain"),
        F.round(split_info, 6).alias("split_info"),
        F.when(split_info > 0, F.round(info_gain / split_info, 6)).alias(
            "gain_ratio"
        ),
    )


# ---------------------------------------------------------------------------
# reference + audio-math: truncate-to-whole-slices RMS energy (R6 echo)
# ---------------------------------------------------------------------------

SLICE_SAMPLES = 100  # one "second" of the house cents-as-samples signal


@query(
    "ref_slice_rms_energy",
    oracle=f"""
        WITH x AS (
            SELECT user_id, CAST(ROUND(value * 100) AS BIGINT) AS c,
                   ROW_NUMBER() OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS rn,
                   COUNT(*) OVER (PARTITION BY user_id) AS n
            FROM events
        ),
        kept AS (
            SELECT user_id,
                   CAST((rn - 1) // {SLICE_SAMPLES} AS BIGINT) AS slice_id,
                   c, n
            FROM x WHERE rn <= n - (n % {SLICE_SAMPLES})
        ),
        slices AS (
            SELECT user_id, slice_id,
                   SQRT(CAST(SUM(c * c) AS DOUBLE)
                        / ({SLICE_SAMPLES} * 10000.0)) AS rms
            FROM kept GROUP BY user_id, slice_id
        ),
        drops AS (
            SELECT user_id, CAST(MAX(n) % {SLICE_SAMPLES} AS BIGINT)
                       AS n_dropped
            FROM x GROUP BY user_id
        )
        SELECT d.user_id,
               COALESCE(s.n_slices, 0) AS n_slices,
               d.n_dropped,
               s.mean_rms, s.max_rms
        FROM drops d LEFT JOIN (
            SELECT user_id,
                   CAST(COUNT(*) AS BIGINT) AS n_slices,
                   ROUND(list_sum(list(rms ORDER BY slice_id)) / COUNT(*), 6)
                       AS mean_rms,
                   ROUND(MAX(rms), 6) AS max_rms
            FROM slices GROUP BY user_id
        ) s ON d.user_id = s.user_id
    """,
    tags=("reference", "audio-math", "events"),
)
def ref_slice_rms_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRUNCATE-TO-WHOLE-SLICES RMS energy — the reference's R6
    semantics (voice_classifier.py:103: rows beyond the last whole
    second of audio are DROPPED before slicing, via the
    linspace-rounded duration mask) echoed on the house
    cents-as-samples signal: each channel keeps only complete
    100-sample slices, the trailing partial is discarded (n_dropped
    reports exactly how much — the audit a lossy truncation owes),
    and each slice gets an RMS from EXACT integer energy. Per-channel
    mean RMS folds slice-ordered (the crest/flatness discipline);
    max is order-free. Channels shorter than one slice survive with
    n_slices=0 / NULL stats via the outer join. 100 TB: one
    user-keyed window pass + one (user,slice) aggregate — identical
    shape to the framed-audio family."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wn = Window.partitionBy("user_id")
    c = F.round(F.col("value") * 100).cast("bigint")
    x = e.select(
        "user_id",
        c.alias("c"),
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    kept = x.filter(
        F.col("rn") <= F.col("n") - (F.col("n") % SLICE_SAMPLES)
    ).select(
        "user_id",
        ((F.col("rn") - 1) / SLICE_SAMPLES).cast("bigint").alias("slice_id"),
        "c",
    )
    slices = kept.groupBy("user_id", "slice_id").agg(
        F.sqrt(
            F.sum(F.col("c") * F.col("c")).cast("double")
            / (SLICE_SAMPLES * 10000.0)
        ).alias("rms")
    )
    per_user = slices.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_slices"),
        F.round(
            F.aggregate(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("slice_id", "rms"))),
                    lambda s: s["rms"],
                ),
                F.lit(0.0),
                lambda a, v: a + v,
            )
            / F.count(F.lit(1)),
            6,
        ).alias("mean_rms"),
        F.round(F.max("rms"), 6).alias("max_rms"),
    )
    drops = x.groupBy("user_id").agg(
        (F.max("n") % SLICE_SAMPLES).cast("bigint").alias("n_dropped")
    )
    return drops.join(per_user, "user_id", "left").select(
        "user_id",
        F.coalesce("n_slices", F.lit(0)).cast("bigint").alias("n_slices"),
        "n_dropped",
        "mean_rms",
        "max_rms",
    )


# ---------------------------------------------------------------------------
# range-join: dual-banded (price x week) dimension join
# ---------------------------------------------------------------------------

# (band_id, price_lo, price_hi, week_lo, week_hi) — half-open on both
# axes; weeks are epoch-weeks (1995..2001 orders live in 1304..1648).
DUAL_BANDS = (
    (1, 0, 20_000_000, 1300, 1420),
    (2, 0, 20_000_000, 1420, 1540),
    (3, 0, 20_000_000, 1540, 1660),
    (4, 20_000_000, 35_000_000, 1300, 1480),
    (5, 20_000_000, 35_000_000, 1480, 1660),
    (6, 35_000_000, 10_000_000_000, 1300, 1480),
    (7, 35_000_000, 10_000_000_000, 1480, 1660),
)


def _dual_band_sql() -> str:
    rows = ", ".join(f"({b},{pl},{ph},{wl},{wh})" for b, pl, ph, wl, wh in DUAL_BANDS)
    return f"""
        WITH bands(band_id, price_lo, price_hi, week_lo, week_hi)
             AS (VALUES {rows}),
        o AS (
            SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents,
                   date_diff('day', DATE '1970-01-01',
                             CAST(o_orderdate AS DATE)) // 7 AS wk
            FROM orders
        )
        SELECT CAST(b.band_id AS BIGINT) AS band_id,
               CAST(COUNT(o.cents) AS BIGINT) AS n_orders,
               CAST(COALESCE(SUM(o.cents), 0) AS BIGINT) AS sum_cents
        FROM bands b LEFT JOIN o
          ON o.cents >= b.price_lo AND o.cents < b.price_hi
         AND o.wk >= b.week_lo AND o.wk < b.week_hi
        GROUP BY b.band_id
    """


@query(
    "join_range_dual_band",
    oracle=_dual_band_sql(),
    tags=("join", "range-join", "orders"),
)
def join_range_dual_band(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DUAL-AXIS range join: every order lands in the band whose PRICE
    interval AND WEEK interval both contain it (half-open on both
    axes) — the 2-D banding a pricing-cohort report runs, and the
    compound-predicate case where a naive range join degenerates
    fastest (two inequality pairs, zero equi-keys). The dimension is
    7 literal rows → Spark's broadcast nested-loop is EXACTLY the
    right plan (the oracle's LEFT JOIN keeps empty bands alive, so a
    band the data never touches still shows 0 — the silent-empty-band
    review class). Weeks are exact integer epoch-DAY quotients
    (datediff/date_diff from 1970-01-01 then DIV 7 — date arithmetic,
    never unix_micros on a TIMESTAMP_NTZ column, which Spark rejects
    and session timezones would skew); cents exact.
    100 TB: with |bands| this small the scan stays map-only; a
    thousand-band version would band-bucket both sides to equi-keys
    first (join_range_bucketed_points pins that form)."""
    o = load_table(spark, sf_dir, "orders")
    bands = spark.createDataFrame(
        list(DUAL_BANDS),
        "band_id long, price_lo long, price_hi long, week_lo long, week_hi long",
    )
    ox = o.select(
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
        F.expr("datediff(CAST(o_orderdate AS DATE), DATE '1970-01-01') DIV 7")
        .alias("wk"),
    )
    j = F.broadcast(bands).join(
        ox,
        (F.col("cents") >= F.col("price_lo"))
        & (F.col("cents") < F.col("price_hi"))
        & (F.col("wk") >= F.col("week_lo"))
        & (F.col("wk") < F.col("week_hi")),
        "left",
    )
    return j.groupBy("band_id").agg(
        F.count("cents").cast("bigint").alias("n_orders"),
        F.coalesce(F.sum("cents"), F.lit(0)).cast("bigint").alias("sum_cents"),
    )


# ---------------------------------------------------------------------------
# udtf + session: sessionized event-type path triples
# ---------------------------------------------------------------------------

PATHS_GAP_S = 1800  # 30-min session gap, matches the sessionization family


@query(
    "udtf_session_paths",
    oracle=f"""
        WITH x AS (
            SELECT user_id, event_type, ts, event_id,
                   CASE WHEN epoch_us(ts) - epoch_us(
                            LAG(ts) OVER (PARTITION BY user_id
                                          ORDER BY ts, event_id))
                            > {PATHS_GAP_S * 1_000_000}
                         OR LAG(ts) OVER (PARTITION BY user_id
                                          ORDER BY ts, event_id) IS NULL
                        THEN 1 ELSE 0 END AS new_sess
            FROM events
        ),
        s AS (
            SELECT user_id, event_type, ts, event_id,
                   SUM(new_sess) OVER (PARTITION BY user_id
                                       ORDER BY ts, event_id) AS sess_id
            FROM x
        ),
        tri AS (
            SELECT user_id,
                   event_type || '>' ||
                   LEAD(event_type, 1) OVER w || '>' ||
                   LEAD(event_type, 2) OVER w AS path3,
                   LEAD(sess_id, 2) OVER w = sess_id AS same_sess
            FROM s
            WINDOW w AS (PARTITION BY user_id, sess_id ORDER BY ts, event_id)
        )
        SELECT path3,
               CAST(COUNT(*) AS BIGINT) AS n_occurrences,
               CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
        FROM tri WHERE path3 IS NOT NULL AND same_sess
        GROUP BY path3
    """,
    tags=("udtf", "session", "events"),
)
def udtf_session_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SESSIONIZED PATH TRIPLES via a Python UDTF: one stateful pass
    per user (TABLE(...) PARTITION BY user_id ORDER BY ts, event_id —
    the tiebreak matters here, unlike the count-only sessionizer:
    path CONTENT is tie-order sensitive) emits every within-session
    3-gram of event types at a 30-min gap, then a census ranks the
    triples — the behavioral-motif table funnels and Markov models
    read. The UDTF carries O(1) state (last two types + last epoch);
    gaps compare exact integer microseconds computed JVM-side
    (unix_micros on the UTC-pinned ts — bijective, so the (e,
    event_id) order equals (ts, event_id); the Python body stays
    integer-only, r10). The oracle restates it as
    gap-islands + double LEAD inside (user, session) windows — an
    independent formulation of both the session boundary AND the
    triple windowing (a triple must not straddle sessions; the UDTF
    resets its buffer, the oracle checks LEAD(sess_id,2)). 100 TB:
    one user-keyed shuffle+sort, census on <= |types|³ rows."""
    from pyspark.sql.functions import udtf

    GAP_US = PATHS_GAP_S * 1_000_000

    @udtf(returnType="user_id bigint, path3 string")
    class PathTriples:
        def __init__(self):
            self.user = None
            self.last_epoch = None
            self.buf = []

        def eval(self, row):
            # Epoch micros arrive PRECOMPUTED from the JVM (r10): the
            # former per-row datetime subtraction in Python was pure
            # boundary tax (guide §4 — ship only what the function
            # needs, keep the Python body integer-only). Gap compare
            # and ordering are identical: unix_micros is bijective on
            # the UTC-pinned ts, so ORDER BY (e, event_id) is the same
            # total order as (ts, event_id).
            e = row["e"]
            if (
                self.last_epoch is not None
                and e - self.last_epoch > GAP_US
            ):
                self.buf = []  # session break: triples never straddle
            self.last_epoch = e
            self.user = row["user_id"]
            self.buf.append(row["event_type"])
            if len(self.buf) > 3:
                self.buf.pop(0)
            if len(self.buf) == 3:
                yield self.user, ">".join(self.buf)

    spark.udtf.register("session_paths_udtf", PathTriples)
    e = load_table(spark, sf_dir, "events")
    e.createOrReplaceTempView("events_for_paths_udtf")
    tri = spark.sql(
        """
        SELECT * FROM session_paths_udtf(
            TABLE(SELECT user_id, unix_micros(ts) AS e, event_type, event_id
                  FROM events_for_paths_udtf)
            PARTITION BY user_id ORDER BY (e, event_id)
        )
        """
    )
    return tri.groupBy("path3").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_occurrences"),
        F.countDistinct("user_id").cast("bigint").alias("n_users"),
    )


# ---------------------------------------------------------------------------
# sink/csv: nullValue vs emptyValue dialect roundtrip
# ---------------------------------------------------------------------------


@query(
    "sink_csv_null_empty_roundtrip",
    oracle="""
        WITH x AS (
            SELECT doc_id,
                   CASE WHEN doc_id % 3 = 0 THEN NULL
                        WHEN doc_id % 3 = 1 THEN ''
                        ELSE lang END AS lang_mod
            FROM documents
        )
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CASE WHEN lang_mod IS NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_null,
               CAST(SUM(CASE WHEN lang_mod = '' THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_empty,
               CAST(SUM(CASE WHEN lang_mod <> '' THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_regular,
               CAST(SUM(length(lang_mod)) AS BIGINT) AS total_len
        FROM x
    """,
    tags=("sink", "csv", "documents"),
)
def sink_csv_null_empty_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL-vs-EMPTY CSV dialect roundtrip — the distinction CSV
    cannot natively spell (both serialize to nothing) and the one
    every warehouse loader gets wrong first: a three-way column
    (NULL / '' / value, derived from doc_id mod 3) written with the
    one LOSSLESS dialect Spark's writer+reader pair actually supports:
    explicit ``nullValue='\\\\N'`` plus the DEFAULT empty handling,
    which quotes empties RFC4180-style (``""``) — so ``\\\\N`` → NULL
    and ``""`` → '' on the way back. (Probed r10: the default dialect
    collapses '' into NULL on read, and an explicit ``emptyValue``
    sentinel is writer-only — the reader hands back the literal
    sentinel — both silently corrupting; this operator pins the
    config that doesn't.) The census (null/empty/regular counts +
    total length) is computed from the RECONSTRUCTED column and must
    equal the oracle's parquet truth. Completes the dialect battery
    (quote-all / TSV / escape / multiLine / gzip siblings). Per-task
    write, vectorized read."""
    import os as _os

    from big_data_audio_classification_spark.scratch import SCRATCH_DIR

    path = _os.path.join(SCRATCH_DIR, "sink_csv_null_empty_roundtrip")
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.when(F.col("doc_id") % 3 == 0, F.lit(None).cast("string"))
        .when(F.col("doc_id") % 3 == 1, F.lit(""))
        .otherwise(F.col("lang"))
        .alias("lang_mod"),
    )
    (
        d.write.mode("overwrite")
        .option("header", True)
        .option("nullValue", "\\N")
        .csv(path)
    )
    back = spark.read.csv(
        path,
        header=True,
        nullValue="\\N",
        schema="doc_id long, lang_mod string",
    )
    return back.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.when(F.col("lang_mod").isNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("n_null"),
        F.sum(F.when(F.col("lang_mod") == "", 1).otherwise(0))
        .cast("bigint")
        .alias("n_empty"),
        F.sum(F.when(F.col("lang_mod") != "", 1).otherwise(0))
        .cast("bigint")
        .alias("n_regular"),
        F.sum(F.length("lang_mod")).cast("bigint").alias("total_len"),
    )


# ---------------------------------------------------------------------------
# decomposition + rolling: rolling-detrended day-of-week residual profile
# ---------------------------------------------------------------------------


@query(
    "analytics_rolling_seasonal_resid",
    oracle="""
        WITH daily AS (
            SELECT CAST(ts AS DATE) AS day,
                   dayofweek(ts) AS dow,
                   CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
                       AS cents
            FROM events GROUP BY day, dow
        ),
        roll AS (
            SELECT day, dow, cents,
                   CAST(SUM(cents) OVER w AS BIGINT)  AS rsum,
                   CAST(COUNT(*) OVER w AS BIGINT)    AS rcnt
            FROM daily
            WINDOW w AS (ORDER BY day ROWS BETWEEN 3 PRECEDING
                                              AND 3 FOLLOWING)
        ),
        resid AS (
            SELECT day, dow,
                   cents - CAST(rsum AS DOUBLE) / rcnt AS r
            FROM roll
        )
        SELECT CAST(dow AS BIGINT) AS dow,
               CAST(COUNT(*) AS BIGINT) AS n_days,
               ROUND(list_sum(list(r ORDER BY day)) / COUNT(*), 6) + 0
                   AS mean_resid
        FROM resid GROUP BY dow
    """,
    tags=("analytics", "decomposition", "window", "rolling", "events"),
)
def analytics_rolling_seasonal_resid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLING-DETRENDED day-of-week profile — classical decomposition
    with a MOVING-AVERAGE trend instead of the global/linear trends
    the existing family pins (``analytics_dow_additive_profile``:
    grand-mean; ``analytics_detrend_linear_resid``: OLS line): daily
    exact-cent totals minus their centered 7-day rolling mean leave a
    residual whose per-DOW means ARE the weekly seasonal component,
    edge days shrinking the window to what exists (count window, not
    a 7 literal — the off-by-one every hand-rolled centered window
    hits). Rolling sum and count stay EXACT integers; each residual
    is one float subtraction; the per-DOW mean folds day-ordered.
    DOW in the DuckDB 0=Sunday convention (Spark dayofweek − 1 — the
    r05 cross-engine class), ``+ 0``-guarded. 100 TB: one day-keyed
    aggregate (map-side combinable), one ordered window over |days|
    rows, one 7-row rollup."""
    e = load_table(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100).cast("bigint")
    daily = e.groupBy(
        F.to_date("ts").alias("day"),
        (F.dayofweek("ts") - 1).alias("dow"),
    ).agg(F.sum(cents).cast("bigint").alias("cents"))
    w = Window.orderBy("day").rowsBetween(-3, 3)
    roll = daily.select(
        "day",
        "dow",
        "cents",
        F.sum("cents").over(w).cast("bigint").alias("rsum"),
        F.count(F.lit(1)).over(w).cast("bigint").alias("rcnt"),
    )
    resid = roll.select(
        "day",
        "dow",
        (F.col("cents") - F.col("rsum").cast("double") / F.col("rcnt")).alias(
            "r"
        ),
    )
    ordered = F.transform(
        F.array_sort(F.collect_list(F.struct("day", "r"))), lambda s: s["r"]
    )
    return resid.groupBy("dow").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        F.round(
            F.aggregate(ordered, F.lit(0.0), lambda a, x: a + x)
            / F.count(F.lit(1)),
            6,
        ).alias("mean_resid"),
    ).select(F.col("dow").cast("bigint").alias("dow"), "n_days", "mean_resid")


# ---------------------------------------------------------------------------
# causal: doubly-robust ATE with stratified propensity + outcome models
# ---------------------------------------------------------------------------

DR_TREAT_CUTOFF = "2024-01-03"  # treated = error before day 3


@query(
    "stats_dr_ate",
    oracle=f"""
        WITH u AS (
            SELECT user_id,
                   user_id % 4 AS stratum,
                   MAX(CASE WHEN event_type = 'error'
                             AND ts < TIMESTAMP '{DR_TREAT_CUTOFF}'
                            THEN 1 ELSE 0 END) AS t,
                   CAST(COALESCE(SUM(CASE WHEN event_type = 'purchase'
                        THEN CAST(ROUND(value * 100) AS BIGINT) END), 0)
                        AS BIGINT) AS y
            FROM events GROUP BY user_id
        ),
        s AS (
            SELECT stratum,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(t) AS BIGINT)   AS n_t,
                   CAST(SUM(t * y) AS BIGINT)       AS sy_t,
                   CAST(SUM((1 - t) * y) AS BIGINT) AS sy_c
            FROM u GROUP BY stratum
        ),
        m AS (
            SELECT stratum, n, n_t,
                   CAST(n_t AS DOUBLE) / n AS e_hat,
                   CASE WHEN n_t > 0
                        THEN CAST(sy_t AS DOUBLE) / n_t END AS m1,
                   CASE WHEN n - n_t > 0
                        THEN CAST(sy_c AS DOUBLE) / (n - n_t) END AS m0
            FROM s
        ),
        terms AS (
            SELECT u.user_id, u.stratum,
                   CASE WHEN m.n_t > 0 AND m.n - m.n_t > 0
                        THEN m.m1 - m.m0
                             + u.t * (u.y - m.m1) / m.e_hat
                             - (1 - u.t) * (u.y - m.m0) / (1.0 - m.e_hat)
                        ELSE NULL END AS dr
            FROM u JOIN m ON u.stratum = m.stratum
        )
        SELECT CAST(t.stratum AS BIGINT) AS stratum,
               m.n, m.n_t,
               ROUND(m.e_hat, 6)         AS e_hat,
               ROUND(m.m1, 6)            AS m1_cents,
               ROUND(m.m0, 6)            AS m0_cents,
               CASE WHEN COUNT(t.dr) > 0
                    THEN ROUND(list_sum(list(t.dr ORDER BY t.user_id))
                               / COUNT(t.dr), 6) + 0
                    ELSE NULL END AS dr_ate_cents
        FROM terms t JOIN m ON t.stratum = m.stratum
        GROUP BY t.stratum, m.n, m.n_t, m.e_hat, m.m1, m.m0
    """,
    tags=("stats", "causal", "inference", "events"),
)
def stats_dr_ate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DOUBLY-ROBUST ATE (AIPW) per stratum — the estimator that
    completes the causal family (IPW: ``stats_ipw_ate``;
    stratified outcome means: ``stats_stratified_ate``): term_i =
    m1 − m0 + T(y−m1)/e − (1−T)(y−m0)/(1−e), consistent if EITHER
    the propensity e(s) or the outcome model m_t(s) is right.
    Treatment = an error in the first two observation days (real
    variation at every SF, unlike the universal signup); outcome =
    exact purchase cents; strata = user_id mod 4. All model inputs
    are float divisions of exact integers; each user's term is one
    fixed-order expression; the stratum mean folds user-ordered,
    ``+ 0``-guarded. A one-sided stratum (all treated — sf0.001 hits
    this) degrades to NULL on BOTH engines rather than a division
    blow-up: the guard is the operator's honesty contract. 100 TB:
    two user-keyed aggregates + a 4-row broadcast model join."""
    e = load_table(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100).cast("bigint")
    u = e.groupBy("user_id").agg(
        F.max(
            F.when(
                (F.col("event_type") == "error")
                & (F.col("ts") < F.lit(DR_TREAT_CUTOFF).cast("timestamp")),
                1,
            ).otherwise(0)
        ).alias("t"),
        F.coalesce(
            F.sum(F.when(F.col("event_type") == "purchase", cents)), F.lit(0)
        )
        .cast("bigint")
        .alias("y"),
    ).select("user_id", (F.col("user_id") % 4).alias("stratum"), "t", "y")
    s = u.groupBy("stratum").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("t").cast("bigint").alias("n_t"),
        F.sum(F.col("t") * F.col("y")).cast("bigint").alias("sy_t"),
        F.sum((1 - F.col("t")) * F.col("y")).cast("bigint").alias("sy_c"),
    )
    m = s.select(
        "stratum",
        "n",
        "n_t",
        (F.col("n_t").cast("double") / F.col("n")).alias("e_hat"),
        F.when(
            F.col("n_t") > 0, F.col("sy_t").cast("double") / F.col("n_t")
        ).alias("m1"),
        F.when(
            F.col("n") - F.col("n_t") > 0,
            F.col("sy_c").cast("double") / (F.col("n") - F.col("n_t")),
        ).alias("m0"),
    )
    terms = u.join(F.broadcast(m), "stratum").select(
        "user_id",
        "stratum",
        F.when(
            (F.col("n_t") > 0) & (F.col("n") - F.col("n_t") > 0),
            F.col("m1")
            - F.col("m0")
            + F.col("t") * (F.col("y") - F.col("m1")) / F.col("e_hat")
            - (1 - F.col("t"))
            * (F.col("y") - F.col("m0"))
            / (1.0 - F.col("e_hat")),
        ).alias("dr"),
    )
    ordered = F.transform(
        F.array_sort(F.collect_list(F.struct("user_id", "dr"))),
        lambda x: x["dr"],
    )
    agg = terms.groupBy("stratum").agg(
        F.count("dr").cast("bigint").alias("n_dr"),
        F.aggregate(
            F.filter(ordered, lambda v: v.isNotNull()),
            F.lit(0.0),
            lambda a, x: a + x,
        ).alias("dr_sum"),
    )
    return (
        agg.join(F.broadcast(m), "stratum")
        .select(
            F.col("stratum").cast("bigint").alias("stratum"),
            "n",
            "n_t",
            F.round("e_hat", 6).alias("e_hat"),
            F.round("m1", 6).alias("m1_cents"),
            F.round("m0", 6).alias("m0_cents"),
            F.when(
                F.col("n_dr") > 0,
                F.round(F.col("dr_sum") / F.col("n_dr"), 6),
            ).alias("dr_ate_cents"),
        )
    )


# ---------------------------------------------------------------------------
# iterative -> SQL contract: bounded-round CC cluster-size histogram
# ---------------------------------------------------------------------------

CC_BOUNDED_ROUNDS = 6


def _cc_bounded_hist_sql() -> str:
    from big_data_audio_classification_spark.operators.dedup import (
        LSH_BANDS,
        LSH_ROWS,
        _minhash_sql,
    )

    band_exprs = ", ".join(
        "CONCAT_WS('_', "
        + ", ".join(f"m{b * LSH_ROWS + r}" for r in range(LSH_ROWS))
        + f") AS band{b}"
        for b in range(LSH_BANDS)
    )
    unions = "\n            UNION ALL\n            ".join(
        f"SELECT doc_id, {b} AS band_id, band{b} AS band_hash FROM sig_bands"
        for b in range(LSH_BANDS)
    )
    rounds = []
    prev = "r0"
    for k in range(1, CC_BOUNDED_ROUNDS + 1):
        rounds.append(
            f"""b{k} AS (
            SELECT bands.band_id, bands.band_hash, MIN({prev}.rep) AS b_rep
            FROM bands JOIN {prev} ON bands.doc_id = {prev}.doc_id
            GROUP BY bands.band_id, bands.band_hash
        ),
        p{k} AS (
            SELECT bands.doc_id, MIN(b{k}.b_rep) AS p_rep
            FROM bands JOIN b{k}
              ON bands.band_id = b{k}.band_id
             AND bands.band_hash = b{k}.band_hash
            GROUP BY bands.doc_id
        ),
        r{k} AS (
            SELECT r.doc_id,
                   LEAST(r.rep, COALESCE(p{k}.p_rep, r.rep)) AS rep
            FROM {prev} r LEFT JOIN p{k} ON r.doc_id = p{k}.doc_id
        )"""
        )
        prev = f"r{k}"
    return f"""
        WITH sig AS ({_minhash_sql()}),
        sig_bands AS (SELECT doc_id, {band_exprs} FROM sig),
        bands AS (
            {unions}
        ),
        r0 AS (SELECT DISTINCT doc_id, doc_id AS rep FROM bands),
        {",".join(rounds)},
        sizes AS (
            SELECT rep, CAST(COUNT(*) AS BIGINT) AS cluster_size
            FROM {prev} GROUP BY rep
        )
        SELECT cluster_size,
               CAST(COUNT(*) AS BIGINT) AS n_clusters,
               CAST(COUNT(*) * cluster_size AS BIGINT) AS n_docs
        FROM sizes GROUP BY cluster_size
    """


@query(
    "dedup_cc_bounded_histogram",
    oracle=_cc_bounded_hist_sql(),
    tags=("dedup", "minhash", "lsh", "iterative", "report", "documents"),
)
def dedup_cc_bounded_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL-CORPUS connected-components CLUSTER-SIZE HISTOGRAM under a
    BOUNDED round count — the r09-verdict item-7 conversion: the
    fixpoint CC (``dedup_connected_components``) is genuinely
    iterative and stays rows-only, but 'labels after EXACTLY K
    min-label rounds' is a deterministic, data-independent recursion
    depth — so it unrolls into K chained CTE pairs (bucket-min then
    doc-min per round, the identical semantics of ``_cc_min_label``)
    and becomes SQL-oracled over the WHOLE corpus, no doc-slice cap.
    (The capped sibling ``dedup_cc_transitive_oracle`` cross-checks
    true transitive closure but cannot scale its O(Σk²) reach
    materialization: the corpus carries a giant component — 3884 of
    5000 docs at sf0.1 — so full closure is quadratic by measurement,
    while K bounded rounds are 2K keyed aggregates regardless of
    component shape.) The histogram face (cluster_size → n_clusters,
    n_docs) is the dedup-planning artifact anyway: it prices the
    keep-first sweep and flags the giant component. All exact
    integers. 100 TB: 2K shuffles over the (doc, band) edge table —
    the bounded-sweep production pattern when full convergence isn't
    worth the tail rounds."""
    from big_data_audio_classification_spark.operators.dedup import (
        _lsh_band_table,
    )

    d = load_table(spark, sf_dir, "documents")
    bands = _lsh_band_table(d).localCheckpoint(eager=True)
    reps = bands.select("doc_id").distinct().select(
        "doc_id", F.col("doc_id").alias("rep")
    )
    for _ in range(CC_BOUNDED_ROUNDS):
        bucket_rep = (
            bands.join(reps, "doc_id")
            .groupBy("band_id", "band_hash")
            .agg(F.min("rep").alias("b_rep"))
        )
        # The oracle's LEFT JOIN + LEAST(rep, COALESCE(p_rep, rep)) is
        # the IDENTITY here, dropped on the Spark side (r10): every doc
        # in reps came from bands (r0 = distinct doc_id FROM bands), so
        # the proposed min always exists, and a doc's own bucket
        # contains its own rep, so p_rep = min over its buckets'
        # mins <= rep — LEAST always resolves to p_rep. One join per
        # round removed; labels after round k are bit-identical.
        reps = (
            bands.join(bucket_rep, ["band_id", "band_hash"])
            .groupBy("doc_id")
            .agg(F.min("b_rep").alias("rep"))
            .localCheckpoint(eager=True)
        )
    sizes = reps.groupBy("rep").agg(
        F.count(F.lit(1)).cast("bigint").alias("cluster_size")
    )
    return sizes.groupBy("cluster_size").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_clusters"),
        (F.count(F.lit(1)) * F.col("cluster_size"))
        .cast("bigint")
        .alias("n_docs"),
    )
