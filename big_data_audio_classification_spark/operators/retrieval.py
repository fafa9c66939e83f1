"""Text-retrieval operators over the documents corpus: BM25 ranking,
conjunctive inverted-index search, MOSS-style winnowing fingerprints,
and PMI collocation mining.

These are the search-side complement of the dedup/curation family: a
training-data pipeline that can dedup a corpus also needs to QUERY it
(find documents about X, find the plagiarised spans, find the phrases
that behave as units). All four operators are pure built-in
expressions — zero Python in the hot path — with exact DuckDB oracles.

Scale notes:
* BM25: the term filter is applied at the scan (only postings for the
  query's terms ever shuffle); document-frequency and corpus stats are
  one-row/terms-row aggregates broadcast onto the postings; the final
  top-k is orderBy+limit → TakeOrderedAndProject (per-partition heap +
  driver merge, no global sort).
* Conjunctive AND: posting-list intersection is ONE groupBy counting
  distinct matched terms per doc — no pairwise posting joins, linear
  in postings touched.
* Winnowing: per-document window min over gram positions — partitioned
  by doc_id, O(w) state, no shuffle beyond the doc-keyed exchange;
  fingerprints are 8-byte codes (hash * 2^21 - pos, so the min-code
  within a window is the min-hash with the LAST position as tiebreak;
  valid for documents under 2^21 grams — far past any real document,
  and recoverable as pos = hash * 2^21 - code), text never moves.
* PMI: two token-keyed aggregations + two keyed joins on the unigram
  table; counts are map-side combined.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from big_data_audio_classification_spark.operators.dedup import (
    _SQL_TOKENS,
    token_hash,
    tokens_col,
)
from big_data_audio_classification_spark.registry import query
from big_data_audio_classification_spark.sources.catalog import load_table

# 'dup' is the rare, discriminative term in the synthetic corpus
# (df≈25/500); the others are mid-frequency. BM25's idf weighting is
# what the query demonstrates.
QUERY_TERMS = ("dup", "spark", "query")
BM25_K1 = 1.2
BM25_B = 0.75
BM25_TOPK = 20

_TERMS_SQL = "(" + ", ".join(f"'{t}'" for t in QUERY_TERMS) + ")"


@query(
    "retrieval_bm25_topk",
    oracle=f"""
        WITH dd AS (
            SELECT doc_id, toks, len(toks) AS dl
            FROM (SELECT doc_id, {_SQL_TOKENS} AS toks FROM documents)
            WHERE len(toks) > 0
        ),
        st AS (SELECT COUNT(*) AS n_docs, AVG(dl) AS avgdl FROM dd),
        tf AS (
            SELECT doc_id, dl, tok AS term, COUNT(*) AS tf
            FROM (SELECT doc_id, dl, UNNEST(toks) AS tok FROM dd)
            WHERE tok IN {_TERMS_SQL}
            GROUP BY doc_id, dl, tok
        ),
        dfs AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM tf GROUP BY term)
        SELECT doc_id,
               ROUND(SUM(ln(1 + (n_docs - df + 0.5) / (df + 0.5))
                         * (tf * ({BM25_K1} + 1))
                         / (tf + {BM25_K1} * (1 - {BM25_B}
                                              + {BM25_B} * dl / avgdl))), 6)
                                        AS bm25,
               CAST(COUNT(*) AS BIGINT) AS n_terms_matched
        FROM tf JOIN dfs USING (term) CROSS JOIN st
        GROUP BY doc_id
        ORDER BY bm25 DESC, doc_id
        LIMIT {BM25_TOPK}
    """,
    tags=("retrieval", "text", "bm25", "documents"),
)
def retrieval_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 top-k ranking for a fixed term query.

    Plan shape for 100 TB: the `isin` term filter reaches the exploded
    postings immediately (only query-term postings shuffle — for a
    3-term query that is a vanishing fraction of the corpus); df and
    (N, avgdl) are tiny aggregates broadcast onto the postings; the
    global top-k is TakeOrderedAndProject, not a full sort."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", tokens_col(F.col("text")).alias("toks")
    )
    dd = d.filter(F.size("toks") > 0).select(
        "doc_id", "toks", F.size("toks").alias("dl")
    )
    st = dd.agg(F.count("*").alias("n_docs"), F.avg("dl").alias("avgdl"))
    tf = (
        dd.select("doc_id", "dl", F.explode("toks").alias("term"))
        .filter(F.col("term").isin(*QUERY_TERMS))
        .groupBy("doc_id", "dl", "term")
        .agg(F.count("*").alias("tf"))
    )
    dfs = tf.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    idf = F.log(
        1 + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    contrib = idf * (F.col("tf") * (BM25_K1 + 1)) / (
        F.col("tf")
        + BM25_K1 * (1 - BM25_B + BM25_B * F.col("dl") / F.col("avgdl"))
    )
    return (
        tf.join(F.broadcast(dfs), "term")
        .crossJoin(F.broadcast(st))
        .groupBy("doc_id")
        .agg(
            F.round(F.sum(contrib), 6).alias("bm25"),
            F.count("*").cast("bigint").alias("n_terms_matched"),
        )
        .orderBy(F.desc("bm25"), "doc_id")
        .limit(BM25_TOPK)
    )


@query(
    "retrieval_conjunctive_terms",
    oracle=f"""
        WITH hits AS (
            SELECT doc_id, tok, COUNT(*) AS c
            FROM (SELECT doc_id, UNNEST({_SQL_TOKENS}) AS tok FROM documents)
            WHERE tok IN {_TERMS_SQL}
            GROUP BY doc_id, tok
        ),
        matched AS (
            SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_hits
            FROM hits
            GROUP BY doc_id
            HAVING COUNT(DISTINCT tok) = {len(QUERY_TERMS)}
        )
        SELECT m.doc_id, m.n_hits, d.lang, d.source
        FROM matched m JOIN documents d ON m.doc_id = d.doc_id
    """,
    tags=("retrieval", "text", "inverted-index", "documents"),
)
def retrieval_conjunctive_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conjunctive (AND) retrieval: documents containing EVERY query
    term. Posting-list intersection is expressed as one aggregation —
    count distinct matched terms per doc equals the query arity — the
    linear-in-postings form an inverted index uses, with no pairwise
    posting-list joins."""
    d = load_table(spark, sf_dir, "documents")
    hits = (
        d.select("doc_id", F.explode(tokens_col(F.col("text"))).alias("tok"))
        .filter(F.col("tok").isin(*QUERY_TERMS))
        .groupBy("doc_id", "tok")
        .agg(F.count("*").alias("c"))
    )
    matched = (
        hits.groupBy("doc_id")
        .agg(
            F.sum("c").cast("bigint").alias("n_hits"),
            F.countDistinct("tok").alias("nt"),
        )
        .filter(F.col("nt") == len(QUERY_TERMS))
        .drop("nt")
    )
    return matched.join(d.select("doc_id", "lang", "source"), "doc_id").select(
        "doc_id", "n_hits", "lang", "source"
    )


WINNOW_K = 4          # words per gram
WINNOW_W = 4          # winnowing window (grams)
_POS_ENC = 1 << 21    # fingerprint code = hash * 2^21 - pos

_SQL_GRAM_HASH = "CAST(('0x' || substr(md5(gram), 1, 8)) AS BIGINT)"


def winnowing_selections(words_df: DataFrame) -> DataFrame:
    """Core winnowing pass over (doc_id, words array): one row per
    FULL window position p ≥ w with the selected fingerprint code
    (hash·2²¹ − pos; position recoverable as 2²¹ − (code mod 2²¹)).
    Shared by the registered query and the property tests."""
    from pyspark.sql import Window

    k, ww = WINNOW_K, WINNOW_W
    grams = (
        words_df.filter(F.size("words") >= k)
        .select(
            "doc_id",
            (F.size("words") - (k - 1)).cast("bigint").alias("n_grams"),
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("words") - (k - 1)),
                    lambda i: F.struct(
                        i.alias("pos"),
                        F.concat_ws(" ", F.slice("words", i, k)).alias("gram"),
                    ),
                )
            ).alias("g"),
        )
        .select(
            "doc_id",
            "n_grams",
            F.col("g.pos").alias("pos"),
            (
                token_hash(F.col("g.gram")) * F.lit(_POS_ENC)
                - F.col("g.pos")
            ).alias("code"),
        )
    )
    win = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(-(ww - 1), 0)
    )
    return grams.withColumn("fp", F.min("code").over(win)).filter(
        F.col("pos") >= ww
    )



@query(
    "text_winnowing_fingerprints",
    oracle=f"""
        WITH w AS (
            SELECT doc_id, string_split(text, ' ') AS words FROM documents
        ),
        g AS (
            SELECT doc_id, len(words) - {WINNOW_K - 1} AS n_grams, i AS pos,
                   array_to_string(words[i:i+{WINNOW_K - 1}], ' ') AS gram
            FROM w, UNNEST(generate_series(1, len(words) - {WINNOW_K - 1}))
                 AS t(i)
            WHERE len(words) >= {WINNOW_K}
        ),
        sel AS (
            SELECT doc_id, n_grams,
                   MIN({_SQL_GRAM_HASH} * {_POS_ENC} - pos)
                       OVER (PARTITION BY doc_id ORDER BY pos
                             ROWS BETWEEN {WINNOW_W - 1} PRECEDING
                                      AND CURRENT ROW) AS fp
            FROM g
            QUALIFY pos >= {WINNOW_W}
        )
        SELECT doc_id, CAST(n_grams AS BIGINT) AS n_grams,
               CAST(COUNT(DISTINCT fp) AS BIGINT) AS n_fingerprints,
               MD5(array_to_string(list_sort(list(DISTINCT fp)), ','))
                   AS fp_digest
        FROM sel
        GROUP BY doc_id, n_grams
    """,
    tags=("text", "fingerprint", "winnowing", "documents"),
)
def text_winnowing_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing document fingerprints (the MOSS algorithm): hash every
    word 4-gram, slide a window of 4 gram hashes, keep the minimum of
    each window (ties → rightmost). Guarantees a fingerprint in every
    window, so any shared run of ≥ w+k-1 words between two documents
    shares a fingerprint — the local-sampling upgrade over the fixed
    rolling-hash fingerprint in ``text_fingerprint_rolling``.

    The tie rule is encoded arithmetically: code = hash·2²¹ − pos, so
    MIN(code) picks the smallest hash and, among equals, the LARGEST
    position — one window MIN, no argmin gymnastics. The fingerprint
    IS the code (hash and position recoverable by div/mod). The
    every-window-covered law is property-tested over random word
    sequences in tests/test_properties.py.

    Scale: one doc-keyed exchange; O(w) window state; emitted
    fingerprints are 8-byte longs (~2/(w+1) density), text never
    shuffles."""
    d = load_table(spark, sf_dir, "documents")
    w = d.select("doc_id", F.split("text", " ").alias("words"))
    sel = winnowing_selections(w)
    return sel.groupBy("doc_id", "n_grams").agg(
        F.countDistinct("fp").cast("bigint").alias("n_fingerprints"),
        F.md5(
            F.concat_ws(
                ",",
                F.transform(
                    F.array_sort(F.collect_set("fp")),
                    lambda x: x.cast("string"),
                ),
            )
        ).alias("fp_digest"),
    )


PMI_MIN_COUNT = 5
PMI_TOPK = 20


@query(
    "text_pmi_collocations",
    oracle=f"""
        WITH w AS (
            SELECT doc_id, {_SQL_TOKENS} AS toks FROM documents
        ),
        uni AS (
            SELECT tok, COUNT(*) AS c
            FROM (SELECT UNNEST(toks) AS tok FROM w)
            GROUP BY tok
        ),
        tot AS (SELECT CAST(SUM(c) AS DOUBLE) AS t FROM uni),
        bi AS (
            SELECT toks[i] AS w1, toks[i+1] AS w2
            FROM w, UNNEST(generate_series(1, len(toks) - 1)) AS s(i)
            WHERE len(toks) >= 2
        ),
        btot AS (SELECT CAST(COUNT(*) AS DOUBLE) AS b FROM bi),
        c12 AS (
            SELECT w1, w2, COUNT(*) AS c12 FROM bi GROUP BY w1, w2
            HAVING COUNT(*) >= {PMI_MIN_COUNT}
        )
        SELECT w1, w2, CAST(c12 AS BIGINT) AS pair_count,
               ROUND(log2((CAST(c12 AS DOUBLE) * t * t)
                          / (b * u1.c * u2.c)), 6) AS pmi
        FROM c12
        JOIN uni u1 ON c12.w1 = u1.tok
        JOIN uni u2 ON c12.w2 = u2.tok
        CROSS JOIN tot CROSS JOIN btot
        ORDER BY pmi DESC, w1, w2
        LIMIT {PMI_TOPK}
    """,
    tags=("text", "pmi", "collocations", "documents"),
)
def text_pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pointwise-mutual-information collocations: adjacent word pairs
    that co-occur far more than chance (PMI = log2(p(w1,w2) /
    p(w1)p(w2))) — the classic phrase-mining signal for tokenizer and
    vocabulary construction over a training corpus.

    Scale: bigram and unigram counts are two map-side-combined
    aggregations; the two joins back onto the unigram table are keyed
    on the token (vocabulary-sized, Zipf-bounded); probabilities are
    computed in double precision so the arithmetic never overflows at
    corpus scale; final top-k is TakeOrderedAndProject."""
    d = load_table(spark, sf_dir, "documents")
    w = d.select("doc_id", tokens_col(F.col("text")).alias("toks"))
    uni = (
        w.select(F.explode("toks").alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").alias("c"))
    )
    tot = uni.agg(F.sum("c").cast("double").alias("t"))
    bi = w.filter(F.size("toks") >= 2).select(
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("toks") - 1),
                lambda i: F.struct(
                    F.element_at("toks", i).alias("w1"),
                    F.element_at("toks", i + 1).alias("w2"),
                ),
            )
        ).alias("p")
    ).select("p.w1", "p.w2")
    btot = bi.agg(F.count("*").cast("double").alias("b"))
    c12 = (
        bi.groupBy("w1", "w2")
        .agg(F.count("*").alias("c12"))
        .filter(F.col("c12") >= PMI_MIN_COUNT)
    )
    u1 = uni.select(F.col("tok").alias("w1"), F.col("c").alias("c1"))
    u2 = uni.select(F.col("tok").alias("w2"), F.col("c").alias("c2"))
    pmi = F.round(
        F.log2(
            (F.col("c12").cast("double") * F.col("t") * F.col("t"))
            / (F.col("b") * F.col("c1") * F.col("c2"))
        ),
        6,
    )
    return (
        c12.join(u1, "w1")
        .join(u2, "w2")
        .crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(btot))
        .select(
            "w1",
            "w2",
            F.col("c12").cast("bigint").alias("pair_count"),
            pmi.alias("pmi"),
        )
        .orderBy(F.desc("pmi"), "w1", "w2")
        .limit(PMI_TOPK)
    )


RRF_K = 60          # standard reciprocal-rank-fusion constant
RRF_LIST_N = 20     # depth of each input ranking
RRF_TOPK = 10
RRF_QUERY_VEC = 0   # embeddings.vec_id of the dense query vector

_SQL_BM25_RANKED = f"""
        dd AS (
            SELECT doc_id, toks, len(toks) AS dl
            FROM (SELECT doc_id, {_SQL_TOKENS} AS toks FROM documents)
            WHERE len(toks) > 0
        ),
        st AS (SELECT COUNT(*) AS n_docs, AVG(dl) AS avgdl FROM dd),
        tf AS (
            SELECT doc_id, dl, tok AS term, COUNT(*) AS tf
            FROM (SELECT doc_id, dl, UNNEST(toks) AS tok FROM dd)
            WHERE tok IN {_TERMS_SQL}
            GROUP BY doc_id, dl, tok
        ),
        dfs AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM tf GROUP BY term),
        bm AS (
            SELECT doc_id,
                   ROUND(SUM(ln(1 + (n_docs - df + 0.5) / (df + 0.5))
                             * (tf * ({BM25_K1} + 1))
                             / (tf + {BM25_K1} * (1 - {BM25_B}
                                                  + {BM25_B} * dl / avgdl))), 6)
                       AS s
            FROM tf JOIN dfs USING (term) CROSS JOIN st
            GROUP BY doc_id
        ),
        bm_ranked AS (
            SELECT doc_id, ROW_NUMBER() OVER (ORDER BY s DESC, doc_id) AS r
            FROM bm QUALIFY r <= {RRF_LIST_N}
        )
"""

_SQL_DENSE_RANKED = f"""
        q AS (SELECT embedding FROM embeddings WHERE vec_id = {RRF_QUERY_VEC}),
        cs AS (
            SELECT b.vec_id AS doc_id,
                   ROUND(
                     list_sum(list_transform(list_zip(q.embedding, b.embedding),
                              p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
                     / (SQRT(list_sum(list_transform(q.embedding,
                              x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
                        * SQRT(list_sum(list_transform(b.embedding,
                              x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))), 6)
                       AS s
            FROM embeddings b CROSS JOIN q
            WHERE b.vec_id <> {RRF_QUERY_VEC}
        ),
        dense_ranked AS (
            SELECT doc_id, ROW_NUMBER() OVER (ORDER BY s DESC, doc_id) AS r
            FROM cs QUALIFY r <= {RRF_LIST_N}
        )
"""


@query(
    "retrieval_rrf_hybrid",
    oracle=f"""
        WITH {_SQL_BM25_RANKED.strip()},
        {_SQL_DENSE_RANKED.strip()}
        SELECT COALESCE(b.doc_id, d.doc_id) AS doc_id,
               ROUND(COALESCE(1.0 / ({RRF_K} + b.r), 0)
                     + COALESCE(1.0 / ({RRF_K} + d.r), 0), 6) AS rrf_score,
               b.r AS bm25_rank,
               d.r AS dense_rank
        FROM bm_ranked b FULL OUTER JOIN dense_ranked d USING (doc_id)
        ORDER BY rrf_score DESC, doc_id
        LIMIT {RRF_TOPK}
    """,
    tags=("retrieval", "hybrid", "rrf", "documents", "embeddings"),
)
def retrieval_rrf_hybrid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval via reciprocal rank fusion: a sparse BM25
    ranking over `documents` and a dense cosine ranking over
    `embeddings` (doc_id ≡ vec_id) fused as Σ 1/(60 + rank) — the
    standard RAG retrieval stack, entirely relational.

    Scale: each leg is the already-scale-shaped ranking (term-filtered
    postings / broadcast-query cosine with ANN as the swap-in); fusion
    is a full-outer equi-join of two TOP-N lists — list-sized, not
    corpus-sized."""
    from big_data_audio_classification_spark.functions.vector import (
        cosine,
        to_double,
    )

    # --- sparse leg: BM25 top-N ranks ---
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", tokens_col(F.col("text")).alias("toks")
    )
    dd = d.filter(F.size("toks") > 0).select(
        "doc_id", "toks", F.size("toks").alias("dl")
    )
    st = dd.agg(F.count("*").alias("n_docs"), F.avg("dl").alias("avgdl"))
    tf = (
        dd.select("doc_id", "dl", F.explode("toks").alias("term"))
        .filter(F.col("term").isin(*QUERY_TERMS))
        .groupBy("doc_id", "dl", "term")
        .agg(F.count("*").alias("tf"))
    )
    dfs = tf.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    idf = F.log(1 + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5))
    contrib = idf * (F.col("tf") * (BM25_K1 + 1)) / (
        F.col("tf") + BM25_K1 * (1 - BM25_B + BM25_B * F.col("dl") / F.col("avgdl"))
    )
    bm = (
        tf.join(F.broadcast(dfs), "term")
        .crossJoin(F.broadcast(st))
        .groupBy("doc_id")
        .agg(F.round(F.sum(contrib), 6).alias("s"))
    )
    from pyspark.sql import Window

    bm_ranked = (
        bm.withColumn(
            "r", F.row_number().over(Window.orderBy(F.desc("s"), "doc_id"))
        )
        .filter(F.col("r") <= RRF_LIST_N)
        .select("doc_id", F.col("r").alias("bm25_rank"))
    )

    # --- dense leg: cosine top-N ranks ---
    em = load_table(spark, sf_dir, "embeddings")
    qv = em.filter(F.col("vec_id") == RRF_QUERY_VEC).select(
        F.col("embedding").alias("q_emb")
    )
    cs = (
        em.filter(F.col("vec_id") != RRF_QUERY_VEC)
        .crossJoin(F.broadcast(qv))
        .select(
            F.col("vec_id").alias("doc_id"),
            F.round(
                cosine(to_double(F.col("q_emb")), to_double(F.col("embedding"))),
                6,
            ).alias("s"),
        )
    )
    dense_ranked = (
        cs.withColumn(
            "r", F.row_number().over(Window.orderBy(F.desc("s"), "doc_id"))
        )
        .filter(F.col("r") <= RRF_LIST_N)
        .select("doc_id", F.col("r").alias("dense_rank"))
    )

    # --- fusion ---
    fused = bm_ranked.join(dense_ranked, "doc_id", "full_outer")
    rrf = F.round(
        F.coalesce(1.0 / (RRF_K + F.col("bm25_rank")), F.lit(0.0))
        + F.coalesce(1.0 / (RRF_K + F.col("dense_rank")), F.lit(0.0)),
        6,
    )
    return (
        fused.select("doc_id", rrf.alias("rrf_score"), "bm25_rank", "dense_rank")
        .orderBy(F.desc("rrf_score"), "doc_id")
        .limit(RRF_TOPK)
    )


PHRASE = ("the", "data")  # two-term exact phrase


@query(
    "retrieval_phrase_positions",
    oracle=f"""
        WITH p AS (
            SELECT doc_id, tok, i AS pos
            FROM (SELECT doc_id, {_SQL_TOKENS} AS toks FROM documents),
                 UNNEST(generate_series(1, len(toks))) AS t(i),
                 LATERAL (SELECT toks[i] AS tok)
            WHERE tok IN ('{PHRASE[0]}', '{PHRASE[1]}')
        )
        SELECT a.doc_id,
               CAST(COUNT(*) AS BIGINT)        AS n_occurrences,
               CAST(MIN(a.pos) AS BIGINT)      AS first_pos
        FROM p a JOIN p b
          ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
        WHERE a.tok = '{PHRASE[0]}' AND b.tok = '{PHRASE[1]}'
        GROUP BY a.doc_id
    """,
    tags=("retrieval", "phrase", "positional-index", "documents"),
)
def retrieval_phrase_positions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact PHRASE search via a positional inverted index: postings
    carry (doc, term, position); a phrase match is an equi-join of the
    two terms' postings on (doc, pos+1 adjacency) — the real
    positional-index algorithm, generalizing to k terms as a chain of
    position-offset joins.

    Scale: only the phrase's terms survive the posting filter (map
    side); the adjacency join is keyed on (doc, pos) — posting-sized,
    never corpus-sized, and each join leg carries 16 bytes per
    posting."""
    d = load_table(spark, sf_dir, "documents")
    p = (
        d.select(
            "doc_id",
            F.posexplode(tokens_col(F.col("text"))).alias("pos0", "tok"),
        )
        .select("doc_id", (F.col("pos0") + 1).alias("pos"), "tok")
        .filter(F.col("tok").isin(*PHRASE))
    )
    a = p.filter(F.col("tok") == PHRASE[0]).select("doc_id", "pos")
    b = p.filter(F.col("tok") == PHRASE[1]).select(
        "doc_id", (F.col("pos") - 1).alias("pos")
    )
    return (
        a.join(b, ["doc_id", "pos"])
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_occurrences"),
            F.min("pos").cast("bigint").alias("first_pos"),
        )
    )


RANK_K = 10      # evaluation cutoff for P@K / MRR@K / NDCG@K
REL_MIN = 2      # docs matching >= REL_MIN distinct query terms count
#                  as binary-relevant; the match count itself is the
#                  graded relevance for DCG


@query(
    "retrieval_ranking_metrics",
    oracle=f"""
        WITH dd AS (
            SELECT doc_id, toks, len(toks) AS dl
            FROM (SELECT doc_id, {_SQL_TOKENS} AS toks FROM documents)
            WHERE len(toks) > 0
        ),
        st AS (SELECT COUNT(*) AS n_docs, AVG(dl) AS avgdl FROM dd),
        tf AS (
            SELECT doc_id, dl, tok AS term, COUNT(*) AS tf
            FROM (SELECT doc_id, dl, UNNEST(toks) AS tok FROM dd)
            WHERE tok IN {_TERMS_SQL}
            GROUP BY doc_id, dl, tok
        ),
        dfs AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM tf GROUP BY term),
        scored AS (
            SELECT doc_id,
                   ROUND(SUM(ln(1 + (n_docs - df + 0.5) / (df + 0.5))
                             * (tf * ({BM25_K1} + 1))
                             / (tf + {BM25_K1} * (1 - {BM25_B}
                                                  + {BM25_B} * dl / avgdl))), 9)
                       AS bm25,
                   COUNT(*) AS rel
            FROM tf JOIN dfs USING (term) CROSS JOIN st
            GROUP BY doc_id
        ),
        g AS (
            SELECT COUNT(*) AS n_candidates,
                   SUM(CASE WHEN rel >= 3 THEN 1 ELSE 0 END) AS c3,
                   SUM(CASE WHEN rel =  2 THEN 1 ELSE 0 END) AS c2,
                   SUM(CASE WHEN rel =  1 THEN 1 ELSE 0 END) AS c1
            FROM scored
        ),
        top AS (
            SELECT doc_id, rel,
                   ROW_NUMBER() OVER (ORDER BY bm25 DESC, doc_id) AS r
            FROM scored
            QUALIFY r <= {RANK_K}
        ),
        m AS (
            SELECT SUM(CASE WHEN rel >= {REL_MIN} THEN 1.0 ELSE 0.0 END)
                       / {RANK_K} AS p_at_k,
                   COALESCE(MAX(CASE WHEN rel >= {REL_MIN}
                                     THEN 1.0 / r END), 0.0) AS mrr_at_k,
                   SUM((POWER(2.0, rel) - 1) / LOG2(r + 1)) AS dcg
            FROM top
        ),
        ideal AS (
            SELECT SUM((POWER(2.0, CASE WHEN r <= c3 THEN 3
                                        WHEN r <= c3 + c2 THEN 2
                                        WHEN r <= c3 + c2 + c1 THEN 1
                                        ELSE 0 END) - 1)
                       / LOG2(r + 1)) AS idcg
            FROM (SELECT i + 1 AS r FROM UNNEST(range({RANK_K})) AS t(i))
            CROSS JOIN g
        )
        SELECT {RANK_K} AS k,
               CAST(g.n_candidates AS BIGINT)   AS n_candidates,
               CAST(g.c3 + g.c2 AS BIGINT)      AS n_relevant,
               ROUND(m.p_at_k, 6)               AS p_at_k,
               ROUND(m.mrr_at_k, 6)             AS mrr_at_k,
               ROUND(m.dcg, 6)                  AS dcg,
               ROUND(ideal.idcg, 6)             AS idcg,
               ROUND(m.dcg / ideal.idcg, 6)     AS ndcg
        FROM m CROSS JOIN ideal CROSS JOIN g
    """,
    tags=("retrieval", "text", "ranking", "evaluation", "documents"),
)
def retrieval_ranking_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking-quality evaluation of the BM25 ranker against term-match
    relevance labels: Precision@K, MRR@K, and NDCG@K (graded relevance
    = distinct query terms matched; binary relevance = >= REL_MIN).

    Everything derives from (a) the TOP-K prefix of the ranking —
    orderBy+limit, i.e. TakeOrderedAndProject per-partition heaps, no
    global sort — and (b) the GRADE HISTOGRAM (one aggregate row),
    from which the ideal DCG is reconstructed against a K-row rank
    spine; no window ever touches more than K rows. BM25 scores are
    pre-rounded to 1e-9 before ranking so FP summation-order noise
    cannot reorder near-ties across engines (doc_id breaks exact
    ties). This is the offline eval loop a retrieval pipeline runs per
    query batch; per-query metrics would group the same plan by
    query_id."""
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", tokens_col(F.col("text")).alias("toks")
    )
    dd = d.filter(F.size("toks") > 0).select(
        "doc_id", "toks", F.size("toks").alias("dl")
    )
    st = dd.agg(F.count("*").alias("n_docs"), F.avg("dl").alias("avgdl"))
    tf = (
        dd.select("doc_id", "dl", F.explode("toks").alias("term"))
        .filter(F.col("term").isin(*QUERY_TERMS))
        .groupBy("doc_id", "dl", "term")
        .agg(F.count("*").alias("tf"))
    )
    dfs = tf.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    idf = F.log(1 + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5))
    contrib = idf * (F.col("tf") * (BM25_K1 + 1)) / (
        F.col("tf")
        + BM25_K1 * (1 - BM25_B + BM25_B * F.col("dl") / F.col("avgdl"))
    )
    scored = (
        tf.join(F.broadcast(dfs), "term")
        .crossJoin(F.broadcast(st))
        .groupBy("doc_id")
        .agg(
            F.round(F.sum(contrib), 9).alias("bm25"),
            F.count("*").alias("rel"),
        )
    )
    g = scored.agg(
        F.count("*").alias("n_candidates"),
        F.sum(F.when(F.col("rel") >= 3, 1).otherwise(0)).alias("c3"),
        F.sum(F.when(F.col("rel") == 2, 1).otherwise(0)).alias("c2"),
        F.sum(F.when(F.col("rel") == 1, 1).otherwise(0)).alias("c1"),
    )
    top = scored.orderBy(F.desc("bm25"), "doc_id").limit(RANK_K)
    ranked = top.select(
        "rel",
        F.row_number()
        .over(Window.orderBy(F.desc("bm25"), "doc_id"))
        .alias("r"),
    )
    m = ranked.agg(
        (
            F.sum(F.when(F.col("rel") >= REL_MIN, 1.0).otherwise(0.0)) / RANK_K
        ).alias("p_at_k"),
        F.coalesce(
            F.max(F.when(F.col("rel") >= REL_MIN, 1.0 / F.col("r"))),
            F.lit(0.0),
        ).alias("mrr_at_k"),
        F.sum(
            (F.pow(F.lit(2.0), F.col("rel")) - 1) / F.log2(F.col("r") + 1)
        ).alias("dcg"),
    )
    spine = spark.range(1, RANK_K + 1).select(F.col("id").alias("r"))
    ideal_rel = (
        F.when(F.col("r") <= F.col("c3"), 3)
        .when(F.col("r") <= F.col("c3") + F.col("c2"), 2)
        .when(F.col("r") <= F.col("c3") + F.col("c2") + F.col("c1"), 1)
        .otherwise(0)
    )
    ideal = (
        spine.crossJoin(F.broadcast(g))
        .agg(
            F.sum(
                (F.pow(F.lit(2.0), ideal_rel) - 1) / F.log2(F.col("r") + 1)
            ).alias("idcg")
        )
    )
    return (
        m.crossJoin(F.broadcast(ideal))
        .crossJoin(F.broadcast(g))
        .select(
            F.lit(RANK_K).alias("k"),
            F.col("n_candidates").cast("bigint").alias("n_candidates"),
            (F.col("c3") + F.col("c2")).cast("bigint").alias("n_relevant"),
            F.round("p_at_k", 6).alias("p_at_k"),
            F.round("mrr_at_k", 6).alias("mrr_at_k"),
            F.round("dcg", 6).alias("dcg"),
            F.round("idcg", 6).alias("idcg"),
            F.round(F.col("dcg") / F.col("idcg"), 6).alias("ndcg"),
        )
    )


_MAXSIM_N_QUERIES = 3
_MAXSIM_TOKENS = 4
_MAXSIM_DIM = 16  # 64-dim embedding sliced into 4 x 16-dim pseudo-tokens
_MAXSIM_TOPK = 5


@query(
    "retrieval_maxsim_late_interaction",
    oracle=f"""
        WITH tok AS (
            SELECT vec_id, t.tok_no,
                   list_transform(
                       list_slice(embedding,
                                  {_MAXSIM_DIM} * t.tok_no + 1,
                                  {_MAXSIM_DIM} * (t.tok_no + 1)),
                       x -> CAST(x AS DOUBLE)) AS tvec
            FROM embeddings,
                 (SELECT unnest(range(0, {_MAXSIM_TOKENS})) AS tok_no) t
        ),
        qtok AS (SELECT vec_id AS query_id, tok_no AS q_tok, tvec AS qvec
                 FROM tok WHERE vec_id < {_MAXSIM_N_QUERIES}),
        dtok AS (SELECT vec_id AS doc_id, tvec AS dvec
                 FROM tok WHERE vec_id >= {_MAXSIM_N_QUERIES}),
        per_qtok AS (
            SELECT q.query_id, d.doc_id, q.q_tok,
                   MAX(list_sum(list_transform(list_zip(q.qvec, d.dvec),
                                p -> p[1] * p[2]))) AS best_dot
            FROM qtok q JOIN dtok d ON true
            GROUP BY q.query_id, d.doc_id, q.q_tok
        ),
        scored AS (
            SELECT query_id, doc_id, ROUND(SUM(best_dot), 6) AS score
            FROM per_qtok GROUP BY query_id, doc_id
        )
        SELECT query_id, doc_id, score,
               CAST(rnk AS INT) AS rank
        FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                        ORDER BY score DESC, doc_id) AS rnk
              FROM scored)
        WHERE rnk <= {_MAXSIM_TOPK}
        ORDER BY query_id, rank
    """,
    tags=("retrieval", "similarity", "embeddings", "topk"),
)
def retrieval_maxsim_late_interaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ColBERT-style late-interaction scoring: each vector is sliced
    into 4 pseudo-token sub-vectors; score(q, d) = Σ over query tokens
    of the max dot-product against any document token (MaxSim), then
    top-5 docs per query. With a real multi-vector encoder the slices
    would be per-token embeddings — the scoring plan is identical.

    100 TB design: query tokens (queries x 4 rows) broadcast; document
    tokens stream map-side — per-doc work is linear in corpus size and
    the two aggregations (max per query-token, sum per doc) are
    map-side-combinable hash aggs keyed by (query, doc). The final
    per-query top-k is a tiny window over queries x docs scores after
    aggregation; at corpus scale the candidate set would first be cut
    by an ANN stage (sim_ivf_topk) and MaxSim re-ranks only candidates
    — the standard two-stage retrieval shape.
    """
    from pyspark.sql import Window

    from big_data_audio_classification_spark.functions.vector import dot, to_double

    em = load_table(spark, sf_dir, "embeddings")
    tok = em.select(
        "vec_id",
        F.posexplode(
            F.array(
                *[
                    to_double(
                        F.slice("embedding", _MAXSIM_DIM * t + 1, _MAXSIM_DIM)
                    )
                    for t in range(_MAXSIM_TOKENS)
                ]
            )
        ).alias("tok_no", "tvec"),
    )
    qtok = tok.filter(F.col("vec_id") < _MAXSIM_N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("tok_no").alias("q_tok"),
        F.col("tvec").alias("qvec"),
    )
    dtok = tok.filter(F.col("vec_id") >= _MAXSIM_N_QUERIES).select(
        F.col("vec_id").alias("doc_id"), F.col("tvec").alias("dvec")
    )
    per_qtok = (
        dtok.join(F.broadcast(qtok))
        .select(
            "query_id",
            "doc_id",
            "q_tok",
            dot(F.col("qvec"), F.col("dvec")).alias("dp"),
        )
        .groupBy("query_id", "doc_id", "q_tok")
        .agg(F.max("dp").alias("best_dot"))
    )
    scored = per_qtok.groupBy("query_id", "doc_id").agg(
        F.round(F.sum("best_dot"), 6).alias("score")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        scored.select(
            "query_id",
            "doc_id",
            "score",
            F.row_number().over(w).cast("int").alias("rank"),
        )
        .filter(F.col("rank") <= _MAXSIM_TOPK)
        .orderBy("query_id", "rank")
    )
