"""Corpus-curation operators for LLM-training-data pipelines: intra-
document repetition signals, benchmark-contamination detection, and a
one-plan end-to-end curation pipeline (quality filter -> exact dedup ->
per-source rollup).

These extend the mandated text-analysis family (SURVEY §2.B) with the
curation moves a 100 TB pre-training pipeline actually performs before
training: drop repetitive documents (Gopher-style repetition signals),
quarantine documents that leak evaluation data (n-gram containment
against a benchmark set), and run the keep/drop decision chain as one
lazy plan instead of N materialized passes.

Scale notes:
* Repetition: per-document array math + one doc_id-keyed explode/agg —
  linear, two co-partitioned shuffles on doc_id.
* Contamination: the benchmark side is tiny by construction (an eval
  set is thousands of docs, the corpus is billions) → shingle-explode
  the corpus linearly and BROADCAST the benchmark shingles; the join is
  a broadcast hash join, never a shuffle of the corpus shingles. At
  100 TB, hash each shingle to a bigint (token_hash) so the broadcast
  and the probe keys are 8 bytes, not strings (done here via md5 for
  engine-portable parity).
* End-to-end: filter -> window-dedup -> agg is one plan; Catalyst
  prunes the text column after the digest is computed, and the only
  shuffles are the digest-keyed dedup exchange and the final rollup.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from big_data_audio_classification_spark.operators.dedup import (
    _SQL_TOKENS,
    tokens_col,
)
from big_data_audio_classification_spark.operators.text import STOPWORDS
from big_data_audio_classification_spark.registry import query
from big_data_audio_classification_spark.sources.catalog import load_table

SHINGLE_W = 3  # tokens per contamination shingle. Real pipelines use
# 8-13-gram shingles on natural text; this synthetic corpus draws tokens
# near-independently, so longer shingles never collide across documents
# (0 pairs at W=8) — trigrams are the width with discriminative signal
# here (207 pairs at sf0.01). The operator shape is width-agnostic.
EVAL_MOD = 97  # doc_id % EVAL_MOD == 0 -> stand-in benchmark/eval set


@query(
    "text_repetition_signals",
    oracle=f"""
        WITH t AS (SELECT doc_id, {_SQL_TOKENS} AS toks FROM documents),
        s AS (SELECT doc_id,
                     len(toks)                AS n_tokens,
                     len(list_distinct(toks)) AS n_distinct,
                     list_transform(range(1, len(toks)),
                                    i -> toks[i] || ' ' || toks[i+1]) AS bigrams
              FROM t WHERE len(toks) >= 2),
        e AS (SELECT doc_id, UNNEST(bigrams) AS bg FROM s),
        c AS (SELECT doc_id, bg, COUNT(*) AS n FROM e GROUP BY 1, 2),
        m AS (SELECT doc_id, MAX(n) AS top_n,
                     CAST(SUM(n) AS BIGINT) AS n_bigrams
              FROM c GROUP BY 1)
        SELECT s.doc_id,
               ROUND(1 - CAST(n_distinct AS DOUBLE) / n_tokens, 6) AS dup_token_ratio,
               ROUND(CAST(top_n AS DOUBLE) / n_bigrams, 6)         AS top_bigram_frac,
               n_bigrams
        FROM s JOIN m ON s.doc_id = m.doc_id
    """,
    tags=("text", "curation", "documents"),
)
def text_repetition_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style intra-document repetition signals: duplicate-token
    fraction (1 - type/token ratio) and the fraction of all bigrams
    taken by the single most frequent bigram. High values on either are
    the classic drop signals for boilerplate/spam in pre-training data.

    Plan shape: bigram construction is pure array math (zip_with of the
    token array against itself shifted by one); the most-frequent-bigram
    count needs a per-(doc, bigram) count -> per-doc max, i.e. one
    explode and two aggregations co-partitioned on doc_id."""
    d = load_table(spark, sf_dir, "documents")
    toks = tokens_col(F.col("text"))
    base = d.select("doc_id", toks.alias("toks")).filter(F.size("toks") >= 2)
    n = F.size("toks")
    stats = base.select(
        "doc_id",
        n.alias("n_tokens"),
        F.size(F.array_distinct("toks")).alias("n_distinct"),
        F.zip_with(
            F.slice("toks", F.lit(1), n - 1),
            F.slice("toks", F.lit(2), n - 1),
            lambda a, b: F.concat(a, F.lit(" "), b),
        ).alias("bigrams"),
    )
    per_bigram = (
        stats.select("doc_id", F.explode("bigrams").alias("bg"))
        .groupBy("doc_id", "bg")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    per_doc = per_bigram.groupBy("doc_id").agg(
        F.max("n").alias("top_n"), F.sum("n").alias("n_bigrams")
    )
    return stats.join(per_doc, "doc_id").select(
        "doc_id",
        F.round(1 - F.col("n_distinct").cast("double") / F.col("n_tokens"), 6).alias(
            "dup_token_ratio"
        ),
        F.round(F.col("top_n").cast("double") / F.col("n_bigrams"), 6).alias(
            "top_bigram_frac"
        ),
        "n_bigrams",
    )


@query(
    "text_contamination_overlap",
    oracle=f"""
        WITH t AS (SELECT doc_id, {_SQL_TOKENS} AS toks FROM documents),
        sh AS (SELECT doc_id,
                      list_distinct(list_transform(
                          range(1, len(toks) - {SHINGLE_W} + 2),
                          i -> array_to_string(toks[i:i+{SHINGLE_W}-1], ' ')
                      )) AS shingles
               FROM t WHERE len(toks) >= {SHINGLE_W}),
        ex AS (SELECT doc_id, UNNEST(shingles) AS sh FROM sh),
        tr AS (SELECT * FROM ex WHERE doc_id % {EVAL_MOD} <> 0),
        ev AS (SELECT * FROM ex WHERE doc_id % {EVAL_MOD} = 0),
        evn AS (SELECT doc_id, COUNT(*) AS n_ev FROM ev GROUP BY 1)
        SELECT tr.doc_id  AS train_doc_id,
               ev.doc_id  AS eval_doc_id,
               COUNT(*)   AS n_shared,
               ROUND(CAST(COUNT(*) AS DOUBLE) / MIN(evn.n_ev), 6) AS containment
        FROM tr
        JOIN ev  ON tr.sh = ev.sh
        JOIN evn ON evn.doc_id = ev.doc_id
        GROUP BY tr.doc_id, ev.doc_id
    """,
    tags=("text", "curation", "contamination", "documents"),
)
def text_contamination_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-contamination detection: for every training document,
    the count and containment fraction of distinct token n-gram shingles
    it shares with any document in the (stand-in) eval set
    (doc_id % {EVAL_MOD} == 0). containment = shared / eval-doc shingles
    — 1.0 means the eval doc is fully embedded in the training doc.

    The corpus side explodes linearly and probes a BROADCAST of the eval
    shingles — no corpus-wide shuffle (the eval set is always tiny
    relative to the corpus). Verified broadcast in tests/test_plans.py."""
    d = load_table(spark, sf_dir, "documents")
    toks = tokens_col(F.col("text"))
    n = F.size("toks")
    shingles = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), n - SHINGLE_W + 1),
            lambda i: F.array_join(F.slice("toks", i, SHINGLE_W), " "),
        )
    )
    ex = (
        d.select("doc_id", toks.alias("toks"))
        .filter(n >= SHINGLE_W)
        .select("doc_id", F.explode(shingles).alias("sh"))
    )
    train = ex.filter(F.col("doc_id") % EVAL_MOD != 0).withColumnRenamed(
        "doc_id", "train_doc_id"
    )
    ev = ex.filter(F.col("doc_id") % EVAL_MOD == 0).withColumnRenamed(
        "doc_id", "eval_doc_id"
    )
    evn = ev.groupBy("eval_doc_id").agg(F.count(F.lit(1)).alias("n_ev"))
    return (
        train.join(F.broadcast(ev), "sh")
        .groupBy("train_doc_id", "eval_doc_id")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .join(F.broadcast(evn), "eval_doc_id")
        .select(
            "train_doc_id",
            "eval_doc_id",
            "n_shared",
            F.round(F.col("n_shared").cast("double") / F.col("n_ev"), 6).alias(
                "containment"
            ),
        )
    )


@query(
    "curation_pipeline_e2e",
    oracle=f"""
        WITH t AS (SELECT doc_id, source, text, {_SQL_TOKENS} AS toks
                   FROM documents),
        m AS (SELECT doc_id, source, text,
                     len(toks) AS n_tokens,
                     len(list_filter(toks, t -> t IN {STOPWORDS!r})) AS n_stop,
                     CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) AS ttr
              FROM t WHERE len(toks) > 0),
        q AS (SELECT doc_id, source,
                     LEAST(CAST(n_tokens AS DOUBLE) / 64, 1.0) * 0.4
                     + LEAST(CAST(n_stop AS DOUBLE) / n_tokens * 5, 1.0) * 0.3
                     + ttr * 0.3 AS quality,
                     sha256(text) AS digest
              FROM m),
        kept AS (SELECT * FROM q WHERE quality >= 0.5
                 QUALIFY ROW_NUMBER() OVER (PARTITION BY digest
                                            ORDER BY doc_id) = 1)
        SELECT source,
               COUNT(*)                 AS n_docs,
               ROUND(AVG(quality), 6)   AS avg_quality
        FROM kept
        GROUP BY source
        ORDER BY source
    """,
    tags=("text", "curation", "pipeline", "documents"),
)
def curation_pipeline_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The curation decision chain as ONE lazy plan: quality-score every
    document (same formula as ``text_quality_score``), keep quality >=
    0.5, exact-dedup survivors by content digest (keep lowest doc_id),
    and roll up kept-doc counts + mean quality per source.

    This is the shape a production pipeline runs nightly: no
    materialization between stages, the text column is pruned as soon as
    the digest exists, and the only shuffles are the digest-keyed dedup
    window and the final small rollup."""
    d = load_table(spark, sf_dir, "documents")
    toks = tokens_col(F.col("text"))
    base = d.select("doc_id", "source", "text", toks.alias("toks")).filter(
        F.size("toks") > 0
    )
    n_tokens = F.size("toks").cast("double")
    n_stop = F.size(F.filter(F.col("toks"), lambda t: t.isin(*STOPWORDS))).cast(
        "double"
    )
    ttr = F.size(F.array_distinct("toks")).cast("double") / n_tokens
    quality = (
        F.least(n_tokens / 64, F.lit(1.0)) * 0.4
        + F.least(n_stop / n_tokens * 5, F.lit(1.0)) * 0.3
        + ttr * 0.3
    )
    scored = base.select(
        "doc_id",
        "source",
        quality.alias("quality"),
        F.sha2("text", 256).alias("digest"),
    ).filter(F.col("quality") >= 0.5)
    w = Window.partitionBy("digest").orderBy("doc_id")
    kept = scored.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    return (
        kept.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg("quality"), 6).alias("avg_quality"),
        )
        .orderBy("source")
    )
