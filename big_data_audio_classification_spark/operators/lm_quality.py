"""Corpus-derived language-model quality scoring and training-mix
computation — the two curation moves between "filtered corpus" and
"training batches" in an LLM data pipeline.

* ``text_unigram_logprob`` — CCNet-style quality proxy: score every
  document by its mean per-token log2-probability under the corpus's
  own unigram distribution. Documents full of rare/garbage tokens score
  low (very negative); formulaic boilerplate scores high. This is the
  cheap stand-in for the KenLM perplexity filter used by public
  pipelines (CCNet, RefinedWeb) — same plan shape, the LM is just
  order-0.
* ``curation_source_mix_weights`` — temperature-scaled source sampling
  weights (the multilingual/both-corpora mixing rule, alpha = 0.5):
  w_s proportional to tokens_s^alpha, normalized; plus the implied epochs
  multiplier w_s * total_tokens / tokens_s showing how many times each
  source is (re)seen under the mix.

Scale notes:
* Unigram scoring is two aggregations and one join, all keyed on the
  token: explode (linear) -> vocab count (shuffle on token) -> probe
  join token->count (shuffle co-partitioned with the count, or
  broadcast when the vocab fits — here it does, hinted) -> per-doc avg
  (shuffle on doc_id). The corpus TEXT never moves: only (doc_id,
  token) pairs shuffle, and at 100 TB the token key is hashed to a
  bigint first (see dedup.token_hash for the portable md5 form).
* The grand-total token count is a one-row aggregate broadcast into
  the scoring pass (crossJoin(broadcast)), never a window over an
  unpartitioned frame.
* Mix weights aggregate to |sources| rows; the normalizing constants
  are again a one-row broadcast. Everything is algebraic — map-side
  partials throughout.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from big_data_audio_classification_spark.operators.dedup import (
    _SQL_TOKENS,
    tokens_col,
)
from big_data_audio_classification_spark.registry import query
from big_data_audio_classification_spark.sources.catalog import load_table

MIX_ALPHA = 0.5  # temperature exponent: 1.0 = proportional sampling,
# 0.0 = uniform over sources; 0.5 is the standard multilingual pick.


@query(
    "text_unigram_logprob",
    oracle=f"""
        WITH t AS (SELECT doc_id, UNNEST({_SQL_TOKENS}) AS tok
                   FROM documents),
        v AS (SELECT tok, COUNT(*) AS cnt FROM t GROUP BY tok),
        tot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS total FROM v)
        SELECT doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_tokens,
               ROUND(AVG(LOG2(cnt)) - LOG2((SELECT total FROM tot)), 6)
                   AS avg_logprob
        FROM t JOIN v USING (tok)
        GROUP BY doc_id
    """,
    tags=("text", "curation", "quality", "lm", "documents"),
)
def text_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean per-token log2-probability under the corpus unigram LM.
    avg(log2(cnt/total)) is computed as avg(log2(cnt)) - log2(total) so
    the grand total joins once per document, not once per token."""
    d = load_table(spark, sf_dir, "documents")
    toks = (
        d.select("doc_id", tokens_col(F.col("text")).alias("toks"))
        .filter(F.size("toks") > 0)
        .select("doc_id", F.explode("toks").alias("tok"))
    )
    vocab = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("cnt"))
    total = vocab.agg(F.sum("cnt").alias("total"))
    per_doc = (
        toks.join(F.broadcast(vocab), "tok")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.avg(F.log2("cnt")).alias("mean_log2_cnt"),
        )
    )
    return per_doc.crossJoin(F.broadcast(total)).select(
        "doc_id",
        "n_tokens",
        F.round(F.col("mean_log2_cnt") - F.log2("total"), 6).alias("avg_logprob"),
    )


@query(
    "curation_source_mix_weights",
    oracle=f"""
        WITH s AS (
            SELECT source,
                   CAST(SUM(len({_SQL_TOKENS})) AS BIGINT) AS tok_count,
                   COUNT(*)                                AS n_docs
            FROM documents GROUP BY source
        ),
        tot AS (SELECT SUM(POWER(tok_count, {MIX_ALPHA})) AS z,
                       CAST(SUM(tok_count) AS BIGINT)     AS total
                FROM s)
        SELECT source, tok_count, n_docs,
               ROUND(POWER(tok_count, {MIX_ALPHA}) / (SELECT z FROM tot), 6)
                   AS mix_weight,
               ROUND(POWER(tok_count, {MIX_ALPHA}) / (SELECT z FROM tot)
                     * (SELECT total FROM tot) / tok_count, 6)
                   AS epochs_multiplier
        FROM s
    """,
    tags=("text", "curation", "sampling", "documents"),
)
def curation_source_mix_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled (alpha=0.5) per-source sampling weights over
    token counts, plus the implied epochs multiplier per source. One
    scan -> |sources| rows -> one-row normalizer broadcast back."""
    d = load_table(spark, sf_dir, "documents")
    per_source = d.groupBy("source").agg(
        F.sum(F.size(tokens_col(F.col("text")))).alias("tok_count"),
        F.count(F.lit(1)).alias("n_docs"),
    )
    raw = F.pow("tok_count", F.lit(MIX_ALPHA))
    tot = per_source.agg(
        F.sum(raw).alias("z"), F.sum("tok_count").alias("total")
    )
    return per_source.crossJoin(F.broadcast(tot)).select(
        "source",
        "tok_count",
        "n_docs",
        F.round(raw / F.col("z"), 6).alias("mix_weight"),
        F.round(raw / F.col("z") * F.col("total") / F.col("tok_count"), 6).alias(
            "epochs_multiplier"
        ),
    )
