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


QC_THRESHOLD = 0.75  # weak-label cut on the heuristic quality score
QC_FEATURES = 1024


QC_AGREE_FLOOR = 0.95  # measured per-source agreement 0.996-1.0 tri-SF


@query(
    "curation_quality_classifier",
    oracle=f"""
        WITH t AS (
            SELECT doc_id, source,
                   list_filter(string_split(text, ' '), t -> t <> '') AS toks
            FROM documents
        ),
        m AS (
            SELECT source,
                   CASE WHEN
                       LEAST(CAST(len(toks) AS DOUBLE) / 64, 1.0) * 0.4
                       + LEAST(CAST(len(list_filter(toks,
                             t -> t IN ('the','a','of','and','to','in')))
                             AS DOUBLE) / len(toks) * 5, 1.0) * 0.3
                       + CAST(len(list_distinct(toks)) AS DOUBLE)
                         / len(toks) * 0.3
                       >= {QC_THRESHOLD} THEN 1.0 ELSE 0.0 END AS label
            FROM t WHERE len(toks) > 0
        )
        SELECT source,
               CAST(COUNT(*) AS BIGINT)   AS n_docs,
               ROUND(AVG(label), 6)       AS weak_positive_rate,
               TRUE                       AS agreement_floor_ok
        FROM m GROUP BY source
    """,
    tags=("ml", "curation", "quality", "documents"),
)
def curation_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FineWeb-style quality-classifier distillation: weak-label the
    corpus with the cheap heuristic score (text.text_quality_score's
    formula), train a logistic regression on hashed bag-of-words
    features, and score every document with the learned model — the
    standard move that turns a hand-tuned heuristic into a smooth,
    generalizing quality signal.

    QUALITY-GATE contract (r06 rows-only conversion): per-source
    n_docs and weak_positive_rate are ORACLE-EXACT (the heuristic
    label is pure SQL); the learned model's contribution is gated as
    a boolean — per-source agreement with its own training labels
    must clear QC_AGREE_FLOOR = 0.95 (measured 0.996-1.0 at all three
    SFs: a hashed-BoW logistic regression distilling a deterministic
    length/stopword/TTR rule separates almost perfectly). Predicted
    probabilities stay engine-internal (l-bfgs), so they are gated,
    not value-compared.

    Scale notes: HashingTF is stateless (no vocabulary shuffle —
    hashing replaces the CountVectorizer fit entirely); LR training is
    MLlib's distributed l-bfgs over the assembled features; scoring is
    a map-only transform. The only shuffles are the final rollup and
    l-bfgs's internal tree-aggregations."""
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import HashingTF

    from big_data_audio_classification_spark.operators.text import (
        STOPWORDS,
        _count_in,
    )

    d = load_table(spark, sf_dir, "documents")
    toks = tokens_col(F.col("text"))
    base = d.select("doc_id", "source", toks.alias("toks")).filter(
        F.size("toks") > 0
    )
    n_tokens = F.size("toks").cast("double")
    n_stop = _count_in(F.col("toks"), STOPWORDS).cast("double")
    ttr = F.size(F.array_distinct("toks")).cast("double") / n_tokens
    quality = (
        F.least(n_tokens / 64, F.lit(1.0)) * 0.4
        + F.least(n_stop / n_tokens * 5, F.lit(1.0)) * 0.3
        + ttr * 0.3
    )
    labeled = base.select(
        "doc_id",
        "source",
        "toks",
        (quality >= QC_THRESHOLD).cast("double").alias("label"),
    )
    tf = HashingTF(
        inputCol="toks", outputCol="features", numFeatures=QC_FEATURES
    )
    feats = tf.transform(labeled)
    lr = LogisticRegression(
        featuresCol="features", labelCol="label", maxIter=25, regParam=0.01
    )
    model = lr.fit(feats)
    from pyspark.ml.functions import vector_to_array

    scored = model.transform(feats).select(
        "doc_id",
        "source",
        "label",
        vector_to_array("probability")[1].alias("p_good"),
        (F.col("prediction") == F.col("label")).cast("double").alias("agree"),
    )
    return scored.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.round(F.avg("label"), 6).alias("weak_positive_rate"),
        (F.avg("agree") >= QC_AGREE_FLOOR).alias("agreement_floor_ok"),
    )


BIGRAM_K = 0.5  # add-k smoothing constant


@query(
    "text_bigram_logprob",
    oracle=f"""
        WITH toks AS (
            SELECT doc_id, {_SQL_TOKENS} AS l FROM documents
        ),
        uni AS (
            SELECT tok, COUNT(*) AS c1
            FROM (SELECT UNNEST(l) AS tok FROM toks)
            GROUP BY tok
        ),
        vsize AS (SELECT CAST(COUNT(*) AS BIGINT) AS v FROM uni),
        bg AS (
            SELECT doc_id, l[i + 1] AS w1, l[i + 2] AS w2
            FROM toks, UNNEST(range(len(l) - 1)) AS t(i)
            WHERE len(l) >= 2
        ),
        bgc AS (
            SELECT w1, w2, COUNT(*) AS c12 FROM bg GROUP BY w1, w2
        )
        SELECT doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_bigrams,
               ROUND(AVG(LOG2((c12 + {BIGRAM_K})
                              / (c1 + {BIGRAM_K} * v))), 6) AS avg_log2p,
               ROUND(POWER(2.0, -AVG(LOG2((c12 + {BIGRAM_K})
                                          / (c1 + {BIGRAM_K} * v)))), 4)
                   AS perplexity
        FROM bg
        JOIN bgc USING (w1, w2)
        JOIN uni ON uni.tok = bg.w1
        CROSS JOIN vsize
        GROUP BY doc_id
    """,
    tags=("text", "curation", "quality", "lm", "bigram", "documents"),
)
def text_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-1 (bigram) LM quality score with add-k smoothing — one
    step up from ``text_unigram_logprob`` toward the KenLM perplexity
    filter: mean log2 P(w2|w1) = log2((c(w1,w2)+k) / (c(w1)+k*V)) per
    document, plus the implied per-document perplexity.

    Plan shape: bigram extraction is ARRAY-SIDE (arrays_zip of the
    token list with its own tail) — the text column never shuffles and
    no window/lag pass is needed; only (doc_id, w1, w2) triples move.
    Counts are two map-side-combined aggregations keyed on the gram;
    the probe joins are keyed on the same grams (broadcast here — the
    gram tables fit; at 100 TB they become shuffle joins co-partitioned
    with the counting aggregation, and the vocabulary is pruned to
    grams above a count floor, with the floor folded into the smoothing
    denominator). V arrives as a one-row broadcast."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select("doc_id", tokens_col(F.col("text")).alias("l"))
    n = F.size("l")
    bg = (
        toks.filter(n >= 2)
        .select(
            "doc_id",
            F.explode(
                F.arrays_zip(
                    F.slice(F.col("l"), 1, n - 1).alias("w1"),
                    F.slice(F.col("l"), 2, n - 1).alias("w2"),
                )
            ).alias("p"),
        )
        .select("doc_id", F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
    )
    uni = (
        toks.select(F.explode("l").alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("c1"))
    )
    vsize = uni.agg(F.count(F.lit(1)).cast("bigint").alias("v"))
    bgc = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    logp = F.log2(
        (F.col("c12") + BIGRAM_K) / (F.col("c1") + BIGRAM_K * F.col("v"))
    )
    return (
        bg.join(F.broadcast(bgc), ["w1", "w2"])
        .join(F.broadcast(uni.withColumnRenamed("tok", "w1")), "w1")
        .crossJoin(F.broadcast(vsize))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_bigrams"),
            F.round(F.avg(logp), 6).alias("avg_log2p"),
            F.round(F.pow(F.lit(2.0), -F.avg(logp)), 4).alias("perplexity"),
        )
    )
