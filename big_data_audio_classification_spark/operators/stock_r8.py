"""Round-8-built spare carriers: one fresh, never-certified exemplar for
each REQUIRED_FAMILY_TAG whose never-certified stock dropped below 2
after the r08 driver-window rotation (rolling / mapInPandas / lm — the
three tags the advice-hardened must-enter carriers depleted), so the r09
and r10 rotations can both draw a first-time carrier from every family
(the stocking rule SURVEY §12 set in round 6).

Same contract as every other operator module: each query pairs an
idiomatic Spark DataFrame plan with a DuckDB oracle that states the SAME
semantics through an independent formulation, every computed column is
aliased identically on both sides, float outputs are kept bit-stable
(exact integer/cents arithmetic up to one final float expression written
in the same operation order on both engines), and the scale story for
100 TB is in each docstring.
"""

from __future__ import annotations

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from big_data_audio_classification_spark.registry import query
from big_data_audio_classification_spark.sources.catalog import load_table

# ---------------------------------------------------------------------------
# rolling: running-peak drawdown over the per-user cumulative value
# ---------------------------------------------------------------------------


@query(
    "window_rolling_drawdown",
    oracle="""
        WITH x AS (
            SELECT event_id, user_id, ts,
                   CAST(ROUND(value * 100) AS BIGINT) AS c
            FROM events
        ),
        cum AS (
            SELECT event_id, user_id,
                   CAST(SUM(c) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id
                                     ROWS UNBOUNDED PRECEDING) AS BIGINT)
                       AS cum_cents
            FROM x
        ),
        pk AS (
            SELECT c.event_id, c.user_id, c.cum_cents,
                   CAST(MAX(c.cum_cents) OVER (PARTITION BY c.user_id
                                               ORDER BY x.ts, c.event_id
                                               ROWS UNBOUNDED PRECEDING)
                        AS BIGINT) AS peak_cents
            FROM cum c JOIN x USING (event_id, user_id)
        )
        SELECT event_id, user_id, cum_cents, peak_cents,
               peak_cents - cum_cents AS drawdown_cents,
               CASE WHEN peak_cents > 0
                    THEN ROUND(CAST(peak_cents - cum_cents AS DOUBLE)
                               / CAST(peak_cents AS DOUBLE), 6) + 0
               END AS drawdown_frac
        FROM pk
    """,
    tags=("window", "rolling", "events"),
)
def window_rolling_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RUNNING-PEAK DRAWDOWN per user: cumulative value (exact integer
    cents), its running maximum (the high-water mark), and the
    drawdown below that peak — absolute and fractional. The risk /
    burn-down statistic every monitoring pipeline derives from a
    cumulative series, and the canonical two-layer window compose
    (running SUM feeding a running MAX — order must carry the unique
    event_id tiebreak on BOTH layers, the house window discipline).
    Everything through drawdown_cents is exact int64 (DuckDB's HUGEINT
    window sums cast back to BIGINT); drawdown_frac is ONE float
    division of those exact integers, rounded with the oracle-side
    ``+ 0`` normalizing DuckDB's -0.0 (cum can exceed peak only at
    equality, so the ratio is >= 0, but ROUND of a 0-valued double is
    exactly the -0.0 class). One shuffle keyed by user; window state
    is O(1) per row — the plan shape survives any SF."""
    e = load_table(spark, sf_dir, "events")
    c = F.round(F.col("value") * 100).cast("bigint")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    x = e.select("event_id", "user_id", "ts", c.alias("c"))
    cum = x.select(
        "event_id",
        "user_id",
        "ts",
        F.sum("c").over(w).cast("bigint").alias("cum_cents"),
    )
    peak = cum.select(
        "event_id",
        "user_id",
        "cum_cents",
        F.max("cum_cents").over(w).cast("bigint").alias("peak_cents"),
    )
    dd = F.col("peak_cents") - F.col("cum_cents")
    return peak.select(
        "event_id",
        "user_id",
        "cum_cents",
        "peak_cents",
        dd.alias("drawdown_cents"),
        F.when(
            F.col("peak_cents") > 0,
            F.round(
                dd.cast("double") / F.col("peak_cents").cast("double"), 6
            ),
        ).alias("drawdown_frac"),
    )


# ---------------------------------------------------------------------------
# mapInPandas: Adler-32 payload checksum (binary integrity fingerprint)
# ---------------------------------------------------------------------------

ADLER_MOD = 65521  # largest prime below 2^16 (the zlib constant)


@query(
    "mm_payload_adler_checksum",
    oracle=f"""
        WITH ch AS (
            SELECT doc_id,
                   UNNEST(string_split_regex(text, '')) AS c,
                   CAST(generate_subscripts(
                        string_split_regex(text, ''), 1) AS BIGINT) AS i,
                   CAST(length(text) AS BIGINT) AS n
            FROM documents
        ),
        -- ascii(c) < 128 pins the bytes==codepoints contract the Spark
        -- side asserts with payload.isascii() (same guard as
        -- mm_payload_byte_histogram)
        s AS (
            SELECT doc_id, MAX(n) AS n,
                   CAST((1 + SUM(ascii(c))) % {ADLER_MOD} AS BIGINT) AS s1,
                   CAST((MAX(n) + SUM((n - i + 1) * ascii(c)))
                        % {ADLER_MOD} AS BIGINT) AS s2
            FROM ch WHERE c <> '' AND ascii(c) < 128
            GROUP BY doc_id
        )
        -- LEFT JOIN from documents: an EMPTY payload must still emit a
        -- row with adler32(b'') = 1 (s1=1, s2=0), exactly as zlib does
        -- on the Spark side — the WHERE c <> '' filter would otherwise
        -- drop the doc entirely and diverge silently (r08 review;
        -- string_split_regex('','') yields [''])
        SELECT d.doc_id,
               COALESCE(s.n, 0)                      AS n_bytes,
               CAST(COALESCE(s.s2, 0) * 65536
                    + COALESCE(s.s1, 1) AS BIGINT)   AS adler32
        FROM documents d LEFT JOIN s ON d.doc_id = s.doc_id
    """,
    tags=("multimodal", "mapInPandas", "documents"),
)
def mm_payload_adler_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ADLER-32 payload checksum via ``mapInPandas``: each Arrow batch
    of documents is fingerprinted in Python as RAW BYTES with
    ``zlib.adler32`` — the integrity-checksum step every binary-column
    ingest (image/audio/video payload) runs before and after transport
    — while the oracle restates the checksum from its POSITIONAL
    definition (s1 = 1 + Σb mod 65521; s2 = n + Σ(n−i+1)·b mod 65521;
    adler = s2·2¹⁶ + s1), a genuinely independent formulation of the
    same integer. The payload here is ASCII text, so bytes ==
    codepoints — asserted loudly on the Spark side (the
    ``mm_payload_byte_histogram`` contract). Pure integer arithmetic
    end-to-end: nothing to ROUND, no float anywhere. Python boundary
    emits ONE row per document (never per byte); at 100 TB the
    checksum rides the same scan that decodes the payload."""
    import zlib

    def batches(it):
        for pdf in it:
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                assert text.isascii(), (
                    f"doc {doc_id}: non-ASCII text breaks the "
                    "byte==codepoint oracle contract"
                )
                payload = text.encode("utf-8")
                rows.append(
                    (
                        int(doc_id),
                        len(payload),
                        int(zlib.adler32(payload)),
                    )
                )
            if rows:
                yield pd.DataFrame(
                    rows, columns=["doc_id", "n_bytes", "adler32"]
                )

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return d.mapInPandas(batches, "doc_id long, n_bytes long, adler32 long")


# ---------------------------------------------------------------------------
# lm: Dirichlet-prior smoothed query likelihood
# ---------------------------------------------------------------------------

DIR_MU = 2000  # Dirichlet prior mass (the Zhai & Lafferty default range)
DIR_TERMS = ("table", "query", "stream")


def _dirichlet_sql() -> str:
    tf_cols = ", ".join(
        f"CAST(SUM(CASE WHEN tok = '{t}' THEN 1 ELSE 0 END) AS BIGINT) AS tf{i}"
        for i, t in enumerate(DIR_TERMS, 1)
    )
    cf_cols = ", ".join(
        f"CAST(SUM(tf{i}) AS DOUBLE) AS cf{i}" for i in range(1, 4)
    )
    ll = " + ".join(
        f"""LN((tf{i} + {DIR_MU} * cf{i} / clen)
               / (dl + {DIR_MU}))"""
        for i in range(1, 4)
    )
    return f"""
        WITH toks AS (
            SELECT doc_id,
                   UNNEST(list_filter(string_split(text, ' '),
                                      t -> t <> '')) AS tok
            FROM documents
        ),
        per_doc AS (
            SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dl, {tf_cols}
            FROM toks GROUP BY doc_id
        ),
        corpus AS (
            SELECT CAST(SUM(dl) AS DOUBLE) AS clen, {cf_cols} FROM per_doc
        )
        SELECT doc_id, dl, tf1, tf2, tf3,
               ROUND({ll}, 6) AS query_loglik
        FROM per_doc, corpus
    """


@query(
    "text_lm_dirichlet_prior",
    oracle=_dirichlet_sql(),
    tags=("text", "lm", "documents"),
)
def text_lm_dirichlet_prior(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DIRICHLET-PRIOR smoothed query log-likelihood (μ=2000): each
    document scores a fixed 3-term query under (tf + μ·cf/|C|)/(dl+μ)
    — the length-adaptive smoothing of Zhai & Lafferty that shrinks
    SHORT documents toward the collection model harder than long ones
    (fixed-interpolation sibling: ``text_lm_jelinek_mercer``, r08
    window; absolute discounting: ``text_lm_absolute_discount``). All
    counts exact integers; the log-likelihood is one fixed-order
    3-term float expression per row against a 1-row broadcast of
    collection stats — the family's bit-stability discipline. One
    token pass, one aggregate, no sort; at 100 TB the corpus CTE is a
    map-side-combined 1-row frame regardless of document count."""
    from big_data_audio_classification_spark.operators.dedup import tokens_col

    d = load_table(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.explode(tokens_col(F.col("text"))).alias("tok"))
    per_doc = toks.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("dl"),
        *[
            F.sum(F.when(F.col("tok") == t, 1).otherwise(0))
            .cast("bigint")
            .alias(f"tf{i}")
            for i, t in enumerate(DIR_TERMS, 1)
        ],
    )
    corpus = per_doc.agg(
        F.sum("dl").cast("double").alias("clen"),
        *[F.sum(f"tf{i}").cast("double").alias(f"cf{i}") for i in range(1, 4)],
    )
    ll = None
    for i in range(1, 4):
        term = F.log(
            (F.col(f"tf{i}") + DIR_MU * F.col(f"cf{i}") / F.col("clen"))
            / (F.col("dl") + DIR_MU)
        )
        ll = term if ll is None else ll + term
    return per_doc.crossJoin(F.broadcast(corpus)).select(
        "doc_id", "dl", "tf1", "tf2", "tf3",
        F.round(ll, 6).alias("query_loglik"),
    )
