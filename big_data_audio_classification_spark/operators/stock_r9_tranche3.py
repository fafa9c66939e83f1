"""Round-9 pre-stock tranche 3: one fresh, never-certified carrier for
every REQUIRED_FAMILY_TAG still at exactly 2-deep after tranche 2 —
with this tranche, EVERY family tag holds ≥ 3 never-certified
SQL-oracled spares, so the r10 AND r11 rotations can both draw
first-time carriers from every family with zero emergency building
(the stocking discipline SURVEY §12; tranches 1–2 covered the
r10-drain-risk families, this one finishes the long tail: reference,
range-join, udtf, session, decomposition, skew, udaf/pandas, csv,
rolling, causal, audio-math, lm, mapInPandas).

Same contract as every other operator module: idiomatic Spark plan +
DuckDB oracle stating the same semantics (independent formulations
where the surfaces differ), identical aliases, exact integers up to one
final fixed-order float expression, ``+ 0`` guards on signed ROUNDs,
and a 100 TB scale story per docstring.
"""

from __future__ import annotations

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from big_data_audio_classification_spark.registry import query
from big_data_audio_classification_spark.sources.catalog import load_table

# ---------------------------------------------------------------------------
# reference: phrase-duration histogram per speaker
# ---------------------------------------------------------------------------


@query(
    "ref_duration_histogram",
    oracle="""
        WITH seg AS (
            SELECT range AS id,
                   CASE WHEN range % 2 = 0 THEN 'Male' ELSE 'Female' END
                       AS speaker,
                   CAST((range * 7) % 8 + 2 AS DOUBLE) AS dur
            FROM range(40)
        ),
        h AS (
            SELECT speaker, dur, CAST(COUNT(*) AS BIGINT) AS n
            FROM seg GROUP BY speaker, dur
        ),
        t AS (
            SELECT speaker, CAST(SUM(n) AS BIGINT) AS n_speaker FROM h
            GROUP BY speaker
        )
        SELECT h.speaker, h.dur, h.n,
               ROUND(CAST(h.n AS DOUBLE) / t.n_speaker, 6) AS share
        FROM h JOIN t ON t.speaker = h.speaker
    """,
    tags=("reference", "report"),
)
def ref_duration_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R1–R3/R19 composite: the PHRASE-LENGTH PROFILE of the generated
    corpus — per-speaker histogram of phrase durations with each
    speaker's share per bucket (the sanity report a TTS data pipeline
    prints before synthesis: is the duration mix balanced across the
    parity-assigned voices? voice_classifier.py:21-38 builds exactly
    this table before the synthesis loop). Derived from the same
    deterministic ``segments`` stand-in every ref_* carrier shares
    (FIXTURES.md A1). Exact counts; share is one float division.
    Dimension-bounded output (|speakers|×|dur buckets| ≤ 16 rows)."""
    from big_data_audio_classification_spark.operators.reference_pipeline import (
        segments,
    )

    seg = segments(spark)
    h = seg.groupBy("speaker", "dur").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    t = h.groupBy("speaker").agg(F.sum("n").cast("bigint").alias("n_speaker"))
    return h.join(F.broadcast(t), "speaker").select(
        "speaker",
        "dur",
        "n",
        F.round(F.col("n").cast("double") / F.col("n_speaker"), 6).alias(
            "share"
        ),
    )


# ---------------------------------------------------------------------------
# range-join: order-window × calendar-week overlap length
# ---------------------------------------------------------------------------

ORDER_WINDOW_DAYS = 7  # each order is "active" for [d, d+6]


@query(
    "join_range_overlap_days",
    oracle=f"""
        WITH o AS (
            SELECT o_orderkey, CAST(o_orderdate AS DATE) AS d0,
                   CAST(o_orderdate AS DATE)
                       + INTERVAL {ORDER_WINDOW_DAYS - 1} DAY AS d1
            FROM orders
        ),
        weeks AS (
            SELECT DISTINCT CAST(date_trunc('week', x) AS DATE) AS wk
            FROM (SELECT d0 AS x FROM o UNION ALL SELECT CAST(d1 AS DATE) FROM o)
        ),
        ov AS (
            SELECT w.wk,
                   date_diff('day',
                       GREATEST(CAST(o.d0 AS TIMESTAMP), CAST(w.wk AS TIMESTAMP)),
                       LEAST(CAST(o.d1 AS TIMESTAMP),
                             CAST(w.wk + INTERVAL 6 DAY AS TIMESTAMP)))
                       + 1 AS days
            FROM o JOIN weeks w
              ON CAST(w.wk AS TIMESTAMP) <= CAST(o.d1 AS TIMESTAMP)
             AND CAST(w.wk + INTERVAL 6 DAY AS TIMESTAMP)
                 >= CAST(o.d0 AS TIMESTAMP)
        )
        SELECT strftime(wk, '%Y-%m-%d')     AS week_start,
               CAST(COUNT(*) AS BIGINT)     AS n_orders,
               CAST(SUM(days) AS BIGINT)    AS total_overlap_days
        FROM ov GROUP BY wk
    """,
    tags=("join", "range-join", "orders"),
)
def join_range_overlap_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERVAL-OVERLAP-LENGTH range join: each order's 7-day active
    window against the calendar-week grid, reporting how many of its
    days land in each week — the prorating join behind week-bucketed
    capacity/revenue attribution (containment sibling:
    ``join_range_week_containment`` r08; gaps:
    ``join_range_coverage_gaps``). The two sides are INDEPENDENT
    formulations of the same overlap: the oracle joins on the range
    predicate directly, while Spark EXPLODES each order into its ≤ 2
    candidate week starts (``date_trunc`` of both endpoints,
    dedup'd) — the EQUI-join form that survives 100 TB (the candidate
    count is ceil(window/7)+1, a constant; no range predicate ever
    reaches the join). Overlap lengths are exact integer day
    arithmetic; the week grid derives from the data itself (no
    hardcoded calendar)."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.to_date("o_orderdate").alias("d0"),
        F.date_add(F.to_date("o_orderdate"), ORDER_WINDOW_DAYS - 1).alias(
            "d1"
        ),
    )
    # candidate weeks via sequence(week(d0), week(d1), 7 days) — the
    # general ceil(window/7)+1 form (a hardcoded endpoint pair would
    # silently drop middle weeks if ORDER_WINDOW_DAYS grew past 8;
    # r09 close review)
    exploded = o.select(
        "o_orderkey",
        "d0",
        "d1",
        F.explode(
            F.expr(
                "sequence(to_date(date_trunc('week', d0)),"
                " to_date(date_trunc('week', d1)), interval 7 days)"
            )
        ).alias("wk"),
    )
    days = (
        F.datediff(
            F.least(F.col("d1"), F.date_add(F.col("wk"), 6)),
            F.greatest(F.col("d0"), F.col("wk")),
        )
        + 1
    )
    return (
        exploded.select(F.col("wk"), days.alias("days"))
        .groupBy("wk")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            F.sum("days").cast("bigint").alias("total_overlap_days"),
        )
        .select(
            F.date_format("wk", "yyyy-MM-dd").alias("week_start"),
            "n_orders",
            "total_overlap_days",
        )
    )


# ---------------------------------------------------------------------------
# udtf: character trigrams with positions
# ---------------------------------------------------------------------------

TRIGRAM_DOC_MOD = 20  # bounded sample: doc_id % 20 == 0
TRIGRAM_PREFIX = 12  # leading trigrams per document


@query(
    "udtf_char_trigrams",
    oracle=f"""
        SELECT doc_id, CAST(i AS BIGINT) AS pos,
               substr(text, CAST(i AS INT), 3) AS trigram
        FROM documents,
             UNNEST(range(1, LEAST(length(text) - 1, {TRIGRAM_PREFIX} + 1)))
                 AS t(i)
        WHERE doc_id % {TRIGRAM_DOC_MOD} = 0 AND length(text) >= 3
    """,
    tags=("udtf", "text", "documents"),
)
def udtf_char_trigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CHARACTER-TRIGRAM UDTF: a Python table function walks each
    sampled document once and yields its leading 12 character
    trigrams with 1-based positions — the char-shingling kernel
    (language-ID and fuzzy-matching both start here) as per-row
    iteration, where the oracle states the same thing positionally
    (substr over a bounded range). UDTF siblings:
    ``udtf_word_bigrams`` r08, ``udtf_run_length_encode`` r09
    window. Arrow-batched; the text never shuffles; ≤ 12 rows per
    sampled document, sample bounded by the doc_id modulus."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="pos long, trigram string")
    class CharTrigrams:
        def eval(self, text: str):
            if not text or len(text) < 3:
                return
            for i in range(min(len(text) - 2, TRIGRAM_PREFIX)):
                yield i + 1, text[i : i + 3]

    spark.udtf.register("char_trigrams", CharTrigrams)
    load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") % TRIGRAM_DOC_MOD == 0
    ).createOrReplaceTempView("udtf_trigram_docs_in")
    return spark.sql(
        """
        SELECT d.doc_id, g.pos, g.trigram
        FROM udtf_trigram_docs_in d, LATERAL char_trigrams(d.text) g
        """
    )


# ---------------------------------------------------------------------------
# session: first-touch attribution
# ---------------------------------------------------------------------------

FT_GAP_S = 21_600  # 6 h inactivity closes a session (house convention)


@query(
    "events_session_first_touch",
    oracle=f"""
        WITH x AS (
            SELECT user_id, event_id, ts, event_type,
                   CAST(ROUND(value * 100) AS BIGINT) AS cents,
                   CASE WHEN epoch_us(ts)
                             - LAG(epoch_us(ts)) OVER (
                                   PARTITION BY user_id
                                   ORDER BY ts, event_id)
                             > {FT_GAP_S * 1_000_000}
                         OR LAG(ts) OVER (PARTITION BY user_id
                                          ORDER BY ts, event_id) IS NULL
                        THEN 1 ELSE 0 END AS new_s
            FROM events
        ),
        s AS (
            SELECT *, CAST(SUM(new_s) OVER (PARTITION BY user_id
                                            ORDER BY ts, event_id)
                           AS BIGINT) AS sid
            FROM x
        ),
        firsts AS (
            SELECT user_id, sid, event_type AS first_type
            FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, sid
                                ORDER BY ts, event_id) AS rn FROM s)
            WHERE rn = 1
        ),
        sums AS (
            SELECT user_id, sid,
                   CAST(SUM(CASE WHEN event_type = 'purchase'
                                 THEN cents ELSE 0 END) AS BIGINT)
                       AS purchase_cents
            FROM s GROUP BY user_id, sid
        ),
        per_session AS (
            SELECT f.user_id, f.sid, f.first_type, m.purchase_cents
            FROM firsts f JOIN sums m USING (user_id, sid)
        )
        SELECT first_type,
               CAST(COUNT(*) AS BIGINT)          AS n_sessions,
               CAST(SUM(purchase_cents) AS BIGINT) AS attributed_cents,
               CAST(SUM(CASE WHEN purchase_cents > 0 THEN 1 ELSE 0 END)
                    AS BIGINT)                   AS n_converting
        FROM per_session GROUP BY first_type
    """,
    tags=("events", "session", "window"),
)
def events_session_first_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FIRST-TOUCH ATTRIBUTION: sessionize by the 6 h inactivity gap
    (the house gap-islands idiom — LAG mark, running-sum session id,
    both windows carrying the (ts, event_id) unique tiebreak), then
    credit each session's purchase value to the event type that OPENED
    the session — the simplest of the marketing attribution models
    (the funnel and transition-matrix siblings slice the same
    sessions differently). The session opener is a ranked-first
    selection over (ts, event_id) on the oracle side vs a ``min_by``
    struct aggregate on the Spark side — independent spellings of one
    deterministic selection. Exact integer cents end-to-end. One shuffle keyed by
    user, one by session, one |event-types|-row rollup."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros("ts")
    x = e.select(
        "user_id",
        "event_id",
        "ts",
        "event_type",
        F.round(F.col("value") * 100).cast("bigint").alias("cents"),
        F.when(
            F.lag("ts").over(w).isNull()
            | ((us - F.lag(us).over(w)) > FT_GAP_S * 1_000_000),
            1,
        )
        .otherwise(0)
        .alias("new_s"),
    )
    wc = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    s = x.select("*", F.sum("new_s").over(wc).cast("bigint").alias("sid"))
    per_session = s.groupBy("user_id", "sid").agg(
        F.min_by(
            "event_type", F.struct("ts", "event_id")
        ).alias("first_type"),
        F.sum(
            F.when(F.col("event_type") == "purchase", F.col("cents")).otherwise(
                0
            )
        )
        .cast("bigint")
        .alias("purchase_cents"),
    )
    return per_session.groupBy("first_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_sessions"),
        F.sum("purchase_cents").cast("bigint").alias("attributed_cents"),
        F.sum(F.when(F.col("purchase_cents") > 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n_converting"),
    )


# ---------------------------------------------------------------------------
# decomposition: hour-of-day additive effect profile
# ---------------------------------------------------------------------------


@query(
    "analytics_hod_effect_profile",
    oracle="""
        WITH x AS (
            SELECT hour(ts) AS hr,
                   CAST(ROUND(value * 100) AS BIGINT) AS c
            FROM events
        ),
        per_h AS (
            SELECT hr, CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(c) AS BIGINT)       AS s,
                   CAST(SUM(c * c) AS BIGINT)   AS s2
            FROM x GROUP BY hr
        ),
        tot AS (
            SELECT CAST(SUM(n) AS BIGINT) AS nt, CAST(SUM(s) AS BIGINT) AS st,
                   CAST(SUM(s2) AS BIGINT) AS s2t,
                   list_sum(list(CAST(s AS DOUBLE) * s / n ORDER BY hr))
                       AS ss_group
            FROM per_h
        )
        SELECT hr, n,
               ROUND(CAST(s AS DOUBLE) / n / 100, 6)        AS hour_mean,
               ROUND(CAST(s AS DOUBLE) / n / 100
                     - CAST(st AS DOUBLE) / nt / 100, 6) + 0 AS effect,
               ROUND((ss_group - CAST(st AS DOUBLE) * st / nt)
                     / (CAST(s2t AS DOUBLE)
                        - CAST(st AS DOUBLE) * st / nt), 6) + 0 AS eta_sq
        FROM per_h, tot
    """,
    tags=("analytics", "decomposition", "events"),
)
def analytics_hod_effect_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HOUR-OF-DAY ADDITIVE DECOMPOSITION: value = grand mean +
    hour effect, with the variance share the hour factor explains
    (η² = SS_between / SS_total) stamped on every row — the seasonal
    profile a monitoring pipeline derives before anomaly thresholds
    (day-of-week sibling: ``analytics_dow_additive_profile``). All
    moments are exact integer cents (Σc² ≈ 1e14 at sf0.1 — inside
    int64 with 10⁴× headroom); the η² numerator Σ s_h²/n_h is 24
    per-hour float terms reduced via the SEQUENTIAL hr-ordered fold
    (the house deterministic-summation idiom), and every output is
    one fixed-order float expression — `effect` is signed, so it
    carries the ``+ 0`` oracle guard (the r06 -0.0-under-ROUND
    class). One shuffle to 24 groups, one 1-row broadcast."""
    e = load_table(spark, sf_dir, "events")
    x = e.select(
        F.hour("ts").alias("hr"),
        F.round(F.col("value") * 100).cast("bigint").alias("c"),
    )
    per_h = x.groupBy("hr").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("c").cast("bigint").alias("s"),
        F.sum(F.expr("c * c")).cast("bigint").alias("s2"),
    )
    ordered = F.transform(
        F.array_sort(F.collect_list(F.struct("hr", "term"))),
        lambda t: t["term"],
    )
    tot = (
        per_h.select(
            "n",
            "s",
            "s2",
            "hr",
            (F.col("s").cast("double") * F.col("s") / F.col("n")).alias(
                "term"
            ),
        )
        .agg(
            F.sum("n").cast("bigint").alias("nt"),
            F.sum("s").cast("bigint").alias("st"),
            F.sum("s2").cast("bigint").alias("s2t"),
            F.aggregate(ordered, F.lit(0.0), lambda a, v: a + v).alias(
                "ss_group"
            ),
        )
    )
    mean_h = F.col("s").cast("double") / F.col("n") / 100
    mean_t = F.col("st").cast("double") / F.col("nt") / 100
    ss_tot = F.col("s2t").cast("double") - F.col("st").cast("double") * F.col(
        "st"
    ) / F.col("nt")
    ss_btw = F.col("ss_group") - F.col("st").cast("double") * F.col(
        "st"
    ) / F.col("nt")
    return per_h.crossJoin(F.broadcast(tot)).select(
        "hr",
        "n",
        F.round(mean_h, 6).alias("hour_mean"),
        F.round(mean_h - mean_t, 6).alias("effect"),
        F.round(ss_btw / ss_tot, 6).alias("eta_sq"),
    )


# ---------------------------------------------------------------------------
# skew: salt effectiveness on the hottest key
# ---------------------------------------------------------------------------

SALT_N = 8


@query(
    "skew_salt_effectiveness",
    oracle=f"""
        WITH counts AS (
            SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n
            FROM events GROUP BY user_id
        ),
        hot AS (
            SELECT user_id FROM counts
            ORDER BY n DESC, user_id ASC LIMIT 1
        ),
        salted AS (
            SELECT CAST(('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 8))
                        AS BIGINT) % {SALT_N} AS salt,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM events WHERE user_id = (SELECT user_id FROM hot)
            GROUP BY salt
        ),
        spine AS (SELECT UNNEST(range({SALT_N})) AS salt),
        j AS (
            SELECT spine.salt, COALESCE(salted.n, 0) AS n
            FROM spine LEFT JOIN salted ON salted.salt = spine.salt
        ),
        m AS (SELECT CAST(MAX(n) AS BIGINT) AS mx, CAST(MIN(n) AS BIGINT) AS mn,
                     CAST(SUM(n) AS BIGINT) AS tot FROM j)
        SELECT CAST(j.salt AS BIGINT) AS salt, j.n,
               m.mx AS max_shard, m.mn AS min_shard,
               ROUND(CAST(m.mx AS DOUBLE) * {SALT_N} / m.tot, 6)
                   AS max_over_ideal
        FROM j, m
    """,
    tags=("skew", "scale", "events"),
)
def skew_salt_effectiveness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SALT EFFECTIVENESS report: take the HOTTEST key (max event
    count, id tiebreak), shard it with the portable md5 salt
    (mod SALT_N=8), and measure the result — per-shard counts on a
    full salt spine (an empty shard must surface as 0, not vanish),
    the max/min shard, and max-over-ideal (1.0 = perfectly even; the
    number that says whether the salt actually flattened the hot
    key). Complements ``skew_salt_factor_plan`` (chooses the factor)
    and the salted join/agg exemplars (use it) with the post-hoc
    effectiveness measurement. The hot-key selection is a
    deterministic ORDER BY + LIMIT 1 on a keyed count — at 100 TB
    this is the heavy-hitter output of the frequency profile, never a
    sort of the raw table. Pure integers plus one final ratio."""
    e = load_table(spark, sf_dir, "events")
    counts = e.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    hot = counts.orderBy(F.col("n").desc(), F.col("user_id").asc()).limit(1)
    from big_data_audio_classification_spark.operators.dedup import token_hash

    salt = token_hash(F.col("event_id").cast("string")) % SALT_N
    salted = (
        e.join(F.broadcast(hot.select("user_id")), "user_id")
        .select(salt.alias("salt"))
        .groupBy("salt")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    spine = spark.range(SALT_N).select(F.col("id").cast("bigint").alias("salt"))
    j = spine.join(salted, "salt", "left").select(
        "salt", F.coalesce("n", F.lit(0)).cast("bigint").alias("n")
    )
    m = j.agg(
        F.max("n").cast("bigint").alias("max_shard"),
        F.min("n").cast("bigint").alias("min_shard"),
        F.sum("n").cast("bigint").alias("tot"),
    )
    return j.crossJoin(F.broadcast(m)).select(
        "salt",
        "n",
        "max_shard",
        "min_shard",
        F.round(
            F.col("max_shard").cast("double") * SALT_N / F.col("tot"), 6
        ).alias("max_over_ideal"),
    )


# ---------------------------------------------------------------------------
# udaf: Bowley (quartile) skewness as a grouped-agg pandas UDF
# ---------------------------------------------------------------------------


@query(
    "agg_pandas_udaf_quartile_skew",
    oracle="""
        SELECT o_orderstatus AS status,
               CAST(COUNT(*) AS BIGINT) AS n,
               CASE WHEN quantile_cont(o_totalprice, 0.75)
                         > quantile_cont(o_totalprice, 0.25)
                    THEN ROUND((quantile_cont(o_totalprice, 0.25)
                                + quantile_cont(o_totalprice, 0.75)
                                - 2 * quantile_cont(o_totalprice, 0.5))
                               / (quantile_cont(o_totalprice, 0.75)
                                  - quantile_cont(o_totalprice, 0.25)), 6)
                         + 0
               END AS bowley_skew
        FROM orders
        GROUP BY o_orderstatus
    """,
    tags=("aggregate", "udaf", "pandas", "robust", "orders"),
)
def agg_pandas_udaf_quartile_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BOWLEY (quartile) SKEWNESS per order status as a grouped-agg
    pandas UDF — (Q1 + Q3 − 2·Q2)/(Q3 − Q1), the robust shape
    statistic that ignores tails entirely (location sibling:
    ``agg_pandas_udaf_midhinge``; spread: IQR; the moment-based
    skewness lives in ``window_rolling_skew_kurt`` with DECIMAL
    headroom). numpy's linear-interpolated percentile matches
    DuckDB's ``quantile_cont`` rule exactly, and the final expression
    is written in ONE shared operation order on both sides; it is
    SIGNED (a symmetric group rounds to zero), so the oracle carries
    the ``+ 0`` -0.0 guard. Row count rides through Arrow (pandas and
    JVM aggregates cannot mix in one agg). At 100 TB swap the
    per-group buffer for ``agg_percentiles_twophase``."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def bowley(v: pd.Series) -> float:
        arr = v.to_numpy(dtype=np.float64)
        q1, q2, q3 = np.percentile(arr, [25, 50, 75], method="linear")
        if q3 <= q1:  # degenerate spread: NULL, matching the oracle's
            return None  # CASE (numpy would emit NaN/inf, DuckDB NULL)
        return float((q1 + q3 - 2 * q2) / (q3 - q1))

    @pandas_udf("long")
    def n_rows(v: pd.Series) -> int:
        return len(v)

    o = load_table(spark, sf_dir, "orders")
    return o.groupBy(F.col("o_orderstatus").alias("status")).agg(
        n_rows("o_totalprice").alias("n"),
        F.round(bowley("o_totalprice"), 6).alias("bowley_skew"),
    )


# ---------------------------------------------------------------------------
# csv: embedded-newline (multiLine) quoted-field roundtrip
# ---------------------------------------------------------------------------


@query(
    "sink_csv_multiline_quoted_roundtrip",
    oracle="""
        WITH x AS (
            SELECT doc_id,
                   source || chr(10) || substr(text, 1, 40) AS tricky
            FROM documents
        )
        SELECT CAST(COUNT(*) AS BIGINT)            AS n,
               CAST(SUM(length(tricky)) AS BIGINT) AS total_len,
               CAST(SUM(CASE WHEN contains(tricky, chr(10))
                             THEN 1 ELSE 0 END) AS BIGINT)
                                                   AS n_with_newline,
               CAST(MIN(doc_id) AS BIGINT)         AS min_doc_id
        FROM x
    """,
    tags=("sink", "csv", "documents"),
)
def sink_csv_multiline_quoted_roundtrip(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """EMBEDDED-NEWLINE CSV roundtrip: fields carrying a literal
    newline (built deterministically: source + LF + a text prefix)
    written RFC4180-quoted and read back with ``multiLine=true`` —
    the dialect wrinkle that silently SPLITS records when the reader
    treats every physical line as a row (the default fast path;
    multiLine forces whole-file parsing, trading split-ability for
    correctness — exactly the trade a 100 TB ingest must make
    knowingly, so this carrier pins the semantics). The contract
    aggregates the reconstructed values (count, total length
    INCLUDING the newline, newline-carrying rows, key min) against
    parquet truth computed by the oracle directly — a record split
    anywhere moves every aggregate. Completes the dialect battery
    (quote-all / TSV / escape / gzip / partitioned siblings)."""
    import os as _os

    from big_data_audio_classification_spark.scratch import SCRATCH_DIR

    path = _os.path.join(SCRATCH_DIR, "sink_csv_multiline_roundtrip")
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.col("source"), F.lit("\n"), F.substring("text", 1, 40)
        ).alias("tricky"),
    )
    # The writer TRIMS field whitespace by default
    # (ignoreLeading/TrailingWhiteSpace=true on WRITE — unlike read) —
    # a 40-char text prefix ending in a space silently shrinks and the
    # oracle's total_len catches it (measured: 75 chars over 500 docs,
    # r09). Dialect pinned trim-free on both sides.
    d.write.mode("overwrite").options(
        header=True,
        quoteAll=True,
        ignoreLeadingWhiteSpace=False,
        ignoreTrailingWhiteSpace=False,
    ).csv(path)
    back = spark.read.options(
        header=True, multiLine=True, inferSchema=False
    ).csv(path)
    return back.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.length("tricky")).cast("bigint").alias("total_len"),
        F.sum(F.when(F.col("tricky").contains("\n"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_with_newline"),
        F.min(F.col("doc_id").cast("bigint")).alias("min_doc_id"),
    )


# ---------------------------------------------------------------------------
# rolling: 7-row min/max channel position
# ---------------------------------------------------------------------------

MMPOS_WINDOW = 7


@query(
    "window_rolling_minmax_position",
    oracle=f"""
        WITH x AS (
            SELECT event_id, user_id, ts,
                   CAST(ROUND(value * 100) AS BIGINT) AS c
            FROM events
        ),
        w AS (
            SELECT event_id, user_id, c,
                   CAST(MIN(c) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id
                                     ROWS {MMPOS_WINDOW - 1} PRECEDING)
                        AS BIGINT) AS roll_min,
                   CAST(MAX(c) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id
                                     ROWS {MMPOS_WINDOW - 1} PRECEDING)
                        AS BIGINT) AS roll_max
            FROM x
        )
        SELECT event_id, user_id, c AS cents, roll_min, roll_max,
               CASE WHEN roll_max > roll_min
                    THEN ROUND(CAST(c - roll_min AS DOUBLE)
                               / (roll_max - roll_min), 6)
               END AS channel_pos
        FROM w
    """,
    tags=("window", "rolling", "events"),
)
def window_rolling_minmax_position(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """ROLLING MIN/MAX CHANNEL POSITION per user: the 7-row trailing
    envelope and where the current value sits inside it ((x−min)/
    (max−min), the %R / stochastic-oscillator statistic every
    monitoring dashboard derives from a bounded window; NULL while
    the envelope is degenerate). Exact integer cents through both
    envelope extremes — MIN/MAX windows are order-insensitive, so no
    fold discipline is needed — and ONE float division at the end
    (non-negative by construction: no -0.0 surface). O(1) window
    state, single shuffle keyed by user, the (ts, event_id) tiebreak
    on both engines."""
    e = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-(MMPOS_WINDOW - 1), Window.currentRow)
    )
    c = F.round(F.col("value") * 100).cast("bigint")
    x = e.select("event_id", "user_id", "ts", c.alias("c"))
    roll = x.select(
        "event_id",
        "user_id",
        F.col("c").alias("cents"),
        F.min("c").over(w).cast("bigint").alias("roll_min"),
        F.max("c").over(w).cast("bigint").alias("roll_max"),
    )
    spread = F.col("roll_max") - F.col("roll_min")
    return roll.select(
        "event_id",
        "user_id",
        "cents",
        "roll_min",
        "roll_max",
        F.when(
            spread > 0,
            F.round(
                (F.col("cents") - F.col("roll_min")).cast("double") / spread,
                6,
            ),
        ).alias("channel_pos"),
    )


# ---------------------------------------------------------------------------
# causal: Cochran-Armitage trend test over an ordered exposure
# ---------------------------------------------------------------------------


@query(
    "stats_cochran_armitage_trend",
    oracle="""
        WITH x AS (
            SELECT CAST(hour(ts) // 6 AS BIGINT) AS k,
                   CASE WHEN event_type = 'error' THEN 1 ELSE 0 END AS y
            FROM events
        ),
        per_k AS (
            SELECT k, CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(y) AS BIGINT) AS r
            FROM x GROUP BY k
        ),
        m AS (
            SELECT CAST(SUM(n) AS BIGINT) AS nt, CAST(SUM(r) AS BIGINT) AS rt,
                   CAST(SUM(r * k) AS BIGINT)     AS sxr,
                   CAST(SUM(n * k) AS BIGINT)     AS sxn,
                   CAST(SUM(n * k * k) AS BIGINT) AS sxxn
            FROM per_k
        )
        SELECT nt AS n_total, rt AS n_events,
               CAST((SELECT COUNT(*) FROM per_k) AS BIGINT) AS n_buckets,
               ROUND((sxr - CAST(rt AS DOUBLE) * sxn / nt)
                     / SQRT((CAST(rt AS DOUBLE) / nt)
                            * (1.0 - CAST(rt AS DOUBLE) / nt)
                            * (sxxn - CAST(sxn AS DOUBLE) * sxn / nt)), 4)
                   + 0 AS z_trend
        FROM m
    """,
    tags=("stats", "causal", "inference", "events"),
)
def stats_cochran_armitage_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COCHRAN-ARMITAGE trend test: is the error rate MONOTONE in an
    ordered exposure (the 4 six-hour day segments)? T = Σ x_k(r_k −
    n_k·p̄) against Var = p̄(1−p̄)(Σn_k x_k² − (Σn_k x_k)²/N) — the
    dose-response screen that a plain chi-square cannot see (it
    ignores bucket ORDER), and the standard first causal probe on an
    ordered treatment intensity (siblings: ``stats_iv_wald_estimator``,
    ``stats_placebo_did``). Every moment is an exact integer (scores
    are tiny ints, counts are counts); z is ONE fixed-order float
    expression, SIGNED → oracle ``+ 0`` guard. One 4-group aggregate,
    one 1-row reduce; constant output at any SF."""
    e = load_table(spark, sf_dir, "events")
    x = e.select(
        (F.floor(F.hour("ts") / 6)).cast("bigint").alias("k"),
        F.when(F.col("event_type") == "error", 1).otherwise(0).alias("y"),
    )
    per_k = x.groupBy("k").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("y").cast("bigint").alias("r"),
    )
    m = per_k.agg(
        F.sum("n").cast("bigint").alias("nt"),
        F.sum("r").cast("bigint").alias("rt"),
        F.sum(F.expr("r * k")).cast("bigint").alias("sxr"),
        F.sum(F.expr("n * k")).cast("bigint").alias("sxn"),
        F.sum(F.expr("n * k * k")).cast("bigint").alias("sxxn"),
        F.count(F.lit(1)).cast("bigint").alias("n_buckets"),
    )
    p = F.col("rt").cast("double") / F.col("nt")
    num = F.col("sxr") - F.col("rt").cast("double") * F.col("sxn") / F.col("nt")
    var = (
        p
        * (1.0 - p)
        * (
            F.col("sxxn")
            - F.col("sxn").cast("double") * F.col("sxn") / F.col("nt")
        )
    )
    return m.select(
        F.col("nt").alias("n_total"),
        F.col("rt").alias("n_events"),
        "n_buckets",
        F.round(num / F.sqrt(var), 4).alias("z_trend"),
    )


# ---------------------------------------------------------------------------
# audio-math: frame-level lag-1 autocorrelation
# ---------------------------------------------------------------------------

AC_FRAME = 64


@query(
    "audio_autocorr_lag1",
    oracle=f"""
        WITH x AS (
            SELECT user_id, CAST(ROUND(value * 100) AS BIGINT) AS c,
                   ROW_NUMBER() OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS rn
            FROM events
        ),
        lagged AS (
            SELECT user_id, c, rn,
                   CAST((rn - 1) // {AC_FRAME} AS BIGINT) AS frame,
                   LAG(c) OVER (PARTITION BY user_id,
                                             CAST((rn - 1) // {AC_FRAME}
                                                  AS BIGINT)
                                ORDER BY rn) AS prev
            FROM x
        ),
        frames AS (
            SELECT user_id, frame,
                   CAST(SUM(CASE WHEN prev IS NOT NULL
                                 THEN prev * c ELSE 0 END) AS BIGINT) AS num,
                   CAST(SUM(c * c) AS BIGINT) AS den,
                   CAST(COUNT(*) AS BIGINT)   AS flen
            FROM lagged GROUP BY user_id, frame
        ),
        ch AS (
            SELECT user_id,
                   CAST(COUNT(*) AS BIGINT) AS n_frames,
                   list_sum(list(CAST(num AS DOUBLE) / den ORDER BY frame))
                       AS r1_sum,
                   MAX(CAST(num AS DOUBLE) / den) AS max_r1,
                   MIN(CAST(num AS DOUBLE) / den) AS min_r1
            FROM frames WHERE den > 0 GROUP BY user_id
        )
        SELECT user_id, n_frames,
               ROUND(r1_sum / n_frames, 6) AS mean_r1,
               ROUND(max_r1, 6)            AS max_r1,
               ROUND(min_r1, 6)            AS min_r1
        FROM ch
    """,
    tags=("audio", "audio-math", "events"),
)
def audio_autocorr_lag1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FRAME-LEVEL LAG-1 AUTOCORRELATION (normalized, r₁ = Σxᵢxᵢ₊₁ /
    Σxᵢ² per 64-sample frame) — the periodicity/smoothness proxy that
    separates tonal from noisy frames (crest measures impulsiveness,
    flatness measures spectral tilt; r₁ completes the time-domain
    trio), rolled up per channel exactly like ``audio_crest_factor``
    (same row_number÷N framing idiom, same per-channel reduce). The
    numerator and denominator are EXACT integer sums (cents products
    ≈ 6e9 per frame — int64 with 10⁹ headroom); each frame's r₁ is
    one division, and the cross-frame mean reduces via the house
    frame-ordered fold. Signals are non-negative cents so r₁ ≥ 0 —
    no -0.0 surface. One shuffle keyed by (user, frame), one by
    user."""
    e = load_table(spark, sf_dir, "events")
    wrn = Window.partitionBy("user_id").orderBy("ts", "event_id")
    x = e.select(
        "user_id",
        F.round(F.col("value") * 100).cast("bigint").alias("c"),
        F.row_number().over(wrn).alias("rn"),
    )
    frame = F.expr(f"CAST((rn - 1) DIV {AC_FRAME} AS BIGINT)")
    wlag = Window.partitionBy("user_id", "frame").orderBy("rn")
    lagged = x.select(
        "user_id", "c", "rn", frame.alias("frame")
    ).select("*", F.lag("c").over(wlag).alias("prev"))
    frames = lagged.groupBy("user_id", "frame").agg(
        F.sum(
            F.when(F.col("prev").isNotNull(), F.col("prev") * F.col("c"))
            .otherwise(0)
        )
        .cast("bigint")
        .alias("num"),
        F.sum(F.expr("c * c")).cast("bigint").alias("den"),
        F.count(F.lit(1)).cast("bigint").alias("flen"),
    )
    r1 = F.col("num").cast("double") / F.col("den")
    ordered = F.transform(
        F.array_sort(F.collect_list(F.struct("frame", "r1"))),
        lambda s: s["r1"],
    )
    ch = (
        frames.filter(F.col("den") > 0)
        .select("user_id", "frame", r1.alias("r1"))
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_frames"),
            F.aggregate(ordered, F.lit(0.0), lambda a, v: a + v).alias(
                "r1_sum"
            ),
            F.max("r1").alias("max_r1"),
            F.min("r1").alias("min_r1"),
        )
    )
    return ch.select(
        "user_id",
        "n_frames",
        F.round(F.col("r1_sum") / F.col("n_frames"), 6).alias("mean_r1"),
        F.round("max_r1", 6).alias("max_r1"),
        F.round("min_r1", 6).alias("min_r1"),
    )


# ---------------------------------------------------------------------------
# lm: held-out perplexity under the train-fold unigram LM
# ---------------------------------------------------------------------------

HELDOUT_FOLDS = 5  # md5(doc_id) % 5 == 0 -> held-out (20%)


@query(
    "text_lm_heldout_perplexity",
    oracle=f"""
        WITH d AS (
            SELECT doc_id, source,
                   list_filter(string_split(text, ' '), t -> t <> '') AS l,
                   CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                        AS BIGINT) % {HELDOUT_FOLDS} = 0 AS held_out
            FROM documents
        ),
        train_tok AS (
            SELECT UNNEST(l) AS tok FROM d WHERE NOT held_out
        ),
        vocab AS (
            SELECT tok, CAST(COUNT(*) AS BIGINT) AS cnt FROM train_tok
            GROUP BY tok
        ),
        consts AS (
            SELECT CAST(SUM(cnt) AS BIGINT) AS n_train,
                   CAST(COUNT(*) AS BIGINT) AS v_train
            FROM vocab
        ),
        held_tok AS (
            SELECT doc_id, source, UNNEST(l) AS tok,
                   CAST(generate_subscripts(l, 1) AS BIGINT) AS pos
            FROM d WHERE held_out AND len(l) > 0
        ),
        -- per-doc mean via the SEQUENTIAL pos-ordered fold: rounding
        -- an engine-side cross-row AVG of logs is the r06 red-row
        -- class (plan/thread order flips the last ULP under ROUND)
        per_doc AS (
            SELECT doc_id, source,
                   CAST(COUNT(*) AS BIGINT) AS dl,
                   ROUND(list_sum(list(LOG2(COALESCE(v.cnt, 0) + 1)
                                       ORDER BY pos)) / COUNT(*)
                         - LOG2((SELECT n_train + v_train + 1 FROM consts)),
                         6) AS avg_log2p
            FROM held_tok h LEFT JOIN vocab v ON v.tok = h.tok
            GROUP BY doc_id, source
        ),
        per_source AS (
            SELECT source,
                   CAST(COUNT(*) AS BIGINT) AS n_docs,
                   list_sum(list(avg_log2p ORDER BY doc_id)) AS s
            FROM per_doc GROUP BY source
        )
        SELECT source, n_docs,
               ROUND(s / n_docs, 6) + 0                AS mean_doc_log2p,
               ROUND(POWER(2.0, -(s / n_docs)), 4)     AS perplexity
        FROM per_source
    """,
    tags=("text", "lm", "documents"),
)
def text_lm_heldout_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HELD-OUT PERPLEXITY — the LM-family EVALUATION harness: split
    documents by the portable md5 key (20% held out), fit an add-one
    unigram LM on the TRAIN folds only, and score the held-out docs a
    trained model has never seen — the measurement that turns the
    smoothing family (JM/AD/Dirichlet/WB/GT/KN carriers) from
    formulas into a comparable number, and the quality gate every
    corpus-curation loop runs per source. Unseen tokens get the
    add-one floor (COALESCE to 0 via LEFT JOIN — the join MUST be
    outer or unseen-token docs silently lose tokens). Per-doc mean
    log-prob splits as Σlog2(c+1)/dl − log2(N+V+1) so the constant
    joins once per doc, with the Σ reduced via the POS-ordered fold
    and the per-SOURCE mean via the doc_id-ordered fold (both are
    cross-row float sums — the r06 ROUND-flip hazard); signed →
    ``+ 0``. Two counting aggregations + one broadcast probe join
    (the vocab pass persisted — it feeds both the probe and the
    denominator); at 100 TB the probe co-partitions with the count."""
    from big_data_audio_classification_spark.operators.dedup import (
        token_hash,
        tokens_col,
    )

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        tokens_col(F.col("text")).alias("l"),
        (
            token_hash(F.col("doc_id").cast("string")) % HELDOUT_FOLDS == 0
        ).alias("held_out"),
    )
    train_tok = d.filter(~F.col("held_out")).select(
        F.explode("l").alias("tok")
    )
    # localCheckpoint: the broadcast probe join AND the denom aggregate
    # both read this heaviest pass (full tokenize + token-count
    # shuffle) — the ml_pca_variance_contract double-execution
    # precedent. eager=True instead of a bare persist() so the blocks
    # are released by the context cleaner on GC rather than pinned in
    # executor storage for the rest of a 600-query sweep (r09 ADVICE).
    vocab = train_tok.groupBy("tok").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    ).localCheckpoint(eager=True)
    consts = vocab.agg(
        (F.sum("cnt") + F.count(F.lit(1)) + 1).cast("bigint").alias("denom")
    )
    held_tok = d.filter(F.col("held_out") & (F.size("l") > 0)).select(
        "doc_id", "source", F.posexplode("l").alias("pos0", "tok")
    ).select(
        "doc_id", "source", (F.col("pos0") + 1).alias("pos"), "tok"
    )
    # per-doc mean via the pos-ordered fold (see oracle comment)
    log2v = F.log2(F.coalesce(F.col("cnt"), F.lit(0)) + 1)
    ordered_logs = F.transform(
        F.array_sort(F.collect_list(F.struct("pos", "lv"))),
        lambda s: s["lv"],
    )
    per_doc = (
        held_tok.join(F.broadcast(vocab), "tok", "left")
        .select("doc_id", "source", "pos", log2v.alias("lv"))
        .groupBy("doc_id", "source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("dl"),
            F.aggregate(ordered_logs, F.lit(0.0), lambda a, x: a + x).alias(
                "lsum"
            ),
        )
        .crossJoin(F.broadcast(consts))
        .select(
            "doc_id",
            "source",
            F.round(
                F.col("lsum") / F.col("dl") - F.log2(F.col("denom")), 6
            ).alias("avg_log2p"),
        )
    )
    ordered = F.transform(
        F.array_sort(F.collect_list(F.struct("doc_id", "avg_log2p"))),
        lambda s: s["avg_log2p"],
    )
    per_source = per_doc.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.aggregate(ordered, F.lit(0.0), lambda a, v: a + v).alias("s"),
    )
    mean = F.col("s") / F.col("n_docs")
    return per_source.select(
        "source",
        "n_docs",
        F.round(mean, 6).alias("mean_doc_log2p"),
        F.round(F.pow(F.lit(2.0), -mean), 4).alias("perplexity"),
    )


# ---------------------------------------------------------------------------
# mapInPandas: Fletcher-16 payload checksum
# ---------------------------------------------------------------------------

FLETCHER_MOD = 255


@query(
    "mm_payload_fletcher16",
    oracle=f"""
        WITH ch AS (
            SELECT doc_id,
                   ascii(UNNEST(string_split_regex(text, ''))) AS b,
                   CAST(generate_subscripts(
                        string_split_regex(text, ''), 1) AS BIGINT) AS i,
                   CAST(length(text) AS BIGINT) AS n
            FROM documents
        ),
        s AS (
            SELECT doc_id,
                   CAST(SUM(b) % {FLETCHER_MOD} AS BIGINT) AS s1,
                   CAST(SUM((n - i + 1) * b) % {FLETCHER_MOD} AS BIGINT) AS s2
            FROM ch WHERE b IS NOT NULL AND b > 0 AND b < 128
            GROUP BY doc_id
        )
        SELECT d.doc_id,
               CAST(length(d.text) AS BIGINT) AS n_bytes,
               CAST(COALESCE(s.s2, 0) * 256
                    + COALESCE(s.s1, 0) AS BIGINT) AS fletcher16
        FROM documents d LEFT JOIN s ON d.doc_id = s.doc_id
    """,
    tags=("multimodal", "mapInPandas", "documents"),
)
def mm_payload_fletcher16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FLETCHER-16 payload checksum via ``mapInPandas``: the
    position-weighted integrity check (RFC 1146 family; Adler-32's
    little sibling with mod 255 and no +1 offsets) computed VECTORIZED
    in numpy — s1 = Σb mod 255, s2 = Σ(cumsum b) mod 255, where
    Σcumsum(b) ≡ Σ(n−i+1)·b is exactly the positional restatement the
    oracle runs relationally: two genuinely independent formulations
    of the same pair of integers (the numpy side never materializes a
    position index at all). ASCII contract asserted per document;
    empty payloads pin fletcher16(b'') = 0 via the documents LEFT
    JOIN (the r08 Adler review class — a checksum oracle must never
    silently DROP a row the kernel emits). Pure integers; one Arrow
    row per document; at 100 TB the kernel rides the payload-decode
    scan."""
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
                    s1 = int(b.sum(dtype=np.int64)) % FLETCHER_MOD
                    s2 = int(np.cumsum(b, dtype=np.int64).sum()) % FLETCHER_MOD
                else:
                    s1 = s2 = 0
                rows.append((int(doc_id), int(b.size), s2 * 256 + s1))
            if rows:
                yield pd.DataFrame(
                    rows, columns=["doc_id", "n_bytes", "fletcher16"]
                )

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return d.mapInPandas(
        batches, "doc_id long, n_bytes long, fletcher16 long"
    )
