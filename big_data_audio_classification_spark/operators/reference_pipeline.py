"""The reference's own dataflow (SURVEY §2.A R1–R24), re-expressed as
lazy Spark plans over deterministic synthetic inputs so every step is
oracle-checkable (the reference's randomness — lorem text, RNG phrase
lengths — is replaced by fixed arithmetic functions of the row id; the
*operator shapes* are exactly the reference's).

Mapping (file:line cites into /root/reference):
* R2 row source  — ``range(phrases)``            data_generator.py:15
* R3 parity labels — Male/Female by id parity     data_generator.py:18,21
* R7 cumulative seconds — running sum             data_generator.py:14,20-21
* R17 filter vs scalar aggregate                  voice_classifier.py:103
* R18 dedup by key                                voice_classifier.py:104
* R22 index→time axis rescale                     voice_classifier.py:124
* R23 lag for phrase bounds                       voice_classifier.py:125
* R24 interval (range) join frame→phrase          voice_classifier.py:126-134

The interval join uses half-open [start, end) intervals — the reference's
closed-both-sides loop emits boundary frames twice (SURVEY §2.A R24
divergence note).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from big_data_audio_classification_spark.registry import query

N_PHRASES = 40
FRAME_STEP = 0.25  # exactly representable in binary → identical FP both engines
# total recording length Σ dur_i is a pure function of N_PHRASES — inlined
# as a literal because DuckDB's range() table function can't take a subquery
TOTAL_SECONDS = sum((i * 7) % 8 + 2 for i in range(N_PHRASES))
N_FRAMES = int(TOTAL_SECONDS / FRAME_STEP)


def segments(spark: SparkSession) -> DataFrame:
    """Deterministic stand-in for the generator's labeled-phrase table
    (FIXTURES.md A1): dur_i ∈ {2..9} via fixed arithmetic, cumulative
    ``seconds`` via an ordered running-sum window (R7)."""
    base = spark.range(N_PHRASES).select(
        F.col("id"),
        F.when(F.pmod("id", F.lit(2)) == 0, "Male").otherwise("Female").alias("speaker"),
        ((F.col("id") * 7) % 8 + 2).cast("double").alias("dur"),
    )
    w = Window.orderBy("id").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return base.select(
        "id", "speaker", "dur", F.sum("dur").over(w).alias("seconds")
    )


_SEGMENTS_SQL = f"""
    SELECT id, speaker, dur,
           SUM(dur) OVER (ORDER BY id ROWS UNBOUNDED PRECEDING) AS seconds
    FROM (
        SELECT range AS id,
               CASE WHEN range % 2 = 0 THEN 'Male' ELSE 'Female' END AS speaker,
               CAST((range * 7) % 8 + 2 AS DOUBLE) AS dur
        FROM range({N_PHRASES})
    )
"""


@query("ref_segments_cumsum", oracle=_SEGMENTS_SQL, tags=("reference", "window"))
def ref_segments_cumsum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R2+R3+R7: row source, parity labeling, cumulative duration.
    Note the single unpartitioned ordered window — correct here because
    the phrase table is tiny by construction (one recording); the
    at-scale form partitions by recording id."""
    return segments(spark)


def frames(spark: SparkSession) -> DataFrame:
    """Uniform frame-time grid over the recording (stand-in for R14's
    spectrogram frame axis): t = j·step up to total seconds. Sized by
    the N_FRAMES module literal — the same constant the oracle SQL
    uses — so building the grid triggers no eager job (the r04 VERDICT
    flagged the redundant ``.first()`` that used to size it)."""
    return spark.range(N_FRAMES).select(
        F.col("id").alias("frame_id"),
        (F.col("id") * F.lit(FRAME_STEP)).alias("t"),
    )


_FRAMES_SQL = f"""
    SELECT range AS frame_id, range * {FRAME_STEP} AS t
    FROM range({N_FRAMES})
"""


@query(
    "ref_interval_join",
    oracle=f"""
        WITH seg AS ({_SEGMENTS_SQL}),
        bounds AS (
            SELECT speaker, seconds AS e,
                   COALESCE(LAG(seconds) OVER (ORDER BY id), 0.0) AS s
            FROM seg
        ),
        f AS ({_FRAMES_SQL})
        SELECT f.frame_id, f.t, b.speaker
        FROM f JOIN bounds b ON f.t >= b.s AND f.t < b.e
    """,
    tags=("reference", "range-join"),
)
def ref_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R23+R24: phrase bounds via lag, then the frame→phrase interval
    join as a broadcast non-equi join (the reference's O(F×P) Python
    loop, voice_classifier.py:126-134). Half-open intervals: each frame
    matches exactly one phrase. At 100 TB: bucket both sides by
    floor(t/Δ) to make it an equi-join + residual (SURVEY §4.1)."""
    seg = segments(spark)
    w = Window.orderBy("id")
    bounds = seg.select(
        "speaker",
        F.col("seconds").alias("e"),
        F.coalesce(F.lag("seconds").over(w), F.lit(0.0)).alias("s"),
    )
    f = frames(spark)
    return f.join(
        F.broadcast(bounds), (F.col("t") >= F.col("s")) & (F.col("t") < F.col("e"))
    ).select("frame_id", "t", "speaker")


@query(
    "ref_filter_scalar_max",
    oracle=f"""
        WITH seg AS ({_SEGMENTS_SQL}),
        f AS ({_FRAMES_SQL})
        SELECT id, speaker, seconds
        FROM seg
        WHERE seconds <= (SELECT ROUND(MAX(t), 0) FROM f)
    """,
    tags=("reference", "filter"),
)
def ref_filter_scalar_max(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R17: filter against a scalar aggregate of another table
    (voice_classifier.py:103) — crossJoin(broadcast(1-row agg)) keeps it
    fully distributed (no driver round-trip)."""
    seg = segments(spark)
    cutoff = frames(spark).agg(F.round(F.max("t"), 0).alias("cutoff"))
    return (
        seg.crossJoin(F.broadcast(cutoff))
        .filter(F.col("seconds") <= F.col("cutoff"))
        .select("id", "speaker", "seconds")
    )


@query(
    "ref_dedup_by_key",
    oracle=f"""
        SELECT speaker, MIN(id) AS first_id, COUNT(*) AS n_phrases
        FROM ({_SEGMENTS_SQL})
        GROUP BY speaker
    """,
    tags=("reference", "dedup"),
)
def ref_dedup_by_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R18: the reference's (discarded) drop_duplicates(subset='speaker')
    at voice_classifier.py:104. ``dropDuplicates(["k"])`` keeps an
    arbitrary row under a shuffle — the deterministic engine form is
    min-per-key."""
    return (
        segments(spark)
        .groupBy("speaker")
        .agg(F.min("id").alias("first_id"), F.count(F.lit(1)).alias("n_phrases"))
    )


@query(
    "ref_axis_rescale",
    oracle=f"""
        WITH f AS ({_FRAMES_SQL}),
        m AS (SELECT MAX(seconds) AS max_sec FROM ({_SEGMENTS_SQL})),
        n AS (SELECT MAX(frame_id) AS max_j FROM f)
        SELECT frame_id,
               ROUND(frame_id * m.max_sec / n.max_j, 6) AS time_axis
        FROM f, m, n
    """,
    tags=("reference", "projection"),
)
def ref_axis_rescale(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R22: index→time rescale ``time[j] = j·max(seconds)/max(j)``
    (voice_classifier.py:124) with both scalars as broadcast 1-row aggs."""
    f = frames(spark)
    max_sec = segments(spark).agg(F.max("seconds").alias("max_sec"))
    max_j = f.agg(F.max("frame_id").alias("max_j"))
    return (
        f.crossJoin(F.broadcast(max_sec))
        .crossJoin(F.broadcast(max_j))
        .select(
            "frame_id",
            F.round(F.col("frame_id") * F.col("max_sec") / F.col("max_j"), 6).alias(
                "time_axis"
            ),
        )
    )


@query(
    "ref_power_to_db",
    oracle=f"""
        WITH p AS (
            SELECT range AS cell_id,
                   CAST((range * 37) % 1000 + 1 AS DOUBLE) / 10.0 AS power
            FROM range(5000)
        ),
        m AS (SELECT MAX(power) AS maxp FROM p)
        SELECT cell_id,
               ROUND(GREATEST(10.0 * LOG10(power / m.maxp), -80.0), 6) AS db
        FROM p, m
    """,
    tags=("reference", "audio-math"),
)
def ref_power_to_db(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R15: librosa ``power_to_db(S, ref=np.max)`` (voice_classifier.py:83)
    as the canonical two-pass pattern — global max agg, broadcast back,
    then ``greatest(10·log10(p/maxp), −80)`` elementwise. One extra
    reduce + one map; no driver collect."""
    p = spark.range(5000).select(
        F.col("id").alias("cell_id"),
        (((F.col("id") * 37) % 1000 + 1).cast("double") / 10.0).alias("power"),
    )
    maxp = p.agg(F.max("power").alias("maxp"))
    return p.crossJoin(F.broadcast(maxp)).select(
        "cell_id",
        F.round(
            F.greatest(10.0 * F.log10(F.col("power") / F.col("maxp")), F.lit(-80.0)), 6
        ).alias("db"),
    )


BUCKET_SECONDS = 4.0  # Δ for the bucketed interval join


@query(
    "ref_interval_join_bucketed",
    oracle=f"""
        WITH seg AS ({_SEGMENTS_SQL}),
        bounds AS (
            SELECT speaker, seconds AS e,
                   COALESCE(LAG(seconds) OVER (ORDER BY id), 0.0) AS s
            FROM seg
        ),
        f AS ({_FRAMES_SQL})
        SELECT f.frame_id, f.t, b.speaker
        FROM f JOIN bounds b ON f.t >= b.s AND f.t < b.e
    """,
    tags=("reference", "range-join", "scale"),
)
def ref_interval_join_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R24's interval join as the 100 TB plan promised in
    ``ref_interval_join``'s docstring: bucket both sides by
    ``floor(t/Δ)``, equi-join on the bucket, keep the residual range
    predicate. Intervals explode into every bucket they cover
    (``sequence(floor(s/Δ), floor((e−ulp)/Δ))``), so each frame meets
    only the handful of intervals sharing its bucket — a shuffle
    equi-join instead of a broadcast nested loop. Same rows as the NLJ
    form; the ORACLE is literally the same SQL as ``ref_interval_join``.

    Δ trades replication (intervals span e−s ≤ 9 s → ≤ 3 buckets at
    Δ=4 s) against per-bucket candidate count — at real scale pick Δ on
    the order of the median interval length."""
    seg = segments(spark)
    w = Window.orderBy("id")
    bounds = seg.select(
        "speaker",
        F.col("seconds").alias("e"),
        F.coalesce(F.lag("seconds").over(w), F.lit(0.0)).alias("s"),
    )
    # explode each interval into the Δ-buckets it covers; half-open end
    # (e - tiny ulp) keeps an interval ending exactly on a boundary out
    # of the next bucket
    buckets = bounds.select(
        "speaker",
        "s",
        "e",
        F.explode(
            F.sequence(
                F.floor(F.col("s") / BUCKET_SECONDS).cast("long"),
                F.floor((F.col("e") - F.lit(1e-9)) / BUCKET_SECONDS).cast("long"),
            )
        ).alias("bkt"),
    )
    f = frames(spark).withColumn(
        "bkt", F.floor(F.col("t") / BUCKET_SECONDS).cast("long")
    )
    return (
        f.join(buckets, "bkt")  # equi-join on the bucket key
        .filter((F.col("t") >= F.col("s")) & (F.col("t") < F.col("e")))  # residual
        .select("frame_id", "t", "speaker")
    )
