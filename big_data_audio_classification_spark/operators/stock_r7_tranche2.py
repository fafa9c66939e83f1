"""Round-7 tranche-2 stock: a THIRD never-certified carrier for the
scarce family tags (each held exactly 2 after the r07 rotation +
tranche 1), so rounds 8 AND 9 can rotate fresh carriers per family
without building any — and round 8's time goes to quality instead of
restocking.

Same contract as ``stock_r7.py``: idiomatic Spark plan + independent
DuckDB oracle, identical aliases, bit-stable floats (exact integer /
fixed-point accumulation up to fixed-order float expressions, ordered
in-row folds where a cross-row float mean is unavoidable), and a 100 TB
scale story per docstring.
"""

from __future__ import annotations

import pandas as pd  # noqa: F401  (pandas UDAF kernels)
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from big_data_audio_classification_spark.registry import query
from big_data_audio_classification_spark.sources.catalog import load_table

# ---------------------------------------------------------------------------
# asof: cross-table as-of (orders pulled to the latest prior event)
# ---------------------------------------------------------------------------


@query(
    "join_asof_cross_table",
    oracle="""
        WITH o AS (SELECT o_orderkey, o_custkey % 150 AS ch, o_orderdate AS ots
                   FROM orders WHERE o_orderkey % 20 = 0),
             e AS (SELECT user_id AS ch, ts, event_id, value FROM events),
             j AS (SELECT o.o_orderkey, o.ch, e.event_id, e.value,
                          ROW_NUMBER() OVER (
                              PARTITION BY o.o_orderkey
                              ORDER BY (e.event_id IS NULL),
                                       e.ts DESC, e.event_id DESC) AS rn
                   FROM o LEFT JOIN e
                     ON e.ch = o.ch AND e.ts <= o.ots)
        SELECT o_orderkey, CAST(ch AS BIGINT) AS channel,
               event_id                       AS last_event_id,
               CASE WHEN event_id IS NOT NULL
                    THEN ROUND(value, 2) END  AS last_value,
               event_id IS NOT NULL           AS matched
        FROM j WHERE rn = 1
    """,
    tags=("relational", "join", "asof", "events", "orders"),
)
def join_asof_cross_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CROSS-TABLE as-of: every 20th order pulls the LATEST event
    at-or-before its order date on its (hash-mapped) channel — the
    fact-to-telemetry enrichment join (same-table as-ofs:
    backward/nearest/forward/LOCF family). Same single-shuffle
    union + backward-carry plan keyed by channel; among equal-ts
    events the LARGEST event_id wins (stated identically in the
    oracle's rank). The left join keeps orders on channels with no
    prior events — honest NULLs, `matched` says so."""
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderkey") % 20 == 0
    ).select(
        "o_orderkey",
        (F.col("o_custkey") % 150).alias("ch"),
        F.col("o_orderdate").alias("ts"),
        F.lit(0).alias("is_e"),
        F.lit(None).cast("long").alias("eid_src"),
        F.lit(None).cast("double").alias("val_src"),
    )
    e = load_table(spark, sf_dir, "events").select(
        F.lit(None).cast("long").alias("o_orderkey"),
        F.col("user_id").alias("ch"),
        "ts",
        F.lit(1).alias("is_e"),
        F.col("event_id").alias("eid_src"),
        F.col("value").alias("val_src"),
    )
    w = (
        Window.partitionBy("ch")
        .orderBy(F.col("ts").asc(), F.col("is_e").desc(), F.col("eid_src").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = o.unionByName(e).select(
        "o_orderkey", "ch", "is_e",
        F.last("eid_src", ignorenulls=True).over(w).alias("last_event_id"),
        F.last("val_src", ignorenulls=True).over(w).alias("lv"),
    ).filter(F.col("is_e") == 0)
    m = F.col("last_event_id").isNotNull()
    return carried.select(
        "o_orderkey",
        F.col("ch").cast("bigint").alias("channel"),
        "last_event_id",
        F.when(m, F.round(F.col("lv"), 2)).alias("last_value"),
        m.alias("matched"),
    )


# ---------------------------------------------------------------------------
# setop: semi/anti join census with the EXISTS equivalence
# ---------------------------------------------------------------------------


@query(
    "set_semi_anti_census",
    oracle="""
        WITH c AS (SELECT DISTINCT o_custkey FROM orders
                   WHERE o_orderstatus = 'F'),
             u AS (SELECT DISTINCT o_custkey FROM orders
                   WHERE o_orderpriority = '1-URGENT')
        SELECT CAST((SELECT COUNT(*) FROM c WHERE EXISTS
                     (SELECT 1 FROM u WHERE u.o_custkey = c.o_custkey))
                    AS BIGINT) AS n_semi,
               CAST((SELECT COUNT(*) FROM c WHERE NOT EXISTS
                     (SELECT 1 FROM u WHERE u.o_custkey = c.o_custkey))
                    AS BIGINT) AS n_anti,
               CAST((SELECT COUNT(*) FROM c) AS BIGINT) AS n_left
    """,
    tags=("relational", "setop", "subquery", "orders"),
)
def set_semi_anti_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT-SEMI / LEFT-ANTI census with the partition identity
    semi + anti = left — the join types behind every EXISTS / NOT
    EXISTS and the engine form of incremental-ingest dedup
    (``dedup_incremental_batch`` uses exactly the anti leg). Spark
    states them as join types; the oracle states the EXISTS forms —
    the decorrelation equivalence itself is the thing checked. Both
    legs are one equi-shuffle each at 100 TB, and the semi/anti
    variants ship only the key (no payload) through the exchange."""
    o = load_table(spark, sf_dir, "orders")
    c = o.filter(F.col("o_orderstatus") == "F").select("o_custkey").distinct()
    u = (
        o.filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_custkey")
        .distinct()
    )
    semi = c.join(u, "o_custkey", "left_semi").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_semi")
    )
    anti = c.join(u, "o_custkey", "left_anti").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_anti")
    )
    left = c.agg(F.count(F.lit(1)).cast("bigint").alias("n_left"))
    return semi.crossJoin(F.broadcast(anti)).crossJoin(F.broadcast(left))


# ---------------------------------------------------------------------------
# sketch: bottom-k (theta-style) set-operation estimates
# ---------------------------------------------------------------------------

THETA_K = 64
THETA_SPACE = 4294967296  # 2^32 portable-hash domain


def _theta_sql() -> str:
    return f"""
        WITH fk AS (
            SELECT DISTINCT CAST(('0x' || substr(md5(CAST(o_custkey AS VARCHAR)),
                                  1, 8)) AS BIGINT) AS hv
            FROM orders WHERE o_orderstatus = 'F'
        ),
        uk AS (
            SELECT DISTINCT CAST(('0x' || substr(md5(CAST(o_custkey AS VARCHAR)),
                                  1, 8)) AS BIGINT) AS hv
            FROM orders WHERE o_orderpriority = '1-URGENT'
        ),
        un AS (SELECT hv FROM fk UNION SELECT hv FROM uk),
        bk AS (SELECT hv, ROW_NUMBER() OVER (ORDER BY hv) AS rk FROM un),
        theta AS (
            SELECT CASE WHEN (SELECT COUNT(*) FROM bk) <= {THETA_K}
                        THEN CAST({THETA_SPACE} AS DOUBLE)
                        ELSE CAST((SELECT hv FROM bk WHERE rk = {THETA_K})
                                  AS DOUBLE) END AS th,
                   (SELECT COUNT(*) FROM bk) <= {THETA_K} AS exact_mode
        )
        SELECT CAST((SELECT COUNT(*) FROM un) AS BIGINT) AS n_union_exact,
               CAST(CASE WHEN t.exact_mode
                    THEN (SELECT COUNT(*) FROM un)
                    ELSE CAST(FLOOR(({THETA_K} - 1.0) * {THETA_SPACE} / t.th)
                              AS BIGINT) END AS BIGINT)   AS union_estimate,
               CAST((SELECT COUNT(*) FROM bk b
                     WHERE b.rk < {THETA_K}
                       AND EXISTS (SELECT 1 FROM fk WHERE fk.hv = b.hv)
                       AND EXISTS (SELECT 1 FROM uk WHERE uk.hv = b.hv))
                    AS BIGINT)                            AS k_inter_hits,
               t.exact_mode
        FROM theta t
    """


@query(
    "agg_theta_sketch_setops",
    oracle=_theta_sql(),
    tags=("aggregate", "sketch", "setop", "orders"),
)
def agg_theta_sketch_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """THETA-SKETCH set algebra (DataSketches semantics) from bottom-k
    samples: the union's bottom-64 portable hashes fix a threshold θ
    (= the k-th minimum), the union size is estimated as (k−1)·S/θ,
    and the INTERSECTION is estimated by counting sub-θ hashes present
    in both streams — the mergeable sketch identity that lets a 100 TB
    pipeline AND/OR/NOT distinct-count sketches without re-scanning
    (single-stream KMV: ``agg_kmv_distinct_sketch``). Every output is
    exact integer arithmetic (counts and one floored division), and
    small unions fall back to exact mode — bit-stable by construction.
    One distinct-hash pass per stream + one rank over the union's
    k-head. fk/uk/un each feed two consumers (the union AND the k-head
    semi-joins; the count AND both rank reads), so all three persist
    (r11 — the lazy forms re-ran every distinct pass: 8 executed
    parquet-scan operators in the final plan, now 2); the global
    row_number is planned as
    TakeOrderedAndProject(64) + a ≤64-row window by Spark's
    rank-filter rewrite, never a data-sized sort."""
    from big_data_audio_classification_spark.operators.dedup import token_hash

    o = load_table(spark, sf_dir, "orders")
    fk = (
        o.filter(F.col("o_orderstatus") == "F")
        .select(token_hash(F.col("o_custkey").cast("string")).alias("hv"))
        .distinct()
        .persist()
    )
    uk = (
        o.filter(F.col("o_orderpriority") == "1-URGENT")
        .select(token_hash(F.col("o_custkey").cast("string")).alias("hv"))
        .distinct()
        .persist()
    )
    un = fk.union(uk).distinct().persist()
    bk = un.select(
        "hv", F.row_number().over(Window.orderBy("hv")).alias("rk")
    )
    n_union = un.agg(F.count(F.lit(1)).cast("bigint").alias("n_union_exact"))
    kth = bk.filter(F.col("rk") == THETA_K).select(
        F.col("hv").cast("double").alias("kth")
    )
    inter_hits = (
        bk.filter(F.col("rk") < THETA_K)
        .join(fk.withColumnRenamed("hv", "hv_f"),
              F.col("hv") == F.col("hv_f"), "left_semi")
        .join(uk.withColumnRenamed("hv", "hv_u"),
              F.col("hv") == F.col("hv_u"), "left_semi")
        .agg(F.count(F.lit(1)).cast("bigint").alias("k_inter_hits"))
    )
    out = (
        n_union.crossJoin(F.broadcast(kth.limit(1)))
        .crossJoin(F.broadcast(inter_hits))
        .select(
            "n_union_exact",
            F.when(
                F.col("n_union_exact") <= THETA_K, F.col("n_union_exact")
            )
            .otherwise(
                F.floor(
                    (THETA_K - 1.0) * THETA_SPACE / F.col("kth")
                ).cast("bigint")
            )
            .cast("bigint")
            .alias("union_estimate"),
            "k_inter_hits",
            (F.col("n_union_exact") <= THETA_K).alias("exact_mode"),
        )
    )
    return out


# ---------------------------------------------------------------------------
# grouping: CUBE stated as explicit GROUPING SETS (equivalence)
# ---------------------------------------------------------------------------


@query(
    "agg_cube_as_grouping_sets",
    oracle="""
        SELECT COALESCE(o_orderstatus, '<all>')   AS status,
               COALESCE(CAST(EXTRACT(year FROM o_orderdate) AS VARCHAR),
                        '<all>')                  AS yr,
               CAST(GROUPING(o_orderstatus) * 2
                    + GROUPING(EXTRACT(year FROM o_orderdate))
                    AS BIGINT)                    AS gid,
               CAST(COUNT(*) AS BIGINT)           AS n
        FROM orders
        GROUP BY GROUPING SETS (
            (o_orderstatus, EXTRACT(year FROM o_orderdate)),
            (o_orderstatus), (EXTRACT(year FROM o_orderdate)), ()
        )
    """,
    tags=("aggregate", "grouping", "orders"),
)
def agg_cube_as_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE ≡ GROUPING SETS equivalence, checked: Spark states the
    4-level lattice with ``cube()``; the oracle enumerates the same
    lattice as explicit GROUPING SETS — the rewrite every planner
    performs internally, here verified value-for-value including the
    grouping_id bitmask (ROLLUP slice: ``agg_grouping_id_subtotals``;
    mixed sets: ``agg_groupingsets_mixed``). One expand + one shuffle
    regardless of lattice size."""
    o = load_table(spark, sf_dir, "orders")
    yr = F.year("o_orderdate")
    return (
        o.cube(F.col("o_orderstatus"), yr.alias("y"))
        .agg(
            F.grouping_id().cast("bigint").alias("gid"),
            F.count(F.lit(1)).cast("bigint").alias("n"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("<all>")).alias("status"),
            F.coalesce(F.col("y").cast("string"), F.lit("<all>")).alias("yr"),
            "gid",
            "n",
        )
    )


# ---------------------------------------------------------------------------
# math: integer bit-twiddling battery (exact by construction)
# ---------------------------------------------------------------------------


@query(
    "scalar_math_integer_bits",
    oracle="""
        SELECT o_orderkey,
               CAST(bit_count(CAST(o_orderkey AS BIGINT)) AS BIGINT)
                                                          AS popcount,
               CAST(o_orderkey << 3 AS BIGINT)            AS shl3,
               CAST(o_orderkey >> 2 AS BIGINT)            AS shr2,
               CAST(xor(o_orderkey, 255) AS BIGINT)       AS xor255,
               CAST(o_orderkey & 1023 AS BIGINT)          AS low10,
               CAST(o_orderkey | 4096 AS BIGINT)          AS or4096,
               CAST(CASE WHEN o_orderkey % 7 >= 0 THEN o_orderkey % 7
                         ELSE o_orderkey % 7 + 7 END AS BIGINT) AS pmod7
        FROM orders
    """,
    tags=("scalar", "math", "orders"),
)
def scalar_math_integer_bits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTEGER BIT battery: popcount, shifts, xor/and/or masks, and
    positive-modulo — the hash/partition/bitmap vocabulary (SimHash
    hamming distances, bitmap indexes, and salting all reduce to
    these). Pure 64-bit integer ops — exact on any engine by
    definition, codegen'd, no shuffle (float batteries:
    ``scalar_math_log1p_hypot``, ``scalar_math_inverse_trig``)."""
    li = load_table(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    return li.select(
        "o_orderkey",
        F.bit_count(k).cast("bigint").alias("popcount"),
        F.shiftleft(k, 3).cast("bigint").alias("shl3"),
        F.shiftright(k, 2).cast("bigint").alias("shr2"),
        k.bitwiseXOR(F.lit(255)).cast("bigint").alias("xor255"),
        k.bitwiseAND(F.lit(1023)).cast("bigint").alias("low10"),
        k.bitwiseOR(F.lit(4096)).cast("bigint").alias("or4096"),
        F.pmod(k, F.lit(7)).cast("bigint").alias("pmod7"),
    )


# ---------------------------------------------------------------------------
# string: edit-distance + phonetic-ish string battery
# ---------------------------------------------------------------------------


@query(
    "scalar_string_edit_distance",
    oracle="""
        SELECT c_custkey,
               levenshtein(c_name, 'Customer#000000001')       AS lev_to_first,
               CAST(length(c_name) AS BIGINT)                  AS name_len,
               left(c_name, 9)                                 AS name_prefix,
               right(c_name, 4)                                AS name_suffix,
               CAST(strpos(c_name, '#') AS BIGINT)             AS hash_pos,
               reverse(right(c_name, 4))                       AS suffix_rev,
               repeat(right(c_name, 1), 3)                     AS last_x3
        FROM customer
    """,
    tags=("scalar", "string", "customer"),
)
def scalar_string_edit_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EDIT-DISTANCE string battery: Levenshtein distance to a fixed
    anchor (the fuzzy-matching primitive behind
    ``er_blocked_fuzzy_parts``), slicing from both ends, substring
    position, reverse, repeat — the record-linkage string vocabulary
    as row-local JVM ops (collation compare: ``scalar_collation_ci``;
    both engines implement the same Wagner-Fischer integer DP, so
    distances are exact)."""
    c = load_table(spark, sf_dir, "customer")
    n = F.col("c_name")
    return c.select(
        "c_custkey",
        F.levenshtein(n, F.lit("Customer#000000001")).alias("lev_to_first"),
        F.length(n).cast("bigint").alias("name_len"),
        n.substr(F.lit(1), F.lit(9)).alias("name_prefix"),
        n.substr(F.length(n) - 3, F.lit(4)).alias("name_suffix"),
        F.instr(n, "#").cast("bigint").alias("hash_pos"),
        F.reverse(n.substr(F.length(n) - 3, F.lit(4))).alias("suffix_rev"),
        F.repeat(n.substr(F.length(n), F.lit(1)), 3).alias("last_x3"),
    )


# ---------------------------------------------------------------------------
# json: nested-array arithmetic through paths
# ---------------------------------------------------------------------------


@query(
    "scalar_json_array_arith",
    oracle="""
        WITH j AS (
            SELECT event_id,
                   '{"xs": [' || CAST(event_id % 5 AS VARCHAR) || ', '
                       || CAST(event_id % 7 AS VARCHAR) || ', '
                       || CAST(event_id % 11 AS VARCHAR) || ']}' AS doc
            FROM events
        )
        SELECT event_id,
               CAST(json_array_length(doc, '$.xs') AS BIGINT)       AS n_xs,
               CAST(json_extract_string(doc, '$.xs[0]') AS BIGINT)
                   + CAST(json_extract_string(doc, '$.xs[1]') AS BIGINT)
                   + CAST(json_extract_string(doc, '$.xs[2]') AS BIGINT)
                                                                    AS xs_sum,
               GREATEST(CAST(json_extract_string(doc, '$.xs[0]') AS BIGINT),
                        CAST(json_extract_string(doc, '$.xs[1]') AS BIGINT),
                        CAST(json_extract_string(doc, '$.xs[2]') AS BIGINT))
                                                                    AS xs_max,
               CAST(json_extract_string(doc, '$.xs[2]') AS BIGINT)  AS xs_last,
               json_extract_string(doc, '$.xs[9]') IS NULL          AS oob_null
        FROM j
    """,
    tags=("scalar", "json", "events"),
)
def scalar_json_array_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON ARRAY ARITHMETIC through path reads: length, element sum,
    max, the last element, and the out-of-bounds → NULL contract —
    typed leaf extraction feeding integer arithmetic without ever
    materializing an array column (shape introspection:
    ``scalar_json_object_shape``; indexed paths:
    ``scalar_json_array_paths`` r07 window; note Spark's JsonPath has
    no negative indexing, so from-the-end reads must be positional).
    Row-local, exact integers."""
    e = load_table(spark, sf_dir, "events")
    doc = F.concat(
        F.lit('{"xs": ['), (F.col("event_id") % 5).cast("string"),
        F.lit(", "), (F.col("event_id") % 7).cast("string"),
        F.lit(", "), (F.col("event_id") % 11).cast("string"), F.lit("]}"),
    )
    x = [
        F.get_json_object(doc, f"$.xs[{i}]").cast("bigint") for i in range(3)
    ]
    return e.select(
        "event_id",
        F.json_array_length(F.get_json_object(doc, "$.xs"))
        .cast("bigint")
        .alias("n_xs"),
        (x[0] + x[1] + x[2]).alias("xs_sum"),
        F.greatest(*x).alias("xs_max"),
        F.get_json_object(doc, "$.xs[2]").cast("bigint").alias("xs_last"),
        F.get_json_object(doc, "$.xs[9]").isNull().alias("oob_null"),
    )


# ---------------------------------------------------------------------------
# variant: object-of-objects navigation with per-branch null accounting
# ---------------------------------------------------------------------------


@query(
    "scalar_variant_object_tree",
    oracle="""
        WITH v AS (
            SELECT event_id,
                   '{"a": {"x": ' || CAST(event_id % 4 AS VARCHAR)
                   || '}, "b": {"x": ' || CAST(event_id % 6 AS VARCHAR)
                   || ', "y": "' || event_type || '"}'
                   || CASE WHEN event_id % 3 = 0
                           THEN ', "c": {"x": 9}' ELSE '' END || '}' AS doc
            FROM events
        )
        SELECT event_id,
               CAST(json_extract_string(doc, '$.a.x') AS BIGINT)  AS ax,
               CAST(json_extract_string(doc, '$.b.x') AS BIGINT)  AS bx,
               json_extract_string(doc, '$.b.y')                  AS by_str,
               CAST(json_extract_string(doc, '$.c.x') AS BIGINT)  AS cx,
               json_extract(doc, '$.c') IS NOT NULL               AS has_c,
               CAST(json_extract_string(doc, '$.a.x') AS BIGINT)
                   + CAST(json_extract_string(doc, '$.b.x') AS BIGINT)
                   + COALESCE(CAST(json_extract_string(doc, '$.c.x')
                                   AS BIGINT), 0)                 AS x_total
        FROM v
    """,
    tags=("scalar", "variant", "events"),
)
def scalar_variant_object_tree(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VARIANT OBJECT TREE: a two-level object where one branch ($.c)
    exists only on every third row — typed multi-hop reads, branch
    presence detection, and a COALESCE-folded cross-branch total (the
    ragged-schema navigation semi-structured feeds actually have;
    flat objects: ``scalar_variant_typed_paths``; arrays:
    ``scalar_variant_array_paths``; scalars:
    ``scalar_variant_mixed_scalars``). One parse_json per row feeding
    five variant_get reads."""
    e = load_table(spark, sf_dir, "events")
    doc = F.concat(
        F.lit('{"a": {"x": '), (F.col("event_id") % 4).cast("string"),
        F.lit('}, "b": {"x": '), (F.col("event_id") % 6).cast("string"),
        F.lit(', "y": "'), F.col("event_type"), F.lit('"}'),
        F.when(F.col("event_id") % 3 == 0, ', "c": {"x": 9}').otherwise(""),
        F.lit("}"),
    )
    v = F.parse_json(doc)
    ax = F.try_variant_get(v, "$.a.x", "bigint")
    bx = F.try_variant_get(v, "$.b.x", "bigint")
    cx = F.try_variant_get(v, "$.c.x", "bigint")
    return e.select(
        "event_id",
        ax.alias("ax"),
        bx.alias("bx"),
        F.try_variant_get(v, "$.b.y", "string").alias("by_str"),
        cx.alias("cx"),
        F.try_variant_get(v, "$.c", "variant").isNotNull().alias("has_c"),
        (ax + bx + F.coalesce(cx, F.lit(0))).alias("x_total"),
    )


# ---------------------------------------------------------------------------
# array: in-row fixed-bin histogram of an embedding vector
# ---------------------------------------------------------------------------

AHIST_BINS = 8
AHIST_LO = -0.6
AHIST_HI = 0.6


def _ahist_sql() -> str:
    width = (AHIST_HI - AHIST_LO) / AHIST_BINS
    cols = ", ".join(
        f"""CAST(len(list_filter(embedding,
                 v -> CAST(v AS DOUBLE) >= {AHIST_LO + i * width}
                  AND CAST(v AS DOUBLE) < {AHIST_LO + (i + 1) * width}))
             AS BIGINT) AS bin{i}"""
        for i in range(AHIST_BINS)
    )
    return f"""
        SELECT vec_id, {cols},
               CAST(len(list_filter(embedding,
                    v -> CAST(v AS DOUBLE) < {AHIST_LO}
                      OR CAST(v AS DOUBLE) >= {AHIST_HI})) AS BIGINT)
                   AS n_outside
        FROM embeddings
    """


@query(
    "array_value_histogram",
    oracle=_ahist_sql(),
    tags=("scalar", "array", "embeddings"),
)
def array_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-ROW VALUE HISTOGRAM: each embedding vector bucketed into 8
    fixed bins over [-0.6, 0.6) plus an outside-range count — the
    per-vector distribution fingerprint (quantization codebooks and
    activation audits both start here), computed entirely with array
    lambdas: no explode, no shuffle, exact integer counts (bin edges
    are compared in double — identical literals, identical
    comparisons on both engines). Order statistics sibling:
    ``array_sorted_order_stats`` (r06)."""
    em = load_table(spark, sf_dir, "embeddings")
    width = (AHIST_HI - AHIST_LO) / AHIST_BINS
    x = F.col("embedding")

    def in_bin(lo: float, hi: float):
        # closure factory: a plain default-arg lambda would present 3
        # parameters and trip PySpark's higher-order-function arity check
        return lambda v: (v.cast("double") >= lo) & (v.cast("double") < hi)

    cols = [
        F.size(F.filter(x, in_bin(AHIST_LO + i * width,
                                  AHIST_LO + (i + 1) * width)))
        .cast("bigint")
        .alias(f"bin{i}")
        for i in range(AHIST_BINS)
    ]
    outside = (
        F.size(
            F.filter(
                x,
                lambda v: (v.cast("double") < AHIST_LO)
                | (v.cast("double") >= AHIST_HI),
            )
        )
        .cast("bigint")
        .alias("n_outside")
    )
    return em.select("vec_id", *cols, outside)


# ---------------------------------------------------------------------------
# map: key/value transforms with exact integer arithmetic
# ---------------------------------------------------------------------------


@query(
    "scalar_map_transform_arith",
    oracle="""
        WITH m AS (
            SELECT o_orderkey,
                   o_orderkey % 5 AS a, o_orderkey % 7 AS b, o_orderkey % 9 AS c
            FROM orders
        )
        SELECT o_orderkey,
               a * 10     AS a_scaled,
               b * 10     AS b_scaled,
               c * 10     AS c_scaled,
               a + b + c  AS v_total,
               CAST(CASE WHEN a >= 3 THEN 1 ELSE 0 END
                    + CASE WHEN b >= 3 THEN 1 ELSE 0 END
                    + CASE WHEN c >= 3 THEN 1 ELSE 0 END AS BIGINT) AS n_big
        FROM m
    """,
    tags=("scalar", "map", "orders"),
)
def scalar_map_transform_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MAP TRANSFORM arithmetic: build a 3-key map per row, scale every
    value with ``transform_values``, total them by folding
    ``map_values``, and count entries passing a predicate with
    ``map_filter`` — the engine-side map algebra (merge/zip:
    ``scalar_map_zip_merge`` r06; aggregated histogram map:
    ``scalar_map_user_type_histogram``). The oracle states the same
    arithmetic on the scalar legs directly — two formulations, one
    integer answer; the map column itself never leaves the row."""
    o = load_table(spark, sf_dir, "orders")
    m = F.map_from_arrays(
        F.array(F.lit("a"), F.lit("b"), F.lit("c")),
        F.array(
            F.col("o_orderkey") % 5,
            F.col("o_orderkey") % 7,
            F.col("o_orderkey") % 9,
        ),
    )
    scaled = F.transform_values(m, lambda k, v: v * 10)
    total = F.aggregate(
        F.map_values(m), F.lit(0).cast("bigint"), lambda acc, v: acc + v
    )
    n_big = F.size(F.map_filter(m, lambda k, v: v >= 3)).cast("bigint")
    return o.select(
        "o_orderkey",
        F.element_at(scaled, "a").alias("a_scaled"),
        F.element_at(scaled, "b").alias("b_scaled"),
        F.element_at(scaled, "c").alias("c_scaled"),
        total.alias("v_total"),
        n_big.alias("n_big"),
    )


# ---------------------------------------------------------------------------
# minhash: signature-based containment estimate vs exact containment
# ---------------------------------------------------------------------------

MHC_SAMPLE_MOD = 25  # estimate checked on doc pairs (i, i+1), i % 25 == 0


def _mh_containment_sql() -> str:
    from big_data_audio_classification_spark.operators.dedup import (
        MINHASH_K,
        _minhash_sql,
    )

    agree = " + ".join(
        f"CASE WHEN a.m{j} = b.m{j} THEN 1 ELSE 0 END" for j in range(MINHASH_K)
    )
    return f"""
        WITH sig AS ({_minhash_sql()}),
        toks AS (
            SELECT doc_id,
                   list_distinct(list_filter(string_split(text, ' '),
                                             t -> t <> '')) AS ts
            FROM documents
        ),
        pairs AS (
            SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                   CAST(({agree}) AS BIGINT) AS n_agree
            FROM sig a JOIN sig b ON b.doc_id = a.doc_id + 1
            WHERE a.doc_id % {MHC_SAMPLE_MOD} = 0
        ),
        exact AS (
            SELECT p.id_a, p.id_b, p.n_agree,
                   CAST(len(list_intersect(ta.ts, tb.ts)) AS BIGINT) AS n_inter,
                   CAST(LEAST(len(ta.ts), len(tb.ts)) AS BIGINT)     AS min_sz
            FROM pairs p
            JOIN toks ta ON ta.doc_id = p.id_a
            JOIN toks tb ON tb.doc_id = p.id_b
        )
        SELECT id_a, id_b, n_agree, n_inter, min_sz,
               ROUND(CAST(n_agree AS DOUBLE) / {MINHASH_K}, 6)
                   AS jaccard_est,
               ROUND(CAST(n_inter AS DOUBLE) / min_sz, 6)
                   AS containment_exact
        FROM exact
    """


@query(
    "dedup_minhash_containment_est",
    oracle=_mh_containment_sql(),
    tags=("dedup", "minhash", "documents"),
)
def dedup_minhash_containment_est(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-vs-CONTAINMENT calibration on sampled adjacent pairs:
    signature agreement estimates JACCARD, but near-dup policy often
    wants CONTAINMENT (|A∩B|/min — a short doc embedded in a long one
    scores high containment, low Jaccard); this query reports both on
    the same pairs so the gap is measured, not assumed (the tuning
    sibling of ``dedup_minhash_jaccard_estimate``, r06 green; the
    production containment engine is ``dedup_containment_join``).
    Signatures come from the one shared pass; exact sets only for the
    sampled pairs (doc_id % 25 == 0 with its successor) — the verify
    side stays O(sample), integers + two single divisions."""
    from big_data_audio_classification_spark.operators.dedup import (
        MINHASH_K,
        minhash_signature,
        tokens_col,
    )

    d = load_table(spark, sf_dir, "documents")
    sig = minhash_signature(d, "doc_id", "text")
    a = sig.alias("a")
    b = sig.alias("b")
    agree = None
    for j in range(MINHASH_K):
        t = F.when(F.col(f"a.m{j}") == F.col(f"b.m{j}"), 1).otherwise(0)
        agree = t if agree is None else agree + t
    pairs = (
        a.join(b, F.col("b.doc_id") == F.col("a.doc_id") + 1)
        .filter(F.col("a.doc_id") % MHC_SAMPLE_MOD == 0)
        .select(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
            agree.cast("bigint").alias("n_agree"),
        )
    )
    toks = d.select(
        "doc_id", F.array_distinct(tokens_col(F.col("text"))).alias("ts")
    )
    ta, tb = toks.alias("ta"), toks.alias("tb")
    exact = (
        pairs.join(ta, F.col("ta.doc_id") == F.col("id_a"))
        .join(tb, F.col("tb.doc_id") == F.col("id_b"))
        .select(
            "id_a", "id_b", "n_agree",
            F.size(F.array_intersect(F.col("ta.ts"), F.col("tb.ts")))
            .cast("bigint")
            .alias("n_inter"),
            F.least(F.size("ta.ts"), F.size("tb.ts"))
            .cast("bigint")
            .alias("min_sz"),
        )
    )
    return exact.select(
        "id_a", "id_b", "n_agree", "n_inter", "min_sz",
        F.round(F.col("n_agree").cast("double") / MINHASH_K, 6).alias(
            "jaccard_est"
        ),
        F.round(F.col("n_inter").cast("double") / F.col("min_sz"), 6).alias(
            "containment_exact"
        ),
    )


# ---------------------------------------------------------------------------
# lsh: candidate-pair multiplicity profile (how many bands agree)
# ---------------------------------------------------------------------------


def _lsh_multiplicity_sql() -> str:
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
        hits AS (
            SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                   CAST(COUNT(*) AS BIGINT) AS n_bands_agree
            FROM bands a JOIN bands b
              ON a.band_id = b.band_id AND a.band_hash = b.band_hash
             AND a.doc_id < b.doc_id
            GROUP BY a.doc_id, b.doc_id
        )
        SELECT n_bands_agree,
               CAST(COUNT(*) AS BIGINT) AS n_pairs
        FROM hits GROUP BY n_bands_agree
    """


@query(
    "dedup_lsh_band_multiplicity",
    oracle=_lsh_multiplicity_sql(),
    tags=("dedup", "lsh", "report", "documents"),
)
def dedup_lsh_band_multiplicity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH BAND-MULTIPLICITY profile: candidate pairs histogrammed by
    HOW MANY of the 4 bands they collide in — multiplicity ≈ 4 means
    near-identical signatures (true dups), multiplicity 1 is the
    S-curve's noisy tail; the distribution tells you whether a
    keep-first pass can trust single-band hits or must verify
    (bucket-size pricing: ``dedup_lsh_bucket_profile``; config sweep:
    ``dedup_minhash_band_sweep``). One signature pass, one band
    equi-join, pair multiplicity via count — output ≤ 4 rows."""
    from big_data_audio_classification_spark.operators.dedup import (
        LSH_BANDS,
        LSH_ROWS,
        minhash_signature,
    )

    d = load_table(spark, sf_dir, "documents")
    sig = minhash_signature(d, "doc_id", "text")
    bands = sig.select(
        "doc_id",
        F.posexplode(
            F.array(
                *[
                    F.concat_ws(
                        "_",
                        *[F.col(f"m{b * LSH_ROWS + r}") for r in range(LSH_ROWS)],
                    )
                    for b in range(LSH_BANDS)
                ]
            )
        ).alias("band_id", "band_hash"),
    )
    a, b = bands.alias("a"), bands.alias("b")
    hits = (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b")
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_bands_agree"))
    )
    return hits.groupBy("n_bands_agree").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs")
    )


# ---------------------------------------------------------------------------
# simhash: leave-one-token-out sensitivity
# ---------------------------------------------------------------------------

SHS_SAMPLE_MOD = 10  # sensitivity computed for doc_id % 10 == 0


def _simhash_sensitivity_sql() -> str:
    from big_data_audio_classification_spark.operators.dedup import (
        _SQL_TOKHASH,
        _SQL_TOKENS,
    )

    bit_sums = ",\n               ".join(
        f"SUM(CASE WHEN (hv >> {i}) & 1 = 1 THEN 1 ELSE -1 END) AS b{i}"
        for i in range(32)
    )
    recombine = " + ".join(
        f"(CASE WHEN b{i} > 0 THEN CAST({1 << i} AS BIGINT) ELSE 0 END)"
        for i in range(32)
    )
    drop_sums = ",\n               ".join(
        f"""SUM(CASE WHEN rn = 1 THEN 0
                WHEN (hv >> {i}) & 1 = 1 THEN 1 ELSE -1 END) AS b{i}"""
        for i in range(32)
    )
    return f"""
        WITH docs AS (
            SELECT doc_id, text FROM documents
            WHERE doc_id % {SHS_SAMPLE_MOD} = 0
        ),
        toks AS (
            SELECT doc_id,
                   UNNEST({_SQL_TOKENS}) AS tok,
                   CAST(generate_subscripts({_SQL_TOKENS}, 1) AS BIGINT) AS rn
            FROM docs
        ),
        h AS (SELECT doc_id, rn, {_SQL_TOKHASH} AS hv FROM toks),
        full_bits AS (
            SELECT doc_id, {bit_sums} FROM h GROUP BY doc_id
        ),
        full_sh AS (SELECT doc_id, {recombine} AS sh FROM full_bits),
        drop_bits AS (
            SELECT doc_id, {drop_sums} FROM h GROUP BY doc_id
        ),
        drop_sh AS (SELECT doc_id, {recombine} AS sh FROM drop_bits)
        SELECT f.doc_id,
               CAST(bit_count(xor(f.sh, d.sh)) AS BIGINT) AS hamming_flip,
               f.sh = d.sh                                AS stable
        FROM full_sh f JOIN drop_sh d ON f.doc_id = d.doc_id
    """


@query(
    "dedup_simhash_sensitivity",
    oracle=_simhash_sensitivity_sql(),
    tags=("dedup", "simhash", "documents"),
)
def dedup_simhash_sensitivity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash LEAVE-ONE-OUT sensitivity: recompute each sampled
    document's fingerprint with its FIRST token removed and report the
    Hamming flip — the stability property the whole near-dup scheme
    rests on (one edited token should flip few bits; a fingerprint
    that churns under single-token edits can't block near-dups).
    Both fingerprints come from ONE token-hash pass (the dropped
    token is masked in the aggregate, not re-tokenized); position
    comes from ``generate_subscripts``, and the flip count is pure
    integer popcount (balance: ``dedup_simhash_bit_balance``;
    collision schedule: ``dedup_simhash_prefix_schedule``)."""
    from big_data_audio_classification_spark.operators.dedup import (
        token_hash,
        tokens_col,
    )

    d = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") % SHS_SAMPLE_MOD == 0
    )
    toks = d.select(
        "doc_id",
        F.posexplode(tokens_col(F.col("text"))).alias("pos", "tok"),
    )
    h = toks.select(
        "doc_id",
        (F.col("pos") + 1).alias("rn"),
        token_hash(F.col("tok")).alias("hv"),
    )

    def sh_from(bits_df: DataFrame) -> DataFrame:
        rec = None
        for i in range(32):
            t = F.when(F.col(f"b{i}") > 0, F.lit(1 << i).cast("bigint")).otherwise(0)
            rec = t if rec is None else rec + t
        return bits_df.select("doc_id", rec.alias("sh"))

    full_bits = h.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(F.shiftright("hv", i).bitwiseAND(F.lit(1)) == 1, 1)
                .otherwise(-1)
            ).alias(f"b{i}")
            for i in range(32)
        ]
    )
    drop_bits = h.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(F.col("rn") == 1, 0)
                .when(F.shiftright("hv", i).bitwiseAND(F.lit(1)) == 1, 1)
                .otherwise(-1)
            ).alias(f"b{i}")
            for i in range(32)
        ]
    )
    f_sh = sh_from(full_bits).alias("f")
    d_sh = sh_from(drop_bits).alias("d")
    return f_sh.join(d_sh, F.col("f.doc_id") == F.col("d.doc_id")).select(
        F.col("f.doc_id").alias("doc_id"),
        F.bit_count(F.col("f.sh").bitwiseXOR(F.col("d.sh")))
        .cast("bigint")
        .alias("hamming_flip"),
        (F.col("f.sh") == F.col("d.sh")).alias("stable"),
    )


# ---------------------------------------------------------------------------
# tfidf: corpus rarity profile (idf histogram)
# ---------------------------------------------------------------------------


@query(
    "text_tfidf_rarity_profile",
    oracle="""
        WITH toks AS (
            SELECT DISTINCT doc_id,
                   UNNEST(list_filter(string_split(text, ' '),
                                      t -> t <> '')) AS tok
            FROM documents
        ),
        df AS (
            SELECT tok, CAST(COUNT(*) AS BIGINT) AS df
            FROM toks GROUP BY tok
        ),
        n AS (SELECT CAST(COUNT(DISTINCT doc_id) AS DOUBLE) AS n_docs
              FROM toks)
        SELECT CAST(FLOOR(LN(n.n_docs / df.df)) AS BIGINT) AS idf_bucket,
               CAST(COUNT(*) AS BIGINT)                    AS n_terms,
               CAST(MIN(df.df) AS BIGINT)                  AS min_df,
               CAST(MAX(df.df) AS BIGINT)                  AS max_df
        FROM df, n
        GROUP BY FLOOR(LN(n.n_docs / df.df))
    """,
    tags=("text", "tfidf", "documents"),
)
def text_tfidf_rarity_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CORPUS RARITY PROFILE: vocabulary histogrammed by ⌊idf⌋ — how
    much of the vocabulary is common glue (idf≈0) vs discriminative
    tail — the first diagnostic before committing tf-idf/BM25 weights
    or a stop-list (scorers: ``text_bm25_rank``,
    ``text_tfidf_query_rank`` r06). df counts are exact integers from
    one DISTINCT(doc,term) pass; idf is one LN per TERM (deterministic
    row-local float) floored into integer buckets, so the output is
    integer-exact. Map-side-combined; output = O(distinct buckets)."""
    from big_data_audio_classification_spark.operators.dedup import tokens_col

    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.explode(tokens_col(F.col("text"))).alias("tok")
    ).distinct()
    df = toks.groupBy("tok").agg(F.count(F.lit(1)).cast("bigint").alias("df"))
    n = toks.agg(F.countDistinct("doc_id").cast("double").alias("n_docs"))
    return (
        df.crossJoin(F.broadcast(n))
        .groupBy(
            F.floor(F.log(F.col("n_docs") / F.col("df")))
            .cast("bigint")
            .alias("idf_bucket")
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_terms"),
            F.min("df").cast("bigint").alias("min_df"),
            F.max("df").cast("bigint").alias("max_df"),
        )
    )


# ---------------------------------------------------------------------------
# lm: Good-Turing count-of-counts table
# ---------------------------------------------------------------------------

GT_MAX_R = 10


@query(
    "text_lm_good_turing",
    oracle=f"""
        WITH toks AS (
            SELECT doc_id,
                   UNNEST(list_filter(string_split(text, ' '),
                                      t -> t <> '')) AS tok
            FROM documents
        ),
        tf AS (SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS r
               FROM toks GROUP BY doc_id, tok),
        coc AS (
            SELECT r, CAST(COUNT(*) AS BIGINT) AS n_r
            FROM tf WHERE r <= {GT_MAX_R + 1} GROUP BY r
        )
        SELECT a.r, a.n_r,
               ROUND((a.r + 1.0) * COALESCE(b.n_r, 0) / a.n_r, 6)
                   AS r_star
        FROM coc a LEFT JOIN coc b ON b.r = a.r + 1
        WHERE a.r <= {GT_MAX_R}
    """,
    tags=("text", "lm", "documents"),
)
def text_lm_good_turing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GOOD-TURING count-of-counts at the DOCUMENT level: N_r = how
    many (document, term) pairs have within-document frequency exactly
    r, for r ≤ 10, and the smoothed count r* = (r+1)·N_{r+1}/N_r —
    the frequency-of-frequencies table underpinning every discounting
    scheme (absolute discounting: ``text_lm_absolute_discount``; JM
    interpolation: ``text_lm_jelinek_mercer``). Document-level rather
    than corpus-level because this corpus's small vocabulary makes
    every corpus count huge — the doc-level table is the one a
    per-document LM actually discounts with. Two exact-integer
    aggregations + a 1-step self-join on r; r* is one fixed-order
    division per row. Output ≤ 10 rows at any SF."""
    from big_data_audio_classification_spark.operators.dedup import tokens_col

    d = load_table(spark, sf_dir, "documents")
    tf = (
        d.select("doc_id", F.explode(tokens_col(F.col("text"))).alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).cast("bigint").alias("r"))
    )
    coc = (
        tf.filter(F.col("r") <= GT_MAX_R + 1)
        .groupBy("r")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_r"))
    )
    a, b = coc.alias("a"), coc.alias("b")
    return (
        a.join(b, F.col("b.r") == F.col("a.r") + 1, "left")
        .filter(F.col("a.r") <= GT_MAX_R)
        .select(
            F.col("a.r").alias("r"),
            F.col("a.n_r").alias("n_r"),
            F.round(
                (F.col("a.r") + 1.0)
                * F.coalesce(F.col("b.n_r"), F.lit(0))
                / F.col("a.n_r"),
                6,
            ).alias("r_star"),
        )
    )


# ---------------------------------------------------------------------------
# ivf: nprobe cost model from the probe schedule x cell sizes
# ---------------------------------------------------------------------------

IVF_COST_QUERY_MOD = 40


def _ivf_cost_sql() -> str:
    from big_data_audio_classification_spark.operators.similarity import IVF_CELLS

    return f"""
        WITH c AS (SELECT vec_id AS cell_id, embedding FROM embeddings
                   WHERE vec_id < {IVF_CELLS}),
        d AS (
            SELECT e.vec_id, c.cell_id,
                   list_sum(list_transform(list_zip(c.embedding, e.embedding),
                            p -> (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))
                               * (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))))
                       AS d2
            FROM embeddings e CROSS JOIN c
        ),
        assign AS (
            SELECT vec_id, cell_id FROM (
                SELECT vec_id, cell_id,
                       ROW_NUMBER() OVER (PARTITION BY vec_id
                                          ORDER BY d2, cell_id) AS rn
                FROM d) WHERE rn = 1
        ),
        sizes AS (SELECT cell_id, CAST(COUNT(*) AS BIGINT) AS sz
                  FROM assign GROUP BY cell_id),
        sched AS (
            SELECT vec_id, cell_id,
                   ROW_NUMBER() OVER (PARTITION BY vec_id
                                      ORDER BY d2, cell_id) AS probe_rank
            FROM d WHERE vec_id % {IVF_COST_QUERY_MOD} = 0
        )
        SELECT CAST(p.nprobe AS BIGINT) AS nprobe,
               CAST(COUNT(DISTINCT s.vec_id) AS BIGINT)  AS n_queries,
               CAST(SUM(z.sz) AS BIGINT)                 AS total_scanned,
               CAST(SUM(z.sz) // COUNT(DISTINCT s.vec_id) AS BIGINT)
                                                         AS avg_scanned
        FROM sched s
        JOIN sizes z ON z.cell_id = s.cell_id,
             (SELECT UNNEST(range(1, 5)) AS nprobe) p
        WHERE s.probe_rank <= p.nprobe
        GROUP BY p.nprobe
    """


@query(
    "sim_ivf_nprobe_cost_model",
    oracle=_ivf_cost_sql(),
    tags=("similarity", "ivf", "embeddings"),
)
def sim_ivf_nprobe_cost_model(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF nprobe COST MODEL: for nprobe = 1..4, the exact number of
    vectors a probe-limited search scans (probe schedule × actual cell
    populations) — the latency side of the recall/latency trade whose
    recall side is ``sim_ivf_nprobe_sweep`` (r05) and whose schedule is
    ``sim_ivf_probe_schedule`` (r07 window). Broadcast centroids,
    map-only assignment, the ≤4-row-per-query schedule joined to the
    8-row size table — all integer counts, output = 4 rows."""
    from big_data_audio_classification_spark.functions.vector import (
        l2_dist_sq,
        to_double,
    )
    from big_data_audio_classification_spark.operators.similarity import IVF_CELLS

    em = load_table(spark, sf_dir, "embeddings")
    cents = em.filter(F.col("vec_id") < IVF_CELLS).select(
        F.col("vec_id").alias("cell_id"), F.col("embedding").alias("c_emb")
    )
    d2 = l2_dist_sq(to_double(F.col("c_emb")), to_double(F.col("embedding")))
    scored = em.crossJoin(F.broadcast(cents)).select(
        "vec_id", "cell_id", d2.alias("d2s")
    )
    w = Window.partitionBy("vec_id").orderBy("d2s", "cell_id")
    ranked = scored.select(
        "vec_id", "cell_id", F.row_number().over(w).alias("rn")
    )
    assign = ranked.filter(F.col("rn") == 1)
    sizes = assign.groupBy("cell_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("sz")
    )
    sched = ranked.filter(F.col("vec_id") % IVF_COST_QUERY_MOD == 0).select(
        "vec_id", "cell_id", F.col("rn").alias("probe_rank")
    )
    nprobes = F.broadcast(
        spark.range(1, 5).select(F.col("id").alias("nprobe"))
    )
    return (
        sched.join(F.broadcast(sizes), "cell_id")
        .crossJoin(nprobes)
        .filter(F.col("probe_rank") <= F.col("nprobe"))
        .groupBy(F.col("nprobe").cast("bigint").alias("nprobe"))
        .agg(
            F.countDistinct("vec_id").cast("bigint").alias("n_queries"),
            F.sum("sz").cast("bigint").alias("total_scanned"),
            # floor division on BOTH engines: a bare double->bigint cast
            # truncates on Spark but rounds on DuckDB
            F.floor(F.sum("sz") / F.countDistinct("vec_id"))
            .cast("bigint")
            .alias("avg_scanned"),
        )
    )


# ---------------------------------------------------------------------------
# feature-selection: Fisher score over fixed-point class moments
# ---------------------------------------------------------------------------

FISHER_DIMS = 8
FISHER_Q = 10000


def _fisher_sql() -> str:
    xs = ", ".join(
        f"CAST(ROUND(CAST(embedding[{d + 1}] AS DOUBLE) * {FISHER_Q}) AS BIGINT)"
        f" AS x{d}"
        for d in range(FISHER_DIMS)
    )
    per_class = ", ".join(
        f"CAST(SUM(x{d}) AS DOUBLE) AS s{d}, "
        f"CAST(SUM(x{d} * x{d}) AS DOUBLE) AS ss{d}"
        for d in range(FISHER_DIMS)
    )
    glob = ", ".join(
        f"CAST(SUM(x{d}) AS DOUBLE) AS gs{d}" for d in range(FISHER_DIMS)
    )
    legs = "\n        UNION ALL\n        ".join(
        f"""SELECT {d} AS dim,
                   SUM(n * (s{d} / n - g.gs{d} / g.n_tot)
                         * (s{d} / n - g.gs{d} / g.n_tot)) AS between_w,
                   SUM(ss{d} - s{d} * s{d} / n)            AS within_w
            FROM cls, g"""
        for d in range(FISHER_DIMS)
    )
    return f"""
        WITH base AS (
            SELECT CAST(label AS BIGINT) AS y, {xs} FROM embeddings
        ),
        cls AS (
            SELECT y, CAST(COUNT(*) AS DOUBLE) AS n, {per_class}
            FROM base GROUP BY y
        ),
        g AS (
            SELECT CAST(COUNT(*) AS DOUBLE) AS n_tot, {glob} FROM base
        ),
        scores AS (
        {legs}
        )
        SELECT CAST(dim AS BIGINT) AS dim,
               ROUND(between_w / within_w, 6) AS fisher_score,
               CAST(ROW_NUMBER() OVER (
                   ORDER BY between_w / within_w DESC, dim) AS BIGINT) AS rank
        FROM scores
    """


@query(
    "ml_fisher_score_selection",
    oracle=_fisher_sql(),
    tags=("ml", "feature-selection", "embeddings"),
)
def ml_fisher_score_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FISHER SCORE ranking: between-class over within-class scatter
    per dimension — the LDA-flavored filter metric completing the
    selection family (ANOVA-F r06, chi2 and variance-ratio stock, mRMR
    tranche 1). Same bit-stability discipline as ``ml_mrmr_feature_
    rank``: per-class sufficient statistics accumulate FIXED-POINT
    integers (x → round(x·10⁴)), so the only floats are fixed-order
    expressions over exact per-class sums; the 10-class scatter sums
    iterate over the tiny class frame in deterministic per-dim legs.
    One scan + one 10-row class aggregate at any SF."""
    em = load_table(spark, sf_dir, "embeddings")
    base = em.select(
        F.col("label").cast("bigint").alias("y"),
        *[
            F.round(F.col("embedding").getItem(d).cast("double") * FISHER_Q)
            .cast("bigint")
            .alias(f"x{d}")
            for d in range(FISHER_DIMS)
        ],
    )
    cls_aggs = [F.count(F.lit(1)).cast("double").alias("n")]
    for d in range(FISHER_DIMS):
        x = F.col(f"x{d}")
        cls_aggs += [
            F.sum(x).cast("double").alias(f"s{d}"),
            F.sum(x * x).cast("double").alias(f"ss{d}"),
        ]
    cls = base.groupBy("y").agg(*cls_aggs)
    g = base.agg(
        F.count(F.lit(1)).cast("double").alias("n_tot"),
        *[
            F.sum(f"x{d}").cast("double").alias(f"gs{d}")
            for d in range(FISHER_DIMS)
        ],
    )
    legs = []
    for d in range(FISHER_DIMS):
        n = F.col("n")
        mu_d = F.col(f"s{d}") / n
        gmu = F.col(f"gs{d}") / F.col("n_tot")
        legs.append(
            cls.crossJoin(F.broadcast(g)).agg(
                F.lit(d).cast("bigint").alias("dim"),
                F.sum(n * (mu_d - gmu) * (mu_d - gmu)).alias("between_w"),
                F.sum(
                    F.col(f"ss{d}") - F.col(f"s{d}") * F.col(f"s{d}") / n
                ).alias("within_w"),
            )
        )
    scores = legs[0]
    for leg in legs[1:]:
        scores = scores.unionByName(leg)
    w = Window.orderBy((F.col("between_w") / F.col("within_w")).desc(), "dim")
    return scores.select(
        "dim",
        F.round(F.col("between_w") / F.col("within_w"), 6).alias(
            "fisher_score"
        ),
        F.row_number().over(w).cast("bigint").alias("rank"),
    )


# ---------------------------------------------------------------------------
# encoding: hashing-trick bucket encoding with collision census
# ---------------------------------------------------------------------------

HASH_ENC_BUCKETS = 16


@query(
    "ml_hashing_trick_encoding",
    oracle=f"""
        WITH keys AS (
            SELECT DISTINCT o_orderpriority AS cat FROM orders
        ),
        hashed AS (
            SELECT cat,
                   CAST(('0x' || substr(md5(cat), 1, 8)) AS BIGINT)
                       % {HASH_ENC_BUCKETS} AS bucket
            FROM keys
        ),
        rows_b AS (
            SELECT h.bucket, CAST(COUNT(*) AS BIGINT) AS n_rows
            FROM orders o JOIN hashed h ON o.o_orderpriority = h.cat
            GROUP BY h.bucket
        )
        SELECT h.bucket,
               CAST(COUNT(*) AS BIGINT)        AS n_cats,
               COUNT(*) > 1                    AS collided,
               string_agg(h.cat, ',' ORDER BY h.cat) AS cats,
               MAX(r.n_rows)                   AS n_rows
        FROM hashed h JOIN rows_b r ON r.bucket = h.bucket
        GROUP BY h.bucket
    """,
    tags=("ml", "encoding", "orders"),
)
def ml_hashing_trick_encoding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HASHING-TRICK encoding with an honest COLLISION CENSUS: each
    category maps to md5-hash mod 16 (the portable scheme — NOT
    Spark's murmur, so the oracle reproduces it exactly), and the
    report shows which buckets collide, what they absorbed, and the
    row mass they carry — the dimensionality-vs-collision trade
    ``ml_feature_hashing`` (r07 window) makes implicitly, made
    visible. Distinct-key frame is tiny (broadcast); row counts ride
    one keyed aggregate. All integers + sorted string_agg."""
    from big_data_audio_classification_spark.operators.dedup import token_hash

    o = load_table(spark, sf_dir, "orders")
    keys = o.select(F.col("o_orderpriority").alias("cat")).distinct()
    hashed = keys.select(
        "cat", (token_hash(F.col("cat")) % HASH_ENC_BUCKETS).alias("bucket")
    )
    rows_b = (
        o.join(F.broadcast(hashed), o.o_orderpriority == hashed.cat)
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_rows"))
    )
    return (
        hashed.join(rows_b, "bucket")
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_cats"),
            (F.count(F.lit(1)) > 1).alias("collided"),
            F.array_join(F.sort_array(F.collect_list("cat")), ",").alias(
                "cats"
            ),
            F.max("n_rows").alias("n_rows"),
        )
    )


# ---------------------------------------------------------------------------
# reference: R18 keep-first vs keep-last dedup policy comparison
# ---------------------------------------------------------------------------


@query(
    "ref_dedup_keep_policy",
    oracle="""
        WITH g AS (
            SELECT lang, source,
                   CAST(MIN(doc_id) AS BIGINT) AS keep_first,
                   CAST(MAX(doc_id) AS BIGINT) AS keep_last,
                   CAST(COUNT(*) AS BIGINT)    AS n_members
            FROM documents GROUP BY lang, source
        )
        SELECT lang, source, keep_first, keep_last, n_members,
               keep_first <> keep_last AS policy_differs
        FROM g
    """,
    tags=("reference", "dedup", "documents"),
)
def ref_dedup_keep_policy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference R18 (drop_duplicates, `src/data_generator.py`)
    extended to the POLICY choice pandas hides: ``keep='first'`` vs
    ``keep='last'`` — undefined under distribution unless stated as
    MIN/MAX over an explicit key, which is exactly what this emits per
    (lang, source) group, plus whether the two policies disagree
    (they do whenever a group has >1 member — the point: a 100 TB
    dedup must pick a DETERMINISTIC keep rule, not a row-order
    accident; deterministic-min form certified as
    ``ref_dedup_by_key``). One keyed aggregate, no text movement."""
    d = load_table(spark, sf_dir, "documents")
    g = d.groupBy("lang", "source").agg(
        F.min("doc_id").cast("bigint").alias("keep_first"),
        F.max("doc_id").cast("bigint").alias("keep_last"),
        F.count(F.lit(1)).cast("bigint").alias("n_members"),
    )
    return g.select(
        "lang", "source", "keep_first", "keep_last", "n_members",
        (F.col("keep_first") != F.col("keep_last")).alias("policy_differs"),
    )


# ---------------------------------------------------------------------------
# range-join: sessions contained in calendar weeks (bucketed containment)
# ---------------------------------------------------------------------------


@query(
    "join_range_week_containment",
    oracle=f"""
        WITH x AS (
            SELECT user_id, epoch_us(ts) AS t,
                   CASE WHEN epoch_us(ts)
                             - LAG(epoch_us(ts)) OVER (PARTITION BY user_id
                                                       ORDER BY ts, event_id)
                             > 1800000000
                        OR LAG(epoch_us(ts)) OVER (PARTITION BY user_id
                                                   ORDER BY ts, event_id)
                           IS NULL
                        THEN 1 ELSE 0 END AS new_s
            FROM events
        ),
        s AS (
            SELECT user_id, t,
                   SUM(new_s) OVER (PARTITION BY user_id
                                    ORDER BY t ROWS UNBOUNDED PRECEDING)
                       AS session_no
            FROM x
        ),
        sess AS (
            SELECT user_id, session_no,
                   MIN(t) AS lo, MAX(t) AS hi
            FROM s GROUP BY user_id, session_no
        ),
        -- epoch day 0 (1970-01-01) was a Thursday; align weeks to Monday
        wk AS (
            SELECT *, (lo // 86400000000 + 3) // 7 AS week_lo,
                      (hi // 86400000000 + 3) // 7 AS week_hi
            FROM sess
        )
        SELECT CAST(week_lo AS BIGINT)            AS week_idx,
               CAST(COUNT(*) AS BIGINT)           AS n_contained,
               CAST(SUM((hi - lo) // 1000000) AS BIGINT) AS contained_seconds
        FROM wk WHERE week_lo = week_hi
        GROUP BY week_lo
    """,
    tags=("relational", "join", "range-join", "events", "session"),
)
def join_range_week_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERVAL-IN-INTERVAL CONTAINMENT, bucket form: gap-sessionized
    intervals assigned to the Monday-aligned calendar week that fully
    CONTAINS them (week_lo == week_hi — a session spanning a week
    boundary belongs to no week) — the containment variant of the
    overlap family (``join_range_month_overlap`` r06,
    ``join_range_point_in_interval`` tranche 1). The week index is
    pure integer epoch-day arithmetic, so the 'join' to the week
    dimension degenerates to a groupBy on a computed key — the
    cheapest possible range join, and exactly what a 100 TB plan
    should reduce containment to when one side is a regular calendar
    grid. All integers."""
    e = load_table(spark, sf_dir, "events")
    wo = Window.partitionBy("user_id").orderBy("ts", "event_id")
    t = F.unix_micros("ts")
    x = e.select(
        "user_id",
        t.alias("t"),
        F.when(
            F.lag(t).over(wo).isNull() | (t - F.lag(t).over(wo) > 1_800_000_000),
            1,
        )
        .otherwise(0)
        .alias("new_s"),
    )
    ws = (
        Window.partitionBy("user_id")
        .orderBy("t")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    sess = (
        x.select("user_id", "t", F.sum("new_s").over(ws).alias("session_no"))
        .groupBy("user_id", "session_no")
        .agg(F.min("t").alias("lo"), F.max("t").alias("hi"))
    )
    day_us = 86_400_000_000
    wk_lo = (F.col("lo") / day_us).cast("bigint") + 3
    wk_hi = (F.col("hi") / day_us).cast("bigint") + 3
    wk = sess.select(
        "*",
        (wk_lo / 7).cast("bigint").alias("week_lo"),
        (wk_hi / 7).cast("bigint").alias("week_hi"),
    )
    return (
        wk.filter(F.col("week_lo") == F.col("week_hi"))
        .groupBy(F.col("week_lo").cast("bigint").alias("week_idx"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_contained"),
            F.sum(((F.col("hi") - F.col("lo")) / 1_000_000).cast("bigint"))
            .cast("bigint")
            .alias("contained_seconds"),
        )
    )


# ---------------------------------------------------------------------------
# skew: exact Gini imbalance of the key-frequency distribution
# ---------------------------------------------------------------------------


@query(
    "skew_key_gini_imbalance",
    oracle="""
        WITH f AS (
            SELECT user_id, CAST(COUNT(*) AS BIGINT) AS freq
            FROM events GROUP BY user_id
        ),
        r AS (
            SELECT freq,
                   ROW_NUMBER() OVER (ORDER BY freq, user_id) AS i,
                   COUNT(*) OVER () AS n,
                   SUM(freq) OVER () AS tot
            FROM f
        )
        SELECT CAST(MAX(n) AS BIGINT)                       AS n_keys,
               CAST(MAX(tot) AS BIGINT)                     AS n_rows,
               CAST(MAX(tot) - MIN(freq) * MAX(n) AS BIGINT) AS excess_mass,
               ROUND(CAST(SUM((2 * i - n - 1) * freq) AS DOUBLE)
                     / (CAST(MAX(n) AS DOUBLE) * MAX(tot)), 6) AS gini
        FROM r
    """,
    tags=("scale", "skew", "events"),
)
def skew_key_gini_imbalance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KEY-SKEW GINI: the Gini coefficient of the per-key row-count
    distribution via the exact rank formula Σ(2i−n−1)·f_i / (n·Σf) —
    0 = perfectly level shuffle, →1 = one hot key owns the stage (the
    scalar summary behind the per-key plan:
    ``skew_salt_factor_plan``; census: ``skew_key_frequency_profile``).
    The numerator is EXACT integer arithmetic, one float division at
    the end — bit-stable. The oracle states the textbook ranked-key
    form; the engine reads the SAME sum off the FREQUENCY LEDGER
    instead of ranking every key in one task (r11): keys tied at
    frequency v occupy c consecutive ranks after p lower-frequency
    keys, and the rank-sum over the tie group is invariant to the
    user_id tiebreak — Σ over the group of 2i·f = f·c·(2p+c+1) — so
    Σ(2i−n−1)·f = Σ f·c·(2p+c+1) − (n+1)·Σf, every term a per-ledger-
    row integer. The only unpartitioned window is the cumulative count
    over the ledger, whose size is bounded by DISTINCT frequency
    values (≤ max events per key), not by the key count."""
    e = load_table(spark, sf_dir, "events")
    f = e.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("freq")
    )
    g = f.groupBy("freq").agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    wcum = Window.orderBy("freq").rowsBetween(Window.unboundedPreceding, -1)
    led = g.withColumn("p", F.coalesce(F.sum("c").over(wcum), F.lit(0)))
    return led.agg(
        F.sum("c").alias("_n"),
        F.sum(F.col("freq") * F.col("c")).alias("_tot"),
        F.sum(
            F.col("freq") * F.col("c") * (2 * F.col("p") + F.col("c") + 1)
        ).alias("_s2"),
        F.min("freq").alias("_mn"),
    ).select(
        F.col("_n").cast("bigint").alias("n_keys"),
        F.col("_tot").cast("bigint").alias("n_rows"),
        (F.col("_tot") - F.col("_mn") * F.col("_n"))
        .cast("bigint")
        .alias("excess_mass"),
        F.round(
            (F.col("_s2") - (F.col("_n") + 1) * F.col("_tot")).cast("double")
            / (F.col("_n").cast("double") * F.col("_tot")),
            6,
        ).alias("gini"),
    )


# ---------------------------------------------------------------------------
# session: bounce rate by entry event type
# ---------------------------------------------------------------------------


@query(
    "events_session_bounce_rate",
    oracle="""
        WITH x AS (
            SELECT user_id, event_id, event_type, epoch_us(ts) AS t,
                   CASE WHEN epoch_us(ts)
                             - LAG(epoch_us(ts)) OVER (PARTITION BY user_id
                                                       ORDER BY ts, event_id)
                             > 1800000000
                        OR LAG(epoch_us(ts)) OVER (PARTITION BY user_id
                                                   ORDER BY ts, event_id)
                           IS NULL
                        THEN 1 ELSE 0 END AS new_s
            FROM events
        ),
        s AS (
            SELECT user_id, event_id, event_type, t,
                   SUM(new_s) OVER (PARTITION BY user_id
                                    ORDER BY t, event_id
                                    ROWS UNBOUNDED PRECEDING) AS session_no
            FROM x
        ),
        r2 AS (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, session_no
                                         ORDER BY t, event_id) AS rn2
            FROM s
        ),
        sess AS (
            SELECT user_id, session_no,
                   CAST(COUNT(*) AS BIGINT) AS depth,
                   MAX(CASE WHEN rn2 = 1 THEN event_type END) AS entry_type
            FROM r2 GROUP BY user_id, session_no
        )
        SELECT entry_type,
               CAST(COUNT(*) AS BIGINT)                    AS n_sessions,
               CAST(SUM(CASE WHEN depth = 1 THEN 1 ELSE 0 END) AS BIGINT)
                                                           AS n_bounces,
               ROUND(CAST(SUM(CASE WHEN depth = 1 THEN 1 ELSE 0 END)
                          AS DOUBLE) / COUNT(*), 6)        AS bounce_rate
        FROM sess GROUP BY entry_type
    """,
    tags=("events", "session", "window"),
)
def events_session_bounce_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BOUNCE RATE by session ENTRY TYPE: gap-sessionize (the house
    30-min rule), find each session's first event type (min over the
    (t, event_id) order — deterministic), and report how often a
    session of that entry type ends after ONE event — the
    landing-quality metric (duration side:
    ``events_session_duration_deciles``; funnel:
    ``events_session_funnel`` stock). All counts exact integers, one
    division per row; sessionization is the standard one-shuffle
    window pass."""
    e = load_table(spark, sf_dir, "events")
    wo = Window.partitionBy("user_id").orderBy("ts", "event_id")
    t = F.unix_micros("ts")
    x = e.select(
        "user_id", "event_id", "event_type", t.alias("t"),
        F.when(
            F.lag(t).over(wo).isNull() | (t - F.lag(t).over(wo) > 1_800_000_000),
            1,
        )
        .otherwise(0)
        .alias("new_s"),
    )
    ws = (
        Window.partitionBy("user_id")
        .orderBy("t", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    s = x.select(
        "user_id", "event_id", "event_type", "t",
        F.sum("new_s").over(ws).alias("session_no"),
    )
    sess = s.groupBy("user_id", "session_no").agg(
        F.count(F.lit(1)).cast("bigint").alias("depth"),
        F.min(F.struct("t", "event_id", "event_type"))
        .getField("event_type")
        .alias("entry_type"),
    )
    bounce = F.sum(F.when(F.col("depth") == 1, 1).otherwise(0))
    return sess.groupBy("entry_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_sessions"),
        bounce.cast("bigint").alias("n_bounces"),
        F.round(bounce.cast("double") / F.count(F.lit(1)), 6).alias(
            "bounce_rate"
        ),
    )


# ---------------------------------------------------------------------------
# udtf: running-prefix statistics over a vector
# ---------------------------------------------------------------------------

PREFIX_STATS_N = 6


@query(
    "udtf_prefix_running_stats",
    oracle=f"""
        WITH x AS (
            SELECT vec_id,
                   CAST(generate_subscripts(embedding, 1) AS BIGINT) AS pos,
                   CAST(UNNEST(embedding) AS DOUBLE) AS v
            FROM embeddings
        )
        SELECT vec_id, pos,
               ROUND(SUM(v) OVER w, 6)  AS run_sum,
               ROUND(MIN(v) OVER w, 6)  AS run_min,
               ROUND(MAX(v) OVER w, 6)  AS run_max
        FROM x
        WHERE pos <= {PREFIX_STATS_N}
        WINDOW w AS (PARTITION BY vec_id ORDER BY pos
                     ROWS UNBOUNDED PRECEDING)
    """,
    tags=("udtf", "embeddings"),
)
def udtf_prefix_running_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RUNNING-PREFIX stats UDTF: a Python table function walks each
    vector once, maintaining sum/min/max state, and emits the first
    6 prefix rows — per-row sequential state vs the oracle's
    window-function formulation (two independent statements of the
    running-aggregate semantics; delta sibling: ``udtf_array_deltas``).
    The Python running sum adds elements in index order — the same
    sequential order the oracle's ROWS UNBOUNDED PRECEDING frame
    accumulates in, so the floats match bitwise (float32→double
    widening is exact). Arrow-batched; ≤ 6 rows out per
    vector."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="pos long, run_sum double, run_min double, run_max double")
    class PrefixStats:
        def eval(self, emb):
            if not emb:
                return
            s = 0.0
            mn = mx = float(emb[0])
            for i in range(min(PREFIX_STATS_N, len(emb))):
                v = float(emb[i])
                s += v
                mn = min(mn, v)
                mx = max(mx, v)
                yield i + 1, round(s, 6), round(mn, 6), round(mx, 6)

    spark.udtf.register("prefix_stats", PrefixStats)
    load_table(spark, sf_dir, "embeddings").createOrReplaceTempView(
        "udtf_prefix_stats_in"
    )
    return spark.sql(
        """
        SELECT e.vec_id, p.pos, p.run_sum, p.run_min, p.run_max
        FROM udtf_prefix_stats_in e, LATERAL prefix_stats(e.embedding) p
        """
    )


# ---------------------------------------------------------------------------
# udaf/pandas: midhinge (quantile-interpolation-compatible kernel)
# ---------------------------------------------------------------------------


@query(
    "agg_pandas_udaf_midhinge",
    oracle="""
        SELECT o_orderstatus AS status,
               CAST(COUNT(*) AS BIGINT) AS n,
               ROUND((quantile_cont(o_totalprice, 0.25)
                      + quantile_cont(o_totalprice, 0.75)) / 2.0, 4)
                   AS midhinge
        FROM orders
        GROUP BY o_orderstatus
    """,
    tags=("aggregate", "udaf", "pandas", "robust", "orders"),
)
def agg_pandas_udaf_midhinge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MIDHINGE (mean of the hinges, (Q1+Q3)/2) per order status as a
    grouped-agg pandas UDF — the robust LOCATION estimator that
    ignores both tails entirely (Tukey's five-number vocabulary;
    spread siblings: IQR r07-stock, decile ratio tranche 1, MAD r07
    window). numpy's linear-interpolated percentile matches DuckDB's
    ``quantile_cont`` rule exactly, and the final expression is one
    fixed-order add-and-halve. At 100 TB swap the per-group buffer
    for ``agg_percentiles_twophase``. Row count rides through Arrow
    (Spark can't mix pandas and JVM aggregates in one agg)."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def midhinge(v: pd.Series) -> float:
        arr = v.to_numpy(dtype=np.float64)
        q25, q75 = np.percentile(arr, [25, 75], method="linear")
        return float((q25 + q75) / 2.0)

    @pandas_udf("long")
    def n_rows(v: pd.Series) -> int:
        return len(v)

    o = load_table(spark, sf_dir, "orders")
    return o.groupBy(F.col("o_orderstatus").alias("status")).agg(
        n_rows("o_totalprice").alias("n"),
        F.round(midhinge("o_totalprice"), 4).alias("midhinge"),
    )


# ---------------------------------------------------------------------------
# csv: fields containing the delimiter and quote characters
# ---------------------------------------------------------------------------


@query(
    "sink_csv_quoted_fields_roundtrip",
    oracle="""
        WITH d AS (
            SELECT doc_id,
                   source || ', "' || lang || '"' AS tricky,
                   n_chars
            FROM documents
        )
        SELECT CAST(COUNT(*) AS BIGINT)               AS n,
               CAST(SUM(n_chars) AS BIGINT)           AS total_chars,
               CAST(SUM(length(tricky)) AS BIGINT)    AS tricky_len,
               CAST(SUM(CASE WHEN tricky LIKE '%, "%' THEN 1 ELSE 0 END)
                    AS BIGINT)                        AS n_with_delim
        FROM d
    """,
    tags=("sink", "csv", "documents"),
)
def sink_csv_quoted_fields_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV QUOTING under fire: a synthetic field containing BOTH the
    delimiter (", ") and the quote character is written and read back
    with default RFC-4180 quoting/escaping — the round-trip that
    breaks naive writers; counts and character masses must survive
    the wire exactly (dialect family: options r03, gzip/quote-all/
    partitioned stock, TSV tranche 1). The oracle recomputes from the
    parquet truth; the roundtrip is the thing under test."""
    import os as _os

    from big_data_audio_classification_spark.scratch import (
        SCRATCH_DIR as _SCR,
    )

    path = _os.path.join(_SCR, "sink_csv_quoted_fields_roundtrip")
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(F.col("source"), F.lit(', "'), F.col("lang"), F.lit('"')).alias(
            "tricky"
        ),
        "n_chars",
    )
    d.write.mode("overwrite").option("header", True).csv(path)
    back = spark.read.csv(
        path, header=True, schema="doc_id long, tricky string, n_chars long"
    )
    return back.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
        F.sum(F.length("tricky")).cast("bigint").alias("tricky_len"),
        F.sum(F.when(F.col("tricky").like('%, "%'), 1).otherwise(0))
        .cast("bigint")
        .alias("n_with_delim"),
    )


# ---------------------------------------------------------------------------
# rolling: short/long rolling-sum ratio bands (exact integer core)
# ---------------------------------------------------------------------------

RATIO_SHORT = 6   # rows preceding for the short window (7-row frame)
RATIO_LONG = 27   # rows preceding for the long window (28-row frame)


@query(
    "window_rolling_sum_ratio",
    oracle=f"""
        WITH x AS (
            SELECT event_id, user_id, ts,
                   CAST(ROUND(value * 100) AS BIGINT) AS c
            FROM events
        ),
        s AS (
            SELECT event_id, user_id,
                   CAST(SUM(c) OVER ws AS BIGINT) AS s_short,
                   CAST(SUM(c) OVER wl AS BIGINT) AS s_long,
                   CAST(COUNT(*) OVER wl AS BIGINT) AS n_long
            FROM x
            WINDOW ws AS (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS BETWEEN {RATIO_SHORT} PRECEDING AND CURRENT ROW),
                   wl AS (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS BETWEEN {RATIO_LONG} PRECEDING AND CURRENT ROW)
        )
        SELECT event_id, user_id, s_short, s_long,
               CASE WHEN n_long > {RATIO_LONG}
                    THEN ROUND(4.0 * s_short / s_long, 6) END AS momentum,
               CASE WHEN n_long <= {RATIO_LONG} THEN 'warmup'
                    WHEN 4 * s_short * 10 > s_long * 12 THEN 'hot'
                    WHEN 4 * s_short * 10 < s_long * 8  THEN 'cold'
                    ELSE 'neutral' END AS band
        FROM s
    """,
    tags=("window", "rolling", "events"),
)
def window_rolling_sum_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SHORT/LONG rolling-sum MOMENTUM ratio (the 7-vs-28 moving-sum
    crossover, normalized by the 4× window-length factor) with banding
    — and the BAND DECISION made in EXACT INTEGER arithmetic
    (4·s_short·10 vs s_long·12 instead of ratio > 1.2), so the
    classification can never flip on a float ULP; only the reported
    ratio itself is a float (one division, after exact sums). Warmup
    rows (long window not yet full) are labeled honestly instead of
    emitting a biased ratio. Two frames over ONE shuffle (same
    partition/order); state O(window)."""
    e = load_table(spark, sf_dir, "events")
    c = F.round(F.col("value") * 100).cast("bigint")
    x = e.select("event_id", "user_id", "ts", c.alias("c"))
    ws = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-RATIO_SHORT, Window.currentRow)
    )
    wl = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-RATIO_LONG, Window.currentRow)
    )
    s = x.select(
        "event_id",
        "user_id",
        F.sum("c").over(ws).cast("bigint").alias("s_short"),
        F.sum("c").over(wl).cast("bigint").alias("s_long"),
        F.count(F.lit(1)).over(wl).cast("bigint").alias("n_long"),
    )
    full = F.col("n_long") > RATIO_LONG
    return s.select(
        "event_id",
        "user_id",
        "s_short",
        "s_long",
        F.when(full, F.round(4.0 * F.col("s_short") / F.col("s_long"), 6))
        .alias("momentum"),
        F.when(~full, "warmup")
        .when(4 * F.col("s_short") * 10 > F.col("s_long") * 12, "hot")
        .when(4 * F.col("s_short") * 10 < F.col("s_long") * 8, "cold")
        .otherwise("neutral")
        .alias("band"),
    )


# ---------------------------------------------------------------------------
# decomposition: weekday/weekend two-level additive split
# ---------------------------------------------------------------------------


@query(
    "analytics_weekpart_decomp",
    oracle="""
        WITH daily AS (
            SELECT CAST(o_orderdate AS DATE) AS d,
                   CASE WHEN dayofweek(CAST(o_orderdate AS DATE)) IN (0, 6)
                        THEN 'weekend' ELSE 'weekday' END AS part,
                   CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                        AS BIGINT) AS cents
            FROM orders GROUP BY 1, 2
        ),
        g AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
                     CAST(SUM(cents) AS BIGINT) AS total FROM daily),
        p AS (
            SELECT part, CAST(COUNT(*) AS BIGINT) AS nd,
                   CAST(SUM(cents) AS BIGINT) AS part_cents
            FROM daily GROUP BY part
        ),
        dev AS (
            SELECT d.part,
                   CAST(SUM(ABS(d.cents * p.nd - p.part_cents)) AS BIGINT)
                       AS sum_abs_dev_nd
            FROM daily d JOIN p ON d.part = p.part
            GROUP BY d.part
        )
        SELECT p.part,
               p.nd AS n_days,
               ROUND(CAST(p.part_cents AS DOUBLE) / p.nd / 100.0, 4)
                   AS part_mean,
               ROUND(CAST(p.part_cents AS DOUBLE) / p.nd / 100.0
                     - CAST(g.total AS DOUBLE) / g.n_days / 100.0, 4)
                   AS part_effect,
               ROUND(CAST(dev.sum_abs_dev_nd AS DOUBLE)
                     / p.nd / p.nd / 100.0, 4)
                   AS remainder_mad
        FROM p JOIN dev ON p.part = dev.part, g
    """,
    tags=("analytics", "decomposition", "timeseries", "orders"),
)
def analytics_weekpart_decomp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WEEKDAY/WEEKEND additive split — the coarsest seasonal
    decomposition (level + binary calendar effect + remainder), with
    the same exact-integer MAD discipline as the 7-level dow profile
    (``analytics_dow_additive_profile``): |cents·n − Σcents| stays
    integer, one division per output cell. Two tiny aggregates over
    the O(days) daily frame; the binary partition is where weekly
    seasonality analysis starts before spending 7 dof on full dow
    effects. (Spark dayofweek is 1=Sunday..7=Saturday; the oracle
    matches with DuckDB's 0/6.)"""
    o = load_table(spark, sf_dir, "orders")
    dow = F.dayofweek(F.to_date("o_orderdate"))
    daily = o.groupBy(
        F.to_date("o_orderdate").alias("d"),
        F.when(dow.isin(1, 7), "weekend").otherwise("weekday").alias("part"),
    ).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
        .cast("bigint")
        .alias("cents")
    )
    g = daily.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        F.sum("cents").cast("bigint").alias("total"),
    )
    p = daily.groupBy("part").agg(
        F.count(F.lit(1)).cast("bigint").alias("nd"),
        F.sum("cents").cast("bigint").alias("part_cents"),
    )
    dev = (
        daily.join(p, "part")
        .groupBy("part")
        .agg(
            F.sum(F.abs(F.col("cents") * F.col("nd") - F.col("part_cents")))
            .cast("bigint")
            .alias("sum_abs_dev_nd")
        )
    )
    return (
        p.join(dev, "part")
        .crossJoin(F.broadcast(g))
        .select(
            "part",
            F.col("nd").alias("n_days"),
            F.round(
                F.col("part_cents").cast("double") / F.col("nd") / 100.0, 4
            ).alias("part_mean"),
            F.round(
                F.col("part_cents").cast("double") / F.col("nd") / 100.0
                - F.col("total").cast("double") / F.col("n_days") / 100.0,
                4,
            ).alias("part_effect"),
            F.round(
                F.col("sum_abs_dev_nd").cast("double")
                / F.col("nd")
                / F.col("nd")
                / 100.0,
                4,
            ).alias("remainder_mad"),
        )
    )


# ---------------------------------------------------------------------------
# causal: instrumental-variable Wald estimator
# ---------------------------------------------------------------------------


@query(
    "stats_iv_wald_estimator",
    oracle="""
        WITH base AS (
            SELECT CAST(CASE WHEN c.c_custkey % 3 = 0 THEN 1 ELSE 0 END
                        AS BIGINT)                                  AS z,
                   CAST(CASE WHEN t.o_orderpriority IN ('1-URGENT', '2-HIGH')
                             OR c.c_custkey % 3 = 0 THEN 1 ELSE 0 END
                        AS BIGINT)                                  AS d,
                   CAST(ROUND(t.o_totalprice * 100) AS BIGINT)      AS cents
            FROM orders t JOIN customer c ON t.o_custkey = c.c_custkey
        ),
        s AS (
            SELECT CAST(SUM(z) AS BIGINT)                  AS n1,
                   CAST(SUM(1 - z) AS BIGINT)              AS n0,
                   CAST(SUM(z * cents) AS BIGINT)          AS y1,
                   CAST(SUM((1 - z) * cents) AS BIGINT)    AS y0,
                   CAST(SUM(z * d) AS BIGINT)              AS d1,
                   CAST(SUM((1 - z) * d) AS BIGINT)        AS d0
            FROM base
        )
        SELECT n1, n0,
               ROUND((CAST(y1 AS DOUBLE) / n1 - CAST(y0 AS DOUBLE) / n0)
                     / 100.0, 4)                               AS itt_dollars,
               ROUND(CAST(d1 AS DOUBLE) / n1
                     - CAST(d0 AS DOUBLE) / n0, 6)             AS first_stage,
               ROUND((CAST(y1 AS DOUBLE) / n1 - CAST(y0 AS DOUBLE) / n0)
                     / (CAST(d1 AS DOUBLE) / n1 - CAST(d0 AS DOUBLE) / n0)
                     / 100.0, 4)                               AS late_dollars
        FROM s
    """,
    tags=("stats", "causal", "inference", "orders"),
)
def stats_iv_wald_estimator(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INSTRUMENTAL-VARIABLE Wald estimator: instrument z (custkey
    divisibility — deterministic), endogenous treatment d (priority
    flag OR'd with the instrument so the first stage is strong by
    construction), outcome in cents. Reports the intent-to-treat
    effect, the first-stage compliance difference, and their ratio —
    the LATE (Wald) estimator completing the causal family
    (stratified ATE tranche 1, IPW r06, DiD/RDD window+stock). Six
    exact-integer sufficient statistics in ONE aggregate pass; every
    reported value is a fixed-order float expression over them."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    z = F.when(F.col("c_custkey") % 3 == 0, 1).otherwise(0).cast("bigint")
    dflag = (
        F.when(
            F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
            | (F.col("c_custkey") % 3 == 0),
            1,
        )
        .otherwise(0)
        .cast("bigint")
    )
    base = o.join(F.broadcast(c), o.o_custkey == c.c_custkey).select(
        z.alias("z"),
        dflag.alias("d"),
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
    )
    s = base.agg(
        F.sum("z").cast("bigint").alias("n1"),
        F.sum(1 - F.col("z")).cast("bigint").alias("n0"),
        F.sum(F.col("z") * F.col("cents")).cast("bigint").alias("y1"),
        F.sum((1 - F.col("z")) * F.col("cents")).cast("bigint").alias("y0"),
        F.sum(F.col("z") * F.col("d")).cast("bigint").alias("d1"),
        F.sum((1 - F.col("z")) * F.col("d")).cast("bigint").alias("d0"),
    )
    itt = F.col("y1").cast("double") / F.col("n1") - F.col("y0").cast(
        "double"
    ) / F.col("n0")
    fs = F.col("d1").cast("double") / F.col("n1") - F.col("d0").cast(
        "double"
    ) / F.col("n0")
    return s.select(
        "n1",
        "n0",
        F.round(itt / 100.0, 4).alias("itt_dollars"),
        F.round(fs, 6).alias("first_stage"),
        F.round(itt / fs / 100.0, 4).alias("late_dollars"),
    )


# ---------------------------------------------------------------------------
# audio-math: even/odd-phase band energy ratio per channel
# ---------------------------------------------------------------------------


@query(
    "audio_phase_energy_ratio",
    oracle="""
        WITH x AS (
            SELECT user_id, CAST(ROUND(value * 100) AS BIGINT) AS c,
                   ROW_NUMBER() OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS rn
            FROM events
        )
        SELECT user_id,
               CAST(SUM(CASE WHEN rn % 2 = 1 THEN c * c ELSE 0 END) AS BIGINT)
                   AS odd_energy,
               CAST(SUM(CASE WHEN rn % 2 = 0 THEN c * c ELSE 0 END) AS BIGINT)
                   AS even_energy,
               ROUND(CAST(SUM(CASE WHEN rn % 2 = 1 THEN c * c ELSE 0 END)
                          AS DOUBLE)
                     / SUM(CASE WHEN rn % 2 = 0 THEN c * c ELSE 0 END), 6)
                   AS phase_ratio
        FROM x GROUP BY user_id
    """,
    tags=("audio", "audio-math", "events"),
)
def audio_phase_energy_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EVEN/ODD-PHASE ENERGY split per channel: total energy carried
    by odd- vs even-indexed samples and their ratio — the aliasing
    sanity check run before a 2:1 decimation (``mm_wav_resample_sink``
    keeps even samples; a ratio far from 1 means the phases differ
    and naive decimation folds energy). Energies are EXACT integer
    cents² sums (map-side combined, no window needed beyond the
    row_number), ratio is one division — bit-stable. One shuffle
    keyed by channel."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    c = F.round(F.col("value") * 100).cast("bigint")
    x = e.select(
        "user_id", c.alias("c"), F.row_number().over(w).alias("rn")
    )
    cc = F.col("c") * F.col("c")
    odd = F.sum(F.when(F.col("rn") % 2 == 1, cc).otherwise(0))
    even = F.sum(F.when(F.col("rn") % 2 == 0, cc).otherwise(0))
    return x.groupBy("user_id").agg(
        odd.cast("bigint").alias("odd_energy"),
        even.cast("bigint").alias("even_energy"),
        F.round(odd.cast("double") / even, 6).alias("phase_ratio"),
    )


# ---------------------------------------------------------------------------
# mapInPandas: byte-level payload histogram (Arrow batch processing)
# ---------------------------------------------------------------------------

BYTE_BUCKETS = 16


@query(
    "mm_payload_byte_histogram",
    oracle=f"""
        WITH ch AS (
            SELECT doc_id, UNNEST(string_split_regex(text, '')) AS c
            FROM documents
        )
        SELECT CAST(ascii(c) // {BYTE_BUCKETS} AS BIGINT) AS bucket,
               CAST(COUNT(*) AS BIGINT)                   AS n_bytes,
               CAST(COUNT(DISTINCT doc_id) AS BIGINT)     AS n_docs
        -- ascii(c) < 128 pins the bytes==codepoints contract the Spark
        -- side asserts with payload.isascii(): a non-ASCII char would
        -- otherwise count 2+ UTF-8 bytes here vs one codepoint (r07
        -- advice) — with the guard, divergence becomes a loud Spark
        -- error instead of a silent hash mismatch
        FROM ch WHERE c <> '' AND ascii(c) < 128
        GROUP BY ascii(c) // {BYTE_BUCKETS}
    """,
    tags=("multimodal", "mapInPandas", "documents"),
)
def mm_payload_byte_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PAYLOAD BYTE HISTOGRAM via ``mapInPandas``: each Arrow batch of
    documents is scanned in Python as RAW BYTES (the opaque-payload
    discipline every binary-column pipeline needs — here the payload
    happens to be ASCII text so the oracle can restate it with
    ``ascii()``), emitting per-batch PARTIAL (bucket, count, doc-set)
    rows that one tiny groupBy folds — the map-side-combine shape that
    keeps the Python boundary O(batches), not O(bytes). The per-doc
    de-dup for n_docs rides the partials as distinct doc ids only for
    buckets the doc actually hits. All integers; decoders for real
    media formats are the stubbed step, the Spark-side plumbing here
    is the real contract (family: ``mm_metadata_stats``,
    ``mm_maparrow_bytelen``)."""
    from collections import Counter

    def batches(it):
        for pdf in it:
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                payload = text.encode("utf-8")
                # bytes==codepoints only holds for ASCII; the oracle
                # counts codepoints (ascii(c) < 128 guard), so fail
                # LOUDLY if the generator ever emits non-ASCII text
                # rather than silently diverging (r07 advice)
                assert text.isascii(), (
                    f"doc {doc_id}: non-ASCII text breaks the "
                    "byte==codepoint oracle contract"
                )
                cnt = Counter(b // BYTE_BUCKETS for b in payload)
                rows += [
                    (int(doc_id), int(bucket), int(n))
                    for bucket, n in cnt.items()
                ]
            if rows:
                yield pd.DataFrame(
                    rows, columns=["doc_id", "bucket", "partial"]
                )

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    partials = d.mapInPandas(
        batches, "doc_id long, bucket long, partial long"
    )
    return partials.groupBy("bucket").agg(
        F.sum("partial").cast("bigint").alias("n_bytes"),
        F.countDistinct("doc_id").cast("bigint").alias("n_docs"),
    )


# ---------------------------------------------------------------------------
# sql: the SQL PIVOT surface
# ---------------------------------------------------------------------------


@query(
    "sql_pivot_status_matrix",
    oracle="""
        SELECT o_orderpriority AS priority,
               CAST(COUNT(CASE WHEN o_orderstatus = 'F' THEN 1 END)
                    AS BIGINT) AS f_n,
               CAST(COUNT(CASE WHEN o_orderstatus = 'O' THEN 1 END)
                    AS BIGINT) AS o_n,
               CAST(COUNT(CASE WHEN o_orderstatus = 'P' THEN 1 END)
                    AS BIGINT) AS p_n,
               CAST(SUM(CASE WHEN o_orderstatus = 'F'
                        THEN CAST(ROUND(o_totalprice * 100) AS BIGINT)
                        ELSE 0 END) AS BIGINT) AS f_cents
        FROM orders
        GROUP BY o_orderpriority
    """,
    tags=("relational", "sql", "grouping", "orders"),
)
def sql_pivot_status_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SQL ``PIVOT`` clause surface: priority × status count/sum
    matrix written in Spark's native PIVOT syntax (``FROM ... PIVOT
    (agg FOR col IN (...))``) — the SQL-text form of the DataFrame
    ``pivot()`` certified in r02 (``agg_pivot_status``) — while the
    oracle states the universal conditional-aggregation rewrite every
    engine lowers PIVOT to. Exact integer cents; one shuffle, the IN
    list bounds the output columns statically (the 100 TB rule: never
    PIVOT on an unbounded value domain)."""
    load_table(spark, sf_dir, "orders").select(
        "o_orderpriority",
        "o_orderstatus",
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
    ).createOrReplaceTempView("sql_pivot_in")
    return spark.sql(
        """
        SELECT priority,
               coalesce(F_cnt, 0)   AS f_n,
               coalesce(O_cnt, 0)   AS o_n,
               coalesce(P_cnt, 0)   AS p_n,
               coalesce(F_cents, 0) AS f_cents
        FROM (
            SELECT * FROM (
                SELECT o_orderpriority AS priority, o_orderstatus, cents
                FROM sql_pivot_in
            )
            PIVOT (
                count(1) AS cnt, sum(cents) AS cents
                FOR o_orderstatus IN ('F' AS F, 'O' AS O, 'P' AS P)
            )
        )
        """
    ).select(
        "priority",
        F.col("f_n").cast("bigint").alias("f_n"),
        F.col("o_n").cast("bigint").alias("o_n"),
        F.col("p_n").cast("bigint").alias("p_n"),
        F.col("f_cents").cast("bigint").alias("f_cents"),
    )
