"""Round-9 pre-stock tranche 2: one fresh, never-certified carrier for
the REQUIRED_FAMILY_TAGs whose never-certified stock sits at exactly 2
after the r09 rotation — raising the families most likely to be drained
by the r10 greedy tag cover back to 3-deep, so the r10 AND r11 rotations
can both draw first-time carriers without emergency building (the
stocking discipline SURVEY §12 set in round 6; round 8's tranche-2 is
the precedent).

Same contract as every other operator module: each query pairs an
idiomatic Spark DataFrame plan with a DuckDB oracle stating the SAME
semantics (independent formulation where the engines' surfaces genuinely
differ; shared ANSI text where the check is two optimizers executing one
spec), identical aliases both sides, exact-integer arithmetic up to one
final fixed-order float expression, ``+ 0`` guards on ROUNDs that can
land on zero, and a 100 TB scale story per docstring.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from big_data_audio_classification_spark.registry import query
from big_data_audio_classification_spark.sources.catalog import load_table

# ---------------------------------------------------------------------------
# asof: nearest-either-direction as-of join with tolerance
# ---------------------------------------------------------------------------

ASOF_NEAREST_TOL_US = 1_800_000_000  # 30 min, microseconds


@query(
    "join_asof_nearest_abs",
    oracle=f"""
        WITH e AS (SELECT event_id AS error_id, user_id, ts
                   FROM events WHERE event_type = 'error'),
        c AS (SELECT event_id AS cid, user_id, ts AS cts
              FROM events WHERE event_type = 'click'),
        back AS (
            SELECT e.error_id, e.user_id, e.ts, c.cid AS bcid, c.cts AS bts,
                   ROW_NUMBER() OVER (
                       PARTITION BY e.error_id
                       ORDER BY (c.cid IS NULL), c.cts DESC, c.cid DESC) AS rn
            FROM e LEFT JOIN c
              ON c.user_id = e.user_id AND c.cts <= e.ts
             AND epoch_us(e.ts) - epoch_us(c.cts) <= {ASOF_NEAREST_TOL_US}
        ),
        fwd AS (
            SELECT e.error_id, c.cid AS fcid, c.cts AS fts,
                   ROW_NUMBER() OVER (
                       PARTITION BY e.error_id
                       ORDER BY (c.cid IS NULL), c.cts ASC, c.cid ASC) AS rn
            FROM e LEFT JOIN c
              ON c.user_id = e.user_id AND c.cts >= e.ts
             AND epoch_us(c.cts) - epoch_us(e.ts) <= {ASOF_NEAREST_TOL_US}
        ),
        j AS (
            SELECT b.error_id, b.user_id, b.ts, b.bcid, b.bts, f.fcid, f.fts
            FROM (SELECT * FROM back WHERE rn = 1) b
            JOIN (SELECT * FROM fwd WHERE rn = 1) f USING (error_id)
        )
        SELECT error_id, user_id,
               CASE WHEN bcid IS NOT NULL AND (fcid IS NULL
                         OR epoch_us(ts) - epoch_us(bts)
                            <= epoch_us(fts) - epoch_us(ts)) THEN bcid
                    ELSE fcid END AS click_id,
               CASE WHEN bcid IS NOT NULL AND (fcid IS NULL
                         OR epoch_us(ts) - epoch_us(bts)
                            <= epoch_us(fts) - epoch_us(ts))
                         THEN epoch_us(ts) - epoch_us(bts)
                    WHEN fcid IS NOT NULL
                         THEN epoch_us(fts) - epoch_us(ts)
               END AS delta_us,
               CASE WHEN bcid IS NOT NULL AND (fcid IS NULL
                         OR epoch_us(ts) - epoch_us(bts)
                            <= epoch_us(fts) - epoch_us(ts)) THEN 'back'
                    WHEN fcid IS NOT NULL THEN 'fwd'
               END AS side
        FROM j
    """,
    tags=("relational", "join", "asof", "events"),
)
def join_asof_nearest_abs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEAREST as-of join (pandas ``merge_asof(direction='nearest',
    tolerance=30min)``): each error event pairs with its closest click
    by |Δt| in EITHER direction, ties broken toward the PAST (the
    direction='nearest' convention), NULL when no click lands inside
    the tolerance. Deterministic candidate rule: backward = latest
    click at-or-before (equal-ts ties → largest click id), forward =
    earliest click at-or-after (ties → smallest id) — pinned
    identically on both engines. Spark computes BOTH carries from one
    unioned stream with two windows (clicks sort before errors at
    equal ts via a kind key, so a Δt=0 click is visible to both
    carries) — single shuffle keyed by user_id, O(1) window state; the
    oracle's two ranked left joins are the independent formulation.
    The tolerance is applied as a post-carry predicate, never a range
    join. Everything integer (epoch microseconds)."""
    e = load_table(spark, sf_dir, "events")
    clicks = e.filter(F.col("event_type") == "click").select(
        "user_id",
        F.col("ts"),
        F.lit(0).alias("kind"),
        F.col("event_id").alias("cid"),
    )
    errors = e.filter(F.col("event_type") == "error").select(
        "user_id", F.col("ts"), F.lit(1).alias("kind"),
        F.col("event_id").alias("cid"),
    )
    s = clicks.unionByName(errors)
    us = F.unix_micros("ts")
    wb = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("kind").asc(), F.col("cid").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").desc(), F.col("kind").asc(), F.col("cid").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    click_id = F.when(F.col("kind") == 0, F.col("cid"))
    click_us = F.when(F.col("kind") == 0, us)
    carried = s.select(
        "user_id", "ts", "kind", "cid", us.alias("us"),
        F.last(click_id, ignorenulls=True).over(wb).alias("bcid"),
        F.last(click_us, ignorenulls=True).over(wb).alias("bus"),
        F.last(click_id, ignorenulls=True).over(wf).alias("fcid"),
        F.last(click_us, ignorenulls=True).over(wf).alias("fus"),
    ).filter(F.col("kind") == 1)
    db = F.col("us") - F.col("bus")
    df_ = F.col("fus") - F.col("us")
    bok = F.col("bcid").isNotNull() & (db <= ASOF_NEAREST_TOL_US)
    fok = F.col("fcid").isNotNull() & (df_ <= ASOF_NEAREST_TOL_US)
    take_back = bok & (~fok | (db <= df_))
    return carried.select(
        F.col("cid").alias("error_id"),
        "user_id",
        F.when(take_back, F.col("bcid"))
        .when(fok, F.col("fcid"))
        .alias("click_id"),
        F.when(take_back, db).when(fok, df_).alias("delta_us"),
        F.when(take_back, F.lit("back"))
        .when(fok, F.lit("fwd"))
        .alias("side"),
    )


# ---------------------------------------------------------------------------
# setop: symmetric-difference census between two behavioral user sets
# ---------------------------------------------------------------------------


def _setops_sql(tbl: str) -> str:
    def users(t: str) -> str:
        return (
            f"SELECT DISTINCT user_id FROM {tbl} WHERE event_type = '{t}'"
        )

    return f"""
        SELECT n_click, n_purchase, n_both, n_click_only, n_purchase_only,
               n_union, n_click_only + n_purchase_only AS n_symdiff,
               ROUND(CAST(n_both AS DOUBLE) / n_union, 6) AS jaccard
        FROM (
            SELECT
                (SELECT COUNT(*) FROM ({users("click")}) x)    AS n_click,
                (SELECT COUNT(*) FROM ({users("purchase")}) x) AS n_purchase,
                (SELECT COUNT(*) FROM ({users("click")}
                    INTERSECT {users("purchase")}) x)          AS n_both,
                (SELECT COUNT(*) FROM ({users("click")}
                    EXCEPT {users("purchase")}) x)             AS n_click_only,
                (SELECT COUNT(*) FROM ({users("purchase")}
                    EXCEPT {users("click")}) x)                AS n_purchase_only,
                (SELECT COUNT(*) FROM ({users("click")}
                    UNION {users("purchase")}) x)              AS n_union
        ) t
    """


@query(
    "set_symmetric_diff_census",
    oracle=_setops_sql("events"),
    tags=("relational", "setop", "events"),
)
def set_symmetric_diff_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SET-ALGEBRA CENSUS between two behavioral cohorts (clickers vs
    purchasers): INTERSECT / EXCEPT both ways / UNION cardinalities,
    the symmetric difference, and the Jaccard overlap — the
    audience-overlap report every segmentation pipeline runs, and the
    identity check A∖B + B∖A + 2·|A∩B| = |A| + |B| (asserted in the
    replay pytest). ONE SQL spec executed by BOTH engines (Catalyst
    decorrelates the six scalar subqueries into shared distinct-scans;
    DuckDB runs the same text) — the cross-check here is two
    optimizers executing one ANSI contract. Each set op is a keyed
    distinct-aggregate; nothing driver-sized moves. Jaccard is one
    float division of exact counts."""
    e = load_table(spark, sf_dir, "events")
    view = "v_setops_events_r9"
    e.createOrReplaceTempView(view)
    return spark.sql(_setops_sql(view))


# ---------------------------------------------------------------------------
# grouping + window-time: GROUPING SETS over calendar keys
# ---------------------------------------------------------------------------


def _gsets_sql(tbl: str, dow_expr: str) -> str:
    return f"""
        WITH k AS (
            SELECT {dow_expr} AS dow, hour(ts) AS hr,
                   CAST(ROUND(value * 100) AS BIGINT) AS cents
            FROM {tbl}
        )
        SELECT COALESCE(dow, -1) AS dow, COALESCE(hr, -1) AS hr,
               CAST(GROUPING(dow) * 2 + GROUPING(hr) AS BIGINT) AS gid,
               CAST(COUNT(*) AS BIGINT)  AS n,
               CAST(SUM(cents) AS BIGINT) AS cents
        FROM k
        GROUP BY GROUPING SETS ((dow), (hr), (dow, hr), ())
    """


@query(
    "agg_grouping_sets_dow_hour",
    oracle=_gsets_sql("events", "dayofweek(ts)"),
    tags=("aggregate", "grouping", "window-time", "events"),
)
def agg_grouping_sets_dow_hour(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS over CALENDAR keys — the day-of-week × hour-of-day
    traffic matrix plus both marginals and the grand total in ONE
    aggregation pass ((dow), (hr), (dow,hr), ()), each row stamped with
    its grouping_id. The calendar-key wrinkle the plain rollup carriers
    don't exercise: Spark ``dayofweek`` is 1-based Sunday=1 while
    DuckDB's is 0-based Sunday=0, so the Spark side ships
    ``dayofweek(ts) - 1`` to meet the oracle's convention — the
    engine-quirk class that has produced red rows before (SURVEY §5).
    Rolled-up keys surface as -1 (never NULL) so the driver's hash is
    NULL-free. Exact integer cents; one shuffle, partial aggregation
    map-side for all four sets."""
    e = load_table(spark, sf_dir, "events")
    view = "v_gsets_events_r9"
    e.createOrReplaceTempView(view)
    return spark.sql(_gsets_sql(view, "dayofweek(ts) - 1"))


# ---------------------------------------------------------------------------
# topk + tfidf: per-document salient terms under an integer-only ranking
# ---------------------------------------------------------------------------

SALIENT_K = 3


@query(
    "text_topk_salient_terms",
    oracle=f"""
        WITH toks AS (
            SELECT doc_id,
                   UNNEST(list_filter(string_split(text, ' '),
                                      t -> t <> '')) AS term
            FROM documents
        ),
        tf AS (
            SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
            FROM toks GROUP BY doc_id, term
        ),
        df AS (
            SELECT term, CAST(COUNT(*) AS BIGINT) AS df
            FROM tf GROUP BY term
        ),
        nd AS (SELECT CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
               FROM tf),
        ranked AS (
            SELECT doc_id, term, tf.tf, df.df, n_docs,
                   ROW_NUMBER() OVER (
                       PARTITION BY doc_id
                       ORDER BY tf.tf DESC, df.df ASC, term ASC) AS rank
            FROM tf JOIN df USING (term) CROSS JOIN nd
        )
        SELECT doc_id, CAST(rank AS BIGINT) AS rank, term, tf, df,
               ROUND(tf * LN(CAST(n_docs AS DOUBLE) / df), 6) AS tfidf
        FROM ranked WHERE rank <= {SALIENT_K}
    """,
    tags=("text", "tfidf", "topk", "documents"),
)
def text_topk_salient_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TOP-K SALIENT TERMS per document under an INTEGER-ONLY ranking
    (tf DESC, df ASC, term ASC) — highest in-document frequency,
    rarest-in-corpus tiebreak: the keyword-extraction pass that labels
    documents for routing/packing. Ranking by the float tf·idf score
    itself is the classic cross-engine ULP trap (two engines can order
    two near-equal doubles differently); ranking by the integer triple
    is bit-stable BY CONSTRUCTION, and the float score is emitted as a
    VALUE (one fixed-order expression) without ever deciding order.
    Two map-side-combined counting aggregations (term keyed, then
    doc keyed), a broadcastable df probe join, one per-doc top-k
    window — at 100 TB df becomes a shuffle join co-partitioned with
    the tf aggregation and the window is bounded per doc."""
    d = load_table(spark, sf_dir, "documents")
    from big_data_audio_classification_spark.operators.dedup import tokens_col

    toks = d.select(
        "doc_id", F.explode(tokens_col(F.col("text"))).alias("term")
    )
    tf = toks.groupBy("doc_id", "term").agg(
        F.count(F.lit(1)).cast("bigint").alias("tf")
    )
    df_ = tf.groupBy("term").agg(
        F.count(F.lit(1)).cast("bigint").alias("df")
    )
    nd = tf.agg(F.countDistinct("doc_id").cast("bigint").alias("n_docs"))
    w = Window.partitionBy("doc_id").orderBy(
        F.col("tf").desc(), F.col("df").asc(), F.col("term").asc()
    )
    ranked = (
        tf.join(F.broadcast(df_), "term")
        .crossJoin(F.broadcast(nd))
        .select(
            "doc_id", "term", "tf", "df", "n_docs",
            F.row_number().over(w).alias("rank"),
        )
        .filter(F.col("rank") <= SALIENT_K)
    )
    return ranked.select(
        "doc_id",
        F.col("rank").cast("bigint").alias("rank"),
        "term",
        "tf",
        "df",
        F.round(
            F.col("tf") * F.log(F.col("n_docs").cast("double") / F.col("df")),
            6,
        ).alias("tfidf"),
    )


# ---------------------------------------------------------------------------
# math: bitwise-operator battery (pure integer, zero ROUND surface)
# ---------------------------------------------------------------------------


@query(
    "scalar_math_bitwise_battery",
    oracle="""
        SELECT event_id,
               event_id & user_id                         AS and_ab,
               event_id | user_id                         AS or_ab,
               xor(event_id, user_id)                     AS xor_ab,
               (event_id % 1024) << 3                     AS shl3,
               event_id >> 2                              AS shr2,
               CAST(bit_count(event_id) AS BIGINT)        AS pop_a,
               CAST(bit_count(user_id) AS BIGINT)         AS pop_b,
               event_id & 1 = 1                           AS odd_a
        FROM events
    """,
    tags=("scalar", "math", "events"),
)
def scalar_math_bitwise_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BITWISE-OPERATOR battery: AND / OR / XOR / shifts / popcount /
    parity over the key columns — the integer toolkit behind bitmap
    indexes, bloom probes, and flag unpacking (house users:
    ``sketch_bloom_filter_portable``, ``dedup_simhash``). Pure int64
    end-to-end: no ROUND, no float, nothing to guard — the value hash
    is exact by construction. XOR is the one operator the engines
    spell differently (Spark ``^`` / DuckDB ``xor()``); shifts pin the
    precedence convention (the modulo bounds shl3 so no overflow at
    any SF). Row-local, whole-stage-codegen, scan-bound at 100 TB."""
    e = load_table(spark, sf_dir, "events")
    a, b = F.col("event_id"), F.col("user_id")
    return e.select(
        "event_id",
        a.bitwiseAND(b).alias("and_ab"),
        a.bitwiseOR(b).alias("or_ab"),
        a.bitwiseXOR(b).alias("xor_ab"),
        F.shiftleft(a % 1024, 3).alias("shl3"),
        F.shiftright(a, 2).alias("shr2"),
        F.bit_count(a).cast("bigint").alias("pop_a"),
        F.bit_count(b).cast("bigint").alias("pop_b"),
        (a.bitwiseAND(F.lit(1)) == 1).alias("odd_a"),
    )


# ---------------------------------------------------------------------------
# json: nested array-of-objects path battery
# ---------------------------------------------------------------------------


@query(
    "scalar_json_nested_paths",
    oracle="""
        WITH j AS (
            SELECT event_id,
                   '{"items": [{"p": ' || CAST(event_id % 7 AS VARCHAR)
                   || ', "q": ' || CAST(event_id % 3 AS VARCHAR)
                   || '}, {"p": ' || CAST(user_id % 5 AS VARCHAR)
                   || '}], "meta": {"seg": "' || event_type || '"}}' AS doc
            FROM events
        )
        SELECT event_id,
               CAST(json_extract_string(doc, '$.items[0].p') AS BIGINT)
                                                             AS p0,
               CAST(json_extract_string(doc, '$.items[0].q') AS BIGINT)
                                                             AS q0,
               CAST(json_extract_string(doc, '$.items[1].p') AS BIGINT)
                                                             AS p1,
               json_extract_string(doc, '$.items[1].q') IS NULL
                                                             AS q1_missing,
               CAST(json_array_length(doc, '$.items') AS BIGINT)
                                                             AS n_items,
               json_extract_string(doc, '$.meta.seg')        AS seg
        FROM j
    """,
    tags=("scalar", "json", "events"),
)
def scalar_json_nested_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NESTED JSON PATH battery over an array-of-objects document:
    positional descent (``$.items[0].p``), a MISSING key inside a
    present element (``$.items[1].q`` → NULL, the absent-vs-null probe
    at depth 2 — ``scalar_json_object_shape`` pins it at depth 1),
    array length under a path, and a string leaf under a sibling
    object. Spark reads through ``get_json_object``/
    ``json_array_length``, DuckDB through ``json_extract_string`` —
    different JSONPath engines, one contract. Typed leaves cast to
    BIGINT on both sides. Row-local, one parse feeding six readers;
    scan-bound at any SF."""
    e = load_table(spark, sf_dir, "events")
    doc = F.concat(
        F.lit('{"items": [{"p": '),
        (F.col("event_id") % 7).cast("string"),
        F.lit(', "q": '),
        (F.col("event_id") % 3).cast("string"),
        F.lit('}, {"p": '),
        (F.col("user_id") % 5).cast("string"),
        F.lit('}], "meta": {"seg": "'),
        F.col("event_type"),
        F.lit('"}}'),
    )
    j = e.select("event_id", doc.alias("doc"))
    g = lambda p: F.get_json_object("doc", p)  # noqa: E731
    return j.select(
        "event_id",
        g("$.items[0].p").cast("bigint").alias("p0"),
        g("$.items[0].q").cast("bigint").alias("q0"),
        g("$.items[1].p").cast("bigint").alias("p1"),
        g("$.items[1].q").isNull().alias("q1_missing"),
        F.json_array_length(g("$.items")).cast("bigint").alias("n_items"),
        g("$.meta.seg").alias("seg"),
    )


# ---------------------------------------------------------------------------
# variant: heterogeneous-array element inspection
# ---------------------------------------------------------------------------


@query(
    "scalar_variant_array_elements",
    oracle="""
        WITH v AS (
            SELECT event_id,
                   '{"arr": [' || CAST(event_id % 9 AS VARCHAR)
                   || ', "' || event_type || '", null, {"u": '
                   || CAST(user_id AS VARCHAR) || '}]}' AS doc
            FROM events
        )
        SELECT event_id,
               CAST(json_array_length(doc, '$.arr') AS BIGINT) AS n_elems,
               CASE json_type(doc, '$.arr[0]')
                    WHEN 'BIGINT' THEN 'int' WHEN 'UBIGINT' THEN 'int'
                    ELSE lower(json_type(doc, '$.arr[0]')) END AS t0,
               CASE json_type(doc, '$.arr[1]')
                    WHEN 'VARCHAR' THEN 'string'
                    ELSE lower(json_type(doc, '$.arr[1]')) END AS t1,
               json_type(doc, '$.arr[2]') = 'NULL'             AS e2_is_null,
               CASE json_type(doc, '$.arr[3]')
                    WHEN 'OBJECT' THEN 'object'
                    ELSE lower(json_type(doc, '$.arr[3]')) END AS t3,
               CAST(json_extract_string(doc, '$.arr[3].u') AS BIGINT)
                                                               AS u_typed
        FROM v
    """,
    tags=("scalar", "variant", "events"),
)
def scalar_variant_array_elements(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VARIANT HETEROGENEOUS-ARRAY inspection: one variant per row
    whose array mixes int / string / JSON-null / object, read back
    element-by-element — length, each element's runtime type
    (canonicalized to the shared engine-neutral vocabulary), the
    null-element probe, and a typed descent THROUGH an array element
    into an object field. The ARRAY complement of
    ``scalar_variant_typeof_map`` (object paths): schema-on-read
    pipelines meet exactly this shape in mixed-type JSON feeds. Spark
    answers from ``schema_of_variant`` over ``variant_get`` subtrees;
    DuckDB from ``json_type`` — two type systems, one contract.
    Row-local, one parse per row."""
    e = load_table(spark, sf_dir, "events")
    doc = F.concat(
        F.lit('{"arr": ['),
        (F.col("event_id") % 9).cast("string"),
        F.lit(', "'),
        F.col("event_type"),
        F.lit('", null, {"u": '),
        F.col("user_id").cast("string"),
        F.lit("}]}"),
    )
    v = e.select("event_id", F.parse_json(doc).alias("v"))

    def canon(path: str) -> F.Column:
        t = F.schema_of_variant(F.expr(f"variant_get(v, '{path}')"))
        return (
            F.when(t == "BIGINT", "int")
            .when(t == "INT", "int")
            .when(t == "STRING", "string")
            .when(t.startswith("OBJECT"), "object")
            .when(t.startswith("STRUCT"), "object")
            .otherwise(F.lower(t))
        )

    return v.select(
        "event_id",
        F.expr("size(variant_get(v, '$.arr', 'array<variant>'))")
        .cast("bigint")
        .alias("n_elems"),
        canon("$.arr[0]").alias("t0"),
        canon("$.arr[1]").alias("t1"),
        F.expr("is_variant_null(variant_get(v, '$.arr[2]'))").alias(
            "e2_is_null"
        ),
        canon("$.arr[3]").alias("t3"),
        F.expr("variant_get(v, '$.arr[3].u', 'bigint')").alias("u_typed"),
    )


# ---------------------------------------------------------------------------
# map: value-collision census (invertibility of a property bag)
# ---------------------------------------------------------------------------


@query(
    "scalar_map_collision_census",
    oracle="""
        SELECT event_id,
               event_id % 97                    AS v_t,
               user_id % 97                     AS v_u,
               (event_id + user_id) % 97        AS v_m,
               CAST(CASE WHEN event_id % 97 = user_id % 97
                          AND user_id % 97 = (event_id + user_id) % 97
                         THEN 1
                    WHEN event_id % 97 = user_id % 97
                      OR user_id % 97 = (event_id + user_id) % 97
                      OR event_id % 97 = (event_id + user_id) % 97
                         THEN 2
                    ELSE 3 END AS BIGINT)       AS n_distinct_vals,
               event_id % 97 <> user_id % 97
               AND user_id % 97 <> (event_id + user_id) % 97
               AND event_id % 97 <> (event_id + user_id) % 97
                                                AS invertible,
               FALSE                            AS has_tax
        FROM events
    """,
    tags=("scalar", "map", "events"),
)
def scalar_map_collision_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MAP VALUE-COLLISION census: build a 3-key property bag with
    ``map_from_arrays``, read each value back by key lookup, and
    decide whether the map is INVERTIBLE (values pairwise distinct —
    the precondition for swapping keys↔values that
    ``spark.sql.mapKeyDedupPolicy=EXCEPTION`` enforces the hard way:
    inverting a colliding map throws). The oracle never builds a map;
    it restates each lookup and the collision predicate from the
    generating arithmetic — map semantics on one side, relational
    algebra on the other. Pure integers and booleans; row-local,
    codegen, scan-bound at 100 TB."""
    e = load_table(spark, sf_dir, "events")
    m = F.map_from_arrays(
        F.array(F.lit("t"), F.lit("u"), F.lit("m")),
        F.array(
            F.col("event_id") % 97,
            F.col("user_id") % 97,
            (F.col("event_id") + F.col("user_id")) % 97,
        ),
    )
    w = e.select("event_id", m.alias("m"))
    vals = F.map_values("m")
    return w.select(
        "event_id",
        F.element_at("m", "t").alias("v_t"),
        F.element_at("m", "u").alias("v_u"),
        F.element_at("m", "m").alias("v_m"),
        F.size(F.array_distinct(vals)).cast("bigint").alias(
            "n_distinct_vals"
        ),
        (F.size(F.array_distinct(vals)) == F.size(vals)).alias("invertible"),
        F.map_contains_key("m", "tax").alias("has_tax"),
    )


# ---------------------------------------------------------------------------
# array: rotate / reverse / fold probe battery
# ---------------------------------------------------------------------------


@query(
    "array_rotate_reverse_probe",
    oracle="""
        WITH a AS (
            SELECT event_id,
                   range(event_id % 5, event_id % 5 + 6) AS l
            FROM events
        )
        SELECT event_id,
               array_to_string(l, ',')                    AS arr,
               array_to_string(list_reverse(l), ',')      AS arr_rev,
               array_to_string(l[3:6] || l[1:2], ',')     AS arr_rot2,
               CAST(list_position(l, event_id % 5 + 3) AS BIGINT)
                                                          AS pos_probe,
               list_contains(l, event_id % 5)             AS has_head,
               CAST(list_sum(l) AS BIGINT)                AS fold_sum,
               CAST(len(list_distinct(
                   list_transform(l, x -> x % 3))) AS BIGINT)
                                                          AS n_mod3
        FROM a
    """,
    tags=("scalar", "array", "events"),
)
def array_rotate_reverse_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ARRAY manipulation battery over a generated 6-int sequence:
    reverse, ROTATE-left-by-2 (the concat-of-slices idiom — neither
    engine ships a rotate primitive), positional probe
    (``array_position`` is 1-based on BOTH engines), membership, an
    integer fold, and distinct-count after a modular transform. Arrays
    are serialized to CSV strings before returning (the house
    array-output contract — the driver's canonicalizer cannot hash
    list cells). Pure integers; row-local; codegen; scan-bound. The
    DuckDB slice ``l[3:6] || l[1:2]`` and Spark ``slice(l,3,4) ||
    slice(l,1,2)`` state the same rotation through each engine's
    slicing convention (1-based inclusive vs start+length)."""
    e = load_table(spark, sf_dir, "events")
    lo = F.col("event_id") % 5
    l = F.sequence(lo, lo + 5)
    a = e.select("event_id", l.alias("l"))
    return a.select(
        "event_id",
        F.concat_ws(",", F.col("l")).alias("arr"),
        F.concat_ws(",", F.reverse("l")).alias("arr_rev"),
        F.concat_ws(
            ",", F.concat(F.slice("l", 3, 4), F.slice("l", 1, 2))
        ).alias("arr_rot2"),
        F.array_position("l", F.col("event_id") % 5 + 3)
        .cast("bigint")
        .alias("pos_probe"),
        F.array_contains("l", F.col("event_id") % 5).alias("has_head"),
        F.aggregate("l", F.lit(0).cast("bigint"), lambda acc, x: acc + x)
        .alias("fold_sum"),
        F.size(F.array_distinct(F.transform("l", lambda x: x % 3)))
        .cast("bigint")
        .alias("n_mod3"),
    )


# ---------------------------------------------------------------------------
# lsh: bucket-occupancy entropy per band (index-health dashboard)
# ---------------------------------------------------------------------------


def _lsh_entropy_sql() -> str:
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
        probs AS (
            SELECT band_id, band_hash, n,
                   CAST(n AS DOUBLE)
                   / SUM(n) OVER (PARTITION BY band_id) AS p
            FROM buckets
        ),
        tot AS (
            SELECT band_id,
                   CAST(SUM(n) AS BIGINT)      AS n_docs,
                   CAST(COUNT(*) AS BIGINT)    AS n_buckets,
                   CAST(SUM(CAST(n AS HUGEINT) * (n - 1)) // 2
                        AS BIGINT) AS pair_mass,
                   CAST(MAX(n) AS BIGINT)      AS max_bucket,
                   list_sum(list(-p * LOG2(p) ORDER BY band_hash)) AS h
            FROM probs GROUP BY band_id
        )
        SELECT CAST(band_id AS BIGINT) AS band_id, n_docs, n_buckets,
               pair_mass, max_bucket,
               ROUND(h, 6) + 0 AS entropy_bits
        FROM tot
    """


@query(
    "dedup_lsh_bucket_entropy",
    oracle=_lsh_entropy_sql(),
    tags=("dedup", "lsh", "minhash", "report", "documents"),
)
def dedup_lsh_bucket_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH BUCKET-OCCUPANCY ENTROPY per band: Shannon entropy of the
    bucket-size distribution, bucket/max-bucket counts, and the exact
    pair mass Σ n·(n−1)/2 — the one-screen INDEX-HEALTH dashboard
    (low entropy = a few mega-buckets = quadratic verify cost coming;
    the entropy axis complements ``dedup_lsh_bucket_profile``'s size
    histogram and prices ``dedup_lsh_amplification_curve``'s workload
    BEFORE running it). Bucket sizes are exact integers; the entropy
    sum is the house SEQUENTIAL fold ORDER BY band_hash (a cross-row
    float SUM is partition-order-dependent), ``+ 0``-guarded (a
    single-bucket band has entropy exactly -0.0·log → 0). One banding
    pass + one keyed aggregate; O(bands) output rows at any corpus
    size."""
    from big_data_audio_classification_spark.operators.dedup import (
        _lsh_band_table,
    )

    d = load_table(spark, sf_dir, "documents")
    buckets = (
        _lsh_band_table(d)
        .groupBy("band_id", "band_hash")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    w = Window.partitionBy("band_id")
    p = F.col("n").cast("double") / F.sum("n").over(w)
    term = -p * F.log2(p)
    per_bucket = buckets.select(
        "band_id", "band_hash", "n", term.alias("term")
    )
    ordered_terms = F.transform(
        F.array_sort(F.collect_list(F.struct("band_hash", "term"))),
        lambda s: s["term"],
    )
    agg = per_bucket.groupBy("band_id").agg(
        F.sum("n").cast("bigint").alias("n_docs"),
        F.count(F.lit(1)).cast("bigint").alias("n_buckets"),
        # decimal accumulator (r09 ADVICE): per-bucket n·(n−1) and its
        # sum stay int64 otherwise, wrapping silently past ~3e9-doc
        # buckets while DuckDB promotes to HUGEINT; Σ n·(n−1) is even,
        # so the decimal / 2 is exact (house idiom: stock_r7.py:912).
        (F.sum(F.col("n").cast("decimal(38,0)") * (F.col("n") - 1)) / 2)
        .cast("bigint")
        .alias("pair_mass"),
        F.max("n").cast("bigint").alias("max_bucket"),
        F.aggregate(ordered_terms, F.lit(0.0), lambda a, x: a + x).alias("h"),
    )
    return agg.select(
        F.col("band_id").cast("bigint").alias("band_id"),
        "n_docs",
        "n_buckets",
        "pair_mass",
        "max_bucket",
        F.round(F.col("h"), 6).alias("entropy_bits"),
    )


# ---------------------------------------------------------------------------
# simhash: multi-probe Hamming-1 neighbor census over the 16-bit prefix
# ---------------------------------------------------------------------------


def _simhash_multiprobe_sql() -> str:
    from big_data_audio_classification_spark.operators.dedup import (
        _simhash_sql,
    )

    return f"""
        WITH fp AS ({_simhash_sql()}),
        p16 AS (SELECT doc_id, simhash >> 16 AS fp16 FROM fp),
        ks AS (SELECT UNNEST(range(16)) AS k),
        probes AS (
            SELECT doc_id, k, xor(fp16, 1 << k) AS probe FROM p16, ks
        ),
        hits AS (
            SELECT p.k, CAST(COUNT(*) AS BIGINT) AS n_pairs
            FROM probes p JOIN p16 t
              ON p.probe = t.fp16 AND p.doc_id < t.doc_id
            GROUP BY p.k
        )
        SELECT CAST(ks.k AS BIGINT)      AS bit_k,
               COALESCE(hits.n_pairs, 0) AS n_pairs
        FROM ks LEFT JOIN hits ON hits.k = ks.k
    """


@query(
    "dedup_simhash_multiprobe16",
    oracle=_simhash_multiprobe_sql(),
    tags=("dedup", "simhash", "documents"),
)
def dedup_simhash_multiprobe16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MULTI-PROBE SimHash census: for each bit k of the 16-bit
    fingerprint PREFIX, count the unordered doc pairs whose prefixes
    differ in EXACTLY that bit — the probe table multi-probe LSH
    consults to decide which single-bit-flip buckets are worth
    visiting (probing bit k costs one extra equi-join and recovers
    n_pairs(k) near-misses the exact-match bucket lost). Spark
    explodes 16 XOR probes per doc and equi-joins them back against
    the prefix table — always a keyed join on the probed value, never
    an all-pairs Hamming scan; the 16-row spine LEFT JOIN pins bits
    with zero traffic to 0 rather than dropping them. Pure integers.
    At 100 TB the probe table is 16x the fingerprint table — linear —
    and the join shuffles on the 16-bit key."""
    from big_data_audio_classification_spark.operators.dedup import (
        dedup_simhash,
    )

    # one materialization of the fingerprint pass (r10): probes AND the
    # probe-target side both consume fp — unpersisted, the full simhash
    # computation (token explode + portable hash + 32-bit vote fold)
    # ran twice
    fp = dedup_simhash(spark, sf_dir).select(
        "doc_id", F.shiftright("simhash", 16).alias("fp16")
    ).localCheckpoint(eager=False)
    ks = spark.range(16).select(F.col("id").cast("bigint").alias("k"))
    probes = fp.crossJoin(F.broadcast(ks)).select(
        "doc_id",
        "k",
        F.expr(
            "fp16 ^ shiftleft(CAST(1 AS BIGINT), CAST(k AS INT))"
        ).alias("probe"),
    )
    t = fp.select(F.col("doc_id").alias("tid"), F.col("fp16").alias("tfp"))
    hits = (
        probes.join(t, (probes.probe == t.tfp) & (probes.doc_id < t.tid))
        .groupBy("k")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_pairs"))
    )
    return (
        ks.join(hits, "k", "left")
        .select(
            F.col("k").alias("bit_k"),
            F.coalesce("n_pairs", F.lit(0)).cast("bigint").alias("n_pairs"),
        )
    )


# ---------------------------------------------------------------------------
# regression: quadratic fit by closed-form normal equations (Cramer)
# ---------------------------------------------------------------------------

# Shared determinant polynomials — ONE text, evaluated by both engines
# over identically-named exact-integer moment columns (n, s1..s4 in x;
# t0..t2 in x^k*y_cents). DECIMAL(38,0)/HUGEINT headroom: the products
# reach ~1e27 at sf0.1 and ~1e31 at the 100x blow-up — silent int64
# wrap territory, the r07/r08 hazard class.
_QUAD_D = "(n*(s2*s4 - s3*s3) - s1*(s1*s4 - s2*s3) + s2*(s1*s3 - s2*s2))"
_QUAD_DA = "(t0*(s2*s4 - s3*s3) - s1*(t1*s4 - s3*t2) + s2*(t1*s3 - s2*t2))"
_QUAD_DB = "(n*(t1*s4 - t2*s3) - t0*(s1*s4 - s2*s3) + s2*(s1*t2 - s2*t1))"
_QUAD_DC = "(n*(s2*t2 - s3*t1) - s1*(s1*t2 - s2*t1) + t0*(s1*s3 - s2*s2))"


@query(
    "ml_quadratic_normal_equations",
    oracle=f"""
        WITH x AS (
            SELECT o_orderpriority AS priority,
                   CAST(day(o_orderdate) AS BIGINT) AS x,
                   CAST(ROUND(o_totalprice * 100) AS BIGINT) AS y
            FROM orders
        ),
        m AS (
            SELECT priority,
                   CAST(COUNT(*) AS HUGEINT)        AS n,
                   CAST(SUM(x) AS HUGEINT)          AS s1,
                   CAST(SUM(x*x) AS HUGEINT)        AS s2,
                   CAST(SUM(x*x*x) AS HUGEINT)      AS s3,
                   CAST(SUM(x*x*x*x) AS HUGEINT)    AS s4,
                   CAST(SUM(y) AS HUGEINT)          AS t0,
                   CAST(SUM(x*y) AS HUGEINT)        AS t1,
                   CAST(SUM(x*x*y) AS HUGEINT)      AS t2
            FROM x GROUP BY priority
        )
        SELECT priority, CAST(n AS BIGINT) AS n,
               ROUND(CAST({_QUAD_DA} AS DOUBLE)
                     / CAST({_QUAD_D} AS DOUBLE), 6) + 0 AS a_cents,
               ROUND(CAST({_QUAD_DB} AS DOUBLE)
                     / CAST({_QUAD_D} AS DOUBLE), 6) + 0 AS b_cents,
               ROUND(CAST({_QUAD_DC} AS DOUBLE)
                     / CAST({_QUAD_D} AS DOUBLE), 6) + 0 AS c_cents
        FROM m
    """,
    tags=("ml", "regression", "orders"),
)
def ml_quadratic_normal_equations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """QUADRATIC least squares y = a + b·x + c·x² in CLOSED FORM per
    order priority (x = day-of-month, y = exact price cents): the 3x3
    normal equations solved by Cramer's rule over EXACT INTEGER
    moments — the degree-2 step past ``ml_ols_normal_equations``, and
    the shape every distributed polynomial fit takes (one
    map-side-combined moment aggregation; the solve is O(1) per
    group). The determinant polynomials are ONE shared text evaluated
    by both engines over DECIMAL(38,0)/HUGEINT moments — their
    products reach ~1e27 at sf0.1 (silent int64-wrap territory, the
    r07 DECIMAL-headroom class); each coefficient is a single float
    division of two exact determinants, ``+ 0``-guarded (c can round
    to a signed zero on a flat group). Day-of-month via ``day()`` on
    both engines."""
    o = load_table(spark, sf_dir, "orders")
    x = F.dayofmonth("o_orderdate").cast("bigint")
    y = F.round(F.col("o_totalprice") * 100).cast("bigint")
    base = o.select(
        F.col("o_orderpriority").alias("priority"),
        x.alias("x"),
        y.alias("y"),
    )
    # Per-row terms cast to DECIMAL(38,0) BEFORE the sum (r09 ADVICE):
    # t2 = Σx²·y averages ~5e9 per row, so an int64 accumulator wraps
    # silently past ~1e9 rows per group while DuckDB's SUM(BIGINT)
    # promotes to HUGEINT — the accumulator itself needs the headroom,
    # not just the post-aggregation value (house idiom: stock_r7.py).
    dsum = lambda e: F.sum(F.expr(f"CAST({e} AS DECIMAL(38,0))"))  # noqa: E731
    m = base.groupBy("priority").agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
        dsum("x").alias("s1"),
        dsum("x*x").alias("s2"),
        dsum("x*x*x").alias("s3"),
        dsum("x*x*x*x").alias("s4"),
        dsum("y").alias("t0"),
        dsum("x*y").alias("t1"),
        dsum("x*x*y").alias("t2"),
    )
    return m.select(
        "priority",
        F.col("n").cast("bigint").alias("n"),
        F.round(
            F.expr(f"CAST({_QUAD_DA} AS DOUBLE) / CAST({_QUAD_D} AS DOUBLE)"),
            6,
        ).alias("a_cents"),
        F.round(
            F.expr(f"CAST({_QUAD_DB} AS DOUBLE) / CAST({_QUAD_D} AS DOUBLE)"),
            6,
        ).alias("b_cents"),
        F.round(
            F.expr(f"CAST({_QUAD_DC} AS DOUBLE) / CAST({_QUAD_D} AS DOUBLE)"),
            6,
        ).alias("c_cents"),
    )


# ---------------------------------------------------------------------------
# subquery: correlated EXISTS / NOT EXISTS census
# ---------------------------------------------------------------------------

BIG_ORDER_CENTS = 30_000_000  # $300k


def _exists_census_sql(ctbl: str, otbl: str) -> str:
    return f"""
        SELECT c.c_mktsegment AS segment,
               CAST(COUNT(*) AS BIGINT) AS n_customers,
               CAST(SUM(CASE WHEN EXISTS (
                       SELECT 1 FROM {otbl} o
                       WHERE o.o_custkey = c.c_custkey)
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_with_orders,
               CAST(SUM(CASE WHEN NOT EXISTS (
                       SELECT 1 FROM {otbl} o
                       WHERE o.o_custkey = c.c_custkey)
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_without_orders,
               CAST(SUM(CASE WHEN EXISTS (
                       SELECT 1 FROM {otbl} o
                       WHERE o.o_custkey = c.c_custkey
                         AND o.o_totalprice * 100 >= {BIG_ORDER_CENTS})
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_with_big_order,
               ROUND(CAST(SUM(CASE WHEN EXISTS (
                       SELECT 1 FROM {otbl} o
                       WHERE o.o_custkey = c.c_custkey)
                    THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*), 6)
                                                  AS active_share
        FROM {ctbl} c
        GROUP BY c.c_mktsegment
    """


@query(
    "subquery_exists_census",
    oracle=_exists_census_sql("customer", "orders"),
    tags=("relational", "subquery", "sql", "orders"),
)
def subquery_exists_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS / NOT EXISTS census per market segment: how
    many customers have any order, none, or at least one big-ticket
    order — three correlated subqueries folded into one grouped scan.
    ONE SQL spec executed by BOTH engines: the check here is
    Catalyst's subquery DECORRELATION (each EXISTS must rewrite to a
    semi/anti hash join keyed on custkey — asserted in
    tests/test_plans.py; a correlated re-execution per customer row
    would be the 100 TB disaster) against DuckDB's independent
    decorrelator. Counts exact; active_share is one float division.
    Output is |segments| rows."""
    load_table(spark, sf_dir, "customer").createOrReplaceTempView(
        "v_exists_cust_r9"
    )
    load_table(spark, sf_dir, "orders").createOrReplaceTempView(
        "v_exists_ord_r9"
    )
    return spark.sql(_exists_census_sql("v_exists_cust_r9", "v_exists_ord_r9"))


# ---------------------------------------------------------------------------
# ivf: split/merge maintenance plan from cell occupancy
# ---------------------------------------------------------------------------

SPLIT_RATIO = 2.0  # occupancy > 2x mean -> split candidate
MERGE_RATIO = 0.5  # occupancy < 0.5x mean -> merge candidate


def _ivf_split_merge_sql() -> str:
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
        assign AS (
            SELECT vec_id, cell_id
            FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
                            ORDER BY d2, cell_id) AS rn FROM d)
            WHERE rn = 1
        ),
        occ AS (
            SELECT c.cell_id,
                   CAST(COUNT(a.vec_id) AS BIGINT) AS n_vecs
            FROM c LEFT JOIN assign a ON a.cell_id = c.cell_id
            GROUP BY c.cell_id
        ),
        tot AS (SELECT CAST(SUM(n_vecs) AS BIGINT) AS n_total,
                       CAST(COUNT(*) AS BIGINT)    AS n_cells
                FROM occ)
        SELECT cell_id, n_vecs,
               ROUND(CAST(n_vecs AS DOUBLE) * n_cells / n_total, 6)
                   AS occupancy_ratio,
               CASE WHEN CAST(n_vecs AS DOUBLE) * n_cells
                         > {SPLIT_RATIO} * n_total THEN 'split'
                    WHEN CAST(n_vecs AS DOUBLE) * n_cells
                         < {MERGE_RATIO} * n_total THEN 'merge'
                    ELSE 'keep' END AS action
        FROM occ, tot
    """


@query(
    "sim_ivf_split_merge_plan",
    oracle=_ivf_split_merge_sql(),
    tags=("similarity", "ivf", "report", "embeddings"),
)
def sim_ivf_split_merge_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF INDEX-MAINTENANCE PLAN: assign every vector to its nearest
    coarse cell, then flag each cell for SPLIT (occupancy > 2x the
    mean), MERGE (< 0.5x), or KEEP — the rebalancing decision an IVF
    index runs between builds (skewed cells destroy the nprobe/recall
    trade the sweep carriers measure; ``sim_ivf_cell_balance`` reports
    the skew, this op turns it into the action list). Assignment is
    the house broadcast-centroid + bit-identical in-row d2 fold +
    deterministic rank; occupancy is one keyed count over a cell
    SPINE (an empty cell must surface as a 'merge' row, not vanish —
    LEFT JOIN from the centroid set). The threshold comparisons are
    INTEGER cross-products (n·cells vs ratio·total — no float
    boundary hazard); occupancy_ratio is one float division of exact
    counts. O(cells) output rows at any corpus size."""
    from big_data_audio_classification_spark.functions.vector import (
        l2_dist_sq,
        to_double,
    )
    from big_data_audio_classification_spark.operators.similarity import (
        IVF_CELLS,
    )

    em = load_table(spark, sf_dir, "embeddings")
    cents = em.filter(F.col("vec_id") < IVF_CELLS).select(
        F.col("vec_id").alias("cell_id"),
        F.col("embedding").alias("c_emb"),
    )
    d2 = l2_dist_sq(to_double(F.col("c_emb")), to_double(F.col("embedding")))
    scored = em.crossJoin(F.broadcast(cents)).select(
        "vec_id", "cell_id", d2.alias("d2")
    )
    w = Window.partitionBy("vec_id").orderBy("d2", "cell_id")
    assign = (
        scored.select("*", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") == 1)
        .select("vec_id", "cell_id")
    )
    spine = cents.select("cell_id")
    occ = (
        spine.join(assign, "cell_id", "left")
        .groupBy("cell_id")
        .agg(F.count("vec_id").cast("bigint").alias("n_vecs"))
    )
    tot = occ.agg(
        F.sum("n_vecs").cast("bigint").alias("n_total"),
        F.count(F.lit(1)).cast("bigint").alias("n_cells"),
    )
    nd = F.col("n_vecs").cast("double")
    return occ.crossJoin(F.broadcast(tot)).select(
        "cell_id",
        "n_vecs",
        F.round(nd * F.col("n_cells") / F.col("n_total"), 6).alias(
            "occupancy_ratio"
        ),
        F.when(
            nd * F.col("n_cells") > SPLIT_RATIO * F.col("n_total"), "split"
        )
        .when(nd * F.col("n_cells") < MERGE_RATIO * F.col("n_total"), "merge")
        .otherwise("keep")
        .alias("action"),
    )

# ---------------------------------------------------------------------------
# feature-selection: point-biserial correlation per embedding dimension
# ---------------------------------------------------------------------------

PB_POS_LABEL = 0  # the binary split: label == 0 vs rest


@query(
    "ml_point_biserial_selection",
    oracle=f"""
        WITH x AS (
            SELECT vec_id,
                   CASE WHEN label = {PB_POS_LABEL} THEN 1 ELSE 0 END AS g,
                   CAST(generate_subscripts(embedding, 1) AS BIGINT) AS dim,
                   CAST(UNNEST(embedding) AS DOUBLE) AS v
            FROM embeddings
        ),
        m AS (
            SELECT dim,
                   CAST(COUNT(*) AS BIGINT)              AS n,
                   CAST(SUM(g) AS BIGINT)                AS n1,
                   list_sum(list(v ORDER BY vec_id))     AS s1,
                   list_sum(list(v * v ORDER BY vec_id)) AS s2,
                   list_sum(list(v ORDER BY vec_id)
                            FILTER (g = 1))              AS s1p
            FROM x GROUP BY dim
        )
        SELECT dim, n1, n - n1 AS n0,
               ROUND((s1p / n1 - (s1 - s1p) / (n - n1))
                     / SQRT((s2 - s1 * s1 / CAST(n AS DOUBLE))
                            / CAST(n AS DOUBLE))
                     * SQRT((CAST(n1 AS DOUBLE) / n)
                            * (CAST(n - n1 AS DOUBLE) / n)), 6) + 0
                   AS r_pb
        FROM m
    """,
    tags=("ml", "feature-selection", "embeddings"),
)
def ml_point_biserial_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """POINT-BISERIAL feature scoring: the correlation of each
    embedding dimension with the binary split label==0 — r_pb =
    (M₁−M₀)/σ_pop · √(p·q), the feature-selection screen for a binary
    target that ANOVA-F/MI siblings complement. All moments reduce via
    the SEQUENTIAL vec_id-ordered fold (the house deterministic-
    summation idiom; the group-1 partial sum rides the SAME ordered
    list under a FILTER, so group means come from one pass), then ONE
    fixed-order float expression per dimension, ``+ 0``-guarded —
    r_pb is signed and a near-independent dimension rounds to a
    signed zero (the r06/r08 red-row class). One shuffle keyed by
    dim; 64 output rows at any corpus size."""
    em = load_table(spark, sf_dir, "embeddings")
    ex = em.select(
        "vec_id",
        F.when(F.col("label") == PB_POS_LABEL, 1).otherwise(0).alias("g"),
        F.posexplode("embedding").alias("pos", "raw"),
    ).select(
        "vec_id",
        "g",
        (F.col("pos") + 1).cast("bigint").alias("dim"),
        F.col("raw").cast("double").alias("v"),
    )
    sorted_structs = F.array_sort(F.collect_list(F.struct("vec_id", "g", "v")))
    fold = lambda arr: F.aggregate(  # noqa: E731
        arr, F.lit(0.0), lambda a, x: a + x
    )
    m = ex.groupBy("dim").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("g").cast("bigint").alias("n1"),
        fold(F.transform(sorted_structs, lambda s: s["v"])).alias("s1"),
        fold(F.transform(sorted_structs, lambda s: s["v"] * s["v"])).alias(
            "s2"
        ),
        fold(
            F.transform(
                F.filter(sorted_structs, lambda s: s["g"] == 1),
                lambda s: s["v"],
            )
        ).alias("s1p"),
    )
    nd = F.col("n").cast("double")
    n1 = F.col("n1")
    n0 = F.col("n") - n1
    r_pb = (
        (F.col("s1p") / n1 - (F.col("s1") - F.col("s1p")) / n0)
        / F.sqrt(
            (F.col("s2") - F.col("s1") * F.col("s1") / nd) / nd
        )
        * F.sqrt(
            (n1.cast("double") / F.col("n"))
            * (n0.cast("double") / F.col("n"))
        )
    )
    return m.select(
        "dim", "n1", n0.alias("n0"), F.round(r_pb, 6).alias("r_pb")
    )


# ---------------------------------------------------------------------------
# encoding: binary (bit-decomposed ordinal) category encoding
# ---------------------------------------------------------------------------


@query(
    "ml_binary_encoding",
    oracle="""
        WITH dim AS (
            SELECT event_type,
                   CAST(ROW_NUMBER() OVER (ORDER BY event_type) - 1
                        AS BIGINT) AS ord
            FROM (SELECT DISTINCT event_type FROM events)
        )
        SELECT e.event_id, e.event_type, d.ord,
               d.ord & 1        AS b0,
               (d.ord >> 1) & 1 AS b1,
               (d.ord >> 2) & 1 AS b2
        FROM events e JOIN dim d USING (event_type)
    """,
    tags=("ml", "encoding", "events"),
)
def ml_binary_encoding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BINARY (bit-decomposed ordinal) category encoding: assign each
    category its alphabetical ordinal, then emit the ordinal's BITS as
    features — the cardinality-compressing middle ground between
    one-hot (k columns) and ordinal (1 column, fake order): ceil(log2
    k) columns, here 3 bits for the 5 event types. The ordinal is the
    house alphabetAsc convention (deterministic, engine-neutral —
    never a hash), assigned on a |categories|-row dim frame and
    BROADCAST-joined back, exactly how a 100 TB encoder ships its
    codebook; the bit split is pure integer shift/mask. Nothing
    floats; scan-bound."""
    e = load_table(spark, sf_dir, "events")
    dim = (
        e.select("event_type")
        .distinct()
        .select(
            "event_type",
            (
                F.row_number().over(Window.orderBy("event_type")) - 1
            ).cast("bigint").alias("ord"),
        )
    )
    j = e.join(F.broadcast(dim), "event_type")
    o = F.col("ord")
    return j.select(
        "event_id",
        "event_type",
        "ord",
        o.bitwiseAND(F.lit(1)).alias("b0"),
        F.shiftright(o, 1).bitwiseAND(F.lit(1)).alias("b1"),
        F.shiftright(o, 2).bitwiseAND(F.lit(1)).alias("b2"),
    )
