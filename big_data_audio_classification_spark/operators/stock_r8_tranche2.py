"""Round-8 tranche 2: pre-stock for the r09 AND r10 rotations.

After the r08 window rotation, ~30 REQUIRED_FAMILY_TAGs sat at exactly
2-deep never-certified stock — enough for r09's rotation but leaving r10
with a forced carrier-building round. This tranche adds one fresh,
genuinely-new operator per thin tag so BOTH upcoming rotations draw
first-time carriers with zero building (the stocking rule SURVEY §12).

Same contract as every other operator module: each query pairs an
idiomatic Spark DataFrame plan with a DuckDB oracle stating the SAME
semantics through an independent formulation; every computed column is
aliased identically on both sides; float outputs are bit-stable (exact
integer/cents arithmetic up to one final float expression written in
the same operation order on both engines); and each docstring carries
the 100 TB scale story.
"""

from __future__ import annotations

import pandas as pd  # noqa: F401  (pandas UDAF kernels)
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from big_data_audio_classification_spark.registry import query
from big_data_audio_classification_spark.sources.catalog import load_table

# ---------------------------------------------------------------------------
# scalar/string: construction battery (pad / overlay / repeat / insert)
# ---------------------------------------------------------------------------


@query(
    "scalar_string_pad_overlay",
    oracle="""
        SELECT o_orderkey,
               lpad(CAST(o_orderkey AS VARCHAR), 12, '0')   AS key_lpad,
               rpad(o_orderpriority, 16, '.')               AS prio_rpad,
               repeat(o_orderstatus, 3)                     AS status_rep,
               -- overlay(priority PLACING '##' FROM 3): DuckDB lacks
               -- OVERLAY, restated as cut-and-paste concat
               substr(o_orderpriority, 1, 2) || '##'
                   || substr(o_orderpriority, 5)            AS prio_masked,
               CAST(length(lpad(CAST(o_orderkey AS VARCHAR), 12, '0'))
                    AS BIGINT)                              AS lpad_len
        FROM orders
    """,
    tags=("scalar", "string", "orders"),
)
def scalar_string_pad_overlay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STRING-CONSTRUCTION battery: zero-padding keys to fixed width
    (the join-key normalization every CSV/legacy ingest needs), right-
    padding for fixed-width sinks, repeat, and OVERLAY-based field
    masking (priority chars 3-4 → '##' — the PII-redaction shape).
    Spark uses the real ``overlay``; the oracle restates it as
    cut-and-paste substr concat — two formulations, one contract.
    Row-local, JVM codegen, no shuffle at any SF."""
    o = load_table(spark, sf_dir, "orders")
    key_str = F.col("o_orderkey").cast("string")
    return o.select(
        "o_orderkey",
        F.lpad(key_str, 12, "0").alias("key_lpad"),
        F.rpad("o_orderpriority", 16, ".").alias("prio_rpad"),
        F.repeat("o_orderstatus", 3).alias("status_rep"),
        F.overlay("o_orderpriority", F.lit("##"), F.lit(3)).alias(
            "prio_masked"
        ),
        F.length(F.lpad(key_str, 12, "0")).cast("bigint").alias("lpad_len"),
    )


# ---------------------------------------------------------------------------
# scalar/math: rounding-mode battery over exact cents
# ---------------------------------------------------------------------------


@query(
    "scalar_math_rounding_battery",
    oracle="""
        WITH x AS (
            SELECT l_orderkey, l_linenumber,
                   CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS cents
            FROM lineitem
        )
        SELECT l_orderkey, l_linenumber,
               cents // 100                                   AS floor_usd,
               -- (c+99)//100 is ceil for the POSITIVE price domain;
               -- -(-c//100) would NOT be: both engines' integer
               -- division truncates toward zero, so that identity
               -- silently collapses to floor (caught by the replay
               -- test, not the cross-engine gate — both engines were
               -- identically wrong)
               (cents + 99) // 100                            AS ceil_usd,
               cents // 100                                   AS trunc_usd,
               (cents + 50) // 100                            AS half_up_usd,
               cents % 100                                    AS rem_cents,
               ((cents % 100) + 100) % 100                    AS mod_cents
        FROM x
    """,
    tags=("scalar", "math", "lineitem"),
)
def scalar_math_rounding_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROUNDING-MODE battery stated ENTIRELY in integer arithmetic:
    floor / ceil / truncate / round-half-up from cents to dollars, plus
    remainder vs mathematical modulo — the money-bucketing vocabulary
    where engine ROUND semantics differ (Spark ROUND is half-up, DuckDB
    half-even on doubles: exactly the cross-engine trap this carrier
    sidesteps by never rounding a float at all). ceil as ``(c+99) div
    100`` and half-up as ``(c+50) div 100`` are the portable integer
    identities FOR THE POSITIVE price domain — the naive ``-(-c div
    100)`` ceil is a trap: both engines' integer division truncates
    toward zero, so it silently equals floor (a defect the replay test
    caught that the cross-engine gate structurally could not — both
    engines were identically wrong). trunc == floor on this domain,
    stated as such. Every output is a BIGINT, nothing to ULP.
    Row-local, no shuffle."""
    li = load_table(spark, sf_dir, "lineitem")
    cents = F.round(F.col("l_extendedprice") * 100).cast("bigint")
    x = li.select("l_orderkey", "l_linenumber", cents.alias("cents"))
    c = F.col("cents")
    return x.select(
        "l_orderkey",
        "l_linenumber",
        F.expr("cents DIV 100").alias("floor_usd"),
        F.expr("(cents + 99) DIV 100").alias("ceil_usd"),
        F.expr("cents DIV 100").alias("trunc_usd"),
        F.expr("(cents + 50) DIV 100").alias("half_up_usd"),
        (c % 100).alias("rem_cents"),
        F.pmod(c, F.lit(100)).alias("mod_cents"),
    )


# ---------------------------------------------------------------------------
# scalar/json: object → key/value row explosion (schema discovery shape)
# ---------------------------------------------------------------------------


@query(
    "scalar_json_flatten_kv",
    oracle="""
        WITH kv AS (
            SELECT event_id,
                   UNNEST(json_keys(props)) AS k
            FROM events
        )
        SELECT event_id, k,
               json_extract_string(events.props, '$.' || k)   AS v_text,
               -- explicit integer regex on BOTH sides: TRY_CAST vs
               -- Spark CAST disagree on '12.5'/'1e3'-shaped strings
               -- (DuckDB rounds/parses them, Spark rejects) — r08 review
               regexp_matches(json_extract_string(events.props, '$.' || k),
                              '^-?[0-9]+$')                    AS v_is_int
        FROM kv JOIN events USING (event_id)
    """,
    tags=("scalar", "json", "events"),
)
def scalar_json_flatten_kv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON OBJECT → (key, value) ROW EXPLOSION — the schema-discovery
    primitive: parse each payload once as ``map<string,string>``,
    explode to one row per field, and type-probe each value (is it
    integral?). This is how a 100 TB semi-structured ingest inventories
    its field space before declaring a schema (the aggregated census
    sibling: ``scalar_json_object_shape``). One parse + one explode per
    row, JVM-side; output rows = Σ field counts, linear."""
    e = load_table(spark, sf_dir, "events")
    m = F.from_json("props", "map<string,string>")
    return (
        e.select("event_id", F.explode(m).alias("k", "v_text"))
        .select(
            "event_id",
            "k",
            "v_text",
            # explicit integer regex, shared with the oracle: engine
            # string->int cast semantics diverge on '12.5'/'1e3'
            F.col("v_text").rlike("^-?[0-9]+$").alias("v_is_int"),
        )
    )


# ---------------------------------------------------------------------------
# scalar/variant: per-path dynamic type inspection
# ---------------------------------------------------------------------------


@query(
    "scalar_variant_typeof_map",
    oracle="""
        WITH v AS (
            SELECT event_id,
                   '{"n": ' || json_extract_string(props, '$.k')
                       || ', "s": "' || event_type
                       || '", "o": {"u": ' || CAST(user_id AS VARCHAR)
                       || '}, "z": null}' AS doc
            FROM events
        )
        SELECT event_id,
               CASE json_type(doc, '$.n')
                    WHEN 'BIGINT' THEN 'int' WHEN 'UBIGINT' THEN 'int'
                    WHEN 'DOUBLE' THEN 'float' ELSE lower(json_type(doc, '$.n'))
               END                                        AS n_type,
               CASE json_type(doc, '$.s')
                    WHEN 'VARCHAR' THEN 'string'
                    ELSE lower(json_type(doc, '$.s'))
               END                                        AS s_type,
               CASE json_type(doc, '$.o')
                    WHEN 'OBJECT' THEN 'object'
                    ELSE lower(json_type(doc, '$.o'))
               END                                        AS o_type,
               json_type(doc, '$.z') = 'NULL'             AS z_is_null,
               json_type(doc, '$.missing') IS NULL        AS missing_absent
        FROM v
    """,
    tags=("scalar", "variant", "events"),
)
def scalar_variant_typeof_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VARIANT per-path DYNAMIC TYPE inspection: build one heterogeneous
    variant per row (int / string / nested object / JSON null) and read
    back each path's runtime type, canonicalized to a shared engine-
    neutral vocabulary (int/string/object) — the type-census primitive
    schema-on-read pipelines run before casting (value siblings:
    ``scalar_variant_typed_paths``, ``scalar_variant_object_tree``).
    Spark answers from ``schema_of_variant`` over ``variant_get``
    subtrees; DuckDB from ``json_type`` — two genuinely different type
    systems mapped to one contract. JSON-null vs absent-path is pinned
    explicitly (the classic confusion). Row-local, one parse per row."""
    e = load_table(spark, sf_dir, "events")
    doc = F.concat(
        F.lit('{"n": '),
        F.get_json_object("props", "$.k"),
        F.lit(', "s": "'),
        F.col("event_type"),
        F.lit('", "o": {"u": '),
        F.col("user_id").cast("string"),
        F.lit('}, "z": null}'),
    )
    v = F.parse_json(doc)

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

    x = e.select("event_id", v.alias("v"))
    return x.select(
        "event_id",
        canon("$.n").alias("n_type"),
        canon("$.s").alias("s_type"),
        canon("$.o").alias("o_type"),
        F.expr("is_variant_null(variant_get(v, '$.z'))").alias("z_is_null"),
        F.expr("variant_get(v, '$.missing')").isNull().alias("missing_absent"),
    )


# ---------------------------------------------------------------------------
# array: in-row running extrema (prefix scan inside one array cell)
# ---------------------------------------------------------------------------

AREX_Q = 10_000  # fixed-point scale for embedding components


@query(
    "array_running_extrema",
    oracle=f"""
        WITH x AS (
            SELECT vec_id,
                   list_transform(embedding,
                       e -> CAST(ROUND(CAST(e AS DOUBLE) * {AREX_Q})
                                 AS BIGINT)) AS q
            FROM embeddings
        )
        SELECT vec_id,
               CAST(len(list_filter(range(1, len(q) + 1),
                        i -> q[i] = list_max(q[1:i]))) AS BIGINT)
                   AS n_running_max_updates,
               CAST(len(list_filter(range(1, len(q) + 1),
                        i -> q[i] = list_min(q[1:i]))) AS BIGINT)
                   AS n_running_min_updates,
               CAST(list_max(q) AS BIGINT) AS final_max_q,
               CAST(list_min(q) AS BIGINT) AS final_min_q
        FROM x
    """,
    tags=("array", "scalar", "embeddings"),
)
def array_running_extrema(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-ROW PREFIX-SCAN extrema: for each embedding (fixed-point
    integers, scale 10⁴), count how many positions update the running
    max / running min (the record-count statistic — E[records] = H_n ≈
    4.7 for random order, so a sorted-ish vector is instantly visible)
    plus the final extrema. The prefix scan runs INSIDE the array cell
    via higher-order functions — zero explode, zero shuffle, the
    pattern for per-vector sequential logic at 100 TB (the exploded
    sibling: ``array_indexed_lambda_stats``). A position counts as an
    update iff its value equals the prefix max (ties re-count on BOTH
    engines — the same closed predicate, no order-of-evaluation
    hazard). All integers."""
    em = load_table(spark, sf_dir, "embeddings")
    q = F.transform(
        "embedding",
        lambda e: F.round(e.cast("double") * AREX_Q).cast("bigint"),
    )
    x = em.select("vec_id", q.alias("q"))
    idx = F.sequence(F.lit(1), F.size("q"))
    is_max_upd = F.filter(
        idx, lambda i: F.element_at("q", i) == F.array_max(F.slice("q", 1, i))
    )
    is_min_upd = F.filter(
        idx, lambda i: F.element_at("q", i) == F.array_min(F.slice("q", 1, i))
    )
    return x.select(
        "vec_id",
        F.size(is_max_upd).cast("bigint").alias("n_running_max_updates"),
        F.size(is_min_upd).cast("bigint").alias("n_running_min_updates"),
        F.array_max("q").cast("bigint").alias("final_max_q"),
        F.array_min("q").cast("bigint").alias("final_min_q"),
    )


# ---------------------------------------------------------------------------
# map: filter + concat-with-defaults algebra
# ---------------------------------------------------------------------------

MAPF_MIN_COUNT = 3  # keep event types a user hit at least this often


@query(
    "scalar_map_filter_concat",
    oracle=f"""
        WITH counts AS (
            SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS n
            FROM events GROUP BY user_id, event_type
        ),
        kept AS (
            SELECT user_id, event_type, n FROM counts
            WHERE n >= {MAPF_MIN_COUNT}
        ),
        all_types AS (
            SELECT DISTINCT user_id, t.event_type
            FROM counts, (SELECT DISTINCT event_type FROM events) t
        )
        SELECT a.user_id, a.event_type,
               COALESCE(k.n, 0)          AS n_effective,
               k.n IS NOT NULL           AS survived_filter
        FROM all_types a LEFT JOIN kept k
          ON a.user_id = k.user_id AND a.event_type = k.event_type
    """,
    tags=("scalar", "map", "events"),
)
def scalar_map_filter_concat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MAP FILTER + DEFAULT-FILL algebra: per user, build the
    event-type→count map, ``map_filter`` away noise entries (count <
    3), then overlay onto a complete default map (every event type →
    0) with ``map_concat``-style precedence so every user emits a row
    for EVERY type — the dense-feature-vector normalization sparse
    per-entity maps need before ML assembly. The oracle states the
    same algebra relationally (filter + domain cross join + left
    join). Spark side stays in map-typed land until one final explode;
    one count shuffle, the type domain is a tiny broadcast. Output
    rows = users × types, dense by construction."""
    e = load_table(spark, sf_dir, "events")
    counts = e.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    per_user = counts.groupBy("user_id").agg(
        F.map_from_entries(F.collect_list(F.struct("event_type", "n"))).alias(
            "m"
        )
    )
    kept = F.map_filter("m", lambda _, v: v >= MAPF_MIN_COUNT)
    types = [
        r.event_type
        for r in e.select("event_type").distinct().orderBy("event_type").collect()
    ]
    default = F.create_map(
        *[x for t in types for x in (F.lit(t), F.lit(0).cast("bigint"))]
    )
    # map_concat(default, kept) with kept winning on duplicate keys
    # (Spark's LAST_WIN policy under spark.sql.mapKeyDedupPolicy) would
    # be config-sensitive; zip_with over the full domain is the
    # deterministic spelling
    filled = per_user.select(
        "user_id",
        F.transform(
            F.array(*[F.lit(t) for t in types]),
            lambda t: F.struct(
                t.alias("event_type"),
                F.coalesce(F.element_at(kept, t), F.lit(0))
                .cast("bigint")
                .alias("n_effective"),
                F.element_at(kept, t).isNotNull().alias("survived_filter"),
            ),
        ).alias("entries"),
    )
    return filled.select(
        "user_id", F.explode("entries").alias("x")
    ).select(
        "user_id",
        F.col("x.event_type").alias("event_type"),
        F.col("x.n_effective").alias("n_effective"),
        F.col("x.survived_filter").alias("survived_filter"),
    )


# ---------------------------------------------------------------------------
# dedup/minhash: one-permutation hashing sparsity census
# ---------------------------------------------------------------------------

OPH_BUCKETS = 16
OPH_RANGE = 4_294_967_296 // OPH_BUCKETS  # 2^32 split into 16 equal ranges


@query(
    "dedup_minhash_oneperm_census",
    oracle=f"""
        WITH toks AS (
            SELECT doc_id,
                   UNNEST(list_filter(string_split(text, ' '),
                                      t -> t <> '')) AS tok
            FROM documents
        ),
        h AS (
            SELECT doc_id,
                   CAST(('0x' || substr(md5(tok), 1, 8)) AS BIGINT) AS hv
            FROM toks
        ),
        filled AS (
            SELECT doc_id, hv // {OPH_RANGE} AS bucket, MIN(hv) AS mn
            FROM h GROUP BY doc_id, hv // {OPH_RANGE}
        )
        SELECT doc_id,
               CAST(COUNT(*) AS BIGINT)        AS n_filled,
               CAST(MIN(bucket) AS BIGINT)     AS first_filled,
               CAST(MAX(bucket) AS BIGINT)     AS last_filled,
               CAST(MIN(mn) AS BIGINT)         AS global_min_hash
        FROM filled GROUP BY doc_id
    """,
    tags=("dedup", "minhash", "documents"),
)
def dedup_minhash_oneperm_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ONE-PERMUTATION HASHING sparsity census (Li/Owen/Zhang): instead
    of k independent permutations, hash each token ONCE and split the
    32-bit hash space into 16 equal ranges — the per-range minimum is
    the OPH signature, k× cheaper than classic MinHash (which this repo
    uses elsewhere: ``minhash_signature``). OPH's known failure mode is
    EMPTY ranges on short documents (undefined signature slots that
    densification must fill); this census measures exactly that — per
    doc, how many of the 16 ranges are filled, the filled span, and the
    global min (= slot of the densification anchor). All integers (hash
    range split by integer division). One token pass + one two-level
    groupBy; no shuffle carries text. At 100 TB this decides OPH-vs-
    classic before committing a signature format."""
    from big_data_audio_classification_spark.operators.dedup import (
        token_hash,
        tokens_col,
    )

    d = load_table(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.explode(tokens_col(F.col("text"))).alias("tok"))
    h = toks.select("doc_id", token_hash(F.col("tok")).alias("hv"))
    filled = h.groupBy(
        "doc_id", F.expr(f"hv DIV {OPH_RANGE}").alias("bucket")
    ).agg(F.min("hv").alias("mn"))
    return filled.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_filled"),
        F.min("bucket").cast("bigint").alias("first_filled"),
        F.max("bucket").cast("bigint").alias("last_filled"),
        F.min("mn").cast("bigint").alias("global_min_hash"),
    )


# ---------------------------------------------------------------------------
# dedup/lsh: the S-curve — empirical vs theoretical band-collision rate
# ---------------------------------------------------------------------------

# r11 (VERDICT r10 item 7): the S-curve diagnostic's cost is its
# SAMPLED PAIR MASS, and mod-5 priced it as the most expensive bench
# query (10.5 s in the contended driver run). Calibration quality
# depends on pairs RETAINED, not corpus coverage — mod-10 keeps
# thousands of positive-Jaccard pairs per decile at sf0.1 (ample for a
# 10-point curve) at ~quarter the pair mass. The oracle is generated
# from this SAME constant, so both engines state the identical sample
# and the gate re-certifies the changed result set (RECERTIFY r11).
AMP_SAMPLE_MOD = 10


def _amp_curve_sql() -> str:
    from big_data_audio_classification_spark.operators.dedup import (
        LSH_BANDS,
        LSH_ROWS,
        _minhash_sql,
    )

    band_or = " OR ".join(
        "("
        + " AND ".join(
            f"a.m{b * LSH_ROWS + r} = b.m{b * LSH_ROWS + r}"
            for r in range(LSH_ROWS)
        )
        + ")"
        for b in range(LSH_BANDS)
    )
    inner = f"(SELECT * FROM documents WHERE doc_id % {AMP_SAMPLE_MOD} = 0)"
    theory = (
        f"ROUND(1.0 - POWER(1.0 - POWER((jbin + 0.5) / 10.0, {LSH_ROWS}),"
        f" {LSH_BANDS}), 6)"
    )
    return f"""
        WITH sig AS ({_minhash_sql(inner)}),
        tok AS (
            SELECT DISTINCT doc_id,
                   UNNEST(list_filter(string_split(text, ' '),
                                      t -> t <> '')) AS tok
            FROM documents WHERE doc_id % {AMP_SAMPLE_MOD} = 0
        ),
        sizes AS (SELECT doc_id, COUNT(*) AS n FROM tok GROUP BY doc_id),
        inter AS (
            SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS ci
            FROM tok a JOIN tok b
              ON a.tok = b.tok AND a.doc_id < b.doc_id
            GROUP BY a.doc_id, b.doc_id
        ),
        pairs AS (
            SELECT i.id_a, i.id_b,
                   LEAST((10 * i.ci) // (sa.n + sb.n - i.ci), 9) AS jbin,
                   ({band_or}) AS collided
            FROM inter i
            JOIN sizes sa ON sa.doc_id = i.id_a
            JOIN sizes sb ON sb.doc_id = i.id_b
            JOIN sig a ON a.doc_id = i.id_a
            JOIN sig b ON b.doc_id = i.id_b
        )
        SELECT CAST(jbin AS BIGINT)                       AS jbin,
               CAST(COUNT(*) AS BIGINT)                   AS n_pairs,
               CAST(SUM(CASE WHEN collided THEN 1 ELSE 0 END) AS BIGINT)
                                                          AS n_collided,
               ROUND(CAST(SUM(CASE WHEN collided THEN 1 ELSE 0 END)
                          AS DOUBLE) / COUNT(*), 6)       AS empirical_rate,
               {theory}                                   AS theoretical_rate
        FROM pairs GROUP BY jbin
    """


@query(
    "dedup_lsh_amplification_curve",
    oracle=_amp_curve_sql(),
    tags=("dedup", "lsh", "minhash", "report", "documents"),
)
def dedup_lsh_amplification_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The LSH S-CURVE, measured: for every positive-Jaccard pair in
    the doc_id%5 sample, compare the EMPIRICAL band-collision rate per
    exact-Jaccard decile against the THEORETICAL amplification
    1−(1−J^r)^b at the bin midpoint — the calibration plot (Leskovec/
    Rajaraman/Ullman fig.) that justifies a (bands=4, rows=4) config
    before running it on 100 TB. Pair formation is the
    token-intersection equi-join (never all-pairs; zero-overlap pairs
    have J=0 and theoretical rate 0 — excluded by construction, stated
    identically in both engines) — its cost is the SAMPLED PAIR MASS,
    which is corpus-dependent: under the template-similar blow-up
    model it grows ~K² (measured r09: 34x wall at K=10 on a flat
    10-row output, scripts/blowup_headline.py → PLANS.md). That is
    inherent to any calibration that verifies pairs; the knob is
    AMP_SAMPLE_MOD — calibration quality depends on pairs RETAINED,
    not corpus coverage, so a pair-mass-heavy corpus raises the
    modulus (the bucket profile's pair_mass column prices this before
    running, same discipline as the r06 CONT_DF_CAP knob). The
    Jaccard decile is computed in EXACT integers ((10·ci) // union,
    clamped to 9); collision truth is a pure integer signature
    comparison; the only floats are the two final rate expressions,
    written identically in both dialects. Output ≤ 10 rows at any
    SF."""
    from big_data_audio_classification_spark.operators.dedup import (
        LSH_BANDS,
        LSH_ROWS,
        minhash_signature,
        tokens_col,
    )

    d = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") % AMP_SAMPLE_MOD == 0
    )
    sig = minhash_signature(d, "doc_id", "text").persist()
    tok = (
        d.select("doc_id", F.explode(tokens_col(F.col("text"))).alias("tok"))
        .distinct()
        .persist()
    )
    sizes = tok.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    ta = tok.select(F.col("doc_id").alias("id_a"), "tok")
    tb = tok.select(F.col("doc_id").alias("id_b"), "tok")
    inter = (
        ta.join(tb, "tok")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("ci"))
    )
    sa = sizes.select(F.col("doc_id").alias("id_a"), F.col("n").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("id_b"), F.col("n").alias("nb"))
    siga = sig.select(
        F.col("doc_id").alias("id_a"),
        *[F.col(f"m{j}").alias(f"am{j}") for j in range(16)],
    )
    sigb = sig.select(
        F.col("doc_id").alias("id_b"),
        *[F.col(f"m{j}").alias(f"bm{j}") for j in range(16)],
    )
    collided = F.lit(False)
    for b in range(LSH_BANDS):
        agree = F.lit(True)
        for r in range(LSH_ROWS):
            j = b * LSH_ROWS + r
            agree = agree & (F.col(f"am{j}") == F.col(f"bm{j}"))
        collided = collided | agree
    jbin = F.least(
        F.expr("(10 * ci) DIV (na + nb - ci)"), F.lit(9)
    ).cast("bigint")
    pairs = (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .join(siga, "id_a")
        .join(sigb, "id_b")
        .select(jbin.alias("jbin"), collided.alias("collided"))
    )
    n_coll = F.sum(F.when(F.col("collided"), 1).otherwise(0))
    theory = F.round(
        1.0
        - F.pow(
            1.0 - F.pow((F.col("jbin") + 0.5) / 10.0, float(LSH_ROWS)),
            float(LSH_BANDS),
        ),
        6,
    )
    return pairs.groupBy("jbin").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        n_coll.cast("bigint").alias("n_collided"),
        F.round(n_coll.cast("double") / F.count(F.lit(1)), 6).alias(
            "empirical_rate"
        ),
    ).select("jbin", "n_pairs", "n_collided", "empirical_rate",
             theory.alias("theoretical_rate"))


# ---------------------------------------------------------------------------
# dedup/simhash: Manku rotation-table profile
# ---------------------------------------------------------------------------

ROT_SHIFTS = (0, 8, 16, 24)
ROT_PREFIX_BITS = 12
_U32 = 4_294_967_295


def _simhash_rotation_sql() -> str:
    from big_data_audio_classification_spark.operators.dedup import _simhash_sql

    legs = "\n        UNION ALL\n        ".join(
        f"""SELECT {r} AS rotation,
                   ((simhash << {r}) | (simhash >> {32 - r})) & {_U32}
                       AS rotated
            FROM sh"""
        if r else
        """SELECT 0 AS rotation, simhash AS rotated FROM sh"""
        for r in ROT_SHIFTS
    )
    return f"""
        WITH sh AS ({_simhash_sql()}),
        rot AS (
        {legs}
        ),
        buckets AS (
            SELECT rotation, rotated >> {32 - ROT_PREFIX_BITS} AS bucket,
                   CAST(COUNT(*) AS BIGINT) AS s
            FROM rot GROUP BY rotation, rotated >> {32 - ROT_PREFIX_BITS}
        )
        SELECT CAST(rotation AS BIGINT)           AS rotation,
               CAST(COUNT(*) AS BIGINT)           AS n_buckets,
               CAST(MAX(s) AS BIGINT)             AS max_bucket,
               CAST(SUM(s * (s - 1) // 2) AS BIGINT) AS pair_mass
        FROM buckets GROUP BY rotation
    """


@query(
    "dedup_simhash_rotation_profile",
    oracle=_simhash_rotation_sql(),
    tags=("dedup", "simhash", "report", "documents"),
)
def dedup_simhash_rotation_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MANKU ROTATION TABLES, profiled: the Manku-Jain-Sarma near-dup
    design keeps T rotated copies of every fingerprint so a 12-bit
    PREFIX probe catches bit flips in any region; this report prices
    each rotation's table (bucket count, hottest bucket, candidate
    pair mass) before building it. Rotation is exact integer bit
    arithmetic — ((f << r) | (f >> 32−r)) & 0xFFFFFFFF — identical in both
    dialects; pair mass in DECIMAL(38,0)-safe range here (12-bit
    prefixes bound s), stated with the same Σ s(s−1)/2 idiom. One
    fingerprint pass; 4 shift+groupBy legs over the 1-row-per-doc
    frame; output = 4 rows at any SF (prefix-length sweep sibling:
    ``dedup_simhash_prefix_schedule``)."""
    from big_data_audio_classification_spark.operators.dedup import dedup_simhash

    sh = dedup_simhash(spark, sf_dir)
    legs = []
    for r in ROT_SHIFTS:
        if r == 0:
            rotated = F.col("simhash")
        else:
            rotated = (
                F.shiftleft("simhash", r)
                .bitwiseOR(F.shiftright("simhash", 32 - r))
                .bitwiseAND(F.lit(_U32))
            )
        legs.append(
            sh.select(
                F.lit(r).alias("rotation"),
                rotated.alias("rotated"),
            )
        )
    rot = legs[0]
    for leg in legs[1:]:
        rot = rot.unionByName(leg)
    buckets = rot.groupBy(
        "rotation",
        F.shiftright("rotated", 32 - ROT_PREFIX_BITS).alias("bucket"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("s"))
    return buckets.groupBy(
        F.col("rotation").cast("bigint").alias("rotation")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_buckets"),
        F.max("s").cast("bigint").alias("max_bucket"),
        (F.sum(F.col("s").cast("decimal(38,0)") * (F.col("s") - 1)) / 2)
        .cast("bigint")
        .alias("pair_mass"),
    )


# ---------------------------------------------------------------------------
# text/tfidf: pivoted length normalization (Singhal) query scoring
# ---------------------------------------------------------------------------

PIV_S = 0.2  # pivot slope (the Singhal et al. default)
PIV_TERMS = ("table", "query", "stream")
PIV_TOPK = 10


def _pivoted_sql() -> str:
    tf_cols = ", ".join(
        f"CAST(SUM(CASE WHEN tok = '{t}' THEN 1 ELSE 0 END) AS BIGINT) AS tf{i}"
        for i, t in enumerate(PIV_TERMS, 1)
    )
    df_cols = ", ".join(
        f"CAST(SUM(CASE WHEN tf{i} > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df{i}"
        for i in range(1, 4)
    )
    score = " + ".join(
        f"""(tf{i} / ((1.0 - {PIV_S}) + {PIV_S} * dl / avgdl))
               * LN((n_docs + 1.0) / df{i})"""
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
            SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs,
                   CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl,
                   {df_cols}
            FROM per_doc
        ),
        scored AS (
            SELECT doc_id, dl, tf1, tf2, tf3,
                   ROUND({score}, 6) AS piv_score
            FROM per_doc, corpus
            WHERE tf1 + tf2 + tf3 > 0
        )
        SELECT doc_id, dl, tf1, tf2, tf3, piv_score,
               CAST(ROW_NUMBER() OVER (ORDER BY piv_score DESC, doc_id)
                    AS BIGINT) AS rank
        FROM scored QUALIFY rank <= {PIV_TOPK}
    """


@query(
    "text_tfidf_pivoted_norm",
    oracle=_pivoted_sql(),
    tags=("text", "tfidf", "topk", "documents"),
)
def text_tfidf_pivoted_norm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOTED LENGTH NORMALIZATION (Singhal/Buckley/Mitra, s=0.2):
    tf/((1−s) + s·dl/avgdl) · ln((N+1)/df) summed over a fixed 3-term
    query — the pre-BM25 fix for cosine normalization's short-document
    bias, and the third member of this repo's retrieval-scoring family
    (``text_bm25_rank``, ``text_tfidf_query_rank``). Everything
    upstream of the score is EXACT integers (tf, dl, df, N); the score
    is ONE float expression template with the three per-term
    contributions summed in fixed textual order in both dialects.
    Corpus stats are a 1-row broadcast; top-10 ranks scored docs only
    (zero-match docs pruned before the sort). One token pass, one
    aggregate, one k-bounded sort."""
    from big_data_audio_classification_spark.operators.dedup import tokens_col

    d = load_table(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.explode(tokens_col(F.col("text"))).alias("tok"))
    per_doc = toks.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("dl"),
        *[
            F.sum(F.when(F.col("tok") == t, 1).otherwise(0))
            .cast("bigint")
            .alias(f"tf{i}")
            for i, t in enumerate(PIV_TERMS, 1)
        ],
    )
    corpus = per_doc.agg(
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        (F.sum("dl").cast("double") / F.count(F.lit(1))).alias("avgdl"),
        *[
            F.sum(F.when(F.col(f"tf{i}") > 0, 1).otherwise(0))
            .cast("double")
            .alias(f"df{i}")
            for i in range(1, 4)
        ],
    )
    score = None
    for i in range(1, 4):
        term = (
            F.col(f"tf{i}")
            / ((1.0 - PIV_S) + PIV_S * F.col("dl") / F.col("avgdl"))
        ) * F.log((F.col("n_docs") + 1.0) / F.col(f"df{i}"))
        score = term if score is None else score + term
    scored = (
        per_doc.crossJoin(F.broadcast(corpus))
        .filter(F.col("tf1") + F.col("tf2") + F.col("tf3") > 0)
        .select(
            "doc_id", "dl", "tf1", "tf2", "tf3",
            F.round(score, 6).alias("piv_score"),
        )
    )
    w = Window.orderBy(F.col("piv_score").desc(), "doc_id")
    return scored.select(
        "*", F.row_number().over(w).cast("bigint").alias("rank")
    ).filter(F.col("rank") <= PIV_TOPK)


# ---------------------------------------------------------------------------
# text/lm: Kneser-Ney unigram continuation probability
# ---------------------------------------------------------------------------

KN_TERMS = ("table", "query", "stream")


def _kn_sql() -> str:
    legs = "\n        UNION ALL\n        ".join(
        f"""SELECT '{t}' AS term,
                   (SELECT CAST(COUNT(DISTINCT w_prev) AS BIGINT)
                    FROM bigrams WHERE w_next = '{t}') AS cont_types,
                   t.n_bigram_types,
                   t.n_tokens,
                   (SELECT CAST(COUNT(*) AS BIGINT)
                    FROM toks WHERE tok = '{t}') AS unigram_count
            FROM totals t"""
        for t in KN_TERMS
    )
    return f"""
        WITH toks AS (
            SELECT doc_id,
                   UNNEST(list_filter(string_split(text, ' '),
                                      t -> t <> '')) AS tok,
                   CAST(generate_subscripts(
                       list_filter(string_split(text, ' '), t -> t <> ''), 1)
                       AS BIGINT) AS pos
            FROM documents
        ),
        bigrams AS (
            SELECT DISTINCT a.tok AS w_prev, b.tok AS w_next
            FROM toks a JOIN toks b
              ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
        ),
        totals AS (
            SELECT CAST((SELECT COUNT(*) FROM bigrams) AS BIGINT)
                       AS n_bigram_types,
                   CAST((SELECT COUNT(*) FROM toks) AS BIGINT) AS n_tokens
        )
        SELECT term, cont_types, n_bigram_types,
               ROUND(CAST(cont_types AS DOUBLE) / n_bigram_types, 6)
                   AS p_continuation,
               ROUND(CAST(unigram_count AS DOUBLE) / n_tokens, 6) AS p_mle
        FROM ({legs})
    """


@query(
    "text_lm_kneser_ney_unigram",
    oracle=_kn_sql(),
    tags=("text", "lm", "documents"),
)
def text_lm_kneser_ney_unigram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KNESER-NEY CONTINUATION probability for the query terms:
    P_cont(w) = |{w′ : (w′,w) seen}| / |distinct bigram types| — the
    insight that makes KN the strongest classical n-gram smoothing
    ("Francisco" is frequent but follows only "San", so its continuation
    mass is tiny), contrasted against the raw unigram MLE in the same
    row. Bigram types form via a position self-join (pos+1 — positions
    from ``posexplode``/``generate_subscripts``, never a scan-order
    ROW_NUMBER); all counts exact integers; the two probabilities are
    single divisions. One token pass + one keyed self-join; output = 3
    rows at any SF (smoothing family: ``text_lm_jelinek_mercer``,
    ``text_lm_dirichlet_prior``, ``text_lm_absolute_discount``,
    ``text_lm_good_turing``)."""
    from big_data_audio_classification_spark.operators.dedup import tokens_col

    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        F.posexplode(tokens_col(F.col("text"))).alias("pos", "tok"),
    )
    a = toks.select("doc_id", F.col("pos").alias("pa"), F.col("tok").alias("w_prev"))
    b = toks.select("doc_id", F.col("pos").alias("pb"), F.col("tok").alias("w_next"))
    bigrams = (
        a.join(b, "doc_id")
        .filter(F.col("pb") == F.col("pa") + 1)
        .select("w_prev", "w_next")
        .distinct()
        .persist()
    )
    totals = bigrams.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_bigram_types")
    ).crossJoin(
        toks.agg(F.count(F.lit(1)).cast("bigint").alias("n_tokens"))
    )
    legs = []
    for t in KN_TERMS:
        cont = bigrams.filter(F.col("w_next") == t).agg(
            F.countDistinct("w_prev").cast("bigint").alias("cont_types")
        )
        uni = toks.filter(F.col("tok") == t).agg(
            F.count(F.lit(1)).cast("bigint").alias("unigram_count")
        )
        legs.append(
            cont.crossJoin(F.broadcast(totals)).crossJoin(F.broadcast(uni))
            .select(
                F.lit(t).alias("term"),
                "cont_types",
                "n_bigram_types",
                F.round(
                    F.col("cont_types").cast("double")
                    / F.col("n_bigram_types"),
                    6,
                ).alias("p_continuation"),
                F.round(
                    F.col("unigram_count").cast("double") / F.col("n_tokens"),
                    6,
                ).alias("p_mle"),
            )
        )
    out = legs[0]
    for leg in legs[1:]:
        out = out.unionByName(leg)
    return out


# ---------------------------------------------------------------------------
# sketch: portable Bloom filter with measured vs theoretical FPR
# ---------------------------------------------------------------------------

BLOOM_M = 16_384  # bits
BLOOM_K = 3       # hash functions (disjoint md5 hex windows)


def _bloom_hash_sql(col: str, j: int) -> str:
    lo = 1 + 6 * j
    return (
        f"CAST(('0x' || substr(md5(CAST({col} AS VARCHAR)), {lo}, 6))"
        f" AS BIGINT) % {BLOOM_M}"
    )


@query(
    "sketch_bloom_filter_portable",
    oracle=f"""
        WITH ins AS (
            SELECT c_custkey AS k FROM customer
            WHERE c_mktsegment = 'BUILDING'
        ),
        probe AS (
            SELECT c_custkey AS k FROM customer
            WHERE c_mktsegment = 'MACHINERY'
        ),
        bits AS (
            SELECT DISTINCT pos FROM (
                SELECT {_bloom_hash_sql('k', 0)} AS pos FROM ins
                UNION ALL SELECT {_bloom_hash_sql('k', 1)} FROM ins
                UNION ALL SELECT {_bloom_hash_sql('k', 2)} FROM ins
            )
        ),
        hits AS (
            SELECT p.k, COUNT(b.pos) AS n_hit
            FROM (
                SELECT k, {_bloom_hash_sql('k', 0)} AS pos FROM probe
                UNION ALL SELECT k, {_bloom_hash_sql('k', 1)} FROM probe
                UNION ALL SELECT k, {_bloom_hash_sql('k', 2)} FROM probe
            ) p LEFT JOIN bits b ON p.pos = b.pos
            GROUP BY p.k
        ),
        stats AS (
            SELECT CAST((SELECT COUNT(*) FROM ins) AS BIGINT)  AS n_inserted,
                   CAST((SELECT COUNT(*) FROM bits) AS BIGINT) AS n_bits_set,
                   CAST((SELECT COUNT(*) FROM probe) AS BIGINT) AS n_probed,
                   CAST((SELECT COUNT(*) FROM hits WHERE n_hit = {BLOOM_K})
                        AS BIGINT)                             AS n_false_pos
        )
        SELECT n_inserted, n_bits_set, n_probed, n_false_pos,
               ROUND(CAST(n_false_pos AS DOUBLE) / n_probed, 6)
                   AS measured_fpr,
               ROUND(POWER(CAST(n_bits_set AS DOUBLE) / {BLOOM_M},
                           {BLOOM_K}), 6) AS occupancy_fpr
        FROM stats
    """,
    tags=("aggregate", "sketch", "customer"),
)
def sketch_bloom_filter_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PORTABLE BLOOM FILTER, simulated relationally and calibrated:
    insert one customer segment's keys (k=3 hash functions = disjoint
    md5 hex windows mod m=16384 — the same cross-engine-identical hash
    family as ``token_hash``), probe a DISJOINT segment, and report
    measured false-positive rate against the occupancy-based
    prediction (bits_set/m)^k — the calibration every engine's
    bloom-filter JOIN PRUNING rests on (Spark's own
    ``spark.sql.optimizer.runtime.bloomFilter`` makes exactly this
    trade). The filter IS a relation (distinct bit positions), insert
    is a union+distinct, probe is a LEFT equi-join counting hits = k —
    no engine-specific sketch binary crosses the contract, so the
    oracle checks the SAME filter bit-for-bit. All integers up to two
    final float expressions. At 100 TB: bits table ≤ m rows regardless
    of key count; probe is one broadcast-join pass."""
    c = load_table(spark, sf_dir, "customer")
    ins = c.filter(F.col("c_mktsegment") == "BUILDING").select(
        F.col("c_custkey").alias("k")
    )
    probe = c.filter(F.col("c_mktsegment") == "MACHINERY").select(
        F.col("c_custkey").alias("k")
    )

    def hpos(j: int):
        lo = 1 + 6 * j
        return (
            F.conv(F.substring(F.md5(F.col("k").cast("string")), lo, 6), 16, 10)
            .cast("bigint") % BLOOM_M
        )

    bits = (
        ins.select(hpos(0).alias("pos"))
        .unionAll(ins.select(hpos(1).alias("pos")))
        .unionAll(ins.select(hpos(2).alias("pos")))
        .distinct()
    )
    probe_pos = (
        probe.select("k", hpos(0).alias("pos"))
        .unionAll(probe.select("k", hpos(1).alias("pos")))
        .unionAll(probe.select("k", hpos(2).alias("pos")))
    )
    hits = (
        probe_pos.join(F.broadcast(bits.withColumn("hit", F.lit(1))), "pos", "left")
        .groupBy("k")
        .agg(F.count("hit").alias("n_hit"))
    )
    stats = (
        ins.agg(F.count(F.lit(1)).cast("bigint").alias("n_inserted"))
        .crossJoin(
            F.broadcast(
                bits.agg(F.count(F.lit(1)).cast("bigint").alias("n_bits_set"))
            )
        )
        .crossJoin(
            F.broadcast(
                probe.agg(F.count(F.lit(1)).cast("bigint").alias("n_probed"))
            )
        )
        .crossJoin(
            F.broadcast(
                hits.filter(F.col("n_hit") == BLOOM_K).agg(
                    F.count(F.lit(1)).cast("bigint").alias("n_false_pos")
                )
            )
        )
    )
    return stats.select(
        "n_inserted",
        "n_bits_set",
        "n_probed",
        "n_false_pos",
        F.round(
            F.col("n_false_pos").cast("double") / F.col("n_probed"), 6
        ).alias("measured_fpr"),
        F.round(
            F.pow(
                F.col("n_bits_set").cast("double") / BLOOM_M, float(BLOOM_K)
            ),
            6,
        ).alias("occupancy_fpr"),
    )


# ---------------------------------------------------------------------------
# topk: tie-aware top-k via dense_rank
# ---------------------------------------------------------------------------

TOPK_TIED_K = 3


@query(
    "topk_tied_dense_rank",
    oracle=f"""
        WITH x AS (
            SELECT o_orderpriority AS priority,
                   strftime(o_orderdate, '%Y-%m-%d') AS odate,
                   CAST(COUNT(*) AS BIGINT) AS n_orders
            FROM orders GROUP BY o_orderpriority, o_orderdate
        ),
        r AS (
            SELECT priority, odate, n_orders,
                   CAST(DENSE_RANK() OVER (PARTITION BY priority
                                           ORDER BY n_orders DESC)
                        AS BIGINT) AS rnk
            FROM x
        )
        SELECT priority, odate, n_orders, rnk
        FROM r WHERE rnk <= {TOPK_TIED_K}
    """,
    tags=("window", "topk", "orders"),
)
def topk_tied_dense_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TIE-AWARE top-k: the k busiest order DATES per priority by
    DENSE_RANK — every date tied at a kept rank survives, so the
    output is a complete answer set rather than an arbitrary
    tie-broken sample (the row_number sibling keeps exactly k rows:
    ``topk_orders_per_customer``, r01). Ranking on an exact integer
    count makes ties REAL and the result deterministic without a
    tiebreak column — which is the point of the dense_rank contract.
    One count shuffle + one partitioned window; at 100 TB the window
    input is already one-row-per-(priority,date), dimension-bounded."""
    o = load_table(spark, sf_dir, "orders")
    x = o.groupBy(
        F.col("o_orderpriority").alias("priority"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("odate"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n_orders"))
    w = Window.partitionBy("priority").orderBy(F.col("n_orders").desc())
    return x.select(
        "*", F.dense_rank().over(w).cast("bigint").alias("rnk")
    ).filter(F.col("rnk") <= TOPK_TIED_K)


# ---------------------------------------------------------------------------
# asof: k-th-prior as-of join (the lag-of-asof shape)
# ---------------------------------------------------------------------------


@query(
    "join_asof_second_prior",
    oracle="""
        WITH p AS (
            SELECT event_id, user_id, ts FROM events
            WHERE event_type = 'purchase'
        ),
        c AS (
            SELECT event_id, user_id, ts FROM events
            WHERE event_type = 'click'
        ),
        j AS (
            SELECT p.event_id AS purchase_id, c.event_id AS click_id,
                   epoch_us(p.ts) - epoch_us(c.ts) AS gap_us,
                   ROW_NUMBER() OVER (PARTITION BY p.event_id
                                      ORDER BY c.ts DESC, c.event_id DESC)
                       AS rn
            FROM p LEFT JOIN c
              ON c.user_id = p.user_id AND c.ts <= p.ts
        )
        SELECT purchase_id,
               CAST(COUNT(click_id) AS BIGINT)             AS n_prior_clicks,
               MAX(CASE WHEN rn = 2 THEN click_id END)     AS second_click_id,
               MAX(CASE WHEN rn = 2 THEN gap_us // 1000000 END)
                                                           AS second_gap_s
        FROM j GROUP BY purchase_id
    """,
    tags=("relational", "join", "asof", "events"),
)
def join_asof_second_prior(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-TH-PRIOR as-of join (k=2): for every purchase, the SECOND most
    recent prior click by the same user — the "lag of as-of" shape
    behind features like "time since the click before the converting
    click" that a plain rn=1 as-of can't express. Purchases with fewer
    than two prior clicks keep their row with honest NULLs (the
    aggregate-over-ranked-join form — never a dropped left row). Gap
    in exact integer seconds (micros DIV 1e6). One user-keyed join +
    one partitioned window; the per-purchase rank frame is bounded by
    that user's click history (as-of family: ``join_asof_locf_grid``
    r08, ``join_asof_forward_tolerance`` r08,
    ``join_asof_purchase_click`` r01)."""
    e = load_table(spark, sf_dir, "events")
    p = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("pts"),
    )
    c = e.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        "user_id",
        F.col("ts").alias("cts"),
    )
    j = p.join(c, (p.user_id == c.user_id) & (c.cts <= p.pts), "left").select(
        "purchase_id",
        "click_id",
        (F.unix_micros("pts") - F.unix_micros("cts")).alias("gap_us"),
        F.row_number()
        .over(
            Window.partitionBy("purchase_id").orderBy(
                F.col("cts").desc(), F.col("click_id").desc()
            )
        )
        .alias("rn"),
    )
    return j.groupBy("purchase_id").agg(
        F.count("click_id").cast("bigint").alias("n_prior_clicks"),
        F.max(F.when(F.col("rn") == 2, F.col("click_id"))).alias(
            "second_click_id"
        ),
        F.max(
            F.when(F.col("rn") == 2, F.expr("gap_us DIV 1000000"))
        ).alias("second_gap_s"),
    )


# ---------------------------------------------------------------------------
# setop: overlap coefficient between two key sets
# ---------------------------------------------------------------------------


@query(
    "set_overlap_coefficient",
    oracle="""
        WITH a AS (SELECT DISTINCT o_custkey AS k FROM orders
                   WHERE o_orderstatus = 'F'),
        b AS (SELECT DISTINCT o_custkey AS k FROM orders
              WHERE o_orderstatus = 'O'),
        i AS (SELECT k FROM a INTERSECT SELECT k FROM b),
        s AS (
            SELECT CAST((SELECT COUNT(*) FROM a) AS BIGINT) AS n_a,
                   CAST((SELECT COUNT(*) FROM b) AS BIGINT) AS n_b,
                   CAST((SELECT COUNT(*) FROM i) AS BIGINT) AS n_inter
        )
        SELECT n_a, n_b, n_inter,
               ROUND(CAST(n_inter AS DOUBLE) / LEAST(n_a, n_b), 6)
                   AS overlap_coef,
               ROUND(CAST(n_inter AS DOUBLE) / (n_a + n_b - n_inter), 6)
                   AS jaccard
        FROM s
    """,
    tags=("relational", "setop", "orders"),
)
def set_overlap_coefficient(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SET-SIMILARITY over key sets: customers with finished ('F') vs
    open ('O') orders — intersection size via INTERSECT, then the
    OVERLAP COEFFICIENT |A∩B|/min(|A|,|B|) (the containment-style
    measure that ignores size imbalance) next to Jaccard — the two
    numbers that disagree exactly when one set nests inside the other
    (the segment-migration diagnostic). Set ops lower to distinct-
    aggregated semi-joins (one shuffle each); the three counts are
    exact integers feeding two final float divisions. Output = 1 row
    at any SF (multiset siblings: ``set_multiset_intersect_except``,
    ``set_symdiff_active_customers`` r08)."""
    o = load_table(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderstatus") == "F").select(
        F.col("o_custkey").alias("k")
    ).distinct()
    b = o.filter(F.col("o_orderstatus") == "O").select(
        F.col("o_custkey").alias("k")
    ).distinct()
    i = a.intersect(b)
    s = (
        a.agg(F.count(F.lit(1)).cast("bigint").alias("n_a"))
        .crossJoin(F.broadcast(b.agg(F.count(F.lit(1)).cast("bigint").alias("n_b"))))
        .crossJoin(
            F.broadcast(i.agg(F.count(F.lit(1)).cast("bigint").alias("n_inter")))
        )
    )
    return s.select(
        "n_a",
        "n_b",
        "n_inter",
        F.round(
            F.col("n_inter").cast("double") / F.least("n_a", "n_b"), 6
        ).alias("overlap_coef"),
        F.round(
            F.col("n_inter").cast("double")
            / (F.col("n_a") + F.col("n_b") - F.col("n_inter")),
            6,
        ).alias("jaccard"),
    )


# ---------------------------------------------------------------------------
# subquery: relational division (the "for all" query)
# ---------------------------------------------------------------------------


@query(
    "subquery_relational_division",
    oracle="""
        SELECT c.o_custkey AS custkey,
               CAST(COUNT(*) AS BIGINT) AS n_orders
        FROM orders c
        WHERE NOT EXISTS (
            SELECT 1 FROM (SELECT DISTINCT o_orderpriority FROM orders) p
            WHERE NOT EXISTS (
                SELECT 1 FROM orders o
                WHERE o.o_custkey = c.o_custkey
                  AND o.o_orderpriority = p.o_orderpriority
            )
        )
        GROUP BY c.o_custkey
    """,
    tags=("relational", "subquery", "orders"),
)
def subquery_relational_division(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RELATIONAL DIVISION — the "customers who ordered at EVERY
    priority level" FOR-ALL query. The oracle states it in Codd's
    double-NOT-EXISTS form (the canonical universal quantification);
    the Spark plan uses the COUNTING equivalence — countDistinct
    priorities per customer == total distinct priorities — which is
    the form that scales (two aggregates + one 1-row broadcast,
    instead of nested correlated anti-joins). Two genuinely different
    formulations, one answer; per-customer order counts ride along.
    All integers."""
    o = load_table(spark, sf_dir, "orders")
    total = o.select(
        F.countDistinct("o_orderpriority").alias("n_prio")
    )
    per_cust = o.groupBy(F.col("o_custkey").alias("custkey")).agg(
        F.countDistinct("o_orderpriority").alias("n_prio_cust"),
        F.count(F.lit(1)).cast("bigint").alias("n_orders"),
    )
    return (
        per_cust.crossJoin(F.broadcast(total))
        .filter(F.col("n_prio_cust") == F.col("n_prio"))
        .select("custkey", "n_orders")
    )


# ---------------------------------------------------------------------------
# range-join: coverage-gap anti form (days no interval covers)
# ---------------------------------------------------------------------------

COVER_DAYS = 7  # each order covers [o_orderdate, +7d)


@query(
    "join_range_coverage_gaps",
    oracle=f"""
        WITH span AS (
            SELECT MIN(o_orderdate) AS lo, MAX(o_orderdate) AS hi
            FROM orders
        ),
        grid AS (
            SELECT UNNEST(generate_series(lo, hi, INTERVAL 1 DAY)) AS day
            FROM span
        ),
        covered AS (
            SELECT DISTINCT o_orderdate
                       + (INTERVAL 1 DAY) * UNNEST(range(0, {COVER_DAYS}))
                       AS day
            FROM orders
        )
        SELECT strftime(g.day, '%Y-%m-%d') AS gap_day
        FROM grid g LEFT JOIN covered c ON g.day = c.day
        WHERE c.day IS NULL
    """,
    tags=("relational", "join", "range-join", "orders"),
)
def join_range_coverage_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COVERAGE-GAP detection — the ANTI form of the interval join:
    which calendar days does NO active order interval (7 days from
    order date) cover? The monitoring query behind "did ingestion ever
    go dark". Instead of a non-equi anti-join (day BETWEEN start AND
    end — a nested loop at scale), each interval EXPLODES into its ≤7
    covered days (bounded fan-out) and the gap check is a pure
    equi-LEFT-ANTI against the day grid — the same bucketing
    discipline as ``join_range_month_overlap``. All dates; no floats.
    Output = gap days only (usually none at dense SFs — an empty
    result is the healthy answer, and the oracle agrees on emptiness
    bit-for-bit)."""
    o = load_table(spark, sf_dir, "orders")
    span = o.agg(
        F.min("o_orderdate").alias("lo"), F.max("o_orderdate").alias("hi")
    )
    grid = span.select(
        F.explode(
            F.sequence("lo", "hi", F.expr("INTERVAL 1 DAY"))
        ).alias("day")
    )
    covered = o.select(
        F.explode(
            F.sequence(
                F.col("o_orderdate"),
                F.col("o_orderdate")
                + F.expr(f"INTERVAL {COVER_DAYS - 1} DAY"),
                F.expr("INTERVAL 1 DAY"),
            )
        ).alias("day")
    ).distinct()
    return grid.join(covered, "day", "left_anti").select(
        F.date_format("day", "yyyy-MM-dd").alias("gap_day")
    )


# ---------------------------------------------------------------------------
# window-time: tumbling windows via the window() table function
# ---------------------------------------------------------------------------

TUMBLE_HOURS = 6


@query(
    "events_tumbling_window_fn",
    oracle=f"""
        WITH x AS (
            -- integer micros, never epoch()'s fractional-second DOUBLE
            SELECT to_timestamp((epoch_us(ts)
                                 // {TUMBLE_HOURS * 3_600_000_000})
                                * {TUMBLE_HOURS * 3600}) AS wstart,
                   CAST(ROUND(value * 100) AS BIGINT) AS cents
            FROM events
        )
        SELECT strftime(wstart, '%Y-%m-%d %H:%M:%S') AS window_start,
               CAST(COUNT(*) AS BIGINT)              AS n_events,
               CAST(SUM(cents) AS BIGINT)            AS sum_cents
        FROM x GROUP BY wstart
    """,
    tags=("events", "window-time", "aggregate"),
)
def events_tumbling_window_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TUMBLING event-time windows via Spark's native ``window()``
    table function (epoch-aligned 6-hour buckets — the same operator
    Structured Streaming uses for watermarked aggregation, here on a
    batch frame), while the oracle restates the bucketing as integer
    epoch floor-division — two formulations of the window boundary
    contract, which is exactly what goes wrong first in event-time
    pipelines (off-by-one at bucket edges). Exact integer cents; one
    shuffle keyed by window. At 100 TB this is the pre-aggregation
    every event table gets before rollup (calendar-anchored sibling:
    ``window_rolling_time_stats`` r08; streaming form:
    ``streaming/events.py``)."""
    e = load_table(spark, sf_dir, "events")
    w = F.window("ts", f"{TUMBLE_HOURS} hours")
    return (
        e.select(w.alias("w"), F.round(F.col("value") * 100).cast("bigint").alias("cents"))
        .groupBy(F.col("w.start").alias("wstart"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.sum("cents").cast("bigint").alias("sum_cents"),
        )
        .select(
            F.date_format("wstart", "yyyy-MM-dd HH:mm:ss").alias(
                "window_start"
            ),
            "n_events",
            "sum_cents",
        )
    )


# ---------------------------------------------------------------------------
# rolling: exact rolling lower-median and MAD inside a 25-row frame
# ---------------------------------------------------------------------------

RMED_WINDOW = 24  # rows preceding (25-row frame with the current row)


@query(
    "window_rolling_median_mad",
    oracle=f"""
        WITH x AS (
            SELECT event_id, user_id, ts,
                   CAST(ROUND(value * 100) AS BIGINT) AS c
            FROM events
        ),
        fr AS (
            SELECT event_id, user_id,
                   list_sort(list(c) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN {RMED_WINDOW} PRECEDING AND CURRENT ROW))
                       AS xs
            FROM x
        ),
        med AS (
            SELECT event_id, user_id,
                   CAST(len(xs) AS BIGINT) AS n,
                   CAST(xs[(len(xs) + 1) // 2] AS BIGINT) AS roll_median_c
            FROM fr
        ),
        mad AS (
            SELECT f.event_id, f.user_id, m.n, m.roll_median_c,
                   CAST(list_sort(list_transform(f.xs,
                            v -> abs(v - m.roll_median_c)))
                        [(len(f.xs) + 1) // 2] AS BIGINT) AS roll_mad_c
            FROM fr f JOIN med m
              ON f.event_id = m.event_id AND f.user_id = m.user_id
        )
        SELECT event_id, user_id, n, roll_median_c, roll_mad_c
        FROM mad
    """,
    tags=("window", "rolling", "robust", "events"),
)
def window_rolling_median_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLING LOWER-MEDIAN and MAD over a 25-row frame — the robust
    rolling location/scale pair that a mean/stddev window gets wrong
    on every spike. Both statistics are EXACT INTEGERS by
    construction: frame values are integer cents, the LOWER median is
    the element at rank ⌈n/2⌉ of the sorted frame (declared lower, so
    even frames need no averaging — nothing to ULP), and MAD is the
    lower median of |x − median|. The frame materializes as an in-row
    array (``collect_list`` over the window, O(25) per row — bounded
    state), sorted and indexed with higher-order functions; the oracle
    states the same algebra through DuckDB's windowed list(). One
    shuffle keyed by user (moment-based sibling:
    ``window_rolling_skew_kurt`` r08)."""
    e = load_table(spark, sf_dir, "events")
    c = F.round(F.col("value") * 100).cast("bigint")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-RMED_WINDOW, Window.currentRow)
    )
    fr = e.select(
        "event_id",
        "user_id",
        F.array_sort(F.collect_list(c).over(w)).alias("xs"),
    )
    n = F.size("xs")
    med = F.element_at("xs", ((n + 1) / 2).cast("int"))
    withmed = fr.select(
        "event_id",
        "user_id",
        n.cast("bigint").alias("n"),
        med.cast("bigint").alias("roll_median_c"),
        F.array_sort(
            F.transform("xs", lambda v: F.abs(v - med))
        ).alias("devs"),
    )
    mad = F.element_at(
        "devs", ((F.size("devs") + 1) / 2).cast("int")
    )
    return withmed.select(
        "event_id",
        "user_id",
        "n",
        "roll_median_c",
        mad.cast("bigint").alias("roll_mad_c"),
    )


# ---------------------------------------------------------------------------
# similarity/ivf: per-cell quantization residual energy
# ---------------------------------------------------------------------------


def _ivf_residual_sql() -> str:
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
            SELECT vec_id, cell_id, d2
            FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
                            ORDER BY d2, cell_id) AS rn FROM d)
            WHERE rn = 1
        ),
        agg AS (
            SELECT cell_id,
                   CAST(COUNT(*) AS BIGINT) AS n_vecs,
                   list_sum(list(d2 ORDER BY vec_id)) AS sum_d2,
                   list_sort(list(d2)) AS sorted_d2
            FROM assign GROUP BY cell_id
        )
        SELECT cell_id, n_vecs,
               ROUND(sum_d2 / n_vecs, 6)                         AS mean_sq_residual,
               ROUND(sorted_d2[(95 * n_vecs + 99) // 100], 6)    AS p95_sq_residual
        FROM agg
    """


@query(
    "sim_ivf_residual_energy",
    oracle=_ivf_residual_sql(),
    tags=("similarity", "ivf", "report", "embeddings"),
)
def sim_ivf_residual_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF QUANTIZATION-RESIDUAL energy per cell: mean and p95 of the
    squared distance to the assigned coarse centroid — the number that
    prices how much recall an IVF(+PQ) index will lose to coarse
    quantization BEFORE building it (population balance is the other
    axis: ``sim_ivf_cell_balance`` r06). The per-vector d2 is the
    in-row fixed-order fold both engines share; the per-cell MEAN is a
    SEQUENTIAL vec_id-ordered fold (Spark ``aggregate(array_sort(
    collect_list(...)))`` vs DuckDB ``list_sum(list(d2 ORDER BY
    vec_id))`` — the deterministic-summation idiom, since a cross-row
    float SUM is partition-order-dependent); p95 is an exact-rank
    ELEMENT of the sorted list (selected, never averaged). Broadcast
    centroids, one keyed aggregate; O(cells) output rows. At 100 TB
    the collect_list bound is the cell population — swap for the
    two-phase histogram quantile if cells exceed executor frames."""
    from big_data_audio_classification_spark.operators.similarity import (
        IVF_CELLS,
        l2_dist_sq,
        to_double,
    )

    em = load_table(spark, sf_dir, "embeddings")
    cents = em.filter(F.col("vec_id") < IVF_CELLS).select(
        F.col("vec_id").alias("cell_id"), F.col("embedding").alias("c_emb")
    )
    d2 = l2_dist_sq(to_double(F.col("c_emb")), to_double(F.col("embedding")))
    scored = em.crossJoin(F.broadcast(cents)).select(
        "vec_id", "cell_id", d2.alias("d2")
    )
    w = Window.partitionBy("vec_id").orderBy("d2", "cell_id")
    assign = (
        scored.select("*", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") == 1)
        .select("vec_id", "cell_id", "d2")
    )
    agg = assign.groupBy("cell_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_vecs"),
        F.aggregate(
            F.transform(
                F.array_sort(F.collect_list(F.struct("vec_id", "d2"))),
                lambda s: s["d2"],
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ).alias("sum_d2"),
        F.array_sort(F.collect_list("d2")).alias("sorted_d2"),
    )
    p95_idx = F.expr("(95 * n_vecs + 99) DIV 100").cast("int")
    return agg.select(
        "cell_id",
        "n_vecs",
        F.round(F.col("sum_d2") / F.col("n_vecs"), 6).alias(
            "mean_sq_residual"
        ),
        F.round(F.element_at("sorted_d2", p95_idx), 6).alias(
            "p95_sq_residual"
        ),
    )


# ---------------------------------------------------------------------------
# ml/feature-selection: CART Gini split scoring over a bounded domain
# ---------------------------------------------------------------------------


@query(
    "ml_gini_impurity_split",
    oracle="""
        WITH x AS (
            SELECT CAST(l_quantity AS BIGINT) AS q,
                   CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y
            FROM lineitem
        ),
        per_q AS (
            SELECT q, CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(y) AS BIGINT) AS n_pos
            FROM x GROUP BY q
        ),
        cum AS (
            SELECT q,
                   CAST(SUM(n) OVER (ORDER BY q) AS BIGINT)      AS nl,
                   CAST(SUM(n_pos) OVER (ORDER BY q) AS BIGINT)  AS nl_pos,
                   CAST(SUM(n) OVER () AS BIGINT)                AS nt,
                   CAST(SUM(n_pos) OVER () AS BIGINT)            AS nt_pos
            FROM per_q
        ),
        g AS (
            SELECT q AS threshold, nl, nt - nl AS nr,
                   ROUND(
                     (nl - (CAST(nl_pos AS DOUBLE) * nl_pos
                            + CAST(nl - nl_pos AS DOUBLE) * (nl - nl_pos))
                           / nl
                      + (nt - nl)
                      - (CAST(nt_pos - nl_pos AS DOUBLE) * (nt_pos - nl_pos)
                         + CAST((nt - nl) - (nt_pos - nl_pos) AS DOUBLE)
                           * ((nt - nl) - (nt_pos - nl_pos)))
                        / (nt - nl)) / nt, 6) AS weighted_gini
            FROM cum WHERE nl < nt
        )
        SELECT threshold, nl, nr, weighted_gini,
               CAST(ROW_NUMBER() OVER (ORDER BY weighted_gini, threshold)
                    AS BIGINT) AS rank
        FROM g
    """,
    tags=("ml", "feature-selection", "lineitem"),
)
def ml_gini_impurity_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CART SPLIT SCORING: weighted Gini impurity of every candidate
    threshold "quantity ≤ t" against the binary return-flag label —
    the decision-tree split search, done relationally: per-value
    counts, ONE cumulative window over the bounded value domain (50
    distinct quantities — never a per-row scan), and the impurity as a
    single fixed-order float expression over exact integer counts
    (n·Gini expands to n − Σc n_c²/n_side, so the only floats are two
    divisions per side). rank=1 is the split a tree would take. One
    count shuffle + one 50-row window; output = 49 rows at any SF
    (statistical siblings: ``ml_chi2_feature_selection`` r07,
    ``ml_anova_f_selection`` r06)."""
    li = load_table(spark, sf_dir, "lineitem")
    x = li.select(
        F.col("l_quantity").cast("bigint").alias("q"),
        F.when(F.col("l_returnflag") == "R", 1).otherwise(0).alias("y"),
    )
    per_q = x.groupBy("q").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("y").cast("bigint").alias("n_pos"),
    )
    wo = Window.orderBy("q").rowsBetween(Window.unboundedPreceding, 0)
    wa = Window.partitionBy()
    cum = per_q.select(
        "q",
        F.sum("n").over(wo).cast("bigint").alias("nl"),
        F.sum("n_pos").over(wo).cast("bigint").alias("nl_pos"),
        F.sum("n").over(wa).cast("bigint").alias("nt"),
        F.sum("n_pos").over(wa).cast("bigint").alias("nt_pos"),
    )
    nl, nlp = F.col("nl"), F.col("nl_pos")
    nt, ntp = F.col("nt"), F.col("nt_pos")
    nr, nrp = nt - nl, ntp - nlp
    gini = (
        nl
        - (nlp.cast("double") * nlp + (nl - nlp).cast("double") * (nl - nlp))
        / nl
        + nr
        - (nrp.cast("double") * nrp + (nr - nrp).cast("double") * (nr - nrp))
        / nr
    ) / nt
    g = cum.filter(nl < nt).select(
        F.col("q").alias("threshold"),
        nl.alias("nl"),
        nr.alias("nr"),
        F.round(gini, 6).alias("weighted_gini"),
    )
    w = Window.orderBy("weighted_gini", "threshold")
    return g.select(
        "*", F.row_number().over(w).cast("bigint").alias("rank")
    )


# ---------------------------------------------------------------------------
# ml/encoding: leave-one-out target encoding
# ---------------------------------------------------------------------------


@query(
    "ml_leave_one_out_encoding",
    oracle="""
        WITH x AS (
            SELECT o_orderkey, o_custkey,
                   CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
            FROM orders
        ),
        g AS (
            SELECT o_orderkey, o_custkey, cents,
                   CAST(SUM(cents) OVER (PARTITION BY o_custkey) AS BIGINT)
                       AS cust_sum,
                   CAST(COUNT(*) OVER (PARTITION BY o_custkey) AS BIGINT)
                       AS cust_n
            FROM x
        )
        SELECT o_orderkey, o_custkey, cust_n,
               CASE WHEN cust_n > 1
                    THEN ROUND(CAST(cust_sum - cents AS DOUBLE)
                               / (cust_n - 1) / 100.0, 6)
               END AS loo_mean_price
        FROM g
    """,
    tags=("ml", "encoding", "orders"),
)
def ml_leave_one_out_encoding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEAVE-ONE-OUT target encoding: each order's customer-mean price
    computed EXCLUDING the row itself — (Σ_cust − self)/(n−1) — the
    target-leakage-safe encoding (a plain group mean lets every row
    see its own label; LOO is the standard fix, smoothed sibling:
    ``ml_count_encoding_smoothed``). Numerator stays an exact integer
    cents difference; one float division (+ /100 to dollars) per row,
    written in the same order in both dialects; singleton customers
    emit an honest NULL instead of a degenerate self-mean. ONE
    partitioned window (sum + count share the frame), no join — the
    plan at 100 TB is one shuffle keyed by the encoded column."""
    o = load_table(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("bigint")
    x = o.select("o_orderkey", "o_custkey", cents.alias("cents"))
    w = Window.partitionBy("o_custkey")
    g = x.select(
        "o_orderkey",
        "o_custkey",
        "cents",
        F.sum("cents").over(w).cast("bigint").alias("cust_sum"),
        F.count(F.lit(1)).over(w).cast("bigint").alias("cust_n"),
    )
    loo = (
        (F.col("cust_sum") - F.col("cents")).cast("double")
        / (F.col("cust_n") - 1)
        / 100.0
    )
    return g.select(
        "o_orderkey",
        "o_custkey",
        "cust_n",
        F.when(F.col("cust_n") > 1, F.round(loo, 6)).alias("loo_mean_price"),
    )


# ---------------------------------------------------------------------------
# ml/regression: weighted least squares, closed form over exact sums
# ---------------------------------------------------------------------------


@query(
    "ml_wls_closed_form",
    oracle="""
        WITH x AS (
            SELECT CAST(l_quantity AS BIGINT) AS w,
                   CAST(l_quantity AS BIGINT) AS xq,
                   CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS y
            FROM lineitem
        ),
        s AS (
            SELECT CAST(COUNT(*) AS BIGINT)            AS n,
                   CAST(SUM(w) AS DOUBLE)              AS sw,
                   CAST(SUM(w * xq) AS DOUBLE)         AS swx,
                   CAST(SUM(CAST(w AS HUGEINT) * xq * xq) AS DOUBLE) AS swxx,
                   CAST(SUM(CAST(w AS HUGEINT) * y) AS DOUBLE)       AS swy,
                   CAST(SUM(CAST(w AS HUGEINT) * xq * y) AS DOUBLE)  AS swxy
            FROM x
        )
        SELECT n,
               ROUND((sw * swxy - swx * swy)
                     / (sw * swxx - swx * swx) / 100.0, 6)  AS wls_slope,
               ROUND((swy / sw - (sw * swxy - swx * swy)
                                 / (sw * swxx - swx * swx)
                                 * (swx / sw)) / 100.0, 6)  AS wls_intercept
        FROM s
    """,
    tags=("ml", "regression", "aggregate", "lineitem"),
)
def ml_wls_closed_form(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WEIGHTED least squares (price-per-quantity line, weights =
    quantity — the "bigger orders are measured more reliably"
    heteroscedasticity model), closed form: slope = (SwSwxy −
    SwxSwy)/(SwSwxx − Swx²), intercept = ȳ_w − β·x̄_w. Every weighted
    sum accumulates EXACT integers — the w·x·y products reach ~1e17
    per 6M rows, so the Spark side accumulates in DECIMAL(38,0) and
    the oracle promotes to HUGEINT (the r07-advice overflow idiom) —
    then the two coefficients are fixed-order float expressions over
    the 1-row exact frame. One map-side-combined aggregate, no
    shuffle beyond it, at any SF (OLS sibling:
    ``ml_ols_normal_equations`` r08)."""
    li = load_table(spark, sf_dir, "lineitem")
    x = li.select(
        F.col("l_quantity").cast("bigint").alias("w"),
        F.col("l_quantity").cast("bigint").alias("xq"),
        F.round(F.col("l_extendedprice") * 100).cast("bigint").alias("y"),
    )
    wd = F.col("w").cast("decimal(38,0)")
    s = x.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("w").cast("double").alias("sw"),
        F.sum(F.col("w") * F.col("xq")).cast("double").alias("swx"),
        F.sum(wd * F.col("xq") * F.col("xq")).cast("double").alias("swxx"),
        F.sum(wd * F.col("y")).cast("double").alias("swy"),
        F.sum(wd * F.col("xq") * F.col("y")).cast("double").alias("swxy"),
    )
    slope = (F.col("sw") * F.col("swxy") - F.col("swx") * F.col("swy")) / (
        F.col("sw") * F.col("swxx") - F.col("swx") * F.col("swx")
    )
    intercept = F.col("swy") / F.col("sw") - slope * (
        F.col("swx") / F.col("sw")
    )
    return s.select(
        "n",
        F.round(slope / 100.0, 6).alias("wls_slope"),
        F.round(intercept / 100.0, 6).alias("wls_intercept"),
    )


# ---------------------------------------------------------------------------
# skew: heavy-hitter census across log-spaced thresholds
# ---------------------------------------------------------------------------

SKEW_THRESH_BITS = 13  # thresholds 2^0 .. 2^12


@query(
    "skew_topk_threshold_sweep",
    oracle=f"""
        WITH per_key AS (
            SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n
            FROM events GROUP BY user_id
        ),
        tot AS (SELECT CAST(SUM(n) AS BIGINT) AS n_total FROM per_key),
        thresholds AS (
            SELECT CAST(POWER(2, UNNEST(range(0, {SKEW_THRESH_BITS})))
                        AS BIGINT) AS threshold
        )
        SELECT t.threshold,
               CAST(COUNT(CASE WHEN p.n >= t.threshold THEN 1 END)
                    AS BIGINT) AS n_hot_keys,
               CAST(COALESCE(SUM(CASE WHEN p.n >= t.threshold
                                      THEN p.n END), 0) AS BIGINT)
                   AS events_covered,
               ROUND(CAST(COALESCE(SUM(CASE WHEN p.n >= t.threshold
                                             THEN p.n END), 0) AS DOUBLE)
                     / MAX(tot.n_total), 6) AS coverage_share
        FROM thresholds t CROSS JOIN per_key p CROSS JOIN tot
        GROUP BY t.threshold
    """,
    tags=("events", "skew", "scale", "report"),
)
def skew_topk_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HEAVY-HITTER THRESHOLD SWEEP: for every log-spaced cutoff 2⁰…2¹²,
    how many keys carry at least that many events and what share of
    ALL events they hold — the one-scan census that picks the salting
    cutoff (keys above the chosen threshold get salted; the coverage
    share is exactly the traffic the salting protects). Per-key counts
    reduce first (one shuffle, map-side combined); the 13-threshold
    sweep then runs over the KEY-COUNT frame (users-sized, never
    events-sized) as one small cross join. Exact integers + one final
    division (Gini form of the same census:
    ``skew_key_gini_imbalance``; the plan it feeds:
    ``skew_salt_factor_plan``)."""
    e = load_table(spark, sf_dir, "events")
    per_key = e.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    tot = per_key.agg(F.sum("n").cast("bigint").alias("n_total"))
    thresholds = spark.range(SKEW_THRESH_BITS).select(
        F.pow(2.0, F.col("id")).cast("bigint").alias("threshold")
    )
    hot = F.when(F.col("n") >= F.col("threshold"), F.col("n"))
    return (
        thresholds.crossJoin(per_key)
        .crossJoin(F.broadcast(tot))
        .groupBy("threshold")
        .agg(
            F.count(hot).cast("bigint").alias("n_hot_keys"),
            F.coalesce(F.sum(hot), F.lit(0)).cast("bigint").alias(
                "events_covered"
            ),
            F.round(
                F.coalesce(F.sum(hot), F.lit(0)).cast("double")
                / F.max("n_total"),
                6,
            ).alias("coverage_share"),
        )
    )


# ---------------------------------------------------------------------------
# reference: R7 running concatenation (the generator's cumulative names)
# ---------------------------------------------------------------------------


@query(
    "ref_running_concat",
    oracle="""
        WITH seg AS (
            SELECT range AS id,
                   CASE WHEN range % 2 = 0 THEN 'Male' ELSE 'Female' END
                       AS speaker
            FROM range(40)
        )
        SELECT id, speaker,
               string_agg('p' || CAST(id AS VARCHAR), '|')
                   OVER (PARTITION BY speaker ORDER BY id
                         ROWS UNBOUNDED PRECEDING) AS running_names
        FROM seg
    """,
    tags=("reference", "window", "string"),
)
def ref_running_concat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R7's RUNNING CONCATENATION as a first-class carrier: the
    reference's generator accumulates phrase file names into a growing
    string per speaker (data_generator.py:14,20-21 — the cumulative-
    text sibling of the cumulative-seconds sum certified in
    ``ref_segments_cumsum``). Spark states it as ``array_join ∘
    collect_list`` over an ordered running window (order is carried by
    the window spec, never by scan order); DuckDB as a windowed
    ``string_agg`` — two formulations of ordered string accumulation.
    Tiny by construction (one recording's phrase table); the at-scale
    form partitions by recording id exactly like the sum."""
    from big_data_audio_classification_spark.operators.reference_pipeline import (
        N_PHRASES,
    )

    base = spark.range(N_PHRASES).select(
        F.col("id"),
        F.when(F.pmod("id", F.lit(2)) == 0, "Male")
        .otherwise("Female")
        .alias("speaker"),
    )
    w = (
        Window.partitionBy("speaker")
        .orderBy("id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    name = F.concat(F.lit("p"), F.col("id").cast("string"))
    return base.select(
        "id",
        "speaker",
        F.array_join(F.collect_list(name).over(w), "|").alias(
            "running_names"
        ),
    )


# ---------------------------------------------------------------------------
# audio-math: spectral-centroid analog over framed event amplitudes
# ---------------------------------------------------------------------------

SC_FRAME = 16  # samples per frame


@query(
    "audio_spectral_centroid",
    oracle=f"""
        WITH x AS (
            SELECT user_id,
                   CAST(ROUND(value * 100) AS BIGINT) AS c,
                   ROW_NUMBER() OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS rn
            FROM events
        ),
        framed AS (
            SELECT user_id, (rn - 1) // {SC_FRAME} AS frame_id,
                   (rn - 1) % {SC_FRAME} AS bin,
                   abs(c) AS mag
            FROM x
        ),
        agg AS (
            SELECT user_id, frame_id,
                   CAST(COUNT(*) AS BIGINT)        AS n,
                   CAST(SUM(bin * mag) AS BIGINT)  AS wsum,
                   CAST(SUM(mag) AS BIGINT)        AS msum
            FROM framed GROUP BY user_id, frame_id
        )
        SELECT user_id, CAST(frame_id AS BIGINT) AS frame_id, n,
               CASE WHEN msum > 0
                    THEN ROUND(CAST(wsum AS DOUBLE) / msum, 6) + 0
               END AS centroid_bin
        FROM agg WHERE n = {SC_FRAME}
    """,
    tags=("audio-math", "window", "events"),
)
def audio_spectral_centroid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPECTRAL-CENTROID analog: frame the per-user value stream into
    16-sample frames (row_number DIV — the same framing discipline as
    ``audio_rms_db_frames``) and compute each frame's magnitude-
    weighted mean bin Σ i·|x_i| / Σ |x_i| — the brightness feature of
    every audio/DSP pipeline, expressed over the events stand-in
    stream the audio-math family uses (the real mel path lives in
    ``operators/audio.py``). Numerator and denominator are EXACT
    integer sums (bin ≤ 15, |cents| ≤ 1e5 — no overflow reachable);
    one float division per frame with the oracle's ``+ 0`` -0.0
    guard; ragged tail frames are filtered exactly. One shuffle keyed
    by user."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    c = F.round(F.col("value") * 100).cast("bigint")
    x = e.select(
        "user_id", c.alias("c"), (F.row_number().over(w) - 1).alias("rn0")
    )
    framed = x.select(
        "user_id",
        F.expr(f"rn0 DIV {SC_FRAME}").alias("frame_id"),
        (F.col("rn0") % SC_FRAME).alias("bin"),
        F.abs(F.col("c")).alias("mag"),
    )
    agg = framed.groupBy("user_id", "frame_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.col("bin") * F.col("mag")).cast("bigint").alias("wsum"),
        F.sum("mag").cast("bigint").alias("msum"),
    )
    return agg.filter(F.col("n") == SC_FRAME).select(
        "user_id",
        F.col("frame_id").cast("bigint").alias("frame_id"),
        "n",
        F.when(
            F.col("msum") > 0,
            F.round(F.col("wsum").cast("double") / F.col("msum"), 6),
        ).alias("centroid_bin"),
    )


# ---------------------------------------------------------------------------
# decomposition: per-user linear detrend with variance-explained share
# ---------------------------------------------------------------------------


@query(
    "analytics_detrend_linear_resid",
    oracle="""
        WITH x AS (
            SELECT user_id,
                   CAST(ROW_NUMBER() OVER (PARTITION BY user_id
                                           ORDER BY ts, event_id) AS BIGINT)
                       AS t,
                   CAST(ROUND(value * 100) AS BIGINT) AS y
            FROM events
        ),
        s AS (
            SELECT user_id,
                   CAST(COUNT(*) AS BIGINT)                      AS n,
                   CAST(SUM(t) AS DOUBLE)                        AS st,
                   CAST(SUM(y) AS DOUBLE)                        AS sy,
                   CAST(SUM(CAST(t AS HUGEINT) * t) AS DOUBLE)   AS stt,
                   CAST(SUM(CAST(t AS HUGEINT) * y) AS DOUBLE)   AS sty,
                   CAST(SUM(CAST(y AS HUGEINT) * y) AS DOUBLE)   AS syy
            FROM x GROUP BY user_id
        )
        SELECT user_id, n,
               -- + 0 normalizes DuckDB ROUND's -0.0 (slopes are
               -- centered on 0 by construction; r08 review)
               ROUND((n * sty - st * sy) / (n * stt - st * st) / 100.0, 6)
                   + 0 AS trend_slope,
               ROUND(((n * sty - st * sy) * (n * sty - st * sy))
                     / ((n * stt - st * st) * (n * syy - sy * sy)), 6) + 0
                   AS var_explained
        FROM s WHERE n >= 3 AND n * syy - sy * sy > 0
    """,
    tags=("decomposition", "regression", "events"),
)
def analytics_detrend_linear_resid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LINEAR DETREND per user with the variance share the trend
    explains — R² = (nSty − StSy)² / ((nStt − St²)(nSyy − Sy²)) — the
    decomposition step that answers "is this channel drifting or
    seasonal?" before any seasonal profile is fit (seasonal siblings:
    ``analytics_dow_additive_profile``, ``analytics_weekpart_decomp``).
    Time is the within-user rank (exact integer, tiebroken by
    event_id); every sufficient statistic is an EXACT integer sum
    (t·y and y² through HUGEINT/DECIMAL(38) headroom); slope and R²
    are fixed-order float expressions over the 1-row-per-user exact
    frame. One window + one aggregate, both keyed by user; degenerate
    users (n<3 or zero variance) are excluded exactly."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    x = e.select(
        "user_id",
        F.row_number().over(w).cast("bigint").alias("t"),
        F.round(F.col("value") * 100).cast("bigint").alias("y"),
    )
    td = F.col("t").cast("decimal(38,0)")
    yd = F.col("y").cast("decimal(38,0)")
    s = x.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("t").cast("double").alias("st"),
        F.sum("y").cast("double").alias("sy"),
        F.sum(td * F.col("t")).cast("double").alias("stt"),
        F.sum(td * F.col("y")).cast("double").alias("sty"),
        F.sum(yd * F.col("y")).cast("double").alias("syy"),
    )
    n, st, sy = F.col("n"), F.col("st"), F.col("sy")
    stt, sty, syy = F.col("stt"), F.col("sty"), F.col("syy")
    num = n * sty - st * sy
    return s.filter((n >= 3) & (n * syy - sy * sy > 0)).select(
        "user_id",
        "n",
        F.round(num / (n * stt - st * st) / 100.0, 6).alias("trend_slope"),
        F.round(
            (num * num) / ((n * stt - st * st) * (n * syy - sy * sy)), 6
        ).alias("var_explained"),
    )


# ---------------------------------------------------------------------------
# causal: placebo difference-in-differences (the falsification test)
# ---------------------------------------------------------------------------


@query(
    "stats_placebo_did",
    oracle="""
        WITH span AS (
            -- integer-micros midpoint, matching Spark's unix_micros DIV 2
            -- exactly (interval/2 arithmetic rounds differently)
            SELECT make_timestamp(epoch_us(MIN(ts))
                       + (epoch_us(MAX(ts)) - epoch_us(MIN(ts))) // 2)
                       AS mid_real
            FROM events
        ),
        pre AS (
            SELECT e.user_id, e.ts,
                   CAST(ROUND(e.value * 100) AS BIGINT) AS cents
            FROM events e, span
            WHERE e.ts < span.mid_real
        ),
        pspan AS (
            SELECT make_timestamp(epoch_us(MIN(ts))
                       + (epoch_us(MAX(ts)) - epoch_us(MIN(ts))) // 2)
                       AS pmid
            FROM pre
        ),
        cells AS (
            SELECT CASE WHEN p.user_id % 2 = 0 THEN 1 ELSE 0 END AS treated,
                   CASE WHEN p.ts >= s.pmid THEN 1 ELSE 0 END    AS fake_post,
                   CAST(COUNT(*) AS BIGINT)    AS n,
                   CAST(SUM(p.cents) AS BIGINT) AS cents
            FROM pre p, pspan s
            GROUP BY 1, 2
        ),
        m AS (
            SELECT
              MAX(CASE WHEN treated = 1 AND fake_post = 1
                       THEN CAST(cents AS DOUBLE) / n END) AS t_post,
              MAX(CASE WHEN treated = 1 AND fake_post = 0
                       THEN CAST(cents AS DOUBLE) / n END) AS t_pre,
              MAX(CASE WHEN treated = 0 AND fake_post = 1
                       THEN CAST(cents AS DOUBLE) / n END) AS c_post,
              MAX(CASE WHEN treated = 0 AND fake_post = 0
                       THEN CAST(cents AS DOUBLE) / n END) AS c_pre,
              CAST(SUM(n) AS BIGINT) AS n_rows
            FROM cells
        )
        SELECT n_rows,
               ROUND(((t_post - t_pre) - (c_post - c_pre)) / 100.0, 6) + 0
                   AS placebo_did
        FROM m
    """,
    tags=("stats", "causal", "inference", "events"),
)
def stats_placebo_did(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PLACEBO difference-in-differences — the falsification test every
    DiD analysis owes its readers (``stats_did_estimator`` is the real
    one, r08-window): restrict to the PRE period only, invent a fake
    treatment date at its midpoint, and re-estimate. A well-behaved
    design yields a placebo effect near zero; a large one means the
    'parallel trends' assumption was already broken before treatment.
    Same exact-cents discipline: the four cell means are single
    divisions of exact integer sums, the DiD contrast is one
    fixed-order float expression (+0 normalizing a possible -0.0
    ROUND). Two scans (span + cells), both map-side combined; output =
    1 row at any SF."""
    e = load_table(spark, sf_dir, "events")
    span = e.agg(
        F.min("ts").alias("lo"),
        F.timestamp_micros(
            (
                F.unix_micros(F.min("ts"))
                + F.expr("(unix_micros(MAX(ts)) - unix_micros(MIN(ts))) DIV 2")
            )
        ).alias("mid_real"),
    )
    pre = (
        e.crossJoin(F.broadcast(span))
        .filter(F.col("ts") < F.col("mid_real"))
        .select(
            "user_id",
            "ts",
            F.round(F.col("value") * 100).cast("bigint").alias("cents"),
        )
    )
    pspan = pre.agg(
        F.timestamp_micros(
            (
                F.unix_micros(F.min("ts"))
                + F.expr("(unix_micros(MAX(ts)) - unix_micros(MIN(ts))) DIV 2")
            )
        ).alias("pmid")
    )
    cells = (
        pre.crossJoin(F.broadcast(pspan))
        .groupBy(
            F.when(F.col("user_id") % 2 == 0, 1).otherwise(0).alias("treated"),
            F.when(F.col("ts") >= F.col("pmid"), 1).otherwise(0).alias(
                "fake_post"
            ),
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("cents").cast("bigint").alias("cents"),
        )
    )
    mean = F.col("cents").cast("double") / F.col("n")
    m = cells.agg(
        F.max(F.when((F.col("treated") == 1) & (F.col("fake_post") == 1), mean)).alias("t_post"),
        F.max(F.when((F.col("treated") == 1) & (F.col("fake_post") == 0), mean)).alias("t_pre"),
        F.max(F.when((F.col("treated") == 0) & (F.col("fake_post") == 1), mean)).alias("c_post"),
        F.max(F.when((F.col("treated") == 0) & (F.col("fake_post") == 0), mean)).alias("c_pre"),
        F.sum("n").cast("bigint").alias("n_rows"),
    )
    did = (F.col("t_post") - F.col("t_pre")) - (
        F.col("c_post") - F.col("c_pre")
    )
    return m.select(
        "n_rows", F.round(did / 100.0, 6).alias("placebo_did")
    )


# ---------------------------------------------------------------------------
# udtf: run-length encoding of per-user event-type sequences
# ---------------------------------------------------------------------------

RLE_USER_CAP = 40  # users encoded (bounded-output exemplar)


@query(
    "udtf_run_length_encode",
    oracle=f"""
        WITH x AS (
            SELECT user_id, event_type,
                   ROW_NUMBER() OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS pos
            FROM events WHERE user_id < {RLE_USER_CAP}
        ),
        flagged AS (
            SELECT user_id, event_type, pos,
                   CASE WHEN LAG(event_type) OVER (PARTITION BY user_id
                                                   ORDER BY pos)
                             IS DISTINCT FROM event_type
                        THEN 1 ELSE 0 END AS is_start
            FROM x
        ),
        runs AS (
            SELECT user_id, event_type, pos,
                   SUM(is_start) OVER (PARTITION BY user_id ORDER BY pos
                                       ROWS UNBOUNDED PRECEDING) AS run_id
            FROM flagged
        )
        SELECT user_id,
               CAST(run_id AS BIGINT)    AS run_id,
               event_type,
               CAST(MIN(pos) AS BIGINT)  AS start_pos,
               CAST(COUNT(*) AS BIGINT)  AS run_len
        FROM runs GROUP BY user_id, run_id, event_type
    """,
    tags=("udtf", "events", "session"),
)
def udtf_run_length_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RUN-LENGTH ENCODING of each user's event-type sequence via a
    Python UDTF: one pass over the ordered sequence yields (run_id,
    type, start, length) — the compression/behavior-motif kernel,
    stated as per-row iteration where the oracle needs the full
    gaps-and-islands double window (LAG flag → running SUM → GROUP
    BY). Two genuinely different formulations of sequence encoding.
    The sequence reaches the UDTF as an in-row array (``collect_list``
    of (ts, event_id, type) structs, sort_array for deterministic
    order — never scan order); Arrow-batched; output rows = number of
    runs ≤ sequence length. User cap bounds the exemplar; the
    production form is the same plan without the filter."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="run_id long, event_type string, start_pos long, run_len long")
    class RunLengthEncode:
        def eval(self, types):
            if not types:
                return
            run_id, start, cur = 1, 1, types[0]
            n = 1
            for i, t in enumerate(types[1:], start=2):
                if t == cur:
                    n += 1
                else:
                    yield run_id, cur, start, n
                    run_id, start, cur, n = run_id + 1, i, t, 1
            yield run_id, cur, start, n

    spark.udtf.register("run_length_encode", RunLengthEncode)
    e = load_table(spark, sf_dir, "events").filter(
        F.col("user_id") < RLE_USER_CAP
    )
    seqs = e.groupBy("user_id").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("ts", "event_id", "event_type"))),
            lambda s: s["event_type"],
        ).alias("types")
    )
    seqs.createOrReplaceTempView("udtf_rle_in")
    return spark.sql(
        """
        SELECT s.user_id, r.run_id, r.event_type, r.start_pos, r.run_len
        FROM udtf_rle_in s, LATERAL run_length_encode(s.types) r
        """
    )


# ---------------------------------------------------------------------------
# udaf/pandas: winsorized mean over exact-rank clamping bounds
# ---------------------------------------------------------------------------

WINS_LO = 10  # clamp below the lower decile ...
WINS_HI = 90  # ... and above the upper decile


@query(
    "agg_pandas_udaf_winsorized_mean",
    oracle=f"""
        WITH c AS (
            SELECT o_orderpriority AS priority,
                   CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
            FROM orders
        ),
        g AS (
            SELECT priority, CAST(COUNT(*) AS BIGINT) AS n,
                   list_sort(list(cents)) AS xs
            FROM c GROUP BY priority
        ),
        b AS (
            SELECT priority, n, xs,
                   xs[({WINS_LO} * n + 99) // 100] AS lo,
                   xs[({WINS_HI} * n + 99) // 100] AS hi
            FROM g
        )
        SELECT priority, n,
               CAST(lo AS BIGINT) AS lo_cents,
               CAST(hi AS BIGINT) AS hi_cents,
               ROUND(CAST(list_sum(list_transform(xs,
                         v -> LEAST(GREATEST(v, lo), hi))) AS DOUBLE)
                     / n / 100.0, 6) AS winsorized_mean
        FROM b
    """,
    tags=("aggregate", "udaf", "pandas", "robust", "orders"),
)
def agg_pandas_udaf_winsorized_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WINSORIZED MEAN per priority as a grouped-agg pandas UDF:
    clamp every value into [P10, P90] and average — the outlier
    treatment that KEEPS the tail rows (at their clamped value) where
    the trimmed mean drops them (``window_rolling_trimmed_mean``,
    ``agg_pandas_udaf_decile_ratio`` are the drop/ratio siblings).
    Bit-stable the shared-formula way: the clamping bounds are
    EXACT-RANK order statistics (ceil(q·n), 1-based — selected
    integers, never interpolated), the clamped sum is an exact integer,
    and the single float division happens in the same order in both
    dialects. Arrow-batched per group; at 100 TB swap the per-group
    buffer for the two-phase exact-percentile plan."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def winsorized_mean(v: pd.Series) -> float:
        xs = np.sort(np.rint(v.to_numpy(dtype=np.float64)).astype(np.int64))
        n = len(xs)
        lo = int(xs[(WINS_LO * n + 99) // 100 - 1])
        hi = int(xs[(WINS_HI * n + 99) // 100 - 1])
        clamped = np.clip(xs, lo, hi)
        return float(int(clamped.sum())) / n / 100.0

    @pandas_udf("long")
    def n_rows(v: pd.Series) -> int:
        return len(v)

    @pandas_udf("long")
    def lo_bound(v: pd.Series) -> int:
        xs = np.sort(np.rint(v.to_numpy(dtype=np.float64)).astype(np.int64))
        return int(xs[(WINS_LO * len(xs) + 99) // 100 - 1])

    @pandas_udf("long")
    def hi_bound(v: pd.Series) -> int:
        xs = np.sort(np.rint(v.to_numpy(dtype=np.float64)).astype(np.int64))
        return int(xs[(WINS_HI * len(xs) + 99) // 100 - 1])

    o = load_table(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("bigint")
    x = o.select(
        F.col("o_orderpriority").alias("priority"), cents.alias("cents")
    )
    return x.groupBy("priority").agg(
        n_rows("cents").alias("n"),
        lo_bound("cents").alias("lo_cents"),
        hi_bound("cents").alias("hi_cents"),
        F.round(winsorized_mean("cents"), 6).alias("winsorized_mean"),
    )


# ---------------------------------------------------------------------------
# sink/csv: custom escape-character dialect roundtrip
# ---------------------------------------------------------------------------


@query(
    "sink_csv_escape_roundtrip",
    oracle="""
        WITH x AS (
            SELECT doc_id,
                   'v"' || CAST(doc_id AS VARCHAR) || '",' || source AS tricky
            FROM documents
        )
        SELECT CAST(COUNT(*) AS BIGINT)                       AS n,
               CAST(SUM(length(tricky)) AS BIGINT)            AS total_len,
               CAST(SUM(CASE WHEN tricky LIKE '%"%' THEN 1 ELSE 0 END)
                    AS BIGINT)                                AS n_with_quote
        FROM x
    """,
    tags=("sink", "csv", "documents"),
)
def sink_csv_escape_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BACKSLASH-ESCAPE CSV dialect roundtrip: fields that embed BOTH
    the quote character and the delimiter (built deterministically
    from doc_id + source), written with ``escape='\\\\'`` (the
    MySQL-ish dialect, vs RFC4180's doubled quotes) and read back with
    the SAME options — the dialect mismatch that silently corrupts
    fields when writer and reader disagree. The contract aggregates
    the RECONSTRUCTED values (count, total length, quote-carrying
    rows) against parquet truth computed by the oracle directly —
    if escaping dropped or doubled a character anywhere, total_len
    moves. Completes the dialect battery (quote-all / TSV / gzip /
    partitioned siblings). Per-task write, vectorized read."""
    import os as _os

    from big_data_audio_classification_spark.scratch import SCRATCH_DIR

    path = _os.path.join(SCRATCH_DIR, "sink_csv_escape_roundtrip")
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.lit('v"'),
            F.col("doc_id").cast("string"),
            F.lit('",'),
            F.col("source"),
        ).alias("tricky"),
    )
    (
        d.write.mode("overwrite")
        .option("header", True)
        .option("escape", "\\")
        .option("quote", '"')
        .csv(path)
    )
    back = spark.read.csv(
        path,
        header=True,
        escape="\\",
        quote='"',
        schema="doc_id long, tricky string",
    )
    return back.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.length("tricky")).cast("bigint").alias("total_len"),
        F.sum(F.when(F.col("tricky").contains('"'), 1).otherwise(0))
        .cast("bigint")
        .alias("n_with_quote"),
    )


# ---------------------------------------------------------------------------
# sql: named WINDOW clause in SQL text
# ---------------------------------------------------------------------------


@query(
    "sql_named_window_clause",
    oracle="""
        SELECT o_custkey AS custkey, o_orderkey,
               CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey
                                       ORDER BY o_orderdate, o_orderkey)
                    AS BIGINT) AS seq,
               CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                        OVER (PARTITION BY o_custkey
                              ORDER BY o_orderdate, o_orderkey
                              ROWS UNBOUNDED PRECEDING)
                    AS BIGINT) AS running_cents,
               CAST(COUNT(*) OVER (PARTITION BY o_custkey) AS BIGINT)
                   AS n_orders
        FROM orders
    """,
    tags=("relational", "sql", "window", "orders"),
)
def sql_named_window_clause(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SQL ``WINDOW`` clause surface: three analytic functions
    share ONE named window definition (``WINDOW w AS (...)``) in Spark
    SQL text — the define-once-use-many syntax every migrating SQL
    workload carries — while the oracle states each OVER inline (the
    universal lowering). Same running-sum discipline as everywhere:
    exact integer cents, unique (date, orderkey) tiebreak on the
    frame order. One shuffle keyed by customer."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView(
        "sql_named_window_in"
    )
    return spark.sql(
        """
        SELECT o_custkey AS custkey, o_orderkey,
               CAST(ROW_NUMBER() OVER w_ord AS BIGINT) AS seq,
               CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                        OVER w_run AS BIGINT)          AS running_cents,
               CAST(COUNT(*) OVER w_all AS BIGINT)     AS n_orders
        FROM sql_named_window_in
        WINDOW w_ord AS (PARTITION BY o_custkey
                         ORDER BY o_orderdate, o_orderkey),
               w_run AS (PARTITION BY o_custkey
                         ORDER BY o_orderdate, o_orderkey
                         ROWS UNBOUNDED PRECEDING),
               w_all AS (PARTITION BY o_custkey)
        """
    )


# ---------------------------------------------------------------------------
# sketch: portable HyperLogLog with measured-vs-exact distinct
# ---------------------------------------------------------------------------

HLL_P = 8                       # 2^8 = 256 registers
HLL_M = 1 << HLL_P
HLL_WBITS = 32 - HLL_P          # 24 rank bits per hashed key
_HLL_ALPHA = ("(CAST(0.7213 AS DOUBLE) / "
              "(CAST(1.0 AS DOUBLE) + CAST(1.079 AS DOUBLE) / 256.0))")
# alpha_256 — explicit DOUBLE casts: bare numeric literals parse as
# DECIMAL in BOTH engines and Spark would carry decimal arithmetic
# into the estimate (typed-hash mismatch caught at the gate)


def _bitlen_case_sql(col: str, bits: int) -> str:
    branches = " ".join(
        f"WHEN {col} >= {1 << (k - 1)} THEN {k}"
        for k in range(bits, 0, -1)
    )
    return f"CASE {branches} ELSE 0 END"


@query(
    "sketch_hll_portable",
    oracle=f"""
        WITH toks AS (
            SELECT DISTINCT UNNEST(list_filter(string_split(text, ' '),
                                   t -> t <> '')) AS tok
            FROM documents
        ),
        h AS (
            SELECT CAST(('0x' || substr(md5(tok), 1, 8)) AS BIGINT) AS hv
            FROM toks
        ),
        regs AS (
            SELECT hv >> {HLL_WBITS} AS bucket,
                   MAX({HLL_WBITS + 1}
                       - {_bitlen_case_sql(f"(hv & {(1 << HLL_WBITS) - 1})",
                                           HLL_WBITS)}) AS m
            FROM h GROUP BY hv >> {HLL_WBITS}
        ),
        spine AS (SELECT UNNEST(range(0, {HLL_M})) AS bucket),
        full_regs AS (
            SELECT s.bucket, COALESCE(r.m, 0) AS m
            FROM spine s LEFT JOIN regs r ON s.bucket = r.bucket
        ),
        s AS (
            SELECT CAST(SUM(CAST(1 AS BIGINT)
                            << ({HLL_WBITS + 1} - m)) AS BIGINT) AS s_int,
                   CAST(SUM(CASE WHEN m = 0 THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_zero
            FROM full_regs
        ),
        x AS (
            SELECT s_int, n_zero,
                   (SELECT CAST(COUNT(*) AS BIGINT) FROM toks) AS n_exact,
                   ({_HLL_ALPHA}) * {HLL_M} * {HLL_M}
                       * {1 << (HLL_WBITS + 1)} / s_int AS e_raw
            FROM s
        )
        SELECT n_exact, n_zero,
               ROUND(e_raw, 4) AS raw_estimate,
               ROUND(CASE WHEN e_raw <= 2.5 * {HLL_M} AND n_zero > 0
                          THEN {HLL_M} * LN({HLL_M} / CAST(n_zero AS DOUBLE))
                          ELSE e_raw END, 4) AS corrected_estimate,
               -- + 0 normalizes DuckDB ROUND's -0.0 (rel_error is
               -- negative whenever HLL underestimates; r08 review)
               ROUND((CASE WHEN e_raw <= 2.5 * {HLL_M} AND n_zero > 0
                           THEN {HLL_M} * LN({HLL_M} / CAST(n_zero AS DOUBLE))
                           ELSE e_raw END - n_exact)
                     / n_exact, 4) + 0 AS rel_error
        FROM x
    """,
    tags=("aggregate", "sketch", "dedup", "documents"),
)
def sketch_hll_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PORTABLE HYPERLOGLOG, simulated relationally and calibrated
    against the exact distinct count: hash every distinct token with
    the cross-engine md5 family, split top-8 bits → 256 registers,
    register value = leading-zero rank of the remaining 24 bits
    (computed by a pure-integer comparison CASE — never a float log2,
    whose boundary ULPs differ per libm), and the harmonic-mean
    estimator Σ2^(−M_j) accumulated as an EXACT INTEGER in units of
    2⁻²⁵ (every term is a power of two, so the sum is exact and
    order-independent) before the one float estimate expression,
    Flajolet's small-range correction m·ln(m/V) included. The engines'
    own HLLs (approx_count_distinct vs DuckDB's) can never cross-check
    — different hash families — so this carrier IS the portable
    contract, with measured relative error in the output (companion
    sketches: ``sketch_bloom_filter_portable``, ``agg_kmv_distinct_
    sketch``, theta setops). One token pass + one 256-row aggregate at
    any SF; the register table is the whole sketch state."""
    from big_data_audio_classification_spark.operators.dedup import (
        token_hash,
        tokens_col,
    )

    d = load_table(spark, sf_dir, "documents")
    toks = (
        d.select(F.explode(tokens_col(F.col("text"))).alias("tok"))
        .distinct()
        .persist()
    )
    h = toks.select(token_hash(F.col("tok")).alias("hv"))
    wmask = (1 << HLL_WBITS) - 1
    w = F.col("hv").bitwiseAND(F.lit(wmask))
    bitlen = F.lit(0)
    for k in range(1, HLL_WBITS + 1):
        bitlen = F.when(w >= (1 << (k - 1)), k).otherwise(bitlen)
    regs = h.groupBy(
        F.shiftright("hv", HLL_WBITS).alias("bucket")
    ).agg(F.max(F.lit(HLL_WBITS + 1) - bitlen).alias("m"))
    spine = spark.range(HLL_M).select(F.col("id").alias("bucket"))
    full_regs = spine.join(regs, "bucket", "left").select(
        "bucket", F.coalesce("m", F.lit(0)).alias("m")
    )
    s = full_regs.agg(
        F.sum(F.expr(f"CAST(1 AS BIGINT) << ({HLL_WBITS + 1} - m)"))
        .cast("bigint")
        .alias("s_int"),
        F.sum(F.when(F.col("m") == 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n_zero"),
    )
    n_exact = toks.agg(F.count(F.lit(1)).cast("bigint").alias("n_exact"))
    x = s.crossJoin(F.broadcast(n_exact)).select(
        "s_int",
        "n_zero",
        "n_exact",
        (
            F.expr(_HLL_ALPHA)
            * HLL_M
            * HLL_M
            * (1 << (HLL_WBITS + 1))
            / F.col("s_int")
        ).alias("e_raw"),
    )
    corrected = F.when(
        (F.col("e_raw") <= 2.5 * HLL_M) & (F.col("n_zero") > 0),
        HLL_M * F.log(HLL_M / F.col("n_zero").cast("double")),
    ).otherwise(F.col("e_raw"))
    return x.select(
        "n_exact",
        "n_zero",
        F.round("e_raw", 4).alias("raw_estimate"),
        F.round(corrected, 4).alias("corrected_estimate"),
        F.round((corrected - F.col("n_exact")) / F.col("n_exact"), 4).alias(
            "rel_error"
        ),
    )


# ---------------------------------------------------------------------------
# graph: synchronous min-label propagation over the k-NN graph
# ---------------------------------------------------------------------------

LP_ROUNDS = 4
LP_NODE_CAP = 600  # same bounded exact-kNN slice as graph_pagerank_knn


def _label_prop_sql() -> str:
    from big_data_audio_classification_spark.operators.graph import KNN_K

    sql_cos = """
        list_sum(list_transform(list_zip(a.embedding, b.embedding),
                 p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
        / (SQRT(list_sum(list_transform(a.embedding,
                 x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
           * SQRT(list_sum(list_transform(b.embedding,
                 x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))))
    """
    parts = [
        f"""nset AS MATERIALIZED (
            SELECT vec_id, embedding FROM embeddings
            WHERE vec_id < {LP_NODE_CAP})""",
        f"""dedges AS MATERIALIZED (
            SELECT src, dst FROM (
                SELECT a.vec_id AS src, b.vec_id AS dst,
                       ROW_NUMBER() OVER (PARTITION BY a.vec_id
                           ORDER BY ROUND({sql_cos}, 6) DESC, b.vec_id) AS rn
                FROM nset a JOIN nset b ON a.vec_id <> b.vec_id)
            WHERE rn <= {KNN_K})""",
        """edges AS MATERIALIZED (
            SELECT src, dst FROM dedges
            UNION SELECT dst, src FROM dedges)""",
        """labels0 AS MATERIALIZED (
            SELECT vec_id, vec_id AS label FROM nset)""",
    ]
    for r in range(1, LP_ROUNDS + 1):
        parts.append(f"""labels{r} AS MATERIALIZED (
            SELECT l.vec_id,
                   LEAST(l.label, COALESCE(MIN(nl.label), l.label)) AS label
            FROM labels{r - 1} l
            LEFT JOIN edges e ON e.dst = l.vec_id
            LEFT JOIN labels{r - 1} nl ON nl.vec_id = e.src
            GROUP BY l.vec_id, l.label)""")
    sep = ",\n        "
    return f"""
        WITH {sep.join(parts)}
        SELECT CAST(label AS BIGINT)    AS label,
               CAST(COUNT(*) AS BIGINT) AS n_members
        FROM labels{LP_ROUNDS} GROUP BY label
    """


@query(
    "graph_label_propagation_sync",
    oracle=_label_prop_sql(),
    tags=("graph", "iterative", "similarity", "embeddings"),
)
def graph_label_propagation_sync(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SYNCHRONOUS MIN-LABEL PROPAGATION (4 rounds) over the
    symmetrized k-NN embedding graph — the community/component seeding
    pass (HashMin: every node takes the minimum label in its closed
    neighborhood each round; after r rounds labels have flowed r hops,
    so cluster structure at radius 4 is visible without running CC to
    convergence — full CC: ``dedup_connected_components``; spectral
    cousin: ``graph_pagerank_knn``). Deterministic end-to-end: the
    exact k-NN build uses the rounded-cosine/dst tiebreak shared with
    pagerank, labels are integers, min is order-free. Spark unrolls
    the rounds as join+groupBy over a checkpointed edge list (the
    Pregel superstep shape — at 100 TB each round is ONE shuffle keyed
    by dst); the oracle unrolls MATERIALIZED CTEs. Output is the
    cluster-size census, O(#labels) rows."""
    from big_data_audio_classification_spark.operators.graph import knn_edges

    dedges = knn_edges(spark, sf_dir, node_cap=LP_NODE_CAP)
    edges = (
        dedges.select("src", "dst")
        .union(dedges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    em = load_table(spark, sf_dir, "embeddings").filter(
        F.col("vec_id") < LP_NODE_CAP
    )
    labels = em.select("vec_id", F.col("vec_id").alias("label"))
    for _ in range(LP_ROUNDS):
        incoming = (
            edges.join(
                labels.select(
                    F.col("vec_id").alias("src"), F.col("label").alias("nl")
                ),
                "src",
            )
            .groupBy(F.col("dst").alias("vec_id"))
            .agg(F.min("nl").alias("min_in"))
        )
        labels = (
            labels.join(incoming, "vec_id", "left")
            .select(
                "vec_id",
                F.least(
                    F.col("label"), F.coalesce("min_in", F.col("label"))
                ).alias("label"),
            )
            .localCheckpoint(eager=True)
        )
    return labels.groupBy(F.col("label").cast("bigint").alias("label")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_members")
    )


# ---------------------------------------------------------------------------
# ml/text: CountVectorizer vocabulary contract (MLlib internals vs SQL)
# ---------------------------------------------------------------------------

VOCAB_STOPWORDS = (
    "the", "a", "an", "and", "or", "of", "to", "in", "on", "for",
    "is", "are", "was", "be", "with", "as", "at", "by", "it", "this",
)


def _vocab_contract_sql() -> str:
    stop_list = ", ".join(f"'{w}'" for w in VOCAB_STOPWORDS)
    return f"""
        WITH toks AS (
            SELECT doc_id,
                   UNNEST(list_filter(string_split_regex(lower(text), '\\s+'),
                                      t -> t <> '')) AS tok,
                   CAST(generate_subscripts(
                       list_filter(string_split_regex(lower(text), '\\s+'),
                                   t -> t <> ''), 1) AS BIGINT) AS pos
            FROM documents
        ),
        kept AS (
            SELECT doc_id, tok,
                   ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY pos)
                       AS kpos
            FROM toks WHERE tok NOT IN ({stop_list})
        ),
        bigrams AS (
            SELECT DISTINCT a.tok || ' ' || b.tok AS bigram
            FROM kept a JOIN kept b
              ON a.doc_id = b.doc_id AND b.kpos = a.kpos + 1
        )
        SELECT CAST(COUNT(*) AS BIGINT) AS n_vocab,
               md5(string_agg(bigram, '|' ORDER BY bigram)) AS vocab_md5
        FROM bigrams
    """


@query(
    "text_pipeline_vocab_contract",
    oracle=_vocab_contract_sql(),
    tags=("text", "ml", "mllib", "documents"),
)
def text_pipeline_vocab_contract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MLlib FEATURE-PIPELINE VOCABULARY CONTRACT — the SQL-oracled
    face of ``text_mllib_pipeline`` (rows-only because vocabulary
    INDEX order is an MLlib internal; the vocabulary SET is not):
    fit RegexTokenizer(\\s+, lowercase) → StopWordsRemover(explicit
    20-word list, shared with the oracle as a literal) → NGram(2) →
    CountVectorizer with vocabSize ABOVE the corpus's bigram-type
    count, so the fitted vocabulary must equal EXACTLY the distinct
    kept-bigram set — which the oracle derives relationally (tokenize,
    stop-filter with re-ranked positions, pos+1 self-join, DISTINCT).
    The comparison ships as (count, md5 of the sorted '|'-joined set):
    any MLlib tokenization/stopword/ngram/fit divergence flips the
    hash → driver red row. The fit is one distributed term-count agg;
    the driver-side vocabulary is bounded by the bigram-type count
    (vocab lists are the one legitimately driver-sized object in an
    MLlib fit — same stance as ``ml_pipeline_metadata_contract``)."""
    import hashlib

    from pyspark.ml import Pipeline
    from pyspark.ml.feature import (
        CountVectorizer,
        NGram,
        RegexTokenizer,
        StopWordsRemover,
    )

    d = load_table(spark, sf_dir, "documents")
    pipe = Pipeline(
        stages=[
            RegexTokenizer(inputCol="text", outputCol="toks", pattern="\\s+"),
            StopWordsRemover(
                inputCol="toks",
                outputCol="kept",
                stopWords=list(VOCAB_STOPWORDS),
            ),
            NGram(n=2, inputCol="kept", outputCol="bigrams"),
            CountVectorizer(
                inputCol="bigrams", outputCol="features", vocabSize=1 << 20
            ),
        ]
    )
    model = pipe.fit(d)
    vocab = model.stages[-1].vocabulary
    digest = hashlib.md5("|".join(sorted(vocab)).encode()).hexdigest()
    return spark.createDataFrame(
        [(len(vocab), digest)], "n_vocab long, vocab_md5 string"
    )
