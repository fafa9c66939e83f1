"""Scalar-function exemplars: string, date/time, math, JSON, array.

Reference parity: string concat (R1, lorem join), date_format naming
(R10, ``data_generator.py:6-7``), log10/floor/round/pmod math
(R15/R6/R17/R3), array ops on waveforms (R6 slice, R7 flatten, R46
array argmax). All expressions here are built-in ``pyspark.sql.functions``
— JVM-side, codegen'd, no Python in the hot path.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from big_data_audio_classification_spark.registry import query
from big_data_audio_classification_spark.sources.catalog import load_table


@query(
    "scalar_string_functions",
    oracle="""
        SELECT c_custkey,
               UPPER(c_name)                                   AS name_upper,
               LOWER(c_mktsegment)                             AS seg_lower,
               SUBSTRING(c_name, 1, 8)                         AS name_prefix,
               LENGTH(c_name)                                  AS name_len,
               CONCAT_WS('|', c_name, c_mktsegment)            AS name_seg,
               REGEXP_EXTRACT(c_name, '([0-9]+)', 1)           AS name_digits,
               REPLACE(c_name, '#', '-')                       AS name_dash,
               TRIM(CONCAT(' ', c_name, ' '))                  AS name_trim
        FROM customer
    """,
    tags=("scalar", "string"),
)
def scalar_string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String function battery (R1's concat_ws and friends)."""
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.upper("c_name").alias("name_upper"),
        F.lower("c_mktsegment").alias("seg_lower"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.length("c_name").alias("name_len"),
        F.concat_ws("|", "c_name", "c_mktsegment").alias("name_seg"),
        F.regexp_extract("c_name", "([0-9]+)", 1).alias("name_digits"),
        F.replace(F.col("c_name"), F.lit("#"), F.lit("-")).alias("name_dash"),
        F.trim(F.concat(F.lit(" "), F.col("c_name"), F.lit(" "))).alias("name_trim"),
    )


@query(
    "scalar_date_functions",
    oracle="""
        SELECT o_orderkey,
               YEAR(o_orderdate)                                    AS yr,
               MONTH(o_orderdate)                                   AS mon,
               DAYOFMONTH(o_orderdate)                              AS dom,
               STRFTIME(o_orderdate, '%Y-%m-%d')                    AS order_day,
               STRFTIME(o_orderdate + INTERVAL 30 DAY, '%Y-%m-%d')  AS due_day,
               DATEDIFF('day', CAST(o_orderdate AS DATE),
                        DATE '2002-01-01')                          AS days_to_2002,
               STRFTIME(DATE_TRUNC('month', o_orderdate), '%Y-%m-%d') AS month_start
        FROM orders
    """,
    tags=("scalar", "datetime"),
)
def scalar_date_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time battery (R10's date_format naming generalized).
    Timestamp-valued outputs are formatted to strings so the DuckDB
    oracle compares text, not TZ-dependent instants."""
    o = load_table(spark, sf_dir, "orders")
    d = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        F.year(d).alias("yr"),
        F.month(d).alias("mon"),
        F.dayofmonth(d).alias("dom"),
        F.date_format(d, "yyyy-MM-dd").alias("order_day"),
        F.date_format(F.date_add(d.cast("date"), 30), "yyyy-MM-dd").alias("due_day"),
        F.datediff(F.lit("2002-01-01").cast("date"), d.cast("date")).alias("days_to_2002"),
        F.date_format(F.date_trunc("month", d), "yyyy-MM-dd").alias("month_start"),
    )


@query(
    "scalar_math_functions",
    oracle="""
        SELECT l_orderkey, l_linenumber,
               ROUND(l_extendedprice, 0)                       AS price_round,
               CAST(FLOOR(l_quantity) AS BIGINT)               AS qty_floor,
               CAST(CEIL(l_discount * 100) AS BIGINT)          AS disc_pct_ceil,
               ABS(l_quantity - 25)                            AS qty_dev,
               MOD(l_orderkey, 7)                              AS key_mod7,
               ROUND(SQRT(l_extendedprice), 4)                 AS price_sqrt,
               ROUND(LOG10(l_extendedprice + 1), 6)            AS price_log10,
               ROUND(POWER(l_quantity, 2), 2)                  AS qty_sq,
               GREATEST(l_discount, l_tax)                     AS max_rate,
               LEAST(l_discount, l_tax)                        AS min_rate
        FROM lineitem
    """,
    tags=("scalar", "math"),
)
def scalar_math_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math battery: round/floor/ceil (R6/R17), pmod (R3), log10 (R15's
    dB math), greatest/least (R15's -80 dB floor)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round("l_extendedprice", 0).alias("price_round"),
        F.floor("l_quantity").alias("qty_floor"),
        F.ceil(F.col("l_discount") * 100).alias("disc_pct_ceil"),
        F.abs(F.col("l_quantity") - 25).alias("qty_dev"),
        F.pmod("l_orderkey", F.lit(7)).alias("key_mod7"),
        F.round(F.sqrt("l_extendedprice"), 4).alias("price_sqrt"),
        F.round(F.log10(F.col("l_extendedprice") + 1), 6).alias("price_log10"),
        F.round(F.pow("l_quantity", F.lit(2)), 2).alias("qty_sq"),
        F.greatest("l_discount", "l_tax").alias("max_rate"),
        F.least("l_discount", "l_tax").alias("min_rate"),
    )


@query(
    "scalar_json_extract",
    oracle="""
        SELECT event_id,
               CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_value
        FROM events
    """,
    tags=("scalar", "json", "events"),
)
def scalar_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON path extraction over ``events.props`` (mandated: SURVEY §1.2;
    at scale prefer ``from_json`` with an explicit schema once per column
    instead of repeated path probes)."""
    e = load_table(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("bigint").alias("k_value"),
    )


@query(
    "scalar_json_from_json_agg",
    oracle="""
        SELECT event_type,
               ROUND(AVG(CAST(json_extract_string(props, '$.k') AS DOUBLE)), 4) AS avg_k,
               COUNT(*) AS n
        FROM events
        GROUP BY event_type
        ORDER BY event_type
    """,
    tags=("scalar", "json", "events"),
)
def scalar_json_from_json_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed JSON parse (from_json with explicit schema — the scalable
    parse-once form) feeding an aggregate."""
    e = load_table(spark, sf_dir, "events")
    parsed = e.select(
        "event_type",
        F.from_json("props", "k DOUBLE").alias("p"),
    )
    return (
        parsed.groupBy("event_type")
        .agg(
            F.round(F.avg(F.col("p.k")), 4).alias("avg_k"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("event_type")
    )


@query(
    "array_embedding_stats",
    oracle="""
        SELECT vec_id,
               len(embedding)                                         AS dim,
               ROUND(list_sum(list_transform(embedding,
                     x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))), 4) AS sq_norm,
               ROUND(CAST(embedding[1] AS DOUBLE), 6)                 AS first_elem,
               ROUND(list_sum(list_transform(embedding,
                     x -> CAST(x AS DOUBLE))) / len(embedding), 6)    AS mean_elem
        FROM embeddings
    """,
    tags=("scalar", "array", "embeddings"),
)
def array_embedding_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array functions over embedding vectors: size, element access,
    higher-order aggregate/transform (R46's array math family). All
    JVM-side — no Python UDF for vector norms."""
    em = load_table(spark, sf_dir, "embeddings")
    dbl = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    sq_norm = F.aggregate(dbl, F.lit(0.0), lambda acc, x: acc + x * x)
    mean = F.aggregate(dbl, F.lit(0.0), lambda acc, x: acc + x) / F.size("embedding")
    return em.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.round(sq_norm, 4).alias("sq_norm"),
        F.round(F.element_at(dbl, 1), 6).alias("first_elem"),
        F.round(mean, 6).alias("mean_elem"),
    )


@query(
    "array_explode_tokens",
    oracle="""
        SELECT token, COUNT(*) AS n
        FROM (SELECT UNNEST(string_split(text, ' ')) AS token
              FROM documents WHERE doc_id < 100)
        WHERE token <> ''
        GROUP BY token
        ORDER BY n DESC, token
        LIMIT 30
    """,
    tags=("scalar", "array", "documents"),
)
def array_explode_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """split + explode + count: the word-count shape (generalizes R1's
    sentence assembly in reverse)."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    return (
        d.select(F.explode(F.split("text", " ")).alias("token"))
        .filter(F.col("token") != "")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), "token")
        .limit(30)
    )


@query(
    "array_sequence_slice",
    oracle="""
        SELECT vec_id,
               ROUND(list_sum(list_transform(embedding[1:8],
                     x -> CAST(x AS DOUBLE))), 4) AS head_sum,
               len(embedding[9:]) AS tail_len
        FROM embeddings
    """,
    tags=("scalar", "array", "embeddings"),
)
def array_sequence_slice(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array slice (R6's truncate-to-whole-second as a slice) + tail."""
    em = load_table(spark, sf_dir, "embeddings")
    head = F.slice(F.col("embedding"), 1, 8)
    tail = F.slice(F.col("embedding"), 9, F.size("embedding") - F.lit(8))
    return em.select(
        "vec_id",
        F.round(
            F.aggregate(head, F.lit(0.0), lambda acc, x: acc + x.cast("double")), 4
        ).alias("head_sum"),
        F.size(tail).alias("tail_len"),
    )


@query(
    "scalar_string_distance",
    oracle="""
        SELECT c_custkey,
               levenshtein(c_name, translate(c_name, '0', 'O')) AS lev_o,
               levenshtein(c_name, reverse(c_name))             AS lev_rev,
               lpad(CAST(c_custkey AS VARCHAR), 10, '0')        AS padded_key,
               split_part(c_name, '#', 2)                       AS name_num,
               repeat(c_mktsegment, 2)                          AS seg_twice
        FROM customer
    """,
    tags=("scalar", "string", "fuzzy"),
)
def scalar_string_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance + structural string functions (SURVEY §2.B string
    family: levenshtein/translate/reverse/lpad/split_part/repeat). At
    scale levenshtein appears inside blocked fuzzy-dedup joins (see
    operators/dedup.py for the blocking patterns); here it's the scalar
    surface itself."""
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.levenshtein("c_name", F.translate("c_name", "0", "O")).alias("lev_o"),
        F.levenshtein("c_name", F.reverse("c_name")).alias("lev_rev"),
        F.lpad(F.col("c_custkey").cast("string"), 10, "0").alias("padded_key"),
        F.split_part(F.col("c_name"), F.lit("#"), F.lit(2)).alias("name_num"),
        F.repeat(F.col("c_mktsegment"), 2).alias("seg_twice"),
    )


@query(
    "scalar_variant_extract",
    oracle="""
        SELECT event_type,
               CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT))
                    AS BIGINT)                                         AS sum_k,
               COUNT(*) AS n
        FROM events
        GROUP BY event_type
        ORDER BY event_type
    """,
    tags=("scalar", "json", "variant", "events"),
)
def scalar_variant_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured access via Spark 4 VariantType: ``parse_json``
    once into a binary-encoded variant, then typed ``try_variant_get``
    path reads. Versus string re-parsing (``get_json_object`` per path),
    the variant parses each document once into a shredded binary form —
    the 100 TB path for schema-flexible columns (and unlike
    ``from_json``, it needs no schema declared up front)."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.select(
            "event_type",
            F.try_variant_get(F.parse_json("props"), "$.k", "bigint").alias("k"),
        )
        .groupBy("event_type")
        .agg(F.sum("k").alias("sum_k"), F.count(F.lit(1)).alias("n"))
        .orderBy("event_type")
    )


@query(
    "scalar_null_handling",
    oracle="""
        SELECT l_orderkey, l_linenumber,
               NULLIF(l_returnflag, 'N')                        AS flag_or_null,
               COALESCE(NULLIF(l_returnflag, 'N'), 'none')      AS flag_filled,
               CASE WHEN NULLIF(l_returnflag, 'N') IS NOT NULL
                    THEN 'has' ELSE 'missing' END               AS flag_nvl2,
               ROUND(CASE WHEN isnan(CASE WHEN l_discount < 0.005
                                          THEN 'NaN'::DOUBLE
                                          ELSE l_discount END)
                          THEN 0.0
                          ELSE CASE WHEN l_discount < 0.005
                                    THEN 'NaN'::DOUBLE
                                    ELSE l_discount END END, 4) AS disc_nan_fixed
        FROM lineitem
    """,
    tags=("scalar", "null"),
)
def scalar_null_handling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-propagation battery: nullif / coalesce / nvl2 / nanvl.
    The corpus tables are null-free by construction, so nulls (and a
    NaN) are introduced deterministically with nullif/when — the
    handling expressions are the operator under test. DuckDB has no
    nvl2/nanvl; the oracle spells them as CASE (same semantics)."""
    li = load_table(spark, sf_dir, "lineitem")
    flag_or_null = F.nullif(F.col("l_returnflag"), F.lit("N"))
    disc_with_nan = F.when(
        F.col("l_discount") < 0.005, F.lit(float("nan"))
    ).otherwise(F.col("l_discount"))
    return li.select(
        "l_orderkey",
        "l_linenumber",
        flag_or_null.alias("flag_or_null"),
        F.coalesce(flag_or_null, F.lit("none")).alias("flag_filled"),
        F.nvl2(flag_or_null, F.lit("has"), F.lit("missing")).alias("flag_nvl2"),
        F.round(F.nanvl(disc_with_nan, F.lit(0.0)), 4).alias("disc_nan_fixed"),
    )


@query(
    "scalar_regexp_functions",
    oracle="""
        SELECT event_id,
               regexp_extract(props, '[0-9]+', 0)             AS first_num,
               array_to_string(regexp_extract_all(props, '[0-9]+'), ',') AS all_nums,
               len(regexp_extract_all(props, '[0-9]+'))       AS n_nums,
               regexp_replace(props, '[0-9]', '#', 'g')       AS masked,
               regexp_matches(props, '"k": [0-9]{2}')         AS two_digit_k
        FROM events
    """,
    tags=("scalar", "string", "regexp", "events"),
)
def scalar_regexp_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex battery over the JSON-string props column: extract (group
    0 on both engines — Spark defaults to group 1, DuckDB to the full
    match), extract-all (serialized with array_join so the driver's
    pandas canonicalizer can hash the column — raw array cells are
    unhashable there), count, replace-all (Spark replaces all matches
    by default; DuckDB needs the 'g' flag), and rlike. All JVM regex —
    no Python."""
    e = load_table(spark, sf_dir, "events")
    p = F.col("props")
    return e.select(
        "event_id",
        F.regexp_extract(p, "[0-9]+", 0).alias("first_num"),
        F.array_join(F.regexp_extract_all(p, F.lit("[0-9]+"), 0), ",").alias(
            "all_nums"
        ),
        F.size(F.regexp_extract_all(p, F.lit("[0-9]+"), 0)).alias("n_nums"),
        F.regexp_replace(p, "[0-9]", "#").alias("masked"),
        p.rlike('"k": [0-9]{2}').alias("two_digit_k"),
    )


@query(
    "array_posexplode_outer",
    oracle="""
        WITH t AS (
            SELECT doc_id,
                   CASE WHEN doc_id % 7 = 0
                        THEN []::VARCHAR[]
                        ELSE list_filter(string_split(text, ' '),
                                         x -> x <> '')[1:3] END AS toks
            FROM documents WHERE doc_id < 50
        )
        SELECT doc_id, CAST(z[1] AS INT) AS pos, CAST(z[2] AS VARCHAR) AS tok
        FROM (SELECT doc_id, UNNEST(list_zip(range(0, len(toks)), toks)) AS z
              FROM t WHERE len(toks) > 0)
        UNION ALL
        SELECT doc_id, NULL AS pos, NULL AS tok FROM t WHERE len(toks) = 0
    """,
    tags=("scalar", "array", "explode", "documents"),
)
def array_posexplode_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """posexplode_outer: positional explode that PRESERVES rows whose
    array is empty (null pos/tok) — the outer variant matters whenever
    the parent row must survive (joins back to doc metadata). Empty
    arrays are introduced deterministically (doc_id % 7)."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    toks = F.when(
        F.col("doc_id") % 7 == 0, F.array().cast("array<string>")
    ).otherwise(F.slice(F.filter(F.split("text", " "), lambda t: t != ""), 1, 3))
    return d.select("doc_id", toks.alias("toks")).select(
        "doc_id", F.posexplode_outer("toks").alias("pos", "tok")
    )


@query(
    "scalar_try_functions",
    oracle="""
        SELECT c_custkey,
               TRY_CAST(CASE WHEN c_custkey % 2 = 0
                             THEN regexp_extract(c_name, '([0-9]+)', 1)
                             ELSE c_name END AS INTEGER)     AS maybe_num,
               CASE WHEN c_custkey % 3 = 0 THEN NULL
                    ELSE ROUND(c_acctbal / (c_custkey % 3), 4) END AS safe_div,
               string_split(c_name, '#')[5]                  AS fifth_part
        FROM customer
    """,
    tags=("scalar", "ansi", "try"),
)
def scalar_try_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI-safety battery: Spark 4 runs ANSI mode by default, so the
    idiomatic null-on-failure forms are the ``try_*`` functions —
    try_cast (malformed -> NULL instead of error), try_divide (x/0 ->
    NULL instead of error), try_element_at (out-of-bounds -> NULL).
    DuckDB spells them TRY_CAST / CASE-guarded divide / native
    out-of-bounds-NULL list indexing."""
    c = load_table(spark, sf_dir, "customer")
    mixed = F.when(
        F.col("c_custkey") % 2 == 0,
        F.regexp_extract("c_name", "([0-9]+)", 1),
    ).otherwise(F.col("c_name"))
    return c.select(
        "c_custkey",
        mixed.try_cast("int").alias("maybe_num"),
        F.round(
            F.try_divide("c_acctbal", F.col("c_custkey") % 3), 4
        ).alias("safe_div"),
        F.try_element_at(F.split("c_name", "#"), F.lit(5)).alias("fifth_part"),
    )


@query(
    "scalar_mask_redact",
    oracle="""
        SELECT c_custkey,
               regexp_replace(regexp_replace(regexp_replace(
                   c_name, '[A-Z]', 'X', 'g'), '[a-z]', 'x', 'g'),
                   '[0-9]', 'n', 'g')                       AS masked,
               substr(c_name, 1, 9) ||
               regexp_replace(substr(c_name, 10), '[0-9]', 'n', 'g')
                                                            AS partial
        FROM customer
    """,
    tags=("scalar", "string", "masking", "governance", "customer"),
)
def scalar_mask_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII masking (data-governance redaction): full ``mask()`` —
    uppercase→X, lowercase→x, digit→n, punctuation kept — plus the
    partial-reveal form that keeps a business prefix and masks the
    numeric tail. Pure codegen string kernels, map-only; the oracle
    states the same transform as regexp chains (DuckDB has no mask()).
    The pattern a 100 TB PII pass applies column-wise before data
    leaves the governed zone (the regex-driven scrub for free text is
    ``text_pii_scrub``)."""
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.mask("c_name").alias("masked"),
        F.concat(
            F.substring("c_name", 1, 9),
            F.mask(
                F.expr("substring(c_name, 10)"),
                upperChar=F.lit("X"),
                lowerChar=F.lit("x"),
                digitChar=F.lit("n"),
                otherChar=F.lit(None),
            ),
        ).alias("partial"),
    )


@query(
    "scalar_collation_ci",
    oracle="""
        WITH m AS (
            SELECT CASE WHEN c_custkey % 2 = 0
                        THEN lower(c_mktsegment) ELSE c_mktsegment END AS seg
            FROM customer
        )
        SELECT CAST(COUNT(*) AS BIGINT)                    AS n_rows,
               CAST(COUNT(DISTINCT seg) AS BIGINT)         AS distinct_binary,
               CAST(COUNT(DISTINCT lower(seg)) AS BIGINT)  AS distinct_ci
        FROM m
    """,
    tags=("scalar", "string", "collation", "customer"),
)
def scalar_collation_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String collations (Spark 4): the same mixed-case column counts
    10 distinct values under binary (UTF8_BINARY) comparison but 5
    under the UNICODE_CI collation — equality, grouping, and joins all
    follow the column's collation instead of needing lower() wrapped
    around every reference (which would also defeat pushdown/stats).
    The oracle states the CI semantics via lower()."""
    c = load_table(spark, sf_dir, "customer")
    m = c.select(
        F.when(
            F.col("c_custkey") % 2 == 0, F.lower("c_mktsegment")
        )
        .otherwise(F.col("c_mktsegment"))
        .alias("seg")
    )
    return m.agg(
        F.count("*").cast("bigint").alias("n_rows"),
        F.countDistinct("seg").cast("bigint").alias("distinct_binary"),
        F.countDistinct(F.collate(F.col("seg"), "UNICODE_CI"))
        .cast("bigint")
        .alias("distinct_ci"),
    )


@query(
    "scalar_xml_roundtrip",
    oracle="""
        SELECT o_orderkey, o_orderstatus AS status,
               ROUND(o_totalprice, 2)    AS price
        FROM orders
    """,
    tags=("scalar", "xml", "serialization", "orders"),
)
def scalar_xml_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XML functions (Spark 4 ``to_xml``/``from_xml``): serialize each
    order to an XML fragment and parse it straight back — the
    roundtripped fields must equal the source projection (which is
    exactly what the oracle states; DuckDB has no XML writer to
    byte-compare against). Map-only codegen both directions; the
    schema argument makes the parse a typed single pass, the same
    contract as ``from_json``."""
    o = load_table(spark, sf_dir, "orders")
    xml = F.to_xml(
        F.struct(
            F.col("o_orderkey").alias("k"),
            F.col("o_orderstatus").alias("s"),
            F.round("o_totalprice", 2).alias("p"),
        )
    )
    parsed = F.from_xml(xml, "k BIGINT, s STRING, p DOUBLE")
    return o.select(parsed.alias("r")).select(
        F.col("r.k").alias("o_orderkey"),
        F.col("r.s").alias("status"),
        F.col("r.p").alias("price"),
    )


@query(
    "scalar_url_functions",
    oracle="""
        WITH u AS (
            SELECT doc_id, source, lang,
                   'https://' || source || '.Example.com/' || lang
                   || '/doc?id=' || doc_id || '&q=' || source || '+' || lang
                       AS url
            FROM documents
        )
        SELECT doc_id,
               split_part(split_part(url, '//', 2), '/', 1)           AS host,
               '/' || lang || '/doc'                                  AS path,
               regexp_extract(url, 'id=([0-9]+)', 1)                  AS id_param,
               replace(source || ' ' || lang, ' ', '+')               AS q_encoded,
               lower(split_part(split_part(url, '//', 2), '/', 1))
               || '/' || lang                                         AS norm_key
        FROM u
    """,
    tags=("scalar", "string", "url", "documents"),
)
def scalar_url_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL parsing/normalization (``parse_url`` HOST/PATH/QUERY-param +
    ``url_encode``) — the first step of every web-corpus pipeline:
    canonical (lowercased host, first path segment) keys drive
    URL-level dedup before any content hashing. URLs are built
    deterministically from the document columns (query value
    pre-encoded — Spark 4's parse_url is strict about raw spaces), so
    the oracle restates the parse with string surgery (DuckDB has no
    parse_url/url_encode; the encode target is space→'+' on
    alphanumeric input, stated as replace() there). All map-only
    codegen — at 100 TB this runs inside the ingest scan."""
    d = load_table(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://"), F.col("source"), F.lit(".Example.com/"),
        F.col("lang"), F.lit("/doc?id="), F.col("doc_id"),
        F.lit("&q="), F.col("source"), F.lit("+"), F.col("lang"),
    )
    u = d.select("doc_id", "source", "lang", url.alias("url"))
    host = F.parse_url(F.col("url"), F.lit("HOST"))
    return u.select(
        "doc_id",
        host.alias("host"),
        F.parse_url(F.col("url"), F.lit("PATH")).alias("path"),
        F.parse_url(F.col("url"), F.lit("QUERY"), F.lit("id")).alias(
            "id_param"
        ),
        F.url_encode(
            F.concat(F.col("source"), F.lit(" "), F.col("lang"))
        ).alias("q_encoded"),
        F.concat(F.lower(host), F.lit("/"), F.col("lang")).alias("norm_key"),
    )


@query(
    "scalar_hash_functions",
    oracle="""
        SELECT c_custkey,
               md5(c_name) AS name_md5,
               sha256(c_name) AS name_sha256,
               substr(md5(c_name || '|' || c_mktsegment), 1, 16)
                   AS composite_bucket
        FROM customer
        WHERE c_custkey < 200
    """,
    tags=("scalar", "hash", "customer"),
)
def scalar_hash_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cryptographic content hashes as portable dedup/bucket keys:
    md5 and sha256 are ALGORITHM-DEFINED, so the same bytes give the
    same digest in every engine — unlike engine-native hash()/xxhash64
    whose values are implementation details. This is the digest
    discipline the exact-dedup family builds on (dedup_exact_hash):
    derive keys from content hashes and any engine can reproduce the
    partition assignment.

    Pure codegen scalar work over a pushed-down key filter."""
    c = load_table(spark, sf_dir, "customer")
    return c.where(F.col("c_custkey") < 200).select(
        "c_custkey",
        F.md5("c_name").alias("name_md5"),
        F.sha2("c_name", 256).alias("name_sha256"),
        F.substring(
            F.md5(F.concat_ws("|", "c_name", "c_mktsegment")), 1, 16
        ).alias("composite_bucket"),
    )


@query(
    "scalar_decimal_exact",
    oracle="""
        WITH d AS (
            SELECT o_orderstatus,
                   CAST(o_totalprice AS DECIMAL(14,2)) AS price
            FROM orders
        )
        SELECT o_orderstatus,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(price) AS DOUBLE) AS total_exact,
               CAST(SUM(price * CAST(0.07 AS DECIMAL(3,2))) AS DOUBLE)
                   AS tax_exact,
               CAST(SUM(price) AS DOUBLE) / COUNT(*) AS avg_exact
        FROM d GROUP BY o_orderstatus
    """,
    tags=("scalar", "decimal", "aggregate", "orders"),
)
def scalar_decimal_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DECIMAL-typed exact aggregation: prices cast to DECIMAL(14,2)
    (the cents-exact doubles resolve unambiguously), summed and
    tax-multiplied in exact fixed-point — NO rounding idiom needed,
    unlike every double SUM in this repo, because decimal addition is
    associative and order-independent. The final cast to DOUBLE is
    itself exact (totals < 2^53 at these scales), so the cross-engine
    hash matches without tolerance.

    Scale note: Spark decimal aggregation stays in Tungsten (long-backed
    Decimal128 for precision ≤ 38) with map-side partial sums — the
    exactness costs no extra shuffle. This is the idiom for money math
    at 100 TB; the repo's ROUND-before-compare discipline elsewhere is
    only needed where doubles are the storage type."""
    o = load_table(spark, sf_dir, "orders")
    price = F.col("o_totalprice").cast("decimal(14,2)")
    tax = price * F.lit("0.07").cast("decimal(3,2)")
    return o.groupBy("o_orderstatus").agg(
        F.count("*").alias("n"),
        F.sum(price).cast("double").alias("total_exact"),
        F.sum(tax).cast("double").alias("tax_exact"),
        (F.sum(price).cast("double") / F.count("*")).alias("avg_exact"),
    )


@query(
    "scalar_timezone_functions",
    oracle="""
        SELECT event_id,
               CAST(epoch_us(timezone('UTC', ts)) AS BIGINT) AS utc_micros,
               CAST(EXTRACT(hour FROM
                    timezone('America/New_York', timezone('UTC', ts)))
                    AS INTEGER) AS ny_hour,
               CAST(CAST(timezone('Australia/Sydney', timezone('UTC', ts))
                         AS DATE) AS VARCHAR) AS sydney_date,
               CAST((epoch_us(timezone('America/New_York', ts))
                     - epoch_us(timezone('UTC', ts))) / 3600000000
                    AS INTEGER) AS ny_offset_hours
        FROM events
    """,
    tags=("scalar", "timezone", "events"),
)
def scalar_timezone_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-zone conversion battery over the event stream (IANA tzdata
    in both engines): the UTC instant in micros, the New-York local
    hour, the Sydney local date (crosses the date line for evening UTC
    events), and the NY offset-from-UTC in hours recovered by
    re-interpreting the same wall time in both zones (5 in January,
    4 under DST — the derivation a tz-correct engine must get right).

    Session-timezone independence: every expression goes through an
    explicit zone (interpret-as-UTC first), never the ambient session
    zone — the only portable discipline for tz math, restated
    identically in the oracle (DuckDB ICU timezone())."""
    e = load_table(spark, sf_dir, "events")
    ny_instant = F.to_utc_timestamp("ts", "America/New_York")
    utc_instant = F.col("ts")  # catalog normalizes ts to naive UTC
    return e.select(
        "event_id",
        F.unix_micros(utc_instant).alias("utc_micros"),
        F.hour(F.from_utc_timestamp("ts", "America/New_York")).alias("ny_hour"),
        F.from_utc_timestamp("ts", "Australia/Sydney")
        .cast("date")
        .cast("string")
        .alias("sydney_date"),
        (
            (F.unix_micros(ny_instant) - F.unix_micros(utc_instant))
            / 3_600_000_000
        )
        .cast("int")
        .alias("ny_offset_hours"),
    )


@query(
    "scalar_base64_roundtrip",
    oracle="""
        SELECT c_custkey,
               to_base64(CAST(c_name AS BLOB)) AS name_b64,
               decode(from_base64(to_base64(CAST(c_name AS BLOB))))
                   = c_name AS roundtrip_ok
        FROM customer
    """,
    tags=("scalar", "string", "codec", "customer"),
)
def scalar_base64_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Base64 encode/decode battery (the blob-over-text transport
    codec): RFC 4648 output is engine-independent, so the encoded
    string itself is hash-compared, and the decode closes the loop."""
    c = load_table(spark, sf_dir, "customer")
    b64 = F.base64(F.col("c_name").cast("binary"))
    return c.select(
        "c_custkey",
        b64.alias("name_b64"),
        (F.unbase64(b64).cast("string") == F.col("c_name")).alias(
            "roundtrip_ok"
        ),
    )


# --- round-5 carriers: fresh never-driver-certified exemplars for the
# math / json / map / variant / array families (the r05 window is all
# first-time entries; each family needs a first-time carrier) ---------


@query(
    "scalar_math_exp_log",
    oracle="""
        SELECT l_orderkey, l_linenumber,
               ROUND(EXP(l_discount), 6)                        AS disc_exp,
               ROUND(LN(l_extendedprice + 1), 6)                AS price_ln,
               ROUND(LOG2(l_quantity + 1), 6)                   AS qty_log2,
               CAST(SIGN(l_quantity - 25) AS BIGINT)            AS qty_sign,
               ROUND(ATAN2(l_tax, l_discount + 0.001), 6)       AS rate_angle,
               ROUND(CBRT(l_extendedprice), 6)                  AS price_cbrt,
               ROUND(1.0 / (1.0 + EXP(-(l_quantity - 25) / 10.0)), 6)
                                                                AS qty_sigmoid
        FROM lineitem
    """,
    tags=("scalar", "math", "lineitem"),
)
def scalar_math_exp_log(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transcendental math battery (exp/ln/log2/sign/atan2/cbrt and the
    logistic transform every ML featurizer applies) — complements the
    rounding-family battery in ``scalar_math_functions``. All built-ins,
    whole-stage-codegen'd; ROUND(_, 6) absorbs any libm ulp drift."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.exp("l_discount"), 6).alias("disc_exp"),
        F.round(F.log(F.col("l_extendedprice") + 1), 6).alias("price_ln"),
        F.round(F.log2(F.col("l_quantity") + 1), 6).alias("qty_log2"),
        F.signum(F.col("l_quantity") - 25).cast("bigint").alias("qty_sign"),
        F.round(F.atan2(F.col("l_tax"), F.col("l_discount") + 0.001), 6).alias(
            "rate_angle"
        ),
        F.round(F.cbrt("l_extendedprice"), 6).alias("price_cbrt"),
        F.round(
            1.0 / (1.0 + F.exp(-(F.col("l_quantity") - 25) / 10.0)), 6
        ).alias("qty_sigmoid"),
    )


@query(
    "scalar_json_build_extract",
    oracle="""
        SELECT o_orderkey,
               CAST(json_extract_string(
                   to_json(struct_pack(status := o_orderstatus,
                                       fin := struct_pack(amt := o_totalprice,
                                                          pri := o_orderpriority))),
                   '$.fin.pri') AS VARCHAR)                    AS pri,
               ROUND(CAST(json_extract(
                   to_json(struct_pack(status := o_orderstatus,
                                       fin := struct_pack(amt := o_totalprice,
                                                          pri := o_orderpriority))),
                   '$.fin.amt') AS DOUBLE), 2)                 AS amt,
               json_extract_string(
                   to_json(struct_pack(status := o_orderstatus,
                                       fin := struct_pack(amt := o_totalprice,
                                                          pri := o_orderpriority))),
                   '$.missing') IS NULL                        AS missing_is_null
        FROM orders
    """,
    tags=("scalar", "json", "orders"),
)
def scalar_json_build_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON build→extract round trip: serialize a nested struct with
    ``to_json`` and read it back by path (``get_json_object``), the
    log-enrichment shape. Only EXTRACTED values are compared (JSON text
    itself is engine-formatting-dependent); the nested path and the
    missing-path→NULL contract are the checks."""
    o = load_table(spark, sf_dir, "orders")
    j = F.to_json(
        F.struct(
            F.col("o_orderstatus").alias("status"),
            F.struct(
                F.col("o_totalprice").alias("amt"),
                F.col("o_orderpriority").alias("pri"),
            ).alias("fin"),
        )
    )
    return o.select(
        "o_orderkey",
        F.get_json_object(j, "$.fin.pri").alias("pri"),
        F.round(F.get_json_object(j, "$.fin.amt").cast("double"), 2).alias("amt"),
        F.get_json_object(j, "$.missing").isNull().alias("missing_is_null"),
    )


@query(
    "scalar_map_lookup_pipeline",
    oracle="""
        SELECT event_id,
               event_type                                       AS type_val,
               CAST(event_id % 7 AS BIGINT)                     AS bucket_val,
               2                                                AS n_keys,
               event_type = 'purchase'                          AS is_purchase,
               CAST(event_id % 7 + 100 AS BIGINT)               AS shifted
        FROM events
    """,
    tags=("scalar", "map", "events"),
)
def scalar_map_lookup_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-column pipeline: build with ``map_from_arrays``, look up by
    key, ``map_contains_key``, ``size``, and ``transform_values`` — the
    property-bag access shape. The oracle pins the VALUES the map ops
    must produce (maps are key-order-free, so scalar lookups — not the
    serialized map — are what is comparable cross-engine). Exercised
    per-row, JVM-side, codegen'd (complements ``scalar_map_functions``'
    entries/keys battery)."""
    e = load_table(spark, sf_dir, "events")
    m = F.map_from_arrays(
        F.array(F.lit("type"), F.lit("bucket")),
        F.array(F.col("event_type"), (F.col("event_id") % 7).cast("string")),
    )
    shifted = F.transform_values(
        F.map_from_arrays(
            F.array(F.lit("bucket")), F.array(F.col("event_id") % 7)
        ),
        lambda k, v: v + 100,
    )
    return e.select(
        "event_id",
        m["type"].alias("type_val"),
        m["bucket"].cast("bigint").alias("bucket_val"),
        F.size(m).alias("n_keys"),
        (m["type"] == "purchase").alias("is_purchase"),
        F.element_at(shifted, "bucket").cast("bigint").alias("shifted"),
    )


@query(
    "scalar_variant_histogram",
    oracle="""
        SELECT CAST(CAST(json_extract_string(props, '$.k') AS BIGINT) // 10
                    AS BIGINT)                                  AS k_decile,
               CAST(COUNT(*) AS BIGINT)                         AS n,
               CAST(MIN(CAST(json_extract_string(props, '$.k') AS BIGINT))
                    AS BIGINT)                                  AS k_min,
               CAST(MAX(CAST(json_extract_string(props, '$.k') AS BIGINT))
                    AS BIGINT)                                  AS k_max
        FROM events
        GROUP BY k_decile
    """,
    tags=("scalar", "variant", "events"),
)
def scalar_variant_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Variant-typed aggregation: ``parse_json`` once into a binary
    variant, typed ``try_variant_get`` read, then histogram by decile —
    the schema-on-read rollup shape (complements the per-type sum in
    ``scalar_variant_extract``). The variant parse is the 100 TB move:
    one parse per row feeding any number of typed path reads."""
    e = load_table(spark, sf_dir, "events")
    k = F.try_variant_get(F.parse_json("props"), "$.k", "bigint")
    return (
        e.select(F.floor(k / 10).cast("bigint").alias("k_decile"), k.alias("k"))
        .groupBy("k_decile")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.min("k").cast("bigint").alias("k_min"),
            F.max("k").cast("bigint").alias("k_max"),
        )
    )


@query(
    "array_fold_reverse_dot",
    oracle="""
        SELECT vec_id,
               ROUND(list_sum(list_transform(
                   list_zip(embedding, list_reverse(embedding)),
                   p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))), 6)
                                                               AS rev_dot,
               ROUND(list_sum(list_transform(embedding[1:8],
                   x -> CAST(x AS DOUBLE))), 6)                AS head_sum,
               ROUND(CAST(list_max(embedding) AS DOUBLE), 6)   AS emb_max,
               CAST(list_position(embedding, list_max(embedding)) AS BIGINT)
                                                               AS argmax_1b,
               len(list_filter(embedding, x -> x > 0))         AS n_pos
        FROM embeddings
    """,
    tags=("scalar", "array", "embeddings"),
)
def array_fold_reverse_dot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array battery: ``zip_with`` a vector against its
    ``reverse`` and fold (the palindromic autocorrelation probe),
    slice-sum, max/argmax, and predicate count — all sequential
    index-order folds, so the doubles match the oracle bitwise
    (complements ``array_higher_order_predicates``)."""
    em = load_table(spark, sf_dir, "embeddings")
    rev_dot = F.aggregate(
        F.zip_with(
            "embedding",
            F.reverse(F.col("embedding")),
            lambda a, b: a.cast("double") * b.cast("double"),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    head_sum = F.aggregate(
        F.slice("embedding", 1, 8), F.lit(0.0), lambda acc, x: acc + x.cast("double")
    )
    return em.select(
        "vec_id",
        F.round(rev_dot, 6).alias("rev_dot"),
        F.round(head_sum, 6).alias("head_sum"),
        F.round(F.array_max("embedding").cast("double"), 6).alias("emb_max"),
        F.array_position(F.col("embedding"), F.array_max("embedding"))
        .cast("bigint")
        .alias("argmax_1b"),
        F.size(F.filter("embedding", lambda x: x > 0)).alias("n_pos"),
    )


# --- round-6 carriers: fresh never-driver-certified exemplars for the
# math / json / variant / array / map families (every earlier carrier
# was certified in the r01-r05 windows; the r06 window again needs
# first-time entries per family) --------------------------------------


@query(
    "scalar_math_haversine",
    oracle="""
        WITH pts AS (
            SELECT c_custkey,
                   CAST((c_custkey * 37) % 18000 AS DOUBLE) / 100.0 - 90.0
                       AS lat,
                   CAST((c_custkey * 73) % 36000 AS DOUBLE) / 100.0 - 180.0
                       AS lon
            FROM customer
        )
        SELECT c_custkey,
               ROUND(lat, 2) AS lat,
               ROUND(lon, 2) AS lon,
               ROUND(2.0 * 6371.0088 * ASIN(SQRT(
                   POW(SIN(RADIANS(48.8566 - lat) / 2.0), 2)
                   + COS(RADIANS(lat)) * COS(RADIANS(48.8566))
                     * POW(SIN(RADIANS(2.3522 - lon) / 2.0), 2))), 4)
                   AS dist_km,
               ROUND(DEGREES(ATAN2(
                   SIN(RADIANS(2.3522 - lon)) * COS(RADIANS(48.8566)),
                   COS(RADIANS(lat)) * SIN(RADIANS(48.8566))
                   - SIN(RADIANS(lat)) * COS(RADIANS(48.8566))
                     * COS(RADIANS(2.3522 - lon)))), 4)
                   AS bearing_deg
        FROM pts
    """,
    tags=("scalar", "math", "customer"),
)
def scalar_math_haversine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Great-circle trig battery (radians/degrees/sin/cos/asin/atan2 —
    the geo-featurizer shape): haversine distance and initial bearing
    from a key-derived point grid to a fixed anchor. Complements the
    exp/log battery in ``scalar_math_exp_log``; all built-ins,
    whole-stage-codegen'd, ROUND absorbs libm ulp drift."""
    c = load_table(spark, sf_dir, "customer")
    lat = ((F.col("c_custkey") * 37) % 18000).cast("double") / 100.0 - 90.0
    lon = ((F.col("c_custkey") * 73) % 36000).cast("double") / 100.0 - 180.0
    dphi = F.radians(F.lit(48.8566) - lat)
    dlam = F.radians(F.lit(2.3522) - lon)
    a = (
        F.pow(F.sin(dphi / 2.0), 2)
        + F.cos(F.radians(lat)) * F.cos(F.radians(F.lit(48.8566)))
        * F.pow(F.sin(dlam / 2.0), 2)
    )
    bearing = F.atan2(
        F.sin(dlam) * F.cos(F.radians(F.lit(48.8566))),
        F.cos(F.radians(lat)) * F.sin(F.radians(F.lit(48.8566)))
        - F.sin(F.radians(lat))
        * F.cos(F.radians(F.lit(48.8566)))
        * F.cos(dlam),
    )
    return c.select(
        "c_custkey",
        F.round(lat, 2).alias("lat"),
        F.round(lon, 2).alias("lon"),
        F.round(2.0 * 6371.0088 * F.asin(F.sqrt(a)), 4).alias("dist_km"),
        F.round(F.degrees(bearing), 4).alias("bearing_deg"),
    )


@query(
    "scalar_json_array_paths",
    oracle="""
        WITH j AS (
            SELECT event_id,
                   to_json(struct_pack(
                       k := CAST(json_extract_string(props, '$.k') AS BIGINT),
                       tier := CASE
                           WHEN CAST(json_extract_string(props, '$.k') AS BIGINT)
                                >= 50 THEN 'high' ELSE 'low' END,
                       tags := [event_type, 'evt',
                                CAST(event_id % 5 AS VARCHAR)])) AS doc
            FROM events
        )
        SELECT event_id,
               CAST(json_extract_string(doc, '$.k') AS BIGINT)   AS k_out,
               json_extract_string(doc, '$.tier')                AS tier,
               json_extract_string(doc, '$.tags[1]')             AS tag_2,
               CAST(json_array_length(doc, '$.tags') AS INTEGER) AS n_tags,
               json_extract_string(doc, '$.tags[9]') IS NULL     AS oob_is_null
        FROM j
    """,
    tags=("scalar", "json", "events"),
)
def scalar_json_array_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON ARRAY paths: serialize a struct holding a string array, then
    read back by indexed path (``$.tags[1]``), take the array length,
    and pin out-of-bounds → NULL — the tag-enrichment shape that
    complements the nested-object paths in ``scalar_json_build_extract``.
    One to_json per row; all extraction JVM-side."""
    e = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    doc = F.to_json(
        F.struct(
            k.alias("k"),
            F.when(k >= 50, F.lit("high")).otherwise(F.lit("low")).alias("tier"),
            F.array(
                F.col("event_type"), F.lit("evt"),
                (F.col("event_id") % 5).cast("string"),
            ).alias("tags"),
        )
    )
    return e.select(
        "event_id",
        F.get_json_object(doc, "$.k").cast("bigint").alias("k_out"),
        F.get_json_object(doc, "$.tier").alias("tier"),
        F.get_json_object(doc, "$.tags[1]").alias("tag_2"),
        F.json_array_length(F.get_json_object(doc, "$.tags")).alias("n_tags"),
        F.get_json_object(doc, "$.tags[9]").isNull().alias("oob_is_null"),
    )


@query(
    "scalar_variant_typed_paths",
    oracle="""
        SELECT event_id,
               CAST(json_extract_string(props, '$.k') AS BIGINT)  AS k_big,
               CAST(CAST(json_extract_string(props, '$.k') AS BIGINT)
                    AS VARCHAR)                                   AS k_str,
               ROUND(CAST(json_extract_string(props, '$.k') AS DOUBLE)
                     / 7.0, 6)                                    AS k_sevenths,
               json_extract_string(props, '$.absent') IS NULL     AS missing_null,
               CAST(json_extract_string(props, '$.k') AS BIGINT)
                   BETWEEN 0 AND 99                               AS k_in_range
        FROM events
    """,
    tags=("scalar", "variant", "events"),
)
def scalar_variant_typed_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Variant typed-path battery: ONE ``parse_json`` per row feeding
    bigint / string / double ``try_variant_get`` reads of the same path,
    a missing-path → NULL pin, and a typed range predicate — the
    schema-on-read projection shape (aggregation counterpart:
    ``scalar_variant_histogram``). The single parse is the 100 TB move."""
    e = load_table(spark, sf_dir, "events")
    v = F.parse_json("props")
    k_big = F.try_variant_get(v, "$.k", "bigint")
    return e.select(
        "event_id",
        k_big.alias("k_big"),
        F.try_variant_get(v, "$.k", "bigint").cast("string").alias("k_str"),
        F.round(F.try_variant_get(v, "$.k", "double") / 7.0, 6).alias(
            "k_sevenths"
        ),
        F.try_variant_get(v, "$.absent", "string").isNull().alias(
            "missing_null"
        ),
        k_big.between(0, 99).alias("k_in_range"),
    )


@query(
    "array_sorted_order_stats",
    oracle="""
        WITH s AS (
            SELECT vec_id, list_sort(embedding) AS l, len(embedding) AS n
            FROM embeddings
        )
        SELECT vec_id,
               ROUND(CAST(l[(n + 1) // 2] AS DOUBLE), 6)          AS med_lo,
               ROUND(CAST(l[CAST(CEIL(n * 0.75) AS INTEGER)] AS DOUBLE)
                     - CAST(l[CAST(CEIL(n * 0.25) AS INTEGER)] AS DOUBLE), 6)
                                                                  AS iqr,
               CAST(len(list_distinct(l)) AS INTEGER)             AS n_distinct,
               ROUND(CAST(l[n] AS DOUBLE) - CAST(l[1] AS DOUBLE), 6)
                                                                  AS spread,
               ROUND(list_sum(list_transform(l[n - 2:n],
                     x -> CAST(x AS DOUBLE))), 6)                 AS top3_sum
        FROM s
    """,
    tags=("scalar", "array", "embeddings"),
)
def array_sorted_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order statistics straight from ``array_sort`` (lower median, IQR
    by index, spread, top-3 mass) plus ``array_distinct`` cardinality —
    the per-vector robust-profile shape. Sorting INSIDE the row (no
    shuffle, no explode) is the point: 100 TB of vectors profile
    map-side. Complements the fold battery in ``array_fold_reverse_dot``."""
    em = load_table(spark, sf_dir, "embeddings")
    s = em.select(
        "vec_id",
        F.array_sort("embedding").alias("l"),
        F.size("embedding").alias("n"),
    )
    el = lambda idx: F.element_at(F.col("l"), idx).cast("double")  # noqa: E731
    n = F.col("n")
    return s.select(
        "vec_id",
        F.round(el(((n + 1) / 2).cast("int")), 6).alias("med_lo"),
        F.round(
            el(F.ceil(n * 0.75).cast("int")) - el(F.ceil(n * 0.25).cast("int")),
            6,
        ).alias("iqr"),
        F.size(F.array_distinct(F.col("l"))).alias("n_distinct"),
        F.round(el(n) - el(F.lit(1)), 6).alias("spread"),
        F.round(
            F.aggregate(
                F.slice("l", n - 2, F.lit(3)),
                F.lit(0.0),
                lambda acc, x: acc + x.cast("double"),
            ),
            6,
        ).alias("top3_sum"),
    )


@query(
    "scalar_map_zip_merge",
    oracle="""
        SELECT l_orderkey, l_linenumber,
               ROUND(l_quantity * 2.0, 2)                        AS qty_merged,
               ROUND(l_extendedprice, 2)                         AS price_kept,
               CASE WHEN l_quantity > 30.0 THEN ROUND(l_quantity, 2)
                    END                                          AS qty_if_big,
               3                                                 AS n_keys_after
        FROM lineitem
    """,
    tags=("scalar", "map", "lineitem"),
)
def scalar_map_zip_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map MERGE battery: ``map_zip_with`` (override-on-collision),
    ``map_concat`` (new-key add), and ``map_filter`` (predicate prune) —
    the config-overlay shape. Maps are key-order-free, so the oracle
    pins the scalar LOOKUPS the merged maps must produce, per the house
    map-comparison rule (``scalar_map_lookup_pipeline``)."""
    li = load_table(spark, sf_dir, "lineitem")
    m1 = F.map_from_arrays(
        F.array(F.lit("qty"), F.lit("price")),
        F.array(F.col("l_quantity"), F.col("l_extendedprice")),
    )
    m2 = F.map_from_arrays(
        F.array(F.lit("qty")), F.array(F.col("l_quantity") * 2.0)
    )
    merged = F.map_zip_with(m1, m2, lambda k, v1, v2: F.coalesce(v2, v1))
    with_tax = F.map_concat(
        merged,
        F.map_from_arrays(F.array(F.lit("tax")), F.array(F.col("l_tax"))),
    )
    big_only = F.map_filter(m1, lambda k, v: v > 30.0)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.element_at(merged, "qty"), 2).alias("qty_merged"),
        F.round(F.element_at(merged, "price"), 2).alias("price_kept"),
        F.round(F.element_at(big_only, "qty"), 2).alias("qty_if_big"),
        F.size(with_tax).alias("n_keys_after"),
    )


# --- round-7 spare carriers (registered r06, never driver-certified):
# after the r06 window certifies, every scalar family again needs a
# first-time carrier; these are written and tri-SF-gated one round
# ahead so the r07 rotation draws from stock ------------------------


@query(
    "scalar_math_log1p_hypot",
    oracle="""
        SELECT l_orderkey, l_linenumber,
               ROUND(LN(1.0 + l_discount), 6)                  AS disc_log1p,
               ROUND(EXP(l_tax) - 1.0, 6)                      AS tax_expm1,
               ROUND(SQRT(l_quantity * l_quantity
                          + l_discount * 100 * l_discount * 100), 6)
                                                               AS qty_hypot,
               ROUND(POW(l_extendedprice, 0.25), 6)            AS price_4rt,
               ROUND(MOD(l_extendedprice, 7.5), 6)             AS price_fmod,
               CAST(FLOOR(LOG10(l_extendedprice)) AS BIGINT)   AS price_mag
        FROM lineitem
    """,
    tags=("scalar", "math", "lineitem"),
)
def scalar_math_log1p_hypot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Numerically-careful math battery: log1p/expm1 (the
    catastrophic-cancellation-safe forms), hypotenuse, fractional
    power, float modulo, and order-of-magnitude — the feature-scaling
    vocabulary beyond ``scalar_math_exp_log``/``scalar_math_haversine``.
    The oracle states log1p/expm1 as LN(1+x)/EXP(x)-1: at these
    magnitudes (x ≥ 0.0) the naive forms agree with the safe forms to
    well past 6 decimals, which is exactly what ROUND(_, 6) pins."""
    li = load_table(spark, sf_dir, "lineitem")
    q, d, t, p = (F.col(c) for c in
                  ("l_quantity", "l_discount", "l_tax", "l_extendedprice"))
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.log1p(d), 6).alias("disc_log1p"),
        F.round(F.expm1(t), 6).alias("tax_expm1"),
        F.round(F.sqrt(q * q + (d * 100) * (d * 100)), 6).alias("qty_hypot"),
        F.round(F.pow(p, 0.25), 6).alias("price_4rt"),
        F.round(p % 7.5, 6).alias("price_fmod"),
        F.floor(F.log10(p)).cast("bigint").alias("price_mag"),
    )


@query(
    "scalar_json_schema_validity",
    oracle="""
        WITH j AS (
            SELECT event_id,
                   CASE WHEN event_id % 10 = 0
                        THEN substr(props, 1, length(props) - 1)
                        ELSE props END AS doc
            FROM events
        ),
        -- validity = parses AND $.k is integer-typed, matching Spark's
        -- from_json('k BIGINT') null-row semantics exactly (advice r06:
        -- json_valid alone would accept a k-less/non-integer payload)
        v AS (
            SELECT event_id, doc,
                   TRY_CAST(CASE WHEN json_valid(doc)
                                 THEN json_extract_string(doc, '$.k')
                            END AS BIGINT) AS kv
            FROM j
        )
        SELECT event_id,
               kv IS NOT NULL                       AS is_valid,
               kv                                   AS k_parsed,
               CASE WHEN kv IS NULL THEN doc END    AS corrupt_payload
        FROM v
    """,
    tags=("scalar", "json", "events"),
)
def scalar_json_schema_validity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-on-read VALIDITY handling — the quarantine pattern every
    JSON ingest needs: every 10th payload is truncated (malformed),
    ``from_json`` with an explicit schema yields NULL for it (Spark's
    PERMISSIVE mode), valid rows parse typed, and the corrupt payload
    itself is preserved in a quarantine column for replay. The oracle
    mirrors with json_valid + guarded extraction. One parse per row,
    JVM-side; the quarantine column keeps the bad bytes without
    failing the batch — the 100 TB dead-letter discipline."""
    e = load_table(spark, sf_dir, "events")
    doc = F.when(
        F.col("event_id") % 10 == 0,
        F.expr("substr(props, 1, length(props) - 1)"),
    ).otherwise(F.col("props"))
    parsed = F.from_json(doc, "k BIGINT")
    is_valid = parsed.isNotNull() & parsed["k"].isNotNull()
    return e.select(
        "event_id",
        is_valid.alias("is_valid"),
        F.when(is_valid, parsed["k"]).alias("k_parsed"),
        F.when(~is_valid, doc).alias("corrupt_payload"),
    )


@query(
    "scalar_variant_array_paths",
    oracle="""
        WITH v AS (
            SELECT event_id,
                   '[' || json_extract_string(props, '$.k') || ', '
                       || CAST(CAST(json_extract_string(props, '$.k')
                                    AS BIGINT) * 2 AS VARCHAR)
                       || ', {"tag": "' || event_type || '"}]' AS doc
            FROM events
        )
        SELECT event_id,
               CAST(json_extract_string(doc, '$[0]') AS BIGINT) AS first_el,
               CAST(json_extract_string(doc, '$[1]') AS BIGINT) AS second_el,
               json_extract_string(doc, '$[2].tag')             AS nested_tag,
               json_extract_string(doc, '$[5]') IS NULL         AS oob_null
        FROM v
    """,
    tags=("scalar", "variant", "events"),
)
def scalar_variant_array_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Variant ARRAY navigation: parse a JSON array (heterogeneous —
    two numbers and an object) into ONE variant, then read indexed
    paths ``$[i]`` typed, a nested object field behind an index, and
    the out-of-bounds → NULL contract — the semi-structured list shape
    (object paths: ``scalar_variant_typed_paths``). Single parse per
    row feeding four typed reads."""
    e = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k")
    doc = F.concat(
        F.lit("["), k, F.lit(", "),
        (k.cast("bigint") * 2).cast("string"),
        F.lit(', {"tag": "'), F.col("event_type"), F.lit('"}]'),
    )
    v = F.parse_json(doc)
    return e.select(
        "event_id",
        F.try_variant_get(v, "$[0]", "bigint").alias("first_el"),
        F.try_variant_get(v, "$[1]", "bigint").alias("second_el"),
        F.try_variant_get(v, "$[2].tag", "string").alias("nested_tag"),
        F.try_variant_get(v, "$[5]", "string").isNull().alias("oob_null"),
    )


@query(
    "array_indexed_lambda_stats",
    oracle="""
        WITH z AS (
            SELECT vec_id,
                   list_zip(embedding,
                            range(1, len(embedding) + 1)) AS iz
            FROM embeddings
        )
        SELECT vec_id,
               ROUND(list_sum(list_transform(
                   list_filter(iz, p -> (CAST(p[2] AS BIGINT) % 2) = 1),
                   p -> CAST(p[1] AS DOUBLE))), 6)            AS odd_pos_sum,
               ROUND(list_sum(list_transform(iz,
                   p -> CASE WHEN (CAST(p[2] AS BIGINT) % 2) = 1
                             THEN CAST(p[1] AS DOUBLE)
                             ELSE -CAST(p[1] AS DOUBLE) END)), 6)
                                                              AS alt_sum,
               ROUND(list_sum(list_transform(iz,
                   p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS BIGINT))), 6)
                                                              AS idx_weighted
        FROM z
    """,
    tags=("scalar", "array", "embeddings"),
)
def array_indexed_lambda_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INDEX-AWARE higher-order lambdas: Spark's two-argument
    ``filter``/``transform`` lambdas receive the element index
    directly (odd-position sum, alternating sum, index-weighted dot) —
    the positional-feature shape without any explode. The oracle has
    no indexed lambda, so it zips an explicit ``range()`` — two
    independent formulations of the same positional semantics.
    Sequential index-order folds: doubles match bitwise."""
    em = load_table(spark, sf_dir, "embeddings")
    x = F.col("embedding")
    odd_sum = F.aggregate(
        F.filter(x, lambda v, i: (i + 1) % 2 == 1),
        F.lit(0.0),
        lambda a, v: a + v.cast("double"),
    )
    alt = F.aggregate(
        F.transform(
            x,
            lambda v, i: F.when((i + 1) % 2 == 1, v.cast("double")).otherwise(
                -v.cast("double")
            ),
        ),
        F.lit(0.0),
        lambda a, v: a + v,
    )
    idxw = F.aggregate(
        F.transform(x, lambda v, i: v.cast("double") * (i + 1)),
        F.lit(0.0),
        lambda a, v: a + v,
    )
    return em.select(
        "vec_id",
        F.round(odd_sum, 6).alias("odd_pos_sum"),
        F.round(alt, 6).alias("alt_sum"),
        F.round(idxw, 6).alias("idx_weighted"),
    )


@query(
    "scalar_map_entries_arith",
    oracle="""
        SELECT event_id,
               CAST(event_id % 7 AS BIGINT) * 10
                   + CAST(event_id % 3 AS BIGINT)              AS combined,
               CAST(GREATEST(event_id % 7, event_id % 3) AS BIGINT)
                                                               AS max_val,
               (event_id % 7) = (event_id % 3)                 AS keys_agree,
               2                                               AS n_entries
        FROM events
    """,
    tags=("scalar", "map", "events"),
)
def scalar_map_entries_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map ENTRIES arithmetic: build a two-key map, explode it back
    through ``map_entries`` (struct array), and fold the entries with
    an order-stable aggregate (entries preserve insertion order in
    Spark) — the map→array→scalar round trip. The oracle pins the
    scalar results per the house map rule. Complements zip/merge
    (``scalar_map_zip_merge``) and lookup (``scalar_map_lookup_pipeline``)."""
    e = load_table(spark, sf_dir, "events")
    m = F.map_from_arrays(
        F.array(F.lit("a"), F.lit("b")),
        F.array(
            (F.col("event_id") % 7).cast("bigint"),
            (F.col("event_id") % 3).cast("bigint"),
        ),
    )
    ent = F.map_entries(m)  # [{key, value}] in insertion order
    combined = F.aggregate(
        ent, F.lit(0).cast("bigint"), lambda acc, kv: acc * 10 + kv["value"]
    )
    return e.select(
        "event_id",
        combined.alias("combined"),
        F.aggregate(
            ent,
            F.lit(None).cast("bigint"),
            lambda acc, kv: F.greatest(F.coalesce(acc, kv["value"]),
                                       kv["value"]),
        ).alias("max_val"),
        (F.element_at(m, "a") == F.element_at(m, "b")).alias("keys_agree"),
        F.size(ent).alias("n_entries"),
    )


# --- round-8 spare tranche: second-depth scalar carriers ---------------


@query(
    "scalar_math_factorial_bits",
    oracle="""
        SELECT l_orderkey, l_linenumber,
               CAST(factorial(l_linenumber) AS BIGINT)          AS line_fact,
               CAST(bit_count(l_orderkey) AS BIGINT)            AS key_popcount,
               CAST(xor(l_orderkey, l_partkey) AS BIGINT)       AS key_xor,
               CAST(l_orderkey & 255 AS BIGINT)                 AS key_low8,
               CAST((l_linenumber << 4) | 1 AS BIGINT)          AS line_shifted
        FROM lineitem
    """,
    tags=("scalar", "math", "lineitem"),
)
def scalar_math_factorial_bits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Integer math battery: factorial (exact ≤ 7! here), popcount,
    XOR/AND masking, and shift-compose — the hash/partition-key
    arithmetic vocabulary (float battery: ``scalar_math_log1p_hypot``).
    Pure 64-bit integer ops, bit-identical cross-engine by
    construction, whole-stage codegen'd."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.factorial("l_linenumber").cast("bigint").alias("line_fact"),
        F.bit_count("l_orderkey").cast("bigint").alias("key_popcount"),
        F.col("l_orderkey").bitwiseXOR(F.col("l_partkey")).cast("bigint")
        .alias("key_xor"),
        F.col("l_orderkey").bitwiseAND(F.lit(255)).cast("bigint")
        .alias("key_low8"),
        (F.shiftleft("l_linenumber", 4).bitwiseOR(F.lit(1)))
        .cast("bigint")
        .alias("line_shifted"),
    )


@query(
    "scalar_json_struct_array_agg",
    oracle="""
        WITH c AS (
            SELECT o_orderkey,
                   CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
            FROM orders
        ),
        j AS (
            SELECT o_orderkey,
                   '[{"q": ' || CAST(cents // 10 AS VARCHAR)
                   || '}, {"q": ' || CAST(cents // 5 AS VARCHAR)
                   || '}, {"q": ' || CAST(cents - cents // 10 - cents // 5
                                          AS VARCHAR) || '}]' AS doc
            FROM c
        )
        SELECT o_orderkey,
               CAST(json_array_length(doc) AS INTEGER)            AS n_parts,
               CAST(CAST(json_extract(doc, '$[0].q') AS BIGINT)
                    + CAST(json_extract(doc, '$[1].q') AS BIGINT)
                    + CAST(json_extract(doc, '$[2].q') AS BIGINT)
                    AS BIGINT)                                    AS parts_sum,
               CAST(GREATEST(CAST(json_extract(doc, '$[0].q') AS BIGINT),
                             CAST(json_extract(doc, '$[1].q') AS BIGINT),
                             CAST(json_extract(doc, '$[2].q') AS BIGINT))
                    AS BIGINT)                                    AS parts_max
        FROM j
    """,
    tags=("scalar", "json", "orders"),
)
def scalar_json_struct_array_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON array-of-objects DESERIALIZATION: ``from_json`` with an
    ``array<struct<...>>`` schema turns the payload into a typed array
    in ONE parse, then array folds aggregate it — the line-items-in-a-
    blob shape (indexed string paths: ``scalar_json_array_paths``).
    Typed deserialization beats N path extractions at 100 TB: one
    parse, then JVM array ops."""
    o = load_table(spark, sf_dir, "orders")
    # exact integer cents: no half-rounding hazard inside the payload
    cents = F.round(F.col("o_totalprice") * 100).cast("bigint")
    p1 = F.expr(f"CAST(round(o_totalprice * 100) AS BIGINT) DIV 10")
    p2 = F.expr(f"CAST(round(o_totalprice * 100) AS BIGINT) DIV 5")
    p3 = cents - p1 - p2
    doc = F.concat(
        F.lit('[{"q": '), p1.cast("string"),
        F.lit('}, {"q": '), p2.cast("string"),
        F.lit('}, {"q": '), p3.cast("string"), F.lit("}]"),
    )
    arr = F.from_json(doc, "array<struct<q: bigint>>")
    qs = F.transform(arr, lambda s: s["q"])
    return o.select(
        "o_orderkey",
        F.size(arr).alias("n_parts"),
        F.aggregate(qs, F.lit(0).cast("bigint"), lambda a, x: a + x)
        .alias("parts_sum"),
        F.array_max(qs).cast("bigint").alias("parts_max"),
    )


@query(
    "scalar_variant_nested_hops",
    oracle="""
        WITH v AS (
            SELECT event_id,
                   '{"outer": {"mid": {"k": '
                       || json_extract_string(props, '$.k')
                       || ', "tag": "' || event_type || '"}}}' AS doc
            FROM events
        )
        SELECT event_id,
               CAST(json_extract_string(doc, '$.outer.mid.k') AS BIGINT)
                                                              AS deep_k,
               json_extract_string(doc, '$.outer.mid.tag')    AS deep_tag,
               json_extract_string(doc, '$.outer.absent.k') IS NULL
                                                              AS broken_path,
               json_extract(doc, '$.outer.mid') IS NOT NULL   AS mid_exists
        FROM v
    """,
    tags=("scalar", "variant", "events"),
)
def scalar_variant_nested_hops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Variant DEEP-PATH navigation: a three-level nested document
    read by multi-hop paths (``$.outer.mid.k``), with the
    broken-intermediate-path → NULL contract and an existence probe on
    a subtree — the deeply-nested telemetry shape (flat paths:
    ``scalar_variant_typed_paths``; arrays: ``scalar_variant_array_
    paths``). One parse feeds all four reads."""
    e = load_table(spark, sf_dir, "events")
    doc = F.concat(
        F.lit('{"outer": {"mid": {"k": '),
        F.get_json_object("props", "$.k"),
        F.lit(', "tag": "'),
        F.col("event_type"),
        F.lit('"}}}'),
    )
    v = F.parse_json(doc)
    return e.select(
        "event_id",
        F.try_variant_get(v, "$.outer.mid.k", "bigint").alias("deep_k"),
        F.try_variant_get(v, "$.outer.mid.tag", "string").alias("deep_tag"),
        F.try_variant_get(v, "$.outer.absent.k", "bigint")
        .isNull()
        .alias("broken_path"),
        F.try_variant_get(v, "$.outer.mid", "string").isNotNull()
        .alias("mid_exists"),
    )


N_QUARTERS = 4  # embedding quarter-split width = 64 / 4


@query(
    "array_quarter_split_sums",
    oracle="""
        SELECT vec_id,
               ROUND(list_sum(list_transform(embedding[1:16],
                     x -> CAST(x AS DOUBLE))), 6)  AS q1_sum,
               ROUND(list_sum(list_transform(embedding[17:32],
                     x -> CAST(x AS DOUBLE))), 6)  AS q2_sum,
               ROUND(list_sum(list_transform(embedding[33:48],
                     x -> CAST(x AS DOUBLE))), 6)  AS q3_sum,
               ROUND(list_sum(list_transform(embedding[49:64],
                     x -> CAST(x AS DOUBLE))), 6)  AS q4_sum,
               CAST(len(flatten([embedding[1:16], embedding[33:48]]))
                    AS INTEGER)                    AS odd_halves_len
        FROM embeddings
    """,
    tags=("scalar", "array", "embeddings"),
)
def array_quarter_split_sums(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array SPLIT-APPLY: slice a vector into quarters, fold each, and
    ``flatten`` a reassembled subset — the subvector-pooling shape
    behind Matryoshka/PQ-style slicing, kept entirely in-row (ordered
    battery: ``array_sorted_order_stats``; indexed lambdas:
    ``array_indexed_lambda_stats``). Sequential index-order folds:
    doubles match bitwise."""
    em = load_table(spark, sf_dir, "embeddings")

    def qsum(i):
        return F.round(
            F.aggregate(
                F.slice("embedding", 1 + 16 * i, 16),
                F.lit(0.0),
                lambda a, x: a + x.cast("double"),
            ),
            6,
        )

    return em.select(
        "vec_id",
        qsum(0).alias("q1_sum"),
        qsum(1).alias("q2_sum"),
        qsum(2).alias("q3_sum"),
        qsum(3).alias("q4_sum"),
        F.size(
            F.flatten(
                F.array(F.slice("embedding", 1, 16),
                        F.slice("embedding", 33, 16))
            )
        ).alias("odd_halves_len"),
    )


@query(
    "scalar_map_keys_values_fold",
    oracle="""
        SELECT l_orderkey, l_linenumber,
               'price|qty|tax'                                     AS keys_sorted,
               ROUND(l_extendedprice + l_quantity + l_tax, 4)      AS values_sum,
               ROUND(GREATEST(l_extendedprice, l_quantity, l_tax), 4)
                                                                   AS values_max,
               l_quantity > l_tax                                  AS qty_gt_tax
        FROM lineitem
    """,
    tags=("scalar", "map", "lineitem"),
)
def scalar_map_keys_values_fold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map KEYS/VALUES projections: ``map_keys`` sorted-and-joined to a
    canonical string, ``map_values`` folded (sum / max), and a
    two-lookup comparison — the audit-the-property-bag shape. Maps are
    key-order-free, so the SORTED key list and the order-insensitive
    folds are exactly what IS cross-engine comparable (the house map
    rule). Completes the map battery (lookup / zip-merge / entries)."""
    li = load_table(spark, sf_dir, "lineitem")
    m = F.map_from_arrays(
        F.array(F.lit("qty"), F.lit("price"), F.lit("tax")),
        F.array(F.col("l_quantity"), F.col("l_extendedprice"),
                F.col("l_tax")),
    )
    vals = F.map_values(m)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.array_join(F.array_sort(F.map_keys(m)), "|").alias("keys_sorted"),
        F.round(
            F.aggregate(vals, F.lit(0.0), lambda a, x: a + x), 4
        ).alias("values_sum"),
        F.round(F.array_max(vals), 4).alias("values_max"),
        (F.element_at(m, "qty") > F.element_at(m, "tax")).alias("qty_gt_tax"),
    )
