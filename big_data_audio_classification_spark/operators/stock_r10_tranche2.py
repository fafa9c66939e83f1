"""Round-10 pre-stock tranche 2: deepen never-certified spares to
~4 per REQUIRED_FAMILY_TAG so the r11 AND r12 rotations can both run
with zero carrier-building (the r08 pre-stocking pattern).

Same contract as stock_r10.py: idiomatic Spark plan + independently-
formulated DuckDB oracle, identical aliases, exact integers up to one
fixed-order float expression, ordered in-row folds for any cross-row
float reduction, ``+ 0`` guards where a ROUND can land on zero,
DECIMAL(38,0)/HUGEINT accumulators where int64 could wrap at 100 TB,
full gating battery per carrier (tri-SF bit-exact, dtypes, two-config
partition robustness, replay pytest) before window eligibility.

Kernel discipline learned this round (enforced throughout): Arrow
kernels emit FULL-precision floats and the ROUND runs JVM-side
(Python round() is half-even, engine ROUND half-away); engine-side
correlation/variance aggregates are never used — Pearson and friends
come from exact integer moments.
"""

from __future__ import annotations

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from big_data_audio_classification_spark.registry import query
from big_data_audio_classification_spark.sources.catalog import load_table

# ---------------------------------------------------------------------------
# lm: per-source KL divergence from the corpus unigram model
# ---------------------------------------------------------------------------


@query(
    "text_lm_kl_source_divergence",
    oracle="""
        WITH toks AS (
            SELECT source,
                   UNNEST(list_filter(string_split(text, ' '),
                                      t -> t <> '')) AS tok
            FROM documents
        ),
        sc AS (
            SELECT source, tok, CAST(COUNT(*) AS BIGINT) AS scnt
            FROM toks GROUP BY source, tok
        ),
        cc AS (
            SELECT tok, CAST(SUM(scnt) AS BIGINT) AS ccnt FROM sc GROUP BY tok
        ),
        slen AS (
            SELECT source, CAST(SUM(scnt) AS BIGINT) AS slen
            FROM sc GROUP BY source
        ),
        clen AS (SELECT CAST(SUM(ccnt) AS BIGINT) AS clen FROM cc),
        terms AS (
            SELECT sc.source,
                   sc.tok,
                   (CAST(sc.scnt AS DOUBLE) / slen.slen)
                   * LOG2((CAST(sc.scnt AS DOUBLE) / slen.slen)
                          / (CAST(cc.ccnt AS DOUBLE) / clen.clen)) AS t
            FROM sc JOIN cc ON sc.tok = cc.tok
                 JOIN slen ON sc.source = slen.source, clen
        )
        SELECT source,
               CAST(COUNT(*) AS BIGINT) AS n_terms,
               ROUND(list_sum(list(t ORDER BY tok)), 6) + 0 AS kl_bits
        FROM terms GROUP BY source
    """,
    tags=("text", "lm", "documents"),
)
def text_lm_kl_source_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PER-SOURCE KL DIVERGENCE D(P_src ‖ P_corpus) over the full
    vocabulary — the corpus-curation drift score (a source whose
    unigram distribution diverges from the pool is the one to
    re-weight or audit; the source-LEVEL sibling of the per-document
    Moore-Lewis LLR). KL is finite by construction: every source term
    occurs in the corpus (P_corpus > 0 wherever P_src > 0), so no log
    guard is needed — the support-inclusion argument is the
    docstring's contract, not a runtime CASE. Every count is an exact
    integer from two keyed aggregates; each term is ONE fixed-order
    float expression; the cross-term sum folds tok-ordered (the house
    ordered-fold discipline), ``+ 0``-guarded (a single-source corpus
    gives exactly 0). 100 TB: two token-keyed map-side-combinable
    aggregates + a broadcast of |sources| and 1-row totals; terms
    shuffle once keyed by source."""
    d = load_table(spark, sf_dir, "documents")
    from big_data_audio_classification_spark.operators.dedup import tokens_col

    toks = d.select(
        "source", F.explode(tokens_col(F.col("text"))).alias("tok")
    )
    sc = toks.groupBy("source", "tok").agg(
        F.count(F.lit(1)).cast("bigint").alias("scnt")
    )
    cc = sc.groupBy("tok").agg(F.sum("scnt").cast("bigint").alias("ccnt"))
    slen = sc.groupBy("source").agg(
        F.sum("scnt").cast("bigint").alias("slen")
    )
    clen = cc.agg(F.sum("ccnt").cast("bigint").alias("clen"))
    p_s = F.col("scnt").cast("double") / F.col("slen")
    p_c = F.col("ccnt").cast("double") / F.col("clen")
    terms = (
        sc.join(cc, "tok")
        .join(F.broadcast(slen), "source")
        .crossJoin(F.broadcast(clen))
        .select("source", "tok", (p_s * F.log2(p_s / p_c)).alias("t"))
    )
    ordered = F.transform(
        F.array_sort(F.collect_list(F.struct("tok", "t"))), lambda s: s["t"]
    )
    return terms.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_terms"),
        F.round(
            F.aggregate(ordered, F.lit(0.0), lambda a, x: a + x), 6
        ).alias("kl_bits"),
    )


# ---------------------------------------------------------------------------
# lm: per-document surprisal profile under the corpus unigram model
# ---------------------------------------------------------------------------


@query(
    "text_lm_token_surprisal_profile",
    oracle="""
        WITH toks AS (
            SELECT doc_id,
                   UNNEST(list_filter(string_split(text, ' '),
                                      t -> t <> '')) AS tok,
                   CAST(generate_subscripts(
                        list_filter(string_split(text, ' '), t -> t <> ''), 1)
                        AS BIGINT) AS pos
            FROM documents
        ),
        cf AS (
            SELECT tok, CAST(COUNT(*) AS BIGINT) AS cnt FROM toks GROUP BY tok
        ),
        clen AS (SELECT CAST(SUM(cnt) AS BIGINT) AS clen FROM cf),
        sur AS (
            SELECT t.doc_id, t.pos,
                   -LOG2(CAST(cf.cnt AS DOUBLE) / clen.clen) AS s
            FROM toks t JOIN cf ON t.tok = cf.tok, clen
        )
        SELECT doc_id,
               CAST(COUNT(*) AS BIGINT) AS dl,
               ROUND(list_sum(list(s ORDER BY pos)) / COUNT(*), 6)
                   AS mean_surprisal,
               ROUND(MAX(s), 6) AS max_surprisal
        FROM sur GROUP BY doc_id
    """,
    tags=("text", "lm", "documents"),
)
def text_lm_token_surprisal_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PER-DOCUMENT SURPRISAL profile under the corpus unigram LM —
    mean and peak −log2 P(token), the per-token complexity signal
    quality filters threshold on (high mean surprisal = rare-token
    soup ≈ noise or novelty; the peak flags single out-of-place
    tokens). Unlike ``text_lm_heldout_perplexity`` there is no fold
    split — the corpus scores itself, so every token's probability is
    strictly positive (its own occurrence counts), and no smoothing or
    guard is needed: the maximum-likelihood base case of the LM
    evaluation family. Counts exact; each surprisal is one float
    expression; the per-doc mean folds POSITION-ordered (the
    heldout-perplexity discipline — an engine-order sum over equal
    tokens would tie-break differently), max is order-free. 100 TB:
    one token-keyed aggregate + a broadcast probe join; (doc, pos,
    float) shuffles once keyed by doc."""
    d = load_table(spark, sf_dir, "documents")
    from big_data_audio_classification_spark.operators.dedup import tokens_col

    toks = d.select(
        "doc_id", F.posexplode(tokens_col(F.col("text"))).alias("pos0", "tok")
    ).select("doc_id", (F.col("pos0") + 1).cast("bigint").alias("pos"), "tok")
    cf = toks.groupBy("tok").agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    clen = cf.agg(F.sum("cnt").cast("bigint").alias("clen"))
    s = -F.log2(F.col("cnt").cast("double") / F.col("clen"))
    sur = (
        toks.join(F.broadcast(cf), "tok")
        .crossJoin(F.broadcast(clen))
        .select("doc_id", "pos", s.alias("s"))
    )
    ordered = F.transform(
        F.array_sort(F.collect_list(F.struct("pos", "s"))), lambda x: x["s"]
    )
    return sur.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("dl"),
        F.round(
            F.aggregate(ordered, F.lit(0.0), lambda a, x: a + x)
            / F.count(F.lit(1)),
            6,
        ).alias("mean_surprisal"),
        F.round(F.max("s"), 6).alias("max_surprisal"),
    )


# ---------------------------------------------------------------------------
# mapInPandas: hierarchical chunk-sum tree (Merkle-style integrity)
# ---------------------------------------------------------------------------

CHUNK_BYTES = 64


@query(
    "mm_payload_chunk_sum_tree",
    oracle=f"""
        WITH ch AS (
            SELECT doc_id,
                   CAST(ascii(UNNEST(string_split_regex(text, '')))
                        AS BIGINT) AS b,
                   CAST(generate_subscripts(
                        string_split_regex(text, ''), 1) AS BIGINT) AS i
            FROM documents
        ),
        leaf AS (
            SELECT doc_id, (i - 1) // {CHUNK_BYTES} AS chunk,
                   CAST(SUM(b) AS BIGINT) AS csum
            FROM ch GROUP BY doc_id, (i - 1) // {CHUNK_BYTES}
        ),
        root AS (
            SELECT doc_id,
                   CAST(COUNT(*) AS BIGINT) AS n_chunks,
                   CAST(SUM(csum) AS BIGINT) AS root_sum,
                   CAST(SUM(csum * (chunk + 1)) AS BIGINT) AS weighted_sum,
                   CAST(MAX(csum) AS BIGINT) AS max_chunk_sum
            FROM leaf GROUP BY doc_id
        )
        SELECT d.doc_id,
               COALESCE(r.n_chunks, 0)     AS n_chunks,
               COALESCE(r.root_sum, 0)     AS root_sum,
               COALESCE(r.weighted_sum, 0) AS weighted_sum,
               COALESCE(r.max_chunk_sum, 0) AS max_chunk_sum
        FROM documents d LEFT JOIN root r ON d.doc_id = r.doc_id
    """,
    tags=("multimodal", "mapInPandas", "documents"),
)
def mm_payload_chunk_sum_tree(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HIERARCHICAL CHUNK-SUM TREE via ``mapInPandas`` — the
    Merkle-style two-level integrity layout every chunked blob store
    keeps (per-chunk digests + a root combining them; here the digest
    is the byte sum so the oracle can restate it relationally): the
    kernel pads-and-reshapes the byte array into 64-byte chunks
    (numpy reshape + row sums — one vectorized pass), emits the chunk
    count, root sum, POSITION-WEIGHTED root (Σ csum·(chunk+1) — the
    component that catches chunk REORDERING, which a plain root sum
    cannot), and the max chunk sum (the hot-chunk pointer). The
    oracle rebuilds the tree by integer-division bucketing over
    generate_subscripts positions. All exact integers; the weighted
    root grows ~max_csum·C²/2 with C chunks, so int64 holds to
    C ≈ 3×10⁷ chunks ≈ a 2 GiB single payload (the per-doc bound —
    documented; past it, escalate the weighted term to
    DECIMAL(38,0)/HUGEINT per the house idiom). Empty payloads pin
    zeros via the LEFT JOIN. One Arrow row per document."""
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
                    pad = (-b.size) % CHUNK_BYTES
                    m = np.pad(b, (0, pad)).astype(np.int64).reshape(
                        -1, CHUNK_BYTES
                    )
                    csums = m.sum(axis=1)
                    n = int(csums.size)
                    rows.append(
                        (
                            int(doc_id),
                            n,
                            int(csums.sum()),
                            int((csums * (np.arange(n) + 1)).sum()),
                            int(csums.max()),
                        )
                    )
                else:
                    rows.append((int(doc_id), 0, 0, 0, 0))
            if rows:
                yield pd.DataFrame(
                    rows,
                    columns=[
                        "doc_id",
                        "n_chunks",
                        "root_sum",
                        "weighted_sum",
                        "max_chunk_sum",
                    ],
                )

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return d.mapInPandas(
        batches,
        "doc_id long, n_chunks long, root_sum long, weighted_sum long,"
        " max_chunk_sum long",
    )


# ---------------------------------------------------------------------------
# mapInPandas: Luhn mod-10 checksum over the payload's digit characters
# ---------------------------------------------------------------------------


@query(
    "mm_payload_luhn_mod10",
    oracle="""
        WITH ch AS (
            SELECT doc_id,
                   ascii(UNNEST(string_split_regex(text, ''))) - 48 AS dgt,
                   CAST(generate_subscripts(
                        string_split_regex(text, ''), 1) AS BIGINT) AS i
            FROM documents
        ),
        digits AS (
            SELECT doc_id, dgt,
                   CAST(ROW_NUMBER() OVER (PARTITION BY doc_id
                        ORDER BY i DESC) AS BIGINT) AS rpos
            FROM ch WHERE dgt BETWEEN 0 AND 9
        ),
        s AS (
            SELECT doc_id,
                   CAST(COUNT(*) AS BIGINT) AS n_digits,
                   CAST(SUM(CASE WHEN rpos % 2 = 0
                            THEN CASE WHEN dgt * 2 > 9
                                      THEN dgt * 2 - 9 ELSE dgt * 2 END
                            ELSE dgt END) AS BIGINT) AS luhn_sum
            FROM digits GROUP BY doc_id
        )
        SELECT d.doc_id,
               COALESCE(s.n_digits, 0) AS n_digits,
               COALESCE(s.luhn_sum, 0) AS luhn_sum,
               COALESCE(s.luhn_sum % 10 = 0, FALSE) AS luhn_valid
        FROM documents d LEFT JOIN s ON d.doc_id = s.doc_id
    """,
    tags=("multimodal", "mapInPandas", "documents"),
)
def mm_payload_luhn_mod10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LUHN MOD-10 checksum over the payload's DIGIT characters — the
    checksum every PII-scrubbing pipeline computes while hunting
    card-number-shaped substrings (a 16-digit run that Luhn-validates
    is the redaction trigger): digits are doubled at every second
    position FROM THE RIGHT (the from-the-right convention is the
    whole trick — the kernel reverses the digit array, the oracle
    ranks ROW_NUMBER ... ORDER BY i DESC; two independent
    formulations of the same parity), doubled digits above 9 fold
    back by −9. Pure integers; digit-less payloads pin (0, 0, FALSE)
    via the LEFT JOIN — COALESCE on the BOOLEAN too, the easy one to
    forget. One Arrow row per document; at 100 TB the kernel rides
    the payload scan."""
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
                d = b[(b >= 48) & (b <= 57)].astype(np.int64) - 48
                if d.size:
                    r = d[::-1].copy()
                    dbl = r * np.where(np.arange(r.size) % 2 == 1, 2, 1)
                    dbl = np.where(dbl > 9, dbl - 9, dbl)
                    total = int(dbl.sum())
                    rows.append(
                        (int(doc_id), int(d.size), total, total % 10 == 0)
                    )
                else:
                    rows.append((int(doc_id), 0, 0, False))
            if rows:
                yield pd.DataFrame(
                    rows,
                    columns=["doc_id", "n_digits", "luhn_sum", "luhn_valid"],
                )

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return d.mapInPandas(
        batches,
        "doc_id long, n_digits long, luhn_sum long, luhn_valid boolean",
    )


# ---------------------------------------------------------------------------
# setop: three-way INTERSECT audience core
# ---------------------------------------------------------------------------


@query(
    "set_intersect_three_way",
    oracle="""
        WITH c AS (SELECT DISTINCT user_id FROM events
                   WHERE event_type = 'click'),
        v AS (SELECT DISTINCT user_id FROM events
              WHERE event_type = 'view'),
        p AS (SELECT DISTINCT user_id FROM events
              WHERE event_type = 'purchase'),
        core AS (SELECT * FROM c INTERSECT SELECT * FROM v
                 INTERSECT SELECT * FROM p),
        cv AS (SELECT * FROM c INTERSECT SELECT * FROM v)
        SELECT CAST((SELECT COUNT(*) FROM c) AS BIGINT)    AS n_click,
               CAST((SELECT COUNT(*) FROM v) AS BIGINT)    AS n_view,
               CAST((SELECT COUNT(*) FROM p) AS BIGINT)    AS n_purchase,
               CAST((SELECT COUNT(*) FROM cv) AS BIGINT)   AS n_click_view,
               CAST((SELECT COUNT(*) FROM core) AS BIGINT) AS n_core,
               CAST((SELECT COUNT(*) FROM core) AS BIGINT) * 1000000
               // (SELECT COUNT(*) FROM c)                  AS core_ppm_of_click
    """,
    tags=("relational", "setop", "events"),
)
def set_intersect_three_way(spark: SparkSession, sf_dir: str) -> DataFrame:
    """THREE-WAY INTERSECT audience core: users who click AND view AND
    purchase — chained set intersection (the n-way generalization the
    two-way census family stops short of), plus the two-way
    click∩view step so the funnel of set sizes is visible in one row.
    The ppm share is EXACT integer arithmetic (×1e6 then integer
    division — no float division anywhere in this operator; the
    truncation convention is pinned by both engines' integer DIV).
    Spark chains ``.intersect`` (distinct semantics, compiled to
    left-semi hash joins after aggregation); DuckDB runs native
    INTERSECT. 100 TB: each leg is one distinct on user_id
    (map-side combinable); intersections shuffle deduplicated keys
    only."""
    e = load_table(spark, sf_dir, "events")

    def users(t: str) -> DataFrame:
        return e.filter(F.col("event_type") == t).select("user_id").distinct()

    c, v, p = users("click"), users("view"), users("purchase")
    cv = c.intersect(v)
    core = cv.intersect(p)
    row = (
        c.agg(F.count(F.lit(1)).cast("bigint").alias("n_click"))
        .crossJoin(v.agg(F.count(F.lit(1)).cast("bigint").alias("n_view")))
        .crossJoin(
            p.agg(F.count(F.lit(1)).cast("bigint").alias("n_purchase"))
        )
        .crossJoin(
            cv.agg(F.count(F.lit(1)).cast("bigint").alias("n_click_view"))
        )
        .crossJoin(core.agg(F.count(F.lit(1)).cast("bigint").alias("n_core")))
    )
    return row.select(
        "*",
        F.expr("n_core * 1000000 DIV n_click").alias("core_ppm_of_click"),
    )


# ---------------------------------------------------------------------------
# grouping: GROUPING SETS with weighted averages from exact sums
# ---------------------------------------------------------------------------


@query(
    "agg_groupingsets_weighted_avg",
    oracle="""
        SELECT grouping(l_returnflag, l_linestatus) AS gid,
               COALESCE(l_returnflag, 'ALL') AS returnflag,
               COALESCE(l_linestatus, 'ALL') AS linestatus,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty,
               ROUND(CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                               * CAST(l_quantity AS BIGINT)) AS DOUBLE)
                     / SUM(CAST(l_quantity AS BIGINT)) / 100.0, 6)
                   AS qty_weighted_price
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
                                (l_returnflag), ())
    """,
    tags=("aggregate", "grouping", "lineitem"),
)
def agg_groupingsets_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS with QUANTITY-WEIGHTED average price — the margin
    report where the aggregate is a ratio of two sums, which is
    exactly when naive margin math goes wrong (an average of
    subgroup averages is NOT the margin average; computing the ratio
    from re-aggregated EXACT sums at every grouping set is). Three
    sets — (flag, status), (flag), grand total — in ONE pass;
    weighted numerator Σ price_cents·qty stays int64 (≤ 5e7·50 per
    row ≈ 2.5e9 — ~4e9 rows of headroom per cell; the DECIMAL
    escalation point is documented, the r07 class); the ratio is one
    float division per output row. grouping-bitmask column pins the
    set identity cross-engine. 100 TB: one map-side-combinable
    aggregate, |sets|·|groups| output rows."""
    li = load_table(spark, sf_dir, "lineitem")
    qty = F.col("l_quantity").cast("bigint")
    cents = F.round(F.col("l_extendedprice") * 100).cast("bigint")
    base = li.select(
        F.col("l_returnflag").alias("returnflag_raw"),
        F.col("l_linestatus").alias("linestatus_raw"),
        qty.alias("qty1"),
        (cents * qty).alias("wnum"),
    )
    g = base.groupingSets(
        [["returnflag_raw", "linestatus_raw"], ["returnflag_raw"], []],
        "returnflag_raw",
        "linestatus_raw",
    ).agg(
        F.grouping_id().alias("gid"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("qty1").cast("bigint").alias("qty"),
        F.sum("wnum").cast("bigint").alias("wnum"),
    )
    return g.select(
        F.col("gid"),
        F.coalesce("returnflag_raw", F.lit("ALL")).alias("returnflag"),
        F.coalesce("linestatus_raw", F.lit("ALL")).alias("linestatus"),
        "n",
        "qty",
        F.round(
            F.col("wnum").cast("double") / F.col("qty") / 100.0, 6
        ).alias("qty_weighted_price"),
    )


# ---------------------------------------------------------------------------
# sketch: linear counting (bitmap distinct estimator)
# ---------------------------------------------------------------------------

LC_BUCKETS = 1024


@query(
    "sketch_linear_counting",
    oracle=f"""
        WITH h AS (
            SELECT event_type,
                   CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))
                        AS BIGINT) % {LC_BUCKETS} AS bucket
            FROM events
        ),
        occ AS (
            SELECT event_type,
                   CAST(COUNT(DISTINCT bucket) AS BIGINT) AS occupied
            FROM h GROUP BY event_type
        ),
        ex AS (
            SELECT event_type,
                   CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_distinct
            FROM events GROUP BY event_type
        )
        SELECT ex.event_type, ex.exact_distinct, occ.occupied,
               CASE WHEN occ.occupied < {LC_BUCKETS}
                    THEN CAST(ROUND(-{LC_BUCKETS}.0 * LN(
                         ({LC_BUCKETS}.0 - occ.occupied) / {LC_BUCKETS}.0))
                         AS BIGINT)
                    ELSE NULL END AS lc_estimate
        FROM ex JOIN occ ON ex.event_type = occ.event_type
    """,
    tags=("sketch", "aggregate", "events"),
)
def sketch_linear_counting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LINEAR COUNTING distinct estimator (Whang et al. 1990) — the
    bitmap sketch that BEATS HyperLogLog at small cardinalities (the
    regime per-group rollups mostly live in, which is why engines keep
    both): hash each user into m=1024 buckets (the portable md5
    scheme), count occupied buckets, estimate n̂ = −m·ln(V/m) with V
    the EMPTY fraction. Saturation (every bucket hit) degrades to
    NULL on both engines — the estimator's honest failure mode, not
    an Inf. The estimate is ONE float expression from two exact
    integers, ROUNDed to a bigint (half-away on both engines — never
    Python). Exact distinct rides alongside so the driver hash pins
    estimator AND ground truth. 100 TB: the bitmap is a COUNT
    DISTINCT over m≤1024 bucket ids per group — partial-aggregatable,
    256 bytes of state where HLL spends 1.5 KB."""
    e = load_table(spark, sf_dir, "events")
    hv = F.conv(
        F.substring(F.md5(F.col("user_id").cast("string")), 1, 8), 16, 10
    ).cast("bigint")
    h = e.select("event_type", (hv % LC_BUCKETS).alias("bucket"), "user_id")
    occ = h.groupBy("event_type").agg(
        F.countDistinct("bucket").cast("bigint").alias("occupied")
    )
    ex = h.groupBy("event_type").agg(
        F.countDistinct("user_id").cast("bigint").alias("exact_distinct")
    )
    m = float(LC_BUCKETS)
    est = F.when(
        F.col("occupied") < LC_BUCKETS,
        F.round(-m * F.log((m - F.col("occupied")) / m)).cast("bigint"),
    )
    return (
        ex.join(occ, "event_type")
        .select("event_type", "exact_distinct", "occupied", est.alias("lc_estimate"))
    )


# ---------------------------------------------------------------------------
# string: transform battery over the head tokens
# ---------------------------------------------------------------------------

STR_TOPK = 20


@query(
    "scalar_string_transform_battery",
    oracle=f"""
        WITH toks AS (
            SELECT UNNEST(list_filter(string_split(text, ' '),
                                      t -> t <> '')) AS tok
            FROM documents
        ),
        top AS (
            SELECT tok, CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, tok)
                        AS BIGINT) AS rk
            FROM toks GROUP BY tok QUALIFY rk <= {STR_TOPK}
        )
        SELECT rk, tok, n,
               upper(tok)                   AS up,
               reverse(tok)                 AS rev,
               translate(tok, 'aeiou', '*****') AS vowels_masked,
               replace(tok, 'e', 'ee')      AS e_doubled,
               lpad(tok, 12, '.')           AS padded,
               CAST(length(tok) AS BIGINT)  AS len
        FROM top
    """,
    tags=("scalar", "string", "topk", "documents"),
)
def scalar_string_transform_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STRING TRANSFORM battery over the top-20 corpus tokens —
    upper / reverse / translate / replace / lpad / length evaluated on
    identical inputs by both engines (the string sibling of the libm
    batteries: any locale-sensitive or off-by-one divergence in the
    kernel implementations shows up as a hash flip on real head
    tokens, where it matters). The probe set is the deterministic
    frequency top-k with full tiebreak, so the battery rides a
    realistic distribution rather than literals. 100 TB: one
    token-keyed count + a 20-row top-k; the transforms run on 20
    rows."""
    d = load_table(spark, sf_dir, "documents")
    from big_data_audio_classification_spark.operators.dedup import tokens_col

    toks = d.select(F.explode(tokens_col(F.col("text"))).alias("tok"))
    cnt = toks.groupBy("tok").agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    rk = F.row_number().over(Window.orderBy(F.col("n").desc(), "tok"))
    top = cnt.select(rk.cast("bigint").alias("rk"), "tok", "n").filter(
        F.col("rk") <= STR_TOPK
    )
    return top.select(
        "rk",
        "tok",
        "n",
        F.upper("tok").alias("up"),
        F.reverse("tok").alias("rev"),
        F.translate("tok", "aeiou", "*****").alias("vowels_masked"),
        F.regexp_replace("tok", "e", "ee").alias("e_doubled"),
        F.lpad("tok", 12, ".").alias("padded"),
        F.length("tok").cast("bigint").alias("len"),
    )


# ---------------------------------------------------------------------------
# math: bitwise battery over order keys
# ---------------------------------------------------------------------------


@query(
    "scalar_math_gray_code_rollup",
    oracle="""
        SELECT o_orderkey % 16 AS bucket,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(o_orderkey & 255) AS BIGINT)            AS sum_and,
               CAST(SUM(o_orderkey | 15) AS BIGINT)             AS sum_or,
               CAST(SUM(xor(o_orderkey, o_orderkey >> 1))
                    AS BIGINT)                                   AS sum_gray,
               CAST(SUM(o_orderkey << 2) AS BIGINT)             AS sum_shl2,
               CAST(SUM(bit_count(o_orderkey)) AS BIGINT)       AS sum_pop
        FROM orders GROUP BY o_orderkey % 16
    """,
    tags=("scalar", "math", "bitwise", "orders"),
)
def scalar_math_gray_code_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GRAY-CODE BITWISE ROLLUP — AND/OR/XOR/shift/popcount AGGREGATED
    per key bucket (the per-ROW battery is `scalar_math_bitwise_battery`;
    this pins the same operators under map-side-combined SUMs, where a
    single-row divergence hides in a checksum instead of a row), with
    the GRAY CODE k ⊕ (k>>1) as the composite
    probe (any off-by-one in shift or xor semantics breaks every
    bucket). All pure int64 arithmetic: Spark's &, |, ^, shiftleft,
    bit_count against DuckDB's operators and xor()/bit_count()
    functions — same two's-complement semantics, pinned by hash. The
    shifted sum stays in int64 (orderkeys ≤ ~6e6 at sf0.1; ×4 ≈ 2.4e7
    per row, ~4e11 rows of headroom per bucket — the DECIMAL
    escalation point is documented). 100 TB: one map-side-combinable
    aggregate, 16 output rows."""
    o = load_table(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    return o.groupBy((k % 16).alias("bucket")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(k.bitwiseAND(F.lit(255))).cast("bigint").alias("sum_and"),
        F.sum(k.bitwiseOR(F.lit(15))).cast("bigint").alias("sum_or"),
        F.sum(k.bitwiseXOR(F.shiftright(k, 1))).cast("bigint").alias("sum_gray"),
        F.sum(F.shiftleft(k, 2)).cast("bigint").alias("sum_shl2"),
        F.sum(F.bit_count(k)).cast("bigint").alias("sum_pop"),
    )


# ---------------------------------------------------------------------------
# json: object-keys census over constructed + stored JSON
# ---------------------------------------------------------------------------


@query(
    "scalar_json_keys_census",
    oracle="""
        WITH x AS (
            SELECT event_type,
                   json_keys(props) AS pkeys,
                   json_keys(to_json(struct_pack(u := user_id,
                                                 t := event_type,
                                                 v := value))) AS ckeys
            FROM events
        )
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(len(pkeys)) AS BIGINT) AS total_prop_keys,
               MIN(array_to_string(pkeys, ',')) AS prop_keys_sig,
               MIN(array_to_string(ckeys, ',')) AS built_keys_sig
        FROM x GROUP BY event_type
    """,
    tags=("scalar", "json", "events"),
)
def scalar_json_keys_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON OBJECT-KEYS census over BOTH stored and engine-constructed
    documents: `json_object_keys` on the props column (schema
    discovery — the first thing a lake pipeline does to a stringly
    column) and on a struct serialized by the engine itself
    (to_json(struct(...)) — pinning that BOTH engines emit the
    struct's declared field order, which is what makes downstream
    key-order-sensitive parsers portable). Key lists serialize
    through the house array_join-before-compare rule (the r03
    unhashable-cell class). 100 TB: map-only key extraction + one
    event_type-keyed aggregate."""
    e = load_table(spark, sf_dir, "events")
    x = e.select(
        "event_type",
        F.json_object_keys("props").alias("pkeys"),
        F.json_object_keys(
            F.to_json(
                F.struct(
                    F.col("user_id").alias("u"),
                    F.col("event_type").alias("t"),
                    F.col("value").alias("v"),
                )
            )
        ).alias("ckeys"),
    )
    return x.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.size("pkeys")).cast("bigint").alias("total_prop_keys"),
        F.min(F.array_join("pkeys", ",")).alias("prop_keys_sig"),
        F.min(F.array_join("ckeys", ",")).alias("built_keys_sig"),
    )


# ---------------------------------------------------------------------------
# array + map: integer index/lookup battery
# ---------------------------------------------------------------------------


@query(
    "scalar_array_map_index_battery",
    oracle="""
        WITH x AS (
            SELECT vec_id % 10 AS bucket,
                   range(1, vec_id % 10 + 4) AS seq
            FROM embeddings
        ),
        y AS (
            SELECT bucket,
                   CAST(len(seq) AS BIGINT) AS seq_len,
                   CAST(seq[1] AS BIGINT) AS first_el,
                   CAST(seq[len(seq)] AS BIGINT) AS last_el,
                   CAST(list_position(seq, 3) AS BIGINT) AS pos_of_3,
                   CAST(list_sum(list_transform(seq, v -> v * v))
                        AS BIGINT) AS sum_sq,
                   CAST(list_sum(seq[2:]) AS BIGINT) AS tail_sum
            FROM x
        )
        SELECT bucket,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(MIN(seq_len) AS BIGINT) AS seq_len,
               CAST(MIN(first_el) AS BIGINT) AS first_el,
               CAST(MIN(last_el) AS BIGINT) AS last_el,
               CAST(MIN(COALESCE(pos_of_3, 0)) AS BIGINT) AS pos_of_3,
               CAST(SUM(sum_sq) AS BIGINT) AS total_sum_sq,
               CAST(SUM(tail_sum) AS BIGINT) AS total_tail_sum
        FROM y GROUP BY bucket
    """,
    tags=("scalar", "array", "map", "embeddings"),
)
def scalar_array_map_index_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ARRAY INDEX/SLICE/LOOKUP battery on engine-CONSTRUCTED integer
    sequences (seq = 1..(vec_id%10)+3 — deterministic per row, so the
    battery pins 1-BASED indexing, inclusive-slice, position-of, and
    higher-order transform semantics across engines on exact
    integers; Spark additionally routes the squared-sum through a
    REAL MapType — map_from_arrays + map_values — proving the
    map-column path produces the same integers the oracle computes
    array-only). Missing lookups (3 ∉ short seqs) pin the
    position-zero convention via COALESCE on both sides. 100 TB:
    map-only construction + one 10-bucket aggregate."""
    em = load_table(spark, sf_dir, "embeddings")
    seq = F.sequence(F.lit(1), F.col("vec_id") % 10 + 3)
    x = em.select((F.col("vec_id") % 10).alias("bucket"), seq.alias("seq"))
    m = F.map_from_arrays(
        F.col("seq"), F.transform(F.col("seq"), lambda v: v * v)
    )
    y = x.select(
        "bucket",
        F.size("seq").cast("bigint").alias("seq_len"),
        F.element_at("seq", 1).cast("bigint").alias("first_el"),
        F.element_at("seq", -1).cast("bigint").alias("last_el"),
        F.array_position("seq", 3).cast("bigint").alias("pos_of_3"),
        F.aggregate(
            F.map_values(m), F.lit(0).cast("bigint"), lambda a, v: a + v
        ).alias("sum_sq"),
        F.aggregate(
            F.slice("seq", 2, F.size("seq") - 1),
            F.lit(0).cast("bigint"),
            lambda a, v: a + v,
        ).alias("tail_sum"),
    )
    return y.groupBy("bucket").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.min("seq_len").cast("bigint").alias("seq_len"),
        F.min("first_el").cast("bigint").alias("first_el"),
        F.min("last_el").cast("bigint").alias("last_el"),
        F.min(F.coalesce("pos_of_3", F.lit(0))).cast("bigint").alias("pos_of_3"),
        F.sum("sum_sq").cast("bigint").alias("total_sum_sq"),
        F.sum("tail_sum").cast("bigint").alias("total_tail_sum"),
    )


# ---------------------------------------------------------------------------
# minhash: per-permutation signature stability profile
# ---------------------------------------------------------------------------


def _sig_stability_sql() -> str:
    from big_data_audio_classification_spark.operators.dedup import (
        MINHASH_K,
        _minhash_sql,
    )

    unions = "\n            UNION ALL\n            ".join(
        f"SELECT doc_id, {j} AS slot, m{j} AS mh FROM sig"
        for j in range(MINHASH_K)
    )
    return f"""
        WITH sig AS ({_minhash_sql()}),
        slots AS (
            {unions}
        )
        SELECT CAST(slot AS BIGINT) AS slot,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(COUNT(DISTINCT mh) AS BIGINT) AS n_distinct,
               CAST(MIN(mh) AS BIGINT) AS min_hash,
               ROUND(1.0 - CAST(COUNT(DISTINCT mh) AS DOUBLE) / COUNT(*), 6)
                   + 0 AS collision_rate
        FROM slots GROUP BY slot
    """


@query(
    "dedup_lsh_signature_stability",
    oracle=_sig_stability_sql(),
    tags=("dedup", "minhash", "lsh", "report", "documents"),
)
def dedup_lsh_signature_stability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PER-PERMUTATION MinHash SLOT profile — the signature-quality
    audit below the band level (bands aggregate 4 slots each; a
    single DEGENERATE permutation — low distinct count, high
    collision rate — poisons every band it feeds, and this view
    localizes which): per slot j, distinct minhash values, the
    minimum (a constant-leaning slot shows a repeated min), and the
    collision rate 1 − distinct/docs, ``+ 0``-guarded (an
    all-distinct slot rounds to exactly 0). The unpivot runs through
    ``stack`` on Spark vs a UNION ALL spine on DuckDB — independent
    reshapes of the same signature table. 100 TB: rides the
    signature aggregate; the profile is k×|docs| rows shuffled once,
    16 rows out."""
    from big_data_audio_classification_spark.operators.dedup import (
        MINHASH_K,
        minhash_signature,
    )

    d = load_table(spark, sf_dir, "documents")
    sig = minhash_signature(d, "doc_id", "text")
    stack_expr = ", ".join(f"{j}L, m{j}" for j in range(MINHASH_K))
    slots = sig.select(
        "doc_id",
        F.expr(f"stack({MINHASH_K}, {stack_expr}) AS (slot, mh)"),
    ).select("slot", "mh")
    return slots.groupBy(F.col("slot").cast("bigint").alias("slot")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.countDistinct("mh").cast("bigint").alias("n_distinct"),
        F.min("mh").cast("bigint").alias("min_hash"),
        F.round(
            1.0 - F.countDistinct("mh").cast("double") / F.count(F.lit(1)), 6
        ).alias("collision_rate"),
    )


# ---------------------------------------------------------------------------
# simhash: hi/lo halfword popcount correlation
# ---------------------------------------------------------------------------


def _halfword_corr_sql() -> str:
    from big_data_audio_classification_spark.operators.dedup import (
        _simhash_sql,
    )

    return f"""
        WITH fp AS ({_simhash_sql()}),
        xy AS (
            -- DuckDB bit_count returns TINYINT: 10*13 overflows INT8,
            -- so widen before any product (r10 find)
            SELECT CAST(bit_count(simhash >> 16) AS BIGINT) AS x,
                   CAST(bit_count(simhash & 65535) AS BIGINT) AS y
            FROM fp
        ),
        m AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(x) AS BIGINT) AS sx,
                   CAST(SUM(y) AS BIGINT) AS sy,
                   CAST(SUM(x * y) AS BIGINT) AS sxy,
                   CAST(SUM(x * x) AS BIGINT) AS sxx,
                   CAST(SUM(y * y) AS BIGINT) AS syy
            FROM xy
        )
        SELECT n, sx, sy,
               CASE WHEN CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx > 0
                     AND CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy > 0
                    THEN ROUND((CAST(n AS DOUBLE) * sxy
                                - CAST(sx AS DOUBLE) * sy)
                               / (SQRT(CAST(n AS DOUBLE) * sxx
                                       - CAST(sx AS DOUBLE) * sx)
                                  * SQRT(CAST(n AS DOUBLE) * syy
                                         - CAST(sy AS DOUBLE) * sy)),
                               6) + 0
                    ELSE NULL END AS pearson_r
        FROM m
    """


@query(
    "dedup_simhash_halfword_correlation",
    oracle=_halfword_corr_sql(),
    tags=("dedup", "simhash", "correlation", "documents"),
)
def dedup_simhash_halfword_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HI/LO HALFWORD POPCOUNT CORRELATION of the simhash population —
    the independence check banded lookup schemes silently assume (a
    prefix schedule that probes the top 16 bits treats them as
    independent of the bottom 16; correlated halves mean correlated
    bucket misses): Pearson r between bit_count(hi16) and
    bit_count(lo16) computed ENTIRELY from exact integer moments (n,
    Σx, Σy, Σxy, Σx², Σy² — popcounts are ≤16, every moment exact in
    int64 to ~3e16 docs) with ONE fixed-order float expression at the
    end — never an engine-side corr() aggregate (cross-row float
    accumulation, the r06 class). The n·Σx² variance PRODUCTS are
    computed in DOUBLE (per-moment casts) — in int64 they wrap at
    ~1.9e8 docs, and asymmetrically (Spark wraps silently, DuckDB
    raises); identical double arithmetic is deterministic
    cross-engine at any n. Degenerate variance degrades to
    NULL on both engines; ``+ 0`` guards the uncorrelated-rounds-to-
    zero case. 100 TB: one map-side-combinable moment aggregate; one
    output row."""
    from big_data_audio_classification_spark.operators.dedup import (
        dedup_simhash as _simhash_query,
    )

    fp = _simhash_query(spark, sf_dir)
    xy = fp.select(
        F.bit_count(F.shiftright("simhash", 16)).alias("x"),
        F.bit_count(F.col("simhash").bitwiseAND(F.lit(65535))).alias("y"),
    )
    m = xy.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("bigint").alias("syy"),
    )
    nd = F.col("n").cast("double")
    sxd = F.col("sx").cast("double")
    syd = F.col("sy").cast("double")
    vx = nd * F.col("sxx") - sxd * F.col("sx")
    vy = nd * F.col("syy") - syd * F.col("sy")
    num = nd * F.col("sxy") - sxd * F.col("sy")
    return m.select(
        "n",
        "sx",
        "sy",
        F.when(
            (vx > 0) & (vy > 0),
            F.round(num / (F.sqrt(vx) * F.sqrt(vy)), 6),
        ).alias("pearson_r"),
    )
