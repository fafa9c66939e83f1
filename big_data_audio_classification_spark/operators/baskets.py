"""Market-basket / co-occurrence mining over order line items:
support-filtered item-pair counts (the relational a-priori step) and
MLlib FPGrowth frequent itemsets + association rules.

Scale notes:
* Pair generation self-joins lineitem ON the order key only — the
  quadratic term is bounded by basket size (TPC-H baskets are ~4-7
  lines), so the blow-up factor is a small constant, not corpus-sized;
  the support filter then collapses the output. This is the same
  bounded-block discipline as the dedup exemplars.
* FPGrowth compresses baskets into a prefix tree per partition and
  mines locally before a single merge — MLlib's distributed PFP
  (parallel FP-growth) partitioning by item suffix. Rows-only check:
  itemset mining order is engine-internal; the SQL sibling pins the
  pair-level ground truth and the pytest cross-checks the two.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from big_data_audio_classification_spark.registry import query
from big_data_audio_classification_spark.sources.catalog import load_table

BASKET_MIN_SUPPORT = 5  # absolute pair-count threshold


@query(
    "basket_item_pairs",
    oracle=f"""
        WITH b AS (
            SELECT DISTINCT l_orderkey, l_partkey % 100 AS item
            FROM lineitem
        )
        SELECT a.item AS item_a, b.item AS item_b,
               CAST(COUNT(*) AS BIGINT) AS support
        FROM b a JOIN b b ON a.l_orderkey = b.l_orderkey
                         AND a.item < b.item
        GROUP BY a.item, b.item
        HAVING COUNT(*) >= {BASKET_MIN_SUPPORT}
        ORDER BY support DESC, item_a, item_b
        LIMIT 50
    """,
    tags=("baskets", "co-occurrence", "lineitem"),
)
def basket_item_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequent item PAIRS by co-occurrence within an order (the
    a-priori 2-itemset step): one self-join keyed on the order, pair
    ordered a < b so each unordered pair counts once, support filter.
    Items are bucketed part keys (part % 100) so pair supports clear
    the threshold at test scale — the shape is identical for raw keys.

    Scale: the join is ONE order-keyed equi-join; within-basket pair
    fan-out is basket²  (a small constant), and map-side combine
    collapses the pair counts before the shuffle."""
    li = load_table(spark, sf_dir, "lineitem")
    b = li.select(
        "l_orderkey", (F.col("l_partkey") % 100).alias("item")
    ).distinct()
    a2, b2 = b.alias("a"), b.alias("b")
    return (
        a2.join(
            b2,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.item") < F.col("b.item")),
        )
        .groupBy(F.col("a.item").alias("item_a"), F.col("b.item").alias("item_b"))
        .agg(F.count("*").cast("bigint").alias("support"))
        .filter(F.col("support") >= BASKET_MIN_SUPPORT)
        .orderBy(F.desc("support"), "item_a", "item_b")
        .limit(50)
    )


FP_MIN_SUPPORT = 0.004
FP_MIN_CONFIDENCE = 0.3


@query(
    "ml_fpgrowth_baskets",
    oracle=f"""
        WITH b AS (
            SELECT DISTINCT l_orderkey, l_partkey % 100 AS item FROM lineitem
        ),
        mc AS (SELECT CEIL({FP_MIN_SUPPORT} * COUNT(DISTINCT l_orderkey)) AS m
               FROM b)
        SELECT CAST(item AS VARCHAR) AS itemset,
               CAST(COUNT(*) AS BIGINT) AS freq
        FROM b GROUP BY item HAVING COUNT(*) >= (SELECT m FROM mc)
        UNION ALL
        SELECT CAST(a.item AS VARCHAR) || ',' || CAST(b2.item AS VARCHAR),
               CAST(COUNT(*) AS BIGINT)
        FROM b a JOIN b b2 ON a.l_orderkey = b2.l_orderkey AND a.item < b2.item
        GROUP BY a.item, b2.item HAVING COUNT(*) >= (SELECT m FROM mc)
        UNION ALL
        SELECT CAST(a.item AS VARCHAR) || ',' || CAST(b2.item AS VARCHAR)
                   || ',' || CAST(c.item AS VARCHAR),
               CAST(COUNT(*) AS BIGINT)
        FROM b a JOIN b b2 ON a.l_orderkey = b2.l_orderkey AND a.item < b2.item
               JOIN b c  ON a.l_orderkey = c.l_orderkey  AND b2.item < c.item
        GROUP BY a.item, b2.item, c.item HAVING COUNT(*) >= (SELECT m FROM mc)
    """,
    tags=("baskets", "fpgrowth", "mllib", "lineitem"),
)
def ml_fpgrowth_baskets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MLlib FPGrowth frequent itemsets over order baskets (items =
    bucketed part keys), minSupport 0.4%. Frequent-itemset mining is an
    EXACT computation (unlike the seeded MLlib fits), so FPGrowth's
    output is engine-independent and SQL-oracle-checkable: the oracle
    enumerates itemsets a-priori-style (size 1/2/3 self-joins with the
    same ceil(minSupport·n) count floor MLlib applies). Converted from
    rows-only in round 5; output capped at size ≤ 3, which is PROVEN
    exhaustive on this data (the size-3 enumeration returns zero rows
    at every SF — uniform items keep triple co-occurrence far below
    threshold; a size-4 itemset would require a frequent size-3 subset).

    Scale: MLlib PFP partitions the conditional trees by item suffix —
    mining is local per partition after one group-by-basket shuffle;
    the oracle's pair/triple joins are the bounded-block basket²
    discipline (baskets are ~4-7 items), not corpus-quadratic.

    Docstring parity note: the reference has no basket mining; this is
    part of the mandated beyond-reference analytics surface."""
    from pyspark.ml.fpm import FPGrowth

    li = load_table(spark, sf_dir, "lineitem")
    baskets = (
        li.select("l_orderkey", (F.col("l_partkey") % 100).alias("item"))
        .distinct()
        .groupBy("l_orderkey")
        .agg(F.collect_set("item").alias("items"))
    )
    fp = FPGrowth(
        itemsCol="items",
        minSupport=FP_MIN_SUPPORT,
        minConfidence=FP_MIN_CONFIDENCE,
    )
    model = fp.fit(baskets)
    return model.freqItemsets.filter(F.size("items") <= 3).select(
        F.array_join(F.array_sort("items"), ",").alias("itemset"),
        F.col("freq").cast("bigint").alias("freq"),
    )


RULE_MIN_CONF = 0.01  # floor just under the ~4% baseline basket
#                       rate: the lift RANKING carries the signal (items
#                       here are uniform, so confidences sit near baseline
#                       at every SF; a 0.3 bar would return zero rules)
RULE_TOPN = 40        # highest-lift rules reported


@query(
    "baskets_association_rules",
    oracle=f"""
        WITH b AS (
            SELECT DISTINCT l_orderkey, l_partkey % 100 AS item
            FROM lineitem
        ),
        nb AS (SELECT CAST(COUNT(DISTINCT l_orderkey) AS DOUBLE) AS n FROM b),
        items AS (SELECT item, COUNT(*) AS supp FROM b GROUP BY item),
        pairs AS (
            SELECT a.item AS ia, b2.item AS ib, COUNT(*) AS supp_ab
            FROM b a JOIN b b2 ON a.l_orderkey = b2.l_orderkey
                              AND a.item < b2.item
            GROUP BY a.item, b2.item
            HAVING COUNT(*) >= {BASKET_MIN_SUPPORT}
        ),
        rules AS (
            SELECT ia AS antecedent, ib AS consequent, supp_ab,
                   supp_ab / x.supp AS confidence,
                   supp_ab / x.supp * n / y.supp AS lift
            FROM pairs JOIN items x ON x.item = ia
                       JOIN items y ON y.item = ib
                       CROSS JOIN nb
            UNION ALL
            SELECT ib, ia, supp_ab,
                   supp_ab / y.supp,
                   supp_ab / y.supp * n / x.supp
            FROM pairs JOIN items x ON x.item = ia
                       JOIN items y ON y.item = ib
                       CROSS JOIN nb
        )
        SELECT antecedent, consequent,
               CAST(supp_ab AS BIGINT)  AS pair_support,
               ROUND(confidence, 6)     AS confidence,
               ROUND(lift, 6)           AS lift
        FROM rules
        WHERE confidence >= {RULE_MIN_CONF}
        ORDER BY lift DESC, antecedent, consequent
        LIMIT {RULE_TOPN}
    """,
    tags=("baskets", "association-rules", "lineitem"),
)
def baskets_association_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Association rules from frequent pairs: confidence(a→b) =
    supp(ab)/supp(a) and lift = confidence · N/supp(b), both rule
    directions emitted from each unordered pair, thresholded and
    ranked by lift — the relational spelling of what
    ``ml_fpgrowth_baskets`` gets from MLlib, fully oracle-checkable.

    Plan: the pair join is the same single order-keyed equi-join as
    ``basket_item_pairs``; item supports and the basket count are
    dimension-sized aggregates broadcast onto the pair table; the
    final ranking is TakeOrderedAndProject (top-N, no global sort).
    Lift ties are broken by (antecedent, consequent) so the cut is
    deterministic cross-engine."""
    li = load_table(spark, sf_dir, "lineitem")
    b = li.select(
        "l_orderkey", (F.col("l_partkey") % 100).alias("item")
    ).distinct()
    nb = b.agg(
        F.countDistinct("l_orderkey").cast("double").alias("n")
    )
    items = b.groupBy("item").agg(F.count("*").alias("supp"))
    a2, b2 = b.alias("a"), b.alias("b2")
    pairs = (
        a2.join(
            b2,
            (F.col("a.l_orderkey") == F.col("b2.l_orderkey"))
            & (F.col("a.item") < F.col("b2.item")),
        )
        .groupBy(F.col("a.item").alias("ia"), F.col("b2.item").alias("ib"))
        .agg(F.count("*").alias("supp_ab"))
        .filter(F.col("supp_ab") >= BASKET_MIN_SUPPORT)
    )
    joined = (
        pairs.join(
            F.broadcast(items.select(F.col("item").alias("ia"),
                                     F.col("supp").alias("supp_a"))), "ia"
        )
        .join(
            F.broadcast(items.select(F.col("item").alias("ib"),
                                     F.col("supp").alias("supp_b"))), "ib"
        )
        .crossJoin(F.broadcast(nb))
    )
    fwd = joined.select(
        F.col("ia").alias("antecedent"),
        F.col("ib").alias("consequent"),
        "supp_ab",
        (F.col("supp_ab") / F.col("supp_a")).alias("confidence"),
        (F.col("supp_ab") / F.col("supp_a") * F.col("n") / F.col("supp_b"))
        .alias("lift"),
    )
    rev = joined.select(
        F.col("ib").alias("antecedent"),
        F.col("ia").alias("consequent"),
        "supp_ab",
        (F.col("supp_ab") / F.col("supp_b")).alias("confidence"),
        (F.col("supp_ab") / F.col("supp_b") * F.col("n") / F.col("supp_a"))
        .alias("lift"),
    )
    return (
        fwd.unionByName(rev)
        .filter(F.col("confidence") >= RULE_MIN_CONF)
        .select(
            "antecedent", "consequent",
            F.col("supp_ab").cast("bigint").alias("pair_support"),
            F.round("confidence", 6).alias("confidence"),
            F.round("lift", 6).alias("lift"),
        )
        .orderBy(F.desc("lift"), "antecedent", "consequent")
        .limit(RULE_TOPN)
    )


PSPAN_PREFIX_LEN = 5  # sequence = each user's first N events
PSPAN_MIN_SUPPORT = 0.2  # fraction of sequences a pattern must appear in


@query(
    "ml_prefixspan_sequences",
    oracle=f"""
        WITH seq AS (
            SELECT user_id, event_type, pos FROM (
                SELECT user_id, event_type,
                       ROW_NUMBER() OVER (
                           PARTITION BY user_id ORDER BY ts, event_id
                       ) AS pos
                FROM events
            ) WHERE pos <= {PSPAN_PREFIX_LEN}
        ),
        n AS (SELECT COUNT(DISTINCT user_id) AS n_users FROM seq),
        p1 AS (
            SELECT event_type AS pattern,
                   COUNT(DISTINCT user_id) AS freq
            FROM seq GROUP BY 1
        ),
        p2 AS (
            SELECT a.event_type || '>' || b.event_type AS pattern,
                   COUNT(DISTINCT a.user_id) AS freq
            FROM seq a JOIN seq b
              ON a.user_id = b.user_id AND a.pos < b.pos
            GROUP BY 1
        )
        SELECT pattern, freq
        FROM (SELECT * FROM p1 UNION ALL SELECT * FROM p2)
        CROSS JOIN n
        WHERE freq >= CEIL({PSPAN_MIN_SUPPORT} * n_users)
    """,
    tags=("baskets", "ml", "sequence-mining", "events"),
)
def ml_prefixspan_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequent sequential patterns (MLlib PrefixSpan) over each user's
    first-5 event prefix, patterns up to length 2 at 20% minimum
    support — the "what do new users do, in what order" mining query.

    The Spark side runs MLlib's distributed PrefixSpan (local pattern
    growth per projected-database partition); the DuckDB oracle states
    the DEFINITION — a pattern's frequency is the number of sequences
    containing it as a (not necessarily contiguous) subsequence, via a
    position self-join bounded by the 5-event prefix. Engine mining
    algorithm vs relational ground truth is exactly the differential
    this gate exists for. Patterns are rendered 'a>b' so the contract
    schema is plain (string, bigint)."""
    from pyspark.ml.fpm import PrefixSpan
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pref = (
        e.select("user_id", "event_type", F.row_number().over(w).alias("pos"))
        .where(F.col("pos") <= PSPAN_PREFIX_LEN)
    )
    seqs = (
        pref.groupBy("user_id")
        .agg(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("pos", "event_type"))
                ),
                lambda s: F.array(s["event_type"]),
            ).alias("sequence")
        )
        .select("sequence")
    )
    ps = PrefixSpan(
        minSupport=PSPAN_MIN_SUPPORT,
        maxPatternLength=2,
        maxLocalProjDBSize=32_000_000,
    )
    pats = ps.findFrequentSequentialPatterns(seqs)
    return pats.select(
        F.array_join(F.flatten("sequence"), ">").alias("pattern"),
        F.col("freq"),
    )
