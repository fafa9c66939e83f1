"""Geospatial operators: cell-bucketed distance joins (the spatial
join that scales) and the 2-D Pareto-frontier (skyline) query.

The reference has no geo surface; these extend SURVEY §2.B's scale
patterns with the two classic "looks quadratic, isn't" shapes:

* Distance join — naive form is a cross join with a haversine filter.
  The 100 TB form buckets both sides into fixed-size grid cells,
  explodes one side to its 3×3 neighbor cells, EQUI-joins on cell id,
  and only then verifies the exact distance — candidate count is
  bounded by local density, never |L|×|R|. Same bucket-join shape as
  the MinHash-LSH dedup path (dedup.py) and the IVF ANN path
  (similarity.py), instantiated for the spatial metric.
* Skyline — naive form tests each point against all others (O(n²)
  NOT EXISTS). The engine form reduces to DISTINCT (price, size)
  pairs, sorts by (price asc, size desc), and keeps rows whose size
  strictly exceeds the running max of all previous sizes — one window
  over the distinct-pair grid (bounded by |price-grid|×|size-grid|,
  tiny relative to rows). The DuckDB oracle states the O(n²)
  NOT-EXISTS definition, so the gate proves the single-window
  formulation equals the textbook dominance semantics.

Coordinates are synthesized deterministically from integer keys with
pure BIGINT modular arithmetic (`(key * A) % M / 10⁴`), restated
identically in the oracle — no engine hash functions, no float
low-bit divergence in the inputs.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from big_data_audio_classification_spark.registry import query
from big_data_audio_classification_spark.sources.catalog import load_table

# 10°×10° synthetic city box; 0.5° cells (~55 km) so a 3×3 neighborhood
# fully covers the 50 km search radius at these latitudes.
GEO_LAT_MULT = 2654435761
GEO_LON_MULT = 1588635695
GEO_MOD = 100000  # (key*mult) % MOD / 1e4 -> [0, 10) degrees
GEO_CELL_DEG = 0.5
GEO_RADIUS_KM = 50.0
GEO_TOP = 20
EARTH_R_KM = 6371.0


def _coords(key: str, lat_alias: str, lon_alias: str):
    lat = (
        (F.col(key) * F.lit(GEO_LAT_MULT)) % F.lit(GEO_MOD)
    ).cast("double") / 1e4
    lon = (
        (F.col(key) * F.lit(GEO_LON_MULT)) % F.lit(GEO_MOD)
    ).cast("double") / 1e4
    return lat.alias(lat_alias), lon.alias(lon_alias)


def _haversine_km(lat1, lon1, lat2, lon2):
    dlat = F.radians(lat2 - lat1)
    dlon = F.radians(lon2 - lon1)
    a = (
        F.pow(F.sin(dlat / 2), 2)
        + F.cos(F.radians(lat1)) * F.cos(F.radians(lat2)) * F.pow(F.sin(dlon / 2), 2)
    )
    return 2 * EARTH_R_KM * F.asin(F.sqrt(a))


@query(
    "geo_cell_distance_join",
    oracle=f"""
        WITH c AS (
            SELECT c_custkey,
                   CAST((c_custkey * {GEO_LAT_MULT}) % {GEO_MOD} AS DOUBLE)/1e4 AS clat,
                   CAST((c_custkey * {GEO_LON_MULT}) % {GEO_MOD} AS DOUBLE)/1e4 AS clon
            FROM customer
        ),
        s AS (
            SELECT s_suppkey,
                   CAST((s_suppkey * {GEO_LAT_MULT}) % {GEO_MOD} AS DOUBLE)/1e4 AS slat,
                   CAST((s_suppkey * {GEO_LON_MULT}) % {GEO_MOD} AS DOUBLE)/1e4 AS slon
            FROM supplier
        )
        SELECT c_custkey, s_suppkey,
               ROUND(2 * {EARTH_R_KM} * ASIN(SQRT(
                   POWER(SIN(RADIANS(slat - clat)/2), 2)
                   + COS(RADIANS(clat)) * COS(RADIANS(slat))
                     * POWER(SIN(RADIANS(slon - clon)/2), 2))), 3) AS dist_km
        FROM c CROSS JOIN s
        WHERE ROUND(2 * {EARTH_R_KM} * ASIN(SQRT(
                   POWER(SIN(RADIANS(slat - clat)/2), 2)
                   + COS(RADIANS(clat)) * COS(RADIANS(slat))
                     * POWER(SIN(RADIANS(slon - clon)/2), 2))), 3)
              <= {GEO_RADIUS_KM}
        ORDER BY dist_km, c_custkey, s_suppkey
        LIMIT {GEO_TOP}
    """,
    tags=("geo", "join", "scale-pattern", "customer", "supplier"),
)
def geo_cell_distance_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """20 nearest customer-supplier pairs within 50 km, via the
    cell-bucketed spatial join: grid both sides at 0.5°, explode the
    supplier side to its 3×3 neighbor cells, EQUI-join on cell id,
    haversine-verify, TakeOrderedAndProject the top 20.

    The oracle states the naive cross-join + filter definition; the
    engine never builds it — candidates are bounded by cell density
    (the LSH-bucket shape, spatial edition). Coordinates derive from
    keys by exact integer arithmetic so both engines see identical
    doubles; the distance is rounded to 3 decimals before both the
    radius cut and the ordering so libm ulp drift can't flip either."""
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", *_coords("c_custkey", "clat", "clon")
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", *_coords("s_suppkey", "slat", "slon")
    )
    cell = lambda lat, lon: (  # noqa: E731
        F.floor(lat / GEO_CELL_DEG) * 4096 + F.floor(lon / GEO_CELL_DEG)
    )
    cust_c = cust.withColumn("cell", cell(F.col("clat"), F.col("clon")))
    # supplier side explodes to its 9 neighbor cells; customers join
    # their own cell only — each true pair meets in exactly one cell.
    offsets = F.array(
        *[
            F.struct(F.lit(dr).alias("dr"), F.lit(dc).alias("dc"))
            for dr in (-1, 0, 1)
            for dc in (-1, 0, 1)
        ]
    )
    supp_c = (
        supp.withColumn("o", F.explode(offsets))
        .withColumn(
            "cell",
            (F.floor(F.col("slat") / GEO_CELL_DEG) + F.col("o.dr")) * 4096
            + (F.floor(F.col("slon") / GEO_CELL_DEG) + F.col("o.dc")),
        )
        .drop("o")
    )
    dist = F.round(
        _haversine_km(F.col("clat"), F.col("clon"), F.col("slat"), F.col("slon")),
        3,
    )
    return (
        cust_c.join(supp_c, "cell")
        .select("c_custkey", "s_suppkey", dist.alias("dist_km"))
        .where(F.col("dist_km") <= GEO_RADIUS_KM)
        .orderBy("dist_km", "c_custkey", "s_suppkey")
        .limit(GEO_TOP)
    )


@query(
    "analytics_skyline_pareto",
    oracle="""
        SELECT p.p_partkey, p.p_retailprice, p.p_size
        FROM part p
        WHERE NOT EXISTS (
            SELECT 1 FROM part q
            WHERE q.p_retailprice <= p.p_retailprice
              AND q.p_size >= p.p_size
              AND (q.p_retailprice < p.p_retailprice OR q.p_size > p.p_size)
        )
    """,
    tags=("analytics", "skyline", "window", "part"),
)
def analytics_skyline_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto frontier of parts (minimize price, maximize size): a part
    is on the frontier iff no other part is ≤ price AND ≥ size with one
    strict.

    Engine form: skyline over DISTINCT (price, size) pairs — sorted by
    (price asc, size desc), a pair survives iff its size strictly
    exceeds the running max over all prior pairs (any prior pair in
    that order dominates otherwise) — then a semi-join brings back the
    part rows. One window over the distinct grid + one equi-join; the
    oracle states the O(n²) NOT-EXISTS dominance definition."""
    p = load_table(spark, sf_dir, "part")
    grid = p.select("p_retailprice", "p_size").distinct()
    w = (
        Window.orderBy(F.col("p_retailprice").asc(), F.col("p_size").desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    frontier = (
        grid.withColumn("prev_max", F.max("p_size").over(w))
        .where(
            F.col("prev_max").isNull() | (F.col("p_size") > F.col("prev_max"))
        )
        .select("p_retailprice", "p_size")
    )
    return p.join(
        frontier, ["p_retailprice", "p_size"], "left_semi"
    ).select("p_partkey", "p_retailprice", "p_size")


GEO_KNN_CUST_CAP = 500  # output grain: customers with c_custkey < cap


@query(
    "geo_nearest_supplier",
    oracle=f"""
        WITH c AS (
            SELECT c_custkey,
                   CAST((c_custkey * {GEO_LAT_MULT}) % {GEO_MOD} AS DOUBLE)/1e4 AS clat,
                   CAST((c_custkey * {GEO_LON_MULT}) % {GEO_MOD} AS DOUBLE)/1e4 AS clon
            FROM customer WHERE c_custkey < {GEO_KNN_CUST_CAP}
        ),
        s AS (
            SELECT s_suppkey,
                   CAST((s_suppkey * {GEO_LAT_MULT}) % {GEO_MOD} AS DOUBLE)/1e4 AS slat,
                   CAST((s_suppkey * {GEO_LON_MULT}) % {GEO_MOD} AS DOUBLE)/1e4 AS slon
            FROM supplier
        ),
        pairs AS (
            SELECT c_custkey, s_suppkey,
                   ROUND(2 * {EARTH_R_KM} * ASIN(SQRT(
                       POWER(SIN(RADIANS(slat - clat)/2), 2)
                       + COS(RADIANS(clat)) * COS(RADIANS(slat))
                         * POWER(SIN(RADIANS(slon - clon)/2), 2))), 3) AS dist_km
            FROM c CROSS JOIN s
        )
        SELECT c_custkey, s_suppkey AS nearest_suppkey, dist_km
        FROM pairs
        WHERE dist_km <= {GEO_RADIUS_KM}
        QUALIFY ROW_NUMBER() OVER (
            PARTITION BY c_custkey ORDER BY dist_km, s_suppkey) = 1
    """,
    tags=("geo", "join", "knn", "window", "customer", "supplier"),
)
def geo_nearest_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-entity spatial nearest neighbor: each (capped) customer's
    closest supplier within 50 km, via the same cell + 3×3-neighbor
    EQUI-join as the pair query, then a per-customer rank-1 window
    (rounded distance, supplier-key tiebreak — cross-engine
    deterministic). Customers with no supplier inside the covered
    radius drop out, which the radius predicate makes explicit.

    The oracle states the naive cross-join + QUALIFY; the engine's
    candidate set is bounded by local density. The per-customer window
    partitions on c_custkey — no global sort anywhere."""
    cust = (
        load_table(spark, sf_dir, "customer")
        .where(F.col("c_custkey") < GEO_KNN_CUST_CAP)
        .select("c_custkey", *_coords("c_custkey", "clat", "clon"))
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", *_coords("s_suppkey", "slat", "slon")
    )
    cust_c = cust.withColumn(
        "cell",
        F.floor(F.col("clat") / GEO_CELL_DEG) * 4096
        + F.floor(F.col("clon") / GEO_CELL_DEG),
    )
    offsets = F.array(
        *[
            F.struct(F.lit(dr).alias("dr"), F.lit(dc).alias("dc"))
            for dr in (-1, 0, 1)
            for dc in (-1, 0, 1)
        ]
    )
    supp_c = (
        supp.withColumn("o", F.explode(offsets))
        .withColumn(
            "cell",
            (F.floor(F.col("slat") / GEO_CELL_DEG) + F.col("o.dr")) * 4096
            + (F.floor(F.col("slon") / GEO_CELL_DEG) + F.col("o.dc")),
        )
        .drop("o")
    )
    dist = F.round(
        _haversine_km(F.col("clat"), F.col("clon"), F.col("slat"), F.col("slon")),
        3,
    )
    w = Window.partitionBy("c_custkey").orderBy("dist_km", "s_suppkey")
    return (
        cust_c.join(supp_c, "cell")
        .select("c_custkey", "s_suppkey", dist.alias("dist_km"))
        .where(F.col("dist_km") <= GEO_RADIUS_KM)
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "c_custkey",
            F.col("s_suppkey").alias("nearest_suppkey"),
            "dist_km",
        )
    )
