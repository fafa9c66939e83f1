"""Count-min sketch: mergeable point-frequency estimates with the
one-sided CMS error guarantee, verified against exact counts.

Rounds out the mergeable-sketch family (HLL distinct counts,
approx-percentile, approx_top_k heavy hitters, bitmap exact distinct —
aggregates.py) with the remaining classic: point frequency queries
under a fixed memory budget. At 100 TB the sketch is the only way to
answer "how often does key X occur" for ad-hoc X without a full
key-shuffle — CMS partials are (depth×width) integer grids that merge
by cellwise addition, so they compose under any rollup exactly like
the HLL partials.

Spark's `count_min_sketch` aggregate emits the sketch in the
documented stream-lib serialized layout (version, totalCount, depth,
width, the pairwise-independent hash coefficients, then the counter
grid — big-endian longs). The probe decodes ONE collected blob on the
driver (the bounded scalar-attach pattern, cf. the 2×2 confusion
matrix in audio.py) and re-evaluates the stream-lib hash
``((a·x) mod (2³¹−1)) mod width`` with Java 64-bit wrap semantics —
public arithmetic, no JVM round-trip.

Oracle contract (same as the HLL/approx_top_k rows): exact counts are
hash-checked value-for-value; the sketch estimate is asserted to land
inside its guarantee (exact ≤ estimate ≤ exact + ⌈ε·N⌉, which holds
with probability ≥ δ per probe) as a boolean DuckDB states as TRUE.
"""

from __future__ import annotations

import math
import struct

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from big_data_audio_classification_spark.registry import query
from big_data_audio_classification_spark.sources.catalog import load_table

CMS_EPS = 0.001
CMS_CONF = 0.99
CMS_SEED = 42
CMS_DOMAIN = 512  # probe key space: o_custkey % CMS_DOMAIN
CMS_PROBES = 8  # probe keys 0..7

_MERSENNE31 = (1 << 31) - 1
_I64_MASK = (1 << 64) - 1


def _j64(x: int) -> int:
    """Wrap a Python int to Java signed-64 semantics."""
    x &= _I64_MASK
    return x - (1 << 64) if x >= (1 << 63) else x


def decode_cms(blob: bytes) -> tuple[int, list[int], list[tuple[int, ...]]]:
    """Parse the stream-lib CMS layout: version, totalCount, depth,
    width, hashA[depth], table[depth][width] (big-endian)."""
    off = 0
    (version,) = struct.unpack_from(">i", blob, off)
    off += 4
    if version != 1:
        raise ValueError(f"unsupported CMS serialization version {version}")
    (total,) = struct.unpack_from(">q", blob, off)
    off += 8
    (depth,) = struct.unpack_from(">i", blob, off)
    off += 4
    (width,) = struct.unpack_from(">i", blob, off)
    off += 4
    hash_a = list(struct.unpack_from(f">{depth}q", blob, off))
    off += 8 * depth
    table = []
    for _ in range(depth):
        table.append(struct.unpack_from(f">{width}q", blob, off))
        off += 8 * width
    if off != len(blob):
        raise ValueError(f"CMS blob length mismatch: {off} != {len(blob)}")
    return total, hash_a, table


def cms_estimate_long(
    item: int, hash_a: list[int], table: list[tuple[int, ...]]
) -> int:
    """stream-lib point query for a long item: min over rows of the
    cell at ``((a·x) mod 2³¹−1) mod width`` (Mersenne-mod via the
    add-high-32 trick, Java arithmetic)."""
    width = len(table[0])
    est = None
    for i, a in enumerate(hash_a):
        h = _j64(a * item)
        h = _j64(h + (h >> 32))
        h &= _MERSENNE31
        c = table[i][int(h) % width]
        est = c if est is None else min(est, c)
    return int(est)


@query(
    "agg_count_min_sketch",
    oracle=f"""
        SELECT o_custkey % {CMS_DOMAIN} AS k,
               CAST(COUNT(*) AS BIGINT) AS exact_cnt,
               TRUE AS within_bounds
        FROM orders
        WHERE o_custkey % {CMS_DOMAIN} < {CMS_PROBES}
        GROUP BY o_custkey % {CMS_DOMAIN}
    """,
    tags=("aggregate", "sketch", "cms", "orders"),
)
def agg_count_min_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-frequency estimates from ONE count_min_sketch aggregate
    over all orders, probed for 8 keys and checked against the exact
    counts: exact ≤ estimate ≤ exact + ⌈ε·N⌉.

    The sketch is a single O(depth×width) scalar aggregate (map-side
    partials merge cellwise — the mergeable path); exact counts come
    from a filtered groupBy over the 8 probe keys only. The decode
    touches one collected blob (bounded driver work)."""
    o = load_table(spark, sf_dir, "orders")
    keyed = o.select((F.col("o_custkey") % CMS_DOMAIN).alias("k"))
    blob_row = keyed.agg(
        F.expr(
            f"count_min_sketch(k, {CMS_EPS}d, {CMS_CONF}d, {CMS_SEED})"
        ).alias("sketch")
    ).collect()[0]
    total, hash_a, table = decode_cms(bytes(blob_row["sketch"]))
    slack = math.ceil(CMS_EPS * total)
    est_rows = [
        (k, cms_estimate_long(k, hash_a, table)) for k in range(CMS_PROBES)
    ]
    est_df = spark.createDataFrame(est_rows, "k bigint, cms_est bigint")
    exact = (
        keyed.where(F.col("k") < CMS_PROBES)
        .groupBy("k")
        .agg(F.count("*").alias("exact_cnt"))
    )
    return exact.join(F.broadcast(est_df), "k").select(
        "k",
        "exact_cnt",
        (
            (F.col("cms_est") >= F.col("exact_cnt"))
            & (F.col("cms_est") <= F.col("exact_cnt") + F.lit(slack))
        ).alias("within_bounds"),
    )


def merge_cms_blobs(blobs: list[bytes]) -> tuple[int, list[int], list[tuple[int, ...]]]:
    """Cellwise-add CMS grids built with the same eps/conf/seed — the
    mergeability that makes the sketch a streaming/rollup partial.
    Refuses blobs whose geometry or hash family differ (different
    seeds don't share a hash family; adding their grids is
    meaningless)."""
    total, hash_a, table = decode_cms(blobs[0])
    grid = [list(row) for row in table]
    for b in blobs[1:]:
        t2, h2, tab2 = decode_cms(b)
        if h2 != hash_a or len(tab2) != len(grid) or len(tab2[0]) != len(grid[0]):
            raise ValueError("incompatible CMS partials (geometry/hash family)")
        total += t2
        for i, row in enumerate(tab2):
            gi = grid[i]
            for j, v in enumerate(row):
                gi[j] += v
    return total, hash_a, [tuple(r) for r in grid]
