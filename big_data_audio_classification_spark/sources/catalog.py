"""Table catalog over the driver-generated parquet test data.

Schemas are declared explicitly (FIXTURES.md Part B) rather than inferred:
at 100 TB, schema inference is a full-scan tax, and explicit schemas keep
column pruning + predicate pushdown working against the parquet footer
statistics. ``load_table`` is a plain ``spark.read.parquet`` — Catalyst
gets the native vectorized reader, pushdown, and partition pruning for
free.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Small dimension tables that should always be broadcast when joined
# against a fact table. At TPC-H-like scale region/nation/supplier stay
# tiny; customer/part grow with SF but stay well under broadcast
# thresholds until very large SF.
BROADCAST_TABLES = frozenset({"region", "nation", "supplier"})


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        # ts is TIMESTAMP(NANOS) in the file → read as long (nanos since
        # epoch), truncate to micros (lossless here: the generator writes
        # microsecond-precision instants), expose as a real timestamp so
        # event-time ops (window/session_window/watermark) work natively.
        import pyspark.sql.functions as F

        # integer `div`, not `/`: float division loses ULPs on large longs
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    use = names or TABLES
    return {n: load_table(spark, sf_dir, n) for n in use}


def register_temp_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view so ``spark.sql`` text queries
    (the SQL front door of the engine) resolve the same names the DuckDB
    oracle uses."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
