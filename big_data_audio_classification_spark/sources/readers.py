"""Source/sink surface beyond parquet (SURVEY §2.B scans/sources/sinks):
CSV with headers (R8/R16), JSON lines, binary files (R5/R12 ingestion).

Explicit schemas everywhere — at 100 TB, inference is a full extra scan.
Writers partition by a low-cardinality column when given one, which is
the layout that makes downstream partition pruning free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def read_csv(spark: SparkSession, path: str, schema: StructType | str) -> DataFrame:
    """Header CSV scan with explicit schema (R16 — the reference's
    pd.read_csv at voice_classifier.py:98, minus inference)."""
    return spark.read.option("header", True).schema(schema).csv(path)


def write_csv(df: DataFrame, path: str, partition_by: str | None = None) -> None:
    """Header CSV sink (R8 — data_generator.py:8-11)."""
    w = df.write.option("header", True).mode("overwrite")
    if partition_by:
        w = w.partitionBy(partition_by)
    w.csv(path)


def read_jsonl(spark: SparkSession, path: str, schema: StructType | str) -> DataFrame:
    return spark.read.schema(schema).json(path)


def write_jsonl(df: DataFrame, path: str) -> None:
    df.write.mode("overwrite").json(path)


def read_binary_files(spark: SparkSession, path: str, glob: str = "*") -> DataFrame:
    """Binary-file source (R5/R12: the mp3 ingestion boundary) —
    (path, modificationTime, length, content) rows; decode happens in a
    downstream pandas-UDF stage, never on the driver."""
    return (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(path)
    )


def write_partitioned_parquet(
    df: DataFrame, path: str, partition_by: tuple[str, ...] = ()
) -> None:
    """Parquet sink with optional hive-style partitioning — the layout
    that turns date/segment predicates into partition pruning."""
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)
