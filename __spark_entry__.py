"""Driver contract for the spark-graft builder (PySpark target).

Thin view over ``big_data_audio_classification_spark.registry``: every
implemented operator registers an exemplar query plus (when
SQL-expressible) a DuckDB oracle SQL string. See SURVEY.md §2 for the
operator inventory and ``big_data_audio_classification_spark/`` for the
implementations.
"""

from __future__ import annotations

import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, "/root/repo")

from big_data_audio_classification_spark.registry import (  # noqa: E402
    oracle_sqls,
    spark_queries,
)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H-Q1-style pricing summary) on sf0.001."""
    from big_data_audio_classification_spark.operators.relational import pricing_summary

    return pricing_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return spark_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL for each SQL-expressible query."""
    return oracle_sqls()
