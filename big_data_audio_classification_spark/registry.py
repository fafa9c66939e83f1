"""Query registry — the single source of truth for the driver contract.

Every implemented operator registers an exemplar query here via the
``@query`` decorator. ``__spark_entry__.queries()`` / ``oracle_sql()``
are thin views over this registry: each entry pairs a Spark DataFrame
builder ``(spark, sf_dir) -> DataFrame`` with (when SQL-expressible) an
equivalent ANSI-SQL string the DuckDB oracle can run on the same parquet
tables. Non-SQL-expressible operators (LSH, MLlib fits, streaming state)
register with ``oracle=None`` → the driver records a rows-only check.

Column-name parity rule: the driver sorts columns by name before value
hashing, so every computed column is aliased identically in the Spark
code and the oracle SQL (see SURVEY.md §5.2).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class EngineQuery:
    name: str
    fn: QueryFn
    oracle: str | None
    tags: tuple[str, ...] = field(default_factory=tuple)
    doc: str = ""


_REGISTRY: dict[str, EngineQuery] = {}


def query(name: str, oracle: str | None = None, tags: tuple[str, ...] = ()):
    """Register an exemplar query under ``name``.

    ``oracle`` is DuckDB-flavored ANSI SQL over the pre-registered views
    (region nation customer supplier part orders lineitem events
    documents embeddings), or None for rows-only checks.
    """

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        _REGISTRY[name] = EngineQuery(
            name=name, fn=fn, oracle=oracle, tags=tuple(tags), doc=fn.__doc__ or ""
        )
        return fn

    return deco


def all_queries() -> dict[str, EngineQuery]:
    # Import side-effect modules exactly once; each registers its queries.
    import big_data_audio_classification_spark.queries  # noqa: F401

    return dict(_REGISTRY)


def spark_queries() -> dict[str, QueryFn]:
    return {n: q.fn for n, q in all_queries().items()}


def oracle_sqls() -> dict[str, str]:
    return {n: q.oracle for n, q in all_queries().items() if q.oracle is not None}
