"""Vector math over ``array<float>`` columns — JVM-side higher-order
functions, no Python UDFs.

The embedding column stays a plain SQL array (not ml.linalg.Vector)
through all relational ops so Catalyst can prune/push down around it;
conversion to MLlib vectors happens only at the ``pyspark.ml`` boundary
(``array_to_vector``).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column


def to_double(arr: Column) -> Column:
    return F.transform(arr, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ via zip_with + aggregate (whole-stage codegen'd)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def sq_norm(a: Column) -> Column:
    return F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x)


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity; computed in double precision elementwise so
    the DuckDB oracle (same formula, same order) matches to the ULP."""
    return dot(a, b) / (F.sqrt(sq_norm(a)) * F.sqrt(sq_norm(b)))


def l2_dist_sq(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
