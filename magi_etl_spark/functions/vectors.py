"""Vector math over ``array<float>`` embedding columns.

Built-in higher-order functions only (``zip_with`` / ``aggregate``) — these
run inside codegen on the JVM; no Python crosses the boundary.  Floats are
cast to double *before* multiplication so per-element products are exactly
reproducible in any IEEE-double engine (the DuckDB oracles do the same).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Dot product via zip_with + left-fold aggregate."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity of two double-array columns."""
    return dot(a, b) / (l2_norm(a) * l2_norm(b))
