"""Driver-facing query inventory.

Each entry pairs a Spark DataFrame program (idiomatic, Catalyst-optimized)
with an ANSI-SQL oracle that DuckDB runs over the same parquet tables.
Column names are aligned on both sides — the driver sorts columns by name
and hashes values, so every computed column is aliased identically.

Determinism rules used throughout (see SURVEY.md §5.2):
- Monetary sums are reported as exact integers (``round(x * 10^k)`` summed
  as bigint) so floating-point summation order can never flip a hash.
- LIMIT/top-k queries always carry a unique tie-break key.
- Timestamps are never emitted raw (parquet ns vs Spark micro precision);
  they are floored to seconds/days or diffed into integers.
- Float outputs are either per-row deterministic expressions or rounded
  well inside the driver's 6-dp comparison grid.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLE: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a query; ``oracle`` is the DuckDB-equivalent SQL (omit for
    non-SQL-expressible operators — the driver then runs a rows-only check)."""

    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE[name] = oracle
        return fn

    return deco


def _load_all() -> None:
    from magi_etl_spark.queries import (  # noqa: F401
        advanced,
        dedup,
        engine,
        relational,
        similarity,
        text,
    )


_load_all()
