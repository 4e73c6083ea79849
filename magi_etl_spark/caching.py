"""Ownership of persisted intermediates.

The dedup/similarity operators persist() intermediate frames to bound
re-evaluation of interpreted higher-order-function trees across
self-joins (measured 4x without).  In a long-running session those
cached blocks would otherwise live until session end; ``CacheScope``
gives callers a cleanup path: operators accept ``scope=`` and register
their persists there, and exiting the scope unpersists everything.

    with CacheScope() as scope:
        pairs = ngram_jaccard_pairs(docs, ..., scope=scope)
        pairs.write.parquet(out)
    # all operator caches released here

Without a scope (``scope=None``) behavior is unchanged — frames stay
cached for interactive reuse, and ``SparkSession.catalog.clearCache()``
remains the blunt fallback.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


class CacheScope:
    """Collects DataFrames persisted on behalf of a caller and unpersists
    them (non-blocking) when the scope exits."""

    def __init__(self) -> None:
        self._frames: list[DataFrame] = []

    def persist(self, df: DataFrame) -> DataFrame:
        out = df.persist()
        self._frames.append(out)
        return out

    def release(self) -> None:
        for df in self._frames:
            try:
                df.unpersist(blocking=False)
            except Exception:
                pass  # session already stopped
        self._frames.clear()

    def __enter__(self) -> CacheScope:
        return self

    def __exit__(self, *exc) -> None:
        self.release()


def persist_in(df: DataFrame, scope: CacheScope | None) -> DataFrame:
    """persist() via the caller's scope when one is provided."""
    return scope.persist(df) if scope is not None else df.persist()
