"""Scalar/array/vector function parity pack (SURVEY.md §2.8).

Pure ``Column``-expression helpers — everything stays JVM-side inside
whole-stage codegen; no Python UDFs in any hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def fan_out(df: DataFrame) -> DataFrame:
    """Spread a narrow input across the cluster before CPU-heavy per-row
    work.  A small parquet file arrives as one split; without this, all
    tokenize/hash/vector work runs on a single core.  No-op when the
    input is already wide: file-backed frames are checked via
    ``inputFiles()`` plan metadata (cheap); non-file-backed frames
    (createDataFrame, post-shuffle derivations) return no files, so they
    fall back to the actual partition count — a join/aggregate output is
    already wide and must not eat an extra round-robin shuffle."""
    target = df.sparkSession.sparkContext.defaultParallelism
    files = df.inputFiles()
    if files:
        if len(files) >= target:
            return df
    elif df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)


def pinned_partition(anchor: Column | str) -> Column:
    """A window partition key that is constant (every row lands in one
    group) yet NOT foldable, so Catalyst cannot strip it from the window
    spec and fall into the unpartitioned-window path (``WindowExec``
    single-partition warning + no distribution requirement).

    ``lit(0)`` and projected-constant columns are both constant-folded
    out of ``windowspecdefinition``; ``anchor - anchor`` survives as a
    projected ``_w0`` column.  Use ONLY on frames already bounded to a
    few rows (post-``limit`` top-k, per-partition totals) — the single
    group is the point, not a hazard, at that size.  ``anchor`` must be
    a non-null numeric column.
    """
    c = F.col(anchor) if isinstance(anchor, str) else anchor
    return c - c
