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
    input is already wide.

    Width is judged by the ACTUAL physical partition count — never by
    ``inputFiles()``, which reports the leaf scan files of the whole
    plan: a post-shuffle derivation (join/aggregate output, already
    wide) still lists its underlying tables' few files, and a file-count
    check would repartition it DOWN, adding a shuffle exactly where one
    must not be."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
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
