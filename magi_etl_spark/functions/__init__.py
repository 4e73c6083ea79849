"""Scalar/array/vector function parity pack (SURVEY.md §2.8).

Pure ``Column``-expression helpers — everything stays JVM-side inside
whole-stage codegen; no Python UDFs in any hot path.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Logical nodes that cannot narrow a frame below the shuffle width: any
# plan containing one is "already wide" (its output partitioning comes
# from an exchange, not from the input file layout).
_NARROW_NODES = frozenset(
    {"Project", "Filter", "SubqueryAlias", "View", "Relation", "LogicalRelation"}
)
_NODE_NAME = re.compile(r"^[\s:+\-']*([A-Za-z]+)")


def _is_scan_only(df: DataFrame) -> bool:
    """True when the analyzed plan is a bare projection/filter over a
    relation — the only shape whose output width is the file split
    count.  Any other node (join, aggregate, window, repartition, …)
    means the frame's distribution comes from an exchange."""
    for line in df._jdf.queryExecution().analyzed().treeString().splitlines():
        m = _NODE_NAME.match(line)
        if m and m.group(1) not in _NARROW_NODES:
            return False
    return True


_SIZE_SUFFIX = {
    "": 1, "b": 1,
    "k": 1 << 10, "kb": 1 << 10,
    "m": 1 << 20, "mb": 1 << 20,
    "g": 1 << 30, "gb": 1 << 30,
    "t": 1 << 40, "tb": 1 << 40,
    "p": 1 << 50, "pb": 1 << 50,
}


def _size_bytes(value, default: int) -> int:
    """Spark byte-size conf value ("134217728", "128m", "1g", "64MB")
    → bytes, falling back to ``default`` on anything unparseable — a
    derived default must degrade, not crash (the fdr.py
    shuffle-partitions lesson applied to size-suffixed confs, which the
    old ``int(str(v).rstrip("b"))`` parse crashed on for "128m")."""
    import re as _re

    m = _re.fullmatch(r"\s*(\d+)\s*([a-zA-Z]*)\s*", str(value))
    if not m:
        return default
    mult = _SIZE_SUFFIX.get(m.group(2).lower())
    if mult is None:
        return default
    return int(m.group(1)) * mult


def _scan_width(df: DataFrame) -> int | None:
    """Estimated split count of a scan-only plan from local file sizes,
    or ``None`` when the files aren't locally inspectable.  Mirrors
    Spark's split rule conservatively: one split per file plus one per
    ``maxPartitionBytes`` of size — an over-estimate never triggers a
    repartition the real layout wouldn't need."""
    import os
    from urllib.parse import unquote, urlparse

    try:
        files = df.inputFiles()
    except Exception:
        return None
    max_bytes = _size_bytes(
        df.sparkSession.conf.get("spark.sql.files.maxPartitionBytes", "134217728"),
        134217728,
    )
    splits = 0
    for uri in files:
        parsed = urlparse(uri)
        if parsed.scheme not in ("file", ""):
            return None  # remote store — fall back to the RDD probe
        size = os.path.getsize(unquote(parsed.path))
        splits += max(1, -(-size // max_bytes))
    return splits


def fan_out(df: DataFrame, width: int | None = None) -> DataFrame:
    """Spread a narrow input across the cluster before CPU-heavy per-row
    work.  A small parquet file arrives as one split; without this, all
    tokenize/hash/vector work runs on a single core.  No-op when the
    input is already wide.

    Width never comes from ``inputFiles()`` alone — that reports the leaf
    scan files of the whole plan, so a post-shuffle derivation
    (join/aggregate output, already wide) would be repartitioned DOWN,
    adding a shuffle exactly where one must not be.  Resolution order:

    1. an explicit ``width`` hint from a caller that knows its input;
    2. plans containing any shuffle-inducing node are wide by
       construction — no-op without touching the RDD path.  CAVEAT:
       AQE coalesces small shuffle outputs to very few partitions, so
       "wide by construction" is about row-count economics, not task
       count — a caller whose downstream cost is super-linear in the
       rows (pair joins, per-row heavy expressions) must pass
       ``width=1`` explicitly (see ``blocked_neardup_pairs``, which
       regressed 8x when it relied on this rule);
    3. bare file scans estimate splits from local file sizes;
    4. only the exotic remainder (scan-only over a non-local store) pays
       the ``df.rdd.getNumPartitions()`` probe, which under AQE can
       materialize upstream stages — kept off the hot path."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if width is None:
        if not _is_scan_only(df):
            return df
        width = _scan_width(df)
        if width is None:
            width = df.rdd.getNumPartitions()
    if width >= target:
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
