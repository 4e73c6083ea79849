"""Skew-aware aggregation: two-phase (salted) exact distinct counts.

A single hot key turns ``groupBy(key).agg(countDistinct(x))`` into one
straggler task.  The salted form shuffles on (key, hash(x) % S) first —
the hot key's distinct-set splits across S reducers — then merges the S
partial distinct counts, which is exact because the salt partitions the
*distinct values* (same x always lands in the same salt bucket).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_count_distinct(
    df: DataFrame,
    group_cols: list[str],
    distinct_col: str | Column,
    out_name: str = "n_distinct",
    salt_buckets: int = 16,
) -> DataFrame:
    """Exact per-group distinct count that survives a hot group.

    Phase 1 groups on (group_cols…, salt=hash(value)%S) counting distinct
    within each salt bucket; phase 2 sums the bucket counts.  Both phases
    map-side combine; no group ever concentrates on one task.
    """
    c = F.col(distinct_col) if isinstance(distinct_col, str) else distinct_col
    salt = F.pmod(F.xxhash64(c), F.lit(salt_buckets))
    phase1 = (
        df.groupBy(*group_cols, salt.alias("_salt"))
        .agg(F.countDistinct(c).alias("_partial"))
    )
    return phase1.groupBy(*group_cols).agg(F.sum("_partial").alias(out_name))
