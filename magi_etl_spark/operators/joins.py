"""Join strategy operators: explicit salt-spread joins for skewed keys
and blocked fuzzy (edit-distance) record linkage.

AQE's skew-join split handles most hot-key cases transparently (the
session enables it); ``salted_join`` is the explicit form for the cases
AQE cannot fix — a skewed key whose matching rows must still co-locate
through a non-sort-merge path, or an engine/run where AQE is off.  The
reference never joins at scale (pandas merges on collected frames), so
both operators are scale extensions, not parity items.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    how: str = "inner",
    salt_buckets: int = 16,
) -> DataFrame:
    """Equi-join where hot keys on the ``big`` side are spread across
    ``salt_buckets`` partitions: each big row gets one salt value, the
    ``small`` side is replicated once per salt, and the join key becomes
    (key, salt) — a key with millions of rows occupies S partitions
    instead of pinning one task.

    Only ``inner`` and ``left`` are supported: with the small side
    replicated, right/full joins would emit one row per salt for every
    UNMATCHED small row.  The salt assignment is arbitrary by design
    (any distribution of big rows over salts yields the same join
    result); the replication multiplies the SMALL side only, so the
    price is S copies of the broadcast-sized table, not a shuffle of
    the big one."""
    if how not in ("inner", "left"):
        raise ValueError(
            f"salted_join supports inner/left, got {how!r}: a replicated "
            "small side duplicates unmatched rows under right/full"
        )
    salt = F.pmod(F.monotonically_increasing_id(), F.lit(salt_buckets))
    big2 = big.withColumn("_salt", salt)
    small2 = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    ).withColumn("_salt", F.col("_salt").cast("long"))
    return big2.join(small2, [*on, "_salt"], how).drop("_salt")


def prefix_block(col: Column | str, n: int = 2) -> Column:
    """Cheap blocking key for fuzzy matching: case-folded first ``n``
    characters.  Two strings within edit distance d can only disagree in
    the first n characters if an edit touched them — a standard
    recall/cost trade (use multiple blockers union'd for higher
    recall)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.substring(F.lower(F.trim(c)), 1, n)


def fuzzy_join(
    a: DataFrame,
    b: DataFrame,
    block_a: Column,
    block_b: Column,
    col_a: str,
    col_b: str,
    max_distance: int = 2,
) -> DataFrame:
    """Blocked edit-distance record linkage: candidate pairs share a
    blocking key (never an all-pairs cross join), then exact Levenshtein
    filters within the block.  Output: all columns of both sides plus
    ``edit_distance``.

    Scale shape: one shuffle on the blocking key; per-block candidate
    growth is the same sum-of-squares economics as the LSH/blocked
    embedding family — pick blockers so blocks stay small.  Spark 4's
    3-arg ``levenshtein(l, r, threshold)`` short-circuits the DP row
    scan once the bound is exceeded, so the per-pair cost is
    O(len * threshold), not O(len^2)."""
    left = a.withColumn("_blk", block_a)
    right = b.withColumn("_blk", block_b)
    dist = F.levenshtein(F.col(col_a), F.col(col_b), max_distance)
    return (
        left.join(right, "_blk")
        .withColumn("edit_distance", dist)
        # the thresholded form returns -1 when the bound is exceeded
        .where((F.col("edit_distance") >= 0) & (F.col("edit_distance") <= max_distance))
        .drop("_blk")
    )
