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


def sorted_neighborhood_pairs(
    df: DataFrame,
    id_col: str,
    sort_key: Column,
    window: int = 4,
    num_partitions: int = 32,
) -> DataFrame:
    """Sorted-neighborhood candidate generation (Hernández & Stolfo):
    sort the corpus once on a domain key (normalized name, date+zip,
    …), then emit every pair within ``window`` positions of each other.
    Output: ``id_a, id_b, rank_a, rank_b, key_a, key_b`` with
    ``rank_a < rank_b`` — feed the pairs to an exact comparator
    (``levenshtein``, jaccard) like ``fuzzy_join`` does blocks.

    Complements prefix/LSH blocking: a good sort key puts near-matches
    adjacent even when their PREFIXES differ ('J. Smith' / 'Smith, J.'
    under a lastname-first normalizer), and the candidate count is
    exactly linear — N*window pairs, never a quadratic hot block.

    Scale shape: the global rank comes from the range-partitioned
    two-pass operator (no single-partition window anywhere); pairing is
    a self-join on ``floor(rank / window)`` with the left side exploded
    to its own and the NEXT bucket — any two ranks within ``window`` of
    each other land in the same or adjacent buckets, and each unordered
    pair matches on exactly one bucket key (its right row's bucket), so
    coverage is exact with no post-dedup.  One sort shuffle + one pair
    shuffle, both on uniform keys."""
    from magi_etl_spark.operators.prefix import ranked_prefix_sum

    if window < 1:
        raise ValueError(f"window must be >= 1, got {window}")
    ranked = ranked_prefix_sum(
        df.select(F.col(id_col).alias("_id"), sort_key.alias("_sk")).withColumn(
            "_zero", F.lit(0)
        ),
        # id tie-break keeps the global order (hence the pair set)
        # unique and partitioning-independent
        [F.col("_sk"), F.col("_id")],
        "_zero",
        num_partitions=num_partitions,
    ).select("_id", "_sk", "rank")
    bkt = F.floor((F.col("rank") - 1) / window)
    left = (
        ranked.withColumn("_b", F.explode(F.array(bkt, bkt + 1)))
        .select(
            F.col("_id").alias("id_a"),
            F.col("_sk").alias("key_a"),
            F.col("rank").alias("rank_a"),
            "_b",
        )
    )
    right = ranked.select(
        F.col("_id").alias("id_b"),
        F.col("_sk").alias("key_b"),
        F.col("rank").alias("rank_b"),
        bkt.alias("_b"),
    )
    return (
        left.join(right, "_b")
        .where(
            (F.col("rank_a") < F.col("rank_b"))
            & (F.col("rank_b") - F.col("rank_a") <= window)
        )
        .drop("_b")
    )
