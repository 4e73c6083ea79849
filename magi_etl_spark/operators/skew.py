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


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: list[str],
    how: str = "inner",
    salt_buckets: int = 16,
) -> DataFrame:
    """Equi-join that survives a hot join key (the trending pipeline's
    viral-wiki case: one ``wiki_name`` carrying 100x the traffic of the
    rest turns the shuffle join into a single straggler task).

    The skewed side gets a stable salt derived from its full row hash;
    the other side is replicated across all ``salt_buckets`` values
    (explode of a literal range — rows × S, cheap when the other side is
    the smaller aggregate table); the join keys become (on…, salt), so
    the hot key's rows spread over S reducers.  Semantically identical to
    ``skewed.join(other, on, how)`` for inner/left joins: every skewed
    row still meets every matching other-side row exactly once.

    Prefer AQE's skew-join split (on by default in the session factory)
    when the skew appears at runtime shuffle statistics; use this
    explicit form when the hot key is *known* (a viral wiki) or when the
    optimizer can't see the skew (e.g. skew introduced by an upstream
    explode in the same stage).
    """
    if how not in ("inner", "left", "left_outer"):
        raise ValueError(f"salted_join supports inner/left joins, got {how!r}")
    salt = F.pmod(
        F.xxhash64(*[F.col(c) for c in skewed.columns]), F.lit(salt_buckets)
    )
    s = skewed.withColumn("_salt", salt)
    rep = other.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(salt_buckets)]))
    )
    return s.join(rep, on + ["_salt"], how).drop("_salt")


def key_skew_profile(
    df: DataFrame, key_cols: list[str], top_k: int = 20
) -> DataFrame:
    """Heavy-hitter profile of a prospective join/group key: the top-k
    keys by row count with each key's share of the table and its ratio
    to the mean key size — the numbers that decide between a plain
    shuffle join, AQE skew handling, or an explicit ``salted_join``
    (ratio >> 10 on a key that must shuffle is the salting signal).
    One map-side-combined aggregation plus a distributed top-k.

    Scale: the top-k is ``orderBy(...).limit(k)`` — Spark plans it as
    TakeOrderedAndProject (per-partition heaps merged on the driver), so
    the full distinct-key frame never funnels into one task.  Rank is
    then computed on the ≤ top_k surviving rows only; the window carries
    a constant partition key so no unpartitioned-window path is hit."""
    from pyspark.sql import Window as W

    from magi_etl_spark.functions import pinned_partition

    counts = df.groupBy(*key_cols).agg(F.count("*").alias("n"))
    stats = counts.agg(
        F.sum("n").alias("_total"), F.avg("n").alias("_mean")
    )
    top = counts.orderBy(F.desc("n"), *key_cols).limit(top_k)
    ranked = top.join(F.broadcast(stats)).withColumn(
        "rank",
        F.row_number().over(
            W.partitionBy(pinned_partition("n")).orderBy(
                F.desc("n"), *key_cols
            )
        ),
    )
    return ranked.select(
        *key_cols,
        "n",
        F.round(F.col("n") / F.col("_total"), 6).alias("share"),
        F.round(F.col("n") / F.col("_mean"), 6).alias("x_mean"),
        "rank",
    )
