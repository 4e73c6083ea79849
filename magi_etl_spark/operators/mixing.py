"""Weighted dataset mixing via deterministic hash sampling
(LLM-data-pipeline extension; no counterpart in the tabular-only
reference).

A training mixture assigns each source a weight: 0.25 keeps a quarter
of the rows, 1.0 keeps all, 2.5 emits two copies of every row plus a
third for half of them (fractional epochs).  The sampling decision is a
pure function of (seed, row key): ``u = md5(seed|key)[:8]`` compared
against a fixed-point hex threshold — no RNG state, so the sample is
reproducible across runs, engines (the same expression runs in DuckDB),
partitionings, and retries of failed tasks (a re-executed task emits
exactly the same rows, which keeps speculative execution and stage
retries correct).

Scale shape: the whole operator is project + filter + bounded explode —
NO shuffle, no state; it composes with a downstream repartition/write
without adding a stage boundary.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_HEX_SPAN = 16**8  # first 8 md5 hex chars, uniform over [0, 16^8)


def uniform_hex(key: Column, seed: str) -> Column:
    """First 8 lowercase-hex chars of md5(seed|key) — a deterministic
    uniform draw; fixed-length lowercase hex compares lexicographically
    as a number, portably across engines."""
    return F.substring(
        F.md5(F.concat(F.lit(f"{seed}|"), key.cast("string"))), 1, 8
    )


def frac_threshold_hex(fraction: float) -> str:
    """The threshold t such that P(u < t) == fraction for an 8-hex-char
    uniform draw.  fraction == 1.0 has no 8-hex representation (16^8 is
    9 chars, which would sort BELOW the 8-char draws and keep ~nothing);
    it returns "g", which every hex string sorts below, in any engine."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    if fraction >= 1.0:
        return "g"
    return format(int(fraction * _HEX_SPAN), "08x")


def deterministic_sample(
    df: DataFrame, key_col: str, fraction: float, seed: str = "sample"
) -> DataFrame:
    """Keep ~``fraction`` of rows, chosen by key hash — stable across
    runs/partitionings/retries, unlike ``DataFrame.sample`` whose draw
    depends on partition layout.  fraction >= 1.0 keeps everything and
    adds no filter to the plan."""
    if fraction >= 1.0:
        frac_threshold_hex(fraction)  # still validate the range
        return df
    u = uniform_hex(F.col(key_col), seed)
    return df.where(u < F.lit(frac_threshold_hex(fraction)))


def split_assign(
    df: DataFrame,
    key_col: str,
    splits: dict[str, float],
    seed: str = "split",
    split_col: str = "split",
) -> DataFrame:
    """Deterministic disjoint train/val/test assignment: each row gets
    exactly ONE label from ``splits`` (label -> fraction, must sum to 1),
    decided by which sub-interval of [0, 1) its hash draw lands in.

    Same guarantees as ``deterministic_sample``: assignment is a pure
    function of (seed, key), so it is stable across runs, engines,
    partitionings, and task retries — and rows sharing a key always land
    in the SAME split (use a group key like a document family id to keep
    near-duplicates out of eval sets).  Project-only: no shuffle."""
    if not splits:
        raise ValueError("splits must not be empty")
    total = sum(splits.values())
    if any(w < 0 for w in splits.values()) or abs(total - 1.0) > 1e-9:
        raise ValueError(f"split fractions must be >= 0 and sum to 1, got {splits}")
    u = uniform_hex(F.col(key_col), seed)
    names = list(splits)
    cum = 0.0
    expr = None
    for name in names[:-1]:
        cum += splits[name]
        cond = u < F.lit(frac_threshold_hex(min(cum, 1.0)))
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last = F.lit(names[-1])
    assigned = last if expr is None else expr.otherwise(last)
    return df.withColumn(split_col, assigned)


def split_dataset(
    df: DataFrame,
    key_col: str,
    splits: dict[str, float],
    seed: str = "split",
) -> dict[str, DataFrame]:
    """``split_assign`` materialized as one frame per label (each a
    filter over the same assignment — disjoint and exhaustive by
    construction)."""
    assigned = split_assign(df, key_col, splits, seed)
    return {name: assigned.where(F.col("split") == name) for name in splits}


def weighted_mix(
    df: DataFrame,
    weights: dict[str, float],
    source_col: str,
    key_col: str,
    seed: str = "mix",
    copy_col: str = "copy_idx",
    default_weight: float = 0.0,
) -> DataFrame:
    """Resample ``df`` to the mixture given by ``weights`` (source value
    -> weight).  Each row of a source with weight w is emitted
    ``floor(w)`` times, plus once more when its hash draw falls under
    ``frac(w)``; sources absent from ``weights`` get ``default_weight``.
    ``copy_col`` numbers the copies 1..n so downstream exact-dedup can
    distinguish intentional replication from accidental duplicates."""
    for s, w in weights.items():
        if w < 0:
            raise ValueError(f"negative weight for {s!r}: {w}")
    src = F.col(source_col)
    whole = F.lit(int(math.floor(default_weight)))
    thr = F.lit(frac_threshold_hex(default_weight - math.floor(default_weight)))
    for s, w in weights.items():
        whole = F.when(src == s, int(math.floor(w))).otherwise(whole)
        thr = F.when(
            src == s, frac_threshold_hex(w - math.floor(w))
        ).otherwise(thr)
    u = uniform_hex(F.col(key_col), seed)
    n = (whole + F.when(u < thr, 1).otherwise(0)).alias("_n_copies")
    # sequence(1, 0) yields a DESCENDING [1, 0] — the n==0 case must be
    # filtered out before the explode, never clamped
    out = df.withColumn("_n_copies", n).where(F.col("_n_copies") > 0)
    return out.withColumn(
        copy_col, F.explode(F.sequence(F.lit(1), F.col("_n_copies")))
    ).drop("_n_copies")


def curriculum_order(
    df: DataFrame,
    stage_col: Column,
    id_col: str,
    seed: str = "curriculum",
) -> DataFrame:
    """Global curriculum position for every row: input columns +
    ``stage`` and ``curriculum_pos`` (1-based), ordered by ascending
    stage with a deterministic hash shuffle WITHIN each stage —
    curriculum learning's canonical data order (easy→hard stages,
    randomized inside a stage so batches stay i.i.d. within
    difficulty; Bengio et al. 2009).

    The global position intentionally avoids the single-partition
    ``ORDER BY everything`` window: it reuses the range-partitioned
    two-pass prefix sum (``operators/prefix.py``), so the ordering
    scales with partitions.  ``stage_col`` is any integer difficulty
    expression (a binned quality score, a length bucket); the
    within-stage draw is the repo-standard md5 uniform, so the full
    ordering is reproducible and SQL-expressible for oracles."""
    from magi_etl_spark.operators.prefix import ranked_prefix_sum

    staged = df.withColumn("stage", stage_col.cast("int")).withColumn(
        "_draw", uniform_hex(F.col(id_col), seed)
    )
    ranked = ranked_prefix_sum(
        staged.withColumn("_one", F.lit(1)),
        [F.asc("stage"), F.asc("_draw"), F.asc(id_col)],
        "_one",
    )
    return ranked.withColumnRenamed("rank", "curriculum_pos").drop(
        "_draw", "_one", "cum"
    )
