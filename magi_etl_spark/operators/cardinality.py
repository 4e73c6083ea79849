"""Cardinality estimation services: pre-flight join-size estimates and
sketch-based distinct overlap.

A 100 TB join that explodes is cheaper to predict than to kill.
``estimate_join_rows`` prices an inner equi-join WITHOUT running it, by
sampling the KEY SPACE — not rows.  Row sampling underestimates join
output quadratically (a key kept with probability p contributes p² of
its pairs); key sampling keeps or drops every row of a key on BOTH
sides together (the hash predicate is identical), so each sampled key
contributes its exact pair count and the estimator is unbiased with
scale factor 1/p.

``distinct_overlap`` estimates |A|, |B|, |A∪B|, |A∩B| for a column
across two frames from mergeable HLL sketches (inclusion–exclusion on
the union sketch) — the join-key overlap diagnostic that decides
whether a join is even worth it, at sketch cost instead of a distinct
shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from magi_etl_spark.operators.mixing import frac_threshold_hex, uniform_hex


def _key_expr(cols: list[str]):
    return F.concat_ws("", *[F.col(c).cast("string") for c in cols])


def estimate_frame(
    a: DataFrame,
    b: DataFrame,
    on: list[str],
    fraction: float = 0.05,
    seed: str = "joinest",
) -> DataFrame:
    """The join-size estimate as a ONE-ROW DataFrame (``estimated_rows,
    sampled_keys, max_key_pairs``) — one filtered aggregate per side
    over the sampled keys, one small histogram join; never the real
    join.  NULL keys never match in SQL joins and are excluded."""
    if not 0.0 < fraction <= 1.0:
        raise ValueError(f"fraction must be in (0, 1], got {fraction}")
    thr = F.lit(frac_threshold_hex(fraction))

    def side_hist(df: DataFrame, name: str) -> DataFrame:
        key = _key_expr(on)
        kept = df.where(
            key.isNotNull() & (uniform_hex(key, seed) < thr)
        )
        return kept.groupBy(*on).agg(F.count(F.lit(1)).alias(name))

    ha = side_hist(a, "_na")
    hb = side_hist(b, "_nb")
    return (
        ha.join(hb, on)
        .select((F.col("_na") * F.col("_nb")).alias("_pairs"))
        .agg(
            (
                F.coalesce(F.sum("_pairs"), F.lit(0)).cast("double")
                / F.lit(float(fraction))
            ).alias("estimated_rows"),
            F.count(F.lit(1)).alias("sampled_keys"),
            F.coalesce(F.max("_pairs"), F.lit(0)).alias("max_key_pairs"),
        )
    )


def estimate_join_rows(
    a: DataFrame,
    b: DataFrame,
    on: list[str],
    fraction: float = 0.05,
    seed: str = "joinest",
) -> dict:
    """Estimate ``a JOIN b ON on`` (inner) output size from a
    deterministic hash sample of the join-key space (see
    :func:`estimate_frame` for the plan shape).  Returns::

        {"estimated_rows": float,   # unbiased key-sample estimate
         "sampled_keys": int,       # matched keys in the sample
         "max_key_pairs": int,      # largest single-key pair count seen
         "fraction": float}

    ``max_key_pairs`` (scaled by nothing — it is an observed per-key
    value) is the skew alarm: one key producing millions of pairs calls
    for ``salted_join`` or a pre-aggregation, whatever the total says."""
    row = estimate_frame(a, b, on, fraction, seed).first()
    return {
        "estimated_rows": float(row["estimated_rows"]),
        "sampled_keys": int(row["sampled_keys"]),
        "max_key_pairs": int(row["max_key_pairs"]),
        "fraction": fraction,
    }


def distinct_overlap(
    a: DataFrame, b: DataFrame, col: str, lg_k: int = 14
) -> dict:
    """HLL-sketch estimates of the distinct-value relationship between
    ``a.col`` and ``b.col``: one sketch aggregate per side (map-side
    mergeable, no distinct shuffle), union merged driver-free, and
    |A∩B| by inclusion–exclusion.  Small negative intersections (sketch
    noise around disjoint sets) clamp to 0."""
    sa = a.agg(F.hll_sketch_agg(col, lg_k).alias("s")).select(
        F.col("s").alias("sa")
    )
    sb = b.agg(F.hll_sketch_agg(col, lg_k).alias("s")).select(
        F.col("s").alias("sb")
    )
    row = (
        sa.crossJoin(sb)
        .select(
            F.hll_sketch_estimate("sa").alias("na"),
            F.hll_sketch_estimate("sb").alias("nb"),
            F.hll_sketch_estimate(
                F.hll_union("sa", "sb", True)
            ).alias("nu"),
        )
        .first()
    )
    inter = max(0, int(row["na"]) + int(row["nb"]) - int(row["nu"]))
    return {
        "distinct_a": int(row["na"]),
        "distinct_b": int(row["nb"]),
        "distinct_union": int(row["nu"]),
        "distinct_intersection": inter,
    }
