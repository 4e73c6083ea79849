"""Weighted Cohen's kappa (Cohen 1968) — chance-corrected inter-rater
agreement for ORDINAL ratings, where near-misses count: the unweighted
kappa (``kappa.py`` q248) scores a (0 vs 1) disagreement the same as
(0 vs 3); the weighted form penalizes by distance, linear ``|i - j|``
or quadratic ``(i - j)^2`` (the quadratic form equals an intraclass
correlation, Fleiss & Cohen 1973).

With observed cell counts O_ij, marginals row_i / col_j and penalty
v_ij over the FULL marginal cross:

    kappa_w = 1 - (N * sum_ij v_ij O_ij) / (sum_ij v_ij row_i col_j)

Both sums are exact decimal(38,0) integers (penalties are integer
distances on integer ratings, squared in decimal — the spatial.py
int64-edge lesson); the statistic is ONE double division at the end,
rounded at the 6-dp grid.  A group whose expected-disagreement
denominator is zero (a single rating level on either side) emits
NULL.

Scale shape: one keyed count over (group, i, j) cells bounded by the
label-set cross (the kappa.py contract — ordinal scales are small by
construction), marginal aggregations of those cells, and one
group-keyed join of the two marginal frames; the corpus is touched
once.

Scope note: the reference app has no inter-rater surface — this
completes the q248 agreement family with its ordinal form.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_DEC = "decimal(38,0)"


def weighted_kappa(
    df: DataFrame,
    group_cols: list[str],
    r1: Column,
    r2: Column,
    weighting: str = "quadratic",
    round_dp: int = 6,
) -> DataFrame:
    """``*group_cols, n_items, kappa_w`` — distance-weighted Cohen's
    kappa between integer ordinal ratings ``r1`` and ``r2`` per group;
    ``weighting`` is 'quadratic' (default) or 'linear'.  Rows where
    either rating is null are dropped (no pairing, and engines
    group/order nulls differently — the kstest lesson)."""
    if weighting not in ("linear", "quadratic"):
        raise ValueError(
            f"weighting must be 'linear' or 'quadratic', got {weighting!r}"
        )
    if not group_cols:
        raise ValueError(
            "group_cols must be non-empty (the marginal cross and the "
            "obs/exp join key on them); for a global kappa, add a "
            "constant key column upstream"
        )
    reserved = {
        "n_items", "kappa_w",
        "_i", "_j", "_c", "_rowc", "_colc", "_vo", "_ve",
    } & set(group_cols)
    if reserved:
        raise ValueError(
            f"group_cols collide with working columns: {sorted(reserved)}"
        )

    def pen(i: Column, j: Column) -> Column:
        d = i.cast(_DEC) - j.cast(_DEC)
        return d * d if weighting == "quadratic" else F.abs(d)

    base = df.select(
        *group_cols, r1.cast("long").alias("_i"), r2.cast("long").alias("_j")
    ).where(F.col("_i").isNotNull() & F.col("_j").isNotNull())
    cells = base.groupBy(*group_cols, "_i", "_j").agg(
        F.count(F.lit(1)).alias("_c")
    )
    obs = cells.groupBy(*group_cols).agg(
        F.sum("_c").alias("n_items"),
        F.sum(pen(F.col("_i"), F.col("_j")) * F.col("_c").cast(_DEC)).alias(
            "_vo"
        ),
    )
    rm = cells.groupBy(*group_cols, "_i").agg(
        F.sum("_c").alias("_rowc")
    )
    cm = cells.groupBy(*group_cols, "_j").agg(
        F.sum("_c").alias("_colc")
    )
    # full marginal cross per group: label-set-bounded, never corpus
    exp = (
        rm.join(cm, list(group_cols))
        .groupBy(*group_cols)
        .agg(
            F.sum(
                pen(F.col("_i"), F.col("_j"))
                * F.col("_rowc").cast(_DEC)
                * F.col("_colc").cast(_DEC)
            ).alias("_ve")
        )
    )
    num = F.col("n_items").cast(_DEC) * F.col("_vo")
    return obs.join(exp, list(group_cols)).select(
        *group_cols,
        "n_items",
        F.when(
            F.col("_ve") > 0,
            F.round(
                F.lit(1.0)
                - num.cast("double") / F.col("_ve").cast("double"),
                round_dp,
            ),
        ).alias("kappa_w"),
    )
