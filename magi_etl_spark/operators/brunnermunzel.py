"""Brunner–Munzel test (Brunner & Munzel 2000) — the modern two-sample
rank test: like Mann–Whitney (q238's group_auc machinery) it asks
"does sample 2 stochastically dominate sample 1?", but WITHOUT the
equal-variance assumption the classical U test silently makes — each
sample's placement variance is estimated separately, so heteroscedastic
drift (one cohort's metric both shifts and widens) doesn't inflate the
false-alarm rate.  The recommended default over Mann–Whitney in the
modern literature; completes the two-sample family beside cucconi
(q259, joint location-scale) and kstest (q235, full-distribution).

For pooled mid-ranks R_ik and within-sample mid-ranks R*_ik, the
placements P_ik = R_ik - R*_ik give

    p_hat = (Rbar_2 - (n2+1)/2) / n1          (the stochastic index)
    S_i^2 = sum_k (P_ik - Pbar_i)^2 / (n_i - 1)
    W = n1 n2 (Rbar_2 - Rbar_1) / (N * sqrt(n1 S_1^2 + n2 S_2^2))

Engine parity: EXACT through both radicand and numerator — doubled
mid-ranks ``a = 2*avgrank`` (rankcorr's ``_rank2``) make the doubled
placements p2 = a_pooled - a_within exact integers per distinct-value
cell, so with per-sample cell sums sp_i = sum c*p2, q_i = sum c*p2^2
and doubled pooled rank sums sa_i = sum c*a_pooled:

    W = (n1*sa_2 - n2*sa_1) * sqrt((n1-1)(n2-1))
        / (N * sqrt((n1 q_1 - sp_1^2)(n2-1) + (n2 q_2 - sp_2^2)(n1-1)))

— every parenthesized term an exact decimal, two sqrts and one
division in a fixed operand order the oracle mirrors; output rounds
at the 6-dp grid.  (The doubling cancels: numerator and radicand are
both 4x their single-rank forms.)

Scale shape: one (key, sample, value) cell aggregation collapses the
corpus (materialized ONCE via the chkpt barrier), BOTH rank passes
ride DISTINCT values (pooled: per key; within: per key-sample), one
keyed aggregation finishes — no windows over raw rows, no pairs.
Keys missing either sample, with n_i < 2, or with a non-positive
radicand (all placements constant — the samples don't overlap) emit
NULL w (the mannkendall posture; p_hat is still reported when both
samples are present).

Scope note: the reference app has no two-sample surface at all —
this is the drift-family extension member recommended as the default
two-sample test (see cucconi.py's scope note for the family map).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from magi_etl_spark.chkpt import materialize
from pyspark.sql import Window as W

_DEC = "decimal(38,0)"


def _wrank2(
    cells: DataFrame,
    group_cols: list[str],
    val_col: str,
    weight_col: str,
    out: str,
) -> DataFrame:
    """Per (group, distinct ``val_col``): the exact integer doubled
    average rank ``2*cum - cnt + 1`` where multiplicities come from
    ``weight_col`` — rankcorr's ``_rank2`` generalized to weighted
    cells, so the rank pass rides the collapsed cell frame instead of
    raw rows (ONE corpus scan total, at the cell aggregation)."""
    cnt = cells.groupBy(*group_cols, val_col).agg(
        F.sum(weight_col).alias("_wcnt")
    )
    w = (
        W.partitionBy(*group_cols)
        .orderBy(F.asc(val_col))
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return cnt.select(
        *group_cols,
        val_col,
        (2 * F.sum("_wcnt").over(w) - F.col("_wcnt") + 1).alias(out),
    )


def brunner_munzel(
    df: DataFrame,
    key_cols: list[str],
    in_first: Column,
    value: Column,
    round_dp: int = 6,
) -> DataFrame:
    """``*key_cols, n1, n2, p_hat, w`` — the Brunner–Munzel statistic
    per key of integer ``value``, comparing the sample where
    ``in_first`` is true (sample 1) against the rest (sample 2).
    Rows with a null value or null indicator are dropped (the cucconi
    posture — the indicator uses when/when so NULL stays NULL and the
    filter genuinely drops it)."""
    if not key_cols:
        raise ValueError(
            "key_cols must be non-empty (the rank frames join on them); "
            "for a global test, add a constant key column upstream"
        )
    reserved = {
        "n1", "n2", "p_hat", "w",
        "_s", "_x", "_a", "_aw", "_c", "_p2",
        "_sa1", "_sa2", "_sp1", "_sp2", "_q1", "_q2",
    } & set(key_cols)
    if reserved:
        raise ValueError(
            f"key_cols collide with working columns: {sorted(reserved)}"
        )
    base = materialize(
        df.select(
            *key_cols,
            F.when(in_first, 1).when(~in_first, 0).alias("_s"),
            value.cast("long").alias("_x"),
        )
        .where(F.col("_x").isNotNull() & F.col("_s").isNotNull())
        .groupBy(*key_cols, "_s", "_x")
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    pooled = _wrank2(base, list(key_cols), "_x", "_c", "_a")
    within = _wrank2(base, [*key_cols, "_s"], "_x", "_c", "_aw")
    ranked = base.join(pooled, [*key_cols, "_x"]).join(
        within, [*key_cols, "_s", "_x"]
    )
    c = F.col("_c").cast(_DEC)
    s = F.col("_s").cast(_DEC)
    a = F.col("_a").cast(_DEC)
    p2 = (F.col("_a") - F.col("_aw")).cast(_DEC)
    stats = ranked.groupBy(*key_cols).agg(
        F.sum(s * c).cast("long").alias("n1"),
        F.sum((1 - s) * c).cast("long").alias("n2"),
        F.sum(s * c * a).alias("_sa1"),
        F.sum((1 - s) * c * a).alias("_sa2"),
        F.sum(s * c * p2).alias("_sp1"),
        F.sum((1 - s) * c * p2).alias("_sp2"),
        F.sum(s * c * p2 * p2).alias("_q1"),
        F.sum((1 - s) * c * p2 * p2).alias("_q2"),
    )
    n1 = F.col("n1").cast(_DEC)
    n2 = F.col("n2").cast(_DEC)
    num = n1 * F.col("_sa2") - n2 * F.col("_sa1")
    rad = (n1 * F.col("_q1") - F.col("_sp1") * F.col("_sp1")) * (n2 - 1) + (
        n2 * F.col("_q2") - F.col("_sp2") * F.col("_sp2")
    ) * (n1 - 1)
    both = (F.col("n1") >= 1) & (F.col("n2") >= 1)
    return stats.select(
        *key_cols,
        "n1",
        "n2",
        F.when(
            both,
            F.round(
                (F.col("_sa2") - n2 * (n2 + 1)).cast("double")
                / (2 * n1 * n2).cast("double"),
                round_dp,
            ),
        ).alias("p_hat"),
        F.when(
            (F.col("n1") >= 2) & (F.col("n2") >= 2) & (rad > 0),
            F.round(
                num.cast("double")
                * F.sqrt(((n1 - 1) * (n2 - 1)).cast("double"))
                / (
                    (n1 + n2).cast("double")
                    * F.sqrt(rad.cast("double"))
                ),
                round_dp,
            ),
        ).alias("w"),
    )
