"""CUPED variance reduction for experiment metrics (Deng, Xu, Kohavi &
Walker, WSDM 2013): adjust each unit's experiment-period metric by its
PRE-period covariate, ``y_adj = y - theta * (x - mean(x))`` with
``theta = cov(x, y) / var(x)``, cutting metric variance by the squared
pre/post correlation — the standard trick that lets an A/B test reach
significance on a fraction of the traffic.

Everything reduces to sufficient statistics: one aggregation per arm
(n, Σy, Σx, Σy², Σx², Σxy) and one pooled 1-row merge.  The second-
moment sums accumulate in decimal(38,0) — cent-scale metrics square to
~1e14 per row, so a BIGINT sum wraps silently at corpus scale while
DuckDB promotes to HUGEINT (the q227 ssq lesson) — and every derived
double (theta, means, variances) is computed with an identical operand
sequence on both engines, so the 6-dp rounded outputs are
deterministic.

Scale shape: one map-side-combinable groupBy(arm) over the unit frame,
one broadcast of the 1-row pooled stats — no window, no second pass
over the data, nothing driver-side.

Scope note: the reference app has no experimentation surface — this
operator extends the A/B family (``operators/stats.py``
``ab_assign_and_compare``, q17-era) with the pre-period covariate
adjustment production experiment platforms run by default.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_DEC = "decimal(19,0)"


def _suff(df: DataFrame, by: list[str]) -> DataFrame:
    """n, Σy, Σx (BIGINT) and Σy², Σx², Σxy (decimal(38,0)) per ``by``."""
    y, x = F.col("_y"), F.col("_x")
    return df.groupBy(*by).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("_y").alias("sy"),
        F.sum("_x").alias("sx"),
        F.sum(y.cast(_DEC) * y.cast(_DEC)).alias("syy"),
        F.sum(x.cast(_DEC) * x.cast(_DEC)).alias("sxx"),
        F.sum(x.cast(_DEC) * y.cast(_DEC)).alias("sxy"),
    )


def cuped_adjust(
    df: DataFrame,
    arm_col: str,
    y_cents: F.Column,
    x_cents: F.Column,
) -> DataFrame:
    """``arm, n, mean_y, mean_y_adj, var_reduction`` — CUPED-adjusted
    per-arm means (6-dp doubles) with the pooled-theta convention:
    ``theta`` and the centering mean come from BOTH arms pooled (the
    covariate is pre-experiment, so pooling is unbiased and keeps the
    adjustment identical across arms).  ``var_reduction`` is
    ``1 - var(y_adj)/var(y)`` per arm (population moments).  Degenerate
    pooled ``var(x) = 0`` yields ``theta = 0`` — no adjustment, zero
    reduction — via a null-safe guarded division."""
    base = df.select(
        F.col(arm_col).alias("arm"),
        y_cents.cast("long").alias("_y"),
        x_cents.cast("long").alias("_x"),
    )
    per_arm = _suff(base, ["arm"])
    pooled = (
        per_arm.groupBy()
        .agg(
            F.sum("n").alias("pn"),
            F.sum("sy").alias("psy"),
            F.sum("sx").alias("psx"),
            F.sum("syy").alias("psyy"),
            F.sum("sxx").alias("psxx"),
            F.sum("sxy").alias("psxy"),
        )
        .select(
            F.col("pn"),
            (F.col("psx").cast("double") / F.col("pn").cast("double")).alias(
                "mx_pool"
            ),
            (
                F.col("psxx").cast("double") / F.col("pn").cast("double")
                - (F.col("psx").cast("double") / F.col("pn").cast("double"))
                * (F.col("psx").cast("double") / F.col("pn").cast("double"))
            ).alias("vx_pool"),
            (
                F.col("psxy").cast("double") / F.col("pn").cast("double")
                - (F.col("psx").cast("double") / F.col("pn").cast("double"))
                * (F.col("psy").cast("double") / F.col("pn").cast("double"))
            ).alias("cxy_pool"),
        )
        .select(
            "mx_pool",
            "vx_pool",
            F.when(
                F.col("vx_pool") > 0.0, F.col("cxy_pool") / F.col("vx_pool")
            )
            .otherwise(F.lit(0.0))
            .alias("theta"),
        )
    )
    n_d = F.col("n").cast("double")
    my = F.col("sy").cast("double") / n_d
    mx = F.col("sx").cast("double") / n_d
    vy = F.col("syy").cast("double") / n_d - my * my
    vx = F.col("sxx").cast("double") / n_d - mx * mx
    cxy = F.col("sxy").cast("double") / n_d - mx * my
    th = F.col("theta")
    vy_adj = vy - 2.0 * th * cxy + th * th * vx
    return (
        per_arm.join(F.broadcast(pooled))
        .select(
            "arm",
            "n",
            F.round(my, 6).alias("mean_y"),
            F.round(my - th * (mx - F.col("mx_pool")), 6).alias("mean_y_adj"),
            F.round(
                F.when(vy > 0.0, 1.0 - vy_adj / vy).otherwise(F.lit(0.0)), 6
            ).alias("var_reduction"),
        )
    )
