"""Delta-method standard errors for ratio-of-sums metrics: the
cluster-correct way to put a confidence interval on "revenue per
session", "clicks per user", or any metric whose numerator and
denominator both vary per analysis unit.  Treating such a ratio as a
per-row mean understates the variance whenever rows cluster inside
units (every experimentation platform's classic pitfall); the delta
method (first-order Taylor expansion of y̅/x̅) gives

    R  = Σy / Σx
    var(R) ≈ (s_yy - 2·R·s_xy + R²·s_xx) / (n · x̄²)

with per-unit sums y_u, x_u, their sample moments s_·· and n units.

Everything is sufficient statistics: one aggregation to the unit grain,
one aggregation per group over (n, Σy, Σx, Σy², Σx², Σxy) — the second
moments in decimal(38,0) (cent-scale values square past 2**63 at corpus
scale; DuckDB mirrors with HUGEINT) — then closed-form doubles in one
fixed operand order.  No window, no resampling, nothing driver-side;
the bootstrap alternative would shuffle the corpus hundreds of times
for the same first-order answer.

Scope note: the reference app has no experimentation surface — this
extends the A/B family (``operators/stats.py``, ``operators/cuped.py``)
with the ratio-metric standard error those comparisons need.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_DEC = "decimal(19,0)"


def ratio_metric_ci(
    df: DataFrame,
    group_cols: list[str],
    unit_col: str,
    y_cents: F.Column,
    x_count: F.Column,
    z: float = 1.96,
) -> DataFrame:
    """``*group_cols, n_units, ratio, se, ci_lo, ci_hi`` — the
    delta-method interval for ``sum(y) / sum(x)`` per group, clustered
    by ``unit_col``.  ``ratio/se/ci_*`` are 6-dp doubles; groups with
    one unit or a zero denominator report null ``se``/CI (no variance
    estimate exists)."""
    units = (
        df.select(
            *group_cols,
            F.col(unit_col).alias("_u"),
            y_cents.cast("long").alias("_y"),
            x_count.cast("long").alias("_x"),
        )
        .groupBy(*group_cols, "_u")
        .agg(F.sum("_y").alias("_uy"), F.sum("_x").alias("_ux"))
    )
    y, x = F.col("_uy"), F.col("_ux")
    g = units.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_units"),
        F.sum("_uy").alias("sy"),
        F.sum("_ux").alias("sx"),
        F.sum(y.cast(_DEC) * y.cast(_DEC)).alias("syy"),
        F.sum(x.cast(_DEC) * x.cast(_DEC)).alias("sxx"),
        F.sum(x.cast(_DEC) * y.cast(_DEC)).alias("sxy"),
    )
    n = F.col("n_units").cast("double")
    r = F.col("sy").cast("double") / F.col("sx").cast("double")
    mx = F.col("sx").cast("double") / n
    # sample (n-1) central moments of the per-unit sums
    vyy = (F.col("syy").cast("double") - n * (F.col("sy").cast("double") / n)
           * (F.col("sy").cast("double") / n)) / (n - 1.0)
    vxx = (F.col("sxx").cast("double") - n * mx * mx) / (n - 1.0)
    vxy = (F.col("sxy").cast("double") - n * mx
           * (F.col("sy").cast("double") / n)) / (n - 1.0)
    # greatest(0, ·) guards the sqrt against a last-ulp-negative variance
    # on degenerate (constant-ratio) groups; the oracle mirrors it
    se = F.sqrt(
        F.greatest(
            F.lit(0.0), (vyy - 2.0 * r * vxy + r * r * vxx) / (n * mx * mx)
        )
    )
    ok = (F.col("n_units") > 1) & (F.col("sx") != 0)
    return g.select(
        *group_cols,
        "n_units",
        F.round(r, 6).alias("ratio"),
        F.round(F.when(ok, se), 6).alias("se"),
        F.round(F.when(ok, r - z * se), 6).alias("ci_lo"),
        F.round(F.when(ok, r + z * se), 6).alias("ci_hi"),
    )
