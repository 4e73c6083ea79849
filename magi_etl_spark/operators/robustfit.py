"""Theil-Sen robust trend estimation per group.

The OLS family (q152, ``operators/stats.group_ols_trend``) is exact but
breaks under a single wild outlier; the Theil-Sen estimator — the
median of all pairwise slopes — has a 29% breakdown point and is the
standard robust companion for per-series trend monitoring.

Scale shape: the pairwise self-join is per GROUP and bounded by
points-per-group squared — the operator targets aggregated series
(daily/weekly rollups, at most a few hundred points per group), where
C(n,2) is thousands of rows per group, not corpus-scale.  The join is
keyed on the group columns (co-partitioned), the median is an exact
rank selection inside a per-group window, and the output is one row
per group.  Callers with corpus-scale series should pre-aggregate to a
coarser grain first (the same contract the oracle replays).

Determinism: slopes are ratios of exact integers (y pre-scaled to
cents, x a small integer index), compared as IEEE doubles — identical
in every engine; the median picks by slope rank with the average of
the two middle VALUES for even counts, so tie order never matters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def theil_sen_trend(
    points: DataFrame,
    group_cols: list[str],
    x_col: str = "x",
    y_col: str = "y",
    round_dp: int = 6,
) -> DataFrame:
    """Per group: ``n_points, n_pairs, sen_slope`` where ``sen_slope``
    is the median over all x1 < x2 pairs of ``(y2 - y1) / (x2 - x1)``.
    ``x_col`` must be unique per (group, point) — equal-x pairs would
    divide by zero, and a duplicate x means the series grain is wrong.
    """
    a = points.select(
        *group_cols,
        F.col(x_col).alias("_x1"),
        F.col(y_col).alias("_y1"),
    )
    b = points.select(
        *group_cols,
        F.col(x_col).alias("_x2"),
        F.col(y_col).alias("_y2"),
    )
    pairs = a.join(b, group_cols).where(F.col("_x1") < F.col("_x2"))
    slopes = pairs.select(
        *group_cols,
        (
            (F.col("_y2") - F.col("_y1")).cast("double")
            / (F.col("_x2") - F.col("_x1")).cast("double")
        ).alias("_slope"),
    )
    w = W.partitionBy(*group_cols).orderBy("_slope")
    ranked = slopes.select(
        *group_cols,
        "_slope",
        F.row_number().over(w).alias("_rk"),
        F.count("*").over(W.partitionBy(*group_cols)).alias("_n"),
    )
    # exact middle selection: rk in {floor((n+1)/2), ceil((n+1)/2)}
    lo = F.expr("(_n + 1) DIV 2")
    hi = F.expr("(_n + 2) DIV 2")
    mid = ranked.where((F.col("_rk") == lo) | (F.col("_rk") == hi))
    med = mid.groupBy(*group_cols).agg(
        F.round(F.avg("_slope"), round_dp).alias("sen_slope")
    )
    counts = points.groupBy(*group_cols).agg(
        F.count("*").alias("n_points")
    )
    npairs = slopes.groupBy(*group_cols).agg(F.count("*").alias("n_pairs"))
    return counts.join(npairs, group_cols).join(med, group_cols)
