"""Time-series regularization: calendar gap-fill + linear interpolation,
and range-frame rolling aggregates.

The reference resamples driver-side with pandas (``asfreq``/forecast prep
in its trending/forecast tasks); at scale the calendar grid has to be
generated and joined distributedly.  ``gapfill_interpolate`` builds the
complete per-group day grid with ``sequence()`` (exploded per group — no
driver range, no cross join), left-joins the observed points, and fills
holes by linear interpolation between the nearest observed neighbors
(two unbounded windows over ONE sort — Spark evaluates both frames from
the same shuffle).

Partitioning: every window is PARTITION BY the group columns.  A single
global series (``group_cols=[]``) would be one partition — callers
profile per entity/type instead; the grid is bounded by calendar span,
not by data volume, so per-group frames stay small even at 100 TB of
raw input (the heavy reduction happened in the groupBy that produced
the daily points).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def daily_points(
    df: DataFrame,
    group_cols: list[str],
    ts_col: str,
    value_col: str,
) -> DataFrame:
    """Observed daily sums per group: the map-side-combined reduction
    that precedes any resampling."""
    day = F.to_date(ts_col).alias("day")
    return df.groupBy(*group_cols, day).agg(F.sum(value_col).alias("value"))


def gapfill_interpolate(
    points: DataFrame,
    group_cols: list[str],
    day_col: str = "day",
    value_col: str = "value",
) -> DataFrame:
    """Complete the per-group daily grid and linearly interpolate missing
    values.

    Output: group cols + ``day`` + ``value`` (observed or interpolated) +
    ``filled`` (true for synthesized rows).  Days before a group's first
    observation or after its last don't exist (the grid spans min..max
    per group, so there is nothing to extrapolate).
    """
    grid = (
        points.groupBy(*group_cols)
        .agg(F.min(day_col).alias("_d0"), F.max(day_col).alias("_d1"))
        .select(
            *group_cols,
            F.explode(
                F.sequence("_d0", "_d1", F.expr("interval 1 day"))
            ).alias(day_col),
        )
    )
    full = grid.join(points, [*group_cols, day_col], "left")
    w = W.partitionBy(*group_cols).orderBy(day_col)
    before = w.rowsBetween(W.unboundedPreceding, 0)
    after = w.rowsBetween(0, W.unboundedFollowing)
    prev_v = F.last(value_col, ignorenulls=True).over(before)
    next_v = F.first(value_col, ignorenulls=True).over(after)
    prev_d = F.last(
        F.when(F.col(value_col).isNotNull(), F.col(day_col)), ignorenulls=True
    ).over(before)
    next_d = F.first(
        F.when(F.col(value_col).isNotNull(), F.col(day_col)), ignorenulls=True
    ).over(after)
    span = F.datediff(next_d, prev_d)
    pos = F.datediff(F.col(day_col), prev_d)
    interp = F.when(
        F.col(value_col).isNotNull(), F.col(value_col)
    ).otherwise(prev_v + (next_v - prev_v) * pos / span)
    return full.select(
        *group_cols,
        day_col,
        interp.alias(value_col),
        F.col(value_col).isNull().alias("filled"),
    )


def rolling_range_agg(
    points: DataFrame,
    group_cols: list[str],
    day_col: str = "day",
    value_col: str = "value",
    days: int = 7,
) -> DataFrame:
    """Trailing ``days``-day rolling sum/avg/count per group — a RANGE
    frame over event-time (gaps count as absent days), not a ROWS frame
    over whatever rows happen to exist.  One shuffle on the group key."""
    epoch_day = F.datediff(F.col(day_col), F.lit("1970-01-01"))
    w = (
        W.partitionBy(*group_cols)
        .orderBy(epoch_day)
        .rangeBetween(-(days - 1), 0)
    )
    return points.select(
        *group_cols,
        day_col,
        F.col(value_col),
        F.sum(value_col).over(w).alias(f"rolling_sum_{days}d"),
        F.avg(value_col).over(w).alias(f"rolling_avg_{days}d"),
        F.count(value_col).over(w).alias(f"rolling_n_{days}d"),
    )


def dow_seasonal_index(
    df: DataFrame,
    group_cols: list[str],
    day_col: str,
    value_col: str,
    decimals: int = 4,
) -> DataFrame:
    """Day-of-week seasonal indices per group — the first component of
    a seasonal decomposition: ``group_cols..., dow (0=Monday..6),
    n_days, factor`` where ``factor = mean(value | dow) / mean(value)``
    (rounded; a flat series gets 1.0 everywhere).  Dividing a daily
    series by its factor deseasonalizes it before trend fitting
    (compose with ``stats.group_ols_trend``) or anomaly flagging
    (``drift.mad_outliers``) — weekday/weekend cycles otherwise
    dominate both.

    Two narrow aggregations over the (already daily) frame plus a
    broadcast of the per-group means; a zero group mean yields NULL
    factors rather than a division error.
    """
    dow = F.weekday(F.col(day_col)).alias("dow")
    per_dow = df.select(*group_cols, dow, F.col(value_col).alias("_v")).groupBy(
        *group_cols, "dow"
    ).agg(
        F.count("*").cast("long").alias("n_days"),
        F.avg("_v").alias("_dow_mean"),
    )
    overall = df.groupBy(*group_cols).agg(F.avg(value_col).alias("_mean"))
    factor = F.when(
        F.col("_mean") != 0, F.col("_dow_mean") / F.col("_mean")
    )
    return per_dow.join(F.broadcast(overall), [*group_cols]).select(
        *group_cols,
        "dow",
        "n_days",
        F.round(factor, decimals).alias("factor"),
    )
