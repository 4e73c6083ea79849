"""Robust per-group statistics: winsorization and median/IQR scaling.

The reference scales features with min-max over collected pandas frames
(reference ``dash_app/tasks.py`` recommend family — our A11/M3); min-max
is outlier-dominated, so warehouse practice clips at exact group
percentiles (winsorize) or centers on median/IQR before ML featurization
or anomaly thresholds.

Scale shape: one map-side-combined aggregate producing TWO numbers per
group, joined back (broadcast by default — bounds frames are one row per
group; pass ``broadcast_bounds=False`` for ultra-high-cardinality
groups, where the join shuffles both sides on the group key instead).
``approx=True`` swaps the exact sort-based ``percentile`` for
``percentile_approx`` — at 100 TB the exact form pays a per-group sort
buffer, the sketch form is one bounded-memory pass; same plan shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _join_bounds(
    df: DataFrame, bounds: DataFrame, group_cols: list[str]
) -> DataFrame:
    """Join the per-group bounds frame back null-safely: ``groupBy``
    emits a bounds row for the NULL group, but a plain equi-join never
    matches it, silently DROPPING every NULL-keyed input row from the
    output (r4 ADVICE).  ``eqNullSafe`` per key keeps them, clipped or
    scaled against their own group's bounds like any other group."""
    cond = None
    for c in group_cols:
        eq = df[c].eqNullSafe(bounds[c])
        cond = eq if cond is None else cond & eq
    joined = df.join(bounds, cond)
    # drop the bounds side's duplicate key columns
    return joined.drop(*[bounds[c] for c in group_cols])


def group_percentile_bounds(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    lo: float = 0.01,
    hi: float = 0.99,
    approx: bool = False,
) -> DataFrame:
    """One row per group: ``*group_cols, _plo, _phi`` — the exact (or
    sketched) ``lo``/``hi`` percentiles of ``value_col``."""
    if not 0.0 <= lo <= hi <= 1.0:
        raise ValueError(f"need 0 <= lo <= hi <= 1, got {lo}, {hi}")
    p = F.percentile_approx if approx else F.percentile
    return df.groupBy(*group_cols).agg(
        p(value_col, lo).alias("_plo"), p(value_col, hi).alias("_phi")
    )


def winsorize(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    lo: float = 0.01,
    hi: float = 0.99,
    out_col: str | None = None,
    approx: bool = False,
    broadcast_bounds: bool = True,
) -> DataFrame:
    """Clip ``value_col`` to its group's [lo, hi] percentile band; the
    clipped value lands in ``out_col`` (default ``{value_col}_w``).
    NULL values stay NULL — guarded explicitly, because Spark's
    ``least``/``greatest`` SKIP nulls rather than propagate them, which
    would silently rewrite NULL to the lower bound."""
    out = out_col or f"{value_col}_w"
    bounds = group_percentile_bounds(df, group_cols, value_col, lo, hi, approx)
    if broadcast_bounds:
        bounds = F.broadcast(bounds)
    clipped = F.when(
        F.col(value_col).isNotNull(),
        F.least(F.greatest(F.col(value_col), F.col("_plo")), F.col("_phi")),
    )
    return (
        _join_bounds(df, bounds, group_cols)
        .withColumn(out, clipped)
        .drop("_plo", "_phi")
    )


def robust_scale(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    out_col: str | None = None,
    approx: bool = False,
    broadcast_bounds: bool = True,
) -> DataFrame:
    """Median/IQR standardization: ``(x - median) / (p75 - p25)`` per
    group — the outlier-robust alternative to z-scores.  A zero IQR
    (constant group) yields NULL rather than an infinity: callers decide
    whether constant features are dropped or imputed."""
    out = out_col or f"{value_col}_rs"
    p = F.percentile_approx if approx else F.percentile
    bounds = df.groupBy(*group_cols).agg(
        p(value_col, 0.5).alias("_med"),
        (p(value_col, 0.75) - p(value_col, 0.25)).alias("_iqr"),
    )
    if broadcast_bounds:
        bounds = F.broadcast(bounds)
    scaled = F.when(
        F.col("_iqr") != 0, (F.col(value_col) - F.col("_med")) / F.col("_iqr")
    )
    return (
        _join_bounds(df, bounds, group_cols)
        .withColumn(out, scaled)
        .drop("_med", "_iqr")
    )
