"""Brier score + reliability-diagram calibration bins (Brier 1950;
Murphy 1973) — the PROPER scoring rule beside q177's
``classifier.calibration_bins`` (which bins a raw log-odds score):
here the prediction is a PROBABILITY on an exact integer micro grid,
and each bin reports volume, mean predicted probability, realized
event rate, and the bin's mean squared error — the Murphy
decomposition's raw material (calibration term = n-weighted
(mean_p - event_rate)^2 over bins).

Exact arithmetic: predictions enter as ``p_micro`` (0..unit integer,
unit = 1e6), outcomes as 0/1, so the squared error ``(p_micro -
y*unit)^2`` is an exact integer summed in decimal(38,0); the three
reported ratios are each ONE double division in a fixed operand
order, rounded at the 6-dp grid.  Bin ids are pure integer floor
division (non-negative operands, so Spark DIV == DuckDB ``//``),
clamped so p = unit lands in the top bin.

Scale shape: one map-side-combinable keyed aggregation over
(group, bin) — corpus touched once, output bounded by group
cardinality x n_bins.  Nothing shuffles twice, nothing is quadratic.

Scope note: the reference app has no scoring-rule surface — this
completes the evaluation family (AUC q238, NDCG q243, calibration
q177) with the proper scoring rule.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_DEC = "decimal(38,0)"


def reliability_brier_bins(
    df: DataFrame,
    group_cols: list[str],
    p_micro: Column,
    outcome: Column,
    n_bins: int = 10,
    unit: int = 1_000_000,
    round_dp: int = 6,
) -> DataFrame:
    """``*group_cols, bin, n, mean_p, event_rate, brier`` per
    (group, bin): the reliability diagram with the per-bin Brier
    contribution.  ``p_micro`` must already sit on the integer micro
    grid (0..unit); rows with a null prediction/outcome or a
    prediction off the grid are dropped (the documented contract —
    quantize upstream).  ``outcome`` is coerced to 0/1 via a boolean
    cast."""
    if int(n_bins) < 1:
        raise ValueError(f"n_bins must be >= 1, got {n_bins!r}")
    if int(unit) < 1:
        raise ValueError(f"unit must be >= 1, got {unit!r}")
    reserved = {
        "bin", "n", "mean_p", "event_rate", "brier",
        "_p", "_y", "_sp", "_sy", "_sse",
    } & set(group_cols)
    if reserved:
        raise ValueError(
            f"group_cols collide with output columns: {sorted(reserved)}"
        )
    u = F.lit(int(unit))
    base = df.select(
        *group_cols,
        p_micro.cast("long").alias("_p"),
        outcome.cast("boolean").cast("int").alias("_y"),
    ).where(
        F.col("_p").isNotNull()
        & F.col("_y").isNotNull()
        & (F.col("_p") >= 0)
        & (F.col("_p") <= u)
    )
    err = F.col("_p") - F.col("_y").cast("long") * u
    stats = (
        # non-negative operands: Spark DIV == DuckDB // ; the LEAST
        # clamp drops p == unit into the top bin
        base.withColumn(
            "bin",
            F.least(
                F.expr(f"(_p * {int(n_bins)}) DIV {int(unit)}"),
                F.lit(int(n_bins) - 1).cast("long"),
            ),
        )
        .groupBy(*group_cols, "bin")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("_p").cast(_DEC)).alias("_sp"),
            F.sum(F.col("_y")).alias("_sy"),
            F.sum((err.cast(_DEC) * err.cast(_DEC))).alias("_sse"),
        )
    )
    nd = F.col("n").cast("double")
    return stats.select(
        *group_cols,
        "bin",
        "n",
        F.round(
            F.col("_sp").cast("double") / (nd * F.lit(float(unit))), round_dp
        ).alias("mean_p"),
        F.round(F.col("_sy").cast("double") / nd, round_dp).alias(
            "event_rate"
        ),
        F.round(
            F.col("_sse").cast("double")
            / (nd * F.lit(float(unit) * float(unit))),
            round_dp,
        ).alias("brier"),
    )
