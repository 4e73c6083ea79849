"""Expected / Maximum Calibration Error (Naeini et al. 2015; Guo et
al. 2017) — the one-number calibration summary over a reliability
diagram: ECE is the bin-size-weighted mean absolute gap between
predicted confidence and realized event rate, MCE the worst bin's gap.
The standard headline metric for classifier-confidence QA (a model
routing documents by quality score is only as trustworthy as its
calibration), composed directly over ``brier.reliability_brier_bins``
(q253) — the engine's calibration family readout, one keyed
aggregation over an already-verified operator's output, no new join
topology (the q255-over-q244 composition pattern).

Exact arithmetic: the bins frame's ``mean_p``/``event_rate`` are
6-dp-rounded doubles, so ``round(mean_p * 1e6)`` recovers exact
integers on both engines; the per-bin gap ``d6 = |round(mean_p*1e6) -
round(event_rate*1e6)|`` is an exact integer, and

    ECE = sum_b n_b * d6_b / (N * 1e6)      MCE = max_b d6_b / 1e6

ride an exact decimal(38,0) numerator (never an order-dependent float
sum — the cross-group-sum lesson) and an order-independent integer
max; ONE double division each at the end, rounded at the 6-dp grid
(so MCE is exact on the grid).

Scale shape: one map-side-combinable aggregation keyed by the group —
output bounded by group count, and the input is already bin-bounded
(n_bins rows per group).

Scope note: the reference app has no calibration surface — this
completes the q177/q253 calibration family with its summary scalar.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_DEC = "decimal(38,0)"


def calibration_error(
    bins: DataFrame,
    group_cols: list[str],
    round_dp: int = 6,
) -> DataFrame:
    """``*group_cols, n, n_bins_used, ece, mce`` per group over a
    ``reliability_brier_bins`` frame (columns ``*group_cols, bin, n,
    mean_p, event_rate, ...``).  ``n`` is the total rated count,
    ``n_bins_used`` the populated bins."""
    if not group_cols:
        raise ValueError(
            "group_cols must be non-empty (the bins frame is keyed by "
            "them); for a global summary, add a constant key column "
            "upstream"
        )
    reserved = {"n", "n_bins_used", "ece", "mce", "_num", "_mx"} & set(group_cols)
    if reserved:
        raise ValueError(
            f"group_cols collide with working columns: {sorted(reserved)}"
        )
    d6 = F.abs(
        F.round(F.col("mean_p") * 1_000_000).cast(_DEC)
        - F.round(F.col("event_rate") * 1_000_000).cast(_DEC)
    )
    agg = bins.groupBy(*group_cols).agg(
        F.sum("n").alias("n"),
        F.count(F.lit(1)).alias("n_bins_used"),
        F.sum(F.col("n").cast(_DEC) * d6).alias("_num"),
        F.max(d6.cast("long")).alias("_mx"),
    )
    return agg.select(
        *group_cols,
        "n",
        "n_bins_used",
        F.round(
            F.col("_num").cast("double")
            / (F.col("n").cast("double") * F.lit(1_000_000.0)),
            round_dp,
        ).alias("ece"),
        F.round(
            F.col("_mx").cast("double") / F.lit(1_000_000.0), round_dp
        ).alias("mce"),
    )
