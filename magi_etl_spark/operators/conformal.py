"""Split-conformal prediction intervals with empirical coverage — the
distribution-free calibration wrapper (Vovk et al.; Lei et al. 2018)
that turns ANY point predictor into an interval with a finite-sample
coverage guarantee.  In a data pipeline this is the audit layer for
model-scored columns (quality scores, price predictions): "what
residual band contains 90% of held-out truth, and does it actually?"

Protocol (all deterministic, all integer):

1. md5-fold the keys into train / calibration / test (the
   ``mlprep.md5_fold`` hash both engines replay digit for digit).
2. Fit the predictor on TRAIN — here the per-group mean in integer
   cents (floor division, exact).
3. On CALIBRATION, take nonconformity scores ``r = |y - yhat|`` and the
   k-th smallest with ``k = ceil((n_cal + 1) * (1 - alpha))`` — the
   finite-sample-corrected quantile (clamped to ``n_cal`` when the
   correction overshoots, the standard conservative fallback).
4. On TEST, count rows with ``|y - yhat| <= qhat``: empirical coverage.

Scale shape: one aggregation for the model, one per-group window over
CALIBRATION rows only (partitioned by group, never global), broadcast
joins for the (groups-sized) model and qhat frames, and one final
aggregation.  Every emitted column is BIGINT — no float can flip a
hash cell.

Scope note: the reference app has no calibration surface — this
operator extends the governance family (``operators/classifier.py``
score calibration, q177) with distribution-free intervals.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

from magi_etl_spark.operators.mlprep import md5_fold


def split_conformal(
    df: DataFrame,
    group_cols: list[str],
    key_col: str,
    y_cents: F.Column,
    alpha: float = 0.1,
    seed: str = "conformal",
) -> DataFrame:
    """``*group_cols, n_train, n_cal, qhat_cents, n_test, n_covered``
    — split-conformal calibration of the per-group train-mean predictor
    at miscoverage ``alpha`` (a whole percent in (0, 1) — anything else
    raises, see the validation below).  All columns BIGINT.  A group missing any
    of the three folds drops out of the result (inner joins): with no
    train rows there is no predictor, with no calibration rows no
    quantile, with no test rows no coverage to report."""
    base = df.select(
        *group_cols,
        F.col(key_col).alias("_key"),
        y_cents.cast("long").alias("_y"),
        md5_fold(F.col(key_col), 3, seed).alias("_fold"),
    )
    model = (
        base.where(F.col("_fold") == 0)
        .groupBy(*group_cols)
        .agg(
            F.count(F.lit(1)).alias("n_train"),
            F.sum("_y").alias("_ysum"),
        )
        .select(
            *group_cols,
            "n_train",
            # BIGINT floor division — exact past 2**53, the epochs idiom
            F.expr("_ysum DIV n_train").alias("_yhat"),
        )
    )
    cal = (
        base.where(F.col("_fold") == 1)
        .join(F.broadcast(model), group_cols)
        .select(
            *group_cols,
            "n_train",
            "_yhat",
            "_key",
            F.abs(F.col("_y") - F.col("_yhat")).alias("_r"),
        )
    )
    w = W.partitionBy(*group_cols).orderBy(F.asc("_r"), F.asc("_key"))
    ranked = cal.select(
        *group_cols,
        "n_train",
        "_yhat",
        "_r",
        F.row_number().over(w).alias("_rn"),
        F.count(F.lit(1)).over(W.partitionBy(*group_cols)).alias("n_cal"),
    )
    # k = ceil((n_cal + 1) * (1 - alpha)) via exact integer arithmetic on
    # alpha's rational form (alpha must be a round percent; scaled by 100
    # and VALIDATED — a silently-coerced 0.025 would banker-round to 2%
    # and compute a miscalibrated quantile, the r9 ADVICE defect)
    a100 = int(round(alpha * 100))
    if abs(alpha * 100 - a100) > 1e-9 or not 0 < a100 < 100:
        raise ValueError(
            f"alpha={alpha!r} is not a whole percent in (0, 1): the exact "
            "integer quantile arithmetic supports k/100 miscoverage levels "
            "only (use 0.01..0.99 in steps of 0.01)"
        )
    k = (
        F.ceil(((F.col("n_cal") + 1) * (100 - a100)).cast("double") / 100.0)
        .cast("int")
    )
    qhat = ranked.where(
        F.col("_rn") == F.least(k, F.col("n_cal"))
    ).select(*group_cols, "n_train", "_yhat", "n_cal",
             F.col("_r").alias("qhat_cents"))
    test = (
        base.where(F.col("_fold") == 2)
        .join(F.broadcast(qhat), group_cols)
        .groupBy(*group_cols, "n_train", "n_cal", "qhat_cents")
        .agg(
            F.count(F.lit(1)).alias("n_test"),
            F.sum(
                F.when(
                    F.abs(F.col("_y") - F.col("_yhat"))
                    <= F.col("qhat_cents"),
                    1,
                ).otherwise(0)
            ).cast("long").alias("n_covered"),
        )
    )
    return test
