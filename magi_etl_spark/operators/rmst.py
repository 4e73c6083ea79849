"""Restricted mean survival time (RMST) — the effect-size readout of
the survival family: the expected number of days (out of the first
``tau``) a user remains active, per arm.  Survival CURVES (q209) show
the whole shape; the log-rank test (q236) says whether two curves
differ; RMST says BY HOW MUCH in interpretable units — the area under
the survival curve restricted to [0, tau), the standard effect measure
when proportional hazards fail (Royston & Parmar 2013).

With a complete observation window (every lifespan fully observed —
the same deterministic contract ``survival_curve`` documents, to which
the censored Kaplan-Meier estimator reduces when nothing is censored)
the restricted area is an exact finite sum:

    RMST(tau) = sum_{t=0}^{tau-1} S(t)
              = sum_{t=0}^{tau-1} P(life >= t)
              = (1/n) * sum_u min(life_u + 1, tau)

so the operator is ONE keyed aggregation over per-user lifespans —
every term an exact integer day count, one division per group at the
end (the repo-wide sufficient-statistics posture).  No curve is ever
materialized, no window runs anywhere.

Scale shape: one keyed aggregate to per-user (first, last) activity
days (map-side combinable), one keyed aggregate to per-group totals.
Group cardinality = arms/cohorts (caller-bounded, like cuped.py); the
per-user collapse is the only corpus-sized stage.

Scope note: the reference app has no survival surface — this completes
the survival family (survival_curve q209, stratified log-rank q236)
with the restricted-mean effect size, the same family-completion
pattern as delta-method CIs beside the ratio metrics.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def restricted_mean_survival(
    events: DataFrame,
    group_cols: list[str],
    user_col: str,
    ts_col: str,
    tau: int,
    round_dp: int = 6,
) -> DataFrame:
    """``*group_cols, n_users, alive_days, rmst_days`` — the restricted
    mean survival time at horizon ``tau`` days per group.  A user's
    lifespan is last minus first activity day (complete observation);
    ``alive_days`` is the exact integer ``sum_u min(life_u + 1, tau)``
    and ``rmst_days = alive_days / n_users`` rounded to ``round_dp``.
    Users whose every timestamp is null have no observed lifespan and
    are dropped entirely (counting them in ``n_users`` while excluding
    them from ``alive_days`` would silently deflate the mean).  Group
    columns must be per-user attributes (constant within a user); the
    per-user aggregate takes their ``first`` value."""
    if int(tau) <= 0:
        raise ValueError(f"tau must be a positive day count, got {tau!r}")
    hit = {"n_users", "alive_days", "rmst_days"} & set(group_cols)
    if hit:
        raise ValueError(
            f"group_cols collide with output columns: {sorted(hit)}"
        )
    spans = events.groupBy(F.col(user_col).alias("_u")).agg(
        *[F.first(c).alias(c) for c in group_cols],
        F.datediff(F.max(F.to_date(ts_col)), F.min(F.to_date(ts_col)))
        .alias("_life"),
    )
    # a user whose every timestamp is null has no observed lifespan:
    # drop the span entirely rather than counting the user in n_users
    # while contributing nothing to alive_days (which would silently
    # deflate the mean — the mannkendall null-order consistency rule)
    return (
        spans.where(F.col("_life").isNotNull())
        .groupBy(*group_cols)
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.sum(
                F.least(F.col("_life") + F.lit(1), F.lit(int(tau)))
                .cast("long")
            ).alias("alive_days"),
        )
        .select(
            *group_cols,
            "n_users",
            "alive_days",
            F.round(
                F.col("alive_days").cast("double")
                / F.col("n_users").cast("double"),
                round_dp,
            ).alias("rmst_days"),
        )
    )
